"""Round-5 fixes (VERDICT/ADVICE round 4): range-independent AUC/threshold
quantization with non-finite pass-through, flagship pipeline_source_agg
oracle input, partitioned degenerate-tie split fallback, collision-free
skew temp columns, resume validation that surfaces genuine plan bugs."""

import os

import pytest
from pyspark.sql import functions as F


# ------------------------------------- range-independent score quantization

def test_quantize_range_independent(spark):
    """Judge item #2 'done' criterion: a score column with range >= 1e4
    (rarity-style (-ln f)^3 magnitudes) must quantize into a FIXED,
    configuration-sized histogram — round 4's absolute 1e-6 bins were
    data-sized for wide ranges (up to range*1e6 bins)."""
    from sparklead.detectors.ad import _score_hist

    n = 50_000
    # continuous scores spanning [0, ~1e6): with the round-4 absolute
    # quantizer every value lands in its own 1e-3 bin (range 1e6 * 1e3 bins)
    scores = spark.range(n).select(
        (F.pmod(F.xxhash64("id"), 2) == 0).cast("int").alias("label"),
        (
            F.pmod(F.xxhash64("id", F.lit(7)), 1_000_000_000) / 1e3
            + F.pmod(F.xxhash64("id", F.lit(11)), 997) / 1e6
        ).alias("score"),
    )
    q = 3
    hist_rows = _score_hist(scores, "label", "score", quantize=q).count()
    # normalized grid: at most 2*10^q + 1 finite bins regardless of range
    assert hist_rows <= 2 * 10**q + 1
    # and the raw cardinality really was data-sized (the test is non-vacuous)
    assert _score_hist(scores, "label", "score", quantize=None).count() > 10 * (2 * 10**q + 1)


def test_quantize_nonfinite_passthrough(spark):
    """Advisor fix: NaN quantized to 0.0 (silently flipping NaN-scored rows
    from most-anomalous to mid-ranked) and +inf collapsed through
    Long.MaxValue/1e6. Non-finite scores now bypass quantization raw, and
    are excluded from the normalizing max (one +inf must not flatten every
    finite score into a single bin)."""
    from sparklead.detectors.ad import _score_hist, roc_auc

    nan, inf = float("nan"), float("inf")
    rows = [(1, inf)] * 3 + [(1, nan)] * 2 + [(0, float(i)) for i in range(20)]
    scores = spark.createDataFrame(rows, "label int, score double")
    hist = _score_hist(scores, "label", "score", quantize=6).collect()
    by_kind = {"nan": 0, "inf": 0, "finite": 0}
    import math

    for r in hist:
        s = r["score"]
        if math.isnan(s):
            by_kind["nan"] += r["n"]
        elif math.isinf(s):
            by_kind["inf"] += r["n"]
        else:
            by_kind["finite"] += r["n"]
    assert by_kind == {"nan": 2, "inf": 3, "finite": 20}
    # finite scores keep RESOLUTION: the normalizing max is over finite
    # values only, so 20 distinct finite scores stay 20 distinct bins
    assert sum(1 for r in hist if not math.isnan(r["score"]) and not math.isinf(r["score"])) == 20
    # every anomaly scored non-finite-high -> perfect AUC (the round-4
    # quantizer sent NaN to 0.0, scoring those rows LEAST anomalous)
    assert roc_auc(scores).first()["auc"] == pytest.approx(1.0)


def test_score_hist_temp_column_collision_asserts(spark):
    from sparklead.detectors.ad import _score_hist

    scores = spark.range(5).select(
        F.lit(1).alias("label"), F.rand(1).alias("score"), F.lit(0.0).alias("_score_max")
    )
    with pytest.raises(AssertionError, match="_score_max"):
        _score_hist(scores, "label", "score", quantize=6)


def test_auc_threshold_oracle_parity_with_new_quantizer(spark):
    """The gated auc_threshold entry must stay hash-identical to its DuckDB
    oracle under the round-5 normalize-quantize-rescale chain (bit-level
    IEEE parity of the div/mul legs) — checked here end-to-end at sf0.001
    so the gate at sf0.01 never sees a surprise."""
    import duckdb

    import __spark_entry__ as entrymod

    sf_dir = "/root/testdata/sf0.001"
    got = entrymod._q_auc_threshold(spark, sf_dir).first()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{sf_dir}/events.parquet'")
    cur = con.execute(entrymod.oracle_sql()["auc_threshold"])
    cols = [d[0] for d in cur.description]
    want = cur.fetchone()
    # round-5: the entry also carries the chronological-split columns;
    # round-7: plus the report-pivot columns — compare EVERY column by name
    assert tuple(got[c] for c in cols) == want


# ------------------------------------- flagship oracle input materialization

def test_flagship_input_materialized_and_stable(spark):
    """pipeline_source_agg (round-5: oracle-checked) materializes its
    synthetic input to FLAGSHIP_INPUT exactly once per process; the result
    is invariant to that caching and self-consistent (n_seqs sums to the
    synthetic doc count, zero invalid rows by construction)."""
    import __spark_entry__ as entrymod

    r1 = entrymod._q_pipeline_source_agg(spark, "/root/testdata/sf0.001").collect()
    assert os.path.exists(os.path.join(entrymod.FLAGSHIP_INPUT, "_SUCCESS"))
    r2 = entrymod._q_pipeline_source_agg(spark, "/root/testdata/sf0.001").collect()
    key = lambda r: r["source"]
    assert sorted(r1, key=key) == sorted(r2, key=key)
    assert sum(r["n_seqs"] for r in r1) == 20_000
    assert all(r["n_invalid"] == 0 for r in r1)
    # the oracle derives label/region from the source string — pin that the
    # Spark-side broadcast meta agrees with the pure-function derivation
    for r in r1:
        i = int(r["source"][3:])
        assert r["label"] == ("anomaly" if i % 7 == 0 else "normal")
        assert r["region"] == f"region{i % 4}"


# ------------------------------------- skew temp-column collisions

def test_salted_join_preserves_caller_salt_column(spark):
    """Advisor fix: a caller frame already carrying `_salt` was silently
    overwritten and then dropped. The temp name now dodges collisions."""
    from sparklead.skew import salted_distinct_count, salted_join

    big = spark.range(100).select(
        F.pmod("id", F.lit(5)).alias("k"),
        F.col("id").alias("v"),
        (F.col("id") * 10).alias("_salt"),
    )
    small = spark.createDataFrame([(i, f"m{i}") for i in range(5)], "k long, meta string")
    got = salted_join(big, small, "k")
    assert "_salt" in got.columns
    plain = big.join(small, "k")
    assert sorted(got.collect()) == sorted(plain.collect())
    # distinct-count twin: caller columns named _b/_d survive too
    df = spark.range(100).select(
        F.pmod("id", F.lit(4)).alias("k"),
        F.pmod("id", F.lit(7)).cast("string").alias("item"),
        F.lit(1).alias("_b"),
        F.lit(2).alias("_d"),
    )
    got2 = {r["k"]: r["n_distinct"] for r in salted_distinct_count(df, "k", "item").collect()}
    want2 = {
        r["k"]: r["n"]
        for r in df.groupBy("k").agg(F.countDistinct("item").alias("n")).collect()
    }
    assert got2 == want2


# ------------------------------------- rows-only drift detection

def test_rowsonly_baseline_recorded_and_stable(spark):
    """Judge item #4: crosscheck diffs every rows-only entry's canonical
    value hash against tools/rowsonly_baseline.json and fails on unexplained
    drift. Round-6 third wave: parser_templates (the last rows-only entry)
    graduated to a materialized-assignment oracle, so the committed baseline
    must now exactly mirror the EMPTY rows-only set — the mechanism stays
    (crosscheck re-arms automatically if an entry ever loses its oracle)."""
    import json
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    import crosscheck as cc

    import __spark_entry__ as entrymod

    with open(cc.BASELINE_PATH) as f:
        baseline = json.load(f)
    rows_only = set(entrymod.queries()) - set(entrymod.oracle_sql())
    assert rows_only == set()
    assert set(baseline.get("sf0.01", {})) == rows_only


# ------------------------------------- md5-nibble SimHash oracle lane

def test_simhash_md5_lane_matches_python_reference(spark):
    """with_simhash_md5 (the round-5 oracle lane behind q:simhash_groups)
    must reproduce a from-scratch Python simhash over md5 nibbles exactly,
    and exact-duplicate token arrays must collide under BOTH lanes. The two
    lanes' incidental cross-doc collisions legitimately differ (different
    hash functions) — grouping parity is NOT claimed."""
    import hashlib

    from sparklead.dedup import HEX_ALPHABET, with_simhash, with_simhash_md5

    def py_simhash(tokens):
        hexes = [hashlib.md5(t.encode()).hexdigest()[:16] for t in tokens[:65535]]
        n = len(hexes)
        out = []
        for i in range(16):
            nib = 0
            for k in range(4):
                c = sum((int(h[i], 16) >> k) & 1 for h in hexes)
                if 2 * c > n:
                    nib |= 1 << k
            out.append(HEX_ALPHABET[nib])
        return "".join(out)

    docs = [
        ("d1", "the quick brown fox".split()),
        ("d2", "jumps over the lazy dog".split()),
        ("d3", ["single"]),
        ("d4", "the the the fox".split()),
        ("d5", "the quick brown fox".split()),  # exact dup of d1
        ("d6", [""]),
    ]
    sdf = spark.createDataFrame(docs, "doc_id string, toks array<string>")
    got = {
        r["doc_id"]: r["simhash"]
        for r in with_simhash_md5(sdf, "toks").select("doc_id", "simhash").collect()
    }
    assert got == {d: py_simhash(t) for d, t in docs}
    # exact duplicates collide under both lanes
    xxh = {
        r["doc_id"]: r["simhash"]
        for r in with_simhash(sdf, "toks").select("doc_id", "simhash").collect()
    }
    assert got["d1"] == got["d5"] and xxh["d1"] == xxh["d5"]


# ------------------------------------- resume validation surfaces plan bugs

def test_route_resume_surfaces_genuine_plan_bugs(spark, tmp_path):
    """Advisor fix: resume schema validation swallowed EVERY thunk error
    into trust-the-manifest — a bad column reference silently resumed the
    stale sink and re-failed downstream. Only missing-input errors escape
    now (with a visible RuntimeWarning); real plan bugs raise HERE."""
    import shutil

    from sparklead import routing

    out = str(tmp_path / "sinks")
    src = str(tmp_path / "src")
    spark.range(7).select("id").write.parquet(src)
    routing.route({"a": lambda: spark.read.parquet(src).select("id")}, out)
    # genuine bug in the sink definition -> must raise, not resume stale
    with pytest.raises(Exception, match="nonexistent|UNRESOLVED|cannot be resolved"):
        routing.route(
            {"a": lambda: spark.read.parquet(src).select("nonexistent")},
            out,
            resume=True,
        )
    # missing-input escape still works, now announced via RuntimeWarning
    shutil.rmtree(src)
    with pytest.warns(RuntimeWarning, match="trusting the recorded manifest"):
        r = routing.route(
            {"a": lambda: spark.read.parquet(src).select("id")}, out, resume=True
        )
    assert r["a"].get("resumed") is True


# ------------------------------------- minhash fast-lane forms agree

def test_minhash_fast_forms_value_identical(spark):
    """The column-expression form (minhash_signature_fast over
    shingle_hashes) and the production explode+aggregate form
    (minhash_signatures) must produce IDENTICAL signature arrays — same
    hash family, different physical shape. Pins the docstring claim that
    the two are interchangeable lanes of one signature definition."""
    from sparklead.dedup import minhash_signature_fast, minhash_signatures, shingle_hashes

    docs = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog"),
         (2, "one two"), (3, "single"), (4, "a b c d e f g h i j k")],
        "doc_id int, text string",
    )
    col_form = {
        r["doc_id"]: r["sig"]
        for r in docs.select(
            "doc_id", minhash_signature_fast(shingle_hashes("text"), 16).alias("sig")
        ).collect()
    }
    agg_form = {
        r["id"]: r["sig"] for r in minhash_signatures(docs, num_hashes=16).collect()
    }
    assert col_form == agg_form


def test_simhash_agg_form_value_identical(spark):
    """simhash_signatures (explode + packed-lane aggregate, the round-5
    doc-grain form) must produce bit-identical signatures to with_simhash
    (the narrow lane-packed fold) — including empty token arrays (sig 0)
    and the 65,535-token prefix cap."""
    from sparklead.dedup import simhash_signatures, with_simhash

    docs = [
        (1, "the quick brown fox".split()),
        (2, []),
        (3, ["single"]),
        (4, "a b a b a c".split()),
        (5, ["x"] * 700),
    ]
    sdf = spark.createDataFrame(docs, "doc_id int, toks array<string>")
    narrow = {
        r["doc_id"]: r["simhash"]
        for r in with_simhash(sdf, "toks").select("doc_id", "simhash").collect()
    }
    agg = {r["id"]: r["simhash"] for r in simhash_signatures(sdf, "toks").collect()}
    assert narrow == agg


# ------------------------------------- one-call text near-dedup

def test_neardup_text_dedup_end_to_end(spark):
    """neardup_text_dedup must collapse exact duplicates to the min-key
    member, then collapse verified near-duplicate groups (one-token edits)
    to their min-key member, and pass every unique doc through untouched —
    the full exact->LSH->verify->components->keep chain in one call."""
    from sparklead.dedup import neardup_text_dedup

    # per-doc-unique token namespaces: zero cross-doc shingle overlap by
    # construction (a modular generator here accidentally created GENUINE
    # near-dups between distinct base docs and failed the first draft)
    base = [(i, " ".join(f"w{i}_{j}" for j in range(12))) for i in range(40)]
    rows = list(base)
    rows.append((100, base[5][1]))             # exact dup of doc 5
    rows.append((101, base[5][1]))             # second exact dup of doc 5
    near = base[7][1].rsplit(" ", 1)[0] + " zz"  # one-token edit of doc 7
    rows.append((102, near))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    kept = {r["doc_id"] for r in neardup_text_dedup(df, threshold=0.5).collect()}
    # exact dups 100/101 collapse onto 5; near dup 102 collapses onto 7
    assert 5 in kept and 7 in kept
    assert kept.isdisjoint({100, 101, 102})
    assert kept == set(range(40))
    spark.catalog.clearCache()
