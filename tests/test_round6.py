"""Round-6 fixes (ADVICE round 5): all-null-time chronological split,
null-token simhash lane identity, class-based missing-input matching,
hint-free jaccard_verify prune."""

import pytest
from pyspark.sql import functions as F


# ------------------------------------------------- all-null-time split

def test_chronological_split_all_null_time(spark):
    """Advisor (medium): with time_col entirely null the degenerate branch
    compared against lit(None) — is_test was null for every u>=frac row, so
    those rows vanished from BOTH sides and train was ALWAYS empty. Now a
    null-aware gt routes the whole (order-free) mass through the hash
    split: n_tr + n_te == n, fractions ~requested, both sides non-empty."""
    from sparklead.detectors.ad import train_test_split

    n = 2000
    df = spark.range(n).select(
        F.col("id").alias("seq_id"), F.lit(None).cast("timestamp").alias("start_time")
    )
    tr, te = train_test_split(df, test_frac=0.3, shuffle=False, time_col="start_time")
    n_tr, n_te = tr.count(), te.count()
    assert n_tr + n_te == n
    assert n_tr > 0 and n_te > 0
    assert abs(n_te - 0.3 * n) < 0.05 * n


def test_chronological_split_partial_null_time(spark):
    """Nulls in a MOSTLY-valid time column used to be dropped by both
    range filters (null < cutoff is null). They sort first (polars/pandas
    head-tail semantics) -> train side; totals must be preserved."""
    from sparklead.detectors.ad import train_test_split

    n = 1000
    df = spark.range(n).select(
        F.col("id").alias("seq_id"),
        F.when(F.pmod("id", F.lit(10)) == 0, F.lit(None)).otherwise(F.col("id")).alias(
            "start_time"
        ),
    )
    tr, te = train_test_split(df, test_frac=0.3, shuffle=False, time_col="start_time")
    assert tr.count() + te.count() == n
    # every null-time row landed on the train side
    assert te.filter(F.col("start_time").isNull()).count() == 0
    assert tr.filter(F.col("start_time").isNull()).count() == n // 10


# ------------------------------------------------- simhash null tokens

def test_simhash_lanes_identical_with_null_tokens(spark):
    """Advisor (low): simhash_signatures counted n via count(_t) (skips
    null tokens) while with_simhash sizes the sliced array (counts them)
    and folds xxhash64(null) == seed (42) — so the pinned bit-identity
    broke on arrays containing null elements. posexplode_outer now
    disambiguates null ELEMENTS (non-null pos -> counted, hash 42) from
    empty/null ARRAYS (pos null -> signature 0), matching the narrow lane
    bit-for-bit."""
    from sparklead.dedup import simhash_signatures, with_simhash

    docs = [
        (1, ["a", None, "b"]),
        (2, []),
        (3, [None]),          # one null element: n=1, majority = bits of 42
        (4, ["x", "y", None, None, "x"]),
        (5, None),            # null array == empty: signature 0
        (6, ["only"]),
    ]
    sdf = spark.createDataFrame(docs, "doc_id int, toks array<string>")
    narrow = {
        r["doc_id"]: r["simhash"]
        for r in with_simhash(sdf, "toks").select("doc_id", "simhash").collect()
    }
    agg = {r["id"]: r["simhash"] for r in simhash_signatures(sdf, "toks").collect()}
    assert narrow == agg
    assert narrow[2] == 0 and narrow[5] == 0
    assert narrow[3] == 42  # xxhash64(null) == seed; single-token majority


# ------------------------------------------------- class-based missing-input

def test_missing_input_predicate_matches_error_class(spark, tmp_path):
    """Advisor (low): the resume escape substring-matched exception text, so
    (a) a reworded Spark message would hard-fail archived-input resumes and
    (b) any error whose MESSAGE mentions a missing path silently resumed
    stale data. is_missing_input_error now matches the stable errorClass.

    The second case is pinned by the adversarial column name below: its
    UNRESOLVED_COLUMN message embeds the old substring, and the predicate
    must still say False."""
    from pyspark.errors import AnalysisException

    from sparklead.routing import is_missing_input_error

    with pytest.raises(AnalysisException) as missing:
        spark.read.parquet(str(tmp_path / "nope")).schema
    assert is_missing_input_error(missing.value)

    df = spark.range(3)
    with pytest.raises(AnalysisException) as unresolved:
        df.select("`Path does not exist: PATH_NOT_FOUND`").schema
    assert "Path does not exist" in str(unresolved.value)
    assert not is_missing_input_error(unresolved.value)

    assert not is_missing_input_error(ValueError("PATH_NOT_FOUND"))


def test_drain_resume_uses_class_predicate(spark, tmp_path):
    """parse_drain's snapshot load shares the predicate: a missing snapshot
    still falls back to fit+save (and a second call loads it)."""
    from sparklead.mining.drain import parse_drain

    df = spark.createDataFrame(
        [(i, f"connect from host{i} port 22") for i in range(20)],
        "line_id int, m string",
    ).select("line_id", F.split("m", " ").alias("toks"))
    path = str(tmp_path / "snap")
    out1, _ = parse_drain(df, "toks", template_path=path)
    n1 = out1.select("e_event_drain_id").distinct().count()
    out2, _ = parse_drain(df, "toks", template_path=path)  # loads the snapshot
    assert out2.select("e_event_drain_id").distinct().count() == n1


# ------------------------------------------------- hint-free jaccard prune

def test_jaccard_verify_hint_free_prune(spark):
    """Advisor (low): the candidate-touched prune no longer FORCES a
    broadcast (max_bucket bounds per-bucket, not total — a duplicate-heavy
    corpus could OOM the driver). Semantics unchanged: results equal the
    brute-force jaccard on the candidate pairs, and the pruning semi-join
    is still in the plan."""
    from sparklead.dedup import jaccard_verify, minhash_candidates, word_shingles

    base = [(i, " ".join(f"t{i}_{j}" for j in range(10))) for i in range(30)]
    rows = list(base)
    rows.append((200, base[3][1]))  # exact dup -> guaranteed candidate pair
    rows.append((201, base[3][1].rsplit(" ", 1)[0] + " zz"))  # near dup
    df = spark.createDataFrame(rows, "doc_id long, text string")
    cand = minhash_candidates(df, bands=8, num_hashes=16)
    got = {
        (r["a_id"], r["b_id"]): r["jaccard"]
        for r in jaccard_verify(df, cand, threshold=0.5).collect()
    }
    assert (3, 200) in got and got[(3, 200)] == 1.0
    # brute-force recheck of every returned pair
    sh = {
        r["doc_id"]: set(r["sh"])
        for r in df.select("doc_id", word_shingles("text", 3).alias("sh")).collect()
    }
    for (a, b), j in got.items():
        want = len(sh[a] & sh[b]) / max(len(sh[a] | sh[b]), 1)
        assert abs(j - want) < 1e-9
    plan = jaccard_verify(df, cand, threshold=0.5)._jdf.queryExecution().executedPlan().toString()
    assert "LeftSemi" in plan
