"""Round-8 additions, part 2: exact substring-level dedup (ExactSubstr,
Lee et al. 2022) — fixture semantics, a from-scratch Python oracle under
hypothesis, lane agreement, partition invariance, and the plan pins
(single gram window / payload pruning with n_tok_col)."""

import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F


# ------------------------------------------------------ pure-Python oracle

def _py_substring_dedup(docs, l):
    """From-scratch oracle for the module's declared semantics: windows of
    length l, duplicates = non-canonical occurrences of grams with global
    count >= 2 (canonical = lexicographic min (key, pos)), covered
    positions = union of duplicate window spans, clean = tokens minus
    covered. ``docs`` is {key: list-of-tokens-or-None}."""
    occ = {}
    for k in sorted(docs):
        toks = docs[k] or []
        for pos in range(len(toks) - l + 1):
            occ.setdefault(tuple(toks[pos : pos + l]), []).append((k, pos))
    covered = {k: set() for k in docs}
    n_dup_windows = {k: 0 for k in docs}
    for lst in occ.values():
        if len(lst) < 2:
            continue
        for k, pos in sorted(lst)[1:]:
            n_dup_windows[k] += 1
            covered[k].update(range(pos, pos + l))
    out = {}
    for k in sorted(docs):
        toks = docs[k]
        n = len(toks or [])
        out[k] = {
            "n_windows": max(n - l + 1, 0) if toks is not None else 0,
            "n_dup_windows": n_dup_windows[k],
            "n_dup_tokens": len(covered[k]),
            "clean": None
            if toks is None
            else [t for i, t in enumerate(toks) if i not in covered[k]],
        }
    return out


FIXTURE = [
    (1, "a b c d e f g h i j".split()),    # canonical source
    (2, "x y a b c d e f g h z".split()),  # quotes 1's 8-gram at pos 2
    (3, "p q r s t u v w".split()),        # clean, exactly l tokens
    (4, "a b c d e f g".split()),          # short (< l): no windows
    (5, None),                             # NULL tokens
    (6, "a b c d e f g h i j".split()),    # verbatim dup of 1
]


@pytest.mark.parametrize("fast", [False, True])
def test_substring_dedup_fixture(spark, fast):
    from sparklead.substrings import scrub_duplicate_substrings, substring_dup_stats

    df = spark.createDataFrame(FIXTURE, "doc_id: bigint, tokens: array<string>")
    exp = _py_substring_dedup(dict(FIXTURE), 8)
    stats = {r["doc_id"]: r.asDict() for r in substring_dup_stats(df, l=8, fast=fast).collect()}
    assert set(stats) == set(exp)
    for k, e in exp.items():
        for c in ("n_windows", "n_dup_windows", "n_dup_tokens"):
            assert stats[k][c] == e[c], (k, c, stats[k], e)
    # the quoted span scrubs, the canonical survives whole, the verbatim
    # dup scrubs to nothing, short/NULL docs pass through
    clean = {
        r["doc_id"]: r["clean_tokens"]
        for r in scrub_duplicate_substrings(df, l=8, fast=fast).collect()
    }
    assert clean[1] == FIXTURE[0][1]
    assert clean[2] == ["x", "y", "z"]
    assert clean[4] == FIXTURE[3][1]
    assert clean[5] is None
    assert clean[6] == []
    for k, e in exp.items():
        assert clean[k] == e["clean"], (k, clean[k], e["clean"])
    # ppm is exact integer arithmetic: doc 6 fully covered -> 1_000_000
    assert stats[6]["dup_token_ppm"] == 1_000_000
    assert stats[2]["dup_token_ppm"] == 8 * 1_000_000 // 11


@settings(max_examples=5, deadline=None)
@given(st.data())
def test_substring_dedup_matches_python_oracle(spark, data):
    """Tiny alphabet + short windows force a collision-rich duplicate
    structure (within-doc repeats, overlapping spans, cross-doc quotes)."""
    from sparklead.substrings import scrub_duplicate_substrings, substring_dup_stats

    l = data.draw(st.integers(min_value=2, max_value=4))
    doc = st.lists(st.integers(min_value=0, max_value=2), min_size=0, max_size=12)
    toks = data.draw(st.lists(st.one_of(st.none(), doc), min_size=1, max_size=8))
    docs = {i: t for i, t in enumerate(toks)}
    exp = _py_substring_dedup(docs, l)
    df = spark.createDataFrame(
        list(docs.items()), "doc_id: bigint, tokens: array<int>"
    )
    stats = {r["doc_id"]: r.asDict() for r in substring_dup_stats(df, l=l, fast=False).collect()}
    clean = {
        r["doc_id"]: r["clean_tokens"]
        for r in scrub_duplicate_substrings(df, l=l, fast=False).collect()
    }
    assert set(stats) == set(exp) and set(clean) == set(exp)
    for k, e in exp.items():
        for c in ("n_windows", "n_dup_windows", "n_dup_tokens"):
            assert stats[k][c] == e[c], (docs, l, k, c, stats[k], e)
        assert clean[k] == e["clean"], (docs, l, k, clean[k], e["clean"])


def test_substring_dedup_lanes_and_partition_invariance(spark):
    """fast (xxhash64-slice) and portable (md5-joined) lanes agree on the
    synth corpus (hot templates seed real cross-doc window dups), and the
    result is invariant under repartitioning."""
    from sparklead.substrings import substring_dup_stats
    from sparklead.synth import pretokenized

    docs = pretokenized(spark, 300, partitions=3)

    def snap(df, **kw):
        return {
            r["doc_id"]: (r["n_windows"], r["n_dup_windows"], r["n_dup_tokens"])
            for r in substring_dup_stats(df, l=8, **kw).collect()
        }

    a = snap(docs, fast=False)
    b = snap(docs, fast=True)
    c = snap(docs.repartition(11), fast=True)
    assert a == b == c
    assert any(v[1] > 0 for v in a.values()), "fixture seeded no duplicates"


def test_substring_stats_plan_pins(spark, tmp_path):
    """Design-for-scale pins: (1) with n_tok_col the base branch's parquet
    scan prunes the token payload (the packing decision-lane lesson) and
    the payload is read exactly once; (2) detection runs ONE gram window
    over one exchange (count + row_number share the sort); (3) no
    cartesian/broadcast-nested-loop anywhere."""
    from sparklead.substrings import substring_dup_stats
    from sparklead.synth import pretokenized

    path = str(tmp_path / "corpus")
    pretokenized(spark, 300, partitions=4).write.parquet(path)
    t = spark.read.parquet(path)
    plan = (
        substring_dup_stats(t, l=8, n_tok_col="n_tok")
        ._jdf.queryExecution().executedPlan().toString()
    )
    schemas = [
        ln.split("ReadSchema:", 1)[1] for ln in plan.splitlines() if "ReadSchema:" in ln
    ]
    assert sum("tokens" in s for s in schemas) == 1, schemas
    assert any("tokens" not in s and "n_tok" in s for s in schemas), schemas
    assert plan.count("Window") == 1, plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    assert plan.count("Exchange hashpartitioning") == 2, plan
