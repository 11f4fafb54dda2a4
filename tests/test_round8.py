"""Round-8 additions: token-free packing decision lane (plan pin + null
normalization), mixture source-cardinality guard + dtype-faithful budgets,
decontaminate/contaminated_docs default alignment, repetition filters."""

import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F


# --------------------------------------------- packing: token-free lane

def _read_schemas(plan: str) -> list[str]:
    return [
        line.split("ReadSchema:", 1)[1]
        for line in plan.splitlines()
        if "ReadSchema:" in line
    ]


def test_pack_assignment_branch_prunes_tokens(spark, tmp_path):
    """Round-7 verdict #1: the decision lane's parquet scan must read ONLY
    the scalar columns — chunk sizes are arithmetic on the pre-chunk n_tok
    scalar, so Catalyst prunes the token payload from the assignment
    branch. At 100 TB this is one scalar read instead of a second corpus
    scan."""
    from sparklead.packing import chunk_oversized, pack_assignments
    from sparklead.synth import pretokenized

    path = str(tmp_path / "corpus")
    pretokenized(spark, 300, partitions=4).write.parquet(path)
    df = spark.read.parquet(path)
    asg = pack_assignments(chunk_oversized(df, 16), 16)
    schemas = _read_schemas(asg._jdf.queryExecution().executedPlan().toString())
    assert schemas, "expected a parquet scan in the assignment plan"
    for s in schemas:
        assert "tokens" not in s, f"token payload not pruned from decision lane: {s}"
    # ... and the full join-back plan still reads tokens exactly once
    from sparklead.packing import pack_tokenized

    full = pack_tokenized(df, 16)
    full_schemas = _read_schemas(
        full._jdf.queryExecution().executedPlan().toString()
    )
    assert sum("tokens" in s for s in full_schemas) == 1, full_schemas


def test_chunk_oversized_null_and_garbage_sizes(spark):
    """Round-7 advisor #1: NULL tokens (and NULL/negative sizes) must
    normalize to an empty chunk 0 — not NaN/-1 into the pandas walk."""
    from sparklead.packing import chunk_oversized, pack_tokenized

    rows = [
        ("a", list(range(5)), 5, "s0"),
        ("b", None, None, "s0"),          # null doc
        ("c", [], 0, "s0"),               # empty doc
        ("d", list(range(25)), 25, "s1"),  # chunks
    ]
    df = spark.createDataFrame(
        rows, "doc_id string, tokens array<int>, n_tok int, source string"
    )
    out = {
        (r["doc_id"], r["chunk_idx"]): (r["tokens"], r["n_tok"])
        for r in chunk_oversized(df, 10).collect()
    }
    assert out[("b", 0)] == ([], 0)
    assert out[("c", 0)] == ([], 0)
    assert out[("a", 0)] == (list(range(5)), 5)
    assert len([k for k in out if k[0] == "d"]) == 3
    # end-to-end: the pandas walk accepts the normalized rows
    packed = pack_tokenized(df, 10)
    got = {r["doc_id"] for r in packed.collect()}
    assert got == {"a", "b", "c", "d"}
    # arithmetic chunk sizes equal the realized slice sizes on valid rows
    bad = packed.filter(F.size("tokens") != F.col("n_tok")).count()
    assert bad == 0


# --------------------------------------------- mixture: guard + dtypes

def test_mixture_source_cardinality_guard(spark):
    from sparklead.mixture import token_budget_cutoffs
    from sparklead.synth import pretokenized

    docs = pretokenized(spark, 100, partitions=2)
    budgets = {f"src{i}": 10 for i in range(5)}
    with pytest.raises(ValueError, match="max_sources"):
        token_budget_cutoffs(docs, budgets, max_sources=3)
    assert len(spark.sparkContext._jsc.getPersistentRDDs()) == 0


def test_mixture_non_string_source_column(spark):
    """Round-7 advisor #3: budgets keyed by a NON-string source column must
    join natively (no implicit casts silently dropping a source)."""
    from sparklead.mixture import sample_to_token_budget

    docs = spark.createDataFrame(
        [(f"d{i}", i % 3, 10) for i in range(30)],
        "doc_id string, source int, n_tok int",
    )
    kept = sample_to_token_budget(docs, {0: 1000, 1: 25}, fast=False)
    by_src = {
        r["source"]: r["t"]
        for r in kept.groupBy("source").agg(F.sum("n_tok").alias("t")).collect()
    }
    assert by_src[0] == 100  # over-budget source kept whole
    assert by_src.get(1, 0) == 20  # 25-token budget admits exactly 2 docs
    assert 2 not in by_src  # missing from budgets -> dropped
    # a budget key that cannot carry the corpus dtype fails LOUDLY
    with pytest.raises(Exception):
        sample_to_token_budget(docs, {"not-an-int": 10}).collect()


# --------------------------------------------- decontam default parity

def test_contaminated_docs_decontaminate_exact_complement_defaults(spark):
    """Round-7 advisor #2: with DEFAULT arguments the audit set and the
    kept set must partition the corpus exactly (same gram-hash lane)."""
    from sparklead.decontam import contaminated_docs, decontaminate

    corpus = spark.createDataFrame(
        [(i, f"w{i % 4} a b c d e f g h i j k l m") for i in range(40)],
        "doc_id long, text string",
    )
    ev = corpus.filter(F.col("doc_id") == 0).select("text")
    bad = {r["doc_id"] for r in contaminated_docs(corpus, ev).collect()}
    kept = {r["doc_id"] for r in decontaminate(corpus, ev).collect()}
    assert bad & kept == set()
    assert bad | kept == set(range(40))
    assert bad  # the fixture does contaminate (doc 0's near-copies)

# --------------------------------------------- repetition filters (Gopher/C4)

def _py_repetition(text, top_ns=(2, 3, 4)):
    """From-scratch oracle: same \\s+ word split, same count-based dup
    fractions, same (count, gram)-max tie-break, same short-doc zeroing."""
    import re
    from collections import Counter

    t = text or ""
    lines = t.split("\n")
    paras = t.split("\n\n")
    out = {
        "n_lines": len(lines),
        "n_dup_lines": len(lines) - len(set(lines)),
        "n_paras": len(paras),
        "n_dup_paras": len(paras) - len(set(paras)),
    }
    out["dup_line_frac"] = out["n_dup_lines"] / max(out["n_lines"], 1)
    out["dup_para_frac"] = out["n_dup_paras"] / max(out["n_paras"], 1)
    words = [w for w in re.split(r"\s+", t) if w != ""]
    for n in top_ns:
        grams = [" ".join(words[i : i + n]) for i in range(len(words) - n + 1)]
        if grams:
            c = Counter(grams)
            cnt, g = max((v, k) for k, v in c.items())
        else:
            cnt, g = 0, None
        out[f"top{n}_gram"] = g
        out[f"top{n}_count"] = cnt
        out[f"top{n}_mass"] = (cnt * len(g) / max(len(t), 1)) if g else 0.0
    return out


def test_repetition_stats_fixture(spark):
    from sparklead.textstats import repetition_stats

    rows = [
        (0, "alpha beta\nalpha beta\ngamma"),            # dup line
        (1, "para one x\n\npara one x\n\npara two y"),    # dup paragraph
        (2, "go go go go stop"),                          # top-2-gram 'go go' x3
        (3, None),                                        # null -> zeros, kept
        (4, "one"),                                       # < n words -> no grams
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r.asDict() for r in repetition_stats(df).collect()}
    assert set(got) == {0, 1, 2, 3, 4}
    for i, text in rows:
        exp = _py_repetition(text)
        for k, v in exp.items():
            gv = got[i][k]
            if isinstance(v, float):
                assert gv == pytest.approx(v, abs=1e-12), (i, k, gv, v)
            else:
                assert gv == v, (i, k, gv, v)
    assert got[0]["dup_line_frac"] == pytest.approx(1 / 3)
    assert got[1]["dup_para_frac"] == pytest.approx(1 / 3)
    assert got[2]["top2_count"] == 3 and got[2]["top2_gram"] == "go go"
    assert got[3]["n_lines"] == 1 and got[3]["top2_count"] == 0
    assert got[4]["top2_gram"] is None and got[4]["top2_mass"] == 0.0


@settings(max_examples=3, deadline=None)
@given(st.data())
def test_repetition_stats_matches_python_oracle(spark, data):
    from sparklead.textstats import repetition_stats

    word = st.text(alphabet="abX", min_size=1, max_size=3)
    line = st.lists(word, min_size=0, max_size=6).map(" ".join)
    text = st.lists(line, min_size=1, max_size=5).map("\n".join)
    texts = data.draw(st.lists(text, min_size=1, max_size=10))
    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    got = {r["doc_id"]: r.asDict() for r in repetition_stats(df).collect()}
    assert set(got) == set(range(len(texts)))
    for i, t in enumerate(texts):
        exp = _py_repetition(t)
        for k, v in exp.items():
            gv = got[i][k]
            if isinstance(v, float):
                assert gv == pytest.approx(v, abs=1e-12), (repr(t), k, gv, v)
            else:
                assert gv == v, (repr(t), k, gv, v)

# --------------------------------------------- composed LLM pipeline (e2e)

def _pipeline_corpus(spark):
    """Text corpus with seeded structure for every stage: exact dups
    (doc%40==1 copies doc-1), a verbatim eval leak (doc 7), two sources."""
    base = spark.range(0, 400).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 40 == 1, F.col("id") - 1).otherwise(F.col("id")).alias("b"),
        F.concat(F.lit("src"), (F.col("id") % 2)).alias("source"),
    )
    words = F.transform(
        F.sequence(F.lit(1), F.lit(30)),
        lambda i: F.concat(F.lit("w"), F.pmod(F.xxhash64("b", i), F.lit(500))),
    )
    return base.select("doc_id", F.array_join(words, " ").alias("text"), "source")


def test_llm_pipeline_end_to_end_and_resume(spark, tmp_path):
    """The composed dedup -> decontaminate -> tokenize -> sample -> pack job:
    stage invariants hold, no persisted state or scratch outlives the call,
    and a second run resumes every sink without recompute."""
    import pyspark.sql.functions as F  # noqa: F811

    from sparklead.llm_pipeline import run_llm_pipeline

    spark.catalog.clearCache()
    docs = _pipeline_corpus(spark)
    ev = docs.filter(F.col("doc_id") == 7).select("text")
    out_dir = str(tmp_path / "pipe")
    res = run_llm_pipeline(
        docs, ev, out_dir, budget_frac=0.5, max_tokens=64,
        salt_buckets=4, dedup_threshold=0.9, ngram_n=5,
    )
    stats = res["stats"].collect()
    assert set(res["manifests"]) == {"dedup", "clean", "pretok", "sampled", "packed"}
    # the one persisted frame (component labels) was released by the pipeline
    assert len(spark.sparkContext._jsc.getPersistentRDDs()) == 0
    # dedup: exact copies collapsed to the min-id representative
    kept = {r["doc_id"] for r in spark.read.parquet(out_dir + "/dedup").collect()}
    assert 0 in kept and 1 not in kept  # doc 1 copies doc 0
    # decontamination: the verbatim eval leak is gone
    clean_ids = {r["doc_id"] for r in spark.read.parquet(out_dir + "/clean").collect()}
    assert 7 not in clean_ids and clean_ids < kept
    # mixture: per-source kept tokens within the 50% budget of pretok totals
    pre = spark.read.parquet(out_dir + "/pretok")
    tot = {r["source"]: r["t"] for r in pre.groupBy("source").agg(F.sum("n_tok").alias("t")).collect()}
    smp = {
        r["source"]: r["t"]
        for r in spark.read.parquet(out_dir + "/sampled")
        .groupBy("source").agg(F.sum("n_tok").alias("t")).collect()
    }
    for s, t in smp.items():
        assert t <= int(tot[s] * 0.5)
    # packing: zero overfull packs, every sampled chunk assigned exactly once
    assert all(r["n_tokens"] <= 64 for r in stats)
    packed = spark.read.parquet(out_dir + "/packed")
    assert packed.groupBy("doc_id", "chunk_idx").count().filter("count > 1").count() == 0
    # resume: second run touches nothing (all manifests flagged resumed)
    res2 = run_llm_pipeline(
        docs, ev, out_dir, budget_frac=0.5, max_tokens=64,
        salt_buckets=4, dedup_threshold=0.9, ngram_n=5,
    )
    assert all(m.get("resumed") for m in res2["manifests"].values())
    assert len(spark.sparkContext._jsc.getPersistentRDDs()) == 0
    # crash-recovery: losing one sink rebuilds exactly that stage
    import shutil

    shutil.rmtree(out_dir + "/pretok")
    res3 = run_llm_pipeline(
        docs, ev, out_dir, budget_frac=0.5, max_tokens=64,
        salt_buckets=4, dedup_threshold=0.9, ngram_n=5,
    )
    assert not res3["manifests"]["pretok"].get("resumed")
    assert res3["manifests"]["dedup"].get("resumed")
    assert res3["manifests"]["packed"].get("resumed")
