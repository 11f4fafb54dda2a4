"""Round-4 fixes: variance-aware bench protocol (bench.py), bounded
AUC/threshold windows via score quantization, unbiased IVF fit sample,
miner cache hygiene (no persisted frames outlive parse_*), folded dim
probes, neardup_components convergence signalling + adversarial depth,
streaming lost-checkpoint generation reset (multi-batch), resume schema
validation, chronological-split degenerate-tie fallback."""

import json
import os

import pytest
from pyspark.sql import functions as F

from sparklead import synth


# ------------------------------------------------- AUC/threshold quantization

def test_auc_quantize_bounds_histogram(spark):
    """Continuous scores (raw doubles) make the score histogram data-sized —
    the quantized sweep must run over <= range*10^6+1 rows and move AUC/F1
    by < 1e-4 vs the exact computation."""
    from sparklead.detectors.ad import _score_hist, roc_auc, threshold_search

    n = 4000
    scores = spark.range(n).select(
        (F.pmod(F.xxhash64("id"), 2) == 0).cast("int").alias("label"),
        # full-precision continuous double in [0, 1): every value distinct
        ((F.pmod(F.xxhash64("id", F.lit(7)), 1_000_000_000) / 1e9)
         + F.pmod(F.xxhash64("id", F.lit(11)), 997) / 1e13).alias("score"),
    )
    exact_hist = _score_hist(scores, "label", "score", quantize=None)
    q_hist = _score_hist(scores, "label", "score", quantize=6)
    assert exact_hist.count() == n  # continuous: cardinality == rows
    # quantized histogram is bounded (round-5: by 2*10^6+1 for ANY range,
    # via max-abs normalization), and smaller here
    assert q_hist.count() < n
    # every histogram score sits on the normalized grid k/1e6 * max_abs
    # (the window input is the quantized column, never the raw doubles)
    mx = scores.agg(F.max(F.abs("score"))).first()[0]
    off_grid = q_hist.filter(
        F.col("score") != F.floor(F.col("score") / F.lit(mx) * 1e6 + 0.5) / 1e6 * F.lit(mx)
    )
    assert off_grid.count() == 0
    auc_exact = roc_auc(scores, quantize=None).first()["auc"]
    auc_q = roc_auc(scores).first()["auc"]
    assert abs(auc_exact - auc_q) < 1e-4
    f1_exact = threshold_search(scores, quantize=None).first()["best_f1"]
    f1_q = threshold_search(scores).first()["best_f1"]
    assert abs(f1_exact - f1_q) < 1e-4


# ------------------------------------------------- chronological split ties

def test_chronological_split_degenerate_ties(spark):
    """All-one-timestamp input: the percentile cutoff equals min(time), so
    the filter split would put EVERYTHING in test (empty train kills
    .train()). Round-5 fallback (advisor fix): the tied mass is hash-split
    (partitioned — the round-4 global percent_rank window funnelled a 100 TB
    coarse-timestamp input through one task), so fractions are approximate
    like the shuffle=True path; both sides non-empty, no Window in the plan."""
    from sparklead.detectors.ad import train_test_split

    n = 2000
    df = spark.range(n).select(
        F.col("id").alias("seq_id"), F.lit(5).alias("start_time")
    )
    tr, te = train_test_split(df, test_frac=0.3, shuffle=False, time_col="start_time")
    n_tr, n_te = tr.count(), te.count()
    assert n_tr + n_te == n
    assert abs(n_te - 0.3 * n) < 0.05 * n  # ~requested fraction, hash-split
    # scale guarantee: the fallback plan contains NO window operator
    assert "Window" not in te._jdf.queryExecution().executedPlan().toString()
    # mixed ties: rows strictly after the tied minimum ALL land in test
    df3 = spark.range(n).select(
        F.col("id").alias("seq_id"),
        F.when(F.col("id") < 0.9 * n, 5).otherwise(6).alias("start_time"),
    )
    tr3, te3 = train_test_split(df3, test_frac=0.3, shuffle=False, time_col="start_time")
    assert tr3.filter(F.col("start_time") == 6).count() == 0
    assert abs(te3.count() - 0.3 * n) < 0.05 * n
    # normal path untouched: distinct times still split by cutoff with
    # max(train) <= min(test)
    df2 = spark.range(100).select(
        F.col("id").alias("seq_id"), F.col("id").alias("start_time")
    )
    tr2, te2 = train_test_split(df2, test_frac=0.3, shuffle=False, time_col="start_time")
    assert tr2.agg(F.max("start_time")).first()[0] <= te2.agg(F.min("start_time")).first()[0]
    assert abs(tr2.count() - 70) <= 2


# ------------------------------------------------- IVF fit-sample bias

def _two_cluster_vecs(spark, n_per: int = 600, dim: int = 8):
    """Content-sorted corpus: ids [0, n_per) tight around +10, ids
    [n_per, 2*n_per) tight around -10; range-partitioned by id so the
    physical prefix is ENTIRELY cluster A (the layout a curated corpus
    sorted by source/time/content produces)."""
    from pyspark.ml.functions import array_to_vector

    base = spark.range(2 * n_per).select(
        F.col("id").alias("neighbor_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda d: F.when(F.col("id") < n_per, F.lit(10.0)).otherwise(F.lit(-10.0))
            + (F.pmod(F.xxhash64(F.col("id").cast("string"), d.cast("string")), 100) / 100.0),
        ).alias("cv"),
    )
    return base.withColumn("_v", array_to_vector(F.col("cv").cast("array<double>"))).repartitionByRange(
        8, "neighbor_id"
    )


def test_ivf_fit_sample_not_prefix_biased(spark):
    """VERDICT #3 / advisor: a bare limit() fits KMeans on the ordered
    prefix — on a content-sorted corpus every centroid lands in cluster A
    and cluster B is invisible to the quantizer. The sampled fit must place
    at least one centroid in EACH cluster."""
    from sparklead.similarity import _ivf_fit

    vecs = _two_cluster_vecs(spark)

    def sides(model):
        centers = [list(c) for c in model.clusterCenters()]
        return (
            sum(1 for c in centers if sum(c) > 0),   # cluster-A-side centroids
            sum(1 for c in centers if sum(c) < 0),   # cluster-B-side centroids
        )

    # prefix fit (fraction=1.0 reproduces the old limit-only behavior):
    # 100-row prefix of a range-partitioned corpus = cluster A only
    a, b = sides(_ivf_fit(vecs, n_centroids=4, seed=42, fit_sample=100, fit_fraction=1.0))
    assert b == 0, "prefix fit unexpectedly saw cluster B — fixture broken"
    # sampled fit: the draw spans the corpus, both clusters get centroids
    a, b = sides(_ivf_fit(vecs, n_centroids=4, seed=42, fit_sample=100, fit_fraction=0.05))
    assert a >= 1 and b >= 1


def test_ivf_fit_tiny_corpus_fallback(spark):
    """Corpora too small for the sample to yield n_centroids rows must fall
    back to the prefix fit instead of dying."""
    from sparklead.similarity import _ivf_fit, ivf_topk

    vecs = _two_cluster_vecs(spark, n_per=20)
    model = _ivf_fit(vecs, n_centroids=8, seed=42, fit_sample=100, fit_fraction=0.01)
    assert len(model.clusterCenters()) >= 1
    # end-to-end still returns neighbors on a tiny corpus
    corpus = vecs.select("neighbor_id", F.col("cv").alias("embedding")).withColumnRenamed(
        "neighbor_id", "vec_id"
    )
    out = ivf_topk(corpus.filter(F.col("vec_id") < 3), corpus, k=2, n_centroids=4, n_probe=2)
    assert out.count() > 0


# ------------------------------------------------- miner cache hygiene

def test_miners_leave_no_persisted_frames(spark, sf_dir):
    """VERDICT #4: parse_brain / parse_iplom / parse_pl_iplom must not
    accrete storage in long-lived sessions — after the call returns AND the
    outputs are materialized, no RDD remains persisted."""
    from sparklead import synth as _synth
    from sparklead.enhancers import eventlog as E
    from sparklead.mining.brain import parse_brain
    from sparklead.mining.iplom import parse_iplom
    from sparklead.mining.pl_iplom import parse_pl_iplom
    from sparklead.sources.hdfs import load_hdfs_events

    df = E.words(E.normalize(load_hdfs_events(_synth.raw_log_corpus(spark, 500))), "e_message_normalized")
    spark.catalog.clearCache()
    for parse in (parse_brain, parse_iplom, parse_pl_iplom):
        assigned, templates = parse(df, "e_words")
        assert templates.count() > 0
        assert assigned.count() == 500
        jsc = spark.sparkContext._jsc
        assert jsc.getPersistentRDDs().size() == 0, f"{parse.__name__} leaked cache"


def test_brain_content_key_partition_invariant(spark):
    """The content-hash line id must make Brain's clustering identical under
    any partitioning (the old monotonically_increasing_id needed a cache to
    pin one numbering)."""
    from sparklead import synth as _synth
    from sparklead.enhancers import eventlog as E
    from sparklead.mining.brain import parse_brain
    from sparklead.sources.hdfs import load_hdfs_events

    df = E.words(E.normalize(load_hdfs_events(_synth.raw_log_corpus(spark, 400))), "e_message_normalized")
    t1 = parse_brain(df, "e_words")[1].select("template", "cluster_size").collect()
    t2 = parse_brain(df.repartition(13), "e_words")[1].select("template", "cluster_size").collect()
    key = lambda rows: sorted((r["template"], r["cluster_size"]) for r in rows)
    assert key(t1) == key(t2)


# ------------------------------------------------- folded dim probes

def test_dim_param_skips_probe_job(spark, sf_dir):
    """VERDICT #5: with dim supplied, building the near-dup candidate frame
    must run exactly ONE driver job (the plane-weights materialization);
    without it, the one-row dim probe adds a second."""
    from sparklead.dedup import embedding_neardup_candidates

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select("vec_id", "embedding")
    dim = len(emb.first()["embedding"])
    tracker = spark.sparkContext.statusTracker()
    sc = spark.sparkContext

    # round-9 fix: count jobs in a FRESH job group per construction — the
    # old before/after length diff over the default group broke once the
    # suite's total job count crossed spark.ui.retainedJobs (old ids are
    # evicted between the two length reads, making the diff negative)
    sc.setJobGroup("r4_probe_with_dim", "dim supplied")
    embedding_neardup_candidates(emb, dim=dim)  # plan construction only
    with_dim = len(tracker.getJobIdsForGroup("r4_probe_with_dim"))

    sc.setJobGroup("r4_probe_without_dim", "dim probed")
    embedding_neardup_candidates(emb)
    without_dim = len(tracker.getJobIdsForGroup("r4_probe_without_dim"))
    sc.setJobGroup(None, None)

    assert with_dim == 1  # plane_weights only
    assert without_dim == 2  # + the dim probe


# ------------------------------------------------- components: depth + signal

def test_neardup_components_adversarial_chain(spark):
    """VERDICT #7 / advisor: a chain longer than max_iter hops cannot
    converge — the truncated result must (a) warn, (b) err on the
    UNDER-dedup side (multiple labels for one true group), and (c) leave
    only the returned labels persisted (balanced per-iteration
    persist/unpersist). A large-enough max_iter converges with no warning.
    Round-9: targets the distributed LOOP lane explicitly
    (small_graph_edges=None) — the default small-graph fast path resolves
    tiny graphs exactly and never truncates (tests/test_round9.py)."""
    from sparklead.dedup import neardup_components

    n = 14  # chain 0-1-2-...-13 (13 hops)
    pairs = spark.range(n - 1).select(
        F.col("id").alias("a_id"), (F.col("id") + 1).alias("b_id")
    )
    spark.catalog.clearCache()
    with pytest.warns(RuntimeWarning, match="did not converge"):
        labels = neardup_components(pairs, max_iter=3, small_graph_edges=None)
        comps = {r["id"]: r["component"] for r in labels.collect()}
    # truncation = under-dedup: more than one component label survives,
    # but label 0 has propagated exactly max_iter hops
    assert len(set(comps.values())) > 1
    assert comps[3] == 0 and comps[4] != 0
    # persist balance: exactly the returned frame remains cached
    jsc = spark.sparkContext._jsc
    assert jsc.getPersistentRDDs().size() == 1
    labels.unpersist()
    assert jsc.getPersistentRDDs().size() == 0
    # converged run: one component, no warning
    import warnings as _w

    with _w.catch_warnings():
        _w.simplefilter("error", RuntimeWarning)
        labels2 = neardup_components(pairs, max_iter=n, small_graph_edges=None)
        assert {r["component"] for r in labels2.collect()} == {0}
    labels2.unpersist()
    # diameter == max_iter exactly: the LAST round makes the converging
    # change — the probe must distinguish this from truncation (no warning)
    short = spark.range(3).select(F.col("id").alias("a_id"), (F.col("id") + 1).alias("b_id"))
    with _w.catch_warnings():
        _w.simplefilter("error", RuntimeWarning)
        labels3 = neardup_components(short, max_iter=3, small_graph_edges=None)
        assert {r["component"] for r in labels3.collect()} == {0}
    labels3.unpersist()


# ------------------------------------------------- streaming generation reset

def test_stream_reset_clears_stale_multibatch_generation(spark, tmp_path):
    """Advisor fix: pre-checkpoint-loss run committed MULTIPLE batches; the
    restarted availableNow run repacks all input into fewer batches. The old
    overwrite-same-id logic left stale batch_id=1..k dirs double-counting —
    the generation reset must wipe them and start a fresh manifest."""
    import shutil

    from sparklead.streaming import stream_route

    inp, out = str(tmp_path / "in"), str(tmp_path / "out")
    pt = synth.pretokenized(spark, 300)
    # three single-file appends -> 3 micro-batches at maxFilesPerTrigger=1
    for lo, hi in ((0, 100), (100, 200), (200, 300)):
        pt.filter(
            (F.col("doc_id") >= f"doc_{lo:09d}") & (F.col("doc_id") < f"doc_{hi:09d}")
        ).coalesce(1).write.mode("append").parquet(inp)
    stream_route(
        spark, inp, out, synth.source_meta(spark), max_files_per_trigger=1
    ).awaitTermination(180)
    sink = os.path.join(out, "seq_features")
    assert spark.read.parquet(sink).count() == 300
    assert len([d for d in os.listdir(sink) if d.startswith("batch_id=")]) == 3
    # lose the checkpoint, grow the input; rerun UNBOUNDED (all 4 files
    # repack into one new batch 0)
    shutil.rmtree(os.path.join(out, "_checkpoint"))
    pt2 = synth.pretokenized(spark, 400).filter(F.col("doc_id") >= "doc_000000300")
    pt2.coalesce(1).write.mode("append").parquet(inp)
    stream_route(spark, inp, out, synth.source_meta(spark)).awaitTermination(180)
    # no double count: stale batch_id=1,2 dirs of the dead generation wiped
    assert spark.read.parquet(sink).count() == 400
    assert len([d for d in os.listdir(sink) if d.startswith("batch_id=")]) == 1
    manifest = [json.loads(l) for l in open(os.path.join(out, "stream_manifest.jsonl"))]
    committed = [m for m in manifest if m.get("committed")]
    assert [m["batch_id"] for m in committed] == [0]
    # row totals in the fresh manifest match the sink exactly
    rows = [m["rows"] for m in manifest if "rows" in m and "committed" not in m]
    assert sum(rows) == 400


# ------------------------------------------------- resume schema validation

def test_route_resume_rewrites_on_schema_drift(spark, tmp_path):
    """Advisor fix: a complete sink whose schema no longer matches what the
    thunk would write (older pipeline layout) must be REWRITTEN on resume,
    not skipped into a downstream AnalysisException."""
    from sparklead import routing

    out = str(tmp_path / "sinks")
    v1 = lambda: spark.range(10).select("id")
    v2 = lambda: spark.range(10).select("id", (F.col("id") * 2).alias("extra"))
    m1 = routing.route({"s": v1}, out)
    assert "resumed" not in m1["s"]
    # same schema -> resumed, byte-identical skip
    m2 = routing.route({"s": v1}, out, resume=True)
    assert m2["s"].get("resumed") is True
    # schema drift -> rewritten with the new columns
    m3 = routing.route({"s": v2}, out, resume=True)
    assert "resumed" not in m3["s"]
    assert set(spark.read.parquet(os.path.join(out, "s")).columns) == {"id", "extra"}


def test_pipeline_resume_from_old_layout(spark, tmp_path):
    """End-to-end: an out_dir whose token_vectors sink lacks the carried
    seq_features scalars (pre-staged layout) must resume cleanly — the
    stale sink is rewritten and seq_features derives without error."""
    from sparklead import routing
    from sparklead.pipeline import run_pipeline, token_vectors, parse_stage, enrich_stage

    out = str(tmp_path / "pipe")
    pt, meta = synth.pretokenized(spark, 500), synth.source_meta(spark)
    # simulate the OLD layout: token_vectors WITHOUT keep columns
    enriched = enrich_stage(parse_stage(pt), meta)
    routing.route({"token_vectors": lambda: token_vectors(enriched)}, out)
    res = run_pipeline(pt, meta, out_dir=out, resume=True)
    assert res["manifests"]["seq_features"]["rows"] == 500
    tv_cols = set(spark.read.parquet(os.path.join(out, "token_vectors")).columns)
    assert {"label", "region", "template_id"} <= tv_cols


# ------------------------------------------------- gated dedup decision layer

def test_embedding_neardup_gate_carries_decision(spark, sf_dir):
    """VERDICT #8: the gated embedding_neardup frame must carry the
    keep/drop decision — n_kept == corpus - n_dropped, and every pair row's
    component is the group's kept (minimum) id."""
    import __spark_entry__ as entry

    out = entry.queries()["embedding_neardup"](spark, sf_dir).collect()
    assert out
    r0 = out[0]
    corpus_n = spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()
    n_seeded = spark.read.parquet(f"{sf_dir}/embeddings.parquet").filter(
        F.col("vec_id") % 5 == 0
    ).count()
    assert r0["n_kept"] + r0["n_dropped"] == corpus_n + n_seeded
    # seeded pairs a <-> a+10000: component == a == min id of the group
    for r in out:
        assert r["component"] == min(r["a_id"], r["b_id"]) or r["component"] < r["a_id"]
        assert r["group_size"] >= 2


# ------------------------------------------------- banded LSH top-k

def _lsh_corpus(spark, n: int = 400, dim: int = 16, n_q: int = 40):
    """Deterministic pseudo-random corpus + queries that are small
    perturbations of corpus vectors (true top-1 neighbor = the source)."""
    base = spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda d: (F.pmod(F.xxhash64(F.col("id").cast("string"), d.cast("string")), 2001) - 1000)
            / 1000.0,
        ).alias("embedding"),
    )
    q = base.filter(F.col("vec_id") < n_q).select(
        (F.col("vec_id") + 100_000).alias("vec_id"),
        F.transform(
            "embedding",
            lambda x: x
            + (F.pmod(F.xxhash64(x.cast("string"), F.lit("q")), 101) - 50) / 2000.0,
        ).alias("embedding"),
    )
    return base, q


def test_lsh_banded_beats_single_table(spark):
    """Multi-table sign-LSH: same per-table bucket size (16 planes) but 4
    independent tables — recall of the true (seeded) nearest neighbor must
    strictly improve over one 16-plane table, at bounded candidate volume."""
    from sparklead.similarity import lsh_topk, lsh_topk_banded

    base, q = _lsh_corpus(spark)

    def recall(out):
        hits = out.filter(
            (F.col("rank") == 1) & (F.col("neighbor_id") == F.col("query_id") - 100_000)
        ).count()
        return hits / 40.0

    r_single = recall(lsh_topk(q, base.unionByName(q), k=1, n_planes=16))
    r_banded = recall(lsh_topk_banded(q, base.unionByName(q), k=1, n_planes=16, n_tables=4))
    assert r_banded > r_single
    assert r_banded >= 0.6


def test_lsh_banded_one_table_equals_single(spark):
    """n_tables=1 must reproduce the single-table lsh_topk exactly (same
    plane set, same candidates, same ranks)."""
    from sparklead.similarity import lsh_topk, lsh_topk_banded

    base, q = _lsh_corpus(spark, n=200, n_q=15)
    corpus = base.unionByName(q)
    a = lsh_topk(q, corpus, k=3, n_planes=6)
    b = lsh_topk_banded(q, corpus, k=3, n_planes=6, n_tables=1)
    key = lambda df: sorted(
        (r["query_id"], r["neighbor_id"], r["rank"]) for r in df.collect()
    )
    assert key(a) == key(b)


# ------------------------------------------------- explicit skew handling

def test_salted_join_equals_plain_join(spark):
    """salted_join must reproduce the plain equi-join exactly (inner and
    left) on a hot-key-skewed input, while joining on (key, salt) so the hot
    key's rows spread across n_salts reduce partitions."""
    from sparklead.skew import salted_join

    # 90% of rows share one hot key
    big = spark.range(2000).select(
        F.col("id").alias("row_id"),
        F.when(F.col("id") % 10 < 9, F.lit("hot")).otherwise(
            F.concat(F.lit("k"), F.col("id") % 7)
        ).alias("k"),
        (F.col("id") * 3).alias("v"),
    )
    small = spark.createDataFrame(
        [("hot", "HOT"), ("k1", "K1"), ("k3", "K3"), ("unmatched", "X")],
        "k string, label string",
    )
    for how in ("inner", "left"):
        plain = big.join(small, "k", how)
        salted = salted_join(big, small, "k", n_salts=8, how=how)
        keyf = lambda df: sorted(
            (r["row_id"], r["k"], r["v"], r["label"]) for r in df.collect()
        )
        assert keyf(salted) == keyf(plain)
    # the join condition really includes the salt (hot key spread)
    plan = salted_join(big, small, "k", n_salts=8)._jdf.queryExecution().executedPlan().toString()
    assert "_salt" in plan


def test_salted_distinct_count_exact(spark):
    """Sum of per-(key, item-hash-bucket) distinct counts == exact distinct
    count per key, including a hot key holding most of the distinct mass."""
    from sparklead.skew import salted_distinct_count

    df = spark.range(5000).select(
        F.when(F.col("id") % 5 < 4, F.lit("hot")).otherwise(F.lit("cold")).alias("k"),
        (F.col("id") % 997).cast("string").alias("item"),
    )
    got = {r["k"]: r["n_distinct"] for r in salted_distinct_count(df, "k", "item").collect()}
    want = {
        r["k"]: r["d"]
        for r in df.groupBy("k").agg(F.countDistinct("item").alias("d")).collect()
    }
    assert got == want


def test_route_resume_trust_escapes(spark, tmp_path):
    """Two deliberate trust-the-manifest escapes: (a) a manifest with no
    recorded schema (foreign writer) resumes as-is; (b) a thunk whose plan
    is no longer analyzable (upstream input archived after the sinks
    completed) resumes as-is instead of failing the route call."""
    import json as _json
    import shutil

    from sparklead import routing

    out = str(tmp_path / "sinks")
    # (a) strip the recorded schema -> drifted thunk still resumes
    routing.route({"a": lambda: spark.range(5).select("id")}, out)
    mpath = os.path.join(out, "a", routing.MANIFEST)
    m = _json.load(open(mpath))
    del m["schema"]
    _json.dump(m, open(mpath, "w"))
    r = routing.route(
        {"a": lambda: spark.range(5).select("id", (F.col("id") * 2).alias("x"))},
        out,
        resume=True,
    )
    assert r["a"].get("resumed") is True
    # (b) thunk reads an input that no longer exists -> resume, no raise
    src = str(tmp_path / "src")
    spark.range(7).write.parquet(src)
    routing.route({"b": lambda: spark.read.parquet(src).select("id")}, out)
    shutil.rmtree(src)
    r2 = routing.route(
        {"b": lambda: spark.read.parquet(src).select("id")}, out, resume=True
    )
    assert r2["b"].get("resumed") is True


# ------------------------------------------------- full-repo review fixes

def test_token_vectors_empty_tokens(spark):
    """A single empty pre-tokenized sequence must not kill the pipeline:
    sequence(1, 0) auto-steps to [1, 0] and element_at(_, 0) threw —
    empty docs now yield empty vocab/counts and simhash 0."""
    from sparklead.pipeline import token_vectors

    df = spark.createDataFrame(
        [("d0", [3, 1, 3], 3, "s"), ("d1", [], 0, "s")],
        "doc_id string, tokens array<int>, n_tok int, source string",
    )
    rows = {r["doc_id"]: r for r in token_vectors(df).collect()}
    assert rows["d1"]["vocab"] == [] and rows["d1"]["counts"] == []
    assert rows["d1"]["simhash"] == 0
    assert rows["d0"]["vocab"] == [1, 3] and rows["d0"]["counts"] == [1, 2]


def test_lines_len_crlf_not_double_counted(spark):
    """(\\n|\\r|\\r\\n) counted a CRLF as TWO breaks; longest-first fixes it."""
    from sparklead.enhancers import eventlog as E

    df = spark.createDataFrame([("a\r\nb",), ("a\nb",), ("a\rb",)], "m_message string")
    vals = [r["e_lines_len"] for r in E.length(df).collect()]
    assert vals == [1, 1, 1]


def test_item_cumsum_default_name_no_trailing_underscore(spark):
    from sparklead.enhancers.eventlog import item_cumsum

    df = spark.createDataFrame(
        [(1, "a", False), (2, "b", True)], "ts int, e_message_normalized string, anomaly boolean"
    )
    out = item_cumsum(df, order_cols=("ts",), ano_only=False, unique_only=False)
    assert "cumu_items" in out.columns and "cumu_items_" not in out.columns


def test_merge_multiline_carried_columns_head_line(spark):
    """Carried columns must take the entry HEAD line's value (min_by over
    the order key), not an arbitrary first() after the shuffle."""
    from sparklead.sources.raw import merge_multiline

    df = spark.createDataFrame(
        [
            ("081109 203518 INFO start", "f", 0, "INFO"),
            ("  at java.Foo", "f", 1, None),
            ("  at java.Bar", "f", 2, None),
        ],
        "m_message string, file_name string, line_nr long, level string",
    ).repartition(4)
    rows = merge_multiline(df).collect()
    assert len(rows) == 1
    assert rows[0]["level"] == "INFO"
    assert rows[0]["m_message"].count("\n") == 2


def test_interval_join_overlapping_windows_no_duplicates(spark):
    """Overlapping injection windows for one pod must not duplicate events."""
    from sparklead.sources.nezha import interval_label_join

    ev = spark.createDataFrame(
        [(i, "p1", f"2024-01-01 12:{m:02d}:30") for i, m in enumerate(range(0, 10))],
        "event_id int, pod string, ts string",
    ).select("event_id", "pod", F.to_timestamp("ts").alias("m_timestamp"))
    labels = spark.createDataFrame(
        [("p1", "2024-01-01 12:00:00"), ("p1", "2024-01-01 12:01:00")],
        "pod string, t string",
    ).select("pod", F.to_timestamp("t").alias("inject_time"))
    out = interval_label_join(ev, labels, window_minutes=3)
    assert out.count() == 10  # no row inflation
    # union of (12:00,12:03] and (12:01,12:04]: events at minute-offsets
    # 0..3 (each at :30 seconds) fall inside, 4.. outside
    flagged = {r["event_id"] for r in out.filter("anomaly").collect()}
    assert flagged == {0, 1, 2, 3}


def test_sequence_enhancer_custom_seq_col(spark):
    """enhance(seq_col=...) must join back on the custom key."""
    from sparklead.enhancers.sequence import SequenceEnhancer

    ev = spark.createDataFrame(
        [("b1", "2024-01-01 10:00:01"), ("b1", "2024-01-01 10:00:02"), ("b2", "2024-01-01 10:00:03")],
        "block_id string, ts string",
    ).select("block_id", F.to_timestamp("ts").alias("m_timestamp"))
    seqs = ev.select("block_id").distinct()
    out = SequenceEnhancer(ev, seqs).enhance(
        seq_col="block_id", event_col=None, token_col=None, chars_len_col=None
    )
    got = {r["block_id"]: r["seq_len"] for r in out.collect()}
    assert got == {"b1": 2, "b2": 1}


def test_nep_unseen_ngram_perplexity_inf(spark):
    """A held-out sequence containing an UNSEEN transition must score
    perplexity +inf (the reference's numpy log(0) -> -inf path), not NULL —
    these are exactly the sequences the detector exists to flag."""
    import math

    from sparklead.detectors.nep import NGramModel

    train = spark.createDataFrame([(1, ["a", "b", "c"]), (2, ["a", "b", "c"])], "seq_id int, events array<string>")
    test = spark.createDataFrame([(3, ["a", "z", "c"]), (4, ["a", "b", "c"])], "seq_id int, events array<string>")
    model = NGramModel.fit(train, n=2)
    rows = {r["seq_id"]: r for r in model.score(test).collect()}
    assert rows[3]["nep_prob_nmax_perp"] is not None
    assert math.isinf(rows[3]["nep_prob_nmax_perp"])
    assert math.isfinite(rows[4]["nep_prob_nmax_perp"])


def test_nep_event_labels_with_spaces(spark):
    """n-gram keys are joined with a control char, so labels containing
    spaces neither collide nor break the winner prefix/suffix extraction."""
    from sparklead.detectors.nep import NGramModel

    train = spark.createDataFrame(
        [(i, ["disk full", "ok"]) for i in range(3)], "seq_id int, events array<string>"
    )
    model = NGramModel.fit(train, n=2)
    r = model.score(train).filter("seq_id = 0").first()
    # the 'disk full' -> 'ok' transition is frequent: predicted correctly
    # with a full count, and the prediction is the bare label
    assert "ok" in r["nep_predict"]
    assert r["nep_abs"][1] == 3 and r["nep_corr"][1] == 1


def test_lenma_update_uses_latest_wordlens(spark):
    """Reference lenma.update() REPLACES the stored word-length vector with
    the newest merged line's lengths — a line similar to the latest member
    (but not the seed) must merge."""
    from sparklead.mining.two_phase import LocalLenMa

    m = LocalLenMa(threshold=0.9)
    m.add(["ab", "xy"])          # seed lengths [2, 2]
    m.add(["ab", "xyxyxyxyz"])   # merges at exactly 1.0? no — cos([2,2],[2,9]) ~ .61 -> new cluster
    assert m.n_clusters == 2
    m2 = LocalLenMa(threshold=0.95)
    m2.add(["ab", "cd"])         # [2,2]
    m2.add(["ab", "ce"])         # cos 1.0 -> merge; stored lens now [2,2] (same)
    m2.add(["abcj", "cdek"])     # [4,4]: cos([2,2],[4,4]) = 1.0 -> merges, stored lens -> [4,4]
    m2.add(["abcd", "cdef"])     # [4,4] vs stored [4,4] -> merge (stale [2,2] would also match
                                 # here; the REAL check is the stored vector below)
    assert m2.n_clusters == 1
    assert m2.by_len[2][0][2] == [4, 4]  # latest line's lengths, not the seed's


# ------------------------------------------------- incremental drain stream

def test_stream_drain_incremental_snapshots(spark, tmp_path):
    """Checkpointed incremental template mining (the drain3 periodic-
    snapshot analogue): multi-batch run mines all lines exactly once into
    versioned snapshots; a resumed run with new data updates counts without
    re-counting old batches; replay with no new data changes nothing."""
    from sparklead import synth
    from sparklead.enhancers import eventlog as E
    from sparklead.mining.drain import DrainMiner
    from sparklead.sources.hdfs import load_hdfs_events
    from sparklead.streaming import load_latest_drain_templates, stream_drain_templates

    inp, tdir = str(tmp_path / "in"), str(tmp_path / "tpl")

    def tokenized(n, seed_shift=0):
        ev = load_hdfs_events(synth.raw_log_corpus(spark, n))
        return E.words(E.normalize(ev), "e_message_normalized").select(
            F.col("seq_id"), F.col("e_words")
        )

    tokenized(300).coalesce(2).write.mode("append").parquet(inp)
    stream_drain_templates(
        spark, inp, tdir, max_files_per_trigger=1
    ).awaitTermination(180)
    miner = load_latest_drain_templates(spark, tdir)
    assert sum(c for _, c in miner.templates) == 300  # every line counted once
    n_batches_1 = len(
        [d for d in os.listdir(tdir) if d.startswith("batch_id=")]
    )
    assert n_batches_1 >= 2  # multi-batch really exercised
    # batch-fit miner on the same corpus finds the same template STRINGS
    batch_templates = {
        " ".join(t) for t, _ in DrainMiner().fit(tokenized(300), "e_words").templates
    }
    assert {" ".join(t) for t, _ in miner.templates} == batch_templates
    # grow the input (a fresh 150-line slice); resumed run processes ONLY
    # the new batch and counts accumulate
    tokenized(150).coalesce(1).write.mode("append").parquet(inp)
    stream_drain_templates(spark, inp, tdir).awaitTermination(180)
    miner2 = load_latest_drain_templates(spark, tdir)
    assert sum(c for _, c in miner2.templates) == 450
    # replay with nothing new: identical state
    stream_drain_templates(spark, inp, tdir).awaitTermination(180)
    miner3 = load_latest_drain_templates(spark, tdir)
    assert sum(c for _, c in miner3.templates) == 450


def test_drain_fit_survives_empty_partitions(spark):
    """Latent Arrow bug (round-4): an EMPTY input partition made
    mine_partition yield float64-dtyped empty columns that pyarrow cannot
    convert to array<string> — any sparse repartition killed the fit."""
    from sparklead.mining.drain import DrainMiner

    df = spark.createDataFrame(
        [(f"s{i}", ["evt", str(i % 3)]) for i in range(6)], "seq_id string, e_words array<string>"
    ).repartition(64)  # 64 partitions, 6 rows -> mostly empty
    m = DrainMiner().fit(df, "e_words")
    assert sum(c for _, c in m.templates) == 6


def test_quantizer_bitwise_identical_to_duckdb(spark):
    """The floor(x*1e6+0.5)/1e6 quantizer must produce BIT-IDENTICAL doubles
    in Spark and DuckDB (the whole point of abandoning round(): engine
    round() half-way semantics differ) — checked on adversarial values
    sitting near .5e-6 boundaries plus a pseudo-random sweep."""
    import struct

    import duckdb

    edge = [0.1234565, 0.1234575, 0.9999995, 1e-7, 4.9999999e-7, 0.5e-6, 123.4567895]
    rand = [((i * 2654435761) % 10_000_019) / 10_000_019.0 for i in range(500)]
    vals = edge + rand
    # round-5: the quantizer normalizes by max(abs(score)) first — the whole
    # normalize-quantize-rescale chain must stay bit-identical (div/mul are
    # IEEE exact-rounded, so determinism survives the two extra ops); use an
    # awkward non-power-of-two max so the division is inexact
    mx = 123.4567895
    sdf = spark.createDataFrame([(v,) for v in vals], "x double").select(
        (F.floor(F.col("x") / F.lit(mx) * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6) * F.lit(mx)).alias("q")
    )
    got_spark = [r["q"] for r in sdf.collect()]
    # CAST to DOUBLE: a bare decimal literal is DECIMAL in DuckDB (the real
    # oracle reads a parquet DOUBLE column, so double arithmetic applies)
    got_duck = [
        duckdb.sql(
            f"SELECT floor(CAST({v!r} AS DOUBLE) / CAST({mx!r} AS DOUBLE)"
            f" * 1000000.0 + 0.5) / 1000000.0 * CAST({mx!r} AS DOUBLE)"
        ).fetchone()[0]
        for v in vals
    ]
    bits = lambda x: struct.pack("<d", x)
    assert [bits(a) for a in got_spark] == [bits(b) for b in got_duck]
