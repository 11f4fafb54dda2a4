"""Round-3 fixes: banded bucket-capped embedding near-dup, recursive miner
tree-merge, unforced Brain broadcast, single-scan IVF, fast fingerprint lane,
bz2 compression distance, permutation split, simhash token cap, streaming
replay identity, exact vocabulary on both paths."""

import json
import os

import pytest
from pyspark.sql import functions as F

from sparklead import synth
from sparklead.enhancers import eventlog as E
from sparklead.sources.hdfs import load_hdfs_events


@pytest.fixture(scope="module")
def tokenized(spark):
    ev = load_hdfs_events(synth.raw_log_corpus(spark, 2000))
    return E.words(E.normalize(ev), "e_message_normalized").cache()


# ------------------------------------------------- recursive tree merge

def test_tree_merge_recursive_fold(tokenized):
    """Driver intake must be O(max_clusters x fanout) at ANY partition count:
    with fanout 4 and 200 input partitions the fold recurses 200->50->12->4
    (three merge rounds, not one), so collected rows <= 4 x max_clusters —
    and the final template set is unchanged vs a narrow run."""
    from sparklead.mining.drain import DrainMiner

    wide = tokenized.repartition(200)
    miner = DrainMiner()
    partials = miner._partials(wide, "e_words", merge_fanout=4)
    assert partials.rdd.getNumPartitions() <= 4
    assert partials.count() <= 4 * miner.max_clusters
    t_deep = DrainMiner().fit(wide, "e_words", merge_fanout=4).templates
    t_base = DrainMiner().fit(tokenized.repartition(4), "e_words").templates
    assert sorted(" ".join(t) for t, _ in t_deep) == sorted(" ".join(t) for t, _ in t_base)
    assert sum(c for _, c in t_deep) == 2000


def test_tree_merge_recursive_two_phase(tokenized):
    from sparklead.mining.two_phase import LocalLenMa, TwoPhaseMiner

    wide = tokenized.repartition(64)
    partials = TwoPhaseMiner(lambda: LocalLenMa())._partials(wide, "e_words", merge_fanout=2)
    assert partials.rdd.getNumPartitions() <= 2
    m = TwoPhaseMiner(lambda: LocalLenMa()).fit(wide, "e_words", merge_fanout=2)
    assert sum(c for _, c in m.templates) == 2000


# ------------------------------------------------- banded embedding LSH

def test_embedding_neardup_bucket_cap_on_skew(spark):
    """A degenerate corpus (one identical vector mass-duplicated) would make
    the in-bucket self-join O(m^2); the per-(band,bucket) cap must DROP the
    oversized buckets so candidate volume is bounded, while normal-sized
    groups keep flowing."""
    from sparklead.dedup import embedding_neardup_candidates

    hot = [(i, [1.0, 2.0, 3.0, 4.0]) for i in range(200)]  # 200-way duplicate
    cold = [(1000 + i, [float(i + 1), -2.0, float(i), 0.5]) for i in range(20)]
    df = spark.createDataFrame(hot + cold, "vec_id long, embedding array<double>")
    capped = embedding_neardup_candidates(df, n_bands=2, planes_per_band=8, max_bucket=50)
    uncapped = embedding_neardup_candidates(df, n_bands=2, planes_per_band=8, max_bucket=0)
    n_capped, n_uncapped = capped.count(), uncapped.count()
    # uncapped: the hot bucket alone yields 200*199/2 = 19900 pairs
    assert n_uncapped >= 19_900
    # capped: hot buckets (>50 members in every band) are dropped entirely
    assert n_capped < 1_000


def test_embedding_neardup_banded_recall_and_verify(spark):
    """Exact duplicates share every band's sign pattern -> recall 1.0; the
    cosine verifier keeps only pairs >= threshold."""
    from sparklead.dedup import embedding_neardup

    base = [(i, [float(i % 7 + 1), float(i % 5 - 2), 1.5, -0.5]) for i in range(40)]
    dups = [(100 + i, [x * 1.001 for x in v]) for i, v in base if i % 4 == 0]
    df = spark.createDataFrame(base + dups, "vec_id long, embedding array<double>")
    pairs = {(r["a_id"], r["b_id"]): r["cosine"] for r in embedding_neardup(df).collect()}
    for i, _ in base:
        if i % 4 == 0:
            assert (i, 100 + i) in pairs
            assert pairs[(i, 100 + i)] > 0.999
    assert all(c >= 0.95 for c in pairs.values())


# ------------------------------------------------- Brain broadcast fallback

def test_brain_degrades_to_shuffle_join_without_oom(spark, tokenized):
    """The freq-table join must carry NO forced broadcast hint: with
    autoBroadcastJoinThreshold=-1 the plan falls back to a shuffle join and
    the miner still produces the same templates (a forced hint would pin an
    unbounded table into executor memory at real-corpus cardinalities)."""
    from sparklead.mining.brain import parse_brain

    small = tokenized.limit(300).cache()
    baseline = {r["template"] for r in parse_brain(small, "e_words")[1].collect()}
    thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        assigned, templates = parse_brain(small, "e_words")
        plan = assigned._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        assert {r["template"] for r in templates.collect()} == baseline
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thr)


def test_brain_child_split_threshold(spark):
    """down_split semantics (Brain.py:331-374): a non-root position with 2
    distinct tokens is variable at the default threshold=2 (one merged
    template) but stays constant at threshold=3 — the cluster child-splits
    into one template per kept token."""
    from sparklead.mining.brain import parse_brain

    rows = [(["job", "start", f"mode{i % 2}", f"id{i}"],) for i in range(20)]
    df = spark.createDataFrame(rows, "e_words array<string>")
    merged = parse_brain(df, "e_words", exclude_digits=False)[1].collect()
    assert {r["template"] for r in merged} == {"job start <*> <*>"}
    split = parse_brain(df, "e_words", threshold=3, exclude_digits=False)[1].collect()
    assert {r["template"] for r in split} == {"job start mode0 <*>", "job start mode1 <*>"}
    assert sorted(r["cluster_size"] for r in split) == [10, 10]


# ------------------------------------------------- single-scan IVF

def test_ivf_topk_single_scan_no_smj(spark, sf_dir):
    """The search plan must scan the corpus ONCE (cell assignment carries the
    raw embedding through — no corpus self-join) and contain no data-sized
    sort-merge join."""
    from sparklead.similarity import ivf_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 5)
    out = ivf_topk(q, emb, k=3, n_centroids=4, n_probe=2, fit_sample=50)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan
    # one corpus scan + one query scan of the embeddings relation, max
    assert plan.count("embeddings.parquet") <= 2
    assert out.count() > 0


# ------------------------------------------------- fast fingerprint lane

def test_fingerprint_fast_groups_like_md5(spark, sf_dir):
    """Both winnowing lanes must behave equivalently on seeded fixtures:
    exact duplicates ALWAYS share the fingerprint (deterministic — same
    shingle stream, same min-selection), and tail-edited near-dups keep
    their source's fingerprint at a comparable rate (WHICH shingle-mins a
    tail edit displaces is hash-dependent, so group membership can differ
    pair-by-pair across lanes — the rate is the lane-invariant property;
    measured md5 48/60 vs xxh 43/60 on this fixture)."""
    from sparklead.textstats import fingerprint, fingerprint_fast

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").filter(F.col("doc_id") < 60)
    dup = docs.select((F.col("doc_id") + 1000).alias("doc_id"), "text")
    near = docs.select(
        (F.col("doc_id") + 2000).alias("doc_id"),
        F.concat("text", F.lit(" tail edit")).alias("text"),
    )
    corpus = docs.select("doc_id", "text").unionByName(dup).unionByName(near)

    for fp in (fingerprint, fingerprint_fast):
        rows = {r["doc_id"]: r["fingerprint"] for r in fp(corpus).collect()}
        # exact duplicates MUST share a fingerprint in both lanes
        assert all(rows[d] == rows[d + 1000] for d in range(60))
        # near-dup grouping rate stays high in both lanes
        near_hits = sum(1 for d in range(60) if rows[d] == rows[d + 2000])
        assert near_hits >= 35


# ------------------------------------------------- compression distance

def test_compression_distance_pinned(spark):
    import bz2

    from sparklead.detectors.logdistance import compression_distance

    a_rows = [(i, f"open block blk_{i} status ok") for i in range(50)]
    b_rows = [(i, f"open block blk_{i} status ok") for i in range(40)] + [
        (40 + i, f"write failure on node n{i}") for i in range(10)
    ]
    a = spark.createDataFrame(a_rows, "line_nr long, m_message string")
    b = spark.createDataFrame(b_rows, "line_nr long, m_message string")
    d_same = compression_distance(a, a, order_col="line_nr")
    d_ab = compression_distance(a, b, order_col="line_nr")
    # pin against the reference formula computed directly on the same strings
    s_a = " ".join(r[1] for r in a_rows)
    s_b = " ".join(r[1] for r in b_rows)
    la, lb = len(bz2.compress(s_a.encode())), len(bz2.compress(s_b.encode()))
    lab = len(bz2.compress((s_a + s_b).encode()))
    assert d_ab == (lab - min(la, lb)) / max(la, lb)
    assert d_same < d_ab  # identical runs compress together far better
    # list<str> column branch (the reference's List(Utf8) path)
    at = a.select("line_nr", F.split("m_message", " ").alias("w"))
    assert compression_distance(at, at, column="w", order_col="line_nr") == d_same


# ------------------------------------------------- permutation split

def test_permutation_split_exact_and_deterministic(spark):
    from sparklead.detectors.ad import train_test_split

    df = spark.createDataFrame(
        [(f"s{i:03d}", i) for i in range(100)], "seq_id string, start_time long"
    ).repartition(8, "seq_id").cache()
    df.count()  # pin the partitioning so rand(seed) is reproducible
    tr1, te1 = train_test_split(df, 0.25, seed=7, method="permutation")
    tr2, te2 = train_test_split(df, 0.25, seed=7, method="permutation")
    ids = lambda d: {r["seq_id"] for r in d.select("seq_id").collect()}
    assert ids(te1) == ids(te2) and ids(tr1) == ids(tr2)  # deterministic
    assert len(ids(te1)) == 25 and len(ids(tr1)) == 75  # exact fraction
    assert ids(te1).isdisjoint(ids(tr1))
    # a different seed yields a different permutation
    _, te3 = train_test_split(df, 0.25, seed=8, method="permutation")
    assert ids(te3) != ids(te1)


# ------------------------------------------------- simhash token cap

def test_simhash_token_cap_is_prefix_semantics(spark):
    """Docs past the lane-counter capacity get the simhash of their first
    max_tokens tokens — exercised with a tiny cap: capped lane-packed value
    == naive simhash64 of the sliced prefix."""
    from sparklead.dedup import simhash64, with_simhash

    rows = [(i, [f"t{i}_{j}" for j in range(12)]) for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id long, toks array<string>")
    capped = with_simhash(df, "toks", "sh", max_tokens=8).select("doc_id", "sh")
    ref = df.select("doc_id", simhash64(F.slice("toks", 1, 8)).alias("ref"))
    assert capped.join(ref, "doc_id").filter(F.col("sh") != F.col("ref")).count() == 0


# ------------------------------------------------- streaming replay identity

def test_stream_replay_detects_new_batch_zero(spark, tmp_path):
    """Lost checkpoint + grown input: the restarted query renumbers batches
    from 0, so a bare batch_id-keyed manifest would skip the NEW batch 0 as
    'committed' — silent data loss. The identity (source-file hash) check
    must let the new batch 0 through."""
    import shutil

    from sparklead.streaming import stream_route

    inp, out = str(tmp_path / "in"), str(tmp_path / "out")
    pt = synth.pretokenized(spark, 400)
    pt.filter(F.col("doc_id") < "doc_000000200").coalesce(1).write.mode("append").parquet(inp)
    stream_route(spark, inp, out, synth.source_meta(spark)).awaitTermination(180)
    assert spark.read.parquet(os.path.join(out, "seq_features")).count() == 200
    # lose the checkpoint AND grow the input
    shutil.rmtree(os.path.join(out, "_checkpoint"))
    pt.filter(F.col("doc_id") >= "doc_000000200").coalesce(1).write.mode("append").parquet(inp)
    stream_route(spark, inp, out, synth.source_meta(spark)).awaitTermination(180)
    # the new batch 0 (both files) must have been PROCESSED, not skipped:
    # the round-4 generation reset wipes the dead generation's dirs AND
    # starts a fresh manifest, so the sink holds exactly the new run's rows
    # and the manifest carries exactly its committed batches
    assert spark.read.parquet(os.path.join(out, "seq_features")).count() == 400
    manifest = [json.loads(l) for l in open(os.path.join(out, "stream_manifest.jsonl"))]
    committed = [m for m in manifest if m.get("committed")]
    assert len(committed) == 1  # fresh generation: only the re-processed batch 0
    assert committed[0]["batch_id"] == 0


# ------------------------------------------------- PL-IPLoM bijection (S3)

def test_pl_iplom_bijection_splits_shared_length(spark):
    """With bijection=True, PL-IPLoM chains the relational S3 round (reused
    from mining/iplom.py) — the same shared-token-count fixture the original
    IPLoM splits must now split here too; with the default (bijection=False)
    the fixture stays merged, pinning the declared S1+S2 contract."""
    from sparklead.mining.pl_iplom import pl_iplom_templates

    rows = []
    for i in range(12):
        rows.append((["open", f"c{i % 2}", f"host{i % 4}", f"s{i % 3}", "ok"],))
        rows.append((["drop", f"c{i % 2}", f"peer{i % 4}", f"s{i % 3}", "ok"],))
    df = spark.createDataFrame(rows, "e_words array<string>")
    with_s3 = {r["template"] for r in pl_iplom_templates(df, "e_words", bijection=True).collect()}
    assert with_s3 == {"open <*> <*> <*> ok", "drop <*> <*> <*> ok"}
    without = {r["template"] for r in pl_iplom_templates(df, "e_words").collect()}
    assert without == {"<*> <*> <*> <*> ok"}


# ------------------------------------------------- bounded miner state

def test_spell_lenma_cluster_caps_bound_state():
    """High-cardinality input must not grow Spell/LenMa state past the cap
    (the reference's clusterers are unbounded); row mass is preserved by
    folding overflow into the closest cluster."""
    from sparklead.mining.two_phase import LocalLenMa, LocalSpell

    spell = LocalSpell(tau=0.99, max_clusters=10)  # tau 0.99 -> nothing matches
    for i in range(100):
        spell.add([f"a{i}", f"b{i}", f"c{i}"])
    assert len(spell.clusters) <= 10
    assert sum(c for _, c in spell.templates()) == 100

    lenma = LocalLenMa(threshold=1.1, max_clusters=10)  # threshold>1 -> nothing matches
    for i in range(100):
        lenma.add([("x" * (i % 7 + 1)), ("y" * (i % 5 + 1)), ("z" * (i % 3 + 1))])
    assert lenma.n_clusters <= 10
    assert sum(c for _, c in lenma.templates()) == 100


def test_ael_candidate_cap_degrades_to_identity(spark):
    """Past max_candidates, AEL's per-bin greedy merge covers only the top
    candidates; the tail maps to itself — every row still gets an id and
    the quadratic loop stays bounded."""
    from sparklead.mining.ael import parse_ael

    # letter-only variant tokens: DEFAULT_MASKS would collapse digits
    rows = [(f"evt kind_{chr(97 + i // 10)}{chr(97 + i % 10)} happened",) for i in range(50)]
    df = spark.createDataFrame(rows, "m_message string")
    assigned, templates = parse_ael(df, max_candidates=5)
    assert assigned.filter(F.col("e_event_ael_id").isNull()).count() == 0
    tpls = {r["template"] for r in templates.collect()}
    # top-5 candidates merged into a wildcard template; 45 tail identities
    assert "evt <*> happened" in tpls
    assert sum(1 for t in tpls if "<*>" not in t) == 45


def test_minhash_fast_lane_finds_seeded_near_dups(spark):
    """The xxhash64 long-signature lane must recall the same seeded
    near-dup pairs the md5 lane does, end-to-end through banding + verify."""
    from sparklead.dedup import jaccard_verify, minhash_candidates

    base = [
        (i, " ".join(f"w{(i * 17 + j * 5) % 997}" for j in range(12)))
        for i in range(30)
    ]
    near = [(100 + i, t + " tail") for i, t in base if i % 3 == 0]
    df = spark.createDataFrame(base + near, "doc_id long, text string")
    expected = {(i, 100 + i) for i in range(0, 30, 3)}
    for fast in (False, True):
        cand = minhash_candidates(df, bands=8, num_hashes=16, fast=fast)
        pairs = {
            (r["a_id"], r["b_id"])
            for r in jaccard_verify(df, cand, threshold=0.5).collect()
        }
        assert pairs == expected, f"fast={fast}"


def test_signbucket_literal_weights_match_inline(spark, sf_dir):
    """The literal-weight plane-dot path (no per-row hashing of constants)
    must produce bucket-for-bucket identical values to the inline form —
    including with a plane_offset, the multi-band case."""
    from sparklead.similarity import plane_weights, signbucket_expr

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").limit(100)
    dim = len(emb.first()["embedding"])
    w = plane_weights(spark, list(range(32)), dim)
    for off in (0, 16):
        cmp = emb.select(
            signbucket_expr(F.col("embedding"), 16, plane_offset=off).alias("a"),
            signbucket_expr(F.col("embedding"), 16, plane_offset=off, weights=w).alias("b"),
        )
        assert cmp.filter(F.col("a") != F.col("b")).count() == 0


# ------------------------------------------------- near-dup components

def test_neardup_components_chain_and_star(spark):
    """a~b, b~c chains and star clusters must each collapse to ONE component
    labeled by their minimum id, converging before max_iter."""
    from sparklead.dedup import neardup_components

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4),            # chain -> component 1
         (10, 11), (10, 12), (10, 13),      # star  -> component 10
         (20, 21)],                          # pair  -> component 20
        "a_id long, b_id long",
    )
    comp = {r["id"]: r["component"] for r in neardup_components(pairs).collect()}
    assert comp == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10, 13: 10, 20: 20, 21: 20}


def test_dedup_by_components_end_to_end(spark):
    """Full near-dedup decision: minhash candidates -> jaccard verify ->
    components -> keep min-id per group + every unpaired doc."""
    from sparklead.dedup import dedup_by_components, jaccard_verify, minhash_candidates

    base = [(i, f"the quick brown fox jumps over dog number {i} " * 3) for i in range(10)]
    dups = [(100 + i, t + " extra") for i, t in base if i % 2 == 0]  # near-dups of evens
    df = spark.createDataFrame(base + dups, "doc_id long, text string")
    cand = minhash_candidates(df, bands=8, num_hashes=16)
    pairs = jaccard_verify(df, cand, threshold=0.5)
    kept = dedup_by_components(df, pairs)
    kept_ids = {r["doc_id"] for r in kept.select("doc_id").collect()}
    # every odd (unpaired) doc survives; each near-dup pair keeps only doc_id=i
    assert all(i in kept_ids for i in range(1, 10, 2))
    for i in range(0, 10, 2):
        assert i in kept_ids and (100 + i) not in kept_ids


# ------------------------------------------------- streaming dedup

def test_stream_dedup_drops_redeliveries(spark, tmp_path, sf_dir):
    """dropDuplicatesWithinWatermark keeps one arrival per key: feed every
    event TWICE (at-least-once delivery), expect exactly the distinct set."""
    from sparklead.streaming import stream_dedup

    inp, out = str(tmp_path / "in"), str(tmp_path / "out")
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").limit(500)
    ev.coalesce(1).write.mode("append").parquet(inp)
    ev.coalesce(1).write.mode("append").parquet(inp)  # duplicate delivery
    stream_dedup(spark, inp, out).awaitTermination(180)
    got = spark.read.parquet(os.path.join(out, "deduped"))
    assert got.count() == 500
    assert got.select("event_id").distinct().count() == 500


# ------------------------------------------------- vocabulary consistency

def test_vocabulary_paths_agree(spark):
    from sparklead.pipeline import parse_stage, token_vectors, vocabulary, vocabulary_from_vectors

    pt = parse_stage(synth.pretokenized(spark, 500))
    direct = {r["token"]: (r["freq"], r["n_docs"]) for r in vocabulary(pt).collect()}
    staged = {
        r["token"]: (r["freq"], r["n_docs"])
        for r in vocabulary_from_vectors(token_vectors(pt)).collect()
    }
    assert direct == staged


# ------------------------------------------------- pl_iplom FST without count

def test_pl_iplom_outlier_threshold_still_exact(tokenized):
    """The FST denominator now comes from the sizes aggregate (no extra
    count job); outlier flags must match the explicit-total computation."""
    from sparklead.mining.pl_iplom import pl_iplom_templates

    t = pl_iplom_templates(tokenized, "e_words", support_threshold=0.01)
    rows = t.select("part_key", "part_len", "is_outlier").collect()
    total = sum(r["part_len"] for r in rows)
    for r in rows:
        assert r["is_outlier"] == (r["part_len"] / total < 0.01)
