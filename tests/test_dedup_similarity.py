"""Dedup + similarity + textstats + multimodal plumbing tests."""

import numpy as np
from pyspark.sql import functions as F

from sparklead import dedup, multimodal, similarity, textstats


def test_exact_dedup(spark):
    df = spark.createDataFrame(
        [(1, "hello world"), (2, "hello world"), (3, "other")], "doc_id int, text string"
    )
    groups = dedup.exact_duplicates(df).collect()
    assert {(r["n_dups"], r["keep_id"]) for r in groups} == {(2, 1), (1, 3)}
    assert sorted(r["doc_id"] for r in dedup.exact_dedup(df).collect()) == [1, 3]


def test_minhash_finds_near_dups(spark):
    base = "the quick brown fox jumps over the lazy dog again and again today"
    near = base.replace("today", "tomorrow")
    far = "completely different content with zero overlap whatsoever in words"
    df = spark.createDataFrame([(1, base), (2, near), (3, far)], "doc_id int, text string")
    cands = dedup.minhash_candidates(df, num_hashes=16, bands=8)
    pairs = {(r["a_id"], r["b_id"]) for r in cands.collect()}
    assert (1, 2) in pairs
    verified = dedup.jaccard_verify(df, cands, threshold=0.5)
    vp = {(r["a_id"], r["b_id"]) for r in verified.collect()}
    assert (1, 2) in vp and (1, 3) not in vp


def test_simhash_near_for_similar(spark):
    df = spark.createDataFrame(
        [(1, ["a", "b", "c", "d", "e"]), (2, ["a", "b", "c", "d", "e"]), (3, ["z", "q", "w", "x", "y"])],
        "doc_id int, toks array<string>",
    )
    sh = {r["keep_id"]: r["n_dups"] for r in dedup.simhash_dedup(df, "toks").collect()}
    assert sh[1] == 2  # identical token sets share the signature


def test_brute_force_topk_exact(spark):
    vecs = [(0, [1.0, 0.0]), (1, [0.9, 0.1]), (2, [0.0, 1.0]), (3, [-1.0, 0.0])]
    df = spark.createDataFrame(vecs, "vec_id int, embedding array<float>")
    out = similarity.brute_force_topk(df.filter("vec_id = 0"), df, k=2).collect()
    assert [r["neighbor_id"] for r in sorted(out, key=lambda r: r["rank"])] == [1, 2]


def test_lsh_recall_on_identical(spark):
    vecs = [(i, [float(i % 7 + 1), float((i * 3) % 5 + 1), 1.0]) for i in range(50)]
    df = spark.createDataFrame(vecs, "vec_id int, embedding array<float>")
    exact = similarity.brute_force_topk(df.filter("vec_id < 5"), df, k=3)
    approx = similarity.lsh_topk(df.filter("vec_id < 5"), df, k=3, n_planes=2)
    # identical-direction vectors always share every sign bucket -> rank-1 recall
    e1 = {(r["query_id"], r["neighbor_id"]) for r in exact.filter("rank=1").collect()}
    a_all = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}
    assert len(e1 & a_all) >= 3


def test_embedding_neardup(spark):
    vecs = [(0, [1.0, 2.0, 3.0]), (1, [2.0, 4.0, 6.0]), (2, [-3.0, 1.0, 0.0])]
    df = spark.createDataFrame(vecs, "vec_id int, embedding array<float>")
    pairs = dedup.embedding_neardup(df, threshold=0.99).collect()
    assert {(r["a_id"], r["b_id"]) for r in pairs} == {(0, 1)}


def test_textstats(spark):
    df = spark.createDataFrame(
        [(1, "the cat is in the house and it is big for a cat to be")], "doc_id int, text string"
    )
    out = textstats.quality_score(textstats.lang_id(textstats.token_counts(df))).first()
    assert out["lang_pred"] == "en"
    assert out["n_ws_tokens"] == 15
    assert 0 <= out["quality"] <= 1
    fp1 = textstats.fingerprint(df).first()["fingerprint"]
    fp2 = textstats.fingerprint(df).first()["fingerprint"]
    assert fp1 == fp2


def test_multimodal_plumbing(spark):
    media = multimodal.synth_media(spark, 50)
    feats = multimodal.extract_features(media)
    rows = feats.collect()
    assert len(rows) == 50
    assert all(len(r["feature"]) == 16 for r in rows)
    assert all(r["n_bytes"] > 0 for r in rows)
    # deterministic across runs
    again = {r["media_id"]: r["feature"] for r in multimodal.extract_features(media).collect()}
    assert all(np.allclose(again[r["media_id"]], r["feature"]) for r in rows)
    frames = multimodal.frame_sample_plan(media)
    assert frames.filter(F.col("frame_ts_ms") < 0).count() == 0


def test_ivf_topk_recall(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = emb.filter("vec_id < 5")
    exact = similarity.brute_force_topk(q, emb, k=3)
    approx = similarity.ivf_topk(q, emb, k=3, n_centroids=4, n_probe=3)
    e = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    a = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}
    # probing 3 of 4 cells must recover most exact neighbors
    assert len(e & a) / len(e) >= 0.5
    # and ranks are exact within the probed candidate set
    assert approx.filter("rank > 3").count() == 0
