"""Detector semantics vs tiny hand-computed references."""

import math

from pyspark.sql import functions as F

from sparklead.detectors.logdistance import log_distances
from sparklead.detectors.nep import NGramModel, nep_enhance
from sparklead.detectors.oov import oov_score
from sparklead.detectors.rarity import rarity_fit, rarity_score


def test_rarity_matches_reference_math(spark):
    # train: tokens a..a (90) b (9) c (1) -> total 100
    train = spark.createDataFrame(
        [(1, ["a"] * 90 + ["b"] * 9 + ["c"])], "seq_id int, e_words array<string>"
    )
    st = {r["token"]: r["score"] for r in rarity_fit(train).collect()}
    assert st["a"] == 0.0  # common (>1%)
    assert st["b"] == 0.0  # 9% > 1% -> common
    assert abs(st["c"] - (-math.log(0.01)) ** 3) < 1e-9
    test = spark.createDataFrame([(1, ["a", "c", "c"]), (2, ["zzz"])], "seq_id int, e_words array<string>")
    out = {r["seq_id"]: r["rarity_score"] for r in rarity_score(test, rarity_fit(train), threshold=10).collect()}
    # row 1: dot = 0 + 2*score(c), nnz = 2 distinct in-vocab tokens
    assert abs(out[1] - (2 * (-math.log(0.01)) ** 3) / 2) < 1e-9
    assert out[2] == 0.0  # all OOV -> no contribution (reference vectorizer drops them)


def test_oov_counts_occurrences(spark):
    train = spark.createDataFrame([(1, ["a", "b"])], "seq_id int, e_words array<string>")
    test = spark.createDataFrame([(1, ["a", "x", "x", "b"]), (2, ["a"])], "seq_id int, e_words array<string>")
    out = {r["seq_id"]: (r["oov_score"], r["is_ano"]) for r in oov_score(test, train).collect()}
    assert out[1] == (2, 1)
    assert out[2] == (0, 0)


def test_nep_reference_parity(spark):
    # mirror the reference's Counter-based model on a toy corpus, n=3
    seqs = [["e1", "e2", "e3"], ["e1", "e2", "e4"], ["e1", "e2", "e3"]]
    df = spark.createDataFrame([(i, s) for i, s in enumerate(seqs)], "seq_id int, events array<string>")
    out = nep_enhance(df, "events", n=3).collect()
    by_id = {r["seq_id"]: r for r in out}
    # position 1 ngram = "SoS SoS e1" count 3; n-1 "SoS SoS" count 3; winner is itself
    r0 = by_id[0]
    assert r0["nep_abs"][0] == 3
    assert r0["nep_prob_nsum"][0] == 1.0
    assert r0["nep_corr"][0] == 1
    # position 3: "e1 e2 e3" seen 2, "e1 e2" seen 3, winner "e1 e2 e3" (2 > 1)
    assert r0["nep_abs"][2] == 2
    assert abs(r0["nep_prob_nsum"][2] - 2 / 3) < 1e-9
    assert r0["nep_prob_nmax"][2] == 1.0
    assert by_id[1]["nep_corr"][2] == 0  # e4 not the winner
    # perplexity = exp(-mean(log p_max)); all p_max==1 for seq 0 -> perp 1
    assert abs(r0["nep_prob_nmax_perp"] - 1.0) < 1e-9


def test_nep_model_reuse(spark):
    train = spark.createDataFrame([(1, ["a", "b", "a", "b"])], "seq_id int, events array<string>")
    test = spark.createDataFrame([(9, ["a", "b"])], "seq_id int, events array<string>")
    model = NGramModel.fit(train, n=2)
    out = model.score(test, "events").first()
    assert out["nep_predict"][0] == "a"  # from SoS the most likely first event is 'a'
    assert out["nep_predict"][1] == "b"  # after 'a' comes 'b' (2 of 2)


def test_log_distance_identical_runs(spark):
    a = spark.createDataFrame([(1, ["x", "y"])], "id int, e_words array<string>")
    r = log_distances(a, a).first()
    assert abs(r["cosine"] - 1.0) < 1e-9
    assert r["jaccard"] == 1.0
    assert r["containment"] == 1.0


def test_results_aggregator_pivot():
    from sparklead.detectors.report import ResultsAggregator

    agg = ResultsAggregator()
    agg.store("LR", "events", {"f1": 0.9, "accuracy": 0.95})
    agg.store("LR", "words", {"f1": 0.8, "accuracy": 0.9})
    agg.store("KMEANS", "events", {"f1": 0.5, "accuracy": 0.6})
    p = agg.pivot("f1")
    assert p.loc["su-LR", "events"] == 0.9
    assert p.loc["us-KMEANS", "events"] == 0.5
