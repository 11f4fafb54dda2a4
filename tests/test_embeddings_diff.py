"""BERT-lane embedding enhancer (stubbed model) + relational line diff."""

import numpy as np
from pyspark.sql import functions as F

from sparklead.detectors.linediff import diff_summary, line_diff
from sparklead.enhancers.embeddings import EMB_DIM, bert_embeddings
from sparklead.enhancers.sequence import embeddings_mean


def test_bert_stub_shape_and_batching(spark):
    df = spark.createDataFrame([(f"message {i % 5}", i % 3) for i in range(200)], "e_message_normalized string, seq_id int")
    out = bert_embeddings(df)
    rows = out.collect()
    assert all(len(r["e_bert_emb"]) == EMB_DIM for r in rows)
    # unit-norm vectors
    assert all(abs(np.linalg.norm(r["e_bert_emb"]) - 1.0) < 1e-3 for r in rows)
    # identical text -> identical embedding within a session (deterministic stub)
    by_text = {}
    for r in rows:
        prev = by_text.setdefault(r["e_message_normalized"], r["e_bert_emb"])
        assert list(prev) == list(r["e_bert_emb"])
    # composes with the sequence-level mean (sequence.py:82-89 parity path)
    agg = embeddings_mean(out, emb_col="e_bert_emb")
    assert agg.count() == 3
    assert len(agg.first()["e_bert_emb"]) == EMB_DIM


def test_line_diff(spark):
    a = spark.createDataFrame([(0, "x"), (1, "y"), (2, "z")], "line_nr int, m_message string")
    b = spark.createDataFrame([(0, "x"), (1, "Y"), (3, "w")], "line_nr int, m_message string")
    st = {r["line_nr"]: r["status"] for r in line_diff(a, b).collect()}
    assert st == {0: "same", 1: "changed", 2: "removed", 3: "added"}
    summary = {r["status"]: r["n"] for r in diff_summary(a, b).collect()}
    assert summary == {"same": 1, "changed": 1, "removed": 1, "added": 1}
