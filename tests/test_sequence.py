"""Sequence aggregation invariants (FIXTURES.md §5, invariants 5-6)."""

from pyspark.sql import functions as F

from sparklead import synth
from sparklead.enhancers import eventlog as E
from sparklead.enhancers.sequence import aggregate_sequences, embeddings_mean, ordered_list
from sparklead.sources.hdfs import load_hdfs_events


def _enhanced(spark, n=400):
    ev = load_hdfs_events(synth.raw_log_corpus(spark, n))
    return E.event_id(E.length(E.words(E.normalize(ev), "e_message_normalized")))


def test_seq_len_conservation(spark):
    df = _enhanced(spark)
    seq = aggregate_sequences(df, event_col="e_event_mask_id")
    assert seq.agg(F.sum("seq_len")).first()[0] == df.count()
    bad = seq.filter(F.col("start_time") > F.col("end_time")).count()
    assert bad == 0


def test_events_list_ordered(spark):
    df = _enhanced(spark)
    seq = aggregate_sequences(df, event_col="e_event_mask_id")
    # the collected event list must equal the timestamp-ordered per-seq events
    expected = {}
    for r in df.select("seq_id", "m_timestamp", "e_event_mask_id").collect():
        expected.setdefault(r["seq_id"], []).append((r["m_timestamp"], r["e_event_mask_id"]))
    for r in seq.select("seq_id", "events").collect():
        exp = [e for _, e in sorted(expected[r["seq_id"]], key=lambda t: t[0])]
        got = list(r["events"])
        assert sorted(got) == sorted(exp)
        # full order equality where timestamps are unique within the seq
        ts = [t for t, _ in expected[r["seq_id"]]]
        if len(set(ts)) == len(ts):
            assert got == exp


def test_ordering_partition_independent(spark):
    df = _enhanced(spark)
    a = {r["seq_id"]: list(r["events"]) for r in aggregate_sequences(df, event_col="e_event_mask_id").collect()}
    b = {
        r["seq_id"]: list(r["events"])
        for r in aggregate_sequences(df.repartition(17), event_col="e_event_mask_id").collect()
    }
    ts_unique = {
        r["seq_id"]
        for r in df.groupBy("seq_id")
        .agg((F.countDistinct("m_timestamp") == F.count(F.lit(1))).alias("u"))
        .collect()
        if r["u"]
    }
    for k in a:
        if k in ts_unique:
            assert a[k] == b[k]


def test_duration(spark):
    df = _enhanced(spark)
    seq = aggregate_sequences(df)
    r = seq.filter(F.col("seq_len") > 1).first()
    assert r["duration_us"] == (r["end_time"] - r["start_time"]).total_seconds() * 1_000_000
    assert r["duration_sec"] >= 0


def test_embeddings_mean(spark):
    data = [(1, [1.0, 2.0]), (1, [3.0, 4.0]), (2, [5.0, 6.0])]
    df = spark.createDataFrame(data, "seq_id int, e_bert_emb array<float>")
    out = {r["seq_id"]: list(r["e_bert_emb"]) for r in embeddings_mean(df).collect()}
    assert out[1] == [2.0, 3.0]
    assert out[2] == [5.0, 6.0]
