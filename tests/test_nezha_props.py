"""Nezha nested-JSON loader + hypothesis property tests for core operators."""

import json
from collections import Counter

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from sparklead.sources.nezha import decode_nested_json, interval_label_join


def test_nested_json_decode(spark):
    inner = {"level": "ERROR", "ts": "x", "message": "boom happened", "TraceId": "t1", "SpanId": "s1"}
    outer = {"log": json.dumps(inner), "stream": "stderr", "time": "2024-02-01T10:00:00Z"}
    df = spark.createDataFrame([(json.dumps(outer), "pod-a")], "m_message string, pod string")
    out = decode_nested_json(df).first()
    assert out["m_message"] == "boom happened"
    assert out["level"] == "ERROR"
    assert out["stream"] == "stderr"
    assert out["trace_id"] == "t1"
    assert out["m_timestamp"].year == 2024


def test_interval_label_join(spark):
    events = spark.createDataFrame(
        [
            ("pod-a", "2024-01-01 10:01:00"),
            ("pod-a", "2024-01-01 10:05:00"),  # outside 3-min window
            ("pod-b", "2024-01-01 10:01:00"),  # other pod
        ],
        "pod string, m_timestamp string",
    ).withColumn("m_timestamp", F.to_timestamp("m_timestamp"))
    labels = spark.createDataFrame([("pod-a", "2024-01-01 10:00:00")], "pod string, inject_time string").withColumn(
        "inject_time", F.to_timestamp("inject_time")
    )
    out = interval_label_join(events, labels)
    flags = {(r["pod"], str(r["m_timestamp"])): r["anomaly"] for r in out.collect()}
    assert flags[("pod-a", "2024-01-01 10:01:00")] is True
    assert flags[("pod-a", "2024-01-01 10:05:00")] is False
    assert flags[("pod-b", "2024-01-01 10:01:00")] is False
    assert out.filter(F.col("normal") == F.col("anomaly")).count() == 0


# ---------------------------------------------------------------- property tests
# One Spark round-trip per property: hypothesis generates a BATCH, Spark
# processes it once, every row is checked (per-example Spark jobs would be
# prohibitively slow).


@settings(max_examples=3, deadline=None)
@given(
    st.lists(
        st.lists(st.integers(min_value=0, max_value=50), min_size=1, max_size=40),
        min_size=1,
        max_size=60,
    )
)
def test_token_count_vectors_match_counter(spark, token_lists):
    from sparklead.pipeline import token_vectors

    rows = [(str(i), toks, len(toks), "s") for i, toks in enumerate(token_lists)]
    df = spark.createDataFrame(rows, "doc_id string, tokens array<int>, n_tok int, source string")
    out = {r["doc_id"]: (list(r["vocab"]), list(r["counts"])) for r in token_vectors(df).collect()}
    for i, toks in enumerate(token_lists):
        c = Counter(toks)
        vocab, counts = out[str(i)]
        assert vocab == sorted(c)
        assert counts == [c[v] for v in sorted(c)]


@settings(max_examples=3, deadline=None)
@given(
    st.lists(
        # printable ASCII: Python re's \d/\w are unicode-wide while Java's
        # default is ASCII — the reference (Rust regex) is ASCII-default too,
        # so ASCII inputs are the meaningful comparison domain
        st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=126), min_size=0, max_size=80),
        min_size=1,
        max_size=50,
    )
)
def test_normalize_matches_python_reference(spark, messages):
    from sparklead.enhancers import eventlog as E
    from test_enhancers import py_normalize

    df = spark.createDataFrame([(m,) for m in messages], "m_message string")
    out = E.normalize(df).collect()
    for r in out:
        assert r["e_message_normalized"] == py_normalize(r["m_message"]), repr(r["m_message"])


@settings(max_examples=3, deadline=None)
@given(st.lists(st.text(alphabet="abcdef <>", min_size=0, max_size=30), min_size=1, max_size=50))
def test_trigrams_multiset_matches(spark, messages):
    from sparklead.enhancers import eventlog as E

    df = spark.createDataFrame([(m,) for m in messages], "m_message string")
    for r in E.trigrams(df).collect():
        msg = r["m_message"].split("\n")[0]
        expected = Counter(msg[i : i + 3] for i in range(max(len(msg) - 2, 0)))
        assert Counter(r["e_trigrams"]) == expected
