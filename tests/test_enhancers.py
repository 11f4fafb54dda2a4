"""Per-row token-array equality of the enhancers vs a pure-Python reference
implementation of the reference semantics (BASELINE.json input_hint:
'per-row invariant vs the reference: token-array equality')."""

import re

import pytest
from pyspark.sql import functions as F

from sparklead import synth
from sparklead.enhancers import eventlog as E
from sparklead.sources.hdfs import load_hdfs_events

# Pure-Python re-implementation of the reference masking
# (/root/reference/loglead/enhancers/eventlog.py:12-23,403-429): each pattern
# applied twice, first line only. Python `re` needs (?P<>) group syntax and
# \g<name> replacements.
_PY_PATTERNS = [
    (r"\g<start><ID>\g<end>", r"(?P<start>[^A-Za-z0-9]|^)(([0-9a-f]{2,}:){3,}([0-9a-f]{2,}))(?P<end>[^A-Za-z0-9]|$)"),
    (r"\g<start><IP>\g<end>", r"(?P<start>[^A-Za-z0-9]|^)(\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3})(?P<end>[^A-Za-z0-9]|$)"),
    (r"\g<start><SEQ>\g<end>", r"(?P<start>[^A-Za-z0-9]|^)([0-9a-f]{6,} ?){3,}(?P<end>[^A-Za-z0-9]|$)"),
    (r"\g<start><SEQ>\g<end>", r"(?P<start>[^A-Za-z0-9]|^)([0-9A-F]{4} ?){4,}(?P<end>[^A-Za-z0-9]|$)"),
    (r"\g<start><HEX>\g<end>", r"(?P<start>[^A-Za-z0-9]|^)(0x[a-f0-9A-F]+)(?P<end>[^A-Za-z0-9]|$)"),
    (r"\g<start><NUM>\g<end>", r"(?P<start>[^A-Za-z0-9]|^)([\-\+]?\d+)(?P<end>[^A-Za-z0-9]|$)"),
    (r"\g<cmd><CMD>", r"(?P<cmd>executed cmd )(\".+?\")"),
]


def py_normalize(message: str) -> str:
    line = message.split("\n")[0]
    for repl, pat in _PY_PATTERNS:
        line = re.sub(pat, repl, line)
        line = re.sub(pat, repl, line)
    return line


def py_trigrams(message: str) -> set[str]:
    return {message[i : i + 3] for i in range(len(message) - 2)}


@pytest.fixture(scope="module")
def events(spark):
    return load_hdfs_events(synth.raw_log_corpus(spark, 500)).cache()


def test_normalize_token_equality(events):
    df = E.words(E.normalize(events), "e_message_normalized")
    rows = df.select("m_message", "e_message_normalized", "e_words").collect()
    assert len(rows) == 500
    for r in rows:
        expected = py_normalize(r["m_message"])
        assert r["e_message_normalized"] == expected, r["m_message"]
        assert list(r["e_words"]) == expected.split(" ")  # per-row token-array equality


def test_trigrams_set_equality(events):
    # order is unspecified by design (eventlog.py:85) -> set equality contract
    df = E.trigrams(events)
    for r in df.select("m_message", "e_trigrams").limit(100).collect():
        msg = r["m_message"].split("\n")[0]
        assert set(r["e_trigrams"]) == py_trigrams(msg)
        # multiset size: total trigrams = len-2
        assert len(r["e_trigrams"]) == max(len(msg) - 2, 0)


def test_alphanumerics(events):
    df = E.alphanumerics(events)
    for r in df.select("m_message", "e_alphanumerics").limit(100).collect():
        assert list(r["e_alphanumerics"]) == re.findall(r"[a-zA-Z\d]+", r["m_message"])


def test_length_and_rowcount_conservation(events):
    df = E.length(events)
    assert df.count() == events.count()  # narrow ops add columns, not rows
    r = df.select("m_message", "e_chars_len", "e_lines_len").first()
    assert r["e_chars_len"] == len(r["m_message"])
    assert r["e_lines_len"] == r["m_message"].count("\n")


def test_event_id_deterministic(events):
    df = E.event_id(E.normalize(events))
    a = {r["m_message"]: r["e_event_mask_id"] for r in df.collect()}
    b = {r["m_message"]: r["e_event_mask_id"] for r in df.repartition(13).collect()}
    assert a == b  # partitioning-independent ids


def test_item_cumsum(spark):
    data = [(i, f"m{i % 3}", i % 2 == 0) for i in range(20)]
    df = spark.createDataFrame(data, "m_timestamp long, e_message_normalized string, anomaly boolean")
    out = E.item_cumsum(df, order_cols=("m_timestamp",), ano_only=True, unique_only=True)
    rows = sorted(out.collect(), key=lambda r: r["m_timestamp"])
    # first-distinct anomalous items: m0 at t=0, m2 at t=2 (m1 first at t=1 is not anomaly; m1 anomaly first seen t=4... unique_only counts only FIRST occurrence rows)
    seen, expect, cum = set(), [], 0
    for i in range(20):
        key = f"m{i % 3}"
        first = key not in seen
        seen.add(key)
        if first and i % 2 == 0:
            cum += 1
        expect.append(cum)
    assert [r["cumu_items_unan"] for r in rows] == expect
