"""AEL / Brain / Spell / LenMa miners + extra loaders."""

import pytest
from pyspark.sql import functions as F

from sparklead import synth
from sparklead.enhancers import eventlog as E
from sparklead.mining import parse_ael, parse_brain, parse_lenma, parse_spell
from sparklead.sources.hdfs import load_hdfs_events


@pytest.fixture(scope="module")
def corpus(spark):
    ev = load_hdfs_events(synth.raw_log_corpus(spark, 800))
    return E.words(E.normalize(ev), "e_message_normalized").cache()


def _cluster_sizes(assigned, col):
    return sorted(r["count"] for r in assigned.groupBy(col).count().collect())


def test_ael(corpus):
    assigned, templates = parse_ael(corpus, column="e_message_normalized")
    assert assigned.filter(F.col("e_event_ael_id").isNull()).count() == 0
    assert assigned.count() == corpus.count()
    # masked messages are already parameter-free -> 8 exact template groups
    n = templates.count()
    assert 1 <= n <= 10


def test_ael_merges_within_bin(spark):
    rows = [(f"job start node{i}",) for i in range(5)] + [(f"job start rack{i}",) for i in range(5)]
    df = spark.createDataFrame(rows, "m_message string")
    assigned, templates = parse_ael(df, masks=[], min_event_count=2, merge_percent=0.4)
    # 10 distinct strings, same bin (3 tokens, 0 wildcards), diff ratio 1/3
    # <= 0.4 -> all merge into 'job start <*>'
    tpls = {r["template"] for r in templates.collect()}
    assert tpls == {"job start <*>"}
    assert assigned.select("e_event_ael_id").distinct().count() == 1


def test_brain(corpus):
    assigned, templates = parse_brain(corpus, "e_words")
    assert assigned.count() == corpus.count()
    assert assigned.filter(F.col("e_event_brain_id").isNull()).count() == 0
    tpls = {r["template"] for r in templates.collect()}
    # masked corpus has 8 true templates; the two 4-token ones share their
    # highest-frequency token (blk_<NUM> at pos 3) so brain's root grouping
    # legitimately folds them -> 7 or 8 clusters
    assert len(tpls) in (7, 8)
    assert templates.agg(F.sum("cluster_size")).first()[0] == 800


def test_spell_lcs_clustering(spark):
    rows = [(["send", "data", str(i), "to", "node"],) for i in range(20)] + [
        (["recv", "ack", "from", "peer", str(i)],) for i in range(20)
    ]
    df = spark.createDataFrame(rows, "e_words array<string>")
    assigned, miner = parse_spell(df, "e_words")
    assert len(miner.templates) == 2
    assert assigned.filter(F.col("e_event_spell_id").isNull()).count() == 0
    assert assigned.select("e_event_spell_id").distinct().count() == 2


def test_lenma_length_vectors(spark):
    rows = [(["alpha", "beta", str(i)],) for i in range(10, 30)] + [
        (["x", "y", "zzzzzzzzzz", "wwwwwwww"],)
    ] * 5
    df = spark.createDataFrame(rows, "e_words array<string>")
    assigned, miner = parse_lenma(df, "e_words")
    assert 1 <= len(miner.templates) <= 3
    assert assigned.filter(F.col("e_event_lenma_id").isNull()).count() == 0


def test_two_phase_partition_distribution_parity(corpus):
    # LCS-greedy merging is order-sensitive (the reference's Spell is too —
    # it streams rows through a shared object); the contract under
    # repartitioning is DISTRIBUTIONAL parity (SURVEY.md §7 hard-part 1):
    # same total mass, cluster count within a small band.
    _, m1 = parse_spell(corpus.repartition(4), "e_words")
    _, m2 = parse_spell(corpus.repartition(16), "e_words")
    # mass conservation across partitionings
    assert sum(c for _, c in m1.templates) == sum(c for _, c in m2.templates)
    # determinism at a fixed partitioning
    _, m1b = parse_spell(corpus.repartition(4), "e_words")
    assert sorted(" ".join(t) for t, _ in m1.templates) == sorted(" ".join(t) for t, _ in m1b.templates)


# ------------------------------------------------------------------ loaders

def test_bgl_loader(spark):
    lines = [
        ("- 1117838570 2005.06.03 R02-M1 2005-06-03-15.42.50.363779 R02-M1 RAS KERNEL INFO instruction cache parity error corrected",),
        ("APPREAD 1117838978 2005.06.03 R02-M1 2005-06-03-15.49.38.026704 R02-M1 RAS APP FATAL ciod: failed to read message",),
    ]
    from sparklead.sources.syslog import load_bgl_events

    df = spark.createDataFrame(lines, "m_message string")
    out = load_bgl_events(df).collect()
    assert out[0]["normal"] and not out[0]["anomaly"]
    assert not out[1]["normal"] and out[1]["anomaly"]
    assert out[0]["m_timestamp"].year == 2005
    assert out[1]["m_message"] == "ciod: failed to read message"


def test_thunderbird_loader(spark):
    line = "- 1131566461 2005.11.09 dn228 Nov 9 12:01:01 dn228/dn228 crond(pam_unix)[2915]: session closed for user root"
    from sparklead.sources.syslog import load_thunderbird_events

    df = spark.createDataFrame([(line,)], "m_message string")
    out = load_thunderbird_events(df).first()
    assert out["component"] == "crond(pam_unix)"
    assert out["pid"] == "2915"
    assert out["normal"]
    assert out["m_message"].startswith("session closed")


def test_hadoop_label_parser(spark):
    from sparklead.sources.raw import parse_hadoop_labels

    text = """###WordCount
Normal:
+ application_1445087491445_0005
+ application_1445087491445_0007
Machine down:
+ application_1445087491445_0008
###PageRank
Normal:
+ application_1445062781478_0011
"""
    out = {r["app_id"]: (r["app_name"], r["Label"]) for r in parse_hadoop_labels(spark, text).collect()}
    assert out["application_1445087491445_0005"] == ("WordCount", "Normal")
    assert out["application_1445087491445_0008"] == ("WordCount", "Machine down")
    assert out["application_1445062781478_0011"] == ("PageRank", "Normal")


def test_timestamp_prefix_strategies(spark):
    from sparklead.sources.raw import extract_timestamp_prefix

    rows = [
        ("2024-01-01 10:00:00 started", "f", 0),
        ("no timestamp here", "f", 1),
        ("2024-01-01 10:00:02 done", "f", 2),
    ]
    df = spark.createDataFrame(rows, "m_message string, file_name string, line_nr long")
    pat, fmt = r"^(\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2}) ", "yyyy-MM-dd HH:mm:ss"
    dropped = extract_timestamp_prefix(df, pat, fmt, missing_action="drop")
    assert dropped.count() == 2
    filled = extract_timestamp_prefix(df, pat, fmt, missing_action="fill-lastseen").orderBy("line_nr").collect()
    assert filled[1]["m_timestamp"] == filled[0]["m_timestamp"]
    assert filled[0]["m_message"] == "started"


def test_combine_file_date_rollover(spark):
    from sparklead.sources.raw import combine_file_date, parse_timestamp

    rows = [("23:59:10", "a.log", 0), ("00:01:00", "a.log", 1)]
    df = spark.createDataFrame(rows, "m_timestamp string, file_name string, line_nr long")
    df = parse_timestamp(df, ["HH:mm:ss"])
    out = combine_file_date(df, {"a.log": "2024-03-05 00:05:00"}).orderBy("line_nr").collect()
    # 23:59 with file saved at 00:05 -> previous day
    assert str(out[0]["m_timestamp"]) == "2024-03-04 23:59:10"
    assert str(out[1]["m_timestamp"]) == "2024-03-05 00:01:00"
