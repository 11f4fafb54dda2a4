"""Canonical HDFS-style loader: the reference's flagship ingestion path.

Mirrors /root/reference/loglead/loaders/hdfs.py: one-column raw read ->
6-field split (date time id level component m_message) -> blk_-regex seq_id
-> yyMMddHHmmss timestamp -> broadcast label join -> normal/anomaly flags.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from sparklead.sources.raw import extract_seq_id, parse_timestamp, split_and_unnest

HDFS_FIELDS = ["date", "time", "id", "level", "component", "m_message"]


def load_hdfs_events(df_lines: DataFrame) -> DataFrame:
    """Raw one-column lines -> canonical event table (hdfs.py:15-39)."""
    df = split_and_unnest(df_lines, HDFS_FIELDS)
    df = extract_seq_id(df, r"(blk_-?\d+)")
    # reference parses concat(date,time) with %y%m%d%H%M%S (hdfs.py:36-39)
    df = parse_timestamp(df, ["yyMMddHHmmss"], columns=["date", "time"])
    return df


def sequence_table(df_events: DataFrame, seq_col: str = "seq_id") -> DataFrame:
    """Distinct sequence ids (hdfs.py:23, hadoop.py:105)."""
    return df_events.select(seq_col).distinct()


def attach_labels(
    df_seq: DataFrame,
    labels: DataFrame,
    seq_col: str = "seq_id",
    label_key: str = "BlockId",
    label_col: str = "Label",
    normal_value: str = "Normal",
) -> DataFrame:
    """Broadcast label join + normal/anomaly fold (hdfs.py:24-29, base.py:36-48).

    anomaly == NOT normal always (FIXTURES.md invariant 4). The labels side is
    tiny -> broadcast hash join, no shuffle of the big table.
    """
    joined = df_seq.join(
        broadcast(labels.withColumnRenamed(label_key, seq_col)), seq_col, "left"
    )
    normal = F.coalesce(F.col(label_col) == normal_value, F.lit(True))
    return joined.withColumn("normal", normal).withColumn("anomaly", ~normal).drop(label_col)
