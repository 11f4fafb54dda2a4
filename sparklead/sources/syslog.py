"""BGL / Thunderbird / Spirit / Liberty-style loaders (label-prefixed,
epoch-timestamped supercomputer logs) and the Hadoop directory loader.

References:
  * BGL: /root/reference/loglead/loaders/bgl.py — 10 space-separated fields,
    ``normal = label startswith '-'``, epoch-seconds timestamp.
  * Thunderbird/Spirit/Liberty: loaders/supercomputers.py — 9/10 fields,
    component[pid] split, same label convention.
  * Hadoop: loaders/hadoop.py — directory name = seq_id, file name =
    seq_id_sub, '[process]' extraction, multiline merge.

All are pure column expressions over ``spark.read.text`` lines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sparklead.sources.raw import merge_multiline, split_and_unnest

BGL_FIELDS = ["label", "timestamp", "date", "node", "time", "noderepeat", "type", "component", "level", "m_message"]
TB_FIELDS = ["label", "timestamp", "date", "userid", "month", "day", "time", "location", "component_pid", "m_message"]

HADOOP_EVENT_PATTERN = r"^\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2},\d{3}"  # hadoop.py:15


def load_bgl_events(df_lines: DataFrame) -> DataFrame:
    """BGL lines -> canonical event table (bgl.py:12-20)."""
    df = split_and_unnest(df_lines, BGL_FIELDS)
    return (
        df.withColumn("normal", F.col("label").startswith("-"))
        .withColumn("anomaly", ~F.col("label").startswith("-"))
        .withColumn("m_timestamp", F.timestamp_seconds(F.col("timestamp").cast("long")))
    )


def load_thunderbird_events(df_lines: DataFrame, split_component: bool = True) -> DataFrame:
    """Thunderbird/Spirit/Liberty lines (supercomputers.py:18-46)."""
    fields = TB_FIELDS if split_component else TB_FIELDS[:8] + ["m_message"]
    df = split_and_unnest(df_lines, fields)
    df = (
        df.withColumn("normal", F.col("label").startswith("-"))
        .withColumn("anomaly", ~F.col("label").startswith("-"))
        .withColumn("m_timestamp", F.timestamp_seconds(F.col("timestamp").cast("long")))
    )
    if split_component:
        # 'component[pid]:' -> component, pid (supercomputers.py:35-46);
        # done with withColumn, never a horizontal concat (SURVEY.md §7 #3)
        df = (
            df.withColumn("component", F.regexp_replace(F.split("component_pid", r"\[", 2).getItem(0), ":+$", ""))
            .withColumn("pid", F.regexp_replace(F.split("component_pid", r"\[", 2).getItem(1), r"[\]:]+$", ""))
            .drop("component_pid")
        )
    return df


def load_hadoop_events(
    spark: SparkSession,
    root_glob: str,
    app_name_from_dir: str = r".*/([^/]+)/[^/]+$",
) -> DataFrame:
    """Hadoop application logs: dir name = seq_id, file = seq_id_sub
    (hadoop.py:34-52), '[process]' extraction (:20-31), multiline merge
    (:54-91). ``root_glob`` like '/data/hadoop/*/*.log'.

    The reference os.walks + scan_csv per file; Spark reads the whole glob in
    one distributed scan and derives ids from input_file_name().
    """
    lines = spark.read.text(root_glob)
    fname = F.input_file_name()
    df = lines.select(
        F.col("value").alias("m_message"),
        F.regexp_extract(fname, app_name_from_dir, 1).alias("seq_id"),
        F.regexp_extract(fname, r"([^/]+)$", 1).alias("seq_id_sub"),
        F.monotonically_increasing_id().alias("line_nr"),
    )
    # merge per PHYSICAL FILE = (app dir, file name): keying on the bare
    # file name alone would merge same-named files (a 'syslog.log' in every
    # app dir) across applications — interleaved entries with arbitrary
    # seq_id attribution (round-4 review fix)
    df = df.withColumn("_file_key", F.concat_ws("/", "seq_id", "seq_id_sub"))
    df = merge_multiline(df, HADOOP_EVENT_PATTERN, file_col="_file_key").drop("_file_key")
    df = df.withColumn("process", F.regexp_extract("m_message", r"\[(.*?)\]", 1)).withColumn(
        "m_message",
        F.regexp_replace(F.regexp_replace("m_message", r"\s*\[.*?\]\s*", " "), r"\s+", " "),
    )
    return df


def load_gelf(spark: SparkSession, path: str) -> DataFrame:
    """GELF JSON-lines logs (gelf.py:10-28): message -> m_message,
    @timestamp -> m_timestamp."""
    df = spark.read.json(path)
    return (
        df.withColumnRenamed("message", "m_message")
        .withColumn("m_timestamp", F.to_timestamp(F.col("`@timestamp`")))
        .drop("@timestamp")
    )
