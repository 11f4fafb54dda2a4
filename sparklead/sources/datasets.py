"""ADFA / AWSCTD / Pro / LO2 dataset loaders.

Each loader has two layers, mirroring the rest of sparklead.sources:
  * a pure transform over an already-read DataFrame (testable on literal
    rows, oracle-able in SQL);
  * a path-reading convenience built on spark.read.text + input_file_name
    (the Spark twin of the reference's per-file scan_csv + collect_all loop).

Reference files: /root/reference/loglead/loaders/adfa.py, awsctd.py,
pro.py, lo2.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


# ------------------------------------------------------------------ ADFA

def adfa_events(df: DataFrame) -> DataFrame:
    """Explode space-separated syscall-id lines into one event per id.

    Reference ADFALoader.load (adfa.py:30-52): per line, each id becomes a
    row carrying (seq_id, label); label comes from the directory name —
    'Attack_Data_Master' paths keep the attack prefix, others are 'Normal'.
    Input: (m_message, file_path). Output: (m_message, seq_id, label).
    """
    parts = F.split(F.col("file_path"), "/")
    attack = F.col("file_path").contains("Attack_Data_Master")
    # '_'.join(dir.split('_')[:-1]) — the attack name sans trailing run nr
    # (adfa.py:40)
    attack_dir = F.element_at(parts, -2)
    label = F.when(
        attack, F.array_join(F.slice(F.split(attack_dir, "_"), 1, F.size(F.split(attack_dir, "_")) - 1), "_")
    ).otherwise(F.lit("Normal"))
    seq_id = F.regexp_replace(F.element_at(parts, -1), r"\.txt$", "")
    return df.select(
        F.explode(F.filter(F.split(F.trim("m_message"), " "), lambda t: t != "")).alias("m_message"),
        seq_id.alias("seq_id"),
        label.alias("label"),
    )


def adfa_sequences(events: DataFrame) -> DataFrame:
    """Sequence fold (adfa.py:60-68): any non-Normal label -> anomaly."""
    return events.groupBy("seq_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.max((F.col("label") != "Normal").cast("int")).cast("boolean").alias("anomaly"),
        F.min((F.col("label") == "Normal").cast("int")).cast("boolean").alias("normal"),
    )


def load_adfa(spark: SparkSession, path: str) -> DataFrame:
    # recursiveFileLookup: the dataset nests attack runs one level deeper
    # than training/validation (adfa.py:30's os.walk)
    df = (
        spark.read.option("recursiveFileLookup", "true")
        .option("pathGlobFilter", "*.txt")
        .text(path)
        .withColumnRenamed("value", "m_message")
        .withColumn("file_path", F.input_file_name())
        .filter(~F.col("file_path").contains("ADFA-LD+Syscall+List.txt"))
    )
    return adfa_events(df)


# ------------------------------------------------------------------ AWSCTD

def awsctd_sequences(df: DataFrame) -> DataFrame:
    """Split 'syscall,...,label' CSV lines into (events list, label, flags).

    Reference AWSCTDLoader.preprocess (awsctd.py:43-68) does the list
    slicing with per-row Python lambdas; here it is element_at(-1) +
    slice(1, n-1) — pure JVM array ops. 'Clean' labels normalize to
    'Normal' (awsctd.py:57).
    Input: (m_message, seq_id). Output: (seq_id, events, label, normal,
    anomaly).
    """
    parts = F.split("m_message", ",")
    label_raw = F.element_at(parts, -1)
    label = F.when(label_raw == "Clean", "Normal").otherwise(label_raw)
    events = F.when(F.size(parts) > 1, F.slice(parts, 1, F.size(parts) - 1))
    return df.select(
        "seq_id",
        events.alias("events"),
        label.alias("label"),
        (label == "Normal").alias("normal"),
        (label != "Normal").alias("anomaly"),
    )


def awsctd_events(seqs: DataFrame) -> DataFrame:
    """Event-level frame: explode the syscall list (awsctd.py:61)."""
    return seqs.select("seq_id", "label", F.explode("events").alias("m_message"))


def load_awsctd(spark: SparkSession, path: str) -> DataFrame:
    df = (
        spark.read.option("recursiveFileLookup", "true")
        .option("pathGlobFilter", "*.csv")
        .text(path)
        .withColumnRenamed("value", "m_message")
        .withColumn(
            "seq_id",
            F.concat_ws(
                "/",
                F.element_at(F.split(F.input_file_name(), "/"), -2),
                F.regexp_replace(F.element_at(F.split(F.input_file_name(), "/"), -1), r"\.csv$", ""),
            ),
        )
    )
    return awsctd_sequences(df)


# ------------------------------------------------------------------ Pro

PRO_FIELDS = ["count", "date", "time", "system", "nr1", "nr2", "log_level", "m_message"]


def pro_events(df: DataFrame) -> DataFrame:
    """Pro log lines: whitespace squeeze, 8-field split (last keeps the
    remainder), 'dd.MM.yyyyHH:mm:ss.SSS' timestamp from date+time, normal
    flag from the file-derived seq_id prefix.

    Reference ProLoader.preprocess (pro.py:23-48). Input: (m_message,
    seq_id). Output: the 8 fields + m_timestamp + seq_id + normal.
    """
    squeezed = F.trim(F.regexp_replace("m_message", r"\s+", " "))
    parts = F.split(squeezed, " ", len(PRO_FIELDS))
    cols = [parts.getItem(i).alias(name) for i, name in enumerate(PRO_FIELDS)]
    out = df.select("seq_id", *cols)
    return out.select(
        "*",
        F.try_to_timestamp(
            F.concat("date", "time"), F.lit("dd.MM.yyyyHH:mm:ss.SSS")
        ).alias("m_timestamp"),
        F.col("seq_id").startswith("success").alias("normal"),
    )


def load_pro(spark: SparkSession, path: str, min_file_size: int = 1) -> DataFrame:
    from sparklead.sources.raw import load_text

    df = load_text(spark, path, min_file_size=min_file_size)
    return pro_events(
        df.withColumn("seq_id", F.element_at(F.split("file_name", "/"), -1)).drop("file_name", "line_nr")
    )


# ------------------------------------------------------------------ LO2

LO2_TS_FORMATS = ["yyyy-MM-dd HH:mm:ss", "HH:mm:ss.SSS", "yyyy-MM-dd'T'HH:mm:ss"]


def lo2_events(df: DataFrame) -> DataFrame:
    """LO2 log lines: timestamp-prefix extract + multi-format coalesce parse,
    drop rows without a timestamp, normal = test_case=='correct'.

    Reference LO2Loader._parse_timestamps (lo2.py:220-246) + load (:120).
    Input: (m_message, run, test_case, service). Output adds seq_id,
    m_timestamp, normal.
    """
    ts_str = F.regexp_extract("m_message", r"^(\d{2}:\d{2}:\d{2}\.\d{3})", 1)
    parsed = F.coalesce(*[F.try_to_timestamp(ts_str, F.lit(fmt)) for fmt in LO2_TS_FORMATS])
    return (
        df.withColumn("m_timestamp", parsed)
        .filter(F.col("m_timestamp").isNotNull())
        .withColumn("seq_id", F.concat_ws("__", "run", "test_case", "service"))
        .withColumn("normal", F.col("test_case") == "correct")
    )


def lo2_sequences(events: DataFrame) -> DataFrame:
    """Sequence fold (lo2.py:200-209): ordered group-concat of messages,
    any-normal, start/end times. Order key = m_timestamp (the reference
    relies on file order; timestamps are the explicit key here). List
    aggregation goes through the canonical ``ordered_list`` helper
    (CLAUDE.md ordering discipline)."""
    from sparklead.enhancers.sequence import ordered_list

    return events.groupBy("seq_id").agg(
        F.concat_ws("\n", ordered_list("m_message", "m_timestamp")).alias("m_message"),
        F.max("normal").alias("normal"),
        (~F.max("normal")).alias("anomaly"),
        F.min("m_timestamp").alias("start_time"),
        F.max("m_timestamp").alias("end_time"),
    )


def load_lo2(spark: SparkSession, path: str, service: str = "") -> DataFrame:
    """Directory layout run/test_case/service.log (lo2.py:51-111)."""
    parts = F.split(F.input_file_name(), "/")
    df = (
        spark.read.text(f"{path}/*/*/*.log")
        .withColumnRenamed("value", "m_message")
        .filter(F.trim("m_message") != "")
        .withColumn("run", F.element_at(parts, -3))
        .withColumn("test_case", F.element_at(parts, -2))
        .withColumn("service", F.regexp_replace(F.element_at(parts, -1), r"\.log$", ""))
    )
    if service:
        df = df.filter(F.col("service").contains(f"oauth2-oauth2-{service}"))
    return lo2_events(df)
