"""Raw log-line sources and structural parsing.

The reference reads every log file as ONE string column by using a '\\a'
separator CSV trick (/root/reference/loglead/loaders/base.py:13,
loaders/raw.py:83-86). Spark's native answer is ``spark.read.text`` — exactly
one string column, no quoting, multi-file globs with task parallelism (the
Spark equivalent of the reference's scan_csv + collect_all fan-in,
raw.py:56-80). File identity comes from ``input_file_name()`` instead of the
reference's include_file_paths (raw.py:64-70).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

# reference: line starts with a timestamp-ish prefix (base.py:109-125, hadoop.py:15)
DEFAULT_TS_LINE_PATTERN = r"^\d{4}-\d{2}-\d{2}"


def load_text(
    spark: SparkSession, path: str, strip_prefix: str | None = None, min_file_size: int = 0
) -> DataFrame:
    """Read raw lines: columns (m_message, file_name, line_nr).

    ``line_nr`` is monotonically increasing within each file split — the
    explicit order key every downstream order-dependent op requires
    (SURVEY.md §4.2 #5). Mirrors loaders/raw.py:56-86.

    ``min_file_size`` drops under-sized files before the scan — a driver-side
    listing filter over the glob, exactly the reference's
    ``os.path.getsize(file) > 0`` guard (loaders/raw.py:62, pro.py:16).
    """
    if min_file_size > 0:
        import glob as _glob
        import os as _os

        # a bare directory path works for spark.read.text but would glob to
        # [the directory itself] here and isfile-filter to NOTHING — expand
        # it to dir/* so the filtered and unfiltered paths read the same
        # files (round-4 review fix; this driver-side listing is local-fs
        # only by design, mirroring the reference's os.path.getsize guard)
        gpath = _os.path.join(path, "*") if _os.path.isdir(path) else path
        files = [
            f
            for f in sorted(_glob.glob(gpath, recursive=True))
            if _os.path.isfile(f) and _os.path.getsize(f) >= min_file_size
        ]
        if not files:
            return spark.createDataFrame([], "m_message string, file_name string, line_nr long")
        df = spark.read.text(files).withColumnRenamed("value", "m_message")
    else:
        df = spark.read.text(path).withColumnRenamed("value", "m_message")
    fname = F.input_file_name()
    if strip_prefix:
        fname = F.regexp_replace(fname, "^" + strip_prefix, "")
    return df.select(
        "m_message", fname.alias("file_name"), F.monotonically_increasing_id().alias("line_nr")
    )


def split_and_unnest(df: DataFrame, field_names: list[str], column: str = "m_message", sep: str = " ") -> DataFrame:
    """Fixed-arity field split; the LAST field keeps the remainder.

    Reference _split_and_unnest (loaders/base.py:101-107): Polars splitn ->
    struct -> unnest. Spark: split with limit=n (same remainder semantics).
    """
    n = len(field_names)
    parts = F.split(F.col(column), sep, n)
    cols = [parts.getItem(i).alias(name) for i, name in enumerate(field_names)]
    return df.select(*[c for c in df.columns if c != column], *cols)


def extract_seq_id(df: DataFrame, pattern: str = r"(blk_-?\d+)", column: str = "m_message") -> DataFrame:
    """Regex sequence-id extraction (loaders/hdfs.py:31-34)."""
    return df.withColumn("seq_id", F.regexp_extract(F.col(column), pattern, 1))


def parse_timestamp(
    df: DataFrame,
    formats: list[str],
    columns: list[str] | None = None,
    out: str = "m_timestamp",
) -> DataFrame:
    """Timestamp parse with a coalesce fallback chain over formats.

    Mirrors hdfs.py:36-39 (concat date+time then strptime) and the
    multi-format coalesce at nezha.py:432-444 / lo2.py:221-246.
    ``columns``: concatenated (no separator) before parsing, default [out].
    """
    src = F.concat(*[F.col(c) for c in columns]) if columns else F.col(out)
    parsed = F.coalesce(*[F.try_to_timestamp(src, F.lit(fmt)) for fmt in formats])
    return df.withColumn(out, parsed)


def flag_line_starts(df: DataFrame, pattern: str = DEFAULT_TS_LINE_PATTERN, column: str = "m_message") -> DataFrame:
    """Boolean 'this line starts a new entry' flag (base.py:109-125)."""
    return df.withColumn("_entry_start", F.col(column).rlike(pattern))


def merge_multiline(
    df: DataFrame,
    pattern: str = DEFAULT_TS_LINE_PATTERN,
    column: str = "m_message",
    file_col: str = "file_name",
    order_col: str = "line_nr",
) -> DataFrame:
    """Merge continuation lines (stack traces) into their parent entry.

    Reference 'merge' timestamp strategy (loaders/raw.py:171-194,
    hadoop.py:55-91): cumulative sum of the start-flag forms entry groups,
    then group-concat with '\\n'. Sessionization pattern: the window is
    per-file (parallel across files), not global.
    """
    from sparklead.enhancers.sequence import ordered_list

    df = flag_line_starts(df, pattern, column)
    w = Window.partitionBy(file_col).orderBy(order_col)
    df = df.withColumn("_entry_id", F.sum(F.col("_entry_start").cast("int")).over(w))
    other = [c for c in df.columns if c not in (column, "_entry_start", "_entry_id", order_col)]
    # carried columns take the entry's HEAD-line value via min_by(c, order)
    # — an unordered first() returned an arbitrary line's value after the
    # groupBy shuffle, non-deterministic for per-line columns like a level
    # or timestamp parsed before merging (round-4 review fix); the message
    # concat goes through the canonical ordered_list helper
    merged = df.groupBy(file_col, "_entry_id").agg(
        F.min(order_col).alias(order_col),
        F.concat_ws("\n", ordered_list(column, order_col)).alias(column),
        *[F.min_by(c, F.col(order_col)).alias(c) for c in other if c != file_col],
    )
    return merged.drop("_entry_id")


def backward_fill_timestamps(
    df: DataFrame, ts_col: str = "m_timestamp", file_col: str = "file_name", order_col: str = "line_nr"
) -> DataFrame:
    """fill_null(strategy='backward') per file (loaders/raw.py:165-169).

    First non-null following value via an unbounded-following window.
    """
    w = Window.partitionBy(file_col).orderBy(order_col).rowsBetween(0, Window.unboundedFollowing)
    return df.withColumn(ts_col, F.first(ts_col, ignorenulls=True).over(w))


def sample_sequences(
    df: DataFrame, df_seq: DataFrame, fraction: float, seed: int = 42, seq_col: str = "seq_id"
) -> tuple[DataFrame, DataFrame]:
    """Seeded sequence sampling + semi-join filter of events (base.py:127-149)."""
    seq_sampled = df_seq.sample(fraction=fraction, seed=seed)
    events = df.join(seq_sampled.select(seq_col), seq_col, "left_semi")
    return events, seq_sampled


def json_lines(spark: SparkSession, path: str, schema: str | None = None) -> DataFrame:
    """JSON-lines source (GELF loader, loaders/gelf.py:11-17)."""
    reader = spark.read
    if schema:
        reader = reader.schema(schema)
    return reader.json(path)


def extract_timestamp_prefix(
    df: DataFrame,
    pattern: str,
    fmt: str,
    column: str = "m_message",
    missing_action: str = "keep",
    file_col: str = "file_name",
    order_col: str = "line_nr",
) -> DataFrame:
    """Timestamp-prefix extraction + missing-timestamp strategies.

    Reference _parse_timestamp (loaders/raw.py:143-169): pull group 1 of
    ``pattern`` out of the message, strip it, strptime. Strategies for rows
    without a timestamp: 'drop' | 'keep' | 'fill-lastseen' (forward fill of
    the PREVIOUS seen value per file — raw.py:160-169 uses backward; both
    offered).
    """
    df = df.withColumn("m_timestamp", F.try_to_timestamp(F.regexp_extract(F.col(column), pattern, 1), F.lit(fmt)))
    df = df.withColumn(column, F.regexp_replace(F.col(column), pattern, ""))
    if missing_action == "drop":
        df = df.filter(F.col("m_timestamp").isNotNull())
    elif missing_action == "fill-lastseen":
        w = Window.partitionBy(file_col).orderBy(order_col).rowsBetween(Window.unboundedPreceding, 0)
        df = df.withColumn("m_timestamp", F.last("m_timestamp", ignorenulls=True).over(w))
    elif missing_action == "fill-next":
        df = backward_fill_timestamps(df, "m_timestamp", file_col, order_col)
    return df


def combine_file_date(
    df: DataFrame,
    file_dates: dict[str, str],
    file_col: str = "file_name",
    ts_col: str = "m_timestamp",
) -> DataFrame:
    """Date from file metadata + time-of-day from the log line, with
    midnight-rollover correction (loaders/raw.py:103-141): when the file's
    mtime-of-day is earlier than a near-midnight log time, the log line
    belongs to the previous day.

    ``file_dates`` maps file name -> 'yyyy-MM-dd HH:mm:ss' (driver-side file
    metadata, as in the reference); it is tiny and enters the plan as a
    literal map.
    """
    mapping = F.create_map(*[F.lit(x) for kv in file_dates.items() for x in kv])
    df = df.withColumn("_file_ts", F.to_timestamp(mapping[F.col(file_col)]))
    log_time_s = (
        F.hour(ts_col) * 3600 + F.minute(ts_col) * 60 + F.second(ts_col)
    )
    file_time_s = F.hour("_file_ts") * 3600 + F.minute("_file_ts") * 60 + F.second("_file_ts")
    rollover = (file_time_s < log_time_s) & (F.hour(ts_col) == 23)
    base_date = F.when(rollover, F.date_sub(F.to_date("_file_ts"), 1)).otherwise(F.to_date("_file_ts"))
    combined = F.to_timestamp(
        F.concat(base_date.cast("string"), F.lit(" "), F.date_format(ts_col, "HH:mm:ss"))
    )
    return df.withColumn(ts_col, combined).drop("_file_ts")


def parse_hadoop_labels(spark: SparkSession, text: str) -> DataFrame:
    """Parse the Hadoop abnormal_label.txt format into (app_id, app_name,
    Label) — stateful line parser (loaders/hadoop.py:112-133), driver-side
    because the file is tiny; result joins broadcast."""
    rows = []
    app_name = anomaly = None
    for line in text.splitlines():
        line = line.strip()
        if line.startswith("###"):
            app_name = line.split("###")[1].strip()
        elif line.endswith(":"):
            anomaly = line[:-1]
        elif line.startswith("+"):
            rows.append((line.split("+")[1].strip(), app_name, anomaly))
    return spark.createDataFrame(rows, "app_id string, app_name string, Label string")
