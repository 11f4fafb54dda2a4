"""Nezha-style loader: two-level nested JSON decode + time-window label join.

Reference (/root/reference/loglead/loaders/nezha.py): docker/GELF-wrapped
JSON logs decoded twice (outer docker envelope :280-305, inner app log
:353-360) with explicit struct dtypes, then labels attached by an
INTERVAL join — inner join on the injected pod, filtered to events within
(inject_time, inject_time + 3 min] (:458-546).

Spark shape: nested ``from_json`` with explicit StructType (mirroring the
reference's never-infer stance), and the interval join as a range-condition
join — AQE handles the build side; the label table is tiny so it
broadcasts and the range filter runs map-side.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

# outer docker/log-driver envelope (nezha.py:280-305)
OUTER_SCHEMA = "log string, stream string, time string"
# inner application log (nezha.py:353-360)
INNER_SCHEMA = "level string, ts string, message string, TraceId string, SpanId string"


def decode_nested_json(
    df: DataFrame,
    column: str = "m_message",
    outer_schema: str = OUTER_SCHEMA,
    inner_schema: str = INNER_SCHEMA,
) -> DataFrame:
    """Two-level JSON decode: envelope -> app log -> flat columns."""
    outer = F.from_json(F.col(column), outer_schema)
    df = df.withColumn("_outer", outer)
    inner = F.from_json(F.col("_outer.log"), inner_schema)
    return (
        df.withColumn("_inner", inner)
        .select(
            *[c for c in df.columns if c not in (column, "_outer")],
            F.col("_outer.stream").alias("stream"),
            F.to_timestamp(F.col("_outer.time")).alias("m_timestamp"),
            F.col("_inner.level").alias("level"),
            F.col("_inner.message").alias("m_message"),
            F.col("_inner.TraceId").alias("trace_id"),
            F.col("_inner.SpanId").alias("span_id"),
        )
    )


def interval_label_join(
    events: DataFrame,
    labels: DataFrame,
    key_col: str = "pod",
    ts_col: str = "m_timestamp",
    inject_col: str = "inject_time",
    window_minutes: int = 3,
) -> DataFrame:
    """Attach anomaly flags to events inside (inject, inject+window] on the
    injected pod (nezha.py:458-546); events outside any window get False.

    The labels side is tiny -> broadcast; the range predicate evaluates
    map-side, so this 'interval join' never shuffles the fact table.
    Overlapping/repeated injection windows for the same pod are MERGED on
    the (tiny) label side before the join — a plain left join against raw
    windows emitted one fact row PER matching window, silently inflating
    every downstream aggregate (round-4 review fix); with disjoint merged
    intervals each event matches at most once, ONE scan of the fact table.
    """
    from pyspark.sql import Window

    lbl = labels.select(
        F.col(key_col).alias("_lkey"),
        F.col(inject_col).alias("_t0"),
        (F.col(inject_col) + F.expr(f"INTERVAL {window_minutes} MINUTES")).alias("_t1"),
    )
    # classic interval-union on the label table (label-count-sized windows):
    # a window starts a new merged group when it begins after every earlier
    # window's max end; adjacent windows ((a,b] then (b,c]) merge harmlessly
    wdw = Window.partitionBy("_lkey").orderBy("_t0")
    merged = (
        lbl.withColumn(
            "_prev_max", F.max("_t1").over(wdw.rowsBetween(Window.unboundedPreceding, -1))
        )
        .withColumn(
            "_grp",
            F.sum(
                (F.col("_prev_max").isNull() | (F.col("_t0") > F.col("_prev_max"))).cast("int")
            ).over(wdw),
        )
        .groupBy("_lkey", "_grp")
        .agg(F.min("_t0").alias("_t0"), F.max("_t1").alias("_t1"))
    )
    joined = events.join(
        broadcast(merged),
        (events[key_col] == F.col("_lkey")) & (events[ts_col] > F.col("_t0")) & (events[ts_col] <= F.col("_t1")),
        "left",
    )
    return joined.withColumn("anomaly", F.col("_lkey").isNotNull()).withColumn(
        "normal", ~F.col("anomaly")
    ).drop("_lkey", "_grp", "_t0", "_t1")
