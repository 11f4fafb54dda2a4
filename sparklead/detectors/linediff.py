"""Relational line-diff of two runs (LogDistance's diff view).

Reference (/root/reference/loglead/anomaly_detection.py:84-119) collects
both runs and calls difflib — single-node by construction. The relational
part (which lines were added / removed / changed at each position) is a
full-outer join on line number; only the human-readable unified diff needs
the driver, and only for the (small) differing subset.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def line_diff(left: DataFrame, right: DataFrame, line_col: str = "line_nr", msg_col: str = "m_message") -> DataFrame:
    """(line_nr, status, left_msg, right_msg); status ∈ same|changed|added|removed."""
    a = left.select(F.col(line_col).alias("line_nr"), F.col(msg_col).alias("left_msg"))
    b = right.select(F.col(line_col).alias("line_nr"), F.col(msg_col).alias("right_msg"))
    j = a.join(b, "line_nr", "full_outer")
    status = (
        F.when(F.col("left_msg").isNull(), "added")
        .when(F.col("right_msg").isNull(), "removed")
        .when(F.col("left_msg") == F.col("right_msg"), "same")
        .otherwise("changed")
    )
    return j.withColumn("status", status)


def diff_summary(left: DataFrame, right: DataFrame, **kw) -> DataFrame:
    return line_diff(left, right, **kw).groupBy("status").agg(F.count(F.lit(1)).alias("n"))
