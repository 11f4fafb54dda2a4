"""LogDistance: distances between two log runs over whole-run term vectors.

Reference (/root/reference/loglead/anomaly_detection.py:39-178): builds one
term-count vector per run via CountVectorizer, then cosine / jaccard /
containment (compression distance & difflib stay driver-side there and are
out of the data plane here too).

Spark shape: term vector = groupBy(token).count per side; one full-outer
join on token; distances are single-row aggregates. All shuffles are
vocabulary-sized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def term_vector(df: DataFrame, tokens_col: str = "e_words") -> DataFrame:
    """(token, cnt) term-frequency vector of a run."""
    return df.select(F.explode(tokens_col).alias("token")).groupBy("token").agg(
        F.count(F.lit(1)).alias("cnt")
    )


def log_distances(left: DataFrame, right: DataFrame, tokens_col: str = "e_words") -> DataFrame:
    """One-row DataFrame: cosine, jaccard, containment between two runs."""
    a = term_vector(left, tokens_col).withColumnRenamed("cnt", "a")
    b = term_vector(right, tokens_col).withColumnRenamed("cnt", "b")
    j = a.join(b, "token", "full_outer").select(
        F.coalesce("a", F.lit(0)).alias("a"), F.coalesce("b", F.lit(0)).alias("b")
    )
    return j.agg(
        (
            F.sum(F.col("a") * F.col("b"))
            / (F.sqrt(F.sum(F.col("a") * F.col("a"))) * F.sqrt(F.sum(F.col("b") * F.col("b"))))
        ).alias("cosine"),
        (
            F.sum(((F.col("a") > 0) & (F.col("b") > 0)).cast("long"))
            / F.count(F.lit(1)).cast("double")
        ).alias("jaccard"),
        (
            F.sum(((F.col("a") > 0) & (F.col("b") > 0)).cast("long"))
            / F.sum((F.col("a") > 0).cast("long")).cast("double")
        ).alias("containment"),
    )
