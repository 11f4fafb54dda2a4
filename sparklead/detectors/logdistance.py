"""LogDistance: distances between two log runs over whole-run term vectors.

Reference (/root/reference/loglead/anomaly_detection.py:39-178): builds one
term-count vector per run via CountVectorizer, then cosine / jaccard /
containment, plus a bz2 compression distance over the two concatenated run
texts (anomaly_detection.py:142-151) — driver-side there and here (difflib
viz stays out of the data plane).

Spark shape: term vector = groupBy(token).count per side; one full-outer
join on token; distances are single-row aggregates. All shuffles are
vocabulary-sized. The compression distance is inherently non-decomposable
(bz2 over the concatenation), so like the reference it collects the run
text — a RUN-comparison op for bounded runs (single logs, MB-scale), not a
corpus op.
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


def _run_text(df: DataFrame, column: str, order_col: str | None, max_rows: int | None) -> str:
    """Collect one run's messages into a single space-joined string.

    The reference concatenates in frame order (anomaly_detection.py:52-57);
    a distributed frame has no implicit order, so rows are sorted by
    ``order_col`` (or by the message itself) for a partition-invariant
    result. ``max_rows`` guards the driver: compression distance is a
    bounded-run comparison, never a corpus op."""
    col = df[column]
    # list<str> columns join to one line per row, like the reference's
    # pl.col(field).list.join(" ") branch
    if dict(df.dtypes)[column].startswith("array"):
        df = df.select(F.array_join(col, " ").alias(column), *([order_col] if order_col else []))
    ordered = df.orderBy(order_col if order_col else column)
    if max_rows is not None:
        ordered = ordered.limit(max_rows)
    return " ".join(r[column] for r in ordered.select(column).collect())


def compression_distance(
    left: DataFrame,
    right: DataFrame,
    column: str = "m_message",
    order_col: str | None = None,
    max_rows: int | None = 1_000_000,
) -> float:
    """bz2 normalized compression distance between two runs' texts.

    Reference formula (anomaly_detection.py:142-151):
      (len(C(a+b)) - min(len(C(a)), len(C(b)))) / max(len(C(a)), len(C(b)))
    ~0 for identical runs, approaches 1 for unrelated runs. Driver-side by
    construction (compression of the concatenation cannot be decomposed into
    partition-local work), exactly as in the reference."""
    import bz2

    s_a = _run_text(left, column, order_col, max_rows)
    s_b = _run_text(right, column, order_col, max_rows)
    len_a = len(bz2.compress(s_a.encode()))
    len_b = len(bz2.compress(s_b.encode()))
    combined = len(bz2.compress((s_a + s_b).encode()))
    return (combined - min(len_a, len_b)) / max(len_a, len_b)
