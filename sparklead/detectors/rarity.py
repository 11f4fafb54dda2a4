"""RarityModel as a pure DataFrame plan (no sklearn, no driver matrices).

Reference (/root/reference/loglead/RarityModel.py:8-44): fit = token-frequency
vector over the train split; score(row) = (count-vector · score-vector) /
nnz(count-vector); token score = 0 if freq/total > common_threshold else
(-ln(freq/total))^3. Because the reference's CountVectorizer is fit on train,
out-of-vocabulary test tokens contribute nothing (neither to the dot product
nor to nnz) — replicated here by the inner join.

Spark shape: fit = explode + groupBy(token).count (one shuffle, partial aggs
map-side); score = explode + broadcast join against the (small) score table +
one per-row aggregate. The score table is vocabulary-sized — broadcastable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast


def rarity_fit(train: DataFrame, tokens_col: str = "e_words", common_threshold: float = 0.01) -> DataFrame:
    """Token score table: (token, freq, score). One hash-agg shuffle."""
    tok = train.select(F.explode(tokens_col).alias("token"))
    counts = tok.groupBy("token").agg(F.count(F.lit(1)).alias("freq"))
    total = counts.agg(F.sum("freq").alias("total"))
    scored = counts.crossJoin(broadcast(total)).select(
        "token",
        "freq",
        F.when(F.col("freq") / F.col("total") > common_threshold, F.lit(0.0))
        .otherwise(F.pow(-F.log(F.col("freq") / F.col("total")), F.lit(3.0)))
        .alias("score"),
    )
    return scored


def rarity_score(
    test: DataFrame,
    score_table: DataFrame,
    key_col: str = "seq_id",
    tokens_col: str = "e_words",
    threshold: float = 10.0,
) -> DataFrame:
    """Per-row rarity score + is_ano flag.

    dot(count_vec, score_vec) = sum of per-occurrence scores;
    nnz(count_vec)            = distinct in-vocabulary tokens in the row.
    """
    exploded = test.select(key_col, F.explode(tokens_col).alias("token"))
    joined = exploded.join(broadcast(score_table.select("token", "score")), "token", "inner")
    per_key = joined.groupBy(key_col).agg(
        F.sum("score").alias("_dot"),
        F.countDistinct("token").alias("_nnz"),
    )
    score = F.col("_dot") / F.greatest(F.col("_nnz"), F.lit(1)).cast("double")
    return (
        test.join(per_key, key_col, "left")
        .withColumn("rarity_score", F.coalesce(score, F.lit(0.0)))
        .withColumn("is_ano", (F.col("rarity_score") > threshold).cast("int"))
        .drop("_dot", "_nnz")
    )
