"""Out-of-vocabulary detector as a pure DataFrame plan.

Reference (/root/reference/loglead/OOV_detector.py:8-43): score(row) =
total token occurrences − occurrences of tokens present in the train
vocabulary, i.e. the number of OOV token occurrences; anomaly when
score > threshold.

Spark shape: train vocab = distinct tokens (small, broadcast); test side =
explode + broadcast left join + conditional count. No anti-join shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast


def oov_score(
    test: DataFrame,
    train: DataFrame,
    key_col: str = "seq_id",
    tokens_col: str = "e_words",
    threshold: int = 1,
) -> DataFrame:
    vocab = train.select(F.explode(tokens_col).alias("token")).distinct().withColumn("_in_vocab", F.lit(1))
    exploded = test.select(key_col, F.explode(tokens_col).alias("token"))
    per_key = (
        exploded.join(broadcast(vocab), "token", "left")
        .groupBy(key_col)
        .agg(F.sum(F.when(F.col("_in_vocab").isNull(), 1).otherwise(0)).alias("oov_score"))
    )
    return (
        test.join(per_key, key_col, "left")
        .withColumn("oov_score", F.coalesce("oov_score", F.lit(0)))
        .withColumn("is_ano", (F.col("oov_score") > threshold).cast("int"))
    )
