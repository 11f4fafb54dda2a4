"""Next-event prediction with n-grams — fully relational.

Reference (/root/reference/loglead/next_event_prediction.py:19-146) builds
Python Counter dicts over SoS-padded n-grams and scores each test position
with four signals (abs count, sum-normalized prob, max-normalized prob,
winner-correctness) plus sequence perplexity
(enhancers/sequence.py:129-132).

Spark shape (SURVEY.md §2.10): n-gram slicing is a higher-order-function
``transform(sequence(...), i -> slice(...))`` — no UDF; the model is two
hash aggregates (n-gram counts, (n-1)-gram counts) plus a ``max_by`` winner
table; scoring is three broadcast joins on the exploded positional n-grams
and one ordered re-aggregation. Every step is shuffle-bounded by the model
tables, which are vocabulary-sized, not data-sized.

Winner ties: the reference keeps the first-inserted n-gram (arrival order,
next_event_prediction.py:49-55) — not reproducible distributed; we break
ties deterministically by lexicographically-smallest n-gram.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

SOS, EOS = "SoS", "EoS"
# n-gram key delimiter: a control char that cannot appear in event labels —
# joining with ' ' made labels containing spaces collide ("disk full|ok" vs
# "disk|full ok") and broke the substring_index prefix/suffix extraction
# (round-4 review fix); keys are internal, outputs carry bare labels
SEP = "\x1f"


def _padded(events: Column, n: int) -> Column:
    return F.concat(F.array_repeat(F.lit(SOS), n - 1), events, F.array(F.lit(EOS)))


def _positional_ngrams(df: DataFrame, events_col: str, n: int, key_col: str) -> DataFrame:
    """(key, pos, ngram, n1gram) — one row per scored position (slice_ngrams :58-75)."""
    padded = _padded(F.col(events_col), n)
    grams = F.transform(
        F.sequence(F.lit(1), F.size(padded) - (n - 1)),
        lambda i: F.struct(
            i.alias("pos"),
            F.array_join(F.slice(padded, i, n), SEP).alias("ngram"),
            F.array_join(F.slice(padded, i, n - 1), SEP).alias("n1gram"),
        ),
    )
    return df.select(key_col, F.explode(grams).alias("g")).select(
        key_col, F.col("g.pos").alias("pos"), F.col("g.ngram").alias("ngram"), F.col("g.n1gram").alias("n1gram")
    )


@dataclass
class NGramModel:
    ngram_counts: DataFrame   # (ngram, n_count)
    n1_counts: DataFrame      # (n1gram, n1_count)
    winners: DataFrame        # (n1gram, winner_ngram, winner_count, prediction)
    n: int

    @classmethod
    def fit(cls, df_seq: DataFrame, events_col: str = "events", n: int = 5, key_col: str = "seq_id") -> "NGramModel":
        pos = _positional_ngrams(df_seq, events_col, n, key_col)
        ngram_counts = pos.groupBy("ngram").agg(F.count(F.lit(1)).alias("n_count"))
        n1_counts = pos.groupBy("n1gram").agg(F.count(F.lit(1)).alias("n1_count"))
        # winner = most frequent full n-gram per (n-1)-gram; deterministic
        # tie-break = lexicographically smallest, via min_by on (-count, ngram)
        winners = (
            ngram_counts.withColumn("n1gram", F.substring_index(F.col("ngram"), SEP, n - 1))
            .groupBy("n1gram")
            .agg(
                F.min_by(
                    F.struct(F.col("ngram").alias("winner_ngram"), F.col("n_count").alias("winner_count")),
                    F.struct((-F.col("n_count")).alias("a"), F.col("ngram").alias("b")),
                ).alias("w")
            )
            .select(
                "n1gram",
                F.col("w.winner_ngram").alias("winner_ngram"),
                F.col("w.winner_count").alias("winner_count"),
            )
            .withColumn("prediction", F.substring_index(F.col("winner_ngram"), SEP, -1))
        )
        return cls(ngram_counts, n1_counts, winners, n)

    def score(self, df_seq: DataFrame, events_col: str = "events", key_col: str = "seq_id") -> DataFrame:
        """Attach nep_* list columns + aggregates + perplexity to df_seq."""
        pos = _positional_ngrams(df_seq, events_col, self.n, key_col)
        scored = (
            pos.join(broadcast(self.ngram_counts), "ngram", "left")
            .join(broadcast(self.n1_counts), "n1gram", "left")
            .join(broadcast(self.winners), "n1gram", "left")
            .select(
                key_col,
                "pos",
                F.coalesce(F.col("n_count"), F.lit(0)).alias("abs_c"),
                F.coalesce(F.col("n1_count"), F.lit(0)).alias("sum_c"),
                F.coalesce(F.col("winner_count"), F.lit(0)).alias("max_c"),
                F.coalesce(F.col("prediction"), F.lit("<UNSEEN>")).alias("pred"),
                F.when(F.col("winner_ngram").isNotNull() & (F.col("winner_ngram") == F.col("ngram")), 1)
                .otherwise(0)
                .alias("corr"),
            )
            # 0 -> 1 denominators (next_event_prediction.py:138-140)
            .withColumn("p_sum", F.col("abs_c") / F.greatest(F.col("sum_c"), F.lit(1)).cast("double"))
            .withColumn("p_max", F.col("abs_c") / F.greatest(F.col("max_c"), F.lit(1)).cast("double"))
        )
        packed = F.array_sort(
            F.collect_list(
                F.struct("pos", "pred", "corr", "abs_c", "p_sum", "p_max")
            )
        )
        agg = scored.groupBy(key_col).agg(packed.alias("_s")).select(
            key_col,
            F.transform("_s", lambda s: s["pred"]).alias("nep_predict"),
            F.transform("_s", lambda s: s["corr"]).alias("nep_corr"),
            F.transform("_s", lambda s: s["abs_c"]).alias("nep_abs"),
            F.transform("_s", lambda s: s["p_sum"]).alias("nep_prob_nsum"),
            F.transform("_s", lambda s: s["p_max"]).alias("nep_prob_nmax"),
        )
        # scalar summaries (sequence.py:110-127) + perplexity (sequence.py:129-132)
        arr_avg = lambda c: (F.aggregate(c, F.lit(0.0), lambda a, x: a + x) / F.size(c))
        agg = (
            agg.withColumn("nep_abs_avg", arr_avg(F.col("nep_abs").cast("array<double>")))
            .withColumn("nep_abs_max", F.array_max("nep_abs"))
            .withColumn("nep_abs_min", F.array_min("nep_abs"))
            .withColumn("nep_prob_nmax_avg", arr_avg(F.col("nep_prob_nmax")))
            .withColumn("nep_prob_nmax_max", F.array_max("nep_prob_nmax"))
            .withColumn("nep_prob_nmax_min", F.array_min("nep_prob_nmax"))
            .withColumn(
                "nep_prob_nmax_perp",
                # log(0) is NULL in Spark, which would NULL the whole fold for
                # exactly the sequences containing an UNSEEN n-gram — the ones
                # the detector exists to flag; the reference's numpy log(0)
                # yields -inf and perplexity +inf (most anomalous), mirrored
                # here explicitly (round-4 review fix)
                F.exp(-(
                    F.aggregate(
                        F.transform(
                            "nep_prob_nmax",
                            lambda x: F.when(x > 0, F.log(x)).otherwise(F.lit(float("-inf"))),
                        ),
                        F.lit(0.0),
                        lambda a, x: a + x,
                    )
                    / F.size("nep_prob_nmax")
                )),
            )
        )
        return df_seq.join(agg, key_col, "left")


def nep_enhance(df_seq: DataFrame, events_col: str = "events", n: int = 5, key_col: str = "seq_id") -> DataFrame:
    """Reference next_event_prediction enhancer: fit and score on the same data
    (enhancers/sequence.py:91-127)."""
    model = NGramModel.fit(df_seq, events_col, n, key_col)
    return model.score(df_seq, events_col, key_col)
