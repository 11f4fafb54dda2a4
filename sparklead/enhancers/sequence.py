"""Sequence-level aggregates: the reference's SequenceEnhancer as ONE fused groupBy.

The reference (/root/reference/loglead/enhancers/sequence.py) runs one
group_by + join-back PER FEATURE (start_time :13-16, end_time :18-21,
seq_len :29-37, events :39-44, tokens :46-57, duration :59-67, eve_len
:69-80). On Spark each of those would be a separate shuffle; here all
aggregates are fused into a single ``groupBy('seq_id').agg(...)`` — one
shuffle total — then joined back to the (small) sequence table once.

Ordering discipline (SURVEY.md §7 hard-part 2): Polars preserves input
order inside group lists; Spark's collect_list does not. Every list
aggregate therefore collects ``struct(order_key, value)``, sorts with
``array_sort`` (struct ordering = field order), and projects the value —
deterministic under any partitioning.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def ordered_list(value: Column | str, order: Column | str) -> Column:
    """collect_list(value) deterministically ordered by ``order`` (asc).

    SCALE BOUND: the whole group's list materializes in ONE aggregation
    buffer, so this is safe only where the group size is domain-bounded —
    log sequences (the reference's seq grain, thousands of events), never
    corpus-grain groups. For unbounded groups use counting shapes instead
    (value_counts / token_count_vectors), which stay constant-size per
    group."""
    pair = F.struct(F.col(order) if isinstance(order, str) else order,
                    (F.col(value) if isinstance(value, str) else value).alias("v"))
    return F.transform(F.array_sort(F.collect_list(pair)), lambda s: s["v"])


def sequence_aggregates(
    order_col: str = "m_timestamp",
    event_col: str | None = "e_event_mask_id",
    token_col: str | None = "e_words",
    chars_len_col: str | None = "e_chars_len",
) -> list[Column]:
    """The fused aggregate list for groupBy(seq_id). Pick-and-mix per pipeline."""
    aggs: list[Column] = [
        F.min(order_col).alias("start_time"),                      # sequence.py:13-16
        F.max(order_col).alias("end_time"),                        # sequence.py:18-21
        F.count(F.lit(1)).alias("seq_len"),                        # sequence.py:29-37
        # duration as µs long + seconds (sequence.py:59-67; Spark has no interval col)
        (F.unix_micros(F.max(order_col)) - F.unix_micros(F.min(order_col))).alias("duration_us"),
        (F.unix_timestamp(F.max(order_col)) - F.unix_timestamp(F.min(order_col))).alias("duration_sec"),
    ]
    if event_col:
        aggs.append(ordered_list(event_col, order_col).alias("events"))  # sequence.py:39-44
    if token_col:
        # flattened ordered token list + summed lengths (sequence.py:46-57)
        aggs.append(F.flatten(ordered_list(token_col, order_col)).alias(token_col))
        aggs.append(F.sum(f"{token_col}_len").alias(f"{token_col}_len"))
    if chars_len_col:
        aggs += [
            F.max(chars_len_col).alias("eve_len_max"),             # sequence.py:69-80
            F.min(chars_len_col).alias("eve_len_min"),
            F.avg(chars_len_col).alias("eve_len_avg"),
            F.expr(f"percentile({chars_len_col}, 0.5)").alias("eve_len_med"),
            F.sum((F.col(chars_len_col) > 1).cast("int")).alias("eve_len_over1"),
        ]
    return aggs


def aggregate_sequences(
    df: DataFrame,
    seq_col: str = "seq_id",
    order_col: str = "m_timestamp",
    event_col: str | None = "e_event_mask_id",
    token_col: str | None = "e_words",
    chars_len_col: str | None = "e_chars_len",
) -> DataFrame:
    """events table -> sequence table in one shuffle."""
    present = set(df.columns)
    return df.groupBy(seq_col).agg(
        *sequence_aggregates(
            order_col,
            event_col if event_col in present else None,
            token_col if token_col in present else None,
            chars_len_col if chars_len_col in present else None,
        )
    )


def embeddings_mean(df: DataFrame, seq_col: str = "seq_id", emb_col: str = "e_bert_emb") -> DataFrame:
    """Per-sequence element-wise mean of an array<float> column (sequence.py:82-89).

    Expressed as vector-sum/count with higher-order functions — a single
    hash aggregate, no posexplode shuffle blow-up: zip_with(+) is the merge.
    """
    lists = F.collect_list(emb_col)
    init = F.transform(F.element_at(lists, 1), lambda x: x.cast("double") * 0.0)
    summed = F.aggregate(lists, init, lambda acc, v: F.zip_with(acc, v, lambda a, b: a + b.cast("double")))
    return df.groupBy(seq_col).agg(
        F.transform(summed, lambda x: x / F.size(lists)).alias(emb_col)
    )


class SequenceEnhancer:
    """Chainable wrapper mirroring the reference API but shuffle-fused."""

    def __init__(self, df: DataFrame, df_seq: DataFrame):
        self.df = df
        self.df_seq = df_seq

    def enhance(self, **kw) -> DataFrame:
        # join back on the SAME key the aggregation grouped by — a caller
        # passing seq_col='block_id' must not be joined on 'seq_id'
        # (round-4 review fix)
        agg = aggregate_sequences(self.df, **kw)
        self.df_seq = self.df_seq.join(agg, kw.get("seq_col", "seq_id"))
        return self.df_seq

    def embeddings(self, emb_col: str = "e_bert_emb", seq_col: str = "seq_id") -> DataFrame:
        self.df_seq = self.df_seq.join(
            embeddings_mean(self.df, seq_col=seq_col, emb_col=emb_col), seq_col
        )
        return self.df_seq
