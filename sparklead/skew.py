"""Explicit skew-handling operators (north rule: "partitioning / shuffle /
skew handled explicitly"; SURVEY.md §4.2).

The repo's default position, documented in pipeline.py: ALGEBRAIC
aggregates need no salting — map-side partial aggregation collapses a hot
key's rows before the exchange, and AQE's skew-join rule splits oversized
sort-merge partitions at runtime. The cases that still need a MANUAL salt
at 100 TB are:

* a skewed equi-join whose build side is TOO BIG to broadcast (AQE can
  split an SMJ partition, but a single hot key's rows all hash to one
  partition and a partition holding one key cannot be split by key) —
  ``salted_join``;
* a holistic aggregate whose per-key state is itself huge (exact distinct
  sets over a hot key) — ``salted_distinct_count``.

Both keep every operation deterministic (salts derive from xxhash64 of row
content, never rand()), matching the repo's reproducibility conventions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _free_name(base: str, *column_sets: list[str]) -> str:
    """A temp-column name guaranteed absent from every given column list
    (advisor fix: hardcoded '_salt'/'_b' silently replaced + dropped a
    caller's same-named column, corrupting the result with no error)."""
    taken = {c for cols in column_sets for c in cols}
    name = base
    while name in taken:
        name += "_"
    return name


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 16,
    salt_from: Column | None = None,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: replicate ``small`` ``n_salts``× and scatter each
    of ``big``'s hot-key rows across the replicas.

    The classic manual salting recipe (the one AQE cannot express when the
    hot key is a SINGLE key: all its rows hash to one reduce partition, and
    splitting that partition by row requires the other side replicated —
    exactly what the salt does):

      big:   salt = xxhash64(row fingerprint) % n_salts   (deterministic)
      small: explode(sequence(0, n_salts-1)) as salt      (replicate)
      join on (key, salt) -> the hot key's rows spread over n_salts
      reduce partitions instead of one.

    ``salt_from`` picks the fingerprint column(s) for the deterministic
    per-row salt (default: the whole row struct — deterministic for a given
    row content; pass a unique id column when available to guarantee
    uniform spread even for fully duplicated rows). Cost: the small side
    shuffles n_salts× its size — use ONLY when broadcast is impossible and
    the key histogram is skewed; a broadcast join needs no salt at all.

    Result equals ``big.join(small, key, how)`` row-for-row (pytest-pinned).
    Supported ``how``: inner / left (the replicated right side never
    invents or drops matches — each big row carries exactly one salt).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    # collision-free temp column (advisor fix: a caller column named _salt
    # was silently overwritten by withColumn and dropped from the result)
    salt_col = _free_name("_salt", big.columns, small.columns)
    fp = salt_from if salt_from is not None else F.struct(*[F.col(c) for c in big.columns])
    b = big.withColumn(salt_col, F.pmod(F.xxhash64(fp), F.lit(n_salts)).cast("int"))
    s = small.withColumn(
        salt_col, F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)).cast("array<int>"))
    )
    return b.join(s, [key, salt_col], how).drop(salt_col)


def salted_distinct_count(
    df: DataFrame,
    key: str,
    item: str,
    n_salts: int = 64,
) -> DataFrame:
    """Exact distinct-``item`` count per ``key``, hot-key-safe: (key, n_distinct).

    Two-stage split by ITEM-hash bucket: distinct items partition disjointly
    across buckets, so sum of per-(key, bucket) distinct counts == the exact
    per-key distinct count — while a hot key's (potentially huge) distinct
    set spreads over ``n_salts`` reduce tasks instead of funnelling through
    one. (Spark's own countDistinct expansion groups by (key, item), which
    spreads the first stage but still merges per-key on one reducer; this
    shape also bounds the MERGE stage at n_salts partial counts per key.)
    """
    b_col = _free_name("_b", df.columns)
    d_col = _free_name("_d", df.columns)
    bucket = F.pmod(F.xxhash64(F.col(item).cast("string")), F.lit(n_salts))
    per_bucket = df.groupBy(F.col(key), bucket.alias(b_col)).agg(
        F.countDistinct(item).alias(d_col)
    )
    return per_bucket.groupBy(key).agg(F.sum(d_col).alias("n_distinct"))
