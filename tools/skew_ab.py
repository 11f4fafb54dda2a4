"""salted_join under a genuinely skewed input (round-5, judge item #8):
the correctness gate proves salted == plain row-for-row; this measures the
salt actually HELPING on a hot key, vs both the naive plan and Spark's own
AQE skew-join mitigation.

Input: `big` has 90% of rows on ONE key (key 0), the rest uniform over
n_keys; `small` is a dim keyed the same, forced OFF the broadcast path
(autoBroadcastJoinThreshold=-1) — the exact situation salted_join is
documented for (skew.py: broadcast impossible + single hot key).

Three configurations, median-of-REPEATS each (CLAUDE.md bench protocol):
  plain/noAQE  — sort-merge join, skew mitigation off: the naive plan,
                 one reducer owns 90% of the probe side
  plain/AQE    — Spark's OptimizeSkewedJoin splits the oversized partition
                 at runtime (the repo's documented DEFAULT position)
  salted/noAQE — sparklead.skew.salted_join, n_salts=16: the manual
                 mechanism for engines/paths where AQE cannot see the skew
                 (e.g. a shuffle feeding a non-join operator, or SMJ inside
                 a cached/stream lineage AQE will not re-plan)

Usage: python tools/skew_ab.py [n_rows] [n_salts]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

REPEATS = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "3"))


def _force(df) -> None:
    from pyspark.sql import functions as F

    cols = [F.col(c).cast("string") for c in df.columns]
    df.select(F.xxhash64(F.struct(*cols)).alias("h")).agg(F.expr("bit_xor(h)")).collect()


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
    n_salts = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    n_keys = 1000

    from pyspark.sql import functions as F

    from sparklead import get_spark
    from sparklead.skew import salted_join

    spark = get_spark("skew-ab", master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    # keep the dim OFF the broadcast path: the scenario salted_join exists for
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    big = spark.range(n_rows, numPartitions=32).select(
        F.when(F.pmod(F.xxhash64("id"), 10) < 9, F.lit(0))
        .otherwise(F.pmod(F.xxhash64("id", F.lit(1)), F.lit(n_keys)))
        .cast("long")
        .alias("k"),
        F.col("id").alias("v"),
    )
    small = spark.range(n_keys).select(
        F.col("id").alias("k"),
        F.md5(F.col("id").cast("string")).alias("meta"),
    )

    def timed(mk):
        runs = []
        for _ in range(REPEATS):
            t0 = time.time()
            _force(mk())
            runs.append(round(time.time() - t0, 3))
        return {"median": statistics.median(runs), "spread": [min(runs), max(runs)]}

    results = {}
    # noAQE variants disable ADAPTIVE wholesale, not just skewJoin: partition
    # coalescing alone reshapes the comparison (it merges the small shuffle
    # partitions and leaves the hot one, changing task counts between arms)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    results["plain_noaqe"] = timed(lambda: big.join(small, "k"))
    results["salted_noaqe"] = timed(
        lambda: salted_join(big, small, "k", n_salts=n_salts, salt_from=F.col("v"))
    )
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    results["plain_aqe"] = timed(lambda: big.join(small, "k"))

    out = {
        "metric": f"skewed join (90 pct one key), salted vs plain, median of {REPEATS}",
        "n_rows": n_rows,
        "n_salts": n_salts,
        **{k: v for k, v in results.items()},
        "salt_speedup_vs_plain_noaqe": round(
            results["plain_noaqe"]["median"] / results["salted_noaqe"]["median"], 2
        ),
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
