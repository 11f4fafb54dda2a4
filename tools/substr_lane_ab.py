"""Substring-dedup detection-lane A/B: the shipped single-scan WINDOW
lane (one exchange + sort; count/rank in one pass) vs the rejected
two-scan GROUPBY+JOIN lane (hash agg on gram -> dup-gram set -> second
gram pass joined against it; no sort, two corpus scans).

Why measure: the window lane's sort is the operator's memory/disk
pressure point (the 20M local-spill ceiling in BENCH.md), and hash
aggregation looks cheaper — but with NEAR-UNIQUE gram keys the agg's
hash table is data-sized and falls back to sort-based spilling anyway,
while paying a second full corpus scan + hash pass. This records the
actual trade at 2M docs instead of leaving the plan choice as argument.

Each lane runs in its OWN Spark session so UI shuffle totals are clean.

Usage: python tools/substr_lane_ab.py [n_docs]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from scaleup_bench import _ui_stage_stats  # noqa: E402

L = 8


def _mk(app: str, cpus: int = 8):
    from sparklead import get_spark

    spark = get_spark(app, master=f"local[{cpus}]", shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def _gen(spark, n_docs: int, path: str) -> None:
    from sparklead.synth import pretokenized

    pretokenized(spark, n_docs, 32).write.mode("overwrite").parquet(path)


def _run_window(spark, path: str) -> dict:
    from pyspark.sql import functions as F

    from sparklead.substrings import duplicate_window_positions

    df = spark.read.parquet(path)
    t0 = time.time()
    agg = duplicate_window_positions(df, L).agg(
        F.count(F.lit(1)).alias("n_dup"),
        F.expr("bit_xor(xxhash64(doc_id, pos))").alias("sig"),
    ).first()
    out = {"wall_sec": round(time.time() - t0, 3), "n_dup": agg["n_dup"], "sig": agg["sig"]}
    out |= _ui_stage_stats(spark.sparkContext.uiWebUrl)
    return out


def _run_agg_join(spark, path: str) -> dict:
    """The rejected lane, built from the SAME window_hashes expression."""
    from pyspark.sql import functions as F

    from sparklead.substrings import window_hashes

    df = spark.read.parquet(path)
    t0 = time.time()
    pos = df.select(
        F.col("doc_id").alias("_k"),
        F.posexplode(window_hashes("tokens", L, True)).alias("_pos", "_g"),
    )
    dup = (
        pos.groupBy("_g")
        .agg(F.count(F.lit(1)).alias("_c"), F.min(F.struct("_k", "_pos")).alias("_keep"))
        .filter(F.col("_c") >= 2)
    )
    marked = pos.join(dup, "_g").filter(
        ~((F.col("_k") == F.col("_keep._k")) & (F.col("_pos") == F.col("_keep._pos")))
    )
    agg = marked.agg(
        F.count(F.lit(1)).alias("n_dup"),
        F.expr("bit_xor(xxhash64(_k, _pos))").alias("sig"),
    ).first()
    out = {"wall_sec": round(time.time() - t0, 3), "n_dup": agg["n_dup"], "sig": agg["sig"]}
    out |= _ui_stage_stats(spark.sparkContext.uiWebUrl)
    return out


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    tmp = tempfile.mkdtemp(prefix="sparklead_slab_")
    try:
        s = _mk(f"substr-ab-gen-{n_docs}")
        _gen(s, n_docs, tmp + "/t")
        s.stop()
        s = _mk("substr-ab-window")
        win = _run_window(s, tmp + "/t")
        s.stop()
        s = _mk("substr-ab-aggjoin")
        agj = _run_agg_join(s, tmp + "/t")
        s.stop()
        print(
            json.dumps(
                {
                    "metric": "substring detection lane A/B (window vs agg+join)",
                    "n_docs": n_docs,
                    "l": L,
                    "window": win,
                    "agg_join": agj,
                    "values_identical": (win["n_dup"], win["sig"]) == (agj["n_dup"], agj["sig"]),
                    "window_speedup": round(agj["wall_sec"] / max(win["wall_sec"], 1e-9), 3),
                }
            )
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
