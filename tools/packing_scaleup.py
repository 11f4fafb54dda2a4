"""Sequence-packing scale-up corroboration (round 7): run the full
chunk -> greedy-assign -> join-back -> stats composition at two corpus
sizes on the same cores and record wall, docs/s, fill quality, and
session shuffle volume.

The operator's 100-TB claims: the pandas decision lane carries a NARROW
(bucket, keys, n_tok) projection — never the token arrays — and the salt
bounds the sequential unit, so per-doc cost falls as fixed costs amortize
and shuffle grows ~linearly with the corpus (the join-back co-shuffles
two chunk-grain sides on the same keys). Fill quality (mean fill ratio)
must hold across sizes: greedy packing quality depends on the doc-length
distribution, not the corpus size.

Usage: python tools/packing_scaleup.py [n_small] [n_large]
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

from scaleup_bench import _ui_stage_stats  # noqa: E402  (same tools/ dir)

MAX_TOKENS = 256
SALT = 64


def run_at(n_docs: int, cpus: int = 8) -> dict:
    from pyspark.sql import functions as F

    from sparklead import get_spark
    from sparklead.packing import pack_stats, pack_tokenized
    from sparklead.synth import pretokenized

    spark = get_spark(
        f"packing-scaleup-{n_docs}", master=f"local[{cpus}]", shuffle_partitions=cpus
    )
    spark.sparkContext.setLogLevel("ERROR")
    tmp_in = tempfile.mkdtemp(prefix="sparklead_pks_")
    try:
        pretokenized(spark, n_docs, cpus * 4).write.mode("overwrite").parquet(tmp_in)
        df = spark.read.parquet(tmp_in)
        out: dict = {"n_docs": n_docs, "max_tokens": MAX_TOKENS, "salt_buckets": SALT}

        t0 = time.time()
        packed = pack_tokenized(df, MAX_TOKENS, salt_buckets=SALT)
        stats = pack_stats(packed, MAX_TOKENS)
        agg = stats.agg(
            F.count(F.lit(1)).alias("n_packs"),
            F.round(F.avg("fill_ratio"), 4).alias("mean_fill"),
            F.max("n_tokens").alias("max_pack_tokens"),
            F.sum("n_tokens").alias("total_tokens"),
        ).first()
        out["pack_sec"] = round(time.time() - t0, 3)
        out["n_packs"] = agg["n_packs"]
        out["mean_fill"] = float(agg["mean_fill"])
        out["max_pack_tokens"] = agg["max_pack_tokens"]
        out["total_tokens"] = agg["total_tokens"]
        out["docs_per_sec"] = round(n_docs / out["pack_sec"], 1)

        stats2 = _ui_stage_stats(spark.sparkContext.uiWebUrl)
        out["shuffle_write_bytes"] = stats2["shuffle_write_bytes"]
        out["n_stages"] = stats2["n_stages"]
        return out
    finally:
        shutil.rmtree(tmp_in, ignore_errors=True)
        spark.stop()


def main() -> None:
    n_small = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    n_large = int(sys.argv[2]) if len(sys.argv) > 2 else 2_000_000
    small = run_at(n_small)
    large = run_at(n_large)
    ratio = n_large / n_small
    out = {
        "metric": "sequence-packing scale-up (same cores, 2 corpus sizes)",
        "small": small,
        "large": large,
        "throughput_ratio": round(large["docs_per_sec"] / small["docs_per_sec"], 3),
        "overfull_packs": int(large["max_pack_tokens"] > MAX_TOKENS)
        + int(small["max_pack_tokens"] > MAX_TOKENS),
        "shuffle_growth_vs_input_growth": round(
            (large["shuffle_write_bytes"] / max(small["shuffle_write_bytes"], 1)) / ratio, 3
        ),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
