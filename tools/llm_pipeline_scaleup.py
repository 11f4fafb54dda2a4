"""Composed LLM-pipeline scale-up (round 8, verdict #4): run the FULL
dedup -> decontaminate -> tokenize -> mixture-sample -> pack routed job
(sparklead.llm_pipeline.run_llm_pipeline) at two corpus sizes and record
wall, docs/s, per-stage sink rows, session shuffle volume, and stage
count.

What the per-op benches can't see, this measures: the composition's
stage-materialization cost (five parquet sinks + manifests), whether the
expensive dedup subgraph stays evaluated exactly once behind its sink
boundary, and whether the whole job's shuffle grows linearly. Pass/fail
intuition: per-doc cost should FALL from small to large (fixed costs —
plan compile, eager cutoff collect, manifest I/O — amortize), shuffle
should grow ~linearly, stage count should be size-invariant.

Usage: python tools/llm_pipeline_scaleup.py [n_small] [n_large]
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


def run_at(n_docs: int, cpus: int = 8) -> dict:
    from pyspark.sql import functions as F

    from sparklead import get_spark
    from sparklead.llm_pipeline import run_llm_pipeline
    from sparklead.synth import seeded_dup_docs

    spark = get_spark(
        f"llm-pipeline-scaleup-{n_docs}", master=f"local[{cpus}]",
        shuffle_partitions=cpus,
    )
    spark.sparkContext.setLogLevel("ERROR")
    tmp_in = tempfile.mkdtemp(prefix="sparklead_lps_in_")
    tmp_out = tempfile.mkdtemp(prefix="sparklead_lps_out_")
    try:
        seeded_dup_docs(spark, n_docs, partitions=cpus * 4).withColumn(
            "source", F.concat(F.lit("src"), F.pmod(F.xxhash64("doc_id"), F.lit(8)))
        ).write.mode("overwrite").parquet(tmp_in)
        docs = spark.read.parquet(tmp_in)
        eval_set = docs.filter(F.col("doc_id") % 97 == 0).select("text")

        t0 = time.time()
        res = run_llm_pipeline(
            docs, eval_set, tmp_out,
            budget_frac=0.5, max_tokens=512, resume=False,
        )
        stats = res["stats"].agg(
            F.count(F.lit(1)).alias("n_packs"),
            F.sum("n_tokens").alias("packed_tokens"),
            F.sum(F.when(F.col("n_tokens") > 512, 1).otherwise(0)).alias("overfull"),
        ).collect()[0]
        wall = time.time() - t0
        out = {
            "n_docs": n_docs,
            "wall_sec": round(wall, 3),
            "docs_per_sec": round(n_docs / wall, 1),
            "sink_rows": {k: m["rows"] for k, m in res["manifests"].items()},
            "n_packs": stats["n_packs"],
            "packed_tokens": stats["packed_tokens"],
            "overfull_packs": stats["overfull"],
        }
        ui = _ui_stage_stats(spark.sparkContext.uiWebUrl)
        out["shuffle_write_bytes"] = ui["shuffle_write_bytes"]
        out["n_stages"] = ui["n_stages"]
        return out
    finally:
        shutil.rmtree(tmp_in, ignore_errors=True)
        shutil.rmtree(tmp_out, ignore_errors=True)
        spark.stop()


def main() -> None:
    n_small = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    n_large = int(sys.argv[2]) if len(sys.argv) > 2 else 2_000_000
    small = run_at(n_small)
    large = run_at(n_large)
    growth = n_large / n_small
    print(json.dumps({
        "metric": "composed llm-pipeline scale-up",
        "small": small,
        "large": large,
        "speedup_per_doc": round(
            large["docs_per_sec"] / small["docs_per_sec"], 3
        ),
        "shuffle_growth_x_of_input_growth": round(
            (large["shuffle_write_bytes"] / max(small["shuffle_write_bytes"], 1))
            / growth,
            3,
        ),
    }))


if __name__ == "__main__":
    main()
