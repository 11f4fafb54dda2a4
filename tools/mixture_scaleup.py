"""Mixture-sampling scale-up corroboration (round 7): run the fast-lane
``sample_to_token_budget`` at two corpus sizes (each source budgeted to
25% of its tokens) and record wall, docs/s, kept-token utilization, and
session shuffle volume.

The operator's 100-TB claim is a shape one (mixture.py): the decision is
ONE ranged exchange of a three-scalar-column narrow projection (the
two-phase prefix sum — no per-source single-task window, so the synth
corpus's exponential source skew cannot serialize it), collapsed to a
source-sized cutoff table, applied back as a broadcast filter with ZERO
payload shuffle (plan-pinned in tests/test_plans.py). If that holds,
per-doc cost falls as fixed costs amortize (eager cutoff collect, plan
compile), shuffle grows linearly with the corpus, and kept tokens sit
just under the 25% budget at both sizes. This measures it.

Usage: python tools/mixture_scaleup.py [n_small] [n_large]
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

BUDGET_FRACTION = 0.25


def run_at(n_docs: int, cpus: int = 8) -> dict:
    from pyspark.sql import functions as F

    from sparklead import get_spark
    from sparklead.mixture import sample_to_token_budget
    from sparklead.synth import pretokenized

    spark = get_spark(
        f"mixture-scaleup-{n_docs}", master=f"local[{cpus}]", shuffle_partitions=cpus
    )
    spark.sparkContext.setLogLevel("ERROR")
    tmp_in = tempfile.mkdtemp(prefix="sparklead_mxs_")
    try:
        pretokenized(spark, n_docs, partitions=cpus * 4).write.mode(
            "overwrite"
        ).parquet(tmp_in)
        docs = spark.read.parquet(tmp_in)
        # budgets are the CALLER's contract input — derived untimed here
        totals = docs.groupBy("source").agg(F.sum("n_tok").alias("t")).collect()
        budgets = {r["source"]: int(r["t"] * BUDGET_FRACTION) for r in totals}
        budget_total = sum(budgets.values())

        t0 = time.time()
        stats_row = (
            sample_to_token_budget(docs, budgets)
            .agg(
                F.count("*").alias("kept_docs"),
                F.sum("n_tok").alias("kept_tokens"),
            )
            .collect()[0]
        )
        wall = time.time() - t0
        out = {
            "n_docs": n_docs,
            "wall_sec": round(wall, 3),
            "docs_per_sec": round(n_docs / wall, 1),
            "kept_docs": stats_row["kept_docs"],
            "kept_tokens": stats_row["kept_tokens"],
            "budget_tokens": budget_total,
            # prefix sampling undershoots by < 1 doc per source
            "budget_utilization": round(stats_row["kept_tokens"] / budget_total, 4),
        }
        ui = _ui_stage_stats(spark.sparkContext.uiWebUrl)
        out["shuffle_write_bytes"] = ui["shuffle_write_bytes"]
        out["n_stages"] = ui["n_stages"]
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
        "metric": "mixture-sampling scale-up (same cores, 25% per-source token budgets)",
        "small": small,
        "large": large,
        "throughput_ratio": round(large["docs_per_sec"] / small["docs_per_sec"], 3),
        "kept_docs_ratio": round(large["kept_docs"] / max(small["kept_docs"], 1), 3),
        "shuffle_growth_vs_input_growth": round(
            (large["shuffle_write_bytes"] / max(small["shuffle_write_bytes"], 1))
            / ratio,
            3,
        ),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
