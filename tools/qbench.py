"""Per-query isolation bench for the round-9 optimization pass.

Times a SUBSET of bench.py's HEADLINE queries with the exact same
methodology (same session factory, same `_force` checksum-aggregate
evaluation, same warmups, median-of-N) so numbers compare 1:1 with the
frozen driver bench — without paying the full ~6 min suite per iteration.
Optionally dumps `.explain("formatted")` per query (the plans/r09
artifacts).

Usage:
  SPARK_GRAFT_SF_DIR=/root/testdata/sf1.0 python tools/qbench.py \
      --queries knn_cosine,repetition_filters --repeats 5 \
      --explain plans/r09 --suffix before
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", required=True, help="comma-separated HEADLINE names")
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--explain", default=None, help="dir to write <q>_<suffix>.txt plans")
    ap.add_argument("--suffix", default="before")
    args = ap.parse_args()

    import bench
    import __spark_entry__ as entrymod

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark, cpus = bench._mk_spark("sparklead-qbench")
    qs = entrymod.queries()
    names = [n.strip() for n in args.queries.split(",") if n.strip()]

    # same warmups as bench.py so the first timed query isn't charged startup
    bench._force(qs["seq_aggregates"](spark, sf_dir))
    import pandas as _pd  # noqa: F401

    spark.range(64, numPartitions=32).mapInPandas(lambda it: it, "id long").count()
    entrymod.prepare_bench_inputs(spark, sf_dir)

    times: dict[str, list[float]] = {}
    for name in names:
        fn = qs.get(name) or getattr(entrymod, f"_q_{name}")
        if args.explain:
            os.makedirs(args.explain, exist_ok=True)
            df = fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(os.path.join(args.explain, f"{name}_{args.suffix}.txt"), "w") as f:
                f.write(plan)
        if args.repeats <= 0:
            continue
        runs = []
        for _ in range(args.repeats):
            spark.sparkContext.setJobDescription(f"qbench:{name}")
            t0 = time.time()
            bench._force(fn(spark, sf_dir))
            runs.append(round(time.time() - t0, 3))
            if name in bench.CLEAR_CACHE_AFTER:
                spark.catalog.clearCache()
        times[name] = runs
        med = bench._median(runs)
        print(f"{name}: median={med} runs={runs}", flush=True)
    print(json.dumps({"sf_dir": sf_dir, "cpus": cpus, "times": times}))
    spark.stop()


if __name__ == "__main__":
    main()
