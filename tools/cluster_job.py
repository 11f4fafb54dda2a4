"""spark-submit job: run the north-rule pipeline against a standalone
cluster. Args: <input_parquet_dir> <out_dir>. Prints one JSON line."""

import json
import sys
import time

from pyspark.sql import SparkSession


def main() -> None:
    input_dir, out_dir = sys.argv[1], sys.argv[2]
    spark = SparkSession.builder.appName("sparklead-cluster-bench").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    from sparklead import synth
    from sparklead.pipeline import run_pipeline

    df = spark.read.parquet(input_dir)
    meta = synth.source_meta(spark)
    t0 = time.time()
    res = run_pipeline(df, meta, out_dir=out_dir, resume=False)
    wall = time.time() - t0
    execs = spark.sparkContext._jsc.sc().getExecutorMemoryStatus().size() - 1
    print(
        "CLUSTER_RESULT "
        + json.dumps(
            {
                "rows": res["rows"],
                "wall_sec": round(wall, 3),
                "seqs_per_sec": round(res["rows"] / wall, 1),
                "executors": execs,
                "default_parallelism": spark.sparkContext.defaultParallelism,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
