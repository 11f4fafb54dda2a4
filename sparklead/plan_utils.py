"""Driver-plan hygiene for iterative DataFrame loops.

Iterative algorithms that rebuild a frame from itself each round grow the
LOGICAL plan with round count — linearly when the previous frame is
referenced once (the self-edge discipline, CLAUDE.md), 2^n when it is
referenced twice. Catalyst's driver-side cost grows super-linearly with
that plan even in the single-reference case: measured on the
component-propagation loop, 12 rounds took 68 s (analysis-dominated) and
16 rounds OOM'd an 8 g driver during plan handling, independent of data
size (BENCH.md "deep-loop robustness"). Deep loops therefore need
periodic LINEAGE TRUNCATION — the standard iterative-graph pattern
(GraphFrames checkpoints the same way), done here as a parquet roundtrip
instead of RDD checkpoints so caller-owned cache contracts
(getPersistentRDDs pins) and eviction-recompute safety both hold.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def lineage_roundtrip(df: DataFrame, scratch_dir: str, tag: str) -> DataFrame:
    """Write ``df`` to ``scratch_dir/tag`` and re-read it: the returned
    frame's plan is a fresh parquet scan, independent of how deep the
    input's lineage was.

    EAGER (the write runs now) and the scratch files must OUTLIVE every
    downstream consumer of the returned frame — an evicted cache partition
    recomputes from them. On a cluster pass a job-scratch URI (HDFS/S3);
    the local default callers use is a per-call temp dir."""
    path = f"{scratch_dir.rstrip('/')}/{tag}"
    df.write.mode("overwrite").parquet(path)
    return df.sparkSession.read.parquet(path)
