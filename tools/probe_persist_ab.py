"""Round-7 A/B: persist strategy inside the neardup_text_dedup composition.

Variants (same composition, inlined):
  none        — round-6 behavior, nothing persisted (baseline)
  lazy_both   — persist cands+verified lazily (fill during components run)
  eager_cands — persist+count cands first, then persist verified lazily
  eager_both  — persist+count both before components

Each timed REPEATS times interleaved; prints per-variant medians.
"""
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F

spark = (
    SparkSession.builder.master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.driver.memory", "8g")
    .appName("probe_persist_ab")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

sf = os.environ.get("SF_DIR", "/root/testdata/sf0.01")
docs = spark.read.parquet(os.path.join(sf, "documents.parquet"))
dupes = docs.filter(F.col("doc_id") % 7 == 0).withColumn("doc_id", F.col("doc_id") + 1_000_000)
corpus = docs.unionByName(dupes)

from sparklead.dedup import (
    dedup_by_components,
    exact_dedup,
    jaccard_verify,
    minhash_candidates,
    neardup_components,
)


def run(variant: str) -> float:
    t0 = time.time()
    exact_keep = exact_dedup(corpus, "text", "doc_id")
    cands = minhash_candidates(exact_keep, "text", "doc_id", fast=True)
    if variant in ("lazy_both", "eager_cands", "eager_both"):
        cands = cands.persist()
    if variant in ("eager_cands", "eager_both"):
        cands.count()
    verified = jaccard_verify(exact_keep, cands, "text", "doc_id")
    if variant != "none":
        verified = verified.persist()
    if variant == "eager_both":
        verified.count()
    comps = neardup_components(verified)
    out = dedup_by_components(exact_keep, verified, "doc_id", components=comps)
    n = out.count()
    wall = time.time() - t0
    comps.unpersist()
    if variant != "none":
        verified.unpersist()
        cands.unpersist()
    assert n == 476, n
    return wall


VARIANTS = ["none", "lazy_both", "eager_cands", "eager_both"]
REPEATS = int(os.environ.get("REPEATS", "3"))
times: dict[str, list[float]] = {v: [] for v in VARIANTS}
run("none")  # warm the JVM/scan caches once, untimed
for r in range(REPEATS):
    for v in VARIANTS:
        times[v].append(run(v))
for v in VARIANTS:
    print(f"{v:12s} median {statistics.median(times[v]):6.2f}s  runs {[f'{t:.2f}' for t in times[v]]}")
spark.stop()
