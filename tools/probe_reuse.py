"""Round-7 probe: does ReusedExchange dedup the candidates double-reference
inside jaccard_verify / neardup_text_dedup?  Prints the formatted plan's
Exchange/ReusedExchange census and times the one-call dedup."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F

spark = (
    SparkSession.builder.master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.driver.memory", "8g")
    .appName("probe_reuse")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

sf = os.environ.get("SF_DIR", "/root/testdata/sf0.01")
docs = spark.read.parquet(os.path.join(sf, "documents.parquet"))
# seed near-dups like the bench does
dupes = docs.filter(F.col("doc_id") % 7 == 0).withColumn("doc_id", F.col("doc_id") + 1_000_000)
corpus = docs.unionByName(dupes)

from sparklead.dedup import minhash_candidates, jaccard_verify, neardup_text_dedup

cands = minhash_candidates(corpus, "text", "doc_id", fast=True)
ver = jaccard_verify(corpus, cands, "text", "doc_id")
plan = ver._jdf.queryExecution().executedPlan().toString()
n_ex = plan.count("Exchange ")
n_reuse = plan.count("ReusedExchange")
print(f"verify plan: {n_ex} Exchange nodes, {n_reuse} ReusedExchange nodes")
# where do reuses sit?
for line in plan.splitlines():
    if "ReusedExchange" in line:
        print("  ", line.strip()[:160])

t0 = time.time()
out = neardup_text_dedup(corpus, "text", "doc_id")
n = out.count()
t1 = time.time()
print(f"one-call neardup_text_dedup: kept {n} rows in {t1-t0:.2f}s")
for rdd_id, rdd in spark.sparkContext._jsc.getPersistentRDDs().items():
    print("persisted:", rdd_id, rdd.name())
spark.stop()
