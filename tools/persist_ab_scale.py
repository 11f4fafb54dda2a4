"""Round-7: persist-vs-lazy A/B for the neardup_text_dedup composition at a
REALISTIC corpus size (the toy-scale A/B in probe_persist_ab.py showed
persist LOSING 2x at 571 docs — fixed materialization overheads dominate
there; the round-5 3x-re-evaluation cost was measured at 200k-2M docs).

Usage: python tools/persist_ab_scale.py [n_docs] [repeats]
"""
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 3

import shutil
import tempfile

from sparklead import get_spark
from sparklead.synth import seeded_dup_docs

spark = get_spark("persist-ab-scale", master="local[8]", shuffle_partitions=8)
spark.sparkContext.setLogLevel("ERROR")
tmp_in = tempfile.mkdtemp(prefix="sparklead_pab_")
seeded_dup_docs(spark, n_docs, 32).write.mode("overwrite").parquet(tmp_in)
docs = spark.read.parquet(tmp_in)

from sparklead.dedup import (
    dedup_by_components,
    exact_dedup,
    jaccard_verify,
    minhash_candidates,
    neardup_components,
)


def run(variant: str) -> float:
    t0 = time.time()
    exact_keep = exact_dedup(docs, "text", "doc_id")
    cands = minhash_candidates(exact_keep, "text", "doc_id", fast=True)
    if variant == "persist":
        cands = cands.persist()
    verified = jaccard_verify(exact_keep, cands, "text", "doc_id")
    if variant == "persist":
        verified = verified.persist()
    comps = neardup_components(verified)
    out = dedup_by_components(exact_keep, verified, "doc_id", components=comps)
    n = out.count()
    wall = time.time() - t0
    comps.unpersist()
    if variant == "persist":
        verified.unpersist()
        cands.unpersist()
    return wall, n


VARIANTS = ["none", "persist"]
times = {v: [] for v in VARIANTS}
kept = None
run("none")  # warmup
for r in range(repeats):
    for v in VARIANTS:
        w, n = run(v)
        times[v].append(w)
        if kept is None:
            kept = n
        assert n == kept, (v, n, kept)
print(f"n_docs={n_docs} kept={kept}")
for v in VARIANTS:
    print(f"{v:8s} median {statistics.median(times[v]):7.2f}s  runs {[f'{t:.2f}' for t in times[v]]}")
shutil.rmtree(tmp_in, ignore_errors=True)
spark.stop()
