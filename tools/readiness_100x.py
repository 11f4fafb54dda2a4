"""Round-7 100x-readiness run (judge item #6): one order of magnitude past
the 2M-doc scale-up — neardup_text_dedup and ivf_topk at >= 20M rows on
this 128 GiB sandbox, recording wall, peak JVM heap / process RSS, and
total shuffle volume. Converts the "bucket caps + lineage truncation keep
memory flat" extrapolation into a measurement.

Usage: python tools/readiness_100x.py [n_docs] [n_vecs] [dim]
Prints one JSON line.
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


def _rest(ui: str, path: str):
    with urllib.request.urlopen(f"{ui}/api/v1/{path}", timeout=10) as r:
        return json.load(r)


def _mem_shuffle(spark) -> dict:
    """Peak JVM heap (REST executor peakMemoryMetrics when exposed) +
    python-side children RSS + total shuffle write across stages."""
    out: dict = {}
    try:
        ui = spark.sparkContext.uiWebUrl
        app = _rest(ui, "applications")[0]["id"]
        execs = _rest(ui, f"applications/{app}/executors")
        peaks = [
            e.get("peakMemoryMetrics", {}).get("JVMHeapMemory", 0) for e in execs
        ]
        out["peak_jvm_heap_bytes"] = max(peaks) if peaks else None
        stages = _rest(ui, f"applications/{app}/stages?status=complete")
        out["shuffle_write_bytes"] = sum(s.get("shuffleWriteBytes", 0) for s in stages)
        out["n_stages"] = len(stages)
    except Exception as e:  # REST variants differ across Spark versions
        out["rest_error"] = str(e)
    # peak RSS (VmHWM) of the LIVE JVM child — ru_maxrss(RUSAGE_CHILDREN)
    # only reflects already-reaped children, which the driver JVM is not
    try:
        me = os.getpid()
        peaks = []
        for pid in os.listdir("/proc"):
            if not pid.isdigit():
                continue
            try:
                with open(f"/proc/{pid}/stat") as f:
                    parts = f.read().split()
                if int(parts[3]) != me:
                    continue
                with open(f"/proc/{pid}/status") as f:
                    for line in f:
                        if line.startswith("VmHWM:"):
                            peaks.append(int(line.split()[1]) * 1024)
                            break
            except (OSError, ValueError, IndexError):
                continue
        out["peak_child_rss_bytes"] = max(peaks) if peaks else None
    except Exception:
        out["peak_child_rss_bytes"] = None
    return out


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
    n_vecs = int(sys.argv[2]) if len(sys.argv) > 2 else 20_000_000
    dim = int(sys.argv[3]) if len(sys.argv) > 3 else 16

    from pyspark.sql import functions as F

    from sparklead import get_spark
    from sparklead.synth import seeded_dup_docs

    spark = get_spark("readiness-100x", master="local[8]", shuffle_partitions=64)
    spark.sparkContext.setLogLevel("ERROR")
    result: dict = {"metric": "100x readiness run", "n_docs": n_docs, "n_vecs": n_vecs, "dim": dim}

    # ---------------- text near-dedup at n_docs
    from sparklead.dedup import neardup_text_dedup

    tmp_docs = tempfile.mkdtemp(prefix="sparklead_r100x_docs_")
    scratch = tempfile.mkdtemp(prefix="sparklead_r100x_scratch_")
    try:
        t0 = time.time()
        seeded_dup_docs(spark, n_docs, 64).write.mode("overwrite").parquet(tmp_docs)
        result["docs_write_sec"] = round(time.time() - t0, 1)
        docs = spark.read.parquet(tmp_docs)
        t0 = time.time()
        kept = neardup_text_dedup(docs, scratch_dir=scratch)
        result["neardup_kept"] = kept.count()
        result["neardup_sec"] = round(time.time() - t0, 1)
        result["neardup_docs_per_sec"] = round(n_docs / result["neardup_sec"], 1)
        getattr(kept, "sparklead_release_scratch", lambda: None)()
        spark.catalog.clearCache()
        result["after_neardup"] = _mem_shuffle(spark)
    finally:
        shutil.rmtree(tmp_docs, ignore_errors=True)
        shutil.rmtree(scratch, ignore_errors=True)

    # ---------------- IVF ANN at n_vecs
    from sparklead.similarity import ivf_topk

    tmp_vecs = tempfile.mkdtemp(prefix="sparklead_r100x_vecs_")
    try:
        t0 = time.time()
        vecs = spark.range(0, n_vecs, numPartitions=64).select(
            F.col("id").alias("vec_id"),
            F.transform(
                F.sequence(F.lit(1), F.lit(dim)),
                lambda i: (F.pmod(F.xxhash64("id", i), F.lit(1000)) / 500.0 - 1.0),
            ).alias("embedding"),
        )
        vecs.write.mode("overwrite").parquet(tmp_vecs)
        result["vecs_write_sec"] = round(time.time() - t0, 1)
        corpus = spark.read.parquet(tmp_vecs)
        q = corpus.filter(F.col("vec_id") < 32)
        t0 = time.time()
        topk = ivf_topk(q, corpus, k=5, n_centroids=64, n_probe=4)
        result["ivf_rows"] = topk.count()
        result["ivf_sec"] = round(time.time() - t0, 1)
        result["ivf_vecs_per_sec"] = round(n_vecs / result["ivf_sec"], 1)
        result["after_ivf"] = _mem_shuffle(spark)
    finally:
        shutil.rmtree(tmp_vecs, ignore_errors=True)

    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
