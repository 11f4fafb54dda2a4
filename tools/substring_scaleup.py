"""Exact-substring-dedup scale-up corroboration (round 8): run the full
window-gram -> global-occurrence window -> span merge -> scrub composition
at two corpus sizes on the same cores; record wall, docs/s, duplicate
mass, and session shuffle volume.

The operator's 100-TB claims: detection is ONE corpus scan into a single
gram-partitioned window exchange (~20 bytes/token on the fast lane), the
span merge aggregates only duplicate occurrences, and the scrub join-back
co-shuffles the payload once (n_tok_col keeps the base branch scalar).
Duplicate MASS is size-dependent in this corpus by design — the synth
hot templates mean ~18% of docs are verbatim re-posts, so dup fraction
should be roughly flat while absolute dup tokens grow linearly.

Usage: python tools/substring_scaleup.py [n_small] [n_large]
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

L = 8


def run_at(n_docs: int, cpus: int = 8) -> dict:
    from pyspark.sql import functions as F

    from sparklead import get_spark
    from sparklead.substrings import scrub_duplicate_substrings
    from sparklead.synth import pretokenized

    spark = get_spark(
        f"substr-scaleup-{n_docs}", master=f"local[{cpus}]", shuffle_partitions=cpus
    )
    spark.sparkContext.setLogLevel("ERROR")
    tmp_in = tempfile.mkdtemp(prefix="sparklead_sss_")
    try:
        pretokenized(spark, n_docs, cpus * 4).write.mode("overwrite").parquet(tmp_in)
        df = spark.read.parquet(tmp_in)
        out: dict = {"n_docs": n_docs, "l": L}

        t0 = time.time()
        scrubbed = scrub_duplicate_substrings(df, l=L, fast=True)
        agg = scrubbed.agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("n_dup_tokens").alias("dup_tokens"),
            F.sum("n_clean_tok").alias("clean_tokens"),
            F.sum(F.size("tokens")).alias("total_tokens"),
            F.expr("bit_xor(xxhash64(doc_id, clean_tokens))").alias("sig"),
        ).first()
        out["scrub_sec"] = round(time.time() - t0, 3)
        out["n_rows"] = agg["n_rows"]
        out["dup_tokens"] = agg["dup_tokens"]
        out["clean_tokens"] = agg["clean_tokens"]
        out["total_tokens"] = agg["total_tokens"]
        out["dup_frac"] = round(agg["dup_tokens"] / max(agg["total_tokens"], 1), 4)
        out["docs_per_sec"] = round(n_docs / out["scrub_sec"], 1)

        stats = _ui_stage_stats(spark.sparkContext.uiWebUrl)
        out["shuffle_write_bytes"] = stats["shuffle_write_bytes"]
        out["n_stages"] = stats["n_stages"]

        if n_docs <= 500_000:
            # cross-lane invariant (small size only — it re-runs detection):
            # the stats lane's merged-interval sum must equal the scrub
            # lane's realized position-filter count, doc for doc
            from sparklead.substrings import substring_dup_stats

            iv_sum = substring_dup_stats(df, l=L, fast=True, n_tok_col="n_tok").agg(
                F.sum("n_dup_tokens").alias("s")
            ).first()["s"]
            out["interval_vs_filter_ok"] = int(iv_sum) == int(agg["dup_tokens"])
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
        "metric": "substring-dedup scale-up (same cores, 2 corpus sizes)",
        "small": small,
        "large": large,
        "throughput_ratio": round(large["docs_per_sec"] / small["docs_per_sec"], 3),
        "interval_vs_filter_ok": small.get("interval_vs_filter_ok"),
        "shuffle_growth_vs_input_growth": round(
            (large["shuffle_write_bytes"] / max(small["shuffle_write_bytes"], 1)) / ratio,
            3,
        ),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
