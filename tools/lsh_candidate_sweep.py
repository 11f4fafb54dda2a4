"""LSH candidate-volume scaling sweep (round 8, verdict #8): quantify how
``minhash_candidates``' candidate-pair volume grows with corpus size at
FIXED band parameters vs parameters SCALED with the corpus, so the 100x
parameter recipe is measured, not folklore.

Theory being tested (the standard banded-LSH accounting): expected FALSE
candidates ≈ C(n,2) · b · s^r, where s is the typical random-pair shingle
Jaccard, b = bands, r = rows per band — quadratic in n at fixed (b, r).
True-dup candidates are a corpus property (a ~fixed fraction of n in the
seeded corpus) and grow linearly. So at fixed parameters the per-doc
candidate rate eventually grows with n, and the fix is to grow r by
~log(growth)/log(1/s) rows per 10x corpus: s^r shrinks geometrically and
one extra row per ~1/s-fold keeps C(n,2)·b·s^r flat. The sweep runs both
parameter schedules on the seeded-dup corpus and records candidate
counts, per-doc rates, and seeded-near-dup recall (r also lowers recall
at the threshold similarity: P(candidate) ≈ 1-(1-J^r)^b — the recipe must
keep that near 1 for J ≥ the verify threshold while crushing it for
random pairs).

Usage: python tools/lsh_candidate_sweep.py [sizes ...]   (default 50k 200k 800k)
Prints one JSON line per (size, schedule) plus a summary line.
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

# fixed schedule: round-5's production defaults. scaled schedule: +2 rows
# per band per 4x corpus (s ~= random-pair shingle Jaccard is well under
# 1/4 here, so +2 rows per 4x over-corrects — the point is the direction
# and the measured curve, the docstring rule interpolates)
FIXED = {"num_hashes": 16, "bands": 4}


def scaled_params(n_docs: int, base: int = 50_000) -> dict:
    import math

    extra = 2 * max(0, round(math.log(n_docs / base, 4)))
    return {"num_hashes": 16 + 4 * extra // 2, "bands": 4}


def run_at(n_docs: int, num_hashes: int, bands: int, cpus: int = 8) -> dict:
    from pyspark.sql import functions as F

    from sparklead import get_spark
    from sparklead.dedup import minhash_candidates
    from sparklead.synth import seeded_dup_docs

    spark = get_spark(
        f"lsh-sweep-{n_docs}-{num_hashes}", master=f"local[{cpus}]",
        shuffle_partitions=cpus,
    )
    spark.sparkContext.setLogLevel("ERROR")
    tmp_in = tempfile.mkdtemp(prefix="sparklead_lshs_")
    try:
        seeded_dup_docs(spark, n_docs, partitions=cpus * 4).write.mode(
            "overwrite"
        ).parquet(tmp_in)
        docs = spark.read.parquet(tmp_in)
        t0 = time.time()
        cands = minhash_candidates(
            docs, num_hashes=num_hashes, bands=bands, fast=True
        )
        # seeded near-dups: doc_id%70==0 (and not %50==0) pairs with doc_id-2;
        # exact dups (%50==0 copies id-1) collide in every band by identity.
        # Count both totals and the seeded-pair recall in one pass.
        row = cands.agg(
            F.count(F.lit(1)).alias("n_cands"),
            F.sum(
                (
                    (F.col("b_id") - F.col("a_id") == 2)
                    & (F.col("b_id") % 70 == 0)
                    & (F.col("b_id") % 50 != 0)
                ).cast("int")
            ).alias("near_hits"),
        ).collect()[0]
        wall = time.time() - t0
        n_near = docs.filter(
            (F.col("doc_id") % 70 == 0)
            & (F.col("doc_id") % 50 != 0)
            & (F.col("doc_id") >= 2)
        ).count()
        return {
            "n_docs": n_docs,
            "num_hashes": num_hashes,
            "bands": bands,
            "rows_per_band": num_hashes // bands,
            "wall_sec": round(wall, 3),
            "n_candidates": row["n_cands"],
            "cands_per_doc": round(row["n_cands"] / n_docs, 4),
            "near_dup_recall": round(row["near_hits"] / max(n_near, 1), 4),
        }
    finally:
        shutil.rmtree(tmp_in, ignore_errors=True)
        spark.stop()


def main() -> None:
    sizes = [int(a) for a in sys.argv[1:]] or [50_000, 200_000, 800_000]
    results = {"fixed": [], "scaled": []}
    for n in sizes:
        r = run_at(n, FIXED["num_hashes"], FIXED["bands"])
        results["fixed"].append(r)
        print(json.dumps({"schedule": "fixed", **r}))
        sp = scaled_params(n, base=sizes[0])
        if sp == FIXED:
            results["scaled"].append(r)
            print(json.dumps({"schedule": "scaled", **r, "note": "== fixed"}))
        else:
            r2 = run_at(n, sp["num_hashes"], sp["bands"])
            results["scaled"].append(r2)
            print(json.dumps({"schedule": "scaled", **r2}))
    f0, fN = results["fixed"][0], results["fixed"][-1]
    s0, sN = results["scaled"][0], results["scaled"][-1]
    growth = sizes[-1] / sizes[0]
    print(json.dumps({
        "metric": "lsh candidate-volume scaling",
        "input_growth": growth,
        "fixed_candidate_growth": round(fN["n_candidates"] / max(f0["n_candidates"], 1), 3),
        "scaled_candidate_growth": round(sN["n_candidates"] / max(s0["n_candidates"], 1), 3),
        "fixed_per_doc_ratio": round(fN["cands_per_doc"] / max(f0["cands_per_doc"], 1e-9), 3),
        "scaled_per_doc_ratio": round(sN["cands_per_doc"] / max(s0["cands_per_doc"], 1e-9), 3),
        "recall_fixed_large": fN["near_dup_recall"],
        "recall_scaled_large": sN["near_dup_recall"],
    }))


if __name__ == "__main__":
    main()
