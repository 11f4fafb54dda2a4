"""A/B the `_fan` exchange on compute-heavy gate queries (VERDICT r3 #1).

Runs selected queries at sf0.1 on local[$SPARK_GRAFT_CPUS] in BOTH variants
(with the input fanned to all cores / scanned as-is), median-of-N each, and
prints one JSON line per query. Decides whether `_fan`'s exchange pays for
itself on this input/core-count — the evidence PLANS.md's decision table
records.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

# the canonical bench helpers — A/B timings must force evaluation and
# aggregate exactly like the headline bench or the numbers aren't comparable
from bench import _force, _median  # noqa: E402


def main() -> None:
    from sparklead import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS") or (os.cpu_count() or 8))
    reps = int(os.environ.get("REPS", "5"))
    spark = get_spark("fan-ab", master=f"local[{cpus}]", shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    def read(name):
        return spark.read.parquet(f"{sf_dir}/{name}.parquet")

    def fan(df):
        return df.repartition(spark.sparkContext.defaultParallelism)

    def knn(emb):
        from sparklead.similarity import brute_force_topk

        q = emb.filter(F.col("vec_id") < 10)
        return brute_force_topk(q, emb, k=3).select("query_id", "neighbor_id", "rank")

    def minhash(docs):
        from sparklead.dedup import minhash_signature, word_shingles

        d = docs.filter(F.col("doc_id") < 100)
        sig = minhash_signature(word_shingles("text", 3), 4)
        return d.select("doc_id", sig.getItem(0).alias("mh0"), sig.getItem(3).alias("mh3"))

    def decontam(docs):
        # the A/B prepped frame is the CORPUS side (the side _fan targets);
        # the eval set always derives from a plain read — its grams collapse
        # behind their own distinct exchange either way. ONE fixture
        # definition, shared with the gated entry (round-7 review fix).
        import __spark_entry__ as entrymod
        from sparklead.decontam import ngram_containment

        ev = entrymod._decontam_eval_set(read("documents"))
        return ngram_containment(docs, ev, ngram_n=8, fast=True)

    cases = {
        "knn_cosine": ("embeddings", knn),
        "minhash_signature": ("documents", minhash),
        "decontamination_fast": ("documents", decontam),
    }
    # warmup
    _force(knn(read("embeddings")))
    for name, (table, qfn) in cases.items():
        out = {"query": name, "cpus": cpus, "reps": reps}
        for variant, prep in (("fanned", fan), ("plain", lambda d: d)):
            runs = []
            for _ in range(reps):
                t0 = time.time()
                _force(qfn(prep(read(table))))
                runs.append(round(time.time() - t0, 3))
            out[variant] = {"median": round(_median(runs), 3), "runs": runs}
        print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
