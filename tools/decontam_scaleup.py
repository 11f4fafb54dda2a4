"""Decontamination scale-up corroboration (round 7): run the fast-lane
``decontaminate`` verb at two corpus sizes against the SAME small eval set
and record wall, docs/s, dropped-doc counts, and session shuffle volume.

The operator's 100-TB claim is a shape one: ONE corpus scan (distinct-gram
arrays -> explode -> equi-join on the 8-byte gram hash -> per-doc
count-aggregate with map-side partials), with the eval-gram set small
enough to broadcast (AQE decides from its TRUE post-distinct size —
hint-free). If that holds, per-doc cost falls as fixed costs amortize and
the dropped count tracks the seeded leak fraction exactly. This measures
it instead of arguing it.

Eval-set construction mirrors the gate fixture (__spark_entry__.py
q:decontamination): a fixed-size eval set whose docs leak into the corpus
as verbatim copies (containment 1.0) and half-prefix quotes (partial
containment), seeded at a fixed per-corpus-doc rate so the contaminated
count scales linearly with corpus size.

Usage: python tools/decontam_scaleup.py [n_small] [n_large]
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

N_EVAL = 2_000          # eval docs (benchmarks are MBs; corpora are TBs)
VERBATIM_EVERY = 500    # every 500th corpus doc is a verbatim eval doc
PREFIX_EVERY = 700      # every 700th gets an eval doc half-prefix


def synth(spark, n_docs: int, partitions: int):
    """Corpus with seeded eval leakage + the eval set itself, both built
    from spark.range (deterministic, no external data)."""
    from pyspark.sql import functions as F

    ev = spark.range(N_EVAL).select(
        F.concat(
            F.lit("eval question "),
            F.col("id").cast("string"),
            F.lit(" asks about topic "),
            (F.col("id") % 37).cast("string"),
            F.lit(" with answer tokens alpha beta gamma delta epsilon zeta eta theta"),
        ).alias("text")
    )
    base = spark.range(n_docs).repartition(partitions).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("corpus document "),
            F.col("id").cast("string"),
            F.lit(" body token "),
            (F.col("id") % 9973).cast("string"),
            F.lit(" filler one two three four five six seven eight nine ten "),
            (F.col("id") % 613).cast("string"),
        ).alias("text"),
    )
    ev_idx = (F.col("doc_id") / VERBATIM_EVERY).cast("long") % N_EVAL
    ev_texts = F.concat(
        F.lit("eval question "),
        ev_idx.cast("string"),
        F.lit(" asks about topic "),
        (ev_idx % 37).cast("string"),
        F.lit(" with answer tokens alpha beta gamma delta epsilon zeta eta theta"),
    )
    corpus = base.withColumn(
        "text",
        F.when(F.col("doc_id") % VERBATIM_EVERY == 0, ev_texts)
        .when(
            F.col("doc_id") % PREFIX_EVERY == 0,
            # partial quote: the eval doc's first 16 words + original body
            # (~9 of the doc's ~27 8-grams hit -> containment ~0.33, above
            # the probe threshold 0.25 but far from verbatim 1.0)
            F.concat(
                F.concat_ws(" ", F.slice(F.split(ev_texts, " "), 1, 16)),
                F.lit(" "),
                F.col("text"),
            ),
        )
        .otherwise(F.col("text")),
    )
    return corpus, ev


def run_at(n_docs: int, cpus: int = 8) -> dict:
    from sparklead import get_spark
    from sparklead.decontam import contaminated_docs, decontaminate

    spark = get_spark(
        f"decontam-scaleup-{n_docs}", master=f"local[{cpus}]", shuffle_partitions=cpus
    )
    spark.sparkContext.setLogLevel("ERROR")
    tmp_in = tempfile.mkdtemp(prefix="sparklead_dcs_")
    try:
        corpus, ev = synth(spark, n_docs, cpus * 4)
        corpus.write.mode("overwrite").parquet(os.path.join(tmp_in, "corpus"))
        ev.write.mode("overwrite").parquet(os.path.join(tmp_in, "eval"))
        corpus = spark.read.parquet(os.path.join(tmp_in, "corpus"))
        ev = spark.read.parquet(os.path.join(tmp_in, "eval"))

        out: dict = {"n_docs": n_docs, "n_eval": N_EVAL}
        t0 = time.time()
        out["kept"] = decontaminate(corpus, ev, ngram_n=8, threshold=0.25, fast=True).count()
        out["decontaminate_sec"] = round(time.time() - t0, 3)
        out["dropped"] = n_docs - out["kept"]

        t0 = time.time()
        out["contaminated"] = contaminated_docs(
            corpus, ev, ngram_n=8, threshold=0.25, fast=True
        ).count()
        out["contaminated_docs_sec"] = round(time.time() - t0, 3)

        for k in ("decontaminate", "contaminated_docs"):
            out[f"{k}_docs_per_sec"] = round(n_docs / out[f"{k}_sec"], 1)
        stats = _ui_stage_stats(spark.sparkContext.uiWebUrl)
        out["shuffle_write_bytes"] = stats["shuffle_write_bytes"]
        out["n_stages"] = stats["n_stages"]
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
        "metric": "decontamination scale-up (same cores, fixed eval set, 2 corpus sizes)",
        "small": small,
        "large": large,
        "throughput_ratio": {
            k: round(large[f"{k}_docs_per_sec"] / small[f"{k}_docs_per_sec"], 3)
            for k in ("decontaminate", "contaminated_docs")
        },
        "dropped_ratio": round(large["dropped"] / max(small["dropped"], 1), 3),
        "shuffle_growth_vs_input_growth": round(
            (large["shuffle_write_bytes"] / max(small["shuffle_write_bytes"], 1)) / ratio, 3
        ),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
