"""Incremental streaming-Drain benchmark (round-6, VERDICT r5 item #9).

The incremental template-mining path (`streaming.stream_drain_templates` —
the drain3 periodic-state-snapshot analogue, ref enhancers/eventlog.py:
168-199) is correctness-tested (multi-batch, resume-with-growth, replay:
tests/test_round4.py::test_stream_drain_incremental_snapshots) but was
never TIMED. This measures, at 2-3 batch sizes, what incrementality buys:

- **incremental**: one streaming run over B parquet batch-files with
  maxFilesPerTrigger=1 — each micro-batch runs DrainMiner.update (load
  previous snapshot -> distributed partials -> tree-merge fold -> save
  versioned snapshot). Cost model: each batch pays mining for ITS lines
  plus a template-table-sized snapshot load/save (bounded by max_clusters,
  independent of corpus size) -> total O(B x batch).
- **batch refit**: what a non-incremental pipeline pays to keep templates
  current after each arrival — a fresh DrainMiner.fit over the FULL prefix
  (batches 1..i) for every i -> O(B^2/2 x batch) mining, quadratic in the
  number of arrivals. The gap should WIDEN with B and with batch size.

Also cross-checks the incremental miner's final template set against a
single full-corpus batch fit (the tested invariant) and reports the
per-version template-count growth path from the manifest.

Usage: python tools/stream_drain_bench.py [batch_lines ...]  (default
2000 4000 8000; each size runs B=4 batches). Prints one JSON line;
results recorded in BENCH.md 'Round-6 measurements'.
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

N_BATCHES = 4
CPUS = 8


def _tokens(spark, total: int):
    """Tokenized corpus (same recipe as __spark_entry__._mined_corpus)."""
    from sparklead import synth
    from sparklead.enhancers import eventlog as E
    from sparklead.sources.hdfs import load_hdfs_events

    ev = load_hdfs_events(synth.raw_log_corpus(spark, total))
    return E.words(E.normalize(ev), "e_message_normalized").select("seq_id", "e_words")


def run_at(batch_lines: int) -> dict:
    from pyspark.sql import functions as F

    from sparklead import get_spark
    from sparklead.mining.drain import DrainMiner
    from sparklead.streaming import load_latest_drain_templates, stream_drain_templates

    spark = get_spark(
        f"stream-drain-bench-{batch_lines}", master=f"local[{CPUS}]", shuffle_partitions=CPUS
    )
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="sparklead_sdb_")
    inp = os.path.join(work, "in")
    try:
        # deterministic hash-split of ONE corpus into B same-distribution
        # batch files (subdir per batch so the refit loop can address
        # prefixes; the stream reads the parent via glob)
        # salt with seq_id: masked token streams are heavily duplicated, so
        # hashing the tokens alone would send every copy of a template to ONE
        # batch — seq_id spreads them so batches SHARE the template
        # distribution (each arrival mostly updates counts, some new)
        tok = _tokens(spark, batch_lines * N_BATCHES).withColumn(
            "_b",
            F.pmod(F.xxhash64("seq_id", F.array_join("e_words", " "), F.lit(7)), F.lit(N_BATCHES)),
        )
        for i in range(N_BATCHES):
            tok.filter(F.col("_b") == i).drop("_b").coalesce(1).write.parquet(
                os.path.join(inp, f"b{i}")
            )
        out: dict = {"batch_lines": batch_lines, "n_batches": N_BATCHES}

        tdir = os.path.join(work, "templates")
        t0 = time.time()
        stream_drain_templates(
            spark, os.path.join(inp, "*"), tdir, max_files_per_trigger=1
        ).awaitTermination(600)
        out["incremental_total_sec"] = round(time.time() - t0, 3)

        with open(os.path.join(tdir, "drain_manifest.jsonl")) as f:
            versions = [json.loads(ln) for ln in f]
        out["incremental_batches_run"] = len(versions)
        out["n_templates_path"] = [v["n_templates"] for v in versions]

        # per-arrival batch refit over growing prefixes; per-arrival times
        # recorded so the marginal-cost SLOPE is visible (refit's per-arrival
        # cost grows with the accumulated corpus; incremental's is flat)
        refit_times = []
        for i in range(N_BATCHES):
            t0 = time.time()
            prefix = spark.read.parquet(*[os.path.join(inp, f"b{j}") for j in range(i + 1)])
            DrainMiner().fit(prefix, "e_words")
            refit_times.append(round(time.time() - t0, 3))
        out["batch_refit_per_arrival_sec"] = refit_times
        out["batch_refit_total_sec"] = round(sum(refit_times), 3)
        out["incremental_per_arrival_sec"] = round(
            out["incremental_total_sec"] / N_BATCHES, 3
        )
        out["speedup"] = round(out["batch_refit_total_sec"] / out["incremental_total_sec"], 2)

        inc = load_latest_drain_templates(spark, tdir)
        full = DrainMiner().fit(spark.read.parquet(os.path.join(inp, "*")), "e_words")
        out["lines_counted_once"] = sum(c for _, c in inc.templates) == batch_lines * N_BATCHES
        out["templates_match_full_fit"] = {" ".join(t) for t, _ in inc.templates} == {
            " ".join(t) for t, _ in full.templates
        }
        out["n_templates_final"] = len(inc.templates)
        return out
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


def main() -> None:
    sizes = [int(a) for a in sys.argv[1:]] or [2000, 4000, 8000]
    runs = [run_at(s) for s in sizes]
    print(
        json.dumps(
            {"metric": "incremental streaming Drain vs per-arrival batch refit", "runs": runs}
        )
    )


if __name__ == "__main__":
    main()
