"""BPE trainer scale evidence: train n_merges rules over the 200k-doc
north-rule corpus (and optionally a larger size), recording per-round
wall times — the signal that lineage truncation keeps iterative rounds
FLAT (the deep-loop rule) — plus the one-pass cost of applying the whole
learned table.

Usage: python tools/bpe_scaleup.py [n_docs] [n_merges]
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

from scaleup_bench import _ui_stage_stats  # noqa: E402


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    n_merges = int(sys.argv[2]) if len(sys.argv) > 2 else 8

    from pyspark.sql import functions as F

    from sparklead import get_spark
    from sparklead.bpe import apply_merges, bpe_pair_counts
    from sparklead.synth import pretokenized
    from sparklead.plan_utils import LineageTruncator

    spark = get_spark(f"bpe-scaleup-{n_docs}", master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    tmp = tempfile.mkdtemp(prefix="sparklead_bpes_")
    try:
        pretokenized(spark, n_docs, 32).write.mode("overwrite").parquet(tmp + "/t")
        df = spark.read.parquet(tmp + "/t").select("doc_id", "tokens")

        # inline the trainer loop so each round is individually timed
        # (library: sparklead.bpe.bpe_train — same recurrence, same
        # truncation cadence)
        trunc = LineageTruncator(prefix="sparklead_bpes_rt")
        merges: list[tuple[int, int, int]] = []
        rounds = []
        cur = df
        t_all = time.time()
        for i in range(n_merges):
            t0 = time.time()
            top = (
                bpe_pair_counts(cur)
                .orderBy(F.col("cnt").desc(), F.col("a").asc(), F.col("b").asc())
                .limit(1)
                .collect()
            )
            if not top or top[0]["cnt"] < 2:
                break
            a, b = int(top[0]["a"]), int(top[0]["b"])
            new_id = 1_000_000 + i
            merges.append((a, b, new_id))
            cur = apply_merges(cur, [(a, b, new_id)])
            if (i + 1) % 4 == 0:
                cur = trunc.roundtrip(cur)
            rounds.append(
                {"round": i, "pair": [a, b], "cnt": top[0]["cnt"], "wall_sec": round(time.time() - t0, 3)}
            )
        train_wall = round(time.time() - t_all, 3)

        t0 = time.time()
        applied = apply_merges(df, merges)
        agg = applied.agg(
            F.sum(F.size("tokens")).alias("out_tokens"),
            F.expr("bit_xor(xxhash64(doc_id, tokens))").alias("sig"),
        ).first()
        apply_wall = round(time.time() - t0, 3)
        in_tokens = df.agg(F.sum(F.size("tokens"))).first()[0]
        trunc.release()

        stats = _ui_stage_stats(spark.sparkContext.uiWebUrl)
        print(
            json.dumps(
                {
                    "metric": "bpe trainer scale evidence",
                    "n_docs": n_docs,
                    "n_merges_learned": len(merges),
                    "rounds": rounds,
                    "train_wall_sec": train_wall,
                    "apply_table_one_pass_sec": apply_wall,
                    "in_tokens": in_tokens,
                    "out_tokens": agg["out_tokens"],
                    "compression": round(1 - agg["out_tokens"] / max(in_tokens, 1), 4),
                    "n_stages": stats["n_stages"],
                    "shuffle_write_bytes": stats["shuffle_write_bytes"],
                }
            )
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
