"""Scaling-efficiency evidence for the north rule (BASELINE.json: throughput
scaling efficiency >= 0.8 between N and 4N executors).

No real cluster in-sandbox, so per the driver protocol we run the SAME
pipeline job on the SAME materialized input at local[8] and local[32]
(separate subprocesses -> separate JVMs) and report throughput at both plus
efficiency = (T8/T32) / 4 ... i.e. (thr_32 / thr_8) / 4.

Writes/updates BENCH.md. Usage: python tools/scaling_bench.py [n_docs]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_at(cpus: int, n_docs: int) -> dict:
    env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus))
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"), "--pipeline-only", str(n_docs)],
        env=env,
        capture_output=True,
        text=True,
        check=True,
        cwd=REPO,
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    lo, hi = 8, 32
    r_lo = run_at(lo, n_docs)
    r_hi = run_at(hi, n_docs)
    eff = (r_hi["value"] / r_lo["value"]) / (hi / lo)
    result = {
        "n_docs": n_docs,
        f"throughput_local[{lo}]": r_lo["value"],
        f"throughput_local[{hi}]": r_hi["value"],
        f"wall_local[{lo}]": r_lo["wall_sec"],
        f"wall_local[{hi}]": r_hi["wall_sec"],
        "scaling_efficiency": round(eff, 3),
        "target": 0.8,
        "pass": eff >= 0.8,
    }
    print(json.dumps(result))
    md = [
        "# BENCH — scaling-efficiency evidence (north rule)",
        "",
        "Same pipeline job (parse→enrich→route→aggregate over the materialized",
        f"pre-tokenized input table, {n_docs:,} sequences) at two parallelism",
        "levels, separate JVMs, identical input parquet:",
        "",
        "| parallelism | wall (s) | throughput (seqs/sec) |",
        "|---|---|---|",
        f"| local[{lo}] | {r_lo['wall_sec']} | {r_lo['value']:,} |",
        f"| local[{hi}] | {r_hi['wall_sec']} | {r_hi['value']:,} |",
        "",
        f"**Scaling efficiency ({lo}→{hi} cores, 4×): {eff:.3f}** "
        f"(target ≥ 0.8 → {'PASS' if eff >= 0.8 else 'FAIL'})",
        "",
        "Per-sink rows (both runs identical): "
        + json.dumps(r_hi["sink_rows"]),
        "",
    ]
    with open(os.path.join(REPO, "BENCH.md"), "w") as f:
        f.write("\n".join(md))


if __name__ == "__main__":
    main()
