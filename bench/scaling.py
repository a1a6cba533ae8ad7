"""Two-parallelism scaling study (the sandbox stand-in for N vs 4N
executors, per BASELINE.json / driver instruction).

Runs bench/pipeline_bench.py as subprocesses at local[8] and local[32]
on the SAME synthesized input size, then writes BENCH/BASELINE.md with
throughput at both levels and efficiency = thr(4N) / (4 * thr(N)).

Usage: python bench/scaling.py [rows]   (default 2,000,000)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from datetime import datetime, timezone

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)


def run_level(cpus: int, rows: int) -> dict:
    env = dict(os.environ, BENCH_CPUS=str(cpus), BENCH_ROWS=str(rows))
    out = subprocess.run(
        [sys.executable, os.path.join(HERE, "pipeline_bench.py")],
        env=env,
        capture_output=True,
        text=True,
        check=True,
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    lo = run_level(8, rows)
    print("local[8]: ", json.dumps(lo), flush=True)
    hi = run_level(32, rows)
    print("local[32]:", json.dumps(hi), flush=True)

    eff_run = hi["points_per_sec"] / (4 * lo["points_per_sec"])
    thr_lo_total = lo["points"] / lo["total_sec"]
    thr_hi_total = hi["points"] / hi["total_sec"]
    eff_total = thr_hi_total / (4 * thr_lo_total)

    md = f"""# BENCH/BASELINE.md — measured pipeline throughput + scaling

Generated {datetime.now(timezone.utc).strftime('%Y-%m-%d %H:%M UTC')} by `python bench/scaling.py {rows}`.

Job: deterministic token table ({rows:,} rows, seed 42) -> ingest (raw
parquet, partitioned source/day) -> extract (4 metric points/row) ->
1m/5m/1h/1d tier rollups -> Gorilla chunk writes -> lineage seals.
Same input at both parallelism levels (local[8] vs local[32] = the
sandbox stand-in for N vs 4N executors); AQE on; explicit shuffle
partitions 2x cores.

| level | ingest (s) | pipeline run (s) | total (s) | points | points/s (run) |
|---|---|---|---|---|---|
| local[8]  | {lo['ingest_sec']} | {lo['run_sec']} | {lo['total_sec']} | {lo['points']:,} | {lo['points_per_sec']:,} |
| local[32] | {hi['ingest_sec']} | {hi['run_sec']} | {hi['total_sec']} | {hi['points']:,} | {hi['points_per_sec']:,} |

**Scaling efficiency (pipeline run)** = thr(32) / (4 x thr(8)) =
{hi['points_per_sec']:,.0f} / (4 x {lo['points_per_sec']:,.0f}) = **{eff_run:.3f}**
(target >= 0.8, BASELINE.json).

Scaling efficiency (ingest+run total): {eff_total:.3f} — ingest is
disk-write-bound on this single-node sandbox, so the end-to-end number
under-reads what a real cluster (independent executor disks) would show.

Reference baseline: the reference repo publishes no numbers
(BASELINE.md); these measurements ARE the baseline for later rounds.
"""
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(md)
    print(md)


if __name__ == "__main__":
    main()
