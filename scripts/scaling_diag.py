"""Diagnose the scaling-efficiency shortfall (r6; non-criterion).

Post-hoc per-executor exit times from the r6 criterion windows showed
the 8-proc level's early reps run UNIFORMLY ~25-35 % slower across all
eight executors (no straggler spread), recovering monotonically across
the window, while the 2-proc level stays flat. This script isolates the
box-state effect the criterion harness cannot see:

  phase A: N consecutive HIGH-level runs, nothing else between — if tps
           rises monotonically with no code/data change, the penalty is
           machine state (hypervisor vCPU adaptation / memory-reclaim
           transients), not the job;
  phase B: LOW-level runs for the flat control;
  phase C: idle settle, then one HIGH run — does coldness return?

Each run also samples /proc/stat steal and /proc/vmstat reclaim/
compaction counters so the OS-side suspects are measured, not guessed.
Methodology of run_level itself is IDENTICAL to the criterion harness
(imported from scaling_bench_procs).
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from scaling_bench_procs import run_level  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def counters() -> dict:
    out = {}
    with open("/proc/stat") as f:
        parts = f.readline().split()
        # user nice system idle iowait irq softirq steal
        out["steal_ticks"] = int(parts[8]) if len(parts) > 8 else 0
        out["idle_ticks"] = int(parts[4])
        out["iowait_ticks"] = int(parts[5])
    keep = {"pgsteal_kswapd", "pgsteal_direct", "compact_stall",
            "compact_fail", "thp_collapse_alloc", "pgmajfault",
            "allocstall_normal", "allocstall_movable"}
    with open("/proc/vmstat") as f:
        for line in f:
            k, _, v = line.partition(" ")
            if k in keep:
                out[k] = int(v)
    return out


def delta(a: dict, b: dict) -> dict:
    return {k: b[k] - a[k] for k in a}


def main() -> None:
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 250_000
    n_high = 8
    root = os.path.join(tempfile.gettempdir(),
                        f"scaling_shards_{n_pages}_{n_high}")
    shard_dirs = [os.path.join(root, f"shard{s}") for s in range(n_high)]
    assert all(os.path.exists(os.path.join(d, "_SUCCESS"))
               for d in shard_dirs), "run scaling_bench_procs once first"
    workdir = tempfile.mkdtemp(prefix="scaling_diag_")
    report = {"phases": []}

    def measured(tag: str, execs: int) -> dict:
        c0 = counters()
        r = run_level(execs, shard_dirs, workdir)
        c1 = counters()
        row = {"tag": tag, "execs": execs, "tps": round(r["tps"], 1),
               "sec": round(r["sec"], 1), "os_delta": delta(c0, c1)}
        report["phases"].append(row)
        print(json.dumps(row), flush=True)
        return row

    for i in range(5):  # phase A: consecutive HIGH runs
        measured(f"A_high_{i + 1}", 8)
    for i in range(2):  # phase B: LOW control
        measured(f"B_low_{i + 1}", 2)
    print("phase C: 300 s idle settle", flush=True)
    time.sleep(300)
    measured("C_high_after_idle", 8)

    with open(os.path.join(REPO, "BENCH", "diag_r06.json"), "w") as f:
        json.dump(report, f, indent=1)
    print("DIAG DONE")


if __name__ == "__main__":
    main()
