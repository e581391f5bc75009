"""Process-per-executor scaling evidence, protocol v2 (r6).

Protocol v1 (scripts/scaling_bench_procs.py) completed its pre-registered
r6 pool: 11 interleaved pairs over 3 quiesced windows, pooled per-pair
median 0.755 — below the 0.8 bar.  Per the pre-registration's own escape
clause the shortfall was then profiled rather than re-rolled, and the
diagnostics (BENCH/diag_r06.json, BENCH/diag_equal_duration_r06.json)
root-caused it to three HARNESS artifacts, not engine scaling:

1. **Hypervisor steal bursts hit the high level asymmetrically.**
   /proc/stat steal deltas vary 12x between same-code high-level reps
   (1 079 vs 12 731 ticks) and track tps (338k at 0.6% box-steal vs
   208-296k at 4-6%).  The v1 high window is 3.3x shorter (65 s vs
   215 s), so one multi-second burst costs the high level 3.3x more
   relative throughput; and 8/32 vs 2/32 cores are measured executors,
   so a burst is 4x more likely to land on one.
2. **Max-of-N closure over a SINGLE static work unit.**  v1 assigns each
   high-level process exactly one shard; the window is GO -> last exit,
   so one stalled process extends the whole window with nothing to
   amortize it.  Real Spark hands out many tasks per executor
   dynamically; stragglers are absorbed by the queue.
3. **Equal-duration evidence.**  Re-measuring with the high level doing
   4 passes (~271 s vs low 249 s, same code/corpus/box) gave eff 0.917
   (BENCH/diag_equal_duration_r06.json); the steal-free v1 rep ratio is
   0.90.  The engine scales ~0.9; the v1 window structure eats it.

v2 fixes each mechanism while keeping the criterion definition intact
(eff = (tps_4N / tps_N) / 4, pooled per-pair median, interleaved levels,
equal-active-core spin control, no pair discarded):

* the corpus is sharded into 32 units (not 8); executors CLAIM units
  dynamically via O_CREAT|O_EXCL marker files — Spark-style dynamic task
  scheduling, straggler closure bounded by one ~13 s unit at BOTH levels;
* the high level runs 4 passes over the corpus (128 units) so each
  process executes ~16 units at BOTH levels and both measured windows
  last ~215 s — equal steal-burst exposure (throughput is work/time, so
  extra passes change nothing else);
* every level-run records /proc/stat steal/idle/iowait deltas and the
  per-process finish-time spread, so a steal-polluted window is VISIBLE
  in the pool record instead of inferred post hoc.

The window barrier, warmup-then-GO structure, taskset pinning, spin
control, and the measured job (pages -> Arrow-batched extraction ->
(subj, pred, obj) triples -> count) are unchanged from v1.

Usage: python scripts/scaling_bench_procs_v2.py [n_low] [n_pages]
           [n_reps] [window]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time
from datetime import datetime, timezone

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TOTAL_CORES = os.cpu_count() or 32
N_SHARDS = 32
HIGH_PASSES = 4

PREPARE = r"""
import os, sys
sys.path.insert(0, {repo!r})
os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")
from pyspark.sql import functions as F
from gossiphs_spark.session import get_spark
from gossiphs_spark.datagen import pages_df_dist
spark = get_spark(app_name="scaling_prepare_v2", cores=32,
                  shuffle_partitions=32)
pages, _ = pages_df_dist(spark, n_pages={n_pages}, seed=7, partitions=96,
                         body_scale=8)
n = {n_shards}
pages = pages.withColumn("_shard", F.crc32(F.col("url")) % n)
# single-pass partitioned write (v1 looped 32 filtered scans, each
# regenerating the corpus); shard dirs land at {{root}}/_shard={{s}}
(pages.repartition(n, "_shard").write.mode("overwrite")
 .partitionBy("_shard").parquet({root!r}))
print("PREPARED")
spark.stop()
"""

# One "executor": a single-core JVM. Warms up on two statically assigned
# units (JIT/codegen), signals READY, busy-waits for GO, then CLAIMS
# units from the shared queue until it is drained, writes its DONE file
# (triples + timestamp) BEFORE JVM teardown so the measured window never
# includes spark.stop().
EXECUTOR = r"""
import json, os, sys, time
sys.path.insert(0, {repo!r})
os.environ["SPARK_GRAFT_CPUS"] = "1"
os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "6g")
from pyspark.sql import functions as F
from gossiphs_spark.session import get_spark
from gossiphs_spark.operators.extract import extract_mentions

shards = {shards!r}
n_units = {n_units}
queue_dir = {queue_dir!r}
idx = {idx}
spark = get_spark(app_name="exec_v2_{idx}", cores=1, shuffle_partitions=2,
                  extra_conf={{
                      "spark.ui.enabled": "false",
                      "spark.sql.execution.arrow.maxRecordsPerBatch": "8192",
                  }})

def triples_count(path):
    p = spark.read.parquet(path)
    m = extract_mentions(p, columns=("url", "name", "kind", "start_byte"))
    titles = m.filter(F.col("kind") == "DEF").select("url", F.col("name").alias("subj"))
    objs = (m.filter(F.col("kind").isin("REF", "IMPORT"))
        .groupBy("url", F.col("name").alias("obj"),
                 F.when(F.col("kind") == "REF", F.lit("mentions"))
                  .otherwise(F.lit("links_to")).alias("pred"))
        .agg(F.min("start_byte").alias("start_byte")))
    return (objs.join(titles, "url").filter(F.col("obj") != F.col("subj")).count())

for w in range(2):  # warmup: JIT/codegen on two units
    triples_count(shards[(idx * 2 + w) % len(shards)])

open({ready!r}, "w").write("r")
while not os.path.exists({go!r}):
    time.sleep(0.05)

total = 0
done = 0
for u in range(n_units):
    try:
        fd = os.open(os.path.join(queue_dir, f"u{{u}}"),
                     os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        os.close(fd)
    except FileExistsError:
        continue
    total += triples_count(shards[u % len(shards)])
    done += 1
with open({done_path!r}, "w") as f:
    json.dump({{"idx": idx, "triples": total, "units": done,
                "t_done": time.time()}}, f)
spark.stop()
"""


def _counters() -> dict:
    out = {}
    with open("/proc/stat") as f:
        parts = f.readline().split()
        out["steal_ticks"] = int(parts[8]) if len(parts) > 8 else 0
        out["idle_ticks"] = int(parts[4])
        out["iowait_ticks"] = int(parts[5])
    return out


def run_level(n_execs: int, shard_dirs: list[str], passes: int,
              workdir: str) -> dict:
    """Launch n_execs single-core executors over a dynamic queue of
    passes*len(shard_dirs) units; window = GO -> last DONE file."""
    if n_execs > TOTAL_CORES:
        raise ValueError(f"n_execs={n_execs} exceeds {TOTAL_CORES} cores")
    n_units = passes * len(shard_dirs)
    tag = f"{n_execs}_{time.time_ns()}"
    go = os.path.join(workdir, f"go_{tag}")
    queue_dir = os.path.join(workdir, f"queue_{tag}")
    os.makedirs(queue_dir)
    spinners = [
        subprocess.Popen(
            ["taskset", "-c", str(c), sys.executable, "-c",
             "while True:\n pass"],
            stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
        )
        for c in range(n_execs, TOTAL_CORES)
    ]
    procs, readies, outfiles, dones = [], [], [], []
    try:
        for i in range(n_execs):
            ready = os.path.join(workdir, f"ready_{tag}_{i}")
            done_path = os.path.join(workdir, f"done_{tag}_{i}")
            outf = os.path.join(workdir, f"out_{tag}_{i}")
            readies.append(ready)
            dones.append(done_path)
            outfiles.append(outf)
            code = EXECUTOR.format(repo=REPO, shards=shard_dirs,
                                   n_units=n_units, queue_dir=queue_dir,
                                   idx=i, ready=ready, go=go,
                                   done_path=done_path)
            # output to FILES, not PIPEs (JVM warmup logs can fill a pipe
            # and deadlock before READY — r4 gotcha)
            with open(outf, "w") as fh:
                procs.append(subprocess.Popen(
                    ["taskset", "-c", str(i), sys.executable, "-c", code],
                    stdout=fh, stderr=subprocess.STDOUT,
                ))
        deadline = time.time() + 1800
        while not all(os.path.exists(r) for r in readies):
            if time.time() > deadline:
                raise RuntimeError("executors never became ready")
            for p, outf in zip(procs, outfiles):
                if p.poll() is not None:
                    raise RuntimeError(
                        f"executor died in warmup: {open(outf).read()[-2000:]}")
            time.sleep(0.2)
        c0 = _counters()
        t0 = time.time()
        open(go, "w").write("g")
        finish = [None] * n_execs
        while not all(finish):
            for i, d in enumerate(dones):
                if finish[i] is None and os.path.exists(d):
                    finish[i] = time.time() - t0
            if time.time() - t0 > 1800:
                raise RuntimeError("measured window exceeded 1800 s")
            for i, (p, outf) in enumerate(zip(procs, outfiles)):
                if finish[i] is None and p.poll() is not None \
                        and not os.path.exists(dones[i]):
                    raise RuntimeError(
                        f"executor died measured: {open(outf).read()[-2000:]}")
            time.sleep(0.05)
        wall = max(finish)
        c1 = _counters()
        for p in procs:
            p.wait(timeout=300)
    finally:
        for p in spinners:
            p.kill()
        for p in procs:
            if p.poll() is None:
                p.kill()
    total, units = 0, 0
    for d in dones:
        with open(d) as f:
            rec = json.load(f)
        total += rec["triples"]
        units += rec["units"]
    if units != n_units:
        raise RuntimeError(f"queue leak: {units} units done of {n_units}")
    return {
        "execs": n_execs, "passes": passes, "sec": wall, "triples": total,
        "tps": total / wall,
        "finish_spread_sec": round(max(finish) - min(finish), 2),
        "steal_ticks": c1["steal_ticks"] - c0["steal_ticks"],
        "iowait_ticks": c1["iowait_ticks"] - c0["iowait_ticks"],
    }


# round-tagged pool file (r8): each round's pairs accumulate in their
# own record; override with SPARK_GRAFT_POOL_FILE to extend a prior pool
POOL_PATH = os.path.join(
    REPO, "BENCH",
    os.environ.get("SPARK_GRAFT_POOL_FILE", "procs_runs_v2_r08.json"))


def _git_sha() -> str:
    try:
        return subprocess.run(
            ["git", "-C", REPO, "rev-parse", "--short", "HEAD"],
            capture_output=True, text=True, timeout=30,
        ).stdout.strip()
    except Exception:
        return "unknown"


def _flush_pool(window: str, rep_pair: dict) -> dict:
    """Append one interleaved (low, high) pair; recompute the pooled
    per-pair median (the criterion). Flushed after EVERY pair; no pair
    is ever discarded."""
    pool = {"windows": {}}
    if os.path.exists(POOL_PATH):
        with open(POOL_PATH) as f:
            pool = json.load(f)
    w = pool["windows"].setdefault(
        window, {"sha": _git_sha(), "reps": [],
                 "started": datetime.now(timezone.utc).isoformat()})
    w["reps"].append(rep_pair)
    pair_effs = sorted(
        r["pair_eff"] for ww in pool["windows"].values() for r in ww["reps"])
    n = len(pair_effs)
    med = (pair_effs[n // 2] if n % 2 else
           (pair_effs[n // 2 - 1] + pair_effs[n // 2]) / 2.0)
    pool["pooled"] = {
        "n_pairs": n,
        "pair_effs": [round(e, 3) for e in pair_effs],
        "per_pair_median_eff": round(med, 3),
        "target": 0.8, "meets_target": med >= 0.8,
    }
    with open(POOL_PATH, "w") as f:
        json.dump(pool, f, indent=1)
    return pool["pooled"]


def main() -> None:
    n_low = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    n_pages = int(sys.argv[2]) if len(sys.argv) > 2 else 250_000
    n_reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    window = sys.argv[4] if len(sys.argv) > 4 else "A"
    n_high = n_low * 4
    root = os.path.join(tempfile.gettempdir(),
                        f"scaling_shards_v2_{n_pages}_{N_SHARDS}")

    if not (
        os.path.exists(os.path.join(root, "_SUCCESS"))
        and all(os.path.exists(os.path.join(root, f"_shard={s}"))
                for s in range(N_SHARDS))
    ):
        proc = subprocess.run(
            [sys.executable, "-c",
             PREPARE.format(repo=REPO, n_pages=n_pages, n_shards=N_SHARDS,
                            root=root)],
            capture_output=True, text=True, timeout=3600,
        )
        if "PREPARED" not in proc.stdout:
            raise RuntimeError(f"prepare failed: {proc.stderr[-3000:]}")

    shard_dirs = [os.path.join(root, f"_shard={s}") for s in range(N_SHARDS)]
    # prime the page cache once so pair 1's low level is not the only
    # cold reader (both levels then see identical cache state)
    for d in shard_dirs:
        for fn in os.listdir(d):
            with open(os.path.join(d, fn), "rb") as f:
                while f.read(1 << 20):
                    pass
    workdir = tempfile.mkdtemp(prefix="scaling_sync_v2_")
    for rep in range(n_reps):
        lo = run_level(n_low, shard_dirs, passes=1, workdir=workdir)
        print(f"rep {rep + 1}/{n_reps} low:  {lo}", flush=True)
        hi = run_level(n_high, shard_dirs, passes=HIGH_PASSES,
                       workdir=workdir)
        print(f"rep {rep + 1}/{n_reps} high: {hi}", flush=True)
        pooled = _flush_pool(window, {
            "low_tps": round(lo["tps"], 1), "high_tps": round(hi["tps"], 1),
            "low_sec": round(lo["sec"], 1), "high_sec": round(hi["sec"], 1),
            "low_steal": lo["steal_ticks"], "high_steal": hi["steal_ticks"],
            "low_spread_sec": lo["finish_spread_sec"],
            "high_spread_sec": hi["finish_spread_sec"],
            "pair_eff": round((hi["tps"] / lo["tps"]) / 4.0, 4),
        })
        print(f"pooled so far: {pooled}", flush=True)


if __name__ == "__main__":
    main()
