"""Two-parallelism scaling evidence (BASELINE.md protocol).

Runs the identical CDC replay at local[N] and local[4N] on the same
pre-generated input, reports events/sec at both plus scaling efficiency
(T_4N / T_N) / 4. Each run is a fresh subprocess (fresh JVM) so no warm
caches leak between configurations.

Usage: python scripts/scaling_run.py [--events 8000000] [--n 8]
Writes results JSON to stdout; BENCH/BASELINE.md is updated by hand/driver.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile

RUNNER = r"""
import json, os, sys, time, shutil, tempfile
from pyspark.sql import functions as F
from diffsync_spark import build_session
from diffsync_spark.model import TRANSCRIPT_MODEL
from diffsync_spark.sinks.table import SnapshotTable
from diffsync_spark.streaming.replay import replay_batches

cpus, src_path, chg_path, n_batches, n_buckets = (
    int(sys.argv[1]), sys.argv[2], sys.argv[3], int(sys.argv[4]), int(sys.argv[5])
)
shuffle_mult = int(sys.argv[6]) if len(sys.argv) > 6 else 1
write_mode = sys.argv[7] if len(sys.argv) > 7 else "cow"
work = os.path.dirname(src_path)
tempfile.tempdir = work  # table + shuffle co-located with the input (tmpfs)
spark = build_session(master=f"local[{cpus}]", shuffle_partitions=cpus * shuffle_mult,
                      app_name=f"scaling_{cpus}",
                      extra_conf={"spark.local.dir": f"{work}/sparktmp_{cpus}"})
src_df = spark.read.parquet(src_path)
chg_df = spark.read.parquet(chg_path)
tbl = tempfile.mkdtemp(prefix=f"scale_{cpus}_"); shutil.rmtree(tbl)
table = SnapshotTable.create(spark, tbl, TRANSCRIPT_MODEL,
                             schema=src_df.schema, n_buckets=n_buckets,
                             write_mode=write_mode)
table.merge(src_df.withColumn("op", F.lit("insert")), mode="force",
            checkpoint_id="boot", batch_id=0)
n_events = chg_df.count()
t0 = time.perf_counter()
replay_batches(table, chg_df, n_batches=n_batches, checkpoint_id="scale")
dt = time.perf_counter() - t0
rows = table.read().count()
shutil.rmtree(tbl, ignore_errors=True)
import numpy as _np
_x = _np.zeros(64 * 1024 * 1024 // 8)
_t0 = time.perf_counter(); _y = _x.copy(); _bw = round(2 * _x.nbytes / (time.perf_counter() - _t0) / 1e9, 2)
print("RESULT " + json.dumps({"cpus": cpus, "events": n_events,
      "seconds": round(dt, 2), "events_per_sec": round(n_events / dt, 1),
      "final_rows": rows, "membw_gbps_after": _bw}))
spark.stop()
"""


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--events", type=int, default=8_000_000)
    ap.add_argument("--convs", type=int, default=8000)
    ap.add_argument("--batches", type=int, default=4)
    ap.add_argument("--buckets", type=int, default=64)
    ap.add_argument("--n", type=int, default=8, help="small parallelism (4N = big)")
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--text-bytes", type=int, default=256, dest="text_bytes")
    ap.add_argument("--heap", default="16g")
    # >1 shrinks per-task sort/shuffle working sets: on a host whose memory
    # subsystem saturates before its cores, 4x-partitions keeps concurrent
    # allocation bounded as parallelism grows (real clusters size partitions
    # to total cores too)
    ap.add_argument("--shuffle-mult", type=int, default=1, dest="shuffle_mult")
    # 'mor' runs the same replay through the merge-on-read write path —
    # the apply writes O(batch) bytes, so the scaling measurement isolates
    # the shuffle/compute path from bucket-rewrite write bandwidth
    ap.add_argument("--write-mode", default="cow", dest="write_mode",
                    choices=("cow", "mor"))
    args = ap.parse_args()

    base = "/dev/shm" if os.path.isdir("/dev/shm") else None
    work = tempfile.mkdtemp(prefix="scaling_input_", dir=base)
    gen = f"""
import sys
from diffsync_spark import build_session, fixtures
spark = build_session(master="local[32]", shuffle_partitions=32, app_name="gen")
src = fixtures.gen_source_spark(spark, n_convs={args.convs},
                                turns_per_conv=20, text_bytes={args.text_bytes})
chg = fixtures.gen_changelog_spark(spark, {args.events}, n_convs={args.convs},
                                   turns_per_conv=20, text_bytes={args.text_bytes})
src.repartition(32).write.mode("overwrite").parquet("{work}/src")
chg.repartition(64).write.mode("overwrite").parquet("{work}/chg")
spark.stop()
"""
    env = {**os.environ, "PYTHONPATH": os.path.dirname(os.path.dirname(os.path.abspath(__file__)))}
    subprocess.run([sys.executable, "-c", gen], check=True, env=env,
                   stderr=subprocess.DEVNULL)

    # interleaved repeats (N, 4N, N, 4N, ...) with best-of per config: local
    # benchmarking is noisy (page cache, JIT, background activity); the best
    # run is the least-contended measurement of the same deterministic job
    all_runs: dict[int, list[dict]] = {args.n: [], args.n * 4: []}
    for _ in range(args.repeats):
        for cpus in (args.n, args.n * 4):
            # constant HEAP at both parallelism levels: on a real cluster,
            # N → 4N executors means 4x JVMs of the SAME size, never one 4x
            # heap. Scaling the single local JVM's heap with threads puts G1
            # into a pathological regime (measured: 64g heap → 927s GC on a
            # 4M-event merge vs 15s at 16g) that no multi-JVM cluster
            # exhibits. 16g fits both configs with headroom (peak execution
            # memory ≈ 6.5g); build_session caps GC threads for the same
            # fat-local-JVM reason.
            run_env = {**env, "SPARK_DRIVER_MEMORY": args.heap}
            out = subprocess.run(
                [sys.executable, "-c", RUNNER, str(cpus), f"{work}/src",
                 f"{work}/chg", str(args.batches), str(args.buckets),
                 str(args.shuffle_mult), args.write_mode],
                check=True, env=run_env, capture_output=True, text=True,
            )
            line = [l for l in out.stdout.splitlines()
                    if l.startswith("RESULT ")][-1]
            all_runs[cpus].append(json.loads(line[len("RESULT "):]))

    best = {c: max(rs, key=lambda r: r["events_per_sec"])
            for c, rs in all_runs.items()}
    t_n = best[args.n]["events_per_sec"]
    t_4n = best[args.n * 4]["events_per_sec"]
    eff = round((t_4n / t_n) / 4, 3)
    summary = {
        "write_mode": args.write_mode,
        "n_cores": args.n,
        "4n_cores": args.n * 4,
        "events": best[args.n]["events"],
        "throughput_n": t_n,
        "throughput_4n": t_4n,
        "scaling_efficiency": eff,
        "all_runs": all_runs,
    }
    print(json.dumps(summary, indent=2))
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
