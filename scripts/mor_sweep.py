"""Write-amplification sweep: copy-on-write vs merge-on-read across
micro-batch counts (BENCH/mor_amplification.json evidence).

The 100 TB CDC regime is MANY small batches against a large table: under
copy-on-write every batch rewrites each touched bucket whole, so bytes
written grow ~linearly with batch COUNT at fixed event volume; under
merge-on-read each batch writes only its own rows, so bytes written stay
~flat and the one-time compaction pays the fold. This script replays the
SAME events/table at n_batches in {2, 8, 32} in both modes and records

- wall seconds for the replay (and for MoR: read-back + compact),
- bytes actually written under the table dir (manifest-referenced files,
  i.e. committed state across all versions — the physical write volume),

so the amplification claim is measured, not asserted.

Usage: python scripts/mor_sweep.py [--events 2000000] [--convs 8000]
                                   [--cpus 16] [--out BENCH/mor_amplification.json]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--events", type=int, default=2_000_000)
    ap.add_argument("--convs", type=int, default=8_000)
    ap.add_argument("--cpus", type=int, default=16)
    ap.add_argument("--buckets", type=int, default=64)
    ap.add_argument("--batch-counts", type=int, nargs="+", default=[2, 8, 32])
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from diffsync_spark import build_session, fixtures
    from diffsync_spark.model import TRANSCRIPT_MODEL
    from diffsync_spark.sinks.table import SnapshotTable
    from diffsync_spark.streaming.replay import replay_batches

    base = "/dev/shm" if os.path.isdir("/dev/shm") else None
    work = tempfile.mkdtemp(prefix="mor_sweep_", dir=base)
    spark = build_session(
        master=f"local[{args.cpus}]",
        app_name="mor_sweep",
        shuffle_partitions=args.cpus,
        extra_conf={"spark.local.dir": f"{work}/sparktmp",
                    "spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    fixtures.gen_source_spark(
        spark, n_convs=args.convs, turns_per_conv=20, text_bytes=256
    ).repartition(args.cpus).write.mode("overwrite").parquet(f"{work}/src")
    fixtures.gen_changelog_spark(
        spark, args.events, n_convs=args.convs, turns_per_conv=20,
        text_bytes=256,
    ).repartition(max(args.cpus, 64)).write.mode("overwrite").parquet(
        f"{work}/chg"
    )
    src_df = spark.read.parquet(f"{work}/src")
    chg_df = spark.read.parquet(f"{work}/chg")
    total_events = chg_df.count()

    def du(path: str) -> int:
        total = 0
        for root, _dirs, files in os.walk(path):
            for fn in files:
                try:
                    total += os.path.getsize(os.path.join(root, fn))
                except OSError:
                    pass
        return total

    runs = []
    for n_batches in args.batch_counts:
        for mode in ("cow", "mor"):
            tbl = os.path.join(work, f"tbl_{mode}_{n_batches}")
            table = SnapshotTable.create(
                spark, tbl, TRANSCRIPT_MODEL, schema=src_df.schema,
                n_buckets=args.buckets, write_mode=mode,
            )
            table.merge(src_df.withColumn("op", F.lit("insert")),
                        mode="force", checkpoint_id="boot", batch_id=0)
            boot_bytes = du(os.path.join(tbl, "data"))
            t0 = time.perf_counter()
            replay_batches(table, chg_df, n_batches=n_batches,
                           checkpoint_id="bench")
            replay_s = time.perf_counter() - t0
            replay_bytes = du(os.path.join(tbl, "data")) - boot_bytes
            row = {
                "mode": mode,
                "n_batches": n_batches,
                "replay_sec": round(replay_s, 2),
                "events_per_sec": round(total_events / replay_s, 1),
                "bytes_written_per_event": round(
                    replay_bytes / total_events, 1
                ),
                "replay_gib_written": round(replay_bytes / 2**30, 3),
            }
            if mode == "mor":
                t1 = time.perf_counter()
                n = table.read().count()
                row["read_back_sec"] = round(time.perf_counter() - t1, 2)
                t2 = time.perf_counter()
                table.compact()
                row["compact_sec"] = round(time.perf_counter() - t2, 2)
                row["final_rows"] = n
            else:
                row["final_rows"] = table.read().count()
            runs.append(row)
            print(json.dumps(row), flush=True)
            shutil.rmtree(tbl, ignore_errors=True)

    # sanity: both modes converge to the same row count per batch split
    by_split: dict[int, set[int]] = {}
    for r in runs:
        by_split.setdefault(r["n_batches"], set()).add(r["final_rows"])
    assert all(len(v) == 1 for v in by_split.values()), by_split

    out = {
        "events": total_events,
        "convs": args.convs,
        "cpus": args.cpus,
        "n_buckets": args.buckets,
        "runs": runs,
    }
    if args.out:
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)
    print(json.dumps({"summary": {
        f"{r['mode']}@{r['n_batches']}": r["replay_sec"] for r in runs
    }}))
    spark.stop()
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
