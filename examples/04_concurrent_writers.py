"""Concurrent writers on one table — conflict, rebase, GC, expiration.

The reference's scale-out story is several workers sharing one store
(docs/source/core_engine/03-store.md, store/redis.py); this engine's analog
is several Spark jobs MERGE-ing into one SnapshotTable. The commit protocol
is optimistic concurrency (the Iceberg loop): the loser of a manifest race
re-reads the winner's snapshot and recomputes — or skips entirely if the
winner already committed the same (checkpoint_id, batch_id). Losing
attempts write to per-attempt unique dirs, so they can never clobber a
committed snapshot; `remove_orphans()` sweeps their droppings and
`expire_snapshots()` bounds history.

This demo injects the race deterministically with RacingCommitIO (the same
fake the tests use): writer A's exclusive manifest write first lets writer
B commit, then collides — exactly the conditional-PUT race an S3/GCS
catalog backend loses.

Run:  PYTHONPATH=. python examples/04_concurrent_writers.py
"""

import datetime
import os
import tempfile

from pyspark.sql import functions as F

from diffsync_spark import SnapshotTable, build_session
from diffsync_spark.model import TRANSCRIPT_MODEL
from diffsync_spark.sinks.fsio import RacingCommitIO

SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, tool string, "
    "ts timestamp, op string, seq long"
)


def batch(spark, conv, n=4):
    t0 = datetime.datetime(2031, 1, 1)
    return spark.createDataFrame(
        [(conv, i, "user", f"{conv} turn {i}", None,
          t0 + datetime.timedelta(seconds=i), "insert", i) for i in range(n)],
        SCHEMA,
    )


def main():
    spark = build_session(master="local[4]", shuffle_partitions=4)
    root = tempfile.mkdtemp(prefix="concurrent_demo_")
    boot = batch(spark, "bootstrap").drop("op", "seq")

    table = SnapshotTable.create(
        spark, os.path.join(root, "transcripts"), TRANSCRIPT_MODEL,
        schema=boot.schema, n_buckets=8,
    )
    table.merge(batch(spark, "bootstrap"), mode="force",
                checkpoint_id="boot", batch_id=0)

    # writer B: a plain second handle on the same table path
    writer_b = SnapshotTable.load(spark, table.path, TRANSCRIPT_MODEL)

    # writer A: loses the first commit race to B (injected), then rebases
    writer_a = SnapshotTable.load(
        spark, table.path, TRANSCRIPT_MODEL,
        io=RacingCommitIO(
            lambda: writer_b.merge(batch(spark, "writer_b"),
                                   checkpoint_id="wb", batch_id=1),
            races=1,
        ),
    )
    res = writer_a.merge(batch(spark, "writer_a"), checkpoint_id="wa",
                         batch_id=1)
    print(f"writer A: commit_retries={res['commit_retries']} "
          f"version={res['version']} n_create={res['n_create']}")

    state = table.read()
    print("conversations in final state:",
          sorted(r.conv_id for r in state.select("conv_id").distinct().collect()))
    print("lineage checkpoints:",
          sorted({r.checkpoint_id for r in table.lineage_df().collect()}))

    # the loser's first attempt left an unreferenced data dir — sweep it
    gc = table.remove_orphans()
    print("orphan dirs removed:",
          [os.path.basename(d) for d in gc["removed_dirs"]])

    # bound history: keep the last 2 snapshots, drop exclusively-old files
    exp = table.expire_snapshots(keep_last=2)
    print(f"expired versions {exp['expired_versions']} "
          f"({exp['removed_files']} files removed); "
          f"current still reads {table.read().count()} rows")

    spark.stop()


if __name__ == "__main__":
    main()
