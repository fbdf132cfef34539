"""Table-to-table cascade — a downstream table tails an upstream one.

The reference's composition story stops at one store per sync run; at
pipeline scale the OUTPUT of one CDC sink is the INPUT of the next stage
(bronze → silver → gold). This engine chains tables without any external
queue: `stream_changes` tails the upstream table's own snapshot chain and
yields manifest-pruned deltas (`changes(v, cur)` — only buckets whose
file sets changed are read), and `pipe_changes` applies each hop to a
downstream table with exactly-once resume riding the downstream's own
(checkpoint_id, batch_id) commit metadata: the batch id IS the upstream
version, so a crashed pipe restarts from `committed_batch()` and a
re-delivered hop is skipped by the sink itself.

Run:  PYTHONPATH=. python examples/05_table_cascade.py
"""

import datetime
import tempfile

from pyspark.sql import functions as F

from diffsync_spark import SnapshotTable, build_session
from diffsync_spark.model import TRANSCRIPT_MODEL
from diffsync_spark.streaming import pipe_changes, stream_changes

SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, tool string, "
    "ts timestamp, op string"
)


def main() -> None:
    spark = build_session(master="local[8]", shuffle_partitions=8)
    root = tempfile.mkdtemp(prefix="cascade_")
    ts = datetime.datetime(2024, 1, 1)

    boot = spark.createDataFrame(
        [(f"conv_{i}", t, "user", f"turn {t} of {i}", None, ts, "insert")
         for i in range(50) for t in range(4)],
        SCHEMA,
    )
    upstream = SnapshotTable.create(
        spark, f"{root}/bronze", TRANSCRIPT_MODEL,
        schema=boot.drop("op").schema, n_buckets=8,
    )
    upstream.merge(boot, mode="force", checkpoint_id="boot", batch_id=0)

    downstream = SnapshotTable.create(
        spark, f"{root}/silver", TRANSCRIPT_MODEL,
        schema=boot.drop("op").schema, n_buckets=8,
    )

    # first pipe call: downstream has never seen this checkpoint →
    # bootstrap from the upstream snapshot, then drain any hops
    results = pipe_changes(upstream, downstream, checkpoint_id="cascade")
    print(f"bootstrap: {len(results)} commit(s), "
          f"downstream rows = {downstream.read().count()}")

    # upstream keeps ingesting: two more CDC batches land
    later = datetime.datetime(2024, 2, 1)
    upstream.merge(spark.createDataFrame(
        [("conv_3", 0, "user", "EDITED", None, later, "update"),
         ("conv_7", 1, None, None, None, later, "delete")], SCHEMA),
        checkpoint_id="chg", batch_id=1)
    upstream.merge(spark.createDataFrame(
        [("conv_99", 0, "user", "brand new", None, later, "insert")], SCHEMA),
        checkpoint_id="chg", batch_id=2)

    # peek at what the tail sees: one coalesced manifest-pruned delta for
    # BOTH commits, classified create/update/delete
    resume_from = downstream.committed_batch("cascade")
    for v_from, v_to, delta in stream_changes(upstream,
                                              from_version=resume_from):
        print(f"hop v{v_from} -> v{v_to}:")
        delta.select("op", "conv_id", "turn_idx").orderBy(
            "conv_id", "turn_idx").show()

    # apply the same hops downstream (recomputing a peeked hop is fine —
    # changes() is deterministic for a pinned version range)
    results = pipe_changes(upstream, downstream, checkpoint_id="cascade")
    print(f"delta pipe: {len(results)} commit(s)")
    print("downstream rows:", downstream.read().count())
    print("edited row:", downstream.read()
          .filter((F.col("conv_id") == "conv_3") & (F.col("turn_idx") == 0))
          .first().text)

    # idempotence: nothing new upstream → the pipe commits nothing
    again = pipe_changes(upstream, downstream, checkpoint_id="cascade")
    print(f"re-pipe with no upstream changes: {len(again)} commit(s)")
    spark.stop()


if __name__ == "__main__":
    main()
