"""Day-2 operations on a long-lived table — the ops runbook in one script.

A 100 TB CDC sink is not just merges: operators need to answer "how many
rows right now?" without a scan, audit what each commit did, read the
table as of an incident time, repair and re-drive rejected records, and
keep metadata/storage bounded. This demo walks that loop on a small
transcript table (reference analogs: store introspection
``diffsync/store/local.py:91-103`` and the CONTINUE_ON_FAILURE logging of
``diffsync/helpers.py:442-446`` — here the failures are durable data you
can fix and requeue, not log lines).

Run:  PYTHONPATH=. python examples/06_day2_operations.py
"""

import datetime
import tempfile
import time

from pyspark.sql import functions as F

from diffsync_spark import SnapshotTable, build_session
from diffsync_spark.model import TRANSCRIPT_MODEL

SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, tool string, "
    "ts timestamp, op string"
)


def main() -> None:
    spark = build_session(master="local[4]", shuffle_partitions=4,
                          app_name="day2_operations")
    tmp = tempfile.mkdtemp(prefix="day2_")
    t0 = datetime.datetime(2031, 1, 1)
    boot = spark.createDataFrame(
        [(f"conv{c}", i, "user", f"c{c} turn {i}", None, t0, "insert")
         for c in range(6) for i in range(4)],
        SCHEMA,
    )
    table = SnapshotTable.create(spark, f"{tmp}/tbl", TRANSCRIPT_MODEL,
                                 schema=boot.drop("op").schema, n_buckets=8)
    table.merge(boot, mode="force", checkpoint_id="boot", batch_id=0)

    # 1) metadata-only count: a dict sum over the manifest, never a scan
    print(f"rows now (no scan): {table.count_rows()}")
    t_before_incident = time.time()

    # 2) a bad batch: one valid update + one row with a NULL key
    t1 = t0 + datetime.timedelta(hours=1)
    r = table.merge(spark.createDataFrame(
        [("conv0", 0, "user", "EDITED turn 0", None, t1, "update"),
         (None, 99, "user", "dropped key", None, t1, "insert")],
        SCHEMA), checkpoint_id="feed", batch_id=1)
    print(f"merge applied={r['n_update']} quarantined={r['n_quarantined']}")

    # 3) audit: per-snapshot wall clock, live rows, quarantine presence
    table.history().select(
        "version", "n_live_rows", "has_quarantine", "committed_at_us"
    ).show()

    # 4) time travel: the state as of just before the incident
    old = table.read_as_of(t_before_incident)
    print("turn 0 as of pre-incident:",
          old.filter("conv_id = 'conv0' and turn_idx = 0")
             .select("text").first()["text"])

    # 5) inspect + repair + requeue the rejected row
    print("quarantined rows:")
    table.quarantine_df().select("conv_id", "turn_idx", "_status_reason").show()
    rq = table.requeue_quarantine(
        fix=lambda df: df.withColumn(
            "conv_id", F.coalesce(F.col("conv_id"), F.lit("conv_recovered"))
        )
    )
    print(f"requeued: created={rq['n_create']} "
          f"re-quarantined={rq['n_quarantined']}")
    print("recovered row:", table.lookup(("conv_recovered", 99))["text"])

    # 6) pin "the dataset run X trained on" BEFORE retention runs: tags
    #    are immutable names that expire_snapshots never reclaims
    tag_v = table.create_tag("train-run-2031w01")

    # 7) bound storage and metadata: binpack fragmented buckets, drop
    #    unreferenced attempt dirs, expire old snapshots — the tagged
    #    snapshot survives and stays readable
    print("compact:", table.compact(min_files=2)["compacted_buckets"])
    print("orphan GC:", table.remove_orphans())
    print("expire:", table.expire_snapshots(keep_last=3))
    print(f"rows after ops (unchanged): {table.count_rows()}")
    print("tagged snapshot still reads:",
          table.read(version=table.tag_version("train-run-2031w01")).count(),
          f"rows at v{tag_v}")

    # 8) delete-retention: once the stream's watermark guarantees no event
    #    older than H can still arrive, tombstones older than H protect
    #    nothing — purge them so churned keys don't bloat the table forever
    table.delete_where(F.col("conv_id") == "conv1")
    n_tomb = table.read_raw().filter("_deleted").count()
    table.compact(purge_tombstones_older_than=t0
                  + datetime.timedelta(days=365))
    print(f"tombstones {n_tomb} -> "
          f"{table.read_raw().filter('_deleted').count()} after purge")

    # 9) the table outgrew its create-time layout: grow the bucket count
    #    (one rewrite; old snapshots keep routing with their own layout)
    print("rebucket:", table.rebucket(32))
    print("lookup in the new layout:",
          table.lookup(("conv0", 0))["text"])

    # 10) schema evolution beyond add-column: rename is METADATA-ONLY
    #     (stable field ids — every existing file resolves under the new
    #     name), drop prunes at read, and a re-added name never
    #     resurrects dropped values
    from pyspark.sql import types as T

    table.rename_column("tool", "tool_name")
    table.add_column("quality", T.DoubleType())
    print("after rename+add:", table.read().columns)

    # 11) set-based corrections without hand-built changelogs
    table.update_where("role = 'user' AND quality IS NULL",
                       set={"quality": "0.5"})
    print("update_where filled:",
          table.read().filter("quality = 0.5").count(), "rows")

    # 12) data contracts on ingest: a malformed batch quarantines with a
    #     NAMED reason instead of poisoning the table
    bad = spark.createDataFrame(
        [("conv0", 999, "upsert", "user", "", None,
          t0 + datetime.timedelta(days=400), None)],
        "conv_id string, turn_idx int, op string, role string, "
        "text string, tool_name string, ts timestamp, quality double",
    )
    res = table.merge(bad, checkpoint_id="contract", batch_id=0,
                      expectations={"text_nonempty": "length(text) > 0"})
    print("contract violations:", res["n_expectation_failed"],
          "| reason:", table.quarantine_df().first()._status_reason)
    spark.stop()


if __name__ == "__main__":
    main()
