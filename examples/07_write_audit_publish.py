"""Write-audit-publish + an incrementally-maintained gold rollup.

The trust boundary of a CDC pipeline: a suspicious source batch must not
reach readers until it passes validation. Iceberg's answer is branch
refs + fastForward; this engine's is the same shape — ingest lands on a
BRANCH (main readers never see it), audit queries run against the
branch, and `publish()` fast-forwards main as a metadata-only commit
(no data moves; the branch's exactly-once checkpoint watermarks come
along). A failed audit just drops the branch.

Downstream, `pipe_aggregate` maintains a per-conversation rollup by
dirty-group recompute: each published hop re-aggregates ONLY the
conversations the delta touched — bucket-pruned, because conv_id is the
upstream's bucketing key — so the gold table follows main at O(changed
groups) cost per hop, and max/distinct aggregates stay correct under
deletes (whole dirty groups recompute; nothing is delta-folded).

Run:  PYTHONPATH=. python examples/07_write_audit_publish.py
"""

import datetime
import tempfile

from pyspark.sql import functions as F, types as T

from diffsync_spark import SnapshotTable, build_session
from diffsync_spark.model import ModelSchema, TRANSCRIPT_MODEL
from diffsync_spark.streaming import pipe_aggregate

SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, tool string, "
    "ts timestamp, op string"
)


def ts(s):
    return datetime.datetime.fromisoformat(s)


def main():
    spark = build_session(master="local[4]", shuffle_partitions=4)
    root = tempfile.mkdtemp(prefix="wap_example_")

    boot = spark.createDataFrame(
        [
            ("c1", 0, "user", "hi", None, ts("2030-01-01 10:00:00"), "insert"),
            ("c1", 1, "assistant", "hello", None, ts("2030-01-01 10:00:01"), "insert"),
            ("c2", 0, "user", "query", None, ts("2030-01-01 11:00:00"), "insert"),
        ],
        SCHEMA,
    )
    table = SnapshotTable.create(
        spark, f"{root}/transcripts", TRANSCRIPT_MODEL,
        schema=boot.drop("op").schema, n_buckets=4,
    )
    table.merge(boot, mode="force", checkpoint_id="boot", batch_id=0)

    # ---- 1. stage a batch on a branch: main readers can't see it
    table.create_branch("audit-2030-01-02")
    staging = table.branch("audit-2030-01-02")
    suspicious = spark.createDataFrame(
        [
            ("c2", 1, "assistant", "answer", None, ts("2030-01-02 09:00:00"), "upsert"),
            ("c3", 0, "user", "new conversation", None, ts("2030-01-02 09:05:00"), "upsert"),
        ],
        SCHEMA,
    )
    staging.merge(suspicious, checkpoint_id="ingest", batch_id=1)
    print("main rows:", table.read().count(), "| branch rows:", staging.read().count())

    # ---- 2. the audit: arbitrary queries against the staged state
    nulls = staging.read().filter("text IS NULL OR conv_id IS NULL").count()
    assert nulls == 0, "audit failed — drop the branch, nothing published"

    # ---- 3. publish: metadata-only fast-forward of main
    pub = table.publish("audit-2030-01-02", delete_branch=True)
    print("published:", pub)
    print("main rows now:", table.read().count())
    # the branch's checkpoint rode along: re-delivering the source batch
    # to MAIN is an exactly-once skip
    print("replay skipped:", table.merge(
        suspicious, checkpoint_id="ingest", batch_id=1)["skipped"])

    # ---- 4. gold layer: per-conversation rollup, maintained incrementally
    rollup_model = ModelSchema(
        name="conv_rollup", identifiers=("conv_id",),
        attributes=("n_turns", "last_ts_us"),
    )
    gold = SnapshotTable.create(
        spark, f"{root}/rollup", rollup_model,
        schema=T.StructType([
            T.StructField("conv_id", T.StringType()),
            T.StructField("n_turns", T.LongType()),
            T.StructField("last_ts_us", T.LongType()),
        ]),
        n_buckets=4,
    )

    def agg(df):
        return df.groupBy("conv_id").agg(
            F.count(F.lit(1)).alias("n_turns"),
            F.max(F.unix_micros(F.col("ts").cast("timestamp"))).alias("last_ts_us"),
        )

    pipe_aggregate(table, gold, agg, checkpoint_id="gold")
    gold.read().orderBy("conv_id").show()

    # another published cycle flows through as a dirty-group hop
    table.create_branch("audit-2030-01-03")
    staging = table.branch("audit-2030-01-03")
    staging.merge(spark.createDataFrame(
        [("c1", 2, "user", "thanks", None, ts("2030-01-03 08:00:00"), "upsert")],
        SCHEMA,
    ), checkpoint_id="ingest", batch_id=2)
    table.publish("audit-2030-01-03", delete_branch=True)
    hops = pipe_aggregate(table, gold, agg, checkpoint_id="gold")
    print("dirty hop touched buckets:", hops[0]["touched_buckets"])
    gold.read().orderBy("conv_id").show()

    spark.stop()


if __name__ == "__main__":
    main()
