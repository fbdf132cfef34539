"""The table as a Spark data source: batch reads and a streaming tail.

``diffsync_table`` (round 5) makes any Spark job — not just this
package — a consumer:

1. batch: ``spark.read.format("diffsync_table")`` reads a snapshot's
   live rows (merge-on-read layers folded executor-side), with
   ``option("version", v)`` time travel;
2. streaming: ``readStream ... option("feed", "changes")`` tails the
   table's committed change rows with exactly-once checkpoint resume —
   here piped into a downstream aggregate the standard Structured
   Streaming way (no engine code on the consumer side).

Run: PYTHONPATH=. python examples/09_spark_native_stream.py
"""

import datetime
import tempfile

from pyspark.sql import functions as F

from diffsync_spark import build_session
from diffsync_spark.model import ModelSchema
from diffsync_spark.sinks.table import SnapshotTable


def main() -> None:
    spark = build_session(master="local[8]", shuffle_partitions=8)
    t0 = datetime.datetime(2025, 1, 1)
    model = ModelSchema(
        name="turn", identifiers=("conv_id", "turn_idx"),
        attributes=("role", "text"), version_cols=("ts",),
    )
    boot = spark.range(5_000).select(
        F.concat(F.lit("conv_"), (F.col("id") % 500).cast("string"))
        .alias("conv_id"),
        (F.col("id") / 500).cast("int").alias("turn_idx"),
        F.lit("user").alias("role"),
        F.concat(F.lit("msg "), F.col("id").cast("string")).alias("text"),
        F.lit(t0).alias("ts"),
    )
    tmp = tempfile.mkdtemp(prefix="ds_example09_")
    table = SnapshotTable.create(
        spark, f"{tmp}/turns", model, schema=boot.schema,
        n_buckets=8, write_mode="mor",  # streaming tables live in MoR
    )
    table.merge(boot.withColumn("op", F.lit("insert")), mode="force",
                checkpoint_id="boot", batch_id=0)
    v_boot = table.current_version()

    # 1) batch read through the format — no SnapshotTable on this side
    df = (spark.read.format("diffsync_table")
          .option("path", f"{tmp}/turns").load())
    print("batch read:", df.count(), "rows,", len(df.columns), "columns")

    # two CDC micro-batches land as merge-on-read layer commits
    for i, rows in enumerate([
        [("conv_7", 3, "user", "edited once",
          t0 + datetime.timedelta(hours=1), "update")],
        [("conv_7", 3, "user", "edited twice",
          t0 + datetime.timedelta(hours=2), "update"),
         ("conv_9", 0, None, None,
          t0 + datetime.timedelta(hours=2), "delete")],
    ]):
        table.merge(spark.createDataFrame(
            rows, "conv_id string, turn_idx int, role string, text string, "
                  "ts timestamp, op string"),
            checkpoint_id="cdc", batch_id=1 + i)

    # 2) streaming tail: every layer commit since v_boot, exactly once
    feed = (spark.readStream.format("diffsync_table")
            .option("path", f"{tmp}/turns")
            .option("feed", "changes")
            .option("startingVersion", v_boot).load())
    q = (feed.writeStream.format("parquet")
         .option("path", f"{tmp}/feed_out")
         .trigger(availableNow=True)
         .option("checkpointLocation", f"{tmp}/ckpt").start())
    q.awaitTermination(120)
    out = spark.read.parquet(f"{tmp}/feed_out")
    print("-- streamed change rows --")
    out.select("conv_id", "turn_idx", "text", "_change_type",
               "_commit_version").orderBy("_commit_version", "conv_id").show(
        truncate=False)

    # restarting from the same checkpoint re-emits nothing (offset log)
    q2 = (feed.writeStream.format("parquet")
          .option("path", f"{tmp}/feed_out")
          .trigger(availableNow=True)
          .option("checkpointLocation", f"{tmp}/ckpt").start())
    q2.awaitTermination(120)
    print("after restart (no new commits):",
          spark.read.parquet(f"{tmp}/feed_out").count(), "rows (unchanged)")
    spark.stop()


if __name__ == "__main__":
    main()
