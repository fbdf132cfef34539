"""Day-2 operations, part two: inspecting and re-laying-out a live table.

Round-5 surface — the Iceberg/Delta-style tools an operator of a large
table reaches for:

1. metadata tables (``files`` / ``partitions`` / ``refs``) — plan
   maintenance without reading data;
2. the Delta-CDF change feed (``change_feed``) — subscribe downstream
   systems to flat row images, net or per-commit;
3. Z-order clustering (``compact(zorder=...)``) — multi-dimensional file
   pruning for analytic reads;
4. native parquet bloom filters (``create(bloom_cols=...)``) — row-group
   skipping on high-cardinality string equality.

Run: PYTHONPATH=. python examples/08_inspection_and_layout.py
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
        attributes=("role", "text", "score"), version_cols=("ts",),
    )
    boot = spark.range(40_000).select(
        F.concat(F.lit("conv_"), (F.col("id") % 2_000).cast("string"))
        .alias("conv_id"),
        (F.col("id") / 2_000).cast("int").alias("turn_idx"),
        F.lit("user").alias("role"),
        F.md5(F.col("id").cast("string")).alias("text"),
        F.pmod(F.xxhash64("id"), F.lit(1000)).cast("int").alias("score"),
        F.lit(t0).alias("ts"),
    )
    tmp = tempfile.mkdtemp(prefix="ds_example08_")
    # bloom filters on the high-cardinality string column from birth
    table = SnapshotTable.create(
        spark, f"{tmp}/turns", model, schema=boot.schema,
        n_buckets=8, bloom_cols=["text"],
    )
    table.merge(boot.withColumn("op", F.lit("insert")), mode="force",
                checkpoint_id="boot", batch_id=0)
    v_boot = table.current_version()

    # 1) inspection without data IO
    print("-- partitions() --")
    table.partitions().show(4)
    print("-- files() (first 3) --")
    table.files().select("bucket", "slot", "kind", "size_bytes").show(3)
    table.create_tag("boot", v_boot)
    print("-- refs() --")
    table.refs().show(truncate=False)

    # 2) a correction batch, then the CDF feed of what changed
    t1 = t0 + datetime.timedelta(hours=1)
    fix = spark.createDataFrame(
        [("conv_7", 3, "user", "corrected", 500, t1, "update"),
         ("conv_9", 0, None, None, None, t1, "delete")],
        "conv_id string, turn_idx int, role string, text string, "
        "score int, ts timestamp, op string",
    )
    table.merge(fix, checkpoint_id="fix", batch_id=0)
    print("-- change_feed (net, flat row images) --")
    table.change_feed(v_boot).select(
        "conv_id", "turn_idx", "text", "_change_type", "_commit_version"
    ).show(truncate=False)

    # 3) re-cluster for 2-D analytic reads: (turn_idx, score) box scans
    res = table.compact(zorder=["turn_idx", "score"],
                        zorder_files_per_bucket=4)
    print("zorder rewrite:", res)
    box = table.scan([("turn_idx", "<", 5), ("score", "<", 100)])
    print(f"box scan: {box.count()} rows from "
          f"{len(box.inputFiles())} of {table.files().count()} files")
    spark.stop()


if __name__ == "__main__":
    main()
