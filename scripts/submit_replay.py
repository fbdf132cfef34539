"""spark-submit entry point — the north rule's deployment shape.

The engine must run "via spark-submit --py-files on a multi-executor
cluster": this script is the submitted driver program, importing
``diffsync_spark`` from the SHIPPED ``--py-files`` zip (never a checkout
on the driver's filesystem) and running the CDC replay end-to-end. On a
real cluster the identical invocation only changes ``--master``.

Package + submit (scripts/submit_smoke.sh does exactly this):

    cd /root/repo && zip -qr /tmp/diffsync_spark.zip diffsync_spark
    cd /tmp && /opt/spark/bin/spark-submit --master local[8] \
        --py-files /tmp/diffsync_spark.zip \
        /root/repo/scripts/submit_replay.py --events 1000000

Prints one JSON line: events, seconds, events/sec, final rows, and the
package path actually imported (must point inside the zip).
"""

from __future__ import annotations

import argparse
import json
import shutil
import tempfile
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--events", type=int, default=1_000_000)
    ap.add_argument("--convs", type=int, default=4000)
    ap.add_argument("--batches", type=int, default=2)
    args = ap.parse_args()

    # imported AFTER spark-submit has put the --py-files zip on sys.path
    import diffsync_spark
    from pyspark.sql import SparkSession, functions as F

    from diffsync_spark import fixtures
    from diffsync_spark.model import TRANSCRIPT_MODEL
    from diffsync_spark.sinks.table import SnapshotTable
    from diffsync_spark.streaming.replay import replay_batches

    # spark-submit owns master/conf; getOrCreate attaches to the submitted
    # session instead of build_session's local defaults
    spark = SparkSession.builder.appName("diffsync_spark_submit").getOrCreate()

    work = tempfile.mkdtemp(prefix="submit_replay_")
    src = fixtures.gen_source_spark(spark, n_convs=args.convs,
                                    turns_per_conv=20, text_bytes=256)
    chg = fixtures.gen_changelog_spark(spark, args.events, n_convs=args.convs,
                                       turns_per_conv=20, text_bytes=256)
    src.write.mode("overwrite").parquet(f"{work}/src")
    chg.write.mode("overwrite").parquet(f"{work}/chg")
    src_df = spark.read.parquet(f"{work}/src")
    chg_df = spark.read.parquet(f"{work}/chg")

    table = SnapshotTable.create(spark, f"{work}/tbl", TRANSCRIPT_MODEL,
                                 schema=src_df.schema, n_buckets=64)
    table.merge(src_df.withColumn("op", F.lit("insert")), mode="force",
                checkpoint_id="boot", batch_id=0)
    n = chg_df.count()
    t0 = time.perf_counter()
    replay_batches(table, chg_df, n_batches=args.batches,
                   checkpoint_id="submit")
    dt = time.perf_counter() - t0
    print("SUBMIT_RESULT " + json.dumps({
        "events": n,
        "seconds": round(dt, 2),
        "events_per_sec": round(n / dt, 1),
        "final_rows": table.read().count(),
        "package": diffsync_spark.__file__,
    }))
    shutil.rmtree(work, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
