"""CDC end-to-end — tail a binlog, upsert a lake table, survive restarts.

The north-star pipeline: a Debezium-format JSON-lines changelog directory
(standing in for a Kafka topic) is read as a STREAM, decoded into the
changelog contract, and LWW-merged into a transactional SnapshotTable in
micro-batches. Run it twice: the second run resumes from the checkpoint,
re-reads nothing, and the table state is unchanged — exactly-once.

Run:  PYTHONPATH=. python examples/02_cdc_binlog_tail.py
"""

import json
import os
import tempfile

from pyspark.sql import functions as F, types as T

from diffsync_spark import SnapshotTable, build_session
from diffsync_spark.model import TRANSCRIPT_MODEL
from diffsync_spark.sources import from_debezium

ROW = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("role", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("tool", T.StringType()),
    ]
)


def envelope(op, conv_id, turn_idx, text, ts_ms, lsn):
    img = {"conv_id": conv_id, "turn_idx": turn_idx, "role": "user",
           "text": text, "tool": None}
    return json.dumps(
        {"before": img if op == "d" else None,
         "after": None if op == "d" else img,
         "op": op, "ts_ms": ts_ms, "source": {"lsn": lsn, "table": "turns"}}
    )


def main() -> None:
    spark = build_session(master="local[4]", shuffle_partitions=4)
    with tempfile.TemporaryDirectory(prefix="cdc_tail_") as work:
        _run(spark, work)
    spark.stop()


def _run(spark, work: str) -> None:
    tail = f"{work}/tail"
    os.makedirs(tail)

    # the upstream connector appends envelopes: create, late update, delete
    with open(f"{tail}/segment-000.jsonl", "w") as f:
        f.write("\n".join([
            envelope("c", "conv-1", 0, "hello", 1_000, 1),
            envelope("c", "conv-1", 1, "hi! how can I help?", 2_000, 2),
            envelope("u", "conv-1", 0, "hello there", 3_000, 3),
            envelope("c", "conv-2", 0, "scratch conversation", 1_500, 4),
            envelope("d", "conv-2", 0, "scratch conversation", 2_500, 5),
        ]))

    table = SnapshotTable.create(
        spark, f"{work}/transcripts", TRANSCRIPT_MODEL,
        schema=T.StructType(ROW.fields + [T.StructField("ts", T.TimestampType())]),
        n_buckets=8,
    )

    def run_tail() -> None:
        raw = spark.readStream.schema("value string").format("text").load(tail)
        chg = from_debezium(raw, TRANSCRIPT_MODEL, ROW)
        q = (
            chg.writeStream.foreachBatch(
                lambda df, bid: table.merge(df, checkpoint_id="tail", batch_id=bid)
            )
            .option("checkpointLocation", f"{work}/checkpoint")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_tail()
    v1 = table.current_version()
    print("--- state after first tail run ---")
    table.read().orderBy("conv_id", "turn_idx").show(truncate=False)

    # restart: the checkpoint remembers what was consumed; no re-apply
    run_tail()
    assert table.current_version() == v1, "restart must not re-commit"
    state = {(r.conv_id, r.turn_idx): r.text for r in table.read().collect()}
    assert state == {("conv-1", 0): "hello there",
                     ("conv-1", 1): "hi! how can I help?"}
    print("restart re-applied nothing; update won; delete tombstoned conv-2")

    # downstream consumers tail the TABLE, not the binlog:
    print("--- incremental changes since bootstrap (CDC read of the sink) ---")
    table.changes(1).select("conv_id", "turn_idx", "op").show()

    # the same envelopes as a KAFKA topic would deliver them — binary
    # value + (partition, offset); the per-partition offset becomes the
    # LWW tiebreak (the order a primary-key-keyed topic guarantees)
    from diffsync_spark.sources.cdc_formats import from_kafka

    records = [
        (envelope("c", "conv-1", 0, "hello", 1_000, 1), 0),
        (envelope("c", "conv-1", 1, "hi! how can I help?", 2_000, 2), 0),
        (envelope("u", "conv-1", 0, "hello there", 3_000, 3), 0),
        (envelope("c", "conv-2", 0, "scratch conversation", 1_500, 4), 1),
        (envelope("d", "conv-2", 0, "scratch conversation", 2_500, 5), 1),
    ]
    offsets = {}
    kafka_rows = []
    for value, part in records:
        offsets[part] = offsets.get(part, -1) + 1
        kafka_rows.append((value.encode(), part, offsets[part]))
    raw = spark.createDataFrame(
        kafka_rows, "value binary, partition int, offset long"
    )
    t2 = SnapshotTable.create(
        spark, f"{work}/transcripts_kafka", TRANSCRIPT_MODEL,
        schema=T.StructType(ROW.fields + [T.StructField("ts", T.TimestampType())]),
        n_buckets=8,
    )
    t2.merge(from_kafka(raw, TRANSCRIPT_MODEL, ROW),
             checkpoint_id="kafka", batch_id=0)
    k_state = {(r.conv_id, r.turn_idx): r.text for r in t2.read().collect()}
    assert k_state == state, "Kafka transport must land the same final state"
    print("kafka-contract decode landed the identical final state")


if __name__ == "__main__":
    main()
