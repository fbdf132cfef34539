"""Debezium envelope decode: op mapping, image selection, corrupt input.
Value parity vs DuckDB lives in test_entry_oracle.py (debezium_decode)."""

from __future__ import annotations

from pyspark.sql import functions as F, types as T

from diffsync_spark.model import ModelSchema
from diffsync_spark.sources.cdc_formats import from_debezium

MODEL = ModelSchema(
    name="event",
    identifiers=("user_id", "event_id"),
    attributes=("event_type", "val"),
    version_cols=("ts",),
)
ROW = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("event_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("val", T.DoubleType()),
    ]
)


def _env(op, uid, eid, et, val, ts_ms, lsn):
    import json

    img = {"user_id": uid, "event_id": eid, "event_type": et, "val": val}
    return json.dumps(
        {
            "before": img if op == "d" else None,
            "after": None if op == "d" else img,
            "op": op,
            "ts_ms": ts_ms,
            "source": {"lsn": lsn, "table": "events"},
        }
    )


def test_debezium_decode_semantics(spark):
    rows = [
        (_env("c", 1, 10, "click", 1.5, 1_700_000_000_000, 1),),
        (_env("u", 1, 10, "click", 2.5, 1_700_000_001_000, 2),),
        (_env("d", 1, 10, "click", 2.5, 1_700_000_002_000, 3),),
        (_env("r", 2, 20, "view", 0.5, 1_700_000_003_000, 4),),  # snapshot read
        (_env("z", 3, 30, "view", 0.5, 1_700_000_004_000, 5),),  # unknown op
        ("{not valid json",),  # corrupt envelope
    ]
    raw = spark.createDataFrame(rows, "value string")
    out = from_debezium(raw, MODEL, ROW).collect()
    assert len(out) == 6  # corrupt/unknown rows are KEPT (quarantine, not drop)
    by_seq = {r.seq: r for r in out}
    assert by_seq[1].op == "insert" and by_seq[1].val == 1.5
    assert by_seq[2].op == "update" and by_seq[2].val == 2.5
    # delete takes its image from `before`
    assert by_seq[3].op == "delete" and by_seq[3].user_id == 1
    assert by_seq[4].op == "insert"  # snapshot read r → insert
    assert by_seq[5].op is None  # unknown code → NULL op → merge quarantine
    assert by_seq[5].user_id == 3  # payload still decoded
    corrupt = [r for r in out if r.seq is None]
    assert len(corrupt) == 1 and corrupt[0].op is None
    # version column is the connector commit clock
    assert by_seq[1].ts.isoformat().startswith("2023-11-14")


def test_debezium_stream_tail_to_merge(spark, tmp_path):
    """End-to-end binlog tail: a Debezium JSON-lines directory read as a
    STREAM, decoded, and LWW-merged into a SnapshotTable converges to the
    per-key last-writer state."""
    import os

    from pyspark.sql import types as T

    from diffsync_spark.model import TRANSCRIPT_MODEL
    from diffsync_spark.sinks.table import SnapshotTable

    row = T.StructType(
        [
            T.StructField("conv_id", T.StringType()),
            T.StructField("turn_idx", T.IntegerType()),
            T.StructField("role", T.StringType()),
            T.StructField("text", T.StringType()),
            T.StructField("tool", T.StringType()),
        ]
    )

    def env(op, cid, tix, text, ts_ms, lsn):
        import json

        img = {"conv_id": cid, "turn_idx": tix, "role": "user",
               "text": text, "tool": None}
        return json.dumps(
            {"before": img if op == "d" else None,
             "after": None if op == "d" else img,
             "op": op, "ts_ms": ts_ms,
             "source": {"lsn": lsn, "table": "turns"}}
        )

    tail = str(tmp_path / "tail")
    os.makedirs(tail)
    with open(f"{tail}/log1.jsonl", "w") as f:
        f.write("\n".join([
            env("c", "c1", 0, "hi", 1000, 1),
            env("u", "c1", 0, "hi there", 2000, 2),
            env("c", "c2", 0, "yo", 1500, 3),
            env("d", "c2", 0, "yo", 2500, 4),
        ]))

    table = SnapshotTable.create(
        spark, str(tmp_path / "tbl"), TRANSCRIPT_MODEL,
        schema=T.StructType(row.fields + [T.StructField("ts", T.TimestampType())]),
        n_buckets=4,
    )
    raw = spark.readStream.schema("value string").format("text").load(tail)
    chg = from_debezium(raw, TRANSCRIPT_MODEL, row)
    q = (
        chg.writeStream.foreachBatch(
            lambda df, bid: table.merge(df, checkpoint_id="dbz", batch_id=bid)
        )
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    state = {(r.conv_id, r.turn_idx): r.text for r in table.read().collect()}
    assert state == {("c1", 0): "hi there"}  # update won, delete removed c2


def test_maxwell_decode_semantics(spark):
    import json

    from diffsync_spark.sources.cdc_formats import from_maxwell

    def env(typ, uid, eid, et, val, ts_s, xid):
        return json.dumps(
            {"database": "app", "table": "t", "type": typ, "ts": ts_s,
             "xid": xid,
             "data": {"user_id": uid, "event_id": eid,
                      "event_type": et, "val": val}}
        )

    rows = [
        (env("insert", 1, 10, "click", 1.5, 1_700_000_000, 1),),
        (env("bootstrap-insert", 1, 11, "view", 0.5, 1_700_000_001, 2),),
        (env("update", 1, 10, "click", 2.5, 1_700_000_002, 3),),
        (env("delete", 1, 10, "click", 2.5, 1_700_000_003, 4),),
        (env("table-create", None, None, None, None, 1_700_000_004, 5),),  # DDL
    ]
    raw = spark.createDataFrame(rows, "value string")
    out = {r.seq: r for r in from_maxwell(raw, MODEL, ROW).collect()}
    assert out[1].op == "insert" and out[1].val == 1.5
    assert out[2].op == "insert"  # bootstrap-insert normalizes to insert
    assert out[3].op == "update"
    assert out[4].op == "delete" and out[4].user_id == 1  # image from data
    assert out[5].op is None  # DDL verb → quarantine
    assert out[1].ts.isoformat().startswith("2023-11-14")


def test_debezium_is_pure_projection(spark):
    """No exchange: the decoder must stream (works under readStream too)."""
    raw = spark.createDataFrame([(_env("c", 1, 1, "x", 1.0, 0, 1),)],
                                "value string")
    plan = (
        from_debezium(raw, MODEL, ROW)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan


def _canal_env(rows, type_, es, id_, is_ddl=False):
    import json

    data = None if rows is None else [
        {"user_id": u, "event_id": e, "event_type": t, "val": v}
        for (u, e, t, v) in rows
    ]
    return json.dumps({"data": data, "type": type_, "es": es, "ts": es + 5,
                       "id": id_, "isDdl": is_ddl, "database": "app",
                       "table": "events"})


def test_canal_decode_semantics(spark):
    """Canal: ONE envelope carries an ARRAY of row images; the decode must
    explode them with stable (id*STRIDE+pos) seqs, keep DDL/corrupt envelopes
    as NULL-op rows, and take ts from the binlog event clock (es)."""
    from diffsync_spark.sources.cdc_formats import CANAL_SEQ_STRIDE, from_canal

    S = CANAL_SEQ_STRIDE

    rows = [
        (_canal_env([(1, 10, "click", 1.5), (1, 11, "view", 2.0)],
                    "INSERT", 1_700_000_000_000, 7),),
        (_canal_env([(2, 20, "click", 3.0)], "UPDATE",
                    1_700_000_001_000, 8),),
        (_canal_env([(2, 20, "click", 3.0)], "DELETE",
                    1_700_000_002_000, 9),),
        (_canal_env(None, "CREATE", 1_700_000_003_000, 10, is_ddl=True),),
        ("{corrupt",),
    ]
    raw = spark.createDataFrame(rows, "value string")
    out = from_canal(raw, MODEL, ROW).collect()
    assert len(out) == 6  # 2 + 1 + 1 exploded rows + DDL row + corrupt row
    by_seq = {r.seq: r for r in out}
    # array explode: both rows of envelope 7, positions 0 and 1
    assert by_seq[7 * S].op == "insert" and by_seq[7 * S].event_id == 10
    assert by_seq[7 * S + 1].event_id == 11
    assert by_seq[8 * S].op == "update"
    assert by_seq[9 * S].op == "delete"
    # es (binlog clock) is the version, to the millisecond
    assert by_seq[8 * S].ts.timestamp() == 1_700_000_001.0
    # DDL envelope → one NULL-op row (quarantine, not drop)
    assert by_seq[10 * S].op is None and by_seq[10 * S].user_id is None
    # corrupt JSON → NULL everything, still one row
    assert sum(1 for r in out if r.seq is None) == 1

def test_canal_oversized_envelope_preserves_cross_envelope_order(spark):
    """ADVICE r3: a Canal envelope with >4096 row images must NOT bleed
    into the next batch id's seq range (the old 4096 stride did). A
    5,000-image envelope (id=7) followed by a 1-image envelope (id=8)
    touching the SAME key must resolve LWW to envelope 8's row."""
    import json

    from diffsync_spark.operators.lww import lww_dedup
    from diffsync_spark.sources.cdc_formats import CANAL_SEQ_STRIDE, from_canal

    n = 5000
    big = json.dumps({
        "data": [{"user_id": 1, "event_id": i, "event_type": "click",
                  "val": float(i)} for i in range(n)],
        "type": "INSERT", "es": 1_700_000_000_000,
        "ts": 1_700_000_000_005, "id": 7, "isDdl": False,
        "database": "app", "table": "events"})
    # same es (version tie) → seq is the tiebreak; same key as image 4500
    small = json.dumps({
        "data": [{"user_id": 1, "event_id": 4500, "event_type": "view",
                  "val": -1.0}],
        "type": "UPDATE", "es": 1_700_000_000_000,
        "ts": 1_700_000_000_006, "id": 8, "isDdl": False,
        "database": "app", "table": "events"})
    raw = spark.createDataFrame([(big,), (small,)], "value string")
    out = from_canal(raw, MODEL, ROW)
    assert out.count() == n + 1
    # no seq from envelope 7 may reach envelope 8's range
    import pyspark.sql.functions as F
    max7 = out.filter(F.col("event_id") != 4500).agg(
        F.max("seq")).first()[0]
    assert max7 == 7 * CANAL_SEQ_STRIDE + n - 1
    assert max7 < 8 * CANAL_SEQ_STRIDE
    # LWW on (user_id, event_id): envelope 8 (later batch id) must win
    winner = lww_dedup(out, MODEL).filter(
        F.col("event_id") == 4500).collect()
    assert len(winner) == 1
    assert winner[0].event_type == "view" and winner[0].val == -1.0


def test_from_kafka_offset_seq(spark):
    """Kafka transport decode: binary value, per-partition offset becomes
    the LWW tiebreak; envelope LSN kept when seq_source='envelope';
    corrupt envelopes keep the quarantine contract."""
    from diffsync_spark.sources.cdc_formats import from_kafka

    rows = [
        (_env("c", 1, 10, "click", 1.5, 1000, 7).encode(), 0, 100),
        (_env("u", 1, 10, "click", 2.5, 2000, 8).encode(), 0, 101),
        (_env("d", 2, 20, "view", 0.5, 3000, 9).encode(), 1, 55),
        (b"{corrupt", 1, 56),
    ]
    raw = spark.createDataFrame(
        rows, "value binary, partition int, offset long"
    )
    out = from_kafka(raw, MODEL, ROW).collect()
    assert len(out) == 4
    by_off = {r.seq: r for r in out}
    assert by_off[100].op == "insert" and by_off[100].val == 1.5
    assert by_off[101].op == "update"  # later offset = later LWW tiebreak
    assert by_off[55].op == "delete" and by_off[55].user_id == 2
    assert by_off[56].op is None  # corrupt → NULL op → quarantine
    assert "partition" not in out[0].asDict() and "offset" not in out[0].asDict()
    env_seq = {
        r.event_id: r.seq
        for r in from_kafka(raw, MODEL, ROW, seq_source="envelope").collect()
        if r.event_id is not None
    }
    assert env_seq[10] in (7, 8) and env_seq[20] == 9


def test_from_kafka_canal_offset_majorizes_position(spark):
    """Canal over Kafka: the transport offset majorizes the decoder's
    within-envelope position, so intra-envelope order survives."""
    from diffsync_spark.sources.cdc_formats import CANAL_SEQ_STRIDE, from_kafka

    env = _canal_env(
        [(1, i, "x", 1.0) for i in range(3)], "INSERT", 5_000, id_=99,
    )
    raw = spark.createDataFrame(
        [(env.encode(), 0, 42)], "value binary, partition int, offset long"
    )
    out = sorted(
        from_kafka(raw, MODEL, ROW, envelope="canal").collect(),
        key=lambda r: r.seq,
    )
    assert [r.event_id for r in out] == [0, 1, 2]
    assert [r.seq for r in out] == [
        42 * CANAL_SEQ_STRIDE + p for p in range(3)
    ]


def test_from_kafka_rejects_unknowns(spark):
    from diffsync_spark.sources.cdc_formats import from_kafka
    import pytest as _pytest

    raw = spark.createDataFrame(
        [(b"x", 0, 1)], "value binary, partition int, offset long"
    )
    with _pytest.raises(ValueError):
        from_kafka(raw, MODEL, ROW, envelope="avro")
    with _pytest.raises(ValueError):
        from_kafka(raw, MODEL, ROW, seq_source="timestamp")


def test_from_kafka_payload_named_offset_survives(spark):
    """A payload column named 'offset' (queue/ledger tables) must neither
    collide with the transport offset nor get dropped."""
    import json as _json

    from diffsync_spark.sources.cdc_formats import from_kafka

    row = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("event_id", T.LongType()),
            T.StructField("offset", T.LongType()),  # payload field!
        ]
    )
    model = ModelSchema(name="ledger", identifiers=("user_id", "event_id"),
                        attributes=("offset",), version_cols=("ts",))
    img = {"user_id": 1, "event_id": 2, "offset": 777}
    env = _json.dumps({"before": None, "after": img, "op": "c",
                       "ts_ms": 1000, "source": {"lsn": 1, "table": "l"}})
    raw = spark.createDataFrame(
        [(env.encode(), 0, 42)], "value binary, partition int, offset long"
    )
    out = from_kafka(raw, model, row).collect()
    assert len(out) == 1
    assert out[0]["offset"] == 777  # the PAYLOAD value, not the transport's
    assert out[0]["seq"] == 42      # the transport offset became the seq


def _w2j(action, uid, eid, et, val, ts, lsn, image_key="columns",
         omit=()):
    """A wal2json format-v2 message with the README's real shape:
    numeric values UNQUOTED, per-entry type names, textual lsn/timestamp."""
    import json

    entries = [
        {"name": "user_id", "type": "bigint", "value": uid},
        {"name": "event_id", "type": "bigint", "value": eid},
        {"name": "event_type", "type": "text", "value": et},
        {"name": "val", "type": "double precision", "value": val},
    ]
    entries = [e for e in entries if e["name"] not in omit]
    msg = {"action": action, "schema": "public", "table": "events",
           image_key: entries, "timestamp": ts, "lsn": lsn}
    return json.dumps(msg)


def test_wal2json_decode_semantics(spark):
    from diffsync_spark.sources.cdc_formats import from_wal2json

    ts = "2019-12-29 04:58:34.806671+00"
    rows = [
        ('{"action":"B","lsn":"0/16B2D00"}',),          # begin marker
        (_w2j("I", 1, 10, "click", 1.5, ts, "0/16B2D50"),),
        (_w2j("U", 1, 10, "click", 2.5, ts, "0/16B2D60"),),
        # delete: replica-identity image only, no `columns`
        (_w2j("D", 1, 10, "click", 2.5, ts, "0/16B2D70",
              image_key="identity"),),
        # TOAST-omitted column: `val` missing from the image → NULL
        (_w2j("U", 2, 20, "view", None, ts, "1/0000000A", omit=("val",)),),
        # truncate → NULL op (quarantine), no image
        ('{"action":"T","schema":"public","table":"events",'
         '"timestamp":"' + ts + '","lsn":"0/16B2D90"}',),
        ('{"action":"C","lsn":"0/16B2DA0"}',),          # commit marker
        ("corrupt {",),                                  # malformed JSON
        # malformed lsn → NULL seq (F.conv would give 0 — guard pins NULL)
        (_w2j("I", 3, 30, "view", 0.5, ts, "zz/nothex"),),
    ]
    raw = spark.createDataFrame(rows, "value string")
    out = from_wal2json(raw, MODEL, ROW).collect()
    # B and C markers filtered; everything else kept
    assert len(out) == 7
    by_seq = {r.seq: r for r in out}
    assert by_seq[0x16B2D50].op == "insert" and by_seq[0x16B2D50].val == 1.5
    assert by_seq[0x16B2D60].op == "update" and by_seq[0x16B2D60].val == 2.5
    d = by_seq[0x16B2D70]
    assert d.op == "delete" and d.user_id == 1 and d.event_id == 10
    # the X half of the LSN is the high 32 bits
    toast = by_seq[(1 << 32) + 0x0000000A]
    assert toast.op == "update" and toast.user_id == 2 and toast.val is None
    trunc = by_seq[0x16B2D90]
    assert trunc.op is None and trunc.user_id is None  # quarantine row
    # corrupt JSON and malformed-lsn rows both land with seq NULL
    null_seq = [r for r in out if r.seq is None]
    assert len(null_seq) == 2
    bad_lsn = [r for r in null_seq if r.user_id == 3]
    assert len(bad_lsn) == 1 and bad_lsn[0].op == "insert"
    # commit timestamp parsed to the exact instant (UTC session)
    assert by_seq[0x16B2D50].ts.isoformat() == "2019-12-29T04:58:34.806671"


def test_wal2json_is_pure_projection(spark):
    """No shuffle: the decode must stay a scan→filter→project pipeline."""
    from diffsync_spark.sources.cdc_formats import from_wal2json

    raw = spark.createDataFrame([("x",)], "value string")
    plan = from_wal2json(raw, MODEL, ROW)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_from_kafka_wal2json_envelope(spark):
    """wal2json rides the Kafka transport like the other formats: offset
    becomes the LWW tiebreak; seq_source='envelope' keeps the LSN."""
    from diffsync_spark.sources.cdc_formats import from_kafka

    ts = "2024-06-01 12:00:00.000000+00"
    rows = [
        (_w2j("I", 1, 10, "click", 1.5, ts, "0/A0").encode(), 0, 500),
        (_w2j("D", 1, 10, "click", None, ts, "0/B0",
              image_key="identity").encode(), 0, 501),
        ('{"action":"B","lsn":"0/C0"}'.encode(), 0, 502),  # filtered
    ]
    raw = spark.createDataFrame(
        rows, "value binary, partition int, offset long"
    )
    out = from_kafka(raw, MODEL, ROW, envelope="wal2json").collect()
    assert len(out) == 2  # begin marker filtered
    by_seq = {r.seq: r for r in out}
    assert by_seq[500].op == "insert" and by_seq[500].val == 1.5
    assert by_seq[501].op == "delete" and by_seq[501].user_id == 1
    env = from_kafka(raw, MODEL, ROW, envelope="wal2json",
                     seq_source="envelope").collect()
    assert {r.seq for r in env} == {0xA0, 0xB0}
