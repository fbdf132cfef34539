"""CDC envelope decoders — binlog/WAL-tail JSON → the engine's changelog.

The north rule is "binlog/WAL tail → lake upsert". Real change streams
arrive as connector envelopes, not clean columns; the dominant wire format
is Debezium's (one JSON document per change: ``before``/``after`` row
images, ``op`` code ``c|u|d|r``, source metadata, ``ts_ms``). This module
normalizes such envelopes into the engine's changelog contract —
``(seq, op, <key cols>, <payload cols>, ts)`` — so everything downstream
(LWW dedup, three-way patch, MERGE) is format-agnostic.

All decoding is JVM-side: ``F.from_json`` with an explicit schema (never
schema inference on a stream), column expressions for the op mapping, and
epoch-millis → timestamp for the version column. Works identically on a
batch frame and a ``readStream`` (Kafka ``value`` column or JSON-lines
file tail), since it is a pure projection.

Reference analog: none — the reference loads snapshots via per-adapter
Python (``/root/reference/diffsync/__init__.py:532-534``) and has no
change-stream surface. Format spec from the public Debezium docs
(https://debezium.io/documentation — message envelope structure).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql import types as T

from diffsync_spark.model import ModelSchema

# Debezium op codes → the engine's changelog verbs. "r" (snapshot read)
# is an upsert of current state, same apply semantics as create.
_OP_MAP = {"c": "insert", "r": "insert", "u": "update", "d": "delete"}

# Canal seq stride: seq = batch_id * STRIDE + position-in-envelope. 2**20
# positions per envelope — far above any realistic Canal batch (and 2**43
# batch ids still fit a long), so adjacent envelopes can never interleave
# in the LWW total order. Shared by from_canal and its DuckDB twin.
CANAL_SEQ_STRIDE = 2 ** 20


def debezium_envelope_schema(model: ModelSchema, row_schema: T.StructType) -> T.StructType:
    """Envelope struct schema for ``F.from_json``: row images typed by the
    model table's own schema, so payload columns come out typed (no
    second cast pass)."""
    return T.StructType(
        [
            T.StructField("before", row_schema),
            T.StructField("after", row_schema),
            T.StructField("op", T.StringType()),
            T.StructField("ts_ms", T.LongType()),
            T.StructField(
                "source",
                T.StructType(
                    [
                        T.StructField("lsn", T.LongType()),
                        T.StructField("table", T.StringType()),
                    ]
                ),
            ),
        ]
    )


def _op_col(code: Column) -> Column:
    expr = None
    for k, v in _OP_MAP.items():
        expr = F.when(code == k, v) if expr is None else expr.when(code == k, v)
    return expr  # unknown codes → NULL → quarantined by the merge contract


def from_debezium(
    raw: DataFrame,
    model: ModelSchema,
    row_schema: T.StructType,
    value_col: str = "value",
    keep_cols: "tuple[str, ...]" = (),
) -> DataFrame:
    """Decode a frame of Debezium JSON envelopes (one per row in
    ``value_col``) into the changelog contract.

    - key + payload columns come from ``after`` (or ``before`` for deletes,
      which carry no after-image);
    - ``op`` maps c/r→insert, u→update, d→delete; unknown codes become
      NULL ops, which the MERGE path quarantines rather than drops;
    - ``ts`` is the envelope's ``ts_ms`` (the connector's commit clock —
      the LWW version under the engine's contract);
    - ``seq`` is the source LSN (log sequence number), the total order
      within the upstream log, used as the LWW tiebreak.

    Pure projection: no shuffle, streams and batches alike; corrupt JSON
    yields NULL structs → NULL op → quarantine (never a dropped row).
    """
    env = debezium_envelope_schema(model, row_schema)
    parsed = raw.select(
        *[F.col(c) for c in keep_cols],
        F.from_json(F.col(value_col), env).alias("e"),
    )
    image = F.when(F.col("e.op") == "d", F.col("e.before")).otherwise(
        F.col("e.after")
    )
    cols = [F.col("e.source.lsn").alias("seq"), _op_col(F.col("e.op")).alias("op")]
    cols += [image.getField(f.name).alias(f.name) for f in row_schema.fields]
    cols.append(
        F.timestamp_millis(F.col("e.ts_ms")).alias("ts")
    )
    return parsed.select(*cols, *[F.col(c) for c in keep_cols])


def maxwell_envelope_schema(row_schema: T.StructType) -> T.StructType:
    """Maxwell's daemon envelope (the other common binlog-tail JSON): flat
    ``data`` row image, ``old`` partial before-image, string ``type``
    verbs, second-resolution ``ts``, ``xid``+``commit`` for transaction
    grouping. Spec from the public Maxwell docs (maxwells-daemon.io)."""
    return T.StructType(
        [
            T.StructField("database", T.StringType()),
            T.StructField("table", T.StringType()),
            T.StructField("type", T.StringType()),
            T.StructField("ts", T.LongType()),
            T.StructField("xid", T.LongType()),
            T.StructField("data", row_schema),
            T.StructField("old", row_schema),
        ]
    )


def from_maxwell(
    raw: DataFrame,
    model: ModelSchema,
    row_schema: T.StructType,
    value_col: str = "value",
    keep_cols: "tuple[str, ...]" = (),
) -> DataFrame:
    """Decode Maxwell envelopes into the same changelog contract as
    :func:`from_debezium` — downstream code cannot tell the formats apart.

    Differences handled here: the row image is always ``data`` (Maxwell
    sends the post-delete image there, not in ``old``); verbs are words
    (``insert``/``update``/``delete``, plus ``bootstrap-insert`` → insert);
    ``ts`` is SECONDS; ``xid`` (transaction id) stands in for the LSN as
    ``seq``. Same purity: one from_json projection, zero shuffle, NULL op
    for unknown verbs/corrupt JSON → merge quarantine.
    """
    env = maxwell_envelope_schema(row_schema)
    parsed = raw.select(
        *[F.col(c) for c in keep_cols],
        F.from_json(F.col(value_col), env).alias("e"),
    )
    t = F.col("e.type")
    op = (
        F.when(t.isin("insert", "bootstrap-insert"), "insert")
        .when(t == "update", "update")
        .when(t == "delete", "delete")
    )
    cols = [F.col("e.xid").alias("seq"), op.alias("op")]
    cols += [
        F.col("e.data").getField(f.name).alias(f.name)
        for f in row_schema.fields
    ]
    cols.append(F.timestamp_seconds(F.col("e.ts")).alias("ts"))
    return parsed.select(*cols, *[F.col(c) for c in keep_cols])


def maxwell_sql(row_cols: list[tuple[str, str]], source_expr: str) -> str:
    """DuckDB twin of :func:`from_maxwell` — see :func:`debezium_sql`."""
    fields = ", ".join(
        f"CAST(json_extract_string(json_extract(value, '$.data'), "
        f"'$.{name}') AS {typ}) AS {name}"
        for name, typ in row_cols
    )
    return f"""
SELECT CAST(json_extract_string(value, '$.xid') AS BIGINT) AS seq,
       CASE json_extract_string(value, '$.type')
            WHEN 'insert' THEN 'insert'
            WHEN 'bootstrap-insert' THEN 'insert'
            WHEN 'update' THEN 'update' WHEN 'delete' THEN 'delete' END AS op,
       {fields},
       to_timestamp(CAST(json_extract_string(value, '$.ts') AS BIGINT)) AS ts
FROM ({source_expr})"""


def canal_envelope_schema(row_schema: T.StructType) -> T.StructType:
    """Alibaba Canal's JSON envelope (the third common binlog-tail format,
    what Flink's ``canal-json`` consumes): ONE envelope carries an ARRAY of
    row images (``data``), an envelope-level verb (``type``), the binlog
    event time ``es`` (ms), processing time ``ts`` (ms), a batch ``id``,
    and ``isDdl``. Spec from the public Canal / Flink canal-json docs."""
    return T.StructType(
        [
            T.StructField("data", T.ArrayType(row_schema)),
            T.StructField("old", T.ArrayType(row_schema)),
            T.StructField("database", T.StringType()),
            T.StructField("table", T.StringType()),
            T.StructField("type", T.StringType()),
            T.StructField("es", T.LongType()),
            T.StructField("ts", T.LongType()),
            T.StructField("id", T.LongType()),
            T.StructField("isDdl", T.BooleanType()),
        ]
    )


def from_canal(
    raw: DataFrame,
    model: ModelSchema,
    row_schema: T.StructType,
    value_col: str = "value",
    keep_cols: "tuple[str, ...]" = (),
) -> DataFrame:
    """Decode Canal envelopes into the same changelog contract as
    :func:`from_debezium` / :func:`from_maxwell`.

    The structural difference: ``data`` is an ARRAY of row images, so the
    decode is ``from_json`` + one ``posexplode_outer`` (a Generate — still
    zero shuffle). Mapping:

    - ``seq`` = ``id * 2**20 + position`` — the batch id majorized by the
      row's position inside the envelope, preserving the binlog total
      order as the LWW tiebreak (Canal emits batch ids monotonically).
      The 2**20 multiplier gives each envelope ~1M positions: a Canal
      ``data`` array can't realistically exceed that (a 4096 multiplier
      would let a >4096-image envelope bleed into the next batch id's
      seq range and perturb the cross-envelope LWW order). Batch ids up
      to 2**43 still fit a long;
    - ``op``: INSERT/UPDATE/DELETE (envelope-level, applies to every row
      in ``data``); DDL envelopes (``isDdl`` or unmapped verbs) and
      corrupt JSON yield NULL ops → merge quarantine, never a drop
      (``posexplode_outer`` keeps envelopes whose ``data`` is NULL as one
      NULL row);
    - ``ts`` = ``es`` (the binlog event clock, not Canal's processing
      clock) — the LWW version.
    """
    env = canal_envelope_schema(row_schema)
    parsed = raw.select(
        *[F.col(c) for c in keep_cols],
        F.from_json(F.col(value_col), env).alias("e"),
    )
    exploded = parsed.select(
        *keep_cols, "e.type", "e.es", "e.id", "e.isDdl",
        F.posexplode_outer("e.data").alias("pos", "row"),
    )
    t = F.upper(F.col("type"))
    op = (
        F.when(F.col("isDdl"), F.lit(None).cast("string"))
        .when(t == "INSERT", "insert")
        .when(t == "UPDATE", "update")
        .when(t == "DELETE", "delete")
    )
    cols = [
        (F.col("id") * CANAL_SEQ_STRIDE
         + F.coalesce(F.col("pos"), F.lit(0))).alias("seq"),
        op.alias("op"),
    ]
    cols += [
        F.col("row").getField(f.name).alias(f.name) for f in row_schema.fields
    ]
    cols.append(F.timestamp_millis(F.col("es")).alias("ts"))
    return exploded.select(*cols, *[F.col(c) for c in keep_cols])


def canal_sql(row_cols: list[tuple[str, str]], source_expr: str) -> str:
    """DuckDB twin of :func:`from_canal` — unnests a row index over the
    ``data`` array length (coalesced to 1 so corrupt/DDL envelopes still
    yield their one NULL-op row, matching ``posexplode_outer``)."""
    img = "json_extract(value, '$.data[' || i || ']')"
    fields = ", ".join(
        f"CAST(json_extract_string({img}, '$.{name}') AS {typ}) AS {name}"
        for name, typ in row_cols
    )
    return f"""
SELECT CAST(json_extract_string(value, '$.id') AS BIGINT)
         * {CANAL_SEQ_STRIDE} + i AS seq,
       CASE WHEN coalesce(CAST(json_extract_string(value, '$.isDdl')
                               AS BOOLEAN), false) THEN NULL
            WHEN upper(json_extract_string(value, '$.type')) = 'INSERT'
              THEN 'insert'
            WHEN upper(json_extract_string(value, '$.type')) = 'UPDATE'
              THEN 'update'
            WHEN upper(json_extract_string(value, '$.type')) = 'DELETE'
              THEN 'delete' END AS op,
       {fields},
       epoch_ms(CAST(json_extract_string(value, '$.es') AS BIGINT)) AS ts
FROM (SELECT value,
             unnest(range(CAST(greatest(coalesce(
               json_array_length(json_extract(value, '$.data')), 1), 1)
               AS BIGINT))) AS i
      FROM ({source_expr}))"""


def wal2json_envelope_schema() -> T.StructType:
    """wal2json format-version-2 per-change message (Postgres logical
    decoding's most common JSON plugin; also what Debezium's
    ``pgoutput``-less deployments tail): one JSON document per row change
    with ``action`` (``I``/``U``/``D``, plus ``B``/``C`` transaction
    markers, ``T`` truncate, ``M`` message), a ``columns`` array of
    ``{name, type, value}`` entries (the new row image), an ``identity``
    array (the replica-identity/old-key image, what deletes carry),
    ``timestamp`` (text, with ``include-timestamp``) and ``lsn`` (text
    ``X/Y`` hex, with ``include-lsn``). Spec from the public wal2json
    README (https://github.com/eulerto/wal2json — format version 2).

    ``value`` is declared STRING: Spark's JSON parser renders any scalar
    token (number/bool/null) as its text for a StringType field, so the
    heterogeneous wal2json values decode losslessly and are cast to the
    model's types afterwards."""
    col_entry = T.ArrayType(
        T.StructType(
            [
                T.StructField("name", T.StringType()),
                T.StructField("type", T.StringType()),
                T.StructField("value", T.StringType()),
            ]
        )
    )
    return T.StructType(
        [
            T.StructField("action", T.StringType()),
            T.StructField("schema", T.StringType()),
            T.StructField("table", T.StringType()),
            T.StructField("columns", col_entry),
            T.StructField("identity", col_entry),
            T.StructField("timestamp", T.StringType()),
            T.StructField("lsn", T.StringType()),
        ]
    )


# an LSN is "X/Y" with both halves hex; anything else (or NULL) → NULL seq.
# The guard matters because F.conv maps garbage to 0, not NULL, and a
# spurious seq=0 would silently lose LWW tiebreaks instead of quarantining.
_LSN_RE = "^[0-9A-Fa-f]{1,8}/[0-9A-Fa-f]{1,8}$"


def _lsn_to_seq(lsn: Column) -> Column:
    hi = F.conv(F.split(lsn, "/").getItem(0), 16, 10).cast("long")
    lo = F.conv(F.split(lsn, "/").getItem(1), 16, 10).cast("long")
    return F.when(lsn.rlike(_LSN_RE), hi * F.lit(2 ** 32) + lo)


def from_wal2json(
    raw: DataFrame,
    model: ModelSchema,
    row_schema: T.StructType,
    value_col: str = "value",
    keep_cols: "tuple[str, ...]" = (),
) -> DataFrame:
    """Decode wal2json (format version 2) messages into the same changelog
    contract as :func:`from_debezium` — the fourth wire format, covering
    Postgres WAL tails that don't run a Kafka Connect stack.

    Structural differences handled here:

    - the row image is an ARRAY of ``{name, value}`` entries, not a typed
      struct → ``map_from_entries`` + per-column ``try_element_at`` +
      ``try_cast`` to the model type. ``try_*`` throughout: a missing
      column (wal2json omits unchanged TOAST values) or an unparsable
      value becomes NULL and flows to quarantine via the merge contract
      instead of throwing under Spark's default ANSI mode;
    - deletes carry the replica-identity image in ``identity`` (no
      ``columns``), so the image source switches on action ``D``;
    - transaction markers ``B``/``C`` and standalone ``M`` messages carry
      no row image and are FILTERED (they are framing, not changes);
      ``T`` (truncate) and unknown actions keep a NULL-op row →
      quarantine, and corrupt JSON (NULL action) is kept, never dropped;
    - ``seq`` = the LSN ``X/Y`` parsed as ``X * 2**32 + Y`` (Postgres'
      own byte-position encoding), the WAL total order; malformed LSNs
      yield NULL seq (see ``_LSN_RE``);
    - ``ts`` = ``try_to_timestamp`` of the textual commit timestamp
      (``include-timestamp`` format, e.g. ``2019-12-29 04:58:34.806671+00``).

    Pure projection (from_json + map build + casts): zero shuffle, batch
    and readStream alike.
    """
    env = wal2json_envelope_schema()
    parsed = raw.select(
        *[F.col(c) for c in keep_cols],
        F.from_json(F.col(value_col), env).alias("e"),
    )
    act = F.col("e.action")
    parsed = parsed.where(act.isNull() | ~act.isin("B", "C", "M"))
    img = F.when(act == "D", F.col("e.identity")).otherwise(F.col("e.columns"))
    m = F.map_from_entries(
        F.transform(img, lambda c: F.struct(c["name"], c["value"]))
    )
    op = (
        F.when(act == "I", "insert")
        .when(act == "U", "update")
        .when(act == "D", "delete")
    )
    cols = [_lsn_to_seq(F.col("e.lsn")).alias("seq"), op.alias("op")]
    cols += [
        F.try_element_at(m, F.lit(f.name)).try_cast(f.dataType).alias(f.name)
        for f in row_schema.fields
    ]
    cols.append(F.try_to_timestamp(F.col("e.timestamp")).alias("ts"))
    return parsed.select(*cols, *[F.col(c) for c in keep_cols])


def wal2json_sql(row_cols: list[tuple[str, str]], source_expr: str) -> str:
    """DuckDB twin of :func:`from_wal2json`. The ``json_valid`` guard
    mirrors PERMISSIVE from_json (corrupt → NULL row, kept — DuckDB's
    ``TRY_CAST(x AS JSON)`` still throws on malformed input, so it can't
    be used); the image lookup filters the columns/identity JSON array by
    entry name, exactly the ``map_from_entries`` + ``try_element_at``
    path."""
    img = (
        "CASE WHEN json_extract_string(j, '$.action') = 'D' "
        "THEN json_extract(j, '$.identity') "
        "ELSE json_extract(j, '$.columns') END"
    )
    fields = ", ".join(
        f"TRY_CAST(json_extract_string(list_filter(CAST({img} AS JSON[]), "
        f"x -> json_extract_string(x, '$.name') = '{name}')[1], "
        f"'$.value') AS {typ}) AS {name}"
        for name, typ in row_cols
    )
    return f"""
SELECT CASE WHEN regexp_matches(json_extract_string(j, '$.lsn'),
                                '{_LSN_RE}')
            THEN TRY_CAST('0x' || lower(split_part(
                   json_extract_string(j, '$.lsn'), '/', 1)) AS BIGINT)
                   * 4294967296
                 + TRY_CAST('0x' || lower(split_part(
                     json_extract_string(j, '$.lsn'), '/', 2)) AS BIGINT)
            END AS seq,
       CASE json_extract_string(j, '$.action')
            WHEN 'I' THEN 'insert' WHEN 'U' THEN 'update'
            WHEN 'D' THEN 'delete' END AS op,
       {fields},
       make_timestamp(epoch_us(TRY_CAST(json_extract_string(j, '$.timestamp')
                                        AS TIMESTAMPTZ))) AS ts
FROM (SELECT CASE WHEN json_valid(value) THEN CAST(value AS JSON) END AS j
      FROM ({source_expr}))
WHERE coalesce(json_extract_string(j, '$.action') NOT IN ('B', 'C', 'M'),
               TRUE)"""


def debezium_sql(
    row_cols: list[tuple[str, str]],
    source_expr: str,
    seq_expr: str | None = None,
) -> str:
    """DuckDB twin of :func:`from_debezium` over a relation with a JSON
    ``value`` column — for the driver's oracle gate. ``row_cols`` is
    ``[(name, duckdb_type), ...]`` of the row-image columns. ``seq_expr``
    overrides the seq source (default: the envelope LSN) — the twin of
    :func:`from_kafka`'s ``seq_source='offset'``, referencing any column
    of ``source_expr`` (e.g. a transport offset)."""
    image = (
        "CASE WHEN json_extract_string(value, '$.op') = 'd' "
        "THEN json_extract(value, '$.before') "
        "ELSE json_extract(value, '$.after') END"
    )
    fields = ", ".join(
        f"CAST(json_extract_string({image}, '$.{name}') AS {typ}) AS {name}"
        for name, typ in row_cols
    )
    seq = seq_expr or "CAST(json_extract_string(value, '$.source.lsn') AS BIGINT)"
    return f"""
SELECT {seq} AS seq,
       CASE json_extract_string(value, '$.op')
            WHEN 'c' THEN 'insert' WHEN 'r' THEN 'insert'
            WHEN 'u' THEN 'update' WHEN 'd' THEN 'delete' END AS op,
       {fields},
       epoch_ms(CAST(json_extract_string(value, '$.ts_ms') AS BIGINT)) AS ts
FROM ({source_expr})"""


def from_kafka(
    raw: DataFrame,
    model: ModelSchema,
    row_schema: T.StructType,
    envelope: str = "debezium",
    seq_source: str = "offset",
    value_col: str = "value",
    partition_col: str = "partition",
    offset_col: str = "offset",
) -> DataFrame:
    """Decode Kafka-shaped CDC records — the transport the binlog tail
    actually arrives on. ``raw`` has the Kafka source contract (binary
    ``value``, int ``partition``, long ``offset`` — exactly what
    ``spark.readStream.format("kafka")`` emits), carrying one of the
    supported envelope formats in ``value``.

    ``seq_source`` picks the LWW tiebreak:

    - ``'offset'`` (default): the transport offset. Debezium/Maxwell/Canal
      topics are keyed by primary key, so all changes to one key land in
      ONE partition where offsets are strictly monotone — exactly the
      per-key total order the merge's ``(ts, seq)`` tiebreak needs, and
      it survives connectors that emit no LSN (SQLite, some MySQL
      configs). For Canal (array-batched images) the offset majorizes the
      within-envelope position, preserving intra-envelope order:
      ``seq = offset * CANAL_SEQ_STRIDE + pos``.
    - ``'envelope'``: keep the envelope's own sequence (LSN / xid /
      binlog batch id) — the upstream log's order, preferable when one
      topic interleaves several tables and the connector preserves LSNs.

    Pure projection either way (one cast + one from_json + arithmetic);
    identical on batch frames and ``readStream``. Corrupt/unknown
    envelopes keep the NULL-op → quarantine contract of the per-format
    decoders.
    """
    decoders = {
        "debezium": from_debezium,
        "maxwell": from_maxwell,
        "canal": from_canal,
        "wal2json": from_wal2json,
    }
    if envelope not in decoders:
        raise ValueError(
            f"unknown envelope {envelope!r}; pick one of {sorted(decoders)}"
        )
    if seq_source not in ("offset", "envelope"):
        raise ValueError(
            f"unknown seq_source {seq_source!r}; 'offset' or 'envelope'"
        )
    # transport columns ride the decode under reserved names so a payload
    # field that happens to be called "partition" or "offset" (common for
    # queue/ledger tables) neither collides nor gets dropped
    vals = raw.select(
        F.col(value_col).cast("string").alias("__kafka_value"),
        F.col(partition_col).alias("__kafka_partition"),
        F.col(offset_col).alias("__kafka_offset"),
    )
    decoded = decoders[envelope](
        vals, model, row_schema, value_col="__kafka_value",
        keep_cols=("__kafka_partition", "__kafka_offset"),
    )
    if seq_source == "offset":
        off = F.col("__kafka_offset").cast("long")
        if envelope == "canal":
            # keep the decoder's within-envelope position (seq % STRIDE)
            # under the transport offset's majorization
            seq = off * CANAL_SEQ_STRIDE + F.pmod(
                F.col("seq"), F.lit(CANAL_SEQ_STRIDE)
            )
        else:
            seq = off
        decoded = decoded.withColumn("seq", seq)
    return decoded.drop("__kafka_partition", "__kafka_offset")
