"""Sequence assembly and text chunking — turning row-level data into
training examples.

``assemble_sequences`` is the transcript-pipeline workhorse: collapse a
keyed, ordered event/turn stream into one ordered sequence per key
(conversation → its turns in stable order). Determinism does not come from
``collect_list`` (whose order is partition-arbitrary) but from sorting the
collected ``(order_key, payload)`` structs with ``array_sort`` — a
JVM-side, codegen'd operation — then projecting the payload out. One
shuffle on the key columns; a hot key costs one array in one task, bounded
by ``max_items``.

``chunk_text`` goes the other way: split long documents into fixed-size,
overlapping character chunks with deterministic ``(doc_id, chunk_idx)``
identity — ``sequence()`` + ``substring``, pure column expressions, no
Python and no shuffle (the explode multiplies rows in place).

Reference analog: none; SURVEY §2.13 family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F, types as T


def assemble_sequences(
    df: DataFrame,
    key_cols: tuple[str, ...],
    order_cols: tuple[str, ...],
    payload_col: str,
    max_items: int | None = None,
) -> DataFrame:
    """One row per key: ``items`` = payload values in ``order_cols`` order,
    plus ``n_items`` and ``n_total`` (the true pre-truncation count).
    ``max_items`` keeps only the FIRST n in sequence order (head
    truncation, the usual context-window rule) and genuinely bounds
    per-key memory: the rank filter is pruned map-side by Spark's
    WindowGroupLimit BEFORE the shuffle, so a 10M-event hot key ships and
    collects only ``max_items`` rows, not 10M.

    Scale: without ``max_items``, a single hash aggregation (map-side
    partial ``collect_list``, one ``array_sort`` per key reduce-side).
    With it, the rank window, the aggregation, and the count join all
    hash-partition on the key columns — the payload crosses the wire
    once (pruned), and the extra count exchange carries one row per
    (key, input partition).
    """
    key_struct = F.struct(*[F.col(c) for c in order_cols])
    packed = F.array_sort(
        F.collect_list(F.struct(key_struct.alias("k"),
                                F.col(payload_col).alias("v")))
    )
    items = F.transform(packed, lambda x: x["v"])
    if max_items is None:
        out = df.groupBy(*key_cols).agg(
            items.alias("items"), F.count(F.lit(1)).alias("n_total")
        )
    else:
        from pyspark.sql import Window

        w = Window.partitionBy(*key_cols).orderBy(
            *[F.col(c) for c in order_cols]
        )
        pruned = (
            df.withColumn("__rank", F.row_number().over(w))
            .filter(F.col("__rank") <= max_items)
            .drop("__rank")
        )
        # true pre-truncation count: map-side partial agg ships one row
        # per (key, input-partition) — never the payload. The join back is
        # NULL-SAFE per key column: a NULL-key group is a group in the
        # max_items=None path (groupBy keeps it), so it must survive here
        # too — plain equality would silently drop it.
        counts = df.groupBy(*key_cols).agg(
            F.count(F.lit(1)).alias("n_total")
        ).select(
            *[F.col(c).alias(f"__k_{c}") for c in key_cols], "n_total"
        )
        agg = pruned.groupBy(*key_cols).agg(items.alias("items"))
        cond = None
        for c in key_cols:
            clause = agg[c].eqNullSafe(F.col(f"__k_{c}"))
            cond = clause if cond is None else cond & clause
        out = agg.join(counts, cond).drop(*[f"__k_{c}" for c in key_cols])
    return out.withColumn("n_items", F.array_size("items"))


def chunk_text(
    df: DataFrame,
    text_col: str = "text",
    chunk_chars: int = 512,
    overlap: int = 64,
) -> DataFrame:
    """Explode each document into overlapping character chunks.

    Output adds ``chunk_idx`` (0-based), ``chunk`` (the text slice), and
    ``n_chunks``. Stride is ``chunk_chars - overlap``; the last chunk may
    be shorter; empty/NULL text yields zero chunks. Identity is
    deterministic — re-running produces the same (row, chunk_idx) pairs,
    so chunk-level dedup and joins are stable.

    Pure column expressions (``sequence`` + ``substring``); the explode is
    a Generate node, no shuffle, and fuses with downstream projections.
    """
    if not 0 <= overlap < chunk_chars:
        raise ValueError(
            f"overlap ({overlap}) must be in [0, chunk_chars={chunk_chars})"
        )
    stride = chunk_chars - overlap
    n = F.length(F.col(text_col))
    n_chunks = F.when(
        n.isNull() | (n == 0), F.lit(0)
    ).otherwise(F.floor((n - F.lit(overlap + 1)) / stride) + 1).cast("int")
    out = df.withColumn("n_chunks", F.greatest(n_chunks, F.when(n > 0, 1)))
    # guard: sequence(0, -1) DESCENDS in Spark; empty docs need an empty
    # array so explode drops them
    idx = F.when(
        F.col("n_chunks") > 0, F.sequence(F.lit(0), F.col("n_chunks") - 1)
    ).otherwise(F.expr("array()").cast("array<int>"))
    out = out.withColumn("chunk_idx", F.explode(idx))
    return out.withColumn(
        "chunk",
        F.substring(F.col(text_col), F.col("chunk_idx") * stride + 1, chunk_chars),
    )


def pack_sequences(
    df: DataFrame,
    size_col: str,
    budget: int,
    bucket_col: str,
    order_cols: tuple[str, ...],
) -> DataFrame:
    """Greedy next-fit sequence packing: within each bucket, walk rows in
    ``order_cols`` order accumulating ``size_col``; when adding a row would
    exceed ``budget``, start a new pack. Adds ``pack_id`` (0-based per
    bucket) and ``pack_fill`` (running size of the row's pack after the
    row). A single row larger than the budget still gets its own pack.

    Next-fit is a non-associative prefix scan — no window function can
    express the reset — so this is the one assembly op that runs Python:
    an Arrow-batched ``applyInPandas`` per bucket. Packing parallelism IS
    the bucket count: buckets are independent, each group is one task, and
    the scan inside is a trivial O(rows) loop over already-columnar data.
    Choose the bucket column so buckets bound group size (e.g.
    ``doc_id % 1024`` at corpus scale).
    """
    import pandas as pd

    out_schema = T.StructType(
        list(df.schema.fields)
        + [
            T.StructField("pack_id", T.LongType()),
            T.StructField("pack_fill", T.LongType()),
        ]
    )

    order = list(order_cols)

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order, kind="stable").reset_index(drop=True)
        sizes = pdf[size_col].to_numpy()
        pack_ids = [0] * len(pdf)
        fills = [0] * len(pdf)
        pid, fill = 0, 0
        for i, s in enumerate(sizes):
            s = int(s)
            if fill > 0 and fill + s > budget:
                pid += 1
                fill = 0
            fill += s
            pack_ids[i] = pid
            fills[i] = fill
        pdf["pack_id"] = pack_ids
        pdf["pack_fill"] = fills
        return pdf

    return df.groupBy(bucket_col).applyInPandas(pack, schema=out_schema)


def pack_sql(
    table_expr: str,
    size_col: str,
    budget: int,
    bucket_col: str,
    order_cols: tuple[str, ...],
    payload_cols: tuple[str, ...] = (),
) -> str:
    """DuckDB twin of :func:`pack_sequences` via a recursive CTE (the scan
    is sequential per bucket; the recursion steps once per row rank)."""
    order = ", ".join(order_cols)
    payload = "".join(f", {c}" for c in payload_cols)
    # items MATERIALIZED: the recursive `packed` CTE references it once per
    # recursion step (max per-bucket rank), and DuckDB would otherwise
    # re-evaluate the whole source expression each step — fatal when the
    # source is itself an expensive pipeline (measured 462s -> 7.7s on the
    # composed pipeline gate at sf0.01)
    return f"""
WITH RECURSIVE items AS MATERIALIZED (
  SELECT {bucket_col} AS bkt, {size_col} AS sz{payload},
         row_number() OVER (PARTITION BY {bucket_col}
                            ORDER BY {order}) AS rn
  FROM ({table_expr})),
packed AS (
  SELECT bkt, rn, sz{payload},
         CAST(0 AS BIGINT) AS pack_id, CAST(sz AS BIGINT) AS pack_fill
  FROM items WHERE rn = 1
  UNION ALL
  SELECT i.bkt, i.rn, i.sz{"".join(f", i.{c}" for c in payload_cols)},
         CASE WHEN p.pack_fill > 0 AND p.pack_fill + i.sz > {budget}
              THEN p.pack_id + 1 ELSE p.pack_id END,
         CASE WHEN p.pack_fill > 0 AND p.pack_fill + i.sz > {budget}
              THEN CAST(i.sz AS BIGINT) ELSE p.pack_fill + i.sz END
  FROM items i JOIN packed p ON i.bkt = p.bkt AND i.rn = p.rn + 1)
SELECT bkt{payload}, sz, pack_id, pack_fill FROM packed"""


def assemble_sql(
    table_expr: str,
    key_cols: tuple[str, ...],
    order_cols: tuple[str, ...],
    payload_col: str,
    sep: str = "\x1f",
) -> str:
    """DuckDB twin of :func:`assemble_sequences`, flattened to a separator
    join of the ordered payload (array<->engine comparisons are fragile;
    the joined string is the portable signature)."""
    keys = ", ".join(key_cols)
    order = ", ".join(order_cols)
    return f"""
SELECT {keys},
       string_agg({payload_col}, '{sep}' ORDER BY {order}) AS seq_sig,
       CAST(count(*) AS BIGINT) AS n_total
FROM ({table_expr}) GROUP BY {keys}"""
