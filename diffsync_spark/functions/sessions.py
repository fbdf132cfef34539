"""Gap-based sessionization of event/turn streams.

Training pipelines over agent transcripts and clickstreams segment a user's
event history into sessions: a new session starts wherever the gap to the
previous event exceeds a threshold. This is the classic two-window plan —

    lag(ts)  over (partition by key order by ts, tiebreak)   -> gap
    sum(gap > threshold) over (same spec, running)           -> session ordinal

Both windows share one partitioning and one sort, so the whole operator is
a single shuffle on the key columns followed by one in-partition sort; the
second WindowExec reuses the first's ordering (no extra exchange or sort —
verified via ``explain``). Hot keys cost one sorted partition each, same
skew profile as any per-key ordering; there is no global state, so it
scales linearly with executors.

Reference analog: none (the reference has no temporal surface); streaming
Spark offers ``F.session_window`` for the aggregated view — this operator
is the ROW-LEVEL labeling those aggregations can't give you (each event
keeps its payload plus its session id), and it is exactly SQL-expressible
for the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def sessionize(
    df: DataFrame,
    key_cols: tuple[str, ...],
    ts_col: str,
    gap_seconds: int,
    tiebreak_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Label each row with ``session_idx`` (1-based per-key session ordinal)
    and ``is_session_start``.

    A row starts a new session when it is the key's first event or when
    ``ts - previous ts >= gap_seconds``. Ordering inside a key is
    ``(ts, *tiebreak_cols)`` — pass a sequence column for full determinism
    when timestamps can tie.

    Boundary note: the rule is ``>=`` — an exact-to-the-microsecond gap of
    ``gap_seconds`` starts a NEW session, matching ``F.session_window``'s
    half-open ``[ts, ts+gap)`` window exactly, so the row-level labels here
    group-by to precisely the windows the streaming aggregation emits (the
    ``session_change_stats`` gate relies on this equivalence).
    """
    from pyspark.sql import Window

    order = [F.col(ts_col)] + [F.col(c) for c in tiebreak_cols]
    w = Window.partitionBy(*key_cols).orderBy(*order)
    prev_ts = F.lag(F.col(ts_col)).over(w)
    gap_us = F.unix_micros(F.col(ts_col).cast("timestamp")) - F.unix_micros(
        prev_ts.cast("timestamp")
    )
    start = F.when(
        prev_ts.isNull() | (gap_us >= gap_seconds * 1_000_000), 1
    ).otherwise(0)
    running = Window.partitionBy(*key_cols).orderBy(*order).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    out = df.withColumn("is_session_start", start.cast("boolean"))
    return out.withColumn(
        "session_idx",
        F.sum(F.col("is_session_start").cast("int")).over(running),
    )


def sessionize_sql(
    table_expr: str,
    key_cols: tuple[str, ...],
    ts_col: str,
    gap_seconds: int,
    tiebreak_cols: tuple[str, ...] = (),
    payload_cols: tuple[str, ...] = (),
) -> str:
    """DuckDB twin of :func:`sessionize` over ``table_expr`` — identical
    window semantics, for the driver's oracle gate. Spark orders ASC
    NULLS FIRST by default while DuckDB defaults to NULLS LAST, so the
    twin pins NULLS FIRST explicitly."""
    keys = ", ".join(key_cols)
    order = ", ".join(
        f"{c} NULLS FIRST" for c in (ts_col,) + tiebreak_cols
    )
    payload = "".join(f", {c}" for c in payload_cols)
    return f"""
WITH g AS (
  SELECT {keys}{payload}, {ts_col},
         CASE WHEN lag({ts_col}) OVER (PARTITION BY {keys} ORDER BY {order})
                   IS NULL
              OR epoch_us({ts_col}) -
                 epoch_us(lag({ts_col}) OVER (PARTITION BY {keys}
                                              ORDER BY {order}))
                 >= {gap_seconds} * 1000000
              THEN 1 ELSE 0 END AS st
  FROM ({table_expr}))
SELECT {keys}{payload}, {ts_col},
       CAST(st AS BOOLEAN) AS is_session_start,
       CAST(sum(st) OVER (PARTITION BY {keys} ORDER BY {order}
                          ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_idx
FROM g"""
