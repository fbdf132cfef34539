"""Dataset profiling — the health-check pass a pipeline runs before and
after every transformation stage.

One aggregation pass over the frame produces one row per column: null
rate, distinct count (exact or HLL sketch), min/max (orderable types),
and mean length (strings). All metrics for all columns compute in a
SINGLE job — a multi-aggregate over the full frame with map-side partial
aggregation — not one job per column; at 100 TB the scan dominates, so
one pass is the difference between usable and not.

Reference analog: none; SURVEY §2.13 family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


_ORDERABLE = {"int", "bigint", "smallint", "tinyint", "float", "double",
              "decimal", "date", "timestamp", "timestamp_ntz", "string"}


def profile(df: DataFrame, exact_distinct: bool = False) -> DataFrame:
    """One row per column: ``column, n_rows, n_nulls, null_frac,
    n_distinct, min_str, max_str, avg_len``.

    ``exact_distinct=False`` (default) uses ``approx_count_distinct``
    (HyperLogLog++, mergeable sketch — the 100 TB path);
    ``exact_distinct=True`` is for small frames and oracle parity.
    Min/max are cast to strings so heterogeneous columns fit one output
    schema; non-orderable columns (arrays, structs, binary) report NULL.
    """
    n = F.count(F.lit(1))
    aggs = [n.alias("__n")]
    cols = df.columns
    dtypes = dict(df.dtypes)
    for c in cols:
        typ = dtypes[c].split("(")[0]
        aggs.append(F.count(F.when(F.col(c).isNull(), 1)).alias(f"__nn_{c}"))
        if exact_distinct:
            aggs.append(F.count_distinct(F.col(c)).alias(f"__nd_{c}"))
        else:
            aggs.append(F.approx_count_distinct(c).alias(f"__nd_{c}"))
        if typ in _ORDERABLE:
            aggs.append(F.min(c).cast("string").alias(f"__mn_{c}"))
            aggs.append(F.max(c).cast("string").alias(f"__mx_{c}"))
        else:
            aggs.append(F.lit(None).cast("string").alias(f"__mn_{c}"))
            aggs.append(F.lit(None).cast("string").alias(f"__mx_{c}"))
        if typ == "string":
            aggs.append(F.avg(F.length(c)).alias(f"__al_{c}"))
        else:
            aggs.append(F.lit(None).cast("double").alias(f"__al_{c}"))
    row = df.agg(*aggs)
    per_col = [
        F.struct(
            F.lit(c).alias("column"),
            F.col("__n").alias("n_rows"),
            F.col(f"__nn_{c}").alias("n_nulls"),
            (F.col(f"__nn_{c}") / F.col("__n")).alias("null_frac"),
            F.col(f"__nd_{c}").alias("n_distinct"),
            F.col(f"__mn_{c}").alias("min_str"),
            F.col(f"__mx_{c}").alias("max_str"),
            F.col(f"__al_{c}").alias("avg_len"),
        )
        for c in cols
    ]
    return row.select(
        F.explode(F.array(*per_col)).alias("p")
    ).select("p.*")


def profile_sql(table_expr: str, columns: list[tuple[str, str]]) -> str:
    """DuckDB twin of :func:`profile(exact_distinct=True)`.
    ``columns`` is ``[(name, general_type)]`` with general_type one of
    ``orderable`` / ``string`` / ``other``."""
    parts = []
    for name, gtyp in columns:
        mn = (f"CAST(min({name}) AS VARCHAR)" if gtyp in ("orderable", "string")
              else "CAST(NULL AS VARCHAR)")
        mx = (f"CAST(max({name}) AS VARCHAR)" if gtyp in ("orderable", "string")
              else "CAST(NULL AS VARCHAR)")
        al = (f"avg(length({name}))" if gtyp == "string"
              else "CAST(NULL AS DOUBLE)")
        parts.append(f"""
  SELECT '{name}' AS "column", count(*) AS n_rows,
         CAST(count(*) - count({name}) AS BIGINT) AS n_nulls,
         (count(*) - count({name})) * 1.0 / count(*) AS null_frac,
         CAST(count(DISTINCT {name}) AS BIGINT) AS n_distinct,
         {mn} AS min_str, {mx} AS max_str, {al} AS avg_len
  FROM ({table_expr})""")
    return " UNION ALL ".join(parts)
