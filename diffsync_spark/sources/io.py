"""Sources, exports and renders — the reference's load/dict/str surface.

- ``load()`` hook → ``read_snapshot`` (any spark.read format)
  (``/root/reference/diffsync/__init__.py:532-534``)
- ``load_from_dict`` → ``load_from_records``
  (``__init__.py:561-571``)
- ``Adapter.dict()`` / ``Model.dict()/json()`` → ``to_nested_dict`` /
  ``diff_to_json`` (``__init__.py:536-543, 169-181``)
- ``Diff.str()`` render → ``diff_str`` (``diffsync/diff.py:133-148, 356-378``)

Exports/renders are debug-scale by contract (they collect); the scale paths
are parquet/table reads and the diff frame itself.
"""

from __future__ import annotations

from typing import Any, Iterable, Mapping

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T

from diffsync_spark.model import ModelSchema

CHANGELOG_SCHEMA = T.StructType(
    [
        T.StructField("seq", T.LongType()),
        T.StructField("op", T.StringType()),
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("role", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("tool", T.StringType()),
        T.StructField("ts", T.TimestampType()),
    ]
)


def read_snapshot(
    spark: SparkSession, path: str, fmt: str = "parquet", schema=None
) -> DataFrame:
    """Adapter.load(): populate from any backend — here any Spark source.
    Explicit schema recommended (no inference cost, stable evolution)."""
    reader = spark.read.format(fmt)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.load(path)


def read_changelog(spark: SparkSession, path: str, schema=CHANGELOG_SCHEMA) -> DataFrame:
    """Batch read of a changelog directory (the binlog/WAL-segment stand-in)."""
    return spark.read.schema(schema).parquet(path)


def load_from_records(
    spark: SparkSession, records: Iterable[Mapping[str, Any]], schema
) -> DataFrame:
    """``load_from_dict``: bulk-load python records with an explicit schema.
    The reference's dependency-order concern (parents before children,
    ``__init__.py:561-571``) vanishes — rows are unordered, hierarchy is a
    join key."""
    return spark.createDataFrame(list(records), schema)


def to_nested_dict(df: DataFrame, model: ModelSchema, max_rows: int = 100_000) -> dict:
    """``Adapter.dict()`` export: ``{model: {uid: {attrs...}}}``
    (``__init__.py:536-543``). Debug-scale: collects; guarded by max_rows."""
    n = df.limit(max_rows + 1).count()
    if n > max_rows:
        raise ValueError(f"to_nested_dict is a debug export; {n} rows > {max_rows}")
    uid = model.uid_col().alias("__uid")
    attr_cols = model.attrs_in(df)
    out: dict[str, dict] = {}
    for row in df.select(uid, *attr_cols).collect():
        d = row.asDict()
        out[d.pop("__uid")] = d
    return {model.name: out}


def diff_to_json(diff_df: DataFrame) -> DataFrame:
    """Per-row JSON render of a diff frame —
    ``DiffElement.dict()``'s ``{"+": ..., "-": ...}`` shape
    (``diffsync/diff.py:380-390``) as a column, computed JVM-side."""
    return diff_df.withColumn(
        "json",
        F.to_json(
            F.struct(
                F.col("op"),
                F.col("changed_cols"),
                F.col("before").alias("-"),
                F.col("after").alias("+"),
            )
        ),
    )


def diff_str(diff_df: DataFrame, model: ModelSchema, limit: int = 50) -> str:
    """Human-readable diff render — ``Diff.str()``
    (``diffsync/diff.py:133-148``). Driver-side formatting of a limited
    collect; for eyeballs, not pipelines."""
    rows = (
        diff_df.filter(F.col("op") != "noop")
        .withColumn("__uid", model.uid_col())
        .orderBy("op", "__uid")
        .limit(limit)
        .collect()
    )
    lines = [f"{model.name}"]
    for r in rows:
        lines.append(f"  {r['__uid']}: {r.op}")
        before = r.before.asDict() if r.before is not None else {}
        after = r.after.asDict() if r.after is not None else {}
        for c in r.changed_cols or sorted(set(before) | set(after)):
            if c in after and r.op != "delete":
                lines.append(f"    + {c}: {after.get(c)!r}")
            if c in before and r.op != "create":
                lines.append(f"    - {c}: {before.get(c)!r}")
    return "\n".join(lines)
