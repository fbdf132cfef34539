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
    attr_cols = model.payload_attrs_in(df)
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


# --------------------------------------------------------- debug renders
_TEE, _LAST, _BRANCH, _SPACE = "├── ", "└── ", "│   ", "    "


def _tree_lines(data: dict, prefix: str = ""):
    """Box-drawing tree walk — the reference's `_tree` generator shape
    (``diffsync/utils.py:59-73``) over a plain nested dict."""
    pointers = [_TEE] * (len(data) - 1) + [_LAST]
    for pointer, key in zip(pointers, data):
        yield prefix + pointer + str(key)
        if isinstance(data[key], dict) and data[key]:
            ext = _BRANCH if pointer == _TEE else _SPACE
            yield from _tree_lines(data[key], prefix + ext)


def tree_string(data: dict, root: str) -> str:
    """Render a nested dict as a box-drawing tree (reference
    ``utils.tree_string``, ``diffsync/utils.py:75-77``)."""
    return "\n".join([root, *_tree_lines(data)])


def get_tree_traversal(
    parent: ModelSchema, child: ModelSchema, as_dict: bool = False
):
    """Model-hierarchy traversal description (reference
    ``Adapter.get_tree_traversal``, ``__init__.py:794-818``). Two-level by
    construction: children live in their own FK'd table."""
    out = {parent.name: {child.name: {}}}
    if as_dict:
        return out
    return tree_string(out, "hierarchy")


def record_str(row, model: ModelSchema, indent: int = 0) -> str:
    """One-record detail render (reference ``DiffSyncModel.str``,
    ``__init__.py:183-201``): ``type: uid: {attrs}``. ``row`` is a Row or
    dict from a collect() — driver-side, for eyeballs."""
    d = row.asDict() if hasattr(row, "asDict") else dict(row)
    uid = "__".join(str(d.get(k)) for k in model.identifiers)
    attrs = {a: d.get(a) for a in model.attributes if a in d}
    return f"{' ' * indent}{model.name}: {uid}: {attrs}"


def store_tree_string(
    df: DataFrame, model: ModelSchema, limit: int = 30
) -> str:
    """Render the store grouped parent → children (reference ``Adapter.str``
    with ``_children`` walk, ``__init__.py:820-837``). Collects at most
    ``limit`` parent groups — a debug view, never a pipeline step."""
    if not model.parent_key:
        rows = df.limit(limit).collect()
        return "\n".join(record_str(r, model) for r in rows)
    parents = [
        tuple(r.asDict()[k] for k in model.parent_key)
        for r in df.select(*model.parent_key).distinct().orderBy(
            *model.parent_key
        ).limit(limit).collect()
    ]
    cond = None
    for i, k in enumerate(model.parent_key):
        c = F.col(k).isin([p[i] for p in parents])
        cond = c if cond is None else cond & c
    rows = df.filter(cond).orderBy(*model.identifiers).collect()
    tree: dict = {}
    for r in rows:
        d = r.asDict()
        pkey = "/".join(str(d[k]) for k in model.parent_key)
        tree.setdefault(pkey, {})[record_str(r, model).strip()] = {}
    return tree_string(tree, model.name)
