"""Keyed-store access operators (reference BaseStore/LocalStore surface).

The reference's store is ``dict[modelname][uid] -> object`` with point
lookups, scans, bulk fetch, and counts (``/root/reference/diffsync/store/local.py``).
Here the "store" is any keyed DataFrame; each access shape maps to the
Catalyst plan that scales:

- point lookup  → key-equality filter (partition/file pruning + pushdown)
- bulk lookup   → broadcast semi/inner join on a keys frame, never a loop
- scan / count  → the DataFrame itself / ``count()``

These are thin by design — the point is the mapping, documented per-op.
"""

from __future__ import annotations

from typing import Any, Sequence

from pyspark.sql import DataFrame, functions as F

from diffsync_spark.errors import ObjectNotFound
from diffsync_spark.model import ModelSchema


def _key_filter(model: ModelSchema, key: Sequence[Any]):
    if len(key) != len(model.identifiers):
        raise ValueError(
            f"{model.name}: key {key!r} does not match identifiers {model.identifiers}"
        )
    cond = F.lit(True)
    for c, v in zip(model.identifiers, key):
        cond = cond & (F.col(c) == F.lit(v))
    return cond


def get(df: DataFrame, model: ModelSchema, key: Sequence[Any]) -> dict:
    """Point lookup; raises ObjectNotFound on miss.

    Reference ``store.get`` (``store/local.py:30-49``). Driver-side by nature
    (returns one record); the filter pushes down to the scan.
    """
    rows = df.filter(_key_filter(model, key)).take(1)
    if not rows:
        raise ObjectNotFound(f"{model.name} {tuple(key)!r} not found")
    return rows[0].asDict()


def get_or_none(df: DataFrame, model: ModelSchema, key: Sequence[Any]) -> dict | None:
    """Point lookup returning None on miss — reference ``get_or_none``
    (``__init__.py:745-765``)."""
    rows = df.filter(_key_filter(model, key)).take(1)
    return rows[0].asDict() if rows else None


def get_all(df: DataFrame, model: ModelSchema) -> DataFrame:
    """Full scan of one model — reference ``store.get_all``
    (``store/local.py:51-65``). Ordered by identifiers for determinism
    (the reference returns insertion order)."""
    return df.orderBy(*model.identifiers)


def get_by_uids(
    df: DataFrame, model: ModelSchema, keys: Sequence[Sequence[Any]]
) -> DataFrame:
    """Multi-point lookup preserving request order; raises if any key is
    missing — reference ``store.get_by_uids`` (``store/local.py:67-89``).

    Set-based: the request keys become a broadcast frame joined inner on the
    natural key with an order column; the missing check is one anti-join
    count, not N probes.
    """
    spark = df.sparkSession
    key_rows = [tuple(k) + (i,) for i, k in enumerate(keys)]
    keys_df = spark.createDataFrame(
        key_rows, list(model.identifiers) + ["__req_order"]
    )
    missing = keys_df.join(df, on=list(model.identifiers), how="left_anti")
    miss_rows = missing.take(1)
    if miss_rows:
        raise ObjectNotFound(
            f"{model.name}: requested key "
            f"{tuple(miss_rows[0][c] for c in model.identifiers)!r} not found"
        )
    return (
        df.join(F.broadcast(keys_df), on=list(model.identifiers), how="inner")
        .orderBy("__req_order")
        .drop("__req_order")
    )


def count(df: DataFrame) -> int:
    """Store size — reference ``store.count`` / ``Adapter.__len__``
    (``store/local.py:136-145``, ``__init__.py:508-510``)."""
    return df.count()
