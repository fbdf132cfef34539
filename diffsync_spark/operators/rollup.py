"""Hierarchy roll-up — the reference's parent/child diff tree, set-based.

The reference recurses parent→child per pair (``/root/reference/diffsync/
helpers.py:236-281``) and rolls summary counts up the tree
(``diffsync/diff.py:110-131``). Our hierarchy is flat tables joined by the
parent key (SURVEY §1.1 _children), so the conversation-level view of a
turn-level diff is ONE aggregation by ``conv_id``.

Scale note: ``groupBy(parent_key)`` with algebraic aggregates gets map-side
partial aggregation from Spark automatically (HashAggregate partial → final),
so a hot conversation costs one partial row per input partition, not a
shuffled row per turn — no manual salting needed here. Salting is reserved
for non-algebraic aggs (e.g. collect_list), which we don't use.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from diffsync_spark.model import ModelSchema
from diffsync_spark.operators.diff import OPS


def rollup_diff(diff_df: DataFrame, model: ModelSchema) -> DataFrame:
    """Per-parent roll-up of a child-level diff frame.

    Output: parent key cols + ``op`` (the parent-level classification) +
    ``n_create/n_update/n_delete/n_noop``.

    Parent classification mirrors the reference's element semantics
    (``diff.py:236-254``) lifted one level: a conversation whose turns are all
    creates (it has no presence in the target) is itself a create; all deletes
    → delete; any actionable child → update; else noop.
    """
    parent = list(model.parent_key or model.identifiers)
    counts = diff_df.groupBy(*parent).agg(
        *[
            F.coalesce(F.sum(F.when(F.col("op") == o, 1)), F.lit(0)).alias(f"n_{o}")
            for o in OPS
        ]
    )
    n = [F.col(f"n_{o}") for o in OPS]
    total = n[0] + n[1] + n[2] + n[3]
    parent_op = (
        F.when(F.col("n_create") == total, "create")
        .when(F.col("n_delete") == total, "delete")
        .when((F.col("n_create") + F.col("n_update") + F.col("n_delete")) > 0, "update")
        .otherwise("noop")
    )
    return counts.select(*parent, parent_op.alias("op"), *[f"n_{o}" for o in OPS])


def stable_turn_order(df: DataFrame, model: ModelSchema) -> DataFrame:
    """Deterministic turn ordering: rank within each conversation by
    ``(turn_idx, ts)`` — the stable ordering the BASELINE per-turn equality
    check is defined over (reference analog: ``order_children_default``
    insertion order, ``diffsync/diff.py:102-108``)."""
    from pyspark.sql import Window

    parent = list(model.parent_key or model.identifiers[:-1])
    order_cols = [c for c in model.identifiers if c not in parent] + list(
        model.version_cols
    )
    w = Window.partitionBy(*parent).orderBy(*order_cols)
    return df.withColumn("turn_rank", F.row_number().over(w))


def order_elements(diff_df: DataFrame, model: ModelSchema) -> DataFrame:
    """Total ordering of diff elements by ``(type, name)`` — the reference's
    ``DiffElement.__lt__`` (``diffsync/diff.py:199-204``), where ``type`` is
    the model name and ``name`` the shortname. One model per frame makes
    ``type`` constant, so the order key is (shortname, uid-tiebreak); emits
    ``element_rank``.

    Scale note: a TOTAL order is inherently a global sort. The rank window
    here is unpartitioned (single-partition WindowExec) — this op is for
    deterministic exports/renders like the reference's sorted tree walk, at
    export scale. The MERGE path never needs a total order (atomic set
    apply), so this is deliberately not on the hot path.
    """
    from pyspark.sql import Window

    w = Window.orderBy(
        F.lit(model.name), model.shortname_col(), model.uid_col()
    )
    return diff_df.withColumn("element_rank", F.row_number().over(w))


def order_by_action(diff_df: DataFrame) -> DataFrame:
    """Order a diff frame by CRUD action (create → update → delete → noop) then
    key — the reference's custom-Diff ordering example
    (``/root/reference/examples/01-multiple-data-sources/main.py:31-39``,
    ``docs/source/core_engine/02-customize-diff-class.md:29-56``). Within one
    MERGE ordering is irrelevant (atomic set apply); this exists for
    deterministic exports/renders."""
    action_rank = (
        F.when(F.col("op") == "create", 0)
        .when(F.col("op") == "update", 1)
        .when(F.col("op") == "delete", 2)
        .otherwise(3)
    )
    other = [c for c in diff_df.columns if c != "op"]
    return diff_df.orderBy(action_rank, *[c for c in other if c not in
                                          ("changed_cols", "before", "after")])
