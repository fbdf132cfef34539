from __future__ import annotations

import pandas as pd

from diffsync_spark import diff
from diffsync_spark.model import TRANSCRIPT_MODEL
from diffsync_spark.operators.rollup import order_by_action, rollup_diff, stable_turn_order
from diffsync_spark.sources.io import diff_str, diff_to_json, to_nested_dict


def test_rollup_counts_and_parent_op(spark, source_df, target_df):
    d = diff(source_df, target_df, TRANSCRIPT_MODEL)
    r = rollup_diff(d, TRANSCRIPT_MODEL).toPandas().set_index("conv_id")
    dd = d.toPandas()
    want = dd.groupby("conv_id")["op"].value_counts().unstack(fill_value=0)
    for conv, row in r.iterrows():
        for o in ("create", "update", "delete", "noop"):
            assert row[f"n_{o}"] == (want.loc[conv][o] if o in want.columns else 0)
    # conversations only in source → all-create → parent op 'create'
    all_create = r[(r.n_create > 0) & (r.n_update + r.n_delete + r.n_noop == 0)]
    assert (all_create["op"] == "create").all() and len(all_create) >= 5
    all_noop = r[(r.n_noop > 0) & (r.n_create + r.n_update + r.n_delete == 0)]
    assert (all_noop["op"] == "noop").all()


def test_stable_turn_order(spark, source_df):
    ranked = stable_turn_order(source_df, TRANSCRIPT_MODEL).toPandas()
    g = ranked.sort_values(["conv_id", "turn_idx"]).groupby("conv_id")["turn_rank"]
    for _, ranks in g:
        assert list(ranks) == list(range(1, len(ranks) + 1))


def test_order_by_action(spark, source_df, target_df):
    d = diff(source_df, target_df, TRANSCRIPT_MODEL)
    ops = [r.op for r in order_by_action(d).select("op").collect()]
    order = {"create": 0, "update": 1, "delete": 2, "noop": 3}
    assert ops == sorted(ops, key=order.get)


def test_exports(spark, source_df):
    small = source_df.limit(5)
    d = to_nested_dict(small, TRANSCRIPT_MODEL)
    assert set(d) == {"turn"}
    assert len(d["turn"]) == 5
    uid, rec = next(iter(d["turn"].items()))
    assert "__" in uid and set(rec) >= {"role", "text", "tool"}

    diff_df = diff(source_df, source_df.limit(10), TRANSCRIPT_MODEL)
    j = diff_to_json(diff_df).filter("op = 'create'").first()
    assert '"op":"create"' in j.json and '"+"' in j.json
    s = diff_str(diff_df, TRANSCRIPT_MODEL, limit=5)
    assert "create" in s and s.startswith("turn")


def test_debug_renders(spark, source_df):
    """tree/record renders — reference Adapter.str / Model.str /
    get_tree_traversal (O5/R4/R5)."""
    from diffsync_spark.model import CONVERSATION_MODEL
    from diffsync_spark.sources.io import (
        get_tree_traversal,
        record_str,
        store_tree_string,
        tree_string,
    )

    t = get_tree_traversal(CONVERSATION_MODEL, TRANSCRIPT_MODEL, as_dict=True)
    assert t == {"conversation": {"turn": {}}}
    rendered = get_tree_traversal(CONVERSATION_MODEL, TRANSCRIPT_MODEL)
    assert "└── turn" in rendered and rendered.startswith("hierarchy")

    row = source_df.first()
    line = record_str(row, TRANSCRIPT_MODEL)
    assert line.startswith(f"turn: {row.conv_id}__{row.turn_idx}:")
    assert "'role'" in line

    s = store_tree_string(source_df, TRANSCRIPT_MODEL, limit=2)
    assert s.startswith("turn") and "├── " in s or "└── " in s
    assert tree_string({"a": {"b": {}}}, "r") == "r\n└── a\n    └── b"
