"""Two-table hierarchy sync: deletion ordering (NATURAL_DELETION_ORDER),
per-model flag overrides, and parent→child cascade — mirrors reference
tests/unit/test_diffsync_model_flags.py:119-165."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from diffsync_spark.engine import Engine
from diffsync_spark.flags import DiffFlags
from diffsync_spark.model import ModelSchema, TRANSCRIPT_MODEL
from diffsync_spark.operators.hierarchy import HierarchySync

CONV_MODEL = ModelSchema(
    name="conversation",
    identifiers=("conv_id",),
    attributes=("n_turns",),
)


def _parent_of(child_df):
    return child_df.groupBy("conv_id").agg(F.count("*").alias("n_turns"))


@pytest.fixture()
def hier(spark, tmp_path, target_df):
    child = Engine.create(spark, str(tmp_path / "turns"), TRANSCRIPT_MODEL,
                          schema=target_df.schema, n_buckets=4)
    child.table.merge(target_df.withColumn("op", F.lit("insert")),
                      mode="force", checkpoint_id="boot", batch_id=0)
    pdf = _parent_of(target_df)
    parent = Engine.create(spark, str(tmp_path / "convs"), CONV_MODEL,
                           schema=pdf.schema, n_buckets=4)
    parent.table.merge(pdf.withColumn("op", F.lit("insert")),
                       mode="force", checkpoint_id="boot", batch_id=0)
    return parent, child


def _drop_one_conv(target_df):
    victim = target_df.first().conv_id
    child_src = target_df.filter(F.col("conv_id") != victim)
    return victim, child_src, _parent_of(child_src)


def test_natural_deletion_order(hier, target_df):
    """Child deletes commit BEFORE the parent bookkeeping delete
    (reference helpers.py:367-378)."""
    parent, child = hier
    victim, child_src, parent_src = _drop_one_conv(target_df)
    hs = HierarchySync(parent, child,
                       DiffFlags(natural_deletion_order=True))
    steps = hs.sync_from(parent_src, child_src, batch_id=1)
    order = [s for s, _ in steps]
    assert order.index("child_delete") < order.index("parent_delete")
    assert hs.converged(parent_src, child_src)
    assert child.read().filter(F.col("conv_id") == victim).count() == 0
    assert parent.read().filter(F.col("conv_id") == victim).count() == 0


def test_legacy_deletion_order(hier, target_df):
    """Without the flag, the reference's default order: parent first."""
    parent, child = hier
    _, child_src, parent_src = _drop_one_conv(target_df)
    steps = HierarchySync(parent, child, DiffFlags()).sync_from(
        parent_src, child_src, batch_id=1)
    order = [s for s, _ in steps]
    assert order.index("parent_delete") < order.index("child_delete")


def test_per_model_flag_override(hier, target_df):
    """Per-model flags (reference DiffSyncModelFlags, enum.py:38-48): the
    parent keeps unmatched conversations while the child deletes turns."""
    parent, child = hier
    victim, child_src, parent_src = _drop_one_conv(target_df)
    n_parents = parent.count()
    hs = HierarchySync(parent, child, {
        "conversation": DiffFlags(skip_unmatched_dst=True),
        "turn": DiffFlags(),
    })
    hs.sync_from(parent_src, child_src, batch_id=1)
    assert parent.count() == n_parents                     # no parent deletes
    assert child.read().filter(F.col("conv_id") == victim).count() == 0


def test_cascade_and_skip_children_on_delete(hier, target_df):
    """A deleted parent tombstones its children even when the child source
    still carries them — unless the child model sets
    skip_children_on_delete (reference enum.py:32-36)."""
    parent, child = hier
    victim = target_df.first().conv_id
    parent_src = _parent_of(target_df).filter(F.col("conv_id") != victim)
    child_src = target_df                                   # unchanged!
    n_victim_turns = child.read().filter(F.col("conv_id") == victim).count()
    assert n_victim_turns > 0

    hs = HierarchySync(parent, child,
                       DiffFlags(natural_deletion_order=True))
    steps = dict(hs.sync_from(parent_src, child_src, batch_id=1))
    assert steps["cascade_children"]["n_delete"] == n_victim_turns
    assert child.read().filter(F.col("conv_id") == victim).count() == 0
    assert parent.read().filter(F.col("conv_id") == victim).count() == 0


def test_skip_children_on_delete(spark, tmp_path, target_df):
    child = Engine.create(spark, str(tmp_path / "t2"), TRANSCRIPT_MODEL,
                          schema=target_df.schema, n_buckets=4)
    child.table.merge(target_df.withColumn("op", F.lit("insert")),
                      mode="force", checkpoint_id="boot", batch_id=0)
    pdf = _parent_of(target_df)
    parent = Engine.create(spark, str(tmp_path / "c2"), CONV_MODEL,
                           schema=pdf.schema, n_buckets=4)
    parent.table.merge(pdf.withColumn("op", F.lit("insert")),
                       mode="force", checkpoint_id="boot", batch_id=0)
    victim = target_df.first().conv_id
    parent_src = pdf.filter(F.col("conv_id") != victim)
    hs = HierarchySync(parent, child, {
        "conversation": DiffFlags(natural_deletion_order=True),
        "turn": DiffFlags(natural_deletion_order=True,
                          skip_children_on_delete=True),
    })
    steps = dict(hs.sync_from(parent_src, target_df, batch_id=1))
    assert "cascade_children" not in steps
    assert parent.read().filter(F.col("conv_id") == victim).count() == 0
    assert child.read().filter(F.col("conv_id") == victim).count() > 0


def test_fk_declaration_validated(spark, tmp_path, target_df):
    bad_child = Engine.create(
        spark, str(tmp_path / "bad"),
        ModelSchema(name="x", identifiers=("a",), attributes=()),
        schema=spark.createDataFrame([], "a string").schema,
    )
    parent = Engine.create(
        spark, str(tmp_path / "p"), CONV_MODEL,
        schema=spark.createDataFrame([], "conv_id string, n_turns long").schema,
    )
    with pytest.raises(ValueError):
        HierarchySync(parent, bad_child)
