"""Z-order clustering: compact(zorder=[...]) layout rewrite + scan pruning.

Layout-only by contract — every test checks the clustered table answers
exactly like the unclustered one, then that the clustering actually prunes.
"""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from diffsync_spark.model import ModelSchema
from diffsync_spark.sinks.table import DiffSyncSparkError, SnapshotTable

MODEL = ModelSchema(
    name="pt", identifiers=("k",), attributes=("x", "y", "label"),
    version_cols=("ts",),
)
T0 = datetime.datetime(2025, 1, 1)


def _points(spark, n=20_000):
    return spark.range(n).select(
        F.col("id").cast("int").alias("k"),
        F.pmod(F.xxhash64("id", F.lit(1)), F.lit(1000)).cast("int").alias("x"),
        F.pmod(F.xxhash64("id", F.lit(2)), F.lit(1000)).cast("int").alias("y"),
        F.lit("p").alias("label"),
        F.lit(T0).alias("ts"),
    )


def _boot(spark, path, write_mode="cow"):
    df = _points(spark)
    t = SnapshotTable.create(spark, path, MODEL, schema=df.schema,
                             n_buckets=4, write_mode=write_mode)
    t.merge(df.withColumn("op", F.lit("insert")), mode="force",
            checkpoint_id="boot", batch_id=0)
    return t


def test_zorder_is_layout_only(spark, tmp_path):
    t = _boot(spark, str(tmp_path / "t"))
    before = sorted((r.k, r.x, r.y) for r in t.read().collect())
    res = t.compact(zorder=["x", "y"], zorder_files_per_bucket=8)
    assert res["zorder"] == ["x", "y"]
    after = sorted((r.k, r.x, r.y) for r in t.read().collect())
    assert before == after
    # changes() across the rewrite reports nothing
    assert t.changes(res["version"] - 1).count() == 0


def test_zorder_scan_prunes_on_either_dimension(spark, tmp_path):
    t = _boot(spark, str(tmp_path / "t"))
    t.compact(zorder=["x", "y"], zorder_files_per_bucket=8)
    n_total = t.files().count()
    assert n_total >= 16  # the fan-out actually happened
    box = t.scan([("x", "<", 100), ("y", "<", 100)])
    assert box.count() == 199  # pinned: deterministic xxhash points
    assert len(box.inputFiles()) < n_total / 2
    ys = t.scan([("y", ">=", 900)])
    assert ys.count() == _points(spark).filter("y >= 900").count()
    assert len(ys.inputFiles()) < n_total


def test_zorder_point_lookup_still_works(spark, tmp_path):
    t = _boot(spark, str(tmp_path / "t"))
    t.compact(zorder=["x", "y"], zorder_files_per_bucket=8)
    row = t.lookup([1234])
    assert row is not None and row["k"] == 1234


def test_zorder_folds_mor_layers(spark, tmp_path):
    t = _boot(spark, str(tmp_path / "t"), write_mode="mor")
    t1 = T0 + datetime.timedelta(hours=1)
    chg = spark.createDataFrame(
        [(5, 1, 1, "edited", t1, "update"), (6, None, None, None, t1, "delete")],
        "k int, x int, y int, label string, ts timestamp, op string",
    )
    t.merge(chg, checkpoint_id="c", batch_id=1)
    assert t._manifest().get("deltas")
    t.compact(zorder=["x", "y"], zorder_files_per_bucket=4)
    assert not t._manifest().get("deltas")
    assert t.lookup([5])["label"] == "edited"
    assert t.lookup([6]) is None
    assert t.count_rows() == 20_000 - 1


def test_zorder_rejects_string_and_unknown_columns(spark, tmp_path):
    t = _boot(spark, str(tmp_path / "t"))
    with pytest.raises(DiffSyncSparkError, match="Z-orderable"):
        t.compact(zorder=["label"])
    with pytest.raises(DiffSyncSparkError, match="unknown zorder"):
        t.compact(zorder=["nope"])
