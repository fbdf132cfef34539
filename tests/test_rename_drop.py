"""Column rename/drop via stable parquet field ids: metadata-only commits,
old files resolve under new names, dropped values never resurrect, layout
columns protected, merge-on-read fold compatibility."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from diffsync_spark.errors import DiffSyncSparkError
from diffsync_spark.fixtures import gen_source
from diffsync_spark.model import TRANSCRIPT_MODEL
from diffsync_spark.sinks.table import SnapshotTable

SCHEMA_NEW = (
    "conv_id string, turn_idx int, op string, role string, "
    "text string, tool_name string, ts timestamp"
)


def _table(spark, tmp_path, write_mode="cow"):
    df = spark.createDataFrame(gen_source(n_convs=25, seed=7))
    t = SnapshotTable.create(
        spark, str(tmp_path / "t"), TRANSCRIPT_MODEL,
        schema=df.schema, n_buckets=4, write_mode=write_mode,
    )
    t.merge(df.withColumn("op", F.lit("insert")), mode="force",
            checkpoint_id="boot", batch_id=0)
    return t, df


def test_rename_resolves_old_files_and_new_merges(spark, tmp_path):
    t, df = _table(spark, tmp_path)
    want = df.filter(F.col("tool").isNotNull()).count()
    assert want > 0
    v_before = t.current_version()
    t.rename_column("tool", "tool_name")
    # metadata-only: no new data files
    assert t._manifest()["files"] == t._manifest(v_before)["files"]
    got = t.read().filter(F.col("tool_name").isNotNull()).count()
    assert got == want  # every OLD file resolves by field id
    # merges use the new name; lookups see it too
    dt = datetime.datetime(2031, 1, 1)
    t.merge(spark.createDataFrame(
        [("nc", 0, "upsert", "user", "hi", "calc", dt)], SCHEMA_NEW),
        checkpoint_id="c", batch_id=1)
    assert t.lookup(("nc", 0))["tool_name"] == "calc"


def test_drop_then_readd_never_resurrects(spark, tmp_path):
    t, df = _table(spark, tmp_path)
    t.rename_column("tool", "tool_name")
    t.drop_column("tool_name")
    assert "tool_name" not in t.read().columns
    dt = datetime.datetime(2031, 1, 1)
    t.merge(spark.createDataFrame(
        [("nc2", 0, "upsert", "user", "hi", "fresh", dt)], SCHEMA_NEW),
        checkpoint_id="c", batch_id=1)
    cur = t.read()
    # the re-added column has a NEW field id: old files' bytes stay dark
    assert cur.filter(
        (F.col("conv_id") != "nc2") & F.col("tool_name").isNotNull()
    ).count() == 0
    assert cur.filter("conv_id = 'nc2'").collect()[0].tool_name == "fresh"


def test_rename_on_mor_table_folds_through(spark, tmp_path):
    t, _ = _table(spark, tmp_path, write_mode="mor")
    dt = datetime.datetime(2031, 1, 1)
    # leave an outstanding delta layer, THEN rename
    t.merge(spark.createDataFrame(
        [("mc", 0, "upsert", "user", "hi", "layered", dt)],
        SCHEMA_NEW.replace("tool_name", "tool")), checkpoint_id="c",
        batch_id=1)
    assert t._manifest().get("deltas")
    t.rename_column("tool", "tool_name")
    row = t.read().filter("conv_id = 'mc'").collect()[0]
    assert row.tool_name == "layered"  # base AND layer resolve by id
    t.compact()
    assert t.read().filter("conv_id = 'mc'").collect()[0].tool_name == "layered"


def test_layout_columns_protected_and_errors(spark, tmp_path):
    t, _ = _table(spark, tmp_path)
    for bad in ("conv_id", "turn_idx", "ts"):
        with pytest.raises(DiffSyncSparkError):
            t.rename_column(bad, "x")
        with pytest.raises(DiffSyncSparkError):
            t.drop_column(bad)
    with pytest.raises(DiffSyncSparkError):
        t.rename_column("nope", "x")
    with pytest.raises(DiffSyncSparkError):
        t.rename_column("tool", "text")  # collision
    with pytest.raises(DiffSyncSparkError):
        t.drop_column("nope")


def test_evolution_added_column_gets_fresh_id_and_survives_rename(
    spark, tmp_path
):
    """Add a column via merge evolution, rename it, keep reading."""
    t, _ = _table(spark, tmp_path)
    dt = datetime.datetime(2031, 1, 1)
    t.merge(spark.createDataFrame(
        [("ec", 0, "upsert", "user", "hi", None, dt, 0.9)],
        SCHEMA_NEW.replace("tool_name", "tool") + ", score double"),
        checkpoint_id="c", batch_id=1)
    man = t._manifest()
    assert man["last_field_id"] >= 7  # 6 create-time + the evolved one
    t.rename_column("score", "quality")
    rows = t.read().filter("conv_id = 'ec'").collect()
    assert rows[0].quality == 0.9


def test_add_column_ddl_and_gc_dry_run(spark, tmp_path):
    """Explicit ADD COLUMN: NULL from old files, fresh monotone field id,
    immediately mergeable. remove_orphans(dry_run=) deletes nothing."""
    t, _ = _table(spark, tmp_path)
    from pyspark.sql import types as T

    before_lfi = t._manifest()["last_field_id"]
    t.add_column("score", T.DoubleType())
    man = t._manifest()
    assert man["last_field_id"] == before_lfi + 1
    assert t.read().filter(F.col("score").isNotNull()).count() == 0
    dt = datetime.datetime(2031, 1, 1)
    t.merge(spark.createDataFrame(
        [("ac", 0, "upsert", "user", "x", None, dt, 0.5)],
        SCHEMA_NEW.replace("tool_name", "tool") + ", score double"),
        checkpoint_id="c", batch_id=1)
    assert t.read().filter("conv_id = 'ac'").collect()[0].score == 0.5
    with pytest.raises(DiffSyncSparkError):
        t.add_column("score", T.DoubleType())
    # GC dry run: reports, touches nothing
    import os
    dirs_before = sorted(os.listdir(os.path.join(str(tmp_path / "t"), "data")))
    rep = t.remove_orphans(dry_run=True)
    assert "would_remove_dirs" in rep and "removed_dirs" not in rep
    assert sorted(os.listdir(os.path.join(str(tmp_path / "t"), "data"))) == dirs_before
