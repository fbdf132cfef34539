"""change_feed(): Delta-CDF-shaped flat row images over the snapshot chain.

The net feed is oracle-gated (``change_feed_cdf`` in ``__spark_entry__``);
these tests pin what the oracle can't express: per-commit attribution,
expired-ancestry failure, and schema-evolution pre-images.
"""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from diffsync_spark.model import ModelSchema
from diffsync_spark.sinks.table import DiffSyncSparkError, SnapshotTable

MODEL = ModelSchema(
    name="kv", identifiers=("k",), attributes=("v",), version_cols=("ts",)
)
T0 = datetime.datetime(2025, 1, 1)


def _mk(spark, path, rows="base"):
    df = spark.createDataFrame(
        [(i, f"v{i}", T0) for i in range(6)], "k int, v string, ts timestamp"
    )
    t = SnapshotTable.create(spark, path, MODEL, schema=df.schema, n_buckets=4)
    t.merge(df.withColumn("op", F.lit("insert")), mode="force",
            checkpoint_id="boot", batch_id=0)
    return t


def _chg(spark, rows):
    return spark.createDataFrame(rows, "k int, v string, ts timestamp, op string")


def test_net_feed_images(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    v1 = t.current_version()
    t1 = T0 + datetime.timedelta(hours=1)
    t.merge(_chg(spark, [(1, "v1x", t1, "update"), (2, None, t1, "delete"),
                         (9, "v9", t1, "update")]),
            checkpoint_id="c", batch_id=1)
    feed = {(r.k, r._change_type): r.v
            for r in t.change_feed(v1).collect()}
    assert feed == {
        (1, "update_preimage"): "v1",
        (1, "update_postimage"): "v1x",
        (2, "delete"): "v2",
        (9, "insert"): "v9",
    }


def test_per_commit_attribution(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    v1 = t.current_version()
    t1 = T0 + datetime.timedelta(hours=1)
    t2 = T0 + datetime.timedelta(hours=2)
    t.merge(_chg(spark, [(1, "v1x", t1, "update")]), checkpoint_id="c", batch_id=1)
    va = t.current_version()
    t.merge(_chg(spark, [(1, "v1y", t2, "update"), (0, None, t2, "delete")]),
            checkpoint_id="c", batch_id=2)
    vb = t.current_version()

    rows = t.change_feed(v1, per_commit=True).collect()
    by_commit = {}
    for r in rows:
        by_commit.setdefault(r._commit_version, set()).add((r.k, r._change_type, r.v))
    assert set(by_commit) == {va, vb}
    assert by_commit[va] == {(1, "update_preimage", "v1"),
                             (1, "update_postimage", "v1x")}
    assert by_commit[vb] == {(1, "update_preimage", "v1x"),
                             (1, "update_postimage", "v1y"),
                             (0, "delete", "v0")}
    # net feed collapses the two updates into one old→new pair
    net = {(r.k, r._change_type): r.v for r in t.change_feed(v1).collect()}
    assert net == {(1, "update_preimage"): "v1",
                   (1, "update_postimage"): "v1y",
                   (0, "delete"): "v0"}


def test_per_commit_expired_ancestry_raises(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    v1 = t.current_version()
    t1 = T0 + datetime.timedelta(hours=1)
    for i in range(3):
        t.merge(_chg(spark, [(1, f"x{i}", t1 + datetime.timedelta(minutes=i),
                              "update")]),
                checkpoint_id="c", batch_id=1 + i)
    t.expire_snapshots(keep_last=1)
    with pytest.raises(DiffSyncSparkError, match="ancestry expired"):
        t.change_feed(v1, per_commit=True)


def test_evolution_preimage_reads_null(spark, tmp_path):
    """A column added between the versions is NULL in pre-images and the
    new value in post-images — the feed follows the NEWER schema."""
    t = _mk(spark, str(tmp_path / "t"))
    v1 = t.current_version()
    t1 = T0 + datetime.timedelta(hours=1)
    chg = _chg(spark, [(1, "v1x", t1, "update")]).withColumn(
        "tag", F.lit("new")
    )
    t.merge(chg, checkpoint_id="c", batch_id=1)
    rows = {r._change_type: r for r in t.change_feed(v1).collect()}
    assert rows["update_preimage"].tag is None
    assert rows["update_postimage"].tag == "new"


def test_feed_replay_reconstructs_state(spark, tmp_path):
    """The CDC-out contract: applying the net feed's row images onto the
    FROM snapshot reproduces the TO snapshot exactly — inserts/postimages
    as upserts, deletes as deletes, preimages ignored."""
    t = _mk(spark, str(tmp_path / "src"))
    v1 = t.current_version()
    for i in range(3):
        ti = T0 + datetime.timedelta(hours=i + 1)
        t.merge(_chg(spark, [
            (1, f"a{i}", ti, "update"),
            (2 + i, None, ti, "delete"),
            (100 + i, f"n{i}", ti, "update"),
        ]), checkpoint_id="c", batch_id=1 + i)
    v2 = t.current_version()

    feed = t.change_feed(v1, v2)
    # a consumer table bootstrapped from the v1 snapshot
    mirror = SnapshotTable.create(
        spark, str(tmp_path / "mirror"), MODEL,
        schema=t.read(v1).schema, n_buckets=4,
    )
    mirror.merge(t.read(v1).withColumn("op", F.lit("insert")), mode="force",
                 checkpoint_id="boot", batch_id=0)
    apply_batch = (
        feed.filter(F.col("_change_type") != "update_preimage")
        .withColumn("op", F.when(F.col("_change_type") == "delete",
                                 F.lit("delete")).otherwise(F.lit("upsert")))
        .drop("_change_type", "_commit_version")
    )
    mirror.merge(apply_batch, mode="force", checkpoint_id="feed", batch_id=0)

    want = sorted((r.k, r.v) for r in t.read(v2).collect())
    got = sorted((r.k, r.v) for r in mirror.read().collect())
    assert got == want


def test_apply_change_feed_mirrors_state(spark, tmp_path):
    """apply_change_feed: the packaged consumer — same invariant as the
    manual replay, including deletes whose images carry the OLD version
    (force mode makes them land)."""
    t = _mk(spark, str(tmp_path / "src"))
    v1 = t.current_version()
    t1 = T0 + datetime.timedelta(hours=1)
    t.merge(_chg(spark, [(1, "a", t1, "update"), (2, None, t1, "delete")]),
            checkpoint_id="c", batch_id=1)
    mirror = SnapshotTable.create(
        spark, str(tmp_path / "mirror"), MODEL,
        schema=t.read(v1).schema, n_buckets=4)
    mirror.merge(t.read(v1).withColumn("op", F.lit("insert")), mode="force",
                 checkpoint_id="boot", batch_id=0)
    res = mirror.apply_change_feed(t.change_feed(v1), batch_id=0)
    assert res["n_delete"] == 1
    assert sorted((r.k, r.v) for r in mirror.read().collect()) == sorted(
        (r.k, r.v) for r in t.read().collect())
    # idempotent: the same (checkpoint, batch) replays as a no-op
    res2 = mirror.apply_change_feed(t.change_feed(v1), batch_id=0)
    assert res2.get("skipped") or res2.get("n_update", 0) == 0


def test_per_commit_feed_across_schema_evolution(spark, tmp_path):
    """A column added mid-range reads NULL in earlier hops' rows instead
    of breaking the per-commit union."""
    t = _mk(spark, str(tmp_path / "t"))
    v1 = t.current_version()
    t1 = T0 + datetime.timedelta(hours=1)
    t.merge(_chg(spark, [(1, "a", t1, "update")]), checkpoint_id="c",
            batch_id=1)
    evolved = _chg(spark, [(2, "b", t1 + datetime.timedelta(hours=1),
                            "update")]).withColumn("tag", F.lit("new"))
    t.merge(evolved, checkpoint_id="c", batch_id=2)
    rows = t.change_feed(v1, per_commit=True).collect()
    by_key = {(r.k, r._change_type): r for r in rows}
    assert by_key[(1, "update_postimage")].tag is None
    assert by_key[(2, "update_postimage")].tag == "new"
