"""Native parquet bloom filters via the ``bloom_cols`` table property.

Verification is physical: identical data written by a bloom table vs a
plain table differs by the bloom bitset bytes (~30 KB per row group per
column at the configured ndv) — the tooling here (pyarrow 16 / duckdb 1.0)
predates bloom-metadata introspection, so the size delta is the witness.

The data uses md5 session ids (unique per row): parquet-mr only writes a
bloom when the chunk FALLS BACK from dictionary encoding (a complete
dictionary already is an exact filter) — low-cardinality columns get no
bitset by design, high-cardinality ones (the 100 TB case) do.
"""

from __future__ import annotations

import datetime
import os

import pytest
from pyspark.sql import functions as F

from diffsync_spark.model import ModelSchema
from diffsync_spark.sinks.table import DiffSyncSparkError, SnapshotTable

MODEL = ModelSchema(
    name="t", identifiers=("k",), attributes=("session", "v"),
    version_cols=("ts",),
)
T0 = datetime.datetime(2025, 1, 1)


def _data(spark, n=80_000):
    return spark.range(n).select(
        F.col("id").cast("int").alias("k"),
        F.md5(F.col("id").cast("string")).alias("session"),
        F.lit(1.0).alias("v"),
        F.lit(T0).alias("ts"),
    )


def _boot(spark, path, **kw):
    df = _data(spark)
    t = SnapshotTable.create(spark, path, MODEL, schema=df.schema,
                             n_buckets=2, **kw)
    t.merge(df.withColumn("op", F.lit("insert")), mode="force",
            checkpoint_id="boot", batch_id=0)
    return t


def _bytes(t):
    return sum(os.path.getsize(r.path) for r in t.files().collect())


def test_bloom_bits_written_and_survive_maintenance(spark, tmp_path):
    plain = _boot(spark, str(tmp_path / "plain"))
    bloomy = _boot(spark, str(tmp_path / "bloom"), bloom_cols=["session"])
    assert _bytes(bloomy) - _bytes(plain) > 20_000  # the bitsets are real

    # the property rides compact and rebucket — rewritten files still carry it
    bloomy.compact()
    plain.compact()
    assert bloomy._manifest().get("bloom_cols") == ["session"]
    assert _bytes(bloomy) - _bytes(plain) > 20_000
    bloomy.rebucket(4)
    plain.rebucket(4)
    assert bloomy._manifest().get("bloom_cols") == ["session"]
    assert _bytes(bloomy) - _bytes(plain) > 20_000


def test_bloom_table_answers_identically(spark, tmp_path):
    t = _boot(spark, str(tmp_path / "t"), bloom_cols=["session"])
    probe = _data(spark).filter("k = 17").first()["session"]
    got = t.scan([("session", "=", probe)]).collect()
    exp = _data(spark).filter(F.col("session") == probe).collect()
    assert sorted(r.k for r in got) == sorted(r.k for r in exp)
    assert t.lookup([123])["session"] is not None


def test_bloom_rejects_unknown_column(spark, tmp_path):
    df = _data(spark)
    with pytest.raises(DiffSyncSparkError, match="unknown bloom"):
        SnapshotTable.create(spark, str(tmp_path / "x"), MODEL,
                             schema=df.schema, bloom_cols=["nope"])
