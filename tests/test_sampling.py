"""Deterministic sampling + sessionization: reproducibility and statistical
contract tests (driver-gate value parity lives in test_entry_oracle.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from diffsync_spark.functions.sampling import (
    hash_sample,
    split_column,
    stratified_sample,
)
from diffsync_spark.functions.sessions import sessionize

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").cache()


def test_hash_sample_stable_under_repartition(docs):
    """Membership must not depend on physical layout — the reason this
    exists instead of df.sample()."""
    a = {r.doc_id for r in hash_sample(docs, 0.3, ["doc_id"]).collect()}
    b = {
        r.doc_id
        for r in hash_sample(docs.repartition(17), 0.3, ["doc_id"]).collect()
    }
    assert a == b and 0 < len(a) < docs.count()


def test_hash_sample_fraction_and_independence(docs):
    n = docs.count()
    k = hash_sample(docs, 0.5, ["doc_id"]).count()
    assert abs(k / n - 0.5) < 0.15  # 500 docs → loose CI
    s1 = {r.doc_id for r in hash_sample(docs, 0.5, ["doc_id"], "a").collect()}
    s2 = {r.doc_id for r in hash_sample(docs, 0.5, ["doc_id"], "b").collect()}
    assert s1 != s2  # different salts give different draws
    # nested fractions: smaller sample ⊆ larger sample (same salt)
    small = {r.doc_id for r in hash_sample(docs, 0.2, ["doc_id"], "a").collect()}
    assert small <= s1


def test_hash_sample_extremes(docs):
    assert hash_sample(docs, 0.0, ["doc_id"]).count() == 0
    assert hash_sample(docs, 1.0, ["doc_id"]).count() == docs.count()
    with pytest.raises(ValueError):
        hash_sample(docs, 1.5, ["doc_id"])


def test_stratified_sample_quota(docs):
    out = stratified_sample(docs, ["lang"], 3, ["doc_id"])
    per = out.groupBy("lang").count().collect()
    base = dict(docs.groupBy("lang").count().collect())
    for r in per:
        assert r["count"] == min(3, base[r.lang])
    # deterministic
    again = stratified_sample(docs.repartition(7), ["lang"], 3, ["doc_id"])
    assert {tuple(r) for r in out.select("lang", "doc_id").collect()} == {
        tuple(r) for r in again.select("lang", "doc_id").collect()
    }


def test_split_disjoint_exhaustive(docs):
    lab = docs.select(
        "doc_id", split_column(["doc_id"], {"train": 0.8, "test": 0.2})
    )
    counts = dict(lab.groupBy("split").count().collect())
    assert set(counts) <= {"train", "test"}
    assert sum(counts.values()) == docs.count()  # exhaustive, one label each
    assert counts["train"] > counts.get("test", 0)
    with pytest.raises(ValueError):
        split_column(["doc_id"], {"a": 0.5, "b": 0.6})


def test_sessionize_gaps(spark):
    import datetime

    T0 = datetime.datetime(2025, 1, 1)
    rows = [
        # user 1: two sessions split by a 20-min gap
        (1, 1, T0),
        (1, 2, T0 + datetime.timedelta(minutes=5)),
        (1, 3, T0 + datetime.timedelta(minutes=25)),
        # user 2: single event
        (2, 4, T0),
    ]
    df = spark.createDataFrame(rows, "user_id long, event_id long, ts timestamp")
    out = sessionize(df, ("user_id",), "ts", 600, tiebreak_cols=("event_id",))
    got = {
        (r.user_id, r.event_id): (r.session_idx, r.is_session_start)
        for r in out.collect()
    }
    assert got == {
        (1, 1): (1, True),
        (1, 2): (1, False),
        (1, 3): (2, True),
        (2, 4): (1, True),
    }


def test_sessionize_single_shuffle(spark):
    """The two windows must share one exchange + sort (scale contract)."""
    import datetime

    df = spark.createDataFrame(
        [(1, 1, datetime.datetime(2025, 1, 1))],
        "user_id long, event_id long, ts timestamp",
    )
    plan = sessionize(
        df, ("user_id",), "ts", 600, tiebreak_cols=("event_id",)
    )._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1
    assert plan.count("Sort") == 1
