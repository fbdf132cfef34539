"""Replicates the driver's correctness gate locally: every queries() entry vs
its oracle_sql() twin via DuckDB — row count, column names, and
order-insensitive value comparison — at sf0.001 (the driver uses sf0.01)."""

from __future__ import annotations

import math

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entry_mod

SF = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'"
        )
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(6)
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
    assert set(df.columns) >= {"user_id", "event_id", "op"}


@pytest.mark.parametrize("name", sorted(entry_mod.queries().keys()))
def test_query_matches_oracle(spark, duck, name):
    fn = entry_mod.queries()[name]
    oracles = entry_mod.oracle_sql()
    got = _canon(fn(spark, SF).toPandas())
    if name not in oracles:
        assert len(got) >= 0  # rows-only check (driver's weaker path)
        return
    want = _canon(duck.execute(oracles[name]).df())
    assert list(got.columns) == list(want.columns), (
        f"{name}: columns {list(got.columns)} != {list(want.columns)}"
    )
    assert len(got) == len(want), f"{name}: {len(got)} rows != {len(want)}"
    for c in got.columns:
        # the driver's value hash is dtype-aware: an int-vs-float/HUGEINT
        # mismatch fails its gate even when values are equal (round-1
        # diff_summary/rollup_parent lesson) — astype(str) below would hide it
        gk, wk = got[c].dtype.kind, want[c].dtype.kind
        assert gk == wk or {gk, wk} <= {"i", "u"}, (
            f"{name}.{c}: dtype kind {gk!r} != oracle {wk!r}"
        )
    for c in got.columns:
        a, b = got[c], want[c]
        if pd.api.types.is_float_dtype(a) or pd.api.types.is_float_dtype(b):
            aa = pd.to_numeric(a, errors="coerce")
            bb = pd.to_numeric(b, errors="coerce")
            both_nan = aa.isna() & bb.isna()
            close = (aa - bb).abs() < 1e-9
            assert (both_nan | close).all(), f"{name}.{c}: value mismatch"
        else:
            assert (a.astype(str).values == b.astype(str).values).all(), (
                f"{name}.{c}: value mismatch"
            )
