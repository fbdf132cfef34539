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


def test_sessionize_exact_gap_boundary(spark):
    """A gap of EXACTLY gap_seconds starts a new session — the >= rule that
    matches F.session_window's half-open [ts, ts+gap) window, so row-level
    labels and the streaming aggregation never disagree (ADVICE r2)."""
    import datetime

    T0 = datetime.datetime(2025, 1, 1)
    rows = [
        (1, 1, T0),
        (1, 2, T0 + datetime.timedelta(seconds=600)),       # exact gap → new
        (1, 3, T0 + datetime.timedelta(seconds=1199, microseconds=999_999)),
    ]
    df = spark.createDataFrame(rows, "user_id long, event_id long, ts timestamp")
    out = sessionize(df, ("user_id",), "ts", 600, tiebreak_cols=("event_id",))
    got = {r.event_id: r.session_idx for r in out.collect()}
    assert got == {1: 1, 2: 2, 3: 2}  # event 3 is 1µs under the gap → stays


def test_assemble_sequences_order_and_cap(spark):
    import datetime

    from diffsync_spark.functions.assemble import assemble_sequences

    T0 = datetime.datetime(2025, 1, 1)
    rows = [
        (1, 3, "c", T0 + datetime.timedelta(seconds=2)),
        (1, 1, "a", T0),
        (1, 2, "b", T0 + datetime.timedelta(seconds=1)),
        (2, 9, "z", T0),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, v string, ts timestamp"
    ).repartition(4)  # order must not depend on layout
    a = {
        r.user_id: (r.items, r.n_items, r.n_total)
        for r in assemble_sequences(df, ("user_id",), ("ts", "event_id"), "v")
        .collect()
    }
    assert a[1] == (["a", "b", "c"], 3, 3)
    assert a[2] == (["z"], 1, 1)
    capped = {
        r.user_id: (r.items, r.n_items, r.n_total)
        for r in assemble_sequences(
            df, ("user_id",), ("ts", "event_id"), "v", max_items=2
        ).collect()
    }
    assert capped[1] == (["a", "b"], 2, 3)  # head truncation, true total kept


def test_assemble_sequences_null_key_group(spark):
    """A NULL-key group is a group: max_items must not silently drop it
    (the count join is null-safe — ADVICE r2). Both paths agree."""
    import datetime

    from diffsync_spark.functions.assemble import assemble_sequences

    T0 = datetime.datetime(2025, 1, 1)
    rows = [
        (None, 1, "x", T0),
        (None, 2, "y", T0 + datetime.timedelta(seconds=1)),
        (None, 3, "z", T0 + datetime.timedelta(seconds=2)),
        (7, 4, "a", T0),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, v string, ts timestamp"
    )
    plain = assemble_sequences(df, ("user_id",), ("ts", "event_id"), "v")
    capped = assemble_sequences(
        df, ("user_id",), ("ts", "event_id"), "v", max_items=2
    )
    p = {r.user_id: (r.items, r.n_total) for r in plain.collect()}
    c = {r.user_id: (r.items, r.n_total) for r in capped.collect()}
    assert set(p) == set(c) == {None, 7}  # same group set either way
    assert p[None] == (["x", "y", "z"], 3)
    assert c[None] == (["x", "y"], 3)  # truncated payload, true total
    assert c[7] == (["a"], 1)


def test_chunk_text_coverage_and_edges(spark):
    from diffsync_spark.functions.assemble import chunk_text

    df = spark.createDataFrame(
        [(1, "x" * 250), (2, "y" * 10), (3, ""), (4, None), (5, "z" * 100)],
        "doc_id long, text string",
    )
    out = chunk_text(df, "text", chunk_chars=100, overlap=20)
    rows = sorted(
        [(r.doc_id, r.chunk_idx, r.chunk, r.n_chunks) for r in out.collect()]
    )
    by_doc: dict = {}
    for d, i, c, n in rows:
        by_doc.setdefault(d, []).append((i, c, n))
    # 250 chars, stride 80: starts 0/80/160 → 3 chunks; reassembly covers all
    assert [i for i, _, _ in by_doc[1]] == [0, 1, 2]
    assert all(n == 3 for _, _, n in by_doc[1])
    recon = by_doc[1][0][1] + "".join(c[20:] for _, c, _ in by_doc[1][1:])
    assert recon == "x" * 250
    assert by_doc[2] == [(0, "y" * 10, 1)]  # short doc → one short chunk
    assert 3 not in by_doc and 4 not in by_doc  # empty/NULL → zero chunks
    assert by_doc[5] == [(0, "z" * 100, 1)]  # exactly one full chunk
    import pytest as _pytest

    with _pytest.raises(ValueError):
        chunk_text(df, "text", chunk_chars=50, overlap=50)


def test_filter_top_fraction_paths_agree(docs):
    """The exact percent_rank path and the approx_percentile threshold path
    must select (nearly) the same rows; approx with a tight sketch on a
    small frame is exact."""
    from diffsync_spark.functions.sampling import filter_top_fraction

    exact = {
        r.doc_id
        for r in filter_top_fraction(
            docs, "n_chars", 0.25, ["lang"], exact=True,
            tiebreak_cols=("doc_id",),
        ).collect()
    }
    approx = {
        r.doc_id
        for r in filter_top_fraction(
            docs, "n_chars", 0.25, ["lang"], exact=False
        ).collect()
    }
    n = docs.count()
    assert 0 < len(exact) < n
    # same ballpark; boundary ties may differ between rank and threshold
    assert len(exact.symmetric_difference(approx)) <= max(5, n // 50)
    import pytest as _p

    with _p.raises(ValueError):
        filter_top_fraction(docs, "n_chars", 1.5)


def test_repeat_dataset_multiplicity(docs):
    from diffsync_spark.functions.sampling import repeat_dataset

    n = docs.count()
    out = repeat_dataset(docs, 2.3, ["doc_id"])
    per = dict(out.groupBy("doc_id").count().groupBy("count").count().collect())
    assert set(per) <= {2, 3}  # every doc appears floor or ceil times
    total = out.count()
    assert abs(total / n - 2.3) < 0.2  # expected multiplicity ≈ factor
    # deterministic: the SAME docs get the extra copy on rerun
    again = repeat_dataset(docs.repartition(9), 2.3, ["doc_id"])
    t3 = {r.doc_id for r in out.groupBy("doc_id").count()
          .filter("count = 3").collect()}
    a3 = {r.doc_id for r in again.groupBy("doc_id").count()
          .filter("count = 3").collect()}
    assert t3 == a3
    # factor < 1 degenerates to hash_sample with copy_idx 0
    sub = repeat_dataset(docs, 0.4, ["doc_id"])
    assert 0 < sub.count() < n
    assert sub.agg({"copy_idx": "max"}).first()[0] == 0
    import pytest as _p

    with _p.raises(ValueError):
        repeat_dataset(docs, -1.0, ["doc_id"])


def test_pack_sequences_invariants(spark):
    from diffsync_spark.functions.assemble import pack_sequences

    rows = [(i, s, i % 2) for i, s in enumerate([500, 900, 700, 2500, 100,
                                                 1000, 1000, 1, 1999])]
    df = spark.createDataFrame(rows, "doc_id long, sz long, bkt int")
    out = pack_sequences(df.repartition(5), "sz", 2000, "bkt", ("doc_id",))
    got = [
        (r.doc_id, r.pack_id, r.pack_fill)
        for r in out.orderBy("bkt", "doc_id").collect()
    ]
    by_bkt: dict = {0: [], 1: []}
    for r in out.collect():
        by_bkt[r.bkt].append((r.doc_id, r.sz, r.pack_id, r.pack_fill))
    for bkt, items in by_bkt.items():
        items.sort()
        fill = {}
        prev_pack = 0
        for _, sz, pid, pfill in items:
            assert pid >= prev_pack  # packs are monotone in order
            prev_pack = pid
            fill[pid] = fill.get(pid, 0) + sz
            assert pfill == fill[pid]  # running fill matches
        for pid, total in fill.items():
            n_items = sum(1 for it in items if it[2] == pid)
            assert total <= 2000 or n_items == 1  # only oversize singletons
    # deterministic under repartitioning
    again = [
        (r.doc_id, r.pack_id, r.pack_fill)
        for r in pack_sequences(df.repartition(2), "sz", 2000, "bkt",
                                ("doc_id",)).orderBy("bkt", "doc_id").collect()
    ]
    assert got == again


def test_pack_zero_size_before_oversize_matches_sql_twin(spark):
    """A zero-size row leaves fill at 0, so a following oversize row joins
    pack 0 (no reset fires at fill==0) — and the DuckDB recursive twin
    must agree."""
    import duckdb

    from diffsync_spark.functions.assemble import pack_sequences, pack_sql

    rows = [(1, 0, 0), (2, 3000, 0), (3, 5, 0)]
    df = spark.createDataFrame(rows, "doc_id long, sz long, bkt int")
    got = {
        r.doc_id: (r.pack_id, r.pack_fill)
        for r in pack_sequences(df, "sz", 2000, "bkt", ("doc_id",)).collect()
    }
    assert got == {1: (0, 0), 2: (0, 3000), 3: (1, 5)}
    sql = pack_sql(
        "SELECT * FROM (VALUES (1, 0, 0), (2, 3000, 0), (3, 5, 0)) "
        "AS t(doc_id, sz, bkt)",
        "sz", 2000, "bkt", ("doc_id",), payload_cols=("doc_id",),
    )
    want = {
        int(r[1]): (int(r[3]), int(r[4]))
        for r in duckdb.sql(sql).fetchall()
    }
    assert want == got


@pytest.mark.parametrize("seed", [11, 23, 47])
def test_pack_differential_random(spark, seed):
    """Random sizes (incl. zeros and oversize) through pack_sequences vs
    the recursive-CTE DuckDB twin — exact agreement."""
    import duckdb
    import numpy as np

    from diffsync_spark.functions.assemble import pack_sequences, pack_sql

    rng = np.random.default_rng(seed)
    n = 80
    sizes = rng.choice([0, 1, 50, 500, 1500, 2500], size=n).tolist()
    rows = [(i, int(sizes[i]), i % 3) for i in range(n)]
    df = spark.createDataFrame(rows, "doc_id long, sz long, bkt int")
    got = {
        r.doc_id: (r.pack_id, r.pack_fill)
        for r in pack_sequences(df, "sz", 2000, "bkt", ("doc_id",)).collect()
    }
    values = ", ".join(f"({i}, {s}, {b})" for i, s, b in rows)
    sql = pack_sql(
        f"SELECT * FROM (VALUES {values}) AS t(doc_id, sz, bkt)",
        "sz", 2000, "bkt", ("doc_id",), payload_cols=("doc_id",),
    )
    want = {int(r[1]): (int(r[3]), int(r[4]))
            for r in duckdb.sql(sql).fetchall()}
    assert got == want


def test_filter_top_fraction_edges(spark, docs):
    from diffsync_spark.functions.sampling import filter_top_fraction

    n = docs.count()
    for exact in (True, False):
        assert filter_top_fraction(docs, "n_chars", 1.0, ["lang"],
                                   exact=exact).count() == n
        assert filter_top_fraction(docs, "n_chars", 0.0, ["lang"],
                                   exact=exact).count() == 0
    # a NULL stratum is a stratum: approx path must keep its rows
    withnull = docs.withColumn(
        "lang2",
        F.when(F.col("doc_id") % 5 == 0, None).otherwise(F.col("lang")),
    )
    kept = filter_top_fraction(withnull, "n_chars", 0.5, ["lang2"],
                               exact=False)
    assert kept.filter("lang2 IS NULL").count() > 0


def test_decontaminate_tiers(spark):
    from diffsync_spark.functions.decontaminate import (
        flag_exact,
        flag_ngram_overlap,
    )

    corpus = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "THE QUICK   brown fox jumps over the lazy dog"),  # exact dup (normalized)
            (3, "quick brown fox jumps over something entirely new here"),  # partial
            (4, "completely unrelated text about spark engines"),
        ],
        "doc_id long, text string",
    )
    block = corpus.filter("doc_id = 1")
    e = {r.doc_id: r.contaminated_exact
         for r in flag_exact(corpus, block).collect()}
    assert e == {1: True, 2: True, 3: False, 4: False}
    g = {r.doc_id: (r.n_block_shingles, r.contaminated_ngram)
         for r in flag_ngram_overlap(corpus, block, min_hits=2).collect()}
    assert g[1][1] and g[2][1]  # verbatim: all shingles hit
    assert g[3][0] >= 2 and g[3][1]  # embedded copy caught by overlap
    assert g[4] == (0, False)
    # plan shape: blocklist is broadcast, corpus never shuffles its text
    plan = (
        flag_exact(corpus, block)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan


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

def test_mix_weighted(spark):
    """Per-source multiplicities: weight 2.0 -> exactly 2 copies of every
    row; 0 -> dropped; default applies to unlisted sources; fractional
    weights select the SAME deterministic md5-slice as repeat_dataset; one
    Generate, no shuffle."""
    from diffsync_spark.functions.sampling import mix_weighted, repeat_dataset

    df = spark.createDataFrame(
        [(i, f"src{i % 4}") for i in range(400)], "doc_id long, source string"
    )
    out = mix_weighted(df, "source", {"src0": 2.0, "src1": 0.0, "src2": 0.5},
                       ["doc_id"], salt="t")
    pdf = out.toPandas()
    by_src = pdf.groupby("source")["doc_id"].count().to_dict()
    assert by_src.get("src0") == 200           # 2.0 -> every row twice
    assert "src1" not in by_src                # 0.0 -> dropped
    assert 20 <= by_src.get("src2", 0) <= 80   # 0.5-slice of 100
    assert "src3" not in by_src                # default_weight 0
    # fractional membership == repeat_dataset's slice (same rule, same salt)
    want = {r.doc_id for r in repeat_dataset(
        df.filter("source = 'src2'"), 0.5, ["doc_id"], salt="t").collect()}
    got = {r.doc_id for r in out.filter("source = 'src2'").collect()}
    assert got == want
    # copy_idx is 0..n-1 per row
    assert set(pdf[pdf.source == "src0"]["copy_idx"]) == {0, 1}
    # plan: pure Generate, no Exchange
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Generate" in plan


def test_mix_weighted_matches_duckdb(spark):
    import duckdb

    from diffsync_spark.functions.sampling import mix_sql, mix_weighted

    sf = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf}/documents.parquet").select(
        "doc_id", "source")
    w = {"src0": 2.3, "src1": 1.0, "src2": 0.4}
    got = (mix_weighted(docs, "source", w, ["doc_id"], default_weight=0.25)
           .toPandas().sort_values(["doc_id", "copy_idx"]).reset_index(drop=True))
    sql = mix_sql("SELECT doc_id, source FROM "
                  f"'{sf}/documents.parquet'", "source", w, ["doc_id"],
                  default_weight=0.25)
    want = (duckdb.sql(sql).df()
            .sort_values(["doc_id", "copy_idx"]).reset_index(drop=True))
    assert len(got) == len(want)
    assert (got["doc_id"].values == want["doc_id"].values).all()
    assert (got["copy_idx"].values == want["copy_idx"].values).all()
