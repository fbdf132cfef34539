"""Plan-shape regression tests — the tuned physical plans from PLANS.md,
encoded as assertions so a future change can't silently regress them.

Each test pins the property that matters at 100 TB (shuffle count, exchange
sharing, broadcast choice, map-side pruning, parquet pushdown), not the whole
plan string. Counting "Exchange hashpartitioning" isolates SHUFFLE exchanges
(BroadcastExchange / ReusedExchange spell differently).
"""

from __future__ import annotations

import datetime

import numpy as np
from pyspark.sql import functions as F

from diffsync_spark.model import TRANSCRIPT_MODEL
from diffsync_spark.operators.diff import diff
from diffsync_spark.operators.lww import lww_dedup

SF_DIR = "/root/testdata/sf0.001"

_CDC = (
    "conv_id string, turn_idx int, role string, text string, tool string, "
    "ts timestamp, op string, seq long"
)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _rows(n=4):
    t0 = datetime.datetime(2025, 1, 1)
    return [
        (f"c{i}", i, "user", f"t{i}", None, t0, "update", i) for i in range(n)
    ]


def test_diff_two_exchanges_fullouter_smj(spark):
    """diff() = one shuffle per input side + a full-outer SMJ, with ALL
    classification logic in the project above it — no third exchange, no
    extra join (PLANS.md:7-88)."""
    src = spark.createDataFrame(_rows(), _CDC).drop("op", "seq")
    dst = spark.createDataFrame(_rows(), _CDC).drop("op", "seq")
    plan = _plan(diff(src, dst, TRANSCRIPT_MODEL))
    assert plan.count("Exchange hashpartitioning") == 2
    assert "SortMergeJoin" in plan and "FullOuter" in plan
    assert plan.count("SortMergeJoin") == 1


def test_lww_then_join_shares_partitioning(spark):
    """The merge's scale contract: the LWW window's hash partitioning on the
    natural key SATISFIES the downstream keyed join, so the batch side adds
    no second shuffle between WindowExec and the join (plain `==` keys —
    eqNullSafe would break this; see table.py merge)."""
    batch = spark.createDataFrame(_rows(), _CDC)
    cur = spark.createDataFrame(_rows(), _CDC).drop("op", "seq")
    deduped = lww_dedup(batch, TRANSCRIPT_MODEL)
    cond = None
    for k in TRANSCRIPT_MODEL.identifiers:
        e = deduped[k] == cur[k]
        cond = e if cond is None else cond & e
    plan = _plan(deduped.join(cur, cond, "full_outer"))
    # one shuffle for the window input + one for the cur side — NOT three
    assert plan.count("Exchange hashpartitioning") == 2
    # the rank-limit pushdown is the merge path's hot-key defence: a PARTIAL
    # WindowGroupLimit below the exchange pre-reduces each map partition to
    # one candidate row per natural key, so 10^6 duplicate events for one hot
    # conversation shuffle as ~n_map_partitions rows, not 10^6 — map-side
    # combine for row_number()==1, without any aggregate fallback
    assert plan.count("WindowGroupLimit") == 2  # Partial (map-side) + Final
    # the Partial one is BELOW the window's exchange (prints after it in the
    # tree string); the Final sits above it
    assert plan.rindex("WindowGroupLimit") > plan.index(
        "Exchange hashpartitioning"
    )


def test_cosine_topk_broadcasts_queries(spark):
    """cosine_topk: queries broadcast, corpus never shuffles for the score
    (the only hashpartitioning exchange is the per-query top-k window)."""
    from diffsync_spark.functions.similarity import cosine_topk

    corpus = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(8)],
        "vec_id long, embedding array<float>",
    )
    queries = corpus.limit(2).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    plan = _plan(cosine_topk(corpus, queries, k=3))
    assert "BroadcastExchange" in plan
    assert "SortMergeJoin" not in plan
    assert plan.count("Exchange hashpartitioning") == 1  # top-k window only


def test_assemble_max_items_prunes_map_side(spark):
    """assemble_sequences(max_items=...): the rank filter must compile to a
    WindowGroupLimit so a 10M-row hot key ships max_items rows, not 10M."""
    from diffsync_spark.functions.assemble import assemble_sequences

    df = spark.createDataFrame(
        [(1, 1, "a", datetime.datetime(2025, 1, 1))],
        "user_id long, event_id long, v string, ts timestamp",
    )
    plan = _plan(
        assemble_sequences(df, ("user_id",), ("ts", "event_id"), "v",
                           max_items=2)
    )
    assert "WindowGroupLimit" in plan


def test_parquet_scan_pushdown_and_pruning(spark, tmp_path):
    """A filtered two-column projection over the documents table must reach
    the scan: PushedFilters carries the predicate and ReadSchema carries
    ONLY the projected columns (no full-row read for a narrow query).

    Scans a PRIVATE copy of the table: other test modules cache() the
    shared sf0.001 read, and Spark's cache manager would substitute an
    InMemoryRelation for any matching sub-plan, hiding the scan."""
    path = str(tmp_path / "docs_pushdown")
    spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(200).write.parquet(path)
    docs = spark.read.parquet(path)
    q = docs.filter(F.col("lang") == "en").select("doc_id", "lang")
    scan = [
        s for s in _plan(q).split("\n") if "FileScan" in s or "Scan parquet" in s
    ]
    joined = " ".join(scan) or _plan(q)
    assert "PushedFilters" in joined and "lang" in joined.split("PushedFilters")[1].split("]")[0]
    read_schema = joined.split("ReadSchema")[1]
    assert "doc_id" in read_schema and "lang" in read_schema
    assert "text" not in read_schema  # untouched wide column pruned


def test_minhash_bucket_cap_shares_band_exchange(spark):
    """minhash_lsh_pairs' bucket-size cap must share the (band, bh) exchange
    with the candidate self-join — the cap is free of extra shuffles."""
    from diffsync_spark.functions.dedup import minhash_lsh_pairs

    docs = spark.createDataFrame(
        [(i, f"doc number {i} words here") for i in range(6)],
        "doc_id long, text string",
    )
    capped = _plan(minhash_lsh_pairs(docs, num_hashes=8, bands=4))
    uncapped = _plan(
        minhash_lsh_pairs(docs, num_hashes=8, bands=4, max_bucket_size=None)
    )
    n_capped = capped.count("Exchange hashpartitioning")
    n_uncapped = uncapped.count("Exchange hashpartitioning")
    # the count window rides the join's existing band exchange: at most one
    # extra shuffle total vs the uncapped plan (the post-window re-shuffle
    # of the filtered side), never one per side
    assert n_capped <= n_uncapped + 1

def test_ann_index_probe_is_partition_pruned(spark, tmp_path):
    """lsh_cosine_topk(index_path=...): the probe scan of a persisted
    build_ann_index corpus must carry the probed buckets as
    PartitionFilters — only probed buckets' files are read, never the
    whole index (the compute-once/look-up-many 100 TB shape)."""
    from diffsync_spark.functions.similarity import (
        build_ann_index, lsh_cosine_topk,
    )

    rng = np.random.default_rng(5)
    corpus = spark.createDataFrame(
        [(i, rng.standard_normal(8).astype(float).tolist()) for i in range(64)],
        "vec_id long, embedding array<float>",
    )
    idx = str(tmp_path / "ann_index")
    build_ann_index(corpus, idx, n_planes=6, seed=11)
    queries = corpus.limit(2).select(
        F.col("vec_id").alias("query_id"), "embedding")
    out = lsh_cosine_topk(None, queries, k=3, probes=3, index_path=idx)
    plan = _plan(out)
    scan = [s for s in plan.split("\n")
            if ("FileScan" in s or "Scan parquet" in s) and "ann_index" in s]
    joined = " ".join(scan)
    pf = joined.split("PartitionFilters")[1].split("]")[0]
    assert "bucket" in pf and "IN" in pf.upper()


def test_ivf_index_probe_is_partition_pruned(spark, tmp_path):
    """ivf_cosine_topk(index_path=...): the probe scan of a persisted
    build_ivf_index corpus must carry the probed cells as
    PartitionFilters — only probed cells' files are read, never the
    whole index (the compute-once/look-up-many 100 TB shape)."""
    from diffsync_spark.functions.similarity import (
        build_ivf_index, ivf_cosine_topk,
    )

    rng = np.random.default_rng(7)
    corpus = spark.createDataFrame(
        [(i, rng.standard_normal(8).astype(float).tolist()) for i in range(64)],
        "vec_id long, embedding array<float>",
    )
    idx = str(tmp_path / "ivf_index")
    build_ivf_index(corpus, idx, n_centroids=6)
    queries = corpus.limit(2).select(
        F.col("vec_id").alias("query_id"), "embedding")
    out = ivf_cosine_topk(None, queries, k=3, n_probe=2, index_path=idx)
    plan = _plan(out)
    scan = [s for s in plan.split("\n")
            if ("FileScan" in s or "Scan parquet" in s) and "ivf_index" in s]
    joined = " ".join(scan)
    pf = joined.split("PartitionFilters")[1].split("]")[0]
    assert "cid" in pf and "IN" in pf.upper()


def test_ivf_topk_corpus_never_hash_shuffled(spark):
    """ivf_cosine_topk: assignment is a pure projection (one-row broadcast
    centroid array + array_max fold), the probe join is broadcast — the
    only hashpartitioning exchanges are per-query windows, and the final
    top-k is map-side pruned by WindowGroupLimit."""
    from diffsync_spark.functions.similarity import ivf_cosine_topk

    corpus = spark.createDataFrame(
        [(i, [float(i % 7), 1.0, float(i % 3)]) for i in range(50)],
        "vec_id long, embedding array<float>",
    )
    queries = corpus.limit(2).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    plan = _plan(ivf_cosine_topk(corpus, queries, k=3, n_centroids=4, n_probe=2))
    assert "SortMergeJoin" not in plan
    # per-query windows only (final rank; probe-ranking may add one on the
    # tiny query side) — never a corpus-wide exchange
    assert plan.count("Exchange hashpartitioning") <= 2
    assert "BroadcastExchange" in plan
    assert "WindowGroupLimit" in plan


def test_mor_fold_one_exchange_with_mapside_prune(spark, tmp_path):
    """The merge-on-read fold (PLANS.md "merge-on-read fold"): base+layers
    resolve through ONE hash exchange on the natural key, and Spark's
    rank-limit pushdown inserts a PARTIAL WindowGroupLimit BEFORE it, so
    per-key losers are pruned map-side and the shuffle carries only
    candidate winners."""
    from diffsync_spark.sinks.table import SnapshotTable

    src = spark.createDataFrame(_rows(8), _CDC).drop("op", "seq")
    t = SnapshotTable.create(
        spark, str(tmp_path / "mor_plan"), TRANSCRIPT_MODEL,
        schema=src.schema, n_buckets=4, write_mode="mor",
    )
    t.merge(src.withColumn("op", F.lit("insert")), mode="force",
            checkpoint_id="boot", batch_id=0)
    t.merge(spark.createDataFrame(_rows(8), _CDC), checkpoint_id="c",
            batch_id=1)
    assert t._manifest().get("deltas"), "setup: expected a delta layer"
    plan = _plan(t.read())
    assert plan.count("Exchange hashpartitioning") == 1
    assert plan.count("WindowGroupLimit") == 2  # Partial (map-side) + Final
    # map-side prune sits BELOW the exchange
    assert plan.index("WindowGroupLimit") < plan.index(
        "Exchange hashpartitioning"
    ) or "Partial" in plan[: plan.index("Exchange hashpartitioning")]
    # the fold's LWW ordering is the committed one
    assert "DESC NULLS FIRST" in plan and "__commit" in plan


def test_mor_delta_free_buckets_skip_the_fold(spark, tmp_path):
    """Buckets with no delta layers must stream through WITHOUT a window:
    reading only such buckets plans zero exchanges (pure scan+filter)."""
    from diffsync_spark.sinks.table import SnapshotTable

    src = spark.createDataFrame(_rows(64), _CDC).drop("op", "seq")
    t = SnapshotTable.create(
        spark, str(tmp_path / "mor_prune"), TRANSCRIPT_MODEL,
        schema=src.schema, n_buckets=8, write_mode="mor",
    )
    t.merge(src.withColumn("op", F.lit("insert")), mode="force",
            checkpoint_id="boot", batch_id=0)
    # touch exactly one key → one bucket gets a layer
    t.merge(spark.createDataFrame(_rows(1), _CDC), checkpoint_id="c",
            batch_id=1)
    layered = sorted(t._delta_buckets(t._manifest()))
    assert len(layered) == 1
    clean = [b for b in range(8) if b not in layered]
    plan = _plan(t.read(buckets=clean))
    assert "Exchange" not in plan and "Window" not in plan
    # while the layered bucket's read does fold
    plan_l = _plan(t.read(buckets=layered))
    assert "Window" in plan_l


def test_frame_sample_filters_before_the_arrow_udf(spark):
    """Video frame sampling: the kind filter and the payload-only
    projection must sit BELOW MapInPandas (only video payload bytes cross
    into Arrow), and the whole decode is shuffle-free."""
    from diffsync_spark.functions.multimodal import fake_assets, frame_sample

    plan = _plan(frame_sample(fake_assets(spark, n=12), every_ms=500))
    assert "Exchange" not in plan
    # the formatted tree roots at MapInPandas with Filter+Project below it
    assert "MapInPandas" in plan and "Filter" in plan
    assert "kind" in plan  # the video predicate exists JVM-side
    # tree-string roots first: Filter/Project must sit BELOW MapInPandas
    assert plan.index("Filter") > plan.index("MapInPandas")
    # the UDF's input is exactly (asset_id, payload) — wide asset columns
    # (mime, duration_ms, width, ...) are projected away before Arrow
    proj_lines = [ln for ln in plan.splitlines()
                  if "Project [" in ln and "payload" in ln]
    assert proj_lines, plan
    assert all("duration_ms" not in ln and "mime" not in ln
               for ln in proj_lines)
