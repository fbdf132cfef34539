"""Regenerate PLANS.md: the optimized physical plans of the core operators,
with the properties each plan must exhibit. Run after plan-affecting changes:

    PYTHONPATH=. python scripts/dump_plans.py > PLANS.md
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

import __spark_entry__ as entry  # noqa: E402
from diffsync_spark import build_session, diff, lww_dedup  # noqa: E402
from diffsync_spark.functions.dedup import exact_dedup, minhash_lsh_pairs  # noqa: E402
from diffsync_spark.functions.similarity import cosine_topk  # noqa: E402
from diffsync_spark.plans.threeway import patch_snapshot  # noqa: E402

SF = "/root/testdata/sf0.01"


def _debezium_decode_case(s):
    from pyspark.sql import types as T

    from diffsync_spark.sources.cdc_formats import from_debezium

    raw = (
        s.read.parquet(f"{SF}/events.parquet")
        .select(F.to_json(F.struct("event_id", "user_id")).alias("value"))
    )
    row = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("event_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("val", T.DoubleType()),
        ]
    )
    return from_debezium(raw, entry.EVENT_MODEL, row)


def _ann_index_case(s):
    import tempfile

    from diffsync_spark.functions.similarity import (
        build_ann_index,
        lsh_cosine_topk,
    )

    idx = tempfile.mkdtemp(prefix="plans_ann_") + "/index"
    build_ann_index(s.read.parquet(f"{SF}/embeddings.parquet"), idx,
                    n_planes=8, seed=42)
    queries = (
        s.read.parquet(f"{SF}/embeddings.parquet")
        .filter(F.col("vec_id") < 3)
        .select(F.col("vec_id").alias("query_id"), "embedding")
    )
    return lsh_cosine_topk(None, queries, k=5, probes=4, index_path=idx)


def _lookup_many_case(s):
    import tempfile

    from diffsync_spark.sinks.table import SnapshotTable

    tmp = tempfile.mkdtemp(prefix="plans_lm_") + "/tbl"
    snap = entry._src(s, SF)
    t = SnapshotTable.create(s, tmp, entry.EVENT_MODEL, schema=snap.schema,
                             n_buckets=8)
    t.merge(snap.withColumn("op", F.lit("insert")), mode="force",
            checkpoint_id="b", batch_id=0)
    keys = snap.select("user_id", "event_id").filter(F.col("user_id") % 19 == 1)
    return t.lookup_many(keys)



def _mor_fold_case(s):
    """A small merge-on-read table with two delta layers: the read plan is
    the base+layers fold."""
    import tempfile

    from diffsync_spark.model import TRANSCRIPT_MODEL
    from diffsync_spark.fixtures import gen_source
    from diffsync_spark.sinks.table import SnapshotTable

    tmp = tempfile.mkdtemp(prefix="plans_mor_")
    df = s.createDataFrame(gen_source(n_convs=60, seed=3))
    t = SnapshotTable.create(s, f"{tmp}/t", TRANSCRIPT_MODEL,
                             schema=df.schema, n_buckets=4, write_mode="mor")
    t.merge(df.withColumn("op", F.lit("insert")), mode="force",
            checkpoint_id="b", batch_id=0)
    for i in (1, 2):
        t.merge(df.limit(8).withColumn("op", F.lit("upsert"))
                .withColumn("ts", F.expr(f"ts + interval {i} day")),
                checkpoint_id="c", batch_id=i)
    return t.read_raw()


def _scan_case(s):
    """Stats-pruned filtered read of a CoW table (ts conjunct)."""
    import datetime
    import tempfile

    from diffsync_spark.model import TRANSCRIPT_MODEL
    from diffsync_spark.fixtures import gen_source
    from diffsync_spark.sinks.table import SnapshotTable

    tmp = tempfile.mkdtemp(prefix="plans_scan_")
    df = s.createDataFrame(gen_source(n_convs=60, seed=3))
    t = SnapshotTable.create(s, f"{tmp}/t", TRANSCRIPT_MODEL,
                             schema=df.schema, n_buckets=4)
    t.merge(df.withColumn("op", F.lit("insert")), mode="force",
            checkpoint_id="b", batch_id=0)
    return t.scan([("ts", ">=", datetime.datetime(1970, 1, 1)),
                   ("turn_idx", "<", 3)])


def _zorder_scan_case(s):
    """2-D box scan over a Z-order-clustered table."""
    import tempfile

    from diffsync_spark.model import ModelSchema
    from diffsync_spark.sinks.table import SnapshotTable

    m = ModelSchema(name="pt", identifiers=("k",), attributes=("x", "y"),
                    version_cols=("ts",))
    tmp = tempfile.mkdtemp(prefix="plans_zorder_")
    df = s.range(5000).select(
        F.col("id").cast("int").alias("k"),
        F.pmod(F.xxhash64("id", F.lit(1)), F.lit(1000)).cast("int").alias("x"),
        F.pmod(F.xxhash64("id", F.lit(2)), F.lit(1000)).cast("int").alias("y"),
        F.current_timestamp().alias("ts"),
    )
    t = SnapshotTable.create(s, f"{tmp}/t", m, schema=df.schema, n_buckets=2)
    t.merge(df.withColumn("op", F.lit("insert")), mode="force",
            checkpoint_id="b", batch_id=0)
    t.compact(zorder=["x", "y"], zorder_files_per_bucket=4)
    return t.scan([("x", "<", 100), ("y", "<", 100)])


def _change_feed_case(s):
    """Delta-CDF flatten over the two-exchange diff."""
    import datetime
    import tempfile

    from diffsync_spark.model import TRANSCRIPT_MODEL
    from diffsync_spark.fixtures import gen_source
    from diffsync_spark.sinks.table import SnapshotTable

    tmp = tempfile.mkdtemp(prefix="plans_cdf_")
    df = s.createDataFrame(gen_source(n_convs=40, seed=5))
    t = SnapshotTable.create(s, f"{tmp}/t", TRANSCRIPT_MODEL,
                             schema=df.schema, n_buckets=4)
    t.merge(df.withColumn("op", F.lit("insert")), mode="force",
            checkpoint_id="b", batch_id=0)
    v1 = t.current_version()
    chg = s.createDataFrame(
        [("c0", 0, "user", "edited", None,
          datetime.datetime(2030, 1, 1), "update")],
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp, op string")
    t.merge(chg, checkpoint_id="c", batch_id=1)
    return t.change_feed(v1)


CASES = [
    (
        "diff (keyed full-outer classify)",
        "One Exchange per input side; FullOuter SortMergeJoin; ALL "
        "classification (op, changed_cols, before/after structs) inside the "
        "post-join Project — whole-stage codegen, no extra shuffle.",
        lambda s: diff(entry._src(s, SF), entry._dst(s, SF), entry.EVENT_MODEL),
    ),
    (
        "lww_dedup (last-writer-wins window)",
        "Single Exchange on the natural key; WindowGroupLimit pushes the "
        "per-key top-1 below the shuffle (map-side prune); filter rn=1.",
        lambda s: lww_dedup(
            entry._changelog(s, SF).withColumn("k", F.col("event_id") % 100),
            entry.LWW_MODEL,
        ),
    ),
    (
        "patch_snapshot (three-way: snapshot × changelog winners)",
        "The LWW window and the full-outer join SHARE one hash partitioning "
        "on the natural key — the changelog shuffles once, not twice "
        "(plain `=` keys; non-null by contract).",
        lambda s: patch_snapshot(
            entry._src(s, SF), entry._changelog(s, SF), entry.EVENT_MODEL
        ),
    ),
    (
        "exact_dedup (content-key window)",
        "Exchange partitions on two xxhash64 projections (16-byte key), "
        "never the document text; text rides as payload only.",
        lambda s: exact_dedup(s.read.parquet(f"{SF}/documents.parquet")),
    ),
    (
        "minhash_lsh_pairs (banded near-dup)",
        "The banding Generate (explode) outputs only (id, band, bh); the "
        "candidate self-join shuffles ids + 4-byte hashes; text joins back "
        "once, post-candidate-dedup, for exact-Jaccard verification.",
        lambda s: minhash_lsh_pairs(s.read.parquet(f"{SF}/documents.parquet"), 0.7),
    ),
    (
        "stratified_sample (per-stratum quota)",
        "One Exchange on the strata columns; WindowGroupLimit prunes each "
        "stratum to the quota on the map side BEFORE the shuffle and again "
        "below the final sort — a mega-stratum never sorts whole.",
        lambda s: __import__(
            "diffsync_spark.functions.sampling", fromlist=["stratified_sample"]
        ).stratified_sample(
            s.read.parquet(f"{SF}/documents.parquet"),
            ["lang", "source"], 5, ["doc_id"],
        ),
    ),
    (
        "sessionize (gap-based session labels)",
        "Both window functions (lag + running sum) share ONE Exchange and "
        "ONE Sort on (key, ts, tiebreak) — two Window nodes, zero extra "
        "shuffles or sorts.",
        lambda s: __import__(
            "diffsync_spark.functions.sessions", fromlist=["sessionize"]
        ).sessionize(
            s.read.parquet(f"{SF}/events.parquet")
            .select("user_id", "event_id",
                    F.col("ts").cast("timestamp").alias("ts")),
            ("user_id",), "ts", 600, tiebreak_cols=("event_id",),
        ),
    ),
    (
        "from_debezium (CDC envelope decode)",
        "Pure projection: Scan → Project(from_json) only — NO Exchange, so "
        "the decoder streams and fuses into whatever consumes it.",
        lambda s: _debezium_decode_case(s),
    ),
    (
        "repeat_dataset (fractional training-mix epochs)",
        "Pure Generate: Scan → Project(md5 copy-count) → Generate(explode) "
        "— NO Exchange; copies enter downstream shuffles as ordinary rows.",
        lambda s: __import__(
            "diffsync_spark.functions.sampling", fromlist=["repeat_dataset"]
        ).repeat_dataset(
            s.read.parquet(f"{SF}/documents.parquet"), 2.3, ["doc_id"]
        ),
    ),
    (
        "profile (one-pass dataset health check)",
        "ALL columns' metrics in ONE aggregation over ONE scan: partial "
        "HashAggregate map-side, a single exchange of one merged row.",
        lambda s: __import__(
            "diffsync_spark.functions.profile", fromlist=["profile"]
        ).profile(s.read.parquet(f"{SF}/documents.parquet")),
    ),
    (
        "cosine_topk (brute-force exact ANN baseline)",
        "Queries broadcast (BroadcastExchange + BroadcastNestedLoopJoin); "
        "ZERO corpus shuffle; per-query top-k via WindowGroupLimit.",
        lambda s: cosine_topk(
            s.read.parquet(f"{SF}/embeddings.parquet"),
            s.read.parquet(f"{SF}/embeddings.parquet")
            .filter(F.col("vec_id") < 3)
            .select(F.col("vec_id").alias("query_id"), "embedding"),
            k=5,
        ),
    ),
    (
        "lsh_cosine_topk (query-directed multi-probe ANN)",
        "Corpus hashes once into sign buckets (pure projection); the probe "
        "set (own bucket + smallest-|dot| bit flips) is a per-query Generate "
        "— probe selection adds NO shuffle; exact rerank only inside probed "
        "buckets.",
        lambda s: __import__(
            "diffsync_spark.functions.similarity", fromlist=["lsh_cosine_topk"]
        ).lsh_cosine_topk(
            s.read.parquet(f"{SF}/embeddings.parquet"),
            s.read.parquet(f"{SF}/embeddings.parquet")
            .filter(F.col("vec_id") < 3)
            .select(F.col("vec_id").alias("query_id"), "embedding"),
            k=5,
        ),
    ),
    (
        "lsh_cosine_topk via persisted index (partition-pruned probe)",
        "The probe scan of a build_ann_index corpus carries the query set's "
        "probe buckets as PartitionFilters — only probed buckets' files are "
        "read; signatures were computed ONCE at index-build time, so the "
        "per-query cost is a pruned scan + rerank, never a corpus pass.",
        lambda s: _ann_index_case(s),
    ),
    (
        "lookup_many (bulk keyed probe of a SnapshotTable)",
        "The table side is an explicit file-list scan of ONLY the probed "
        "buckets/slots — the manifest pruning happens BEFORE the plan "
        "exists (file-count evidence in test_lookup_many); the deduped key "
        "set then joins LeftSemi (broadcast under AQE), so a probe never "
        "shuffles table data.",
        lambda s: _lookup_many_case(s),
    ),
    (
        "simhash_neardup_pairs (capped pigeonhole banding)",
        "Each self-join side computes its max_bucket_size count window on "
        "the SAME (chunk, ck) exchange that feeds the join — the "
        "degenerate-bucket cap adds ZERO extra shuffles (at this sf AQE "
        "then broadcasts the small post-cap side).",
        lambda s: __import__(
            "diffsync_spark.functions.dedup", fromlist=["simhash_neardup_pairs"]
        ).simhash_neardup_pairs(
            s.read.parquet(f"{SF}/documents.parquet"), max_bucket_size=10_000
        ),
    ),
    (
        "filter_top_fraction approx path (corpus-scale quality filter)",
        "Per-stratum approx_percentile thresholds aggregate to a TINY frame "
        "that broadcast-joins back as a filter — no per-stratum sort of the "
        "corpus, two scans total.",
        lambda s: __import__(
            "diffsync_spark.functions.sampling", fromlist=["filter_top_fraction"]
        ).filter_top_fraction(
            s.read.parquet(f"{SF}/documents.parquet"),
            "n_chars", 0.3, ["lang"], exact=False,
        ),
    ),
    (
        "merge-on-read fold (base + delta layers -> one winner per key)",
        "Base and layer scans union below ONE Exchange on the natural key; "
        "the rank<=1 WindowGroupLimit runs partial BEFORE the exchange "
        "(map-side prune) and final after; delta-free buckets would bypass "
        "the fold entirely (separate plain scan branch).",
        lambda s: _mor_fold_case(s),
    ),
    (
        "scan (stats-pruned filtered read)",
        "File skipping happened BEFORE this plan existed: the manifest's "
        "per-file (min,max) stats and hash-bucket routing shrank the "
        "explicit file list (file-count evidence in test_scan_pruning); "
        "the residual conjuncts remain as ordinary PushedFilters on the "
        "surviving files.",
        lambda s: _scan_case(s),
    ),
    (
        "zorder box scan (Morton-clustered 2-D pruning)",
        "The scan reads only the files whose recorded (min,max) intersect "
        "the box on EITHER clustered column; inside, parquet pushes both "
        "conjuncts (PushedFilters) and projects narrowly (ReadSchema).",
        _zorder_scan_case,
    ),
    (
        "change_feed (Delta-CDF flatten)",
        "One Generate (explode of the 1-or-2 image array) over the "
        "existing two-exchange diff — the flatten adds ZERO shuffles; "
        "bucket pruning keeps both sides to the changed buckets' files.",
        _change_feed_case,
    ),
    (
        "quantized_cosine_topk (int8 scoring)",
        "Identical shape to the exact operator: BroadcastExchange of the "
        "queries, zero corpus shuffle, per-query WindowGroupLimit top-k; "
        "the quantization is two extra projections, no new exchange.",
        lambda s: __import__(
            "diffsync_spark.functions.similarity",
            fromlist=["quantized_cosine_topk"],
        ).quantized_cosine_topk(
            s.read.parquet(f"{SF}/embeddings.parquet"),
            s.read.parquet(f"{SF}/embeddings.parquet")
            .filter(F.col("vec_id") < 3)
            .select(F.col("vec_id").alias("query_id"), "embedding"),
            k=5,
        ),
    ),
]


def main() -> None:
    spark = build_session(master="local[4]", shuffle_partitions=4,
                          app_name="dump_plans")
    print("# PLANS — optimized physical plans of the core operators")
    print()
    print("Generated by `scripts/dump_plans.py` at sf0.01. Each section states")
    print("the property the plan must exhibit, then the `explain(\"formatted\")`")
    print("output that shows it.")
    for title, claim, make in CASES:
        df = make(spark)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        print(f"\n## {title}\n")
        print(f"**Property:** {claim}\n")
        print("```")
        # plans can embed control-char literals (e.g. the sampler's \x00
        # null-key marker) — keep the file text
        print(buf.getvalue().strip().replace("\x00", "\\x00"))
        print("```")
    spark.stop()


if __name__ == "__main__":
    main()
