"""Similarity search over embedding columns.

- ``cosine_topk``: brute-force exact top-k — the correctness baseline. The
  query set is broadcast (it's small by definition); the corpus streams
  through one codegen'd projection + a per-query top-k window. Cost O(N·Q·d)
  FLOPs but ZERO shuffle of the corpus (only k rows per query shuffle for
  the final ranking).
- ``lsh_cosine_topk``: the scale path — random-hyperplane buckets with
  multi-probe (query probes its bucket plus single-bit flips), exact rerank
  inside probed buckets. Recall tunable via n_planes/probes.
"""

from __future__ import annotations

import json
import os

import numpy as np
from pyspark.sql import DataFrame, Window, functions as F

from diffsync_spark.sinks.fsio import LocalCommitIO

from diffsync_spark.functions.dedup import (
    _plane_dots,
    _plane_signature,
    _signature_from_dots,
    cosine_col,
)


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact top-k by cosine: broadcast the queries, score every corpus row,
    keep k per query. Output: (query_id, vec_id, cosine, rank)."""
    q = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    c = corpus.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("cv"))
    scored = c.crossJoin(F.broadcast(q)).select(
        "query_id", "vec_id", cosine_col(F.col("cv"), F.col("qv")).alias("cosine")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "cosine", "rank")
    )


def quantize_embeddings(
    df: DataFrame,
    vec_col: str = "embedding",
    out_col: str = "q_embedding",
    scale_col: str = "q_scale",
    keep_vec: bool = False,
) -> DataFrame:
    """Symmetric per-vector int8 quantization: ``scale = 127 / max|x|``,
    ``q_i = round(x_i * scale)`` as ``array<tinyint>`` plus one float
    scale — a 4x smaller embedding column (the standard storage/IO lever
    for a 100 TB vector corpus; parquet stores the bytes bit-packed).
    Worst-case per-element error is ``max|x| / 254``.

    COSINE IS SCALE-INVARIANT: per-vector scales cancel in
    dot/(|a||b|), so similarity over the int8 arrays needs no
    dequantization at all (``quantized_cosine_topk``). An all-zero or
    all-NULL vector gets scale 0 and a zero q-vector.

    Dirty data stays inert instead of fatal: a NaN/Inf element (or an
    all-NaN vector, whose amax is NaN) would make the tinyint cast THROW
    under Spark 4.1's default ANSI mode, aborting an O(corpus) index
    build on one bad row — so the scale zeroes out for non-finite amax
    and each element goes through try_cast + coalesce(0); a dirty vector
    quantizes to zeros, which never rank.

    The scale lands in its own column FIRST and the transform references
    it — embedding the array_max inside the per-element lambda would
    make Catalyst recompute it per element (no CSE across higher-order
    functions; the round-3 minhash lesson)."""
    amax = F.array_max(
        F.transform(F.col(vec_col), lambda x: F.abs(x.cast("double")))
    )
    finite = (~F.isnan(amax)) & (amax < F.lit(float("inf")))
    out = df.withColumn(
        scale_col,
        F.when((amax > 0) & finite, F.lit(127.0) / amax)
        .otherwise(F.lit(0.0)).cast("double"),
    ).withColumn(
        out_col,
        F.transform(
            F.col(vec_col),
            lambda x: F.coalesce(
                F.round(x.cast("double") * F.col(scale_col))
                .try_cast("tinyint"),
                F.lit(0).cast("tinyint"),
            ),
        ),
    )
    if keep_vec or out_col == vec_col:
        return out  # in-place quantization: the output IS the vec column
    return out.drop(vec_col)


def dequantize_embeddings(
    df: DataFrame,
    q_col: str = "q_embedding",
    scale_col: str = "q_scale",
    out_col: str = "embedding",
) -> DataFrame:
    """Inverse of :func:`quantize_embeddings`: ``x ~ q / scale`` as
    ``array<float>`` (scale 0 -> zero vector)."""
    return df.withColumn(
        out_col,
        F.when(
            F.col(scale_col) > 0,
            F.transform(F.col(q_col),
                        lambda v: (v.cast("double") / F.col(scale_col))
                        .cast("float")),
        ).otherwise(
            F.transform(F.col(q_col), lambda v: F.lit(0.0).cast("float"))
        ),
    )


def quantized_cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """``cosine_topk`` over int8-quantized vectors: both sides quantize
    (one projection each), scoring runs on the integer arrays directly —
    scales cancel out of cosine, so the ONLY approximation is the int8
    rounding itself. Same plan shape as the exact operator: queries
    broadcast, zero corpus shuffle, per-query top-k window."""
    c = quantize_embeddings(
        corpus.select(F.col(id_col).alias("vec_id"), vec_col),
        vec_col, "cq", "__cs",
    ).select("vec_id", "cq")
    q = quantize_embeddings(
        queries.select(F.col(query_id_col).alias("query_id"), vec_col),
        vec_col, "qq", "__qs",
    ).select("query_id", "qq")
    scored = c.crossJoin(F.broadcast(q)).select(
        "query_id", "vec_id",
        cosine_col(F.col("cq"), F.col("qq")).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "cosine", "rank")
    )


def _directed_flips(qbucket, marginal, n_probe: int):
    """Probe buckets from the ``n_probe`` most-marginal planes: xor the
    query bucket with each plane's bit. shiftleft, NOT pow(2.0, p): the
    double round-trip is exact only for p < 53, so a plane index past 52
    would silently flip the wrong bit; shiftleft is integral for the full
    0..63 range (call_function because the Python wrapper of F.shiftleft
    only takes an int numBits, while the SQL function takes a column)."""
    return F.transform(
        F.slice(marginal, 1, n_probe),
        lambda s: qbucket.bitwiseXOR(
            F.call_function("shiftleft", F.lit(1).cast("long"), s["p"])
        ).cast("long"),
    )


ANN_META_FILE = "_ann_meta.json"


def build_ann_index(
    corpus: DataFrame,
    path: str,
    n_planes: int = 12,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    io: LocalCommitIO | None = None,
    quantize: bool = False,
) -> dict:
    """Persist the LSH-bucketed corpus ONCE — the compute-once/look-up-many
    contract of the reference's durable store
    (``/root/reference/diffsync/store/redis.py:24-220``), re-expressed as a
    bucket-partitioned parquet layout: each corpus row's sign signature is
    computed a single time and the rows are written partitioned by
    ``bucket``, so every subsequent :func:`lsh_cosine_topk` probe is a
    PARTITION-PRUNED scan of just the probed buckets — no corpus re-scan,
    no signature re-compute per query call.

    Sizing at scale: bucket count is 2^n_planes; pick ``n_planes`` so the
    expected rows-per-bucket (N / 2^n_planes) fills healthy parquet files
    (e.g. 10^10 vectors at n_planes=16 → ~150k rows/bucket). The plane
    matrix is derived from ``(seed, dim)`` and recorded in a sidecar
    ``_ann_meta.json`` so probes rebuild bit-identical planes.

    ``quantize=True`` stores the vectors int8 (symmetric per-vector, see
    :func:`quantize_embeddings`) — a 4x smaller index on disk and 4x less
    scan IO per probe. Bucketing still happens on the FLOAT vectors (sign
    bits must match the probes' float-side signatures exactly); cosine is
    scale-invariant, so probes rerank on the integer arrays directly and
    the only approximation is the corpus-side rounding."""
    dim = corpus.select(F.size(vec_col).alias("d")).first().d
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_planes, dim))
    c = corpus.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("cv"),
        _plane_signature(F.col(vec_col), planes).alias("bucket"),
    )
    if quantize:
        c = quantize_embeddings(c, "cv", "cv", "__s").drop("__s")
    c.write.mode("overwrite").partitionBy("bucket").parquet(path)
    meta = {"n_planes": n_planes, "seed": seed, "dim": dim,
            "quantized": bool(quantize),
            # int8 layout gets its own format string so a reader/extender
            # that predates quantization refuses instead of appending
            # float files into tinyint partitions (silent wrong neighbors)
            "format": ("diffsync_spark/ann-v2-int8" if quantize
                       else "diffsync_spark/ann-v1")}
    # sidecar goes through the CommitIO seam (same reason as the table's
    # manifests, sinks/fsio.py): swap it for an object-store backend and
    # no raw local-fs open() is left in the index layer
    (io or LocalCommitIO()).write_atomic(
        os.path.join(path, ANN_META_FILE), json.dumps(meta)
    )
    return meta


def extend_ann_index(
    new_vectors: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    io: LocalCommitIO | None = None,
) -> dict:
    """Incrementally add vectors to an existing :func:`build_ann_index`
    layout: signatures are computed with the INDEX'S recorded planes
    (``(seed, dim)`` from the sidecar — never the caller's parameters, so
    an extension can't silently fork the plane family) and appended as new
    files inside the same bucket partitions. Probes see old + new rows
    with no rebuild; cost is O(new vectors), not O(corpus).

    Dedup responsibility stays with the caller (append-only, like the
    reference store's ``add``); for replace semantics rebuild or dedup at
    probe time."""
    meta = json.loads(
        (io or LocalCommitIO()).read_text(os.path.join(path, ANN_META_FILE))
    )
    fmt = meta.get("format")
    if fmt not in ("diffsync_spark/ann-v1", "diffsync_spark/ann-v2-int8"):
        raise ValueError(f"unknown ANN index format {fmt!r} — refusing to "
                         "append an incompatible layout")
    new_dim = new_vectors.select(F.size(vec_col).alias("d")).first().d
    if new_dim != meta["dim"]:
        # zip_with would NULL-pad a mismatched vector into a plausible but
        # WRONG bucket — unfindable rows, silent index corruption
        raise ValueError(
            f"new vectors have dim {new_dim}, index was built with dim "
            f"{meta['dim']} — rebuild the index or fix the input"
        )
    rng = np.random.default_rng(meta["seed"])
    planes = rng.standard_normal((meta["n_planes"], meta["dim"]))
    c = new_vectors.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("cv"),
        _plane_signature(F.col(vec_col), planes).alias("bucket"),
    )
    if meta.get("quantized"):
        # layout contract comes from the sidecar, never the caller: an
        # extension of a quantized index quantizes the same way
        c = quantize_embeddings(c, "cv", "cv", "__s").drop("__s")
    c.write.mode("append").partitionBy("bucket").parquet(path)
    return meta


def lsh_cosine_topk(
    corpus: DataFrame | None,
    queries: DataFrame,
    k: int = 10,
    n_planes: int = 12,
    probes: int = 4,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    probe_strategy: str = "directed",
    index_path: str | None = None,
) -> DataFrame:
    """Approximate top-k: corpus rows hash once into sign buckets; each query
    probes its own bucket plus ``probes`` single-bit-flip buckets, reranking
    exactly within probed buckets.

    Two corpus modes:

    - ``corpus=`` (inline): signatures and buckets are computed in the same
      job — right for one-shot queries.
    - ``index_path=`` (persisted, the 100 TB shape): probe a corpus
      previously written by :func:`build_ann_index`. The union of all probe
      buckets across the query set is pushed into the parquet scan as a
      partition filter, so only the probed buckets' files are read
      (``PartitionFilters`` in the plan — asserted by
      ``tests/test_plan_shapes.py``). ``n_planes``/``seed`` come from the
      index's sidecar metadata, guaranteeing probe/plane agreement.

    ``probe_strategy='directed'`` (default) is query-directed multi-probe:
    flip the planes with the smallest ``|dot(query, plane)|`` — the bits a
    true neighbor is most likely to land on the other side of — giving
    strictly better expected recall than flipping arbitrary bits at the
    same probe count. ``'first'`` keeps the naive first-``probes``-planes
    flips (the recall baseline the tests compare against)."""
    if index_path is not None:
        meta = json.loads(
            LocalCommitIO().read_text(os.path.join(index_path, ANN_META_FILE))
        )
        n_planes, seed, dim = meta["n_planes"], meta["seed"], meta["dim"]
    elif corpus is not None:
        dim = corpus.select(F.size(vec_col).alias("d")).first().d
    else:
        raise ValueError("pass either corpus= or index_path=")
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_planes, dim))

    if index_path is None:
        c = corpus.select(
            F.col(id_col).alias("vec_id"),
            F.col(vec_col).alias("cv"),
            _plane_signature(F.col(vec_col), planes).alias("bucket"),
        )
    n_probe = min(probes, n_planes)
    if probe_strategy == "directed":
        # materialize each plane dot ONCE (split projection): the signature
        # and the marginal ranking both consume every dot, and the aggregate
        # folds run interpreted without subexpression elimination — inlining
        # them twice would double the per-query dot cost
        qd = queries.select(
            F.col(query_id_col).alias("query_id"),
            F.col(vec_col).alias("qv"),
            *[
                d.alias(f"__d{p}")
                for p, d in enumerate(_plane_dots(F.col(vec_col), planes))
            ],
        )
        dot_cols = [F.col(f"__d{p}") for p in range(len(planes))]
        q0 = qd.select(
            "query_id",
            "qv",
            _signature_from_dots(dot_cols).alias("qbucket"),
            # (|dot|, plane) pairs sorted ascending: the most marginal
            # planes first — array_sort on structs is field-lexicographic,
            # ties broken by plane index, matching the DuckDB twin
            F.array_sort(
                F.array(
                    *[
                        F.struct(F.abs(d).alias("a"), F.lit(p).alias("p"))
                        for p, d in enumerate(dot_cols)
                    ]
                )
            ).alias("__marginal"),
        )
        flips = _directed_flips(
            F.col("qbucket"), F.col("__marginal"), n_probe
        )
        probe_buckets = F.concat(F.array(F.col("qbucket")), flips)
    elif probe_strategy == "first":
        q0 = queries.select(
            F.col(query_id_col).alias("query_id"),
            F.col(vec_col).alias("qv"),
            _plane_signature(F.col(vec_col), planes).alias("qbucket"),
        )
        probe_buckets = F.array(
            F.col("qbucket"),
            *[
                F.col("qbucket").bitwiseXOR(F.lit(1 << p)).cast("long")
                for p in range(n_probe)
            ],
        )
    else:
        raise ValueError(f"unknown probe_strategy: {probe_strategy!r}")
    q = q0.select(
        "query_id", "qv", F.explode(probe_buckets).alias("bucket")
    )
    if index_path is not None:
        # the query set is small by contract (same reason the exact path
        # broadcasts it), so the union of its probe buckets is a bounded
        # driver-side list: |Q|·(probes+1) longs, pushed into the scan as
        # a partition filter — only probed buckets' files are read.
        # localCheckpoint materializes the query-side plane-dot/signature
        # plan ONCE: both the bucket collect and the probe join read the
        # checkpointed rows instead of re-running the projection
        q = q.localCheckpoint()
        buckets = [r.bucket for r in q.select("bucket").distinct().collect()]
        c = (
            queries.sparkSession.read.parquet(index_path)
            .filter(F.col("bucket").isin(buckets))
        )
    scored = (
        c.join(q, "bucket")
        .select(
            "query_id", "vec_id", cosine_col(F.col("cv"), F.col("qv")).alias("cosine")
        )
        .dropDuplicates(["query_id", "vec_id"])
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "cosine", "rank")
    )


def ivf_centroids(
    corpus: DataFrame,
    n_centroids: int = 16,
    salt: str = "ivf",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Deterministic IVF coarse quantizer: the ``n_centroids`` corpus
    vectors with the smallest ``md5(salt|id)`` (the same engine-portable
    hash-sampling contract as :mod:`diffsync_spark.functions.sampling` —
    stable across reruns, repartitioning, and engines, so the DuckDB twin
    selects the identical centroid set). A hash-sample of a corpus is the
    classic cheap IVF seeding (k-means iterations refine recall but are
    not required for the partitioning to be valid); at 10^10 vectors the
    selection is a TakeOrdered over a single corpus scan."""
    return (
        corpus.select(
            F.col(id_col).alias("cid"), F.col(vec_col).alias("centv")
        )
        .orderBy(
            F.md5(F.concat_ws("|", F.lit(salt), F.col("cid").cast("string"))),
            F.col("cid"),
        )
        .limit(n_centroids)
    )


IVF_META_FILE = "_ivf_meta.json"
IVF_CENTROID_DIR = "_centroids"


def _ivf_assign(vectors: DataFrame, cent: DataFrame) -> DataFrame:
    """(vec_id, cv) rows + a (cid, centv) centroid frame → (vec_id, cv, cid)
    cell assignment as a PURE PROJECTION: the centroid set (with norms
    precomputed once) rides along as a one-row broadcast array and the
    per-row argmax is ``array_max(transform(...))`` — no N x C row blowup,
    no groupBy exchange, the vectors frame is never shuffled. Each
    centroid's cosine matches :func:`cosine_col` bit-for-bit (same
    sequential fold, same na*nb order, same round-6); ties pick the higher
    cid (array_max on (sim, cid) structs is lexicographic)."""
    cent_arr = cent.select(
        "cid",
        "centv",
        F.sqrt(
            F.aggregate(
                "centv",
                F.lit(0.0),
                lambda acc, x: acc + x.cast("double") * x.cast("double"),
            )
        ).alias("cnorm"),
    ).agg(F.collect_list(F.struct("cid", "centv", "cnorm")).alias("cents"))

    def _dot(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    cvnorm = F.sqrt(
        F.aggregate(
            "cv", F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
        )
    )
    best = F.array_max(
        F.transform(
            F.col("cents"),
            lambda ct: F.struct(
                F.round(
                    _dot(F.col("cv"), ct["centv"])
                    / F.greatest(F.col("__cvnorm") * ct["cnorm"], F.lit(1e-12)),
                    6,
                ).alias("sim"),
                ct["cid"].alias("cid"),
            ),
        )
    )
    return (
        vectors.withColumn("__cvnorm", cvnorm)
        .crossJoin(F.broadcast(cent_arr))
        .select("vec_id", "cv", best["cid"].alias("cid"))
    )


def refine_ivf_centroids(
    corpus: DataFrame,
    n_centroids: int = 16,
    iters: int = 2,
    salt: str = "ivf",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Spherical k-means (Lloyd) refinement of the hash-sampled IVF seed —
    the actual IVF training loop, expressed entirely in DataFrame ops.
    Returns a ``(cid, centv: array<double>)`` centroid frame usable
    anywhere :func:`ivf_centroids`'s output is (including
    :func:`build_ivf_index` via ``refine_iters=``).

    Per iteration: (1) assign every corpus vector to its most-cosine-
    similar centroid — the shuffle-free :func:`_ivf_assign` projection;
    (2) update each cell's centroid to the mean of its UNIT-NORMALIZED
    members (classic spherical k-means — cosine to a centroid is invariant
    to the centroid's scale, so the mean needs no re-normalization);
    (3) cells that captured no rows keep their previous centroid, so the
    cell count never silently shrinks.

    100 TB shape: the corpus is never shuffled — assignment is a
    projection, and the mean is a ``groupBy(cid)`` over ``n_centroids``
    keys whose partial aggregates combine map-side (each task emits at
    most ``n_centroids x dim`` doubles). Per-iteration cost is one corpus
    scan; cache the corpus upstream for multi-iteration runs. The tiny
    centroid frame is localCheckpointed each round — it feeds BOTH the
    next assignment and the empty-cell coalesce, and without truncation
    the dual reference doubles the logical plan per iteration.

    Determinism: cell means are rounded to 5 decimals each iteration, so
    the fixed point is reproducible across engines (the DuckDB twin
    replays the identical seed → assign → mean → coalesce chain);
    vector normalization uses the same sequential fold as
    :func:`cosine_col`, bit-exact across engines."""
    nrm = F.greatest(
        F.sqrt(
            F.aggregate(
                vec_col,
                F.lit(0.0),
                lambda acc, x: acc + x.cast("double") * x.cast("double"),
            )
        ),
        F.lit(1e-12),
    )
    normed = corpus.withColumn("__nrm", nrm).select(
        F.col(id_col).alias("vec_id"),
        F.transform(
            F.col(vec_col), lambda x: x.cast("double") / F.col("__nrm")
        ).alias("cv"),
    )
    dim = corpus.select(F.size(vec_col).alias("d")).first().d
    cent_nrm = F.greatest(
        F.sqrt(
            F.aggregate(
                "centv",
                F.lit(0.0),
                lambda acc, x: acc + x.cast("double") * x.cast("double"),
            )
        ),
        F.lit(1e-12),
    )
    cur = (
        ivf_centroids(corpus, n_centroids, salt, id_col, vec_col)
        .withColumn("__nrm", cent_nrm)
        .select(
            "cid",
            F.transform(
                F.col("centv"), lambda x: x.cast("double") / F.col("__nrm")
            ).alias("centv"),
        )
        .localCheckpoint()
    )
    for _ in range(iters):
        assign = _ivf_assign(normed, cur)
        means = assign.groupBy("cid").agg(
            *[
                F.round(F.avg(F.col("cv")[i]), 5).alias(f"__m{i}")
                for i in range(dim)
            ]
        ).select(
            "cid",
            F.array(*[F.col(f"__m{i}") for i in range(dim)]).alias("mv"),
        )
        cur = (
            cur.join(means, "cid", "left")
            .select("cid", F.coalesce("mv", "centv").alias("centv"))
            .localCheckpoint()
        )
    return cur


def build_ivf_index(
    corpus: DataFrame,
    path: str,
    n_centroids: int = 64,
    salt: str = "ivf",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    io: LocalCommitIO | None = None,
    refine_iters: int = 0,
    quantize: bool = False,
) -> dict:
    """Persist the IVF-partitioned corpus ONCE — the same
    compute-once/look-up-many contract as :func:`build_ann_index` (reference
    analog: ``/root/reference/diffsync/store/redis.py:24-220``), with cells
    instead of sign buckets: every corpus row is assigned to its
    most-cosine-similar centroid a single time (shuffle-free, see
    :func:`_ivf_assign`) and written partitioned by ``cid``, so each
    subsequent :func:`ivf_cosine_topk` probe is a PARTITION-PRUNED scan of
    just the probed cells. The centroid frame is stored beside the data
    (``_centroids/`` parquet — underscore-prefixed, so partition discovery
    ignores it) plus a ``_ivf_meta.json`` sidecar, making probes
    self-contained: no corpus rescan, no centroid recompute per call.

    Sizing at scale: expected rows-per-cell is N / n_centroids — pick
    n_centroids ~ sqrt(N) (classic IVF) or whatever fills healthy parquet
    partitions; the centroid frame stays centroids x dim, tiny next to the
    corpus. ``refine_iters > 0`` runs that many spherical-k-means rounds
    (:func:`refine_ivf_centroids`) before partitioning — better-balanced
    cells at the cost of one extra corpus scan per round."""
    if refine_iters > 0:
        cent = refine_ivf_centroids(
            corpus, n_centroids, refine_iters, salt, id_col, vec_col
        )
    else:
        cent = ivf_centroids(corpus, n_centroids, salt, id_col, vec_col)
    c = corpus.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("cv")
    )
    assigned = _ivf_assign(c, cent)
    if quantize:
        # same int8 contract as build_ann_index(quantize=True): the CELL
        # choice stays on the float vectors (must match the probes'
        # centroid cosines exactly); only the stored payload shrinks, and
        # probes rerank the integer arrays (cosine is scale-invariant)
        assigned = quantize_embeddings(assigned, "cv", "cv", "__s").drop("__s")
    assigned.write.mode("overwrite").partitionBy("cid").parquet(path)
    # centroid frame AFTER the data (overwrite above would wipe it);
    # coalesce(1): one tiny file, read whole by every probe
    cent.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(path, IVF_CENTROID_DIR)
    )
    dim = cent.select(F.size("centv").alias("d")).first().d
    meta = {"n_centroids": n_centroids, "salt": salt, "dim": dim,
            "quantized": bool(quantize),
            "format": ("diffsync_spark/ivf-v2-int8" if quantize
                       else "diffsync_spark/ivf-v1")}
    (io or LocalCommitIO()).write_atomic(
        os.path.join(path, IVF_META_FILE), json.dumps(meta)
    )
    return meta


def extend_ivf_index(
    new_vectors: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    io: LocalCommitIO | None = None,
) -> dict:
    """Incrementally add vectors to a :func:`build_ivf_index` layout:
    assignments use the INDEX'S stored centroids (never recomputed from the
    caller's data, so an extension can't fork the cell family) and append
    as new files inside the same ``cid`` partitions. Cost is O(new
    vectors); probes see old + new rows with no rebuild. Append-only like
    the reference store's ``add`` — dedup stays with the caller."""
    meta = json.loads(
        (io or LocalCommitIO()).read_text(os.path.join(path, IVF_META_FILE))
    )
    fmt = meta.get("format")
    if fmt not in ("diffsync_spark/ivf-v1", "diffsync_spark/ivf-v2-int8"):
        raise ValueError(f"unknown IVF index format {fmt!r} — refusing to "
                         "append an incompatible layout")
    new_dim = new_vectors.select(F.size(vec_col).alias("d")).first().d
    if new_dim != meta["dim"]:
        # zip_with would NULL-pad a mismatched vector into a plausible but
        # WRONG cell — unfindable rows, silent index corruption
        raise ValueError(
            f"new vectors have dim {new_dim}, index was built with dim "
            f"{meta['dim']} — rebuild the index or fix the input"
        )
    cent = new_vectors.sparkSession.read.parquet(
        os.path.join(path, IVF_CENTROID_DIR)
    )
    c = new_vectors.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("cv")
    )
    assigned = _ivf_assign(c, cent)
    if meta.get("quantized"):
        assigned = quantize_embeddings(assigned, "cv", "cv", "__s").drop("__s")
    assigned.write.mode("append").partitionBy("cid").parquet(path)
    return meta


def ivf_cosine_topk(
    corpus: DataFrame | None,
    queries: DataFrame,
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
    salt: str = "ivf",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    index_path: str | None = None,
) -> DataFrame:
    """Approximate top-k via an IVF (inverted-file) coarse partition — the
    second ANN scale path next to :func:`lsh_cosine_topk`: every corpus
    vector is assigned to its most-cosine-similar centroid, each query
    probes its ``n_probe`` nearest centroids, and the exact rerank runs
    only inside the probed cells (expected candidate fraction
    ``n_probe / n_centroids`` of the corpus).

    100 TB shape: the corpus is NEVER shuffled. Assignment is a pure
    projection (:func:`_ivf_assign`) — the centroid set (with precomputed
    norms) rides along as a one-row broadcast array, and the per-row argmax
    is ``array_max(transform(cents, c -> struct(cosine, cid)))``: no N x C
    row blowup, no groupBy exchange, each centroid's cosine computed exactly
    once per row (the no-CSE-across-lambdas trap — see
    ``dedup.minhash_signature_frame`` — is avoided because the fold IS the
    single evaluation site). The probe step joins broadcast (query, cell)
    pairs onto the assignment, so only the probed candidates reach the
    final per-query top-k window (map-side pruned by WindowGroupLimit).
    Ranking happens on the round-6 cosine (``cosine_col``) with ties broken
    by id, so results are deterministic and engine-portable. Output:
    ``(query_id, vec_id, cosine, rank)`` — same contract as
    :func:`cosine_topk`, which is also the recall oracle for this op.

    Two corpus modes (mirroring :func:`lsh_cosine_topk`):

    - ``corpus=`` (inline): centroids + assignment computed in the same job.
    - ``index_path=`` (persisted, the 100 TB shape): probe a layout written
      by :func:`build_ivf_index`. Each query's ``n_probe`` nearest cells are
      scored against the STORED centroid frame, and the union of probed cell
      ids — bounded by |Q|·n_probe, driver-side by the same small-query
      contract as the exact path's broadcast — is pushed into the parquet
      scan as a partition filter: only probed cells' files are read, no
      corpus rescan, no assignment recompute. ``n_centroids``/``salt`` are
      ignored in this mode (the index's sidecar fixed them at build time)."""
    if index_path is not None:
        cent = queries.sparkSession.read.parquet(
            os.path.join(index_path, IVF_CENTROID_DIR)
        )
        meta = json.loads(
            LocalCommitIO().read_text(os.path.join(index_path, IVF_META_FILE))
        )
        qdim = queries.select(F.size(vec_col).alias("d")).first().d
        if qdim != meta["dim"]:
            # zip_with would NULL-pad the cosine into a plausible but wrong
            # probe order — fail loudly instead
            raise ValueError(
                f"queries have dim {qdim}, index was built with dim "
                f"{meta['dim']}"
            )
    elif corpus is not None:
        cent = ivf_centroids(corpus, n_centroids, salt, id_col, vec_col)
    else:
        raise ValueError("pass either corpus= or index_path=")
    # probe list: each query's n_probe nearest centroids (tiny frame)
    qn = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    qscore = qn.crossJoin(F.broadcast(cent)).select(
        "query_id",
        "qv",
        "cid",
        cosine_col(F.col("qv"), F.col("centv")).alias("sim"),
    )
    wq = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("cid").desc()
    )
    probes = (
        qscore.withColumn("pr", F.row_number().over(wq))
        .filter(F.col("pr") <= n_probe)
        .select("query_id", "qv", "cid")
    )
    if index_path is not None:
        # localCheckpoint for the same reason as lsh_cosine_topk's probe
        # frame: both the cid collect and the candidate join read the
        # materialized probe rows instead of re-running the scoring window
        probes = probes.localCheckpoint()
        cids = [r.cid for r in probes.select("cid").distinct().collect()]
        assign = (
            queries.sparkSession.read.parquet(index_path)
            .filter(F.col("cid").isin(cids))
        )
    else:
        assign = _ivf_assign(
            corpus.select(
                F.col(id_col).alias("vec_id"), F.col(vec_col).alias("cv")
            ),
            cent,
        )
    cand = assign.join(F.broadcast(probes), "cid").select(
        "query_id",
        "vec_id",
        cosine_col(F.col("cv"), F.col("qv")).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc()
    )
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "cosine", "rank")
    )
