"""Deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash,
embedding-cosine near-dup.

Shape notes for 100 TB:

- Exact dedup is one hash-groupBy — map-side partial agg, no row explosion.
- MinHash/LSH never materializes the O(N²) pair space: signatures are row-
  local expressions; banding explodes to B rows per doc; candidate pairs come
  from an equi-join on (band, band_hash) — i.e. only within-bucket pairs
  shuffle. Verification (true Jaccard) runs only on candidates.
- SimHash uses one Arrow-batched pandas UDF (64-bit math over token hashes is
  numpy territory); everything around it stays JVM-side.
- Embedding near-dup reuses the LSH machinery with random-hyperplane sign
  buckets.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window, functions as F
from pyspark.sql.functions import pandas_udf

from diffsync_spark.functions.text import tokens_col

BIG = 2_147_483_647  # 2^31 - 1


def normalized_text(text: Column) -> Column:
    """Canonical form for exact dedup: lowercase, collapse whitespace."""
    return F.regexp_replace(F.lower(F.trim(text)), r"\s+", " ")


def content_key(text: Column) -> tuple[Column, Column]:
    """128-bit content key: two independent xxhash64 of the normalized text.
    At 10^10 docs a single 64-bit key expects a handful of birthday
    collisions; two independent 64-bit keys push that below 1e-18. The
    point (round-1 advice): shuffle/sort 16 bytes per row, never the
    document itself."""
    norm = normalized_text(text)
    return F.xxhash64(norm), F.xxhash64(norm, F.lit(0x9E3779B9))


def _spread_small_input(df: DataFrame) -> DataFrame:
    """Round-robin a narrow LOCAL-FILE-SCAN input across the cluster when
    the scan would give fewer partitions than cores. Spark sizes scan
    partitions by BYTES (maxPartitionBytes), which under-parallelizes
    compute-heavy per-row work over small files — a 30 MB corpus file
    lands on ONE core while tokenize+shingle+K-hash burns seconds there
    (measured: the sf0.1 minhash signature stage ran 1 task for ~6s on a
    32-core host).

    The check deliberately uses ``inputFiles()`` + file sizes, NOT
    ``df.rdd.getNumPartitions()``: under AQE, ``df.rdd`` eagerly EXECUTES
    the upstream plan's shuffle stages as real jobs at call time, and the
    AQE-coalesced partition count would misfire the guard for shuffle-fed
    inputs. Non-scan frames (shuffle-fed, in-memory) and non-local/object
    -store paths pass through untouched — their parallelism was already
    set upstream, and at real corpus scale the scan yields >= cores
    partitions anyway."""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    try:
        # idempotence: a frame that already went through a repartition (this
        # helper upstream, or a caller's own) is spread — a second
        # round-robin would only add a shuffle of the same bytes
        if "Repartition" in df._jdf.queryExecution().logical().toString():
            return df
        files = df.inputFiles()
    except Exception:
        return df
    if not files or len(files) >= target:
        return df
    conf = df.sparkSession.conf.get(
        "spark.sql.files.maxPartitionBytes", "134217728"
    )
    digits = "".join(ch for ch in str(conf) if ch.isdigit())
    mpb = int(digits) if digits else 134_217_728
    total = 0
    for uri in files:
        if uri.startswith("file:"):
            local = uri[len("file:"):]
        elif "://" in uri or uri.startswith(("s3", "gs", "hdfs", "abfs")):
            return df  # remote store: can't stat cheaply; pass through
        else:
            local = uri
        try:
            total += os.path.getsize(local)
        except OSError:
            return df
    est_parts = max(len(files), -(-total // mpb))
    if est_parts < target:
        return df.repartition(target)
    return df


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep one representative (min id) per normalized-text group.
    The window partitions on the 128-bit content key, NOT the raw text —
    the exchange and sort move 16-byte keys; the document rides along as
    payload only."""
    h1, h2 = content_key(F.col(text_col))
    w = Window.partitionBy(h1, h2).orderBy(F.col(id_col))
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def shingles_col(text: Column, n: int = 3) -> Column:
    """Word n-gram shingles as strings (distinct).

    Built as a chain of n-1 ``zip_with`` concats over shifted token arrays
    — O(n) linear array passes — instead of one ``slice``+``array_join``
    per gram (measured 3× slower: per-gram slice calls dominate). zip_with
    pads the shorter (shifted) side with NULL, so the trailing n-1 entries
    become NULL concats and are filtered; values are identical to the
    slice form."""
    toks = tokens_col(normalized_text(text))
    gram = toks
    for k in range(1, n):
        shifted = F.slice(
            toks, k + 1, F.greatest(F.size(toks) - k, F.lit(0))
        )
        gram = F.zip_with(
            gram, shifted, lambda a, b: F.concat(a, F.lit(" "), b)
        )
    grams = F.filter(gram, lambda x: x.isNotNull())
    return F.array_distinct(
        F.when(F.size(toks) >= n, grams).otherwise(F.array(F.array_join(toks, " ")))
    )


def _verify_jaccard(
    cand: DataFrame,
    texts: DataFrame,
    n: int,
    threshold: float,
) -> DataFrame:
    """Keep candidate id-pairs whose exact shingle Jaccard clears the
    threshold. ``cand``: (id_a, id_b); ``texts``: (id, __text).

    Each document's distinct shingle set is computed ONCE (per-doc frame)
    as an array of 8-byte xxhash64 values, and the candidate pairs join
    those arrays — a candidate appearing in many pairs never re-tokenizes
    (the per-pair form re-ran the whole shingle chain twice per pair:
    ~90s for 1.1M candidates at sf0.1, vs one 5k-doc pass). Jaccard over
    hashed distinct shingles equals Jaccard over the strings barring an
    in-pair xxhash64 collision (~1e-16 for 100-shingle unions); arrays of
    longs also shuffle ~20× smaller than the text.

    Measured and rejected (r6): restricting the shingle pass to documents
    appearing in a candidate pair (semi-join on the candidate id set) —
    asymptotically attractive, but the candidate subtree gains a second
    consumer and Catalyst plans the whole banding pipeline twice (no
    exchange reuse, 3.0s -> 4.3s at sf1.0); pinning it with
    ``localCheckpoint`` recovers minhash (~-0.2s) but costs neardup_dedup
    ~+0.6s in extra eager-job barriers. The corpus-wide pass below is one
    spread, embarrassingly-parallel projection — cheaper than the extra
    barriers until the corpus dwarfs the candidate set by far more than
    the bench scale."""
    sh = texts.select(
        F.col("id"),
        F.transform(
            shingles_col(F.col("__text"), n), lambda s: F.xxhash64(s)
        ).alias("__sh"),
    )
    out = (
        cand.join(sh.withColumnsRenamed({"id": "id_a", "__sh": "__sa"}), "id_a")
        .join(sh.withColumnsRenamed({"id": "id_b", "__sh": "__sb"}), "id_b")
    )
    jac = F.round(
        F.size(F.array_intersect(F.col("__sa"), F.col("__sb")))
        / F.greatest(
            F.size(F.array_union(F.col("__sa"), F.col("__sb"))), F.lit(1)
        ),
        6,
    )
    return (
        out.withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    threshold: float = 0.7,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_doc_freq: int | None = 1000,
) -> DataFrame:
    """All-pairs n-gram Jaccard ≥ threshold via an inverted-index join.

    Candidate generation: explode shingles, drop shingles appearing in more
    than ``max_doc_freq`` docs (stop-shingles — without this cap a single
    common shingle makes the self-join quadratic at scale), hash each
    surviving shingle to a 64-bit key, and self-join on that key. Only ids
    and 8-byte shingle hashes shuffle. Verification then recomputes the
    EXACT Jaccard over the FULL shingle sets (the df-cap only prunes
    candidate discovery, never the similarity value), so emitted scores are
    exact; the only possible loss is a pair whose every shared shingle is a
    stop-shingle — at threshold≥0.5 such pairs are near-impossible unless
    the docs are themselves stop-text.
    """
    texts = _spread_small_input(df).select(
        F.col(id_col).alias("id"), F.col(text_col).alias("__text")
    )
    inv = texts.select(
        "id", F.explode(shingles_col(F.col("__text"), n)).alias("g")
    ).select("id", F.xxhash64("g").alias("gh"))
    if max_doc_freq is not None:
        w = Window.partitionBy("gh")
        inv = inv.withColumn("__df", F.count("*").over(w)).filter(
            F.col("__df") <= max_doc_freq
        ).drop("__df")
    cand = (
        inv.alias("a")
        .join(inv.alias("b"), "gh")
        .filter(F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    return _verify_jaccard(cand, texts, n, threshold)


def minhash_signature(text: Column, num_hashes: int = 64, n: int = 3) -> Column:
    """MinHash signature: per seed i, min over shingles of
    murmur3(xxhash64(shingle), i) — the K family hashes run over each
    shingle's 8-byte key, not the string: murmur3 over one long is a
    fixed two-round mix vs a walk over ~20-40 UTF8 bytes, measured ~25%
    off the whole signature stage at K=64 (r6). Family independence is
    unchanged (murmur3 seeds over a 64-bit input) and the banding recall
    bound is seed-family-agnostic. Row-local JVM expression — no shuffle,
    no Python.

    WARNING: as a single Column this embeds (and Catalyst recomputes) the
    tokenize+distinct shingle chain ``num_hashes`` times — measured 385s
    for 5k medium docs at 64 hashes. Use :func:`minhash_signature_frame`
    (explode-once + one aggregation, same values) anywhere row volume
    matters; this expression form survives only for one-off/debug use."""
    sh = F.transform(shingles_col(text, n), lambda s: F.xxhash64(s))
    return F.array(
        *[
            F.array_min(
                F.transform(sh, lambda s: F.pmod(F.hash(s, F.lit(i)), F.lit(BIG)))
            )
            for i in range(num_hashes)
        ]
    )


def minhash_signature_frame(
    df: DataFrame,
    num_hashes: int = 64,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, __m0..__m{k-1}) minhash signature columns, computed the scalable
    way: tokenize ONCE, explode the distinct shingles AS 8-byte xxhash64
    keys (the K family hashes then run over longs, not strings — see
    :func:`minhash_signature`), and fold the ``num_hashes`` per-shingle
    hashes to per-doc mins in one hash aggregation (map-side partial min —
    only k longs per doc cross the exchange). Bit-identical values to
    :func:`minhash_signature`; ~50× faster because the shingle chain is
    evaluated once per doc instead of once per hash."""
    sh_rows = _spread_small_input(df).select(
        F.col(id_col).alias("id"),
        F.explode(
            F.transform(shingles_col(F.col(text_col), n),
                        lambda s: F.xxhash64(s))
        ).alias("__s"),
    )
    return sh_rows.groupBy("id").agg(
        *[
            F.min(F.pmod(F.hash("__s", F.lit(i)), F.lit(BIG))).alias(f"__m{i}")
            for i in range(num_hashes)
        ]
    )


def minhash_lsh_pairs(
    df: DataFrame,
    threshold: float = 0.7,
    num_hashes: int = 64,
    bands: int = 16,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_bucket_size: int | None = 10_000,
) -> DataFrame:
    """Near-dup candidate pairs via MinHash banding, verified with true
    n-gram Jaccard. rows-per-band r = num_hashes/bands tunes the S-curve
    (P(candidate) = 1-(1-s^r)^b)."""
    assert num_hashes % bands == 0
    r = num_hashes // bands
    # spread the verify side too: _verify_jaccard re-tokenizes every doc to
    # build its shingle array, and an unspread small-file scan ran that pass
    # on 2 tasks (measured 7.7s executor over 2 tasks at sf1.0 — a ~4s
    # single-task straggler on a 32-core host, the slowest stage of the
    # whole pipeline)
    texts = _spread_small_input(df).select(
        F.col(id_col).alias("id"), F.col(text_col).alias("__text")
    )
    # signatures via the explode-once aggregation (tokenize each doc ONCE;
    # the expression form recomputed the shingle chain per hash — 385s vs
    # ~8s for 5k docs, measured)
    sig = minhash_signature_frame(df, num_hashes, n, text_col, id_col)
    # band on (id, band, bh) ONLY — round-1 advice: carrying the text here
    # shuffles every document B=bands times through the explode and twice
    # more through the self-join; ids + 4-byte band hashes shuffle instead,
    # and texts are joined back once, post-candidate-dedup, for verification.
    banded = sig.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.hash(
                            *[F.col(f"__m{b * r + j}") for j in range(r)]
                        ).alias("bh"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("id", "bb.band", "bb.bh")
    if max_bucket_size is not None:
        # degenerate buckets (e.g. empty/boilerplate docs all sharing one
        # signature) would blow the self-join quadratically; cap them. The
        # count window shares the (band, bh) exchange with the join below.
        wb = Window.partitionBy("band", "bh")
        banded = banded.withColumn("__bsz", F.count("*").over(wb)).filter(
            F.col("__bsz") <= max_bucket_size
        ).drop("__bsz")
    cand = (
        banded.alias("a")
        .join(banded.alias("b"), ["band", "bh"])
        .filter(F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    return _verify_jaccard(cand, texts, n, threshold)


def _simhash64_batch(texts: pd.Series) -> pd.Series:
    """64-bit SimHash over whitespace tokens — Arrow-batched numpy bit math.
    Deterministic: FNV-1a token hashes, no RNG."""
    out = np.zeros(len(texts), dtype=np.uint64)
    for i, t in enumerate(texts):
        if not t:
            continue
        toks = t.lower().split()
        if not toks:
            continue
        hs = np.array([_fnv1a(tok) for tok in toks], dtype=np.uint64)
        out[i] = _majority_bits(hs)
    return pd.Series(out.view(np.int64))


def _majority_bits(hs: np.ndarray) -> np.uint64:
    """Fold a vector of 64-bit token hashes into one majority-vote hash."""
    bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & 1).astype(
        np.int64
    )
    v = (2 * bits - 1).sum(axis=0)
    return np.packbits((v > 0).astype(np.uint8)[::-1], bitorder="little").view(
        np.uint64
    )[0]


_FNV_BASIS = 0xCBF29CE484222325
# any odd 64-bit constant gives an independent second hash family; this is
# the golden-ratio constant already used for the second content_key hash
_FNV_BASIS2 = 0x9E3779B97F4A7C15


def _fnv1a(s: str, basis: int = _FNV_BASIS) -> int:
    h = basis
    for ch in s.encode():
        h ^= ch
        h = (h * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h


def _simhash128_batch(texts: pd.Series) -> pd.DataFrame:
    """128-bit SimHash as two independent 64-bit halves (distinct FNV-1a
    offset bases). Twice the bits → 32-bit band keys at the same pigeonhole
    guarantee, the banding widener the 10^10-doc scale path needs."""
    hi = np.zeros(len(texts), dtype=np.uint64)
    lo = np.zeros(len(texts), dtype=np.uint64)
    for i, t in enumerate(texts):
        if not t:
            continue
        toks = t.lower().split()
        if not toks:
            continue
        hs1 = np.array([_fnv1a(tok) for tok in toks], dtype=np.uint64)
        hs2 = np.array(
            [_fnv1a(tok, _FNV_BASIS2) for tok in toks], dtype=np.uint64
        )
        hi[i] = _majority_bits(hs1)
        lo[i] = _majority_bits(hs2)
    return pd.DataFrame(
        {"hi": hi.view(np.int64), "lo": lo.view(np.int64)}
    )


def simhash(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach a 64-bit simhash column. Near-dup = small Hamming distance;
    pair generation piggybacks on banding the hash bytes (split into 4
    16-bit chunks → docs sharing any chunk are candidates).

    The pandas_udf is created lazily (needs an active session to parse the
    return type)."""
    udf = pandas_udf(_simhash64_batch, "long")
    return _spread_small_input(df).withColumn("simhash", udf(F.col(text_col)))


def simhash_neardup_pairs(
    df: DataFrame,
    max_hamming: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_bucket_size: int | None = 10_000,
    wide: bool = False,
) -> DataFrame:
    """Candidate pairs sharing at least one of 4 simhash chunks (pigeonhole:
    hamming ≤ 3 ⇒ some chunk identical), verified by exact Hamming distance
    via bit_count(xor).

    Scale levers (both matter at 10^10 docs):

    - ``max_bucket_size`` drops degenerate (chunk, chunk-key) buckets — e.g.
      boilerplate/empty docs all hashing to simhash 0 — before the self-join
      goes quadratic. The count window shares the (chunk, ck) exchange with
      the join, so the cap is free of extra shuffles. Dropped buckets lose
      recall only for pairs whose ONLY shared chunk is the degenerate one.
    - ``wide=True`` switches to a 128-bit simhash (two independent FNV-1a
      families) banded as 4 chunks of 32 bits: same pigeonhole guarantee,
      but expected bucket population N/2^32 instead of N/2^16 — at 10^10
      docs that is ~2 docs/bucket instead of ~150k. ``max_hamming`` then
      applies to the 128-bit distance (≈2× the 64-bit distance for the same
      text pair; the default 3 stays conservative).
    """
    if wide:
        udf = pandas_udf(_simhash128_batch, "hi long, lo long")
        s = _spread_small_input(df).select(
            F.col(id_col).alias("id"), udf(F.col(text_col)).alias("sh")
        ).select("id", F.col("sh.hi").alias("sh_hi"), F.col("sh.lo").alias("sh_lo"))
        # 4 chunks of 32 bits: two per 64-bit half
        chunk_exprs = []
        for half_idx, half in enumerate(("sh_hi", "sh_lo")):
            for c in range(2):
                chunk_exprs.append(
                    F.struct(
                        F.lit(half_idx * 2 + c).alias("chunk"),
                        F.shiftright(half, c * 32)
                        .bitwiseAND(F.lit(0xFFFFFFFF))
                        .alias("ck"),
                    )
                )
        chunks = s.select(
            "id", "sh_hi", "sh_lo", F.explode(F.array(*chunk_exprs)).alias("cc")
        ).select("id", "sh_hi", "sh_lo", "cc.chunk", "cc.ck")
        hamming = (
            F.bit_count(F.col("a.sh_hi").bitwiseXOR(F.col("b.sh_hi")))
            + F.bit_count(F.col("a.sh_lo").bitwiseXOR(F.col("b.sh_lo")))
        )
    else:
        s = simhash(df, text_col).select(F.col(id_col).alias("id"), "simhash")
        chunks = s.select(
            "id",
            "simhash",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(c).alias("chunk"),
                            F.shiftright("simhash", c * 16).bitwiseAND(F.lit(0xFFFF)).alias("ck"),
                        )
                        for c in range(4)
                    ]
                )
            ).alias("cc"),
        ).select("id", "simhash", "cc.chunk", "cc.ck")
        hamming = F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
    if max_bucket_size is not None:
        wb = Window.partitionBy("chunk", "ck")
        chunks = chunks.withColumn("__bsz", F.count("*").over(wb)).filter(
            F.col("__bsz") <= max_bucket_size
        ).drop("__bsz")
    pairs = (
        chunks.alias("a")
        .join(chunks.alias("b"), ["chunk", "ck"])
        .filter(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            hamming.alias("hamming"),
        )
        .dropDuplicates(["id_a", "id_b"])
        .filter(F.col("hamming") <= max_hamming)
    )
    return pairs


def embedding_neardup_pairs(
    df: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 16,
    seed: int = 42,
    max_bucket_size: int | None = 10_000,
) -> DataFrame:
    """Embedding near-duplicates: random-hyperplane LSH buckets (sign
    signature over n_planes), exact cosine verification within buckets.
    Hyperplanes are driver-generated literals (seeded, deterministic).

    ``max_bucket_size`` drops degenerate buckets (e.g. many near-zero or
    duplicate embeddings sharing one sign signature) before the in-bucket
    self-join goes quadratic — same pattern as :func:`minhash_lsh_pairs`;
    the count window shares the bucket exchange with the join."""
    first = df.select(F.size(vec_col).alias("d")).first()
    dim = first.d
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_planes, dim))
    sig = _plane_signature(F.col(vec_col), planes)
    s = _spread_small_input(df).select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("v"),
        sig.alias("bucket"))
    if max_bucket_size is not None:
        wb = Window.partitionBy("bucket")
        s = s.withColumn("__bsz", F.count("*").over(wb)).filter(
            F.col("__bsz") <= max_bucket_size
        ).drop("__bsz")
    pairs = (
        s.alias("a")
        .join(s.alias("b"), "bucket")
        .filter(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            cosine_col(F.col("a.v"), F.col("b.v")).alias("cosine"),
        )
        .dropDuplicates(["id_a", "id_b"])
        .filter(F.col("cosine") >= threshold)
    )
    return pairs


def neardup_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 20,
) -> DataFrame:
    """Connected components over a near-dup pair graph: ``(id, comp)`` where
    ``comp`` is the smallest id reachable through pairs — the clustering
    step that turns candidate PAIRS into deduplicable GROUPS.

    Min-label propagation WITH pointer jumping: every node starts labeled
    with itself; each round takes the min of its own, its neighbors', and
    its current label's label (path doubling), so a chain of length L
    converges in O(log L) rounds — ``max_iter=20`` covers chains up to
    ~2^20 nodes. Each round is two shuffle-joins on the (tiny) edge/label
    frames; ``localCheckpoint`` truncates the iterative lineage so the
    plan stays flat. Only nodes that appear in a pair are labeled —
    singletons are implicitly their own component. If the loop exhausts
    without converging (practically unreachable given the doubling),
    DiffSyncSparkError is raised rather than returning silently split
    components.

    Scale shape: the edge list is tiny relative to the corpus (it is the
    OUTPUT of banded candidate generation, already capped per bucket), so
    each round shuffles edges + one (id, comp) pair per non-singleton
    node, never documents.
    """
    # materialize the directed pair list ONCE before symmetrizing: the
    # union's two branches would otherwise each evaluate the full upstream
    # pair-generation pipeline (minhash signatures + banding + verify) —
    # measured ~2x the candidate-generation cost on the neardup_dedup bench
    base = pairs.select(
        F.col(id_a).alias("a"), F.col(id_b).alias("b")
    ).localCheckpoint()
    edges = base.union(
        base.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).distinct().localCheckpoint()
    labels = (
        edges.select(F.col("a").alias("id")).distinct()
        .withColumn("comp", F.col("id"))
        .localCheckpoint()
    )
    converged = False
    for _ in range(max_iter):
        nbr = (
            edges.join(labels, edges["b"] == labels["id"])
            .groupBy("a")
            .agg(F.min("comp").alias("nbr_comp"))
        )
        stepped = labels.join(nbr, labels["id"] == nbr["a"], "left").select(
            "id",
            F.col("comp").alias("__old"),
            F.least(
                F.col("comp"), F.coalesce("nbr_comp", F.col("comp"))
            ).alias("comp"),
        )
        # pointer jumping: also adopt the label OF my label (path doubling
        # — turns O(chain length) convergence into O(log chain length))
        jump = labels.select(
            F.col("id").alias("__jid"), F.col("comp").alias("__jcomp")
        )
        # the convergence signal rides the SAME frame the round already
        # materializes (localCheckpoint): __changed is computed against the
        # carried-along old label, and reading max(__changed) afterwards is
        # one tiny scan of the checkpointed partitions — not the extra
        # join + limit + count job chain of the r3 implementation, which
        # roughly doubled per-round job count on the driver
        new_labels = (
            stepped.join(jump, stepped["comp"] == jump["__jid"], "left")
            .select(
                "id",
                F.least(
                    F.col("comp"), F.coalesce("__jcomp", F.col("comp"))
                ).alias("comp"),
                F.col("__old"),
            )
            .withColumn(
                "__changed", (F.col("comp") != F.col("__old")).cast("int")
            )
            .drop("__old")
            .localCheckpoint()
        )
        changed = new_labels.agg(
            F.coalesce(F.max("__changed"), F.lit(0))
        ).first()[0]
        labels = new_labels.drop("__changed")
        if changed == 0:
            converged = True
            break
    if not converged:
        from diffsync_spark.errors import DiffSyncSparkError

        raise DiffSyncSparkError(
            f"neardup_components did not converge in {max_iter} rounds — "
            "raise max_iter (components would be silently split otherwise)"
        )
    return labels


def dedup_near_duplicates(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Drop all but the smallest-id document of each near-dup component:
    the end-to-end dedup step (pairs → components → survivors). Documents
    in no pair survive untouched. No forced broadcast hint: AQE broadcasts
    the victims side at runtime when it is small (the normal case) and
    falls back to a shuffled left-anti join when a heavily-duplicated
    corpus makes it large — a hard ``F.broadcast`` would instead fail the
    job at the 8 GB broadcast limit."""
    labels = neardup_components(pairs, id_a=id_a, id_b=id_b)
    victims = labels.filter(F.col("comp") != F.col("id")).select(
        F.col("id").alias("__victim")
    )
    return df.join(victims, df[id_col] == F.col("__victim"), "left_anti")


def _plane_dots(vec: Column, planes: np.ndarray) -> list[Column]:
    """Per-plane dot products — zip_with/aggregate JVM expressions over
    literal plane arrays (sequential fold, matching the DuckDB twin
    bit-for-bit). Exposed separately so multi-probe can rank planes by
    |dot| (marginal planes = best flip candidates)."""
    dots = []
    for plane in planes:
        lit_plane = F.array(*[F.lit(float(x)) for x in plane])
        dots.append(
            F.aggregate(
                F.zip_with(vec, lit_plane, lambda a, b: a.cast("double") * b),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
        )
    return dots


def _signature_from_dots(dots: list[Column]) -> Column:
    bits = [
        F.when(d > 0, F.lit(1 << p)).otherwise(F.lit(0))
        for p, d in enumerate(dots)
    ]
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out.cast("long")


def _plane_signature(vec: Column, planes: np.ndarray) -> Column:
    """Sign-bit signature: bit p set iff dot(vec, plane_p) > 0."""
    return _signature_from_dots(_plane_dots(vec, planes))


def cosine_col(a: Column, b: Column) -> Column:
    """Exact cosine similarity of two float arrays — one aggregate expression."""
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    na = F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double"))
    )
    nb = F.sqrt(
        F.aggregate(b, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double"))
    )
    return F.round(dot / F.greatest(na * nb, F.lit(1e-12)), 6)


# --------------------------------------------------------------- substring
# Exact substring dedup (the Lee et al. 2022 "Deduplicating Training Data
# Makes Language Models Better" pass): find token spans >= min_tokens that
# occur more than once corpus-wide, as maximal runs of duplicated
# fixed-width token windows. Every length-N window of a repeated span is
# itself repeated, and conversely a maximal run of duplicated window starts
# IS a repeated span (up to hash collisions — negligible at 64/128 bits), so
# window-hash grouping replaces the reference-world suffix array with two
# ordinary shuffles: one on the 8-byte window hash (count occurrences), one
# on the doc id (merge adjacent duplicated starts into spans). Row explosion
# is one row per token position — O(corpus tokens), the same order as the
# suffix-array approach — and nothing is ever all-pairs.
#
# Reference parity note: diffsync has no substring pass; this is part of the
# training-data toolbox alongside exact/minhash/simhash dedup.


# odd 64-bit multiplier (invertible mod 2^64) for the rolling window hash
_ROLL_P = 0x9E3779B97F4A7C15
_ROLL_P_INV = pow(_ROLL_P, -1, 1 << 64)


def _rolling_window_hashes(min_tokens: int):
    """Arrow-batched pandas UDF: per-token 64-bit hashes (array<long>,
    prehashed JVM-side with xxhash64) -> the polynomial hash of every
    ``min_tokens``-wide window, O(tokens) total.

    The old expression form re-sliced and re-joined the full window's
    STRINGS per position and hashed the joined bytes — O(tokens x
    min_tokens) work and a ~50x CPU multiplier on the corpus-wide pass
    (round-5 verdict finding #1b). Here every window hash is derived from
    prefix sums in wrap-around uint64 arithmetic:

        W(s) = P^(s+n-1) * (S[s+n-1] - S[s-1]),  S[k] = sum v[i] * P^(-i)

    with P odd (so P is invertible mod 2^64) — three vectorized numpy
    passes per document, zero Python-per-token work (token hashing stays
    in the JVM). Window equality classes are exactly those of hashing the
    window contents directly, bar negligible 64-bit collisions — and the
    span OUTPUT depends only on those equality classes, so results are
    unchanged."""
    import numpy as np

    n = min_tokens

    @pandas_udf("array<bigint>")
    def roll(tok_hashes: pd.Series) -> pd.Series:
        P = np.uint64(_ROLL_P)
        inv = np.uint64(_ROLL_P_INV)
        one = np.uint64(1)
        zero = np.uint64(0)
        out = []
        with np.errstate(over="ignore"):
            for arr in tok_hashes:
                v = np.asarray(arr, dtype=np.int64).view(np.uint64)
                L = len(v)
                if L < n:
                    out.append([])
                    continue
                # inv^0..inv^{L-1} and P^0..P^{L-1} (wrap-around products)
                invp = np.empty(L, dtype=np.uint64)
                invp[0] = one
                if L > 1:
                    invp[1:] = np.multiply.accumulate(
                        np.full(L - 1, inv, dtype=np.uint64))
                pp = np.empty(L, dtype=np.uint64)
                pp[0] = one
                if L > 1:
                    pp[1:] = np.multiply.accumulate(
                        np.full(L - 1, P, dtype=np.uint64))
                s_pref = np.cumsum(v * invp, dtype=np.uint64)
                hi = s_pref[n - 1:]
                lo = np.concatenate(([zero], s_pref[:L - n]))
                w = pp[n - 1:] * (hi - lo)
                out.append(w.view(np.int64))
        return pd.Series(out)

    return roll


def substring_spans(
    df: DataFrame,
    min_tokens: int = 50,
    text_col: str = "text",
    id_col: str = "doc_id",
    hash_mode: str = "xx64",
) -> DataFrame:
    """Corpus-wide repeated spans: ``(id_col, span_start, span_end,
    n_tokens)`` with 0-based token offsets, ``span_end`` exclusive. A span
    appears once per OCCURRENCE (including repeats within one document),
    matching the remove-every-occurrence contract of
    :func:`dedup_substrings`.

    ``hash_mode`` is retained for API compatibility; both modes now run
    the same O(tokens) rolling window hash (the md5/xx64 split only ever
    mattered when the per-window hash VALUES were compared to the DuckDB
    twin — the twin computes its own spans independently, and spans
    depend only on window-equality classes, which every collision-free
    hash yields identically).

    Skew safety (round-5 verdict finding #1a): duplicated hashes are
    found with a map-side-combinable ``groupBy(h).count()`` — a
    boilerplate span repeated 10^8 times corpus-wide collapses to one row
    per map partition before the exchange — and joined back, which AQE
    can skew-split; the old ``count() OVER (PARTITION BY h)`` window sent
    every occurrence of a hot hash to one task with no escape hatch."""
    if hash_mode not in ("xx64", "md5"):
        raise ValueError(f"unknown hash_mode {hash_mode!r}")
    toks = tokens_col(F.col(text_col))
    base = (
        df.select(F.col(id_col), toks.alias("__toks"))
        .filter(F.size("__toks") >= min_tokens)
    )
    roll = _rolling_window_hashes(min_tokens)
    pos_h = base.select(
        id_col,
        F.posexplode(
            roll(F.transform("__toks", lambda t: F.xxhash64(t)))
        ).alias("__pos", "__h"),
    )
    dup_h = (
        pos_h.groupBy("__h").count()
        .filter(F.col("count") > 1)
        .select("__h")
    )
    dup = pos_h.join(dup_h, "__h").select(id_col, "__pos")
    # merge adjacent duplicated starts into maximal spans: second exchange,
    # on the doc id
    w = Window.partitionBy(id_col).orderBy("__pos")
    runs = dup.withColumn(
        "__brk",
        F.when(F.col("__pos") - F.lag("__pos").over(w) == 1, F.lit(0))
        .otherwise(F.lit(1)),
    ).withColumn(
        "__span",
        F.sum("__brk").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        runs.groupBy(id_col, "__span")
        .agg(
            F.min("__pos").cast("long").alias("span_start"),
            (F.max("__pos") + F.lit(min_tokens)).cast("long").alias("span_end"),
        )
        .select(
            id_col, "span_start", "span_end",
            (F.col("span_end") - F.col("span_start")).alias("n_tokens"),
        )
    )


def dedup_substrings(
    df: DataFrame,
    min_tokens: int = 50,
    text_col: str = "text",
    id_col: str = "doc_id",
    hash_mode: str = "xx64",
) -> DataFrame:
    """Remove every occurrence of every corpus-repeated span >= min_tokens
    (the Lee et al. contract — no canonical copy survives) and rebuild the
    text from the surviving tokens. Adds ``n_removed_tokens``."""
    spans = substring_spans(df, min_tokens, text_col, id_col, hash_mode)
    per_doc = spans.groupBy(id_col).agg(
        F.collect_list(F.struct("span_start", "span_end")).alias("__spans")
    )
    toks = tokens_col(F.col(text_col))
    indexed = F.zip_with(
        toks,
        F.sequence(F.lit(0), F.size(toks) - 1),
        lambda t, i: F.struct(t.alias("t"), i.alias("i")),
    )
    kept = F.filter(
        indexed,
        lambda s: ~F.exists(
            F.col("__spans"),
            lambda v: (s["i"] >= v["span_start"]) & (s["i"] < v["span_end"]),
        ),
    )
    out = df.join(per_doc, id_col, "left").withColumn(
        "__kept",
        F.when(F.col("__spans").isNull(), None).otherwise(
            F.transform(kept, lambda s: s["t"])
        ),
    )
    n_toks = F.size(tokens_col(F.col(text_col)))
    return (
        out.withColumn(
            "n_removed_tokens",
            F.when(F.col("__kept").isNull(), F.lit(0)).otherwise(
                n_toks - F.size("__kept")
            ).cast("long"),
        )
        .withColumn(
            text_col,
            F.when(F.col("__kept").isNull(), F.col(text_col)).otherwise(
                F.array_join("__kept", " ")
            ),
        )
        .drop("__spans", "__kept")
    )


def substring_spans_sql(
    table_expr: str,
    min_tokens: int = 50,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """DuckDB twin of :func:`substring_spans` (md5 hash mode)."""
    n = int(min_tokens)
    return f"""
WITH toks AS (
  SELECT {id_col},
         list_filter(string_split_regex(trim(coalesce({text_col}, '')),
                                        '\\s+'), x -> x <> '') AS t
  FROM ({table_expr})),
wins AS (
  SELECT {id_col}, CAST(u.i - 1 AS BIGINT) AS pos,
         md5(array_to_string(t[u.i:u.i + {n - 1}], ' ')) AS h
  FROM toks, UNNEST(range(1, len(t) - {n} + 2)) AS u(i)
  WHERE len(t) >= {n}),
marked AS (
  SELECT {id_col}, pos,
         count(*) OVER (PARTITION BY h) AS cnt
  FROM wins),
runs AS (
  SELECT {id_col}, pos,
         CASE WHEN pos - lag(pos) OVER (PARTITION BY {id_col} ORDER BY pos)
                   = 1 THEN 0 ELSE 1 END AS brk
  FROM marked WHERE cnt > 1),
spans AS (
  SELECT {id_col}, pos,
         sum(brk) OVER (PARTITION BY {id_col} ORDER BY pos
                        ROWS UNBOUNDED PRECEDING) AS span_id
  FROM runs)
SELECT {id_col},
       CAST(min(pos) AS BIGINT) AS span_start,
       CAST(max(pos) + {n} AS BIGINT) AS span_end,
       CAST(max(pos) + {n} - min(pos) AS BIGINT) AS n_tokens
FROM spans GROUP BY {id_col}, span_id"""
