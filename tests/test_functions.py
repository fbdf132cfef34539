"""Training-data pipeline operators over the driver testdata tables."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from diffsync_spark.functions.dedup import (
    cosine_col,
    embedding_neardup_pairs,
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash,
    simhash_neardup_pairs,
)
from diffsync_spark.functions.multimodal import decode_assets, fake_assets, frame_sample_plan
from diffsync_spark.functions.similarity import cosine_topk, lsh_cosine_topk
from diffsync_spark.functions.text import (
    fingerprint_col,
    lang_id,
    quality_features,
    token_count_col,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").cache()


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").cache()


def test_token_count(spark):
    df = spark.createDataFrame(
        [("a b  c",), ("",), ("one",), (None,)], "text string"
    )
    got = [r.n for r in df.select(token_count_col(F.col("text")).alias("n")).collect()]
    assert got[:3] == [3, 0, 1]
    bpe = df.select(token_count_col(F.col("text"), "bpe").alias("n")).collect()
    assert bpe[0].n == 3


def test_quality_features(docs):
    q = quality_features(docs).select(
        "doc_id", "n_tokens", "punct_ratio", "stopword_ratio", "quality_score"
    )
    pdf = q.toPandas()
    assert (pdf["quality_score"].dropna().between(0, 1)).all()
    # longer docs with stopwords score higher than empty docs
    empty = pdf[pdf.n_tokens == 0]["quality_score"]
    assert (empty <= 0.25).all()


def test_fingerprint_deterministic_and_discriminative(docs):
    fp = docs.select("doc_id", fingerprint_col(F.col("text")).alias("fp"))
    a = fp.toPandas().sort_values("doc_id")
    b = fp.toPandas().sort_values("doc_id")
    assert (a["fp"].values == b["fp"].values).all()
    # identical texts share fingerprints; sufficiently many distinct values
    assert a["fp"].nunique() > 50


def test_fingerprint_matches_duckdb(docs):
    """The SQL twin (used by the driver oracle) computes identical values."""
    import duckdb

    from diffsync_spark.functions.text import fingerprint_sql

    got = (
        docs.select("doc_id", fingerprint_col(F.col("text")).alias("fp"))
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want = duckdb.sql(
        f"SELECT doc_id, {fingerprint_sql('text')} AS fp "
        f"FROM '{SF}/documents.parquet' ORDER BY doc_id"
    ).df()
    assert (got["fp"].fillna(-1).values == want["fp"].fillna(-1).values).all()


def test_lang_id(spark):
    df = spark.createDataFrame(
        [
            ("the cat sat of the mat and it is that",),
            ("el que de la una con en",),
            ("der und das ist von ein",),
            ("le et la une est pour dans",),
            ("zzz qqq www",),
        ],
        "text string",
    )
    got = [r.l for r in df.select(lang_id(F.col("text")).alias("l")).collect()]
    assert got == ["en", "es", "de", "fr", "unk"]
    # NULL and empty text are 'unk', never NULL (contract: anything without
    # a stopword hit is 'unk' — regression for the aggregate rewrite)
    nulls = spark.createDataFrame([(None,), ("",)], "text string")
    got_n = [r.l for r in nulls.select(lang_id(F.col("text")).alias("l")).collect()]
    assert got_n == ["unk", "unk"]


def test_exact_dedup(spark):
    df = spark.createDataFrame(
        [(1, "Hello  World"), (2, "hello world"), (3, "different")],
        "doc_id long, text string",
    )
    kept = exact_dedup(df).toPandas()
    assert sorted(kept.doc_id) == [1, 3]  # min id survives per group


def test_ngram_jaccard_and_minhash_agree(spark):
    """LSH candidates verified by true Jaccard == brute-force inverted-index
    pairs at a high threshold (recall check on a dup-heavy corpus)."""
    rows = []
    base = "the quick brown fox jumps over the lazy dog again and again today"
    for i in range(30):
        rows.append((i, base))  # exact dup cluster
    rows.append((100, base.replace("quick", "slow")))
    rows.append((200, "completely unrelated text about spark engines and joins"))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    exact_pairs = {
        (r.id_a, r.id_b)
        for r in ngram_jaccard_pairs(df, threshold=0.9).collect()
    }
    lsh_pairs = {
        (r.id_a, r.id_b)
        for r in minhash_lsh_pairs(df, threshold=0.9, num_hashes=32, bands=16).collect()
    }
    dup_cluster = {(a, b) for a in range(30) for b in range(30) if a < b}
    assert exact_pairs == dup_cluster
    assert lsh_pairs == dup_cluster  # identical docs always collide in LSH


def test_simhash_neardup(spark):
    df = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy dog"),
            (3, "totally different content here about databases"),
        ],
        "doc_id long, text string",
    )
    s = simhash(df).toPandas().set_index("doc_id")["simhash"]
    assert s[1] == s[2] != s[3]
    pairs = simhash_neardup_pairs(df, max_hamming=3).toPandas()
    assert {(r.id_a, r.id_b) for r in pairs.itertuples()} == {(1, 2)}


def test_simhash_wide_banding(spark):
    """wide=True (128-bit simhash, 4×32-bit bands) finds the same identical
    pair as the 64-bit path and rejects the unrelated doc — the 10^10-doc
    banding widener preserves small-scale behavior."""
    df = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy dog"),
            (3, "totally different content here about databases"),
        ],
        "doc_id long, text string",
    )
    pairs = simhash_neardup_pairs(df, max_hamming=3, wide=True).toPandas()
    assert {(r.id_a, r.id_b) for r in pairs.itertuples()} == {(1, 2)}
    # identical docs → identical 128-bit simhash → hamming 0
    assert pairs["hamming"].tolist() == [0]


def test_neardup_components_and_dedup(spark):
    """pairs → components → survivors: a 4-chain (propagation must walk
    more than one hop), a disjoint pair, and untouched singletons."""
    from diffsync_spark.functions.dedup import (
        dedup_near_duplicates,
        neardup_components,
    )

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], "id_a long, id_b long"
    )
    comp = {r.id: r.comp for r in neardup_components(pairs).collect()}
    assert comp == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}

    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in (1, 2, 3, 4, 10, 11, 99)],
        "doc_id long, text string",
    )
    kept = sorted(
        r.doc_id for r in dedup_near_duplicates(docs, pairs).collect()
    )
    assert kept == [1, 10, 99]  # one per cluster + the singleton

    # a 60-node chain needs ~59 plain-propagation rounds — pointer jumping
    # must converge it well inside max_iter=20 (O(log L) rounds)
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(60)], "id_a long, id_b long"
    )
    comp = {r.id: r.comp for r in neardup_components(chain).collect()}
    assert set(comp.values()) == {0} and len(comp) == 61


def test_simhash_pigeonhole_guarantee(spark):
    """Banding is RECALL-EXACT for hamming <= 3 (4 bands, 3 diff bits ⇒
    some band identical): every qualifying pair of the exact pairwise
    distance matrix must appear, for both the 64-bit and 128-bit paths."""
    rng = np.random.default_rng(5)
    words = [f"w{i}" for i in range(50)]
    rows = [
        (i, " ".join(rng.choice(words, size=12)))
        for i in range(120)
    ]
    # near-dup clusters: small edits of a base doc
    base = " ".join(rng.choice(words, size=12))
    for i in range(120, 140):
        toks = base.split()
        toks[i % 12] = words[i % 50]
        rows.append((i, " ".join(toks)))
    df = spark.createDataFrame(rows, "doc_id long, text string")

    sh = simhash(df).toPandas().set_index("doc_id")["simhash"]
    vals = sh.to_numpy().astype(np.int64).view(np.uint64)
    ids = sh.index.to_numpy()
    xor = vals[:, None] ^ vals[None, :]
    ham = np.array([[bin(int(x)).count("1") for x in row] for row in xor])
    want = {
        (int(min(a, b)), int(max(a, b)))
        for i, a in enumerate(ids)
        for j, b in enumerate(ids)
        if a < b and ham[i, j] <= 3
    }
    got = {
        (r.id_a, r.id_b)
        for r in simhash_neardup_pairs(df, max_hamming=3).collect()
    }
    assert want == got  # banding loses nothing at hamming <= 3 (and adds nothing)
    # wide path: recall guarantee holds against ITS 128-bit distance
    wide = simhash_neardup_pairs(df, max_hamming=3, wide=True).toPandas()
    assert (wide["hamming"] <= 3).all()
    # identical-text pairs (hamming 0 in any hash) must appear in both
    dup = df.union(df.withColumn("doc_id", F.col("doc_id") + 1000))
    got64 = {(r.id_a, r.id_b)
             for r in simhash_neardup_pairs(dup, max_hamming=0).collect()}
    got128 = {(r.id_a, r.id_b)
              for r in simhash_neardup_pairs(dup, max_hamming=0, wide=True).collect()}
    assert {(i, i + 1000) for i in range(140)} <= got64
    assert {(i, i + 1000) for i in range(140)} <= got128


def test_neardup_degenerate_bucket_caps(spark):
    """A degenerate bucket (1k identical docs / embeddings collapsing into
    one LSH bucket) must NOT produce a quadratic candidate set when capped:
    the capped run drops the bucket entirely (bounded work), the uncapped
    run on the same input proves the hazard is real."""
    rows = [(i, "boiler plate disclaimer text repeated everywhere") for i in range(1000)]
    rows.append((5000, "a genuinely unique document about spark plans"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    capped = simhash_neardup_pairs(docs, max_bucket_size=100)
    assert capped.count() == 0  # degenerate bucket dropped, op completes
    small = simhash_neardup_pairs(
        docs.filter(F.col("doc_id") < 11), max_bucket_size=100
    )
    assert small.count() == (11 * 10) // 2  # under-cap buckets still pair

    import numpy as np

    v = np.ones(16) / 4.0
    emb_rows = [(i, v.tolist()) for i in range(1000)]
    emb_rows.append((5000, (-v).tolist()))
    emb = spark.createDataFrame(emb_rows, "vec_id long, embedding array<float>")
    capped_e = embedding_neardup_pairs(emb, threshold=0.99, max_bucket_size=100)
    assert capped_e.count() == 0
    small_e = embedding_neardup_pairs(
        emb.filter(F.col("vec_id") < 11), threshold=0.99, max_bucket_size=100
    )
    assert small_e.count() == (11 * 10) // 2


def test_cosine_topk_matches_numpy(emb):
    queries = emb.limit(3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = cosine_topk(emb, queries, k=5).toPandas()
    epdf = emb.toPandas()
    mat = np.array(epdf["embedding"].tolist())
    norms = np.linalg.norm(mat, axis=1)
    ids = epdf["vec_id"].values
    for qid in got["query_id"].unique():
        qv = mat[ids == qid][0]
        sims = mat @ qv / (norms * np.linalg.norm(qv))
        order = np.lexsort((ids, -np.round(sims, 6)))[:5]
        want_ids = list(ids[order])
        have = got[got.query_id == qid].sort_values("rank")["vec_id"].tolist()
        assert have == want_ids
        # self is always rank 1 with cosine ~1
        assert have[0] == qid


def test_lsh_topk_recall(spark):
    """LSH recall is only meaningful when true neighbors are actually close;
    build a clustered corpus (10 tight clusters) and require recall@5 ≥ 0.8.
    (The sf testdata embeddings are near-uniform random — no close neighbors
    — which is exactly the regime where brute force is the right operator.)"""
    rng = np.random.default_rng(0)
    centers = rng.standard_normal((10, 64))
    rows = []
    for i in range(300):
        c = centers[i % 10]
        v = c + 0.05 * rng.standard_normal(64)
        rows.append((i, (v / np.linalg.norm(v)).astype(float).tolist()))
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    queries = corpus.limit(5).select(F.col("vec_id").alias("query_id"), "embedding")
    exact = cosine_topk(corpus, queries, k=5).toPandas()

    def recall(strategy):
        approx = lsh_cosine_topk(
            corpus, queries, k=5, n_planes=12, probes=8,
            probe_strategy=strategy,
        ).toPandas()
        hits = 0
        for qid in exact["query_id"].unique():
            e = set(exact[exact.query_id == qid]["vec_id"])
            a = set(approx[approx.query_id == qid]["vec_id"])
            hits += len(e & a)
            assert qid in a  # self always found (same bucket as itself)
        return hits / (5 * 5)

    r_directed, r_first = recall("directed"), recall("first")
    assert r_directed >= 0.8
    # query-directed probing (flip the smallest-|dot| planes) must never
    # recall WORSE than arbitrary first-bit flips at equal probe count
    assert r_directed >= r_first


def test_ivf_topk_recall_and_full_probe_exact(spark):
    """IVF on a clustered corpus: (a) probing every cell IS brute force —
    results must equal cosine_topk row-for-row; (b) probing 2/10 cells on a
    10-cluster corpus keeps recall@5 high (clusters land in few cells)."""
    from diffsync_spark.functions.similarity import cosine_topk, ivf_cosine_topk

    rng = np.random.default_rng(7)
    centers = rng.standard_normal((10, 64))
    rows = []
    for i in range(300):
        c = centers[i % 10]
        v = c + 0.05 * rng.standard_normal(64)
        rows.append((i, (v / np.linalg.norm(v)).astype(float).tolist()))
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    queries = corpus.limit(5).select(F.col("vec_id").alias("query_id"), "embedding")
    exact = cosine_topk(corpus, queries, k=5).toPandas()
    exact = exact.sort_values(["query_id", "rank"]).reset_index(drop=True)

    full = ivf_cosine_topk(
        corpus, queries, k=5, n_centroids=10, n_probe=10
    ).toPandas().sort_values(["query_id", "rank"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(full, exact)

    approx = ivf_cosine_topk(
        corpus, queries, k=5, n_centroids=10, n_probe=2
    ).toPandas()
    hits = 0
    for qid in exact["query_id"].unique():
        e = set(exact[exact.query_id == qid]["vec_id"])
        a = set(approx[approx.query_id == qid]["vec_id"])
        hits += len(e & a)
        assert qid in a  # self's cell is always the query's nearest cell
    assert hits / (5 * 5) >= 0.8


def test_refine_ivf_centroids(spark, tmp_path):
    """Spherical-k-means refinement: (a) the cell count never shrinks, even
    when a seed captures no rows; (b) refined centroids land near the true
    cluster centers on a well-separated corpus; (c) an index built with
    refine_iters still returns EXACT results at full probe; (d) the loop is
    deterministic across invocations (round-5 fixed point)."""
    from diffsync_spark.functions.similarity import (
        build_ivf_index,
        cosine_topk,
        ivf_cosine_topk,
        refine_ivf_centroids,
    )

    rng = np.random.default_rng(11)
    centers = rng.standard_normal((4, 64))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    rows = []
    for i in range(200):
        c = centers[i % 4]
        v = c + 0.03 * rng.standard_normal(64)
        rows.append((i, (v / np.linalg.norm(v)).astype(float).tolist()))
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    cent = refine_ivf_centroids(corpus, n_centroids=8, iters=2).toPandas()
    assert len(cent) == 8 and cent["cid"].is_unique
    # (b) every true center has a refined centroid at cosine > 0.99
    for c in centers:
        best = max(
            float(np.dot(c, np.array(cv)) / np.linalg.norm(cv))
            for cv in cent["centv"]
        )
        assert best > 0.99

    # (d) determinism
    cent2 = refine_ivf_centroids(corpus, n_centroids=8, iters=2).toPandas()
    a = cent.sort_values("cid").reset_index(drop=True)
    b = cent2.sort_values("cid").reset_index(drop=True)
    assert all(list(x) == list(y) for x, y in zip(a["centv"], b["centv"]))

    # (c) refined index, full probe == brute force
    queries = corpus.limit(3).select(F.col("vec_id").alias("query_id"), "embedding")
    idx = str(tmp_path / "ivf_refined")
    meta = build_ivf_index(corpus, idx, n_centroids=8, refine_iters=2)
    assert meta["n_centroids"] == 8
    got = ivf_cosine_topk(
        None, queries, k=5, n_probe=8, index_path=idx
    ).toPandas().sort_values(["query_id", "rank"]).reset_index(drop=True)
    exact = cosine_topk(corpus, queries, k=5).toPandas()
    exact = exact.sort_values(["query_id", "rank"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exact)


def test_refine_ivf_keeps_empty_cells(spark):
    """A seed centroid that captures zero rows must survive refinement
    unchanged (normalized), not vanish — the cell count is part of the
    index contract."""
    from diffsync_spark.functions.similarity import refine_ivf_centroids

    # two tight clusters, 8 seeds: at least one seed ends up empty after
    # the first assignment round on such a corpus
    rng = np.random.default_rng(3)
    c0, c1 = rng.standard_normal((2, 8))
    rows = []
    for i in range(40):
        base = c0 if i % 2 == 0 else c1
        v = base + 0.01 * rng.standard_normal(8)
        rows.append((i, (v / np.linalg.norm(v)).astype(float).tolist()))
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cent = refine_ivf_centroids(corpus, n_centroids=8, iters=3).toPandas()
    assert len(cent) == 8
    # every centroid is finite and ~unit-or-smaller (means of unit vectors)
    for cv in cent["centv"]:
        n = float(np.linalg.norm(cv))
        assert np.isfinite(n) and 0 < n <= 1.0 + 1e-6


def test_directed_flips_bit_exact_past_52(spark):
    """r3 verdict: pow(2.0, p) rounds for p > 52 — the flip must use an
    integral shift. Exercise every plane index 0..63 (incl. 53..63, where
    the double path silently flips the WRONG bit) and require the probe
    bucket to equal qbucket ^ (1 << p) bit-for-bit."""
    from diffsync_spark.functions.similarity import _directed_flips

    qbucket = -(2**63) + 0x5A5A5A5A5A5A5A5A  # bits set across the full word
    rows = [(qbucket, [{"a": float(p), "p": p}] ) for p in range(64)]
    df = spark.createDataFrame(
        rows, "qbucket long, marginal array<struct<a:double,p:int>>"
    )
    out = df.select(
        F.col("marginal")[0]["p"].alias("p"),
        _directed_flips(F.col("qbucket"), F.col("marginal"), 1)[0].alias("f"),
    ).collect()
    for r in out:
        want = (qbucket ^ (1 << r.p)) & (2**64 - 1)
        want = want - 2**64 if want >= 2**63 else want  # to signed long
        assert r.f == want, f"plane {r.p}: {r.f} != {want}"


def test_lsh_topk_n_planes_60(spark):
    """End-to-end at n_planes=60: signatures, directed probes and rerank
    must all be exact with plane bits past the double-precision boundary;
    self must always be found (probe 0 is the query's own bucket)."""
    rng = np.random.default_rng(3)
    rows = [(i, rng.standard_normal(32).astype(float).tolist())
            for i in range(50)]
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    queries = corpus.limit(3).select(
        F.col("vec_id").alias("query_id"), "embedding")
    got = lsh_cosine_topk(
        corpus, queries, k=3, n_planes=60, probes=6,
        probe_strategy="directed",
    ).toPandas()
    for qid in (0, 1, 2):
        mine = got[got.query_id == qid]
        assert mine.iloc[0]["vec_id"] == qid and mine.iloc[0]["rank"] == 1


def test_embedding_neardup_self(emb):
    """Duplicate a few vectors → near-dup pairs found at cosine≥0.999."""
    dup = emb.limit(4).withColumn("vec_id", F.col("vec_id") + 10_000)
    pairs = embedding_neardup_pairs(emb.union(dup), threshold=0.999)
    got = {(r.id_a, r.id_b) for r in pairs.collect()}
    assert {(i, i + 10_000) for i in range(4)} <= got


def test_multimodal_real_codecs(spark):
    """WAV/PPM payloads decode with the built-in pure-Python parsers; the
    recovered metadata must equal the metadata the fixture encoded with.
    MJPEG-in-MP4 videos decode for real (container parse + first frame);
    the garbage-blob videos are a per-row decode_ok=False, not a crash."""
    assets = fake_assets(spark, n=60)
    pdf = (
        decode_assets(assets, feat_dim=8)
        .join(assets.select("asset_id", F.col("width").alias("want_w"),
                            F.col("height").alias("want_h"),
                            F.col("duration_ms").alias("want_ms")), "asset_id")
        .toPandas()
    )
    assert len(pdf) == 60
    img, aud, vid = (pdf[pdf.kind == k] for k in ("image", "audio", "video"))
    assert img["decode_ok"].all() and aud["decode_ok"].all()
    # real MJPEG MP4s decode; the opaque blobs stay honest failures
    assert vid["decode_ok"].any() and not vid["decode_ok"].all()
    vok = vid[vid.decode_ok]
    assert (vok["duration_ms"] == vok["want_ms"]).all()
    # decoded dimensions/duration match what was encoded
    assert (img["width"] == img["want_w"]).all()
    assert (img["height"] == img["want_h"]).all()
    assert (aud["duration_ms"] == aud["want_ms"]).all()
    ok = pdf[pdf.decode_ok]
    assert ok["feat"].map(len).eq(8).all()
    # energies/intensities are real signal statistics, all in (0, 1]
    assert ok["feat"].map(lambda f: all(0 <= x <= 1 for x in f)).all()


def test_multimodal_plumbing_fake(spark):
    """fake=True exercises the Arrow/mapInPandas plumbing with zero codec
    cost — every payload yields the deterministic hash-derived feature."""
    assets = fake_assets(spark, n=60)
    pdf = decode_assets(assets, feat_dim=8, fake=True).toPandas()
    assert len(pdf) == 60
    assert pdf["decode_ok"].all()
    assert pdf["feat"].map(len).eq(8).all()
    assert pdf["sha256"].nunique() == 60  # payload-derived, deterministic
    plan = frame_sample_plan(assets, every_ms=5000)
    p = plan.toPandas()
    n_videos = assets.filter("kind = 'video'").count()
    assert p["asset_id"].nunique() == n_videos
    assert (p["frame_ts_ms"] % 5000 == 0).all()


def test_lsh_candidate_plan_carries_no_text(spark, docs):
    """Round-1 verdict item: the MinHash banding explode and candidate
    self-join must shuffle only ids + band hashes — the document text joins
    back post-candidate. Assert on the optimized plan: no Generate (explode)
    node outputs the text column."""
    import contextlib
    import io

    df = minhash_lsh_pairs(docs, threshold=0.7)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    sections = plan.split("\n\n")
    gen_sections = [s for s in sections if s.lstrip().startswith("(")
                    and "Generate" in s.splitlines()[0]]
    assert gen_sections, "expected an explode (Generate) node in the plan"
    for s in gen_sections:
        assert "__text" not in s, f"text column rides the banding explode:\n{s}"
    # and the exact-dedup window partitions on hashes, not the raw text
    dd = exact_dedup(docs)
    buf2 = io.StringIO()
    with contextlib.redirect_stdout(buf2):
        dd.explain("formatted")
    plan2 = buf2.getvalue()
    assert "xxhash64" in plan2  # the content key is computed
    # every Exchange partitions on the projected hash columns, never the text
    exch_args = [
        line for s in plan2.split("\n\n")
        if s.lstrip().startswith("(") and "Exchange" in s.splitlines()[0]
        for line in s.splitlines() if line.startswith("Arguments: hashpartitioning")
    ]
    assert exch_args and all("text#" not in a for a in exch_args)


def test_scrub_text(spark):
    from diffsync_spark.functions.text import scrub_text

    df = spark.createDataFrame(
        [("visit https://a.io/x?y=1 now",),
         ("mail bob.smith+x@corp.example.org ok",),
         ("call +1 415-555-0199 or 4111 1111 1111 1111",),
         ("clean text stays clean",),
         (None,)],
        "text string",
    )
    got = [r.c for r in df.select(
        scrub_text(F.col("text")).alias("c")).collect()]
    assert got[0] == "visit <|url|> now"
    assert got[1] == "mail <|email|> ok"
    assert "<|phone|>" in got[2] and "<|card|>" in got[2]
    assert got[3] == "clean text stays clean"
    assert got[4] is None

def test_ann_index_path_matches_inline(spark, tmp_path):
    """The persisted-index probe must return EXACTLY the inline path's
    results — identical seeded planes, identical buckets, identical rerank."""
    from diffsync_spark.functions.similarity import build_ann_index

    rng = np.random.default_rng(9)
    rows = [(i, rng.standard_normal(24).astype(float).tolist())
            for i in range(200)]
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    queries = corpus.limit(4).select(
        F.col("vec_id").alias("query_id"), "embedding")
    inline = lsh_cosine_topk(
        corpus, queries, k=5, n_planes=10, probes=4, seed=13
    ).toPandas().sort_values(["query_id", "rank"]).reset_index(drop=True)
    idx = str(tmp_path / "idx")
    meta = build_ann_index(corpus, idx, n_planes=10, seed=13)
    assert meta["n_planes"] == 10 and meta["dim"] == 24
    via_index = lsh_cosine_topk(
        None, queries, k=5, probes=4, index_path=idx
    ).toPandas().sort_values(["query_id", "rank"]).reset_index(drop=True)
    assert inline["vec_id"].tolist() == via_index["vec_id"].tolist()
    assert np.allclose(inline["cosine"], via_index["cosine"])

def test_png_decode_all_filters(spark):
    """PNG unfilter correctness without PIL: filter 0 (None) stores raw
    scanlines, so its decode is trivially correct — every other filter type
    encoding the SAME pixels must decode to identical width/height/features,
    across gray, gray+alpha, RGB and RGBA."""
    from diffsync_spark.functions.multimodal import decode_png, encode_png

    rng = np.random.default_rng(17)
    for ch in (1, 2, 3, 4):
        px = rng.integers(0, 256, size=(13, 9, ch)).astype(np.uint8)
        w0, h0, f0 = decode_png(encode_png(px, filter_type=0), feat_dim=4)
        assert (w0, h0) == (9, 13)
        # filter-0 features equal the direct band means of the raw pixels
        color = px[:, :, :3] if ch >= 3 else px[:, :, :1]
        want = [float(b.mean()) for b in
                np.array_split(color.astype(np.float64) / 255.0, 4, axis=0)]
        assert np.allclose(f0, want)
        for ft in (1, 2, 3, 4):
            w, h, f = decode_png(encode_png(px, filter_type=ft), feat_dim=4)
            assert (w, h, f) == (w0, h0, f0), f"filter {ft}, ch {ch}"


def test_png_decode_rejects_bad_payloads(spark):
    from diffsync_spark.functions.multimodal import decode_png, encode_png

    px = np.zeros((4, 4, 3), np.uint8)
    good = encode_png(px)
    for bad in (b"", b"\x89PNG\r\n\x1a\n", good[:20], b"JUNK" + good,
                good[:33] + good[41:]):  # last: IDAT length corrupted
        try:
            decode_png(bad, feat_dim=2)
            raise AssertionError("should have raised")
        except ValueError:
            pass
        except Exception:
            pass  # struct/zlib errors are also caught by decode_assets


def test_png_through_decode_assets(spark):
    """fake_assets now emits real PNG payloads (RGB+RGBA, rotating filters);
    every image row must decode with recovered dims equal to the metadata."""
    from diffsync_spark.functions.multimodal import decode_assets, fake_assets

    assets = fake_assets(spark, n=60)
    feats = decode_assets(assets, feat_dim=4).toPandas()
    png_meta = assets.filter(F.col("mime") == "image/png").select(
        "asset_id", "width", "height").toPandas().set_index("asset_id")
    assert len(png_meta) > 0
    got = feats.set_index("asset_id")
    for aid, row in png_meta.iterrows():
        assert bool(got.loc[aid, "decode_ok"]) is True
        assert got.loc[aid, "width"] == row["width"]
        assert got.loc[aid, "height"] == row["height"]
    # the garbage-blob videos remain the honest stub boundary; MJPEG MP4s
    # decode for real (covered in depth by test_mp4.py)
    vids = feats[feats.kind == "video"]
    assert (~vids["decode_ok"]).any()

def test_extend_ann_index(spark, tmp_path):
    """Incremental index maintenance: extended vectors use the INDEX'S
    planes (from the sidecar), land in the right bucket partitions, and
    are found by subsequent probes with no rebuild. The extended index
    must equal a from-scratch build over the full corpus."""
    from diffsync_spark.functions.similarity import (
        build_ann_index, extend_ann_index,
    )

    rng = np.random.default_rng(21)
    rows = [(i, rng.standard_normal(16).astype(float).tolist())
            for i in range(120)]
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    old, new = corpus.filter("vec_id < 100"), corpus.filter("vec_id >= 100")
    idx = str(tmp_path / "idx")
    build_ann_index(old, idx, n_planes=8, seed=4)
    meta = extend_ann_index(new, idx)
    assert meta["n_planes"] == 8 and meta["seed"] == 4
    # probing for a NEW vector finds itself at rank 1
    q = new.limit(2).select(F.col("vec_id").alias("query_id"), "embedding")
    got = lsh_cosine_topk(None, q, k=3, probes=4, index_path=idx).toPandas()
    for qid in got["query_id"].unique():
        top = got[(got.query_id == qid) & (got["rank"] == 1)]
        assert top.iloc[0]["vec_id"] == qid
    # extended layout == from-scratch build over the full corpus
    full = str(tmp_path / "full")
    build_ann_index(corpus, full, n_planes=8, seed=4)
    a = spark.read.parquet(idx).select("vec_id", "bucket").toPandas() \
        .sort_values("vec_id").reset_index(drop=True)
    b = spark.read.parquet(full).select("vec_id", "bucket").toPandas() \
        .sort_values("vec_id").reset_index(drop=True)
    assert (a["bucket"].values == b["bucket"].values).all()

def test_ivf_index_path_matches_inline(spark, tmp_path):
    """The persisted IVF probe must return EXACTLY the inline path's
    results — the index stores the same deterministic centroid set the
    inline path derives, so cells, probes, and rerank all agree."""
    from diffsync_spark.functions.similarity import (
        build_ivf_index, ivf_cosine_topk,
    )

    rng = np.random.default_rng(31)
    rows = [(i, rng.standard_normal(12).astype(float).tolist())
            for i in range(200)]
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    queries = corpus.limit(4).select(
        F.col("vec_id").alias("query_id"), "embedding")
    inline = ivf_cosine_topk(
        corpus, queries, k=5, n_centroids=8, n_probe=3
    ).toPandas().sort_values(["query_id", "rank"]).reset_index(drop=True)
    idx = str(tmp_path / "ivf")
    meta = build_ivf_index(corpus, idx, n_centroids=8)
    assert meta["n_centroids"] == 8 and meta["dim"] == 12
    via_index = ivf_cosine_topk(
        None, queries, k=5, n_probe=3, index_path=idx
    ).toPandas().sort_values(["query_id", "rank"]).reset_index(drop=True)
    assert inline["vec_id"].tolist() == via_index["vec_id"].tolist()
    assert np.allclose(inline["cosine"], via_index["cosine"])


def test_extend_ivf_index(spark, tmp_path):
    """Incremental IVF maintenance: extended vectors are assigned with the
    INDEX'S stored centroids (never recomputed from the caller's frame),
    land inside existing cid partitions, and are found by subsequent
    probes with no rebuild."""
    from diffsync_spark.functions.similarity import (
        IVF_CENTROID_DIR, _ivf_assign, build_ivf_index, extend_ivf_index,
        ivf_cosine_topk,
    )

    rng = np.random.default_rng(33)
    rows = [(i, rng.standard_normal(10).astype(float).tolist())
            for i in range(120)]
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    old, new = corpus.filter("vec_id < 100"), corpus.filter("vec_id >= 100")
    idx = str(tmp_path / "ivf")
    build_ivf_index(old, idx, n_centroids=6)
    meta = extend_ivf_index(new, idx)
    assert meta["n_centroids"] == 6
    # a NEW vector finds itself at rank 1 through the extended index
    q = new.limit(2).select(F.col("vec_id").alias("query_id"), "embedding")
    got = ivf_cosine_topk(None, q, k=3, n_probe=2, index_path=idx).toPandas()
    for qid in got["query_id"].unique():
        top = got[(got.query_id == qid) & (got["rank"] == 1)]
        assert top.iloc[0]["vec_id"] == qid
    # extension used the STORED centroids: its cids equal a direct
    # assignment of the new vectors against the index's centroid frame
    cent = spark.read.parquet(str(tmp_path / "ivf" / IVF_CENTROID_DIR))
    want = _ivf_assign(
        new.select(F.col("vec_id"), F.col("embedding").alias("cv")), cent
    ).select("vec_id", "cid").toPandas().sort_values("vec_id")
    stored = spark.read.parquet(idx).filter("vec_id >= 100") \
        .select("vec_id", "cid").toPandas().sort_values("vec_id")
    assert want["vec_id"].tolist() == stored["vec_id"].tolist()
    assert [int(c) for c in want["cid"]] == [int(c) for c in stored["cid"]]
    # dimension mismatch fails loudly instead of silently mis-bucketing
    bad = spark.createDataFrame(
        [(999, [1.0, 2.0])], "vec_id long, embedding array<float>")
    with pytest.raises(ValueError, match="dim"):
        extend_ivf_index(bad, idx)
    badq = bad.select(F.col("vec_id").alias("query_id"), "embedding")
    with pytest.raises(ValueError, match="dim"):
        ivf_cosine_topk(None, badq, k=1, index_path=idx)


def test_remove_boilerplate_lines(spark):
    """Corpus-wide line dedup: the shared footer (in every doc) drops, the
    unique content stays, short lines are never counted, order preserved."""
    from diffsync_spark.functions.text import remove_boilerplate_lines

    rows = [(i, f"real content of doc {i}\n- a\nsubscribe to our newsletter\n"
                f"second line {i}") for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = remove_boilerplate_lines(df, max_docs=5).toPandas() \
        .set_index("doc_id").sort_index()
    assert len(out) == 50
    r = out.loc[7]
    assert r["clean_text"] == "real content of doc 7\n- a\nsecond line 7"
    assert r["n_lines"] == 3 and r["n_dropped"] == 1


def test_boilerplate_matches_duckdb(spark):
    import duckdb

    from diffsync_spark.functions.text import (
        boilerplate_sql,
        remove_boilerplate_lines,
    )

    rows = [(i, f"alpha {i % 3}\nthe cookie banner text\nbody {i}\nx")
            for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = remove_boilerplate_lines(df, max_docs=8).toPandas() \
        .sort_values("doc_id").reset_index(drop=True)
    con = duckdb.connect()
    con.execute("CREATE TABLE t (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    want = con.execute(
        boilerplate_sql("SELECT * FROM t", max_docs=8)
        + " ORDER BY doc_id").df().reset_index(drop=True)
    assert (got["clean_text"].values == want["clean_text"].values).all()
    assert (got["n_dropped"].values == want["n_dropped"].values).all()

def test_boilerplate_keeps_all_boilerplate_docs(spark):
    """A document whose EVERY line is boilerplate must come back with
    clean_text='' — one output row per input doc, never silently lost
    (review fix: the old anti-join + inner-join dropped such docs)."""
    from diffsync_spark.functions.text import remove_boilerplate_lines

    rows = [(i, "subscribe to our newsletter") for i in range(20)]
    rows.append((99, "actual unique content here\nsubscribe to our newsletter"))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = remove_boilerplate_lines(df, max_docs=5).toPandas() \
        .set_index("doc_id").sort_index()
    assert len(out) == 21                       # every doc present
    assert out.loc[3, "clean_text"] == "" and out.loc[3, "n_lines"] == 0
    assert out.loc[3, "n_dropped"] == 1
    assert out.loc[99, "clean_text"] == "actual unique content here"


# ------------------------------------------------------ substring dedup


def _substr_fixture(spark):
    rows = [
        ("a", "the quick brown fox jumps over the lazy dog again and again"),
        ("b", "prefix words here but the quick brown fox jumps over the "
              "lazy dog too"),
        ("c", "no repeats in this one at all whatsoever truly"),
        ("d", "x x x the quick brown fox jumps over the lazy dog and more"),
        ("e", None),
        ("f", ""),
    ]
    return spark.createDataFrame(rows, "doc_id string, text string")


def test_substring_spans_finds_maximal_repeated_spans(spark):
    from diffsync_spark.functions.dedup import substring_spans

    df = _substr_fixture(spark)
    got = {(r["doc_id"], r["span_start"], r["span_end"])
           for r in substring_spans(df, min_tokens=9, hash_mode="md5").collect()}
    # the 9-token phrase repeats in a, b, d — one maximal span each, at the
    # right offsets; c/e/f emit nothing
    assert got == {("a", 0, 9), ("b", 4, 13), ("d", 3, 12)}


def test_substring_spans_hash_modes_agree(spark):
    from diffsync_spark.functions.dedup import substring_spans

    df = _substr_fixture(spark)
    md5 = sorted(map(tuple, substring_spans(df, 5, hash_mode="md5").collect()))
    xx = sorted(map(tuple, substring_spans(df, 5, hash_mode="xx64").collect()))
    assert md5 == xx and md5


def test_dedup_substrings_removes_every_occurrence(spark):
    from diffsync_spark.functions.dedup import dedup_substrings

    df = _substr_fixture(spark)
    out = {r["doc_id"]: (r["text"], r["n_removed_tokens"])
           for r in dedup_substrings(df, min_tokens=9).collect()}
    # the repeated phrase is gone from ALL THREE docs (no canonical copy)
    for doc in ("a", "b", "d"):
        assert "quick brown fox" not in out[doc][0]
        assert out[doc][1] == 9
    # untouched docs keep their text (including NULL/empty) and remove 0
    assert out["c"] == ("no repeats in this one at all whatsoever truly", 0)
    assert out["e"] == (None, 0)
    assert out["f"] == ("", 0)


def test_substring_spans_within_doc_repeat(spark):
    from diffsync_spark.functions.dedup import substring_spans

    df = spark.createDataFrame(
        [("solo", "alpha beta gamma delta sep alpha beta gamma delta")],
        "doc_id string, text string",
    )
    got = sorted(
        (r["span_start"], r["span_end"])
        for r in substring_spans(df, min_tokens=4).collect()
    )
    # the 4-token phrase repeats within one document: both occurrences emit
    assert got == [(0, 4), (5, 9)]


def test_substring_spans_skew_safe_plan(spark):
    """r6 optimization pin: the duplicated-hash detection must be a
    map-side-combinable partial aggregation below the exchange + a join
    (AQE-skew-splittable), NOT a count window partitioned by the hash (a
    window partition cannot be split, so one mega-duplicated boilerplate
    span became a single-task straggler — round-5 verdict finding #1a);
    and the window hashes must come from the O(tokens) rolling-hash UDF,
    not the per-position slice+join+hash chain."""
    from diffsync_spark.functions.dedup import substring_spans

    plan = substring_spans(
        _substr_fixture(spark), min_tokens=5
    )._jdf.queryExecution().executedPlan().toString()
    assert "partial_count" in plan  # map-side combine below the exchange
    assert "ArrowEvalPython" in plan  # the rolling-hash UDF
    # the only Window nodes left partition by the DOC id (span merging);
    # none may partition by the window hash
    for line in plan.splitlines():
        if "Window" in line and "windowspecdefinition" in line:
            assert "__h" not in line, line


def test_substring_spans_hot_span_completes(spark):
    """Hot-span fixture (round-5 verdict 'done' criterion): one shared
    span repeated across 20k docs — the old count-window sent every
    occurrence of each window hash to ONE task; the groupBy+join path
    collapses them map-side. Checks correctness of the span set and that
    the job completes quickly at high duplication."""
    from pyspark.sql import functions as F

    from diffsync_spark.functions.dedup import substring_spans

    n = 20_000
    df = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("unique prefix "), F.col("id").cast("string"),
            F.lit(" the exact same boilerplate sentence repeated in every "
                  "single document of this corpus"),
        ).alias("text"),
    )
    spans = substring_spans(df, min_tokens=8).groupBy(
        "span_start", "span_end"
    ).count().collect()
    # every doc carries exactly one maximal repeated span, same offsets
    assert len(spans) == 1
    assert spans[0]["count"] == n


def test_bpe_udf_matches_scalar_oracle_on_real_docs(spark):
    """The Arrow UDF (unique-pretoken cache path) vs the straightforward
    scalar reference, over the sf0.001 documents corpus + edge rows."""
    from diffsync_spark.functions.text import (
        bpe_count_py, bpe_token_count, parse_merges, train_bpe_merges)

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    texts = [r["text"] for r in docs.select("text").limit(80).collect()]
    merges = train_bpe_merges(texts[:40], n_merges=120)
    assert len(merges) > 20, "trainer must find real merges in real text"
    ranks = parse_merges(merges)
    rows = [(i, t) for i, t in enumerate(texts)] + [
        (900, None), (901, ""), (902, "   "), (903, "don't stop won't"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["n_bpe_tokens"]
           for r in bpe_token_count(df, merges).collect()}
    for i, t in rows:
        assert got[i] == (bpe_count_py(t, ranks) if t else 0), (i, t)


def test_bpe_count_compresses_vs_character_count(spark):
    """A trained merges table must actually merge: BPE count strictly
    between pretoken count and character count on in-domain text."""
    import re

    from diffsync_spark.functions.text import (
        BPE_PRETOKEN, bpe_count_py, parse_merges, train_bpe_merges)

    corpus = ["the cat sat on the mat the cat sat"] * 4
    ranks = parse_merges(train_bpe_merges(corpus, n_merges=60))
    t = corpus[0]
    n = bpe_count_py(t, ranks)
    n_pre = len(re.findall(BPE_PRETOKEN, t))
    assert n_pre <= n < len(t.replace(" ", "")) + t.count(" ")


def test_bpe_merge_order_is_rank_greedy():
    """Lowest-rank pair merges FIRST even when a later pair appears earlier
    in the word — the part of the algorithm a naive left-to-right scan gets
    wrong."""
    from diffsync_spark.functions.text import bpe_encode_py

    # ranks: ("b","c") rank 0 beats ("a","b") rank 1
    ranks = {("b", "c"): 0, ("a", "b"): 1, ("a", "bc"): 2}
    assert bpe_encode_py("abc", ranks) == ["abc"]  # a+bc after b+c
    ranks2 = {("a", "b"): 0, ("b", "c"): 1}
    assert bpe_encode_py("abc", ranks2) == ["ab", "c"]


def test_quantize_roundtrip_error_bound(spark):
    from diffsync_spark.functions.similarity import (
        dequantize_embeddings, quantize_embeddings)

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = quantize_embeddings(emb, keep_vec=True)
    back = dequantize_embeddings(q, out_col="rebuilt")
    err = back.select(
        F.array_max(F.zip_with(
            "embedding", "rebuilt",
            lambda a, b: F.abs(a.cast("double") - b.cast("double")))
        ).alias("max_err"),
        F.array_max(F.transform(
            "embedding", lambda x: F.abs(x.cast("double")))).alias("amax"),
    )
    # symmetric int8: worst-case per-element error is amax/254
    assert err.filter(
        F.col("max_err") > F.col("amax") / 254 + 1e-9).count() == 0
    # storage really is tinyint
    assert dict(q.dtypes)["q_embedding"] == "array<tinyint>"


def test_quantized_topk_recall_vs_exact(spark):
    from diffsync_spark.functions.similarity import (
        cosine_topk, quantized_cosine_topk)

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), "embedding")
    exact = {(r.query_id, r.vec_id)
             for r in cosine_topk(emb, queries, k=5).collect()}
    quant = {(r.query_id, r.vec_id)
             for r in quantized_cosine_topk(emb, queries, k=5).collect()}
    recall = len(exact & quant) / len(exact)
    # int8 rounding barely moves 64-dim cosines; near-perfect on fixtures
    assert recall >= 0.95, recall


def test_quantized_ann_index_probe(spark, tmp_path):
    """A quantize=True index is smaller on disk, extends with the same
    layout, and probes return near-identical neighbors (scale cancels —
    only corpus-side rounding differs)."""
    import glob
    import os

    from diffsync_spark.functions.similarity import (
        build_ann_index, extend_ann_index, lsh_cosine_topk)

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    half = emb.filter(F.col("vec_id") % 2 == 0)
    rest = emb.filter(F.col("vec_id") % 2 == 1)
    fp, qp = str(tmp_path / "f"), str(tmp_path / "q")
    build_ann_index(half, fp, n_planes=8)
    meta = build_ann_index(half, qp, n_planes=8, quantize=True)
    assert meta["quantized"]
    # size claim measured at few-bucket layout where files carry real data
    # mass (at 256 buckets of a 250-row fixture, per-file overhead is the
    # whole size); observed ratio ~0.32
    build_ann_index(emb, str(tmp_path / "f2"), n_planes=2)
    build_ann_index(emb, str(tmp_path / "q2"), n_planes=2, quantize=True)
    size = lambda d: sum(  # noqa: E731
        os.path.getsize(p)
        for p in glob.glob(f"{d}/**/*.parquet", recursive=True))
    assert size(str(tmp_path / "q2")) < size(str(tmp_path / "f2")) * 0.5
    extend_ann_index(rest, qp)
    extend_ann_index(rest, fp)

    queries = emb.filter(F.col("vec_id") < 6).select(
        F.col("vec_id").alias("query_id"), "embedding")
    full = {(r.query_id, r.vec_id)
            for r in lsh_cosine_topk(None, queries, k=5,
                                     probes=4, index_path=fp).collect()}
    quant = {(r.query_id, r.vec_id)
             for r in lsh_cosine_topk(None, queries, k=5,
                                      probes=4, index_path=qp).collect()}
    assert len(full & quant) / len(full) >= 0.9


def test_quantize_dirty_vectors_inert_not_fatal(spark):
    """NaN/Inf elements must not abort an index build under ANSI mode —
    dirty vectors quantize to zeros (inert) instead."""
    from diffsync_spark.functions.similarity import quantize_embeddings

    df = spark.createDataFrame(
        [(1, [1.0, 2.0, 3.0]),
         (2, [float("nan"), 1.0, 2.0]),
         (3, [float("inf"), 1.0, 2.0]),
         (4, [0.0, 0.0, 0.0])],
        "vec_id long, embedding array<double>")
    q = {r.vec_id: r.q_embedding
         for r in quantize_embeddings(df).collect()}
    assert q[1] == [42, 85, 127]
    assert q[2] == [0, 0, 0] and q[3] == [0, 0, 0] and q[4] == [0, 0, 0]


def test_extend_refuses_unknown_index_format(spark, tmp_path):
    import json
    import os

    from diffsync_spark.functions.similarity import (
        ANN_META_FILE, build_ann_index, extend_ann_index)

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    path = str(tmp_path / "idx")
    build_ann_index(emb, path, n_planes=4, quantize=True)
    meta = json.load(open(os.path.join(path, ANN_META_FILE)))
    assert meta["format"] == "diffsync_spark/ann-v2-int8"
    meta["format"] = "somebody-elses/ann-v9"
    json.dump(meta, open(os.path.join(path, ANN_META_FILE), "w"))
    with pytest.raises(ValueError, match="unknown ANN index format"):
        extend_ann_index(emb, path)


def test_quantized_ivf_index_probe(spark, tmp_path):
    from diffsync_spark.functions.similarity import (
        build_ivf_index, extend_ivf_index, ivf_cosine_topk)

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    half = emb.filter(F.col("vec_id") % 2 == 0)
    rest = emb.filter(F.col("vec_id") % 2 == 1)
    fp, qp = str(tmp_path / "f"), str(tmp_path / "q")
    build_ivf_index(half, fp, n_centroids=16)
    meta = build_ivf_index(half, qp, n_centroids=16, quantize=True)
    assert meta["format"] == "diffsync_spark/ivf-v2-int8"
    extend_ivf_index(rest, qp)
    extend_ivf_index(rest, fp)
    queries = emb.filter(F.col("vec_id") < 6).select(
        F.col("vec_id").alias("query_id"), "embedding")
    full = {(r.query_id, r.vec_id)
            for r in ivf_cosine_topk(None, queries, k=5, n_probe=4,
                                     index_path=fp).collect()}
    quant = {(r.query_id, r.vec_id)
             for r in ivf_cosine_topk(None, queries, k=5, n_probe=4,
                                      index_path=qp).collect()}
    assert len(full & quant) / len(full) >= 0.9
