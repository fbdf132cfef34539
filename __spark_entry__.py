"""Driver contract for the spark-graft builder (PySpark target).

Each ``queries()`` entry exercises one operator family from SURVEY.md §2 (or a
training-data pipeline operator) through the real engine code in
``diffsync_spark``; ``oracle_sql()`` holds the DuckDB twin the driver compares
against at sf=0.01 (row-count + schema + order-insensitive value hash).

Because the driver's tables are TPC-H-ish (no transcripts), the CDC queries
derive a deterministic keyed snapshot pair + changelog from the ``events``
table with arithmetic that is reproduced verbatim in the SQL oracles:

- natural key           = (user_id, event_id)
- source snapshot       = events where event_id % 17 != 3
- target snapshot       = events where event_id % 13 != 5, with ``val``
                          perturbed (+1) where event_id % 7 == 0  → updates
- changelog             = every 3rd event: op = delete iff event_type='error',
                          ts shifted +1h (or -2h when event_id % 11 == 0 →
                          late events), seq = event_id

Timestamps are emitted as ``unix_micros`` BIGINTs and doubles are rounded so
value hashes are engine-portable.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

from diffsync_spark.flags import DiffFlags
from diffsync_spark.functions.dedup import (
    content_key,
    cosine_col,
    embedding_neardup_pairs,
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    normalized_text,
    simhash_neardup_pairs,
)
from diffsync_spark.functions.similarity import cosine_topk, lsh_cosine_topk
from diffsync_spark.functions.text import (
    fingerprint_col,
    fingerprint_sql,
    lang_id,
    quality_features,
    scrub_sql,
    scrub_text,
    token_count_col,
    STOPWORDS,
)
from diffsync_spark.model import ModelSchema
from diffsync_spark.operators.diff import diff, diff_summary
from diffsync_spark.operators.lww import lww_dedup
from diffsync_spark.operators.rollup import rollup_diff, stable_turn_order
from diffsync_spark.plans.threeway import patch_snapshot

# Deterministic BPE merges for the bpe_token_count gate: trained ONCE at
# import from a fixed literal corpus (no data dependence), shared verbatim
# by the Spark UDF and the DuckDB recursive-CTE twin.
def _train_bpe():
    from diffsync_spark.functions.text import train_bpe_merges

    seed = [
        "the quick brown fox jumps over the lazy dog",
        "training data quality and deduplication at scale",
        "conversation transcripts with tools and turns",
        "the model answers the question and the user replies",
        "tokens and merges and counting words in documents",
    ] * 2
    return train_bpe_merges(seed, n_merges=150)


_BPE_MERGES = _train_bpe()


EVENT_MODEL = ModelSchema(
    name="event",
    identifiers=("user_id", "event_id"),
    attributes=("event_type", "val"),
    parent_key=("user_id",),
    version_cols=("ts",),
)

LWW_MODEL = ModelSchema(
    name="event_bucket",
    identifiers=("user_id", "k"),
    attributes=("event_type", "val"),
    version_cols=("ts",),
)


# ---------------------------------------------------------------- derivations
# documents/embeddings are spread across the cluster when the scan would
# otherwise under-parallelize (guide §2.5 input skew: the sf1.0 tables are
# single parquet files, so maxPartitionBytes-based splitting yields 2-4 scan
# partitions on a 32-core host and every downstream expression-heavy pass —
# tokenize/shingle, cosine folds — ran on those few tasks; measured
# 1.5-1.8s single-stage walls that drop to ~0.2s spread). At real corpus
# scale the scan already yields >= cores partitions and _spread_small_input
# passes the frame through untouched. `events` is NOT spread: its queries
# (diff/window/join) all lead with their own exchange, so an up-front
# round-robin shuffle is pure overhead (measured: diff_classify 1.2s ->
# 1.9s with the spread — reverted).
def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/events.parquet")


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from diffsync_spark.functions.dedup import _spread_small_input

    return _spread_small_input(
        spark.read.parquet(f"{sf_dir}/documents.parquet")
    )


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    from diffsync_spark.functions.dedup import _spread_small_input

    return _spread_small_input(
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    )


def _src(spark, sf_dir) -> DataFrame:
    e = _events(spark, sf_dir)
    return e.filter(F.col("event_id") % 17 != 3).select(
        "user_id", "event_id", "event_type", F.col("value").alias("val"), "ts"
    )


def _dst(spark, sf_dir) -> DataFrame:
    e = _events(spark, sf_dir)
    return e.filter(F.col("event_id") % 13 != 5).select(
        "user_id",
        "event_id",
        "event_type",
        F.when(F.col("event_id") % 7 == 0, F.col("value") + 1)
        .otherwise(F.col("value"))
        .alias("val"),
        "ts",
    )


def _changelog(spark, sf_dir) -> DataFrame:
    e = _events(spark, sf_dir).filter(F.col("event_id") % 3 == 0)
    return e.select(
        F.col("event_id").alias("seq"),
        F.when(F.col("event_type") == "error", "delete").otherwise("update").alias("op"),
        "user_id",
        "event_id",
        F.col("event_type"),
        (F.col("value") * 2).alias("val"),
        F.when(
            F.col("event_id") % 11 == 0,
            F.col("ts") - F.expr("INTERVAL 2 HOURS"),
        )
        .otherwise(F.col("ts") + F.expr("INTERVAL 1 HOUR"))
        .alias("ts"),
    )


_SQL_SRC = (
    "SELECT user_id, event_id, event_type, value AS val, ts FROM events "
    "WHERE event_id % 17 <> 3"
)
_SQL_DST = (
    "SELECT user_id, event_id, event_type, "
    "CASE WHEN event_id % 7 = 0 THEN value + 1 ELSE value END AS val, ts "
    "FROM events WHERE event_id % 13 <> 5"
)
_SQL_CHG = (
    "SELECT event_id AS seq, "
    "CASE WHEN event_type = 'error' THEN 'delete' ELSE 'update' END AS op, "
    "user_id, event_id, event_type, value * 2 AS val, "
    "CASE WHEN event_id % 11 = 0 THEN ts - INTERVAL 2 HOUR "
    "ELSE ts + INTERVAL 1 HOUR END AS ts "
    "FROM events WHERE event_id % 3 = 0"
)
_SQL_DIFF = f"""
WITH src AS ({_SQL_SRC}), dst AS ({_SQL_DST})
SELECT COALESCE(s.user_id, d.user_id) AS user_id,
       COALESCE(s.event_id, d.event_id) AS event_id,
       CASE WHEN d.event_id IS NULL THEN 'create'
            WHEN s.event_id IS NULL THEN 'delete'
            WHEN (s.event_type IS DISTINCT FROM d.event_type)
              OR (s.val IS DISTINCT FROM d.val) THEN 'update'
            ELSE 'noop' END AS op,
       CASE WHEN d.event_id IS NOT NULL AND s.event_id IS NOT NULL
             AND ((s.event_type IS DISTINCT FROM d.event_type)
               OR (s.val IS DISTINCT FROM d.val))
            THEN concat_ws(',',
              CASE WHEN s.event_type IS DISTINCT FROM d.event_type
                   THEN 'event_type' END,
              CASE WHEN s.val IS DISTINCT FROM d.val THEN 'val' END)
       END AS changed_str,
       s.val AS after_val, d.val AS before_val
FROM src s FULL OUTER JOIN dst d
  ON s.user_id = d.user_id AND s.event_id = d.event_id
"""


def _diff_classify(spark, sf_dir) -> DataFrame:
    d = diff(_src(spark, sf_dir), _dst(spark, sf_dir), EVENT_MODEL)
    return d.select(
        "user_id",
        "event_id",
        "op",
        F.array_join("changed_cols", ",").alias("changed_str"),
        F.col("after.val").alias("after_val"),
        F.col("before.val").alias("before_val"),
    )


def _norm_sql(expr: str) -> str:
    return f"regexp_replace(lower(trim(coalesce({expr}, ''))), '\\s+', ' ', 'g')"


_SQL_TOKENS = (
    "list_filter(string_split_regex(trim(coalesce(text, '')), '\\s+'), t -> t != '')"
)


def _lang_sql() -> str:
    hits = {
        lang: (
            f"len(list_filter(list_transform({_SQL_TOKENS}, t -> lower(t)), "
            f"t -> list_contains({words!r}, t)))"
        )
        for lang, words in STOPWORDS.items()
    }
    m = f"greatest({hits['en']}, {hits['es']}, {hits['de']}, {hits['fr']})"
    # argmax with lexicographically-greatest tie-break (matches array_max on
    # struct<hits,lang> in Spark): check fr, es, en, de in that order
    return (
        f"CASE WHEN {m} = 0 THEN 'unk' "
        f"WHEN {hits['fr']} = {m} THEN 'fr' "
        f"WHEN {hits['es']} = {m} THEN 'es' "
        f"WHEN {hits['en']} = {m} THEN 'en' "
        f"ELSE 'de' END"
    )


_SQL_DOT = (
    "list_reduce(list_prepend(CAST(0 AS DOUBLE), "
    "list_transform(range(1, 65), i -> "
    "CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE))), "
    "(x, y) -> x + y)"
)


def _sql_norm(side: str) -> str:
    return (
        f"sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE), "
        f"list_transform(range(1, 65), i -> "
        f"CAST({side}.embedding[i] AS DOUBLE) * CAST({side}.embedding[i] AS DOUBLE))), "
        f"(x, y) -> x + y))"
    )


_SQL_COSINE = f"round({_SQL_DOT} / greatest({_sql_norm('a')} * {_sql_norm('b')}, 1e-12), 4)"
# round-6 twin: the library's cosine_col rounds to 6 (ranking happens on this
# value); entries emit round(·, 4) on top for hash robustness
_SQL_COSINE6 = f"round({_SQL_DOT} / greatest({_sql_norm('a')} * {_sql_norm('b')}, 1e-12), 6)"


def _sql_cos6(lhs: str, rhs: str) -> str:
    """Round-6 cosine between two arbitrary FLOAT[] column refs — the
    sequential list_reduce fold matches cosine_col's F.aggregate order
    bit-for-bit (same reason _SQL_COSINE6 does)."""
    def _dot(x: str, y: str) -> str:
        return (
            "list_reduce(list_prepend(CAST(0 AS DOUBLE), "
            "list_transform(range(1, 65), i -> "
            f"CAST({x}[i] AS DOUBLE) * CAST({y}[i] AS DOUBLE))), "
            "(x, y) -> x + y)"
        )
    return (
        f"round({_dot(lhs, rhs)} / greatest("
        f"sqrt({_dot(lhs, lhs)}) * sqrt({_dot(rhs, rhs)}), 1e-12), 6)"
    )


# --- DuckDB twins of the near-dup machinery ---------------------------------
# word-3-gram shingles over normalized text, matching functions/dedup.py
# shingles_col exactly (distinct; whole-text fallback when < n tokens)
_SQL_SHINGLES = """
toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(
             regexp_replace(lower(trim(coalesce(text, ''))), '\\s+', ' ', 'g'),
             '\\s+'), t -> t != '') AS tk
  FROM documents),
sh AS (
  SELECT doc_id,
         CASE WHEN len(tk) >= 3 THEN
             list_distinct(list_transform(range(1, len(tk) - 1),
                                          i -> array_to_string(tk[i:i+2], ' ')))
         ELSE [array_to_string(tk, ' ')] END AS sh
  FROM toks)"""

# brute-force exact-Jaccard pair set via an inverted-index join (never a cross
# join). Serves as the oracle for BOTH ngram_jaccard_pairs (df-cap inactive at
# 500 docs) and minhash_lsh_pairs: at the fixture's pair distribution (min true
# jaccard 0.90) banding recall is 1 - (1 - 0.9^4)^16 ≈ 1 - 4e-8, and Spark's
# murmur3 is deterministic, so equality locally == equality in the driver.
_SQL_JACCARD_PAIRS = f"""
WITH {_SQL_SHINGLES},
inv AS (SELECT doc_id, unnest(sh) AS g FROM sh),
cand AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b
  FROM inv a JOIN inv b USING (g) WHERE a.doc_id < b.doc_id
  GROUP BY 1, 2),
scored AS (
  SELECT c.id_a, c.id_b,
         round(len(list_intersect(sa.sh, sb.sh)) * 1.0
               / greatest(len(list_distinct(list_concat(sa.sh, sb.sh))), 1),
               6) AS jaccard
  FROM cand c
  JOIN sh sa ON sa.doc_id = c.id_a
  JOIN sh sb ON sb.doc_id = c.id_b)
SELECT id_a, id_b, jaccard FROM scored WHERE jaccard >= 0.7"""

# 64-bit FNV-1a per token in HUGEINT modular arithmetic (xor folded through
# the low byte since per-byte xor only touches 8 bits), then the SimHash
# majority vote with the same bit layout as functions/dedup.py
# _simhash64_batch (output bit k = sign of token-hash bit 63-k) — verified
# bit-for-bit against the Spark pandas UDF on sf0.001 and sf0.01.
def _sql_fnv(basis: int) -> str:
    """FNV-1a over a token in HUGEINT modular arithmetic, parameterized by
    offset basis — the wide (128-bit) simhash uses a second independent
    basis (functions/dedup.py _FNV_BASIS2). Known fixture-scoped limit:
    ``ord(c)`` yields Unicode codepoints while the Spark twin hashes UTF-8
    bytes, so the oracles agree on ASCII tokens only (the documents
    fixture is ASCII; gated bit-exact at sf0.001/sf0.01)."""
    return (
        f"list_reduce(list_prepend({basis}::HUGEINT, "
        "list_transform(string_split(t, ''), c -> ord(c)::HUGEINT)), "
        "(h, b) -> ((h - (h % 256) + xor((h % 256)::BIGINT, b::BIGINT)::HUGEINT) "
        "* 1099511628211::HUGEINT) % 18446744073709551616::HUGEINT)"
    )


_SQL_FNV = _sql_fnv(0xCBF29CE484222325)
_SQL_P2 = "[" + ", ".join(str(1 << (63 - j)) for j in range(64)) + "]::HUGEINT[]"
_SQL_SIMHASH_PAIRS = f"""
WITH th AS (
  SELECT doc_id,
         unnest(list_filter(string_split_regex(lower(trim(coalesce(text, ''))),
                                               '\\s+'), t -> t != '')) AS t
  FROM documents),
fh AS (SELECT doc_id, {_SQL_FNV} AS h FROM th),
bits AS (
  SELECT doc_id, j,
         CASE WHEN sum(CASE WHEN (h // ({_SQL_P2})[64 - j]) % 2 = 1
                            THEN 1 ELSE -1 END) > 0
              THEN ({_SQL_P2})[j + 1] ELSE 0::HUGEINT END AS contrib
  FROM fh, range(64) r(j) GROUP BY doc_id, j),
sh0 AS (SELECT doc_id, sum(contrib) AS s FROM bits GROUP BY doc_id),
sh AS (
  SELECT d.doc_id,
         coalesce(CAST(CASE WHEN s.s >= 9223372036854775808::HUGEINT
                            THEN s.s - 18446744073709551616::HUGEINT
                            ELSE s.s END AS BIGINT), 0) AS simhash
  FROM documents d LEFT JOIN sh0 s ON d.doc_id = s.doc_id),
pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
  FROM sh a JOIN sh b ON a.doc_id < b.doc_id)
SELECT id_a, id_b, hamming FROM pairs WHERE hamming <= 3"""


_SQL_SIMHASH_WIDE_PAIRS = f"""
WITH th AS (
  SELECT doc_id,
         unnest(list_filter(string_split_regex(lower(trim(coalesce(text, ''))),
                                               '\\s+'), t -> t != '')) AS t
  FROM documents),
fh AS (SELECT doc_id, {_sql_fnv(0xCBF29CE484222325)} AS h1,
              {_sql_fnv(0x9E3779B97F4A7C15)} AS h2
       FROM th),
bits AS (
  SELECT doc_id, j,
         CASE WHEN sum(CASE WHEN (h1 // ({_SQL_P2})[64 - j]) % 2 = 1
                            THEN 1 ELSE -1 END) > 0
              THEN ({_SQL_P2})[j + 1] ELSE 0::HUGEINT END AS c1,
         CASE WHEN sum(CASE WHEN (h2 // ({_SQL_P2})[64 - j]) % 2 = 1
                            THEN 1 ELSE -1 END) > 0
              THEN ({_SQL_P2})[j + 1] ELSE 0::HUGEINT END AS c2
  FROM fh, range(64) r(j) GROUP BY doc_id, j),
sh0 AS (SELECT doc_id, sum(c1) AS s1, sum(c2) AS s2 FROM bits GROUP BY doc_id),
sh AS (
  SELECT d.doc_id,
         coalesce(CAST(CASE WHEN s.s1 >= 9223372036854775808::HUGEINT
                            THEN s.s1 - 18446744073709551616::HUGEINT
                            ELSE s.s1 END AS BIGINT), 0) AS hi,
         coalesce(CAST(CASE WHEN s.s2 >= 9223372036854775808::HUGEINT
                            THEN s.s2 - 18446744073709551616::HUGEINT
                            ELSE s.s2 END AS BIGINT), 0) AS lo
  FROM documents d LEFT JOIN sh0 s ON d.doc_id = s.doc_id),
pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         CAST(bit_count(xor(a.hi, b.hi))
              + bit_count(xor(a.lo, b.lo)) AS BIGINT) AS hamming
  FROM sh a JOIN sh b ON a.doc_id < b.doc_id)
SELECT id_a, id_b, hamming FROM pairs WHERE hamming <= 3"""


def _plane_dots_sql(side: str, planes) -> list[str]:
    """Per-plane dot expressions, same seeded plane literals (embedded at
    full double precision) and same sequential fold order as Spark's
    _plane_dots — doubles match bit-for-bit."""
    dots = []
    for plane in planes:
        arr = "[" + ", ".join(repr(float(x)) for x in plane) + "]::DOUBLE[]"
        dots.append(
            f"list_reduce(list_prepend(0.0::DOUBLE, list_transform(range(1, 65), "
            f"i -> CAST({side}.embedding[i] AS DOUBLE) * ({arr})[i])), "
            f"(x, y) -> x + y)"
        )
    return dots


def _plane_sql(side: str, planes) -> str:
    """DuckDB twin of dedup._plane_signature: same strict > 0 sign test over
    the shared dot expressions — so bucket ids match Spark's bit-for-bit."""
    terms = [
        f"(CASE WHEN {dot} > 0 THEN {1 << p} ELSE 0 END)"
        for p, dot in enumerate(_plane_dots_sql(side, planes))
    ]
    return "(" + " + ".join(terms) + ")::BIGINT"


def _lsh_topk_sql(k: int = 5, n_planes: int = 12, probes: int = 4, seed: int = 42) -> str:
    """Twin of lsh_cosine_topk with the DEFAULT query-directed probing: the
    probed flips are the `probes` planes with the smallest |dot| (struct
    list_sort = field-lexicographic, ties by plane index — identical to
    Spark's array_sort of (abs(dot), p) structs)."""
    import numpy as np

    planes = np.random.default_rng(seed).standard_normal((n_planes, 64))
    dots = _plane_dots_sql("q0", planes)  # evaluated in the q CTE over q0
    marginal = "[" + ", ".join(
        f"struct_pack(a := abs({dot}), p := {p})" for p, dot in enumerate(dots)
    ) + "]"
    n_probe = min(probes, n_planes)
    probe_list = (
        f"list_prepend(qbucket, list_transform("
        f"list_slice(list_sort({marginal}), 1, {n_probe}), "
        f"s -> xor(qbucket, CAST(power(2, s.p) AS BIGINT))))"
    )
    return f"""
WITH c AS (SELECT vec_id, embedding, {_plane_sql('embeddings', planes)} AS bucket
           FROM embeddings),
q0 AS (SELECT vec_id AS query_id, embedding,
              {_plane_sql('embeddings', planes)} AS qbucket
       FROM embeddings WHERE vec_id < 3),
q AS (SELECT query_id, embedding, unnest({probe_list}) AS bucket FROM q0),
scored AS (
  SELECT DISTINCT b.query_id, a.vec_id, {_SQL_COSINE6} AS cosine
  FROM c a JOIN q b USING (bucket)),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY cosine DESC, vec_id ASC) AS rank
  FROM scored)
SELECT query_id, vec_id, round(cosine, 4) AS cosine, rank
FROM ranked WHERE rank <= {k}"""


def _emb_neardup_sql(threshold: float = 0.9, n_planes: int = 16, seed: int = 42) -> str:
    import numpy as np

    planes = np.random.default_rng(seed).standard_normal((n_planes, 64))
    return f"""
WITH e AS (SELECT vec_id, embedding, {_plane_sql('embeddings', planes)} AS bucket
           FROM embeddings)
SELECT id_a, id_b, round(cosine, 4) AS cosine FROM (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b, {_SQL_COSINE6} AS cosine
  FROM e a JOIN e b ON a.bucket = b.bucket AND a.vec_id < b.vec_id)
WHERE cosine >= {threshold}"""


# ------------------------------------------------------------------- queries
def entry(spark: SparkSession) -> DataFrame:
    """Flagship: keyed CDC diff classification over the derived snapshot pair
    at sf0.001 (actionable rows only)."""
    return _diff_classify(spark, "/root/testdata/sf0.001").filter("op <> 'noop'")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    q: dict[str, Callable[[SparkSession, str], DataFrame]] = {}

    # --- the diff core (J1, A1-A3)
    q["diff_classify"] = _diff_classify
    q["diff_summary"] = lambda spark, sf: diff_summary(
        diff(_src(spark, sf), _dst(spark, sf), EVENT_MODEL)
    )
    # flags J5/J6 as join modes
    q["diff_skip_unmatched_src"] = lambda spark, sf: diff(
        _src(spark, sf), _dst(spark, sf), EVENT_MODEL,
        DiffFlags(skip_unmatched_src=True),
    ).groupBy("op").agg(F.count("*").alias("n"))
    q["diff_skip_unmatched_dst"] = lambda spark, sf: diff(
        _src(spark, sf), _dst(spark, sf), EVENT_MODEL,
        DiffFlags(skip_unmatched_dst=True),
    ).groupBy("op").agg(F.count("*").alias("n"))

    # --- LWW dedup (window) over a colliding key space. The one
    # events-based query that benefits from spreading the small-file scan
    # (measured 2.15 -> 1.80 s at sf1.0): its map side does real per-row
    # work (WindowGroupLimit partial top-1) before the exchange, unlike
    # diff/patch whose first stage is a plain project into the shuffle
    # (those measured WORSE with an up-front round-robin — left unspread).
    def lww(spark, sf):
        from diffsync_spark.functions.dedup import _spread_small_input

        e = _spread_small_input(_events(spark, sf)).select(
            "user_id",
            (F.col("event_id") % 100).alias("k"),
            "event_type",
            F.col("value").alias("val"),
            "ts",
            F.col("event_id").alias("seq"),
        )
        w = lww_dedup(e, LWW_MODEL)
        return w.select(
            "user_id", "k", "event_type", "val", F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
            "seq",
        )

    q["lww_dedup"] = lww

    # --- three-way desired state (patch snapshot with changelog winners)
    def patch(spark, sf):
        p = patch_snapshot(_src(spark, sf), _changelog(spark, sf), EVENT_MODEL)
        return p.select(
            "user_id", "event_id", "event_type",
            F.round("val", 6).alias("val"), F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
        )

    q["patch_snapshot"] = patch

    # --- hierarchy rollup (J3/G1) by the parent key
    def rollup(spark, sf):
        d = diff(_src(spark, sf), _dst(spark, sf), EVENT_MODEL)
        return rollup_diff(d, EVENT_MODEL)

    q["rollup_parent"] = rollup

    # --- ordering (O1): stable rank within parent
    def order(spark, sf):
        e = _events(spark, sf).select("user_id", "event_id", "ts")
        m = ModelSchema(
            name="e", identifiers=("user_id", "event_id"),
            attributes=(), parent_key=("user_id",), version_cols=("ts",),
        )
        return stable_turn_order(e, m).select(
            "user_id", "event_id", "turn_rank"
        )

    q["stable_order"] = order

    # --- keyed lookups (P1, P4, P6, P8)
    q["point_lookup"] = lambda spark, sf: _events(spark, sf).filter(
        (F.col("user_id") == 7) & (F.col("event_id") % 50 == 0)
    ).select("user_id", "event_id", "event_type", F.col("value").alias("val"))
    q["count_all"] = lambda spark, sf: _events(spark, sf).agg(
        F.count("*").alias("n_rows"),
        F.countDistinct("user_id").alias("n_users"),
    )
    q["uid_concat"] = lambda spark, sf: _events(spark, sf).select(
        F.concat_ws(
            "__", F.col("user_id").cast("string"), F.col("event_id").cast("string")
        ).alias("uid")
    )

    # --- training-data ops: documents
    # groups on the 128-bit content key (two xxhash64 of the normalized
    # text), NOT the raw text — the shuffle key is 16 bytes, not the document
    def _exact_dedup_groups(spark, sf):
        docs = _docs(spark, sf)
        h1, h2 = content_key(F.col("text"))
        return docs.groupBy(h1.alias("h1"), h2.alias("h2")).agg(
            F.min("doc_id").alias("keep_id"), F.count("*").alias("n_dups")
        ).select("keep_id", "n_dups")

    q["exact_dedup_groups"] = _exact_dedup_groups
    q["token_count"] = lambda spark, sf: _docs(spark, sf).select(
        "doc_id",
        token_count_col(F.coalesce(F.col("text"), F.lit(""))).alias("n_tokens"),
    )
    q["quality_score"] = lambda spark, sf: quality_features(
        _docs(spark, sf).withColumn("text", F.coalesce("text", F.lit("")))
    ).select(
        "doc_id", "n_tokens", "punct_ratio", "stopword_ratio", "quality_score"
    )
    q["lang_id"] = lambda spark, sf: _docs(spark, sf).select(
        "doc_id", lang_id(F.coalesce(F.col("text"), F.lit(""))).alias("lang_guess")
    )
    q["fingerprint"] = lambda spark, sf: _docs(spark, sf).select(
        "doc_id", fingerprint_col(F.coalesce(F.col("text"), F.lit(""))).alias("fp")
    )

    # --- training-data ops: near-dup / similarity — each entry calls the
    # LIBRARY function (round-1 verdict: inline re-implementations certify
    # the math, not the shipped code)
    q["ngram_jaccard_pairs"] = lambda spark, sf: ngram_jaccard_pairs(
        _docs(spark, sf), threshold=0.7
    )
    q["minhash_lsh_pairs"] = lambda spark, sf: minhash_lsh_pairs(
        _docs(spark, sf), threshold=0.7
    )
    q["simhash_neardup_pairs"] = lambda spark, sf: simhash_neardup_pairs(
        _docs(spark, sf), max_hamming=3
    ).select("id_a", "id_b", F.col("hamming").cast("long").alias("hamming"))
    # the 10^10-doc banding widener (128-bit simhash, 4x32-bit chunks):
    # same pigeonhole recall guarantee, 2^32 buckets per chunk; DuckDB twin
    # recomputes BOTH FNV-1a families in HUGEINT and the exact 128-bit
    # hamming over all pairs
    q["simhash_wide_pairs"] = lambda spark, sf: simhash_neardup_pairs(
        _docs(spark, sf), max_hamming=3, wide=True
    ).select("id_a", "id_b", F.col("hamming").cast("long").alias("hamming"))

    # --- pairs → clusters → survivors: the end-to-end dedup closure.
    # Components via min-label propagation (library fn); the DuckDB twin is
    # an independent transitive-closure recursive CTE over the same
    # (already-gated) pair set.
    def nd_components(spark, sf):
        from diffsync_spark.functions.dedup import neardup_components

        pairs = minhash_lsh_pairs(_docs(spark, sf), threshold=0.7)
        return neardup_components(pairs)

    q["neardup_components"] = nd_components

    def nd_dedup(spark, sf):
        from diffsync_spark.functions.dedup import dedup_near_duplicates

        docs = _docs(spark, sf)
        pairs = minhash_lsh_pairs(docs, threshold=0.7)
        return dedup_near_duplicates(docs, pairs).select("doc_id")

    q["neardup_dedup"] = nd_dedup

    # --- training-data ops: embeddings
    def topk(spark, sf):
        emb = _emb(spark, sf)
        queries_df = emb.filter(F.col("vec_id") < 3).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        out = cosine_topk(emb, queries_df, k=5)
        return out.select(
            "query_id", "vec_id", F.round("cosine", 4).alias("cosine"), "rank"
        )

    q["cosine_topk"] = topk

    # --- int8-quantized cosine: the 4x-smaller-corpus scale lever. The
    # gate quantizes BOTH sides and scores on the integer arrays (scales
    # cancel out of cosine); the twin replays the exact same per-vector
    # quantization, so the comparison is bit-deterministic, not a recall
    # bound
    def q_topk(spark, sf):
        from diffsync_spark.functions.similarity import quantized_cosine_topk

        emb = _emb(spark, sf)
        queries_df = emb.filter(F.col("vec_id") < 3).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        out = quantized_cosine_topk(emb, queries_df, k=5)
        return out.select(
            "query_id", "vec_id", F.round("cosine", 4).alias("cosine"), "rank"
        )

    q["quantized_cosine_topk"] = q_topk

    def ann_topk(spark, sf):
        # through the PERSISTED index path (the 100 TB shape): bucket the
        # corpus once with build_ann_index, then probe via partition-pruned
        # scans — same results as the inline path by construction (identical
        # seeded planes), which the shared oracle SQL twin still checks
        import tempfile

        from diffsync_spark.functions.similarity import build_ann_index

        emb = _emb(spark, sf)
        queries_df = emb.filter(F.col("vec_id") < 3).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        idx = tempfile.mkdtemp(prefix="ann_idx_") + "/index"
        build_ann_index(emb, idx, n_planes=12, seed=42)
        out = lsh_cosine_topk(None, queries_df, k=5, probes=4,
                              index_path=idx)
        return out.select(
            "query_id", "vec_id", F.round("cosine", 4).alias("cosine"), "rank"
        )

    q["lsh_cosine_topk"] = ann_topk

    def ivf_topk(spark, sf):
        # the second ANN scale path, through the PERSISTED index (the
        # 100 TB shape): cell-partition the corpus once with
        # build_ivf_index, then probe via partition-pruned cell scans —
        # same results as the inline path by construction (identical
        # deterministic md5(salt|id) centroid set, stored in the index),
        # which the shared oracle SQL twin still checks
        import tempfile

        from diffsync_spark.functions.similarity import (
            build_ivf_index,
            ivf_cosine_topk,
        )

        emb = _emb(spark, sf)
        queries_df = emb.filter(F.col("vec_id") < 3).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        idx = tempfile.mkdtemp(prefix="ivf_idx_") + "/index"
        build_ivf_index(emb, idx, n_centroids=8)
        out = ivf_cosine_topk(None, queries_df, k=5, n_probe=3, index_path=idx)
        return out.select(
            "query_id", "vec_id", F.round("cosine", 4).alias("cosine"), "rank"
        )

    q["ivf_cosine_topk"] = ivf_topk

    def ivf_refine(spark, sf):
        # the IVF TRAINING loop itself: 2 spherical-k-means rounds over the
        # hash-sampled seed, all DataFrame ops (assignment is a projection,
        # update a groupBy over n_centroids keys). The twin replays the
        # identical seed -> assign -> round-5 mean -> empty-cell coalesce
        # chain, so a drifted tie-break or fold order fails the gate.
        from diffsync_spark.functions.similarity import refine_ivf_centroids

        cent = refine_ivf_centroids(_emb(spark, sf), n_centroids=8, iters=2)
        return cent.select(
            "cid", F.posexplode("centv").alias("pos", "val")
        ).select("cid", "pos", F.round("val", 5).alias("val"))

    q["ivf_refine_centroids"] = ivf_refine

    q["embedding_neardup"] = lambda spark, sf: embedding_neardup_pairs(
        _emb(spark, sf), threshold=0.3, n_planes=8, seed=42
    ).select("id_a", "id_b", F.round("cosine", 4).alias("cosine"))

    # --- the real sink: bootstrap + LWW merge, read back final state.
    # The oracle is the same three-way LWW algebra in pure SQL — this puts the
    # actual MERGE/tombstone/manifest machinery under the driver's check.
    def merge_state(spark, sf):
        import tempfile

        from diffsync_spark.sinks.table import SnapshotTable

        tmp = tempfile.mkdtemp(prefix="merge_state_")
        snap = _src(spark, sf)
        table = SnapshotTable.create(
            spark, f"{tmp}/tbl", EVENT_MODEL, schema=snap.schema, n_buckets=8
        )
        table.merge(
            snap.withColumn("op", F.lit("insert")), mode="force",
            checkpoint_id="boot", batch_id=0,
        )
        table.merge(_changelog(spark, sf), checkpoint_id="chg", batch_id=1)
        return table.read().select(
            "user_id", "event_id", "event_type",
            F.round("val", 6).alias("val"), F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
        )

    q["merge_state"] = merge_state

    # --- the same replay through the MERGE-ON-READ write mode: LWW merges
    # append delta layers (no base rewrite), the read folds base+layers to
    # one winner per key, and a PARTIAL compaction folds half the buckets —
    # so the final read mixes folded base with still-layered buckets. The
    # oracle is the identical patch algebra: MoR must be observationally
    # equal to copy-on-write.
    def mor_merge_state(spark, sf):
        import tempfile

        from diffsync_spark.sinks.table import SnapshotTable
        from diffsync_spark.streaming.replay import replay_batches

        tmp = tempfile.mkdtemp(prefix="mor_merge_state_")
        snap = _src(spark, sf)
        table = SnapshotTable.create(
            spark, f"{tmp}/tbl", EVENT_MODEL, schema=snap.schema,
            n_buckets=8, write_mode="mor",
        )
        table.merge(
            snap.withColumn("op", F.lit("insert")), mode="force",
            checkpoint_id="boot", batch_id=0,
        )
        replay_batches(table, _changelog(spark, sf), n_batches=3,
                       checkpoint_id="chg")
        table.compact(buckets=[0, 1, 2, 3])
        return table.read().select(
            "user_id", "event_id", "event_type",
            F.round("val", 6).alias("val"),
            F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
        )

    q["mor_merge_state"] = mor_merge_state

    # --- write-audit-publish under the same algebra: the changelog lands
    # on a BRANCH (main never sees the in-flight batches), an audit reads
    # the branch, and publish() fast-forwards main as a metadata-only
    # commit. Main's final state must equal a direct merge — WAP is
    # observationally transparent, it only changes WHEN readers see data.
    def wap_publish_state(spark, sf):
        import tempfile

        from diffsync_spark.sinks.table import SnapshotTable
        from diffsync_spark.streaming.replay import replay_batches

        tmp = tempfile.mkdtemp(prefix="wap_publish_state_")
        snap = _src(spark, sf)
        table = SnapshotTable.create(
            spark, f"{tmp}/tbl", EVENT_MODEL, schema=snap.schema, n_buckets=8
        )
        table.merge(
            snap.withColumn("op", F.lit("insert")), mode="force",
            checkpoint_id="boot", batch_id=0,
        )
        table.create_branch("audit")
        br = table.branch("audit")
        replay_batches(br, _changelog(spark, sf), n_batches=2,
                       checkpoint_id="chg")
        # the audit step: validate the staged state before anyone sees it
        assert br.read().count() > 0
        table.publish("audit", delete_branch=True)
        return table.read().select(
            "user_id", "event_id", "event_type",
            F.round("val", 6).alias("val"),
            F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
        )

    q["wap_publish_state"] = wap_publish_state

    # --- declarative expectations (data contracts on ingest): the same
    # replay with two named predicates — upsert rows failing either are
    # QUARANTINED (not applied, not dropped), deletes are exempt. Oracle =
    # the patch algebra over a changelog pre-filtered by the same rule, so
    # the final state proves exactly the contract-passing rows applied.
    def merge_expectations_state(spark, sf):
        import tempfile

        from diffsync_spark.sinks.table import SnapshotTable

        tmp = tempfile.mkdtemp(prefix="merge_expectations_state_")
        snap = _src(spark, sf)
        table = SnapshotTable.create(
            spark, f"{tmp}/tbl", EVENT_MODEL, schema=snap.schema, n_buckets=8
        )
        table.merge(
            snap.withColumn("op", F.lit("insert")), mode="force",
            checkpoint_id="boot", batch_id=0,
        )
        res = table.merge(
            _changelog(spark, sf), checkpoint_id="chg", batch_id=1,
            expectations={
                "mod5": "event_id % 5 <> 0",
                "typed": "event_type IS NOT NULL",
            },
        )
        assert res["n_expectation_failed"] > 0  # the contract really fired
        assert res["n_quarantined"] >= res["n_expectation_failed"]
        return table.read().select(
            "user_id", "event_id", "event_type",
            F.round("val", 6).alias("val"),
            F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
        )

    q["merge_expectations_state"] = merge_expectations_state

    # --- column RENAME through the replay: bootstrap writes files under
    # the old name, rename_column is a metadata-only commit (stable
    # parquet field ids — old files resolve under the new name with zero
    # data movement), and the changelog then merges using the NEW name.
    # Oracle = the identical patch algebra with the output column aliased:
    # a wrong id mapping would NULL every boot-file value and fail the
    # hash.
    def rename_evolution_state(spark, sf):
        import tempfile

        from diffsync_spark.sinks.table import SnapshotTable

        tmp = tempfile.mkdtemp(prefix="rename_evolution_state_")
        snap = _src(spark, sf)
        table = SnapshotTable.create(
            spark, f"{tmp}/tbl", EVENT_MODEL, schema=snap.schema, n_buckets=8
        )
        table.merge(
            snap.withColumn("op", F.lit("insert")), mode="force",
            checkpoint_id="boot", batch_id=0,
        )
        table.rename_column("val", "metric")
        table.merge(
            _changelog(spark, sf).withColumnRenamed("val", "metric"),
            checkpoint_id="chg", batch_id=1,
        )
        return table.read().select(
            "user_id", "event_id", "event_type",
            F.round("metric", 6).alias("metric"),
            F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
        )

    q["rename_evolution_state"] = rename_evolution_state

    # --- incrementally-maintained AGGREGATE view (gold layer): a per-user
    # rollup table is bootstrapped from the boot snapshot, the changelog
    # replays upstream in 2 batches, and pipe_aggregate recomputes ONLY
    # the dirty groups (bucket-pruned: user_id IS the upstream bucketing
    # key). Oracle = GROUP BY over the same patch-algebra final state —
    # the incremental path must equal the from-scratch aggregate
    # (count / distinct-count / max survive deletes only because whole
    # dirty groups recompute, which is the operator's point).
    def pipe_rollup_state(spark, sf):
        import tempfile

        from pyspark.sql import types as T

        from diffsync_spark.model import ModelSchema
        from diffsync_spark.sinks.table import SnapshotTable
        from diffsync_spark.streaming.replay import (
            pipe_aggregate, replay_batches,
        )

        rollup_model = ModelSchema(
            name="user_rollup",
            identifiers=("user_id",),
            attributes=("n_events", "n_types", "max_ts_us", "max_val"),
        )

        def agg(df):
            return df.groupBy("user_id").agg(
                F.count(F.lit(1)).alias("n_events"),
                F.countDistinct("event_type").alias("n_types"),
                F.max(
                    F.unix_micros(F.col("ts").cast("timestamp"))
                ).alias("max_ts_us"),
                F.round(F.max("val"), 6).alias("max_val"),
            )

        tmp = tempfile.mkdtemp(prefix="pipe_rollup_state_")
        snap = _src(spark, sf)
        up = SnapshotTable.create(
            spark, f"{tmp}/up", EVENT_MODEL, schema=snap.schema, n_buckets=8
        )
        up.merge(
            snap.withColumn("op", F.lit("insert")), mode="force",
            checkpoint_id="boot", batch_id=0,
        )
        down = SnapshotTable.create(
            spark, f"{tmp}/rollup", rollup_model,
            schema=T.StructType([
                T.StructField("user_id", T.LongType()),
                T.StructField("n_events", T.LongType()),
                T.StructField("n_types", T.LongType()),
                T.StructField("max_ts_us", T.LongType()),
                T.StructField("max_val", T.DoubleType()),
            ]),
            n_buckets=4,
        )
        pipe_aggregate(up, down, agg, checkpoint_id="roll")  # bootstrap
        replay_batches(up, _changelog(spark, sf), n_batches=2,
                       checkpoint_id="chg")
        pipe_aggregate(up, down, agg, checkpoint_id="roll")  # dirty hops
        return down.read().select(
            "user_id", "n_events", "n_types", "max_ts_us",
            F.round("max_val", 6).alias("max_val"),
        )

    q["pipe_rollup_state"] = pipe_rollup_state

    # --- partition-spec evolution under the same algebra: replay into a
    # deliberately-undersized 2-bucket table, grow it to 16 buckets
    # (rebucket = one fold-aware rewrite), then keep merging into the new
    # layout. Final state must be layout-independent.
    def rebucket_state(spark, sf):
        import tempfile

        from diffsync_spark.sinks.table import SnapshotTable
        from diffsync_spark.streaming.replay import replay_batches

        tmp = tempfile.mkdtemp(prefix="rebucket_state_")
        snap = _src(spark, sf)
        table = SnapshotTable.create(
            spark, f"{tmp}/tbl", EVENT_MODEL, schema=snap.schema, n_buckets=2,
        )
        table.merge(
            snap.withColumn("op", F.lit("insert")), mode="force",
            checkpoint_id="boot", batch_id=0,
        )
        chg = _changelog(spark, sf)
        half = chg.agg(F.avg("seq")).first()[0]
        table.merge(chg.filter(F.col("seq") <= half), checkpoint_id="chg",
                    batch_id=1)
        table.rebucket(16)
        table.merge(chg.filter(F.col("seq") > half), checkpoint_id="chg",
                    batch_id=2)
        return table.read().select(
            "user_id", "event_id", "event_type",
            F.round("val", 6).alias("val"),
            F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
        )

    q["rebucket_state"] = rebucket_state

    # --- bulk keyed probe of the durable table: lookup_many reads only the
    # key set's buckets/slots; result must equal the patched state filtered
    # to the probed keys, with misses (never-existing probes) and deleted
    # keys absent
    def bulk_lookup(spark, sf):
        import tempfile

        from diffsync_spark.sinks.table import SnapshotTable

        tmp = tempfile.mkdtemp(prefix="bulk_lookup_")
        snap = _src(spark, sf)
        table = SnapshotTable.create(
            spark, f"{tmp}/tbl", EVENT_MODEL, schema=snap.schema, n_buckets=8
        )
        table.merge(
            snap.withColumn("op", F.lit("insert")), mode="force",
            checkpoint_id="boot", batch_id=0,
        )
        table.merge(_changelog(spark, sf), checkpoint_id="chg", batch_id=1)
        keys = (
            snap.select("user_id", "event_id")
            .unionByName(_changelog(spark, sf).select("user_id", "event_id"))
            .filter(F.col("user_id") % 7 == 3)
            # provably-missing probes: must not appear in the result
            .unionByName(
                spark.range(5).select(
                    (-F.col("id") - 1).alias("user_id"),
                    F.col("id").alias("event_id"),
                )
            )
        )
        return table.lookup_many(keys).select(
            "user_id", "event_id", "event_type",
            F.round("val", 6).alias("val"),
            F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
        )

    q["bulk_lookup"] = bulk_lookup

    # --- stats-pruned filtered scan: same merged state, read back through
    # scan() — hash-bucket routing on the parent key plus per-file
    # (min,max) stats recorded at write prune the file list BEFORE Spark
    # lists anything; the oracle is the plain filtered patch algebra, so a
    # wrongly-pruned file shows up as missing rows
    def stats_scan(spark, sf):
        import tempfile

        from diffsync_spark.sinks.table import SnapshotTable

        tmp = tempfile.mkdtemp(prefix="stats_scan_")
        snap = _src(spark, sf)
        table = SnapshotTable.create(
            spark, f"{tmp}/tbl", EVENT_MODEL, schema=snap.schema, n_buckets=8
        )
        table.merge(
            snap.withColumn("op", F.lit("insert")), mode="force",
            checkpoint_id="boot", batch_id=0,
        )
        table.merge(_changelog(spark, sf), checkpoint_id="chg", batch_id=1)
        return table.scan(
            [("user_id", "=", 7), ("event_id", ">=", 100)]
        ).select(
            "user_id", "event_id", "event_type",
            F.round("val", 6).alias("val"),
            F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
        )

    q["stats_pruned_lookup"] = stats_scan

    # --- Z-order clustering: compact(zorder=[...]) rewrites buckets on the
    # Morton interleave of (event_id, val) and records per-file stats for
    # BOTH; a 2-D box scan() then prunes files on either column. Pruning
    # may only skip work — the oracle is the plain filtered snapshot, so
    # an over-eager skip surfaces as missing rows
    def zorder_scan(spark, sf):
        import tempfile

        from diffsync_spark.sinks.table import SnapshotTable

        tmp = tempfile.mkdtemp(prefix="zorder_scan_")
        snap = _src(spark, sf)
        table = SnapshotTable.create(
            spark, f"{tmp}/tbl", EVENT_MODEL, schema=snap.schema, n_buckets=8
        )
        table.merge(
            snap.withColumn("op", F.lit("insert")), mode="force",
            checkpoint_id="boot", batch_id=0,
        )
        table.compact(zorder=["event_id", "val"], zorder_files_per_bucket=4)
        return table.scan(
            [("event_id", ">=", 100), ("val", "<", 0.5)]
        ).select(
            "user_id", "event_id", "event_type",
            F.round("val", 6).alias("val"),
            F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
        )

    q["zorder_scan"] = zorder_scan

    # --- the diffsync_table Python DataSource: reading the merged state
    # back through spark.read.format(...) must equal the patch algebra —
    # this certifies the EXECUTOR-SIDE pandas LWW fold (a from-scratch
    # second implementation of the fold rule) against the DuckDB oracle,
    # on a merge-on-read table with live delta layers
    def datasource_read(spark, sf):
        import tempfile

        from diffsync_spark.sinks.table import SnapshotTable
        from diffsync_spark.sources.datasource import register

        register(spark)
        tmp = tempfile.mkdtemp(prefix="datasource_read_")
        snap = _src(spark, sf)
        table = SnapshotTable.create(
            spark, f"{tmp}/tbl", EVENT_MODEL, schema=snap.schema,
            n_buckets=8, write_mode="mor",
        )
        table.merge(
            snap.withColumn("op", F.lit("insert")), mode="force",
            checkpoint_id="boot", batch_id=0,
        )
        for i, part in enumerate([0, 1, 2]):
            table.merge(
                _changelog(spark, sf).filter(F.col("seq") % 3 == part),
                checkpoint_id="chg", batch_id=1 + i,
            )
        assert table._manifest().get("deltas"), "fold path must engage"
        return (
            spark.read.format("diffsync_table")
            .option("path", f"{tmp}/tbl").load()
            .select(
                "user_id", "event_id", "event_type",
                F.round("val", 6).alias("val"),
                F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
            )
        )

    q["datasource_read_state"] = datasource_read

    # --- the WHOLE north-star path composed in one gate: raw Debezium
    # envelope JSON → from_debezium decode → LWW MERGE into the durable
    # table → final state read-back. Each stage is individually gated
    # (debezium_decode, merge_state); this proves they compose — the
    # decoded frame's schema/ms-clock/op verbs are exactly what the MERGE
    # contract consumes. Oracle = the decode twin spliced into the patch
    # algebra as its changelog CTE.
    def pipeline_cdc(spark, sf):
        import tempfile

        from pyspark.sql import types as T

        from diffsync_spark.sinks.table import SnapshotTable
        from diffsync_spark.sources.cdc_formats import from_debezium

        tmp = tempfile.mkdtemp(prefix="pipeline_cdc_")
        snap = _src(spark, sf)
        table = SnapshotTable.create(
            spark, f"{tmp}/tbl", EVENT_MODEL, schema=snap.schema, n_buckets=8
        )
        table.merge(
            snap.withColumn("op", F.lit("insert")), mode="force",
            checkpoint_id="boot", batch_id=0,
        )
        chg = _changelog(spark, sf)
        img = F.struct(
            "user_id", "event_id", "event_type",
            F.round("val", 4).alias("val"),
        )
        raw = chg.select(
            F.to_json(
                F.struct(
                    F.when(F.col("op") == "delete", img).alias("before"),
                    F.when(F.col("op") != "delete", img).alias("after"),
                    F.when(F.col("op") == "delete", "d")
                    .otherwise("u")
                    .alias("op"),
                    F.unix_millis(F.col("ts").cast("timestamp")).alias("ts_ms"),
                    F.struct(
                        F.col("seq").alias("lsn"),
                        F.lit("events").alias("table"),
                    ).alias("source"),
                )
            ).alias("value")
        )
        row_schema = T.StructType(
            [
                T.StructField("user_id", T.LongType()),
                T.StructField("event_id", T.LongType()),
                T.StructField("event_type", T.StringType()),
                T.StructField("val", T.DoubleType()),
            ]
        )
        decoded = from_debezium(raw, EVENT_MODEL, row_schema).withColumn(
            "ts", F.col("ts").cast(snap.schema["ts"].dataType)
        )
        table.merge(decoded, checkpoint_id="cdc", batch_id=1)
        return table.read().select(
            "user_id", "event_id", "event_type",
            F.round("val", 6).alias("val"),
            F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
        )

    q["pipeline_cdc_ingest"] = pipeline_cdc

    # --- the full Spark-NATIVE streaming path, composed: changelog → LWW
    # MERGE into a merge-on-read table → Structured Streaming tail via the
    # diffsync_table DataSource (real readStream/writeStream with a
    # checkpoint, availableNow) → downstream LWW apply. The downstream
    # state must equal the same patch algebra as a direct merge — this
    # certifies offsets, the layer tail, the _seq tiebreak riding the
    # feed, and the apply, end to end
    def pipeline_stream_ds(spark, sf):
        import tempfile

        from diffsync_spark.sinks.table import SnapshotTable
        from diffsync_spark.sources.datasource import register

        register(spark)
        tmp = tempfile.mkdtemp(prefix="pipeline_stream_ds_")
        snap = _src(spark, sf)
        up = SnapshotTable.create(
            spark, f"{tmp}/up", EVENT_MODEL, schema=snap.schema,
            n_buckets=8, write_mode="mor",
        )
        up.merge(
            snap.withColumn("op", F.lit("insert")), mode="force",
            checkpoint_id="boot", batch_id=0,
        )
        v_boot = up.current_version()
        up.merge(_changelog(spark, sf), checkpoint_id="chg", batch_id=1)

        stream = (
            spark.readStream.format("diffsync_table")
            .option("path", f"{tmp}/up").option("feed", "changes")
            .option("startingVersion", v_boot).load()
        )
        qr = (
            stream.writeStream.format("parquet")
            .option("path", f"{tmp}/events")
            .trigger(availableNow=True)
            .option("checkpointLocation", f"{tmp}/ckpt").start()
        )
        qr.awaitTermination(300)

        down = SnapshotTable.create(
            spark, f"{tmp}/down", EVENT_MODEL, schema=snap.schema, n_buckets=8
        )
        down.merge(
            up.read(v_boot).withColumn("op", F.lit("insert")), mode="force",
            checkpoint_id="boot", batch_id=0,
        )
        ev = spark.read.parquet(f"{tmp}/events")
        batch = (
            ev.withColumn(
                "op",
                F.when(F.col("_change_type") == "delete", F.lit("delete"))
                .otherwise(F.lit("upsert")),
            )
            .withColumnRenamed("_seq", "seq")
            .drop("_change_type", "_commit_version")
        )
        down.merge(batch, checkpoint_id="stream", batch_id=0)
        return down.read().select(
            "user_id", "event_id", "event_type",
            F.round("val", 6).alias("val"),
            F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
        )

    q["pipeline_stream_datasource"] = pipeline_stream_ds

    # --- metadata-only row counts (Iceberg snapshot-summary parity): live
    # counts ride each merge's write job as observed metrics, so count()
    # is a manifest sum — no scan. Gated at BOTH versions: the boot count
    # (time travel) and the post-merge count (touched buckets re-observed,
    # untouched buckets carried forward copy-on-write)
    def table_stats(spark, sf):
        import tempfile

        from diffsync_spark.sinks.table import SnapshotTable

        tmp = tempfile.mkdtemp(prefix="table_stats_")
        snap = _src(spark, sf)
        table = SnapshotTable.create(
            spark, f"{tmp}/tbl", EVENT_MODEL, schema=snap.schema, n_buckets=8
        )
        table.merge(
            snap.withColumn("op", F.lit("insert")), mode="force",
            checkpoint_id="boot", batch_id=0,
        )
        v_boot = table._manifest()["version"]
        table.merge(_changelog(spark, sf), checkpoint_id="chg", batch_id=1)
        return spark.createDataFrame(
            [(table.count_rows(v_boot), table.count_rows())],
            "n_boot bigint, n_live bigint",
        )

    q["table_stats"] = table_stats

    # --- add-column schema evolution THROUGH the merge (the north rule's
    # "new tool fields" case): the changelog batch carries a column the
    # table has never seen; the merge widens the stored schema, old files
    # read through it as NULLs, and only LWW-winning rows carry the value
    def merge_evolved(spark, sf):
        import tempfile

        from diffsync_spark.sinks.table import SnapshotTable

        tmp = tempfile.mkdtemp(prefix="merge_evolved_")
        snap = _src(spark, sf)
        table = SnapshotTable.create(
            spark, f"{tmp}/tbl", EVENT_MODEL, schema=snap.schema, n_buckets=8
        )
        table.merge(
            snap.withColumn("op", F.lit("insert")), mode="force",
            checkpoint_id="boot", batch_id=0,
        )
        chg = _changelog(spark, sf).withColumn(
            "tag",
            F.concat(F.lit("t"), (F.col("event_id") % 5).cast("string")),
        )
        table.merge(chg, checkpoint_id="chg", batch_id=1)
        return table.read().select(
            "user_id", "event_id", "event_type",
            F.round("val", 6).alias("val"),
            F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
            "tag",
        )

    q["merge_evolved_state"] = merge_evolved

    # --- incremental CDC read of the sink itself: changes(v_boot, v_now)
    # must equal the SQL diff between the patched state and the snapshot —
    # this gates the manifest-pruned delta path, not just the final state
    def table_changes(spark, sf):
        import tempfile

        from diffsync_spark.sinks.table import SnapshotTable

        tmp = tempfile.mkdtemp(prefix="table_changes_")
        snap = _src(spark, sf)
        table = SnapshotTable.create(
            spark, f"{tmp}/tbl", EVENT_MODEL, schema=snap.schema, n_buckets=8
        )
        table.merge(
            snap.withColumn("op", F.lit("insert")), mode="force",
            checkpoint_id="boot", batch_id=0,
        )
        v1 = table.current_version()
        table.merge(_changelog(spark, sf), checkpoint_id="chg", batch_id=1)
        return table.changes(v1).select("user_id", "event_id", "op")

    q["table_changes"] = table_changes

    # --- Delta-CDF-shaped change feed: the same net changes flattened to
    # full row images (insert / delete / update_preimage / update_postimage)
    # — an update must emit BOTH images with the correct old/new payloads
    def change_feed_cdf(spark, sf):
        import tempfile

        from diffsync_spark.sinks.table import SnapshotTable

        tmp = tempfile.mkdtemp(prefix="change_feed_")
        snap = _src(spark, sf)
        table = SnapshotTable.create(
            spark, f"{tmp}/tbl", EVENT_MODEL, schema=snap.schema, n_buckets=8
        )
        table.merge(
            snap.withColumn("op", F.lit("insert")), mode="force",
            checkpoint_id="boot", batch_id=0,
        )
        v1 = table.current_version()
        table.merge(_changelog(spark, sf), checkpoint_id="chg", batch_id=1)
        return table.change_feed(v1).select(
            "user_id", "event_id", "event_type",
            F.round("val", 6).alias("val"), "_change_type",
        )

    q["change_feed_cdf"] = change_feed_cdf

    # --- two-table cascade: downstream tails upstream's snapshot chain via
    # pipe_changes (bootstrap hop + incremental delta hop). The oracle is
    # the SAME three-way LWW algebra as merge_state: after both hops the
    # downstream must equal the patched upstream state — certifying
    # changes() + apply_diff compose across tables, not just within one.
    def pipe_state(spark, sf):
        import tempfile

        from diffsync_spark.sinks.table import SnapshotTable
        from diffsync_spark.streaming.replay import pipe_changes

        tmp = tempfile.mkdtemp(prefix="pipe_state_")
        snap = _src(spark, sf)
        up = SnapshotTable.create(
            spark, f"{tmp}/up", EVENT_MODEL, schema=snap.schema, n_buckets=8
        )
        up.merge(
            snap.withColumn("op", F.lit("insert")), mode="force",
            checkpoint_id="boot", batch_id=0,
        )
        down = SnapshotTable.create(
            spark, f"{tmp}/down", EVENT_MODEL, schema=snap.schema, n_buckets=8
        )
        pipe_changes(up, down, checkpoint_id="pipe")   # hop 1: bootstrap
        up.merge(_changelog(spark, sf), checkpoint_id="chg", batch_id=1)
        pipe_changes(up, down, checkpoint_id="pipe")   # hop 2: delta
        return down.read().select(
            "user_id", "event_id", "event_type",
            F.round("val", 6).alias("val"),
            F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
        )

    q["pipe_state"] = pipe_state

    # --- the cascade's silver-layer transform hook: same two hops, but a
    # deterministic transform (derived val_x2 column) applied at bootstrap
    # AND at the delta hop — the oracle recomputes the derived column over
    # the same patched state, certifying the hook maintains it
    # incrementally through creates/updates/deletes.
    def pipe_silver(spark, sf):
        import tempfile

        from diffsync_spark.sinks.table import SnapshotTable
        from diffsync_spark.streaming.replay import pipe_changes

        def silver(batch):
            return batch.withColumn(
                "val_x2", F.round(F.col("val") * 2, 6)
            )

        tmp = tempfile.mkdtemp(prefix="pipe_silver_")
        snap = _src(spark, sf)
        up = SnapshotTable.create(
            spark, f"{tmp}/up", EVENT_MODEL, schema=snap.schema, n_buckets=8
        )
        up.merge(
            snap.withColumn("op", F.lit("insert")), mode="force",
            checkpoint_id="boot", batch_id=0,
        )
        down = SnapshotTable.create(
            spark, f"{tmp}/down", EVENT_MODEL, schema=snap.schema, n_buckets=8
        )
        pipe_changes(up, down, checkpoint_id="silver", transform=silver)
        up.merge(_changelog(spark, sf), checkpoint_id="chg", batch_id=1)
        pipe_changes(up, down, checkpoint_id="silver", transform=silver)
        return down.read().select(
            "user_id", "event_id", "event_type",
            F.round("val", 6).alias("val"),
            F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
            "val_x2",
        )

    q["pipe_silver_state"] = pipe_silver

    # --- two-table hierarchy sync end-to-end: parent (per-user bookkeeping)
    # + child (events) engines bootstrapped from the TARGET derivation, then
    # HierarchySync'd to the SOURCE derivation with natural deletion order +
    # cascade. The returned frame joins both final states (child rows with
    # the parent's n_events), so the oracle certifies parent counts, child
    # payloads, AND FK consistency after the ordered applies.
    def hierarchy_sync_state(spark, sf):
        import tempfile

        from diffsync_spark.engine import Engine
        from diffsync_spark.operators.hierarchy import HierarchySync

        parent_model = ModelSchema(
            name="user", identifiers=("user_id",), attributes=("n_events",),
        )
        tmp = tempfile.mkdtemp(prefix="hier_state_")
        child_src, child_dst = _src(spark, sf), _dst(spark, sf)
        p_of = lambda df: df.groupBy("user_id").agg(  # noqa: E731
            F.count("*").alias("n_events")
        )
        child = Engine.create(spark, f"{tmp}/child", EVENT_MODEL,
                              schema=child_dst.schema, n_buckets=8)
        child.table.merge(child_dst.withColumn("op", F.lit("insert")),
                          mode="force", checkpoint_id="boot", batch_id=0)
        parent = Engine.create(spark, f"{tmp}/parent", parent_model,
                               schema=p_of(child_dst).schema, n_buckets=8)
        parent.table.merge(p_of(child_dst).withColumn("op", F.lit("insert")),
                           mode="force", checkpoint_id="boot", batch_id=0)
        hs = HierarchySync(parent, child,
                           DiffFlags(natural_deletion_order=True))
        hs.sync_from(p_of(child_src), child_src, batch_id=1)
        return child.read().join(parent.read(), "user_id").select(
            "user_id", "event_id", "event_type",
            F.round("val", 6).alias("val"),
            F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
            "n_events",
        )

    q["hierarchy_sync_state"] = hierarchy_sync_state

    # --- multimodal decode (rows-only driver check: WAV/PPM parsing is not
    # SQL-expressible; pytest covers value-level correctness)
    def multimodal_decode(spark, sf):
        from diffsync_spark.functions.multimodal import decode_assets, fake_assets

        feats = decode_assets(fake_assets(spark, n=120), feat_dim=8)
        return feats.select(
            "asset_id", "kind", "n_bytes", "sha256", "width", "height",
            "duration_ms", "decode_ok",
        )

    q["multimodal_decode"] = multimodal_decode

    # --- PII/URL scrubbing over synthesized-dirty text (the fixture docs are
    # clean, so both sides append the same deterministic URL/email/phone tail
    # before scrubbing — the oracle certifies the regexp semantics match)
    q["scrub_text"] = lambda spark, sf: _docs(spark, sf).select(
        "doc_id",
        scrub_text(
            F.concat(
                F.coalesce(F.col("text"), F.lit("")),
                F.lit(" see https://ex.io/p?q=1 or mail "),
                F.concat(F.lit("u"), F.col("doc_id").cast("string"),
                         F.lit("@ex.io or call +1 415-555-01")),
                F.col("doc_id").cast("string"),
            )
        ).alias("clean"),
    )

    # --- watermarked windowed change-rate (ST3): same code path the stream
    # runs (withWatermark is a no-op on a batch frame, so the batch twin
    # certifies the aggregation semantics; the watermark behavior itself is
    # covered by tests/test_streaming.py::test_windowed_change_rate_watermark)
    def windowed_rate(spark, sf):
        from diffsync_spark.streaming.windowed import windowed_change_rate

        chg = _changelog(spark, sf).withColumn(
            "ts", F.col("ts").cast("timestamp")
        )
        agg = windowed_change_rate(
            chg, window="1 minute", watermark="2 minutes",
            ts_col="ts", key_cols=("user_id",),
        )
        return agg.select(
            "user_id",
            F.unix_micros(F.col("window_start").cast("timestamp")).alias("ws_us"),
            F.unix_micros(F.col("window_end").cast("timestamp")).alias("we_us"),
            "n_changes",
            "n_deletes",
        )

    q["windowed_change_rate"] = windowed_rate

    # --- DiffElement total ordering (O3): (type, name) rank over the diff,
    # reference DiffElement.__lt__ (diff.py:199-204); export-scale global sort
    def element_order(spark, sf):
        from diffsync_spark.operators.rollup import order_elements

        d = diff(_src(spark, sf), _dst(spark, sf), EVENT_MODEL)
        return order_elements(d, EVENT_MODEL).select(
            "user_id", "event_id", "op", "element_rank"
        )

    q["diff_element_order"] = element_order

    # --- deterministic sampling family (hash-derived membership, stable
    # under repartitioning; md5-hex compare makes the oracle bit-exact)
    def sample(spark, sf):
        from diffsync_spark.functions.sampling import hash_sample

        return hash_sample(
            _docs(spark, sf), 0.2, ["doc_id"], salt="r2"
        ).select("doc_id", "lang", "source")

    q["hash_sample"] = sample

    def strat(spark, sf):
        from diffsync_spark.functions.sampling import stratified_sample

        return stratified_sample(
            _docs(spark, sf), ["lang", "source"], 5, ["doc_id"], salt="r2"
        ).select("lang", "source", "doc_id")

    q["stratified_sample"] = strat

    def split(spark, sf):
        from diffsync_spark.functions.sampling import split_column

        return _docs(spark, sf).select(
            "doc_id",
            split_column(
                ["doc_id"], {"train": 0.8, "valid": 0.1, "test": 0.1},
                salt="r2",
            ),
        )

    q["train_split"] = split

    # --- gap-based sessionization of the event stream
    def sessions(spark, sf):
        from diffsync_spark.functions.sessions import sessionize

        e = _events(spark, sf).select(
            "user_id", "event_id", F.col("ts").cast("timestamp").alias("ts")
        )
        s = sessionize(
            e, ("user_id",), "ts", 600, tiebreak_cols=("event_id",)
        )
        return s.select(
            "user_id", "event_id",
            F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
            "is_session_start", "session_idx",
        )

    q["sessionize"] = sessions

    # --- Debezium envelope decode (binlog/WAL-tail ingest): both sides
    # synthesize the same logical envelopes from events, decode, and must
    # agree — certifying op mapping, before/after image selection, ts_ms
    # conversion, and the unknown-op→NULL (quarantine, never drop) contract
    def debezium(spark, sf):
        from pyspark.sql import types as T

        from diffsync_spark.sources.cdc_formats import from_debezium

        e = _events(spark, sf)
        opcode = (
            F.when(F.col("event_id") % 97 == 0, "x")  # unknown → NULL op
            .when(F.col("event_id") % 4 == 0, "c")
            .when(F.col("event_id") % 4 == 1, "u")
            .when(F.col("event_id") % 4 == 2, "d")
            .otherwise("r")
        )
        img = F.struct(
            "user_id", "event_id", "event_type",
            F.round("value", 4).alias("val"),
        )
        raw = e.select(
            F.to_json(
                F.struct(
                    F.when(opcode == "d", img).alias("before"),
                    F.when(opcode != "d", img).alias("after"),
                    opcode.alias("op"),
                    F.unix_millis(F.col("ts").cast("timestamp")).alias("ts_ms"),
                    F.struct(
                        F.col("event_id").alias("lsn"),
                        F.lit("events").alias("table"),
                    ).alias("source"),
                )
            ).alias("value")
        )
        row_schema = T.StructType(
            [
                T.StructField("user_id", T.LongType()),
                T.StructField("event_id", T.LongType()),
                T.StructField("event_type", T.StringType()),
                T.StructField("val", T.DoubleType()),
            ]
        )
        chg = from_debezium(raw, EVENT_MODEL, row_schema)
        return chg.select(
            "seq", "op", "user_id", "event_id", "event_type",
            F.round("val", 4).alias("val"),
            F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
        )

    q["debezium_decode"] = debezium

    # --- Kafka transport decode: the same Debezium envelopes wrapped in
    # the Kafka source contract (binary value, partition, offset); the LWW
    # tiebreak becomes the per-partition offset — the order a keyed CDC
    # topic actually guarantees
    def kafka(spark, sf):
        from pyspark.sql import Window
        from pyspark.sql import types as T

        from diffsync_spark.sources.cdc_formats import from_kafka

        e = _events(spark, sf)
        opcode = (
            F.when(F.col("event_id") % 97 == 0, "x")  # unknown → NULL op
            .when(F.col("event_id") % 4 == 0, "c")
            .when(F.col("event_id") % 4 == 1, "u")
            .when(F.col("event_id") % 4 == 2, "d")
            .otherwise("r")
        )
        img = F.struct(
            "user_id", "event_id", "event_type",
            F.round("value", 4).alias("val"),
        )
        env = F.to_json(
            F.struct(
                F.when(opcode == "d", img).alias("before"),
                F.when(opcode != "d", img).alias("after"),
                opcode.alias("op"),
                F.unix_millis(F.col("ts").cast("timestamp")).alias("ts_ms"),
                F.struct(
                    F.col("event_id").alias("lsn"),
                    F.lit("events").alias("table"),
                ).alias("source"),
            )
        )
        part = (F.col("event_id") % 4).cast("int")
        w = Window.partitionBy(part).orderBy("event_id")
        raw = e.select(
            F.encode(env, "UTF-8").alias("value"),
            part.alias("partition"),
            F.row_number().over(w).cast("long").alias("offset"),
        )
        row_schema = T.StructType(
            [
                T.StructField("user_id", T.LongType()),
                T.StructField("event_id", T.LongType()),
                T.StructField("event_type", T.StringType()),
                T.StructField("val", T.DoubleType()),
            ]
        )
        chg = from_kafka(raw, EVENT_MODEL, row_schema, envelope="debezium",
                         seq_source="offset")
        return chg.select(
            "seq", "op", "user_id", "event_id", "event_type",
            F.round("val", 4).alias("val"),
            F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
        )

    q["kafka_decode"] = kafka

    # --- ordered sequence assembly (conversation → ordered turn payloads);
    # the array is flattened to a separator join for engine-portable compare
    def assemble(spark, sf):
        from diffsync_spark.functions.assemble import assemble_sequences

        e = _events(spark, sf).select(
            "user_id", "event_id", "event_type",
            F.col("ts").cast("timestamp").alias("ts"),
        )
        a = assemble_sequences(
            e, ("user_id",), ("ts", "event_id"), "event_type"
        )
        return a.select(
            "user_id",
            F.array_join("items", "|").alias("seq_sig"),
            "n_total",
        )

    q["assemble_sequences"] = assemble

    # --- deterministic overlapping text chunking
    def chunks(spark, sf):
        from diffsync_spark.functions.assemble import chunk_text

        c = chunk_text(_docs(spark, sf), "text", chunk_chars=120, overlap=20)
        return c.select(
            "doc_id",
            F.col("chunk_idx").cast("bigint").alias("chunk_idx"),
            "chunk",
            F.col("n_chunks").cast("bigint").alias("n_chunks"),
        )

    q["chunk_text"] = chunks

    # --- benchmark decontamination: blocklist = every 23rd doc as a fake
    # eval set; exact tier (128-bit content key) + n-gram-overlap tier
    def decontam(spark, sf):
        from diffsync_spark.functions.decontaminate import (
            flag_exact,
            flag_ngram_overlap,
        )

        docs = _docs(spark, sf)
        block = docs.filter(F.col("doc_id") % 23 == 0)
        e = flag_exact(docs, block).select("doc_id", "contaminated_exact")
        g = flag_ngram_overlap(docs, block, min_hits=2).select(
            "doc_id", "n_block_shingles", "n_shingles",
            F.round("block_shingle_ratio", 4).alias("ratio"),
            "contaminated_ngram",
        )
        return e.join(g, "doc_id")

    q["decontaminate"] = decontam

    # --- Maxwell envelope decode (same contract as debezium_decode; flat
    # data image, word verbs, second-resolution ts, xid as seq)
    def maxwell(spark, sf):
        from pyspark.sql import types as T

        from diffsync_spark.sources.cdc_formats import from_maxwell

        e = _events(spark, sf)
        verb = (
            F.when(F.col("event_id") % 89 == 0, "table-create")  # DDL → NULL
            .when(F.col("event_id") % 3 == 0, "insert")
            .when(F.col("event_id") % 3 == 1, "update")
            .otherwise("delete")
        )
        img = F.struct(
            "user_id", "event_id", "event_type",
            F.round("value", 4).alias("val"),
        )
        raw = e.select(
            F.to_json(
                F.struct(
                    F.lit("app").alias("database"),
                    F.lit("events").alias("table"),
                    verb.alias("type"),
                    F.unix_seconds(F.col("ts").cast("timestamp")).alias("ts"),
                    F.col("event_id").alias("xid"),
                    img.alias("data"),
                )
            ).alias("value")
        )
        row_schema = T.StructType(
            [
                T.StructField("user_id", T.LongType()),
                T.StructField("event_id", T.LongType()),
                T.StructField("event_type", T.StringType()),
                T.StructField("val", T.DoubleType()),
            ]
        )
        chg = from_maxwell(raw, EVENT_MODEL, row_schema)
        return chg.select(
            "seq", "op", "user_id", "event_id", "event_type",
            F.round("val", 4).alias("val"),
            F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
        )

    q["maxwell_decode"] = maxwell

    # --- Canal envelope decode (the ARRAY-batched format: one envelope
    # carries several row images → from_json + posexplode; envelope-level
    # verb, batch id × position as seq, binlog-event ms as ts). Envelopes
    # are synthesized by grouping events (~4 rows each) so the explode is
    # genuinely exercised; every 41st group is a DDL envelope (NULL data,
    # isDdl) → one NULL-op row, kept (quarantine contract).
    def canal(spark, sf):
        from pyspark.sql import types as T

        from diffsync_spark.sources.cdc_formats import from_canal

        e = _events(spark, sf).withColumn(
            "g", F.pmod(F.col("event_id"), F.lit(2500))
        )
        img = F.struct(
            "user_id", "event_id", "event_type",
            F.round("value", 4).alias("val"),
        )
        grouped = e.groupBy("g").agg(
            F.array_sort(
                F.collect_list(
                    F.struct(F.col("event_id").alias("k"), img.alias("img"))
                )
            ).alias("packed"),
            F.unix_millis(F.min(F.col("ts").cast("timestamp"))).alias("es"),
        )
        is_ddl = F.pmod(F.col("g"), F.lit(41)) == 0
        verb = (
            F.when(is_ddl, "CREATE")
            .when(F.pmod(F.col("g"), F.lit(3)) == 0, "INSERT")
            .when(F.pmod(F.col("g"), F.lit(3)) == 1, "UPDATE")
            .otherwise("DELETE")
        )
        data = F.when(
            ~is_ddl, F.transform("packed", lambda x: x["img"])
        )
        raw = grouped.select(
            F.to_json(
                F.struct(
                    data.alias("data"),
                    verb.alias("type"),
                    F.col("es").alias("es"),
                    F.col("g").alias("id"),
                    is_ddl.alias("isDdl"),
                )
            ).alias("value")
        )
        row_schema = T.StructType(
            [
                T.StructField("user_id", T.LongType()),
                T.StructField("event_id", T.LongType()),
                T.StructField("event_type", T.StringType()),
                T.StructField("val", T.DoubleType()),
            ]
        )
        chg = from_canal(raw, EVENT_MODEL, row_schema)
        return chg.select(
            "seq", "op", "user_id", "event_id", "event_type",
            F.round("val", 4).alias("val"),
            F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
        )

    q["canal_decode"] = canal

    # --- wal2json (format v2) envelope decode: the Postgres WAL-tail JSON
    # (name/value column arrays, identity image on deletes, textual X/Y
    # LSN, B/C transaction markers filtered, T truncate → NULL-op
    # quarantine row, corrupt JSON kept as an all-NULL row). Envelopes are
    # synthesized per event; every 101st is corrupt, every 89th a
    # truncate, every 97th a begin marker (dropped by the decoder).
    def wal2json(spark, sf):
        from pyspark.sql import types as T

        from diffsync_spark.sources.cdc_formats import from_wal2json

        e = _events(spark, sf)
        eid = F.col("event_id")

        def entry(name, col):
            return F.struct(
                F.lit(name).alias("name"), col.cast("string").alias("value")
            )

        img = F.array(
            entry("user_id", F.col("user_id")),
            entry("event_id", eid),
            entry("event_type", F.col("event_type")),
            entry("val", F.round("value", 4)),
        )
        action = (
            F.when(eid % 89 == 0, "T")
            .when(eid % 97 == 0, "B")
            .when(eid % 3 == 0, "I")
            .when(eid % 3 == 1, "U")
            .otherwise("D")
        )
        envelope = F.to_json(
            F.struct(
                action.alias("action"),
                F.lit("public").alias("schema"),
                F.lit("events").alias("table"),
                F.when(action.isin("I", "U"), img).alias("columns"),
                F.when(action == "D", img).alias("identity"),
                F.concat(
                    F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS"),
                    F.lit("+00"),
                ).alias("timestamp"),
                F.concat(
                    F.hex(eid % 7 + 1), F.lit("/"), F.hex(eid)
                ).alias("lsn"),
            )
        )
        raw = e.select(
            F.when(eid % 101 == 0, "corrupt {").otherwise(envelope).alias(
                "value"
            )
        )
        row_schema = T.StructType(
            [
                T.StructField("user_id", T.LongType()),
                T.StructField("event_id", T.LongType()),
                T.StructField("event_type", T.StringType()),
                T.StructField("val", T.DoubleType()),
            ]
        )
        chg = from_wal2json(raw, EVENT_MODEL, row_schema)
        return chg.select(
            "seq", "op", "user_id", "event_id", "event_type",
            F.round("val", 4).alias("val"),
            F.unix_micros(F.col("ts")).alias("ts_us"),
        )

    q["wal2json_decode"] = wal2json

    # --- per-stratum quality filtering (exact percent_rank path)
    def topfrac(spark, sf):
        from diffsync_spark.functions.sampling import filter_top_fraction

        return filter_top_fraction(
            _docs(spark, sf), "n_chars", 0.3, ["lang"],
            tiebreak_cols=("doc_id",),
        ).select("doc_id", "lang")

    q["filter_top_fraction"] = topfrac

    # --- the approx_percentile path (the 100 TB variant: per-stratum
    # threshold broadcast, no per-stratum sort), gated on its CONTRACT: the
    # sketch threshold must sit within `slack` ranks of the exact quantile
    # (slack = max(2, n/accuracy)), tie-robustly. kept = {score >= thr}, so
    # with thr's ascending rank within ±slack of 0.7n:
    #   n_kept - ties_at_min == count{score > thr} <= ceil(0.3n) + slack
    #   n_kept >= count{score > thr}              >= floor(0.3n) - slack
    # The verdict frame (stratum, exact n_total, ok) is engine-independent,
    # so the DuckDB twin pins n_total and expects ok = TRUE everywhere — a
    # sketch/threshold regression breaks the value hash.
    def topfrac_approx(spark, sf):
        from diffsync_spark.functions.sampling import filter_top_fraction

        docs = _docs(spark, sf).select("doc_id", "lang", "n_chars")
        kept = filter_top_fraction(docs, "n_chars", 0.3, ["lang"], exact=False)
        per = kept.groupBy("lang").agg(
            F.count("*").alias("n_kept"), F.min("n_chars").alias("min_kept")
        )
        tot = docs.groupBy("lang").agg(F.count("*").alias("n_total"))
        ties = (
            docs.join(per.select("lang", "min_kept"), "lang")
            .filter(F.col("n_chars") == F.col("min_kept"))
            .groupBy("lang")
            .agg(F.count("*").alias("n_ties"))
        )
        j = tot.join(per, "lang").join(ties, "lang")
        slack = F.greatest(F.lit(2), F.ceil(F.col("n_total") / F.lit(10_000)))
        ok = (
            (F.col("n_kept") - F.col("n_ties")
             <= F.ceil(F.col("n_total") * 0.3) + slack)
            & (F.col("n_kept") >= F.floor(F.col("n_total") * 0.3) - slack)
        )
        return j.select("lang", "n_total", ok.alias("ok"))

    q["filter_top_fraction_approx"] = topfrac_approx

    # --- token-budget sequence packing (greedy next-fit per bucket; the
    # one Arrow/applyInPandas assembly op — the scan's reset is a
    # non-associative prefix op no window function expresses)
    def pack(spark, sf):
        from diffsync_spark.functions.assemble import pack_sequences

        d = _docs(spark, sf).select(
            "doc_id", "n_chars", (F.col("doc_id") % 8).alias("bkt")
        )
        p = pack_sequences(d, "n_chars", 2000, "bkt", ("doc_id",))
        return p.select(
            "bkt", "doc_id", F.col("n_chars").alias("sz"),
            "pack_id", "pack_fill",
        )

    q["pack_sequences"] = pack

    # --- the COMPOSED pipeline gate: corpus → exact_dedup →
    # dedup_near_duplicates → decontaminate → filter_top_fraction →
    # pack_sequences as ONE chain. Each stage is individually gated above;
    # this entry proves they COMPOSE (column contracts, survivor sets and
    # ordering flowing stage to stage), against a DuckDB twin of the whole
    # chain built from the same per-stage twins.
    def pipeline(spark, sf):
        from diffsync_spark.functions.assemble import pack_sequences
        from diffsync_spark.functions.decontaminate import flag_exact
        from diffsync_spark.functions.dedup import (
            dedup_near_duplicates,
            exact_dedup,
        )
        from diffsync_spark.functions.sampling import filter_top_fraction

        docs = _docs(spark, sf)
        d1 = exact_dedup(docs)
        pairs = minhash_lsh_pairs(d1, threshold=0.7)
        d2 = dedup_near_duplicates(d1, pairs)
        block = docs.filter(F.col("doc_id") % 23 == 0)
        d3 = (flag_exact(d2, block)
              .filter(~F.col("contaminated_exact"))
              .drop("contaminated_exact"))
        d4 = filter_top_fraction(d3, "n_chars", 0.5, ["lang"],
                                 tiebreak_cols=("doc_id",))
        p = pack_sequences(d4.select("doc_id", "lang", "n_chars"),
                           "n_chars", 2000, "lang", ("doc_id",))
        return p.select(
            F.col("lang").alias("bkt"), "doc_id",
            F.col("n_chars").cast("long").alias("sz"),
            "pack_id", "pack_fill",
        )

    q["pipeline_dedup_pack"] = pipeline

    # --- session-window agg (ST): F.session_window on a batch frame must
    # equal grouping the row-level sessionize labels — the stream op and
    # the batch op cross-validate each other
    def session_stats(spark, sf):
        from diffsync_spark.streaming.windowed import session_change_stats

        chg = _changelog(spark, sf).withColumn(
            "ts", F.col("ts").cast("timestamp")
        )
        agg = session_change_stats(
            chg, gap="10 minutes", watermark="1 hour", key_cols=("user_id",)
        )
        return agg.select(
            "user_id",
            F.unix_micros(F.col("session_start").cast("timestamp")).alias("ss_us"),
            F.unix_micros(F.col("session_end").cast("timestamp")).alias("se_us"),
            "n_changes",
            "n_deletes",
        )

    q["session_change_stats"] = session_stats

    # --- one-pass dataset profiling (exact-distinct variant for the gate;
    # columns restricted to types whose string casts are engine-identical)
    def prof(spark, sf):
        from diffsync_spark.functions.profile import profile

        p = profile(
            _events(spark, sf).select(
                "event_id", "user_id", "event_type", "props"
            ),
            exact_distinct=True,
        )
        return p.select(
            "column", "n_rows", "n_nulls",
            F.round("null_frac", 6).alias("null_frac"),
            "n_distinct", "min_str", "max_str",
            F.round("avg_len", 6).alias("avg_len"),
        )

    q["profile"] = prof

    # --- fractional dataset repetition (training-mix epochs)
    def repeat(spark, sf):
        from diffsync_spark.functions.sampling import repeat_dataset

        return repeat_dataset(
            _docs(spark, sf).select("doc_id", "lang"), 2.3, ["doc_id"],
            salt="mix",
        ).select("doc_id", "lang", "copy_idx")

    q["repeat_dataset"] = repeat

    # --- weighted multi-corpus training mix (per-source epochs in one
    # Generate pass; md5-slice fractional membership, engine-portable)
    def mix(spark, sf):
        from diffsync_spark.functions.sampling import mix_weighted

        return mix_weighted(
            _docs(spark, sf).select("doc_id", "source", "lang"),
            "source",
            {"src0": 2.3, "src1": 1.0, "src2": 0.4, "src3": 0.0},
            ["doc_id"], salt="mixgate", default_weight=0.5,
        ).select("doc_id", "source", "lang", "copy_idx")

    q["mix_weighted"] = mix

    # --- corpus-wide line-level boilerplate removal (RefinedWeb/CCNet
    # pass). The fixture docs are single-line, so both sides append the
    # same deterministic footer (shared across all docs → dropped) and a
    # per-doc unique line (kept) before the pass.
    def boiler(spark, sf):
        from diffsync_spark.functions.text import remove_boilerplate_lines

        docs = _docs(spark, sf).select(
            "doc_id",
            F.concat(
                F.coalesce("text", F.lit("")),
                F.lit("\ncookie consent banner text"),
                F.lit("\nunique line "), F.col("doc_id").cast("string"),
            ).alias("text"),
        )
        out = remove_boilerplate_lines(docs, max_docs=25)
        return out.select("doc_id", "clean_text", "n_lines", "n_dropped")

    q["boilerplate_lines"] = boiler

    # --- exact substring dedup (Lee et al. repeated-span pass): both sides
    # append the same 12-token snippet to every third doc, so corpus-wide
    # repeated spans >= 8 tokens provably exist; natural fixture repeats
    # are detected identically by both engines
    def substr(spark, sf):
        from diffsync_spark.functions.dedup import substring_spans

        docs = _docs(spark, sf).select(
            "doc_id",
            F.when(
                F.col("doc_id") % 3 == 0,
                F.concat(
                    F.coalesce("text", F.lit("")),
                    F.lit(" the exact shared snippet that repeats verbatim "
                          "across one third of all documents"),
                ),
            ).otherwise(F.coalesce("text", F.lit(""))).alias("text"),
        )
        return substring_spans(docs, min_tokens=8, hash_mode="md5")

    q["substring_dedup"] = substr

    # --- REAL-BPE token counting against a merges table (so pack/assemble
    # budgets match an actual tokenizer): merges trained once at import
    # from a fixed literal corpus (_BPE_MERGES — deterministic, shared with
    # the twin); the oracle replays the merge fixpoint as a recursive CTE
    def bpe_count(spark, sf):
        from diffsync_spark.functions.text import bpe_token_count

        return bpe_token_count(
            _docs(spark, sf).select("doc_id", "text"), _BPE_MERGES
        ).select("doc_id", "n_bpe_tokens")

    q["bpe_token_count"] = bpe_count

    # --- the CDC envelope matrix: all four wire formats plus the Kafka
    # transport decoded in ONE frame (tagged by fmt) — one driver row
    # certifies every decoder's op mapping, image selection, seq and ts
    # semantics side by side
    def cdc_matrix(spark, sf):
        parts = [
            ("debezium", debezium), ("maxwell", maxwell), ("canal", canal),
            ("wal2json", wal2json), ("kafka", kafka),
        ]
        out = None
        for fmt, fn in parts:
            p = fn(spark, sf).select(F.lit(fmt).alias("fmt"), "*")
            out = p if out is None else out.unionByName(p)
        return out

    q["cdc_decode_matrix"] = cdc_matrix

    # The driver runs the FIRST 50 registry entries in order, so front-load
    # the gates that have never received a driver row (plus this round's
    # new gates and the entries last sampled in round 3); entries pushed
    # past 50 all have green driver rows from round 4.
    front = [k for k in _DRIVER_FIRST if k in q]
    q = {k: q[k] for k in front} | {k: v for k, v in q.items()
                                    if k not in front}
    return q


# Gates the driver has not yet certified, first; see queries().
_DRIVER_FIRST = [
    # never driver-sampled through round 4
    "wal2json_decode",
    "kafka_decode",
    "mix_weighted",
    "boilerplate_lines",
    "pipeline_dedup_pack",
    # new in round 5
    "cdc_decode_matrix",
    "substring_dedup",
    "bpe_token_count",
    "stats_pruned_lookup",
    "change_feed_cdf",
    "zorder_scan",
    "datasource_read_state",
    "quantized_cosine_topk",
    "pipeline_stream_datasource",
    # last driver-sampled in round 3
    "debezium_decode",
    "maxwell_decode",
    "canal_decode",
    "assemble_sequences",
    "chunk_text",
    "decontaminate",
    "filter_top_fraction",
    "filter_top_fraction_approx",
    "pack_sequences",
    "session_change_stats",
    "profile",
    "repeat_dataset",
    # the sink's state gates: every one rides table.py, which round 5
    # touched heavily (CDF, scan pruning, zorder, blooms, model manifest,
    # fsck) — they need FRESH driver rows more than the untouched r3/r4
    # text/dedup/sampling ops that rotate out of the 50-sample window
    "merge_state",
    "mor_merge_state",
    "wap_publish_state",
    "merge_expectations_state",
    "rename_evolution_state",
    "rebucket_state",
    "pipe_state",
    "pipe_silver_state",
    "pipe_rollup_state",
    "bulk_lookup",
    "pipeline_cdc_ingest",
    "table_stats",
    "merge_evolved_state",
    "table_changes",
    "hierarchy_sync_state",
    # the diff/LWW core (cheap, and the exchange-sharing plan is the
    # engine's spine)
    "diff_classify",
    "diff_summary",
    "lww_dedup",
    "patch_snapshot",
    "point_lookup",
    "count_all",
    # similarity family heads (quantized + persisted-index paths changed)
    "cosine_topk",
    "lsh_cosine_topk",
    "ivf_cosine_topk",
]


def oracle_sql() -> dict[str, str]:
    o: dict[str, str] = {}
    o["diff_classify"] = _SQL_DIFF
    o["diff_summary"] = f"""
WITH d AS ({_SQL_DIFF})
SELECT CAST(coalesce(sum(CASE WHEN op = 'create' THEN 1 END), 0) AS BIGINT) AS n_create,
       CAST(coalesce(sum(CASE WHEN op = 'update' THEN 1 END), 0) AS BIGINT) AS n_update,
       CAST(coalesce(sum(CASE WHEN op = 'delete' THEN 1 END), 0) AS BIGINT) AS n_delete,
       CAST(coalesce(sum(CASE WHEN op = 'noop' THEN 1 END), 0) AS BIGINT) AS n_noop
FROM d"""
    o["diff_skip_unmatched_src"] = (
        f"WITH d AS ({_SQL_DIFF}) SELECT op, count(*) AS n FROM d "
        "WHERE op <> 'create' GROUP BY op"
    )
    o["diff_skip_unmatched_dst"] = (
        f"WITH d AS ({_SQL_DIFF}) SELECT op, count(*) AS n FROM d "
        "WHERE op <> 'delete' GROUP BY op"
    )
    o["lww_dedup"] = """
WITH e AS (
  SELECT user_id, event_id % 100 AS k, event_type, value AS val, ts,
         event_id AS seq,
         row_number() OVER (PARTITION BY user_id, event_id % 100
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events)
SELECT user_id, k, event_type, val, epoch_us(ts) AS ts_us, seq
FROM e WHERE rn = 1"""
    # shared LWW three-way prefix: changelog rn-dedup + ev_wins join — ONE
    # definition of the merge tiebreak semantics, consumed by the
    # patch/merge oracles AND the table_changes oracle below
    def _patch_prefix_for(chg_sql: str) -> str:
        return f"""
WITH snap AS ({_SQL_SRC}),
chg0 AS ({chg_sql}),
chg AS (
  SELECT * FROM (
    SELECT c.*, row_number() OVER (PARTITION BY user_id, event_id
                                   ORDER BY ts DESC, seq DESC) AS rn
    FROM chg0 c) WHERE rn = 1),
j AS (
  SELECT s.user_id AS s_uid, s.event_id AS s_eid, s.event_type AS s_et,
         s.val AS s_val, s.ts AS s_ts,
         c.user_id AS c_uid, c.event_id AS c_eid, c.event_type AS c_et,
         c.val AS c_val, c.ts AS c_ts, c.op AS c_op,
         (c.user_id IS NOT NULL AND (s.user_id IS NULL OR c.ts > s.ts
            OR c.ts IS NULL OR (c.ts = s.ts))) AS ev_wins
  FROM snap s FULL OUTER JOIN chg c
    ON s.user_id = c.user_id AND s.event_id = c.event_id)"""

    _patch_prefix = _patch_prefix_for(_SQL_CHG)
    _patch_core = _patch_prefix + """
SELECT coalesce(s_uid, c_uid) AS user_id,
       coalesce(s_eid, c_eid) AS event_id,
       CASE WHEN ev_wins THEN c_et ELSE s_et END AS event_type,
       round(CASE WHEN ev_wins THEN c_val ELSE s_val END, 6) AS val,
       epoch_us(CASE WHEN ev_wins THEN c_ts ELSE s_ts END) AS ts_us
FROM j WHERE NOT (ev_wins AND c_op = 'delete')"""
    o["patch_snapshot"] = _patch_core
    o["merge_state"] = _patch_core
    # merge-on-read is observationally identical to copy-on-write: the
    # delta-layer fold (table.py:_fold) must land the same final state the
    # sequential patch algebra computes
    o["mor_merge_state"] = _patch_core
    o["wap_publish_state"] = _patch_core
    # the external DataSource's executor-side pandas fold must land the
    # same final state (3 interleaved layer commits left unfolded)
    o["datasource_read_state"] = _patch_core
    # streamed-tail apply must land the identical patched state
    o["pipeline_stream_datasource"] = _patch_core
    # the pruned scan must be the plain filtered final state — file
    # skipping can only skip work, never rows
    o["stats_pruned_lookup"] = (
        f"SELECT * FROM ({_patch_core}) WHERE user_id = 7 AND event_id >= 100"
    )
    # Z-order rewrite is layout-only: the 2-D box scan over the clustered
    # table must equal the plain filtered snapshot
    o["zorder_scan"] = (
        f"SELECT user_id, event_id, event_type, round(val, 6) AS val, "
        f"epoch_us(ts) AS ts_us FROM ({_SQL_SRC}) "
        "WHERE event_id >= 100 AND val < 0.5"
    )
    # expectations: only contract-passing upserts (deletes exempt) reach
    # the same patch algebra
    _chg_expected = (
        f"SELECT * FROM ({_SQL_CHG}) WHERE lower(op) = 'delete' "
        "OR (event_id % 5 <> 0 AND event_type IS NOT NULL)"
    )
    # rename is metadata-only: same algebra, output column aliased
    o["rename_evolution_state"] = f"""
SELECT user_id, event_id, event_type, val AS metric, ts_us
FROM ({_patch_core})"""
    o["merge_expectations_state"] = _patch_prefix_for(_chg_expected) + """
SELECT coalesce(s_uid, c_uid) AS user_id,
       coalesce(s_eid, c_eid) AS event_id,
       CASE WHEN ev_wins THEN c_et ELSE s_et END AS event_type,
       round(CASE WHEN ev_wins THEN c_val ELSE s_val END, 6) AS val,
       epoch_us(CASE WHEN ev_wins THEN c_ts ELSE s_ts END) AS ts_us
FROM j WHERE NOT (ev_wins AND c_op = 'delete')"""
    # incremental aggregate view == from-scratch GROUP BY over the same
    # final state (round/max commute: round is monotone, so rounding the
    # max equals the max of the rounded values the twin's val carries)
    o["pipe_rollup_state"] = f"""
SELECT user_id, count(*) AS n_events,
       count(DISTINCT event_type) AS n_types,
       max(ts_us) AS max_ts_us, max(val) AS max_val
FROM ({_patch_core}) GROUP BY user_id"""
    # the physical layout (bucket count, pre/post-rebucket file sets) must
    # be invisible to the logical state
    o["rebucket_state"] = _patch_core
    # bulk probe = patched state restricted to the probed key stratum
    # (the negative-id probes never existed, so the filter alone is exact)
    o["bulk_lookup"] = f"SELECT * FROM ({_patch_core}) WHERE user_id % 7 = 3"
    # the cascade must land exactly the merge_state final state downstream
    o["pipe_state"] = _patch_core
    # composed north-star twin: the Debezium DECODE twin (same JSON
    # machinery as debezium_decode's oracle — ms clock truncation, round-4
    # image values, u/d verb mapping) becomes the patch algebra's changelog
    # CTE, so the oracle replays envelope→decode→LWW-merge end to end
    _dbz_chg_raw = f"""
SELECT to_json(struct_pack(
         before := CASE WHEN op = 'delete' THEN img END,
         "after" := CASE WHEN op <> 'delete' THEN img END,
         op := CASE WHEN op = 'delete' THEN 'd' ELSE 'u' END,
         ts_ms := epoch_ms(ts),
         source := struct_pack(lsn := seq, "table" := 'events')
       )) AS value
FROM (SELECT *, struct_pack(user_id := user_id, event_id := event_id,
                            event_type := event_type,
                            val := round(val, 4)) AS img
      FROM ({_SQL_CHG}))"""
    from diffsync_spark.sources.cdc_formats import debezium_sql

    o["pipeline_cdc_ingest"] = _patch_prefix_for(
        debezium_sql(
            [("user_id", "BIGINT"), ("event_id", "BIGINT"),
             ("event_type", "VARCHAR"), ("val", "DOUBLE")],
            _dbz_chg_raw,
        )
    ) + """
SELECT coalesce(s_uid, c_uid) AS user_id,
       coalesce(s_eid, c_eid) AS event_id,
       CASE WHEN ev_wins THEN c_et ELSE s_et END AS event_type,
       round(CASE WHEN ev_wins THEN c_val ELSE s_val END, 6) AS val,
       epoch_us(CASE WHEN ev_wins THEN c_ts ELSE s_ts END) AS ts_us
FROM j WHERE NOT (ev_wins AND c_op = 'delete')"""
    # transform hook: derived val_x2 recomputed from the RAW final value
    # (the transform sees unrounded batch values on both hops)
    o["pipe_silver_state"] = _patch_prefix + """
SELECT coalesce(s_uid, c_uid) AS user_id,
       coalesce(s_eid, c_eid) AS event_id,
       CASE WHEN ev_wins THEN c_et ELSE s_et END AS event_type,
       round(CASE WHEN ev_wins THEN c_val ELSE s_val END, 6) AS val,
       epoch_us(CASE WHEN ev_wins THEN c_ts ELSE s_ts END) AS ts_us,
       round(2 * (CASE WHEN ev_wins THEN c_val ELSE s_val END), 6) AS val_x2
FROM j WHERE NOT (ev_wins AND c_op = 'delete')"""
    # add-column evolution: winners carry the new column, snapshot-kept
    # rows read NULL through the widened schema (their files predate it)
    o["merge_evolved_state"] = _patch_prefix + """
SELECT coalesce(s_uid, c_uid) AS user_id,
       coalesce(s_eid, c_eid) AS event_id,
       CASE WHEN ev_wins THEN c_et ELSE s_et END AS event_type,
       round(CASE WHEN ev_wins THEN c_val ELSE s_val END, 6) AS val,
       epoch_us(CASE WHEN ev_wins THEN c_ts ELSE s_ts END) AS ts_us,
       CASE WHEN ev_wins THEN 't' || CAST(c_eid % 5 AS VARCHAR) END AS tag
FROM j WHERE NOT (ev_wins AND c_op = 'delete')"""
    # metadata-only counts: boot snapshot size + post-merge live size
    o["table_stats"] = f"""
SELECT (SELECT count(*) FROM ({_SQL_SRC})) AS n_boot,
       (SELECT count(*) FROM ({_patch_core})) AS n_live"""
    # raw (unrounded) values here: the Spark side compares exact doubles
    o["table_changes"] = _patch_prefix + """,
new_state AS (
  SELECT coalesce(s_uid, c_uid) AS user_id,
         coalesce(s_eid, c_eid) AS event_id,
         CASE WHEN ev_wins THEN c_et ELSE s_et END AS event_type,
         CASE WHEN ev_wins THEN c_val ELSE s_val END AS val
  FROM j WHERE NOT (ev_wins AND c_op = 'delete')),
classified AS (
  SELECT coalesce(n.user_id, o.user_id) AS user_id,
         coalesce(n.event_id, o.event_id) AS event_id,
         CASE WHEN o.event_id IS NULL THEN 'create'
              WHEN n.event_id IS NULL THEN 'delete'
              WHEN (n.event_type IS DISTINCT FROM o.event_type)
                OR (n.val IS DISTINCT FROM o.val) THEN 'update'
              ELSE 'noop' END AS op
  FROM new_state n FULL OUTER JOIN snap o
    ON n.user_id = o.user_id AND n.event_id = o.event_id)
SELECT user_id, event_id, op FROM classified WHERE op <> 'noop'"""
    # CDF flattening of the same classification: updates contribute BOTH a
    # preimage (old payload) and a postimage (new payload) row; raw values
    # compared, rounded only in the projection (like the Spark side)
    o["change_feed_cdf"] = _patch_prefix + """,
new_state AS (
  SELECT coalesce(s_uid, c_uid) AS user_id,
         coalesce(s_eid, c_eid) AS event_id,
         CASE WHEN ev_wins THEN c_et ELSE s_et END AS event_type,
         CASE WHEN ev_wins THEN c_val ELSE s_val END AS val
  FROM j WHERE NOT (ev_wins AND c_op = 'delete')),
classified AS (
  SELECT coalesce(n.user_id, o.user_id) AS user_id,
         coalesce(n.event_id, o.event_id) AS event_id,
         n.event_type AS n_et, n.val AS n_val,
         o.event_type AS o_et, o.val AS o_val,
         CASE WHEN o.event_id IS NULL THEN 'create'
              WHEN n.event_id IS NULL THEN 'delete'
              WHEN (n.event_type IS DISTINCT FROM o.event_type)
                OR (n.val IS DISTINCT FROM o.val) THEN 'update'
              ELSE 'noop' END AS op
  FROM new_state n FULL OUTER JOIN snap o
    ON n.user_id = o.user_id AND n.event_id = o.event_id)
SELECT user_id, event_id, n_et AS event_type, round(n_val, 6) AS val,
       'insert' AS _change_type FROM classified WHERE op = 'create'
UNION ALL
SELECT user_id, event_id, o_et, round(o_val, 6), 'delete'
FROM classified WHERE op = 'delete'
UNION ALL
SELECT user_id, event_id, o_et, round(o_val, 6), 'update_preimage'
FROM classified WHERE op = 'update'
UNION ALL
SELECT user_id, event_id, n_et, round(n_val, 6), 'update_postimage'
FROM classified WHERE op = 'update'"""
    o["rollup_parent"] = f"""
WITH d AS ({_SQL_DIFF}),
c AS (
  SELECT user_id,
         CAST(coalesce(sum(CASE WHEN op = 'create' THEN 1 END), 0) AS BIGINT) AS n_create,
         CAST(coalesce(sum(CASE WHEN op = 'update' THEN 1 END), 0) AS BIGINT) AS n_update,
         CAST(coalesce(sum(CASE WHEN op = 'delete' THEN 1 END), 0) AS BIGINT) AS n_delete,
         CAST(coalesce(sum(CASE WHEN op = 'noop' THEN 1 END), 0) AS BIGINT) AS n_noop
  FROM d GROUP BY user_id)
SELECT user_id,
       CASE WHEN n_create = n_create + n_update + n_delete + n_noop THEN 'create'
            WHEN n_delete = n_create + n_update + n_delete + n_noop THEN 'delete'
            WHEN n_create + n_update + n_delete > 0 THEN 'update'
            ELSE 'noop' END AS op,
       n_create, n_update, n_delete, n_noop
FROM c"""
    o["stable_order"] = """
SELECT user_id, event_id,
       row_number() OVER (PARTITION BY user_id ORDER BY event_id, ts)
         AS turn_rank
FROM events"""
    o["point_lookup"] = (
        "SELECT user_id, event_id, event_type, value AS val FROM events "
        "WHERE user_id = 7 AND event_id % 50 = 0"
    )
    o["count_all"] = (
        "SELECT count(*) AS n_rows, count(DISTINCT user_id) AS n_users FROM events"
    )
    o["uid_concat"] = (
        "SELECT CAST(user_id AS VARCHAR) || '__' || CAST(event_id AS VARCHAR) "
        "AS uid FROM events"
    )
    o["exact_dedup_groups"] = (
        f"SELECT min(doc_id) AS keep_id, count(*) AS n_dups FROM documents "
        f"GROUP BY {_norm_sql('text')}"
    )
    o["token_count"] = (
        f"SELECT doc_id, len({_SQL_TOKENS}) AS n_tokens FROM documents"
    )
    _sw = STOPWORDS["en"]
    o["quality_score"] = f"""
WITH t AS (
  SELECT doc_id,
         length(coalesce(text, '')) AS n_chars,
         len({_SQL_TOKENS}) AS n_tokens,
         len(regexp_extract_all(coalesce(text, ''), '[^\\w\\s]')) AS n_punct,
         len(list_filter(list_transform({_SQL_TOKENS}, x -> lower(x)),
             x -> list_contains({_sw!r}, x))) AS n_stop
  FROM documents)
SELECT doc_id, n_tokens,
       round(n_punct * 1.0 / greatest(n_chars, 1), 4) AS punct_ratio,
       round(n_stop * 1.0 / greatest(n_tokens, 1), 4) AS stopword_ratio,
       round(
         least(n_tokens / 64.0, 1.0) * 0.4
         + least(round(n_stop * 1.0 / greatest(n_tokens, 1), 4) * 4.0, 1.0) * 0.4
         + (1.0 - least(round(n_punct * 1.0 / greatest(n_chars, 1), 4) * 4.0, 1.0))
           * 0.2,
         4) AS quality_score
FROM t"""
    o["lang_id"] = f"SELECT doc_id, {_lang_sql()} AS lang_guess FROM documents"
    fp_expr = fingerprint_sql("coalesce(text, '')")
    o["fingerprint"] = f"SELECT doc_id, {fp_expr} AS fp FROM documents"
    # library cosine_col rounds to 6 and the rank is computed on that value;
    # the emitted cosine is re-rounded to 4 (matching the entry)
    o["cosine_topk"] = f"""
WITH q AS (SELECT vec_id AS query_id, embedding FROM embeddings WHERE vec_id < 3),
scored AS (
  SELECT b.query_id, a.vec_id, {_SQL_COSINE6} AS cosine
  FROM embeddings a CROSS JOIN q b),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY cosine DESC, vec_id ASC) AS rank
  FROM scored)
SELECT query_id, vec_id, round(cosine, 4) AS cosine, rank
FROM ranked WHERE rank <= 5"""
    # int8 quantization twin: scale = 127/max|x| computed FIRST, then
    # x * scale (matching Spark's operation order bit-for-bit — x*127/amax
    # associates differently in IEEE), round half-away-from-zero in both
    o["quantized_cosine_topk"] = f"""
WITH raw AS (
  SELECT vec_id, embedding,
         list_max(list_transform(embedding,
                                 x -> abs(CAST(x AS DOUBLE)))) AS amax
  FROM embeddings),
cq AS (
  SELECT vec_id,
         CASE WHEN amax > 0
              THEN list_transform(embedding,
                     x -> round(CAST(x AS DOUBLE) * (127.0 / amax)))
              ELSE list_transform(embedding, x -> 0.0) END AS embedding
  FROM raw),
q AS (SELECT vec_id AS query_id, embedding FROM cq WHERE vec_id < 3),
scored AS (
  SELECT b.query_id, a.vec_id, {_SQL_COSINE6} AS cosine
  FROM cq a CROSS JOIN q b),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY cosine DESC, vec_id ASC) AS rank
  FROM scored)
SELECT query_id, vec_id, round(cosine, 4) AS cosine, rank
FROM ranked WHERE rank <= 5"""
    o["lsh_cosine_topk"] = _lsh_topk_sql(k=5, n_planes=12, probes=4, seed=42)
    # IVF twin: identical deterministic centroid selection (smallest
    # md5('ivf'|id), tie on id), argmax-cell assignment with the same
    # (sim DESC, cid DESC) tie-break as Spark's max(struct), n_probe
    # nearest cells per query, exact round-6 rerank inside probed cells
    o["ivf_cosine_topk"] = f"""
WITH cent AS (
  SELECT vec_id AS cid, embedding AS centv
  FROM embeddings
  ORDER BY md5(concat_ws('|', 'ivf', CAST(vec_id AS VARCHAR))), vec_id
  LIMIT 8),
assign AS (
  SELECT vec_id, cv, cid FROM (
    SELECT a.vec_id, a.embedding AS cv, c.cid,
           row_number() OVER (
             PARTITION BY a.vec_id
             ORDER BY {_sql_cos6('a.embedding', 'c.centv')} DESC, c.cid DESC
           ) AS rn
    FROM embeddings a CROSS JOIN cent c)
  WHERE rn = 1),
q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings
      WHERE vec_id < 3),
probes AS (
  SELECT query_id, qv, cid FROM (
    SELECT q.query_id, q.qv, c.cid,
           row_number() OVER (
             PARTITION BY q.query_id
             ORDER BY {_sql_cos6('q.qv', 'c.centv')} DESC, c.cid DESC
           ) AS pr
    FROM q CROSS JOIN cent c)
  WHERE pr <= 3),
cand AS (
  SELECT p.query_id, a.vec_id, {_sql_cos6('a.cv', 'p.qv')} AS cosine
  FROM assign a JOIN probes p USING (cid)),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY cosine DESC, vec_id ASC) AS rank
  FROM cand)
SELECT query_id, vec_id, round(cosine, 4) AS cosine, rank
FROM ranked WHERE rank <= 5"""
    # spherical-k-means twin of refine_ivf_centroids: the SAME seed
    # (smallest md5('ivf'|id)), unit-normalize corpus + seed with the same
    # sequential fold, two unrolled Lloyd rounds of [argmax-cell assignment
    # with the (sim DESC, cid DESC) tie-break -> per-element round-5 mean ->
    # empty-cell coalesce to the previous centroid], exploded to
    # (cid, pos, val) scalars for the driver's value hash
    def _unit(col: str) -> str:
        fold = (
            "list_reduce(list_prepend(CAST(0 AS DOUBLE), "
            f"list_transform(range(1, 65), i -> "
            f"CAST({col}[i] AS DOUBLE) * CAST({col}[i] AS DOUBLE))), "
            "(x, y) -> x + y)"
        )
        return (
            f"list_transform({col}, x -> "
            f"CAST(x AS DOUBLE) / greatest(sqrt({fold}), 1e-12))"
        )

    def _lloyd_plain(prev: str, n: int) -> str:
        return f"""
a{n} AS (
  SELECT vec_id, cv, cid FROM (
    SELECT nm.vec_id, nm.cv, c.cid,
           row_number() OVER (
             PARTITION BY nm.vec_id
             ORDER BY {_sql_cos6('nm.cv', 'c.centv')} DESC, c.cid DESC
           ) AS rn
    FROM normed nm CROSS JOIN {prev} c)
  WHERE rn = 1),
e{n} AS (
  SELECT cid, generate_subscripts(cv, 1) AS pos, unnest(cv) AS v FROM a{n}),
m{n} AS (
  SELECT cid, list(mval ORDER BY pos) AS mv FROM (
    SELECT cid, pos, round(avg(v), 5) AS mval FROM e{n} GROUP BY cid, pos) g
  GROUP BY cid),
c{n} AS (
  SELECT p.cid, coalesce(m.mv, p.centv) AS centv
  FROM {prev} p LEFT JOIN m{n} m USING (cid))"""

    o["ivf_refine_centroids"] = f"""
WITH normed AS (
  SELECT vec_id, {_unit('embedding')} AS cv FROM embeddings),
seed AS (
  SELECT vec_id AS cid, embedding FROM embeddings
  ORDER BY md5(concat_ws('|', 'ivf', CAST(vec_id AS VARCHAR))), vec_id
  LIMIT 8),
c0 AS (
  SELECT cid, {_unit('embedding')} AS centv FROM seed),{_lloyd_plain('c0', 1)},{_lloyd_plain('c1', 2)}
SELECT cid, generate_subscripts(centv, 1) - 1 AS pos,
       round(unnest(centv), 5) AS val
FROM c2"""

    o["embedding_neardup"] = _emb_neardup_sql(threshold=0.3, n_planes=8, seed=42)
    o["ngram_jaccard_pairs"] = _SQL_JACCARD_PAIRS
    o["minhash_lsh_pairs"] = _SQL_JACCARD_PAIRS
    # transitive closure over the pair graph — an INDEPENDENT algorithm
    # (recursive CTE) for the same components the Spark label propagation
    # computes; comp = min id reachable through near-dup pairs
    _SQL_CC = f"""
WITH RECURSIVE pairs AS ({_SQL_JACCARD_PAIRS}),
edges AS (SELECT id_a AS a, id_b AS b FROM pairs
          UNION SELECT id_b, id_a FROM pairs),
cc(id, comp) AS (
    SELECT a, a FROM edges
  UNION
    SELECT e.a, cc.comp FROM edges e JOIN cc ON cc.id = e.b
)
SELECT id, min(comp) AS comp FROM cc GROUP BY id"""
    o["neardup_components"] = _SQL_CC
    o["neardup_dedup"] = f"""
SELECT doc_id FROM documents
WHERE doc_id NOT IN (SELECT id FROM ({_SQL_CC}) WHERE comp <> id)"""
    o["simhash_neardup_pairs"] = _SQL_SIMHASH_PAIRS
    o["simhash_wide_pairs"] = _SQL_SIMHASH_WIDE_PAIRS
    # hierarchy sync converges both tables to the source derivation, so the
    # oracle is the source itself joined with its per-user counts
    o["hierarchy_sync_state"] = f"""
WITH src AS ({_SQL_SRC}),
p AS (SELECT user_id, count(*) AS n_events FROM src GROUP BY user_id)
SELECT s.user_id, s.event_id, s.event_type, round(s.val, 6) AS val,
       epoch_us(s.ts) AS ts_us, p.n_events
FROM src s JOIN p USING (user_id)"""
    # multimodal_decode intentionally has NO oracle entry → driver records
    # the weaker rows-only check (codec parsing is not SQL-expressible)
    dirty = ("coalesce(text, '') || ' see https://ex.io/p?q=1 or mail ' || "
             "'u' || CAST(doc_id AS VARCHAR) || '@ex.io or call +1 415-555-01' "
             "|| CAST(doc_id AS VARCHAR)")
    o["scrub_text"] = (
        f"SELECT doc_id, {scrub_sql(dirty)} AS clean FROM documents"
    )
    o["windowed_change_rate"] = f"""
WITH chg AS ({_SQL_CHG})
SELECT user_id,
       epoch_us(date_trunc('minute', ts)) AS ws_us,
       epoch_us(date_trunc('minute', ts) + INTERVAL 1 MINUTE) AS we_us,
       count(*) AS n_changes,
       CAST(coalesce(sum(CASE WHEN op = 'delete' THEN 1 END), 0) AS BIGINT)
         AS n_deletes
FROM chg GROUP BY user_id, date_trunc('minute', ts)"""
    o["diff_element_order"] = f"""
WITH d AS ({_SQL_DIFF})
SELECT user_id, event_id, op,
       row_number() OVER (ORDER BY CAST(user_id AS VARCHAR) || '__' ||
                          CAST(event_id AS VARCHAR)) AS element_rank
FROM d"""
    from diffsync_spark.functions.sampling import (
        _key_hash_sql,
        sample_sql,
        split_sql,
    )
    from diffsync_spark.functions.sessions import sessionize_sql

    o["hash_sample"] = (
        "SELECT doc_id, lang, source FROM documents WHERE "
        + sample_sql(0.2, ["doc_id"], salt="r2")
    )
    o["stratified_sample"] = f"""
WITH r AS (
  SELECT lang, source, doc_id,
         row_number() OVER (PARTITION BY lang, source
                            ORDER BY {_key_hash_sql(["doc_id"], "r2")}) AS rn
  FROM documents)
SELECT lang, source, doc_id FROM r WHERE rn <= 5"""
    o["train_split"] = (
        "SELECT doc_id, "
        + split_sql(["doc_id"], {"train": 0.8, "valid": 0.1, "test": 0.1},
                    salt="r2")
        + " AS split FROM documents"
    )
    inner = sessionize_sql(
        "SELECT user_id, event_id, ts FROM events",
        ("user_id",), "ts", 600,
        tiebreak_cols=("event_id",), payload_cols=("event_id",),
    )
    o["sessionize"] = (
        "SELECT user_id, event_id, epoch_us(ts) AS ts_us, "
        f"is_session_start, session_idx FROM ({inner})"
    )
    from diffsync_spark.sources.cdc_formats import debezium_sql

    _dbz_raw = """
SELECT to_json(struct_pack(
         before := CASE WHEN oc = 'd' THEN img END,
         "after" := CASE WHEN oc <> 'd' THEN img END,
         op := oc,
         ts_ms := epoch_ms(ts),
         source := struct_pack(lsn := event_id, "table" := 'events')
       )) AS value
FROM (
  SELECT *,
         CASE WHEN event_id % 97 = 0 THEN 'x'
              WHEN event_id % 4 = 0 THEN 'c'
              WHEN event_id % 4 = 1 THEN 'u'
              WHEN event_id % 4 = 2 THEN 'd'
              ELSE 'r' END AS oc,
         struct_pack(user_id := user_id, event_id := event_id,
                     event_type := event_type,
                     val := round(value, 4)) AS img
  FROM events)"""
    _dbz_decoded = debezium_sql(
        [("user_id", "BIGINT"), ("event_id", "BIGINT"),
         ("event_type", "VARCHAR"), ("val", "DOUBLE")],
        _dbz_raw,
    )
    o["debezium_decode"] = f"""
SELECT seq, op, user_id, event_id, event_type, round(val, 4) AS val,
       epoch_us(ts) AS ts_us
FROM ({_dbz_decoded})"""
    # Kafka transport twin: same envelopes with (partition, offset)
    # attached; seq = the per-partition offset instead of the LSN
    _kafka_raw = f"""
SELECT value,
       row_number() OVER (PARTITION BY part ORDER BY eid) AS koff
FROM (SELECT value, event_id % 4 AS part, event_id AS eid
      FROM ({_dbz_raw.replace("AS value", "AS value, event_id")}))"""
    o["kafka_decode"] = f"""
SELECT seq, op, user_id, event_id, event_type, round(val, 4) AS val,
       epoch_us(ts) AS ts_us
FROM ({debezium_sql(
        [("user_id", "BIGINT"), ("event_id", "BIGINT"),
         ("event_type", "VARCHAR"), ("val", "DOUBLE")],
        _kafka_raw, seq_expr="koff",
    )})"""
    from diffsync_spark.functions.assemble import assemble_sql

    o["assemble_sequences"] = assemble_sql(
        "SELECT user_id, event_id, event_type, ts FROM events",
        ("user_id",), ("ts", "event_id"), "event_type", sep="|",
    )
    o["chunk_text"] = """
WITH d AS (
  SELECT doc_id, text,
         CASE WHEN text IS NULL OR length(text) = 0 THEN 0
              ELSE greatest(CAST(floor((length(text) - 21) / 100.0) AS BIGINT)
                            + 1, 1) END AS n_chunks
  FROM documents)
SELECT doc_id, chunk_idx,
       substr(text, CAST(chunk_idx * 100 + 1 AS INT), 120) AS chunk,
       n_chunks
FROM (SELECT doc_id, text, n_chunks,
             unnest(range(0, n_chunks)) AS chunk_idx
      FROM d)"""
    o["decontaminate"] = f"""
WITH {_SQL_SHINGLES},
block_sh AS (
  SELECT DISTINCT unnest(sh) AS g FROM sh WHERE doc_id % 23 = 0),
inv AS (SELECT doc_id, unnest(sh) AS g FROM sh),
hits AS (
  SELECT i.doc_id, count(*) AS n
  FROM inv i JOIN block_sh USING (g) GROUP BY i.doc_id)
SELECT d.doc_id,
       {_norm_sql('d.text')} IN (
         SELECT {_norm_sql('text')} FROM documents WHERE doc_id % 23 = 0)
         AS contaminated_exact,
       CAST(coalesce(h.n, 0) AS BIGINT) AS n_block_shingles,
       CAST(len(s.sh) AS BIGINT) AS n_shingles,
       round(CASE WHEN len(s.sh) > 0
                  THEN coalesce(h.n, 0) * 1.0 / len(s.sh)
                  ELSE 0.0 END, 4) AS ratio,
       coalesce(h.n, 0) >= 2 AS contaminated_ngram
FROM documents d
LEFT JOIN hits h USING (doc_id)
LEFT JOIN sh s USING (doc_id)"""
    from diffsync_spark.sources.cdc_formats import maxwell_sql

    _mxw_raw = """
SELECT to_json(struct_pack(
         database := 'app', "table" := 'events',
         type := CASE WHEN event_id % 89 = 0 THEN 'table-create'
                      WHEN event_id % 3 = 0 THEN 'insert'
                      WHEN event_id % 3 = 1 THEN 'update'
                      ELSE 'delete' END,
         ts := epoch_ms(ts) // 1000,
         xid := event_id,
         data := struct_pack(user_id := user_id, event_id := event_id,
                             event_type := event_type,
                             val := round(value, 4))
       )) AS value
FROM events"""
    _mxw_decoded = maxwell_sql(
        [("user_id", "BIGINT"), ("event_id", "BIGINT"),
         ("event_type", "VARCHAR"), ("val", "DOUBLE")],
        _mxw_raw,
    )
    o["maxwell_decode"] = f"""
SELECT seq, op, user_id, event_id, event_type, round(val, 4) AS val,
       epoch_us(ts) AS ts_us
FROM ({_mxw_decoded})"""
    from diffsync_spark.sources.cdc_formats import canal_sql

    _cnl_raw = """
SELECT to_json(struct_pack(
         data := data, type := type, es := es, id := id, "isDdl" := isDdl
       )) AS value
FROM (
  SELECT g,
         CASE WHEN g % 41 = 0 THEN NULL
              ELSE list(struct_pack(user_id := user_id, event_id := event_id,
                                    event_type := event_type, val := val)
                        ORDER BY event_id) END AS data,
         CASE WHEN g % 41 = 0 THEN 'CREATE'
              WHEN g % 3 = 0 THEN 'INSERT'
              WHEN g % 3 = 1 THEN 'UPDATE' ELSE 'DELETE' END AS type,
         epoch_ms(min(ts)) AS es, g AS id, g % 41 = 0 AS isDdl
  FROM (SELECT user_id, event_id, event_type, round(value, 4) AS val, ts,
               event_id % 2500 AS g
        FROM events)
  GROUP BY g)"""
    _cnl_decoded = canal_sql(
        [("user_id", "BIGINT"), ("event_id", "BIGINT"),
         ("event_type", "VARCHAR"), ("val", "DOUBLE")],
        _cnl_raw,
    )
    o["canal_decode"] = f"""
SELECT seq, op, user_id, event_id, event_type, round(val, 4) AS val,
       epoch_us(ts) AS ts_us
FROM ({_cnl_decoded})"""
    from diffsync_spark.sources.cdc_formats import wal2json_sql

    _w2j_raw = """
SELECT CASE WHEN event_id % 101 = 0 THEN 'corrupt {'
            ELSE CAST(to_json(struct_pack(
                   action := action,
                   "schema" := 'public', "table" := 'events',
                   columns := CASE WHEN action IN ('I', 'U') THEN img END,
                   identity := CASE WHEN action = 'D' THEN img END,
                   "timestamp" := strftime(ts, '%Y-%m-%d %H:%M:%S.%f')
                                    || '+00',
                   lsn := to_hex(event_id % 7 + 1) || '/' || to_hex(event_id)
                 )) AS VARCHAR) END AS value
FROM (
  SELECT event_id, ts,
         CASE WHEN event_id % 89 = 0 THEN 'T'
              WHEN event_id % 97 = 0 THEN 'B'
              WHEN event_id % 3 = 0 THEN 'I'
              WHEN event_id % 3 = 1 THEN 'U' ELSE 'D' END AS action,
         [struct_pack(name := 'user_id', value := CAST(user_id AS VARCHAR)),
          struct_pack(name := 'event_id', value := CAST(event_id AS VARCHAR)),
          struct_pack(name := 'event_type', value := event_type),
          struct_pack(name := 'val',
                      value := CAST(round(value, 4) AS VARCHAR))] AS img
  FROM events)"""
    _w2j_decoded = wal2json_sql(
        [("user_id", "BIGINT"), ("event_id", "BIGINT"),
         ("event_type", "VARCHAR"), ("val", "DOUBLE")],
        _w2j_raw,
    )
    o["wal2json_decode"] = f"""
SELECT seq, op, user_id, event_id, event_type, round(val, 4) AS val,
       epoch_us(ts) AS ts_us
FROM ({_w2j_decoded})"""
    o["filter_top_fraction"] = """
WITH r AS (
  SELECT doc_id, lang,
         percent_rank() OVER (PARTITION BY lang
                              ORDER BY n_chars DESC, doc_id) AS pr
  FROM documents)
SELECT doc_id, lang FROM r WHERE pr < 0.3"""
    # contract gate for the approx path: strata + exact totals pinned by
    # DuckDB, ok must come out TRUE from the Spark-side rank-slack check
    o["filter_top_fraction_approx"] = """
SELECT lang, count(*) AS n_total, TRUE AS ok
FROM documents GROUP BY lang"""
    from diffsync_spark.functions.assemble import pack_sql

    o["pack_sequences"] = pack_sql(
        "SELECT doc_id, n_chars, doc_id % 8 AS bkt FROM documents",
        "n_chars", 2000, "bkt", ("doc_id",), payload_cols=("doc_id",),
    )
    # the composed chain's twin: per-stage twins nested stage-into-stage
    # (exact keep-min-id → jaccard pairs restricted to survivors →
    # recursive-CTE closure → exact-contamination anti-filter → per-lang
    # percent_rank → recursive-CTE next-fit packing)
    _pipe_d4 = f"""
WITH RECURSIVE
d1 AS (SELECT * FROM documents WHERE doc_id IN (
         SELECT min(doc_id) FROM documents GROUP BY {_norm_sql('text')})),
pairs AS (SELECT * FROM ({_SQL_JACCARD_PAIRS})
          WHERE id_a IN (SELECT doc_id FROM d1)
            AND id_b IN (SELECT doc_id FROM d1)),
edges AS (SELECT id_a AS a, id_b AS b FROM pairs
          UNION SELECT id_b, id_a FROM pairs),
cc(id, comp) AS (
    SELECT a, a FROM edges
  UNION
    SELECT e.a, cc.comp FROM edges e JOIN cc ON cc.id = e.b),
victims AS (SELECT id FROM (SELECT id, min(comp) AS comp FROM cc GROUP BY id)
            WHERE comp <> id),
d2 AS (SELECT * FROM d1 WHERE doc_id NOT IN (SELECT id FROM victims)),
d3 AS (SELECT * FROM d2 WHERE {_norm_sql('text')} NOT IN (
         SELECT {_norm_sql('text')} FROM documents WHERE doc_id % 23 = 0)),
d4 AS (SELECT doc_id, lang, n_chars FROM (
         SELECT doc_id, lang, n_chars,
                percent_rank() OVER (PARTITION BY lang
                                     ORDER BY n_chars DESC, doc_id) AS pr
         FROM d3) WHERE pr < 0.5)
SELECT doc_id, lang, n_chars FROM d4"""
    _pipe_packed = pack_sql(
        _pipe_d4, "n_chars", 2000, "lang", ("doc_id",),
        payload_cols=("doc_id",),
    )
    o["pipeline_dedup_pack"] = (
        f"SELECT bkt, doc_id, sz, pack_id, pack_fill FROM ({_pipe_packed})"
    )
    # session-window agg ≡ group-by over row-level sessionize labels
    _sess_rows = sessionize_sql(
        f"SELECT user_id, op, ts FROM ({_SQL_CHG})",
        ("user_id",), "ts", 600, payload_cols=("op",),
    )
    o["session_change_stats"] = f"""
SELECT user_id,
       epoch_us(min(ts)) AS ss_us,
       epoch_us(max(ts) + INTERVAL 600 SECOND) AS se_us,
       count(*) AS n_changes,
       CAST(coalesce(sum(CASE WHEN lower(op) = 'delete' THEN 1 END), 0)
            AS BIGINT) AS n_deletes
FROM ({_sess_rows})
GROUP BY user_id, session_idx"""
    from diffsync_spark.functions.profile import profile_sql

    _prof = profile_sql(
        "SELECT event_id, user_id, event_type, props FROM events",
        [("event_id", "orderable"), ("user_id", "orderable"),
         ("event_type", "string"), ("props", "string")],
    )
    o["profile"] = f"""
SELECT "column", n_rows, n_nulls, round(null_frac, 6) AS null_frac,
       n_distinct, min_str, max_str, round(avg_len, 6) AS avg_len
FROM ({_prof})"""
    from diffsync_spark.functions.sampling import mix_sql, repeat_sql

    o["mix_weighted"] = mix_sql(
        "SELECT doc_id, source, lang FROM documents", "source",
        {"src0": 2.3, "src1": 1.0, "src2": 0.4, "src3": 0.0},
        ["doc_id"], salt="mixgate", default_weight=0.5,
    )
    from diffsync_spark.functions.text import boilerplate_sql

    o["boilerplate_lines"] = boilerplate_sql(
        "SELECT doc_id, coalesce(text, '') || chr(10) || "
        "'cookie consent banner text' || chr(10) || 'unique line ' || "
        "CAST(doc_id AS VARCHAR) AS text FROM documents",
        max_docs=25,
    )

    o["repeat_dataset"] = repeat_sql(
        "SELECT doc_id, lang FROM documents", 2.3, ["doc_id"], salt="mix"
    )

    from diffsync_spark.functions.dedup import substring_spans_sql

    o["substring_dedup"] = substring_spans_sql(
        "SELECT doc_id, CASE WHEN doc_id % 3 = 0 THEN coalesce(text, '') || "
        "' the exact shared snippet that repeats verbatim across one third "
        "of all documents' ELSE coalesce(text, '') END AS text "
        "FROM documents",
        min_tokens=8,
    )

    from diffsync_spark.functions.text import bpe_count_sql

    o["bpe_token_count"] = bpe_count_sql(
        "SELECT doc_id, text FROM documents", _BPE_MERGES)

    # the CDC envelope matrix: UNION ALL of the five decoder twins, tagged
    # by fmt — mirrors the Spark side's unionByName exactly
    o["cdc_decode_matrix"] = "\nUNION ALL\n".join(
        f"SELECT '{fmt}' AS fmt, * FROM ({o[name]})"
        for fmt, name in [
            ("debezium", "debezium_decode"), ("maxwell", "maxwell_decode"),
            ("canal", "canal_decode"), ("wal2json", "wal2json_decode"),
            ("kafka", "kafka_decode"),
        ]
    )
    return o
