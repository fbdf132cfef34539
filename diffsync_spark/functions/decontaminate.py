"""Benchmark decontamination — remove evaluation-set leakage from a corpus.

Training corpora must not contain the benchmarks they are evaluated on.
Decontamination is a join problem, not a pairwise-similarity problem: the
blocklist (eval sets) is tiny relative to the corpus, so the right 100 TB
shape is a BROADCAST of blocklist keys against a corpus scan — no corpus
shuffle at all.

Two detection tiers, composable:

- ``flag_exact``: normalized-text equality via the 128-bit content key
  (reuses ``dedup.content_key``); broadcast semi/anti join on 16-byte
  keys. Catches verbatim copies.
- ``flag_ngram_overlap``: a corpus document is contaminated if at least
  ``min_hits`` of its word n-gram shingles appear in the blocklist's
  shingle set (the n-gram-collision rule used in public model reports).
  Corpus side explodes to (doc, shingle-hash) — a Generate, still no
  shuffle — and the broadcast join + per-doc count is one partial
  aggregation on doc_id. Catches near-verbatim / embedded copies.

Reference analog: none; SURVEY §2.13 family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from diffsync_spark.functions.dedup import content_key, shingles_col


def flag_exact(
    corpus: DataFrame,
    blocklist: DataFrame,
    text_col: str = "text",
    block_text_col: str | None = None,
) -> DataFrame:
    """Adds ``contaminated_exact`` (boolean): the row's normalized text
    equals some blocklist text. Blocklist is broadcast as 128-bit keys —
    the corpus never shuffles and never ships its text."""
    bt = block_text_col or text_col
    h1, h2 = content_key(F.col(text_col))
    b1, b2 = content_key(F.col(bt))
    keys = blocklist.select(b1.alias("__b1"), b2.alias("__b2")).distinct()
    joined = corpus.withColumn("__h1", h1).withColumn("__h2", h2).join(
        F.broadcast(keys),
        (F.col("__h1") == F.col("__b1")) & (F.col("__h2") == F.col("__b2")),
        "left",
    )
    return (
        joined.withColumn("contaminated_exact", F.col("__b1").isNotNull())
        .drop("__h1", "__h2", "__b1", "__b2")
    )


def flag_ngram_overlap(
    corpus: DataFrame,
    blocklist: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    block_text_col: str | None = None,
    n: int = 3,
    min_hits: int = 2,
) -> DataFrame:
    """Adds ``n_block_shingles`` (how many of the doc's distinct word
    n-grams appear anywhere in the blocklist), ``n_shingles`` (the doc's
    distinct n-gram count), ``block_shingle_ratio`` (their quotient — the
    thresholdable contamination measure; absolute hit counts alone
    over-flag template-heavy corpora), and ``contaminated_ngram``
    (``n_block_shingles >= min_hits``).

    Plan shape: blocklist shingles → distinct hashes → broadcast; corpus
    explodes its shingles (Generate), inner-joins the broadcast set, and
    partially aggregates hit counts by ``id_col`` map-side. The only
    exchange carries (doc_id, count) pairs. Docs with zero hits are
    restored by a final left join on the original frame — also hash-keyed
    on ``id_col``.
    """
    bt = block_text_col or text_col
    block_sh = (
        blocklist.select(F.explode(shingles_col(F.col(bt), n)).alias("s"))
        .select(F.xxhash64("s").alias("__sh"))
        .distinct()
    )
    with_sh = corpus.withColumn("__shingles", shingles_col(F.col(text_col), n))
    hits = (
        with_sh.select(F.col(id_col), F.explode("__shingles").alias("s"))
        .select(id_col, F.xxhash64("s").alias("__sh"))
        .join(F.broadcast(block_sh), "__sh", "inner")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_block_shingles"))
    )
    out = (
        with_sh.withColumn(
            "n_shingles", F.array_size("__shingles").cast("long")
        )
        .drop("__shingles")
        .join(hits, id_col, "left")
        .withColumn(
            "n_block_shingles",
            F.coalesce(F.col("n_block_shingles"), F.lit(0)),
        )
    )
    return out.withColumn(
        "block_shingle_ratio",
        F.when(
            F.col("n_shingles") > 0,
            F.col("n_block_shingles") / F.col("n_shingles"),
        ).otherwise(F.lit(0.0)),
    ).withColumn("contaminated_ngram", F.col("n_block_shingles") >= min_hits)
