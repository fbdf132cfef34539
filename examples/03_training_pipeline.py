"""Training-data pipeline — the §2.13 operators composed end-to-end.

documents.parquet → scrub PII → exact-dedup → decontaminate against a
held-out eval set → quality-filter per language → train/valid/test split →
chunk → pack into token-budget bins. Every stage is a DataFrame
transformation; the whole pipeline is ONE lazy plan per output split, so
Catalyst prunes columns/filters across stage boundaries and nothing
materializes until the write.

Run:  PYTHONPATH=. python examples/03_training_pipeline.py
"""

from pyspark.sql import functions as F

from diffsync_spark import build_session
from diffsync_spark.functions import (
    chunk_text,
    filter_top_fraction,
    flag_exact,
    pack_sequences,
    split_column,
)
from diffsync_spark.functions.dedup import exact_dedup
from diffsync_spark.functions.text import scrub_text


def main() -> None:
    spark = build_session(master="local[4]", shuffle_partitions=4)
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    n0 = docs.count()

    # 1. PII/URL scrubbing (column exprs; no shuffle)
    clean = docs.withColumn("text", scrub_text(F.col("text")))

    # 2. exact dedup on the 128-bit content key (one shuffle of 16-byte keys)
    deduped = exact_dedup(clean)

    # 3. decontaminate: drop anything matching the "eval set" (every 31st
    #    doc here); blocklist broadcast — the corpus never shuffles
    evalset = deduped.filter(F.col("doc_id") % 31 == 0)
    decon = (
        flag_exact(deduped, evalset)
        .filter(~F.col("contaminated_exact"))
        .drop("contaminated_exact")
    )

    # 4. keep the top 60% by length per language (quality proxy)
    quality = filter_top_fraction(
        decon, "n_chars", 0.6, ["lang"], tiebreak_cols=("doc_id",)
    )

    # 5. deterministic split — stable across reruns and repartitioning
    labeled = quality.select(
        "*", split_column(["doc_id"], {"train": 0.9, "valid": 0.1})
    )

    # 6. chunk + 7. pack (train split only)
    chunks = chunk_text(
        labeled.filter("split = 'train'"), "text",
        chunk_chars=400, overlap=50,
    ).withColumn("chunk_len", F.length("chunk"))
    packed = pack_sequences(
        chunks.withColumn("bkt", F.col("doc_id") % 8),
        "chunk_len", 2000, "bkt", ("doc_id", "chunk_idx"),
    )

    stats = packed.agg(
        F.count(F.lit(1)).alias("chunks"),
        F.count_distinct("bkt", "pack_id").alias("packs"),
        F.round(F.avg("chunk_len"), 1).alias("avg_chunk_len"),
    ).first()
    print(f"{n0} docs -> {deduped.count()} deduped -> {decon.count()} "
          f"decontaminated -> {quality.count()} quality-kept")
    print(f"train split packed: {stats.chunks} chunks into {stats.packs} "
          f"packs (avg chunk {stats.avg_chunk_len} chars)")
    spark.stop()


if __name__ == "__main__":
    main()
