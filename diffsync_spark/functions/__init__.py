"""Large-scale training-data pipeline operators.

Not part of the reference's surface (diffsync is a sync library); these are
the first-class data-processing operators a 100 TB transcript/document lake
needs alongside CDC ingest: dedup, similarity search, text analysis, and
multimodal column plumbing. All built Spark-first: JVM expressions where
possible, Arrow-batched pandas UDFs where bit-math demands it, never
per-row Python.
"""

from diffsync_spark.functions.text import (
    token_count_col,
    bpe_token_count,
    bpe_count_py,
    train_bpe_merges,
    parse_merges,
    quality_features,
    lang_id,
    fingerprint_col,
    remove_boilerplate_lines,
)
from diffsync_spark.functions.dedup import (
    dedup_near_duplicates,
    dedup_substrings,
    exact_dedup,
    substring_spans,
    neardup_components,
    ngram_jaccard_pairs,
    minhash_lsh_pairs,
    simhash,
    embedding_neardup_pairs,
)
from diffsync_spark.functions.similarity import (
    build_ann_index,
    build_ivf_index,
    cosine_topk,
    extend_ann_index,
    extend_ivf_index,
    ivf_centroids,
    ivf_cosine_topk,
    refine_ivf_centroids,
    lsh_cosine_topk,
    quantize_embeddings,
    dequantize_embeddings,
    quantized_cosine_topk,
)
from diffsync_spark.functions.sampling import (
    filter_top_fraction,
    hash_sample,
    mix_weighted,
    repeat_dataset,
    split_column,
    stratified_sample,
)
from diffsync_spark.functions.sessions import sessionize
from diffsync_spark.functions.assemble import (
    assemble_sequences,
    chunk_text,
    pack_sequences,
)
from diffsync_spark.functions.decontaminate import flag_exact, flag_ngram_overlap
from diffsync_spark.functions.multimodal import (
    decode_assets,
    fake_assets,
    frame_sample,
    frame_sample_plan,
)
from diffsync_spark.functions.mp4 import parse_mp4, sample_video_frames
from diffsync_spark.functions.profile import profile

__all__ = [
    "assemble_sequences",
    "chunk_text",
    "pack_sequences",
    "flag_exact",
    "flag_ngram_overlap",
    "decode_assets",
    "fake_assets",
    "frame_sample",
    "frame_sample_plan",
    "parse_mp4",
    "sample_video_frames",
    "profile",
    "filter_top_fraction",
    "hash_sample",
    "mix_weighted",
    "repeat_dataset",
    "split_column",
    "stratified_sample",
    "sessionize",
    "token_count_col",
    "bpe_token_count",
    "bpe_count_py",
    "train_bpe_merges",
    "parse_merges",
    "quality_features",
    "remove_boilerplate_lines",
    "lang_id",
    "fingerprint_col",
    "dedup_near_duplicates",
    "dedup_substrings",
    "exact_dedup",
    "substring_spans",
    "neardup_components",
    "ngram_jaccard_pairs",
    "minhash_lsh_pairs",
    "simhash",
    "embedding_neardup_pairs",
    "build_ann_index",
    "build_ivf_index",
    "cosine_topk",
    "extend_ann_index",
    "extend_ivf_index",
    "ivf_centroids",
    "ivf_cosine_topk",
    "refine_ivf_centroids",
    "lsh_cosine_topk",
    "quantize_embeddings",
    "dequantize_embeddings",
    "quantized_cosine_topk",
]
