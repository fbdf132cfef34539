"""Multimodal column plumbing — image/audio/video as opaque binary columns.

The Spark-side machinery (schema, partitioning, Arrow batch shape, UDF
signatures) is real and tested; the actual decoders are STUBBED behind
``_HAS_CODECS`` because the image/audio libraries are not in this container —
``decode_assets(..., fake=True)`` substitutes a deterministic hash-derived
fake so pipelines exercise end-to-end without the libs.

Pattern: ``mapInPandas`` so each task pulls Arrow record batches, decodes a
batch of binary payloads at once, and yields feature rows — never one row at
a time, and the binary column is projected away as early as possible so only
the (small) features shuffle.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

try:  # pragma: no cover - not present in this container
    import PIL.Image  # type: ignore # noqa: F401

    _HAS_CODECS = True
except Exception:  # pragma: no cover
    _HAS_CODECS = False

ASSET_SCHEMA = (
    "asset_id long, kind string, payload binary, width int, height int, "
    "duration_ms int, mime string"
)
FEATURE_SCHEMA = (
    "asset_id long, kind string, n_bytes long, sha256 string, "
    "feat array<float>, decode_ok boolean"
)


def fake_assets(spark, n: int = 100, seed: int = 42) -> DataFrame:
    """Deterministic synthetic asset table (binary payloads from a seeded
    RNG) for testing the plumbing at any scale."""
    rng = np.random.default_rng(seed)
    kinds = ["image", "audio", "video"]
    rows = []
    for i in range(n):
        kind = kinds[i % 3]
        payload = rng.bytes(128 + int(rng.integers(0, 512)))
        rows.append(
            (
                i,
                kind,
                bytearray(payload),
                int(rng.integers(16, 512)) if kind == "image" else None,
                int(rng.integers(16, 512)) if kind == "image" else None,
                int(rng.integers(100, 60_000)) if kind != "image" else None,
                {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind],
            )
        )
    return spark.createDataFrame(rows, ASSET_SCHEMA)


def decode_assets(assets: DataFrame, feat_dim: int = 8, fake: bool | None = None) -> DataFrame:
    """Decode + feature-extract binary assets via mapInPandas.

    ``fake=None`` auto-selects: real codecs if available, else the
    deterministic fake (sha256-seeded feature vector). ``fake=False`` without
    codecs raises NotImplementedError — the clearly-marked stub boundary.
    """
    if fake is None:
        fake = not _HAS_CODECS
    if not fake and not _HAS_CODECS:
        raise NotImplementedError(
            "real image/audio decoding requires PIL/soundfile, absent in this "
            "environment; pass fake=True for the deterministic stand-in"
        )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf["payload"]
            shas = [
                hashlib.sha256(bytes(p) if p is not None else b"").hexdigest()
                for p in payloads
            ]
            feats = []
            for sha in shas:
                # deterministic fake "embedding": bytes of the digest → floats
                raw = np.frombuffer(bytes.fromhex(sha), dtype=np.uint8)[:feat_dim]
                feats.append((raw.astype(np.float32) / 255.0).tolist())
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "kind": pdf["kind"],
                    "n_bytes": payloads.map(lambda p: len(p) if p is not None else 0),
                    "sha256": shas,
                    "feat": feats,
                    "decode_ok": [p is not None for p in payloads],
                }
            )

    return assets.mapInPandas(batches, schema=FEATURE_SCHEMA)


def frame_sample_plan(assets: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: rows (asset_id, frame_ts_ms) for each
    sample point — the Spark-side fan-out a real decoder would consume.
    Pure JVM (sequence + explode); the decode itself is the stub above."""
    vids = assets.filter(F.col("kind") == "video").select(
        "asset_id", "duration_ms"
    )
    return vids.select(
        "asset_id",
        F.explode(
            F.sequence(F.lit(0), F.col("duration_ms"), F.lit(every_ms))
        ).alias("frame_ts_ms"),
    )
