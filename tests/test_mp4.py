"""MP4 container parsing + MJPEG frame sampling: box walk, sample-table
resolution (stsc/stco/co64), timestamp targeting, the honest codec
boundary, and the Spark-side frame_sample / decode_assets integration."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from diffsync_spark.functions.mp4 import (
    encode_mp4_mjpeg,
    frame_sample,
    parse_mp4,
    sample_video_frames,
)
from diffsync_spark.functions.multimodal import decode_assets, fake_assets


def _frames(n, h=12, w=10, color=False, seed=1):
    rng = np.random.default_rng(seed)
    shape = (h, w, 3) if color else (h, w)
    return [rng.integers(0, 256, size=shape).astype(np.uint8)
            for _ in range(n)]


def test_mux_parse_roundtrip_multichunk():
    frames = _frames(7)
    mp4 = encode_mp4_mjpeg(frames, fps=5, samples_per_chunk=3)
    info = parse_mp4(mp4)
    assert info.brand == "isom"
    assert info.duration_ms == 7 * 200  # 5 fps at timescale 1000
    trk = info.video_track()
    assert trk is not None and trk.codec == "jpeg"
    assert (trk.width, trk.height) == (10, 12)
    assert len(trk.sample_offsets) == 7 == len(trk.sample_sizes)
    assert trk.sample_times == [0, 200, 400, 600, 800, 1000, 1200]
    # every resolved offset must point at a JPEG SOI marker, and the
    # slices must tile mdat exactly (chunk map correctness)
    for off, size in zip(trk.sample_offsets, trk.sample_sizes):
        assert mp4[off:off + 2] == b"\xff\xd8"
        assert mp4[off + size - 2:off + size] == b"\xff\xd9"


def test_co64_and_single_chunk():
    frames = _frames(4)
    wide = encode_mp4_mjpeg(frames, use_co64=True, samples_per_chunk=99)
    trk = parse_mp4(wide).video_track()
    assert len(trk.sample_offsets) == 4
    assert wide[trk.sample_offsets[3]:trk.sample_offsets[3] + 2] == b"\xff\xd8"


def test_frame_sampling_targets_decode_times():
    frames = _frames(10)
    mp4 = encode_mp4_mjpeg(frames, fps=10)  # 100 ms/frame, 1000 ms total
    rows = sample_video_frames(mp4, every_ms=250, feat_dim=4)
    # t = 0, 250, 500, 750 → frames 0, 2, 5, 7
    assert [(r[0], r[1]) for r in rows] == [
        (0, 0), (2, 200), (5, 500), (7, 700)]
    assert all(r[5] for r in rows)        # MJPEG decodes for real
    assert all(len(r[4]) == 4 for r in rows)
    # decoded pixels ≈ source pixels: features near the source band means
    src = frames[0].astype(np.float64) / 255.0
    want = [float(b.mean()) for b in np.array_split(src, 4, axis=0)]
    got = rows[0][4]
    assert max(abs(a - b) for a, b in zip(got, want)) < 0.05


def test_compressed_codec_is_honest_with_real_metadata():
    mp4 = encode_mp4_mjpeg(_frames(3), codec="avc1")
    rows = sample_video_frames(mp4, every_ms=1000, feat_dim=4)
    assert rows and not rows[0][5]              # decode_ok=False
    assert (rows[0][2], rows[0][3]) == (10, 12)  # container metadata real


def test_malformed_container_raises():
    with pytest.raises(ValueError):
        parse_mp4(b"\x00" * 64)
    ok = encode_mp4_mjpeg(_frames(2))
    # corrupt a box size in the middle of moov
    bad = bytearray(ok)
    moov_at = ok.index(b"moov") - 4
    struct.pack_into(">I", bad, moov_at, len(ok) * 2)
    with pytest.raises(ValueError):
        parse_mp4(bytes(bad))


def test_frame_sample_dataframe_op(spark):
    assets = fake_assets(spark, n=30)
    out = frame_sample(assets, every_ms=200, feat_dim=4)
    rows = out.collect()
    assert rows
    by_id = {}
    for r in rows:
        by_id.setdefault(r.asset_id, []).append(r)
    vids = {r[0]: r for r in assets.filter("kind = 'video'")
            .select("asset_id", "duration_ms").collect()}
    assert set(by_id) == set(vids)
    for aid, frames in by_id.items():
        if all(f.decode_ok for f in frames):
            # real MJPEG videos: one row per 200 ms tick = one per frame
            assert len(frames) == vids[aid][1] // 200
            assert all(len(f.feat) == 4 for f in frames)
        else:
            # garbage blobs: exactly one honest failure row
            assert len(frames) == 1 and not frames[0].decode_ok


def test_decode_assets_video_paths(spark):
    feats = decode_assets(fake_assets(spark, n=36), feat_dim=8)
    vids = feats.filter("kind = 'video'").collect()
    assert vids
    ok = [r for r in vids if r.decode_ok]
    bad = [r for r in vids if not r.decode_ok]
    assert ok and bad  # both the real-MP4 and garbage paths present
    for r in ok:
        # container metadata + first-frame features are real
        assert r.width and r.height and r.duration_ms
        assert len(r.feat) == 8
    for r in bad:
        assert r.feat == []
