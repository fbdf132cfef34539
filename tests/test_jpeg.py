"""Baseline JPEG codec: roundtrip error bounds from quantization alone,
an INDEPENDENT hand-assembled bitstream with analytically-known pixels
(no encoder involvement — guards against a bug mirrored in both
directions), and honest failure on unsupported features."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from diffsync_spark.functions.jpeg import (
    decode_jpeg,
    decode_jpeg_features,
    encode_jpeg,
)


def test_flat_gray_exact():
    img = np.full((16, 24), 137, np.uint8)
    out = decode_jpeg(encode_jpeg(img, quant=1))
    assert out.shape == (16, 24, 1)
    assert np.array_equal(out[..., 0], img)


def test_rgb_444_gradient_tight():
    x = np.linspace(0, 255, 40)
    img = np.stack(
        np.meshgrid(x, np.linspace(0, 255, 32)) + [np.full((32, 40), 64.0)],
        -1,
    ).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(img, quant=1))
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 3


def test_noise_bounded_by_dct_rounding():
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (24, 24), np.uint8)
    out = decode_jpeg(encode_jpeg(img, quant=1))[..., 0]
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 4


def test_420_subsampling():
    """Chroma constant within each 2x2 → subsampling loses nothing there;
    the residual is luma DCT rounding."""
    rng = np.random.default_rng(11)
    base = rng.integers(0, 256, (8, 12, 3), np.uint8)
    img = np.repeat(np.repeat(base, 2, 0), 2, 1)
    out = decode_jpeg(encode_jpeg(img, quant=1, subsample=True))
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 6


def test_odd_dimensions_both_samplings():
    rng = np.random.default_rng(13)
    img = rng.integers(0, 256, (13, 19, 3), np.uint8)
    for kw in ({}, {"subsample": True}):
        out = decode_jpeg(encode_jpeg(img, quant=2, **kw))
        assert out.shape == (13, 19, 3)


def test_hand_assembled_stream_decodes_analytically():
    """A bitstream built byte-by-byte HERE (the encoder never runs):
    one 8x8 gray block, quant=16, DC diff=+4, no AC. The 2D IDCT of a
    lone S00 is exactly S00/8, so every pixel must be
    round(4 * 16 / 8) + 128 = 136."""

    def seg(marker, body):
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    # DC table: single 1-bit code '0' -> category 3
    dht_dc = bytes([0x00, 1] + [0] * 15) + bytes([3])
    # AC table: single 1-bit code '0' -> EOB
    dht_ac = bytes([0x10, 1] + [0] * 15) + bytes([0x00])
    stream = (
        b"\xff\xd8"
        + seg(0xDB, bytes([0x00]) + bytes([16] * 64))
        + seg(0xC0, struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0]))
        + seg(0xC4, dht_dc + dht_ac)
        + seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
        # entropy bits: DC code '0', magnitude '100' (=+4), AC EOB '0',
        # padded with 1s -> 0b01000111
        + bytes([0b01000111])
        + b"\xff\xd9"
    )
    out = decode_jpeg(stream)
    assert out.shape == (8, 8, 1)
    assert np.array_equal(out[..., 0], np.full((8, 8), 136, np.uint8))


def test_unsupported_features_raise():
    img = np.full((8, 8), 99, np.uint8)
    good = encode_jpeg(img, quant=1)
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"\x00\x01" + good)
    # rewrite SOF0 -> SOF2 (progressive)
    prog = good.replace(b"\xff\xc0", b"\xff\xc2")
    with pytest.raises(ValueError, match="baseline"):
        decode_jpeg(prog)
    # inject a DRI segment right after SOI
    dri = good[:2] + struct.pack(">BBHH", 0xFF, 0xDD, 4, 8) + good[2:]
    with pytest.raises(ValueError, match="restart"):
        decode_jpeg(dri)


def test_features_contract():
    img = np.full((16, 16), 64, np.uint8)
    w, h, feat = decode_jpeg_features(encode_jpeg(img, quant=1), feat_dim=4)
    assert (w, h) == (16, 16)
    assert len(feat) == 4
    assert all(abs(f - 64 / 255) < 0.01 for f in feat)
