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
    # rewrite SOF0 -> SOF3 (lossless — unsupported mode)
    lossless = good.replace(b"\xff\xc0", b"\xff\xc3")
    with pytest.raises(ValueError, match="baseline/progressive"):
        decode_jpeg(lossless)
    # a SOF2 stream whose scan header is baseline-shaped (Ss=0, Se=63) is
    # malformed progressive — rejected, not misdecoded
    prog = good.replace(b"\xff\xc0", b"\xff\xc2")
    with pytest.raises(ValueError, match="Se=0"):
        decode_jpeg(prog)
    # a DRI segment with an interval the single-MCU stream never reaches
    # is accepted and changes nothing
    dri = good[:2] + struct.pack(">BBHH", 0xFF, 0xDD, 4, 8) + good[2:]
    assert np.array_equal(decode_jpeg(dri), decode_jpeg(good))
    # truncated entropy data still fails loudly
    with pytest.raises(ValueError):
        decode_jpeg(good[:-8])


def test_restart_intervals_roundtrip():
    """DRI/RSTn: byte-aligned resync markers every N MCUs with
    DC-predictor resets — decode must equal the marker-free encode."""
    rng = np.random.default_rng(9)
    for shape, sub in [((24, 24), False), ((40, 33, 3), True)]:
        px = rng.integers(0, 256, size=shape).astype(np.uint8)
        plain = decode_jpeg(encode_jpeg(px, quant=2, subsample=sub))
        for ri in (1, 2, 5):
            blob = encode_jpeg(px, quant=2, subsample=sub,
                               restart_interval=ri)
            assert np.array_equal(plain, decode_jpeg(blob)), (shape, sub, ri)
    # the markers are really in the stream
    blob = encode_jpeg(rng.integers(0, 256, (24, 24)).astype(np.uint8),
                       quant=2, restart_interval=1)
    assert any(bytes([0xFF, 0xD0 + i]) in blob for i in range(8))
    with pytest.raises(ValueError, match="baseline"):
        encode_jpeg(np.zeros((8, 8), np.uint8), progressive=True,
                    restart_interval=2)


def test_features_contract():
    img = np.full((16, 16), 64, np.uint8)
    w, h, feat = decode_jpeg_features(encode_jpeg(img, quant=1), feat_dim=4)
    assert (w, h) == (16, 16)
    assert len(feat) == 4
    assert all(abs(f - 64 / 255) < 0.01 for f in feat)


# ------------------------------------------------------------- progressive
def test_progressive_decodes_identical_to_baseline():
    """Same pixels, same quantized coefficients, different transmission
    order: the progressive decode must be BIT-identical to baseline."""
    rng = np.random.default_rng(3)
    for shape, sub in [((16, 16), False), ((24, 17, 3), False),
                       ((23, 18, 3), True), ((9, 33, 3), True)]:
        px = rng.integers(0, 256, size=shape).astype(np.uint8)
        base = decode_jpeg(encode_jpeg(px, quant=2, subsample=sub))
        prog = decode_jpeg(
            encode_jpeg(px, quant=2, subsample=sub, progressive=True))
        assert np.array_equal(base, prog), (shape, sub)


def test_progressive_eob_runs_and_zrl():
    """A mostly-flat image makes every AC band all-zero → the encoder
    emits genuine EOBn run codes (here a 16-block run, EOB4); an image
    with only the highest-frequency coefficient exercises ZRL chains in
    the 6..63 band. Both must decode identically to baseline."""
    flat = np.full((32, 32), 100, np.uint8)
    assert np.array_equal(
        decode_jpeg(encode_jpeg(flat, quant=1, progressive=True)),
        decode_jpeg(encode_jpeg(flat, quant=1)),
    )
    # lone high-frequency coefficient: 57 zeros inside the 6..63 band
    a = np.zeros((8, 8))
    a[7, 7] = 200.0
    x = np.arange(8)
    c = 0.5 * np.cos((2 * x[None, :] + 1) * x[:, None] * np.pi / 16)
    c[0, :] *= 1 / np.sqrt(2)
    px = np.clip(np.round(c.T @ a @ c + 128), 0, 255).astype(np.uint8)
    assert np.array_equal(
        decode_jpeg(encode_jpeg(px, quant=1, progressive=True)),
        decode_jpeg(encode_jpeg(px, quant=1)),
    )


def test_hand_assembled_progressive_refinement():
    """The AC successive-approximation REFINEMENT path (T.81 G.1.2.3),
    which our encoder never emits, pinned by a stream built bit-by-bit
    here: one 8x8 gray block, quant=1, three scans —

    1. DC first (Al=0): DC = 8.
    2. AC first (band 1..63, Al=1): k=1 carries (5>>1)=2, the true -1 at
       k=3 is below the point transform → not sent. Stored k=1 value: 4.
    3. AC refinement (Ah=1, Al=0): newly-nonzero -1 lands at k=3 (run of
       1 zero-history coefficient), and the pass over k=1 appends its
       correction bit (4 → 5). Also exercises DHT redefinition between
       scans.

    Expected coefficients: S(0,0)=8, S(0,1)=5, S(2,0)=-1 (zigzag 3)."""

    def seg(marker, body):
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    dht_dc = bytes([0x00, 1] + [0] * 15) + bytes([4])          # '0' -> cat 4
    dht_ac1 = bytes([0x10, 0, 2] + [0] * 14) + bytes([0x02, 0x00])
    dht_ac2 = bytes([0x10, 0, 2] + [0] * 14) + bytes([0x11, 0x00])
    stream = (
        b"\xff\xd8"
        + seg(0xDB, bytes([0x00]) + bytes([1] * 64))
        + seg(0xC2, struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0]))
        + seg(0xC4, dht_dc + dht_ac1)
        # scan 1: DC first, Ss=Se=0, Ah=0 Al=0: '0' + '1000' (+8), pad 1s
        + seg(0xDA, bytes([1, 1, 0x00, 0, 0, 0x00]))
        + bytes([0b01000111])
        # scan 2: AC first, band 1..63, Al=1: (r0,s2)='00', bits '10'
        # (+2), EOB='01', pad
        + seg(0xDA, bytes([1, 1, 0x00, 1, 63, 0x01]))
        + bytes([0b00100111])
        # redefine AC table 0 for the refinement scan
        + seg(0xC4, dht_ac2)
        # scan 3: AC refine, Ah=1 Al=0: (r1,s1)='00', sign '0' (-1),
        # correction bit '1' for k=1 (4->5), EOB='01', pad
        + seg(0xDA, bytes([1, 1, 0x00, 1, 63, 0x10]))
        + bytes([0b00010111])
        + b"\xff\xd9"
    )
    out = decode_jpeg(stream)[..., 0]
    a = np.zeros((8, 8))
    a[0, 0] = 8.0
    a[0, 1] = 5.0
    a[2, 0] = -1.0
    x = np.arange(8)
    c = 0.5 * np.cos((2 * x[None, :] + 1) * x[:, None] * np.pi / 16)
    c[0, :] *= 1 / np.sqrt(2)
    want = np.clip(np.round(c.T @ a @ c + 128), 0, 255).astype(np.uint8)
    assert np.array_equal(out, want)
