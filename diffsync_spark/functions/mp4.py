"""MP4 (ISO base media file format) parsing + MJPEG frame sampling.

A from-scratch box walker for the public ISO/IEC 14496-12 structure
(spec layout also documented in Apple's QuickTime File Format docs):
``ftyp``/``moov``/``mvhd``/``trak``/``tkhd``/``mdia``/``mdhd``/``hdlr``/
``minf``/``stbl``, with FULL sample-table resolution — ``stsd`` sample
entry (codec fourcc + visual width/height), ``stts`` decode timestamps,
``stsc`` sample→chunk runs, ``stsz`` sizes, ``stco``/``co64`` chunk
offsets (64-bit offsets matter: a 100 TB corpus has >4 GiB files) —
enough to locate any frame's exact byte range without ffmpeg.

Frame PAYLOAD decode is real for Motion-JPEG tracks (``jpeg`` sample
entries: each sample is a complete baseline JPEG, decoded by
``jpeg.py``). Compressed inter-frame codecs (``avc1``/``hev1``/``mp4v``)
surface per-frame ``decode_ok=False`` — parsing those bitstreams is the
one remaining honest stub, now shrunk from "all video" to "compressed
video codec payloads". Container metadata (duration, dimensions, frame
count, codec) is real for every well-formed MP4.

Spark shape: :func:`frame_sample` is ``mapInPandas`` over the video rows
only (filter pushed before the UDF), one Arrow batch of payloads at a
time, emitting small feature rows — the binary column never shuffles.

Reference analog: none (the reference has no media surface); this is
part of the training-data-pipeline family the build plan adds on top.
"""

from __future__ import annotations

import struct
from bisect import bisect_right
from dataclasses import dataclass, field
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from diffsync_spark.functions.jpeg import decode_jpeg_features, encode_jpeg


# ------------------------------------------------------------------ parsing
@dataclass
class Mp4Track:
    handler: str                 # 'vide' / 'soun' / ...
    codec: str                   # stsd sample-entry fourcc, e.g. 'jpeg'
    width: int | None
    height: int | None
    timescale: int
    duration: int                # in track timescale units
    sample_sizes: list[int] = field(default_factory=list)
    sample_offsets: list[int] = field(default_factory=list)
    sample_times: list[int] = field(default_factory=list)  # decode times


@dataclass
class Mp4Info:
    brand: str
    timescale: int
    duration_ms: int
    tracks: list[Mp4Track]

    def video_track(self) -> Mp4Track | None:
        for t in self.tracks:
            if t.handler == "vide":
                return t
        return None


def _boxes(buf: bytes, start: int, end: int) -> Iterator[tuple[bytes, int, int]]:
    """Yield (type, payload_start, payload_end) for each box in [start, end).
    Handles 64-bit largesize (size==1) and to-end-of-file (size==0)."""
    pos = start
    while pos + 8 <= end:
        (size,) = struct.unpack(">I", buf[pos:pos + 4])
        btype = buf[pos + 4:pos + 8]
        hdr = 8
        if size == 1:
            if pos + 16 > end:
                raise ValueError("truncated largesize box")
            (size,) = struct.unpack(">Q", buf[pos + 8:pos + 16])
            hdr = 16
        elif size == 0:
            size = end - pos
        if size < hdr or pos + size > end:
            raise ValueError(f"bad box size {size} for {btype!r}")
        yield btype, pos + hdr, pos + size
        pos += size


def _find(buf: bytes, start: int, end: int, btype: bytes) -> tuple[int, int] | None:
    for t, s, e in _boxes(buf, start, end):
        if t == btype:
            return s, e
    return None


def _fullbox(buf: bytes, s: int) -> tuple[int, int]:
    """(version, flags) of a full box whose payload starts at s."""
    version = buf[s]
    flags = int.from_bytes(buf[s + 1:s + 4], "big")
    return version, flags


def _parse_mvhd(buf: bytes, s: int) -> tuple[int, int]:
    v, _ = _fullbox(buf, s)
    if v == 1:
        timescale, duration = struct.unpack(">IQ", buf[s + 20:s + 32])
    else:
        timescale, duration = struct.unpack(">II", buf[s + 12:s + 20])
    return timescale, duration


def _parse_mdhd(buf: bytes, s: int) -> tuple[int, int]:
    v, _ = _fullbox(buf, s)
    if v == 1:
        timescale, duration = struct.unpack(">IQ", buf[s + 20:s + 32])
    else:
        timescale, duration = struct.unpack(">II", buf[s + 12:s + 20])
    return timescale, duration


def _parse_tkhd(buf: bytes, s: int, e: int) -> tuple[int | None, int | None]:
    # width/height are the LAST two 16.16 fixed-point fields of tkhd
    w16, h16 = struct.unpack(">II", buf[e - 8:e])
    w, h = w16 >> 16, h16 >> 16
    return (w or None), (h or None)


def _parse_stsd(buf: bytes, s: int, e: int) -> tuple[str, int | None, int | None]:
    """First sample entry's (fourcc, width, height); width/height only for
    visual entries (VisualSampleEntry layout, 14496-12 §12.1.3)."""
    (n,) = struct.unpack(">I", buf[s + 4:s + 8])
    if n < 1:
        return "", None, None
    es = s + 8                      # first sample entry box
    (esize,) = struct.unpack(">I", buf[es:es + 4])
    fourcc = buf[es + 4:es + 8].decode("latin-1")
    width = height = None
    # SampleEntry header: 6 reserved + 2 data_ref_index after the box
    # header; VisualSampleEntry then has 16 predefined/reserved bytes
    # before width(2)/height(2)
    if esize >= 8 + 8 + 16 + 4:
        w, h = struct.unpack(">HH", buf[es + 32:es + 36])
        if 0 < w <= 16384 and 0 < h <= 16384:
            width, height = w, h
    return fourcc, width, height


def _parse_stts(buf: bytes, s: int) -> list[tuple[int, int]]:
    (n,) = struct.unpack(">I", buf[s + 4:s + 8])
    out = []
    for i in range(n):
        cnt, delta = struct.unpack(">II", buf[s + 8 + 8 * i:s + 16 + 8 * i])
        out.append((cnt, delta))
    return out


def _parse_stsc(buf: bytes, s: int) -> list[tuple[int, int]]:
    (n,) = struct.unpack(">I", buf[s + 4:s + 8])
    out = []
    for i in range(n):
        first, per, _sdi = struct.unpack(
            ">III", buf[s + 8 + 12 * i:s + 20 + 12 * i]
        )
        out.append((first, per))
    return out


def _parse_stsz(buf: bytes, s: int) -> list[int]:
    size, n = struct.unpack(">II", buf[s + 4:s + 12])
    if size != 0:
        return [size] * n
    return list(struct.unpack(f">{n}I", buf[s + 12:s + 12 + 4 * n]))


def _parse_stco(buf: bytes, s: int, wide: bool) -> list[int]:
    (n,) = struct.unpack(">I", buf[s + 4:s + 8])
    fmt, step = (">Q", 8) if wide else (">I", 4)
    return [
        struct.unpack(fmt, buf[s + 8 + step * i:s + 8 + step * (i + 1)])[0]
        for i in range(n)
    ]


def _resolve_samples(
    stsc: list[tuple[int, int]], stco: list[int], sizes: list[int]
) -> list[int]:
    """Per-sample byte offsets from the chunk map (14496-12 §8.7.4): each
    stsc run (first_chunk, samples_per_chunk) applies until the next run's
    first_chunk; samples within a chunk are contiguous."""
    offsets: list[int] = []
    n_chunks = len(stco)
    si = 0
    for ri, (first, per) in enumerate(stsc):
        last = stsc[ri + 1][0] - 1 if ri + 1 < len(stsc) else n_chunks
        for chunk in range(first, last + 1):
            pos = stco[chunk - 1]
            for _ in range(per):
                if si >= len(sizes):
                    return offsets
                offsets.append(pos)
                pos += sizes[si]
                si += 1
    return offsets


def parse_mp4(payload: bytes) -> Mp4Info:
    """Parse the container structure. Raises ValueError on malformed
    input — callers surface that as a per-row ``decode_ok=False``."""
    end = len(payload)
    brand = ""
    ftyp = _find(payload, 0, end, b"ftyp")
    if ftyp:
        brand = payload[ftyp[0]:ftyp[0] + 4].decode("latin-1")
    moov = _find(payload, 0, end, b"moov")
    if not moov:
        raise ValueError("no moov box")
    mvhd = _find(payload, moov[0], moov[1], b"mvhd")
    if not mvhd:
        raise ValueError("no mvhd box")
    timescale, duration = _parse_mvhd(payload, mvhd[0])
    duration_ms = int(round(1000 * duration / timescale)) if timescale else 0

    tracks: list[Mp4Track] = []
    for t, s, e in _boxes(payload, moov[0], moov[1]):
        if t != b"trak":
            continue
        tkhd = _find(payload, s, e, b"tkhd")
        width = height = None
        if tkhd:
            width, height = _parse_tkhd(payload, *tkhd)
        mdia = _find(payload, s, e, b"mdia")
        if not mdia:
            continue
        mdhd = _find(payload, mdia[0], mdia[1], b"mdhd")
        hdlr = _find(payload, mdia[0], mdia[1], b"hdlr")
        tts, tdur = _parse_mdhd(payload, mdhd[0]) if mdhd else (timescale, 0)
        handler = (
            payload[hdlr[0] + 8:hdlr[0] + 12].decode("latin-1") if hdlr else ""
        )
        minf = _find(payload, mdia[0], mdia[1], b"minf")
        stbl = _find(payload, minf[0], minf[1], b"stbl") if minf else None
        codec = ""
        sizes: list[int] = []
        offsets: list[int] = []
        times: list[int] = []
        if stbl:
            stsd = _find(payload, stbl[0], stbl[1], b"stsd")
            if stsd:
                codec, sw, sh = _parse_stsd(payload, *stsd)
                width, height = sw or width, sh or height
            stsz = _find(payload, stbl[0], stbl[1], b"stsz")
            stsc = _find(payload, stbl[0], stbl[1], b"stsc")
            stco = _find(payload, stbl[0], stbl[1], b"stco")
            co64 = _find(payload, stbl[0], stbl[1], b"co64")
            stts = _find(payload, stbl[0], stbl[1], b"stts")
            if stsz and stsc and (stco or co64):
                sizes = _parse_stsz(payload, stsz[0])
                chunk_offs = (
                    _parse_stco(payload, co64[0], wide=True)
                    if co64 else _parse_stco(payload, stco[0], wide=False)
                )
                offsets = _resolve_samples(
                    _parse_stsc(payload, stsc[0]), chunk_offs, sizes
                )
            if stts:
                t_acc = 0
                for cnt, delta in _parse_stts(payload, stts[0]):
                    for _ in range(cnt):
                        times.append(t_acc)
                        t_acc += delta
        tracks.append(
            Mp4Track(handler, codec, width, height, tts, tdur,
                     sizes, offsets, times)
        )
    return Mp4Info(brand, timescale, duration_ms, tracks)


# -------------------------------------------------------------- frame access
def sample_video_frames(
    payload: bytes, every_ms: int, feat_dim: int
) -> list[tuple[int, int, int | None, int | None, list[float], bool]]:
    """Frame samples at t = 0, every_ms, 2*every_ms, … ≤ duration: rows of
    (frame_idx, frame_ts_ms, width, height, feat, decode_ok). For each
    sample point, the frame with the greatest decode time ≤ t is located
    via the sample table and its exact byte range sliced from the payload;
    'jpeg' tracks decode for real, compressed codecs yield
    decode_ok=False rows (metadata still real). Raises ValueError only on
    a malformed CONTAINER."""
    info = parse_mp4(payload)
    trk = info.video_track()
    if trk is None or not trk.sample_offsets or not trk.sample_times:
        raise ValueError("no playable video track")
    dur_ms = int(round(1000 * trk.duration / trk.timescale)) \
        if trk.timescale else 0
    out = []
    n = min(len(trk.sample_offsets), len(trk.sample_sizes),
            len(trk.sample_times))
    for k, t_ms in enumerate(range(0, max(dur_ms, 1), max(every_ms, 1))):
        target = t_ms * trk.timescale // 1000
        idx = bisect_right(trk.sample_times, target, hi=n) - 1
        if idx < 0:
            idx = 0
        off, size = trk.sample_offsets[idx], trk.sample_sizes[idx]
        frame = payload[off:off + size]
        ts_ms = int(round(1000 * trk.sample_times[idx] / trk.timescale))
        if trk.codec == "jpeg" and len(frame) == size:
            try:
                w, h, feat = decode_jpeg_features(frame, feat_dim)
                out.append((idx, ts_ms, w, h, feat, True))
                continue
            except Exception:
                pass
        out.append((idx, ts_ms, trk.width, trk.height, [], False))
    return out


FRAME_SCHEMA = (
    "asset_id long, frame_idx int, frame_ts_ms int, width int, height int, "
    "feat array<float>, decode_ok boolean"
)


def frame_sample(
    assets: DataFrame, every_ms: int = 1000, feat_dim: int = 8
) -> DataFrame:
    """Real frame sampling over a video asset column: parse each MP4's
    sample table, slice the frames nearest t = 0, every_ms, …, and decode
    MJPEG payloads with the built-in JPEG codec. The video filter is a
    JVM-side predicate BEFORE the UDF (only video payload bytes enter
    Arrow), and only small feature rows come out."""
    vids = assets.filter(F.col("kind") == "video").select(
        "asset_id", "payload"
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = {k: [] for k in ("asset_id", "frame_idx", "frame_ts_ms",
                                    "width", "height", "feat", "decode_ok")}
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                data = bytes(payload) if payload is not None else b""
                try:
                    samples = sample_video_frames(data, every_ms, feat_dim)
                except Exception:
                    samples = [(0, 0, None, None, [], False)]
                for idx, ts_ms, w, h, feat, ok in samples:
                    rows["asset_id"].append(aid)
                    rows["frame_idx"].append(idx)
                    rows["frame_ts_ms"].append(ts_ms)
                    rows["width"].append(w)
                    rows["height"].append(h)
                    rows["feat"].append([float(x) for x in feat])
                    rows["decode_ok"].append(ok)
            yield pd.DataFrame(rows)

    return vids.mapInPandas(batches, schema=FRAME_SCHEMA)


# ------------------------------------------------------------------- muxing
def _box(btype: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + btype + payload


def _fbox(btype: bytes, version: int, flags: int, payload: bytes) -> bytes:
    return _box(
        btype, bytes([version]) + flags.to_bytes(3, "big") + payload
    )


def encode_mp4_mjpeg(
    frames: "list[np.ndarray]",
    fps: int = 10,
    timescale: int = 1000,
    samples_per_chunk: int = 3,
    use_co64: bool = False,
    codec: str = "jpeg",
    quant: int = 2,
) -> bytes:
    """A REAL (if minimal) ISO BMFF mux of Motion-JPEG: each frame is
    baseline-encoded by ``jpeg.py`` and becomes one sample; samples are
    grouped ``samples_per_chunk`` per chunk so stsc/stco resolution is
    genuinely exercised; ``use_co64`` writes 64-bit chunk offsets.
    ``codec`` overrides the sample-entry fourcc (e.g. 'avc1' to build an
    unsupported-codec fixture). Fixture/test helper — the parser above is
    the product surface."""
    if not frames:
        raise ValueError("need at least one frame")
    blobs = [encode_jpeg(f, quant=quant) for f in frames]
    h, w = frames[0].shape[:2]
    n = len(blobs)
    delta = max(timescale // fps, 1)
    duration = n * delta

    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 0x200) + b"isommp41")
    mdat_payload = b"".join(blobs)
    mdat_start = len(ftyp) + 8  # file offset of the first sample

    # chunk offsets: groups of samples_per_chunk contiguous samples
    sizes = [len(b) for b in blobs]
    chunk_offs = []
    pos = mdat_start
    for i in range(0, n, samples_per_chunk):
        chunk_offs.append(pos)
        pos += sum(sizes[i:i + samples_per_chunk])

    mvhd = _fbox(b"mvhd", 0, 0, struct.pack(
        ">IIII", 0, 0, timescale, duration
    ) + struct.pack(">I", 0x00010000) + struct.pack(">H", 0x0100)
        + b"\x00" * 10
        + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + b"\x00" * 24 + struct.pack(">I", 2))
    tkhd = _fbox(b"tkhd", 0, 7, struct.pack(
        ">IIIII", 0, 0, 1, 0, duration
    ) + b"\x00" * 16
        + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + struct.pack(">II", w << 16, h << 16))
    mdhd = _fbox(b"mdhd", 0, 0, struct.pack(
        ">IIIIHH", 0, 0, timescale, duration, 0x55C4, 0
    ))
    hdlr = _fbox(b"hdlr", 0, 0,
                 struct.pack(">I", 0) + b"vide" + b"\x00" * 12 + b"mjpeg\x00")
    entry = (
        struct.pack(">I", 86) + codec.encode("latin-1")[:4].ljust(4, b"\x00")
        + b"\x00" * 6 + struct.pack(">H", 1)          # data_ref_index
        + b"\x00" * 16                                # predefined/reserved
        + struct.pack(">HH", w, h)
        + struct.pack(">II", 0x480000, 0x480000)      # 72 dpi
        + struct.pack(">I", 0) + struct.pack(">H", 1)  # frame_count
        + b"\x00" * 32                                # compressor name
        + struct.pack(">Hh", 24, -1)                  # depth, color table
    )
    stsd = _fbox(b"stsd", 0, 0, struct.pack(">I", 1) + entry)
    stts = _fbox(b"stts", 0, 0, struct.pack(">III", 1, n, delta))
    stsc_runs = [(1, samples_per_chunk)]
    rem = n % samples_per_chunk
    if rem and n > samples_per_chunk:
        stsc_runs.append((len(chunk_offs), rem))
    elif rem:
        stsc_runs = [(1, rem)]
    stsc = _fbox(b"stsc", 0, 0, struct.pack(">I", len(stsc_runs)) + b"".join(
        struct.pack(">III", first, per, 1) for first, per in stsc_runs
    ))
    stsz = _fbox(b"stsz", 0, 0, struct.pack(">II", 0, n)
                 + struct.pack(f">{n}I", *sizes))
    if use_co64:
        stco = _fbox(b"co64", 0, 0, struct.pack(">I", len(chunk_offs))
                     + b"".join(struct.pack(">Q", o) for o in chunk_offs))
    else:
        stco = _fbox(b"stco", 0, 0, struct.pack(">I", len(chunk_offs))
                     + b"".join(struct.pack(">I", o) for o in chunk_offs))
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)
    dref = _fbox(b"dref", 0, 0, struct.pack(">I", 1)
                 + _fbox(b"url ", 0, 1, b""))
    dinf = _box(b"dinf", dref)
    vmhd = _fbox(b"vmhd", 0, 1, struct.pack(">HHHH", 0, 0, 0, 0))
    minf = _box(b"minf", vmhd + dinf + stbl)
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    trak = _box(b"trak", tkhd + mdia)
    moov = _box(b"moov", mvhd + trak)
    return ftyp + _box(b"mdat", mdat_payload) + moov
