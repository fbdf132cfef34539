"""JPEG codec — pure Python + numpy, no PIL.

Scope (honest): baseline sequential DCT (SOF0) AND progressive DCT (SOF2,
ITU T.81 Annex G: spectral selection, successive approximation, EOB-run
coding, interleaved DC scans + non-interleaved AC scans), 8-bit samples,
grayscale or 3-component YCbCr with sampling factors in {1, 2} (4:4:4 and
4:2:0 tested), Huffman entropy coding with tables read from the stream's
own DHT segments, 8- or 16-bit quantization tables, restart intervals
(DRI/RSTn resync with DC-predictor and EOB-run resets), no arithmetic
coding, no hierarchical/lossless modes — unsupported
features raise ``ValueError`` and surface as the multimodal layer's
per-row ``decode_ok=False``, never a crash.

Both directions are implemented so the test fixtures are REAL encodings:
``encode_jpeg`` writes a spec-shaped stream (JFIF APP0, DQT, SOF0/SOF2,
DHT, SOS, byte-stuffed entropy data) that ``decode_jpeg`` — and any
external decoder — can read. ``progressive=True`` emits a 4-scan-class
plan (DC first with successive-approximation Al=1, DC refinement, then
per-component AC spectral bands with real EOB-run codes), so the
progressive decode paths are exercised by genuine multi-scan streams;
the AC-refinement path (G.1.2.3), which the encoder does not emit, is
pinned by a hand-assembled bitstream test. The decoder never assumes the
encoder's tables: everything comes from the file. Self-oracle risk (a bug
mirrored in both directions) is covered in tests by HAND-ASSEMBLED
bitstreams with analytically-known pixels (DC-only blocks: IDCT of S00
alone is exactly S00/8 + 128) plus the invariant that a progressive
encode of the same quantized coefficients decodes BIT-IDENTICAL to the
baseline encode.

Reference behavior parity: the reference ships no media handling at all;
this exists for SURVEY §2.13's multimodal plumbing, where the decode step
must be a real per-batch Arrow kernel, not a placeholder.
"""

from __future__ import annotations

import struct

import numpy as np

# zig-zag scan order (ITU T.81 Figure 5): ZIGZAG[i] = raster index of the
# i-th coefficient in scan order
ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

# 8-point DCT basis: spatial = C.T @ coeff @ C ; coeff = C @ spatial @ C.T
_X = np.arange(8)
_C = 0.5 * np.cos((2 * _X[None, :] + 1) * _X[:, None] * np.pi / 16)
_C[0, :] *= 1 / np.sqrt(2)

# Huffman tables written by the ENCODER (read back from DHT by any
# decoder). Compact custom tables covering every symbol the encoder can
# emit — NOT the Annex K defaults; baseline decoders read tables from the
# stream, so interop only requires spec-shaped DHT segments, which these
# are. DC: categories 0..11. AC: all (run, size) pairs with size 1..10,
# run 0..15, plus EOB (0x00) and ZRL (0xF0).
_DC_BITS = [0, 0, 2, 2, 3, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0]
_DC_VALS = list(range(12))
_AC_BITS = [0, 1, 1, 2, 3, 4, 8, 16, 32, 95, 0, 0, 0, 0, 0, 0]
_AC_VALS = (
    [0x00, 0xF0]
    + [(r << 4) | s for s in range(1, 11) for r in range(16)]
)
assert sum(_AC_BITS) == len(_AC_VALS) == 162

# Progressive AC table: same symbols plus the EOBn run-length codes
# (r<<4 | 0 for r = 1..14, T.81 G.1.2.2) at length 11. Kraft sum 1932/2048
# — a valid prefix code per Annex C.
_PROG_AC_BITS = [0, 1, 1, 2, 3, 4, 8, 16, 32, 95, 14, 0, 0, 0, 0, 0]
_PROG_AC_VALS = _AC_VALS + [r << 4 for r in range(1, 15)]
assert sum(_PROG_AC_BITS) == len(_PROG_AC_VALS) == 176


def _build_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) per T.81 Annex C code assignment."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _decode_table(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol, for bit-serial decoding."""
    return {
        (length, code): sym
        for sym, (code, length) in _build_codes(bits, vals).items()
    }


class _BitReader:
    """MSB-first reader over entropy-coded data with 0xFF00 un-stuffing."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.bit = 0
        self.cur = 0

    def read_bit(self) -> int:
        if self.bit == 0:
            if self.pos >= len(self.data):
                raise ValueError("truncated entropy data")
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                if self.pos >= len(self.data):
                    raise ValueError("truncated after 0xFF")
                marker = self.data[self.pos]
                if marker == 0x00:
                    self.pos += 1  # stuffed byte
                else:
                    raise ValueError(
                        f"unexpected marker 0xFF{marker:02X} inside "
                        "entropy data"
                    )
            self.cur = b
            self.bit = 8
        self.bit -= 1
        return (self.cur >> self.bit) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def read_symbol(self, table: dict[tuple[int, int], int]) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code")

    def restart(self) -> None:
        """Byte-align and consume the next RSTn marker (T.81 E.1.4:
        restart markers are the only byte-aligned resync points inside
        entropy data; pad bits — and a stuffed 0x00 after an all-ones pad
        byte — may precede them)."""
        self.bit = 0  # drop pad bits of the current byte
        while self.pos + 1 < len(self.data):
            if (self.data[self.pos] == 0xFF
                    and 0xD0 <= self.data[self.pos + 1] <= 0xD7):
                self.pos += 2
                return
            self.pos += 1
        raise ValueError("missing restart marker")


def _extend(v: int, t: int) -> int:
    """RECEIVE/EXTEND (T.81 F.2.2.1): map magnitude bits to signed value."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def _block_ac_first(reader, coef, ss, se, al, ac_tbl, eobrun) -> int:
    """Progressive AC first scan for one block (T.81 G.1.2.2). ``coef`` is
    the block's raster-order int32[64]; returns the updated EOB run."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = reader.read_symbol(ac_tbl)
        r, s = rs >> 4, rs & 0xF
        if s == 0:
            if r == 15:
                k += 16  # ZRL
                continue
            eobrun = (1 << r) - 1  # this block counts as one of the run
            if r:
                eobrun += reader.read_bits(r)
            break
        k += r
        if k > se:
            raise ValueError("AC run past band end")
        coef[ZIGZAG[k]] = _extend(reader.read_bits(s), s) << al
        k += 1
    return eobrun


def _block_ac_refine(reader, coef, ss, se, al, ac_tbl, eobrun) -> int:
    """Progressive AC refinement for one block (T.81 G.1.2.3): newly
    nonzero coefficients arrive with size 1; already-nonzero ones receive
    one correction bit each as the scan passes them."""
    p1 = 1 << al
    m1 = -1 << al

    def correct(k: int) -> None:
        if reader.read_bit() and not (coef[ZIGZAG[k]] & p1):
            coef[ZIGZAG[k]] += p1 if coef[ZIGZAG[k]] >= 0 else m1

    k = ss
    if eobrun == 0:
        while k <= se:
            rs = reader.read_symbol(ac_tbl)
            r, s = rs >> 4, rs & 0xF
            if s == 0:
                if r != 15:
                    eobrun = 1 << r
                    if r:
                        eobrun += reader.read_bits(r)
                    break
                val = 0  # ZRL: skip 16 zero-history coefficients
            else:
                if s != 1:
                    raise ValueError("refinement size must be 1")
                val = p1 if reader.read_bit() else m1
            while k <= se:
                if coef[ZIGZAG[k]]:
                    correct(k)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if val and k <= se:
                coef[ZIGZAG[k]] = val
            k += 1
    if eobrun > 0:
        while k <= se:
            if coef[ZIGZAG[k]]:
                correct(k)
            k += 1
        eobrun -= 1
    return eobrun


def _block_sequential(reader, coef, dc_tbl, ac_tbl, pred) -> int:
    """Baseline scan for one block: DC diff + AC run/size to the end."""
    t = reader.read_symbol(dc_tbl)
    pred += _extend(reader.read_bits(t), t)
    coef[0] = pred
    k = 1
    while k < 64:
        rs = reader.read_symbol(ac_tbl)
        r, s = rs >> 4, rs & 0xF
        if s == 0:
            if r == 15:
                k += 16  # ZRL
                continue
            break        # EOB
        k += r
        if k > 63:
            raise ValueError("AC run past block end")
        coef[ZIGZAG[k]] = _extend(reader.read_bits(s), s)
        k += 1
    return pred


def _decode_scan(reader, scan_comps, progressive, ss, se, ah, al,
                 huff_dc, huff_ac, mcux, mcuy, ri=0) -> None:
    """Decode one entropy-coded scan into the components' coefficient
    arrays. Baseline: the full interleaved DC+AC pass. Progressive: DC
    scans (first/refinement, interleaved or not) and single-component AC
    band scans (first/refinement with EOB runs). ``ri`` is the restart
    interval (DRI, in MCUs for interleaved scans / blocks otherwise):
    every ``ri`` units the entropy stream byte-aligns on an RSTn marker
    and DC predictors (and the EOB run) reset."""
    for c in scan_comps:
        c["pred"] = 0

    n_done = 0

    def maybe_restart() -> bool:
        """True when a restart boundary was crossed (state must reset)."""
        nonlocal n_done
        hit = bool(ri) and n_done > 0 and n_done % ri == 0
        if hit:
            reader.restart()
            for c in scan_comps:
                c["pred"] = 0
        n_done += 1
        return hit

    if not progressive:
        if len(scan_comps) > 1:
            for my in range(mcuy):
                for mx in range(mcux):
                    maybe_restart()
                    for c in scan_comps:
                        for by in range(c["v"]):
                            for bx in range(c["h"]):
                                c["pred"] = _block_sequential(
                                    reader,
                                    c["coef"][my * c["v"] + by,
                                              mx * c["h"] + bx],
                                    huff_dc[c["td"]], huff_ac[c["ta"]],
                                    c["pred"],
                                )
        else:
            c = scan_comps[0]
            for by in range(c["cbh"]):
                for bx in range(c["cbw"]):
                    maybe_restart()
                    c["pred"] = _block_sequential(
                        reader, c["coef"][by, bx],
                        huff_dc[c["td"]], huff_ac[c["ta"]], c["pred"],
                    )
        return
    if ss == 0:  # DC scan (se must be 0): interleaved iff ns > 1
        if se != 0:
            raise ValueError("progressive DC scan must have Se=0")

        def dc_block(c, by, bx):
            coef = c["coef"][by, bx]
            if ah == 0:  # first DC scan (with point transform Al)
                t = reader.read_symbol(huff_dc[c["td"]])
                c["pred"] += _extend(reader.read_bits(t), t)
                coef[0] = c["pred"] << al
            else:        # refinement: one bit appends to the magnitude
                if reader.read_bit():
                    coef[0] |= 1 << al

        if len(scan_comps) > 1:
            for my in range(mcuy):
                for mx in range(mcux):
                    maybe_restart()
                    for c in scan_comps:
                        for by in range(c["v"]):
                            for bx in range(c["h"]):
                                dc_block(c, my * c["v"] + by,
                                         mx * c["h"] + bx)
        else:
            c = scan_comps[0]
            for by in range(c["cbh"]):
                for bx in range(c["cbw"]):
                    maybe_restart()
                    dc_block(c, by, bx)
        return
    # AC scan: T.81 G.1.1 — never interleaved
    if len(scan_comps) != 1:
        raise ValueError("progressive AC scan must be single-component")
    c = scan_comps[0]
    ac_tbl = huff_ac[c["ta"]]
    block_fn = _block_ac_first if ah == 0 else _block_ac_refine
    eobrun = 0
    for by in range(c["cbh"]):
        for bx in range(c["cbw"]):
            if maybe_restart():
                eobrun = 0
            eobrun = block_fn(
                reader, c["coef"][by, bx], ss, se, al, ac_tbl, eobrun
            )


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Decode a baseline (SOF0) or progressive (SOF2) JPEG to an
    (h, w, ch) uint8 array (ch 1 or 3). Scans accumulate into per-block
    coefficient arrays; dequantization + IDCT run once at EOI, so the
    multi-scan progressive refinement and the single baseline scan share
    one reconstruction path."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (no SOI)")
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    comps: list[dict] = []
    w = h = 0
    progressive = False
    mcux = mcuy = hmax = vmax = 0
    restart_interval = 0
    pos = 2
    saw_scan = False
    while True:
        if pos + 1 >= len(payload):
            if saw_scan:
                break  # tolerate a missing EOI after a complete scan
            raise ValueError("truncated before EOI")
        if payload[pos] != 0xFF:
            raise ValueError(f"bad marker alignment at {pos}")
        marker = payload[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue  # standalone
        (seg_len,) = struct.unpack(">H", payload[pos:pos + 2])
        seg = payload[pos + 2: pos + seg_len]
        pos += seg_len
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 0xF
                i += 1
                if pq == 0:
                    tbl = np.frombuffer(seg, np.uint8, 64, i).astype(np.int32)
                    i += 64
                else:
                    tbl = np.frombuffer(seg, ">u2", 64, i).astype(np.int32)
                    i += 128
                raster = np.zeros(64, np.int32)
                raster[ZIGZAG] = tbl
                qt[tq] = raster.reshape(8, 8)
        elif marker == 0xC4:  # DHT (tables may be redefined between scans)
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 0xF
                bits = list(seg[i + 1: i + 17])
                n = sum(bits)
                vals = list(seg[i + 17: i + 17 + n])
                (huff_dc if tc == 0 else huff_ac)[th] = _decode_table(bits, vals)
                i += 17 + n
        elif marker in (0xC0, 0xC2):  # SOF0 baseline / SOF2 progressive
            progressive = marker == 0xC2
            precision = seg[0]
            if precision != 8:
                raise ValueError(f"{precision}-bit JPEG unsupported")
            h, w = struct.unpack(">HH", seg[1:5])
            nc = seg[5]
            for c in range(nc):
                cid, hv, tq = seg[6 + 3 * c: 9 + 3 * c]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF,
                              "tq": tq})
            if len(comps) not in (1, 3):
                raise ValueError(f"{len(comps)}-component JPEG unsupported")
            hmax = max(c["h"] for c in comps)
            vmax = max(c["v"] for c in comps)
            mcux = -(-w // (8 * hmax))
            mcuy = -(-h // (8 * vmax))
            for c in comps:
                c["bw"] = mcux * c["h"]      # MCU-padded block grid
                c["bh"] = mcuy * c["v"]
                # non-interleaved (single-component-scan) block grid:
                # ceil(component dimension / 8), T.81 A.2.2
                cw = -(-(w * c["h"]) // hmax)
                chh = -(-(h * c["v"]) // vmax)
                c["cbw"] = -(-cw // 8)
                c["cbh"] = -(-chh // 8)
                c["coef"] = np.zeros((c["bh"], c["bw"], 64), np.int32)
        elif marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"SOF{marker - 0xC0}: only baseline/progressive supported"
            )
        elif marker == 0xDD:  # DRI: restart interval (may change per scan)
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS — decode this scan, then keep parsing
            if not comps or w == 0:
                raise ValueError("no SOF before SOS")
            ns = seg[0]
            scan_comps = []
            for s in range(ns):
                cs, tdta = seg[1 + 2 * s], seg[2 + 2 * s]
                for c in comps:
                    if c["id"] == cs:
                        c["td"], c["ta"] = tdta >> 4, tdta & 0xF
                        scan_comps.append(c)
            ss, se, ahal = seg[1 + 2 * ns: 4 + 2 * ns]
            ah, al = ahal >> 4, ahal & 0xF
            reader = _BitReader(payload, pos)
            _decode_scan(reader, scan_comps, progressive, ss, se, ah, al,
                         huff_dc, huff_ac, mcux, mcuy, restart_interval)
            saw_scan = True
            pos = reader.pos
            # skip pad bits/fill bytes to the next marker
            while pos + 1 < len(payload) and not (
                payload[pos] == 0xFF and payload[pos + 1] != 0x00
            ):
                pos += 1
        # APPn/COM/etc: skipped
    if not saw_scan:
        raise ValueError("EOI before any scan")

    planes = []
    for c in comps:
        # dequantize + IDCT every block at once
        blocks = (c["coef"] * qt[c["tq"]].reshape(64)).reshape(
            c["bh"], c["bw"], 8, 8
        ).astype(np.float64)
        spatial = np.einsum("xu,byuv,vw->byxw", _C.T, blocks, _C) + 128.0
        p = spatial.transpose(0, 2, 1, 3).reshape(c["bh"] * 8, c["bw"] * 8)
        # upsample subsampled chroma to full resolution (nearest)
        p = np.repeat(np.repeat(p, vmax // c["v"], axis=0),
                      hmax // c["h"], axis=1)
        planes.append(p[:h, :w])
    if len(planes) == 1:
        out = planes[0][..., None]
    else:
        y, cb, cr = planes
        r = y + 1.402 * (cr - 128.0)
        g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
        b = y + 1.772 * (cb - 128.0)
        out = np.stack([r, g, b], axis=-1)
    return np.clip(np.round(out), 0, 255).astype(np.uint8)


# ------------------------------------------------------------------ encoder

class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1s
        return bytes(self.out)

    def restart(self, m: int) -> None:
        """Byte-align (1-pad) and emit the RSTn marker, n = m mod 8."""
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)
        self.out += bytes([0xFF, 0xD0 + (m & 7)])


def _category(v: int) -> int:
    return int(abs(v)).bit_length()


def _encode_block(bw: _BitWriter, blk: np.ndarray, pred: int,
                  dc_codes: dict, ac_codes: dict) -> int:
    """Huffman-encode one quantized 8x8 block; returns the new DC pred."""
    zz = blk.reshape(64)[ZIGZAG]
    dc = int(zz[0])
    diff = dc - pred
    t = _category(diff)
    code, ln = dc_codes[t]
    bw.write(code, ln)
    if t:
        bw.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
    last = 63
    while last > 0 and zz[last] == 0:
        last -= 1
    run = 0
    for k in range(1, last + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_codes[0xF0]
            bw.write(code, ln)
            run -= 16
        s = _category(v)
        code, ln = ac_codes[(run << 4) | s]
        bw.write(code, ln)
        bw.write(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if last < 63:
        code, ln = ac_codes[0x00]  # EOB
        bw.write(code, ln)
    return dc


def _plane_blocks(plane: np.ndarray, bh: int, bw: int) -> np.ndarray:
    """Pad (edge-replicate) to exactly ``bh`` x ``bw`` 8x8 blocks — the MCU
    grid's demand, which can exceed the next 8-multiple when the component
    is the max-sampling one — and return blocks of shape (by, bx, 8, 8)."""
    ph, pw = bh * 8, bw * 8
    p = np.pad(plane, ((0, ph - plane.shape[0]), (0, pw - plane.shape[1])),
               mode="edge")
    return p.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3)


def _flush_eobrun(bw: _BitWriter, ac_codes: dict, eobrun: int) -> None:
    """Emit a pending EOB run as an EOBn symbol + extra bits (G.1.2.2)."""
    r = eobrun.bit_length() - 1
    code, ln = ac_codes[r << 4]
    bw.write(code, ln)
    if r:
        bw.write(eobrun - (1 << r), r)


def _encode_ac_first(bw: _BitWriter, zz: np.ndarray, ss: int, se: int,
                     ac_codes: dict, eobrun: int) -> int:
    """Progressive AC first-scan encoding of one block's band [ss..se]
    (Al=0); EOB runs accumulate across blocks and flush lazily."""
    last = se
    while last >= ss and zz[last] == 0:
        last -= 1
    if last < ss:  # all-zero band: extend the EOB run
        eobrun += 1
        if eobrun == 0x7FFF:  # 14-bit EOBn capacity
            _flush_eobrun(bw, ac_codes, eobrun)
            eobrun = 0
        return eobrun
    if eobrun:
        _flush_eobrun(bw, ac_codes, eobrun)
        eobrun = 0
    run = 0
    for k in range(ss, last + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_codes[0xF0]
            bw.write(code, ln)
            run -= 16
        s = _category(v)
        code, ln = ac_codes[(run << 4) | s]
        bw.write(code, ln)
        bw.write(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if last < se:
        eobrun = 1  # trailing zeros: an EOB, mergeable with later blocks
    return eobrun


def encode_jpeg(px: np.ndarray, quant: int = 8, subsample: bool = False,
                progressive: bool = False, restart_interval: int = 0) -> bytes:
    """Encode an (h, w) or (h, w, ch) uint8 array (ch 1 or 3) as JPEG.
    ``quant`` is a flat quantization value (1 = near-lossless up to DCT
    rounding); ``subsample=True`` writes 4:2:0 chroma.

    ``progressive=True`` writes SOF2 with a real multi-scan plan — an
    interleaved DC first scan under successive approximation (Al=1), a DC
    refinement scan, then per-component AC spectral bands 1–5 and 6–63
    with genuine EOB-run codes — and decodes BIT-IDENTICAL to the
    baseline encode of the same pixels (same quantized coefficients,
    different transmission order).

    ``restart_interval=N`` (baseline only) writes a DRI segment and an
    RSTn marker every N MCUs with DC-predictor resets — the resync
    structure real camera/MJPEG streams carry."""
    if progressive and restart_interval:
        raise ValueError("restart_interval only supported for baseline")
    if px.ndim == 2:
        px = px[..., None]
    h, w, ch = px.shape
    if ch not in (1, 3):
        raise ValueError("need 1 or 3 channels")
    f = px.astype(np.float64)
    if ch == 3:
        r, g, b = f[..., 0], f[..., 1], f[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
        cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
        if subsample:
            ph = -(-h // 2) * 2
            pw = -(-w // 2) * 2
            def _half(p):
                p = np.pad(p, ((0, ph - h), (0, pw - w)), mode="edge")
                return 0.25 * (p[0::2, 0::2] + p[1::2, 0::2]
                               + p[0::2, 1::2] + p[1::2, 1::2])
            planes = [y, _half(cb), _half(cr)]
            samp = [(2, 2), (1, 1), (1, 1)]
        else:
            planes = [y, cb, cr]
            samp = [(1, 1), (1, 1), (1, 1)]
    else:
        planes = [f[..., 0]]
        samp = [(1, 1)]

    qtbl = np.full((8, 8), quant, np.int32)
    dc_codes = _build_codes(_DC_BITS, _DC_VALS)
    if progressive:
        ac_codes = _build_codes(_PROG_AC_BITS, _PROG_AC_VALS)
        ac_bits, ac_vals = _PROG_AC_BITS, _PROG_AC_VALS
    else:
        ac_codes = _build_codes(_AC_BITS, _AC_VALS)
        ac_bits, ac_vals = _AC_BITS, _AC_VALS

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    zz_q = qtbl.reshape(64)[ZIGZAG].astype(np.uint8).tobytes()
    out = bytearray(b"\xff\xd8")
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xDB, bytes([0x00]) + zz_q)
    sof = struct.pack(">BHHB", 8, h, w, len(planes))
    for i, (sh, sv) in enumerate(samp):
        sof += bytes([i + 1, (sh << 4) | sv, 0])
    out += seg(0xC2 if progressive else 0xC0, sof)
    dht = bytes([0x00]) + bytes(_DC_BITS) + bytes(_DC_VALS)
    dht += bytes([0x10]) + bytes(ac_bits) + bytes(ac_vals)
    out += seg(0xC4, dht)

    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    # quantize every plane's blocks up front, padded to the MCU grid
    qblocks = []
    for p, (sh, sv) in zip(planes, samp):
        blocks = _plane_blocks(p - 128.0, mcuy * sv, mcux * sh)
        coeff = np.einsum("ux,byxw,wv->byuv", _C, blocks, _C.T)
        qblocks.append(np.round(coeff / qtbl).astype(np.int32))

    def sos_hdr(comp_ids: list[int], ss: int, se: int, ah: int, al: int) -> bytes:
        body = bytes([len(comp_ids)])
        for cid in comp_ids:
            body += bytes([cid, 0x00])  # Td=0, Ta=0
        body += bytes([ss, se, (ah << 4) | al])
        return seg(0xDA, body)

    if not progressive:
        if restart_interval:
            out += seg(0xDD, struct.pack(">H", restart_interval))
        out += sos_hdr(list(range(1, len(planes) + 1)), 0, 63, 0, 0)
        bw = _BitWriter()
        preds = [0] * len(planes)
        n_mcu = 0
        for my in range(mcuy):
            for mx in range(mcux):
                if (restart_interval and n_mcu
                        and n_mcu % restart_interval == 0):
                    bw.restart(n_mcu // restart_interval - 1)
                    preds = [0] * len(planes)
                n_mcu += 1
                for ci, (sh, sv) in enumerate(samp):
                    for by in range(sv):
                        for bx in range(sh):
                            blk = qblocks[ci][my * sv + by, mx * sh + bx]
                            preds[ci] = _encode_block(
                                bw, blk, preds[ci], dc_codes, ac_codes
                            )
        out += bw.flush()
        out += b"\xff\xd9"
        return bytes(out)

    # ---- progressive scan plan (SOF2) ----
    all_ids = list(range(1, len(planes) + 1))

    def mcu_blocks():
        for my in range(mcuy):
            for mx in range(mcux):
                for ci, (sh, sv) in enumerate(samp):
                    for by in range(sv):
                        for bx in range(sh):
                            yield ci, qblocks[ci][my * sv + by, mx * sh + bx]

    # non-interleaved (per-component) grid for the AC scans, T.81 A.2.2
    grids = []
    for sh, sv in samp:
        cw = -(-(w * sh) // hmax)
        chh = -(-(h * sv) // vmax)
        grids.append((-(-chh // 8), -(-cw // 8)))

    # scan 1: DC first, interleaved, successive approximation Al=1
    out += sos_hdr(all_ids, 0, 0, 0, 1)
    bw = _BitWriter()
    preds = [0] * len(planes)
    for ci, blk in mcu_blocks():
        dc = int(blk[0, 0]) >> 1          # point transform (arith shift)
        diff = dc - preds[ci]
        preds[ci] = dc
        t = _category(diff)
        code, ln = dc_codes[t]
        bw.write(code, ln)
        if t:
            bw.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
    out += bw.flush()

    # scan 2: DC refinement (Ah=1, Al=0): the deferred low bit per block
    out += sos_hdr(all_ids, 0, 0, 1, 0)
    bw = _BitWriter()
    for ci, blk in mcu_blocks():
        bw.write(int(blk[0, 0]) & 1, 1)
    out += bw.flush()

    # scans 3..: per-component AC spectral bands with EOB-run coding
    for ss, se in ((1, 5), (6, 63)):
        for ci in range(len(planes)):
            out += sos_hdr([ci + 1], ss, se, 0, 0)
            bw = _BitWriter()
            eobrun = 0
            cbh, cbw_ = grids[ci]
            for by in range(cbh):
                for bx in range(cbw_):
                    zz = qblocks[ci][by, bx].reshape(64)[ZIGZAG]
                    eobrun = _encode_ac_first(bw, zz, ss, se, ac_codes,
                                              eobrun)
            if eobrun:
                _flush_eobrun(bw, ac_codes, eobrun)
            out += bw.flush()

    out += b"\xff\xd9"
    return bytes(out)


def decode_jpeg_features(
    payload: bytes, feat_dim: int
) -> tuple[int, int, list[float]]:
    """(width, height, band-mean features) — same feature contract as the
    PPM/PNG codecs in multimodal.py."""
    px = decode_jpeg(payload)
    h, w = px.shape[:2]
    bands = np.array_split(px.astype(np.float64) / 255.0, feat_dim, axis=0)
    return w, h, [float(b.mean()) if b.size else 0.0 for b in bands]
