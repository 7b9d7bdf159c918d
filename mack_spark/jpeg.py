"""JPEG (ITU T.81 huffman DCT) codec in numpy — baseline AND
progressive.

Nearly every real image corpus is stored as JPEG; without it the
multimodal operators could only read their metadata. This module
decodes — and, for byte-stable test goldens and deterministic fake
corpora, encodes — huffman-coded JFIF with nothing beyond the
stdlib + numpy:

* marker walk (SOI/APP*/DQT/SOF0/SOF1/SOF2/DHT/DRI/SOS/EOI), 8-bit
  and 16-bit quant tables, multiple tables per segment;
* canonical huffman decoding from the file's own DHT segments;
* restart markers (DRI / RSTn) with DC-predictor + bit-alignment +
  EOB-run resets;
* any sampling factors the spec allows (4:4:4, 4:2:2, 4:2:0, ...)
  with nearest-neighbor chroma upsampling;
* PROGRESSIVE (SOF2, T.81 Annex G): multi-scan decoding with
  spectral selection AND successive approximation — DC first/refine,
  AC first/refine with EOB runs, interleaved DC scans,
  non-interleaved per-component AC scans (the spec's rule), tables
  redefined between scans;
* exact float IDCT/FDCT as an 8×8 orthonormal basis product (no
  integer approximations — determinism beats speed here);
* JFIF YCbCr↔RGB (BT.601 full range), grayscale passthrough.

Arithmetic coding (SOF9+), lossless and hierarchical modes raise
:class:`ImageFormatError` at the fence, same as the mp4a/avc1 codec
boundary — honest refusal, never a wrong pixel.

The encoders write the Annex K example tables (quant scaled by the
libjpeg quality formula, the standard huffman tables) — but the
decoder always reads tables from the file, so the two halves stay
independent evidence in round-trip tests. The PROGRESSIVE encoder
emits a libjpeg-style scan script (coarse DC, banded AC, then
refinement passes down to full precision), so a progressive encode
decodes to EXACTLY the same pixels as the baseline encode of the same
image — the round-trip oracle the tests pin.

SCALE: runs inside Arrow-batched ``mapInPandas`` workers, one image
per batch row; the distribution shape is identical to the other
codecs in :mod:`mack_spark.codecs`.
"""

from __future__ import annotations

import struct
from typing import Dict, List, Optional, Tuple

import numpy as np

from mack_spark.codecs import ImageFormatError

__all__ = [
    "decode_jpeg", "encode_jpeg_baseline", "encode_jpeg_progressive",
]

# raster index of the i-th zigzag scan position (T.81 figure A.6)
ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

# orthonormal 8-point DCT-II basis: spatial = C.T @ coef @ C
_C = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _C[_k, _n] = np.cos((2 * _n + 1) * _k * np.pi / 16.0)
_C[0, :] *= np.sqrt(1.0 / 8.0)
_C[1:, :] *= np.sqrt(2.0 / 8.0)


# ------------------------------------------------------------- bit reader


class _BitReader:
    """MSB-first bit reader over a DE-STUFFED entropy segment."""

    __slots__ = ("data", "pos", "bit")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.bit = 0

    def read_bit(self) -> int:
        if self.pos >= len(self.data):
            raise ImageFormatError("truncated JPEG entropy data")
        b = (self.data[self.pos] >> (7 - self.bit)) & 1
        self.bit += 1
        if self.bit == 8:
            self.bit = 0
            self.pos += 1
        return b

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v


def _extend(v: int, s: int) -> int:
    """T.81 EXTEND: map the s-bit magnitude code to its signed value."""
    if s == 0:
        return 0
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


class _HuffTable:
    """Canonical huffman table from a DHT (bits, values)."""

    __slots__ = ("mincode", "maxcode", "valptr", "vals")

    def __init__(self, counts: List[int], vals: bytes):
        # counts[i] = number of codes of length i+1 (16 entries)
        if len(counts) != 16 or len(vals) < sum(counts):
            raise ImageFormatError("truncated JPEG DHT segment")
        self.mincode = [0] * 17
        self.maxcode = [-1] * 17
        self.valptr = [0] * 17
        self.vals = vals
        code, k = 0, 0
        for ln in range(1, 17):
            if counts[ln - 1]:
                self.valptr[ln] = k
                self.mincode[ln] = code
                code += counts[ln - 1]
                k += counts[ln - 1]
                self.maxcode[ln] = code - 1
            code <<= 1

    def decode(self, br: _BitReader) -> int:
        code = 0
        for ln in range(1, 17):
            code = (code << 1) | br.read_bit()
            if self.maxcode[ln] >= 0 and code <= self.maxcode[ln]:
                i = self.valptr[ln] + code - self.mincode[ln]
                if i >= len(self.vals):  # truncated DHT segment
                    raise ImageFormatError(
                        "JPEG huffman table shorter than its counts"
                    )
                return self.vals[i]
        raise ImageFormatError("invalid huffman code in JPEG stream")


# ---------------------------------------------------------------- decoder


def _destuff(data: bytes) -> List[bytes]:
    """Split the entropy-coded segment at RSTn markers and remove byte
    stuffing (FF 00 → FF). Returns the list of restart intervals."""
    intervals: List[bytes] = []
    cur = bytearray()
    i, n = 0, len(data)
    while i < n:
        b = data[i]
        if b != 0xFF:
            cur.append(b)
            i += 1
            continue
        if i + 1 >= n:
            break
        m = data[i + 1]
        if m == 0x00:
            cur.append(0xFF)
            i += 2
        elif 0xD0 <= m <= 0xD7:
            intervals.append(bytes(cur))
            cur = bytearray()
            i += 2
        else:
            break  # a real marker ends the scan
    intervals.append(bytes(cur))
    return intervals


def _entropy_end(data: bytes, start: int) -> int:
    """Offset of the first REAL marker after ``start`` (skipping byte
    stuffing FF 00, restart markers, and FF fill bytes) — where a
    progressive scan's entropy-coded segment ends."""
    i, n = start, len(data)
    while i < n - 1:
        if data[i] != 0xFF:
            i += 1
            continue
        m = data[i + 1]
        if m == 0x00 or 0xD0 <= m <= 0xD7:
            i += 2
        elif m == 0xFF:
            i += 1  # fill byte
        else:
            return i
    return n


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Decode huffman JFIF — sequential baseline OR progressive — to
    ``(h, w, c)`` uint8 (c = 3 for YCbCr color, 1 for grayscale)."""
    data = bytes(payload)
    if data[:2] != b"\xff\xd8":
        raise ImageFormatError("not a JPEG (missing SOI)")
    qt: Dict[int, np.ndarray] = {}
    huff: Dict[Tuple[int, int], _HuffTable] = {}
    restart_interval = 0
    frame = None  # (h, w, comps) from SOF
    progressive = False
    coef = None  # progressive coefficient store, built at first SOS
    i = 2
    n = len(data)
    while i < n:
        if data[i] != 0xFF:
            raise ImageFormatError(f"expected marker at offset {i}")
        marker = data[i + 1]
        i += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue  # standalone
        if i + 2 > n:
            raise ImageFormatError("truncated JPEG segment header")
        seglen = struct.unpack(">H", data[i:i + 2])[0]
        seg = data[i + 2:i + seglen]
        nxt = i + seglen
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0x0F
                p += 1
                if pq == 0:
                    tbl = np.frombuffer(
                        seg[p:p + 64], dtype=np.uint8
                    ).astype(np.int32)
                    p += 64
                else:
                    tbl = np.frombuffer(
                        seg[p:p + 128], dtype=">u2"
                    ).astype(np.int32)
                    p += 128
                qt[tq] = tbl
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0x0F
                counts = list(seg[p + 1:p + 17])
                nv = sum(counts)
                vals = seg[p + 17:p + 17 + nv]
                huff[(tc, th)] = _HuffTable(counts, vals)
                p += 17 + nv
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", seg[:2])[0]
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 sequential, SOF2 prog.
            precision = seg[0]
            if precision != 8:
                raise ImageFormatError(
                    f"{precision}-bit JPEG not supported (8-bit only)"
                )
            h, w = struct.unpack(">HH", seg[1:5])
            ncomp = seg[5]
            comps = []
            for c in range(ncomp):
                cid, hv, tq = seg[6 + 3 * c], seg[7 + 3 * c], seg[8 + 3 * c]
                comps.append({
                    "id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq,
                })
            frame = (h, w, comps)
            progressive = marker == 0xC2
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise ImageFormatError(
                f"JPEG mode SOF{marker - 0xC0} (lossless/arithmetic/"
                "hierarchical) is not supported — huffman sequential"
                " and progressive only"
            )
        elif marker == 0xDA:  # SOS — entropy data follows
            if frame is None:
                raise ImageFormatError("JPEG SOS before SOF")
            ns = seg[0]
            scan = []
            for c in range(ns):
                cs, tt = seg[1 + 2 * c], seg[2 + 2 * c]
                scan.append({"cs": cs, "td": tt >> 4, "ta": tt & 0x0F})
            if not progressive:
                return _decode_scan(
                    data[nxt:], frame, scan, qt, huff, restart_interval
                )
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            ahal = seg[3 + 2 * ns]
            ah, al = ahal >> 4, ahal & 0x0F
            if coef is None:
                coef = _ProgState(frame)
            end = _entropy_end(data, nxt)
            _decode_prog_scan(
                data[nxt:end], frame, scan, ss, se, ah, al,
                huff, restart_interval, coef,
            )
            i = end
            continue
        i = nxt
    if progressive and coef is not None:
        return _reconstruct_from_coefs(frame, coef, qt)
    raise ImageFormatError("JPEG has no SOS scan")


def _decode_scan(ecs, frame, scan, qt, huff, restart_interval):
    h, w, comps = frame
    by_id = {c["id"]: c for c in comps}
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    # per-component coefficient planes (in blocks)
    planes = {}
    for c in comps:
        planes[c["id"]] = np.zeros(
            (mcuy * c["v"] * 8, mcux * c["h"] * 8), dtype=np.float64
        )
    order = [by_id[s["cs"]] for s in scan]
    tabs = {s["cs"]: (s["td"], s["ta"]) for s in scan}
    intervals = _destuff(ecs)
    n_mcu = mcux * mcuy
    per_int = restart_interval if restart_interval else n_mcu
    mcu = 0
    it = iter(intervals)
    br = _BitReader(next(it))
    pred = {c["id"]: 0 for c in comps}
    left = per_int
    while mcu < n_mcu:
        if left == 0:
            try:
                br = _BitReader(next(it))
            except StopIteration:
                raise ImageFormatError(
                    "JPEG restart interval missing RST marker"
                ) from None
            pred = {c["id"]: 0 for c in comps}
            left = per_int
        my, mx = divmod(mcu, mcux)
        for c in order:
            td, ta = tabs[c["id"]]
            dc_t = huff.get((0, td))
            ac_t = huff.get((1, ta))
            if dc_t is None or ac_t is None:
                raise ImageFormatError("JPEG scan references missing DHT")
            q = qt.get(c["tq"])
            if q is None:
                raise ImageFormatError("JPEG scan references missing DQT")
            for by in range(c["v"]):
                for bx in range(c["h"]):
                    zz = np.zeros(64, dtype=np.int32)
                    s = dc_t.decode(br)
                    diff = _extend(br.read_bits(s), s) if s else 0
                    pred[c["id"]] += diff
                    zz[0] = pred[c["id"]]
                    k = 1
                    while k < 64:
                        rs = ac_t.decode(br)
                        r, s = rs >> 4, rs & 0x0F
                        if s == 0:
                            if r == 15:
                                k += 16  # ZRL
                                continue
                            break  # EOB
                        k += r
                        if k > 63:
                            raise ImageFormatError(
                                "JPEG AC run past block end"
                            )
                        zz[k] = _extend(br.read_bits(s), s)
                        k += 1
                    # dequantize in zigzag order (DQT tables are stored
                    # zigzag), then scatter to raster positions
                    block = np.zeros(64, dtype=np.float64)
                    block[ZIGZAG] = (zz * q).astype(np.float64)
                    spatial = _C.T @ block.reshape(8, 8) @ _C
                    py = (my * c["v"] + by) * 8
                    px = (mx * c["h"] + bx) * 8
                    planes[c["id"]][py:py + 8, px:px + 8] = spatial
        mcu += 1
        left -= 1
    return _assemble_image(
        [planes[c["id"]] for c in comps], comps, h, w, hmax, vmax
    )


def _assemble_image(raw_planes, comps, h, w, hmax, vmax) -> np.ndarray:
    """Level shift, upsample, crop, and color-convert decoded
    component planes — shared by the sequential and progressive
    decoders (one copy of the BT.601 matrix)."""
    out = []
    for c, plane in zip(comps, raw_planes):
        p = plane + 128.0
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
        out.append(np.clip(p[:h, :w], 0, 255))
    if len(out) == 1:
        return out[0].round().astype(np.uint8)[:, :, None]
    if len(out) != 3:
        raise ImageFormatError(
            f"{len(out)}-component JPEG not supported (1 or 3)"
        )
    y, cb, cr = out
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(rgb, 0, 255).round().astype(np.uint8)


# ------------------------------------------------------- progressive decode


class _ProgState:
    """Per-component quantized-coefficient store for progressive
    decoding (T.81 Annex G): scans accumulate into these planes; the
    IDCT runs ONCE at EOI. Blocks are laid out on the interleaved MCU
    grid; non-interleaved scans index the component's own block window
    inside it."""

    __slots__ = ("blocks", "mcux", "mcuy", "ni_dims")

    def __init__(self, frame):
        h, w, comps = frame
        hmax = max(c["h"] for c in comps)
        vmax = max(c["v"] for c in comps)
        self.mcux = (w + 8 * hmax - 1) // (8 * hmax)
        self.mcuy = (h + 8 * vmax - 1) // (8 * vmax)
        self.blocks: Dict[int, np.ndarray] = {}
        self.ni_dims: Dict[int, Tuple[int, int]] = {}
        for c in comps:
            bh = self.mcuy * c["v"]
            bw = self.mcux * c["h"]
            self.blocks[c["id"]] = np.zeros((bh, bw, 64), dtype=np.int32)
            # non-interleaved window (G.1: ceil of the component's own
            # sample dimensions, NOT the padded MCU grid)
            cw = (w * c["h"] + 8 * hmax - 1) // (8 * hmax)
            ch = (h * c["v"] + 8 * vmax - 1) // (8 * vmax)
            self.ni_dims[c["id"]] = (ch, cw)


def _decode_prog_scan(
    ecs, frame, scan, ss, se, ah, al, huff, restart_interval, st,
):
    """One progressive scan (T.81 G.2): DC first/refine (Ss=0,
    interleaved or single-component), AC first/refine (Ss>0, single
    component only — the spec's rule) with EOB runs. Restart intervals
    reset the DC predictors, the EOB run, and bit alignment."""
    _h, _w, comps = frame
    by_id = {c["id"]: c for c in comps}
    order = [by_id[s["cs"]] for s in scan]
    tabs = {s["cs"]: (s["td"], s["ta"]) for s in scan}
    is_dc = ss == 0
    if is_dc and se != 0:
        raise ImageFormatError("JPEG DC scan with Se != 0")
    if not is_dc and len(scan) != 1:
        raise ImageFormatError(
            "progressive AC scan must be single-component"
        )
    if not is_dc and (ss > se or se > 63):
        raise ImageFormatError("bad progressive spectral band")

    # the scan's unit sequence: MCUs (interleaved) or single blocks
    if len(scan) > 1:
        n_units = st.mcux * st.mcuy
    else:
        c = order[0]
        ch, cw = st.ni_dims[c["id"]]
        n_units = ch * cw
    intervals = _destuff(ecs)
    per_int = restart_interval if restart_interval else n_units
    it = iter(intervals)
    br = _BitReader(next(it))
    pred = {c["id"]: 0 for c in comps}
    eobrun = 0
    left = per_int
    for unit in range(n_units):
        if left == 0:
            try:
                br = _BitReader(next(it))
            except StopIteration:
                raise ImageFormatError(
                    "JPEG restart interval missing RST marker"
                ) from None
            pred = {c["id"]: 0 for c in comps}
            eobrun = 0
            left = per_int
        if is_dc:
            if len(scan) > 1:
                my, mx = divmod(unit, st.mcux)
                for c in order:
                    td = tabs[c["id"]][0]
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            _prog_dc_block(
                                br, st.blocks[c["id"]],
                                my * c["v"] + by, mx * c["h"] + bx,
                                huff.get((0, td)), pred, c["id"], ah, al,
                            )
            else:
                c = order[0]
                ch, cw = st.ni_dims[c["id"]]
                byy, bxx = divmod(unit, cw)
                _prog_dc_block(
                    br, st.blocks[c["id"]], byy, bxx,
                    huff.get((0, tabs[c["id"]][0])), pred, c["id"],
                    ah, al,
                )
        else:
            c = order[0]
            ch, cw = st.ni_dims[c["id"]]
            byy, bxx = divmod(unit, cw)
            ac_t = huff.get((1, tabs[c["id"]][1]))
            if ah == 0:
                eobrun = _prog_ac_first_block(
                    br, st.blocks[c["id"]], byy, bxx, ac_t,
                    ss, se, al, eobrun,
                )
            else:
                eobrun = _prog_ac_refine_block(
                    br, st.blocks[c["id"]], byy, bxx, ac_t,
                    ss, se, al, eobrun,
                )
        left -= 1


def _prog_dc_block(br, blocks, byy, bxx, dc_t, pred, cid, ah, al):
    if ah == 0:  # first pass: huffman diff at reduced precision
        if dc_t is None:
            raise ImageFormatError("JPEG scan references missing DHT")
        s = dc_t.decode(br)
        diff = _extend(br.read_bits(s), s) if s else 0
        pred[cid] += diff
        blocks[byy, bxx, 0] = pred[cid] << al
    else:  # refinement: one bit
        if br.read_bit():
            blocks[byy, bxx, 0] = int(blocks[byy, bxx, 0]) | (1 << al)


def _prog_ac_first_block(br, blocks, byy, bxx, ac_t, ss, se, al, eobrun):
    if eobrun > 0:
        return eobrun - 1
    if ac_t is None:
        raise ImageFormatError("JPEG scan references missing DHT")
    blk = blocks[byy, bxx]
    k = ss
    while k <= se:
        rs = ac_t.decode(br)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r < 15:
                eobrun = (1 << r) - 1
                if r:
                    eobrun += br.read_bits(r)
                return eobrun
            k += 16  # ZRL
            continue
        k += r
        if k > se:
            raise ImageFormatError("JPEG AC run past band end")
        blk[k] = _extend(br.read_bits(s), s) << al
        k += 1
    return 0


def _prog_ac_refine_block(br, blocks, byy, bxx, ac_t, ss, se, al, eobrun):
    """AC successive-approximation refinement (T.81 G.2.2 / the
    libjpeg decode_mcu_AC_refine shape): runs count only ZERO-history
    coefficients; every nonzero-history coefficient passed over reads
    one correction bit; blocks inside an EOB run still read correction
    bits for their nonzero band coefficients."""
    if ac_t is None:
        raise ImageFormatError("JPEG scan references missing DHT")
    p1 = 1 << al
    blk = blocks[byy, bxx]
    k = ss

    def correct(c: int) -> int:
        if br.read_bit() and (c & p1) == 0:
            return c + (p1 if c >= 0 else -p1)
        return c

    if eobrun == 0:
        while k <= se:
            rs = ac_t.decode(br)
            r, s = rs >> 4, rs & 0x0F
            val = 0
            if s == 0:
                if r < 15:
                    # unlike AC-first, the EOB run INCLUDES the current
                    # block: its remaining nonzero coefficients still
                    # read correction bits in the tail below
                    eobrun = 1 << r
                    if r:
                        eobrun += br.read_bits(r)
                    break
                # ZRL: skip 16 zero-history coefficients
            else:
                if s != 1:
                    raise ImageFormatError(
                        "JPEG AC refinement magnitude must be 1"
                    )
                val = p1 if br.read_bit() else -p1
            while k <= se:
                c = int(blk[k])
                if c != 0:
                    blk[k] = correct(c)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if val != 0 and k <= se:
                blk[k] = val
            k += 1
    if eobrun > 0:
        while k <= se:
            c = int(blk[k])
            if c != 0:
                blk[k] = correct(c)
            k += 1
        eobrun -= 1
    return eobrun


def _reconstruct_from_coefs(frame, st, qt):
    """Dequantize + IDCT the accumulated progressive coefficients and
    assemble the image — one vectorized pass per component."""
    h, w, comps = frame
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    out = []
    for c in comps:
        q = qt.get(c["tq"])
        if q is None:
            raise ImageFormatError("JPEG scan references missing DQT")
        zz = st.blocks[c["id"]].astype(np.float64)  # (bh, bw, 64) zigzag
        raster = np.zeros_like(zz)
        raster[..., ZIGZAG] = zz * q.astype(np.float64)
        bh, bw = raster.shape[:2]
        blocks = raster.reshape(bh, bw, 8, 8)
        spatial = np.einsum("ij,xyjk,kl->xyil", _C.T, blocks, _C)
        out.append(spatial.transpose(0, 2, 1, 3).reshape(bh * 8, bw * 8))
    return _assemble_image(out, comps, h, w, hmax, vmax)


# ---------------------------------------------------------------- encoder

# Annex K example quantization tables (T.81 tables K.1 / K.2)
_Q_LUM = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int32)
_Q_CHR = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int32)

# Annex K huffman tables: (counts per code length 1..16, symbol values)
_DC_LUM = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
           bytes(range(12)))
_DC_CHR = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
           bytes(range(12)))
_AC_LUM = ([0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D], bytes([
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]))
_AC_CHR = ([0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77], bytes([
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]))


def _scaled_q(base: np.ndarray, quality: int) -> np.ndarray:
    quality = max(1, min(100, int(quality)))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((base * scale + 50) // 100, 1, 255).astype(np.int32)


def _code_map(counts: List[int], vals: bytes) -> Dict[int, Tuple[int, int]]:
    """symbol → (code, length) for canonical encoding."""
    out: Dict[int, Tuple[int, int]] = {}
    code, k = 0, 0
    for ln in range(1, 17):
        for _ in range(counts[ln - 1]):
            out[vals[k]] = (code, ln)
            code += 1
            k += 1
        code <<= 1
    return out


class _BitWriter:
    __slots__ = ("buf", "acc", "nbits")

    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.buf.append(b)
            if b == 0xFF:
                self.buf.append(0x00)  # byte stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1-bits


def _magnitude(v: int) -> Tuple[int, int]:
    """(size, amplitude-code) for the signed value ``v``."""
    if v == 0:
        return 0, 0
    a = abs(v)
    s = a.bit_length()
    code = v if v > 0 else v + (1 << s) - 1
    return s, code


def _encode_block(
    bw: _BitWriter, block: np.ndarray, q: np.ndarray,
    dc_map, ac_map, pred: int,
) -> int:
    coef = _C @ block @ _C.T  # forward DCT of level-shifted block
    zz = np.round(coef.flatten()[ZIGZAG] / q).astype(np.int64)
    dc = int(zz[0])
    s, code = _magnitude(dc - pred)
    c, ln = dc_map[s]
    bw.write(c, ln)
    if s:
        bw.write(code, s)
    run = 0
    last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
    for k in range(1, 64):
        if k > last_nz:
            c, ln = ac_map[0x00]  # EOB
            bw.write(c, ln)
            break
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            c, ln = ac_map[0xF0]  # ZRL
            bw.write(c, ln)
            run -= 16
        s, code = _magnitude(v)
        c, ln = ac_map[(run << 4) | s]
        bw.write(c, ln)
        bw.write(code, s)
        run = 0
    return dc


def _prepare_planes(img: np.ndarray, subsample: str):
    """RGB→YCbCr + chroma subsampling shared by both encoders.
    Returns (planes, samp, h, w, gray)."""
    img = np.asarray(img, dtype=np.float64)
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, nc = img.shape
    gray = nc == 1
    if not gray and nc != 3:
        raise ImageFormatError(f"cannot encode {nc}-channel image")
    if subsample not in ("444", "420"):
        raise ImageFormatError(f"unsupported subsampling {subsample!r}")
    if gray:
        return [img[:, :, 0]], [(1, 1)], h, w, True
    r, g, b = img[:, :, 0], img[:, :, 1], img[:, :, 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    if subsample == "420":
        # pad to even, then 2×2 mean
        ph, pw = (h + 1) // 2 * 2, (w + 1) // 2 * 2

        def _half(p):
            pp = np.pad(p, ((0, ph - h), (0, pw - w)), mode="edge")
            return pp.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))

        return [y, _half(cb), _half(cr)], [(2, 2), (1, 1), (1, 1)], h, w, \
            False
    return [y, cb, cr], [(1, 1), (1, 1), (1, 1)], h, w, False


def encode_jpeg_baseline(
    img: np.ndarray, quality: int = 90, subsample: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """Encode ``(h, w, 3)`` RGB or ``(h, w[, 1])`` grayscale uint8 to
    sequential-baseline JFIF. ``subsample``: '444' or '420' (chroma).
    ``restart_interval`` > 0 emits DRI + RSTn markers every that many
    MCUs (exercises the decoder's restart path)."""
    planes, samp, h, w, gray = _prepare_planes(img, subsample)
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    q_lum = _scaled_q(_Q_LUM, quality)     # zigzag-ordered on write
    q_chr = _scaled_q(_Q_CHR, quality)
    # tables are stored in ZIGZAG order in DQT; _Q_* above are raster —
    # convert once (decoder multiplies zigzag coefficients directly)
    q_lum_z = q_lum[ZIGZAG]
    q_chr_z = q_chr[ZIGZAG]
    dc_lum = _code_map(*_DC_LUM)
    ac_lum = _code_map(*_AC_LUM)
    dc_chr = _code_map(*_DC_CHR)
    ac_chr = _code_map(*_AC_CHR)

    ncomp = 1 if gray else 3
    out = _write_headers(
        0xC0, h, w, samp, gray, q_lum_z, q_chr_z, restart_interval
    )
    out += b"\xff\xda" + struct.pack(">H", 6 + 2 * ncomp) + bytes([ncomp])
    for ci in range(ncomp):
        out += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
    out += b"\x00\x3f\x00"  # Ss/Se/AhAl for sequential

    # pad planes to full sampling grids
    padded = []
    for ci, p in enumerate(planes):
        sh, sv = samp[ci]
        th_, tw_ = mcuy * sv * 8, mcux * sh * 8
        ph, pw = p.shape
        padded.append(np.pad(
            p, ((0, th_ - ph), (0, tw_ - pw)), mode="edge"
        ) - 128.0)
    bw = _BitWriter()
    pred = [0] * ncomp
    rst = 0
    n_mcu = mcux * mcuy
    for mcu in range(n_mcu):
        if restart_interval and mcu and mcu % restart_interval == 0:
            bw.flush()
            out += bw.buf
            bw = _BitWriter()
            out += bytes([0xFF, 0xD0 + (rst % 8)])
            rst += 1
            pred = [0] * ncomp
        my, mx = divmod(mcu, mcux)
        for ci in range(ncomp):
            sh, sv = samp[ci]
            qz = q_lum_z if ci == 0 else q_chr_z
            dcm = dc_lum if ci == 0 else dc_chr
            acm = ac_lum if ci == 0 else ac_chr
            for by in range(sv):
                for bx in range(sh):
                    py = (my * sv + by) * 8
                    px = (mx * sh + bx) * 8
                    blk = padded[ci][py:py + 8, px:px + 8]
                    pred[ci] = _encode_block(
                        bw, blk, qz, dcm, acm, pred[ci]
                    )
    bw.flush()
    out += bw.buf
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def _write_headers(
    sof_marker, h, w, samp, gray, q_lum_z, q_chr_z, restart_interval
) -> bytearray:
    """SOI through DRI — the header block both encoders share; only
    the SOF marker differs (C0 sequential, C2 progressive)."""
    ncomp = 1 if gray else 3
    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" \
        + struct.pack(">HH", 1, 1) + b"\x00\x00"
    for tq, qz in ((0, q_lum_z),) + (() if gray else ((1, q_chr_z),)):
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tq]) \
            + bytes(int(v) for v in qz)
    out += bytes([0xFF, sof_marker]) + struct.pack(">H", 8 + 3 * ncomp) \
        + b"\x08" + struct.pack(">HH", h, w) + bytes([ncomp])
    for ci in range(ncomp):
        sh, sv = samp[ci]
        out += bytes([ci + 1, (sh << 4) | sv, 0 if ci == 0 else 1])
    for tc, th, (counts, vals) in (
        (0, 0, _DC_LUM), (1, 0, _AC_LUM),
    ) + (() if gray else ((0, 1, _DC_CHR), (1, 1, _AC_CHR))):
        out += b"\xff\xc4" + struct.pack(">H", 19 + len(vals)) \
            + bytes([(tc << 4) | th]) + bytes(counts) + vals
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">H", 4) \
            + struct.pack(">H", restart_interval)
    return out


# ------------------------------------------------------ progressive encoder


def _quantized_blocks(plane, q_z, bh, bw_):
    """FDCT + quantize one padded component plane into an
    ``(bh, bw, 64)`` int32 array of ZIGZAG coefficients."""
    th_, tw_ = bh * 8, bw_ * 8
    ph, pw = plane.shape
    p = np.pad(
        plane, ((0, th_ - ph), (0, tw_ - pw)), mode="edge"
    ) - 128.0
    blocks = p.reshape(bh, 8, bw_, 8).transpose(0, 2, 1, 3)
    coefs = np.einsum("ij,xyjk,kl->xyil", _C, blocks, _C.T)
    flat = coefs.reshape(bh, bw_, 64)[..., ZIGZAG]
    return np.round(flat / q_z.astype(np.float64)).astype(np.int32)


def _enc_dc_scan(out, coefs, comp_ids, samp, mcux, mcuy, dc_maps,
                 ah, al, restart_interval):
    """DC scan entropy (first pass: huffman diffs of dc >> Al;
    refinement: one bit per block), interleaved MCU order."""
    bw = _BitWriter()
    pred = [0] * len(comp_ids)
    rst = 0
    for mcu in range(mcux * mcuy):
        if restart_interval and mcu and mcu % restart_interval == 0:
            bw.flush()
            out += bw.buf
            bw = _BitWriter()
            out += bytes([0xFF, 0xD0 + (rst % 8)])
            rst += 1
            pred = [0] * len(comp_ids)
        my, mx = divmod(mcu, mcux)
        for ci in range(len(comp_ids)):
            sh, sv = samp[ci]
            for by in range(sv):
                for bx in range(sh):
                    dc = int(coefs[ci][my * sv + by, mx * sh + bx, 0])
                    if ah == 0:
                        v = dc >> al  # arithmetic shift (T.81 DC rule)
                        s, code = _magnitude(v - pred[ci])
                        c, ln = dc_maps[ci][s]
                        bw.write(c, ln)
                        if s:
                            bw.write(code, s)
                        pred[ci] = v
                    else:
                        bw.write((dc >> al) & 1, 1)
    bw.flush()
    out += bw.buf


def _enc_ac_first_block(bw, blk, ac_map, ss, se, al):
    r = 0
    for k in range(ss, se + 1):
        v = int(blk[k])
        t = (abs(v) >> al)  # AC point transform truncates toward zero
        if t == 0:
            r += 1
            continue
        while r > 15:
            c, ln = ac_map[0xF0]
            bw.write(c, ln)
            r -= 16
        s, code = _magnitude(t if v > 0 else -t)
        c, ln = ac_map[(r << 4) | s]
        bw.write(c, ln)
        bw.write(code, s)
        r = 0
    if r > 0:
        c, ln = ac_map[0x00]  # EOB (run length 1 — no EOBRUN batching)
        bw.write(c, ln)


def _enc_ac_refine_block(bw, blk, ac_map, ss, se, al):
    """The libjpeg encode_mcu_AC_refine shape: ``t = |coef| >> Al``;
    t == 1 is NEWLY significant (emit run+sign), t > 1 is history
    (buffer its correction bit ``t & 1``); runs count zero-history
    positions only; ZRL only before the last newly-significant index;
    a trailing EOB carries the buffered correction bits."""
    absv = [abs(int(blk[k])) >> al for k in range(ss, se + 1)]
    eob = 0  # index AFTER the last newly-significant coefficient
    for idx, t in enumerate(absv):
        if t == 1:
            eob = idx + 1
    r = 0
    pending: List[int] = []
    for idx, t in enumerate(absv):
        if t == 0:
            r += 1
            continue
        while r > 15 and idx < eob:
            c, ln = ac_map[0xF0]
            bw.write(c, ln)
            r -= 16
            for b in pending:
                bw.write(b, 1)
            pending = []
        if t > 1:
            pending.append(t & 1)
            continue
        c, ln = ac_map[(r << 4) | 1]
        bw.write(c, ln)
        r = 0
        bw.write(1 if int(blk[ss + idx]) > 0 else 0, 1)
        for b in pending:
            bw.write(b, 1)
        pending = []
    if r > 0 or pending:
        c, ln = ac_map[0x00]
        bw.write(c, ln)
        for b in pending:
            bw.write(b, 1)


def _enc_ac_scan(out, coefs_c, ni, ac_map, ss, se, ah, al,
                 restart_interval):
    """One single-component AC scan over the component's
    non-interleaved block window."""
    ch, cw = ni
    bw = _BitWriter()
    rst = 0
    for unit in range(ch * cw):
        if restart_interval and unit and unit % restart_interval == 0:
            bw.flush()
            out += bw.buf
            bw = _BitWriter()
            out += bytes([0xFF, 0xD0 + (rst % 8)])
            rst += 1
        byy, bxx = divmod(unit, cw)
        blk = coefs_c[byy, bxx]
        if ah == 0:
            _enc_ac_first_block(bw, blk, ac_map, ss, se, al)
        else:
            _enc_ac_refine_block(bw, blk, ac_map, ss, se, al)
    bw.flush()
    out += bw.buf


def encode_jpeg_progressive(
    img: np.ndarray, quality: int = 90, subsample: str = "444",
    restart_interval: int = 0, separate_dc: bool = False,
) -> bytes:
    """Encode to PROGRESSIVE JFIF (SOF2) with a libjpeg-style scan
    script: coarse DC, banded AC at reduced precision, then successive
    refinement down to full precision — so the decode equals the
    baseline encode's decode EXACTLY (same quantized coefficients),
    which is the round-trip oracle the tests pin."""
    planes, samp, h, w, gray = _prepare_planes(img, subsample)
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    q_lum_z = _scaled_q(_Q_LUM, quality)[ZIGZAG]
    q_chr_z = _scaled_q(_Q_CHR, quality)[ZIGZAG]
    ncomp = 1 if gray else 3
    coefs = []
    ni = []
    for ci in range(ncomp):
        sh, sv = samp[ci]
        coefs.append(_quantized_blocks(
            planes[ci], q_lum_z if ci == 0 else q_chr_z,
            mcuy * sv, mcux * sh,
        ))
        ni.append((
            (h * sv + 8 * vmax - 1) // (8 * vmax),
            (w * sh + 8 * hmax - 1) // (8 * hmax),
        ))
    dc_maps = [_code_map(*(_DC_LUM if ci == 0 else _DC_CHR))
               for ci in range(ncomp)]
    ac_maps = [_code_map(*(_AC_LUM if ci == 0 else _AC_CHR))
               for ci in range(ncomp)]

    out = _write_headers(
        0xC2, h, w, samp, gray, q_lum_z, q_chr_z, restart_interval
    )

    def sos(comp_list, ss, se, ah, al):
        out.extend(b"\xff\xda")
        out.extend(struct.pack(">H", 6 + 2 * len(comp_list)))
        out.append(len(comp_list))
        for ci in comp_list:
            td = 0 if ci == 0 else 1
            out.append(ci + 1)
            out.append((td << 4) | td)
        out.extend(bytes([ss, se, (ah << 4) | al]))

    all_comps = list(range(ncomp))
    if separate_dc and subsample != "444" and not gray:
        raise ImageFormatError(
            "separate_dc needs 4:4:4 (per-component DC block order"
            " equals the MCU grid only without subsampling)"
        )

    def dc_scan(comp_list, ah, al):
        # T.81 allows DC scans per component too (ns=1, block raster
        # order) — exercised via separate_dc to cover the decoder's
        # non-interleaved DC path on color frames
        if separate_dc:
            for ci in comp_list:
                sos([ci], 0, 0, ah, al)
                _enc_dc_scan(out, [coefs[ci]], [0],
                             [samp[ci]], mcux, mcuy, [dc_maps[ci]],
                             ah, al, restart_interval)
        else:
            sos(comp_list, 0, 0, ah, al)
            _enc_dc_scan(out, coefs, comp_list, samp, mcux, mcuy,
                         dc_maps, ah, al, restart_interval)

    # scan script: DC first (Al=1) → banded AC firsts → refinements
    dc_scan(all_comps, 0, 1)
    if gray:
        script = [(0, 1, 63, 0, 1), (0, 1, 63, 1, 0)]
    else:
        script = [
            (0, 1, 5, 0, 2),
            (1, 1, 63, 0, 1),
            (2, 1, 63, 0, 1),
            (0, 6, 63, 0, 2),
            (0, 1, 63, 2, 1),
            (1, 1, 63, 1, 0),
            (2, 1, 63, 1, 0),
            (0, 1, 63, 1, 0),
        ]
    for ci, ss, se, ah, al in script:
        sos([ci], ss, se, ah, al)
        _enc_ac_scan(out, coefs[ci], ni[ci], ac_maps[ci], ss, se, ah,
                     al, restart_interval)
    # final DC refinement to full precision
    dc_scan(all_comps, 1, 0)
    out += b"\xff\xd9"
    return bytes(out)
