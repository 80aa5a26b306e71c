"""Baseline JPEG (DCT) codec for grayscale images — from scratch.

Removes the last codec stub in the multimodal pipeline: PDF images with
/Filter /DCTDecode ("dct") can now be really decoded, with no external
libraries — numpy does the 8x8 DCT math, everything else is the public
ITU-T T.81 baseline process:

* :func:`encode` — uint8 (h,w) -> JFIF bytes: level shift, 8x8 forward
  DCT-II (orthonormal matrix form), quantization with the Annex-K luminance
  table scaled by ``quality``, zigzag, DC differences + AC run-length,
  the Annex-K standard Huffman tables, 0xFF byte stuffing.
* :func:`decode` — SOI/DQT/SOF0/DHT/SOS/DRI marker parse, Huffman + RLE
  decode, dequantize, inverse DCT, clamp. Baseline sequential, single
  component (grayscale); progressive/subsampled color raise ValueError.

Determinism: both directions are pure integer/float numpy ops with fixed
tables — encode(x) and decode(encode(x)) are bit-stable across hosts, so
oracle queries can recompute expected pixels driver-side.
"""

from __future__ import annotations

import struct
from typing import Dict, List, Tuple

import numpy as np

# --------------------------------------------------------------------------
# Tables (ITU-T T.81 Annex K — public spec data)
# --------------------------------------------------------------------------

STD_LUMA_QUANT = np.array(
    [
        [16, 11, 10, 16, 24, 40, 51, 61],
        [12, 12, 14, 19, 26, 58, 60, 55],
        [14, 13, 16, 24, 40, 57, 69, 56],
        [14, 17, 22, 29, 51, 87, 80, 62],
        [18, 22, 37, 56, 68, 109, 103, 77],
        [24, 35, 55, 64, 81, 104, 113, 92],
        [49, 64, 78, 87, 103, 121, 120, 101],
        [72, 92, 95, 98, 112, 100, 103, 99],
    ],
    dtype=np.int32,
)

# DC luminance: BITS (codes per length 1..16) + HUFFVAL
DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_VALS = list(range(12))
# AC luminance
AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]

_ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ]
)

# orthonormal DCT-II matrix
_C = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _C[_k, _n] = np.cos(np.pi * (2 * _n + 1) * _k / 16.0) * (
            np.sqrt(0.125) if _k == 0 else 0.5
        )


def _build_codes(bits: List[int], vals: List[int]) -> Dict[int, Tuple[int, int]]:
    """symbol -> (code, length) per the canonical JPEG code assignment."""
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _build_decoder(bits: List[int], vals: List[int]) -> Dict[Tuple[int, int], int]:
    """(length, code) -> symbol."""
    enc = _build_codes(bits, vals)
    return {(ln, c): sym for sym, (c, ln) in enc.items()}


_DC_ENC = _build_codes(DC_BITS, DC_VALS)
_AC_ENC = _build_codes(AC_BITS, AC_VALS)


def _quant_table(quality: int) -> np.ndarray:
    quality = min(max(int(quality), 1), 100)
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    q = (STD_LUMA_QUANT * scale + 50) // 100
    return np.clip(q, 1, 255).astype(np.int32)


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
            byte = (self.acc >> self.nbits) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.out.append(0x00)

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1s


def _magnitude(v: int) -> Tuple[int, int]:
    """(category, code bits) for a DC diff / AC coefficient value."""
    if v == 0:
        return 0, 0
    a = abs(v)
    cat = a.bit_length()
    code = v if v > 0 else v + (1 << cat) - 1
    return cat, code


def _emit_block(bw: "_BitWriter", block: np.ndarray, q: np.ndarray,
                prev_dc: int) -> int:
    """DCT + quantize + Huffman-code one 8x8 block; returns the new DC
    predictor."""
    coef = _C @ block @ _C.T
    quant = np.round(coef / q).astype(np.int64)
    zz = quant.flatten()[_ZIGZAG]
    diff = int(zz[0]) - prev_dc
    prev_dc = int(zz[0])
    cat, code = _magnitude(diff)
    hc, hl = _DC_ENC[cat]
    bw.write(hc, hl)
    if cat:
        bw.write(code, cat)
    run = 0
    last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
    for i in range(1, 64):
        v = int(zz[i])
        if v == 0:
            if i > last_nz:
                hc, hl = _AC_ENC[0x00]  # EOB
                bw.write(hc, hl)
                break
            run += 1
            if run == 16:
                hc, hl = _AC_ENC[0xF0]  # ZRL
                bw.write(hc, hl)
                run = 0
            continue
        cat, code = _magnitude(v)
        hc, hl = _AC_ENC[(run << 4) | cat]
        bw.write(hc, hl)
        bw.write(code, cat)
        run = 0
    return prev_dc


def encode(arr: np.ndarray, quality: int = 85, restart_interval: int = 0) -> bytes:
    """uint8 grayscale (h, w) -> baseline JFIF bytes.

    ``restart_interval`` > 0 emits a DRI segment and RSTn markers every
    that many MCUs (byte-aligned, DC prediction reset) — the layout
    scanner output commonly uses; the decoder round-trips it exactly."""
    arr = np.asarray(arr, dtype=np.uint8)
    if arr.ndim != 2:
        raise ValueError("grayscale (h, w) arrays only")
    h, w = arr.shape
    q = _quant_table(quality)
    ph, pw = -h % 8, -w % 8
    padded = np.pad(arr, ((0, ph), (0, pw)), mode="edge").astype(np.float64) - 128.0

    bw = _BitWriter()
    prev_dc = 0
    mcu = 0
    rst = 0
    for by in range(0, padded.shape[0], 8):
        for bx in range(0, padded.shape[1], 8):
            if restart_interval and mcu and mcu % restart_interval == 0:
                bw.flush()
                bw.out += bytes([0xFF, 0xD0 + (rst & 7)])
                rst += 1
                prev_dc = 0
            mcu += 1
            block = padded[by : by + 8, bx : bx + 8]
            prev_dc = _emit_block(bw, block, q, prev_dc)
    bw.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    dqt = seg(0xFFDB, bytes([0]) + bytes(int(v) for v in q.flatten()[_ZIGZAG]))
    sof = seg(0xFFC0, struct.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0]))
    dht = seg(
        0xFFC4,
        bytes([0x00]) + bytes(DC_BITS) + bytes(DC_VALS)
        + b"",
    ) + seg(0xFFC4, bytes([0x10]) + bytes(AC_BITS) + bytes(AC_VALS))
    sos = seg(0xFFDA, bytes([1, 1, 0x00, 0, 63, 0]))
    dri = (
        seg(0xFFDD, struct.pack(">H", restart_interval))
        if restart_interval
        else b""
    )
    return (
        b"\xff\xd8" + dqt + sof + dri + dht + sos + bytes(bw.out) + b"\xff\xd9"
    )


def encode_color(
    arr: np.ndarray, quality: int = 85, subsample: bool = True
) -> bytes:
    """uint8 RGB (h, w, 3) -> baseline YCbCr JFIF bytes.

    ``subsample=True`` writes 4:2:0 (Y at 2x2 sampling, box-averaged
    chroma — the near-universal photographic profile); ``False`` writes
    4:4:4. One shared quant/Huffman table set for all components (legal
    and what minimal encoders emit)."""
    arr = np.asarray(arr, dtype=np.uint8)
    if arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError("RGB (h, w, 3) arrays only")
    h, w = arr.shape[:2]
    r = arr[:, :, 0].astype(np.float64)
    g = arr[:, :, 1].astype(np.float64)
    b = arr[:, :, 2].astype(np.float64)
    Y = 0.299 * r + 0.587 * g + 0.114 * b
    Cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    Cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b

    hs = vs = 2 if subsample else 1
    mcu_w, mcu_h = 8 * hs, 8 * vs
    mcw = (w + mcu_w - 1) // mcu_w
    mch = (h + mcu_h - 1) // mcu_h

    def pad_to(p, ph, pw):
        return np.pad(
            p, ((0, ph - p.shape[0]), (0, pw - p.shape[1])), mode="edge"
        )

    Yp = pad_to(Y, mch * mcu_h, mcw * mcu_w) - 128.0
    Cbp = pad_to(Cb, mch * mcu_h, mcw * mcu_w)
    Crp = pad_to(Cr, mch * mcu_h, mcw * mcu_w)
    if subsample:  # box mean over vs x hs
        Cbp = Cbp.reshape(mch * 8, vs, mcw * 8, hs).mean(axis=(1, 3))
        Crp = Crp.reshape(mch * 8, vs, mcw * 8, hs).mean(axis=(1, 3))
    Cbp -= 128.0
    Crp -= 128.0

    q = _quant_table(quality).astype(np.float64)
    bw = _BitWriter()
    dc = [0, 0, 0]
    for my in range(mch):
        for mx in range(mcw):
            for vy in range(vs):  # Y blocks, raster order within the MCU
                for vx in range(hs):
                    y0, x0 = my * mcu_h + vy * 8, mx * mcu_w + vx * 8
                    dc[0] = _emit_block(
                        bw, Yp[y0 : y0 + 8, x0 : x0 + 8], q, dc[0]
                    )
            cy, cx = my * 8, mx * 8
            dc[1] = _emit_block(bw, Cbp[cy : cy + 8, cx : cx + 8], q, dc[1])
            dc[2] = _emit_block(bw, Crp[cy : cy + 8, cx : cx + 8], q, dc[2])
    bw.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    samp_y = (hs << 4) | vs
    dqt = seg(0xFFDB, bytes([0]) + bytes(int(v) for v in q.flatten()[_ZIGZAG]))
    sof = seg(
        0xFFC0,
        struct.pack(">BHHB", 8, h, w, 3)
        + bytes([1, samp_y, 0, 2, 0x11, 0, 3, 0x11, 0]),
    )
    dht = seg(
        0xFFC4, bytes([0x00]) + bytes(DC_BITS) + bytes(DC_VALS)
    ) + seg(0xFFC4, bytes([0x10]) + bytes(AC_BITS) + bytes(AC_VALS))
    sos = seg(0xFFDA, bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0]))
    return b"\xff\xd8" + dqt + sof + dht + sos + bytes(bw.out) + b"\xff\xd9"


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        # drop already-consumed high bits: without this acc grows by 8 bits
        # per stream byte forever and each << 8 copies the whole bigint,
        # making entropy decode quadratic in scan size (read_bit only ever
        # looks at the low nbits, so truncation is output-identical)
        self.acc &= (1 << self.nbits) - 1
        while self.nbits <= 24 and self.pos < len(self.data):
            byte = self.data[self.pos]
            self.pos += 1
            if byte == 0xFF:
                nxt = self.data[self.pos] if self.pos < len(self.data) else 0
                if nxt == 0x00:
                    self.pos += 1  # stuffed
                else:
                    # at a marker (EOI / RSTn): stop feeding; a well-formed
                    # scan never reads past it (read_bit pads 0 if it does)
                    self.pos -= 1
                    break
            self.acc = (self.acc << 8) | byte
            self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
            if self.nbits == 0:
                return 0
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def skip_rst(self) -> None:
        """Byte-align and consume the next RSTn marker (T.81 §E.2.4).

        Everything still buffered is pre-marker pad (entropy bytes never
        contain a bare FF Dn — stuffing writes FF 00), so the buffer is
        simply discarded and the scan resumes after the marker."""
        self.acc = 0
        self.nbits = 0
        while self.pos + 1 < len(self.data):
            if (
                self.data[self.pos] == 0xFF
                and 0xD0 <= self.data[self.pos + 1] <= 0xD7
            ):
                self.pos += 2
                return
            self.pos += 1
        raise ValueError("expected RSTn marker in entropy stream")


def _decode_huff(br: _BitReader, table: Dict[Tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.read_bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("bad Huffman code")


def _extend(v: int, cat: int) -> int:
    if cat == 0:
        return 0
    return v if v >= (1 << (cat - 1)) else v - (1 << cat) + 1


def _entropy_end(data: bytes, start: int) -> int:
    """Index of the first real marker (not stuffing, not RSTn) at/after
    ``start`` — the end of an entropy-coded segment."""
    i = start
    n = len(data)
    while i + 1 < n:
        if data[i] == 0xFF:
            nxt = data[i + 1]
            if nxt == 0x00 or 0xD0 <= nxt <= 0xD7:
                i += 2
                continue
            return i
        i += 1
    return n


def _decode_scan(
    data: bytes,
    start: int,
    comps: list,
    scan_comps: list,
    scan_sel: Dict[int, tuple],
    coef: list,
    dc_tables: Dict[int, Dict],
    ac_tables: Dict[int, Dict],
    ss: int,
    se: int,
    ah: int,
    al: int,
    restart_interval: int,
    mcw: int,
    mch: int,
    hmax: int,
    vmax: int,
    w: int,
    h: int,
) -> int:
    """Decode one entropy-coded scan (baseline or progressive) into the
    per-component zigzag coefficient buffers ``coef[ci][by, bx, 0..63]``.
    Returns the byte offset just past the scan. Implements T.81 §F.2
    (sequential) and §G.2 (spectral selection + successive approximation,
    including the EOB-run and AC-refinement correction-bit procedures)."""
    br = _BitReader(data[start:])
    prev_dc = {ci: 0 for ci in scan_comps}
    eobrun = 0
    p1 = 1 << al
    m1 = -p1

    def refine_nonzero(zz, k):
        """AC refinement of an already-nonzero coefficient (§G.1.2.3)."""
        if br.read_bit():
            if (zz[k] & p1) == 0:
                zz[k] += p1 if zz[k] >= 0 else m1

    def decode_unit(ci, by, bx):
        nonlocal eobrun
        c = comps[ci]
        zz = coef[ci][by, bx]
        td, ta = scan_sel[c["id"]]
        if ss == 0 and ah == 0:
            # DC first (or baseline): Huffman diff; baseline continues into AC
            dct = dc_tables[td]
            cat = _decode_huff(br, dct)
            diff = _extend(br.read_bits(cat), cat) if cat else 0
            prev_dc[ci] += diff
            zz[0] = prev_dc[ci] << al
            if se == 0:
                return
            act = ac_tables[ta]
            i = 1
            while i <= se:
                sym = _decode_huff(br, act)
                if sym == 0x00:  # EOB
                    break
                if sym == 0xF0:  # ZRL
                    i += 16
                    continue
                run, cat = sym >> 4, sym & 15
                i += run
                if i > se:
                    break
                zz[i] = _extend(br.read_bits(cat), cat)
                i += 1
            return
        if ss == 0:
            # DC refinement: one raw bit per block adds bit ``al``
            if br.read_bit():
                zz[0] |= p1
            return
        act = ac_tables[ta]
        if ah == 0:
            # AC first scan for this band
            if eobrun > 0:
                eobrun -= 1
                return
            k = ss
            while k <= se:
                sym = _decode_huff(br, act)
                run, size = sym >> 4, sym & 15
                if size == 0:
                    if run == 15:  # ZRL
                        k += 16
                        continue
                    eobrun = (1 << run) - 1
                    if run:
                        eobrun += br.read_bits(run)
                    break
                k += run
                if k > se:
                    break
                zz[k] = _extend(br.read_bits(size), size) << al
                k += 1
            return
        # AC refinement scan (§G.1.2.3 / decode side of correction bits)
        k = ss
        if eobrun == 0:
            while k <= se:
                sym = _decode_huff(br, act)
                run, size = sym >> 4, sym & 15
                val = 0
                if size == 0:
                    if run != 15:
                        eobrun = 1 << run
                        if run:
                            eobrun += br.read_bits(run)
                        break
                    # ZRL: advance past 16 zero-history coefficients
                else:
                    # size must be 1 in a refinement scan
                    val = p1 if br.read_bit() else m1
                while k <= se:
                    if zz[k] != 0:
                        refine_nonzero(zz, k)
                    else:
                        if run == 0:
                            break
                        run -= 1
                    k += 1
                if val and k <= se:
                    zz[k] = val
                k += 1
        if eobrun > 0:
            # EOB: refine every remaining nonzero coefficient in the band
            while k <= se:
                if zz[k] != 0:
                    refine_nonzero(zz, k)
                k += 1
            eobrun -= 1

    interleaved = len(scan_comps) > 1
    if interleaved:
        n_mcu = 0
        for my in range(mch):
            for mx in range(mcw):
                if restart_interval and n_mcu and n_mcu % restart_interval == 0:
                    br.skip_rst()
                    for ci in prev_dc:
                        prev_dc[ci] = 0
                    eobrun = 0
                n_mcu += 1
                for ci in scan_comps:
                    c = comps[ci]
                    for vy in range(c["v"]):
                        for vx in range(c["h"]):
                            decode_unit(ci, my * c["v"] + vy, mx * c["h"] + vx)
    else:
        # non-interleaved: MCU = one data unit; geometry is the component's
        # own block grid (T.81 §A.2.2)
        ci = scan_comps[0]
        c = comps[ci]
        nbx = (-(-w * c["h"] // hmax) + 7) // 8
        nby = (-(-h * c["v"] // vmax) + 7) // 8
        n_mcu = 0
        for by in range(nby):
            for bx in range(nbx):
                if restart_interval and n_mcu and n_mcu % restart_interval == 0:
                    br.skip_rst()
                    prev_dc[ci] = 0
                    eobrun = 0
                n_mcu += 1
                decode_unit(ci, by, bx)
    return _entropy_end(data, start + br.pos)


def decode(data: bytes) -> np.ndarray:
    """JFIF bytes -> uint8 array. Baseline sequential (SOF0/1) AND
    progressive (SOF2: spectral selection + successive approximation,
    T.81 Annex G) processes.

    Grayscale streams return (h, w); 3-component YCbCr streams (any
    integer subsampling incl. 4:2:0/4:2:2/4:4:4) return (h, w, 3) RGB
    via CCIR 601 conversion with sample-repetition chroma upsampling.
    The reference gets progressive decode from pdfium/PIL
    (docprompt _pdfium.py:126-151); here it is from-scratch numpy."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (no SOI)")
    pos = 2
    qtables: Dict[int, np.ndarray] = {}
    dc_tables: Dict[int, Dict] = {}
    ac_tables: Dict[int, Dict] = {}
    h = w = None
    comps: list = []
    restart_interval = 0
    coef: list = []
    hmax = vmax = mcw = mch = 0
    saw_scan = False
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            pos += 1
            continue
        marker = struct.unpack(">H", data[pos : pos + 2])[0]
        if marker == 0xFFD9:
            break
        (ln,) = struct.unpack(">H", data[pos + 2 : pos + 4])
        payload = data[pos + 4 : pos + 2 + ln]
        if marker == 0xFFDB:
            p = 0
            while p < len(payload):
                pq, tq = payload[p] >> 4, payload[p] & 15
                p += 1
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                tbl = np.zeros(64, dtype=np.int32)
                tbl[_ZIGZAG] = np.frombuffer(payload[p : p + 64], dtype=np.uint8)
                qtables[tq] = tbl.reshape(8, 8)
                p += 64
        elif marker in (0xFFC0, 0xFFC1, 0xFFC2):
            precision, h, w, ncomp = struct.unpack(">BHHB", payload[:6])
            if precision != 8:
                raise ValueError("only 8-bit precision")
            if ncomp not in (1, 3):
                raise ValueError("1 (gray) or 3 (YCbCr) components only")
            comps = []
            for ci in range(ncomp):
                cid = payload[6 + 3 * ci]
                samp = payload[7 + 3 * ci]
                comps.append(
                    {"id": cid, "h": samp >> 4, "v": samp & 15,
                     "tq": payload[8 + 3 * ci]}
                )
            if ncomp == 1:
                # T.81 §A.2: a single-component scan is non-interleaved —
                # MCU is ONE data unit regardless of the SOF sampling
                # factors, so an external grayscale JPEG declaring 2x2
                # factors must still decode 1 block/MCU.
                comps[0]["h"] = comps[0]["v"] = 1
            hmax = max(c["h"] for c in comps)
            vmax = max(c["v"] for c in comps)
            mcw = (w + 8 * hmax - 1) // (8 * hmax)
            mch = (h + 8 * vmax - 1) // (8 * vmax)
            coef = [
                np.zeros((mch * c["v"], mcw * c["h"], 64), dtype=np.int64)
                for c in comps
            ]
        elif marker in (0xFFC3, 0xFFC5, 0xFFC6, 0xFFC7, 0xFFC9, 0xFFCA,
                        0xFFCB, 0xFFCD, 0xFFCE, 0xFFCF):
            raise ValueError(f"unsupported SOF marker {marker:#x}")
        elif marker == 0xFFC4:
            p = 0
            while p < len(payload):
                tc, th = payload[p] >> 4, payload[p] & 15
                p += 1
                bits = list(payload[p : p + 16])
                p += 16
                nval = sum(bits)
                vals = list(payload[p : p + nval])
                p += nval
                table = _build_decoder(bits, vals)
                (dc_tables if tc == 0 else ac_tables)[th] = table
        elif marker == 0xFFDD:
            (restart_interval,) = struct.unpack(">H", payload[:2])
        elif marker == 0xFFDA:
            if not comps:
                raise ValueError("SOS before SOF")
            ns = payload[0]
            scan_sel: Dict[int, tuple] = {}
            scan_comps = []
            id_to_ci = {c["id"]: ci for ci, c in enumerate(comps)}
            for si in range(ns):
                cid = payload[1 + 2 * si]
                tt = payload[2 + 2 * si]
                scan_sel[cid] = (tt >> 4, tt & 15)
                scan_comps.append(id_to_ci[cid])
            ss = payload[1 + 2 * ns]
            se = payload[2 + 2 * ns]
            a = payload[3 + 2 * ns]
            pos = _decode_scan(
                data, pos + 2 + ln, comps, scan_comps, scan_sel, coef,
                dc_tables, ac_tables, ss, se, a >> 4, a & 15,
                restart_interval, mcw, mch, hmax, vmax, w, h,
            )
            saw_scan = True
            continue
        pos += 2 + ln
    if h is None or not saw_scan:
        raise ValueError("missing SOF/SOS")

    # dequantize + inverse DCT every block (coefficients are complete now)
    planes = []
    for ci, c in enumerate(comps):
        q = qtables[c["tq"]]
        nby, nbx = coef[ci].shape[:2]
        plane = np.zeros((nby * 8, nbx * 8), dtype=np.float64)
        nat = np.zeros(64, dtype=np.int64)
        for by in range(nby):
            for bx in range(nbx):
                nat[:] = 0
                nat[_ZIGZAG] = coef[ci][by, bx]
                cf = nat.reshape(8, 8) * q
                plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (
                    _C.T @ cf @ _C + 128.0
                )
        planes.append(plane)

    if len(comps) == 1:
        return np.clip(np.round(planes[0][:h, :w]), 0, 255).astype(np.uint8)
    # upsample chroma by sample repetition, then YCbCr -> RGB (CCIR 601)
    full = []
    for ci, c in enumerate(comps):
        p = planes[ci]
        if c["h"] != hmax or c["v"] != vmax:
            p = np.repeat(np.repeat(p, vmax // c["v"], axis=0), hmax // c["h"], axis=1)
        full.append(p[:h, :w])
    Y, Cb, Cr = full
    r = Y + 1.402 * (Cr - 128.0)
    g = Y - 0.344136 * (Cb - 128.0) - 0.714136 * (Cr - 128.0)
    b = Y + 1.772 * (Cb - 128.0)
    return np.clip(np.round(np.stack([r, g, b], axis=-1)), 0, 255).astype(
        np.uint8
    )


# --------------------------------------------------------------------------
# Progressive encoder (T.81 Annex G) — grayscale
# --------------------------------------------------------------------------

def _quantized_blocks(arr: np.ndarray, q: np.ndarray) -> np.ndarray:
    """uint8 (h, w) -> zigzag-order quantized DCT coefficients
    (nby, nbx, 64), identical math to the baseline encoder's _emit_block."""
    h, w = arr.shape
    ph, pw = -h % 8, -w % 8
    padded = np.pad(arr, ((0, ph), (0, pw)), mode="edge").astype(np.float64) - 128.0
    nby, nbx = padded.shape[0] // 8, padded.shape[1] // 8
    out = np.zeros((nby, nbx, 64), dtype=np.int64)
    for by in range(nby):
        for bx in range(nbx):
            block = padded[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
            coef = _C @ block @ _C.T
            quant = np.round(coef / q).astype(np.int64)
            out[by, bx] = quant.flatten()[_ZIGZAG]
    return out


def _enc_dc_first(bw: _BitWriter, blocks: np.ndarray, al: int) -> None:
    prev = 0
    nby, nbx = blocks.shape[:2]
    for by in range(nby):
        for bx in range(nbx):
            t = int(blocks[by, bx, 0]) >> al  # DC point transform: arithmetic shift
            diff = t - prev
            prev = t
            cat, code = _magnitude(diff)
            hc, hl = _DC_ENC[cat]
            bw.write(hc, hl)
            if cat:
                bw.write(code, cat)


def _enc_dc_refine(bw: _BitWriter, blocks: np.ndarray, al: int) -> None:
    nby, nbx = blocks.shape[:2]
    for by in range(nby):
        for bx in range(nbx):
            bw.write((int(blocks[by, bx, 0]) >> al) & 1, 1)


def _enc_ac_first(bw: _BitWriter, blocks: np.ndarray, ss: int, se: int, al: int) -> None:
    """First AC scan of a spectral band at precision ``al``. EOB runs are
    never accumulated across blocks (every block ends with EOB0 — legal,
    and keeps the standard Annex-K tables sufficient: they lack EOBn>0
    symbols)."""
    nby, nbx = blocks.shape[:2]
    for by in range(nby):
        for bx in range(nbx):
            zz = blocks[by, bx]
            r = 0
            emitted = False
            for k in range(ss, se + 1):
                v = int(zz[k])
                t = abs(v) >> al  # AC point transform rounds toward zero
                if t == 0:
                    r += 1
                    continue
                while r > 15:
                    hc, hl = _AC_ENC[0xF0]
                    bw.write(hc, hl)
                    r -= 16
                s = t if v > 0 else -t
                cat, code = _magnitude(s)
                hc, hl = _AC_ENC[(r << 4) | cat]
                bw.write(hc, hl)
                bw.write(code, cat)
                r = 0
                emitted = True
            if r or not emitted:
                hc, hl = _AC_ENC[0x00]  # EOB0
                bw.write(hc, hl)


def _enc_ac_refine(
    bw: _BitWriter, blocks: np.ndarray, ss: int, se: int, ah: int, al: int
) -> None:
    """AC refinement scan (§G.1.2.3): newly-significant coefficients get a
    (run<<4)|1 symbol + sign bit; already-nonzero coefficients contribute
    one correction bit each, buffered and flushed after the next symbol."""
    nby, nbx = blocks.shape[:2]
    for by in range(nby):
        for bx in range(nbx):
            zz = blocks[by, bx]
            # last newly-significant index: zero-runs beyond it fold into EOB
            eob = ss - 1
            for k in range(ss, se + 1):
                if (abs(int(zz[k])) >> al) == 1:
                    eob = k
            r = 0
            pending: list = []
            for k in range(ss, se + 1):
                v = int(zz[k])
                t = abs(v) >> al
                if t == 0:
                    r += 1
                    continue
                # ZRLs must be emitted BEFORE buffering this coefficient's
                # bit, so every buffered bit was deposited at r <= 15 and
                # the decoder's positional crossing stays aligned; runs
                # past the last newly-significant coef fold into EOB.
                while r > 15 and k <= eob:
                    hc, hl = _AC_ENC[0xF0]
                    bw.write(hc, hl)
                    r -= 16
                    for b in pending:
                        bw.write(b, 1)
                    pending = []
                if t > 1:  # nonzero history: correction bit only
                    pending.append(t & 1)
                    continue
                hc, hl = _AC_ENC[(r << 4) | 1]
                bw.write(hc, hl)
                bw.write(1 if v > 0 else 0, 1)
                for b in pending:
                    bw.write(b, 1)
                pending = []
                r = 0
            if r or pending:
                hc, hl = _AC_ENC[0x00]  # EOB
                bw.write(hc, hl)
                for b in pending:
                    bw.write(b, 1)


def encode_progressive(arr: np.ndarray, quality: int = 85) -> bytes:
    """uint8 grayscale (h, w) -> PROGRESSIVE JFIF bytes (SOF2).

    Six-scan script exercising both progressive modes (the common libjpeg
    "simple progression" shape): DC first at Al=1, AC bands 1-5 and 6-63
    first at Al=2, two AC refinement passes down to Al=0, DC refinement.
    Decodes (via :func:`decode`) to exactly the same pixels as the
    baseline :func:`encode` at the same quality — same quantized
    coefficients, different bitstream order."""
    arr = np.asarray(arr, dtype=np.uint8)
    if arr.ndim != 2:
        raise ValueError("grayscale (h, w) arrays only")
    h, w = arr.shape
    q = _quant_table(quality)
    blocks = _quantized_blocks(arr, q)

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    dqt = seg(0xFFDB, bytes([0]) + bytes(int(v) for v in q.flatten()[_ZIGZAG]))
    sof = seg(0xFFC2, struct.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0]))
    dht = seg(0xFFC4, bytes([0x00]) + bytes(DC_BITS) + bytes(DC_VALS)) + seg(
        0xFFC4, bytes([0x10]) + bytes(AC_BITS) + bytes(AC_VALS)
    )
    out = bytearray(b"\xff\xd8" + dqt + sof + dht)
    # (ss, se, ah, al) script
    script = [
        (0, 0, 0, 1),
        (1, 5, 0, 2),
        (6, 63, 0, 2),
        (1, 63, 2, 1),
        (1, 63, 1, 0),
        (0, 0, 1, 0),
    ]
    for ss, se, ah, al in script:
        out += seg(0xFFDA, bytes([1, 1, 0x00, ss, se, (ah << 4) | al]))
        bw = _BitWriter()
        if ss == 0 and ah == 0:
            _enc_dc_first(bw, blocks, al)
        elif ss == 0:
            _enc_dc_refine(bw, blocks, al)
        elif ah == 0:
            _enc_ac_first(bw, blocks, ss, se, al)
        else:
            _enc_ac_refine(bw, blocks, ss, se, ah, al)
        bw.flush()
        out += bytes(bw.out)
    return bytes(out) + b"\xff\xd9"
