"""CCITT Group 4 (ITU-T T.6 / MMR) codec for PDF ``/CCITTFaxDecode``.

Scanned-document PDFs — a huge share of any real 100 TB corpus — store
their page images G4-compressed; the reference reads them through pdfium.
From-scratch implementation of the two-dimensional (MMR, K<0) scheme:

* modes Pass / Horizontal / Vertical(0,±1,±2,±3) against a reference line
  of changing elements (T.6 §2.2.4 terminology: a0, a1, a2, b1, b2),
* T.4 run-length Huffman tables (white/black terminating 0-63, makeup
  64-1728, shared extended makeup 1792-2560) for horizontal mode,
* EOFB terminator, MSB-first bit packing.

Profile written by :func:`encode` (and assumed by :func:`decode`):
``/K -1 /Columns w /Rows h /BlackIs1 true`` — 1 bits are black. Both
tables are asserted prefix-free and duplicate-free at import (a
transcription typo in a code table almost always collides).
"""

from __future__ import annotations

import bisect
from typing import List, Tuple

import numpy as np

# --------------------------------------------------------------------------
# T.4 run-length code tables: run -> bit string
# --------------------------------------------------------------------------

_WHITE_CODES = {
    0: "00110101", 1: "000111", 2: "0111", 3: "1000", 4: "1011", 5: "1100",
    6: "1110", 7: "1111", 8: "10011", 9: "10100", 10: "00111", 11: "01000",
    12: "001000", 13: "000011", 14: "110100", 15: "110101", 16: "101010",
    17: "101011", 18: "0100111", 19: "0001100", 20: "0001000", 21: "0010111",
    22: "0000011", 23: "0000100", 24: "0101000", 25: "0101011", 26: "0010011",
    27: "0100100", 28: "0011000", 29: "00000010", 30: "00000011",
    31: "00011010", 32: "00011011", 33: "00010010", 34: "00010011",
    35: "00010100", 36: "00010101", 37: "00010110", 38: "00010111",
    39: "00101000", 40: "00101001", 41: "00101010", 42: "00101011",
    43: "00101100", 44: "00101101", 45: "00000100", 46: "00000101",
    47: "00001010", 48: "00001011", 49: "01010010", 50: "01010011",
    51: "01010100", 52: "01010101", 53: "00100100", 54: "00100101",
    55: "01011000", 56: "01011001", 57: "01011010", 58: "01011011",
    59: "01001010", 60: "01001011", 61: "00110010", 62: "00110011",
    63: "00110100",
    # makeup
    64: "11011", 128: "10010", 192: "010111", 256: "0110111",
    320: "00110110", 384: "00110111", 448: "01100100", 512: "01100101",
    576: "01101000", 640: "01100111", 704: "011001100", 768: "011001101",
    832: "011010010", 896: "011010011", 960: "011010100", 1024: "011010101",
    1088: "011010110", 1152: "011010111", 1216: "011011000",
    1280: "011011001", 1344: "011011010", 1408: "011011011",
    1472: "010011000", 1536: "010011001", 1600: "010011010", 1664: "011000",
    1728: "010011011",
}

_BLACK_CODES = {
    0: "0000110111", 1: "010", 2: "11", 3: "10", 4: "011", 5: "0011",
    6: "0010", 7: "00011", 8: "000101", 9: "000100", 10: "0000100",
    11: "0000101", 12: "0000111", 13: "00000100", 14: "00000111",
    15: "000011000", 16: "0000010111", 17: "0000011000", 18: "0000001000",
    19: "00001100111", 20: "00001101000", 21: "00001101100",
    22: "00000110111", 23: "00000101000", 24: "00000010111",
    25: "00000011000", 26: "000011001010", 27: "000011001011",
    28: "000011001100", 29: "000011001101", 30: "000001101000",
    31: "000001101001", 32: "000001101010", 33: "000001101011",
    34: "000011010010", 35: "000011010011", 36: "000011010100",
    37: "000011010101", 38: "000011010110", 39: "000011010111",
    40: "000001101100", 41: "000001101101", 42: "000011011010",
    43: "000011011011", 44: "000001010100", 45: "000001010101",
    46: "000001010110", 47: "000001010111", 48: "000001100100",
    49: "000001100101", 50: "000001010010", 51: "000001010011",
    52: "000000100100", 53: "000000110111", 54: "000000111000",
    55: "000000100111", 56: "000000101000", 57: "000001011000",
    58: "000001011001", 59: "000000101011", 60: "000000101100",
    61: "000001011010", 62: "000001100110", 63: "000001100111",
    # makeup
    64: "0000001111", 128: "000011001000", 192: "000011001001",
    256: "000001011011", 320: "000000110011", 384: "000000110100",
    448: "000000110101", 512: "0000001101100", 576: "0000001101101",
    640: "0000001001010", 704: "0000001001011", 768: "0000001001100",
    832: "0000001001101", 896: "0000001110010", 960: "0000001110011",
    1024: "0000001110100", 1088: "0000001110101", 1152: "0000001110110",
    1216: "0000001110111", 1280: "0000001010010", 1344: "0000001010011",
    1408: "0000001010100", 1472: "0000001010101", 1536: "0000001011010",
    1600: "0000001011011", 1664: "0000001100100", 1728: "0000001100101",
}

# extended makeup (T.4 §2 Table 3; shared by both colors)
_EXT_CODES = {
    1792: "00000001000", 1856: "00000001100", 1920: "00000001101",
    1984: "000000010010", 2048: "000000010011", 2112: "000000010100",
    2176: "000000010101", 2240: "000000010110", 2304: "000000010111",
    2368: "000000011100", 2432: "000000011101", 2496: "000000011110",
    2560: "000000011111",
}

_MODE_CODES = {
    "P": "0001", "H": "001", "V0": "1",
    "VR1": "011", "VR2": "000011", "VR3": "0000011",
    "VL1": "010", "VL2": "000010", "VL3": "0000010",
}
EOFB = "000000000001" * 2


def _check_prefix_free(codes: dict, name: str) -> None:
    vals = sorted(codes.values(), key=len)
    if len(set(vals)) != len(vals):
        raise AssertionError(f"{name}: duplicate code")
    for i, a in enumerate(vals):
        for b in vals[i + 1 :]:
            if b.startswith(a):
                raise AssertionError(f"{name}: {a} prefixes {b}")


_check_prefix_free({**_WHITE_CODES, **_EXT_CODES}, "white")
_check_prefix_free({**_BLACK_CODES, **_EXT_CODES}, "black")
_check_prefix_free(_MODE_CODES, "modes")

_WHITE_DEC = {v: k for k, v in {**_WHITE_CODES, **_EXT_CODES}.items()}
_BLACK_DEC = {v: k for k, v in {**_BLACK_CODES, **_EXT_CODES}.items()}
_MODE_DEC = {v: k for k, v in _MODE_CODES.items()}


class _BitWriter:
    def __init__(self) -> None:
        self.bits: List[str] = []

    def write(self, s: str) -> None:
        self.bits.append(s)

    def tobytes(self) -> bytes:
        s = "".join(self.bits)
        s += "0" * (-len(s) % 8)
        return bytes(int(s[i : i + 8], 2) for i in range(0, len(s), 8))


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0  # bit position

    def read_code(self, table: dict, maxlen: int = 14) -> int:
        code = ""
        d = self.data
        for _ in range(maxlen):
            byte_i, bit_i = divmod(self.pos, 8)
            if byte_i >= len(d):
                raise ValueError("CCITT: truncated stream")
            code += "1" if (d[byte_i] >> (7 - bit_i)) & 1 else "0"
            self.pos += 1
            v = table.get(code)
            if v is not None:
                return v
        raise ValueError(f"CCITT: bad code {code!r}")


def _emit_run(bw: _BitWriter, run: int, color: int) -> None:
    table = _BLACK_CODES if color else _WHITE_CODES
    while run >= 2624:  # chain max extended makeup
        bw.write(_EXT_CODES[2560])
        run -= 2560
    if run >= 64:
        makeup = (run // 64) * 64
        if makeup > 1728:
            bw.write(_EXT_CODES[makeup])
        else:
            bw.write(table[makeup])
        run -= makeup
    bw.write(table[run])


def _read_run(br: _BitReader, color: int) -> int:
    table = _BLACK_DEC if color else _WHITE_DEC
    total = 0
    while True:
        v = br.read_code(table)
        total += v
        if v < 64:  # terminating code
            return total


def _transitions(row: np.ndarray) -> List[int]:
    """Changing-element positions (pixel index where color differs from
    the previous pixel; imaginary white pixel before index 0)."""
    return np.flatnonzero(np.diff(np.concatenate(([0], row)))).tolist()


def _b1b2(ref: List[int], a0: int, color: int, width: int) -> Tuple[int, int]:
    """b1: first changing element of ref strictly right of a0 whose parity
    makes it a transition to !color (even index -> to black); b2: next."""
    i = bisect.bisect_right(ref, a0 if a0 >= 0 else -1)
    if (i & 1) != color:
        i += 1
    b1 = ref[i] if i < len(ref) else width
    b2 = ref[i + 1] if i + 1 < len(ref) else width
    return b1, b2


def _encode_2d_row(bw: _BitWriter, ref: List[int], cur: List[int], w: int) -> None:
    """One MMR-coded row against reference transitions ``ref``."""
    a0, color = -1, 0
    while True:
        b1, b2 = _b1b2(ref, a0, color, w)
        i = bisect.bisect_right(cur, a0 if a0 >= 0 else -1)
        a1 = cur[i] if i < len(cur) else w
        if b2 < a1:
            bw.write(_MODE_CODES["P"])
            a0 = b2
        elif abs(a1 - b1) <= 3:
            d = a1 - b1
            bw.write(_MODE_CODES[
                "V0" if d == 0 else (f"VR{d}" if d > 0 else f"VL{-d}")
            ])
            a0 = a1
            color ^= 1
        else:
            a2 = cur[i + 1] if i + 1 < len(cur) else w
            start = 0 if a0 < 0 else a0
            bw.write(_MODE_CODES["H"])
            _emit_run(bw, a1 - start, color)
            _emit_run(bw, a2 - a1, color ^ 1)
            a0 = a2
        if a0 >= w:
            break


def encode(bits: np.ndarray) -> bytes:
    """Bilevel image (h, w) of 0/1 (1 = black) -> G4 bytes (+ EOFB)."""
    bits = np.asarray(bits)
    if bits.ndim != 2:
        raise ValueError("expected (h, w) bilevel array")
    h, w = bits.shape
    bw = _BitWriter()
    ref: List[int] = []  # imaginary all-white reference line
    for y in range(h):
        cur = _transitions(bits[y])
        _encode_2d_row(bw, ref, cur, w)
        ref = cur
    bw.write(EOFB)
    return bw.tobytes()


def _decode_2d_row(br: _BitReader, ref: List[int], width: int) -> np.ndarray:
    """Decode one MMR-coded row against ``ref``; returns the pixel row."""
    cur: List[int] = []
    a0, color = -1, 0
    while True:
        b1, b2 = _b1b2(ref, a0, color, width)
        mode = br.read_code(_MODE_DEC)
        if mode == "P":
            a0 = b2
        elif mode == "H":
            start = 0 if a0 < 0 else a0
            r1 = _read_run(br, color)
            r2 = _read_run(br, color ^ 1)
            cur.append(start + r1)
            cur.append(start + r1 + r2)
            a0 = start + r1 + r2
        else:  # vertical
            d = 0 if mode == "V0" else (
                int(mode[2]) if mode[1] == "R" else -int(mode[2])
            )
            a1 = b1 + d
            cur.append(a1)
            a0 = a1
            color ^= 1
        if a0 >= width:
            break
    # materialize: flip at each transition (duplicates cancel)
    mask = np.zeros(width, dtype=np.uint8)
    for p in cur:
        if 0 <= p < width:
            mask[p] ^= 1
        # p >= width: transition past the edge, no visible effect
    return np.bitwise_xor.accumulate(mask)


def decode(data: bytes, width: int, rows: int) -> np.ndarray:
    """G4 bytes -> bilevel (rows, width) of 0/1 (1 = black)."""
    br = _BitReader(data)
    out = np.zeros((rows, width), dtype=np.uint8)
    ref: List[int] = []
    for y in range(rows):
        row = _decode_2d_row(br, ref, width)
        out[y] = row
        ref = _transitions(row)
    return out.astype(np.uint8)


# --------------------------------------------------------------------------
# Group 3 one-dimensional (T.4 §2, /K 0): independent MH-coded rows
# --------------------------------------------------------------------------

EOL = "000000000001"


def _encode_1d_row(bw: _BitWriter, row: np.ndarray, w: int) -> None:
    edges = [0] + _transitions(row) + [w]
    color = 0
    for i in range(len(edges) - 1):
        _emit_run(bw, edges[i + 1] - edges[i], color)
        color ^= 1


def _decode_1d_row(br: _BitReader, width: int) -> np.ndarray:
    pos = 0
    color = 0
    row = np.zeros(width, dtype=np.uint8)
    while pos < width:
        run = _read_run(br, color)
        if color:
            row[pos : pos + run] = 1
        pos += run
        color ^= 1
    return row


def encode_g3_1d(bits: np.ndarray, with_eol: bool = True) -> bytes:
    """T.4 1-D (Modified Huffman) encoding: each row is an alternating
    white/black run-length sequence starting with a white run (possibly 0).
    ``with_eol`` prefixes every row with EOL (the common scanner profile)."""
    bits = np.asarray(bits)
    h, w = bits.shape
    bw = _BitWriter()
    for y in range(h):
        if with_eol:
            bw.write(EOL)
        _encode_1d_row(bw, bits[y], w)
    return bw.tobytes()


def _skip_eols(br: _BitReader) -> None:
    """Consume any number of fill-0s + EOL (eleven 0s then a 1) sequences;
    rewinds cleanly if the next bits are ordinary run codes."""
    d = br.data
    nbits_total = len(d) * 8
    while True:
        save = br.pos
        zeros = 0
        consumed = False
        while br.pos < nbits_total and zeros <= 64:
            byte_i, bit_i = divmod(br.pos, 8)
            bit = (d[byte_i] >> (7 - bit_i)) & 1
            br.pos += 1
            if bit == 0:
                zeros += 1
                continue
            if zeros >= 11:  # a full EOL (fill zeros + 11+ zeros + 1)
                consumed = True
            break
        if not consumed:
            br.pos = save
            return


def decode_g3_1d(data: bytes, width: int, rows: int) -> np.ndarray:
    """T.4 1-D decode (rows independent; EOLs tolerated anywhere)."""
    br = _BitReader(data)
    out = np.zeros((rows, width), dtype=np.uint8)
    for y in range(rows):
        _skip_eols(br)
        out[y] = _decode_1d_row(br, width)
    return out


# --------------------------------------------------------------------------
# Group 3 mixed mode (T.4 §2.2, /K > 0): EOL + tag bit selects 1D/2D rows
# --------------------------------------------------------------------------


def _consume_eol(br: _BitReader) -> None:
    """Consume fill 0s + one EOL (>= 11 zeros then a 1); raises if the
    stream is not at an EOL."""
    d = br.data
    nbits = len(d) * 8
    zeros = 0
    while br.pos < nbits:
        byte_i, bit_i = divmod(br.pos, 8)
        bit = (d[byte_i] >> (7 - bit_i)) & 1
        br.pos += 1
        if bit == 0:
            zeros += 1
            if zeros > 4096:
                break
            continue
        if zeros >= 11:
            return
        break
    raise ValueError("CCITT G3 mixed: expected EOL")


def _read_bit(br: _BitReader) -> int:
    byte_i, bit_i = divmod(br.pos, 8)
    if byte_i >= len(br.data):
        raise ValueError("CCITT: truncated stream")
    br.pos += 1
    return (br.data[byte_i] >> (7 - bit_i)) & 1


def encode_g3_mixed(bits: np.ndarray, k: int = 4) -> bytes:
    """T.4 mixed 1D/2D (/K k, k > 0): every row is EOL + a tag bit
    (1 = 1-D row, 0 = 2-D row vs the previous row); at most k-1
    consecutive 2-D rows follow each 1-D anchor row — the standard fax
    transmission profile."""
    if k < 1:
        raise ValueError("k must be >= 1 (use encode() for pure 2D)")
    bits = np.asarray(bits)
    h, w = bits.shape
    bw = _BitWriter()
    ref: List[int] = []
    for y in range(h):
        one_d = (y % k) == 0
        bw.write(EOL)
        bw.write("1" if one_d else "0")
        cur = _transitions(bits[y])
        if one_d:
            _encode_1d_row(bw, bits[y], w)
        else:
            _encode_2d_row(bw, ref, cur, w)
        ref = cur
    return bw.tobytes()


def decode_g3_mixed(data: bytes, width: int, rows: int) -> np.ndarray:
    """T.4 mixed 1D/2D decode: per row, EOL then a tag bit chooses the
    row coder; 2-D rows reference the previously decoded row."""
    br = _BitReader(data)
    out = np.zeros((rows, width), dtype=np.uint8)
    ref: List[int] = []
    for y in range(rows):
        _consume_eol(br)
        if _read_bit(br):
            row = _decode_1d_row(br, width)
        else:
            row = _decode_2d_row(br, ref, width)
        out[y] = row
        ref = _transitions(row)
    return out


# --------------------------------------------------------------------------
# gray8 convenience (the media-table decode path)
# --------------------------------------------------------------------------


def encode_gray8(arr: np.ndarray, threshold: int = 128) -> bytes:
    """Threshold a gray8 image to bilevel (dark = black) and G4-encode."""
    return encode((np.asarray(arr) < threshold).astype(np.uint8))


def decode_to_gray8(data: bytes, width: int, rows: int) -> np.ndarray:
    """G4 bytes -> gray8 (0 = black, 255 = white), BlackIs1 profile."""
    bits = decode(data, width, rows)
    return ((1 - bits) * 255).astype(np.uint8)
