"""Embedded JBIG2 (ITU-T T.88 / PDF §7.4.7) — the scanned-archive bilevel
codec, from scratch.

The reference reads JBIG2-compressed page images through pdfium; a 100 TB
crawl's scanned-PDF slice leans on it heavily. This module implements the
EMBEDDED organization PDF uses (no file header; a stream of segments) with
BOTH generic-region codings:

* MMR=1 — T.88 §6.2.6 delegates to the ITU-T T.4/T.6 two-dimensional code,
  which :mod:`docprompt_spark.ccitt` already implements from scratch, so
  the entropy layer is shared with /CCITTFaxDecode;
* MMR=0 — MQ arithmetic coding (GB template 0, nominal adaptive pixels)
  over the from-scratch :mod:`docprompt_spark.mq` coder — the coding real
  scanned-document producers emit.

Segments produced/consumed:

* page information (type 48, §7.4.8)
* immediate lossless generic region (type 39, §7.4.6)
* end of page (type 49)

Segment header parsing (§7.2) is complete — segment number, flags,
referred-to segment count + retain bits (incl. the long form), 1- or
4-byte page association, data length — so foreign embedded streams with
extra segments are walked correctly. Out of scope (raise): non-zero GB
templates, non-nominal AT pixels, TPGDON, symbol dictionaries + text
regions (halftone/refinement likewise).

Bitmap convention: JBIG2 codes 1 = black ink. :func:`decode` returns the
ink bitmap; the media pipeline maps it to viewer gray via
``(1 - bits) * 255`` exactly like the CCITT path (engine convention,
documented at multimodal._codec_of).
"""

from __future__ import annotations

import struct
from typing import List, Optional, Tuple

import numpy as np

# segment types (T.88 §7.3)
SEG_PAGE_INFO = 48
SEG_END_OF_PAGE = 49
SEG_END_OF_FILE = 51
SEG_IMM_GENERIC = 38
SEG_IMM_LOSSLESS_GENERIC = 39
_GENERIC_TYPES = (36, SEG_IMM_GENERIC, SEG_IMM_LOSSLESS_GENERIC)


def _segment_header(
    number: int, seg_type: int, page: int, data_len: int,
    referred: Tuple[int, ...] = (),
) -> bytes:
    """Short-form segment header (§7.2): <= 4 referred segments, 1-byte
    page association."""
    assert len(referred) <= 4 and page <= 255
    flags = seg_type & 0x3F  # page-assoc size bit (6) clear -> 1 byte
    out = struct.pack(">IB", number, flags)
    out += bytes([(len(referred) << 5)])  # count in top 3 bits, retain 0
    for r in referred:
        # referred segment numbers use 1/2/4 bytes based on OUR number
        if number <= 256:
            out += bytes([r])
        elif number <= 65536:
            out += struct.pack(">H", r)
        else:
            out += struct.pack(">I", r)
    out += bytes([page])
    out += struct.pack(">I", data_len)
    return out


def encode_generic_mmr(bits: np.ndarray, page: int = 1) -> bytes:
    """Ink bitmap (1 = black) -> embedded JBIG2 stream: page info +
    immediate lossless generic region (MMR=1, T.6 entropy bytes from
    :func:`ccitt.encode`) + end of page."""
    from docprompt_spark import ccitt

    bits = np.asarray(bits, dtype=np.uint8)
    h, w = bits.shape
    mmr = ccitt.encode(bits)

    # page information segment (§7.4.8): w, h, xres, yres, flags, striping
    page_info = struct.pack(">IIIIBH", w, h, 0, 0, 0, 0)
    # region segment info (§7.4.1): w, h, x, y, comb-op OR
    region_info = struct.pack(">IIIIB", w, h, 0, 0, 0)
    generic = region_info + bytes([1]) + mmr  # flags: MMR=1, template 0

    out = _segment_header(0, SEG_PAGE_INFO, page, len(page_info)) + page_info
    out += (
        _segment_header(1, SEG_IMM_LOSSLESS_GENERIC, page, len(generic))
        + generic
    )
    out += _segment_header(2, SEG_END_OF_PAGE, page, 0)
    return out


class Segment:
    __slots__ = ("number", "seg_type", "page", "referred", "data")

    def __init__(self, number, seg_type, page, referred, data):
        self.number = number
        self.seg_type = seg_type
        self.page = page
        self.referred = referred
        self.data = data


def parse_segments(data: bytes) -> List[Segment]:
    """Walk an embedded-organization JBIG2 stream (§7.2 headers, both
    referred-count forms, 1/4-byte page association)."""
    out: List[Segment] = []
    pos = 0
    n = len(data)
    while pos + 11 <= n:
        number, flags = struct.unpack(">IB", data[pos : pos + 5])
        pos += 5
        seg_type = flags & 0x3F
        page4 = bool(flags & 0x40)
        rts = data[pos]
        count = rts >> 5
        if count == 7:  # long form: 29-bit count + retain-bit array
            count = struct.unpack(">I", data[pos : pos + 4])[0] & 0x1FFFFFFF
            pos += 4 + (count + 8) // 8
        else:
            pos += 1
        ref_size = 1 if number <= 256 else 2 if number <= 65536 else 4
        referred = []
        for _ in range(count):
            referred.append(int.from_bytes(data[pos : pos + ref_size], "big"))
            pos += ref_size
        if page4:
            page = struct.unpack(">I", data[pos : pos + 4])[0]
            pos += 4
        else:
            page = data[pos]
            pos += 1
        (dlen,) = struct.unpack(">I", data[pos : pos + 4])
        pos += 4
        if dlen == 0xFFFFFFFF:
            raise ValueError("unknown-length JBIG2 segment unsupported")
        out.append(Segment(number, seg_type, page, tuple(referred), data[pos : pos + dlen]))
        pos += dlen
        if seg_type == SEG_END_OF_FILE:
            break
    return out


def decode(data: bytes, width: Optional[int] = None,
           height: Optional[int] = None) -> np.ndarray:
    """Embedded JBIG2 stream -> ink bitmap (1 = black) for the first page.

    Generic regions decode through the shared T.6 machinery (MMR=1) or the
    MQ arithmetic coder (MMR=0, template 0) and composite onto the page at
    their region offsets (comb op OR — the only op the encoder emits;
    others reduce to OR for ink-on-blank pages). Symbol/text/halftone
    regions raise (out of scope; the reference defers to pdfium)."""
    from docprompt_spark import ccitt

    segs = parse_segments(data)
    page_w, page_h = width, height
    for s in segs:
        if s.seg_type == SEG_PAGE_INFO and len(s.data) >= 8:
            w, h = struct.unpack(">II", s.data[:8])
            if h != 0xFFFFFFFF:  # striped pages defer height
                page_w, page_h = w, h
            else:
                page_w = w
    regions = []
    for s in segs:
        if s.seg_type not in _GENERIC_TYPES:
            continue
        rw, rh, rx, ry, _comb = struct.unpack(">IIIIB", s.data[:17])
        gflags = s.data[17]
        if gflags & 0x08:
            raise ValueError("JBIG2 TPGDON unsupported")
        if gflags & 1:  # MMR: shared T.6 machinery
            bits = ccitt.decode(s.data[18:], rw, rh)
        else:  # MQ arithmetic, GB template 0, nominal AT pixels
            template = (gflags >> 1) & 3
            if template != 0:
                raise ValueError(f"JBIG2 GB template {template} unsupported")
            at = s.data[18:26]
            if at != _NOMINAL_AT:
                raise ValueError("non-nominal JBIG2 AT pixels unsupported")
            bits = _decode_generic_arith(s.data[26:], rw, rh)
        regions.append((rx, ry, bits))
    if not regions:
        raise ValueError("no generic region segment found")
    if page_w is None or page_h is None:
        page_w = max(rx + b.shape[1] for rx, _, b in regions)
        page_h = max(ry + b.shape[0] for _, ry, b in regions)
    page = np.zeros((page_h, page_w), dtype=np.uint8)
    for rx, ry, bits in regions:
        h, w = bits.shape
        page[ry : ry + h, rx : rx + w] |= bits[: page_h - ry, : page_w - rx]
    return page


def encode_gray8(arr: np.ndarray, threshold: int = 128,
                 arithmetic: bool = False) -> bytes:
    """Threshold gray8 (dark = ink) and wrap as an embedded JBIG2 stream —
    mirror of ccitt.encode_gray8 for the corpus writer. ``arithmetic``
    selects MQ template-0 coding instead of MMR."""
    bits = (np.asarray(arr) < threshold).astype(np.uint8)
    return encode_generic_arith(bits) if arithmetic else encode_generic_mmr(bits)


def decode_to_gray8(data: bytes, width: int, rows: int) -> np.ndarray:
    """JBIG2 bytes -> gray8 (0 = black ink, 255 = white)."""
    bits = decode(data, width, rows)
    return ((1 - bits) * 255).astype(np.uint8)[:rows, :width]


# ---------------------------------------------------------------------------
# Arithmetic-coded generic regions (T.88 §6.2.5, GB template 0, nominal AT)
# ---------------------------------------------------------------------------
#
# Context: the 16 template-0 pixels (12 fixed + 4 adaptive at their NOMINAL
# positions), packed MSB-first in (y, x)-sorted order — the same label
# construction the open readers use (pdf.js jbig2.js CodingTemplates[0] +
# codingTemplate sort), so streams interoperate:
#   row y-2: x-2 .. x+2                    (5 bits, includes AT4/AT3)
#   row y-1: x-3 .. x+3                    (7 bits, includes AT2/AT1)
#   row y  : x-4 .. x-1                    (4 bits)
_NOMINAL_AT = bytes([3, 0xFF, 0xFD, 0xFF, 2, 0xFE, 0xFE, 0xFE])  # signed pairs


def _row_bits(row, x0: int, n: int, w: int) -> int:
    """n pixels row[x0 .. x0+n-1] packed MSB-first; out-of-bounds = 0."""
    v = 0
    for x in range(x0, x0 + n):
        v = (v << 1) | (int(row[x]) if 0 <= x < w else 0)
    return v


def encode_generic_arith(bits: np.ndarray, page: int = 1) -> bytes:
    """Ink bitmap -> embedded JBIG2 stream with an MQ-coded (MMR=0,
    template 0) immediate lossless generic region — the coding real
    scanned-document producers emit."""
    from docprompt_spark.mq import MQEncoder

    bits = np.asarray(bits, dtype=np.uint8)
    h, w = bits.shape
    enc = MQEncoder(1 << 16)
    zrow = np.zeros(w, dtype=np.uint8)
    for y in range(h):
        r2 = bits[y - 2] if y >= 2 else zrow
        r1 = bits[y - 1] if y >= 1 else zrow
        r0 = bits[y]
        for x in range(w):
            ctx = (
                (_row_bits(r2, x - 2, 5, w) << 11)
                | (_row_bits(r1, x - 3, 7, w) << 4)
                | _row_bits(r0, x - 4, 4, w)
            )
            enc.encode(int(r0[x]), ctx)
    mqdata = enc.flush()

    page_info = struct.pack(">IIIIBH", w, h, 0, 0, 0, 0)
    region_info = struct.pack(">IIIIB", w, h, 0, 0, 0)
    generic = region_info + bytes([0]) + _NOMINAL_AT + mqdata  # flags: MMR=0
    out = _segment_header(0, SEG_PAGE_INFO, page, len(page_info)) + page_info
    out += (
        _segment_header(1, SEG_IMM_LOSSLESS_GENERIC, page, len(generic))
        + generic
    )
    out += _segment_header(2, SEG_END_OF_PAGE, page, 0)
    return out


def _decode_generic_arith(data: bytes, rw: int, rh: int) -> np.ndarray:
    from docprompt_spark.mq import MQDecoder

    dec = MQDecoder(data, 1 << 16)
    out = np.zeros((rh, rw), dtype=np.uint8)
    zrow = np.zeros(rw, dtype=np.uint8)
    for y in range(rh):
        r2 = out[y - 2] if y >= 2 else zrow
        r1 = out[y - 1] if y >= 1 else zrow
        r0 = out[y]
        for x in range(rw):
            ctx = (
                (_row_bits(r2, x - 2, 5, rw) << 11)
                | (_row_bits(r1, x - 3, 7, rw) << 4)
                | _row_bits(r0, x - 4, 4, rw)
            )
            r0[x] = dec.decode(ctx)
    return out
