"""Embedded JBIG2 (ITU-T T.88 / PDF §7.4.7) — the scanned-archive bilevel
codec, from scratch.

The reference reads JBIG2-compressed page images through pdfium; a 100 TB
crawl's scanned-PDF slice leans on it heavily. This module implements the
EMBEDDED organization PDF uses (no file header; a stream of segments) with
MMR-coded generic regions — T.88 §6.2.6 delegates MMR to the ITU-T T.4/T.6
two-dimensional code, which :mod:`docprompt_spark.ccitt` already implements
from scratch, so the entropy layer is shared with /CCITTFaxDecode.

Segments produced/consumed:

* page information (type 48, §7.4.8)
* immediate lossless generic region (type 39, §7.4.6) with MMR=1
* end of page (type 49)

Segment header parsing (§7.2) is complete — segment number, flags,
referred-to segment count + retain bits (incl. the long form), 1- or
4-byte page association, data length — so foreign embedded streams with
extra segments are walked correctly; only MMR generic regions are decoded
(template/arithmetic generic regions, symbol dictionaries and text regions
raise, listed as out of scope).

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

    Generic regions with MMR=1 decode through the shared T.6 machinery and
    composite onto the page at their region offsets (comb op OR — the only
    op the encoder emits; others reduce to OR for ink-on-blank pages).
    Arithmetic-template generic regions / symbol+text regions raise
    (out of scope; the reference defers to pdfium for those)."""
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
        if not gflags & 1:
            raise ValueError(
                "JBIG2 arithmetic-coded generic region unsupported (MMR only)"
            )
        if gflags & 0x08:
            raise ValueError("JBIG2 TPGDON with MMR is invalid")
        bits = ccitt.decode(s.data[18:], rw, rh)
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


def encode_gray8(arr: np.ndarray, threshold: int = 128) -> bytes:
    """Threshold gray8 (dark = ink) and wrap as an embedded JBIG2 stream —
    mirror of ccitt.encode_gray8 for the corpus writer."""
    return encode_generic_mmr((np.asarray(arr) < threshold).astype(np.uint8))


def decode_to_gray8(data: bytes, width: int, rows: int) -> np.ndarray:
    """JBIG2 bytes -> gray8 (0 = black ink, 255 = white)."""
    bits = decode(data, width, rows)
    return ((1 - bits) * 255).astype(np.uint8)[:rows, :width]
