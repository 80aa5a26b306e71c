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

plus SYMBOL-CODED pages — the dominant JBIG2 mode in real scanned PDFs:
symbol dictionaries (type 0, §6.5) and text regions (types 6/7, §6.4)
decoded with the Annex-A arithmetic integer procedures (IADH/IADW/IAEX/
IADT/IAFS/IADS/IAIT and the IAID tree decoder) over the same MQ coder;
HALFTONE pages — JBIG2's grayscale mode: pattern dictionaries (type 16,
§6.7) + halftone regions (types 22/23, §6.6) with Annex C.5 Gray-coded
bitplanes and fixed-point 24.8 grid placement; and generic REFINEMENT
regions (types 42/43, §6.3, GRTEMPLATE=1 + TPGRON) that re-code a page
window against its already-decoded content.

Segments produced/consumed:

* page information (type 48, §7.4.8)
* symbol dictionary (type 0, §7.4.3 — arithmetic profile)
* immediate (lossless) text region (types 6/7, §7.4.4)
* pattern dictionary (type 16, §7.4.4) + halftone region (types 22/23)
* immediate (lossless) refinement region (types 42/43, §7.4.7)
* immediate lossless generic region (type 39, §7.4.6)
* end of page (type 49)

Segment header parsing (§7.2) is complete — segment number, flags,
referred-to segment count + retain bits (incl. the long form), 1- or
4-byte page association, data length — so foreign embedded streams with
extra segments are walked correctly. TPGDON (typical prediction,
§6.2.5.7) is supported on generic regions in both directions, and ALL
FOUR GB templates (§6.2.5.3, nominal AT pixels) encode and decode —
the context compositions follow pdf.js CodingTemplates order so streams
interoperate with the open readers. Out of scope (raise): GR template 0,
non-nominal AT pixels outside the pattern-dictionary AT1=(-HDPW,0)
profile, Huffman-coded dictionaries, aggregate
(refinement-within-dictionary) symbol coding, MMR halftones, skip
bitmaps.

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
    MQ arithmetic coder (MMR=0, template 0); SYMBOL-CODED pages decode
    through symbol dictionary (type 0) + text region (types 6/7) segments
    (§6.4-6.5, Annex A integer procedures); HALFTONE pages through
    pattern dictionary (type 16) + halftone region (types 22/23) segments
    (§6.6-6.7, Gray-coded bitplanes); REFINEMENT regions (types 42/43,
    §6.3) re-code their window against the page content beneath them and
    REPLACE it. Other regions composite onto the page at their offsets in
    segment order (comb op OR — the only op the encoder emits; others
    reduce to OR for ink-on-blank pages)."""
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
    sym_exports = {}  # segment number -> exported symbol bitmaps
    pat_exports = {}  # segment number -> pattern dictionary bitmaps
    for s in segs:
        if s.seg_type == SEG_SYMBOL_DICT:
            sym_exports[s.number] = decode_symbol_dict(s.data)
            continue
        if s.seg_type == SEG_PATTERN_DICT:
            pat_exports[s.number] = decode_pattern_dict(s.data)
            continue
        if s.seg_type in _HALFTONE_TYPES:
            if s.seg_type == 20:
                raise ValueError(
                    "JBIG2 intermediate halftone regions unsupported"
                )
            pats: List[np.ndarray] = []
            for ref in s.referred:
                pats.extend(pat_exports.get(ref, []))
            rx, ry, bits = decode_halftone_region(s.data, pats)
            regions.append((rx, ry, bits, "or"))
            continue
        if s.seg_type in _TEXT_TYPES:
            if s.seg_type == 4:
                raise ValueError("JBIG2 intermediate text regions unsupported")
            syms: List[np.ndarray] = []
            for ref in s.referred:
                syms.extend(sym_exports.get(ref, []))
            rx, ry, bits = decode_text_region(s.data, syms)
            regions.append((rx, ry, bits, "or"))
            continue
        if s.seg_type in _REFINEMENT_TYPES:
            if s.seg_type == 40:
                raise ValueError(
                    "JBIG2 intermediate refinement regions unsupported"
                )
            # defer: the reference is the page content as composited so
            # far, only available during the sequential composite pass
            rw, rh, rx, ry = struct.unpack(">IIII", s.data[:16])
            regions.append((rx, ry, (rw, rh, s.data), "refine"))
            continue
        if s.seg_type not in _GENERIC_TYPES:
            continue
        rw, rh, rx, ry, _comb = struct.unpack(">IIIIB", s.data[:17])
        gflags = s.data[17]
        if gflags & 1:  # MMR: shared T.6 machinery (TPGDON n/a for MMR)
            if gflags & 0x08:
                raise ValueError("JBIG2 TPGDON is invalid with MMR=1")
            bits = ccitt.decode(s.data[18:], rw, rh)
        else:  # MQ arithmetic, GB templates 0-3, nominal AT pixels
            template = (gflags >> 1) & 3
            nat = _NOMINAL_AT_T[template]
            at = s.data[18 : 18 + len(nat)]
            if at != nat:
                raise ValueError("non-nominal JBIG2 AT pixels unsupported")
            bits = _decode_generic_arith(
                s.data[18 + len(nat) :], rw, rh,
                tpgdon=bool(gflags & 0x08), template=template,
            )
        regions.append((rx, ry, bits, "or"))
    if not regions:
        raise ValueError("no region segment found")
    if page_w is None or page_h is None:
        page_w = max(
            rx + (b[0] if op == "refine" else b.shape[1])
            for rx, _, b, op in regions
        )
        page_h = max(
            ry + (b[1] if op == "refine" else b.shape[0])
            for _, ry, b, op in regions
        )
    page = np.zeros((page_h, page_w), dtype=np.uint8)
    for rx, ry, bits, op in regions:
        if op == "refine":
            rw, rh, seg_data = bits
            ref = page[ry : ry + rh, rx : rx + rw]
            _, _, refined = decode_refinement_region(seg_data, ref)
            # external comb op REPLACE (§7.4.7.5): refined content stands
            page[ry : ry + rh, rx : rx + rw] = refined[: page_h - ry, : page_w - rx]
            continue
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


def _new_cx(n: int) -> list:
    """A fresh [state, mps] context array for one T.88 context space."""
    return [[0, 0] for _ in range(n)]


# pseudo-pixel context for the TPGDON SLTP bit per GB template (§6.2.5.7;
# values under the same context composition pdf.js/jbig2dec use)
_TPGDON_CTX0 = 0x9B25
_TPGDON_CTX = {0: 0x9B25, 1: 0x0795, 2: 0x00E5, 3: 0x0195}

# nominal AT-pixel bytes per template (§6.2.5.3): template 0 carries four
# adaptive pixels, templates 1-3 one — A1=(3,-1) for template 1 and
# A1=(2,-1) for templates 2/3
_NOMINAL_AT_T = {
    0: _NOMINAL_AT,
    1: bytes([3, 0xFF]),
    2: bytes([2, 0xFF]),
    3: bytes([2, 0xFF]),
}


def _ctx_fn(template: int):
    """Per-template nominal-AT context composition (pixels sorted by
    (y, x), packed MSB-first — pdf.js CodingTemplates order, so streams
    interoperate with the open readers):
      T1 (13 bits): r2[x-1..x+2] | r1[x-2..x+3] | r0[x-3..x-1]
      T2 (10 bits): r2[x-1..x+1] | r1[x-2..x+2] | r0[x-2..x-1]
      T3 (10 bits, single reference row): r1[x-3..x+2] | r0[x-4..x-1]
    """
    if template == 1:
        def ctx(r2, r1, r0, x, w):
            return (
                (_row_bits(r2, x - 1, 4, w) << 9)
                | (_row_bits(r1, x - 2, 6, w) << 3)
                | _row_bits(r0, x - 3, 3, w)
            )
    elif template == 2:
        def ctx(r2, r1, r0, x, w):
            return (
                (_row_bits(r2, x - 1, 3, w) << 7)
                | (_row_bits(r1, x - 2, 5, w) << 2)
                | _row_bits(r0, x - 2, 2, w)
            )
    else:  # template 3: one reference row, r2 unused
        def ctx(r2, r1, r0, x, w):
            return (
                (_row_bits(r1, x - 3, 6, w) << 4)
                | _row_bits(r0, x - 4, 4, w)
            )
    return ctx


def _generic_encode_into(
    enc, gb_cx, bits: np.ndarray, tpgdon: bool = False,
    at1: Tuple[int, int] = (3, -1), template: int = 0,
) -> None:
    """MQ-encode one template-0 generic bitmap into a shared encoder with
    a caller-owned GB context array (symbol dictionaries code every symbol
    bitmap through ONE codestream + ONE context set, §6.5.8.2.1).
    ``tpgdon`` enables typical-prediction (§6.2.5.7): each row leads with
    an SLTP bit in the pseudo-pixel context; rows equal to their
    predecessor are skipped entirely — the dominant savings on scanned
    text's blank rows. ``at1`` relocates the first adaptive pixel (its
    nominal slot is (3,-1), the LSB of the middle row group): pattern-
    dictionary collective bitmaps decode with AT1=(-HDPW,0) (§6.7.5) so
    each pattern predicts from its left neighbour."""
    h, w = bits.shape
    zrow = np.zeros(w, dtype=np.uint8)
    nominal_at1 = at1 == (3, -1)
    a1x, a1y = at1
    tctx = _ctx_fn(template) if template else None
    ltp = 0
    for y in range(h):
        r2 = bits[y - 2] if y >= 2 else zrow
        r1 = bits[y - 1] if y >= 1 else zrow
        r0 = bits[y]
        if tpgdon:
            typical = int(np.array_equal(r0, r1))
            enc.encode(typical ^ ltp, _TPGDON_CTX[template], gb_cx)
            ltp = typical
            if ltp:
                continue  # row == previous row: not coded
        if tctx is not None:
            for x in range(w):
                enc.encode(int(r0[x]), tctx(r2, r1, r0, x, w), gb_cx)
        elif nominal_at1:
            for x in range(w):
                ctx = (
                    (_row_bits(r2, x - 2, 5, w) << 11)
                    | (_row_bits(r1, x - 3, 7, w) << 4)
                    | _row_bits(r0, x - 4, 4, w)
                )
                enc.encode(int(r0[x]), ctx, gb_cx)
        else:
            ra = bits[y + a1y] if 0 <= y + a1y < h else zrow
            for x in range(w):
                xa = x + a1x
                a1 = int(ra[xa]) if 0 <= xa < w else 0
                ctx = (
                    (_row_bits(r2, x - 2, 5, w) << 11)
                    | (_row_bits(r1, x - 3, 6, w) << 5)
                    | (a1 << 4)
                    | _row_bits(r0, x - 4, 4, w)
                )
                enc.encode(int(r0[x]), ctx, gb_cx)


def _generic_decode_from(
    dec, gb_cx, rw: int, rh: int, tpgdon: bool = False,
    at1: Tuple[int, int] = (3, -1), template: int = 0,
) -> np.ndarray:
    """Mirror of :func:`_generic_encode_into` over a shared decoder."""
    out = np.zeros((rh, rw), dtype=np.uint8)
    zrow = np.zeros(rw, dtype=np.uint8)
    nominal_at1 = at1 == (3, -1)
    a1x, a1y = at1
    tctx = _ctx_fn(template) if template else None
    ltp = 0
    for y in range(rh):
        r2 = out[y - 2] if y >= 2 else zrow
        r1 = out[y - 1] if y >= 1 else zrow
        r0 = out[y]
        if tpgdon:
            ltp ^= dec.decode(_TPGDON_CTX[template], gb_cx)
            if ltp:
                out[y] = r1  # typical row: copy of the previous row
                continue
        if tctx is not None:
            for x in range(rw):
                r0[x] = dec.decode(tctx(r2, r1, r0, x, rw), gb_cx)
        elif nominal_at1:
            for x in range(rw):
                ctx = (
                    (_row_bits(r2, x - 2, 5, rw) << 11)
                    | (_row_bits(r1, x - 3, 7, rw) << 4)
                    | _row_bits(r0, x - 4, 4, rw)
                )
                r0[x] = dec.decode(ctx, gb_cx)
        else:
            ra = out[y + a1y] if 0 <= y + a1y < rh else zrow
            for x in range(rw):
                xa = x + a1x
                a1 = int(ra[xa]) if 0 <= xa < rw else 0
                ctx = (
                    (_row_bits(r2, x - 2, 5, rw) << 11)
                    | (_row_bits(r1, x - 3, 6, rw) << 5)
                    | (a1 << 4)
                    | _row_bits(r0, x - 4, 4, rw)
                )
                r0[x] = dec.decode(ctx, gb_cx)
    return out


def encode_generic_arith(
    bits: np.ndarray, page: int = 1, tpgdon: bool = False,
    template: int = 0,
) -> bytes:
    """Ink bitmap -> embedded JBIG2 stream with an MQ-coded (MMR=0,
    GB template 0-3, nominal AT) immediate lossless generic region — the
    coding real scanned-document producers emit. ``tpgdon`` turns on
    typical prediction (flags bit 3), the option jbig2enc enables by
    default; ``template`` selects the context template (§6.2.5.3 —
    templates 1-3 trade context size for speed and appear in real
    encoder output; pdfium/pdf.js decode all four)."""
    from docprompt_spark.mq import MQEncoder

    bits = np.asarray(bits, dtype=np.uint8)
    h, w = bits.shape
    enc = MQEncoder(1)
    _generic_encode_into(
        enc, _new_cx(1 << 16), bits, tpgdon=tpgdon, template=template
    )
    mqdata = enc.flush()

    page_info = struct.pack(">IIIIBH", w, h, 0, 0, 0, 0)
    region_info = struct.pack(">IIIIB", w, h, 0, 0, 0)
    gflags = (0x08 if tpgdon else 0) | (template << 1)  # MMR=0
    generic = region_info + bytes([gflags]) + _NOMINAL_AT_T[template] + mqdata
    out = _segment_header(0, SEG_PAGE_INFO, page, len(page_info)) + page_info
    out += (
        _segment_header(1, SEG_IMM_LOSSLESS_GENERIC, page, len(generic))
        + generic
    )
    out += _segment_header(2, SEG_END_OF_PAGE, page, 0)
    return out


def _decode_generic_arith(
    data: bytes, rw: int, rh: int, tpgdon: bool = False, template: int = 0
) -> np.ndarray:
    from docprompt_spark.mq import MQDecoder

    return _generic_decode_from(
        MQDecoder(data, 1), _new_cx(1 << 16), rw, rh, tpgdon=tpgdon,
        template=template,
    )


# ---------------------------------------------------------------------------
# Symbol dictionaries + text regions (T.88 §6.4-6.5, §7.4.3-7.4.4, Annex A)
# ---------------------------------------------------------------------------
#
# Text regions are THE dominant JBIG2 mode in real scanned PDFs: a page is
# coded as a dictionary of distinct small bitmaps ("symbols", each an MQ
# generic region sharing one codestream + one GB context set) plus a list
# of placements decoded with the Annex-A arithmetic INTEGER procedures
# (IADH/IADW/IAEX for the dictionary; IADT/IAFS/IADS/IAIT/IAID for the
# region). The reference decodes these through pdfium (_pdfium.py:126-151);
# here both directions are from scratch over :mod:`docprompt_spark.mq`.
#
# Arithmetic profile only (SDHUFF=0, SDREFAGG=0, template 0, nominal AT) —
# the profile mainstream encoders emit. Huffman-coded dictionaries and
# refinement/aggregate coding raise.

SEG_SYMBOL_DICT = 0
SEG_IMM_TEXT = 6
SEG_IMM_LOSSLESS_TEXT = 7
_TEXT_TYPES = (4, SEG_IMM_TEXT, SEG_IMM_LOSSLESS_TEXT)

_OOB = None  # Annex A out-of-band return

# REFCORNER codes (§7.4.4.1.1)
_BOTTOMLEFT, _TOPLEFT, _BOTTOMRIGHT, _TOPRIGHT = 0, 1, 2, 3


def _int_decode(dec, cx) -> Optional[int]:
    """T.88 Annex A.2 arithmetic integer decoding (IAx): a sign bit, a
    unary-ish bucket prefix, then 2/4/6/8/12/32 magnitude bits, every bit
    decoded in a PREV-addressed 512-entry context space."""
    prev = 1

    def bit() -> int:
        nonlocal prev
        b = dec.decode(prev, cx)
        prev = (prev << 1) | b if prev < 256 else ((((prev << 1) | b) & 511) | 256)
        return b

    def bits(n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | bit()
        return v

    s = bit()
    if not bit():
        v = bits(2)
    elif not bit():
        v = bits(4) + 4
    elif not bit():
        v = bits(6) + 20
    elif not bit():
        v = bits(8) + 84
    elif not bit():
        v = bits(12) + 340
    else:
        v = bits(32) + 4436
    if s:
        return -v if v > 0 else _OOB
    return v


_INT_BUCKETS = ((2, 0), (4, 4), (6, 20), (8, 84), (12, 340), (32, 4436))


def _int_encode(enc, cx, value: Optional[int]) -> None:
    """Annex A.2 mirror. ``None`` encodes OOB (sign 1, magnitude 0)."""
    prev = 1

    def bit(b: int) -> None:
        nonlocal prev
        enc.encode(b, prev, cx)
        prev = (prev << 1) | b if prev < 256 else ((((prev << 1) | b) & 511) | 256)

    if value is _OOB:
        s, v = 1, 0
    else:
        s, v = (1, -value) if value < 0 else (0, value)
    bit(s)
    for i, (n, off) in enumerate(_INT_BUCKETS):
        hi = off + (1 << n) - 1 if n < 32 else None
        if hi is None or v <= hi:
            for _ in range(i):
                bit(1)
            if i < len(_INT_BUCKETS) - 1:
                bit(0)
            m = v - off
            for k in range(n - 1, -1, -1):
                bit((m >> k) & 1)
            return
    raise AssertionError("unreachable")


def _iaid_decode(dec, cx, symcodelen: int) -> int:
    """Annex A.3: SYMCODELEN tree-addressed bits; context space is
    2^(SYMCODELEN+1) entries, PREV never clamps."""
    prev = 1
    for _ in range(symcodelen):
        prev = (prev << 1) | dec.decode(prev, cx)
    return prev - (1 << symcodelen)


def _iaid_encode(enc, cx, symcodelen: int, sym_id: int) -> None:
    prev = 1
    for k in range(symcodelen - 1, -1, -1):
        b = (sym_id >> k) & 1
        enc.encode(b, prev, cx)
        prev = (prev << 1) | b


def _symcodelen(n_syms: int) -> int:
    """max(1, ceil(log2(SBNUMSYMS))) — the T.88 amendment form jbig2dec
    uses; exact for every n >= 1."""
    n = max(1, n_syms)
    return max(1, (n - 1).bit_length())


def decode_symbol_dict(data: bytes) -> List[np.ndarray]:
    """Symbol dictionary segment data -> exported symbol bitmaps (§6.5).

    Arithmetic profile: SDHUFF=0, SDREFAGG=0, SDTEMPLATE=0, nominal AT.
    Height classes decode via IADH/IADW deltas; every symbol bitmap is a
    template-0 generic region over ONE shared MQ decoder + GB context set;
    the export list comes from IAEX run lengths (§6.5.10)."""
    from docprompt_spark.mq import MQDecoder

    (flags,) = struct.unpack(">H", data[:2])
    pos = 2
    sdhuff = flags & 1
    sdrefagg = (flags >> 1) & 1
    sdtemplate = (flags >> 10) & 3
    if sdhuff or sdrefagg:
        raise ValueError("JBIG2 Huffman/refinement symbol dicts unsupported")
    if sdtemplate != 0:
        raise ValueError(f"JBIG2 SDTEMPLATE {sdtemplate} unsupported")
    at = data[pos : pos + 8]
    pos += 8
    if at != _NOMINAL_AT:
        raise ValueError("non-nominal JBIG2 AT pixels unsupported")
    n_ex, n_new = struct.unpack(">II", data[pos : pos + 8])
    pos += 8

    dec = MQDecoder(data[pos:], 1)
    gb = _new_cx(1 << 16)
    iadh, iadw, iaex = _new_cx(512), _new_cx(512), _new_cx(512)

    new_syms: List[np.ndarray] = []
    hc_height = 0
    while len(new_syms) < n_new:
        dh = _int_decode(dec, iadh)
        if dh is _OOB:
            raise ValueError("JBIG2 symbol dict: OOB height-class delta")
        hc_height += dh
        sym_width = 0
        while True:
            dw = _int_decode(dec, iadw)
            if dw is _OOB:
                break
            sym_width += dw
            if sym_width <= 0 or hc_height <= 0 or len(new_syms) >= n_new:
                raise ValueError("JBIG2 symbol dict: invalid symbol size")
            new_syms.append(_generic_decode_from(dec, gb, sym_width, hc_height))

    # §6.5.10 export flags: alternating no-export/export run lengths
    exported: List[np.ndarray] = []
    idx, cur = 0, 0
    while idx < len(new_syms):
        run = _int_decode(dec, iaex)
        if run is _OOB or run < 0:
            raise ValueError("JBIG2 symbol dict: bad export run")
        if cur:
            exported.extend(new_syms[idx : idx + run])
        idx += run
        cur = 1 - cur
    if len(exported) != n_ex:
        raise ValueError(
            f"JBIG2 symbol dict: exported {len(exported)} != SDNUMEXSYMS {n_ex}"
        )
    return exported


def encode_symbol_dict(symbols: List[np.ndarray]) -> bytes:
    """Symbols (ink bitmaps, EXPORT ORDER = input order after the caller's
    height/width sort) -> symbol dictionary segment data. Caller must pass
    symbols sorted by (height, width) so the IADH/IADW deltas are the
    canonical non-negative ones real encoders emit."""
    from docprompt_spark.mq import MQEncoder

    enc = MQEncoder(1)
    gb = _new_cx(1 << 16)
    iadh, iadw, iaex = _new_cx(512), _new_cx(512), _new_cx(512)

    hc_height = 0
    i = 0
    while i < len(symbols):
        h = symbols[i].shape[0]
        _int_encode(enc, iadh, h - hc_height)
        hc_height = h
        sym_width = 0
        while i < len(symbols) and symbols[i].shape[0] == h:
            w = symbols[i].shape[1]
            _int_encode(enc, iadw, w - sym_width)
            sym_width = w
            _generic_encode_into(enc, gb, symbols[i])
            i += 1
        _int_encode(enc, iadw, _OOB)
    # export all symbols: run of 0 non-exported, then run of all exported
    _int_encode(enc, iaex, 0)
    _int_encode(enc, iaex, len(symbols))
    coded = enc.flush()

    flags = 0  # SDHUFF=0 SDREFAGG=0 SDTEMPLATE=0 SDRTEMPLATE=0
    return (
        struct.pack(">H", flags)
        + _NOMINAL_AT
        + struct.pack(">II", len(symbols), len(symbols))
        + coded
    )


def decode_text_region(data: bytes, symbols: List[np.ndarray]):
    """Text region segment data -> (x, y, bitmap) placed region (§6.4).

    Arithmetic symbol IDs (SBHUFF=0), no refinement (SBREFINE=0); all four
    REFCORNERs and TRANSPOSED supported; SBSTRIPS strips with per-instance
    CURT; SBDSOFFSET applied; composition onto the region bitmap is OR."""
    from docprompt_spark.mq import MQDecoder

    rw, rh, rx, ry, _comb = struct.unpack(">IIIIB", data[:17])
    (flags,) = struct.unpack(">H", data[17:19])
    pos = 19
    sbhuff = flags & 1
    refine = (flags >> 1) & 1
    log_strips = (flags >> 2) & 3
    refcorner = (flags >> 4) & 3
    transposed = (flags >> 6) & 1
    _sbcombop = (flags >> 7) & 3
    defpixel = (flags >> 9) & 1
    dsoffset = (flags >> 10) & 0x1F
    if dsoffset > 15:
        dsoffset -= 32  # signed 5-bit
    if sbhuff:
        raise ValueError("JBIG2 Huffman text regions unsupported")
    if refine:
        raise ValueError("JBIG2 refinement text regions unsupported")
    strips = 1 << log_strips
    (n_instances,) = struct.unpack(">I", data[pos : pos + 4])
    pos += 4

    n_syms = len(symbols)
    if n_syms == 0:
        raise ValueError("JBIG2 text region with no symbols")
    symcodelen = _symcodelen(n_syms)

    dec = MQDecoder(data[pos:], 1)
    iadt, iafs, iads, iait = (_new_cx(512) for _ in range(4))
    iaid = _new_cx(1 << (symcodelen + 1))

    region = np.full((rh, rw), defpixel, dtype=np.uint8)

    def draw(bm: np.ndarray, x: int, y: int) -> None:
        h, w = bm.shape
        y0, x0 = max(y, 0), max(x, 0)
        y1, x1 = min(y + h, rh), min(x + w, rw)
        if y0 < y1 and x0 < x1:
            region[y0:y1, x0:x1] |= bm[y0 - y : y1 - y, x0 - x : x1 - x]

    stript = -_int_decode(dec, iadt) * strips
    firsts = 0
    placed = 0
    while placed < n_instances:
        stript += _int_decode(dec, iadt) * strips
        firsts += _int_decode(dec, iafs)
        curs = firsts
        first = True
        while True:
            if not first:
                ids = _int_decode(dec, iads)
                if ids is _OOB:
                    break
                curs += ids + dsoffset
            first = False
            curt = 0 if strips == 1 else _int_decode(dec, iait)
            ti = stript + curt
            sym_id = _iaid_decode(dec, iaid, symcodelen)
            if sym_id >= n_syms:
                raise ValueError(f"JBIG2 symbol id {sym_id} out of range")
            bm = symbols[sym_id]
            hi, wi = bm.shape
            # §6.4.5 3(c)(viii-xi): right/bottom corners advance S before
            # the draw, left/top after; the draw places the reference
            # corner at (S, T)
            if not transposed:
                if refcorner in (_TOPRIGHT, _BOTTOMRIGHT):
                    curs += wi - 1
                x = curs - (wi - 1 if refcorner in (_TOPRIGHT, _BOTTOMRIGHT) else 0)
                y = ti - (hi - 1 if refcorner in (_BOTTOMLEFT, _BOTTOMRIGHT) else 0)
                draw(bm, x, y)
                if refcorner in (_TOPLEFT, _BOTTOMLEFT):
                    curs += wi - 1
            else:
                if refcorner in (_BOTTOMLEFT, _BOTTOMRIGHT):
                    curs += hi - 1
                y = curs - (hi - 1 if refcorner in (_BOTTOMLEFT, _BOTTOMRIGHT) else 0)
                x = ti - (wi - 1 if refcorner in (_TOPRIGHT, _BOTTOMRIGHT) else 0)
                draw(bm, x, y)
                if refcorner in (_TOPLEFT, _TOPRIGHT):
                    curs += hi - 1
            placed += 1
            if placed >= n_instances:
                break
    return rx, ry, region


def encode_text_region(
    symbols: List[np.ndarray],
    placements: List[Tuple[int, int, int]],
    width: int,
    height: int,
    refcorner: int = _TOPLEFT,
    transposed: bool = False,
) -> bytes:
    """(sym_idx, x, y) placements (x, y = TOP-LEFT pixel of the symbol on
    the region) -> text region segment data. The encoder simulates the
    decoder's CURS bookkeeping, so any REFCORNER/TRANSPOSED combination
    round-trips bit-exactly; strips are SBSTRIPS=1 rows of equal T."""
    from docprompt_spark.mq import MQEncoder

    n_syms = len(symbols)
    symcodelen = _symcodelen(n_syms)

    def t_of(sym_idx: int, x: int, y: int) -> int:
        h, w = symbols[sym_idx].shape
        if not transposed:
            return y + (h - 1 if refcorner in (_BOTTOMLEFT, _BOTTOMRIGHT) else 0)
        return x + (w - 1 if refcorner in (_TOPRIGHT, _BOTTOMRIGHT) else 0)

    def s_edge(sym_idx: int, x: int, y: int) -> Tuple[int, int]:
        """(leading S the coder targets, trailing S after the instance) —
        identical for left and right corners (see decode_text_region)."""
        h, w = symbols[sym_idx].shape
        if not transposed:
            return x, x + w - 1
        return y, y + h - 1

    order = sorted(
        range(len(placements)),
        key=lambda k: (t_of(*placements[k]), s_edge(*placements[k])[0]),
    )

    enc = MQEncoder(1)
    iadt, iafs, iads, iait = (_new_cx(512) for _ in range(4))
    iaid = _new_cx(1 << (symcodelen + 1))

    _int_encode(enc, iadt, 0)  # STRIPT init: 0
    stript = 0
    firsts = 0
    i = 0
    while i < len(order):
        t = t_of(*placements[order[i]])
        _int_encode(enc, iadt, t - stript)
        stript = t
        # first instance of the strip
        s0, s_trail = s_edge(*placements[order[i]])
        _int_encode(enc, iafs, s0 - firsts)
        firsts = s0
        _iaid_encode(enc, iaid, symcodelen, placements[order[i]][0])
        curs = s_trail
        i += 1
        while i < len(order) and t_of(*placements[order[i]]) == t:
            s0, s_trail = s_edge(*placements[order[i]])
            _int_encode(enc, iads, s0 - curs)
            _iaid_encode(enc, iaid, symcodelen, placements[order[i]][0])
            curs = s_trail
            i += 1
        _int_encode(enc, iads, _OOB)
    coded = enc.flush()

    flags = (
        (0 << 2)  # LOGSBSTRIPS = 0 -> SBSTRIPS 1
        | (refcorner << 4)
        | ((1 if transposed else 0) << 6)
        | (0 << 7)  # SBCOMBOP OR
        | (0 << 9)  # SBDEFPIXEL
        | (0 << 10)  # SBDSOFFSET
    )
    region_info = struct.pack(">IIIIB", width, height, 0, 0, 0)
    return (
        region_info
        + struct.pack(">H", flags)
        + struct.pack(">I", len(placements))
        + coded
    )


def encode_symbol_text(
    symbols: List[np.ndarray],
    placements: List[Tuple[int, int, int]],
    width: int,
    height: int,
    page: int = 1,
    refcorner: int = _TOPLEFT,
    transposed: bool = False,
) -> bytes:
    """Symbols + placements -> full embedded JBIG2 stream: page info +
    symbol dictionary + immediate lossless text region + end of page.
    Symbols are height/width-sorted into dictionary order internally;
    placement indices refer to the INPUT order."""
    sort_order = sorted(
        range(len(symbols)),
        key=lambda k: (symbols[k].shape[0], symbols[k].shape[1], k),
    )
    remap = {old: new for new, old in enumerate(sort_order)}
    dict_syms = [np.asarray(symbols[k], dtype=np.uint8) for k in sort_order]
    dict_places = [(remap[si], x, y) for si, x, y in placements]

    sd = encode_symbol_dict(dict_syms)
    tr = encode_text_region(
        dict_syms, dict_places, width, height,
        refcorner=refcorner, transposed=transposed,
    )
    page_info = struct.pack(">IIIIBH", width, height, 0, 0, 0, 0)
    out = _segment_header(0, SEG_PAGE_INFO, page, len(page_info)) + page_info
    out += _segment_header(1, SEG_SYMBOL_DICT, page, len(sd)) + sd
    out += (
        _segment_header(2, SEG_IMM_LOSSLESS_TEXT, page, len(tr), referred=(1,))
        + tr
    )
    out += _segment_header(3, SEG_END_OF_PAGE, page, 0)
    return out


def encode_gray8_symbols(
    arr: np.ndarray, threshold: int = 128, tile: Tuple[int, int] = (4, 8)
) -> bytes:
    """Threshold gray8 and code it SYMBOL-WISE: the bitmap is cut into a
    grid of (th, tw) tiles, distinct tiles become dictionary symbols, and
    the page is a text region of tile placements — the textual-region form
    real scanned-document encoders emit (lossless here: every tile is a
    symbol, so decode == threshold exactly)."""
    bits = (np.asarray(arr) < threshold).astype(np.uint8)
    h, w = bits.shape
    th, tw = tile
    assert h % th == 0 and w % tw == 0, "tile must divide the bitmap"
    uniq: dict = {}
    symbols: List[np.ndarray] = []
    placements: List[Tuple[int, int, int]] = []
    for y in range(0, h, th):
        for x in range(0, w, tw):
            t = bits[y : y + th, x : x + tw]
            key = t.tobytes()
            if key not in uniq:
                uniq[key] = len(symbols)
                symbols.append(t.copy())
            placements.append((uniq[key], x, y))
    return encode_symbol_text(symbols, placements, w, h)


# ---------------------------------------------------------------------------
# Pattern dictionaries + halftone regions (T.88 §6.6-6.7, §7.4.4-7.4.5)
# ---------------------------------------------------------------------------
#
# Halftone regions are how JBIG2 codes GRAYSCALE: a pattern dictionary
# (one collective generic bitmap cut into HDPW-wide cells) plus a gray-
# scale image coded as Gray-coded bitplanes (Annex C.5), each bitplane a
# template-0 generic region sharing ONE MQ codestream + context set; each
# grid cell then stamps pattern HPATS[gray] onto the page. Arithmetic
# profile only (HMMR=0, template 0, no skip bitmap), unskewed grids on the
# encoder side; the decoder honours the full fixed-point 24.8 grid vectors
# the way jbig2dec/pdf.js do: x = (HGX + mg*HRY + ng*HRX) >> 8,
# y = (HGY + mg*HRX - ng*HRY) >> 8.

SEG_PATTERN_DICT = 16
SEG_IMM_HALFTONE = 22
SEG_IMM_LOSSLESS_HALFTONE = 23
_HALFTONE_TYPES = (20, SEG_IMM_HALFTONE, SEG_IMM_LOSSLESS_HALFTONE)


def decode_pattern_dict(data: bytes) -> List[np.ndarray]:
    """Pattern dictionary segment payload -> list of HDPH x HDPW bitmaps.

    §6.7.5: the patterns arrive as ONE collective generic bitmap of width
    (GRAYMAX+1)*HDPW decoded with AT1=(-HDPW, 0) (each pattern predicts
    from its left neighbour), then sliced column-wise."""
    flags = data[0]
    if flags & 1:
        raise ValueError("JBIG2 MMR pattern dictionaries unsupported")
    if (flags >> 1) & 3:
        raise ValueError("JBIG2 HD template != 0 unsupported")
    hdpw, hdph = data[1], data[2]
    graymax = struct.unpack(">I", data[3:7])[0]
    from docprompt_spark.mq import MQDecoder

    collective = _generic_decode_from(
        MQDecoder(data[7:], 1), _new_cx(1 << 16),
        (graymax + 1) * hdpw, hdph, at1=(-hdpw, 0),
    )
    return [
        collective[:, i * hdpw : (i + 1) * hdpw].copy()
        for i in range(graymax + 1)
    ]


def encode_pattern_dict(patterns: List[np.ndarray]) -> bytes:
    """Patterns (equal HDPH x HDPW bitmaps) -> pattern dictionary payload."""
    from docprompt_spark.mq import MQEncoder

    hdph, hdpw = patterns[0].shape
    collective = np.concatenate(patterns, axis=1)
    enc = MQEncoder(1)
    _generic_encode_into(enc, _new_cx(1 << 16), collective, at1=(-hdpw, 0))
    return (
        bytes([0, hdpw, hdph])
        + struct.pack(">I", len(patterns) - 1)
        + enc.flush()
    )


def _gray_planes_decode(dec, gb_cx, gw: int, gh: int, bpp: int) -> np.ndarray:
    """Annex C.5 gray-scale image decoding: bitplanes MSB->LSB through one
    decoder; plane j (j < bpp-1) holds GRAY code and XORs with the already-
    decoded bit above it."""
    vals = np.zeros((gh, gw), dtype=np.int64)
    prev = None
    for j in range(bpp - 1, -1, -1):
        plane = _generic_decode_from(dec, gb_cx, gw, gh, tpgdon=False)
        if prev is not None:
            plane ^= prev
        vals |= plane.astype(np.int64) << j
        prev = plane
    return vals


def _gray_planes_encode(enc, gb_cx, vals: np.ndarray, bpp: int) -> None:
    """Mirror of :func:`_gray_planes_decode`: code C_{bpp-1}=B_{bpp-1} and
    C_j = B_j XOR B_{j+1} (Gray code) MSB-first."""
    prev = None
    for j in range(bpp - 1, -1, -1):
        plane = ((vals >> j) & 1).astype(np.uint8)
        coded = plane if prev is None else plane ^ prev
        _generic_encode_into(enc, gb_cx, coded, tpgdon=False)
        prev = plane
    return None


def decode_halftone_region(
    data: bytes, patterns: List[np.ndarray]
) -> Tuple[int, int, np.ndarray]:
    """Halftone region segment payload -> (x, y, region bitmap)."""
    rw, rh, rx, ry, _comb = struct.unpack(">IIIIB", data[:17])
    hflags = data[17]
    if hflags & 1:
        raise ValueError("JBIG2 MMR halftone regions unsupported")
    if (hflags >> 1) & 3:
        raise ValueError("JBIG2 halftone template != 0 unsupported")
    if (hflags >> 3) & 1:
        raise ValueError("JBIG2 halftone skip bitmaps unsupported")
    defpix = (hflags >> 7) & 1
    hgw, hgh = struct.unpack(">II", data[18:26])
    hgx, hgy = struct.unpack(">ii", data[26:34])
    hrx, hry = struct.unpack(">HH", data[34:38])
    if not patterns:
        raise ValueError("halftone region without a pattern dictionary")
    bpp = max(1, (len(patterns) - 1).bit_length())
    from docprompt_spark.mq import MQDecoder

    gray = _gray_planes_decode(
        MQDecoder(data[38:], 1), _new_cx(1 << 16), hgw, hgh, bpp
    )
    region = np.full((rh, rw), defpix, dtype=np.uint8)
    hdph, hdpw = patterns[0].shape
    nmax = len(patterns) - 1
    for mg in range(hgh):
        for ng in range(hgw):
            x = (hgx + mg * hry + ng * hrx) >> 8
            y = (hgy + mg * hrx - ng * hry) >> 8
            pat = patterns[min(int(gray[mg, ng]), nmax)]
            if x >= rw or y >= rh or x + hdpw <= 0 or y + hdph <= 0:
                continue
            x0, y0 = max(x, 0), max(y, 0)
            x1, y1 = min(x + hdpw, rw), min(y + hdph, rh)
            region[y0:y1, x0:x1] |= pat[y0 - y : y1 - y, x0 - x : x1 - x]
    return rx, ry, region


# the clustered-dot growth order for the encoder's 4x4 patterns: pattern i
# has the first i cells of this sequence set (a Bayer-style spiral so dots
# grow from the cell centre — what halftone screens look like)
_HT_ORDER = [
    (1, 1), (2, 2), (1, 2), (2, 1), (0, 1), (3, 2), (0, 2), (3, 1),
    (1, 0), (2, 3), (1, 3), (2, 0), (0, 0), (3, 3), (0, 3), (3, 0),
]


def halftone_patterns(cell: Tuple[int, int] = (4, 4)) -> List[np.ndarray]:
    """The encoder's 17-level clustered-dot pattern set (0..16 ink pixels
    in a 4x4 cell)."""
    th, tw = cell
    assert (th, tw) == (4, 4), "encoder patterns are 4x4"
    pats = []
    for lvl in range(len(_HT_ORDER) + 1):
        p = np.zeros((th, tw), dtype=np.uint8)
        for (yy, xx) in _HT_ORDER[:lvl]:
            p[yy, xx] = 1
        pats.append(p)
    return pats


def encode_gray8_halftone(arr: np.ndarray, page: int = 1) -> bytes:
    """Gray8 image -> embedded JBIG2 stream coded as a PATTERN DICTIONARY
    + HALFTONE REGION (the JBIG2-native grayscale representation): each
    4x4 cell's mean darkness picks one of 17 clustered-dot patterns; the
    pattern indices are Gray-coded bitplanes. Deterministic, so
    decode(encode(arr)) is the ground truth both sides compute."""
    arr = np.asarray(arr)
    h, w = arr.shape
    assert h % 4 == 0 and w % 4 == 0, "halftone encoder needs 4x4 cells"
    patterns = halftone_patterns()
    graymax = len(patterns) - 1
    # per-cell mean darkness -> pattern level (0..16), floor-division
    # determinism (no float rounding)
    cells = arr.reshape(h // 4, 4, w // 4, 4).astype(np.int64)
    mean4 = cells.sum(axis=(1, 3))  # sum of 16 samples, 0..4080
    level = ((255 * 16 - mean4) * graymax + (255 * 16 // 2)) // (255 * 16)
    level = np.clip(level, 0, graymax)

    from docprompt_spark.mq import MQEncoder

    bpp = max(1, graymax.bit_length())
    enc = MQEncoder(1)
    _gray_planes_encode(enc, _new_cx(1 << 16), level, bpp)
    gray_data = enc.flush()

    hgw, hgh = w // 4, h // 4
    region_info = struct.pack(">IIIIB", w, h, 0, 0, 0)
    ht = (
        region_info
        + bytes([0])  # HMMR=0, template 0, no skip, comb OR, defpix 0
        + struct.pack(">II", hgw, hgh)
        + struct.pack(">ii", 0, 0)
        + struct.pack(">HH", 4 << 8, 0)  # unskewed 4px grid, 24.8 fixed
        + gray_data
    )
    pat_data = encode_pattern_dict(patterns)
    page_info = struct.pack(">IIIIBH", w, h, 0, 0, 0, 0)
    out = _segment_header(0, SEG_PAGE_INFO, page, len(page_info)) + page_info
    out += _segment_header(1, SEG_PATTERN_DICT, page, len(pat_data)) + pat_data
    out += (
        _segment_header(
            2, SEG_IMM_LOSSLESS_HALFTONE, page, len(ht), referred=(1,)
        )
        + ht
    )
    out += _segment_header(3, SEG_END_OF_PAGE, page, 0)
    return out


# ---------------------------------------------------------------------------
# Generic refinement regions (T.88 §6.3, §7.4.7)
# ---------------------------------------------------------------------------
#
# A refinement region re-codes a window of the page against what is
# already there: each pixel's context mixes already-decoded neighbours of
# the CURRENT bitmap with a 3x3 neighbourhood of the REFERENCE bitmap.
# GRTEMPLATE=1 (the 10-pixel fixed template, no AT pixels) with optional
# TPGRON typical prediction (§6.3.5.6: rows flagged typical take any pixel
# whose reference 3x3 neighbourhood is uniform straight from the
# reference). Context bit order matches pdf.js's RefinementTemplates[1]
# (coding pixels then reference pixels, MSB first), TPGRON pseudo-context
# 0x0008. GRTEMPLATE=0 raises (13-pixel AT form; not emitted here).

SEG_IMM_REFINEMENT = 42
SEG_IMM_LOSSLESS_REFINEMENT = 43
_REFINEMENT_TYPES = (40, SEG_IMM_REFINEMENT, SEG_IMM_LOSSLESS_REFINEMENT)

_TPGRON_CTX1 = 0x0008

# GRTEMPLATE=1 pixel order: 4 coding (current bitmap) + 6 reference
_GR1_CODING = ((-1, -1), (0, -1), (1, -1), (-1, 0))
_GR1_REFERENCE = ((0, -1), (-1, 0), (0, 0), (1, 0), (0, 1), (1, 1))


def _gr1_ref_uniform(ref: np.ndarray, x: int, y: int) -> Optional[int]:
    """The TPGRON typical-pixel rule: the reference 3x3 around (x, y),
    out-of-bounds = 0; returns 0/1 when uniform, None otherwise."""
    h, w = ref.shape
    total = 0
    for vy in (-1, 0, 1):
        for vx in (-1, 0, 1):
            xx, yy = x + vx, y + vy
            total += int(ref[yy, xx]) if 0 <= xx < w and 0 <= yy < h else 0
    if total == 0:
        return 0
    if total == 9:
        return 1
    return None


def _gr1_context(cur: np.ndarray, ref: np.ndarray, x: int, y: int,
                 dx: int, dy: int) -> int:
    ch, cw = cur.shape
    rh, rw = ref.shape
    ctx = 0
    for vx, vy in _GR1_CODING:
        xx, yy = x + vx, y + vy
        ctx = (ctx << 1) | (
            int(cur[yy, xx]) if 0 <= xx < cw and 0 <= yy < ch else 0
        )
    for vx, vy in _GR1_REFERENCE:
        xx, yy = x - dx + vx, y - dy + vy
        ctx = (ctx << 1) | (
            int(ref[yy, xx]) if 0 <= xx < rw and 0 <= yy < rh else 0
        )
    return ctx


def _refine_encode_into(enc, gr_cx, bits: np.ndarray, ref: np.ndarray,
                        dx: int = 0, dy: int = 0,
                        tpgron: bool = False) -> None:
    h, w = bits.shape
    ltp = 0
    for y in range(h):
        if tpgron:
            typical = 1
            for x in range(w):
                u = _gr1_ref_uniform(ref, x - dx, y - dy)
                if u is None or u == int(bits[y, x]):
                    continue
                typical = 0
                break
            enc.encode(typical ^ ltp, _TPGRON_CTX1, gr_cx)
            ltp = typical
        for x in range(w):
            if tpgron and ltp:
                u = _gr1_ref_uniform(ref, x - dx, y - dy)
                if u is not None:
                    continue  # pixel implied by the uniform neighbourhood
            enc.encode(
                int(bits[y, x]), _gr1_context(bits, ref, x, y, dx, dy), gr_cx
            )


def _refine_decode_from(dec, gr_cx, rw: int, rh: int, ref: np.ndarray,
                        dx: int = 0, dy: int = 0,
                        tpgron: bool = False) -> np.ndarray:
    out = np.zeros((rh, rw), dtype=np.uint8)
    ltp = 0
    for y in range(rh):
        if tpgron:
            ltp ^= dec.decode(_TPGRON_CTX1, gr_cx)
        for x in range(rw):
            if tpgron and ltp:
                u = _gr1_ref_uniform(ref, x - dx, y - dy)
                if u is not None:
                    out[y, x] = u
                    continue
            out[y, x] = dec.decode(
                _gr1_context(out, ref, x, y, dx, dy), gr_cx
            )
    return out


def decode_refinement_region(
    data: bytes, ref: np.ndarray
) -> Tuple[int, int, np.ndarray]:
    """Refinement region segment payload + reference window -> (x, y,
    refined bitmap). The caller supplies the page content under the
    region (§6.3.2: a refinement region with no referred intermediate
    region refines the page itself) and REPLACEs it with the result."""
    rw, rh, rx, ry, _comb = struct.unpack(">IIIIB", data[:17])
    rflags = data[17]
    if (rflags & 1) == 0:
        raise ValueError("JBIG2 GRTEMPLATE 0 refinement unsupported")
    tpgron = bool(rflags & 2)
    from docprompt_spark.mq import MQDecoder

    bits = _refine_decode_from(
        MQDecoder(data[18:], 1), _new_cx(1 << 13), rw, rh, ref,
        tpgron=tpgron,
    )
    return rx, ry, bits


def encode_refined(final: np.ndarray, base: np.ndarray, page: int = 1,
                   tpgron: bool = True) -> bytes:
    """Two-stage stream: a generic region carrying ``base`` then an
    immediate lossless REFINEMENT region (GRTEMPLATE=1) correcting it to
    ``final`` — the progressive/lossy-then-lossless organization §6.3
    exists for. decode() returns exactly ``final``."""
    from docprompt_spark.mq import MQEncoder

    final = np.asarray(final, dtype=np.uint8)
    base = np.asarray(base, dtype=np.uint8)
    assert final.shape == base.shape
    h, w = final.shape

    enc = MQEncoder(1)
    _generic_encode_into(enc, _new_cx(1 << 16), base)
    base_mq = enc.flush()

    enc = MQEncoder(1)
    _refine_encode_into(enc, _new_cx(1 << 13), final, base, tpgron=tpgron)
    ref_mq = enc.flush()

    page_info = struct.pack(">IIIIBH", w, h, 0, 0, 0, 0)
    region_info = struct.pack(">IIIIB", w, h, 0, 0, 0)
    generic = region_info + bytes([0]) + _NOMINAL_AT + base_mq
    rflags = 1 | (2 if tpgron else 0)  # GRTEMPLATE=1
    refinement = region_info + bytes([rflags]) + ref_mq
    out = _segment_header(0, SEG_PAGE_INFO, page, len(page_info)) + page_info
    out += (
        _segment_header(1, SEG_IMM_LOSSLESS_GENERIC, page, len(generic))
        + generic
    )
    out += (
        _segment_header(
            2, SEG_IMM_LOSSLESS_REFINEMENT, page, len(refinement)
        )
        + refinement
    )
    out += _segment_header(3, SEG_END_OF_PAGE, page, 0)
    return out
