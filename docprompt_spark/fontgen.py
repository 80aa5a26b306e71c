"""Deterministic outline-font authoring: real CFF (Type1C) font programs
for the synthetic corpus.

The reference renders text through pdfium's font rasterizer
(docprompt _pdfium.py:126-135); round 3's rasterizer painted *glyph cells*
instead (documented divergence). This module closes that gap from the
authoring side: every corpus document now EMBEDS a genuine CFF font program
(/FontFile3 /Subtype /Type1C) whose Type2 charstrings carry real glyph
outlines, and the rasterizer renders those outlines by interpreting the
charstrings it parses back out of the document
(:func:`docprompt_spark.cff.cff_glyph_outlines`) — the full loop
author -> embed -> parse -> interpret -> fill is oracle-checked.

Glyph design: a seven-segment-style rectilinear outline in a 1000-upm em —
segments switch on a codepoint-derived bit pattern, are mutually
NON-overlapping (so even-odd fill equals nonzero fill), and the advance
width is exactly :func:`docprompt_spark.pdfwrite.char_width_pm`, keeping
layout metrics identical to the metrics-only fonts of earlier rounds.
Every glyph is named ``uniXXXX`` so name->char round-trips exactly through
``cff.glyph_name_to_text``.
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

Contour = List[Tuple[int, int]]

# em-space vertical metrics shared with the writer (pdfwrite.ASCENT_PM /
# DESCENT_PM): glyph ink spans a subset of [-180, 720]
_SEG_T = 40  # segment thickness


def glyph_contours(ch: str) -> List[Contour]:
    """Deterministic non-overlapping rectilinear contours for ``ch`` in a
    1000-upm em (closed, counter-clockwise point order irrelevant under
    even-odd). Pure function of the codepoint + advance width."""
    from docprompt_spark.pdfwrite import char_width_pm

    w = char_width_pm(ch)
    # Knuth multiplicative hash: stable across runs/hosts/python versions
    k = (ord(ch) * 2654435761) & 0x7FFFFFFF
    bits = [(k >> i) & 1 for i in range(7)]
    if not any(bits):
        bits = [1] * 7
    x0, x1 = 60, w - 60  # ink box
    xm0, xm1 = x0 + _SEG_T, x1 - _SEG_T  # bars inset past the verticals
    segs = []  # (on, rect) rects as (xa, ya, xb, yb)
    segs.append((bits[0], (xm0, 600, xm1, 640)))        # top bar
    segs.append((bits[1], (xm0, 240, xm1, 280)))        # middle bar
    segs.append((bits[2], (xm0, -120, xm1, -80)))       # bottom bar
    segs.append((bits[3], (x0, 280, x0 + _SEG_T, 600)))     # upper left
    segs.append((bits[4], (x1 - _SEG_T, 280, x1, 600)))     # upper right
    segs.append((bits[5], (x0, -80, x0 + _SEG_T, 240)))     # lower left
    segs.append((bits[6], (x1 - _SEG_T, -80, x1, 240)))     # lower right
    out: List[Contour] = []
    for on, (xa, ya, xb, yb) in segs:
        if on and xb > xa:
            out.append([(xa, ya), (xb, ya), (xb, yb), (xa, yb)])
    return out


# ---------------------------------------------------------------------------
# Type2 charstring + CFF container encoding
# ---------------------------------------------------------------------------


def _t2_num(v: int) -> bytes:
    """Type2 charstring integer operand encoding."""
    if -107 <= v <= 107:
        return bytes([v + 139])
    if 108 <= v <= 1131:
        v -= 108
        return bytes([(v >> 8) + 247, v & 0xFF])
    if -1131 <= v <= -108:
        v = -v - 108
        return bytes([(v >> 8) + 251, v & 0xFF])
    return b"\x1c" + v.to_bytes(2, "big", signed=True)


def _charstring(width: int, contours: Sequence[Contour]) -> bytes:
    """[width] {rmoveto rlineto*}* endchar — width always present (nominal
    width 0), contours closed implicitly by the rasterizer/renderer."""
    out = bytearray(_t2_num(width))
    cx = cy = 0
    for contour in contours:
        pts = list(contour)
        dx, dy = pts[0][0] - cx, pts[0][1] - cy
        out += _t2_num(dx) + _t2_num(dy) + b"\x15"  # rmoveto
        cx, cy = pts[0]
        for px, py in pts[1:]:
            out += _t2_num(px - cx) + _t2_num(py - cy) + b"\x05"  # rlineto
            cx, cy = px, py
    out += b"\x0e"  # endchar
    return bytes(out)


def _dict_num(v: int) -> bytes:
    """DICT integer operand (same ranges as charstrings, but 29 = 5-byte)."""
    if -107 <= v <= 107:
        return bytes([v + 139])
    if 108 <= v <= 1131:
        v -= 108
        return bytes([(v >> 8) + 247, v & 0xFF])
    if -1131 <= v <= -108:
        v = -v - 108
        return bytes([(v >> 8) + 251, v & 0xFF])
    if -32768 <= v <= 32767:
        return b"\x1c" + v.to_bytes(2, "big", signed=True)
    return b"\x1d" + v.to_bytes(4, "big", signed=True)


def _dict_num5(v: int) -> bytes:
    """Fixed-width 5-byte operand (offset placeholders patched in pass 2)."""
    return b"\x1d" + v.to_bytes(4, "big", signed=True)


def _mk_index(items: Sequence[bytes]) -> bytes:
    if not items:
        return (0).to_bytes(2, "big")
    total = sum(len(i) for i in items) + 1
    offsz = 1 if total < 256 else 2 if total < 65536 else 3 if total < 2**24 else 4
    out = bytearray(len(items).to_bytes(2, "big"))
    out.append(offsz)
    off = 1
    offs = [off]
    for it in items:
        off += len(it)
        offs.append(off)
    for o in offs:
        out += o.to_bytes(offsz, "big")
    for it in items:
        out += it
    return bytes(out)


def build_cff(
    chars: Sequence[str],
    font_name: str = "DSOutline",
    charset_format: int = 0,
) -> bytes:
    """A complete, real CFF (Type1C) font program: glyph 0 = .notdef, then
    one outline glyph per char (sorted by codepoint), all named uniXXXX,
    encoding format 0 mapping single-byte codes for chars < 256, charset
    over custom SIDs (format 0, or 1/2 range-coded — the SIDs are
    consecutive so ranges are exact), one Private DICT (nominal/default
    width 0). Round-trips exactly through cff.cff_glyph_outlines."""
    from docprompt_spark.pdfwrite import char_width_pm

    chars = sorted(set(chars), key=ord)
    names = [f"uni{ord(c):04X}" for c in chars]
    strings = names  # all custom SIDs: 391 + index
    charstrings = [b"\x0e"]  # .notdef: bare endchar (width = defaultWidthX 0)
    for c in chars:
        charstrings.append(_charstring(char_width_pm(c), glyph_contours(c)))

    name_index = _mk_index([font_name.encode()])
    string_index = _mk_index([s.encode() for s in strings])
    gsubr_index = _mk_index([])

    # encoding fmt 0: codes for gid 1..nCodes (chars beyond 255 unencoded —
    # reachable by name, which is how the rasterizer harvests them)
    enc_gids = [c for c in chars if ord(c) < 256]
    encoding = bytes([0, len(enc_gids)]) + bytes(ord(c) for c in enc_gids)
    if charset_format == 0:
        # fmt 0: SID per gid 1..n-1
        charset = b"\x00" + b"".join(
            (391 + i).to_bytes(2, "big") for i in range(len(chars))
        )
    elif charset_format in (1, 2):
        # fmt 1: Range1 {first:2, nLeft:1}; fmt 2: Range2 {first:2, nLeft:2}.
        # Chunk the consecutive SID run into short ranges so the parser's
        # range loop and stride are actually exercised (>1 record).
        chunk = 3
        parts = [bytes([charset_format])]
        i = 0
        while i < len(chars):
            n = min(chunk, len(chars) - i)
            parts.append((391 + i).to_bytes(2, "big"))
            if charset_format == 1:
                parts.append(bytes([n - 1]))
            else:
                parts.append((n - 1).to_bytes(2, "big"))
            i += n
        charset = b"".join(parts)
    else:
        raise ValueError(f"unsupported charset_format {charset_format}")
    charstrings_index = _mk_index(charstrings)
    private = (
        _dict_num(0) + bytes([20])  # defaultWidthX
        + _dict_num(0) + bytes([21])  # nominalWidthX
    )

    def top_dict(charset_off: int, enc_off: int, cs_off: int,
                 priv_off: int) -> bytes:
        return (
            _dict_num5(charset_off) + bytes([15])
            + _dict_num5(enc_off) + bytes([16])
            + _dict_num5(cs_off) + bytes([17])
            + _dict_num(len(private)) + _dict_num5(priv_off) + bytes([18])
        )

    header = bytes([1, 0, 4, 4])  # major, minor, hdrSize, offSize

    def assemble(cso, eo, ccso, po) -> Tuple[bytes, Tuple[int, int, int, int]]:
        td_index = _mk_index([top_dict(cso, eo, ccso, po)])
        pos = len(header) + len(name_index) + len(td_index) + len(string_index) + len(gsubr_index)
        charset_off = pos
        enc_off = charset_off + len(charset)
        cs_off = enc_off + len(encoding)
        priv_off = cs_off + len(charstrings_index)
        blob = (
            header + name_index + td_index + string_index + gsubr_index
            + charset + encoding + charstrings_index + private
        )
        return blob, (charset_off, enc_off, cs_off, priv_off)

    # two passes: offsets are encoded fixed-width, so sizes are stable
    _, offs = assemble(0, 0, 0, 0)
    blob, offs2 = assemble(*offs)
    assert offs == offs2
    return blob


def build_cff_cid(
    chars: Sequence[str],
    font_name: str = "DSCIDOutline",
    fdselect_format: int = 3,
) -> bytes:
    """A real CID-KEYED CFF font program (CIDFontType0C — the form modern
    subsetters and every CJK producer embed behind /FontFile3 on a
    /CIDFontType0 descendant; reference renders these through pdfium's CID
    path, _pdfium.py:126-135). Glyph 0 = .notdef (implicitly CID 0); glyph
    i (1-based over codepoint-sorted ``chars``) carries CID i via a
    format-0 charset (charsets in CID fonts map gid->CID, not gid->SID —
    CFF spec §18). TWO Font DICTs sit in the FDArray with DIFFERENT
    nominalWidthX (0 / 300) and FDSelect splits the glyph range between
    them, so recovering each glyph's advance width REQUIRES resolving its
    FD — per-FD Private DICT decode is load-bearing, not decorative.
    ``fdselect_format``: 3 (range form, the one real fonts use) or 0
    (per-gid byte array). Round-trips exactly through
    cff.cff_cid_glyph_outlines."""
    from docprompt_spark.pdfwrite import char_width_pm

    chars = sorted(set(chars), key=ord)
    n = len(chars) + 1  # + .notdef
    mid = max(1, (n + 1) // 2)
    fd_of = [0 if gid < mid else 1 for gid in range(n)]
    nominals = (0, 300)
    charstrings = [b"\x0e"]  # .notdef: bare endchar (width = defaultWidthX)
    for gid in range(1, n):
        c = chars[gid - 1]
        # the leading operand is the width DELTA from the owning FD's
        # nominalWidthX — _charstring's first _t2_num is exactly that
        charstrings.append(
            _charstring(
                char_width_pm(c) - nominals[fd_of[gid]], glyph_contours(c)
            )
        )

    name_index = _mk_index([font_name.encode()])
    # ROS operands are SIDs: "Adobe"/"Identity" land in the string index
    string_index = _mk_index([b"Adobe", b"Identity"])
    gsubr_index = _mk_index([])
    charstrings_index = _mk_index(charstrings)

    # charset fmt 0: CID per gid 1..n-1; CID == gid by construction
    charset = b"\x00" + b"".join(g.to_bytes(2, "big") for g in range(1, n))

    if fdselect_format == 0:
        fdselect = bytes([0]) + bytes(fd_of)
    elif fdselect_format == 3:
        ranges = [(0, 0)] + ([(mid, 1)] if mid < n else [])
        fdselect = (
            bytes([3])
            + len(ranges).to_bytes(2, "big")
            + b"".join(
                first.to_bytes(2, "big") + bytes([fd]) for first, fd in ranges
            )
            + n.to_bytes(2, "big")  # sentinel
        )
    else:
        raise ValueError(f"unsupported fdselect_format {fdselect_format}")

    privates = [
        _dict_num(0) + bytes([20]) + _dict_num(nom) + bytes([21])
        for nom in nominals
    ]

    def fd_dict(psz: int, poff: int) -> bytes:
        return _dict_num(psz) + _dict_num5(poff) + bytes([18])

    def top_dict(charset_off, cs_off, fda_off, fds_off) -> bytes:
        return (
            # ROS (12 30) first, as real CID fonts serialize it
            _dict_num(391) + _dict_num(392) + _dict_num(0) + b"\x0c\x1e"
            + _dict_num(n) + b"\x0c\x22"  # CIDCount (12 34)
            + _dict_num5(charset_off) + bytes([15])
            + _dict_num5(cs_off) + bytes([17])
            + _dict_num5(fda_off) + b"\x0c\x24"  # FDArray (12 36)
            + _dict_num5(fds_off) + b"\x0c\x25"  # FDSelect (12 37)
        )

    header = bytes([1, 0, 4, 4])

    def assemble(cso, ccso, fao, fso, poffs):
        fdarray_index = _mk_index(
            [fd_dict(len(p), po) for p, po in zip(privates, poffs)]
        )
        td_index = _mk_index([top_dict(cso, ccso, fao, fso)])
        pos = (
            len(header) + len(name_index) + len(td_index)
            + len(string_index) + len(gsubr_index)
        )
        charset_off = pos
        fds_off = charset_off + len(charset)
        cs_off = fds_off + len(fdselect)
        fda_off = cs_off + len(charstrings_index)
        p0 = fda_off + len(fdarray_index)
        new_poffs = (p0, p0 + len(privates[0]))
        blob = (
            header + name_index + td_index + string_index + gsubr_index
            + charset + fdselect + charstrings_index + fdarray_index
            + privates[0] + privates[1]
        )
        return blob, (charset_off, cs_off, fda_off, fds_off, new_poffs)

    _, (cso, ccso, fao, fso, poffs) = assemble(0, 0, 0, 0, (0, 0))
    blob, offs2 = assemble(cso, ccso, fao, fso, poffs)
    assert (cso, ccso, fao, fso, poffs) == offs2
    return blob


def glyph_pool(chars: Sequence[str]) -> Dict[str, Tuple[int, List[Contour]]]:
    """Oracle-side glyph source: char -> (advance width pm, contours),
    generated directly (the rasterizer kernel builds the same pool by
    PARSING the embedded CFF — equality is what the raster oracles prove)."""
    from docprompt_spark.pdfwrite import char_width_pm

    return {c: (char_width_pm(c), glyph_contours(c)) for c in set(chars)}


# ---------------------------------------------------------------------------
# Type1 font program authoring (Adobe Type 1 Font Format, the THIRD embedded
# format real PDFs carry: /FontFile cleartext-header + eexec body)
# ---------------------------------------------------------------------------


def _t1_num(v: int) -> bytes:
    """Type1 charstring integer operand encoding (spec §6.2)."""
    if -107 <= v <= 107:
        return bytes([v + 139])
    if 108 <= v <= 1131:
        v -= 108
        return bytes([(v >> 8) + 247, v & 0xFF])
    if -1131 <= v <= -108:
        v = -v - 108
        return bytes([(v >> 8) + 251, v & 0xFF])
    return b"\xff" + v.to_bytes(4, "big", signed=True)


def _t1_charstring(width: int, contours: Sequence[Contour]) -> bytes:
    """hsbw {rmoveto rlineto* closepath}* endchar (sbx = 0)."""
    out = bytearray(_t1_num(0) + _t1_num(width) + bytes([13]))  # hsbw
    cx = cy = 0
    for contour in contours:
        pts = list(contour)
        out += _t1_num(pts[0][0] - cx) + _t1_num(pts[0][1] - cy) + bytes([21])
        cx, cy = pts[0]
        for px, py in pts[1:]:
            out += _t1_num(px - cx) + _t1_num(py - cy) + bytes([5])
            cx, cy = px, py
        out += bytes([9])  # closepath (current point unchanged)
    out += bytes([14])  # endchar
    return bytes(out)


def build_type1(chars: Sequence[str], font_name: str = "DSType1") -> bytes:
    """A complete Type1 font program: cleartext PostScript header with a
    full /Encoding array, then the eexec-encrypted Private + CharStrings
    sections (charstrings individually encrypted, lenIV 4), then the
    512-zeros/cleartomark trailer. Glyph outlines and widths are shared
    with :func:`build_cff`/:func:`build_ttf` (uniXXXX names), so a PDF
    embedding any of the three formats rasterizes identical ink.
    Returns (font bytes, len1, len2, len3) via :func:`build_type1_parts`;
    this convenience returns the concatenated bytes only."""
    return b"".join(build_type1_parts(chars, font_name))


def build_type1_parts(
    chars: Sequence[str], font_name: str = "DSType1"
) -> Tuple[bytes, bytes, bytes]:
    """(cleartext, eexec-encrypted, trailer) — the /Length1/2/3 split the
    PDF /FontFile stream dictionary declares (PDF 32000 §9.9, Table 127)."""
    from docprompt_spark.cff import eexec_decrypt, eexec_encrypt
    from docprompt_spark.pdfwrite import char_width_pm

    chars = sorted(set(chars))
    enc_lines = ["/Encoding 256 array", "0 1 255 {1 index exch /.notdef put} for"]
    for ch in chars:
        if ord(ch) < 256:
            enc_lines.append(f"dup {ord(ch)} /uni{ord(ch):04X} put")
    header = (
        f"%!FontType1-1.0: {font_name} 001.001\n"
        f"/FontName /{font_name} def\n"
        "/PaintType 0 def\n"
        "/FontType 1 def\n"
        "/FontMatrix [0.001 0 0 0.001 0 0] readonly def\n"
        + "\n".join(enc_lines)
        + " readonly def\n"
        "/FontBBox {0 -180 760 720} readonly def\n"
        "currentdict end\n"
        "currentfile eexec\n"
    ).encode("latin-1")

    cs_entries = []
    glyphs = [(".notdef", 500, [])] + [
        (f"uni{ord(ch):04X}", char_width_pm(ch), glyph_contours(ch))
        for ch in chars
    ]
    for name, width, contours in glyphs:
        plain = _t1_charstring(width, contours)
        # charstring encryption r=4330, deterministic 4-byte lenIV salt
        enc = eexec_encrypt(plain, r=4330, salt=b"cs01")
        cs_entries.append(
            b"/" + name.encode("latin-1")
            + b" %d RD " % len(enc) + enc + b" ND\n"
        )
    private = (
        b"dup /Private 9 dict dup begin\n"
        b"/RD {string currentfile exch readstring pop} executeonly def\n"
        b"/ND {noaccess def} executeonly def\n"
        b"/NP {noaccess put} executeonly def\n"
        b"/lenIV 4 def\n"
        b"/password 5839 def\n"
        b"/BlueValues [] def\n"
        b"/MinFeature {16 22} def\n"
        b"end\n"
        b"/CharStrings %d dict dup begin\n" % len(glyphs)
        + b"".join(cs_entries)
        + b"end\nend\nmark currentfile closefile\n"
    )
    encrypted = eexec_encrypt(private, salt=b"t1ds")
    trailer = (b"0" * 64 + b"\n") * 8 + b"cleartomark\n"
    return header, encrypted, trailer


# ---------------------------------------------------------------------------
# Type3 font authoring (PDF 32000 §9.6.5: glyphs ARE content streams — the
# FOURTH embedded format; reference renders these via pdfium's Type3 path,
# _pdfium.py:126-135)
# ---------------------------------------------------------------------------


def type3_charproc(ch: str) -> bytes:
    """Glyph procedure for a Type3 /CharProcs entry: ``wx 0 d0`` then one
    ``re`` per rectilinear contour and a single fill — identical geometry
    (glyph space == 1000-upm em under FontMatrix [0.001 0 0 0.001 0 0]) to
    every other embedded format, so rasters stay format-independent."""
    from docprompt_spark.pdfwrite import char_width_pm

    parts = [f"{char_width_pm(ch)} 0 d0"]
    for con in glyph_contours(ch):
        (xa, ya), (xb, yb) = con[0], con[2]
        parts.append(f"{xa} {ya} {xb - xa} {yb - ya} re")
    parts.append("f")
    return " ".join(parts).encode("ascii")
