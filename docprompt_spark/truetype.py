"""Deterministic TrueType (glyf) font authoring + outline parsing.

Round 4 closed the glyph-cell divergence for CFF (/FontFile3) fonts; this
module closes it for the OTHER embedded-outline format real PDFs carry:
TrueType font programs embedded via /FontFile2 (PDF 32000 §9.9, "TrueType
font program"). The reference rasterizes both transparently through
pdfium's font engine (docprompt _pdfium.py:126-135); here the loop is the
same as fontgen's CFF loop — author -> embed -> parse -> flatten -> fill —
with the glyf/loca/cmap/hmtx tables re-derived from the public OpenType/
TrueType specification (no font library).

Authoring (:func:`build_ttf`) emits a complete sfnt: ``head hhea maxp hmtx
cmap(format 4) loca(long) glyf name post(v3)`` at 1000 units/em, glyph
outlines shared with :func:`fontgen.glyph_contours` so a document renders
identical ink whether its writer embedded CFF or TrueType.

Parsing (:func:`ttf_glyph_outlines`) walks the table directory, decodes
simple glyphs (on/off-curve flags incl. x/y-short + repeat compression),
flattens quadratic B-splines with the implied-on-curve midpoint rule, and
recurses into translate-only composite glyphs; coordinates scale to the
pool's 1000-upm contract for any unitsPerEm.
"""

from __future__ import annotations

import struct
from typing import Dict, List, Tuple

Contour = List[Tuple[float, float]]

_SFNT_TRUETYPE = 0x00010000
# fixed flattening of quadratic segments: deterministic, resolution-free
_QUAD_STEPS = 8


# ---------------------------------------------------------------------------
# authoring
# ---------------------------------------------------------------------------


def _checksum(data: bytes) -> int:
    if len(data) % 4:
        data += b"\x00" * (4 - len(data) % 4)
    return sum(struct.unpack(f">{len(data) // 4}I", data)) & 0xFFFFFFFF


def _glyf_entry(contours: List[List[Tuple[int, int]]]) -> bytes:
    """One simple glyph: all points on-curve, uncompressed int16 deltas."""
    if not contours:
        return b""
    xs = [p[0] for c in contours for p in c]
    ys = [p[1] for c in contours for p in c]
    out = struct.pack(
        ">hhhhh", len(contours), min(xs), min(ys), max(xs), max(ys)
    )
    end = -1
    ends = []
    for c in contours:
        end += len(c)
        ends.append(end)
    out += struct.pack(f">{len(ends)}H", *ends)
    out += struct.pack(">H", 0)  # no instructions
    npts = end + 1
    out += bytes([0x01]) * npts  # flags: ON_CURVE, full-width deltas
    px = 0
    for c in contours:
        for x, _ in c:
            out += struct.pack(">h", x - px)
            px = x
    py = 0
    for c in contours:
        for _, y in c:
            out += struct.pack(">h", y - py)
            py = y
    if len(out) % 4:
        out += b"\x00" * (4 - len(out) % 4)
    return out


def _cmap_format4(code_to_gid: Dict[int, int]) -> bytes:
    """(3,1) Windows BMP subtable, one segment per contiguous code run."""
    codes = sorted(code_to_gid)
    segs: List[Tuple[int, int]] = []  # (start, end)
    for c in codes:
        if segs and c == segs[-1][1] + 1:
            segs[-1] = (segs[-1][0], c)
        else:
            segs.append((c, c))
    segs.append((0xFFFF, 0xFFFF))
    segcount = len(segs)
    ends = [e for _, e in segs]
    starts = [s for s, _ in segs]
    deltas: List[int] = []
    range_offsets: List[int] = []
    glyph_ids: List[int] = []
    for i, (s, e) in enumerate(segs):
        if s == 0xFFFF:
            deltas.append(1)
            range_offsets.append(0)
            continue
        run = [code_to_gid[c] for c in range(s, e + 1)]
        if all(g - c == run[0] - s for c, g in zip(range(s, e + 1), run)):
            deltas.append((run[0] - s) & 0xFFFF)
            range_offsets.append(0)
        else:
            deltas.append(0)
            # offset from THIS idRangeOffset slot to the glyph array slice
            range_offsets.append(
                2 * (segcount - i) + 2 * len(glyph_ids)
            )
            glyph_ids.extend(run)
    seg2 = segcount * 2
    search = 1
    while search * 2 <= segcount:
        search *= 2
    sub = struct.pack(
        ">HHHHHHH",
        4,
        16 + 8 * segcount + 2 * len(glyph_ids),
        0,
        seg2,
        search * 2,
        search.bit_length() - 1,
        seg2 - search * 2,
    )
    sub += struct.pack(f">{segcount}H", *ends)
    sub += b"\x00\x00"  # reservedPad
    sub += struct.pack(f">{segcount}H", *starts)
    sub += struct.pack(f">{segcount}h", *[d - 0x10000 if d > 0x7FFF else d for d in deltas])
    sub += struct.pack(f">{segcount}H", *range_offsets)
    if glyph_ids:
        sub += struct.pack(f">{len(glyph_ids)}H", *glyph_ids)
    return struct.pack(">HHHHI", 0, 1, 3, 1, 12) + sub


def build_ttf(chars) -> bytes:
    """A real TrueType font program for ``chars``: same 1000-upm
    rectilinear outlines and advance widths as :func:`fontgen.build_cff`,
    so either font format renders identical ink."""
    from docprompt_spark import fontgen
    from docprompt_spark.pdfwrite import ASCENT_PM, DESCENT_PM, char_width_pm

    chars = sorted(set(chars))
    # gid 0 = .notdef (empty); chars follow in sorted order
    glyph_contours = [[]] + [
        [[(int(x), int(y)) for x, y in c] for c in fontgen.glyph_contours(ch)]
        for ch in chars
    ]
    widths = [500] + [char_width_pm(ch) for ch in chars]
    code_to_gid = {ord(ch): i + 1 for i, ch in enumerate(chars)}

    glyf = b""
    loca = [0]
    for gc in glyph_contours:
        glyf += _glyf_entry(gc)
        loca.append(len(glyf))
    loca_b = struct.pack(f">{len(loca)}I", *loca)

    all_pts = [p for gc in glyph_contours for c in gc for p in c]
    xmin = min((p[0] for p in all_pts), default=0)
    ymin = min((p[1] for p in all_pts), default=0)
    xmax = max((p[0] for p in all_pts), default=0)
    ymax = max((p[1] for p in all_pts), default=0)
    n_glyphs = len(glyph_contours)

    head = struct.pack(
        ">IIIIHHQQhhhhHHhhh",
        0x00010000,  # version
        0x00010000,  # fontRevision
        0,  # checkSumAdjustment (patched below)
        0x5F0F3CF5,  # magicNumber
        0b1011,  # flags: baseline y=0, lsb x=0, integer ppem
        1000,  # unitsPerEm
        0,
        0,  # created/modified (longdatetime; zero = deterministic)
        xmin,
        ymin,
        xmax,
        ymax,
        0,  # macStyle
        8,  # lowestRecPPEM
        2,  # fontDirectionHint
        1,  # indexToLocFormat: long
        0,  # glyphDataFormat
    )
    hhea = struct.pack(
        ">IhhhHhhhhhhhhhhhH",
        0x00010000,
        ASCENT_PM,
        DESCENT_PM,
        0,  # lineGap
        max(widths),
        0,  # minLeftSideBearing
        0,  # minRightSideBearing
        xmax,
        1,
        0,
        0,  # caret
        0,
        0,
        0,
        0,  # reserved
        0,  # metricDataFormat
        n_glyphs,  # numberOfHMetrics
    )
    hmtx = b"".join(struct.pack(">Hh", w, 0) for w in widths)
    maxp = struct.pack(
        ">IHHHHHHHHHHHHHH",
        0x00010000,
        n_glyphs,
        max((len(c) for gc in glyph_contours for c in gc), default=0),
        max((len(gc) for gc in glyph_contours), default=0),
        0,  # maxCompositePoints
        0,  # maxCompositeContours
        2,  # maxZones
        0,  # maxTwilightPoints
        0,  # maxStorage
        0,  # maxFunctionDefs
        0,  # maxInstructionDefs
        0,  # maxStackElements
        0,  # maxSizeOfInstructions
        0,  # maxComponentElements
        0,  # maxComponentDepth
    )
    cmap = _cmap_format4(code_to_gid)
    fam = "DSMonoTT".encode("utf-16-be")
    name = (
        struct.pack(">HHH", 0, 1, 18)
        + struct.pack(">HHHHHH", 3, 1, 0x409, 1, len(fam), 0)
        + fam
    )
    post = struct.pack(">IIhhIIIII", 0x00030000, 0, 0, 50, 1, 0, 0, 0, 0)

    tables = {
        b"cmap": cmap,
        b"glyf": glyf,
        b"head": head,
        b"hhea": hhea,
        b"hmtx": hmtx,
        b"loca": loca_b,
        b"maxp": maxp,
        b"name": name,
        b"post": post,
    }
    tags = sorted(tables)
    n = len(tags)
    search = 1
    while search * 2 <= n:
        search *= 2
    font = struct.pack(
        ">IHHHH", _SFNT_TRUETYPE, n, search * 16,
        search.bit_length() - 1, (n - search) * 16,
    )
    offset = 12 + 16 * n
    dirents = b""
    body = b""
    head_off = None
    for tag in tags:
        data = tables[tag]
        if tag == b"head":
            head_off = offset
        pad = (-len(data)) % 4
        dirents += struct.pack(
            ">4sIII", tag, _checksum(data), offset, len(data)
        )
        body += data + b"\x00" * pad
        offset += len(data) + pad
    font = font + dirents + body
    adjust = (0xB1B0AFBA - _checksum(font)) & 0xFFFFFFFF
    return font[: head_off + 8] + struct.pack(">I", adjust) + font[head_off + 12 :]


# ---------------------------------------------------------------------------
# parsing
# ---------------------------------------------------------------------------


def _tables(data: bytes) -> Dict[bytes, Tuple[int, int]]:
    (ver, n) = struct.unpack(">IH", data[:6])
    if ver not in (_SFNT_TRUETYPE, 0x74727565):  # 'true' (old Mac)
        raise ValueError(f"not a TrueType sfnt: {ver:#x}")
    out = {}
    for i in range(n):
        tag, _cs, off, length = struct.unpack(
            ">4sIII", data[12 + 16 * i : 28 + 16 * i]
        )
        out[tag] = (off, length)
    return out


def _parse_cmap(data: bytes, off: int) -> Dict[int, int]:
    """Best available unicode subtable -> {codepoint: gid}. Formats 4, 6,
    0, and 12 (the ones real embedded fonts carry)."""
    (_, n) = struct.unpack(">HH", data[off : off + 4])
    best = None
    best_rank = -1
    for i in range(n):
        pid, eid, sub = struct.unpack(
            ">HHI", data[off + 4 + 8 * i : off + 12 + 8 * i]
        )
        rank = {(3, 10): 4, (3, 1): 3, (0, 4): 2, (0, 3): 2, (3, 0): 1}.get(
            (pid, eid), 0
        )
        if rank > best_rank:
            best, best_rank = off + sub, rank
    if best is None:
        return {}
    (fmt,) = struct.unpack(">H", data[best : best + 2])
    out: Dict[int, int] = {}
    if fmt == 4:
        seg2 = struct.unpack(">H", data[best + 6 : best + 8])[0]
        sc = seg2 // 2
        p = best + 14
        ends = struct.unpack(f">{sc}H", data[p : p + seg2])
        p += seg2 + 2
        starts = struct.unpack(f">{sc}H", data[p : p + seg2])
        p += seg2
        deltas = struct.unpack(f">{sc}h", data[p : p + seg2])
        p += seg2
        ro_base = p
        ros = struct.unpack(f">{sc}H", data[p : p + seg2])
        for i in range(sc):
            s, e = starts[i], ends[i]
            if s == 0xFFFF:
                continue
            for c in range(s, e + 1):
                if ros[i] == 0:
                    g = (c + deltas[i]) & 0xFFFF
                else:
                    gp = ro_base + 2 * i + ros[i] + 2 * (c - s)
                    (g,) = struct.unpack(">H", data[gp : gp + 2])
                    if g:
                        g = (g + deltas[i]) & 0xFFFF
                if g:
                    out[c] = g
    elif fmt == 6:
        first, cnt = struct.unpack(">HH", data[best + 6 : best + 10])
        gids = struct.unpack(f">{cnt}H", data[best + 10 : best + 10 + 2 * cnt])
        out = {first + i: g for i, g in enumerate(gids) if g}
    elif fmt == 0:
        gids = data[best + 6 : best + 262]
        out = {c: g for c, g in enumerate(gids) if g}
    elif fmt == 12:
        (ngroups,) = struct.unpack(">I", data[best + 12 : best + 16])
        p = best + 16
        for _ in range(ngroups):
            s, e, g0 = struct.unpack(">III", data[p : p + 12])
            for c in range(s, e + 1):
                out[c] = g0 + (c - s)
            p += 12
    return out


def _flatten_quad(p0, p1, p2) -> List[Tuple[float, float]]:
    """Quadratic bezier p0->p2 with control p1, fixed-step polyline
    (excludes p0, includes p2)."""
    pts = []
    for i in range(1, _QUAD_STEPS + 1):
        t = i / _QUAD_STEPS
        mt = 1 - t
        pts.append(
            (
                mt * mt * p0[0] + 2 * mt * t * p1[0] + t * t * p2[0],
                mt * mt * p0[1] + 2 * mt * t * p1[1] + t * t * p2[1],
            )
        )
    return pts


def _glyph_points(
    data: bytes, glyf_off: int, loca: List[int], gid: int, depth: int = 0
) -> List[Tuple[List[Tuple[float, float]], List[int]]]:
    """-> [(points, flags)] per contour (absolute coords, on-curve bit 0)."""
    if gid >= len(loca) - 1 or depth > 4:
        return []
    start, end = loca[gid], loca[gid + 1]
    if end <= start:
        return []
    p = glyf_off + start
    (ncont,) = struct.unpack(">h", data[p : p + 2])
    p += 10
    if ncont < 0:
        # composite: translate-only components (the form embedded subset
        # fonts emit); scaled components are skipped
        out = []
        while True:
            flags, comp_gid = struct.unpack(">HH", data[p : p + 4])
            p += 4
            if flags & 0x0001:  # ARG_1_AND_2_ARE_WORDS
                dx, dy = struct.unpack(">hh", data[p : p + 4])
                p += 4
            else:
                dx, dy = struct.unpack(">bb", data[p : p + 2])
                p += 2
            if not (flags & 0x0002):  # ARGS_ARE_XY_VALUES required
                dx = dy = 0
            scale_ok = not (flags & (0x0008 | 0x0040 | 0x0080))
            if flags & 0x0008:
                p += 2
            elif flags & 0x0040:
                p += 4
            elif flags & 0x0080:
                p += 8
            if scale_ok:
                for pts, fl in _glyph_points(data, glyf_off, loca, comp_gid, depth + 1):
                    out.append(([(x + dx, y + dy) for x, y in pts], fl))
            if not (flags & 0x0020):  # MORE_COMPONENTS
                break
        return out
    ends = struct.unpack(f">{ncont}H", data[p : p + 2 * ncont])
    p += 2 * ncont
    (ilen,) = struct.unpack(">H", data[p : p + 2])
    p += 2 + ilen
    npts = ends[-1] + 1 if ncont else 0
    flags: List[int] = []
    while len(flags) < npts:
        f = data[p]
        p += 1
        flags.append(f)
        if f & 0x08:  # REPEAT
            rep = data[p]
            p += 1
            flags.extend([f] * rep)
    xs: List[int] = []
    v = 0
    for f in flags:
        if f & 0x02:  # X_SHORT
            d = data[p]
            p += 1
            v += d if f & 0x10 else -d
        elif not (f & 0x10):
            (d,) = struct.unpack(">h", data[p : p + 2])
            p += 2
            v += d
        xs.append(v)
    ys: List[int] = []
    v = 0
    for f in flags:
        if f & 0x04:  # Y_SHORT
            d = data[p]
            p += 1
            v += d if f & 0x20 else -d
        elif not (f & 0x20):
            (d,) = struct.unpack(">h", data[p : p + 2])
            p += 2
            v += d
        ys.append(v)
    out = []
    s = 0
    for e in ends:
        out.append(
            (
                [(float(x), float(y)) for x, y in zip(xs[s : e + 1], ys[s : e + 1])],
                [f & 0x01 for f in flags[s : e + 1]],
            )
        )
        s = e + 1
    return out


def _contour_to_polygon(pts, on) -> Contour:
    """TrueType contour (mixed on/off-curve) -> flattened polygon using the
    implied-midpoint rule for consecutive off-curve points."""
    n = len(pts)
    if n == 0:
        return []
    if all(on):
        return list(pts)
    # rotate so we start on-curve (synthesize a midpoint start if none)
    try:
        k = on.index(1)
        work = pts[k:] + pts[:k]
        won = on[k:] + on[:k]
    except ValueError:
        mid = (
            (pts[-1][0] + pts[0][0]) / 2.0,
            (pts[-1][1] + pts[0][1]) / 2.0,
        )
        work = [mid] + list(pts)
        won = [1] + list(on)
        n += 1
    poly = [work[0]]
    i = 1
    cur = work[0]
    while i <= n:
        p = work[i % n]
        if won[i % n] if i < n else won[0]:
            if i < n:
                poly.append(p)
                cur = p
            i += 1
        else:
            nxt = work[(i + 1) % n]
            nxt_on = won[(i + 1) % n]
            endp = nxt if nxt_on else ((p[0] + nxt[0]) / 2.0, (p[1] + nxt[1]) / 2.0)
            poly.extend(_flatten_quad(cur, p, endp))
            cur = endp
            i += 2 if nxt_on else 1
    if poly[-1] == poly[0]:
        poly.pop()
    return poly


from docprompt_spark.cff import memo_bytes_fn


@memo_bytes_fn
def ttf_glyph_outlines(data: bytes) -> Dict[str, Tuple[float, List[Contour]]]:
    """char -> (advance width, contours) from a TrueType font program,
    coordinates scaled to the pool's 1000-units/em contract. Empty dict on
    structurally surprising fonts (the caller's cell fallback applies)."""
    try:
        tabs = _tables(data)
        head_off = tabs[b"head"][0]
        upem = struct.unpack(">H", data[head_off + 18 : head_off + 20])[0] or 1000
        (itlf,) = struct.unpack(">h", data[head_off + 50 : head_off + 52])
        maxp_off = tabs[b"maxp"][0]
        (n_glyphs,) = struct.unpack(">H", data[maxp_off + 4 : maxp_off + 6])
        hhea_off = tabs[b"hhea"][0]
        (n_hm,) = struct.unpack(">H", data[hhea_off + 34 : hhea_off + 36])
        hmtx_off = tabs[b"hmtx"][0]
        adv = []
        last = 500
        for g in range(n_glyphs):
            if g < n_hm:
                (last,) = struct.unpack(
                    ">H", data[hmtx_off + 4 * g : hmtx_off + 4 * g + 2]
                )
            adv.append(last)
        loca_off, _loca_len = tabs[b"loca"]
        if itlf:
            loca = list(
                struct.unpack(
                    f">{n_glyphs + 1}I",
                    data[loca_off : loca_off + 4 * (n_glyphs + 1)],
                )
            )
        else:
            loca = [
                2 * v
                for v in struct.unpack(
                    f">{n_glyphs + 1}H",
                    data[loca_off : loca_off + 2 * (n_glyphs + 1)],
                )
            ]
        glyf_off = tabs[b"glyf"][0]
        cmap = _parse_cmap(data, tabs[b"cmap"][0])
        scale = 1000.0 / upem
        out: Dict[str, Tuple[float, List[Contour]]] = {}
        for code, gid in cmap.items():
            if gid >= n_glyphs:
                continue
            raw = _glyph_points(data, glyf_off, loca, gid)
            contours = []
            for pts, on in raw:
                poly = _contour_to_polygon(pts, on)
                if len(poly) >= 3:
                    contours.append(
                        [(x * scale, y * scale) for x, y in poly]
                        if scale != 1.0
                        else poly
                    )
            ch = chr(code)
            if ch not in out:
                out[ch] = (adv[gid] * scale, contours)
        return out
    except Exception:
        return {}


@memo_bytes_fn
def ttf_code_to_text(data: bytes) -> Dict[int, str]:
    """byte code -> text for a simple TrueType font: codes that the
    embedded cmap maps are their own unicode (the (3,1) convention);
    unmapped codes fall back to chr(code) at the interpreter."""
    try:
        tabs = _tables(data)
        cmap = _parse_cmap(data, tabs[b"cmap"][0])
        return {c: chr(c) for c in cmap if c < 256}
    except Exception:
        return {}
