"""Damaged-file salvage — the from-scratch analog of pdfium's
RebuildCrossRef, which is what the reference (docprompt via pypdfium2)
rides when a crawled PDF has a broken cross-reference. The parser scans
the raw bytes for `N G obj` headers (stepping over stream payloads so
binary data can't fake headers), recovers the trailer from trailer dicts
/ a rediscovered XRef stream dict / a direct catalog scan, and
re-registers ObjStm members. Corruption touches only the file SKELETON —
object bodies survive — so golden spans must be damage-invariant."""

import pytest

from docprompt_spark import pdfparse
from docprompt_spark.corpus import _damage, gen_doc
from tests.test_pdf_roundtrip import spans_from_pdf
from tests.test_rotate import _unwrap


@pytest.mark.parametrize("idx", list(range(8)))
def test_damaged_envelope_spans_match_golden(idx):
    # idx%4 cycles all four damage modes (startxref-past-EOF, mangled
    # xref keyword, truncated trailer tail, broken startxref on an
    # xref-stream/ObjStm file)
    d = gen_doc(idx, skew_every=0, envelope="damaged")
    assert spans_from_pdf(_unwrap(d["pdf"])) == d["spans"]


def test_truncated_trailer_recovers_root_via_catalog_scan():
    # mode 2 removes the trailer AND startxref: /Root only exists as the
    # /Type /Catalog object found by the rebuild scan
    d = gen_doc(2, skew_every=0, envelope="damaged")
    raw = _unwrap(d["pdf"])
    assert b"trailer" not in raw and b"startxref" not in raw
    pf = pdfparse.PdfFile(raw)
    assert pf._rebuilt
    assert str(pf.root.get("Type")) == "Catalog"


def test_xrefstream_damage_recovers_objstm_members():
    # mode 3: the xref STREAM file loses its startxref; members of the
    # object stream are only reachable through the rebuild's ObjStm
    # re-registration, and the XRef stream dict doubles as the trailer
    d = gen_doc(3, skew_every=0, envelope="damaged")
    raw = _unwrap(d["pdf"])
    assert b"/Type /ObjStm" in raw or b"ObjStm" in raw
    pf = pdfparse.PdfFile(raw)
    assert pf._rebuilt
    assert pf._compressed, "ObjStm members must be re-registered"
    assert spans_from_pdf(raw) == d["spans"]


def test_lying_xref_offset_triggers_lazy_rebuild():
    # intact chain, one corrupted entry: the first bad header hit mid-walk
    # rebuilds once and the parse completes
    d = gen_doc(0, skew_every=0)  # classic xref, raw wrap
    raw = _unwrap(d["pdf"])
    pf0 = pdfparse.PdfFile(raw)
    num = max(n for n in pf0.xref)
    off = pf0.xref[num]
    # classic table entries are fixed-width ASCII: shift this object's
    # 10-digit offset field to point mid-file garbage
    entry = b"%010d" % off
    assert raw.count(entry) >= 1
    bad = raw.replace(entry, b"%010d" % (off + 3), 1)
    pf = pdfparse.PdfFile(bad)
    assert spans_from_pdf(bad) == d["spans"]


def test_unrecoverable_garbage_raises():
    with pytest.raises(Exception):
        pdfparse.PdfFile(b"%PDF-1.7\nthis is not a pdf at all\n%%EOF")


@pytest.mark.parametrize("mode", [0, 1, 2])
def test_damage_modes_break_the_fast_path(mode):
    # sanity: each mode actually corrupts what it claims (otherwise the
    # salvage tests would silently test the normal path)
    d = gen_doc(0, skew_every=0)  # classic-xref envelope
    raw = _unwrap(d["pdf"])
    broken = _damage(raw, mode)
    if mode == 0:
        assert b"startxref" in broken  # offset bogus but keyword present
        tail = broken[-64:]
        n = int(tail.split(b"startxref")[-1].split()[0])
        assert n > len(broken)
    elif mode == 1:
        assert b"\nxref" not in broken
    else:
        assert b"trailer" not in broken
