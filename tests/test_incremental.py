"""Incremental updates (PDF 32000 §7.5.6) + link annotations (§12.5):
an appended revision redefines the first page object to add a /Link
annotation with a /URI action. The /Prev xref chain with newest-wins
object resolution is load-bearing — a reader that resolves the original
revision's page object sees no /Annots at all."""

from docprompt_spark import pdfparse, pdfwrite
from docprompt_spark.corpus import _link_annotation_gt, gen_doc


def test_appended_revision_adds_link_and_keeps_spans():
    for idx in (0, 2, 3, 4):  # classic-xref docs, incl. a rotated one (3)
        d = gen_doc(idx, seed=42, skew_every=0)
        raw = pdfparse.unwrap_pdf_bytes(d["pdf"])
        if b"/Prev" in raw:  # default-rotation incremental doc: skip here
            continue
        base = pdfparse.PdfFile(raw)
        assert base.extract_page(0)["annots"] == []
        uri = "https://example.org/x/p1"
        upd_bytes = pdfwrite.append_incremental_link(
            raw, uri, (72.0, 640.0, 272.0, 652.0)
        )
        upd = pdfparse.PdfFile(upd_bytes)
        p0 = upd.extract_page(0)
        assert p0["annots"] == [
            {"subtype": "Link", "rect": [72.0, 640.0, 272.0, 652.0],
             "uri": uri, "dest_page": 0, "dest_y": None}
        ]
        # golden spans are update-invariant: same words, same geometry
        assert p0["words"] == base.extract_page(0)["words"]
        # other pages untouched
        for i in range(1, len(upd.page_refs)):
            assert upd.extract_page(i)["annots"] == []


def test_default_corpus_rotates_incremental_docs():
    # idx%8==5 classic-xref docs carry the appended revision; the golden
    # spans (flagship oracle input) are computed WITHOUT knowledge of the
    # update, so parse equality proves update-invariance
    d = gen_doc(5, seed=42, skew_every=0)
    raw = pdfparse.unwrap_pdf_bytes(d["pdf"])
    assert raw.count(b"startxref") == 2 and b"/Prev" in raw
    pf = pdfparse.PdfFile(raw)
    uri, rect = _link_annotation_gt(d["doc_id"], 5)
    assert pf.extract_page(0)["annots"] == [
        {"subtype": "Link", "rect": list(rect), "uri": uri,
         "dest_page": 0, "dest_y": None}
    ]


def test_double_update_chains_three_revisions():
    d = gen_doc(0, seed=42, skew_every=0)
    raw = pdfparse.unwrap_pdf_bytes(d["pdf"])
    one = pdfwrite.append_incremental_link(
        raw, "https://a.example/1", (72.0, 640.0, 272.0, 652.0)
    )
    two = pdfwrite.append_incremental_link(
        one, "https://a.example/2", (72.0, 600.0, 272.0, 612.0)
    )
    pf = pdfparse.PdfFile(two)
    annots = pf.extract_page(0)["annots"]
    assert [a["uri"] for a in annots] == [
        "https://a.example/1", "https://a.example/2"
    ]
