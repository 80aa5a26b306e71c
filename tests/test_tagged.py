"""Tagged PDF (PDF 32000 §14.6-14.8): every show op is a marked-content
sequence (/P << /MCID n >> BDC ... EMC) and the catalog carries a
/StructTreeRoot whose /StructElem tree (one element per text line, H1 for
the first line of page 1) points back at the MCIDs through /K arrays —
the logical-structure surface screen readers and reflow engines consume.

Reference parity: docprompt rides pdfium, which exposes tagged structure
via FPDF_StructTree; here the writer authors it, the parser DFS-walks it
(pdfparse.structure_tree), and the MCID join against per-word ``mcid``
recovers per-element text — the corpus GT formula
(corpus._tagged_structure_gt) is the non-circular check.
"""

from docprompt_spark import kernels, pdfparse
from docprompt_spark.corpus import _tagged_structure_gt, gen_doc


def _parse(pdf: bytes) -> pdfparse.PdfFile:
    return pdfparse.PdfFile(pdfparse.unwrap_pdf_bytes(pdf))


def test_structure_tree_matches_gt_all_envelope_rotations():
    # tagged envelope rotates xref form (%2) and content filter (%3)
    for idx in range(6):
        d = gen_doc(idx, seed=42, skew_every=0, envelope="tagged")
        pf = _parse(d["pdf"])
        gt_doc_id, gt_rows = _tagged_structure_gt(idx, 42)
        assert gt_doc_id == d["doc_id"]
        page_words = {}
        got = []
        for e in pf.structure_tree():
            text = ""
            if e["page_number"] > 0 and e["mcids"]:
                p = e["page_number"] - 1
                if p not in page_words:
                    page_words[p] = {
                        w["mcid"]: w["text"]
                        for w in pf.extract_page(p)["words"]
                        if "mcid" in w
                    }
                text = " ".join(page_words[p][m] for m in e["mcids"])
            got.append(
                (e["order"], e["level"], e["tag"], e["page_number"], text)
            )
        assert got == gt_rows


def test_golden_spans_are_tag_invariant():
    # BDC/EMC don't move the pen: the tagged doc's parsed spans equal the
    # goldens computed by the generator WITHOUT knowledge of tagging
    for idx in (0, 1, 2):
        d = gen_doc(idx, seed=42, skew_every=0, envelope="tagged")
        pf = _parse(d["pdf"])
        spans = []
        for p in range(len(pf.page_refs)):
            page = pf.extract_page(p)
            layout = kernels.build_page_layout(page["words"])
            spans.extend(
                (s["kind"], s["text"])
                for s in kernels.assemble_page_spans(layout, page["images"])
            )
        assert spans == [(s["kind"], s["text"]) for s in d["spans"]]


def test_every_word_carries_mcid_and_untagged_words_do_not():
    d = gen_doc(0, seed=42, skew_every=0, envelope="tagged")
    pf = _parse(d["pdf"])
    words = pf.extract_page(0)["words"]
    assert words and all("mcid" in w for w in words)
    # MCIDs are the show-op emission order: consecutive from 0
    assert sorted(w["mcid"] for w in words) == list(range(len(words)))
    # an untagged doc's word dicts stay byte-identical (no mcid key)
    u = gen_doc(0, seed=42, skew_every=0)
    uf = _parse(u["pdf"])
    assert all("mcid" not in w for w in uf.extract_page(0)["words"])


def test_default_corpus_rotates_tagged_docs():
    # idx%8==6 (skipping %3==1 form docs) in the DEFAULT corpus is tagged:
    # flagship-oracle docs exercise the BDC/EMC tokenizer path for free
    d = gen_doc(6, seed=42, skew_every=0)
    raw = pdfparse.unwrap_pdf_bytes(d["pdf"])
    assert b"/StructTreeRoot" in raw and b"/MarkInfo" in raw
    pf = _parse(raw)
    st = pf.structure_tree()
    assert st and st[0]["tag"] == "Document" and st[1]["tag"] == "H1"
    # ParentTree present with one key per page (§14.7.5.4)
    root = pf.resolve(pf.root["StructTreeRoot"])
    assert "ParentTree" in root
    assert int(pf.resolve(root["ParentTreeNextKey"])) == len(pf.page_refs)
    # form-XObject docs are never tagged (structure can't point into /Fm0)
    f = gen_doc(22, seed=42, skew_every=0)  # 22%8==6 but 22%3==1
    assert b"/StructTreeRoot" not in pdfparse.unwrap_pdf_bytes(f["pdf"])


def test_nested_sequence_without_mcid_inherits():
    # wrap a tagged page's whole text block in an artifact BMC ... EMC:
    # nested BDC/MCIDs must still resolve (inheritance + stack pop order)
    d = gen_doc(0, seed=42, skew_every=0, envelope="tagged")
    raw = pdfparse.unwrap_pdf_bytes(d["pdf"])
    pf0 = _parse(raw)
    base_words = pf0.extract_page(0)["words"]
    # re-author: prepend /Artifact BMC before BT, append EMC after ET, in
    # a fresh uncompressed content stream on a minimal single-page doc
    from docprompt_spark import pdfwrite

    ops = {"font": "F1", "size": 12.0, "x": 72.0, "y": 700.0,
           "mode": "Tm", "segments": ["hello"]}
    pdf = pdfwrite.write_pdf(
        [{"width": 612.0, "height": 792.0, "text_ops": [ops],
          "images": []}],
        doc_title="t", compress_streams=False, tagged=True,
    )
    import re

    m = re.search(
        rb"<<\s*/Length (\d+) >>\nstream\n(.*?)\nendstream", pdf, re.S
    )
    assert m and b"BDC" in m.group(2)
    content = m.group(2)
    content = content.replace(
        b"/P << /MCID 0 >> BDC", b"/Artifact BMC\n/P << /MCID 0 >> BDC"
    ).replace(b"EMC\nET", b"EMC\nET\nEMC", 1)
    body = (
        pdf[: m.start()]
        + b"<<  /Length %d >>\nstream\n" % len(content)
        + content
        + b"\nendstream"
        + pdf[m.end():]
    )
    # xref offsets after the stream are now stale -> salvage reconstructor
    pf = _parse(body)
    words = pf.extract_page(0)["words"]
    assert [w["text"] for w in words] == ["hello"]
    assert words[0]["mcid"] == 0
    assert base_words  # (envelope doc parsed fine too)
