"""Document-structure layer (§12.3.3 outlines, §12.7 AcroForm, §7.11.4
embedded files, §14.3 metadata): author → serialize → parse → walk
roundtrips across envelopes, plus the default-corpus rotation slice.

Reference parity: docprompt surfaces per-document metadata and provider
sidecars; the structure layer here is the PDF-native carrier of the same
interchange data (reference delegates PDF object access to pdfium)."""

import hashlib

import pytest

from docprompt_spark import corpus, pdfparse, pdfwrite


def _flatten_outline_gt(items, level=0):
    out = []
    for it in items:
        out.append((it["title"], level, it["page"] + 1, it["y"]))
        out.extend(_flatten_outline_gt(it["kids"], level + 1))
    return out


def _parse(pdf_bytes):
    return pdfparse.PdfFile(pdfparse.unwrap_pdf_bytes(pdf_bytes))


@pytest.mark.parametrize("idx", range(12))
def test_structured_envelope_roundtrip(idx):
    """Every structured-envelope doc (both xref envelopes, flate/raw/lzw,
    AES-128 quarter) round-trips metadata, outlines, fields, attachments."""
    d = corpus.gen_doc(idx, seed=7, skew_every=0, envelope="structured")
    gt = corpus._doc_structure_gt(d["doc_id"], idx, d["n_pages"])
    pf = _parse(d["pdf"])

    info = pf.doc_info()
    assert info["title"] == d["doc_id"]
    assert info["author"] == gt["info"]["author"]
    assert info["subject"] == gt["info"]["subject"]
    assert info["producer"] == gt["info"]["producer"]
    assert info["creation"] == gt["info"]["creation"]

    got = [
        (e["title"], e["level"], e["page_number"], e["y"])
        for e in pf.outline_entries()
    ]
    assert got == _flatten_outline_gt(gt["outlines"])
    orders = [e["order"] for e in pf.outline_entries()]
    assert orders == list(range(len(got)))

    fields = {f["name"]: f for f in pf.form_fields()}
    assert len(fields) == len(gt["fields"])
    for g in gt["fields"]:
        f = fields[g["name"]]
        assert f["ftype"] == g["ftype"]
        assert f["value"] == g["value"]
        assert f["page_number"] == g["page"] + 1
        assert tuple(f["rect"]) == g["rect"]

    atts = pf.attachments()
    assert [a["name"] for a in atts] == [a["name"] for a in gt["attachments"]]
    for a, g in zip(atts, gt["attachments"]):
        md5 = hashlib.md5(g["data"]).hexdigest()
        assert a["mime"] == g["mime"]
        assert a["size"] == len(g["data"])
        # declared /CheckSum == md5 of the DECODED payload: proves the
        # Flate decode and (on the AES quarter) stream decryption
        assert a["checksum"] == md5
        assert a["payload_md5"] == md5

    xmp = pf.xmp_metadata()
    assert xmp is not None and d["doc_id"] in xmp
    assert gt["info"]["producer"] in xmp


def test_hierarchical_field_name_and_inheritance():
    """applicant.name: /T joins through /Kids with '.', /FT inherited from
    the parent node (§12.7.3.1)."""
    d = corpus.gen_doc(0, seed=7, skew_every=0, envelope="structured")
    pf = _parse(d["pdf"])
    f = {x["name"]: x for x in pf.form_fields()}["applicant.name"]
    assert f["ftype"] == "Tx"  # parent carries /FT; widget kid inherits


def test_checkbox_value_is_name_not_string():
    for idx in (0, 1):
        d = corpus.gen_doc(idx, seed=7, skew_every=0, envelope="structured")
        pf = _parse(d["pdf"])
        f = {x["name"]: x for x in pf.form_fields()}["approved"]
        assert f["value"] == ("Yes" if idx % 2 == 0 else "Off")


def test_name_tree_kids_split():
    """Two attachments → the writer splits the /EmbeddedFiles tree into
    two /Kids leaf nodes with /Limits; the parser walks them in order."""
    idx = 1  # idx%2==1 → two attachments
    d = corpus.gen_doc(idx, seed=7, skew_every=0, envelope="structured")
    pf = _parse(d["pdf"])
    root = pf.resolve(pf.root["Names"])
    tree = pf.resolve(root["EmbeddedFiles"])
    assert "Kids" in tree and len(pf.resolve(tree["Kids"])) == 2
    atts = pf.attachments()
    assert len(atts) == 2
    assert atts[0]["name"] <= atts[1]["name"]  # name-tree order


def test_encrypted_structure_strings_decrypt():
    """idx%4==2 structured docs encrypt with AES-128 (classic envelope):
    outline titles, field values and the attachment /CheckSum are
    object-key-encrypted strings and must decrypt transparently."""
    idx = 2
    d = corpus.gen_doc(idx, seed=7, skew_every=0, envelope="structured")
    pf = _parse(d["pdf"])
    assert pf._crypt is not None, "idx%4==2 must be encrypted"
    gt = corpus._doc_structure_gt(d["doc_id"], idx, d["n_pages"])
    assert pf.doc_info()["author"] == gt["info"]["author"]
    assert [e["title"] for e in pf.outline_entries()] == [
        t for t, *_ in _flatten_outline_gt(gt["outlines"])
    ]
    atts = pf.attachments()
    assert atts and all(a["checksum"] == a["payload_md5"] for a in atts)


def test_default_corpus_slice_carries_structure():
    """idx%8==2 default-rotation docs carry the structure layer; their
    golden spans are structure-invariant (the flagship oracle proves it
    at the gate; here: text still extracts and fields exist)."""
    d = corpus.gen_doc(10, seed=42, skew_every=0)
    pf = _parse(d["pdf"])
    assert pf.form_fields() and pf.outline_entries() and pf.attachments()
    assert pf.extract_page(0)["words"]
    d3 = corpus.gen_doc(3, seed=42, skew_every=0)
    pf3 = _parse(d3["pdf"])
    assert not pf3.form_fields() and not pf3.outline_entries()


def test_structure_absent_returns_empty():
    pages = [
        {
            "width": 612.0, "height": 792.0, "images": [],
            "text_ops": [
                {"font": "F1", "size": 10.0, "x": 72.0, "y": 700.0,
                 "mode": "Tm", "segments": ["hello world"]}
            ],
        }
    ]
    pdf = pdfwrite.write_pdf(pages, doc_title="t")
    pf = _parse(pdf)
    assert pf.outline_entries() == []
    assert pf.form_fields() == []
    assert pf.attachments() == []
    assert pf.xmp_metadata() is None
    info = pf.doc_info()
    assert info["title"] == "t" and info["author"] is None


def test_xref_stream_structure_objects_in_objstm():
    """In the 1.5+ envelope the structure dicts ride inside the ObjStm
    (plaintext strings, §7.5.7) while EF streams stay direct — the
    roundtrip at idx 1/3/5… proves both; here assert the envelope."""
    d = corpus.gen_doc(1, seed=7, skew_every=0, envelope="structured")
    raw = pdfparse.unwrap_pdf_bytes(d["pdf"])
    assert b"/ObjStm" in raw and b"/Filespec" not in raw.split(b"stream")[0]
    pf = _parse(raw)
    assert pf.attachments()


@pytest.mark.parametrize("idx", range(12))
def test_page_labels_roundtrip(idx):
    """/PageLabels (§12.4.2) author → serialize → parse across all
    structured envelopes: the parsed per-page labels must equal the
    corpus generator's independently-formatted ground truth (greedy
    roman / base-26 letters, computed without the parser's converter)."""
    d = corpus.gen_doc(idx, seed=7, skew_every=0, envelope="structured")
    gt = corpus._doc_structure_gt(d["doc_id"], idx, d["n_pages"])
    pf = _parse(d["pdf"])
    assert pf.page_labels() == gt["page_label_strings"]
    assert len(pf.page_labels()) == d["n_pages"]


def test_page_labels_nested_kids_tree():
    """Multi-range docs serialize as a two-kid number tree with /Limits
    (not flat /Nums) — assert the nested form is actually on disk and
    the walk still resolves it."""
    for idx in range(12):
        d = corpus.gen_doc(idx, seed=7, skew_every=0, envelope="structured")
        if d["n_pages"] > 1:
            break
    else:
        pytest.skip("no multi-page structured doc")
    pf = _parse(d["pdf"])
    pl = pf.resolve(pf.root["PageLabels"])
    assert "Kids" in pl and "Nums" not in pl
    kids = [pf.resolve(k) for k in pf.resolve(pl["Kids"])]
    assert len(kids) == 2 and all("Limits" in k for k in kids)
    gt = corpus._doc_structure_gt(d["doc_id"], idx, d["n_pages"])
    assert pf.page_labels() == gt["page_label_strings"]
    # front matter is lowercase roman, chapter pages carry the prefix
    assert pf.page_labels()[0] == "i"
    assert pf.page_labels()[1].startswith(f"C{idx % 4}-")


def test_page_labels_encrypted_prefix_decrypts():
    """idx%4==2 structured docs are AES-128: the /P prefix string is
    object-key-encrypted and must decrypt transparently."""
    idx = 2
    d = corpus.gen_doc(idx, seed=7, skew_every=0, envelope="structured")
    pf = _parse(d["pdf"])
    assert pf._crypt is not None
    gt = corpus._doc_structure_gt(d["doc_id"], idx, d["n_pages"])
    assert pf.page_labels() == gt["page_label_strings"]


def test_page_labels_absent_and_fallback():
    pages = [
        {
            "width": 612.0, "height": 792.0, "images": [],
            "text_ops": [
                {"font": "F1", "size": 10.0, "x": 72.0, "y": 700.0,
                 "mode": "Tm", "segments": ["hello"]}
            ],
        }
    ] * 2
    pdf = pdfwrite.write_pdf(pages, doc_title="t")
    pf = _parse(pdf)
    assert pf.page_labels() == []


def test_page_label_roman_letter_formatting():
    """Spot-check the style converters through a real document: roman
    front matter counts i, ii, iii… and letter styles wrap at Z→AA."""
    struct = {
        "info": {"author": "a", "subject": "s", "producer": "p",
                 "creation": "D:20200101000000Z"},
        "outlines": [], "fields": [], "attachments": [], "xmp": False,
        "page_labels": [(0, {"style": "r", "st": 1}),
                        (3, {"style": "A", "prefix": "X-", "st": 25})],
    }
    pages = [
        {
            "width": 612.0, "height": 792.0, "images": [],
            "text_ops": [
                {"font": "F1", "size": 10.0, "x": 72.0, "y": 700.0,
                 "mode": "Tm", "segments": ["p"]}
            ],
        }
    ] * 8
    pdf = pdfwrite.write_pdf(pages, doc_title="t", structure=struct)
    pf = _parse(pdf)
    assert pf.page_labels() == [
        "i", "ii", "iii", "X-Y", "X-Z", "X-AA", "X-BB", "X-CC"
    ]


def test_named_destinations_resolve_through_name_tree():
    """§12.3.2.3: alternating outline items target NAMED destinations in
    the catalog /Names /Dests tree (two-kid /Limits form, value forms
    rotating bare-array and /D dict) — entries resolve to the same
    page/y as the direct form, and the wire actually carries the tree."""
    for idx in range(4):
        d = corpus.gen_doc(idx, seed=7, skew_every=0, envelope="structured")
        gt = corpus._doc_structure_gt(d["doc_id"], idx, d["n_pages"])
        if not gt["outlines"]:
            continue
        raw = pdfparse.unwrap_pdf_bytes(d["pdf"])
        pf = _parse(raw)
        got = [
            (e["title"], e["page_number"], e["y"])
            for e in pf.outline_entries()
        ]
        want = [
            (t, pg, y) for t, _lvl, pg, y in _flatten_outline_gt(gt["outlines"])
        ]
        assert got == want
        names = pf.resolve(pf.root.get("Names"))
        dests = pf.resolve(names.get("Dests"))
        n_named = sum(
            1 for e in pf.outline_entries()
        )  # entries resolved fine above; assert the tree form on disk
        if n_named >= 3:
            assert "Kids" in dests and "Names" not in dests
            kids = [pf.resolve(k) for k in pf.resolve(dests["Kids"])]
            assert all("Limits" in k for k in kids)
        # both value forms occur across the corpus
    forms = set()
    for idx in range(6):
        d = corpus.gen_doc(idx, seed=7, skew_every=0, envelope="structured")
        pf = _parse(d["pdf"])
        names = pf.resolve(pf.root.get("Names"))
        if not isinstance(names, dict) or names.get("Dests") is None:
            continue
        def walk(node):
            node = pf.resolve(node)
            arr = pf.resolve(node.get("Names")) or []
            for i in range(1, len(arr), 2):
                v = pf.resolve(arr[i])
                forms.add("dict" if isinstance(v, dict) else "array")
            for kid in pf.resolve(node.get("Kids")) or []:
                walk(kid)
        walk(names["Dests"])
    assert forms == {"dict", "array"}


def test_toc_goto_link_resolves_named_destination():
    """Docs with outlines carry a page-1 /Link whose /Dest is the FIRST
    registered named destination (§12.6.4.2) — the TOC-entry form; the
    reader resolves it through the /Names /Dests tree to a page + XYZ y.
    Registration is children-first (the writer builds kid outline nodes
    before their parent's body), so the target is the first deep leaf."""
    def first_registered(items):
        # mirror _build_outline: kids recurse before the parent registers
        it = items[0]
        if it.get("kids"):
            return first_registered(it["kids"])
        return it

    checked = 0
    for idx in range(12):
        d = corpus.gen_doc(idx, seed=7, skew_every=0, envelope="structured")
        gt = corpus._doc_structure_gt(d["doc_id"], idx, d["n_pages"])
        if not gt["outlines"]:
            continue
        pf = _parse(d["pdf"])
        links = [
            a for a in pf.extract_page(0)["annots"]
            if a["subtype"] == "Link"
        ]
        assert len(links) == 1
        a = links[0]
        tgt = first_registered(gt["outlines"])
        assert a["dest_page"] == tgt["page"] + 1
        assert a["dest_y"] == tgt["y"]
        assert a["uri"] is None
        checked += 1
    assert checked
