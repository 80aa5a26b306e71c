"""Text-state operators (§9.3.1): Tc character spacing, Tw word spacing,
Tz horizontal scaling, Ts rise — the justified/letter-spaced/condensed/
superscript forms real typesetters emit. Geometry follows the §9.4.4
displacement ((w0/1000*Tfs + Tc [+ Tw on byte-32]) * Th) bit-exactly."""

import pytest

from docprompt_spark import corpus, kernels, pdfparse, pdfwrite


def _words(ops):
    pages = [{"width": 612.0, "height": 792.0, "images": [],
              "text_ops": ops}]
    pdf = pdfwrite.write_pdf(pages, doc_title="t")
    return pdfparse.PdfFile(pdf).extract_page(0)["words"]


def _op(text, **kw):
    d = {"font": "F1", "size": 10.0, "x": 72.0, "y": 700.0, "mode": "Tm",
         "segments": [text]}
    d.update(kw)
    return d


def test_word_spacing_widens_gaps_only():
    base = _words([_op("alpha beta")])
    spaced = _words([_op("alpha beta", word_spacing=4.0)])
    assert [w["text"] for w in base] == ["alpha", "beta"]
    assert [w["text"] for w in spaced] == ["alpha", "beta"]
    # first word identical; second shifted right by exactly Tw/612
    assert spaced[0] == base[0]
    assert spaced[1]["x0"] > base[1]["x0"]
    assert spaced[1]["x1"] - spaced[1]["x0"] == pytest.approx(
        base[1]["x1"] - base[1]["x0"], abs=1e-9
    )


def test_char_spacing_widens_words():
    base = _words([_op("alpha")])
    sp = _words([_op("alpha", char_spacing=0.5)])
    assert sp[0]["x1"] - sp[0]["x0"] > base[0]["x1"] - base[0]["x0"]


def test_hscale_condenses():
    base = _words([_op("alphabet")])
    half = _words([_op("alphabet", hscale_pct=50.0)])
    bw = base[0]["x1"] - base[0]["x0"]
    hw = half[0]["x1"] - half[0]["x0"]
    assert hw == pytest.approx(bw / 2.0, abs=1e-9)


def test_rise_shifts_baseline():
    base = _words([_op("super")])
    up = _words([_op("super", rise=2.5)])
    assert up[0]["top"] < base[0]["top"]
    assert base[0]["top"] - up[0]["top"] == pytest.approx(
        2.5 / 792.0, abs=1e-5  # bbox coords are round5-rounded
    )
    assert (up[0]["x0"], up[0]["x1"]) == (base[0]["x0"], base[0]["x1"])


def test_state_resets_after_op():
    """The writer scopes per-op text state with explicit resets; a
    following default op is byte-identical to the no-spacing document."""
    plain = _words([_op("alpha"), _op("beta", y=680.0)])
    mixed = _words(
        [_op("alpha", char_spacing=0.25, word_spacing=1.0,
             hscale_pct=50.0, rise=1.5),
         _op("beta", y=680.0)]
    )
    assert mixed[1] == plain[1]


@pytest.mark.parametrize("idx", [4, 12, 20, 36, 44])
def test_default_corpus_spacing_slice_golden_parity(idx):
    """idx%8==4 docs carry the four-form text-state line; golden spans
    are bit-exact (the flagship oracle proves this at the gate too)."""
    d = corpus.gen_doc(idx, seed=42, skew_every=0)
    pf = pdfparse.PdfFile(pdfparse.unwrap_pdf_bytes(d["pdf"]))
    page_results = []
    for p in range(d["n_pages"]):
        ep = pf.extract_page(p)
        layout = kernels.build_page_layout(ep["words"])
        spans = kernels.assemble_page_spans(layout, ep["images"])
        page_results.append(
            {"page_number": p + 1, "page_text": layout["page_text"],
             "spans": spans}
        )
    assert kernels.assemble_doc_spans(page_results) == d["spans"]
    txt = " ".join(pr["page_text"] for pr in page_results)
    for t in ("justified", "letterspaced", "condensed", "super"):
        assert t in txt


def test_double_quote_operator_sets_spacing_and_shows():
    """aw ac string \" (§9.4.3): sets Tw/Tc, moves to the next line and
    shows — the one-op-per-line justified form."""
    pages = [{"width": 612.0, "height": 792.0, "images": [],
              "text_ops": [_op("alpha beta gamma delta")]}]
    pdf = pdfwrite.write_pdf(pages, doc_title="t")
    pf = pdfparse.PdfFile(pdf)
    res = pf.resolve(pf._inherited(pf.resolve(pf.page_refs[0]), "Resources"))
    fonts = {"F1": pf._load_font(res["Font"]["F1"])}
    content = (
        b'BT /F1 10 Tf 14 TL 72 700 Td'
        b' 4 0.25 (alpha beta) " 0 0 (alpha beta) " ET'
    )
    words, _, _ = pdfparse._interpret_content(
        content, fonts=fonts, xobjects={}, resolve=pf.resolve,
        page_w=612.0, page_h=792.0,
    )
    assert [w["text"] for w in words] == ["alpha", "beta", "alpha", "beta"]
    assert words[1]["x0"] > words[3]["x0"]  # Tw=4 widened line 1 only
    assert words[0]["top"] < words[2]["top"]  # TL advanced the baseline
