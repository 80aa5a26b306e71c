"""Digital signatures (§12.8): append an approval-signature revision
(/FT /Sig + /ByteRange + /Contents), then structurally verify — digest
over the two ByteRange segments, whole-file coverage, tamper detection.

Reference parity: docprompt's pdfium exposes the same field surface
(FPDF_GetSignatureObject / FPDFSignatureObj_GetByteRange); CMS/X.509
chain validation is declared out of scope (/SubFilter /sha256.digest
carries the bare digest)."""

import pytest

from docprompt_spark import corpus, pdfparse, pdfwrite


def _parse(pdf_bytes):
    return pdfparse.PdfFile(pdfparse.unwrap_pdf_bytes(pdf_bytes))


def _plain_pages(n=1):
    return [
        {
            "width": 612.0, "height": 792.0, "images": [],
            "text_ops": [
                {"font": "F1", "size": 10.0, "x": 72.0, "y": 700.0,
                 "mode": "Tm", "segments": ["hello world"]}
            ],
        }
    ] * n


@pytest.mark.parametrize("idx", range(9))
def test_signed_envelope_roundtrip(idx):
    """Every signed-envelope doc (all three content filters) carries one
    valid whole-file signature matching the shared GT formula, and its
    golden text spans are signature-invariant."""
    d = corpus.gen_doc(idx, seed=7, skew_every=0, envelope="signed")
    pf = _parse(d["pdf"])
    sigs = pf.signatures()
    assert len(sigs) == 1
    s = sigs[0]
    signer, sign_time = corpus._signature_gt(d["doc_id"], idx)
    assert s["signer"] == signer
    assert s["sign_time"] == sign_time
    assert s["field_name"] == "Sig1"
    assert s["subfilter"] == "sha256.digest"
    assert s["digest_valid"] and s["covers_whole_file"]
    # signature never perturbs extraction
    assert pf.extract_page(0)["words"]
    # the sig field does not leak into the form-field surface
    assert all(f["ftype"] != "Sig" for f in pf.form_fields())


def test_tampered_byte_invalidates_digest():
    d = corpus.gen_doc(0, seed=7, skew_every=0, envelope="signed")
    raw = bytearray(pdfparse.unwrap_pdf_bytes(d["pdf"]))
    raw[50] ^= 1  # inside the first covered range
    s = pdfparse.PdfFile(bytes(raw)).signatures()[0]
    assert not s["digest_valid"]
    assert s["covers_whole_file"]


def test_appended_unsigned_revision_uncovers_file():
    """Bytes appended AFTER signing (the incremental-save attack) leave
    the digest valid over its ranges but break whole-file coverage —
    exactly the distinction the two flags encode."""
    pdf = pdfwrite.write_pdf(_plain_pages(), doc_title="t")
    signed = pdfwrite.append_signature(pdf, "A", "20260101000000Z")
    extended = pdfwrite.append_incremental_link(
        signed, "https://example.org/x", (72.0, 640.0, 272.0, 652.0)
    )
    s = pdfparse.PdfFile(extended).signatures()[0]
    assert s["digest_valid"]  # its own ranges still hash clean
    assert not s["covers_whole_file"]  # but the file grew past them


def test_short_byterange_not_whole_file():
    """A ByteRange whose second segment stops before EOF must fail the
    coverage check even though the digest over the declared ranges is
    right."""
    pdf = pdfwrite.write_pdf(_plain_pages(), doc_title="t")
    signed = bytearray(pdfwrite.append_signature(pdf, "A", "20260101Z"))
    i = signed.index(b"/ByteRange [0 ")
    j = signed.index(b"]", i)
    nums = signed[i + len(b"/ByteRange [") : j].split()
    a, la, bo, lb = (int(x) for x in nums)
    shorter = f"0 {la:010d} {bo:010d} {lb - 8:010d}".encode()
    assert len(shorter) == j - (i + len(b"/ByteRange ["))
    signed[i + len(b"/ByteRange [") : j] = shorter
    # recompute the digest over the shortened ranges so digest_valid
    # isolates the coverage failure
    import hashlib

    data = bytes(signed)
    digest = hashlib.sha256(
        data[:la] + data[bo : bo + lb - 8]
    ).hexdigest()
    c = data.index(b"/Contents <") + len(b"/Contents <")
    signed[c : c + 64] = digest.encode()
    s = pdfparse.PdfFile(bytes(signed)).signatures()[0]
    assert s["digest_valid"]
    assert not s["covers_whole_file"]


def test_default_corpus_slice_is_signed():
    """idx%8==7 default-rotation docs (classic xref, unencrypted) carry
    the signature; neighbors don't."""
    d = corpus.gen_doc(7, seed=42, skew_every=0)
    pf = _parse(d["pdf"])
    sigs = pf.signatures()
    assert len(sigs) == 1 and sigs[0]["digest_valid"]
    assert pf.extract_page(0)["words"]
    d2 = corpus.gen_doc(8, seed=42, skew_every=0)
    assert _parse(d2["pdf"]).signatures() == []


def test_refuses_double_sign():
    pdf = pdfwrite.write_pdf(_plain_pages(), doc_title="t")
    signed = pdfwrite.append_signature(pdf, "A", "20260101Z")
    with pytest.raises(ValueError):
        pdfwrite.append_signature(signed, "B", "20260102Z")
