"""LZW codec (docprompt_spark.lzw) — PDF /LZWDecode, TIFF variant."""

import random
import zlib

import pytest

from docprompt_spark import lzw


def _pack(codes, w=9):
    acc = n = 0
    out = bytearray()
    for c in codes:
        acc = (acc << w) | c
        n += w
        while n >= 8:
            n -= 8
            out.append((acc >> n) & 0xFF)
    if n:
        out.append((acc << (8 - n)) & 0xFF)
    return bytes(out)


def test_known_vector_ababab():
    # "ABABABA": Clear, A, B, AB(258), KwKwK hit ABA(260), EOD — 9-bit codes
    v = _pack([256, 65, 66, 258, 260, 257])
    assert lzw.encode(b"ABABABA") == v
    assert lzw.decode(v) == b"ABABABA"


def test_kwkwk_decode_path():
    # code == len(table): entry = prev + prev[0]
    assert lzw.decode(_pack([256, 97, 258, 259, 257])) == b"a" + b"aa" + b"aaa"


def test_roundtrip_across_width_boundaries():
    rng = random.Random(7)
    for size in [0, 1, 255, 300, 1000, 5000, 20000, 120000]:
        for kind in ("rand", "runs", "text"):
            if kind == "rand":
                data = bytes(rng.randrange(256) for _ in range(size))
            elif kind == "runs":
                data = b"".join(
                    bytes([rng.randrange(4)]) * rng.randrange(1, 50)
                    for _ in range(size // 20 + 1)
                )[:size]
            else:
                data = (b"the quick brown fox jumps " * (size // 26 + 1))[:size]
            assert lzw.decode(lzw.encode(data)) == data


def test_table_reset_at_4095():
    rng = random.Random(3)
    big = bytes(rng.randrange(16) for _ in range(300000))  # >4096 entries
    enc = lzw.encode(big)
    assert lzw.decode(enc) == big
    assert len(enc) < len(big)  # actually compresses low-entropy data


def test_missing_eod_tolerated_and_bad_code_rejected():
    v = _pack([256, 65, 66])  # truncated, no EOD
    assert lzw.decode(v) == b"AB"
    with pytest.raises(ValueError):
        lzw.decode(_pack([256, 300, 257]))  # 300 not yet in table


def test_pdf_stream_integration():
    """An LZW-compressed content stream parses identically to Flate."""
    from docprompt_spark.corpus import gen_corpus

    lzw_doc = next(iter(gen_corpus(1, seed=99, skew_every=0, envelope="lzw")))
    plain = next(iter(gen_corpus(1, seed=99, skew_every=0)))
    assert lzw_doc["pdf"] != plain["pdf"]
    assert b"/LZWDecode" in bytes(lzw_doc["pdf"])
    assert lzw_doc["spans"] == plain["spans"]
    from docprompt_spark import pdfparse

    pages_a = pdfparse.extract_pages(bytes(lzw_doc["pdf"]))
    pages_b = pdfparse.extract_pages(bytes(plain["pdf"]))
    assert [p["words"] for p in pages_a] == [p["words"] for p in pages_b]


def test_lzw_image_decodes():
    from docprompt_spark import multimodal

    payload = lzw.encode(bytes(range(256)) * 4)
    px = multimodal.decode_image(payload, 32, 32, "lzw-gray8")
    assert px.shape == (32, 32) and px[0, 5] == 5


def test_final_code_width_boundary_phantom_entry():
    """The decoder adds a PHANTOM table entry for the final data code and
    may bump the code width before reading EOD; the encoder must mirror
    that bump. Hit by real corpus content (doc idx 9118 page 7 in the
    r3 bench corpus); the dense size sweep crosses the 511/1023 boundaries
    with the final code repeatedly."""
    for n in range(400, 1300):
        data = bytes((i * 37 + (i >> 3)) % 256 for i in range(n))
        assert lzw.decode(lzw.encode(data)) == data, n


def test_full_bench_corpus_slice_parses():
    """Every LZW-enveloped doc in a corpus slice round-trips through the
    full parse (regression: three of 24k docs failed before the phantom
    bump fix)."""
    from docprompt_spark import pdfparse
    from docprompt_spark.corpus import gen_doc

    for idx in (9118, 16262, 18142, 2, 6, 10):
        d = gen_doc(idx, seed=42)
        assert pdfparse.extract_pages(bytes(d["pdf"]))


def test_large_stream_roundtrip_masked_accumulator():
    """r6: the decoder/encoder truncate their bit accumulators after each
    code (without it both were quadratic in stream size — 11x measured on
    100 KB streams). Pin correctness of the masked path on streams large
    enough that every width (9-12 bits) and several CLEAR resets are
    crossed, plus a low-entropy stream that rides maximum-length table
    entries."""
    import random

    rng = random.Random(20260822)
    words = [b"scan", b"batch", b"line", b"column", b"value", b"spark"]
    big = b" ".join(rng.choice(words) for _ in range(30000))  # ~160 KB
    assert lzw.decode(lzw.encode(big)) == big
    runs = b"".join(bytes([b]) * rng.randrange(1, 60) for b in range(256)) * 3
    assert lzw.decode(lzw.encode(runs)) == runs
