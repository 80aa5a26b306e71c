"""Type1 eexec-encrypted font support (docprompt_spark.cff) — Adobe Type1
spec §7.2 stream cipher, StandardEncoding, PFA hex form."""

import binascii

from docprompt_spark import cff


BODY = (
    b"/Encoding 256 array\n"
    b"dup 65 /Aacute put\ndup 66 /fi put\n"
    b"readonly def\n"
    b"/CharStrings 2 dict dup begin\n/Aacute 10 RD xxxxxxxxxx ND\nend"
)


def test_eexec_roundtrip_and_salt_skip():
    enc = cff.eexec_encrypt(BODY, salt=b"ab01")
    assert cff.eexec_decrypt(enc) == BODY
    assert enc != BODY


def test_binary_form_encoding_inside_eexec():
    font = (
        b"%!PS-AdobeFont-1.0\n/Encoding StandardEncoding def\n"
        b"currentdict end\ncurrentfile eexec\n" + cff.eexec_encrypt(BODY)
    )
    m = cff.type1_code_to_name(font)
    assert m[65] == "Aacute" and m[66] == "fi"
    # StandardEncoding seeds the non-ASCII-identity names
    assert m[39] == "quoteright" and m[96] == "quoteleft" and m[174] == "fi"


def test_pfa_hex_form():
    font = (
        b"%!PS\n/Encoding StandardEncoding def\ncurrentfile eexec\n"
        + binascii.hexlify(cff.eexec_encrypt(BODY))
        + b"\n0000000000\ncleartomark"
    )
    m = cff.type1_code_to_name(font)
    assert m[65] == "Aacute" and m[66] == "fi"


def test_cleartext_dup_overrides_standard_encoding():
    m = cff.type1_code_to_name(
        b"/Encoding StandardEncoding def\ndup 39 /comma put\n"
    )
    assert m[39] == "comma"


def test_standard_encoding_names_resolve_to_text():
    gm = cff.build_glyphmap(cff.STANDARD_ENCODING_NAMES)
    assert gm[39] == "’" and gm[96] == "‘"  # curly quotes
    # ligatures expand to their letter sequences (extraction semantics)
    assert gm[174] == "fi" and gm[175] == "fl"
    assert gm[208] == "—"  # emdash


def test_corrupt_eexec_section_degrades_to_header_names():
    font = (
        b"/Encoding 256 array\ndup 40 /plus put\n"
        b"currentfile eexec\n\xff\xfe\xfd"
    )
    m = cff.type1_code_to_name(font)
    assert m[40] == "plus"
