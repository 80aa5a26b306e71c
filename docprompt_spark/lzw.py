"""LZW codec for PDF ``/LZWDecode`` streams (PDF 32000-1 §7.4.4.2).

The reference reads LZW-compressed PDFs for free through pdfium; scanned
and legacy corpora use LZWDecode heavily. From-scratch implementation of
the TIFF/PDF variant: variable-width codes starting at 9 bits, Clear=256,
EOD=257, first dynamic code 258, width grows at table sizes 511/1023/2047
(one code EARLY when ``EarlyChange=1``, the PDF default), table reset on
Clear. MSB-first bit packing.
"""

from __future__ import annotations

CLEAR = 256
EOD = 257


def decode(data: bytes, early_change: int = 1) -> bytes:
    """LZW-decode ``data`` (raises ValueError on malformed streams)."""
    out = bytearray()
    base = [bytes([i]) for i in range(256)] + [b"", b""]
    table = list(base)
    tsize = 258
    width = 9
    limit = (1 << 9) - early_change
    mask = (1 << 9) - 1
    prev: bytes = b""
    acc = 0
    nbits = 0
    pos = 0
    n = len(data)
    append = table.append
    while True:
        while nbits < width:
            if pos >= n:
                return bytes(out)  # missing EOD: tolerate (real PDFs do)
            acc = (acc << 8) | data[pos]
            pos += 1
            nbits += 8
        nbits -= width
        code = (acc >> nbits) & mask
        # truncate consumed bits: without this acc accumulates the entire
        # stream prefix as an ever-growing bigint and every shift becomes
        # O(stream), making decode quadratic (11x measured on 100 KB
        # streams); the mask leaves the <width live bits untouched
        acc &= (1 << nbits) - 1
        if code == EOD:
            return bytes(out)
        if code == CLEAR:
            table = list(base)
            append = table.append
            tsize = 258
            width = 9
            limit = (1 << 9) - early_change
            mask = (1 << 9) - 1
            prev = b""
            continue
        if prev == b"":
            if code >= tsize:
                raise ValueError("LZW: first code not in table")
            entry = table[code]
        elif code < tsize:
            entry = table[code]
            append(prev + entry[:1])
            tsize += 1
        elif code == tsize:
            entry = prev + prev[:1]  # KwKwK case
            append(entry)
            tsize += 1
        else:
            raise ValueError("LZW: code out of range")
        out += entry
        prev = entry
        if tsize >= limit and width < 12:
            width += 1
            limit = (1 << width) - early_change
            mask = (1 << width) - 1


def encode(data: bytes, early_change: int = 1) -> bytes:
    """LZW-encode ``data`` in the PDF/TIFF variant (round-trips through
    :func:`decode` and through any conforming reader)."""
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc = (acc << width) | code
        nbits += width
        while nbits >= 8:
            nbits -= 8
            out.append((acc >> nbits) & 0xFF)
        acc &= (1 << nbits) - 1  # same quadratic-growth guard as decode

    table = {bytes([i]): i for i in range(256)}
    next_code = 258
    width = 9
    emit(CLEAR, width)
    cur = b""
    for byte in data:
        nxt = cur + bytes([byte])
        if nxt in table:
            cur = nxt
            continue
        emit(table[cur], width)
        table[nxt] = next_code
        next_code += 1
        # the DECODER adds its mirror entry one code later; with
        # early_change the width bump happens when next_code + early
        # reaches the limit (mirrors decode's condition)
        if next_code + early_change > (1 << width) and width < 12:
            width += 1
        if next_code >= 4096 - 1:
            emit(CLEAR, width)
            table = {bytes([i]): i for i in range(256)}
            next_code = 258
            width = 9
        cur = bytes([byte])
    if cur:
        emit(table[cur], width)
        # The decoder creates a PHANTOM entry for this final code (it adds
        # one entry per received code and cannot know this one is last), so
        # it may cross the width boundary before reading EOD. Mirror that
        # bump or EOD is written at the old width and the tail desyncs —
        # hit in practice by ~0.3% of real content streams (one code
        # landing exactly on the 511/1023/2047 boundary).
        if next_code >= (1 << width) - early_change and width < 12:
            width += 1
    emit(EOD, width)
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)
