"""Document recompression (D6) — the reference's ghostscript analog.

The reference shells out to ghostscript to shrink oversized documents
before provider upload (`_exec/ghostscript.py:15-88` — pdfwrite device
with /DCTEncode or /FlateEncode image filters at -dJPEGQ=95;
`utils/compressor.py:7-14` bytes wrapper; triggered when
``bytes_per_page > 2 MB``, `tasks/ocr/gcp.py:504-506`). This module is
the same operation from scratch, with no subprocess:

* every decodable 8-bit image XObject is decoded through the real codec
  stack (:func:`multimodal.decode_image` — raw/Flate/LZW/DCT/JPX) and
  re-encoded as DCTDecode (``mode="jpeg"``, quality 95) or FlateDecode
  (``mode="lossless"``) over the engine's gray8 raster plane;
* 1-bit material (CCITT, JBIG2, /ImageMask stencils) is left untouched,
  matching ghostscript's Color/GrayImageFilter scope;
* every other decodable stream (content, fonts, ToUnicode) is
  re-encoded with Flate;
* encrypted input is emitted decrypted (what gs does with an empty
  user password), object streams are flattened to classic xref.

Object numbers are preserved, so indirect references serialize
verbatim and the page tree / resources survive untouched — extraction
output is invariant modulo ``media_ref`` (an md5 of the *encoded*
payload, which recompression necessarily changes).
"""

from __future__ import annotations

import zlib
from typing import Any, Dict, Optional, Tuple

import numpy as np

from docprompt_spark.pdfparse import (
    HexString,
    LitString,
    Name,
    PdfFile,
    Ref,
    Stream,
    unwrap_pdf_bytes,
)
from docprompt_spark.pdfwrite import _Builder, fmt_num

# pages averaging more than this many bytes trigger recompression in the
# reference's chunked-OCR path (gcp.py:504: 2 MB / page)
DEFAULT_BYTES_PER_PAGE_THRESHOLD = 2 * 1024 * 1024


def _ser_name(n: str) -> str:
    out = []
    for ch in n:
        o = ord(ch)
        if o <= 0x20 or o > 0x7E or ch in "()<>[]{}/%#":
            out.append(f"#{o:02X}")
        else:
            out.append(ch)
    return "/" + "".join(out)


def _ser(obj: Any) -> str:
    """Parsed object -> PDF syntax (everything except Stream bodies)."""
    if obj is None:
        return "null"
    if isinstance(obj, bool):
        return "true" if obj else "false"
    if isinstance(obj, Ref):
        return f"{obj.num} {obj.gen} R"
    if isinstance(obj, Name):
        return _ser_name(str(obj))
    if isinstance(obj, (LitString, HexString, bytes)):
        return "<" + bytes(obj).hex().upper() + ">"
    if isinstance(obj, (int, float)):
        return fmt_num(obj)
    if isinstance(obj, dict):
        inner = " ".join(
            f"{_ser_name(str(k))} {_ser(v)}" for k, v in obj.items()
        )
        return f"<< {inner} >>"
    if isinstance(obj, (list, tuple)):
        return "[" + " ".join(_ser(v) for v in obj) + "]"
    if isinstance(obj, str):  # plain str that lost its Name wrapper
        return _ser_name(obj)
    raise TypeError(f"unserializable PDF object: {type(obj)!r}")


def _stream_body(d: dict, payload: bytes) -> bytes:
    d = dict(d)
    d["Length"] = len(payload)
    head = (_ser(d) + "\nstream\n").encode("latin-1")
    return head + payload + b"\nendstream"


def _recompress_image(
    xo: Stream, resolve, mode: str
) -> Optional[Tuple[dict, bytes]]:
    """Re-encode one image XObject; None = leave untouched (1-bit
    material, stencils, or anything the decode stage cannot handle)."""
    from docprompt_spark import multimodal

    d = xo.dict
    if resolve(d.get("ImageMask")):
        return None
    bpc = int(resolve(d.get("BitsPerComponent", 0)) or 0)
    if bpc != 8:
        return None  # CCITT / JBIG2 1-bit: out of filter scope, like gs
    w = int(resolve(d.get("Width", 0)))
    h = int(resolve(d.get("Height", 0)))
    codec = multimodal._codec_of(d, resolve, xo.raw)
    try:
        px = multimodal.decode_image(
            xo.raw, w, h, codec,
            palette=multimodal.indexed_palette(d, resolve),
        )
    except Exception:
        return None
    px = np.ascontiguousarray(px[:h, :w], dtype=np.uint8)
    nd = {
        k: v
        for k, v in d.items()
        if str(k) not in ("Filter", "DecodeParms", "DP", "Decode", "Length")
    }
    nd["ColorSpace"] = Name("DeviceGray")
    nd["BitsPerComponent"] = 8
    if mode == "jpeg":
        from docprompt_spark import jpeg

        nd["Filter"] = Name("DCTDecode")
        return nd, jpeg.encode(px, quality=95)
    nd["Filter"] = Name("FlateDecode")
    return nd, zlib.compress(px.tobytes(), 9)


def recompress_pdf(data: bytes, mode: str = "jpeg") -> bytes:
    """Rewrite a document with recompressed streams (see module doc).

    ``mode``: ``"jpeg"`` (DCTEncode at quality 95, the reference default)
    or ``"lossless"`` (FlateEncode).
    """
    if mode not in ("jpeg", "lossless"):
        raise ValueError(f"mode must be jpeg|lossless, got {mode!r}")
    pf = PdfFile(data)
    nums = sorted(set(pf.xref) | set(pf._compressed))
    encrypt_num = None
    enc_ref = pf.trailer.get("Encrypt")
    if isinstance(enc_ref, Ref):
        encrypt_num = enc_ref.num

    b = _Builder()
    max_num = max(nums) if nums else 0
    for _ in range(max_num):
        b.reserve()

    for num in nums:
        try:
            obj = pf.get_object(num)
        except Exception:
            obj = None
        if num == encrypt_num or obj is None:
            b.set(num, b"null")  # output is decrypted; drop the dict
            continue
        if not isinstance(obj, Stream):
            b.set(num, _ser(obj).encode("latin-1"))
            continue
        d = obj.dict
        typ = str(pf.resolve(d.get("Type", "")))
        if typ in ("ObjStm", "XRef"):
            # members were enumerated individually; classic xref replaces
            b.set(num, b"null")
            continue
        if str(pf.resolve(d.get("Subtype", ""))) == "Image":
            re_im = _recompress_image(obj, pf.resolve, mode)
            if re_im is not None:
                nd, payload = re_im
                b.set(num, _stream_body(nd, payload))
                continue
            b.set(num, _stream_body(d, obj.raw))
            continue
        # generic stream: decode whatever filter chain it carries and
        # re-emit Flate (idempotent for already-Flate streams)
        try:
            plain = obj.data(pf.resolve)
        except Exception:
            b.set(num, _stream_body(d, obj.raw))
            continue
        nd = {
            k: v
            for k, v in d.items()
            if str(k) not in ("Filter", "DecodeParms", "DP", "Length")
        }
        nd["Filter"] = Name("FlateDecode")
        b.set(num, _stream_body(nd, zlib.compress(plain, 9)))

    for i in range(1, max_num + 1):
        if b.objects[i - 1] is None:
            b.set(i, b"null")  # xref gap (free entry): keep numbering dense

    root = pf.trailer["Root"]
    info = pf.trailer.get("Info")
    return b.assemble(
        root.num, info.num if isinstance(info, Ref) else None
    )


def maybe_recompress(
    data: bytes,
    *,
    mode: str = "jpeg",
    threshold: int = DEFAULT_BYTES_PER_PAGE_THRESHOLD,
) -> Tuple[bytes, bool]:
    """The reference's conditional trigger (gcp.py:504-506): recompress
    only when the document averages more than ``threshold`` bytes per
    page. Returns ``(bytes, was_recompressed)``."""
    raw = unwrap_pdf_bytes(data)
    n_pages = max(1, PdfFile(raw).page_count)
    if len(raw) / n_pages <= threshold:
        return raw, False
    return recompress_pdf(raw, mode), True
