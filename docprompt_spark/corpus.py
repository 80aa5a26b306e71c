"""Deterministic synthetic corpus: interleaved text+media documents.

Each document row carries:
* ``doc_id``      — stable key
* ``pdf``         — real PDF bytes (optionally base64/gzip-wrapped, matching
                    the reference's byte-sniffing path, document.py:111-127)
* ``n_pages``     — page count (drives the salting/explode stage)
* ``spans``       — the GOLDEN ordered span sequence
                    (kind, text, media_ref, offset) the pipeline must
                    reproduce by parsing ``pdf`` from scratch

Golden spans are computed from the generator's ground-truth word geometry via
the same layout kernels the pipeline uses (docprompt_spark.kernels) — the PDF
parse itself is therefore independently verified by span equality.

All coordinates are dyadic rationals (multiples of 1/16 PDF unit) so that
Td-relative positioning accumulates exactly in IEEE754 and the parser recovers
bit-identical geometry.

Skew: every ``skew_every``-th document is a multi-dozen-page "book" standing
in for the reference's multi-thousand-page case (the LPT balancing problem of
/root/reference/docprompt/_pdfium.py:258-289); the pipeline handles it via
page-bucket salting rather than greedy bin-packing.
"""

from __future__ import annotations

import base64
import gzip
import zlib
import hashlib
import math
import random
import re
from typing import Dict, List, Optional, Tuple

from docprompt_spark import kernels
from docprompt_spark.pdfwrite import (
    ASCENT_PM,
    DESCENT_PM,
    advance_width,
    char_width_pm,
    write_pdf,
)

PAGE_W, PAGE_H = 612.0, 792.0
FONT_SIZE = 10.0
LEADING = 14.5          # baseline-to-baseline within a paragraph (dyadic)
PARA_EXTRA = 29.0       # extra gap between paragraphs (dyadic)
IMG_GAP = 20.5          # gap after an inline image (dyadic)
MARGIN_X = 72.0
TOP_Y = 720.0
MIN_Y = 110.0


def _snap16(v: float) -> float:
    """Round up to the next multiple of 1/16 (exact in binary floating point)."""
    return math.ceil(v * 16.0) / 16.0


def _indexed_palette() -> bytes:
    """Fixed 256-entry RGB lookup table for /Indexed images (GIF-heritage
    palettized figures): a deterministic formula, luma-injective enough
    that palette-lookup errors change the decoded ground truth."""
    return bytes(
        v for i in range(256) for v in (i, (i * 3 + 40) % 256, 255 - i)
    )


def _pack4(samples: bytes, px_w: int, px_h: int) -> bytes:
    """Quantize gray8 to 4-bit (v >> 4) and pack two samples per byte,
    rows padded to whole bytes (PDF §8.9.3 sample packing)."""
    out = bytearray()
    for y in range(px_h):
        row = samples[y * px_w : (y + 1) * px_w]
        for i in range(0, px_w, 2):
            hi = row[i] >> 4
            lo = (row[i + 1] >> 4) if i + 1 < px_w else 0
            out.append((hi << 4) | lo)
    return bytes(out)


def _png_up_predict(samples: bytes, px_w: int, px_h: int) -> bytes:
    """PNG Up-filter rows (predictor family 10-15): what pdf optimizers
    emit when re-Flating image streams."""
    out = bytearray()
    prev = bytes(px_w)
    for y in range(px_h):
        row = samples[y * px_w : (y + 1) * px_w]
        out.append(2)  # Up
        out.extend((row[i] - prev[i]) & 0xFF for i in range(px_w))
        prev = row
    return bytes(out)


_ASCII = "abcdefghijklmnopqrstuvwxyz"
_EXTRA = "ABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789"
_PUNCT = ".,;:()[]\\'\"-"
_UNI = "αβγδεζηθικλμνξπρστυφχψωÀÉÎÕüßñç№€"


def _make_vocab(seed: int, n: int = 800) -> Tuple[List[str], List[str]]:
    rng = random.Random(f"vocab:{seed}")
    ascii_words, uni_words = [], []
    for i in range(n):
        length = rng.randint(2, 9)
        chars = [rng.choice(_ASCII) for _ in range(length)]
        if rng.random() < 0.2:
            chars[0] = rng.choice(_EXTRA)
        if rng.random() < 0.15:
            chars.append(rng.choice(_PUNCT))
        ascii_words.append("".join(chars))
    for i in range(n // 4):
        length = rng.randint(2, 6)
        uni_words.append("".join(rng.choice(_UNI + _ASCII) for _ in range(length)))
    return ascii_words, uni_words


_VOCAB_CACHE: Dict[int, Tuple[List[str], List[str]]] = {}


def _vocab(seed: int) -> Tuple[List[str], List[str]]:
    if seed not in _VOCAB_CACHE:
        _VOCAB_CACHE[seed] = _make_vocab(seed)
    return _VOCAB_CACHE[seed]


def _gen_page(
    rng: random.Random, use_f2: bool, seed: int, img_codec: str = None,
    inline: Optional[bool] = None,
) -> Tuple[dict, List[dict], List[dict]]:
    """Returns (writer_page, ground-truth words, ground-truth images).

    ``img_codec`` forces every image's encoding ('raw'/'flate'/'lzw'/'dct'/
    'ccitt') — the rng draw still happens so forced corpora keep identical
    geometry/text to the default rotation."""
    ascii_words, uni_words = _vocab(seed)
    text_ops: List[dict] = []
    images_w: List[dict] = []
    words_gt: List[dict] = []
    images_gt: List[dict] = []

    y = TOP_Y
    n_paras = rng.randint(2, 4)
    first_op_of_page = True
    for para in range(n_paras):
        if y < MIN_Y:
            break
        if para > 0 and rng.random() < 0.35:
            # inline figure between paragraphs -> media span. The payload is
            # a REAL raster: 8-bit grayscale gradient+noise samples sized
            # exactly /Width x /Height, stored raw or FlateDecode-compressed
            # (rotating) — genuinely decodable by the multimodal pipeline.
            h = rng.choice([48.0, 64.0, 96.0])
            w = rng.choice([96.0, 128.0, 160.0])
            y -= h
            ix = _snap16(MARGIN_X + rng.random() * 280.0)
            px_w = rng.choice([16, 24, 32])
            px_h = rng.choice([8, 12, 16])
            base = rng.randrange(256)
            samples = bytes(
                (base + 7 * x_ + 13 * y_ + rng.randrange(32)) % 256
                for y_ in range(px_h)
                for x_ in range(px_w)
            )
            r = rng.random()
            cs = "DeviceGray"
            if img_codec is not None:
                choice = img_codec
            elif r < 0.25:
                choice = "raw"
            elif r < 0.45:
                choice = "flate"
            elif r < 0.6:
                choice = "lzw"
            elif r < 0.8:
                choice = "dct"
            else:
                choice = "ccitt"
            bpc, parms = 8, None
            decode_arr = None
            imagemask = False
            is_inline = (base % 8 in (3, 6)) if inline is None else inline
            palette = None
            if choice == "raw":
                data, filt, samples_gt = samples, None, samples
                if (base >> 7) % 2 == 1:
                    # uncompressed 8-bit DeviceRGB (screenshot-style color
                    # figures): channels derived arithmetically from the
                    # gray ramp; ground truth is the SAME BT.601 luma
                    # function the media pipeline's decode applies
                    import numpy as _np
                    from docprompt_spark.multimodal import rgb_to_gray8

                    arr = _np.frombuffer(samples, dtype=_np.uint8).reshape(
                        px_h, px_w
                    )
                    rgb = _np.stack(
                        [arr, _np.roll(arr, 3, axis=1), 255 - arr], axis=-1
                    )
                    data = rgb.tobytes()
                    samples_gt = rgb_to_gray8(rgb).tobytes()
                    cs = "DeviceRGB"
                elif (base >> 6) % 2 == 1:
                    # 4-bit grayscale (legacy low-depth scans): sample v
                    # decodes to v*17 exactly (255/15)
                    data = _pack4(samples, px_w, px_h)
                    samples_gt = bytes((b >> 4) * 17 for b in samples)
                    bpc = 4
            elif choice == "flate":
                plain = samples
                ncomp = 1
                if (base >> 7) % 2 == 1:
                    # /Indexed RGB palette (GIF-heritage figures): payload
                    # bytes are palette indices; ground truth is the BT.601
                    # luma of the looked-up RGB
                    palette = _indexed_palette()
                    pal = palette
                    samples_gt = bytes(
                        min(255, max(0, round(
                            0.299 * pal[3 * b]
                            + 0.587 * pal[3 * b + 1]
                            + 0.114 * pal[3 * b + 2]
                        )))
                        for b in samples
                    )
                    cs = f"[/Indexed /DeviceRGB 255 <{palette.hex()}>]"
                elif (base >> 6) % 2 == 1:
                    # 8-bit DeviceCMYK behind Flate (print-origin figures):
                    # four derived channels; ground truth is the SAME naive
                    # §8.6.4.4 -> luma reduction the decode stage applies
                    import numpy as _np
                    from docprompt_spark.multimodal import cmyk_to_gray8

                    arr = _np.frombuffer(samples, dtype=_np.uint8).reshape(
                        px_h, px_w
                    )
                    cmyk = _np.stack(
                        [arr, _np.roll(arr, 3, axis=1), 255 - arr, arr >> 2],
                        axis=-1,
                    )
                    plain = cmyk.tobytes()
                    samples_gt = cmyk_to_gray8(cmyk).tobytes()
                    cs = "DeviceCMYK"
                    ncomp = 4
                else:
                    samples_gt = samples
                if (base >> 5) % 2 == 1:
                    # PNG predictor on the Flate stream (optimizer output);
                    # rows are px_w*ncomp bytes for multi-component pixels
                    plain = _png_up_predict(plain, px_w * ncomp, px_h)
                    parms = (
                        f"<< /Predictor 15 /Colors {ncomp}"
                        f" /BitsPerComponent 8 /Columns {px_w} >>"
                    )
                data, filt = zlib.compress(plain, 6), "FlateDecode"
            elif choice == "lzw":
                from docprompt_spark import lzw as _lzw

                data, filt, samples_gt = _lzw.encode(samples), "LZWDecode", samples
            elif choice == "ccitt":
                # bilevel (the scanned-document path): ground truth is the
                # thresholded raster expanded back to gray8. Half the slots
                # ((base>>6)%2, XObjects only — JBIG2Decode is not a legal
                # inline filter) ship as embedded JBIG2 instead of raw G4:
                # same T.6 entropy bytes wrapped in T.88 segments.
                import numpy as _np

                arr = _np.frombuffer(samples, dtype=_np.uint8).reshape(px_h, px_w)
                if (base >> 6) % 2 == 1 and not is_inline and img_codec is None:
                    # only in the default rotation: a forced 'ccitt' corpus
                    # (extraction_ccitt_spans) stays pure CCITTFaxDecode.
                    # (base>>3)%2 (a bit only the dct branch's jpx pick
                    # reads — free here) picks SYMBOL-coded pages (symbol
                    # dict + text region, the dominant real-scan profile);
                    # else (base>>7)%2 picks MQ-arithmetic vs MMR generic-
                    # region coding — all three real T.88 profiles.
                    from docprompt_spark import jbig2 as _jbig2

                    if (base >> 3) % 2 == 1:
                        if (base >> 4) % 2 == 1:
                            # HALFTONE pages (§6.6-6.7): pattern dict +
                            # Gray-coded bitplanes — JBIG2's grayscale
                            # mode; GT is the deterministic clustered-dot
                            # dither decode(encode) computes on both sides
                            data = _jbig2.encode_gray8_halftone(arr)
                        else:
                            # corpus dims (w%8==0, h%4==0) divide the (4,8)
                            # tile grid exactly — lossless over the
                            # threshold
                            data = _jbig2.encode_gray8_symbols(arr)
                    else:
                        # arith slots: (base>>4)%2 turns on TPGDON (typical
                        # prediction, §6.2.5.7 — jbig2enc's default)
                        if (base >> 7) % 2 == 1:
                            # GB template rotates 0-3 (§6.2.5.3) — pdfium/
                            # pdf.js decode all four; template = base%4
                            # (bits 0-1 are free here: the inline pick
                            # base%8 in (3,6) is excluded on this slot,
                            # and all four %4 values still occur) so every
                            # (template, tpgdon) pair shows up corpus-wide
                            data = _jbig2.encode_generic_arith(
                                (arr < 128).astype(_np.uint8),
                                tpgdon=(base >> 4) % 2 == 1,
                                template=base % 4,
                            )
                        elif (base >> 4) % 2 == 1:
                            # REFINEMENT organization (§6.3): a coarse
                            # 2x2-majority base generic region corrected
                            # to the exact threshold bitmap by a
                            # GRTEMPLATE=1 refinement region — lossless
                            bits = (arr < 128).astype(_np.uint8)
                            blk = bits.reshape(
                                px_h // 2, 2, px_w // 2, 2
                            ).sum(axis=(1, 3))
                            coarse = _np.kron(
                                (blk >= 2).astype(_np.uint8),
                                _np.ones((2, 2), dtype=_np.uint8),
                            )
                            data = _jbig2.encode_refined(bits, coarse)
                        else:
                            data = _jbig2.encode_gray8(arr)
                    filt = "JBIG2Decode"
                    samples_gt = _jbig2.decode_to_gray8(data, px_w, px_h).tobytes()
                else:
                    from docprompt_spark import ccitt as _ccitt

                    data = _ccitt.encode_gray8(arr)
                    filt = "CCITTFaxDecode"
                    samples_gt = _ccitt.decode_to_gray8(data, px_w, px_h).tobytes()
                    parms = (
                        f"<< /K -1 /Columns {px_w} /Rows {px_h} /BlackIs1 true >>"
                    )
                bpc = 1
                if (base >> 5) % 2 == 1:
                    # ImageMask STENCIL (scanned-page tile form): samples
                    # select painted-vs-transparent; the renderer composites
                    # ink (black) only where the decoded bit is ink, leaving
                    # the background visible elsewhere. Same payload/
                    # media_ref; only paint semantics differ.
                    imagemask = True
            else:
                # baseline JPEG (DCTDecode): lossy, so the pixel ground truth
                # is the decode of the encode (deterministic fixed-table
                # math). Odd `base` values emit a COLOR (YCbCr 4:2:0) jpeg —
                # the near-universal photographic profile — whose ground
                # truth is the luma of the decoded RGB (the media pipeline's
                # gray8 reduction); no extra rng draw, so geometry/text stay
                # identical to the gray-only rotation.
                from docprompt_spark import jpeg as _jpeg
                import numpy as _np

                arr = _np.frombuffer(samples, dtype=_np.uint8).reshape(px_h, px_w)
                use_jpx = (base >> 3) % 4 == 1 and not is_inline
                if use_jpx:
                    # JPEG 2000 lossless (JPXDecode — not a legal inline
                    # filter): real 5/3 codestream; odd `base` emits RGB
                    # (3 components, no MCT) whose ground truth is the
                    # BT.601 luma of the ORIGINAL rgb (lossless decode,
                    # same reduction the media pipeline applies)
                    from docprompt_spark import jpx as _jpx

                    if base % 2 == 1:
                        rgb = _np.stack(
                            [arr, _np.roll(arr, 3, axis=1), 255 - arr], axis=-1
                        )
                        # (base>>2)%2 flags the reversible RCT (MCT=1) —
                        # the color transform real encoders emit; lossless
                        # either way so the luma ground truth is identical.
                        # (base>>5)%2 splits the codestream into a tile
                        # grid (multi-SOT layout of large scanned images);
                        # (base>>6)%2 switches to the LOSSY 9/7 profile
                        # (ICT replaces RCT when mct) — ground truth is
                        # then the decode of the encode, like DCT.
                        lossy97 = (base >> 6) % 2 == 1
                        data = _jpx.encode(
                            rgb, levels=2, mct=(base >> 2) % 2 == 1,
                            tile=((px_h // 2, px_w // 2)
                                  if (base >> 5) % 2 == 1 else None),
                            irreversible=1.0 if lossy97 else None,
                        )
                        if lossy97:
                            rgb = _jpx.decode(data).astype(_np.int32)
                        samples_gt = _np.clip(
                            _np.round(
                                0.299 * rgb[:, :, 0].astype(_np.float64)
                                + 0.587 * rgb[:, :, 1]
                                + 0.114 * rgb[:, :, 2]
                            ),
                            0,
                            255,
                        ).astype(_np.uint8).tobytes()
                        cs = "DeviceRGB"
                    else:
                        lossy97 = (base >> 6) % 2 == 1
                        data = _jpx.encode(
                            arr, levels=2,
                            tile=((px_h // 2, px_w // 2)
                                  if (base >> 5) % 2 == 1 else None),
                            irreversible=1.0 if lossy97 else None,
                        )
                        samples_gt = (
                            _jpx.decode(data).tobytes() if lossy97 else samples
                        )
                elif base % 2 == 1:
                    rgb = _np.stack(
                        [arr, _np.roll(arr, 3, axis=1), 255 - arr], axis=-1
                    )
                    data = _jpeg.encode_color(rgb, quality=90)
                    dec = _jpeg.decode(data).astype(_np.float64)
                    luma = _np.clip(
                        _np.round(
                            0.299 * dec[:, :, 0]
                            + 0.587 * dec[:, :, 1]
                            + 0.114 * dec[:, :, 2]
                        ),
                        0,
                        255,
                    ).astype(_np.uint8)
                    samples_gt = luma.tobytes()
                    cs = "DeviceRGB"
                elif base % 4 == 0:
                    # PROGRESSIVE (SOF2) variant: most real web-crawl JPEGs
                    # are progressive; rotates on the existing `base` draw so
                    # geometry/text stay identical. Same quantized
                    # coefficients as baseline -> same decoded ground truth.
                    data = _jpeg.encode_progressive(arr, quality=90)
                    samples_gt = _jpeg.decode(data).tobytes()
                else:
                    data = _jpeg.encode(arr, quality=90)
                    samples_gt = _jpeg.decode(data).tobytes()
                filt = "JPXDecode" if use_jpx else "DCTDecode"
            if (
                choice in ("raw", "flate")
                and (base >> 4) % 4 == 1
                and palette is None
                and cs == "DeviceGray"
            ):
                # /Decode [1 0]: inverted component mapping (PDF §8.9.5.2) —
                # rotated on existing `base` bits, no extra rng draws
                decode_arr = "[1 0]"
                samples_gt = bytes(255 - b for b in samples_gt)
            smask = None
            if not is_inline and not imagemask and (base >> 2) % 2 == 1:
                # /SMask soft-mask alpha (§11.6.5.2): the transparent-logo/
                # watermark form. XObjects only (SMask is not a legal inline
                # key) and never on stencils (ImageMask excludes SMask).
                # Fixed 16x8 plane ≠ parent dims, so the renderer's
                # independent alpha resample path is always exercised;
                # bytes derived arithmetically from `base` — NO extra rng
                # draws, geometry/text/payload stay identical, media_ref
                # (md5 of the PARENT stream) is smask-invariant.
                aw, ah = 16, 8
                smask = {
                    "w": aw, "h": ah,
                    "alpha": bytes(
                        (base + 23 * x_ + 41 * y_) % 256
                        for y_ in range(ah)
                        for x_ in range(aw)
                    ),
                }
            images_w.append(
                {
                    "data": data, "filter": filt, "samples": samples_gt,
                    "width": px_w, "height": px_h, "bpc": bpc,
                    "decode_parms": parms, "colorspace": cs,
                    "palette": palette,
                    "decode": decode_arr, "imagemask": imagemask,
                    "smask": smask,
                    # ICCBased colorspace wrapper (§8.6.5.5) on a third of
                    # the raw/flate/lzw device-space XObjects — the
                    # near-universal real-producer form; payload bytes and
                    # ground truth are unchanged (the reader maps /N back
                    # to the device family)
                    "icc": (
                        (base >> 2) % 3 == 1
                        and not is_inline
                        and not imagemask
                        and palette is None
                        and filt in (None, "FlateDecode", "LZWDecode")
                    ),
                    # CIE-based CalGray/CalRGB (§8.6.5.2-3) on the NEXT
                    # third — the pre-ICC archival form; ground truth is
                    # unchanged (the reader maps the family back to its
                    # device space)
                    "cal": (
                        (base >> 2) % 3 == 2
                        and not is_inline
                        and not imagemask
                        and palette is None
                        and cs in ("DeviceGray", "DeviceRGB")
                        and filt in (None, "FlateDecode", "LZWDecode")
                    ),
                    "x": ix, "y": y, "w": w, "h": h,
                    # BI/ID/EI inline images (scanned-page tiles / small
                    # logos in real PDFs): rotate ~25% of figures inline on
                    # the existing `base` draw — no geometry change
                    "inline": is_inline,
                }
            )
            gt_im = {
                "media_ref": hashlib.md5(data).hexdigest(),
                "bbox": kernels.norm_rect_bbox(ix, y, w, h, PAGE_W, PAGE_H),
                "stencil": imagemask,
            }
            if smask is not None:
                gt_im["alpha_samples"] = smask["alpha"]
                gt_im["alpha_w"] = smask["w"]
                gt_im["alpha_h"] = smask["h"]
            images_gt.append(gt_im)
            y -= IMG_GAP
            if y < MIN_Y:
                break
        f2_para = use_f2 and rng.random() < 0.5
        font = "F2" if f2_para else "F1"
        vocab = uni_words if f2_para else ascii_words
        n_lines = rng.randint(2, 5)
        for _line in range(n_lines):
            if y < MIN_Y:
                break
            x = MARGIN_X + (0.0 if rng.random() < 0.6 else _snap16(rng.random() * 40.0))
            n_words = rng.randint(3, 8)
            prev_placed = False
            for _w in range(n_words):
                word = rng.choice(vocab)
                if rng.random() < 0.2 and len(word) >= 4:
                    cut = rng.randint(1, len(word) - 1)
                    segments: List = [word[:cut], rng.choice([-40, -60, -80]), word[cut:]]
                else:
                    segments = [word]
                width = advance_width(segments, FONT_SIZE)
                if x + width > PAGE_W - MARGIN_X:
                    break
                mode = "Tm" if (first_op_of_page or not prev_placed or rng.random() < 0.5) else "Td"
                text_ops.append(
                    {"font": font, "size": FONT_SIZE, "x": x, "y": y, "mode": mode, "segments": segments}
                )
                first_op_of_page = False
                prev_placed = True
                bbox = kernels.norm_word_bbox(
                    x, y, width, FONT_SIZE, ASCENT_PM, DESCENT_PM, PAGE_W, PAGE_H
                )
                words_gt.append(
                    {"text": word, "x0": bbox[0], "top": bbox[1], "x1": bbox[2], "bottom": bbox[3]}
                )
                x = _snap16(x + width + FONT_SIZE * (0.25 + rng.random() * 0.3))
            y -= LEADING
        y -= PARA_EXTRA

    # deterministic vector decorations (rules/frames/accents/squiggles):
    # derived arithmetically from already-drawn content — NO extra rng
    # draws, so text/image geometry is identical with or without them
    k = (len(words_gt) * 37 + len(images_gt) * 101 + int(round(y))) & 0xFF
    vec_w, vec_gt = _page_vectors(k)
    page = {
        "width": PAGE_W, "height": PAGE_H, "text_ops": text_ops,
        "images": images_w, "vectors": vec_w, "vectors_gt": vec_gt,
    }
    return page, words_gt, images_gt


def _page_vectors(k: int):
    """Vector decorations for decoration-key ``k`` -> (writer path specs,
    parser-equivalent ground truth). The GT mirrors the content-stream
    interpreter exactly: same contour point order, the shared
    :func:`rasterize.flatten_cubic` for curves, the same gray/lw
    expressions — so raster md5 equality proves the author -> embed ->
    interpret -> fill loop for vector graphics too."""
    from docprompt_spark.rasterize import flatten_cubic

    writer: List[dict] = []
    gt: List[dict] = []
    x0, x1 = float(MARGIN_X), float(PAGE_W - MARGIN_X)
    # horizontal header rule (every page); a quarter ((k&96)==96) is
    # DASHED (§8.4.3.6) — the separator form style sheets emit
    lw = 1.0 + float(k % 3)
    yr = float(TOP_Y + 14 + 2 * ((k >> 3) % 4))
    w_rule = {"path": [("m", x0, yr), ("l", x1, yr)], "paint": "S",
              "gray": 0.0, "lw": lw}
    g_rule = {"contours": [[(x0, yr), (x1, yr)]], "closed": [False],
              "paint": "stroke", "gray": 0, "lw": lw}
    if (k & 96) == 96:
        dash_arr = [6.0, 3.0] if k & 4 else [2.0, 2.0]
        ph = 1.5 if k & 8 else 0.0
        w_rule["dash"] = dash_arr
        w_rule["dash_phase"] = ph
        g_rule["dash"] = [v * 1.0 for v in dash_arr]
        g_rule["dash_phase"] = ph * 1.0
    writer.append(w_rule)
    gt.append(g_rule)
    if k & 1:  # stroked page frame
        m = 40.0
        writer.append(
            {"path": [("re", m, m, PAGE_W - 2 * m, PAGE_H - 2 * m)],
             "paint": "S", "gray": 0.0, "lw": 2.0}
        )
        gt.append(
            {"contours": [[(m, m), (PAGE_W - m, m), (PAGE_W - m, PAGE_H - m),
                           (m, PAGE_H - m)]],
             "closed": [True], "paint": "stroke", "gray": 0, "lw": 2.0}
        )
    if k & 2:  # filled accent bar top-right
        g = 0.5 if (k & 4) else 0.75
        ax0, ay0, aw, ah = x1 - 90.0, float(TOP_Y + 26), 90.0, 10.0
        blend = None
        if (k & 96) == 32:
            # blend-mode slice (§11.3.5 via ExtGState /BM): the bar DROPS
            # ONTO the header rule so Multiply/Screen visibly differ from
            # Normal exactly where ink overlaps — raster md5 equality then
            # proves the blend math, not just gstate plumbing. Disjoint
            # from the dashed-rule slice ((k&96)==96).
            blend = "Multiply" if k & 8 else "Screen"
            ay0 = yr - 5.0
        w_entry = {"path": [("re", ax0, ay0, aw, ah)], "paint": "f", "gray": g}
        g_entry = {
            "contours": [[(ax0, ay0), (ax0 + aw, ay0), (ax0 + aw, ay0 + ah),
                          (ax0, ay0 + ah)]],
            "closed": [True], "paint": "fill",
            "gray": int(round(g * 255.0)), "lw": 0.0,
        }
        if k & 32:
            # translucent highlight (ExtGState /ca 0.5) — blends over the
            # header rule / page background like real watermark bars
            w_entry["alpha"] = 0.5
            g_entry["alpha"] = 0.5
        if blend is not None:
            w_entry["blend"] = blend
            g_entry["blend"] = blend
        writer.append(w_entry)
        gt.append(g_entry)
    if k & 16:  # axial gradient band (the separator/letterhead gradient)
        bx, by = x0, 96.0 + 4.0 * ((k >> 5) & 3)
        bw, bh = 320.0, 12.0
        c0 = 0.75 if (k & 2) else 0.25
        c1 = 1.0 - c0
        nexp = 2.0 if (k >> 6) & 1 else 1.0
        diag = (k >> 7) & 1 == 1  # diagonal axis exercises the projection
        bxy = (bx + bw, by + bh if diag else by)
        # function form multiplexes existing k bits ((k>>2)&3): the plain
        # exponential, a 3-stop STITCHING function (§7.10.4 — the
        # multi-stop gradient Illustrator/Inkscape emit), or a sampled
        # Type 0 stream (§7.10.2) with linear interpolation
        fsel = (k >> 2) & 3
        w_entry = {"path": [("re", bx, by, bw, bh)], "paint": "sh",
                   "coords": (bx, by, bxy[0], bxy[1])}
        g_entry = {
            "contours": [[(bx, by), (bx + bw, by), (bx + bw, by + bh),
                          (bx, by + bh)]],
            "closed": [True], "paint": "shade",
            "coords": ((bx, by), bxy),
        }
        if fsel == 3:
            mid = 0.875 if c0 < c1 else 0.125
            spec = {
                "t": 3,
                "bounds": [0.5],
                "encode": [0.0, 1.0, 0.0, 1.0],
                "subs": [
                    {"t": 2, "c0": c0, "c1": mid, "n": 1.0},
                    {"t": 2, "c0": mid, "c1": c1, "n": nexp},
                ],
            }
            w_entry["fn"] = g_entry["fn"] = spec
        elif fsel == 1:
            base = int(round(c0 * 255.0))
            top = int(round(c1 * 255.0))
            samples = [base, (base * 3 + top) // 4,
                       (base + top) // 2, top, (base + top) // 2]
            spec = {"t": 0, "samples": samples, "bps": 8}
            w_entry["fn"] = g_entry["fn"] = spec
        elif fsel == 2:
            # PostScript calculator gradient (§7.10.5): (1-t)^2 — the
            # quadratic ease-out form designers export
            spec = {"t": 4, "code": [1, "exch", "sub", "dup", "mul"]}
            w_entry["fn"] = g_entry["fn"] = spec
        else:
            w_entry.update({"c0": c0, "c1": c1, "n": nexp})
            g_entry.update({"c0": c0, "c1": c1, "n": nexp})
        writer.append(w_entry)
        gt.append(g_entry)
    if (k & 24) == 24:
        # Separation spot-color swatch (§8.6.6.4): the brand-ink block of
        # letterheads; tint transform rotates Type-4 inverse vs square
        from docprompt_spark.rasterize import eval_shading_fn

        tint = 0.75 if (k & 4) else 0.5
        sp_fn = (
            {"t": 4, "code": [1, "exch", "sub"]}
            if (k >> 6) & 1
            else {"t": 4, "code": ["dup", "mul"]}
        )
        sx, sy = x0, float(TOP_Y + 26)
        sw_, sh_ = 24.0, 10.0
        writer.append(
            {"path": [("re", sx, sy, sw_, sh_)], "paint": "f",
             "sep": {"name": "BrandInk", "fn": sp_fn, "tint": tint}}
        )
        gt.append(
            {"contours": [[(sx, sy), (sx + sw_, sy), (sx + sw_, sy + sh_),
                           (sx, sy + sh_)]],
             "closed": [True], "paint": "fill",
             "gray": int(round(eval_shading_fn(sp_fn, tint) * 255.0)),
             "lw": 0.0}
        )
    if (k & 65) == 65:  # radial badge vignette (§8.7.4.3.4)
        # the seal/button gradient form: a Type 3 shading through a square
        # clip. Even k>>7 keeps the circles CONCENTRIC (r0=0, the common
        # vignette); odd k>>7 offsets the outer center and starts r0>0, so
        # the general quadratic root (not just the |p-c|/r shortcut) is
        # exercised in the parity loop. Geometry arithmetic in k only.
        rcx = x1 - 45.0
        rcy = 132.0 + 2.0 * ((k >> 5) & 3)
        rr1 = 18.0 + 6.0 * ((k >> 4) & 1)
        ecc = (k >> 7) & 1 == 1
        rc1 = (rcx + rr1 / 2.0, rcy) if ecc else (rcx, rcy)
        rr0 = rr1 / 4.0 if ecc else 0.0
        rc0g, rc1g = 0.2, 0.95
        rn = 2.0 if (k >> 3) & 1 else 1.0
        sq = (rcx - rr1, rcy - rr1, 2.0 * rr1, 2.0 * rr1)
        writer.append(
            {"path": [("re",) + sq], "paint": "shr",
             "coords": (rcx, rcy, rr0, rc1[0], rc1[1], rr1),
             "c0": rc0g, "c1": rc1g, "n": rn}
        )
        gt.append(
            {"contours": [[(sq[0], sq[1]), (sq[0] + sq[2], sq[1]),
                           (sq[0] + sq[2], sq[1] + sq[3]),
                           (sq[0], sq[1] + sq[3])]],
             "closed": [True], "paint": "shade3",
             "coords": ((rcx, rcy, rr0), (rc1[0], rc1[1], rr1)),
             "c0": rc0g, "c1": rc1g, "n": rn}
        )
    if k & 8:  # footer bezier squiggle
        p0 = (x0, 60.0)
        p1 = (x0 + 120.0, 90.0)
        p2 = (x0 + 240.0, 30.0)
        p3 = (x0 + 360.0, 60.0)
        writer.append(
            {"path": [("m",) + p0, ("c",) + p1 + p2 + p3], "paint": "S",
             "gray": 0.0, "lw": 1.5}
        )
        gt.append(
            {"contours": [[p0] + flatten_cubic(p0, p1, p2, p3)],
             "closed": [False], "paint": "stroke", "gray": 0, "lw": 1.5}
        )
    return writer, gt


def _link_annotation_gt(doc_id: str, idx: int):
    """(uri, rect) of the /Link annotation the incremental-update revision
    adds to page 1 — one formula shared by the generator and the
    link_annotations oracle."""
    yb = 640.0 - 4.0 * (idx % 4)
    return (
        f"https://example.org/{doc_id}/p1",
        (72.0, yb, 272.0, yb + 12.0),
    )


def _tile_decoration(idx: int, p: int):
    """Tiling-pattern background (§8.7.3) for eligible default-corpus
    pages -> (writer tile spec, parser-equivalent GT entries). Dot cells
    expand to per-tile fill rects, hatch cells to per-tile diagonal
    strokes — the GT mirrors the interpreter's expansion exactly (region
    and steps are dyadic 12pt-aligned, so every tile is whole). Flat
    pages only (pattern space = default user space; the rotated/offset
    slices skip the decoration)."""
    shape = "dot" if (idx + p) % 2 == 0 else "hatch"
    cs = 12.0
    rx = 72.0 + 12.0 * ((idx >> 1) % 4)
    ry = 48.0 + 12.0 * (p % 2)
    rw = 12.0 * (2 + (idx >> 2) % 3)
    rh = 12.0 * (1 + (idx >> 3) % 2)
    if shape == "dot":
        g = 0.25
        cell = {"w": cs, "h": cs, "gray": g, "shape": "dot",
                "rect": (3.0, 3.0, 6.0, 6.0)}
    else:
        g = 0.5
        cell = {"w": cs, "h": cs, "gray": g, "shape": "hatch", "lw": 1.0}
    writer = {
        "paint": "tile", "path": [("re", rx, ry, rw, rh)],
        "cell": cell, "xstep": cs, "ystep": cs,
    }
    gt: List[dict] = []
    gi = int(round(g * 255.0))
    for i in range(int(rw / cs)):
        for j in range(int(rh / cs)):
            dx, dy = rx + i * cs, ry + j * cs
            if shape == "dot":
                x0, y0 = dx + 3.0, dy + 3.0
                x1, y1 = x0 + 6.0, y0 + 6.0
                gt.append(
                    {"contours": [[(x0, y0), (x1, y0), (x1, y1),
                                   (x0, y1)]],
                     "closed": [True], "paint": "fill", "gray": gi,
                     "lw": 0.0}
                )
            else:
                gt.append(
                    {"contours": [[(dx, dy), (dx + cs, dy + cs)]],
                     "closed": [False], "paint": "stroke", "gray": gi,
                     "lw": 1.0}
                )
    return writer, gt


def _spacing_eligible(idx: int, img_codec=None, inline=None) -> bool:
    """Default-corpus docs carrying the TEXT-STATE line (§9.3.1: Tc/Tw/
    Tz/Ts) — idx%8==4 never collides with the structured/incremental/
    tagged/signed slices and is never rotated (idx%4==0)."""
    return img_codec is None and inline is None and idx % 8 == 4


def _spacing_line_overlay(idx: int, p: int, page: dict,
                          words_gt: list) -> None:
    """Append the justified/letter-spaced/condensed/superscript line real
    typesetters emit: four ops exercising Tw, Tc, Tz and Ts on one
    baseline. Ground-truth geometry mirrors the interpreter's §9.4.4
    displacement exactly — per-glyph (w0/1000*Tfs + Tc [+Tw on space])
    * Th, accumulated in the same float order — so golden spans stay
    bit-exact. Dyadic constants; derived from (idx, p) alone."""
    size = 10.0
    y = 92.0 + 0.25 * (p % 4)
    entries = [
        # (text, char_spacing, word_spacing, hscale, rise)
        ("justified words here", 0.0, 1.5 + 0.25 * (idx % 4), 1.0, 0.0),
        ("letterspaced", 0.25 + 0.125 * ((idx >> 3) % 2), 0.0, 1.0, 0.0),
        ("condensed text", 0.0, 0.0, 0.5, 0.0),
        ("super", 0.0, 0.0, 1.0, 2.5),
    ]
    x = MARGIN_X
    for text, csp, wsp, h, rise in entries:
        op = {"font": "F1", "size": size, "x": x, "y": y, "mode": "Tm",
              "segments": [text]}
        if csp:
            op["char_spacing"] = csp
        if wsp:
            op["word_spacing"] = wsp
        if h != 1.0:
            op["hscale_pct"] = h * 100.0
        if rise:
            op["rise"] = rise
        page["text_ops"].append(op)
        # mirror the interpreter's advance, char by char
        tx = 0.0
        word_start = 0.0
        cur = []
        plain = csp == 0.0 and wsp == 0.0 and h == 1.0
        for ch in text:
            if ch == " ":
                if cur:
                    bbox = kernels.norm_word_bbox(
                        x + word_start, y + rise, tx - word_start, size,
                        ASCENT_PM, DESCENT_PM, PAGE_W, PAGE_H,
                    )
                    words_gt.append(
                        {"text": "".join(cur), "x0": bbox[0],
                         "top": bbox[1], "x1": bbox[2],
                         "bottom": bbox[3]}
                    )
                    cur = []
                w0 = char_width_pm(ch) * size / 1000.0
                tx += w0 if plain else (w0 + csp + wsp) * h
                word_start = tx
            else:
                cur.append(ch)
                w0 = char_width_pm(ch) * size / 1000.0
                tx += w0 if plain else (w0 + csp) * h
        if cur:
            bbox = kernels.norm_word_bbox(
                x + word_start, y + rise, tx - word_start, size,
                ASCENT_PM, DESCENT_PM, PAGE_W, PAGE_H,
            )
            words_gt.append(
                {"text": "".join(cur), "x0": bbox[0], "top": bbox[1],
                 "x1": bbox[2], "bottom": bbox[3]}
            )
        x = _snap16(x + tx + size * 0.5)


def _ocg_watermark_on(idx: int) -> bool:
    """Default visibility of the Watermark layer for ocg-envelope doc
    ``idx`` — one formula shared by the generator, the write_pdf call and
    the ocg oracle (decoupled from the idx%2 xref rotation)."""
    return (idx >> 1) % 2 == 1


def _ocg_page_overlay(idx: int, p: int, page: dict, words_gt: list) -> None:
    """Mutate one generated page into the LAYERED (optional-content,
    §8.11) profile: an always-on 'Annotations' layer line near the page
    foot plus a 'DRAFT watermark' line mid-page on the 'Watermark' layer.
    Ground-truth words include the watermark ONLY when the default
    configuration shows it — a parser that ignores /OCProperties extracts
    phantom text on half the corpus and diverges. Positions/sizes are
    dyadic and derived from (idx, p) alone — no rng draws, so the base
    page's golden geometry is unchanged."""
    wm_on = _ocg_watermark_on(idx)
    entries = [
        # (layer, font size, y, words)
        (0, 10.0, 76.0, ["review", "note", f"p{p + 1}"]),
        (1, 24.0, 395.0 + 0.25 * (idx % 8), ["DRAFT", "watermark"]),
    ]
    for layer, size, y, tokens in entries:
        x = MARGIN_X + 0.25 * ((idx + p) % 16)
        for word in tokens:
            width = advance_width([word], size)
            page["text_ops"].append(
                {"font": "F1", "size": size, "x": x, "y": y,
                 "mode": "Tm", "segments": [word], "oc": layer}
            )
            if layer == 0 or wm_on:
                bbox = kernels.norm_word_bbox(
                    x, y, width, size, ASCENT_PM, DESCENT_PM,
                    PAGE_W, PAGE_H,
                )
                words_gt.append(
                    {"text": word, "x0": bbox[0], "top": bbox[1],
                     "x1": bbox[2], "bottom": bbox[3]}
                )
            x = _snap16(x + width + size * 0.375)


def _signature_gt(doc_id: str, idx: int):
    """(signer, sign_time) of the approval signature the signed revision
    carries — one formula shared by the generator and the
    signature_fields oracle."""
    signer = f"Reviewer {chr(ord('A') + idx % 7)}. {doc_id[-4:]}"
    t = (
        f"2026{idx % 12 + 1:02d}{idx % 28 + 1:02d}"
        f"{idx % 24:02d}{(idx * 7) % 60:02d}{(idx * 13) % 60:02d}Z"
    )
    return signer, t


def _doc_structure_gt(doc_id: str, idx: int, n_pages: int) -> dict:
    """Deterministic document-STRUCTURE ground truth — the navigation /
    interchange layer real producers attach around the page content:
    /Info metadata + XMP, a nested /Outlines (bookmark) tree, AcroForm
    form fields with filled values, and /EmbeddedFiles attachments.
    One formula shared by the writer input (gen_doc) and the VALUES
    oracles of document_metadata / outline_entries / form_field_values /
    embedded_attachments, so parity proves the full author → serialize →
    parse → walk loop. Arithmetic in ``idx`` only (no rng draws): page
    content and golden spans are structure-invariant by construction."""
    yy, mm, dd = 2019 + idx % 6, 1 + (idx * 7) % 12, 1 + (idx * 11) % 28
    info = {
        "author": f"Author {idx % 7}",
        "subject": f"Subject {(idx * 3) % 5}",
        "producer": "docprompt-spark",
        "creation": f"D:{yy:04d}{mm:02d}{dd:02d}090000Z",
    }
    # bookmark tree: one section per page (max 3), page-1 section carries
    # two subsections — exercises /First/:/Next sibling chains AND nesting
    yb = 720.0 - 2.0 * (idx % 5)
    outlines = []
    for p in range(min(n_pages, 3)):
        item = {"title": f"Section {p + 1}", "page": p, "y": yb - 8.0 * p,
                "kids": []}
        if p == 0:
            item["kids"] = [
                {"title": f"Section 1.{k + 1}", "page": 0,
                 "y": yb - 100.0 - 50.0 * k, "kids": []}
                for k in range(2)
            ]
        outlines.append(item)
    # form fields: a hierarchical text field (dotted name — /Kids walk),
    # a checkbox, and (on a third of docs) a choice field on page 2
    fields = [
        {"name": "applicant.name", "ftype": "Tx",
         "value": f"Case {idx:04d}", "page": 0,
         "rect": (72.0, 40.0, 272.0, 54.0)},
        {"name": "approved", "ftype": "Btn",
         "value": "Yes" if idx % 2 == 0 else "Off", "page": 0,
         "rect": (300.0, 40.0, 312.0, 52.0)},
    ]
    if idx % 3 == 0:
        fields.append(
            {"name": "category", "ftype": "Ch",
             "value": ("alpha", "beta", "gamma")[(idx * 5) % 3],
             "page": min(1, n_pages - 1),
             "rect": (72.0, 24.0, 200.0, 38.0),
             "opts": ("alpha", "beta", "gamma")}
        )
    # attachments: text note always, a CSV on every other doc; payloads
    # deterministic so the oracle can md5 them (proving stream decode)
    attachments = [
        {"name": f"notes-{idx % 5}.txt", "mime": "text/plain",
         "data": (f"attachment {doc_id} note " + "payload " * (1 + idx % 3)
                  ).encode()},
    ]
    if idx % 2 == 1:
        attachments.append(
            {"name": f"data-{idx % 3}.csv", "mime": "text/csv",
             "data": ("k,v\n" + "".join(
                 f"r{r},{(idx * (r + 3)) % 97}\n" for r in range(4 + idx % 4)
             )).encode()}
        )
    # page labels (§12.4.2): single-page docs get one decimal range with a
    # non-default start; multi-page docs get lowercase-roman front matter
    # at page 0 plus a styled, prefixed range from page 1 — the chaptered
    # form. Expected label strings computed here with an independent
    # formatter (greedy-subtraction roman / base-26 letters) so the oracle
    # does not reuse the parser's converter.
    def _lbl(style: str, n: int) -> str:
        if style == "D":
            return str(n)
        if style in ("R", "r"):
            out, left = [], n
            for v, sym in ((1000, "M"), (900, "CM"), (500, "D"),
                           (400, "CD"), (100, "C"), (90, "XC"), (50, "L"),
                           (40, "XL"), (10, "X"), (9, "IX"), (5, "V"),
                           (4, "IV"), (1, "I")):
                while left >= v:
                    out.append(sym)
                    left -= v
            s = "".join(out)
            return s if style == "R" else s.lower()
        ch = chr(ord("A") + (n - 1) % 26)
        s = ch * ((n - 1) // 26 + 1)
        return s if style == "A" else s.lower()

    if n_pages == 1:
        pl_ranges = [(0, {"style": "D", "st": idx % 3 + 2})]
        pl_labels = [_lbl("D", idx % 3 + 2)]
    else:
        ch_style = ("D", "A", "a", "R")[idx % 4]
        ch_st = idx % 5 + 1
        pfx = f"C{idx % 4}-"
        pl_ranges = [
            (0, {"style": "r", "st": 1}),
            (1, {"style": ch_style, "prefix": pfx, "st": ch_st}),
        ]
        pl_labels = [_lbl("r", 1)] + [
            pfx + _lbl(ch_style, ch_st + (p - 1))
            for p in range(1, n_pages)
        ]
    return {"info": info, "outlines": outlines, "fields": fields,
            "attachments": sorted(attachments, key=lambda a: a["name"]),
            "xmp": True,
            "page_labels": pl_ranges, "page_label_strings": pl_labels}


def _tagged_structure_gt(idx: int, seed: int) -> Tuple[str, List[tuple]]:
    """Ground-truth logical structure of a tagged doc: (ord, level, tag,
    page_number, text) rows in DFS order — the writer assigns one MCID per
    text op (1:1 with golden words) and one /StructElem per y-run line
    (pdfwrite._mcid_line_groups), so element text is the space-join of
    that line's golden words. Shared by the tagged_reading_order oracle."""
    from docprompt_spark.pdfwrite import _mcid_line_groups

    # spacing=False: tagged docs never carry the text-state line (the
    # "tagged" envelope forces it off and the default tagged slice
    # idx%8==6 is disjoint from the spacing slice idx%8==4) — without
    # the explicit flag this GT would add phantom lines on idx%8==4
    doc_id, pages = _gen_doc_pages(idx, seed, 0, spacing=False)
    rows: List[tuple] = [(0, 0, "Document", 0, "")]
    for p, (page, words_gt, _img) in enumerate(pages):
        for gi, group in enumerate(_mcid_line_groups(page["text_ops"])):
            tag = "H1" if p == 0 and gi == 0 else "P"
            text = " ".join(words_gt[m]["text"] for m in group)
            rows.append((len(rows), 1, tag, p + 1, text))
    return doc_id, rows


def _damage(pdf: bytes, mode: int) -> bytes:
    """Deterministic real-world file corruption (envelope="damaged") —
    the salvage cases pdfium's RebuildCrossRef handles for the reference:

    0: startxref points past EOF (the classic truncated-then-appended doc)
    1: the xref table keyword is mangled (bit rot in the index)
    2: everything from the LAST ``trailer`` on is cut (no trailer, no
       startxref — /Root must be recovered by scanning for the catalog)
    3: startxref digits replaced on an xref-stream file (the XRef stream's
       own dict must be rediscovered as the trailer, and ObjStm members
       re-registered from the scan)

    Object bodies are untouched, so golden spans are damage-invariant."""
    mode %= 4
    if mode in (0, 3):
        m = None
        for m in re.finditer(rb"startxref\s+(\d+)", pdf):
            pass
        assert m is not None
        bogus = str(len(pdf) + 4242).encode()
        return pdf[: m.start(1)] + bogus + pdf[m.end(1):]
    if mode == 1:
        i = pdf.rfind(b"\nxref")
        assert i >= 0
        return pdf[: i + 1] + b"xrQf" + pdf[i + 5:]
    i = pdf.rfind(b"trailer")
    assert i >= 0
    return pdf[:i]


def _wrap(pdf: bytes, variant: int) -> bytes:
    """Byte envelopes exercised by the sniffing path (S5)."""
    if variant == 1:
        return base64.b64encode(pdf)
    if variant == 2:
        return gzip.compress(pdf, 5, mtime=0)
    if variant == 3:
        return base64.b64encode(gzip.compress(pdf, 5, mtime=0))
    return pdf


def _tiles_eligible(idx: int, img_codec=None, inline=None) -> bool:
    """Default-rotation docs that carry the tiling-pattern background
    (§8.7.3): flat pages only — the rotated (idx%4==3), offset (idx%5==2)
    and cropped (idx%5==4) slices skip it (pattern space is the page's
    default user space), and forced-codec/inline corpora model non-default
    envelopes. One formula for gen_doc AND the golden regenerators."""
    return (
        img_codec is None
        and inline is None
        and idx % 4 == 1
        and idx % 5 not in (2, 4)
    )


def _gen_doc_pages(
    idx: int, seed: int, skew_every: int, img_codec: str = None,
    inline: Optional[bool] = None, tiles: Optional[bool] = None,
    spacing: Optional[bool] = None, f2: Optional[bool] = None,
):
    """Deterministic page set for document ``idx``: (doc_id, [(writer_page,
    words_gt, images_gt), ...]). Single source of truth for the rng replay —
    gen_doc and golden_page_layouts both consume it. ``tiles`` adds the
    tiling-pattern background after the rng replay (no extra draws);
    None = the default-corpus eligibility formula. ``f2`` overrides the
    default idx%3 Type0-font eligibility (the "cidfont" envelope forces it
    so every doc can draw CID text)."""
    rng = random.Random(f"doc:{seed}:{idx}")
    doc_id = f"doc-{seed}-{idx:08d}"
    if skew_every and idx > 0 and idx % skew_every == 0:
        n_pages = rng.randint(24, 64)  # skew tail
    else:
        n_pages = rng.randint(1, 3)
    use_f2 = (idx % 3 == 0) if f2 is None else f2
    pages = [
        _gen_page(rng, use_f2, seed, img_codec, inline) for _ in range(n_pages)
    ]
    if tiles is None:
        tiles = _tiles_eligible(idx, img_codec, inline)
    if tiles:
        for p, (page, _w, _im) in enumerate(pages):
            tw, tgt = _tile_decoration(idx, p)
            page["vectors"] = list(page.get("vectors") or []) + [tw]
            page["vectors_gt"] = list(page.get("vectors_gt") or []) + tgt
    if spacing is None:
        spacing = _spacing_eligible(idx, img_codec, inline)
    if spacing:
        for p, (page, words_gt, _im) in enumerate(pages):
            _spacing_line_overlay(idx, p, page, words_gt)
    return doc_id, pages


def writer_entry_codec(w: dict) -> str:
    """The codec tag the media pipeline will assign to a writer image
    entry — computed by running the REAL classifier over the equivalent
    XObject dict (oracle side of codec-sensitive queries)."""
    from docprompt_spark.multimodal import _codec_of

    d: dict = {"Width": w["width"], "Height": w["height"]}
    if w.get("imagemask"):
        d["ImageMask"] = True
        d["BitsPerComponent"] = 1
    else:
        if w.get("palette") is not None:
            d["ColorSpace"] = ["Indexed", "DeviceRGB", 255, w["palette"]]
        else:
            d["ColorSpace"] = w.get("colorspace", "DeviceGray")
        d["BitsPerComponent"] = w.get("bpc", 8)
    if w.get("decode"):
        d["Decode"] = [1, 0]
    if w.get("smask"):
        d["SMask"] = True  # classifier only checks presence
    if w.get("filter"):
        d["Filter"] = w["filter"]
    if w.get("decode_parms"):
        if "Predictor" in w["decode_parms"]:
            ncomp = {"DeviceRGB": 3, "DeviceCMYK": 4}.get(
                w.get("colorspace", ""), 1
            )
            d["DecodeParms"] = {
                "Predictor": 15, "Columns": w["width"], "Colors": ncomp,
            }
        else:
            # CCITT G4 parms with matching geometry
            d["DecodeParms"] = {
                "K": -1, "Columns": w["width"], "Rows": w["height"],
                "BlackIs1": True,
            }
    return _codec_of(d, lambda x: x, w["data"])


def golden_page_layouts(
    n_docs: int, seed: int = 42, skew_every: int = 47, img_codec: str = None,
    with_vectors: bool = False,
):
    """Golden per-page layout dicts (kernels.build_page_layout over the
    generator's ground-truth words) plus ground-truth images — the oracle
    source for the TextBlock hierarchy and media tables. Yields
    (doc_id, page_number, layout, images_gt) where images_gt rows are
    {media_ref, bbox} (+ the generator's raw byte length via n_bytes)."""
    for idx in range(n_docs):
        doc_id, pages = _gen_doc_pages(idx, seed, skew_every, img_codec)
        for p, (page_w, words_gt, images_gt) in enumerate(pages):
            gt = [dict(im) for im in images_gt]
            for im, w in zip(gt, page_w["images"]):
                im["n_bytes"] = len(w["data"])
                im["payload"] = w["data"]
                im["samples"] = w["samples"]
                im["px_w"] = w["width"]
                im["px_h"] = w["height"]
                im["codec"] = writer_entry_codec(w)
            if with_vectors:
                yield (
                    doc_id, p + 1, kernels.build_page_layout(words_gt), gt,
                    page_w["vectors_gt"],
                )
            else:
                yield doc_id, p + 1, kernels.build_page_layout(words_gt), gt


def _scanned_page_overlay(idx: int, p: int, page: dict, images_gt: list) -> None:
    """Mutate one generated page into the SCANNED profile: a full-page scan
    image underneath everything plus an invisible (Tr 3) text layer — the
    form OCR post-processors emit and the single most common real-world
    scanned-PDF shape. Even docs carry a CCITT G4 bilevel scan, odd docs a
    grayscale DCT scan; pixels are a deterministic function of (idx, page)
    so the ground truth needs no extra rng draws."""
    import numpy as _np

    px_w, px_h = 64, 80
    samples = bytes(
        (idx * 31 + p * 17 + 7 * x_ + 13 * y_) % 256
        for y_ in range(px_h)
        for x_ in range(px_w)
    )
    parms = None
    bpc = 8
    if idx % 2 == 0:
        from docprompt_spark import ccitt as _ccitt

        arr = _np.frombuffer(samples, dtype=_np.uint8).reshape(px_h, px_w)
        data = _ccitt.encode_gray8(arr)
        filt = "CCITTFaxDecode"
        samples_gt = _ccitt.decode_to_gray8(data, px_w, px_h).tobytes()
        parms = f"<< /K -1 /Columns {px_w} /Rows {px_h} /BlackIs1 true >>"
        bpc = 1
    else:
        from docprompt_spark import jpeg as _jpeg

        arr = _np.frombuffer(samples, dtype=_np.uint8).reshape(px_h, px_w)
        data = _jpeg.encode(arr, quality=90)
        filt = "DCTDecode"
        samples_gt = _jpeg.decode(data).tobytes()
    page["images"].insert(0, {
        "data": data, "filter": filt, "samples": samples_gt,
        "width": px_w, "height": px_h, "bpc": bpc,
        "decode_parms": parms, "colorspace": "DeviceGray",
        "decode": None, "imagemask": False,
        "x": 0.0, "y": 0.0, "w": PAGE_W, "h": PAGE_H,
        "inline": False,
    })
    images_gt.insert(0, {
        "media_ref": hashlib.md5(data).hexdigest(),
        "bbox": kernels.norm_rect_bbox(0.0, 0.0, PAGE_W, PAGE_H, PAGE_W, PAGE_H),
        "stencil": False,
    })
    page["text_invisible"] = True


def gen_doc(
    idx: int, seed: int = 42, skew_every: int = 47, envelope: str = None
) -> dict:
    """One deterministic document: pdf bytes + golden span sequence."""
    doc_id, gen_pages = _gen_doc_pages(
        idx, seed, skew_every,
        img_codec="ccitt" if envelope == "ccitt" else None,
        inline=True if envelope == "inline" else None,
        tiles=_tiles_eligible(idx) if envelope is None else False,
        spacing=_spacing_eligible(idx) if envelope is None else False,
        f2=True if envelope == "cidfont" else None,
    )
    n_pages = len(gen_pages)
    if envelope == "scanned":
        for p, (page, _w, images_gt) in enumerate(gen_pages):
            _scanned_page_overlay(idx, p, page, images_gt)
    if envelope == "ocg":
        for p, (page, words_gt, _im) in enumerate(gen_pages):
            _ocg_page_overlay(idx, p, page, words_gt)

    pages_w: List[dict] = []
    page_results: List[dict] = []
    for p, (page, words_gt, images_gt) in enumerate(gen_pages):
        pages_w.append(page)
        layout = kernels.build_page_layout(words_gt)
        spans = kernels.assemble_page_spans(layout, images_gt)
        page_results.append(
            {"page_number": p + 1, "page_text": layout["page_text"], "spans": spans}
        )

    # envelope rotation: stream compression (idx%4: Flate / raw / LZW / raw),
    # byte wrapping (idx%4), and PDF 1.5+ xref-stream/ObjStm layout
    # (idx%5==1) so every extraction query exercises both cross-reference
    # formats and all three content-stream filters
    enc_mode = None
    # page /Rotate (§7.7.3.3): a quarter of the default corpus is stored
    # sideways/upside-down with the upright-correction /Rotate on the
    # page-tree root — the form scanner output takes. Derived from idx
    # alone (no rng draws), so golden text/geometry is unchanged; spans
    # and rasters are rotation-invariant by construction (the writer's
    # canceling Tm/cm compose with the parser's viewing CTM back to the
    # identical float expressions). envelope="rotated" forces it on every
    # doc, cycling all three angles.
    if envelope == "rotated":
        rot = (90, 180, 270)[idx % 3]
    elif envelope == "damaged":
        rot = 0
    elif envelope is None:
        rot = (90, 180, 270)[(idx >> 2) % 3] if idx % 4 == 3 else 0
    else:
        rot = 0
    # non-zero MediaBox origin (cropped/offset scans, §7.7.3.3 MediaBox):
    # a fifth of the default corpus and half the "rotated" envelope store
    # the page box offset from (0,0) — composed WITH rotation on the
    # rotated envelope. Dyadic offsets, idx-derived (no rng draws), so
    # goldens are origin-invariant bit-exactly.
    if envelope == "rotated":
        orig = (16.0 * (1 + (idx >> 1) % 3), 8.5 * ((idx >> 2) % 3)) if idx % 2 == 0 else (0.0, 0.0)
    elif envelope is None and idx % 5 == 2:
        orig = (16.0 * (1 + (idx >> 1) % 3), 8.5 * ((idx >> 3) % 3))
    else:
        orig = (0.0, 0.0)
    # /CropBox bleed (§14.11.2): another fifth of the default corpus keeps
    # press-sheet margins in the MediaBox with /CropBox marking the
    # visible region — the form imposition/scan tools write. Dyadic,
    # idx-derived; goldens are crop-invariant bit-exactly (the flagship
    # span oracle covers this slice). Composes with /Rotate (idx%4 slice
    # overlap) and the origin machinery.
    bleed = None
    if envelope is None and idx % 5 == 4:
        bleed = (
            18.0 + 2.0 * ((idx >> 1) % 3),
            12.5 * ((idx >> 2) % 2),
            24.0 * ((idx >> 3) % 2),
            9.0 + 0.5 * ((idx >> 4) % 2),
        )
    if envelope is None:
        use_xref_stream = idx % 5 == 1
        comp = ["flate", False, "lzw", "a85"][idx % 4]
    else:
        use_xref_stream = envelope == "xrefstream" or (
            envelope == "rotated" and idx % 2 == 1
        ) or (envelope == "damaged" and idx % 4 == 3)
        comp = "lzw" if envelope == "lzw" else (
            (envelope == "xrefstream" or envelope == "rotated") and idx % 2 == 0
        )
        if envelope == "encrypted":
            # Standard security handler, all three modes rotated (classic
            # xref envelope; kept out of the default rotation so the bench
            # corpus measures parse throughput, not pure-python AES)
            enc_mode = ["aes-128", "rc4-128", "rc4-40"][idx % 3]
        elif envelope == "encrypted-r6":
            # PDF 2.0 AES-256 /R6, alternating classic and xref-stream/
            # ObjStm envelopes — the modern encrypted-document profile
            enc_mode = "aes-256"
            use_xref_stream = idx % 2 == 0
        elif envelope == "structured":
            # document-structure oracle corpus: rotate both xref envelopes,
            # all three content filters, and AES-128 on a quarter (classic
            # envelope — idx%4==2 is even, so never combined with the
            # ObjStm envelope here; the string-encryption rules differ)
            use_xref_stream = idx % 2 == 1
            comp = ["flate", False, "lzw"][idx % 3]
            enc_mode = "aes-128" if idx % 4 == 2 else None
        elif envelope == "tagged":
            use_xref_stream = idx % 2 == 1
            comp = ["flate", False, "lzw"][idx % 3]
        elif envelope == "cidfont":
            # CID-keyed-program oracle corpus: every doc gets the
            # CIDFontType0C descendant (f2 forced in _gen_doc_pages);
            # both xref envelopes + all three content filters rotate
            use_xref_stream = idx % 2 == 1
            comp = ["flate", False, "lzw"][idx % 3]
        elif envelope == "ocg":
            # optional-content oracle corpus: both xref envelopes, all
            # three content filters; the Watermark layer's default
            # visibility toggles on (idx>>1)%2 (decoupled from the xref
            # rotation so every combination occurs)
            use_xref_stream = idx % 2 == 1
            comp = ["flate", False, "lzw"][idx % 3]
        elif envelope == "signed":
            # signature oracle corpus: classic xref only (the append
            # machinery's constraint, like "incremental"), all three
            # content filters rotated; unencrypted (appended revision
            # strings are written plaintext)
            comp = ["flate", False, "lzw"][idx % 3]
    # document-structure layer (§12.3.3/§12.7/§7.11.4 + /Info + XMP):
    # every "structured"-envelope doc and an eighth of the default corpus
    # carry outlines, filled form fields, attachments and metadata —
    # structure never touches content streams, so golden spans/rasters
    # are structure-invariant by construction
    structure = None
    if envelope == "structured" or (envelope is None and idx % 8 == 2):
        structure = _doc_structure_gt(doc_id, idx, n_pages)
    # tagged PDF (§14.8): the "tagged" envelope and an eighth of the
    # default corpus mark every show op with an /MCID and carry the
    # logical structure tree; BDC/EMC don't move the pen, so golden spans
    # are tag-invariant. (Tagged composes with everything except the Form
    # XObject split — elements would need /Stm indirection — so the
    # default slice skips idx%3==1 form docs.)
    tagged = envelope == "tagged" or (
        envelope is None and idx % 8 == 6 and idx % 3 != 1
    )
    pdf = write_pdf(
        pages_w,
        doc_title=doc_id,
        compress_streams=comp,
        xref_stream=use_xref_stream,
        encrypt=enc_mode,
        # the corpus rotates ALL FOUR embedded font formats — CFF
        # /FontFile3, original Type1 /FontFile (eexec), TrueType (glyf)
        # /FontFile2, and Type3 /CharProcs (glyphs authored as content
        # streams) — all carrying identical 1000-upm outlines, so rasters
        # are format-independent while the parse path proves all four loops
        font_format=("cff", "type1", "truetype", "type3")[idx % 4],
        # half the F2 (Type0) docs carry a REAL CID-keyed CFF program
        # (CIDFontType0C descendant, 1-based CIDs), the other half stay
        # metrics-only CIDFontType2 — both real-world forms in rotation;
        # golden spans/rasters are form-invariant by construction. The
        # "cidfont" envelope forces the program on every doc.
        cid_font_program=(
            envelope == "cidfont" or (envelope is None and idx % 6 == 0)
        ),
        # an embedded /Encoding CMap stream (§9.7.5.3, codes = CID+0x100)
        # replaces /Identity-H on half of each CID slice — geometry only
        # survives if the reader walks the cidrange/cidchar sections
        cid_encoding_cmap=(
            (envelope == "cidfont" and idx % 2 == 0)
            or (envelope is None and idx % 12 == 0)
        ),
        # a third of the corpus routes vector art + the header line through
        # a Form XObject (/Fm0 Do, §8.10) — the letterhead/stamp pattern
        # real producers emit; golden spans are envelope-invariant so the
        # extraction oracles prove the form interpretation path
        form_xobject=idx % 3 == 1 and not tagged,
        rotate=rot,
        media_origin=orig,
        crop_bleed=bleed,
        structure=structure,
        tagged=tagged,
        ocgs=(
            [
                {"name": "Annotations", "on": True},
                {"name": "Watermark", "on": _ocg_watermark_on(idx)},
            ]
            if envelope == "ocg"
            else None
        ),
    )
    if envelope == "incremental" or (
        envelope is None
        and idx % 8 == 5
        and not use_xref_stream
        and enc_mode is None
    ):
        # incremental update (§7.5.6): an appended revision REDEFINES the
        # first page object to add a /Link annotation — two xref sections
        # chained by /Prev, newest-wins object resolution load-bearing.
        # Golden text spans are update-invariant by construction.
        from docprompt_spark.pdfwrite import append_incremental_link

        uri, rect = _link_annotation_gt(doc_id, idx)
        pdf = append_incremental_link(pdf, uri, rect)
    if envelope == "signed" or (
        envelope is None
        and idx % 8 == 7
        and not use_xref_stream
        and enc_mode is None
    ):
        # digital signature (§12.8): an appended approval-signature
        # revision (sig dict + /FT /Sig widget + redefined page/catalog
        # with /AcroForm) whose /ByteRange covers the whole file except
        # the /Contents hex. idx%8==7 never collides with the structured
        # (%8==2) or incremental (%8==5) slices, so the base catalog has
        # no AcroForm. Golden spans are signature-invariant.
        from docprompt_spark.pdfwrite import append_signature

        signer, sign_time = _signature_gt(doc_id, idx)
        pdf = append_signature(pdf, signer, sign_time)
    if envelope == "damaged":
        pdf = _damage(pdf, idx)
    wrapped = _wrap(pdf, idx % 4)
    golden = kernels.assemble_doc_spans(page_results)
    return {
        "doc_id": doc_id,
        "pdf": wrapped,
        "n_pages": n_pages,
        "spans": golden,
    }


def gen_corpus(
    n_docs: int, seed: int = 42, skew_every: int = 47, envelope: str = None
) -> List[dict]:
    return [
        gen_doc(i, seed=seed, skew_every=skew_every, envelope=envelope)
        for i in range(n_docs)
    ]


# ---------------------------------------------------------------------------
# Parquet materialization (for bench / large corpora; plain pyarrow, no Spark)
# ---------------------------------------------------------------------------

def corpus_arrow_schema():
    import pyarrow as pa

    span_t = pa.struct(
        [
            ("kind", pa.string()),
            ("text", pa.string()),
            ("media_ref", pa.string()),
            ("offset", pa.int32()),
        ]
    )
    return pa.schema(
        [
            ("doc_id", pa.string()),
            ("pdf", pa.binary()),
            ("n_pages", pa.int32()),
            ("spans", pa.list_(span_t)),
        ]
    )


def write_corpus_parquet(
    path: str,
    n_docs: int,
    seed: int = 42,
    skew_every: int = 47,
    rows_per_file: int = 2000,
) -> None:
    """Materialize the corpus as a parquet directory (multiple row groups so
    Spark gets parallel input splits)."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import os

    os.makedirs(path, exist_ok=True)
    schema = corpus_arrow_schema()
    part = 0
    for start in range(0, n_docs, rows_per_file):
        docs = [gen_doc(i, seed=seed, skew_every=skew_every) for i in range(start, min(start + rows_per_file, n_docs))]
        table = pa.Table.from_pylist(
            [
                {
                    "doc_id": d["doc_id"],
                    "pdf": d["pdf"],
                    "n_pages": d["n_pages"],
                    "spans": d["spans"],
                }
                for d in docs
            ],
            schema=schema,
        )
        pq.write_table(table, os.path.join(path, f"part-{part:05d}.parquet"))
        part += 1
