"""Built-in metrics for the standard 14 fonts (PDF 32000 §9.6.2.2).

A huge share of real-world PDFs — especially pre-2008 output — reference
/Helvetica, /Times-Roman or /Courier WITHOUT embedding a font program or
/Widths array: conforming readers must know the metrics. The width
tables below are the published Adobe AFM metrics (public: the Core 14
AFM files Adobe distributes with every PostScript/PDF SDK; pdfium,
pdfminer and Ghostscript all carry the same numbers) for the Latin
printable range 32-126 under StandardEncoding, in 1000-upm glyph units.

Courier and its three style variants are exact by construction (every
glyph is 600). Helvetica and Times-Roman carry their full AFM tables.
Bold/Oblique/Italic style variants of Helvetica and Times fall back to
their base table — an explicit, documented approximation (the same
family-substitution posture pdfium takes for unembedded fonts it cannot
map); documents needing exact bold metrics should embed, which is what
every modern producer does.

Reference parity: docprompt reads these documents through pdfium, which
ships the Foxit/Adobe base-14 metrics.
"""

from __future__ import annotations

from typing import Dict, Optional

# Helvetica AFM widths, chars 32..126 (space ! " # ... ~)
_HELVETICA = [
    278, 278, 355, 556, 556, 889, 667, 191, 333, 333, 389, 584, 278, 333,
    278, 278, 556, 556, 556, 556, 556, 556, 556, 556, 556, 556, 278, 278,
    584, 584, 584, 556, 1015, 667, 667, 722, 722, 667, 611, 778, 722, 278,
    500, 667, 556, 833, 722, 778, 667, 778, 722, 667, 611, 722, 667, 944,
    667, 667, 611, 278, 278, 278, 469, 556, 333, 556, 556, 500, 556, 556,
    278, 556, 556, 222, 222, 500, 222, 833, 556, 556, 556, 556, 333, 500,
    278, 556, 500, 722, 500, 500, 500, 334, 260, 334, 584,
]

# Times-Roman AFM widths, chars 32..126
_TIMES_ROMAN = [
    250, 333, 408, 500, 500, 833, 778, 333, 333, 333, 500, 564, 250, 333,
    250, 278, 500, 500, 500, 500, 500, 500, 500, 500, 500, 500, 278, 278,
    564, 564, 564, 444, 921, 722, 667, 667, 722, 611, 556, 722, 722, 333,
    389, 722, 611, 889, 722, 722, 556, 722, 667, 556, 611, 722, 722, 944,
    722, 722, 611, 333, 278, 333, 469, 500, 333, 444, 500, 444, 500, 444,
    333, 500, 500, 278, 278, 500, 278, 778, 500, 500, 500, 500, 333, 389,
    278, 500, 500, 722, 500, 500, 444, 480, 200, 480, 541,
]

_FAMILIES: Dict[str, tuple] = {
    # name -> (width list | fixed pitch, ascent, descent)
    "Helvetica": (_HELVETICA, 718, -207),
    "Times-Roman": (_TIMES_ROMAN, 683, -217),
    "Courier": (600, 629, -157),
}

# style variants mapping onto their base family (Courier styles are
# EXACT — fixed pitch; Helvetica/Times styles are the documented
# family-substitution approximation)
_ALIASES = {
    "Helvetica-Bold": "Helvetica",
    "Helvetica-Oblique": "Helvetica",
    "Helvetica-BoldOblique": "Helvetica",
    "Times-Bold": "Times-Roman",
    "Times-Italic": "Times-Roman",
    "Times-BoldItalic": "Times-Roman",
    "Courier-Bold": "Courier",
    "Courier-Oblique": "Courier",
    "Courier-BoldOblique": "Courier",
    # common non-canonical spellings real producers emit
    "Arial": "Helvetica",
    "TimesNewRoman": "Times-Roman",
    "CourierNew": "Courier",
}


def _canonical(base_font: str) -> Optional[str]:
    name = base_font.split("+")[-1]  # strip ABCDEF+ subset prefixes
    if name in _FAMILIES:
        return name
    return _ALIASES.get(name)


def metrics_for(base_font: str) -> Optional[dict]:
    """``{"widths": {code: w}, "ascent": a, "descent": d}`` for a
    standard-14 /BaseFont name (subset prefixes stripped, style variants
    mapped), else None."""
    fam = _canonical(str(base_font))
    if fam is None:
        return None
    table, asc, desc = _FAMILIES[fam]
    if isinstance(table, int):  # fixed-pitch Courier family
        widths = {c: float(table) for c in range(32, 127)}
    else:
        widths = {32 + i: float(w) for i, w in enumerate(table)}
    return {"widths": widths, "ascent": asc, "descent": desc}
