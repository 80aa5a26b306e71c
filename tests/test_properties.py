"""Property-based tests (hypothesis) for the pure kernels and codecs."""

import datetime

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from docprompt_spark import kernels

BBOX = st.tuples(
    st.floats(0, 1, width=32), st.floats(0, 1, width=32),
    st.floats(0, 1, width=32), st.floats(0, 1, width=32),
).map(lambda t: (min(t[0], t[2]), min(t[1], t[3]), max(t[0], t[2]), max(t[1], t[3])))


@given(BBOX, BBOX)
def test_bbox_intersection_commutes_and_contained(a, b):
    ab, ba = kernels.bbox_intersection(a, b), kernels.bbox_intersection(b, a)
    assert ab == ba
    if ab is not None:
        assert kernels.bbox_contains(a, ab) and kernels.bbox_contains(b, ab)


@given(BBOX, BBOX)
def test_bbox_union_contains_both(a, b):
    u = kernels.bbox_union(a, b)
    assert kernels.bbox_contains(u, a) and kernels.bbox_contains(u, b)


@given(BBOX, BBOX)
def test_iou_bounds_and_symmetry(a, b):
    from hypothesis import assume

    # both-degenerate (zero-area) pairs divide 0/0 — faithfully mirroring
    # the reference's bbox IoU (layout.py:99-111), which has the same hole
    assume(kernels.bbox_area(a) > 0 or kernels.bbox_area(b) > 0)
    iab, iba = kernels.bbox_iou(a, b), kernels.bbox_iou(b, a)
    assert iab == iba
    assert -1e-9 <= iab <= 1.0 + 1e-9


@given(st.text(max_size=24), st.text(max_size=24))
def test_fuzz_ratio_symmetric_bounded(a, b):
    r = kernels.fuzz_ratio(a, b)
    assert r == kernels.fuzz_ratio(b, a)
    assert 0.0 <= r <= 100.0
    assert kernels.fuzz_ratio(a, a) == 100.0


@settings(max_examples=30, deadline=None)
@given(
    st.integers(2, 40), st.integers(2, 40),
    st.integers(0, 4), st.integers(0, 2**32 - 1),
)
def test_png_roundtrip_random(h, w, filter_type, seed):
    from docprompt_spark import png

    arr = np.random.RandomState(seed).randint(0, 256, (h, w), dtype=np.uint8)
    assert (png.decode(png.encode(arr, filter_type)) == arr).all()


@settings(max_examples=15, deadline=None)
@given(st.integers(2, 40), st.integers(2, 40), st.integers(0, 2**32 - 1))
def test_jpeg_decode_total_on_own_encodes(h, w, seed):
    from docprompt_spark import jpeg

    arr = np.random.RandomState(seed).randint(0, 256, (h, w), dtype=np.uint8)
    dec = jpeg.decode(jpeg.encode(arr, 85))
    assert dec.shape == (h, w)
    assert dec.dtype == np.uint8


@settings(max_examples=25, deadline=None)
@given(st.integers(1, 4000), st.integers(0, 2**31 - 1))
def test_wav_roundtrip_random(n, seed):
    from docprompt_spark import wav

    rng = np.random.RandomState(seed)
    samples = (rng.randn(n) * 10000).clip(-32768, 32767).astype(np.int16)
    dec, rate = wav.decode(wav.encode(samples, 8000))
    assert rate == 8000 and len(dec) == n
    assert np.allclose(dec * 32768.0, samples)


# --- date extraction: random dates/formats vs the reference implementation ---

REF_MOD = "/root/reference/docprompt/utils/date_extraction.py"


def _ref():
    import importlib.util

    spec = importlib.util.spec_from_file_location("ref_dates_prop", REF_MOD)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


_FMTS = [
    "%Y-%m-%d", "%y-%m-%d", "%m-%d-%Y", "%m-%d-%y", "%d-%m-%Y", "%d-%m-%y",
    "%Y/%m/%d", "%m/%d/%Y", "%d/%m/%y", "%Y.%m.%d", "%m.%d.%y", "%d.%m.%Y",
    "%B %d, %Y", "%b %d, %Y",
]


@pytest.mark.skipif(not __import__("os").path.exists(REF_MOD), reason="no reference")
@settings(max_examples=25, deadline=None)
@given(
    st.dates(datetime.date(1940, 1, 1), datetime.date(2039, 12, 28)),
    st.integers(0, len(_FMTS) - 1),
    st.sampled_from(["", "on ", "received ", "x1 "]),
    st.sampled_from(["", " eod", ", thanks", "."]),
)
def test_random_dates_match_reference(spark, d, fmt_i, prefix, suffix):
    """Random real dates rendered through random reference formats, wrapped
    in noise — our Spark-side pattern set must extract the exact multiset of
    (date, matched_string) tuples the reference's own code extracts.
    (spark is the session-scoped fixture; safe to reuse across hypothesis
    examples.)"""
    from docprompt_spark.dates import extract_dates

    ref = _ref()
    s = prefix + d.strftime(_FMTS[fmt_i]) + suffix
    expected = sorted(ref.extract_dates_from_text(s))

    df = spark.createDataFrame([(s,)], ["s"])
    got = sorted(
        (r["date"], r["full_date"])
        for r in extract_dates(df, "s").select("date", "full_date").collect()
    )
    assert got == expected, f"{s!r}: {got} != {expected}"
