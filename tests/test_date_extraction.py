"""F4 date extraction parity: our 22-pattern Spark implementation vs the
reference's extract_dates_from_text (utils/date_extraction.py), executed
directly on the same strings."""

import importlib.util
from pathlib import Path

import pytest

REF_MOD = Path("/root/reference/docprompt/utils/date_extraction.py")

pytestmark = pytest.mark.skipif(not REF_MOD.exists(), reason="reference absent")


def _load_reference():
    spec = importlib.util.spec_from_file_location("ref_date_extraction", REF_MOD)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


SAMPLES = [
    "Invoice dated 2023-11-04 due 2023-12-01.",
    "Received 95-12-30 and archived.",
    "US style 11/04/2023 and short 11/04/23.",
    "EU style 30/11/2023 and short 30/11/95.",
    "Dotted 2023.11.04 and 04.11.2023 and 4.11.23.",
    "Ambiguous 03-04-2023 parses twice.",
    "November 4th, 2023 was a Saturday.",
    "November 4, 2023 same day.",
    "Nov 4th, 2023 abbreviated.",
    "Nov 4, 2023 abbreviated plain.",
    "June 5th, 2021 ordinal strip.",
    "Spaced   March   3rd ,  1999 inside.",
    "Invalid 02-30-2023 must not parse as mdY.",
    "Invalid 2023-02-30 must not parse at all.",
    "Edge 1-1-01 minimal digits.",
    "No dates here at all.",
    "Mixed: 2020/06/15, 15/06/2020, Jun 15, 2020.",
]


def test_pattern_count_matches_reference():
    from docprompt_spark.dates import DATE_PATTERNS

    ref = _load_reference()
    assert len(DATE_PATTERNS) == len(ref.default_date_formats) == 22


def test_extraction_matches_reference_per_string(spark):
    """Exact multiset of (date, full_date) per input string."""
    from docprompt_spark.dates import extract_dates

    ref = _load_reference()
    df = spark.createDataFrame([(i, s) for i, s in enumerate(SAMPLES)], ["i", "s"])
    got = extract_dates(df, "s").select("i", "date", "full_date").collect()
    mine = {}
    for r in got:
        mine.setdefault(r["i"], []).append((r["date"], r["full_date"]))

    for i, s in enumerate(SAMPLES):
        expected = sorted(ref.extract_dates_from_text(s))
        actual = sorted(mine.get(i, []))
        assert actual == expected, f"string {i!r}: {actual} != {expected}"
