"""F4 date extraction: the reference's 22 regex patterns, Spark-native.

Mirrors /root/reference/docprompt/utils/date_extraction.py:7-127:
18 numeric patterns (3 separators - / . × 6 component orders) + 4
month-name patterns (full/abbreviated month × with/without ordinal
suffix), each validated by an actual date parse (invalid dates like
02-30 drop out), with the C-strptime two-digit-year pivot (69-99 ->
19xx, 00-68 -> 20xx) the reference inherits from datetime.strptime.

Everything is column expressions (regexp_extract_all + try_to_date) —
JVM-side, no Python UDFs. Parity with the reference implementation is
asserted in tests/test_date_extraction.py by importing and running the
reference module on the same strings.
"""

from __future__ import annotations

from typing import List, Tuple

from pyspark.sql import Column
from pyspark.sql import functions as F

_YYYY = r"(19|20)\d\d"
_MM = r"(0?[1-9]|1[012])"
_DD = r"(0?[1-9]|[12][0-9]|3[01])"
_YY = r"(\d\d)"
_FULL_MONTHS = (
    "January|February|March|April|May|June|July|August|September|October|"
    "November|December"
)
_ABBR_MONTHS = "Jan|Feb|Mar|Apr|May|Jun|Jul|Aug|Sep|Oct|Nov|Dec"


def _numeric(sep: str) -> List[Tuple[str, str, str]]:
    """(name, regex, order) for one separator — the reference's 6 component
    orders per separator (date_extraction.py:9-104)."""
    s = "[" + sep + "]"
    return [
        (f"Ymd{sep}", rf"\b({_YYYY}{s}{_MM}{s}{_DD})\b", "Ymd"),
        (f"ymd{sep}", rf"\b({_YY}{s}{_MM}{s}{_DD})\b", "ymd"),
        (f"mdY{sep}", rf"\b({_MM}{s}{_DD}{s}{_YYYY})\b", "mdY"),
        (f"mdy{sep}", rf"\b({_MM}{s}{_DD}{s}{_YY})\b", "mdy"),
        (f"dmY{sep}", rf"\b({_DD}{s}{_MM}{s}{_YYYY})\b", "dmY"),
        (f"dmy{sep}", rf"\b({_DD}{s}{_MM}{s}{_YY})\b", "dmy"),
    ]


# (name, regex-with-group-1-capturing-the-full-date, order-key)
DATE_PATTERNS: List[Tuple[str, str, str]] = (
    _numeric("-")
    + _numeric("/")
    + _numeric(".")
    + [
        (
            "BdthY",
            rf"\b(({_FULL_MONTHS})\s{{1,6}}\d{{1,2}}(st|nd|rd|th)\s{{0,2}},\s{{1,6}}\d{{4}})\b",
            "BdY",
        ),
        (
            "BdY",
            rf"\b(({_FULL_MONTHS})\s{{1,6}}\d{{1,2}}\s{{0,2}},\s{{1,6}}\d{{4}})\b",
            "BdY",
        ),
        (
            "bdthY",
            rf"\b(({_ABBR_MONTHS})\s{{1,6}}\d{{1,2}}(st|nd|rd|th)\s{{0,2}},\s{{1,6}}\d{{4}})\b",
            "bdY",
        ),
        (
            "bdY",
            rf"\b(({_ABBR_MONTHS})\s{{1,6}}\d{{1,2}}\s{{0,2}},\s{{1,6}}\d{{4}})\b",
            "bdY",
        ),
    ]
)

assert len(DATE_PATTERNS) == 22  # parity with the reference's pattern count


def _resolve_2digit_year(yy: Column) -> Column:
    """C strptime pivot (what datetime.strptime does for %y)."""
    return F.when(yy >= 69, yy + 1900).otherwise(yy + 2000)


def parse_matched(full: Column, order: str) -> Column:
    """Parse one full-date string matched by the pattern of ``order`` into a
    DATE column (null when the calendar rejects it, e.g. 02-30)."""
    if order in ("Ymd", "ymd", "mdY", "mdy", "dmY", "dmy"):
        parts = F.split(full, r"[-/.]")
        a, b, c = parts[0].cast("int"), parts[1].cast("int"), parts[2].cast("int")
        if order == "Ymd":
            y, m, d = a, b, c
        elif order == "ymd":
            y, m, d = _resolve_2digit_year(a), b, c
        elif order == "mdY":
            y, m, d = c, a, b
        elif order == "mdy":
            y, m, d = _resolve_2digit_year(c), a, b
        elif order == "dmY":
            y, m, d = c, b, a
        else:  # dmy
            y, m, d = _resolve_2digit_year(c), b, a
        return F.try_to_date(
            F.concat_ws("-", y.cast("string"), m.cast("string"), d.cast("string")),
            "yyyy-M-d",
        )
    # month-name forms: strip ordinal suffix, collapse spaces, no space
    # before comma (date_extraction.py:150-158)
    cleaned = F.regexp_replace(full, r"(st|nd|rd|th)", "")
    cleaned = F.trim(F.regexp_replace(cleaned, r"\s+", " "))
    cleaned = F.regexp_replace(cleaned, r"\s{1,},", ",")
    fmt = "MMMM d, yyyy" if order == "BdY" else "MMM d, yyyy"
    return F.try_to_date(cleaned, fmt)


def extract_dates(df, text_col: str):
    """All (pattern, full_date, date) matches per row — the reference's
    extract_dates_from_text as a relational explode. Every pattern is
    applied to every row exactly as the reference loops patterns (ambiguous
    strings yield one row per matching pattern, same multiplicity), but in
    ONE scan: per-pattern regexp_extract_all arrays are tagged, flattened
    and exploded together. Each transform reads the source column directly
    (no derived-array lambda chains — the Catalyst projection-collapse
    blowup documented in SNIPPETS does not apply)."""
    def _tag(name):
        # single-arg lambda (PySpark passes (element, index) to 2-arg ones)
        return lambda x: F.struct(F.lit(name).alias("pattern"), x.alias("full_date"))

    tagged = F.flatten(
        F.array(
            *[
                F.transform(
                    F.regexp_extract_all(F.col(text_col), F.lit(regex), F.lit(1)),
                    _tag(name),
                )
                for name, regex, _ in DATE_PATTERNS
            ]
        )
    )
    exploded = df.select("*", F.explode(tagged).alias("m")).select(
        "*", F.col("m.pattern").alias("pattern"), F.col("m.full_date").alias("full_date")
    ).drop("m")
    date_expr = None
    for name, _, order in DATE_PATTERNS:
        branch = parse_matched(F.col("full_date"), order)
        date_expr = (
            F.when(F.col("pattern") == name, branch)
            if date_expr is None
            else date_expr.when(F.col("pattern") == name, branch)
        )
    return exploded.withColumn("date", date_expr).filter(F.col("date").isNotNull())
