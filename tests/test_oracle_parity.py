"""Driver-equivalent correctness gate: every queries() entry compared against
its DuckDB oracle at sf0.01 — row count, column names, and exact sorted
values (stricter than the driver's order-insensitive value hash)."""

import math
import os

import duckdb
import pandas as pd
import pytest

SF_DIR = os.environ.get("PARITY_SF_DIR", "/root/testdata/sf0.01")

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def _duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def _assert_frames_equal(spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame, name: str):
    assert len(spark_pdf) == len(duck_pdf), (
        f"{name}: row count {len(spark_pdf)} != {len(duck_pdf)}"
    )
    assert sorted(spark_pdf.columns) == sorted(duck_pdf.columns), (
        f"{name}: columns {sorted(spark_pdf.columns)} != {sorted(duck_pdf.columns)}"
    )
    a, b = _canon(spark_pdf), _canon(duck_pdf)
    for col in a.columns:
        av, bv = a[col].tolist(), b[col].tolist()
        for i, (x, y) in enumerate(zip(av, bv)):
            if isinstance(x, float) and isinstance(y, float):
                if math.isnan(x) and math.isnan(y):
                    continue
                assert x == y, f"{name}.{col}[{i}]: {x!r} != {y!r}"
            else:
                assert str(x) == str(y), f"{name}.{col}[{i}]: {x!r} != {y!r}"


def _all_query_names():
    import __spark_entry__ as entrymod

    return sorted(entrymod.oracle_sql().keys())


@pytest.fixture(scope="module")
def duck():
    con = _duck()
    yield con
    con.close()


@pytest.mark.parametrize("name", _all_query_names())
def test_query_matches_oracle(spark, duck, name):
    import __spark_entry__ as entrymod

    fn = entrymod.queries()[name]
    sql = entrymod.oracle_sql()[name]
    spark_pdf = fn(spark, SF_DIR).toPandas()
    duck_pdf = duck.execute(sql).df()
    _assert_frames_equal(spark_pdf, duck_pdf, name)


def test_every_query_has_an_oracle():
    """Round-2 close: the rows-only set is EMPTY — every registry query has
    a DuckDB-checkable oracle. Guard against regressions."""
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    rows_only = [n for n in qs if n not in oracles]
    assert rows_only == [], rows_only


def test_entry_smoke(spark):
    import __spark_entry__ as entrymod

    df = entrymod.entry(spark)
    assert df.count() > 0
