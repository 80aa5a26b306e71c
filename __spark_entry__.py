"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship end-to-end extraction on the deterministic
corpus: from-scratch PDF parse (xref walk, content-stream tokenization,
ToUnicode decoding) → layout-aware reading order → ordered span sequences.

``queries()`` / ``oracle_sql()`` — the operator surface from SURVEY.md §2
plus training-data-pipeline operators (dedup, similarity search, text
analysis), each Spark implementation paired with a DuckDB oracle where
SQL-expressible.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: extraction pipeline over the deterministic synthetic corpus
    (the driver checks rows > 0 and a stable schema)."""
    from docprompt_spark import pipeline

    docs = pipeline.corpus_df(spark, 24, seed=42, skew_every=20)
    result = pipeline.run_extraction(spark, docs.select("doc_id", "pdf", "n_pages"))
    return pipeline.spans_exploded(result)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from docprompt_spark import queries as q

    return q.queries()


def oracle_sql() -> dict[str, str]:
    from docprompt_spark import queries as q

    return q.oracle_sql()
