"""Physical-plan assertions: the optimizations we rely on at 100 TB must
actually appear in the executed plans (pushdown, broadcast, partial agg,
whole-stage codegen)."""

import os

import pyspark.sql.functions as F

SF_DIR = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_filter_and_projection_pushdown(spark):
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    q = li.filter(F.col("l_shipdate") <= "1998-09-02").select(
        "l_returnflag", "l_quantity"
    )
    plan = _plan(q)
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    # column pruning: scan schema contains only the 3 referenced columns
    import re

    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m, plan
    cols = {c.split(":")[0] for c in m.group(1).split(",")}
    assert cols == {"l_returnflag", "l_quantity", "l_shipdate"}


def test_q5_uses_broadcast_joins(spark):
    from docprompt_spark import queries as q

    df = q.registry()["q5_supplier_volume_by_nation"][0](spark, SF_DIR)
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan  # dims must not shuffle the fact table


def test_q1_partial_aggregation(spark):
    from docprompt_spark import queries as q

    df = q.registry()["q1_pricing_summary"][0](spark, SF_DIR)
    plan = _plan(df)
    # two-phase agg: map-side partial_ before the exchange
    assert "partial_" in plan
    assert "HashAggregate" in plan  # hash-based, codegen-eligible (not sort agg)


def test_extraction_single_shuffle_after_parse(spark):
    """The parse stage output flows into doc assembly with exactly the
    planned exchanges: one repartition of work units + one hash partitioning
    by doc_id (window + groupBy reuse the same partitioning)."""
    from docprompt_spark import pipeline

    docs = pipeline.corpus_df(spark, 3, seed=5, skew_every=0)
    result = pipeline.run_extraction(spark, docs.select("doc_id", "pdf", "n_pages"))
    plan = _plan(result)
    assert plan.count("Exchange") <= 3  # repartition + doc_id hash (+AQE reads)
    assert "BatchEvalPython" not in plan
