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


def test_no_rowwise_python_udfs_anywhere(spark):
    """Sweep the ENTIRE registry: no BatchEvalPython (row-at-a-time Python
    UDF) in any query's physical plan — Python only ever runs Arrow-batched
    (ArrowEvalPython / MapInPandas)."""
    import __spark_entry__ as entry

    offenders = []
    for name, fn in entry.queries().items():
        plan = _plan(fn(spark, SF_DIR))
        if "BatchEvalPython" in plan:
            offenders.append(name)
    assert not offenders, offenders


def _top_level_bracket_groups(s: str):
    depth = 0
    groups = []
    start = None
    for i, ch in enumerate(s):
        if ch == "[":
            if depth == 0:
                start = i
            depth += 1
        elif ch == "]":
            depth = max(0, depth - 1)
            if depth == 0 and start is not None:
                groups.append(s[start : i + 1])
                start = None
    return groups


def _is_global_window(line: str) -> bool:
    """Optimized-plan Window node shapes:
    [exprs], [part], [sort]  -> partitioned
    [exprs], [part]          -> partitioned, no ordering
    [exprs], [sort]          -> GLOBAL (sort spec contains ASC/DESC)
    [exprs]                  -> GLOBAL
    """
    groups = _top_level_bracket_groups(line)
    if len(groups) >= 3:
        return False
    if len(groups) == 2:
        return " ASC" in groups[1] or " DESC" in groups[1]
    return True


def test_no_unpartitioned_windows_anywhere(spark):
    """Round-1 verdict: five queries moved all rows to a single partition
    via global windows. Assert the whole registry stays clean: in the
    optimized plan a partitioned Window prints 3 top-level bracket groups
    ([exprs], [partitionSpec], [orderSpec]); a global one prints 2."""
    import __spark_entry__ as entry

    offenders = []
    for name, fn in entry.queries().items():
        lp = fn(spark, SF_DIR)._jdf.queryExecution().optimizedPlan().toString()
        for line in lp.splitlines():
            ls = line.strip()
            while ls[:2] in ("+-", ":-", ": ", "  "):
                ls = ls[2:].strip()
            if ls.startswith("Window "):
                if _is_global_window(ls):
                    offenders.append((name, ls[:90]))
    assert not offenders, offenders


def test_line_block_assignment_broadcasts_lines(spark):
    from docprompt_spark import queries as q

    df = q.registry()["line_block_word_assignment"][0](spark, SF_DIR)
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_ann_topk_uses_take_ordered(spark):
    from docprompt_spark import queries as q

    for name in ("ann_bruteforce_cosine_top10", "ann_lsh_bucketed_top5"):
        plan = _plan(q.registry()[name][0](spark, SF_DIR))
        assert "TakeOrderedAndProject" in plan, name
        assert "Window" not in plan, name
