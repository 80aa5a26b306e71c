#!/usr/bin/env python
"""Dump `.explain("formatted")` for the round-6 optimization targets to
plans/r06/<name>_after.txt (the `_before.txt` twins were captured at the
round-start tree). Same session shape as the before capture: local[32],
sf0.1 inputs, extraction over corpus_df(6, seed=5, skew_every=3).

Usage: python BENCH/dump_r06_plans.py [suffix]   (default: after)
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

NAMES = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_supplier_volume_by_nation",
    "sessionize_events",
    "top3_orders_per_customer",
    "term_frequencies_top20",
    "dedup_exact_groups",
    "minhash_lsh_neardup_pairs",
    "simhash_neardup_pairs",
    "ann_bruteforce_cosine_top10",
    "ann_lsh_bucketed_top5",
    "text_quality_scores",
    "dedup_connected_components",
    "embedding_cosine_neardup_pairs",
    "exact_substring_dup_spans",
    "ngram_jaccard_self_similarity",
]


def formatted(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "after"
    from docprompt_spark import pipeline
    from docprompt_spark import queries as qmod
    from docprompt_spark.session import get_spark

    spark = get_spark(master="local[32]", app_name="plans-r06")
    sf = "/root/testdata/sf0.1"
    out_dir = os.path.join(REPO, "plans", "r06")
    os.makedirs(out_dir, exist_ok=True)

    docs = pipeline.corpus_df(spark, 6, seed=5, skew_every=3)
    with open(os.path.join(out_dir, f"extraction_{suffix}.txt"), "w") as f:
        f.write(formatted(pipeline.run_extraction(spark, docs)))
    print(f"extraction -> extraction_{suffix}.txt")

    reg = qmod.registry()
    for name in NAMES:
        fn, _ = reg[name]
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(formatted(fn(spark, sf)))
        print(f"{name} -> {name}_{suffix}.txt")
    spark.stop()


if __name__ == "__main__":
    main()
