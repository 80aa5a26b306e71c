#!/usr/bin/env python
"""Supplementary benchmarks (guide §1.4): per-query noop-sink isolation at an
arbitrary SF. bench.py is frozen for driver measurement; this file exists so
optimization work can cite isolated numbers. Usage:
    SPARK_GRAFT_SF_DIR=/root/testdata/sf1.0 python bench_extra.py q1 q2 ...
"""
from __future__ import annotations

import os
import sys
import time


def main() -> None:
    repo = os.path.dirname(os.path.abspath(__file__))
    if repo not in sys.path:
        sys.path.insert(0, repo)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    reps = int(os.environ.get("BENCH_REPS", "2"))
    from docprompt_spark import queries as qmod
    from docprompt_spark.session import get_spark

    spark = get_spark(master=f"local[{cpus}]", app_name="bench_extra")
    reg = qmod.registry()
    names = sys.argv[1:]
    out = {}
    for name in names:
        fn, _ = reg[name]
        best = None
        for _ in range(reps):
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t = time.perf_counter()
            # count() matches frozen bench.py methodology so numbers are
            # comparable; use NOOP=1 for full-materialization timing
            if os.environ.get("BENCH_NOOP"):
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            else:
                fn(spark, sf_dir).count()
            el = time.perf_counter() - t
            best = el if best is None else min(best, el)
            print(f"[extra] {name}: {el:.3f}s", file=sys.stderr)
        out[name] = round(best, 3)
    import json

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
