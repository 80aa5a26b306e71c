#!/usr/bin/env python
"""Benchmark harness.

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON
line. The extraction corpus is materialized once to a cached parquet dir (not
counted in timings) so repeated runs — including the N-vs-4N scaling runs in
BENCH/run_scaling.py — read identical input.

Usage: python bench.py [--docs N] [--json-only]
"""

from __future__ import annotations

import json
import os
import sys
import time


def _sf_from_dir(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return 0.1


def corpus_path(n_docs: int, seed: int = 42, spark=None) -> str:
    """Deterministic bench corpus, cached under /tmp (generation excluded
    from timing). With a live session the corpus generates ON THE
    EXECUTORS (pipeline.corpus_df_distributed — gen_doc is pure in
    (idx, seed)); the serial pyarrow writer remains the sparkless
    fallback."""
    # v8: corpus rotates xref-stream envelopes (idx%5==1),
    # Flate/raw/LZW/raw content streams (idx%4) and raw/Flate/LZW/DCT/CCITT
    # image codecs; bump the prefix whenever gen_doc output bytes change
    path = f"/tmp/docprompt_bench_corpus/v50_seed{seed}_n{n_docs}"
    marker = os.path.join(path, "_DONE")
    if not os.path.exists(marker):
        if spark is not None:
            from docprompt_spark import pipeline

            pipeline.corpus_df_distributed(spark, n_docs, seed=seed).write.mode(
                "overwrite"
            ).parquet(path)
        else:
            from docprompt_spark.corpus import write_corpus_parquet

            write_corpus_parquet(path, n_docs, seed=seed, rows_per_file=500)
        with open(marker, "w") as f:
            f.write("ok")
    return path


def main() -> None:
    repo = os.path.dirname(os.path.abspath(__file__))
    if repo not in sys.path:
        sys.path.insert(0, repo)

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = _sf_from_dir(sf_dir)

    n_docs = int(os.environ.get("BENCH_DOCS", "0")) or max(int(80000 * sf), 100)
    if "--docs" in sys.argv:
        n_docs = int(sys.argv[sys.argv.index("--docs") + 1])
    reps = int(os.environ.get("BENCH_REPS", "3"))

    from docprompt_spark import pipeline
    from docprompt_spark import queries as qmod
    from docprompt_spark.session import get_spark

    spark = get_spark(master=f"local[{cpus}]", app_name="bench")
    cpath = corpus_path(n_docs, spark=spark)

    # balanced cached input (one-time, uncounted): the narrow no-shuffle
    # parse path inherits this partitioning
    docs = (
        spark.read.parquet(cpath)
        .select("doc_id", "pdf", "n_pages")
        .repartition(cpus * 2)
    )
    docs.persist().count()  # input cached: measure compute, not disk
    n_pages = docs.selectExpr("sum(n_pages)").collect()[0][0]

    # warmup (uncounted): full pipeline once — spins up the whole python
    # worker pool with real imports; throughput below is steady-state
    pipeline.run_extraction(spark, docs).selectExpr("sum(size(spans))").collect()

    # HOST CALIBRATION (uncounted): the same parse kernel run serially on
    # one core, in-process. This box is a shared-tenant VM whose effective
    # per-vCPU capacity swings 2-4x hour to hour (measured: the identical
    # pure-python 16-way probe ranged 11-45 docs/s/core in one afternoon
    # while the serial number held ~70/s on an idle box); recording the
    # serial kernel rate alongside the Spark wall lets any two bench runs
    # be compared on engine merit rather than host weather.
    from docprompt_spark import corpus as _corpus
    from docprompt_spark import kernels as _kernels
    from docprompt_spark import pdfparse as _pdfparse

    cal_blobs = [_corpus.gen_doc(i, seed=42)["pdf"] for i in range(64)]
    t0 = time.perf_counter()
    for _blob in cal_blobs:
        for _p in _pdfparse.extract_pages(_blob):
            _lay = _kernels.build_page_layout(_p["words"])
            _kernels.assemble_page_spans(_lay, _p["images"])
    serial_docs_per_sec = round(64 / (time.perf_counter() - t0), 2)
    print(f"[bench] serial kernel calibration: {serial_docs_per_sec} docs/s/core",
          file=sys.stderr)

    extraction_sec, n_spans = None, 0
    rep_walls = []
    for _ in range(reps):
        t0 = time.perf_counter()
        result = pipeline.run_extraction(spark, docs)
        n_spans = result.selectExpr("sum(size(spans))").collect()[0][0]
        el = time.perf_counter() - t0
        rep_walls.append(round(el, 3))
        print(f"[bench] extraction rep: {el:.3f}s", file=sys.stderr)
        extraction_sec = el if extraction_sec is None else min(extraction_sec, el)

    headline = [
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
    ]
    reg = qmod.registry()
    query_secs = {}
    if os.environ.get("BENCH_SKIP_QUERIES"):
        headline = []  # scaling runs time extraction only (halves campaign wall)
    for name in headline:
        fn, _ = reg[name]
        best = None
        for _ in range(2):  # second run = steady-state (file footers cached)
            t = time.perf_counter()
            fn(spark, sf_dir).count()
            el = time.perf_counter() - t
            best = el if best is None else min(best, el)
        query_secs[name] = round(best, 3)

    out = {
        "metric": "e2e_extraction_wall_sec",
        "value": round(extraction_sec, 3),
        "unit": "sec",
        "queries": {"extraction": round(extraction_sec, 3), **query_secs},
        "sf": sf,
        "cpus": cpus,
        "extraction": {
            "n_docs": n_docs,
            "n_pages": int(n_pages),
            "n_spans": int(n_spans),
            "docs_per_sec": round(n_docs / extraction_sec, 2),
            "pages_per_sec": round(n_pages / extraction_sec, 2),
            "rep_walls": rep_walls,
            # single-core serial rate of the same kernel, measured in this
            # run: divides out shared-host capacity swings when comparing
            # bench runs across days (engine merit = docs_per_sec relative
            # to serial_docs_per_sec * cores, not the absolute wall)
            "serial_docs_per_sec": serial_docs_per_sec,
        },
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
