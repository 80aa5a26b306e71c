#!/usr/bin/env python
"""PROCESS-ISOLATED N vs 4N scaling (r3 verdict item #6).

local[N] co-hosts every executor thread plus all python workers in ONE JVM
process group, so the 8:32 pair has measured JVM+Python co-residency
contention (~0.48 efficiency) that says nothing about multi-executor
scaling. This harness measures the same job on a real Spark STANDALONE
cluster on this box:

* master (separate JVM)
* N=8:  one worker JVM pinned to cores 0-7  (taskset), 1 executor x 8 cores
* 4N=32: four worker JVMs pinned to disjoint octets, 4 executors x 8 cores

Each executor is its own process; its python workers inherit the worker's
CPU affinity, so the 4N configuration is four isolated 8-core "machines" —
the closest a single box gets to the north rule's two-cluster-size run.

Usage: BENCH_DOCS=8000 python BENCH/run_cluster_scaling.py
Writes results to stdout (JSON) — merge into BENCH/BASELINE.md manually.
"""

from __future__ import annotations

import json
import os
import shutil
import socket
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import pyspark  # noqa: E402

# the full distribution (with bin/spark-class, which the Worker needs to
# launch executor JVMs) — falls back to the pip package layout
SPARK_HOME = os.environ.get("SPARK_HOME") or pyspark.__path__[0]
JARS = os.path.join(SPARK_HOME, "jars", "*")
MASTER_URL = "spark://127.0.0.1:7077"


def _wait_port(port: int, timeout: float = 30.0) -> None:
    t0 = time.time()
    while time.time() - t0 < timeout:
        with socket.socket() as s:
            if s.connect_ex(("127.0.0.1", port)) == 0:
                return
        time.sleep(0.3)
    raise RuntimeError(f"port {port} never came up")


def start_cluster(n_workers: int, cores_each: int, workdir: str):
    """Master + n_workers pinned worker JVMs; returns Popen list."""
    env = dict(os.environ)
    env.setdefault("SPARK_NO_DAEMONIZE", "1")
    env["SPARK_HOME"] = SPARK_HOME  # Worker execs bin/spark-class for executors
    env["SPARK_SCALA_VERSION"] = "2.13"  # skip the build-dir probe
    env.setdefault("PYSPARK_PYTHON", sys.executable)
    procs = []
    log = open(os.path.join(workdir, "cluster.log"), "ab")
    procs.append(
        subprocess.Popen(
            ["java", "-cp", JARS, "-Xmx1g",
             "org.apache.spark.deploy.master.Master",
             "--host", "127.0.0.1", "--port", "7077", "--webui-port", "0"],
            stdout=log, stderr=log, env=env,
        )
    )
    _wait_port(7077)
    for k in range(n_workers):
        lo, hi = k * cores_each, (k + 1) * cores_each - 1
        wdir = os.path.join(workdir, f"worker{k}")
        os.makedirs(wdir, exist_ok=True)
        procs.append(
            subprocess.Popen(
                ["taskset", "-c", f"{lo}-{hi}", "java", "-cp", JARS, "-Xmx1g",
                 "org.apache.spark.deploy.worker.Worker", MASTER_URL,
                 "--cores", str(cores_each), "--memory", "20g",
                 "--webui-port", "0", "--work-dir", wdir],
                stdout=log, stderr=log, env=env,
            )
        )
    time.sleep(3)  # workers register
    return procs


def stop_cluster(procs) -> None:
    for p in reversed(procs):
        p.terminate()
    for p in procs:
        try:
            p.wait(timeout=10)
        except subprocess.TimeoutExpired:
            p.kill()


def measure(total_cores: int, cores_each: int, corpus: str, reps: int) -> dict:
    from pyspark.sql import SparkSession

    from docprompt_spark import pipeline
    from docprompt_spark.shipping import ensure_py_files

    spark = (
        SparkSession.builder.master(MASTER_URL)
        .appName(f"cluster-scale-{total_cores}")
        .config("spark.cores.max", str(total_cores))
        .config("spark.executor.cores", str(cores_each))
        .config("spark.executor.memory", "16g")
        .config("spark.sql.shuffle.partitions", str(total_cores))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "4g")
        .getOrCreate()
    )
    ensure_py_files(spark)
    docs = (
        spark.read.parquet(corpus)
        .select("doc_id", "pdf", "n_pages")
        .repartition(total_cores * 2)
    )
    n_docs = docs.persist().count()
    # warmup: full pipeline once (python worker pool spin-up, imports)
    pipeline.run_extraction(spark, docs).selectExpr("sum(size(spans))").collect()
    walls = []
    for _ in range(reps):
        t0 = time.perf_counter()
        pipeline.run_extraction(spark, docs).selectExpr(
            "sum(size(spans))"
        ).collect()
        walls.append(round(time.perf_counter() - t0, 3))
        print(f"[cluster {total_cores}c] rep {walls[-1]}s", file=sys.stderr)
    spark.stop()
    best = min(walls)
    return {
        "cores": total_cores,
        "executors": total_cores // cores_each,
        "wall_best": best,
        "docs_per_sec": round(n_docs / best, 2),
        "rep_walls": walls,
    }


def main() -> None:
    n_docs = int(os.environ.get("BENCH_DOCS", "8000"))
    reps = int(os.environ.get("BENCH_REPS", "3"))
    import bench

    # corpus generated/cached with a throwaway local session (uncounted)
    from docprompt_spark.session import get_spark

    s = get_spark(master="local[32]", app_name="corpusgen")
    corpus = bench.corpus_path(n_docs, spark=s)
    s.stop()
    time.sleep(2)

    results = {}
    for total, cores_each, n_workers in [(8, 8, 1), (32, 8, 4)]:
        workdir = tempfile.mkdtemp(prefix=f"spark-cluster-{total}-")
        procs = start_cluster(n_workers, cores_each, workdir)
        try:
            results[total] = measure(total, cores_each, corpus, reps)
        finally:
            stop_cluster(procs)
            shutil.rmtree(workdir, ignore_errors=True)
        time.sleep(3)

    eff = results[32]["docs_per_sec"] / (4 * results[8]["docs_per_sec"])
    out = {
        "mode": "standalone-cluster-pinned-workers",
        "n_docs": n_docs,
        "pair": "8:32",
        "results": results,
        "efficiency": round(eff, 3),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
