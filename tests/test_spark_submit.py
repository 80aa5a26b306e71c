"""Ship-shape check: the job runs via real `spark-submit --py-files` with the
zip built by jobs/make_package.py — executors import docprompt_spark from the
archive, not from the repo checkout (north rule packaging requirement)."""

import os
import subprocess
import sys

import pyspark.sql.functions as F

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_spark_submit_py_files(spark, tmp_path):
    from docprompt_spark import pipeline

    # input table written by the test's session
    docs = pipeline.corpus_df(spark, 8, seed=31, skew_every=0)
    in_dir = str(tmp_path / "docs_in")
    docs.select("doc_id", "pdf", "n_pages").write.parquet(in_dir)
    golden = {
        r["doc_id"]: [tuple(s) for s in r["spans"]]
        for r in docs.select("doc_id", "spans").collect()
    }

    sys.path.insert(0, os.path.join(REPO, "jobs"))
    import make_package

    zip_path = make_package.build(str(tmp_path / "docprompt_spark.zip"))

    out_dir = str(tmp_path / "spans_out")
    spark_submit = os.path.join(os.path.dirname(sys.executable), "spark-submit")
    if not os.path.exists(spark_submit):
        spark_submit = "spark-submit"
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # the zip must be self-sufficient
    proc = subprocess.run(
        [
            spark_submit,
            "--master",
            "local[4]",
            "--py-files",
            zip_path,
            os.path.join(REPO, "jobs", "extract_job.py"),
            "--input",
            in_dir,
            "--output",
            out_dir,
            "--shuffle-partitions",
            "8",
        ],
        capture_output=True,
        text=True,
        timeout=420,
        cwd=str(tmp_path),  # not the repo: forces imports from the zip
        env=env,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]

    result = spark.read.parquet(out_dir)
    got = {
        r["doc_id"]: [tuple(s) for s in r["spans"]]
        for r in result.collect()
    }
    assert got == golden
