"""Iceberg-style snapshot tables (docprompt_spark.table)."""

import os

import pyspark.sql.functions as F

from docprompt_spark import table


def test_write_read_roundtrip(spark, tmp_path):
    p = str(tmp_path / "t1")
    df = spark.range(100).withColumn("k", F.col("id") % 10)
    sid = table.write_table(df.repartition(4), p, stat_cols=["id"])
    assert sid == 0
    got = table.read_table(spark, p)
    assert got.count() == 100
    assert set(got.columns) == {"id", "k"}


def test_append_and_time_travel(spark, tmp_path):
    p = str(tmp_path / "t2")
    table.write_table(spark.range(0, 50), p, stat_cols=["id"])
    sid1 = table.write_table(spark.range(50, 80), p, stat_cols=["id"], mode="append")
    assert table.read_table(spark, p).count() == 80
    # time travel to snapshot 0
    assert table.read_table(spark, p, snapshot_id=0).count() == 50
    log = table.snapshots(p)
    assert [s["snapshot_id"] for s in log] == [0, 1]
    assert log[1]["parent_id"] == 0 and log[1]["operation"] == "append"
    assert sid1 == 1


def test_overwrite_keeps_old_snapshot_readable(spark, tmp_path):
    p = str(tmp_path / "t3")
    table.write_table(spark.range(10), p, stat_cols=["id"])
    table.write_table(spark.range(100, 103), p, stat_cols=["id"], mode="overwrite")
    assert table.read_table(spark, p).count() == 3
    assert table.read_table(spark, p, snapshot_id=0).count() == 10


def test_manifest_pruning_skips_files(spark, tmp_path):
    """Range-partitioned writes give disjoint id bounds per file; a point
    predicate must reduce the file listing via manifest stats alone."""
    p = str(tmp_path / "t4")
    df = spark.range(1000).repartitionByRange(8, "id")
    table.write_table(df, p, stat_cols=["id"])

    full = table.read_table(spark, p)
    pruned = table.read_table(spark, p, prune={"id": 7})
    n_full = len(full.inputFiles())
    n_pruned = len(pruned.inputFiles())
    assert n_full == 8
    assert n_pruned == 1
    # pruning is an optimization, not a filter: the matching row is intact
    assert pruned.filter(F.col("id") == 7).count() == 1

    # range predicate
    r = table.read_table(spark, p, prune={"id": (100, 220)})
    assert 1 <= len(r.inputFiles()) <= 3
    assert r.filter((F.col("id") >= 100) & (F.col("id") <= 220)).count() == 121


def test_empty_prune_result_yields_empty_frame(spark, tmp_path):
    p = str(tmp_path / "t5")
    table.write_table(spark.range(10), p, stat_cols=["id"])
    out = table.read_table(spark, p, prune={"id": 10_000})
    assert out.count() == 0
    assert "id" in out.columns


def test_atomic_hint_survives_torn_snapshot(spark, tmp_path):
    """A half-written snapshot file must not corrupt the table: the hint
    still points at the last committed snapshot."""
    p = str(tmp_path / "t6")
    table.write_table(spark.range(5), p, stat_cols=["id"])
    # simulate a torn write: stray .tmp snapshot that never got renamed
    with open(os.path.join(p, "metadata", "snap-000999.json.tmp"), "w") as f:
        f.write('{"half": ')
    assert table.current_snapshot_id(p) == 0
    assert table.read_table(spark, p).count() == 5


def test_date_and_binary_stat_cols_are_json_safe(spark, tmp_path):
    """Date/timestamp stats serialize as isoformat strings; binary stat
    columns are skipped instead of crashing json.dump (ADVICE r2)."""
    from pyspark.sql import functions as F

    p = str(tmp_path / "t")
    df = spark.range(3).select(
        F.col("id"),
        F.date_add(F.lit("2024-01-01").cast("date"), F.col("id").cast("int")).alias("d"),
        F.encode(F.col("id").cast("string"), "utf-8").alias("b"),
    )
    sid = table.write_table(df.coalesce(1), p, stat_cols=["id", "d", "b"])
    snap = table._load_snapshot(p, sid)
    fentries = [f for f in snap["files"] if f["rows"] > 0]
    assert len(fentries) == 1
    bounds = fentries[0]["bounds"]
    assert bounds["d"] == ["2024-01-01", "2024-01-03"]
    assert "b" not in bounds  # binary stats dropped, not crashed
    assert table.read_table(spark, p).count() == 3


def test_compact_table_binpacks_small_files(spark, tmp_path):
    """compact_table (Iceberg rewrite_data_files analog): many small
    append files collapse into ~target-row files in a new 'replace'
    snapshot; rows and values are untouched; big files carry over."""
    from docprompt_spark import table

    path = str(tmp_path / "t")
    # 6 appends of 100 rows each, deliberately multi-file (repartition 4)
    for k in range(6):
        df = spark.range(k * 100, (k + 1) * 100).withColumnRenamed("id", "v")
        table.write_table(
            df.repartition(4), path, stat_cols=["v"],
            mode="overwrite" if k == 0 else "append",
        )
    before = table.snapshots(path)[-1]
    assert before["n_files"] == 24
    sid = table.compact_table(spark, path, target_file_rows=300)
    after = [s for s in table.snapshots(path) if s["snapshot_id"] == sid][0]
    assert after["operation"] == "replace"
    assert after["n_files"] == 2  # 600 rows / 300-target
    assert after["total_rows"] == 600
    got = sorted(
        r["v"] for r in table.read_table(spark, path).collect()
    )
    assert got == list(range(600))
    # time travel to the pre-compaction snapshot still works
    old = table.read_table(spark, path, snapshot_id=before["snapshot_id"])
    assert old.count() == 600


def test_compact_noop_when_files_are_big_enough(spark, tmp_path):
    from docprompt_spark import table

    path = str(tmp_path / "t")
    table.write_table(spark.range(100).coalesce(1), path)
    sid0 = table.current_snapshot_id(path)
    assert table.compact_table(spark, path, target_file_rows=50) == sid0


def test_expire_snapshots_gc(spark, tmp_path):
    """expire_snapshots: old snapshots drop, unreferenced data files are
    deleted from disk, the retained snapshot still reads fully."""
    import os

    from docprompt_spark import table

    path = str(tmp_path / "t")
    for k in range(4):
        table.write_table(
            spark.range(k * 10, (k + 1) * 10).coalesce(1), path,
            mode="overwrite" if k == 0 else "append",
        )
    table.compact_table(spark, path, target_file_rows=1000)
    n_data_before = len(os.listdir(os.path.join(path, "data")))
    out = table.expire_snapshots(path, keep_last=1)
    assert out["expired_snapshots"] == 4
    assert out["removed_files"] > 0
    n_data_after = len(os.listdir(os.path.join(path, "data")))
    assert n_data_after < n_data_before
    assert sorted(
        r["id"] for r in table.read_table(spark, path).collect()
    ) == list(range(40))
    assert len(table.snapshots(path)) == 1
