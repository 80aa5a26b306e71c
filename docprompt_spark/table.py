"""Iceberg-style snapshot tables over parquet (no Iceberg jar in container).

The north rule targets Iceberg tables; this container ships no Iceberg
runtime, so this module reimplements the parts of the table format the
pipeline actually relies on at scale, with the same on-disk philosophy
(data files are immutable; all state changes are metadata commits):

* **snapshots**: every write/append creates ``metadata/snap-<n>.json``
  listing the table's data files with per-file stats; a ``version-hint``
  pointer names the current snapshot. Appends never rewrite data files.
* **manifest stats & pruning**: each data-file entry records row count and
  min/max bounds for the declared stat columns; :func:`read_table` prunes
  files against simple predicates BEFORE Spark ever lists them — the
  mechanism that makes 10^12-row tables scannable (partition pruning
  without a directory walk).
* **time travel**: ``read_table(..., snapshot_id=k)`` reads the file list
  of any retained snapshot.
* **atomic commit**: the snapshot file is written fully, then the
  version-hint is replaced via os.replace (atomic on POSIX) — a torn write
  leaves the previous snapshot current, which is exactly Iceberg's
  optimistic-commit guarantee reduced to one writer.

Swapping this for real Iceberg is a one-line change at the call sites
(``.writeTo(...).using("iceberg")``); the pipeline semantics (snapshot
isolation for resume, stats-based pruning) are identical.
"""

from __future__ import annotations

import datetime
import json
import os
import uuid
from typing import Any, Dict, List, Optional

from pyspark.sql import DataFrame, SparkSession


def _meta_dir(path: str) -> str:
    return os.path.join(path, "metadata")


def _snap_path(path: str, sid: int) -> str:
    return os.path.join(_meta_dir(path), f"snap-{sid:06d}.json")


def current_snapshot_id(path: str) -> Optional[int]:
    hint = os.path.join(_meta_dir(path), "version-hint.text")
    if not os.path.exists(hint):
        return None
    return int(open(hint).read().strip())


def _load_snapshot(path: str, sid: int) -> dict:
    return json.load(open(_snap_path(path, sid)))


def _file_stats(fpath: str, stat_cols: List[str]) -> Dict[str, Any]:
    import pyarrow.parquet as pq

    md = pq.ParquetFile(fpath)
    n_rows = md.metadata.num_rows
    bounds = {}
    schema_names = md.schema_arrow.names
    for col in stat_cols:
        if col not in schema_names:
            continue
        idx = schema_names.index(col)
        lo = hi = None
        for rg in range(md.metadata.num_row_groups):
            st = md.metadata.row_group(rg).column(idx).statistics
            if st is None or not st.has_min_max:
                lo = hi = None
                break
            lo = st.min if lo is None else min(lo, st.min)
            hi = st.max if hi is None else max(hi, st.max)
        if lo is not None:
            lo, hi = _json_safe(lo), _json_safe(hi)
            if lo is not None and hi is not None:
                bounds[col] = [lo, hi]
    return {"rows": n_rows, "bounds": bounds}


def _json_safe(v: Any) -> Any:
    """Coerce a parquet row-group statistic to a JSON-encodable value.

    pyarrow returns datetime.date/datetime/bytes for date/timestamp/binary
    stat columns; json.dump would raise TypeError mid-commit. Dates and
    timestamps keep their ordering as isoformat strings; binary stats are
    dropped (returns None) rather than guessing an encoding."""
    if isinstance(v, (int, float, str, bool)) or v is None:
        return v
    if isinstance(v, (datetime.date, datetime.datetime)):
        return v.isoformat()
    if isinstance(v, bytes):
        return None
    return str(v)


def _stage_files(
    df: DataFrame, path: str, stat_cols: List[str]
) -> List[dict]:
    """Write ``df`` to a staging dir, move the parquet parts into ``data/``
    under immutable names, and return their manifest entries with stats."""
    os.makedirs(_meta_dir(path), exist_ok=True)
    staging = os.path.join(path, f"_stage_{uuid.uuid4().hex[:8]}")
    df.write.mode("overwrite").parquet(staging)

    data_dir = os.path.join(path, "data")
    os.makedirs(data_dir, exist_ok=True)
    new_files = []
    for fn in sorted(os.listdir(staging)):
        if not fn.endswith(".parquet"):
            continue
        dst = os.path.join(data_dir, f"{uuid.uuid4().hex[:12]}.parquet")
        os.replace(os.path.join(staging, fn), dst)
        entry = {"path": os.path.relpath(dst, path)}
        entry.update(_file_stats(dst, stat_cols))
        new_files.append(entry)
    for leftover in os.listdir(staging):
        os.remove(os.path.join(staging, leftover))
    os.rmdir(staging)
    return new_files


def _commit_snapshot(path: str, snap: dict) -> int:
    """Atomic metadata commit: full snapshot file, then version-hint swap
    via os.replace — a torn write leaves the previous snapshot current."""
    sid = snap["snapshot_id"]
    tmp = _snap_path(path, sid) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(snap, f)
    os.replace(tmp, _snap_path(path, sid))
    hint_tmp = os.path.join(_meta_dir(path), "version-hint.tmp")
    with open(hint_tmp, "w") as f:
        f.write(str(sid))
    os.replace(hint_tmp, os.path.join(_meta_dir(path), "version-hint.text"))
    return sid


def write_table(
    df: DataFrame,
    path: str,
    stat_cols: Optional[List[str]] = None,
    mode: str = "overwrite",
) -> int:
    """Write ``df`` as a new snapshot. ``mode='append'`` keeps the previous
    snapshot's files and adds the new ones; ``'overwrite'`` starts a fresh
    file list (old files stay on disk for time travel). Returns the new
    snapshot id."""
    stat_cols = stat_cols or []
    new_files = _stage_files(df, path, stat_cols)

    prev = current_snapshot_id(path)
    files = list(new_files)
    parent = None
    if mode == "append" and prev is not None:
        files = _load_snapshot(path, prev)["files"] + files
        parent = prev
    sid = (prev + 1) if prev is not None else 0
    snap = {
        "snapshot_id": sid,
        "parent_id": parent,
        "operation": mode,
        "schema": df.schema.jsonValue(),
        "stat_cols": stat_cols,
        "files": files,
        "total_rows": sum(f["rows"] for f in files),
    }
    return _commit_snapshot(path, snap)


def compact_table(
    spark: SparkSession,
    path: str,
    target_file_rows: int = 1_000_000,
    small_file_rows: Optional[int] = None,
) -> int:
    """Bin-pack small data files into ~``target_file_rows``-row files as a
    NEW snapshot (Iceberg's ``rewrite_data_files``) — the maintenance op
    that keeps a 10^12-row table of streaming appends scannable (every
    append snapshot adds task-count files; unchecked, file-count growth
    makes planning, not data, the bottleneck). Files at or above
    ``small_file_rows`` (default: target) are carried over untouched; only
    the small tail is rewritten, through Spark, never the driver. Old
    files stay on disk for time travel until :func:`expire_snapshots`.
    Returns the new snapshot id (the current one when there is nothing to
    compact)."""
    prev = current_snapshot_id(path)
    if prev is None:
        raise FileNotFoundError(f"no snapshot at {path}")
    snap = _load_snapshot(path, prev)
    threshold = small_file_rows if small_file_rows is not None else target_file_rows
    small = [f for f in snap["files"] if f["rows"] < threshold]
    if len(small) <= 1:
        return prev
    keep = [f for f in snap["files"] if f["rows"] >= threshold]
    df = spark.read.parquet(*[os.path.join(path, f["path"]) for f in small])
    n_rows = sum(f["rows"] for f in small)
    n_out = max(1, -(-n_rows // target_file_rows))
    new_files = _stage_files(df.repartition(n_out), path, snap["stat_cols"])
    out = {
        "snapshot_id": prev + 1,
        "parent_id": prev,
        "operation": "replace",
        "schema": snap["schema"],
        "stat_cols": snap["stat_cols"],
        "files": keep + new_files,
        "total_rows": snap["total_rows"],
    }
    return _commit_snapshot(path, out)


def expire_snapshots(path: str, keep_last: int = 1) -> Dict[str, int]:
    """Drop all but the newest ``keep_last`` snapshots and DELETE data
    files no retained snapshot references (Iceberg's ``expire_snapshots``
    — the GC that bounds storage under time travel). Returns counts."""
    if keep_last < 1:
        raise ValueError("keep_last must be >= 1")
    sids = sorted(
        int(fn[5:-5])
        for fn in os.listdir(_meta_dir(path))
        if fn.startswith("snap-") and fn.endswith(".json")
    )
    expire, retain = sids[:-keep_last], sids[-keep_last:]
    referenced = {
        f["path"] for sid in retain for f in _load_snapshot(path, sid)["files"]
    }
    removed_files = 0
    for sid in expire:
        for f in _load_snapshot(path, sid)["files"]:
            if f["path"] not in referenced:
                fp = os.path.join(path, f["path"])
                if os.path.exists(fp):
                    os.remove(fp)
                    removed_files += 1
        os.remove(_snap_path(path, sid))
    return {"expired_snapshots": len(expire), "removed_files": removed_files}


def read_table(
    spark: SparkSession,
    path: str,
    snapshot_id: Optional[int] = None,
    prune: Optional[Dict[str, Any]] = None,
) -> DataFrame:
    """Read a snapshot (current by default). ``prune={col: value}`` or
    ``{col: (lo, hi)}`` drops data files whose manifest bounds exclude the
    predicate — file-level skipping before Spark sees the listing. The
    predicate still applies in full inside Spark; pruning is an
    optimization, never a semantic filter."""
    sid = snapshot_id if snapshot_id is not None else current_snapshot_id(path)
    if sid is None:
        raise FileNotFoundError(f"no snapshot at {path}")
    snap = _load_snapshot(path, sid)
    files = snap["files"]
    if prune:
        kept = []
        for f in files:
            keep = True
            for col, pred in prune.items():
                b = f.get("bounds", {}).get(col)
                if b is None:
                    continue  # no stats -> cannot skip
                lo, hi = (pred if isinstance(pred, (tuple, list)) else (pred, pred))
                if hi < b[0] or lo > b[1]:
                    keep = False
                    break
            if keep:
                kept.append(f)
        files = kept
    paths = [os.path.join(path, f["path"]) for f in files]
    if not paths:
        from pyspark.sql.types import StructType

        return spark.createDataFrame([], StructType.fromJson(snap["schema"]))
    return spark.read.parquet(*paths)


def snapshots(path: str) -> List[dict]:
    """Snapshot log (id, parent, operation, rows) — the table's history."""
    out = []
    for fn in sorted(os.listdir(_meta_dir(path))):
        if fn.startswith("snap-") and fn.endswith(".json"):
            s = json.load(open(os.path.join(_meta_dir(path), fn)))
            out.append(
                {
                    "snapshot_id": s["snapshot_id"],
                    "parent_id": s["parent_id"],
                    "operation": s["operation"],
                    "total_rows": s["total_rows"],
                    "n_files": len(s["files"]),
                }
            )
    return out
