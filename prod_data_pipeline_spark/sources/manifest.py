"""Manifest-committed snapshot tables: atomic commits + time travel on
bare parquet.

The reference rewrites partition directories in place and relies on
readers not racing the rewrite (glue/jobs/raw_to_curated_events_v3_dq.py:
113-121).  Directory listing as the source of truth breaks down at scale
(eventually-consistent object stores, multi-writer races, no history), so
table formats (Iceberg/Delta/Hudi — all public designs) replace it with
**manifests**: an immutable list of data files per version plus one tiny
mutable pointer.  This module implements that pattern minimally:

    table/
      data/<commit-uuid>/part-*.parquet   -- immutable, append-only
      manifests/v{N}.json                 -- file list + stats, immutable
      _current                            -- pointer file: latest version

- **Writers** add data files under a fresh commit dir, write the next
  manifest, then swap the pointer (write-tmp + atomic rename).  Old data
  files are NEVER touched — an `overwrite` commit just stops listing them.
- **Readers** resolve the pointer (or an explicit version — time travel)
  and read exactly the listed files: no directory listing, no torn reads,
  and a reader holding version N is immune to any concurrent commit.
- **Scale**: the manifest holds file paths + row counts, kilobytes per
  thousand files; the pointer swap is the only coordination point.  (Real
  formats add manifest trees and optimistic locking for multi-writer —
  single-writer semantics are assumed here, as in the reference.)
- **Path scope**: data files go through Spark writers (any Hadoop FS),
  but manifest/pointer IO and post-write file discovery use driver-local
  Python IO (`os.listdir`/`open`/`os.rename`), so `table_path` must be a
  driver-visible POSIX path in this implementation.  Pointing it at an
  object store requires routing those few calls through the Hadoop
  FileSystem API (`spark._jvm.org.apache.hadoop.fs.FileSystem`) — the
  protocol itself is unchanged; only the IO shim differs.
"""

from __future__ import annotations

import json
import os
import uuid
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class Snapshot:
    version: int
    files: list[str]
    n_rows: int
    mode: str  # "append" | "overwrite"


def _manifest_dir(table_path: str) -> str:
    return os.path.join(table_path, "manifests")


def _pointer_path(table_path: str) -> str:
    return os.path.join(table_path, "_current")


def current_version(table_path: str) -> int | None:
    p = _pointer_path(table_path)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return int(f.read().strip())


def read_manifest(table_path: str, version: int) -> Snapshot:
    with open(os.path.join(_manifest_dir(table_path), f"v{version}.json")) as f:
        m = json.load(f)
    return Snapshot(
        version=m["version"], files=m["files"], n_rows=m["n_rows"], mode=m["mode"]
    )


def snapshots(table_path: str) -> list[Snapshot]:
    """All committed versions, oldest first (the table's history)."""
    v = current_version(table_path)
    return [read_manifest(table_path, i) for i in range(1, (v or 0) + 1)]


def commit_snapshot(df: DataFrame, table_path: str, mode: str = "append") -> Snapshot:
    """Commit a new table version.

    Data files are written to an immutable per-commit directory; the new
    manifest lists them (plus, for append, every file of the previous
    version); the `_current` pointer is swapped last via atomic rename.
    A crash before the swap leaves orphan files but NO visible change —
    readers can never observe a partial commit.
    """
    if mode not in ("append", "overwrite"):
        raise ValueError(f"mode must be append|overwrite, got {mode!r}")
    commit_id = uuid.uuid4().hex
    data_dir = os.path.join(table_path, "data", commit_id)
    df.write.mode("error").parquet(data_dir)

    spark = df.sparkSession
    written = [
        os.path.join(data_dir, f)
        for f in os.listdir(data_dir)
        if f.endswith(".parquet")
    ]
    n_new = spark.read.parquet(*written).count() if written else 0

    prev_v = current_version(table_path)
    if mode == "append" and prev_v is not None:
        prev = read_manifest(table_path, prev_v)
        files = prev.files + written
        n_rows = prev.n_rows + n_new
    else:
        files, n_rows = written, n_new
    version = (prev_v or 0) + 1

    os.makedirs(_manifest_dir(table_path), exist_ok=True)
    manifest = {"version": version, "files": files, "n_rows": n_rows, "mode": mode}
    mpath = os.path.join(_manifest_dir(table_path), f"v{version}.json")
    with open(mpath + ".tmp", "w") as f:
        json.dump(manifest, f)
    os.rename(mpath + ".tmp", mpath)

    ptr = _pointer_path(table_path)
    with open(ptr + ".tmp", "w") as f:
        f.write(str(version))
    os.rename(ptr + ".tmp", ptr)  # the commit point: atomic on POSIX
    return Snapshot(version=version, files=files, n_rows=n_rows, mode=mode)


def read_snapshot(
    spark: SparkSession, table_path: str, version: int | None = None
) -> DataFrame:
    """Read a table version (default: current).  Time travel = pass an
    older version; the files it lists are immutable, so the read is
    reproducible forever (until a vacuum)."""
    v = version if version is not None else current_version(table_path)
    if v is None:
        raise FileNotFoundError(f"no committed snapshot at {table_path}")
    snap = read_manifest(table_path, v)
    return spark.read.parquet(*snap.files)


def vacuum(table_path: str, keep_last: int = 1) -> list[str]:
    """Delete data files referenced ONLY by expired versions (all but the
    last `keep_last`).  Returns the deleted paths.  Time travel to expired
    versions stops working — the standard retention trade-off."""
    v = current_version(table_path)
    if v is None:
        return []
    keep_versions = set(range(max(1, v - keep_last + 1), v + 1))
    live: set[str] = set()
    for kv in keep_versions:
        live.update(read_manifest(table_path, kv).files)
    deleted = []
    for snap in snapshots(table_path):
        if snap.version in keep_versions:
            continue
        for f in snap.files:
            if f not in live and os.path.exists(f):
                os.remove(f)
                deleted.append(f)
    return deleted
