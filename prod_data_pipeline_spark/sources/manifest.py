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
    # zone maps: {file: {col: [min, max]}} for the columns the writer chose
    # to track (commit_snapshot stats_cols=...).  Files written before stats
    # were tracked simply have no entry and are never pruned away.
    stats: dict = None  # type: ignore[assignment]
    # per-file bloom filters: {file: {col: [set bit positions]}} for
    # equality pruning on high-cardinality keys (commit_snapshot
    # bloom_cols=...); md5-derived positions, 1024 bits x 3 hashes.
    blooms: dict = None  # type: ignore[assignment]
    # per-file NULL counts: {file: {col: n_null}} for the stats columns —
    # kept SEPARATE from the [min, max] zone maps (the Iceberg
    # null_value_counts design) because min/max ignore NULLs: a file whose
    # range is exactly [v, v] may still hold NULL rows, and replace_where
    # must not delete those with the partition.  Files committed before
    # null tracking have no entry (treated as unknown — conservative).
    nulls: dict = None  # type: ignore[assignment]
    # commit metadata, atomic with the version (e.g. the streaming sink's
    # last_batch_id transaction marker, a rollback's source version).
    meta: dict = None  # type: ignore[assignment]
    # merge-on-read equality deletes: {delete_id: {"col": c, "value": v,
    # "applies_to": [files]}}.  Each entry hides rows where col == value
    # from the listed files WITHOUT rewriting them (delete_where_mor);
    # applies_to is the bloom/zone-pruned possible-match set AT DELETE
    # TIME, which is also what scopes the delete like an Iceberg sequence
    # number: files appended later are absent from the list, so a
    # re-inserted key survives.  read_snapshot applies the filters;
    # compact_deletes folds them back into data files.
    deletes: dict = None  # type: ignore[assignment]
    # authoritative table schema (Spark StructType jsonValue, all fields
    # nullable), recorded at commit time and evolved ADDITIVELY: previous
    # columns keep position and type, columns new to a commit append.
    # Readers project to it (spark.read.schema), so a table's width is a
    # manifest fact — stable across footer sampling and pending MOR
    # delete state (r13 advisory: per-group footer promotion made the
    # same table expose evolved columns before compaction and hide them
    # after) — and reads pay ZERO footer scans, the Iceberg/Delta
    # schema-in-metadata design.  None on tables whose last commit
    # predates round 14 (legacy: reads fall back to footer behavior; the
    # next commit records the footer-merged union once).
    schema: dict = None  # type: ignore[assignment]


class ConcurrentCommit(Exception):
    """Another writer advanced the table between this operation's snapshot
    read and its publish; the operation's plan (prune set, rewrite set,
    rollback base) is stale.  Re-run the operation against the new head —
    the Iceberg optimistic-concurrency contract."""


def _manifest_dir(table_path: str) -> str:
    return os.path.join(table_path, "manifests")


def _publish(table_path: str, build) -> "Snapshot":
    """Serialized manifest publish — the table's single coordination
    point.  Writers prepare data files and stats OUTSIDE this call
    (arbitrarily slow, fully parallel); under an exclusive lock the head
    is re-read, ``build(prev_v, version)`` produces the manifest dict for
    head+1 (raising ConcurrentCommit if its plan is stale), the manifest
    is written, and the pointer swaps.  The critical section is a couple
    of local file writes — at warehouse scale this lock is the catalog's
    compare-and-swap, and the behavior is identical: concurrent appends
    serialize and compose; conflicting rewrites abort and retry.

    The lock auto-releases on process death (flock), and a crash inside
    the section leaves at worst an unreferenced vN.json that the next
    committer overwrites via tmp+rename before swapping the pointer —
    readers can never observe a partial commit.

    Two invariants are enforced HERE, for every commit path, so no
    individual operation can forget them:

    - **Transaction markers carry forward** (the Delta txn appId->version
      idiom): the streaming sink's ``last_batch_id`` (and the generalized
      ``txn`` map) from the previous head's meta are merged into every
      new manifest's meta, taking the per-key MAX.  Without this, any
      non-streaming commit landing between a batch commit and the stream
      checkpoint write (a nightly compaction, a replace_where, a
      rollback) would reset the marker, and a crash-replayed batch would
      silently re-append its rows.

    - **Every listed file must exist at publish time**: a commit whose
      Spark write phase outlived ``clean_orphans``'s grace window could
      otherwise publish a manifest referencing already-deleted files —
      torn reads forever after.  Raising here turns that silent
      corruption into a loud retryable failure (clean_orphans holds this
      same lock, so the check and the swap cannot interleave with a
      cleanup scan)."""
    import fcntl

    mdir = _manifest_dir(table_path)
    os.makedirs(mdir, exist_ok=True)
    with open(os.path.join(mdir, "_commit.lock"), "w") as lk:
        fcntl.flock(lk, fcntl.LOCK_EX)
        prev_v = current_version(table_path)
        version = (prev_v or 0) + 1
        manifest = build(prev_v, version)
        if prev_v is not None:
            prev_meta = read_manifest(table_path, prev_v).meta or {}
            meta = dict(manifest.get("meta") or {})
            if "last_batch_id" in prev_meta or "last_batch_id" in meta:
                meta["last_batch_id"] = max(
                    prev_meta.get("last_batch_id", -1),
                    meta.get("last_batch_id", -1),
                )
            if "txn" in prev_meta or "txn" in meta:
                merged_txn = dict(prev_meta.get("txn") or {})
                for app, ver in (meta.get("txn") or {}).items():
                    merged_txn[app] = max(ver, merged_txn.get(app, -1))
                meta["txn"] = merged_txn
            manifest["meta"] = meta
        missing = [f for f in manifest["files"] if not os.path.exists(f)]
        if missing:
            raise FileNotFoundError(
                f"refusing to publish v{version}: {len(missing)} listed "
                f"file(s) do not exist (first: {missing[0]}) — was "
                "clean_orphans run with older_than_s shorter than this "
                "commit's write phase?"
            )
        mpath = os.path.join(mdir, f"v{version}.json")
        with open(mpath + ".tmp", "w") as f:
            json.dump(manifest, f)
        os.rename(mpath + ".tmp", mpath)
        ptr = _pointer_path(table_path)
        with open(ptr + ".tmp", "w") as f:
            f.write(str(version))
        os.rename(ptr + ".tmp", ptr)  # the commit point: atomic on POSIX
    return Snapshot(
        version=version,
        files=manifest["files"],
        n_rows=manifest["n_rows"],
        mode=manifest["mode"],
        stats=manifest.get("stats", {}),
        blooms=manifest.get("blooms", {}),
        nulls=manifest.get("nulls", {}),
        meta=manifest.get("meta", {}),
        deletes=manifest.get("deletes", {}),
        schema=manifest.get("schema"),
    )


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
        version=m["version"],
        files=m["files"],
        n_rows=m["n_rows"],
        mode=m["mode"],
        stats=m.get("stats", {}),
        blooms=m.get("blooms", {}),
        nulls=m.get("nulls", {}),
        meta=m.get("meta", {}),
        deletes=m.get("deletes", {}),
        schema=m.get("schema"),
    )


def snapshots(table_path: str) -> list[Snapshot]:
    """All committed versions, oldest first (the table's history)."""
    v = current_version(table_path)
    return [read_manifest(table_path, i) for i in range(1, (v or 0) + 1)]


def _stats_repr(value):
    """The zone-map representation of a Python value — mirrors the
    `_plain` serialization inside _collect_file_stats so equality and
    order comparisons against stored bounds are coherent (temporal /
    decimal values go through str(); ISO strings sort like the values)."""
    return (
        value
        if isinstance(value, (int, float, str, bool, type(None)))
        else str(value)
    )


def _collect_file_stats(
    spark: SparkSession,
    written: list[str],
    stats_cols: tuple[str, ...],
    bloom_cols: tuple[str, ...] = (),
) -> tuple[int, dict, dict, dict]:
    """One scan of the just-written files: per-file row count plus min/max
    zone maps AND null counts for `stats_cols`.  Cost is a single
    combiner-friendly agg over data the page cache still holds — the
    write-side toll every zone-mapped table format pays (Iceberg/Delta
    collect the same stats from parquet footers at commit time; null
    counts are Iceberg's null_value_counts, required because min/max
    ignore NULLs and replace_where must know whether a single-value file
    also hides NULL rows)."""
    from pyspark.sql import functions as F

    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in stats_cols:
        aggs.append(F.min(c).alias(f"__mn_{c}"))
        aggs.append(F.max(c).alias(f"__mx_{c}"))
        aggs.append(
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"__nl_{c}")
        )
    for c in bloom_cols:
        # per-file SET of bloom bit positions (bounded by _BLOOM_BITS entries
        # per hash row, whatever the file's cardinality) — the whole bloom
        # filter IS this set, serialized into the manifest
        for j in range(_BLOOM_K):
            aggs.append(F.collect_set(_bloom_pos_col(c, j)).alias(f"__bf_{c}_{j}"))
    rows = (
        spark.read.parquet(*written)
        .groupBy(F.input_file_name().alias("__f"))
        .agg(*aggs)
        .collect()
    )

    def _plain(v):
        # JSON-serializable zone-map bound; temporal/decimal go via str
        # (ISO order == value order for dates/timestamps of one column)
        return v if isinstance(v, (int, float, str, bool, type(None))) else str(v)

    by_base = {}
    bloom_by_base = {}
    null_by_base = {}
    n_new = 0
    for r in rows:
        n_new += r["__n"]
        base = os.path.basename(r["__f"])
        if stats_cols:
            by_base[base] = {
                c: [_plain(r[f"__mn_{c}"]), _plain(r[f"__mx_{c}"])] for c in stats_cols
            }
            null_by_base[base] = {c: int(r[f"__nl_{c}"]) for c in stats_cols}
        if bloom_cols:
            bloom_by_base[base] = {
                c: sorted(
                    {p for j in range(_BLOOM_K) for p in r[f"__bf_{c}_{j}"] or []}
                )
                for c in bloom_cols
            }
    # a ZERO-ROW part file never surfaces in the groupBy above (no rows to
    # group); record it explicitly as [None, None] bounds + 0 nulls, which
    # downstream consumers already treat soundly (prune keeps it a no-op,
    # replace_where classifies it all-null ⇒ keepable/droppable, never
    # 'missing stats forever')
    if stats_cols:
        for f in written:
            base = os.path.basename(f)
            if base not in by_base:
                by_base[base] = {c: [None, None] for c in stats_cols}
                null_by_base[base] = {c: 0 for c in stats_cols}
    stats = {f: by_base[os.path.basename(f)] for f in written if os.path.basename(f) in by_base}
    blooms = {
        f: bloom_by_base[os.path.basename(f)]
        for f in written
        if os.path.basename(f) in bloom_by_base
    }
    nulls = {
        f: null_by_base[os.path.basename(f)]
        for f in written
        if os.path.basename(f) in null_by_base
    }
    return n_new, stats, blooms, nulls


_BLOOM_BITS = 1024
_BLOOM_K = 3


def _bloom_positions_py(value, bits: int = _BLOOM_BITS, k: int = _BLOOM_K) -> list[int]:
    """The k bloom bit positions of a value — md5-derived so the DRIVER
    (plain Python, no JVM) computes the identical positions the Spark-side
    collection did: position_j = int(md5("bf{j}:" + str(value))[:12], 16)
    mod bits.  Values hash by str() form on both sides."""
    import hashlib

    s = str(value)
    return [
        int(hashlib.md5(f"bf{j}:{s}".encode()).hexdigest()[:12], 16) % bits
        for j in range(k)
    ]


def _bloom_value_render_safe(value) -> bool:
    """True iff Python ``str(value)`` is guaranteed to equal Spark's
    ``CAST(col AS STRING)`` rendering — the identity the bloom probe
    depends on.  str and int round-trip identically; datetime.date does
    too ("2024-01-02" on both sides).  bool does NOT (Python "True" vs
    Spark "true"), floats diverge in scientific-notation territory
    (Python "1e+20" vs Spark "1.0E20"), and timestamp/decimal renderings
    carry engine-specific precision trimming — for those a bloom could
    falsely "prove absence", which would make ``delete_where`` silently
    keep rows it was asked to delete.  Callers must skip bloom pruning
    (treat every file as a candidate) when this returns False."""
    import datetime

    if isinstance(value, bool) or isinstance(value, datetime.datetime):
        return False
    return isinstance(value, (str, int, datetime.date))


def _bloom_pos_col(col: str, j: int, bits: int = _BLOOM_BITS):
    from pyspark.sql import functions as F

    return F.pmod(
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(f"bf{j}:"), F.col(col).cast("string"))), 1, 12
            ),
            16,
            10,
        ).cast("long"),
        F.lit(bits),
    ).cast("int")


def _schema_value(df: DataFrame) -> dict:
    """A frame's schema as the manifest-recorded jsonValue, every field
    forced nullable (pre-evolution rows read an evolved column as NULL,
    so the authoritative schema can never promise non-null)."""
    from pyspark.sql.types import StructField, StructType

    return StructType(
        [StructField(f.name, f.dataType, True) for f in df.schema.fields]
    ).jsonValue()


def _auth_struct(snap: "Snapshot"):
    """The snapshot's authoritative schema as a StructType, or None on a
    legacy table (no schema recorded yet)."""
    from pyspark.sql.types import StructType

    return StructType.fromJson(snap.schema) if snap.schema else None


def _require_schema_column(snap: "Snapshot", col: str, op: str) -> None:
    """Fail fast when a delete targets a column the recorded schema does
    not contain: SQL errors on an unknown column, and before this guard a
    typo'd ``delete_where(col, None)`` read the phantom column as
    all-NULL and deleted EVERY row in its rewrite set.  Legacy tables
    (no recorded schema) keep the old decidable-NULL behavior — absence
    cannot be proven there without a footer scan."""
    auth = _auth_struct(snap)
    if auth is not None and col not in auth.fieldNames():
        raise ValueError(
            f"{op}({col!r}): column not in the table schema "
            f"{auth.fieldNames()}"
        )


def _rewrite_reader(spark: SparkSession, snap: "Snapshot"):
    """The reader every rewrite path (COW delete, delete compaction,
    bin-pack) uses: authoritative-schema projection when the manifest
    records one, merged footers otherwise — never a sampled footer,
    which could drop an evolved column's data from rewritten files."""
    auth = _auth_struct(snap)
    if auth is not None:
        return spark.read.schema(auth)
    return spark.read.option("mergeSchema", "true")


def _evolve_schema_value(
    spark: SparkSession, prev: "Snapshot | None", df: DataFrame
) -> dict:
    """Additive schema evolution at commit time: previous columns keep
    their position and type; columns new to ``df`` append in frame order.
    A same-name type conflict is a corrupt evolution and fails fast.
    Legacy base (files committed before schemas were recorded): the
    previous width is recovered ONCE from merged footers and recorded
    from then on — the only footer scan a schema-recorded table ever
    pays.  A recorded schema keeps evolving additively even when the
    previous version has NO files (every row deleted): deletes carry the
    schema forward, so an append to an emptied table must not silently
    reset the recorded width/column order or skip the type-conflict
    check (r14 advisory #2)."""
    from pyspark.sql.types import StructField, StructType

    if prev is None or (not prev.files and not prev.schema):
        return _schema_value(df)
    if prev.schema:
        base = StructType.fromJson(prev.schema)
    else:
        base = (
            spark.read.option("mergeSchema", "true").parquet(*prev.files).schema
        )
    fields = [StructField(f.name, f.dataType, True) for f in base.fields]
    have = {f.name: f.dataType for f in fields}
    for f in df.schema.fields:
        if f.name not in have:
            fields.append(StructField(f.name, f.dataType, True))
        elif f.dataType != have[f.name]:
            raise ValueError(
                f"schema evolution is additive-only: column {f.name!r} is "
                f"{have[f.name].simpleString()} in the table but "
                f"{f.dataType.simpleString()} in the commit"
            )
    return StructType(fields).jsonValue()


def commit_snapshot(
    df: DataFrame,
    table_path: str,
    mode: str = "append",
    stats_cols: tuple[str, ...] = (),
    bloom_cols: tuple[str, ...] = (),
    meta: dict | None = None,
) -> Snapshot:
    """Commit a new table version.

    Data files are written to an immutable per-commit directory; the new
    manifest lists them (plus, for append, every file of the previous
    version); the `_current` pointer is swapped last via atomic rename.
    A crash before the swap leaves orphan files but NO visible change —
    readers can never observe a partial commit.

    MULTI-WRITER SAFE: the publish runs under the table's commit lock
    (`_publish`) with the merged file list rebuilt against whatever head
    is current at publish time, so concurrent appends serialize and both
    land — no lost updates.  Rewriting operations (delete_where,
    rewrite_small_files, rollback) instead raise ConcurrentCommit when
    the head moved under them, the optimistic-concurrency contract.

    `stats_cols` opts columns into per-file min/max **zone maps** stored in
    the manifest: readers prune whole files whose range cannot match a
    predicate (read_snapshot `prune=`) without opening them — at object-
    store scale this turns a selective scan over N files into a scan over
    the few files whose zone overlaps, the same data-skipping design as
    Iceberg/Delta file stats.  Pruning pays off in proportion to how well
    the writer CLUSTERED the column (sources.writers write_range_ordered /
    write_zordered exist for exactly that).
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
    n_new, new_stats, new_blooms, new_nulls = (
        _collect_file_stats(spark, written, tuple(stats_cols), tuple(bloom_cols))
        if written
        else (0, {}, {}, {})
    )

    # Publish under the commit lock: appends COMPOSE with any concurrent
    # writer (the merged file list is rebuilt against whatever head is
    # current at publish time), so two parallel appenders both land.
    def build(prev_v: int | None, version: int) -> dict:
        if mode == "append" and prev_v is not None:
            prev = read_manifest(table_path, prev_v)
            files = prev.files + written
            n_rows = prev.n_rows + n_new
            stats = {**(prev.stats or {}), **new_stats}
            blooms = {**(prev.blooms or {}), **new_blooms}
            nulls = {**(prev.nulls or {}), **new_nulls}
            # MOR deletes carry verbatim: the appended files are absent
            # from every applies_to, so a re-inserted key is visible —
            # the sequence-number semantics
            deletes = dict(prev.deletes or {})
            # evolved against the ACTUAL head (under the commit lock), so
            # a concurrent append's new columns are never dropped
            schema = _evolve_schema_value(spark, prev, df)
        else:
            files, n_rows = written, n_new
            stats, blooms, nulls = new_stats, new_blooms, new_nulls
            deletes = {}
            schema = _schema_value(df)
        return {
            "version": version,
            "files": files,
            "n_rows": n_rows,
            "mode": mode,
            "stats": stats,
            "blooms": blooms,
            "nulls": nulls,
            "meta": meta or {},
            "deletes": deletes,
            "schema": schema,
        }

    return _publish(table_path, build)


def prune_files(snap: Snapshot, col: str, lo, hi) -> list[str]:
    """Files of `snap` that may contain rows with lo <= col <= hi, by zone
    map.  A file is skipped ONLY when its recorded [min, max] provably
    cannot overlap; files without stats for `col` are always kept (sound
    by construction — pruning can never drop a matching row).  Bounds
    compare with Python ordering, so pass values of the column's type
    (or its str() form for temporal columns, whose ISO strings sort).
    A probe whose Python type does not order against a file's stored
    bounds (e.g. str "5" vs int stats) keeps that file — degrading to
    unpruned, never raising, so a type-mismatched equality delete stays
    merely slower instead of crashing the commit path."""
    kept = []
    for f in snap.files:
        rng = (snap.stats or {}).get(f, {}).get(col)
        if rng is None or rng[0] is None or rng[1] is None:
            kept.append(f)
            continue
        mn, mx = rng
        try:
            disjoint = mx < lo or mn > hi
        except TypeError:
            disjoint = False  # unorderable probe: keep the file (sound)
        if not disjoint:
            kept.append(f)
    return kept


def prune_files_eq(snap: Snapshot, col: str, value) -> list[str]:
    """Files of `snap` that may contain rows with col == value, by BOTH
    skipping indexes: the point lookup is also the degenerate range
    [value, value], so a file is dropped when its zone map proves the
    value outside [min, max] OR its bloom proves absence (some probe bit
    unset) — the intersection is strictly tighter than either alone
    (round 12: a stats-only table now scopes equality deletes without
    requiring blooms).  False positives only — a kept file may still
    lack the value; a dropped file provably cannot contain it.  Files
    tracking neither index for `col` are always kept.

    Pruning applies only to value types whose Python str() rendering
    provably matches Spark's CAST(col AS STRING) (str / int / date);
    for any other type (float, bool, timestamp, decimal) every file is
    kept — correct, just unpruned — because a rendering mismatch would
    turn the indexes' false-positive-only contract into false NEGATIVES,
    and delete_where would silently skip rows it must delete."""
    if not _bloom_value_render_safe(value):
        return list(snap.files)
    rendered = _stats_repr(value)
    zone_kept = set(prune_files(snap, col, rendered, rendered))
    probes = _bloom_positions_py(value)
    kept = []
    for f in snap.files:
        if f not in zone_kept:
            continue  # zone map proves the value cannot occur in f
        setbits = (snap.blooms or {}).get(f, {}).get(col)
        if setbits is None:
            kept.append(f)
            continue
        bits = set(setbits)
        if all(p in bits for p in probes):
            kept.append(f)
    return kept


def _carry_deletes(prev_deletes: dict, kept_files: list[str]) -> dict:
    """Intersect every merge-on-read delete entry's applies_to with the
    files that survive a commit; entries whose scope empties are dropped
    (every file they hid rows from was rewritten or removed)."""
    kept = set(kept_files)
    out = {}
    for did, e in (prev_deletes or {}).items():
        scoped = [f for f in e["applies_to"] if f in kept]
        if scoped:
            out[did] = {**e, "applies_to": scoped}
    return out


def _has_pending(snap: Snapshot, files) -> bool:
    """True when any MOR delete entry scopes one of ``files`` — a rewrite
    of those files must fold the entries in via _grouped_delete_read."""
    touched = set(files)
    return any(
        touched & set(e["applies_to"]) for e in (snap.deletes or {}).values()
    )


def _grouped_delete_read(
    reader, entries: dict, files: list, allow_missing: bool = False
):
    """Read ``files`` with every applicable MOR delete entry applied — to
    exactly the files each entry scopes, never the whole union.  An
    entry's filter must NOT touch files outside its applies_to: a file
    APPENDED AFTER the delete may legitimately re-insert the deleted key
    (the sequencing contract), and a union-wide filter would silently
    destroy it.  Files are grouped by their applicable entry-set (one or
    two groups in practice), each group filtered once, and the groups
    unioned — the shared kernel behind read_snapshot and every rewrite
    path (COW delete, bin-pack compaction, delete compaction)."""
    from pyspark.sql import functions as F

    scopes = {did: set(e["applies_to"]) for did, e in (entries or {}).items()}
    if not scopes:
        return reader.parquet(*files)
    groups: dict = {}
    for f in files:
        key = frozenset(did for did, sc in scopes.items() if f in sc)
        groups.setdefault(key, []).append(f)
    parts = []
    for key in sorted(groups, key=sorted):
        df = reader.parquet(*groups[key])
        missing = [
            entries[did]["col"]
            for did in key
            if entries[did]["col"] not in df.columns
        ]
        if missing:
            # Without mergeSchema Spark samples ONE footer for the group's
            # schema; in a group mixing pre- and post-evolution files it
            # may sample an old file and hide a column the newer files DO
            # carry — skipping the filter on that evidence would silently
            # resurrect deleted rows.  Merge the group's footers for an
            # authoritative answer; only a column absent from EVERY file
            # gets the decidable-NULL shortcut below.
            merged = (
                df.sparkSession.read.option("mergeSchema", "true")
                .parquet(*groups[key])
            )
            if any(c in merged.columns for c in missing):
                df = merged
        for did in sorted(key):
            e = entries[did]
            if e["col"] not in df.columns:
                # Schema-evolved scope: these files predate the column, so
                # every row reads it as NULL.  Resolving F.col would throw
                # unresolved-column; the NULL semantics are decidable here
                # instead — a non-NULL delete value matches nothing (skip
                # the filter), a NULL delete value matches every row
                # (drop the group's rows outright).
                if e["value"] is None:
                    df = df.filter(F.lit(False))
                continue
            df = df.filter(~F.col(e["col"]).eqNullSafe(F.lit(e["value"])))
        parts.append(df)
    out = parts[0]
    # Groups can come back with DIFFERENT widths even under a non-merging
    # reader: the footer-merge promotion above widens exactly the groups
    # a schema-evolved delete scopes, while unscoped groups keep their
    # sampled schema.  A strict unionByName would then crash every
    # default read and every rewrite (bin-pack has no merge knob at
    # all), so divergent column sets always union with
    # allowMissingColumns=True — the absent columns ARE null for those
    # rows, which is strictly more faithful than plain Spark's
    # sampled-footer projection, and rewrites must never drop an
    # evolved column's data anyway.
    for df in parts[1:]:
        allow = allow_missing or set(df.columns) != set(out.columns)
        out = out.unionByName(df, allowMissingColumns=allow)
    return out


def read_snapshot(
    spark: SparkSession,
    table_path: str,
    version: int | None = None,
    prune: tuple[str, object, object] | None = None,
    merge_schema: bool = False,
) -> DataFrame:
    """Read a table version (default: current).  Time travel = pass an
    older version; the files it lists are immutable, so the read is
    reproducible forever (until a vacuum).

    `prune=(col, lo, hi)` applies zone-map data skipping: only files whose
    recorded [min, max] range can overlap [lo, hi] are opened, and the
    predicate is re-applied to the surviving rows, so the result equals
    `read_snapshot(...).filter(lo <= col <= hi)` exactly — skipping is a
    physical optimization, never a semantic one.

    Schema: on tables whose manifest records the authoritative schema
    (every commit since round 14), the read projects to EXACTLY it —
    `spark.read.schema(...)` — so the width is a manifest fact: stable
    across footer sampling, pending MOR delete state, and compaction
    (r13 advisory), with NULLs for pre-evolution rows and zero footer
    scans, the Iceberg/Delta schema-in-metadata design.  `merge_schema`
    is then moot.  On LEGACY tables (no recorded schema) the flag keeps
    its old meaning: `merge_schema=True` footprint-scans every footer
    for the additive union; False samples one footer (plain Spark)."""
    from pyspark.sql import functions as F

    v = version if version is not None else current_version(table_path)
    if v is None:
        raise FileNotFoundError(f"no committed snapshot at {table_path}")
    snap = read_manifest(table_path, v)
    auth = _auth_struct(snap)
    if auth is not None:
        reader = spark.read.schema(auth)
    elif merge_schema:
        reader = spark.read.option("mergeSchema", "true")
    else:
        reader = spark.read

    def _with_deletes(files: list[str]) -> DataFrame:
        # apply merge-on-read equality deletes to exactly the files each
        # entry scopes (grouped by entry-set — _grouped_delete_read)
        return _grouped_delete_read(
            reader, snap.deletes or {}, files, allow_missing=merge_schema
        )

    if prune is None:
        return _with_deletes(snap.files)
    col, lo, hi = prune
    kept = prune_files(snap, col, lo, hi)
    if not kept:
        # zone maps prove zero matches: an empty frame with the right schema
        return (
            reader.parquet(*snap.files)
            .filter(F.lit(False))
            .filter(F.col(col).between(lo, hi))
        )
    return _with_deletes(kept).filter(F.col(col).between(lo, hi))


def delete_where(
    spark: SparkSession,
    table_path: str,
    col: str,
    value,
) -> Snapshot:
    """Targeted row deletion (the GDPR right-to-be-forgotten shape) as a
    new immutable version: bloom/zone pruning identifies the files that
    MAY contain ``col == value``; only those are rewritten without the
    matching rows, and every other file carries over UNTOUCHED — file
    paths (and bytes) identical in the new manifest, so write
    amplification is proportional to the key's file footprint, not the
    table.  With a bloom-filtered key column the rewrite set is the few
    files whose filter can't prove absence — the copy-on-write DELETE
    Iceberg/Delta implement, driven entirely by the manifest.

    Deleted rows remain physically present in PRIOR versions until
    ``vacuum()`` expires them — the standard two-step: the delete is
    immediately invisible to readers of the current version, and the
    retention window bounds when the bytes are actually gone (for a
    compliance clock, follow with ``vacuum(keep_last=1)``).

    Rows where ``col`` IS NULL are never deleted (null-safe inequality),
    matching SQL ``DELETE WHERE col = value`` semantics.  Stats and
    blooms for rewritten files are re-collected over the SAME columns
    the snapshot already tracked; carried-over files keep theirs.
    Returns the new Snapshot.
    """
    from pyspark.sql import functions as F

    v = current_version(table_path)
    if v is None:
        raise FileNotFoundError(f"no committed version at {table_path}")
    snap = read_manifest(table_path, v)
    _require_schema_column(snap, col, "delete_where")
    rewrite = set(prune_files_eq(snap, col, value))
    carried = [f for f in snap.files if f not in rewrite]

    stats_cols = tuple(
        sorted({c for per_file in (snap.stats or {}).values() for c in per_file})
    )
    bloom_cols = tuple(
        sorted({c for per_file in (snap.blooms or {}).values() for c in per_file})
    )

    written: list[str] = []
    n_new, new_stats, new_blooms, new_nulls = 0, {}, {}, {}
    n_rewritten_before = 0
    if rewrite:
        n_rewritten_before = spark.read.parquet(*sorted(rewrite)).count()
        # fold pending MOR deletes in — scoped to exactly the files each
        # entry covers (a union-wide filter would destroy a key
        # re-inserted by a later append) — then apply this delete's own
        # predicate
        # REWRITES always read full-width: the authoritative manifest
        # schema when recorded, else merged footers — a sampled narrow
        # footer would silently DROP an evolved column's data from the
        # rewritten files (reads may project; rewrites must not lose
        # columns).  Footer merging is negligible next to the full read
        # the rewrite performs anyway.
        src = _grouped_delete_read(
            _rewrite_reader(spark, snap),
            snap.deletes or {},
            sorted(rewrite),
        )
        # The full-width grouped read above is AUTHORITATIVE: it carries
        # the recorded schema (or, on a legacy table, every column present
        # in ANY rewrite file via merged footers).  `col not in
        # src.columns` therefore only happens on a LEGACY table whose
        # rewrite set entirely predates the column (the schema-recorded
        # path already failed fast on unknown columns above) and the
        # decidable-NULL branches below apply.  Do NOT "fall back" to a
        # raw re-read here: it would
        # bypass the pending MOR delete filters folded in by the grouped
        # read and resurrect deleted rows in the rewritten files
        # (r13 advisory).
        if col in src.columns:
            kept_rows = src.filter(~F.col(col).eqNullSafe(F.lit(value)))
        elif value is None:
            # every row reads the absent column as NULL: a NULL-targeted
            # delete drops them all (same decidable-NULL semantics as
            # the grouped MOR read)
            kept_rows = src.filter(F.lit(False))
        else:
            kept_rows = src  # non-NULL value matches nothing here
        commit_id = uuid.uuid4().hex
        data_dir = os.path.join(table_path, "data", commit_id)
        kept_rows.write.mode("error").parquet(data_dir)
        written = [
            os.path.join(data_dir, f)
            for f in os.listdir(data_dir)
            if f.endswith(".parquet")
        ]
        if written:
            n_new, new_stats, new_blooms, new_nulls = _collect_file_stats(
                spark, written, stats_cols, bloom_cols
            )

    files = carried + written
    n_rows = snap.n_rows - n_rewritten_before + n_new
    stats = {
        **{f: s for f, s in (snap.stats or {}).items() if f in set(carried)},
        **new_stats,
    }
    blooms = {
        **{f: b for f, b in (snap.blooms or {}).items() if f in set(carried)},
        **new_blooms,
    }
    nulls = {
        **{f: n for f, n in (snap.nulls or {}).items() if f in set(carried)},
        **new_nulls,
    }

    def build(prev_v: int | None, version: int) -> dict:
        if prev_v != v:
            # the prune/rewrite plan was computed against v; a concurrent
            # commit may have added files containing the key
            raise ConcurrentCommit(
                f"table advanced v{v} -> v{prev_v} during delete; re-run"
            )
        return {
            "version": version,
            "files": files,
            "n_rows": n_rows,
            "mode": "delete",
            "stats": stats,
            "blooms": blooms,
            "nulls": nulls,
            "meta": {},
            # rewritten files had their pending MOR deletes folded in
            "deletes": _carry_deletes(snap.deletes, carried),
            "schema": snap.schema,  # a delete never changes the width
        }

    return _publish(table_path, build)


def delete_where_mor(
    spark: SparkSession,
    table_path: str,
    col: str,
    value,
) -> Snapshot:
    """Merge-on-read targeted deletion (Iceberg equality-delete / Delta
    deletion-vector shape): instead of rewriting the files that may hold
    ``col == value`` (delete_where's copy-on-write), commit a manifest
    DELETE ENTRY scoping them — readers filter the hidden rows out at
    scan time, and no data byte moves.  The write cost is O(manifest):
    at 100 TB this is the difference between a sub-second GDPR delete
    and rewriting terabytes on the delete path, deferring the rewrite to
    the next scheduled compaction (compact_deletes / rewrite_small_files
    both fold pending entries in).

    Scoping = sequencing: ``applies_to`` is the bloom/zone-pruned
    possible-match file set AT DELETE TIME, so rows of the SAME key
    appended later live in files outside the list and stay visible —
    the Iceberg sequence-number semantics without per-file sequence
    bookkeeping (the trade: applies_to is file-list-sized; a production
    format stores a sequence number instead — documented, deliberate).
    Applying the entry's filter to a file outside applies_to would be a
    provable no-op anyway, which is what makes rewrites safe to apply
    pending filters across their whole input.

    ``value`` must be a non-NULL JSON-representable scalar
    (str/int/float/bool) — it round-trips through the manifest.
    ``value=None`` is REJECTED: ``eqNullSafe(NULL)`` would hide every
    NULL-keyed row, contradicting the family's null-safe contract (NULL
    rows are never deleted by a value delete); replacing the NULL
    partition is commit_replace_where's job.  ``n_rows`` stays the
    PHYSICAL count: hidden rows still occupy bytes until a compaction
    folds the entry in (meta records the pending logical debt).  No-ops
    (returns the current snapshot, no version bump) when pruning proves
    the value absent from every file."""
    if value is None or not isinstance(value, (str, int, float, bool)):
        raise TypeError(
            "MOR delete value must be a non-NULL JSON-representable scalar, "
            f"got {value!r}"
        )
    v = current_version(table_path)
    if v is None:
        raise FileNotFoundError(f"no committed version at {table_path}")
    snap = read_manifest(table_path, v)
    _require_schema_column(snap, col, "delete_where_mor")
    affected = prune_files_eq(snap, col, value)
    if not affected:
        return snap  # bloom/zone proof: nothing to hide

    did = uuid.uuid4().hex

    def build(prev_v: int | None, version: int) -> dict:
        if prev_v != v:
            # applies_to was pruned against v; a concurrent append could
            # add files containing the key that this entry must NOT scope
            raise ConcurrentCommit(
                f"table advanced v{v} -> v{prev_v} during MOR delete; re-run"
            )
        return {
            "version": version,
            "files": snap.files,
            "n_rows": snap.n_rows,  # physical rows unchanged
            "mode": "mor-delete",
            "stats": snap.stats or {},
            "blooms": snap.blooms or {},
            "nulls": snap.nulls or {},
            "meta": {"mor_delete": [col, _stats_repr(value)]},
            "deletes": {
                **(snap.deletes or {}),
                did: {"col": col, "value": value, "applies_to": affected},
            },
            "schema": snap.schema,
        }

    return _publish(table_path, build)


def compact_deletes(spark: SparkSession, table_path: str) -> Snapshot:
    """Fold every pending merge-on-read delete back into data files (the
    MOR -> COW merge, Iceberg's rewrite_position_delete_files analog):
    rewrite exactly the files some entry scopes with all applicable
    filters applied, carry every other file untouched, and commit a
    version with NO delete entries.  Reads of the new version are then
    filter-free; prior versions keep their MOR semantics via time travel.
    No-ops (returns the current snapshot) when nothing is pending.

    Write amplification is bounded by the union of applies_to sets — the
    same bloom/zone-pruned footprint the COW delete would have paid at
    delete time, now paid once on a maintenance schedule instead of on
    the (latency-sensitive) delete path."""
    from pyspark.sql import functions as F

    v = current_version(table_path)
    if v is None:
        raise FileNotFoundError(f"no committed version at {table_path}")
    snap = read_manifest(table_path, v)
    if not (snap.deletes or {}):
        return snap
    rewrite = sorted({f for e in snap.deletes.values() for f in e["applies_to"]})
    carried = [f for f in snap.files if f not in set(rewrite)]

    stats_cols = tuple(
        sorted({c for per_file in (snap.stats or {}).values() for c in per_file})
    )
    bloom_cols = tuple(
        sorted({c for per_file in (snap.blooms or {}).values() for c in per_file})
    )

    n_before = spark.read.parquet(*rewrite).count()
    # scoped per entry — never a union-wide filter (sequencing contract);
    # full-width read so the rewrite can never drop an evolved column
    src = _grouped_delete_read(
        _rewrite_reader(spark, snap), snap.deletes or {}, rewrite
    )
    commit_id = uuid.uuid4().hex
    data_dir = os.path.join(table_path, "data", commit_id)
    src.write.mode("error").parquet(data_dir)
    written = [
        os.path.join(data_dir, f)
        for f in os.listdir(data_dir)
        if f.endswith(".parquet")
    ]
    n_new, new_stats, new_blooms, new_nulls = (
        _collect_file_stats(spark, written, stats_cols, bloom_cols)
        if written
        else (0, {}, {}, {})
    )

    files = carried + written
    carried_set = set(carried)

    def build(prev_v: int | None, version: int) -> dict:
        if prev_v != v:
            raise ConcurrentCommit(
                f"table advanced v{v} -> v{prev_v} during delete compaction; "
                "re-run"
            )
        return {
            "version": version,
            "files": files,
            "n_rows": snap.n_rows - n_before + n_new,
            "mode": "merge-deletes",
            "stats": {
                **{f: x for f, x in (snap.stats or {}).items() if f in carried_set},
                **new_stats,
            },
            "blooms": {
                **{f: x for f, x in (snap.blooms or {}).items() if f in carried_set},
                **new_blooms,
            },
            "nulls": {
                **{f: x for f, x in (snap.nulls or {}).items() if f in carried_set},
                **new_nulls,
            },
            "meta": {"merged_delete_entries": len(snap.deletes)},
            "deletes": {},
            "schema": snap.schema,
        }

    return _publish(table_path, build)


def vacuum(table_path: str, keep_last: int = 1) -> list[str]:
    """Delete data files referenced ONLY by expired versions (all but the
    last `keep_last`).  Returns the deleted paths.  Time travel to expired
    versions stops working — the standard retention trade-off.

    Runs under the table's commit lock: the live-file set is computed
    against a head no publish can move mid-scan, so vacuum can never race
    a rollback into deleting files the new head references (rollback's
    own existence check also runs under the lock — the two serialize in
    either order, and the loser behaves correctly)."""
    import fcntl

    mdir = _manifest_dir(table_path)
    if not os.path.isdir(mdir):
        return []
    with open(os.path.join(mdir, "_commit.lock"), "w") as lk:
        fcntl.flock(lk, fcntl.LOCK_EX)
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


def commit_replace_where(
    df: DataFrame,
    table_path: str,
    col: str,
    value,
    stats_cols: tuple[str, ...] = (),
    bloom_cols: tuple[str, ...] = (),
    meta: dict | None = None,
) -> Snapshot:
    """Partition-scoped idempotent overwrite (Delta's ``replaceWhere`` /
    the reference pipeline's purge-then-rewrite —
    /root/reference/glue/jobs/raw_to_curated_events_v3_dq.py:153-156
    `purge_s3_path` + append — on manifest tables):
    commit ``df`` as the NEW content of the logical partition
    ``col == value``, atomically dropping every existing file that lies
    entirely inside it and keeping everything else.  Re-running the same
    ingest for the same value converges to the same table — the
    idempotent daily-rerun semantic (C1) the reference implements with
    `purge_s3_path`, here as one pointer swap with time travel intact.

    Soundness rule: a prior file is DROPPED only when its zone map proves
    min == max == value for ``col`` AND its recorded null count proves it
    holds no NULL rows — min/max ignore NULLs, so a [v, v] file may still
    hide rows whose partition value is NULL, and those rows are OUTSIDE
    the replaced partition (Delta's replaceWhere keeps them; Iceberg
    tracks null_value_counts for exactly this).  It is KEPT when its zone
    proves the value cannot occur in it — including the all-NULL file
    ([None, None] bounds, e.g. produced by partition-preserving
    compaction of a NULL partition), which provably cannot contain any
    non-null target.  A file whose stats are missing, whose range
    straddles the value, or whose null count is unknown/positive where a
    drop would occur is AMBIGUOUS — it may mix partitions — and the
    commit refuses (ValueError) rather than guess: this operator requires
    the partition column to be stats-tracked and the writer to be
    partition-clustered (one value per file), which is what
    `df.repartition(col)` / per-partition ingests produce naturally.

    ``value=None`` replaces the NULL partition itself: all-NULL files
    drop, zero-null files keep, anything else refuses.

    The incoming frame is validated to contain ONLY the target value
    (count of violations == 0 — one cheap agg) so a misrouted ingest
    cannot corrupt a neighboring partition.  Publishes under the commit
    lock with a staleness guard (ConcurrentCommit) since the drop set
    was planned against the head."""
    from pyspark.sql import functions as F

    bad = df.filter(~F.col(col).eqNullSafe(F.lit(value))).count()
    if bad:
        raise ValueError(
            f"replace_where({col}={value!r}): frame contains {bad} row(s) "
            "outside the target partition"
        )

    v = current_version(table_path)
    prev = read_manifest(table_path, v) if v is not None else None
    kept, ambiguous = [], []
    if prev is not None:
        for f in prev.files:
            rng = (prev.stats or {}).get(f, {}).get(col)
            n_null = (prev.nulls or {}).get(f, {}).get(col)  # None = unknown
            if rng is None:
                ambiguous.append(f)  # no zone map at all
            elif rng[0] is None and rng[1] is None:
                # all values NULL (or zero rows): cannot hold a non-null
                # target; IS the NULL partition when value is None
                if value is None:
                    continue  # entirely the target (NULL) partition: dropped
                kept.append(f)
            elif value is None:
                # non-null bounds: in the NULL partition iff it hides nulls
                if n_null == 0:
                    kept.append(f)
                else:
                    ambiguous.append(f)  # has (or unknown) NULL rows: mixes
            elif rng[0] == rng[1] == _stats_repr(value):
                # single-value file — droppable only if provably NULL-free:
                # min/max ignore NULLs, so without a zero null count this
                # file may hide NULL-partition rows the drop would delete
                if n_null == 0:
                    continue  # entirely the target partition: dropped
                ambiguous.append(f)
            else:
                try:
                    straddles = rng[0] <= _stats_repr(value) <= rng[1]
                except TypeError:
                    # probe type doesn't order against the stored bounds
                    # (e.g. str "5" vs int stats): cannot prove disjoint
                    straddles = True
                if straddles:
                    ambiguous.append(f)  # straddles the value: may mix partitions
                else:
                    kept.append(f)
        if ambiguous:
            raise ValueError(
                f"replace_where({col}={value!r}): {len(ambiguous)} file(s) have "
                f"missing/straddling stats or unresolved NULL counts for "
                f"{col!r} (first: {ambiguous[0]}); commit with stats_cols "
                "including the partition column and partition-clustered files"
            )

    all_stats = tuple(sorted(set(stats_cols) | {col}))
    commit_id = uuid.uuid4().hex
    data_dir = os.path.join(table_path, "data", commit_id)
    df.write.mode("error").parquet(data_dir)
    spark = df.sparkSession
    written = [
        os.path.join(data_dir, f)
        for f in os.listdir(data_dir)
        if f.endswith(".parquet")
    ]
    n_new, new_stats, new_blooms, new_nulls = (
        _collect_file_stats(spark, written, all_stats, tuple(bloom_cols))
        if written
        else (0, {}, {}, {})
    )
    kept_set = set(kept)
    n_kept = 0
    if prev is not None and kept:
        # count once via recorded manifest arithmetic is impossible (rows
        # per file aren't stored); one cheap count over the kept files only
        n_kept = spark.read.parquet(*kept).count()

    def build(prev_v: int | None, version: int) -> dict:
        if prev_v != v:
            raise ConcurrentCommit(
                f"table advanced v{v} -> v{prev_v} during replace_where; re-run"
            )
        return {
            "version": version,
            "files": kept + written,
            "n_rows": n_kept + n_new,
            "mode": "replace_where",
            "stats": {
                **{f: s for f, s in ((prev.stats or {}) if prev else {}).items()
                   if f in kept_set},
                **new_stats,
            },
            "blooms": {
                **{f: b for f, b in ((prev.blooms or {}) if prev else {}).items()
                   if f in kept_set},
                **new_blooms,
            },
            "nulls": {
                **{f: n for f, n in ((prev.nulls or {}) if prev else {}).items()
                   if f in kept_set},
                **new_nulls,
            },
            "meta": {**(meta or {}), "replace_where": [col, _stats_repr(value)]},
            "deletes": _carry_deletes(
                (prev.deletes if prev else {}) or {}, kept
            ),
            # kept files from other partitions retain their columns, so
            # the width evolves additively against the previous schema
            "schema": _evolve_schema_value(spark, prev, df),
        }

    return _publish(table_path, build)


def clean_orphans(table_path: str, older_than_s: float = 3600.0) -> list[str]:
    """Delete data files referenced by NO manifest version (Iceberg's
    remove_orphan_files): crash leftovers from a failed publish and the
    prepared-but-aborted files of a ConcurrentCommit rewrite.  Only files
    older than ``older_than_s`` are touched — an in-flight commit writes
    its data files BEFORE publishing its manifest, so fresh unreferenced
    files are presumed in-flight, the same grace-window contract as
    Iceberg's olderThan.  ``older_than_s`` MUST exceed the longest write
    phase any committer can have (a large replace_where/compaction can
    run for hours); if the window is misjudged and a victim commit later
    publishes, ``_publish``'s file-existence guard raises instead of
    committing a manifest with dangling references — the failure is loud
    and retryable, never a torn table.  Runs under the commit lock so
    the referenced set cannot move mid-scan.  Returns the deleted paths;
    empty data dirs are pruned too."""
    import fcntl
    import time

    mdir = _manifest_dir(table_path)
    data_root = os.path.join(table_path, "data")
    if not os.path.isdir(mdir) or not os.path.isdir(data_root):
        return []
    with open(os.path.join(mdir, "_commit.lock"), "w") as lk:
        fcntl.flock(lk, fcntl.LOCK_EX)
        referenced: set[str] = set()
        for snap in snapshots(table_path):
            referenced.update(snap.files)
        cutoff = time.time() - older_than_s
        deleted = []
        for commit_dir in sorted(os.listdir(data_root)):
            d = os.path.join(data_root, commit_dir)
            if not os.path.isdir(d):
                continue
            for name in os.listdir(d):
                f = os.path.join(d, name)
                if f in referenced:
                    continue
                try:
                    if os.path.getmtime(f) <= cutoff:
                        os.remove(f)
                        deleted.append(f)
                except FileNotFoundError:
                    continue
            if not os.listdir(d):
                os.rmdir(d)
        return deleted


def rewrite_small_files(
    spark: SparkSession,
    table_path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    min_group: int = 2,
    partition_col: str | None = None,
) -> Snapshot:
    """Bin-pack table maintenance (Iceberg `rewrite_data_files` shape): read
    every data file smaller than ``target_file_bytes``, rewrite them
    coalesced into ceil(total_small_bytes / target) files, and commit a
    new version whose manifest lists the new files plus every large file
    CARRIED OVER untouched (identical paths and bytes).  Rows are
    preserved exactly; only physical layout changes — the streaming-ingest
    antidote, since per-batch commits accrete one small file per trigger
    and scan cost grows with file count, not data size.

    Stats/blooms for the rewritten files are re-collected over the same
    columns the snapshot already tracked; carried files keep theirs.
    Prior versions still reference the small files until ``vacuum()``
    expires them (time travel intact).  No-ops (returns the current
    snapshot) when fewer than ``min_group`` small files exist — one small
    file cannot be packed any better.

    At warehouse scale this is the nightly maintenance job: the rewrite
    set is chosen driver-side from manifest-listed sizes (no file is
    opened to decide), and the rewrite cost is proportional to the SMALL
    bytes only.

    ``partition_col`` preserves REPLACEABILITY: plain coalescing would
    mix logical partitions in one output file, and commit_replace_where
    would then (correctly) refuse the table as ambiguous.  With the
    column set, the rewrite writes `partitionBy(partition_col)` — every
    output file provably holds one value, the partition value is read
    back from the Hive-style path, and stats re-collection keeps
    min == max per file, so compaction and partition replacement compose
    for the life of the table (the streaming-ingest → nightly-compact →
    daily-replace loop)."""
    from pyspark.sql import functions as F

    v = current_version(table_path)
    if v is None:
        raise FileNotFoundError(f"no committed version at {table_path}")
    snap = read_manifest(table_path, v)
    small = [f for f in snap.files if os.path.getsize(f) < target_file_bytes]
    if len(small) < min_group:
        return snap
    carried = [f for f in snap.files if f not in set(small)]

    stats_cols = tuple(
        sorted({c for per_file in (snap.stats or {}).values() for c in per_file})
    )
    bloom_cols = tuple(
        sorted({c for per_file in (snap.blooms or {}).values() for c in per_file})
    )

    pending = _has_pending(snap, small)
    n_small_before = spark.read.parquet(*small).count() if pending else 0
    total = sum(os.path.getsize(f) for f in small)
    n_out = max(1, -(-total // target_file_bytes))  # ceil div
    commit_id = uuid.uuid4().hex
    data_dir = os.path.join(table_path, "data", commit_id)
    if partition_col is None:
        # fold pending MOR deletes into the compaction (the classic
        # merge-on-read maintenance contract), scoped per entry — a
        # union-wide filter would destroy later-appended re-inserts
        src0 = _grouped_delete_read(
            _rewrite_reader(spark, snap), snap.deletes or {}, small
        )
        src0.coalesce(int(n_out)).write.mode("error").parquet(data_dir)
    else:
        # one output file per partition VALUE (kept as a data column, so
        # stats re-collection proves min == max and replace_where keeps
        # working); the value count is maintenance-small by definition
        src = _grouped_delete_read(
            _rewrite_reader(spark, snap), snap.deletes or {}, small
        ).persist()
        values = sorted(
            (r[0] for r in src.select(partition_col).distinct().collect()),
            key=lambda x: (x is None, str(x)),
        )
        os.makedirs(data_dir, exist_ok=True)
        for val in values:
            src.filter(F.col(partition_col).eqNullSafe(F.lit(val))).coalesce(
                1
            ).write.mode("append").parquet(data_dir)
        src.unpersist()
    written = [
        os.path.join(data_dir, f)
        for f in os.listdir(data_dir)
        if f.endswith(".parquet")
    ]
    # written can be EMPTY when pending MOR deletes hid every small-file
    # row (the partitioned path then runs zero per-value writes)
    n_new, new_stats, new_blooms, new_nulls = (
        _collect_file_stats(spark, written, stats_cols, bloom_cols)
        if written
        else (0, {}, {}, {})
    )

    files = carried + written
    stats = {
        **{f: s for f, s in (snap.stats or {}).items() if f in set(carried)},
        **new_stats,
    }
    blooms = {
        **{f: b for f, b in (snap.blooms or {}).items() if f in set(carried)},
        **new_blooms,
    }
    nulls = {
        **{f: n for f, n in (snap.nulls or {}).items() if f in set(carried)},
        **new_nulls,
    }

    def build(prev_v: int | None, version: int) -> dict:
        if prev_v != v:
            # the rewrite set was chosen against v; composing blindly with
            # a concurrent overwrite/delete would resurrect its rows
            raise ConcurrentCommit(
                f"table advanced v{v} -> v{prev_v} during compaction; re-run"
            )
        return {
            "version": version,
            "files": files,
            # row-preserving by construction UNLESS pending MOR deletes
            # were folded in — then the physical count drops by the rows
            # they hid (n_new already measured over the written files)
            "n_rows": snap.n_rows if not pending
            else snap.n_rows - n_small_before + n_new,
            "mode": "compact",
            "stats": stats,
            "blooms": blooms,
            "nulls": nulls,
            "meta": {"compacted_files": len(small), "new_files": len(written)},
            "deletes": _carry_deletes(snap.deletes, carried),
            "schema": snap.schema,  # layout-only: width unchanged
        }

    return _publish(table_path, build)


def rollback(table_path: str, to_version: int) -> Snapshot:
    """Restore an earlier committed version as a NEW version (Iceberg-style
    rollback): the new manifest lists exactly the target version's files —
    no data is copied or deleted, history stays append-only, and the bad
    intermediate versions remain inspectable (and vacuum-able) rather than
    erased.  Readers see the restored state the instant the pointer swaps;
    a crash before the swap leaves the table unchanged.

    Requires the target version's manifest to still exist; its FILES must
    not have been vacuumed (vacuum() breaks time travel to expired
    versions — the documented retention trade-off).  Stats and blooms
    travel with the file list, so data skipping keeps working on the
    restored version."""
    v = current_version(table_path)
    if v is None:
        raise FileNotFoundError(f"no committed version at {table_path}")
    if not 1 <= to_version <= v:
        raise ValueError(f"cannot roll back to v{to_version}: table is at v{v}")
    target = read_manifest(table_path, to_version)

    def build(prev_v: int | None, version: int) -> dict:
        if prev_v != v:
            raise ConcurrentCommit(
                f"table advanced v{v} -> v{prev_v} during rollback; re-run"
            )
        # the existence check runs HERE, under the commit lock, so a
        # concurrent vacuum (which also holds the lock) cannot delete the
        # target's files between this check and the pointer swap
        missing = [f for f in target.files if not os.path.exists(f)]
        if missing:
            raise FileNotFoundError(
                f"v{to_version} references {len(missing)} vacuumed file(s); "
                f"rollback impossible (first: {missing[0]})"
            )
        return {
            "version": version,
            "files": target.files,
            "n_rows": target.n_rows,
            "mode": "rollback",
            "stats": target.stats or {},
            "blooms": target.blooms or {},
            "nulls": target.nulls or {},
            "meta": {"rolled_back_to": to_version},
            "deletes": target.deletes or {},
            "schema": target.schema,  # the restored version's width
        }

    return _publish(table_path, build)


def snapshot_changelog(
    spark: SparkSession,
    table_path: str,
    v_from: int,
    v_to: int,
    keys: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Change feed between two committed versions: key-level inserted /
    deleted / changed rows, computed by operators.cdc.table_diff over the
    two immutable snapshots — the manifest's time travel is what makes
    "diff table@v3 against table@v7" a well-posed question at all (a
    directory-listing table has no stable versions to diff).  One
    full-outer keyed join; at warehouse scale the table format's native
    changelog (if kept) replaces the join, but the semantics are these."""
    from prod_data_pipeline_spark.operators.cdc import table_diff

    old = read_snapshot(spark, table_path, v_from)
    new = read_snapshot(spark, table_path, v_to)
    cmp_cols = compare_cols or [c for c in new.columns if c not in keys]
    return table_diff(old, new, keys, cmp_cols)
