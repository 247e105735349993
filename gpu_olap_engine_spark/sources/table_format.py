"""Minimal snapshot-isolated table format over plain parquet.

The reference has no mutation surface at all (its parser rejects
non-SELECT, gpu-olap-core/src/parser.rs:18-21); this module supplies
the 100 TB answer the plain-directory writers in ``sources`` cannot:
MERGE / DELETE with **snapshot isolation**, concurrent-reader safety,
and time travel — the essential subset of what Delta Lake / Apache
Iceberg provide, reimplemented dependency-free because neither package
exists in this environment (ROADMAP.md item 1).

Layout::

    table_dir/
      _commits/000000000000.json   # versioned manifests (commit log)
      data/txn-<uuid>/part-*.parquet   # immutable data files

A manifest is the complete state of one table version: the list of
data files, the schema, and application metadata (used by the
streaming sink for exactly-once batch ids). Data files are immutable
once written; a transaction writes NEW files under a fresh
``data/txn-*`` directory and then publishes a new manifest.

Commit protocol (single atomic step)::

    write manifest JSON to a temp name in _commits/  (+ fsync)
    os.link(temp, _commits/<version>.json)           # THE commit
    unlink temp

``os.link`` is atomic and fails with EEXIST if the version was
already committed — that failure IS the optimistic-concurrency
conflict signal (``CommitConflict``); the caller re-reads the new
latest version and retries. Readers list ``_commits``, take the
highest version, and read exactly the files that manifest names:
because data files are immutable and the manifest appears atomically,
a reader always sees a complete committed snapshot — never a
half-written mix — even while writers commit concurrently. A crash
at ANY point before the link leaves the table at the old version with
only orphaned (unreferenced) data files, which ``vacuum_table``
removes.

At 100 TB the same design holds: the manifest is metadata-only
(file names + stats), commits are O(1) renames on the metadata
store, and MERGE/DELETE rewrite only the files that actually contain
matching keys (found with a semi-join on ``input_file_name``), not
the table. A production deployment would shard the file list into
Iceberg-style manifest files once it exceeds a few million entries;
the commit protocol is unchanged by that.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid
from urllib.parse import unquote, urlparse

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

_COMMITS = "_commits"
_DATA = "data"


class CommitConflict(RuntimeError):
    """Another writer committed this version first; re-read and retry."""


def _commits_dir(path: str) -> str:
    return os.path.join(path, _COMMITS)


def _version_of(fname: str) -> int:
    return int(fname.split(".")[0])


def _list_versions(path: str) -> list[int]:
    d = _commits_dir(path)
    if not os.path.isdir(d):
        return []
    return sorted(
        _version_of(f)
        for f in os.listdir(d)
        if f.endswith(".json") and not f.startswith(".")
    )


def latest_version(path: str) -> int:
    versions = _list_versions(path)
    if not versions:
        raise ValueError(f"not a snapshot table (no commits): {path!r}")
    return versions[-1]


def _load_manifest(path: str, version: int) -> dict:
    with open(os.path.join(_commits_dir(path), f"{version:012d}.json")) as f:
        return json.load(f)


def _publish(path: str, version: int, manifest: dict) -> None:
    """Atomically publish `manifest` as `version`; CommitConflict if a
    concurrent writer got there first. os.link never overwrites, so
    exactly one of two racing commits for the same version wins."""
    d = _commits_dir(path)
    tmp = os.path.join(d, f".tmp-{uuid.uuid4().hex}.json")
    with open(tmp, "w") as f:
        json.dump(manifest, f)
        f.flush()
        os.fsync(f.fileno())
    final = os.path.join(d, f"{version:012d}.json")
    try:
        os.link(tmp, final)
    except FileExistsError:
        raise CommitConflict(
            f"version {version} of {path!r} was committed concurrently"
        ) from None
    finally:
        os.unlink(tmp)


def _write_txn_files(df: DataFrame, path: str) -> list[str]:
    """Write `df` as a new immutable transaction directory; return the
    manifest-relative paths of the parquet files produced."""
    txn = os.path.join(_DATA, f"txn-{uuid.uuid4().hex}")
    df.write.mode("error").parquet(os.path.join(path, txn))
    out = sorted(
        os.path.join(txn, f)
        for f in os.listdir(os.path.join(path, txn))
        if f.endswith(".parquet") and not f.startswith((".", "_"))
    )
    return out


def create_table(df: DataFrame, path: str) -> int:
    """Create a snapshot table at `path` from `df` (version 0)."""
    if _list_versions(path):
        raise ValueError(f"table already exists: {path!r}")
    os.makedirs(_commits_dir(path), exist_ok=True)
    os.makedirs(os.path.join(path, _DATA), exist_ok=True)
    files = _write_txn_files(df, path)
    _publish(
        path,
        0,
        {
            "version": 0,
            "op": "create",
            "files": files,
            "schema": df.schema.jsonValue(),
            "app_ids": {},
        },
    )
    return 0


def read_snapshot(
    spark: SparkSession, path: str, version: int | None = None
) -> DataFrame:
    """Read one committed version (latest by default — time travel by
    passing an older `version`). The returned DataFrame is pinned to
    that snapshot's immutable files: later commits never change what
    it reads (vacuum of still-referenced versions is the only way to
    invalidate it)."""
    v = latest_version(path) if version is None else version
    manifest = _load_manifest(path, v)
    schema = StructType.fromJson(manifest["schema"])
    files = [os.path.join(path, f) for f in manifest["files"]]
    if not files:
        return spark.createDataFrame([], schema)
    return spark.read.schema(schema).parquet(*files)


def append_table(df: DataFrame, path: str) -> int:
    """Append rows as a new version (no rewrite of existing files)."""
    v = latest_version(path)
    manifest = _load_manifest(path, v)
    files = _write_txn_files(df, path)
    new = {
        "version": v + 1,
        "op": "append",
        "files": manifest["files"] + files,
        "schema": manifest["schema"],
        "app_ids": manifest.get("app_ids", {}),
    }
    _publish(path, v + 1, new)
    return v + 1


def _file_uri_to_rel(path: str, uri: str) -> str:
    """Map an input_file_name() URI back to a manifest-relative path."""
    p = unquote(urlparse(uri).path)
    return os.path.relpath(p, os.path.abspath(path))


def _touched_files(
    snap_files: list[str], path: str, spark: SparkSession, matcher
) -> list[str]:
    """Manifest-relative paths of the files containing rows selected by
    `matcher` (df -> filtered df). Driver-side size is O(#files) —
    metadata, not data."""
    if not snap_files:
        return []
    df = spark.read.parquet(*[os.path.join(path, f) for f in snap_files])
    tagged = matcher(df.withColumn("__file", F.input_file_name()))
    uris = [r["__file"] for r in tagged.select("__file").distinct().collect()]
    rel = {_file_uri_to_rel(path, u) for u in uris}
    # resolve through the manifest list so the returned names are the
    # manifest's own strings (realpath/symlink differences can make
    # relpath disagree byte-for-byte)
    by_base = {os.path.basename(f): f for f in snap_files}
    return sorted(by_base[os.path.basename(r)] for r in rel)


def merge_into(
    spark: SparkSession,
    path: str,
    updates: DataFrame,
    key: list[str],
    app_id: tuple[str, int] | None = None,
) -> dict:
    """MERGE by key with snapshot isolation: existing rows whose key
    appears in `updates` are replaced, new keys inserted — as ONE
    atomic commit. Only data files that actually contain a matched key
    are rewritten (found via an input_file_name semi-join, so a
    selective merge into a huge table touches O(matched files), not
    the table). Readers of the previous version are unaffected.

    `app_id=(ledger_key, batch_id)` gives exactly-once semantics to
    replayed writers (streaming foreachBatch): the pair is recorded IN
    the same manifest as the data, so either both the merge and its
    ledger entry are visible or neither is — a redelivered batch whose
    id is already recorded is skipped. Raises CommitConflict if a
    concurrent writer commits first (caller retries on the new latest).

    Semantics notes: rows in `updates` sharing a key ALL land (replace-
    with-provided-rows, not Delta's multiple-match error — pre-aggregate
    if one-row-per-key matters). `updates`' lineage is consumed up to
    three times (key derivation for the semi/anti joins + the write);
    callers with an expensive update pipeline should persist() it.
    """
    v = latest_version(path)
    manifest = _load_manifest(path, v)
    app_ids = dict(manifest.get("app_ids", {}))
    if app_id is not None and app_ids.get(app_id[0], -1) >= app_id[1]:
        return {"version": v, "skipped": True, "files_rewritten": 0}

    keys = updates.select(*key).distinct()
    touched = _touched_files(
        manifest["files"], path, spark, lambda df: df.join(keys, key, "left_semi")
    )
    untouched = [f for f in manifest["files"] if f not in set(touched)]
    if touched:
        kept = spark.read.parquet(
            *[os.path.join(path, f) for f in touched]
        ).join(keys, key, "left_anti")
        to_write = kept.unionByName(updates)
    else:
        to_write = updates
    files = _write_txn_files(to_write, path)
    if app_id is not None:
        app_ids[app_id[0]] = app_id[1]
    new = {
        "version": v + 1,
        "op": "merge",
        "files": untouched + files,
        "schema": manifest["schema"],
        "app_ids": app_ids,
    }
    _publish(path, v + 1, new)
    return {
        "version": v + 1,
        "skipped": False,
        "files_rewritten": len(touched),
        "files_untouched": len(untouched),
    }


def delete_where(spark: SparkSession, path: str, predicate: str) -> int:
    """Delete rows matching a SQL predicate, snapshot-isolated. Only
    files containing a matching row are rewritten (their keep-side);
    all other files carry over untouched. Returns rows deleted."""
    v = latest_version(path)
    manifest = _load_manifest(path, v)
    touched = _touched_files(
        manifest["files"], path, spark, lambda df: df.filter(predicate)
    )
    deleted = 0
    files: list[str] = []
    if touched:
        hit = spark.read.parquet(*[os.path.join(path, f) for f in touched])
        kept = hit.filter(f"NOT ({predicate})")
        deleted = hit.count() - kept.count()
        files = _write_txn_files(kept, path)
    new = {
        "version": v + 1,
        "op": "delete",
        "files": [f for f in manifest["files"] if f not in set(touched)] + files,
        "schema": manifest["schema"],
        "app_ids": manifest.get("app_ids", {}),
    }
    _publish(path, v + 1, new)
    return deleted


def compact_table(spark: SparkSession, path: str, target_files: int) -> int:
    """Rewrite the current snapshot into `target_files` files as a new
    version (readers of old versions keep their snapshot)."""
    v = latest_version(path)
    manifest = _load_manifest(path, v)
    df = read_snapshot(spark, path, v).repartition(target_files)
    files = _write_txn_files(df, path)
    _publish(
        path,
        v + 1,
        {
            "version": v + 1,
            "op": "compact",
            "files": files,
            "schema": manifest["schema"],
            "app_ids": manifest.get("app_ids", {}),
        },
    )
    return v + 1


def history(path: str) -> list[dict]:
    """Commit log: one {version, op, n_files} summary per version."""
    return [
        {
            "version": v,
            "op": _load_manifest(path, v)["op"],
            "n_files": len(_load_manifest(path, v)["files"]),
        }
        for v in _list_versions(path)
    ]


def vacuum_table(path: str, keep_versions: int = 1) -> int:
    """Drop manifests older than the newest `keep_versions` and delete
    every data file no retained manifest references (including orphans
    from crashed transactions that never committed). Returns the
    number of txn directories removed. Time travel reaches only
    retained versions afterwards."""
    versions = _list_versions(path)
    keep = versions[-max(keep_versions, 1) :]
    referenced: set[str] = set()
    for v in keep:
        for f in _load_manifest(path, v)["files"]:
            referenced.add(f.split(os.sep)[1])  # data/<txn>/part -> <txn>
    for v in versions:
        if v not in keep:
            os.unlink(os.path.join(_commits_dir(path), f"{v:012d}.json"))
    removed = 0
    data_dir = os.path.join(path, _DATA)
    for txn in os.listdir(data_dir):
        if txn not in referenced:
            shutil.rmtree(os.path.join(data_dir, txn))
            removed += 1
    return removed
