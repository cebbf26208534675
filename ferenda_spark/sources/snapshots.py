"""Iceberg-lite snapshot layer over plain Parquet: versioned manifests,
atomic commits, time travel, snapshot expiry.

The north_star materializes the graph as "partitioned Iceberg triple
tables"; the catalog seam (sources/catalog.py) already routes IO to real
Iceberg when the runtime has the jars. This module supplies the three
Iceberg behaviors the PLAIN-PARQUET mode otherwise lacks, with the same
public-knowledge design Iceberg documents (a table is a log of immutable
snapshots; each snapshot is a manifest naming immutable data files; readers
pin a snapshot; commits publish a new manifest atomically):

Layout (all under the table root):

    data/v00003-<token>/part-*.parquet   immutable per-commit file groups
                                         (partitionBy dirs nest inside)
    snapshots/v00003.json                manifest: version, parent, mode,
                                         list of live commit dirs, stats

* **Atomic commit, crash-safe**: data files land first (under the commit
  dir, invisible to readers — no manifest names them yet); the manifest is
  then written to a ``.tmp`` sibling and RENAMED in. Rename is the atomic
  primitive (same as catalog.swap_in); a crash before the rename leaves an
  orphan data dir that ``expire_snapshots`` garbage-collects, never a
  half-visible table. Optimistic concurrency: rename refuses to clobber an
  existing ``vN.json``, so a racing writer's commit retries at N+1.
* **Snapshot isolation / time travel**: ``read_snapshot(..., version=k)``
  reads exactly the commit dirs manifest k names. ``append`` manifests
  carry the parent's dirs plus the new one; ``overwrite`` manifests name
  only the new one — the superseded files stay on disk so older versions
  keep reading until expired.
* **Expiry**: ``expire_snapshots(keep_last=k)`` drops manifests older than
  the newest k and deletes data dirs no surviving manifest references
  (including orphans from crashed commits).

Partitioned commits write ``partitionBy`` dirs inside the commit dir;
reads restore partition columns per commit dir (``basePath`` = that dir)
and union, so partition pruning still reaches every scan. At 100 TB the
manifest is vocabulary-sized (one entry per commit, not per file) and every
data byte is written exactly once per commit — no table-sized rewrite on
append, which is the property the incremental pipeline needs.

Single JSON manifests (not Iceberg's manifest-list indirection) keep this
honest about being a stand-in: swap to real Iceberg via the catalog seam
for production metadata scaling.
"""

from __future__ import annotations

import json
import uuid
from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _fs(spark: SparkSession, path: str):
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    return hpath.getFileSystem(spark._jsc.hadoopConfiguration()), hpath, jvm


def _list_manifests(spark: SparkSession, root: str) -> list[int]:
    fs, hpath, jvm = _fs(spark, f"{root}/snapshots")
    if not fs.exists(hpath):
        return []
    out = []
    for st in fs.listStatus(hpath):
        name = st.getPath().getName()
        if name.startswith("v") and name.endswith(".json"):
            try:
                out.append(int(name[1:-5]))
            except ValueError:
                continue
    return sorted(out)


def _read_manifest(spark: SparkSession, root: str, version: int) -> dict:
    fs, hpath, jvm = _fs(spark, f"{root}/snapshots/v{version:05d}.json")
    if not fs.exists(hpath):
        raise FileNotFoundError(f"no snapshot v{version} under {root}")
    stream = fs.open(hpath)
    try:
        data = jvm.org.apache.commons.io.IOUtils.toByteArray(stream)
    finally:
        stream.close()
    return json.loads(bytes(data).decode("utf-8"))


def current_version(spark: SparkSession, root: str) -> int:
    """Newest committed snapshot version (0 = empty table)."""
    versions = _list_manifests(spark, root)
    return versions[-1] if versions else 0


def snapshot_history(spark: SparkSession, root: str) -> list[dict]:
    """All manifests, oldest first — the table's commit log."""
    return [
        _read_manifest(spark, root, v) for v in _list_manifests(spark, root)
    ]


def commit_snapshot(
    df: DataFrame,
    root: str,
    mode: str = "append",
    partition_by: tuple[str, ...] = (),
    meta: dict | None = None,
) -> int:
    """Publish ``df`` as a new snapshot; returns the new version.

    ``append`` keeps the parent snapshot's commit dirs live; ``overwrite``
    starts the file list fresh. Data is durable before the manifest rename
    makes it visible; the rename's refusal to clobber gives last-writer-
    retries optimistic concurrency. ``meta`` is recorded verbatim in the
    manifest (e.g. a streaming batch_id for replay dedup)."""
    if mode not in ("append", "overwrite"):
        raise ValueError(f"mode={mode!r}; expected append|overwrite")
    spark = df.sparkSession
    fs, _, jvm = _fs(spark, root)

    token = uuid.uuid4().hex[:12]
    for _attempt in range(10):
        parent = current_version(spark, root)
        version = parent + 1
        commit_rel = f"data/v{version:05d}-{token}"
        w = df.write.mode("errorifexists")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(f"{root}/{commit_rel}")

        dirs = [commit_rel]
        if mode == "append" and parent > 0:
            dirs = _read_manifest(spark, root, parent)["dirs"] + dirs
        manifest = {
            "version": version,
            "parent": parent,
            "mode": mode,
            "dirs": dirs,
            "partition_by": list(partition_by),
            "meta": meta or {},
        }
        tmp = jvm.org.apache.hadoop.fs.Path(
            f"{root}/snapshots/.v{version:05d}.{token}.tmp"
        )
        final = jvm.org.apache.hadoop.fs.Path(
            f"{root}/snapshots/v{version:05d}.json"
        )
        fs.mkdirs(tmp.getParent())
        out = fs.create(tmp, False)
        try:
            out.write(bytearray(json.dumps(manifest).encode("utf-8")))
        finally:
            out.close()
        if fs.exists(final):
            renamed = False  # racing writer won this version
        else:
            renamed = fs.rename(tmp, final)
        if renamed:
            return version
        # lost the race: drop our tmp manifest + data dir, retry on top of
        # whatever version the winner published
        fs.delete(tmp, True)
        fs.delete(jvm.org.apache.hadoop.fs.Path(f"{root}/{commit_rel}"), True)
    raise IOError(f"could not commit to {root} after 10 attempts")


def read_snapshot(
    spark: SparkSession, root: str, version: int | None = None
) -> DataFrame:
    """The table as of ``version`` (default: newest). Each commit dir is
    read with itself as basePath so partitionBy columns are restored, then
    the dirs union — filters on partition columns still prune every scan."""
    v = version if version is not None else current_version(spark, root)
    if v == 0:
        raise FileNotFoundError(f"{root} has no committed snapshots")
    manifest = _read_manifest(spark, root, v)
    frames = [
        spark.read.option("basePath", f"{root}/{d}").parquet(f"{root}/{d}")
        for d in manifest["dirs"]
    ]
    return reduce(DataFrame.unionByName, frames)


def expire_snapshots(
    spark: SparkSession, root: str, keep_last: int = 1
) -> dict:
    """Drop all but the newest ``keep_last`` manifests and delete every
    data dir no surviving manifest references — including orphan dirs from
    crashed commits (durable data that never got a manifest). Returns
    {expired_versions, deleted_dirs}."""
    if keep_last < 1:
        raise ValueError("keep_last must be >= 1")
    versions = _list_manifests(spark, root)
    keep, drop = versions[-keep_last:], versions[:-keep_last]
    live: set[str] = set()
    for v in keep:
        live.update(_read_manifest(spark, root, v)["dirs"])
    fs, _, jvm = _fs(spark, root)
    deleted = []
    data_path = jvm.org.apache.hadoop.fs.Path(f"{root}/data")
    if fs.exists(data_path):
        for st in fs.listStatus(data_path):
            rel = f"data/{st.getPath().getName()}"
            if rel not in live:
                fs.delete(st.getPath(), True)
                deleted.append(rel)
    for v in drop:
        fs.delete(
            jvm.org.apache.hadoop.fs.Path(f"{root}/snapshots/v{v:05d}.json"),
            True,
        )
    return {"expired_versions": drop, "deleted_dirs": sorted(deleted)}


def snapshot_diff(
    spark: SparkSession, root: str, v_from: int, v_to: int
) -> DataFrame:
    """Row-level diff between two snapshot versions of the same table:
    the Iceberg-style "what changed between commits" primitive that turns
    the versioned triple store into an incremental feed (downstream
    consumers — index maintainers, replication, cache invalidation —
    process the delta, never the 100 TB table).

    Returns the union of rows only in ``v_to`` (``change='added'``) and
    rows only in ``v_from`` (``change='removed'``), with the table's own
    columns intact. Multiset semantics (``exceptAll``): a row whose
    duplicate count went 3→1 shows up twice as removed — count-preserving,
    which plain EXCEPT would silently collapse.

    Scale shape: two hash-aggregate anti-set-ops on the full row as key —
    one shuffle each, AQE-splittable; with ``mode='append'`` histories the
    common prefix of commit dirs is identical files, so Spark's scan reuse
    keeps the real cost proportional to the divergent commits.
    """
    old = read_snapshot(spark, root, version=v_from)
    new = read_snapshot(spark, root, version=v_to)
    added = new.exceptAll(old).withColumn("change", F.lit("added"))
    removed = old.exceptAll(new).withColumn("change", F.lit("removed"))
    return added.unionByName(removed)
