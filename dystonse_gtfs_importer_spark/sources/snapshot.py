"""Snapshot-atomic parquet tables: a minimal table-format commit
protocol for the streaming merge (VERDICT r2 item 5).

Plain dynamic-partition overwrite rewrites partition directories in
place, so a reader listing files DURING a multi-partition batch can
see partition A new and partition B old (or half-written files).  The
fix is the same idea Delta/Iceberg use, reduced to its core:

* data files are IMMUTABLE and uniquely named under ``<root>/data/``
  (hive-style partition dirs, so partition pruning still works);
* the current table state is the file list in ``<root>/MANIFEST``
  (JSON), and readers resolve the table THROUGH the manifest;
* a commit stages new files under ``<root>/_staging/<uuid>/`` (never
  referenced), moves them into ``data/``, then publishes by writing
  ``MANIFEST.tmp`` and ``os.replace``-ing it over ``MANIFEST`` —
  atomic on POSIX, so every reader sees the whole batch or none of it;
* replaced files stay on disk until :meth:`vacuum`, giving in-flight
  readers of the previous snapshot a consistent view (time travel for
  free: a reader holding the old manifest is unaffected).

Micro-batch replay safety (ST3): the manifest records the last
committed ``batch_id``; re-committing the same id is a no-op, so a
foreachBatch retry after a sink crash leaves the table byte-identical
(the reference's batched-statement retry semantics,
/root/reference/src/importer/batched_statements.rs).

On a 1000-executor cluster the commit is driver-side metadata only:
file moves are per-touched-partition renames on the same filesystem
(object stores: copy-free pointer swap via the manifest), and the
manifest scales with file count, which `compact_partitions`
(sources/store.py) keeps bounded.
"""

from __future__ import annotations

import json
import os
import uuid
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

MANIFEST = "MANIFEST"


class SnapshotStore:
    """A partitioned parquet table published through an atomic
    manifest.  ``partition_cols`` are hive-encoded in data paths."""

    def __init__(self, root: str, partition_cols: list[str]):
        self.root = Path(root)
        self.partition_cols = list(partition_cols)
        self.data_dir = self.root / "data"
        self.staging_dir = self.root / "_staging"

    # -- manifest ----------------------------------------------------

    def manifest(self) -> dict | None:
        path = self.root / MANIFEST
        if not path.exists():
            return None
        return json.loads(path.read_text())

    def last_batch_id(self) -> int | None:
        m = self.manifest()
        return None if m is None else m.get("batch_id")

    def _publish(self, manifest: dict) -> None:
        tmp = self.root / f"{MANIFEST}.tmp.{uuid.uuid4().hex}"
        tmp.write_text(json.dumps(manifest, indent=1, sort_keys=True))
        os.replace(tmp, self.root / MANIFEST)  # the atomic commit point

    # -- read --------------------------------------------------------

    def _files(self, predicate=None) -> list[str]:
        m = self.manifest()
        if m is None:
            return []
        return [str(self.data_dir / e["path"]) for e in m["files"]
                if predicate is None or predicate(e["partition"])]

    def read(self, spark: SparkSession, predicate=None) -> DataFrame | None:
        """The current snapshot as a DataFrame; ``predicate`` receives
        each file's partition-value dict for manifest-level pruning
        (no filesystem listing, no footer reads for pruned files)."""
        files = self._files(predicate)
        if not files:
            return None
        return (spark.read.option("basePath", str(self.data_dir))
                .parquet(*files))

    def read_partitions(self, spark: SparkSession,
                        **values) -> DataFrame | None:
        """Manifest-pruned read: ``values`` maps partition column →
        allowed value or list of values."""
        allow = {k: ({str(x) for x in v}
                     if isinstance(v, (list, tuple, set)) else {str(v)})
                 for k, v in values.items()}  # hive paths store strings

        def pred(part: dict) -> bool:
            return all(part.get(k) in vs for k, vs in allow.items())

        return self.read(spark, pred)

    # -- commit ------------------------------------------------------

    def commit(self, merged: DataFrame, batch_id: int | None = None,
               extra: dict | None = None) -> bool:
        """Publish ``merged`` as the NEW full content of every
        partition it contains; other partitions carry over unchanged.
        Returns False (no-op) when ``batch_id`` was already committed
        — the replay guard that makes foreachBatch retries exactly-
        once at the table level.

        ``extra`` (optional, JSON-serializable) is stored on the
        manifest under reserved-key protection — e.g. the per-shard
        token counts and content fingerprints a training loader reads
        without touching data files."""
        if batch_id is not None and batch_id == self.last_batch_id():
            return False
        self.root.mkdir(parents=True, exist_ok=True)
        stage = self.staging_dir / uuid.uuid4().hex
        (merged.repartition(*self.partition_cols)
         .write.partitionBy(*self.partition_cols)
         .parquet(str(stage)))

        # move staged files into data/ under their hive dirs; Spark's
        # part-<n>-<job-uuid> names are globally unique, so files are
        # immutable-once-placed and never collide
        new_entries: list[dict] = []
        for f in sorted(stage.rglob("*.parquet")):
            rel = f.relative_to(stage)
            part = dict(
                p.split("=", 1) for p in rel.parent.parts if "=" in p)
            dest = self.data_dir / rel
            dest.parent.mkdir(parents=True, exist_ok=True)
            os.rename(f, dest)
            new_entries.append({"path": str(rel), "partition": part})
        touched = {tuple(sorted(e["partition"].items()))
                   for e in new_entries}

        old = self.manifest() or {"version": 0, "files": []}
        carried = [e for e in old["files"]
                   if tuple(sorted(e["partition"].items())) not in touched]
        manifest = {
            "version": old["version"] + 1,
            "batch_id": batch_id,
            "files": carried + new_entries,
        }
        if extra:
            clash = set(extra) & set(manifest)
            if clash:
                raise ValueError(f"extra keys clash with manifest: {clash}")
            manifest.update(extra)
        self._publish(manifest)
        # staged dir now holds only _SUCCESS/metadata; drop it
        import shutil

        shutil.rmtree(stage, ignore_errors=True)
        return True

    # -- maintenance -------------------------------------------------

    def vacuum(self, grace_s: float = 3600.0) -> int:
        """Delete data files no snapshot references (files replaced by
        earlier commits and any crashed staging dirs).  Run OUTSIDE
        the window where readers may still hold an old manifest.

        ``grace_s`` protects WRITERS too: a concurrent ``commit()``
        moves files into data/ *before* publishing the manifest, so an
        unreferenced-but-young file may belong to an in-flight commit —
        files modified within the grace window are never deleted (the
        same retention rule table formats apply).  Pass 0 only when no
        writer can be active."""
        import shutil
        import time

        live = {str(self.data_dir / e["path"])
                for e in (self.manifest() or {"files": []})["files"]}
        cutoff = time.time() - grace_s
        removed = 0
        if self.data_dir.exists():
            for f in self.data_dir.rglob("*.parquet"):
                if str(f) not in live and f.stat().st_mtime < cutoff:
                    f.unlink()
                    removed += 1
        if self.staging_dir.exists() and grace_s <= 0:
            shutil.rmtree(self.staging_dir, ignore_errors=True)
        elif self.staging_dir.exists():
            for d in self.staging_dir.iterdir():
                if d.stat().st_mtime < cutoff:
                    shutil.rmtree(d, ignore_errors=True)
        return removed
