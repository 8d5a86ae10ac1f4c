"""Manifest-pinned versioned parquet tables (minimal lakehouse
time-travel, Iceberg-flavored).

A `SnapshotTable` is a directory of immutable parquet data files plus a
chain of JSON manifests, one per committed version.  A manifest is the
COMPLETE list of data files visible at that version — readers never
list the data directory, they read exactly the manifest's files, so:

* **time travel**: `read(spark, version=2)` reproduces version 2
  byte-for-byte forever, regardless of later commits;
* **atomic commits**: a crash mid-write leaves orphan data files but no
  manifest, so readers never see a partial commit (manifest write is a
  single atomic rename);
* **scale**: the manifest lists files, not rows — at 100 TB the same
  design holds (Iceberg adds manifest *trees* beyond ~10⁵ files; the
  swap-point is `_load_manifest`/`_write_manifest`).

Append commits reference the parent's files plus the new ones;
overwrite commits reference only the new ones.  Old versions stay
readable until an explicit `expire()` (not implemented — retention
policy is deployment-specific).
"""

from __future__ import annotations

import json
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession


class SnapshotTable:
    """A versioned parquet table rooted at ``base`` (local or DFS path
    via the driver-visible filesystem; on a cluster, swap the `os` calls
    for the Hadoop FileSystem API at the marked seams)."""

    def __init__(self, base: str) -> None:
        self.base = base
        self.manifest_dir = os.path.join(base, "_manifests")
        os.makedirs(self.manifest_dir, exist_ok=True)

    # -- manifest I/O (the Hadoop-FS swap point) --------------------
    def _manifest_path(self, version: int) -> str:
        return os.path.join(self.manifest_dir, f"v{version:06d}.json")

    def _write_manifest(self, version: int, manifest: dict) -> None:
        # temp-file + rename = atomic publish on POSIX; on object
        # stores use a conditional PUT instead.
        fd, tmp = tempfile.mkstemp(dir=self.manifest_dir, suffix=".tmp")
        with os.fdopen(fd, "w") as f:
            json.dump(manifest, f, indent=1, sort_keys=True)
        os.rename(tmp, self._manifest_path(version))

    def _load_manifest(self, version: int) -> dict:
        with open(self._manifest_path(version)) as f:
            return json.load(f)

    # -- public API -------------------------------------------------
    def versions(self) -> list[int]:
        return sorted(
            int(n[1:-5])
            for n in os.listdir(self.manifest_dir)
            if n.startswith("v") and n.endswith(".json")
        )

    def current_version(self) -> int | None:
        vs = self.versions()
        return vs[-1] if vs else None

    def commit(self, df: DataFrame, mode: str = "append") -> int:
        """Write ``df``'s rows as new immutable data files and publish
        the next manifest.  ``mode='append'`` keeps the parent's files
        visible; ``mode='overwrite'`` starts the file list fresh (the
        old files stay on disk for time travel)."""
        if mode not in ("append", "overwrite"):
            raise ValueError(f"unknown commit mode: {mode}")
        parent = self.current_version()
        version = 0 if parent is None else parent + 1
        data_dir = os.path.join(self.base, "data", f"v{version:06d}")
        df.write.mode("errorifexists").parquet(data_dir)
        new_files = sorted(
            os.path.join(data_dir, n)
            for n in os.listdir(data_dir)
            if n.endswith(".parquet")
        )
        files = list(new_files)
        if mode == "append" and parent is not None:
            files = self._load_manifest(parent)["files"] + files
        self._write_manifest(
            version,
            {
                "version": version,
                "parent": parent,
                "mode": mode,
                "files": files,
                "n_files": len(files),
            },
        )
        return version

    def read(
        self, spark: SparkSession, version: int | None = None
    ) -> DataFrame:
        """Read the table as of ``version`` (default: latest).  The
        scan is pinned to the manifest's exact file list — a plain
        multi-path parquet read, so pushdown/pruning/AQE all apply."""
        if version is None:
            version = self.current_version()
        if version is None:
            raise ValueError(f"no committed versions at {self.base}")
        files = self._load_manifest(version)["files"]
        return spark.read.parquet(*files)
