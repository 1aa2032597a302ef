"""Snapshot-committed state tables — Iceberg-layout over parquet.

No Iceberg runtime jars exist in this sandbox, so this module
implements the minimal slice of the Iceberg table spec the frontier
needs, with the same guarantees:

* atomic commits   — data files land first, then a JSON manifest is
  renamed into place (``os.replace`` is atomic on POSIX). A reader
  either sees snapshot v(n) or v(n+1), never a torn mix — exactly the
  crash-safety the reference gets from its tmp+shutil.move CSV rewrite
  (download_filings.py:196-215), but per-snapshot instead of per-row.
* snapshot history — every commit is a manifest ``v{n}.json`` holding
  the full file list, parent pointer, per-commit metrics and lineage;
  resuming = reading LATEST (kill-and-resume safe).
* time travel      — ``read(version=k)`` reads any retained snapshot.

On a real cluster, swap this class for ``spark.table("catalog.db.t")``
with Iceberg's own commit protocol; every call site uses only
append/overwrite/read so the swap is mechanical.
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


class SnapshotTable:
    def __init__(self, root: str):
        self.root = root
        self._snap_dir = os.path.join(root, "_snapshots")
        os.makedirs(self._snap_dir, exist_ok=True)
        os.makedirs(os.path.join(root, "data"), exist_ok=True)

    # ---- manifest plumbing -------------------------------------------------
    def _latest_path(self) -> str:
        return os.path.join(self._snap_dir, "LATEST")

    def current_version(self) -> int:
        try:
            with open(self._latest_path()) as f:
                return int(f.read().strip())
        except FileNotFoundError:
            return 0

    def _manifest(self, version: int) -> dict:
        if version == 0:
            return {"version": 0, "files": [], "metrics": {}, "parent": None}
        with open(os.path.join(self._snap_dir, f"v{version:06d}.json")) as f:
            return json.load(f)

    def _commit(self, files: list[str], mode: str, metrics: dict, lineage: dict) -> int:
        parent = self.current_version()
        prev = self._manifest(parent)["files"] if mode == "append" else []
        version = parent + 1
        manifest = {
            "version": version,
            "parent": parent,
            "mode": mode,
            "files": prev + files,
            "metrics": metrics,
            "lineage": lineage,
            "ts": time.time(),
        }
        mpath = os.path.join(self._snap_dir, f"v{version:06d}.json")
        tmp = mpath + ".tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, mpath)  # atomic
        ltmp = self._latest_path() + ".tmp"
        with open(ltmp, "w") as f:
            f.write(str(version))
        os.replace(ltmp, self._latest_path())  # atomic pointer swap
        return version

    # ---- public API --------------------------------------------------------
    def latest_metrics(self) -> dict:
        """The metrics dict of the newest commit ({} before the first
        one) — lets writers stamp and re-read idempotence tokens."""
        return self._manifest(self.current_version()).get("metrics", {})

    def append(
        self,
        df: DataFrame,
        metrics: dict | None = None,
        lineage: dict | None = None,
        partition_by: list[str] | None = None,
    ) -> int:
        return self._write(df, "append", metrics, lineage, partition_by)

    def overwrite(
        self,
        df: DataFrame,
        metrics: dict | None = None,
        lineage: dict | None = None,
        partition_by: list[str] | None = None,
    ) -> int:
        return self._write(df, "overwrite", metrics, lineage, partition_by)

    def _write(self, df: DataFrame, mode: str, metrics, lineage, partition_by=None) -> int:
        rel = os.path.join("data", uuid.uuid4().hex)
        path = os.path.join(self.root, rel)
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(path)
        m = dict(metrics or {})
        return self._commit([rel], mode, m, lineage or {})

    def read(self, spark: SparkSession, version: int | None = None) -> DataFrame | None:
        """None when the table has no committed snapshot yet."""
        v = self.current_version() if version is None else version
        files = self._manifest(v)["files"]
        if not files:
            return None
        return spark.read.parquet(*[os.path.join(self.root, f) for f in files])

    def pruned_paths(self, column: str, values: list) -> list[str]:
        """Directory list for a partition-pruned read of a table whose
        commits were written with ``append(partition_by=[column])``:
        only the hive-layout subdirectories (``column=value``) for the
        requested values, across every committed data dir.  Listing is
        O(commits × len(values)) stat calls — never a table scan."""
        import glob

        dirs = []
        for f in self._manifest(self.current_version())["files"]:
            root = os.path.join(self.root, f)
            if not glob.glob(os.path.join(root, f"{column}=*")):
                if not glob.glob(os.path.join(root, "*.parquet")):
                    # empty commit (just _SUCCESS): nothing to prune or
                    # lose — skip the dir
                    continue
                # a data dir with ROWS but no hive subdirs for this
                # column (e.g. a flat compact() of a partitioned table)
                # would make pruning silently drop them — fail loud;
                # layout-preserving compaction is the supported path
                raise ValueError(
                    f"data dir {root} has no {column}= partitions — the table "
                    "mixes flat and hive layouts; rewrite it with a "
                    "partition-preserving compaction before pruned reads"
                )
            for v in values:
                leaf = os.path.join(root, f"{column}={v}")
                if os.path.isdir(leaf):
                    dirs.append(leaf)
        return dirs

    def read_pruned(self, spark: SparkSession, column: str, values: list) -> DataFrame | None:
        """Partition-pruned read: only the files under the touched
        partition values are planned/scanned — per-batch input is
        proportional to TOUCHED partitions, never to the whole table.
        The partition column itself is not returned (it lives in the
        directory name; callers that need it re-derive it, since it is
        a pure function of the data columns).  None when nothing
        matches."""
        dirs = self.pruned_paths(column, values)
        if not dirs:
            return None
        return spark.read.parquet(*dirs)

    def read_flat(self, spark: SparkSession, version: int | None = None) -> DataFrame | None:
        """Full read of a hive-partitioned table (``append(partition_by=
        ...)``) WITHOUT restoring the partition columns: recursive file
        listing sidesteps Spark's multi-root partition-discovery
        conflict (each commit is its own hive root).  Use when the
        partition column is a derivable function of the data columns."""
        v = self.current_version() if version is None else version
        files = self._manifest(v)["files"]
        if not files:
            return None
        return (
            spark.read.option("recursiveFileLookup", "true")
            .parquet(*[os.path.join(self.root, f) for f in files])
        )

    def read_since(self, spark: SparkSession, version: int) -> DataFrame | None:
        """Incremental consumption: ONLY the rows committed after
        ``version`` (the Iceberg incremental-scan idea). For an
        append-only history this is the file-set difference between
        the manifests — per-pass input is proportional to NEW data,
        never to the 10^10-row table. Returns None when nothing is
        new. Raises if a non-append commit (overwrite/compact)
        intervened — file identity no longer maps to row novelty, and
        the caller must fall back to a full read + logical diff."""
        cur = self.current_version()
        if version >= cur:
            return None
        for v in range(version + 1, cur + 1):
            if self._manifest(v).get("mode") != "append":
                raise ValueError(
                    f"non-append commit v{v} ({self._manifest(v).get('mode')}) "
                    f"inside read_since({version}) window — fall back to a "
                    "full read"
                )
        old_files = set(self._manifest(version)["files"]) if version else set()
        new_files = [f for f in self._manifest(cur)["files"] if f not in old_files]
        if not new_files:
            return None
        return spark.read.parquet(*[os.path.join(self.root, f) for f in new_files])

    def read_or_empty(self, spark: SparkSession, schema: StructType, version: int | None = None) -> DataFrame:
        df = self.read(spark, version)
        return df if df is not None else spark.createDataFrame([], schema)

    def compact(self, spark: SparkSession, target_partitions: int | None = None) -> int:
        """Rewrite the table to one data dir (an OPTIMIZE/rewrite-files
        commit): at 10^10 scale a seen-table accumulating one appended
        dir per wave degrades scan planning — compaction folds N dirs
        into one without changing snapshot semantics (history keeps the
        old manifests)."""
        df = self.read(spark)
        if df is None:
            return self.current_version()
        if target_partitions:
            df = df.repartition(target_partitions)
        return self.overwrite(df, metrics={"compaction": True})

    def rollback(self, version: int, metrics: dict | None = None) -> int:
        """Commit a new snapshot whose file list is snapshot ``version``'s
        — an O(1) manifest operation (no data rewrite), used by crash
        recovery to drop a partially-committed wave. History is
        preserved: the abandoned snapshot stays readable via time
        travel; only LATEST moves."""
        files = self._manifest(version)["files"]
        m = {"rollback_to": version, **(metrics or {})}
        return self._commit(list(files), "rollback", m, {})

    def latest_manifest(self) -> dict:
        return self._manifest(self.current_version())

    def history(self) -> list[dict]:
        out, v = [], self.current_version()
        while v:
            m = self._manifest(v)
            out.append(m)
            v = m["parent"] or 0
        return list(reversed(out))
