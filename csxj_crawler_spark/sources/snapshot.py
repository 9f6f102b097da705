"""Iceberg-style snapshot/manifest table layer (SURVEY.md §1.3, S2/S6/S7).

No Iceberg jar ships in this sandbox (verified: /opt/spark jars contain none,
no network), so this implements the Iceberg *design* from the public spec:

* data files are immutable parquet files under ``<table>/data/``;
* every commit writes a new manifest ``<table>/_snapshots/v{N}.json`` listing
  ALL live data files (with partition values + row counts), its parent
  snapshot id, and free-form ``meta`` (engine checkpoint state lives here);
* the manifest write is a tmp-file + ``os.rename`` — atomic on POSIX, so a
  crash mid-commit leaves the previous snapshot intact (checkpoint-resume,
  BASELINE.json:14);
* readers open a *specific snapshot* (default: latest) and can prune the
  file list by partition values **before** Spark ever lists anything
  (manifest-level partition pruning, like Iceberg's manifest filtering).

The reference kept a filesystem JSON "db" with per-provider/day/batch dirs
(SURVEY.md §1.1 [M csxj/db/provider.py]); this layer is its columnar,
snapshot-isolated analogue.  Swappable for real Iceberg: same logical schema.
"""

from __future__ import annotations

import json
import os
import re
import shutil
import uuid

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession

_PART_RE = re.compile(r"([A-Za-z0-9_]+)=([^/]+)/")


class SnapshotStore:
    """A directory of snapshot-versioned parquet tables."""

    def __init__(self, root: str, write_tasks: int | None = None):
        """``write_tasks`` caps the shuffle width of partitioned commit
        writes (AQE cannot coalesce an explicit ``repartition(cols)``, so
        wave-sized commits would otherwise pay full-width task overhead).
        ``None`` uses ``spark.sql.shuffle.partitions``.  Size it to the
        expected commit volume: ~8 for bench-scale waves, hundreds on a
        real cluster."""
        self.root = root
        self.write_tasks = write_tasks
        os.makedirs(root, exist_ok=True)

    # -- paths --------------------------------------------------------------
    def _tdir(self, table: str) -> str:
        return os.path.join(self.root, table)

    def _snap_dir(self, table: str) -> str:
        return os.path.join(self._tdir(table), "_snapshots")

    def versions(self, table: str) -> list[int]:
        d = self._snap_dir(table)
        if not os.path.isdir(d):
            return []
        return sorted(
            int(m.group(1))
            for f in os.listdir(d)
            if (m := re.fullmatch(r"v(\d+)\.json", f))
        )

    def current_version(self, table: str) -> int | None:
        vs = self.versions(table)
        return vs[-1] if vs else None

    def manifest(self, table: str, version: int | None = None) -> dict | None:
        if version is None:
            version = self.current_version(table)
        if version is None:
            return None
        with open(os.path.join(self._snap_dir(table), f"v{version}.json")) as f:
            return json.load(f)

    # -- commit -------------------------------------------------------------
    def commit(
        self,
        df: DataFrame,
        table: str,
        mode: str = "append",
        partition_by: list[str] | None = None,
        meta: dict | None = None,
    ) -> dict:
        """Write ``df`` as new immutable data files + a new manifest.

        ``mode='append'`` keeps the parent's files; ``'overwrite'`` starts the
        file list fresh (old files stay on disk for time travel).
        """
        commit_id = uuid.uuid4().hex[:12]
        tmp_dir = os.path.join(self._tdir(table), ".tmp", commit_id)
        data_dir = os.path.join(self._tdir(table), "data")
        if partition_by:
            # co-locate rows of one partition into one task → one file per
            # partition value instead of tasks×partitions small files
            if self.write_tasks:
                df = df.repartition(self.write_tasks, *partition_by)
            else:
                df = df.repartition(*partition_by)
            writer = df.write.mode("overwrite").partitionBy(*partition_by)
        else:
            writer = df.write.mode("overwrite")
        writer.parquet(tmp_dir)

        # relocate immutable data files under data/<partition dirs>/ so the
        # layout below basePath is uniform k=v (Spark partition discovery)
        files = []
        i = 0
        for dirpath, _dirnames, filenames in os.walk(tmp_dir):
            for fn in sorted(filenames):
                if not fn.endswith(".parquet"):
                    continue
                rel_dir = os.path.relpath(dirpath, tmp_dir)
                rel_dir = "" if rel_dir == "." else rel_dir
                parts = {k: v for k, v in _PART_RE.findall(rel_dir + "/")}
                dest_dir = os.path.join(data_dir, rel_dir)
                os.makedirs(dest_dir, exist_ok=True)
                dest = os.path.join(dest_dir, f"{commit_id}-{i:05d}.parquet")
                os.rename(os.path.join(dirpath, fn), dest)
                # row count from the parquet footer — a local metadata read,
                # no Spark job; lets the engine answer "how many rows" from
                # the manifest alone (Iceberg keeps the same per-file stats)
                nrows = pq.ParquetFile(dest).metadata.num_rows
                files.append({"path": dest, "partition": parts, "rows": nrows})
                i += 1
        shutil.rmtree(os.path.join(self._tdir(table), ".tmp"), ignore_errors=True)

        parent = self.current_version(table)
        prev = self.manifest(table) if parent is not None else None
        live = list(prev["files"]) if (prev and mode == "append") else []
        live += files
        version = 0 if parent is None else parent + 1
        man = {
            "table": table,
            "version": version,
            "parent": parent,
            "commit": commit_id,
            "mode": mode,
            "files": live,
            "new_files": len(files),
            "meta": meta or {},
        }
        snap_dir = self._snap_dir(table)
        os.makedirs(snap_dir, exist_ok=True)
        tmp = os.path.join(snap_dir, f".v{version}.json.{commit_id}.tmp")
        with open(tmp, "w") as f:
            json.dump(man, f)
        os.rename(tmp, os.path.join(snap_dir, f"v{version}.json"))  # atomic
        return man

    def commit_pylist(
        self,
        rows: list[dict],
        schema: "pa.Schema",
        table: str,
        mode: str = "append",
        meta: dict | None = None,
    ) -> dict:
        """Commit a tiny driver-side table (e.g. one wave-metrics row) as a
        parquet file written directly with pyarrow — zero Spark jobs.  Same
        manifest semantics as :meth:`commit`."""
        commit_id = uuid.uuid4().hex[:12]
        data_dir = os.path.join(self._tdir(table), "data")
        os.makedirs(data_dir, exist_ok=True)
        dest = os.path.join(data_dir, f"{commit_id}-00000.parquet")
        t = pa.Table.from_pylist(rows, schema=schema)
        pq.write_table(t, dest)
        parent = self.current_version(table)
        prev = self.manifest(table) if parent is not None else None
        live = list(prev["files"]) if (prev and mode == "append") else []
        live.append({"path": dest, "partition": {}, "rows": len(rows)})
        version = 0 if parent is None else parent + 1
        man = {
            "table": table,
            "version": version,
            "parent": parent,
            "commit": commit_id,
            "mode": mode,
            "files": live,
            "new_files": 1,
            "meta": meta or {},
        }
        snap_dir = self._snap_dir(table)
        os.makedirs(snap_dir, exist_ok=True)
        tmp = os.path.join(snap_dir, f".v{version}.json.{commit_id}.tmp")
        with open(tmp, "w") as f:
            json.dump(man, f)
        os.rename(tmp, os.path.join(snap_dir, f"v{version}.json"))
        return man

    def partition_rows(
        self, table: str, key: str, version: int | None = None
    ) -> dict[str, int]:
        """Row counts per partition value from manifest stats (no Spark)."""
        man = self.manifest(table, version)
        out: dict[str, int] = {}
        if man is None:
            return out
        for f in man["files"]:
            v = f["partition"].get(key)
            if v is not None:
                out[v] = out.get(v, 0) + f.get("rows", 0)
        return out

    def file_count(self, table: str) -> int:
        man = self.manifest(table)
        return 0 if man is None else len(man["files"])

    def compact(
        self,
        spark: SparkSession,
        table: str,
        partition_by: list[str] | None = None,
        meta: dict | None = None,
    ) -> dict | None:
        """Rewrite a table's live files into one file per partition (Iceberg
        'rewrite_data_files').  Amortized maintenance: call when the manifest
        file count crosses a threshold so appends stay O(delta) but reads
        stay O(partitions)."""
        df = self.read(spark, table)
        if df is None:
            return None
        m = dict(meta or {})
        m.setdefault("compaction", True)
        prev = self.manifest(table)
        if prev and not meta:
            m = {**prev["meta"], "compaction": True}
        return self.commit(df, table, mode="overwrite", partition_by=partition_by, meta=m)

    def row_count(self, table: str, version: int | None = None) -> int | None:
        """Exact row count of a snapshot from manifest stats alone (no Spark
        job).  Falls back to footer reads for pre-stats manifests."""
        man = self.manifest(table, version)
        if man is None:
            return None
        total = 0
        for f in man["files"]:
            r = f.get("rows")
            if r is None:
                r = pq.ParquetFile(f["path"]).metadata.num_rows
            total += r
        return total

    # -- read ---------------------------------------------------------------
    def read(
        self,
        spark: SparkSession,
        table: str,
        version: int | None = None,
        partition_filter: dict[str, set[str]] | None = None,
    ) -> DataFrame | None:
        """Open a snapshot as a DataFrame, pruning files by partition values.

        ``partition_filter={'host_bucket': {'3','7'}}`` reads only matching
        data files — pruning happens here at the manifest, before Spark.
        """
        man = self.manifest(table, version)
        if man is None or not man["files"]:
            return None
        files = man["files"]
        if partition_filter:
            files = [
                f
                for f in files
                if all(
                    f["partition"].get(k) in vals
                    for k, vals in partition_filter.items()
                )
            ]
        if not files:
            return None
        return (
            spark.read.option("basePath", self._tdir(table) + "/data")
            .parquet(*[f["path"] for f in files])
        )

    # -- metadata tables (Iceberg-style `#snapshots` / `#files`) -------------
    def snapshots_df(self, spark: SparkSession, table: str) -> DataFrame:
        rows = [
            {
                "version": m["version"],
                "parent": m["parent"],
                "commit": m["commit"],
                "mode": m["mode"],
                "num_files": len(m["files"]),
                "new_files": m["new_files"],
                "meta_json": json.dumps(m["meta"], sort_keys=True),
            }
            for v in self.versions(table)
            if (m := self.manifest(table, v))
        ]
        return spark.createDataFrame(
            rows,
            schema="version int, parent int, commit string, mode string, "
            "num_files int, new_files int, meta_json string",
        )

    def files_df(self, spark: SparkSession, table: str) -> DataFrame:
        man = self.manifest(table) or {"files": []}
        rows = [
            {"path": f["path"], "partition_json": json.dumps(f["partition"], sort_keys=True)}
            for f in man["files"]
        ]
        return spark.createDataFrame(
            rows, schema="path string, partition_json string"
        )
