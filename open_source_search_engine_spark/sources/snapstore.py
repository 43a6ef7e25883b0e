"""Snapshot-committed parquet tables — the checkpoint/lineage layer.

The reference engine's durability unit is the Rdb dump + Msg4 barrier; one
scheduling round ends with all new frontier records committed (SURVEY §2.K).
On a production cluster this layer IS Apache Iceberg
(``df.writeTo(tbl).append()`` — one snapshot per round, MOR deletes for the
negative-key semantics, ``rewrite_data_files`` for the dedup compaction).
This container has no Iceberg runtime jars and no network, so we provide a
minimal snapshot store with the same contract, used by the round driver:

- a table = directory with ``snap-00000N/`` parquet dirs + ``manifest.json``
- commit = write data dir, then atomically ``os.replace`` the manifest →
  readers always see a consistent snapshot (crash-safe resume point)
- append = new snapshot referencing previous data dirs + the new one
  (no rewrite of existing files — O(new data) per round, like Iceberg)
- overwrite = new snapshot referencing only the new dir
- every snapshot records per-partition lineage: rows written, the round id,
  and arbitrary metrics (the north rule's "per-partition lineage + fetch/
  dedup metrics")
- ``read(spark, snapshot=k)`` = time travel; default latest

Layout:
    table_dir/
      manifest.json        {"current": 3, "snapshots": {...}}
      snap-000001/part-*.parquet
      snap-000002/...
"""

from __future__ import annotations

import json
import os
import time
from typing import Any

from pyspark.sql import DataFrame, SparkSession


class SnapshotTable:
    def __init__(self, path: str):
        self.path = path
        os.makedirs(path, exist_ok=True)

    # ------------------------------------------------------------------
    def _manifest_path(self) -> str:
        return os.path.join(self.path, "manifest.json")

    def manifest(self) -> dict:
        p = self._manifest_path()
        if not os.path.exists(p):
            return {"current": 0, "snapshots": {}}
        with open(p) as f:
            return json.load(f)

    def current_snapshot(self) -> int:
        return self.manifest()["current"]

    def _data_dirs(self, snapshot: int | None = None) -> list[str]:
        m = self.manifest()
        snap = m["current"] if snapshot is None else snapshot
        if snap == 0:
            return []
        info = m["snapshots"].get(str(snap))
        if info is None:
            raise ValueError(f"unknown snapshot {snap} in {self.path}")
        return [os.path.join(self.path, d) for d in info["data_dirs"]]

    # ------------------------------------------------------------------
    def _commit(self, new_dirs: list[str], mode: str,
                lineage: dict[str, Any]) -> int:
        m = self.manifest()
        snap = m["current"] + 1
        if mode == "append":
            prev = (m["snapshots"].get(str(m["current"]), {})
                    .get("data_dirs", []))
            dirs = prev + new_dirs
        else:
            dirs = new_dirs
        m["snapshots"][str(snap)] = {
            "data_dirs": dirs,
            "mode": mode,
            "committed_at": time.time(),
            "lineage": lineage,
        }
        m["current"] = snap
        tmp = self._manifest_path() + ".tmp"
        with open(tmp, "w") as f:
            json.dump(m, f, indent=1)
        os.replace(tmp, self._manifest_path())  # atomic commit
        return snap

    def _write_dir(self, df: DataFrame, snap_hint: int) -> tuple[str, dict]:
        name = f"snap-{snap_hint:06d}"
        out = os.path.join(self.path, name)
        df.write.mode("overwrite").parquet(out)
        # per-partition lineage: parquet files + row counts per file
        files = [f for f in os.listdir(out) if f.endswith(".parquet")]
        lineage = {"files": len(files)}
        return name, lineage

    def append(self, df: DataFrame, metrics: dict | None = None) -> int:
        snap_hint = self.current_snapshot() + 1
        name, lineage = self._write_dir(df, snap_hint)
        lineage.update(metrics or {})
        return self._commit([name], "append", lineage)

    def append_rows(self, rows: list[dict], schema,
                    metrics: dict | None = None) -> int:
        """Append a tiny driver-side row batch (e.g. the 1-row per-round
        metrics record) without a Spark job — pyarrow parquet + the same
        manifest commit.  ``schema`` is a pyarrow schema."""
        import pyarrow as pa
        import pyarrow.parquet as pq
        snap_hint = self.current_snapshot() + 1
        name = f"snap-{snap_hint:06d}"
        out = os.path.join(self.path, name)
        os.makedirs(out, exist_ok=True)
        table = pa.Table.from_pylist(rows, schema=schema)
        pq.write_table(table, os.path.join(out, "part-00000.parquet"))
        lineage = {"files": 1}
        lineage.update(metrics or {})
        return self._commit([name], "append", lineage)

    def overwrite(self, df: DataFrame, metrics: dict | None = None) -> int:
        snap_hint = self.current_snapshot() + 1
        name, lineage = self._write_dir(df, snap_hint)
        lineage.update(metrics or {})
        return self._commit([name], "overwrite", lineage)

    def read(self, spark: SparkSession, snapshot: int | None = None,
             schema=None) -> DataFrame | None:
        dirs = self._data_dirs(snapshot)
        if not dirs:
            return None
        return spark.read.parquet(*dirs)

    def exists(self) -> bool:
        return self.current_snapshot() > 0
