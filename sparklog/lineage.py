"""Snapshot/manifest layer: Iceberg-style commit + resume over Parquet.

The north rule targets Iceberg tables; no Iceberg jar is obtainable in this
offline sandbox (SURVEY.md §7.5), so the pipeline writes through a thin
catalog abstraction: when ``format='iceberg'`` is available on a real
cluster the same code path uses it verbatim; here, snapshots are emulated
as versioned manifest JSON documents committed by atomic rename.

A snapshot records, per completed stage: row counts, parse metrics and
per-partition lineage rows.  ``resume`` reads the last committed snapshot
and skips completed stages; stage writes are idempotent (deterministic
salting, overwrite mode), so a kill-and-rerun produces byte-identical
output.
"""

from __future__ import annotations

import json
import os
import time


class Manifest:
    def __init__(self, out_dir: str):
        self.dir = os.path.join(out_dir, "_manifests")
        os.makedirs(self.dir, exist_ok=True)

    def _current_path(self) -> str:
        return os.path.join(self.dir, "CURRENT")

    def load(self) -> dict:
        cur = self._current_path()
        if not os.path.exists(cur):
            return {"snapshot_id": 0, "stages": {}}
        try:
            with open(cur) as f:
                name = f.read().strip()
            with open(os.path.join(self.dir, name)) as f:
                return json.load(f)
        except (OSError, json.JSONDecodeError):
            # dangling CURRENT or torn snapshot: the commit protocol is
            # atomic-rename, so a broken pointer means an interrupted or
            # tampered state — degrade to a full (idempotent) rerun
            return {"snapshot_id": 0, "stages": {}}

    def commit_stage(self, stage: str, info: dict) -> dict:
        """Record a completed stage in a new snapshot (atomic rename)."""
        state = self.load()
        state["snapshot_id"] += 1
        state["stages"][stage] = {"committed_at": time.time(), **info}
        name = f"snapshot-{state['snapshot_id']:06d}.json"
        tmp = os.path.join(self.dir, name + ".tmp")
        with open(tmp, "w") as f:
            json.dump(state, f, indent=1, default=str)
        os.replace(tmp, os.path.join(self.dir, name))
        cur_tmp = self._current_path() + ".tmp"
        with open(cur_tmp, "w") as f:
            f.write(name)
        os.replace(cur_tmp, self._current_path())
        return state

    def is_done(self, stage: str) -> bool:
        return stage in self.load()["stages"]


def partition_lineage(df) -> list[dict]:
    """Per-input-partition row counts (lineage rows for the manifest)."""
    from pyspark.sql import functions as F

    rows = (df.groupBy(F.spark_partition_id().alias("partition_id"))
              .agg(F.count("*").alias("n_rows"),
                   F.count("parse_error").alias("n_failed"))
              .collect())
    return [r.asDict() for r in rows]
