"""Coordinator duties — auto-compaction.

The reference coordinator runs periodic duties; CompactSegments
(server/.../server/coordinator/duty/CompactSegments.java) scans each
datasource's segment timeline for intervals fragmented into many small
segments and submits compaction tasks for just those intervals. The
Spark analog: scan a warehouse table's time-partition directories via
parquet footers (no data read), and rewrite only the partitions whose
file count exceeds the per-datasource config.

The rewrite targets one partition directory at a time (never the whole
table, unlike TableService.compact), staging into a dot-prefixed temp
dir inside the warehouse (ignored by Spark's partition discovery) and
swapping it in. Single-node swap semantics: rmtree+rename, the same
non-MVCC caveat as TableService — the reference swaps atomically via
segment versions/overshadowing.
"""

from __future__ import annotations

import os
import shutil
import threading
import time
import uuid
from typing import Any


class CompactionDuty:
    """Auto-compaction duty over an engine's warehouse tables.

        duty = CompactionDuty(engine)
        duty.set_config("events_day", max_files_per_partition=4)
        duty.run_once()          # one duty cycle, returns work done
        duty.start(period=60)    # or: background daemon loop
    """

    def __init__(self, engine):
        self.engine = engine
        # ds -> {"maxFilesPerPartition": int, "targetFiles": int}
        self.configs: dict[str, dict[str, Any]] = {}
        self.history: list[dict[str, Any]] = []
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None
        self._lock = threading.Lock()

    # ------------------------------------------------------------ config
    def set_config(self, datasource: str,
                   max_files_per_partition: int = 8,
                   target_files: int = 1) -> None:
        """Per-datasource compaction config
        (CoordinatorCompactionConfig analog)."""
        self.configs[datasource] = {
            "dataSource": datasource,
            "maxFilesPerPartition": int(max_files_per_partition),
            "targetFiles": int(target_files)}

    def remove_config(self, datasource: str) -> bool:
        return self.configs.pop(datasource, None) is not None

    # -------------------------------------------------------------- scan
    def _partition_dirs(self, path: str) -> list[tuple[str, int]]:
        """(partition dirname, parquet file count) for each time
        partition under a warehouse table path — footer-free listing."""
        out = []
        if not os.path.isdir(path):
            return out
        for d in sorted(os.listdir(path)):
            full = os.path.join(path, d)
            if "=" not in d or not os.path.isdir(full):
                continue
            n = sum(1 for f in os.listdir(full) if f.endswith(".parquet"))
            out.append((d, n))
        return out

    def scan(self) -> list[dict[str, Any]]:
        """Fragmented partitions across all configured datasources."""
        found = []
        for ds, cfg in self.configs.items():
            path = self.engine.catalog.source_path(ds)
            if not path:
                continue
            for part, n in self._partition_dirs(path):
                if n > cfg["maxFilesPerPartition"]:
                    found.append({"dataSource": ds, "partition": part,
                                  "files": n,
                                  "targetFiles": cfg["targetFiles"]})
        return found

    # ----------------------------------------------------------- compact
    def _compact_partition(self, ds: str, part: str, target: int) -> None:
        path = self.engine.catalog.source_path(ds)
        pdir = os.path.join(path, part)
        spark = self.engine.spark
        tmp = os.path.join(path, f".compact_{uuid.uuid4().hex[:8]}")
        (spark.read.parquet(pdir).repartition(target)
         .write.mode("overwrite").parquet(tmp))
        # drop the _SUCCESS marker so the swapped dir holds parquet only
        for f in os.listdir(tmp):
            if f.startswith("_"):
                os.remove(os.path.join(tmp, f))
        shutil.rmtree(pdir)
        os.rename(tmp, pdir)

    def run_once(self) -> list[dict[str, Any]]:
        """One duty cycle: compact every fragmented partition found.
        Re-registers touched datasources so queries see the new file
        listing (a registered DataFrame pins its file index); records
        each compaction as a sys.tasks row."""
        with self._lock:
            work = self.scan()
            touched = set()
            for w in work:
                tid = (f"compact_{w['dataSource']}_"
                       f"{w['partition'].split('=', 1)[-1]}_"
                       f"{uuid.uuid4().hex[:6]}")
                t0 = time.time()
                self.engine.record_task(tid, "compact", w["dataSource"],
                                        "RUNNING")
                try:
                    self._compact_partition(w["dataSource"], w["partition"],
                                            w["targetFiles"])
                    status = "SUCCESS"
                    err = None
                except Exception as e:  # keep the duty loop alive
                    status, err = "FAILED", f"{type(e).__name__}: {e}"
                self.engine.record_task(
                    tid, "compact", w["dataSource"], status,
                    (time.time() - t0) * 1000.0, err)
                w["status"] = status
                touched.add(w["dataSource"])
                self.history.append(dict(w))
            for ds in touched:
                path = self.engine.catalog.source_path(ds)
                part = self.engine.catalog.partitioning(ds)
                self.engine.catalog.register_table(
                    ds, self.engine.spark.read.parquet(path),
                    source_path=path)
                if part:
                    self.engine.catalog.set_partitioning(ds, *part)
            return work

    # -------------------------------------------------------------- loop
    def start(self, period: float = 60.0) -> "CompactionDuty":
        """Background duty cycle (the coordinator's indexing period)."""
        if self._thread is not None and self._thread.is_alive():
            return self
        self._stop.clear()

        def loop():
            while not self._stop.wait(period):
                try:
                    self.run_once()
                except Exception:
                    pass  # next cycle retries

        self._thread = threading.Thread(
            target=loop, daemon=True, name="compaction-duty")
        self._thread.start()
        return self

    def stop(self) -> None:
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=5)
            self._thread = None
