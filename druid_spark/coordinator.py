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

import datetime as dt
import os
import shutil
import threading
import time
import uuid
from typing import Any


def _parse_period(p: str) -> "dt.timedelta":
    """ISO-8601 period → timedelta (calendar months/years approximated
    as 30/365 days, matching the retention use where periods bound a
    horizon, not a calendar arithmetic result)."""
    import re as _re
    m = _re.fullmatch(
        r"P(?:(\d+)Y)?(?:(\d+)M)?(?:(\d+)W)?(?:(\d+)D)?"
        r"(?:T(?:(\d+)H)?(?:(\d+)M)?(?:(\d+)S)?)?", p or "")
    if not m or not any(m.groups()):
        raise ValueError(f"bad ISO period {p!r}")
    y, mo, w, d, h, mi, s = (int(g or 0) for g in m.groups())
    return dt.timedelta(days=y * 365 + mo * 30 + w * 7 + d,
                        hours=h, minutes=mi, seconds=s)


class RetentionDuty:
    """Retention / load-drop rules duty — the coordinator's rule engine
    (server/.../server/coordinator/rules/: LoadRule, DropRule,
    PeriodLoadRule, PeriodDropBeforeRule, RunRules duty; RulesResource
    for the HTTP surface). Rules per datasource are evaluated in order,
    FIRST MATCH WINS; a partition matched by a load rule is retained,
    by a drop rule deleted (the markAsUnused + kill analog: files are
    removed, then the datasource re-registers). No matching rule =
    retained (the cluster default rule is loadForever).

    Supported rule types: loadForever, dropForever,
    loadByPeriod {"period"} (retain partitions younger than now-P),
    dropByPeriod {"period"} (drop partitions younger than now-P),
    dropBeforeByPeriod {"period"} (drop partitions older than now-P),
    loadByInterval / dropByInterval {"interval": "A/B"}."""

    def __init__(self, engine, now=None):
        self.engine = engine
        self.rules: dict[str, list[dict[str, Any]]] = {}
        self.history: list[dict[str, Any]] = []
        self._now = now  # fixed clock for tests; None = wall clock
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None
        self._lock = threading.Lock()

    def set_rules(self, datasource: str, rules: list[dict]) -> None:
        self.rules[datasource] = list(rules)

    def _partition_bounds(self, ds: str, value: str):
        """Partition value string → (start, end) datetimes via the
        table's registered date_format pattern."""
        part = self.engine.catalog.partitioning(ds)
        fmt = part[1] if part else "yyyy-MM-dd"
        py_fmt = fmt.replace("yyyy", "%Y").replace("MM", "%m") \
            .replace("dd", "%d").replace("HH", "%H")
        start = dt.datetime.strptime(value, py_fmt)
        if py_fmt == "%Y-%m":  # calendar month, not a fixed span
            end = (start.replace(day=28)
                   + dt.timedelta(days=4)).replace(day=1)
        elif py_fmt == "%Y":
            end = start.replace(year=start.year + 1)
        elif py_fmt.endswith("%H"):
            end = start + dt.timedelta(hours=1)
        else:
            end = start + dt.timedelta(days=1)
        return start, end

    def _decide(self, rules: list[dict], start, end, now) -> str:
        """First-match rule decision. Reference semantics (rules/):
        LOAD rules match on OVERLAP (Rules.eligibleForLoad — any
        overlap with [now-P, now], or interval end in the future with
        includeFuture=true, the default); DROP rules match only on
        CONTAINMENT (PeriodDropRule.appliesTo:74-81 —
        currInterval.contains(theInterval) with includeFuture=false,
        start-side containment with the includeFuture=true default;
        IntervalDropRule.appliesTo:64-67 — interval.contains). A
        partition straddling a boundary is therefore retained by drop
        rules and falls through to the next rule."""
        for r in rules:
            t = r.get("type")
            if t == "loadForever":
                return "load"
            if t == "dropForever":
                return "drop"
            if t == "loadByPeriod":
                horizon = now - _parse_period(r["period"])
                if r.get("includeFuture", True):
                    # Rules.eligibleForLoad includeFuture arm:
                    # currInterval.start < interval.end
                    if end > horizon:
                        return "load"
                elif end > horizon and start < now:
                    return "load"  # overlap with [now-P, now]
            elif t == "dropByPeriod":
                horizon = now - _parse_period(r["period"])
                if r.get("includeFuture", True):
                    # PeriodDropRule:77-78: currInterval.start <=
                    # theInterval.start
                    if start >= horizon:
                        return "drop"
                elif start >= horizon and end <= now:
                    return "drop"  # full containment in [now-P, now]
            elif t == "dropBeforeByPeriod":
                # PeriodDropBeforeRule:63-64: end <= now - P
                if end <= now - _parse_period(r["period"]):
                    return "drop"
            elif t in ("loadByInterval", "dropByInterval"):
                a, b = r["interval"].split("/")
                ia = dt.datetime.fromisoformat(a.replace("T", " ")
                                               .rstrip("Z"))
                ib = dt.datetime.fromisoformat(b.replace("T", " ")
                                               .rstrip("Z"))
                if t == "loadByInterval":
                    if start < ib and end > ia:  # overlap
                        return "load"
                elif ia <= start and end <= ib:  # containment
                    return "drop"
        return "load"  # cluster default rule: loadForever

    def run_once(self) -> list[dict[str, Any]]:
        """One rule pass: drop every partition whose first matching
        rule is a drop rule; re-register touched datasources; record
        kill tasks in sys.tasks."""
        now = self._now or dt.datetime.now()
        dropped = []
        with self._lock:
            for ds, rules in self.rules.items():
                path = self.engine.catalog.source_path(ds)
                if not path or not os.path.isdir(path):
                    continue
                part = self.engine.catalog.partitioning(ds)
                col = part[0] if part else "__dt"
                touched = False
                for d in sorted(os.listdir(path)):
                    if not d.startswith(col + "="):
                        continue
                    val = d.split("=", 1)[1]
                    try:
                        start, end = self._partition_bounds(ds, val)
                    except ValueError:
                        continue
                    if self._decide(rules, start, end, now) == "drop":
                        shutil.rmtree(os.path.join(path, d),
                                      ignore_errors=True)
                        tid = f"kill_{ds}_{val}_{uuid.uuid4().hex[:6]}"
                        self.engine.record_task(tid, "kill", ds,
                                                "SUCCESS")
                        rec = {"dataSource": ds, "partition": d,
                               "start": start.isoformat()}
                        dropped.append(rec)
                        self.history.append(rec)
                        touched = True
                if touched:
                    self.engine.catalog.register_table(
                        ds, self.engine.spark.read.parquet(path),
                        source_path=path)
                    if part:
                        self.engine.catalog.set_partitioning(ds, *part)
        return dropped

    def start(self, period: float = 300.0) -> "RetentionDuty":
        if self._thread is not None and self._thread.is_alive():
            return self
        self._stop.clear()

        def loop():
            while not self._stop.wait(period):
                try:
                    self.run_once()
                except Exception:
                    pass

        self._thread = threading.Thread(
            target=loop, daemon=True, name="retention-duty")
        self._thread.start()
        return self

    def stop(self) -> None:
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=5)
            self._thread = None


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
