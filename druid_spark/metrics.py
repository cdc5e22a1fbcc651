"""Request logging + query metrics.

Reference surface: every query the server answers is request-logged
with its wall time, identity, and outcome
(server/src/main/java/org/apache/druid/server/log/RequestLogger.java;
`druid.request.logging.type=file` writes daily JSON-lines files, the
emitter carries `query/time` / `sqlQuery/time` metrics —
processing/src/main/java/org/apache/druid/query/DefaultQueryMetrics.java).

Spark-first analog: one `RequestLogger` per HTTP server — a bounded
in-memory ring (tests, debugging) plus an optional JSON-lines file
sink (the `file` request logger contract). Entries carry the same
core dimensions the reference logs: timestamp, remote address,
identity, query id, native-vs-sql, dataSource/SQL text, success,
query/time in ms, row count, error class. Logging never throws into
the request path.
"""

from __future__ import annotations

import json
import os
import threading
import time
from collections import deque
from typing import Any


class RequestLogger:
    """Bounded ring + optional JSONL file sink for per-request logs."""

    def __init__(self, path: str | None = None, capacity: int = 1000):
        self._ring: deque[dict[str, Any]] = deque(maxlen=capacity)
        self._path = path
        self._lock = threading.Lock()
        if path:
            os.makedirs(os.path.dirname(path) or ".", exist_ok=True)

    def log(self, **entry: Any) -> None:
        """Record one request. Never raises into the caller."""
        try:
            entry.setdefault(
                "time", time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()))
            with self._lock:
                self._ring.append(entry)
                if self._path:
                    with open(self._path, "a") as fh:
                        fh.write(json.dumps(entry, default=str) + "\n")
        except Exception:
            pass

    def recent(self, n: int = 100) -> list[dict[str, Any]]:
        with self._lock:
            items = list(self._ring)
        return items[-n:]

    def __len__(self) -> int:
        return len(self._ring)


class AuditLog:
    """Audit trail for config mutations — the AuditManager analog
    (server/src/main/java/org/apache/druid/server/audit/
    SQLAuditManager.java; AuditEntry: key, type, auditInfo{author,
    comment, ip}, payload, auditTime). Every config-changing endpoint
    (compaction config, retention rules, lookups, security CRUD)
    records who changed what; history is queryable by key/type.
    Same bounded-ring + optional-JSONL contract as RequestLogger —
    auditing never throws into the request path."""

    def __init__(self, path: str | None = None, capacity: int = 1000,
                 retention_seconds: float | None = None):
        """retention_seconds bounds the JSONL file of a long-lived
        server: entries older than the horizon age out on the next
        purge cycle (the reference's audit retention duty —
        KillAuditLog / SQLAuditManager
        `druid.coordinator.kill.audit.durationToRetain`). The in-memory
        ring stays bounded by `capacity` and keeps serving the recent
        window regardless."""
        self._ring: deque[dict[str, Any]] = deque(maxlen=capacity)
        self._path = path
        self._lock = threading.Lock()
        self.retention_seconds = retention_seconds
        self._since_purge = 0
        if path:
            os.makedirs(os.path.dirname(path) or ".", exist_ok=True)

    def record(self, key: str, type_: str, payload: Any,
               author: str | None = None, comment: str = "",
               ip: str | None = None) -> None:
        """Record one config mutation. Never raises into the caller."""
        try:
            entry = {
                "key": key, "type": type_,
                "auditInfo": {"author": author, "comment": comment,
                              "ip": ip},
                "payload": payload,
                "auditTime": time.strftime("%Y-%m-%dT%H:%M:%SZ",
                                           time.gmtime()),
            }
            with self._lock:
                self._ring.append(entry)
                if self._path:
                    with open(self._path, "a") as fh:
                        fh.write(json.dumps(entry, default=str) + "\n")
                    self._since_purge += 1
            # amortized: one file rewrite per 128 records keeps the
            # purge O(file)/128 per record without a background thread
            if (self.retention_seconds is not None and self._path
                    and self._since_purge >= 128):
                self.purge()
        except Exception:
            pass

    def purge(self, now: float | None = None) -> int:
        """Age entries older than the retention horizon out of the
        JSONL file (KillAuditLog duty analog). Returns the number of
        entries dropped from the file; the in-memory ring is untouched
        (it is already capacity-bounded and serves the recent window).
        No-op without a file or a retention setting."""
        if not self._path or self.retention_seconds is None:
            return 0
        import calendar
        cutoff = (now if now is not None else time.time()) \
            - self.retention_seconds

        def ts(e: dict) -> float:
            try:
                return calendar.timegm(time.strptime(
                    e.get("auditTime", ""), "%Y-%m-%dT%H:%M:%SZ"))
            except Exception:
                return float("inf")  # unparseable → keep

        with self._lock:
            self._since_purge = 0
            try:
                with open(self._path) as fh:
                    entries = [json.loads(ln) for ln in fh
                               if ln.strip()]
            except FileNotFoundError:
                return 0
            kept = [e for e in entries if ts(e) >= cutoff]
            if len(kept) == len(entries):
                return 0
            tmp = self._path + ".tmp"
            with open(tmp, "w") as fh:
                for e in kept:
                    fh.write(json.dumps(e, default=str) + "\n")
            os.replace(tmp, self._path)
            return len(entries) - len(kept)

    def history(self, key: str | None = None, type_: str | None = None,
                n: int = 100) -> list[dict[str, Any]]:
        with self._lock:
            items = list(self._ring)
        if key is not None:
            items = [e for e in items if e["key"] == key]
        if type_ is not None:
            items = [e for e in items if e["type"] == type_]
        return items[-n:]

    def __len__(self) -> int:
        return len(self._ring)
