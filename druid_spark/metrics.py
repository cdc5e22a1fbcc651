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

    def __init__(self, path: str | None = None, capacity: int = 1000):
        self._ring: deque[dict[str, Any]] = deque(maxlen=capacity)
        self._path = path
        self._lock = threading.Lock()
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
        except Exception:
            pass

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
