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
