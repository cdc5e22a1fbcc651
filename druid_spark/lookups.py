"""Lookup extraction namespaces — load k→v lookups from external
sources with optional polling.

Reference: extensions-core/lookups-cached-global —
UriExtractionNamespace.java:65 (uri + namespaceParseSpec csv/tsv/
customJson/simpleJson, pollPeriod), StaticMapExtractionNamespace.java,
PollingLookup family. The reference polls a URI/JDBC source on
pollPeriod and swaps the cached map atomically when the source version
changes.

Spark-first mapping: the parse/scan runs as a Spark read (distributed —
a 100 GB source file parses in parallel), and only the k/v pairs are
collected, which the lookup contract already bounds to broadcast size
(LookupExtractor maps live on every node in the reference too). The
loaded dict registers into the engine catalog; `register_lookup` bumps
the catalog version, so the SQL LOOKUP() function re-registers on the
next sql() call and the broadcast-join fallback kicks in above
SQL_LOOKUP_INLINE_MAX. Re-loads are skipped when the source is
unchanged (mtime+size stamp — the reference's version check).
"""

from __future__ import annotations

import os
import threading
from typing import Any

from pyspark.sql import functions as F


def _source_stamp(path: str) -> tuple:
    """Change-detection stamp (UriCacheGenerator version analog):
    (mtime_ns, size) over the file or every file under a directory."""
    if os.path.isdir(path):
        out = []
        for root, _, fns in os.walk(path):
            for fn in sorted(fns):
                p = os.path.join(root, fn)
                st = os.stat(p)
                out.append((p, st.st_mtime_ns, st.st_size))
        return tuple(out)
    st = os.stat(path)
    return (st.st_mtime_ns, st.st_size)


def load_lookup(engine, name: str, uri: str, fmt: str = "csv",
                key_column: str = "k", value_column: str = "v",
                force: bool = False, **reader_options: Any) -> dict | None:
    """Load lookup `name` from `uri` and register it on the engine.

    fmt: 'csv' | 'tsv' (keyColumn/valueColumn parse specs), 'json'
    (customJson keyFieldName/valueFieldName), 'simpleJson' (each line
    one {"key": "value"} object), 'parquet'. Returns the loaded dict,
    or None when the source is unchanged since the last load (no
    re-registration — the reference's version-gated cache swap).
    """
    path = uri[len("file://"):] if uri.startswith("file://") else uri
    stamp = _source_stamp(path)
    stamps = getattr(engine, "_lookup_stamps", None)
    if stamps is None:
        stamps = engine._lookup_stamps = {}
    if not force and stamps.get(name) == stamp:
        return None
    spark = engine.spark
    if fmt in ("csv", "tsv"):
        opts = {"header": "true",
                "sep": "\t" if fmt == "tsv" else ",", **reader_options}
        df = spark.read.options(**opts).csv(path)
    elif fmt == "json":
        df = spark.read.options(**reader_options).json(path)
    elif fmt == "simpleJson":
        # one {"key": "value"} object per line, arbitrary key names
        df = (spark.read.text(path)
              .select(F.explode(F.from_json(
                  F.col("value"), "map<string,string>")).alias("k", "v")))
        key_column, value_column = "k", "v"
    elif fmt == "parquet":
        df = spark.read.options(**reader_options).parquet(path)
    else:
        raise NotImplementedError(f"lookup format {fmt}")
    rows = (df.select(F.col(key_column).cast("string").alias("k"),
                      F.col(value_column).cast("string").alias("v"))
            .where(F.col("k").isNotNull())
            .collect())
    mapping = {r["k"]: r["v"] for r in rows}
    engine.catalog.register_lookup(name, mapping)
    stamps[name] = stamp
    return mapping


class LookupPoller:
    """pollPeriod analog (UriExtractionNamespace.java:95): re-load a
    registered namespace on a fixed period from a daemon thread,
    swapping the map only when the source stamp changed. `poll_once()`
    is the synchronous form for deterministic tests/cron use."""

    def __init__(self, engine, name: str, uri: str,
                 period_sec: float = 60.0, **load_kwargs: Any):
        self.engine = engine
        self.name = name
        self.uri = uri
        self.period_sec = period_sec
        self.load_kwargs = load_kwargs
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None
        self.loads = 0  # completed loads (observability/tests)

    def poll_once(self) -> bool:
        """Load if changed; True when a new map was registered."""
        out = load_lookup(self.engine, self.name, self.uri,
                          **self.load_kwargs)
        if out is not None:
            self.loads += 1
        return out is not None

    def start(self) -> "LookupPoller":
        self.poll_once()  # initial load before first period elapses

        def run():
            while not self._stop.wait(self.period_sec):
                try:
                    self.poll_once()
                except Exception:
                    # keep polling; the reference logs and retries too
                    pass

        self._thread = threading.Thread(
            target=run, daemon=True, name=f"lookup-poll-{self.name}")
        self._thread.start()
        return self

    def stop(self) -> None:
        self._stop.set()
        if self._thread:
            self._thread.join(timeout=5)


class JdbcLookupPoller(LookupPoller):
    """JdbcExtractionNamespace pollPeriod analog: same daemon-thread
    cadence, but the load is the DB-API JDBC-namespace load
    (ingest/dbapi.py) with its MAX(tsColumn) version gate — a poll
    where the version did not advance swaps nothing, matching
    JdbcCacheGenerator's null return."""

    def __init__(self, engine, name: str, database: dict, table: str,
                 key_column: str, value_column: str,
                 ts_column: str | None = None,
                 filter: str | None = None,
                 period_sec: float = 60.0):
        super().__init__(engine, name, uri="", period_sec=period_sec)
        self.jdbc_kwargs = dict(
            database=database, table=table, key_column=key_column,
            value_column=value_column, ts_column=ts_column,
            filter=filter)

    def poll_once(self) -> bool:
        from druid_spark.ingest.dbapi import load_jdbc_lookup
        out = load_jdbc_lookup(self.engine, self.name,
                               **self.jdbc_kwargs)
        if out is not None:
            self.loads += 1
        return out is not None
