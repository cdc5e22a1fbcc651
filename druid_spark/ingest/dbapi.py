"""`sql` input source + JDBC lookup namespace over Python DB-API.

Reference: server/src/main/java/org/apache/druid/metadata/input/
SqlInputSource.java (TYPE_KEY "sql": a list of SQL queries against a
database connector, foldCase lowercasing result column names; the
SPLIT UNIT is one SQL string — SplittableInputSource<String>, so
parallelism comes from sharding the query list, exactly like the
reference's per-split task fan-out) and extensions-core/
lookups-cached-global/.../JdbcExtractionNamespace.java +
JdbcCacheGenerator.java (table/keyColumn/valueColumn/tsColumn/filter/
pollPeriod; the version gate is `SELECT MAX(tsColumn) FROM table` —
reload only when it advanced past the last seen version,
JdbcCacheGenerator.java:75-100).

The reference speaks JDBC; this engine speaks Python DB-API 2.0 with a
connector-URI registry. sqlite3 is in the standard library and backs
the in-container tests; other drivers register the same way (the
reference likewise requires the matching JDBC driver jar on the
classpath — JDBC_DRIVER_JAR_FILES_MISSING_ERROR).

Scale: each SQL in `sqls` fetches through one DB cursor (the database
is the bottleneck, as in the reference, where each split replays one
query through one connection) in fetchmany batches — shard the
query list (e.g. BY id ranges) for parallel ingest, the reference's
own split model (each split replays one query through one connection).
"""

from __future__ import annotations

import re
from typing import Any, Callable

from pyspark.sql import DataFrame, SparkSession

FETCH_BATCH = 10_000


def _sqlite_connect(path: str):
    import sqlite3
    return sqlite3.connect(path)


#: connector-URI scheme -> DB-API connect callable. Third-party
#: drivers (psycopg2, mysql-connector) register here the way JDBC
#: driver jars join the reference's classpath.
DBAPI_DRIVERS: dict[str, Callable[[str], Any]] = {
    "sqlite": _sqlite_connect,
}


def register_dbapi_driver(scheme: str,
                          connect: Callable[[str], Any]) -> None:
    DBAPI_DRIVERS[scheme.lower()] = connect


def connect_from_uri(connect_uri: str):
    """Open a DB-API connection from a connector URI. Accepts the
    reference's JDBC spelling (`jdbc:sqlite:/path/db`) and plain
    `scheme:path` / `scheme:///path` forms."""
    uri = connect_uri.strip()
    if uri.lower().startswith("jdbc:"):
        uri = uri[5:]
    m = re.match(r"([A-Za-z][\w+-]*):(//)?(.*)", uri)
    if not m:
        raise ValueError(f"unparseable connectURI: {connect_uri!r}")
    scheme, rest = m.group(1).lower(), m.group(3)
    driver = DBAPI_DRIVERS.get(scheme)
    if driver is None:
        # the reference's analogous failure: "No suitable driver found"
        # -> JDBC_DRIVER_JAR_FILES_MISSING_ERROR (JdbcCacheGenerator)
        raise NotImplementedError(
            f"no DB-API driver registered for scheme [{scheme}]; "
            f"use register_dbapi_driver()")
    return driver(rest)


def _connect(database: dict[str, Any]):
    cfg = database.get("connectorConfig", database)
    return connect_from_uri(cfg["connectURI"])


def fetch_sql_rows(database: dict[str, Any], sql: str,
                   fold_case: bool = False,
                   batch_size: int = FETCH_BATCH):
    """Run one SQL through the connector; yield (columns, row-batch)
    pairs, fetchmany-bounded like the reference's streaming
    ResultIterator."""
    conn = _connect(database)
    try:
        cur = conn.cursor()
        cur.execute(sql)
        cols = [d[0].lower() if fold_case else d[0]
                for d in cur.description]
        while True:
            batch = cur.fetchmany(batch_size)
            if not batch:
                break
            yield cols, batch
    finally:
        conn.close()


def read_sql_input(spark: SparkSession,
                   src: dict[str, Any]) -> DataFrame:
    """inputSource {"type": "sql", "sqls": [...], "database": {...},
    "foldCase": bool} → DataFrame (SqlInputSource.java contract: at
    least one query; rows are the concatenation over `sqls`)."""
    sqls = src.get("sqls") or []
    if not sqls:
        raise ValueError("No SQL queries provided")  # :59
    database = src["database"]
    fold = bool(src.get("foldCase", False))
    out: DataFrame | None = None
    for sql in sqls:
        cols: list[str] | None = None
        rows: list = []
        for c, batch in fetch_sql_rows(database, sql, fold_case=fold):
            cols = c
            rows.extend(batch)
        if cols is None:
            continue
        df = spark.createDataFrame(
            [tuple(r) for r in rows], cols).coalesce(1)
        out = df if out is None else out.unionByName(
            df, allowMissingColumns=True)
    if out is None:
        raise ValueError("No SQL queries provided")
    return out


def jdbc_lookup_version(database: dict[str, Any], table: str,
                        ts_column: str | None) -> int | None:
    """The reference's change gate (JdbcCacheGenerator.lastUpdates):
    SELECT MAX(tsColumn) FROM table, None when no tsColumn."""
    if not ts_column:
        return None
    conn = _connect(database)
    try:
        cur = conn.cursor()
        cur.execute(f"SELECT MAX({ts_column}) FROM {table}")
        v = cur.fetchone()[0]
        return None if v is None else int(v)
    finally:
        conn.close()


def load_jdbc_lookup(engine, name: str, database: dict[str, Any],
                     table: str, key_column: str, value_column: str,
                     ts_column: str | None = None,
                     filter: str | None = None,
                     force: bool = False) -> dict | None:
    """JdbcExtractionNamespace load: full re-read of
    `SELECT keyColumn, valueColumn FROM table [WHERE filter]`, gated
    on MAX(tsColumn) when configured (the reference reloads the WHOLE
    map when the version advances — tsColumn is change DETECTION, not
    row-level delta; JdbcCacheGenerator.java:80 `lastDBUpdate <=
    lastCheck -> return null`). Returns the map, or None when skipped
    as unchanged."""
    stamps = getattr(engine, "_lookup_stamps", None)
    if stamps is None:
        stamps = engine._lookup_stamps = {}
    version = jdbc_lookup_version(database, table, ts_column)
    if (not force and ts_column and version is not None
            and stamps.get(name) is not None
            and version <= stamps.get(name)):
        return None
    sql = f"SELECT {key_column}, {value_column} FROM {table}"
    if filter:
        sql += f" WHERE {filter}"
    mapping: dict[str, str] = {}
    for _cols, batch in fetch_sql_rows(database, sql):
        for k, v in batch:
            if k is not None:
                mapping[str(k)] = None if v is None else str(v)
    engine.catalog.register_lookup(name, mapping)
    if ts_column and version is not None:
        stamps[name] = version
    return mapping
