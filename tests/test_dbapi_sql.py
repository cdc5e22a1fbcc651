"""`sql` input source + JDBC lookup namespace over DB-API (sqlite3).

Reference contracts: SqlInputSource.java (sqls list, foldCase, at
least one query) and JdbcExtractionNamespace.java /
JdbcCacheGenerator.java (keyColumn/valueColumn/tsColumn/filter;
version gate = MAX(tsColumn), full-map reload on advance).
"""

import os
import sqlite3

import pytest

from druid_spark.ingest.batch import read_input
from druid_spark.ingest.dbapi import (connect_from_uri,
                                      load_jdbc_lookup,
                                      read_sql_input)


@pytest.fixture()
def db_path(tmp_path):
    path = str(tmp_path / "meta.db")
    conn = sqlite3.connect(path)
    conn.execute("CREATE TABLE Users (Id INTEGER, Name TEXT, ts INTEGER)")
    conn.executemany("INSERT INTO Users VALUES (?, ?, ?)",
                     [(1, "alice", 100), (2, "bob", 100),
                      (3, "carol", 101)])
    conn.commit()
    conn.close()
    return path


def _src(db_path, sqls, **kw):
    return {"type": "sql",
            "database": {"type": "sqlite",
                         "connectorConfig": {
                             "connectURI": f"jdbc:sqlite:{db_path}"}},
            "sqls": sqls, **kw}


def test_connect_uri_forms(db_path):
    for uri in (f"jdbc:sqlite:{db_path}", f"sqlite:{db_path}",
                f"sqlite://{db_path}"):
        conn = connect_from_uri(uri)
        assert conn.execute("SELECT COUNT(*) FROM Users") \
                   .fetchone()[0] == 3
        conn.close()


def test_unregistered_scheme_raises():
    with pytest.raises(NotImplementedError, match="no DB-API driver"):
        connect_from_uri("jdbc:oracle:thin:@x")


def test_sql_input_source_reads_rows(spark, db_path):
    df = read_input(spark, {"inputSource": _src(
        db_path, ["SELECT Id, Name FROM Users ORDER BY Id"])})
    assert [tuple(r) for r in df.collect()] == [
        (1, "alice"), (2, "bob"), (3, "carol")]
    assert df.columns == ["Id", "Name"]


def test_sql_input_source_fold_case_and_multi_sqls(spark, db_path):
    # foldCase lowercases result column names (SqlInputSource.java);
    # the sqls LIST is the split unit — rows concatenate
    df = read_sql_input(spark, _src(
        db_path, ["SELECT Id, Name FROM Users WHERE Id <= 1",
                  "SELECT Id, Name FROM Users WHERE Id > 2"],
        foldCase=True))
    assert df.columns == ["id", "name"]
    assert sorted(r.id for r in df.collect()) == [1, 3]


def test_sql_input_source_requires_queries(spark, db_path):
    with pytest.raises(ValueError, match="No SQL queries provided"):
        read_sql_input(spark, _src(db_path, []))


def test_jdbc_lookup_load_filter_and_sql(spark, db_path):
    from druid_spark import DruidSparkEngine
    eng = DruidSparkEngine(spark)
    m = load_jdbc_lookup(
        eng, "users", _src(db_path, [])["database"], table="Users",
        key_column="Id", value_column="Name", filter="Id < 3")
    assert m == {"1": "alice", "2": "bob"}
    got = eng.sql("SELECT LOOKUP('2', 'users') AS v").collect()[0].v
    assert got == "bob"


def test_jdbc_lookup_ts_column_version_gate(spark, db_path):
    # JdbcCacheGenerator: reload ONLY when MAX(tsColumn) advances;
    # the reload is the FULL map (change detection, not row deltas)
    from druid_spark import DruidSparkEngine
    from druid_spark.lookups import JdbcLookupPoller
    eng = DruidSparkEngine(spark)
    db = _src(db_path, [])["database"]
    poller = JdbcLookupPoller(eng, "users_ts", db, table="Users",
                              key_column="Id", value_column="Name",
                              ts_column="ts")
    assert poller.poll_once() is True           # initial load
    assert poller.poll_once() is False          # MAX(ts) unchanged
    conn = sqlite3.connect(db_path)
    conn.execute("INSERT INTO Users VALUES (4, 'dave', 102)")
    conn.execute("UPDATE Users SET Name = 'ALICE' WHERE Id = 1")
    conn.commit()
    conn.close()
    assert poller.poll_once() is True           # version advanced
    lk = eng.catalog.lookups["users_ts"]
    assert lk["4"] == "dave" and lk["1"] == "ALICE"  # full reload
    assert poller.poll_once() is False
