"""Authn/authz on the HTTP surfaces (DruidPlanner.java:216 authorize
step, AuthorizationUtils, basic-security extension analogs): 401 on
bad/missing credentials, 403 on unauthorized resources, authorized
happy paths across all five endpoint families, permission-filtered
datasource listings."""

import base64
import json
import urllib.error
import urllib.request

import pytest


@pytest.fixture(scope="module")
def secured(engine):
    from druid_spark.security import (BasicAuthenticator, MapAuthorizer,
                                      DATASOURCE, STATE, EXTERNAL,
                                      READ, WRITE)
    from druid_spark.server import DruidHttpServer
    auth = BasicAuthenticator({"alice": "secret", "bob": "hunter2",
                               "carol": "pw"})
    authz = MapAuthorizer({
        # alice: read-only on the two small dims + system tables
        "alice": [(DATASOURCE, "nation|region", READ),
                  (STATE, "STATE", READ)],
        # bob: full admin
        "bob": [(DATASOURCE, ".*", READ), (DATASOURCE, ".*", WRITE),
                (STATE, "STATE", READ), (STATE, "STATE", WRITE),
                (EXTERNAL, ".*", WRITE)],
        # carol: datasources only, no STATE
        "carol": [(DATASOURCE, ".*", READ)],
    })
    srv = DruidHttpServer(engine, authenticator=auth, authorizer=authz
                          ).start()
    yield srv
    srv.stop()


def _hdr(user, pw):
    tok = base64.b64encode(f"{user}:{pw}".encode()).decode()
    return {"Authorization": f"Basic {tok}",
            "Content-Type": "application/json"}


def _req(srv, path, obj=None, user=None, pw=None, method=None):
    headers = _hdr(user, pw) if user else {"Content-Type":
                                           "application/json"}
    data = json.dumps(obj).encode() if obj is not None else None
    req = urllib.request.Request(
        f"http://127.0.0.1:{srv.port}{path}", data=data, headers=headers,
        method=method or ("POST" if obj is not None else "GET"))
    try:
        with urllib.request.urlopen(req) as r:
            return r.status, json.loads(r.read() or b"null"), dict(r.headers)
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read() or b"null"), dict(e.headers)


NATIVE_NATION = {"queryType": "scan", "dataSource": "nation",
                 "columns": ["n_name"], "limit": 2}


def test_401_missing_and_bad_credentials(secured):
    code, body, headers = _req(secured, "/druid/v2", NATIVE_NATION)
    assert code == 401 and body["error"] == "Unauthorized"
    assert headers.get("WWW-Authenticate", "").startswith("Basic")
    code, body, _ = _req(secured, "/druid/v2", NATIVE_NATION,
                         user="alice", pw="wrong")
    assert code == 401
    # /status stays unsecured
    code, body, _ = _req(secured, "/status")
    assert code == 200 and "version" in body


def test_native_query_authorization(secured):
    code, body, _ = _req(secured, "/druid/v2", NATIVE_NATION,
                         user="alice", pw="secret")
    assert code == 200 and len(body[0]["events"]) == 2
    code, body, _ = _req(secured, "/druid/v2",
                         dict(NATIVE_NATION, dataSource="lineitem",
                              columns=["l_orderkey"]),
                         user="alice", pw="secret")
    assert code == 403 and body["error"] == "Forbidden"
    assert "lineitem" in body["errorMessage"]
    # join datasource: the unauthorized side is collected too
    code, body, _ = _req(secured, "/druid/v2", {
        "queryType": "groupBy", "dataSource": {
            "type": "join", "left": "nation",
            "right": {"type": "table", "name": "lineitem"},
            "rightPrefix": "j0.", "condition": "1 == 1",
            "joinType": "INNER"},
        "granularity": "all", "dimensions": [],
        "aggregations": [{"type": "count", "name": "n"}]},
        user="alice", pw="secret")
    assert code == 403
    # bob reads anything
    code, _, _ = _req(secured, "/druid/v2",
                      dict(NATIVE_NATION, dataSource="lineitem",
                           columns=["l_orderkey"]),
                      user="bob", pw="hunter2")
    assert code == 200


def test_sql_authorization(secured):
    code, rows, _ = _req(secured, "/druid/v2/sql",
                         {"query": "SELECT COUNT(*) AS n FROM nation"},
                         user="alice", pw="secret")
    assert code == 200 and rows[0]["n"] == 25
    code, body, _ = _req(secured, "/druid/v2/sql",
                         {"query": "SELECT COUNT(*) AS n FROM lineitem"},
                         user="alice", pw="secret")
    assert code == 403
    # INSERT needs WRITE on the target
    code, body, _ = _req(secured, "/druid/v2/sql", {
        "query": "REPLACE INTO sec_tgt OVERWRITE ALL "
                 "SELECT r_name FROM region PARTITIONED BY ALL"},
        user="alice", pw="secret")
    assert code == 403 and "sec_tgt" in body["errorMessage"]
    # sys.* needs STATE READ: alice has it, carol doesn't
    code, _, _ = _req(secured, "/druid/v2/sql",
                      {"query": "SELECT COUNT(*) AS n FROM sys.tasks"},
                      user="alice", pw="secret")
    assert code == 200
    code, body, _ = _req(secured, "/druid/v2/sql",
                         {"query": "SELECT COUNT(*) AS n FROM sys.tasks"},
                         user="carol", pw="pw")
    assert code == 403 and "STATE" in body["errorMessage"]


def test_statements_and_avatica_authorization(secured):
    import time
    # statements: alice allowed on region
    code, sub, _ = _req(secured, "/druid/v2/sql/statements",
                        {"query": "SELECT COUNT(*) AS n FROM region"},
                        user="alice", pw="secret")
    assert code == 202
    for _ in range(100):
        code, st, _ = _req(secured,
                           f"/druid/v2/sql/statements/{sub['queryId']}",
                           user="alice", pw="secret")
        if st["state"] in ("SUCCESS", "FAILED"):
            break
        time.sleep(0.1)
    assert st["state"] == "SUCCESS"
    # statements: denied table -> 403 before submission
    code, _, _ = _req(secured, "/druid/v2/sql/statements",
                      {"query": "SELECT COUNT(*) FROM orders"},
                      user="alice", pw="secret")
    assert code == 403
    # avatica: authorization applies to the carried SQL
    code, _, _ = _req(secured, "/druid/v2/sql/avatica",
                      {"request": "openConnection",
                       "connectionId": "sec1"},
                      user="alice", pw="secret")
    assert code == 200
    code, out, _ = _req(secured, "/druid/v2/sql/avatica",
                        {"request": "createStatement",
                         "connectionId": "sec1"},
                        user="alice", pw="secret")
    sid = out["statementId"]
    code, _, _ = _req(secured, "/druid/v2/sql/avatica",
                      {"request": "prepareAndExecute",
                       "connectionId": "sec1", "statementId": sid,
                       "sql": "SELECT COUNT(*) AS n FROM nation"},
                      user="alice", pw="secret")
    assert code == 200
    code, body, _ = _req(secured, "/druid/v2/sql/avatica",
                         {"request": "prepareAndExecute",
                          "connectionId": "sec1", "statementId": sid,
                          "sql": "SELECT COUNT(*) AS n FROM orders"},
                         user="alice", pw="secret")
    assert code == 403


def test_overlord_and_delete_authorization(secured):
    # task submission is a WRITE: alice denied, bob allowed
    noop = {"type": "noop", "id": "sec-noop-1", "runTime": 10}
    code, _, _ = _req(secured, "/druid/indexer/v1/task", noop,
                      user="alice", pw="secret")
    assert code == 403
    code, out, _ = _req(secured, "/druid/indexer/v1/task", noop,
                        user="bob", pw="hunter2")
    assert code == 200 and out["task"] == "sec-noop-1"
    # task listing is STATE READ: alice has it, carol doesn't
    code, _, _ = _req(secured, "/druid/indexer/v1/tasks",
                      user="alice", pw="secret")
    assert code == 200
    code, _, _ = _req(secured, "/druid/indexer/v1/tasks",
                      user="carol", pw="pw")
    assert code == 403
    # datasource delete is a WRITE
    code, _, _ = _req(secured, "/druid/coordinator/v1/datasources/nation",
                      user="alice", pw="secret", method="DELETE")
    assert code == 403


def test_listing_filtered_by_permission(secured):
    code, tables, _ = _req(secured, "/druid/v2/datasources",
                           user="alice", pw="secret")
    assert code == 200 and set(tables) == {"nation", "region"}
    code, tables, _ = _req(secured, "/druid/v2/datasources",
                           user="bob", pw="hunter2")
    assert code == 200 and "lineitem" in tables and "events" in tables
    # per-datasource schema endpoint gated the same way
    code, _, _ = _req(secured, "/druid/v2/datasources/lineitem",
                      user="alice", pw="secret")
    assert code == 403
    code, body, _ = _req(secured, "/druid/v2/datasources/nation",
                         user="alice", pw="secret")
    assert code == 200 and body["name"] == "nation"


def test_extern_export_requires_external_not_datasource(secured):
    """INSERT INTO EXTERN(...) is the export sink: it must authorize as
    EXTERNAL WRITE (which bob has), never as a WRITE on a datasource
    named 'EXTERN'."""
    from druid_spark.security import sql_resources, EXTERNAL, DATASOURCE
    res = sql_resources(
        ["region"],
        "INSERT INTO EXTERN(local(exportPath => '/tmp/x')) AS CSV "
        "SELECT r_name FROM region")
    assert (EXTERNAL, "EXTERNAL", "WRITE") in res
    assert not any(r == (DATASOURCE, "EXTERN", "WRITE") for r in res)
    assert (DATASOURCE, "region", "READ") in res
