"""Runtime security administration + audit + lookup tiers (round 6):
BasicAuthenticatorResource / BasicAuthorizerResource CRUD analogs
(extensions-core/druid-basic-security/.../endpoint/), the AuditManager
audit trail (server/.../server/audit/SQLAuditManager.java), and
tier-scoped lookups (LookupCoordinatorResource.java)."""

import base64
import json
import urllib.error
import urllib.request

import pytest


@pytest.fixture()
def adminsrv(engine):
    from druid_spark.security import (BasicAuthenticator,
                                      BasicRoleBasedAuthorizer,
                                      DATASOURCE, STATE, READ, WRITE)
    from druid_spark.server import DruidHttpServer
    auth = BasicAuthenticator({"admin": "adminpw"})
    authz = BasicRoleBasedAuthorizer(
        users={"admin": ["admin_role"]},
        roles={"admin_role": [(DATASOURCE, ".*", READ),
                              (DATASOURCE, ".*", WRITE),
                              (STATE, "STATE", READ),
                              (STATE, "STATE", WRITE)]})
    srv = DruidHttpServer(engine, authenticator=auth,
                          authorizer=authz).start()
    yield srv
    srv.stop()


def _req(srv, path, obj=None, user=None, pw=None, method=None):
    headers = {"Content-Type": "application/json"}
    if user:
        tok = base64.b64encode(f"{user}:{pw}".encode()).decode()
        headers["Authorization"] = f"Basic {tok}"
    data = json.dumps(obj).encode() if obj is not None else None
    req = urllib.request.Request(
        f"http://127.0.0.1:{srv.port}{path}", data=data, headers=headers,
        method=method or ("POST" if obj is not None else "GET"))
    try:
        with urllib.request.urlopen(req) as r:
            return r.status, json.loads(r.read() or b"null")
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read() or b"null")


AUTHN = "/druid-ext/basic-security/authentication/db/basic"
AUTHZ = "/druid-ext/basic-security/authorization/db/basic"


def test_user_role_crud_401_to_200_transition(adminsrv):
    """The VERDICT-prescribed e2e: create a user + role over HTTP,
    grant a permission, and watch the same request flip 401 → 403 →
    200 as each piece lands."""
    A = dict(user="admin", pw="adminpw")
    # before: carol cannot even authenticate
    code, _ = _req(adminsrv, "/druid/v2/sql",
                   {"query": "SELECT COUNT(*) AS n FROM region"},
                   user="carol", pw="cpw")
    assert code == 401
    # authentication: create user + credentials
    code, _ = _req(adminsrv, f"{AUTHN}/users/carol", {}, **A)
    assert code == 200
    code, users = _req(adminsrv, f"{AUTHN}/users", **A)
    assert "carol" in users
    code, u = _req(adminsrv, f"{AUTHN}/users/carol", **A)
    assert u == {"username": "carol", "credentials": {"set": False}}
    code, _ = _req(adminsrv, f"{AUTHN}/users/carol/credentials",
                   {"password": "cpw"}, **A)
    assert code == 200
    # authenticated now, but no grants: 403
    code, _ = _req(adminsrv, "/druid/v2/sql",
                   {"query": "SELECT COUNT(*) AS n FROM region"},
                   user="carol", pw="cpw")
    assert code == 403
    # authorization: user + role + permission + assignment
    for p in (f"{AUTHZ}/users/carol", f"{AUTHZ}/roles/readers"):
        code, _ = _req(adminsrv, p, {}, **A)
        assert code == 200
    code, _ = _req(adminsrv, f"{AUTHZ}/roles/readers/permissions",
                   [{"resource": {"type": "DATASOURCE",
                                  "name": "region|nation"},
                     "action": "READ"}], **A)
    assert code == 200
    code, _ = _req(adminsrv, f"{AUTHZ}/users/carol/roles/readers",
                   {}, **A)
    assert code == 200
    code, body = _req(adminsrv, "/druid/v2/sql",
                      {"query": "SELECT COUNT(*) AS n FROM region"},
                      user="carol", pw="cpw")
    assert code == 200 and body[0]["n"] == 5
    # still scoped: other tables stay 403
    code, _ = _req(adminsrv, "/druid/v2/sql",
                   {"query": "SELECT COUNT(*) AS n FROM orders"},
                   user="carol", pw="cpw")
    assert code == 403
    # introspection endpoints
    code, role = _req(adminsrv, f"{AUTHZ}/roles/readers", **A)
    assert role["permissions"][0]["resource"]["name"] == "region|nation"
    code, uz = _req(adminsrv, f"{AUTHZ}/users/carol", **A)
    assert uz["roles"] == ["readers"]
    # delete the role: access revoked immediately
    code, _ = _req(adminsrv, f"{AUTHZ}/roles/readers", **A,
                   method="DELETE")
    assert code == 200
    code, _ = _req(adminsrv, "/druid/v2/sql",
                   {"query": "SELECT COUNT(*) AS n FROM region"},
                   user="carol", pw="cpw")
    assert code == 403
    # delete the authn user: back to 401
    code, _ = _req(adminsrv, f"{AUTHN}/users/carol", **A,
                   method="DELETE")
    assert code == 200
    code, _ = _req(adminsrv, "/druid/v2/sql",
                   {"query": "SELECT COUNT(*) AS n FROM region"},
                   user="carol", pw="cpw")
    assert code == 401
    # non-admin may not administer security (STATE WRITE required)
    code, _ = _req(adminsrv, f"{AUTHN}/users/mallory", {},
                   user="admin", pw="wrong")
    assert code == 401


def test_audit_trail_for_config_mutations(adminsrv, engine):
    """Config mutations are audited with author identity (AuditManager
    contract): compaction config, rules, lookups, security CRUD; the
    history endpoint filters by key/type."""
    A = dict(user="admin", pw="adminpw")
    code, _ = _req(adminsrv, "/druid/coordinator/v1/config/compaction",
                   {"dataSource": "auditds", "targetFiles": 2}, **A)
    assert code == 200
    code, _ = _req(adminsrv, "/druid/coordinator/v1/rules/auditds",
                   [{"type": "loadForever"}], **A)
    assert code == 200
    code, _ = _req(adminsrv,
                   "/druid/coordinator/v1/lookups/config/__default/audlk",
                   {"lookupExtractorFactory": {
                       "type": "map", "map": {"1": "one"}}}, **A)
    assert code == 202
    code, hist = _req(adminsrv, "/druid/coordinator/v1/audit", **A)
    assert code == 200
    by_type = {}
    for e in hist:
        by_type.setdefault(e["type"], []).append(e)
    assert by_type["compaction.config"][-1]["key"] == "auditds"
    assert by_type["compaction.config"][-1]["auditInfo"]["author"] \
        == "admin"
    assert by_type["rules"][-1]["payload"] == [{"type": "loadForever"}]
    assert by_type["lookups"][-1]["key"] == "__default/audlk"
    # filtered queries
    code, hist = _req(adminsrv,
                      "/druid/coordinator/v1/audit?type=rules", **A)
    assert all(e["type"] == "rules" for e in hist) and hist
    code, hist = _req(adminsrv, "/druid/coordinator/v1/rules/history",
                      **A)
    assert hist and hist[-1]["key"] == "auditds"
    # security mutations audit too
    code, _ = _req(adminsrv, f"{AUTHN}/users/audituser", {}, **A)
    assert code == 200
    code, hist = _req(
        adminsrv, "/druid/coordinator/v1/audit?type=basic-security", **A)
    assert hist[-1]["payload"]["action"] == "createUser"
    assert hist[-1]["auditInfo"]["author"] == "admin"


def test_lookup_tiers_crud_and_resolution(adminsrv, engine):
    """Tier-scoped lookup CRUD (LookupCoordinatorResource manages
    arbitrary tiers) and tier-qualified resolution in LOOKUP()."""
    A = dict(user="admin", pw="adminpw")
    code, _ = _req(adminsrv,
                   "/druid/coordinator/v1/lookups/config/hot/colors",
                   {"lookupExtractorFactory": {
                       "type": "map", "map": {"r": "red", "g": "green"}}},
                   **A)
    assert code == 202
    code, tiers = _req(adminsrv, "/druid/coordinator/v1/lookups/config",
                       **A)
    assert "hot" in tiers and "__default" in tiers
    code, names = _req(adminsrv,
                       "/druid/coordinator/v1/lookups/config/hot", **A)
    assert names == ["colors"]
    code, spec = _req(
        adminsrv, "/druid/coordinator/v1/lookups/config/hot/colors", **A)
    assert spec["lookupExtractorFactory"]["map"] == {"r": "red",
                                                     "g": "green"}
    # unknown tier → 404
    code, _ = _req(adminsrv,
                   "/druid/coordinator/v1/lookups/config/cold", **A)
    assert code == 404
    # tier-qualified resolution in SQL LOOKUP()
    row = engine.sql(
        "SELECT LOOKUP('g', 'hot/colors') AS v").collect()[0]
    assert row["v"] == "green"
    # default tier still resolves by plain name
    engine.catalog.register_lookup("plainlk", {"x": "y"})
    row = engine.sql("SELECT LOOKUP('x', 'plainlk') AS v").collect()[0]
    assert row["v"] == "y"
    # tiered DELETE
    code, _ = _req(adminsrv,
                   "/druid/coordinator/v1/lookups/config/hot/colors",
                   **A, method="DELETE")
    assert code == 202
    code, tiers = _req(adminsrv, "/druid/coordinator/v1/lookups/config",
                       **A)
    assert "hot" not in tiers  # empty non-default tier is dropped


def test_audit_retention_purges_file_keeps_ring(tmp_path):
    """Round 7 (VERDICT r6 #7): audit retention bounds the JSONL file
    of a long-lived server (KillAuditLog / SQLAuditManager
    durationToRetain analog) — old entries age out of the FILE on a
    purge cycle while the capacity-bounded ring keeps serving the
    recent window."""
    import json
    import time

    from druid_spark.metrics import AuditLog

    p = str(tmp_path / "audit.jsonl")
    log = AuditLog(path=p, retention_seconds=3600)
    # two "old" entries (stamped now, purged against a future 'now')
    log.record("k.old", "test.type", {"v": 1}, author="a")
    log.record("k.old2", "test.type", {"v": 2}, author="a")
    t_mid = time.time() + 7200          # both entries now >1h old
    log.record("k.recent", "test.type", {"v": 3}, author="a")
    # hand-age the first two lines so the purge has a real boundary
    lines = [json.loads(ln) for ln in open(p)]
    for e in lines[:2]:
        e["auditTime"] = "2020-01-01T00:00:00Z"
    with open(p, "w") as fh:
        for e in lines:
            fh.write(json.dumps(e) + "\n")
    dropped = log.purge(now=time.time())
    assert dropped == 2
    kept = [json.loads(ln) for ln in open(p)]
    assert [e["key"] for e in kept] == ["k.recent"]
    # the ring still serves all three (recent window, capacity-bounded)
    assert [e["key"] for e in log.history()] == \
        ["k.old", "k.old2", "k.recent"]
    # idempotent: nothing left to drop
    assert log.purge(now=t_mid - 7200) == 0


def test_audit_retention_amortized_purge(tmp_path):
    """The 128-record amortized purge trigger fires without an explicit
    purge() call, keeping a long-lived server's file bounded."""
    import json
    import time

    from druid_spark.metrics import AuditLog

    p = str(tmp_path / "audit2.jsonl")
    log = AuditLog(path=p, retention_seconds=0.0)  # horizon = now
    for i in range(127):
        log.record(f"k{i}", "t", i)
    assert len([1 for _ in open(p)]) == 127      # not yet triggered
    time.sleep(1.1)  # second-granularity stamps: age them past now
    log.record("k127", "t", 127)                 # 128th triggers purge
    remaining = [json.loads(ln)["key"] for ln in open(p)]
    assert len(remaining) <= 1                   # file bounded
    assert len(log) == 128                       # ring intact
