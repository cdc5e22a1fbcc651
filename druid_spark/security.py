"""Authentication + authorization for the HTTP surfaces.

The reference authorizes every query against the set of resources it
touches before execution (sql/calcite/planner/DruidPlanner.java:216
`authorize` step; server/.../server/security/AuthorizationUtils.java
`authorizeAllResourceActions`; SqlResource.java:132). Resources are
(type, name) pairs — DATASOURCE, STATE, EXTERNAL — with READ/WRITE
actions; the basic-security extension supplies the Basic-auth
authenticator and a role→permission-map authorizer.

Spark-side the model is identical: an Authenticator maps request
headers to an identity (401 when credentials are present but bad, or
required but missing), and an Authorizer gates each (identity,
resource, action) triple (403 on denial). Defaults are allow-all so an
unsecured deployment behaves exactly as before.
"""

from __future__ import annotations

import base64
import re
from typing import Iterable

READ = "READ"
WRITE = "WRITE"

DATASOURCE = "DATASOURCE"
STATE = "STATE"
EXTERNAL = "EXTERNAL"


class Authenticator:
    """Allow-all authenticator (AllowAllAuthenticator analog): every
    request authenticates as the 'allowAll' identity."""

    #: WWW-Authenticate challenge sent with 401s (None = no challenge)
    challenge: str | None = None

    def authenticate(self, headers) -> str | None:
        return "allowAll"


class BasicAuthenticator(Authenticator):
    """HTTP Basic auth against a user→password map (the
    basic-security extension's BasicHTTPAuthenticator analog)."""

    challenge = 'Basic realm="druid"'

    def __init__(self, users: dict[str, str]):
        self.users = dict(users)

    def authenticate(self, headers) -> str | None:
        h = headers.get("Authorization") or ""
        if not h.startswith("Basic "):
            return None
        try:
            user, _, pw = base64.b64decode(
                h[len("Basic "):].strip()).decode("utf-8").partition(":")
        except Exception:
            return None
        return user if self.users.get(user) == pw else None


class HeaderTokenAuthenticator(Authenticator):
    """Bearer-token map: Authorization: Bearer <token> → identity."""

    challenge = "Bearer"

    def __init__(self, tokens: dict[str, str]):
        self.tokens = dict(tokens)

    def authenticate(self, headers) -> str | None:
        h = headers.get("Authorization") or ""
        if not h.startswith("Bearer "):
            return None
        return self.tokens.get(h[len("Bearer "):].strip())


class Authorizer:
    """Allow-all authorizer (AllowAllAuthorizer analog)."""

    def authorize(self, identity: str, rtype: str, name: str,
                  action: str) -> bool:
        return True


class MapAuthorizer(Authorizer):
    """Role-map authorizer (BasicRoleBasedAuthorizer analog):
    permissions[identity] is a list of (resource_type, name_regex,
    action) grants; a triple is allowed when any grant matches. The
    name pattern is a full-match regex, like the reference's
    ResourceAction pattern matching."""

    def __init__(self, permissions: dict[str, list[tuple[str, str, str]]]):
        self.permissions = {
            ident: [(rt, re.compile(pat), act) for rt, pat, act in grants]
            for ident, grants in permissions.items()}

    def authorize(self, identity, rtype, name, action) -> bool:
        for rt, pat, act in self.permissions.get(identity, ()):
            if rt == rtype and act == action and pat.fullmatch(name or ""):
                return True
        return False


# ------------------------------------------------ resource collection
def native_query_resources(q) -> list[tuple[str, str, str]]:
    """Datasource READ resources for a native query — walks the
    composable datasource tree (DataSourceAnalysis getTableNames)."""
    names: set[str] = set()

    def walk(ds):
        if ds is None:
            return
        if isinstance(ds, str):
            names.add(ds)
            return
        if not isinstance(ds, dict):
            return
        t = ds.get("type")
        if t in ("table", "globalTable"):
            names.add(ds.get("name"))
        elif t == "union":
            for d in ds.get("dataSources", []):
                walk(d)
        elif t == "query":
            walk(ds.get("query", {}).get("dataSource"))
        elif t == "join":
            walk(ds.get("left"))
            walk(ds.get("right"))
        elif t in ("filter", "restrict", "unnest"):
            walk(ds.get("base"))
        # lookup/inline datasources carry no table resource

    if isinstance(q, dict):
        walk(q.get("dataSource"))
    return [(DATASOURCE, n, READ) for n in sorted(names) if n]


_INSERT_RE = re.compile(
    r"\b(?:INSERT|REPLACE)\s+INTO\s+(?:`([^`]+)`|([A-Za-z_][\w.]*))",
    re.IGNORECASE)
_SYS_RE = re.compile(r"\b(?:sys)\.\w+|\bINFORMATION_SCHEMA\.\w+",
                     re.IGNORECASE)
_EXTERN_RE = re.compile(r"\bEXTERN\s*\(", re.IGNORECASE)
_STRING_RE = re.compile(r"'(?:[^']|'')*'")


def sql_resources(tables: Iterable[str], text: str) \
        -> list[tuple[str, str, str]]:
    """Resources a SQL statement touches, by name-matching the known
    catalog tables outside string literals (the planner-level resource
    collection analog — DruidPlanner gathers them from the validated
    rel tree; a name scan over the known catalog gives the same set for
    this engine since every table reference must resolve to a catalog
    view). INSERT/REPLACE targets are WRITE; EXTERN is EXTERNAL WRITE;
    sys./INFORMATION_SCHEMA are STATE READ."""
    stripped = _STRING_RE.sub("''", text or "")
    out: list[tuple[str, str, str]] = []
    m = _INSERT_RE.search(stripped)
    target = (m.group(1) or m.group(2)) if m else None
    if target and target.upper() == "EXTERN":
        # INSERT INTO EXTERN(...) is the export sink, not a datasource
        # write — the EXTERNAL WRITE resource below covers it
        target = None
    if target:
        out.append((DATASOURCE, target, WRITE))
    for t in sorted(set(tables)):
        if t == target:
            continue
        if re.search(rf"(?<![\w`]){re.escape(t)}(?![\w`])", stripped) or \
                re.search(rf"`{re.escape(t)}`", text or ""):
            out.append((DATASOURCE, t, READ))
    if _EXTERN_RE.search(stripped):
        out.append((EXTERNAL, "EXTERNAL", WRITE))
    if _SYS_RE.search(stripped):
        out.append((STATE, "STATE", READ))
    return out
