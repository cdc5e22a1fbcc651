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
    basic-security extension's BasicHTTPAuthenticator analog).

    Runtime user administration mirrors BasicAuthenticatorResource
    (extensions-core/druid-basic-security/.../authentication/endpoint/
    BasicAuthenticatorResource.java): create/delete users and set
    credentials over HTTP. A created user without credentials exists
    but cannot authenticate (password None never matches)."""

    challenge = 'Basic realm="druid"'

    def __init__(self, users: dict[str, str] | None = None):
        self.users: dict[str, str | None] = dict(users or {})

    def authenticate(self, headers) -> str | None:
        h = headers.get("Authorization") or ""
        if not h.startswith("Basic "):
            return None
        try:
            user, _, pw = base64.b64decode(
                h[len("Basic "):].strip()).decode("utf-8").partition(":")
        except Exception:
            return None
        stored = self.users.get(user)
        return user if stored is not None and stored == pw else None

    # ------------------------------------------- runtime administration
    def user_names(self) -> list[str]:
        return sorted(self.users)

    def create_user(self, name: str) -> bool:
        """True if created, False if it already existed."""
        if name in self.users:
            return False
        self.users[name] = None
        return True

    def delete_user(self, name: str) -> bool:
        return self.users.pop(name, "\0missing") != "\0missing"

    def set_credentials(self, name: str, password: str) -> bool:
        """Set a user's password (BasicAuthenticatorResource
        updateUserCredentials). False if the user doesn't exist."""
        if name not in self.users:
            return False
        self.users[name] = password
        return True


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


class BasicRoleBasedAuthorizer(Authorizer):
    """Users→roles→permissions authorizer with runtime administration —
    the BasicRoleBasedAuthorizer + BasicAuthorizerResource analog
    (extensions-core/druid-basic-security/.../authorization/endpoint/
    BasicAuthorizerResource.java): users are assigned roles, roles
    carry permission triples, and all three levels are managed over
    HTTP. A permission is (resource_type, name_regex, action); the
    name pattern is a full-match regex like the reference's
    ResourceAction pattern matching."""

    def __init__(self,
                 users: dict[str, Iterable[str]] | None = None,
                 roles: dict[str, list[tuple[str, str, str]]]
                 | None = None):
        self.users: dict[str, set[str]] = {
            u: set(rs) for u, rs in (users or {}).items()}
        self.roles: dict[str, list[tuple[str, str, str]]] = {
            r: list(ps) for r, ps in (roles or {}).items()}
        self._compiled: dict[str, re.Pattern] = {}

    def _pat(self, pat: str) -> re.Pattern:
        c = self._compiled.get(pat)
        if c is None:
            c = self._compiled[pat] = re.compile(pat)
        return c

    def authorize(self, identity, rtype, name, action) -> bool:
        for role in self.users.get(identity, ()):
            for rt, pat, act in self.roles.get(role, ()):
                if rt == rtype and act == action and \
                        self._pat(pat).fullmatch(name or ""):
                    return True
        return False

    # ------------------------------------------- runtime administration
    def user_names(self) -> list[str]:
        return sorted(self.users)

    def role_names(self) -> list[str]:
        return sorted(self.roles)

    def get_user(self, name: str) -> dict | None:
        if name not in self.users:
            return None
        return {"name": name, "roles": sorted(self.users[name])}

    def get_role(self, name: str) -> dict | None:
        if name not in self.roles:
            return None
        return {"name": name,
                "permissions": [
                    {"resource": {"type": rt, "name": pat},
                     "action": act}
                    for rt, pat, act in self.roles[name]]}

    def create_user(self, name: str) -> bool:
        if name in self.users:
            return False
        self.users[name] = set()
        return True

    def delete_user(self, name: str) -> bool:
        return self.users.pop(name, None) is not None

    def create_role(self, name: str) -> bool:
        if name in self.roles:
            return False
        self.roles[name] = []
        return True

    def delete_role(self, name: str) -> bool:
        if name not in self.roles:
            return False
        del self.roles[name]
        for rs in self.users.values():
            rs.discard(name)
        return True

    def assign_role(self, user: str, role: str) -> bool:
        if user not in self.users or role not in self.roles:
            return False
        self.users[user].add(role)
        return True

    def unassign_role(self, user: str, role: str) -> bool:
        if user not in self.users or role not in self.users[user]:
            return False
        self.users[user].discard(role)
        return True

    def set_permissions(self, role: str, perms: list[dict]) -> bool:
        """Replace a role's permissions (BasicAuthorizerResource
        setRolePermissions). Each perm is the reference JSON shape
        {"resource": {"type": ..., "name": <regex>}, "action": ...};
        bad regexes raise ValueError (the reference 400s)."""
        if role not in self.roles:
            return False
        triples = []
        for p in perms:
            res = p.get("resource") or {}
            rt, pat = res.get("type"), res.get("name", "")
            act = p.get("action")
            try:
                re.compile(pat)
            except re.error as e:
                raise ValueError(f"bad permission regex {pat!r}: {e}")
            triples.append((rt, pat, act))
        self.roles[role] = triples
        return True


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
