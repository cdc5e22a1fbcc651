"""URL parsing / normalization for web-corpus pipelines.

Standard cleaning-stage helpers: split a URL into scheme / host /
path, derive the registrable domain (last two labels — a pragmatic
proxy; a full public-suffix list is a lookup-table join away), and
normalize for URL-level dedup. All pure ``regexp_extract`` Column
expressions (patterns valid under Java regex and RE2), JVM-side and
fully parallel.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_HOST = r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)"
_PATH = r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]+([^?#]*)"
_SCHEME = r"^([a-zA-Z][a-zA-Z0-9+.-]*)://"
_REG_DOMAIN = r"([^.]+\.[^.]+)$"


def url_scheme(url: Column) -> Column:
    return F.lower(F.regexp_extract(url, _SCHEME, 1))


def url_host(url: Column) -> Column:
    """Hostname (lowercased, port stripped)."""
    host = F.lower(F.regexp_extract(url, _HOST, 1))
    return F.regexp_replace(host, r":\d+$", "")


def url_path(url: Column) -> Column:
    return F.regexp_extract(url, _PATH, 1)


def registrable_domain(url: Column) -> Column:
    """Last two host labels (example.com for sub.example.com)."""
    return F.regexp_extract(url_host(url), _REG_DOMAIN, 1)


def normalize_url(url: Column) -> Column:
    """Canonical form for URL-level dedup: lowercase scheme+host,
    strip fragment, default ports, and trailing slash."""
    out = F.regexp_replace(url, r"#.*$", "")          # fragment
    out = F.regexp_replace(out, r":(80|443)/", "/")   # default ports
    out = F.regexp_replace(out, r"/+$", "")           # trailing slash
    host = url_host(url)
    scheme = url_scheme(url)
    rest = F.regexp_extract(out, r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]+(.*)$", 1)
    return F.concat(scheme, F.lit("://"), host, rest)
