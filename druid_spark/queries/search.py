"""search query → find dimension VALUES matching a predicate.

Reference: processing/.../query/search/SearchQuery.java:45 (strategies
UseIndexesStrategy.java:57 / CursorOnlyStrategy.java:37 — we have no
bitmap indexes; the Spark plan is a per-dimension distinct-count, which
Catalyst executes as partial aggs; the per-dim frames union together).
Output rows: (dimension, value, count).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def compile_query(engine, q: dict) -> DataFrame:
    ctx = engine.prepare(q)
    res = ctx.resolver()
    df = ctx.df
    dims = q.get("searchDimensions")
    if not dims:
        dims = [f.name for f in df.schema.fields
                if isinstance(f.dataType, (T.StringType, T.ArrayType))
                and f.name != "__time"]

    sq = q.get("query", {"type": "insensitive_contains", "value": ""})
    parts = []
    for d in dims:
        name = d if isinstance(d, str) else d["dimension"]
        col = res(name)
        is_mv = isinstance(df.schema[name].dataType, T.ArrayType) \
            if name in df.columns else False
        val = F.explode(col) if is_mv else col.cast("string")
        part = (df.select(val.alias("value"))
                .where(_match(sq, F.col("value")))
                .groupBy("value").agg(F.count(F.lit(1)).alias("count"))
                .select(F.lit(name).alias("dimension"), "value", "count"))
        parts.append(part)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    # SearchSortSpec (search/SearchSortSpec.java): lexicographic
    # (default), strlen (by value length then value), alphanumeric
    # (numeric-aware sort key)
    sort = (q.get("sort") or {}).get("type", "lexicographic")
    if sort == "strlen":
        out = out.orderBy("dimension", F.length("value"), "value")
    elif sort == "alphanumeric":
        from druid_spark.filters import alnum_sort_key
        out = out.orderBy("dimension", alnum_sort_key(F.col("value")),
                          "value")
    else:
        out = out.orderBy("dimension", "value")
    limit = q.get("limit")
    if limit:
        out = out.limit(int(limit))
    return out


def _match(sq: dict, c: Column) -> Column:
    t = sq["type"]
    if t == "insensitive_contains":
        return F.lower(c).contains(str(sq["value"]).lower())
    if t == "contains":
        if sq.get("caseSensitive", True):
            return c.contains(sq["value"])
        return F.lower(c).contains(str(sq["value"]).lower())
    if t == "fragment":
        out = F.lit(True)
        for frag in sq["values"]:
            if sq.get("caseSensitive", True):
                out = out & c.contains(frag)
            else:
                out = out & F.lower(c).contains(frag.lower())
        return out
    if t == "regex":
        return c.rlike(sq["pattern"])
    if t == "all":   # AllSearchQuerySpec — every value matches
        return F.lit(True)
    raise NotImplementedError(f"search query {t}")
