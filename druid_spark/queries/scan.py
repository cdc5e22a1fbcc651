"""scan query → raw row retrieval.

Reference: processing/.../query/scan/ScanQuery.java:61, engine
ScanQueryEngine.java:64. Plain select/where/orderBy/limit/offset —
column pruning and filter pushdown reach the Parquet scan via Catalyst
(ReadSchema/PushedFilters), the analog of Druid's per-segment cursor
with column selection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from druid_spark.engine import qcol


def compile_query(engine, q: dict) -> DataFrame:
    ctx = engine.prepare(q)
    res = ctx.resolver()
    df = ctx.df

    cols = q.get("columns") or []
    if cols:
        df = df.select(*[res(c).alias(c) for c in cols])

    order_by = q.get("orderBy") or []
    order = []
    for ob in order_by:
        if isinstance(ob, str):
            order.append(qcol(ob).asc())
        else:
            c = qcol(ob["columnName"])
            order.append(c.desc() if str(ob.get("order", "ascending")).lower()
                         .startswith("desc") else c.asc())
    legacy = q.get("order")  # time order: none|ascending|descending
    if not order and legacy and legacy != "none" and "__time" in (cols or ["__time"]):
        c = qcol("__time")
        order = [c.desc() if legacy == "descending" else c.asc()]
    if order:
        df = df.orderBy(*order)

    offset = int(q.get("offset", 0) or 0)
    if offset:
        df = df.offset(offset)
    limit = q.get("limit")
    if limit is not None:
        df = df.limit(int(limit))
    return df
