"""timeBoundary + dataSourceMetadata queries.

Reference: processing/.../query/timeboundary/TimeBoundaryQuery.java:47,
datasourcemetadata/DataSourceMetadataQuery.java:43. A min/max agg —
Spark can often answer from Parquet footer stats without a full scan
(aggregate pushdown).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def compile_query(engine, q: dict) -> DataFrame:
    ctx = engine.prepare(q)
    bound = q.get("bound")
    t = ctx.resolver()("__time")
    if bound == "minTime":
        return ctx.df.agg(F.min(t).alias("minTime"))
    if bound == "maxTime":
        return ctx.df.agg(F.max(t).alias("maxTime"))
    return ctx.df.agg(F.min(t).alias("minTime"), F.max(t).alias("maxTime"))


def compile_dsmeta(engine, q: dict) -> DataFrame:
    ctx = engine.prepare(q)
    return ctx.df.agg(
        F.max(ctx.resolver()("__time")).alias("maxIngestedEventTime"))
