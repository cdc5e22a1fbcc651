"""topN query → per-dimension top-K by metric.

Reference: processing/.../query/topn/TopNQuery.java:52, engine
TopNQueryEngine.java:63. Druid's topN is *approximate* (per-segment K
then merge, PooledTopNAlgorithm.java:69); our default is exact
(groupBy → orderBy → limit K) — Spark plans this as partial agg +
TakeOrderedAndProject, which is already the "per-partition top-K then
merge" shape but lossless. Exactness is a feature for the oracle
(SURVEY §2.7); `context.approximateTopN` opts into a per-partition
pre-trim for very high-cardinality dims.

With a non-"all" granularity, top-K per time bucket via row_number
window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from druid_spark import granularity as G
from druid_spark.aggregations import AggCompiler, PostAggCompiler, SketchPlan
from druid_spark.dimensions import dimension
from druid_spark.engine import qcol


def compile_query(engine, q: dict) -> DataFrame:
    ctx = engine.prepare(q)
    res = ctx.resolver()
    dim_name, dim_col = dimension(q["dimension"], res)
    plan = SketchPlan(q.get("aggregations"), q.get("postAggregations"))
    ac = AggCompiler(res, ctx.filter_compiler(), engine.exact_approx, plan)
    aggs = ac.compile_all(q.get("aggregations"))
    threshold = int(q["threshold"])

    gran = q.get("granularity", "all")
    grain_all = gran in (None, "all") or (
        isinstance(gran, dict) and gran.get("type") == "all")

    keys = [dim_col.alias(dim_name)]
    if not grain_all:
        keys = [G.bucket(res("__time"), gran).alias("__time")] + keys

    from druid_spark.queries.groupby import _apply_post
    out = ctx.df.groupBy(*keys).agg(*aggs)
    out = _apply_post(out, q.get("postAggregations"), plan)

    order = _metric_order(q.get("metric"), dim_name)
    if grain_all:
        return out.orderBy(*order).limit(threshold)
    w = Window.partitionBy("__time").orderBy(*order)
    return (out.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") <= threshold).drop("__rn")
            .orderBy("__time", *order))


def _metric_order(metric, dim_name: str):
    """TopNMetricSpec: numeric (desc by metric), inverted, dimension
    (lexicographic by dim value). Secondary sort on the dimension keeps
    results deterministic for the oracle."""
    if metric is None:
        return [qcol(dim_name).asc()]
    if isinstance(metric, str):
        return [qcol(metric).desc(), qcol(dim_name).asc()]
    t = metric.get("type", "numeric")
    if t == "numeric":
        return [qcol(metric["metric"]).desc(), qcol(dim_name).asc()]
    if t == "inverted":
        inner = _metric_order(metric["metric"], dim_name)
        flipped = []
        for c in inner:
            s = str(c)
            flipped.append(c)
        # invert: rebuild with opposite direction
        base = metric["metric"]
        if isinstance(base, str):
            return [qcol(base).asc(), qcol(dim_name).asc()]
        if base.get("type") == "numeric":
            return [qcol(base["metric"]).asc(), qcol(dim_name).asc()]
        if base.get("type") == "dimension":
            return [qcol(dim_name).desc()]
        return flipped
    if t == "dimension":
        ordering = metric.get("ordering", "lexicographic")
        col = qcol(dim_name)
        if ordering == "numeric":
            col = col.cast("double")
        return [col.asc()]
    raise NotImplementedError(f"topN metric spec {t}")
