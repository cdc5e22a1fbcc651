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
    dim_name, dim_col = dimension(q["dimension"], res, ctx.df)
    plan = SketchPlan(q.get("aggregations"), q.get("postAggregations"))
    ac = AggCompiler(res, ctx.filter_compiler(), engine.exact_approx, plan,
                     engine.sketch_default_nominal_entries,
                     finalize=q.get("context", {}).get("finalize",
                                                      True),
                     hllc_parity=getattr(engine, "hyperunique_parity",
                                         False))
    aggs = ac.compile_all(q.get("aggregations"))
    threshold = int(q["threshold"])

    gran = q.get("granularity", "all")
    grain_all = gran in (None, "all") or (
        isinstance(gran, dict) and gran.get("type") == "all")

    keys = [dim_col.alias(dim_name)]
    if not grain_all:
        keys = [G.bucket(res("__time"), gran).alias("__time")] + keys

    from druid_spark.queries.groupby import _apply_post
    approx = bool(q.get("context", {}).get("approximateTopN"))
    if approx and grain_all and _re_aggregatable(q.get("aggregations")):
        out = _approx_topn(ctx.df, keys[-1], dim_name, q, aggs, threshold)
    else:
        out = ctx.df.groupBy(*keys).agg(*aggs)
    out = _apply_post(out, q.get("postAggregations"), plan)

    order = _metric_order(q.get("metric"), dim_name)
    if grain_all:
        return out.orderBy(*order).limit(threshold)
    w = Window.partitionBy("__time").orderBy(*order)
    return (out.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") <= threshold).drop("__rn")
            .orderBy("__time", *order))


_RE_AGG_OK = {"count", "longSum", "doubleSum", "floatSum", "longMin",
              "doubleMin", "floatMin", "longMax", "doubleMax", "floatMax"}


def _re_aggregatable(aggs) -> bool:
    """partial results can be re-merged by summing/min/max-ing — the same
    condition under which Druid's per-segment topN merge is closed."""
    return bool(aggs) and all(a["type"] in _RE_AGG_OK for a in aggs)


def _approx_topn(df, dim_key, dim_name, q, aggs, threshold):
    """Druid's approximate topN (TopNQueryEngine.java:200 — per-segment
    top K' then merge). Spark shape: aggregate per (input partition, dim),
    keep each partition's top K' = max(1000, 2K) by the metric, then
    re-aggregate the survivors by dim. For high-cardinality dims this
    shuffles numPartitions·K' rows instead of |dim| rows; results may
    miss a true top-K entry exactly like the reference's algorithm.
    Enabled by context.approximateTopN (default exact — SURVEY §7.3.6)."""
    # per-partition K' — the analog of the reference's per-segment
    # max(1000, threshold) candidate pool (TopNQueryEngine merge);
    # context.approximateTopNPartitionK overrides for disagreement tests
    kprime = int(q.get("context", {}).get("approximateTopNPartitionK")
                 or max(1000, 2 * threshold))
    partial = df.groupBy(F.spark_partition_id().alias("__pid"),
                         dim_key).agg(*aggs)
    w = Window.partitionBy("__pid").orderBy(
        *_metric_order(q.get("metric"), dim_name))
    trimmed = (partial.withColumn("__rk", F.row_number().over(w))
               .where(F.col("__rk") <= kprime).drop("__rk", "__pid"))
    # final merge: re-aggregate survivors (sum/min/max are re-mergeable)
    remerge = []
    for a in q.get("aggregations") or []:
        t, name = a["type"], a.get("name", a["type"])
        c = F.col("`" + name + "`")
        if t in ("count", "longSum", "doubleSum", "floatSum"):
            m = F.sum(c)
            if t in ("count", "longSum"):
                m = m.cast("long")
        elif t.endswith("Min"):
            m = F.min(c)
        else:
            m = F.max(c)
        remerge.append(m.alias(name))
    return trimmed.groupBy(qcol(dim_name)).agg(*remerge)


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
        # invert: rebuild the delegate's ordering with opposite direction
        base = metric["metric"]
        if isinstance(base, str):
            return [qcol(base).asc(), qcol(dim_name).asc()]
        if base.get("type") == "numeric":
            return [qcol(base["metric"]).asc(), qcol(dim_name).asc()]
        if base.get("type") == "dimension":
            return [qcol(dim_name).desc()]
        raise NotImplementedError(f"inverted over {base}")
    if t == "dimension":
        ordering = metric.get("ordering", "lexicographic")
        col = qcol(dim_name)
        if ordering == "numeric":
            col = col.cast("double")
        return [col.asc()]
    raise NotImplementedError(f"topN metric spec {t}")
