"""groupBy query → hash aggregation over N dims.

Reference: processing/.../query/groupby/GroupByQuery.java:89,
GroupingEngine.java:113. Druid's ByteBuffer hash tables, spill,
parallel combine (epinephelinae/*) are all Spark's HashAggregateExec +
Tungsten spill — the compile just declares groupBy(dims).agg(...).

having → post-agg filter; limitSpec → orderBy+limit (Spark plans
TakeOrderedAndProject, the analog of Druid's limit pushdown
GroupByQuery.java:462); subtotalsSpec → grouping sets.

MVD semantics: grouping on a multi-value (array) dim explodes rows per
value (docs/querying/multi-value-dimensions.md:355) — applied here as a
pre-explode of array-typed group keys.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from druid_spark import granularity as G
from druid_spark.aggregations import AggCompiler, PostAggCompiler, SketchPlan
from druid_spark.dimensions import dimension
from druid_spark.engine import qcol
from druid_spark.filters import FilterCompiler


def compile_query(engine, q: dict) -> DataFrame:
    ctx = engine.prepare(q)
    res = ctx.resolver()
    df = ctx.df

    # dimensions (+ MVD explode)
    dim_cols: list[tuple[str, Column]] = []
    for spec in q.get("dimensions") or []:
        name, col = dimension(spec, res, df)
        dim_cols.append((name, col))

    # explode array-typed keys (multi-value group semantics) — unless
    # the spec declares outputType ARRAY<...>, which is the reference's
    # group-by-the-whole-array semantics (arrayIngestMode=array /
    # GroupByQuery on ARRAY columns), not an MVD
    declared_array = set()
    for spec in q.get("dimensions") or []:
        if isinstance(spec, dict) and str(
                spec.get("outputType", "")).upper().startswith("ARRAY"):
            declared_array.add(spec.get("outputName")
                               or spec.get("dimension"))
    exploded = {}
    probe = df.select(*[c.alias(n) for n, c in dim_cols]) if dim_cols else None
    if probe is not None:
        for f in probe.schema.fields:
            if isinstance(f.dataType, T.ArrayType) \
                    and f.name not in declared_array:
                exploded[f.name] = True
    for name, col in dim_cols:
        if name in exploded:
            df = df.withColumn(f"__mv_{name}", F.explode_outer(col))
    dim_exprs = [
        (F.col(f"__mv_{n}") if n in exploded else c).alias(n) for n, c in dim_cols
    ]

    gran = q.get("granularity", "all")
    grain_all = gran in (None, "all") or (
        isinstance(gran, dict) and gran.get("type") == "all")
    keys = list(dim_exprs)
    if not grain_all:
        keys = [G.bucket(res("__time"), gran).alias("__time")] + keys

    plan = SketchPlan(q.get("aggregations"), q.get("postAggregations"))
    ac = AggCompiler(res, FilterCompiler(df, res, ctx.lookups),
                     engine.exact_approx, plan,
                     engine.sketch_default_nominal_entries,
                     finalize=q.get("context", {}).get("finalize",
                                                      True),
                     hllc_parity=getattr(engine, "hyperunique_parity",
                                         False))
    aggs = ac.compile_all(q.get("aggregations"))

    subtotals = q.get("subtotalsSpec")
    if subtotals:
        out = _subtotals(df, keys, aggs, subtotals)
    elif not aggs:
        # no aggregators: groupBy is a distinct over the dims
        out = df.select(*keys).distinct()
    else:
        out = df.groupBy(*keys).agg(*aggs) if keys else df.agg(*aggs)

    out = _apply_post(out, q.get("postAggregations"), plan)

    having = q.get("having")
    if having:
        out = out.where(_having(having, out))

    limit_spec = q.get("limitSpec")
    if limit_spec and limit_spec.get("type", "default") == "default":
        cols = limit_spec.get("columns") or []
        order = [_order_col(c) for c in cols]
        if order:
            out = out.orderBy(*order)
        # DefaultLimitSpec semantics: skip `offset` rows FIRST, then
        # return at most `limit` rows (DefaultLimitSpec.java — limit
        # counts post-offset rows; the reverse order would return
        # limit-offset rows)
        if limit_spec.get("offset"):
            out = out.offset(int(limit_spec["offset"]))
        if limit_spec.get("limit") is not None:
            out = out.limit(int(limit_spec["limit"]))
    return out


def _order_col(c) -> Column:
    if isinstance(c, str):
        return qcol(c)
    name, direction = c["dimension"], c.get("direction", "ascending")
    comparator = c.get("dimensionOrder", "lexicographic")
    col = qcol(name)
    # string comparators — query/ordering/StringComparators.java:34-39.
    # numeric: cast; alphanumeric/version: zero-pad digit runs so the
    # lexicographic order matches numeric-aware comparison (pure expr,
    # no UDF).
    if comparator == "numeric":
        col = col.cast("double")
    elif comparator == "alphanumeric":
        from druid_spark.filters import alnum_sort_key
        col = alnum_sort_key(col.cast("string"))
    elif comparator == "version":
        from druid_spark.filters import version_sort_key
        col = version_sort_key(col.cast("string"))
    elif comparator == "strlen":
        col = F.struct(F.length(qcol(name)), qcol(name))
    return col.desc() if direction.lower().startswith("desc") else col.asc()


def _having(h: dict, df: DataFrame) -> Column:
    t = h["type"]
    if t == "and":
        out = F.lit(True)
        for s in h["havingSpecs"]:
            out = out & _having(s, df)
        return out
    if t == "or":
        out = F.lit(False)
        for s in h["havingSpecs"]:
            out = out | _having(s, df)
        return out
    if t == "not":
        return ~_having(h["havingSpec"], df)
    if t == "greaterThan":
        return qcol(h["aggregation"]) > F.lit(h["value"])
    if t == "lessThan":
        return qcol(h["aggregation"]) < F.lit(h["value"])
    if t == "equalTo":
        return qcol(h["aggregation"]) == F.lit(h["value"])
    if t == "dimSelector":
        return qcol(h["dimension"]) == F.lit(h["value"])
    if t == "filter":
        return FilterCompiler(df, qcol).compile(h["filter"])
    if t == "always":
        return F.lit(True)
    raise NotImplementedError(f"having {t}")


def _apply_post(out: DataFrame, pas: list[dict] | None,
                plan: SketchPlan | None = None) -> DataFrame:
    """Post-aggregators; a post-agg whose name matches an existing column
    replaces it (Druid forbids collisions, but replacement is the useful
    interpretation for e.g. in-place rounding). Sketch struct columns
    consumed by finalizers are dropped from the output — the finalized
    values replace the "sketch blob"."""
    if not pas:
        return out
    names = [p.get("name", p["type"]) for p in pas]
    consumed = set()
    if plan:
        consumed = set(plan.quant) | plan.theta_sets
    cols = PostAggCompiler(sketch_plan=plan).compile_all(pas)
    keep = [F.col("`" + c + "`") for c in out.columns
            if c not in names and c not in consumed]
    return out.select(*keep, *cols)


def _subtotals(df: DataFrame, keys: list[Column], aggs: list[Column],
               subtotals: list[list[str]]) -> DataFrame:
    """subtotalsSpec (GroupByQuery.java:124) → GROUPING SETS. Spark 4's
    DataFrame.groupingSets — one pass, partial-agg reuse. Keys are
    pre-projected because groupingSets matches grouping expressions by
    equality, which aliased Columns defeat; fall back to a union of
    groupBys on older Spark (still correct, one scan per set)."""
    key_names = [df.select(k).columns[0] for k in keys]
    proj = df
    for n, k in zip(key_names, keys):
        proj = proj.withColumn("__gs_" + n, k)
    gcols = {n: F.col("__gs_" + n) for n in key_names}
    if hasattr(proj, "groupingSets"):
        sets = [[gcols[n] for n in st] for st in subtotals]
        out = proj.groupingSets(sets, *gcols.values()).agg(*aggs)
    else:
        parts = []
        for st in subtotals:
            part = proj.groupBy(*[gcols[n] for n in st]).agg(*aggs)
            for missing in key_names:
                if missing not in st:
                    part = part.withColumn("__gs_" + missing, F.lit(None))
            parts.append(part.select(*["__gs_" + n for n in key_names],
                                     *[c for c in part.columns
                                       if not c.startswith("__gs_")]))
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
    for n in key_names:
        out = out.withColumnRenamed("__gs_" + n, n)
    return out
