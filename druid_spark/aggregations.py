"""Aggregator + post-aggregator specs → Spark aggregate Columns.

Reference registry: processing/.../jackson/AggregatorsModule.java:119-169
(core aggs + post-aggs); extension aggs (datasketches/stats/bloom) get
Spark-native equivalents (approx_count_distinct, approx_percentile,
var_samp, bloom_filter_agg-style).

Spark's partial→final HashAggregate replicates Druid's per-segment
partial / broker final merge (AggregatorFactory.combine) for free —
these are plain `F.*` aggregate expressions, executed with map-side
partial aggregation and Tungsten spill.

first/last are time-ordered in Druid (SURVEY §7.3.4): compiled as
min_by/max_by over a (__time, value) struct so ties break on time then
value deterministically.
"""

from __future__ import annotations

from typing import Any, Callable

from pyspark.sql import Column
from pyspark.sql import functions as F

from druid_spark.expr import compile_expr
from druid_spark.filters import FilterCompiler

Resolver = Callable[[str], Column]


def _field(agg: dict, res: Resolver) -> Column:
    if "fieldName" in agg and agg["fieldName"] is not None:
        return res(agg["fieldName"])
    if "expression" in agg and agg["expression"]:
        return compile_expr(agg["expression"], res)
    raise ValueError(f"aggregator needs fieldName or expression: {agg}")


def _time_col(agg: dict, res: Resolver) -> Column:
    return res(agg.get("timeColumn", "__time"))


class AggCompiler:
    def __init__(self, resolver: Resolver | None = None,
                 filter_compiler: FilterCompiler | None = None,
                 exact_approx: bool = False):
        """exact_approx=True rewrites approximate aggregators to exact
        forms (count distinct) so results are oracle-checkable
        (SURVEY §7.3.5)."""
        self.res = resolver or F.col
        self.fc = filter_compiler or FilterCompiler(resolver=self.res)
        self.exact = exact_approx

    def compile(self, agg: dict[str, Any]) -> Column:
        """One aggregator spec → aliased aggregate Column."""
        return self._agg(agg).alias(agg.get("name", agg["type"]))

    def compile_all(self, aggs: list[dict] | None) -> list[Column]:
        return [self.compile(a) for a in aggs or []]

    def _agg(self, agg: dict[str, Any], cond: Column | None = None) -> Column:
        """cond: a `filtered` wrapper's predicate — applied map-side as
        agg(CASE WHEN cond THEN x END), Spark's FILTER(WHERE) lowering."""
        t = agg["type"]
        res = self.res

        def guard(c: Column) -> Column:
            return F.when(cond, c) if cond is not None else c

        if t == "count":
            return F.count(guard(F.lit(1)))
        if t in ("longSum", "doubleSum", "floatSum"):
            c = F.sum(guard(_field(agg, res)))
            return c.cast("long") if t == "longSum" else (
                c.cast("float") if t == "floatSum" else c)
        if t in ("longMin", "doubleMin", "floatMin"):
            return F.min(guard(_field(agg, res)))
        if t in ("longMax", "doubleMax", "floatMax"):
            return F.max(guard(_field(agg, res)))
        if t == "doubleMean":
            return F.avg(guard(_field(agg, res)))
        if t in ("longFirst", "doubleFirst", "floatFirst", "stringFirst"):
            return F.min_by(guard(_field(agg, res)), guard(_time_col(agg, res)))
        if t in ("longLast", "doubleLast", "floatLast", "stringLast"):
            return F.max_by(guard(_field(agg, res)), guard(_time_col(agg, res)))
        if t in ("longAny", "doubleAny", "floatAny", "stringAny"):
            return F.first(guard(_field(agg, res)), ignorenulls=True)
        if t in ("hyperUnique", "HLLSketchBuild", "thetaSketch"):
            c = guard(_field(agg, res))
            if self.exact:
                return F.count_distinct(c)
            return F.approx_count_distinct(c)
        if t == "cardinality":
            # HLL over dimension tuples; byRow concatenates the dim values
            cols = [res(fn) if isinstance(fn, str)
                    else res(fn["fieldName"]) for fn in agg["fields"]]
            key = guard(F.concat_ws("", *[c.cast("string") for c in cols]))
            if self.exact:
                return F.count_distinct(key)
            return F.approx_count_distinct(key)
        if t == "filtered":
            return self._agg(agg["aggregator"], self.fc.compile(agg["filter"]))
        if t == "grouping":
            return F.grouping_id(*[res(g) for g in agg["groupings"]])
        if t == "variance":
            return F.var_samp(_field(agg, res))
        if t == "variancePop":
            return F.var_pop(_field(agg, res))
        if t == "stddev":
            return F.stddev_samp(_field(agg, res))
        if t in ("quantilesDoublesSketch", "DDSketch", "KllDoublesSketch"):
            # sketch build → keep raw values list? finalize via post-agg;
            # for direct use return approx_percentile 0.5
            return F.percentile_approx(_field(agg, res), 0.5)
        if t == "approxHistogramFold" or t == "approxHistogram":
            return F.percentile_approx(_field(agg, res), [0.25, 0.5, 0.75])
        if t == "longStringArray" or t == "arrayOfDoublesSketch":
            raise NotImplementedError(t)
        if t == "expression":
            # ExpressionLambdaAggregatorFactory.java:59 — fold/combine
            # lambdas over grouped rows. Spark-first: collect the field
            # values and apply F.aggregate, or for the common
            # sum/min/max-like shapes users should prefer native aggs.
            fields = agg.get("fields", [])
            fold_expr = agg.get("fold")
            init = agg.get("initialValue", "0")
            if len(fields) == 1 and fold_expr:
                from druid_spark import expr as E
                acc_name = agg.get("accumulatorIdentifier", "__acc")
                arr = F.collect_list(res(fields[0]))
                ast = E.parse(fold_expr)
                comp = E.Compiler(self.res)
                init_col = compile_expr(str(init), self.res)
                def merge(acc, x):
                    return comp.compile(ast, {acc_name: acc, fields[0]: x})
                return F.aggregate(arr, init_col, merge)
            raise NotImplementedError("expression aggregator shape")
        if t == "javascript":
            raise NotImplementedError("javascript aggregator (disabled in reference)")
        raise NotImplementedError(f"aggregator type {t}")


class PostAggCompiler:
    """Post-aggregators run over the aggregated row
    (AggregatorsModule.java:159-169): plain column expressions after
    .agg() — no extra shuffle."""

    def __init__(self, resolver: Resolver | None = None):
        self.res = resolver or F.col

    def compile(self, pa: dict[str, Any]) -> Column:
        return self._pa(pa).alias(pa.get("name", pa["type"]))

    def compile_all(self, pas: list[dict] | None) -> list[Column]:
        return [self.compile(p) for p in pas or []]

    def _pa(self, pa: dict[str, Any]) -> Column:
        t = pa["type"]
        if t == "arithmetic":
            fn = pa["fn"]
            fields = [self._pa(f) for f in pa["fields"]]
            out = fields[0]
            for f in fields[1:]:
                if fn == "+":
                    out = out + f
                elif fn == "-":
                    out = out - f
                elif fn == "*":
                    out = out * f
                elif fn == "/":
                    out = F.when(f != 0, out / f).otherwise(F.lit(0.0))  # druid /0 → 0
                elif fn == "quotient":
                    out = out / f
                else:
                    raise NotImplementedError(f"arithmetic fn {fn}")
            return out
        if t in ("fieldAccess", "finalizingFieldAccess", "hyperUniqueCardinality"):
            return self.res(pa["fieldName"])
        if t == "constant":
            return F.lit(pa["value"])
        if t == "expression":
            return compile_expr(pa["expression"], self.res)
        if t in ("doubleGreatest", "longGreatest"):
            return F.greatest(*[self._pa(f) for f in pa["fields"]])
        if t in ("doubleLeast", "longLeast"):
            return F.least(*[self._pa(f) for f in pa["fields"]])
        if t == "javascript":
            raise NotImplementedError("javascript post-aggregator")
        raise NotImplementedError(f"post-aggregator {t}")
