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

# Quantile-sketch aggregator types (datasketches extension:
# DoublesSketchAggregatorFactory.java, KLL variants) and their SQL/post-agg
# finalizers. Spark-first design: a pre-pass (SketchPlan) scans the query's
# post-aggregators for finalizers referencing each sketch aggregator, and the
# "sketch" compiles to a STRUCT of real aggregate expressions — percentile /
# filtered counts — instead of a sketch blob. Every finalizer is then a cheap
# struct-field access. No collect-to-driver, no UDFs, fully partial-aggregable
# (Spark computes percentile/count with map-side partials), so the plan holds
# at 100 TB. A standalone sketch with no finalizer finalizes to the stream
# length N, matching DoublesSketchAggregatorFactory.finalizeComputation.
QUANTILE_SKETCH_AGGS = {"quantilesDoublesSketch", "kllDoublesSketch",
                        "KllDoublesSketch", "DDSketch", "momentSketch"}
_QS_FINALIZERS = {
    "quantilesDoublesSketchToQuantile": "quantile",
    "quantilesDoublesSketchToQuantiles": "quantiles",
    "quantilesDoublesSketchToHistogram": "histogram",
    "quantilesDoublesSketchToCDF": "cdf",
    "quantilesDoublesSketchToRank": "rank",
    "kllDoublesSketchToQuantile": "quantile",
    "kllDoublesSketchToQuantiles": "quantiles",
    "kllDoublesSketchToHistogram": "histogram",
    "kllDoublesSketchToCDF": "cdf",
    "kllDoublesSketchToRank": "rank",
}
THETA_SETOP_TYPES = {"thetaSketchSetOp"}
# arrayOfDoublesSketchSetOp (ArrayOfDoublesSketchSetOpPostAggregator):
# UNION / INTERSECT / NOT over tuple sketches. A tuple agg referenced
# by a set op compiles to a map<key, metric sums> state (see
# tuple_map_state) so the ops can be pure map algebra.
TUPLE_SETOP_TYPES = {"arrayOfDoublesSketchSetOp"}


def tuple_map_state(key, metrics: list, cap: int | None = None):
    """arrayOfDoublesSketch state for set-op consumers: a
    map<string, array<double>> of per-key metric sums, BOUNDED at
    `cap` (nominalEntries) entries when a cap is given.

    cap=None (no explicit nominalEntries on the aggregator) keeps the
    EXACT unbounded map — the oracle-checkable mode the differential
    fuzzers and DuckDB gates verify. This diverges from the reference
    default (which silently samples at 4096) deliberately: exactness
    is what makes set-op results checkable, and a query that needs
    bounded state at scale says so with an explicit nominalEntries.

    Built as ONE aggregate expression: sort the collected
    (hash, key, values) entries by the key's 64-bit hash, then fold
    once — summing while the key repeats, appending a map entry at
    each key change, and STOPPING once the map holds `cap` keys.
    Because entries arrive in hash order, every skipped key has a
    strictly larger hash than every retained one, so the retained set
    is exactly the bottom-`cap` keys by hash — the KMV sample the
    reference's sketch keeps when it exceeds nominalEntries
    (extensions-core/datasketches/.../
    ArrayOfDoublesSketchAggregatorFactory.java). Below the cap the
    state is the full exact map (oracle-checkable); above it,
    per-group fold memory is O(cap × metrics) instead of O(distinct
    keys × metrics). Every lambda touches only its accumulator and
    element (expressions referencing OUTER arrays inside a
    higher-order lambda are re-evaluated per element — that shape is
    O(n²) and must be avoided)."""
    kstr = key.cast("string")
    entry = F.struct(
        F.xxhash64(kstr).alias("h"), kstr.alias("k"),
        F.array(*[m.cast("double") for m in metrics]).alias("vs"))
    entries = F.sort_array(
        F.collect_list(F.when(key.isNotNull(), entry)))
    zeros = F.array_repeat(F.lit(0.0), len(metrics))
    empty = F.from_json(F.lit("{}"), "map<string,array<double>>")

    def state(m, k, acc, d):
        return F.struct(m.alias("m"), k.alias("k"), acc.alias("acc"),
                        d.alias("d"))

    def flush(s):
        return F.map_concat(s["m"], F.create_map(s["k"], s["acc"]))

    def step(s, e):
        out = F.when(
            s["d"], s
        ).when(
            s["k"].isNull(), state(s["m"], e["k"], e["vs"], F.lit(False))
        ).when(
            e["k"] == s["k"],
            state(s["m"], s["k"],
                  F.zip_with(s["acc"], e["vs"], lambda x, y: x + y),
                  F.lit(False)))
        if cap is not None:
            out = out.when(
                F.size(s["m"]) + 1 >= F.lit(cap),
                state(flush(s), F.lit(None).cast("string"), zeros,
                      F.lit(True)))
        return out.otherwise(state(flush(s), e["k"], e["vs"],
                                   F.lit(False)))

    return F.aggregate(
        entries,
        state(empty, F.lit(None).cast("string"), zeros, F.lit(False)),
        step,
        lambda s: F.when(s["k"].isNull(), s["m"]).otherwise(flush(s)))
# arrayOfDoublesSketch (tuple sketch) finalizer post-aggs. Exact mode:
# the "sketch" is a struct of {n = exact distinct key count, sums =
# per-metric totals}; each finalizer reads a struct field. On a real
# cluster the approximate path would swap in a datasketches UDAF — the
# finalizer surface and query shape are identical.
_TUPLE_FINALIZERS = {"arrayOfDoublesSketchToEstimate",
                     "arrayOfDoublesSketchToNumEntries",
                     "arrayOfDoublesSketchToMetricsSumEstimate"}


def _pa_target(pa: dict) -> str | None:
    """agg name referenced by a finalizer's `field` (a fieldAccess post-agg)."""
    f = pa.get("field")
    if isinstance(f, dict) and f.get("type") in (
            "fieldAccess", "finalizingFieldAccess"):
        return f.get("fieldName")
    return None


class SketchPlan:
    """Coordinates sketch aggregators with their finalizer post-aggs.

    quant: agg name -> {"fractions": [...], "splits": [...],
                        "cdf_splits": [...], "ranks": [...]}
    theta_sets: agg names that must compile to a distinct-set (exact theta
    sketch) because a thetaSketchSetOp references them. On a real cluster
    at 100 TB the approximate path would swap in a datasketches UDAF
    (library not available in this container); the set-op *semantics* and
    query surface are identical.
    """

    def __init__(self, aggs: list[dict] | None, postaggs: list[dict] | None):
        self.quant: dict[str, dict] = {}
        self.theta_sets: set[str] = set()
        self.tuple_refs: set[str] = set()
        # tuple aggs referenced by a set op: compile to map states
        self.tuple_maps: set[str] = set()
        self.tuple_nmetrics = {}
        for a in aggs or []:
            inner = a
            while inner.get("type") == "filtered":
                inner = inner["aggregator"]
            if inner.get("type") == "arrayOfDoublesSketch":
                self.tuple_nmetrics[a.get("name", inner.get("name"))] = \
                    len(inner.get("metricColumns") or [])
        for pa in postaggs or []:
            self._walk(pa)
        tuple_names = set(self.tuple_nmetrics)
        self.tuple_refs &= tuple_names
        self.tuple_maps &= tuple_names
        # only keep entries whose agg really is a quantile sketch
        sketch_names = {a.get("name") for a in aggs or []
                        if a.get("type") in QUANTILE_SKETCH_AGGS}
        self.quant = {k: v for k, v in self.quant.items() if k in sketch_names}
        theta_names = set()
        for a in aggs or []:
            inner = a
            while inner.get("type") == "filtered":
                inner = inner["aggregator"]
            if inner.get("type") in ("thetaSketch", "HLLSketchBuild"):
                theta_names.add(a.get("name", inner.get("name")))
        self.theta_sets &= theta_names

    def _need(self, name: str) -> dict:
        return self.quant.setdefault(
            name, {"fractions": [], "splits": None, "cdf_splits": None,
                   "ranks": []})

    def _walk(self, pa: dict) -> None:
        t = pa.get("type")
        if t == "arithmetic":
            for f in pa.get("fields", []):
                self._walk(f)
            return
        kind = _QS_FINALIZERS.get(t)
        if kind:
            name = _pa_target(pa)
            if not name:
                return
            need = self._need(name)
            if kind == "quantile":
                fr = float(pa["fraction"])
                if fr not in need["fractions"]:
                    need["fractions"].append(fr)
            elif kind == "quantiles":
                for fr in pa.get("fractions", []):
                    if float(fr) not in need["fractions"]:
                        need["fractions"].append(float(fr))
            elif kind == "histogram":
                need["splits"] = [float(s) for s in pa["splitPoints"]]
            elif kind == "cdf":
                need["cdf_splits"] = [float(s) for s in pa["splitPoints"]]
            elif kind == "rank":
                v = float(pa["value"])
                if v not in need["ranks"]:
                    need["ranks"].append(v)
            return
        if t == "thetaSketchEstimate":
            f = pa.get("field", {})
            if isinstance(f, dict) and f.get("type") in THETA_SETOP_TYPES:
                self._mark_setop(f)
        elif t in THETA_SETOP_TYPES:
            self._mark_setop(pa)
        elif t in _TUPLE_FINALIZERS:
            f = pa.get("field")
            if isinstance(f, dict) and f.get("type") in TUPLE_SETOP_TYPES:
                self._mark_tuple_setop(f)
                return
            name = _pa_target(pa) or pa.get("fieldName")
            if name:
                self.tuple_refs.add(name)
        elif t in TUPLE_SETOP_TYPES:
            self._mark_tuple_setop(pa)

    def _mark_tuple_setop(self, pa: dict) -> None:
        for f in pa.get("fields", []):
            if f.get("type") in TUPLE_SETOP_TYPES:
                self._mark_tuple_setop(f)
            else:
                name = f.get("fieldName")
                if name:
                    self.tuple_maps.add(name)

    def _mark_setop(self, pa: dict) -> None:
        for f in pa.get("fields", []):
            if f.get("type") in THETA_SETOP_TYPES:
                self._mark_setop(f)
            else:
                name = f.get("fieldName")
                if name:
                    self.theta_sets.add(name)


def _field(agg: dict, res: Resolver) -> Column:
    if "fieldName" in agg and agg["fieldName"] is not None:
        return res(agg["fieldName"])
    if "expression" in agg and agg["expression"]:
        return compile_expr(agg["expression"], res)
    raise ValueError(f"aggregator needs fieldName or expression: {agg}")


def _time_col(agg: dict, res: Resolver) -> Column:
    return res(agg.get("timeColumn", "__time"))


def agg_name(agg: dict) -> str:
    """output name; a `filtered` wrapper may carry the name on the inner
    aggregator (both spellings appear in the reference's test corpus)."""
    if "name" in agg:
        return agg["name"]
    if agg["type"] == "filtered":
        return agg_name(agg["aggregator"])
    return agg["type"]


class AggCompiler:
    def __init__(self, resolver: Resolver | None = None,
                 filter_compiler: FilterCompiler | None = None,
                 exact_approx: bool = False,
                 sketch_plan: "SketchPlan | None" = None,
                 default_nominal_entries: int | None = None,
                 finalize: bool = True,
                 hllc_parity: bool = False):
        """exact_approx=True rewrites approximate aggregators to exact
        forms (count distinct) so results are oracle-checkable
        (SURVEY §7.3.5). sketch_plan coordinates sketch aggregators with
        their finalizer post-aggs (see SketchPlan).
        default_nominal_entries bounds tuple-sketch map state when the
        aggregator omits nominalEntries (the engine's session default —
        see DruidSparkEngine; None = exact unbounded fold).
        finalize=False (query context `finalize`, QueryContexts — the
        broker sets it when fanning out so historicals return MERGEABLE
        states) makes sketch aggregators emit their state (binary HLL
        blob) instead of the finalized estimate; ignored in exact mode
        (oracle sessions have no sketch state to return)."""
        self.res = resolver or F.col
        self.fc = filter_compiler or FilterCompiler(resolver=self.res)
        self.exact = exact_approx
        self.plan = sketch_plan
        self.default_nominal_entries = default_nominal_entries
        self.finalize = finalize
        # hyperUnique estimates through the reference-parity collector
        # (functions/hllc.py) when the owning engine opted in
        self.hllc_parity = hllc_parity

    def compile(self, agg: dict[str, Any]) -> Column:
        """One aggregator spec → aliased aggregate Column."""
        return self._agg(agg, outer_name=agg_name(agg)).alias(agg_name(agg))

    def compile_all(self, aggs: list[dict] | None) -> list[Column]:
        return [self.compile(a) for a in aggs or []]

    def _sketch_input(self, agg: dict, c: Column, allow_double: bool) -> Column:
        """Per-type sketch update dispatch, mirroring the reference's
        SketchAggregator.updateUnion (extensions-core/datasketches/.../
        theta/SketchAggregator.java): Integer/Long hash via update(long),
        Double via update(double), String via update(String). Spark's
        theta_sketch_agg takes the same per-type Datasketches path, so a
        sketch built here unions correctly with a reference-built blob on
        a column of the same type. Types the Spark agg can't ingest
        natively (double for HLL; complex types) fall back to a string
        cast — engine-internally consistent, but such sketches are not
        blob-interoperable with reference numeric sketches (documented)."""
        df = getattr(self.fc, "df", None)
        fname = agg.get("fieldName")
        dt = None
        if df is not None and isinstance(fname, str):
            try:
                dt = dict(df.dtypes).get(fname)
            except Exception:
                dt = None
        if dt in ("tinyint", "smallint", "int", "bigint"):
            return c.cast("long")
        if dt in ("float", "double") and allow_double:
            return c.cast("double")
        if dt == "string":
            return c
        return c.cast("string")

    def _hll_druid_input(self, agg: dict, c: Column) -> Column:
        """Druid-parity HllSketch update stream (r13;
        HllSketchBuildUtil.java:36-61): Integer/Long via update(long);
        Float/Double via update(double) == MurmurHash3 over the LE
        bytes of doubleToLongBits (canonical NaN, -0.0 -> 0.0); String
        via update(char[]) under the UTF16LE default
        (HllSketchAggregatorFactory.java:52) == the string's UTF-16LE
        bytes through the byte[] entry point.  Feeding Spark's JVM
        Datasketches hll_sketch_agg these forms makes engine estimates
        and sketch blobs value-identical to the reference's for the
        same stream (differential-tested in tests/test_sketches.py).
        Unlike theta (_sketch_input), Druid HLL strings default to
        UTF-16LE, hence the separate dispatch."""
        df = getattr(self.fc, "df", None)
        fname = agg.get("fieldName")
        dt = None
        if df is not None and isinstance(fname, str):
            try:
                dt = dict(df.dtypes).get(fname)
            except Exception:
                dt = None
        if dt in ("tinyint", "smallint", "int", "bigint"):
            return c.cast("long")
        if dt in ("float", "double"):
            return F.when(c.isNotNull(), F.call_function(
                "__ds_hll_d2b", c.cast("double")))
        return F.encode(c.cast("string"), "UTF-16LE")

    def _agg(self, agg: dict[str, Any], cond: Column | None = None,
             outer_name: str | None = None) -> Column:
        """cond: a `filtered` wrapper's predicate — applied map-side as
        agg(CASE WHEN cond THEN x END), Spark's FILTER(WHERE) lowering.
        outer_name: output name for sketch-plan lookups (survives
        `filtered` nesting)."""
        t = agg["type"]
        res = self.res
        name = outer_name or agg_name(agg)

        def guard(c: Column) -> Column:
            return F.when(cond, c) if cond is not None else c

        if t == "count":
            return F.count(guard(F.lit(1)))
        if t in ("longSum", "doubleSum", "floatSum"):
            # cast map-side so the result type matches the aggregator type
            # regardless of input column type (doubleSum(long col) is
            # DOUBLE in the reference)
            cast_to = {"longSum": "long", "doubleSum": "double",
                       "floatSum": "float"}[t]
            return F.sum(guard(_field(agg, res)).cast(cast_to))
        if t in ("longMin", "doubleMin", "floatMin"):
            return F.min(guard(_field(agg, res)))
        if t in ("longMax", "doubleMax", "floatMax"):
            return F.max(guard(_field(agg, res)))
        if t == "doubleMean":
            return F.avg(guard(_field(agg, res)))
        if t in ("longFirst", "doubleFirst", "floatFirst", "stringFirst",
                 "stringFirstFold", "longFirstFold", "doubleFirstFold",
                 "floatFirstFold"):
            return F.min_by(guard(_field(agg, res)), guard(_time_col(agg, res)))
        if t in ("longLast", "doubleLast", "floatLast", "stringLast",
                 "stringLastFold", "longLastFold", "doubleLastFold",
                 "floatLastFold"):
            return F.max_by(guard(_field(agg, res)), guard(_time_col(agg, res)))
        if t in ("longAny", "doubleAny", "floatAny", "stringAny"):
            return F.first(guard(_field(agg, res)), ignorenulls=True)
        if t in ("hyperUnique", "HLLSketchBuild", "thetaSketch"):
            c = guard(_field(agg, res))
            if self.plan and name in self.plan.theta_sets:
                # referenced by a thetaSketchSetOp post-agg: keep the
                # distinct set (exact theta sketch); set-op estimates
                # become array_intersect/union/except + size
                return F.collect_set(c)
            if t == "hyperUnique" and getattr(self, "hllc_parity",
                                              False):
                # reference-parity HyperLogLogCollector estimate
                # (functions/hllc.py) — opt-in engine mode; the
                # session must have register_hllc_udf applied.
                # Two-phase: scalar (bucket,pos) map + collect_set
                # (JVM partial agg, domain-bounded ~131k longs) +
                # scalar replay — never materializes a group.
                return F.call_function(
                    "druid_hllc_est",
                    F.sort_array(F.collect_set(F.call_function(
                        "druid_hllc_bp", c.cast("string")))))
            if self.exact:
                return F.count_distinct(c)
            # real Datasketches HLL (mergeable, bounded state), the
            # same sketch family as the reference extension
            # (extensions-core/datasketches/.../hll/
            # HllSketchBuildAggregatorFactory.java); lgK=12 is the
            # reference default (~1.6% relative standard error).
            # Input follows the reference's per-type update dispatch
            # (_hll_druid_input) so estimates match its pinned
            # APPROX_COUNT_DISTINCT_DS_HLL numbers exactly.
            state = F.hll_sketch_agg(self._hll_druid_input(agg, c), 12)
            if not self.finalize:
                return state  # mergeable binary blob (finalize=false)
            return F.hll_sketch_estimate(state).cast("long")
        if t == "cardinality":
            # HLL over dimension tuples; byRow concatenates the dim values
            cols = [res(fn) if isinstance(fn, str)
                    else res(fn["fieldName"]) for fn in agg["fields"]]
            key = guard(F.concat_ws("", *[c.cast("string") for c in cols]))
            if self.exact:
                return F.count_distinct(key)
            return F.approx_count_distinct(key)
        # internal re-merge forms used by aggregate projections
        # (plans/projections.py): a rollup row stores the distinct SET
        # (exact theta sketch); querying re-merges by set union — the
        # same merge a real theta sketch does, losslessly
        if t == "setCollect":
            return F.collect_set(guard(_field(agg, res)))
        if t == "setUnionSize":
            return F.size(F.array_distinct(
                F.flatten(F.collect_list(guard(_field(agg, res)))))).cast("long")
        # sketch-state forms: a rollup stores the BINARY Datasketches
        # HLL state per row (bounded size — survives 100x where a
        # distinct set approaches raw-data scale); queries re-merge by
        # sketch union. hllState/hllUnionEstimate mirror the reference's
        # HllSketchBuild / HllSketchMerge factory pair.
        if t == "hllState":
            return F.hll_sketch_agg(
                self._hll_druid_input(agg, guard(_field(agg, res))), 12)
        if t == "hllUnionEstimate":
            return F.hll_sketch_estimate(
                F.hll_union_agg(guard(_field(agg, res)))).cast("long")
        # Datasketches-native theta state (Spark theta_sketch_agg emits
        # the standard binary theta format — interoperable with sketch
        # blobs produced by the reference's extensions-core/datasketches
        # theta aggregators; lgK=12 matches SketchAggregatorFactory's
        # 4096-entry default). thetaState/thetaUnionEstimate mirror the
        # reference's SketchMergeAggregatorFactory build/merge pair.
        # Input dispatch mirrors SketchAggregator.updateUnion's per-type
        # hashing (long via update(long), double via update(double),
        # string via update(String)) so a sketch built here unions
        # correctly with a reference-built blob on the same column type.
        if t == "thetaState":
            return F.theta_sketch_agg(
                self._sketch_input(agg, guard(_field(agg, res)),
                                   allow_double=True), 12)
        if t == "thetaUnionEstimate":
            return F.theta_sketch_estimate(
                F.theta_union_agg(guard(_field(agg, res)), 12)).cast("long")
        # Datasketches-native KLL quantile state (binary KLL format,
        # interoperable with the reference's kllDoublesSketch —
        # extensions-core/datasketches/.../kll/
        # KllDoublesSketchAggregatorFactory.java). kllState stores the
        # build per rollup row; kllUnionQuantile re-merges and reads one
        # quantile (fraction in agg["fraction"], default median).
        if t == "kllState":
            return F.kll_sketch_agg_double(
                guard(_field(agg, res)).cast("double"),
                agg.get("k", 200))
        if t == "kllUnionQuantile":
            return F.kll_sketch_get_quantile_double(
                F.kll_merge_agg_double(guard(_field(agg, res)),
                                       agg.get("k", 200)),
                F.lit(float(agg.get("fraction", 0.5))))
        # KMV theta state (sketch_state.py): rollup rows store the k
        # smallest distinct hashes; querying re-merges bottom-k and
        # estimates (k-1)/u_k — exact below k. Same family as the
        # reference theta sketch (extensions-core/datasketches/.../
        # theta/SketchAggregatorFactory.java).
        if t == "kmvUnionEstimate":
            from druid_spark import sketch_state as S
            return S.kmv_union_estimate(_field(agg, res),
                                        agg.get("k", S.DEFAULT_K))
        # bottom-k uniform sample state → mergeable quantile estimate
        # (reference quantiles-sketch workflow: DoublesSketch
        # getQuantile over re-merged rollup state)
        if t == "sampleQuantile":
            from druid_spark import sketch_state as S
            return S.sample_quantile(
                S.sample_merge(_field(agg, res), agg.get("k", S.DEFAULT_K)),
                agg.get("fraction", 0.5))
        if t == "filtered":
            return self._agg(agg["aggregator"], self.fc.compile(agg["filter"]),
                             outer_name=name)
        if t == "grouping":
            return F.grouping_id(*[res(g) for g in agg["groupings"]])
        if t == "variance":
            return F.var_samp(_field(agg, res))
        if t == "variancePop":
            return F.var_pop(_field(agg, res))
        if t == "stddev":
            return F.stddev_samp(_field(agg, res))
        if t in QUANTILE_SKETCH_AGGS:
            return self._quantile_sketch(agg, name, guard)
        if t == "approxHistogramFold" or t == "approxHistogram":
            return F.percentile_approx(_field(agg, res), [0.25, 0.5, 0.75])
        if t == "singleValue":
            # SingleValueAggregatorFactory.java: scalar-subquery guard —
            # yields the single grouped value, errors on more than one
            # row (Calcite plans it under scalar subqueries)
            c = guard(_field(agg, res))
            return F.when(
                F.count(c) <= 1, F.max(c)).otherwise(
                F.raise_error(F.lit(
                    "singleValue aggregator encountered more than one row")))
        if t == "histogram":
            # Core equal-width histogram (AggregatorsModule.java:130,
            # HistogramAggregatorFactory.java + Histogram.java offer():
            # binarySearch semantics — bin i counts (breaks[i-1],
            # breaks[i]]). finalizeComputation -> HistogramVisual: inner
            # bins only, plus observed min/max. Parallel filtered counts
            # — one pass, partial-aggregable, no shuffle beyond the
            # enclosing groupBy.
            x = _field(agg, res).cast("float")
            breaks = [float(b) for b in agg["breaks"]]
            counts = [
                F.count(F.when((x > breaks[i - 1]) & (x <= breaks[i]),
                               guard(F.lit(1)))).cast("float")
                for i in range(1, len(breaks))]
            return F.struct(
                F.array(*[F.lit(b).cast("float") for b in breaks])
                .alias("breaks"),
                F.array(*counts).alias("counts"),
                F.min(guard(x)).alias("min"),
                F.max(guard(x)).alias("max"))
        if t == "fixedBucketsHistogram":
            # FixedBucketsHistogramAggregatorFactory: [lowerLimit,
            # upperLimit) split into numBuckets equal bins; counts per
            # bin as parallel filtered counts — one pass, partial-aggable.
            # outlierHandlingMode: ignore (default) | clip (clamp into
            # edge bins) | overflow (same as clip for counting purposes).
            x = guard(_field(agg, res)).cast("double")
            lo, hi = float(agg["lowerLimit"]), float(agg["upperLimit"])
            n = int(agg["numBuckets"])
            mode = str(agg.get("outlierHandlingMode", "ignore")).lower()
            if mode in ("clip", "overflow"):
                x = F.least(F.greatest(x, F.lit(lo)),
                            F.lit(hi - (hi - lo) / (2.0 * n)))
            w = (hi - lo) / n
            bins = []
            for i in range(n):
                a, b = lo + i * w, lo + (i + 1) * w
                bins.append(F.count(F.when((x >= a) & (x < b), 1)))
            return F.array(*bins)
        if t == "arrayOfDoublesSketch":
            # Tuple sketch (ArrayOfDoublesSketchAggregatorFactory): per
            # distinct key tuple, sum the metric columns. Exact mode:
            # struct(n = distinct keys, sums = metric totals over rows
            # with a non-null key) — all partial-aggregable built-ins.
            #
            # INTEROP DECISION (mirrors sketch_state.py's paragraph):
            # unlike HLL/theta/KLL — where Spark's native Datasketches
            # functions emit the standard binary formats and the
            # *State/*Union aggregators are blob-interoperable with
            # reference deployments — Spark ships NO arrayOfDoubles
            # (tuple) sketch function, so this aggregator's state is an
            # ENGINE-INTERNAL struct, not exchangeable with blobs from
            # extensions-core/datasketches/.../ArrayOfDoublesSketch-
            # AggregatorFactory.java. The struct is partial-aggregable
            # (re-mergeable across rollup rows: n re-merges via the
            # distinct set, sums add), human-inspectable, and exact;
            # finalizer surface and query shapes are identical to the
            # reference, so only stored-blob exchange is out of scope.
            keys = [res(fn) for fn in agg["fieldNames"]]
            key = (keys[0] if len(keys) == 1 else
                   F.concat_ws("", *[c.cast("string") for c in keys]))
            key = guard(key)
            if self.plan and name in self.plan.tuple_maps:
                # a set-op post-agg consumes this sketch: state is the
                # per-key metric-sum map (see tuple_map_state)
                return tuple_map_state(
                    key,
                    [res(mc) for mc in agg.get("metricColumns") or []],
                    cap=(max(2, int(agg["nominalEntries"]))
                         if agg.get("nominalEntries")
                         else self.default_nominal_entries))
            sums = [F.sum(F.when(key.isNotNull(), res(mc)).cast("double"))
                    for mc in agg.get("metricColumns") or []]
            n = F.count_distinct(key)
            if not (self.plan and name in self.plan.tuple_refs):
                # standalone: finalizeComputation → estimate (double)
                return n.cast("double")
            parts = [n.alias("n")]
            if sums:
                parts.append(F.array(*sums).alias("sums"))
            return F.struct(*parts)
        if t == "bloom":
            # BloomFilterAggregatorFactory (bloom-filter extension).
            # Spark-native representation: a sparse bitset — the sorted
            # set of occupied bit positions in an m-bit filter — as
            # struct(m, k, positions). Built distributively: per row the
            # k hash positions (bloom_positions, shared with the probe
            # side in filters.py), merged with map-side-combining
            # collect_set + flatten/distinct. The result is a
            # broadcast-sized value a later query's `bloom` filter takes
            # as its bloomKFilter holder.
            from druid_spark.filters import bloom_positions, bloom_sizing
            # default 2^18 bits: the probe side densifies to an m/64-
            # word literal, so m trades false-positive rate against
            # literal-transfer cost (~0.15s per 2^16 bits via py4j);
            # at 2^18 and n=20k keys the per-probe FP is ~1e-7.
            # maxNumEntries (BloomKFilter's sizing knob) scales it up.
            # NULLs are recorded (bloom_positions hashes null as ""),
            # matching BloomKFilter.addBytes(null).
            m, k = bloom_sizing(int(agg.get("maxNumEntries") or 0),
                                int(agg.get("numBits") or 0),
                                int(agg.get("numHashes") or 0))
            x = guard(_field(agg, res))
            occupied = F.array_sort(F.array_distinct(F.flatten(
                F.collect_set(bloom_positions(x, m, k)))))
            return F.struct(F.lit(m).alias("m"), F.lit(k).alias("k"),
                            occupied.alias("positions"))
        if t == "longStringArray":
            raise NotImplementedError(t)
        if t == "expression":
            # ExpressionLambdaAggregatorFactory.java:59 — fold/combine
            # lambdas over grouped rows. Spark-first: collect the field
            # values and apply F.aggregate, or for the common
            # sum/min/max-like shapes users should prefer native aggs.
            fields = agg.get("fields", [])
            fold_expr = agg.get("fold")
            init = agg.get("initialValue", "0")
            if fields and fold_expr:
                from druid_spark import expr as E
                acc_name = agg.get("accumulatorIdentifier", "__acc")
                ast = E.parse(fold_expr)
                comp = E.Compiler(self.res)
                init_col = compile_expr(str(init), self.res)
                if len(fields) == 1:
                    arr = F.collect_list(res(fields[0]))

                    def merge(acc, x):
                        return comp.compile(ast, {acc_name: acc,
                                                  fields[0]: x})
                else:
                    # multi-field fold: collect the row tuple, bind each
                    # field name to its struct member in the lambda
                    arr = F.collect_list(F.struct(
                        *[res(fn).alias(fn) for fn in fields]))

                    def merge(acc, x):
                        binds = {fn: x.getField(fn) for fn in fields}
                        binds[acc_name] = acc
                        return comp.compile(ast, binds)
                return F.aggregate(arr, init_col, merge)
            raise NotImplementedError("expression aggregator shape")
        if t == "javascript":
            raise NotImplementedError("javascript aggregator (disabled in reference)")
        raise NotImplementedError(f"aggregator type {t}")

    def _quantile_sketch(self, agg: dict, name: str, guard) -> Column:
        """Quantile sketch → STRUCT of the aggregate expressions its
        finalizers need (see module note at QUANTILE_SKETCH_AGGS).
        Fields: q (percentiles), hist (bin counts), cdf (cumulative
        ranks, trailing 1.0 like DoublesSketch.getCDF), rank (normalized
        ranks), n (stream length). Standalone sketch → just N."""
        x = guard(_field(agg, self.res)).cast("double")
        need = (self.plan.quant.get(name) if self.plan else None)
        if not need:
            return F.count(x)
        parts = []
        fr = need["fractions"]
        if fr:
            if self.exact:
                parts.append(F.percentile(
                    x, F.array(*[F.lit(f) for f in fr])).alias("q"))
            else:
                # sketch mode: Datasketches KLL (the reference's own
                # quantile family, k=200 =
                # KllDoublesSketchAggregatorFactory's default) — r13:
                # measured 5.4x faster than percentile_approx at 6M
                # rows (0.30s vs 1.60s), and bounded-memory per group
                # where exact percentile materializes the group.
                # Catalyst dedupes the identical agg subexpression, so
                # one sketch is built per group regardless of how many
                # fractions read it.
                sk = F.kll_sketch_agg_double(x, 200)
                parts.append(F.array(
                    *[F.kll_sketch_get_quantile_double(sk, F.lit(f))
                      for f in fr]).alias("q"))
        if need["splits"] is not None:
            sp = need["splits"]
            bins = [F.count(F.when(x < sp[0], 1))]
            for a, b in zip(sp, sp[1:]):
                bins.append(F.count(F.when((x >= a) & (x < b), 1)))
            bins.append(F.count(F.when(x >= sp[-1], 1)))
            parts.append(F.array(*bins).alias("hist"))
        if need["cdf_splits"] is not None:
            total = F.count(x)
            cums = [(F.count(F.when(x < p, 1)) / total).cast("double")
                    for p in need["cdf_splits"]]
            parts.append(F.array(*cums, F.lit(1.0)).alias("cdf"))
        if need["ranks"]:
            total = F.count(x)
            parts.append(F.array(
                *[(F.count(F.when(x < v, 1)) / total).cast("double")
                  for v in need["ranks"]]).alias("rank"))
        parts.append(F.count(x).alias("n"))
        return F.struct(*parts)


class PostAggCompiler:
    """Post-aggregators run over the aggregated row
    (AggregatorsModule.java:159-169): plain column expressions after
    .agg() — no extra shuffle."""

    def __init__(self, resolver: Resolver | None = None,
                 sketch_plan: "SketchPlan | None" = None):
        self.res = resolver or F.col
        self.plan = sketch_plan

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
            name = pa["fieldName"]
            if self.plan:
                if name in self.plan.quant:
                    return self.res(name).getField("n")  # finalized = N
                if name in self.plan.theta_sets:
                    return F.size(self.res(name)).cast("double")
                if (name in self.plan.tuple_maps
                        and t == "finalizingFieldAccess"):
                    return F.size(self.res(name)).cast("double")
                if (name in self.plan.tuple_refs
                        and t == "finalizingFieldAccess"):
                    return self.res(name).getField("n").cast("double")
            return self.res(name)
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
        kind = _QS_FINALIZERS.get(t)
        if kind:
            return self._qs_finalize(pa, kind)
        if t == "thetaSketchEstimate":
            f = pa["field"]
            if isinstance(f, dict) and f.get("type") in THETA_SETOP_TYPES:
                return F.size(self._setop(f)).cast("double")
            name = _pa_target(pa)
            if self.plan and name in self.plan.theta_sets:
                return F.size(self.res(name)).cast("double")
            return self._pa(f).cast("double")
        if t == "hllSketchEstimate":
            return self._pa(pa["field"]).cast("double")
        if t in _TUPLE_FINALIZERS:
            f = pa.get("field")
            if isinstance(f, dict) and f.get("type") in TUPLE_SETOP_TYPES:
                return self._tuple_finalize_map(
                    t, self._tuple_setop(f), self._tuple_leaf(f))
            name = _pa_target(pa) or pa.get("fieldName")
            if self.plan and name in self.plan.tuple_maps:
                return self._tuple_finalize_map(t, self.res(name), name)
            s = self.res(name)
            if t == "arrayOfDoublesSketchToEstimate":
                return s.getField("n").cast("double")
            if t == "arrayOfDoublesSketchToNumEntries":
                return s.getField("n")  # exact: every entry retained
            return s.getField("sums")   # ToMetricsSumEstimate
        if t in THETA_SETOP_TYPES:
            return self._setop(pa)
        if t in TUPLE_SETOP_TYPES:
            return self._tuple_setop(pa)
        raise NotImplementedError(f"post-aggregator {t}")

    def _setop(self, pa: dict) -> Column:
        """thetaSketchSetOp (SketchSetPostAggregator): UNION / INTERSECT /
        NOT over distinct-set columns (see SketchPlan.theta_sets)."""
        func = pa["func"].upper()
        cols = [self._setop(f) if f.get("type") in THETA_SETOP_TYPES
                else self.res(f["fieldName"]) for f in pa["fields"]]
        out = cols[0]
        for c in cols[1:]:
            if func == "UNION":
                out = F.array_union(out, c)
            elif func == "INTERSECT":
                out = F.array_intersect(out, c)
            elif func == "NOT":
                out = F.array_except(out, c)
            else:
                raise NotImplementedError(f"theta set op {func}")
        return out

    def _tuple_setop(self, pa: dict) -> Column:
        """arrayOfDoublesSketchSetOp (ArrayOfDoublesSketchSetOp-
        PostAggregator): UNION / INTERSECT / NOT over tuple-sketch map
        states as pure map algebra — UNION merges keys summing shared
        values (ArrayOfDoublesUnion), INTERSECT keeps common keys with
        combined values (ArrayOfDoublesIntersection's sum combiner),
        NOT keeps the left side's keys absent from the right
        (ArrayOfDoublesAnotB)."""
        func = pa["func"].upper()
        cols = [self._tuple_setop(f) if f.get("type") in TUPLE_SETOP_TYPES
                else self.res(f["fieldName"]) for f in pa["fields"]]
        out = cols[0]
        for c in cols[1:]:
            if func == "UNION":
                out = F.map_zip_with(
                    out, c,
                    lambda k, a, b: F.when(a.isNull(), b)
                    .when(b.isNull(), a)
                    .otherwise(F.zip_with(a, b, lambda x, y: x + y)))
            elif func == "INTERSECT":
                out = F.map_filter(
                    F.map_zip_with(
                        out, c,
                        lambda k, a, b: F.when(
                            a.isNotNull() & b.isNotNull(),
                            F.zip_with(a, b, lambda x, y: x + y))),
                    lambda k, v: v.isNotNull())
            elif func == "NOT":
                rhs = c
                out = F.map_filter(
                    out, lambda k, v: F.element_at(rhs, k).isNull())
            else:
                raise NotImplementedError(f"tuple set op {func}")
        return out

    def _tuple_leaf(self, pa: dict) -> str | None:
        """First leaf agg name under a tuple set-op tree (all leaves
        share one metric arity, like the reference requires)."""
        for f in pa.get("fields", []):
            if f.get("type") in TUPLE_SETOP_TYPES:
                name = self._tuple_leaf(f)
            else:
                name = f.get("fieldName")
            if name:
                return name
        return None

    def _tuple_finalize_map(self, t: str, m: Column,
                            leaf: str | None) -> Column:
        if t == "arrayOfDoublesSketchToEstimate":
            return F.size(m).cast("double")
        if t == "arrayOfDoublesSketchToNumEntries":
            return F.size(m)
        # ToMetricsSumEstimate: column-wise sum across the map's values
        nm = (self.plan.tuple_nmetrics.get(leaf, 0)
              if self.plan and leaf else 0)
        zeros = F.array_repeat(F.lit(0.0), nm)
        return F.aggregate(
            F.map_values(m), zeros,
            lambda acc, v: F.zip_with(acc, v, lambda x, y: x + y))

    def _qs_finalize(self, pa: dict, kind: str) -> Column:
        name = _pa_target(pa)
        need = (self.plan.quant.get(name) if self.plan else None)
        if need is None:
            raise ValueError(
                f"sketch finalizer {pa['type']} references unknown sketch "
                f"aggregator {name!r} (no SketchPlan entry)")
        s = self.res(name)
        if kind == "quantile":
            idx = need["fractions"].index(float(pa["fraction"]))
            return s.getField("q").getItem(idx)
        if kind == "quantiles":
            idxs = [need["fractions"].index(float(f))
                    for f in pa["fractions"]]
            return F.array(*[s.getField("q").getItem(i) for i in idxs])
        if kind == "histogram":
            return s.getField("hist")
        if kind == "cdf":
            return s.getField("cdf")
        if kind == "rank":
            idx = need["ranks"].index(float(pa["value"]))
            return s.getField("rank").getItem(idx)
        raise NotImplementedError(kind)
