"""Aggregate projections: segment-level materialized rollups matched at
query time.

Reference: processing/.../data/input/impl/AggregateProjectionSpec.java:61,
processing/.../segment/AggregateProjectionMetadata.java, and
docs/querying/projections.md — Druid stores pre-aggregated projections
inside segments and routes eligible queries to them transparently.

Spark-first: a projection is a materialized aggregate table (rollup of
base on (time grain, dims) with metric aggregators). The router
rewrites an incoming native query to hit the projection when:
- every query dimension ⊆ projection dimensions
- the query granularity is coarser than or equal to the projection's
- every aggregator is derivable from a projection metric (sum→sum of
  partial sums, count→sum of partial counts, min/max→min/max)
- the filter references only projection dimensions (+ __time)

This is a pre-Catalyst rewrite in our compiler (SURVEY §4.2 verdict:
no Catalyst rule needed for v1). The scan drops from raw-row scale to
rollup scale — the same reason Druid ships the feature.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame

from druid_spark import granularity as G
from pyspark.sql import functions as F

# grain fineness ordering for coarser-or-equal checks
_GRAIN_ORDER = ["second", "minute", "fifteen_minute", "thirty_minute",
                "hour", "six_hour", "eight_hour", "day", "week", "month",
                "quarter", "year", "all"]

# aggregator type → (re-aggregation type over partial results)
_REAGG = {
    "count": "longSum",      # partial counts re-combine by summing
    "longSum": "longSum", "doubleSum": "doubleSum", "floatSum": "floatSum",
    "longMin": "longMin", "doubleMin": "doubleMin", "floatMin": "floatMin",
    "longMax": "longMax", "doubleMax": "doubleMax", "floatMax": "floatMax",
}


class Projection:
    def __init__(self, name: str, base_table: str, dimensions: list[str],
                 metrics: list[dict], granularity: str = "hour",
                 sketch: bool = False):
        self.name = name
        self.base_table = base_table
        self.dimensions = dimensions
        self.metrics = metrics
        self.granularity = granularity
        # sketch=True|"hll" stores distinct metrics as BINARY
        # Datasketches HLL state; sketch="theta" as BINARY Datasketches
        # theta state (supports set ops downstream); sketch="kmv" as KMV
        # bottom-k hash arrays (sketch_state.py, engine-internal) — all
        # bounded size and mergeable, the 100 TB mode; exact sets
        # approach raw-data scale at high cardinality. False keeps
        # lossless sets for oracle-exact answers. Metrics may also
        # include {"type": "sampleState"} (bottom-k uniform row samples,
        # engine-internal) or {"type": "kllState"} (binary Datasketches
        # KLL) for mergeable quantile estimates over the rollup.
        self.sketch = sketch
        self.df: DataFrame | None = None

    def build(self, engine) -> DataFrame:
        """Materialize the rollup (at ingest time in a real deployment;
        persisted parquet or cached DF here). Distinct-count metrics
        (hyperUnique/thetaSketch) are stored as the distinct SET per
        rollup row (exact mode) or as mergeable HLL sketch state
        (sketch mode) — the reference's HllSketchBuild column in rollup
        segments (extensions-core/datasketches/.../hll/
        HllSketchBuildAggregatorFactory.java)."""
        if self.sketch == "kmv":
            distinct_store = "kmvState"
        elif self.sketch == "theta":
            distinct_store = "thetaState"
        elif self.sketch:
            distinct_store = "hllState"
        else:
            distinct_store = "setCollect"
        build_metrics, bounded = [], []
        for m in self.metrics:
            if m["type"] in ("hyperUnique", "thetaSketch", "HLLSketchBuild"):
                if distinct_store == "kmvState":
                    bounded.append({**m, "type": "kmvState"})
                else:
                    build_metrics.append({**m, "type": distinct_store})
            elif m["type"] == "sampleState":
                bounded.append(m)
            else:
                build_metrics.append(m)
        rollup = None
        if build_metrics or not bounded:
            q = {
                "queryType": "groupBy",
                "dataSource": self.base_table,
                "granularity": self.granularity,
                "dimensions": self.dimensions,
                "aggregations": build_metrics,
            }
            rollup = engine.query(q)
        for frame in self._bounded_frames(engine, bounded):
            rollup = frame if rollup is None else rollup.join(
                frame, ["__time", *self.dimensions], "left")
        self.df = rollup
        return self.df

    def _bounded_frames(self, engine, bounded: list[dict]):
        """Build kmvState / sampleState columns with the two-shuffle
        bounded plan (sketch_state.py): distinct/hash projection →
        per-group window top-k → collect_list of <= k rows. Never an
        unbounded in-memory set — the build itself survives 100x."""
        if not bounded:
            return
        from druid_spark import sketch_state as S

        base = engine.catalog.table(self.base_table).withColumn(
            "__time_raw", F.col("__time")).withColumn(
            "__time", G.bucket(F.col("__time"), self.granularity))
        keys = ["__time", *self.dimensions]
        for m in bounded:
            k = m.get("k", S.DEFAULT_K)
            field, name = m["fieldName"], m["name"]
            if m["type"] == "kmvState":
                frame = S.kmv_state(base, keys, field, k)
                yield frame.withColumnRenamed(f"{field}_kmv", name)
            else:
                salt = m.get("saltFields", ["__time_raw"])
                frame = S.sample_state(base, keys, field, salt, k)
                yield frame.withColumnRenamed(f"{field}_sample", name)


class ProjectionRouter:
    def __init__(self, engine):
        self.engine = engine
        self.projections: dict[str, Projection] = {}

    def register(self, proj: Projection, materialize: bool = True,
                 persist: bool = True) -> None:
        if materialize:
            proj.build(self.engine)
            if persist:
                proj.df = proj.df.persist()
                proj.df.count()
        self.projections[proj.name] = proj
        # expose as a queryable datasource too
        self.engine.catalog.register_table(f"__proj_{proj.name}", proj.df)

    # ---------------------------------------------------------- routing
    def route(self, q: dict[str, Any]) -> dict[str, Any] | None:
        """Return a rewritten query against a projection, or None."""
        if q.get("queryType") not in ("timeseries", "groupBy", "topN"):
            return None
        ds = q.get("dataSource")
        if not isinstance(ds, str):
            return None
        for proj in self.projections.values():
            if proj.base_table != ds:
                continue
            rewritten = self._try_rewrite(q, proj)
            if rewritten is not None:
                return rewritten
        return None

    def query(self, q: dict[str, Any]) -> DataFrame:
        """Route-or-fallthrough entry point."""
        routed = self.route(q)
        return self.engine.query(routed if routed is not None else q)

    def _try_rewrite(self, q: dict, proj: Projection) -> dict | None:
        # dimension subset check
        qdims = []
        for d in q.get("dimensions") or []:
            if isinstance(d, str):
                qdims.append(d)
            elif d.get("type") == "default":
                qdims.append(d["dimension"])
            else:
                return None  # extraction dims: route only on exact cols
        if q.get("queryType") == "topN":
            dim = q["dimension"]
            qdims.append(dim if isinstance(dim, str) else dim["dimension"])
        if not set(qdims) <= set(proj.dimensions):
            return None
        # granularity coarser-or-equal
        qg = q.get("granularity", "all")
        if not _coarser_or_equal(qg, proj.granularity):
            return None
        # interval endpoints must sit on projection-grain bucket
        # boundaries: the rollup's __time is truncated, so a
        # partial-bucket endpoint would silently include/exclude the
        # whole bucket
        if not _intervals_aligned(q.get("intervals"), proj.granularity):
            return None
        # filter columns ⊆ projection dims (+ __time)
        fcols = _filter_columns(q.get("filter"))
        if not fcols <= set(proj.dimensions) | {"__time"}:
            return None
        if q.get("virtualColumns"):
            return None
        # aggregator derivability
        metric_names = {m.get("name", m["type"]): m for m in proj.metrics}
        new_aggs = []
        for agg in q.get("aggregations") or []:
            t = agg["type"]
            if t == "count":
                # need a count metric in the projection
                cnt = next((n for n, m in metric_names.items()
                            if m["type"] == "count"), None)
                if cnt is None:
                    return None
                new_aggs.append({"type": "longSum",
                                 "name": agg.get("name", "count"),
                                 "fieldName": cnt})
                continue
            if t in ("hyperUnique", "thetaSketch", "HLLSketchBuild"):
                # distinct-count over a stored distinct-set metric:
                # re-merge by set union (exact theta merge)
                src = next((n for n, m in metric_names.items()
                            if m["type"] in ("hyperUnique", "thetaSketch",
                                             "HLLSketchBuild")
                            and m.get("fieldName") == agg.get("fieldName")),
                           None)
                if src is None:
                    return None
                m = metric_names[src]
                if proj.sketch == "kmv":
                    new_aggs.append({"type": "kmvUnionEstimate",
                                     "name": agg.get("name", t),
                                     "fieldName": src,
                                     "k": m.get("k", 1024)})
                elif proj.sketch == "theta":
                    new_aggs.append({"type": "thetaUnionEstimate",
                                     "name": agg.get("name", t),
                                     "fieldName": src})
                elif proj.sketch:
                    new_aggs.append({"type": "hllUnionEstimate",
                                     "name": agg.get("name", t),
                                     "fieldName": src})
                else:
                    new_aggs.append({"type": "setUnionSize",
                                     "name": agg.get("name", t),
                                     "fieldName": src})
                continue
            if t not in _REAGG:
                return None
            src = next((n for n, m in metric_names.items()
                        if m["type"] == t
                        and m.get("fieldName") == agg.get("fieldName")), None)
            if src is None:
                return None
            new_aggs.append({"type": _REAGG[t],
                             "name": agg.get("name", t), "fieldName": src})
        out = dict(q)
        out["dataSource"] = f"__proj_{proj.name}"
        out["aggregations"] = new_aggs
        return out


def _intervals_aligned(intervals, grain: str) -> bool:
    """True iff every interval endpoint lies on a `grain` bucket
    boundary (so filtering the truncated rollup __time is exact)."""
    if not intervals:
        return True
    from datetime import datetime, timezone

    def aligned(dt: datetime) -> bool:
        if dt.microsecond:
            return False
        checks = {
            "second": lambda: True,
            "minute": lambda: dt.second == 0,
            "fifteen_minute": lambda: dt.second == 0 and dt.minute % 15 == 0,
            "thirty_minute": lambda: dt.second == 0 and dt.minute % 30 == 0,
            "hour": lambda: dt.second == 0 and dt.minute == 0,
            "six_hour": lambda: dt.second == 0 and dt.minute == 0
                and dt.hour % 6 == 0,
            "eight_hour": lambda: dt.second == 0 and dt.minute == 0
                and dt.hour % 8 == 0,
            "day": lambda: (dt.hour, dt.minute, dt.second) == (0, 0, 0),
            "week": lambda: (dt.hour, dt.minute, dt.second) == (0, 0, 0)
                and dt.isoweekday() == 1,
            "month": lambda: dt.day == 1
                and (dt.hour, dt.minute, dt.second) == (0, 0, 0),
            "quarter": lambda: dt.day == 1 and dt.month in (1, 4, 7, 10)
                and (dt.hour, dt.minute, dt.second) == (0, 0, 0),
            "year": lambda: dt.month == 1 and dt.day == 1
                and (dt.hour, dt.minute, dt.second) == (0, 0, 0),
        }
        fn = checks.get(grain)
        return fn() if fn else False

    for iv in intervals:
        for endpoint in str(iv).split("/"):
            try:
                dt = datetime.fromisoformat(endpoint.replace("Z", "+00:00"))
            except ValueError:
                return False
            if dt.tzinfo is not None:
                dt = dt.astimezone(timezone.utc)
            if not aligned(dt):
                return False
    return True


def _coarser_or_equal(qg, pg) -> bool:
    def norm(g):
        if isinstance(g, dict):
            if g.get("type") == "all":
                return "all"
            period = g.get("period")
            rev = {"PT1S": "second", "PT1M": "minute", "PT1H": "hour",
                   "P1D": "day", "P1W": "week", "P1M": "month",
                   "P3M": "quarter", "P1Y": "year"}
            return rev.get(period)
        return g
    qn, pn = norm(qg), norm(pg)
    if qn is None or pn is None:
        return False
    if qn == "all":
        return True
    if qn not in _GRAIN_ORDER or pn not in _GRAIN_ORDER:
        return False
    # calendar grains only compose cleanly when qn is a multiple; the
    # _GRAIN_ORDER index check is correct for the standard tower
    # second<minute<hour<day<month... (week does not divide month/year)
    if qn in ("week",) and pn not in ("second", "minute", "hour", "day"):
        return False
    return _GRAIN_ORDER.index(qn) >= _GRAIN_ORDER.index(pn)


def _filter_columns(f: dict | None) -> set[str]:
    if not f:
        return set()
    t = f.get("type")
    if t in ("and", "or"):
        out = set()
        for sub in f.get("fields", []):
            out |= _filter_columns(sub)
        return out
    if t == "not":
        return _filter_columns(f.get("field"))
    cols = set()
    for key in ("dimension", "column"):
        if f.get(key):
            cols.add(f[key])
    if t == "columnComparison":
        for d in f.get("dimensions", []):
            cols.add(d if isinstance(d, str) else d["dimension"])
    if t == "expression":
        # conservative: unknown columns → refuse routing
        from druid_spark.expr import parse, Ref, Bin, Un, Call, Lambda
        def walk(n):
            if isinstance(n, Ref):
                cols.add(n.name)
            elif isinstance(n, Bin):
                walk(n.l); walk(n.r)
            elif isinstance(n, Un):
                walk(n.x)
            elif isinstance(n, Call):
                for a in n.args:
                    walk(a)
            elif isinstance(n, Lambda):
                walk(n.body)
        walk(parse(f["expression"]))
    return cols
