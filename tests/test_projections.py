"""Aggregate projection routing tests (AggregateProjectionSpec analog)."""

import pytest

from druid_spark.plans.projections import Projection, ProjectionRouter


@pytest.fixture(scope="module")
def router(engine):
    r = ProjectionRouter(engine)
    r.register(Projection(
        name="events_hourly",
        base_table="events",
        dimensions=["event_type"],
        metrics=[{"type": "count", "name": "cnt"},
                 {"type": "doubleSum", "name": "v_sum", "fieldName": "value"}],
        granularity="hour"))
    return r


def _q(granularity="day", dims=None, filt=None, aggs=None):
    q = {
        "queryType": "groupBy" if dims else "timeseries",
        "dataSource": "events",
        "granularity": granularity,
        "aggregations": aggs or [
            {"type": "count", "name": "n"},
            {"type": "doubleSum", "name": "total", "fieldName": "value"}],
        "context": {"skipEmptyBuckets": True},
    }
    if dims:
        q["dimensions"] = dims
    if filt:
        q["filter"] = filt
    return q


def test_routes_coarser_granularity(router):
    q = _q(granularity="day")
    assert router.route(q)["dataSource"] == "__proj_events_hourly"


def test_no_route_finer_granularity(router):
    assert router.route(_q(granularity="minute")) is None


def test_no_route_unknown_dim(router):
    assert router.route(_q(dims=["user_id"])) is None


def test_no_route_unknown_filter_col(router):
    q = _q(filt={"type": "range", "column": "value", "lower": 50.0})
    assert router.route(q) is None


def test_no_route_misaligned_interval(router):
    # a mid-bucket endpoint against an hourly rollup would silently
    # include/exclude the whole partial hour — routing must refuse
    q = _q(granularity="day")
    q["intervals"] = ["2024-01-01T00:30:00Z/2024-01-02T00:00:00Z"]
    assert router.route(q) is None


def test_routes_aligned_interval(router):
    q = _q(granularity="day")
    q["intervals"] = ["2024-01-01T00:00:00Z/2024-01-02T00:00:00Z"]
    assert router.route(q)["dataSource"] == "__proj_events_hourly"


def test_projection_sketch_mode_stores_binary_state(engine):
    """sketch=True rollups hold mergeable Datasketches HLL binary state;
    routed distinct queries re-merge via hll_union_agg and land within
    the sketch's error bound of the exact answer."""
    r = ProjectionRouter(engine)
    r.register(Projection(
        name="ev_hll", base_table="events", dimensions=["event_type"],
        metrics=[{"type": "HLLSketchBuild", "name": "u",
                  "fieldName": "user_id"}],
        granularity="hour", sketch=True))
    proj_df = r.projections["ev_hll"].df
    assert dict(proj_df.dtypes)["u"] == "binary"
    q = {"queryType": "groupBy", "dataSource": "events",
         "granularity": "day", "dimensions": ["event_type"],
         "aggregations": [{"type": "hyperUnique", "name": "users",
                           "fieldName": "user_id"}]}
    routed = r.route(q)
    assert routed["aggregations"][0]["type"] == "hllUnionEstimate"
    est = {(row["__time"], row["event_type"]): row["users"]
           for row in r.query(q).collect()}
    exact = {(row["__time"], row["event_type"]): row["users"]
             for row in engine.query(q).collect()}
    assert est.keys() == exact.keys()
    for k, v in exact.items():
        assert abs(est[k] - v) <= max(0.05 * v, 2)


def test_routed_results_match_base(router, engine):
    """The projection-routed answer must equal the base-table answer."""
    q = _q(granularity="day", dims=["event_type"],
           filt={"type": "selector", "dimension": "event_type",
                 "value": "click"})
    routed = router.route(q)
    assert routed is not None and routed["dataSource"] == "__proj_events_hourly"
    base_rows = {(str(r["__time"]), r["event_type"]): (r["n"], round(r["total"], 3))
                 for r in engine.query(q).collect()}
    proj_rows = {(str(r["__time"]), r["event_type"]): (r["n"], round(r["total"], 3))
                 for r in engine.query(routed).collect()}
    assert base_rows == proj_rows and len(base_rows) > 0


def test_routed_timeseries_all(router, engine):
    q = _q(granularity="all")
    routed = router.route(q)
    assert routed is not None
    b = engine.query(q).collect()[0]
    p = engine.query(routed).collect()[0]
    assert b["n"] == p["n"]
    assert round(b["total"], 3) == round(p["total"], 3)


def test_projection_distinct_count_set_merge(spark):
    """hyperUnique over a rollup: stored distinct sets re-merge by set
    union — must equal the raw count(DISTINCT) exactly."""
    from druid_spark import DruidSparkEngine
    from druid_spark.plans.projections import Projection, ProjectionRouter
    from pyspark.sql import functions as F

    e = DruidSparkEngine(spark, exact_approx=True)
    rows = [(i, f"2024-01-0{1 + i % 3} {i % 24:02d}:00:00",
             "a" if i % 2 else "b", 100 + i % 7) for i in range(200)]
    df = spark.createDataFrame(rows, ["i", "t", "grp", "user"]) \
        .withColumn("__time", F.to_timestamp("t"))
    e.catalog.register_table("ev", df)
    router = ProjectionRouter(e)
    router.register(Projection("p", "ev", ["grp"],
                               [{"type": "thetaSketch", "name": "us",
                                 "fieldName": "user"}], granularity="hour"))
    q = {"queryType": "groupBy", "dataSource": "ev", "granularity": "day",
         "dimensions": ["grp"],
         "aggregations": [{"type": "hyperUnique", "name": "users",
                           "fieldName": "user"}]}
    assert router.route(q)["aggregations"][0]["type"] == "setUnionSize"
    got = {(str(r["__time"]), r["grp"]): r["users"]
           for r in router.query(q).collect()}
    exp = {(str(r["__time"]), r["grp"]): r["users"]
           for r in e.query(q).collect()}
    assert got == exp and len(got) == 6
