"""Datasketches-surface tests: quantile-sketch finalizer post-aggs and
theta-sketch set ops (extensions-core/datasketches —
DoublesSketchAggregatorFactory / SketchSetPostAggregator analogs).

The Spark-first design under test: SketchPlan pre-scans post-aggs so the
"sketch" compiles to a struct of real aggregate expressions (percentile,
filtered counts) — no sketch blobs, no UDFs, partial-aggregation intact.
"""

import pytest
from pyspark.sql import functions as F

from druid_spark import DruidSparkEngine


@pytest.fixture(scope="module")
def eng(spark):
    e = DruidSparkEngine(spark, exact_approx=True)
    rows = [(i, "a" if i % 2 else "b", float(i), 100 + i % 3) for i in range(1, 101)]
    df = spark.createDataFrame(rows, ["id", "grp", "x", "user"]) \
        .withColumn("__time", F.timestamp_millis(F.col("id") * 1000))
    e.catalog.register_table("t", df)
    return e


def test_quantile_sketch_finalizers(eng):
    df = eng.query({
        "queryType": "groupBy", "dataSource": "t",
        "granularity": "all", "dimensions": ["grp"],
        "aggregations": [{"type": "quantilesDoublesSketch", "name": "qs",
                          "fieldName": "x", "k": 128}],
        "postAggregations": [
            {"type": "quantilesDoublesSketchToQuantile", "name": "p50",
             "field": {"type": "fieldAccess", "fieldName": "qs"},
             "fraction": 0.5},
            {"type": "quantilesDoublesSketchToQuantiles", "name": "iqr",
             "field": {"type": "fieldAccess", "fieldName": "qs"},
             "fractions": [0.25, 0.75]},
            {"type": "quantilesDoublesSketchToHistogram", "name": "hist",
             "field": {"type": "fieldAccess", "fieldName": "qs"},
             "splitPoints": [25.0, 75.0]},
            {"type": "quantilesDoublesSketchToCDF", "name": "cdf",
             "field": {"type": "fieldAccess", "fieldName": "qs"},
             "splitPoints": [50.0]},
            {"type": "quantilesDoublesSketchToRank", "name": "rank50",
             "field": {"type": "fieldAccess", "fieldName": "qs"},
             "value": 50.0},
        ]})
    rows = {r["grp"]: r for r in df.collect()}
    assert "qs" not in df.columns  # struct consumed by finalizers
    a = rows["a"]  # odd numbers 1..99, 50 values
    assert a["p50"] == pytest.approx(49.0, abs=2.0)
    assert a["iqr"][0] < a["p50"] < a["iqr"][1]
    # hist: <25 → 12 odds (1..23); 25..74 → 25 odds; >=75 → 13 odds
    assert a["hist"] == [12, 25, 13]
    assert a["cdf"] == [pytest.approx(25 / 50), pytest.approx(1.0)]
    assert a["rank50"] == pytest.approx(25 / 50)


def test_quantile_sketch_standalone_is_count(eng):
    """no finalizer → finalized value is the stream length N
    (DoublesSketchAggregatorFactory.finalizeComputation)."""
    df = eng.query({
        "queryType": "timeseries", "dataSource": "t", "granularity": "all",
        "aggregations": [{"type": "quantilesDoublesSketch", "name": "qs",
                          "fieldName": "x"}]})
    assert df.collect()[0]["qs"] == 100


def test_theta_setops(eng):
    df = eng.query({
        "queryType": "timeseries", "dataSource": "t", "granularity": "all",
        "aggregations": [
            {"type": "filtered",
             "filter": {"type": "selector", "dimension": "grp", "value": "a"},
             "aggregator": {"type": "thetaSketch", "name": "ua",
                            "fieldName": "user"}},
            {"type": "filtered",
             "filter": {"type": "selector", "dimension": "grp", "value": "b"},
             "aggregator": {"type": "thetaSketch", "name": "ub",
                            "fieldName": "user"}},
        ],
        "postAggregations": [
            {"type": "thetaSketchEstimate", "name": "inter",
             "field": {"type": "thetaSketchSetOp", "func": "INTERSECT",
                       "fields": [{"type": "fieldAccess", "fieldName": "ua"},
                                  {"type": "fieldAccess", "fieldName": "ub"}]}},
            {"type": "thetaSketchEstimate", "name": "uni",
             "field": {"type": "thetaSketchSetOp", "func": "UNION",
                       "fields": [{"type": "fieldAccess", "fieldName": "ua"},
                                  {"type": "fieldAccess", "fieldName": "ub"}]}},
            {"type": "thetaSketchEstimate", "name": "only_a",
             "field": {"type": "thetaSketchSetOp", "func": "NOT",
                       "fields": [{"type": "fieldAccess", "fieldName": "ua"},
                                  {"type": "fieldAccess", "fieldName": "ub"}]}},
            {"type": "thetaSketchEstimate", "name": "est_a",
             "field": {"type": "fieldAccess", "fieldName": "ua"}},
        ]})
    r = df.collect()[0]
    # users are 100,101,102 in both groups → full overlap
    assert r["inter"] == 3.0 and r["uni"] == 3.0 and r["only_a"] == 0.0
    assert r["est_a"] == 3.0
    assert "ua" not in df.columns and "ub" not in df.columns


def test_fixed_buckets_histogram(eng):
    df = eng.query({
        "queryType": "timeseries", "dataSource": "t", "granularity": "all",
        "aggregations": [{"type": "fixedBucketsHistogram", "name": "h",
                          "fieldName": "x", "lowerLimit": 0.0,
                          "upperLimit": 100.0, "numBuckets": 4}]})
    # ignore mode: 100.0 is outside [0,100) and dropped
    assert df.collect()[0]["h"] == [24, 25, 25, 25]
    df = eng.query({
        "queryType": "timeseries", "dataSource": "t", "granularity": "all",
        "aggregations": [{"type": "fixedBucketsHistogram", "name": "h",
                          "fieldName": "x", "lowerLimit": 0.0,
                          "upperLimit": 100.0, "numBuckets": 4,
                          "outlierHandlingMode": "clip"}]})
    # clip mode: 100.0 clamps into the last bin
    assert df.collect()[0]["h"] == [24, 25, 25, 26]


def test_sketch_partial_agg_plan(eng):
    """the sketch struct must aggregate with map-side partials — assert
    the plan contains a partial/final HashAggregate or ObjectHashAggregate
    pair, not a single-node collect."""
    df = eng.query({
        "queryType": "groupBy", "dataSource": "t",
        "granularity": "all", "dimensions": ["grp"],
        "aggregations": [{"type": "quantilesDoublesSketch", "name": "qs",
                          "fieldName": "x"}],
        "postAggregations": [
            {"type": "quantilesDoublesSketchToQuantile", "name": "p50",
             "field": {"type": "fieldAccess", "fieldName": "qs"},
             "fraction": 0.5}]})
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "partial_percentile" in plan or "partial" in plan


def test_tuple_sketch_finalizers(eng):
    """arrayOfDoublesSketch exact mode: distinct keys + metric sums via
    ToEstimate / ToNumEntries / ToMetricsSumEstimate finalizers
    (datasketches ArrayOfDoublesSketchAggregatorFactory analog)."""
    df = eng.query({
        "queryType": "groupBy", "dataSource": "t",
        "granularity": "all", "dimensions": ["grp"],
        "aggregations": [{"type": "arrayOfDoublesSketch", "name": "tup",
                          "fieldNames": ["user"],
                          "metricColumns": ["x"]}],
        "postAggregations": [
            {"type": "arrayOfDoublesSketchToEstimate", "name": "est",
             "field": {"type": "fieldAccess", "fieldName": "tup"}},
            {"type": "arrayOfDoublesSketchToNumEntries", "name": "ne",
             "field": {"type": "fieldAccess", "fieldName": "tup"}},
            {"type": "arrayOfDoublesSketchToMetricsSumEstimate", "name": "ms",
             "field": {"type": "fieldAccess", "fieldName": "tup"}}]})
    rows = {r["grp"]: r for r in df.collect()}
    # users are 100,101,102 in both groups
    assert rows["a"]["est"] == 3.0 and rows["b"]["ne"] == 3
    # sum of x over odd ids (grp a) = 1+3+...+99 = 2500
    assert rows["a"]["ms"] == [2500.0]
    assert rows["b"]["ms"] == [2550.0]


def test_tuple_sketch_standalone_finalizes_to_estimate(eng):
    df = eng.query({
        "queryType": "timeseries", "dataSource": "t", "granularity": "all",
        "aggregations": [{"type": "arrayOfDoublesSketch", "name": "tup",
                          "fieldNames": ["user"], "metricColumns": ["x"]}]})
    assert df.collect()[0]["tup"] == 3.0


def test_bloom_agg_build_and_probe(eng):
    """bloom aggregator builds a sparse-bitset holder; bloom filter
    probes it (bloom-filter extension round trip). Exact membership at
    this size: no false positives expected."""
    holder = eng.query({
        "queryType": "timeseries", "dataSource": "t", "granularity": "all",
        "filter": {"type": "bound", "dimension": "id", "upper": "10",
                   "ordering": "numeric"},
        "aggregations": [{"type": "bloom", "name": "bf",
                          "fieldName": "id"}]}).collect()[0]["bf"]
    assert holder["k"] >= 1 and len(holder["positions"]) <= 10 * holder["k"]
    df = eng.query({
        "queryType": "timeseries", "dataSource": "t", "granularity": "all",
        "filter": {"type": "bloom", "dimension": "id",
                   "bloomKFilter": {"m": holder["m"], "k": holder["k"],
                                    "positions": list(holder["positions"])}},
        "aggregations": [{"type": "count", "name": "n"}]})
    assert df.collect()[0]["n"] == 10  # ids 1..10 (upper inclusive)


def test_spatial_polygon_bound(eng):
    """polygon spatial bound: PNPOLY over a triangle (0,0),(10,0),(0,10)
    — inside iff x+y < 10 for interior integer points."""
    df = eng.query({
        "queryType": "scan", "dataSource": "t",
        "virtualColumns": [{"type": "expression", "name": "loc",
                            "expression":
                                "concat(cast(id % 7, 'STRING'), ',', "
                                "cast(id % 11, 'STRING'))"}],
        "columns": ["id"],
        "filter": {"type": "spatial", "dimension": "loc",
                   "bound": {"type": "polygon",
                             "abscissa": [-0.5, 10.5, -0.5],
                             "ordinate": [-0.5, -0.5, 10.5]}}})
    got = sorted(r["id"] for r in df.collect())
    # inside the triangle with legs at x=-0.5 / y=-0.5 and hypotenuse
    # through (10.5,-0.5),(-0.5,10.5) ⟺ x+y < 10 for integer points
    want = sorted(i for i in range(1, 101) if (i % 7) + (i % 11) < 10)
    assert got == want


def test_expression_lambda_multi_field(eng):
    """multi-field fold (ExpressionLambdaAggregatorFactory fields list):
    accumulate sum of x*id across two bound fields."""
    df = eng.query({
        "queryType": "groupBy", "dataSource": "t",
        "granularity": "all", "dimensions": ["grp"],
        "aggregations": [{"type": "expression", "name": "dot",
                          "fields": ["x", "id"],
                          "initialValue": "0.0",
                          "fold": "__acc + x * id",
                          "accumulatorIdentifier": "__acc"}]})
    rows = {r["grp"]: r["dot"] for r in df.collect()}
    assert rows["a"] == float(sum(i * i for i in range(1, 101, 2)))
    assert rows["b"] == float(sum(i * i for i in range(2, 101, 2)))


# ---------------------------------------------------- mergeable KMV / sample

def test_kmv_merge_is_exact_bottom_k(spark):
    """The load-bearing invariant: bottom-k of a union of per-partition
    bottom-k states EQUALS the global bottom-k — merging loses nothing
    beyond what a single global build would lose. Deterministic
    equality, not a tolerance."""
    from druid_spark import sketch_state as S
    rows = [(i % 7, f"u{i % 533}") for i in range(5000)]
    df = spark.createDataFrame(rows, ["part", "uid"]) \
        .withColumn("all", F.lit(1))
    k = 64
    # per-part states, merged
    parts = S.kmv_state(df, ["part"], "uid", k)
    merged = parts.withColumn("all", F.lit(1)).groupBy("all").agg(
        S.kmv_merge(F.col("uid_kmv"), k).alias("m")).first()["m"]
    # single global state
    direct = S.kmv_state(df, ["all"], "uid", k).first()["uid_kmv"]
    assert merged == direct


def test_kmv_exact_below_k(spark):
    from druid_spark import sketch_state as S
    df = spark.createDataFrame(
        [(1, f"u{i % 37}") for i in range(500)], ["g", "uid"])
    st = S.kmv_state(df, ["g"], "uid", k=128)
    est = st.groupBy("g").agg(
        S.kmv_union_estimate(F.col("uid_kmv"), 128).alias("e")).first()["e"]
    assert est == 37


def test_kmv_estimate_tolerance(spark):
    from druid_spark import sketch_state as S
    n = 20000
    df = spark.createDataFrame([(1, f"u{i}") for i in range(n)], ["g", "uid"])
    k = 1024
    st = S.kmv_state(df, ["g"], "uid", k)
    est = st.groupBy("g").agg(
        S.kmv_union_estimate(F.col("uid_kmv"), k).alias("e")).first()["e"]
    assert abs(est - n) <= 0.12 * n


def test_sample_merge_is_exact_bottom_k(spark):
    from druid_spark import sketch_state as S
    rows = [(i % 5, float(i % 97)) for i in range(3000)]
    df = spark.createDataFrame(rows, ["part", "v"]) \
        .withColumn("salt", F.monotonically_increasing_id()) \
        .withColumn("all", F.lit(1))
    # hashes must be deterministic across both builds: freeze salt
    df = df.persist()
    k = 96
    parts = S.sample_state(df, ["part"], "v", ["salt"], k)
    merged = parts.withColumn("all", F.lit(1)).groupBy("all").agg(
        S.sample_merge(F.col("v_sample"), k).alias("m")).first()["m"]
    direct = S.sample_state(df, ["all"], "v", ["salt"], k).first()["v_sample"]
    df.unpersist()
    assert merged == direct


def test_sample_quantile_small_is_exact(spark):
    """Below k the sample IS the data: nearest-rank quantile of the
    sample equals the true nearest-rank quantile."""
    from druid_spark import sketch_state as S
    vals = [float(v) for v in [3, 1, 4, 1, 5, 9, 2, 6, 5, 3, 5]]
    df = spark.createDataFrame(
        [(1, v, i) for i, v in enumerate(vals)], ["g", "v", "salt"])
    st = S.sample_state(df, ["g"], "v", ["salt"], k=64)
    med = st.groupBy("g").agg(
        S.sample_quantile(S.sample_merge(F.col("v_sample"), 64), 0.5)
        .alias("m")).first()["m"]
    assert med == sorted(vals)[round(0.5 * (len(vals) - 1))]


def test_theta_state_binary_merge(spark):
    """thetaState stores standard Datasketches theta binary; re-merge via
    thetaUnionEstimate across rollup rows equals the exact distinct
    (below lgK=12 capacity the sketch is exact)."""
    eng = DruidSparkEngine(spark)
    rows = [(i, i % 7, i % 500) for i in range(5000)]
    df = spark.createDataFrame(rows, ["id", "part", "u"]) \
        .withColumn("__time", F.timestamp_millis(F.col("id") * 60_000))
    eng.catalog.register_table("tt", df)
    gen1 = eng.query({
        "queryType": "groupBy", "dataSource": "tt", "granularity": "hour",
        "dimensions": ["part"],
        "aggregations": [{"type": "thetaState", "name": "u_sk",
                          "fieldName": "u"}]})
    assert dict(gen1.dtypes)["u_sk"] == "binary"
    merged = gen1.groupBy().agg(
        F.theta_sketch_estimate(F.theta_union_agg("u_sk", 12))
        .cast("long").alias("n")).first()["n"]
    assert merged == 500


def test_kll_state_binary_merge(spark):
    """kllState stores standard Datasketches KLL binary; kllUnionQuantile
    re-merges across rollup rows; median of uniform 0..999 within KLL
    k=200 rank error (~1.65%, assert 5%)."""
    eng = DruidSparkEngine(spark)
    rows = [(i, i % 3, float(i % 1000)) for i in range(6000)]
    df = spark.createDataFrame(rows, ["id", "part", "v"]) \
        .withColumn("__time", F.timestamp_millis(F.col("id") * 60_000))
    eng.catalog.register_table("tk", df)
    gen1 = eng.query({
        "queryType": "groupBy", "dataSource": "tk", "granularity": "hour",
        "dimensions": ["part"],
        "aggregations": [{"type": "kllState", "name": "v_kll",
                          "fieldName": "v"}]})
    assert dict(gen1.dtypes)["v_kll"] == "binary"
    med = gen1.groupBy().agg(
        F.kll_sketch_get_quantile_double(
            F.kll_merge_agg_double("v_kll", 200), F.lit(0.5))
        .alias("m")).first()["m"]
    assert abs(med - 499.5) <= 50


def test_projection_theta_routing(spark):
    """sketch='theta' projection routes hyperUnique to
    thetaUnionEstimate over the stored binary column."""
    from druid_spark.plans.projections import Projection, ProjectionRouter
    eng = DruidSparkEngine(spark)
    rows = [(i, "a" if i % 2 else "b", i % 40) for i in range(2000)]
    df = spark.createDataFrame(rows, ["id", "grp", "u"]) \
        .withColumn("__time", F.timestamp_millis(F.col("id") * 60_000))
    eng.catalog.register_table("tp", df)
    router = ProjectionRouter(eng)
    router.register(Projection(
        "tp_hourly_theta", "tp", ["grp"],
        [{"type": "thetaSketch", "name": "u_sk", "fieldName": "u"}],
        granularity="hour", sketch="theta"))
    q = {"queryType": "groupBy", "dataSource": "tp", "granularity": "all",
         "dimensions": ["grp"],
         "aggregations": [{"type": "hyperUnique", "name": "users",
                           "fieldName": "u"}]}
    routed = router.route(q)
    assert routed["aggregations"][0]["type"] == "thetaUnionEstimate"
    # grp 'a' = odd ids -> 20 distinct odd (i % 40); 'b' = 20 distinct even
    got = {r["grp"]: r["users"] for r in router.query(q).collect()}
    assert got == {"a": 20, "b": 20}


def test_tuple_state_build_merge(spark):
    """Engine-internal stored tuple sketch (arrayOfDoublesSketch analog):
    per-day states re-merge to exact distinct keys (below k) + exact
    metric sums; state stays O(k) regardless of cardinality."""
    from druid_spark import sketch_state as S
    rows = [(d, u % 7, float(u)) for d in ("d1", "d2", "d3")
            for u in range(30)]
    df = spark.createDataFrame(rows, ["day", "uid", "v"])
    state = S.tuple_state(df, ["day"], "uid", ["v"], k=16)
    per_day = state.collect()
    assert len(per_day) == 3
    for r in per_day:
        assert len(r["tuple_state"]["kmv"]) <= 16  # bounded state
        assert r["tuple_state"]["sums"][0] == sum(float(u) for u in range(30))
    merged = state.agg(
        S.tuple_union_estimate(F.col("tuple_state"), 16).alias("n"),
        S.tuple_union_metric_sum(F.col("tuple_state"), 1).alias("s")).first()
    assert merged["n"] == 7  # distinct uids, exact below k
    assert merged["s"] == 3 * sum(float(u) for u in range(30))


def test_tuple_sketch_set_ops(engine):
    """arrayOfDoublesSketchSetOp (ArrayOfDoublesSketchSetOpPost-
    Aggregator): INTERSECT/UNION/NOT estimates + metrics-sum over the
    set-op result, checked against a DuckDB per-key oracle."""
    import os

    import duckdb

    from tests.conftest import SF_DIR

    def tup(name, flag):
        return {"type": "filtered", "name": name,
                "filter": {"type": "selector", "dimension": "l_returnflag",
                           "value": flag},
                "aggregator": {"type": "arrayOfDoublesSketch",
                               "name": name,
                               "fieldNames": ["l_orderkey"],
                               "metricColumns": ["l_quantity"]}}

    def setop(func):
        return {"type": "arrayOfDoublesSketchSetOp", "func": func,
                "fields": [{"type": "fieldAccess", "fieldName": "a"},
                           {"type": "fieldAccess", "fieldName": "b"}]}

    r = engine.query({
        "queryType": "timeseries", "dataSource": "lineitem",
        "granularity": "all",
        "aggregations": [tup("a", "R"), tup("b", "A")],
        "postAggregations": [
            {"type": "arrayOfDoublesSketchToEstimate", "name": "inter",
             "field": setop("INTERSECT")},
            {"type": "arrayOfDoublesSketchToEstimate", "name": "uni",
             "field": setop("UNION")},
            {"type": "arrayOfDoublesSketchToNumEntries", "name": "anotb",
             "field": setop("NOT")},
            {"type": "arrayOfDoublesSketchToMetricsSumEstimate",
             "name": "isum", "field": setop("INTERSECT")},
        ]}).collect()[0]
    con = duckdb.connect()
    con.execute(f"CREATE VIEW lineitem AS SELECT * FROM "
                f"'{os.path.join(SF_DIR, 'lineitem.parquet')}'")
    o = con.execute("""
        WITH a AS (SELECT l_orderkey k, SUM(l_quantity) v FROM lineitem
                   WHERE l_returnflag='R' GROUP BY 1),
             b AS (SELECT l_orderkey k, SUM(l_quantity) v FROM lineitem
                   WHERE l_returnflag='A' GROUP BY 1)
        SELECT (SELECT count(*) FROM a JOIN b USING (k)),
               (SELECT count(*) FROM
                (SELECT k FROM a UNION SELECT k FROM b)),
               (SELECT count(*) FROM a
                WHERE k NOT IN (SELECT k FROM b)),
               (SELECT SUM(a.v + b.v) FROM a JOIN b USING (k))
        """).fetchone()
    assert r["inter"] == float(o[0])
    assert r["uni"] == float(o[1])
    assert r["anotb"] == o[2]
    assert abs(r["isum"][0] - float(o[3])) < 1e-6


def test_tuple_sketch_nominal_entries_bounds_state(engine):
    """Round 6: nominalEntries caps the tuple-sketch map state at the
    bottom-k keys by hash (the KMV sample the reference retains —
    ArrayOfDoublesSketchAggregatorFactory.java nominalEntries).
    With key cardinality >> cap, the state holds exactly `cap` entries;
    below the cap behavior is the exact map (existing oracle tests)."""
    # SQL surface: two identically-capped builds over the same
    # high-cardinality key retain the SAME bottom-64 hash sample, so
    # UNION of the two has exactly 64 entries and INTERSECT == UNION.
    row = engine.sql("""
        SELECT DS_TUPLE_DOUBLES_ESTIMATE(DS_TUPLE_DOUBLES_UNION(
                 DS_TUPLE_DOUBLES(l_orderkey, l_quantity, 64),
                 DS_TUPLE_DOUBLES(l_orderkey, l_quantity, 64))) AS uni,
               DS_TUPLE_DOUBLES_ESTIMATE(DS_TUPLE_DOUBLES_INTERSECT(
                 DS_TUPLE_DOUBLES(l_orderkey, l_quantity, 64),
                 DS_TUPLE_DOUBLES(l_orderkey, l_quantity, 64))) AS inter,
               CAST(COUNT(DISTINCT l_orderkey) AS DOUBLE) AS exact
        FROM lineitem""").collect()[0]
    assert row["exact"] > 1000  # cardinality >> cap
    assert row["uni"] == 64.0 and row["inter"] == 64.0
    # native surface: nominalEntries on the aggregator spec
    from pyspark.sql import functions as F
    from druid_spark.aggregations import tuple_map_state
    li = engine.catalog.table("lineitem")
    m = li.agg(tuple_map_state(
        F.col("l_orderkey"), [F.col("l_quantity")], cap=32
    ).alias("m")).collect()[0]["m"]
    assert len(m) == 32
    # retained keys are the bottom-32 by xxhash64 (KMV invariant)
    hashes = li.select(
        F.xxhash64(F.col("l_orderkey").cast("string")).alias("h"),
        F.col("l_orderkey").cast("string").alias("k")
    ).distinct().orderBy("h").limit(32).collect()
    assert set(m.keys()) == {r["k"] for r in hashes}
    # metric sums inside the retained entries are the exact per-key sums
    ok = sorted(m.keys())[0]
    exact = li.where(F.col("l_orderkey").cast("string") == ok) \
              .agg(F.sum("l_quantity")).collect()[0][0]
    assert abs(m[ok][0] - float(exact)) < 1e-6


def test_tuple_sketch_session_default_cap(spark):
    """Round 7 (VERDICT r6 #1): a DEFAULT (non-exact) session bounds
    tuple-sketch map state even when the aggregator omits
    nominalEntries — the reference samples at ITS default in that case
    (extensions-core/datasketches/.../
    ArrayOfDoublesSketchAggregatorFactory.java), so a Druid query
    ported verbatim must not fold O(distinct keys) state per group.
    Exact sessions (the oracle bank, the differential fuzzers) force
    the cap off and keep byte-exact unbounded folds."""
    from tests.conftest import SF_DIR

    # stock default is the reference's 4096; exact sessions force None
    assert DruidSparkEngine(spark, data_dir=SF_DIR) \
        .sketch_default_nominal_entries == 4096
    assert DruidSparkEngine(spark, data_dir=SF_DIR, exact_approx=True) \
        .sketch_default_nominal_entries is None

    # small session default so cardinality >> cap is cheap to assert
    eng = DruidSparkEngine(spark, data_dir=SF_DIR,
                           sketch_default_nominal_entries=64)
    row = eng.sql("""
        SELECT DS_TUPLE_DOUBLES_ESTIMATE(DS_TUPLE_DOUBLES_INTERSECT(
                 DS_TUPLE_DOUBLES(l_orderkey, l_quantity),
                 DS_TUPLE_DOUBLES(l_orderkey, l_quantity))) AS inter,
               CAST(COUNT(DISTINCT l_orderkey) AS DOUBLE) AS exact
        FROM lineitem""").collect()[0]
    assert row["exact"] > 1000          # cardinality >> session cap
    assert row["inter"] == 64.0         # bounded at the session default
    # an EXPLICIT nominalEntries still overrides the session default
    row = eng.sql("""
        SELECT DS_TUPLE_DOUBLES_ESTIMATE(DS_TUPLE_DOUBLES_INTERSECT(
                 DS_TUPLE_DOUBLES(l_orderkey, l_quantity, 32),
                 DS_TUPLE_DOUBLES(l_orderkey, l_quantity, 32))) AS inter
        FROM lineitem""").collect()[0]
    assert row["inter"] == 32.0

    # native path: no nominalEntries on the aggregator spec → the
    # set-op map state is bounded at the session default
    q = {"queryType": "timeseries", "dataSource": "lineitem",
         "granularity": "all",
         "aggregations": [
             {"type": "arrayOfDoublesSketch", "name": "a",
              "fieldNames": ["l_orderkey"], "metricColumns": ["l_quantity"]},
             {"type": "arrayOfDoublesSketch", "name": "b",
              "fieldNames": ["l_orderkey"], "metricColumns": ["l_quantity"]}],
         "postAggregations": [
             {"type": "arrayOfDoublesSketchToEstimate", "name": "inter",
              "field": {"type": "arrayOfDoublesSketchSetOp",
                        "func": "INTERSECT",
                        "fields": [
                            {"type": "fieldAccess", "fieldName": "a"},
                            {"type": "fieldAccess", "fieldName": "b"}]}}]}
    assert eng.query(q).collect()[0]["inter"] == 64.0
    # the exact session folds the full map — the true distinct count
    exact_eng = DruidSparkEngine(spark, data_dir=SF_DIR, exact_approx=True)
    li = exact_eng.catalog.table("lineitem")
    true_distinct = li.select("l_orderkey").distinct().count()
    assert exact_eng.query(q).collect()[0]["inter"] == float(true_distinct)


def test_finalize_false_returns_mergeable_state(spark):
    """Round 7: query context `finalize: false` (QueryContexts — the
    broker sets it on fan-out so nodes return MERGEABLE states) makes
    sketch aggregators emit their binary HLL state instead of the
    estimate; estimating the returned blob reproduces the finalized
    answer."""
    from pyspark.sql import functions as F

    from tests.conftest import SF_DIR

    eng = DruidSparkEngine(spark, data_dir=SF_DIR)  # non-exact session
    q = {"queryType": "timeseries", "dataSource": "events",
         "granularity": "all",
         "aggregations": [{"type": "hyperUnique", "name": "u",
                           "fieldName": "user_id"}]}
    fin = eng.query(q).collect()[0]["u"]
    raw = eng.query({**q, "context": {"finalize": False}})
    [f] = [fld for fld in raw.schema.fields if fld.name == "u"]
    assert f.dataType.typeName() == "binary"        # mergeable blob
    est = raw.select(
        F.hll_sketch_estimate(F.col("u")).alias("e")).collect()[0]["e"]
    assert est == fin


def test_hll_druid_parity_vs_jvm_datasketches(spark):
    """r13: the engine's HLL update stream is value-identical to the
    reference's (HllSketchBuildUtil.java:36-61 + the UTF16LE default
    at HllSketchAggregatorFactory.java:52), differential-tested
    against the SAME JVM Datasketches library Spark ships:

    - strings hash as UTF-16LE char[] == their UTF-16LE bytes through
      MurmurHash3's byte[] entry point (proven below on multilingual
      inputs),
    - longs pass raw (Spark's agg calls update(long) itself),
    - doubles hash as the LE bytes of doubleToLongBits with
      update(double)'s canonicalization (-0.0 -> 0.0, canonical NaN),

    so a single-stream engine estimate equals the estimate a
    single-segment reference deployment pins — including in the
    non-exact regime (4000 distinct at lgK=12 estimates 4059, not
    4000).  Merged estimates vary with partition layout exactly as
    the reference's vary with segment layout (datasketches HIP
    replay), so the pin uses one partition."""
    jvm = spark.sparkContext._jvm
    gw = spark.sparkContext._gateway
    HllSketch = jvm.org.apache.datasketches.hll.HllSketch

    # 1. char[] vs UTF-16LE bytes: identical hash stream
    strs = ["hello", "wörld", "sn☃man", "a", "", "user_42", "Ārya"]
    sk_c, sk_b = HllSketch(12), HllSketch(12)
    for s in strs:
        arr = gw.new_array(gw.jvm.char, len(s))
        for i, ch in enumerate(s):
            arr[i] = ch
        sk_c.update(arr)
        sk_b.update(s.encode("utf-16-le"))
    assert sk_c.getEstimate() == sk_b.getEstimate()

    # 2. strings, non-exact regime: JVM direct build (what a
    # single-segment reference pins) == engine single-stream path;
    # the old UTF-8 hashing gives a DIFFERENT estimate here
    vals = [f"user_{i}" for i in range(4000)]
    skj = HllSketch(12)
    for v in vals:
        skj.update(v.encode("utf-16-le"))
    jref = round(skj.getEstimate())
    assert jref != 4000  # genuinely approximate at this cardinality
    df = spark.createDataFrame([(v,) for v in vals], "v string") \
              .repartition(1)
    got = df.selectExpr(
        "hll_sketch_estimate(hll_sketch_agg(encode(v, 'UTF-16LE'), "
        "12)) AS e").collect()[0]["e"]
    assert got == jref
    utf8 = df.selectExpr(
        "hll_sketch_estimate(hll_sketch_agg(v, 12)) AS e"
    ).collect()[0]["e"]
    assert utf8 != jref

    # 3. longs: update(long) == raw BIGINT input
    skl = HllSketch(12)
    for v in range(4000):
        skl.update(v * 7919)
    jl = round(skl.getEstimate())
    dfl = spark.createDataFrame(
        [(v * 7919,) for v in range(4000)], "v long").repartition(1)
    assert dfl.selectExpr(
        "hll_sketch_estimate(hll_sketch_agg(v, 12)) AS e"
    ).collect()[0]["e"] == jl

    # 4. doubles: update(double) == __ds_hll_d2b LE-bits bytes,
    # including the -0.0/NaN canonicalization corners
    from druid_spark.functions.register import register_druid_functions
    register_druid_functions(spark)
    dv = [i * 0.7919 for i in range(4000)] + [0.0, -0.0, float("nan")]
    skd = HllSketch(12)
    for v in dv:
        skd.update(v)
    jd = round(skd.getEstimate())
    dfd = spark.createDataFrame([(v,) for v in dv], "v double") \
               .repartition(1)
    assert dfd.selectExpr(
        "hll_sketch_estimate(hll_sketch_agg(CASE WHEN v IS NOT NULL "
        "THEN __ds_hll_d2b(CAST(v AS DOUBLE)) END, 12)) AS e"
    ).collect()[0]["e"] == jd


def test_hll_parity_through_sql_surface(engine):
    """The APPROX_COUNT_DISTINCT_DS_HLL SQL path uses the parity
    input dispatch per column type (sqlshim._hll_parity_input): the
    engine fixture is exact (oracle contract), so route through a
    non-exact engine and check the approx answer lands within the
    lgK=12 error bounds on a typed column of each family."""
    e = DruidSparkEngine(engine.spark, data_dir="/root/testdata/sf0.001")
    for col, tbl in (("user_id", "events"), ("event_type", "events"),
                     ("value", "events")):
        exact = engine.sql(
            f"SELECT COUNT(DISTINCT {col}) AS c FROM {tbl}"
        ).collect()[0]["c"]
        approx = e.sql(
            f"SELECT APPROX_COUNT_DISTINCT_DS_HLL({col}) AS c "
            f"FROM {tbl}").collect()[0]["c"]
        assert abs(approx - exact) <= max(4, 0.05 * exact), \
            (col, exact, approx)
