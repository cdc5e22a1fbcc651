"""Hard-part semantics tests (SURVEY §7.3) on the reference's canonical
`foo` fixture (TestDataBuilder.java:116): multi-value dimension
filter/group behavior, legacy vs SQL null handling, and the Druid
expression language.

Mirrors the reference's per-operator unit test strategy
(GroupByQueryRunnerTest / BaseFilterTest shapes).
"""

import math

import pytest
from pyspark.sql import functions as F

from druid_spark import DruidSparkEngine
from druid_spark.expr import compile_expr


@pytest.fixture(scope="module")
def fooeng(spark, foo):
    e = DruidSparkEngine(spark, exact_approx=True)
    e.catalog.register_table("foo", foo)
    return e


# ------------------------------------------------------------------ MVD

def test_mvd_filter_any_match(fooeng):
    """selector on MVD matches when ANY value matches
    (docs/querying/multi-value-dimensions.md:355)."""
    df = fooeng.query({
        "queryType": "scan", "dataSource": "foo",
        "columns": ["dim1", "dim3"],
        "filter": {"type": "selector", "dimension": "dim3", "value": "b"}})
    rows = df.collect()
    assert len(rows) == 2  # ["a","b"] and ["b","c"]


def test_mvd_groupby_explodes(fooeng):
    """groupBy on an MVD emits one row per value."""
    df = fooeng.query({
        "queryType": "groupBy", "dataSource": "foo",
        "granularity": "all", "dimensions": ["dim3"],
        "aggregations": [{"type": "count", "name": "n"}]})
    rows = {r["dim3"]: r["n"] for r in df.collect()}
    assert rows["b"] == 2      # appears in two rows' arrays
    assert rows["a"] == 1
    assert rows[""] == 1       # [""] row
    assert rows[None] == 2     # two null rows (explode_outer)


def test_mvd_filter_and_group_interaction(fooeng):
    """filter dim3='b' then group by dim3: Druid keeps ALL values of
    matching rows (famous MVD surprise: groups a,b,c appear)."""
    df = fooeng.query({
        "queryType": "groupBy", "dataSource": "foo",
        "granularity": "all", "dimensions": ["dim3"],
        "filter": {"type": "selector", "dimension": "dim3", "value": "b"},
        "aggregations": [{"type": "count", "name": "n"}]})
    rows = {r["dim3"]: r["n"] for r in df.collect()}
    assert rows == {"a": 1, "b": 2, "c": 1}


def test_mvd_filtered_dimension_spec(fooeng):
    """listFiltered dimension spec trims values before grouping."""
    df = fooeng.query({
        "queryType": "groupBy", "dataSource": "foo",
        "granularity": "all",
        "dimensions": [{"type": "listFiltered", "dimension": "dim3",
                        "outputName": "d", "values": ["b"]}],
        "filter": {"type": "selector", "dimension": "dim3", "value": "b"},
        "aggregations": [{"type": "count", "name": "n"}]})
    rows = {r["d"]: r["n"] for r in df.collect()}
    assert rows == {"b": 2}


def test_mvd_columncomparison_overlap(fooeng):
    df = fooeng.query({
        "queryType": "scan", "dataSource": "foo",
        "columns": ["dim2", "dim3"],
        "filter": {"type": "columnComparison", "dimensions": ["dim2", "dim3"]}})
    # overlap semantics: dim2 ∩ dim3 non-empty → row 1 (a∈both)
    rows = df.collect()
    assert len(rows) == 1


# ----------------------------------------------------------------- nulls

def test_selector_legacy_null_empty(fooeng):
    """legacy selector: null and '' match each other."""
    df = fooeng.query({
        "queryType": "timeseries", "dataSource": "foo",
        "granularity": "all",
        "filter": {"type": "selector", "dimension": "dim1", "value": None},
        "aggregations": [{"type": "count", "name": "n"}]})
    assert df.collect()[0]["n"] == 1  # the '' row


def test_equals_is_typed_strict(fooeng):
    """modern equals: '' matches only '', null matches nothing."""
    df = fooeng.query({
        "queryType": "timeseries", "dataSource": "foo",
        "granularity": "all",
        "filter": {"type": "equals", "column": "dim1", "matchValue": ""},
        "aggregations": [{"type": "count", "name": "n"}]})
    assert df.collect()[0]["n"] == 1


def test_null_filter(fooeng):
    df = fooeng.query({
        "queryType": "timeseries", "dataSource": "foo",
        "granularity": "all",
        "filter": {"type": "null", "column": "dim3"},
        "aggregations": [{"type": "count", "name": "n"}]})
    assert df.collect()[0]["n"] == 2


def test_in_filter_with_null(fooeng):
    df = fooeng.query({
        "queryType": "timeseries", "dataSource": "foo",
        "granularity": "all",
        "filter": {"type": "in", "dimension": "dim1", "values": [None, "abc"]},
        "aggregations": [{"type": "count", "name": "n"}]})
    assert df.collect()[0]["n"] == 1  # 'abc' only; dim1 has no true null


# ------------------------------------------------------- expression language

@pytest.mark.parametrize("expr,expected", [
    ("1 + 2 * 3", 7),
    ("2 ^ 10", 1024.0),
    ("(1 + 2) * 3", 9),
    ("-5 + 3", -2),
    ("10 % 3", 1),
    ("'a' == 'a' && 'b' != 'c'", True),
    ("1 < 2 || 0 > 1", True),
    ("!(1 == 1)", False),
    ("if(3 > 2, 'yes', 'no')", "yes"),
    ("nvl(null, 'fallback')", "fallback"),
    ("coalesce(null, null, 7)", 7),
    ("case_searched(1 == 2, 'a', 1 == 1, 'b', 'z')", "b"),
    ("case_simple(3, 1, 'one', 3, 'three', 'other')", "three"),
    ("concat('a', 'b', 'c')", "abc"),
    ("upper('abc')", "ABC"),
    ("strlen('hello')", 5),
    ("strpos('hello', 'll')", 2),
    ("substring('hello', 1, 3)", "ell"),
    ("replace('aXbX', 'X', '-')", "a-b-"),
    ("parse_long('42')", 42),
    ("abs(-3)", 3),
    ("floor(3.7)", 3),
    ("ceil(3.2)", 4),
    ("round(3.14159, 2)", 3.14),
    ("safe_divide(10, 0)", None),
    ("greatest(1, 5, 3)", 5),
    ("pow(2, 8)", 256.0),
    ("sqrt(16.0)", 4.0),
    ("bitwiseAnd(12, 10)", 8),
    ("bitwiseShiftLeft(1, 6)", 64),
    ("array_length(array(1, 2, 3))", 3),
    ("array_contains(array('a','b'), 'a')", True),
    ("array_offset(array('x','y'), 1)", "y"),
    ("array_ordinal(array('x','y'), 1)", "x"),
    ("array_to_string(array('a','b'), ',')", "a,b"),
    ("array_slice(array(1,2,3,4), 1, 3)", [2, 3]),
    ("map(x -> x * 2, array(1, 2, 3))", [2, 4, 6]),
    ("filter(x -> x > 1, array(1, 2, 3))", [2, 3]),
    ("fold((x, acc) -> x + acc, array(1, 2, 3), 0)", 6),
    ("any(x -> x > 2, array(1, 2, 3))", True),
    ("all(x -> x > 0, array(1, 2, 3))", True),
    ("regexp_extract('abc123', '[0-9]+')", "123"),
    ("regexp_like('abc', '^a')", True),
    ("contains_string('hello', 'ell')", True),
    ("like('hello', 'he%')", True),
    ("isnull(null)", True),
    ("notdistinctfrom(null, null)", True),
    ("json_value('{\\'k\\': 5}', '$.k')", "5"),
])
def test_expression_scalars(spark, expr, expected):
    expr = expr.replace("\\'", '"')  # json test quoting
    out = spark.range(1).select(compile_expr(expr).alias("x")).collect()[0]["x"]
    if isinstance(expected, float):
        assert out == pytest.approx(expected)
    else:
        assert out == expected


def test_expression_timestamp_functions(spark):
    df = spark.sql("SELECT TIMESTAMP '2024-03-15 13:47:21' AS t")
    cases = {
        "timestamp_floor(t, 'P1D')": "2024-03-15 00:00:00",
        "timestamp_floor(t, 'PT15M')": "2024-03-15 13:45:00",
        "timestamp_shift(t, 'P1D', 2)": "2024-03-17 13:47:21",
        "timestamp_format(t, 'yyyy-MM-dd')": "2024-03-15",
    }
    for expr, expected in cases.items():
        out = df.select(compile_expr(expr).alias("x")).collect()[0]["x"]
        assert str(out) == expected, expr
    assert df.select(compile_expr("timestamp_extract(t, 'HOUR')")
                     .alias("x")).collect()[0]["x"] == 13


def test_virtual_column_chain(fooeng):
    """virtual columns may reference earlier virtual columns."""
    df = fooeng.query({
        "queryType": "scan", "dataSource": "foo",
        "virtualColumns": [
            {"type": "expression", "name": "v1", "expression": "m1 * 2"},
            {"type": "expression", "name": "v2", "expression": "v1 + 1"}],
        "columns": ["m1", "v2"],
        "filter": {"type": "expression", "expression": "v2 > 10"}})
    rows = df.collect()
    assert all(r["v2"] == r["m1"] * 2 + 1 for r in rows)
    assert all(r["v2"] > 10 for r in rows)


def test_extraction_fns(fooeng):
    df = fooeng.query({
        "queryType": "groupBy", "dataSource": "foo",
        "granularity": "all",
        "dimensions": [{"type": "extraction", "dimension": "dim1",
                        "outputName": "c",
                        "extractionFn": {"type": "substring", "index": 0,
                                         "length": 1}}],
        "aggregations": [{"type": "count", "name": "n"}]})
    vals = {r["c"] for r in df.collect()}
    assert "1" in vals and "d" in vals and "a" in vals


def test_first_last_string(fooeng):
    df = fooeng.query({
        "queryType": "timeseries", "dataSource": "foo",
        "granularity": "all",
        "aggregations": [
            {"type": "stringFirst", "name": "first_d", "fieldName": "dim1"},
            {"type": "stringLast", "name": "last_d", "fieldName": "dim1"}]})
    r = df.collect()[0]
    assert r["first_d"] == "" and r["last_d"] == "abc"


@pytest.mark.parametrize("expr,expected", [
    ("ipv4_parse('192.168.1.1')", 3232235777),
    ("ipv4_stringify(3232235777)", "192.168.1.1"),
    ("ipv4_match('192.168.1.77', '192.168.0.0/16')", True),
    ("ipv4_match('10.0.0.1', '192.168.0.0/16')", False),
    ("ipv4_match(3232235777, '192.168.1.0/24')", True),
])
def test_ipv4_expressions(spark, expr, expected):
    out = spark.range(1).select(compile_expr(expr).alias("x")).collect()[0]["x"]
    assert out == expected


def test_bound_filter_alphanumeric(spark):
    """bound with alphanumeric ordering: 'f9' < 'f10' < 'f100'
    (StringComparators alphanumeric)."""
    from druid_spark import DruidSparkEngine
    e = DruidSparkEngine(spark)
    e.catalog.register_table("vv", spark.createDataFrame(
        [("f2",), ("f9",), ("f10",), ("f100",)], ["name"]))
    df = e.query({
        "queryType": "scan", "dataSource": "vv", "columns": ["name"],
        "filter": {"type": "bound", "dimension": "name",
                   "ordering": "alphanumeric", "lower": "f9",
                   "upper": "f100", "upperStrict": True}})
    assert {r["name"] for r in df.collect()} == {"f9", "f10"}


def test_unnest_datasource_mvd(fooeng):
    df = fooeng.query({
        "queryType": "groupBy",
        "dataSource": {
            "type": "unnest", "base": "foo",
            "virtualColumn": {"type": "expression", "name": "d3",
                              "expression": "dim3"}},
        "granularity": "all", "dimensions": ["d3"],
        "aggregations": [{"type": "count", "name": "n"}]})
    rows = {r["d3"]: r["n"] for r in df.collect()}
    assert rows["b"] == 2 and "" in rows


def test_extraction_filter(fooeng):
    """deprecated extraction filter: fn(dim) == value."""
    df = fooeng.query({
        "queryType": "timeseries", "dataSource": "foo",
        "granularity": "all",
        "filter": {"type": "extraction", "dimension": "dim1", "value": "A",
                   "extractionFn": {"type": "cascade", "extractionFns": [
                       {"type": "substring", "index": 0, "length": 1},
                       {"type": "upper"}]}},
        "aggregations": [{"type": "count", "name": "n"}]})
    # dim1 values: '', '10.1', '2', '1', 'def', 'abc' → first-char upper 'A' → 'abc'
    assert df.collect()[0]["n"] == 1


def test_array_quantile(spark):
    """ArrayQuantileExprMacro: rank*(n-1) index, linear interpolation,
    NaN for empty arrays."""
    import math
    from druid_spark.expr import compile_expr
    df = spark.createDataFrame(
        [([1.0, 2.0, 3.0, 4.0],), ([5.0],), ([],)], "arr: array<double>")
    rows = df.select(
        compile_expr("array_quantile(arr, 0.5)", F.col).alias("med"),
        compile_expr("array_quantile(arr, 0.75)", F.col).alias("p75"),
    ).collect()
    assert rows[0]["med"] == 2.5 and rows[0]["p75"] == 3.25
    assert rows[1]["med"] == 5.0
    assert math.isnan(rows[2]["med"])


def test_extract_dow_iso_semantics(spark):
    """DOW and ISODOW are both joda dayOfWeek (Mon=1..Sun=7) in the
    reference (TimestampExtractExprMacro.java:88-90); 2024-03-15 was a
    Friday. DECADE/CENTURY/MILLENNIUM follow the postgres formulas."""
    from druid_spark.expr import compile_expr
    df = spark.sql("SELECT TIMESTAMP '2024-03-15 13:00:00' AS t, "
                   "TIMESTAMP '2024-03-17 13:00:00' AS sun")
    r = df.select(
        compile_expr("timestamp_extract(t, 'DOW')").alias("fri"),
        compile_expr("timestamp_extract(sun, 'ISODOW')").alias("sun"),
        compile_expr("timestamp_extract(t, 'DECADE')").alias("dec"),
        compile_expr("timestamp_extract(t, 'CENTURY')").alias("cen"),
        compile_expr("timestamp_extract(t, 'MILLENNIUM')").alias("mil"),
    ).collect()[0]
    assert r["fri"] == 5 and r["sun"] == 7
    assert r["dec"] == 202 and r["cen"] == 21 and r["mil"] == 3


def test_cartesian_hofs_and_base64(spark):
    """cartesian_map / cartesian_fold (ApplyFunction.java) and
    decode_base64_utf8."""
    from druid_spark.expr import compile_expr
    r = spark.range(1).select(
        compile_expr("cartesian_map((x, y) -> concat(x, y), "
                     "array('a','b'), array('1','2'))").alias("cm"),
        compile_expr("cartesian_fold((x, y, acc) -> acc + x * y, "
                     "array(1, 2), array(10, 100), 0)").alias("cf"),
        compile_expr("decode_base64_utf8('aGVsbG8=')").alias("b64"),
    ).collect()[0]
    assert r["cm"] == ["a1", "a2", "b1", "b2"]
    assert r["cf"] == 330
    assert r["b64"] == "hello"


@pytest.mark.parametrize("expr,expected", [
    ("todegrees(3.141592653589793)", 180.0),
    ("toradians(180.0)", 3.141592653589793),
    ("copysign(3.0, -0.5)", -3.0),
    ("copysign(-3.0, 2.0)", 3.0),
    ("remainder(5.0, 3.0)", -1.0),          # IEEE: 5 - 2*3 (round half even)
    ("nextafter(1.0, 2.0)", 1.0000000000000002),
    ("ulp(1.0)", 2.220446049250313e-16),
])
def test_java_math_expressions(spark, expr, expected):
    """java.lang.Math parity scalars (Function.java CopySign/NextAfter/
    Remainder/Ulp/ToDegrees/ToRadians)."""
    out = spark.range(1).select(compile_expr(expr).alias("x")).collect()[0]["x"]
    assert out == pytest.approx(expected, rel=1e-12)


# ------------------------------------------- round 7: reference vectors
# SQL + expected rows ported VERBATIM from the reference's pinned test
# expectations over the same 6-row foo fixture
# (CalciteMultiValueStringQueryTest.java). One representation
# difference, by design: MVDs here are typed arrays, so a single
# survivor is ['b'] where the reference renders the scalar string "b" —
# group STRUCTURE (null vs value, counts) matches exactly.

def test_ref_vector_mv_filter_only_groups(fooeng):
    """CalciteMultiValueStringQueryTest.java:1155 —
    SELECT MV_FILTER_ONLY(dim3, ARRAY['b']), SUM(cnt) ... GROUP BY 1
    expects {null: 4, 'b': 2}."""
    rows = fooeng.sql(
        "SELECT MV_FILTER_ONLY(dim3, ARRAY['b']) AS f, SUM(cnt) AS s "
        "FROM foo GROUP BY 1 ORDER BY 2 DESC").collect()
    assert [(r["f"], r["s"]) for r in rows] == [(None, 4), (["b"], 2)]


def test_ref_vector_mv_length_of_filtered(fooeng):
    """CalciteMultiValueStringQueryTest.java:1314 — MV_LENGTH over the
    filter expects {null: 4, 1: 2}."""
    rows = fooeng.sql(
        "SELECT MV_LENGTH(MV_FILTER_ONLY(dim3, ARRAY['b'])) AS l, "
        "SUM(cnt) AS s FROM foo GROUP BY 1 ORDER BY 2 DESC").collect()
    assert [(r["l"], r["s"]) for r in rows] == [(None, 4), (1, 2)]


def test_ref_vector_mv_filter_coalesce(fooeng):
    """CalciteMultiValueStringQueryTest.java:1368 — COALESCE over the
    filter expects {'no b': 4, 'b': 2} (string form via
    ARRAY_TO_STRING, the typed-array spelling of the same fallback)."""
    rows = fooeng.sql(
        "SELECT COALESCE(ARRAY_TO_STRING("
        "MV_FILTER_ONLY(dim3, ARRAY['b']), ','), 'no b') AS f, "
        "SUM(cnt) AS s FROM foo GROUP BY 1 ORDER BY 2 DESC").collect()
    assert [(r["f"], r["s"]) for r in rows] == [("no b", 4), ("b", 2)]


def test_ref_vector_mv_offset_groups(fooeng):
    """CalciteMultiValueStringQueryTest.java:753 — MV_OFFSET(dim3, 1)
    expects {null: 4, 'b': 1, 'c': 1} (out-of-range single-value rows
    and null rows all collapse to the null group)."""
    rows = fooeng.sql(
        "SELECT MV_OFFSET(dim3, 1) AS o, SUM(cnt) AS s "
        "FROM foo GROUP BY 1 ORDER BY 2 DESC, 1").collect()
    assert [(r["o"], r["s"]) for r in rows] == \
        [(None, 4), ("b", 1), ("c", 1)]


def test_ref_vector_mv_offset_of_groups(fooeng):
    """CalciteMultiValueStringQueryTest.java:831 — MV_OFFSET_OF(dim3,
    'b') expects {null: 4, 0: 1, 1: 1}."""
    rows = fooeng.sql(
        "SELECT MV_OFFSET_OF(dim3, 'b') AS o, SUM(cnt) AS s "
        "FROM foo GROUP BY 1 ORDER BY 2 DESC, 1").collect()
    assert [(r["o"], r["s"]) for r in rows] == \
        [(None, 4), (0, 1), (1, 1)]


def test_ref_vector_mv_filter_join_expression(fooeng):
    """DecoupledPlanningCalciteJoinQueryTest/
    testVirtualColumnOnMVFilterJoinExpression.iq — self-join on
    MV_FILTER_ONLY(dim3, ['a']): only the ['a','b'] row survives (empty
    filter results are NULL and never join)."""
    rows = fooeng.sql(
        "SELECT foo1.dim3 AS d1, foo2.dim3 AS d2 "
        "FROM foo AS foo1 INNER JOIN foo AS foo2 "
        "ON MV_FILTER_ONLY(foo1.dim3, ARRAY['a']) = "
        "   MV_FILTER_ONLY(foo2.dim3, ARRAY['a'])").collect()
    assert [(r["d1"], r["d2"]) for r in rows] == \
        [(["a", "b"], ["a", "b"])]


@pytest.fixture(scope="module")
def numfooeng(spark, numfoo):
    e = DruidSparkEngine(spark, exact_approx=True)
    e.catalog.register_table("numfoo", numfoo)
    return e


def test_ref_vector_greatest_skips_nulls(numfooeng):
    """CalciteQueryTest.java:14917 — GREATEST ignores nulls and is NULL
    only when every argument is (Druid overrides Calcite's
    null-poisoning; Spark's greatest shares the skip-nulls contract):
    MAX(GREATEST(l1, l2)) IS NULL per dim1 expects
    {'': f, '1': t, '10.1': f, '2': f, 'abc': t, 'def': t}."""
    rows = numfooeng.sql(
        "SELECT dim1, MAX(GREATEST(l1, l2)) IS NULL AS isnull "
        "FROM numfoo GROUP BY dim1 ORDER BY dim1").collect()
    assert [(r["dim1"], r["isnull"]) for r in rows] == [
        ("", False), ("1", True), ("10.1", False), ("2", False),
        ("abc", True), ("def", True)]


def test_ref_vector_groupby_limit_pushdown_extraction(numfooeng):
    """DecoupledPlanningCalciteQueryTest/
    testGroupByLimitPushdownExtraction.iq — expects (a, a, 2),
    (a, b, 1) exactly."""
    rows = numfooeng.sql(
        "SELECT dim4, SUBSTRING(dim5, 1, 1) AS s, "
        "CAST(COUNT(*) AS BIGINT) AS n "
        "FROM numfoo WHERE dim4 = 'a' GROUP BY 1, 2 "
        "ORDER BY 2 LIMIT 2").collect()
    assert [(r["dim4"], r["s"], r["n"]) for r in rows] == [
        ("a", "a", 2), ("a", "b", 1)]


def test_ref_vector_literal_in_subquery_grouping(numfooeng):
    """DecoupledPlanningCalciteQueryTest/
    testGroupByWithLiteralInSubqueryGrouping.iq — expects
    ('dummy', 'b') and ('dummy', null) exactly."""
    rows = numfooeng.sql("""
        SELECT t1, t2 FROM (
          SELECT 'dummy' AS t1,
                 CASE WHEN dim4 = 'b' THEN dim4 ELSE NULL END AS t2
          FROM numfoo GROUP BY dim4) x
        GROUP BY t1, t2 ORDER BY t2 NULLS FIRST""").collect()
    assert [(r["t1"], r["t2"]) for r in rows] == [
        ("dummy", None), ("dummy", "b")]


def test_ref_vector_exact_count_distinct_grouped(numfooeng):
    """DecoupledPlanningCalciteQueryTest/
    testMultipleExactCountDistinctWithGroupingAndOtherAggregators-
    UsingJoin.iq — SELECT dim4(=dim2 analog with fewer groups),
    COUNT(*), COUNT(DISTINCT dim1), COUNT(DISTINCT cnt): every group
    has distinct-cnt 1 (cnt is constant 1)."""
    rows = numfooeng.sql(
        "SELECT dim4, CAST(COUNT(*) AS BIGINT) AS n, "
        "CAST(COUNT(DISTINCT dim1) AS BIGINT) AS d1, "
        "CAST(COUNT(DISTINCT cnt) AS BIGINT) AS dc "
        "FROM numfoo GROUP BY dim4 ORDER BY dim4").collect()
    assert [(r["dim4"], r["n"], r["d1"], r["dc"]) for r in rows] == [
        ("a", 3, 3, 1), ("b", 3, 3, 1)]


def test_ref_vector_nested_sum_null_groups(numfooeng):
    """CalciteQueryTest.java:15095 — SUM over an all-null group is NULL
    (SQL-compatible null handling), so `sum_l1 = 0` only fires for the
    true-zero group: expects outer_l1 = 1 for dim1='2', 0 elsewhere."""
    rows = numfooeng.sql("""
        SELECT dim1,
               SUM(CASE WHEN sum_l1 = 0 THEN 1 ELSE 0 END) AS outer_l1
        FROM (SELECT dim1, SUM(l1) AS sum_l1 FROM numfoo GROUP BY dim1)
        GROUP BY 1 ORDER BY 1""").collect()
    assert [(r["dim1"], r["outer_l1"]) for r in rows] == [
        ("", 0), ("1", 0), ("10.1", 0), ("2", 1), ("abc", 0),
        ("def", 0)]


def test_ref_vector_filtered_avg(numfooeng):
    """CalciteQueryTest.java:13860 — COUNT(dim1)/AVG(l1) under an
    equality filter hitting exactly one row."""
    rows = numfooeng.sql(
        "SELECT dim5, CAST(COUNT(dim1) AS BIGINT) AS c, AVG(l1) AS a "
        "FROM numfoo WHERE dim1 = '10.1' AND l1 = 325323 "
        "GROUP BY dim5").collect()
    assert [(r["dim5"], r["c"], r["a"]) for r in rows] == \
        [("ab", 1, 325323.0)]


def test_ref_vector_groupby_floor_cast(fooeng):
    """CalciteQueryTest.java:9150 testGroupByFloor — grouping on
    floor(CAST(dim1 AS float)): non-numeric strings cast to NULL,
    expects {null: 3, 1.0: 1, 2.0: 1, 10.0: 1}."""
    rows = fooeng.sql(
        "SELECT FLOOR(CAST(dim1 AS FLOAT)) AS f, "
        "CAST(COUNT(*) AS BIGINT) AS n "
        "FROM foo GROUP BY 1 ORDER BY 1 NULLS FIRST").collect()
    assert [(r["f"], r["n"]) for r in rows] == [
        (None, 3), (1.0, 1), (2.0, 1), (10.0, 1)]


def test_ref_vector_time_filter_string_literals(fooeng):
    """CalciteQueryTest.java:6549 — __time compared against STRING
    literals in space and 'T' ISO forms coerces to timestamps; the
    2000 year window holds 3 foo rows."""
    rows = fooeng.sql(
        "SELECT CAST(COUNT(*) AS BIGINT) AS n FROM foo "
        "WHERE __time >= '2000-01-01 00:00:00' "
        "AND __time < '2001-01-01T00:00:00'").collect()
    assert rows[0]["n"] == 3


def test_ref_vector_union_all_same_table_twice(fooeng):
    """CalciteUnionQueryTest.java:341 — UNION ALL of the same table
    under an MV filter (ARRAY_CONTAINS spelling of dim2 = 'a' OR
    dim2 = 'def' over the typed-array fixture): expects
    {('', 'a', 2.0, 2), ('1', 'a', 8.0, 2)}."""
    rows = fooeng.sql(
        "SELECT dim1, CAST(SUM(m1) AS DOUBLE) AS s, "
        "CAST(COUNT(*) AS BIGINT) AS n "
        "FROM (SELECT * FROM foo UNION ALL SELECT * FROM foo) "
        "WHERE ARRAY_CONTAINS(dim2, 'a') OR ARRAY_CONTAINS(dim2, 'def') "
        "GROUP BY 1 ORDER BY 1").collect()
    assert [(r["dim1"], r["s"], r["n"]) for r in rows] == [
        ("", 2.0, 2), ("1", 8.0, 2)]


def test_ref_vector_safe_divide_string_cast(fooeng):
    """CalciteQueryTest.java:585 testSafeDivide — Druid parses
    fractional STRINGS to longs ('1.0' → 1, Rows.objectToNumber
    long-then-double), so floor(safe_divide(cast(cast(m1 as char) as
    bigint), 2)) = 0 matches exactly the m1=1.0 row: count 1."""
    rows = fooeng.sql(
        "SELECT CAST(COUNT(*) AS BIGINT) AS c FROM foo "
        "WHERE FLOOR(SAFE_DIVIDE(CAST(CAST(m1 AS CHAR) AS BIGINT), 2))"
        " = 0").collect()
    assert rows[0]["c"] == 1


def test_ref_vector_div_truncating(fooeng):
    """CalciteQueryTest.java:585 (second shape) — DIV is truncating
    long division: div(m1, 2) over m1=1..6 gives 0,1,1,2,2,3 and
    div(cnt+2, cnt+1) is always 1."""
    rows = fooeng.sql(
        "SELECT m1, DIV(m1, 2) AS d1, DIV(cnt + 2, cnt + 1) AS d2 "
        "FROM foo ORDER BY m1").collect()
    assert [(r["m1"], r["d1"], r["d2"]) for r in rows] == [
        (1.0, 0, 1), (2.0, 1, 1), (3.0, 1, 1),
        (4.0, 2, 1), (5.0, 2, 1), (6.0, 3, 1)]


def test_ref_vector_concat_textcat(fooeng):
    """CalciteQueryTest.java:12491/12745 — CONCAT null-propagates and
    empty strings concatenate as empties ('' row gives '-_');
    TEXTCAT is 2-arg concat."""
    rows = fooeng.sql(
        "SELECT CONCAT(dim1, '-', dim1, '_', dim1) AS x, "
        "TEXTCAT(dim1, dim1) AS y FROM foo").collect()
    assert [r["x"] for r in rows] == [
        "-_", "10.1-10.1_10.1", "2-2_2", "1-1_1",
        "def-def_def", "abc-abc_abc"]
    assert [r["y"] for r in rows] == [
        "", "10.110.1", "22", "11", "defdef", "abcabc"]


def test_ref_vector_regexp_extract_distinct(fooeng):
    """CalciteQueryTest.java:8436 — REGEXP_EXTRACT of a non-matching
    (empty) string is NULL, and NULL <> 'x' filters the row OUT
    (three-valued logic): DISTINCT gives exactly {1, 2, a, d}."""
    rows = fooeng.sql(
        "SELECT DISTINCT REGEXP_EXTRACT(dim1, '^.') AS a, "
        "REGEXP_EXTRACT(dim1, '^(.)', 1) AS b FROM foo "
        "WHERE REGEXP_EXTRACT(dim1, '^(.)', 1) <> 'x' "
        "ORDER BY 1").collect()
    assert [(r["a"], r["b"]) for r in rows] == [
        ("1", "1"), ("2", "2"), ("a", "a"), ("d", "d")]


def test_ref_vector_round_nulls(numfooeng):
    """CalciteQueryTest.java:13813 — ROUND of NULL is NULL, per-row
    over numfoo.f1."""
    rows = numfooeng.sql("SELECT f1, ROUND(f1) AS r FROM numfoo").collect()
    assert [(r["f1"], r["r"]) for r in rows] == [
        (1.0, 1.0), (0.10000000149011612, 0.0), (0.0, 0.0),
        (None, None), (None, None), (None, None)]


def test_ref_vector_left_right(fooeng):
    """CalciteQueryTest.java:13352 — LEFT/RIGHT over short and empty
    strings (no padding, no errors)."""
    rows = fooeng.sql(
        "SELECT dim1, LEFT(dim1, 2) AS l, RIGHT(dim1, 2) AS r "
        "FROM foo GROUP BY dim1 ORDER BY dim1").collect()
    assert [(r["dim1"], r["l"], r["r"]) for r in rows] == [
        ("", "", ""), ("1", "1", "1"), ("10.1", "10", ".1"),
        ("2", "2", "2"), ("abc", "ab", "bc"), ("def", "de", "ef")]


def test_ref_vector_time_format_timezones(fooeng):
    """TimeFormatOperatorConversionTest — default zone is UTC; the
    3-arg form formats in the given zone ('2000-02-03T04:05:06' UTC is
    '2000-02-02 20:05:06' in America/Los_Angeles)."""
    r = fooeng.sql(
        "SELECT TIME_FORMAT(TIMESTAMP '2000-02-03 04:05:06', "
        "'yyyy-MM-dd HH:mm:ss') AS utc, "
        "TIME_FORMAT(TIMESTAMP '2000-02-03 04:05:06', "
        "'yyyy-MM-dd HH:mm:ss', 'America/Los_Angeles') AS la "
        "FROM foo LIMIT 1").collect()[0]
    assert r["utc"] == "2000-02-03 04:05:06"
    assert r["la"] == "2000-02-02 20:05:06"


def test_ref_vector_is_not_distinct_from(fooeng):
    """CalciteQueryTest.java:5988 — range-OR-IS NOT DISTINCT FROM
    filter plans and matches exactly the 'abc' row: count 1."""
    r = fooeng.sql(
        "SELECT CAST(COUNT(*) AS BIGINT) AS n FROM foo "
        "WHERE (dim1 >= 'a' AND dim1 < 'b') "
        "OR dim1 IS NOT DISTINCT FROM 'ab'").collect()[0]
    assert r["n"] == 1


def test_ref_vector_human_readable_formats(numfooeng):
    """CalciteQueryTest.java:14636 — exact reference strings, incl.
    the 2-arg precision form and NULL passthrough for null l1."""
    r = numfooeng.sql(
        "SELECT HUMAN_READABLE_BINARY_BYTE_FORMAT(45678) AS a, "
        "HUMAN_READABLE_BINARY_BYTE_FORMAT(m1 * 12345) AS b, "
        "HUMAN_READABLE_BINARY_BYTE_FORMAT(m1 * 12345, 0) AS c, "
        "HUMAN_READABLE_DECIMAL_BYTE_FORMAT(m1 * 12345) AS d, "
        "HUMAN_READABLE_DECIMAL_FORMAT(m1 * 12345) AS e, "
        "HUMAN_READABLE_BINARY_BYTE_FORMAT(l1) AS f "
        "FROM numfoo WHERE dim1 = '1' LIMIT 1").collect()[0]
    assert r["a"] == "44.61 KiB"
    assert r["b"] == "48.22 KiB"
    assert r["c"] == "48 KiB"
    assert r["d"] == "49.38 KB"
    assert r["e"] == "49.38 K"
    assert r["f"] is None
