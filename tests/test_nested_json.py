"""Nested-data (COMPLEX<json>) semantics pinned against the
reference's own expectations on its canonical 7-row `nested` fixture
(CalciteNestedDataQueryTest.java:111 RAW_ROWS): JSON_VALUE is
scalar-only, JSON_QUERY renders NESTED_DATA (string scalars quoted),
negative JSONPath indexes, path validation, JSON_PATHS/JSON_KEYS on
non-JSON input, and the NULL ON EMPTY / NULL ON ERROR options.
"""

import json

import pytest

from druid_spark import DruidSparkEngine


def _j(v):
    return None if v is None else json.dumps(v, separators=(",", ":"))


@pytest.fixture(scope="module")
def nested_eng(spark):
    """CalciteNestedDataQueryTest.java:111 RAW_ROWS, nested columns
    stored as compact JSON text (COMPLEX<json> surrogate)."""
    from pyspark.sql import types as T
    import datetime as dt

    schema = T.StructType([
        T.StructField("__time", T.TimestampType()),
        T.StructField("string", T.StringType()),
        T.StructField("string_sparse", T.StringType()),
        T.StructField("nest", T.StringType()),
        T.StructField("nester", T.StringType()),
        T.StructField("long", T.LongType()),
        T.StructField("cnt", T.LongType()),
    ])
    d1 = dt.datetime(2000, 1, 1)
    d2 = dt.datetime(2000, 1, 2)
    rows = [
        (d1, "aaa", "zzz",
         _j({"mixed": 1, "mixed2": "1", "x": 100, "y": 2.02, "z": "300"}),
         _j({"array": ["a", "b"], "n": {"x": "hello"}}), 5, 1),
        (d1, "bbb", None, None, _j("hello"), 4, 1),
        (d1, "ccc", "10",
         _j({"mixed": 1.1, "mixed2": 1, "x": 200, "y": 3.03,
             "z": "abcdef"}), None, 3, 1),
        (d1, "ddd", "yyy", None, None, 2, 1),
        (d1, "eee", None, None, None, 1, 1),
        (d2, "aaa", None,
         _j({"mixed2": 1.1, "x": 100, "y": 2.02, "z": "400"}),
         _j({"array": ["a", "b"], "n": {"x": 1}}), 5, 1),
        (d2, "ddd", None, None, _j(2), 2, 1),
    ]
    e = DruidSparkEngine(spark, exact_approx=True)
    e.catalog.register_table("nested", spark.createDataFrame(rows, schema))
    return e


def test_group_by_root_path(nested_eng):
    """testGroupByRootPath: JSON_VALUE(nester,'$') — objects group as
    NULL (scalar-only), scalars come back bare."""
    rows = nested_eng.sql("""
        SELECT JSON_VALUE(nester, '$') AS v, SUM(cnt) AS s
        FROM nested GROUP BY 1""").collect()
    got = {r["v"]: r["s"] for r in rows}
    assert got == {None: 5, "2": 1, "hello": 1}


def test_json_query_renders_nested_data(nested_eng):
    """testJsonQuery: JSON_QUERY keeps structure; string scalars render
    JSON-quoted; numbers bare."""
    rows = nested_eng.sql("""
        SELECT JSON_QUERY(nester, '$.n') AS a, JSON_QUERY(nester, '$') AS b
        FROM nested ORDER BY __time, string""").collect()
    got = [(r["a"], r["b"]) for r in rows]
    assert got == [
        ('{"x":"hello"}', '{"array":["a","b"],"n":{"x":"hello"}}'),
        (None, '"hello"'),
        (None, None),
        (None, None),
        (None, None),
        ('{"x":1}', '{"array":["a","b"],"n":{"x":1}}'),
        (None, "2"),
    ]


def test_json_path_negative_index(nested_eng):
    """testJsonPathNegativeIndex: $.array[-1] resolves to the last
    element; JSON_QUERY quotes the string scalar; JSON_KEYS of a
    non-object is null."""
    rows = nested_eng.sql("""
        SELECT JSON_VALUE(nester, '$.array[-1]') AS v,
               JSON_QUERY(nester, '$.array[-1]') AS q,
               JSON_KEYS(nester, '$.array[-1]') AS k
        FROM nested ORDER BY __time, string""").collect()
    got = [(r["v"], r["q"], r["k"]) for r in rows]
    assert got == [
        ("b", '"b"', None),
        (None, None, None),
        (None, None, None),
        (None, None, None),
        (None, None, None),
        ("b", '"b"', None),
        (None, None, None),
    ]


def test_group_by_negative_json_path_index(nested_eng):
    """testGroupByNegativeJsonPathIndex: (null,5),('b',2)."""
    rows = nested_eng.sql("""
        SELECT JSON_VALUE(nester, '$.array[-1]') AS v, SUM(cnt) AS s
        FROM nested GROUP BY 1""").collect()
    assert {r["v"]: r["s"] for r in rows} == {None: 5, "b": 2}


def test_invalid_json_path_raises(nested_eng):
    """testGroupByInvalidPath: a path not starting with '$' is
    rejected with the reference's message."""
    with pytest.raises(Exception, match="must start with"):
        nested_eng.sql("""
            SELECT JSON_VALUE(nester, '.array.[1]') AS v, SUM(cnt) AS s
            FROM nested GROUP BY 1""").collect()


def test_nested_field_vc_rejects_jq_without_flag(nested_eng):
    """NestedFieldVirtualColumn: jq-form paths need useJqSyntax."""
    with pytest.raises(Exception, match="must start with"):
        nested_eng.query({
            "queryType": "scan", "dataSource": "nested",
            "virtualColumns": [{"type": "nested-field", "name": "v0",
                                "columnName": "nester",
                                "path": ".array.[1]"}],
            "columns": ["v0"]}).collect()
    # with the flag, the jq form resolves
    rows = nested_eng.query({
        "queryType": "scan", "dataSource": "nested",
        "virtualColumns": [{"type": "nested-field", "name": "v0",
                            "columnName": "nester",
                            "path": ".array.[1]",
                            "useJqSyntax": True}],
        "columns": ["v0", "string", "__time"],
        "orderBy": [{"columnName": "__time", "order": "ascending"},
                    {"columnName": "string", "order": "ascending"}],
    }).collect()
    assert [r["v0"] for r in rows] == \
        ["b", None, None, None, None, "b", None]


def test_json_paths_non_json_input(nested_eng):
    """testJsonPathsNonJsonInput: scalar / non-JSON input reports the
    root path ['$'] (all rows, all argument shapes)."""
    rows = nested_eng.sql("""
        SELECT JSON_PATHS(string) AS a, JSON_PATHS('1234') AS b
        FROM nested""").collect()
    for r in rows:
        assert list(r["a"]) == ["$"]
        assert list(r["b"]) == ["$"]


def test_json_keys_non_json_input(nested_eng):
    """testJsonKeysNonJsonInput: keys of scalar input are null."""
    rows = nested_eng.sql("""
        SELECT JSON_KEYS(string, '$') AS a, JSON_KEYS('1234', '$') AS b
        FROM nested""").collect()
    for r in rows:
        assert r["a"] is None
        assert r["b"] is None


def test_json_value_on_empty_on_error_options(nested_eng):
    """testJsonValueUnDocumentedButSupportedOptions: the NULL ON EMPTY /
    NULL ON ERROR clauses parse and behave as the (always-null)
    default. $.z holds '300', 'abcdef', '400' → SUM = 700."""
    rows = nested_eng.sql("""
        SELECT SUM(JSON_VALUE(nest, '$.z'
                   RETURNING BIGINT NULL ON EMPTY NULL ON ERROR)) AS s
        FROM nested""").collect()
    assert rows[0]["s"] == 700


def test_json_value_scalar_only_survives_bracey_strings(nested_eng):
    """A string scalar containing braces is NOT structure."""
    rows = nested_eng.sql("""
        SELECT JSON_VALUE('{"a": "{not json"}', '$.a') AS v""").collect()
    assert rows[0]["v"] == "{not json"


def test_json_paths_array_input(nested_eng):
    """A list with no container elements is its own LEAF — the
    reference's JSON_PATHS(nester) = ['$.array', '$.n.x'] golden pins
    $.array (an ["a","b"] primitive array) as one path, not
    $.array[0..1] (CalciteNestedDataQueryTest; round 12 supersedes
    the per-index extrapolation this test previously pinned). Only
    lists holding objects/lists recurse."""
    rows = nested_eng.sql("""
        SELECT JSON_PATHS('[10, 20, 30]') AS p,
               JSON_PATHS('[{"a": 1}, [2], 3]') AS q""").collect()
    assert list(rows[0]["p"]) == ["$"]
    assert sorted(rows[0]["q"]) == ["$[0].a", "$[1]", "$[2]"]


def test_json_value_non_json_root_is_raw_scalar(nested_eng):
    """qaJsonCols funcs_and_sql_func_json_value.01.all.iq A006/A011 +
    json_query.01: a plain string is a VALUE to json_value/json_query
    (never parsed) — root path returns it raw (json_value) or quoted
    (json_query); the composition round-trips."""
    r = nested_eng.sql("""
        SELECT JSON_VALUE('ABCD', '$' RETURNING CHAR) AS a,
               JSON_QUERY('ABCD', '$') AS q,
               JSON_VALUE(JSON_QUERY('ABCD', '$'), '$'
                          RETURNING CHAR) AS rt,
               JSON_VALUE(string, '$') AS s
        FROM nested ORDER BY __time, string LIMIT 1""").collect()[0]
    assert r["a"] == "ABCD"
    assert r["q"] == '"ABCD"'
    assert r["rt"] == "ABCD"
    assert r["s"] == "aaa"


def test_json_value_timestamp_arg_is_millis(nested_eng):
    """qaJsonCols json_value.01 A001: a TIMESTAMP arg reads as its
    native-layer long — epoch millis, not a rendered datetime."""
    rows = nested_eng.sql("""
        SELECT JSON_VALUE(__time, '$') AS m,
               JSON_VALUE(__time, '$' RETURNING BIGINT) AS mb
        FROM nested ORDER BY __time LIMIT 1""").collect()
    assert rows[0]["m"] == "946684800000"
    assert rows[0]["mb"] == 946684800000
