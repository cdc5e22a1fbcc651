"""Round-10 guards and semantic fixes.

- COMPLEX<json> rejections in scalar/arith slots (qaArray
  ops_funcs_* C22 batteries, ops_funcs_ops arithmetic).
- array_contains over a constructed array with column elements and a
  column needle ("Invalid expression" — qaUnnest
  array_sql_array_funcs.02 C3-C6 vs the legal C7-C14 forms).
- COALESCE/NVL BOOLEAN-ARRAY vs array-literal mixing (qaArray
  ops_funcs_scalar_funcs.42).
- empty ARRAY[] constructor ("Require at least 1 argument").
- UNNEST alias colliding with a base-table column under SELECT *
  ("is ambiguous" — qaUnnest array_sql_col_general A1_B3).
- MVD WHERE + GROUP BY explode order: Druid filters rows first
  (any-element match), then explodes ALL elements of surviving rows
  (docs/querying/multi-value-dimensions.md grouping gotcha).
- schema discovery does not store transform-only outputs
  (TransformedInputRow.java:51 getDimensions returns the source
  row's dimensions).
"""

import datetime as dt
import json

import pytest

from druid_spark import DruidSparkEngine


@pytest.fixture(scope="module")
def eng(spark):
    from pyspark.sql import types as T

    schema = T.StructType([
        T.StructField("__time", T.TimestampType()),
        T.StructField("s_int", T.LongType()),
        T.StructField("s_str", T.StringType()),
        T.StructField("a_int", T.ArrayType(T.LongType())),
        T.StructField("c_mv", T.ArrayType(T.StringType())),
        T.StructField("a_nested", T.StringType()),  # COMPLEX<json>
    ])
    t0 = dt.datetime(2023, 1, 1)
    rows = [
        (t0, 1, "x", [1, 2], ["x", "y"], json.dumps([[1], [2]])),
        (t0, 2, "y", [2, 3], ["y", "z"], json.dumps([[3], [4]])),
        (t0, 3, "z", [3, 4], None, None),
    ]
    e = DruidSparkEngine(spark, exact_approx=True)
    e.catalog.register_table(
        "t_r10", spark.createDataFrame(rows, schema),
        json_columns={"a_nested": "COMPLEX<json>", "c_mv": "MVD"})
    return e


def _rejects(eng, sql):
    with pytest.raises(Exception):
        eng.sql(sql).collect()


# ---------------------------------------------- COMPLEX<json> slots

@pytest.mark.parametrize("sql", [
    "SELECT upper(a_nested) AS col FROM t_r10",
    "SELECT lower(a_nested) AS col FROM t_r10",
    "SELECT character_length(a_nested) AS col FROM t_r10",
    "SELECT replace(a_nested, 'A', 'B') AS col FROM t_r10",
    "SELECT substring(a_nested, 1) AS col FROM t_r10",
    "SELECT substr(a_nested, 1) AS col FROM t_r10",
    "SELECT extract(DAY FROM a_nested) AS col FROM t_r10",
    "SELECT timestampadd(DAY, 1, a_nested) AS col FROM t_r10",
    "SELECT timestampdiff(DAY, CURRENT_TIMESTAMP, a_nested) AS col"
    " FROM t_r10",
    "SELECT position('ABCD' IN a_nested) AS col FROM t_r10",
    "SELECT bitwise_convert_double_to_long_bits(a_nested) AS col"
    " FROM t_r10",
    "SELECT bitwise_convert_long_bits_to_double(a_nested) AS col"
    " FROM t_r10",
    "SELECT (a_nested + a_nested) AS col FROM t_r10",
    "SELECT (a_nested - a_nested) AS col FROM t_r10",
    "SELECT (a_nested * a_nested) AS col FROM t_r10",
    "SELECT (a_nested / a_nested) AS col FROM t_r10",
    "SELECT (s_int + a_nested) AS col FROM t_r10",
])
def test_complex_json_scalar_slots_reject(eng, sql):
    _rejects(eng, sql)


def test_complex_json_legal_slots_still_work(eng):
    # JSON functions over the COMPLEX column stay legal
    rows = eng.sql(
        "SELECT json_value(a_nested, '$[0][0]') AS v FROM t_r10"
    ).collect()
    assert len(rows) == 3
    # scalar functions over plain scalars untouched
    assert eng.sql(
        "SELECT upper(s_str) AS u FROM t_r10").count() == 3


def test_alias_shadow_not_rejected(eng):
    # a derived scalar aliased to a real-array column's name must not
    # trip the array guard (ADVICE r9: alias-shadow exemption)
    rows = eng.sql(
        "SELECT strlen(a_int) AS n FROM "
        "(SELECT array_to_string(a_int, ',') AS a_int FROM t_r10)"
    ).collect()
    assert len(rows) == 3


# ------------------------------------------------- array_contains

def test_array_contains_mixed_constructor_rejects(eng):
    _rejects(eng, "SELECT array_contains(array[s_int, s_int, 3], "
                  "s_int) AS col FROM t_r10")


def test_array_contains_literal_needle_ok(eng):
    rows = eng.sql(
        "SELECT array_contains(array[s_int, s_int, 3], 1) AS col "
        "FROM t_r10").collect()
    assert [r.col for r in rows] == [True, False, False]


def test_array_contains_array_needle_ok(eng):
    rows = eng.sql(
        "SELECT array_contains(array[s_int, 3], array[s_int, 3]) "
        "AS col FROM t_r10").collect()
    assert all(r.col for r in rows)


# ------------------------------------------- coalesce/nvl mixing

def test_coalesce_boolean_array_mixing_rejects(eng):
    _rejects(eng, "SELECT coalesce(json_value(a_nested, '$[0]' "
                  "RETURNING boolean array), ARRAY[1, 0, NULL]) "
                  "AS col FROM t_r10")
    _rejects(eng, "SELECT nvl(json_value(a_nested, '$[0]' "
                  "RETURNING boolean array), ARRAY[1, 0, NULL]) "
                  "AS col FROM t_r10")


def test_coalesce_bigint_array_ok(eng):
    rows = eng.sql(
        "SELECT coalesce(json_value(a_nested, '$[0]' "
        "RETURNING bigint array), ARRAY[9]) AS col FROM t_r10"
    ).collect()
    assert [list(r.col) for r in rows] == [[1], [3], [9]]


# ------------------------------------------------- ARRAY[] empty

def test_empty_array_constructor_rejects(eng):
    _rejects(eng, "SELECT ARRAY[] AS col FROM t_r10")


def test_nonempty_array_constructor_ok(eng):
    assert eng.sql("SELECT ARRAY[1, 2] AS col FROM t_r10").count() == 3


# -------------------------------------------- unnest alias clash

def test_unnest_alias_ambiguous_rejects(eng):
    _rejects(eng, "SELECT * FROM t_r10, unnest(a_int) AS u(a_int)")


def test_unnest_fresh_alias_ok(eng):
    assert eng.sql(
        "SELECT * FROM t_r10, unnest(a_int) AS u(c)").count() == 6


# -------------------------------- MVD filter-then-explode grouping

def test_mvd_where_groupby_keeps_sibling_elements(eng):
    # Druid: WHERE c_mv = 'y' keeps BOTH rows (any-element match),
    # then explodes all their elements -> groups x, y(2), z
    rows = eng.sql(
        "SELECT c_mv, COUNT(*) AS cnt FROM t_r10 "
        "WHERE c_mv = 'y' GROUP BY c_mv ORDER BY c_mv"
    ).collect()
    assert [(r.c_mv, r.cnt) for r in rows] == [
        ("x", 1), ("y", 2), ("z", 1)]


def test_mvd_where_in_groupby_any_element(eng):
    rows = eng.sql(
        "SELECT c_mv, COUNT(*) AS cnt FROM t_r10 "
        "WHERE c_mv IN ('z') GROUP BY c_mv ORDER BY c_mv"
    ).collect()
    assert [(r.c_mv, r.cnt) for r in rows] == [("y", 1), ("z", 1)]


def test_mvd_groupby_scalar_where_pushes_down(eng):
    # non-MVD predicates stay row-level under the explode
    rows = eng.sql(
        "SELECT c_mv, COUNT(*) AS cnt FROM t_r10 "
        "WHERE s_int = 1 GROUP BY c_mv ORDER BY c_mv"
    ).collect()
    assert [(r.c_mv, r.cnt) for r in rows] == [("x", 1), ("y", 1)]


# ----------------------- round-10 tail: BIT_*/LIKE/self-join/order-by

def test_bit_agg_over_real_array_rejects(eng):
    _rejects(eng, "SELECT bit_and(a_int) AS col FROM t_r10")
    _rejects(eng, "SELECT bit_or(json_value(a_nested, '$[0]' "
                  "RETURNING bigint array)) AS col FROM t_r10 "
                  "GROUP BY json_value(a_nested, '$[0]' "
                  "RETURNING bigint array)")


def test_bit_agg_over_scalar_ok(eng):
    # BIT_AND folds from accumulator 0 in the reference (init-0 quirk)
    rows = eng.sql("SELECT bit_and(s_int) AS col FROM t_r10").collect()
    assert rows[0].col == 0


def test_like_over_declared_json_rejects(eng):
    # a_nested registered as COMPLEX<json> (DECLARED) — LIKE rejects
    _rejects(eng, "SELECT a_nested FROM t_r10 WHERE a_nested LIKE '%'")


def test_like_over_json_text_accepted(spark):
    import datetime as dt

    from pyspark.sql import types as T

    sch = T.StructType([T.StructField("__time", T.TimestampType()),
                        T.StructField("cj", T.StringType())])
    df = spark.createDataFrame(
        [(dt.datetime(2024, 1, 1), '{"a_str":"A"}')], sch)
    e = DruidSparkEngine(spark, exact_approx=True)
    # classic-schemaless discovery stores nested data as json TEXT
    e.catalog.register_table("t_jtext", df,
                             json_columns={"cj": "JSON_TEXT"})
    assert e.sql("SELECT count(*) AS c FROM t_jtext "
                 "WHERE cj LIKE '%a_str%'").collect()[0].c == 1


def test_self_join_star_zero_suffix(eng):
    # Calcite renames the right side's duplicate outputs with a 0
    # suffix; an outer bare reference binds to the LEFT side
    rows = eng.sql(
        "SELECT s_int FROM (SELECT * FROM t_r10 t1 "
        "CROSS JOIN t_r10 t2) ORDER BY s_int").collect()
    assert [r.s_int for r in rows] == sorted([1, 2, 3] * 3)
    rows = eng.sql(
        "SELECT s_int0 FROM (SELECT * FROM t_r10 t1 "
        "CROSS JOIN t_r10 t2) ORDER BY s_int0").collect()
    assert [r.s_int0 for r in rows] == sorted([1, 2, 3] * 3)


def test_suffixed_name_without_star_subquery_rejects(eng):
    # the 0-suffix only materializes through a (SELECT * ...) star
    # expansion; a direct FROM-level reference is not a column
    _rejects(eng, "SELECT a_int0 FROM t_r10, unnest(a_int) AS "
                  "u(a_int2)")


def test_order_by_repeats_grouped_expression(eng):
    rows = eng.sql(
        "SELECT upper(s_str) u, COUNT(*) AS cnt FROM t_r10 "
        "GROUP BY upper(s_str) ORDER BY upper(s_str) DESC"
    ).collect()
    assert [r.u for r in rows] == ["Z", "Y", "X"]


# ----------------------------- json functions over produced arrays

def test_json_fns_over_returning_array_chain(eng):
    # the reference re-enters nested data on a json_value(...
    # RETURNING <t> array) result (ops_funcs_json_funcs C11/C20)
    rows = eng.sql(
        "SELECT json_value(json_value(a_nested, '$[0]' "
        "RETURNING bigint array), '$[0]') AS v FROM t_r10"
    ).collect()
    assert [r.v for r in rows] == ["1", "3", None]
    # string-element sources keep the JSON-QUOTED leaf render
    rows = eng.sql(
        "SELECT json_query(json_value(a_nested, '$[0]' "
        "RETURNING varchar array), '$[0]') AS v FROM t_r10"
    ).collect()
    assert [r.v for r in rows] == ['"1"', '"3"', None]
    # keys of an array are its ordinal indices; paths see one leaf
    rows = eng.sql(
        "SELECT json_keys(json_value(a_nested, '$[0]' "
        "RETURNING bigint array), '$.') AS k, "
        "json_paths(json_value(a_nested, '$[0]' "
        "RETURNING bigint array)) AS p FROM t_r10 LIMIT 1"
    ).collect()
    assert list(rows[0].k) == ["0"] and list(rows[0].p) == ["$"]


# --------------------------- schema discovery vs transform outputs

def test_schema_discovery_drops_transform_only_columns(spark, tmp_path):
    from druid_spark.ingest.batch import TableService, run_ingestion

    src = tmp_path / "rows.json"
    src.write_text("\n".join(json.dumps(r) for r in [
        {"ts": "2023-01-01T00:00:00Z", "x": 1, "s": "a"},
        {"ts": "2023-01-01T01:00:00Z", "x": 2, "s": "b"},
    ]))
    spec = {
        "type": "index_parallel",
        "spec": {
            "ioConfig": {
                "type": "index_parallel",
                "inputSource": {"type": "local",
                                "baseDir": str(tmp_path),
                                "filter": "rows.json"},
                "inputFormat": {"type": "json"},
            },
            "dataSchema": {
                "dataSource": "t_schmdisc_r10",
                "timestampSpec": {"column": "ts", "format": "iso"},
                "dimensionsSpec": {"dimensions": None,
                                   "useSchemaDiscovery": True},
                "granularitySpec": {"segmentGranularity": "day",
                                    "rollup": False},
                "transformSpec": {"transforms": [
                    {"type": "expression", "name": "t_derived",
                     "expression": "x + 1"},
                    {"type": "expression", "name": "s",
                     "expression": "concat(s, '!')"},
                ]},
            },
        },
    }
    ts = TableService(spark, str(tmp_path / "seg"))
    run_ingestion(spark, spec, ts)
    df = ts.table("t_schmdisc_r10")
    # transform-ONLY output dropped; transform over an existing input
    # column kept (the name is in the source row's dimensions)
    assert "t_derived" not in df.columns
    assert sorted(r.s for r in df.collect()) == ["a!", "b!"]
