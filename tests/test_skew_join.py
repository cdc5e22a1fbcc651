"""context.skewHint — the join compiler's salted arm (skew.py
salted_join_pairs): identical results to the plain join, salt visible
in the physical plan, graceful fallback for non-equi/outer shapes."""

import pytest

from druid_spark import DruidSparkEngine


@pytest.fixture(scope="module")
def eng(spark):
    e = DruidSparkEngine(spark)
    e.catalog.register_dir("/root/testdata/sf0.001")
    return e


def _q(ctx, join_type="INNER",
       condition='l_orderkey == "j0.o_orderkey"'):
    return {
        "queryType": "groupBy",
        "dataSource": {
            "type": "join", "left": "lineitem",
            "right": {"type": "table", "name": "orders"},
            "rightPrefix": "j0.", "condition": condition,
            "joinType": join_type},
        "granularity": "all",
        "dimensions": [{"type": "default",
                        "dimension": "j0.o_orderpriority",
                        "outputName": "priority"}],
        "aggregations": [{"type": "doubleSum", "name": "qty",
                          "fieldName": "l_quantity"},
                         {"type": "count", "name": "n"}],
        "context": ctx}


def _rows(df):
    return sorted((r["priority"], round(r["qty"], 2), r["n"])
                  for r in df.collect())


def test_skew_hint_matches_plain_join(eng):
    plain = _rows(eng.query(_q({})))
    salted = _rows(eng.query(_q({"skewHint": True})))
    assert salted == plain
    salted8 = _rows(eng.query(_q({"skewHint": {"salts": 8}})))
    assert salted8 == plain


def test_skew_hint_left_join(eng):
    plain = _rows(eng.query(_q({}, join_type="LEFT")))
    salted = _rows(eng.query(_q({"skewHint": {"salts": 4}},
                                join_type="LEFT")))
    assert salted == plain


def test_skew_hint_plan_has_salt_keys(eng):
    plan = eng.query(_q({"skewHint": {"salts": 8}}))._jdf \
        .queryExecution().executedPlan().toString()
    assert "__salt_l" in plan and "__salt_r" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # the plain join has no salt machinery
    plain = eng.query(_q({}))._jdf.queryExecution() \
        .executedPlan().toString()
    assert "__salt_l" not in plain


def test_skew_hint_falls_back_on_non_equi(eng):
    """A non-equi condition can't be salted — hint is ignored, results
    still correct."""
    cond = 'l_orderkey == "j0.o_orderkey" && l_quantity > 10'
    plain = _rows(eng.query(_q({}, condition=cond)))
    hinted = _rows(eng.query(_q({"skewHint": True}, condition=cond)))
    assert hinted == plain
    plan = eng.query(_q({"skewHint": True}, condition=cond))._jdf \
        .queryExecution().executedPlan().toString()
    assert "__salt_l" not in plan


def test_detect_skew_uniform_stays_plain(eng):
    """detectSkew on a roughly-uniform key finds no hot key: plain
    join plan, identical results."""
    plain = _rows(eng.query(_q({})))
    detected = eng.query(_q({"detectSkew": True}))
    assert _rows(detected) == plain
    plan = eng.query(_q({"detectSkew": True}))._jdf \
        .queryExecution().executedPlan().toString()
    assert "__salt_l" not in plan


def test_detect_skew_hot_key_salts(eng, spark, tmp_path):
    """detectSkew on a 90%-one-key fact routes to the salt arm and
    matches the plain join row-for-row."""
    from pyspark.sql import functions as F

    fact = spark.range(1000).select(
        F.when(F.col("id") < 900, F.lit(1))
         .otherwise(F.col("id")).alias("k"),
        (F.col("id") % 7).cast("double").alias("v"))
    p = str(tmp_path / "skewed_fact")
    fact.write.parquet(p)
    eng.catalog.register_table("skewed_fact", p)
    q = lambda ctx: {
        "queryType": "groupBy",
        "dataSource": {
            "type": "join", "left": "skewed_fact",
            "right": {"type": "table", "name": "orders"},
            "rightPrefix": "j0.", "condition": 'k == "j0.o_orderkey"',
            "joinType": "INNER"},
        "granularity": "all",
        "dimensions": [{"type": "default",
                        "dimension": "j0.o_orderstatus",
                        "outputName": "st"}],
        "aggregations": [{"type": "doubleSum", "name": "v_sum",
                          "fieldName": "v"},
                         {"type": "count", "name": "n"}],
        "context": ctx}
    rows = lambda df: sorted((r["st"], round(r["v_sum"], 2), r["n"])
                             for r in df.collect())
    plain = rows(eng.query(q({})))
    det = eng.query(q({"detectSkew": {"threshold": 0.5, "salts": 8}}))
    assert rows(det) == plain
    plan = det._jdf.queryExecution().executedPlan().toString()
    assert "__salt_l" in plan and "__salt_r" in plan
