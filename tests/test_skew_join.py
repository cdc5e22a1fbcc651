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
