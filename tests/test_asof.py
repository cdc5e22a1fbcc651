"""As-of join semantics: inclusive ties, tolerance, forward direction."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from druid_spark.queries.asof import asof_join


def _ts(s):
    return dt.datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def frames(spark):
    left = spark.createDataFrame(
        [(1, "k1", _ts("2024-01-01 10:00:00")),
         (2, "k1", _ts("2024-01-01 12:00:00")),
         (3, "k1", _ts("2024-01-01 09:00:00")),   # before any right row
         (4, "k2", _ts("2024-01-01 10:30:00"))],
        ["id", "k", "__time"])
    right = spark.createDataFrame(
        [("k1", _ts("2024-01-01 10:00:00"), 100.0),   # tie with id=1
         ("k1", _ts("2024-01-01 11:00:00"), 200.0),
         ("k2", _ts("2024-01-01 10:00:00"), 300.0)],
        ["k", "__time", "v"])
    return left, right


def test_asof_backward_inclusive(spark, frames):
    left, right = frames
    got = {r["id"]: r["r_v"]
           for r in asof_join(left, right, on=["k"]).collect()}
    assert got == {1: 100.0,   # equal-ts right row matches (inclusive)
                   2: 200.0,   # latest at-or-before 12:00
                   3: None,    # nothing before 09:00
                   4: 300.0}


def test_asof_forward(spark, frames):
    left, right = frames
    got = {r["id"]: r["r_v"]
           for r in asof_join(left, right, on=["k"],
                              direction="forward").collect()}
    assert got == {1: 100.0,   # inclusive at equal ts
                   2: None,    # nothing at-or-after 12:00
                   3: 100.0,   # earliest at-or-after 09:00
                   4: None}


def test_asof_tolerance(spark, frames):
    left, right = frames
    got = {r["id"]: r["r_v"]
           for r in asof_join(left, right, on=["k"],
                              tolerance_ms=30 * 60 * 1000).collect()}
    # id=2 matched 11:00 (60 min gap) -> nulled by 30-min tolerance;
    # id=4 matched 10:00 (30 min gap) -> kept (inclusive bound)
    assert got == {1: 100.0, 2: None, 3: None, 4: 300.0}


def test_asof_single_shuffle_plan(spark, frames):
    left, right = frames
    plan = asof_join(left, right, on=["k"]) \
        ._jdf.queryExecution().executedPlan().toString()
    # one hash-partitioning exchange per input branch feeding ONE
    # window sort: no join node, no cartesian anything
    assert "CartesianProduct" not in plan
    assert "Join" not in plan
    assert plan.count("Window") >= 1
