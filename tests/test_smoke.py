"""End-to-end smoke: one query of each type compiles and runs."""

import pytest


def test_timeseries(engine):
    df = engine.query({
        "queryType": "timeseries",
        "dataSource": "events",
        "intervals": ["2024-01-01T00:00:00Z/2026-01-01T00:00:00Z"],
        "granularity": "day",
        "aggregations": [
            {"type": "count", "name": "rows"},
            {"type": "doubleSum", "name": "total", "fieldName": "value"},
        ],
    })
    rows = df.collect()
    assert len(rows) > 0
    assert {"__time", "rows", "total"} <= set(df.columns)


def test_timeseries_all_grain(engine):
    df = engine.query({
        "queryType": "timeseries",
        "dataSource": "events",
        "granularity": "all",
        "aggregations": [{"type": "count", "name": "rows"}],
    })
    assert df.collect()[0]["rows"] == 1000


def test_timeseries_all_grain_empty_result(engine):
    """ALL-granularity timeseries over an empty filtered set: Druid
    returns [] under skipEmptyBuckets=true (the engine skips the empty
    cursor) and ONE default row (count 0, null sums) without it (the
    default-result contract) — not a materialized zero row in both."""
    q = {"queryType": "timeseries", "dataSource": "events",
         "granularity": "all",
         "filter": {"type": "selector", "dimension": "event_type",
                    "value": "__no_such_type__"},
         "aggregations": [{"type": "count", "name": "n"},
                          {"type": "doubleSum", "name": "s",
                           "fieldName": "value"}]}
    assert engine.query(
        dict(q, context={"skipEmptyBuckets": True})).collect() == []
    rows = engine.query(q).collect()
    assert len(rows) == 1 and rows[0]["n"] == 0 and rows[0]["s"] is None


def test_groupby(engine):
    df = engine.query({
        "queryType": "groupBy",
        "dataSource": "events",
        "granularity": "all",
        "dimensions": ["event_type"],
        "aggregations": [{"type": "doubleSum", "name": "v", "fieldName": "value"}],
        "limitSpec": {"type": "default",
                      "columns": [{"dimension": "v", "direction": "descending"}],
                      "limit": 3},
    })
    rows = df.collect()
    assert len(rows) == 3
    assert rows[0]["v"] >= rows[1]["v"] >= rows[2]["v"]


def test_topn(engine):
    df = engine.query({
        "queryType": "topN",
        "dataSource": "events",
        "dimension": "event_type",
        "metric": "cnt",
        "threshold": 2,
        "granularity": "all",
        "aggregations": [{"type": "count", "name": "cnt"}],
    })
    rows = df.collect()
    assert len(rows) == 2
    assert rows[0]["cnt"] >= rows[1]["cnt"]


def test_scan(engine):
    df = engine.query({
        "queryType": "scan",
        "dataSource": "events",
        "columns": ["event_id", "event_type", "value"],
        "filter": {"type": "selector", "dimension": "event_type", "value": "click"},
        "limit": 10,
    })
    rows = df.collect()
    assert 0 < len(rows) <= 10
    assert all(r["event_type"] == "click" for r in rows)


def test_search(engine):
    df = engine.query({
        "queryType": "search",
        "dataSource": "events",
        "searchDimensions": ["event_type"],
        "query": {"type": "insensitive_contains", "value": "cl"},
    })
    rows = df.collect()
    assert all("cl" in r["value"].lower() for r in rows)


def test_time_boundary(engine):
    df = engine.query({"queryType": "timeBoundary", "dataSource": "events"})
    row = df.collect()[0]
    assert row["minTime"] <= row["maxTime"]


def test_segment_metadata(engine):
    df = engine.query({"queryType": "segmentMetadata", "dataSource": "events"})
    rows = {r["column"]: r for r in df.collect()}
    assert "event_type" in rows
    assert rows["event_type"]["numRows"] == 1000


def test_filters_matrix(engine):
    base = {
        "queryType": "timeseries", "dataSource": "events",
        "granularity": "all",
        "aggregations": [{"type": "count", "name": "n"}],
    }
    filters = [
        {"type": "selector", "dimension": "event_type", "value": "click"},
        {"type": "equals", "column": "event_type", "matchValue": "click"},
        {"type": "in", "dimension": "event_type", "values": ["click", "view"]},
        {"type": "bound", "dimension": "value", "lower": "10", "upper": "50",
         "ordering": "numeric"},
        {"type": "range", "column": "value", "lower": 10.0, "upper": 50.0},
        {"type": "like", "dimension": "event_type", "pattern": "cl%"},
        {"type": "regex", "dimension": "event_type", "pattern": "^cl"},
        {"type": "not", "field": {"type": "selector", "dimension": "event_type",
                                  "value": "click"}},
        {"type": "and", "fields": [
            {"type": "selector", "dimension": "event_type", "value": "click"},
            {"type": "range", "column": "value", "lower": 0.0}]},
        {"type": "expression", "expression": 'value > 10 && event_type == \'click\''},
    ]
    for f in filters:
        n = engine.query({**base, "filter": f}).collect()[0]["n"]
        assert n >= 0, f


def test_in_filter_coerces_numeric_values(engine):
    """Native in-filter values are always strings; on a numeric column
    they must coerce to the column type (InDimFilter typed matchers),
    not force the column to string — fuzzer-found regression
    (seed 1400246: double column, values ['19','36','50'] matched 0)."""
    base = {"queryType": "timeseries", "dataSource": "lineitem",
            "granularity": "all",
            "aggregations": [{"type": "count", "name": "n"}]}
    direct = engine.query({**base, "filter": {
        "type": "bound", "dimension": "l_quantity", "ordering": "numeric",
        "lower": "19", "upper": "19", "lowerStrict": False,
        "upperStrict": False}}).collect()[0]["n"]
    assert direct > 0  # the value exists in the data
    via_in = engine.query({**base, "filter": {
        "type": "in", "dimension": "l_quantity",
        "values": ["19"]}}).collect()[0]["n"]
    assert via_in == direct
    # unparseable strings can never match a numeric column
    none = engine.query({**base, "filter": {
        "type": "in", "dimension": "l_quantity",
        "values": ["not-a-number"]}}).collect()[0]["n"]
    assert none == 0


def test_join_datasource(engine):
    df = engine.query({
        "queryType": "groupBy",
        "dataSource": {
            "type": "join",
            "left": "nation",
            "right": {"type": "table", "name": "region"},
            "rightPrefix": "j0.",
            "condition": 'n_regionkey == "j0.r_regionkey"',
            "joinType": "INNER",
        },
        "granularity": "all",
        "dimensions": [{"type": "default", "dimension": "j0.r_name",
                        "outputName": "region_name"}],
        "aggregations": [{"type": "count", "name": "nations"}],
    })
    rows = {r["region_name"]: r["nations"] for r in df.collect()}
    assert sum(rows.values()) == 25


def test_union_query(engine):
    df = engine.query({
        "queryType": "union",
        "queries": [
            {"queryType": "timeseries", "dataSource": "events",
             "granularity": "all",
             "aggregations": [{"type": "count", "name": "n"}]},
            {"queryType": "timeseries", "dataSource": "orders",
             "granularity": "all",
             "aggregations": [{"type": "count", "name": "n"}]},
        ],
    })
    assert sorted(r["n"] for r in df.collect()) == [1000, 1500]


def test_window_operator(engine):
    df = engine.query({
        "queryType": "windowOperator",
        "dataSource": {"type": "query", "query": {
            "queryType": "groupBy", "dataSource": "events",
            "granularity": "all", "dimensions": ["event_type", "user_id"],
            "aggregations": [{"type": "doubleSum", "name": "v",
                              "fieldName": "value"}]}},
        "operators": [
            {"type": "naivePartition", "partitionColumns": ["event_type"]},
            {"type": "naiveSort", "columns": [{"column": "v",
                                               "direction": "DESC"}]},
            {"type": "window", "processors": [
                {"type": "rowNumber", "outputColumn": "rn"},
                {"type": "offset", "inputColumn": "v", "offset": -1,
                 "outputColumn": "prev_v"}]},
        ],
    })
    rows = df.where("rn = 1").collect()
    assert all(r["prev_v"] is None for r in rows)


def test_window_unpartitioned_guard(engine):
    """An unpartitioned window over a scan-sized input must refuse
    rather than sort everything in one task (the reference's contract:
    windowOperator inputs are grouped inner queries)."""
    import pytest
    q = {
        "queryType": "windowOperator",
        "dataSource": "events",
        "operators": [
            {"type": "naiveSort", "columns": [{"column": "value",
                                               "direction": "DESC"}]},
            {"type": "window", "processors": [
                {"type": "rowNumber", "outputColumn": "rn"}]},
        ],
    }
    engine.window_unpartitioned_max_rows = 100  # events has 1000 rows
    try:
        with pytest.raises(ValueError, match="unpartitioned window"):
            engine.query(q)
    finally:
        engine.window_unpartitioned_max_rows = None
    # with the guard lifted the same query runs
    assert engine.query(q).count() == 1000


def test_virtual_column_expression(engine):
    df = engine.query({
        "queryType": "groupBy",
        "dataSource": "events",
        "granularity": "all",
        "virtualColumns": [{"type": "expression", "name": "vtype",
                            "expression": "upper(event_type)"}],
        "dimensions": ["vtype"],
        "aggregations": [{"type": "count", "name": "n"}],
    })
    assert all(r["vtype"].isupper() for r in df.collect())


def test_lookup(engine):
    engine.catalog.register_lookup("etype", {"click": "Click!", "view": "View!"})
    df = engine.query({
        "queryType": "groupBy",
        "dataSource": "events",
        "granularity": "all",
        "virtualColumns": [{"type": "expression", "name": "pretty",
                            "expression": "lookup(event_type, 'etype')"}],
        "dimensions": ["pretty"],
        "aggregations": [{"type": "count", "name": "n"}],
    })
    vals = {r["pretty"] for r in df.collect()}
    assert "Click!" in vals


def test_druid_sql(engine):
    df = engine.sql("""
        SELECT event_type, TIME_FLOOR(__time, 'P1D') AS d,
               SUM(value) AS total
        FROM events GROUP BY event_type, TIME_FLOOR(__time, 'P1D')
        ORDER BY total DESC LIMIT 5
    """)
    assert len(df.collect()) == 5


def test_segment_metadata_to_include_and_analysis_types(engine):
    """toInclude list/none prune the profiled columns; analysisTypes
    nulls out unrequested statistics (SegmentMetadataQuery.java:49)."""
    base = {"queryType": "segmentMetadata", "dataSource": "nation"}
    lst = engine.query({**base, "toInclude": {
        "type": "list", "columns": ["n_name", "n_regionkey"]}}).collect()
    assert sorted(r["column"] for r in lst) == ["n_name", "n_regionkey"]
    assert engine.query(
        {**base, "toInclude": {"type": "none"}}).count() == 0
    card = {r["column"]: r for r in engine.query(
        {**base, "analysisTypes": ["cardinality"]}).collect()}
    assert card["n_nationkey"]["cardinality"] == 25
    assert card["n_nationkey"]["minValue"] is None
    assert card["n_nationkey"]["sizeBytes"] is None
    mm = {r["column"]: r for r in engine.query(
        {**base, "analysisTypes": ["minmax", "size"]}).collect()}
    assert mm["n_nationkey"]["cardinality"] is None
    assert mm["n_nationkey"]["minValue"] == "0"
    assert mm["n_nationkey"]["sizeBytes"] == 100
