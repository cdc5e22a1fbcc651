"""Round-5 regression tests for the round-4 ADVICE findings:
drop_table must drop SQL temp views, Avatica prepare must not execute
DML, in-filter integral coercion above 2^53, quote-aware sys.* rewrite.
"""

import pytest
from pyspark.sql import functions as F

from druid_spark import DruidSparkEngine


@pytest.fixture(scope="module")
def eng(spark, tmp_path_factory):
    e = DruidSparkEngine(spark)
    e.catalog.register_dir("/root/testdata/sf0.001")
    e.warehouse_dir = str(tmp_path_factory.mktemp("advice_wh"))
    return e


def test_drop_table_stops_sql_resolution(eng, spark):
    """DatasourcesResource markAsUnused analog: after drop_table the
    datasource must stop resolving in SQL too, not just in the catalog
    listing (the temp view engine.sql created must go away)."""
    eng.catalog.register_table(
        "scratch_drop", spark.range(5).withColumnRenamed("id", "x"))
    assert eng.sql("SELECT COUNT(*) AS n FROM scratch_drop").first()["n"] == 5
    assert eng.catalog.drop_table("scratch_drop")
    with pytest.raises(Exception):
        eng.sql("SELECT COUNT(*) AS n FROM scratch_drop").collect()
    # non-identifier names (mangled-alias view path) drop cleanly too
    eng.catalog.register_table(
        "scratch-drop-2", spark.range(3).withColumnRenamed("id", "x"))
    assert eng.sql(
        'SELECT COUNT(*) AS n FROM `scratch-drop-2`').first()["n"] == 3
    assert eng.catalog.drop_table("scratch-drop-2")
    with pytest.raises(Exception):
        eng.sql('SELECT COUNT(*) AS n FROM `scratch-drop-2`').collect()


def test_in_filter_bigint_beyond_double_precision(eng, spark):
    """InDimFilter coerces values to the COLUMN type: 2^53+1 as a string
    must match only the exact long row, not its double-rounded
    neighbor (float('9007199254740993') == 9007199254740992.0)."""
    from druid_spark.filters import FilterCompiler
    df = spark.createDataFrame(
        [(2**53,), (2**53 + 1,), (2**53 + 2,)], ["k"])
    fc = FilterCompiler(df, lambda n: F.col(n), {})
    pred = fc.compile({"type": "in", "dimension": "k",
                       "values": ["9007199254740993"]})
    got = [r["k"] for r in df.where(pred).collect()]
    assert got == [2**53 + 1]
    # fractional value can never match an integral column
    pred2 = fc.compile({"type": "in", "dimension": "k",
                       "values": ["9007199254740992.5", str(2**53)]})
    assert [r["k"] for r in df.where(pred2).collect()] == [2**53]


def test_sys_rewrite_skips_string_literals(eng):
    """'sys.tasks' inside a string literal must survive the dotted
    system-schema rewrite verbatim."""
    assert eng.sql("SELECT 'sys.tasks' AS s").first()["s"] == "sys.tasks"
    eng.record_task("adv-t1", "query", None, "SUCCESS")
    rows = eng.sql(
        "SELECT task_id FROM sys.tasks "
        "WHERE task_id = 'adv-t1' AND task_id != 'sys.segments'").collect()
    assert [r["task_id"] for r in rows] == ["adv-t1"]


def test_avatica_prepare_does_not_execute_dml(eng):
    """Preparing an INSERT/REPLACE over JDBC must not run the ingestion
    (engine.sql executes DML immediately, so the old schema probe
    ingested at prepare time and again at execute)."""
    from druid_spark.server import _Avatica
    av = _Avatica(eng)
    cid = "prep-dml-conn"
    av.handle({"request": "openConnection", "connectionId": cid})
    code, out = av.handle({
        "request": "prepare", "connectionId": cid,
        "sql": "REPLACE INTO tgt_prep_dml OVERWRITE ALL "
               "SELECT ts AS __time, value FROM events "
               "PARTITIONED BY DAY"})
    assert code == 200
    assert "tgt_prep_dml" not in eng.catalog.tables()  # not ingested
    h = out["statement"]
    code, _ = av.handle({
        "request": "execute",
        "statementHandle": {"connectionId": cid, "id": h["id"]}})
    assert code == 200
    assert "tgt_prep_dml" in eng.catalog.tables()  # executed exactly once
    assert eng.sql(
        "SELECT COUNT(*) AS n FROM tgt_prep_dml").first()["n"] == 1000
    av.handle({"request": "closeConnection", "connectionId": cid})
