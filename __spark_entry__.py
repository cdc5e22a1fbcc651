"""Driver contract for the spark-graft builder (PySpark target).

`queries()` exposes one entry per implemented operator family from
SURVEY.md §2 (native query types, filters, aggregators, joins, window,
unnest, set ops) plus the training-data pipeline operators (dedup,
similarity, text analysis, multimodal). `oracle_sql()` gives the DuckDB
equivalent for every SQL-expressible query; engine-specific paths
(MinHash/SimHash/LSH/IVF/KMeans, media features, schema profiling) are
rows-only by design.

All floating aggregates are rounded identically (same decimals) on both
sides so value-hashes match despite summation-order float jitter.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_ENGINES: dict = {}


def _engine(spark: SparkSession, sf_dir: str, exact: bool = True):
    from druid_spark import DruidSparkEngine
    from druid_spark.session import harden_session

    # The driver hands us ITS session: apply the engine's required SQL
    # confs (parquet nanosAsLong, UTC tz, ANSI off) before any read —
    # the driver fixtures are TIMESTAMP(NANOS) parquet (round-1 lesson).
    harden_session(spark)
    key = (id(spark), sf_dir, exact)
    if key not in _ENGINES:
        _ENGINES[key] = DruidSparkEngine(spark, data_dir=sf_dir,
                                         exact_approx=exact)
    return _ENGINES[key]


def _round(df: DataFrame, cols: dict[str, int]) -> DataFrame:
    for c, n in cols.items():
        df = df.withColumn(c, F.round(F.col(c), n))
    return df


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: lineitem ⋈ orders revenue rollup (join + virtual column
    + groupBy + order/limit through the native-JSON compiler)."""
    return queries()["join_orders_lineitem"](spark, "/root/testdata/sf0.001")


# --------------------------------------------------------------------------
# query implementations
# --------------------------------------------------------------------------

def q_http_api(spark, sf):
    """Network entry point round-trip (server/.../server/
    QueryResource.java:74, sql/.../http/SqlResource.java:124): start the
    stdlib HTTP server in-process, POST a native timeseries JSON, parse
    the Druid-shaped {"timestamp","result"} envelope back into a
    DataFrame. Verifies the full serialization path a migrating
    reference user hits first."""
    import datetime as _dt
    import json as _json
    import urllib.request as _rq

    from druid_spark.server import DruidHttpServer

    eng = _engine(spark, sf)
    srv = DruidHttpServer(eng).start()
    try:
        req = _rq.Request(
            f"http://127.0.0.1:{srv.port}/druid/v2/",
            data=_json.dumps({
                "queryType": "timeseries", "dataSource": "events",
                "intervals": ["2024-01-01T00:00:00Z/2024-01-08T00:00:00Z"],
                "granularity": "day",
                "aggregations": [
                    {"type": "count", "name": "n"},
                    {"type": "longSum", "name": "s",
                     "fieldName": "user_id"}],
                "context": {"skipEmptyBuckets": True}}).encode(),
            headers={"Content-Type": "application/json"}, method="POST")
        with _rq.urlopen(req, timeout=120) as r:
            payload = _json.loads(r.read())
    finally:
        srv.stop()
    rows = [( _dt.datetime.strptime(e["timestamp"],
                                    "%Y-%m-%dT%H:%M:%S.%fZ"),
              int(e["result"]["n"]), int(e["result"]["s"]))
            for e in payload]
    return spark.createDataFrame(rows, "__time timestamp, n long, s long")


def q_overlord_ingest(spark, sf):
    """Overlord ingestion round-trip (indexing-service
    OverlordResource.java:108): POST an inline index_parallel task to
    /druid/indexer/v1/task, poll TaskStatusResponse to SUCCESS, then
    query the freshly-registered datasource back through POST
    /druid/v2 — the submit->ingest->queryable loop a reference
    operator drives daily. Runs on a fresh engine with a temp
    warehouse so the shared sf catalog is untouched."""
    import json as _json
    import tempfile as _tf
    import time as _time
    import urllib.request as _rq

    from druid_spark import DruidSparkEngine
    from druid_spark.server import DruidHttpServer

    eng = DruidSparkEngine(spark, data_dir=sf, exact_approx=True)
    eng.warehouse_dir = _tf.mkdtemp(prefix="overlord-entry-")
    srv = DruidHttpServer(eng).start()
    base = f"http://127.0.0.1:{srv.port}"

    def post(path, obj):
        req = _rq.Request(base + path, data=_json.dumps(obj).encode(),
                          headers={"Content-Type": "application/json"},
                          method="POST")
        with _rq.urlopen(req, timeout=120) as r:
            return _json.loads(r.read())

    data = [{"timestamp": "2024-03-01T00:05:00Z", "page": "a", "n": 1},
            {"timestamp": "2024-03-01T10:00:00Z", "page": "a", "n": 2},
            {"timestamp": "2024-03-02T00:00:00Z", "page": "b", "n": 3},
            {"timestamp": "2024-03-05T00:00:00Z", "page": "b", "n": 4}]
    try:
        tid = post("/druid/indexer/v1/task", {
            "type": "index_parallel", "spec": {
                "ioConfig": {
                    "inputSource": {
                        "type": "inline",
                        "data": "\n".join(_json.dumps(x) for x in data)},
                    "inputFormat": {"type": "json"}},
                "dataSchema": {
                    "dataSource": "ov_entry",
                    "timestampSpec": {"column": "timestamp",
                                      "format": "iso"},
                    "dimensionsSpec": {"dimensions": ["page"]},
                    "metricsSpec": [{"type": "longSum", "name": "n_sum",
                                     "fieldName": "n"}],
                    "granularitySpec": {"segmentGranularity": "day",
                                        "rollup": False}}}})["task"]
        deadline = _time.time() + 120
        state = "RUNNING"
        while _time.time() < deadline:
            with _rq.urlopen(
                    f"{base}/druid/indexer/v1/task/{tid}/status",
                    timeout=30) as r:
                state = _json.loads(r.read())["status"]["statusCode"]
            if state in ("SUCCESS", "FAILED", "CANCELED"):
                break
            _time.sleep(0.2)
        assert state == "SUCCESS", state
        rows = post("/druid/v2", {
            "queryType": "groupBy", "dataSource": "ov_entry",
            "granularity": "all", "intervals": ["2024-01-01/2025-01-01"],
            "dimensions": ["page"],
            "aggregations": [{"type": "longSum", "name": "n",
                              "fieldName": "n"}]})
    finally:
        srv.stop()
        eng.close()
    out = [(e["event"]["page"], int(e["event"]["n"])) for e in rows]
    return spark.createDataFrame(out, "page string, n long")


def q_protobuf_ingest(spark, sf):
    """Protobuf input format (extensions-core/protobuf-extensions/
    ProtobufInputFormat.java): hand-encoded wire-format messages + a
    hand-encoded FileDescriptorSet decode through the pure-Python
    descriptor-driven reader (druid_spark/ingest/protobuf.py) on the
    binaryFile→mapInPandas path. Output is a fixed literal set, so the
    oracle is a VALUES table."""
    import struct as _st
    import tempfile as _tf
    import os as _os

    from druid_spark.ingest.protobuf import (encode_varint, ld, tag,
                                             vi, read_protobuf)

    def field(name, num, ftype, label=1, type_name=None):
        out = ld(1, name.encode()) + vi(3, num) + vi(4, label) \
            + vi(5, ftype)
        if type_name:
            out += ld(6, type_name.encode())
        return ld(2, out)

    enum_kind = ld(1, b"Kind") + b"".join(
        ld(2, ld(1, n) + vi(2, v))
        for v, n in ((0, b"CLICK"), (1, b"VIEW"), (2, b"PURCHASE")))
    msg = (ld(1, b"Event") + field("name", 1, 9) + field("value", 2, 1)
           + field("kind", 3, 14, type_name=".ev.Kind"))
    fdp = (ld(1, b"ev.proto") + ld(2, b"ev") + ld(4, msg)
           + ld(5, enum_kind))
    desc = ld(1, fdp)

    d = _tf.mkdtemp(prefix="pb-entry-")
    for i in range(6):
        rec = (ld(1, f"n{i}".encode())
               + tag(2, 1) + _st.pack("<d", float(i))
               + vi(3, i % 3))
        with open(_os.path.join(d, f"e{i}.pb"), "wb") as fh:
            fh.write(rec)
    import base64 as _b64
    df = read_protobuf(spark, d, {
        "type": "protobuf",
        "protoBytesDecoder": {
            "type": "inline", "protoMessageType": "Event",
            "descriptorString": _b64.b64encode(desc).decode()}})
    return df.select("name", "kind", "value").orderBy("name")


def q_lookup_tiered(spark, sf):
    """Tier-scoped lookups (LookupCoordinatorResource manages
    {tier: {name: spec}}): a non-default tier resolves via the
    qualified 'tier/name' form in LOOKUP(); the default tier by plain
    name. Fixed literals → VALUES oracle."""
    from druid_spark import DruidSparkEngine
    eng = DruidSparkEngine(spark, data_dir=sf, exact_approx=True)
    eng.catalog.register_lookup("colors", {"g": "green", "r": "red"},
                                tier="hot")
    eng.catalog.register_lookup("plain", {"x": "y"})
    return eng.sql(
        "SELECT LOOKUP('g', 'hot/colors') AS tiered, "
        "LOOKUP('x', 'plain') AS dflt, "
        "LOOKUP('zz', 'hot/colors') AS miss")


def q_security_audit(spark, sf):
    """Security CRUD + audit e2e (BasicAuthenticatorResource /
    BasicAuthorizerResource / AuditManager analogs): an admin creates
    a user, role, permission, and assignment over HTTP; the new user's
    query flips 401→403→200; the audit trail records each mutation
    with its author. Returns the deterministic (step, code) +
    audit-action table."""
    import base64 as _b64
    import json as _json
    import urllib.error as _ue
    import urllib.request as _rq

    from druid_spark import DruidSparkEngine
    from druid_spark.security import (BasicAuthenticator,
                                      BasicRoleBasedAuthorizer,
                                      DATASOURCE, STATE, READ, WRITE)
    from druid_spark.server import DruidHttpServer

    eng = DruidSparkEngine(spark, data_dir=sf, exact_approx=True)
    auth = BasicAuthenticator({"admin": "pw"})
    authz = BasicRoleBasedAuthorizer(
        users={"admin": ["root"]},
        roles={"root": [(DATASOURCE, ".*", READ),
                        (DATASOURCE, ".*", WRITE),
                        (STATE, "STATE", READ), (STATE, "STATE", WRITE)]})
    srv = DruidHttpServer(eng, authenticator=auth,
                          authorizer=authz).start()
    base = f"http://127.0.0.1:{srv.port}"

    def req(path, obj=None, user=None, pw=None, method=None):
        headers = {"Content-Type": "application/json"}
        if user:
            headers["Authorization"] = "Basic " + _b64.b64encode(
                f"{user}:{pw}".encode()).decode()
        data = _json.dumps(obj).encode() if obj is not None else None
        r = _rq.Request(base + path, data=data, headers=headers,
                        method=method or
                        ("POST" if obj is not None else "GET"))
        try:
            with _rq.urlopen(r, timeout=60) as resp:
                return resp.status, _json.loads(resp.read() or b"null")
        except _ue.HTTPError as e:
            return e.code, None

    steps = []
    try:
        A = dict(user="admin", pw="pw")
        q = {"query": "SELECT COUNT(*) AS n FROM region"}
        steps.append(("before", req("/druid/v2/sql", q,
                                    user="carol", pw="cpw")[0]))
        AN = "/druid-ext/basic-security/authentication/db/basic"
        AZ = "/druid-ext/basic-security/authorization/db/basic"
        req(f"{AN}/users/carol", {}, **A)
        req(f"{AN}/users/carol/credentials", {"password": "cpw"}, **A)
        steps.append(("authn_only",
                      req("/druid/v2/sql", q, user="carol",
                          pw="cpw")[0]))
        req(f"{AZ}/users/carol", {}, **A)
        req(f"{AZ}/roles/readers", {}, **A)
        req(f"{AZ}/roles/readers/permissions",
            [{"resource": {"type": "DATASOURCE", "name": "region"},
              "action": "READ"}], **A)
        req(f"{AZ}/users/carol/roles/readers", {}, **A)
        steps.append(("granted",
                      req("/druid/v2/sql", q, user="carol",
                          pw="cpw")[0]))
        _, audit = req("/druid/coordinator/v1/audit?type=basic-security",
                       **A)
        actions = [(e["payload"]["action"], e["auditInfo"]["author"])
                   for e in audit]
    finally:
        srv.stop()
        eng.close()
    rows = [(s, int(c), None, None) for s, c in steps] + \
           [("audit", None, a, who) for a, who in actions]
    return spark.createDataFrame(
        rows, "step string, code long, action string, author string")


def q_avatica_jdbc(spark, sf):
    """JDBC wire-protocol round-trip (sql/.../avatica/
    DruidAvaticaJsonHandler.java / DruidMeta.java): start the server,
    speak Avatica JSON-RPC (openConnection → createStatement →
    prepareAndExecute → fetch), reassemble the paged frames into a
    DataFrame. Verifies the result-set signature + frame paging a JDBC
    thin client depends on."""
    import json as _json
    import urllib.request as _rq

    from druid_spark.server import DruidHttpServer

    eng = _engine(spark, sf)
    srv = DruidHttpServer(eng).start()
    try:
        def rpc(obj):
            req = _rq.Request(
                f"http://127.0.0.1:{srv.port}/druid/v2/sql/avatica",
                data=_json.dumps(obj).encode(),
                headers={"Content-Type": "application/json"},
                method="POST")
            with _rq.urlopen(req, timeout=120) as r:
                return _json.loads(r.read())

        rpc({"request": "openConnection", "connectionId": "drv"})
        sid = rpc({"request": "createStatement",
                   "connectionId": "drv"})["statementId"]
        rs = rpc({"request": "prepareAndExecute",
                  "connectionId": "drv", "statementId": sid,
                  "sql": "SELECT n_regionkey, "
                         "CAST(COUNT(*) AS BIGINT) AS n, "
                         "CAST(SUM(n_nationkey) AS BIGINT) AS s "
                         "FROM nation GROUP BY n_regionkey "
                         "ORDER BY n_regionkey",
                  "maxRowsInFirstFrame": 2})["results"][0]
        rows = list(rs["firstFrame"]["rows"])
        off, done = len(rows), rs["firstFrame"]["done"]
        while not done:
            fr = rpc({"request": "fetch", "connectionId": "drv",
                      "statementId": sid, "offset": off,
                      "fetchMaxRowCount": 2})["frame"]
            rows.extend(fr["rows"])
            off, done = off + len(fr["rows"]), fr["done"]
        rpc({"request": "closeStatement", "connectionId": "drv",
             "statementId": sid})
        rpc({"request": "closeConnection", "connectionId": "drv"})
    finally:
        srv.stop()
    rows = [(int(a), int(b), int(c)) for a, b, c in rows]
    return spark.createDataFrame(
        rows, "n_regionkey long, n long, s long")


def q_ts_day(spark, sf):
    return _round(_engine(spark, sf).query({
        "queryType": "timeseries", "dataSource": "events",
        "intervals": ["2024-01-01T00:00:00Z/2024-02-01T00:00:00Z"],
        "granularity": "day",
        "aggregations": [
            {"type": "count", "name": "n"},
            {"type": "doubleSum", "name": "total", "fieldName": "value"}],
        "context": {"skipEmptyBuckets": True},
    }), {"total": 3})


def q_ts_day_tz(spark, sf):
    """PeriodGranularity with a timeZone: days bucketed at
    America/Los_Angeles midnights, bucket starts reported as UTC
    instants (the engine truncates in local time via from_utc_timestamp
    and converts back, DST-correct; this January dataset sits entirely
    in PST, so the oracle states the fixed -8h shift)."""
    return _round(_engine(spark, sf).query({
        "queryType": "timeseries", "dataSource": "events",
        "intervals": ["2024-01-01T00:00:00Z/2024-02-01T00:00:00Z"],
        "granularity": {"type": "period", "period": "P1D",
                        "timeZone": "America/Los_Angeles"},
        "aggregations": [
            {"type": "count", "name": "n"},
            {"type": "doubleSum", "name": "total", "fieldName": "value"}],
        "context": {"skipEmptyBuckets": True},
    }), {"total": 3})


def q_ts_grand_total(spark, sf):
    """context.grandTotal (TimeseriesQueryQueryToolChest.java:172):
    per-day rows plus one trailing null-timestamp row carrying the
    combined aggregators."""
    return _round(_engine(spark, sf).query({
        "queryType": "timeseries", "dataSource": "events",
        "intervals": ["2024-01-01T00:00:00Z/2024-02-01T00:00:00Z"],
        "granularity": "day",
        "aggregations": [
            {"type": "count", "name": "n"},
            {"type": "doubleSum", "name": "total", "fieldName": "value"}],
        "context": {"skipEmptyBuckets": True, "grandTotal": True},
    }), {"total": 3})


def q_asof_join(spark, sf):
    """As-of join (queries/asof.py — beyond-reference operator; the
    reference's joins are equi-only): each click enriched with the
    most recent at-or-before purchase value per user. Oracle: DuckDB's
    native ASOF LEFT JOIN."""
    from druid_spark.queries.asof import asof_join
    ev = _engine(spark, sf).catalog.table("events")
    clicks = ev.where(F.col("event_type") == "click").select(
        "event_id", "user_id", "__time")
    purch = ev.where(F.col("event_type") == "purchase").select(
        "user_id", "__time", "value")
    j = asof_join(clicks, purch, on=["user_id"])
    return (j.select("event_id",
                     F.round("r_value", 3).alias("last_purchase_value"))
            .orderBy("event_id"))


def q_range_join(spark, sf):
    """Range join (queries/rangejoin.py): events.value assigned to
    price bands by interval containment — bucketed equi-join plan, no
    BroadcastNestedLoopJoin. Oracle: DuckDB inequality join."""
    from druid_spark.queries.rangejoin import range_join
    eng = _engine(spark, sf)
    ev = eng.catalog.table("events").select("event_id", "value")
    bands = spark.createDataFrame(
        [(float(i * 25), float(i * 25 + 24.999), f"band_{i}")
         for i in range(8)], ["lo", "hi", "band"])
    j = range_join(ev, bands, point="value", lo="lo", hi="hi",
                   bucket_width=25.0)
    assert "BroadcastNestedLoopJoin" not in \
        j._jdf.queryExecution().executedPlan().toString()
    return (j.groupBy(F.col("r_band").alias("band"))
            .agg(F.count(F.lit(1)).alias("n"),
                 F.round(F.sum("value"), 3).alias("v_sum"))
            .orderBy("band"))


def q_vc_nested_field(spark, sf):
    """nested-field virtual column (NestedFieldVirtualColumn.java:132):
    typed JSON path extraction feeding aggregators, grouped per
    event_type — structured pathParts form included via the k_max leg."""
    return _engine(spark, sf).query({
        "queryType": "groupBy", "dataSource": "events",
        "granularity": "all", "dimensions": ["event_type"],
        "virtualColumns": [
            {"type": "nested-field", "name": "k", "columnName": "props",
             "path": "$.k", "expectedType": "LONG"},
            {"type": "nested-field", "name": "k2", "columnName": "props",
             "pathParts": [{"type": "field", "field": "k"}],
             "expectedType": "LONG"}],
        "aggregations": [
            {"type": "longSum", "name": "k_sum", "fieldName": "k"},
            {"type": "longMax", "name": "k_max", "fieldName": "k2"}],
        "limitSpec": {"type": "default",
                      "columns": [{"dimension": "event_type"}]}})


def q_ts_zero_fill(spark, sf):
    return _round(_engine(spark, sf).query({
        "queryType": "timeseries", "dataSource": "events",
        "intervals": ["2023-12-29T00:00:00Z/2024-02-03T00:00:00Z"],
        "granularity": "day",
        "aggregations": [
            {"type": "count", "name": "n"},
            {"type": "doubleSum", "name": "total", "fieldName": "value"}],
    }), {"total": 3})


def q_ts_all_skip_empty(spark, sf):
    """ALL-granularity timeseries over an empty filtered set under
    skipEmptyBuckets: the reference's engine skips the empty cursor and
    returns NO rows (TimeseriesQueryEngine; contrast the
    default-result row when skipEmptyBuckets is absent)."""
    return _engine(spark, sf).query({
        "queryType": "timeseries", "dataSource": "events",
        "granularity": "all",
        "filter": {"type": "selector", "dimension": "event_type",
                   "value": "__no_such_event__"},
        "aggregations": [{"type": "count", "name": "n"}],
        "context": {"skipEmptyBuckets": True}})


def q_ts_hour_filtered(spark, sf):
    return _round(_engine(spark, sf).query({
        "queryType": "timeseries", "dataSource": "events",
        "intervals": ["2024-01-01T00:00:00Z/2024-02-01T00:00:00Z"],
        "granularity": "hour",
        "filter": {"type": "selector", "dimension": "event_type", "value": "click"},
        "aggregations": [
            {"type": "count", "name": "n"},
            {"type": "doubleSum", "name": "total", "fieldName": "value"}],
        "context": {"skipEmptyBuckets": True},
    }), {"total": 3})


def q_ts_six_hour(spark, sf):
    return _engine(spark, sf).query({
        "queryType": "timeseries", "dataSource": "events",
        "granularity": {"type": "duration", "duration": 21600000},
        "aggregations": [{"type": "count", "name": "n"}],
        "context": {"skipEmptyBuckets": True},
    })


def q_ts_month_lineitem(spark, sf):
    return _round(_engine(spark, sf).query({
        "queryType": "timeseries", "dataSource": "lineitem",
        "intervals": ["1995-01-01T00:00:00Z/1998-01-01T00:00:00Z"],
        "granularity": "month",
        "virtualColumns": [{"type": "expression", "name": "rev",
                            "expression": "l_extendedprice * (1 - l_discount)"}],
        "aggregations": [{"type": "doubleSum", "name": "revenue",
                          "fieldName": "rev"}],
        "context": {"skipEmptyBuckets": True},
    }), {"revenue": 2})


def q_topn_sum_value(spark, sf):
    return _round(_engine(spark, sf).query({
        "queryType": "topN", "dataSource": "events",
        "dimension": "event_type", "metric": "total", "threshold": 3,
        "granularity": "all",
        "aggregations": [{"type": "doubleSum", "name": "total",
                          "fieldName": "value"}],
    }), {"total": 2})


def q_topn_inverted(spark, sf):
    return _engine(spark, sf).query({
        "queryType": "topN", "dataSource": "events",
        "dimension": "event_type",
        "metric": {"type": "inverted", "metric": "n"},
        "threshold": 3, "granularity": "all",
        "aggregations": [{"type": "count", "name": "n"}],
    })


def q_topn_user(spark, sf):
    return _engine(spark, sf).query({
        "queryType": "topN", "dataSource": "events",
        "dimension": "user_id", "metric": "n", "threshold": 10,
        "granularity": "all",
        "aggregations": [{"type": "count", "name": "n"}],
    })


def q_gb_flag_status(spark, sf):
    return _round(_engine(spark, sf).query({
        "queryType": "groupBy", "dataSource": "lineitem",
        "granularity": "all",
        "dimensions": ["l_returnflag", "l_linestatus"],
        "aggregations": [
            {"type": "doubleSum", "name": "sum_qty", "fieldName": "l_quantity"},
            {"type": "doubleSum", "name": "sum_price",
             "fieldName": "l_extendedprice"},
            {"type": "doubleMean", "name": "avg_disc", "fieldName": "l_discount"},
            {"type": "count", "name": "n"}],
    }), {"sum_qty": 2, "sum_price": 2, "avg_disc": 4})


def q_gb_having(spark, sf):
    return _round(_engine(spark, sf).query({
        "queryType": "groupBy", "dataSource": "events",
        "granularity": "all", "dimensions": ["event_type"],
        "aggregations": [{"type": "doubleSum", "name": "total",
                          "fieldName": "value"}],
        "having": {"type": "greaterThan", "aggregation": "total",
                   "value": 100000.0},
    }), {"total": 2})


def q_gb_order_limit(spark, sf):
    return _engine(spark, sf).query({
        "queryType": "groupBy", "dataSource": "part",
        "granularity": "all", "dimensions": ["p_brand"],
        "aggregations": [{"type": "count", "name": "n"}],
        "limitSpec": {"type": "default", "limit": 10, "columns": [
            {"dimension": "n", "direction": "descending",
             "dimensionOrder": "numeric"},
            {"dimension": "p_brand", "direction": "ascending"}]},
    })


def q_gb_subtotals(spark, sf):
    return _round(_engine(spark, sf).query({
        "queryType": "groupBy", "dataSource": "lineitem",
        "granularity": "all",
        "dimensions": ["l_returnflag", "l_linestatus"],
        "aggregations": [{"type": "doubleSum", "name": "sum_qty",
                          "fieldName": "l_quantity"}],
        "subtotalsSpec": [["l_returnflag"], ["l_returnflag", "l_linestatus"], []],
    }), {"sum_qty": 2})


def q_gb_extraction(spark, sf):
    return _engine(spark, sf).query({
        "queryType": "groupBy", "dataSource": "part",
        "granularity": "all",
        "dimensions": [{"type": "extraction", "dimension": "p_type",
                        "outputName": "pt5",
                        "extractionFn": {"type": "substring", "index": 0,
                                         "length": 5}}],
        "aggregations": [{"type": "count", "name": "n"}],
    })


def q_sql_lookup_fn(spark, sf):
    """SQL LOOKUP(expr, 'name') function
    (QueryLookupOperatorConversion — registered lookup applied as a
    broadcast map literal in SQL)."""
    eng = _engine(spark, sf)
    eng.catalog.register_lookup(
        "region_names", {"0": "AFRICA", "1": "AMERICA", "2": "ASIA",
                         "3": "EUROPE", "4": "MIDDLE EAST"})
    return eng.sql("""
        SELECT LOOKUP(CAST(n_regionkey AS VARCHAR), 'region_names')
                 AS region,
               count(*) AS n
        FROM nation GROUP BY 1 ORDER BY 1""")


def _lookup_engine(spark, sf):
    """Engine with the CalciteLookupFunctionQueryTest-style fixtures: a
    PARTIAL map (keys 0-2 only, so misses produce NULL) and a second
    layer for chained lookups."""
    eng = _engine(spark, sf)
    eng.catalog.register_lookup(
        "region_part", {"0": "AFRICA", "1": "AMERICA", "2": "ASIA"})
    eng.catalog.register_lookup(
        "continent_code", {"AFRICA": "AF", "AMERICA": "AM", "ASIA": "AS"})
    return eng


# DuckDB-side rendering of the same partial lookup (misses → NULL),
# shared by the lookup-filter oracle SQL below.
_LK_PART = ("CASE CAST(n_regionkey AS VARCHAR) "
            "WHEN '0' THEN 'AFRICA' WHEN '1' THEN 'AMERICA' "
            "WHEN '2' THEN 'ASIA' END")


def q_lookup_filter_equals(spark, sf):
    """LOOKUP(dim,'lyr') = literal in WHERE — the reference reverses the
    lookup into an IN filter on the key
    (CalciteLookupFunctionQueryTest.testFilterEquals,
    ReverseLookupRule.java); here Catalyst folds the inlined map."""
    return _lookup_engine(spark, sf).sql("""
        SELECT n_name FROM nation
        WHERE LOOKUP(CAST(n_regionkey AS VARCHAR), 'region_part') = 'ASIA'
        ORDER BY n_name""")


def q_lookup_filter_in(spark, sf):
    """LOOKUP IN (...) filter (testFilterIn)."""
    return _lookup_engine(spark, sf).sql("""
        SELECT count(*) AS n FROM nation
        WHERE LOOKUP(CAST(n_regionkey AS VARCHAR), 'region_part')
              IN ('AFRICA', 'ASIA')""")


def q_lookup_filter_is_null(spark, sf):
    """Lookup miss → NULL; IS NULL matches unmapped keys
    (testFilterIsNull — partial map, keys 3/4 unmapped)."""
    return _lookup_engine(spark, sf).sql("""
        SELECT n_name FROM nation
        WHERE LOOKUP(CAST(n_regionkey AS VARCHAR), 'region_part') IS NULL
        ORDER BY n_name""")


def q_lookup_filter_not_in(spark, sf):
    """NOT IN + IS NOT NULL compose (testFilterNotInAndIsNotNull —
    Druid's NOT IN keeps NULL-safe semantics via the explicit guard)."""
    return _lookup_engine(spark, sf).sql("""
        SELECT count(*) AS n FROM nation
        WHERE LOOKUP(CAST(n_regionkey AS VARCHAR), 'region_part')
                NOT IN ('AFRICA')
          AND LOOKUP(CAST(n_regionkey AS VARCHAR), 'region_part')
                IS NOT NULL""")


def q_lookup_coalesce_missing(spark, sf):
    """COALESCE(LOOKUP(...), 'UNKNOWN') — the 'replaceMissingValueWith'
    SQL spelling (testFilterCoalesce / 3-arg LOOKUP parity)."""
    return _lookup_engine(spark, sf).sql("""
        SELECT COALESCE(LOOKUP(CAST(n_regionkey AS VARCHAR),
                               'region_part'), 'UNKNOWN') AS region,
               count(*) AS n
        FROM nation GROUP BY 1 ORDER BY 1""")


def q_lookup_of_concat(spark, sf):
    """LOOKUP over an expression key (testFilterLookupOfConcat —
    lookup applied to CONCAT of columns/literals)."""
    eng = _engine(spark, sf)
    eng.catalog.register_lookup(
        "rk_names", {"rk_0": "africa", "rk_1": "america", "rk_2": "asia",
                     "rk_3": "europe", "rk_4": "middle east"})
    return eng.sql("""
        SELECT LOOKUP('rk_' || CAST(n_regionkey AS VARCHAR), 'rk_names')
                 AS region, count(*) AS n
        FROM nation GROUP BY 1 ORDER BY 1""")


def q_lookup_chained(spark, sf):
    """LOOKUP(LOOKUP(k,'a'),'b') chains (testFilterChainedEquals)."""
    return _lookup_engine(spark, sf).sql("""
        SELECT LOOKUP(LOOKUP(CAST(n_regionkey AS VARCHAR), 'region_part'),
                      'continent_code') AS cc,
               count(*) AS n
        FROM nation GROUP BY 1 ORDER BY 1""")


def q_lookup_function_of_lookup(spark, sf):
    """Scalar function over a lookup result in a filter
    (testFilterFunctionOfLookup: LOWER(LOOKUP(...)) = ...)."""
    return _lookup_engine(spark, sf).sql("""
        SELECT n_name FROM nation
        WHERE LOWER(LOOKUP(CAST(n_regionkey AS VARCHAR), 'region_part'))
              = 'america'
        ORDER BY n_name""")


def q_gb_time_format_extraction(spark, sf):
    """timeFormat extraction fn as a groupBy dimension
    (extraction/TimeFormatExtractionFn.java — format the __time value
    while grouping; tz defaults to UTC)."""
    return _engine(spark, sf).query({
        "queryType": "groupBy", "dataSource": "events",
        "granularity": "all",
        "dimensions": [{"type": "extraction", "dimension": "__time",
                        "outputName": "ym",
                        "extractionFn": {"type": "timeFormat",
                                         "format": "yyyy-MM"}}],
        "aggregations": [{"type": "count", "name": "n"}]})


def q_gb_bucket_extraction(spark, sf):
    """bucket extraction fn (BucketExtractionFn.java — floor to buckets
    of `size` starting at `offset`) over a numeric dimension."""
    return _engine(spark, sf).query({
        "queryType": "groupBy", "dataSource": "part",
        "granularity": "all",
        "dimensions": [{"type": "extraction", "dimension": "p_size",
                        "outputName": "size_bucket",
                        "extractionFn": {"type": "bucket", "size": 10,
                                         "offset": 0}}],
        "aggregations": [{"type": "count", "name": "n"}]})


def q_gb_cascade_extraction(spark, sf):
    """cascade extraction fn (CascadeExtractionFn.java — apply a chain
    of extraction fns left-to-right): substring then upper."""
    return _engine(spark, sf).query({
        "queryType": "groupBy", "dataSource": "customer",
        "granularity": "all",
        "dimensions": [{"type": "extraction", "dimension": "c_mktsegment",
                        "outputName": "seg3",
                        "extractionFn": {"type": "cascade",
                                         "extractionFns": [
                                             {"type": "substring",
                                              "index": 0, "length": 3},
                                             {"type": "lower"}]}}],
        "aggregations": [{"type": "count", "name": "n"}]})


def q_gb_virtual_revenue(spark, sf):
    return _round(_engine(spark, sf).query({
        "queryType": "groupBy", "dataSource": "lineitem",
        "granularity": "all",
        "virtualColumns": [{"type": "expression", "name": "rev",
                            "expression": "l_extendedprice * (1 - l_discount)"}],
        "dimensions": ["l_returnflag"],
        "aggregations": [{"type": "doubleSum", "name": "revenue",
                          "fieldName": "rev"}],
    }), {"revenue": 2})


def q_gb_count_distinct(spark, sf):
    return _engine(spark, sf).query({
        "queryType": "groupBy", "dataSource": "events",
        "granularity": "all", "dimensions": ["event_type"],
        "aggregations": [{"type": "hyperUnique", "name": "users",
                          "fieldName": "user_id"}],
    })


def q_gb_cardinality(spark, sf):
    return _engine(spark, sf).query({
        "queryType": "timeseries", "dataSource": "events",
        "granularity": "all",
        "aggregations": [{"type": "cardinality", "name": "combos",
                          "fields": ["event_type", "user_id"],
                          "byRow": True}],
    })


def q_gb_first_last(spark, sf):
    return _engine(spark, sf).query({
        "queryType": "groupBy", "dataSource": "events",
        "granularity": "all", "dimensions": ["event_type"],
        "aggregations": [
            {"type": "doubleFirst", "name": "first_value", "fieldName": "value"},
            {"type": "doubleLast", "name": "last_value", "fieldName": "value"}],
    })


def q_gb_filtered_agg(spark, sf):
    return _round(_engine(spark, sf).query({
        "queryType": "groupBy", "dataSource": "events",
        "granularity": "all", "dimensions": ["event_type"],
        "aggregations": [
            {"type": "count", "name": "n"},
            {"type": "filtered", "name": "big_total",
             "filter": {"type": "range", "column": "value", "lower": 50.0},
             "aggregator": {"type": "doubleSum", "name": "big_total",
                            "fieldName": "value"}}],
    }), {"big_total": 2})


def q_gb_postagg(spark, sf):
    return _round(_engine(spark, sf).query({
        "queryType": "groupBy", "dataSource": "lineitem",
        "granularity": "all", "dimensions": ["l_returnflag"],
        "aggregations": [
            {"type": "doubleSum", "name": "sum_price",
             "fieldName": "l_extendedprice"},
            {"type": "doubleSum", "name": "sum_qty", "fieldName": "l_quantity"}],
        "postAggregations": [
            {"type": "arithmetic", "name": "price_per_qty", "fn": "/",
             "fields": [{"type": "fieldAccess", "fieldName": "sum_price"},
                        {"type": "fieldAccess", "fieldName": "sum_qty"}]}],
    }), {"sum_price": 2, "sum_qty": 2, "price_per_qty": 4})


def q_json_groupby(spark, sf):
    return _engine(spark, sf).query({
        "queryType": "groupBy", "dataSource": "events",
        "granularity": "all",
        "virtualColumns": [{"type": "expression", "name": "k",
                            "expression": "json_value(props, '$.k')"}],
        "dimensions": ["k"],
        "aggregations": [{"type": "count", "name": "n"}],
        "limitSpec": {"type": "default", "limit": 10, "columns": [
            {"dimension": "n", "direction": "descending",
             "dimensionOrder": "numeric"},
            {"dimension": "k", "direction": "ascending"}]},
    })


def q_scan_orders(spark, sf):
    return _engine(spark, sf).query({
        "queryType": "scan", "dataSource": "orders",
        "columns": ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"],
        "filter": {"type": "bound", "dimension": "o_totalprice",
                   "lower": "100000", "ordering": "numeric"},
        "orderBy": [{"columnName": "o_orderkey", "order": "ascending"}],
        "offset": 10, "limit": 100,
    })


def q_scan_filters_matrix(spark, sf):
    """in + like + regex + interval + expression filters combined."""
    return _engine(spark, sf).query({
        "queryType": "scan", "dataSource": "lineitem",
        "columns": ["l_orderkey", "l_linenumber", "l_returnflag", "l_quantity"],
        "intervals": ["1996-01-01T00:00:00Z/1997-01-01T00:00:00Z"],
        "filter": {"type": "and", "fields": [
            {"type": "in", "dimension": "l_returnflag", "values": ["N", "A"]},
            {"type": "like", "dimension": "l_linestatus", "pattern": "%"},
            {"type": "regex", "dimension": "l_returnflag", "pattern": "^[NA]$"},
            {"type": "expression", "expression": "l_quantity >= 30.0"}]},
        "orderBy": [{"columnName": "l_orderkey", "order": "ascending"},
                    {"columnName": "l_linenumber", "order": "ascending"}],
        "limit": 200,
    })


def q_search_event_type(spark, sf):
    return _engine(spark, sf).query({
        "queryType": "search", "dataSource": "events",
        "searchDimensions": ["event_type"],
        "query": {"type": "insensitive_contains", "value": "i"},
    })


def q_time_boundary(spark, sf):
    return _engine(spark, sf).query({
        "queryType": "timeBoundary", "dataSource": "events"})


def q_dsmeta(spark, sf):
    return _engine(spark, sf).query({
        "queryType": "dataSourceMetadata", "dataSource": "events"})


def q_time_boundary_max_only(spark, sf):
    """timeBoundary with bound=maxTime + a filter
    (TimeBoundaryQuery.java:47 MAX_TIME bound — only maxTime returned,
    computed over the filtered rows)."""
    return _engine(spark, sf).query({
        "queryType": "timeBoundary", "dataSource": "events",
        "bound": "maxTime",
        "filter": {"type": "selector", "dimension": "event_type",
                   "value": "purchase"}})


def q_search_regex_spec(spark, sf):
    """search with the regex SearchQuerySpec
    (search/RegexSearchQuerySpec.java — pattern match, not contains)."""
    return _engine(spark, sf).query({
        "queryType": "search", "dataSource": "part",
        "searchDimensions": ["p_brand"],
        "query": {"type": "regex", "pattern": "Brand#[12]$"},
        "granularity": "all"})


def q_ts_postagg_ratio(spark, sf):
    """timeseries with an arithmetic post-aggregator over two sums
    (TimeseriesQueryRunnerTest addRowsIndexConstant-style ratio)."""
    return _round(_engine(spark, sf).query({
        "queryType": "timeseries", "dataSource": "events",
        "intervals": ["2024-01-01T00:00:00Z/2024-01-08T00:00:00Z"],
        "granularity": "day",
        "aggregations": [
            {"type": "count", "name": "n"},
            {"type": "doubleSum", "name": "total", "fieldName": "value"}],
        "postAggregations": [
            {"type": "arithmetic", "name": "avg_value", "fn": "/",
             "fields": [{"type": "fieldAccess", "fieldName": "total"},
                        {"type": "fieldAccess", "fieldName": "n"}]}],
        "context": {"skipEmptyBuckets": True},
    }), {"total": 2, "avg_value": 4})


def q_topn_postagg_metric(spark, sf):
    """topN ordered BY a post-aggregator metric
    (TopNQueryQueryToolChest — numeric metric naming a postAgg)."""
    return _round(_engine(spark, sf).query({
        "queryType": "topN", "dataSource": "events",
        "dimension": "event_type", "metric": "avg_value",
        "threshold": 3, "granularity": "all",
        "aggregations": [
            {"type": "count", "name": "n"},
            {"type": "doubleSum", "name": "total", "fieldName": "value"}],
        "postAggregations": [
            {"type": "arithmetic", "name": "avg_value", "fn": "/",
             "fields": [{"type": "fieldAccess", "fieldName": "total"},
                        {"type": "fieldAccess", "fieldName": "n"}]}],
    }), {"total": 2, "avg_value": 4})


def q_scan_virtual_column(spark, sf):
    """scan projecting a virtual column (ScanQuery.virtualColumns —
    expression evaluated during the scan, pruned to the two source
    columns)."""
    return _engine(spark, sf).query({
        "queryType": "scan", "dataSource": "lineitem",
        "virtualColumns": [{"type": "expression", "name": "rev",
                            "expression":
                            "l_extendedprice * (1 - l_discount)"}],
        "columns": ["l_orderkey", "l_linenumber", "rev"],
        "orderBy": [{"columnName": "l_orderkey", "order": "ascending"},
                    {"columnName": "l_linenumber", "order": "ascending"}],
        "limit": 10})


def q_sql_explain(spark, sf):
    """EXPLAIN PLAN FOR (DruidPlanner explain path): one row of
    PLAN/RESOURCES/ATTRIBUTES. Rows-only — the PLAN text is engine-
    specific by definition."""
    return _engine(spark, sf).sql("""
        EXPLAIN PLAN FOR
        SELECT o_orderstatus, count(*) AS n
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY 1""")


def q_join_region_nation(spark, sf):
    return _engine(spark, sf).query({
        "queryType": "groupBy",
        "dataSource": {
            "type": "join", "left": "nation",
            "right": {"type": "table", "name": "region"},
            "rightPrefix": "j0.",
            "condition": 'n_regionkey == "j0.r_regionkey"',
            "joinType": "INNER"},
        "granularity": "all",
        "dimensions": [{"type": "default", "dimension": "j0.r_name",
                        "outputName": "region_name"}],
        "aggregations": [{"type": "count", "name": "nations"}],
    })


def q_join_orders_lineitem(spark, sf):
    return _round(_engine(spark, sf).query({
        "queryType": "groupBy",
        "dataSource": {
            "type": "join", "left": "lineitem",
            "right": {"type": "table", "name": "orders"},
            "rightPrefix": "j0.",
            "condition": 'l_orderkey == "j0.o_orderkey"',
            "joinType": "INNER"},
        "granularity": "all",
        "intervals": ["1996-01-01T00:00:00Z/1997-01-01T00:00:00Z"],
        "virtualColumns": [{"type": "expression", "name": "rev",
                            "expression": "l_extendedprice * (1 - l_discount)"}],
        "dimensions": [{"type": "default", "dimension": "j0.o_orderpriority",
                        "outputName": "priority"}],
        "aggregations": [{"type": "doubleSum", "name": "revenue",
                          "fieldName": "rev"},
                         {"type": "count", "name": "n"}],
    }), {"revenue": 2})


def q_join_semi(spark, sf):
    return _engine(spark, sf).query({
        "queryType": "groupBy",
        "dataSource": {
            "type": "join", "left": "orders",
            "right": {"type": "query", "query": {
                "queryType": "groupBy", "dataSource": "lineitem",
                "granularity": "all", "dimensions": ["l_orderkey"],
                "filter": {"type": "range", "column": "l_quantity",
                           "lower": 49.0},
                "aggregations": []}},
            "rightPrefix": "j0.",
            "condition": 'o_orderkey == "j0.l_orderkey"',
            "joinType": "INNER"},
        "granularity": "all",
        "dimensions": ["o_orderstatus"],
        "aggregations": [{"type": "count", "name": "n"}],
    })


def q_join_customer_nation(spark, sf):
    return _engine(spark, sf).query({
        "queryType": "groupBy",
        "dataSource": {
            "type": "join", "left": "customer",
            "right": {"type": "query", "query": {
                "queryType": "scan", "dataSource": "nation",
                "columns": ["n_nationkey", "n_name"]}},
            "rightPrefix": "j0.",
            "condition": 'c_nationkey == "j0.n_nationkey"',
            "joinType": "INNER"},
        "granularity": "all",
        "dimensions": [{"type": "default", "dimension": "j0.n_name",
                        "outputName": "nation"}],
        "aggregations": [{"type": "count", "name": "customers"},
                         {"type": "doubleSum", "name": "acctbal",
                          "fieldName": "c_acctbal"}],
    }).withColumn("acctbal", F.round(F.col("acctbal"), 2))


def q_union_counts(spark, sf):
    return _engine(spark, sf).query({
        "queryType": "union",
        "queries": [
            {"queryType": "timeseries", "dataSource": "events",
             "granularity": "all",
             "aggregations": [{"type": "count", "name": "n"}]},
            {"queryType": "timeseries", "dataSource": "orders",
             "granularity": "all",
             "aggregations": [{"type": "count", "name": "n"}]}],
    })


def q_unnest_tokens(spark, sf):
    return _engine(spark, sf).query({
        "queryType": "groupBy",
        "dataSource": {
            "type": "unnest", "base": "documents",
            "virtualColumn": {"type": "expression", "name": "token",
                              "expression": "string_to_array(text, ' ')"}},
        "granularity": "all",
        "filter": {"type": "expression", "expression": "strlen(token) >= 6"},
        "dimensions": ["token"],
        "aggregations": [{"type": "count", "name": "n"}],
        "limitSpec": {"type": "default", "limit": 20, "columns": [
            {"dimension": "n", "direction": "descending",
             "dimensionOrder": "numeric"},
            {"dimension": "token", "direction": "ascending"}]},
    })


def q_window_rank(spark, sf):
    out = _engine(spark, sf).query({
        "queryType": "windowOperator",
        "dataSource": {"type": "query", "query": {
            "queryType": "groupBy", "dataSource": "events",
            "granularity": "all", "dimensions": ["event_type", "user_id"],
            "aggregations": [{"type": "doubleSum", "name": "v",
                              "fieldName": "value"}],
            "postAggregations": [{"type": "expression", "name": "v",
                                  "expression": "round(v, 3)"}]}},
        "operators": [
            {"type": "naivePartition", "partitionColumns": ["event_type"]},
            {"type": "naiveSort", "columns": [
                {"column": "v", "direction": "DESC"},
                {"column": "user_id", "direction": "ASC"}]},
            {"type": "window", "processors": [
                {"type": "rowNumber", "outputColumn": "rn"}]}],
    })
    return out.where(F.col("rn") <= 3)


def q_window_running_sum(spark, sf):
    return _round(_engine(spark, sf).query({
        "queryType": "windowOperator",
        "dataSource": {"type": "query", "query": {
            "queryType": "groupBy", "dataSource": "events",
            "granularity": "day",
            "dimensions": ["event_type"],
            "aggregations": [{"type": "doubleSum", "name": "v",
                              "fieldName": "value"}],
            "postAggregations": [{"type": "expression", "name": "v",
                                  "expression": "round(v, 3)"}]}},
        "operators": [
            {"type": "naivePartition", "partitionColumns": ["event_type"]},
            {"type": "naiveSort", "columns": [{"column": "__time",
                                               "direction": "ASC"}]},
            {"type": "window", "processors": [
                {"type": "framedAgg",
                 "frame": {"type": "rows", "upperOffset": 0},
                 "aggregations": [{"type": "doubleSum", "name": "run_total",
                                   "fieldName": "v"}]},
                {"type": "offset", "inputColumn": "v", "offset": -1,
                 "outputColumn": "prev_v"}]}],
    }), {"run_total": 3})


def q_window_lead_lag_rank(spark, sf):
    return _engine(spark, sf).query({
        "queryType": "windowOperator",
        "dataSource": {"type": "query", "query": {
            "queryType": "groupBy", "dataSource": "orders",
            "granularity": "all", "dimensions": ["o_orderpriority",
                                                 "o_orderstatus"],
            "aggregations": [{"type": "count", "name": "n"}]}},
        "operators": [
            {"type": "naivePartition", "partitionColumns": ["o_orderpriority"]},
            {"type": "naiveSort", "columns": [
                {"column": "n", "direction": "DESC"},
                {"column": "o_orderstatus", "direction": "ASC"}]},
            {"type": "window", "processors": [
                {"type": "rank", "outputColumn": "rnk"},
                {"type": "denseRank", "outputColumn": "drnk"},
                {"type": "offset", "inputColumn": "n", "offset": 1,
                 "outputColumn": "next_n"}]}],
    })


# ---------------------------------------------------------------- datapipe

def q_dedup_exact(spark, sf):
    from druid_spark.datapipe.dedup import exact_dedup
    docs = _engine(spark, sf).catalog.table("documents")
    return exact_dedup(docs)


def q_dedup_jaccard(spark, sf):
    from druid_spark.datapipe.dedup import ngram_jaccard_pairs
    docs = _engine(spark, sf).catalog.table("documents")
    return ngram_jaccard_pairs(docs, threshold=0.8)


def q_repetition_profile(spark, sf):
    """Gopher-style repetition signals (dup-word ratio, top-bigram
    fraction) per document — the repetition-filter inputs of an LLM
    data pipeline."""
    from druid_spark.datapipe.textstats import repetition_profile
    docs = _engine(spark, sf).catalog.table("documents")
    return (repetition_profile(docs)
            .withColumn("n_tokens", F.col("n_tokens").cast("long"))
            .orderBy("doc_id"))


def q_pii_redact(spark, sf):
    """PII redaction (datapipe/redact.py): scrub emails, IPs, SSNs,
    phones, and card-shaped digit runs from corpus text — chained
    JVM-side regexp_replace, no Python in the data path. The synthetic
    documents contain no PII, so both sides compose identical
    deterministic PII-bearing text from doc_id first; the oracle then
    verifies match counts AND the redacted output byte-for-byte (via
    total length)."""
    from druid_spark.datapipe.redact import pii_counts, redact_pii
    eng = _engine(spark, sf)
    d = eng.catalog.table("documents")
    i = F.col("doc_id").cast("long")
    aug = F.concat(
        F.substring(F.col("text"), 1, 40),
        F.lit(" contact u"), i.cast("string"),
        F.lit("@example.com ip 10.0."), (i % 256).cast("string"),
        F.lit("."), ((i * 7) % 256).cast("string"),
        F.lit(" ssn 123-45-"), F.lpad((i % 10000).cast("string"), 4, "0"),
        F.lit(" tel 555-123-4567 card 4111111111111111"))
    cnts = pii_counts(aug)
    return (d.select(
                F.col("lang"), redact_pii(aug).alias("red"),
                *[c.alias(k) for k, c in cnts.items()])
            .groupBy("lang")
            .agg(F.count("*").alias("docs"),
                 F.sum("email").alias("emails"),
                 F.sum("ipv4").alias("ips"),
                 F.sum("ssn").alias("ssns"),
                 F.sum("phone").alias("phones"),
                 F.sum("card").alias("cards"),
                 F.sum(F.length("red")).alias("red_len"))
            .orderBy("lang"))


def q_pipeline_quality_dedup(spark, sf):
    """End-to-end cleaning pipeline composition: text profiling →
    quality gate → exact dedup by normalized fingerprint — one
    declarative DAG (profile exprs fuse into the scan; dedup is a
    single map-side-combined distinct), per-lang retention report."""
    from druid_spark.datapipe import textstats
    docs = _engine(spark, sf).catalog.table("documents")
    kept = textstats.staged_features(docs).where(
        (F.col("quality") >= 0.5) & (F.col("n_tokens") >= 10))
    return (kept.groupBy("lang")
            .agg(F.count(F.lit(1)).alias("n_kept"),
                 F.count_distinct("fingerprint").alias("n_uniq"))
            .orderBy("lang"))


def q_url_extract(spark, sf):
    """URL parsing / normalization ops (datapipe/urls.py) for
    web-corpus pipelines. The synthetic documents carry no URLs, so
    both sides compose deterministic URLs from doc_id first; the
    oracle verifies host/registrable-domain/path extraction and the
    normalized-URL dedup count."""
    from druid_spark.datapipe import urls
    docs = _engine(spark, sf).catalog.table("documents")
    i = F.col("doc_id").cast("long")
    url = F.concat(
        F.lit("HTTPS://Sub"), (i % 5).cast("string"),
        F.lit(".Example"), (i % 3).cast("string"),
        F.lit(".com:443/p/"), (i % 20).cast("string"),
        F.lit("/#frag"))
    u = docs.select(
        urls.url_host(url).alias("host"),
        urls.registrable_domain(url).alias("domain"),
        urls.url_path(url).alias("path"),
        urls.normalize_url(url).alias("norm"))
    return (u.groupBy("domain")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.count_distinct("host").alias("hosts"),
                 F.count_distinct("path").alias("paths"),
                 F.count_distinct("norm").alias("uniq_urls"))
            .orderBy("domain"))


def q_boilerplate_removal(spark, sf):
    """Corpus-level boilerplate-line removal (CCNet-style). The
    synthetic corpus is single-line so nothing crosses the document-
    frequency threshold here (identity output — the oracle still
    checks the whole pipeline); tests/test_datapipe.py exercises real
    multi-line removal."""
    from druid_spark.datapipe.dedup import remove_boilerplate_lines
    docs = _engine(spark, sf).catalog.table("documents")
    return (remove_boilerplate_lines(docs, min_doc_frac=0.25)
            .select("doc_id", F.md5("clean_text").alias("clean_md5"))
            .orderBy("doc_id"))


def q_sample_stratified(spark, sf):
    """Deterministic stratified sampling: first 3 docs per (lang,
    source) stratum by doc_id — reproducible via window row_number, no
    driver-side sampling state."""
    from druid_spark.datapipe.sample import stratified_take
    docs = _engine(spark, sf).catalog.table("documents") \
        .withColumn("stratum", F.concat_ws("|", "lang", "source"))
    return (stratified_take(docs, "stratum", 3, "doc_id")
            .select("stratum", "doc_id").orderBy("stratum", "doc_id"))


def q_temperature_rates(spark, sf):
    """Temperature-balanced language mixing (q_l ∝ p_l^alpha): exact
    closed-form per-language sampling rates — tiny agg + window math,
    broadcast-joinable back onto the corpus."""
    from druid_spark.datapipe.sample import temperature_rates
    docs = _engine(spark, sf).catalog.table("documents")
    return temperature_rates(docs, "lang", alpha=0.3).orderBy("lang")


def q_dedup_canonicalize(spark, sf):
    """Canonical-doc selection per duplicate cluster (round 7,
    datapipe/dedup.canonicalize): cluster = fingerprint of normalized
    text, best doc = longest (n_chars), doc_id tiebreak. Exact oracle:
    the same window rank in DuckDB."""
    from druid_spark.datapipe.dedup import canonicalize, normalize
    docs = _engine(spark, sf).catalog.table("documents")
    keyed = docs.withColumn("fp", F.md5(normalize(F.col("text"))))
    kept = canonicalize(keyed, "fp", "n_chars")
    return (kept.select("doc_id", "n_chars")
            .orderBy("doc_id"))


def q_shard_pack(spark, sf):
    """Token-budgeted shard packing (round 7): contiguous shards of
    ~2000 tokens in doc_id order via a DISTRIBUTED prefix sum —
    range-repartition + per-partition cumsum + broadcast offsets, never
    a single-partition global window (datapipe/pack.py; plan gate
    shard_pack_distributed pins the absence of Exchange
    SinglePartition). Exact oracle: window cumsum over the same
    token counts."""
    from druid_spark.datapipe import textstats
    from druid_spark.datapipe.pack import pack_shards
    docs = _engine(spark, sf).catalog.table("documents")
    d = docs.select("doc_id",
                    textstats.token_count(F.col("text")).alias("ntok"))
    out = pack_shards(d, "ntok", budget=2000, order_col="doc_id")
    return out.select("doc_id", F.col("ntok").cast("long").alias("ntok"),
                      "shard_id").orderBy("doc_id")


def q_split_assign(spark, sf):
    """Leakage-safe train/val/test assignment: split chosen by hashing
    the doc's dedup-cluster id (connected components over exact-dup
    fingerprints), so duplicates always share a split. The bucket is
    the first 60 bits of md5(seed|key) (r13) — portable, so the
    DuckDB oracle pins the assignment value-for-value;
    tests/test_datapipe.py additionally asserts the
    one-split-per-cluster invariant."""
    from druid_spark.datapipe.dedup import normalize
    from druid_spark.datapipe.sample import assign_splits
    docs = _engine(spark, sf).catalog.table("documents")
    keyed = docs.withColumn("cluster_key", F.md5(normalize(F.col("text"))))
    out = assign_splits(keyed, "cluster_key")
    return (out.groupBy("split")
            .agg(F.count(F.lit(1)).alias("docs"),
                 F.count_distinct("cluster_key").alias("clusters"))
            .orderBy("split"))


def q_contamination(spark, sf):
    """Benchmark decontamination: per eval doc (doc_id % 17 == 0), the
    fraction of its word 8-grams found anywhere in the training corpus
    (the remaining docs) — inverted-index equi-join on the gram."""
    from druid_spark.datapipe.sample import contamination
    docs = _engine(spark, sf).catalog.table("documents")
    ev = docs.where("doc_id % 17 = 0")
    tr = docs.where("doc_id % 17 != 0")
    return contamination(tr, ev, n=8).orderBy("id")


def q_sessionize(spark, sf):
    """Event-time sessionization (session_window — same operator the
    streaming path uses, here in batch mode): per-user session counts
    with a 1-hour inactivity gap. Oracle = gaps-and-islands SQL."""
    from druid_spark.streaming.stateful import sessionize
    ev = _engine(spark, sf).catalog.table("events").where("user_id < 50")
    s = sessionize(ev, time_col="ts", key_col="user_id", gap="1 hour")
    return (s.groupBy("user_id")
            .agg(F.count(F.lit(1)).alias("n_sessions"),
                 F.max("events").alias("max_events"))
            .orderBy("user_id"))


def q_streaming_rollup(spark, sf):
    """End-to-end streaming ingest through the supervisor's code path
    (file source stands in for Kafka — no broker in this container;
    reference idx/seekablestream/supervisor/SeekableStreamSupervisor.java:159,
    StreamAppenderator.java persist->push): minute-grain watermarked
    rollup in append mode over a checkpointed micro-batch query, a
    far-future sentinel row to advance the watermark past every real
    window, handoff tail->history, then the queryable history∪tail view.
    Deterministic: the work area is wiped per call so the whole input
    reprocesses; the sentinel's own (still-open) window never emits."""
    import hashlib
    import os
    import shutil
    import tempfile
    from druid_spark.streaming.ingest import StreamingIngest, read_stream

    eng = _engine(spark, sf)
    ev = eng.catalog.table("events").select("ts", "event_type", "value")
    base = os.path.join(
        tempfile.gettempdir(),
        "ds_stream_entry_" + hashlib.md5(sf.encode()).hexdigest()[:8])
    shutil.rmtree(base, ignore_errors=True)
    src = os.path.join(base, "src")
    ev.coalesce(4).write.parquet(src)

    def run_once():
        stream = read_stream(spark, {"type": "file", "format": "parquet",
                                     "path": src, "schema": ev.schema})
        ing = StreamingIngest(spark, base, "events_rollup")
        q = ing.start_rollup(
            stream, dims=["event_type"],
            metrics=[{"type": "count", "name": "n"},
                     {"type": "doubleSum", "name": "v", "fieldName": "value"}],
            query_granularity="minute", time_column="ts")
        q.awaitTermination(300)
        return ing

    run_once()
    # sentinel 2h past max(ts): closes every real minute window on the
    # next run; computed distributed (no driver-side value loop)
    (ev.agg(F.max("ts").alias("ts"))
       .select((F.col("ts") + F.expr("INTERVAL 2 HOURS")).alias("ts"),
               F.lit("__sentinel__").alias("event_type"),
               F.lit(0.0).alias("value"))
       .coalesce(1).write.mode("append").parquet(src))
    ing = run_once()
    ing.handoff()
    return (ing.view().select("__time", "event_type", "n", "v")
            .orderBy("__time", "event_type"))


def q_kafka_ingest(spark, sf):
    """Kafka-proper ingestion over the PUBLIC wire protocol (reference
    extensions-core/kafka-indexing-service/.../KafkaSupervisor.java:90,
    KafkaRecordSupplier.java): an in-process MiniKafkaBroker speaking
    Metadata/Produce/Fetch/ListOffsets (streaming/kafka.py), a
    deterministic events subset produced over Produce v2, and a
    kafka-type supervisor consuming it through the pure-Python PySpark
    data source (kafka_source.py — per-partition offset-range reads in
    executor tasks, offsets checkpointed by Structured Streaming).
    The producer-side collect is ingestion input (bounded, 1/97th of
    events), not a query-path materialization; the returned view is a
    lazy parquet read of the handed-off tail."""
    import hashlib
    import json
    import os
    import shutil
    import tempfile
    from druid_spark.streaming.ingest import start_supervisor
    from druid_spark.streaming.kafka import KafkaClient, MiniKafkaBroker

    eng = _engine(spark, sf)
    rows = (eng.catalog.table("events")
            .where("event_id % 97 = 0")
            .select("event_id", "ts", "user_id", "event_type", "value")
            .collect())
    base = os.path.join(
        tempfile.gettempdir(),
        "ds_kafka_entry_" + hashlib.md5(sf.encode()).hexdigest()[:8])
    shutil.rmtree(base, ignore_errors=True)
    with MiniKafkaBroker(num_partitions=2) as broker:
        cli = KafkaClient(broker.bootstrap)
        for r in rows:
            payload = json.dumps({
                "event_id": r["event_id"],
                "timestamp": r["ts"].isoformat(),
                "user_id": r["user_id"],
                "event_type": r["event_type"],
                "value": r["value"]}).encode()
            cli.produce("events", int(r["event_id"]) % 2,
                        [(int(r["ts"].timestamp() * 1000), None, payload)])
        cli.close()
        spec = {"type": "kafka", "spec": {
            "dataSchema": {"dataSource": "kafka_events",
                           "timestampSpec": {"column": "timestamp"},
                           "granularitySpec": {"rollup": False}},
            "ioConfig": {
                "topic": "events",
                "consumerProperties": {
                    "bootstrap.servers": broker.bootstrap},
                "useEarliestOffset": True,
                "valueSchema": ("event_id long, timestamp timestamp, "
                                "user_id long, event_type string, "
                                "value double")}}}
        ingest, q = start_supervisor(spark, spec, base)
        q.awaitTermination(300)
    return (ingest.view()
            .select("event_id", F.col("__time").alias("ts"), "user_id",
                    "event_type", "value")
            .orderBy("event_id"))



def q_kinesis_ingest(spark, sf):
    """Kinesis-proper ingestion over the PUBLIC HTTP/JSON API
    (reference extensions-core/kinesis-indexing-service/.../
    KinesisRecordSupplier.java, supervisor/KinesisSupervisor.java): an
    in-process MiniKinesisServer speaking ListShards/GetShardIterator/
    GetRecords/PutRecords (streaming/kinesis.py), a deterministic
    events subset produced via PutRecords, and a kinesis supervisor
    spec (ioConfig.stream = NAME + endpoint) consuming it through the
    pure-Python PySpark data source (kinesis_source.py — one task per
    shard, sequence offsets checkpointed by Structured Streaming).
    The producer-side collect is ingestion input (bounded, 1/101st of
    events); the returned view is a lazy parquet read."""
    import hashlib
    import json
    import os
    import shutil
    import tempfile
    from druid_spark.streaming.ingest import start_supervisor
    from druid_spark.streaming.kinesis import (KinesisClient,
                                               MiniKinesisServer)

    eng = _engine(spark, sf)
    rows = (eng.catalog.table("events")
            .where("event_id % 101 = 0")
            .select("event_id", "ts", "user_id", "event_type", "value")
            .collect())
    base = os.path.join(
        tempfile.gettempdir(),
        "ds_kinesis_entry_" + hashlib.md5(sf.encode()).hexdigest()[:8])
    shutil.rmtree(base, ignore_errors=True)
    with MiniKinesisServer() as srv:
        cli = KinesisClient(srv.endpoint)
        cli.create_stream("events", shards=2)
        recs = []
        for r in rows:
            payload = json.dumps({
                "event_id": r["event_id"],
                "timestamp": r["ts"].isoformat(),
                "user_id": r["user_id"],
                "event_type": r["event_type"],
                "value": r["value"]}).encode()
            recs.append((payload, str(r["event_id"])))
        for i in range(0, len(recs), 400):
            cli.put_records("events", recs[i:i + 400])
        spec = {"type": "kinesis", "spec": {
            "dataSchema": {"dataSource": "kinesis_events",
                           "timestampSpec": {"column": "timestamp"},
                           "granularitySpec": {"rollup": False}},
            "ioConfig": {
                "stream": "events",
                "endpoint": srv.endpoint,
                "useEarliestSequenceNumber": True,
                "valueSchema": ("event_id long, timestamp timestamp, "
                                "user_id long, event_type string, "
                                "value double")}}}
        ingest, q = start_supervisor(spark, spec, base)
        q.awaitTermination(300)
    return (ingest.view()
            .select("event_id", F.col("__time").alias("ts"), "user_id",
                    "event_type", "value")
            .orderBy("event_id"))


def q_dedup_clusters(spark, sf):
    """Duplicate-cluster assignment: n-gram-Jaccard near-dup pairs →
    connected components (iterative min-label propagation) → every doc
    labeled with its cluster's min doc_id; singletons label themselves.
    The keep-list for dedup is `cluster_id = doc_id`."""
    from druid_spark.datapipe.dedup import (connected_components,
                                            ngram_jaccard_pairs)
    docs = _engine(spark, sf).catalog.table("documents")
    cc = connected_components(ngram_jaccard_pairs(docs, threshold=0.8))
    return (docs.select("doc_id")
            .join(cc.withColumnRenamed("id", "doc_id"), "doc_id", "left")
            .select("doc_id",
                    F.coalesce("cluster_id", "doc_id").alias("cluster_id"))
            .orderBy("doc_id"))


def q_dedup_minhash(spark, sf):
    from druid_spark.datapipe.dedup import minhash_lsh_pairs
    docs = _engine(spark, sf).catalog.table("documents")
    return minhash_lsh_pairs(docs, threshold=0.8)


def q_dedup_simhash(spark, sf):
    from druid_spark.datapipe.dedup import simhash_pairs
    docs = _engine(spark, sf).catalog.table("documents")
    return simhash_pairs(docs, max_hamming=3)


def q_neardup_embedding(spark, sf):
    """Banded hyperplane-LSH near-dup (the scale path: equi-join, no
    cross product). Near-dups are injected deterministically as
    direction-preserving rescaled copies (cosine exactly 1.0 with the
    original; positive scaling preserves every hyperplane sign, so LSH
    capture is guaranteed, not probabilistic — the oracle's exact
    O(n^2) join must agree bit-for-bit)."""
    from druid_spark.datapipe.dedup import embedding_neardup_pairs
    emb = (_engine(spark, sf).catalog.table("embeddings")
           .select("vec_id", F.col("embedding").cast("array<double>")
                   .alias("embedding")))
    dup = emb.select((F.col("vec_id") + 100000).alias("vec_id"),
                     F.transform("embedding", lambda x: x * 0.5)
                     .alias("embedding"))
    return embedding_neardup_pairs(emb.unionAll(dup), threshold=0.95)


def q_neardup_embedding_exact(spark, sf):
    """Exact all-pairs cosine (the documented low-threshold fallback)."""
    from druid_spark.datapipe.dedup import embedding_neardup_pairs
    emb = _engine(spark, sf).catalog.table("embeddings")
    return embedding_neardup_pairs(emb, threshold=0.45, exact=True)


def _query_vec(spark, sf):
    emb = _engine(spark, sf).catalog.table("embeddings")
    return emb.where("vec_id = 0").collect()[0]["embedding"]


def q_sim_topk(spark, sf):
    from druid_spark.datapipe.similarity import brute_force_topk
    emb = _engine(spark, sf).catalog.table("embeddings")
    return brute_force_topk(emb, _query_vec(spark, sf), k=10)


def q_sim_lsh(spark, sf):
    from druid_spark.datapipe.similarity import lsh_topk
    emb = _engine(spark, sf).catalog.table("embeddings")
    return lsh_topk(emb, _query_vec(spark, sf), k=10, probe_hamming=8)


# prebuilt IVF indexes: (session, sf, n_cells) -> (centers, assigned df).
# The KMeans fit is ingest-side index construction (similarity.ivf_build)
# — it runs once per dataset here and NEVER in an entry's per-call path;
# repeated calls (bench warm iterations, driver re-runs) only probe.
_IVF_INDEX: dict = {}


def _ivf_index(spark, sf, n_cells=8):
    from druid_spark.datapipe.similarity import ivf_build
    key = (id(spark), sf, n_cells)
    if key not in _IVF_INDEX:
        emb = _engine(spark, sf).catalog.table("embeddings")
        centers, assigned = ivf_build(emb, n_cells=n_cells)
        assigned = assigned.persist()
        assigned.count()  # materialize: probes reuse the assignment
        _IVF_INDEX[key] = (centers, assigned)
    return _IVF_INDEX[key]


def q_sim_ivf(spark, sf):
    from druid_spark.datapipe.similarity import ivf_probe
    centers, assigned = _ivf_index(spark, sf)
    return ivf_probe(assigned, centers, _query_vec(spark, sf),
                     k=10, nprobe=3)


def q_sim_lsh_recall(spark, sf):
    """Recall@10 of hyperplane-LSH ANN vs the exact brute-force top-k
    (the standard ANN quality gate). The LSH path is fully
    deterministic (hyperplanes from xxhash64), so the recall is a fixed
    number per dataset; measured 0.8-1.0 at sf0.001/sf0.01, bound 0.6.
    Oracle: constant row (the semantics verified are the bound, the
    exact-side cardinality, and determinism)."""
    from druid_spark.datapipe.similarity import brute_force_topk, lsh_topk
    emb = _engine(spark, sf).catalog.table("embeddings")
    qv = _query_vec(spark, sf)
    exact = brute_force_topk(emb, qv, k=10).select("vec_id")
    ann = lsh_topk(emb, qv, k=10, probe_hamming=8).select("vec_id")
    hit = exact.join(ann, "vec_id").count()
    return spark.range(1).select(
        F.lit(10).alias("k"),
        (F.lit(hit) >= 6).alias("recall_ok"))


def q_sim_ivf_recall(spark, sf):
    """Recall@10 of IVF (KMeans coarse quantizer, nprobe=3/8 cells) vs
    exact brute force. KMeans cell boundaries vary slightly with
    partitioning, so the bound is generous (0.4; measured 0.6-0.8)."""
    from druid_spark.datapipe.similarity import brute_force_topk, ivf_probe
    emb = _engine(spark, sf).catalog.table("embeddings")
    qv = _query_vec(spark, sf)
    exact = brute_force_topk(emb, qv, k=10).select("vec_id")
    centers, assigned = _ivf_index(spark, sf)
    ann = ivf_probe(assigned, centers, qv, k=10, nprobe=3).select("vec_id")
    hit = exact.join(ann, "vec_id").count()
    return spark.range(1).select(
        F.lit(10).alias("k"),
        (F.lit(hit) >= 4).alias("recall_ok"))


def q_sim_quantized_recall(spark, sf):
    """Recall@10 of int8-quantized two-stage search (coarse dequantized
    cosine over the 4x-smaller q8 index + float rescoring of k*rescore
    survivors) vs exact brute force. Quantization error is ~1/127 per
    component, so with rescore=4 the gate is tight (≥ 9/10; measured
    10/10 at sf0.001/0.01)."""
    from druid_spark.datapipe.similarity import (brute_force_topk,
                                                 quantize_embeddings,
                                                 quantized_topk)
    emb = _engine(spark, sf).catalog.table("embeddings")
    qv = _query_vec(spark, sf)
    exact = brute_force_topk(emb, qv, k=10).select("vec_id")
    ann = quantized_topk(quantize_embeddings(emb), emb, qv,
                         k=10, rescore=4).select("vec_id")
    hit = exact.join(ann, "vec_id").count()
    return spark.range(1).select(
        F.lit(10).alias("k"),
        (F.lit(hit) >= 9).alias("recall_ok"))


def q_sys_segments_sql(spark, sf):
    """sys.segments through SQL (SystemSchema.java:105 SEGMENTS table;
    CalciteSysQueryTest shapes): per-datasource row counts read from
    parquet footers, verified against the tables themselves."""
    eng = _engine(spark, sf)
    eng.create_system_views()
    return eng.spark.sql("""
        SELECT datasource, CAST(SUM(num_rows) AS BIGINT) AS num_rows
        FROM sys_segments
        WHERE datasource IN ('region', 'nation', 'customer', 'orders')
        GROUP BY datasource ORDER BY datasource""")


def q_sys_tasks_supervisors(spark, sf):
    """sys.tasks + sys.server_segments (SystemSchema.java TASKS /
    SERVER_SEGMENTS signatures): the engine task log feeds sys.tasks
    (recorded here with fixed values so the oracle is exact); every
    single-file testdata table maps to one served segment."""
    eng = _engine(spark, sf)
    eng.record_task("task_a", "query", None, "SUCCESS", 1200.0)
    eng.record_task("task_b", "query_controller", "orders",
                    "RUNNING", 0.0)
    eng.create_system_views()
    return eng.spark.sql("""
        SELECT t.task_id, t.type, t.status,
               CAST(t.duration AS BIGINT) AS duration,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM sys_server_segments
                WHERE segment_id LIKE 'region:%'
                   OR segment_id LIKE 'nation:%') AS served_segments
        FROM sys_tasks t ORDER BY t.task_id""")


def q_vc_hof_expression(spark, sf):
    """Native expression-language HOFs (ApplyFunction.java map/fold)
    inside a virtual column: total token length per name computed with
    fold over map, grouped and aggregated."""
    return _engine(spark, sf).query({
        "queryType": "groupBy", "dataSource": "region",
        "granularity": "all",
        "virtualColumns": [{
            "type": "expression", "name": "tok_chars",
            "expression": ("fold((t, acc) -> acc + strlen(t), "
                           "string_to_array(r_name, ' '), 0)")}],
        "dimensions": ["r_name", "tok_chars"],
        "aggregations": [{"type": "count", "name": "n"}],
        "limitSpec": {"type": "default",
                      "columns": [{"dimension": "r_name"}]}})


def q_gb_having_dim_selector(spark, sf):
    """dimSelector + filter having specs composed under OR
    (DimensionSelectorHavingSpec.java / DimFilterHavingSpec.java —
    having on a dimension value, not just aggregates)."""
    return _engine(spark, sf).query({
        "queryType": "groupBy", "dataSource": "orders",
        "granularity": "all",
        "dimensions": ["o_orderstatus", "o_orderpriority"],
        "aggregations": [{"type": "count", "name": "n"}],
        "having": {"type": "or", "havingSpecs": [
            {"type": "dimSelector", "dimension": "o_orderstatus",
             "value": "P"},
            {"type": "and", "havingSpecs": [
                {"type": "dimSelector", "dimension": "o_orderpriority",
                 "value": "1-URGENT"},
                {"type": "greaterThan", "aggregation": "n",
                 "value": 900}]}]},
        "limitSpec": {"type": "default",
                      "columns": [{"dimension": "o_orderstatus"},
                                  {"dimension": "o_orderpriority"}]}})


def q_gb_month_grain(spark, sf):
    """groupBy with a calendar granularity: time bucket joins the
    dimension keys (GroupByQuery per-grain semantics)."""
    return _engine(spark, sf).query({
        "queryType": "groupBy", "dataSource": "events",
        "granularity": "week",
        "dimensions": ["event_type"],
        "aggregations": [{"type": "count", "name": "n"}],
        "limitSpec": {"type": "default",
                      "columns": [{"dimension": "__time"},
                                  {"dimension": "event_type"}]}})


def q_information_schema_tables(spark, sf):
    """INFORMATION_SCHEMA.TABLES analog (InformationSchema.java
    TablesTable; testInformationSchemaTables): the registered
    datasource catalog as a queryable view."""
    eng = _engine(spark, sf)
    eng.create_system_views()
    return eng.spark.sql("""
        SELECT TABLE_NAME, TABLE_TYPE
        FROM information_schema_tables
        WHERE TABLE_NAME IN ('region', 'nation', 'events', 'documents')
        ORDER BY TABLE_NAME""")


def q_agg_on_information_schema(spark, sf):
    """Aggregators over INFORMATION_SCHEMA.COLUMNS
    (testAggregatorsOnInformationSchemaColumns): count columns per
    table through plain SQL aggregation of the metadata view."""
    eng = _engine(spark, sf)
    eng.create_system_views()
    return eng.spark.sql("""
        SELECT TABLE_NAME, count(*) AS n_cols
        FROM information_schema_columns
        WHERE TABLE_NAME IN ('region', 'nation', 'customer')
        GROUP BY TABLE_NAME ORDER BY TABLE_NAME""")


def q_sys_schema(spark, sf):
    """INFORMATION_SCHEMA.COLUMNS analog
    (sql/calcite/schema/InformationSchema.java; SystemSchema.java:105
    for sys.*): engine-published metadata views queryable through SQL.
    Oracle: the nation table's known column catalog."""
    eng = _engine(spark, sf)
    eng.create_system_views()
    return eng.spark.sql("""
        SELECT TABLE_NAME, COLUMN_NAME, ORDINAL_POSITION, DATA_TYPE
        FROM information_schema_columns
        WHERE TABLE_NAME = 'nation' ORDER BY ORDINAL_POSITION""")


def q_doc_length_profile(spark, sf):
    """Per-language document-length profile (the curation dashboard a
    training-data pipeline runs before filtering): count, mean, exact
    median and p90 of n_chars by lang — pure Column aggregation, one
    scan."""
    docs = _engine(spark, sf).catalog.table("documents")
    return (docs.groupBy("lang")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.round(F.avg("n_chars"), 2).alias("mean_chars"),
                 F.expr("percentile(n_chars, 0.5)").alias("p50"),
                 F.expr("percentile(n_chars, 0.9)").alias("p90"))
            .orderBy("lang"))


def q_dedup_rate_by_source(spark, sf):
    """Exact-duplicate rate per source (dedup planning stat): docs
    whose full text appears more than once, as a share of the source's
    corpus — two-level aggregation over a text-hash groupBy."""
    docs = _engine(spark, sf).catalog.table("documents")
    per_text = (docs.groupBy("source", F.xxhash64("text").alias("h"))
                .agg(F.count(F.lit(1)).alias("c")))
    return (per_text.groupBy("source")
            .agg(F.sum("c").alias("n_docs"),
                 F.sum(F.when(F.col("c") > 1, F.col("c"))
                       .otherwise(F.lit(0))).alias("n_duped"))
            .orderBy("source"))


def q_text_profile(spark, sf):
    from druid_spark.datapipe import textstats
    docs = _engine(spark, sf).catalog.table("documents")
    return textstats.staged_features(docs).select(
        "doc_id", "n_tokens", "punct_ratio", "stopword_ratio", "quality",
        "lang_pred", "fingerprint")


def q_vocab_topk(spark, sf):
    """Corpus vocabulary top-k (tokenizer-training histogram):
    explode → partial-agg groupBy → TakeOrderedAndProject."""
    from druid_spark.datapipe import textstats
    docs = _engine(spark, sf).catalog.table("documents")
    return textstats.vocab_topk(docs, k=50)


def q_char_entropy(spark, sf):
    """Per-doc Shannon char entropy (perplexity proxy for quality
    filtering): single-scan pure-Column run-length fold."""
    from druid_spark.datapipe import textstats
    docs = _engine(spark, sf).catalog.table("documents")
    return (docs.select("doc_id",
                        F.round(textstats.char_entropy(F.col("text")),
                                6).alias("ent"))
            .orderBy("doc_id").limit(200))


def q_repeated_ngrams(spark, sf):
    """Cross-document repeated 5-grams (shared boilerplate
    detection): shingle → one equi-shuffle → countDistinct docs."""
    from druid_spark.datapipe import textstats
    docs = _engine(spark, sf).catalog.table("documents")
    return textstats.repeated_ngrams(docs, n=5, min_docs=3, limit=50)


def q_text_quality_by_source(spark, sf):
    from druid_spark.datapipe import textstats
    docs = _engine(spark, sf).catalog.table("documents")
    return (textstats.staged_features(docs)
            .groupBy("source")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.round(F.sum("quality"), 3).alias("quality_sum"),
                 F.sum("n_tokens").alias("tokens")))


def q_mm_features(spark, sf):
    """Multimodal feature extraction: REAL decode for PPM + PNG images
    (round 7: stdlib-zlib inflate + scanline unfilter) / PCM WAV audio
    (pure numpy + stdlib — channel means, RMS, ZCR) / AVI video
    (round 7: RIFF container + DIB frame pixels, avi.py); deterministic
    stub only for MP4 (H.264 decode needs a codec library). The demo
    media alternates PPM/PNG image rows and AVI/MP4 video rows, so
    every real decoder runs."""
    from druid_spark.datapipe import multimodal
    media = multimodal.demo_media_df(spark, 32)
    real = multimodal.extract_features(
        media.where(F.col("kind").isin("image", "audio")
                    | (F.col("mime") == "video/x-msvideo")),
        dim=8, decode_stub=False)
    stub = multimodal.extract_features(
        media.where("mime = 'video/mp4'"), dim=8)
    feats = real.unionByName(stub)
    return feats.select("media_id", "kind", "n_bytes",
                        F.round(F.element_at("feature", 1), 6).alias("f0"))


def q_segment_metadata(spark, sf):
    return _engine(spark, sf).query({
        "queryType": "segmentMetadata", "dataSource": "events"})


def q_gb_quantile_sketch(spark, sf):
    """datasketches quantiles surface: DS sketch + ToQuantile(s)/
    ToHistogram/ToRank finalizer post-aggs (DoublesSketchAggregatorFactory
    + its post-aggs). Exact mode compiles to percentile/filtered counts."""
    df = _engine(spark, sf).query({
        "queryType": "groupBy", "dataSource": "lineitem",
        "granularity": "all", "dimensions": ["l_returnflag"],
        "aggregations": [{"type": "quantilesDoublesSketch", "name": "qs",
                          "fieldName": "l_quantity", "k": 128}],
        "postAggregations": [
            {"type": "quantilesDoublesSketchToQuantile", "name": "p50",
             "field": {"type": "fieldAccess", "fieldName": "qs"},
             "fraction": 0.5},
            {"type": "quantilesDoublesSketchToQuantiles", "name": "iqr",
             "field": {"type": "fieldAccess", "fieldName": "qs"},
             "fractions": [0.25, 0.75]},
            {"type": "quantilesDoublesSketchToHistogram", "name": "hist",
             "field": {"type": "fieldAccess", "fieldName": "qs"},
             "splitPoints": [10.0, 25.0, 40.0]},
            {"type": "quantilesDoublesSketchToRank", "name": "rank25",
             "field": {"type": "fieldAccess", "fieldName": "qs"},
             "value": 25.0},
        ]})
    return df.select(
        "l_returnflag",
        F.round("p50", 4).alias("p50"),
        F.round(F.element_at("iqr", 1), 4).alias("q25"),
        F.round(F.element_at("iqr", 2), 4).alias("q75"),
        F.element_at("hist", 1).alias("h0"),
        F.element_at("hist", 2).alias("h1"),
        F.element_at("hist", 3).alias("h2"),
        F.element_at("hist", 4).alias("h3"),
        F.round("rank25", 6).alias("rank25"))


def q_theta_setops(spark, sf):
    """theta-sketch set operations (SketchSetPostAggregator): INTERSECT/
    UNION/NOT over per-filter user sets, estimated exactly in oracle mode."""
    return _engine(spark, sf).query({
        "queryType": "timeseries", "dataSource": "events",
        "granularity": "all",
        "aggregations": [
            {"type": "filtered",
             "filter": {"type": "selector", "dimension": "event_type",
                        "value": "click"},
             "aggregator": {"type": "thetaSketch", "name": "ua",
                            "fieldName": "user_id"}},
            {"type": "filtered",
             "filter": {"type": "selector", "dimension": "event_type",
                        "value": "purchase"},
             "aggregator": {"type": "thetaSketch", "name": "ub",
                            "fieldName": "user_id"}},
        ],
        "postAggregations": [
            {"type": "thetaSketchEstimate", "name": "both",
             "field": {"type": "thetaSketchSetOp", "func": "INTERSECT",
                       "fields": [{"type": "fieldAccess", "fieldName": "ua"},
                                  {"type": "fieldAccess", "fieldName": "ub"}]}},
            {"type": "thetaSketchEstimate", "name": "either",
             "field": {"type": "thetaSketchSetOp", "func": "UNION",
                       "fields": [{"type": "fieldAccess", "fieldName": "ua"},
                                  {"type": "fieldAccess", "fieldName": "ub"}]}},
            {"type": "thetaSketchEstimate", "name": "click_only",
             "field": {"type": "thetaSketchSetOp", "func": "NOT",
                       "fields": [{"type": "fieldAccess", "fieldName": "ua"},
                                  {"type": "fieldAccess", "fieldName": "ub"}]}},
            {"type": "thetaSketchEstimate", "name": "clickers",
             "field": {"type": "fieldAccess", "fieldName": "ua"}},
        ]})


def q_gb_fixed_histogram(spark, sf):
    """fixedBucketsHistogram (clip mode) over events.value per type."""
    df = _engine(spark, sf).query({
        "queryType": "groupBy", "dataSource": "events",
        "granularity": "all", "dimensions": ["event_type"],
        "aggregations": [{"type": "fixedBucketsHistogram", "name": "h",
                          "fieldName": "value", "lowerLimit": 0.0,
                          "upperLimit": 500.0, "numBuckets": 5,
                          "outlierHandlingMode": "clip"}]})
    return df.select("event_type",
                     *[F.element_at("h", i + 1).alias(f"b{i}")
                       for i in range(5)])


def q_gb_variance(spark, sf):
    """stats extension aggregators (VarianceAggregatorFactory):
    variance (sample), variancePop, stddev."""
    df = _engine(spark, sf).query({
        "queryType": "groupBy", "dataSource": "lineitem",
        "granularity": "all", "dimensions": ["l_returnflag"],
        "aggregations": [
            {"type": "variance", "name": "var_q", "fieldName": "l_quantity"},
            {"type": "variancePop", "name": "varp_q", "fieldName": "l_quantity"},
            {"type": "stddev", "name": "sd_q", "fieldName": "l_quantity"},
        ]})
    return _round(df, {"var_q": 4, "varp_q": 4, "sd_q": 4})


def q_lookup_join(spark, sf):
    """LOOKUP surface (LookupExtractor / lookup extraction fn): map
    broadcast as a plan-time literal, applied while grouping."""
    region_names = {0: "AFRICA", 1: "AMERICA", 2: "ASIA", 3: "EUROPE",
                    4: "MIDDLE EAST"}
    return _engine(spark, sf).query({
        "queryType": "groupBy", "dataSource": "nation",
        "granularity": "all",
        "dimensions": [{"type": "extraction", "dimension": "n_regionkey",
                        "outputName": "region_name",
                        "extractionFn": {"type": "lookup",
                                         "lookup": {"type": "map",
                                                    "map": region_names}}}],
        "aggregations": [{"type": "count", "name": "nations"}]})


def q_lookup_schema_table(spark, sf):
    """Lookup schema (sql/.../calcite/schema/LookupSchema.java, round
    7): every registered lookup is queryable as the two-column (k, v)
    table `lookup.<name>`, joinable like the CalciteJoinQueryTest
    testFilterAndGroupByLookupUsingJoinOperator goldens."""
    eng = _engine(spark, sf)
    eng.catalog.register_lookup("region_lk", {
        "0": "AFRICA", "1": "AMERICA", "2": "ASIA", "3": "EUROPE",
        "4": "MIDDLE EAST"})
    return eng.sql("""
        SELECT l.v AS region_name, CAST(COUNT(*) AS BIGINT) AS nations
        FROM nation n INNER JOIN lookup.region_lk l
          ON CAST(n.n_regionkey AS VARCHAR) = l.k
        GROUP BY l.v ORDER BY l.v""")


_REGION_LK = {"0": "AFRICA", "1": "AMERICA", "2": "ASIA", "3": "EUROPE",
              "4": "MIDDLE EAST"}


def q_lookup_join_union_tables(spark, sf):
    """CalciteJoinQueryTest testJoinUnionTablesOnLookup (round 7): a
    UNION ALL of two datasources LEFT JOINed to a lookup schema table,
    filtered on the lookup value."""
    eng = _engine(spark, sf)
    eng.catalog.register_lookup("region_lk", dict(_REGION_LK))
    return eng.sql("""
        SELECT l.v AS region_name, CAST(COUNT(*) AS BIGINT) AS n
        FROM (SELECT n_regionkey AS k FROM nation
              UNION ALL SELECT r_regionkey FROM region) u
        LEFT JOIN lookup.region_lk l ON CAST(u.k AS VARCHAR) = l.k
        WHERE l.v <> 'AFRICA'
        GROUP BY l.v ORDER BY l.v""")


def q_lookup_join_backwards(spark, sf):
    """CalciteJoinQueryTest testFilterAndGroupByLookupUsingJoinOperator-
    Backwards (round 7): the lookup on the LEFT, RIGHT JOINed to the
    datasource."""
    eng = _engine(spark, sf)
    eng.catalog.register_lookup("region_lk", dict(_REGION_LK))
    return eng.sql("""
        SELECT l.v AS region_name, CAST(COUNT(*) AS BIGINT) AS n
        FROM lookup.region_lk l RIGHT JOIN nation n
          ON CAST(n.n_regionkey AS VARCHAR) = l.k
        WHERE l.v <> 'ASIA'
        GROUP BY l.v ORDER BY l.v""")


def q_lookup_join_subquery_extract(spark, sf):
    """CalciteJoinQueryTest testInnerJoinQueryOfLookupRemovable (round
    7): join a SUBQUERY over the lookup table that extracts from the
    value column."""
    eng = _engine(spark, sf)
    eng.catalog.register_lookup("region_lk", dict(_REGION_LK))
    return eng.sql("""
        SELECT n.n_name, t1.sk
        FROM nation n INNER JOIN
          (SELECT k, SUBSTRING(v, 1, 3) AS sk FROM lookup.region_lk) t1
          ON CAST(n.n_regionkey AS VARCHAR) = t1.k
        ORDER BY n.n_name""")


def q_sql_pinned_now(spark, sf):
    """SET sqlCurrentTimestamp (PlannerContext, round 7): pins
    CURRENT_TIMESTAMP / CURRENT_DATE per statement — the reproducible
    replay mode every quidem golden runs under
    (SqlQuidemTest/interval_arithmetic.iq)."""
    return _engine(spark, sf).sql("""
        SET sqlCurrentTimestamp = '2024-01-15T00:00:00Z';
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(CURRENT_DATE AS VARCHAR) AS today
        FROM events
        WHERE __time >= CURRENT_TIMESTAMP - INTERVAL '2' DAY
          AND __time < CURRENT_TIMESTAMP""")


def q_gb_order_alphanumeric(spark, sf):
    """alphanumeric string comparator (StringComparators.java:34-39) in a
    limitSpec: '9' sorts before '10' and '100'."""
    return _engine(spark, sf).query({
        "queryType": "groupBy", "dataSource": "part",
        "granularity": "all",
        "virtualColumns": [{"type": "expression", "name": "sz",
                            "expression": "concat('s', cast(p_size, 'STRING'))"}],
        "dimensions": ["sz"],
        "aggregations": [{"type": "count", "name": "n"}],
        "limitSpec": {"type": "default", "limit": 12, "columns": [
            {"dimension": "sz", "direction": "ascending",
             "dimensionOrder": "alphanumeric"}]}})


def q_scan_offset(spark, sf):
    return _engine(spark, sf).query({
        "queryType": "scan", "dataSource": "orders",
        "columns": ["o_orderkey", "o_custkey", "o_totalprice"],
        "orderBy": [{"columnName": "o_orderkey", "order": "ascending"}],
        "offset": 10, "limit": 20})


def q_sql_druid_functions(spark, sf):
    """Druid-flavoured SQL through the SQL layer: Druid function names
    (TIME_FLOOR, SAFE_DIVIDE, TIME_IN_INTERVAL) and the EARLIEST/LATEST
    aggregate rewrite, all Catalyst-inlined."""
    eng = _engine(spark, sf)
    # note: round(SAFE_DIVIDE(...)) directly inside the aggregate trips a
    # Spark SQL-UDF-inlining foldability check, so finalize in an outer
    # select — same plan after Catalyst collapses the projections
    return eng.sql("""
        SELECT d, n, last_type, round(SAFE_DIVIDE(sv, n), 4) AS avg_v
        FROM (
          SELECT TIME_FLOOR(__time, 'P1D') AS d,
                 count(*) AS n,
                 LATEST(event_type) AS last_type,
                 sum(value) AS sv
          FROM events
          WHERE TIME_IN_INTERVAL(__time, '2024-01-05T00:00:00/2024-01-12T00:00:00')
          GROUP BY 1
        )
    """)


def q_gb_expr_lambda(spark, sf):
    """expression lambda aggregator
    (ExpressionLambdaAggregatorFactory.java:59): fold lambda over grouped
    rows — sum of squares here."""
    df = _engine(spark, sf).query({
        "queryType": "groupBy", "dataSource": "lineitem",
        "granularity": "all", "dimensions": ["l_linestatus"],
        "aggregations": [{"type": "expression", "name": "sumsq",
                          "fields": ["l_quantity"],
                          "accumulatorIdentifier": "__acc",
                          "initialValue": "0.0",
                          "fold": "__acc + l_quantity * l_quantity"}]})
    return _round(df, {"sumsq": 2})


def q_inline_topn(spark, sf):
    """inline datasource (InlineDataSource): literal rows queried like a
    table, joined broadcast-style against nation."""
    return _engine(spark, sf).query({
        "queryType": "groupBy",
        "dataSource": {
            "type": "join", "left": "nation",
            "right": {"type": "inline",
                      "columnNames": ["rk", "zone"],
                      "rows": [[0, "south"], [1, "west"], [2, "east"],
                               [3, "north"], [4, "central"]]},
            "rightPrefix": "j0.",
            "condition": 'n_regionkey == "j0.rk"',
            "joinType": "INNER"},
        "granularity": "all",
        "dimensions": [{"type": "default", "dimension": "j0.zone",
                        "outputName": "zone"}],
        "aggregations": [{"type": "count", "name": "nations"}]})


def q_topn_per_day(spark, sf):
    """topN with a non-'all' granularity: top-K per time bucket
    (TopNQueryEngine over per-grain cursors) → row_number window."""
    return _engine(spark, sf).query({
        "queryType": "topN", "dataSource": "events",
        "dimension": "event_type", "metric": "n", "threshold": 2,
        "granularity": "day",
        "intervals": ["2024-01-01T00:00:00Z/2024-01-08T00:00:00Z"],
        "aggregations": [{"type": "count", "name": "n"}]})


def q_window_framed_avg(spark, sf):
    """framed window aggregate (WindowFramedAggregateProcessor, rows
    frame): 3-row moving average of daily revenue."""
    df = _engine(spark, sf).query({
        "queryType": "windowOperator",
        "dataSource": {"type": "query", "query": {
            "queryType": "timeseries", "dataSource": "events",
            "granularity": "day",
            "intervals": ["2024-01-01T00:00:00Z/2024-02-01T00:00:00Z"],
            "aggregations": [{"type": "doubleSum", "name": "v",
                              "fieldName": "value"}],
            "context": {"skipEmptyBuckets": True}}},
        "operators": [
            {"type": "naiveSort", "columns": [
                {"column": "__time", "direction": "ASC"}]},
            {"type": "window", "processors": [
                {"type": "framedAgg",
                 "frame": {"type": "rows", "lowerOffset": -2,
                           "upperOffset": 0},
                 "aggregations": [{"type": "doubleMean", "name": "ma3",
                                   "fieldName": "v"}]}]}]})
    return df.select("__time", F.round("v", 3).alias("v"),
                     F.round("ma3", 3).alias("ma3"))


def q_ts_week(spark, sf):
    """ISO-week period granularity (PeriodGranularity P1W — Joda weeks
    start Monday; date_trunc('week') matches)."""
    return _engine(spark, sf).query({
        "queryType": "timeseries", "dataSource": "events",
        "granularity": {"type": "period", "period": "P1W"},
        "aggregations": [{"type": "count", "name": "n"}],
        "context": {"skipEmptyBuckets": True}})


def q_gb_limit_offset(spark, sf):
    """DefaultLimitSpec limit+offset combined: skip `offset` rows, then
    return `limit` rows (DefaultLimitSpec.java — limit counts
    post-offset rows; round-3 fix for the reversed application)."""
    return _engine(spark, sf).query({
        "queryType": "groupBy", "dataSource": "orders",
        "granularity": "all", "dimensions": ["o_custkey"],
        "aggregations": [{"type": "count", "name": "n"}],
        "limitSpec": {"type": "default", "limit": 7, "offset": 3,
                      "columns": [{"dimension": "o_custkey",
                                   "direction": "ascending",
                                   "dimensionOrder": "numeric"}]}})


def q_search_strlen_sort(spark, sf):
    """search with strlen SearchSortSpec (shortest values first,
    SearchSortSpec.java) over the event_type dimension."""
    return _engine(spark, sf).query({
        "queryType": "search", "dataSource": "events",
        "searchDimensions": ["event_type"],
        "query": {"type": "insensitive_contains", "value": "i"},
        "sort": {"type": "strlen"}})


def q_gb_having_compound(spark, sf):
    """compound having specs (HavingSpec and/or/not + dimSelector +
    equalTo — query/groupby/having/*.java): AND(total > 1000,
    NOT(dimSelector event_type = 'view'))."""
    return _round(_engine(spark, sf).query({
        "queryType": "groupBy", "dataSource": "events",
        "granularity": "all", "dimensions": ["event_type"],
        "aggregations": [{"type": "doubleSum", "name": "total",
                          "fieldName": "value"},
                         {"type": "count", "name": "n"}],
        "having": {"type": "and", "havingSpecs": [
            {"type": "greaterThan", "aggregation": "total",
             "value": 1000.0},
            {"type": "not", "havingSpec": {
                "type": "dimSelector", "dimension": "event_type",
                "value": "view"}}]},
    }), {"total": 2})


def q_ts_descending(spark, sf):
    """descending timeseries (TimeseriesQuery.isDescending — newest
    bucket first; the broker merges segment cursors in reverse)."""
    return _engine(spark, sf).query({
        "queryType": "timeseries", "dataSource": "events",
        "granularity": "day", "descending": True,
        "aggregations": [{"type": "count", "name": "n"},
                         {"type": "doubleSum", "name": "v",
                          "fieldName": "value"}],
        "context": {"skipEmptyBuckets": True}})


def q_topn_dim_metric(spark, sf):
    """topN with a dimension metric spec (lexicographic ordering by the
    dimension value itself — DimensionTopNMetricSpec)."""
    return _engine(spark, sf).query({
        "queryType": "topN", "dataSource": "orders",
        "dimension": "o_orderpriority",
        "metric": {"type": "dimension", "ordering": "lexicographic"},
        "threshold": 3, "granularity": "all",
        "aggregations": [{"type": "count", "name": "n"}]})


def q_scan_time_desc(spark, sf):
    """scan with legacy time order descending
    (ScanQuery.Order.DESCENDING — newest events first). The filter
    keeps the row set under the limit so timestamp ties at a limit
    boundary can't make membership nondeterministic (the gate's
    value compare is order-insensitive; the descending sort path
    itself is exercised and unit-tested)."""
    return _engine(spark, sf).query({
        "queryType": "scan", "dataSource": "events",
        "columns": ["event_id", "user_id", "event_type"],
        "filter": {"type": "bound", "dimension": "event_id",
                   "upper": "200", "upperStrict": True,
                   "ordering": "numeric"},
        "order": "descending", "limit": 10000})


def q_nested_groupby(spark, sf):
    """query datasource (subquery — ClientQuerySegmentWalker inlining):
    outer aggregate over an inner groupBy."""
    return _engine(spark, sf).query({
        "queryType": "timeseries",
        "dataSource": {"type": "query", "query": {
            "queryType": "groupBy", "dataSource": "events",
            "granularity": "all", "dimensions": ["user_id"],
            "aggregations": [{"type": "count", "name": "cnt"}]}},
        "granularity": "all",
        "aggregations": [
            {"type": "count", "name": "users"},
            {"type": "doubleSum", "name": "total", "fieldName": "cnt"},
            {"type": "longMax", "name": "max_cnt", "fieldName": "cnt"}]})


def q_join_outer(spark, sf):
    """LEFT join keeping unmatched rows (JoinType.LEFT) — customers with
    and without orders."""
    df = _engine(spark, sf).query({
        "queryType": "groupBy",
        "dataSource": {
            "type": "join", "left": "customer",
            "right": {"type": "query", "query": {
                "queryType": "groupBy", "dataSource": "orders",
                "granularity": "all", "dimensions": ["o_custkey"],
                "aggregations": [{"type": "count", "name": "n_orders"}]}},
            "rightPrefix": "j0.",
            "condition": 'c_custkey == "j0.o_custkey"',
            "joinType": "LEFT"},
        "granularity": "all",
        "virtualColumns": [{"type": "expression", "name": "has_orders",
                            "expression": "if(notnull(\"j0.n_orders\"), 'yes', 'no')"}],
        "dimensions": ["has_orders"],
        "aggregations": [{"type": "count", "name": "customers"}]})
    return df


def q_json_typed_agg(spark, sf):
    """typed JSON_VALUE (JSON_VALUE ... RETURNING BIGINT analog —
    NestedDataExpressions): extract, cast, aggregate JVM-side."""
    return _engine(spark, sf).query({
        "queryType": "groupBy", "dataSource": "events",
        "granularity": "all",
        "virtualColumns": [{"type": "expression", "name": "kv",
                            "expression":
                                "cast(json_value(props, '$.k'), 'LONG')"}],
        "dimensions": ["event_type"],
        "aggregations": [
            {"type": "longSum", "name": "k_sum", "fieldName": "kv"},
            {"type": "longMax", "name": "k_max", "fieldName": "kv"},
            {"type": "count", "name": "n"}]})


def q_projection_routing(spark, sf):
    """aggregate projections (AggregateProjectionSpec.java:61): the
    day-granularity query is transparently routed to a materialized
    HOURLY rollup (count→sum of partial counts, sum→sum of partial
    sums) — results identical to querying raw, scan is rollup-sized."""
    from druid_spark.plans.projections import Projection, ProjectionRouter
    eng = _engine(spark, sf)
    router = getattr(eng, "_entry_router", None)
    if router is None:
        router = ProjectionRouter(eng)
        router.register(Projection(
            "evt_hourly", "events", ["event_type"],
            [{"type": "count", "name": "cnt"},
             {"type": "doubleSum", "name": "val", "fieldName": "value"}],
            granularity="hour"))
        eng._entry_router = router
    q = {"queryType": "groupBy", "dataSource": "events",
         "granularity": "day", "dimensions": ["event_type"],
         "aggregations": [
             {"type": "count", "name": "n"},
             {"type": "doubleSum", "name": "total", "fieldName": "value"}]}
    routed = router.route(q)
    assert routed is not None and routed["dataSource"] == "__proj_evt_hourly"
    df = router.query(q)
    return df.select("__time", "event_type", "n",
                     F.round("total", 3).alias("total"))


def q_projection_count_distinct(spark, sf):
    """distinct-count over a rollup: the projection stores per-hour
    distinct user SETS (exact theta sketch); the day query re-merges by
    set union — Druid's sketch-column-in-rollup workflow, lossless."""
    from druid_spark.plans.projections import Projection, ProjectionRouter
    eng = _engine(spark, sf)
    router = getattr(eng, "_entry_router_cd", None)
    if router is None:
        router = ProjectionRouter(eng)
        router.register(Projection(
            "evt_hourly_users", "events", ["event_type"],
            [{"type": "thetaSketch", "name": "user_set",
              "fieldName": "user_id"}],
            granularity="hour"))
        eng._entry_router_cd = router
    q = {"queryType": "groupBy", "dataSource": "events",
         "granularity": "day", "dimensions": ["event_type"],
         "aggregations": [{"type": "hyperUnique", "name": "users",
                           "fieldName": "user_id"}]}
    routed = router.route(q)
    assert routed is not None and routed["aggregations"][0]["type"] == "setUnionSize"
    return router.query(q)


def q_hll_sketch_vs_exact(spark, sf):
    """Mergeable Datasketches HLL as the non-exact distinct mode
    (reference: extensions-core/datasketches/.../hll/sql/
    HllSketchApproxCountDistinctSqlAggregator.java). Emits the exact
    per-group distinct (oracle-matched) plus a deterministic tolerance
    check of the sketch estimate (lgK=12 -> ~1.6% RSE; 5% bound)."""
    eng = _engine(spark, sf)
    q = {"queryType": "groupBy", "dataSource": "events",
         "granularity": "all", "dimensions": ["event_type"],
         "aggregations": [{"type": "HLLSketchBuild", "name": "u",
                           "fieldName": "user_id"}]}
    exact = eng.query(q).select(
        "event_type", F.col("u").cast("long").alias("exact_users"))
    sk_eng = _engine(spark, sf, exact=False)
    est = sk_eng.query(q).select(
        "event_type", F.col("u").cast("double").alias("est"))
    return (exact.join(est, "event_type")
            .select("event_type", "exact_users",
                    (F.abs(F.col("est") - F.col("exact_users"))
                     <= 0.05 * F.col("exact_users")).alias("est_ok"))
            .orderBy("event_type"))


def q_hyperunique_parity(spark, sf):
    """Reference-parity hyperUnique estimates (round 10): the opt-in
    `hyperunique_parity` engine mode reproduces
    hll/HyperLogLogCollector.java bit-for-bit (2048 nibble registers,
    offset/overflow, applyCorrection) fed by the by-value cardinality
    hash (CardinalityAggregator.HASH_FUNCTION.hashUnencodedChars —
    murmur3 x64_128 over UTF-16LE). The quidem gate pins exact golden
    estimates (qaSql aggr_general A10/A11); this oracle-checkable
    surface emits the exact per-group distinct plus two deterministic
    checks: the SQL estimate within the collector's error band, and
    equal to the pure-Python collector recomputed over the same
    values (driver-independent bit-parity evidence)."""
    from druid_spark import DruidSparkEngine
    from druid_spark.functions.hllc import estimate_values

    eng = _engine(spark, sf)
    key = (id(spark), sf, "hllc_parity")
    if key not in _ENGINES:
        _ENGINES[key] = DruidSparkEngine(spark, data_dir=sf,
                                         exact_approx=True,
                                         hyperunique_parity=True)
    peng = _ENGINES[key]
    est = peng.sql(
        "SELECT event_type, APPROX_COUNT_DISTINCT_BUILTIN(user_id) "
        "AS est FROM events GROUP BY 1")
    exact = eng.sql(
        "SELECT event_type, COUNT(DISTINCT user_id) AS exact_users "
        "FROM events GROUP BY 1")
    # driver-side recomputation: one small reference group
    vals = [r.user_id for r in eng.catalog.table("events")
            .where(F.col("event_type") == "click")
            .select("user_id").collect()]
    py_est = estimate_values(str(v) for v in vals if v is not None)
    return (exact.join(est, "event_type")
            .select("event_type", "exact_users",
                    (F.abs(F.col("est") - F.col("exact_users"))
                     <= F.greatest(
                         0.05 * F.col("exact_users"), F.lit(3.0)))
                    .alias("est_ok"),
                    F.when(F.col("event_type") == "click",
                           F.col("est") == F.lit(py_est))
                    .otherwise(F.lit(True)).alias("parity_ok"))
            .orderBy("event_type"))


def q_sql_input_source(spark, sf):
    """`sql` input source over Python DB-API (round 11; reference
    server/.../metadata/input/SqlInputSource.java — a list of SQL
    queries against a database connector, split unit = one query) plus
    the JDBC lookup namespace analog
    (JdbcExtractionNamespace/JdbcCacheGenerator: keyColumn/valueColumn
    map, MAX(tsColumn) version gate). Builds a sqlite3 database from
    the region parquet, ingests it back through the input source with
    TWO sharded queries, and joins through the JDBC-loaded lookup —
    oracle is plain SQL over region."""
    import os as _os
    import sqlite3 as _sq
    import tempfile as _tf

    from druid_spark import DruidSparkEngine
    from druid_spark.ingest.batch import read_input
    from druid_spark.ingest.dbapi import load_jdbc_lookup

    eng = _engine(spark, sf)
    key = (id(spark), sf, "dbapi_sqlite")
    path = _ENGINES.get(key)
    if path is None:
        d = _tf.mkdtemp(prefix="dbapi-entry-")
        path = _os.path.join(d, "meta.db")
        conn = _sq.connect(path)
        conn.execute("CREATE TABLE region (r_regionkey INTEGER, "
                     "r_name TEXT, ts INTEGER)")
        conn.executemany(
            "INSERT INTO region VALUES (?, ?, ?)",
            [(r.r_regionkey, r.r_name, 1) for r in
             eng.catalog.table("region")
                .select("r_regionkey", "r_name").collect()])
        conn.commit()
        conn.close()
        _ENGINES[key] = path
    database = {"type": "sqlite",
                "connectorConfig": {"connectURI": f"jdbc:sqlite:{path}"}}
    df = read_input(spark, {"inputSource": {
        "type": "sql", "database": database, "foldCase": True,
        "sqls": ["SELECT r_regionkey, r_name FROM region "
                 "WHERE r_regionkey < 2",
                 "SELECT r_regionkey, r_name FROM region "
                 "WHERE r_regionkey >= 2"]}})
    lk = load_jdbc_lookup(eng, "region_jdbc", database, table="region",
                          key_column="r_regionkey",
                          value_column="r_name", ts_column="ts",
                          force=True)
    return (df.select(
        F.col("r_regionkey").cast("long").alias("r_regionkey"),
        F.col("r_name"),
        F.col("r_name").isNotNull().alias("lookup_ok"))
        .withColumn("lookup_ok",
                    F.col("r_name") == F.lit(None).cast("string")
                    if not lk else
                    F.col("r_name").isin(list(lk.values())))
        .orderBy("r_regionkey"))


def q_agg_size_cap(spark, sf):
    """Reference collection-size cap (round 11): ARRAY_AGG/STRING_AGG
    accumulators are byte-capped — default 1024
    (ExpressionLambdaAggregatorFactory.java:69 DEFAULT_MAX_SIZE_BYTES),
    explicit via the trailing maxSizeBytes argument
    (ArraySqlAggregator.java:83-150, StringSqlAggregator.java) — and
    throw "Exceeded memory usage when aggregating, size of the
    collection is larger than max [N] bytes" past it. Oracle-checked
    surface: values under an explicit large cap pass through unchanged
    (lengths pinned vs DuckDB); the 1024 default and an explicit 2048
    cap both fire on over-size collections (errors caught driver-side
    into boolean check columns, like the sketch-entry pattern)."""
    eng = _engine(spark, sf)

    def _fires(sql: str, cap: int) -> bool:
        try:
            eng.sql(sql).collect()
            return False
        except Exception as e:
            return f"larger than max [{cap}]" in str(e)

    default_fires = _fires(
        "SELECT STRING_AGG(o_orderpriority, ',') AS s FROM orders", 1024)
    explicit_fires = _fires(
        "SELECT ARRAY_AGG(o_orderpriority, 2048) AS a FROM orders", 2048)
    ok = eng.sql(
        "SELECT CAST(CHAR_LENGTH(STRING_AGG(o_orderstatus, '|', "
        "1000000)) AS BIGINT) AS n_cat, "
        "CAST(ARRAY_LENGTH(ARRAY_AGG(DISTINCT o_orderstatus)) "
        "AS BIGINT) AS n_distinct FROM orders")
    return ok.select(
        "n_cat", "n_distinct",
        F.lit(default_fires).alias("default_cap_fires"),
        F.lit(explicit_fires).alias("explicit_cap_fires"))


def _r12_mvd_table(spark, eng):
    """Inline MVD-tagged fixture shared by the round-12 entries (the
    driver's parquet tables carry no multi-value dims)."""
    import datetime as dt
    from pyspark.sql import types as T
    S = T.StringType()
    schema = T.StructType([
        T.StructField("__time", T.TimestampType()),
        T.StructField("who", S),
        T.StructField("tags", T.ArrayType(S)),
        T.StructField("m", T.LongType()),
    ])
    rows = [
        (dt.datetime(2001, 1, 1), "x", ["a", "b"], 1),
        (dt.datetime(2001, 1, 2), "y", ["b", "c"], 2),
        (dt.datetime(2001, 1, 3), "z", ["d"], 3),
        (dt.datetime(2001, 1, 4), "w", None, 4),
    ]
    eng.catalog.register_table(
        "r12_mvt", spark.createDataFrame(rows, schema),
        json_columns={"tags": "MVD"})


def q_r12_mvd_any_element(spark, sf):
    """MVD selector semantics (round 12): a scalar predicate over a
    multi-value dimension matches when ANY element matches, NOT IN
    excludes rows overlapping the list, and a null MVD never matches
    (docs/querying/multi-value-dimensions.md; CalciteJoinQueryTest
    testJoinOnTimeseriesWithFloorOnTime WHERE dim3 = 'b')."""
    eng = _engine(spark, sf)
    _r12_mvd_table(spark, eng)
    return eng.sql(
        "SELECT COUNT(*) AS n_b_or_d, CAST(SUM(m) AS BIGINT) AS sum_m "
        "FROM r12_mvt WHERE tags = 'b' OR tags = 'd'")


def q_r12_earliest_unnest_tiebreak(spark, sf):
    """EARLIEST over unnest elements (round 12): every exploded
    element shares the row's __time, so the tie-break is the FIRST
    ELEMENT of the earliest row's array (StringFirstAggregator scan
    order; qaUnnest mv_sql_agg_funcs B18 C8) — unless the element is
    itself the grouping key (C7)."""
    eng = _engine(spark, sf)
    _r12_mvd_table(spark, eng)
    by_row = eng.sql(
        "SELECT who, EARLIEST(t, 100) AS first_elem "
        "FROM r12_mvt, UNNEST(MV_TO_ARRAY(tags)) AS u(t) "
        "WHERE who IN ('x', 'y') GROUP BY who")
    return by_row.orderBy("who")


def q_r12_json_empty_leaves(spark, sf):
    """Empty-container json_value leaves (round 12): an empty ARRAY
    is the non-null empty string, an empty OBJECT is NULL
    (func_json_value A043-A064 battery split), and json_paths treats
    primitive arrays as single leaf paths (JSON_PATHS(nester) golden,
    CalciteNestedDataQueryTest)."""
    eng = _engine(spark, sf)
    return eng.sql(
        "SELECT JSON_VALUE('[]', '$') IS NULL AS empty_array_is_null, "
        "JSON_VALUE('{}', '$') IS NULL AS empty_obj_is_null, "
        "ARRAY_TO_STRING(JSON_PATHS('[5, 6]'), ',') AS prim_arr_paths")


def q_r12_complex_hash_order(spark, sf):
    """COMPLEX<json> ordering (round 12): containers sort by
    Long.compare of XXH64(SMILE(value)) with the sign-extended
    0x9747b28c seed (StructuredData.java:151-188) — the qaArray
    sql_order_by.03 A24/A25 goldens pin the order in both
    directions. This entry pins the A25 pair's ASC winner."""
    eng = _engine(spark, sf)
    import datetime as dt
    from pyspark.sql import types as T
    schema = T.StructType([
        T.StructField("__time", T.TimestampType()),
        T.StructField("j", T.StringType()),
    ])
    a = '[[true,false,null],[1,2,null]]'
    b = '[[null,false,true],[null,2,1]]'
    rows = [(dt.datetime(2001, 1, 1), a),
            (dt.datetime(2001, 1, 2), b)]
    eng.catalog.register_table(
        "r12_cjo", spark.createDataFrame(rows, schema),
        json_columns=["j"])
    return eng.sql(
        "SELECT JSON_QUERY(j, '$') c, COUNT(*) AS cnt FROM r12_cjo "
        "GROUP BY JSON_QUERY(j, '$') "
        "ORDER BY JSON_QUERY(j, '$') ASC LIMIT 1") \
        .select(F.col("c").alias("first_asc"), "cnt")


def q_projection_hll_sketch(spark, sf):
    """Rollup whose stored distinct state is a BINARY mergeable HLL
    sketch column (not a set): per-hour sketches re-merge via
    hll_union_agg to answer the day query — bounded state at any
    cardinality, the 100 TB mode. Correctness gate: exact daily
    distinct (oracle-matched) + deterministic 5% tolerance check on the
    re-merged estimate."""
    from druid_spark.plans.projections import Projection, ProjectionRouter
    eng = _engine(spark, sf)
    router = getattr(eng, "_entry_router_hll", None)
    if router is None:
        router = ProjectionRouter(eng)
        router.register(Projection(
            "evt_hourly_users_hll", "events", ["event_type"],
            [{"type": "HLLSketchBuild", "name": "user_sk",
              "fieldName": "user_id"}],
            granularity="hour", sketch=True))
        eng._entry_router_hll = router
    q = {"queryType": "groupBy", "dataSource": "events",
         "granularity": "day", "dimensions": ["event_type"],
         "aggregations": [{"type": "hyperUnique", "name": "users",
                           "fieldName": "user_id"}]}
    routed = router.route(q)
    assert (routed is not None
            and routed["aggregations"][0]["type"] == "hllUnionEstimate")
    est = router.query(q).select(
        F.col("__time"), "event_type", F.col("users").cast("double").alias("est"))
    exact = eng.query(q).select(
        F.col("__time"), "event_type",
        F.col("users").cast("long").alias("exact_users"))
    return (exact.join(est, ["__time", "event_type"])
            .select("__time", "event_type", "exact_users",
                    (F.abs(F.col("est") - F.col("exact_users"))
                     <= F.greatest(0.05 * F.col("exact_users"), F.lit(2.0)))
                    .alias("est_ok"))
            .orderBy("__time", "event_type"))


def q_projection_theta_sketch(spark, sf):
    """Rollup whose stored distinct state is a BINARY Datasketches
    THETA sketch column (Spark theta_sketch_agg — standard theta binary
    format, interoperable with the reference's
    extensions-core/datasketches theta blobs): per-hour sketches
    re-merge via theta_union_agg to answer the day query. Correctness
    gate: exact daily distinct (oracle-matched) + deterministic 5%
    tolerance on the re-merged estimate (lgK=12 ~ 4096 entries)."""
    from druid_spark.plans.projections import Projection, ProjectionRouter
    eng = _engine(spark, sf)
    router = getattr(eng, "_entry_router_theta", None)
    if router is None:
        router = ProjectionRouter(eng)
        router.register(Projection(
            "evt_hourly_users_theta", "events", ["event_type"],
            [{"type": "thetaSketch", "name": "user_sk",
              "fieldName": "user_id"}],
            granularity="hour", sketch="theta"))
        eng._entry_router_theta = router
    q = {"queryType": "groupBy", "dataSource": "events",
         "granularity": "day", "dimensions": ["event_type"],
         "aggregations": [{"type": "hyperUnique", "name": "users",
                           "fieldName": "user_id"}]}
    routed = router.route(q)
    assert (routed is not None
            and routed["aggregations"][0]["type"] == "thetaUnionEstimate")
    est = router.query(q).select(
        F.col("__time"), "event_type",
        F.col("users").cast("double").alias("est"))
    exact = eng.query(q).select(
        F.col("__time"), "event_type",
        F.col("users").cast("long").alias("exact_users"))
    return (exact.join(est, ["__time", "event_type"])
            .select("__time", "event_type", "exact_users",
                    (F.abs(F.col("est") - F.col("exact_users"))
                     <= F.greatest(0.05 * F.col("exact_users"), F.lit(2.0)))
                    .alias("est_ok"))
            .orderBy("__time", "event_type"))


def q_kll_quantile_merge(spark, sf):
    """Mergeable quantile state across rollup generations with BINARY
    Datasketches KLL (Spark kll_sketch_agg_double — standard KLL binary
    format, interoperable with the reference's kllDoublesSketch,
    extensions-core/datasketches/.../kll/
    KllDoublesSketchAggregatorFactory.java): generation 1 = per-month
    kllState rows; generation 2 = per-flag kll_merge_agg over the
    stored sketch column. Emits the exact per-flag median
    (oracle-matched) plus a rank-space tolerance check: the true rank
    of the KLL median estimate must lie in [0.5 - eps, 0.5 + eps]
    (k=200 -> eps ~ 1.65%; 5% bound checked)."""
    eng = _engine(spark, sf)
    li = eng.catalog.table("lineitem")
    # generation 1: hourly rollup storing KLL sketch state per row
    gen1 = eng.query({
        "queryType": "groupBy", "dataSource": "lineitem",
        "granularity": "month", "dimensions": ["l_returnflag"],
        "aggregations": [{"type": "kllState", "name": "price_kll",
                          "fieldName": "l_extendedprice"}]})
    # generation 2: re-merge the stored sketch column per flag
    est = gen1.groupBy("l_returnflag").agg(
        F.kll_sketch_get_quantile_double(
            F.kll_merge_agg_double("price_kll", 200), F.lit(0.5))
        .alias("est_median"))
    exact = li.groupBy("l_returnflag").agg(
        F.expr("percentile(l_extendedprice, 0.5)").alias("exact_median"))
    # rank-space check: fraction of values <= estimate should be ~0.5
    rank = (li.join(F.broadcast(est), "l_returnflag")
            .groupBy("l_returnflag")
            .agg((F.sum(F.when(F.col("l_extendedprice")
                               <= F.col("est_median"), 1).otherwise(0))
                  / F.count(F.lit(1))).alias("est_rank")))
    # integer-rounded: Spark percentile() and DuckDB quantile_cont()
    # interpolate with different float summation order (~1e-3 apart),
    # which flips the 2nd decimal at some SFs
    return (exact.join(rank, "l_returnflag")
            .select("l_returnflag",
                    F.round("exact_median", 0).cast("long")
                    .alias("exact_median"),
                    (F.abs(F.col("est_rank") - 0.5) <= 0.05)
                    .alias("rank_ok"))
            .orderBy("l_returnflag"))


def q_tuple_state_merge(spark, sf):
    """Stored tuple-sketch re-merge (the reference's
    arrayOfDoublesSketch workflow over rollup rows,
    extensions-core/datasketches/.../tuple/
    ArrayOfDoublesSketchAggregatorFactory.java): rollup rows per
    (day, event_type) store engine-internal mergeable tuple state
    (bottom-k KMV key hashes + metric sums, sketch_state.tuple_state —
    bounded O(k) per row at any cardinality); the query re-merges
    states per event_type for distinct-user estimates
    (ToEstimate; exact below k) and metric-sum re-aggregation
    (ToMetricsSumEstimate) without touching raw rows."""
    from druid_spark import sketch_state as S
    eng = _engine(spark, sf)
    ev = eng.catalog.table("events").withColumn(
        "day", F.to_date(F.col("__time")))
    state = S.tuple_state(ev, ["day", "event_type"], "user_id", ["value"])
    return (state.groupBy("event_type")
            .agg(S.tuple_union_estimate(F.col("tuple_state")).alias("users"),
                 F.round(S.tuple_union_metric_sum(F.col("tuple_state"), 1), 2)
                 .alias("value_sum"))
            .orderBy("event_type"))


def q_topn_approx_bound(spark, sf):
    """Approximate-topN disagreement bound (reference
    processing/.../query/topn/PooledTopNAlgorithm.java:69 — per-segment
    top-K' then merge, which can undercount but never overcount a
    survivor's metric): run the per-partition-trimmed topN with an
    aggressive K'=4K candidate pool against the exact topN and emit,
    per exact top-K row, (a) membership of the approx result set and
    (b) the undercount invariant approx_sum <= exact_sum. Deterministic
    for a fixed input layout, so oracle-checkable with constant-true
    flags."""
    eng = _engine(spark, sf)
    k = 20
    base = {"queryType": "topN", "dataSource": "lineitem",
            "dimension": "l_partkey", "metric": "s", "threshold": k,
            "granularity": "all",
            "aggregations": [{"type": "doubleSum", "name": "s",
                              "fieldName": "l_extendedprice"}]}
    exact = eng.query(base)
    approx = eng.query({**base,
                        "context": {"approximateTopN": True,
                                    "approximateTopNPartitionK": 4 * k}})
    a = approx.select(F.col("l_partkey").alias("pk"),
                      F.col("s").alias("s_approx"))
    return (exact.join(F.broadcast(a), exact.l_partkey == a.pk, "left")
            .select("l_partkey", F.round("s", 2).alias("s"),
                    F.col("pk").isNotNull().alias("in_approx"),
                    F.coalesce(F.col("s_approx") <= F.col("s") + 0.001,
                               F.lit(True)).alias("undercount_ok"))
            .orderBy(F.col("s").desc(), "l_partkey"))


def q_theta_kmv_vs_exact(spark, sf):
    """Mergeable KMV theta sketch (druid_spark/sketch_state.py; same
    family as extensions-core/datasketches/.../theta/
    SketchAggregatorFactory.java): per-(flag, status) bottom-k hash
    states built with the bounded two-shuffle plan, re-merged per flag
    — bounded state at any cardinality, exact below k. Emits the exact
    per-flag distinct (oracle-matched) plus a deterministic tolerance
    check of the merged estimate (k=1024 → ~3.1% RSE; 12% bound)."""
    from druid_spark import sketch_state as S
    eng = _engine(spark, sf)
    li = eng.catalog.table("lineitem")
    k = 1024
    states = S.kmv_state(li, ["l_returnflag", "l_linestatus"],
                         "l_orderkey", k)
    est = states.groupBy("l_returnflag").agg(
        S.kmv_union_estimate(F.col("l_orderkey_kmv"), k)
        .cast("double").alias("est"))
    exact = (li.groupBy("l_returnflag")
             .agg(F.count_distinct("l_orderkey").alias("exact_orders")))
    return (exact.join(est, "l_returnflag")
            .select("l_returnflag", "exact_orders",
                    (F.abs(F.col("est") - F.col("exact_orders"))
                     <= 0.12 * F.col("exact_orders")).alias("est_ok"))
            .orderBy("l_returnflag"))


def q_projection_kmv_sketch(spark, sf):
    """Rollup whose distinct state is a KMV bottom-k hash array (pure
    Catalyst, no JVM sketch dependency): per-hour states re-merge by
    bottom-k union to answer the day query. k=64 keeps the estimator
    engaged at test scale (~3% observed err at sf0.01); merge
    exactness below k is unit-tested, so the loose 25% bound here is a
    smoke check, not the correctness gate."""
    from druid_spark.plans.projections import Projection, ProjectionRouter
    eng = _engine(spark, sf)
    router = getattr(eng, "_entry_router_kmv", None)
    if router is None:
        router = ProjectionRouter(eng)
        router.register(Projection(
            "evt_hourly_users_kmv", "events", ["event_type"],
            [{"type": "thetaSketch", "name": "user_kmv",
              "fieldName": "user_id", "k": 64}],
            granularity="hour", sketch="kmv"))
        eng._entry_router_kmv = router
    q = {"queryType": "groupBy", "dataSource": "events",
         "granularity": "day", "dimensions": ["event_type"],
         "aggregations": [{"type": "hyperUnique", "name": "users",
                           "fieldName": "user_id"}]}
    routed = router.route(q)
    assert (routed is not None
            and routed["aggregations"][0]["type"] == "kmvUnionEstimate")
    est = router.query(q).select(
        "__time", "event_type", F.col("users").cast("double").alias("est"))
    exact = eng.query(q).select(
        "__time", "event_type", F.col("users").cast("long").alias("exact_users"))
    return (exact.join(est, ["__time", "event_type"])
            .select("__time", "event_type", "exact_users",
                    (F.abs(F.col("est") - F.col("exact_users"))
                     <= F.greatest(0.25 * F.col("exact_users"), F.lit(3.0)))
                    .alias("est_ok"))
            .orderBy("__time", "event_type"))


def q_projection_quantile_sample(spark, sf):
    """Mergeable quantile state in a rollup: per-hour bottom-k uniform
    row samples (sketch_state.sample_state) re-merge to one uniform
    sample of the whole group — the reference's
    quantilesDoublesSketch-in-rollup workflow
    (extensions-core/datasketches/.../quantiles/
    DoublesSketchAggregatorFactory.java) with a deterministic Catalyst
    construction. Emits the exact median (oracle-matched) plus a
    rank-space check: the fraction of values <= the sampled median
    must sit within 0.5 +/- 0.10 (k=512 → rank RSE ~2.2%)."""
    from druid_spark.plans.projections import Projection, ProjectionRouter
    eng = _engine(spark, sf)
    router = getattr(eng, "_entry_router_qs", None)
    if router is None:
        router = ProjectionRouter(eng)
        router.register(Projection(
            "evt_value_sample", "events", ["event_type"],
            [{"type": "sampleState", "name": "v_sample",
              "fieldName": "value", "k": 512}],
            granularity="hour"))
        eng._entry_router_qs = router
    est = _engine(spark, sf).query({
        "queryType": "groupBy", "dataSource": "__proj_evt_value_sample",
        "granularity": "all", "dimensions": ["event_type"],
        "aggregations": [{"type": "sampleQuantile", "name": "med",
                          "fieldName": "v_sample", "fraction": 0.5,
                          "k": 512}]})
    ev = eng.catalog.table("events")
    exact = ev.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.5d)"), 3).alias("exact_med"),
        F.count("*").alias("n"))
    frac = (ev.join(est.select("event_type", "med"), "event_type")
            .groupBy("event_type")
            .agg((F.sum(F.when(F.col("value") <= F.col("med"), 1)
                        .otherwise(0)) / F.count("*")).alias("frac")))
    return (exact.join(frac, "event_type")
            .select("event_type", "exact_med",
                    (F.abs(F.col("frac") - 0.5) <= 0.10).alias("rank_ok"))
            .orderBy("event_type"))


def q_sql_ds_hll(spark, sf):
    """Druid sketch SQL names, mode-aware (reference:
    extensions-core/datasketches/.../hll/sql/
    HllSketchApproxCountDistinctSqlAggregator.java): the exact engine
    compiles APPROX_COUNT_DISTINCT_DS_HLL to COUNT(DISTINCT) — the
    oracle-matched column — while the sketch engine builds real
    Datasketches HLL state (Spark-native hll_sketch_agg, lgK=12) and
    estimates; the estimate is tolerance-checked (5% or ±2)."""
    sql = ("SELECT event_type, APPROX_COUNT_DISTINCT_DS_HLL(user_id) AS u "
           "FROM events GROUP BY 1")
    exact = _engine(spark, sf).sql(sql).select(
        "event_type", F.col("u").cast("long").alias("exact_users"))
    est = _engine(spark, sf, exact=False).sql(sql).select(
        "event_type", F.col("u").cast("double").alias("est"))
    return (exact.join(est, "event_type")
            .select("event_type", "exact_users",
                    (F.abs(F.col("est") - F.col("exact_users"))
                     <= F.greatest(0.05 * F.col("exact_users"), F.lit(2.0)))
                    .alias("est_ok"))
            .orderBy("event_type"))


def q_single_value(spark, sf):
    """singleValue aggregator (SingleValueAggregatorFactory.java):
    the scalar-subquery guard — exactly one row per group or error."""
    return _engine(spark, sf).query({
        "queryType": "groupBy", "dataSource": "region",
        "granularity": "all", "dimensions": [],
        "filter": {"type": "equals", "column": "r_regionkey",
                   "matchValueType": "LONG", "matchValue": 0},
        "aggregations": [{"type": "singleValue", "name": "v",
                          "fieldName": "r_name"}]})


def q_gb_histogram(spark, sf):
    """Core equal-width histogram (HistogramAggregatorFactory.java):
    explicit breaks, (lo, hi] bins, HistogramVisual finalization."""
    df = _engine(spark, sf).query({
        "queryType": "groupBy", "dataSource": "events",
        "granularity": "all", "dimensions": ["event_type"],
        "aggregations": [{"type": "histogram", "name": "h",
                          "fieldName": "value",
                          "breaks": [0.0, 25.0, 50.0, 75.0, 100.0]}]})
    return df.select(
        "event_type",
        F.col("h.counts").cast("array<long>").alias("counts"),
        F.round(F.col("h.min").cast("double"), 3).alias("vmin"),
        F.round(F.col("h.max").cast("double"), 3).alias("vmax"),
    ).orderBy("event_type")


def q_union_datasource(spark, sf):
    """union DATASOURCE (UnionDataSource.java:45 — distinct from the
    top-level union query): same-schema tables unioned under one query."""
    return _engine(spark, sf).query({
        "queryType": "groupBy",
        "dataSource": {"type": "union",
                       "dataSources": ["events", "events"]},
        "granularity": "all", "dimensions": ["event_type"],
        "aggregations": [{"type": "count", "name": "n"}]})


def q_filter_datasource(spark, sf):
    """filter datasource (FilteredDataSource): pre-filtered base."""
    return _engine(spark, sf).query({
        "queryType": "timeseries",
        "dataSource": {"type": "filter", "base": "events",
                       "filter": {"type": "in", "dimension": "event_type",
                                  "values": ["click", "view"]}},
        "granularity": "all",
        "aggregations": [{"type": "count", "name": "n"},
                         {"type": "doubleSum", "name": "total",
                          "fieldName": "value"}]})


def q_gb_prefix_filtered(spark, sf):
    """prefixFiltered dimension spec (DimensionSpec.java:41-45)."""
    return _engine(spark, sf).query({
        "queryType": "groupBy", "dataSource": "part",
        "granularity": "all",
        "dimensions": [{"type": "prefixFiltered", "dimension": "p_brand",
                        "outputName": "c", "prefix": "Brand#1"}],
        "aggregations": [{"type": "count", "name": "n"}]})


def q_spatial_filter(spark, sf):
    """spatial filter (rectangular bound over a 'lat,lon' dimension) —
    the reference's spatial-indexed dim filter; coordinates synthesized
    from part columns via a virtual column."""
    return _engine(spark, sf).query({
        "queryType": "timeseries", "dataSource": "part",
        "granularity": "all",
        "virtualColumns": [{"type": "expression", "name": "loc",
                            "expression":
                                "concat(cast(p_size, 'STRING'), ',', "
                                "cast(p_partkey % 100, 'STRING'))"}],
        "filter": {"type": "spatial", "dimension": "loc",
                   "bound": {"type": "rectangular",
                             "minCoords": [10.0, 20.0],
                             "maxCoords": [30.0, 60.0]}},
        "aggregations": [{"type": "count", "name": "n"}]})


def q_spatial_radius(spark, sf):
    """radius spatial bound (spatial/filter/RadiusBound.java):
    points within euclidean distance of a center, coordinates
    synthesized like the rectangular entry."""
    return _engine(spark, sf).query({
        "queryType": "timeseries", "dataSource": "part",
        "granularity": "all",
        "virtualColumns": [{"type": "expression", "name": "loc",
                            "expression":
                                "concat(cast(p_size, 'STRING'), ',', "
                                "cast(p_partkey % 100, 'STRING'))"}],
        "filter": {"type": "spatial", "dimension": "loc",
                   "bound": {"type": "radius",
                             "coords": [25.0, 50.0], "radius": 15.0}},
        "aggregations": [{"type": "count", "name": "n"}]})


def q_gb_array_dim(spark, sf):
    """grouping on a true ARRAY-typed key (outputType ARRAY<STRING> —
    arrayIngestMode=array semantics): the whole array is the group key,
    NOT exploded per value like an MVD."""
    return _engine(spark, sf).query({
        "queryType": "groupBy", "dataSource": "documents",
        "granularity": "all",
        "virtualColumns": [{"type": "expression", "name": "lead_toks",
                            "expression":
                                "array_slice(string_to_array(text, ' '), 0, 2)"}],
        "dimensions": [{"type": "default", "dimension": "lead_toks",
                        "outputName": "lead_toks",
                        "outputType": "ARRAY<STRING>"}],
        "aggregations": [{"type": "count", "name": "n"}],
        "having": {"type": "greaterThan", "aggregation": "n", "value": 1},
        "limitSpec": {"type": "default",
                      "columns": [{"dimension": "lead_toks"}]}}
    ).withColumn("lead_toks", F.array_join("lead_toks", " "))
    # grouping happened on the ARRAY key; the output column is joined to
    # a string only because the driver compare stringifies string-arrays
    # differently than DuckDB


def q_restrict_datasource(spark, sf):
    """restrict datasource with a row-filter policy
    (RestrictedDataSource + RowFilterPolicy — row-level security): the
    policy filter is ANDed under the query's own filter."""
    return _engine(spark, sf).query({
        "queryType": "groupBy",
        "dataSource": {"type": "restrict", "base": "orders",
                       "policy": {"type": "row",
                                  "rowFilter": {"type": "equals",
                                                "column": "o_orderpriority",
                                                "matchValue": "1-URGENT"}}},
        "granularity": "all", "dimensions": ["o_orderstatus"],
        "filter": {"type": "bound", "dimension": "o_totalprice",
                   "lower": "1000", "ordering": "numeric"},
        "aggregations": [{"type": "count", "name": "n"}],
        "limitSpec": {"type": "default",
                      "columns": [{"dimension": "o_orderstatus"}]}})


def q_spatial_polygon(spark, sf):
    """spatial filter with a polygon bound (PolygonBound, spatial
    extension) — PNPOLY ray casting unrolled into one codegen-friendly
    boolean expression per edge. The diamond polygon equals a manhattan
    ball, which the DuckDB oracle states in closed form."""
    return _engine(spark, sf).query({
        "queryType": "timeseries", "dataSource": "part",
        "granularity": "all",
        "virtualColumns": [{"type": "expression", "name": "loc",
                            "expression":
                                "concat(cast(p_size, 'STRING'), ',', "
                                "cast(p_partkey % 100, 'STRING'))"}],
        "filter": {"type": "spatial", "dimension": "loc",
                   "bound": {"type": "polygon",
                             "abscissa": [45.5, 25.0, 4.5, 25.0],
                             "ordinate": [50.0, 70.5, 50.0, 29.5]}},
        "aggregations": [{"type": "count", "name": "n"}]})


def q_bloom_filter(spark, sf):
    """bloom-filter extension round trip: a `bloom` aggregator builds a
    filter over BUILDING-segment customer keys (sparse-bitset
    struct(m,k,positions), merged distributively); the collected holder
    then drives a `bloom` dim filter probing orders — the reference's
    "build in one query, filter a second query" workflow. Sized so the
    false-positive probability is ~(nk/m)^k ≈ 1e-16: the oracle is the
    exact semi-join."""
    eng = _engine(spark, sf)
    holder = eng.query({
        "queryType": "timeseries", "dataSource": "customer",
        "granularity": "all",
        "filter": {"type": "equals", "column": "c_mktsegment",
                   "matchValue": "BUILDING"},
        "aggregations": [{"type": "bloom", "name": "bf",
                          "fieldName": "c_custkey"}]}).collect()[0]["bf"]
    return eng.query({
        "queryType": "timeseries", "dataSource": "orders",
        "granularity": "all",
        "filter": {"type": "bloom", "dimension": "o_custkey",
                   "bloomKFilter": {"m": holder["m"], "k": holder["k"],
                                    "positions": list(holder["positions"])}},
        "aggregations": [{"type": "count", "name": "n"},
                         {"type": "doubleSum", "name": "rev",
                          "fieldName": "o_totalprice"}]})


def q_tuple_sketch(spark, sf):
    """arrayOfDoublesSketch (tuple sketch) in exact mode: distinct
    orders per return flag with metric sums carried alongside, read via
    ToEstimate / ToMetricsSumEstimate finalizer post-aggs."""
    df = _engine(spark, sf).query({
        "queryType": "groupBy", "dataSource": "lineitem",
        "granularity": "all", "dimensions": ["l_returnflag"],
        "aggregations": [{"type": "arrayOfDoublesSketch", "name": "tup",
                          "fieldNames": ["l_orderkey"],
                          "metricColumns": ["l_quantity",
                                            "l_extendedprice"]}],
        "postAggregations": [
            {"type": "arrayOfDoublesSketchToEstimate", "name": "orders_est",
             "field": {"type": "fieldAccess", "fieldName": "tup"}},
            {"type": "arrayOfDoublesSketchToMetricsSumEstimate",
             "name": "msums",
             "field": {"type": "fieldAccess", "fieldName": "tup"}}],
        "limitSpec": {"type": "default",
                      "columns": [{"dimension": "l_returnflag"}]}})
    # drop the raw sketch struct; round the metric sums (array-typed
    # doubles hash at full precision in the driver compare)
    return df.drop("tup").withColumn(
        "msums", F.transform("msums", lambda x: F.round(x, 2)))


def q_tuple_setops(spark, sf):
    """arrayOfDoublesSketchSetOp (datasketches ArrayOfDoublesSketch-
    SetOpPostAggregator): INTERSECT/UNION/NOT over tuple sketches keyed
    on l_orderkey with an l_quantity metric, plus ToMetricsSumEstimate
    over set-op results. Exact mode compiles the referenced sketches to
    per-key metric-sum maps (aggregations.py tuple_map_state) and the
    ops to pure map algebra."""
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

    df = _engine(spark, sf).query({
        "queryType": "timeseries", "dataSource": "lineitem",
        "granularity": "all",
        "aggregations": [tup("a", "R"), tup("b", "A")],
        "postAggregations": [
            {"type": "arrayOfDoublesSketchToEstimate", "name": "inter",
             "field": setop("INTERSECT")},
            {"type": "arrayOfDoublesSketchToEstimate", "name": "uni",
             "field": setop("UNION")},
            {"type": "arrayOfDoublesSketchToEstimate", "name": "anotb",
             "field": setop("NOT")},
            {"type": "arrayOfDoublesSketchToMetricsSumEstimate",
             "name": "isum", "field": setop("INTERSECT")},
            {"type": "arrayOfDoublesSketchToMetricsSumEstimate",
             "name": "usum", "field": setop("UNION")},
            {"type": "arrayOfDoublesSketchToNumEntries", "name": "n_not",
             "field": setop("NOT")}]})
    return df.select(
        "inter", "uni", "anotb",
        F.round(F.element_at("isum", 1), 2).alias("isum1"),
        F.round(F.element_at("usum", 1), 2).alias("usum1"),
        "n_not")


def q_search_fragment(spark, sf):
    """search query with the fragment matcher (all fragments must
    appear) across two dimensions."""
    return _engine(spark, sf).query({
        "queryType": "search", "dataSource": "part",
        "searchDimensions": ["p_type", "p_brand"],
        "query": {"type": "fragment", "values": ["Brand", "#1"],
                  "caseSensitive": True},
        "granularity": "all"})


def q_tpch_q1(spark, sf):
    """TPC-H Q1 (pricing summary) through the Druid SQL layer —
    SqlBenchmark-style groupBy/agg SQL running unmodified."""
    return _engine(spark, sf).sql("""
        SELECT l_returnflag, l_linestatus,
               ROUND(SUM(l_quantity), 2) AS sum_qty,
               ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 2)
                 AS sum_disc_price,
               ROUND(AVG(l_quantity), 4) AS avg_qty,
               COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus""")


def q_tpch_q3(spark, sf):
    """TPC-H Q3 (shipping priority): 3-way join + top-10 — exercises
    join planning (customer broadcast under AQE) and TakeOrdered."""
    return _engine(spark, sf).sql("""
        SELECT l_orderkey,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 2)
                 AS revenue,
               o_orderdate, o_orderpriority
        FROM customer JOIN orders ON c_custkey = o_custkey
                      JOIN lineitem ON l_orderkey = o_orderkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1996-03-15'
          AND l_shipdate > TIMESTAMP '1996-03-15'
        GROUP BY l_orderkey, o_orderdate, o_orderpriority
        ORDER BY revenue DESC, o_orderdate, l_orderkey LIMIT 10""")


def q_tpch_q6(spark, sf):
    """TPC-H Q6 (forecast revenue change): the filtered-sum shape whose
    predicates must all reach the parquet scan."""
    return _engine(spark, sf).sql("""
        SELECT ROUND(SUM(l_extendedprice * l_discount), 2) AS revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1997-01-01'
          AND l_discount BETWEEN 0.03 AND 0.07
          AND l_quantity < 24""")


def q_sql_semantics(spark, sf):
    """Semantics matrix over the SQL shims: ISO day-of-week extraction
    (Mon=1..Sun=7 like the reference), calendar-period TIME_CEIL,
    TIME_IN_INTERVAL with Z endpoints, radix PARSE_LONG round trip,
    numeric TRUNCATE, and the binary byte-format ladder."""
    return _engine(spark, sf).sql("""
        SELECT TIME_EXTRACT(ts, 'ISODOW') AS isodow,
               COUNT(*) AS n,
               TIME_CEIL(MIN(ts), 'P1M') AS ceil_month,
               PARSE_LONG(FORMAT_STRING('%x', MAX(event_id)), 16)
                 AS max_id,
               TRUNCATE(CAST(COUNT(*) AS DOUBLE) / 7, 1) AS n7,
               HUMAN_READABLE_BINARY_BYTE_FORMAT(COUNT(*) * 1048576)
                 AS hr
        FROM events
        WHERE TIME_IN_INTERVAL(ts,
              '2024-01-01T00:00:00Z/2024-02-01T00:00:00Z')
        GROUP BY 1 ORDER BY 1""")


def q_sql_extern(spark, sf):
    """TABLE(EXTERN(inputSource, inputFormat, signature)) — MSQ's
    SQL-side external input (ExternalOperatorConversion): the external
    source becomes a spark.read DataFrame registered as a view."""
    return _engine(spark, sf).sql("""
        SELECT name, sum(x) AS sx FROM TABLE(EXTERN(
          '{"type": "inline", "data": "a,1\\nb,2\\na,3"}',
          '{"type": "csv", "columns": ["name", "x"]}',
          '[{"name": "name", "type": "STRING"},
            {"name": "x", "type": "LONG"}]'))
        GROUP BY name ORDER BY name""")


def q_sql_unnest(spark, sf):
    """Druid SQL CROSS JOIN UNNEST(...) AS t(col) (DruidUnnestRule) —
    rewritten to LATERAL VIEW EXPLODE with the array-shim inlined
    (Spark disallows SQL UDFs inside Generate)."""
    return _engine(spark, sf).sql("""
        SELECT token, COUNT(*) AS n
        FROM documents
          CROSS JOIN UNNEST(STRING_TO_ARRAY(text, ' ')) AS t(token)
        WHERE token LIKE 's%' GROUP BY token ORDER BY token""")


def q_gb_hll_expr(spark, sf):
    """HLL expression functions (HyperUniqueExpressions.java) driving a
    fold-lambda aggregator: hyper_unique() / hyper_unique_add build the
    per-group set, hyper_unique_estimate finalizes — exact mode, so the
    oracle is COUNT(DISTINCT)."""
    return _engine(spark, sf).query({
        "queryType": "groupBy", "dataSource": "orders",
        "granularity": "all", "dimensions": ["o_orderstatus"],
        "aggregations": [{"type": "expression", "name": "hll",
                          "fields": ["o_custkey"],
                          "initialValue": "hyper_unique()",
                          "fold": "hyper_unique_add(o_custkey, __acc)",
                          "accumulatorIdentifier": "__acc"}],
        "postAggregations": [{"type": "expression", "name": "uniq",
                              "expression": "hyper_unique_estimate(hll)"}],
        "limitSpec": {"type": "default",
                      "columns": [{"dimension": "o_orderstatus"}]}}
    ).select("o_orderstatus", "uniq")


def q_sql_array_agg(spark, sf):
    """ARRAY_AGG / STRING_AGG SQL aggregates (sorted for determinism)."""
    eng = _engine(spark, sf)
    return eng.sql("""
        SELECT o_orderpriority,
               array_join(array_sort(ARRAY_AGG(DISTINCT o_orderstatus)), ',')
                 AS statuses,
               count(*) AS n
        FROM orders GROUP BY 1
    """)


# --------------------------------------------------------------------------

# --------------------------------------------------------------------------
# CalciteQueryTest-style SQL case bank
# --------------------------------------------------------------------------
# A representative slice of the reference's SQL contract
# (sql/src/test/.../CalciteQueryTest.java, 400+ testQuery cases, and the
# quidem .iq corpus), re-expressed over the driver testdata schema:
# searched CASE, IN/EXISTS/scalar subqueries, UNION ALL (top-level and
# nested), nested GROUP BY, HAVING on aggregates, ORDER BY expression +
# OFFSET, nested EXTRACT, INTERVAL arithmetic, ARRAY constructors,
# string functions, non-ANSI CAST, multiple COUNT(DISTINCT),
# GROUPING SETS, join-on-aggregated-subquery, anti-join via LEFT+IS
# NULL, NULLIF/COALESCE, SQL window functions, CTEs, self-joins,
# modulo arithmetic, BETWEEN+LIKE. Each runs through the engine's SQL
# layer on Spark AND as a DuckDB oracle (second tuple slot; None =
# same text runs on both).
_SQL_CASES: dict[str, tuple[str, str | None]] = {
    # testGroupByCaseWhen (CalciteQueryTest.java)
    "sqlc_case_searched": ("""
        SELECT o_orderstatus,
               CAST(sum(CASE WHEN o_totalprice > 200000 THEN 1 ELSE 0 END)
                    AS BIGINT) AS big,
               count(*) AS n
        FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""", None),
    # testInSubquery → semi join
    "sqlc_in_subquery": ("""
        SELECT c_mktsegment, count(*) AS n
        FROM customer
        WHERE c_nationkey IN (SELECT n_nationkey FROM nation
                              WHERE n_regionkey = 1)
        GROUP BY c_mktsegment ORDER BY c_mktsegment""", None),
    # testNotInSubquery analog (null-safe form)
    "sqlc_not_exists": ("""
        SELECT count(*) AS n FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey)""", None),
    # testExistsCorrelated
    "sqlc_exists_correlated": ("""
        SELECT n_name FROM nation n
        WHERE EXISTS (SELECT 1 FROM customer c
                      WHERE c.c_nationkey = n.n_nationkey
                        AND c.c_acctbal > 9000)
        ORDER BY n_name""", None),
    # scalar subquery in the select list (Druid plans singleValue)
    "sqlc_scalar_subquery": ("""
        SELECT o_orderstatus, count(*) AS n,
               round((SELECT avg(c_acctbal) FROM customer), 2) AS global_avg
        FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""", None),
    # testUnionAllQueries
    "sqlc_union_all": ("""
        SELECT 'cust' AS src, count(*) AS n FROM customer
        UNION ALL
        SELECT 'ord' AS src, count(*) AS n FROM orders
        ORDER BY src""", None),
    # testNestedGroupBy
    "sqlc_nested_groupby": ("""
        SELECT o_orderstatus, count(*) AS n_custs,
               round(sum(total), 2) AS revenue
        FROM (SELECT o_orderstatus, o_custkey,
                     sum(o_totalprice) AS total
              FROM orders GROUP BY o_orderstatus, o_custkey) t
        GROUP BY o_orderstatus ORDER BY o_orderstatus""", None),
    # testHavingOnExpression
    "sqlc_having": ("""
        SELECT o_custkey, count(*) AS n FROM orders
        GROUP BY o_custkey HAVING count(*) >= 30
        ORDER BY n DESC, o_custkey LIMIT 10""", None),
    # ORDER BY expression + LIMIT/OFFSET
    "sqlc_order_expr_offset": ("""
        SELECT p_partkey, round(p_retailprice, 2) AS price FROM part
        ORDER BY round(p_retailprice, 0) DESC, p_partkey
        LIMIT 5 OFFSET 5""", None),
    # nested EXTRACT forms (the round-1 risk case)
    "sqlc_extract_nested": ("""
        SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS y,
               CAST(sum(CASE WHEN EXTRACT(MONTH FROM o_orderdate) <= 6
                        THEN 1 ELSE 0 END) AS BIGINT) AS h1,
               count(*) AS n
        FROM orders GROUP BY 1 ORDER BY 1""", None),
    # INTERVAL literal arithmetic in a filter
    "sqlc_interval_arith": ("""
        SELECT count(*) AS n FROM orders
        WHERE o_orderdate + INTERVAL '30' DAY
              < TIMESTAMP '1995-01-01 00:00:00'""", """
        SELECT count(*) AS n FROM orders
        WHERE o_orderdate + INTERVAL 30 DAY
              < TIMESTAMP '1995-01-01 00:00:00'"""),
    # testArray* constructor + functions
    "sqlc_array_construct": ("""
        SELECT ARRAY_LENGTH(ARRAY['a','b','c']) AS n3,
               ARRAY_CONTAINS(ARRAY['a','b'], 'a') AS has_a,
               ARRAY_TO_STRING(ARRAY['x','y'], '-') AS joined""", """
        SELECT len(['a','b','c']) AS n3,
               list_contains(['a','b'], 'a') AS has_a,
               array_to_string(['x','y'], '-') AS joined"""),
    # testStringFunctions: SUBSTRING/UPPER/POSITION
    "sqlc_string_fns": ("""
        SELECT c_mktsegment, count(*) AS n,
               min(UPPER(SUBSTRING(c_name, 1, 8))) AS mn
        FROM customer
        WHERE POSITION('5' IN c_name) > 0
        GROUP BY c_mktsegment ORDER BY c_mktsegment""", None),
    # non-ANSI CAST semantics: bad casts yield NULL, never errors
    "sqlc_cast_matrix": ("""
        SELECT CAST('42' AS BIGINT) AS i,
               CAST('abc' AS BIGINT) AS bad,
               CAST(7 AS STRING) AS s,
               CAST('1995-03-04 00:00:00' AS TIMESTAMP) AS t""", """
        SELECT CAST('42' AS BIGINT) AS i,
               TRY_CAST('abc' AS BIGINT) AS bad,
               CAST(7 AS VARCHAR) AS s,
               CAST('1995-03-04 00:00:00' AS TIMESTAMP) AS t"""),
    # testMultipleExactCountDistinct
    "sqlc_multi_distinct": ("""
        SELECT count(DISTINCT o_custkey) AS custs,
               count(DISTINCT o_orderstatus) AS stats,
               count(*) AS n
        FROM orders""", None),
    # testGroupingSets
    "sqlc_grouping_sets": ("""
        SELECT coalesce(o_orderstatus, 'ALL') AS st,
               coalesce(o_orderpriority, 'ALL') AS pr,
               count(*) AS n
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        ORDER BY st, pr""", None),
    # join against an aggregated subquery
    "sqlc_join_agg_subquery": ("""
        SELECT n.n_name, round(sum(c.c_acctbal), 2) AS bal,
               t.cnt AS nation_customers
        FROM customer c
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        JOIN (SELECT c_nationkey, count(*) AS cnt
              FROM customer GROUP BY c_nationkey) t
          ON t.c_nationkey = n.n_nationkey
        GROUP BY n.n_name, t.cnt ORDER BY n.n_name""", None),
    # anti-join via LEFT JOIN + IS NULL
    "sqlc_left_join_null": ("""
        SELECT count(*) AS n
        FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
        WHERE o.o_orderkey IS NULL""", None),
    # testCoalesce / NULLIF
    "sqlc_coalesce_nullif": ("""
        SELECT coalesce(NULLIF(o_orderstatus, 'O'), 'open') AS st,
               count(*) AS n
        FROM orders GROUP BY 1 ORDER BY 1""", None),
    # SQL window functions over a partition
    "sqlc_window_sql": ("""
        SELECT o_orderstatus, o_orderkey, round(o_totalprice, 2) AS price
        FROM (
          SELECT o_orderstatus, o_orderkey, o_totalprice,
                 ROW_NUMBER() OVER (PARTITION BY o_orderstatus
                                    ORDER BY o_totalprice DESC, o_orderkey)
                 AS rn
          FROM orders) t
        WHERE rn <= 3 ORDER BY o_orderstatus, price DESC""", None),
    # testCommonTableExpression
    "sqlc_cte": ("""
        WITH big AS (SELECT * FROM orders WHERE o_totalprice > 300000)
        SELECT o_orderstatus, count(*) AS n,
               round(avg(o_totalprice), 2) AS avg_p
        FROM big GROUP BY o_orderstatus ORDER BY o_orderstatus""", None),
    # self-join shape (shared dimension key)
    "sqlc_self_join": ("""
        SELECT s.s_suppkey, count(*) AS n_cust
        FROM supplier s JOIN customer c ON c.c_nationkey = s.s_nationkey
        GROUP BY s.s_suppkey ORDER BY s.s_suppkey LIMIT 10""", None),
    # UNION ALL nested under an outer sort
    "sqlc_union_nested": ("""
        SELECT src, n FROM (
          SELECT 'pa' AS src, count(*) AS n FROM part
          UNION ALL SELECT 'su' AS src, count(*) AS n FROM supplier
          UNION ALL SELECT 'na' AS src, count(*) AS n FROM nation) t
        ORDER BY n DESC, src""", None),
    # modulo + division arithmetic
    "sqlc_arith_mod": ("""
        SELECT MOD(o_orderkey, 7) AS m, count(*) AS n,
               round(sum(o_totalprice / 100), 2) AS s
        FROM orders GROUP BY 1 ORDER BY 1""", None),
    # BETWEEN + LIKE
    "sqlc_between_like": ("""
        SELECT count(*) AS n FROM part
        WHERE p_size BETWEEN 10 AND 20 AND p_name LIKE '%gre%'""", None),
    # ---- batch 2 (round 2): simple CASE, set ops, correlated scalar,
    # FILTER clause, ROLLUP, TIMESTAMPADD/DIFF, REGEXP_LIKE, ARRAY_AGG,
    # RANGE frames, NTILE/PERCENT_RANK, NULL three-valued logic,
    # DISTINCT multi-col, LEAST/GREATEST, VARCHAR casts, chained CTEs ----
    # simple (non-searched) CASE
    "sqlc_case_simple": ("""
        SELECT CASE o_orderstatus WHEN 'O' THEN 'open'
               WHEN 'F' THEN 'done' ELSE 'other' END AS st,
               count(*) AS n
        FROM orders GROUP BY 1 ORDER BY 1""", None),
    # explicit NULLS FIRST ordering over a nullable expression
    "sqlc_nulls_first": ("""
        SELECT NULLIF(o_orderstatus, 'O') AS st, count(*) AS n
        FROM orders GROUP BY 1 ORDER BY st NULLS FIRST""", None),
    # INTERSECT (left-side column naming)
    "sqlc_intersect": ("""
        SELECT o_custkey AS k FROM orders
        INTERSECT
        SELECT c_custkey AS k FROM customer WHERE c_acctbal > 9900
        ORDER BY k LIMIT 10""", None),
    # EXCEPT with guaranteed-nonempty difference (distinct semantics)
    "sqlc_except": ("""
        SELECT p_size AS k FROM part
        EXCEPT
        SELECT p_size AS k FROM part WHERE p_size <= 25
        ORDER BY k LIMIT 10""", None),
    # correlated scalar subquery in the select list (decorrelation +
    # the COUNT-over-empty-group guard Druid plans as singleValue)
    "sqlc_scalar_correlated": ("""
        SELECT n_name,
               (SELECT count(*) FROM customer c
                WHERE c.c_nationkey = n.n_nationkey) AS nc
        FROM nation n ORDER BY n_name""", None),
    # SQL-standard FILTER clause on aggregates
    "sqlc_filter_clause": ("""
        SELECT count(*) FILTER (WHERE o_orderstatus = 'O') AS open_n,
               count(*) FILTER (WHERE o_totalprice > 200000) AS big_n,
               count(*) AS n
        FROM orders""", None),
    # GROUP BY ROLLUP hierarchy
    "sqlc_rollup": ("""
        SELECT coalesce(o_orderstatus, 'ALL') AS st,
               coalesce(o_orderpriority, 'ALL') AS pr, count(*) AS n
        FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
        ORDER BY st, pr""", None),
    # TIMESTAMPADD calendar arithmetic in a filter
    "sqlc_timestampadd": ("""
        SELECT count(*) AS n FROM orders
        WHERE TIMESTAMPADD(MONTH, 3, o_orderdate)
              < TIMESTAMP '1994-01-01 00:00:00'""", """
        SELECT count(*) AS n FROM orders
        WHERE o_orderdate + INTERVAL 3 MONTH
              < TIMESTAMP '1994-01-01 00:00:00'"""),
    # TIMESTAMPDIFF whole-day deltas
    "sqlc_timestampdiff": ("""
        SELECT CAST(floor(avg(TIMESTAMPDIFF(DAY, o_orderdate,
               TIMESTAMP '1998-12-31 00:00:00'))) AS BIGINT) AS avg_age
        FROM orders""", """
        SELECT CAST(floor(avg(date_diff('day', o_orderdate,
               TIMESTAMP '1998-12-31 00:00:00'))) AS BIGINT) AS avg_age
        FROM orders"""),
    # REGEXP_LIKE filter
    "sqlc_regexp_like": ("""
        SELECT count(*) AS n FROM part
        WHERE REGEXP_LIKE(p_name, '^a.*e$')""", """
        SELECT count(*) AS n FROM part
        WHERE regexp_matches(p_name, '^a.*e$')"""),
    # ARRAY_AGG(DISTINCT) canonicalized to a sorted joined string
    "sqlc_array_agg": ("""
        SELECT o_orderstatus,
               ARRAY_TO_STRING(ARRAY_SORT(ARRAY_AGG(
                   DISTINCT o_orderpriority)), ',') AS pris
        FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""", """
        SELECT o_orderstatus,
               array_to_string(list_sort(array_agg(
                   DISTINCT o_orderpriority)), ',') AS pris
        FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus"""),
    # cumulative window with a RANGE frame (peers included on ties)
    "sqlc_window_range_frame": ("""
        SELECT m, round(sum(s) OVER (ORDER BY m
                 RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
               AS cum
        FROM (SELECT CAST(EXTRACT(MONTH FROM o_orderdate) AS BIGINT) AS m,
                     sum(o_totalprice) AS s
              FROM orders WHERE EXTRACT(YEAR FROM o_orderdate) = 1995
              GROUP BY 1) t
        ORDER BY m""", None),
    # NTILE quartiles over a total order
    "sqlc_ntile": ("""
        SELECT q, count(*) AS n FROM (
          SELECT NTILE(4) OVER (ORDER BY o_totalprice, o_orderkey) AS q
          FROM orders) t
        GROUP BY q ORDER BY q""", None),
    # PERCENT_RANK / CUME_DIST distributions
    "sqlc_percent_rank": ("""
        SELECT o_orderstatus, round(avg(pr), 3) AS avg_pr,
               round(max(cd), 3) AS max_cd
        FROM (SELECT o_orderstatus,
                     PERCENT_RANK() OVER (PARTITION BY o_orderstatus
                                          ORDER BY o_totalprice) AS pr,
                     CUME_DIST() OVER (PARTITION BY o_orderstatus
                                       ORDER BY o_totalprice) AS cd
              FROM orders) t
        GROUP BY o_orderstatus ORDER BY o_orderstatus""", None),
    # three-valued logic: NOT IN with a NULL in the list drops all rows
    "sqlc_not_in_null": ("""
        SELECT count(*) AS n FROM orders
        WHERE o_orderstatus NOT IN ('X', NULL)""", None),
    # DISTINCT over multiple columns
    "sqlc_distinct_multi": ("""
        SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders
        ORDER BY o_orderstatus, o_orderpriority LIMIT 10""", None),
    # LEAST/GREATEST scalars under aggregation
    "sqlc_least_greatest": ("""
        SELECT round(sum(LEAST(p_retailprice, 1000.0)), 2) AS s_cap,
               max(GREATEST(p_size, 25)) AS m_floor
        FROM part""", None),
    # Druid/Calcite VARCHAR cast names (shim maps bare VARCHAR → STRING)
    "sqlc_varchar_cast": ("""
        SELECT min(LPAD(CAST(n_nationkey AS VARCHAR), 4, '0')) AS mn,
               REPLACE('a-b-c', '-', '+') AS rep,
               TRIM('  pad  ') AS trimmed
        FROM nation""", None),
    # chained CTEs, the second referencing the first
    "sqlc_cte_chained": ("""
        WITH hot AS (SELECT o_custkey, count(*) AS n FROM orders
                     GROUP BY o_custkey HAVING count(*) >= 2),
             tiers AS (SELECT o_custkey, n,
                              CASE WHEN n >= 4 THEN 'hi' ELSE 'mid' END
                              AS tier
                       FROM hot)
        SELECT tier, count(*) AS custs,
               CAST(sum(n) AS BIGINT) AS total_orders
        FROM tiers GROUP BY tier ORDER BY tier""", None),
    # aggregate over a LIMITed ordered subquery
    "sqlc_limit_inner": ("""
        SELECT count(*) AS n, round(sum(price), 2) AS s
        FROM (SELECT o_totalprice AS price FROM orders
              ORDER BY o_totalprice DESC, o_orderkey LIMIT 100) t""", None),
    # CROSS JOIN collapsed to an equi-join by the planner
    "sqlc_cross_join_filter": ("""
        SELECT r.r_name, count(*) AS n
        FROM region r CROSS JOIN nation n
        WHERE r.r_regionkey = n.n_regionkey
        GROUP BY r.r_name ORDER BY r.r_name""", None),
    # ipv6_match prefix semantics (IPv6AddressMatchExprMacro) — oracle
    # states the expected truth values
    "sqlc_ipv6_match": ("""
        SELECT IPV6_MATCH('2001:db8::1', '2001:db8::/32') AS t1,
               IPV6_MATCH('2001:db9::1', '2001:db8::/32') AS f1,
               IPV6_MATCH('fe80::aaaa:bbbb', 'fe80::/10') AS t2,
               IPV6_MATCH('fec0::1', 'fe80::/10') AS f2,
               IPV6_MATCH('::1', '::1/128') AS t3""", """
        SELECT true AS t1, false AS f1, true AS t2, false AS f2,
               true AS t3"""),
    # nested-data constructors (NestedDataExpressions.java): JSON_OBJECT
    # incl. Calcite KEY/VALUE form, JSON_QUERY_ARRAY, JSON_PATHS,
    # PARSE_JSON round-trip; oracle states the exact expected strings
    "sqlc_json_fns": ("""
        SELECT JSON_OBJECT('a', 1, 'b', 'x') AS jo,
               JSON_OBJECT(KEY 'k' VALUE 7) AS jo_kv,
               ARRAY_TO_STRING(
                   JSON_QUERY_ARRAY('{"xs": [1, 2, 3]}', '$.xs'), ',') AS jqa,
               ARRAY_TO_STRING(JSON_PATHS('{"a": 1, "b": 2}'), ',') AS jp,
               TO_JSON_STRING(PARSE_JSON('{"z":  9}')) AS pj""", """
        SELECT '{"a":1,"b":"x"}' AS jo, '{"k":7}' AS jo_kv,
               '1,2,3' AS jqa, '$.a,$.b' AS jp, '{"z":9}' AS pj"""),
    # ORDER BY a CASE expression then a column
    "sqlc_order_by_case": ("""
        SELECT o_orderpriority, count(*) AS n FROM orders
        GROUP BY 1
        ORDER BY CASE WHEN o_orderpriority = '1-URGENT' THEN 0 ELSE 1 END,
                 o_orderpriority""", None),
    # --- batch 3: Calcite time-truncation spellings, integer division,
    # string operator forms, paging — TimeFloorOperatorConversion,
    # CalciteQueryTest testTimeFloor/testOffsetFetch analogs
    "sqlc_floor_to_day": ("""
        SELECT FLOOR(__time TO DAY) AS d, count(*) AS n,
               round(sum(value), 3) AS total
        FROM events GROUP BY 1 ORDER BY 1""", """
        SELECT date_trunc('day', ts)::TIMESTAMP AS d, count(*) AS n,
               round(sum(value), 3) AS total
        FROM events GROUP BY 1 ORDER BY 1"""),
    "sqlc_ceil_to_month": ("""
        SELECT CEIL(__time TO MONTH) AS m, count(*) AS n
        FROM events GROUP BY 1 ORDER BY 1""", """
        SELECT (CASE WHEN date_trunc('month', ts) = ts THEN ts
                ELSE date_trunc('month', ts) + INTERVAL 1 MONTH
                END)::TIMESTAMP AS m, count(*) AS n
        FROM events GROUP BY 1 ORDER BY 1"""),
    "sqlc_date_trunc_fn": ("""
        SELECT DATE_TRUNC('hour', __time) AS h, count(*) AS n
        FROM events GROUP BY 1 ORDER BY 1 LIMIT 24""", """
        SELECT date_trunc('hour', ts)::TIMESTAMP AS h, count(*) AS n
        FROM events GROUP BY 1 ORDER BY 1 LIMIT 24"""),
    "sqlc_ts_literal_filter": ("""
        SELECT count(*) AS n, round(sum(value), 3) AS total
        FROM events
        WHERE __time >= TIMESTAMP '2024-01-05 00:00:00'
          AND __time < TIMESTAMP '2024-01-07 00:00:00'""", """
        SELECT count(*) AS n, round(sum(value), 3) AS total
        FROM events
        WHERE ts >= TIMESTAMP '2024-01-05 00:00:00'
          AND ts < TIMESTAMP '2024-01-07 00:00:00'"""),
    "sqlc_div_mod": ("""
        SELECT DIV(o_orderkey, 1000) AS grp, count(*) AS n,
               CAST(sum(MOD(o_orderkey, 7)) AS BIGINT) AS msum
        FROM orders GROUP BY 1 ORDER BY 1 LIMIT 10""", """
        SELECT o_orderkey // 1000 AS grp, count(*) AS n,
               CAST(sum(o_orderkey % 7) AS BIGINT) AS msum
        FROM orders GROUP BY 1 ORDER BY 1 LIMIT 10"""),
    "sqlc_string_calcite": ("""
        SELECT SUBSTRING(c_name FROM 10 FOR 4) AS mid,
               POSITION('#' IN c_name) AS hashpos,
               c_mktsegment || '/' || CAST(c_nationkey AS VARCHAR) AS tag
        FROM customer ORDER BY c_custkey LIMIT 15""", None),
    "sqlc_trim_forms": ("""
        SELECT TRIM(BOTH '0' FROM SUBSTRING(c_name FROM 10)) AS id_trim,
               TRIM(LEADING 'C' FROM c_mktsegment) AS seg,
               REVERSE(c_mktsegment) AS ges,
               REPEAT(LEFT(c_mktsegment, 2), 2) AS rep
        FROM customer ORDER BY c_custkey LIMIT 15""", None),
    "sqlc_offset_fetch": ("""
        SELECT o_orderkey, o_totalprice FROM orders
        ORDER BY o_orderkey
        OFFSET 5 ROWS FETCH NEXT 10 ROWS ONLY""", """
        SELECT o_orderkey, o_totalprice FROM orders
        ORDER BY o_orderkey LIMIT 10 OFFSET 5"""),
    # PIVOT / UNPIVOT (experimental in the reference —
    # docs/querying/sql.md "PIVOT"; Spark's native clauses carry the
    # same shape, with value-alias column naming)
    "sqlc_pivot": ("""
        SELECT o_orderpriority, ROUND(COALESCE(o, 0), 2) AS open_total,
               ROUND(COALESCE(f, 0), 2) AS done_total
        FROM (SELECT o_orderstatus, o_orderpriority, o_totalprice
              FROM orders)
        PIVOT (SUM(o_totalprice) FOR o_orderstatus IN ('O' AS o, 'F' AS f))
        ORDER BY o_orderpriority""", """
        SELECT o_orderpriority,
               ROUND(COALESCE(sum(o_totalprice)
                 FILTER (o_orderstatus = 'O'), 0), 2) AS open_total,
               ROUND(COALESCE(sum(o_totalprice)
                 FILTER (o_orderstatus = 'F'), 0), 2) AS done_total
        FROM orders GROUP BY 1 ORDER BY 1"""),
    "sqlc_unpivot": ("""
        SELECT n_name, metric, val FROM (
          SELECT n_name, CAST(n_nationkey AS DOUBLE) AS nkey,
                 CAST(n_regionkey AS DOUBLE) AS rkey FROM nation)
        UNPIVOT (val FOR metric IN (nkey, rkey))
        ORDER BY n_name, metric""", """
        SELECT n_name, 'nkey' AS metric, CAST(n_nationkey AS DOUBLE) AS val
        FROM nation
        UNION ALL
        SELECT n_name, 'rkey' AS metric, CAST(n_regionkey AS DOUBLE) AS val
        FROM nation
        ORDER BY n_name, metric"""),
    # theta sketch SQL set-op composition (SketchSetPostAggregator;
    # exact sets in the SQL layer)
    "sqlc_theta_setops": ("""
        SELECT
          THETA_SKETCH_ESTIMATE(THETA_SKETCH_INTERSECT(
            DS_THETA(CASE WHEN event_type = 'click' THEN user_id END),
            DS_THETA(CASE WHEN event_type = 'view' THEN user_id END)))
            AS both_u,
          THETA_SKETCH_ESTIMATE(THETA_SKETCH_UNION(
            DS_THETA(CASE WHEN event_type = 'click' THEN user_id END),
            DS_THETA(CASE WHEN event_type = 'view' THEN user_id END)))
            AS either_u,
          THETA_SKETCH_ESTIMATE(THETA_SKETCH_NOT(
            DS_THETA(CASE WHEN event_type = 'click' THEN user_id END),
            DS_THETA(CASE WHEN event_type = 'view' THEN user_id END)))
            AS click_only
        FROM events""", """
        SELECT
          (SELECT count(*) FROM
            (SELECT DISTINCT user_id FROM events WHERE event_type = 'click'
             INTERSECT
             SELECT DISTINCT user_id FROM events WHERE event_type = 'view') t)
            AS both_u,
          (SELECT count(*) FROM
            (SELECT DISTINCT user_id FROM events WHERE event_type = 'click'
             UNION
             SELECT DISTINCT user_id FROM events WHERE event_type = 'view') t)
            AS either_u,
          (SELECT count(*) FROM
            (SELECT DISTINCT user_id FROM events WHERE event_type = 'click'
             EXCEPT
             SELECT DISTINCT user_id FROM events WHERE event_type = 'view') t)
            AS click_only"""),
    # Datasketches quantile finalizer family (DoublesSketchTo* post-aggs)
    "sqlc_ds_quantile_family": ("""
        SELECT event_type,
          ROUND(DS_GET_QUANTILE(DS_QUANTILES_SKETCH(value), 0.5), 3) AS med,
          ROUND(DS_RANK(DS_QUANTILES_SKETCH(value), 50.0), 4) AS rank50,
          DS_HISTOGRAM(DS_QUANTILES_SKETCH(value), 25.0, 75.0) AS hist
        FROM events GROUP BY 1 ORDER BY 1""", """
        SELECT event_type,
          ROUND(quantile_cont(value, 0.5), 3) AS med,
          ROUND(avg(CASE WHEN value <= 50.0 THEN 1.0 ELSE 0.0 END), 4)
            AS rank50,
          [sum(CASE WHEN value < 25.0 THEN 1.0 ELSE 0.0 END),
           sum(CASE WHEN value >= 25.0 AND value < 75.0 THEN 1.0 ELSE 0.0 END),
           sum(CASE WHEN value >= 75.0 THEN 1.0 ELSE 0.0 END)] AS hist
        FROM events GROUP BY 1 ORDER BY 1"""),
    # MV function family over inline arrays
    # (MultiValueStringOperatorConversions)
    "sqlc_mv_functions": ("""
        SELECT c_custkey,
          ARRAY_TO_STRING(
            MV_FILTER_PREFIX(MV_APPEND(ARRAY(c_mktsegment), c_name), 'B'),
            ',') AS b_vals,
          MV_ORDINAL_OF(ARRAY('AUTOMOBILE', 'BUILDING', 'FURNITURE'),
                        c_mktsegment) AS seg_ord,
          STRLEN(c_name) AS ln
        FROM customer ORDER BY c_custkey LIMIT 20""", """
        SELECT c_custkey,
          NULLIF(array_to_string(
            list_filter(list_append([c_mktsegment], c_name),
                        x -> starts_with(x, 'B')), ','), '') AS b_vals,
          CAST(NULLIF(list_position(['AUTOMOBILE', 'BUILDING', 'FURNITURE'],
                                    c_mktsegment), 0) AS INT) AS seg_ord,
          length(c_name) AS ln
        FROM customer ORDER BY c_custkey LIMIT 20"""),
    # EXTRACT unit matrix incl. units Spark lacks — routed through
    # TIME_EXTRACT (TimestampExtractExprMacro joda semantics:
    # DOW/ISODOW Monday=1..Sunday=7)
    "sqlc_extract_units": ("""
        SELECT EXTRACT(DOW FROM __time) AS dow,
               EXTRACT(ISODOW FROM __time) AS isodow,
               EXTRACT(ISOYEAR FROM __time) AS iy,
               EXTRACT(DECADE FROM __time) AS dec,
               EXTRACT(CENTURY FROM __time) AS cen,
               EXTRACT(MILLENNIUM FROM __time) AS mil,
               min(EXTRACT(EPOCH FROM __time)) AS first_ep,
               count(*) AS n
        FROM events GROUP BY 1, 2, 3, 4, 5, 6 ORDER BY 1""", """
        SELECT isodow(ts) AS dow, isodow(ts) AS isodow,
               isoyear(ts) AS iy, CAST(decade(ts) AS BIGINT) AS dec,
               CAST(century(ts) AS BIGINT) AS cen,
               CAST(millennium(ts) AS BIGINT) AS mil,
               CAST(floor(min(epoch(ts))) AS BIGINT) AS first_ep,
               count(*) AS n
        FROM events GROUP BY 1, 2, 3, 4, 5, 6 ORDER BY 1"""),
    # --- batch 4: CUBE, VALUES, LATERAL, ALL set ops, IGNORE NULLS,
    # ordinal ORDER BY, FILTERed distinct
    "sqlc_cube": ("""
        SELECT o_orderstatus, o_orderpriority, count(*) AS n
        FROM orders
        GROUP BY CUBE (o_orderstatus, o_orderpriority)
        ORDER BY o_orderstatus NULLS FIRST,
                 o_orderpriority NULLS FIRST""", None),
    "sqlc_values_list": ("""
        SELECT t.flag, count(*) AS n
        FROM lineitem l
        JOIN (VALUES ('A', 'ret'), ('N', 'ok'), ('R', 'ret'))
             AS t(code, flag)
          ON l.l_returnflag = t.code
        GROUP BY 1 ORDER BY 1""", None),
    "sqlc_lateral": ("""
        SELECT n.n_name, top_c.c_name
        FROM nation n
        JOIN LATERAL (
          SELECT c_name FROM customer c
          WHERE c.c_nationkey = n.n_nationkey
          ORDER BY c_acctbal DESC, c_custkey LIMIT 1) AS top_c
        ORDER BY n.n_name""", """
        SELECT n.n_name, top_c.c_name
        FROM nation n
        JOIN LATERAL (
          SELECT c_name FROM customer c
          WHERE c.c_nationkey = n.n_nationkey
          ORDER BY c_acctbal DESC, c_custkey LIMIT 1) AS top_c ON true
        ORDER BY n.n_name"""),
    "sqlc_intersect_except_all": ("""
        SELECT count(*) AS n FROM (
          SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
          INTERSECT ALL
          SELECT o_custkey FROM orders WHERE o_orderstatus = 'F') t""", None),
    "sqlc_ignore_nulls_window": ("""
        SELECT o_orderkey,
               LAG(big_price) IGNORE NULLS
                 OVER (ORDER BY o_orderkey) AS prev_big
        FROM (SELECT o_orderkey,
                     CASE WHEN o_totalprice > 300000
                          THEN round(o_totalprice, 2) END AS big_price
              FROM orders WHERE o_orderkey <= 2000)
        ORDER BY o_orderkey LIMIT 50""", """
        SELECT o_orderkey,
               LAG(big_price IGNORE NULLS)
                 OVER (ORDER BY o_orderkey) AS prev_big
        FROM (SELECT o_orderkey,
                     CASE WHEN o_totalprice > 300000
                          THEN round(o_totalprice, 2) END AS big_price
              FROM orders WHERE o_orderkey <= 2000)
        ORDER BY o_orderkey LIMIT 50"""),
    "sqlc_order_by_ordinal": ("""
        SELECT o_orderpriority, count(*) AS n, round(sum(o_totalprice), 2)
                 AS total
        FROM orders GROUP BY 1 ORDER BY 2 DESC, 1 LIMIT 5""", None),
    "sqlc_count_distinct_filter": ("""
        SELECT o_orderstatus,
               count(DISTINCT o_custkey)
                 FILTER (WHERE o_totalprice > 200000) AS big_custs,
               count(DISTINCT o_orderpriority) AS prios
        FROM orders GROUP BY 1 ORDER BY 1""", None),
    # --- batch 5: HAVING subquery, tuple IN, year-month intervals,
    # LIKE ESCAPE, OVERLAY, window-over-aggregate, negative SUBSTRING
    "sqlc_having_subquery": ("""
        SELECT o_custkey, count(*) AS n
        FROM orders GROUP BY 1
        HAVING count(*) > (SELECT count(*) FROM orders)
                          / (SELECT count(DISTINCT o_custkey) FROM orders)
        ORDER BY n DESC, o_custkey LIMIT 10""", None),
    "sqlc_tuple_in_subquery": ("""
        SELECT count(*) AS n FROM lineitem
        WHERE (l_returnflag, l_linestatus) IN
              (SELECT l_returnflag, l_linestatus FROM lineitem
               GROUP BY 1, 2 HAVING count(*) > 100)""", """
        SELECT count(*) AS n FROM lineitem l
        WHERE EXISTS (
          SELECT 1 FROM lineitem g
          WHERE g.l_returnflag = l.l_returnflag
            AND g.l_linestatus = l.l_linestatus
          GROUP BY g.l_returnflag, g.l_linestatus
          HAVING count(*) > 100)"""),
    "sqlc_interval_ym": ("""
        SELECT count(*) AS n,
               min(o_orderdate + INTERVAL '1-2' YEAR TO MONTH) AS shifted
        FROM orders
        WHERE o_orderdate < TIMESTAMP '1994-01-01 00:00:00'""", """
        SELECT count(*) AS n,
               (min(o_orderdate) + INTERVAL 14 MONTH)::TIMESTAMP AS shifted
        FROM orders
        WHERE o_orderdate < TIMESTAMP '1994-01-01 00:00:00'"""),
    "sqlc_like_escape": ("""
        SELECT count(*) AS with_urgent,
               CAST(sum(CASE WHEN o_orderpriority LIKE '%!_URGENT'
                             ESCAPE '!' THEN 1 ELSE 0 END) AS BIGINT)
                 AS underscore_urgent
        FROM orders""", None),
        # THEN 1 ELSE 0 converts to COUNT() FILTER
        # (AggregateCaseToFilterRule) — COUNT is never null, so the
        # zero-match group is 0 and the same-SQL DuckDB oracle holds
    "sqlc_overlay": ("""
        SELECT OVERLAY(c_name PLACING 'XXX' FROM 10 FOR 3) AS masked,
               SUBSTRING(c_name FROM -4) AS tail4
        FROM customer ORDER BY c_custkey LIMIT 10""", """
        SELECT substr(c_name, 1, 9) || 'XXX' || substr(c_name, 13) AS masked,
               substr(c_name, length(c_name) - 3) AS tail4
        FROM customer ORDER BY c_custkey LIMIT 10"""),
    "sqlc_window_over_agg": ("""
        SELECT o_orderpriority, total,
               RANK() OVER (ORDER BY total DESC) AS rnk,
               round(total * 100.0 / sum(total) OVER (), 3) AS pct
        FROM (SELECT o_orderpriority, round(sum(o_totalprice), 2) AS total
              FROM orders GROUP BY 1)
        ORDER BY rnk, o_orderpriority""", None),
    "sqlc_is_distinct_from": ("""
        SELECT count(*) AS diff_pairs,
               CAST(sum(CASE WHEN NULLIF(o_orderstatus, 'P')
                        IS NOT DISTINCT FROM NULLIF(o_orderstatus, 'P')
                        THEN 1 ELSE 0 END) AS BIGINT) AS self_same
        FROM orders
        WHERE o_orderstatus IS DISTINCT FROM o_orderpriority""", None),
    "sqlc_nvl_forms": ("""
        SELECT NVL(NULLIF(o_orderstatus, 'O'), 'open') AS st,
               IFNULL(NULLIF(o_orderpriority, '1-URGENT'), 'urgent') AS pri,
               count(*) AS n
        FROM orders GROUP BY 1, 2 ORDER BY 1, 2""", """
        SELECT COALESCE(NULLIF(o_orderstatus, 'O'), 'open') AS st,
               COALESCE(NULLIF(o_orderpriority, '1-URGENT'), 'urgent') AS pri,
               count(*) AS n
        FROM orders GROUP BY 1, 2 ORDER BY 1, 2"""),
    # --- batch 6: quidem-corpus expansion (sql/src/test/quidem/) biased
    # to the round-2 fragile classes — result-type canonicalization,
    # EXTRACT/INTERVAL variants, window frames, NOT IN + NULL three-
    # valued logic, set-op ALL forms, Druid scalar-fn surface.
    "sqlc_extract_quarter_first_doy": ("""
        SELECT CAST(EXTRACT(QUARTER FROM o_orderdate) AS BIGINT) AS q,
               CAST(min(EXTRACT(DOY FROM o_orderdate)) AS BIGINT) AS first_doy,
               count(*) AS n
        FROM orders GROUP BY 1 ORDER BY 1""", None),
    "sqlc_extract_dow": ("""
        SELECT CAST(EXTRACT(DAYOFWEEK FROM o_orderdate) AS BIGINT) AS dw,
               count(*) AS n
        FROM orders GROUP BY 1 ORDER BY 1""", """
        SELECT CAST(dayofweek(o_orderdate) + 1 AS BIGINT) AS dw,
               count(*) AS n
        FROM orders GROUP BY 1 ORDER BY 1"""),
    "sqlc_extract_epoch": ("""
        SELECT CAST(min(EXTRACT(EPOCH FROM o_orderdate)) AS BIGINT) AS mn,
               CAST(max(EXTRACT(EPOCH FROM o_orderdate)) AS BIGINT) AS mx
        FROM orders""", """
        SELECT CAST(min(epoch(o_orderdate)) AS BIGINT) AS mn,
               CAST(max(epoch(o_orderdate)) AS BIGINT) AS mx
        FROM orders"""),
    "sqlc_interval_year_to_month": ("""
        SELECT count(*) AS n FROM orders
        WHERE o_orderdate + INTERVAL '1-6' YEAR TO MONTH
              < TIMESTAMP '1996-07-01 00:00:00'""", """
        SELECT count(*) AS n FROM orders
        WHERE o_orderdate + INTERVAL 18 MONTH
              < TIMESTAMP '1996-07-01 00:00:00'"""),
    "sqlc_timestampadd_units": ("""
        SELECT TIMESTAMPADD(QUARTER, 2, TIMESTAMP '1995-01-15 00:00:00') AS tq,
               TIMESTAMPADD(WEEK, 3, TIMESTAMP '1995-01-15 00:00:00') AS tw,
               TIMESTAMPADD(HOUR, -5, TIMESTAMP '1995-01-15 12:00:00') AS th""",
     """
        SELECT TIMESTAMP '1995-07-15 00:00:00' AS tq,
               TIMESTAMP '1995-02-05 00:00:00' AS tw,
               TIMESTAMP '1995-01-15 07:00:00' AS th"""),
    "sqlc_timestampdiff_units": ("""
        SELECT TIMESTAMPDIFF(WEEK, TIMESTAMP '1995-01-01 00:00:00',
                             TIMESTAMP '1995-03-01 00:00:00') AS wk,
               TIMESTAMPDIFF(QUARTER, TIMESTAMP '1995-01-01 00:00:00',
                             TIMESTAMP '1996-07-01 00:00:00') AS qt,
               TIMESTAMPDIFF(MINUTE, TIMESTAMP '1995-01-01 00:00:00',
                             TIMESTAMP '1995-01-01 02:30:00') AS mi""", """
        SELECT 8 AS wk, 6 AS qt, 150 AS mi"""),
    "sqlc_window_named": ("""
        SELECT o_orderstatus, o_orderpriority, n,
               RANK() OVER w AS rnk,
               CAST(sum(n) OVER w AS BIGINT) AS running
        FROM (SELECT o_orderstatus, o_orderpriority, count(*) AS n
              FROM orders GROUP BY 1, 2)
        WINDOW w AS (PARTITION BY o_orderstatus ORDER BY n DESC,
                     o_orderpriority)
        ORDER BY o_orderstatus, rnk""", """
        SELECT o_orderstatus, o_orderpriority, n,
               RANK() OVER w AS rnk,
               CAST(sum(n) OVER w AS BIGINT) AS running
        FROM (SELECT o_orderstatus, o_orderpriority, count(*) AS n
              FROM orders GROUP BY 1, 2) t
        WINDOW w AS (PARTITION BY o_orderstatus ORDER BY n DESC,
                     o_orderpriority)
        ORDER BY o_orderstatus, rnk"""),
    "sqlc_window_rows_between": ("""
        SELECT o_orderpriority, n,
               CAST(sum(n) OVER (ORDER BY o_orderpriority
                    ROWS BETWEEN 2 PRECEDING AND 1 FOLLOWING)
                    AS BIGINT) AS neighborhood
        FROM (SELECT o_orderpriority, count(*) AS n FROM orders GROUP BY 1)
        ORDER BY o_orderpriority""", """
        SELECT o_orderpriority, n,
               CAST(sum(n) OVER (ORDER BY o_orderpriority
                    ROWS BETWEEN 2 PRECEDING AND 1 FOLLOWING)
                    AS BIGINT) AS neighborhood
        FROM (SELECT o_orderpriority, count(*) AS n FROM orders GROUP BY 1) t
        ORDER BY o_orderpriority"""),
    "sqlc_window_range_value": ("""
        SELECT n_regionkey, n_nationkey,
               count(*) OVER (PARTITION BY n_regionkey ORDER BY n_nationkey
                    RANGE BETWEEN 5 PRECEDING AND CURRENT ROW) AS near
        FROM nation ORDER BY n_regionkey, n_nationkey""", None),
    "sqlc_rank_over_agg": ("""
        SELECT o_orderstatus, RANK() OVER (ORDER BY count(*) DESC) AS rnk,
               count(*) AS n
        FROM orders GROUP BY o_orderstatus ORDER BY rnk, o_orderstatus""",
     None),
    "sqlc_first_last_value": ("""
        SELECT o_orderpriority, n,
               first_value(o_orderpriority) OVER w AS top_pri,
               last_value(o_orderpriority) OVER w AS bottom_pri
        FROM (SELECT o_orderpriority, count(*) AS n FROM orders GROUP BY 1)
        WINDOW w AS (ORDER BY n DESC, o_orderpriority
                     ROWS BETWEEN UNBOUNDED PRECEDING
                     AND UNBOUNDED FOLLOWING)
        ORDER BY o_orderpriority""", """
        SELECT o_orderpriority, n,
               first_value(o_orderpriority) OVER w AS top_pri,
               last_value(o_orderpriority) OVER w AS bottom_pri
        FROM (SELECT o_orderpriority, count(*) AS n FROM orders GROUP BY 1) t
        WINDOW w AS (ORDER BY n DESC, o_orderpriority
                     ROWS BETWEEN UNBOUNDED PRECEDING
                     AND UNBOUNDED FOLLOWING)
        ORDER BY o_orderpriority"""),
    "sqlc_nth_cume": ("""
        SELECT n_name,
               NTH_VALUE(n_name, 2) OVER w AS second_name,
               round(CUME_DIST() OVER (ORDER BY n_name), 4) AS cd
        FROM nation WHERE n_regionkey = 2
        WINDOW w AS (ORDER BY n_name ROWS BETWEEN UNBOUNDED PRECEDING
                     AND UNBOUNDED FOLLOWING)
        ORDER BY n_name""", """
        SELECT n_name,
               NTH_VALUE(n_name, 2) OVER w AS second_name,
               round(CUME_DIST() OVER (ORDER BY n_name), 4) AS cd
        FROM nation WHERE n_regionkey = 2
        WINDOW w AS (ORDER BY n_name ROWS BETWEEN UNBOUNDED PRECEDING
                     AND UNBOUNDED FOLLOWING)
        ORDER BY n_name"""),
    "sqlc_lag_default": ("""
        SELECT n_nationkey,
               LAG(n_nationkey, 2, -1) OVER (ORDER BY n_nationkey) AS lag2,
               LEAD(n_nationkey, 3, -1) OVER (ORDER BY n_nationkey) AS lead3
        FROM nation ORDER BY n_nationkey""", None),
    "sqlc_not_in_null_corr": ("""
        SELECT count(*) AS n FROM nation
        WHERE n_regionkey NOT IN
              (SELECT CASE WHEN r_regionkey = 0 THEN NULL
                      ELSE r_regionkey END FROM region)""", None),
    "sqlc_in_with_null_rows": ("""
        SELECT count(*) AS n FROM nation
        WHERE n_regionkey IN
              (SELECT CASE WHEN r_regionkey = 0 THEN NULL
                      ELSE r_regionkey END FROM region)""", None),
    "sqlc_union_type_coerce": ("""
        SELECT round(v, 2) AS v FROM (
          SELECT CAST(max(o_orderkey) AS DOUBLE) AS v FROM orders
          UNION ALL
          SELECT max(o_totalprice) AS v FROM orders) u
        ORDER BY v""", None),
    "sqlc_values_table": ("""
        SELECT id, s FROM (VALUES (1, 'a'), (2, 'b'), (3, 'c')) AS t(id, s)
        WHERE id <> 2 ORDER BY id""", None),
    "sqlc_join_using": ("""
        SELECT rk, count(*) AS n, min(r_name) AS rname
        FROM (SELECT n_regionkey AS rk, n_name FROM nation) a
        JOIN (SELECT r_regionkey AS rk, r_name FROM region) b USING (rk)
        GROUP BY rk ORDER BY rk""", None),
    "sqlc_full_outer_coalesce": ("""
        SELECT COALESCE(a.st, b.st) AS st,
               COALESCE(a.n, 0) + COALESCE(b.n, 0) AS total
        FROM (SELECT o_orderstatus AS st, count(*) AS n FROM orders
              WHERE o_totalprice > 300000 GROUP BY 1) a
        FULL OUTER JOIN
             (SELECT o_orderstatus AS st, count(*) AS n FROM orders
              WHERE o_orderpriority = '5-LOW' GROUP BY 1) b
        ON a.st = b.st
        ORDER BY st""", None),
    "sqlc_grouping_fn": ("""
        SELECT o_orderstatus, o_orderpriority,
               CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_st,
               CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_pri,
               count(*) AS n
        FROM orders
        GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
        ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""",
     None),
    "sqlc_not_like_escape": ("""
        SELECT count(*) AS n FROM part
        WHERE p_type LIKE '%BRASS' AND p_name NOT LIKE '%!%%' ESCAPE '!'""",
     None),
    # engine SAFE_DIVIDE is always DOUBLE (see register.py deviation
    # note; Spark int/int division is double, unlike the reference's
    # long-division arm)
    "sqlc_safe_divide": ("""
        SELECT SAFE_DIVIDE(10, 4) AS q1, SAFE_DIVIDE(10, 0) AS q2,
               SAFE_DIVIDE(9.0, 4.5) AS q3""", """
        SELECT 2.5 AS q1, CAST(NULL AS DOUBLE) AS q2, 2.0 AS q3"""),
    "sqlc_div_zero_null": ("""
        SELECT 10 / 0 AS d, 10 % 0 AS m""", """
        SELECT CAST(NULL AS DOUBLE) AS d, CAST(NULL AS INT) AS m"""),
    "sqlc_string_agg": ("""
        SELECT n_regionkey,
               STRING_AGG(n_name, ',') WITHIN GROUP (ORDER BY n_name) AS names
        FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""", """
        SELECT n_regionkey,
               string_agg(n_name, ',' ORDER BY n_name) AS names
        FROM nation GROUP BY n_regionkey ORDER BY n_regionkey"""),
    "sqlc_array_position_fns": ("""
        SELECT ARRAY_OFFSET(ARRAY['a','b','c'], 1) AS off1,
               ARRAY_ORDINAL(ARRAY['a','b','c'], 1) AS ord1,
               ARRAY_OFFSET_OF(ARRAY['a','b','c'], 'c') AS offc,
               ARRAY_ORDINAL_OF(ARRAY['a','b','c'], 'c') AS ordc,
               ARRAY_OVERLAP(ARRAY['a','b'], ARRAY['b','z']) AS ovl,
               ARRAY_TO_STRING(ARRAY_SLICE(ARRAY[1,2,3,4], 1, 3), ',')
                 AS sliced""", """
        SELECT 'b' AS off1, 'a' AS ord1, 2 AS offc, 3 AS ordc,
               true AS ovl, '2,3' AS sliced"""),
    "sqlc_mv_string_roundtrip": ("""
        SELECT MV_TO_STRING(STRING_TO_MV('x|y|z', '\|'), '-') AS joined,
               MV_LENGTH(STRING_TO_MV('a,b,c', ',')) AS n,
               MV_CONTAINS(STRING_TO_MV('a,b', ','), 'a') AS has_a""", """
        SELECT 'x-y-z' AS joined, 3 AS n, true AS has_a"""),
    "sqlc_case_null_branch": ("""
        SELECT o_orderstatus,
               CAST(sum(CASE WHEN o_totalprice > 250000 THEN 1 END)
                    AS BIGINT) AS hits,
               count(CASE WHEN o_totalprice > 250000 THEN 1 END) AS nn
        FROM orders GROUP BY 1 ORDER BY 1""", None),
    "sqlc_order_by_ordinal_limit": ("""
        SELECT o_orderpriority, count(*) AS n
        FROM orders GROUP BY 1 ORDER BY 2 DESC, 1 LIMIT 3""", None),
    "sqlc_distinct_order": ("""
        SELECT DISTINCT o_orderstatus FROM orders ORDER BY 1""", None),
    "sqlc_exists_having": ("""
        SELECT r_name FROM region r
        WHERE EXISTS (SELECT n_regionkey FROM nation n
                      WHERE n.n_regionkey = r.r_regionkey
                      GROUP BY n_regionkey HAVING count(*) >= 5)
        ORDER BY r_name""", None),
    "sqlc_time_in_interval": ("""
        SELECT count(*) AS n, round(sum(value), 3) AS total FROM events
        WHERE TIME_IN_INTERVAL(__time,
                               '2024-01-03T00:00:00/2024-01-06T00:00:00')""",
     """
        SELECT count(*) AS n, round(sum(value), 3) AS total FROM events
        WHERE ts >= TIMESTAMP '2024-01-03 00:00:00'
          AND ts < TIMESTAMP '2024-01-06 00:00:00'"""),
    "sqlc_time_extract_offset_tz": ("""
        SELECT TIME_EXTRACT(__time, 'HOUR', '+05:30') AS h, count(*) AS n
        FROM events GROUP BY 1 ORDER BY 1""", """
        SELECT CAST(EXTRACT(HOUR FROM ts + INTERVAL 330 MINUTE) AS BIGINT)
                 AS h, count(*) AS n
        FROM events GROUP BY 1 ORDER BY 1"""),
    "sqlc_time_format_pattern": ("""
        SELECT TIME_FORMAT(__time, 'yyyy-MM-dd HH') AS bucket,
               count(*) AS n
        FROM events GROUP BY 1 ORDER BY 1 LIMIT 30""", """
        SELECT strftime(ts, '%Y-%m-%d %H') AS bucket, count(*) AS n
        FROM events GROUP BY 1 ORDER BY 1 LIMIT 30"""),
    "sqlc_parse_long_radix": ("""
        SELECT PARSE_LONG('ff', 16) AS hex_ff, PARSE_LONG('-42') AS neg,
               PARSE_LONG('777', 8) AS oct""", """
        SELECT 255 AS hex_ff, -42 AS neg, 511 AS oct"""),
    "sqlc_human_readable_fmt": ("""
        SELECT HUMAN_READABLE_BINARY_BYTE_FORMAT(1536) AS kib,
               HUMAN_READABLE_DECIMAL_BYTE_FORMAT(1500000) AS mb,
               HUMAN_READABLE_DECIMAL_FORMAT(1234567) AS m""", """
        SELECT '1.50 KiB' AS kib, '1.50 MB' AS mb, '1.23 M' AS m"""),
    "sqlc_bitwise_fns": ("""
        SELECT BITWISE_AND(12, 10) AS b_and, BITWISE_OR(12, 10) AS b_or,
               BITWISE_XOR(12, 10) AS b_xor,
               BITWISE_SHIFT_LEFT(3, 2) AS shl,
               BITWISE_SHIFT_RIGHT(12, 2) AS shr""", """
        SELECT 8 AS b_and, 14 AS b_or, 6 AS b_xor, 12 AS shl, 3 AS shr"""),
    "sqlc_decode_base64": ("""
        SELECT DECODE_BASE64_UTF8('aGVsbG8=') AS s, STRLEN('héllo') AS n,
               TEXTCAT('ab', 'cd') AS cat""", """
        SELECT 'hello' AS s, 5 AS n, 'abcd' AS cat"""),
    "sqlc_intersect_all": ("""
        SELECT n_regionkey FROM nation WHERE n_nationkey < 15
        INTERSECT ALL
        SELECT n_regionkey FROM nation WHERE n_nationkey >= 5
        ORDER BY n_regionkey""", None),
    "sqlc_except_all": ("""
        SELECT n_regionkey FROM nation
        EXCEPT ALL
        SELECT n_regionkey FROM nation WHERE n_nationkey < 10
        ORDER BY n_regionkey""", None),
    "sqlc_coalesce_type_promote": ("""
        SELECT COALESCE(NULL, 1.5) AS a, COALESCE(NULL, NULL, 7) AS b,
               round(COALESCE(CAST(NULL AS DOUBLE), 2), 1) AS c""", None),
    "sqlc_group_by_case_expr": ("""
        SELECT CASE WHEN o_totalprice < 100000 THEN 'low'
                    WHEN o_totalprice < 250000 THEN 'mid'
                    ELSE 'high' END AS band,
               count(*) AS n, round(avg(o_totalprice), 2) AS avg_price
        FROM orders GROUP BY 1 ORDER BY 1""", None),
    "sqlc_nullif_div_guard": ("""
        SELECT o_orderstatus,
               round(sum(o_totalprice) /
                     NULLIF(count(CASE WHEN o_orderpriority = '1-URGENT'
                                       THEN 1 END), 0), 2) AS per_urgent
        FROM orders GROUP BY 1 ORDER BY 1""", None),
    # --- batch 7: function-surface matrix (math/string/regexp/MV/
    # TIME_*), UNNEST SQL, sorted ARRAY_AGG, window NULL ordering —
    # CalciteQueryTest testExpressions* / quidem expression files.
    "sqlc_math_matrix": ("""
        SELECT round(LN(EXP(2.0)), 9) AS ln_exp,
               round(LOG10(1000.0), 9) AS lg,
               round(POWER(2, 10), 1) AS pw,
               round(SQRT(2.0), 9) AS sq,
               ABS(-7) AS ab, CAST(SIGN(-3.5) AS BIGINT) AS sg,
               MOD(17, 5) AS md""", None),
    "sqlc_trig_matrix": ("""
        SELECT round(SIN(0.5), 9) AS s, round(COS(0.5), 9) AS c,
               round(TAN(0.5), 9) AS t,
               round(ATAN2(1.0, 1.0), 9) AS a2,
               round(DEGREES(PI()), 6) AS dg,
               round(RADIANS(180.0), 9) AS rd""", None),
    "sqlc_round_negative_digits": ("""
        SELECT ROUND(12345.678, -2) AS r_neg,
               ROUND(12345.678, 1) AS r_pos,
               FLOOR(-2.5) AS fl, CEIL(-2.5) AS ce,
               TRUNCATE(12345.678, -2) AS tr""", """
        SELECT 12300.0 AS r_neg, 12345.7 AS r_pos,
               -3.0 AS fl, -2.0 AS ce, 12300.0 AS tr"""),
    "sqlc_string_matrix": ("""
        SELECT LPAD(CAST(o_custkey AS VARCHAR), 8, '*') AS padded,
               RPAD('ab', 5, 'xy') AS rpadded,
               LEFT(o_orderpriority, 1) AS lft,
               RIGHT(o_orderpriority, 3) AS rgt,
               CHAR_LENGTH(o_orderpriority) AS cl
        FROM orders ORDER BY o_orderkey LIMIT 5""", """
        SELECT LPAD(CAST(o_custkey AS VARCHAR), 8, '*') AS padded,
               RPAD('ab', 5, 'xy') AS rpadded,
               LEFT(o_orderpriority, 1) AS lft,
               RIGHT(o_orderpriority, 3) AS rgt,
               length(o_orderpriority) AS cl
        FROM orders ORDER BY o_orderkey LIMIT 5"""),
    "sqlc_regexp_replace_extract": ("""
        SELECT REGEXP_REPLACE(c_name, '[0-9]+', '#') AS anon,
               REGEXP_EXTRACT(c_name, '([0-9]+)', 1) AS digits
        FROM customer ORDER BY c_custkey LIMIT 10""", """
        SELECT regexp_replace(c_name, '[0-9]+', '#', 'g') AS anon,
               regexp_extract(c_name, '([0-9]+)', 1) AS digits
        FROM customer ORDER BY c_custkey LIMIT 10"""),
    "sqlc_mv_slice_family": ("""
        SELECT MV_TO_STRING(MV_SLICE(STRING_TO_MV('a,b,c,d', ','), 1, 3),
                            '-') AS sliced,
               MV_TO_STRING(MV_APPEND(STRING_TO_MV('a,b', ','), 'z'),
                            '-') AS appended,
               MV_TO_STRING(MV_PREPEND('z', STRING_TO_MV('a,b', ',')),
                            '-') AS prepended,
               MV_TO_STRING(MV_CONCAT(STRING_TO_MV('a', ','),
                                      STRING_TO_MV('b', ',')),
                            '-') AS concatted,
               MV_OFFSET(STRING_TO_MV('a,b,c', ','), 2) AS off2""", """
        SELECT 'b-c' AS sliced, 'a-b-z' AS appended, 'z-a-b' AS prepended,
               'a-b' AS concatted, 'c' AS off2"""),
    "sqlc_ipv4_fns": ("""
        SELECT IPV4_MATCH('192.168.1.7', '192.168.0.0/16') AS t1,
               IPV4_MATCH('10.0.0.1', '192.168.0.0/16') AS f1,
               IPV4_PARSE('0.0.1.0') AS parsed,
               IPV4_STRINGIFY(256) AS strd""", """
        SELECT true AS t1, false AS f1, 256 AS parsed,
               '0.0.1.0' AS strd"""),
    "sqlc_time_ceil_shift": ("""
        SELECT TIME_CEIL(TIMESTAMP '2024-01-05 10:30:00', 'PT1H') AS ceil_h,
               TIME_SHIFT(TIMESTAMP '2024-01-05 10:30:00', 'P1M', 2)
                 AS shift_2mo,
               TIME_FLOOR(TIMESTAMP '2024-01-05 10:30:00', 'P1W') AS floor_w
        """, """
        SELECT TIMESTAMP '2024-01-05 11:00:00' AS ceil_h,
               TIMESTAMP '2024-03-05 10:30:00' AS shift_2mo,
               TIMESTAMP '2024-01-01 00:00:00' AS floor_w"""),
    "sqlc_time_parse_millis": ("""
        SELECT TIMESTAMP_TO_MILLIS(TIME_PARSE('2024-01-05T10:30:00Z'))
                 AS ms,
               MILLIS_TO_TIMESTAMP(1704450600000) AS ts_back""", """
        SELECT 1704450600000 AS ms,
               TIMESTAMP '2024-01-05 10:30:00' AS ts_back"""),
    "sqlc_array_agg_sorted": ("""
        SELECT n_regionkey,
               ARRAY_TO_STRING(ARRAY_SORT(ARRAY_AGG(n_name)), '|') AS names
        FROM nation WHERE n_nationkey < 10
        GROUP BY n_regionkey ORDER BY n_regionkey""", """
        SELECT n_regionkey,
               array_to_string(list_sort(list(n_name)), '|') AS names
        FROM nation WHERE n_nationkey < 10
        GROUP BY n_regionkey ORDER BY n_regionkey"""),
    "sqlc_unnest_sql": ("""
        SELECT u.tok, count(*) AS n
        FROM customer CROSS JOIN UNNEST(STRING_TO_MV(c_name, '#')) AS u(tok)
        WHERE c_custkey <= 20
        GROUP BY 1 ORDER BY 2 DESC, 1 LIMIT 5""", """
        SELECT u.tok, count(*) AS n
        FROM customer, unnest(string_split(c_name, '#')) AS u(tok)
        WHERE c_custkey <= 20
        GROUP BY 1 ORDER BY 2 DESC, 1 LIMIT 5"""),
    "sqlc_window_nulls_order": ("""
        SELECT st, n,
               RANK() OVER (ORDER BY st NULLS FIRST) AS rnk_nf,
               RANK() OVER (ORDER BY st DESC NULLS LAST) AS rnk_dnl
        FROM (SELECT NULLIF(o_orderstatus, 'P') AS st, count(*) AS n
              FROM orders GROUP BY 1)
        ORDER BY rnk_nf""", """
        SELECT st, n,
               RANK() OVER (ORDER BY st NULLS FIRST) AS rnk_nf,
               RANK() OVER (ORDER BY st DESC NULLS LAST) AS rnk_dnl
        FROM (SELECT NULLIF(o_orderstatus, 'P') AS st, count(*) AS n
              FROM orders GROUP BY 1) t
        ORDER BY rnk_nf"""),
    "sqlc_concat_null_prop": ("""
        SELECT CONCAT('a', CAST(NULL AS VARCHAR), 'b') AS c_null,
               'x' || CAST(NULL AS VARCHAR) AS pipe_null,
               CONCAT('p', 'q', 'r') AS c_ok""", """
        SELECT CAST(NULL AS VARCHAR) AS c_null,
               CAST(NULL AS VARCHAR) AS pipe_null, 'pqr' AS c_ok"""),
    "sqlc_substring_edge": ("""
        SELECT SUBSTRING('abcdef', 2) AS tail_from_2,
               SUBSTRING('abcdef', 2, 3) AS mid,
               SUBSTRING('abcdef', -2) AS last_two,
               SUBSTRING('abc', 10) AS past_end""", """
        SELECT 'bcdef' AS tail_from_2, 'bcd' AS mid,
               'ef' AS last_two,
               CAST(NULL AS VARCHAR) AS past_end"""),
        # SubstringDimExtractionFn: start past the end -> NULL
    "sqlc_position_from": ("""
        SELECT POSITION('c' IN 'abcabc') AS p1,
               POSITION('c' IN 'abcabc' FROM 4) AS p2,
               POSITION('z' IN 'abcabc') AS p0""", """
        SELECT 3 AS p1, 6 AS p2, 0 AS p0"""),
    "sqlc_agg_expr_combo": ("""
        SELECT o_orderstatus,
               round(sum(o_totalprice) / count(*), 2) AS manual_avg,
               round(avg(o_totalprice), 2) AS builtin_avg,
               CAST(count(DISTINCT o_orderpriority) AS BIGINT) AS pri_card
        FROM orders GROUP BY 1 ORDER BY 1""", None),
    "sqlc_correlated_agg_coalesce": ("""
        SELECT r_name,
               COALESCE((SELECT CAST(count(*) AS BIGINT) FROM nation n
                         WHERE n.n_regionkey = r.r_regionkey
                           AND n.n_nationkey > 20), 0) AS big_nations
        FROM region r ORDER BY r_name""", None),
    "sqlc_nested_case_agg": ("""
        SELECT CASE WHEN grp = 'big' THEN 'B' ELSE 'S' END AS g2,
               CAST(sum(n) AS BIGINT) AS total
        FROM (SELECT CASE WHEN o_totalprice > 200000 THEN 'big'
                     ELSE 'small' END AS grp, count(*) AS n
              FROM orders GROUP BY 1) t
        GROUP BY 1 ORDER BY 1""", None),
    "sqlc_having_multi_cond": ("""
        SELECT o_custkey, count(*) AS n,
               round(sum(o_totalprice), 2) AS tot
        FROM orders GROUP BY 1
        HAVING count(*) >= 20 AND sum(o_totalprice) > 2000000
        ORDER BY n DESC, o_custkey LIMIT 10""", None),
    "sqlc_distinct_in_expr": ("""
        SELECT CAST(count(DISTINCT EXTRACT(YEAR FROM o_orderdate))
                    AS BIGINT) AS years,
               CAST(count(DISTINCT o_orderstatus) AS BIGINT) AS sts
        FROM orders""", None),
    "sqlc_cast_decimal_round": ("""
        SELECT CAST(ROUND(o_totalprice, 0) AS BIGINT) AS p_round,
               count(*) AS n
        FROM orders WHERE o_orderkey <= 40
        GROUP BY 1 ORDER BY 1""", None),
    "sqlc_boolean_agg_expr": ("""
        SELECT CAST(sum(CASE WHEN o_totalprice > 150000 AND
                                  o_orderstatus = 'O' THEN 1 ELSE 0 END)
                    AS BIGINT) AS both_n,
               CAST(sum(CASE WHEN o_totalprice > 150000 OR
                                  o_orderstatus = 'O' THEN 1 ELSE 0 END)
                    AS BIGINT) AS either_n
        FROM orders""", None),
    # --- batch 8: aggregate SQL spellings (EARLIEST/LATEST, stats,
    # bit aggs, APPROX_* exact-mode contracts), TRY_CAST, interval
    # arithmetic forms, NULL-element IN lists.
    # LATEST_BY over the time column itself: ties in __time make a
    # value-column LATEST_BY nondeterministic (both engines pick an
    # arbitrary winner), but max_by(ts, ts) is the deterministic max —
    # still exercises the EARLIEST_BY/LATEST_BY -> MIN_BY/MAX_BY rewrite
    "sqlc_earliest_latest": ("""
        SELECT l_returnflag,
               EARLIEST(l_shipdate) AS first_ship,
               LATEST(l_shipdate) AS last_ship,
               EARLIEST_BY(l_shipdate, __time) AS first_by,
               LATEST_BY(l_shipdate, __time) AS last_by
        FROM lineitem GROUP BY 1 ORDER BY 1""", """
        SELECT l_returnflag,
               min(l_shipdate) AS first_ship,
               max(l_shipdate) AS last_ship,
               min(l_shipdate) AS first_by,
               max(l_shipdate) AS last_by
        FROM lineitem GROUP BY 1 ORDER BY 1"""),
    "sqlc_stats_aggs": ("""
        SELECT o_orderstatus,
               round(STDDEV_POP(o_totalprice), 4) AS sd_pop,
               round(STDDEV_SAMP(o_totalprice), 4) AS sd_samp,
               round(VAR_POP(o_totalprice), 2) AS v_pop,
               round(VAR_SAMP(o_totalprice), 2) AS v_samp
        FROM orders GROUP BY 1 ORDER BY 1""", None),
    # BIT_AND folds from an initial accumulator of 0 in the reference
    # (BitwiseSqlAggregator.java init "0") — any non-empty group is 0
    "sqlc_bit_aggs": ("""
        SELECT BIT_AND(n_nationkey) AS ba, BIT_OR(n_nationkey) AS bo,
               BIT_XOR(n_nationkey) AS bx
        FROM nation WHERE n_nationkey IN (12, 13, 14)""", """
        SELECT 0 AS ba, 15 AS bo, 15 AS bx"""),
    "sqlc_approx_count_exact_mode": ("""
        SELECT o_orderstatus,
               APPROX_COUNT_DISTINCT(o_orderpriority) AS pri_card
        FROM orders GROUP BY 1 ORDER BY 1""", """
        SELECT o_orderstatus,
               count(DISTINCT o_orderpriority) AS pri_card
        FROM orders GROUP BY 1 ORDER BY 1"""),
    "sqlc_approx_quantile_exact_mode": ("""
        SELECT l_returnflag,
               round(APPROX_QUANTILE(l_quantity, 0.5), 1) AS med_qty
        FROM lineitem GROUP BY 1 ORDER BY 1""", """
        SELECT l_returnflag,
               round(quantile_cont(l_quantity, 0.5), 1) AS med_qty
        FROM lineitem GROUP BY 1 ORDER BY 1"""),
    "sqlc_try_cast": ("""
        SELECT TRY_CAST('42' AS BIGINT) AS ok,
               TRY_CAST('nope' AS BIGINT) AS bad,
               TRY_CAST('2024-02-30' AS DATE) AS bad_date""", None),
    "sqlc_interval_multiply": ("""
        SELECT count(*) AS n FROM orders
        WHERE o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
              - INTERVAL '1' DAY * 90""", """
        SELECT count(*) AS n FROM orders
        WHERE o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
              - INTERVAL 1 DAY * 90"""),
    "sqlc_in_list_null_element": ("""
        SELECT count(*) AS matched,
               CAST(sum(CASE WHEN o_orderstatus NOT IN ('Z', 'Y')
                        THEN 1 ELSE 0 END) AS BIGINT) AS not_in_ok
        FROM orders WHERE o_orderstatus IN ('O', 'F')""", None),
    "sqlc_div_negative_trunc": ("""
        SELECT DIV(-7, 2) AS d1, DIV(7, -2) AS d2, MOD(-7, 2) AS m1""", """
        SELECT -3 AS d1, -3 AS d2, -1 AS m1"""),
    "sqlc_least_greatest_types": ("""
        SELECT LEAST(CAST(3 AS DOUBLE), 2.5) AS l,
               GREATEST(CAST(1 AS DOUBLE), 4.5, 2.0) AS g""", None),
    "sqlc_between_not_between": ("""
        SELECT CAST(sum(CASE WHEN o_totalprice BETWEEN 100000 AND 200000
                        THEN 1 ELSE 0 END) AS BIGINT) AS in_band,
               CAST(sum(CASE WHEN o_totalprice NOT BETWEEN 100000
                                  AND 200000
                        THEN 1 ELSE 0 END) AS BIGINT) AS out_band,
               count(*) AS n
        FROM orders""", None),
    "sqlc_group_by_all_dims": ("""
        SELECT o_orderstatus, o_orderpriority,
               EXTRACT(YEAR FROM o_orderdate) AS y, count(*) AS n
        FROM orders
        WHERE o_orderkey <= 500
        GROUP BY o_orderstatus, o_orderpriority, 3
        ORDER BY 1, 2, 3""", None),
    # --- batch 9: query-shape patterns (CalciteSubQueryTest /
    # CalciteJoinQueryTest analogs): correlated HAVING, rank-filter
    # (QUALIFY pattern), expression joins, quantified-ish predicates,
    # empty-group and LIMIT 0 edges.
    "sqlc_having_correlated": ("""
        SELECT o_custkey, count(*) AS n FROM orders o
        GROUP BY o_custkey
        HAVING count(*) > (SELECT avg(cnt) * 2 FROM
                           (SELECT count(*) AS cnt FROM orders
                            GROUP BY o_custkey) t)
        ORDER BY n DESC, o_custkey LIMIT 10""", None),
    "sqlc_rank_filter_pattern": ("""
        SELECT o_orderstatus, o_orderpriority, n FROM (
          SELECT o_orderstatus, o_orderpriority, count(*) AS n,
                 ROW_NUMBER() OVER (PARTITION BY o_orderstatus
                                    ORDER BY count(*) DESC,
                                             o_orderpriority) AS rn
          FROM orders GROUP BY 1, 2) t
        WHERE rn = 1 ORDER BY o_orderstatus""", None),
    "sqlc_join_on_expression": ("""
        SELECT CAST(EXTRACT(YEAR FROM o.o_orderdate) AS BIGINT) AS y,
               count(*) AS n
        FROM orders o JOIN lineitem l
          ON l.l_orderkey = o.o_orderkey
         AND EXTRACT(YEAR FROM l.l_shipdate) =
             EXTRACT(YEAR FROM o.o_orderdate)
        GROUP BY 1 ORDER BY 1""", None),
    "sqlc_exists_not_exists_combo": ("""
        SELECT count(*) AS n FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey)
          AND NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey
                            AND o.o_totalprice > 400000)""", None),
    "sqlc_in_expression_key": ("""
        SELECT count(*) AS n FROM orders
        WHERE MOD(o_orderkey, 100) IN
              (SELECT n_nationkey FROM nation WHERE n_regionkey = 2)""",
     None),
    "sqlc_union_order_overall": ("""
        SELECT * FROM (
          SELECT 'lo' AS band, count(*) AS n FROM orders
          WHERE o_totalprice < 100000
          UNION ALL
          SELECT 'mid' AS band, count(*) AS n FROM orders
          WHERE o_totalprice >= 100000 AND o_totalprice < 250000
          UNION ALL
          SELECT 'hi' AS band, count(*) AS n FROM orders
          WHERE o_totalprice >= 250000) u
        ORDER BY n DESC, band""", None),
    "sqlc_count_col_vs_star": ("""
        SELECT count(*) AS n_star,
               count(NULLIF(o_orderstatus, 'P')) AS n_col,
               count(DISTINCT NULLIF(o_orderstatus, 'P')) AS n_dist
        FROM orders""", None),
    "sqlc_date_literal_cast": ("""
        SELECT count(*) AS n,
               CAST(min(CAST(o_orderdate AS DATE)) AS VARCHAR) AS first_d
        FROM orders
        WHERE CAST(o_orderdate AS DATE) >= DATE '1996-01-01'
          AND CAST(o_orderdate AS DATE) < DATE '1996-02-01'""", None),
    "sqlc_group_by_empty": ("""
        SELECT count(*) AS n, round(sum(o_totalprice), 2) AS s
        FROM orders GROUP BY GROUPING SETS (())""", """
        SELECT count(*) AS n, round(sum(o_totalprice), 2) AS s
        FROM orders"""),
    "sqlc_scalar_compare_where": ("""
        SELECT count(*) AS n FROM orders
        WHERE o_totalprice > (SELECT avg(o_totalprice) * 1.5
                              FROM orders)""", None),
    "sqlc_limit_zero": ("""
        SELECT o_orderkey, o_totalprice FROM orders
        ORDER BY o_orderkey LIMIT 0""", None),
    "sqlc_where_false_schema": ("""
        SELECT o_orderkey, o_orderstatus FROM orders WHERE 1 = 0""", None),
    "sqlc_cte_window_chain": ("""
        WITH pri AS (SELECT o_orderpriority, count(*) AS n
                     FROM orders GROUP BY 1),
             ranked AS (SELECT o_orderpriority, n,
                               RANK() OVER (ORDER BY n DESC,
                                            o_orderpriority) AS r
                        FROM pri)
        SELECT o_orderpriority, n, r FROM ranked
        WHERE r <= 3 ORDER BY r""", None),
    "sqlc_union_in_subquery": ("""
        SELECT count(*) AS n FROM nation
        WHERE n_regionkey IN (SELECT r_regionkey FROM region
                              WHERE r_name = 'ASIA'
                              UNION
                              SELECT r_regionkey FROM region
                              WHERE r_name = 'EUROPE')""", None),
    "sqlc_order_by_alias_expr": ("""
        SELECT o_orderpriority, count(*) AS total
        FROM orders GROUP BY 1
        ORDER BY total DESC, o_orderpriority LIMIT 4""", None),
    "sqlc_avg_int_is_double": ("""
        SELECT o_orderstatus,
               round(avg(CAST(o_custkey AS DOUBLE)), 4) AS avg_cust
        FROM orders GROUP BY 1 ORDER BY 1""", None),
    # --- batch 10: time-range window frames, pattern TIME_PARSE,
    # non-ANSI cast truncation, literal/operator edges.
    "sqlc_window_time_range": ("""
        SELECT d, n,
               CAST(sum(n) OVER (ORDER BY d
                    RANGE BETWEEN INTERVAL '2' DAY PRECEDING
                    AND CURRENT ROW) AS BIGINT) AS moving_3d
        FROM (SELECT FLOOR(__time TO DAY) AS d, count(*) AS n
              FROM events GROUP BY 1)
        ORDER BY d""", """
        SELECT d, n,
               CAST(sum(n) OVER (ORDER BY d
                    RANGE BETWEEN INTERVAL 2 DAY PRECEDING
                    AND CURRENT ROW) AS BIGINT) AS moving_3d
        FROM (SELECT date_trunc('day', ts)::TIMESTAMP AS d,
                     count(*) AS n
              FROM events GROUP BY 1) t
        ORDER BY d"""),
    "sqlc_time_parse_pattern": ("""
        SELECT TIME_PARSE('05/20/2024 13:45', 'MM/dd/yyyy HH:mm') AS t1,
               TIME_PARSE('2024-05-20T08:00:00Z') AS t2""", """
        SELECT TIMESTAMP '2024-05-20 13:45:00' AS t1,
               TIMESTAMP '2024-05-20 08:00:00' AS t2"""),
    "sqlc_cast_truncates_not_rounds": ("""
        SELECT CAST(1.9 AS BIGINT) AS t1, CAST(-1.9 AS BIGINT) AS t2,
               CAST('3.7' AS DOUBLE) AS t3""", """
        SELECT 1 AS t1, -1 AS t2, 3.7 AS t3"""),
    "sqlc_scientific_literals": ("""
        SELECT count(*) AS n FROM orders
        WHERE o_totalprice > 1e5 AND o_totalprice < 4.5e5""", None),
    "sqlc_unary_minus_abs": ("""
        SELECT CAST(sum(-o_custkey) AS BIGINT) AS neg_sum,
               CAST(sum(ABS(-o_custkey)) AS BIGINT) AS abs_sum
        FROM orders WHERE o_orderkey <= 100""", None),
    "sqlc_double_mod": ("""
        SELECT round(MOD(7.5, 2.25), 9) AS m1,
               round(MOD(o_totalprice, 1000.0), 2) AS m2
        FROM orders ORDER BY o_orderkey LIMIT 3""", None),
    "sqlc_string_range_compare": ("""
        SELECT count(*) AS n FROM orders
        WHERE o_orderpriority BETWEEN '2-HIGH' AND '4-NOT SPECIFIED'""",
     None),
    # --- batch 11: nested-JSON path surface over the events.props
    # column (quidem nested-columns class; NestedDataExpressions.java)
    "sqlc_json_value_paths": ("""
        SELECT event_type,
               CAST(sum(CAST(JSON_VALUE(props, '$.k') AS BIGINT))
                    AS BIGINT) AS k_sum,
               count(JSON_VALUE(props, '$.missing')) AS n_missing
        FROM events GROUP BY 1 ORDER BY 1""", """
        SELECT event_type,
               CAST(sum(CAST(props->>'k' AS BIGINT)) AS BIGINT) AS k_sum,
               count(props->>'missing') AS n_missing
        FROM events GROUP BY 1 ORDER BY 1"""),
    "sqlc_json_value_filter": ("""
        SELECT count(*) AS n FROM events
        WHERE CAST(JSON_VALUE(props, '$.k') AS BIGINT) > 50""", """
        SELECT count(*) AS n FROM events
        WHERE CAST(props->>'k' AS BIGINT) > 50"""),
    "sqlc_json_keys_merge": ("""
        SELECT ARRAY_TO_STRING(JSON_KEYS('{"b": 1, "a": 2}', '$'), ',')
                 AS ks,
               TO_JSON_STRING(JSON_MERGE('{"a": 1}', '{"b": 2}')) AS merged
        """, """
        SELECT 'b,a' AS ks, '{"a":1,"b":2}' AS merged"""),
    "sqlc_json_nested_group": ("""
        SELECT MOD(CAST(JSON_VALUE(props, '$.k') AS BIGINT), 10) AS kmod,
               count(*) AS n
        FROM events GROUP BY 1 ORDER BY 1""", """
        SELECT CAST(props->>'k' AS BIGINT) % 10 AS kmod, count(*) AS n
        FROM events GROUP BY 1 ORDER BY 1"""),
    # --- batch 8 (round 4): arrays + nested-data corpora —
    # CalciteArraysQueryTest.java (ARRAY_AGG matrices, append/prepend/
    # concat, offset/ordinal/overlap/slice, UNNEST+filter, whole-array
    # grouping vs MVD explode) and CalciteNestedDataQueryTest.java
    # (JSON_VALUE RETURNING arms, JSON_QUERY/_ARRAY, PATHS/KEYS/OBJECT,
    # PARSE_JSON round-trips) ---
    "sqlc_arr_append_prepend_concat": ("""
        SELECT ARRAY_TO_STRING(ARRAY_APPEND(ARRAY['a','b'], 'c'), ',') AS ap,
               ARRAY_TO_STRING(ARRAY_PREPEND('z', ARRAY['a','b']), ',') AS pp,
               ARRAY_TO_STRING(ARRAY_CONCAT(ARRAY['x'], ARRAY['y','z']), ',')
                 AS cc""", """
        SELECT 'a,b,c' AS ap, 'z,a,b' AS pp, 'x,y,z' AS cc"""),
    "sqlc_arr_offset_ordinal": ("""
        SELECT ARRAY_OFFSET(ARRAY['a','b','c'], 1) AS o1,
               ARRAY_ORDINAL(ARRAY['a','b','c'], 1) AS ord1,
               ARRAY_OFFSET(ARRAY['a'], 5) AS oob,
               ARRAY_OFFSET_OF(ARRAY['a','b'], 'b') AS off_of,
               ARRAY_ORDINAL_OF(ARRAY['a','b'], 'b') AS ord_of,
               ARRAY_OFFSET_OF(ARRAY['a'], 'q') AS missing""", """
        SELECT 'b' AS o1, 'a' AS ord1, NULL AS oob,
               1 AS off_of, 2 AS ord_of, NULL AS missing"""),
    "sqlc_arr_overlap_slice": ("""
        SELECT ARRAY_OVERLAP(ARRAY['a','b'], ARRAY['b','c']) AS ov,
               ARRAY_OVERLAP(ARRAY['a'], ARRAY['x']) AS nov,
               ARRAY_TO_STRING(ARRAY_SLICE(ARRAY['a','b','c','d'], 1, 3),
                               ',') AS sl""", """
        SELECT true AS ov, false AS nov, 'b,c' AS sl"""),
    "sqlc_arr_contains_filter": ("""
        SELECT count(*) AS n FROM orders
        WHERE ARRAY_CONTAINS(ARRAY['F','P'], o_orderstatus)""", """
        SELECT count(*) AS n FROM orders WHERE o_orderstatus IN ('F','P')"""),
    "sqlc_arr_quantile": ("""
        SELECT round(ARRAY_QUANTILE(ARRAY[3.0, 1.0, 2.0], 0.5), 2) AS med,
               round(ARRAY_QUANTILE(ARRAY[1.0, 2.0], 1.0), 2) AS mx""", """
        SELECT 2.0 AS med, 2.0 AS mx"""),
    "sqlc_arr_agg_filter": ("""
        SELECT o_orderstatus,
               ARRAY_TO_STRING(ARRAY_SORT(ARRAY_AGG(DISTINCT o_orderpriority)
                 FILTER (WHERE o_orderpriority LIKE '1%'
                            OR o_orderpriority LIKE '2%')), ',') AS pris,
               count(*) AS n
        FROM orders GROUP BY 1 ORDER BY 1""", """
        SELECT o_orderstatus,
               array_to_string(list_sort(array_agg(DISTINCT o_orderpriority)
                 FILTER (WHERE o_orderpriority LIKE '1%'
                            OR o_orderpriority LIKE '2%')), ',') AS pris,
               count(*) AS n
        FROM orders GROUP BY 1 ORDER BY 1"""),
    "sqlc_arr_agg_expr": ("""
        SELECT ARRAY_TO_STRING(ARRAY_SORT(ARRAY_AGG(
                 DISTINCT UPPER(SUBSTRING(o_orderpriority, 1, 1)))), '')
               AS firsts
        FROM orders""", """
        SELECT array_to_string(list_sort(array_agg(
                 DISTINCT upper(substring(o_orderpriority, 1, 1)))), '')
               AS firsts
        FROM orders"""),
    "sqlc_arr_concat_agg": ("""
        SELECT ARRAY_TO_STRING(ARRAY_SORT(ARRAY_DISTINCT(
                 ARRAY_CONCAT_AGG(arr))), ',') AS vals
        FROM (SELECT ARRAY[o_orderstatus, o_orderpriority] AS arr
              FROM orders) t""", """
        SELECT array_to_string(list_sort(list_distinct(
                 flatten(array_agg(arr)))), ',') AS vals
        FROM (SELECT [o_orderstatus, o_orderpriority] AS arr
              FROM orders) t"""),
    "sqlc_arr_agg_length": ("""
        SELECT ARRAY_LENGTH(ARRAY_AGG(DISTINCT o_orderstatus)) AS n
        FROM orders""", """
        SELECT CAST(len(array_agg(DISTINCT o_orderstatus)) AS INTEGER) AS n
        FROM orders"""),
    "sqlc_arr_group_by_array": ("""
        SELECT ARRAY_TO_STRING(a, ',') AS k, count(*) AS n
        FROM (SELECT ARRAY[o_orderstatus,
                           CASE WHEN o_totalprice > 150000
                                THEN 'hi' ELSE 'lo' END] AS a
              FROM orders) t
        GROUP BY a ORDER BY k""", """
        SELECT array_to_string(a, ',') AS k, count(*) AS n
        FROM (SELECT [o_orderstatus,
                      CASE WHEN o_totalprice > 150000
                           THEN 'hi' ELSE 'lo' END] AS a
              FROM orders) t
        GROUP BY a ORDER BY k"""),
    "sqlc_arr_unnest_filter": ("""
        SELECT v, count(*) AS n
        FROM orders CROSS JOIN
             UNNEST(ARRAY[o_orderstatus, o_orderpriority]) AS u(v)
        WHERE v LIKE '%1%' OR v IN ('F','O','P')
        GROUP BY v ORDER BY v""", """
        SELECT v, count(*) AS n
        FROM (SELECT o_orderstatus AS v FROM orders
              UNION ALL SELECT o_orderpriority FROM orders) t
        WHERE v LIKE '%1%' OR v IN ('F','O','P')
        GROUP BY v ORDER BY v"""),
    "sqlc_arr_unnest_agg_total": ("""
        SELECT CAST(sum(cnt) AS BIGINT) AS total FROM (
          SELECT count(*) AS cnt
          FROM orders CROSS JOIN
               UNNEST(ARRAY[o_orderstatus, o_orderpriority]) AS u(v)
          GROUP BY v) t""", """
        SELECT CAST(2 * count(*) AS BIGINT) AS total FROM orders"""),
    "sqlc_arr_unnest_join": ("""
        SELECT r_name, count(*) AS n
        FROM (SELECT r_name, k
              FROM region CROSS JOIN
                   UNNEST(ARRAY[r_regionkey, r_regionkey]) AS u(k)) t
        JOIN nation ON n_regionkey = k
        GROUP BY r_name ORDER BY r_name""", """
        SELECT r_name, CAST(2 * count(*) AS BIGINT) AS n
        FROM region JOIN nation ON n_regionkey = r_regionkey
        GROUP BY r_name ORDER BY r_name"""),
    "sqlc_arr_to_mv_roundtrip": ("""
        SELECT MV_LENGTH(ARRAY_TO_MV(STRING_TO_ARRAY('a|b|c', '\|'))) AS n,
               MV_TO_STRING(MV_SLICE(STRING_TO_MV('a,b,c,d', ','), 1, 3),
                            '-') AS mid,
               MV_CONTAINS(STRING_TO_MV('x,y', ','), 'x') AS has_x""", """
        SELECT 3 AS n, 'b-c' AS mid, true AS has_x"""),
    "sqlc_arr_string_roundtrip": ("""
        SELECT ARRAY_TO_STRING(STRING_TO_ARRAY(
                 ARRAY_TO_STRING(ARRAY['p','q','r'], '|'), '\|'), '-')
               AS rt""", """
        SELECT 'p-q-r' AS rt"""),
    "sqlc_arr_numeric_cast": ("""
        SELECT CAST(ARRAY_OFFSET(STRING_TO_ARRAY('10,20,30', ','), 2)
                    AS BIGINT) AS v30""", """
        SELECT CAST(30 AS BIGINT) AS v30"""),
    "sqlc_arr_equality": ("""
        SELECT count(*) AS n FROM orders
        WHERE ARRAY[o_orderstatus] = ARRAY['F']""", """
        SELECT count(*) AS n FROM orders WHERE o_orderstatus = 'F'"""),
    "sqlc_arr_case_branch": ("""
        SELECT ARRAY_TO_STRING(CASE WHEN 1 = 0 THEN ARRAY['x']
                                    ELSE ARRAY['f','g'] END, ',') AS c""", """
        SELECT 'f,g' AS c"""),
    "sqlc_arr_group_vs_explode": ("""
        SELECT (SELECT count(*) FROM (
                  SELECT a FROM (SELECT ARRAY[o_orderstatus] AS a
                                 FROM orders) s GROUP BY a) g) AS arr_groups,
               (SELECT count(DISTINCT o_orderstatus) FROM orders)
               AS mv_groups""", """
        SELECT (SELECT count(*) FROM (
                  SELECT a FROM (SELECT [o_orderstatus] AS a
                                 FROM orders) s GROUP BY a) g) AS arr_groups,
               (SELECT count(DISTINCT o_orderstatus) FROM orders)
               AS mv_groups"""),
    "sqlc_arr_cardinality_filter": ("""
        SELECT count(*) AS n FROM events
        WHERE ARRAY_LENGTH(STRING_TO_ARRAY(event_type, '_')) >= 2""", """
        SELECT count(*) AS n FROM events
        WHERE len(string_split(event_type, '_')) >= 2"""),
    "sqlc_mv_filter_only_regex": ("""
        SELECT ARRAY_TO_STRING(MV_FILTER_ONLY(
                 STRING_TO_MV('apple,banana,avocado', ','),
                 ARRAY['apple','avocado']), ',') AS only_a,
               ARRAY_TO_STRING(MV_FILTER_REGEX(
                 STRING_TO_MV('a1,b2,a3', ','), '^a.*'), ',') AS regex_a""",
     """
        SELECT 'apple,avocado' AS only_a, 'a1,a3' AS regex_a"""),
    "sqlc_arr_agg_join": ("""
        SELECT r_name,
               ARRAY_TO_STRING(ARRAY_SORT(ARRAY_AGG(
                 DISTINCT SUBSTRING(n_name, 1, 1))), '') AS initials
        FROM nation JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name ORDER BY r_name""", """
        SELECT r_name,
               array_to_string(list_sort(array_agg(
                 DISTINCT substring(n_name, 1, 1))), '') AS initials
        FROM nation JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name ORDER BY r_name"""),
    "sqlc_json_value_returning": ("""
        SELECT CAST(sum(JSON_VALUE(props, '$.k' RETURNING BIGINT))
                    AS BIGINT) AS ksum,
               round(avg(JSON_VALUE(props, '$.k' RETURNING DOUBLE)), 3)
                 AS kavg
        FROM events""", """
        SELECT CAST(sum(CAST(props->>'k' AS BIGINT)) AS BIGINT) AS ksum,
               round(avg(CAST(props->>'k' AS DOUBLE)), 3) AS kavg
        FROM events"""),
    "sqlc_json_returning_filter": ("""
        SELECT count(*) AS n FROM events
        WHERE JSON_VALUE(props, '$.k' RETURNING BIGINT) > 50""", """
        SELECT count(*) AS n FROM events
        WHERE CAST(props->>'k' AS BIGINT) > 50"""),
    "sqlc_json_returning_group": ("""
        SELECT MOD(JSON_VALUE(props, '$.k' RETURNING BIGINT), 5) AS b,
               count(*) AS n,
               CAST(max(JSON_VALUE(props, '$.k' RETURNING BIGINT))
                    AS BIGINT) AS mx
        FROM events GROUP BY 1 ORDER BY 1""", """
        SELECT CAST(props->>'k' AS BIGINT) % 5 AS b, count(*) AS n,
               CAST(max(CAST(props->>'k' AS BIGINT)) AS BIGINT) AS mx
        FROM events GROUP BY 1 ORDER BY 1"""),
    "sqlc_json_value_types": ("""
        SELECT JSON_VALUE('{"s": "x", "i": 5, "f": 1.5, "b": true}',
                          '$.s') AS s,
               JSON_VALUE('{"s": "x", "i": 5, "f": 1.5, "b": true}',
                          '$.i' RETURNING BIGINT) AS i,
               JSON_VALUE('{"s": "x", "i": 5, "f": 1.5, "b": true}',
                          '$.f' RETURNING DOUBLE) AS f,
               JSON_VALUE('{"s": "x", "i": 5, "f": 1.5, "b": true}',
                          '$.b') AS b""", """
        SELECT 'x' AS s, CAST(5 AS BIGINT) AS i, 1.5 AS f,
               '1' AS b"""),
    "sqlc_json_value_nested_path": ("""
        SELECT JSON_VALUE('{"a": {"b": {"c": "deep"}}}', '$.a.b.c') AS v,
               JSON_VALUE('{"arr": [10, 20]}', '$.arr[1]') AS second""", """
        SELECT 'deep' AS v, '20' AS second"""),
    "sqlc_json_value_missing": ("""
        SELECT count(*) AS n FROM events
        WHERE JSON_VALUE(props, '$.zzz') IS NULL""", """
        SELECT count(*) AS n FROM events WHERE props->>'zzz' IS NULL"""),
    "sqlc_json_query_nested": ("""
        SELECT JSON_QUERY('{"a": {"b": [1,2,3]}}', '$.a') AS obj""", """
        SELECT '{"b":[1,2,3]}' AS obj"""),
    "sqlc_json_query_array": ("""
        SELECT ARRAY_LENGTH(JSON_QUERY_ARRAY('{"a": [5,6,7]}', '$.a'))
               AS n""", """
        SELECT 3 AS n"""),
    "sqlc_json_paths": ("""
        SELECT ARRAY_TO_STRING(ARRAY_SORT(
                 JSON_PATHS('{"a": 1, "b": {"c": 2}}')), ',') AS ps""", """
        SELECT '$.a,$.b.c' AS ps"""),
    "sqlc_json_merge_overwrite": ("""
        SELECT TO_JSON_STRING(JSON_MERGE('{"a": 1, "b": 1}',
                                         '{"b": 2, "c": 3}')) AS m""", """
        SELECT '{"a":1,"b":2,"c":3}' AS m"""),
    "sqlc_parse_json_roundtrip": ("""
        SELECT TO_JSON_STRING(PARSE_JSON('{"b": 2, "a": 1}')) AS rt""", """
        SELECT '{"a":1,"b":2}' AS rt"""),
    "sqlc_json_object_from_cols": ("""
        SELECT TO_JSON_STRING(JSON_OBJECT(KEY 'pr' VALUE o_orderpriority,
                                          KEY 'st' VALUE o_orderstatus))
                 AS j,
               count(*) AS n
        FROM orders GROUP BY 1 ORDER BY 1""", """
        SELECT to_json({'pr': o_orderpriority, 'st': o_orderstatus}) AS j,
               count(*) AS n
        FROM orders GROUP BY 1 ORDER BY 1"""),
    "sqlc_arr_agg_window": ("""
        SELECT DISTINCT o_orderpriority,
               ARRAY_LENGTH(ARRAY_AGG(o_orderstatus) OVER (
                 PARTITION BY o_orderpriority
                 ROWS BETWEEN UNBOUNDED PRECEDING
                          AND UNBOUNDED FOLLOWING)) AS n
        FROM orders ORDER BY 1""", """
        SELECT o_orderpriority, CAST(count(*) AS INTEGER) AS n
        FROM orders GROUP BY 1 ORDER BY 1"""),
    "sqlc_mv_filter_none": ("""
        SELECT ARRAY_TO_STRING(MV_FILTER_NONE(
                 STRING_TO_MV('a,b,c', ','), ARRAY['b']), ',') AS rest""", """
        SELECT 'a,c' AS rest"""),
    "sqlc_json_object_nested_value": ("""
        SELECT JSON_VALUE(TO_JSON_STRING(JSON_OBJECT(
                 KEY 'outer' VALUE JSON_OBJECT(KEY 'in' VALUE 7))),
                 '$.outer.in' RETURNING BIGINT) AS v""", """
        SELECT CAST(7 AS BIGINT) AS v"""),
    "sqlc_json_keys_col": ("""
        SELECT ARRAY_TO_STRING(JSON_KEYS(props, '$'), ',') AS ks,
               count(*) AS n
        FROM events GROUP BY 1 ORDER BY 1""", """
        SELECT 'k' AS ks, count(*) AS n FROM events GROUP BY 1 ORDER BY 1"""),
    "sqlc_arr_overlap_column": ("""
        SELECT count(*) AS n FROM orders
        WHERE ARRAY_OVERLAP(ARRAY[o_orderstatus], ARRAY['F','O'])""", """
        SELECT count(*) AS n FROM orders
        WHERE o_orderstatus IN ('F','O')"""),
    "sqlc_arr_having_length": ("""
        SELECT o_orderstatus,
               ARRAY_LENGTH(ARRAY_AGG(DISTINCT o_orderpriority)) AS pris
        FROM orders GROUP BY 1
        HAVING ARRAY_LENGTH(ARRAY_AGG(DISTINCT o_orderpriority)) >= 5
        ORDER BY 1""", """
        SELECT o_orderstatus,
               CAST(len(array_agg(DISTINCT o_orderpriority)) AS INTEGER)
                 AS pris
        FROM orders GROUP BY 1
        HAVING len(array_agg(DISTINCT o_orderpriority)) >= 5
        ORDER BY 1"""),
    "sqlc_mv_unnest_real_col": ("""
        SELECT v, count(*) AS n
        FROM events CROSS JOIN
             UNNEST(STRING_TO_MV(event_type, '_')) AS u(v)
        GROUP BY v ORDER BY v""", """
        SELECT v, count(*) AS n
        FROM (SELECT unnest(string_split(event_type, '_')) AS v
              FROM events) t
        GROUP BY v ORDER BY v"""),
    "sqlc_mv_ordinal_of_missing": ("""
        SELECT MV_OFFSET_OF(STRING_TO_MV('p,q', ','), 'q') AS off_q,
               MV_ORDINAL_OF(STRING_TO_MV('p,q', ','), 'z') AS none_z""", """
        SELECT 1 AS off_q, NULL AS none_z"""),
    "sqlc_arr_prepend_col": ("""
        SELECT ARRAY_TO_STRING(ARRAY_PREPEND(o_orderstatus, ARRAY['X']),
                               ',') AS pc,
               count(*) AS n
        FROM orders GROUP BY 1 ORDER BY 1""", """
        SELECT o_orderstatus || ',X' AS pc, count(*) AS n
        FROM orders GROUP BY 1 ORDER BY 1"""),
    "sqlc_json_value_arr_elem_col": ("""
        SELECT JSON_VALUE(CONCAT('{"a": ["', o_orderstatus, '"]}'),
                          '$.a[0]') AS s,
               count(*) AS n
        FROM orders GROUP BY 1 ORDER BY 1""", """
        SELECT o_orderstatus AS s, count(*) AS n
        FROM orders GROUP BY 1 ORDER BY 1"""),
    "sqlc_parse_json_deep_path": ("""
        SELECT JSON_VALUE(TO_JSON_STRING(
                 PARSE_JSON('{"q": [1, {"r": "s"}]}')), '$.q[1].r')
               AS v""", """
        SELECT 's' AS v"""),
    "sqlc_arr_agg_distinct_numeric": ("""
        SELECT ARRAY_TO_STRING(ARRAY_SORT(ARRAY_AGG(
                 DISTINCT CAST(n_regionkey AS VARCHAR))), ',') AS rs
        FROM nation""", """
        SELECT array_to_string(list_sort(array_agg(
                 DISTINCT CAST(n_regionkey AS VARCHAR))), ',') AS rs
        FROM nation"""),
    "sqlc_mv_filter_prefix_group": ("""

        SELECT MV_TO_STRING(MV_FILTER_PREFIX(
                 STRING_TO_MV(event_type, '_'), 'p'), ',') AS pv,
               count(*) AS n
        FROM events GROUP BY 1 ORDER BY 1 NULLS FIRST""", """

        SELECT nullif(array_to_string(
                 list_filter(string_split(event_type, '_'),
                             x -> starts_with(x, 'p')), ','), '') AS pv,
               count(*) AS n
        FROM events GROUP BY 1 ORDER BY 1 NULLS FIRST"""),
    "sqlc_json_returning_real_sum": ("""
        SELECT round(sum(JSON_VALUE(CONCAT('{"v": ',
                 CAST(o_totalprice AS VARCHAR), '}'),
                 '$.v' RETURNING DOUBLE)), 2) AS s
        FROM orders WHERE o_orderkey <= 100""", """
        SELECT round(sum(o_totalprice), 2) AS s
        FROM orders WHERE o_orderkey <= 100"""),
    # --- batch 9 (round 4): general conformance — string/numeric/null
    # edges, set-op ALL, window value fns, old-style joins
    # (CalciteQueryTest testExpressions* / quidem misc) ---
    "sqlc_trim_variants": ("""
        SELECT TRIM('  pad  ') AS t, TRIM(BOTH 'x' FROM 'xxaxx') AS b,
               TRIM(LEADING 'x' FROM 'xxa') AS l,
               TRIM(TRAILING 'x' FROM 'axx') AS r""", """
        SELECT 'pad' AS t, 'a' AS b, 'a' AS l, 'a' AS r"""),
    "sqlc_pad_repeat_reverse": ("""
        SELECT LPAD('7', 3, '0') AS lp, RPAD('7', 3, '*') AS rp,
               REPEAT('ab', 3) AS rep, REVERSE('abc') AS rev""", """
        SELECT '007' AS lp, '7**' AS rp, 'ababab' AS rep, 'cba' AS rev"""),
    "sqlc_replace_strpos": ("""
        SELECT REPLACE('banana', 'na', 'NA') AS rp,
               STRPOS('banana', 'na') AS sp""", """
        SELECT 'baNANA' AS rp, 3 AS sp"""),
    "sqlc_like_escape_concat": ("""
        SELECT count(*) AS n
        FROM (SELECT CONCAT(o_orderpriority, '%') AS s FROM orders) t
        WHERE s LIKE '%URGENT#%' ESCAPE '#'""", """
        SELECT count(*) AS n
        FROM (SELECT o_orderpriority || '%' AS s FROM orders) t
        WHERE s LIKE '%URGENT#%' ESCAPE '#'"""),
    "sqlc_concat_pipe_null": ("""
        SELECT CONCAT('a', CAST(NULL AS VARCHAR)) AS c,
               'a' || CAST(NULL AS VARCHAR) AS p""", """
        SELECT CAST(NULL AS VARCHAR) AS c, CAST(NULL AS VARCHAR) AS p"""),
    "sqlc_substring_edges": ("""
        SELECT SUBSTRING('hello', 2, 100) AS mid,
               SUBSTRING('hello', 6) AS off_end,
               SUBSTRING('hello', 1, 0) AS zero_len""", """
        SELECT 'ello' AS mid, CAST(NULL AS VARCHAR) AS off_end,
               '' AS zero_len"""),
    "sqlc_mod_div_signs": ("""
        SELECT MOD(-7, 3) AS m1, MOD(7, -3) AS m2,
               DIV(17, 5) AS d, DIV(-17, 5) AS dn""", """
        SELECT -1 AS m1, 1 AS m2, CAST(3 AS BIGINT) AS d,
               CAST(-3 AS BIGINT) AS dn"""),
    "sqlc_round_truncate_matrix": ("""
        SELECT round(123.456, -1) AS r_neg,
               TRUNCATE(123.456, 1) AS tr,
               TRUNCATE(-123.456, 1) AS tr_neg,
               CAST(CEIL(1.1) AS BIGINT) AS c,
               CAST(FLOOR(-1.1) AS BIGINT) AS f""", """
        SELECT 120.0 AS r_neg, 123.4 AS tr, -123.4 AS tr_neg,
               CAST(2 AS BIGINT) AS c, CAST(-2 AS BIGINT) AS f"""),
    "sqlc_is_distinct_from_filter": ("""
        SELECT count(*) AS n FROM orders
        WHERE o_orderstatus IS DISTINCT FROM 'F'""", None),
    "sqlc_union_type_coercion": ("""
        SELECT CAST(x AS DOUBLE) AS x
        FROM (SELECT 1 AS x UNION ALL SELECT 2.5 AS x) t
        ORDER BY x""", None),
    "sqlc_implicit_join": ("""
        SELECT count(*) AS n FROM nation, region
        WHERE n_regionkey = r_regionkey AND r_name = 'ASIA'""", None),
    "sqlc_self_join_regionkey": ("""
        SELECT count(*) AS n
        FROM nation a JOIN nation b ON a.n_regionkey = b.n_regionkey""",
     None),
    "sqlc_window_first_last_value": ("""
        SELECT DISTINCT
               FIRST_VALUE(o_orderkey) OVER (ORDER BY o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING
                          AND UNBOUNDED FOLLOWING) AS first_k,
               LAST_VALUE(o_orderkey) OVER (ORDER BY o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING
                          AND UNBOUNDED FOLLOWING) AS last_k
        FROM orders""", """
        SELECT min(o_orderkey) AS first_k, max(o_orderkey) AS last_k
        FROM orders"""),
    "sqlc_cume_dist_dense_rank": ("""
        SELECT o_orderstatus,
               DENSE_RANK() OVER (ORDER BY o_orderstatus) AS dr,
               round(CUME_DIST() OVER (ORDER BY o_orderstatus), 4) AS cd
        FROM (SELECT DISTINCT o_orderstatus FROM orders) t
        ORDER BY 1""", None),
    "sqlc_except_all_counts": ("""
        SELECT s, count(*) AS n FROM (
          SELECT o_orderstatus AS s FROM orders
          WHERE o_totalprice > 100000
          EXCEPT ALL
          SELECT o_orderstatus AS s FROM orders
          WHERE o_totalprice > 300000) t
        GROUP BY s ORDER BY s""", None),
    "sqlc_extract_quarter_doy": ("""
        SELECT CAST(EXTRACT(QUARTER FROM o_orderdate) AS BIGINT) AS q,
               count(*) AS n
        FROM orders GROUP BY 1 ORDER BY 1""", None),
    "sqlc_floor_to_unit": ("""
        SELECT CAST(CAST(FLOOR(o_orderdate TO MONTH) AS DATE) AS VARCHAR)
                 AS m,
               count(*) AS n
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1997-01-01'
          AND o_orderdate < TIMESTAMP '1997-07-01'
        GROUP BY 1 ORDER BY 1""", """
        SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS m,
               count(*) AS n
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1997-01-01'
          AND o_orderdate < TIMESTAMP '1997-07-01'
        GROUP BY 1 ORDER BY 1"""),
    "sqlc_nullif_coalesce_matrix": ("""
        SELECT NULLIF(1, 1) IS NULL AS a, NULLIF(2, 1) AS b,
               COALESCE(NULL, NULL, 7) AS c""", None),
    "sqlc_not_in_null_empty": ("""
        SELECT count(*) AS n FROM nation
        WHERE n_nationkey NOT IN
              (SELECT CASE WHEN n_nationkey = 3 THEN NULL
                           ELSE n_nationkey END
               FROM nation)""", None),
    "sqlc_char_octet_length": ("""
        SELECT CHAR_LENGTH('héllo') AS cl,
               OCTET_LENGTH('héllo') AS ol""", """
        SELECT 5 AS cl, 6 AS ol"""),
    "sqlc_agg_in_case": ("""
        SELECT CASE WHEN count(*) > 100 THEN 'big' ELSE 'small' END
                 AS size_class,
               count(*) AS n
        FROM orders""", None),
    # --- batch 10 (round 4): CalciteQueryTest shapes — EARLIEST/LATEST
    # matrices, HAVING-on-ratio/distinct, GROUP BY ordinal/alias edges,
    # null-equality semantics, union-all matrices, limit wrapping ---
    "sqlc_earliest_latest_group": ("""
        SELECT event_type, round(EARLIEST(value), 3) AS first_v,
               round(LATEST(value), 3) AS last_v
        FROM events GROUP BY 1 ORDER BY 1""", """
        SELECT event_type, round(arg_min(value, ts), 3) AS first_v,
               round(arg_max(value, ts), 3) AS last_v
        FROM events GROUP BY 1 ORDER BY 1"""),
    "sqlc_latest_in_subquery": ("""
        SELECT round(sum(lv), 3) AS s FROM (
          SELECT event_type, LATEST(value) AS lv
          FROM events GROUP BY 1) t""", """
        SELECT round(sum(lv), 3) AS s FROM (
          SELECT event_type, arg_max(value, ts) AS lv
          FROM events GROUP BY 1) t"""),
    "sqlc_order_by_latest": ("""
        SELECT event_type, round(LATEST(value), 3) AS lv
        FROM events GROUP BY 1 ORDER BY lv DESC, event_type LIMIT 3""", """
        SELECT event_type, round(arg_max(value, ts), 3) AS lv
        FROM events GROUP BY 1 ORDER BY lv DESC, event_type LIMIT 3"""),
    "sqlc_having_ratio": ("""
        SELECT o_orderstatus,
               round(sum(o_totalprice) / count(*), 2) AS avg_p
        FROM orders GROUP BY 1
        HAVING sum(o_totalprice) / count(*) > 150000
        ORDER BY 1""", None),
    "sqlc_having_count_distinct": ("""
        SELECT o_orderpriority, count(DISTINCT o_custkey) AS c
        FROM orders GROUP BY 1
        HAVING count(DISTINCT o_custkey) > 50 ORDER BY 1""", None),
    "sqlc_group_by_ordinal_alias": ("""
        SELECT UPPER(o_orderstatus) AS st, count(*) AS n
        FROM orders GROUP BY 1 ORDER BY 2 DESC, 1""", None),
    "sqlc_group_by_expr_shadow": ("""
        SELECT CONCAT(o_orderstatus, '!') AS o_orderstatus, count(*) AS n
        FROM orders GROUP BY 1 ORDER BY 1""", """
        SELECT o_orderstatus || '!' AS o_orderstatus, count(*) AS n
        FROM orders GROUP BY 1 ORDER BY 1"""),
    "sqlc_coalesce_columns_group": ("""
        SELECT COALESCE(NULLIF(o_orderstatus, 'O'), o_orderpriority) AS c,
               count(*) AS n
        FROM orders GROUP BY 1 ORDER BY 1""", None),
    "sqlc_coalesce_filter_equality": ("""
        SELECT count(*) AS n FROM orders
        WHERE COALESCE(NULLIF(o_orderstatus, 'O'), 'X') = 'X'""", None),
    "sqlc_impossible_time_filter": ("""
        SELECT count(*) AS n, CAST(sum(o_totalprice) AS DOUBLE) AS s
        FROM orders
        WHERE o_orderdate > TIMESTAMP '2999-01-01 00:00:00'""", None),
    "sqlc_union_same_table_3x": ("""
        SELECT o_orderstatus, count(*) AS n FROM (
          SELECT o_orderstatus FROM orders
          UNION ALL SELECT o_orderstatus FROM orders
          UNION ALL SELECT o_orderstatus FROM orders) t
        GROUP BY 1 ORDER BY 1""", None),
    "sqlc_count_distinct_union_subquery": ("""
        SELECT count(DISTINCT k) AS c FROM (
          SELECT o_custkey AS k FROM orders
          UNION ALL
          SELECT c_custkey AS k FROM customer) t""", None),
    "sqlc_null_compare_matrix": ("""
        SELECT (NULL = NULL) IS NULL AS a,
               (NULL <> 1) IS NULL AS b,
               (1 = 1) AS c""", None),
    "sqlc_filtered_count_distinct": ("""
        SELECT count(DISTINCT o_custkey)
                 FILTER (WHERE o_orderstatus = 'F') AS cf,
               count(*) AS n
        FROM orders""", None),
    "sqlc_case_triple_and": ("""
        SELECT CAST(sum(CASE WHEN o_orderstatus = 'F'
                              AND o_totalprice > 100000
                              AND o_orderpriority LIKE '1%'
                             THEN 1 ELSE 0 END) AS BIGINT) AS n
        FROM orders""", None),
    "sqlc_case_two_arg_null": ("""
        SELECT count(*) AS n FROM orders
        WHERE CASE WHEN NULLIF(o_orderstatus, 'O') IS NULL THEN 'Z'
                   ELSE o_orderstatus END = 'Z'""", None),
    "sqlc_topn_order_by_agg": ("""
        SELECT o_custkey, round(sum(o_totalprice), 2) AS s
        FROM orders GROUP BY 1
        ORDER BY s DESC, o_custkey LIMIT 7""", None),
    "sqlc_safe_divide_matrix": ("""
        SELECT SAFE_DIVIDE(10.0, 0.0) IS NULL AS z,
               SAFE_DIVIDE(0.0, 0.0) IS NULL AS zz,
               round(SAFE_DIVIDE(10.0, 4.0), 2) AS q""", """
        SELECT true AS z, true AS zz, 2.5 AS q"""),
    "sqlc_any_value_group": ("""
        SELECT o_orderstatus, ANY_VALUE(o_orderstatus) AS av,
               count(*) AS n
        FROM orders GROUP BY 1 ORDER BY 1""", """
        SELECT o_orderstatus, any_value(o_orderstatus) AS av,
               count(*) AS n
        FROM orders GROUP BY 1 ORDER BY 1"""),
    "sqlc_group_limit_two_dim": ("""
        SELECT o_orderstatus, o_orderpriority, count(*) AS n
        FROM orders GROUP BY 1, 2 ORDER BY 1, 2 LIMIT 6""", None),
    # --- batch 11 (round 4): filter simplification, time-filter
    # matrices, count-distinct variants, nesting collapse
    # (CalciteQueryTest CountStarWith* / *CountDistinct* families) ---
    "sqlc_in_is_not_true": ("""
        SELECT count(*) AS n FROM orders
        WHERE (o_orderstatus IN ('F', 'O')) IS NOT TRUE""", None),
    "sqlc_not_in_or_is_null": ("""
        SELECT count(*) AS n FROM orders
        WHERE o_orderstatus NOT IN ('F') OR o_orderstatus IS NULL""", None),
    "sqlc_in_23_elements": ("""
        SELECT count(*) AS n FROM orders
        WHERE o_custkey IN (1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13,
                            14, 15, 16, 17, 18, 19, 20, 21, 22, 23)""",
     None),
    "sqlc_degenerate_filters": ("""
        SELECT count(*) FILTER (WHERE 'a' = 'a') AS all_rows,
               count(*) FILTER (WHERE NOT ('a' = 'b')) AS also_all,
               count(*) FILTER (WHERE 'a' = 'b') AS none_rows
        FROM orders""", None),
    "sqlc_bound_simplify_or": ("""
        SELECT count(*) AS n FROM orders
        WHERE o_totalprice > 100000 OR o_totalprice > 200000""", None),
    "sqlc_filter_casted_string_key": ("""
        SELECT count(*) AS n FROM orders
        WHERE CAST(o_custkey AS VARCHAR) = '42'""", None),
    "sqlc_time_filter_millis": ("""
        SELECT count(*) AS n FROM orders
        WHERE o_orderdate >= MILLIS_TO_TIMESTAMP(820454400000)
          AND o_orderdate < MILLIS_TO_TIMESTAMP(852076800000)""", """
        SELECT count(*) AS n FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'"""),
    "sqlc_two_points_in_time": ("""
        SELECT count(*) AS n FROM orders
        WHERE o_orderdate = TIMESTAMP '1996-03-04 00:00:00'
           OR o_orderdate = TIMESTAMP '1996-03-05 00:00:00'""", None),
    "sqlc_disjoint_time_filter": ("""
        SELECT count(*) FILTER (
                 WHERE o_orderdate < TIMESTAMP '1994-01-01 00:00:00'
                    OR o_orderdate >= TIMESTAMP '1997-01-01 00:00:00')
                 AS outside,
               count(*) FILTER (
                 WHERE NOT (o_orderdate < TIMESTAMP '1994-01-01 00:00:00'
                         OR o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'))
                 AS inside
        FROM orders""", None),
    "sqlc_time_and_or_dim_filter": ("""
        SELECT count(*) FILTER (
                 WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
                   AND o_orderstatus = 'O') AS t_and_d,
               count(*) FILTER (
                 WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
                    OR o_orderstatus = 'O') AS t_or_d
        FROM orders""", None),
    "sqlc_sum_of_string_cast": ("""
        SELECT CAST(sum(CAST(CAST(o_custkey AS VARCHAR) AS BIGINT))
                    AS BIGINT) AS s
        FROM orders""", None),
    "sqlc_count_distinct_of_case": ("""
        SELECT count(DISTINCT CASE WHEN o_totalprice > 200000
                                   THEN o_custkey END) AS c
        FROM orders""", None),
    "sqlc_count_distinct_substring": ("""
        SELECT count(DISTINCT SUBSTRING(o_orderpriority, 1, 1)) AS c
        FROM orders""", None),
    "sqlc_count_distinct_arithmetic": ("""
        SELECT count(DISTINCT o_orderstatus) * 2 AS c2,
               count(DISTINCT o_orderstatus) + count(*) AS cpn
        FROM orders""", None),
    "sqlc_avg_daily_count_distinct": ("""
        SELECT round(avg(c), 3) AS avg_daily FROM (
          SELECT TIME_FLOOR(ts, 'P1D') AS d,
                 count(DISTINCT user_id) AS c
          FROM events GROUP BY 1) t""", """
        SELECT round(avg(c), 3) AS avg_daily FROM (
          SELECT date_trunc('day', ts) AS d,
                 count(DISTINCT user_id) AS c
          FROM events GROUP BY 1) t"""),
    "sqlc_double_nested_groupby": ("""
        SELECT CAST(sum(cnt) AS BIGINT) AS total, count(*) AS groups
        FROM (SELECT k, count(*) AS cnt
              FROM (SELECT o_orderstatus AS k, o_orderpriority,
                           count(*) AS n0
                    FROM orders GROUP BY 1, 2) i
              GROUP BY k) t""", None),
    "sqlc_histogram_subquery": ("""
        SELECT bucket, count(*) AS n FROM (
          SELECT o_custkey, CAST(FLOOR(count(*) / 5) AS BIGINT) AS bucket
          FROM orders GROUP BY 1) t
        GROUP BY 1 ORDER BY 1""", None),
    "sqlc_regexp_extract_group": ("""
        SELECT REGEXP_EXTRACT('Customer#0001', '#([0-9]+)', 1) AS g""", """
        SELECT '0001' AS g"""),
    "sqlc_regexp_filter_not_null": ("""
        SELECT count(*) AS n FROM part
        WHERE REGEXP_EXTRACT(p_name, '^gre') IS NOT NULL""", """
        SELECT count(*) AS n FROM part
        WHERE regexp_matches(p_name, '^gre')"""),
    "sqlc_filter_on_time_floor": ("""
        SELECT count(*) AS n FROM orders
        WHERE TIME_FLOOR(o_orderdate, 'P1M')
              = TIMESTAMP '1996-03-01 00:00:00'""", """
        SELECT count(*) AS n FROM orders
        WHERE date_trunc('month', o_orderdate)
              = TIMESTAMP '1996-03-01 00:00:00'"""),
    "sqlc_remove_useless_case": ("""
        SELECT count(*) AS n FROM orders
        WHERE CASE WHEN 1 = 1 THEN true ELSE false END""", """
        SELECT count(*) AS n FROM orders"""),
    "sqlc_collapsible_nested_select": ("""
        SELECT o_orderstatus, count(*) AS n
        FROM (SELECT o_orderstatus
              FROM (SELECT * FROM orders) a) b
        GROUP BY 1 ORDER BY 1""", None),
    "sqlc_exact_vs_approx_distinct": ("""
        SELECT e = a AS same FROM (
          SELECT count(DISTINCT o_custkey) AS e,
                 APPROX_COUNT_DISTINCT(o_custkey) AS a
          FROM orders) t""", """
        SELECT true AS same"""),
    "sqlc_count_distinct_of_trim": ("""
        SELECT count(DISTINCT TRIM(CONCAT(' ', o_orderstatus, ' '))) AS c
        FROM orders""", """
        SELECT count(DISTINCT trim(' ' || o_orderstatus || ' ')) AS c
        FROM orders"""),
    # --- batch 12 (round 4): join matrix, CUBE/GROUPING(), VALUES,
    # window NTH_VALUE/LAG defaults, subquery limits
    # (CalciteJoinQueryTest / remaining CalciteQueryTest families) ---
    "sqlc_cube_grouping_fn": ("""
        SELECT coalesce(o_orderstatus, 'ALL') AS st,
               coalesce(o_orderpriority, 'ALL') AS pr,
               CAST(GROUPING(o_orderstatus) AS BIGINT) AS g,
               count(*) AS n
        FROM orders
        GROUP BY CUBE (o_orderstatus, o_orderpriority)
        ORDER BY st, pr""", None),
    "sqlc_timestampdiff_day_hour": ("""
        SELECT TIMESTAMPDIFF(DAY, TIMESTAMP '2024-01-01 00:00:00',
                             TIMESTAMP '2024-03-01 12:00:00') AS d,
               TIMESTAMPDIFF(HOUR, TIMESTAMP '2024-01-01 00:00:00',
                             TIMESTAMP '2024-01-03 06:00:00') AS h""", """
        SELECT 60 AS d, 54 AS h"""),
    "sqlc_timestamp_to_millis": ("""
        SELECT TIMESTAMP_TO_MILLIS(TIMESTAMP '2024-01-01 00:00:00')
               AS ms""", """
        SELECT CAST(1704067200000 AS BIGINT) AS ms"""),
    "sqlc_current_timestamp_sane": ("""
        SELECT CURRENT_TIMESTAMP > TIMESTAMP '2020-01-01 00:00:00'
               AS ok""", """
        SELECT true AS ok"""),
    "sqlc_left_join_null_side_count": ("""
        SELECT r_name, CAST(count(c_custkey) AS BIGINT) AS n
        FROM region LEFT JOIN nation ON r_regionkey = n_regionkey
        LEFT JOIN customer ON c_nationkey = n_nationkey
                          AND c_acctbal > 9999
        GROUP BY 1 ORDER BY 1""", None),
    "sqlc_full_outer_join": ("""
        SELECT count(*) AS n FROM
          (SELECT n_nationkey FROM nation WHERE n_nationkey < 5) a
        FULL OUTER JOIN
          (SELECT n_nationkey AS k FROM nation
           WHERE n_nationkey >= 3 AND n_nationkey < 8) b
        ON a.n_nationkey = b.k""", None),
    "sqlc_right_join": ("""
        SELECT count(*) AS n FROM
          (SELECT n_nationkey FROM nation WHERE n_nationkey < 3) a
        RIGHT JOIN nation b ON a.n_nationkey = b.n_nationkey""", None),
    "sqlc_cross_join_count": ("""
        SELECT count(*) AS n FROM region a CROSS JOIN region b""", None),
    "sqlc_inequality_join": ("""
        SELECT count(*) AS n FROM region a
        JOIN region b ON a.r_regionkey < b.r_regionkey""", None),
    "sqlc_intersect_subquery_count": ("""
        SELECT count(*) AS n FROM (
          SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
          INTERSECT
          SELECT o_custkey FROM orders WHERE o_orderstatus = 'O') t""",
     None),
    "sqlc_values_inline": ("""
        SELECT v, n FROM (VALUES ('a', 1), ('b', 2)) AS t(v, n)
        ORDER BY v""", None),
    "sqlc_order_nulls_first_expr": ("""
        SELECT NULLIF(o_orderstatus, 'O') AS s, count(*) AS n
        FROM orders GROUP BY 1 ORDER BY s NULLS FIRST""", None),
    "sqlc_limit_in_subquery_agg": ("""
        SELECT round(sum(o_totalprice), 2) AS s FROM (
          SELECT o_totalprice FROM orders
          ORDER BY o_totalprice DESC LIMIT 10) t""", None),
    "sqlc_distinct_order_limit": ("""
        SELECT DISTINCT o_orderpriority FROM orders
        ORDER BY 1 LIMIT 3""", None),
    "sqlc_nth_value_lag_default": ("""
        SELECT s, NTH_VALUE(s, 2) OVER (ORDER BY s
                 ROWS BETWEEN UNBOUNDED PRECEDING
                          AND UNBOUNDED FOLLOWING) AS second_s,
               LAG(s, 2, 'none') OVER (ORDER BY s) AS lag2
        FROM (SELECT DISTINCT o_orderstatus AS s FROM orders) t
        ORDER BY s""", None),
    "sqlc_window_partition_filter": ("""
        SELECT o_orderstatus, pr, n FROM (
          SELECT o_orderstatus, o_orderpriority AS pr, count(*) AS n,
                 RANK() OVER (PARTITION BY o_orderstatus
                              ORDER BY count(*) DESC,
                                       o_orderpriority) AS r
          FROM orders
          WHERE o_orderpriority NOT LIKE '3%'
          GROUP BY 1, 2) t
        WHERE r <= 2 ORDER BY o_orderstatus, pr""", None),
    # ---- batch 13: CalciteSubqueryTest / CalciteCorrelatedQueryTest /
    # CalciteMultiValueStringQueryTest / CalciteJoinQueryTest shapes ----
    # testExactCountDistinctUsingSubqueryWithWhereToOuterFilter
    "sqlc_cd_subquery_outer_filter": ("""
        SELECT count(*) AS n_segs FROM (
          SELECT DISTINCT c_mktsegment FROM customer
          WHERE c_nationkey < 10) t""", None),
    # testExactCountDistinctOfSemiJoinResult (CalciteSubqueryTest.java:340)
    "sqlc_cd_semijoin": ("""
        SELECT count(DISTINCT o_custkey) AS n FROM orders
        WHERE o_custkey IN (SELECT c_custkey FROM customer
                            WHERE c_mktsegment = 'BUILDING')""", None),
    # testUsingSubqueryAsFilterWithInnerSort (CalciteSubqueryTest.java:496;
    # inner ORDER BY is semantically a no-op under IN)
    "sqlc_subquery_filter_inner_sort": ("""
        SELECT n_name FROM nation
        WHERE n_regionkey IN (
          SELECT r_regionkey FROM region
          WHERE r_name LIKE 'A%' ORDER BY r_name)
        ORDER BY n_name""", None),
    # testUsingSubqueryAsFilterOnTwoColumns (CalciteSubqueryTest.java:545)
    "sqlc_subquery_filter_two_cols": ("""
        SELECT o_orderkey, o_orderstatus, o_orderpriority FROM orders
        WHERE (o_orderstatus, o_orderpriority) IN (
          SELECT o_orderstatus, o_orderpriority FROM (
            SELECT o_orderstatus, o_orderpriority, count(*) AS n
            FROM orders WHERE o_orderstatus = 'F'
            GROUP BY o_orderstatus, o_orderpriority
            HAVING count(*) > 980) t)
        ORDER BY o_orderkey LIMIT 15""", """
        SELECT o_orderkey, o_orderstatus, o_orderpriority FROM orders o
        WHERE EXISTS (
          SELECT 1 FROM (
            SELECT o_orderstatus AS st, o_orderpriority AS pr,
                   count(*) AS n
            FROM orders WHERE o_orderstatus = 'F'
            GROUP BY 1, 2 HAVING count(*) > 980) t
          WHERE t.st = o.o_orderstatus AND t.pr = o.o_orderpriority)
        ORDER BY o_orderkey LIMIT 15"""),
    # testMinMaxAvgDailyCountWithLimit (CalciteSubqueryTest.java:606)
    "sqlc_min_max_avg_daily_count": ("""
        SELECT max(cnt) AS mx, min(cnt) AS mn,
               CAST(round(avg(cnt), 2) AS DOUBLE) AS av,
               TIME_EXTRACT(max(t), 'EPOCH') AS last_time,
               count(1) AS num_days
        FROM (SELECT TIME_FLOOR(ts, 'P1D') AS t, count(1) AS cnt
              FROM events GROUP BY 1) tt""", """
        SELECT max(cnt) AS mx, min(cnt) AS mn,
               round(avg(cnt), 2) AS av,
               CAST(epoch(max(t)) AS BIGINT) AS last_time,
               count(1) AS num_days
        FROM (SELECT date_trunc('day', ts)::TIMESTAMP AS t,
                     count(1) AS cnt
              FROM events GROUP BY 1) tt"""),
    # testUsingSubqueryWithLimit (CalciteSubqueryTest.java)
    "sqlc_subquery_with_limit": ("""
        SELECT o_orderstatus, count(*) AS cnt FROM (
          SELECT * FROM orders ORDER BY o_orderkey LIMIT 10) t
        GROUP BY o_orderstatus ORDER BY o_orderstatus""", None),
    # testSelfJoin (CalciteSubqueryTest.java; comma-join count)
    "sqlc_self_join_count": ("""
        SELECT count(*) AS n FROM nation x, nation y""", None),
    # testGroupBySubqueryWithEarliestAggregator (CalciteSubqueryTest.java)
    # (date-grain __time ties broken by the unique key so both engines
    # pick the same row, as the reference does with segment row order)
    "sqlc_earliest_subquery": ("""
        SELECT first_status, count(*) AS n_cust FROM (
          SELECT o_custkey,
                 EARLIEST_BY(o_orderstatus,
                   TIME_EXTRACT(o_orderdate, 'EPOCH') * 1000000000
                     + o_orderkey) AS first_status
          FROM orders GROUP BY o_custkey) t
        GROUP BY first_status ORDER BY first_status""", """
        SELECT first_status, count(*) AS n_cust FROM (
          SELECT o_custkey,
                 min_by(o_orderstatus,
                   CAST(epoch(o_orderdate) AS BIGINT) * 1000000000
                     + o_orderkey) AS first_status
          FROM orders GROUP BY o_custkey) t
        GROUP BY first_status ORDER BY first_status"""),
    # testScalarInArrayToUseHavingFilter (CalciteSubqueryTest.java:1576)
    "sqlc_scalar_in_array_having": ("""
        SELECT seg FROM (
          SELECT c_mktsegment AS seg, STRLEN(c_mktsegment) AS ln
          FROM customer GROUP BY c_mktsegment) t
        WHERE SCALAR_IN_ARRAY(ln, ARRAY[8, 9])
        ORDER BY seg""", """
        SELECT seg FROM (
          SELECT c_mktsegment AS seg, length(c_mktsegment) AS ln
          FROM customer GROUP BY c_mktsegment) t
        WHERE list_contains([8, 9], ln)
        ORDER BY seg"""),
    # CalciteCorrelatedQueryTest.testCorrelatedSubquery (correlated
    # scalar aggregate in the select list)
    "sqlc_correlated_scalar_agg": ("""
        SELECT n_name,
               (SELECT count(*) FROM customer c
                WHERE c.c_nationkey = n.n_nationkey) AS n_cust
        FROM nation n ORDER BY n_name""", None),
    # testMultiValueStringOverlapFilter (CalciteMultiValueStringQueryTest)
    "sqlc_mv_overlap_filter": ("""
        SELECT p_type, count(*) AS n FROM part
        WHERE MV_OVERLAP(STRING_TO_MV(p_type, ' '),
                         ARRAY['ECONOMY', 'PROMO'])
        GROUP BY p_type ORDER BY p_type""", """
        SELECT p_type, count(*) AS n FROM part
        WHERE len(list_intersect(string_split(p_type, ' '),
                                 ['ECONOMY', 'PROMO'])) > 0
        GROUP BY p_type ORDER BY p_type"""),
    # testMultiValueStringContainsFilter + NOT composition (real
    # multi-word MVD: tokenized document text)
    "sqlc_mv_contains_filter": ("""
        SELECT lang, count(*) AS n FROM documents
        WHERE MV_CONTAINS(STRING_TO_MV(LOWER(text), ' '), 'the')
          AND NOT MV_CONTAINS(STRING_TO_MV(LOWER(text), ' '), 'zzz')
        GROUP BY lang ORDER BY lang""", """
        SELECT lang, count(*) AS n FROM documents
        WHERE list_contains(string_split(lower(text), ' '), 'the')
          AND NOT list_contains(string_split(lower(text), ' '), 'zzz')
        GROUP BY lang ORDER BY lang"""),
    # testMultiValueStringSelfConcatScan
    "sqlc_mv_self_concat": ("""
        SELECT r_name,
               MV_TO_STRING(MV_CONCAT(STRING_TO_MV(r_name, ' '),
                                      STRING_TO_MV(r_name, ' ')),
                            ',') AS doubled
        FROM region ORDER BY r_name""", """
        SELECT r_name,
               array_to_string(list_concat(string_split(r_name, ' '),
                                           string_split(r_name, ' ')),
                               ',') AS doubled
        FROM region ORDER BY r_name"""),
    # testMultiValueToArrayGroupAsArrayWithMultiValueDimension — whole-
    # array grouping via MV_TO_ARRAY (vs implicit MVD explode)
    "sqlc_mv_to_array_groupby": ("""
        SELECT MV_TO_STRING(MV_TO_ARRAY(
                 STRING_TO_MV(o_orderpriority, '-')), '|') AS pri_arr,
               count(*) AS n
        FROM orders GROUP BY MV_TO_ARRAY(STRING_TO_MV(o_orderpriority, '-'))
        ORDER BY pri_arr""", """
        SELECT array_to_string(string_split(o_orderpriority, '-'), '|')
                 AS pri_arr,
               count(*) AS n
        FROM orders GROUP BY string_split(o_orderpriority, '-')
        ORDER BY pri_arr"""),
    # testMultiValueListFilterComposedMultipleExpressions (projection +
    # aggregate over a filtered MV)
    "sqlc_mv_filter_composed_expr": ("""
        SELECT MV_LENGTH(MV_FILTER_ONLY(STRING_TO_MV(LOWER(text), ' '),
                 ARRAY['the', 'a', 'of', 'and'])) AS n_stop,
               count(*) AS n
        FROM documents GROUP BY 1 ORDER BY 1 NULLS FIRST""", """
        SELECT CASE WHEN x = 0 THEN NULL ELSE x END AS n_stop,
               count(*) AS n
        FROM (SELECT len(list_filter(string_split(lower(text), ' '),
                 x -> list_contains(['the', 'a', 'of', 'and'], x)))
                 AS x FROM documents)
        GROUP BY 1 ORDER BY 1 NULLS FIRST"""),
    # testMvContainsOnMvConcat
    "sqlc_mv_contains_concat": ("""
        SELECT count(*) AS n FROM supplier
        WHERE MV_CONTAINS(MV_CONCAT(STRING_TO_MV(s_name, '#'),
                                    ARRAY['sentinel']), 'sentinel')""", """
        SELECT count(*) AS n FROM supplier
        WHERE list_contains(list_concat(string_split(s_name, '#'),
                                        ['sentinel']), 'sentinel')"""),
    # testStringToMVOfStringAgg (STRING_TO_MV over an aggregate result)
    "sqlc_string_to_mv_of_agg": ("""
        SELECT MV_LENGTH(STRING_TO_MV(
                 STRING_AGG(DISTINCT r_name, ','), ',')) AS n_regions
        FROM region""", """
        SELECT CAST(len(string_split(
                 string_agg(DISTINCT r_name, ','), ',')) AS INT)
                 AS n_regions
        FROM region"""),
    # CalciteJoinQueryTest: join condition on an expression of the key
    "sqlc_join_on_key_expression": ("""
        SELECT n.n_name, r.r_name FROM nation n
        JOIN region r ON n.n_regionkey + 1 = r.r_regionkey + 1
        WHERE r.r_name LIKE '%A%'
        ORDER BY n.n_name""", None),
    # CalciteJoinQueryTest: aggregate-then-limit over a join (topN on join)
    "sqlc_topn_on_join": ("""
        SELECT r.r_name, count(*) AS n_nations FROM nation n
        JOIN region r ON n.n_regionkey = r.r_regionkey
        GROUP BY r.r_name ORDER BY n_nations DESC, r.r_name LIMIT 3""",
        None),
    # CalciteJoinQueryTest: three-way join, filters on each side
    "sqlc_three_way_join_filtered": ("""
        SELECT r.r_name, n.n_name, count(*) AS n_cust
        FROM customer c
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        WHERE c.c_acctbal > 5000 AND r.r_name <> 'AFRICA'
          AND n.n_name LIKE '%A%'
        GROUP BY r.r_name, n.n_name
        ORDER BY r.r_name, n.n_name""", None),
    # CalciteJoinQueryTest: LEFT JOIN against an aggregated subquery,
    # COALESCE over the null-extended agg
    "sqlc_left_join_agg_subquery": ("""
        SELECT n.n_name, COALESCE(t.n_cust, 0) AS n_cust
        FROM nation n
        LEFT JOIN (SELECT c_nationkey, count(*) AS n_cust
                   FROM customer WHERE c_acctbal > 9000
                   GROUP BY c_nationkey) t
          ON n.n_nationkey = t.c_nationkey
        ORDER BY n.n_name""", None),
    # CalciteJoinQueryTest: IN-subquery whose body is itself a join
    "sqlc_in_subquery_over_join": ("""
        SELECT count(*) AS n FROM orders
        WHERE o_custkey IN (
          SELECT c.c_custkey FROM customer c
          JOIN nation n ON c.c_nationkey = n.n_nationkey
          WHERE n.n_name = 'CHINA')""", None),
    # ---- batch 14: window corpus (sql/src/test/resources/calcite/
    # tests/window/*.sqlTest) ----
    # wikipediaFramedAggregations.sqlTest: window over a GROUP BY
    # result, SUM(SUM(x)) with an asymmetric ROWS frame
    "sqlc_window_over_groupby_framed": ("""
        SELECT event_type,
               TIME_FLOOR(ts, 'P1D') AS d,
               CAST(round(SUM(value), 2) AS DOUBLE) AS delta,
               CAST(round(SUM(SUM(value)) OVER (
                 PARTITION BY event_type ORDER BY TIME_FLOOR(ts, 'P1D')
                 ROWS BETWEEN 3 PRECEDING AND 2 FOLLOWING), 2) AS DOUBLE)
                 AS windowed_delta
        FROM events GROUP BY 1, 2
        ORDER BY event_type, d LIMIT 40""", """
        SELECT event_type,
               date_trunc('day', ts)::TIMESTAMP AS d,
               round(SUM(value), 2) AS delta,
               round(SUM(SUM(value)) OVER (
                 PARTITION BY event_type
                 ORDER BY date_trunc('day', ts)::TIMESTAMP
                 ROWS BETWEEN 3 PRECEDING AND 2 FOLLOWING), 2)
                 AS windowed_delta
        FROM events GROUP BY 1, 2
        ORDER BY event_type, d LIMIT 40"""),
    # allBoundsCombination.sqlTest: every ROWS bound pairing
    "sqlc_window_all_bounds": ("""
        SELECT r_name,
          count(*) OVER (ORDER BY r_name
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS c1,
          count(*) OVER (ORDER BY r_name
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c2,
          count(*) OVER (ORDER BY r_name
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 FOLLOWING) AS c3,
          count(*) OVER (ORDER BY r_name
            ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING) AS c5,
          count(*) OVER (ORDER BY r_name
            ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING) AS c7,
          count(*) OVER (ORDER BY r_name
            ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS c9,
          count(*) OVER (ORDER BY r_name
            ROWS BETWEEN 1 FOLLOWING AND 3 FOLLOWING) AS c10,
          count(*) OVER (ORDER BY r_name
            ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS c12
        FROM region ORDER BY r_name""", None),
    # range_handling.sqlTest: ROWS vs RANGE cumulative counts over a
    # tied ordering key (peers counted by RANGE, not by ROWS)
    "sqlc_window_rows_vs_range": ("""
        SELECT CAST(FLOOR(p_size / 10) AS DOUBLE) AS bucket,
          DENSE_RANK() OVER (ORDER BY FLOOR(p_size / 10)) AS dr,
          count(1) OVER (ORDER BY FLOOR(p_size / 10)
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c_rows,
          count(1) OVER (ORDER BY FLOOR(p_size / 10)
            RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c_range,
          count(1) OVER (ORDER BY FLOOR(p_size / 10)
            ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS p_rows,
          count(1) OVER (ORDER BY FLOOR(p_size / 10)
            RANGE BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS p_range
        FROM (SELECT p_size FROM part ORDER BY p_partkey LIMIT 50) t
        ORDER BY bucket, c_rows""", """
        SELECT CAST(FLOOR(p_size / 10) AS DOUBLE) AS bucket,
          DENSE_RANK() OVER (ORDER BY FLOOR(p_size / 10)) AS dr,
          count(1) OVER (ORDER BY FLOOR(p_size / 10)
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c_rows,
          count(1) OVER (ORDER BY FLOOR(p_size / 10)
            RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c_range,
          count(1) OVER (ORDER BY FLOOR(p_size / 10)
            ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS p_rows,
          count(1) OVER (ORDER BY FLOOR(p_size / 10)
            RANGE BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS p_range
        FROM (SELECT p_size FROM part ORDER BY p_partkey LIMIT 50) t
        ORDER BY bucket, c_rows"""),
    # orderByDescNulls.sqlTest: DESC NULLS LAST vs NULLS FIRST in
    # window ordering (NULLs synthesized via NULLIF)
    "sqlc_window_desc_nulls": ("""
        SELECT o_orderkey,
          ROW_NUMBER() OVER (
            ORDER BY NULLIF(o_orderstatus, 'O') DESC NULLS LAST,
                     o_orderkey) AS rn_desc_nl,
          ROW_NUMBER() OVER (
            ORDER BY NULLIF(o_orderstatus, 'O') NULLS FIRST,
                     o_orderkey) AS rn_asc_nf
        FROM (SELECT * FROM orders ORDER BY o_orderkey LIMIT 30) t
        ORDER BY o_orderkey""", None),
    # WindowOpReorder.sqlTest: two windows needing different
    # partition/sort orders in one projection
    "sqlc_window_reorder": ("""
        SELECT l_linenumber, l_returnflag,
          CAST(round(SUM(l_quantity) OVER (PARTITION BY l_returnflag), 2)
               AS DOUBLE) AS sum1,
          CAST(round(SUM(l_linenumber) OVER (), 2) AS DOUBLE) AS sum2
        FROM (SELECT DISTINCT l_linenumber, l_returnflag,
                     CAST(l_quantity AS DOUBLE) AS l_quantity
              FROM lineitem WHERE l_orderkey < 100) t
        ORDER BY l_linenumber, l_returnflag""", """
        SELECT l_linenumber, l_returnflag,
          round(SUM(l_quantity) OVER (PARTITION BY l_returnflag), 2)
            AS sum1,
          round(SUM(l_linenumber) OVER (), 2) AS sum2
        FROM (SELECT DISTINCT l_linenumber, l_returnflag,
                     CAST(l_quantity AS DOUBLE) AS l_quantity
              FROM lineitem WHERE l_orderkey < 100) t
        ORDER BY l_linenumber, l_returnflag"""),
    # windowInsideSubquery.sqlTest: rank computed in a subquery,
    # filtered outside
    "sqlc_window_inside_subquery": ("""
        SELECT n_name, rk FROM (
          SELECT n_name,
                 RANK() OVER (PARTITION BY n_regionkey
                              ORDER BY n_name) AS rk
          FROM nation) t
        WHERE rk = 1 ORDER BY n_name""", None),
    # duplicateAggregation.sqlTest: identical aggregate under two frames
    "sqlc_window_duplicate_agg": ("""
        SELECT r_regionkey,
          count(*) OVER (ORDER BY r_regionkey) AS a,
          count(*) OVER (ORDER BY r_regionkey
            ROWS BETWEEN UNBOUNDED PRECEDING
                     AND UNBOUNDED FOLLOWING) AS b
        FROM region ORDER BY r_regionkey""", None),
    # virtualColumns.sqlTest: window keyed on an expression
    "sqlc_window_virtual_col": ("""
        SELECT UPPER(n_name) AS uname,
          LAG(UPPER(n_name)) OVER (ORDER BY UPPER(n_name)) AS prev_name
        FROM nation ORDER BY uname LIMIT 10""", None),
    # aggregateConstant.sqlTest: SUM over a constant operand
    "sqlc_window_aggregate_constant": ("""
        SELECT r_name,
          CAST(SUM(2) OVER (ORDER BY r_name
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
            AS running_two
        FROM region ORDER BY r_name""", None),
    # arrayAggWithOrderBy.sqlTest: ARRAY_AGG as a window function over
    # a running frame
    "sqlc_window_array_agg": ("""
        SELECT r_name,
          ARRAY_TO_STRING(ARRAY_AGG(r_name) OVER (ORDER BY r_name
            ROWS BETWEEN 1 PRECEDING AND CURRENT ROW), ',') AS trail
        FROM region ORDER BY r_name""", """
        SELECT r_name,
          array_to_string(array_agg(r_name) OVER (ORDER BY r_name
            ROWS BETWEEN 1 PRECEDING AND CURRENT ROW), ',') AS trail
        FROM region ORDER BY r_name"""),
    # ---- batch 15: CalciteQueryTest general shapes ----
    # testCountDistinctOfCaseWhen
    "sqlc_count_distinct_case": ("""
        SELECT COUNT(DISTINCT CASE WHEN o_totalprice > 100000
                                   THEN o_custkey END) AS big_cust,
               COUNT(DISTINCT CASE WHEN o_orderstatus = 'F'
                                   THEN o_orderpriority END) AS f_pri
        FROM orders""", None),
    # testCountDistinctOfSubstring / testCountDistinctOfTrim
    "sqlc_cd_substring_trim": ("""
        SELECT COUNT(DISTINCT SUBSTRING(c_name, 1, 10)) AS pfx,
               COUNT(DISTINCT TRIM(c_mktsegment)) AS segs
        FROM customer""", None),
    # testCoalesceColumnsFilterWithEquality (COALESCE of two nullable
    # columns grouped + filtered; NULLs synthesized via NULLIF)
    "sqlc_coalesce_columns_filter": ("""
        SELECT COALESCE(NULLIF(o_orderstatus, 'O'),
                        o_orderpriority) AS k, count(*) AS n
        FROM orders
        WHERE COALESCE(NULLIF(o_orderstatus, 'O'), o_orderpriority)
              IN ('F', '1-URGENT')
        GROUP BY 1 ORDER BY 1""", None),
    # testDecomposeCaseWhenThreeArg + testNvlColumns
    "sqlc_decompose_case_nvl": ("""
        SELECT CASE WHEN NULLIF(l_returnflag, 'N') IS NULL
                    THEN 'none' ELSE l_returnflag END AS flag3,
               NVL(NULLIF(l_linestatus, 'O'), 'open') AS st,
               count(*) AS n
        FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""", """
        SELECT CASE WHEN NULLIF(l_returnflag, 'N') IS NULL
                    THEN 'none' ELSE l_returnflag END AS flag3,
               COALESCE(NULLIF(l_linestatus, 'O'), 'open') AS st,
               count(*) AS n
        FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2"""),
    # testTimeseriesUsingTimeFloorWithOrigin (origin-anchored buckets)
    "sqlc_time_floor_origin": ("""
        SELECT TIME_FLOOR(ts, 'PT6H',
                          TIMESTAMP '2024-01-01 02:30:00') AS bucket,
               count(*) AS n
        FROM events GROUP BY 1 ORDER BY 1 LIMIT 20""", """
        SELECT make_timestamp(CAST(
                 (epoch_ms(TIMESTAMP '2024-01-01 02:30:00')
                  + floor((epoch_ms(ts)
                           - epoch_ms(TIMESTAMP '2024-01-01 02:30:00'))
                          / 21600000.0) * 21600000) * 1000 AS BIGINT))
                 AS bucket,
               count(*) AS n
        FROM events GROUP BY 1 ORDER BY 1 LIMIT 20"""),
    # TIME_FLOOR with an explicit NULL origin equals the 2-arg form
    # (TimeFloorOperatorConversion passes null origin through)
    "sqlc_time_floor_null_origin": ("""
        SELECT TIME_FLOOR(ts, 'PT6H', NULL) AS bucket, count(*) AS n
        FROM events GROUP BY 1 ORDER BY 1 LIMIT 20""", """
        SELECT make_timestamp(CAST(floor(epoch_ms(ts) / 21600000.0)
                 * 21600000 * 1000 AS BIGINT)) AS bucket, count(*) AS n
        FROM events GROUP BY 1 ORDER BY 1 LIMIT 20"""),
    # BloomKFilter.addBytes/testBytes(null): a recorded NULL matches a
    # NULL probe; an unrecorded one doesn't (bloom-filter extension)
    "sqlc_bloom_null_probe": ("""
        SELECT BLOOM_FILTER_TEST(CAST(NULL AS VARCHAR),
                 (SELECT BLOOM_FILTER(x, 10) FROM
                  (SELECT CAST(NULL AS VARCHAR) AS x) t1)) AS null_hit,
               BLOOM_FILTER_TEST(CAST(NULL AS VARCHAR),
                 (SELECT BLOOM_FILTER(x, 10) FROM
                  (SELECT 'a' AS x) t2)) AS null_miss""", """
        SELECT TRUE AS null_hit, FALSE AS null_miss"""),
    # testTimeseriesUsingTimeFloorWithTimeShift
    "sqlc_time_floor_timeshift": ("""
        SELECT TIME_FLOOR(TIME_SHIFT(ts, 'PT1H', -1), 'P1D') AS d,
               count(*) AS n
        FROM events GROUP BY 1 ORDER BY 1 LIMIT 10""", """
        SELECT date_trunc('day', ts - INTERVAL 1 HOUR)::TIMESTAMP AS d,
               count(*) AS n
        FROM events GROUP BY 1 ORDER BY 1 LIMIT 10"""),
    # testSillyQuarters (TIMESTAMPADD QUARTER round trip)
    "sqlc_silly_quarters": ("""
        SELECT TIMESTAMPADD(QUARTER, 3,
                 TIMESTAMP '2024-01-15 00:00:00') AS plus3q,
               TIMESTAMPDIFF(QUARTER, TIMESTAMP '2024-01-15 00:00:00',
                 TIMESTAMP '2024-10-15 00:00:00') AS qdiff
        FROM region ORDER BY r_regionkey LIMIT 1""", """
        SELECT (TIMESTAMP '2024-01-15 00:00:00'
                + INTERVAL 9 MONTH)::TIMESTAMP AS plus3q,
               3 AS qdiff
        FROM region ORDER BY r_regionkey LIMIT 1"""),
    # testInFilterWith23Elements (IN lists above the scalar threshold)
    "sqlc_in_filter_23": ("""
        SELECT count(*) AS n FROM part
        WHERE p_size IN (1,2,3,4,5,6,7,8,9,10,11,12,13,14,15,16,17,
                         18,19,20,21,22,23)""", None),
    # testLeftRightStringOperators
    "sqlc_left_right": ("""
        SELECT r_name, LEFT(r_name, 3) AS l3, RIGHT(r_name, 3) AS r3
        FROM region ORDER BY r_name""", None),
    # testGroupByStringLength
    "sqlc_groupby_string_length": ("""
        SELECT CHAR_LENGTH(c_mktsegment) AS ln, count(*) AS n
        FROM customer GROUP BY 1 ORDER BY 1""", """
        SELECT CAST(length(c_mktsegment) AS INT) AS ln, count(*) AS n
        FROM customer GROUP BY 1 ORDER BY 1"""),
    # testProjectAfterSort (projection narrows a sorted subquery)
    "sqlc_project_after_sort": ("""
        SELECT o_orderpriority FROM (
          SELECT o_orderkey, o_orderpriority FROM orders
          ORDER BY o_orderkey LIMIT 8) t""", """
        SELECT o_orderpriority FROM (
          SELECT o_orderkey, o_orderpriority FROM orders
          ORDER BY o_orderkey LIMIT 8) t ORDER BY o_orderkey"""),
    # testSortProjectAfterNestedGroupBy
    "sqlc_sort_project_nested_groupby": ("""
        SELECT st, n_pri FROM (
          SELECT o_orderstatus AS st, count(DISTINCT o_orderpriority)
                   AS n_pri
          FROM (SELECT o_orderstatus, o_orderpriority FROM orders
                GROUP BY o_orderstatus, o_orderpriority) g
          GROUP BY o_orderstatus) t
        ORDER BY st""", None),
    # testUnionAllSameTableThreeTimes
    "sqlc_union_all_three_times": ("""
        SELECT sum(cnt) AS total FROM (
          SELECT count(*) AS cnt FROM region
          UNION ALL SELECT count(*) AS cnt FROM region
          UNION ALL SELECT count(*) AS cnt FROM region) t""", """
        SELECT CAST(sum(cnt) AS BIGINT) AS total FROM (
          SELECT count(*) AS cnt FROM region
          UNION ALL SELECT count(*) AS cnt FROM region
          UNION ALL SELECT count(*) AS cnt FROM region) t"""),
    # testGroupingSetsWithDummyDimension (constant in grouping sets)
    "sqlc_grouping_sets_dummy": ("""
        SELECT o_orderstatus, 'dummy' AS d, count(*) AS n
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus, 'dummy'), ())
        ORDER BY o_orderstatus NULLS LAST""", """
        SELECT o_orderstatus,
               CASE WHEN o_orderstatus IS NULL THEN NULL
                    ELSE 'dummy' END AS d,
               count(*) AS n
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), ())
        ORDER BY o_orderstatus NULLS LAST"""),
    # testStringAggNumeric
    "sqlc_string_agg_numeric": ("""
        SELECT STRING_AGG(r_regionkey, ',') AS keys
        FROM (SELECT r_regionkey FROM region ORDER BY r_regionkey) t""",
        """
        SELECT string_agg(r_regionkey, ',' ORDER BY r_regionkey) AS keys
        FROM region"""),
    # testTrigonometricFunction + testRadiansAndDegrees
    "sqlc_trig_on_column": ("""
        SELECT CAST(round(SIN(p_size / 10.0), 6) AS DOUBLE) AS s,
               CAST(round(COS(p_size / 10.0), 6) AS DOUBLE) AS c,
               CAST(round(ATAN2(p_size, 7), 6) AS DOUBLE) AS a2,
               CAST(round(DEGREES(RADIANS(p_size)), 6) AS DOUBLE) AS rt
        FROM part ORDER BY p_partkey LIMIT 10""", """
        SELECT round(SIN(p_size / 10.0), 6) AS s,
               round(COS(p_size / 10.0), 6) AS c,
               round(ATAN2(p_size, 7), 6) AS a2,
               round(DEGREES(RADIANS(p_size)), 6) AS rt
        FROM part ORDER BY p_partkey LIMIT 10"""),
    # testRoundFunc (negative digits, 1-arg form)
    "sqlc_round_matrix": ("""
        SELECT CAST(ROUND(o_totalprice) AS DOUBLE) AS r0,
               CAST(ROUND(o_totalprice, -2) AS DOUBLE) AS rneg,
               CAST(ROUND(o_totalprice, 1) AS DOUBLE) AS r1
        FROM orders ORDER BY o_orderkey LIMIT 12""", """
        SELECT ROUND(o_totalprice) AS r0,
               ROUND(o_totalprice, -2) AS rneg,
               ROUND(o_totalprice, 1) AS r1
        FROM orders ORDER BY o_orderkey LIMIT 12"""),
    # testIsNotDistinctFromLiteral — column-vs-column null-safe compare
    "sqlc_is_not_distinct_cols": ("""
        SELECT count(*) AS n FROM orders
        WHERE NULLIF(o_orderstatus, 'O')
              IS NOT DISTINCT FROM NULLIF(o_orderstatus, 'O')""", None),
    # testRegexpExtractFilterViaNotNullCheck
    "sqlc_regexp_extract_notnull": ("""
        SELECT count(*) AS n FROM customer
        WHERE REGEXP_EXTRACT(c_name, '(#0000000[0-9])') IS NOT NULL""",
        """
        SELECT count(*) AS n FROM customer
        WHERE regexp_extract(c_name, '(#0000000[0-9])', 1) <> ''"""),
    # testGroupingAggregatorWithPostAggregator
    "sqlc_grouping_postagg": ("""
        SELECT o_orderstatus,
               GROUPING(o_orderstatus) + 1 AS g1,
               count(*) AS n
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), ())
        ORDER BY o_orderstatus NULLS LAST""", """
        SELECT o_orderstatus,
               CAST(GROUPING(o_orderstatus) + 1 AS BIGINT) AS g1,
               count(*) AS n
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), ())
        ORDER BY o_orderstatus NULLS LAST"""),
    # testHavingOnRatio (ratio of filtered to total count)
    "sqlc_having_rich_ratio": ("""
        SELECT c_mktsegment,
               CAST(SUM(CASE WHEN c_acctbal > 5000 THEN 1 ELSE 0 END)
                    AS DOUBLE) / count(*) AS rich_ratio
        FROM customer GROUP BY c_mktsegment
        HAVING CAST(SUM(CASE WHEN c_acctbal > 5000 THEN 1 ELSE 0 END)
                    AS DOUBLE) / count(*) > 0.4
        ORDER BY c_mktsegment""", None),
    # ---- batch 16: quidem-ut dashboard + RANGE-window + scalar
    # matrices (quidem-ut/src/test/quidem/.../kttm_*.iq,
    # orderby_range_*.iq, scalar_*.iq) ----
    # kttm_Overall.iq: GROUP BY () grand-total with MAX(__time)
    "sqlc_dash_overall": ("""
        SELECT MAX(ts) AS "__VALUE__" FROM events GROUP BY ()""", """
        SELECT MAX(ts) AS "__VALUE__" FROM events"""),
    # kttm_Overall.iq: period-over-period FILTER counts under one
    # covering WHERE (the Pivot compare-period panel)
    "sqlc_dash_compare_periods": ("""
        SELECT
          COUNT(*) FILTER (WHERE TIMESTAMP '2024-01-05 00:00:00' <= ts
                             AND ts < TIMESTAMP '2024-01-06 00:00:00')
            AS v0,
          CAST(round(SUM(value) FILTER (
                 WHERE TIMESTAMP '2024-01-05 00:00:00' <= ts
                   AND ts < TIMESTAMP '2024-01-06 00:00:00'), 2)
               AS DOUBLE) AS v1,
          COUNT(*) FILTER (WHERE TIMESTAMP '2024-01-04 00:00:00' <= ts
                             AND ts < TIMESTAMP '2024-01-05 00:00:00')
            AS v2,
          CAST(round(SUM(value) FILTER (
                 WHERE TIMESTAMP '2024-01-04 00:00:00' <= ts
                   AND ts < TIMESTAMP '2024-01-05 00:00:00'), 2)
               AS DOUBLE) AS v3
        FROM events
        WHERE TIMESTAMP '2024-01-04 00:00:00' <= ts
          AND ts < TIMESTAMP '2024-01-06 00:00:00'
        GROUP BY ()""", """
        SELECT
          COUNT(*) FILTER (WHERE TIMESTAMP '2024-01-05 00:00:00' <= ts
                             AND ts < TIMESTAMP '2024-01-06 00:00:00')
            AS v0,
          round(SUM(value) FILTER (
                 WHERE TIMESTAMP '2024-01-05 00:00:00' <= ts
                   AND ts < TIMESTAMP '2024-01-06 00:00:00'), 2) AS v1,
          COUNT(*) FILTER (WHERE TIMESTAMP '2024-01-04 00:00:00' <= ts
                             AND ts < TIMESTAMP '2024-01-05 00:00:00')
            AS v2,
          round(SUM(value) FILTER (
                 WHERE TIMESTAMP '2024-01-04 00:00:00' <= ts
                   AND ts < TIMESTAMP '2024-01-05 00:00:00'), 2) AS v3
        FROM events
        WHERE TIMESTAMP '2024-01-04 00:00:00' <= ts
          AND ts < TIMESTAMP '2024-01-06 00:00:00'"""),
    # kttm_sunburst/Stackarea: FLOOR(x/10)*10 histogram buckets
    "sqlc_dash_histogram_buckets": ("""
        SELECT CAST(FLOOR(CAST(value AS DOUBLE) / 10) * 10 AS DOUBLE)
                 AS bucket
        FROM events
        WHERE TIMESTAMP '2024-01-05 00:00:00' <= ts
          AND ts < TIMESTAMP '2024-01-06 00:00:00'
        GROUP BY 1 ORDER BY bucket ASC LIMIT 101""", """
        SELECT FLOOR(CAST(value AS DOUBLE) / 10) * 10 AS bucket
        FROM events
        WHERE TIMESTAMP '2024-01-05 00:00:00' <= ts
          AND ts < TIMESTAMP '2024-01-06 00:00:00'
        GROUP BY 1 ORDER BY bucket ASC LIMIT 101"""),
    # kttm_Spotmatrix: JSON_VALUE dim + hourly TIME_FLOOR (4-arg tz
    # form) + IN filter, two-dim grid
    "sqlc_dash_spotmatrix": ("""
        SELECT CAST(JSON_VALUE(props, '$.k') AS BIGINT) AS k,
               TIME_FLOOR(ts, 'PT1H', NULL, 'Etc/UTC') AS h,
               COUNT(*) AS n
        FROM events
        WHERE TIMESTAMP '2024-01-05 00:00:00' <= ts
          AND ts < TIMESTAMP '2024-01-05 06:00:00'
          AND event_type IN ('view', 'click', 'purchase')
          AND CAST(JSON_VALUE(props, '$.k') AS BIGINT) < 10
        GROUP BY 1, 2 ORDER BY 1, 2""", """
        SELECT CAST(json_extract(props, '$.k') AS BIGINT) AS k,
               date_trunc('hour', ts)::TIMESTAMP AS h,
               COUNT(*) AS n
        FROM events
        WHERE TIMESTAMP '2024-01-05 00:00:00' <= ts
          AND ts < TIMESTAMP '2024-01-05 06:00:00'
          AND event_type IN ('view', 'click', 'purchase')
          AND CAST(json_extract(props, '$.k') AS BIGINT) < 10
        GROUP BY 1, 2 ORDER BY 1, 2"""),
    # kttm_Table: top-N panel, count DESC LIMIT 101
    "sqlc_dash_table_topn": ("""
        SELECT event_type AS "Category", COUNT(*) AS "count"
        FROM events
        WHERE TIMESTAMP '2024-01-05 00:00:00' <= ts
          AND ts < TIMESTAMP '2024-01-06 00:00:00'
        GROUP BY 1 ORDER BY "count" DESC, "Category" LIMIT 101""",
        None),
    # kttm_Sparkline / Line-chart: hourly series with count + sum
    "sqlc_dash_line_chart": ("""
        SELECT TIME_FLOOR(ts, 'PT1H') AS h, COUNT(*) AS n,
               CAST(round(SUM(value), 2) AS DOUBLE) AS total
        FROM events
        WHERE TIMESTAMP '2024-01-05 00:00:00' <= ts
          AND ts < TIMESTAMP '2024-01-06 00:00:00'
        GROUP BY 1 ORDER BY 1""", """
        SELECT date_trunc('hour', ts)::TIMESTAMP AS h, COUNT(*) AS n,
               round(SUM(value), 2) AS total
        FROM events
        WHERE TIMESTAMP '2024-01-05 00:00:00' <= ts
          AND ts < TIMESTAMP '2024-01-06 00:00:00'
        GROUP BY 1 ORDER BY 1"""),
    # orderby_range_1_preceding_sum_count.iq: RANGE frame with a
    # numeric offset (peers + value distance, not row distance)
    "sqlc_window_range_numeric_offset": ("""
        SELECT p_size,
          COUNT(*) OVER (ORDER BY p_size
            RANGE BETWEEN 10 PRECEDING AND CURRENT ROW) AS c10,
          CAST(round(SUM(p_retailprice) OVER (ORDER BY p_size
            RANGE BETWEEN 10 PRECEDING AND CURRENT ROW), 2) AS DOUBLE)
            AS s10
        FROM (SELECT * FROM part ORDER BY p_partkey LIMIT 40) t
        ORDER BY p_size, c10""", """
        SELECT p_size,
          COUNT(*) OVER (ORDER BY p_size
            RANGE BETWEEN 10 PRECEDING AND CURRENT ROW) AS c10,
          round(SUM(p_retailprice) OVER (ORDER BY p_size
            RANGE BETWEEN 10 PRECEDING AND CURRENT ROW), 2) AS s10
        FROM (SELECT * FROM part ORDER BY p_partkey LIMIT 40) t
        ORDER BY p_size, c10"""),
    # orderby_range_ub_following_first_last.iq: FIRST/LAST_VALUE over
    # RANGE frames to the partition edge
    "sqlc_window_range_first_last": ("""
        SELECT r_regionkey,
          FIRST_VALUE(r_name) OVER (ORDER BY r_regionkey
            RANGE BETWEEN CURRENT ROW
                      AND UNBOUNDED FOLLOWING) AS fv,
          LAST_VALUE(r_name) OVER (ORDER BY r_regionkey
            RANGE BETWEEN UNBOUNDED PRECEDING
                      AND CURRENT ROW) AS lv
        FROM region ORDER BY r_regionkey""", None),
    # scalar_reduction.iq: GREATEST/LEAST with NULL arms and mixed types
    "sqlc_scalar_reduction": ("""
        SELECT r_regionkey,
          GREATEST(r_regionkey, 2) AS g,
          LEAST(r_regionkey, 2) AS l,
          GREATEST(NULLIF(r_name, 'ASIA'), 'AAA') AS gs
        FROM region ORDER BY r_regionkey""", """
        SELECT r_regionkey,
          GREATEST(r_regionkey, 2) AS g,
          LEAST(r_regionkey, 2) AS l,
          CASE WHEN r_name = 'ASIA' THEN 'AAA'
               ELSE GREATEST(r_name, 'AAA') END AS gs
        FROM region ORDER BY r_regionkey"""),
    # scalar_string.iq: REPEAT/REVERSE/LPAD/RPAD/POSITION matrix
    "sqlc_scalar_string_matrix": ("""
        SELECT r_name,
          REPEAT(LEFT(r_name, 2), 3) AS rep,
          REVERSE(r_name) AS rev,
          LPAD(r_name, 12, '*') AS lp,
          RPAD(r_name, 12, '-') AS rp,
          POSITION('A' IN r_name) AS pos
        FROM region ORDER BY r_name""", """
        SELECT r_name,
          REPEAT(r_name[1:2], 3) AS rep,
          REVERSE(r_name) AS rev,
          LPAD(r_name, 12, '*') AS lp,
          RPAD(r_name, 12, '-') AS rp,
          CAST(POSITION('A' IN r_name) AS INT) AS pos
        FROM region ORDER BY r_name"""),
    # ---- batch 17: multi-unnest / multi-window / JSON edges
    # (quidem-ut array_sql_multi_unnests.iq, basics_multi_windows.iq,
    # funcs_and_sql_func_json_*.iq) ----
    # test_multi_unnests A6_B6_D1: two UNNESTs cross-product per row
    "sqlc_multi_unnest_cross": ("""
        SELECT t.r_regionkey, u1.c1, u2.c2
        FROM region t
        CROSS JOIN UNNEST(STRING_TO_MV(r_name, ' ')) AS u1(c1)
        CROSS JOIN UNNEST(ARRAY['x', 'y']) AS u2(c2)
        ORDER BY t.r_regionkey, u1.c1, u2.c2""", """
        SELECT t.r_regionkey, u1.c1, u2.c2
        FROM region t,
             unnest(string_split(r_name, ' ')) AS u1(c1),
             unnest(['x', 'y']) AS u2(c2)
        ORDER BY t.r_regionkey, u1.c1, u2.c2"""),
    # unnest → aggregate → join back (array_sql_multi_unnests composed)
    "sqlc_unnest_join_agg": ("""
        SELECT tok, count(*) AS n
        FROM (SELECT n.n_name FROM nation n
              JOIN region r ON n.n_regionkey = r.r_regionkey
              WHERE r.r_name <> 'AFRICA') j
        CROSS JOIN UNNEST(STRING_TO_MV(j.n_name, '_')) AS u(tok)
        GROUP BY tok HAVING count(*) > 1
        ORDER BY n DESC, tok""", """
        SELECT tok, count(*) AS n
        FROM nation n
        JOIN region r ON n.n_regionkey = r.r_regionkey,
        unnest(string_split(n_name, '_')) AS u(tok)
        WHERE r.r_name <> 'AFRICA'
        GROUP BY tok HAVING count(*) > 1
        ORDER BY n DESC, tok"""),
    # basics_multi_windows A1_Q1: several windows over different
    # partitions in one projection
    "sqlc_multi_windows": ("""
        SELECT user_id, event_type,
          ROW_NUMBER() OVER (PARTITION BY user_id
                             ORDER BY event_id) AS rn_user,
          RANK() OVER (ORDER BY event_id) AS rk_all,
          COUNT(*) OVER (PARTITION BY event_type) AS n_type
        FROM (SELECT * FROM events ORDER BY event_id LIMIT 50) t
        ORDER BY event_id""", None),
    # funcs_and_sql_func_try_parse_json.iq: malformed input → NULL,
    # valid round-trips through TO_JSON_STRING
    "sqlc_try_parse_json": ("""
        SELECT TO_JSON_STRING(TRY_PARSE_JSON(props)) AS ok,
               TRY_PARSE_JSON('{bad json') IS NULL AS bad_is_null
        FROM events ORDER BY event_id LIMIT 5""", """
        SELECT replace(props, ' ', '') AS ok, true AS bad_is_null
        FROM events ORDER BY event_id LIMIT 5"""),
    # funcs_and_sql_func_json_value.iq: JSON_VALUE RETURNING arms over
    # a constructed nested object, used in WHERE and GROUP BY
    "sqlc_json_value_returning_arms": ("""
        SELECT JSON_VALUE(doc, '$.a.b' RETURNING BIGINT) AS b,
               count(*) AS n
        FROM (SELECT JSON_OBJECT(KEY 'a' VALUE
                       JSON_OBJECT(KEY 'b' VALUE n_regionkey)) AS doc
              FROM nation) t
        WHERE JSON_VALUE(doc, '$.a.b' RETURNING BIGINT) >= 2
        GROUP BY 1 ORDER BY 1""", """
        SELECT CAST(n_regionkey AS BIGINT) AS b, count(*) AS n
        FROM nation WHERE n_regionkey >= 2
        GROUP BY 1 ORDER BY 1"""),
    # funcs_and_sql_func_json_query.iq: JSON_QUERY subtree extraction
    # serialized back to text
    "sqlc_json_query_subtree": ("""
        SELECT TO_JSON_STRING(JSON_QUERY(doc, '$.a')) AS sub
        FROM (SELECT JSON_OBJECT(KEY 'a' VALUE
                       JSON_OBJECT(KEY 'k' VALUE r_regionkey)) AS doc
              FROM region) t
        ORDER BY sub""", """
        SELECT '{"k":' || r_regionkey || '}' AS sub
        FROM region ORDER BY sub"""),
    # funcs_and_sql_func_json_keys.iq: JSON_KEYS at root and nested
    "sqlc_json_keys_matrix": ("""
        SELECT ARRAY_TO_STRING(JSON_KEYS(doc, '$.'), ',') AS root_keys,
               ARRAY_TO_STRING(JSON_KEYS(doc, '$.a'), ',') AS a_keys
        FROM (SELECT JSON_OBJECT(
                KEY 'a' VALUE JSON_OBJECT(KEY 'x' VALUE 1,
                                          KEY 'y' VALUE 2),
                KEY 'b' VALUE 3) AS doc
              FROM region LIMIT 1) t""", """
        SELECT 'a,b' AS root_keys, 'x,y' AS a_keys
        FROM region LIMIT 1"""),
    # ---- batch 18: CalciteQueryTest remainder A ----
    # testBitwiseAggregatorsGroupBy (BIT_AND/BIT_OR/BIT_XOR aggs)
    "sqlc_bitwise_aggs_groupby": ("""
        SELECT l_linenumber,
               BIT_AND(l_orderkey) AS ba, BIT_OR(l_orderkey) AS bo,
               BIT_XOR(l_orderkey) AS bx
        FROM lineitem WHERE l_orderkey < 64
        GROUP BY l_linenumber ORDER BY l_linenumber""", """
        SELECT l_linenumber,
               CASE WHEN COUNT(l_orderkey) > 0 THEN 0 END AS ba,
               BIT_OR(l_orderkey) AS bo,
               BIT_XOR(l_orderkey) AS bx
        FROM lineitem WHERE l_orderkey < 64
        GROUP BY l_linenumber ORDER BY l_linenumber"""),
    # testAvgDailyCountDistinct
    "sqlc_avg_daily_cd_users": ("""
        SELECT CAST(round(AVG(u), 2) AS DOUBLE) AS avg_daily_users
        FROM (SELECT TIME_FLOOR(ts, 'P1D') AS d,
                     COUNT(DISTINCT user_id) AS u
              FROM events GROUP BY 1) t""", """
        SELECT round(AVG(u), 2) AS avg_daily_users
        FROM (SELECT date_trunc('day', ts) AS d,
                     COUNT(DISTINCT user_id) AS u
              FROM events GROUP BY 1) t"""),
    # testCaseFilteredAggregationWithGroupBy (CASE→filtered-agg rewrite)
    "sqlc_case_filtered_agg": ("""
        SELECT o_orderstatus,
               SUM(CASE WHEN o_totalprice > 150000 THEN 1 ELSE 0 END)
                 AS cnt_big,
               COUNT(*) FILTER (WHERE o_orderpriority = '1-URGENT')
                 AS n_urgent
        FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""",
        """
        SELECT o_orderstatus,
               CAST(SUM(CASE WHEN o_totalprice > 150000
                             THEN 1 ELSE 0 END) AS BIGINT) AS cnt_big,
               COUNT(*) FILTER (WHERE o_orderpriority = '1-URGENT')
                 AS n_urgent
        FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus"""),
    # testColumnComparison (two-column equality incl. cast)
    "sqlc_column_comparison": ("""
        SELECT count(*) AS n FROM lineitem
        WHERE l_linenumber = l_suppkey % 7 + 1""", None),
    # testCompareExactAndApproximateCountDistinctUsingSubquery
    "sqlc_exact_vs_approx_cd": ("""
        SELECT exact_cnt,
               CASE WHEN ABS(approx_cnt - exact_cnt)
                         <= exact_cnt * 0.1 THEN 1 ELSE 0 END AS close
        FROM (SELECT COUNT(DISTINCT o_custkey) AS exact_cnt,
                     APPROX_COUNT_DISTINCT(o_custkey) AS approx_cnt
              FROM orders) t""", """
        SELECT COUNT(DISTINCT o_custkey) AS exact_cnt, 1 AS close
        FROM orders"""),
    # testEmptyResultsAggregatorWithHavingFalse / True
    "sqlc_having_const_false_true": ("""
        SELECT sum(a) AS total FROM (
          SELECT count(*) AS a FROM orders HAVING 1 = 0
          UNION ALL
          SELECT count(*) AS a FROM orders HAVING 1 = 1) t""", """
        SELECT CAST(sum(a) AS BIGINT) AS total FROM (
          SELECT count(*) AS a FROM orders HAVING 1 = 0
          UNION ALL
          SELECT count(*) AS a FROM orders HAVING 1 = 1) t"""),
    # testEmptyStringEquality (''-vs-NULL is the reference's classic
    # null-handling edge; synthesize '' via a CASE)
    "sqlc_empty_string_equality": ("""
        SELECT count(*) AS n_empty,
               COUNT(*) FILTER (WHERE CASE WHEN o_orderstatus = 'O'
                                      THEN '' ELSE o_orderstatus END = '')
                 AS n_eq
        FROM orders""", """
        SELECT count(*) AS n_empty,
               COUNT(*) FILTER (WHERE CASE WHEN o_orderstatus = 'O'
                                      THEN '' ELSE o_orderstatus END = '')
                 AS n_eq
        FROM orders"""),
    # testFilteredAggregationWithNotIn
    "sqlc_filtered_agg_not_in": ("""
        SELECT COUNT(*) FILTER (WHERE o_orderpriority
                                NOT IN ('5-LOW', '4-NOT SPECIFIED'))
                 AS n_hi,
               COUNT(DISTINCT o_custkey) FILTER (
                 WHERE o_orderstatus NOT IN ('P')) AS cust_np
        FROM orders""", None),
    # testGroupByAndOrderByAlias + testGroupByOrdinal
    "sqlc_groupby_ordinal_alias": ("""
        SELECT o_orderstatus AS st, count(*) AS n
        FROM orders GROUP BY 1 ORDER BY st DESC""", None),
    # testGroupByFloat / testGroupByDouble (numeric-typed group keys)
    "sqlc_groupby_double_key": ("""
        SELECT l_discount, count(*) AS n
        FROM lineitem GROUP BY l_discount
        ORDER BY l_discount""", None),
    # testGroupByNothingWithLiterallyFalseFilter (WHERE FALSE global
    # aggregate still returns one row: count 0, null max)
    "sqlc_false_filter_global_agg": ("""
        SELECT count(*) AS n, max(o_totalprice) AS mx
        FROM orders WHERE 1 = 0""", None),
    # testInGroupByLimitOutGroupByOrderBy (inner limit, outer reorder;
    # st tiebreak keeps the top-2 deterministic under equal counts)
    "sqlc_in_limit_out_order": ("""
        SELECT st, n FROM (
          SELECT o_orderstatus AS st, count(*) AS n
          FROM orders GROUP BY 1 ORDER BY n DESC, st LIMIT 2) t
        ORDER BY st ASC""", None),
    # testSumOfExtractionFn (aggregate over a string extraction)
    "sqlc_sum_of_extraction": ("""
        SELECT CAST(SUM(CHAR_LENGTH(o_orderpriority)) AS BIGINT)
                 AS total_len,
               CAST(round(AVG(CHAR_LENGTH(o_orderpriority)), 3)
                    AS DOUBLE) AS avg_len
        FROM orders""", """
        SELECT CAST(SUM(length(o_orderpriority)) AS BIGINT)
                 AS total_len,
               round(AVG(length(o_orderpriority)), 3) AS avg_len
        FROM orders"""),
    # testUnicodeFilterAndGroupBy (non-ASCII literals round-trip)
    "sqlc_unicode_literals": ("""
        SELECT CASE WHEN r_name = 'ASIA' THEN 'アジア'
                    WHEN r_name = 'EUROPE' THEN 'Европа'
                    ELSE r_name END AS localized,
               count(*) AS n
        FROM region GROUP BY 1 ORDER BY 1""", None),
    # testCountNullableExpression
    "sqlc_count_nullable_expr": ("""
        SELECT COUNT(NULLIF(o_orderstatus, 'O')) AS n_not_open,
               COUNT(*) AS n_all
        FROM orders""", None),
    # testSqlIsNullToInFilter (IS NULL OR IN (...) composition)
    "sqlc_is_null_or_in": ("""
        SELECT count(*) AS n FROM orders
        WHERE NULLIF(o_orderstatus, 'O') IS NULL
           OR NULLIF(o_orderstatus, 'O') IN ('F')""", None),
    # testGroupByLimitWrapping (ORDER BY dim DESC LIMIT, not a topN)
    "sqlc_groupby_limit_wrapping": ("""
        SELECT o_orderpriority, o_orderstatus, count(*) AS n
        FROM orders GROUP BY 1, 2
        ORDER BY o_orderpriority DESC, o_orderstatus DESC LIMIT 4""",
        None),
    # ---- batch 19: CalciteQueryTest remainder B ----
    # testCountStarWithBoundFilterSimplifyOr (overlapping bounds fold)
    "sqlc_bound_overlap_or": ("""
        SELECT count(*) AS n FROM part
        WHERE (p_size > 10 AND p_size < 30) OR (p_size > 20 AND p_size < 40)
        """, None),
    # testCountStarWithDegenerateFilter (tautological OR arm)
    "sqlc_degenerate_filter": ("""
        SELECT count(*) AS n FROM orders
        WHERE o_orderstatus = 'F'
          AND (o_orderpriority = '1-URGENT' OR o_orderpriority IS NOT NULL)
        """, None),
    # testCountStarWithComplexDisjointTimeFilter (two disjoint windows)
    "sqlc_disjoint_time_windows": ("""
        SELECT count(*) AS n FROM events
        WHERE (ts >= TIMESTAMP '2024-01-02' AND ts < TIMESTAMP '2024-01-04')
           OR (ts >= TIMESTAMP '2024-01-10' AND ts < TIMESTAMP '2024-01-12')
        """, None),
    # testCountStarWithNotTimeFilter (negated interval)
    "sqlc_not_time_filter": ("""
        SELECT count(*) AS n FROM events
        WHERE NOT (ts >= TIMESTAMP '2024-01-02'
                   AND ts < TIMESTAMP '2024-01-20')""", None),
    # testCountStarWithSinglePointInTime / TwoPointsInTime
    "sqlc_point_in_time": ("""
        SELECT count(*) AS one_pt FROM events
        WHERE ts = (SELECT MIN(ts) FROM events)""", None),
    # testCountStarWithTimeInIntervalFilter (TIME_IN_INTERVAL fn)
    "sqlc_time_in_interval_filter": ("""
        SELECT count(*) AS n FROM events
        WHERE TIME_IN_INTERVAL(ts, '2024-01-03/2024-01-05')""", """
        SELECT count(*) AS n FROM events
        WHERE ts >= TIMESTAMP '2024-01-03'
          AND ts < TIMESTAMP '2024-01-05'"""),
    # testCountStarWithTimeFilterUsingStringLiterals (string-typed
    # timestamp comparisons)
    "sqlc_time_filter_string_literals": ("""
        SELECT count(*) AS n FROM events
        WHERE ts >= '2024-01-03 00:00:00'
          AND ts < '2024-01-05 00:00:00'""", """
        SELECT count(*) AS n FROM events
        WHERE ts >= TIMESTAMP '2024-01-03'
          AND ts < TIMESTAMP '2024-01-05'"""),
    # testCountStarWithTimeFilterOnLongColumnUsingTimestampToMillis
    "sqlc_timestamp_to_millis_filter": ("""
        SELECT count(*) AS n FROM events
        WHERE TIMESTAMP_TO_MILLIS(ts)
              >= TIMESTAMP_TO_MILLIS(TIMESTAMP '2024-01-03 00:00:00')
          AND TIMESTAMP_TO_MILLIS(ts)
              < TIMESTAMP_TO_MILLIS(TIMESTAMP '2024-01-05 00:00:00')""",
        """
        SELECT count(*) AS n FROM events
        WHERE epoch_ms(ts) >= epoch_ms(TIMESTAMP '2024-01-03')
          AND epoch_ms(ts) < epoch_ms(TIMESTAMP '2024-01-05')"""),
    # testGroupByExtractYear / testGroupByFormatYearAndMonth
    "sqlc_groupby_extract_year_month": ("""
        SELECT EXTRACT(YEAR FROM o_orderdate) AS y,
               TIME_FORMAT(o_orderdate, 'yyyy-MM') AS ym,
               count(*) AS n
        FROM orders GROUP BY 1, 2 ORDER BY 1, 2 LIMIT 12""", """
        SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS y,
               strftime(o_orderdate, '%Y-%m') AS ym,
               count(*) AS n
        FROM orders GROUP BY 1, 2 ORDER BY 1, 2 LIMIT 12"""),
    # testGroupByWithSelectAndOrderByProjections (projected expressions
    # of group keys, ordered by another projection)
    "sqlc_groupby_select_order_projections": ("""
        SELECT UPPER(o_orderstatus) AS ust,
               CHAR_LENGTH(o_orderpriority) AS plen,
               count(*) AS n
        FROM orders GROUP BY o_orderstatus, o_orderpriority
        ORDER BY plen DESC, ust, n LIMIT 10""", """
        SELECT UPPER(o_orderstatus) AS ust,
               CAST(length(o_orderpriority) AS INT) AS plen,
               count(*) AS n
        FROM orders GROUP BY o_orderstatus, o_orderpriority
        ORDER BY plen DESC, ust, n LIMIT 10"""),
    # testTimeseriesWithLimitAndOffset
    "sqlc_timeseries_limit_offset": ("""
        SELECT TIME_FLOOR(ts, 'P1D') AS d, count(*) AS n
        FROM events GROUP BY 1 ORDER BY 1
        LIMIT 5 OFFSET 3""", """
        SELECT date_trunc('day', ts)::TIMESTAMP AS d, count(*) AS n
        FROM events GROUP BY 1 ORDER BY 1
        LIMIT 5 OFFSET 3"""),
    # testSubqueryTypeMismatchWithLiterals (int col vs double literal)
    "sqlc_subquery_type_mismatch": ("""
        SELECT count(*) AS n FROM (
          SELECT o_custkey, count(*) AS c FROM orders
          GROUP BY o_custkey) t
        WHERE c > 9.5""", None),
    # testCastCharToVarcharInFlattenConcat (CHAR casts inside CONCAT)
    "sqlc_cast_char_concat": ("""
        SELECT CONCAT(CAST(r_regionkey AS CHAR), ':',
                      CAST(r_name AS VARCHAR)) AS tag
        FROM region ORDER BY tag""", """
        SELECT CAST(r_regionkey AS VARCHAR) || ':' || r_name AS tag
        FROM region ORDER BY tag"""),
    # testGreatestFunctionForNumberWithIsNull
    "sqlc_greatest_is_null": ("""
        SELECT count(*) AS n FROM orders
        WHERE GREATEST(NULLIF(o_totalprice, o_totalprice),
                       NULLIF(o_totalprice, o_totalprice)) IS NULL""",
        None),
    # testDiv (integer division operator semantics)
    "sqlc_div_operator": ("""
        SELECT p_partkey, DIV(p_size, 7) AS d7,
               MOD(p_size, 7) AS m7
        FROM part ORDER BY p_partkey LIMIT 10""", """
        SELECT p_partkey, p_size // 7 AS d7, p_size % 7 AS m7
        FROM part ORDER BY p_partkey LIMIT 10"""),
    # ---- batch 20: nesting / latest-earliest ops / datatype edges ----
    # testDoubleNestedGroupBy (3 levels of aggregation)
    "sqlc_triple_nested_agg": ("""
        SELECT CAST(round(AVG(cust_total), 2) AS DOUBLE) AS avg_total,
               count(*) AS n_status
        FROM (SELECT st, SUM(o_cnt) AS cust_total
              FROM (SELECT o_orderstatus AS st, o_custkey,
                           count(*) AS o_cnt
                    FROM orders GROUP BY 1, 2) inner1
              GROUP BY st) mid""", """
        SELECT round(AVG(cust_total), 2) AS avg_total,
               count(*) AS n_status
        FROM (SELECT st, SUM(o_cnt) AS cust_total
              FROM (SELECT o_orderstatus AS st, o_custkey,
                           count(*) AS o_cnt
                    FROM orders GROUP BY 1, 2) inner1
              GROUP BY st) mid"""),
    # testCollapsibleNestedGroupBy (outer groups on the inner's key —
    # the planner may collapse the two)
    "sqlc_collapsible_nested_groupby": ("""
        SELECT st, SUM(n) AS total FROM (
          SELECT o_orderstatus AS st, o_orderpriority, count(*) AS n
          FROM orders GROUP BY 1, 2) t
        GROUP BY st ORDER BY st""", """
        SELECT st, CAST(SUM(n) AS BIGINT) AS total FROM (
          SELECT o_orderstatus AS st, o_orderpriority, count(*) AS n
          FROM orders GROUP BY 1, 2) t
        GROUP BY st ORDER BY st"""),
    # testOrderByEarliestLong (sort by a time-ordered first-value agg)
    "sqlc_order_by_earliest": ("""
        SELECT o_custkey,
               EARLIEST_BY(o_orderkey,
                 TIME_EXTRACT(o_orderdate, 'EPOCH') * 1000000000
                   + o_orderkey) AS first_order
        FROM orders GROUP BY o_custkey
        ORDER BY first_order ASC LIMIT 10""", """
        SELECT o_custkey,
               min_by(o_orderkey,
                 CAST(epoch(o_orderdate) AS BIGINT) * 1000000000
                   + o_orderkey) AS first_order
        FROM orders GROUP BY o_custkey
        ORDER BY first_order ASC LIMIT 10"""),
    # testHavingOnApproximateCountDistinct (HAVING filters on the
    # approx agg; projected columns stay exact so the oracle holds)
    "sqlc_having_approx_cd": ("""
        SELECT o_orderstatus, count(*) AS n
        FROM orders GROUP BY o_orderstatus
        HAVING APPROX_COUNT_DISTINCT(o_custkey) > 100
        ORDER BY o_orderstatus""", """
        SELECT o_orderstatus, count(*) AS n
        FROM orders GROUP BY o_orderstatus
        HAVING COUNT(DISTINCT o_custkey) > 100
        ORDER BY o_orderstatus"""),
    # testPostAggWithTopN (SQL spelling: order by a ratio of aggregates)
    "sqlc_postagg_topn_sql": ("""
        SELECT o_orderpriority,
               CAST(round(SUM(o_totalprice) / count(*), 2) AS DOUBLE)
                 AS avg_price
        FROM orders GROUP BY o_orderpriority
        ORDER BY avg_price DESC LIMIT 3""", """
        SELECT o_orderpriority,
               round(SUM(o_totalprice) / count(*), 2) AS avg_price
        FROM orders GROUP BY o_orderpriority
        ORDER BY avg_price DESC LIMIT 3"""),
    # testStringAggMultiValue (STRING_AGG over exploded MV values)
    # NOTE: the sort lives ABOVE the aggregating subquery — Spark's
    # SQL-UDF inlining mangles array_sort's default comparator when a
    # UDF argument is an aggregate in the same SELECT (the analyzer
    # hoists UDF args into the Aggregate and double-wraps the
    # comparator lambda); sorting the aggregated column one level up
    # avoids the mangle
    "sqlc_string_agg_multi_value": ("""
        SELECT ARRAY_TO_STRING(ARRAY_SORT(STRING_TO_MV(aggstr, '\|')),
                               '|') AS toks
        FROM (SELECT STRING_AGG(DISTINCT tok, '|') AS aggstr
              FROM (SELECT * FROM region
                    CROSS JOIN UNNEST(STRING_TO_MV(r_name, ' '))
                      AS u(tok)) x) t
        """, """
        SELECT string_agg(DISTINCT tok, '|' ORDER BY tok) AS toks
        FROM (SELECT tok FROM region,
              unnest(string_split(r_name, ' ')) AS u(tok)) t"""),
    # testGroupByCaseWhenOfTripleAnd
    "sqlc_case_triple_and_pred": ("""
        SELECT CASE WHEN l_quantity > 10 AND l_discount > 0.02
                         AND l_returnflag = 'N'
                    THEN 'hot' ELSE 'cold' END AS seg,
               count(*) AS n
        FROM lineitem GROUP BY 1 ORDER BY 1""", None),
    # testFilterWithNvlishCaseAndNotIn
    "sqlc_nvlish_case_not_in": ("""
        SELECT count(*) AS n FROM orders
        WHERE CASE WHEN o_orderstatus IS NULL THEN 'x'
                   ELSE o_orderstatus END NOT IN ('O', 'P')""", None),
    # testInOrGreaterThanExpression
    "sqlc_in_or_greater": ("""
        SELECT count(*) AS n FROM part
        WHERE p_size IN (1, 2, 3) OR p_size > 47""", None),
    # testNotInOrEqualToOneOfThemExpression
    "sqlc_not_in_or_equal": ("""
        SELECT count(*) AS n FROM part
        WHERE p_brand NOT IN ('Brand#1', 'Brand#2') OR p_brand = 'Brand#1'
        """, None),
    # testNumericLatestEarliestWithOpratorsGroupBy (arithmetic over
    # first/last aggregates)
    "sqlc_latest_earliest_ops": ("""
        SELECT o_orderstatus,
               LATEST_BY(o_totalprice,
                 TIME_EXTRACT(o_orderdate, 'EPOCH') * 1000000000
                   + o_orderkey)
               - EARLIEST_BY(o_totalprice,
                 TIME_EXTRACT(o_orderdate, 'EPOCH') * 1000000000
                   + o_orderkey) AS price_drift
        FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""", """
        SELECT o_orderstatus,
               max_by(o_totalprice,
                 CAST(epoch(o_orderdate) AS BIGINT) * 1000000000
                   + o_orderkey)
               - min_by(o_totalprice,
                 CAST(epoch(o_orderdate) AS BIGINT) * 1000000000
                   + o_orderkey) AS price_drift
        FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus"""),
    # funcs_and_sql_datatype_comp_ops.iq: cross-type comparisons
    "sqlc_cross_type_compare": ("""
        SELECT count(*) AS a FROM part WHERE p_size = 7.0""", None),
    # numeric string compared as number (Druid coerces; explicit CAST
    # keeps both engines honest)
    "sqlc_string_as_number_filter": ("""
        SELECT count(*) AS n FROM part
        WHERE CAST(CAST(p_size AS VARCHAR) AS BIGINT) >= 40""", None),
    # ---- batch 21: aggr_general / select-distinct / offset / window
    # null-handling (quidem-ut aggr_general.iq, sql_select_distinct.iq,
    # sql_limit_offset.iq; DrillWindowQueryTest null frames) ----
    # aggr_general.iq: COUNT(DISTINCT TIME_FLOOR(...)) — distinct over
    # a computed time bucket
    "sqlc_cd_of_time_floor": ("""
        SELECT COUNT(DISTINCT TIME_FLOOR(ts, 'PT1H')) AS n_hours,
               COUNT(DISTINCT TIME_FLOOR(ts, 'P1D')) AS n_days
        FROM events""", """
        SELECT COUNT(DISTINCT date_trunc('hour', ts)) AS n_hours,
               COUNT(DISTINCT date_trunc('day', ts)) AS n_days
        FROM events"""),
    # aggr_general.iq: ANY_VALUE over single-valued groups (the only
    # deterministic ANY_VALUE contract)
    "sqlc_any_value_single": ("""
        SELECT n_regionkey, ANY_VALUE(r_name) AS rname, count(*) AS n
        FROM nation JOIN region ON n_regionkey = r_regionkey
        GROUP BY n_regionkey ORDER BY n_regionkey""", """
        SELECT n_regionkey, ANY_VALUE(r_name) AS rname, count(*) AS n
        FROM nation JOIN region ON n_regionkey = r_regionkey
        GROUP BY n_regionkey ORDER BY n_regionkey"""),
    # sql_select_distinct.iq: multi-column DISTINCT + ORDER + paging
    "sqlc_select_distinct_paged": ("""
        SELECT DISTINCT o_orderstatus, o_orderpriority
        FROM orders ORDER BY o_orderstatus, o_orderpriority
        LIMIT 6 OFFSET 2""", None),
    # sql_limit_offset.iq: OFFSET without LIMIT
    "sqlc_offset_no_limit": ("""
        SELECT r_name FROM region ORDER BY r_name OFFSET 2""", None),
    # sql_subquery_with_where.iq: scalar subquery in WHERE
    "sqlc_scalar_subquery_where": ("""
        SELECT o_orderkey, o_totalprice FROM orders
        WHERE o_totalprice = (SELECT MAX(o_totalprice) FROM orders)""",
        None),
    # join-algorithm parity (denorm_broadcast/sortMerge.iq run the SAME
    # SQL under both algorithms; Spark spells the choice as a hint and
    # must return identical rows)
    "sqlc_join_hint_merge": ("""
        SELECT /*+ MERGE(r) */ r.r_name, count(*) AS n
        FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
        GROUP BY r.r_name ORDER BY r.r_name""", """
        SELECT r.r_name, count(*) AS n
        FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
        GROUP BY r.r_name ORDER BY r.r_name"""),
    # DrillWindowQueryTest: LAST_VALUE/LAG IGNORE NULLS across a
    # null-bearing frame
    "sqlc_window_ignore_nulls": ("""
        SELECT o_orderkey,
          LAST_VALUE(NULLIF(o_orderstatus, 'O')) IGNORE NULLS OVER (
            ORDER BY o_orderkey
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS last_closed,
          LAG(NULLIF(o_orderstatus, 'O')) IGNORE NULLS OVER (
            ORDER BY o_orderkey) AS prev_closed
        FROM (SELECT * FROM orders ORDER BY o_orderkey LIMIT 25) t
        ORDER BY o_orderkey""", """
        SELECT o_orderkey,
          LAST_VALUE(NULLIF(o_orderstatus, 'O') IGNORE NULLS) OVER (
            ORDER BY o_orderkey
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS last_closed,
          LAG(NULLIF(o_orderstatus, 'O') IGNORE NULLS) OVER (
            ORDER BY o_orderkey) AS prev_closed
        FROM (SELECT * FROM orders ORDER BY o_orderkey LIMIT 25) t
        ORDER BY o_orderkey"""),
    # ---- batch 22: CalciteJoinQueryTest depth ----
    # testJoinWithLimitBeforeJoining
    "sqlc_join_limit_before_joining": ("""
        SELECT t.o_orderkey, c.c_mktsegment
        FROM (SELECT o_orderkey, o_custkey FROM orders
              ORDER BY o_orderkey LIMIT 10) t
        JOIN customer c ON t.o_custkey = c.c_custkey
        ORDER BY t.o_orderkey""", None),
    # testExactTopNOnInnerJoinWithLimit
    "sqlc_exact_topn_inner_join": ("""
        SELECT r.r_name, count(*) AS cnt
        FROM customer c
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        GROUP BY r.r_name ORDER BY cnt DESC, r.r_name LIMIT 2""", None),
    # testJoinOuterGroupByAndSubqueryHasLimit
    "sqlc_join_outer_groupby_inner_limit": ("""
        SELECT c_mktsegment, CAST(round(AVG(o_totalprice), 2) AS DOUBLE)
                 AS avg_price
        FROM (SELECT o_custkey, o_totalprice FROM orders
              ORDER BY o_totalprice DESC LIMIT 100) t
        JOIN customer ON t.o_custkey = c_custkey
        GROUP BY c_mktsegment ORDER BY c_mktsegment""", """
        SELECT c_mktsegment, round(AVG(o_totalprice), 2) AS avg_price
        FROM (SELECT o_custkey, o_totalprice FROM orders
              ORDER BY o_totalprice DESC LIMIT 100) t
        JOIN customer ON t.o_custkey = c_custkey
        GROUP BY c_mktsegment ORDER BY c_mktsegment"""),
    # testJoinOnTimeseriesWithFloorOnTime (join of two time-bucketed
    # aggregates on the bucket)
    "sqlc_join_on_timeseries_floor": ("""
        SELECT a.d, a.n_views, b.n_purchases
        FROM (SELECT TIME_FLOOR(ts, 'P1D') AS d, count(*) AS n_views
              FROM events WHERE event_type = 'view' GROUP BY 1) a
        JOIN (SELECT TIME_FLOOR(ts, 'P1D') AS d,
                     count(*) AS n_purchases
              FROM events WHERE event_type = 'purchase' GROUP BY 1) b
          ON a.d = b.d
        ORDER BY a.d LIMIT 10""", """
        SELECT a.d, a.n_views, b.n_purchases
        FROM (SELECT date_trunc('day', ts)::TIMESTAMP AS d,
                     count(*) AS n_views FROM events
              WHERE event_type = 'view' GROUP BY 1) a
        JOIN (SELECT date_trunc('day', ts)::TIMESTAMP AS d,
                     count(*) AS n_purchases FROM events
              WHERE event_type = 'purchase' GROUP BY 1) b
          ON a.d = b.d
        ORDER BY a.d LIMIT 10"""),
    # testCommaJoinLeftFunction (comma join + function condition)
    "sqlc_comma_join_function": ("""
        SELECT count(*) AS n
        FROM nation n, region r
        WHERE UPPER(SUBSTRING(n.n_name, 1, 6)) = UPPER('NATION')
          AND n.n_regionkey = r.r_regionkey AND r.r_name LIKE 'A%'""",
        None),
    # testInnerJoinCastLeft (key cast to match the other side's type)
    "sqlc_inner_join_cast_key": ("""
        SELECT count(*) AS n
        FROM nation n
        JOIN region r
          ON CAST(n.n_regionkey AS VARCHAR)
             = CAST(r.r_regionkey AS VARCHAR)""", None),
    # testJoinOfTwoJoinsWithSubQueries
    "sqlc_join_of_two_joins": ("""
        SELECT x.r_name, CAST(round(SUM(x.bal), 2) AS DOUBLE) AS bal,
               y.n_sup
        FROM (SELECT r.r_name, c.c_acctbal AS bal
              FROM customer c
              JOIN nation n ON c.c_nationkey = n.n_nationkey
              JOIN region r ON n.n_regionkey = r.r_regionkey) x
        JOIN (SELECT r.r_name, count(*) AS n_sup
              FROM supplier s
              JOIN nation n ON s.s_nationkey = n.n_nationkey
              JOIN region r ON n.n_regionkey = r.r_regionkey
              GROUP BY r.r_name) y
          ON x.r_name = y.r_name
        GROUP BY x.r_name, y.n_sup ORDER BY x.r_name""", """
        SELECT x.r_name, round(SUM(x.bal), 2) AS bal, y.n_sup
        FROM (SELECT r.r_name, c.c_acctbal AS bal
              FROM customer c
              JOIN nation n ON c.c_nationkey = n.n_nationkey
              JOIN region r ON n.n_regionkey = r.r_regionkey) x
        JOIN (SELECT r.r_name, count(*) AS n_sup
              FROM supplier s
              JOIN nation n ON s.s_nationkey = n.n_nationkey
              JOIN region r ON n.n_regionkey = r.r_regionkey
              GROUP BY r.r_name) y
          ON x.r_name = y.r_name
        GROUP BY x.r_name, y.n_sup ORDER BY x.r_name"""),
    # testInAggregationSubquery (IN over an aggregated/HAVING subquery)
    "sqlc_in_aggregation_subquery": ("""
        SELECT count(*) AS n FROM orders
        WHERE o_custkey IN (
          SELECT o_custkey FROM orders
          GROUP BY o_custkey HAVING count(*) >= 30)""", None),
    # testNotInAggregationSubquery
    "sqlc_not_in_aggregation_subquery": ("""
        SELECT count(*) AS n FROM customer
        WHERE c_custkey NOT IN (
          SELECT o_custkey FROM orders
          GROUP BY o_custkey HAVING count(*) >= 30)""", None),
    # testInnerJoinWithIsNullFilter (left join + right-side null test
    # = anti-join semantics)
    "sqlc_left_join_is_null": ("""
        SELECT count(*) AS n
        FROM customer c
        LEFT JOIN (SELECT DISTINCT o_custkey FROM orders) o
          ON c.c_custkey = o.o_custkey
        WHERE o.o_custkey IS NULL""", None),
    # testInnerJoinOnMultiValueColumn (join keyed on exploded MV value)
    "sqlc_join_on_mv_column": ("""
        SELECT u.tok, count(*) AS n
        FROM (SELECT tok FROM region
              CROSS JOIN UNNEST(STRING_TO_MV(r_name, ' ')) AS v(tok)) u
        JOIN (SELECT DISTINCT SUBSTRING(r_name, 1, 4) AS pfx
              FROM region) p
          ON SUBSTRING(u.tok, 1, 4) = p.pfx
        GROUP BY u.tok ORDER BY u.tok""", """
        SELECT u.tok, count(*) AS n
        FROM (SELECT tok FROM region,
              unnest(string_split(r_name, ' ')) AS v(tok)) u
        JOIN (SELECT DISTINCT r_name[1:4] AS pfx FROM region) p
          ON u.tok[1:4] = p.pfx
        GROUP BY u.tok ORDER BY u.tok"""),
    # testLeftJoinOnTwoInlineDataSources (VALUES ⋈ VALUES)
    "sqlc_left_join_inline_values": ("""
        SELECT a.k, a.v, b.w FROM
          (SELECT * FROM (VALUES (1, 'one'), (2, 'two'),
                                 (3, 'three')) AS t(k, v)) a
        LEFT JOIN
          (SELECT * FROM (VALUES (1, 'uno'), (3, 'tres')) AS s(k, w)) b
          ON a.k = b.k
        ORDER BY a.k""", None),
    # ---- batch 23: CalciteNestedDataQueryTest depth (nested-path
    # group/filter matrices over constructed JSON docs) ----
    # testGroupByPathSelectorFilter: group + filter on the same path
    "sqlc_nested_path_selector_filter": ("""
        SELECT JSON_VALUE(doc, '$.x.a') AS a, count(*) AS n
        FROM (SELECT JSON_OBJECT(KEY 'x' VALUE JSON_OBJECT(
                       KEY 'a' VALUE event_type,
                       KEY 'k' VALUE CAST(JSON_VALUE(props, '$.k')
                                          AS BIGINT))) AS doc
              FROM events) t
        WHERE JSON_VALUE(doc, '$.x.a') IN ('view', 'click')
        GROUP BY 1 ORDER BY 1""", """
        SELECT event_type AS a, count(*) AS n
        FROM events WHERE event_type IN ('view', 'click')
        GROUP BY 1 ORDER BY 1"""),
    # testGroupByPathBoundFilterLong (+ NoUpper/NoLower arms)
    "sqlc_nested_path_bound_filter": ("""
        SELECT COUNT(*) FILTER (WHERE
                 JSON_VALUE(doc, '$.x.k' RETURNING BIGINT)
                   BETWEEN 10 AND 50) AS mid,
               COUNT(*) FILTER (WHERE
                 JSON_VALUE(doc, '$.x.k' RETURNING BIGINT) >= 80)
                 AS no_upper,
               COUNT(*) FILTER (WHERE
                 JSON_VALUE(doc, '$.x.k' RETURNING BIGINT) < 20)
                 AS no_lower
        FROM (SELECT JSON_OBJECT(KEY 'x' VALUE JSON_OBJECT(
                       KEY 'k' VALUE CAST(JSON_VALUE(props, '$.k')
                                          AS BIGINT))) AS doc
              FROM events) t""", """
        SELECT COUNT(*) FILTER (WHERE
                 CAST(json_extract(props, '$.k') AS BIGINT)
                   BETWEEN 10 AND 50) AS mid,
               COUNT(*) FILTER (WHERE
                 CAST(json_extract(props, '$.k') AS BIGINT) >= 80)
                 AS no_upper,
               COUNT(*) FILTER (WHERE
                 CAST(json_extract(props, '$.k') AS BIGINT) < 20)
                 AS no_lower
        FROM events"""),
    # testGroupByPathSelectorFilterNonExistent (missing path → NULL)
    "sqlc_nested_nonexistent_path": ("""
        SELECT JSON_VALUE(props, '$.nope') AS missing, count(*) AS n
        FROM events GROUP BY 1""", """
        SELECT CAST(NULL AS VARCHAR) AS missing, count(*) AS n
        FROM events GROUP BY 1"""),
    # testGroupByCoalesceJsonValue
    "sqlc_nested_coalesce_json_value": ("""
        SELECT COALESCE(JSON_VALUE(props, '$.absent'),
                        JSON_VALUE(props, '$.k'), 'none') AS v,
               count(*) AS n
        FROM events GROUP BY 1 ORDER BY CAST(v AS BIGINT) LIMIT 8""", """
        SELECT CAST(json_extract(props, '$.k') AS VARCHAR) AS v,
               count(*) AS n
        FROM events GROUP BY 1 ORDER BY CAST(v AS BIGINT) LIMIT 8"""),
    # testJsonAndArrayAgg (ARRAY_AGG over JSON_VALUE results)
    "sqlc_json_and_array_agg": ("""
        SELECT event_type,
          ARRAY_TO_STRING(ARRAY_SORT(arrv), ',') AS ks
        FROM (SELECT event_type,
                     ARRAY_AGG(DISTINCT JSON_VALUE(props, '$.k')) AS arrv
              FROM events
              WHERE CAST(JSON_VALUE(props, '$.k') AS BIGINT) < 5
              GROUP BY event_type) g
        ORDER BY event_type""", """
        SELECT event_type,
          array_to_string(list_sort(
            array_agg(DISTINCT CAST(json_extract(props, '$.k')
                                    AS VARCHAR))), ',') AS ks
        FROM events
        WHERE CAST(json_extract(props, '$.k') AS BIGINT) < 5
        GROUP BY event_type ORDER BY event_type"""),
    # testGroupByPathSelectorFilterUpperEqualsColumn
    "sqlc_nested_filter_fn_equals_column": ("""
        SELECT count(*) AS n FROM events
        WHERE UPPER(JSON_VALUE(
                JSON_OBJECT(KEY 'e' VALUE event_type), '$.e'))
              = UPPER(event_type)""", """
        SELECT count(*) AS n FROM events"""),
    # testUnnestRootSingleTypeArrayLongNulls (UNNEST of a JSON array
    # with null elements)
    "sqlc_unnest_json_array_nulls": ("""
        SELECT elem, count(*) AS n
        FROM (SELECT JSON_QUERY_ARRAY(
                '[1, null, 2, 2, null]', '$') AS arr
              FROM region LIMIT 1) t
        CROSS JOIN UNNEST(t.arr) AS u(elem)
        GROUP BY elem ORDER BY elem NULLS FIRST""", """
        SELECT elem, count(*) AS n
        FROM (SELECT ['1', NULL, '2', '2', NULL] AS arr) t,
             unnest(t.arr) AS u(elem)
        GROUP BY elem ORDER BY elem NULLS FIRST"""),
    # ---- batch 24: formatting / tz / safe-divide function edges ----
    # testHumanReadableFormatFunction
    "sqlc_human_readable_formats": ("""
        SELECT HUMAN_READABLE_BINARY_BYTE_FORMAT(1536) AS kib,
               HUMAN_READABLE_BINARY_BYTE_FORMAT(1048576 * 3) AS mib,
               HUMAN_READABLE_DECIMAL_BYTE_FORMAT(2500) AS kb,
               HUMAN_READABLE_DECIMAL_FORMAT(1234567) AS m
        FROM region ORDER BY r_regionkey LIMIT 1""", """
        SELECT '1.50 KiB' AS kib, '3.00 MiB' AS mib,
               '2.50 KB' AS kb, '1.23 M' AS m
        FROM region ORDER BY r_regionkey LIMIT 1"""),
    # TIME_FORMAT with an explicit timezone argument
    # (TimeFormatOperatorConversion 3-arg form)
    "sqlc_time_format_tz": ("""
        SELECT TIME_FORMAT(TIMESTAMP '2024-01-15 23:30:00',
                           'yyyy-MM-dd HH:mm',
                           'America/Los_Angeles') AS la,
               TIME_FORMAT(TIMESTAMP '2024-01-15 23:30:00',
                           'yyyy-MM-dd HH:mm') AS utc
        FROM region ORDER BY r_regionkey LIMIT 1""", """
        SELECT '2024-01-15 15:30' AS la, '2024-01-15 23:30' AS utc
        FROM region ORDER BY r_regionkey LIMIT 1"""),
    # testSafeDivide (0-denominator → NULL, not error/Inf)
    "sqlc_safe_divide_zero_arms": ("""
        SELECT CAST(SAFE_DIVIDE(10, 4) AS DOUBLE) AS q,
               SAFE_DIVIDE(10, 0) IS NULL AS div0_null,
               CAST(SAFE_DIVIDE(0, 10) AS DOUBLE) AS zero_num
        FROM region ORDER BY r_regionkey LIMIT 1""", """
        SELECT 2.5 AS q, true AS div0_null,
               CAST(0 AS DOUBLE) AS zero_num
        FROM region ORDER BY r_regionkey LIMIT 1"""),
    # ---- batch 25: CalciteSelectQueryTest select/literal edges ----
    # constant select with no FROM clause (Calcite's VALUES plan)
    "sqlc_select_no_from": ("""
        SELECT 1 + 1 AS two, UPPER('ab') AS ab,
               CAST(NULL AS VARCHAR) AS nul""", None),
    # star projection + order + limit
    "sqlc_select_star_limit": ("""
        SELECT * FROM region ORDER BY r_regionkey LIMIT 3""", None),
    # standalone VALUES with projection and order
    "sqlc_values_standalone": ("""
        SELECT k, v * 10 AS v10
        FROM (VALUES (1, 5), (2, 7), (3, 9)) AS t(k, v)
        ORDER BY k DESC""", None),
    # mixed-case keywords + quoted reserved words as aliases
    "sqlc_reserved_word_aliases": ("""
        select r_name as "group", r_regionkey as "order"
        From region Where r_regionkey < 3 Order By "order" """, None),
    # arithmetic precedence + unary minus + modulo chain
    "sqlc_arithmetic_precedence": ("""
        SELECT 2 + 3 * 4 - 1 AS a, -5 + 2 AS b,
               17 % 5 % 3 AS c, -(3 - 7) AS d
        FROM region ORDER BY r_regionkey LIMIT 1""", None),
    # || concatenation incl. implicit numeric casts
    "sqlc_concat_pipe_numeric": ("""
        SELECT r_name || '#' || CAST(r_regionkey AS VARCHAR) AS tag
        FROM region ORDER BY tag""", None),
    # LIKE with ESCAPE
    "sqlc_like_escape_brand": ("""
        SELECT count(*) AS n FROM part
        WHERE p_brand LIKE 'Brand#1!%' ESCAPE '!'
           OR p_brand LIKE 'Brand#1_' ESCAPE '!'""", None),
    # numeric literal forms (scientific, leading-dot, integer-vs-float)
    "sqlc_numeric_literal_forms": ("""
        SELECT CAST(1e3 AS DOUBLE) AS sci, CAST(.5 AS DOUBLE) AS half,
               CAST(2.0 AS DOUBLE) / 4 AS q
        FROM region ORDER BY r_regionkey LIMIT 1""", """
        SELECT CAST(1000 AS DOUBLE) AS sci, 0.5 AS half, 0.5 AS q
        FROM region ORDER BY r_regionkey LIMIT 1"""),
    # INTERVAL DAY TO SECOND arithmetic
    "sqlc_interval_day_second": ("""
        SELECT TIMESTAMP '2024-01-01 00:00:00'
                 + INTERVAL '1 02:03:04' DAY TO SECOND AS shifted
        FROM region ORDER BY r_regionkey LIMIT 1""", """
        SELECT TIMESTAMP '2024-01-02 02:03:04' AS shifted
        FROM region ORDER BY r_regionkey LIMIT 1"""),
    # ---- batch 26: GroupBy corpus remainder ----
    # testGroupByOrderByBoolean (boolean-typed group key)
    "sqlc_groupby_boolean_key": ("""
        SELECT o_totalprice > 150000 AS big, count(*) AS n
        FROM orders GROUP BY 1 ORDER BY big""", None),
    # testGroupByNullType (NULL literal as a group key)
    "sqlc_groupby_null_type": ("""
        SELECT CAST(NULL AS VARCHAR) AS k, count(*) AS n
        FROM orders GROUP BY 1""", None),
    # testGroupByWithLiteralInSubqueryGrouping
    "sqlc_literal_in_subquery_grouping": ("""
        SELECT tag, n FROM (
          SELECT 'all' AS tag, count(*) AS n
          FROM orders GROUP BY 'all') t""", """
        SELECT 'all' AS tag, count(*) AS n FROM orders"""),
    # testRepeatedIdenticalVirtualExpressionGrouping (same expression
    # in SELECT, WHERE and GROUP BY — planned once)
    "sqlc_repeated_virtual_expression": ("""
        SELECT UPPER(SUBSTRING(o_orderpriority, 3)) AS pri,
               count(*) AS n
        FROM orders
        WHERE UPPER(SUBSTRING(o_orderpriority, 3)) <> 'LOW'
        GROUP BY UPPER(SUBSTRING(o_orderpriority, 3))
        ORDER BY pri""", None),
    # testCommonVirtualExpressionWithDifferentValueType (one base
    # expression consumed at two types)
    "sqlc_common_vexpr_two_types": ("""
        SELECT CAST(SUBSTRING(o_orderpriority, 1, 1) AS BIGINT) AS pnum,
               SUBSTRING(o_orderpriority, 1, 1) AS pstr,
               count(*) AS n
        FROM orders GROUP BY 1, 2 ORDER BY 1""", None),
    # testPruneDeadAggregators (outer projects a subset of inner aggs)
    "sqlc_prune_dead_aggregators": ("""
        SELECT keep1, keep3 FROM (
          SELECT count(*) AS keep1,
                 CAST(SUM(o_totalprice) AS DOUBLE) AS dead2,
                 COUNT(DISTINCT o_orderstatus) AS keep3,
                 MAX(o_orderkey) AS dead4
          FROM orders) t""", """
        SELECT count(*) AS keep1,
               COUNT(DISTINCT o_orderstatus) AS keep3
        FROM orders"""),
    # testFilteredTimeAggregators (FILTER with time predicates in a
    # time-grouped aggregate)
    "sqlc_filtered_time_aggregators": ("""
        SELECT TIME_FLOOR(ts, 'P1D') AS d,
          COUNT(*) FILTER (WHERE TIME_EXTRACT(ts, 'HOUR') < 12)
            AS morning,
          COUNT(*) FILTER (WHERE TIME_EXTRACT(ts, 'HOUR') >= 12)
            AS evening
        FROM events GROUP BY 1 ORDER BY 1 LIMIT 7""", """
        SELECT date_trunc('day', ts)::TIMESTAMP AS d,
          COUNT(*) FILTER (WHERE EXTRACT(HOUR FROM ts) < 12)
            AS morning,
          COUNT(*) FILTER (WHERE EXTRACT(HOUR FROM ts) >= 12)
            AS evening
        FROM events GROUP BY 1 ORDER BY 1 LIMIT 7"""),
    # testGroupByFloorWithOrderBy (numeric FLOOR key, ordered desc)
    "sqlc_groupby_floor_order": ("""
        SELECT CAST(FLOOR(o_totalprice / 100000) AS DOUBLE) AS bucket,
               count(*) AS n
        FROM orders GROUP BY 1 ORDER BY bucket DESC""", """
        SELECT FLOOR(o_totalprice / 100000) AS bucket, count(*) AS n
        FROM orders GROUP BY 1 ORDER BY bucket DESC"""),
    # ---- batch 27: union variants / time units / scalar edges ----
    # CalciteUnionQueryTest: branches project in different column
    # orders (union is by name through the SQL layer)
    "sqlc_union_mismatched_order": ("""
        SELECT src, k, nm FROM (
          SELECT 'r' AS src, r_regionkey AS k, r_name AS nm FROM region
          UNION ALL
          SELECT 'n' AS src, n_nationkey AS k, n_name AS nm
          FROM nation WHERE n_nationkey < 3) t
        ORDER BY src, k""", None),
    # union with a filter inside each branch (pushdown per-branch)
    "sqlc_union_filter_per_branch": ("""
        SELECT count(*) AS n FROM (
          SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F'
          UNION ALL
          SELECT o_orderkey FROM orders WHERE o_orderstatus = 'O'
            AND o_totalprice > 200000) t""", None),
    # TIMESTAMPDIFF unit matrix
    "sqlc_timestampdiff_unit_matrix": ("""
        SELECT TIMESTAMPDIFF(DAY, TIMESTAMP '2024-01-01',
                             TIMESTAMP '2024-03-15') AS dd,
               TIMESTAMPDIFF(HOUR, TIMESTAMP '2024-01-01 00:00:00',
                             TIMESTAMP '2024-01-02 06:00:00') AS hh,
               TIMESTAMPDIFF(WEEK, TIMESTAMP '2024-01-01',
                             TIMESTAMP '2024-02-12') AS ww,
               TIMESTAMPDIFF(MONTH, TIMESTAMP '2024-01-31',
                             TIMESTAMP '2024-03-01') AS mm
        FROM region ORDER BY r_regionkey LIMIT 1""", """
        SELECT 74 AS dd, 30 AS hh, 6 AS ww, 1 AS mm
        FROM region ORDER BY r_regionkey LIMIT 1"""),
    # FLOOR/CEIL(ts TO unit) calendar arms
    "sqlc_floor_ceil_ts_units": ("""
        SELECT FLOOR(TIMESTAMP '2024-05-17 10:30:00' TO QUARTER) AS q,
               CEIL(TIMESTAMP '2024-05-17 10:30:00' TO WEEK) AS w,
               FLOOR(TIMESTAMP '2024-05-17 10:30:00' TO YEAR) AS y
        FROM region ORDER BY r_regionkey LIMIT 1""", """
        SELECT TIMESTAMP '2024-04-01' AS q,
               TIMESTAMP '2024-05-20' AS w,
               TIMESTAMP '2024-01-01' AS y
        FROM region ORDER BY r_regionkey LIMIT 1"""),
    # testCoalesceMoreColumns (4-arm coalesce chain)
    "sqlc_coalesce_more_columns": ("""
        SELECT COALESCE(NULLIF(o_orderstatus, 'O'),
                        NULLIF(o_orderpriority, '5-LOW'),
                        CAST(NULL AS VARCHAR),
                        'fallback') AS v,
               count(*) AS n
        FROM orders GROUP BY 1 ORDER BY 1""", None),
    # testGreatestLeastTypes (mixed numeric widths)
    "sqlc_greatest_least_mixed": ("""
        SELECT CAST(GREATEST(p_size, 25.5) AS DOUBLE) AS g,
               CAST(LEAST(p_size, 25.5) AS DOUBLE) AS l
        FROM part ORDER BY p_partkey LIMIT 8""", """
        SELECT GREATEST(CAST(p_size AS DOUBLE), 25.5) AS g,
               LEAST(CAST(p_size AS DOUBLE), 25.5) AS l
        FROM part ORDER BY p_partkey LIMIT 8"""),
    # MOD sign semantics with negative operands
    "sqlc_mod_negative": ("""
        SELECT MOD(-7, 3) AS a, MOD(7, -3) AS b, MOD(-7, -3) AS c
        FROM region ORDER BY r_regionkey LIMIT 1""", """
        SELECT -1 AS a, 1 AS b, -1 AS c
        FROM region ORDER BY r_regionkey LIMIT 1"""),
    # ---- batch 28: typed-array shapes (CalciteArraysQueryTest
    # long/double-array arms + real array<float> column) ----
    # testGroupByArrayFromCase
    "sqlc_array_from_case": ("""
        SELECT MV_TO_STRING(CASE WHEN o_orderstatus = 'F'
                   THEN ARRAY['done', 'final']
                   ELSE ARRAY['open'] END, ',') AS tags,
               count(*) AS n
        FROM orders GROUP BY CASE WHEN o_orderstatus = 'F'
                   THEN ARRAY['done', 'final']
                   ELSE ARRAY['open'] END
        ORDER BY tags""", """
        SELECT CASE WHEN o_orderstatus = 'F' THEN 'done,final'
                    ELSE 'open' END AS tags,
               count(*) AS n
        FROM orders GROUP BY 1 ORDER BY tags"""),
    # testArrayGroupAsLongArray (whole long-array group key)
    "sqlc_long_array_group": ("""
        SELECT ARRAY_TO_STRING(ARRAY[l_linenumber,
                                     CAST(l_suppkey % 3 AS INT)], '-')
                 AS key_arr,
               count(*) AS n
        FROM lineitem
        GROUP BY ARRAY[l_linenumber, CAST(l_suppkey % 3 AS INT)]
        ORDER BY key_arr LIMIT 10""", """
        SELECT l_linenumber || '-' || (l_suppkey % 3) AS key_arr,
               count(*) AS n
        FROM lineitem GROUP BY l_linenumber, l_suppkey % 3
        ORDER BY key_arr LIMIT 10"""),
    # testArrayOverlapFilterLongArrayColumn (long-array overlap)
    "sqlc_long_array_overlap": ("""
        SELECT count(*) AS n FROM part
        WHERE ARRAY_OVERLAP(ARRAY[p_size, p_size + 1],
                            ARRAY[10, 20, 30])""", """
        SELECT count(*) AS n FROM part
        WHERE len(list_intersect([p_size, p_size + 1],
                                 [10, 20, 30])) > 0"""),
    # testArrayLengthArrayColumn over the REAL array<float> column
    "sqlc_array_length_real_column": ("""
        SELECT ARRAY_LENGTH(embedding) AS dim, count(*) AS n
        FROM embeddings GROUP BY 1 ORDER BY 1""", """
        SELECT CAST(len(embedding) AS INT) AS dim, count(*) AS n
        FROM embeddings GROUP BY 1 ORDER BY 1"""),
    # testArraySliceArrayColumns over the real array column
    "sqlc_array_slice_real_column": ("""
        SELECT vec_id,
               ARRAY_LENGTH(ARRAY_SLICE(embedding, 2, 6)) AS slice_len
        FROM embeddings ORDER BY vec_id LIMIT 5""", """
        SELECT vec_id, 4 AS slice_len
        FROM embeddings ORDER BY vec_id LIMIT 5"""),
    # testArrayContainsFilterArrayLongColumn
    "sqlc_array_contains_long": ("""
        SELECT count(*) AS n FROM lineitem
        WHERE ARRAY_CONTAINS(ARRAY[1, 3, 5], l_linenumber)""", """
        SELECT count(*) AS n FROM lineitem
        WHERE list_contains([1, 3, 5], l_linenumber)"""),
    # testScalarInArrayFilter (WHERE-position SCALAR_IN_ARRAY)
    "sqlc_scalar_in_array_where": ("""
        SELECT o_orderpriority, count(*) AS n FROM orders
        WHERE SCALAR_IN_ARRAY(o_orderpriority,
                              ARRAY['1-URGENT', '5-LOW'])
        GROUP BY 1 ORDER BY 1""", """
        SELECT o_orderpriority, count(*) AS n FROM orders
        WHERE list_contains(['1-URGENT', '5-LOW'], o_orderpriority)
        GROUP BY 1 ORDER BY 1"""),
    # ---- batch 29: scalar function matrices (quidem-ut
    # scalar_datetime / ops_funcs / scalar_numeric families) ----
    # datetime matrix: negative TIME_SHIFT, multi-unit TIME_EXTRACT
    "sqlc_datetime_fn_matrix": ("""
        SELECT TIME_SHIFT(TIMESTAMP '2024-03-15 12:00:00', 'P1M', -2)
                 AS back2mo,
               TIME_EXTRACT(TIMESTAMP '2024-03-15 12:34:56', 'MINUTE')
                 AS mi,
               TIME_EXTRACT(TIMESTAMP '2024-03-15 12:34:56', 'DOY')
                 AS doy
        FROM region ORDER BY r_regionkey LIMIT 1""", """
        SELECT TIMESTAMP '2024-01-15 12:00:00' AS back2mo,
               CAST(34 AS BIGINT) AS mi, CAST(75 AS BIGINT) AS doy
        FROM region ORDER BY r_regionkey LIMIT 1"""),
    # CASE WHEN x IN (...) THEN — predicate inside CASE
    "sqlc_case_with_in": ("""
        SELECT CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 'rush'
                    WHEN o_orderpriority IN ('5-LOW') THEN 'slow'
                    ELSE 'normal' END AS speed,
               count(*) AS n
        FROM orders GROUP BY 1 ORDER BY 1""", None),
    # nested CASE expressions
    "sqlc_nested_case": ("""
        SELECT CASE WHEN o_orderstatus = 'F'
                    THEN CASE WHEN o_totalprice > 200000
                              THEN 'big-final' ELSE 'small-final' END
                    ELSE 'other' END AS seg,
               count(*) AS n
        FROM orders GROUP BY 1 ORDER BY 1""", None),
    # bitwise scalar operator matrix
    "sqlc_bitwise_scalar_ops": ("""
        SELECT BITWISE_AND(12, 10) AS ba, BITWISE_OR(12, 10) AS bo,
               BITWISE_XOR(12, 10) AS bx,
               BITWISE_SHIFT_LEFT(3, 4) AS bsl,
               BITWISE_SHIFT_RIGHT(256, 4) AS bsr,
               BITWISE_COMPLEMENT(0) AS bc
        FROM region ORDER BY r_regionkey LIMIT 1""", """
        SELECT CAST(8 AS BIGINT) AS ba, CAST(14 AS BIGINT) AS bo,
               CAST(6 AS BIGINT) AS bx, CAST(48 AS BIGINT) AS bsl,
               CAST(16 AS BIGINT) AS bsr, CAST(-1 AS BIGINT) AS bc
        FROM region ORDER BY r_regionkey LIMIT 1"""),
    # IPv4 CIDR edges (/32 exact, /0 match-all)
    "sqlc_ipv4_cidr_edges": ("""
        SELECT IPV4_MATCH('10.1.2.3', '10.1.2.3/32') AS exact32,
               IPV4_MATCH('200.1.1.1', '0.0.0.0/0') AS all0,
               IPV4_MATCH('10.1.2.4', '10.1.2.3/32') AS miss32,
               IPV4_STRINGIFY(IPV4_PARSE('192.168.1.1')) AS rt
        FROM region ORDER BY r_regionkey LIMIT 1""", """
        SELECT true AS exact32, true AS all0, false AS miss32,
               '192.168.1.1' AS rt
        FROM region ORDER BY r_regionkey LIMIT 1"""),
    # trim family with explicit trim characters
    "sqlc_trim_chars_matrix": ("""
        SELECT BTRIM('xxhixx', 'x') AS b, LTRIM('xxhixx', 'x') AS l,
               RTRIM('xxhixx', 'x') AS r, TRIM('  hi  ') AS t
        FROM region ORDER BY r_regionkey LIMIT 1""", """
        SELECT 'hi' AS b, 'hixx' AS l, 'xxhi' AS r, 'hi' AS t
        FROM region ORDER BY r_regionkey LIMIT 1"""),
    # log/power family
    "sqlc_power_log_matrix": ("""
        SELECT CAST(round(LN(EXP(2)), 6) AS DOUBLE) AS ln_exp,
               CAST(round(LOG10(1000), 6) AS DOUBLE) AS l10,
               CAST(round(SQRT(POWER(7, 2)), 6) AS DOUBLE) AS sq,
               CAST(round(CBRT(27), 6) AS DOUBLE) AS cb
        FROM region ORDER BY r_regionkey LIMIT 1""", """
        SELECT 2.0 AS ln_exp, 3.0 AS l10, 7.0 AS sq, 3.0 AS cb
        FROM region ORDER BY r_regionkey LIMIT 1"""),
    # sign/abs/truncate with negative digits
    "sqlc_sign_abs_truncate": ("""
        SELECT SIGN(-12.5) AS sn, SIGN(0) AS sz, ABS(-42) AS ab,
               CAST(TRUNCATE(1234.5678, 2) AS DOUBLE) AS t2,
               CAST(TRUNCATE(1234.5678, -2) AS DOUBLE) AS tneg
        FROM region ORDER BY r_regionkey LIMIT 1""", """
        SELECT -1.0 AS sn, 0.0 AS sz, 42 AS ab,
               1234.56 AS t2, 1200.0 AS tneg
        FROM region ORDER BY r_regionkey LIMIT 1"""),
    # ---- batch 30: Druid-specific string functions ----
    # CONTAINS_STRING / ICONTAINS_STRING (ContainsOperatorConversion)
    "sqlc_contains_string_fns": ("""
        SELECT COUNT(*) FILTER (WHERE CONTAINS_STRING(p_type, 'ECO'))
                 AS has_eco,
               COUNT(*) FILTER (WHERE ICONTAINS_STRING(p_type, 'eco'))
                 AS has_eco_i,
               COUNT(*) FILTER (WHERE CONTAINS_STRING(p_type, 'eco'))
                 AS has_eco_cs
        FROM part""", """
        SELECT COUNT(*) FILTER (WHERE contains(p_type, 'ECO'))
                 AS has_eco,
               COUNT(*) FILTER (WHERE contains(lower(p_type), 'eco'))
                 AS has_eco_i,
               COUNT(*) FILTER (WHERE contains(p_type, 'eco'))
                 AS has_eco_cs
        FROM part"""),
    # STRING_FORMAT (variadic printf — StringFormatOperatorConversion)
    "sqlc_string_format": ("""
        SELECT STRING_FORMAT('%s has %d nations', r_name, 5) AS msg
        FROM region ORDER BY r_name LIMIT 3""", """
        SELECT r_name || ' has 5 nations' AS msg
        FROM region ORDER BY r_name LIMIT 3"""),
    # PARSE_LONG signed radix + DECODE_BASE64_UTF8 round trip
    "sqlc_parse_long_signed_radix": ("""
        SELECT PARSE_LONG('ff', 16) AS hex_ff,
               PARSE_LONG('-10', 16) AS hex_neg,
               PARSE_LONG('42') AS dec42,
               DECODE_BASE64_UTF8('aGVsbG8=') AS hello
        FROM region ORDER BY r_regionkey LIMIT 1""", """
        SELECT CAST(255 AS BIGINT) AS hex_ff,
               CAST(-16 AS BIGINT) AS hex_neg,
               CAST(42 AS BIGINT) AS dec42,
               'hello' AS hello
        FROM region ORDER BY r_regionkey LIMIT 1"""),
    # REGEXP_REPLACE matrix (groups + global replacement)
    "sqlc_regexp_replace_matrix": ("""
        SELECT REGEXP_REPLACE(c_name, '[0-9]+', '#') AS masked,
               REGEXP_REPLACE('a-b-c', '-', '+') AS plus,
               REGEXP_REPLACE('Customer#42', '([A-Za-z]+)#([0-9]+)',
                              '$2:$1') AS swapped
        FROM customer ORDER BY c_custkey LIMIT 3""", """
        SELECT regexp_replace(c_name, '[0-9]+', '#', 'g') AS masked,
               'a+b+c' AS plus, '42:Customer' AS swapped
        FROM customer ORDER BY c_custkey LIMIT 3"""),
    # ---- batch 31: rounding out ----
    # ARRAY_OVERLAP inside HAVING (post-aggregate array predicate)
    "sqlc_array_overlap_having": ("""
        SELECT o_orderstatus,
               ARRAY_TO_STRING(ARRAY_SORT(
                 ARRAY_AGG(DISTINCT o_orderpriority)), ',') AS pris
        FROM (SELECT * FROM orders WHERE o_orderpriority
                IN ('1-URGENT', '2-HIGH') ) t
        GROUP BY o_orderstatus
        HAVING ARRAY_OVERLAP(ARRAY_AGG(DISTINCT o_orderpriority),
                             ARRAY['1-URGENT'])
        ORDER BY o_orderstatus""", """
        SELECT o_orderstatus,
               array_to_string(list_sort(
                 array_agg(DISTINCT o_orderpriority)), ',') AS pris
        FROM (SELECT * FROM orders WHERE o_orderpriority
                IN ('1-URGENT', '2-HIGH')) t
        GROUP BY o_orderstatus
        HAVING len(list_intersect(array_agg(DISTINCT o_orderpriority),
                                  ['1-URGENT'])) > 0
        ORDER BY o_orderstatus"""),
    # LPAD/RPAD zero/shrink edges (PadOperatorConversion)
    "sqlc_pad_edges": ("""
        SELECT LPAD('abc', 0, 'x') AS zero,
               LPAD('abcdef', 3, 'x') AS shrink,
               RPAD('ab', 5, 'xy') AS grow
        FROM region ORDER BY r_regionkey LIMIT 1""", """
        SELECT NULL AS zero, 'abc' AS shrink, 'abxyx' AS grow
        FROM region ORDER BY r_regionkey LIMIT 1"""),
    # ---- batch 32: time-extract filters / numeric-literal filters ----
    # testFilterOnTimeExtractWithMultipleDays
    "sqlc_time_extract_multi_days": ("""
        SELECT count(*) AS n FROM events
        WHERE TIME_EXTRACT(ts, 'DAY') IN (2, 3, 5)""", """
        SELECT count(*) AS n FROM events
        WHERE EXTRACT(DAY FROM ts) IN (2, 3, 5)"""),
    # testGroupByExtractFloorTime (EXTRACT of a floored time)
    "sqlc_extract_of_floor_time": ("""
        SELECT EXTRACT(YEAR FROM FLOOR(o_orderdate TO YEAR)) AS y,
               count(*) AS n
        FROM orders GROUP BY 1 ORDER BY 1""", """
        SELECT CAST(EXTRACT(YEAR FROM date_trunc('year', o_orderdate))
                    AS BIGINT) AS y,
               count(*) AS n
        FROM orders GROUP BY 1 ORDER BY 1"""),
    # testTimeseriesDescending
    "sqlc_timeseries_descending": ("""
        SELECT TIME_FLOOR(ts, 'P1D') AS d, count(*) AS n
        FROM events GROUP BY 1 ORDER BY d DESC LIMIT 5""", """
        SELECT date_trunc('day', ts)::TIMESTAMP AS d, count(*) AS n
        FROM events GROUP BY 1 ORDER BY d DESC LIMIT 5"""),
    # testCountStarWithLongColumnFiltersOnFloatLiterals (long col
    # compared to fractional literal — no row matches x = 7.5)
    "sqlc_long_col_float_literal": ("""
        SELECT COUNT(*) FILTER (WHERE p_size = 7.0) AS eq7,
               COUNT(*) FILTER (WHERE p_size = 7.5) AS eq75,
               COUNT(*) FILTER (WHERE p_size > 7.5) AS gt75
        FROM part""", None),
    # testRemoveUselessCaseWhen (constant-true branch folds away)
    "sqlc_useless_case_when": ("""
        SELECT count(*) AS n FROM orders
        WHERE CASE WHEN 1 = 1 THEN o_orderstatus = 'F' ELSE FALSE END""",
        """
        SELECT count(*) AS n FROM orders WHERE o_orderstatus = 'F'"""),
    # testCountStarWithLongColumnFiltersForceRange (closed long range)
    "sqlc_long_range_filter": ("""
        SELECT count(*) AS n FROM orders
        WHERE o_orderkey >= 100 AND o_orderkey <= 200""", None),
    # ---- batch 33: window-in-function / null-order shapes
    # (quidem-ut basics_window_func_in_func.iq,
    # basics_order_by_nulls_first_last.iq) ----
    # scalar functions wrapping window results
    "sqlc_window_func_in_func": ("""
        SELECT r_regionkey,
          ABS(r_regionkey - LAG(r_regionkey, 1, 0)
                OVER (ORDER BY r_name)) AS jump,
          CAST(round(AVG(r_regionkey) OVER (
                 ORDER BY r_name
                 ROWS BETWEEN 1 PRECEDING AND CURRENT ROW), 2)
               AS DOUBLE) AS ravg
        FROM region ORDER BY r_name""", """
        SELECT r_regionkey,
          ABS(r_regionkey - LAG(r_regionkey, 1, 0)
                OVER (ORDER BY r_name)) AS jump,
          round(AVG(r_regionkey) OVER (
                 ORDER BY r_name
                 ROWS BETWEEN 1 PRECEDING AND CURRENT ROW), 2) AS ravg
        FROM region ORDER BY r_name"""),
    # window over a FILTER-ed aggregate (two layers of qualification)
    "sqlc_window_over_filtered_agg": ("""
        SELECT o_orderstatus,
          n_urgent,
          CAST(SUM(n_urgent) OVER (ORDER BY o_orderstatus) AS BIGINT)
            AS running_urgent
        FROM (SELECT o_orderstatus,
                     COUNT(*) FILTER (WHERE o_orderpriority = '1-URGENT')
                       AS n_urgent
              FROM orders GROUP BY o_orderstatus) t
        ORDER BY o_orderstatus""", None),
    # plain ORDER BY ... NULLS FIRST / LAST arms on a nullable key
    "sqlc_order_by_nulls_arms": ("""
        SELECT o_orderkey, NULLIF(o_orderstatus, 'O') AS st
        FROM (SELECT * FROM orders ORDER BY o_orderkey LIMIT 12) t
        ORDER BY NULLIF(o_orderstatus, 'O') ASC NULLS FIRST,
                 o_orderkey""", None),
    # ---- batch 34: deep JSON path shapes (funcs_and_sql_func_json_*
    # array-index and multi-level arms) ----
    # path through an array index into an object
    "sqlc_json_array_object_path": ("""
        SELECT JSON_VALUE(doc, '$.arr[1].k') AS second_k,
               JSON_VALUE(doc, '$.arr[0].k') AS first_k
        FROM (SELECT '{"arr": [{"k": "a"}, {"k": "b"}]}' AS doc
              FROM region LIMIT 1) t""", """
        SELECT 'b' AS second_k, 'a' AS first_k
        FROM region LIMIT 1"""),
    # three-level object descent
    "sqlc_json_three_levels": ("""
        SELECT JSON_VALUE(doc, '$.a.b.c' RETURNING BIGINT) AS deep,
               count(*) AS n
        FROM (SELECT JSON_OBJECT(KEY 'a' VALUE JSON_OBJECT(
                KEY 'b' VALUE JSON_OBJECT(
                  KEY 'c' VALUE n_regionkey))) AS doc
              FROM nation) t
        GROUP BY 1 ORDER BY 1""", """
        SELECT CAST(n_regionkey AS BIGINT) AS deep, count(*) AS n
        FROM nation GROUP BY 1 ORDER BY 1"""),
    # JSON_VALUE over a JSON_QUERY-extracted subtree
    "sqlc_json_value_of_query": ("""
        SELECT JSON_VALUE(JSON_QUERY(doc, '$.inner'), '$.v') AS v
        FROM (SELECT '{"inner": {"v": "42"}, "other": 1}' AS doc
              FROM region LIMIT 1) t""", """
        SELECT '42' AS v FROM region LIMIT 1"""),
    # array-index path into scalars + negative/missing index → NULL
    "sqlc_json_array_index_edges": ("""
        SELECT JSON_VALUE(doc, '$.xs[2]' RETURNING BIGINT) AS third,
               JSON_VALUE(doc, '$.xs[9]') IS NULL AS missing
        FROM (SELECT '{"xs": [10, 20, 30]}' AS doc
              FROM region LIMIT 1) t""", """
        SELECT CAST(30 AS BIGINT) AS third, true AS missing
        FROM region LIMIT 1"""),
    # ---- batch 35: cast/datatype edges (funcs_and_sql_datatype_sql,
    # array_sql_union_all) ----
    # invalid cast → NULL (ANSI-off semantics, matches Druid's lenient
    # CAST)
    "sqlc_cast_invalid_to_null": ("""
        SELECT CAST('abc' AS BIGINT) IS NULL AS bad_int,
               CAST('12x' AS DOUBLE) IS NULL AS bad_dbl,
               CAST('42' AS BIGINT) AS good
        FROM region ORDER BY r_regionkey LIMIT 1""", """
        SELECT true AS bad_int, true AS bad_dbl,
               CAST(42 AS BIGINT) AS good
        FROM region ORDER BY r_regionkey LIMIT 1"""),
    # boolean ↔ string casts
    "sqlc_cast_bool_string": ("""
        SELECT CAST(TRUE AS VARCHAR) AS t, CAST(FALSE AS VARCHAR) AS f,
               CAST('true' AS BOOLEAN) AS bt
        FROM region ORDER BY r_regionkey LIMIT 1""", """
        SELECT 'true' AS t, 'false' AS f, true AS bt
        FROM region ORDER BY r_regionkey LIMIT 1"""),
    # CAST(ts AS DATE) as a group key
    "sqlc_cast_ts_to_date": ("""
        SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS d, count(*) AS n
        FROM events GROUP BY 1 ORDER BY 1 LIMIT 6""", """
        SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS d,
               count(*) AS n
        FROM events GROUP BY 1 ORDER BY 1 LIMIT 6"""),
    # implicit numeric-string comparison coercion
    "sqlc_implicit_cast_compare": ("""
        SELECT COUNT(*) FILTER (WHERE '7' = p_size) AS s_eq,
               COUNT(*) FILTER (WHERE p_size > '40') AS s_gt
        FROM part""", """
        SELECT COUNT(*) FILTER (WHERE 7 = p_size) AS s_eq,
               COUNT(*) FILTER (WHERE p_size > 40) AS s_gt
        FROM part"""),
    # UNION ALL of array-producing branches, unnested and counted
    "sqlc_array_union_all": ("""
        SELECT tok, count(*) AS n FROM (
          SELECT STRING_TO_MV(r_name, ' ') AS arr FROM region
          UNION ALL
          SELECT ARRAY['EXTRA', 'ASIA'] AS arr FROM region
          WHERE r_regionkey = 0) t
        CROSS JOIN UNNEST(t.arr) AS u(tok)
        WHERE tok IN ('ASIA', 'EXTRA', 'EAST')
        GROUP BY tok ORDER BY tok""", """
        SELECT tok, count(*) AS n FROM (
          SELECT string_split(r_name, ' ') AS arr FROM region
          UNION ALL
          SELECT ['EXTRA', 'ASIA'] AS arr FROM region
          WHERE r_regionkey = 0) t,
        unnest(t.arr) AS u(tok)
        WHERE tok IN ('ASIA', 'EXTRA', 'EAST')
        GROUP BY tok ORDER BY tok"""),
    # ---- batch 36: grouping/ordering remainder ----
    # HAVING on the GROUPING() indicator itself
    "sqlc_grouping_sets_having_grouping": ("""
        SELECT o_orderstatus, count(*) AS n
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), ())
        HAVING GROUPING(o_orderstatus) = 0
        ORDER BY o_orderstatus""", """
        SELECT o_orderstatus, count(*) AS n
        FROM orders GROUP BY o_orderstatus
        ORDER BY o_orderstatus"""),
    # ORDER BY an aggregate that is not projected
    "sqlc_order_by_unprojected_agg": ("""
        SELECT o_orderpriority
        FROM orders GROUP BY o_orderpriority
        ORDER BY count(*) DESC, o_orderpriority LIMIT 3""", None),
    # COUNT(*) vs COUNT(1) vs COUNT(col) vs COUNT(nullable col)
    "sqlc_count_forms_matrix": ("""
        SELECT count(*) AS c_star, count(1) AS c_one,
               count(o_orderstatus) AS c_col,
               count(NULLIF(o_orderstatus, 'O')) AS c_nullable
        FROM orders""", None),
    # INTERSECT/EXCEPT against aggregated branches
    "sqlc_setops_on_aggregates": ("""
        SELECT count(*) AS n FROM (
          SELECT o_custkey FROM orders GROUP BY o_custkey
            HAVING count(*) >= 25
          INTERSECT
          SELECT c_custkey FROM customer WHERE c_acctbal > 0) t""",
        None),
    # EXCEPT ALL (multiset difference)
    "sqlc_except_all_multiset": ("""
        SELECT count(*) AS n FROM (
          SELECT l_linenumber FROM lineitem WHERE l_orderkey < 100
          EXCEPT ALL
          SELECT l_linenumber FROM lineitem WHERE l_orderkey < 50) t""",
        None),
    # ---- batch 37: analytical composition patterns ----
    # month-over-month delta via LAG over an aggregated series
    "sqlc_lag_month_over_month": ("""
        SELECT m, n,
               n - LAG(n) OVER (ORDER BY m) AS delta
        FROM (SELECT TIME_FLOOR(o_orderdate, 'P1M') AS m,
                     count(*) AS n
              FROM orders GROUP BY 1) t
        ORDER BY m LIMIT 12""", """
        SELECT m, n, n - LAG(n) OVER (ORDER BY m) AS delta
        FROM (SELECT date_trunc('month', o_orderdate)::TIMESTAMP AS m,
                     count(*) AS n
              FROM orders GROUP BY 1) t
        ORDER BY m LIMIT 12"""),
    # ratio-to-report: share of total via window over aggregate
    "sqlc_pct_of_total": ("""
        SELECT c_mktsegment,
               CAST(round(100.0 * SUM(c_acctbal)
                 / SUM(SUM(c_acctbal)) OVER (), 3) AS DOUBLE) AS pct
        FROM customer GROUP BY c_mktsegment
        ORDER BY c_mktsegment""", """
        SELECT c_mktsegment,
               round(100.0 * SUM(c_acctbal)
                 / SUM(SUM(c_acctbal)) OVER (), 3) AS pct
        FROM customer GROUP BY c_mktsegment
        ORDER BY c_mktsegment"""),
    # latest-row-per-key dedup via ROW_NUMBER = 1
    "sqlc_latest_per_key_dedup": ("""
        SELECT user_id, event_id FROM (
          SELECT user_id, event_id,
                 ROW_NUMBER() OVER (PARTITION BY user_id
                                    ORDER BY ts DESC, event_id DESC)
                   AS rn
          FROM events WHERE user_id < 20) t
        WHERE rn = 1 ORDER BY user_id""", None),
    # ---- batch 38: CalciteSimpleQueryTest time+dim ordering matrix ----
    # testGroupByDimAndTimeOrderByTimeAndDim
    "sqlc_dim_time_order_time_dim": ("""
        SELECT event_type, TIME_FLOOR(ts, 'P1D') AS d, count(*) AS n
        FROM events
        WHERE ts < TIMESTAMP '2024-01-04'
        GROUP BY 1, 2 ORDER BY d, event_type""", """
        SELECT event_type, date_trunc('day', ts)::TIMESTAMP AS d,
               count(*) AS n
        FROM events WHERE ts < TIMESTAMP '2024-01-04'
        GROUP BY 1, 2 ORDER BY d, event_type"""),
    # testGroupByTimeAndDimOrderByDimDesc
    "sqlc_time_dim_order_dim_desc": ("""
        SELECT TIME_FLOOR(ts, 'P1D') AS d, event_type, count(*) AS n
        FROM events
        WHERE ts < TIMESTAMP '2024-01-03'
        GROUP BY 1, 2 ORDER BY event_type DESC, d""", """
        SELECT date_trunc('day', ts)::TIMESTAMP AS d, event_type,
               count(*) AS n
        FROM events WHERE ts < TIMESTAMP '2024-01-03'
        GROUP BY 1, 2 ORDER BY event_type DESC, d"""),
    # testGroupByDimAndTimeWhereOnTime (WHERE restricts the time key)
    "sqlc_dim_time_where_on_time": ("""
        SELECT event_type, TIME_FLOOR(ts, 'P1D') AS d, count(*) AS n
        FROM events
        WHERE TIME_FLOOR(ts, 'P1D') = TIMESTAMP '2024-01-05'
        GROUP BY 1, 2 ORDER BY 1""", """
        SELECT event_type, date_trunc('day', ts)::TIMESTAMP AS d,
               count(*) AS n
        FROM events
        WHERE date_trunc('day', ts) = TIMESTAMP '2024-01-05'
        GROUP BY 1, 2 ORDER BY 1"""),
    # testEarliestByLatestByWithExpression (agg over computed value,
    # ordered by a computed time)
    "sqlc_earliest_latest_expression": ("""
        SELECT event_type,
               EARLIEST_BY(UPPER(event_type) || '-' ||
                           CAST(event_id AS VARCHAR),
                           TIME_EXTRACT(ts, 'EPOCH') * 1000000
                             + event_id) AS first_tag
        FROM events GROUP BY event_type ORDER BY event_type""", """
        SELECT event_type,
               min_by(UPPER(event_type) || '-' ||
                      CAST(event_id AS VARCHAR),
                      CAST(epoch(ts) AS BIGINT) * 1000000 + event_id)
                 AS first_tag
        FROM events GROUP BY event_type ORDER BY event_type"""),
    # ---- batch 39: time-floor comparison arms / grand-total having ----
    # testHavingOnGrandTotal (HAVING with no GROUP BY)
    "sqlc_having_on_grand_total": ("""
        SELECT count(*) AS n, CAST(round(SUM(o_totalprice), 2) AS DOUBLE)
                 AS total
        FROM orders HAVING count(*) > 10""", """
        SELECT count(*) AS n, round(SUM(o_totalprice), 2) AS total
        FROM orders HAVING count(*) > 10"""),
    # testFilterOnNotTimeFloor
    "sqlc_filter_not_time_floor": ("""
        SELECT count(*) AS n FROM events
        WHERE TIME_FLOOR(ts, 'P1D') <> TIMESTAMP '2024-01-05'""", """
        SELECT count(*) AS n FROM events
        WHERE date_trunc('day', ts) <> TIMESTAMP '2024-01-05'"""),
    # testFilterOnTimeFloorComparisonMisaligned (bound not on a bucket
    # boundary — floor(ts) > mid-day instant)
    "sqlc_time_floor_misaligned_bound": ("""
        SELECT count(*) AS n FROM events
        WHERE TIME_FLOOR(ts, 'P1D') > TIMESTAMP '2024-01-05 12:00:00'""",
        """
        SELECT count(*) AS n FROM events
        WHERE date_trunc('day', ts) > TIMESTAMP '2024-01-05 12:00:00'"""),
    # testCountStarWithBetweenFloorTimeFilter
    "sqlc_between_floor_time": ("""
        SELECT count(*) AS n FROM events
        WHERE FLOOR(ts TO DAY) BETWEEN TIMESTAMP '2024-01-03'
                                   AND TIMESTAMP '2024-01-06'""", """
        SELECT count(*) AS n FROM events
        WHERE date_trunc('day', ts) BETWEEN TIMESTAMP '2024-01-03'
                                        AND TIMESTAMP '2024-01-06'"""),
    # testExactCountDistinctUsingSubqueryOnUnionAllTables
    "sqlc_cd_over_union_all": ("""
        SELECT COUNT(DISTINCT k) AS n FROM (
          SELECT o_custkey AS k FROM orders
          UNION ALL
          SELECT c_custkey AS k FROM customer) t""", None),
    # ---- batch 40: named WINDOW clause shapes (DrillWindowQueryTest
    # aggregates/frameclause corpus) ----
    # WINDOW w AS (...) reused by several functions
    "sqlc_named_window_clause": ("""
        SELECT o_orderstatus, o_orderkey,
          COUNT(*) OVER w AS c,
          CAST(round(SUM(o_totalprice) OVER w, 2) AS DOUBLE) AS s,
          FIRST_VALUE(o_orderkey) OVER w AS fv
        FROM (SELECT * FROM orders ORDER BY o_orderkey LIMIT 20) t
        WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_orderkey
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        ORDER BY o_orderkey""", """
        SELECT o_orderstatus, o_orderkey,
          COUNT(*) OVER w AS c,
          round(SUM(o_totalprice) OVER w, 2) AS s,
          FIRST_VALUE(o_orderkey) OVER w AS fv
        FROM (SELECT * FROM orders ORDER BY o_orderkey LIMIT 20) t
        WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_orderkey
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        ORDER BY o_orderkey"""),
    # window in subquery + outer window over its result (aggOWnFn_1.q)
    "sqlc_window_over_window_subquery": ("""
        SELECT o_orderkey, nt,
          LEAD(nt) OVER (PARTITION BY o_orderstatus
                         ORDER BY o_orderkey) AS next_nt
        FROM (SELECT o_orderkey, o_orderstatus,
                     NTILE(3) OVER (PARTITION BY o_orderstatus
                                    ORDER BY o_orderkey) AS nt
              FROM (SELECT * FROM orders ORDER BY o_orderkey
                    LIMIT 18) x) sub
        ORDER BY o_orderkey""", None),
    # peers-only RANGE CURRENT ROW frame vs running ROWS frame
    # (mulwind_01.q mixed-frame projection)
    "sqlc_window_peers_frame": ("""
        SELECT l_linenumber,
          CAST(round(MIN(l_quantity) OVER (
                 ORDER BY l_linenumber
                 RANGE BETWEEN CURRENT ROW AND CURRENT ROW), 2)
               AS DOUBLE) AS peer_min,
          CAST(round(MAX(l_quantity) OVER (
                 ORDER BY l_linenumber
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
               AS DOUBLE) AS run_max
        FROM (SELECT l_linenumber, l_quantity FROM lineitem
              WHERE l_orderkey < 40) t
        ORDER BY l_linenumber, peer_min, run_max""", """
        SELECT l_linenumber,
          round(MIN(l_quantity) OVER (
                 ORDER BY l_linenumber
                 RANGE BETWEEN CURRENT ROW AND CURRENT ROW), 2)
            AS peer_min,
          round(MAX(l_quantity) OVER (
                 ORDER BY l_linenumber
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
            AS run_max
        FROM (SELECT l_linenumber, l_quantity FROM lineitem
              WHERE l_orderkey < 40) t
        ORDER BY l_linenumber, peer_min, run_max"""),
    # testMultiStatementSetsContext: SET statements ahead of the query
    "sqlc_multi_statement_set": ("""
        SET useApproximateCountDistinct = false;
        SET sqlQueryId = 'bank-set-1';
        SELECT o_orderstatus,
               APPROX_COUNT_DISTINCT(o_custkey) AS cd
        FROM orders GROUP BY 1 ORDER BY 1""", """
        SELECT o_orderstatus, COUNT(DISTINCT o_custkey) AS cd
        FROM orders GROUP BY 1 ORDER BY 1"""),
    # ---- batch 42: CalciteCorrelatedQueryTest remainder ----
    # testCorrelatedSubqueryWithLeftFilter: correlated max-daily-count
    # scalar subquery under an outer filter
    "sqlc_correlated_max_daily": ("""
        SELECT event_type,
               (SELECT MAX(users) FROM (
                  SELECT TIME_FLOOR(f.ts, 'P1D') AS d,
                         count(*) AS users
                  FROM events f
                  WHERE f.event_type = e.event_type
                  GROUP BY 1) mx) AS peak_daily
        FROM (SELECT DISTINCT event_type FROM events
              WHERE ts < TIMESTAMP '2024-01-10') e
        ORDER BY event_type""", """
        SELECT event_type,
               (SELECT MAX(users) FROM (
                  SELECT date_trunc('day', f.ts) AS d,
                         count(*) AS users
                  FROM events f
                  WHERE f.event_type = e.event_type
                  GROUP BY 1) mx) AS peak_daily
        FROM (SELECT DISTINCT event_type FROM events
              WHERE ts < TIMESTAMP '2024-01-10') e
        ORDER BY event_type"""),
    # testCorrelatedSubqueryWithCorrelatedQueryFilter: correlated
    # EXISTS whose body itself filters on the outer row
    "sqlc_correlated_query_filter": ("""
        SELECT c_mktsegment, count(*) AS n
        FROM customer c
        WHERE EXISTS (
          SELECT 1 FROM orders o
          WHERE o.o_custkey = c.c_custkey
            AND o.o_totalprice > c.c_acctbal * 10)
        GROUP BY c_mktsegment ORDER BY c_mktsegment""", None),
    # ---- batch 43: outer-join arms (sql_join quidem family) ----
    # FULL OUTER JOIN with COALESCE'd keys and null-extended aggregates
    "sqlc_full_outer_join_agg": ("""
        SELECT COALESCE(a.k, b.k) AS k, a.n_cust, b.n_supp
        FROM (SELECT c_nationkey AS k, count(*) AS n_cust
              FROM customer WHERE c_nationkey < 5 GROUP BY 1) a
        FULL OUTER JOIN
             (SELECT s_nationkey AS k, count(*) AS n_supp
              FROM supplier WHERE s_nationkey BETWEEN 3 AND 8
              GROUP BY 1) b
          ON a.k = b.k
        ORDER BY k""", None),
    # RIGHT JOIN with unmatched left side
    "sqlc_right_join_unmatched": ("""
        SELECT r.r_name, t.n
        FROM (SELECT n_regionkey AS k, count(*) AS n
              FROM nation WHERE n_regionkey < 2 GROUP BY 1) t
        RIGHT JOIN region r ON t.k = r.r_regionkey
        ORDER BY r.r_name""", None),
    # explicit CROSS JOIN, small x small, ordered + limited
    "sqlc_cross_join_limit": ("""
        SELECT a.r_name AS ra, b.r_name AS rb
        FROM region a CROSS JOIN region b
        ORDER BY ra, rb LIMIT 7""", None),
    # ---- batch 44: ANSI alternate syntaxes + sketch name aliases ----
    # TDIGEST_QUANTILE alias family (audited to the same percentile
    # compilation as APPROX_QUANTILE_DS)
    "sqlc_tdigest_alias": ("""
        SELECT CAST(round(TDIGEST_QUANTILE(o_totalprice, 0.5), 2)
                    AS DOUBLE) AS med
        FROM orders""", """
        SELECT round(quantile_cont(o_totalprice, 0.5), 2) AS med
        FROM orders"""),
    # ANSI SUBSTRING FROM ... FOR ... spelling
    "sqlc_substring_from_for": ("""
        SELECT SUBSTRING(r_name FROM 2 FOR 3) AS mid,
               SUBSTRING(r_name FROM 3) AS tail
        FROM region ORDER BY r_name""", """
        SELECT r_name[2:4] AS mid, r_name[3:] AS tail
        FROM region ORDER BY r_name"""),
    # OVERLAY ... PLACING ... FROM
    "sqlc_overlay_placing": ("""
        SELECT OVERLAY(r_name PLACING '##' FROM 2 FOR 2) AS ov
        FROM region ORDER BY r_name""", """
        SELECT r_name[1:1] || '##' || r_name[4:] AS ov
        FROM region ORDER BY r_name"""),
    # ---- batch 45: grouping-set limits / expression partitions ----
    # testGroupingSetsWithLimitOrderByGran (subtotal rows ordered by
    # grouping level then dim, limited)
    "sqlc_grouping_sets_limit_gran": ("""
        SELECT o_orderstatus, o_orderpriority,
               GROUPING(o_orderstatus, o_orderpriority) AS g,
               count(*) AS n
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                                (o_orderstatus), ())
        ORDER BY g DESC, o_orderstatus NULLS LAST,
                 o_orderpriority NULLS LAST
        LIMIT 6""", """
        SELECT o_orderstatus, o_orderpriority,
               CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT)
                 AS g,
               count(*) AS n
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                                (o_orderstatus), ())
        ORDER BY g DESC, o_orderstatus NULLS LAST,
                 o_orderpriority NULLS LAST
        LIMIT 6"""),
    # window partitioned by an expression of the column
    "sqlc_window_expr_partition": ("""
        SELECT o_orderkey,
          COUNT(*) OVER (PARTITION BY UPPER(o_orderstatus)
                         ORDER BY o_orderkey) AS cnt_in_status
        FROM (SELECT * FROM orders ORDER BY o_orderkey LIMIT 15) t
        ORDER BY o_orderkey""", None),
    # ---- batch 46: three-valued predicate operators ----
    # IS TRUE / IS NOT TRUE over a NULL-able predicate (istrue/isfalse
    # filter analogs)
    "sqlc_is_true_forms": ("""
        SELECT COUNT(*) FILTER (WHERE (NULLIF(o_totalprice, o_totalprice)
                                       > 0) IS TRUE) AS t,
               COUNT(*) FILTER (WHERE (NULLIF(o_totalprice, o_totalprice)
                                       > 0) IS NOT TRUE) AS nt,
               COUNT(*) FILTER (WHERE (o_totalprice > 0) IS TRUE) AS pt
        FROM orders""", None),
    # NOT BETWEEN
    "sqlc_not_between": ("""
        SELECT count(*) AS n FROM part
        WHERE p_size NOT BETWEEN 10 AND 40""", None),
    # IN list containing NULL (three-valued: never matches via NULL,
    # NOT IN with NULL matches nothing)
    "sqlc_in_with_null_element": ("""
        SELECT COUNT(*) FILTER (WHERE p_size IN (7, NULL)) AS in_n,
               COUNT(*) FILTER (WHERE p_size NOT IN (7, NULL)) AS notin_n
        FROM part""", None),
    # ---- batch 47: DATE literals / USING joins ----
    # EXTRACT over DATE literals + DATE arithmetic
    "sqlc_date_literal_arith": ("""
        SELECT EXTRACT(YEAR FROM DATE '2024-03-05') AS y,
               EXTRACT(MONTH FROM DATE '2024-03-05') AS m,
               CAST(DATE '2024-01-01' + INTERVAL 45 DAY AS VARCHAR)
                 AS plus45
        FROM region ORDER BY r_regionkey LIMIT 1""", """
        SELECT CAST(2024 AS BIGINT) AS y, CAST(3 AS BIGINT) AS m,
               '2024-02-15' AS plus45
        FROM region ORDER BY r_regionkey LIMIT 1"""),
    # JOIN ... USING (shared key name)
    "sqlc_join_using_subqueries": ("""
        SELECT count(*) AS n FROM
          (SELECT n_regionkey AS rk, n_name FROM nation) a
        JOIN (SELECT r_regionkey AS rk, r_name FROM region) b
        USING (rk)""", None),
    # ---- batch 48: CTE chains + cast ordering ----
    # chained CTEs where the second builds on the first, UNION'd
    "sqlc_cte_chain_union": ("""
        WITH base AS (
          SELECT o_orderstatus AS st, count(*) AS n
          FROM orders GROUP BY 1),
        doubled AS (
          SELECT st, n * 2 AS n2 FROM base)
        SELECT st, CAST(n AS BIGINT) AS v, 'raw' AS kind FROM base
        UNION ALL
        SELECT st, CAST(n2 AS BIGINT) AS v, 'x2' AS kind FROM doubled
        ORDER BY st, kind""", None),
    # ORDER BY a CAST of a string-rendered number (numeric, not
    # lexicographic: 9 before 10)
    "sqlc_order_by_cast_string": ("""
        SELECT CAST(p_partkey AS VARCHAR) AS pk FROM part
        WHERE p_partkey IN (9, 10, 100, 2)
        ORDER BY CAST(CAST(p_partkey AS VARCHAR) AS BIGINT)""", """
        SELECT CAST(p_partkey AS VARCHAR) AS pk FROM part
        WHERE p_partkey IN (9, 10, 100, 2)
        ORDER BY p_partkey"""),
    # ---- batch 49: millis round-trip / LIMIT 0 ----
    # MILLIS_TO_TIMESTAMP ∘ TIMESTAMP_TO_MILLIS identity
    "sqlc_millis_round_trip": ("""
        SELECT count(*) AS n FROM events
        WHERE MILLIS_TO_TIMESTAMP(TIMESTAMP_TO_MILLIS(ts))
              BETWEEN TIMESTAMP '2024-01-02' AND TIMESTAMP '2024-01-04'
        """, """
        SELECT count(*) AS n FROM events
        WHERE make_timestamp(epoch_ms(ts) * 1000)
              BETWEEN TIMESTAMP '2024-01-02' AND TIMESTAMP '2024-01-04'
        """),
    # LIMIT 0: empty result with intact schema
    "sqlc_limit_zero_groupby": ("""
        SELECT r_name, count(*) AS n FROM region
        GROUP BY r_name LIMIT 0""", None),
    # ---- batch 50: final mixed shapes ----
    # aggregate of a window result (two query levels)
    "sqlc_agg_of_window": ("""
        SELECT CAST(round(AVG(gap), 3) AS DOUBLE) AS avg_gap
        FROM (SELECT o_orderkey - LAG(o_orderkey) OVER (
                       ORDER BY o_orderkey) AS gap
              FROM (SELECT o_orderkey FROM orders
                    ORDER BY o_orderkey LIMIT 200) t) g
        WHERE gap IS NOT NULL""", """
        SELECT round(AVG(gap), 3) AS avg_gap
        FROM (SELECT o_orderkey - LAG(o_orderkey) OVER (
                       ORDER BY o_orderkey) AS gap
              FROM (SELECT o_orderkey FROM orders
                    ORDER BY o_orderkey LIMIT 200) t) g
        WHERE gap IS NOT NULL"""),
    # WHERE on a scalar function of two aggregating subqueries
    "sqlc_two_scalar_subqueries": ("""
        SELECT count(*) AS n FROM orders
        WHERE o_totalprice >
              (SELECT AVG(o_totalprice) FROM orders)
          AND o_custkey <= (SELECT MAX(c_custkey) FROM customer)""",
        None),
    # ---- batch 51: quantile-name arms + grouped quantiles ----
    # APPROX_QUANTILE (approxHistogram SQL name) grouped per dimension
    "sqlc_approx_quantile_grouped": ("""
        SELECT l_returnflag,
               CAST(FLOOR(APPROX_QUANTILE(l_extendedprice, 0.5))
                    AS BIGINT) AS med,
               CAST(FLOOR(APPROX_QUANTILE(l_extendedprice, 0.95))
                    AS BIGINT) AS p95
        FROM lineitem GROUP BY 1 ORDER BY 1""", """
        SELECT l_returnflag,
               CAST(FLOOR(quantile_cont(l_extendedprice, 0.5))
                    AS BIGINT) AS med,
               CAST(FLOOR(quantile_cont(l_extendedprice, 0.95))
                    AS BIGINT) AS p95
        FROM lineitem GROUP BY 1 ORDER BY 1"""),
    # quantile of an expression (not a bare column)
    "sqlc_quantile_of_expression": ("""
        SELECT CAST(round(APPROX_QUANTILE_DS(
                 l_extendedprice * (1 - l_discount), 0.9), 2) AS DOUBLE)
                 AS p90_rev
        FROM lineitem""", """
        SELECT round(quantile_cont(
                 l_extendedprice * (1 - l_discount), 0.9), 2) AS p90_rev
        FROM lineitem"""),
    # ---- batch 52: variance-family SQL names ----
    "sqlc_variance_name_matrix": ("""
        SELECT l_returnflag,
               CAST(round(VAR_SAMP(l_quantity), 4) AS DOUBLE) AS vs,
               CAST(round(VAR_POP(l_quantity), 4) AS DOUBLE) AS vp,
               CAST(round(STDDEV_SAMP(l_quantity), 4) AS DOUBLE) AS ss,
               CAST(round(STDDEV_POP(l_quantity), 4) AS DOUBLE) AS sp,
               CAST(round(VARIANCE(l_quantity), 4) AS DOUBLE) AS v,
               CAST(round(STDDEV(l_quantity), 4) AS DOUBLE) AS s
        FROM lineitem GROUP BY 1 ORDER BY 1""", """
        SELECT l_returnflag,
               round(VAR_SAMP(l_quantity), 4) AS vs,
               round(VAR_POP(l_quantity), 4) AS vp,
               round(STDDEV_SAMP(l_quantity), 4) AS ss,
               round(STDDEV_POP(l_quantity), 4) AS sp,
               round(VAR_SAMP(l_quantity), 4) AS v,
               round(STDDEV_SAMP(l_quantity), 4) AS s
        FROM lineitem GROUP BY 1 ORDER BY 1"""),
    # ---- batch 53: residual operator combinations ----
    # HAVING combining an aggregate and a grouped expression
    "sqlc_having_agg_and_dim_expr": ("""
        SELECT o_orderstatus, CHAR_LENGTH(o_orderpriority) AS plen,
               count(*) AS n
        FROM orders GROUP BY 1, 2
        HAVING count(*) > 500 AND CHAR_LENGTH(o_orderpriority) >= 8
        ORDER BY 1, 2""", """
        SELECT o_orderstatus, CAST(length(o_orderpriority) AS INT)
                 AS plen,
               count(*) AS n
        FROM orders GROUP BY 1, length(o_orderpriority)
        HAVING count(*) > 500 AND length(o_orderpriority) >= 8
        ORDER BY 1, 2"""),
    # DISTINCT aggregate + plain aggregate + filtered aggregate in one
    # SELECT (three rewrite paths at once)
    "sqlc_mixed_agg_kinds": ("""
        SELECT COUNT(DISTINCT o_orderpriority) AS d,
               CAST(round(SUM(o_totalprice), 0) AS BIGINT) AS s,
               COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS f
        FROM orders""", """
        SELECT COUNT(DISTINCT o_orderpriority) AS d,
               CAST(round(SUM(o_totalprice), 0) AS BIGINT) AS s,
               COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS f
        FROM orders"""),
    # ---- batch 54: time-interval RANGE frames ----
    # sliding 2-day window over a daily series (RANGE INTERVAL frame —
    # the time-based sliding aggregate a streaming dashboard uses)
    "sqlc_window_range_interval": ("""
        SELECT d, n,
          CAST(SUM(n) OVER (ORDER BY d
            RANGE BETWEEN INTERVAL 2 DAY PRECEDING AND CURRENT ROW)
            AS BIGINT) AS n_3day
        FROM (SELECT TIME_FLOOR(ts, 'P1D') AS d, count(*) AS n
              FROM events GROUP BY 1) t
        ORDER BY d LIMIT 12""", """
        SELECT d, n,
          CAST(SUM(n) OVER (ORDER BY d
            RANGE BETWEEN INTERVAL 2 DAY PRECEDING AND CURRENT ROW)
            AS BIGINT) AS n_3day
        FROM (SELECT date_trunc('day', ts)::TIMESTAMP AS d,
                     count(*) AS n
              FROM events GROUP BY 1) t
        ORDER BY d LIMIT 12"""),
    # ---- batch 41: syntax robustness (basics_basic_syntax.iq) ----
    # line + block comments inside the statement
    "sqlc_sql_comments": ("""
        SELECT /* leading block comment */ r_name, -- trailing line
               count(*) AS n  /* mid */
        FROM region -- the dim table
        GROUP BY r_name ORDER BY r_name /* tail */""", """
        SELECT r_name, count(*) AS n
        FROM region GROUP BY r_name ORDER BY r_name"""),
    # lower-case Druid function spellings resolve identically
    "sqlc_lowercase_fn_names": ("""
        select time_floor(ts, 'P1D') as d,
               mv_to_string(string_to_mv('a|b', '\|'), ',') as mv,
               safe_divide(10, 4) as q,
               count(*) as n
        from events group by 1, 2, 3 order by 1 limit 3""", """
        SELECT date_trunc('day', ts)::TIMESTAMP AS d,
               'a,b' AS mv, 2.5 AS q, count(*) AS n
        FROM events GROUP BY 1, 2, 3 ORDER BY 1 LIMIT 3"""),
    # CalciteSelectQueryTest: constant expression select (no table refs
    # beyond a 1-row anchor)
    "sqlc_select_constants": ("""
        SELECT 1 + 1 AS two, 'a' || 'b' AS ab,
               CEIL(1.5) AS c, FLOOR(-1.5) AS f,
               MOD(10, 3) AS m, POWER(2, 10) AS p
        FROM region ORDER BY r_regionkey LIMIT 1""", """
        SELECT 2 AS two, 'ab' AS ab,
               CAST(2 AS DOUBLE) AS c, CAST(-2 AS DOUBLE) AS f,
               10 % 3 AS m, CAST(1024 AS DOUBLE) AS p
        FROM region ORDER BY r_regionkey LIMIT 1"""),

    # ----------------------------------------------------------------
    # Conformance batch 55: the full TPC-H query-shape suite
    # (q2..q22; q1/q3/q6 are standalone entries). The reference runs
    # TPC-H through quidem (quidem-ut/.../qaTpch/broadcast.msq.iq,
    # sortMerge.msq.iq). The driver testdata is a REDUCED TPC-H schema
    # — no partsupp table, no comment/phone/address/shipmode/
    # commitdate/receiptdate/container/mfgr columns — so each query
    # keeps its defining operator shape (join graph, correlated
    # subqueries, EXISTS/NOT EXISTS, nested aggregates, scalar
    # subqueries in HAVING) with documented stand-ins:
    #   * partsupp        -> distinct (l_partkey, l_suppkey) pairs
    #   * ps_supplycost   -> p_retailprice-derived cost
    #   * commit<receipt  -> l_shipdate > o_orderdate (late shipment)
    #   * l_shipmode      -> o_orderpriority classes
    #   * c_phone code    -> c_nationkey
    # Dates are shifted into the testdata's 1995..2001 span.
    # ----------------------------------------------------------------
    # q2: min-value correlated scalar subquery over a join
    "sqlc_tpch_q02": ("""
        SELECT s_acctbal, s_name, n_name, p_partkey, p_brand
        FROM part
        JOIN lineitem ON p_partkey = l_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE p_size = 15 AND p_type = 'STANDARD' AND r_name = 'EUROPE'
          AND s_acctbal = (SELECT MIN(s2.s_acctbal)
                           FROM supplier s2
                           JOIN lineitem l2 ON s2.s_suppkey = l2.l_suppkey
                           JOIN nation n2 ON s2.s_nationkey = n2.n_nationkey
                           JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
                           WHERE l2.l_partkey = p_partkey
                             AND r2.r_name = 'EUROPE')
        GROUP BY s_acctbal, s_name, n_name, p_partkey, p_brand
        ORDER BY s_acctbal DESC, n_name, s_name, p_partkey LIMIT 10""",
     None),
    # q4: EXISTS-correlated order-priority checking
    "sqlc_tpch_q04": ("""
        SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-07-01'
          AND o_orderdate < TIMESTAMP '1996-10-01'
          AND EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o_orderkey
                        AND l_shipdate > o_orderdate)
        GROUP BY o_orderpriority ORDER BY o_orderpriority""", None),
    # q5: local-supplier volume (6-way join, same-nation constraint)
    "sqlc_tpch_q05": ("""
        SELECT n_name,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey
                     AND c_nationkey = s_nationkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate < TIMESTAMP '1997-01-01'
        GROUP BY n_name ORDER BY revenue DESC, n_name""", None),
    # q7: volume shipping between two nations, year extraction
    "sqlc_tpch_q07": ("""
        SELECT supp_nation, cust_nation, l_year,
               ROUND(SUM(volume), 2) AS revenue
        FROM (SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                     EXTRACT(YEAR FROM l_shipdate) AS l_year,
                     l_extendedprice * (1 - l_discount) AS volume
              FROM supplier
              JOIN lineitem ON s_suppkey = l_suppkey
              JOIN orders ON o_orderkey = l_orderkey
              JOIN customer ON c_custkey = o_custkey
              JOIN nation n1 ON s_nationkey = n1.n_nationkey
              JOIN nation n2 ON c_nationkey = n2.n_nationkey
              WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
                  OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
                AND l_shipdate BETWEEN TIMESTAMP '1996-01-01'
                                   AND TIMESTAMP '1997-12-31') shipping
        GROUP BY supp_nation, cust_nation, l_year
        ORDER BY supp_nation, cust_nation, l_year""", None),
    # q8: market share (8-way join, share-of-total CASE ratio)
    "sqlc_tpch_q08": ("""
        SELECT o_year,
               ROUND(SUM(CASE WHEN nation = 'NATION_3' THEN volume
                              ELSE 0 END) / SUM(volume), 4) AS mkt_share
        FROM (SELECT EXTRACT(YEAR FROM o_orderdate) AS o_year,
                     l_extendedprice * (1 - l_discount) AS volume,
                     n2.n_name AS nation
              FROM part
              JOIN lineitem ON p_partkey = l_partkey
              JOIN supplier ON s_suppkey = l_suppkey
              JOIN orders ON l_orderkey = o_orderkey
              JOIN customer ON o_custkey = c_custkey
              JOIN nation n1 ON c_nationkey = n1.n_nationkey
              JOIN region ON n1.n_regionkey = r_regionkey
              JOIN nation n2 ON s_nationkey = n2.n_nationkey
              WHERE r_name = 'AMERICA'
                AND o_orderdate BETWEEN TIMESTAMP '1996-01-01'
                                    AND TIMESTAMP '1997-12-31'
                AND p_type = 'ECONOMY') all_nations
        GROUP BY o_year ORDER BY o_year""", None),
    # q9: product-type profit (cost via p_retailprice stand-in)
    "sqlc_tpch_q09": ("""
        SELECT nation, o_year, ROUND(SUM(amount), 2) AS sum_profit
        FROM (SELECT n_name AS nation,
                     EXTRACT(YEAR FROM o_orderdate) AS o_year,
                     l_extendedprice * (1 - l_discount)
                       - p_retailprice * l_quantity * 0.1 AS amount
              FROM part
              JOIN lineitem ON p_partkey = l_partkey
              JOIN supplier ON s_suppkey = l_suppkey
              JOIN orders ON o_orderkey = l_orderkey
              JOIN nation ON s_nationkey = n_nationkey
              WHERE p_name LIKE '%red%') profit
        GROUP BY nation, o_year ORDER BY nation, o_year DESC""", None),
    # q10: returned-item reporting (top-20 revenue customers)
    "sqlc_tpch_q10": ("""
        SELECT c_custkey, c_name,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
               c_acctbal, n_name
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN nation ON c_nationkey = n_nationkey
        WHERE o_orderdate >= TIMESTAMP '1996-10-01'
          AND o_orderdate < TIMESTAMP '1997-01-01'
          AND l_returnflag = 'R'
        GROUP BY c_custkey, c_name, c_acctbal, n_name
        ORDER BY revenue DESC, c_custkey LIMIT 20""", None),
    # q11: important stock (HAVING against an uncorrelated scalar
    # subquery; partsupp value -> lineitem extendedprice*quantity)
    "sqlc_tpch_q11": ("""
        SELECT l_partkey AS ps_partkey,
               ROUND(SUM(l_extendedprice * l_quantity), 2) AS part_value
        FROM lineitem
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        WHERE n_name = 'NATION_7'
        GROUP BY l_partkey
        HAVING SUM(l_extendedprice * l_quantity) >
               (SELECT SUM(l_extendedprice * l_quantity) * 0.002
                FROM lineitem
                JOIN supplier ON l_suppkey = s_suppkey
                JOIN nation ON s_nationkey = n_nationkey
                WHERE n_name = 'NATION_7')
        ORDER BY part_value DESC, ps_partkey LIMIT 30""", None),
    # q12: shipping-priority classes (late-shipment stand-in)
    "sqlc_tpch_q12": ("""
        SELECT l_returnflag,
               CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                             THEN 1 ELSE 0 END) AS BIGINT)
                 AS high_line_count,
               CAST(SUM(CASE WHEN o_orderpriority NOT IN
                                  ('1-URGENT', '2-HIGH')
                             THEN 1 ELSE 0 END) AS BIGINT)
                 AS low_line_count
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        WHERE l_shipdate > o_orderdate
          AND l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1997-01-01'
        GROUP BY l_returnflag ORDER BY l_returnflag""", None),
    # q13: customer order-count distribution (filtered LEFT JOIN,
    # aggregate of an aggregate)
    "sqlc_tpch_q13": ("""
        SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
        FROM (SELECT c_custkey,
                     CAST(COUNT(o_orderkey) AS BIGINT) AS c_count
              FROM customer
              LEFT OUTER JOIN orders
                ON c_custkey = o_custkey
               AND o_orderpriority <> '1-URGENT'
              GROUP BY c_custkey) c_orders
        GROUP BY c_count ORDER BY custdist DESC, c_count DESC""", None),
    # q14: promotion revenue share
    "sqlc_tpch_q14": ("""
        SELECT ROUND(100.00 * SUM(CASE WHEN p_type = 'PROMO'
                                       THEN l_extendedprice
                                            * (1 - l_discount)
                                       ELSE 0 END)
                     / SUM(l_extendedprice * (1 - l_discount)), 4)
                 AS promo_revenue
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1996-09-01'
          AND l_shipdate < TIMESTAMP '1996-10-01'""", None),
    # q15: top supplier (CTE + MAX scalar subquery over the CTE)
    "sqlc_tpch_q15": ("""
        WITH revenue AS (
            SELECT l_suppkey AS supplier_no,
                   SUM(l_extendedprice * (1 - l_discount)) AS total_rev
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate < TIMESTAMP '1996-04-01'
            GROUP BY l_suppkey)
        SELECT s_suppkey, s_name, ROUND(total_rev, 2) AS total_revenue
        FROM supplier JOIN revenue ON s_suppkey = supplier_no
        WHERE total_rev = (SELECT MAX(total_rev) FROM revenue)
        ORDER BY s_suppkey""", None),
    # q16: supplier-count by part attrs (NOT IN subquery + COUNT
    # DISTINCT; partsupp -> lineitem pairs)
    "sqlc_tpch_q16": ("""
        SELECT p_brand, p_type, p_size,
               CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE p_brand <> 'Brand#45' AND p_type NOT LIKE 'MEDIUM%'
          AND p_size IN (3, 9, 14, 19, 23, 36, 45, 49)
          AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                                WHERE s_acctbal < 100.0)
        GROUP BY p_brand, p_type, p_size
        ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
        LIMIT 20""", None),
    # q17: small-quantity-order revenue (correlated AVG subquery)
    "sqlc_tpch_q17": ("""
        SELECT ROUND(SUM(l_extendedprice) / 7.0, 2) AS avg_yearly
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE p_brand = 'Brand#13' AND p_size < 25
          AND l_quantity < (SELECT 0.5 * AVG(l2.l_quantity)
                            FROM lineitem l2
                            WHERE l2.l_partkey = p_partkey)""", None),
    # q18: large-volume customers (IN over GROUP BY ... HAVING)
    "sqlc_tpch_q18": ("""
        SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
               ROUND(SUM(l_quantity), 2) AS sum_qty
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON o_orderkey = l_orderkey
        WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
                             GROUP BY l_orderkey
                             HAVING SUM(l_quantity) > 150)
        GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
        ORDER BY o_totalprice DESC, o_orderdate, o_orderkey
        LIMIT 100""", None),
    # q19: discounted revenue (disjunctive multi-range predicates)
    "sqlc_tpch_q19": ("""
        SELECT ROUND(SUM(l_extendedprice * (1 - l_discount)), 2)
                 AS revenue
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
               AND l_quantity BETWEEN 1 AND 11)
           OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
               AND l_quantity BETWEEN 10 AND 20)
           OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35
               AND l_quantity BETWEEN 20 AND 30)""", None),
    # q20: potential part promotion (nested IN subqueries with
    # grouped HAVING; partsupp availability -> shipped quantity)
    "sqlc_tpch_q20": ("""
        SELECT s_name, s_suppkey
        FROM supplier JOIN nation ON s_nationkey = n_nationkey
        WHERE n_regionkey = 2
          AND s_suppkey IN (
              SELECT l_suppkey FROM lineitem
              WHERE l_partkey IN (SELECT p_partkey FROM part
                                  WHERE p_name LIKE 'small%')
                AND l_shipdate >= TIMESTAMP '1996-01-01'
                AND l_shipdate < TIMESTAMP '1997-01-01'
              GROUP BY l_suppkey, l_partkey
              HAVING SUM(l_quantity) > 20)
        ORDER BY s_name, s_suppkey""", None),
    # q21: suppliers who kept orders waiting (EXISTS + NOT EXISTS,
    # both correlated, with <> predicates; late = shipped after
    # order date)
    "sqlc_tpch_q21": ("""
        SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
        FROM supplier
        JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
        JOIN orders ON o_orderkey = l1.l_orderkey
        JOIN nation ON s_nationkey = n_nationkey
        WHERE o_orderstatus = 'F' AND l1.l_shipdate > o_orderdate
          AND n_regionkey = 1
          AND EXISTS (SELECT 1 FROM lineitem l2
                      WHERE l2.l_orderkey = l1.l_orderkey
                        AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM lineitem l3
                          WHERE l3.l_orderkey = l1.l_orderkey
                            AND l3.l_suppkey <> l1.l_suppkey
                            AND l3.l_shipdate > o_orderdate)
        GROUP BY s_name
        ORDER BY numwait DESC, s_name LIMIT 100""", None),
    # q22: global sales opportunity (anti-join via NOT EXISTS +
    # uncorrelated AVG scalar subquery; country code -> c_nationkey)
    "sqlc_tpch_q22": ("""
        SELECT c_nationkey AS cntrycode,
               CAST(COUNT(*) AS BIGINT) AS numcust,
               ROUND(SUM(c_acctbal), 2) AS totacctbal
        FROM customer
        WHERE c_nationkey IN (1, 3, 5, 13, 17, 21, 23)
          AND c_acctbal > (SELECT AVG(c_acctbal) FROM customer
                           WHERE c_acctbal > 0.00
                             AND c_nationkey IN (1, 3, 5, 13, 17, 21, 23))
          AND NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey
                            AND o_orderdate >= TIMESTAMP '2000-01-01')
        GROUP BY c_nationkey ORDER BY cntrycode""", None),

    # ----------------------------------------------------------------
    # Conformance batch 56: previously-skipped extension SQL forms —
    # bloom-filter SQL aggregate + probe (BloomFilterSqlAggregator /
    # BloomFilterOperatorConversion; engine-internal holder, same
    # hashing as the native `bloom` agg/filter), arrayOfDoubles tuple
    # SQL finalizers, and the sketch debug-string functions.
    # ----------------------------------------------------------------
    # BLOOM_FILTER build in a scalar subquery, BLOOM_FILTER_TEST as a
    # WHERE probe; oracle is the exact semi-join (at m=2^18 and ~300
    # inserted keys the false-positive probability per probe is ~6e-12)
    "sqlc_bloom_filter_agg": ("""
        SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n
        FROM orders
        WHERE BLOOM_FILTER_TEST(o_custkey,
              (SELECT BLOOM_FILTER(c_custkey, 2000) FROM customer
               WHERE c_mktsegment = 'BUILDING'))
        GROUP BY o_orderpriority ORDER BY o_orderpriority""", """
        SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n
        FROM orders
        WHERE o_custkey IN (SELECT c_custkey FROM customer
                            WHERE c_mktsegment = 'BUILDING')
        GROUP BY o_orderpriority ORDER BY o_orderpriority"""),
    # DS_TUPLE_DOUBLES + ESTIMATE / METRICS_SUM_ESTIMATE finalizers
    # (exact mode: estimate = distinct keys, metric totals = SUMs)
    "sqlc_tuple_doubles_fns": ("""
        SELECT l_returnflag,
               DS_TUPLE_DOUBLES_ESTIMATE(
                 DS_TUPLE_DOUBLES(l_partkey, l_quantity)) AS est,
               transform(DS_TUPLE_DOUBLES_METRICS_SUM_ESTIMATE(
                   DS_TUPLE_DOUBLES(l_partkey, l_quantity,
                                    l_extendedprice)),
                 v -> round(v, 2)) AS sums
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""", """
        SELECT l_returnflag,
               CAST(COUNT(DISTINCT l_partkey) AS DOUBLE) AS est,
               [ROUND(CAST(SUM(l_quantity) AS DOUBLE), 2),
                ROUND(CAST(SUM(l_extendedprice) AS DOUBLE), 2)] AS sums
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""),
    # ----------------------------------------------------------------
    # Conformance batch 57: Star-Schema-Benchmark query shapes
    # (quidem-ut qaSsb analog: norm_* joins the dims, denorm_* queries
    # one pre-joined wide CTE; the reference additionally runs each in
    # broadcast vs sortMerge variants — mirrored here with Spark join
    # hints, which DuckDB parses as plain block comments, so the same
    # text runs on both engines). lineorder stand-in = lineitem⋈orders;
    # date dim = EXTRACT over o_orderdate.
    # ----------------------------------------------------------------
    # SSB Q1.1 (flight 1: restricted revenue sum)
    "sqlc_ssb_q1_norm": ("""
        SELECT ROUND(SUM(l_extendedprice * l_discount), 2) AS revenue
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE EXTRACT(YEAR FROM o_orderdate) = 1996
          AND l_discount BETWEEN 0.02 AND 0.04
          AND l_quantity < 25""", None),
    # SSB Q2.1 (flight 2: revenue by year and brand, dim filters)
    "sqlc_ssb_q2_norm": ("""
        SELECT EXTRACT(YEAR FROM o_orderdate) AS d_year, p_brand,
               ROUND(SUM(l_extendedprice), 2) AS lo_revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN part ON l_partkey = p_partkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        WHERE p_type = 'MEDIUM' AND n_regionkey = 1
        GROUP BY 1, 2 ORDER BY d_year, p_brand LIMIT 40""", None),
    # SSB Q3.1 (flight 3: volume between nations over years)
    "sqlc_ssb_q3_norm": ("""
        SELECT n1.n_name AS c_nation, n2.n_name AS s_nation,
               EXTRACT(YEAR FROM o_orderdate) AS d_year,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 2)
                 AS lo_revenue
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation n1 ON c_nationkey = n1.n_nationkey
        JOIN nation n2 ON s_nationkey = n2.n_nationkey
        WHERE n1.n_regionkey = 2 AND n2.n_regionkey = 2
          AND EXTRACT(YEAR FROM o_orderdate) BETWEEN 1996 AND 1997
        GROUP BY 1, 2, 3
        ORDER BY d_year, lo_revenue DESC, c_nation, s_nation
        LIMIT 50""", None),
    # SSB Q4.1 (flight 4: profit by year and customer nation)
    "sqlc_ssb_q4_norm": ("""
        SELECT EXTRACT(YEAR FROM o_orderdate) AS d_year,
               n_name AS c_nation,
               ROUND(SUM(l_extendedprice * (1 - l_discount)
                         - p_retailprice * l_quantity * 0.1), 2)
                 AS profit
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN part ON l_partkey = p_partkey
        JOIN nation ON c_nationkey = n_nationkey
        WHERE n_regionkey IN (0, 1) AND p_type IN ('ECONOMY', 'PROMO')
        GROUP BY 1, 2 ORDER BY d_year, c_nation""", None),
    # denormalized variant: one wide lineorder CTE, same Q2 rollup
    "sqlc_ssb_q2_denorm": ("""
        WITH lineorder AS (
            SELECT l_extendedprice, l_discount, l_quantity,
                   EXTRACT(YEAR FROM o_orderdate) AS d_year,
                   p_brand, p_type, n_regionkey AS s_region
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN part ON l_partkey = p_partkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation ON s_nationkey = n_nationkey)
        SELECT d_year, p_brand,
               ROUND(SUM(l_extendedprice), 2) AS lo_revenue
        FROM lineorder
        WHERE p_type = 'MEDIUM' AND s_region = 1
        GROUP BY d_year, p_brand ORDER BY d_year, p_brand
        LIMIT 40""", None),
    # join-strategy variants (qaSsb broadcast.msq.iq / sortMerge.msq.iq
    # analog): Spark reads the hints, DuckDB sees block comments —
    # results must be identical to each other and to the oracle
    "sqlc_ssb_q1_broadcast_hint": ("""
        SELECT /*+ BROADCAST(orders) */
               ROUND(SUM(l_extendedprice * l_discount), 2) AS revenue
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE EXTRACT(YEAR FROM o_orderdate) = 1996
          AND l_discount BETWEEN 0.02 AND 0.04
          AND l_quantity < 25""", None),
    "sqlc_ssb_q1_merge_hint": ("""
        SELECT /*+ MERGE(orders) */
               ROUND(SUM(l_extendedprice * l_discount), 2) AS revenue
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE EXTRACT(YEAR FROM o_orderdate) = 1996
          AND l_discount BETWEEN 0.02 AND 0.04
          AND l_quantity < 25""", None),
    # TABLE(APPEND('ds1','ds2')) — schema-merging union datasource
    # (TableAppendMacro.java / CalciteTableAppendTest.java: ordered
    # column union, typed NULL padding for missing columns)
    "sqlc_table_append": ("""
        SELECT r_regionkey, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(COUNT(n_name) AS BIGINT) AS n_nation,
               CAST(COUNT(r_name) AS BIGINT) AS n_region
        FROM TABLE(APPEND('nation', 'region')) u
        GROUP BY r_regionkey ORDER BY r_regionkey""", """
        SELECT r_regionkey, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(COUNT(n_name) AS BIGINT) AS n_nation,
               CAST(COUNT(r_name) AS BIGINT) AS n_region
        FROM (SELECT n_nationkey, n_name, n_regionkey,
                     CAST(NULL AS INTEGER) AS r_regionkey,
                     CAST(NULL AS VARCHAR) AS r_name
              FROM nation
              UNION ALL
              SELECT CAST(NULL AS INTEGER), CAST(NULL AS VARCHAR),
                     CAST(NULL AS INTEGER), r_regionkey, r_name
              FROM region) u
        GROUP BY r_regionkey ORDER BY r_regionkey"""),

    # ----------------------------------------------------------------
    # Conformance batch 58: comma-join UNNEST filter-placement matrix
    # (quidem qaUnnest array_sql/mv_sql_subquery_with_where families:
    # `FROM t, UNNEST(arr) AS u(c)` with the filter inside the derived
    # table, outside it, on the base table before the unnest, and in
    # HAVING after aggregation).
    # ----------------------------------------------------------------
    "sqlc_unnest_comma_where_outer": ("""
        SELECT c, CAST(COUNT(*) AS BIGINT) AS n
        FROM (SELECT STRING_TO_ARRAY(text, ' ') AS toks
              FROM documents) d,
             UNNEST(toks) AS u(c)
        WHERE c LIKE 'data%'
        GROUP BY c ORDER BY n DESC, c LIMIT 10""", """
        SELECT c, CAST(COUNT(*) AS BIGINT) AS n
        FROM (SELECT unnest(string_split(text, ' ')) AS c
              FROM documents) t
        WHERE c LIKE 'data%'
        GROUP BY c ORDER BY n DESC, c LIMIT 10"""),
    "sqlc_unnest_comma_where_inner": ("""
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(COUNT(DISTINCT c) AS BIGINT) AS n_distinct
        FROM (SELECT c
              FROM (SELECT STRING_TO_ARRAY(text, ' ') AS toks
                    FROM documents WHERE lang = 'en') b,
                   UNNEST(toks) AS u(c)
              WHERE c <> 'the')""", """
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(COUNT(DISTINCT c) AS BIGINT) AS n_distinct
        FROM (SELECT c FROM
              (SELECT unnest(string_split(text, ' ')) AS c
               FROM documents WHERE lang = 'en') x
              WHERE c <> 'the')"""),
    "sqlc_unnest_comma_base_filter": ("""
        SELECT c
        FROM (SELECT r_name FROM region
              WHERE r_regionkey < 3) r,
             UNNEST(STRING_TO_ARRAY(r_name, ' ')) AS u(c)
        ORDER BY c""", """
        SELECT unnest(string_split(r_name, ' ')) AS c
        FROM region WHERE r_regionkey < 3 ORDER BY c"""),
    "sqlc_unnest_comma_having": ("""
        SELECT c, CAST(COUNT(*) AS BIGINT) AS n
        FROM (SELECT STRING_TO_ARRAY(text, ' ') AS toks
              FROM documents) d,
             UNNEST(toks) AS u(c)
        GROUP BY c HAVING COUNT(*) > 50
        ORDER BY c LIMIT 20""", """
        SELECT c, CAST(COUNT(*) AS BIGINT) AS n
        FROM (SELECT unnest(string_split(text, ' ')) AS c
              FROM documents) t
        GROUP BY c HAVING COUNT(*) > 50
        ORDER BY c LIMIT 20"""),
    # --- batch 13 (round 5): quidem long-tail — qaUnnest chained/
    # double/table-function unnests, DrillWindowQueryTest frame edges
    # (PRECEDING..PRECEDING, FOLLOWING..FOLLOWING, CURRENT..CURRENT),
    # qaJsonCols deep paths, qaArray boundary semantics
    # (quidem-ut/src/test/quidem/org.apache.druid.quidem.QTest/)
    "sqlc_unnest_table_function": ("""
        SELECT c FROM UNNEST(ARRAY['b', 'a', 'c']) AS u(c)
        ORDER BY c""", """
        SELECT unnest(['b', 'a', 'c']) AS c ORDER BY c"""),
    "sqlc_unnest_double": ("""
        SELECT c1, c2
        FROM (SELECT STRING_TO_ARRAY('a b', ' ') AS a1,
                     STRING_TO_ARRAY('x y', ' ') AS a2) t,
             UNNEST(a1) AS u(c1), UNNEST(a2) AS v(c2)
        ORDER BY c1, c2""", """
        SELECT c1, c2
        FROM (SELECT unnest(string_split('a b', ' ')) AS c1) a
        CROSS JOIN (SELECT unnest(string_split('x y', ' ')) AS c2) b
        ORDER BY c1, c2"""),
    "sqlc_unnest_chained": ("""
        SELECT w, CAST(COUNT(*) AS BIGINT) AS n
        FROM region,
             UNNEST(STRING_TO_ARRAY(r_name, '_')) AS s(part),
             UNNEST(STRING_TO_ARRAY(part, 'G')) AS t(w)
        GROUP BY w ORDER BY n DESC, w LIMIT 5""", """
        SELECT w, CAST(COUNT(*) AS BIGINT) AS n
        FROM (SELECT unnest(string_split(part, 'G')) AS w
              FROM (SELECT unnest(string_split(r_name, '_')) AS part
                    FROM region) p) q
        GROUP BY w ORDER BY n DESC, w LIMIT 5"""),
    "sqlc_unnest_join_values": ("""
        SELECT n_name, n_regionkey
        FROM UNNEST(ARRAY['NATION_1', 'NATION_3', 'NATION_7']) AS u(nm)
        JOIN nation ON n_name = nm
        ORDER BY n_name""", """
        SELECT n_name, n_regionkey
        FROM (SELECT unnest(['NATION_1', 'NATION_3', 'NATION_7']) AS nm) u
        JOIN nation ON n_name = nm
        ORDER BY n_name"""),
    "sqlc_unnest_numeric_aggs": ("""
        SELECT CAST(ROUND(SUM(x), 2) AS DOUBLE) AS s,
               CAST(ROUND(MIN(x), 2) AS DOUBLE) AS mn,
               CAST(ROUND(MAX(x), 2) AS DOUBLE) AS mx,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM (SELECT ARRAY[value, value * 2] AS a FROM events) e,
             UNNEST(a) AS u(x)""", """
        SELECT CAST(ROUND(SUM(x), 2) AS DOUBLE) AS s,
               CAST(ROUND(MIN(x), 2) AS DOUBLE) AS mn,
               CAST(ROUND(MAX(x), 2) AS DOUBLE) AS mx,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM (SELECT unnest([value, value * 2]) AS x FROM events) t"""),
    "sqlc_unnest_distinct_vs_total": ("""
        SELECT CAST(COUNT(*) AS BIGINT) AS total,
               CAST(COUNT(DISTINCT c) AS BIGINT) AS uniq
        FROM (SELECT STRING_TO_ARRAY(text, ' ') AS toks
              FROM documents WHERE source = 'web') d,
             UNNEST(toks) AS u(c)""", """
        SELECT CAST(COUNT(*) AS BIGINT) AS total,
               CAST(COUNT(DISTINCT c) AS BIGINT) AS uniq
        FROM (SELECT unnest(string_split(text, ' ')) AS c
              FROM documents WHERE source = 'web') t"""),
    "sqlc_unnest_window_rownum": ("""
        SELECT c, CAST(ROW_NUMBER() OVER (ORDER BY c) AS BIGINT) AS rn
        FROM region, UNNEST(STRING_TO_ARRAY(r_name, '_')) AS u(c)
        ORDER BY rn LIMIT 8""", """
        SELECT c, CAST(ROW_NUMBER() OVER (ORDER BY c) AS BIGINT) AS rn
        FROM (SELECT unnest(string_split(r_name, '_')) AS c
              FROM region) t
        ORDER BY rn LIMIT 8"""),
    "sqlc_unnest_order_offset": ("""
        SELECT c FROM region,
             UNNEST(STRING_TO_ARRAY(r_name, '_')) AS u(c)
        ORDER BY c
        OFFSET 2 ROWS FETCH NEXT 4 ROWS ONLY""", """
        SELECT c FROM (SELECT unnest(string_split(r_name, '_')) AS c
                       FROM region) t
        ORDER BY c LIMIT 4 OFFSET 2"""),
    "sqlc_unnest_case_element": ("""
        SELECT CASE WHEN CHAR_LENGTH(c) > 6 THEN 'long' ELSE 'short' END
                 AS bucket,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM (SELECT STRING_TO_ARRAY(text, ' ') AS toks
              FROM documents WHERE lang = 'en') d,
             UNNEST(toks) AS u(c)
        GROUP BY 1 ORDER BY 1""", """
        SELECT CASE WHEN length(c) > 6 THEN 'long' ELSE 'short' END
                 AS bucket,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM (SELECT unnest(string_split(text, ' ')) AS c
              FROM documents WHERE lang = 'en') t
        GROUP BY 1 ORDER BY 1"""),
    "sqlc_unnest_union_all": ("""
        SELECT c FROM UNNEST(ARRAY['a', 'b']) AS u(c)
        UNION ALL
        SELECT c FROM UNNEST(ARRAY['b', 'c']) AS v(c)
        ORDER BY c""", """
        SELECT c FROM (
          SELECT unnest(['a', 'b']) AS c
          UNION ALL
          SELECT unnest(['b', 'c']) AS c) t
        ORDER BY c"""),
    "sqlc_unnest_in_filter_elem": ("""
        SELECT c, CAST(COUNT(*) AS BIGINT) AS n
        FROM (SELECT STRING_TO_ARRAY(text, ' ') AS toks
              FROM documents) d,
             UNNEST(toks) AS u(c)
        WHERE c IN ('data', 'model', 'learning')
        GROUP BY c ORDER BY c""", """
        SELECT c, CAST(COUNT(*) AS BIGINT) AS n
        FROM (SELECT unnest(string_split(text, ' ')) AS c
              FROM documents) t
        WHERE c IN ('data', 'model', 'learning')
        GROUP BY c ORDER BY c"""),
    # Drill/qaWin window frame edges
    "sqlc_window_rows_prec_prec": ("""
        SELECT n_nationkey,
               CAST(SUM(n_regionkey) OVER (ORDER BY n_nationkey
                 ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING) AS BIGINT)
                 AS s
        FROM nation ORDER BY n_nationkey""", None),
    "sqlc_window_rows_foll_foll": ("""
        SELECT n_nationkey,
               CAST(SUM(n_regionkey) OVER (ORDER BY n_nationkey
                 ROWS BETWEEN 1 FOLLOWING AND 3 FOLLOWING) AS BIGINT)
                 AS s
        FROM nation ORDER BY n_nationkey""", None),
    "sqlc_window_rows_unb_prec": ("""
        SELECT n_nationkey,
               CAST(SUM(n_regionkey) OVER (ORDER BY n_nationkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                 AS BIGINT) AS s
        FROM nation ORDER BY n_nationkey""", None),
    "sqlc_window_rows_curr_curr": ("""
        SELECT n_nationkey,
               CAST(SUM(n_regionkey) OVER (ORDER BY n_nationkey
                 ROWS BETWEEN CURRENT ROW AND CURRENT ROW) AS BIGINT)
                 AS s
        FROM nation ORDER BY n_nationkey""", None),
    "sqlc_window_last_default_vs_full": ("""
        SELECT n_nationkey,
               LAST_VALUE(n_name) OVER (PARTITION BY n_regionkey
                 ORDER BY n_nationkey) AS last_so_far,
               LAST_VALUE(n_name) OVER (PARTITION BY n_regionkey
                 ORDER BY n_nationkey
                 ROWS BETWEEN UNBOUNDED PRECEDING
                          AND UNBOUNDED FOLLOWING) AS last_all
        FROM nation ORDER BY n_nationkey""", None),
    "sqlc_window_ntile": ("""
        SELECT tile, CAST(COUNT(*) AS BIGINT) AS n
        FROM (SELECT NTILE(4) OVER (ORDER BY n_nationkey) AS tile
              FROM nation) t
        GROUP BY tile ORDER BY tile""", None),
    "sqlc_window_pct_rank_ties": ("""
        SELECT n_regionkey,
               CAST(ROUND(PERCENT_RANK() OVER
                 (ORDER BY n_regionkey), 4) AS DOUBLE) AS pr,
               CAST(ROUND(CUME_DIST() OVER
                 (ORDER BY n_regionkey), 4) AS DOUBLE) AS cd
        FROM nation ORDER BY n_regionkey, pr""", None),
    "sqlc_window_lag_lead_default": ("""
        SELECT n_nationkey,
               CAST(LAG(n_nationkey, 3, -1) OVER (ORDER BY n_nationkey)
                 AS BIGINT) AS lag3,
               CAST(LEAD(n_nationkey, 3, -1) OVER (ORDER BY n_nationkey)
                 AS BIGINT) AS lead3
        FROM nation ORDER BY n_nationkey""", None),
    "sqlc_window_desc_frame_sum": ("""
        SELECT n_nationkey,
               CAST(SUM(n_regionkey) OVER (ORDER BY n_nationkey DESC
                 ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS BIGINT)
                 AS s
        FROM nation ORDER BY n_nationkey""", None),
    "sqlc_window_two_frames_one_select": ("""
        SELECT n_nationkey,
               CAST(SUM(n_regionkey) OVER (ORDER BY n_nationkey
                 ROWS BETWEEN 1 PRECEDING AND CURRENT ROW) AS BIGINT)
                 AS s2,
               CAST(SUM(n_regionkey) OVER (ORDER BY n_nationkey
                 ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING) AS BIGINT)
                 AS s5
        FROM nation ORDER BY n_nationkey""", None),
    "sqlc_window_nth_value": ("""
        SELECT n_nationkey,
               NTH_VALUE(n_name, 3) OVER (PARTITION BY n_regionkey
                 ORDER BY n_nationkey
                 ROWS BETWEEN UNBOUNDED PRECEDING
                          AND UNBOUNDED FOLLOWING) AS third
        FROM nation ORDER BY n_nationkey""", None),
    "sqlc_window_over_empty_total": ("""
        SELECT n_nationkey,
               CAST(SUM(n_regionkey) OVER () AS BIGINT) AS total,
               CAST(COUNT(*) OVER () AS BIGINT) AS n_rows
        FROM nation ORDER BY n_nationkey LIMIT 5""", None),
    # qaJsonCols long-tail
    "sqlc_json_value_two_paths_where": ("""
        SELECT count(*) AS n FROM events
        WHERE CAST(JSON_VALUE(props, '$.k') AS BIGINT) > 20
          AND CAST(JSON_VALUE(props, '$.k') AS BIGINT) < 60""", """
        SELECT count(*) AS n FROM events
        WHERE CAST(props->>'k' AS BIGINT) > 20
          AND CAST(props->>'k' AS BIGINT) < 60"""),
    "sqlc_json_object_roundtrip_value": ("""
        SELECT n_nationkey,
               CAST(JSON_VALUE(TO_JSON_STRING(
                 JSON_OBJECT(KEY 'a' VALUE n_nationkey)), '$.a')
                 AS BIGINT) AS a
        FROM nation WHERE n_nationkey < 4 ORDER BY n_nationkey""", """
        SELECT n_nationkey, n_nationkey AS a
        FROM nation WHERE n_nationkey < 4 ORDER BY n_nationkey"""),
    "sqlc_json_query_missing_null": ("""
        SELECT count(*) AS n FROM events
        WHERE JSON_QUERY(props, '$.nope') IS NULL""", """
        SELECT count(*) AS n FROM events"""),
    "sqlc_json_value_having_group": ("""
        SELECT MOD(CAST(JSON_VALUE(props, '$.k') AS BIGINT), 5) AS kb,
               count(*) AS n
        FROM events
        GROUP BY 1 HAVING count(*) > 100
        ORDER BY 1""", """
        SELECT MOD(CAST(props->>'k' AS BIGINT), 5) AS kb, count(*) AS n
        FROM events
        GROUP BY 1 HAVING count(*) > 100
        ORDER BY 1"""),
    "sqlc_json_four_levels": ("""
        SELECT JSON_VALUE('{"a":{"b":{"c":{"d":"deep"}}}}',
                          '$.a.b.c.d') AS v,
               JSON_VALUE('{"a":{"b":{"c":{"d":"deep"}}}}',
                          '$.a.b.x.d') AS missing""", """
        SELECT 'deep' AS v, NULL AS missing"""),
    # qaArray boundary semantics
    "sqlc_array_contains_subset": ("""
        SELECT ARRAY_CONTAINS(ARRAY['a','b','c'], ARRAY['a','c'])
                 AS subset_yes,
               ARRAY_CONTAINS(ARRAY['a','b','c'], ARRAY['a','z'])
                 AS subset_no""", """
        SELECT true AS subset_yes, false AS subset_no"""),
    "sqlc_array_overlap_empty_lit": ("""
        SELECT ARRAY_OVERLAP(ARRAY['a','b'], ARRAY['b','z']) AS o_yes,
               ARRAY_OVERLAP(ARRAY['a','b'], ARRAY['x','z']) AS o_no""",
        """
        SELECT true AS o_yes, false AS o_no"""),
    "sqlc_array_slice_oob": ("""
        SELECT ARRAY_TO_STRING(
                 ARRAY_SLICE(ARRAY['a','b','c'], 1, 2), ',') AS mid,
               ARRAY_TO_STRING(
                 ARRAY_SLICE(ARRAY['a','b','c'], 0, 3), ',') AS full_arr
        """, """
        SELECT 'b' AS mid, 'a,b,c' AS full_arr"""),
    "sqlc_array_offset_ordinal_oob": ("""
        SELECT ARRAY_OFFSET(ARRAY['a','b'], 5) AS off_oob,
               ARRAY_ORDINAL(ARRAY['a','b'], 2) AS ord2,
               ARRAY_OFFSET(ARRAY['a','b'], 0) AS off0""", """
        SELECT NULL AS off_oob, 'b' AS ord2, 'a' AS off0"""),
    "sqlc_array_to_string_delims": ("""
        SELECT ARRAY_TO_STRING(STRING_TO_ARRAY('a|b|c', '\|'), '-')
                 AS dashy,
               ARRAY_LENGTH(STRING_TO_ARRAY('a,b,,c', ',')) AS with_empty
        """, """
        SELECT 'a-b-c' AS dashy, 4 AS with_empty"""),
    "sqlc_array_group_key_join": ("""
        SELECT a.ln, CAST(COUNT(*) AS BIGINT) AS n
        FROM (SELECT ARRAY_LENGTH(STRING_TO_ARRAY(text, ' ')) AS ln
              FROM documents) a
        JOIN (SELECT DISTINCT
                ARRAY_LENGTH(STRING_TO_ARRAY(text, ' ')) AS ln
              FROM documents WHERE n_chars > 500) b
          ON a.ln = b.ln
        GROUP BY a.ln ORDER BY n DESC, a.ln LIMIT 5""", """
        SELECT a.ln, CAST(COUNT(*) AS BIGINT) AS n
        FROM (SELECT len(string_split(text, ' ')) AS ln
              FROM documents) a
        JOIN (SELECT DISTINCT len(string_split(text, ' ')) AS ln
              FROM documents WHERE n_chars > 500) b
          ON a.ln = b.ln
        GROUP BY a.ln ORDER BY n DESC, a.ln LIMIT 5"""),
    # --- batch 14 (round 5): qaWin orderby_range RANGE-frame matrix,
    # qaSql scalar datetime/numeric/string edges, Decoupled join
    # long-tail (USING, self-join chains, expression keys), correlated
    # subqueries (CalciteCorrelatedQueryTest shapes)
    "sqlc_win_range_zero_prec": ("""
        SELECT n_regionkey,
               CAST(SUM(n_nationkey) OVER (ORDER BY n_regionkey
                 RANGE BETWEEN 0 PRECEDING AND CURRENT ROW) AS BIGINT)
                 AS s,
               CAST(COUNT(*) OVER (ORDER BY n_regionkey
                 RANGE BETWEEN 0 PRECEDING AND CURRENT ROW) AS BIGINT)
                 AS c
        FROM nation ORDER BY n_regionkey, s""", None),
    "sqlc_win_range_zero_foll": ("""
        SELECT n_regionkey,
               CAST(SUM(n_nationkey) OVER (ORDER BY n_regionkey
                 RANGE BETWEEN CURRENT ROW AND 0 FOLLOWING) AS BIGINT)
                 AS s
        FROM nation ORDER BY n_regionkey, s""", None),
    "sqlc_win_range_first_last_ub": ("""
        SELECT n_nationkey,
               FIRST_VALUE(n_name) OVER (ORDER BY n_regionkey
                 RANGE BETWEEN UNBOUNDED PRECEDING AND 0 FOLLOWING)
                 AS fv,
               LAST_VALUE(n_name) OVER (ORDER BY n_regionkey
                 RANGE BETWEEN UNBOUNDED PRECEDING AND 0 FOLLOWING)
                 AS lv_peers
        FROM nation ORDER BY n_nationkey""", None),
    "sqlc_win_range_one_prec_first_last": ("""
        SELECT n_nationkey,
               FIRST_VALUE(n_nationkey) OVER (ORDER BY n_regionkey
                 RANGE BETWEEN 1 PRECEDING AND CURRENT ROW) AS fv,
               LAST_VALUE(n_nationkey) OVER (ORDER BY n_regionkey
                 RANGE BETWEEN 1 PRECEDING AND CURRENT ROW) AS lv
        FROM nation ORDER BY n_nationkey""", None),
    "sqlc_win_range_desc_order": ("""
        SELECT n_regionkey,
               CAST(COUNT(*) OVER (ORDER BY n_regionkey DESC
                 RANGE BETWEEN 1 PRECEDING AND 1 FOLLOWING) AS BIGINT)
                 AS c
        FROM nation ORDER BY n_regionkey, c""", None),
    "sqlc_win_array_agg_frame": ("""
        SELECT n_nationkey,
               ARRAY_TO_STRING(ARRAY_AGG(n_nationkey) OVER (
                 ORDER BY n_nationkey
                 ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING), ',') AS w
        FROM nation WHERE n_nationkey < 5 ORDER BY n_nationkey""", """
        SELECT n_nationkey,
               array_to_string(list(n_nationkey) OVER (
                 ORDER BY n_nationkey
                 ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING), ',') AS w
        FROM nation WHERE n_nationkey < 5 ORDER BY n_nationkey"""),
    "sqlc_scalar_extract_matrix": ("""
        SELECT EXTRACT(DOW FROM TIMESTAMP '2024-01-15 10:30:00') AS dow,
               EXTRACT(DOY FROM TIMESTAMP '2024-02-01 00:00:00') AS doy,
               EXTRACT(WEEK FROM TIMESTAMP '2024-01-15 00:00:00') AS wk,
               EXTRACT(QUARTER FROM TIMESTAMP '2024-08-15 00:00:00')
                 AS qtr""", """
        -- Druid EXTRACT(DOW) is ISO Monday=1 (TimestampExtractExprMacro),
        -- unlike Calcite's Sunday=1; 2024-01-15 is a Monday
        SELECT 1 AS dow, 32 AS doy, 3 AS wk, 3 AS qtr"""),
    "sqlc_scalar_timestampdiff_units": ("""
        SELECT TIMESTAMPDIFF(DAY, TIMESTAMP '2024-01-01 00:00:00',
                             TIMESTAMP '2024-03-01 12:00:00') AS days,
               TIMESTAMPDIFF(MONTH, TIMESTAMP '2023-11-15 00:00:00',
                             TIMESTAMP '2024-02-15 00:00:00') AS months,
               TIMESTAMPDIFF(HOUR, TIMESTAMP '2024-01-01 00:00:00',
                             TIMESTAMP '2024-01-02 06:00:00') AS hours
        """, """
        SELECT 60 AS days, 3 AS months, 30 AS hours"""),
    "sqlc_scalar_timestampadd_units": ("""
        SELECT CAST(TIMESTAMPADD(MONTH, 2,
                 TIMESTAMP '2024-01-31 00:00:00') AS VARCHAR) AS m2,
               CAST(TIMESTAMPADD(WEEK, 1,
                 TIMESTAMP '2024-01-01 00:00:00') AS VARCHAR) AS w1""",
        """
        SELECT '2024-03-31 00:00:00' AS m2,
               '2024-01-08 00:00:00' AS w1"""),
    "sqlc_scalar_quarter_trunc": ("""
        SELECT CAST(DATE_TRUNC('quarter',
                 TIMESTAMP '2024-08-15 13:00:00') AS VARCHAR) AS q,
               CAST(CEIL(TIMESTAMP '2024-08-15 13:00:00' TO QUARTER)
                 AS VARCHAR) AS qc""", """
        SELECT '2024-07-01 00:00:00' AS q,
               '2024-10-01 00:00:00' AS qc"""),
    "sqlc_scalar_numeric_edges": ("""
        SELECT MOD(-7, 3) AS m1, MOD(7, -3) AS m2,
               CAST(TRUNCATE(1234.567, -2) AS DOUBLE) AS tneg,
               CAST(ROUND(2.5) AS BIGINT) AS rhalf,
               SAFE_DIVIDE(10.0, 0.0) AS sdiv""", """
        SELECT -1 AS m1, 1 AS m2, CAST(1200.0 AS DOUBLE) AS tneg,
               CAST(3 AS BIGINT) AS rhalf,
               CAST(NULL AS DOUBLE) AS sdiv"""),
    "sqlc_scalar_log_family": ("""
        SELECT CAST(ROUND(EXP(1), 6) AS DOUBLE) AS e1,
               CAST(ROUND(LN(EXP(2)), 6) AS DOUBLE) AS ln2,
               CAST(ROUND(LOG10(1000), 6) AS DOUBLE) AS lg3,
               CAST(ROUND(POWER(2, 10), 1) AS DOUBLE) AS p10""", """
        SELECT CAST(2.718282 AS DOUBLE) AS e1, CAST(2.0 AS DOUBLE) AS ln2,
               CAST(3.0 AS DOUBLE) AS lg3, CAST(1024.0 AS DOUBLE) AS p10"""),
    "sqlc_scalar_string_pad_overlay": ("""
        SELECT LPAD('7', 3, '0') AS lp, RPAD('ab', 5, 'xy') AS rp,
               OVERLAY('hello' PLACING 'XX' FROM 2 FOR 3) AS ov,
               REPEAT('ab', 3) AS rep,
               POSITION('b' IN 'abcabc' FROM 3) AS pos2""", """
        SELECT '007' AS lp, 'abxyx' AS rp, 'hXXo' AS ov,
               'ababab' AS rep, 5 AS pos2"""),
    "sqlc_scalar_trim_variants": ("""
        SELECT TRIM(BOTH 'x' FROM 'xxhixx') AS tb,
               TRIM(LEADING 'x' FROM 'xxhixx') AS tl,
               TRIM(TRAILING 'x' FROM 'xxhixx') AS tt,
               BTRIM('  hi  ') AS bt""", """
        SELECT 'hi' AS tb, 'hixx' AS tl, 'xxhi' AS tt, 'hi' AS bt"""),
    "sqlc_join_using_form": ("""
        SELECT r_regionkey, CAST(COUNT(*) AS BIGINT) AS n
        FROM (SELECT n_regionkey AS r_regionkey, n_name FROM nation) n
        JOIN region USING (r_regionkey)
        GROUP BY r_regionkey ORDER BY r_regionkey""", None),
    "sqlc_join_self_chain": ("""
        SELECT a.n_nationkey,
               b.n_name AS next_name, c.n_name AS next2_name
        FROM nation a
        JOIN nation b ON b.n_nationkey = a.n_nationkey + 1
        JOIN nation c ON c.n_nationkey = b.n_nationkey + 1
        WHERE a.n_nationkey < 5
        ORDER BY a.n_nationkey""", None),
    "sqlc_join_coalesce_key": ("""
        SELECT CAST(COUNT(*) AS BIGINT) AS n
        FROM nation a
        JOIN region r
          ON COALESCE(a.n_regionkey, 0) = r.r_regionkey""", None),
    "sqlc_join_implicit_where": ("""
        SELECT r_name, CAST(COUNT(*) AS BIGINT) AS n
        FROM nation, region
        WHERE n_regionkey = r_regionkey
        GROUP BY r_name ORDER BY r_name""", None),
    "sqlc_join_left_isnull_extra": ("""
        SELECT CAST(COUNT(*) AS BIGINT) AS n
        FROM nation n
        LEFT JOIN supplier s
          ON s.s_nationkey = n.n_nationkey AND s.s_acctbal > 9000
        WHERE s.s_suppkey IS NULL""", None),
    "sqlc_corr_scalar_select": ("""
        SELECT r_name,
               (SELECT CAST(MAX(n_nationkey) AS BIGINT) FROM nation n
                WHERE n.n_regionkey = r.r_regionkey) AS max_nation
        FROM region r ORDER BY r_name""", None),
    "sqlc_corr_exists_extra_pred": ("""
        SELECT r_name FROM region r
        WHERE EXISTS (SELECT 1 FROM nation n
                      WHERE n.n_regionkey = r.r_regionkey
                        AND n.n_nationkey > 20)
        ORDER BY r_name""", None),
    "sqlc_corr_in_subquery_filtered": ("""
        SELECT CAST(COUNT(*) AS BIGINT) AS n
        FROM supplier
        WHERE s_nationkey IN
              (SELECT n_nationkey FROM nation WHERE n_regionkey IN (0, 2))
        """, None),
    "sqlc_corr_agg_compare": ("""
        SELECT n_name FROM nation n
        WHERE n.n_nationkey > (SELECT AVG(n_regionkey) * 4
                               FROM nation n2
                               WHERE n2.n_regionkey = n.n_regionkey)
        ORDER BY n_name LIMIT 5""", None),
    "sqlc_grouping_id_cube_having": ("""
        SELECT n_regionkey, MOD(n_nationkey, 2) AS odd,
               CAST(GROUPING(n_regionkey) AS BIGINT) AS g_r,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM nation
        GROUP BY CUBE (n_regionkey, MOD(n_nationkey, 2))
        HAVING GROUPING(n_regionkey) = 1
        ORDER BY odd, n""", """
        SELECT n_regionkey, odd, g_r, n FROM (
          SELECT n_regionkey, MOD(n_nationkey, 2) AS odd,
                 CAST(GROUPING(n_regionkey) AS BIGINT) AS g_r,
                 CAST(COUNT(*) AS BIGINT) AS n
          FROM nation
          GROUP BY CUBE (n_regionkey, MOD(n_nationkey, 2))) t
        WHERE g_r = 1 ORDER BY odd, n"""),
    "sqlc_string_agg_distinct": ("""
        SELECT n_regionkey,
               LISTAGG(DISTINCT CAST(MOD(n_nationkey, 2) AS VARCHAR),
                       ',') WITHIN GROUP (ORDER BY
                       CAST(MOD(n_nationkey, 2) AS VARCHAR)) AS kinds
        FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""", """
        SELECT n_regionkey,
               string_agg(DISTINCT CAST(MOD(n_nationkey, 2) AS VARCHAR),
                          ',' ORDER BY
                          CAST(MOD(n_nationkey, 2) AS VARCHAR)) AS kinds
        FROM nation GROUP BY n_regionkey ORDER BY n_regionkey"""),
    "sqlc_nullif_coalesce_chain": ("""
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(COALESCE(NULLIF(n_regionkey, 0), 100))
                 AS BIGINT) AS s
        FROM nation""", None),
    # --- batch 15 (round 5): DecoupledPlanningCalciteJoinQueryTest
    # shapes (the 290-file join quidem family) ported to the driver's
    # tables: expression/cast join keys, inline-datasource joins,
    # nested groupBys over joins, simultaneous semi+anti, union-of-join
    # arms, subquery-filter compositions
    "sqlc_join_cast_left_key": ("""
        SELECT CAST(COUNT(*) AS BIGINT) AS n
        FROM nation a
        JOIN (SELECT CAST(r_regionkey AS VARCHAR) AS rk FROM region) r
          ON CAST(a.n_regionkey AS VARCHAR) = r.rk""", None),
    "sqlc_join_left_function_key": ("""
        SELECT r_name, CAST(COUNT(*) AS BIGINT) AS n
        FROM nation a
        JOIN region r
          ON CHAR_LENGTH(a.n_name) = CHAR_LENGTH(r.r_name) + 1
        GROUP BY r_name ORDER BY r_name""", """
        SELECT r_name, CAST(COUNT(*) AS BIGINT) AS n
        FROM nation a
        JOIN region r ON length(a.n_name) = length(r.r_name) + 1
        GROUP BY r_name ORDER BY r_name"""),
    "sqlc_join_isnull_filter": ("""
        SELECT CAST(COUNT(*) AS BIGINT) AS n
        FROM nation a
        JOIN region r ON a.n_regionkey = r.r_regionkey
        WHERE NULLIF(a.n_nationkey, 7) IS NULL""", None),
    "sqlc_join_topn_metric_limit": ("""
        SELECT n_name, CAST(SUM(s_acctbal) AS DOUBLE) AS bal
        FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
        GROUP BY n_name ORDER BY bal DESC LIMIT 3""", """
        SELECT n_name, CAST(SUM(s_acctbal) AS DOUBLE) AS bal
        FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
        GROUP BY n_name ORDER BY bal DESC LIMIT 3"""),
    "sqlc_join_inline_sources": ("""
        SELECT a.k, b.v, CAST(COUNT(*) AS BIGINT) AS n
        FROM (SELECT * FROM (VALUES (1, 'x'), (2, 'y')) AS t(k, dim)) a
        JOIN (SELECT * FROM (VALUES (1, 10), (2, 20), (2, 21))
              AS u(k, v)) b
          ON a.k = b.k
        GROUP BY a.k, b.v ORDER BY a.k, b.v""", None),
    "sqlc_join_groupby_over_groupby": ("""
        SELECT cnt, CAST(COUNT(*) AS BIGINT) AS freq
        FROM (SELECT n.n_regionkey, CAST(COUNT(*) AS BIGINT) AS cnt
              FROM nation n JOIN region r
                ON n.n_regionkey = r.r_regionkey
              GROUP BY n.n_regionkey) t
        GROUP BY cnt ORDER BY cnt""", None),
    "sqlc_join_floor_time_keys": ("""
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(a.clicks * b.buys) AS BIGINT) AS cross_sum
        FROM (SELECT FLOOR(ts TO DAY) AS d,
                     COUNT(*) AS clicks FROM events
              WHERE event_type = 'click' GROUP BY 1) a
        JOIN (SELECT FLOOR(ts TO DAY) AS d,
                     COUNT(*) AS buys FROM events
              WHERE event_type = 'purchase' GROUP BY 1) b
          ON a.d = b.d""", """
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(a.clicks * b.buys) AS BIGINT) AS cross_sum
        FROM (SELECT date_trunc('day', ts) AS d,
                     COUNT(*) AS clicks FROM events
              WHERE event_type = 'click' GROUP BY 1) a
        JOIN (SELECT date_trunc('day', ts) AS d,
                     COUNT(*) AS buys FROM events
              WHERE event_type = 'purchase' GROUP BY 1) b
          ON a.d = b.d"""),
    "sqlc_join_subquery_limit_outer_group": ("""
        SELECT n_regionkey, CAST(COUNT(*) AS BIGINT) AS n
        FROM (SELECT n_nationkey, n_regionkey FROM nation
              ORDER BY n_nationkey LIMIT 10) nn
        JOIN region r ON nn.n_regionkey = r.r_regionkey
        GROUP BY n_regionkey ORDER BY n_regionkey""", None),
    "sqlc_join_semi_anti_together": ("""
        SELECT CAST(COUNT(*) AS BIGINT) AS n
        FROM supplier
        WHERE s_nationkey IN (SELECT n_nationkey FROM nation
                              WHERE n_regionkey = 1)
          AND s_suppkey NOT IN (SELECT s_suppkey FROM supplier
                                WHERE s_acctbal < 0)""", None),
    "sqlc_join_two_semi": ("""
        SELECT CAST(COUNT(*) AS BIGINT) AS n
        FROM orders
        WHERE o_custkey IN (SELECT c_custkey FROM customer
                            WHERE c_mktsegment = 'BUILDING')
          AND o_orderkey IN (SELECT l_orderkey FROM lineitem
                             WHERE l_quantity > 45)""", None),
    "sqlc_join_union_both_arms": ("""
        SELECT src, CAST(COUNT(*) AS BIGINT) AS n FROM (
          SELECT 'a' AS src FROM nation n
          JOIN region r ON n.n_regionkey = r.r_regionkey
          UNION ALL
          SELECT 'b' AS src FROM supplier s
          JOIN nation n2 ON s.s_nationkey = n2.n_nationkey) t
        GROUP BY src ORDER BY src""", None),
    "sqlc_join_subquery_and_filter": ("""
        SELECT CAST(COUNT(*) AS BIGINT) AS n
        FROM customer
        WHERE c_mktsegment = 'MACHINERY'
          AND c_nationkey IN (SELECT n_nationkey FROM nation
                              WHERE n_regionkey IN (0, 1))""", None),
    "sqlc_join_subquery_extraction_key": ("""
        SELECT CAST(COUNT(*) AS BIGINT) AS n
        FROM nation
        WHERE SUBSTRING(n_name, 8) IN
              (SELECT CAST(r_regionkey AS VARCHAR) FROM region)""", """
        SELECT CAST(COUNT(*) AS BIGINT) AS n
        FROM nation
        WHERE SUBSTRING(n_name, 8) IN
              (SELECT CAST(r_regionkey AS VARCHAR) FROM region)"""),
    "sqlc_join_semi_time_extract_group": ("""
        SELECT EXTRACT(DAY FROM ts) AS dom,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM events
        WHERE user_id IN (SELECT user_id FROM events
                          WHERE event_type = 'purchase')
          AND ts < TIMESTAMP '2024-01-08 00:00:00'
        GROUP BY 1 ORDER BY 1""", None),
    "sqlc_join_mv_filter_expression_key": ("""
        SELECT r.r_name, CAST(COUNT(*) AS BIGINT) AS n
        FROM (SELECT ARRAY_OFFSET(STRING_TO_ARRAY(n_name, '_'), 0)
                       AS prefix,
                     n_regionkey
              FROM nation) a
        JOIN (SELECT r_regionkey, r_name FROM region) r
          ON a.n_regionkey = r.r_regionkey
        WHERE a.prefix = 'NATION'
        GROUP BY r.r_name ORDER BY r.r_name""", """
        SELECT r.r_name, CAST(COUNT(*) AS BIGINT) AS n
        FROM (SELECT string_split(n_name, '_')[1] AS prefix,
                     n_regionkey
              FROM nation) a
        JOIN (SELECT r_regionkey, r_name FROM region) r
          ON a.n_regionkey = r.r_regionkey
        WHERE a.prefix = 'NATION'
        GROUP BY r.r_name ORDER BY r.r_name"""),
    "sqlc_join_computed_ref_condition": ("""
        SELECT CAST(COUNT(*) AS BIGINT) AS n
        FROM (SELECT n_nationkey + 1 AS nk1 FROM nation) a
        JOIN nation b ON a.nk1 = b.n_nationkey""", None),
    "sqlc_join_nested_groupby_inline_filter": ("""
        SELECT v, CAST(COUNT(*) AS BIGINT) AS n
        FROM (SELECT k, MAX(v) AS v
              FROM (VALUES (1, 'a'), (1, 'b'), (2, 'a'), (3, 'c'))
                   AS t(k, v)
              WHERE v <> 'c'
              GROUP BY k) x
        GROUP BY v ORDER BY v""", None),
    "sqlc_join_union_left_arm_join": ("""
        SELECT CAST(COUNT(*) AS BIGINT) AS n FROM (
          SELECT n.n_nationkey AS k FROM nation n
          JOIN region r ON n.n_regionkey = r.r_regionkey
          UNION ALL
          SELECT r_regionkey AS k FROM region) t""", None),
    "sqlc_join_right_operator_select": ("""
        SELECT r.r_name, n.n_name
        FROM (SELECT n_name, n_regionkey FROM nation
              WHERE n_nationkey < 3) n
        RIGHT JOIN region r ON n.n_regionkey = r.r_regionkey
        ORDER BY r.r_name, n.n_name""", None),
    "sqlc_join_string_dim_order_desc": ("""
        SELECT n_name, CAST(COUNT(*) AS BIGINT) AS n
        FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
        GROUP BY n_name ORDER BY n_name DESC LIMIT 5""", None),
    "sqlc_tuple_doubles_setops": ("""
        SELECT DS_TUPLE_DOUBLES_INTERSECT(
                 DS_TUPLE_DOUBLES(CASE WHEN l_returnflag = 'R'
                                       THEN l_orderkey END,
                                  CASE WHEN l_returnflag = 'R'
                                       THEN l_quantity END),
                 DS_TUPLE_DOUBLES(CASE WHEN l_returnflag = 'A'
                                       THEN l_orderkey END,
                                  CASE WHEN l_returnflag = 'A'
                                       THEN l_quantity END)) AS inter,
               DS_TUPLE_DOUBLES_UNION(
                 DS_TUPLE_DOUBLES(CASE WHEN l_returnflag = 'R'
                                       THEN l_orderkey END,
                                  CASE WHEN l_returnflag = 'R'
                                       THEN l_quantity END),
                 DS_TUPLE_DOUBLES(CASE WHEN l_returnflag = 'A'
                                       THEN l_orderkey END,
                                  CASE WHEN l_returnflag = 'A'
                                       THEN l_quantity END)) AS uni,
               DS_TUPLE_DOUBLES_NOT(
                 DS_TUPLE_DOUBLES(CASE WHEN l_returnflag = 'R'
                                       THEN l_orderkey END,
                                  CASE WHEN l_returnflag = 'R'
                                       THEN l_quantity END),
                 DS_TUPLE_DOUBLES(CASE WHEN l_returnflag = 'A'
                                       THEN l_orderkey END,
                                  CASE WHEN l_returnflag = 'A'
                                       THEN l_quantity END)) AS anotb
        FROM lineitem""", """
        WITH a AS (SELECT l_orderkey AS k FROM lineitem
                   WHERE l_returnflag = 'R' GROUP BY 1),
             b AS (SELECT l_orderkey AS k FROM lineitem
                   WHERE l_returnflag = 'A' GROUP BY 1)
        SELECT CAST((SELECT count(*) FROM a JOIN b USING (k)) AS DOUBLE)
                 AS inter,
               CAST((SELECT count(*) FROM
                     (SELECT k FROM a UNION SELECT k FROM b)) AS DOUBLE)
                 AS uni,
               CAST((SELECT count(*) FROM a
                     WHERE k NOT IN (SELECT k FROM b)) AS DOUBLE)
                 AS anotb"""),
    # --- batch 16 (round 5): PARSE_JSON/TRY_PARSE_JSON
    # (qaJsonCols funcs_and_sql_func_[try_]parse_json families)
    "sqlc_parse_json_fns": ("""
        SELECT JSON_VALUE(PARSE_JSON('{"a": {"b": 7}}'), '$.a.b') AS v,
               TRY_PARSE_JSON('not json at all') AS bad,
               TRY_PARSE_JSON('{"ok": true}') AS good,
               PARSE_JSON(CAST(NULL AS VARCHAR)) AS nul""", """
        SELECT '7' AS v, NULL AS bad, '{"ok":true}' AS good,
               NULL AS nul"""),
    "sqlc_try_parse_json_group": ("""
        SELECT COUNT(TRY_PARSE_JSON(props)) AS valid,
               COUNT(TRY_PARSE_JSON(CONCAT('x', props))) AS broken
        FROM events""", """
        SELECT COUNT(*) AS valid, 0 AS broken FROM events"""),
    "sqlc_session_timezone": ("""
        SET sqlTimeZone = 'America/Los_Angeles';
        SELECT CAST(TIME_FLOOR(ts, 'P1D') AS VARCHAR) AS d,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(MAX(EXTRACT(HOUR FROM ts)) AS BIGINT) AS max_hr
        FROM events WHERE ts < TIMESTAMP '2024-01-04'
        GROUP BY 1 ORDER BY 1""", """
        SELECT CAST(date_trunc('day', ts AT TIME ZONE 'UTC'
                 AT TIME ZONE 'America/Los_Angeles')
               AT TIME ZONE 'America/Los_Angeles'
               AT TIME ZONE 'UTC' AS VARCHAR) AS d,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(MAX(EXTRACT(HOUR FROM ts AT TIME ZONE 'UTC'
                 AT TIME ZONE 'America/Los_Angeles')) AS BIGINT)
                 AS max_hr
        FROM events WHERE ts < TIMESTAMP '2024-01-04'
        GROUP BY 1 ORDER BY 1"""),
    # --- batch 17 (round 5): qaUnnest null/empty-element semantics
    "sqlc_unnest_null_elements": ("""
        SELECT c FROM (SELECT ARRAY[1, NULL, 2] AS a) t,
             UNNEST(a) AS u(c)
        ORDER BY c NULLS FIRST""", """
        SELECT c FROM (SELECT unnest([1, NULL, 2]) AS c) t
        ORDER BY c NULLS FIRST"""),
    "sqlc_unnest_count_star_vs_col": ("""
        SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(COUNT(c) AS BIGINT) AS n_vals
        FROM (SELECT ARRAY[1, NULL, 2, NULL] AS a) t,
             UNNEST(a) AS u(c)""", """
        SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(COUNT(c) AS BIGINT) AS n_vals
        FROM (SELECT unnest([1, NULL, 2, NULL]) AS c) t"""),
    "sqlc_unnest_group_null_element": ("""
        SELECT c, CAST(COUNT(*) AS BIGINT) AS n
        FROM (SELECT ARRAY['x', NULL, 'x', NULL, NULL] AS a) t,
             UNNEST(a) AS u(c)
        GROUP BY c ORDER BY c NULLS FIRST""", """
        SELECT c, CAST(COUNT(*) AS BIGINT) AS n
        FROM (SELECT unnest(['x', NULL, 'x', NULL, NULL]) AS c) t
        GROUP BY c ORDER BY c NULLS FIRST"""),
    "sqlc_unnest_empty_and_null_arrays": ("""
        SELECT CAST(COUNT(*) AS BIGINT) AS n
        FROM (SELECT CASE WHEN n_nationkey < 0
                          THEN ARRAY['never'] END AS a
              FROM nation) t,
             UNNEST(a) AS u(c)""", """
        SELECT CAST(COUNT(*) AS BIGINT) AS n
        FROM (SELECT unnest(CASE WHEN n_nationkey < 0
                                 THEN ['never'] END) AS c
              FROM nation) t
        WHERE c IS NOT NULL"""),
    "sqlc_decode_base64_complex": ("""
        SELECT CAST(HLL_SKETCH_ESTIMATE(DECODE_BASE64_COMPLEX(
                 'HLLSketch',
                 (SELECT BASE64(DS_HLL(CAST(n_nationkey AS VARCHAR)))
                  FROM nation))) AS BIGINT) AS est,
               CAST(LENGTH(DECODE_BASE64_UTF8(BASE64('hello')))
                 AS BIGINT) AS roundtrip_len""", """
        SELECT CAST(25 AS BIGINT) AS est,
               CAST(5 AS BIGINT) AS roundtrip_len"""),
    # --- batch 18 (round 5): qaSql datatype comparison ops
    "sqlc_is_distinct_from_nullif": ("""
        SELECT CAST(COUNT(*) AS BIGINT) AS n_dist,
               CAST(SUM(CASE WHEN NULLIF(n_regionkey, 2)
                             IS NOT DISTINCT FROM NULL
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_null
        FROM nation
        WHERE NULLIF(n_regionkey, 2) IS DISTINCT FROM 1""", None),
    "sqlc_cross_type_eq_literals": ("""
        SELECT CAST(COUNT(*) AS BIGINT) AS n_str,
               CAST(SUM(CASE WHEN n_regionkey = 2.0 THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_dec
        FROM nation WHERE n_regionkey = '3'""", None),
    "sqlc_like_escape_clause": ("""
        SELECT CAST(COUNT(*) AS BIGINT) AS n
        FROM (SELECT CONCAT(n_name, '_X') AS s FROM nation) t
        WHERE s LIKE '%!_X' ESCAPE '!'""", None),
    "sqlc_in_mixed_numeric_types": ("""
        SELECT CAST(COUNT(*) AS BIGINT) AS n
        FROM nation WHERE n_regionkey IN (1, 3.0)""", None),
    "sqlc_null_compare_three_valued": ("""
        SELECT CAST(COUNT(*) AS BIGINT) AS total,
               CAST(SUM(CASE WHEN (NULLIF(n_regionkey, 0) > 1) IS NULL
                             THEN 1 ELSE 0 END) AS BIGINT) AS unknowns
        FROM nation""", None),
    # --- batch 19 (round 5): aggregate FILTER-clause and
    # HAVING/ORDER-BY long-tail
    "sqlc_filter_clause_distinct": ("""
        SELECT l_returnflag,
               CAST(COUNT(DISTINCT l_suppkey)
                 FILTER (WHERE l_quantity > 25) AS BIGINT) AS hi_supps
        FROM lineitem GROUP BY 1 ORDER BY 1""", None),
    "sqlc_filter_clause_multi_aggs": ("""
        SELECT o_orderstatus,
               CAST(ROUND(AVG(o_totalprice)
                 FILTER (WHERE o_orderpriority = '1-URGENT'), 2)
                 AS DOUBLE) AS avg_urgent,
               CAST(MIN(o_totalprice)
                 FILTER (WHERE o_orderpriority = '5-LOW') AS DOUBLE)
                 AS min_low,
               CAST(COUNT(*) FILTER (WHERE o_custkey IS NOT NULL)
                 AS BIGINT) AS n
        FROM orders GROUP BY 1 ORDER BY 1""", None),
    "sqlc_having_or_of_aggs": ("""
        SELECT l_suppkey, CAST(SUM(l_quantity) AS BIGINT) AS q,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM lineitem GROUP BY 1
        HAVING SUM(l_quantity) > 2000 OR COUNT(*) < 20
        ORDER BY l_suppkey LIMIT 10""", None),
    "sqlc_orderby_hidden_agg": ("""
        SELECT l_returnflag
        FROM lineitem GROUP BY 1
        ORDER BY SUM(l_extendedprice) DESC""", None),
    "sqlc_groupby_ordinal_mixed": ("""
        SELECT l_returnflag, l_linestatus,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM lineitem GROUP BY 1, l_linestatus
        ORDER BY 1, 2""", None),
    "sqlc_count_distinct_pair": ("""
        SELECT CAST(COUNT(DISTINCT l_returnflag, l_linestatus)
                 AS BIGINT) AS n_pairs
        FROM lineitem""", """
        SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs FROM
          (SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
           WHERE l_returnflag IS NOT NULL
             AND l_linestatus IS NOT NULL) t"""),
    "sqlc_sum_case_equals_filter": ("""
        SELECT CAST(SUM(CASE WHEN l_returnflag = 'R'
                             THEN l_quantity ELSE 0 END) AS BIGINT)
                 AS via_case,
               CAST(COALESCE(SUM(l_quantity)
                 FILTER (WHERE l_returnflag = 'R'), 0) AS BIGINT)
                 AS via_filter
        FROM lineitem""", None),
    # HLL_SKETCH_TO_STRING / DS_QUANTILE_SUMMARY debug summaries
    # (estimate exact at tiny cardinality; min/max have clean 2-dp
    # source values so double->string renders identically)
    "sqlc_sketch_summaries": ("""
        SELECT HLL_SKETCH_TO_STRING(DS_HLL(c_mktsegment)) AS hll_str,
               DS_QUANTILE_SUMMARY(
                 DS_QUANTILES_SKETCH(c_acctbal)) AS q_str
        FROM customer""", """
        SELECT '### HLL SKETCH SUMMARY: estimate: '
                 || CAST(COUNT(DISTINCT c_mktsegment) AS VARCHAR)
                 AS hll_str,
               '### Quantiles sketch summary: n: '
                 || CAST(COUNT(c_acctbal) AS VARCHAR)
                 || ', min: ' || CAST(MIN(c_acctbal) AS VARCHAR)
                 || ', max: ' || CAST(MAX(c_acctbal) AS VARCHAR)
                 AS q_str
        FROM customer"""),
    # --- batch 20 (round 5): web-console / kttm dashboard SQL
    # (quidem-ut kttm_*.iq — the console's generated style: quoted
    # identifiers, GROUP BY (), TIMESTAMP-literal ranges, JSON_VALUE
    # dims in filters, TIME_FLOOR with explicit NULL origin + tz)
    "sqlc_console_max_time": ("""
        SELECT MAX(CAST(t."ts" AS TIMESTAMP)) AS "max_ts"
        FROM "events" AS t GROUP BY ()""", None),
    "sqlc_console_count_range": ("""
        SELECT (COUNT(*)) AS "n"
        FROM "events" AS t
        WHERE (TIMESTAMP '2024-01-05 00:00:00'
                 <= CAST(t."ts" AS TIMESTAMP)
               AND CAST(t."ts" AS TIMESTAMP)
                 < TIMESTAMP '2024-01-07 00:00:00')
        GROUP BY ()""", None),
    "sqlc_console_overall": ("""
        SELECT COUNT(*) AS "Events",
               COUNT(DISTINCT t."user_id") AS "Users",
               CAST(ROUND(SUM(t."value"), 2) AS DOUBLE) AS "Total",
               MIN(CAST(t."ts" AS TIMESTAMP)) AS "From",
               MAX(CAST(t."ts" AS TIMESTAMP)) AS "To"
        FROM "events" AS t GROUP BY ()""", None),
    "sqlc_console_table": ("""
        SELECT CAST(t."event_type" AS VARCHAR) AS "event_type",
               COUNT(*) AS "Count",
               CAST(ROUND(SUM(t."value"), 2) AS DOUBLE) AS "Total"
        FROM "events" AS t
        WHERE CAST(JSON_VALUE("t"."props", '$.k') AS VARCHAR)
                IN ('1', '2', '3', '4', '5')
        GROUP BY 1
        ORDER BY "Count" DESC, "event_type" LIMIT 101""", """
        SELECT CAST(t.event_type AS VARCHAR) AS event_type,
               COUNT(*) AS "Count",
               CAST(ROUND(SUM(t."value"), 2) AS DOUBLE) AS "Total"
        FROM events AS t
        WHERE CAST(json_extract_string(t.props, '$.k') AS VARCHAR)
                IN ('1', '2', '3', '4', '5')
        GROUP BY 1
        ORDER BY "Count" DESC, event_type LIMIT 101"""),
    "sqlc_console_sparkline": ("""
        SELECT TIME_FLOOR(CAST(t."ts" AS TIMESTAMP), 'PT1H',
                          NULL, 'Etc/UTC') AS "__time",
               COUNT(*) AS "count"
        FROM "events" AS t
        WHERE (TIMESTAMP '2024-01-03 00:00:00'
                 <= CAST(t."ts" AS TIMESTAMP)
               AND CAST(t."ts" AS TIMESTAMP)
                 < TIMESTAMP '2024-01-04 00:00:00')
        GROUP BY 1 ORDER BY 1""", """
        SELECT date_trunc('hour', t.ts) AS "__time",
               COUNT(*) AS "count"
        FROM events AS t
        WHERE TIMESTAMP '2024-01-03 00:00:00' <= t.ts
          AND t.ts < TIMESTAMP '2024-01-04 00:00:00'
        GROUP BY 1 ORDER BY 1"""),
    "sqlc_console_heatmap": ("""
        SELECT TIME_FLOOR(CAST(t."ts" AS TIMESTAMP), 'PT6H',
                          NULL, 'Etc/UTC') AS "__time",
               CAST(t."event_type" AS VARCHAR) AS "event_type",
               COUNT(*) AS "count"
        FROM "events" AS t
        WHERE (TIMESTAMP '2024-01-10 00:00:00'
                 <= CAST(t."ts" AS TIMESTAMP)
               AND CAST(t."ts" AS TIMESTAMP)
                 < TIMESTAMP '2024-01-12 00:00:00')
          AND CAST(JSON_VALUE("t"."props", '$.k') AS VARCHAR)
                IS NOT NULL
        GROUP BY 1, 2 ORDER BY 1, 2""", """
        SELECT time_bucket(INTERVAL 6 HOUR, t.ts) AS "__time",
               CAST(t.event_type AS VARCHAR) AS event_type,
               COUNT(*) AS "count"
        FROM events AS t
        WHERE TIMESTAMP '2024-01-10 00:00:00' <= t.ts
          AND t.ts < TIMESTAMP '2024-01-12 00:00:00'
          AND json_extract_string(t.props, '$.k') IS NOT NULL
        GROUP BY 1, 2 ORDER BY 1, 2"""),
    "sqlc_console_stackarea": ("""
        SELECT TIME_FLOOR(CAST(t."ts" AS TIMESTAMP), 'P1D',
                          NULL, 'Etc/UTC') AS "__time",
               CAST(t."event_type" AS VARCHAR) AS "event_type",
               CAST(ROUND(SUM(t."value"), 2) AS DOUBLE) AS "Total"
        FROM "events" AS t
        WHERE CAST(t."event_type" AS VARCHAR)
                IN ('click', 'view', 'purchase')
        GROUP BY 1, 2 ORDER BY 1, 2 LIMIT 1000""", """
        SELECT date_trunc('day', t.ts) AS "__time",
               CAST(t.event_type AS VARCHAR) AS event_type,
               CAST(ROUND(SUM(t."value"), 2) AS DOUBLE) AS "Total"
        FROM events AS t
        WHERE CAST(t.event_type AS VARCHAR)
                IN ('click', 'view', 'purchase')
        GROUP BY 1, 2 ORDER BY 1, 2 LIMIT 1000"""),
    "sqlc_console_histogram": ("""
        SELECT CAST(FLOOR(CAST(t."value" AS DOUBLE) / 10) * 10
                    AS DOUBLE) AS "bucket",
               COUNT(*) AS "count"
        FROM "events" AS t
        WHERE (TIMESTAMP '2024-01-08 00:00:00'
                 <= CAST(t."ts" AS TIMESTAMP)
               AND CAST(t."ts" AS TIMESTAMP)
                 < TIMESTAMP '2024-01-15 00:00:00')
        GROUP BY 1 ORDER BY "bucket" ASC LIMIT 101""", None),
    "sqlc_console_sunburst": ("""
        SELECT CAST(t."event_type" AS VARCHAR) AS "d1",
               CAST(JSON_VALUE("t"."props", '$.k') AS BIGINT) % 4
                 AS "d2",
               CAST(ROUND(SUM(t."value"), 2) AS DOUBLE) AS "r"
        FROM "events" AS t
        GROUP BY 1, 2 ORDER BY "r" DESC, 1, 2 LIMIT 1000""", """
        SELECT CAST(t.event_type AS VARCHAR) AS d1,
               CAST(json_extract(t.props, '$.k') AS BIGINT) % 4 AS d2,
               CAST(ROUND(SUM(t."value"), 2) AS DOUBLE) AS r
        FROM events AS t
        GROUP BY 1, 2 ORDER BY r DESC, 1, 2 LIMIT 1000"""),
    # --- batch 21 (round 5): DrillWindowQueryTest long-tail
    # (sql/src/test/resources/drill/window/queries — frameclause/
    # multipl_wnwds, subQueries, bugs families)
    "sqlc_drill_four_named_windows": ("""
        SELECT o_orderkey,
               CAST(ROUND(AVG(o_totalprice) OVER W, 2) AS DOUBLE)
                 AS w_avg,
               CAST(ROUND(SUM(o_totalprice) OVER W2, 2) AS DOUBLE)
                 AS w2_run_sum,
               COUNT(*) OVER W3 AS w3_peers,
               CAST(MIN(o_totalprice) OVER W_DFLT_FRM AS DOUBLE)
                 AS wd_min
        FROM orders WHERE o_orderkey <= 2000
        WINDOW W AS (PARTITION BY o_orderstatus ORDER BY o_orderkey
                     RANGE BETWEEN UNBOUNDED PRECEDING
                       AND UNBOUNDED FOLLOWING),
               W2 AS (PARTITION BY o_orderstatus ORDER BY o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
               W3 AS (PARTITION BY o_orderstatus ORDER BY o_orderkey
                      RANGE BETWEEN CURRENT ROW AND CURRENT ROW),
               W_DFLT_FRM AS (PARTITION BY o_orderstatus
                              ORDER BY o_orderkey
                              RANGE BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW)
        ORDER BY o_orderkey LIMIT 50""", None),
    "sqlc_drill_star_plus_window": ("""
        SELECT t1.*,
               CAST(ROUND(SUM(o_totalprice) OVER w, 2) AS DOUBLE)
                 AS w_sum,
               COUNT(o_totalprice) OVER w AS w_cnt
        FROM (SELECT o_orderkey, o_orderstatus, o_totalprice
              FROM orders WHERE o_orderkey <= 300) t1
        WINDOW w AS (PARTITION BY o_orderstatus
                     ORDER BY o_orderkey DESC)
        ORDER BY o_orderkey""", None),
    "sqlc_drill_subq_filter_window_alias": ("""
        SELECT * FROM
          (SELECT o_orderkey,
                  COUNT(*) OVER (PARTITION BY o_orderstatus
                    ORDER BY o_orderkey
                    RANGE BETWEEN UNBOUNDED PRECEDING
                      AND UNBOUNDED FOLLOWING) AS w_count,
                  CAST(MAX(o_totalprice) OVER
                    (PARTITION BY o_orderstatus ORDER BY o_orderkey
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS DOUBLE) AS run_max
           FROM orders WHERE o_orderkey <= 1000) subqry
        WHERE subqry.w_count > 60
        ORDER BY o_orderkey LIMIT 40""", None),
    "sqlc_drill_desc_nulls_first_peers": ("""
        SELECT o_orderkey,
               COUNT(*) OVER (PARTITION BY o_orderstatus
                 ORDER BY NULLIF(o_orderpriority, '3-MEDIUM')
                   DESC NULLS FIRST
                 RANGE BETWEEN CURRENT ROW AND CURRENT ROW) AS peers
        FROM orders WHERE o_orderkey <= 500
        ORDER BY o_orderkey""", None),
    "sqlc_drill_count1_two_part_ts": ("""
        SELECT o_orderkey,
               COUNT(1) OVER (PARTITION BY o_orderstatus,
                                           o_orderpriority
                              ORDER BY o_orderdate) AS c
        FROM orders WHERE o_orderkey <= 400
        ORDER BY o_orderkey""", None),
    "sqlc_drill_last_value_running": ("""
        SELECT o_orderkey,
               CAST(LAST_VALUE(o_totalprice) OVER (
                 PARTITION BY o_orderstatus ORDER BY o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS DOUBLE) AS lv
        FROM orders WHERE o_orderkey <= 300
        ORDER BY o_orderkey""", None),
    # --- batch 22 (round 5): drill nestedAggs / statistical_aggregates
    # / lag-lead long-tail
    "sqlc_drill_nested_agg_running": ("""
        SELECT o_orderstatus,
               CAST(ROUND(AVG(SUM(o_totalprice)) OVER (
                 PARTITION BY o_orderstatus ORDER BY o_orderpriority),
                 2) AS DOUBLE) AS avg_of_sums
        FROM orders
        GROUP BY o_orderstatus, o_orderpriority
        ORDER BY o_orderstatus, avg_of_sums""", None),
    "sqlc_drill_var_single_row_null": ("""
        SELECT o_orderkey,
               CAST(VAR_SAMP(o_totalprice) OVER (
                 PARTITION BY o_orderkey) AS DOUBLE) AS vs,
               CAST(STDDEV_SAMP(o_totalprice) OVER (
                 PARTITION BY o_orderkey) AS DOUBLE) AS sd,
               CAST(ROUND(VAR_POP(o_totalprice) OVER (
                 PARTITION BY o_orderstatus), 2) AS DOUBLE) AS vp
        FROM orders WHERE o_orderkey <= 100
        ORDER BY o_orderkey""", None),
    "sqlc_drill_lag_offset_fetch_first": ("""
        SELECT o_orderkey,
               LAG(o_orderkey, 2) OVER (
                 PARTITION BY o_orderstatus ORDER BY o_orderkey)
                 AS lag2,
               LAG(o_orderkey, 1, -1) OVER (
                 PARTITION BY o_orderstatus ORDER BY o_orderkey)
                 AS lag_dflt
        FROM orders WHERE o_orderkey <= 200
        ORDER BY o_orderkey
        FETCH FIRST 25 ROWS ONLY""", None),
    "sqlc_drill_lead_distinct_nulls_last": ("""
        SELECT DISTINCT o_orderstatus,
               LEAD(o_orderstatus) OVER (
                 PARTITION BY o_orderpriority
                 ORDER BY o_orderstatus NULLS LAST, o_orderkey)
                 AS next_status
        FROM orders WHERE o_orderkey <= 150
        ORDER BY o_orderstatus, next_status""", None),
    "sqlc_drill_empty_over_mixed": ("""
        SELECT o_orderkey,
               CAST(ROUND(AVG(o_totalprice) OVER (), 2) AS DOUBLE)
                 AS overall_avg,
               COUNT(*) OVER () AS overall_n,
               CAST(ROUND(o_totalprice - AVG(o_totalprice) OVER (), 2)
                 AS DOUBLE) AS delta
        FROM orders WHERE o_orderkey <= 60
        ORDER BY o_orderkey""", None),
    # --- batch 23 (round 5): qaUnnest array_sql_join family — unnest
    # datasource joined ON a condition (correlated + outer forms) and
    # JSON_VALUE RETURNING <type> ARRAY
    "sqlc_unnest_join_on_literal": ("""
        SELECT t1.o_orderstatus, count(*) AS n
        FROM orders t1
        JOIN UNNEST(ARRAY['F', 'O']) AS u(c)
          ON t1.o_orderstatus = u.c
        GROUP BY 1 ORDER BY 1""", """
        SELECT t1.o_orderstatus, count(*) AS n
        FROM orders t1
        JOIN (SELECT UNNEST(['F', 'O']) AS c) u
          ON t1.o_orderstatus = u.c
        GROUP BY 1 ORDER BY 1"""),
    "sqlc_unnest_join_on_correlated": ("""
        SELECT t1.n_name, u.c
        FROM nation t1
        JOIN UNNEST(STRING_TO_ARRAY(t1.n_name, '_')) AS u(c)
          ON u.c <> 'NATION'
        WHERE t1.n_nationkey < 5 ORDER BY 1, 2""", """
        SELECT t1.n_name, u.c
        FROM nation t1, UNNEST(string_split(t1.n_name, '_')) AS u(c)
        WHERE u.c <> 'NATION' AND t1.n_nationkey < 5
        ORDER BY 1, 2"""),
    "sqlc_unnest_left_join_on": ("""
        SELECT t1.n_nationkey, u.c
        FROM nation t1
        LEFT JOIN UNNEST(ARRAY[1, 2]) AS u(c)
          ON u.c = t1.n_nationkey
        WHERE t1.n_nationkey < 4 ORDER BY 1, 2""", """
        SELECT t1.n_nationkey, u.c
        FROM nation t1
        LEFT JOIN (SELECT UNNEST([1, 2]) AS c) u
          ON u.c = t1.n_nationkey
        WHERE t1.n_nationkey < 4 ORDER BY 1, 2"""),
    "sqlc_unnest_json_returning_array": ("""
        SELECT t1.n_nationkey, u.c
        FROM nation t1
        JOIN UNNEST(JSON_VALUE('{"xs": [0, 1, 2]}', '$.xs'
                               RETURNING BIGINT ARRAY)) AS u(c)
          ON u.c = t1.n_nationkey
        ORDER BY 1""", """
        SELECT t1.n_nationkey, u.c
        FROM nation t1
        JOIN (SELECT UNNEST(CAST([0, 1, 2] AS BIGINT[])) AS c) u
          ON u.c = t1.n_nationkey
        ORDER BY 1"""),
    "sqlc_unnest_mv_join_dual_alias": ("""
        SELECT t1.n_nationkey, t2.c
        FROM nation t1
        JOIN UNNEST(MV_TO_ARRAY(
               STRING_TO_ARRAY(t1.n_name, '_'))) t2 AS u(c)
          ON t2.c = CAST(t1.n_nationkey AS VARCHAR)
        WHERE t1.n_nationkey < 12 ORDER BY 1""", """
        SELECT t1.n_nationkey, u.c
        FROM nation t1,
             UNNEST(string_split(t1.n_name, '_')) AS u(c)
        WHERE u.c = CAST(t1.n_nationkey AS VARCHAR)
          AND t1.n_nationkey < 12 ORDER BY 1"""),
    "sqlc_json_value_returning_double_array": ("""
        SELECT CAST(ROUND(SUM(c), 3) AS DOUBLE) AS s, COUNT(*) AS n
        FROM UNNEST(JSON_VALUE('{"v": [1.5, 2.25, -0.5]}', '$.v'
                               RETURNING DOUBLE ARRAY)) AS u(c)""", """
        SELECT CAST(ROUND(SUM(c), 3) AS DOUBLE) AS s, COUNT(*) AS n
        FROM (SELECT UNNEST([1.5, 2.25, -0.5]) AS c) u"""),
    # --- batch 24 (round 5): qaUnnest array_sql_group_by — CUBE/
    # ROLLUP/GROUPING SETS over an unnested element + base column
    "sqlc_unnest_rollup_grouping": ("""
        SELECT o_orderstatus, u.c, COUNT(*) AS n,
               GROUPING(o_orderstatus, u.c) AS g
        FROM orders,
             UNNEST(STRING_TO_ARRAY(o_orderpriority, '-')) AS u(c)
        WHERE o_orderkey <= 500
        GROUP BY ROLLUP(o_orderstatus, u.c)
        ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 4""", """
        SELECT o_orderstatus, u.c, COUNT(*) AS n,
               GROUPING(o_orderstatus, u.c) AS g
        FROM orders,
             UNNEST(string_split(o_orderpriority, '-')) AS u(c)
        WHERE o_orderkey <= 500
        GROUP BY ROLLUP(o_orderstatus, u.c)
        ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 4"""),
    "sqlc_unnest_cube_element": ("""
        SELECT u.c, l_linestatus, COUNT(*) AS n
        FROM lineitem,
             UNNEST(STRING_TO_ARRAY(l_returnflag, '|')) AS u(c)
        WHERE l_orderkey <= 300
        GROUP BY CUBE(u.c, l_linestatus)
        ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3""", """
        SELECT u.c, l_linestatus, COUNT(*) AS n
        FROM lineitem,
             UNNEST(string_split(l_returnflag, '|')) AS u(c)
        WHERE l_orderkey <= 300
        GROUP BY CUBE(u.c, l_linestatus)
        ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3"""),
    "sqlc_unnest_grouping_sets": ("""
        SELECT o_orderstatus, u.c, COUNT(*) AS n
        FROM orders,
             UNNEST(STRING_TO_ARRAY(o_orderpriority, '-')) AS u(c)
        WHERE o_orderkey <= 400
        GROUP BY GROUPING SETS ((o_orderstatus), (u.c), ())
        ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3""", """
        SELECT o_orderstatus, u.c, COUNT(*) AS n
        FROM orders,
             UNNEST(string_split(o_orderpriority, '-')) AS u(c)
        WHERE o_orderkey <= 400
        GROUP BY GROUPING SETS ((o_orderstatus), (u.c), ())
        ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3"""),
    # ---- batch 25 (round 6): STRING_AGG/LISTAGG, bitwise aggregates,
    # INTERSECT/EXCEPT ALL (multiset set ops — superset of the
    # reference's UNION-only surface, like the existing INTERSECT/
    # EXCEPT extension), ARRAY_CONCAT_AGG ----
    # ---- batch 26 (round 6): qaAggFuncs ARRAY_AGG matrix
    # (quidem-ut qaAggFuncs/array_agg_*_test*.iq shapes: agg into an
    # array, then array_contains/length/offset/ordinal/to_string over
    # the result; sorted for determinism — Druid's ARRAY_AGG is
    # order-unspecified like Spark's) ----
    "sqlc_array_agg_literal_contains": ("""
        SELECT COUNT(*) AS cnt FROM
          (SELECT ARRAY_AGG(111.1111111) AS col FROM lineitem
           WHERE l_orderkey <= 8)
        WHERE NOT ARRAY_CONTAINS(col, 99999) OR col IS NULL""", """
        SELECT COUNT(*) AS cnt FROM
          (SELECT list(111.1111111) AS col FROM lineitem
           WHERE l_orderkey <= 8)
        WHERE NOT list_contains(col, 99999) OR col IS NULL"""),
    "sqlc_array_agg_length": ("""
        SELECT l_linestatus,
               CAST(ARRAY_LENGTH(ARRAY_AGG(l_quantity)) AS BIGINT)
                 AS n
        FROM lineitem WHERE l_orderkey <= 32
        GROUP BY l_linestatus ORDER BY l_linestatus""", """
        SELECT l_linestatus, CAST(len(list(l_quantity)) AS BIGINT) AS n
        FROM lineitem WHERE l_orderkey <= 32
        GROUP BY l_linestatus ORDER BY l_linestatus"""),
    "sqlc_array_agg_offset_ordinal": ("""
        SELECT ARRAY_OFFSET(array_sort(ARRAY_AGG(DISTINCT
                 o_orderpriority)), 0) AS first_off,
               ARRAY_ORDINAL(array_sort(ARRAY_AGG(DISTINCT
                 o_orderpriority)), 2) AS second_ord
        FROM orders""", """
        SELECT list_sort(list(DISTINCT o_orderpriority))[1]
                 AS first_off,
               list_sort(list(DISTINCT o_orderpriority))[2]
                 AS second_ord
        FROM orders"""),
    "sqlc_array_agg_to_string": ("""
        SELECT o_orderstatus,
               ARRAY_TO_STRING(array_sort(ARRAY_AGG(DISTINCT
                 o_orderpriority)), '|') AS prios
        FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""", """
        SELECT o_orderstatus,
               array_to_string(list_sort(list(DISTINCT
                 o_orderpriority)), '|') AS prios
        FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus"""),
    "sqlc_array_agg_filtered_contains": ("""
        SELECT CASE WHEN ARRAY_CONTAINS(
                 ARRAY_AGG(l_returnflag, 1000000) FILTER
                   (WHERE l_quantity > 49), 'R')
               THEN 1 ELSE 0 END AS has_r,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM lineitem""", """
        SELECT CASE WHEN list_contains(
                 list(l_returnflag) FILTER (l_quantity > 49), 'R')
               THEN 1 ELSE 0 END AS has_r,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM lineitem"""),
    "sqlc_array_agg_concat_arrays": ("""
        SELECT array_sort(ARRAY_CONCAT(
                 ARRAY_AGG(DISTINCT l_linestatus)
                   FILTER (WHERE l_returnflag = 'R'),
                 ARRAY_AGG(DISTINCT l_linestatus)
                   FILTER (WHERE l_returnflag = 'N'))) AS both_status
        FROM lineitem""", """
        SELECT list_sort(list_concat(
                 list(DISTINCT l_linestatus)
                   FILTER (l_returnflag = 'R'),
                 list(DISTINCT l_linestatus)
                   FILTER (l_returnflag = 'N'))) AS both_status
        FROM lineitem"""),
    # RANGE `0 PRECEDING` end bound ≡ CURRENT ROW with peers (SQL
    # standard; Spark honors it, DuckDB does NOT — it excludes the
    # peer group, fuzz seeds 61326/61644). Oracle uses the
    # standard-equivalent CURRENT ROW spelling, pinning our semantics.
    "sqlc_window_range_zero_preceding": ("""
        SELECT c_custkey,
               CAST(MAX(c_custkey) OVER (
                 ORDER BY c_nationkey DESC
                 RANGE BETWEEN UNBOUNDED PRECEDING AND 0 PRECEDING)
                 AS BIGINT) AS w
        FROM customer ORDER BY c_custkey""", """
        SELECT c_custkey,
               CAST(MAX(c_custkey) OVER (
                 ORDER BY c_nationkey DESC
                 RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS BIGINT) AS w
        FROM customer ORDER BY c_custkey"""),
    # INFORMATION_SCHEMA long tail (InformationSchema.java SCHEMATA /
    # ROUTINES tables)
    "sqlc_info_schemata": ("""
        SELECT SCHEMA_NAME FROM INFORMATION_SCHEMA.SCHEMATA
        ORDER BY 1""", """
        SELECT * FROM (VALUES ('INFORMATION_SCHEMA'), ('druid'),
                              ('lookup'), ('sys')) AS t(SCHEMA_NAME)
        ORDER BY 1"""),
    "sqlc_info_routines": ("""
        SELECT ROUTINE_NAME, IS_AGGREGATOR
        FROM INFORMATION_SCHEMA.ROUTINES
        WHERE ROUTINE_NAME IN ('TIME_FLOOR', 'DS_HLL', 'STRING_AGG',
                               'SAFE_DIVIDE')
        ORDER BY 1""", """
        SELECT * FROM (VALUES ('DS_HLL', 'YES'), ('SAFE_DIVIDE', 'NO'),
                              ('STRING_AGG', 'YES'),
                              ('TIME_FLOOR', 'NO'))
          AS t(ROUTINE_NAME, IS_AGGREGATOR) ORDER BY 1"""),
    "sqlc_string_agg_ordered": ("""
        SELECT r.r_name,
               STRING_AGG(n.n_name, ',')
                 WITHIN GROUP (ORDER BY n.n_name) AS names
        FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
        GROUP BY r.r_name ORDER BY r.r_name""", """
        SELECT r.r_name,
               STRING_AGG(n.n_name, ',' ORDER BY n.n_name) AS names
        FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
        GROUP BY r.r_name ORDER BY r.r_name"""),
    "sqlc_string_agg_distinct": ("""
        SELECT o_orderstatus,
               STRING_AGG(DISTINCT o_orderpriority, '|')
                 WITHIN GROUP (ORDER BY o_orderpriority) AS prios
        FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""", """
        SELECT o_orderstatus,
               STRING_AGG(DISTINCT o_orderpriority, '|'
                          ORDER BY o_orderpriority) AS prios
        FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus"""),
    "sqlc_listagg_filtered": ("""
        SELECT l_linestatus,
               LISTAGG(l_returnflag, '')
                 WITHIN GROUP (ORDER BY l_returnflag)
                 FILTER (WHERE l_orderkey <= 8) AS flags,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus""", """
        SELECT l_linestatus,
               STRING_AGG(l_returnflag, '' ORDER BY l_returnflag)
                 FILTER (WHERE l_orderkey <= 8) AS flags,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus"""),
    "sqlc_bitwise_aggs": ("""
        SELECT o_orderstatus,
               CAST(BIT_AND(o_orderkey) AS BIGINT) AS ba,
               CAST(BIT_OR(o_orderkey)  AS BIGINT) AS bo,
               CAST(BIT_XOR(o_orderkey) AS BIGINT) AS bx
        FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""", """
        SELECT o_orderstatus,
               CAST(CASE WHEN COUNT(o_orderkey) > 0 THEN 0 END
                    AS BIGINT) AS ba,
               CAST(BIT_OR(o_orderkey)  AS BIGINT) AS bo,
               CAST(BIT_XOR(o_orderkey) AS BIGINT) AS bx
        FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus"""),
    "sqlc_bitwise_agg_filtered": ("""
        SELECT CAST(BIT_OR(l_linenumber)
                      FILTER (WHERE l_returnflag = 'R') AS BIGINT)
                 AS bo_r,
               CAST(BIT_XOR(l_linenumber)
                      FILTER (WHERE l_quantity > 25) AS BIGINT) AS bx_q
        FROM lineitem""", None),
    "sqlc_intersect_all": ("""
        SELECT l_returnflag FROM lineitem WHERE l_quantity > 25
        INTERSECT ALL
        SELECT l_returnflag FROM lineitem WHERE l_quantity < 26
        ORDER BY 1""", None),
    "sqlc_except_all": ("""
        SELECT o_orderpriority FROM orders WHERE o_totalprice > 100000
        EXCEPT ALL
        SELECT o_orderpriority FROM orders WHERE o_totalprice > 200000
        ORDER BY 1""", None),
    "sqlc_array_concat_agg": ("""
        SELECT o_orderstatus,
               array_sort(ARRAY_CONCAT_AGG(
                 STRING_TO_ARRAY(o_orderpriority, '-'))) AS parts
        FROM orders WHERE o_orderkey <= 64
        GROUP BY o_orderstatus ORDER BY o_orderstatus""", """
        SELECT o_orderstatus,
               list_sort(flatten(list(
                 string_split(o_orderpriority, '-')))) AS parts
        FROM orders WHERE o_orderkey <= 64
        GROUP BY o_orderstatus ORDER BY o_orderstatus"""),

    # ----------------------------------------------------------------
    # Conformance batch 59 (round 7): qaAggFuncs remainder — the
    # STRING_AGG/ARRAY_AGG golden matrix the bank hadn't covered
    # (quidem-ut/src/test/quidem/org.apache.druid.quidem.QTest/
    # qaAggFuncs/string_agg_*.iq, array_agg_*.iq). Two reference
    # semantics pinned here: TIMESTAMP args stringify/collect as epoch
    # MILLIS (the native layer's longs — string_agg_timestamp_test001
    # pins '1577840461000', not ISO), and the optional trailing
    # maxSizeBytes argument is accepted (and unbounded here).
    # ----------------------------------------------------------------
    # string_agg_timestamp_test001.01.all.iq A03 (agg of a TIMESTAMP
    # column; filter to one instant so every element is equal)
    "sqlc_stragg_ts_column_millis": ("""
        SELECT STRING_AGG(__time, '|') AS col,
               CHAR_LENGTH(STRING_AGG(__time, '|')) AS len
        FROM events WHERE __time = (SELECT MIN(__time) FROM events)""", """
        SELECT string_agg(CAST(epoch_ms(ts) AS VARCHAR), '|') AS col,
               length(string_agg(CAST(epoch_ms(ts) AS VARCHAR), '|'))
                 AS len
        FROM events WHERE ts = (SELECT MIN(ts) FROM events)"""),
    # string_agg_timestamp_test001.01.all.iq A01 (TIMESTAMP literal)
    "sqlc_stragg_ts_literal_millis": ("""
        SELECT STRING_AGG(TIMESTAMP '2024-01-05 00:00:00', '|') AS col
        FROM (SELECT 1 AS one)""", """
        SELECT '1704412800000' AS col"""),
    # string_agg_double_test001.01.all.iq (length-family finalizers
    # over a double agg — order-independent, the corpus's own trick)
    "sqlc_stragg_len_funcs": ("""
        SELECT CHAR_LENGTH(STRING_AGG(l_quantity, '|')) AS clen,
               CHARACTER_LENGTH(STRING_AGG(l_quantity, '|')) AS clen2,
               LENGTH(STRING_AGG(l_quantity, '|')) AS len,
               STRLEN(STRING_AGG(l_quantity, '|')) AS slen
        FROM lineitem WHERE l_orderkey <= 32""", """
        SELECT length(string_agg(CAST(l_quantity AS VARCHAR), '|'))
                 AS clen,
               length(string_agg(CAST(l_quantity AS VARCHAR), '|'))
                 AS clen2,
               length(string_agg(CAST(l_quantity AS VARCHAR), '|'))
                 AS len,
               CAST(length(string_agg(CAST(l_quantity AS VARCHAR), '|'))
                 AS INTEGER) AS slen
        FROM lineitem WHERE l_orderkey <= 32"""),
    # string_agg_double_test001.02.all.iq (lpad/rpad/repeat over the
    # agg, 2- and 3-arg pad forms; length-wrapped for order freedom)
    "sqlc_stragg_pad_repeat": ("""
        SELECT LENGTH(REPEAT(STRING_AGG(l_quantity, '|'), 2)) AS rep2,
               LENGTH(LPAD(STRING_AGG(l_quantity, '|'), 500, '3')) AS lp3,
               LENGTH(RPAD(STRING_AGG(l_quantity, '|'), 4, '3')) AS rp3,
               LENGTH(LPAD(STRING_AGG(l_quantity, '|'), 500)) AS lp2
        FROM lineitem WHERE l_orderkey <= 32""", """
        SELECT 2 * length(string_agg(CAST(l_quantity AS VARCHAR), '|'))
                 AS rep2,
               500 AS lp3, 4 AS rp3, 500 AS lp2
        FROM lineitem WHERE l_orderkey <= 32"""),
    # string_agg_double_test001.01.all.iq btrim arms (1- and 2-arg)
    "sqlc_stragg_btrim": ("""
        SELECT BTRIM(STRING_AGG(n_nationkey, '|')
                       WITHIN GROUP (ORDER BY n_nationkey), '0') AS t1,
               BTRIM(STRING_AGG(n_nationkey, '|')
                       WITHIN GROUP (ORDER BY n_nationkey)) AS t2
        FROM nation""", """
        SELECT trim(string_agg(CAST(n_nationkey AS VARCHAR), '|'
                               ORDER BY n_nationkey), '0') AS t1,
               trim(string_agg(CAST(n_nationkey AS VARCHAR), '|'
                               ORDER BY n_nationkey)) AS t2
        FROM nation"""),
    # string_agg_double_test003.01.all.iq (DISTINCT + the trailing
    # maxSizeBytes argument — accepted, cap unbounded here)
    "sqlc_stragg_distinct_maxbytes": ("""
        SELECT LENGTH(STRING_AGG(DISTINCT l_quantity, '|', 100000))
                 AS len
        FROM lineitem WHERE l_orderkey <= 32""", """
        SELECT length(string_agg(DISTINCT CAST(l_quantity AS VARCHAR),
                                 '|')) AS len
        FROM lineitem WHERE l_orderkey <= 32"""),
    # string_agg_double_test001.01.all.iq A05 (concat of two aggs with
    # different separators)
    "sqlc_stragg_concat_two": ("""
        SELECT CONCAT(STRING_AGG(r_name, ',')
                        WITHIN GROUP (ORDER BY r_name), '-',
                      STRING_AGG(r_name, '|')
                        WITHIN GROUP (ORDER BY r_name)) AS col
        FROM region""", """
        SELECT concat(string_agg(r_name, ',' ORDER BY r_name), '-',
                      string_agg(r_name, '|' ORDER BY r_name)) AS col
        FROM region"""),
    # array_agg_timestamp_test001.std.iq (ARRAY_AGG of a TIMESTAMP
    # collects epoch-millis longs)
    "sqlc_arrayagg_ts_millis": ("""
        SELECT ARRAY_AGG(__time) AS arr
        FROM events WHERE __time = (SELECT MIN(__time) FROM events)""", """
        SELECT list(epoch_ms(ts)) AS arr
        FROM events WHERE ts = (SELECT MIN(ts) FROM events)"""),
    # array_agg_misc + the ArraySqlAggregator maxSizeBytes overload
    "sqlc_arrayagg_maxbytes": ("""
        SELECT ARRAY_SORT(ARRAY_AGG(DISTINCT n_regionkey, 16384)) AS arr
        FROM nation""", """
        SELECT list_sort(list(DISTINCT n_regionkey)) AS arr
        FROM nation"""),

    # ----------------------------------------------------------------
    # Conformance batch 60 (round 7): window frame SHORTHANDS from the
    # qaWin orderby_{rows,range}_* matrix (frame_start without BETWEEN)
    # and the decoupled-planning golden files
    # (sql/src/test/quidem/org.apache.druid.sql.calcite.
    # DecoupledPlanningCalciteQueryTest/*.iq).
    # ----------------------------------------------------------------
    # orderby_rows_1_preceding_sum_count / rows_current / rows_ub:
    # ROWS <start> shorthand means BETWEEN <start> AND CURRENT ROW
    "sqlc_win_frame_shorthand_rows": ("""
        SELECT n_nationkey,
               CAST(SUM(n_regionkey) OVER (ORDER BY n_nationkey
                 ROWS 1 PRECEDING) AS BIGINT) AS s1,
               CAST(COUNT(*) OVER (ORDER BY n_nationkey
                 ROWS CURRENT ROW) AS BIGINT) AS c0,
               CAST(SUM(n_regionkey) OVER (ORDER BY n_nationkey
                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS su
        FROM nation ORDER BY n_nationkey""", """
        SELECT n_nationkey,
               CAST(SUM(n_regionkey) OVER (ORDER BY n_nationkey
                 ROWS BETWEEN 1 PRECEDING AND CURRENT ROW)
                 AS BIGINT) AS s1,
               CAST(COUNT(*) OVER (ORDER BY n_nationkey
                 ROWS BETWEEN CURRENT ROW AND CURRENT ROW)
                 AS BIGINT) AS c0,
               CAST(SUM(n_regionkey) OVER (ORDER BY n_nationkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS BIGINT) AS su
        FROM nation ORDER BY n_nationkey"""),
    # orderby_range_1_preceding_sum_count / range_current: value RANGE
    # shorthand; RANGE CURRENT ROW spans the peer group (ties)
    "sqlc_win_frame_shorthand_range": ("""
        SELECT l_linenumber,
               CAST(SUM(l_linenumber) OVER (ORDER BY l_linenumber
                 RANGE 1 PRECEDING) AS BIGINT) AS r1,
               CAST(COUNT(*) OVER (ORDER BY l_linenumber
                 RANGE CURRENT ROW) AS BIGINT) AS rc
        FROM lineitem WHERE l_orderkey <= 32
        ORDER BY l_linenumber""", """
        SELECT l_linenumber,
               CAST(SUM(l_linenumber) OVER (ORDER BY l_linenumber
                 RANGE BETWEEN 1 PRECEDING AND CURRENT ROW)
                 AS BIGINT) AS r1,
               CAST(COUNT(*) OVER (ORDER BY l_linenumber
                 RANGE BETWEEN CURRENT ROW AND CURRENT ROW)
                 AS BIGINT) AS rc
        FROM lineitem WHERE l_orderkey <= 32
        ORDER BY l_linenumber"""),
    # orderby_rows_1_{preceding,following}_first_last
    "sqlc_win_first_last_sliding": ("""
        SELECT n_nationkey,
               FIRST_VALUE(n_name) OVER (ORDER BY n_nationkey
                 ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING) AS fv,
               LAST_VALUE(n_name) OVER (ORDER BY n_nationkey
                 ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING) AS lv
        FROM nation ORDER BY n_nationkey""", """
        SELECT n_nationkey,
               FIRST_VALUE(n_name) OVER (ORDER BY n_nationkey
                 ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING) AS fv,
               LAST_VALUE(n_name) OVER (ORDER BY n_nationkey
                 ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING) AS lv
        FROM nation ORDER BY n_nationkey"""),
    # DecoupledPlanningCalciteQueryTest/testUnionAllQueriesWithLimit.iq
    # (the golden makes all branch values equal so LIMIT is stable)
    "sqlc_decoupled_union_all_limit": ("""
        SELECT * FROM (SELECT COUNT(*) AS c FROM nation
                       UNION ALL SELECT COUNT(*) FROM nation
                       UNION ALL SELECT COUNT(*) FROM nation) t
        LIMIT 2""", """
        SELECT * FROM (SELECT COUNT(*) AS c FROM nation
                       UNION ALL SELECT COUNT(*) FROM nation
                       UNION ALL SELECT COUNT(*) FROM nation) t
        LIMIT 2"""),
    # DecoupledPlanningCalciteQueryTest/
    # testGroupByTimeFloorAndDimOnGroupByTimeFloorAndDim.iq — month
    # re-floor over an inner day-floored grouped subquery with HAVING
    "sqlc_decoupled_nested_timefloor_gb": ("""
        SELECT event_type, TIME_FLOOR(gran, 'P1M') AS mon,
               ROUND(SUM(s), 3) AS total
        FROM (SELECT TIME_FLOOR(__time, 'P1D') AS gran, event_type,
                     SUM(value) AS s
              FROM events GROUP BY 1, 2 HAVING SUM(value) > 1) x
        GROUP BY 1, 2 ORDER BY event_type, mon DESC""", """
        SELECT event_type, date_trunc('month', gran) AS mon,
               ROUND(SUM(s), 3) AS total
        FROM (SELECT date_trunc('day', ts) AS gran, event_type,
                     SUM(value) AS s
              FROM events GROUP BY 1, 2 HAVING SUM(value) > 1) x
        GROUP BY 1, 2 ORDER BY event_type, mon DESC"""),
    # DecoupledPlanningCalciteQueryTest/
    # testRepeatedIdenticalVirtualExpressionGrouping.iq — CASE x WHEN
    # NULL never matches (NULL equality), both columns collapse to TRUE
    "sqlc_decoupled_case_when_null_grouping": ("""
        SELECT CASE o_orderstatus WHEN NULL THEN FALSE ELSE TRUE END
                 AS col_a,
               CASE o_orderpriority WHEN NULL THEN FALSE ELSE TRUE END
                 AS col_b
        FROM orders GROUP BY 1, 2""", """
        SELECT CASE o_orderstatus WHEN NULL THEN FALSE ELSE TRUE END
                 AS col_a,
               CASE o_orderpriority WHEN NULL THEN FALSE ELSE TRUE END
                 AS col_b
        FROM orders GROUP BY 1, 2"""),
    # DecoupledPlanningCalciteQueryTest/
    # testGroupByWithLiteralInSubqueryGrouping.iq
    "sqlc_decoupled_literal_subquery_grouping": ("""
        SELECT t1, t2 FROM (
          SELECT 'dummy' AS t1,
                 CASE WHEN o_orderstatus = 'F'
                      THEN o_orderstatus ELSE NULL END AS t2
          FROM orders GROUP BY o_orderstatus) x
        GROUP BY t1, t2 ORDER BY t2 NULLS FIRST""", """
        SELECT t1, t2 FROM (
          SELECT 'dummy' AS t1,
                 CASE WHEN o_orderstatus = 'F'
                      THEN o_orderstatus ELSE NULL END AS t2
          FROM orders GROUP BY o_orderstatus) x
        GROUP BY t1, t2 ORDER BY t2 NULLS FIRST"""),
    # DecoupledPlanningCalciteQueryTest/testWindowingWithScanAndSort.iq
    # — window over a grouped derived table, outer re-sort
    "sqlc_decoupled_window_scan_sort": ("""
        WITH t AS (
          SELECT RANK() OVER (PARTITION BY l_returnflag
                              ORDER BY l_returnflag ASC) AS ranking,
                 CAST(COUNT(l_quantity) AS BIGINT) AS trend_score
          FROM lineitem WHERE l_orderkey <= 96
          GROUP BY l_returnflag, l_linestatus LIMIT 10)
        SELECT ranking, trend_score FROM t
        ORDER BY trend_score, ranking""", """
        WITH t AS (
          SELECT RANK() OVER (PARTITION BY l_returnflag
                              ORDER BY l_returnflag ASC) AS ranking,
                 CAST(COUNT(l_quantity) AS BIGINT) AS trend_score
          FROM lineitem WHERE l_orderkey <= 96
          GROUP BY l_returnflag, l_linestatus LIMIT 10)
        SELECT ranking, trend_score FROM t
        ORDER BY trend_score, ranking"""),

    # ----------------------------------------------------------------
    # Conformance batch 61 (round 7): decoupled-planning remainder +
    # qaJsonCols null edges (sql/src/test/quidem/org.apache.druid.sql.
    # calcite.DecoupledPlanningCalciteQueryTest/*.iq, quidem-ut
    # qaJsonCols/funcs_and_sql_func_json_keys.01.all.iq).
    # ----------------------------------------------------------------
    # testMultipleExactCountDistinctWithGroupingAndOtherAggregators-
    # UsingJoin.iq — several exact COUNT(DISTINCT)s beside plain aggs
    # (the reference plans this as a self-join of grouped subqueries;
    # Spark's aggregate handles multiple distincts natively)
    "sqlc_multi_count_distinct": ("""
        SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT) AS prios,
               CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS custs
        FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""", """
        SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT) AS prios,
               CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS custs
        FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus"""),
    # testTimeFilterOnSubquery.iq — TIME_IN_INTERVAL disjunction over a
    # LIMIT-wrapped subquery (limit exceeds the table so rows are
    # deterministic, as in the golden)
    "sqlc_time_in_interval_subquery": ("""
        SELECT __time, ROUND(value, 3) AS v
        FROM (SELECT * FROM events LIMIT 100000) t
        WHERE TIME_IN_INTERVAL(__time, '2024-01-02/P1D')
           OR TIME_IN_INTERVAL(__time, '2024-01-05/P1D')
        ORDER BY __time, v""", """
        SELECT ts AS __time, ROUND(value, 3) AS v
        FROM (SELECT * FROM events LIMIT 100000) t
        WHERE (ts >= TIMESTAMP '2024-01-02' AND
               ts < TIMESTAMP '2024-01-03')
           OR (ts >= TIMESTAMP '2024-01-05' AND
               ts < TIMESTAMP '2024-01-06')
        ORDER BY __time, v"""),
    # testGroupByLimitPushdownExtraction.iq — extraction (substring)
    # grouping key beside a plain dim, limited (filter bounds the
    # group count below the limit so the row set is deterministic)
    "sqlc_groupby_limit_pushdown_extraction": ("""
        SELECT o_orderstatus, SUBSTRING(o_orderpriority, 1, 1) AS p,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM orders WHERE o_orderstatus = 'F'
        GROUP BY 1, 2 ORDER BY 1, 2 LIMIT 10""", """
        SELECT o_orderstatus, substring(o_orderpriority, 1, 1) AS p,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM orders WHERE o_orderstatus = 'F'
        GROUP BY 1, 2 ORDER BY 1, 2 LIMIT 10"""),
    # testGroupBySortPushDown.iq — sort on the SECOND grouping key
    # pushed into the limited aggregation (tiebreak added: the golden
    # relies on segment order for ties)
    "sqlc_groupby_sort_pushdown": ("""
        SELECT o_orderstatus, o_orderpriority, SUM(o_totalprice) AS s
        FROM orders GROUP BY o_orderstatus, o_orderpriority
        ORDER BY o_orderpriority, o_orderstatus LIMIT 4""", """
        SELECT o_orderstatus, o_orderpriority, SUM(o_totalprice) AS s
        FROM orders GROUP BY o_orderstatus, o_orderpriority
        ORDER BY o_orderpriority, o_orderstatus LIMIT 4"""),
    # testRequireTimeConditionPositive3.iq — IN-subquery on an
    # extraction with __time bounds on both sides
    "sqlc_semijoin_substring_time": ("""
        SELECT CAST(COUNT(*) AS BIGINT) AS n FROM events
        WHERE __time >= '2024-01-01'
          AND SUBSTRING(event_type, 1, 1) IN (
            SELECT SUBSTRING(event_type, 1, 1) FROM events
            WHERE event_type <> '' AND __time >= '2024-01-15')""", """
        SELECT CAST(COUNT(*) AS BIGINT) AS n FROM events
        WHERE ts >= TIMESTAMP '2024-01-01'
          AND substring(event_type, 1, 1) IN (
            SELECT substring(event_type, 1, 1) FROM events
            WHERE event_type <> '' AND ts >= TIMESTAMP '2024-01-15')"""),
    # funcs_and_sql_func_json_keys.01.all.iq A001-A005 — JSON_KEYS of
    # non-JSON inputs (a timestamp, a plain string) is NULL; of an
    # object it lists the keys
    "sqlc_json_keys_nonjson_null": ("""
        SELECT JSON_KEYS(__time, '$') IS NULL AS ts_null,
               JSON_KEYS('ABCD', '$') IS NULL AS str_null,
               ARRAY_TO_STRING(
                 JSON_KEYS('{"b": 1, "a": 2}', '$'), ',') AS keys
        FROM events LIMIT 1""", """
        SELECT TRUE AS ts_null, TRUE AS str_null,
               'b,a' AS keys"""),

    # ----------------------------------------------------------------
    # Conformance batch 62 (round 7): DecoupledPlanningCalciteJoin-
    # QueryTest golden shapes (sql/src/test/quidem/...CalciteJoinQuery-
    # Test/*.iq) + the CAST(timestamp AS BIGINT) = epoch-millis
    # semantic those goldens pin (timestamps are native-layer longs).
    # ----------------------------------------------------------------
    # testSemiAndAntiJoinSimultaneouslyUsingExplicitJoins.iq — semi
    # join on a MAX subquery plus anti join (LEFT + IS NULL) on a MIN
    # subquery over the same table
    "sqlc_semi_anti_explicit_joins": ("""
        SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n FROM events
        INNER JOIN (SELECT MAX(__time) AS t FROM events) t0
                ON t0.t = events.__time
        LEFT JOIN (SELECT MIN(__time) AS t FROM events) t1
                ON t1.t = events.__time
        WHERE t1.t IS NULL
        GROUP BY 1 ORDER BY 1""", """
        SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n FROM events
        INNER JOIN (SELECT MAX(ts) AS t FROM events) t0
                ON t0.t = events.ts
        LEFT JOIN (SELECT MIN(ts) AS t FROM events) t1
                ON t1.t = events.ts
        WHERE t1.t IS NULL
        GROUP BY 1 ORDER BY 1"""),
    # testJoinOnGroupByInsteadOfTimeseriesWithFloorOnTime.iq — tuple
    # (expr, col) IN over a floored-time grouped subquery, with
    # CAST(TIME_FLOOR(...) AS BIGINT) + 1 arithmetic in BOTH positions
    "sqlc_tuple_in_floor_subquery": ("""
        SELECT CAST(TIME_FLOOR(__time, 'PT1H') AS BIGINT) AS hr_ms,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM events
        WHERE (CAST(TIME_FLOOR(__time, 'PT1H') AS BIGINT) + 1,
               event_type) IN (
          SELECT CAST(TIME_FLOOR(__time, 'PT1H') AS BIGINT) + 1 AS t1,
                 MIN(event_type) AS t2
          FROM events WHERE value > 90 GROUP BY 1)
        GROUP BY 1 ORDER BY 1""", """
        SELECT epoch_ms(date_trunc('hour', ts)) AS hr_ms,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM events e
        WHERE EXISTS (
          SELECT 1 FROM (
            SELECT epoch_ms(date_trunc('hour', ts)) + 1 AS t1,
                   MIN(event_type) AS t2
            FROM events WHERE value > 90 GROUP BY 1) s
          WHERE s.t1 = epoch_ms(date_trunc('hour', e.ts)) + 1
            AND s.t2 = e.event_type)
        GROUP BY 1 ORDER BY 1"""),
    # testCommaJoinLeftFunction.iq — comma join with a function-of-
    # left-column equality condition
    "sqlc_comma_join_substring_cond": ("""
        SELECT r.r_name, n.n_nationkey
        FROM region r, nation n
        WHERE SUBSTRING(CAST(n.n_regionkey AS VARCHAR), 1, 1) =
              SUBSTRING(CAST(r.r_regionkey AS VARCHAR), 1, 1)
        ORDER BY 1, 2""", """
        SELECT r.r_name, n.n_nationkey
        FROM region r, nation n
        WHERE substring(CAST(n.n_regionkey AS VARCHAR), 1, 1) =
              substring(CAST(r.r_regionkey AS VARCHAR), 1, 1)
        ORDER BY 1, 2"""),
    # testInnerJoinCastLeft.iq — join condition casts the left numeric
    # to string
    "sqlc_join_cast_numeric_string": ("""
        SELECT n.n_name, r.r_name
        FROM nation n INNER JOIN region r
          ON CAST(n.n_regionkey AS VARCHAR) =
             CAST(r.r_regionkey AS VARCHAR)
        ORDER BY n.n_name""", """
        SELECT n.n_name, r.r_name
        FROM nation n INNER JOIN region r
          ON CAST(n.n_regionkey AS VARCHAR) =
             CAST(r.r_regionkey AS VARCHAR)
        ORDER BY n.n_name"""),
    # testUsingSubqueryAsPartOfAndFilter.iq — IN-subquery conjoined
    # with a plain predicate, grouped and ordered
    "sqlc_subquery_and_filter_grouped": ("""
        SELECT o_orderstatus, o_orderpriority,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM orders
        WHERE o_orderpriority IN (SELECT o_orderpriority FROM orders
                                  WHERE o_custkey < 50)
          AND o_orderstatus <> 'X'
        GROUP BY 1, 2 ORDER BY 2, 1""", """
        SELECT o_orderstatus, o_orderpriority,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM orders
        WHERE o_orderpriority IN (SELECT o_orderpriority FROM orders
                                  WHERE o_custkey < 50)
          AND o_orderstatus <> 'X'
        GROUP BY 1, 2 ORDER BY 2, 1"""),
    # CastOperatorConversion semantics the join goldens rely on:
    # CAST(timestamp AS BIGINT) is epoch MILLIS, not seconds — the
    # sub-second residue proves it
    "sqlc_cast_time_bigint_millis": ("""
        SELECT CAST(__time AS BIGINT) AS ms,
               MOD(CAST(__time AS BIGINT), 1000) AS sub_ms
        FROM events WHERE __time = (SELECT MIN(__time) FROM events)""", """
        SELECT epoch_ms(ts) AS ms, epoch_ms(ts) % 1000 AS sub_ms
        FROM events WHERE ts = (SELECT MIN(ts) FROM events)"""),

    # ----------------------------------------------------------------
    # Conformance batch 63 (round 7): DecoupledPlanningCalciteArrays-
    # QueryTest unnest depth (sql/src/test/quidem/...ArraysQueryTest/).
    # ----------------------------------------------------------------
    # testUnnestThriceWithFiltersOnDimAndAllUnnestColumns.iq — three
    # nested comma-unnests of the same source column with equality
    # filters on the dim and on every unnested column
    "sqlc_unnest_thrice_filters": ("""
        SELECT CAST(COUNT(*) AS BIGINT) AS n FROM
          (SELECT * FROM
            (SELECT * FROM documents,
              UNNEST(STRING_TO_ARRAY(text, ' ')) AS a(u1)) x,
            UNNEST(STRING_TO_ARRAY(text, ' ')) AS b(u2)) y,
          UNNEST(STRING_TO_ARRAY(text, ' ')) AS c(u3)
        WHERE doc_id = 1 AND u1 = 'data' AND u2 = 'the'
          AND u3 = 'learning'""", """
        SELECT CAST(
          (SELECT COUNT(*) FROM (SELECT unnest(string_split(text, ' '))
             AS u FROM documents WHERE doc_id = 1) q WHERE u = 'data')
          * (SELECT COUNT(*) FROM (SELECT unnest(string_split(text, ' '))
             AS u FROM documents WHERE doc_id = 1) q WHERE u = 'the')
          * (SELECT COUNT(*) FROM (SELECT unnest(string_split(text, ' '))
             AS u FROM documents WHERE doc_id = 1) q
             WHERE u = 'learning') AS BIGINT) AS n"""),
    # testUnnestExtractionFn.iq — extraction fn (substring from 1) on
    # the unnested column in both select and filter
    "sqlc_unnest_extraction_fn": ("""
        SELECT SUBSTRING(u, 1, 2) AS s, CAST(COUNT(*) AS BIGINT) AS n
        FROM documents, UNNEST(STRING_TO_ARRAY(text, ' ')) AS t(u)
        WHERE SUBSTRING(u, 1, 2) <> 'th' AND doc_id < 5
        GROUP BY 1 ORDER BY n DESC, s LIMIT 8""", """
        SELECT substring(u, 1, 2) AS s, CAST(COUNT(*) AS BIGINT) AS n
        FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS u
              FROM documents) t
        WHERE substring(u, 1, 2) <> 'th' AND doc_id < 5
        GROUP BY 1 ORDER BY n DESC, s LIMIT 8"""),
    # testUnnestWithGroupByOnExpression.iq — CROSS JOIN UNNEST of an
    # array built by the grouped subquery itself
    "sqlc_unnest_grouped_array_cross": ("""
        WITH x AS (SELECT ARRAY[1, 2, 3] AS all_nums
                   FROM orders GROUP BY 1)
        SELECT ARRAY_TO_STRING(x.all_nums, ',') AS arr, num
        FROM x CROSS JOIN UNNEST(x.all_nums) AS ud(num)
        ORDER BY num""", """
        WITH x AS (SELECT [1, 2, 3] AS all_nums
                   FROM orders GROUP BY 1)
        SELECT array_to_string(x.all_nums, ',') AS arr,
               CAST(num AS INTEGER) AS num
        FROM x CROSS JOIN (SELECT unnest(all_nums) AS num FROM x) u
        ORDER BY num""", ),
    # testUnnestWithGroupByHavingSelector.iq — group on the unnested
    # column with a HAVING selector on it
    "sqlc_unnest_groupby_having_selector": ("""
        SELECT u AS tok, CAST(COUNT(*) AS BIGINT) AS n
        FROM documents, UNNEST(STRING_TO_ARRAY(text, ' ')) AS t(u)
        GROUP BY u HAVING u = 'data'""", """
        SELECT u AS tok, CAST(COUNT(*) AS BIGINT) AS n
        FROM (SELECT unnest(string_split(text, ' ')) AS u
              FROM documents) t
        GROUP BY u HAVING u = 'data'"""),
    # testUnnestWithNotFiltersOnUnnestedColumn.iq — negated predicates
    # on the unnested column
    "sqlc_unnest_not_filters": ("""
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(COUNT(DISTINCT u) AS BIGINT) AS d
        FROM documents, UNNEST(STRING_TO_ARRAY(text, ' ')) AS t(u)
        WHERE u NOT IN ('the', 'of') AND NOT (u LIKE 'a%')
          AND doc_id < 20""", """
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(COUNT(DISTINCT u) AS BIGINT) AS d
        FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS u
              FROM documents) t
        WHERE u NOT IN ('the', 'of') AND NOT (u LIKE 'a%')
          AND doc_id < 20"""),
    # testUnnestWithFiltersInnerLimit.iq — LIMIT inside the unnested
    # derived table (limit exceeds the filtered row count so the row
    # set is deterministic, like the golden's LIMIT over 6 rows)
    "sqlc_unnest_inner_limit": ("""
        SELECT u AS tok, CAST(COUNT(*) AS BIGINT) AS n
        FROM (SELECT text FROM documents WHERE doc_id < 3 LIMIT 100) d,
             UNNEST(STRING_TO_ARRAY(text, ' ')) AS t(u)
        WHERE u LIKE 'd%'
        GROUP BY 1 ORDER BY 1""", """
        SELECT u AS tok, CAST(COUNT(*) AS BIGINT) AS n
        FROM (SELECT unnest(string_split(text, ' ')) AS u FROM
              (SELECT text FROM documents WHERE doc_id < 3 LIMIT 100) d)
        WHERE u LIKE 'd%'
        GROUP BY 1 ORDER BY 1"""),

    # ----------------------------------------------------------------
    # Conformance batch 64 (round 7): SqlQuidemTest goldens
    # (sql/src/test/quidem/org.apache.druid.quidem.SqlQuidemTest/).
    # ----------------------------------------------------------------
    # interval_arithmetic.iq — INTERVAL DAY/WEEK arithmetic inside
    # __time predicates (anchor literal instead of the golden's pinned
    # sqlCurrentTimestamp)
    "sqlc_interval_arithmetic_predicate": ("""
        SELECT CAST(COUNT(*) AS BIGINT) AS n_day,
               CAST(COUNT(CASE WHEN __time >=
                 TIMESTAMP '2024-01-15 00:00:00' - INTERVAL '2' WEEK
                 AND __time <
                 TIMESTAMP '2024-01-15 00:00:00' + INTERVAL '2' WEEK
                 THEN 1 END) AS BIGINT) AS n_week
        FROM events
        WHERE __time >= TIMESTAMP '2024-01-15 00:00:00'
                        - INTERVAL '2' DAY
          AND __time < TIMESTAMP '2024-01-15 00:00:00'
                        + INTERVAL '2' DAY""", """
        SELECT CAST(COUNT(*) AS BIGINT) AS n_day,
               CAST(COUNT(CASE WHEN ts >=
                 TIMESTAMP '2024-01-15 00:00:00' - INTERVAL 14 DAY
                 AND ts <
                 TIMESTAMP '2024-01-15 00:00:00' + INTERVAL 14 DAY
                 THEN 1 END) AS BIGINT) AS n_week
        FROM events
        WHERE ts >= TIMESTAMP '2024-01-15 00:00:00' - INTERVAL 2 DAY
          AND ts < TIMESTAMP '2024-01-15 00:00:00' + INTERVAL 2 DAY"""),
    # notinvalues.iq — NOT IN over a VALUES derived table
    "sqlc_not_in_values_subquery": ("""
        SELECT n_regionkey, CAST(COUNT(*) AS BIGINT) AS n
        FROM nation
        WHERE n_regionkey NOT IN
          (SELECT col FROM (VALUES (0), (999)) AS t(col))
        GROUP BY 1 ORDER BY 1""", """
        SELECT n_regionkey, CAST(COUNT(*) AS BIGINT) AS n
        FROM nation
        WHERE n_regionkey NOT IN
          (SELECT col FROM (VALUES (0), (999)) AS t(col))
        GROUP BY 1 ORDER BY 1"""),
    # grouping_sets_single_value_filter.iq — partial grouping sets
    # under a single-value filter on one of the grouped dims
    "sqlc_grouping_sets_single_value_filter": ("""
        SELECT o_orderstatus, o_orderpriority, SUM(o_totalprice) AS s
        FROM orders WHERE o_orderpriority = '1-URGENT'
        GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                                (o_orderstatus))
        ORDER BY o_orderstatus, o_orderpriority NULLS FIRST""", """
        SELECT o_orderstatus, o_orderpriority, SUM(o_totalprice) AS s
        FROM orders WHERE o_orderpriority = '1-URGENT'
        GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                                (o_orderstatus))
        ORDER BY o_orderstatus, o_orderpriority NULLS FIRST"""),
    # full_outer_constant_project.iq — FULL JOIN where one side
    # projects a constant (the constant must be NULL on non-matches)
    "sqlc_full_outer_constant_project": ("""
        SELECT r.r_name, n.tag
        FROM region r
        FULL JOIN (SELECT n_regionkey, 42 AS tag FROM nation
                   WHERE n_regionkey < 2) n
          ON r.r_regionkey = n.n_regionkey
        GROUP BY 1, 2 ORDER BY 1, 2""", """
        SELECT r.r_name, n.tag
        FROM region r
        FULL JOIN (SELECT n_regionkey, 42 AS tag FROM nation
                   WHERE n_regionkey < 2) n
          ON r.r_regionkey = n.n_regionkey
        GROUP BY 1, 2 ORDER BY 1, 2"""),
    # ----------------------------------------------------------------
    # Conformance batch 66 (round 7): web-console dashboard SQL,
    # VERBATIM shape (quidem-ut kttm_Stackarea.iq / kttm_Heatmap.iq —
    # double-quoted identifiers, explicit CASTs on every reference,
    # 4-arg TIME_FLOOR with NULL origin + 'Etc/UTC', FLOOR(x/10)*10
    # heat buckets, GROUP BY ordinals). FLOOR on numerics returns LONG
    # here (Spark) vs DOUBLE in Druid — documented deviation, oracle
    # casts to match.
    # ----------------------------------------------------------------
    "sqlc_console_stackarea_verbatim": ('''
        SELECT
        TIME_FLOOR(CAST(t."__time" AS TIMESTAMP), 'PT1H', NULL,
                   'Etc/UTC') AS "__time",
        FLOOR(CAST(t."value" AS DOUBLE) / 10) * 10 AS "bucket",
        (COUNT(*)) AS "count"
        FROM "events" AS t
        WHERE ((TIMESTAMP '2024-01-02 00:00:00'<=
                  CAST(t."__time" AS TIMESTAMP)
                AND CAST(t."__time" AS TIMESTAMP)
                  <TIMESTAMP '2024-01-02 11:00:00'))
        GROUP BY 1,2 ORDER BY 1,2''', '''
        SELECT date_trunc('hour', ts) AS __time,
               CAST(FLOOR(value / 10) * 10 AS BIGINT) AS bucket,
               COUNT(*) AS count
        FROM events
        WHERE ts >= TIMESTAMP '2024-01-02 00:00:00'
          AND ts < TIMESTAMP '2024-01-02 11:00:00'
        GROUP BY 1,2 ORDER BY 1,2'''),
    # ----------------------------------------------------------------
    # Conformance batch 67 (round 7): MV empty-survivor NULL semantics
    # (CalciteMultiValueStringQueryTest.java:1155,1314,1368 — an empty
    # MV_FILTER result is a NULL MVD: it groups as null, MV_LENGTH of
    # it is null, and it never matches in a join condition).
    # ----------------------------------------------------------------
    "sqlc_mv_filter_empty_is_null_group": ("""
        SELECT MV_FILTER_ONLY(STRING_TO_MV(event_type, '_'),
                              ARRAY['view']) AS only_page,
               MV_LENGTH(MV_FILTER_ONLY(STRING_TO_MV(event_type, '_'),
                                        ARRAY['view'])) AS len_page,
               COALESCE(ARRAY_TO_STRING(MV_FILTER_ONLY(
                 STRING_TO_MV(event_type, '_'), ARRAY['view']), ','),
                 'no view') AS coalesced,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM events GROUP BY 1, 2, 3
        ORDER BY 2 NULLS FIRST, 4""", """
        SELECT CASE WHEN hit THEN ['view'] END AS only_page,
               CASE WHEN hit THEN 1 END AS len_page,
               CASE WHEN hit THEN 'view' ELSE 'no view' END
                 AS coalesced,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM (SELECT list_contains(string_split(event_type, '_'),
                                   'view') AS hit FROM events)
        GROUP BY 1, 2, 3 ORDER BY 2 NULLS FIRST, 4"""),
    # testVirtualColumnOnMVFilterJoinExpression.iq — empty filter
    # results are NULL, so only rows with a survivor join
    "sqlc_mv_filter_join_condition": ("""
        SELECT CAST(COUNT(*) AS BIGINT) AS n
        FROM (SELECT doc_id, MV_FILTER_ONLY(
                STRING_TO_MV(event_type, '_'), ARRAY['view']) AS f
              FROM (SELECT doc_id, event_type FROM documents
                    JOIN events ON doc_id = user_id
                    WHERE doc_id < 40) b) d1
        INNER JOIN (SELECT user_id, MV_FILTER_ONLY(
                STRING_TO_MV(event_type, '_'), ARRAY['view']) AS f
              FROM events WHERE user_id < 40) d2
          ON d1.f = d2.f AND d1.doc_id = d2.user_id""", """
        SELECT CAST(COUNT(*) AS BIGINT) AS n
        FROM (SELECT doc_id, list_contains(
                string_split(event_type, '_'), 'view') AS hit
              FROM documents JOIN events ON doc_id = user_id
              WHERE doc_id < 40) d1
        INNER JOIN (SELECT user_id, list_contains(
                string_split(event_type, '_'), 'view') AS hit
              FROM events WHERE user_id < 40) d2
          ON d1.hit AND d2.hit AND d1.doc_id = d2.user_id"""),
    # quidem-ut qaUnnest/mv_sql_join.02 A2_B20 — self-join of two
    # unnest DERIVED TABLES on the unnested column
    "sqlc_unnest_derived_self_join": ("""
        SELECT CAST(COUNT(*) AS BIGINT) AS n
        FROM (SELECT doc_id, u AS c FROM documents,
              UNNEST(STRING_TO_ARRAY(lang, ',')) AS t(u)) t1
        JOIN (SELECT doc_id, u AS c FROM documents,
              UNNEST(STRING_TO_ARRAY(lang, ',')) AS t(u)) t2
          ON t1.c = t2.c
        WHERE t1.doc_id < 10 AND t2.doc_id < 10""", """
        SELECT CAST(COUNT(*) AS BIGINT) AS n
        FROM (SELECT doc_id, unnest(string_split(lang, ',')) AS c
              FROM documents) t1
        JOIN (SELECT doc_id, unnest(string_split(lang, ',')) AS c
              FROM documents) t2
          ON t1.c = t2.c
        WHERE t1.doc_id < 10 AND t2.doc_id < 10"""),
    "sqlc_console_overall_value": ('''
        SELECT
        MAX(CAST(t."__time" AS TIMESTAMP)) AS "__VALUE__"
        FROM "events" AS t
        GROUP BY ()''', '''
        SELECT MAX(ts) AS __VALUE__ FROM events'''),
    # filtered_sum.iq family — FILTER clause on SUM beside plain aggs
    "sqlc_filtered_sum_beside_plain": ("""
        SELECT l_returnflag,
               SUM(l_quantity) FILTER (WHERE l_discount > 0.05) AS fs,
               SUM(l_quantity) AS s,
               CAST(COUNT(*) FILTER (WHERE l_tax = 0.0) AS BIGINT)
                 AS zc
        FROM lineitem GROUP BY 1 ORDER BY 1""", """
        SELECT l_returnflag,
               SUM(l_quantity) FILTER (WHERE l_discount > 0.05) AS fs,
               SUM(l_quantity) AS s,
               CAST(COUNT(*) FILTER (WHERE l_tax = 0.0) AS BIGINT)
                 AS zc
        FROM lineitem GROUP BY 1 ORDER BY 1"""),
    # Conformance batch 69 (round 7 cont.): nested-data semantics from
    # CalciteNestedDataQueryTest — JSON_VALUE scalar-only
    # (testGroupByRootPath), JSON_QUERY NESTED_DATA rendering with
    # quoted string scalars (testJsonQuery), negative JSONPath indexes
    # (testJsonPathNegativeIndex), JSON_PATHS of non-JSON input
    # (testJsonPathsNonJsonInput), NULL ON EMPTY/ERROR options
    # (testJsonValueUnDocumentedButSupportedOptions).
    "sqlc_json_value_scalar_only": ("""
        SELECT JSON_VALUE('{"o": {"a": 1}, "arr": [1,2], "s": "x"}',
                          '$.o') AS obj,
               JSON_VALUE('{"o": {"a": 1}, "arr": [1,2], "s": "x"}',
                          '$.arr') AS arr,
               JSON_VALUE('{"o": {"a": 1}, "arr": [1,2], "s": "x"}',
                          '$.s') AS s,
               JSON_VALUE('{"o": {"a": 1}, "arr": [1,2], "s": "x"}',
                          '$') AS root""", """
        SELECT CAST(NULL AS VARCHAR) AS obj, CAST(NULL AS VARCHAR) AS arr,
               'x' AS s, CAST(NULL AS VARCHAR) AS root"""),
    "sqlc_json_query_scalar_quoted": ("""
        SELECT JSON_QUERY('{"a": "b"}', '$.a') AS qs,
               JSON_QUERY('{"a": 2}', '$.a') AS qn,
               JSON_QUERY('{"a": true}', '$.a') AS qb,
               JSON_QUERY('{"a": {"b": 1}}', '$.a') AS qo""", """
        SELECT '"b"' AS qs, '2' AS qn, 'true' AS qb,
               '{"b":1}' AS qo"""),
    "sqlc_json_negative_index": ("""
        SELECT JSON_VALUE('{"arr": [10, 20, 30]}', '$.arr[-1]') AS last,
               JSON_VALUE('{"arr": [10, 20, 30]}', '$.arr[-3]') AS first,
               JSON_VALUE('{"arr": [10, 20, 30]}', '$.arr[-9]') AS oob,
               JSON_VALUE('[7, 8]', '$[-1]') AS root_last""", """
        SELECT '30' AS last, '10' AS first,
               CAST(NULL AS VARCHAR) AS oob, '8' AS root_last"""),
    # a primitive array is its own LEAF path (round 12 — the
    # reference's JSON_PATHS(nester) = ['$.array', '$.n.x'] golden,
    # CalciteNestedDataQueryTest; only container-holding lists
    # recurse per index)
    "sqlc_json_paths_scalar_and_array": ("""
        SELECT ARRAY_TO_STRING(JSON_PATHS('1234'), ',') AS ps,
               ARRAY_TO_STRING(JSON_PATHS('[5, 6]'), ',') AS pa,
               ARRAY_TO_STRING(
                 ARRAY_SORT(JSON_PATHS('[[7], 8]')), ',') AS pn""", """
        SELECT '$' AS ps, '$' AS pa, '$[0],$[1]' AS pn"""),
    "sqlc_json_value_on_empty_options": ("""
        SELECT CAST(SUM(JSON_VALUE(props, '$.k'
                 RETURNING BIGINT NULL ON EMPTY NULL ON ERROR))
               AS BIGINT) AS s
        FROM events""", """
        SELECT CAST(SUM(CAST(props->>'k' AS BIGINT)) AS BIGINT) AS s
        FROM events"""),
    # qaJsonCols funcs_and_sql_func_json_value.01.all.iq A006/A011 +
    # json_query.01: plain strings are VALUES (never parsed) — root
    # path returns them raw (json_value) / quoted (json_query); a
    # TIMESTAMP arg reads as its native-layer long (A001)
    "sqlc_json_nonjson_root_scalar": ("""
        SELECT JSON_VALUE('ABCD', '$' RETURNING CHAR) AS a,
               JSON_QUERY('ABCD', '$') AS q,
               JSON_VALUE(JSON_QUERY('ABCD', '$'), '$'
                          RETURNING CHAR) AS rt""", """
        SELECT 'ABCD' AS a, '"ABCD"' AS q, 'ABCD' AS rt"""),
    "sqlc_json_value_ts_millis": ("""
        SELECT JSON_VALUE(__time, '$') AS m, count(*) AS n
        FROM events GROUP BY 1 ORDER BY 1 LIMIT 5""", """
        SELECT CAST(epoch_ms(ts) AS VARCHAR) AS m, count(*) AS n
        FROM events GROUP BY 1 ORDER BY 1 LIMIT 5"""),
    # ----------------------------------------------------------------
    # Conformance batch 70 (round 7 cont.): qaSql scalar batteries —
    # the generated comparison-matrix suites (quidem-ut .../qaSql/
    # scalar_numeric.02.all.iq A18/A20, scalar_string, scalar_other,
    # scalar_datetime). Each entry checks VALUES (stronger than the
    # reference's count-only batteries) plus the battery predicate.
    # ----------------------------------------------------------------
    # A18/A20-style inverse-trig battery: floor(f(clamped col)) passes
    # the full =/<>/IS DISTINCT/BETWEEN/LIKE/IN matrix on every row
    "sqlc_trig_inverse_battery": ("""
        SELECT CAST(COUNT(*) AS BIGINT) AS cnt,
               CAST(SUM(FLOOR(ACOS(LEAST(value / 100, 1)) +
                        ASIN(GREATEST(LEAST(value / 100, 1), -1)) +
                        ATAN(value) + COT(GREATEST(value, 1)))) AS DOUBLE)
                 AS s
        FROM events
        WHERE value IS NULL OR (
              FLOOR(ACOS(LEAST(value / 100, 1))) =
                FLOOR(ACOS(LEAST(value / 100, 1))) + 0
          AND FLOOR(ATAN(value))
                BETWEEN FLOOR(ATAN(value)) - 1 AND FLOOR(ATAN(value)) + 1
          AND FLOOR(COT(GREATEST(value, 1))) NOT BETWEEN
                FLOOR(COT(GREATEST(value, 1))) AND
                FLOOR(COT(GREATEST(value, 1))) - 1
          AND FLOOR(ASIN(GREATEST(LEAST(value / 100, 1), -1))) IN (
                FLOOR(ASIN(GREATEST(LEAST(value / 100, 1), -1))) - 1,
                FLOOR(ASIN(GREATEST(LEAST(value / 100, 1), -1))) + 0))""",
     """
        SELECT CAST(COUNT(*) AS BIGINT) AS cnt,
               CAST(SUM(FLOOR(ACOS(LEAST(value / 100, 1)) +
                        ASIN(GREATEST(LEAST(value / 100, 1), -1)) +
                        ATAN(value) + COT(GREATEST(value, 1)))) AS DOUBLE)
                 AS s
        FROM events
        WHERE value IS NULL OR (
              FLOOR(ACOS(LEAST(value / 100, 1))) =
                FLOOR(ACOS(LEAST(value / 100, 1))) + 0
          AND FLOOR(ATAN(value))
                BETWEEN FLOOR(ATAN(value)) - 1 AND FLOOR(ATAN(value)) + 1
          AND FLOOR(COT(GREATEST(value, 1))) NOT BETWEEN
                FLOOR(COT(GREATEST(value, 1))) AND
                FLOOR(COT(GREATEST(value, 1))) - 1
          AND FLOOR(ASIN(GREATEST(LEAST(value / 100, 1), -1))) IN (
                FLOOR(ASIN(GREATEST(LEAST(value / 100, 1), -1))) - 1,
                FLOOR(ASIN(GREATEST(LEAST(value / 100, 1), -1))) + 0))"""),
    # BITWISE_CONVERT_*: IEEE-754 reinterpretation, NOT numeric cast
    # (Function.java BitwiseConvertDoubleToLongBits). Known literals
    # pinned against hardcoded bit patterns; column roundtrip is exact.
    "sqlc_float_bits_literals": ("""
        SELECT BITWISE_CONVERT_DOUBLE_TO_LONG_BITS(CAST(1.0 AS DOUBLE))
                 AS one_bits,
               BITWISE_CONVERT_DOUBLE_TO_LONG_BITS(CAST(-2.5 AS DOUBLE))
                 AS neg_bits,
               BITWISE_CONVERT_DOUBLE_TO_LONG_BITS(CAST(0.0 AS DOUBLE))
                 AS zero_bits,
               BITWISE_CONVERT_LONG_BITS_TO_DOUBLE(4607182418800017408)
                 AS back_one,
               CAST(COUNT(*) AS BIGINT) AS n_exact
        FROM (SELECT BITWISE_CONVERT_LONG_BITS_TO_DOUBLE(
                       BITWISE_CONVERT_DOUBLE_TO_LONG_BITS(value)) AS rt,
                     value FROM events) t
        WHERE rt = value OR (rt IS NULL AND value IS NULL)""", """
        SELECT CAST(4607182418800017408 AS BIGINT) AS one_bits,
               CAST(-4610560118520545280 AS BIGINT) AS neg_bits,
               CAST(0 AS BIGINT) AS zero_bits,
               CAST(1.0 AS DOUBLE) AS back_one,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM events) AS n_exact"""),
    # every qaSql battery applies LIKE to NUMERIC expressions —
    # implicit stringification (Calcite casts the operand)
    "sqlc_numeric_like_battery": ("""
        SELECT CAST(COUNT(*) AS BIGINT) AS cnt
        FROM lineitem
        WHERE FLOOR(l_quantity) LIKE '%'
          AND FLOOR(l_quantity) NOT LIKE '__DOES_NOT_EXIST__%'
          AND l_linenumber LIKE '%'""", """
        SELECT CAST(COUNT(*) AS BIGINT) AS cnt
        FROM lineitem
        WHERE CAST(FLOOR(l_quantity) AS VARCHAR) LIKE '%'
          AND CAST(FLOOR(l_quantity) AS VARCHAR)
                NOT LIKE '__DOES_NOT_EXIST__%'
          AND CAST(l_linenumber AS VARCHAR) LIKE '%'"""),
    # scalar_datetime time_shift (532 battery uses): calendar-aware
    # month shifts CLAMP at month end (Joda addMonths), and a +P1H/-1
    # shift is an exact inverse on every row
    "sqlc_time_shift_month_clamp": ("""
        SELECT TIME_SHIFT(TIMESTAMP '2024-01-31 12:00:00', 'P1M', 1)
                 AS fwd,
               TIME_SHIFT(TIMESTAMP '2024-03-31 12:00:00', 'P1M', -1)
                 AS back,
               TIME_SHIFT(TIMESTAMP '2024-02-29 00:00:00', 'P1Y', 1)
                 AS leap,
               CAST((SELECT COUNT(*) FROM events
                     WHERE TIME_SHIFT(TIME_SHIFT(__time, 'PT1H', 1),
                                      'PT1H', -1)
                           = TIME_FLOOR(__time, 'PT0.001S'))
                 AS BIGINT) AS inverse_ok""", """
        SELECT TIMESTAMP '2024-01-31 12:00:00' + INTERVAL 1 MONTH AS fwd,
               TIMESTAMP '2024-03-31 12:00:00' - INTERVAL 1 MONTH AS back,
               TIMESTAMP '2024-02-29 00:00:00' + INTERVAL 1 YEAR AS leap,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM events)
                 AS inverse_ok"""),
    # scalar_string trim family with explicit char sets (BTRIM/LTRIM/
    # RTRIM 2-arg forms — DruidSqlTrim / Calcite TRIM rewrites)
    "sqlc_trim_char_sets": ("""
        SELECT BTRIM('xxabcxx', 'x') AS b,
               LTRIM('xxabcxx', 'x') AS l,
               RTRIM('xxabcxx', 'x') AS r,
               BTRIM('  padded  ') AS plain,
               LTRIM(lang, 'abcdef') AS col_trim,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM documents GROUP BY 5 ORDER BY 5 NULLS FIRST LIMIT 8""", """
        SELECT 'abc' AS b, 'abcxx' AS l, 'xxabc' AS r,
               'padded' AS plain,
               ltrim(lang, 'abcdef') AS col_trim,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM documents GROUP BY 5 ORDER BY 5 NULLS FIRST LIMIT 8"""),
    # scalar_other NVL/NULLIF/COALESCE chains (248 uses each): NULLIF
    # collapsing a sentinel back to null inside an NVL default
    "sqlc_nvl_nullif_chain": ("""
        SELECT NVL(NULLIF(event_type, 'click'), 'was-click') AS e,
               NULLIF(NVL(props, '{}'), '{}') IS NULL AS empty_props,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM events GROUP BY 1, 2 ORDER BY 1, 2""", """
        SELECT COALESCE(NULLIF(event_type, 'click'), 'was-click') AS e,
               NULLIF(COALESCE(props, '{}'), '{}') IS NULL
                 AS empty_props,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM events GROUP BY 1, 2 ORDER BY 1, 2"""),
    # ----------------------------------------------------------------
    # Conformance batch 71: qaSql scalar_ipv4 / scalar_reduction
    # batteries — numeric-typed IPV4 args (the battery feeds
    # session_length, a LONG, to every ipv4 fn) and GREATEST/LEAST
    # null-skipping inside string-concat comparison matrices.
    # ----------------------------------------------------------------
    "sqlc_ipv4_battery": ("""
        SELECT IPV4_STRINGIFY(3232235777) AS lan,
               IPV4_PARSE('192.168.1.1') AS lan_back,
               IPV4_MATCH(3232235777, '192.168.0.0/16') AS in16,
               IPV4_MATCH(3232235777, '10.0.0.0/8') AS in8,
               CAST(COUNT(*) AS BIGINT) AS rt_ok
        FROM events
        WHERE IPV4_PARSE(IPV4_STRINGIFY(user_id)) = user_id
          AND IPV4_MATCH(user_id, '0.0.0.0/1')""", """
        SELECT '192.168.1.1' AS lan,
               CAST(3232235777 AS BIGINT) AS lan_back,
               TRUE AS in16, FALSE AS in8,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM events) AS rt_ok"""),
    # scalar_reduction A1: GREATEST/LEAST skip NULL args, and the
    # result survives the string-concat comparison matrix
    "sqlc_reduction_battery": ("""
        SELECT '1' || GREATEST(value, 1, NULL) AS g,
               '1' || LEAST(value, 1, NULL) AS l,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM events
        WHERE value IS NULL
           OR ('1' || GREATEST(value, 1, NULL) =
                 1 || GREATEST(value, 1, NULL)
               AND '1' || GREATEST(value, 1, NULL) IS NOT DISTINCT FROM
                 1 || GREATEST(value, 1, NULL)
               AND '1' || LEAST(value, 1, NULL) LIKE '%')
        GROUP BY 1, 2 ORDER BY 1, 2 LIMIT 10""", """
        SELECT '1' || CAST(GREATEST(value, 1) AS VARCHAR) AS g,
               '1' || CAST(LEAST(value, 1) AS VARCHAR) AS l,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM events GROUP BY 1, 2 ORDER BY 1, 2 LIMIT 10"""),
    # scalar_other TO_JSON_STRING battery: canonical rendering of a
    # parsed-then-reserialized object and of SQL arrays
    "sqlc_to_json_string_roundtrip": ("""
        SELECT TO_JSON_STRING(PARSE_JSON('{"b": 2, "a": 1}')) AS obj,
               TO_JSON_STRING(ARRAY[1, 2, 3]) AS arr,
               TO_JSON_STRING(PARSE_JSON('[1, "x", null]')) AS mixed""",
     """
        SELECT '{"a":1,"b":2}' AS obj, '[1,2,3]' AS arr,
               '[1,"x",null]' AS mixed"""),
    # ----------------------------------------------------------------
    # Conformance batch 72 (round 7 cont.): semantics the quidem
    # qa-corpus campaign pinned (quidem-ut qaAggFuncs/qaArray/
    # qaJsonCols goldens; tools/quidem_conformance.py runs the full
    # ~25k-case bank).
    # ----------------------------------------------------------------
    # ARRAY_AGG keeps NULL inputs; DISTINCT includes one null
    # (qaAggFuncs array_agg_* batteries: 18 rows with 6 nulls -> 18/3)
    "sqlc_array_agg_keeps_nulls": ("""
        SELECT ARRAY_LENGTH(ARRAY_AGG(v)) AS n_all,
               ARRAY_LENGTH(ARRAY_AGG(DISTINCT v)) AS n_distinct
        FROM (SELECT CASE WHEN o_orderkey % 3 = 0 THEN NULL
                          ELSE o_orderstatus END AS v
              FROM orders ORDER BY o_orderkey LIMIT 30)""", """
        SELECT CAST(COUNT(*) AS INT) AS n_all,
               CAST(COUNT(DISTINCT v) + 1 AS INT) AS n_distinct
        FROM (SELECT CASE WHEN o_orderkey % 3 = 0 THEN NULL
                          ELSE o_orderstatus END AS v
              FROM orders ORDER BY o_orderkey LIMIT 30)"""),
    # ARRAY_CONTAINS / ARRAY_OVERLAP are two-valued: a no-match with
    # null elements present is FALSE, not NULL (Function.java
    # ArrayContainsFunction; qaAggFuncs A08/A11 goldens)
    "sqlc_array_contains_two_valued": ("""
        SELECT ARRAY_CONTAINS(a, 'F') AS hit,
               ARRAY_CONTAINS(a, 'Z') AS miss,
               ARRAY_OVERLAP(a, ARRAY['Z', 'Q']) AS no_overlap
        FROM (SELECT ARRAY_AGG(CASE WHEN o_orderkey % 3 = 0 THEN NULL
                                    ELSE o_orderstatus END, 1000000) AS a
              FROM orders)""", """
        SELECT TRUE AS hit, FALSE AS miss, FALSE AS no_overlap"""),
    # ARRAY_SLICE edge semantics (ArraySliceFunction): out-of-range
    # start nulls the result; end past the length null-pads
    "sqlc_array_slice_edges": ("""
        SELECT ARRAY_SLICE(ARRAY['a','b','c'], 9, 11) AS oob,
               ARRAY_TO_STRING(
                 ARRAY_SLICE(ARRAY['a','b','c'], 1, 5), '|') AS padded""",
     """
        SELECT CAST(NULL AS VARCHAR[]) AS oob,
               'b|c|null|null' AS padded"""),
    # JSON_PATHS is a recursive leaf walk: empty arrays are leaves,
    # empty objects contribute nothing (qaJsonCols func_json_paths)
    "sqlc_json_paths_leaves": ("""
        SELECT ARRAY_TO_STRING(ARRAY_SORT(
                 JSON_PATHS('{"a": {"b": 1, "c": []}, "d": {}}')),
               ',') AS paths,
               JSON_OBJECT(KEY 'k' VALUE NULL) AS keeps_null""", """
        SELECT '$.a.b,$.a.c' AS paths, '{"k":null}' AS keeps_null"""),
}


def _sql_case(name: str) -> Callable[[SparkSession, str], DataFrame]:
    def run(spark, sf, _q=_SQL_CASES[name][0]):
        return _engine(spark, sf).sql(_q)
    return run


# One representative of every operator class, ordered so a ~50-entry
# prefix sample of queries() covers the whole engine: query types,
# joins, sketches/projections, streaming, SQL layer, datapipe. The
# remaining base entries follow, then the sqlc_* conformance bank.
_SAMPLE_FIRST = [
    # network API + query types
    "http_api", "avatica_jdbc",
    "ts_day", "ts_zero_fill", "ts_grand_total",
    "topn_sum_value", "topn_inverted", "topn_approx_bound",
    "topn_postagg_metric",
    "gb_flag_status", "gb_having", "gb_subtotals", "gb_postagg",
    "gb_count_distinct", "gb_first_last", "gb_extraction",
    "scan_orders", "scan_filters_matrix", "search_event_type",
    "time_boundary", "dsmeta", "segment_metadata",
    "window_rank", "window_running_sum", "window_framed_avg",
    "union_counts", "unnest_tokens",
    # joins + lookup filters
    "join_region_nation", "join_orders_lineitem", "join_semi",
    "join_outer", "lookup_join", "lookup_filter_equals",
    "asof_join", "range_join",
    # sketches / projections / rollup routing
    "gb_quantile_sketch", "theta_setops", "tuple_setops",
    "hll_sketch_vs_exact", "hyperunique_parity", "agg_size_cap",
    "projection_hll_sketch", "projection_theta_sketch",
    "kll_quantile_merge", "projection_routing",
    # streaming + stateful (kafka_ingest: wire-protocol Kafka e2e)
    "streaming_rollup", "sessionize", "kafka_ingest",
    "kinesis_ingest",
    # round 6: protobuf format, tiered lookups, security CRUD + audit
    "protobuf_ingest", "lookup_tiered", "security_audit",
    # round 11: sql input source + JDBC lookup namespace over DB-API
    "sql_input_source",
    # round 7: lookup schema tables, pinned CURRENT_TIMESTAMP, epoch-
    # millis timestamp-long semantics, Joda interval forms, frame
    # shorthands, agg-surface remainder, triple unnest
    "lookup_schema_table", "sql_pinned_now",
    "sqlc_cast_time_bigint_millis", "sqlc_stragg_ts_column_millis",
    "sqlc_time_in_interval_subquery", "sqlc_win_frame_shorthand_rows",
    "sqlc_stragg_distinct_maxbytes", "sqlc_unnest_thrice_filters",
    "sqlc_semi_anti_explicit_joins", "mm_features",
    # virtual columns / nested JSON / filters
    "vc_nested_field", "json_groupby", "spatial_filter", "bloom_filter",
    # datapipe
    "dedup_exact", "dedup_jaccard", "neardup_embedding",
    "sim_topk", "sim_lsh_recall", "sim_quantized_recall", "text_profile",
    "vocab_topk", "char_entropy", "repeated_ngrams",
    "pii_redact", "sample_stratified",
]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # Curated operator-class coverage FIRST (driver prefix samples hit
    # every engine area), then the remaining core entries, then the
    # SQL-conformance bank (sqlc_*) at the tail.
    base = _base_queries()
    out = {}
    for name in _SAMPLE_FIRST:
        if name in base:
            out[name] = base[name]
        elif name in _SQL_CASES:  # curated sqlc picks sample early too
            out[name] = _sql_case(name)
    out.update(base)
    out.update({name: _sql_case(name) for name in _SQL_CASES})
    return out


def _base_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "http_api": q_http_api,
        "overlord_ingest": q_overlord_ingest,
        "protobuf_ingest": q_protobuf_ingest,
        "lookup_tiered": q_lookup_tiered,
        "security_audit": q_security_audit,
        "avatica_jdbc": q_avatica_jdbc,
        "ts_day": q_ts_day,
        "ts_day_tz": q_ts_day_tz,
        "ts_grand_total": q_ts_grand_total,
        "vc_nested_field": q_vc_nested_field,
        "asof_join": q_asof_join,
        "range_join": q_range_join,
        "ts_zero_fill": q_ts_zero_fill,
        "ts_hour_filtered": q_ts_hour_filtered,
        "ts_all_skip_empty": q_ts_all_skip_empty,
        "ts_six_hour": q_ts_six_hour,
        "ts_month_lineitem": q_ts_month_lineitem,
        "topn_sum_value": q_topn_sum_value,
        "topn_inverted": q_topn_inverted,
        "topn_user": q_topn_user,
        "topn_approx_bound": q_topn_approx_bound,
        "gb_flag_status": q_gb_flag_status,
        "gb_having": q_gb_having,
        "gb_order_limit": q_gb_order_limit,
        "gb_subtotals": q_gb_subtotals,
        "gb_extraction": q_gb_extraction,
        "sql_lookup_fn": q_sql_lookup_fn,
        "time_boundary_max_only": q_time_boundary_max_only,
        "sys_segments_sql": q_sys_segments_sql,
        "sys_tasks_supervisors": q_sys_tasks_supervisors,
        "information_schema_tables": q_information_schema_tables,
        "gb_having_dim_selector": q_gb_having_dim_selector,
        "vc_hof_expression": q_vc_hof_expression,
        "spatial_radius": q_spatial_radius,
        "gb_month_grain": q_gb_month_grain,
        "agg_on_information_schema": q_agg_on_information_schema,
        "search_regex_spec": q_search_regex_spec,
        "ts_postagg_ratio": q_ts_postagg_ratio,
        "topn_postagg_metric": q_topn_postagg_metric,
        "scan_virtual_column": q_scan_virtual_column,
        "lookup_filter_equals": q_lookup_filter_equals,
        "lookup_filter_in": q_lookup_filter_in,
        "lookup_filter_is_null": q_lookup_filter_is_null,
        "lookup_filter_not_in": q_lookup_filter_not_in,
        "lookup_coalesce_missing": q_lookup_coalesce_missing,
        "lookup_of_concat": q_lookup_of_concat,
        "lookup_chained": q_lookup_chained,
        "lookup_function_of_lookup": q_lookup_function_of_lookup,
        "gb_time_format_extraction": q_gb_time_format_extraction,
        "gb_bucket_extraction": q_gb_bucket_extraction,
        "gb_cascade_extraction": q_gb_cascade_extraction,
        "gb_virtual_revenue": q_gb_virtual_revenue,
        "gb_count_distinct": q_gb_count_distinct,
        "gb_cardinality": q_gb_cardinality,
        "gb_first_last": q_gb_first_last,
        "gb_filtered_agg": q_gb_filtered_agg,
        "gb_postagg": q_gb_postagg,
        "json_groupby": q_json_groupby,
        "scan_orders": q_scan_orders,
        "scan_filters_matrix": q_scan_filters_matrix,
        "search_event_type": q_search_event_type,
        "time_boundary": q_time_boundary,
        "dsmeta": q_dsmeta,
        "sql_explain": q_sql_explain,
        "join_region_nation": q_join_region_nation,
        "join_orders_lineitem": q_join_orders_lineitem,
        "join_semi": q_join_semi,
        "join_customer_nation": q_join_customer_nation,
        "union_counts": q_union_counts,
        "unnest_tokens": q_unnest_tokens,
        "window_rank": q_window_rank,
        "window_running_sum": q_window_running_sum,
        "window_lead_lag_rank": q_window_lead_lag_rank,
        "dedup_exact": q_dedup_exact,
        "dedup_jaccard": q_dedup_jaccard,
        "repetition_profile": q_repetition_profile,
        "boilerplate_removal": q_boilerplate_removal,
        "pii_redact": q_pii_redact,
        "pipeline_quality_dedup": q_pipeline_quality_dedup,
        "url_extract": q_url_extract,
        "dedup_clusters": q_dedup_clusters,
        "sessionize": q_sessionize,
        "streaming_rollup": q_streaming_rollup,
        "kafka_ingest": q_kafka_ingest,
        "kinesis_ingest": q_kinesis_ingest,
        "sample_stratified": q_sample_stratified,
        "temperature_rates": q_temperature_rates,
        "split_assign": q_split_assign,
        "shard_pack": q_shard_pack,
        "dedup_canonicalize": q_dedup_canonicalize,
        "contamination": q_contamination,
        "dedup_minhash": q_dedup_minhash,
        "dedup_simhash": q_dedup_simhash,
        "neardup_embedding": q_neardup_embedding,
        "neardup_embedding_exact": q_neardup_embedding_exact,
        "sim_topk": q_sim_topk,
        "sim_lsh": q_sim_lsh,
        "sys_schema": q_sys_schema,
        "sim_lsh_recall": q_sim_lsh_recall,
        "sim_ivf_recall": q_sim_ivf_recall,
        "sim_quantized_recall": q_sim_quantized_recall,
        "sim_ivf": q_sim_ivf,
        "text_profile": q_text_profile,
        "vocab_topk": q_vocab_topk,
        "char_entropy": q_char_entropy,
        "repeated_ngrams": q_repeated_ngrams,
        "doc_length_profile": q_doc_length_profile,
        "dedup_rate_by_source": q_dedup_rate_by_source,
        "text_quality_by_source": q_text_quality_by_source,
        "mm_features": q_mm_features,
        "segment_metadata": q_segment_metadata,
        "gb_quantile_sketch": q_gb_quantile_sketch,
        "theta_setops": q_theta_setops,
        "tuple_setops": q_tuple_setops,
        "gb_fixed_histogram": q_gb_fixed_histogram,
        "gb_variance": q_gb_variance,
        "lookup_join": q_lookup_join,
        "lookup_schema_table": q_lookup_schema_table,
        "lookup_join_union_tables": q_lookup_join_union_tables,
        "lookup_join_backwards": q_lookup_join_backwards,
        "lookup_join_subquery_extract": q_lookup_join_subquery_extract,
        "sql_pinned_now": q_sql_pinned_now,
        "gb_order_alphanumeric": q_gb_order_alphanumeric,
        "scan_offset": q_scan_offset,
        "sql_druid_functions": q_sql_druid_functions,
        "sql_array_agg": q_sql_array_agg,
        "gb_expr_lambda": q_gb_expr_lambda,
        "nested_groupby": q_nested_groupby,
        "join_outer": q_join_outer,
        "projection_routing": q_projection_routing,
        "json_typed_agg": q_json_typed_agg,
        "projection_count_distinct": q_projection_count_distinct,
        "hll_sketch_vs_exact": q_hll_sketch_vs_exact,
        "hyperunique_parity": q_hyperunique_parity,
        "agg_size_cap": q_agg_size_cap,
        "sql_input_source": q_sql_input_source,
        "r12_mvd_any_element": q_r12_mvd_any_element,
        "r12_earliest_unnest_tiebreak": q_r12_earliest_unnest_tiebreak,
        "r12_json_empty_leaves": q_r12_json_empty_leaves,
        "r12_complex_hash_order": q_r12_complex_hash_order,
        "projection_hll_sketch": q_projection_hll_sketch,
        "projection_theta_sketch": q_projection_theta_sketch,
        "kll_quantile_merge": q_kll_quantile_merge,
        "sql_ds_hll": q_sql_ds_hll,
        "theta_kmv_vs_exact": q_theta_kmv_vs_exact,
        "tuple_state_merge": q_tuple_state_merge,
        "projection_kmv_sketch": q_projection_kmv_sketch,
        "projection_quantile_sample": q_projection_quantile_sample,
        "single_value": q_single_value,
        "gb_histogram": q_gb_histogram,
        "union_datasource": q_union_datasource,
        "filter_datasource": q_filter_datasource,
        "gb_prefix_filtered": q_gb_prefix_filtered,
        "spatial_filter": q_spatial_filter,
        "spatial_polygon": q_spatial_polygon,
        "restrict_datasource": q_restrict_datasource,
        "gb_array_dim": q_gb_array_dim,
        "sql_extern": q_sql_extern,
        "sql_semantics": q_sql_semantics,
        "tpch_q1": q_tpch_q1,
        "tpch_q3": q_tpch_q3,
        "tpch_q6": q_tpch_q6,
        "sql_unnest": q_sql_unnest,
        "gb_hll_expr": q_gb_hll_expr,
        "bloom_filter": q_bloom_filter,
        "tuple_sketch": q_tuple_sketch,
        "search_fragment": q_search_fragment,
        "inline_topn": q_inline_topn,
        "topn_per_day": q_topn_per_day,
        "window_framed_avg": q_window_framed_avg,
        "ts_week": q_ts_week,
        "ts_descending": q_ts_descending,
        "search_strlen_sort": q_search_strlen_sort,
        "gb_limit_offset": q_gb_limit_offset,
        "gb_having_compound": q_gb_having_compound,
        "topn_dim_metric": q_topn_dim_metric,
        "scan_time_desc": q_scan_time_desc,
    }


# --------------------------------------------------------------------------
# DuckDB oracle SQL
# --------------------------------------------------------------------------

_NORM = "lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))"
_TOKS = ("list_filter(string_split(" + _NORM + ", ' '), t -> t != '')")
_RAW_TOKS = "string_split_regex(trim(text), '\\s+')"
_NTOK = ("CASE WHEN length(trim(text)) = 0 THEN 0 "
         "ELSE len(" + _RAW_TOKS + ") END")
_LOW_TOKS = "list_transform(" + _RAW_TOKS + ", t -> lower(t))"

_SW = {
    "en": "['the','and','of','to','in','is','that','it','was','for']",
    "de": "['der','die','das','und','ist','nicht','ein','mit','sich','auf']",
    "fr": "['le','la','les','et','est','pas','une','pour','que','dans']",
    "es": "['el','la','los','y','es','no','una','por','que','con']",
}
_HITS = {k: f"len(list_filter({_LOW_TOKS}, t -> list_contains({v}, t)))"
         for k, v in _SW.items()}

_PUNCT = ("CASE WHEN length(text) = 0 THEN 0.0 ELSE "
          "(length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g')))"
          "::DOUBLE / length(text) END")
_SWRATIO = (f"CASE WHEN {_NTOK} = 0 THEN 0.0 ELSE "
            f"{_HITS['en']}::DOUBLE / {_NTOK} END")
_QUALITY = (f"round((least({_NTOK}::DOUBLE / 20.0, 1.0) + "
            f"(1.0 - least({_PUNCT} * 4, 1.0)) + "
            f"least({_SWRATIO} * 5, 1.0)) / 3.0, 4)")
_LANG = (f"CASE WHEN greatest({_HITS['en']},{_HITS['de']},{_HITS['fr']},"
         f"{_HITS['es']}) = 0 THEN 'und' "
         f"WHEN {_HITS['en']} = greatest({_HITS['en']},{_HITS['de']},"
         f"{_HITS['fr']},{_HITS['es']}) THEN 'en' "
         f"WHEN {_HITS['de']} = greatest({_HITS['en']},{_HITS['de']},"
         f"{_HITS['fr']},{_HITS['es']}) THEN 'de' "
         f"WHEN {_HITS['fr']} = greatest({_HITS['en']},{_HITS['de']},"
         f"{_HITS['fr']},{_HITS['es']}) THEN 'fr' ELSE 'es' END")

_G8 = """
WITH d8 AS (
  SELECT doc_id, {toks} AS toks FROM documents
), g8 AS (
  SELECT doc_id,
    CASE WHEN len(toks) >= 8 THEN
      list_distinct(list_transform(range(len(toks)-7),
        i -> array_to_string(toks[i+1:i+8], ' ')))
    ELSE [] END AS grams
  FROM d8
)""".replace("{toks}", _TOKS)

_SHINGLES = """
WITH d0 AS (
  SELECT doc_id, {toks} AS toks FROM documents
), sh AS (
  SELECT doc_id,
    CASE WHEN len(toks) >= 3 THEN
      list_distinct(list_transform(range(len(toks)-2),
        i -> toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3]))
    WHEN len(toks) > 0 THEN [array_to_string(toks, ' ')]
    ELSE [] END AS shingles
  FROM d0
)""".replace("{toks}", _TOKS)


def oracle_sql() -> dict[str, str]:
    out = {name: (oracle if oracle is not None else spark_sql)
           for name, (spark_sql, oracle) in _SQL_CASES.items()}
    out.update(_base_oracle_sql())
    return out


def _base_oracle_sql() -> dict[str, str]:
    return {
        "http_api": """
            SELECT date_trunc('day', ts)::TIMESTAMP AS __time,
                   count(*) AS n, CAST(sum(user_id) AS BIGINT) AS s
            FROM events
            WHERE ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-01-08'
            GROUP BY 1""",
        "avatica_jdbc": """
            SELECT CAST(n_regionkey AS BIGINT) AS n_regionkey,
                   count(*) AS n, CAST(sum(n_nationkey) AS BIGINT) AS s
            FROM nation GROUP BY 1""",
        "overlord_ingest": """
            SELECT 'a' AS page, CAST(3 AS BIGINT) AS n
            UNION ALL
            SELECT 'b' AS page, CAST(7 AS BIGINT) AS n""",
        "protobuf_ingest": """
            SELECT * FROM (VALUES
              ('n0', 'CLICK',    CAST(0.0 AS DOUBLE)),
              ('n1', 'VIEW',     CAST(1.0 AS DOUBLE)),
              ('n2', 'PURCHASE', CAST(2.0 AS DOUBLE)),
              ('n3', 'CLICK',    CAST(3.0 AS DOUBLE)),
              ('n4', 'VIEW',     CAST(4.0 AS DOUBLE)),
              ('n5', 'PURCHASE', CAST(5.0 AS DOUBLE)))
              AS t(name, kind, value)
            ORDER BY name""",
        "lookup_tiered": """
            SELECT 'green' AS tiered, 'y' AS dflt,
                   CAST(NULL AS VARCHAR) AS miss""",
        "security_audit": """
            SELECT * FROM (VALUES
              ('before',     CAST(401 AS BIGINT),
               CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR)),
              ('authn_only', CAST(403 AS BIGINT),
               CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR)),
              ('granted',    CAST(200 AS BIGINT),
               CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR)),
              ('audit', CAST(NULL AS BIGINT), 'createUser', 'admin'),
              ('audit', CAST(NULL AS BIGINT), 'updateCredentials',
               'admin'),
              ('audit', CAST(NULL AS BIGINT), 'createUser', 'admin'),
              ('audit', CAST(NULL AS BIGINT), 'createRole', 'admin'),
              ('audit', CAST(NULL AS BIGINT), 'setPermissions',
               'admin'),
              ('audit', CAST(NULL AS BIGINT), 'assignRole', 'admin'))
              AS t(step, code, action, author)""",
        "ts_day": """
            SELECT date_trunc('day', ts)::TIMESTAMP AS __time, count(*) AS n,
                   round(sum(value), 3) AS total
            FROM events
            WHERE ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-02-01'
            GROUP BY 1""",
        "ts_day_tz": """
            SELECT (date_trunc('day', ts - INTERVAL 8 HOUR)
                    + INTERVAL 8 HOUR)::TIMESTAMP AS __time,
                   count(*) AS n, round(sum(value), 3) AS total
            FROM events
            WHERE ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-02-01'
            GROUP BY 1""",
        "range_join": """
            WITH bands AS (
              SELECT i * 25.0 AS lo, i * 25.0 + 24.999 AS hi,
                     'band_' || i AS band
              FROM range(8) t(i))
            SELECT b.band, count(*) AS n, round(sum(e.value), 3) AS v_sum
            FROM events e JOIN bands b
              ON e.value >= b.lo AND e.value <= b.hi
            GROUP BY 1 ORDER BY 1""",
        "asof_join": """
            SELECT c.event_id, round(p.value, 3) AS last_purchase_value
            FROM (SELECT event_id, user_id, ts FROM events
                  WHERE event_type = 'click') c
            ASOF LEFT JOIN (SELECT user_id, ts, value FROM events
                            WHERE event_type = 'purchase') p
              ON c.user_id = p.user_id AND c.ts >= p.ts
            ORDER BY c.event_id""",
        "vc_nested_field": """
            SELECT event_type,
                   sum(CAST(props->>'k' AS BIGINT))::BIGINT AS k_sum,
                   max(CAST(props->>'k' AS BIGINT)) AS k_max
            FROM events GROUP BY 1 ORDER BY 1""",
        "ts_grand_total": """
            SELECT date_trunc('day', ts)::TIMESTAMP AS __time,
                   count(*) AS n, round(sum(value), 3) AS total
            FROM events GROUP BY 1
            UNION ALL
            SELECT NULL AS __time, count(*) AS n,
                   round(sum(value), 3) AS total
            FROM events
            ORDER BY __time NULLS LAST""",
        "ts_zero_fill": """
            WITH spine AS (
              SELECT unnest(generate_series(TIMESTAMP '2023-12-29',
                     TIMESTAMP '2024-02-03', INTERVAL 1 DAY)) AS __time
            ), agg AS (
              SELECT date_trunc('day', ts) AS __time, count(*) AS n,
                     round(sum(value), 3) AS total
              FROM events
              WHERE ts >= TIMESTAMP '2023-12-29' AND ts < TIMESTAMP '2024-02-03'
              GROUP BY 1)
            SELECT s.__time, coalesce(a.n, 0) AS n, a.total
            FROM spine s LEFT JOIN agg a ON s.__time = a.__time
            WHERE s.__time < TIMESTAMP '2024-02-03'""",
        "ts_hour_filtered": """
            SELECT date_trunc('hour', ts) AS __time, count(*) AS n,
                   round(sum(value), 3) AS total
            FROM events
            WHERE ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-02-01'
              AND event_type = 'click'
            GROUP BY 1""",
        "ts_all_skip_empty": """
            SELECT CAST(count(*) AS BIGINT) AS n FROM events
            WHERE event_type = '__no_such_event__'
            HAVING count(*) > 0""",
        "ts_six_hour": """
            SELECT to_timestamp(floor(epoch(ts) / 21600) * 21600)::TIMESTAMP
                     AS __time,
                   count(*) AS n
            FROM events GROUP BY 1""",
        "ts_month_lineitem": """
            SELECT date_trunc('month', l_shipdate)::TIMESTAMP AS __time,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1995-01-01'
              AND l_shipdate < TIMESTAMP '1998-01-01'
            GROUP BY 1""",
        "topn_sum_value": """
            SELECT event_type, round(sum(value), 2) AS total
            FROM events GROUP BY 1
            ORDER BY sum(value) DESC, event_type ASC LIMIT 3""",
        "topn_approx_bound": """
            SELECT l_partkey, round(sum(l_extendedprice), 2) AS s,
                   true AS in_approx, true AS undercount_ok
            FROM lineitem GROUP BY 1
            ORDER BY sum(l_extendedprice) DESC, l_partkey LIMIT 20""",
        "topn_inverted": """
            SELECT event_type, count(*) AS n
            FROM events GROUP BY 1
            ORDER BY n ASC, event_type ASC LIMIT 3""",
        "topn_user": """
            SELECT user_id, count(*) AS n
            FROM events GROUP BY 1
            ORDER BY n DESC, user_id ASC LIMIT 10""",
        "gb_flag_status": """
            SELECT l_returnflag, l_linestatus,
                   round(sum(l_quantity), 2) AS sum_qty,
                   round(sum(l_extendedprice), 2) AS sum_price,
                   round(avg(l_discount), 4) AS avg_disc,
                   count(*) AS n
            FROM lineitem GROUP BY 1, 2""",
        "gb_having": """
            SELECT event_type, round(sum(value), 2) AS total
            FROM events GROUP BY 1 HAVING sum(value) > 100000.0""",
        "gb_order_limit": """
            SELECT p_brand, count(*) AS n FROM part GROUP BY 1
            ORDER BY n DESC, p_brand ASC LIMIT 10""",
        "gb_subtotals": """
            SELECT l_returnflag, l_linestatus,
                   round(sum(l_quantity), 2) AS sum_qty
            FROM lineitem
            GROUP BY GROUPING SETS ((l_returnflag),
                                    (l_returnflag, l_linestatus), ())""",
        "sql_lookup_fn": """
            SELECT CASE n_regionkey WHEN 0 THEN 'AFRICA'
                   WHEN 1 THEN 'AMERICA' WHEN 2 THEN 'ASIA'
                   WHEN 3 THEN 'EUROPE' ELSE 'MIDDLE EAST' END AS region,
                   count(*) AS n
            FROM nation GROUP BY 1 ORDER BY 1""",
        "time_boundary_max_only": """
            SELECT max(ts) AS maxTime FROM events
            WHERE event_type = 'purchase'""",
        "vc_hof_expression": """
            SELECT r_name,
                   CAST(len(replace(r_name, ' ', '')) AS BIGINT)
                     AS tok_chars,
                   count(*) AS n
            FROM region GROUP BY 1, 2 ORDER BY r_name""",
        "gb_having_dim_selector": """
            SELECT o_orderstatus, o_orderpriority, count(*) AS n
            FROM orders
            GROUP BY 1, 2
            HAVING o_orderstatus = 'P'
                OR (o_orderpriority = '1-URGENT' AND count(*) > 900)
            ORDER BY o_orderstatus, o_orderpriority""",
        "gb_month_grain": """
            SELECT date_trunc('week', ts)::TIMESTAMP AS __time,
                   event_type, count(*) AS n
            FROM events GROUP BY 1, 2 ORDER BY 1, 2""",
        "information_schema_tables": """
            SELECT t AS TABLE_NAME, 'TABLE' AS TABLE_TYPE FROM (
              SELECT 'documents' AS t UNION ALL SELECT 'events'
              UNION ALL SELECT 'nation' UNION ALL SELECT 'region') x
            ORDER BY TABLE_NAME""",
        "agg_on_information_schema": """
            SELECT 'customer' AS TABLE_NAME, 5 AS n_cols
            UNION ALL SELECT 'nation', 3
            UNION ALL SELECT 'region', 2
            ORDER BY TABLE_NAME""",
        "sys_segments_sql": """
            SELECT 'customer' AS datasource, count(*) AS num_rows
              FROM customer
            UNION ALL SELECT 'nation', count(*) FROM nation
            UNION ALL SELECT 'orders', count(*) FROM orders
            UNION ALL SELECT 'region', count(*) FROM region
            ORDER BY datasource""",
        "sys_tasks_supervisors": """
            SELECT * FROM (VALUES
              ('task_a', 'query', 'SUCCESS',
               CAST(1200 AS BIGINT), CAST(2 AS BIGINT)),
              ('task_b', 'query_controller', 'RUNNING',
               CAST(0 AS BIGINT), CAST(2 AS BIGINT)))
              t(task_id, type, status, duration, served_segments)
            ORDER BY task_id""",
        "search_regex_spec": """
            SELECT 'p_brand' AS dimension, p_brand AS value,
                   count(*) AS count
            FROM part WHERE regexp_matches(p_brand, 'Brand#[12]$')
            GROUP BY p_brand ORDER BY value""",
        "ts_postagg_ratio": """
            SELECT date_trunc('day', ts)::TIMESTAMP AS __time,
                   count(*) AS n,
                   round(sum(value), 2) AS total,
                   round(sum(value) / count(*), 4) AS avg_value
            FROM events
            WHERE ts >= TIMESTAMP '2024-01-01'
              AND ts < TIMESTAMP '2024-01-08'
            GROUP BY 1""",
        "topn_postagg_metric": """
            SELECT event_type, count(*) AS n,
                   round(sum(value), 2) AS total,
                   round(sum(value) / count(*), 4) AS avg_value
            FROM events GROUP BY event_type
            ORDER BY sum(value) / count(*) DESC LIMIT 3""",
        "scan_virtual_column": """
            SELECT l_orderkey, l_linenumber,
                   l_extendedprice * (1 - l_discount) AS rev
            FROM lineitem
            ORDER BY l_orderkey, l_linenumber LIMIT 10""",
        "lookup_filter_equals": f"""
            SELECT n_name FROM nation
            WHERE {_LK_PART} = 'ASIA' ORDER BY n_name""",
        "lookup_filter_in": f"""
            SELECT count(*) AS n FROM nation
            WHERE {_LK_PART} IN ('AFRICA', 'ASIA')""",
        "lookup_filter_is_null": f"""
            SELECT n_name FROM nation
            WHERE {_LK_PART} IS NULL ORDER BY n_name""",
        "lookup_filter_not_in": f"""
            SELECT count(*) AS n FROM nation
            WHERE {_LK_PART} NOT IN ('AFRICA')
              AND {_LK_PART} IS NOT NULL""",
        "lookup_coalesce_missing": f"""
            SELECT COALESCE({_LK_PART}, 'UNKNOWN') AS region,
                   count(*) AS n
            FROM nation GROUP BY 1 ORDER BY 1""",
        "lookup_of_concat": """
            SELECT CASE 'rk_' || CAST(n_regionkey AS VARCHAR)
                   WHEN 'rk_0' THEN 'africa' WHEN 'rk_1' THEN 'america'
                   WHEN 'rk_2' THEN 'asia' WHEN 'rk_3' THEN 'europe'
                   WHEN 'rk_4' THEN 'middle east' END AS region,
                   count(*) AS n
            FROM nation GROUP BY 1 ORDER BY 1""",
        "lookup_chained": f"""
            SELECT CASE {_LK_PART}
                   WHEN 'AFRICA' THEN 'AF' WHEN 'AMERICA' THEN 'AM'
                   WHEN 'ASIA' THEN 'AS' END AS cc,
                   count(*) AS n
            FROM nation GROUP BY 1 ORDER BY 1""",
        "lookup_function_of_lookup": f"""
            SELECT n_name FROM nation
            WHERE lower({_LK_PART}) = 'america' ORDER BY n_name""",
        "gb_time_format_extraction": """
            SELECT strftime(ts, '%Y-%m') AS ym, count(*) AS n
            FROM events GROUP BY 1 ORDER BY 1""",
        "gb_bucket_extraction": """
            SELECT (p_size // 10) * 10 AS size_bucket, count(*) AS n
            FROM part GROUP BY 1 ORDER BY 1""",
        "gb_cascade_extraction": """
            SELECT lower(substring(c_mktsegment, 1, 3)) AS seg3,
                   count(*) AS n
            FROM customer GROUP BY 1 ORDER BY 1""",
        "gb_extraction": """
            SELECT substr(p_type, 1, 5) AS pt5, count(*) AS n
            FROM part GROUP BY 1""",
        "gb_virtual_revenue": """
            SELECT l_returnflag,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
            FROM lineitem GROUP BY 1""",
        "gb_count_distinct": """
            SELECT event_type, count(DISTINCT user_id) AS users
            FROM events GROUP BY 1""",
        "gb_cardinality": """
            SELECT count(DISTINCT concat(event_type, user_id::VARCHAR))
                     AS combos
            FROM events""",
        "gb_first_last": """
            SELECT event_type,
                   arg_min(value, ts) AS first_value,
                   arg_max(value, ts) AS last_value
            FROM events GROUP BY 1""",
        "gb_filtered_agg": """
            SELECT event_type, count(*) AS n,
                   round(sum(value) FILTER (WHERE value >= 50.0), 2)
                     AS big_total
            FROM events GROUP BY 1""",
        "gb_postagg": """
            SELECT l_returnflag,
                   round(sum(l_extendedprice), 2) AS sum_price,
                   round(sum(l_quantity), 2) AS sum_qty,
                   round(sum(l_extendedprice) / sum(l_quantity), 4)
                     AS price_per_qty
            FROM lineitem GROUP BY 1""",
        "json_groupby": """
            SELECT json_extract_string(props, '$.k') AS k, count(*) AS n
            FROM events GROUP BY 1
            ORDER BY n DESC, k ASC LIMIT 10""",
        "scan_orders": """
            SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
            FROM orders WHERE o_totalprice >= 100000
            ORDER BY o_orderkey ASC LIMIT 100 OFFSET 10""",
        "scan_filters_matrix": """
            SELECT l_orderkey, l_linenumber, l_returnflag, l_quantity
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate < TIMESTAMP '1997-01-01'
              AND l_returnflag IN ('N', 'A')
              AND l_linestatus LIKE '%'
              AND regexp_matches(l_returnflag, '^[NA]$')
              AND l_quantity >= 30.0
            ORDER BY l_orderkey ASC, l_linenumber ASC LIMIT 200""",
        "search_event_type": """
            SELECT 'event_type' AS dimension, event_type AS value,
                   count(*) AS count
            FROM events WHERE contains(lower(event_type), 'i')
            GROUP BY event_type""",
        "time_boundary": """
            SELECT min(ts) AS minTime, max(ts) AS maxTime FROM events""",
        "dsmeta": """
            SELECT max(ts) AS maxIngestedEventTime FROM events""",
        "join_region_nation": """
            SELECT r.r_name AS region_name, count(*) AS nations
            FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
            GROUP BY 1""",
        "join_orders_lineitem": """
            SELECT o.o_orderpriority AS priority,
                   round(sum(l.l_extendedprice * (1 - l.l_discount)), 2)
                     AS revenue,
                   count(*) AS n
            FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
            WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
              AND l.l_shipdate < TIMESTAMP '1997-01-01'
            GROUP BY 1""",
        "join_semi": """
            SELECT o_orderstatus, count(*) AS n
            FROM orders
            WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
                                 WHERE l_quantity >= 49.0)
            GROUP BY 1""",
        "join_customer_nation": """
            SELECT n.n_name AS nation, count(*) AS customers,
                   round(sum(c.c_acctbal), 2) AS acctbal
            FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
            GROUP BY 1""",
        "union_counts": """
            SELECT count(*) AS n FROM events
            UNION ALL SELECT count(*) AS n FROM orders""",
        "unnest_tokens": """
            SELECT token, count(*) AS n FROM (
              SELECT unnest(string_split(text, ' ')) AS token FROM documents)
            WHERE length(token) >= 6
            GROUP BY 1 ORDER BY n DESC, token ASC LIMIT 20""",
        "window_rank": """
            SELECT * FROM (
              SELECT event_type, user_id, v,
                     row_number() OVER (PARTITION BY event_type
                                        ORDER BY v DESC, user_id ASC) AS rn
              FROM (SELECT event_type, user_id, round(sum(value), 3) AS v
                    FROM events GROUP BY 1, 2))
            WHERE rn <= 3""",
        "window_running_sum": """
            SELECT event_type, __time, v,
                   round(sum(v) OVER (PARTITION BY event_type ORDER BY __time
                         ROWS UNBOUNDED PRECEDING), 3) AS run_total,
                   lag(v) OVER (PARTITION BY event_type ORDER BY __time)
                     AS prev_v
            FROM (SELECT event_type, date_trunc('day', ts)::TIMESTAMP AS __time,
                         round(sum(value), 3) AS v
                  FROM events GROUP BY 1, 2)""",
        "window_lead_lag_rank": """
            SELECT o_orderpriority, o_orderstatus, n,
                   rank() OVER w AS rnk,
                   dense_rank() OVER w AS drnk,
                   lead(n) OVER w AS next_n
            FROM (SELECT o_orderpriority, o_orderstatus, count(*) AS n
                  FROM orders GROUP BY 1, 2)
            WINDOW w AS (PARTITION BY o_orderpriority
                         ORDER BY n DESC, o_orderstatus ASC)""",
        "dedup_exact": f"""
            SELECT md5({_NORM}) AS fp, min(doc_id) AS keep_id,
                   count(*) AS group_size
            FROM documents GROUP BY 1""",
        # r13: the split bucket is the first 60 bits of md5('0|'||key)
        # (druid_spark/datapipe/sample.py assign_splits) — portable,
        # so the assignment is pinned value-for-value, not rows-only
        "split_assign": f"""
            WITH keyed AS (
              SELECT md5({_NORM}) AS cluster_key FROM documents),
            b AS (
              SELECT cluster_key,
                     CAST(('0x' || substring(md5('0|' || cluster_key),
                                             1, 15)) AS BIGINT)
                       % 1000000 AS bucket
              FROM keyed),
            s AS (
              SELECT cluster_key,
                     CASE WHEN bucket < 980000 THEN 'train'
                          WHEN bucket < 990000 THEN 'val'
                          ELSE 'test' END AS split
              FROM b)
            SELECT split, count(*) AS docs,
                   count(DISTINCT cluster_key) AS clusters
            FROM s GROUP BY split ORDER BY split""",
        "repetition_profile": """
            WITH t AS (SELECT doc_id,
                              string_split(regexp_replace(trim(text),
                                  '\\s+', ' ', 'g'), ' ') AS ts
                       FROM documents),
            dup AS (SELECT doc_id, len(ts) AS n_tokens,
                           len([i for i in range(2, len(ts) + 1)
                                if ts[i] = ts[i-1]]) AS n_dup
                    FROM t),
            bi AS (SELECT doc_id, ts[i] || ' ' || ts[i+1] AS bg
                   FROM t, unnest(range(1, len(ts))) AS r(i)),
            pd AS (SELECT doc_id, max(c) AS top_c, sum(c) AS n_bi
                   FROM (SELECT doc_id, bg, count(*) AS c
                         FROM bi GROUP BY 1, 2)
                   GROUP BY 1)
            SELECT d.doc_id, d.n_tokens,
                   round(n_dup / greatest(d.n_tokens - 1, 1)::DOUBLE, 4)
                   AS dup_word_ratio,
                   round(coalesce(top_c / n_bi::DOUBLE, 0), 4)
                   AS top_bigram_frac
            FROM dup d LEFT JOIN pd USING (doc_id)
            ORDER BY doc_id""",
        "pii_redact": r"""
            WITH aug AS (
              SELECT lang,
                substr(text, 1, 40) || ' contact u' || doc_id ||
                '@example.com ip 10.0.' || (doc_id % 256) || '.' ||
                ((doc_id * 7) % 256) || ' ssn 123-45-' ||
                lpad((doc_id % 10000)::VARCHAR, 4, '0') ||
                ' tel 555-123-4567 card 4111111111111111' AS t
              FROM documents)
            SELECT lang, count(*) AS docs,
              sum(len(regexp_extract_all(t,
                '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')))::BIGINT AS emails,
              sum(len(regexp_extract_all(t,
                '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')))::BIGINT AS ips,
              sum(len(regexp_extract_all(t,
                '\b\d{3}-\d{2}-\d{4}\b')))::BIGINT AS ssns,
              sum(len(regexp_extract_all(t,
                '\b\d{3}[-.]\d{3}[-.]\d{4}\b')))::BIGINT AS phones,
              sum(len(regexp_extract_all(t, '\b\d{13,19}\b')))::BIGINT AS cards,
              sum(length(
                regexp_replace(regexp_replace(regexp_replace(
                regexp_replace(regexp_replace(t,
                  '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
                  '[EMAIL]', 'g'),
                  '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '[IP]', 'g'),
                  '\b\d{3}-\d{2}-\d{4}\b', '[SSN]', 'g'),
                  '\b\d{3}[-.]\d{3}[-.]\d{4}\b', '[PHONE]', 'g'),
                  '\b\d{13,19}\b', '[CARD]', 'g')))::BIGINT AS red_len
            FROM aug GROUP BY lang ORDER BY lang""",
        "boilerplate_removal": """
            WITH n AS (SELECT count(*) AS n_docs FROM documents),
            lines AS (SELECT doc_id,
                             unnest(string_split(text, chr(10))) AS line,
                             unnest(range(0, len(string_split(text,
                                 chr(10))))) AS pos
                      FROM documents),
            boiler AS (SELECT lkey FROM (
                         SELECT DISTINCT doc_id,
                                md5(lower(trim(line))) AS lkey
                         FROM lines WHERE trim(line) <> '')
                       GROUP BY lkey
                       HAVING count(*) >= greatest(2, CAST(ceil(
                           0.25 * (SELECT n_docs FROM n)) AS BIGINT))),
            kept AS (SELECT l.* FROM lines l
                     LEFT JOIN boiler b
                       ON md5(lower(trim(l.line))) = b.lkey
                     WHERE b.lkey IS NULL),
            clean AS (SELECT doc_id,
                             string_agg(line, chr(10) ORDER BY pos)
                             AS clean_text
                      FROM kept GROUP BY doc_id)
            SELECT d.doc_id,
                   md5(coalesce(c.clean_text, '')) AS clean_md5
            FROM documents d LEFT JOIN clean c USING (doc_id)
            ORDER BY d.doc_id""",
        "dedup_jaccard": _SHINGLES + """,
            inv AS (SELECT doc_id, len(shingles) AS n,
                           unnest(shingles) AS s FROM sh
                    WHERE len(shingles) > 0),
            pairs AS (
              SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                     a.n AS n_a, b.n AS n_b, count(*) AS inter
              FROM inv a JOIN inv b ON a.s = b.s AND a.doc_id < b.doc_id
              GROUP BY 1, 2, 3, 4)
            SELECT id_a, id_b,
                   round(inter::DOUBLE / (n_a + n_b - inter), 4) AS jaccard
            FROM pairs
            WHERE inter::DOUBLE / (n_a + n_b - inter) >= 0.8""",
        "sample_stratified": """
            SELECT stratum, doc_id FROM (
              SELECT lang || '|' || source AS stratum, doc_id,
                     row_number() OVER (PARTITION BY lang, source
                                        ORDER BY doc_id) AS rn
              FROM documents) t
            WHERE rn <= 3 ORDER BY 1, 2""",
        "temperature_rates": """
            WITH c AS (SELECT lang, COUNT(*) AS n FROM documents
                       GROUP BY lang),
            s AS (SELECT lang, n, n::DOUBLE / SUM(n) OVER () AS p
                  FROM c),
            r AS (SELECT lang, n, p, POW(p, 0.3 - 1.0) AS raw FROM s)
            SELECT lang, n, ROUND(p, 6) AS p,
                   ROUND(raw / MAX(raw) OVER (), 6) AS rate
            FROM r ORDER BY lang""",
        "contamination": _G8 + """,
            tr AS (SELECT DISTINCT unnest(grams) AS g FROM g8
                   WHERE doc_id % 17 != 0),
            evg AS (SELECT doc_id AS id, unnest(grams) AS g FROM g8
                    WHERE doc_id % 17 = 0)
            SELECT evg.id, count(*) AS n_grams, count(tr.g) AS n_hit,
                   round(count(tr.g)::DOUBLE / count(*), 4) AS hit_rate
            FROM evg LEFT JOIN tr ON evg.g = tr.g
            GROUP BY 1 ORDER BY 1""",
        "streaming_rollup": """
            SELECT date_trunc('minute', ts) AS __time, event_type,
                   count(*) AS n, sum(value) AS v
            FROM events GROUP BY 1, 2 ORDER BY 1, 2""",
        "kafka_ingest": """
            SELECT event_id, ts, user_id, event_type, value
            FROM events WHERE event_id % 97 = 0 ORDER BY event_id""",
        "kinesis_ingest": """
            SELECT event_id, ts, user_id, event_type, value
            FROM events WHERE event_id % 101 = 0 ORDER BY event_id""",
        "sessionize": """
            WITH e AS (SELECT user_id, ts FROM events WHERE user_id < 50),
            g AS (SELECT user_id, ts,
                    CASE WHEN lag(ts) OVER w IS NULL
                           OR ts - lag(ts) OVER w >= INTERVAL 1 HOUR
                         THEN 1 ELSE 0 END AS new_s
                  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
            s AS (SELECT user_id,
                    sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                     ROWS UNBOUNDED PRECEDING) AS sid
                  FROM g),
            per AS (SELECT user_id, sid, count(*) AS cnt
                    FROM s GROUP BY 1, 2)
            SELECT user_id, count(*) AS n_sessions,
                   max(cnt) AS max_events
            FROM per GROUP BY 1 ORDER BY 1""",
        "dedup_clusters": _SHINGLES.replace(
            "WITH ", "WITH RECURSIVE ", 1) + """,
            inv AS (SELECT doc_id, len(shingles) AS n,
                           unnest(shingles) AS s FROM sh
                    WHERE len(shingles) > 0),
            jp AS (
              SELECT id_a, id_b FROM (
                SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                       a.n AS n_a, b.n AS n_b, count(*) AS inter
                FROM inv a JOIN inv b ON a.s = b.s AND a.doc_id < b.doc_id
                GROUP BY 1, 2, 3, 4)
              WHERE inter::DOUBLE / (n_a + n_b - inter) >= 0.8),
            edges AS (SELECT id_a AS a, id_b AS b FROM jp
                      UNION SELECT id_b, id_a FROM jp),
            reach AS (SELECT a, b FROM edges
                      UNION SELECT r.a, e.b FROM reach r
                            JOIN edges e ON r.b = e.a AND r.a <> e.b),
            comp AS (SELECT a, min(b) AS mn FROM reach GROUP BY a)
            SELECT d.doc_id,
                   coalesce(least(d.doc_id, c.mn), d.doc_id) AS cluster_id
            FROM documents d LEFT JOIN comp c ON d.doc_id = c.a
            ORDER BY 1""",
        "neardup_embedding": """
            WITH base AS (SELECT vec_id, embedding::DOUBLE[] AS e
                          FROM embeddings),
            aug AS (SELECT vec_id, e FROM base
                    UNION ALL
                    SELECT vec_id + 100000,
                           list_transform(e, x -> x * 0.5) FROM base)
            SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                   round(list_cosine_similarity(a.e, b.e), 4) AS cos
            FROM aug a, aug b
            WHERE a.vec_id < b.vec_id
              AND round(list_cosine_similarity(a.e, b.e), 4) >= 0.95""",
        "neardup_embedding_exact": """
            SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                   round(list_cosine_similarity(a.embedding::DOUBLE[],
                         b.embedding::DOUBLE[]), 4) AS cos
            FROM embeddings a, embeddings b
            WHERE a.vec_id < b.vec_id
              AND round(list_cosine_similarity(a.embedding::DOUBLE[],
                        b.embedding::DOUBLE[]), 4) >= 0.45""",
        "sys_schema": """
            SELECT * FROM (VALUES
              ('nation', 'n_nationkey', 1, 'BIGINT'),
              ('nation', 'n_name', 2, 'VARCHAR'),
              ('nation', 'n_regionkey', 3, 'BIGINT'))
              AS t("TABLE_NAME", "COLUMN_NAME", "ORDINAL_POSITION",
                   "DATA_TYPE")
            ORDER BY "ORDINAL_POSITION" """,
        "sim_lsh_recall": "SELECT 10 AS k, true AS recall_ok",
        "sim_ivf_recall": "SELECT 10 AS k, true AS recall_ok",
        "sim_quantized_recall": "SELECT 10 AS k, true AS recall_ok",
        "sim_topk": """
            SELECT vec_id,
                   round(list_cosine_similarity(embedding::DOUBLE[],
                         (SELECT embedding::DOUBLE[] FROM embeddings
                          WHERE vec_id = 0)), 4) AS cos
            FROM embeddings
            ORDER BY cos DESC, vec_id ASC LIMIT 10""",
        "doc_length_profile": """
            SELECT lang, count(*) AS n_docs,
                   round(avg(n_chars), 2) AS mean_chars,
                   quantile_cont(n_chars, 0.5) AS p50,
                   quantile_cont(n_chars, 0.9) AS p90
            FROM documents GROUP BY lang ORDER BY lang""",
        "dedup_rate_by_source": """
            SELECT source, CAST(SUM(c) AS BIGINT) AS n_docs,
                   CAST(SUM(CASE WHEN c > 1 THEN c ELSE 0 END)
                        AS BIGINT) AS n_duped
            FROM (SELECT source, text, count(*) AS c
                  FROM documents GROUP BY source, text) t
            GROUP BY source ORDER BY source""",
        "text_profile": f"""
            SELECT doc_id, {_NTOK} AS n_tokens,
                   round({_PUNCT}, 4) AS punct_ratio,
                   round({_SWRATIO}, 4) AS stopword_ratio,
                   {_QUALITY} AS quality,
                   {_LANG} AS lang_pred,
                   md5({_NORM}) AS fingerprint
            FROM documents""",
        "text_quality_by_source": f"""
            SELECT source, count(*) AS n,
                   round(sum({_QUALITY}), 3) AS quality_sum,
                   sum({_NTOK})::BIGINT AS tokens
            FROM documents GROUP BY 1""",
        "vocab_topk": r"""
            SELECT token, COUNT(*) AS n FROM (
              SELECT unnest(string_split_regex(lower(text), '\s+'))
                     AS token FROM documents)
            WHERE token != ''
            GROUP BY token ORDER BY n DESC, token LIMIT 50""",
        "char_entropy": """
            SELECT doc_id, ROUND(-SUM(p * log2(p)), 6) AS ent FROM (
              SELECT doc_id,
                     COUNT(*)::DOUBLE
                       / MAX(n) OVER (PARTITION BY doc_id) AS p
              FROM (SELECT doc_id,
                           unnest(string_split_regex(text, '')) AS c,
                           length(text) AS n
                    FROM documents)
              GROUP BY doc_id, c, n)
            GROUP BY doc_id ORDER BY doc_id LIMIT 200""",
        "repeated_ngrams": r"""
            WITH toks AS (
              SELECT doc_id,
                     string_split_regex(lower(text), '\s+') AS t
              FROM documents),
            grams AS (
              SELECT doc_id, array_to_string(t[i:i+4], ' ') AS ngram
              FROM toks, LATERAL (
                SELECT unnest(generate_series(1, len(t) - 4)) AS i) s
              WHERE len(t) >= 5)
            SELECT ngram, COUNT(DISTINCT doc_id) AS docs,
                   COUNT(*) AS occurrences
            FROM grams GROUP BY ngram HAVING docs >= 3
            ORDER BY docs DESC, occurrences DESC, ngram LIMIT 50""",
        "pipeline_quality_dedup": f"""
            SELECT lang, count(*) AS n_kept,
                   count(DISTINCT md5({_NORM})) AS n_uniq
            FROM documents
            WHERE {_QUALITY} >= 0.5 AND {_NTOK} >= 10
            GROUP BY 1 ORDER BY 1""",
        "url_extract": r"""
            WITH u AS (
              SELECT 'HTTPS://Sub' || (doc_id % 5) || '.Example' ||
                     (doc_id % 3) || '.com:443/p/' || (doc_id % 20) ||
                     '/#frag' AS url
              FROM documents),
            p AS (
              SELECT
                regexp_replace(lower(regexp_extract(url,
                  '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)', 1)),
                  ':[0-9]+$', '') AS host,
                regexp_extract(url,
                  '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]+([^?#]*)', 1) AS path,
                lower(regexp_extract(url,
                  '^([a-zA-Z][a-zA-Z0-9+.-]*)://', 1)) AS scheme,
                regexp_replace(regexp_replace(regexp_replace(url,
                  '#.*$', ''), ':(80|443)/', '/'), '/+$', '') AS stripped
              FROM u)
            SELECT regexp_extract(host, '([^.]+\.[^.]+)$', 1) AS domain,
                   count(*) AS n, count(DISTINCT host) AS hosts,
                   count(DISTINCT path) AS paths,
                   count(DISTINCT scheme || '://' || host ||
                     regexp_extract(stripped,
                       '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]+(.*)$', 1))
                     AS uniq_urls
            FROM p GROUP BY 1 ORDER BY 1""",
        "gb_quantile_sketch": """
            SELECT l_returnflag,
                   round(quantile_cont(l_quantity, 0.5), 4) AS p50,
                   round(quantile_cont(l_quantity, 0.25), 4) AS q25,
                   round(quantile_cont(l_quantity, 0.75), 4) AS q75,
                   count(*) FILTER (l_quantity < 10) AS h0,
                   count(*) FILTER (l_quantity >= 10 AND l_quantity < 25) AS h1,
                   count(*) FILTER (l_quantity >= 25 AND l_quantity < 40) AS h2,
                   count(*) FILTER (l_quantity >= 40) AS h3,
                   round(CAST(count(*) FILTER (l_quantity < 25) AS DOUBLE)
                         / count(*), 6) AS rank25
            FROM lineitem GROUP BY 1""",
        "theta_setops": """
            SELECT
              CAST((SELECT count(*) FROM
                    (SELECT DISTINCT user_id FROM events WHERE event_type = 'click'
                     INTERSECT
                     SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'))
                   AS DOUBLE) AS "both",
              CAST((SELECT count(*) FROM
                    (SELECT DISTINCT user_id FROM events WHERE event_type = 'click'
                     UNION
                     SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'))
                   AS DOUBLE) AS either,
              CAST((SELECT count(*) FROM
                    (SELECT DISTINCT user_id FROM events WHERE event_type = 'click'
                     EXCEPT
                     SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'))
                   AS DOUBLE) AS click_only,
              CAST((SELECT count(DISTINCT user_id) FROM events
                    WHERE event_type = 'click') AS DOUBLE) AS clickers""",
        "tuple_setops": """
            WITH a AS (SELECT l_orderkey AS k, SUM(l_quantity) AS v
                       FROM lineitem WHERE l_returnflag = 'R' GROUP BY 1),
                 b AS (SELECT l_orderkey AS k, SUM(l_quantity) AS v
                       FROM lineitem WHERE l_returnflag = 'A' GROUP BY 1)
            SELECT
              CAST((SELECT count(*) FROM a JOIN b USING (k)) AS DOUBLE)
                AS inter,
              CAST((SELECT count(*) FROM
                    (SELECT k FROM a UNION SELECT k FROM b)) AS DOUBLE)
                AS uni,
              CAST((SELECT count(*) FROM a
                    WHERE k NOT IN (SELECT k FROM b)) AS DOUBLE) AS anotb,
              round(CAST((SELECT SUM(a.v + b.v) FROM a JOIN b USING (k))
                         AS DOUBLE), 2) AS isum1,
              round(CAST((SELECT SUM(v) FROM
                          (SELECT v FROM a UNION ALL SELECT v FROM b))
                         AS DOUBLE), 2) AS usum1,
              (SELECT count(*) FROM a
               WHERE k NOT IN (SELECT k FROM b)) AS n_not""",
        "gb_fixed_histogram": """
            SELECT event_type,
                   count(*) FILTER (value >= 0 AND value < 100) AS b0,
                   count(*) FILTER (value >= 100 AND value < 200) AS b1,
                   count(*) FILTER (value >= 200 AND value < 300) AS b2,
                   count(*) FILTER (value >= 300 AND value < 400) AS b3,
                   count(*) FILTER (value >= 400) AS b4
            FROM events GROUP BY 1""",
        "gb_variance": """
            SELECT l_returnflag,
                   round(var_samp(l_quantity), 4) AS var_q,
                   round(var_pop(l_quantity), 4) AS varp_q,
                   round(stddev_samp(l_quantity), 4) AS sd_q
            FROM lineitem GROUP BY 1""",
        "lookup_join": """
            SELECT CASE n_regionkey
                     WHEN 0 THEN 'AFRICA' WHEN 1 THEN 'AMERICA'
                     WHEN 2 THEN 'ASIA' WHEN 3 THEN 'EUROPE'
                     WHEN 4 THEN 'MIDDLE EAST' END AS region_name,
                   count(*) AS nations
            FROM nation GROUP BY 1""",
        "dedup_canonicalize": r"""
            SELECT doc_id, n_chars FROM (
              SELECT doc_id, n_chars,
                     ROW_NUMBER() OVER (
                       PARTITION BY md5(lower(regexp_replace(
                         trim(text), '\s+', ' ', 'g')))
                       ORDER BY n_chars DESC, doc_id) AS rk
              FROM documents) t
            WHERE rk = 1 ORDER BY doc_id""",
        "shard_pack": r"""
            SELECT doc_id, CAST(ntok AS BIGINT) AS ntok,
                   CAST(FLOOR((SUM(ntok) OVER (ORDER BY doc_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     - ntok) / 2000.0) AS BIGINT) AS shard_id
            FROM (SELECT doc_id,
                         CASE WHEN length(trim(text)) = 0 THEN 0
                              ELSE length(regexp_split_to_array(
                                     trim(text), '\s+')) END AS ntok
                  FROM documents)
            ORDER BY doc_id""",
        "lookup_schema_table": """
            SELECT r.r_name AS region_name,
                   CAST(COUNT(*) AS BIGINT) AS nations
            FROM nation n JOIN region r
              ON n.n_regionkey = r.r_regionkey
            GROUP BY 1 ORDER BY 1""",
        "sql_pinned_now": """
            SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   '2024-01-15' AS today
            FROM events
            WHERE ts >= TIMESTAMP '2024-01-13 00:00:00'
              AND ts < TIMESTAMP '2024-01-15 00:00:00'""",
        "lookup_join_union_tables": """
            SELECT r.r_name AS region_name,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM (SELECT n_regionkey AS k FROM nation
                  UNION ALL SELECT r_regionkey FROM region) u
            JOIN region r ON u.k = r.r_regionkey
            WHERE r.r_name <> 'AFRICA'
            GROUP BY 1 ORDER BY 1""",
        "lookup_join_backwards": """
            SELECT r.r_name AS region_name,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
            WHERE r.r_name <> 'ASIA'
            GROUP BY 1 ORDER BY 1""",
        "lookup_join_subquery_extract": """
            SELECT n.n_name, substring(r.r_name, 1, 3) AS sk
            FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
            ORDER BY n.n_name""",
        "gb_order_alphanumeric": """
            SELECT concat('s', CAST(p_size AS VARCHAR)) AS sz, count(*) AS n
            FROM part GROUP BY 1
            ORDER BY CAST(regexp_extract(sz, '[0-9]+') AS INT) LIMIT 12""",
        "scan_offset": """
            SELECT o_orderkey, o_custkey, o_totalprice FROM orders
            ORDER BY o_orderkey LIMIT 20 OFFSET 10""",
        "sql_druid_functions": """
            SELECT date_trunc('day', ts)::TIMESTAMP AS d, count(*) AS n,
                   max_by(event_type, ts) AS last_type,
                   round(sum(value) / count(*), 4) AS avg_v
            FROM events
            WHERE ts >= TIMESTAMP '2024-01-05' AND ts < TIMESTAMP '2024-01-12'
            GROUP BY 1""",
        "sql_array_agg": """
            SELECT o_orderpriority,
                   array_to_string(list_sort(list(DISTINCT o_orderstatus)), ',')
                     AS statuses,
                   count(*) AS n
            FROM orders GROUP BY 1""",
        "spatial_filter": """
            SELECT count(*) AS n FROM part
            WHERE p_size BETWEEN 10 AND 30
              AND (p_partkey % 100) BETWEEN 20 AND 60""",
        "spatial_polygon": """
            SELECT count(*) AS n FROM part
            WHERE abs(p_size - 25) + abs(p_partkey % 100 - 50) <= 20""",
        "spatial_radius": """
            SELECT count(*) AS n FROM part
            WHERE (p_size - 25.0) * (p_size - 25.0)
                  + (p_partkey % 100 - 50.0) * (p_partkey % 100 - 50.0)
                  <= 225.0""",
        "restrict_datasource": """
            SELECT o_orderstatus, count(*) AS n FROM orders
            WHERE o_orderpriority = '1-URGENT' AND o_totalprice >= 1000
            GROUP BY 1 ORDER BY 1""",
        "sql_semantics": """
            SELECT isodow(ts) AS isodow,
                   count(*) AS n,
                   date_trunc('month', min(ts)) + INTERVAL 1 MONTH
                     AS ceil_month,
                   max(event_id) AS max_id,
                   floor((count(*) / 7.0) * 10) / 10 AS n7,
                   CASE WHEN count(*) < 1024
                        THEN printf('%.2f MiB', count(*) / 1.0)
                        ELSE printf('%.2f GiB', count(*) / 1024.0) END
                     AS hr
            FROM events
            WHERE ts >= TIMESTAMP '2024-01-01'
              AND ts < TIMESTAMP '2024-02-01'
            GROUP BY 1 ORDER BY 1""",
        "tpch_q1": """
            SELECT l_returnflag, l_linestatus,
                   ROUND(SUM(l_quantity), 2) AS sum_qty,
                   ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
                   ROUND(SUM(l_extendedprice * (1 - l_discount)), 2)
                     AS sum_disc_price,
                   ROUND(AVG(l_quantity), 4) AS avg_qty,
                   COUNT(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02'
            GROUP BY l_returnflag, l_linestatus
            ORDER BY l_returnflag, l_linestatus""",
        "tpch_q3": """
            SELECT l_orderkey,
                   ROUND(SUM(l_extendedprice * (1 - l_discount)), 2)
                     AS revenue,
                   o_orderdate, o_orderpriority
            FROM customer JOIN orders ON c_custkey = o_custkey
                          JOIN lineitem ON l_orderkey = o_orderkey
            WHERE c_mktsegment = 'BUILDING'
              AND o_orderdate < TIMESTAMP '1996-03-15'
              AND l_shipdate > TIMESTAMP '1996-03-15'
            GROUP BY l_orderkey, o_orderdate, o_orderpriority
            ORDER BY revenue DESC, o_orderdate, l_orderkey LIMIT 10""",
        "tpch_q6": """
            SELECT ROUND(SUM(l_extendedprice * l_discount), 2) AS revenue
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate < TIMESTAMP '1997-01-01'
              AND l_discount BETWEEN 0.03 AND 0.07
              AND l_quantity < 24""",
        "sql_extern": """
            SELECT name, CAST(sum(x) AS BIGINT) AS sx
            FROM (VALUES ('a', 1), ('b', 2), ('a', 3)) t(name, x)
            GROUP BY 1 ORDER BY 1""",
        "gb_array_dim": """
            SELECT array_to_string(string_split(text, ' ')[1:2], ' ')
                     AS lead_toks,
                   count(*) AS n
            FROM documents GROUP BY string_split(text, ' ')[1:2]
            HAVING count(*) > 1 ORDER BY string_split(text, ' ')[1:2]""",
        "sql_unnest": """
            SELECT token, count(*) AS n FROM (
              SELECT unnest(string_split(text, ' ')) AS token
              FROM documents) t
            WHERE token LIKE 's%' GROUP BY 1 ORDER BY 1""",
        "gb_hll_expr": """
            SELECT o_orderstatus,
                   CAST(count(DISTINCT o_custkey) AS DOUBLE) AS uniq
            FROM orders GROUP BY 1 ORDER BY 1""",
        "bloom_filter": """
            SELECT count(*) AS n, sum(o_totalprice) AS rev FROM orders
            WHERE o_custkey IN (SELECT c_custkey FROM customer
                                WHERE c_mktsegment = 'BUILDING')""",
        "tuple_sketch": """
            SELECT l_returnflag,
                   CAST(count(DISTINCT l_orderkey) AS DOUBLE) AS orders_est,
                   [round(sum(l_quantity), 2),
                    round(sum(l_extendedprice), 2)] AS msums
            FROM lineitem GROUP BY 1 ORDER BY 1""",
        "search_fragment": """
            SELECT dimension, value, count(*) AS count FROM (
              SELECT 'p_type' AS dimension, p_type AS value FROM part
              UNION ALL
              SELECT 'p_brand', p_brand FROM part) t
            WHERE value LIKE '%Brand%' AND value LIKE '%#1%'
            GROUP BY 1, 2 ORDER BY 1, 2""",
        "union_datasource": """
            SELECT event_type, count(*) AS n FROM
              (SELECT * FROM events UNION ALL SELECT * FROM events) u
            GROUP BY 1""",
        "filter_datasource": """
            SELECT count(*) AS n, round(sum(value), 3) AS total
            FROM events WHERE event_type IN ('click', 'view')""",
        "gb_prefix_filtered": """
            SELECT CASE WHEN p_brand LIKE 'Brand#1%' THEN p_brand END AS c,
                   count(*) AS n
            FROM part GROUP BY 1""",
        "projection_count_distinct": """
            SELECT date_trunc('day', ts)::TIMESTAMP AS __time, event_type,
                   count(DISTINCT user_id) AS users
            FROM events GROUP BY 1, 2""",
        "hll_sketch_vs_exact": """
            SELECT event_type, count(DISTINCT user_id) AS exact_users,
                   true AS est_ok
            FROM events GROUP BY 1 ORDER BY 1""",
        "hyperunique_parity": """
            SELECT event_type, count(DISTINCT user_id) AS exact_users,
                   true AS est_ok, true AS parity_ok
            FROM events GROUP BY 1 ORDER BY 1""",
        # round-12 semantic pins: the inline fixtures are reproduced
        # in the oracle via VALUES so DuckDB computes the same facts
        "r12_mvd_any_element": """
            SELECT COUNT(*) AS n_b_or_d,
                   CAST(SUM(m) AS BIGINT) AS sum_m
            FROM (VALUES (['a','b'], 1), (['b','c'], 2),
                         (['d'], 3), (NULL, 4)) t(tags, m)
            WHERE list_contains(tags, 'b')
               OR list_contains(tags, 'd')""",
        "r12_earliest_unnest_tiebreak": """
            SELECT * FROM (VALUES ('x', 'a'), ('y', 'b'))
                 t(who, first_elem) ORDER BY who""",
        "r12_json_empty_leaves": """
            SELECT FALSE AS empty_array_is_null,
                   TRUE AS empty_obj_is_null,
                   '$' AS prim_arr_paths""",
        "r12_complex_hash_order": """
            SELECT '[[true,false,null],[1,2,null]]' AS first_asc,
                   CAST(1 AS BIGINT) AS cnt""",
        "agg_size_cap": """
            SELECT CAST(length(string_agg(o_orderstatus, '|'))
                        AS BIGINT) AS n_cat,
                   CAST(count(DISTINCT o_orderstatus) AS BIGINT)
                       AS n_distinct,
                   true AS default_cap_fires,
                   true AS explicit_cap_fires
            FROM orders""",
        "sql_input_source": """
            SELECT r_regionkey, r_name, true AS lookup_ok
            FROM region ORDER BY r_regionkey""",
        "single_value": """
            SELECT r_name AS v FROM region WHERE r_regionkey = 0""",
        "gb_histogram": """
            SELECT event_type,
                   [count(*) FILTER (value::FLOAT > 0 AND value::FLOAT <= 25),
                    count(*) FILTER (value::FLOAT > 25 AND value::FLOAT <= 50),
                    count(*) FILTER (value::FLOAT > 50 AND value::FLOAT <= 75),
                    count(*) FILTER (value::FLOAT > 75 AND value::FLOAT <= 100)
                   ] AS counts,
                   round(min(value::FLOAT)::DOUBLE, 3) AS vmin,
                   round(max(value::FLOAT)::DOUBLE, 3) AS vmax
            FROM events GROUP BY 1 ORDER BY 1""",
        "projection_hll_sketch": """
            SELECT date_trunc('day', ts)::TIMESTAMP AS __time, event_type,
                   count(DISTINCT user_id) AS exact_users, true AS est_ok
            FROM events GROUP BY 1, 2 ORDER BY 1, 2""",
        "projection_theta_sketch": """
            SELECT date_trunc('day', ts)::TIMESTAMP AS __time, event_type,
                   count(DISTINCT user_id) AS exact_users, true AS est_ok
            FROM events GROUP BY 1, 2 ORDER BY 1, 2""",
        "kll_quantile_merge": """
            SELECT l_returnflag,
                   round(quantile_cont(l_extendedprice, 0.5), 0)::BIGINT
                     AS exact_median,
                   true AS rank_ok
            FROM lineitem GROUP BY 1 ORDER BY 1""",
        "sql_ds_hll": """
            SELECT event_type, count(DISTINCT user_id) AS exact_users,
                   true AS est_ok
            FROM events GROUP BY 1 ORDER BY 1""",
        "theta_kmv_vs_exact": """
            SELECT l_returnflag, count(DISTINCT l_orderkey) AS exact_orders,
                   true AS est_ok
            FROM lineitem GROUP BY 1 ORDER BY 1""",
        "projection_kmv_sketch": """
            SELECT date_trunc('day', ts)::TIMESTAMP AS __time, event_type,
                   count(DISTINCT user_id) AS exact_users, true AS est_ok
            FROM events GROUP BY 1, 2 ORDER BY 1, 2""",
        "tuple_state_merge": """
            SELECT event_type,
                   count(DISTINCT user_id) AS users,
                   round(sum(value), 2) AS value_sum
            FROM events GROUP BY 1 ORDER BY 1""",
        "projection_quantile_sample": """
            SELECT event_type,
                   round(quantile_cont(value, 0.5), 3) AS exact_med,
                   true AS rank_ok
            FROM events GROUP BY 1 ORDER BY 1""",
        "json_typed_agg": """
            SELECT event_type,
                   sum(CAST(props->>'k' AS BIGINT))::BIGINT AS k_sum,
                   max(CAST(props->>'k' AS BIGINT)) AS k_max,
                   count(*) AS n
            FROM events GROUP BY 1""",
        "projection_routing": """
            SELECT date_trunc('day', ts)::TIMESTAMP AS __time, event_type,
                   count(*) AS n, round(sum(value), 3) AS total
            FROM events GROUP BY 1, 2""",
        "nested_groupby": """
            SELECT count(*) AS users, CAST(sum(cnt) AS DOUBLE) AS total,
                   max(cnt) AS max_cnt
            FROM (SELECT user_id, count(*) AS cnt FROM events GROUP BY 1) t""",
        "join_outer": """
            SELECT CASE WHEN o.n_orders IS NOT NULL THEN 'yes' ELSE 'no' END
                     AS has_orders,
                   count(*) AS customers
            FROM customer c
            LEFT JOIN (SELECT o_custkey, count(*) AS n_orders FROM orders
                       GROUP BY 1) o
              ON c.c_custkey = o.o_custkey
            GROUP BY 1""",
        "gb_expr_lambda": """
            SELECT l_linestatus,
                   round(sum(l_quantity * l_quantity), 2) AS sumsq
            FROM lineitem GROUP BY 1""",
        "inline_topn": """
            SELECT z.zone AS zone, count(*) AS nations
            FROM nation n
            JOIN (VALUES (0, 'south'), (1, 'west'), (2, 'east'),
                         (3, 'north'), (4, 'central')) AS z(rk, zone)
              ON n.n_regionkey = z.rk
            GROUP BY 1""",
        "topn_per_day": """
            SELECT __time, event_type, n FROM (
              SELECT date_trunc('day', ts)::TIMESTAMP AS __time, event_type,
                     count(*) AS n,
                     row_number() OVER (PARTITION BY __time
                                        ORDER BY n DESC,
                                                 event_type ASC) AS rn
              FROM events
              WHERE ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-01-08'
              GROUP BY 1, 2) t
            WHERE rn <= 2""",
        "window_framed_avg": """
            SELECT __time, round(v, 3) AS v,
                   round(avg(v) OVER (ORDER BY __time
                         ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 3) AS ma3
            FROM (
              SELECT date_trunc('day', ts)::TIMESTAMP AS __time,
                     sum(value) AS v
              FROM events
              WHERE ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-02-01'
              GROUP BY 1) d""",
        "gb_limit_offset": """
            SELECT o_custkey, count(*) AS n FROM orders
            GROUP BY 1 ORDER BY o_custkey LIMIT 7 OFFSET 3""",
        "search_strlen_sort": """
            SELECT 'event_type' AS dimension, event_type AS value,
                   count(*) AS count
            FROM events WHERE lower(event_type) LIKE '%i%'
            GROUP BY 2 ORDER BY length(event_type), event_type""",
        "gb_having_compound": """
            SELECT event_type, round(sum(value), 2) AS total,
                   count(*) AS n
            FROM events GROUP BY 1
            HAVING sum(value) > 1000 AND event_type <> 'view'
            ORDER BY 1""",
        "ts_descending": """
            SELECT date_trunc('day', ts)::TIMESTAMP AS __time,
                   count(*) AS n, sum(value) AS v
            FROM events GROUP BY 1 ORDER BY 1 DESC""",
        "topn_dim_metric": """
            SELECT o_orderpriority, count(*) AS n
            FROM orders GROUP BY 1 ORDER BY 1 LIMIT 3""",
        "scan_time_desc": """
            SELECT event_id, user_id, event_type FROM events
            WHERE event_id < 200
            ORDER BY ts DESC""",
        "ts_week": """
            SELECT date_trunc('week', ts)::TIMESTAMP AS __time, count(*) AS n
            FROM events GROUP BY 1""",
        # segmentMetadata column analysis (SegmentMetadataQueryQueryToolChest
        # .java:77): the stats contract is deterministic (exact distinct,
        # canonical min/max strings, fixed-width/UTF-8 size model) so the
        # whole profile is oracle-checkable
        "segment_metadata": """
            WITH s AS (SELECT * FROM events)
            SELECT * FROM (
              SELECT 'event_id' AS "column", 'bigint' AS "type",
                     count(DISTINCT event_id)::BIGINT AS cardinality,
                     count(*) FILTER (event_id IS NULL)::BIGINT AS nullCount,
                     min(event_id)::VARCHAR AS minValue,
                     max(event_id)::VARCHAR AS maxValue,
                     (8 * count(event_id))::BIGINT AS sizeBytes,
                     count(*)::BIGINT AS numRows FROM s
              UNION ALL
              SELECT 'ts', 'timestamp', count(DISTINCT ts)::BIGINT,
                     count(*) FILTER (ts IS NULL)::BIGINT,
                     strftime(min(ts), '%Y-%m-%d %H:%M:%S'),
                     strftime(max(ts), '%Y-%m-%d %H:%M:%S'),
                     (8 * count(ts))::BIGINT, count(*)::BIGINT FROM s
              UNION ALL
              SELECT 'user_id', 'bigint', count(DISTINCT user_id)::BIGINT,
                     count(*) FILTER (user_id IS NULL)::BIGINT,
                     min(user_id)::VARCHAR, max(user_id)::VARCHAR,
                     (8 * count(user_id))::BIGINT, count(*)::BIGINT FROM s
              UNION ALL
              SELECT 'event_type', 'string', count(DISTINCT event_type)::BIGINT,
                     count(*) FILTER (event_type IS NULL)::BIGINT,
                     min(event_type), max(event_type),
                     coalesce(sum(strlen(event_type)), 0)::BIGINT,
                     count(*)::BIGINT FROM s
              UNION ALL
              SELECT 'value', 'double', count(DISTINCT value)::BIGINT,
                     count(*) FILTER (value IS NULL)::BIGINT,
                     printf('%.4f', round(min(value), 4)),
                     printf('%.4f', round(max(value), 4)),
                     (8 * count(value))::BIGINT, count(*)::BIGINT FROM s
              UNION ALL
              SELECT 'props', 'string', count(DISTINCT props)::BIGINT,
                     count(*) FILTER (props IS NULL)::BIGINT,
                     min(props), max(props),
                     coalesce(sum(strlen(props)), 0)::BIGINT,
                     count(*)::BIGINT FROM s
              UNION ALL
              SELECT '__time', 'timestamp', count(DISTINCT ts)::BIGINT,
                     count(*) FILTER (ts IS NULL)::BIGINT,
                     strftime(min(ts), '%Y-%m-%d %H:%M:%S'),
                     strftime(max(ts), '%Y-%m-%d %H:%M:%S'),
                     (8 * count(ts))::BIGINT, count(*)::BIGINT FROM s
            ) ORDER BY "column" """,
        # rows-only (engine-specific hashing / ML / schema profiling):
        # dedup_minhash, dedup_simhash, sim_lsh, sim_ivf, mm_features
    }
