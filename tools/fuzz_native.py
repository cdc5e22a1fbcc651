"""Differential fuzzer for the NATIVE query path: random DimFilter
trees through DruidSparkEngine.query() vs equivalent SQL in DuckDB.

The conformance bank exercises each filter type pointwise; this
generates random and/or/not compositions of selector/in/bound/like
leaves (DimFilter.java:36-59 surface) under groupBy and timeseries
queries, so the FilterCompiler's tree handling, ordering comparators,
and null/strictness flags get combinatorial coverage. Generated
columns are NULL-free in the testdata, so Druid's two-valued NOT and
SQL's three-valued NOT agree by construction.

Usage:
    python tools/fuzz_native.py [n_queries] [seed0] [sf_dir]
pytest runs a seeded smoke via tests/test_fuzz_sql.py.
"""
from __future__ import annotations

import random
import sys

from tools.fuzz_sql import canon_rows, rows_close

# (table, string dims with vocab, numeric cols with plausible range)
NTABLES = {
    "orders": {
        "strs": {"o_orderstatus": ["F", "O", "P", "X"],
                 "o_orderpriority": ["1-URGENT", "2-HIGH", "3-MEDIUM",
                                     "4-NOT SPECIFIED", "5-LOW"]},
        "nums": {"o_custkey": (0, 1500), "o_totalprice": (0.0, 500000.0)},
        "metric": "o_totalprice",
    },
    "lineitem": {
        "strs": {"l_returnflag": ["A", "N", "R", "Z"],
                 "l_linestatus": ["F", "O"]},
        "nums": {"l_quantity": (1, 50), "l_extendedprice": (0.0, 100000.0),
                 "l_partkey": (0, 2000)},
        "metric": "l_quantity",
    },
    "customer": {
        "strs": {"c_mktsegment": ["AUTOMOBILE", "BUILDING", "FURNITURE",
                                  "HOUSEHOLD", "MACHINERY"]},
        "nums": {"c_nationkey": (0, 24), "c_acctbal": (-1000.0, 10000.0)},
        "metric": "c_acctbal",
    },
}


def _sq(v: str) -> str:
    return "'" + str(v).replace("'", "''") + "'"


def gen_filter(r: random.Random, t: dict, depth: int = 0):
    """-> (filter_json, sql_where). Leaves only at depth cap."""
    if depth >= 3 or r.random() < 0.45:
        k = r.randrange(7)
        if k == 0:  # selector (SelectorDimFilter)
            d = r.choice(list(t["strs"]))
            v = r.choice(t["strs"][d])
            return ({"type": "selector", "dimension": d, "value": v},
                    f"({d} = {_sq(v)})")
        if k == 1:  # in (InDimFilter)
            d = r.choice(list(t["strs"]))
            vs = r.sample(t["strs"][d],
                          r.randrange(1, len(t["strs"][d]) + 1))
            return ({"type": "in", "dimension": d, "values": vs},
                    f"({d} IN ({', '.join(_sq(v) for v in vs)}))")
        if k == 2:  # bound, numeric ordering (BoundDimFilter)
            d = r.choice(list(t["nums"]))
            lo, hi = t["nums"][d]
            a = lo + (hi - lo) * r.random()
            b = a + (hi - a) * r.random()
            if isinstance(lo, int):
                a, b = int(a), int(b)
            ls, us = r.random() < 0.5, r.random() < 0.5
            f = {"type": "bound", "dimension": d, "ordering": "numeric",
                 "lower": str(a), "upper": str(b),
                 "lowerStrict": ls, "upperStrict": us}
            return (f, f"({d} {'>' if ls else '>='} {a} AND "
                       f"{d} {'<' if us else '<='} {b})")
        if k == 4:
            # in over a NUMERIC column with string values — the
            # reference's InDimFilter coerces; so must filters.py
            d = r.choice([c for c, (lo, _) in t["nums"].items()
                          if isinstance(lo, int)] or list(t["nums"]))
            lo, hi = t["nums"][d]
            vs = sorted({str(r.randrange(int(lo), int(hi) + 1))
                         for _ in range(r.randrange(1, 5))})
            return ({"type": "in", "dimension": d, "values": vs},
                    f"({d} IN ({', '.join(vs)}))")
        if k == 5:
            # bound with LEXICOGRAPHIC ordering on a string dim
            # (BoundDimFilter default ordering)
            d = r.choice(list(t["strs"]))
            a, b = sorted(r.sample(t["strs"][d],
                                   min(2, len(t["strs"][d]))) * 2)[:2]
            ls, us = r.random() < 0.5, r.random() < 0.5
            f = {"type": "bound", "dimension": d,
                 "ordering": "lexicographic",
                 "lower": a, "upper": b,
                 "lowerStrict": ls, "upperStrict": us}
            return (f, f"({d} {'>' if ls else '>='} {_sq(a)} AND "
                       f"{d} {'<' if us else '<='} {_sq(b)})")
        if k == 6:
            # expression filter (ExpressionDimFilter → expr.py Pratt
            # parser compiling a native-language boolean)
            d = r.choice(list(t["strs"]))
            v = r.choice(t["strs"][d])
            ints = [c for c, (lo, _) in t["nums"].items()
                    if isinstance(lo, int)]
            x = r.choice(ints) if ints else list(t["nums"])[0]
            lo, hi = t["nums"][x]
            c0 = r.randrange(int(lo), int(hi) + 1)
            n0, j0 = r.choice([3, 5, 7]), r.randrange(0, 3)
            e, w = r.choice([
                (f'"{d}" == \'{v}\' || "{x}" > {c0}',
                 f"({d} = {_sq(v)} OR {x} > {c0})"),
                (f'"{x}" % {n0} == {j0}',
                 f"({x} % {n0} = {j0})"),
                (f'abs("{x}" - {c0}) < {max(1, (int(hi) - int(lo)) // 4)}',
                 f"(abs({x} - {c0}) < {max(1, (int(hi) - int(lo)) // 4)})"),
                (f'"{d}" != \'{v}\' && "{x}" <= {c0}',
                 f"({d} <> {_sq(v)} AND {x} <= {c0})"),
            ])
            return ({"type": "expression", "expression": e}, w)
        d = r.choice(list(t["strs"]))  # like (LikeDimFilter)
        pat = r.choice(["%A%", "F%", "%O", "_", "%U%", "3%"])
        return ({"type": "like", "dimension": d, "pattern": pat},
                f"({d} LIKE {_sq(pat)})")
    k = r.randrange(3)
    if k == 0:
        fs = [gen_filter(r, t, depth + 1)
              for _ in range(r.randrange(2, 4))]
        return ({"type": "and", "fields": [f for f, _ in fs]},
                "(" + " AND ".join(w for _, w in fs) + ")")
    if k == 1:
        fs = [gen_filter(r, t, depth + 1)
              for _ in range(r.randrange(2, 4))]
        return ({"type": "or", "fields": [f for f, _ in fs]},
                "(" + " OR ".join(w for _, w in fs) + ")")
    f, w = gen_filter(r, t, depth + 1)
    return ({"type": "not", "field": f}, f"(NOT {w})")


def gen_vc(r: random.Random, t: dict):
    """Expression virtual column: -> (druid_expr, sql_expr). Exercises
    the native expression language (expr.py Pratt parser/compiler)
    against the same computation spelled in portable SQL."""
    d = r.choice(list(t["strs"]))
    d2 = r.choice(list(t["strs"]))
    ints = [c for c, (lo, _) in t["nums"].items() if isinstance(lo, int)]
    x = r.choice(ints) if ints else list(t["nums"])[0]
    k = r.randrange(6)
    if k == 0:
        return (f'concat("{d}", \'_\', "{d2}")',
                f"CONCAT({d}, '_', {d2})")
    if k == 1:
        return f'upper("{d}")', f"UPPER({d})"
    if k == 2:
        # Druid substring(expr, index, length) is 0-based
        return f'substring("{d}", 0, 2)', f"SUBSTR({d}, 1, 2)"
    if k == 3:
        c = r.randrange(1, 100)
        return (f'if("{x}" > {c}, \'hi\', \'lo\')',
                f"CASE WHEN {x} > {c} THEN 'hi' ELSE 'lo' END")
    if k == 4:
        n = r.choice([3, 5, 7])
        return (f'concat(\'b\', cast("{x}" % {n}, \'STRING\'))',
                f"CONCAT('b', CAST({x} % {n} AS VARCHAR))")
    return (f'case_searched("{d}" == {_sq(list(t["strs"][d])[0])}, '
            f"'first', 'other')",
            f"CASE WHEN {d} = {_sq(list(t['strs'][d])[0])} "
            f"THEN 'first' ELSE 'other' END")


def gen_native(seed: int):
    """-> (native_query_json, oracle_sql)."""
    r = random.Random(seed)
    name = r.choice(list(NTABLES))
    t = NTABLES[name]
    f, where = gen_filter(r, t)
    m = t["metric"]
    if r.random() < 0.18:  # virtual-column dimension groupBy
        e, sqe = gen_vc(r, t)
        q = {"queryType": "groupBy", "dataSource": name,
             "granularity": "all",
             "virtualColumns": [{"type": "expression", "name": "v0",
                                 "expression": e,
                                 "outputType": "STRING"}],
             "dimensions": ["v0"],
             "aggregations": [
                 {"type": "count", "name": "n"},
                 {"type": "doubleSum", "name": "s", "fieldName": m}],
             "filter": f}
        sql = (f"SELECT {sqe} AS v0, CAST(COUNT(*) AS BIGINT) AS n, "
               f"CAST(SUM({m}) AS DOUBLE) AS s FROM {name} "
               f"WHERE {where} GROUP BY 1")
        return q, sql, ["v0", "n", "s"]
    if r.random() < 0.10:
        # tuple-sketch set ops (arrayOfDoublesSketchSetOp): two
        # filtered tuple sketches over a random key, estimate +
        # numEntries of a random set op vs a DuckDB distinct-set oracle
        # — generated coverage for the round-5 map-state fold
        fa, wa = gen_filter(r, t)
        fb, wb = gen_filter(r, t)
        key = r.choice(list(t["nums"]) + list(t["strs"]))
        func = r.choice(["INTERSECT", "UNION", "NOT"])

        def tup(nm, flt):
            return {"type": "filtered", "name": nm, "filter": flt,
                    "aggregator": {"type": "arrayOfDoublesSketch",
                                   "name": nm, "fieldNames": [key],
                                   "metricColumns": [m]}}

        setop = {"type": "arrayOfDoublesSketchSetOp", "func": func,
                 "fields": [{"type": "fieldAccess", "fieldName": "a"},
                            {"type": "fieldAccess", "fieldName": "b"}]}
        q = {"queryType": "timeseries", "dataSource": name,
             "granularity": "all",
             "aggregations": [tup("a", fa), tup("b", fb)],
             "postAggregations": [
                 {"type": "arrayOfDoublesSketchToEstimate",
                  "name": "est", "field": setop},
                 {"type": "arrayOfDoublesSketchToNumEntries",
                  "name": "ents", "field": setop}]}
        op_sql = {
            "INTERSECT": "SELECT count(*) FROM a JOIN b USING (k)",
            "UNION": "SELECT count(*) FROM "
                     "(SELECT k FROM a UNION SELECT k FROM b)",
            "NOT": "SELECT count(*) FROM "
                   "(SELECT k FROM a EXCEPT SELECT k FROM b)",
        }[func]
        sql = (f"WITH a AS (SELECT DISTINCT CAST({key} AS VARCHAR) AS k "
               f"FROM {name} WHERE ({wa}) AND {key} IS NOT NULL), "
               f"b AS (SELECT DISTINCT CAST({key} AS VARCHAR) AS k "
               f"FROM {name} WHERE ({wb}) AND {key} IS NOT NULL) "
               f"SELECT CAST(({op_sql}) AS DOUBLE) AS est, "
               f"CAST(({op_sql}) AS BIGINT) AS ents")
        return q, sql, ["est", "ents"]
    if name == "orders" and r.random() < 0.25:
        # bucketed timeseries over o_orderdate: granularity bucketing
        # (granularity.py) + interval bounds vs date_trunc oracle;
        # skipEmptyBuckets avoids the zero-fill spine DuckDB won't have
        gran = r.choice(["day", "week", "month"])
        # same [1995-01-01, 1997-01-01) window in all three Joda forms
        # the reference accepts (round 7: parse_iso_interval)
        iv_form = r.choice([
            "1995-01-01T00:00:00Z/1997-01-01T00:00:00Z",
            "1995-01-01/P2Y",
            "P2Y/1997-01-01",
            "1995/1997",
        ])
        q = {"queryType": "timeseries", "dataSource": name,
             "granularity": gran,
             "virtualColumns": [],
             "intervals": [iv_form],
             "aggregations": [
                 {"type": "count", "name": "n"},
                 {"type": "doubleSum", "name": "s", "fieldName": m}],
             "filter": f, "context": {"skipEmptyBuckets": True}}
        sql = (f"SELECT date_trunc('{gran}', o_orderdate)::TIMESTAMP "
               f"AS __time, CAST(COUNT(*) AS BIGINT) AS n, "
               f"CAST(SUM({m}) AS DOUBLE) AS s FROM {name} "
               f"WHERE {where} AND o_orderdate >= TIMESTAMP '1995-01-01'"
               f" AND o_orderdate < TIMESTAMP '1997-01-01' GROUP BY 1")
        return q, sql, ["__time", "n", "s"]
    if name == "orders" and r.random() < 0.15:
        # ZERO-FILLED timeseries (no skipEmptyBuckets): the engine
        # emits every bucket in the interval; count fills 0, doubleSum
        # stays NULL (TimeseriesQueryEngine zero-fill semantics) —
        # oracle builds the same spine with generate_series
        gran, iv = r.choice([("day", "1 DAY"), ("month", "1 MONTH")])
        q = {"queryType": "timeseries", "dataSource": name,
             "granularity": gran,
             "intervals": ["1995-01-01T00:00:00Z/1996-01-01T00:00:00Z"],
             "aggregations": [
                 {"type": "count", "name": "n"},
                 {"type": "doubleSum", "name": "s", "fieldName": m}],
             "filter": f}
        sql = (
            "WITH spine AS (SELECT unnest(generate_series("
            "TIMESTAMP '1995-01-01', TIMESTAMP '1995-12-31', "
            f"INTERVAL {iv})) AS __time), "
            "ag AS (SELECT "
            f"date_trunc('{gran}', o_orderdate)::TIMESTAMP AS __time, "
            "CAST(COUNT(*) AS BIGINT) AS n, "
            f"CAST(SUM({m}) AS DOUBLE) AS s FROM orders "
            f"WHERE {where} AND o_orderdate >= TIMESTAMP '1995-01-01' "
            "AND o_orderdate < TIMESTAMP '1996-01-01' GROUP BY 1) "
            "SELECT sp.__time AS __time, COALESCE(ag.n, 0) AS n, "
            "CAST(ag.s AS DOUBLE) AS s "
            "FROM spine sp LEFT JOIN ag ON sp.__time = ag.__time")
        return q, sql, ["__time", "n", "s"]
    if r.random() < 0.3:  # timeseries granularity all = one-row agg
        q = {"queryType": "timeseries", "dataSource": name,
             "granularity": "all",
             "aggregations": [
                 {"type": "count", "name": "n"},
                 {"type": "doubleSum", "name": "s", "fieldName": m}],
             "filter": f, "context": {"skipEmptyBuckets": True}}
        sql = (f"SELECT CAST(COUNT(*) AS BIGINT) AS n, "
               f"CAST(SUM({m}) AS DOUBLE) AS s FROM {name} "
               f"WHERE {where} HAVING COUNT(*) > 0")
        return q, sql, ["n", "s"]
    if r.random() < 0.2:  # extraction dimension spec (dimensions.py)
        d = r.choice(list(t["strs"]))
        if r.random() < 0.5:
            ln = r.randrange(1, 4)
            spec = {"type": "extraction", "dimension": d,
                    "outputName": "d0",
                    "extractionFn": {"type": "substring", "index": 0,
                                     "length": ln}}
            sqd = f"SUBSTR({d}, 1, {ln})"
        else:
            spec = {"type": "extraction", "dimension": d,
                    "outputName": "d0",
                    "extractionFn": {"type": "strlen"}}
            sqd = f"CAST(LENGTH({d}) AS VARCHAR)"
        q = {"queryType": "groupBy", "dataSource": name,
             "granularity": "all", "dimensions": [spec],
             "aggregations": [{"type": "count", "name": "n"}],
             "filter": f}
        sql = (f"SELECT {sqd} AS d0, CAST(COUNT(*) AS BIGINT) AS n "
               f"FROM {name} WHERE {where} GROUP BY 1")
        return q, sql, ["d0", "n"]
    if r.random() < 0.12:
        # map-lookup extraction fn (LookupExtractionFn:
        # retainMissingValue vs replaceMissingValueWith) vs CASE oracle
        d = r.choice(list(t["strs"]))
        vocab = sorted(t["strs"][d])
        mapping = {v: f"m{i}" for i, v in
                   enumerate(vocab[:r.randrange(1, len(vocab) + 1)])}
        retain = r.random() < 0.5
        exfn = {"type": "lookup",
                "lookup": {"type": "map", "map": mapping},
                "retainMissingValue": retain}
        if not retain:
            exfn["replaceMissingValueWith"] = "other"
        q = {"queryType": "groupBy", "dataSource": name,
             "granularity": "all",
             "dimensions": [{"type": "extraction", "dimension": d,
                             "outputName": "d0",
                             "extractionFn": exfn}],
             "aggregations": [{"type": "count", "name": "n"}],
             "filter": f}
        whens = " ".join(f"WHEN {_sq(k)} THEN {_sq(v)}"
                         for k, v in mapping.items())
        miss = d if retain else "'other'"
        sql = (f"SELECT CASE {d} {whens} ELSE {miss} END AS d0, "
               f"CAST(COUNT(*) AS BIGINT) AS n FROM {name} "
               f"WHERE {where} GROUP BY 1")
        return q, sql, ["d0", "n"]
    if r.random() < 0.2:  # topN with threshold >= cardinality (exact
        # full ordering; canon sorts rows so metric ties are benign)
        d = r.choice(list(t["strs"]))
        q = {"queryType": "topN", "dataSource": name,
             "granularity": "all", "dimension": d, "metric": "s",
             "threshold": 50,
             "aggregations": [
                 {"type": "count", "name": "n"},
                 {"type": "doubleSum", "name": "s", "fieldName": m}],
             "filter": f}
        sql = (f"SELECT {d}, CAST(COUNT(*) AS BIGINT) AS n, "
               f"CAST(SUM({m}) AS DOUBLE) AS s FROM {name} "
               f"WHERE {where} GROUP BY 1")
        return q, sql, [d, "n", "s"]
    if name == "orders" and r.random() < 0.18:
        # join datasource (engine.py resolve: {"type": "join"}) —
        # orders ⋈ customer on o_custkey, group by the right-side dim;
        # the filter tree applies post-join like the reference
        jt = r.choice(["INNER", "LEFT"])
        q = {"queryType": "groupBy",
             "dataSource": {
                 "type": "join", "left": "orders",
                 "right": {"type": "table", "name": "customer"},
                 "rightPrefix": "j0.",
                 "condition": 'o_custkey == "j0.c_custkey"',
                 "joinType": jt},
             "granularity": "all",
             "dimensions": [{"type": "default",
                             "dimension": "j0.c_mktsegment",
                             "outputName": "seg"}],
             "aggregations": [
                 {"type": "count", "name": "n"},
                 {"type": "doubleSum", "name": "s", "fieldName": m}],
             "filter": f}
        jk = "JOIN" if jt == "INNER" else "LEFT JOIN"
        sql = (f"SELECT c_mktsegment AS seg, "
               f"CAST(COUNT(*) AS BIGINT) AS n, "
               f"CAST(SUM({m}) AS DOUBLE) AS s "
               f"FROM orders {jk} customer ON o_custkey = c_custkey "
               f"WHERE {where} GROUP BY 1")
        return q, sql, ["seg", "n", "s"]
    if r.random() < 0.12:
        # filtered aggregator (FilteredAggregatorFactory) + arithmetic
        # post-aggregator vs SQL FILTER clause and expression
        f2, where2 = gen_filter(r, t)
        d = r.choice(list(t["strs"]))
        q = {"queryType": "groupBy", "dataSource": name,
             "granularity": "all", "dimensions": [d],
             "aggregations": [
                 {"type": "count", "name": "n"},
                 {"type": "filtered", "name": "fs", "filter": f2,
                  "aggregator": {"type": "doubleSum", "name": "fs",
                                 "fieldName": m}},
                 {"type": "doubleSum", "name": "s", "fieldName": m}],
             "postAggregations": [
                 {"type": "arithmetic", "name": "frac", "fn": "/",
                  "fields": [
                      {"type": "fieldAccess", "fieldName": "fs"},
                      {"type": "fieldAccess", "fieldName": "s"}]}],
             "filter": f}
        # arithmetic '/' yields 0 on division by zero
        # (ArithmeticPostAggregator.Ops.DIV; aggregations.py:592) and
        # propagates a NULL numerator (filtered sum over no rows),
        # which plain SQL division does too
        sql = (f"SELECT {d}, CAST(COUNT(*) AS BIGINT) AS n, "
               f"CAST(SUM({m}) FILTER (WHERE {where2}) AS DOUBLE) "
               f"AS fs, CAST(SUM({m}) AS DOUBLE) AS s, "
               f"CAST(CASE WHEN SUM({m}) = 0 THEN 0 ELSE "
               f"SUM({m}) FILTER (WHERE {where2}) "
               f"/ SUM({m}) END AS DOUBLE) AS frac "
               f"FROM {name} WHERE {where} GROUP BY 1")
        return q, sql, [d, "n", "fs", "s", "frac"]
    if r.random() < 0.12:  # search query (queries/search.py) — value
        # counts for a matching fragment under the same filter tree
        d = r.choice(list(t["strs"]))
        frag = r.choice(["a", "o", "1", "u", "e", "-"])
        insensitive = r.random() < 0.5
        sq_spec = ({"type": "insensitive_contains", "value": frag}
                   if insensitive else
                   {"type": "contains", "value": frag,
                    "caseSensitive": True})
        q = {"queryType": "search", "dataSource": name,
             "searchDimensions": [d], "query": sq_spec, "filter": f}
        match = (f"LOWER({d}) LIKE '%{frag.lower()}%'" if insensitive
                 else f"{d} LIKE '%{frag}%'")
        sql = (f"SELECT '{d}' AS dimension, {d} AS value, "
               f"CAST(COUNT(*) AS BIGINT) AS count FROM {name} "
               f"WHERE {where} AND {match} GROUP BY 2")
        return q, sql, ["dimension", "value", "count"]
    if len(t["strs"]) >= 2 and r.random() < 0.15:
        # subtotalsSpec (groupby.py grouping sets) vs GROUPING SETS
        d1, d2 = r.sample(list(t["strs"]), 2)
        # every selected dim must appear in >=1 set: DuckDB rejects a
        # projected column absent from all grouping sets
        sets = r.choice([[[d1], [d2]], [[d1, d2], [d1]],
                         [[d1, d2], []], [[d1, d2], [d2], []]])
        q = {"queryType": "groupBy", "dataSource": name,
             "granularity": "all", "dimensions": [d1, d2],
             "aggregations": [
                 {"type": "count", "name": "n"},
                 {"type": "doubleSum", "name": "s", "fieldName": m}],
             "filter": f, "subtotalsSpec": sets}
        gsets = ", ".join("(" + ", ".join(g) + ")" for g in sets)
        # Druid subtotals re-aggregate the base result set, so an
        # empty base yields NO grand-total row for the [] set; ANSI
        # GROUPING SETS () emits one zero-count row — HAVING drops it
        sql = (f"SELECT {d1}, {d2}, CAST(COUNT(*) AS BIGINT) AS n, "
               f"CAST(SUM({m}) AS DOUBLE) AS s FROM {name} "
               f"WHERE {where} GROUP BY GROUPING SETS ({gsets}) "
               f"HAVING COUNT(*) > 0")
        return q, sql, [d1, d2, "n", "s"]
    if r.random() < 0.15:  # scan: projection + filter, row-level
        cols = (r.sample(list(t["strs"]), 1)
                + r.sample(list(t["nums"]), r.randrange(1, 3)))
        q = {"queryType": "scan", "dataSource": name,
             "columns": cols, "filter": f}
        sql = (f"SELECT {', '.join(cols)} FROM {name} WHERE {where}")
        return q, sql, cols
    dims = r.sample(list(t["strs"]), r.randrange(1, len(t["strs"]) + 1))
    q = {"queryType": "groupBy", "dataSource": name,
         "granularity": "all", "dimensions": dims,
         "aggregations": [
             {"type": "count", "name": "n"},
             {"type": "doubleSum", "name": "s", "fieldName": m},
             {"type": "doubleMin", "name": "mn", "fieldName": m}],
         "filter": f}
    having = ""
    if r.random() < 0.3:
        k = r.randrange(0, 20)
        q["having"] = {"type": "greaterThan", "aggregation": "n",
                       "value": k}
        having = f" HAVING COUNT(*) > {k}"
    if r.random() < 0.3:
        # limitSpec ordered by ALL dims = deterministic cut
        lim = r.randrange(1, 8)
        q["limitSpec"] = {
            "type": "default", "limit": lim,
            "columns": [{"dimension": d, "direction": "ascending"}
                        for d in dims]}
        tail = (" ORDER BY "
                + ", ".join(f"{d} NULLS FIRST" for d in dims)
                + f" LIMIT {lim}")
    else:
        tail = ""
    sql = (f"SELECT {', '.join(dims)}, CAST(COUNT(*) AS BIGINT) AS n, "
           f"CAST(SUM({m}) AS DOUBLE) AS s, "
           f"CAST(MIN({m}) AS DOUBLE) AS mn "
           f"FROM {name} WHERE {where} GROUP BY {', '.join(dims)}"
           f"{having}{tail}")
    return q, sql, dims + ["n", "s", "mn"]


def run_fuzz_native(n: int = 100, seed0: int = 0,
                    sf_dir: str = "/root/testdata/sf0.001",
                    engine=None, con=None, verbose: bool = True):
    import duckdb
    if engine is None:
        from druid_spark import DruidSparkEngine
        from druid_spark.session import get_spark
        # sketch_default_nominal_entries=None: differential harness vs
        # an EXACT DuckDB oracle — the session default cap would change
        # tuple set-op counts above the cap (r6: seed 500 broke at
        # >4096 distinct keys). Exact folds required here.
        engine = DruidSparkEngine(get_spark(), data_dir=sf_dir,
                                  sketch_default_nominal_entries=None)
    if con is None:
        con = duckdb.connect()
        for t in NTABLES:
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                        f"read_parquet('{sf_dir}/{t}.parquet')")
    bad = []
    for i in range(n):
        seed = seed0 + i
        q, sql, cols = gen_native(seed)
        try:
            sdf = engine.query(q).select(*cols)
            srows = canon_rows(cols, [tuple(r) for r in sdf.collect()])
            res = con.execute(sql)
            orows = canon_rows(cols, res.fetchall())
        except Exception as e:
            bad.append((seed, q, f"error: {type(e).__name__}: {e}"))
            if verbose:
                print(f"NATIVE FUZZ ERROR seed={seed}\n  {q}\n  {e}")
            continue
        if srows != orows and not rows_close(srows, orows):
            diff = [p for p in zip(srows, orows) if p[0] != p[1]][:3]
            bad.append((seed, q,
                        f"rows {len(srows)}/{len(orows)} diff={diff}"))
            if verbose:
                print(f"NATIVE FUZZ MISMATCH seed={seed}\n  {q}\n"
                      f"  {sql}\n  spark={len(srows)} "
                      f"duck={len(orows)} {diff}")
        elif verbose and i % 20 == 0:
            print(f"  ok {i}/{n} (seed {seed})")
    return bad


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    s0 = int(sys.argv[2]) if len(sys.argv) > 2 else 0
    sf = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.001"
    bad = run_fuzz_native(n, s0, sf)
    print(f"\n{n - len(bad)} ok, {len(bad)} mismatches")
    sys.exit(1 if bad else 0)
