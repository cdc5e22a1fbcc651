"""Grammar-based differential SQL fuzzer: engine.sql vs DuckDB.

The hand-written conformance bank (__spark_entry__.py sqlc_* entries)
covers known Druid shapes; this fuzzer covers the combinatorial space
BETWEEN those shapes. It generates random queries from a typed grammar
restricted to the ANSI subset both Spark SQL and DuckDB spell
identically (arithmetic, CASE, COALESCE/NULLIF, predicates, IN/BETWEEN/
LIKE, aggregates, GROUP BY/HAVING/ORDER BY/LIMIT, inner joins), runs
each through DruidSparkEngine.sql() AND DuckDB over the same parquet,
and compares row sets with float tolerance.

Mirrors the reference's randomized testing culture (e.g.
sql/src/test/.../CalciteQueryTest + quidem corpora are enumerated;
druid has no public SQL fuzzer — this is beyond-reference hardening).

Usage:
    python tools/fuzz_sql.py [n_queries] [seed0] [sf_dir]
Exit code 1 on any mismatch; prints each failing query + diff head.
pytest runs a 40-query smoke via tests/test_fuzz_sql.py.
"""
from __future__ import annotations

import math
import random
import sys

TABLES = {
    "orders": {
        "num": ["o_orderkey", "o_custkey", "o_totalprice"],
        "int": ["o_orderkey", "o_custkey"],
        "str": ["o_orderstatus", "o_orderpriority"],
    },
    "lineitem": {
        "num": ["l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
                "l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        "int": ["l_orderkey", "l_partkey", "l_suppkey", "l_linenumber"],
        "str": ["l_returnflag", "l_linestatus"],
    },
    "customer": {
        "num": ["c_custkey", "c_nationkey", "c_acctbal"],
        "int": ["c_custkey", "c_nationkey"],
        "str": ["c_name", "c_mktsegment"],
    },
    "documents": {
        "num": ["doc_id", "n_chars"],
        "int": ["doc_id", "n_chars"],
        "str": ["lang", "source"],
    },
}


class Gen:
    def __init__(self, rng: random.Random, table: str):
        self.r = rng
        self.t = TABLES[table]

    # -- scalar numeric expression (always CAST-stable across engines)
    def num(self, depth: int = 0):
        r = self.r
        if depth >= 2 or r.random() < 0.45:
            if r.random() < 0.75:
                return r.choice(self.t["num"])
            return str(r.choice([0, 1, 2, 5, 10, 100]))
        k = r.randrange(5)
        if k == 0:
            return f"({self.num(depth+1)} + {self.num(depth+1)})"
        if k == 1:
            return f"({self.num(depth+1)} - {self.num(depth+1)})"
        if k == 2:
            # multiplication kept shallow to bound magnitudes
            return f"({self.num(2)} * {str(self.r.choice([2, 3, 7]))})"
        if k == 3:
            return (f"(CASE WHEN {self.pred(depth+1)} "
                    f"THEN {self.num(depth+1)} "
                    f"ELSE {self.num(depth+1)} END)")
        return f"COALESCE(NULLIF({self.num(depth+1)}, 0), -1)"

    def strx(self):
        return self.r.choice(self.t["str"])

    # -- boolean predicate
    def pred(self, depth: int = 0):
        r = self.r
        if depth >= 2 or r.random() < 0.5:
            k = r.randrange(5)
            if k == 0:
                op = r.choice(["<", "<=", ">", ">=", "=", "<>"])
                return f"({self.num(2)} {op} {self.num(2)})"
            if k == 1:
                c = self.strx()
                # values drawn from the generator's fixed vocabularies
                vals = ", ".join(
                    f"'{v}'" for v in r.sample(
                        ["F", "O", "P", "N", "R", "A", "1-URGENT",
                         "BUILDING", "AUTOMOBILE"], r.randrange(1, 4)))
                return f"({c} IN ({vals}))"
            if k == 2:
                lo = r.randrange(0, 50)
                return (f"({r.choice(self.t['int'])} BETWEEN {lo} "
                        f"AND {lo + r.randrange(1, 2000)})")
            if k == 3:
                return f"({self.strx()} LIKE '%{r.choice('AORF1B')}%')"
            return f"({r.choice(self.t['num'])} IS NOT NULL)"
        if r.random() < 0.5:
            return f"({self.pred(depth+1)} AND {self.pred(depth+1)})"
        return f"({self.pred(depth+1)} OR {self.pred(depth+1)})"

    def agg(self, i: int):
        r = self.r
        k = r.randrange(6)
        e = self.num(1)
        if k == 0:
            return f"CAST(COUNT(*) AS BIGINT) AS a{i}"
        if k == 1:
            return f"CAST(SUM({e}) AS DOUBLE) AS a{i}"
        if k == 2:
            return f"CAST(MIN({e}) AS DOUBLE) AS a{i}"
        if k == 3:
            return f"CAST(MAX({e}) AS DOUBLE) AS a{i}"
        if k == 4:
            return (f"CAST(COUNT(DISTINCT {r.choice(self.t['int'])}) "
                    f"AS BIGINT) AS a{i}")
        return f"CAST(AVG(CAST({e} AS DOUBLE)) AS DOUBLE) AS a{i}"


# unique ordering keys per table (window ORDER BY must be total for
# ROW_NUMBER determinism across engines)
# the synthetic lineitem has duplicate (l_orderkey, l_linenumber)
# pairs, so only orders/customer have usable total-order keys for
# deterministic window frames
PKS = {"orders": ["o_orderkey"],
       "customer": ["c_custkey"]}
JOINS = [("orders", "customer", "o_custkey", "c_custkey"),
         ("lineitem", "orders", "l_orderkey", "o_orderkey")]


def gen_query(seed: int):
    """-> portable SQL string run on both engines, OR a
    (druid_sql, duckdb_sql) pair for Druid-dialect shapes."""
    r = random.Random(seed)
    shape = r.random()
    if shape < 0.20:
        return _gen_join(r)
    if shape < 0.28:
        return _gen_window(r)
    if shape < 0.32:
        return _gen_window_frame(r)
    if shape < 0.42:
        return _gen_scalar_subquery(r)
    if shape < 0.54:
        return _gen_druid_fn(r)
    if shape < 0.60:
        return _gen_mv(r)
    if shape < 0.63:
        return _gen_mv_inlined(r)
    if shape < 0.66:
        return _gen_unnest_join(r)
    if shape < 0.69:
        return _gen_string_agg(r)
    table = r.choice(list(TABLES))
    g = Gen(r, table)
    n_dims = r.randrange(0, 3)
    dims = r.sample(g.t["str"] + g.t["int"], n_dims) if n_dims else []
    aggs = [g.agg(i) for i in range(r.randrange(1, 4))]
    sel = ", ".join(dims + aggs)
    q = f"SELECT {sel} FROM {table}"
    if r.random() < 0.8:
        q += f" WHERE {g.pred()}"
    if dims:
        q += " GROUP BY " + ", ".join(dims)
        if r.random() < 0.4:
            q += " HAVING CAST(COUNT(*) AS BIGINT) > " \
                 f"{r.randrange(0, 5)}"
        # ordering by ALL group keys is total (keys are unique), so a
        # LIMIT cut is deterministic; NULLS FIRST pins the one spot
        # where Spark (nulls first) and DuckDB (nulls last) disagree
        q += " ORDER BY " + ", ".join(f"{d} NULLS FIRST" for d in dims)
        if r.random() < 0.5:
            q += f" LIMIT {r.randrange(1, 50)}"
    return q


def _gen_string_agg(r: random.Random):
    """STRING_AGG surface (round 7, qaAggFuncs golden family): random
    column/separator/filter with optional DISTINCT and the optional
    trailing maxSizeBytes, finalized by an order-independent function
    (LENGTH of the agg / of pad/repeat over it) so the nondeterministic
    collect order can't flake. Returns (druid, duckdb) pairs."""
    table = r.choice(list(TABLES))
    g = Gen(r, table)
    col = r.choice(g.t["str"] + g.t["int"])
    sep = r.choice(["|", ",", "-", "::"])
    dist = "DISTINCT " if r.random() < 0.4 else ""
    # explicit large maxSizeBytes: the reference (and round-11's cap
    # enforcement) throws past the 1024-byte DEFAULT on these tables,
    # a rejection the DuckDB differential cannot represent — so fuzz
    # the VALUE surface under a reference-legal explicit cap
    cap = ", 1000000"
    dru_agg = f"STRING_AGG({dist}{col}, '{sep}'{cap})"
    duk_agg = f"string_agg({dist}CAST({col} AS VARCHAR), '{sep}')"
    wrap = r.choice([
        ("LENGTH({})", "length({})"),
        ("CHAR_LENGTH({})", "length({})"),
        ("LENGTH(REPEAT({}, 2))", "2 * length({})"),
        ("LENGTH(RPAD({}, 4, '3'))", "CASE WHEN {} IS NULL "
         "THEN NULL ELSE 4 END"),
    ])
    where = g.pred()
    dru = (f"SELECT CAST({wrap[0].format(dru_agg)} AS BIGINT) AS n "
           f"FROM {table} WHERE {where}")
    duk = (f"SELECT CAST({wrap[1].format(duk_agg)} AS BIGINT) AS n "
           f"FROM {table} WHERE {where}")
    return dru, duk


def _gen_unnest_join(r: random.Random):
    """JOIN UNNEST(...) AS u(c) ON cond (the round-5 lateral-explode
    rewrite) — uncorrelated literal arrays with INNER/LEFT ON, and
    correlated STRING_TO_ARRAY splits. Returns (druid, duckdb)
    dialect pairs."""
    table = r.choice(list(TABLES))
    g = Gen(r, table)
    if r.random() < 0.5:
        # uncorrelated: join an int-literal array on a modulus pred
        key = r.choice(g.t["int"])
        vals = sorted(r.sample(range(0, 8), r.randrange(2, 5)))
        arr = ", ".join(str(v) for v in vals)
        kind = r.choice(["JOIN", "LEFT JOIN"])
        mod = r.randrange(4, 9)
        dru = (f"SELECT CAST(COUNT(*) AS BIGINT) AS n, "
               f"CAST(COUNT(u.c) AS BIGINT) AS nc "
               f"FROM {table} {kind} UNNEST(ARRAY[{arr}]) AS u(c) "
               f"ON {key} % {mod} = u.c")
        duk = dru.replace(f"UNNEST(ARRAY[{arr}]) AS u(c)",
                          f"(SELECT UNNEST([{arr}]) AS c) u")
        return dru, duk
    # correlated: split a string column, count non-empty pieces.
    # STRING_TO_ARRAY follows Java String.split — TRAILING empty
    # pieces are trimmed (golden-pinned; register.py) — so the
    # DuckDB oracle strips trailing separators before splitting and
    # maps an all-separator value to the empty list (round 12: fuzz
    # seeds 101616/101743 caught the untrimmed oracle, not the
    # engine)
    col = r.choice(g.t["str"])
    delim = r.choice(["_", "-", "A", "e"])
    lit = r.choice(["''", "'x'"])
    dru = (f"SELECT CAST(COUNT(*) AS BIGINT) AS n "
           f"FROM {table} "
           f"JOIN UNNEST(STRING_TO_ARRAY({col}, '{delim}')) AS u(c) "
           f"ON u.c <> {lit}")
    stripped = (f"regexp_replace({col}, '(?:{delim})+$', '')")
    jsplit = (f"(CASE WHEN {stripped} = '' AND {col} <> '' THEN [] "
              f"ELSE string_split({stripped}, '{delim}') END)")
    duk = (f"SELECT CAST(COUNT(*) AS BIGINT) AS n "
           f"FROM {table}, "
           f"UNNEST({jsplit}) AS u(c) "
           f"WHERE u.c <> {lit}")
    return dru, duk


def _gen_join(r: random.Random) -> str:
    left, right, lk, rk = r.choice(JOINS)
    gl, gr = Gen(r, left), Gen(r, right)
    dims = []
    if r.random() < 0.8:
        dims.append(r.choice(gl.t["str"]))
    if r.random() < 0.5:
        dims.append(r.choice(gr.t["str"]))
    kind = r.choice(["JOIN", "LEFT JOIN"])
    aggs = [f"CAST(COUNT(*) AS BIGINT) AS a0",
            f"CAST(SUM({r.choice(gl.t['num'])}) AS DOUBLE) AS a1"]
    sel = ", ".join(dims + aggs)
    q = (f"SELECT {sel} FROM {left} {kind} {right} "
         f"ON {lk} = {rk}")
    if r.random() < 0.7:
        # LEFT JOIN + right-side pred must stay in ON to preserve the
        # outer shape identically in both engines; keep WHERE left-only
        q += f" WHERE {gl.pred()}"
    if dims:
        q += (" GROUP BY " + ", ".join(dims) + " ORDER BY "
              + ", ".join(f"{d} NULLS FIRST" for d in dims))
    return q


def _gen_window(r: random.Random) -> str:
    table = r.choice(list(PKS))
    g = Gen(r, table)
    part = r.choice(g.t["str"])
    order = ", ".join(f"{k} NULLS FIRST" for k in PKS[table])
    fn = r.choice(
        ["ROW_NUMBER()", "RANK()", "DENSE_RANK()",
         f"CAST(SUM({r.choice(g.t['num'])}) OVER (PARTITION BY {part} "
         f"ORDER BY {order} ROWS BETWEEN UNBOUNDED PRECEDING AND "
         f"CURRENT ROW) AS DOUBLE)"])
    wf = (fn if fn.startswith("CAST") else
          f"{fn} OVER (PARTITION BY {part} ORDER BY {order})")
    pk = ", ".join(PKS[table])
    q = (f"SELECT {part}, {pk}, {wf} AS w FROM {table} "
         f"WHERE {g.pred()}")
    n = r.randrange(2, 6)
    return (f"SELECT * FROM ({q}) t WHERE w <= {n} "
            f"ORDER BY {part} NULLS FIRST, {pk}")


def _gen_window_frame(r: random.Random) -> str:
    """Random ROWS/RANGE frame bounds (the DrillWindowQueryTest /
    qaWin orderby_* matrix as a generator): every valid
    (start, end) bound pair over PRECEDING/CURRENT/FOLLOWING/
    UNBOUNDED, ROWS over a unique order key, RANGE (value-based,
    peers included) over a tied key with order-insensitive
    aggregates only — both deterministic under ties."""
    unit = r.choice(["ROWS", "RANGE"])

    def bound(lo_ok: bool, hi_ok: bool, following_ok: bool = True):
        # FOLLOWING ranks strictly above CURRENT ROW and PRECEDING
        # strictly below even at k=0: SQL forbids a FOLLOWING start
        # with a CURRENT ROW end regardless of the offset value.
        opts = []
        if lo_ok:
            opts.append(("UNBOUNDED PRECEDING", -100.0))
        k = r.randrange(0, 4)
        opts += [(f"{k} PRECEDING", -k - 0.5), ("CURRENT ROW", 0.0)]
        if following_ok:
            opts.append((f"{k} FOLLOWING", k + 0.5))
        if hi_ok:
            opts.append(("UNBOUNDED FOLLOWING", 100.0))
        return r.choice(opts)

    # RANGE start bounds stop at CURRENT ROW: DuckDB's `k FOLLOWING`
    # start under RANGE gives PEERS different frames (non-standard —
    # value-based frames are peer-uniform, which Spark honors), so the
    # oracle can't adjudicate those shapes. Same for a RANGE end of
    # `0 PRECEDING`: the standard makes RANGE 0 PRECEDING ≡ CURRENT
    # ROW with peers (Spark, PostgreSQL), but DuckDB excludes the
    # whole peer group (frame can even be empty → NULL) — seeds
    # 61326/61644 caught the corner.
    start_following = unit == "ROWS"

    def ok_pair(a, b):
        if a[1] > b[1]:  # start must not sort after end
            return False
        return not (unit == "RANGE" and b[0] == "0 PRECEDING")

    a = bound(True, False, following_ok=start_following)
    b = bound(False, True)
    while not ok_pair(a, b):
        a = bound(True, False, following_ok=start_following)
        b = bound(False, True)
    frame = f"{unit} BETWEEN {a[0]} AND {b[0]}"
    direction = r.choice(["ASC", "DESC"])
    if unit == "ROWS":
        order = "c_custkey"  # unique: deterministic under any frame
        fn = r.choice(
            ["SUM(c_nationkey)", "COUNT(*)", "MIN(c_mktsegment)",
             "MAX(c_mktsegment)", "FIRST_VALUE(c_name)",
             "LAST_VALUE(c_name)"])
        w = f"{fn} OVER (ORDER BY {order} {direction} {frame})"
    else:
        order = "c_nationkey"  # tied key: value frame includes peers
        fn = r.choice(["SUM(c_custkey)", "COUNT(*)", "MIN(c_custkey)",
                       "MAX(c_custkey)", "AVG(c_custkey)"])
        w = f"{fn} OVER (ORDER BY {order} {direction} {frame})"
        if fn.startswith("AVG"):
            w = f"CAST(ROUND({w}, 4) AS DOUBLE)"
    return (f"SELECT c_custkey, {w} AS w FROM customer "
            f"ORDER BY c_custkey")


def _gen_druid_fn(r: random.Random):
    """Druid-dialect scalar functions (functions/register.py +
    sqlshim.py translations) vs the equivalent portable DuckDB
    spelling — differential coverage for the dialect layer the
    common-subset grammar can't reach. Returns (druid_sql, duck_sql);
    the WHERE predicate is portable and shared verbatim."""
    g = Gen(r, "orders")
    p, u = r.choice([("P1Y", "year"), ("P1M", "month"), ("P1D", "day")])
    unit = r.choice(["YEAR", "MONTH", "DAY", "QUARTER", "DOY"])
    dk = {"DOY": "dayofyear"}.get(unit, unit.lower())
    d = r.choice(g.t["str"])
    n = r.randrange(1, 30)
    choices = [
        (f"TIME_FLOOR(o_orderdate, '{p}')",
         f"date_trunc('{u}', o_orderdate)::TIMESTAMP"),
        # reference ceil returns an already-aligned timestamp unchanged
        # (TimestampCeilExprMacro.java:81-84: argTime == bucketStart)
        (f"TIME_CEIL(o_orderdate, '{p}')",
         f"(CASE WHEN date_trunc('{u}', o_orderdate) = o_orderdate "
         f"THEN o_orderdate ELSE date_trunc('{u}', o_orderdate) "
         f"+ INTERVAL 1 {u} END)::TIMESTAMP"),
        (f"TIME_EXTRACT(o_orderdate, '{unit}')",
         f"CAST(extract({dk} FROM o_orderdate) AS BIGINT)"),
        ("TIME_FORMAT(o_orderdate, 'yyyy-MM')",
         "strftime(o_orderdate, '%Y-%m')"),
        (f"TIME_SHIFT(o_orderdate, 'P1D', {n})",
         f"o_orderdate + INTERVAL {n} DAY"),
        (f"LEFT({d}, 3)", f"left({d}, 3)"),
        (f"RIGHT({d}, 2)", f"right({d}, 2)"),
        (f"CAST(STRPOS({d}, 'R') AS BIGINT)",
         f"CAST(strpos({d}, 'R') AS BIGINT)"),
        (f"REPLACE({d}, 'A', 'x')", f"replace({d}, 'A', 'x')"),
        (f"LPAD({d}, 8, '*')", f"lpad({d}, 8, '*')"),
        (f"REVERSE({d})", f"reverse({d})"),
        ("REGEXP_EXTRACT(o_orderpriority, '^[0-9]+')",
         "regexp_extract(o_orderpriority, '^[0-9]+')"),
        (f"MOD(o_custkey, {n})", f"CAST(mod(o_custkey, {n}) AS BIGINT)"),
        (f"SAFE_DIVIDE(CAST(o_totalprice AS DOUBLE), {n}.0)",
         f"CAST(o_totalprice AS DOUBLE) / {n}.0"),
    ]
    de, oe = r.choice(choices)
    pred = g.pred()
    tmpl = ("SELECT {e} AS g, CAST(COUNT(*) AS BIGINT) AS n, "
            "CAST(SUM(o_totalprice) AS DOUBLE) AS s "
            f"FROM orders WHERE {pred} GROUP BY 1")
    return tmpl.format(e=de), tmpl.format(e=oe)


def _gen_mv(r: random.Random):
    """Multi-value / array surface over derived arrays
    (STRING_TO_MV + MV_* / UNNEST — functions/register.py MV family,
    engine UNNEST datasource) vs DuckDB string_split/list functions.
    documents.text is the only corpus-ish column; arrays are derived
    because the testdata has no native array columns."""
    langs = ", ".join(f"'{v}'" for v in
                      r.sample(["de", "en", "es", "fr", "zh"],
                               r.randrange(1, 4)))
    pred = r.choice([f"lang IN ({langs})",
                     f"n_chars > {r.randrange(50, 400)}",
                     f"n_chars BETWEEN 100 AND {r.randrange(200, 500)}"])
    k = r.randrange(4)
    if k == 0:  # MV_LENGTH
        dq = ("SELECT MV_LENGTH(STRING_TO_MV(text, ' ')) AS g, "
              "CAST(COUNT(*) AS BIGINT) AS n FROM documents "
              f"WHERE {pred} GROUP BY 1")
        oq = ("SELECT CAST(len(string_split(text, ' ')) AS BIGINT) AS g, "
              "CAST(COUNT(*) AS BIGINT) AS n FROM documents "
              f"WHERE {pred} GROUP BY 1")
        return dq, oq
    if k == 1:  # MV_CONTAINS as a group key
        w = r.choice(["the", "a", "of", "data", "x"])
        dq = ("SELECT MV_CONTAINS(STRING_TO_MV(text, ' '), "
              f"'{w}') AS g, CAST(COUNT(*) AS BIGINT) AS n "
              f"FROM documents WHERE {pred} GROUP BY 1")
        oq = (f"SELECT list_contains(string_split(text, ' '), '{w}') "
              "AS g, CAST(COUNT(*) AS BIGINT) AS n "
              f"FROM documents WHERE {pred} GROUP BY 1")
        return dq, oq
    if k == 2:  # MV_OFFSET (0-based) vs duck list index (1-based)
        i = r.randrange(0, 3)
        dq = (f"SELECT MV_OFFSET(STRING_TO_MV(text, ' '), {i}) AS g, "
              "CAST(COUNT(*) AS BIGINT) AS n FROM documents "
              f"WHERE {pred} GROUP BY 1")
        oq = (f"SELECT string_split(text, ' ')[{i + 1}] AS g, "
              "CAST(COUNT(*) AS BIGINT) AS n FROM documents "
              f"WHERE {pred} GROUP BY 1")
        return dq, oq
    # UNNEST: token counts through the unnest datasource path
    lim = r.randrange(5, 20)
    dq = ("SELECT tok, CAST(COUNT(*) AS BIGINT) AS n "
          "FROM documents, UNNEST(STRING_TO_MV(text, ' ')) AS t(tok) "
          f"WHERE {pred} GROUP BY 1 "
          f"ORDER BY n DESC, tok LIMIT {lim}")
    oq = ("SELECT tok, CAST(COUNT(*) AS BIGINT) AS n FROM "
          "(SELECT unnest(string_split(text, ' ')) AS tok "
          f"FROM documents WHERE {pred}) GROUP BY 1 "
          f"ORDER BY n DESC, tok LIMIT {lim}")
    return dq, oq


def _gen_mv_inlined(r: random.Random):
    """The round-6 alias-inlined MV family (slice/append/prepend/
    filter/concat over derived arrays): these now compile to pure
    builtins (sqlshim alias inlining — the Spark 4.1 HOF-over-UDF
    hazard), so this arm keeps the inlined rewrites under continuous
    differential check, including HOF-over-agg shapes."""
    pred = f"n_chars > {r.randrange(50, 400)}"
    k = r.randrange(5)
    if k == 0:  # MV_SLICE bounds
        s = r.randrange(0, 3)
        e = s + r.randrange(1, 4)
        dq = ("SELECT ARRAY_TO_STRING(MV_SLICE(STRING_TO_MV(text, ' ')"
              f", {s}, {e}), '|') AS g, CAST(COUNT(*) AS BIGINT) AS n "
              f"FROM documents WHERE {pred} GROUP BY 1")
        oq = ("SELECT array_to_string(string_split(text, ' ')"
              f"[{s + 1}:{e}], '|') AS g, "
              "CAST(COUNT(*) AS BIGINT) AS n "
              f"FROM documents WHERE {pred} GROUP BY 1")
        return dq, oq
    if k == 1:  # MV_APPEND / MV_PREPEND round-trip length
        dq = ("SELECT MV_LENGTH(MV_APPEND(MV_PREPEND('x', "
              "STRING_TO_MV(text, ' ')), 'y')) AS g, "
              "CAST(COUNT(*) AS BIGINT) AS n "
              f"FROM documents WHERE {pred} GROUP BY 1")
        oq = ("SELECT CAST(len(string_split(text, ' ')) + 2 AS BIGINT) "
              "AS g, CAST(COUNT(*) AS BIGINT) AS n "
              f"FROM documents WHERE {pred} GROUP BY 1")
        return dq, oq
    if k == 2:  # MV_FILTER_PREFIX count
        p = r.choice(["a", "s", "th", "qu"])
        dq = ("SELECT MV_LENGTH(MV_FILTER_PREFIX(STRING_TO_MV(text, "
              f"' '), '{p}')) AS g, CAST(COUNT(*) AS BIGINT) AS n "
              f"FROM documents WHERE {pred} GROUP BY 1")
        # empty survivor set = NULL MVD (round 7 — reference
        # ListFilteredVirtualColumn semantics), so 0 maps to NULL
        oq = ("SELECT CASE WHEN g0 = 0 THEN NULL ELSE g0 END AS g, "
              "CAST(COUNT(*) AS BIGINT) AS n FROM "
              "(SELECT CAST(len(list_filter(string_split(text, ' '), "
              f"x -> starts_with(x, '{p}'))) AS BIGINT) AS g0 "
              f"FROM documents WHERE {pred}) GROUP BY 1")
        return dq, oq
    if k == 3:  # ARRAY_CONCAT over aggs wrapped in a HOF (the hazard)
        dq = ("SELECT lang, ARRAY_TO_STRING(array_sort(ARRAY_CONCAT("
              "ARRAY_AGG(DISTINCT source), ARRAY_AGG(DISTINCT source)"
              ")), ',') AS g FROM documents "
              f"WHERE {pred} GROUP BY lang ORDER BY lang")
        oq = ("SELECT lang, array_to_string(list_sort(list_concat("
              "l, l)), ',') AS g FROM "
              "(SELECT lang, list_sort(list(DISTINCT source)) AS l "
              f"FROM documents WHERE {pred} GROUP BY lang) "
              "ORDER BY lang")
        return dq, oq
    # MV_FILTER_ONLY with a literal allowlist
    words = ", ".join(f"'{w}'" for w in
                      r.sample(["the", "a", "of", "data", "scan",
                                "query"], 3))
    dq = ("SELECT MV_LENGTH(MV_FILTER_ONLY(STRING_TO_MV(text, ' '), "
          f"ARRAY[{words}])) AS g, CAST(COUNT(*) AS BIGINT) AS n "
          f"FROM documents WHERE {pred} GROUP BY 1")
    # empty survivor set = NULL MVD (round 7), 0 maps to NULL
    oq = ("SELECT CASE WHEN g0 = 0 THEN NULL ELSE g0 END AS g, "
          "CAST(COUNT(*) AS BIGINT) AS n FROM "
          "(SELECT CAST(len(list_filter(string_split(text, ' '), "
          f"x -> list_contains([{words}], x))) AS BIGINT) AS g0 "
          f"FROM documents WHERE {pred}) GROUP BY 1")
    return dq, oq


def _gen_scalar_subquery(r: random.Random) -> str:
    table = r.choice(list(TABLES))
    g = Gen(r, table)
    m = r.choice(g.t["num"])
    dim = r.choice(g.t["str"])
    sub = f"(SELECT AVG(CAST({m} AS DOUBLE)) FROM {table})"
    return (f"SELECT {dim}, CAST(COUNT(*) AS BIGINT) AS a0 "
            f"FROM {table} WHERE CAST({m} AS DOUBLE) "
            f"{r.choice(['>', '<='])} {sub} "
            f"GROUP BY {dim} ORDER BY {dim} NULLS FIRST")


# --------------------------------------------------------- hostile arm

# String literals whose CONTENT is SQL-shaped: keywords, operators,
# doubled quotes, backslashes, rewrite trigger-spellings (ARRAY[...],
# OVER (, UNNEST(...), INTERVAL, TIME_* calls, JSONPaths, druid.
# qualifiers). The mask-once pipeline (sqlshim._MaskCtx) must keep
# every rewrite from firing inside these values; each query runs
# differentially vs DuckDB so a mangled literal shows up as a value
# or row diff, not just a parse error.
HOSTILE_LITS = [
    "ARRAY[1, 2, 3]",
    "it''s a trap",
    "a''||''b",
    ") OVER (ORDER BY x)",
    "GROUP BY () HAVING",
    "SELECT * FROM t WHERE x = ''1''",
    "INTERVAL ''7'' DAY (3)",
    "INTERVAL ''2'' QUARTER",
    "TIME_FLOOR(__time, ''P1D'')",
    "TIME_PARSE(x, ''yyyy'')",
    "CAST(x AS CHAR)",
    "$.array[-1]",
    "$[''a''][-1]",
    "druid.lineitem",
    "CROSS JOIN UNNEST(a) AS u(c)",
    ", UNNEST(ARRAY[1]) AS u(c)",
    "STRING_TO_ARRAY(a, '','')",
    "MV_CONTAINS(x, ''y'')",
    "EARLIEST(x, 10)",
    "110\\|220",
    "\\d+\\.\\w*",
    "a\\'' ORDER BY",
    "POSITION('' IN x FROM 2)",
    "-- comment",
    "/* block */ SELECT",
    "LIKE ''%x%'' ESCAPE",
    "ROWS BETWEEN 1 PRECEDING AND CURRENT ROW",
    "GROUPING SETS ((a), ())",
]


def _gen_hostile(r: random.Random):
    """One random hostile literal embedded in a random rewrite-bearing
    context; returns portable SQL or a (druid, duckdb) pair."""
    lit = "'" + r.choice(HOSTILE_LITS) + "'"
    table = r.choice(list(TABLES))
    g = Gen(r, table)
    c = r.choice(g.t["str"])
    n = r.choice(g.t["num"])
    shape = r.randrange(8)
    if shape == 0:
        # comparison + aggregate: hostile literal in WHERE
        return (f"SELECT COUNT(*) AS n FROM {table} "
                f"WHERE {c} <> {lit} OR {c} IS NULL")
    if shape == 1:
        # CONCAT through the projection
        return (f"SELECT MIN(LENGTH(CONCAT({c}, {lit}))) AS n "
                f"FROM {table}")
    if shape == 2:
        # REPLACE with a hostile needle (never matches)
        return (f"SELECT COUNT(DISTINCT REPLACE({c}, {lit}, 'x')) "
                f"AS n FROM {table}")
    if shape == 3:
        # POSITION(... IN ...) goes through the FROM-variant rewrite
        return (f"SELECT MAX(POSITION({lit} IN {c})) AS n "
                f"FROM {table}")
    if shape == 4:
        # STRING_AGG separator is the hostile literal; LENGTH
        # finalizes order-independently. The LIMIT cut must be total:
        # order by a UNIQUE key (non-unique keys pick different rows
        # per engine — caught by seeds 135/148).
        uk = {"orders": "o_orderkey", "customer": "c_custkey",
              "documents": "doc_id"}
        table = r.choice(list(uk))
        c = r.choice(TABLES[table]["str"])
        return (f"SELECT LENGTH(STRING_AGG({c}, {lit})) AS n "
                f"FROM (SELECT {c} FROM {table} WHERE {c} IS NOT NULL "
                f"ORDER BY {uk[table]} LIMIT 5) t")
    if shape == 5:
        # ARRAY constructor contents (druid) vs IN list (duckdb)
        dq = (f"SELECT COUNT(*) AS n FROM {table} "
              f"WHERE ARRAY_CONTAINS(ARRAY[{lit}, 'zz'], {c})")
        oq = (f"SELECT COUNT(*) AS n FROM {table} "
              f"WHERE {c} IN ({lit}, 'zz')")
        return dq, oq
    if shape == 6:
        # CASE arms + IN list
        return (f"SELECT SUM(CASE WHEN {c} IN ({lit}, {lit}) THEN 1 "
                f"ELSE 0 END) AS n FROM {table}")
    # window partition untouched by the hostile projection literal
    return (f"SELECT MAX(rn) AS n FROM (SELECT ROW_NUMBER() OVER "
            f"(PARTITION BY {c} ORDER BY {n}) AS rn, {lit} AS h "
            f"FROM {table}) t")


def run_hostile_fuzz(n: int = 100, seed0: int = 0,
                     sf_dir: str = "/root/testdata/sf0.001",
                     engine=None, con=None, verbose: bool = True):
    """Differential fuzz where every query carries an SQL-shaped
    string literal through a rewrite-bearing context."""
    import duckdb
    if engine is None:
        from druid_spark import DruidSparkEngine
        from druid_spark.session import get_spark
        engine = DruidSparkEngine(get_spark(), data_dir=sf_dir,
                                  sketch_default_nominal_entries=None)
    if con is None:
        con = duckdb.connect()
        for t in TABLES:
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                        f"read_parquet('{sf_dir}/{t}.parquet')")
    bad = []
    for i in range(n):
        seed = seed0 + i
        q = _gen_hostile(random.Random(seed))
        dq, oq = (q, q) if isinstance(q, str) else q
        try:
            sdf = engine.sql(dq)
            srows = canon_rows(sdf.columns,
                               [tuple(r) for r in sdf.collect()])
            res = con.execute(oq)
            orows = canon_rows([d[0] for d in res.description],
                               res.fetchall())
        except Exception as e:
            bad.append((seed, dq, f"error: {type(e).__name__}: {e}"))
            if verbose:
                print(f"HOSTILE ERROR seed={seed}\n  {dq}\n  {e}")
            continue
        if srows != orows and not rows_close(srows, orows):
            diff = [p for p in zip(srows, orows) if p[0] != p[1]][:3]
            bad.append((seed, dq, f"rows {len(srows)}/{len(orows)} "
                                  f"diff={diff}"))
            if verbose:
                print(f"HOSTILE MISMATCH seed={seed}\n  {dq}\n  "
                      f"spark={len(srows)} duck={len(orows)} {diff}")
    return bad


def canon_rows(cols, rows):
    out = []
    for row in rows:
        vals = []
        for v in row:
            if isinstance(v, float):
                if math.isnan(v):
                    vals.append("nan")
                elif v == 0:
                    vals.append("0")
                else:
                    # 7 sig figs: big float SUMs legitimately differ
                    # at ~1e-9 relative between engines (summation
                    # order); anything a user would call a wrong
                    # answer still trips this
                    vals.append(f"{v:.7g}")
            else:
                vals.append(repr(v))
        out.append(tuple(vals))
    return sorted(out)


def rows_close(srows, orows, rel=2e-6, abs_=1e-7):
    """Second-pass tolerant compare over canon_rows output.

    canon_rows renders floats at 7 significant digits; when the two
    engines' float SUMs differ by a last-ulp summation-order delta
    that straddles a rounding midpoint (e.g. 724077.449999 vs
    724077.450001), the canon strings differ in the final digit even
    though the values agree to ~1e-9 relative. Treat the rowsets as
    equal iff a one-to-one matching exists where every non-numeric
    field is string-identical and every numeric field agrees within
    `rel` relative tolerance (one ulp at 7 sig figs). O(n^2) greedy,
    but it only runs after the exact compare already failed.
    """
    if len(srows) != len(orows):
        return False

    def _num(s):
        try:
            return float(s)
        except (TypeError, ValueError):
            return None

    remaining = list(orows)
    for sr in srows:
        hit = None
        for j, orow in enumerate(remaining):
            if len(sr) != len(orow):
                continue
            ok = True
            for a, b in zip(sr, orow):
                if a == b:
                    continue
                fa, fb = _num(a), _num(b)
                if fa is None or fb is None or not math.isclose(
                        fa, fb, rel_tol=rel, abs_tol=abs_):
                    ok = False
                    break
            if ok:
                hit = j
                break
        if hit is None:
            return False
        remaining.pop(hit)
    return True


def run_fuzz(n: int = 100, seed0: int = 0,
             sf_dir: str = "/root/testdata/sf0.001",
             engine=None, con=None, verbose: bool = True):
    """Returns list of (seed, query, detail) mismatches."""
    import duckdb
    if engine is None:
        from druid_spark import DruidSparkEngine
        from druid_spark.session import get_spark
        # sketch_default_nominal_entries=None: this is a differential
        # harness vs an EXACT DuckDB oracle — a default sketch cap
        # changes set-op counts above the cap (r6: fuzz seed 500,
        # >4096 distinct keys), so the fold must stay exact here.
        engine = DruidSparkEngine(get_spark(), data_dir=sf_dir,
                                  sketch_default_nominal_entries=None)
    if con is None:
        con = duckdb.connect()
        for t in TABLES:
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                        f"read_parquet('{sf_dir}/{t}.parquet')")
    bad = []
    for i in range(n):
        seed = seed0 + i
        q = gen_query(seed)
        dq, oq = (q, q) if isinstance(q, str) else q
        try:
            sdf = engine.sql(dq)
            srows = canon_rows(sdf.columns,
                               [tuple(r) for r in sdf.collect()])
            res = con.execute(oq)
            orows = canon_rows([d[0] for d in res.description],
                               res.fetchall())
        except Exception as e:
            bad.append((seed, q, f"error: {type(e).__name__}: {e}"))
            if verbose:
                print(f"FUZZ ERROR seed={seed}\n  {q}\n  {e}")
            continue
        if srows != orows and not rows_close(srows, orows):
            diff = [p for p in zip(srows, orows) if p[0] != p[1]][:3]
            bad.append((seed, q, f"rows {len(srows)}/{len(orows)} "
                                 f"diff={diff}"))
            if verbose:
                print(f"FUZZ MISMATCH seed={seed}\n  {q}\n  "
                      f"spark={len(srows)} duck={len(orows)} {diff}")
        elif verbose and i % 20 == 0:
            print(f"  ok {i}/{n} (seed {seed})")
    return bad


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    s0 = int(sys.argv[2]) if len(sys.argv) > 2 else 0
    sf = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.001"
    if "--hostile" in sys.argv:
        bad = run_hostile_fuzz(n, s0, sf)
    else:
        bad = run_fuzz(n, s0, sf)
    print(f"\n{n - len(bad)} ok, {len(bad)} mismatches")
    sys.exit(1 if bad else 0)
