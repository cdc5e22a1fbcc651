"""Druid native expression language → Spark Column compiler.

The reference embeds its own expression language (grammar:
processing/src/main/antlr/Expr.g4; function registry
processing/.../math/expr/Function.java — 131 functions;
apply/lambda functions processing/.../math/expr/ApplyFunction.java;
macros processing/.../query/expression/). Expressions appear in virtual
columns, transforms, expression filters and expression aggregators.

Spark-first design: parse the expression to a small AST (Pratt parser,
no ANTLR) and compile straight to `pyspark.sql.Column` trees — every
function maps to a built-in `F.*` / higher-order function so the result
stays inside whole-stage codegen. No Python UDFs anywhere in this path.

Divergence from the reference (documented): `__time` and time values
are TimestampType end-to-end (Druid exposes long millis);
`timestamp_floor` etc. return timestamps, `unix_timestamp` returns
seconds, `unix_millis` millis.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from typing import Any, Callable

from pyspark.sql import Column
from pyspark.sql import functions as F

from druid_spark import granularity as G

# ---------------------------------------------------------------- tokenizer

_TOKEN_RE = re.compile(
    r"""
    (?P<ws>\s+)
  | (?P<number>\d+\.\d*(?:[eE][+-]?\d+)?|\.\d+(?:[eE][+-]?\d+)?|\d+(?:[eE][+-]?\d+)?)
  | (?P<string>'(?:[^'\\]|\\.)*')
  | (?P<qident>"(?:[^"\\]|\\.)*")
  | (?P<ident>[A-Za-z_][A-Za-z0-9_$]*)
  | (?P<arrow>->)
  | (?P<op><=|>=|==|!=|&&|\|\||[-+*/%^<>!(),\[\]])
    """,
    re.VERBOSE,
)


@dataclass
class Tok:
    kind: str
    val: str


def _tokenize(s: str) -> list[Tok]:
    toks, pos = [], 0
    while pos < len(s):
        m = _TOKEN_RE.match(s, pos)
        if not m:
            raise ValueError(f"bad token at {pos!r} in {s!r}")
        pos = m.end()
        kind = m.lastgroup
        if kind == "ws":
            continue
        toks.append(Tok(kind, m.group()))
    toks.append(Tok("eof", ""))
    return toks


# ---------------------------------------------------------------- AST

@dataclass
class Lit:
    value: Any


@dataclass
class Ref:
    name: str


@dataclass
class Un:
    op: str
    x: Any


@dataclass
class Bin:
    op: str
    l: Any
    r: Any


@dataclass
class Call:
    name: str
    args: list


@dataclass
class Lambda:
    params: list[str]
    body: Any


_BIN_PREC = {
    "||": 1, "&&": 2,
    "==": 3, "!=": 3, "<": 3, "<=": 3, ">": 3, ">=": 3,
    "+": 4, "-": 4,
    "*": 5, "/": 5, "%": 5,
    "^": 6,
}


class _Parser:
    def __init__(self, toks: list[Tok]):
        self.toks = toks
        self.i = 0

    def peek(self) -> Tok:
        return self.toks[self.i]

    def next(self) -> Tok:
        t = self.toks[self.i]
        self.i += 1
        return t

    def expect(self, val: str) -> None:
        t = self.next()
        if t.val != val:
            raise ValueError(f"expected {val!r} got {t.val!r}")

    def parse(self):
        e = self.expr(0)
        if self.peek().kind != "eof":
            raise ValueError(f"trailing input at {self.peek().val!r}")
        return e

    def expr(self, min_prec: int):
        left = self.unary()
        while True:
            t = self.peek()
            prec = _BIN_PREC.get(t.val)
            if t.kind != "op" or prec is None or prec < min_prec:
                return left
            self.next()
            # ^ is right-associative in the reference grammar
            nxt = prec if t.val == "^" else prec + 1
            left = Bin(t.val, left, self.expr(nxt))

    def unary(self):
        t = self.peek()
        if t.val in ("-", "!"):
            self.next()
            return Un(t.val, self.unary())
        return self.primary()

    def primary(self):
        t = self.next()
        if t.kind == "number":
            txt = t.val
            if "." in txt or "e" in txt or "E" in txt:
                return Lit(float(txt))
            return Lit(int(txt))
        if t.kind == "string":
            return Lit(t.val[1:-1].replace("\\'", "'").replace("\\\\", "\\"))
        if t.kind == "qident":
            return Ref(t.val[1:-1])
        if t.kind == "ident":
            name = t.val
            low = name.lower()
            if low == "null":
                return Lit(None)
            if low == "true":
                return Lit(True)
            if low == "false":
                return Lit(False)
            if self.peek().val == "(":
                self.next()
                args = self.call_args()
                return Call(name, args)
            if self.peek().kind == "arrow":  # single-param lambda: x -> body
                self.next()
                return Lambda([name], self.expr(0))
            return Ref(name)
        if t.val == "(":
            # lambda param list `(x, y) -> body` or parenthesized expr
            save = self.i
            params = self._try_params()
            if params is not None and self.peek().kind == "arrow":
                self.next()
                return Lambda(params, self.expr(0))
            self.i = save
            e = self.expr(0)
            self.expect(")")
            return e
        if t.val == "[":  # array literal [1, 2, 3]
            items = []
            if self.peek().val != "]":
                items.append(self.expr(0))
                while self.peek().val == ",":
                    self.next()
                    items.append(self.expr(0))
            self.expect("]")
            return Call("array", items)
        raise ValueError(f"unexpected token {t.val!r}")

    def _try_params(self):
        params = []
        if self.peek().val == ")":
            self.next()
            return params
        while True:
            t = self.next()
            if t.kind != "ident":
                return None
            params.append(t.val)
            t = self.next()
            if t.val == ")":
                return params
            if t.val != ",":
                return None

    def call_args(self):
        args = []
        if self.peek().val == ")":
            self.next()
            return args
        args.append(self.expr(0))
        while self.peek().val == ",":
            self.next()
            args.append(self.expr(0))
        self.expect(")")
        return args


def parse(expr: str):
    return _Parser(_tokenize(expr)).parse()


# ---------------------------------------------------------------- compiler

Resolver = Callable[[str], Column]


def _lit_of(node) -> Any:
    if isinstance(node, Lit):
        return node.value
    raise ValueError(f"expected literal arg, got {node}")


class Compiler:
    """AST → Column. `resolver` maps a column name to a Column (lets the
    query layer inject virtual columns); `lookups` maps lookup name →
    dict for the lookup() function (broadcast at plan time as a map
    literal or join — see lookups.py)."""

    def __init__(self, resolver: Resolver | None = None, lookups=None):
        self.resolver = resolver or F.col
        self.lookups = lookups or {}

    def compile(self, node, env: dict[str, Column] | None = None) -> Column:
        env = env or {}
        return self._c(node, env)

    def _c(self, n, env) -> Column:
        if isinstance(n, Lit):
            return F.lit(n.value)
        if isinstance(n, Ref):
            if n.name in env:
                return env[n.name]
            return self.resolver(n.name)
        if isinstance(n, Un):
            x = self._c(n.x, env)
            return (~x.cast("boolean")) if n.op == "!" else (-x)
        if isinstance(n, Bin):
            l, r = self._c(n.l, env), self._c(n.r, env)
            return _BIN_OPS[n.op](l, r)
        if isinstance(n, Call):
            return self._call(n, env)
        raise ValueError(f"cannot compile {n}")

    # -- lambda helpers: Spark higher-order fns take python callables
    def _hof1(self, lam: Lambda, env):
        def fn(x):
            return self._c(lam.body, {**env, lam.params[0]: x})
        return fn

    def _hof2(self, lam: Lambda, env, swap=False):
        def fn(a, b):
            p = lam.params
            if swap:
                a, b = b, a
            return self._c(lam.body, {**env, p[0]: a, p[1]: b})
        return fn

    def _call(self, n: Call, env) -> Column:
        name = n.name.lower()
        args = n.args

        # apply (lambda) functions — ApplyFunction.java
        if name == "map":
            return F.transform(self._c(args[1], env), self._hof1(args[0], env))
        if name == "filter":
            return F.filter(self._c(args[1], env), self._hof1(args[0], env))
        if name == "any":
            return F.exists(self._c(args[1], env), self._hof1(args[0], env))
        if name == "all":
            return F.forall(self._c(args[1], env), self._hof1(args[0], env))
        if name == "fold":
            # fold((x, acc) -> .., arr, init): druid lambda is (elem, acc);
            # Spark aggregate merge is (acc, elem) — swap.
            return F.aggregate(
                self._c(args[1], env), self._c(args[2], env),
                self._hof2(args[0], env, swap=True),
            )
        if name == "cartesian_map":
            # cartesian_map((x,y) -> .., xs, ys): lambda over the cross
            # product — nested transform + flatten
            fn2 = self._hof2(args[0], env)
            xs, ys = self._c(args[1], env), self._c(args[2], env)
            return F.flatten(F.transform(
                xs, lambda x: F.transform(ys, lambda y: fn2(x, y))))
        if name == "cartesian_fold":
            # cartesian_fold((x,y,acc) -> .., xs, ys, init): fold over
            # the cross product; the 3-arg lambda binds both elements
            lam = args[0]
            xs, ys = self._c(args[1], env), self._c(args[2], env)
            init = self._c(args[3], env)

            def outer(acc, x):
                def inner(acc2, y):
                    p = lam.params
                    return self._c(lam.body, {**env, p[0]: x, p[1]: y,
                                              p[2]: acc2})
                return F.aggregate(ys, acc, inner)
            return F.aggregate(xs, init, outer)

        if name == "lookup":
            lk = self.lookups[_lit_of(args[1])]
            key = self._c(args[0], env)
            mapping = F.create_map(*[F.lit(x) for kv in lk.items() for x in kv])
            out = mapping.getItem(key)
            if len(args) > 2:  # replaceMissingValueWith
                out = F.coalesce(out, self._c(args[2], env))
            return out

        if name == "case_searched":
            return self._case_searched(args, env)
        if name == "case_simple":
            return self._case_simple(args, env)
        if name == "if":
            c, a, b = (self._c(a, env) for a in args)
            return F.when(c.cast("boolean"), a).otherwise(b)

        if name == "cast":
            return self._c(args[0], env).cast(_SPARK_TYPE[_lit_of(args[1]).upper()])

        # time macros — query/expression/TimestampFloorExprMacro.java etc.
        if name in ("timestamp_floor", "timestamp_ceil"):
            ts = self._c(args[0], env)
            period = _lit_of(args[1])
            origin = _lit_of(args[2]) if len(args) > 2 else None
            tz = _lit_of(args[3]) if len(args) > 3 else None
            gran = {"type": "period", "period": period}
            if origin:
                gran["origin"] = origin
            if tz:
                gran["timeZone"] = tz
            floored = G.bucket(ts, gran)
            if name == "timestamp_floor":
                return floored
            shifted = _shift(floored, period, 1)
            return F.when(floored == ts, ts).otherwise(shifted)
        if name == "timestamp_shift":
            ts = self._c(args[0], env)
            period = _lit_of(args[1])
            step = _lit_of(args[2]) if len(args) > 2 else 1
            return _shift(ts, period, step)
        if name == "timestamp_extract":
            ts = self._c(args[0], env)
            unit = _lit_of(args[1]).upper()
            tz = _lit_of(args[2]) if len(args) > 2 else None
            if tz and tz != "UTC":
                ts = F.from_utc_timestamp(ts, tz)
            return _extract(unit, ts)
        if name == "timestamp_format":
            ts = self._c(args[0], env)
            pat = _lit_of(args[1]) if len(args) > 1 else "yyyy-MM-dd'T'HH:mm:ss'Z'"
            tz = _lit_of(args[2]) if len(args) > 2 else None
            if tz and tz != "UTC":
                ts = F.from_utc_timestamp(ts, tz)
            return F.date_format(ts, _joda_to_jdk(pat))
        if name in ("timestamp_parse", "timestamp"):
            s = self._c(args[0], env)
            pat = _lit_of(args[1]) if len(args) > 1 else None
            if pat:
                return F.to_timestamp(s, _joda_to_jdk(pat))
            return F.to_timestamp(F.replace(s, F.lit("T"), F.lit(" ")))

        fn = _FUNCS.get(name)
        if fn is None:
            raise NotImplementedError(f"druid expr function: {name}")
        return fn([self._c(a, env) for a in args], [a for a in args])

    def _case_searched(self, args, env):
        out = None
        i = 0
        while i + 1 < len(args):
            c = self._c(args[i], env).cast("boolean")
            v = self._c(args[i + 1], env)
            out = F.when(c, v) if out is None else out.when(c, v)
            i += 2
        if i < len(args):
            out = out.otherwise(self._c(args[i], env))
        return out

    def _case_simple(self, args, env):
        base = self._c(args[0], env)
        out = None
        i = 1
        while i + 1 < len(args):
            c = base == self._c(args[i], env)
            v = self._c(args[i + 1], env)
            out = F.when(c, v) if out is None else out.when(c, v)
            i += 2
        if i < len(args):
            out = out.otherwise(self._c(args[i], env))
        return out


_BIN_OPS = {
    "+": lambda l, r: l + r,
    "-": lambda l, r: l - r,
    "*": lambda l, r: l * r,
    "/": lambda l, r: l / r,
    "%": lambda l, r: l % r,
    "^": lambda l, r: F.pow(l, r),
    "==": lambda l, r: l == r,
    "!=": lambda l, r: l != r,
    "<": lambda l, r: l < r,
    "<=": lambda l, r: l <= r,
    ">": lambda l, r: l > r,
    ">=": lambda l, r: l >= r,
    "&&": lambda l, r: l.cast("boolean") & r.cast("boolean"),
    "||": lambda l, r: l.cast("boolean") | r.cast("boolean"),
}

_SPARK_TYPE = {
    "LONG": "long", "DOUBLE": "double", "FLOAT": "float", "STRING": "string",
    "ARRAY<LONG>": "array<long>", "ARRAY<DOUBLE>": "array<double>",
    "ARRAY<STRING>": "array<string>",
}

_EXTRACT_UNIT = {
    "EPOCH": lambda ts: F.unix_timestamp(ts),
    "MILLISECOND": lambda ts: (F.unix_millis(ts) % 1000),
    "SECOND": lambda ts: F.second(ts),
    "MINUTE": lambda ts: F.minute(ts),
    "HOUR": lambda ts: F.hour(ts),
    "DAY": lambda ts: F.dayofmonth(ts),
    # DOW and ISODOW are BOTH joda dayOfWeek (Mon=1..Sun=7) in the
    # reference (TimestampExtractExprMacro.java:88-90); Spark's
    # dayofweek is Sun=1, hence the shift
    "DOW": lambda ts: (F.dayofweek(ts) + 5) % 7 + 1,
    "ISODOW": lambda ts: (F.dayofweek(ts) + 5) % 7 + 1,
    "DOY": lambda ts: F.dayofyear(ts),
    "WEEK": lambda ts: F.weekofyear(ts),
    "MONTH": lambda ts: F.month(ts),
    "QUARTER": lambda ts: F.quarter(ts),
    "YEAR": lambda ts: F.year(ts),
    "ISOYEAR": lambda ts: F.year(ts),
    "DECADE": lambda ts: F.floor(F.year(ts) / 10).cast("long"),
    "CENTURY": lambda ts: F.ceil(F.year(ts) / 100).cast("long"),
    "MILLENNIUM": lambda ts: F.ceil(F.year(ts) / 1000).cast("long"),
}


def _extract(unit: str, ts: Column) -> Column:
    return _EXTRACT_UNIT[unit](ts)


_PERIOD_UNIT = {
    "PT1S": ("second", 1), "PT1M": ("minute", 1), "PT1H": ("hour", 1),
    "P1D": ("day", 1), "P1W": ("week", 1), "P1M": ("month", 1),
    "P3M": ("month", 3), "P1Y": ("year", 1),
}


def _shift(ts: Column, period: str, step: int) -> Column:
    if period in _PERIOD_UNIT:
        unit, mult = _PERIOD_UNIT[period]
        return ts + F.expr(f"interval {step * mult} {unit}")
    ms = G.period_to_millis(period)
    return F.timestamp_millis(F.unix_millis(ts) + F.lit(ms * step))


def _joda_to_jdk(pat: str) -> str:
    # Joda and java.time patterns agree for the common letters we use.
    return pat


def _f(fn):
    """wrap a columns-only function"""
    return lambda cols, nodes: fn(*cols)


def jpath_norm(j: Column, path: str) -> "Column | str":
    """Validate + normalize a literal JSONPath for get_json_object.

    - Must start with '$' (getJsonPathPartsFromLiteral,
      NestedDataExpressions.java — CalciteNestedDataQueryTest
      testGroupByInvalidPath pins the error text).
    - A trailing negative array index (NestedPathFinder supports
      them — testJsonPathNegativeIndex) becomes a runtime-computed
      positive index: len(array at prefix) + n.
    Returns a str when the path needs no rewrite (the fast literal
    path in GetJsonObject), else a Column.
    """
    if not path.startswith("$"):
        raise ValueError(
            f"JSONPath [{path}] is invalid, it must start with '$'")
    m = re.search(r"\[(-\d+)\]$", path)
    if not m:
        return path
    pre = path[:m.start()] or "$"
    ln = F.json_array_length(F.get_json_object(j, pre))
    return F.concat(F.lit(pre + "["),
                    (ln + F.lit(int(m.group(1)))).cast("string"),
                    F.lit("]"))


def _jget(j: Column, path: str) -> Column:
    np = jpath_norm(j, path)
    if isinstance(np, str):
        return F.get_json_object(j, np)
    return F.call_function("get_json_object", j, np)


def json_value_scalar(j: Column, path: str) -> Column:
    """json_value is SCALAR-only (JsonValueExprMacro eval — objects and
    arrays at the path yield missing; CalciteNestedDataQueryTest
    testGroupByRootPath pins null groups for object rows). Structure is
    detected by parseability of the extracted text, so string scalars
    containing braces survive; a string scalar whose text IS valid JSON
    structure is indistinguishable post-extraction (documented edge)."""
    # a JSON null at the path extracts as the text 'null' — Druid's
    # json_value returns SQL NULL there (qaArray schmdisc goldens:
    # count(json_value(a_null,'$[0]')) = 0). A string scalar whose
    # text is "null" is indistinguishable post-extraction (same
    # documented edge as structure-by-parseability below).
    raw = F.nullif(_jget(j, path), F.lit("null"))
    is_struct = (F.json_object_keys(raw).isNotNull()
                 | F.json_array_length(raw).isNotNull())
    out = F.when(~is_struct, raw)
    if path in ("$", "$."):
        # root path on NON-JSON input is the raw scalar: plain strings
        # are values, never parsed (qaJsonCols json_value.01 A006)
        out = F.when(raw.isNull() & j.isNotNull() & (j != F.lit("")),
                     j).otherwise(out)
    return out


def json_query_render(j: Column, path: str) -> Column:
    """json_query keeps structure and renders it as NESTED_DATA —
    string scalars come back JSON-quoted (testJsonQuery pins
    JSON_QUERY(nester,'$') = '"hello"' for the scalar-string row).
    Numbers/booleans render bare; backslash and quote are JSON-escaped
    (control characters inside strings are not re-escaped — documented
    edge of the text-extraction path)."""
    raw = _jget(j, path)
    is_struct = (F.json_object_keys(raw).isNotNull()
                 | F.json_array_length(raw).isNotNull())
    bare = raw.isin("true", "false") | raw.try_cast("double").isNotNull()

    def quote(x):
        return F.concat(
            F.lit('"'),
            F.replace(F.replace(x, F.lit("\\"), F.lit("\\\\")),
                      F.lit('"'), F.lit('\\"')),
            F.lit('"'))

    out = (F.when(raw.isNull(), F.lit(None).cast("string"))
            .when(is_struct | bare, raw)
            .otherwise(quote(raw)))
    if path in ("$", "$."):
        # root path on NON-JSON input renders the raw scalar quoted
        # (qaJsonCols json_query.01: json_query('ABCD','$') = '"ABCD"')
        out = F.when(raw.isNull() & j.isNotNull() & (j != F.lit("")),
                     quote(j)).otherwise(out)
    return out


def _json_value_native(j: Column, nodes) -> Column:
    """2-arg json_value = scalar-only; 3-arg (JsonValueCastExpr) casts
    to the named ExpressionType — ARRAY types keep primitive arrays
    (isPrimitiveArray passes in the reference's eval)."""
    path = _lit_of(nodes[1])
    if len(nodes) > 2:
        t = str(_lit_of(nodes[2])).upper().replace(" ", "")
        if t.startswith("ARRAY"):
            elem = {"ARRAY<LONG>": "bigint", "ARRAY<DOUBLE>": "double",
                    "ARRAY<FLOAT>": "float"}.get(t, "string")
            return F.from_json(_jget(j, path), f"array<{elem}>")
        base = {"LONG": "long", "DOUBLE": "double", "FLOAT": "float",
                "STRING": "string"}.get(t, "string")
        return json_value_scalar(j, path).cast(base)
    return json_value_scalar(j, path)


def json_keys_at(j: Column, path: str = "$") -> Column:
    """json_keys(expr, path): object keys at path; null for scalars,
    arrays, and non-JSON input (testJsonKeysNonJsonInput)."""
    if path in ("$", "$."):
        return F.json_object_keys(j)
    return F.json_object_keys(_jget(j, path))


_FUNCS: dict[str, Callable] = {
    # math — Function.java
    "abs": _f(F.abs), "acos": _f(F.acos), "asin": _f(F.asin), "atan": _f(F.atan),
    "atan2": _f(F.atan2), "cbrt": _f(F.cbrt), "ceil": _f(F.ceil), "cos": _f(F.cos),
    "cosh": _f(F.cosh), "cot": _f(lambda x: F.cos(x) / F.sin(x)),
    "div": _f(lambda a, b: (a / b).cast("long")),
    "exp": _f(F.exp), "expm1": _f(F.expm1), "floor": _f(F.floor),
    "hypot": _f(F.hypot), "log": _f(F.log), "log10": _f(F.log10),
    "log1p": _f(F.log1p), "pi": _f(lambda: F.lit(3.141592653589793)),
    "pow": _f(F.pow), "rint": _f(F.rint), "signum": _f(F.signum),
    "sin": _f(F.sin), "sinh": _f(F.sinh), "sqrt": _f(F.sqrt), "tan": _f(F.tan),
    "tanh": _f(F.tanh),
    "round": lambda cols, nodes: F.round(cols[0], _lit_of(nodes[1]) if len(cols) > 1 else 0),
    "safe_divide": _f(lambda a, b: F.when(b != 0, a / b)),
    "greatest": _f(F.greatest), "least": _f(F.least),
    "max": _f(F.greatest), "min": _f(F.least),
    "scalb": _f(lambda x, y: x * F.pow(F.lit(2.0), y)),
    "todegrees": _f(F.degrees), "toradians": _f(F.radians),
    # exact java.lang.Math semantics (signed zero, IEEE edge cases) via
    # JVM reflection — same tradeoff as the IEEE bits conversions in
    # functions/register.py: JVM-side, outside codegen, rare scalars
    "copysign": _f(lambda x, y: F.reflect(
        F.lit("java.lang.Math"), F.lit("copySign"),
        x.cast("double"), y.cast("double")).cast("double")),
    "nextafter": _f(lambda x, y: F.reflect(
        F.lit("java.lang.Math"), F.lit("nextAfter"),
        x.cast("double"), y.cast("double")).cast("double")),
    "remainder": _f(lambda x, y: F.reflect(
        F.lit("java.lang.Math"), F.lit("IEEEremainder"),
        x.cast("double"), y.cast("double")).cast("double")),
    "ulp": _f(lambda x: F.reflect(
        F.lit("java.lang.Math"), F.lit("ulp"),
        x.cast("double")).cast("double")),
    "now": _f(F.current_timestamp),
    # string
    "concat": _f(F.concat),
    "format": lambda cols, nodes: F.format_string(_lit_of(nodes[0]), *cols[1:]),
    "lower": _f(F.lower), "upper": _f(F.upper), "strlen": _f(F.length),
    "strpos": _f(lambda s, sub: F.instr(s, sub) - 1),
    # druid substring is 0-based; length -1 means "to end"
    "substring": lambda cols, nodes: F.substring(
        cols[0], _lit_of(nodes[1]) + 1,
        _lit_of(nodes[2]) if _lit_of(nodes[2]) >= 0 else 2**31 - 1),
    # negative lengths are validation errors in the reference
    # (Function.java LeftFunc:2961 / RightFunc:2933); counts < 1 make
    # repeat NULL (RepeatFunc:3111)
    "right": _f(lambda s, n: F.when(
        n < 0, F.expr("raise_error('Function[right] needs a positive "
                      "integer as the second argument')").cast("string"))
        .when(n == 0, F.lit(""))
        .otherwise(F.substring(s, -F.least(n, F.length(s)).cast("int"),
                               2**31 - 1))),
    "left": _f(lambda s, n: F.when(
        n < 0, F.expr("raise_error('Function[left] needs a positive "
                      "integer as the second argument')").cast("string"))
        .otherwise(F.substring(s, 1, n))),
    "replace": _f(lambda s, a, b: F.replace(s, a, b)),
    "lpad": _f(F.lpad), "rpad": _f(F.rpad),
    "repeat": _f(lambda s, n: F.when(n >= 1, F.repeat(s, n.cast("int")))),
    "reverse": _f(F.reverse),
    # radix-16 strips a leading 0x/0X (Function.java ParseLong:748)
    "parse_long": lambda cols, nodes: (
        (F.conv(F.regexp_replace(cols[0], "^0[xX]", ""), 16, 10)
         .cast("long")
         if _lit_of(nodes[1]) == 16 else
         F.conv(cols[0], _lit_of(nodes[1]), 10).cast("long"))
        if len(cols) > 1 else cols[0].cast("long")),
    "string_to_array": lambda cols, nodes: F.split(cols[0], re.escape(_lit_of(nodes[1]))),
    "trim": _f(F.trim), "ltrim": _f(F.ltrim), "rtrim": _f(F.rtrim),
    "btrim": _f(F.trim),
    # logic / null
    "nvl": _f(F.coalesce), "coalesce": _f(F.coalesce),
    "isnull": _f(lambda x: x.isNull()), "notnull": _f(lambda x: x.isNotNull()),
    "istrue": _f(lambda x: x.cast("boolean").eqNullSafe(F.lit(True))),
    "isfalse": _f(lambda x: x.cast("boolean").eqNullSafe(F.lit(False))),
    "nottrue": _f(lambda x: ~x.cast("boolean").eqNullSafe(F.lit(True))),
    "notfalse": _f(lambda x: ~x.cast("boolean").eqNullSafe(F.lit(False))),
    "isdistinctfrom": _f(lambda a, b: ~a.eqNullSafe(b)),
    "notdistinctfrom": _f(lambda a, b: a.eqNullSafe(b)),
    # time
    "unix_timestamp": _f(F.unix_timestamp),
    "unix_millis": _f(F.unix_millis),
    "millis_to_timestamp": _f(F.timestamp_millis),
    "timestamp_to_millis": _f(F.unix_millis),
    "subtract_months": _f(lambda a, b: F.months_between(a, b).cast("long")),
    # arrays — Function.java array fns; MVDs are arrays (SURVEY §7.3)
    "array": _f(F.array),
    "array_append": _f(F.array_append),
    "array_concat": _f(F.concat),
    "array_contains": _f(lambda arr, v: F.array_contains(arr, v)),
    "array_length": _f(F.size),
    "array_offset": _f(lambda arr, i: F.get(arr, i)),
    "array_ordinal": _f(lambda arr, i: F.get(arr, i - F.lit(1))),
    "array_offset_of": _f(lambda arr, v: F.when(
        F.array_position(arr, v) > 0, F.array_position(arr, v) - 1)),
    "array_ordinal_of": _f(lambda arr, v: F.when(
        F.array_position(arr, v) > 0, F.array_position(arr, v))),
    "array_overlap": _f(F.arrays_overlap),
    "array_prepend": _f(lambda v, arr: F.array_prepend(arr, v)),
    "array_set_add": _f(lambda arr, v: F.array_sort(F.array_union(arr, F.array(v)))),
    "array_set_add_all": _f(lambda a, b: F.array_sort(F.array_union(a, b))),
    # HLL expression fns (HyperUniqueExpressions.java:43-242) in exact
    # mode: the "sketch" is a distinct string set, add = set-union,
    # estimate = size — composes with the fold-lambda aggregator the
    # same way the reference's HLL collector does.
    "hyper_unique": _f(lambda: F.array().cast("array<string>")),
    "hyper_unique_add": _f(lambda v, sk: F.when(
        v.isNull(), sk).otherwise(
        F.array_sort(F.array_union(sk, F.array(v.cast("string")))))),
    "hyper_unique_estimate": _f(lambda sk: F.size(sk).cast("double")),
    "hyper_unique_round_estimate": _f(lambda sk: F.size(sk).cast("long")),
    "array_slice": lambda cols, nodes: F.slice(
        cols[0], _lit_of(nodes[1]) + 1, _lit_of(nodes[2]) - _lit_of(nodes[1])),
    "array_to_string": _f(lambda arr, sep: F.call_function("array_join", arr, sep)),
    "string_format": lambda cols, nodes: F.format_string(_lit_of(nodes[0]), *cols[1:]),
    "array_to_mv": _f(lambda x: x), "mv_to_array": _f(lambda x: x),
    "mv_contains": _f(lambda arr, v: F.array_contains(arr, v)),
    "mv_overlap": _f(F.arrays_overlap),
    "mv_length": _f(F.size),
    "mv_append": _f(F.array_append),
    "mv_prepend": _f(lambda v, arr: F.array_prepend(arr, v)),
    "mv_concat": _f(F.concat),
    "mv_slice": lambda cols, nodes: F.slice(
        cols[0], _lit_of(nodes[1]) + 1, _lit_of(nodes[2]) - _lit_of(nodes[1])),
    "mv_to_string": _f(lambda arr, sep: F.array_join(arr, sep)),
    "scalar_in_array": _f(lambda v, arr: F.array_contains(arr, v)),
    "decode_base64_utf8": _f(lambda s: F.unbase64(s).cast("string")),
    # ArrayQuantileExprMacro.java:134 — index = rank*(n-1) over the
    # sorted array, linear interpolation between neighbors, NaN for an
    # empty array, out-of-range rank, or null elements
    "array_quantile": lambda cols, nodes: _array_quantile(
        cols[0], float(_lit_of(nodes[1]))),
    # regex / search macros — query/expression/RegexpExtractExprMacro.java etc
    "regexp_extract": lambda cols, nodes: F.nullif(
        F.regexp_extract(cols[0], _lit_of(nodes[1]),
                         _lit_of(nodes[2]) if len(nodes) > 2 else 0), F.lit("")),
    "regexp_like": lambda cols, nodes: cols[0].rlike(_lit_of(nodes[1])),
    "regexp_replace": lambda cols, nodes: F.regexp_replace(
        cols[0], _lit_of(nodes[1]), _lit_of(nodes[2])),
    "contains_string": _f(lambda s, sub: s.contains(sub)),
    "icontains_string": _f(lambda s, sub: F.lower(s).contains(F.lower(sub))),
    "like": lambda cols, nodes: cols[0].like(_lit_of(nodes[1])),
    # bitwise — Function.java:916
    "bitwiseand": _f(lambda a, b: a.cast("long").bitwiseAND(b.cast("long"))),
    "bitwiseor": _f(lambda a, b: a.cast("long").bitwiseOR(b.cast("long"))),
    "bitwisexor": _f(lambda a, b: a.cast("long").bitwiseXOR(b.cast("long"))),
    "bitwiseshiftleft": _f(lambda a, b: F.call_function(
        "shiftleft", a.cast("long"), b.cast("int"))),
    "bitwiseshiftright": _f(lambda a, b: F.call_function(
        "shiftright", a.cast("long"), b.cast("int"))),
    "bitwisecomplement": _f(lambda a: F.bitwise_not(a.cast("long"))),
    # json — query/expression/NestedDataExpressions.java
    "json_value": lambda cols, nodes: _json_value_native(cols[0], nodes),
    "json_query": lambda cols, nodes: json_query_render(
        cols[0], _lit_of(nodes[1])),
    "json_keys": lambda cols, nodes: json_keys_at(
        cols[0], _lit_of(nodes[1]) if len(nodes) > 1 else "$"),
    "to_json_string": _f(F.to_json),
    "parse_json": _f(lambda x: x),  # kept as string; json fns accept strings
    "try_parse_json": _f(lambda x: x),
    # misc
    # HumanReadableBytes.java:268-325 ladders; optional precision arg
    "human_readable_binary_byte_format": lambda cols, nodes: _human_readable(
        cols[0], int(_lit_of(nodes[1])) if len(cols) > 1 else 2,
        1024, ["B", "KiB", "MiB", "GiB", "TiB", "PiB"]),
    "human_readable_decimal_byte_format": lambda cols, nodes: _human_readable(
        cols[0], int(_lit_of(nodes[1])) if len(cols) > 1 else 2,
        1000, ["B", "KB", "MB", "GB", "TB", "PB"]),
    "human_readable_decimal_format": lambda cols, nodes: _human_readable(
        cols[0], int(_lit_of(nodes[1])) if len(cols) > 1 else 2,
        1000, ["", "K", "M", "G", "T", "P"]),
    # ipv4 — query/expression/IPv4AddressParseExprMacro.java etc.
    "ipv4_parse": _f(lambda s: _ipv4_parse(s)),
    "ipv4_stringify": _f(lambda n: _ipv4_stringify(n)),
    "ipv4_match": lambda cols, nodes: _ipv4_match(cols[0], _lit_of(nodes[1])),
}


def _human_readable(x: Column, precision: int, base: int,
                    units: list[str]) -> Column:
    """HumanReadableBytes ladder: integer + first unit below `base`,
    then fixed-decimal formatting per rung."""
    n = x.cast("long")
    suffix = (" " + units[0]) if units[0] else ""
    out = F.format_string(f"%.{precision}f {units[-1]}".rstrip(),
                          (n / F.lit(float(base ** (len(units) - 1)))))
    for i in range(len(units) - 2, 0, -1):
        out = F.when(
            F.abs(n) < F.lit(base ** (i + 1)),
            F.format_string(f"%.{precision}f {units[i]}".rstrip(),
                            n / F.lit(float(base ** i)))).otherwise(out)
    return F.when(F.abs(n) < base,
                  F.concat(n.cast("string"), F.lit(suffix))).otherwise(out)


def _array_quantile(arr: Column, rank: float) -> Column:
    darr = F.array_sort(F.transform(arr, lambda x: x.cast("double")))
    n = F.size(darr)
    idx = F.lit(rank) * (n - 1).cast("double")
    lo = F.floor(idx).cast("int")
    a = F.element_at(darr, lo + 1)
    b = F.element_at(darr, F.least(lo + 2, n))
    nan = F.lit(float("nan"))
    if rank < 0 or rank > 1:
        return nan
    return (F.when((n == 0)
                   | F.exists(darr, lambda x: x.isNull()), nan)
            .otherwise(a + (idx - lo) * (b - a)))


def _ipv4_parse(s: Column) -> Column:
    parts = F.split(s.cast("string"), r"\.")
    return (parts.getItem(0).cast("long") * 16777216
            + parts.getItem(1).cast("long") * 65536
            + parts.getItem(2).cast("long") * 256
            + parts.getItem(3).cast("long"))


def _ipv4_stringify(n: Column) -> Column:
    n = n.cast("long")
    return F.concat_ws(
        ".", ((n / 16777216).cast("long") % 256).cast("string"),
        ((n / 65536).cast("long") % 256).cast("string"),
        ((n / 256).cast("long") % 256).cast("string"),
        (n % 256).cast("string"))


def _ipv4_match(addr: Column, subnet: str) -> Column:
    """addr (dotted string or long) within 'a.b.c.d/n' CIDR."""
    base_s, bits_s = subnet.split("/")
    bits = int(bits_s)
    base = 0
    for p in base_s.split("."):
        base = base * 256 + int(p)
    mask = ((1 << 32) - 1) ^ ((1 << (32 - bits)) - 1) if bits else 0
    as_long = F.when(addr.cast("string").rlike(r"^\d+\.\d+\.\d+\.\d+$"),
                     _ipv4_parse(addr)).otherwise(addr.cast("long"))
    return as_long.bitwiseAND(F.lit(mask)) == F.lit(base & mask)


def compile_expr(expr: str, resolver: Resolver | None = None, lookups=None) -> Column:
    """Compile a Druid native expression string to a Spark Column."""
    return Compiler(resolver, lookups).compile(parse(expr))
