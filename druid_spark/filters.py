"""Druid DimFilter JSON → Spark Column predicates.

Covers the full registered filter surface
(processing/.../query/filter/DimFilter.java:36-59). Spark-first: every
filter compiles to a boolean Column expression so Catalyst can push it
into the Parquet scan (PushedFilters) and prune partitions; no Python
evaluation in the data path.

Semantics shims (SURVEY §7.3):
- `selector` is legacy null-as-empty equality: null and '' match each
  other (reference SelectorDimFilter + legacy null handling).
- `equals`/`range`/`null` are the modern SQL-compliant typed filters.
- On a multi-value (array) column, scalar match filters apply
  "any value matches" semantics → array_contains
  (docs/querying/multi-value-dimensions.md:355).
"""

from __future__ import annotations

from typing import Any, Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from druid_spark.expr import compile_expr


def alnum_sort_key(c: Column) -> Column:
    """A string key whose lexicographic order equals the reference's
    alphanumeric comparator (StringComparators.java AlphanumericComparator,
    the java-alphanum algorithm): chunk into digit / non-digit runs;
    digit chunks compare numerically — significant-digit length first,
    then the digits, leading-zero count as the tie-break ("7" < "007")
    — and sort before letter chunks. Encoding per chunk:
      digits: '0' + len(sig)[4] + sig + '\\x02' + zeros[4]
      other:  '1' + chars
    joined with '\\x01' (below every marker, so a prefix chunk sorts
    first). Handles arbitrary-length numbers — a fixed-width zero-pad
    would mis-order past its width. Pure expressions, no UDF; ASCII
    digits only (the reference also accepts unicode digit ranges)."""
    chunks = F.regexp_extract_all(c, F.lit(r"(\d+|\D+)"), F.lit(1))

    def key_chunk(ch):
        sig = F.regexp_replace(ch, r"^0+", "")
        zeros = F.length(ch) - F.length(sig)
        num_key = F.concat(
            F.lit("0"), F.lpad(F.length(sig).cast("string"), 4, "0"),
            sig, F.lit("\x02"), F.lpad(zeros.cast("string"), 4, "0"))
        return F.when(ch.rlike(r"^\d"), num_key) \
                .otherwise(F.concat(F.lit("1"), ch))

    return F.array_join(F.transform(chunks, key_chunk), "\x01")


def version_sort_key(c: Column) -> Column:
    """A string key ordering like the reference's version comparator
    (StringComparators.java:451 → maven DefaultArtifactVersion /
    ComparableVersion) for the canonical grammar: dot/dash-separated
    numeric tokens and qualifiers, case-insensitive, with null padding
    ("1.0" == "1" == "1.0.ga") and the qualifier ladder
    alpha < beta < milestone < rc < snapshot < release < sp < other.
    Numeric tokens (incl. build numbers) sort above all qualifiers.
    Encoding per slot (separator '\\x01' is below every marker):
      alpha '1' … snapshot '5', release '6', sp '7', unknown '8'+q,
      number '9' + len(digits)[4] + digits."""
    toks = F.split(F.lower(c.cast("string")), r"[.\-]")

    def enc(t):
        sig = F.regexp_replace(t, r"^0+", "")
        num = F.concat(F.lit("9"),
                       F.lpad(F.length(sig).cast("string"), 4, "0"), sig)
        release = (t.isNull() | (t == "") | (t == "0") | (t == "ga")
                   | (t == "final") | (t == "release"))
        return (F.when(release, F.lit("6"))
                .when(t.rlike(r"^\d+$"), num)
                .when(t == "alpha", F.lit("1"))
                .when(t == "beta", F.lit("2"))
                .when(t == "milestone", F.lit("3"))
                .when((t == "rc") | (t == "cr"), F.lit("4"))
                .when(t == "snapshot", F.lit("5"))
                .when(t == "sp", F.lit("7"))
                .otherwise(F.concat(F.lit("8"), t)))

    # fixed 8 slots: missing / zero / release-word slots all encode to
    # the release marker, which is how maven's null padding makes
    # "1" == "1.0" == "1.0.ga" while "1.0-alpha" (alpha in slot 3)
    # still sorts below all of them; >8-token versions truncate
    slots = F.transform(F.sequence(F.lit(0), F.lit(7)),
                        lambda i: enc(F.get(toks, i)))
    return F.array_join(slots, "\x01")


BLOOM_DEFAULT_K = 5


def bloom_sizing(n_hint: int = 0, num_bits: int = 0,
                 num_hashes: int = 0) -> tuple[int, int]:
    """(m, k) for a bloom holder — ONE sizing rule shared by the native
    `bloom` aggregator and the SQL BLOOM_FILTER form, so holders built
    on either layer interoperate with probes on the other. 2^18-bit
    floor, doubled until >= 64 bits/expected entry (BloomKFilter's
    maxNumEntries knob)."""
    m = num_bits
    if not m:
        m = 1 << 18
        while m < 64 * n_hint:
            m <<= 1
    return m, (num_hashes or BLOOM_DEFAULT_K)


def bloom_positions(c: Column, m: int, k: int) -> Column:
    """k bit positions of a value in an m-bit bloom filter, as an
    array<long>. Shared by the `bloom` aggregator (build) and the
    `bloom` filter (probe) so hashes line up. Seeded double hashing via
    xxhash64(seed, value) — pure JVM expressions, codegen-friendly.
    NULL hashes as the empty string, mirroring BloomKFilter.addBytes
    (null → NULL_HASH_COMPUTED = hash of empty bytes, the same as ""),
    so null values are recorded and matched rather than dropped."""
    s = F.coalesce(c.cast("string"), F.lit(""))
    return F.array(*[F.pmod(F.xxhash64(F.lit(i), s), F.lit(m))
                     for i in range(k)])


def _is_mv(df: DataFrame | None, col: str) -> bool:
    if df is None:
        return False
    try:
        return isinstance(df.schema[col].dataType, T.ArrayType)
    except Exception:
        return False


class FilterCompiler:
    """df is optional and only used for schema introspection (MVD
    detection); resolver injects virtual columns."""

    def __init__(self, df: DataFrame | None = None,
                 resolver: Callable[[str], Column] | None = None, lookups=None):
        self.df = df
        self.resolver = resolver or F.col
        self.lookups = lookups or {}

    def compile(self, f: dict[str, Any] | None) -> Column:
        if f is None:
            return F.lit(True)
        t = f["type"]
        fn = getattr(self, f"_f_{t.lower()}", None)
        if fn is None:
            raise NotImplementedError(f"filter type: {t}")
        return fn(f)

    def _col(self, name: str) -> Column:
        return self.resolver(name)

    def _match(self, name: str, pred: Callable[[Column], Column]) -> Column:
        """apply a scalar predicate with MVD any-match semantics"""
        c = self._col(name)
        if _is_mv(self.df, name):
            return F.exists(c, pred)
        return pred(c)

    # -- logical
    def _f_and(self, f):
        out = F.lit(True)
        for sub in f["fields"]:
            out = out & self.compile(sub)
        return out

    def _f_or(self, f):
        out = F.lit(False)
        for sub in f["fields"]:
            out = out | self.compile(sub)
        return out

    def _f_not(self, f):
        return ~self.compile(f["field"])

    def _f_true(self, f):
        return F.lit(True)

    def _f_false(self, f):
        return F.lit(False)

    # -- equality
    def _f_selector(self, f):
        v = f.get("value")
        if v is None or v == "":
            # legacy: null and '' are the same
            return self._match(f["dimension"],
                               lambda c: c.isNull() | (c.cast("string") == ""))
        return self._match(f["dimension"], lambda c: c == F.lit(v))

    def _f_equals(self, f):
        v = f["matchValue"]
        return self._match(f["column"], lambda c: c == F.lit(v))

    def _f_null(self, f):
        return self._col(f["column"]).isNull()

    def _dtype(self, name):
        if self.df is not None:
            try:
                return self.df.schema[name].dataType
            except Exception:
                return None
        return None

    def _f_in(self, f):
        vals = f["values"]
        has_null = any(v is None for v in vals)
        non_null = [v for v in vals if v is not None]
        # Spark resolves `numeric_col IN (<strings>)` by casting the
        # COLUMN to string ('19.0' never equals '19'); the reference's
        # InDimFilter instead coerces the VALUES to the column type
        # (typed value matchers). Convert eagerly when the target is
        # numeric — an unparseable string can never match.
        dt = self._dtype(f["dimension"])
        if isinstance(dt, T.ArrayType):
            dt = dt.elementType
        if non_null and isinstance(dt, T.NumericType):
            # Integral columns coerce via int(), like InDimFilter's
            # typed value matchers: 64-bit values above 2^53 are not
            # representable as double, so a float() detour would match
            # the wrong rows. Fractional values can never equal an
            # integral column and are dropped.
            integral = isinstance(dt, T.IntegralType)
            conv = []
            for v in non_null:
                if integral:
                    if isinstance(v, float):
                        if v.is_integer():
                            conv.append(int(v))
                        continue
                    try:
                        conv.append(int(v))
                    except (TypeError, ValueError):
                        try:
                            fv = float(v)
                        except (TypeError, ValueError):
                            continue
                        if fv.is_integer():
                            conv.append(int(fv))
                else:
                    try:
                        conv.append(float(v))
                    except (TypeError, ValueError):
                        continue
            non_null = conv
        def pred(c):
            p = c.isin(*non_null) if non_null else F.lit(False)
            if has_null:
                p = p | c.isNull()
            return p
        return self._match(f["dimension"], pred)

    def _f_intype(self, f):  # typed `inType` filter (InTypeDimFilter)
        vals = f["values"]
        return self._match(f.get("column", f.get("dimension")),
                           lambda c: c.isin(*vals))

    # -- ranges
    def _f_bound(self, f):
        # legacy bound filter with ordering comparator
        # (query/filter/BoundDimFilter.java + StringComparators.java:34-39);
        # "numeric" casts, "alphanumeric"/"version" compare via a zero-pad
        # sort key so digit runs order numerically — pure expressions.
        ordering = f.get("ordering", "lexicographic")
        lower, upper = f.get("lower"), f.get("upper")
        ls, us = f.get("lowerStrict", False), f.get("upperStrict", False)

        def key(c):
            if ordering == "numeric":
                return c.cast("double")
            c = c.cast("string")
            if ordering == "alphanumeric":
                return alnum_sort_key(c)
            if ordering == "version":
                return version_sort_key(c)
            return c

        def lit(v):
            if ordering == "numeric":
                return F.lit(float(v))
            if ordering == "alphanumeric":
                return alnum_sort_key(F.lit(str(v)))
            if ordering == "version":
                return version_sort_key(F.lit(str(v)))
            return F.lit(str(v))

        def pred(c):
            cc = key(c)
            p = F.lit(True)
            if lower is not None:
                lv = lit(lower)
                p = p & ((cc > lv) if ls else (cc >= lv))
            if upper is not None:
                uv = lit(upper)
                p = p & ((cc < uv) if us else (cc <= uv))
            return p
        return self._match(f["dimension"], pred)

    def _f_range(self, f):
        lower, upper = f.get("lower"), f.get("upper")
        lo, uo = f.get("lowerOpen", False), f.get("upperOpen", False)
        def pred(c):
            p = F.lit(True)
            if lower is not None:
                p = p & ((c > F.lit(lower)) if lo else (c >= F.lit(lower)))
            if upper is not None:
                p = p & ((c < F.lit(upper)) if uo else (c <= F.lit(upper)))
            return p
        return self._match(f["column"], pred)

    def _f_interval(self, f):
        # ISO interval(s) on a time column (query/filter/
        # IntervalDimFilter). parse_iso_interval accepts all three
        # Joda forms the reference does (start/end, start/period,
        # period/end — Intervals.of), round 7.
        from druid_spark.granularity import parse_iso_interval
        col = self._col(f.get("dimension", "__time"))
        out = F.lit(False)
        for iv in f["intervals"]:
            a, b = parse_iso_interval(iv)
            out = out | ((col >= F.to_timestamp(F.lit(a)))
                         & (col < F.to_timestamp(F.lit(b))))
        return out

    # -- string matching
    def _f_like(self, f):
        esc = f.get("escape")
        if esc:
            return self._match(f["dimension"],
                               lambda c: c.like(f["pattern"], escapeChar=esc))
        return self._match(f["dimension"], lambda c: c.like(f["pattern"]))

    def _f_regex(self, f):
        return self._match(f["dimension"], lambda c: c.rlike(f["pattern"]))

    def _f_search(self, f):
        q = f["query"]
        qt = q["type"]
        if qt == "contains":
            needle, sensitive = q["value"], q.get("caseSensitive", True)
        elif qt == "insensitive_contains":
            needle, sensitive = q["value"], False
        elif qt == "fragment":
            sensitive = q.get("caseSensitive", True)
            def fragpred(c):
                p = F.lit(True)
                for frag in q["values"]:
                    p = p & (c.contains(frag) if sensitive
                             else F.lower(c).contains(frag.lower()))
                return p
            return self._match(f["dimension"], fragpred)
        else:
            raise NotImplementedError(f"search query type {qt}")
        if sensitive:
            return self._match(f["dimension"], lambda c: c.contains(needle))
        return self._match(f["dimension"],
                           lambda c: F.lower(c).contains(needle.lower()))

    # -- misc
    def _f_columncomparison(self, f):
        d0, d1 = f["dimensions"]
        c0, c1 = self._col(_dimname(d0)), self._col(_dimname(d1))
        if _is_mv(self.df, _dimname(d0)) or _is_mv(self.df, _dimname(d1)):
            a0 = c0 if _is_mv(self.df, _dimname(d0)) else F.array(c0)
            a1 = c1 if _is_mv(self.df, _dimname(d1)) else F.array(c1)
            return F.arrays_overlap(a0, a1)
        return c0.cast("string") == c1.cast("string")

    def _f_extraction(self, f):
        # deprecated ExtractionDimFilter (DimFilter.java): apply the
        # extraction fn, then legacy-selector match on the result
        from druid_spark.dimensions import extraction
        v = f.get("value")

        def pred(c):
            e = extraction(f.get("extractionFn"), c)
            if v is None or v == "":
                return e.isNull() | (e.cast("string") == "")
            return e == F.lit(v)
        return self._match(f["dimension"], pred)

    def _f_expression(self, f):
        return compile_expr(f["expression"], self.resolver,
                            self.lookups).cast("boolean")

    def _f_istrue(self, f):
        return self._col(f["column"]).cast("boolean").eqNullSafe(F.lit(True))

    def _f_isfalse(self, f):
        return self._col(f["column"]).cast("boolean").eqNullSafe(F.lit(False))

    def _f_arraycontainselement(self, f):
        return F.array_contains(self._col(f["column"]),
                                F.lit(f["elementMatchValueType"] and f["elementMatchValue"]))

    def _f_spatial(self, f):
        # rectangular bound on a "lat,lon" encoded dimension
        # (reference: spatial filter over spatial-indexed dims)
        bound = f["bound"]
        c = self._col(f["dimension"])
        lat = F.split(c, ",").getItem(0).cast("double")
        lon = F.split(c, ",").getItem(1).cast("double")
        if bound["type"] == "rectangular":
            mins, maxs = bound["minCoords"], bound["maxCoords"]
            return ((lat >= mins[0]) & (lat <= maxs[0])
                    & (lon >= mins[1]) & (lon <= maxs[1]))
        if bound["type"] == "radius":
            cx, cy = bound["coords"]
            r = bound["radius"]
            return ((lat - cx) ** 2 + (lon - cy) ** 2) <= r * r
        if bound["type"] == "polygon":
            # PolygonBound (spatial extension): abscissa/ordinate vertex
            # lists. Ray casting (PNPOLY), unrolled at compile time into
            # one boolean expression per edge — the polygon is a query
            # literal, so the whole test stays inside codegen.
            xs = [float(v) for v in bound["abscissa"]]
            ys = [float(v) for v in bound["ordinate"]]
            inside = F.lit(False)
            for i in range(len(xs)):
                j = i - 1  # previous vertex (wraps via python -1)
                xi, yi, xj, yj = xs[i], ys[i], xs[j], ys[j]
                crosses = (
                    ((F.lit(yi) > lon) != (F.lit(yj) > lon))
                    & (lat < (F.lit(xj) - F.lit(xi)) * (lon - F.lit(yi))
                       / (F.lit(yj) - F.lit(yi)) + F.lit(xi)))
                inside = inside != crosses  # boolean XOR
            return inside
        raise NotImplementedError(f"spatial bound {bound['type']}")

    def _f_bloom(self, f):
        """BloomDimFilter (bloom-filter extension): membership test
        against a filter built by the `bloom` aggregator. Engine-native
        holder form: {"m": bits, "k": hashes, "positions": [sorted bit
        positions]} — the sparse-bitset struct the aggregator emits.
        Probe = all k hash positions present; the positions array is a
        broadcast-sized literal, so the test is a pure JVM expression
        with no shuffle and no Python in the data path."""
        holder = f.get("bloomKFilter")
        if not isinstance(holder, dict) or "positions" not in holder:
            raise NotImplementedError(
                "bloom filter: only engine-built {m,k,positions} holders "
                "(java BloomKFilter blobs are not portable)")
        m, k = int(holder["m"]), int(holder["k"])
        # densify to an m-bit word array so each probe is one O(1)
        # element_at + bit test — cost per row is k word lookups
        # regardless of how full the filter is (the sparse positions
        # list would make array_contains a linear scan per probe)
        import numpy as np
        words = [0] * ((m + 63) // 64)
        for p in holder["positions"]:
            words[int(p) >> 6] |= 1 << (int(p) & 63)
        words = [w - (1 << 64) if w >= (1 << 63) else w for w in words]
        # numpy array → ONE ArrayData literal; a python list would
        # expand to a 32k-child CreateArray expression tree and blow up
        # planning/codegen time ~100x
        wlit = F.lit(np.array(words, dtype=np.int64))

        from druid_spark.dimensions import extraction

        def pred(c):
            probes = bloom_positions(
                extraction(f.get("extractionFn"), c), m, k)
            out = F.lit(True)
            for i in range(k):
                p = probes.getItem(i)
                word = F.element_at(wlit, (p / 64).cast("int") + F.lit(1))
                bit = F.call_function(
                    "shiftleft", F.lit(1).cast("long"),
                    F.pmod(p, F.lit(64)).cast("int"))
                out = out & (word.bitwiseAND(bit) != 0)
            return out
        return self._match(f["dimension"], pred)


def _dimname(d) -> str:
    return d if isinstance(d, str) else d["dimension"]
