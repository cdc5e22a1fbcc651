"""Quidem qa-corpus conformance harness.

The reference ships ~25k golden query/result cases as quidem `.iq`
files (quidem-ut/src/test/quidem/org.apache.druid.quidem.QTest/*,
run by QTest.java) over small datasets it defines with its own
ingestion specs (sql/src/test/quidem/qatests/*/ingest.json).  This
harness parses the same `.iq` files, loads the same datasets with the
same dimension typing rules (DimensionsSpec: string dims coerce
arrays to MVDs, `json` dims are COMPLEX<json> — our JSON-text
convention, `auto` dims schema-discover), runs every `!ok` case
through this engine's SQL layer and compares against the embedded
mysql-format expected tables.

Comparison rules mirror the reference's quidem printer
(org.apache.calcite.test quidem, mysql outputformat): scalar NULL is
a blank cell, typed SQL arrays render Java-style `[a, b, null]`,
MVDs render as JSON `["a","b",null]`, timestamps render
`yyyy-MM-dd HH:mm:ss.SSS`; rows compare unordered unless the query
has a top-level ORDER BY; doubles compare with a relative epsilon
(the reference's EQUALS_RELATIVE_1000_ULPS analog).

Usage:
    PYTHONPATH=/root/repo python tools/quidem_conformance.py \
        [--family qaWin ...] [--file SUBSTR] [--limit N] [--case SUBSTR]
        [--write-passlist] [--verbose] [--errors]
"""

from __future__ import annotations

import csv
import datetime as dt
import gzip
import io
import json
import math
import re
import sys
from pathlib import Path

QTEST = Path("/root/reference/quidem-ut/src/test/quidem/"
             "org.apache.druid.quidem.QTest")
SQLQ = Path("/root/reference/sql/src/test/quidem")
REF = Path("/root/reference")
OUTDIR = Path(__file__).parent / "quidem_out"

FAMILIES = ["qaWin", "qaAggFuncs", "qaSql", "qaArray", "qaUnnest",
            "qaJsonCols", "qaSsb", "qaTpch", "kttm_sunburst",
            "org.apache.druid.sql.calcite."
            "DecoupledPlanningCalciteJoinQueryTest",
            "org.apache.druid.sql.calcite."
            "DecoupledPlanningCalciteQueryTest",
            "org.apache.druid.sql.calcite."
            "DecoupledPlanningCalciteArraysQueryTest",
            "org.apache.druid.quidem.SqlQuidemTest"]


# ---------------------------------------------------------------- iq parser

# The two goldens whose pinned 0-row results arise from the decoupled
# planner's unnest virtual-column naming collision (both inner unnests
# named "j0.unnest", so their pushed equality filters AND on one
# column).  The engine's quirk flag reproduces the collision; it is
# set for EXACTLY these files — the ...OrFilters sibling (whose
# OR-combined filter is NOT pushed into the unnests and pins 5 real
# rows) runs flag-on-safe but is deliberately left flag-off.
_UNNEST_COLLAPSE_FILES = {
    "testUnnestThriceWithFiltersOnDimAndAllUnnestColumns",
    "testUnnestThriceWithFiltersOnDimAndAllUnnestColumnsArrayColumns",
}


def parse_iq(path: Path) -> list[dict]:
    """Split a .iq file into cases.  A case is one SQL statement plus
    the expected block that a terminating `!ok` / `!error` closes;
    plan blocks (`!druidPlan`, `!nativePlan`, ...) attach to the same
    SQL and are ignored."""
    cases = []
    buf: list[str] = []
    cur_sql: str | None = None
    test_id = None
    dataset = None
    cur_ts = None
    ext_fsr = None  # !set extendedFilteredSumRewrite (filtered_sum.iq)
    seq = 0
    for ln in path.read_text().splitlines():
        if ln.startswith("#"):
            m = re.search(r"TESTCASE:\s*(\S+)\s+TEST_ID:\s*(\S+)", ln)
            if m:
                test_id = f"{m.group(1)}:{m.group(2)}"
            continue
        if ln.startswith("!"):
            parts = ln[1:].split()
            name = parts[0] if parts else ""
            if name == "use":
                m = re.search(r"datasets=([^&\s]+)", ln)
                if m:
                    dataset = m.group(1)
                else:
                    sm = re.search(r"componentSupplier=(\w+)", ln)
                    sup = sm.group(1) if sm else "Standard"
                    dataset = "__default__" if sup in (
                        "Standard",
                        "StandardComponentSupplier",
                        "AllDruidEnginesComponentSupplier",
                        "StandardMSQComponentSupplier",
                        "DartComponentSupplier") else f"__{sup}__"
                buf = []
                continue
            if name in ("set", "if"):
                # sqlCurrentTimestamp pins CURRENT_TIMESTAMP for the
                # file's cases (interval_arithmetic goldens); the
                # engine honors it as a SET statement prefix
                if name == "set" and len(parts) >= 3 and \
                        parts[1] == "sqlCurrentTimestamp":
                    cur_ts = parts[2]
                if name == "set" and len(parts) >= 3 and \
                        parts[1] == "extendedFilteredSumRewrite":
                    ext_fsr = parts[2]
                buf = []
                continue
            # block-terminating directive: split buf into SQL + block
            sql_end = None
            for i, b in enumerate(buf):
                if b.rstrip().endswith(";") and not b.lstrip().startswith(
                        ("|", "+", "(")):
                    sql_end = i
                    break
            if sql_end is not None:
                cur_sql = "\n".join(buf[:sql_end + 1]).rstrip().rstrip(";")
                block = buf[sql_end + 1:]
            else:
                block = buf
            if name in ("ok", "error") and cur_sql:
                seq += 1
                sql = cur_sql
                if cur_ts:
                    sql = (f"SET sqlCurrentTimestamp = '{cur_ts}';\n"
                           + sql)
                if ext_fsr is not None:
                    sql = (f"SET extendedFilteredSumRewrite = "
                           f"{ext_fsr};\n" + sql)
                if path.stem in _UNNEST_COLLAPSE_FILES:
                    sql = ("SET decoupledUnnestFilterCollapse = "
                           "true;\n" + sql)
                cases.append({
                    "id": f"{path.stem}:{seq}:{test_id or 'case'}",
                    "sql": sql,
                    "expected": [b for b in block if b.strip() != ""],
                    "kind": name,
                    "dataset": dataset,
                    "file": path.name,
                })
            buf = []
            continue
        buf.append(ln)
    return cases


def parse_mysql_table(lines: list[str]):
    """Border-sliced mysql-format table → (headers, rows-of-strings).
    Returns None when the block is not a table (e.g. '(0 rows)' only
    or an EXPLAIN text blob)."""
    borders = [i for i, ln in enumerate(lines)
               if re.fullmatch(r"\+[-+]*\+", ln.strip())]
    m = None
    for ln in lines:
        m2 = re.fullmatch(r"\((\d+) rows?\)", ln.strip())
        if m2:
            m = int(m2.group(1))
    if len(borders) < 2:
        return None, None, (m or 0)
    border = lines[borders[0]]
    cuts = [i for i, ch in enumerate(border) if ch == "+"]

    def slice_row(ln: str) -> list[str]:
        ln = ln.ljust(len(border))
        return [ln[a + 1:b].strip() for a, b in zip(cuts, cuts[1:])]

    headers = slice_row(lines[borders[0] + 1])
    rows = []
    end = borders[2] if len(borders) > 2 else borders[1]
    pending = None  # row whose LAST cell spans multiple lines
    for ln in lines[borders[1] + 1:end]:
        if ln.strip().startswith("+"):
            continue
        if pending is not None:
            # continuation of a multi-line cell (string_agg with a
            # newline separator — string_agg_misc B32): append until
            # a line closes the row with a trailing '|'
            frag = ln.rstrip()
            closed = frag.endswith("|")
            if closed:
                frag = frag[:-1]
            pending[-1] += "\n" + frag.strip()
            if closed:
                rows.append(pending)
                pending = None
            continue
        cells = slice_row(ln)
        if ln.rstrip().endswith("|"):
            rows.append(cells)
        else:
            pending = cells
    if pending is not None:
        rows.append(pending)
    return headers, rows, (m if m is not None else len(rows))


# ------------------------------------------------------------- datasets

def _java_str(v) -> str:
    """Java toString rendering — how the reference coerces a nested
    array to a string-dim element and renders typed SQL arrays."""
    if v is None:
        return "null"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, list):
        return "[" + ", ".join(_java_str(x) for x in v) + "]"
    if isinstance(v, dict):
        # Java Map toString (LinkedHashMap insertion order) — how
        # classic-schemaless ingestion coerces a nested OBJECT into a
        # string dim (ingest_schmless_json I07/I09:
        # '{o1={}, o2=[], o3=null}')
        return ("{" + ", ".join(f"{k}={_java_str(x)}"
                                for k, x in v.items()) + "}")
    if isinstance(v, float):
        return _java_double(v)
    return str(v)


def _java_double(f: float) -> str:
    if f != f or f in (float("inf"), float("-inf")):
        return {float("inf"): "Infinity",
                float("-inf"): "-Infinity"}.get(f, "NaN")
    if f == int(f) and abs(f) < 1e16:
        return f"{int(f)}.0"
    r = repr(f)
    return r


def _mv_elem(v):
    """Coerce one JSON value to a string-dim (MVD) element."""
    if v is None:
        return None
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, list):
        return _java_str(v)
    if isinstance(v, float):
        return _java_double(v)
    return str(v)


def _parse_ts(v, ts_spec: dict | None = None) -> dt.datetime:
    if v is None and ts_spec:
        v = ts_spec.get("missingValue", "1970-01-01")
    if v is None:
        v = "1970-01-01"
    if isinstance(v, (int, float)):
        return dt.datetime.fromtimestamp(v / 1000.0, dt.timezone.utc) \
            .replace(tzinfo=None)
    jfmt = (ts_spec or {}).get("format", "auto")
    if jfmt not in ("iso", "auto", "millis", "posix"):
        # Joda pattern (TimestampSpec custom format) → strptime
        py = jfmt
        for a, b in (("yyyy", "%Y"), ("MM", "%m"), ("dd", "%d"),
                     ("HH", "%H"), ("mm", "%M"), ("ss", "%S")):
            py = py.replace(a, b)
        try:
            return dt.datetime.strptime(str(v), py)
        except ValueError:
            pass
    s = str(v).replace("T", " ").rstrip("Z")
    for fmt in ("%Y-%m-%d %H:%M:%S.%f", "%Y-%m-%d %H:%M:%S", "%Y-%m-%d"):
        try:
            return dt.datetime.strptime(s, fmt)
        except ValueError:
            continue
    raise ValueError(f"bad timestamp {v!r}")


def _read_spec_rows(spec: dict) -> list[dict]:
    io_cfg = spec["ioConfig"]
    src = io_cfg["inputSource"]
    fmt = io_cfg.get("inputFormat", {"type": "json"})
    if src["type"] == "inline":
        raw = src["data"]
    elif src["type"] == "local":
        base = REF / src["baseDir"]
        files = sorted(base.glob(src.get("filter", "*")))
        chunks = []
        for f in files:
            data = f.read_bytes()
            if f.suffix == ".gz":
                data = gzip.decompress(data)
            chunks.append(data.decode())
        raw = "\n".join(chunks)
    else:
        raise ValueError(f"inputSource {src['type']}")
    t = fmt.get("type")
    if t == "json":
        return [json.loads(ln) for ln in raw.splitlines() if ln.strip()]
    if t in ("csv", "tsv", "delimited"):
        delim = fmt.get("delimiter", {"csv": ",", "tsv": "\t"}.get(t, ","))
        cols = fmt.get("columns")
        rows = []
        # QUOTE_NONE: Druid's DelimitedValueReader does no quote
        # processing — qaJsonCols TSV cells are JSON-encoded ('"A"',
        # 'true', '{...}') and the spec's parse_json transforms expect
        # the quotes intact; csv's default quoting stripped them and
        # made parse_json('A') null
        rd = csv.reader(io.StringIO(raw), delimiter=delim,
                        quoting=csv.QUOTE_NONE)
        it = iter(rd)
        if fmt.get("findColumnsFromHeader"):
            cols = next(it)
        for rec in it:
            if not rec:
                continue
            # empty delimited fields ingest as NULL (Druid
            # DelimitedValueReader; qaAggFuncs string batteries
            # count 6 nulls, not 6 empty strings)
            rows.append(dict(zip(cols,
                                 [None if v == "" else v for v in rec])))
        return rows
    raise ValueError(f"inputFormat {t}")


def _auto_type(values):
    """Schema discovery for one `auto` column over its non-null raw
    JSON values → ('scalar', sparktype) | ('array', elemtype) |
    ('json', None)."""
    vals = [v for v in values if v is not None]
    if not vals:
        return ("scalar", "string")
    if all(isinstance(v, list) for v in vals):
        elems = [e for v in vals for e in v if e is not None]
        if any(isinstance(e, (list, dict)) for e in elems):
            return ("json", None)
        kinds = {("f" if isinstance(e, float)
                  else "l" if isinstance(e, (bool, int))
                  else "s") for e in elems}
        if kinds <= {"l"}:
            return ("array", "long")
        if kinds <= {"l", "f"}:
            return ("array", "double")
        if kinds == {"s"}:
            return ("array", "string")
        # mixed-scalar array: a VARIANT-element ARRAY in the
        # reference's schema discovery (DATA_TYPE 'ARRAY'), stored
        # here as JSON text
        return ("varray", None)
    if any(isinstance(v, (list, dict)) for v in vals):
        return ("json", None)
    kinds = {("f" if isinstance(v, float)
              else "l" if isinstance(v, (bool, int))
              else "s") for v in vals}
    if kinds <= {"l"}:
        return ("scalar", "long")
    if kinds <= {"l", "f"}:
        return ("scalar", "double")
    if kinds == {"s"}:
        return ("scalar", "string")
    return ("json", None)


def _coerce_scalar(v, typ):
    if v is None:
        return None
    if typ == "long":
        if isinstance(v, bool):
            return 1 if v else 0
        try:
            return int(float(v))
        except (TypeError, ValueError):
            return None
    if typ in ("double", "float"):
        try:
            return float(v)
        except (TypeError, ValueError):
            return None
    if isinstance(v, (dict, list)):
        return _java_str(v) if isinstance(v, list) else json.dumps(
            v, separators=(",", ":"))
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        return _java_double(v)
    return str(v)


def _jsonpath_get(v, path: str):
    """Evaluate a simple Druid JSONPath ($, $., $.key[0].k2, $[0][1])
    over a raw Python JSON value."""
    p = path.strip()
    if not p.startswith("$"):
        return None
    i = 1
    cur = v
    while i < len(p) and cur is not None:
        if p[i] == ".":
            i += 1
            m = re.match(r"[A-Za-z_][A-Za-z0-9_]*", p[i:])
            if not m:
                break  # trailing '.' = root
            key = m.group(0)
            i += len(key)
            cur = cur.get(key) if isinstance(cur, dict) else None
        elif p[i] == "[":
            j = p.index("]", i)
            idx = int(p[i + 1:j])
            i = j + 1
            cur = (cur[idx] if isinstance(cur, list)
                   and -len(cur) <= idx < len(cur) else None)
        else:
            return None
    return cur


def _eval_transform(expr: str, row: dict):
    """Exact evaluation of the transform expressions the qa datasets
    use (json_value / json_query / parse_json / to_json_string /
    json_object over raw row values — TransformSpec runs before
    dimension typing).  json_value is scalar-only and stringifies
    booleans ('true'); json_query keeps raw structure (a scalar bool
    then schema-discovers to long 1 — funcs_and_sql datatype golden)."""
    expr = expr.strip()
    m = re.fullmatch(
        r"(?is)(json_value|json_query)\(\s*"
        r"(parse_json\(\s*(\w+)\s*\)|\w+)\s*,\s*'([^']*)'\s*\)",
        expr)
    if m:
        fn, path = m.group(1).lower(), m.group(4)
        src = row.get(m.group(3) or m.group(2))
        if m.group(3) and isinstance(src, str):
            # TSV inputs carry JSON as text; parse_json makes it a
            # variant first (infmt_tsv ingest variants)
            try:
                src = json.loads(src)
            except ValueError:
                src = None
        v = _jsonpath_get(src, path)
        if fn == "json_value":
            if isinstance(v, (dict, list)):
                return None
            if isinstance(v, bool):
                return "true" if v else "false"
            return v
        return v
    m = re.fullmatch(r"(?is)parse_json\(\s*to_json_string\((.+)\)\s*\)",
                     expr)
    if m:
        return _eval_transform(m.group(1), row)
    m = re.fullmatch(r"(?is)parse_json\(\s*(\w+)\s*\)", expr)
    if m:
        v = row.get(m.group(1))
        if isinstance(v, str):
            try:
                return json.loads(v)
            except ValueError:
                return None
        return v
    m = re.fullmatch(r"(?is)to_json_string\(\s*(\w+)\s*\)", expr)
    if m:
        v = row.get(m.group(1))
        return None if v is None else json.dumps(v, separators=(",", ":"))
    m = re.fullmatch(r"(?is)json_object\((.+)\)", expr)
    if m:
        # top-level comma split (values may be nested calls like
        # parse_json(c1) — infmt_tsv t_new), each value evaluated
        # recursively; a bare identifier reads the raw row
        toks, depth, start, s = [], 0, 0, m.group(1)
        for i, ch in enumerate(s):
            if ch in "([":
                depth += 1
            elif ch in ")]":
                depth -= 1
            elif ch == "," and depth == 0:
                toks.append(s[start:i].strip())
                start = i + 1
        toks.append(s[start:].strip())

        def val_of(v):
            if re.fullmatch(r"\w+", v):
                return row.get(v)
            return _eval_transform(v, row)

        return {k.strip().strip("'"): val_of(v)
                for k, v in zip(toks[::2], toks[1::2])}
    raise ValueError(f"unsupported transform expression {expr!r}")


def _apply_flatten_spec_pyside(raw: list[dict], fmt: dict) -> list[dict]:
    """flattenSpec (JSONPathSpec): jq / path / root fields over the raw
    JSON rows; useFieldDiscovery keeps the top-level fields too."""
    fl = (fmt or {}).get("flattenSpec")
    if not fl:
        return raw
    fields = fl.get("fields") or []
    discover = fl.get("useFieldDiscovery", True)
    out = []
    for r in raw:
        nr = dict(r) if discover else {}
        for f in fields:
            t = f.get("type", "root")
            if t == "root":
                nr[f["name"]] = r.get(f.get("expr", f["name"]))
                continue
            expr = f.get("expr", "")
            if t == "jq":
                # '.a.b[0].c' → '$' JSONPath over the row object
                path = "$" + expr
            else:  # 'path' type: already $-rooted
                path = expr
            nr[f["name"]] = _jsonpath_get(r, path)
        out.append(nr)
    return out


def _apply_transforms_pyside(spark, raw: list[dict], schema: dict):
    """Run the spec's transformSpec over the raw rows (Druid
    transforms see raw input values, before dimension typing) and
    merge the outputs back into the raw dicts.  Uses the exact Python
    evaluator above; falls back to the engine's native-expression
    compiler over a JSON-text view for shapes it doesn't know."""
    tr_spec = schema.get("transformSpec")
    if not tr_spec or not tr_spec.get("transforms"):
        return raw
    try:
        outs = [[_eval_transform(t["expression"], r) for r in raw]
                for t in tr_spec["transforms"]]
        for t, col in zip(tr_spec["transforms"], outs):
            for r, v in zip(raw, col):
                r[t["name"]] = v
        return raw
    except ValueError:
        pass
    from pyspark.sql import types as T
    from druid_spark.ingest.batch import apply_transform_spec

    src_cols = sorted({k for r in raw for k in r})
    fields = T.StructType(
        [T.StructField(c, T.StringType()) for c in src_cols])

    def as_text(v):
        if v is None:
            return None
        if isinstance(v, (dict, list)):
            return json.dumps(v, separators=(",", ":"))
        if isinstance(v, bool):
            return "true" if v else "false"
        return str(v)

    rows = [tuple(as_text(r.get(c)) for c in src_cols) for r in raw]
    df = spark.createDataFrame(rows, fields)
    df = apply_transform_spec(df, tr_spec)
    names = [t["name"] for t in tr_spec["transforms"]]
    for r, got in zip(raw, df.select(*names).collect()):
        for n, v in zip(names, got):
            # json_value yields strings; re-type numerics the way
            # Druid's schema discovery would
            # numerics re-type the way Druid's schema discovery would;
            # booleans STAY strings (schmdisc goldens compare
            # t_bool_scalar1 = 'true')
            if isinstance(v, str):
                if re.fullmatch(r"-?\d+", v):
                    v = int(v)
                elif re.fullmatch(r"-?\d*\.\d+(E-?\d+)?", v, re.I):
                    v = float(v)
            r[n] = v
    return raw



# ------------------------------------------------- hyperUnique columns

def _murmur3_x64_128(data: bytes, seed: int = 0) -> bytes:
    """MurmurHash3 x64_128 (Austin Appleby's public-domain algorithm,
    the function Guava's Hashing.murmur3_128 implements) — verified
    against the published 'quick brown fox' vector. Little-endian
    h1||h2 output like Guava's asBytes()."""
    import struct as _s
    MASK = (1 << 64) - 1

    def rotl(x, r):
        return ((x << r) | (x >> (64 - r))) & MASK

    def fmix(k):
        k ^= k >> 33
        k = (k * 0xff51afd7ed558ccd) & MASK
        k ^= k >> 33
        k = (k * 0xc4ceb9fe1a85ec53) & MASK
        k ^= k >> 33
        return k

    c1, c2 = 0x87c37b91114253d5, 0x4cf5ad432745937f
    h1 = h2 = seed
    n = len(data) // 16
    for i in range(n):
        k1, k2 = _s.unpack_from("<QQ", data, i * 16)
        k1 = (k1 * c1) & MASK; k1 = rotl(k1, 31); k1 = (k1 * c2) & MASK
        h1 ^= k1
        h1 = rotl(h1, 27); h1 = (h1 + h2) & MASK
        h1 = (h1 * 5 + 0x52dce729) & MASK
        k2 = (k2 * c2) & MASK; k2 = rotl(k2, 33); k2 = (k2 * c1) & MASK
        h2 ^= k2
        h2 = rotl(h2, 31); h2 = (h2 + h1) & MASK
        h2 = (h2 * 5 + 0x38495ab5) & MASK
    tail = data[n * 16:]
    k1 = k2 = 0
    if len(tail) > 8:
        for i in range(len(tail) - 1, 7, -1):
            k2 = (k2 << 8) | tail[i]
        k2 = (k2 * c2) & MASK; k2 = rotl(k2, 33); k2 = (k2 * c1) & MASK
        h2 ^= k2
    if len(tail) > 0:
        for i in range(min(len(tail), 8) - 1, -1, -1):
            k1 = (k1 << 8) | tail[i]
        k1 = (k1 * c1) & MASK; k1 = rotl(k1, 31); k1 = (k1 * c2) & MASK
        h1 ^= k1
    h1 ^= len(data); h2 ^= len(data)
    h1 = (h1 + h2) & MASK; h2 = (h2 + h1) & MASK
    h1 = fmix(h1); h2 = fmix(h2)
    h1 = (h1 + h2) & MASK; h2 = (h2 + h1) & MASK
    return _s.pack("<QQ", h1, h2)


def _hllc_single(value: str) -> str:
    """Byte-exact Druid HyperLogLogCollector state after add()ing ONE
    string value, rendered as its quoted-base64 complex-column cell
    (hll/HyperLogLogCollector.java: bucket = BE short of the hash's
    last 2 bytes & 0x7ff; positionOf1 = trailing-zero run over bytes
    0..7 + 1, ByteBitLookup.LOOKUP; V1 sparse serialization stores
    (payload byte position + header 7, nibble register) — verified
    against six TestDataBuilder unique_dim1 goldens)."""
    import base64 as _b64
    import struct as _s
    h = _murmur3_x64_128(value.encode("utf-8"))
    bucket = _s.unpack_from(">H", h, 14)[0] & 0x7FF
    pos = 0
    for i in range(8):
        b = h[i]
        if b == 0:
            pos += 8
            continue
        pos += (b & -b).bit_length()
        break
    if pos > 15:
        raw = _s.pack(">BBHBH", 1, 0, 0, pos, bucket)
    else:
        reg = (pos << 4) if (bucket & 1) == 0 else pos
        raw = (_s.pack(">BBHBH", 1, 0, 1, 0, 0)
               + _s.pack(">HB", (bucket >> 1) + 7, reg))
    return '"' + _b64.b64encode(raw).decode() + '"'


def _default_frames(spark):
    """The CalciteTests standard datasets (`!use druidtest:///` with
    the Standard supplier): foo / numfoo / broadcast(=numfoo) / foo2
    (TestDataBuilder.java RAW_ROWS1, RAW_ROWS1_WITH_NUMERIC_DIMS,
    RAW_ROWS2; datasets/NumFoo.java) plus the wikipedia sample, and
    the lookyloo lookup family (LookylooModule.java)."""
    import datetime as dt
    from pyspark.sql import types as T
    from pyspark.sql import functions as F

    S, A, L, D, FL, TS = (T.StringType(), T.ArrayType(T.StringType()),
                          T.LongType(), T.DoubleType(), T.FloatType(),
                          T.TimestampType())
    ts = dt.datetime.fromisoformat

    # dim2 is single-valued on every row (TestDataBuilder RAW_ROWS1) —
    # its Druid-visible form is the scalar string ([] ingests to
    # null), which is what the goldens compare/filter against; dim3
    # is a real multi-value and stays array<string>
    foo_schema = T.StructType([
        T.StructField(n, t) for n, t in [
            ("__time", TS), ("dim1", S), ("dim2", S), ("dim3", A),
            ("cnt", L), ("m1", FL), ("m2", D),
            ("unique_dim1", S)]])
    foo_rows = [
        (ts("2000-01-01"), "", "a", ["a", "b"], 1, 1.0, 1.0),
        (ts("2000-01-02"), "10.1", None, ["b", "c"], 1, 2.0, 2.0),
        (ts("2000-01-03"), "2", "", ["d"], 1, 3.0, 3.0),
        (ts("2001-01-01"), "1", "a", [""], 1, 4.0, 4.0),
        (ts("2001-01-02"), "def", "abc", None, 1, 5.0, 5.0),
        (ts("2001-01-03"), "abc", None, None, 1, 6.0, 6.0),
    ]
    # hyperUnique metric column over dim1 (TestDataBuilder
    # INDEX_SCHEMA: new HyperUniquesAggregatorFactory("unique_dim1",
    # "dim1")) — byte-exact single-value collector states
    foo_rows = [r + (_hllc_single(r[1]),) for r in foo_rows]
    numfoo_schema = T.StructType([
        T.StructField(n, t) for n, t in [
            ("__time", TS), ("dim1", S), ("dim2", S), ("dim3", A),
            ("dim4", S), ("dim5", S), ("dim6", S), ("dbl1", D),
            ("dbl2", D), ("f1", FL), ("f2", FL), ("l1", L), ("l2", L),
            ("cnt", L), ("m1", FL), ("m2", D),
            ("unique_dim1", S)]])
    numfoo_rows = [
        (ts("2000-01-01"), "", "a", ["a", "b"], "a", "aa", "1",
         1.0, None, 1.0, None, 7, None, 1, 1.0, 1.0),
        (ts("2000-01-02"), "10.1", None, ["b", "c"], "a", "ab", "2",
         1.7, 1.7, 0.1, 0.1, 325323, 325323, 1, 2.0, 2.0),
        (ts("2000-01-03"), "2", "", ["d"], "a", "ba", "3",
         0.0, 0.0, 0.0, 0.0, 0, 0, 1, 3.0, 3.0),
        (ts("2001-01-01"), "1", "a", [""], "b", "ad", "4",
         None, None, None, None, None, None, 1, 4.0, 4.0),
        # dim3 raw [] ingests as NULL (empty MVDs have no stored
        # form — SqlQuidemTest mv_filter renders the row blank)
        (ts("2001-01-02"), "def", "abc", None, "b", "aa", "5",
         None, None, None, None, None, None, 1, 5.0, 5.0),
        (ts("2001-01-03"), "abc", None, None, "b", "ab", "6",
         None, None, None, None, None, None, 1, 6.0, 6.0),
    ]
    numfoo_rows = [r + (_hllc_single(r[1]),) for r in numfoo_rows]
    foo2_schema = T.StructType([
        T.StructField(n, t) for n, t in [
            ("__time", TS), ("dim1", S), ("dim2", S), ("dim3", L),
            ("cnt", L), ("m1", L), ("m2", D), ("unique_dim1", S)]])
    foo2_rows = [
        (ts("2000-01-01"), "דרואיד", "he", 10, 1, 1, None),
        (ts("2000-01-01"), "druid", "en", 11, 1, 1, None),
        (ts("2000-01-01"), "друид", "ru", 12, 1, 1, None),
    ]
    foo2_rows = [r + (_hllc_single(r[1]),) for r in foo2_rows]
    # dim3 is the TestDataBuilder multi-value dimension — tagging it
    # MVD drives the engine's any-element filter semantics and MVD
    # render conventions (foo2.dim3 is a scalar LONG and stays
    # untagged)
    _mvd3 = {"dim3": "MVD"}
    out = {
        "foo": (spark.createDataFrame(foo_rows, foo_schema).cache(),
                dict(_mvd3)),
        "numfoo": (spark.createDataFrame(
            numfoo_rows, numfoo_schema).cache(), dict(_mvd3)),
        "broadcast": (spark.createDataFrame(
            numfoo_rows, numfoo_schema).cache(), dict(_mvd3)),
        "foo2": (spark.createDataFrame(foo2_rows, foo2_schema).cache(),
                 {}),
    }
    try:
        import drill_conformance as dc
        wiki = (spark.read.schema(dc._WIKI_SCHEMA).json(dc.WIKI)
                .withColumn("__time", F.to_timestamp("time"))
                .drop("time"))
        out["wikipedia"] = (wiki, {})
    except Exception:
        pass
    lookups = {
        "lookyloo": {"a": "xa", "abc": "xabc",
                     "nosuchkey": "mysteryvalue", "6": "x6"},
        "lookyloo121": {"a": "xa", "abc": "xabc",
                        "nosuchkey": "mysteryvalue", "6": "x6"},
        "lookyloo-chain": {"xa": "za", "xabc": "zabc", "x6": "z6"},
    }
    return out, lookups


# ------------------------------------------------- kttm synthetic rows

def _kttm_rows() -> list[dict]:
    """Deterministic synthetic rows matching the kttm_nested schema
    (quidem-ut/src/main/java/org/apache/druid/quidem/
    KttmNestedComponentSupplier.java: string dims + long
    session_length/timezone_offset + `auto` event/agent structs).
    The real kttm-nested-v2-2019-08-25.json is a classloader resource
    not shipped in the source tree, so the kttm_sunburst golden VALUES
    are unreproducible — these rows instead make the family RUNNABLE
    with DuckDB as a self-oracle over the same rows (run_case_oracle).

    Shape guarantees for oracle safety: 60 distinct profiles with
    multiplicities 1..60, so any GROUP BY has <= 60 groups (every
    kttm_sunburst query says LIMIT 101 -> never truncates; multiset
    compare is then order-safe even with ORDER BY "count" ties)."""
    browsers = ["Chrome", "Mobile Safari", "Chrome Mobile", "Safari",
                "Firefox", "Opera", "IE", "unknown", ""]
    versions = ["76.0.3809.100", "76.0.3809.102", "75.0.3770.144",
                "75.0.3770.142", "64.0.3282.140", "70.0.3538.102",
                "74.0.3729.159", "63.0.3239.86", "12.1.2", "12.1.1",
                "12.2", "", "11.0", "68.0", "44.0"]
    cats = ["Personal computer", "Smartphone", "Tablet"]
    layers = [None, "0", "1", "2", "3", "4", "5", "6"]
    adb = ["NoAdblock", "EasyList"]
    slen = [-26270, -19210, -15330, -12580, -2020, 0, 10, 30, 120,
            710, 815, 1035, 1175, 1225, 1255, 1300, 1605, 2065]
    rows = []
    for i in range(60):
        agent = {"type": "Browser", "category": cats[i % 3],
                 "browser": browsers[i % 9],
                 "browser_version": versions[i % 15],
                 "os": "OS X", "platform": "desktop"}
        event = {"type": "PercentClear", "percentage": (i * 7) % 100}
        if layers[i % 8] is not None:
            event["layer"] = layers[i % 8]
        for k in range(i + 1):
            rows.append({
                "__time": dt.datetime(
                    2019, 8, 25, (i * 3 + k) % 24, (k * 11) % 60,
                    (i + k) % 60, tzinfo=dt.timezone.utc),
                "session": f"S{i:04d}",
                "number": str(i % 30),
                "event": json.dumps(event, separators=(",", ":")),
                "agent": json.dumps(agent, separators=(",", ":")),
                "client_ip": f"10.0.{i % 8}.{k % 250}",
                "geo_ip": f"geo{i % 5}",
                "language": ["en", "fr", "de"][i % 3],
                "adblock_list": adb[i % 2],
                "app_version": "1.0",
                "path": f"/p/{i % 7}",
                "loaded_image": "img.png",
                "referrer": f"https://r{i % 4}.example/x",
                "referrer_host": f"r{i % 4}.example",
                "server_ip": "172.31.11.5",
                "screen": "1920x1080",
                "window": "1280x720",
                "session_length": slen[i % 18],
                "timezone": ["UTC", "America/New_York"][i % 2],
                "timezone_offset": [0, -240][i % 2],
            })
    return rows


def _kttm_frames(spark):
    from pyspark.sql import types as T
    rows = _kttm_rows()
    fields = [T.StructField("__time", T.TimestampType())]
    longs = {"session_length", "timezone_offset"}
    for k in rows[0]:
        if k == "__time":
            continue
        fields.append(T.StructField(
            k, T.LongType() if k in longs else T.StringType()))
    schema = T.StructType(fields)
    df = spark.createDataFrame(
        [tuple(r[f.name] for f in fields) for r in rows], schema)
    json_cols = {"event": "COMPLEX<json>", "agent": "COMPLEX<json>"}
    return {"kttm_nested": (df.cache(), json_cols)}, {}


def _kttm_duck_con():
    """DuckDB connection over the SAME synthetic kttm rows — the
    self-oracle for the kttm_sunburst family."""
    import duckdb
    import pandas as pd
    con = duckdb.connect()
    rows = _kttm_rows()
    pdf = pd.DataFrame(rows)
    pdf["__time"] = pd.to_datetime(pdf["__time"]).dt.tz_localize(None)
    con.register("kttm_pdf", pdf)
    con.execute("CREATE VIEW kttm_nested AS SELECT * FROM kttm_pdf")
    return con


def _kttm_oracle_sql(sql: str) -> str:
    """Druid SQL -> DuckDB SQL for the kttm surface: JSON_VALUE maps
    to json_extract_string (same NULL-on-missing semantics); the rest
    of the family (CAST/FLOOR/COUNT/GROUP BY/TIMESTAMP literals/IS NOT
    TRUE) is shared syntax."""
    out = re.sub(r"(?i)\bJSON_VALUE\s*\(", "json_extract_string(",
                 sql)
    # TIME_FLOOR(x, 'period') -> date_trunc (the only periods the
    # family uses)
    per = {"PT1H": "hour", "PT1M": "minute", "P1D": "day",
           "P1M": "month", "P1Y": "year"}
    out = re.sub(
        r"(?i)\bTIME_FLOOR\s*\(\s*(.*?)\s*,\s*'(P[^']*)'\s*"
        r"(?:,\s*NULL\s*(?:,\s*'(?:Etc/)?UTC'\s*)?)?\)",
        lambda m: (f"date_trunc('{per[m.group(2)]}', {m.group(1)})"
                   if m.group(2) in per else m.group(0)),
        out)
    return out


def _oracle_cell(v):
    # ints and floats compare numerically (the quidem golden
    # comparator is equally lenient: Calcite FLOOR(DOUBLE) renders
    # -12580.0 where Spark's FLOOR yields BIGINT -12580)
    if isinstance(v, bool):
        return v
    if isinstance(v, (int, float)):
        return round(float(v), 6)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return v


def run_case_oracle(eng, con, c) -> tuple[str, str]:
    """Self-oracle compare: engine vs DuckDB over identical rows,
    multiset semantics (see _kttm_rows for why order/LIMIT are safe)."""
    try:
        sdf = eng.sql(c["sql"])
        srows = sorted(repr(tuple(_oracle_cell(x) for x in row))
                       for row in sdf.collect())
    except Exception as ex:
        return "error", str(ex).replace("\n", " ")[:300]
    try:
        res = con.execute(_kttm_oracle_sql(c["sql"]))
        orows = sorted(repr(tuple(_oracle_cell(x) for x in row))
                       for row in res.fetchall())
    except Exception as ex:
        return "error", f"oracle: {str(ex)[:280]}"
    if srows == orows:
        return "pass-oracle", ""
    diff = [p for p in zip(srows, orows) if p[0] != p[1]][:3]
    return "mismatch", (f"oracle diff rows {len(srows)}/{len(orows)} "
                        f"{diff}")


def build_dataset_frames(spark, dataset_rel: str):
    """dataset path (relative to the reference root) → ({table: df},
    {lookup: map}), applying the reference's own ingest specs with our
    column conventions (MVD→array<string>, COMPLEX<json>→JSON text)."""
    from pyspark.sql import types as T
    from pyspark.sql import functions as F

    if dataset_rel == "__default__":
        frames, lookups = _default_frames(spark)
        # the `arrays` datasource (TestDataBuilder arraysIndex: auto
        # schema discovery over the reference's own
        # nested-array-test-data.json resource + a cnt count metric,
        # rollup false)
        afr, _ = _spec_frames(spark, [{
            "dataSchema": {
                "dataSource": "arrays",
                "timestampSpec": {"column": "timestamp"},
                "dimensionsSpec": {"useSchemaDiscovery": True},
                "metricsSpec": [{"type": "count", "name": "cnt"}],
                "granularitySpec": {"rollup": False},
            },
            "ioConfig": {
                "inputSource": {
                    "type": "local",
                    "baseDir": "processing/src/test/resources",
                    "filter": "nested-array-test-data.json"},
                "inputFormat": {"type": "json"},
            },
        }])
        frames.update(afr)
        # `lotsocolumns` (TestDataBuilder ROWS_LOTS_OF_COLUMNS: two
        # rows, default string dims incl. MVDs)
        lfr, _ = _spec_frames(spark, [{
            "dataSchema": {
                "dataSource": "lotsocolumns",
                "timestampSpec": {"column": "timestamp"},
                "dimensionsSpec": {"dimensions": [
                    "dimHyperUnique", "dimMultivalEnumerated",
                    "dimMultivalEnumerated2",
                    "dimMultivalSequentialWithNulls", "dimSequential",
                    "dimSequentialHalfNull", "dimUniform", "dimZipf",
                    "metFloatNormal", "metFloatZipf",
                    "metLongSequential", "metLongUniform"]},
                "metricsSpec": [{"type": "count", "name": "count"}],
                "granularitySpec": {"rollup": False},
            },
            "ioConfig": {
                "inputSource": {"type": "inline",
                                "data": "{\"timestamp\": \"2019-12-14T07:00:00Z\", \"metFloatZipf\": 147.0, \"dimMultivalSequentialWithNulls\": [\"1\", \"2\", \"3\", \"4\", \"5\", \"6\", \"7\", \"8\"], \"dimMultivalEnumerated2\": [null, \"Orange\", \"Apple\"], \"metLongUniform\": 372, \"metFloatNormal\": 5000.0, \"dimZipf\": \"27\", \"dimUniform\": \"74416\", \"dimMultivalEnumerated\": [\"Baz\", \"World\", \"Hello\", \"Baz\"], \"metLongSequential\": 0, \"dimHyperUnique\": \"0\", \"dimSequential\": \"0\", \"dimSequentialHalfNull\": \"0\"}\n{\"timestamp\": \"2019-12-14T07:00:00Z\", \"metFloatZipf\": 25.0, \"dimMultivalEnumerated2\": [\"Xylophone\", null, \"Corundum\"], \"metLongUniform\": 252, \"metFloatNormal\": 4999.0, \"dimZipf\": \"9\", \"dimUniform\": \"50515\", \"dimMultivalEnumerated\": [\"Baz\", \"World\", \"\\u3151 \\u3153 \\u3155 \\u3157 \\u315b \\u315c \\u3160 \\u3161 \\u3163\"], \"metLongSequential\": 8, \"dimHyperUnique\": \"8\", \"dimSequential\": \"8\"}"},
                "inputFormat": {"type": "json"},
            },
        }])
        frames.update(lfr)
        return frames, lookups
    if dataset_rel == "__KttmNestedComponentSupplier__":
        return _kttm_frames(spark)
    if dataset_rel == "__NestedComponentSupplier__":
        # CalciteNestedDataQueryTest.NestedComponentSupplier: the
        # `nested` datasource — RAW_ROWS (7 rows, auto dims string/
        # nest/nester/long/string_sparse + cnt count metric, rollup
        # false); CalciteNestedDataQueryTest.java:111-151
        nrows = [
            {"t": "2000-01-01", "string": "aaa", "string_sparse": "zzz",
             "nest": {"mixed": 1, "mixed2": "1", "x": 100, "y": 2.02,
                      "z": "300"},
             "nester": {"array": ["a", "b"], "n": {"x": "hello"}},
             "long": 5},
            {"t": "2000-01-01", "string": "bbb", "long": 4,
             "nester": "hello"},
            {"t": "2000-01-01", "string": "ccc", "string_sparse": "10",
             "nest": {"mixed": 1.1, "mixed2": 1, "x": 200, "y": 3.03,
                      "z": "abcdef"}, "long": 3},
            {"t": "2000-01-01", "string": "ddd", "string_sparse": "yyy",
             "long": 2},
            {"t": "2000-01-01", "string": "eee", "long": 1},
            {"t": "2000-01-02", "string": "aaa",
             "nest": {"mixed2": 1.1, "x": 100, "y": 2.02, "z": "400"},
             "nester": {"array": ["a", "b"], "n": {"x": 1}}, "long": 5},
            {"t": "2000-01-02", "string": "ddd", "long": 2,
             "nester": 2},
        ]
        return _spec_frames(spark, [{
            "dataSchema": {
                "dataSource": "nested",
                "timestampSpec": {"column": "t", "format": "iso"},
                "dimensionsSpec": {"dimensions": [
                    {"type": "auto", "name": n} for n in
                    ("string", "nest", "nester", "long",
                     "string_sparse")]},
                "metricsSpec": [{"type": "count", "name": "cnt"}],
                "granularitySpec": {"rollup": False},
            },
            "ioConfig": {
                "inputSource": {
                    "type": "inline",
                    "data": "\n".join(json.dumps(r) for r in nrows)},
                "inputFormat": {"type": "json"},
            },
        }])
    if dataset_rel.startswith("__"):
        raise FileNotFoundError(
            f"dataset for supplier {dataset_rel} not available locally")
    ddir = REF / dataset_rel
    # dataset dirs name their specs freely (sampledataset
    # rollup-index.json, druidjoinrule-fullouter-dataset *-index.json)
    specs = (sorted(ddir.glob("ingest*.json"))
             or sorted(ddir.glob("*.json")))
    if not specs:
        raise FileNotFoundError(f"no ingest spec under {ddir}")
    inners = [json.loads(sp.read_text()) for sp in specs]
    inners = [s.get("spec", s) for s in inners]
    return _spec_frames(spark, inners)


def _spec_frames(spark, inners):
    """({table: (df, json_cols)}, lookups) from a list of INNER ingest
    specs (the body build_dataset_frames used to inline)."""
    from pyspark.sql import types as T
    from pyspark.sql import functions as F
    out = {}
    for inner in inners:
        schema = inner["dataSchema"]
        raw = _read_spec_rows(inner)
        raw = _apply_flatten_spec_pyside(
            raw, inner["ioConfig"].get("inputFormat") or {})
        input_fields = {k for r in raw for k in r}
        raw = _apply_transforms_pyside(spark, raw, schema)
        ts_spec = schema.get("timestampSpec", {})
        ts_col = ts_spec.get("column", "timestamp")
        dims_spec = schema.get("dimensionsSpec", {})
        dims = dims_spec.get("dimensions") or []
        dims = [{"type": "string", "name": d} if isinstance(d, str) else d
                for d in dims]
        if not dims or dims_spec.get("useSchemaDiscovery"):
            # schema discovery: every field the INPUT rows carry (in
            # first-seen order, typed auto) joins any explicitly
            # declared dims. Transform-only outputs are NOT
            # discovered — TransformedInputRow.getDimensions()
            # (processing/.../transform/TransformedInputRow.java:51)
            # returns the source row's dimension list, so a transform
            # column is stored only when the dimensionsSpec names it
            # (qaArray ingest_schema_discovery_and_transformSpec C00-
            # C05: count(t_str_scalar1) → "not found")
            tr_only = {t["name"] for t in
                       (schema.get("transformSpec") or {})
                       .get("transforms", [])} - input_fields
            seen: dict[str, None] = {}
            for r in raw:
                for k in r:
                    if k != ts_col and k not in tr_only:
                        seen[k] = None
            excl = set(dims_spec.get("dimensionExclusions") or [])
            have = {d["name"] for d in dims}
            # classic schemaless (dimensions null, NO useSchemaDiscovery)
            # stores discovered nested data as STRING-ish text — LIKE
            # works over it; useSchemaDiscovery discovers true
            # COMPLEX<json> (the declared-vs-text split the LIKE
            # guard keys on)
            _classic = not dims and \
                not dims_spec.get("useSchemaDiscovery")
            dims = [{"type": "auto", "name": k, "_discovered": _classic}
                    for k in seen
                    if k not in excl and k not in have] + dims

        fields = [T.StructField("__time", T.TimestampType())]
        coercers = []
        json_cols = []
        for d in dims:
            name, typ = d["name"], d.get("type", "string")
            cast_to = d.get("castToType", "")
            values = [r.get(name) for r in raw]
            if typ == "long":
                fields.append(T.StructField(name, T.LongType()))
                coercers.append(lambda v: _coerce_scalar(v, "long"))
            elif typ in ("double", "float"):
                fields.append(T.StructField(name, T.DoubleType()))
                coercers.append(lambda v: _coerce_scalar(v, "double"))
            elif typ == "json":
                fields.append(T.StructField(name, T.StringType()))
                json_cols.append((name, "COMPLEX<json>"))
                coercers.append(lambda v: None if v is None else json.dumps(
                    v, separators=(",", ":")))
            elif typ == "auto" and cast_to.upper().startswith("ARRAY"):
                et = {"STRING": T.StringType(), "LONG": T.LongType(),
                      "DOUBLE": T.DoubleType()}[
                          cast_to.upper()[6:-1].strip()]
                fields.append(T.StructField(name, T.ArrayType(et)))
                coercers.append(lambda v: None if v is None else [
                    _mv_elem(e) for e in (v if isinstance(v, list) else [v])])
            elif typ == "auto":
                kind, st = _auto_type(values)
                _vals = [v for v in values if v is not None]
                if d.get("_discovered") and _vals and \
                        all(isinstance(v, bool) for v in _vals):
                    # classic schemaless (no discovery): booleans land
                    # in STRING dims as 'true'/'false'
                    # (ingest_schmless_json I05); discovery mode keeps
                    # the long typing below
                    fields.append(T.StructField(name, T.StringType()))
                    coercers.append(
                        lambda v: _coerce_scalar(v, "string"))
                elif d.get("_discovered") and kind == "json" and \
                        _vals and all(isinstance(v, list)
                                      for v in _vals):
                    # classic schemaless LIST with nested elements: a
                    # MULTI-VALUE string dim, each element Java-
                    # toString'd, null elements kept, row values
                    # SORTED nulls-first (string dims sort+dedupe the
                    # row's values at ingestion — StringDimensionIndexer;
                    # ingest_schmless_json I11-I13 pin [null,'[]','{}']
                    # from raw [{},[],null])
                    fields.append(T.StructField(
                        name, T.ArrayType(T.StringType())))
                    json_cols.append((name, "MVD"))
                    coercers.append(
                        lambda v: None if v is None else sorted(
                            {None if e is None else _java_str(e)
                             for e in v},
                            key=lambda e: (e is not None, e or "")))
                elif d.get("_discovered") and kind == "json":
                    # classic schemaless OBJECT: single-value Java
                    # toString string (I07/I09); stays LIKE-able
                    fields.append(T.StructField(name, T.StringType()))
                    json_cols.append((name, "JSON_TEXT"))
                    coercers.append(
                        lambda v: None if v is None else _java_str(v))
                elif kind == "scalar":
                    fields.append(T.StructField(
                        name, {"long": T.LongType(), "double": T.DoubleType(),
                               "string": T.StringType()}[st]))
                    if st in ("long", "double"):
                        # schema-DISCOVERED numeric scalars are
                        # variant-capable "auto" columns: the MV
                        # family stringifies them where a DECLARED
                        # long yields NULL (array_sql vs mv_sql
                        # array_to_mv(s_int/c_long) goldens)
                        json_cols.append((name, "AUTO"))
                    coercers.append(
                        lambda v, st=st: _coerce_scalar(v, st))
                elif kind == "array":
                    et = {"long": T.LongType(), "double": T.DoubleType(),
                          "string": T.StringType()}[st]
                    fields.append(T.StructField(name, T.ArrayType(et)))
                    coercers.append(lambda v, st=st: None if v is None else [
                        _coerce_scalar(e, st) for e in v])
                elif kind == "varray":
                    # mixed-scalar VARIANT array: the reference coerces
                    # comparisons to ARRAY<STRING> (qaArray goldens
                    # compare a_mixed against ARRAY['true','1','0.1'..])
                    fields.append(T.StructField(
                        name, T.ArrayType(T.StringType())))
                    json_cols.append((name, "ARRAY"))
                    coercers.append(lambda v: None if v is None else
                                    [_mv_elem(e) for e in v])
                else:
                    fields.append(T.StructField(name, T.StringType()))
                    # classic-schemaless nested data stores as
                    # queryable json TEXT (qaJsonCols ingest_schmless
                    # I14-I17 pin `c2 like '%b_str%'` as a working
                    # match); declared/discovery dims are true
                    # COMPLEX<json>, where LIKE is a validation error
                    # — the hint kind lets the engine keep both
                    json_cols.append((name, "JSON_TEXT"
                                      if d.get("_discovered")
                                      else "COMPLEX<json>"))
                    coercers.append(lambda v: None if v is None else
                                    json.dumps(v, separators=(",", ":")))
            elif typ == "string" and all(
                    v is None or v == [] for v in values):
                # a STRING dim with zero values never materializes a
                # column (qaUnnest/mv SELECT * goldens omit c_null and
                # c_mv_empty); auto/json/numeric dims still do
                fields.append(None)
                coercers.append(None)
            else:  # string dim: scalars AND multi-value arrays
                has_list = any(isinstance(v, list) for v in values)
                if has_list:
                    fields.append(T.StructField(
                        name, T.ArrayType(T.StringType())))
                    # a STRING dim with array values is an MVD —
                    # grouped it EXPLODES (unlike typed arrays, which
                    # group by value); the catalog hint drives the
                    # SQL layer's GROUP BY rewrite
                    json_cols.append((name, "MVD"))
                    # empty array ingests as null (Druid drops it)
                    coercers.append(lambda v: None if v is None or v == []
                                    else [_mv_elem(e) for e in v]
                                    if isinstance(v, list) else [_mv_elem(v)])
                else:
                    fields.append(T.StructField(name, T.StringType()))
                    coercers.append(lambda v: _coerce_scalar(v, "string"))

        # drop never-materialized dims (None placeholders)
        kept = [(d, co) for d, co, f in
                zip(dims, coercers, fields[1:]) if f is not None]
        fields = [fields[0]] + [f for f in fields[1:] if f is not None]
        dims = [d for d, _ in kept]
        coercers = [co for _, co in kept]
        rows = []
        for r in raw:
            row = [_parse_ts(r.get(ts_col), ts_spec)]
            for d, co in zip(dims, coercers):
                row.append(co(r.get(d["name"])))
            rows.append(tuple(row))
        gran = schema.get("granularitySpec") or {}
        metrics = schema.get("metricsSpec") or []
        if gran.get("rollup"):
            # ingest-time rollup: identical (queryGranularity-
            # truncated ts, dims) rows merge; count metrics take row
            # counts, longSum/doubleSum sum their source fields
            # (sampledataset rollup-tutorial: minute granularity +
            # packets/bytes longSums)
            qg = (gran.get("queryGranularity") or "none")
            if isinstance(qg, dict):
                qg = qg.get("type", "none")
            qg = str(qg).lower()

            def _trunc(ts):
                if ts is None or qg in ("none", "all"):
                    return ts
                if qg == "second":
                    return ts.replace(microsecond=0)
                if qg == "minute":
                    return ts.replace(second=0, microsecond=0)
                if qg == "fifteen_minute":
                    return ts.replace(minute=ts.minute - ts.minute % 15,
                                      second=0, microsecond=0)
                if qg == "thirty_minute":
                    return ts.replace(minute=ts.minute - ts.minute % 30,
                                      second=0, microsecond=0)
                if qg == "hour":
                    return ts.replace(minute=0, second=0, microsecond=0)
                if qg == "day":
                    return ts.replace(hour=0, minute=0, second=0,
                                      microsecond=0)
                if qg == "month":
                    return ts.replace(day=1, hour=0, minute=0,
                                      second=0, microsecond=0)
                if qg == "year":
                    return ts.replace(month=1, day=1, hour=0,
                                      minute=0, second=0, microsecond=0)
                # loud failure: an unmodeled granularity must surface
                # as a harness error, not an under-rolled-up dataset
                raise ValueError(
                    f"quidem harness: unhandled rollup "
                    f"queryGranularity {qg!r} — extend _trunc")
            groups: dict[str, list] = {}
            for row, r in zip(rows, raw):
                row = tuple([_trunc(row[0])] + list(row[1:]))
                groups.setdefault(
                    json.dumps(row, default=str), [row, []])[1].append(r)
            def _mval(m, rs):
                if m.get("type") == "count":
                    return len(rs)
                if m.get("type") in ("longSum", "doubleSum",
                                     "floatSum"):
                    s = sum(r.get(m.get("fieldName"), 0) or 0
                            for r in rs)
                    return int(s) if m["type"] == "longSum" else s
                return len(rs)
            rows = [tuple(list(row) + [_mval(m, rs) for m in metrics])
                    for row, rs in groups.values()]
        else:
            rows = [tuple(list(row) + [1 for m in metrics])
                    for row in rows]
        for m in metrics:
            fields.append(T.StructField(m["name"], T.LongType()))
        df = spark.createDataFrame(rows, T.StructType(fields))
        order = ["__time"] + [d["name"] for d in dims] + \
            [m["name"] for m in metrics]
        df = df.select(*[c for c in dict.fromkeys(order) if c in df.columns])
        out[schema["dataSource"]] = (df.cache(), dict(json_cols))
    return out, {}


# ------------------------------------------------------------- compare

REL_EPS = 1e-9


def _num_eq(a: float, b: float) -> bool:
    if math.isnan(a) or math.isnan(b):
        return math.isnan(a) and math.isnan(b)
    if a == b:
        return True
    return abs(a - b) <= REL_EPS * max(abs(a), abs(b), 1e-300)


def _ts_millis(v: dt.datetime) -> int:
    return int(v.replace(tzinfo=dt.timezone.utc).timestamp() * 1000)


def _parse_expected_ts(e: str):
    m = re.fullmatch(
        r"(\d{4})-(\d{2})-(\d{2})[ T](\d{2}):(\d{2}):(\d{2})(?:\.(\d+))?",
        e)
    if not m:
        return None
    ms = int((m.group(7) or "0").ljust(3, "0")[:3])
    try:
        d = dt.datetime(*[int(m.group(i)) for i in range(1, 7)],
                        tzinfo=dt.timezone.utc)
    except ValueError:
        # year 0000 goldens (TIME_PARSE('0') renders 0000-01-01) are
        # outside datetime's range — compare those cells as text
        return None
    return int(d.timestamp() * 1000) + ms


def _elem_eq(a, e) -> bool:
    """actual python element vs expected JSON-decoded element."""
    if a is None or e is None:
        return a is None and e is None
    if isinstance(e, bool) or isinstance(a, bool):
        return str(a).lower() == str(e).lower()
    if isinstance(e, (int, float)) or isinstance(a, (int, float)):
        try:
            return _num_eq(float(a), float(e))
        except (TypeError, ValueError):
            return False
    return str(a) == str(e)


def cell_eq(a, e: str) -> bool:
    """actual collected value vs expected rendered cell."""
    if a is None:
        return e in ("", "null")
    if isinstance(a, bool):
        return e == ("true" if a else "false")
    if isinstance(a, int):
        if e == "":
            return False
        if e in ("true", "false"):
            # BOOLEAN-typed columns store as longs here (Druid has no
            # boolean storage); 1/0 answers a true/false golden
            return (a != 0) == (e == "true")
        try:
            return _num_eq(float(a), float(e))
        except ValueError:
            return _parse_expected_ts(e) == a
    if isinstance(a, float):
        if e == "":
            return False
        if e == "NaN":
            return math.isnan(a)
        if e in ("Infinity", "-Infinity"):
            return a == float(e.replace("Infinity", "inf"))
        try:
            return _num_eq(a, float(e))
        except ValueError:
            return False
    if isinstance(a, dt.datetime):
        t = _parse_expected_ts(e)
        if t is not None:
            return t == _ts_millis(a)
        try:
            return _num_eq(float(e), _ts_millis(a))
        except ValueError:
            return False
    if isinstance(a, dt.date):
        return e == a.isoformat() or _parse_expected_ts(e) == _ts_millis(
            dt.datetime(a.year, a.month, a.day))
    if isinstance(a, (list, tuple)):
        a = list(a)
        if not a and e == "":
            # empty-MVD render variance: the interactive engine
            # prints '[]', dart/msq print blank for the same value
            # (ops_funcs_{array,mv}_funcs .std vs .dart/.msq goldens)
            return True
        if len(a) == 1 and not e.startswith("["):
            # a single-element MVD prints BARE in the reference's
            # table render (dim3 'd' not '["d"]' — SqlQuidemTest
            # mv_filter goldens)
            return cell_eq(a[0], e)
        if e.startswith("["):
            try:
                je = json.loads(e)
            except ValueError:
                je = None
            if isinstance(je, list):
                if len(je) == len(a) and all(
                        _elem_eq(x, y) for x, y in zip(a, je)):
                    return True
            # Java-style render (typed SQL arrays): [S1, S2, null]
            if _java_str(a) == e:
                return True
            # elementwise against a Java-style split (timestamps in
            # arrays render as datetimes while we hold millis, etc.)
            parts = _java_list_split(e)
            if (parts is not None and len(parts) == len(a)
                    and all(cell_eq(x, p) for x, p in zip(a, parts))):
                return True
            # JSONPath lists (JSON_PATHS/JSON_KEYS output): the
            # reference collects into a SET — order is arbitrary, so
            # compare as sorted multisets (scoped to '$'-shaped
            # elements so real array values stay order-checked)
            if (parts is not None and len(parts) == len(a)
                    and a and all(isinstance(x, str)
                                  and x.startswith("$") for x in a)
                    and all(p.startswith("$") for p in parts)):
                return sorted(a) == sorted(parts)
            return False
        # single-element MVD collapses to its scalar on render
        if len(a) == 1:
            return cell_eq(a[0], e)
        return False
    if isinstance(a, str):
        if "\x00" in a:
            # dual-render cells (pre-Gregorian fallback): accept any
            # rendered form
            return any(cell_eq(p, e) for p in a.split("\x00"))
        if a == e:
            return True
        if e in ("true", "false") and a in ("1", "0"):
            return (a == "1") == (e == "true")
        # JSON-equivalent object/array text (key order, spacing), and
        # variant arrays render Java-style: [true, 1, 0.1, S1, null]
        if a[:1] in ("{", "["):
            try:
                ja = json.loads(a)
            except ValueError:
                return False
            if e[:1] in ("{", "["):
                try:
                    if ja == json.loads(e):
                        return True
                except ValueError:
                    pass
            return _java_str(ja) == e
        return False
    if hasattr(a, "as_integer_ratio"):  # Decimal
        try:
            return _num_eq(float(a), float(e))
        except ValueError:
            return False
    return str(a) == e


def _java_list_split(e: str):
    """Split a Java-style rendered list '[a, b, c]' into element
    strings at top level (nested brackets kept whole)."""
    if not (e.startswith("[") and e.endswith("]")):
        return None
    inner = e[1:-1]
    if inner.strip() == "":
        return []
    parts, depth, start = [], 0, 0
    for i, ch in enumerate(inner):
        if ch in "[{":
            depth += 1
        elif ch in "]}":
            depth -= 1
        elif ch == "," and depth == 0:
            parts.append(inner[start:i].strip())
            start = i + 1
    parts.append(inner[start:].strip())
    return parts


def _render_key(v) -> str:
    if v is None:
        return "~null"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        return f"{v:.6g}" if not math.isnan(v) else "NaN"
    if isinstance(v, int):
        return f"{float(v):.6g}"
    if isinstance(v, dt.datetime):
        return str(_ts_millis(v))
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_render_key(x) for x in v) + "]"
    if isinstance(v, str):
        # same normalization as expected-side keys (timestamp-looking
        # strings key as millis) so sort orders agree
        return _expected_key(v)
    return str(v)


def _expected_key(e: str) -> str:
    if e in ("", "null"):
        return "~null"
    try:
        f = float(e)
        return f"{f:.6g}"
    except ValueError:
        pass
    t = _parse_expected_ts(e)
    if t is not None:
        return str(t)
    if e.startswith("["):
        try:
            je = json.loads(e)
            return "[" + ",".join(_render_key(x) for x in je) + "]"
        except ValueError:
            pass
    return e


def rows_match(actual: list[tuple], expected: list[list[str]],
               ordered: bool) -> bool:
    if len(actual) != len(expected):
        return False
    if actual and expected and len(actual[0]) != len(expected[0]):
        return False
    if not ordered:
        actual = sorted(actual, key=lambda r: [
            _render_key(v) for v in r])
        expected = sorted(expected, key=lambda r: [
            _expected_key(c) for c in r])
    ok = all(all(cell_eq(a, e) for a, e in zip(ra, re_))
             for ra, re_ in zip(actual, expected))
    if ok or ordered:
        return ok
    # sort-key divergence fallback: greedy multiset match (small sets)
    if len(actual) > 300:
        return False
    def _strict(a, e):
        if isinstance(a, (list, tuple)):
            return _java_str(list(a)) == e
        if a is None:
            return e == ""
        return str(a) == e

    pool = list(expected)
    for ra in actual:
        # strict render equality first: a null row must not greedily
        # consume an empty-string golden (both satisfy the tolerant
        # compare, but each has an exact partner in the pool)
        hit = next((i for i, re_ in enumerate(pool)
                    if all(_strict(a, e) for a, e in zip(ra, re_))), None)
        if hit is None:
            hit = next((i for i, re_ in enumerate(pool)
                        if all(cell_eq(a, e)
                               for a, e in zip(ra, re_))), None)
        if hit is None:
            return False
        pool.pop(hit)
    return True


def _window_is_unordered(spec: str, named: dict[str, str]) -> bool:
    s = spec.strip()
    if re.fullmatch(r"\w+", s):  # OVER w / OVER (w)
        s = named.get(s.upper(), "")
    depth = i = 0
    while i < len(s):
        ch = s[i]
        if ch == "'":
            i += 1
            while i < len(s) and s[i] != "'":
                i += 1
        elif ch in "([":
            depth += 1
        elif ch in ")]":
            depth -= 1
        elif depth == 0 and re.match(r"(?i)ORDER\s+BY", s[i:]):
            return False
        i += 1
    return True


def unordered_window_cols(sql: str) -> list[int]:
    """Indexes of top-level SELECT items computed by a window with no
    ORDER BY: their row pairing (and, for running frames, even their
    multiset) encodes the reference engine's arbitrary visit order —
    SQL leaves it unspecified.  Mirrors DrillWindowQueryTest's
    treatment of its order-dependent cases."""
    m = re.search(r"(?is)^\s*SELECT\s+(?:ALL\s+|DISTINCT\s+)?", sql)
    if not m:
        return []
    # find matching FROM at depth 0
    i, depth = m.end(), 0
    while i < len(sql):
        ch = sql[i]
        if ch == "'":
            i += 1
            while i < len(sql) and sql[i] != "'":
                i += 1
        elif ch in "([":
            depth += 1
        elif ch in ")]":
            depth -= 1
        elif depth == 0 and re.match(r"(?i)FROM\b", sql[i:]):
            break
        i += 1
    select_list = sql[m.end():i]
    named = {}
    for wm in re.finditer(r"(?is)(?:\bWINDOW\s+|,\s*)(\w+)\s+AS\s*\(",
                          sql):
        j, d = wm.end(), 1
        while j < len(sql) and d:
            if sql[j] == "(":
                d += 1
            elif sql[j] == ")":
                d -= 1
            j += 1
        named[wm.group(1).upper()] = sql[wm.end():j - 1]
    out = []
    items = _top_split_items(select_list)
    for idx, item in enumerate(items):
        for om in re.finditer(r"(?is)\bOVER\s*(\(|\w+)", item):
            if om.group(1) == "(":
                j, d = om.end(), 1
                while j < len(item) and d:
                    if item[j] == "(":
                        d += 1
                    elif item[j] == ")":
                        d -= 1
                    j += 1
                spec = item[om.end():j - 1]
            else:
                spec = om.group(1)
            if _window_is_unordered(spec, named):
                out.append(idx)
                break
    return out


def _top_split_items(s: str) -> list[str]:
    items, depth, start, i = [], 0, 0, 0
    while i < len(s):
        ch = s[i]
        if ch == "'":
            i += 1
            while i < len(s) and s[i] != "'":
                i += 1
        elif ch in "([":
            depth += 1
        elif ch in ")]":
            depth -= 1
        elif ch == "," and depth == 0:
            items.append(s[start:i])
            start = i + 1
        i += 1
    items.append(s[start:])
    return items


def columns_match(actual, expected, idxs) -> bool:
    """count + per-column multiset equality on the listed indexes."""
    if len(actual) != len(expected):
        return False
    for c in idxs:
        av = sorted(_render_key(r[c]) for r in actual)
        ev = sorted(_expected_key(r[c]) for r in expected)
        if av != ev:
            # numeric-tolerant fallback
            for x, y in zip(av, ev):
                if x != y:
                    try:
                        if abs(float(x) - float(y)) <= 1e-9 * max(
                                abs(float(x)), abs(float(y))):
                            continue
                    except (TypeError, ValueError):
                        pass
                    return False
    return True


def has_top_level_order_by(sql: str) -> bool:
    depth = 0
    i = 0
    up = sql.upper()
    while i < len(up):
        ch = up[i]
        if ch == "'":
            i += 1
            while i < len(up) and up[i] != "'":
                i += 1
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif depth == 0 and up.startswith("ORDER", i) \
                and re.match(r"ORDER\s+BY", up[i:]):
            return True
        i += 1
    return False


# ------------------------------------------------------------- runner

def collect_cases(families, file_filter=None, case_filter=None):
    cases = []
    for fam in families:
        fdir = QTEST / fam
        if not fdir.is_dir():
            fdir = SQLQ / fam
        if not fdir.is_dir():
            continue
        for iq in sorted(fdir.glob("*.iq")):
            if file_filter and file_filter not in iq.name:
                continue
            for c in parse_iq(iq):
                c["family"] = fam
                if case_filter and case_filter not in c["id"]:
                    continue
                cases.append(c)
    return cases


def run(families, file_filter=None, case_filter=None, limit=None,
        verbose=False, write_passlist=False, run_errors=False,
        only_failing_from=None, only_ids=None, spark=None):
    from druid_spark import DruidSparkEngine
    from druid_spark.session import get_spark

    spark = spark or get_spark("quidem-conformance")
    cases = collect_cases(families, file_filter, case_filter)
    wanted_kind = "error" if run_errors else "ok"
    cases = [c for c in cases if c["kind"] == wanted_kind]
    if only_ids is not None:
        only_ids = set(only_ids)
        cases = [c for c in cases if c["id"] in only_ids]
    if only_failing_from:
        prev = {json.loads(ln)["id"] for ln in
                Path(only_failing_from).read_text().splitlines()
                if ln.strip() and json.loads(ln)["status"] != "pass"}
        cases = [c for c in cases if c["id"] in prev]
    if limit:
        cases = cases[:limit]
    # group by dataset to minimize re-registration
    cases.sort(key=lambda c: (c["dataset"] or "", c["file"]))

    eng = None
    cur_ds = object()
    results = []
    kttm_con = None
    npass = nfail = nerr = nskip = 0
    OUTDIR.mkdir(exist_ok=True)
    stem = "_".join(f.rsplit(".", 1)[-1] for f in families)
    if len(stem) > 120:
        stem = f"{stem[:100]}_etc{len(families)}"
    outf = OUTDIR / f"{stem}{'_err' if run_errors else ''}.jsonl"
    with open(outf, "w") as fh:
        for n, c in enumerate(cases):
            if c["dataset"] != cur_ds:
                try:
                    frames, lookups = build_dataset_frames(
                        spark, c["dataset"])
                except Exception as ex:
                    frames = None
                    ds_err = str(ex)
                cur_ds = c["dataset"]
                if frames is not None:
                    eng = DruidSparkEngine(spark, exact_approx=True,
                                           hyperunique_parity=True)
                    for t, (df, jc) in frames.items():
                        eng.catalog.register_table(t, df, json_columns=jc)
                    for lname, lmap in lookups.items():
                        eng.catalog.register_lookup(lname, lmap)
            if frames is None:
                nskip += 1
                rec = {"id": c["id"], "status": "skip-dataset",
                       "detail": ds_err}
                fh.write(json.dumps(rec) + "\n")
                continue
            if c["family"] == "kttm_sunburst" and c["kind"] == "ok":
                # golden values are unreproducible (source json not in
                # the tree) — DuckDB self-oracle over identical rows
                if kttm_con is None:
                    kttm_con = _kttm_duck_con()
                status, detail = run_case_oracle(eng, kttm_con, c)
            else:
                status, detail = run_case(eng, c)
            rec = {"id": c["id"], "status": status}
            if detail:
                rec["detail"] = detail[:400]
            fh.write(json.dumps(rec) + "\n")
            fh.flush()
            if status.startswith("pass"):
                npass += 1
            elif status == "mismatch":
                nfail += 1
                if verbose:
                    print(f"MISMATCH {c['id']}\n{c['sql']}\n{detail}\n")
            else:
                nerr += 1
                if verbose:
                    print(f"ERROR {c['id']} -- {detail}")
            if (n + 1) % 200 == 0:
                print(f"... {n + 1}/{len(cases)} "
                      f"({npass} pass, {nfail} mismatch, {nerr} error)",
                      flush=True)
    print(f"\nQUIDEM CONFORMANCE [{' '.join(families)}]"
          f"{' (error cases)' if run_errors else ''}: "
          f"{npass} pass, {nfail} mismatch, {nerr} error, "
          f"{nskip} dataset-skip of {len(cases)}")
    print(f"results: {outf}")
    if write_passlist:
        pdir = Path(__file__).parent / "quidem_pass"
        pdir.mkdir(exist_ok=True)
        fam_of = {c["id"]: c["family"] for c in cases}
        by_fam: dict[str, list[str]] = {}
        for ln in outf.read_text().splitlines():
            rec = json.loads(ln)
            if rec["status"].startswith("pass"):
                by_fam.setdefault(
                    fam_of.get(rec["id"], "misc"), []).append(rec["id"])
        for fam, ids in by_fam.items():
            (pdir / f"{fam}.txt").write_text("\n".join(ids) + "\n")
            print(f"wrote {pdir / (fam + '.txt')} ({len(ids)})")
    return npass, nfail, nerr


def run_case(eng, c) -> tuple[str, str]:
    if c["kind"] == "error":
        try:
            eng.sql(c["sql"]).collect()
            return "mismatch", "expected an error, query succeeded"
        except Exception:
            return "pass", ""
    headers, exp_rows, nrows = parse_mysql_table(c["expected"])
    if headers is None:
        return "skip-noexpect", "no mysql table in expected block"
    try:
        df = eng.sql(c["sql"])
        try:
            actual = [tuple(row) for row in df.collect()]
        except Exception as ex:
            if "year 0 is out of range" not in str(ex):
                raise
            # pre-Gregorian timestamps (TIME_PARSE('1') = year 1)
            # crash PySpark's java->datetime rebase; collect them
            # pre-rendered in the comparator's own format
            from pyspark.sql import functions as F
            from pyspark.sql import types as T
            # render BOTH golden forms: the interactive engine prints
            # the proleptic date string (TIME_PARSE('0') →
            # '0000-01-01 ...') while msq/dart goldens record epoch
            # millis; cell_eq accepts either side of the \x00 split
            sel = [F.concat_ws(
                       "\x00",
                       F.date_format(F.col("`" + f.name + "`"),
                                     "yyyy-MM-dd HH:mm:ss.SSS"),
                       F.unix_millis(F.col("`" + f.name + "`"))
                       .cast("string")).alias(f.name)
                   if isinstance(f.dataType, T.TimestampType)
                   else F.col("`" + f.name + "`")
                   for f in df.schema.fields]
            actual = [tuple(row) for row in df.select(sel).collect()]
    except Exception as ex:
        return "error", str(ex).replace("\n", " ")[:300]
    if len(actual) != nrows:
        return "mismatch", f"row count {len(actual)} != {nrows}"
    if rows_match(actual, exp_rows, has_top_level_order_by(c["sql"])):
        return "pass", ""
    # unordered-window outputs encode the reference's arbitrary row
    # order; verify row count + the deterministic columns' multisets
    und = unordered_window_cols(c["sql"])
    if und and actual:
        det = [i for i in range(len(actual[0])) if i not in und]
        if columns_match(actual, exp_rows, det):
            return "pass-weak", f"unordered-window cols {und} unchecked"
    # build a small diff for triage
    diff = []
    for i, (ra, re_) in enumerate(zip(actual[:5], exp_rows[:5])):
        bad = [j for j, (a, e) in enumerate(zip(ra, re_))
               if not cell_eq(a, e)]
        if bad:
            diff.append(f"row{i} col{bad}: actual="
                        f"{[ra[j] for j in bad]} expected="
                        f"{[re_[j] for j in bad]}")
    return "mismatch", "; ".join(diff) or "row-order/set mismatch"


if __name__ == "__main__":
    args = sys.argv[1:]

    def _opt(name, default=None):
        if name in args:
            return args[args.index(name) + 1]
        return default

    fams = []
    if "--family" in args:
        i = args.index("--family") + 1
        while i < len(args) and not args[i].startswith("--"):
            fams.append(args[i])
            i += 1
    run(fams or FAMILIES,
        file_filter=_opt("--file"),
        case_filter=_opt("--case"),
        limit=int(_opt("--limit", 0)) or None,
        verbose="--verbose" in args,
        write_passlist="--write-passlist" in args,
        run_errors="--errors" in args,
        only_failing_from=_opt("--only-failing-from"))
