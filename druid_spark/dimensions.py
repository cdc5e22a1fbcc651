"""Dimension specs, extraction functions, virtual columns.

Reference surface:
- DimensionSpec subtypes `default|extraction|regexFiltered|listFiltered|
  prefixFiltered` (processing/.../query/dimension/DimensionSpec.java:41-45)
- ExtractionFn subtypes (processing/.../query/extraction/ExtractionFn.java:42-56)
- VirtualColumn subtypes, chiefly `expression`
  (processing/.../segment/virtual/ExpressionVirtualColumn.java:60)

All compile to Column expressions (JVM-side, codegen'd).
"""

from __future__ import annotations

import re
from typing import Any, Callable

from pyspark.sql import Column
from pyspark.sql import functions as F

from druid_spark import granularity as G
from druid_spark.expr import compile_expr, json_query_render, \
    json_value_scalar


def virtual_columns(spec: list[dict] | None,
                    resolver: Callable[[str], Column] | None = None,
                    lookups=None) -> dict[str, Column]:
    """Compile virtualColumns list → {name: Column}. Later vcols may
    reference earlier ones (the reference allows this)."""
    out: dict[str, Column] = {}
    base = resolver or F.col

    def res(name: str) -> Column:
        if name in out:
            return out[name]
        return base(name)

    for vc in spec or []:
        t = vc.get("type", "expression")
        if t == "expression":
            out[vc["name"]] = compile_expr(vc["expression"], res, lookups)
        elif t == "mv-filtered":
            allow = not vc.get("isAllowList", True)
            values = vc["values"]
            col = res(vc["delegate"])
            pred = (lambda x: ~x.isin(*values)) if allow else (lambda x: x.isin(*values))
            out[vc["name"]] = F.filter(col, pred)
        elif t == "mv-regex-filtered":
            pat = vc["pattern"]
            out[vc["name"]] = F.filter(res(vc["delegate"]), lambda x: x.rlike(pat))
        elif t == "mv-prefix-filtered":
            pfx = vc["prefix"]
            out[vc["name"]] = F.filter(res(vc["delegate"]), lambda x: x.startswith(pfx))
        elif t == "fallback":
            cols = [res(c) for c in vc["columns"]]
            out[vc["name"]] = F.coalesce(*cols)
        elif t == "nested-field":
            # NestedFieldVirtualColumn.java:132 — JSON path extraction
            # with an expected type; accepts 'path' (JSONPath "$.x.y",
            # or jq ".x.y" with useJqSyntax) or structured 'pathParts'
            col = res(vc.get("columnName") or vc["fieldName"])
            path = vc.get("path")
            if path is None and vc.get("pathParts") is not None:
                path = "$" + "".join(
                    f".{p['field']}" if p.get("type") == "field"
                    else f"[{p['index']}]" for p in vc["pathParts"])
            elif path and not path.startswith("$"):
                # jq-style ".x.[1]" only with the explicit flag
                # (NestedFieldVirtualColumn useJqSyntax; otherwise the
                # reference rejects the path —
                # getJsonPathPartsFromLiteral)
                if not vc.get("useJqSyntax"):
                    raise ValueError(
                        f"JSONPath [{path}] is invalid, it must start"
                        " with '$'")
                path = "$" + re.sub(r"\.\[", "[", path)
            typ = (vc.get("expectedType") or "STRING").upper()
            base_t = {"STRING": "string", "LONG": "long",
                      "DOUBLE": "double", "FLOAT": "float"}.get(
                      typ.split("<")[0])
            j = col.cast("string")
            if base_t:
                # scalar expected type: objects/arrays at the path are
                # missing (JsonValueExprMacro semantics)
                out[vc["name"]] = json_value_scalar(j, path).cast(base_t)
            else:
                # COMPLEX<json> / processFromRaw: NESTED_DATA rendering
                # (string scalars JSON-quoted — testJsonQuery)
                out[vc["name"]] = json_query_render(j, path)
        else:
            raise NotImplementedError(f"virtual column type {t}")
    return out


def extraction(fn: dict[str, Any] | None, col: Column) -> Column:
    """ExtractionFn → Column transform (ExtractionFn.java:42-56)."""
    if fn is None:
        return col
    t = fn["type"]
    if t == "identity":
        return col
    if t == "substring":
        index = fn.get("index", 0)
        length = fn.get("length")
        return F.substring(col, index + 1, length if length is not None else 2**31 - 1)
    if t == "strlen":
        return F.length(col).cast("string")
    if t == "upper":
        return F.upper(col)
    if t == "lower":
        return F.lower(col)
    if t == "regex":
        out = F.regexp_extract(col, fn["expr"], fn.get("index", 1))
        out = F.nullif(out, F.lit(""))
        if fn.get("replaceMissingValue"):
            out = F.coalesce(out, F.lit(fn.get("replaceMissingValueWith")))
        return out
    if t == "partial":  # return value if regex matches else null
        return F.when(col.rlike(fn["expr"]), col)
    if t == "stringFormat":
        return F.format_string(fn["format"], col)
    if t == "timeFormat":
        fmt = fn.get("format")
        tz = fn.get("timeZone")
        gran = fn.get("granularity")
        c = col
        if gran:
            c = G.bucket(c, gran)
        if tz and tz != "UTC":
            c = F.from_utc_timestamp(c, tz)
        if fmt:
            return F.date_format(c, fmt)
        return F.date_format(c, "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'")
    if t == "time":  # parse then reformat
        return F.date_format(F.to_timestamp(col, fn["timeFormat"]), fn["resultFormat"])
    if t == "bucket":
        size = fn.get("size", 1)
        offset = fn.get("offset", 0)
        return (F.floor((col.cast("double") - offset) / size) * size + offset).cast("long")
    if t == "lookup":
        lk = fn["lookup"]
        mapping = lk["map"] if isinstance(lk, dict) else {}
        m = F.create_map(*[F.lit(x) for kv in mapping.items() for x in kv])
        out = m.getItem(col)
        if fn.get("retainMissingValue"):
            out = F.coalesce(out, col)
        elif fn.get("replaceMissingValueWith") is not None:
            out = F.coalesce(out, F.lit(fn["replaceMissingValueWith"]))
        return out
    if t == "cascade":
        out = col
        for sub in fn["extractionFns"]:
            out = extraction(sub, out)
        return out
    if t == "javascript":
        raise NotImplementedError("javascript extraction fn (disabled in reference too)")
    raise NotImplementedError(f"extraction fn {t}")


def dimension(spec: str | dict[str, Any],
              resolver: Callable[[str], Column] | None = None,
              df=None) -> tuple[str, Column]:
    """DimensionSpec → (output_name, Column). df (optional) enables
    schema introspection for the filtered specs' MVD-vs-scalar split."""
    res = resolver or F.col
    if isinstance(spec, str):
        return spec, res(spec)
    t = spec.get("type", "default")
    name = spec.get("outputName", spec["dimension"])
    col = res(spec["dimension"])
    if t == "default":
        ot = spec.get("outputType")
        if ot:
            col = col.cast({"STRING": "string", "LONG": "long",
                            "FLOAT": "float", "DOUBLE": "double",
                            "ARRAY<STRING>": "array<string>",
                            "ARRAY<LONG>": "array<long>",
                            "ARRAY<FLOAT>": "array<float>",
                            "ARRAY<DOUBLE>": "array<double>"}
                           .get(ot.upper(), "string"))
        return name, col
    if t == "extraction":
        return name, extraction(spec["extractionFn"], col)
    # filtered specs (ListFilteredDimensionSpec family): on an MVD keep
    # only matching values; on a single-value column the value survives
    # or becomes null — polymorphic via schema introspection when a df
    # is provided (array behavior otherwise)
    if t in ("regexFiltered", "listFiltered", "prefixFiltered"):
        if t == "regexFiltered":
            pat = spec["pattern"]
            pred = lambda x: x.rlike(pat)  # noqa: E731
        elif t == "listFiltered":
            values = spec["values"]
            if spec.get("isWhitelist", True):
                pred = lambda x: x.isin(*values)  # noqa: E731
            else:
                pred = lambda x: ~x.isin(*values)  # noqa: E731
        else:
            pfx = spec["prefix"]
            pred = lambda x: x.startswith(pfx)  # noqa: E731
        if _is_array(df, spec.get("dimension")):
            # an empty survivor set is a NULL dimension value in the
            # reference (ListFilteredVirtualColumn —
            # CalciteMultiValueStringQueryTest pins {null, ...} groups)
            out = F.filter(col, pred)
            return name, F.when(F.size(out) > 0, out)
        return name, F.when(pred(col), col)
    raise NotImplementedError(f"dimension spec {t}")


def _is_array(df, colname: str | None) -> bool:
    if df is None or not colname:
        return True  # no schema info: preserve historical MVD behavior
    try:
        from pyspark.sql import types as T
        return isinstance(df.schema[colname].dataType, T.ArrayType)
    except Exception:
        return True
