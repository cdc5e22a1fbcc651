"""Druid SQL → Spark SQL text rewriter.

Druid's SQL operators (sql/calcite/planner/DruidOperatorTable.java) are
mostly ANSI and run on Spark unchanged. The Druid-specific function
names are rewritten textually to Spark equivalents so Druid SQL text
runs unmodified where semantics align. This is deliberately a light
name mapping, not a SQL parser — Catalyst does the real work.
"""

from __future__ import annotations

import re

# name → spark name (1:1 argument-compatible renames)
_RENAMES = {
    "TIME_FLOOR": None,  # handled structurally below
    "STRPOS": "INSTR",
    "TEXTCAT": "CONCAT",
    "STRING_FORMAT": "FORMAT_STRING",
    "PARSE_LONG": "CAST_LONG",  # handled below
    "STRING_TO_ARRAY": "SPLIT",
    "ARRAY_TO_STRING": "ARRAY_JOIN",
    "MV_TO_ARRAY": "",  # identity — drop the call
    "ARRAY_TO_MV": "",
    "MV_LENGTH": "SIZE",
    "ARRAY_LENGTH": "SIZE",
    "MV_CONTAINS": "ARRAY_CONTAINS",
    "MV_OVERLAP": "ARRAYS_OVERLAP",
    "ARRAY_OVERLAP": "ARRAYS_OVERLAP",
    "MV_APPEND": "ARRAY_APPEND",
    "MV_PREPEND": "ARRAY_PREPEND",
    "MV_CONCAT": "CONCAT",
    "ARRAY_CONCAT": "CONCAT",
    "MV_OFFSET": "GET",
    "ARRAY_OFFSET": "GET",
    "CONTAINS_STRING": "CONTAINS",
    "EARLIEST": "EARLIEST",  # registered below as min_by rewrite
    "TIMESTAMP_TO_MILLIS": "UNIX_MILLIS",
    "MILLIS_TO_TIMESTAMP": "TIMESTAMP_MILLIS",
    "DIV": "DIV",
    "SAFE_DIVIDE": "TRY_DIVIDE",
    "NVL": "NVL",
    "BITWISE_AND": "&",
    "HLL_SKETCH_ESTIMATE": "",
    "APPROX_COUNT_DISTINCT_DS_HLL": "APPROX_COUNT_DISTINCT",
    "APPROX_COUNT_DISTINCT_DS_THETA": "APPROX_COUNT_DISTINCT",
    "APPROX_COUNT_DISTINCT_BUILTIN": "APPROX_COUNT_DISTINCT",
    "DS_GET_QUANTILE": "APPROX_PERCENTILE",
    "APPROX_QUANTILE": "APPROX_PERCENTILE",
    "APPROX_QUANTILE_DS": "APPROX_PERCENTILE",
    "ICONTAINS_STRING": "ICONTAINS_STRING",  # structural below
}

_PERIOD_UNIT = {
    "PT1S": "second", "PT1M": "minute", "PT1H": "hour", "P1D": "day",
    "P1W": "week", "P1M": "month", "P3M": "quarter", "P1Y": "year",
}


def rewrite_druid_sql(sql: str) -> str:
    out = sql
    # TIME_FLOOR(x, 'P1D') → date_trunc('day', x)
    def _floor(m):
        expr, period = m.group(1), m.group(2)
        unit = _PERIOD_UNIT.get(period)
        if unit is None:
            return m.group(0)
        return f"date_trunc('{unit}', {expr})"
    out = re.sub(r"TIME_FLOOR\(\s*([^,()]+)\s*,\s*'([^']+)'\s*\)", _floor, out,
                 flags=re.IGNORECASE)
    # TIME_SHIFT(x, 'P1D', n) → x + n * interval
    def _shift(m):
        expr, period, n = m.group(1), m.group(2), m.group(3)
        unit = _PERIOD_UNIT.get(period)
        if unit is None:
            return m.group(0)
        return f"({expr} + ({n}) * interval '1' {unit})"
    out = re.sub(r"TIME_SHIFT\(\s*([^,()]+)\s*,\s*'([^']+)'\s*,\s*([^,()]+)\s*\)",
                 _shift, out, flags=re.IGNORECASE)
    out = re.sub(r"\bICONTAINS_STRING\(\s*([^,()]+)\s*,\s*([^()]+?)\s*\)",
                 lambda m: f"CONTAINS(LOWER({m.group(1)}), LOWER({m.group(2)}))",
                 out, flags=re.IGNORECASE)
    out = re.sub(r"\bEARLIEST\(\s*([^,()]+)\s*\)",
                 lambda m: f"MIN_BY({m.group(1)}, __time)", out, flags=re.IGNORECASE)
    out = re.sub(r"\bLATEST\(\s*([^,()]+)\s*\)",
                 lambda m: f"MAX_BY({m.group(1)}, __time)", out, flags=re.IGNORECASE)
    out = re.sub(r"\bPARSE_LONG\(\s*([^,()]+)\s*\)",
                 lambda m: f"CAST({m.group(1)} AS BIGINT)", out, flags=re.IGNORECASE)
    # simple renames
    for src, dst in _RENAMES.items():
        if dst is None or dst == src:
            continue
        if dst == "":
            out = re.sub(rf"\b{src}\(", "(", out, flags=re.IGNORECASE)
        elif dst.isidentifier() or dst.isalnum() or "_" in dst:
            out = re.sub(rf"\b{src}\(", f"{dst}(", out, flags=re.IGNORECASE)
    return out
