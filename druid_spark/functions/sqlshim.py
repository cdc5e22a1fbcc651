"""Druid SQL → Spark SQL text rewriter (aggregate layer).

Scalar Druid functions are registered as real SQL UDFs
(functions/register.py) and need no rewriting. This module handles the
parts SQL UDFs can't express:
- aggregates bound to __time (EARLIEST/LATEST → MIN_BY/MAX_BY)
- approximate-aggregate family renames (datasketches SQL names →
  Spark approx equivalents)
- builtin-colliding names with different semantics.

Deliberately a light regex mapping, not a SQL parser — Catalyst does
the real work. Reference surface: sql/calcite/planner/DruidOperatorTable.java.
"""

from __future__ import annotations

import re


def rewrite_druid_sql(sql: str) -> str:
    out = sql
    # time-ordered first/last aggregators (EarliestLatestAnySqlAggregator)
    out = re.sub(r"\bEARLIEST_BY\(", "MIN_BY(", out, flags=re.IGNORECASE)
    out = re.sub(r"\bLATEST_BY\(", "MAX_BY(", out, flags=re.IGNORECASE)
    out = re.sub(r"\bEARLIEST\(\s*([^,()]+)\s*\)",
                 lambda m: f"MIN_BY({m.group(1)}, __time)", out,
                 flags=re.IGNORECASE)
    out = re.sub(r"\bLATEST\(\s*([^,()]+)\s*\)",
                 lambda m: f"MAX_BY({m.group(1)}, __time)", out,
                 flags=re.IGNORECASE)
    # approximate aggregates → Spark natives
    for name in ("APPROX_COUNT_DISTINCT_DS_HLL",
                 "APPROX_COUNT_DISTINCT_DS_THETA",
                 "APPROX_COUNT_DISTINCT_BUILTIN",
                 "HLL_SKETCH_ESTIMATE", "THETA_SKETCH_ESTIMATE"):
        out = re.sub(rf"\b{name}\(", "APPROX_COUNT_DISTINCT(", out,
                     flags=re.IGNORECASE)
    for name in ("APPROX_QUANTILE_DS", "APPROX_QUANTILE_FIXED_BUCKETS",
                 "APPROX_QUANTILE", "DS_GET_QUANTILE"):
        out = re.sub(rf"\b{name}\(", "APPROX_PERCENTILE(", out,
                     flags=re.IGNORECASE)
    # string / array aggregates
    out = re.sub(r"\bSTRING_AGG\(", "LISTAGG(", out, flags=re.IGNORECASE)
    out = re.sub(r"\bARRAY_CONCAT_AGG\(\s*([^()]+?)\s*\)",
                 lambda m: f"FLATTEN(COLLECT_LIST({m.group(1)}))", out,
                 flags=re.IGNORECASE)
    # Druid REGEXP_EXTRACT defaults to group 0 and yields NULL on no
    # match; Spark defaults to group 1 and yields ''. Rewrite only the
    # 2-arg form (3-arg is position-compatible).
    out = re.sub(
        r"\bREGEXP_EXTRACT\(\s*([^,()]+)\s*,\s*('[^']*')\s*\)",
        lambda m: f"NULLIF(REGEXP_EXTRACT({m.group(1)}, {m.group(2)}, 0), '')",
        out, flags=re.IGNORECASE)
    return out
