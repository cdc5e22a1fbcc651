"""union query — top-level union of queries.

Reference: processing/.../query/union/UnionQuery.java:52; SQL layer
plans UNION ALL only (sql/calcite/rule/DruidUnionRule.java). Spark's
unionByName; INTERSECT/EXCEPT available via engine.sql() as a superset.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def compile_query(engine, q: dict) -> DataFrame:
    dfs = [engine.query(sub) for sub in q["queries"]]
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionByName(d, allowMissingColumns=True)
    return out
