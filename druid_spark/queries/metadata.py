"""segmentMetadata query → schema/cardinality/min-max/size profiling.

Reference: processing/.../query/metadata/metadata/SegmentMetadataQuery.java:49
+ toolchest SegmentMetadataQueryQueryToolChest.java:77 (ColumnAnalysis:
type, cardinality, min/max values, size in bytes, null count). One row
per column, all statistics computed in a SINGLE aggregate pass (one
scan; partial aggregation map-side — the same shape at 100 TB).

Determinism contract (oracle-checkable):
- cardinality: exact count(distinct) when the engine runs exact_approx,
  else Datasketches HLL estimate.
- minValue/maxValue: canonical strings — numerics via round(.,4) +
  '%.4f' for floating types, plain cast for integrals, UTC
  'yyyy-MM-dd HH:mm:ss' for timestamps; NULL for non-orderable types.
- sizeBytes: a storage model both engines can compute — UTF-8 byte sum
  for strings, fixed width x non-null count for numerics/timestamps,
  8 x element count for arrays.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_WIDTH = {
    T.LongType: 8, T.DoubleType: 8, T.TimestampType: 8,
    T.IntegerType: 4, T.FloatType: 4, T.ShortType: 2,
    T.ByteType: 1, T.BooleanType: 1, T.DateType: 4,
}


def _stats(c, dt):
    """(min_str, max_str, size_bytes) aggregate columns for one field."""
    null_s = F.lit(None).cast("string")
    if isinstance(dt, (T.StringType,)):
        return (F.min(c), F.max(c),
                F.coalesce(F.sum(F.octet_length(c)), F.lit(0)).cast("long"))
    if isinstance(dt, (T.DoubleType, T.FloatType)):
        return (F.format_string("%.4f", F.round(F.min(c), 4)),
                F.format_string("%.4f", F.round(F.max(c), 4)),
                (F.lit(_WIDTH[type(dt)]) * F.count(c)).cast("long"))
    if isinstance(dt, (T.LongType, T.IntegerType, T.ShortType, T.ByteType)):
        return (F.min(c).cast("string"), F.max(c).cast("string"),
                (F.lit(_WIDTH[type(dt)]) * F.count(c)).cast("long"))
    if isinstance(dt, T.TimestampType):
        fmt = "yyyy-MM-dd HH:mm:ss"
        return (F.date_format(F.min(c), fmt), F.date_format(F.max(c), fmt),
                (F.lit(8) * F.count(c)).cast("long"))
    if isinstance(dt, T.ArrayType):
        return (null_s, null_s,
                F.coalesce(F.sum(F.size(c)) * 8, F.lit(0)).cast("long"))
    return (null_s, null_s, F.lit(None).cast("long"))


def compile_query(engine, q: dict) -> DataFrame:
    ctx = engine.prepare(q)
    df = ctx.df
    fields = list(df.schema.fields)
    # toInclude (SegmentMetadataQuery.java:49 — ColumnIncluderator
    # all/none/list): restricts which columns are profiled. The list
    # form also prunes the scan to just those columns.
    inc = q.get("toInclude")
    if inc:
        itype = inc.get("type", "all")
        if itype == "none":
            fields = []
        elif itype == "list":
            want = set(inc.get("columns") or [])
            fields = [f for f in fields if f.name in want]
            if fields:
                df = df.select(*[F.col("`" + f.name + "`")
                                 for f in fields])
    # analysisTypes (SegmentMetadataQuery.AnalysisType): compute only
    # the requested statistics; unrequested ones come back NULL (the
    # reference omits them from ColumnAnalysis). Default: all three
    # column statistics. interval/timestampSpec/queryGranularity/
    # aggregators/rollup are segment-level in the reference and n/a
    # to a single-warehouse profile row.
    atypes = q.get("analysisTypes")
    want_card = atypes is None or "cardinality" in atypes
    want_minmax = atypes is None or "minmax" in atypes
    want_size = atypes is None or "size" in atypes
    exact = getattr(engine, "exact_approx", False)
    null_l = F.lit(None).cast("long")
    null_s = F.lit(None).cast("string")
    aggs = [F.count(F.lit(1)).alias("__rows")]
    for f in fields:
        c = F.col("`" + f.name + "`")
        key = f.name.replace("`", "")
        if not want_card:
            card = null_l
        elif exact:
            card = F.count_distinct(c)
        elif isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType)):
            card = F.hll_sketch_estimate(F.hll_sketch_agg(F.to_json(c), 12))
        else:
            card = F.hll_sketch_estimate(F.hll_sketch_agg(c.cast("string"), 12))
        aggs.append(card.cast("long").alias(f"card__{key}"))
        aggs.append(F.count(F.when(c.isNull(), 1)).alias(f"nulls__{key}"))
        mn, mx, sz = _stats(c, f.dataType)
        if not want_minmax:
            mn, mx = null_s, null_s
        if not want_size:
            sz = null_l
        aggs.append(mn.alias(f"min__{key}"))
        aggs.append(mx.alias(f"max__{key}"))
        aggs.append(sz.alias(f"size__{key}"))
    if not fields:
        return df.agg(*aggs).selectExpr(
            "CAST(NULL AS STRING) as column",
            "CAST(NULL AS STRING) as type",
            "CAST(NULL AS BIGINT) as cardinality",
            "CAST(NULL AS BIGINT) as nullCount",
            "CAST(NULL AS STRING) as minValue",
            "CAST(NULL AS STRING) as maxValue",
            "CAST(NULL AS BIGINT) as sizeBytes",
            "__rows as numRows").where(F.lit(False))
    row = df.agg(*aggs)

    # melt to one row per column via stack()
    stack_args = []
    for f in fields:
        key = f.name.replace("`", "")
        stack_args.append(
            f"'{key}', '{f.dataType.simpleString()}', `card__{key}`, "
            f"`nulls__{key}`, `min__{key}`, `max__{key}`, `size__{key}`")
    n = len(fields)
    return row.selectExpr(
        "__rows as numRows",
        f"stack({n}, {', '.join(stack_args)}) as "
        "(column, type, cardinality, nullCount, minValue, maxValue, sizeBytes)"
    ).select("column", "type", "cardinality", "nullCount",
             "minValue", "maxValue", "sizeBytes", "numRows")
