"""windowOperator query → pyspark.sql.Window.

Reference: processing/.../query/operator/WindowOperatorQuery.java:56 —
an operator pipeline of naivePartition/naiveSort + window processors
(ranking: window/ranking/*, value: window/value/*, framed aggregates:
window/WindowFramedAggregateProcessor.java, frames
window/WindowFrame.java:45-60). Spark's WindowExec implements the same
partition/sort/process pipeline natively; the compile keeps a running
(partition, sort) state while folding processors into withColumn()s.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, WindowSpec
from pyspark.sql import functions as F

from druid_spark.aggregations import AggCompiler
from druid_spark.engine import qcol


def compile_query(engine, q: dict) -> DataFrame:
    ctx = engine.prepare(q)
    df = ctx.df
    partition: list[str] = []
    order: list[Column] = []

    for op in q.get("operators") or []:
        t = op["type"]
        if t in ("naivePartition", "glueingPartition"):
            partition = op.get("partitionColumns", [])
        elif t in ("naiveSort", "partitionSort"):
            order = []
            for c in op.get("columns", []):
                col = qcol(c["column"] if isinstance(c, dict) else c)
                desc = isinstance(c, dict) and str(
                    c.get("direction", "ASC")).upper().startswith("DESC")
                order.append(col.desc() if desc else col.asc())
        elif t == "window":
            if not partition:
                _guard_unpartitioned(engine, df)
            df = _apply_processors(engine, df, op, partition, order)
        else:
            raise NotImplementedError(f"window operator {t}")
    return df


# An unpartitioned window (naiveSort with no naivePartition) serializes
# the whole input through ONE task — fine for the reference's contract
# (windowOperator inputs are grouped inner queries, i.e. post-aggregation
# and small), catastrophic on a scan-sized input at 100 TB. Enforce the
# contract with a bounded probe: read at most limit+1 rows (limit is
# pushed into the scan — no full count) and refuse beyond it.
UNPARTITIONED_WINDOW_MAX_ROWS = 1_000_000


def _guard_unpartitioned(engine, df: DataFrame) -> None:
    limit = getattr(engine, "window_unpartitioned_max_rows",
                    UNPARTITIONED_WINDOW_MAX_ROWS)
    if not limit:
        return
    if df.limit(limit + 1).count() > limit:
        raise ValueError(
            f"unpartitioned window over more than {limit} input rows "
            "would sort everything in a single task; add a "
            "naivePartition operator (or raise "
            "engine.window_unpartitioned_max_rows)")


def _spec(partition, order) -> WindowSpec:
    w = Window.partitionBy(*[qcol(p) for p in partition]) if partition \
        else Window.partitionBy(F.lit(1))
    return w.orderBy(*order) if order else w


def _apply_processors(engine, df, op, partition, order) -> DataFrame:
    processors = op.get("processors") or [op.get("processor")]
    for p in processors:
        if p is None:
            continue
        df = _one(engine, df, p, partition, order)
    return df


def _one(engine, df: DataFrame, p: dict, partition, order) -> DataFrame:
    t = p["type"]
    w = _spec(partition, order)
    out = p.get("outputColumn", t)
    if t == "rowNumber":
        return df.withColumn(out, F.row_number().over(w))
    if t == "rank":
        return df.withColumn(out, F.rank().over(w))
    if t == "denseRank":
        return df.withColumn(out, F.dense_rank().over(w))
    if t == "cumeDist":
        return df.withColumn(out, F.cume_dist().over(w))
    if t == "percentRank":
        return df.withColumn(out, F.percent_rank().over(w))
    if t == "percentile":  # ntile — WindowPercentileProcessor
        return df.withColumn(out, F.ntile(int(p["numBuckets"])).over(w))
    if t == "first":
        return df.withColumn(
            out, F.first(qcol(p["inputColumn"])).over(
                w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
    if t == "last":
        return df.withColumn(
            out, F.last(qcol(p["inputColumn"])).over(
                w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
    if t == "offset":  # lead/lag — WindowOffsetProcessor
        off = int(p.get("offset", 1))
        fn = F.lead if off > 0 else F.lag
        return df.withColumn(out, fn(qcol(p["inputColumn"]), abs(off)).over(w))
    if t == "framedAgg":
        frame = p.get("frame") or {}
        lo = frame.get("lowerOffset")
        hi = frame.get("upperOffset")
        lo = Window.unboundedPreceding if lo is None else int(lo)
        hi = Window.unboundedFollowing if hi is None else int(hi)
        if frame.get("type") in (None, "rows"):
            wf = w.rowsBetween(lo, hi)
        else:  # groups ≈ range on the order key
            wf = w.rangeBetween(lo, hi)
        ac = AggCompiler(qcol)
        for agg in p.get("aggregations", []):
            name = agg.get("name", agg["type"])
            df = df.withColumn(name, ac._agg(agg).over(wf))
        return df
    raise NotImplementedError(f"window processor {t}")
