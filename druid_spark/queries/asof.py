"""As-of (time-travel) join — a custom operator Spark lacks natively.

``asof_join(left, right, on, ...)`` attaches to every left row the
most recent right row at-or-before its timestamp (direction
"backward"; "forward" = earliest at-or-after), per join key. The
canonical use: enrich events with the latest prior dimension state or
metric snapshot.

Spark-first construction (no UDF, no range explosion): tag and union
both sides, sort within each key partition by (timestamp, side), and
carry the right-side columns forward with ``last(..., ignorenulls)``
over an unbounded-preceding running window; keep only left rows. Cost
is ONE shuffle on the join key plus a per-key sort — the same price as
a co-partitioned merge join, and it scales to arbitrarily many right
rows per key (no per-pair comparison). Hot keys are the caveat: a key
with billions of rows serializes its sort; salt upstream if keys are
that skewed.

The reference has no as-of join (joins are equi-only:
processing/.../query/JoinDataSource.java) — this is a
beyond-reference operator for training-data pipelines; DuckDB's
native ASOF JOIN serves as the independent oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(left: DataFrame, right: DataFrame, on: list[str],
              left_ts: str = "__time", right_ts: str = "__time",
              direction: str = "backward",
              tolerance_ms: int | None = None,
              right_prefix: str = "r_") -> DataFrame:
    """Left as-of join. Right-side value columns come back prefixed
    (``r_<col>``), NULL when no right row qualifies (or none within
    `tolerance_ms`)."""
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")

    rvals = [c for c in right.columns if c not in on and c != right_ts]
    l = left.withColumn("__ats", F.col(left_ts).cast("timestamp")) \
            .withColumn("__side", F.lit(1))
    r = right.select(
        *on,
        F.col(right_ts).cast("timestamp").alias("__ats"),
        F.lit(0).alias("__side"),
        *[F.col(c).alias(f"{right_prefix}{c}") for c in rvals])
    for c in l.columns:
        if c not in r.columns:
            r = r.withColumn(c, F.lit(None))
    for c in r.columns:
        if c not in l.columns:
            l = l.withColumn(c, F.lit(None))
    u = l.unionByName(r)

    if direction == "backward":
        # right rows sort before left at equal ts → inclusive match
        w = Window.partitionBy(*on).orderBy(F.col("__ats").asc(),
                                            F.col("__side").asc())
    else:
        w = Window.partitionBy(*on).orderBy(F.col("__ats").desc(),
                                            F.col("__side").asc())
    w = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)

    carried = [F.last(f"{right_prefix}{c}", ignorenulls=True).over(w)
               .alias(f"{right_prefix}{c}") for c in rvals]
    match_ts = F.last(F.when(F.col("__side") == 0, F.col("__ats")),
                      ignorenulls=True).over(w).alias("__match_ts")
    out = (u.select(*[c for c in l.columns
                      if not c.startswith(right_prefix)],
                    *carried, match_ts)
           .where(F.col("__side") == 1))

    if tolerance_ms is not None:
        gap = F.abs(F.unix_millis(F.col("__ats"))
                    - F.unix_millis(F.col("__match_ts")))
        within = gap <= F.lit(int(tolerance_ms))
        out = out.select(
            *[c for c in out.columns
              if not c.startswith(right_prefix)
              and c not in ("__match_ts",)],
            *[F.when(within, F.col(f"{right_prefix}{c}"))
              .alias(f"{right_prefix}{c}") for c in rvals],
            "__match_ts")
    return out.drop("__side", "__ats", "__match_ts")
