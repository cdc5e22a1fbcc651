"""Range join (point-in-interval) — the second custom operator Spark
has no native strategy for (a naive inequality join plans as
BroadcastNestedLoopJoin / CartesianProduct, O(n*m)).

Scale path: discretize. Each right interval [lo, hi] explodes to one
row per covered bucket of width `bucket_width`; each left point maps
to exactly one bucket; the join becomes an EQUI-join on
(keys..., bucket) followed by the exact interval filter. Cost:
|right| * avg_span/width extra rows and one hash shuffle — pick
`bucket_width` near the median interval span so the blowup is ~2x.
Every pair appears at most once (the left point lives in one bucket),
so no dedup pass is needed.

Beyond-reference operator (the reference's joins are equi-only —
processing/.../query/JoinDataSource.java); standard use: band/bin
assignment, IP-range tagging, windowed event-to-session attachment.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def range_join(left: DataFrame, right: DataFrame, point: str,
               lo: str, hi: str, on: list[str] | None = None,
               bucket_width: float = 1.0, how: str = "inner",
               right_prefix: str = "r_") -> DataFrame:
    """Join left rows whose `point` falls in [right.lo, right.hi]
    (inclusive), optionally also matching equi-keys `on`. Numeric
    columns; cast timestamps to epoch millis first."""
    on = on or []
    w = float(bucket_width)

    def bucket(c: Column) -> Column:
        return F.floor(c.cast("double") / F.lit(w)).cast("long")

    rvals = [c for c in right.columns if c not in on]
    r = right.withColumn(
        "__bkt",
        F.explode(F.sequence(bucket(F.col(lo)), bucket(F.col(hi)))))
    r = r.select(*on, "__bkt",
                 *[F.col(c).alias(f"{right_prefix}{c}") for c in rvals])
    l = left.withColumn("__bkt", bucket(F.col(point)))

    if how != "inner":
        raise NotImplementedError(
            "range_join is inner-only; outer multiplicity semantics "
            "are ambiguous — anti-join the result against left instead")
    cond = [l["__bkt"] == r["__bkt"]] + [l[k] == r[k] for k in on]
    j = l.join(r, cond, "inner")
    in_range = ((F.col(point).cast("double")
                 >= F.col(f"{right_prefix}{lo}").cast("double"))
                & (F.col(point).cast("double")
                   <= F.col(f"{right_prefix}{hi}").cast("double")))
    return j.where(in_range).select(
        *[l[c] for c in left.columns],
        *[r[f"{right_prefix}{c}"] for c in rvals])
