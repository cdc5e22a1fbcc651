"""Bounded, mergeable sketch state in pure Catalyst expressions.

Two sketch families whose per-group state is a fixed-size column that
re-merges losslessly-by-construction across rollup buckets — the
property that makes sketch-in-rollup work at 100 TB, where an exact
distinct SET or a raw value list approaches raw-data scale:

- **KMV theta sketch** (k minimum hash values): state = the k smallest
  distinct xxhash64 values of the column, stored as a sorted
  ``array<bigint>``. Union-merge = distinct-merge the arrays and keep
  the k smallest; estimate = (k-1)/u_k where u_k is the k-th smallest
  hash mapped to [0,1). Below k distinct values the sketch is EXACT.
  This is the classic KMV/bottom-k estimator (Bar-Yossef et al. 2002),
  the same family as the reference's theta sketch
  (extensions-core/datasketches/.../theta/SketchAggregatorFactory.java)
  — theta sketches generalize KMV.

- **Bottom-k uniform row sample** (for quantiles): state = the k rows
  with the smallest row-hashes as ``array<struct<h:bigint, v:double>>``.
  Because the hash is uniform over rows, the bottom-k of a union of
  bottom-k states IS the bottom-k of the union of the underlying rows —
  a mergeable uniform sample without replacement. Quantile estimate =
  empirical quantile of the sample values; rank error ~ sqrt(q(1-q)/k).
  Mirrors what the reference's quantiles sketch is for
  (extensions-core/datasketches/.../quantiles/
  DoublesSketchAggregatorFactory.java) with a deterministic,
  Catalyst-only construction. Caveat: rows whose salt tuple collides
  hash identically and collapse to one sample slot; pass a
  high-entropy ``salt_cols`` (e.g. the timestamp) to avoid bias.

**Interop decision (round-3).** Where sketch blobs must interoperate
with the reference's ecosystem (Druid users exchange Datasketches
binary images), the engine now uses Spark's NATIVE Datasketches
functions, which emit the standard binary formats: ``hll_sketch_agg``
family (HLL, ``hllState``/``hllUnionEstimate`` aggregators),
``theta_sketch_agg`` family (theta, ``thetaState``/
``thetaUnionEstimate``), and ``kll_sketch_agg_double`` family (KLL
quantiles, ``kllState``/``kllUnionQuantile``) — see aggregations.py and
plans/projections.py (sketch="hll"|"theta", kllState metrics). The KMV
and bottom-k-sample constructions in THIS module are deliberately kept
as **engine-internal formats**: their state is a plain
``array<bigint>`` / ``array<struct>`` column — human-inspectable,
Catalyst-only (no JVM sketch library on the read path), exact below k,
and usable from pure SQL — but their bytes are NOT
Datasketches-compatible and must not be exchanged with Druid
deployments. Choose the native family for interop, this module for
transparency/portability.

Scale notes (the part that matters):
- The BUILD is two-shuffle, never unbounded in memory: a distinct /
  hash projection, then a per-group window ``row_number() <= k`` (sort
  within group partitions), then ``collect_list`` of at most k rows.
  No ``collect_set`` of unbounded cardinality ever materializes.
- MERGE and ESTIMATE are single aggregate expressions over arrays of
  size <= k (flatten -> dedup -> sort -> slice), all JVM-side
  higher-order functions — no Python in the data path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# 2^64 as a double, for mapping signed xxhash64 output onto [0,1)
_TWO64 = float(1 << 64)

DEFAULT_K = 1024


def kmv_hash(col: Column) -> Column:
    """Uniform 64-bit hash of any column (stringified first so every
    input type is accepted; distinct cardinality is unchanged)."""
    return F.xxhash64(col.cast("string"))


def _unit(hash_col: Column) -> Column:
    """Map a signed 64-bit hash onto [0,1) preserving order."""
    return hash_col.cast("double") / F.lit(_TWO64) + F.lit(0.5)


# ------------------------------------------------------------------ build

def kmv_state(df: DataFrame, keys: list[str], field: str,
              k: int = DEFAULT_K) -> DataFrame:
    """Per-`keys` KMV state: sorted array of the k smallest distinct
    hashes of `field`. Build plan: distinct (shuffle dedup — scales),
    window top-k per group (sort), bounded collect_list."""
    h = kmv_hash(F.col(field)).alias("__h")
    dedup = df.select(*keys, h).distinct()
    w = Window.partitionBy(*keys).orderBy("__h")
    topk = dedup.withColumn("__rn", F.row_number().over(w)) \
                .where(F.col("__rn") <= k)
    return topk.groupBy(*keys).agg(
        F.array_sort(F.collect_list("__h")).alias(f"{field}_kmv"))


def sample_state(df: DataFrame, keys: list[str], field: str,
                 salt_cols: list[str], k: int = DEFAULT_K) -> DataFrame:
    """Per-`keys` bottom-k uniform row sample of `field` as
    array<struct<h,v>>. The row hash mixes `field` with `salt_cols` so
    duplicate values land in distinct sample slots."""
    h = F.xxhash64(*[F.col(c).cast("string")
                     for c in [field, *salt_cols]]).alias("__h")
    rows = df.select(*keys, h, F.col(field).cast("double").alias("__v"))
    w = Window.partitionBy(*keys).orderBy("__h")
    topk = rows.withColumn("__rn", F.row_number().over(w)) \
               .where(F.col("__rn") <= k)
    return topk.groupBy(*keys).agg(
        F.array_sort(F.collect_list(F.struct(
            F.col("__h").alias("h"), F.col("__v").alias("v"))))
        .alias(f"{field}_sample"))


# ------------------------------------------------------- merge + estimate

def kmv_merge(state_col: Column, k: int = DEFAULT_K) -> Column:
    """Aggregate: union KMV states (arrays <= k) into one state."""
    return F.slice(
        F.array_sort(F.array_distinct(F.flatten(F.collect_list(state_col)))),
        1, k)


def kmv_estimate(merged: Column, k: int = DEFAULT_K) -> Column:
    """Distinct-count estimate from a merged KMV state: exact below k,
    else (k-1)/u_k."""
    n = F.size(merged)
    u_k = _unit(F.element_at(merged, k))
    return F.when(n < k, n.cast("double")) \
            .otherwise(F.lit(float(k - 1)) / u_k) \
            .cast("double")


def kmv_union_estimate(state_col: Column, k: int = DEFAULT_K) -> Column:
    """Aggregate expression: merge KMV states and estimate, rounded to
    a long (the reference rounds HLL/theta estimates the same way —
    HllSketchAggregatorFactory round=true default in SQL)."""
    return F.round(kmv_estimate(kmv_merge(state_col, k), k)).cast("long")


def sample_merge(state_col: Column, k: int = DEFAULT_K) -> Column:
    """Aggregate: union bottom-k samples into one bottom-k sample.
    Sorting the struct array orders by `h` (first field) — exactly the
    bottom-k-by-hash invariant."""
    return F.slice(
        F.array_sort(F.array_distinct(F.flatten(F.collect_list(state_col)))),
        1, k)


# ------------------------------------------------------- tuple (KMV keys)

def tuple_state(df: DataFrame, keys: list[str], key_field: str,
                metric_fields: list[str], k: int = DEFAULT_K) -> DataFrame:
    """Per-`keys` stored TUPLE sketch state — the engine-internal
    mergeable analog of the reference's arrayOfDoublesSketch
    (extensions-core/datasketches/.../ArrayOfDoublesSketchAggregator-
    Factory.java): struct(kmv = bottom-k distinct hashes of key_field,
    sums = per-metric totals over non-null-key rows). Re-merge across
    rollup rows: kmv unions (tuple_union_estimate), sums add
    (tuple_union_metric_sum) — both bounded-size aggregate expressions,
    so a rollup row stays O(k) at any cardinality. Spark ships no native
    arrayOfDoubles function, so the state is deliberately NOT
    Datasketches-binary (see the module interop paragraph above);
    estimates are exact below k."""
    kmv = kmv_state(df, keys, key_field, k)
    key_ok = F.col(key_field).isNotNull()
    sums = df.groupBy(*keys).agg(
        *[F.sum(F.when(key_ok, F.col(m)).cast("double")).alias(f"__s{i}")
          for i, m in enumerate(metric_fields)])
    # null-SAFE equi-join: both sides emit a row for a NULL-valued
    # grouping key, and plain EqualTo (NULL != NULL) would silently
    # drop that group's estimate and sums
    cond = None
    for c in keys:
        eq = kmv[c].eqNullSafe(sums[c])
        cond = eq if cond is None else cond & eq
    return kmv.join(sums, cond).select(
        *[kmv[c] for c in keys],
        F.struct(kmv[f"{key_field}_kmv"].alias("kmv"),
                 F.array(*[sums[f"__s{i}"]
                           for i in range(len(metric_fields))])
                 .alias("sums")).alias("tuple_state"))


def tuple_union_estimate(state_col: Column, k: int = DEFAULT_K) -> Column:
    """Aggregate: re-merge stored tuple states, estimate distinct keys
    (arrayOfDoublesSketchToEstimate over merged stored sketches)."""
    return kmv_union_estimate(state_col["kmv"], k)


def tuple_union_metric_sum(state_col: Column, i: int) -> Column:
    """Aggregate: re-merged sum of metric i (1-based)
    (arrayOfDoublesSketchToMetricsSumEstimate; exact — sums add, and in
    the exact regime theta == 1 so no scaling applies)."""
    return F.sum(F.element_at(state_col["sums"], i))


def sample_quantile(merged: Column, fraction: float) -> Column:
    """Empirical quantile of the sample values (nearest-rank, the
    reference's DoublesSketch getQuantile convention)."""
    vals = F.array_sort(F.transform(merged, lambda s: s["v"]))
    n = F.size(vals)
    idx = F.round(F.lit(float(fraction)) * (n - 1).cast("double")) \
           .cast("int") + 1
    return F.element_at(vals, idx)
