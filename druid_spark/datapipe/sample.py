"""Sampling, split assignment, and decontamination for training-data
pipelines (beyond-reference operators, same family as dedup.py).

Scale design (100 TB):
- stratified_take is one window per stratum (shuffle on the stratum
  key) — no driver-side sampling state; deterministic tie-break makes
  it reproducible and oracle-checkable.
- hash_sample / assign_splits are pure row-local expressions (a seeded
  xxhash64 threshold) — zero shuffle, stable under re-runs and
  partition re-arrangement, and assigning by GROUP key (e.g. the dedup
  cluster id) keeps near-duplicates inside one split (leakage-safe).
- contamination is an inverted-index semi-join on n-gram hashes —
  the decontamination sweep (eval-set n-grams vs the training corpus)
  as one equi-join, never a cross join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from druid_spark.datapipe.dedup import normalize


def stratified_take(df: DataFrame, stratum: str, n: int,
                    order_by: str) -> DataFrame:
    """Exactly n rows per stratum, deterministically (the first n by
    `order_by`): window row_number per stratum — reproducible, unlike
    rate-based sampleBy."""
    from pyspark.sql import Window
    w = Window.partitionBy(stratum).orderBy(F.col(order_by))
    return (df.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") <= n).drop("__rn"))


def hash_sample(df: DataFrame, key: str, rate: float,
                seed: int = 0) -> DataFrame:
    """Keep a row iff hash(key) falls under `rate` — deterministic,
    re-run-stable, and consistent across tables sharing the key
    (unlike df.sample, which depends on partition layout)."""
    bucket = F.pmod(F.xxhash64(F.lit(seed), F.col(key)), F.lit(1_000_000))
    return df.where(bucket < int(rate * 1_000_000))


def assign_splits(df: DataFrame, key: str,
                  splits: dict[str, float] | None = None,
                  seed: int = 0) -> DataFrame:
    """Add a `split` column (train/val/test by default) assigned by
    hashing `key`. Hash the dedup cluster id (connected_components)
    rather than the doc id and near-duplicates land in the same split —
    the leakage-safe construction. Pure expression, no shuffle."""
    splits = splits or {"train": 0.98, "val": 0.01, "test": 0.01}
    bucket = F.pmod(F.xxhash64(F.lit(seed), F.col(key)), F.lit(1_000_000))
    expr, acc = None, 0.0
    for name, frac in splits.items():
        acc += frac
        cond = bucket < int(acc * 1_000_000)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    return df.withColumn("split", expr.otherwise(F.lit("train")))


def _ngrams(text_col, n: int):
    toks = F.filter(F.split(normalize(text_col), " "),
                    lambda t: F.length(t) > 0)
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0)))
    grams = F.transform(idx,
                        lambda i: F.array_join(F.slice(toks, i + 1, n), " "))
    return F.when(F.size(toks) >= n, F.array_distinct(grams)) \
            .otherwise(F.array())


def contamination(train: DataFrame, evalset: DataFrame, n: int = 8,
                  text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """Benchmark decontamination: per eval document, the fraction of its
    word n-grams that appear anywhere in the training corpus. One row
    per eval doc: (id, n_grams, n_hit, hit_rate). Train-side grams are
    deduplicated before the join; the join key is the gram string
    (hash-partitioned equi-join, sub-quadratic)."""
    tr = (train.select(F.explode(_ngrams(F.col(text_col), n)).alias("g"))
          .distinct())
    ev = (evalset
          .select(F.col(id_col).alias("id"),
                  F.explode(_ngrams(F.col(text_col), n)).alias("g")))
    hits = (ev.join(tr.withColumn("__hit", F.lit(1)), "g", "left")
            .groupBy("id")
            .agg(F.count(F.lit(1)).alias("n_grams"),
                 F.count("__hit").alias("n_hit")))
    return hits.select(
        "id", "n_grams", "n_hit",
        F.round(F.col("n_hit") / F.col("n_grams"), 4).alias("hit_rate"))
