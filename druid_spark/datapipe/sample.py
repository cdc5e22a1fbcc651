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
    the leakage-safe construction. Pure expression, no shuffle.

    The bucket is the first 60 bits of md5(seed|key) (r13) — a
    PORTABLE derivation any engine reproduces exactly (DuckDB:
    CAST('0x'||substring(md5(...),1,15) AS BIGINT); the bank's
    split_assign oracle pins it value-for-value), so a split
    membership decided here can be re-derived outside Spark.  The
    sampling paths (hash_sample/temperature) keep the cheaper
    xxhash64 — membership there is engine-internal."""
    splits = splits or {"train": 0.98, "val": 0.01, "test": 0.01}
    bucket = F.pmod(
        F.conv(F.substring(
            F.md5(F.concat_ws("|", F.lit(str(seed)), F.col(key))),
            1, 15), 16, 10).cast("long"),
        F.lit(1_000_000))
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


def temperature_rates(df: DataFrame, group_col: str = "lang",
                      alpha: float = 0.3) -> DataFrame:
    """Per-group sampling rates for temperature-balanced mixing (the
    multilingual-pretraining reweighting: sample group l with
    probability q_l ∝ p_l^alpha, alpha<1 upsampling the tail). The
    per-ROW keep rate is q_l/p_l = p_l^(alpha-1), normalized so the
    largest rate is 1 (downsample-only — never duplicates rows).

    Plan: one tiny groupBy(lang) agg, then window math over the
    handful of group rows — no per-row shuffle; the rates join back
    broadcast. Exact closed-form arithmetic, so a SQL oracle verifies
    it."""
    from pyspark.sql import Window
    counts = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy()
    p = F.col("n") / F.sum("n").over(w)
    raw = F.pow(p, F.lit(alpha - 1.0))
    return counts.select(
        group_col, "n",
        F.round(p, 6).alias("p"),
        F.round(raw / F.max(raw).over(w), 6).alias("rate"))


def temperature_sample(df: DataFrame, group_col: str = "lang",
                       alpha: float = 0.3, key: str = "doc_id",
                       seed: int = 0) -> DataFrame:
    """Apply the temperature rates: keep a row iff its seeded hash
    bucket falls under its group's rate — deterministic, re-run
    stable, zero sampling state. The rates side is a handful of rows →
    broadcast hash join; the scan stays one pass."""
    rates = temperature_rates(df, group_col, alpha) \
        .select(group_col, "rate")
    bucket = F.pmod(F.xxhash64(F.lit(seed), F.col(key)),
                    F.lit(1_000_000)) / F.lit(1_000_000.0)
    return (df.join(F.broadcast(rates), group_col)
            .where(bucket < F.col("rate")))
