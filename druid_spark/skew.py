"""Skew-handling helpers for hot join keys.

AQE's skew-join split (on by default in `session.RUNTIME_CONFS`)
handles moderate skew by splitting oversized shuffle partitions. For
EXTREME skew — one key holding a double-digit percentage of a 100 TB
fact table — pre-salting is the reliable fix: the hot side's rows
spread across `n_salts` sub-keys (deterministically, from a row hash,
so retries are stable), and the small side replicates once per salt.
Shuffle partitions then bound at |key|/n_salts rows.

Reference context: Druid sidesteps this class of problem by
broadcasting all right sides (joinables are broadcast tables —
processing/.../query/JoinDataSource.java); at Spark fact-to-fact
scale, salting is the equivalent lever.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join_pairs(left: DataFrame, right: DataFrame,
                      pairs: list[tuple[str, str]], n_salts: int = 16,
                      how: str = "inner") -> DataFrame:
    """Equi-join on (left_col, right_col) key pairs whose names differ
    (the join-datasource compiler's shape after rightPrefix renames):
    the left side is salted from a row hash, the right side replicated
    once per salt, and the join condition carries the original
    equalities plus the salt equality — both sides keep their own
    columns. Used by the engine's context.skewHint arm."""
    if how not in ("inner", "left"):
        raise NotImplementedError("salted joins support inner/left")
    q = lambda df, c: df["`" + c + "`"] if "." in c else df[c]
    l = left.withColumn(
        "__salt_l",
        F.pmod(F.xxhash64(*[q(left, c) for c in left.columns]),
               F.lit(n_salts)))
    r = right.withColumn(
        "__salt_r",
        F.explode(F.sequence(F.lit(0).cast("long"),
                             F.lit(n_salts - 1).cast("long"))))
    cond = l["__salt_l"] == r["__salt_r"]
    for a, b in pairs:
        cond = cond & (q(l, a) == q(r, b))
    return l.join(r, cond, how).drop("__salt_l", "__salt_r")


def salted_join(left: DataFrame, right: DataFrame, on: list[str],
                n_salts: int = 16, how: str = "inner") -> DataFrame:
    """Equi-join with the left (large/skewed) side salted and the
    right side replicated `n_salts` times. Semantics identical to
    `left.join(right, on, how)` for inner/left joins; result columns
    follow Spark's usual join-on-names layout."""
    if how not in ("inner", "left"):
        raise NotImplementedError("salted_join supports inner/left")
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]),
                  F.lit(n_salts)).alias("__salt")
    l = left.withColumn("__salt", salt)
    r = right.withColumn(
        "__salt",
        F.explode(F.sequence(F.lit(0).cast("long"),
                             F.lit(n_salts - 1).cast("long"))))
    return l.join(r, [*on, "__salt"], how).drop("__salt")
