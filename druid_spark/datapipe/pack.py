"""Token-budgeted shard packing — assign documents to contiguous
shards of ~budget tokens each, the step that turns a cleaned corpus
into training-ready shards.

Semantics: in `order_col` order, shard_id = floor(exclusive prefix sum
of tokens / budget) — deterministic, exactly SQL-expressible (window
cumsum oracle), and each shard holds ≥ budget tokens only by at most
one straddling document, like size-targeted shard writers.

Scale design (the part that matters at 100 TB): a naive
`SUM() OVER (ORDER BY ...)` global window moves ALL rows into ONE
partition — the classic WindowExec death at scale. This implements the
distributed prefix sum instead:

1. range-repartition on `order_col` (Spark's RangePartitioner — the
   same machinery a global sort uses, data stays spread),
2. pass A: per-partition token totals — an aggregation of
   N_partitions rows; their running offsets are a driver-side cumsum
   of that TINY list (the only driver step, O(partitions) not O(rows)),
3. pass B: per-partition local cumsum (window PARTITIONED by the
   range-partition id — balanced by construction, never one global
   partition) + broadcast-join of the offsets.

Both passes recompute the same deterministic range exchange; no
persist of the full data is required.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def pack_shards(df: DataFrame, token_col: str, budget: int,
                order_col: str = "doc_id",
                num_partitions: int | None = None) -> DataFrame:
    """df + shard_id column per the module contract. `order_col` must
    be unique (it defines the deterministic packing order)."""
    if budget <= 0:
        raise ValueError("budget must be positive")
    n = num_partitions or df.sparkSession.conf.get(
        "spark.sql.shuffle.partitions", "32")
    ranged = (df.repartitionByRange(int(n), F.col(order_col))
                .withColumn("__pid", F.spark_partition_id()))
    # pass A: tiny per-partition totals -> driver cumsum -> offsets
    totals = (ranged.groupBy("__pid")
              .agg(F.sum(F.col(token_col).cast("long")).alias("t"))
              .collect())
    offsets, acc = {}, 0
    for row in sorted(totals, key=lambda r: r["__pid"]):
        offsets[row["__pid"]] = acc
        acc += row["t"] or 0
    off_df = F.broadcast(df.sparkSession.createDataFrame(
        [(p, o) for p, o in offsets.items()] or [(0, 0)],
        "__pid INT, __off LONG"))
    # pass B: per-partition (balanced) local cumsum + offset join
    from pyspark.sql import Window
    w = (Window.partitionBy("__pid").orderBy(order_col)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    local = F.sum(F.col(token_col).cast("long")).over(w)
    return (ranged.join(off_df, "__pid")
            .withColumn(
                "shard_id",
                F.floor((local + F.col("__off")
                         - F.col(token_col).cast("long"))
                        / F.lit(int(budget))).cast("long"))
            .drop("__pid", "__off"))


def shard_summary(packed: DataFrame, token_col: str) -> DataFrame:
    """Per-shard doc counts and token totals (the packing QA view)."""
    return (packed.groupBy("shard_id")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum(F.col(token_col).cast("long")).alias("n_tokens"))
            .orderBy("shard_id"))
