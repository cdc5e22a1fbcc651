"""A/B the final-sort tail of minhash_lsh_pairs (guide §2.4: remove
duplicated computation). Hypothesis: the trailing orderBy's range
partitioner runs a sampling job over its child, re-computing the whole
verify-join chain once for the sample pass and again for the real
exchange. Variants:

  A  current: verified.orderBy(id_a, id_b)
  B  localCheckpoint() the verified pairs, then orderBy — sampling and
     exchange both read the materialized narrow rows
  C  repartition(1).sortWithinPartitions — no range sampling at all,
     single-task final sort (pairs list is tiny relative to corpus)

All variants share the persisted signature cache (same logical plan →
CacheManager reuse), so the A/B isolates the candidate+verify+sort tail.
Timing = len(collect()), the bench methodology. Interleaved best-of-N.

Usage: python tools/exp_sort_tail.py [docs_parquet] [reps]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F
from druid_spark.session import get_spark
from druid_spark.datapipe.dedup import (_bucket_pairs, _nonblank, _spread,
                                        minhash_signature, shingles_of,
                                        word_tokens)

path = sys.argv[1] if len(sys.argv) > 1 else \
    "/tmp/druid_spark_bench_cache/sf1x_sf0.1/documents"
reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5

spark = get_spark("exp_sort_tail", cpus=32)
sc = spark.sparkContext
docs = spark.read.parquet(path)
print("docs:", docs.count(), "partitions:", docs.rdd.getNumPartitions())


def build_verified():
    """Everything of minhash_lsh_pairs up to (but excluding) the final
    orderBy — mirror of dedup.py at HEAD."""
    k, num_hashes, bands, threshold = 3, 64, 16, 0.8
    rows_per_band = num_hashes // bands
    sigs = (_spread(docs.select(F.col("doc_id").alias("id"), F.col("text"))
                    .where(_nonblank("text")))
            .select("id", word_tokens(F.col("text")).alias("__toks"))
            .select("id", shingles_of(F.col("__toks"), k).alias("sh"))
            .select("id", "sh",
                    minhash_signature(F.col("sh"), num_hashes).alias("sig"))
            .persist())
    band_idx = F.sequence(F.lit(0), F.lit(bands - 1))
    banded = sigs.select(
        "id",
        F.explode(F.transform(band_idx, lambda b: F.struct(
            b.alias("band"),
            F.xxhash64(F.array_join(
                F.transform(
                    F.slice(F.col("sig"), b * rows_per_band + 1,
                            F.lit(rows_per_band)),
                    lambda x: x.cast("string")), ",")).alias("bh"),
        ))).alias("bb"),
    ).select("id", "bb.band", "bb.bh")
    cand = _bucket_pairs(banded).hint("shuffle_hash")
    sh_a = sigs.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a"))
    sh_b = sigs.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b"))
    verified = cand.join(sh_a, "id_a").join(sh_b, "id_b")
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    jac = inter / union
    return (verified.select("id_a", "id_b",
                            F.round(jac, 4).alias("jaccard"))
            .where(F.col("jaccard") >= threshold))


def variant_a():
    return build_verified().orderBy("id_a", "id_b")


def variant_b():
    return build_verified().localCheckpoint().orderBy("id_a", "id_b")


def variant_c():
    return (build_verified().repartition(1)
            .sortWithinPartitions("id_a", "id_b"))


variants = {"A_orderBy": variant_a, "B_checkpoint": variant_b,
            "C_single_sort": variant_c}

# identity check first: same rows, same collect order
rows = {}
for name, fn in variants.items():
    rows[name] = [tuple(r) for r in fn().collect()]
base = rows["A_orderBy"]
for name, rs in rows.items():
    print(f"{name}: rows={len(rs)} identical_ordered={rs == base}")

best = {k: float("inf") for k in variants}
for rep in range(reps):
    for name, fn in variants.items():
        sc.setJobDescription(f"{name} rep{rep}")
        t0 = time.time()
        n = len(fn().collect())
        dt = time.time() - t0
        best[name] = min(best[name], dt)
        print(f"rep{rep} {name:16s} {dt:7.3f}s  (n={n})")
    sc.setJobDescription(None)
print("BEST:", {k: round(v, 3) for k, v in best.items()})
