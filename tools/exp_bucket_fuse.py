"""Interleaved A/B: current _bucket_pairs (dropDuplicates on
(id_a,id_b) = its own exchange, then the verify join shuffles cand
again by id_a) vs a fused shape (repartition("id_a") BEFORE the dedup
aggregate: hash(id_a) satisfies ClusteredDistribution(id_a,id_b) for
the dedup AND ClusteredDistribution(id_a) for the verify join — one
exchange of the pair list instead of two).

Usage: python tools/exp_bucket_fuse.py [docs_parquet] [reps]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F
from druid_spark.session import get_spark
from druid_spark.datapipe import dedup as D

path = sys.argv[1] if len(sys.argv) > 1 else \
    "/tmp/druid_spark_bench_cache/sf1x_sf0.1/documents"
reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
spark = get_spark("exp_bucket_fuse", cpus=32)
sc = spark.sparkContext
docs = spark.read.parquet(path)
print("docs:", docs.count())


def build_sigs():
    return (D._spread(docs.select(F.col("doc_id").alias("id"), F.col("text"))
                      .where(D._nonblank("text")))
            .selectExpr("id", D._tokens_sql("`text`") + " AS __toks")
            .selectExpr("id", D._shingles_sql("__toks", 3) + " AS sh")
            .selectExpr("id", "sh",
                        "transform(sh, s -> xxhash64(s)) AS __h1",
                        "transform(sh, s -> xxhash64(s, 1)) AS __h2")
            .select("id", "sh",
                    D._km_fold_udf(64)(F.col("__h1"),
                                       F.col("__h2")).alias("sig"))
            .persist())


BAND_SQL = (
    "transform(sequence(0, 15), b -> struct(b AS band, "
    "xxhash64(array_join(transform(slice(sig, b * 4 + 1, 4), "
    "x -> CAST(x AS STRING)), ',')) AS bh))")


def pipeline(sigs, fuse: bool):
    banded = (sigs.select("id", F.explode(F.expr(BAND_SQL)).alias("bb"))
              .select("id", "bb.band", "bb.bh"))
    buckets = (banded.groupBy("band", "bh")
               .agg(F.collect_list("id").alias("ids"))
               .where(F.size("ids") >= 2))
    p = F.explode(F.expr(
        "flatten(transform(ids, (x, i) -> "
        "transform(slice(ids, i + 2, size(ids) - i - 1), "
        "y -> struct(least(x, y) as id_a, greatest(x, y) as id_b))))"))
    raw = buckets.select(p.alias("p")).select("p.id_a", "p.id_b")
    if fuse:
        cand = raw.repartition("id_a").dropDuplicates(["id_a", "id_b"])
    else:
        cand = raw.dropDuplicates(["id_a", "id_b"])
    sh_a = sigs.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a"))
    sh_b = sigs.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b"))
    cand = cand.hint("shuffle_hash")
    verified = cand.join(sh_a, "id_a").join(sh_b, "id_b")
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    jac = inter / union
    return D._ordered_pairs(
        verified.select("id_a", "id_b", F.round(jac, 4).alias("jaccard"))
        .where(F.col("jaccard") >= 0.8), "id_a", "id_b")


def noop(df):
    df.write.format("noop").mode("overwrite").save()


sigs = build_sigs()
sigs.count()

# identity first
a = pipeline(sigs, False)
b = pipeline(sigs, True)
d1 = a.exceptAll(b).count()
d2 = b.exceptAll(a).count()
print("exceptAll diffs:", d1, d2)
assert d1 == 0 and d2 == 0

# interleaved timing of the candidate+verify (post-signature) section
res = {"cur": [], "fuse": []}
for fuse in (False, True):  # warm both
    noop(pipeline(sigs, fuse))
for r in range(reps):
    for name, fuse in (("cur", False), ("fuse", True)):
        sc.setJobDescription(f"{name} rep{r}")
        t0 = time.time()
        noop(pipeline(sigs, fuse))
        res[name].append(time.time() - t0)
sc.setJobDescription(None)
for name, xs in res.items():
    xs.sort()
    print(f"{name}: best {xs[0]:.3f}  med {xs[len(xs)//2]:.3f}  all",
          [round(x, 3) for x in xs])
