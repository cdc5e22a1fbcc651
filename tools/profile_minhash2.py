"""Stage timing of the CURRENT minhash pipeline shape (r13 session 3).
Usage: python tools/profile_minhash2.py [docs_parquet] [reps]
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
reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
spark = get_spark("profile_minhash2", cpus=32)
sc = spark.sparkContext
docs = spark.read.parquet(path)
print("docs:", docs.count())


def t(label, fn, n=reps):
    sc.setJobDescription(label)
    fn()  # warm
    best = float("inf")
    for _ in range(n):
        t0 = time.time()
        fn()
        best = min(best, time.time() - t0)
    print(f"{label:40s} {best:8.3f}s", flush=True)
    sc.setJobDescription(None)
    return best


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def sigs_unpersisted():
    return (D._spread(docs.select(F.col("doc_id").alias("id"), F.col("text"))
                      .where(D._nonblank("text")))
            .selectExpr("id", D._tokens_sql("`text`") + " AS __toks")
            .selectExpr("id", D._shingles_sql("__toks", 3) + " AS sh")
            .selectExpr("id", "sh",
                        "transform(sh, s -> xxhash64(s)) AS __h1",
                        "transform(sh, s -> xxhash64(s, 1)) AS __h2")
            .select("id", "sh",
                    D._km_fold_udf(64)(F.col("__h1"),
                                       F.col("__h2")).alias("sig")))


t("S1 signature build (noop, no persist)", lambda: noop(sigs_unpersisted()))

sigs = sigs_unpersisted().persist()
sigs.count()

BAND_SQL = (
    "transform(sequence(0, 15), b -> struct(b AS band, "
    "xxhash64(array_join(transform(slice(sig, b * 4 + 1, 4), "
    "x -> CAST(x AS STRING)), ',')) AS bh))")
banded = (sigs.select("id", F.explode(F.expr(BAND_SQL)).alias("bb"))
          .select("id", "bb.band", "bb.bh"))
t("S2 banded explode", lambda: noop(banded))
cand = D._bucket_pairs(banded)
t("S3 bucket pairs (fused dedup)", lambda: noop(cand))
print("candidates:", cand.count())
sh_a = sigs.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a"))
sh_b = sigs.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b"))
verified = cand.hint("shuffle_hash").join(sh_a, "id_a").join(sh_b, "id_b")
inter = F.size(F.array_intersect("sh_a", "sh_b"))
union = F.size("sh_a") + F.size("sh_b") - inter
jac = inter / union
out = (verified.select("id_a", "id_b", F.round(jac, 4).alias("jaccard"))
       .where(F.col("jaccard") >= 0.8))
t("S4 + verify join", lambda: noop(out))
print("verified pairs:", out.count())
t("S5 + ordered (repart1 sort)", lambda: noop(D._ordered_pairs(out, "id_a", "id_b")))
t("S6 + collect", lambda: len(D._ordered_pairs(out, "id_a", "id_b").collect()))
sigs.unpersist()
t("FULL minhash_lsh_pairs collect",
  lambda: len(D.minhash_lsh_pairs(docs, threshold=0.8).collect()))
