"""Stage-by-stage timing of the minhash dedup pipeline (guide §1: noop
sink, labeled jobs). Usage: python tools/profile_minhash.py [docs_parquet]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F
from druid_spark.session import get_spark
from druid_spark.datapipe.dedup import (word_shingles, minhash_signature,
                                        minhash_lsh_pairs, _spread)

path = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1/documents.parquet"
spark = get_spark("profile_minhash", cpus=32)
sc = spark.sparkContext
docs = spark.read.parquet(path)
print("docs:", docs.count(), "partitions:", docs.rdd.getNumPartitions())


def t(label, fn, n=3):
    sc.setJobDescription(label)
    fn()  # warm
    best = float("inf")
    for _ in range(n):
        t0 = time.time()
        fn()
        best = min(best, time.time() - t0)
    print(f"{label:42s} {best:8.3f}s")
    sc.setJobDescription(None)
    return best


def noop(df):
    df.write.format("noop").mode("overwrite").save()


# S1: shingle+signature compute, current shape (filter below spread)
def s1():
    sigs = (_spread(docs.select(F.col("doc_id").alias("id"), F.col("text")))
            .select("id", word_shingles(F.col("text"), 3).alias("sh"))
            .where(F.size("sh") > 0)
            .select("id", "sh", minhash_signature(F.col("sh"), 64).alias("sig")))
    noop(sigs)

# S1b: cheap pre-filter instead (trim(text) != '')
def s1b():
    sigs = (_spread(docs.select(F.col("doc_id").alias("id"), F.col("text"))
                    .where(F.col("text").isNotNull() & (F.trim("text") != "")))
            .select("id", word_shingles(F.col("text"), 3).alias("sh"))
            .select("id", "sh", minhash_signature(F.col("sh"), 64).alias("sig")))
    noop(sigs)

t("S1 shingles+sig (current, dup filter)", s1)
t("S1b shingles+sig (cheap prefilter)", s1b)

# build the cache once, as the operator does
sigs = (_spread(docs.select(F.col("doc_id").alias("id"), F.col("text")))
        .select("id", word_shingles(F.col("text"), 3).alias("sh"))
        .where(F.size("sh") > 0)
        .select("id", "sh", minhash_signature(F.col("sh"), 64).alias("sig"))
        .persist())
sigs.count()

bands, rows_per_band = 16, 4
band_idx = F.sequence(F.lit(0), F.lit(bands - 1))
banded = sigs.select(
    "id",
    F.explode(F.transform(band_idx, lambda b: F.struct(
        b.alias("band"),
        F.xxhash64(F.array_join(
            F.transform(F.slice(F.col("sig"), b * rows_per_band + 1,
                                F.lit(rows_per_band)),
                        lambda x: x.cast("string")), ",")).alias("bh"),
    ))).alias("bb"),
).select("id", "bb.band", "bb.bh")

t("S2 banded explode (one side)", lambda: noop(banded))

a = banded.select(F.col("id").alias("id_a"), "band", "bh")
b = banded.select(F.col("id").alias("id_b"), "band", "bh")
cand = (a.join(b, ["band", "bh"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"]))
t("S3 band self-join + dedup", lambda: noop(cand))
print("candidates:", cand.count())

sh_a = sigs.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a"))
sh_b = sigs.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b"))
verified = cand.join(sh_a, "id_a").join(sh_b, "id_b")
inter = F.size(F.array_intersect("sh_a", "sh_b"))
union = F.size("sh_a") + F.size("sh_b") - inter
jac = inter / union
out = (verified.select("id_a", "id_b", F.round(jac, 4).alias("jaccard"))
       .where(F.col("jaccard") >= 0.8))
t("S4 full sans sort (noop)", lambda: noop(out))
t("S5 full with sort (noop)", lambda: noop(out.orderBy("id_a", "id_b")))
n_out = out.count()
print("verified pairs:", n_out)
t("S6 full + collect", lambda: out.orderBy("id_a", "id_b").collect())

# the bench-identical call (cache already hot from above? different plan -> no)
t("FULL minhash_lsh_pairs collect", lambda: minhash_lsh_pairs(docs, threshold=0.8).collect())
