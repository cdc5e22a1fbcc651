"""Micro-profile the minhash candidate stage: bucket agg, pair explode,
repartition, dedup — where does S3's ~1.4 s go at 50k docs?"""
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
spark = get_spark("exp_cand_micro", cpus=32)
sc = spark.sparkContext
docs = spark.read.parquet(path)
docs.count()

sigs = (D._spread(docs.select(F.col("doc_id").alias("id"), F.col("text"))
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
sigs.count()

BAND_SQL = (
    "transform(sequence(0, 15), b -> struct(b AS band, "
    "xxhash64(array_join(transform(slice(sig, b * 4 + 1, 4), "
    "x -> CAST(x AS STRING)), ',')) AS bh))")
banded = (sigs.select("id", F.explode(F.expr(BAND_SQL)).alias("bb"))
          .select("id", "bb.band", "bb.bh"))


def t(label, fn, n=3):
    sc.setJobDescription(label)
    fn()
    best = float("inf")
    for _ in range(n):
        t0 = time.time()
        fn()
        best = min(best, time.time() - t0)
    print(f"{label:50s} {best:8.3f}s", flush=True)
    return best


def noop(df):
    df.write.format("noop").mode("overwrite").save()


t("banded alone", lambda: noop(banded))
buckets = (banded.groupBy("band", "bh")
           .agg(F.collect_list("id").alias("ids"))
           .where(F.size("ids") >= 2))
t("+ bucket agg", lambda: noop(buckets))
p = F.explode(F.expr(
    "flatten(transform(ids, (x, i) -> "
    "transform(slice(ids, i + 2, size(ids) - i - 1), "
    "y -> struct(least(x, y) as id_a, greatest(x, y) as id_b))))"))
raw = buckets.select(p.alias("p")).select("p.id_a", "p.id_b")
t("+ pair explode (3.2M)", lambda: noop(raw))
t("+ repartition(id_a)", lambda: noop(raw.repartition("id_a")))
t("+ dedup (full _bucket_pairs)", lambda: noop(D._bucket_pairs(banded)))
# variant: dedup WITHOUT the repartition fusion (agg straight on
# (id_a, id_b)) for reference
t("alt: dropDuplicates w/o repartition",
  lambda: noop(raw.dropDuplicates(["id_a", "id_b"])))
# variant: local pre-dedup inside the bucket row is impossible (pairs
# from different buckets), but a partial agg exists already in
# dropDuplicates; measure a groupBy count instead
t("alt: groupBy count dedup",
  lambda: noop(raw.groupBy("id_a", "id_b").agg(F.lit(1))))
