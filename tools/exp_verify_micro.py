"""Micro-profile the minhash verify stage: attach joins vs the
array_intersect jaccard computation, plus an Arrow set-intersection
variant."""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from druid_spark.session import get_spark
from druid_spark.datapipe import dedup as D

path = sys.argv[1] if len(sys.argv) > 1 else \
    "/tmp/druid_spark_bench_cache/sf1x_sf0.1/documents"
spark = get_spark("exp_verify_micro", cpus=32)
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
cand = D._bucket_pairs(banded).persist()
print("candidates:", cand.count())

sh_a = sigs.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a"))
sh_b = sigs.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b"))


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


joined = cand.hint("shuffle_hash").join(sh_a, "id_a").join(sh_b, "id_b")
t("attach joins only (ids out)",
  lambda: noop(joined.select("id_a", "id_b")))
t("attach joins (arrays out)", lambda: noop(joined))
inter = F.size(F.array_intersect("sh_a", "sh_b"))
union = F.size("sh_a") + F.size("sh_b") - inter
jac = inter / union
out = (joined.select("id_a", "id_b", F.round(jac, 4).alias("jaccard"))
       .where(F.col("jaccard") >= 0.8))
t("+ jaccard filter (full verify)", lambda: noop(out))


def _inter(a_col, b_col):
    def f(a_s, b_s):
        out = [len(set(x) & set(y)) for x, y in zip(a_s, b_s)]
        return pd.Series(out, dtype="int32")
    f.__annotations__ = {"a_s": pd.Series, "b_s": pd.Series,
                         "return": pd.Series}
    return pandas_udf("int")(f)(a_col, b_col)


ucol = _inter(F.col("sh_a"), F.col("sh_b"))
out2 = (joined.select("id_a", "id_b", "sh_a", "sh_b",
                      ucol.alias("inter"))
        .select("id_a", "id_b",
                F.round(F.col("inter") /
                        (F.size("sh_a") + F.size("sh_b") - F.col("inter")),
                        4).alias("jaccard"))
        .where(F.col("jaccard") >= 0.8))
t("arrow set-intersect variant", lambda: noop(out2))
print("exceptAll:", out.exceptAll(out2).count(), out2.exceptAll(out).count())
