"""A/B: band bucketing on xxhash64(string-join of sig slice) [current]
vs bucketing on the raw 4-long slice as an array group key [candidate].

The slice key is exactly as selective as the string join (the join is
injective on long arrays with a ',' separator), so the candidate set is
IDENTICAL by construction — and it skips 64 long->string casts, 16
array_joins and 16 xxhash64 calls per document."""
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
spark = get_spark("exp_slice_band", cpus=32)
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
banded_cur = (sigs.select("id", F.explode(F.expr(BAND_SQL)).alias("bb"))
              .select("id", "bb.band", "bb.bh"))

SLICE_SQL = ("transform(sequence(0, 15), b -> "
             "struct(b AS band, slice(sig, b * 4 + 1, 4) AS bh))")
banded_new = (sigs.select("id", F.explode(F.expr(SLICE_SQL)).alias("bb"))
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


for _ in range(2):
    t("A banded cur (hash key)", lambda: noop(banded_cur))
    t("B banded new (slice key)", lambda: noop(banded_new))
for _ in range(2):
    t("A candidates cur", lambda: noop(D._bucket_pairs(banded_cur)))
    t("B candidates new", lambda: noop(D._bucket_pairs(banded_new)))

ca = D._bucket_pairs(banded_cur)
cb = D._bucket_pairs(banded_new)
print("exceptAll:", ca.exceptAll(cb).count(), cb.exceptAll(ca).count())
