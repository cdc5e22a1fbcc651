"""Micro-profile the minhash signature stage and prototype computing
h2 = xxhash64(s, 1) from h1 inside numpy (XXH64 of the fixed 8-byte
long 1 with seed=h1 — pure int64 arithmetic, bit-exact)."""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from pyspark.sql import functions as F
from druid_spark.session import get_spark
from druid_spark.datapipe import dedup as D

path = sys.argv[1] if len(sys.argv) > 1 else \
    "/tmp/druid_spark_bench_cache/sf1x_sf0.1/documents"
spark = get_spark("exp_sig_micro", cpus=32)
sc = spark.sparkContext
docs = spark.read.parquet(path)
docs.count()

base = (D._spread(docs.select(F.col("doc_id").alias("id"), F.col("text"))
                  .where(D._nonblank("text"))))


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


toks = base.selectExpr("id", D._tokens_sql("`text`") + " AS __toks")
t("tokens only", lambda: noop(toks))
sh = toks.selectExpr("id", D._shingles_sql("__toks", 3) + " AS sh")
t("+ shingles", lambda: noop(sh))
h1 = sh.selectExpr("id", "sh", "transform(sh, s -> xxhash64(s)) AS __h1")
t("+ h1 transform", lambda: noop(h1))
h12 = h1.selectExpr("id", "sh", "__h1",
                    "transform(sh, s -> xxhash64(s, 1)) AS __h2")
t("+ h1 + h2 transforms", lambda: noop(h12))
full = h12.select("id", "sh",
                  D._km_fold_udf(64)(F.col("__h1"),
                                     F.col("__h2")).alias("sig"))
t("+ arrow fold (current full)", lambda: noop(full))

# ---- numpy XXH64(long=1, seed=h1) bit-exactness check
P1 = np.uint64(0x9E3779B185EBCA87)
P2 = np.uint64(0xC2B2AE3D27D4EB4F)
P3 = np.uint64(0x165667B19E3779F9)
P4 = np.uint64(0x85EBCA77C2B2AE63)
P5 = np.uint64(0x27D4EB2F165667C5)


def xxh64_long1(seed_i64: np.ndarray) -> np.ndarray:
    """XXH64 of the single 8-byte little-endian long value 1, with a
    per-element seed. Mirrors Spark's XxHash64Function.hashLong."""
    old = np.seterr(over="ignore")
    try:
        seed = seed_i64.astype(np.uint64)
        h = seed + P5 + np.uint64(8)
        k1 = np.uint64(1) * P2
        k1 = (k1 << np.uint64(31)) | (k1 >> np.uint64(33))
        k1 = k1 * P1
        h ^= k1
        h = ((h << np.uint64(27)) | (h >> np.uint64(37))) * P1 + P4
        h ^= h >> np.uint64(33)
        h *= P2
        h ^= h >> np.uint64(29)
        h *= P3
        h ^= h >> np.uint64(32)
        return h.astype(np.int64)
    finally:
        np.seterr(**old)


chk = (spark.range(200000)
       .selectExpr("id", "xxhash64(cast(id * 2654435761 as string)) AS h1",
                   "xxhash64(cast(id * 2654435761 as string), 1) AS h2")
       .toPandas())
got = xxh64_long1(chk["h1"].to_numpy())
ok = (got == chk["h2"].to_numpy()).all()
print("numpy XXH64(1, seed=h1) bit-exact vs Spark:", bool(ok))
if not ok:
    bad = np.nonzero(got != chk["h2"].to_numpy())[0][:5]
    for i in bad:
        print("  seed", chk["h1"][i], "exp", chk["h2"][i], "got", got[i])
