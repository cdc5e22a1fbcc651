"""Measure a numpy/Arrow minhash fold against the JVM HOF fold (guide
§4.2: hand whole batches to vectorized native code). The per-shingle
(h1, h2) xxhash64 pairs stay JVM-side (bit-exact Spark hashes); only the
64-way Kirsch-Mitzenmacher min fold moves to numpy:

  sig[i] = min over shingles of (h1 + i*h2)   with int64 wraparound

numpy int64 arithmetic wraps exactly like Java long, so the signatures
must be bit-identical — verified here with exceptAll both directions
before any timing.

Usage: python tools/exp_np_fold.py [docs_parquet] [reps]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from druid_spark.session import get_spark
from druid_spark.datapipe.dedup import (_nonblank, _spread,
                                        minhash_signature, shingles_of,
                                        word_tokens)

path = sys.argv[1] if len(sys.argv) > 1 else \
    "/tmp/druid_spark_bench_cache/sf1x_sf0.1/documents"
reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5

spark = get_spark("exp_np_fold", cpus=32)
sc = spark.sparkContext
docs = spark.read.parquet(path)
print("docs:", docs.count(), "partitions:", docs.rdd.getNumPartitions())

NUM = 64


def km_fold_udf(num_hashes: int):
    def fold(h1s: pd.Series, h2s: pd.Series) -> pd.Series:
        n = len(h1s)
        if n == 0:
            return pd.Series([], dtype=object)
        lens = np.fromiter((len(a) for a in h1s), dtype=np.int64, count=n)
        out = np.empty((n, num_hashes), dtype=np.int64)
        nz = lens > 0
        if nz.any():
            H1 = np.concatenate([np.asarray(a, dtype=np.int64)
                                 for a in h1s[nz]])
            H2 = np.concatenate([np.asarray(a, dtype=np.int64)
                                 for a in h2s[nz]])
            starts = np.zeros(int(nz.sum()), dtype=np.int64)
            np.cumsum(lens[nz][:-1], out=starts[1:])
            col = H1.copy()
            sub = np.empty((int(nz.sum()), num_hashes), dtype=np.int64)
            for i in range(num_hashes):
                sub[:, i] = np.minimum.reduceat(col, starts)
                col += H2
            out[nz] = sub
        res = pd.Series(list(out))
        if (~nz).any():
            # JVM array_min over an empty array is NULL -> 64 NULLs
            res[~nz] = pd.Series([[None] * num_hashes] * int((~nz).sum()),
                                 index=np.nonzero(~nz)[0])
        return res

    fold.__annotations__ = {"h1s": pd.Series, "h2s": pd.Series,
                            "return": pd.Series}
    return pandas_udf("array<bigint>")(fold)


def shingled():
    return (_spread(docs.select(F.col("doc_id").alias("id"), F.col("text"))
                    .where(_nonblank("text")))
            .select("id", word_tokens(F.col("text")).alias("__toks"))
            .select("id", shingles_of(F.col("__toks"), 3).alias("sh")))


def sigs_jvm():
    return shingled().select(
        "id", "sh", minhash_signature(F.col("sh"), NUM).alias("sig"))


_np_fold = km_fold_udf(NUM)


def sigs_np():
    base = shingled().select(
        "id", "sh",
        F.transform("sh", lambda s: F.xxhash64(s)).alias("__h1"),
        F.transform("sh", lambda s: F.xxhash64(s, F.lit(1))).alias("__h2"))
    return base.select(
        "id", "sh", _np_fold(F.col("__h1"), F.col("__h2")).alias("sig"))


# ---- identity proof first
a = sigs_jvm().select("id", "sig")
b = sigs_np().select("id", "sig")
d1 = a.exceptAll(b).count()
d2 = b.exceptAll(a).count()
print(f"identity: jvm\\np={d1} np\\jvm={d2}")
assert d1 == 0 and d2 == 0, "signatures differ — DO NOT SHIP"


def noop(df):
    df.write.format("noop").mode("overwrite").save()


best = {"jvm": float("inf"), "np": float("inf")}
for rep in range(reps):
    for name, fn in (("jvm", sigs_jvm), ("np", sigs_np)):
        sc.setJobDescription(f"sig_{name} rep{rep}")
        t0 = time.time()
        noop(fn())
        dt = time.time() - t0
        best[name] = min(best[name], dt)
        print(f"rep{rep} {name:4s} {dt:7.3f}s")
    sc.setJobDescription(None)
print("BEST:", {k: round(v, 3) for k, v in best.items()})
