"""A/B a numpy cosine scan against the HOF-fold cosine for
brute_force_topk (guide §4.2). Bit-identity requirement: the Column
form accumulates left-to-right from 0.0 with IEEE doubles; numpy can
reproduce that exactly by looping over DIMS sequentially (vectorized
over rows): acc = acc + V[:, j] * q[j] is the same mul-then-add per
row. sqrt and division are correctly rounded in both. Identity is
proven on UNROUNDED values with exceptAll before timing.

Usage: python tools/exp_np_cosine.py [emb_parquet] [reps]
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
from druid_spark.datapipe.similarity import _as_double, _cosine_lit

path = sys.argv[1] if len(sys.argv) > 1 else \
    "/tmp/druid_spark_bench_cache/sf1x_sf0.1/embeddings"
reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5

spark = get_spark("exp_np_cosine", cpus=32)
sc = spark.sparkContext
emb = spark.read.parquet(path)
print("vecs:", emb.count(), "partitions:", emb.rdd.getNumPartitions())
qv = [float(x) for x in emb.where("vec_id = 0").collect()[0]["embedding"]]


def np_cosine_udf(query_vec):
    qv = np.asarray([float(x) for x in query_vec], dtype=np.float64)
    qn = 0.0
    for x in qv:
        qn += float(x) * float(x)
    import math
    qn = math.sqrt(qn)

    def cos(vecs):
        n = len(vecs)
        if n == 0:
            return pd.Series([], dtype="float64")
        V = np.stack([np.asarray(v, dtype=np.float64) for v in vecs])
        dot = np.zeros(n, dtype=np.float64)
        nrm = np.zeros(n, dtype=np.float64)
        for j in range(V.shape[1]):
            c = V[:, j]
            dot = dot + c * qv[j]
            nrm = nrm + c * c
        return pd.Series(dot / (np.sqrt(nrm) * qn))

    cos.__annotations__ = {"vecs": pd.Series, "return": pd.Series}
    return pandas_udf("double")(cos)


sim_col = _cosine_lit(_as_double(F.col("embedding")), qv)
np_col = np_cosine_udf(qv)(F.col("embedding"))

a = emb.select("vec_id", sim_col.alias("c"))
b = emb.select("vec_id", np_col.alias("c"))
d1 = a.exceptAll(b).count()
d2 = b.exceptAll(a).count()
print(f"identity (unrounded, {a.count()} rows): {d1} / {d2}")
assert d1 == 0 and d2 == 0, "NOT bit-identical — do not ship"


def topk(col):
    return (emb.select(F.col("vec_id"), F.round(col, 4).alias("cos"))
            .orderBy(F.col("cos").desc(), F.col("vec_id").asc())
            .limit(10))


r1 = [tuple(r) for r in topk(sim_col).collect()]
r2 = [tuple(r) for r in topk(np_col).collect()]
print("topk identical:", r1 == r2)

best = {"hof": float("inf"), "np": float("inf")}
for rep in range(reps):
    for name, col in (("hof", sim_col), ("np", np_col)):
        sc.setJobDescription(f"cos_{name} rep{rep}")
        t0 = time.time()
        len(topk(col).collect())
        dt = time.time() - t0
        best[name] = min(best[name], dt)
        print(f"rep{rep} {name:4s} {dt:7.3f}s")
sc.setJobDescription(None)
print("BEST:", {k: round(v, 3) for k, v in best.items()})
