"""A/B the _ordered_pairs tail for minhash at sf1 docs:
A = repartition(1).sortWithinPartitions (r13 form)
B = localCheckpoint(eager=False).orderBy (scale-safe form)
Also print the analyzed-plan sizeInBytes estimate the guard would see.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from druid_spark.session import get_spark
from druid_spark.datapipe import dedup as D

spark = get_spark("exp_sort_tail", cpus=32)

docs = spark.read.parquet("/tmp/druid_spark_bench_cache/sf1x_sf0.1/documents")
docs01 = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")

orig = D._ordered_pairs


def tail_a(df, *cols):
    return df.repartition(1).sortWithinPartitions(*cols)


def tail_b(df, *cols):
    return df.localCheckpoint(eager=False).orderBy(*cols)


est_seen = []


def tail_probe(df, *cols):
    est = int(str(df._jdf.queryExecution().analyzed().stats().sizeInBytes()))
    est_seen.append(est)
    return tail_a(df, *cols)


# what does the analyzed-stats estimate actually say?
D._ordered_pairs = tail_probe
D.minhash_lsh_pairs(docs01, threshold=0.8).collect()
print("analyzed sizeInBytes estimate sf0.1:", est_seen, flush=True)

# interleaved A/B at sf1
for rnd in range(3):
    for lbl, tail in (("A_repart1", tail_a), ("B_ckpt_orderby", tail_b)):
        D._ordered_pairs = tail
        t0 = time.time()
        n = len(D.minhash_lsh_pairs(docs, threshold=0.8).collect())
        print(f"sf1 {lbl} r{rnd}: {time.time()-t0:.3f}s rows={n}", flush=True)

# identity: same collected order?
D._ordered_pairs = tail_a
ra = D.minhash_lsh_pairs(docs, threshold=0.8).collect()
D._ordered_pairs = tail_b
rb = D.minhash_lsh_pairs(docs, threshold=0.8).collect()
print("ordered_equal:", ra == rb, flush=True)
D._ordered_pairs = orig
