"""A/B + identity for persisting the ngram shingle frame (both
inverted-index join sides derive from it, so the tokenize+shingle
chain otherwise executes once per side — the same reason minhash and
simhash persist their signature frames).

old = /tmp/dedup_pre_ngram.py (working tree before this edit),
new = current module.
"""
from __future__ import annotations

import importlib.util
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from druid_spark.session import get_spark
from druid_spark.datapipe import dedup as D_new

spec = importlib.util.spec_from_file_location(
    "dedup_old", "/tmp/dedup_pre_ngram.py")
D_old = importlib.util.module_from_spec(spec)
spec.loader.exec_module(D_old)

spark = get_spark("exp_ngram_persist", cpus=32)
sc = spark.sparkContext

paths = {
    "sf0.01": "/root/testdata/sf0.01/documents.parquet",
    "sf0.1": "/root/testdata/sf0.1/documents.parquet",
    "sf1": "/tmp/druid_spark_bench_cache/sf1x_sf0.1/documents",
}

for tag, p in paths.items():
    if not os.path.exists(p):
        print(f"{tag}: missing {p}")
        continue
    docs = spark.read.parquet(p)
    old = D_old.ngram_jaccard_pairs(docs, threshold=0.8)
    new = D_new.ngram_jaccard_pairs(docs, threshold=0.8)
    d1 = old.exceptAll(new).count()
    d2 = new.exceptAll(old).count()
    ro = old.collect()
    rn = new.collect()
    print(f"{tag} ngram_jaccard_pairs: exceptAll=({d1},{d2}) "
          f"rows={len(rn)} ordered_equal={ro == rn}", flush=True)

docs1 = spark.read.parquet(paths["sf1"])
for rnd in range(3):
    for lbl, mod in (("old", D_old), ("new", D_new)):
        sc.setJobDescription(f"ngram full {lbl} r{rnd}")
        t0 = time.time()
        len(mod.ngram_jaccard_pairs(docs1, threshold=0.8).collect())
        print(f"full sf1 {lbl} r{rnd}: {time.time()-t0:.3f}s", flush=True)
sc.setJobDescription(None)
