"""Prove the r14 dedup changes produce byte-identical declared output:
old dedup module (git HEAD copy at /tmp/dedup_old.py) vs current, full
minhash + ngram pair output exceptAll in both directions, at several
scales. Also interleaved full-pipeline A/B timing."""
from __future__ import annotations

import importlib.util
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from druid_spark.session import get_spark
from druid_spark.datapipe import dedup as D_new

spec = importlib.util.spec_from_file_location("dedup_old", "/tmp/dedup_old.py")
D_old = importlib.util.module_from_spec(spec)
spec.loader.exec_module(D_old)

spark = get_spark("exp_identity", cpus=32)
sc = spark.sparkContext

paths = {
    "sf0.01": "/root/testdata/sf0.01/documents.parquet",
    "sf0.1": "/root/testdata/sf0.1/documents.parquet",
    "sf1": "/tmp/druid_spark_bench_cache/sf1x_sf0.1/documents",
}

emb_paths = {
    "sf0.01": "/root/testdata/sf0.01/embeddings.parquet",
    "sf0.1": "/root/testdata/sf0.1/embeddings.parquet",
    "sf1": "/tmp/druid_spark_bench_cache/sf1x_sf0.1/embeddings",
}

for tag, p in paths.items():
    if not os.path.exists(p):
        print(f"{tag}: missing {p}")
        continue
    docs = spark.read.parquet(p)
    for fname in ("minhash_lsh_pairs", "ngram_jaccard_pairs",
                  "simhash_pairs"):
        kw = {} if fname == "simhash_pairs" else {"threshold": 0.8}
        old = getattr(D_old, fname)(docs, **kw)
        new = getattr(D_new, fname)(docs, **kw)
        d1 = old.exceptAll(new).count()
        d2 = new.exceptAll(old).count()
        ro = old.collect()
        rn = new.collect()
        same_order = ro == rn
        print(f"{tag} {fname}: exceptAll=({d1},{d2}) rows={len(rn)} "
              f"ordered_equal={same_order}", flush=True)
    ep = emb_paths.get(tag)
    if ep and os.path.exists(ep):
        emb = spark.read.parquet(ep)
        old = D_old.embedding_neardup_pairs(emb, threshold=0.9)
        new = D_new.embedding_neardup_pairs(emb, threshold=0.9)
        d1 = old.exceptAll(new).count()
        d2 = new.exceptAll(old).count()
        same_order = old.collect() == new.collect()
        print(f"{tag} embedding_neardup_pairs: exceptAll=({d1},{d2}) "
              f"ordered_equal={same_order}", flush=True)

# interleaved timing at sf1
docs = spark.read.parquet(paths["sf1"])
for rnd in range(2):
    for lbl, mod in (("old", D_old), ("new", D_new)):
        t0 = time.time()
        len(mod.minhash_lsh_pairs(docs, threshold=0.8).collect())
        print(f"minhash sf1 {lbl} r{rnd}: {time.time()-t0:.3f}s", flush=True)
