"""A/B + identity for the r14 simhash numpy bit fold.

old = pre-change dedup module snapshot (/tmp/dedup_old_r14b.py, r14
HEAD before the fold change), new = current module. Three checks:

1. signature-stage isolation (noop sink) old vs new, interleaved, at
   50k docs (sf1 cache) — the stage the fold targets;
2. full simhash_pairs identity: exceptAll both directions AND ordered
   collect equality at sf0.01 / sf0.1 / sf1;
3. full-pipeline interleaved A/B at sf1.
"""
from __future__ import annotations

import importlib.util
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from druid_spark.session import get_spark
from druid_spark.datapipe import dedup as D_new

spec = importlib.util.spec_from_file_location(
    "dedup_old", "/tmp/dedup_old_r14b.py")
D_old = importlib.util.module_from_spec(spec)
spec.loader.exec_module(D_old)

spark = get_spark("exp_simhash_fold", cpus=32)
sc = spark.sparkContext

paths = {
    "sf0.01": "/root/testdata/sf0.01/documents.parquet",
    "sf0.1": "/root/testdata/sf0.1/documents.parquet",
    "sf1": "/tmp/druid_spark_bench_cache/sf1x_sf0.1/documents",
}


def _sig_frame(mod, docs):
    """The signature stage of simhash_pairs, as each module builds it."""
    tok_sql = ("split(lower(regexp_replace(trim(`text`), "
               "'\\\\s+', ' ')), ' ')")
    d = mod._spread(docs.select(F.col("doc_id").alias("id"),
                                F.col("text")))
    if hasattr(mod, "_simhash_fold_udf"):
        return (d.selectExpr(
            "id", f"transform({tok_sql}, t -> xxhash64(t)) AS __h")
            .select("id", mod._simhash_fold_udf(64)(F.col("__h"))
                    .alias("sim")))
    return (d.selectExpr("id", mod._simhash_bitsums_sql(tok_sql) + " AS bs")
            .selectExpr("id", mod._bits_to_long_sql("bs") + " AS sim"))


def noop(df):
    df.write.format("noop").mode("overwrite").save()


# ---- 1. signature stage isolation at sf1 (50k docs), interleaved
docs1 = spark.read.parquet(paths["sf1"])
# warm both paths once
noop(_sig_frame(D_old, docs1))
noop(_sig_frame(D_new, docs1))
for rnd in range(3):
    for lbl, mod in (("old", D_old), ("new", D_new)):
        sc.setJobDescription(f"simhash sig {lbl} r{rnd}")
        t0 = time.time()
        noop(_sig_frame(mod, docs1))
        print(f"sig-stage sf1 {lbl} r{rnd}: {time.time()-t0:.3f}s",
              flush=True)
sc.setJobDescription(None)

# ---- 1b. signature values identical (the stage itself)
s_old = _sig_frame(D_old, docs1)
s_new = _sig_frame(D_new, docs1)
d1 = s_old.exceptAll(s_new).count()
d2 = s_new.exceptAll(s_old).count()
print(f"sig identity sf1: exceptAll=({d1},{d2})", flush=True)

# ---- 2. full-pipeline identity at all scales
for tag, p in paths.items():
    if not os.path.exists(p):
        print(f"{tag}: missing {p}")
        continue
    docs = spark.read.parquet(p)
    old = D_old.simhash_pairs(docs, max_hamming=3)
    new = D_new.simhash_pairs(docs, max_hamming=3)
    d1 = old.exceptAll(new).count()
    d2 = new.exceptAll(old).count()
    ro = old.collect()
    rn = new.collect()
    print(f"{tag} simhash_pairs: exceptAll=({d1},{d2}) rows={len(rn)} "
          f"ordered_equal={ro == rn}", flush=True)

# ---- 3. full-pipeline interleaved A/B at sf1
for rnd in range(3):
    for lbl, mod in (("old", D_old), ("new", D_new)):
        sc.setJobDescription(f"simhash full {lbl} r{rnd}")
        t0 = time.time()
        len(mod.simhash_pairs(docs1, max_hamming=3).collect())
        print(f"full sf1 {lbl} r{rnd}: {time.time()-t0:.3f}s", flush=True)
sc.setJobDescription(None)
