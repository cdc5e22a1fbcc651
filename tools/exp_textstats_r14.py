"""Verify the r14 staged_features spread-and-restore keeps every
downstream result byte-identical (including the r13 float-sum trap
round(sum(quality), 3) by source) and measure the parallelism win on
the bench's text_profile_agg shape. Old module = r13 HEAD copy at
/tmp/textstats_old.py."""
from __future__ import annotations

import importlib.util
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from druid_spark.session import get_spark
from druid_spark.datapipe import textstats as T_new

spec = importlib.util.spec_from_file_location(
    "textstats_old", "/tmp/textstats_old.py")
T_old = importlib.util.module_from_spec(spec)
spec.loader.exec_module(T_old)

spark = get_spark("exp_textstats_r14", cpus=32)

paths = {
    "sf0.01": "/root/testdata/sf0.01/documents.parquet",
    "sf0.1": "/root/testdata/sf0.1/documents.parquet",
    "sf1": "/tmp/druid_spark_bench_cache/sf1x_sf0.1/documents",
}


def trap(mod, docs):
    return (mod.staged_features(docs)
            .groupBy("source")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.round(F.sum("quality"), 3).alias("quality_sum"),
                 F.sum("n_tokens").alias("tokens"))
            .orderBy("source").collect())


def profile_agg(mod, docs):
    return (mod.staged_features(docs)
            .groupBy("lang_pred")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.avg("quality").alias("avg_q"),
                 F.sum("n_tokens").alias("tokens"))
            .orderBy("lang_pred").collect())


for tag, p in paths.items():
    if not os.path.exists(p):
        continue
    docs = spark.read.parquet(p)
    to, tn = trap(T_old, docs), trap(T_new, docs)
    po, pn = profile_agg(T_old, docs), profile_agg(T_new, docs)
    fo = (T_old.staged_features(docs)
          .select("doc_id", "n_tokens", "punct_ratio", "stopword_ratio",
                  "quality", "lang_pred", "fingerprint").collect())
    fn = (T_new.staged_features(docs)
          .select("doc_id", "n_tokens", "punct_ratio", "stopword_ratio",
                  "quality", "lang_pred", "fingerprint").collect())
    print(f"{tag}: trap_equal={to == tn} profile_equal={po == pn} "
          f"rows_equal={fo == fn} trap_qsum={[r['quality_sum'] for r in tn]}",
          flush=True)

# interleaved timing of the bench shape at sf0.1 (the single-file case)
docs = spark.read.parquet(paths["sf0.1"])
for rnd in range(3):
    for lbl, mod in (("old", T_old), ("new", T_new)):
        t0 = time.time()
        profile_agg(mod, docs)
        print(f"profile_agg sf0.1 {lbl} r{rnd}: {time.time()-t0:.3f}s",
              flush=True)
