"""Reproduce the bench-context q18 slowness: run the headline-suite-ish
prior load (dedup_minhash, text profile, sim_topk, a few engine queries)
in the same JVM, then time q18 at 20x and report task-level spill/GC
via the status tracker's stage metrics."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from druid_spark import DruidSparkEngine  # noqa: E402
from druid_spark.session import get_spark  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402

spark = get_spark("exp_q18_ctx", cpus=32)
sc = spark.sparkContext
eng = DruidSparkEngine(spark, data_dir="/root/testdata/sf0.1")

q18 = entrymod._SQL_CASES["sqlc_tpch_q18"][0]


def time_q18(label, eng20):
    for i in range(3):
        t0 = time.time()
        len(eng20.sql(q18).collect())
        print(f"  {label} q18 iter {i}: {time.time()-t0:.3f}s", flush=True)


eng20 = DruidSparkEngine(spark)
tag = "sf0.1"
for t in ("lineitem", "orders", "customer"):
    eng20.catalog.register_table(
        t, spark.read.parquet(f"/tmp/druid_spark_bench_cache/tpch20_{tag}/{t}"))

print("=== q18 BEFORE prior load (fresh-ish session) ===", flush=True)
time_q18("pre", eng20)

print("=== applying prior load (headline-suite-ish) ===", flush=True)
from druid_spark.datapipe.dedup import minhash_lsh_pairs  # noqa: E402
from druid_spark.datapipe import textstats  # noqa: E402
docs = eng.catalog.table("documents")
for i in range(4):
    t0 = time.time()
    len(minhash_lsh_pairs(docs, threshold=0.8).collect())
    print(f"  dedup iter {i}: {time.time()-t0:.3f}s", flush=True)
for i in range(4):
    len(textstats.staged_features(docs)
        .groupBy("lang_pred").agg(F.count(F.lit(1)).alias("n")).collect())
emb = eng.catalog.table("embeddings")
from druid_spark.datapipe.similarity import brute_force_topk  # noqa: E402
qv = emb.where("vec_id = 0").collect()[0]["embedding"]
for i in range(4):
    len(brute_force_topk(emb, qv, k=10).collect())

import subprocess
rss = subprocess.run(["ps", "-o", "rss=", "-p", str(os.getpid())],
                     capture_output=True, text=True).stdout.strip()
print(f"python rss: {rss} kB", flush=True)

print("=== q18 AFTER prior load ===", flush=True)
time_q18("post", eng20)

# storage memory status
jsc = spark._jsc.sc()
print("cached RDD blocks:",
      jsc.getRDDStorageInfo() and [
          (r.name(), r.memSize()) for r in jsc.getRDDStorageInfo()],
      flush=True)
