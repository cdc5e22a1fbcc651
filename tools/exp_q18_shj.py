"""A/B AQE's sort-merge -> shuffled-hash join rewrite on TPC-H q18 at
20x (guide §3.1: SHJ skips the sort when every post-shuffle partition
fits; spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold default 0
= off). The rewrite is runtime-sized, so it is scale-safe by
construction: AQE only applies it when the per-partition build side is
below the threshold — at 100 TB the partitions exceed it and the plan
stays SMJ. Interleaved best-of-N, conf flipped per rep.

Usage: python tools/exp_q18_shj.py [reps]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from druid_spark import DruidSparkEngine
from druid_spark.session import get_spark

reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5

spark = get_spark("exp_q18", cpus=32)
sc = spark.sparkContext
eng = DruidSparkEngine(spark)
cache = "/tmp/druid_spark_bench_cache/tpch20_sf0.1"
for t in ("lineitem", "orders", "customer"):
    eng.catalog.register_table(t, spark.read.parquet(f"{cache}/{t}"))

import __spark_entry__ as entrymod
q18 = entrymod._SQL_CASES["sqlc_tpch_q18"][0]
q3 = entrymod.oracle_sql()["tpch_q3"]

CONF = "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold"

# identity check: same rows under both settings
spark.conf.set(CONF, "0")
base = [tuple(r) for r in eng.sql(q18).collect()]
spark.conf.set(CONF, "134217728")
alt = [tuple(r) for r in eng.sql(q18).collect()]
print(f"identity q18: rows={len(base)} identical_ordered={base == alt}")
spark.conf.set(CONF, "0")

best = {}
for qname, sql in (("q18", q18), ("q3", q3)):
    for setting in ("0", "134217728"):
        best[(qname, setting)] = float("inf")
for rep in range(reps):
    for qname, sql in (("q18", q18), ("q3", q3)):
        for setting in ("0", "134217728"):
            spark.conf.set(CONF, setting)
            sc.setJobDescription(f"{qname} thresh={setting} rep{rep}")
            t0 = time.time()
            len(eng.sql(sql).collect())
            dt = time.time() - t0
            best[(qname, setting)] = min(best[(qname, setting)], dt)
            print(f"rep{rep} {qname} thresh={setting:>9s} {dt:7.3f}s")
spark.conf.set(CONF, "0")
sc.setJobDescription(None)
print("BEST:", {f"{q}@{s}": round(v, 3) for (q, s), v in best.items()})
