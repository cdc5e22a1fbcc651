"""Probe the tpch_20x q18 anomaly (VERDICT r13 #6 / r14 baseline 8.2 s):
run q18 against the cached 20x tables exactly as bench.py does, capture
the formatted plan and per-iteration wall time, then break the query
into stages with the noop sink to find where the time goes."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from druid_spark import DruidSparkEngine  # noqa: E402
from druid_spark.session import get_spark  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402

spark = get_spark("exp_q18", cpus=32)
eng = DruidSparkEngine(spark)
tag = "sf0.1"
for t in ("lineitem", "orders", "customer"):
    eng.catalog.register_table(
        t, spark.read.parquet(f"/tmp/druid_spark_bench_cache/tpch20_{tag}/{t}"))

q18 = entrymod._SQL_CASES["sqlc_tpch_q18"][0]

sc = spark.sparkContext
df = eng.sql(q18)
print("=== PLAN ===")
print(df._jdf.queryExecution().explainString(
    spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"))[:8000])

for i in range(4):
    sc.setJobDescription(f"q18 iter {i}")
    t0 = time.time()
    n = len(eng.sql(q18).collect())
    print(f"iter {i}: {time.time()-t0:.3f}s rows={n}", flush=True)

# stage isolation with noop sink
li = eng.catalog.table("lineitem")
orders = eng.catalog.table("orders")
cust = eng.catalog.table("customer")

big = (li.groupBy("l_orderkey").agg(F.sum("l_quantity").alias("sq"))
       .where("sq > 150").select("l_orderkey"))
sc.setJobDescription("q18 stage: having-subquery alone")
t0 = time.time()
big.write.format("noop").mode("overwrite").save()
print(f"having subquery: {time.time()-t0:.3f}s", flush=True)

sc.setJobDescription("q18 stage: semi join")
t0 = time.time()
(li.join(big.withColumnRenamed("l_orderkey", "k"),
         li.l_orderkey == F.col("k"), "left_semi")
 .write.format("noop").mode("overwrite").save())
print(f"semi join: {time.time()-t0:.3f}s", flush=True)
