"""A/B shingle construction: array_join(slice(toks, i+1, k), ' ')
[current] vs concat(element_at(toks, i+1), ' ', ..., element_at(toks,
i+k)) [candidate — no per-shingle array allocation]. Also time the
array_distinct share."""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F
from druid_spark.session import get_spark
from druid_spark.datapipe import dedup as D

path = sys.argv[1] if len(sys.argv) > 1 else \
    "/tmp/druid_spark_bench_cache/sf1x_sf0.1/documents"
spark = get_spark("exp_shingle_ab", cpus=32)
sc = spark.sparkContext
docs = spark.read.parquet(path)
docs.count()

base = (D._spread(docs.select(F.col("doc_id").alias("id"), F.col("text"))
                  .where(D._nonblank("text"))))
toks = base.selectExpr("id", D._tokens_sql("`text`") + " AS __toks")


def shingles_concat_sql(toks_sql: str, k: int) -> str:
    gram = " , ' ', ".join(
        f"element_at({toks_sql}, i + {j + 1})" for j in range(k))
    gram = f"concat({gram})"
    return (
        f"CASE WHEN size({toks_sql}) >= {k} THEN array_distinct("
        f"transform(sequence(0, size({toks_sql}) - {k}), "
        f"i -> {gram})) "
        f"WHEN size({toks_sql}) > 0 THEN array(array_join({toks_sql}, ' ')) "
        f"ELSE CAST(array() AS ARRAY<STRING>) END")


cur = toks.selectExpr("id", D._shingles_sql("__toks", 3) + " AS sh")
new = toks.selectExpr("id", shingles_concat_sql("__toks", 3) + " AS sh")
nod = toks.selectExpr(
    "id",
    "CASE WHEN size(__toks) >= 3 THEN "
    "transform(sequence(0, size(__toks) - 3), "
    "i -> concat(element_at(__toks, i+1), ' ', element_at(__toks, i+2), "
    "' ', element_at(__toks, i+3))) "
    "WHEN size(__toks) > 0 THEN array(array_join(__toks, ' ')) "
    "ELSE CAST(array() AS ARRAY<STRING>) END AS sh")


def t(label, fn, n=3):
    sc.setJobDescription(label)
    fn()
    best = float("inf")
    for _ in range(n):
        t0 = time.time()
        fn()
        best = min(best, time.time() - t0)
    print(f"{label:50s} {best:8.3f}s", flush=True)
    return best


def noop(df):
    df.write.format("noop").mode("overwrite").save()


for _ in range(2):
    t("A shingles current (join+slice)", lambda: noop(cur))
    t("B shingles concat", lambda: noop(new))
t("C concat w/o distinct (info only)", lambda: noop(nod))
print("exceptAll:", cur.exceptAll(new).count(), new.exceptAll(cur).count())

# note: greatest(size-k, 0) in the current form is redundant under the
# size>=k CASE guard; candidate drops it — confirm the guard covers it
print("rows with size<k that hit gram branch (must be 0):",
      toks.where("size(__toks) >= 3 AND size(__toks) - 3 < 0").count())
