"""Measure candidate multiplicity in the minhash band buckets and A/B
the exact-once pair emission (emit a pair only from its first matching
band) against the current bucket+dropDuplicates form.

Exact-once idea (VERDICT r13 next-round #1): in band k's bucket, emit
(x, y) iff no earlier band j < k also bucketed them together, i.e.
x.bh[j] != y.bh[j] for all j < k. Every pair is then emitted exactly
once globally, so the dropDuplicates aggregate disappears and the
repartition("id_a") exchange carries DISTINCT pairs instead of the
multiplied candidate stream.
"""
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
spark = get_spark("exp_exact_once", cpus=32)
sc = spark.sparkContext
docs = spark.read.parquet(path)
print("docs:", docs.count())

sigs = (D._spread(docs.select(F.col("doc_id").alias("id"), F.col("text"))
                  .where(D._nonblank("text")))
        .selectExpr("id", D._tokens_sql("`text`") + " AS __toks")
        .selectExpr("id", D._shingles_sql("__toks", 3) + " AS sh")
        .selectExpr("id", "sh",
                    "transform(sh, s -> xxhash64(s)) AS __h1",
                    "transform(sh, s -> xxhash64(s, 1)) AS __h2")
        .select("id", "sh",
                D._km_fold_udf(64)(F.col("__h1"),
                                   F.col("__h2")).alias("sig"))
        .persist())
sigs.count()

BAND_SQL = (
    "transform(sequence(0, 15), b -> struct(b AS band, "
    "xxhash64(array_join(transform(slice(sig, b * 4 + 1, 4), "
    "x -> CAST(x AS STRING)), ',')) AS bh))")
banded = (sigs.select("id", F.explode(F.expr(BAND_SQL)).alias("bb"))
          .select("id", "bb.band", "bb.bh"))

# ---- multiplicity of the current form
buckets = (banded.groupBy("band", "bh")
           .agg(F.collect_list("id").alias("ids"))
           .where(F.size("ids") >= 2))
raw = buckets.select(F.explode(F.expr(
    "flatten(transform(ids, (x, i) -> "
    "transform(slice(ids, i + 2, size(ids) - i - 1), "
    "y -> struct(least(x, y) as id_a, greatest(x, y) as id_b))))")).alias("p"))
n_raw = raw.count()
n_distinct = raw.select("p.id_a", "p.id_b").distinct().count()
print(f"raw emitted pairs: {n_raw}, distinct: {n_distinct}, "
      f"multiplicity: {n_raw / max(n_distinct, 1):.2f}")

# ---- exact-once form: banded rows carry the PREFIX of band hashes
# (bands 0..k-1) so band k's bucket can test "no earlier match" locally
BANDED_X_SQL = (
    "transform(sequence(0, 15), b -> struct(b AS band, bhs[b] AS bh, "
    "slice(bhs, 1, b) AS pre))")
banded_x = (sigs.selectExpr(
    "id",
    "transform(sequence(0, 15), b -> xxhash64(array_join(transform("
    "slice(sig, b * 4 + 1, 4), x -> CAST(x AS STRING)), ','))) AS bhs")
    .selectExpr("id", f"explode({BANDED_X_SQL}) AS bb")
    .select("id", "bb.band", "bb.bh", "bb.pre"))
buckets_x = (banded_x.groupBy("band", "bh")
             .agg(F.collect_list(F.struct("id", "pre")).alias("xs"))
             .where(F.size("xs") >= 2))
pairs_x = buckets_x.select(F.explode(F.expr(
    "flatten(transform(xs, (x, i) -> "
    "transform(filter(slice(xs, i + 2, size(xs) - i - 1), "
    "y -> NOT exists(zip_with(x.pre, y.pre, (a, b) -> a = b), m -> m)), "
    "y -> struct(least(x.id, y.id) as id_a, greatest(x.id, y.id) as id_b))))"
    )).alias("p")).select("p.id_a", "p.id_b")
n_x = pairs_x.count()
print(f"exact-once emitted pairs: {n_x} (should equal distinct)")


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


cur = D._bucket_pairs(banded)
new = pairs_x.repartition("id_a")
# interleaved A/B
for _ in range(2):
    t("A: current bucket+dropDuplicates", lambda: noop(cur))
    t("B: exact-once prefix filter", lambda: noop(new))

# identity
diff = (cur.exceptAll(new).count(), new.exceptAll(cur).count())
print("exceptAll diffs:", diff)
