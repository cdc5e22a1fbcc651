"""VERDICT r13 #7: re-test the simhash bucket (collect_list) candidate
form under the r14 fused/chunked shape, vs the shipped self-join form.
r13 measured the bucket form slower for simhash; exact-once candidate
generation did NOT land (negative result), so this re-test is due.

Interleaved A/B at sf1 docs (50k) + identity check.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from druid_spark.session import get_spark
from druid_spark.datapipe import dedup as D

spark = get_spark("exp_simhash_bucket", cpus=32)
docs = spark.read.parquet("/tmp/druid_spark_bench_cache/sf1x_sf0.1/documents")


def simhash_pairs_bucket(df, text_col="text", id_col="doc_id",
                         max_hamming=3):
    """simhash_pairs with _bucket_pairs candidates (r14 chunked form)
    instead of the a×b self-join. The sim value must ride along for
    verification, so buckets carry (id, sim) structs."""
    chunks = max_hamming + 1
    width = 64 // chunks
    tok_sql = (f"split(lower(regexp_replace(trim(`{text_col}`), "
               f"'\\\\s+', ' ')), ' ')")
    docs_ = (D._spread(df.select(F.col(id_col).alias("id"),
                                 F.col(text_col)))
             .selectExpr("id", D._simhash_bitsums_sql(tok_sql) + " AS bs")
             .selectExpr("id", D._bits_to_long_sql("bs") + " AS sim"))
    chunk_structs = ",".join(
        f"struct({c} AS chunk, shiftright(sim, {c * width}) & "
        f"{(1 << width) - 1} AS cv)" for c in range(chunks))
    banded = (docs_.selectExpr(
        "id", "sim", f"explode(array({chunk_structs})) AS bb")
        .select("id", F.col("bb.chunk").alias("band"),
                F.col("bb.cv").alias("bh"), "sim"))
    # bucket on (band, bh) with (id) only; re-attach sim via join would
    # defeat the point — carry sim in the bucket ids
    buckets = (banded.groupBy("band", "bh")
               .agg(F.collect_list(F.struct("id", "sim")).alias("ids"))
               .where(F.size("ids") >= 2))
    p = F.explode(F.expr(
        "flatten(transform(ids, (x, i) -> "
        "transform(slice(ids, i + 2, size(ids) - i - 1), "
        "y -> struct(least(x.id, y.id) AS id_a, "
        "greatest(x.id, y.id) AS id_b, "
        "CASE WHEN x.id < y.id THEN x.sim ELSE y.sim END AS sim_a, "
        "CASE WHEN x.id < y.id THEN y.sim ELSE x.sim END AS sim_b))))"))
    cand = (buckets.select(p.alias("p"))
            .select("p.id_a", "p.id_b", "p.sim_a", "p.sim_b")
            .repartition("id_a")
            .dropDuplicates(["id_a", "id_b"]))
    ham = F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b")))
    return D._ordered_pairs(
        cand.select("id_a", "id_b", ham.alias("hamming"))
        .where(F.col("hamming") <= max_hamming), "id_a", "id_b")


a = D.simhash_pairs(docs)
b = simhash_pairs_bucket(docs)
print("exceptAll:", a.exceptAll(b).count(), b.exceptAll(a).count(),
      flush=True)
print("ordered_equal:", a.collect() == b.collect(), flush=True)

for rnd in range(3):
    for lbl, fn in (("join", lambda: D.simhash_pairs(docs)),
                    ("bucket", lambda: simhash_pairs_bucket(docs))):
        t0 = time.time()
        len(fn().collect())
        print(f"simhash sf1 {lbl} r{rnd}: {time.time()-t0:.3f}s",
              flush=True)
