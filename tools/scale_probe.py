"""Scale probe: time representative operators at 1x (sf0.1 lineitem,
~600k rows) and 20x (~12M rows, same data unioned+rewritten) and report
rows/s/core at each size. The point is the SHAPE: per-core throughput
should rise with size (fixed job overhead amortizes away) and the ratio
of runtimes should stay well under the 20x data ratio — evidence the
plans (partial aggs, broadcast joins, pushdown) hold as data grows.

Usage: PYTHONPATH=/root/repo python tools/scale_probe.py
Writes SCALE.md at the repo root.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from druid_spark import DruidSparkEngine  # noqa: E402
from druid_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
CACHE = "/tmp/druid_spark_bench_cache/li20.parquet"


def build_cache(spark, li):
    if not os.path.exists(CACHE):
        import functools
        functools.reduce(lambda a, b: a.union(b), [li] * 20) \
            .repartition(CPUS).write.mode("overwrite").parquet(CACHE)
    return spark.read.parquet(CACHE)


def best_of(fn, n=3):
    best = float("inf")
    for _ in range(n):
        t0 = time.time()
        fn()
        best = min(best, time.time() - t0)
    return best


SOAK = "/tmp/druid_spark_bench_cache/soak"


def build_soak_facts(spark, eng, mult: int):
    """lineitem+orders at `mult`x the base SF with REMAPPED order keys
    (replica i offsets its keys), so join fan-out matches a true
    larger scale factor instead of multiplying matches mult x mult."""
    out = f"{SOAK}/facts{mult}"
    if not os.path.exists(out):
        li = eng.catalog.table("lineitem")
        orders = eng.catalog.table("orders")
        kmax = orders.agg(F.max("o_orderkey")).first()[0] + 1
        rep = F.explode(F.sequence(F.lit(0), F.lit(mult - 1))).alias("rep")
        (li.select("*", rep)
           .withColumn("l_orderkey",
                       F.col("l_orderkey") + F.col("rep") * kmax)
           .drop("rep").repartition(CPUS)
           .write.mode("overwrite").parquet(out + "/lineitem"))
        (orders.select("*", rep)
           .withColumn("o_orderkey",
                       F.col("o_orderkey") + F.col("rep") * kmax)
           .drop("rep").repartition(CPUS)
           .write.mode("overwrite").parquet(out + "/orders"))
    return (spark.read.parquet(out + "/lineitem"),
            spark.read.parquet(out + "/orders"))


def synth_docs(spark, n: int):
    """Deterministic hash-derived corpus with CONSTANT near-dup
    density (one near-dup pair per 20 docs at every scale) — honest
    scale decades for dedup, unlike replication, whose duplicate
    clusters (and candidate-pair counts) grow quadratically with the
    replication factor.  All JVM-side expression generation."""
    out = f"{SOAK}/docs{n}"
    if not os.path.exists(out):
        (spark.range(n)
         .selectExpr("id AS doc_id",
                     "CASE WHEN id % 20 = 19 THEN id - 19 ELSE id END"
                     " AS src")
         .selectExpr(
             "doc_id",
             "concat(array_join(transform(sequence(1, 50 + src % 100),"
             " j -> concat('w', pmod(xxhash64(src, j), 10000))), ' '),"
             " CASE WHEN doc_id % 20 = 19 THEN ' xdup' ELSE '' END)"
             " AS text")
         .repartition(CPUS).write.mode("overwrite").parquet(out))
    return spark.read.parquet(out)


def fit_slope(points):
    """Least-squares slope of log(t) vs log(rows)."""
    import math
    xs = [math.log(r) for r, _t in points]
    ys = [math.log(t) for _r, t in points]
    mx, my = sum(xs) / len(xs), sum(ys) / len(ys)
    num = sum((x - mx) * (y - my) for x, y in zip(xs, ys))
    den = sum((x - mx) ** 2 for x in xs)
    return num / den


def main():
    spark = get_spark()
    eng = DruidSparkEngine(spark, data_dir=SF_DIR, exact_approx=False)
    li1 = eng.catalog.table("lineitem")
    li20 = build_cache(spark, li1)
    part = F.broadcast(eng.catalog.table("part"))

    ops = {
        "count_star": lambda df: df.agg(F.count(F.lit(1))).collect(),
        "filtered_sum": lambda df: df.where(F.col("l_discount") > 0.05)
            .agg(F.sum("l_extendedprice")).collect(),
        "groupby_2dim": lambda df: df.groupBy("l_returnflag", "l_linestatus")
            .agg(F.sum("l_quantity"), F.avg("l_extendedprice"),
                 F.count(F.lit(1))).collect(),
        "topn": lambda df: df.groupBy("l_suppkey")
            .agg(F.sum("l_extendedprice").alias("rev"))
            .orderBy(F.col("rev").desc()).limit(10).collect(),
        "broadcast_join": lambda df: df.join(
            part, df.l_partkey == part.p_partkey)
            .groupBy("p_brand").agg(F.sum("l_quantity")).collect(),
        "window_topk_per_key": lambda df: df.selectExpr(
            "l_returnflag", "l_extendedprice",
            "row_number() OVER (PARTITION BY l_returnflag "
            "ORDER BY l_extendedprice DESC) AS rn")
            .where("rn <= 5").collect(),
    }

    n1, n20 = li1.count(), li20.count()
    lines = [
        "# SCALE — measured scaling evidence (local[%d])" % CPUS,
        "",
        "Same operators timed at 1x (%s rows) and 20x (%s rows)." % (
            f"{n1:,}", f"{n20:,}"),
        "`time ratio` is t(20x)/t(1x): 20.0 would mean zero fixed",
        "overhead and zero amortization; small ratios mean job overhead",
        "dominates at 1x and the distributed plan absorbs the 20x data.",
        "Per-core rates rise with size because Spark's fixed per-job",
        "cost (~0.1 s) amortizes — the 100 TB regime looks like the",
        "right-hand column, not the left.",
        "",
        "| operator | t(1x) s | t(20x) s | time ratio | rows/s/core 1x "
        "| rows/s/core 20x |",
        "|---|---|---|---|---|---|",
    ]
    for name, fn in ops.items():
        t1 = best_of(lambda: fn(li1))
        t20 = best_of(lambda: fn(li20))
        lines.append(
            "| %s | %.3f | %.3f | %.1fx | %s | %s |" % (
                name, t1, t20, t20 / t1,
                f"{round(n1 / t1 / CPUS):,}", f"{round(n20 / t20 / CPUS):,}"))
        print(lines[-1], flush=True)

    # ---------------- three-decade soak (r13): base -> 10x -> 100x
    # (sf10-equivalent, 60M-row lineitem) for the shuffle shapes.
    # Slopes are least-squares log(t)/log(rows) over the three
    # measured decades; <= ~1.0 means no superlinear blowup and no
    # spill cliff across 100x data growth.
    lines += [
        "",
        "## Three-decade soak (base → 10x → 100x, sf10-equivalent)",
        "",
        "Facts replicated with remapped join keys (fan-out matches a",
        "true larger SF); documents are hash-synthesized with constant",
        "near-dup density (replication would grow dup clusters",
        "quadratically and fake a blowup). Warm run first, then",
        "best-of-2 (best-of-1 at 100x). `slope` = least-squares",
        "log t / log rows over the three points: 1.0 = linear,",
        "< 1.0 = overhead still amortizing, > 1.0 = superlinear",
        "(spill cliff or plan degradation).",
        "",
        "| operator | rows @pts | t(base) s | t(10x) s | t(100x) s "
        "| slope |",
        "|---|---|---|---|---|---|",
    ]
    li10, ord10 = build_soak_facts(spark, eng, 10)
    li100, ord100 = build_soak_facts(spark, eng, 100)
    ord1 = eng.catalog.table("orders")
    docs = {n: synth_docs(spark, n) for n in (5_000, 50_000, 500_000)}

    def timed(fn, rows):
        fn()                                      # warm
        return best_of(fn, n=2 if rows < 20_000_000 else 1)

    def mh(df):
        from druid_spark.datapipe.dedup import minhash_lsh_pairs
        return lambda: minhash_lsh_pairs(df, threshold=0.8).count()

    soak_ops = {
        "groupby_2dim": [
            (li1, lambda df=li1: ops["groupby_2dim"](df)),
            (li10, lambda df=li10: ops["groupby_2dim"](df)),
            (li100, lambda df=li100: ops["groupby_2dim"](df))],
        "shuffle_join": [
            (li1, lambda: li1.join(
                ord1, li1.l_orderkey == ord1.o_orderkey)
                .groupBy("o_orderpriority")
                .agg(F.sum("l_extendedprice")).collect()),
            (li10, lambda: li10.join(
                ord10, li10.l_orderkey == ord10.o_orderkey)
                .groupBy("o_orderpriority")
                .agg(F.sum("l_extendedprice")).collect()),
            (li100, lambda: li100.join(
                ord100, li100.l_orderkey == ord100.o_orderkey)
                .groupBy("o_orderpriority")
                .agg(F.sum("l_extendedprice")).collect())],
        "window_topk_per_key": [
            (li1, lambda df=li1: ops["window_topk_per_key"](df)),
            (li10, lambda df=li10: ops["window_topk_per_key"](df)),
            (li100, lambda df=li100: ops["window_topk_per_key"](df))],
        "dedup_minhash": [
            (docs[5_000], mh(docs[5_000])),
            (docs[50_000], mh(docs[50_000])),
            (docs[500_000], mh(docs[500_000]))],
    }
    for name, cells in soak_ops.items():
        pts = []
        for df, fn in cells:
            nrows = df.count()
            pts.append((nrows, timed(fn, nrows)))
        slope = fit_slope(pts)
        lines.append(
            "| %s | %s | %.3f | %.3f | %.3f | %.3f |" % (
                name, "/".join(f"{r:,}" for r, _t in pts),
                pts[0][1], pts[1][1], pts[2][1], slope))
        print(lines[-1], flush=True)

    lines += [
        "",
        "Generated by `tools/scale_probe.py` (best of 3 per cell in",
        "the 1x/20x table; warm + best-of-2 (best-of-1 at 100x) in",
        "the soak).",
    ]
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "SCALE.md"), "w") as f:
        f.write("\n".join(lines) + "\n")
    print("wrote SCALE.md")


if __name__ == "__main__":
    main()
