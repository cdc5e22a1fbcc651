"""A/B regexp_count vs regexp_replace+length for the punctuation count
in staged_features (guide §1.2 per-task work: the profile scan is
regex-bound on a single input partition at sf0.1). regexp_count counts
matches without materializing the replaced string. Identity: each match
of [^\\w\\s] is exactly one char, so
  length(t) - length(regexp_replace(t, '[^\\w\\s]', ''))
  == regexp_count(t, '[^\\w\\s]')
Verified with exceptAll on the full feature frame before timing.

Usage: python tools/exp_textstats.py [docs_parquet] [reps]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F
from druid_spark.session import get_spark
from druid_spark.datapipe import textstats

path = sys.argv[1] if len(sys.argv) > 1 else \
    "/tmp/druid_spark_bench_cache/sf1x_sf0.1/documents"
reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5

spark = get_spark("exp_textstats", cpus=32)
sc = spark.sparkContext
docs = spark.read.parquet(path)
print("docs:", docs.count(), "partitions:", docs.rdd.getNumPartitions())


def staged_b(df, text_col="text"):
    """staged_features with punct count via regexp_count."""
    t = F.coalesce(F.col(text_col), F.lit(""))
    stage0 = df.withColumns({
        "__toks": F.split(F.lower(F.trim(t)), r"\s+"),
    })
    stage1 = stage0.withColumns({
        "__len": F.length(t),
        "__npunct": F.regexp_count(t, F.lit(r"[^\w\s]")),
        "n_tokens": F.when(F.length(F.trim(t)) == 0, F.lit(0)).otherwise(
            F.size(F.col("__toks"))).cast("long"),
    })

    def _hits(sw):
        return F.size(F.filter(F.col("__toks"),
                               lambda x: F.array_contains(sw, x)))

    hit_cols = {f"__hits_{lang}": _hits(F.array(*[F.lit(w) for w in words]))
                for lang, words in textstats.STOPWORDS.items()}
    stage2 = stage1.withColumns({
        **hit_cols,
        "__pr_raw": F.when(F.col("__len") == 0, F.lit(0.0)).otherwise(
            F.col("__npunct").cast("double") / F.col("__len")),
    })
    n = F.col("n_tokens")
    swr = F.when(n == 0, F.lit(0.0)).otherwise(
        F.col("__hits_en").cast("double") / n)
    len_score = F.least(n.cast("double") / 20.0, F.lit(1.0))
    punct_score = F.lit(1.0) - F.least(F.col("__pr_raw") * 4, F.lit(1.0))
    sw_score = F.least(swr * 5, F.lit(1.0))
    e, d, f_, s = (F.col(f"__hits_{x}") for x in ("en", "de", "fr", "es"))
    m = F.greatest(e, d, f_, s)
    stage3 = stage2.withColumns({
        "punct_ratio": F.round(F.col("__pr_raw"), 4),
        "stopword_ratio": F.round(swr, 4),
        "quality": F.round((len_score + punct_score + sw_score) / 3.0, 4),
        "lang_pred": (F.when(m == 0, F.lit("und"))
                      .when(e == m, F.lit("en")).when(d == m, F.lit("de"))
                      .when(f_ == m, F.lit("fr")).otherwise(F.lit("es"))),
        "fingerprint": textstats.fingerprint(t),
    })
    return stage3.drop("__toks", "__len", "__npunct", "__pr_raw",
                       *[f"__hits_{x}" for x in textstats.STOPWORDS])


# identity on the full feature frame
cur = textstats.staged_features(docs)
new = staged_b(docs)
d1 = cur.exceptAll(new).count()
d2 = new.exceptAll(cur).count()
print(f"identity: cur\\new={d1} new\\cur={d2}")
assert d1 == 0 and d2 == 0


def agg_of(feats):
    return (feats.groupBy("lang_pred")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.avg("quality").alias("avg_q"),
                 F.sum("n_tokens").alias("tokens")))


best = {"cur": float("inf"), "new": float("inf")}
for rep in range(reps):
    for name, builder in (("cur", textstats.staged_features),
                          ("new", staged_b)):
        sc.setJobDescription(f"textstats_{name} rep{rep}")
        t0 = time.time()
        agg_of(builder(docs)).collect()
        dt = time.time() - t0
        best[name] = min(best[name], dt)
        print(f"rep{rep} {name:4s} {dt:7.3f}s")
    sc.setJobDescription(None)
print("BEST:", {k: round(v, 3) for k, v in best.items()})
