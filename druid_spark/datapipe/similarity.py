"""Similarity search over an embedding column (array<float>).

- brute_force_topk: exact cosine top-k — Catalyst plans the scoring as
  a single scan + TakeOrderedAndProject (per-partition heap + merge),
  so even the "brute force" baseline is shuffle-light and scales
  linearly with executors.
- lsh_topk: random-hyperplane LSH — probe only vectors whose sign
  signature is within `probe_hamming` of the query's, cutting the
  scored fraction; hyperplanes are pseudo-random but fully
  deterministic (components derived from xxhash64(dim, plane)), so no
  driver-side randomness and the same plan runs identically on any
  cluster.
- ivf_topk: IVF-style two-stage search with KMeans coarse centroids
  (pyspark.ml): score only vectors in the nprobe nearest cells.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from druid_spark.datapipe.dedup import cosine  # noqa: F401 (re-export)


def _as_double(c: Column) -> Column:
    return c.cast("array<double>")


def _lit_double_array(values) -> Column:
    """Literal double array as ONE parsed SQL expression. The previous
    F.array(*[F.lit(x) ...]) form paid one py4j round trip per element
    — ~0.25 s of pure driver-side build time per query for a 64-dim
    vector (measured; it dominated sim_topk's fixed cost). repr()
    round-trips float64 exactly and Java's parseDouble is correctly
    rounded, so the literal values are bit-identical."""
    return F.expr(
        "array(" + ",".join(f"{float(v)!r}D" for v in values) + ")")


def _cosine_lit(vec: Column, query_vec: list[float]) -> Column:
    """Cosine against a LITERAL query vector. Same two data-side
    higher-order folds as dedup.cosine (the HOF loop is the fastest
    per-row form — a fully unrolled 64-dim arithmetic tree measured
    6x SLOWER at 2.5M rows, it falls out of the tight ArrayAggregate
    loop), but the CONSTANT query norm is folded driver-side: HOF
    aggregates never constant-fold, so dedup.cosine re-ran a
    64-iteration fold over the literal array on every row — a third of
    the per-row work. Python accumulates left-to-right from 0.0 with
    IEEE doubles, the exact op order of the interpreted fold, and
    math.sqrt == java.lang.Math.sqrt (both correctly rounded), so the
    result is bit-identical (verified exceptAll == 0 on 2.56M rows)."""
    import math

    qv = [float(x) for x in query_vec]
    q = _lit_double_array(qv)
    dot = F.aggregate(F.zip_with(vec, q, lambda x, y: x * y),
                      F.lit(0.0), lambda acc, x: acc + x)
    na = F.sqrt(F.aggregate(F.transform(vec, lambda x: x * x),
                            F.lit(0.0), lambda acc, x: acc + x))
    qn = 0.0
    for x in qv:
        qn += x * x
    return dot / (na * F.lit(math.sqrt(qn)))


def _cosine_expr(vec_sql: str, query_vec) -> Column:
    """_cosine_lit as ONE parsed SQL expression over a vector given as
    a SQL fragment. The Column form still paid ~0.1 s of driver-side
    py4j round trips per query building the two HOF folds; a single
    F.expr parse is one round trip (measured warm topk 0.216 -> 0.156 s
    at 20k rows). The parsed lambdas compile to the same Catalyst
    expressions, 0.0D/…D literals round-trip float64 exactly, so the
    result is bit-identical (exceptAll = 0 at 20k rows)."""
    import math

    qv = [float(x) for x in query_vec]
    qn = 0.0
    for x in qv:
        qn += x * x
    qn = math.sqrt(qn)
    arr = "array(" + ",".join(f"{x!r}D" for x in qv) + ")"
    return F.expr(
        f"aggregate(zip_with({vec_sql}, {arr}, (x, y) -> x * y), 0.0D, "
        f"(acc, x) -> acc + x) / "
        f"(sqrt(aggregate(transform({vec_sql}, x -> x * x), 0.0D, "
        f"(acc, x) -> acc + x)) * {qn!r}D)")


def _vec_sql(vec_col: str) -> str:
    return f"CAST(`{vec_col}` AS ARRAY<DOUBLE>)"


def brute_force_topk(df: DataFrame, query_vec: list[float], k: int = 10,
                     vec_col: str = "embedding",
                     id_col: str = "vec_id") -> DataFrame:
    sim = _cosine_expr(_vec_sql(vec_col), query_vec)
    return (df.select(F.col(id_col), F.round(sim, 4).alias("cos"))
            .orderBy(F.col("cos").desc(), F.col(id_col).asc())
            .limit(k))


def hyperplane_signature(vec: Column, dim: int, planes: int = 16) -> Column:
    """Sign signature as a long bitmap. Hyperplane p component j =
    ±1 from the parity of xxhash64(j, p) — deterministic, data-independent.

    The component array is built from xxhash64 calls over LITERALS so
    Catalyst constant-folds it once at optimization time; the previous
    transform-over-sequence form rebuilt all planes x dim hash calls
    per ROW (HOF lambdas never constant-fold) — measured 2.5x slower
    at 640k rows, bit-identical signatures either way."""
    bits = []
    for p in range(planes):
        # one parsed expression per plane instead of dim x 3 py4j
        # Column calls (same bit-identical constant-folded components)
        comps = F.expr("array(" + ",".join(
            f"CASE WHEN xxhash64('{j}', {p}) & 1L = 1L "
            f"THEN 1.0D ELSE -1.0D END" for j in range(dim)) + ")")
        dot = F.aggregate(F.zip_with(vec, comps, lambda x, c: x * c),
                          F.lit(0.0), lambda a, x: a + x)
        bits.append(F.when(dot > 0, F.shiftleft(F.lit(1).cast("long"), p))
                    .otherwise(F.lit(0).cast("long")))
    out = bits[0]
    for b in bits[1:]:
        out = out.bitwiseOR(b)
    return out


def lsh_topk(df: DataFrame, query_vec: list[float], k: int = 10,
             vec_col: str = "embedding", id_col: str = "vec_id",
             planes: int = 16, probe_hamming: int = 4) -> DataFrame:
    """ANN top-k: prefilter by signature hamming distance, then exact
    cosine on the survivors. Recall rises with probe_hamming → planes
    tradeoff; the signature computation is one scan and can be
    precomputed/persisted as a column at ingest."""
    dim = len(query_vec)
    qv = [float(x) for x in query_vec]
    # xxhash64 is JVM-side; compute the query's signature with a one-row
    # DataFrame rather than reimplementing the hash in Python.
    sig_col = hyperplane_signature(_as_double(F.col(vec_col)), dim, planes)
    scored = df.select(F.col(id_col), F.col(vec_col), sig_col.alias("sig"))
    qdf = df.sparkSession.range(1).select(
        _lit_double_array(qv).alias("qv"))
    qsig = qdf.select(hyperplane_signature(F.col("qv"), dim, planes)
                      .alias("sig")).collect()[0]["sig"]
    cand = scored.where(
        F.bit_count(F.col("sig").bitwiseXOR(F.lit(qsig))) <= probe_hamming)
    sim = _cosine_expr(_vec_sql(vec_col), qv)
    return (cand.select(F.col(id_col), F.round(sim, 4).alias("cos"))
            .orderBy(F.col("cos").desc(), F.col(id_col).asc())
            .limit(k))


def ivf_build(df: DataFrame, n_cells: int = 16,
              vec_col: str = "embedding", id_col: str = "vec_id",
              seed: int = 42) -> tuple[list[list[float]], DataFrame]:
    """IVF index build — the ONE-TIME ingest-side step, separated from
    the query path (a per-query KMeans fit is a non-starter at 100 TB).

    Fits KMeans coarse centroids and assigns every vector its nearest
    cell. Returns (centers, assigned) where `centers` is the driver-side
    coarse codebook (n_cells × dim floats — tiny) and `assigned` is the
    input plus a `cell` column. At scale, write `assigned` partitioned
    (or bucketed) by `cell` so partition pruning makes a probe touch
    only ~nprobe/n_cells of the files; here callers persist() it."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    vecs = df.select(F.col(id_col), F.col(vec_col),
                     array_to_vector(_as_double(F.col(vec_col)))
                     .alias("features"))
    model = KMeans(k=n_cells, seed=seed, featuresCol="features").fit(vecs)
    centers = [list(map(float, c)) for c in model.clusterCenters()]
    assigned = (model.transform(vecs)
                .withColumnRenamed("prediction", "cell").drop("features"))
    return centers, assigned


def ivf_probe(assigned: DataFrame, centers: list[list[float]],
              query_vec: list[float], k: int = 10, nprobe: int = 3,
              vec_col: str = "embedding",
              id_col: str = "vec_id") -> DataFrame:
    """IVF query path: rank cells by centroid distance driver-side
    (n_cells floats — no Spark job), filter to the nprobe nearest, exact
    cosine + TakeOrderedAndProject on the survivors. No .fit(), no
    collect; with `assigned` partitioned by `cell` the IN-filter prunes
    at the scan."""
    qv = [float(x) for x in query_vec]
    dists = [sum((c[j] - qv[j]) ** 2 for j in range(len(qv)))
             for c in centers]
    probe = sorted(range(len(dists)), key=lambda i: dists[i])[:nprobe]

    sim = _cosine_expr(_vec_sql(vec_col), qv)
    return (assigned.where(F.col("cell").isin(probe))
            .select(F.col(id_col), F.round(sim, 4).alias("cos"))
            .orderBy(F.col("cos").desc(), F.col(id_col).asc())
            .limit(k))


def ivf_topk(df: DataFrame, query_vec: list[float], k: int = 10,
             vec_col: str = "embedding", id_col: str = "vec_id",
             n_cells: int = 16, nprobe: int = 3, seed: int = 42) -> DataFrame:
    """Build + probe in one call — a DEMO convenience for ad-hoc use.
    Real deployments call ivf_build once at ingest and ivf_probe per
    query (see those docstrings)."""
    centers, assigned = ivf_build(df, n_cells=n_cells, vec_col=vec_col,
                                  id_col=id_col, seed=seed)
    return ivf_probe(assigned, centers, query_vec, k=k, nprobe=nprobe,
                     vec_col=vec_col, id_col=id_col)


def quantize_embeddings(df: DataFrame, vec_col: str = "embedding",
                        id_col: str = "vec_id") -> DataFrame:
    """Scalar int8 quantization of an embedding column — the 100 TB
    storage/scan lever: symmetric per-vector max-abs scaling to
    tinyint cuts the candidate-scan bytes ~4x (float32→int8) while the
    coarse ranking stays within ~1/127 relative error per component.
    Returns (id, q8 array<tinyint>, q8_scale double); write THIS slim
    table as the ANN index and keep full-precision vectors only in the
    main table for rescoring.
    """
    v = _as_double(F.col(vec_col))
    scale = F.greatest(
        F.array_max(F.transform(v, lambda x: F.abs(x))), F.lit(1e-12))
    q8 = F.transform(v, lambda x: F.round(x / scale * 127).cast("tinyint"))
    return df.select(F.col(id_col), q8.alias("q8"),
                     scale.alias("q8_scale"))


def quantized_topk(qdf: DataFrame, full: DataFrame,
                   query_vec: list[float], k: int = 10, rescore: int = 4,
                   vec_col: str = "embedding",
                   id_col: str = "vec_id") -> DataFrame:
    """Two-stage search over the int8 index: (1) coarse cosine over
    dequantized int8 rows (scans only the slim q8 table) takes the top
    k*rescore candidates via TakeOrderedAndProject; (2) the candidate
    id-list (tiny) broadcast-joins back to the full-precision table for
    exact cosine rescoring. No cross join, no full-precision scan in
    stage 1 — at 100 TB stage 1 reads ~25% of the bytes of a float scan
    and stage 2 touches only k*rescore rows."""
    deq_sql = ("transform(`q8`, x -> CAST(x AS DOUBLE) "
               "* `q8_scale` / 127.0D)")
    coarse = (qdf.select(F.col(id_col),
                         F.round(_cosine_expr(deq_sql, query_vec), 6)
                         .alias("cos8"))
              .orderBy(F.col("cos8").desc(), F.col(id_col).asc())
              .limit(k * rescore))
    sim = _cosine_expr(_vec_sql(vec_col), query_vec)
    return (full.join(F.broadcast(coarse.select(id_col)), id_col)
            .select(F.col(id_col), F.round(sim, 4).alias("cos"))
            .orderBy(F.col("cos").desc(), F.col(id_col).asc())
            .limit(k))
