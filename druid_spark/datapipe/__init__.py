"""Large-scale training-data pipeline operators (beyond the reference).

Dedup (exact / MinHash-LSH / SimHash / n-gram Jaccard / embedding
cosine), similarity search (brute-force + LSH ANN), text analysis
(lang-id, quality, tokens, fingerprint), multimodal column plumbing.
All operators are stateless-over-partitions compositions of built-in
DataFrame ops so they scale linearly with executors; Python appears
only in the clearly-marked multimodal decode stubs (Pandas UDFs).
"""
