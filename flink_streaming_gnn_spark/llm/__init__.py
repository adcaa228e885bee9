"""LLM-training-data pipeline operators (BASELINE.json north_star):
deduplication (exact / MinHash-LSH / SimHash / n-gram Jaccard / embedding
cosine), similarity search (brute-force + LSH scale path), text analysis
(stats, TF-IDF, language-ID, quality scoring, token counting,
fingerprinting), and multimodal column handling.

Scale doctrine: every quadratic candidate-pair step is gated behind a
blocking/bucketing key (LSH band, length block, centroid bucket) so the
verify step runs on candidate pairs, never on the full cross product —
the only formulation that survives 100 TB.
"""
