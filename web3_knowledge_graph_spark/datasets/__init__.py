"""Training-data pipeline operators over document/embedding corpora:
deduplication (exact, MinHash-LSH, SimHash, n-gram Jaccard, embedding
cosine), similarity search (brute-force + LSH-bucketed ANN), text analysis
(language-ID, quality scoring, token counting, fingerprinting), and
multimodal column plumbing. All pure DataFrame ops — no per-row Python."""
