"""Similarity-search operators over `embeddings` (SURVEY.md M3): brute-force
cosine top-k, LSH-bucketed ANN."""
