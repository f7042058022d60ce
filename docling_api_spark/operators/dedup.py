"""Deduplication operators over `documents` (SURVEY.md M3): exact,
minhash-LSH, simhash, n-gram Jaccard."""
