"""Scalar/array function layer + LLM-data-pipeline operators.

- ``text``: tokenization, n-grams, tf-idf, language-ID, quality scoring,
  fingerprinting (generalizes the reference's word-count mapper,
  ``src/main.c:10-28``).
- ``dedup``: exact + near-duplicate detection (shingle-Jaccard, MinHash-LSH,
  SimHash).
- ``similarity``: embedding cosine top-k (brute force + LSH-bucketed ANN).
- ``multimodal``: binary-column plumbing with Pandas-UDF decode stubs.
"""
