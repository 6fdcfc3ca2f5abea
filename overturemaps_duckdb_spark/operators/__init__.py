"""Composite operators: spatial joins, FTS/BM25, dedup, similarity search,
multimodal column plumbing."""
