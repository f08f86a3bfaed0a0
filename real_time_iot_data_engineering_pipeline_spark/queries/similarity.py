"""Embedding-similarity operators (beyond-reference). Filled in wave 2."""
