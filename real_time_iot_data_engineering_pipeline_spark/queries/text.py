"""Text-analysis & document-dedup operators (beyond-reference, LLM-data-
pipeline surface). Filled in wave 2."""
