"""LLM-data-pipeline queries (dedup, similarity, text) — filled in next."""
