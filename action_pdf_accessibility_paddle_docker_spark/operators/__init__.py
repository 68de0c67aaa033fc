"""Vectorized per-batch extraction kernels and the training-data-pipeline
operators (dedup, similarity search, text analysis, multimodal plumbing)."""
