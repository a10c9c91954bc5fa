"""Vectorized UDFs + pure kernels (URL, text analysis, dedup, ANN)."""
