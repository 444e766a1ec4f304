"""Scalar/vectorized function surfaces (audio codecs, encodings)."""
