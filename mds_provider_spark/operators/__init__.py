"""Distributed operators: cross-row checks, stats/sketches, dedup, ANN, text."""
