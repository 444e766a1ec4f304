"""Structured Streaming surface for the validation engine."""
