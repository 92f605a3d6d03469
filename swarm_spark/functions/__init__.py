"""Scalar/vectorized function surface of the rebuild (SURVEY.md §2.10)."""
