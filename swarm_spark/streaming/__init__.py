"""Structured Streaming variants of the ingest DAG (SURVEY.md §2.1 S6/S7)."""
