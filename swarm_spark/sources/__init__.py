"""Object/file sources: JSON document ingestion (SURVEY.md §2.1)."""
