"""Large-scale training-data operators: dedup, similarity search,
text analytics, multimodal plumbing. All Spark-first: built-in Column
expressions where possible, Arrow-vectorized pandas UDFs where not."""
