"""swarm_spark — a PySpark-native rebuild of secmon-lab/swarm's
parse → enrich → route → aggregate security-log pipeline, re-expressed
as a declarative DataFrame DAG over snapshot-committed tables.

Nothing here is a port: the reference (Go, row-at-a-time, Rego-routed,
BigQuery-sinked) defines WHAT is computed; this package defines HOW on
Spark — Catalyst plans, broadcast joins for rule/dimension lookups,
vectorized (JVM or Arrow) expressions only, atomic snapshot commits for
exactly-once delivery.

Layout:
    session     — tuned SparkSession factory (AQE, Arrow, UTC)
    datagen     — deterministic transcript-table generator (seeded, skewed)
    rules       — declarative event/schema rules -> compiled Column plans
                  (the Rego replacement, see /root/reference/docs/rule.md)
    functions/  — extraction, normalization, hashing, text analytics
    tablestore  — `icepack`: snapshot-committed parquet tables with
                  schema evolution + time partition transforms (the
                  Iceberg stand-in; swaps out when iceberg jars exist)
    manifest    — processed-batch state gate (Firestore State replacement)
    pipeline    — the end-to-end ingest DAG + audit
    operators/  — dedup / similarity / text-analysis / multimodal ops
    streaming/  — Structured Streaming variants
"""

__version__ = "0.1.0"
