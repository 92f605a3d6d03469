"""Shared operator utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame, min_parts: int | None = None) -> DataFrame:
    """Scale-adaptive parallelism floor (optimization guide §2.5/§6).

    A tiny parquet input — one small file, or one row group — scans as
    a SINGLE partition, so every expensive per-row projection downstream
    (shingling, minhash, quantized distance folds) runs on one core no
    matter how wide the session is. When the plan's partitioning is
    narrower than the session parallelism, round-robin repartition up to
    it; the shuffled bytes are by construction small (few partitions ⇒
    small scan). At real scale the scan is already wider than the
    executor count and this is a NO-OP — no shuffle is ever added to a
    big input.

    Deterministic under retries: Spark sorts before round-robin
    repartition (spark.sql.execution.sortBeforeRepartition, default on),
    and every operator using this is content-deterministic anyway.
    """
    if df.isStreaming:
        return df
    sc = df.sparkSession.sparkContext
    target = min_parts or sc.defaultParallelism
    try:
        n = df.rdd.getNumPartitions()
    except Exception:
        return df
    return df.repartition(target) if n < target else df
