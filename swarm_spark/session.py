"""SparkSession factory tuned for the swarm_spark pipeline.

Local-mode knobs mirror the parallelism defaults of the reference
(read concurrency 32: /root/reference/pkg/usecase/usecase.go:34) but are
expressed as Spark confs so the same code scales to a multi-executor
cluster: AQE re-plans shuffles at runtime (incl. skew-join splitting),
shuffle partitions default to the core count locally and should be set
to ~2-3x total cores on a real cluster.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "swarm_spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with the pipeline's tuning.

    All settings are cluster-safe: on a real cluster, drop the
    ``master`` override via ``SPARK_GRAFT_MASTER`` or spark-submit.
    """
    cpus = cpus or DEFAULT_CPUS
    master = os.environ.get("SPARK_GRAFT_MASTER", f"local[{cpus}]")
    shuffle_partitions = shuffle_partitions or max(cpus, 8)

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        # AQE: runtime shuffle coalescing + skew-join splitting — the
        # scale path for hot conv_id keys (SURVEY.md §7 "What's hard").
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.default.parallelism", str(shuffle_partitions))
        # Arrow for every pandas UDF / toPandas hop.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # Deterministic oracle comparison: UTC everywhere.
        .config("spark.sql.session.timeZone", "UTC")
        # TIMESTAMP_MICROS, not Spark's legacy INT96: Iceberg forbids
        # INT96, every modern reader takes INT64 micros, and INT96
        # columns carry NO parquet min/max statistics — which would
        # blind filestats.py's file skipping on every timestamp.
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
        # zstd, not snappy (Spark's default): measured on 500k
        # transcripts — 39% smaller files AND faster write+scan
        # (snappy 14.2 MB / 1.9 s write; zstd 8.7 MB / 0.7 s; gzip is
        # marginally smaller but decompression-slow at scale). At
        # 100 TB the storage+IO delta dominates; Iceberg's default is
        # zstd for the same reason.
        .config("spark.sql.parquet.compression.codec", "zstd")
        # Broadcast threshold: rules/dimension tables are tiny; keep the
        # default 10MB but make it explicit — the routing join must
        # NEVER shuffle the fact side.
        .config("spark.sql.autoBroadcastJoinThreshold", str(10 * 1024 * 1024))
        # Target ~128MB input splits at scale.
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        # v2 commit: tasks move their own files at completion instead of
        # a sequential driver-side rename per partition dir — a write
        # into many hive partitions (hour transform = 720 dirs/month)
        # is otherwise driver-commit bound. Safe here: icepack's
        # snapshot pointer provides the atomicity, not the committer.
        .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
        .config("spark.ui.enabled", os.environ.get("SPARK_GRAFT_UI", "false"))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "32g"))
    )
    # Without the Hadoop native library (the pip-installed PySpark
    # norm), RawLocalFileSystem forks a `chmod` PROCESS per created
    # file/dir; a dynamic-partition write of ~800 dirs pays ~2000
    # fork/execs — measured ~3 s of a 4.5 s staged-write job, thread
    # dumps queued in Shell.runCommand. swarm-localfs.jar overrides
    # setPermission/mkOneDirWithMode to no-ops (local files already
    # carry the umask mode). file:// scheme only — a real deployment's
    # HDFS/S3 paths never touch this class. SPARK_GRAFT_FAST_LOCAL_FS=0
    # restores stock behavior.
    jar = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "jars", "swarm-localfs.jar")
    if (os.environ.get("SPARK_GRAFT_FAST_LOCAL_FS", "1") != "0"
            and os.path.isfile(jar)):
        builder = (
            builder.config("spark.driver.extraClassPath", jar)
            .config("spark.executor.extraClassPath", jar)
            .config("spark.hadoop.fs.file.impl",
                    "swarmspark.fs.FastLocalFileSystem")
        )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
