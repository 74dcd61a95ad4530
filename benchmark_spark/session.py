"""SparkSession builder tuned for this engine.

Local testing runs on local[N] (N = $SPARK_GRAFT_CPUS, default 32);
the same configuration keys are the ones that matter on a real
1000-executor cluster — AQE (runtime re-planning, skew-join
splitting, partition coalescing), Arrow for any Python-boundary
transfer, and an explicit shuffle-partition count sized to the data
(small for local SFs, ~2-3x total cores at 100 TB).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Defaults chosen for the local[32] test environment. At cluster
# scale, shuffle partitions should target ~128-256 MB per task
# (e.g. 100 TB shuffle -> O(500k) partitions via AQE coalescing from
# a high initial number); locally a small fixed count avoids paying
# task-launch overhead on kilobyte partitions.
DEFAULT_CONF: dict[str, str] = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.shuffle.partitions": "32",
    # Parquet scans: keep predicate pushdown + vectorized reader on
    # (defaults, pinned here so a misconfigured environment fails loud).
    "spark.sql.parquet.filterPushdown": "true",
    "spark.sql.parquet.enableVectorizedReader": "true",
    # Partition discovery: the default threshold (32 paths) turns the
    # listing of a modest partitioned layout (e.g. the ANN index's
    # per-list postings dirs) into a scheduled 45-task cluster job of
    # ~0.15-0.2 s per read. Local-FS stats are microseconds, so list
    # driver-side up to 1024 paths; at object-store scale LOWER this
    # (cluster listing parallelism is the win there) — scale knob, not
    # a constant (guide §6).
    "spark.sql.sources.parallelPartitionDiscovery.threshold": "1024",
    "spark.sql.autoBroadcastJoinThreshold": "64m",
    # events.ts is parquet TIMESTAMP(NANOS), which Spark rejects;
    # read it as raw long and convert (catalog.load_table).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # write timestamps as annotated int64 micros, not legacy INT96:
    # INT96 is deprecated, unreadable by many engines (and pyarrow
    # reports it as nanos, confusing footer sniffers), so every sink
    # this engine writes — CTAS, compaction, partitioned copies — must
    # round-trip through the catalog's own reader.
    "spark.sql.parquet.outputTimestampType": "TIMESTAMP_MICROS",
    "spark.driver.memory": "8g",
    "spark.ui.enabled": "false",
}


def get_spark(
    app_name: str = "benchmark-spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine's defaults."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = SparkSession.builder.appName(app_name).master(f"local[{cpus}]")
    conf = dict(DEFAULT_CONF)
    if shuffle_partitions is not None:
        conf["spark.sql.shuffle.partitions"] = str(shuffle_partitions)
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def tune_for_queries(spark: SparkSession, shuffle_partitions: int = 32) -> SparkSession:
    """Apply runtime-mutable conf to an externally provided session.

    The correctness driver passes in its own SparkSession; only
    runtime-settable keys may be touched here (session timezone must
    be UTC so timestamp values agree with the DuckDB oracle reading
    the same parquet in a UTC container).
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.shuffle.partitions", str(shuffle_partitions))
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    return spark
