"""Non-parquet sources and sinks (SURVEY.md §2.1).

The reference loads delimited text / SequenceFiles declared via Hive
DDL [P]; our equivalents are schema-explicit CSV/JSON readers (never
inference — the catalog's StructType is the DDL) plus materialized
parquet sinks (the Query-4 CTAS analogue). Round-trips are tested in
tests/test_sources.py.

Scale posture: CSV/JSON are ingest formats only — the engine
re-materializes them as parquet (columnar, splittable, statistics)
before analytical work, exactly as the reference's prepare step
copies S3 text into the cluster store [P]. Writers take partition
columns so the 100 TB layout (partition by date, bucket by join key)
is declared at write time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from benchmark_spark.catalog import SCHEMAS


def read_csv(
    spark: SparkSession, path: str, table: str, header: bool = True
) -> DataFrame:
    """CSV with the catalog schema — no inference, no malformed-row
    silence (FAILFAST surfaces drift immediately, like the schema
    assert on parquet)."""
    return (
        spark.read.schema(SCHEMAS[table])
        .option("header", str(header).lower())
        .option("mode", "FAILFAST")
        .option("timestampFormat", "yyyy-MM-dd HH:mm:ss[.SSSSSS]")
        .csv(path)
    )


def read_json(spark: SparkSession, path: str, table: str) -> DataFrame:
    return (
        spark.read.schema(SCHEMAS[table])
        .option("mode", "FAILFAST")
        .option("timestampFormat", "yyyy-MM-dd HH:mm:ss[.SSSSSS]")
        .json(path)
    )


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> None:
    """Materialized-table sink (the CTAS analogue, SURVEY.md §2.1).

    `partition_by` writes hive-style directories — the unit of
    partition pruning at 100 TB (e.g. orders by order month)."""
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def write_bucketed(
    df: DataFrame, table_name: str, buckets: int, bucket_cols: list[str], path: str
) -> None:
    """Bucketed saveAsTable: pre-shuffles by join key at write time so
    later joins/aggregations on those keys skip their Exchange —
    the 100 TB answer to repeated fact-fact joins (SURVEY.md §4)."""
    (
        df.write.mode("overwrite")
        .option("path", path)
        .bucketBy(buckets, *bucket_cols)
        .sortBy(*bucket_cols)
        .format("parquet")
        .saveAsTable(table_name)
    )
