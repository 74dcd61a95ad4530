"""Query-4 family: the ETL / external-script pipeline, idiomatic form.

Reference semantics (SURVEY.md §2.0 Query 4 [P]): Hive `TRANSFORM`
pipes crawl lines through `url_count.py` (regex-extract URLs, emit
(sourcePage, destPage, 1)), materializes the partial counts with
CTAS, then re-aggregates with SQL. It is a word-count-shaped
map + two-step aggregation.

Idiomatic Spark collapses the script into native expressions
(split/explode) and fuses both CTAS steps into one pipeline — no
Python boundary, whole-stage codegen end to end. The literal
stdin/stdout child-process fidelity mode lives in
benchmark_spark/udf/surface.py (q_pipe_wordcount).

Scale posture: explode(split(...)) is a per-row flatMap with
map-side partial counting before the single shuffle on the token —
the same shape as the 137 GB crawl ETL, and the shape of any 100 TB
tokenize-then-count corpus job.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from benchmark_spark.catalog import load_table
from benchmark_spark.registry import register

WORDCOUNT_ORACLE = """
    SELECT word, COUNT(*) AS cnt
    FROM (
        SELECT unnest(string_split(text, ' ')) AS word
        FROM documents
    )
    GROUP BY word
"""


@register(
    "q4_wordcount",
    oracle=WORDCOUNT_ORACLE,
    doc="Query-4 analogue, fused: tokenize -> explode -> count (SURVEY.md §2.10 [Q:q4_wordcount]).",
    tags=("reference", "etl"),
)
def q4_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents", assert_schema=False)
    return (
        docs.select(F.explode(F.split("text", " ")).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


@register(
    "q4_two_step",
    oracle="""
        SELECT word, CAST(SUM(cnt) AS BIGINT) AS total
        FROM (
            SELECT word, COUNT(*) AS cnt
            FROM (
                SELECT source, unnest(string_split(text, ' ')) AS word
                FROM documents
            )
            GROUP BY source, word
        )
        GROUP BY word
    """,
    doc=(
        "Query-4 fidelity of the two-CTAS shape: partial counts per (source, word) "
        "materialized as a temp view (the `url_counts_partial` analogue), then "
        "re-aggregated — two separate aggregation steps as in the reference [P]."
    ),
    tags=("reference", "etl"),
)
def q4_two_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents", assert_schema=False)
    partial = (
        docs.select("source", F.explode(F.split("text", " ")).alias("word"))
        .groupBy("source", "word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    # CTAS analogue: register the intermediate as a view; the second
    # step re-aggregates from it (Catalyst still fuses unless a real
    # write sink is requested — the sink variant is exercised in
    # tests/test_sources.py with an actual parquet round-trip).
    partial.createOrReplaceTempView("url_counts_partial")
    return spark.table("url_counts_partial").groupBy("word").agg(
        F.sum("cnt").cast("long").alias("total")
    )
