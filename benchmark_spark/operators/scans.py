"""Scan / projection / filter operators — Query-1 family.

Reference semantics (SURVEY.md §2.0 Query 1 [P]):
    SELECT pageURL, pageRank FROM rankings WHERE pageRank > X
at three selectivities (1a/1b/1c). Our analogue projects 2 of 6
columns from `orders` and filters on `o_totalprice`
(domain 1013..499978, so >1000 ≈ full scan — mirroring 1c — and
>450000 is the tight 1a-style variant).

Scale posture: these plans are pure scan+filter+project — Catalyst
pushes both the predicate (parquet row-group/page stats skip) and
the 2-column projection into the scan (`PushedFilters`, `ReadSchema`
in explain), so cost at 100 TB is IO on two columns only, no
shuffle, no driver involvement. Verified in tests/test_plans.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from benchmark_spark.catalog import load_table
from benchmark_spark.registry import register


def scan_filter(spark: SparkSession, sf_dir: str, threshold: float) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders", assert_schema=False)
    return orders.select("o_orderkey", "o_totalprice").filter(
        F.col("o_totalprice") > F.lit(threshold)
    )


@register(
    "q1_scan",
    oracle="SELECT o_orderkey, o_totalprice FROM orders WHERE o_totalprice > 1000",
    doc="Query-1 analogue (near-full scan, 1c-style selectivity).",
    tags=("reference", "scan"),
)
def q1_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    return scan_filter(spark, sf_dir, 1000.0)


@register(
    "q1_scan_mid",
    oracle="SELECT o_orderkey, o_totalprice FROM orders WHERE o_totalprice > 250000",
    doc="Query-1 analogue, ~50% selectivity (1b-style).",
    tags=("reference", "scan"),
)
def q1_scan_mid(spark: SparkSession, sf_dir: str) -> DataFrame:
    return scan_filter(spark, sf_dir, 250000.0)


@register(
    "q1_scan_tight",
    oracle="SELECT o_orderkey, o_totalprice FROM orders WHERE o_totalprice > 450000",
    doc="Query-1 analogue, ~10% selectivity (1a-style).",
    tags=("reference", "scan"),
)
def q1_scan_tight(spark: SparkSession, sf_dir: str) -> DataFrame:
    return scan_filter(spark, sf_dir, 450000.0)


@register(
    "q_pred_mix",
    oracle="""
        SELECT l_orderkey, l_linenumber, l_quantity, l_discount, l_returnflag
        FROM lineitem
        WHERE l_discount BETWEEN 0.05 AND 0.07
          AND l_quantity < 24
          AND l_returnflag IN ('A', 'R')
          AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND NOT (l_linestatus = 'O' AND l_tax > 0.05)
    """,
    doc="Compound predicate battery: BETWEEN / IN / comparison / boolean combinators (SURVEY.md §2.2).",
    tags=("completeness", "scan"),
)
def q_pred_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem", assert_schema=False)
    return li.filter(
        F.col("l_discount").between(0.05, 0.07)
        & (F.col("l_quantity") < 24)
        & F.col("l_returnflag").isin("A", "R")
        & (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & ~((F.col("l_linestatus") == "O") & (F.col("l_tax") > 0.05))
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_discount", "l_returnflag")


@register(
    "q_null_pred",
    oracle="""
        SELECT o_orderkey,
               CASE WHEN o_orderstatus = 'P' THEN NULL ELSE o_orderstatus END AS status_or_null
        FROM orders
        WHERE (CASE WHEN o_orderstatus = 'P' THEN NULL ELSE o_orderstatus END) IS NOT NULL
          AND o_totalprice > 400000
    """,
    doc="NULL semantics: fixtures contain no NULLs (FIXTURES.md), so nulls are constructed via CASE and filtered with IS [NOT] NULL.",
    tags=("completeness", "scan"),
)
def q_null_pred(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders", assert_schema=False)
    status_or_null = F.when(F.col("o_orderstatus") == "P", F.lit(None)).otherwise(
        F.col("o_orderstatus")
    )
    return (
        orders.withColumn("status_or_null", status_or_null)
        .filter(F.col("status_or_null").isNotNull() & (F.col("o_totalprice") > 400000))
        .select("o_orderkey", "status_or_null")
    )
