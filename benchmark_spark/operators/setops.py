"""Set operations: UNION [ALL] / INTERSECT / EXCEPT (SURVEY.md §2.7).

Operands: two customer-key sets defined by independent predicates
(high balance vs BUILDING segment) — they overlap partially, so each
operator produces a distinct, non-trivial result.

Scale posture: UNION ALL is a zero-shuffle concatenation of scans;
UNION/INTERSECT/EXCEPT add one hash-distinct shuffle on the full
row — at 100 TB prefer UNION ALL + downstream dedup-by-key where
semantics allow.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from benchmark_spark.catalog import load_table
from benchmark_spark.registry import register

_A_SQL = "SELECT c_custkey FROM customer WHERE c_acctbal > 5000"
_B_SQL = "SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'"


def _operands(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    customer = load_table(spark, sf_dir, "customer", assert_schema=False)
    a = customer.filter(F.col("c_acctbal") > 5000).select("c_custkey")
    b = customer.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    return a, b


@register(
    "q_union_all",
    oracle=f"{_A_SQL} UNION ALL {_B_SQL}",
    doc="UNION ALL: bag concatenation, duplicates preserved.",
    tags=("completeness", "setop"),
)
def q_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    a, b = _operands(spark, sf_dir)
    return a.unionByName(b)


@register(
    "q_union",
    oracle=f"{_A_SQL} UNION {_B_SQL}",
    doc="UNION (distinct): concatenation + hash-distinct.",
    tags=("completeness", "setop"),
)
def q_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    a, b = _operands(spark, sf_dir)
    return a.unionByName(b).distinct()


@register(
    "q_intersect",
    oracle=f"{_A_SQL} INTERSECT {_B_SQL}",
    doc="INTERSECT (distinct).",
    tags=("completeness", "setop"),
)
def q_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    a, b = _operands(spark, sf_dir)
    return a.intersect(b)


@register(
    "q_except",
    oracle=f"{_A_SQL} EXCEPT {_B_SQL}",
    doc="EXCEPT (distinct): high-balance customers not in BUILDING.",
    tags=("completeness", "setop"),
)
def q_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    a, b = _operands(spark, sf_dir)
    return a.subtract(b)


@register(
    "q_intersect_all",
    oracle=f"SELECT c_custkey FROM (SELECT c_custkey FROM customer WHERE c_acctbal > 5000 UNION ALL {_B_SQL}) u INTERSECT ALL {_A_SQL}",
    doc="INTERSECT ALL: bag-semantics intersection (multiplicity = min of the two sides).",
    tags=("completeness", "setop"),
)
def q_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    a, b = _operands(spark, sf_dir)
    return a.unionByName(b).intersectAll(a)


@register(
    "q_except_all",
    oracle=f"{_A_SQL} UNION ALL {_A_SQL} EXCEPT ALL {_B_SQL}",
    doc="EXCEPT ALL: bag-semantics difference (multiplicities subtract).",
    tags=("completeness", "setop"),
)
def q_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    a, b = _operands(spark, sf_dir)
    return a.unionByName(a).exceptAll(b)
