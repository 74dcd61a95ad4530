"""Skew handling: salted joins and salted aggregation (SURVEY.md §4).

AQE's skew-join splitting is the first line of defense at runtime;
salting is the explicit fallback when one join key dominates (the
Query-2c "Zipfian sourceIP" shape at ~254M groups [P]). The fallback
is not hypothetical — three measured limits of the AQE rule (Spark
4.1.2; pinned in tests/test_plans.py::test_aqe_skew_split_fires_*,
advisor rule skew-split-blocked, A/B curve in tools/curve_skew.py,
discussion in SCALE.md "Skew"):
  1. it only fires when both join children read DIRECTLY from
     ENSURE_REQUIREMENTS shuffle stages (a distinct()-derived dim
     interposes its aggregate and loses the split);
  2. a final-mode aggregate that consumes the join's output
     partitioning in the same stage (distinct/groupBy on the join
     key right above the join) blocks it, since splitting would
     break that requirement;
  3. it decides from INPUT partition bytes, so output-amplification
     skew (a small-but-crowded LSH bucket owing n^2 pairs) is
     invisible to it entirely.
Salting — and occupancy-aware rewrites like capped_lsh_candidates —
keep working in exactly those shapes. The salt is
derived from xxhash64 of row content — deterministic, executor-local,
no driver randomness — so results are reproducible and the operators
remain oracle-checkable: a salted join/agg must produce EXACTLY the
plain operator's result, which is what the registered oracles assert.

Scale mechanics: a hot key's rows land in one shuffle partition and
serialize one task; salting splits the hot key across SALT_BUCKETS
partitions (probe side replicated per salt), turning the straggler
into SALT_BUCKETS parallel tasks at the cost of replicating the
other side SALT_BUCKETS times — apply to the hot keys only in a real
pipeline (two-phase: split hot/cold by a frequency sketch).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from benchmark_spark.catalog import load_table
from benchmark_spark.operators.aggregates import dsum, dsum_sql
from benchmark_spark.registry import register

SALT_BUCKETS = 8


def salt_col(*cols: Column, buckets: int = SALT_BUCKETS) -> Column:
    """Deterministic salt in [0, buckets) from row content."""
    return F.pmod(F.xxhash64(*cols), F.lit(buckets))


def salted_join(
    fact: DataFrame,
    other: DataFrame,
    fact_key: str,
    other_key: str,
    fact_salt_source: list[str],
    buckets: int = SALT_BUCKETS,
) -> DataFrame:
    """Equi join with the fact side salted and the other side
    replicated once per salt bucket. Result rows are identical to the
    plain join (salt columns are dropped)."""
    salted_fact = fact.withColumn(
        "_salt", salt_col(*[F.col(c) for c in fact_salt_source], buckets=buckets)
    )
    replicated = other.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(buckets - 1)))
    )
    joined = salted_fact.join(
        replicated,
        (F.col(fact_key) == F.col(other_key)) & (salted_fact._salt == replicated._salt),
    )
    return joined.drop("_salt")


@register(
    "q_salted_join",
    oracle=f"""
        SELECT o_custkey,
               {dsum_sql('l_extendedprice * (1 - l_discount)')} AS total_rev,
               COUNT(*) AS n
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY o_custkey
    """,
    doc=(
        "Skew-resistant salted join: fact side salted on row content, probe side "
        "replicated per salt, join on (key, salt) — must reproduce the plain "
        "join's aggregate exactly (the oracle IS the plain join). The manual "
        "fallback behind AQE skew splitting for Zipfian keys (SURVEY.md §4)."
    ),
    tags=("completeness", "join", "skew"),
)
def q_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem", assert_schema=False)
    orders = load_table(spark, sf_dir, "orders", assert_schema=False).filter(
        F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp")
    )
    joined = salted_join(
        li,
        orders,
        "l_orderkey",
        "o_orderkey",
        fact_salt_source=["l_orderkey", "l_linenumber"],
    )
    return joined.groupBy("o_custkey").agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("total_rev"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "q_salted_agg",
    oracle="""
        SELECT l_returnflag,
               CAST(SUM(n_part) AS BIGINT) AS n,
               CAST(SUM(qty_part) AS BIGINT) AS qty_x100
        FROM (
            SELECT l_returnflag,
                   COUNT(*) AS n_part,
                   SUM(CAST(round(l_quantity * 100, 0) AS BIGINT)) AS qty_part
            FROM lineitem
            GROUP BY l_returnflag, CAST(round(l_quantity * 100, 0) AS BIGINT) % 8
        )
        GROUP BY l_returnflag
    """,
    doc=(
        "Two-phase salted aggregation: group by (key, salt) then re-aggregate by "
        "key — the manual rewrite for hot grouping keys; equals the plain groupBy "
        "(map-side partial agg already does this implicitly for associative aggs, "
        "so this is the recipe for when the AGGREGATE itself is the skew problem, "
        "e.g. collect_list on a hot key)."
    ),
    tags=("completeness", "agg", "skew"),
)
def q_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem", assert_schema=False)
    qty_cents = F.round(F.col("l_quantity") * 100, 0).cast("long")
    partial = (
        li.withColumn("_salt", (qty_cents % 8))
        .groupBy("l_returnflag", "_salt")
        .agg(
            F.count(F.lit(1)).alias("n_part"),
            F.sum(qty_cents).alias("qty_part"),
        )
    )
    return partial.groupBy("l_returnflag").agg(
        F.sum("n_part").cast("long").alias("n"),
        F.sum("qty_part").cast("long").alias("qty_x100"),
    )


HOT_THRESHOLD = 35  # rows per key above which a key is "hot"


@register(
    "q_salted_hotcold",
    oracle=f"""
        SELECT p_type,
               CAST(COUNT(*) AS BIGINT) AS n,
               {dsum_sql('l_extendedprice', 2)} AS revenue
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        GROUP BY p_type
        ORDER BY p_type
    """,
    doc=(
        "HOT/COLD split salting — the refinement every salted-join "
        "docstring in this repo promises, implemented and hash-proven: "
        "a frequency pass finds the join keys whose fact row count "
        "exceeds a threshold (the would-be stragglers; ~15% of parts "
        "at these fixtures, so BOTH paths carry real rows); ONLY those "
        "keys' rows are salted (and only their probe rows replicated), "
        "the cold majority takes the plain equi-join, and the two "
        "results union before the rollup. This is the production form: "
        "uniform salting replicates the ENTIRE probe side "
        "SALT_BUCKETS times, hot/cold pays replication only for the "
        "handful of hot keys — at 100 TB the difference between a "
        "free fix and multiplying the shuffle. The oracle is the PLAIN "
        "join's aggregate, so the driver hash proves the split-and-"
        "union rewrite is result-identical. The frequency pass is one "
        "count shuffle (or a sketch at scale); the hot-key list "
        "broadcasts both to route rows and to replicate probes."
    ),
    tags=("skew", "join", "agg"),
)
def q_salted_hotcold(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem", assert_schema=False)
    part = load_table(spark, sf_dir, "part", assert_schema=False).select(
        "p_partkey", "p_type"
    )
    # phase 1: frequency pass -> hot-key list (sketch-sized, broadcasts)
    hot = (
        li.groupBy("l_partkey")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") > HOT_THRESHOLD)
        .select(F.col("l_partkey").alias("hk"))
    )
    li_flag = li.join(
        F.broadcast(hot), li.l_partkey == hot.hk, "left"
    ).withColumn("is_hot", F.col("hk").isNotNull())
    cold = li_flag.filter(~F.col("is_hot")).join(
        part, F.col("l_partkey") == F.col("p_partkey")
    )
    # hot rows: salt fact side, replicate ONLY the hot probes
    hot_fact = li_flag.filter(F.col("is_hot")).withColumn(
        "_salt", salt_col(F.col("l_extendedprice"), F.col("l_orderkey"))
    )
    hot_probe = part.join(
        F.broadcast(hot), part.p_partkey == hot.hk, "left_semi"
    ).withColumn("_salt", F.explode(F.sequence(F.lit(0), F.lit(SALT_BUCKETS - 1))))
    hot_joined = hot_fact.join(
        hot_probe,
        (F.col("l_partkey") == F.col("p_partkey"))
        & (hot_fact._salt == hot_probe._salt),
    )
    cols = ["p_type", "l_extendedprice"]
    both = cold.select(*cols).unionByName(hot_joined.select(*cols))
    return (
        both.groupBy("p_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            dsum(F.col("l_extendedprice"), 2).alias("revenue"),
        )
        .orderBy("p_type")
    )
