"""Deeper TPC-H-shaped relational queries (SURVEY.md §2.3/§2.4 depth).

The reference's Query 3 is a 2-way join + agg + top-1 (SURVEY.md §2.0
[P]); these four extend the same star schema into the classic TPC-H
shapes a user of a SQL-on-big-data engine runs daily: conditional-
aggregate ratios (Q14), correlated per-group thresholds (Q17), a
scalar-subquery equality against a derived view (Q15), and an
EXISTS-style semi-join rollup (Q4). All stay fully declarative —
Catalyst chooses broadcast for every dim side, and the only wide
exchanges are the per-key aggregations themselves.

Float discipline: money sums use the exact fixed-point dsum/dsum_sql
pair; ratios snap through the floor-form rnd/rnd_sql (see
operators/aggregates.py docstrings for why plain round() is a
cross-engine lottery).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from benchmark_spark.catalog import load_table
from benchmark_spark.operators.aggregates import dsum, dsum_sql, rnd, rnd_sql
from benchmark_spark.registry import register


@register(
    "q_promo_share",
    oracle=f"""
        SELECT {rnd_sql(
            "100.0 * "
            + dsum_sql("CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1 - l_discount) ELSE 0 END")
            + " / " + dsum_sql("l_extendedprice * (1 - l_discount)"), 6)} AS promo_share
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1997-03-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
    """,
    doc=(
        "TPC-H Q14-shaped promotion share: revenue fraction of PROMO parts in "
        "one ship month, as a single conditional-aggregate ratio — no self "
        "join, one broadcast of `part`, one scan of the date-pruned fact. "
        "Both sub-sums are exact fixed-point BIGINTs, so the 6dp ratio is "
        "bit-identical across engines."
    ),
    tags=("completeness", "agg", "join"),
)
def q_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem", assert_schema=False)
    part = load_table(spark, sf_dir, "part", assert_schema=False)
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0))
    lo = F.lit("1997-03-01 00:00:00").cast("timestamp")
    hi = F.lit("1997-04-01 00:00:00").cast("timestamp")
    return (
        li.filter((F.col("l_shipdate") >= lo) & (F.col("l_shipdate") < hi))
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .agg(rnd(F.lit(100.0) * dsum(promo) / dsum(rev), 6).alias("promo_share"))
    )


@register(
    "q_small_qty",
    oracle=f"""
        WITH part_avg AS (
            SELECT l_partkey AS pk,
                   0.2 * ({dsum_sql('l_quantity', 2)} / COUNT(*)) AS threshold
            FROM lineitem
            GROUP BY l_partkey
        )
        SELECT {dsum_sql('l_extendedprice')} AS total_price,
               COUNT(*) AS n_small
        FROM lineitem
        JOIN part     ON l_partkey = p_partkey
        JOIN part_avg ON l_partkey = pk
        WHERE p_brand = 'Brand#1'
          AND l_quantity < threshold
    """,
    doc=(
        "TPC-H Q17-shaped small-quantity analysis: lineitems of one brand "
        "whose quantity falls below 20% of that part's average order "
        "quantity. The correlated per-part average decorrelates into a "
        "grouped sub-aggregate joined back on partkey (what Catalyst's "
        "RewriteCorrelatedScalarSubquery produces); the threshold is an "
        "exact-fixed-point average so the < comparison can't flip between "
        "engines on a last-ulp difference. At scale: sub-agg and probe "
        "shuffle on the same key, so AQE plans them into one exchange reuse."
    ),
    tags=("completeness", "agg", "subquery"),
)
def q_small_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem", assert_schema=False)
    part = load_table(spark, sf_dir, "part", assert_schema=False)
    part_avg = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        (F.lit(0.2) * (dsum(F.col("l_quantity"), 2) / F.count(F.lit(1)))).alias(
            "threshold"
        )
    )
    return (
        li.join(
            F.broadcast(part.filter(F.col("p_brand") == "Brand#1")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(part_avg, F.col("l_partkey") == F.col("pk"))
        .filter(F.col("l_quantity") < F.col("threshold"))
        .agg(
            dsum(F.col("l_extendedprice")).alias("total_price"),
            F.count(F.lit(1)).alias("n_small"),
        )
    )


_SUPPLIER_REV = f"""
        SELECT l_suppkey AS sk,
               {dsum_sql('l_extendedprice * (1 - l_discount)')} AS total_rev
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
        GROUP BY l_suppkey
"""


@register(
    "q_top_supplier",
    oracle=f"""
        WITH supplier_rev AS ({_SUPPLIER_REV})
        SELECT s_suppkey, s_name, total_rev
        FROM supplier
        JOIN supplier_rev ON s_suppkey = sk
        WHERE total_rev = (SELECT max(total_rev) FROM supplier_rev)
        ORDER BY s_suppkey
    """,
    doc=(
        "TPC-H Q15-shaped top supplier: quarterly revenue per supplier, then "
        "the supplier(s) hitting the maximum — a derived view consumed twice "
        "(once aggregated to a scalar, once joined). The revenue view is an "
        "exact fixed-point sum, so the = max(...) equality is safe; Spark "
        "computes the scalar as a broadcast 1-row join, never a driver "
        "collect."
    ),
    tags=("completeness", "agg", "subquery"),
)
def q_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem", assert_schema=False)
    supplier = load_table(spark, sf_dir, "supplier", assert_schema=False)
    lo = F.lit("1997-01-01 00:00:00").cast("timestamp")
    hi = F.lit("1997-04-01 00:00:00").cast("timestamp")
    rev = (
        li.filter((F.col("l_shipdate") >= lo) & (F.col("l_shipdate") < hi))
        .groupBy(F.col("l_suppkey").alias("sk"))
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("total_rev"))
    )
    mx = rev.agg(F.max("total_rev").alias("mx"))
    return (
        rev.join(F.broadcast(mx), F.col("total_rev") == F.col("mx"))
        .join(F.broadcast(supplier), F.col("sk") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_rev")
        .orderBy("s_suppkey")
    )


@register(
    "q_order_returns",
    oracle="""
        SELECT o_orderpriority, COUNT(*) AS n_orders
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND o_orderdate <  TIMESTAMP '1997-07-01 00:00:00'
          AND EXISTS (
              SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R'
          )
        GROUP BY o_orderpriority
    """,
    doc=(
        "TPC-H Q4-shaped priority rollup: orders in a half-year window having "
        "at least one returned lineitem, counted per priority class — the "
        "EXISTS collapses to a LEFT SEMI join (one shuffle on orderkey, "
        "returned-flag filter pushed below it), then a 5-group aggregate."
    ),
    tags=("completeness", "join", "agg"),
)
def q_order_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders", assert_schema=False)
    li = load_table(spark, sf_dir, "lineitem", assert_schema=False)
    lo = F.lit("1997-01-01 00:00:00").cast("timestamp")
    hi = F.lit("1997-07-01 00:00:00").cast("timestamp")
    returned = li.filter(F.col("l_returnflag") == "R").select("l_orderkey")
    return (
        orders.filter((F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi))
        .join(returned, F.col("o_orderkey") == F.col("l_orderkey"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


@register(
    "q_order_dist",
    oracle="""
        WITH per_cust AS (
            SELECT c_custkey, COUNT(o_orderkey) AS c_count
            FROM customer
            LEFT JOIN orders ON c_custkey = o_custkey AND o_orderstatus = 'O'
            GROUP BY c_custkey
        )
        SELECT c_count, COUNT(*) AS n_custs
        FROM per_cust
        GROUP BY c_count
    """,
    doc=(
        "TPC-H Q13-shaped customer order-count distribution: how many "
        "customers placed 0, 1, 2, ... open orders — the aggregate-of-an-"
        "aggregate histogram. The LEFT OUTER join (with the status filter in "
        "the JOIN condition, not WHERE — the classic Q13 trap) keeps "
        "zero-order customers in the 0 bucket; COUNT(o_orderkey) ignores "
        "the NULLs the outer join manufactures. Two shuffles total, the "
        "second over a handful of histogram keys."
    ),
    tags=("completeness", "join", "agg"),
)
def q_order_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer", assert_schema=False)
    orders = load_table(spark, sf_dir, "orders", assert_schema=False)
    open_orders = orders.filter(F.col("o_orderstatus") == "O")
    return (
        customer.join(
            open_orders, F.col("c_custkey") == F.col("o_custkey"), "left"
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("n_custs"))
    )


@register(
    "q_big_orders",
    oracle=f"""
        WITH totals AS (
            SELECT l_orderkey, {dsum_sql('l_quantity', 2)} AS total_qty
            FROM lineitem
            GROUP BY l_orderkey
            HAVING {dsum_sql('l_quantity', 2)} > 150
        )
        SELECT c_custkey, o_orderkey, total_qty
        FROM totals
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        ORDER BY total_qty DESC, o_orderkey
        LIMIT 10
    """,
    doc=(
        "TPC-H Q18-shaped large-volume orders: orders whose total lineitem "
        "quantity exceeds a threshold, joined back to their customers, "
        "top-10 by volume. The grouped HAVING sub-aggregate (exact "
        "fixed-point quantity sum) shrinks the fact to a sliver BEFORE any "
        "join — at 100 TB the early reduction is the whole game; the final "
        "top-k is TakeOrderedAndProject."
    ),
    tags=("completeness", "join", "agg"),
)
def q_big_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer", assert_schema=False)
    orders = load_table(spark, sf_dir, "orders", assert_schema=False)
    li = load_table(spark, sf_dir, "lineitem", assert_schema=False)
    totals = (
        li.groupBy("l_orderkey")
        .agg(dsum(F.col("l_quantity"), 2).alias("total_qty"))
        .filter(F.col("total_qty") > 150)
    )
    return (
        totals.join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(customer), F.col("c_custkey") == F.col("o_custkey"))
        .select("c_custkey", "o_orderkey", "total_qty")
        .orderBy(F.desc("total_qty"), F.asc("o_orderkey"))
        .limit(10)
    )


@register(
    "q_dormant_rich",
    oracle=f"""
        WITH threshold AS (
            SELECT ({dsum_sql('c_acctbal', 2)} / COUNT(*)) AS avg_bal
            FROM customer WHERE c_acctbal > 0
        )
        SELECT c_nationkey,
               COUNT(*) AS n_custs,
               {dsum_sql('c_acctbal', 2)} AS total_bal
        FROM customer
        WHERE c_acctbal > (SELECT avg_bal FROM threshold)
          AND NOT EXISTS (
              SELECT 1 FROM orders
              WHERE o_custkey = c_custkey AND o_orderstatus = 'P'
          )
        GROUP BY c_nationkey
    """,
    doc=(
        "TPC-H Q22-shaped dormant-accounts report: customers whose balance "
        "beats the global positive-balance average but who have no pending "
        "orders, rolled up per nation. Exercises a scalar subquery (the "
        "global average, an exact fixed-point mean broadcast as one row) "
        "AND an anti join (NOT EXISTS -> LeftAnti on custkey with the "
        "status filter pushed below it) in a single plan."
    ),
    tags=("completeness", "join", "subquery"),
)
def q_dormant_rich(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer", assert_schema=False)
    orders = load_table(spark, sf_dir, "orders", assert_schema=False)
    positive = customer.filter(F.col("c_acctbal") > 0)
    threshold = positive.agg(
        (dsum(F.col("c_acctbal"), 2) / F.count(F.lit(1))).alias("avg_bal")
    )
    pending = orders.filter(F.col("o_orderstatus") == "P").select("o_custkey")
    return (
        customer.crossJoin(F.broadcast(threshold))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(pending, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_custs"),
            dsum(F.col("c_acctbal"), 2).alias("total_bal"),
        )
    )
