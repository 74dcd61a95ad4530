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


@register(
    "q_nation_volume",
    oracle=f"""
        SELECT supp_nation, cust_nation, l_year,
               {dsum_sql("volume")} AS revenue
        FROM (
            SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                   CAST(year(l_shipdate) AS BIGINT) AS l_year,
                   l_extendedprice * (1 - l_discount) AS volume
            FROM lineitem
            JOIN supplier ON s_suppkey = l_suppkey
            JOIN orders   ON o_orderkey = l_orderkey
            JOIN customer ON c_custkey = o_custkey
            JOIN nation n1 ON s_nationkey = n1.n_nationkey
            JOIN nation n2 ON c_nationkey = n2.n_nationkey
            WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
                OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
              AND l_shipdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
                                 AND TIMESTAMP '1997-12-31 00:00:00'
        )
        GROUP BY supp_nation, cust_nation, l_year
    """,
    doc=(
        "TPC-H Q7-shaped bilateral trade volume: revenue shipped between two "
        "named nations in either direction, per (supplier nation, customer "
        "nation, ship year). Five-way star join where BOTH dim chains end in "
        "the same `nation` table aliased twice — the aliasing/self-dim shape "
        "Q7 exists to exercise. Catalyst broadcasts every dim (supplier, "
        "customer, nation x2), so the fact shuffles once for the final "
        "3-key agg; the symmetric nation filter prunes before the agg. "
        "Money volume via exact fixed-point dsum."
    ),
    tags=("completeness", "join", "agg"),
)
def q_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem", assert_schema=False)
    supplier = load_table(spark, sf_dir, "supplier", assert_schema=False)
    orders = load_table(spark, sf_dir, "orders", assert_schema=False)
    customer = load_table(spark, sf_dir, "customer", assert_schema=False)
    nation = load_table(spark, sf_dir, "nation", assert_schema=False)
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    lo = F.lit("1996-01-01 00:00:00").cast("timestamp")
    hi = F.lit("1997-12-31 00:00:00").cast("timestamp")
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        li.filter(F.col("l_shipdate").between(lo, hi))
        .join(F.broadcast(supplier), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(orders), F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(customer), F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
    )


@register(
    "q_mkt_share",
    oracle=f"""
        SELECT o_year,
               {rnd_sql(
                   dsum_sql("CASE WHEN supp_nation = 'NATION_1' THEN volume ELSE 0 END")
                   + " / " + dsum_sql("volume"), 6)} AS mkt_share
        FROM (
            SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
                   l_extendedprice * (1 - l_discount) AS volume,
                   n2.n_name AS supp_nation
            FROM lineitem
            JOIN part     ON p_partkey = l_partkey
            JOIN supplier ON s_suppkey = l_suppkey
            JOIN orders   ON o_orderkey = l_orderkey
            JOIN customer ON c_custkey = o_custkey
            JOIN nation n1 ON c_nationkey = n1.n_nationkey
            JOIN region    ON n1.n_regionkey = r_regionkey
            JOIN nation n2 ON s_nationkey = n2.n_nationkey
            WHERE r_name = 'ASIA' AND p_type = 'STANDARD'
        )
        GROUP BY o_year
    """,
    doc=(
        "TPC-H Q8-shaped market share: of all STANDARD-part revenue sold into "
        "ASIA-region customers, the fraction supplied by NATION_1, per order "
        "year — the deepest star join in the registry (lineitem x part x "
        "supplier x orders x customer x nation x2 x region, 7 joins). Every "
        "dim broadcasts; the conditional-sum ratio needs no self-join; both "
        "sub-sums are exact fixed-point BIGINTs, floor-snapped at 6dp."
    ),
    tags=("completeness", "join", "agg"),
)
def q_mkt_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem", assert_schema=False)
    part = load_table(spark, sf_dir, "part", assert_schema=False)
    supplier = load_table(spark, sf_dir, "supplier", assert_schema=False)
    orders = load_table(spark, sf_dir, "orders", assert_schema=False)
    customer = load_table(spark, sf_dir, "customer", assert_schema=False)
    nation = load_table(spark, sf_dir, "nation", assert_schema=False)
    region = load_table(spark, sf_dir, "region", assert_schema=False)
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation")
    )
    volume = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    nation_vol = F.when(F.col("supp_nation") == "NATION_1", volume).otherwise(F.lit(0.0))
    return (
        li.join(F.broadcast(part.filter(F.col("p_type") == "STANDARD")),
                F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(supplier), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(orders), F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(customer), F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        .join(
            F.broadcast(region.filter(F.col("r_name") == "ASIA")),
            F.col("n1_region") == F.col("r_regionkey"),
        )
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
        .groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(rnd(dsum(nation_vol) / dsum(volume), 6).alias("mkt_share"))
    )


@register(
    "q_brand_revenue",
    oracle=f"""
        SELECT {dsum_sql("l_extendedprice * (1 - l_discount)")} AS revenue,
               CAST(COUNT(*) AS BIGINT) AS n_lines
        FROM lineitem
        JOIN part ON p_partkey = l_partkey
        WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
               AND l_quantity BETWEEN 1 AND 11)
           OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 30
               AND l_quantity BETWEEN 10 AND 20)
           OR (p_brand = 'Brand#14' AND p_size BETWEEN 1 AND 50
               AND l_quantity BETWEEN 20 AND 30)
    """,
    doc=(
        "TPC-H Q19-shaped disjunctive join filter: three (brand, size, "
        "quantity) predicate arms OR-ed across BOTH join sides — the shape "
        "that breaks naive pushdown (no single conjunct applies to either "
        "table alone). Catalyst still extracts the per-table implied "
        "disjunctions (brand/size to the part scan, quantity to the fact "
        "scan) before the broadcast join, so the join sees pre-filtered "
        "inputs; the residual OR evaluates post-join. One scalar row out: "
        "exact fixed-point revenue + match count."
    ),
    tags=("completeness", "join", "filter"),
)
def q_brand_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem", assert_schema=False)
    part = load_table(spark, sf_dir, "part", assert_schema=False)
    arm = lambda brand, smax, qlo, qhi: (  # noqa: E731
        (F.col("p_brand") == brand)
        & F.col("p_size").between(1, smax)
        & F.col("l_quantity").between(qlo, qhi)
    )
    cond = arm("Brand#12", 15, 1, 11) | arm("Brand#23", 30, 10, 20) | arm(
        "Brand#14", 50, 20, 30
    )
    return (
        li.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .filter(cond)
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@register(
    "q_forecast_revenue",
    oracle=f"""
        SELECT {dsum_sql("l_extendedprice * l_discount")} AS revenue_delta,
               CAST(COUNT(*) AS BIGINT) AS n_lines
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
          AND l_discount BETWEEN 0.05 AND 0.07
          AND l_quantity < 24
    """,
    doc=(
        "TPC-H Q6-shaped forecast-revenue-change: a pure predicate scan + "
        "scalar aggregate with zero joins — the canonical 'how fast can the "
        "engine chew a filtered fact table' probe. All three predicates push "
        "to the parquet scan (date min/max row-group skip, double range, "
        "quantity bound), the aggregate is a single partial/final pair over "
        "one column product, and the plan has exactly one exchange of one "
        "row. Discount literals compare bit-identically across engines "
        "because both read the same parquet doubles. At 100 TB this is "
        "bandwidth-bound by design: no shuffle, no join, nothing to tune "
        "but the scan."
    ),
    tags=("completeness", "scan", "agg"),
)
def q_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem", assert_schema=False)
    lo = F.lit("1996-01-01 00:00:00").cast("timestamp")
    hi = F.lit("1997-01-01 00:00:00").cast("timestamp")
    return (
        li.filter(
            (F.col("l_shipdate") >= lo)
            & (F.col("l_shipdate") < hi)
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            dsum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue_delta"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@register(
    "q_shipmode",
    oracle="""
        SELECT l_linestatus AS linestatus,
               CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                             THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
               CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                             THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        FROM orders
        JOIN lineitem ON o_orderkey = l_orderkey
        WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY l_linestatus
        ORDER BY l_linestatus
    """,
    doc=(
        "TPC-H Q12-shaped priority-by-line-status rollup (l_linestatus "
        "stands in for l_shipmode, which this schema lacks): a fact-fact "
        "equi-join where the date filter prunes the lineitem side BEFORE "
        "the shuffle, then two conditional counts per group. The interesting "
        "plan property is that both conditional sums evaluate in one "
        "aggregate pass (no self-join, no two-scan union); counts are exact "
        "BIGINTs so the hash is float-free. At scale both sides shuffle on "
        "orderkey — the bucketed-layout variant (sources/readers.py) removes "
        "even that."
    ),
    tags=("completeness", "join", "agg"),
)
def q_shipmode(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem", assert_schema=False)
    orders = load_table(spark, sf_dir, "orders", assert_schema=False)
    lo = F.lit("1997-01-01 00:00:00").cast("timestamp")
    hi = F.lit("1998-01-01 00:00:00").cast("timestamp")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        orders.join(
            li.filter((F.col("l_shipdate") >= lo) & (F.col("l_shipdate") < hi)),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .groupBy(F.col("l_linestatus").alias("linestatus"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("linestatus")
    )


@register(
    "q_waiting_suppliers",
    oracle="""
        SELECT s_name,
               CAST(COUNT(*) AS BIGINT) AS numwait
        FROM supplier
        JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
        JOIN orders     ON o_orderkey = l1.l_orderkey
        WHERE o_orderstatus = 'F'
          AND l1.l_returnflag = 'R'
          AND EXISTS (
              SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (
              SELECT 1 FROM lineitem l3
              WHERE l3.l_orderkey = l1.l_orderkey
                AND l3.l_suppkey <> l1.l_suppkey
                AND l3.l_returnflag = 'R')
        GROUP BY s_name
        ORDER BY numwait DESC, s_name
        LIMIT 10
    """,
    doc=(
        "TPC-H Q21-shaped sole-blame analysis (returnflag 'R' stands in for "
        "receipt-after-commit lateness, absent from this schema): suppliers "
        "who were the ONLY supplier with a returned line in a finished "
        "multi-supplier order. Exercises the hardest decorrelation pair in "
        "the TPC-H suite — a correlated EXISTS (left semi with an inequality "
        "conjunct) plus a correlated NOT EXISTS (left anti, extra filter on "
        "the inner side) against the same fact table. Both self-joins key on "
        "l_orderkey, so at scale the three lineitem shuffles share one "
        "partitioning (AQE reuses the exchange); supplier is broadcast; the "
        "top-10 is TakeOrderedAndProject with s_name as the deterministic "
        "tiebreak."
    ),
    tags=("completeness", "join", "subquery"),
)
def q_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem", assert_schema=False)
    orders = load_table(spark, sf_dir, "orders", assert_schema=False)
    supplier = load_table(spark, sf_dir, "supplier", assert_schema=False)
    l1 = li.filter(F.col("l_returnflag") == "R").select(
        "l_orderkey", "l_suppkey"
    )
    l2 = li.select(
        F.col("l_orderkey").alias("o2"), F.col("l_suppkey").alias("s2")
    )
    l3 = li.filter(F.col("l_returnflag") == "R").select(
        F.col("l_orderkey").alias("o3"), F.col("l_suppkey").alias("s3")
    )
    waiting = (
        l1.join(
            l2,
            (F.col("l_orderkey") == F.col("o2")) & (F.col("l_suppkey") != F.col("s2")),
            "left_semi",
        )
        .join(
            l3,
            (F.col("l_orderkey") == F.col("o3")) & (F.col("l_suppkey") != F.col("s3")),
            "left_anti",
        )
        .join(
            orders.filter(F.col("o_orderstatus") == "F").select("o_orderkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
    )
    return (
        waiting.join(
            F.broadcast(supplier.select("s_suppkey", "s_name")),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(10)
    )


@register(
    "q_basket_lift",
    oracle="""
        WITH baskets AS (
            SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem
        ), totals AS (
            SELECT COUNT(DISTINCT ok) AS n_orders FROM baskets
        ), item AS (
            SELECT pk, COUNT(*) AS n_item FROM baskets GROUP BY pk
        ), pair AS (
            SELECT a.pk AS pa, b.pk AS pb, COUNT(*) AS n_pair
            FROM baskets a JOIN baskets b
              ON a.ok = b.ok AND a.pk < b.pk
            GROUP BY a.pk, b.pk
        )
        SELECT pa, pb,
               CAST(n_pair AS BIGINT) AS support,
               CAST((n_pair * n_orders * 10000)
                    // (ia.n_item * ib.n_item) AS BIGINT) AS lift_bp
        FROM pair
        JOIN item ia ON ia.pk = pa
        JOIN item ib ON ib.pk = pb
        CROSS JOIN totals
        WHERE n_pair >= 3
        ORDER BY lift_bp DESC, pa, pb
        LIMIT 20
    """,
    doc=(
        "Market-basket co-occurrence lift (the association-rules shape): "
        "for every part pair ordered together in >= 3 baskets, lift = "
        "P(a,b) / (P(a) P(b)) in exact integer basis points — > 10000 "
        "means the pair co-occurs more than independence predicts. Pairs "
        "are generated IN-ARRAY per basket (one shuffle groups each "
        "order's parts, a sorted-array HOF emits each unordered pair "
        "once) — no self-join, candidate rows are sum(basket_size^2)/2, "
        "never items^2; item counts broadcast onto the pair table. At "
        "100 TB the classic refinement "
        "is frequent-item pruning first (drop items under min support "
        "before pairing — the A-priori step); basket skew (one giant "
        "order) is the quadratic risk and is bounded here by the order "
        "model, or capped by a basket-size limit in production."
    ),
    tags=("completeness", "agg", "join"),
)
def q_basket_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem", assert_schema=False)
    baskets = li.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk")
    ).distinct()
    n_orders = baskets.select("ok").distinct().agg(
        F.count(F.lit(1)).alias("n_orders")
    )
    item = baskets.groupBy("pk").agg(F.count(F.lit(1)).alias("n_item"))
    # pairs generated IN-ARRAY per basket (no self-join): one shuffle
    # groups each order's parts, then the sorted-array HOF emits each
    # unordered pair once — sum(basket_size^2)/2 rows map-side, which
    # is the shape that survives 100 TB (the self-join alternative
    # shuffles the basket table twice more)
    parts_arr = baskets.groupBy("ok").agg(
        F.array_sort(F.collect_set("pk")).alias("ps")
    )
    pair = (
        parts_arr.select(
            F.explode(
                F.expr(
                    "flatten(transform(ps, (x, i) -> "
                    "transform(slice(ps, i + 2, size(ps)), y -> "
                    "struct(x AS pa, y AS pb))))"
                )
            ).alias("p")
        )
        .select("p.pa", "p.pb")
        .groupBy("pa", "pb")
        .agg(F.count(F.lit(1)).alias("n_pair"))
        .filter(F.col("n_pair") >= 3)
    )
    ia = item.select(F.col("pk").alias("pa"), F.col("n_item").alias("n_a"))
    ib = item.select(F.col("pk").alias("pb"), F.col("n_item").alias("n_b"))
    return (
        pair.join(F.broadcast(ia), "pa")
        .join(F.broadcast(ib), "pb")
        .crossJoin(F.broadcast(n_orders))
        .select(
            "pa",
            "pb",
            F.col("n_pair").cast("long").alias("support"),
            F.expr("(n_pair * n_orders * 10000) div (n_a * n_b)")
            .cast("long")
            .alias("lift_bp"),
        )
        .orderBy(F.desc("lift_bp"), "pa", "pb")
        .limit(20)
    )


@register(
    "q_trend_fit",
    oracle="""
        WITH daily AS (
            SELECT event_type,
                   date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS x,
                   CAST(SUM(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS y
            FROM events
            GROUP BY event_type, date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))
        )
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n_days,
               (floor((CAST(COUNT(*) * SUM(x * y) - SUM(x) * SUM(y) AS DOUBLE)
                      / CAST(nullif(COUNT(*) * SUM(x * x) - SUM(x) * SUM(x), 0)
                             AS DOUBLE))
                      * 10000 + 0.5) / 10000) AS slope_cents_per_day
        FROM daily
        GROUP BY event_type
        ORDER BY event_type
    """,
    doc=(
        "Per-group time-series trend fit: OLS slope of daily revenue "
        "(exact integer cents) against the day index, per event type — "
        "the 'is this metric growing?' query every operations dashboard "
        "runs. Two-phase: the daily rollup is one shuffle on (type, "
        "day); the five OLS sums (n, Σx, Σy, Σxy, Σx²) are then plain "
        "integer aggregates per type, so the slope numerator/denominator "
        "are EXACT BIGINTs and the final single division of two exact "
        "integers is IEEE-identical across engines (snapped floor-form "
        "4dp). Same fixed-point-OLS trick as q_zipf_slope, pointed at "
        "the time domain. At 100 TB the daily table is O(groups x days) "
        "— thousands of rows from trillions — so the fit itself is free."
    ),
    tags=("completeness", "agg"),
)
def q_trend_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events", assert_schema=False)
    daily = (
        events.groupBy(
            "event_type",
            F.datediff(F.col("ts").cast("date"), F.lit("2024-01-01").cast("date"))
            .alias("x"),
        )
        .agg(
            F.sum(F.round(F.col("value") * 100, 0).cast("long")).alias("y")
        )
    )
    n = F.count(F.lit(1))
    sx = F.sum("x")
    sy = F.sum("y")
    sxy = F.sum(F.col("x") * F.col("y"))
    sxx = F.sum(F.col("x") * F.col("x"))
    # nullif-guarded denominator (ADVICE.md r5): a group with a single
    # active day has n*Σx² - (Σx)² = 0, and NaN/Inf render differently
    # between Spark and DuckDB — both engines now emit NULL instead.
    slope = (n * sxy - sx * sy).cast("double") / F.nullif(
        n * sxx - sx * sx, F.lit(0)
    ).cast("double")
    return (
        daily.groupBy("event_type")
        .agg(
            n.cast("long").alias("n_days"),
            (F.floor(slope * 10000 + F.lit(0.5)) / 10000).alias(
                "slope_cents_per_day"
            ),
        )
        .orderBy("event_type")
    )
