"""Join operators — Query-3 family + join completeness.

Reference semantics (SURVEY.md §2.0 Query 3 [P]): an equi inner join
of a big fact (uservisits) to a smaller relation (rankings) with a
date-range filter, grouped aggregation, and ORDER BY ... LIMIT 1.
Our flagship analogue joins `lineitem` to `orders`.

Scale posture (SURVEY.md §4):
  * dimension joins (region/nation/customer/supplier/part) are
    broadcast — verified in tests/test_plans.py; at 100 TB the dims
    stay far under `spark.sql.autoBroadcastJoinThreshold` so the
    fact side never shuffles for them;
  * fact-fact joins (lineitem ⋈ orders) are sort-merge/shuffled-hash
    on the join key — at cluster scale both sides would be bucketed
    by orderkey at write time to make this shuffle-free; AQE handles
    skewed keys by splitting oversized partitions;
  * ORDER BY ... LIMIT k compiles to TakeOrderedAndProject (per-
    partition top-k + driver merge), never a global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from benchmark_spark.catalog import load_table
from benchmark_spark.operators.aggregates import dsum, dsum_sql
from benchmark_spark.registry import register


@register(
    "q3_join",
    oracle="""
        SELECT o_custkey,
               (CAST(SUM(CAST(round((l_extendedprice * (1 - l_discount)) * 10000, 0) AS BIGINT)) AS DOUBLE) / 10000) AS total_rev,
               (CAST(SUM(CAST(round((l_quantity) * 10000, 0) AS BIGINT)) AS DOUBLE) / 10000) / COUNT(*) AS avg_qty
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE o_orderdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
                              AND TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY o_custkey
        ORDER BY total_rev DESC, o_custkey
        LIMIT 1
    """,
    doc="Query-3 analogue (flagship): join + range filter + agg + top-1 (SURVEY.md §2.3 [Q:q3_join]).",
    tags=("reference", "join"),
)
def q3_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem", assert_schema=False)
    orders = load_table(spark, sf_dir, "orders", assert_schema=False)
    filtered = orders.filter(
        F.col("o_orderdate").between(
            F.lit("1996-01-01 00:00:00").cast("timestamp"),
            F.lit("1997-01-01 00:00:00").cast("timestamp"),
        )
    )
    return (
        li.join(filtered, li.l_orderkey == filtered.o_orderkey)
        .groupBy("o_custkey")
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("total_rev"),
            (dsum(F.col("l_quantity")) / F.count(F.lit(1))).alias("avg_qty"),
        )
        .orderBy(F.desc("total_rev"), F.asc("o_custkey"))
        .limit(1)
    )


@register(
    "q3_join_wide",
    oracle="""
        SELECT o_custkey,
               (CAST(SUM(CAST(round((l_extendedprice * (1 - l_discount)) * 10000, 0) AS BIGINT)) AS DOUBLE) / 10000) AS total_rev,
               (CAST(SUM(CAST(round((l_quantity) * 10000, 0) AS BIGINT)) AS DOUBLE) / 10000) / COUNT(*) AS avg_qty
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE o_orderdate BETWEEN TIMESTAMP '1995-01-01 00:00:00'
                              AND TIMESTAMP '2001-01-01 00:00:00'
        GROUP BY o_custkey
        ORDER BY total_rev DESC, o_custkey
        LIMIT 10
    """,
    doc="Query-3 wide-range variant (3c-style: join touches nearly all rows), top-10.",
    tags=("reference", "join"),
)
def q3_join_wide(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem", assert_schema=False)
    orders = load_table(spark, sf_dir, "orders", assert_schema=False)
    filtered = orders.filter(
        F.col("o_orderdate").between(
            F.lit("1995-01-01 00:00:00").cast("timestamp"),
            F.lit("2001-01-01 00:00:00").cast("timestamp"),
        )
    )
    return (
        li.join(filtered, li.l_orderkey == filtered.o_orderkey)
        .groupBy("o_custkey")
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("total_rev"),
            (dsum(F.col("l_quantity")) / F.count(F.lit(1))).alias("avg_qty"),
        )
        .orderBy(F.desc("total_rev"), F.asc("o_custkey"))
        .limit(10)
    )


@register(
    "q_join_multi",
    oracle="""
        SELECT n_name,
               (CAST(SUM(CAST(round((l_extendedprice * (1 - l_discount)) * 10000, 0) AS BIGINT)) AS DOUBLE) / 10000) AS revenue
        FROM lineitem
        JOIN orders   ON l_orderkey  = o_orderkey
        JOIN customer ON o_custkey   = c_custkey
        JOIN supplier ON l_suppkey   = s_suppkey
        JOIN nation   ON s_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
          AND c_nationkey = s_nationkey
          AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY n_name
    """,
    doc=(
        "Multi-way star join (TPC-H Q5-shaped): fact ⋈ fact ⋈ 4 dims with a region "
        "filter; exercises Catalyst/AQE join ordering and broadcast of every dim "
        "(SURVEY.md §2.3 [Q:q_join_multi])."
    ),
    tags=("completeness", "join"),
)
def q_join_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem", assert_schema=False)
    orders = load_table(spark, sf_dir, "orders", assert_schema=False)
    customer = load_table(spark, sf_dir, "customer", assert_schema=False)
    supplier = load_table(spark, sf_dir, "supplier", assert_schema=False)
    nation = load_table(spark, sf_dir, "nation", assert_schema=False)
    region = load_table(spark, sf_dir, "region", assert_schema=False)
    return (
        li.join(
            orders.filter(
                (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
                & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
            ),
            li.l_orderkey == F.col("o_orderkey"),
        )
        .join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(supplier), li.l_suppkey == F.col("s_suppkey"))
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(
            F.broadcast(region.filter(F.col("r_name") == "ASIA")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .groupBy("n_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
    )


@register(
    "q_broadcast_join",
    oracle="""
        SELECT p_brand,
               COUNT(*) AS n_items,
               round(SUM(l_quantity), 2) AS qty
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE p_type = 'PROMO'
        GROUP BY p_brand
    """,
    doc="Explicit broadcast dim join (map-side join of the small side, SURVEY.md §2.3/§4); no shuffle of lineitem for the join.",
    tags=("completeness", "join"),
)
def q_broadcast_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem", assert_schema=False)
    part = load_table(spark, sf_dir, "part", assert_schema=False)
    return (
        li.join(
            F.broadcast(part.filter(F.col("p_type") == "PROMO")),
            li.l_partkey == F.col("p_partkey"),
        )
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.round(F.sum("l_quantity"), 2).alias("qty"),
        )
    )


@register(
    "q_semi",
    oracle="""
        SELECT c_custkey, c_name
        FROM customer
        WHERE EXISTS (
            SELECT 1 FROM orders
            WHERE o_custkey = c_custkey
              AND o_orderstatus = 'F'
              AND o_totalprice > 400000
        )
    """,
    doc="Left semi join: customers having >=1 qualifying order (SURVEY.md §2.3 [Q:q_semi]).",
    tags=("completeness", "join"),
)
def q_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer", assert_schema=False)
    orders = load_table(spark, sf_dir, "orders", assert_schema=False)
    qualifying = orders.filter(
        (F.col("o_orderstatus") == "F") & (F.col("o_totalprice") > 400000)
    )
    return customer.join(
        qualifying, customer.c_custkey == qualifying.o_custkey, "left_semi"
    ).select("c_custkey", "c_name")


@register(
    "q_anti",
    oracle="""
        SELECT p_partkey, p_brand
        FROM part
        WHERE NOT EXISTS (
            SELECT 1 FROM lineitem
            WHERE l_partkey = p_partkey AND l_quantity > 45
        )
    """,
    doc="Left anti join: parts never ordered in bulk (FKs are orphan-free, so the predicate creates the misses — FIXTURES.md).",
    tags=("completeness", "join"),
)
def q_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part", assert_schema=False)
    li = load_table(spark, sf_dir, "lineitem", assert_schema=False)
    bulk = li.filter(F.col("l_quantity") > 45)
    return part.join(bulk, part.p_partkey == bulk.l_partkey, "left_anti").select(
        "p_partkey", "p_brand"
    )


@register(
    "q_outer",
    oracle="""
        SELECT c_custkey,
               COUNT(o_orderkey) AS n_big,
               round(COALESCE(SUM(o_totalprice), 0), 2) AS big_rev
        FROM customer
        LEFT JOIN (SELECT * FROM orders WHERE o_totalprice > 490000) big
          ON c_custkey = o_custkey
        GROUP BY c_custkey
    """,
    doc="Left outer join + null-aware COUNT/SUM: most customers have no qualifying order, so the right side is NULL.",
    tags=("completeness", "join"),
)
def q_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer", assert_schema=False)
    orders = load_table(spark, sf_dir, "orders", assert_schema=False)
    big = orders.filter(F.col("o_totalprice") > 490000)
    return (
        customer.join(big, customer.c_custkey == big.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_big"),
            F.round(F.coalesce(F.sum("o_totalprice"), F.lit(0.0)), 2).alias("big_rev"),
        )
    )


@register(
    "q_full_outer",
    oracle="""
        SELECT COALESCE(a.n_nationkey, b.n_nationkey) AS k,
               a.n_name AS name_lo,
               b.n_name AS name_hi
        FROM (SELECT * FROM nation WHERE n_nationkey < 15) a
        FULL JOIN (SELECT * FROM nation WHERE n_nationkey >= 10) b
          ON a.n_nationkey = b.n_nationkey
    """,
    doc="Full outer join with NULLs on both sides (key ranges overlap only on [10,15)).",
    tags=("completeness", "join"),
)
def q_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = load_table(spark, sf_dir, "nation", assert_schema=False)
    a = nation.filter(F.col("n_nationkey") < 15).alias("a")
    b = nation.filter(F.col("n_nationkey") >= 10).alias("b")
    return a.join(b, F.col("a.n_nationkey") == F.col("b.n_nationkey"), "full").select(
        F.coalesce(F.col("a.n_nationkey"), F.col("b.n_nationkey")).alias("k"),
        F.col("a.n_name").alias("name_lo"),
        F.col("b.n_name").alias("name_hi"),
    )


@register(
    "q_range_join",
    oracle="""
        SELECT a.user_id,
               COUNT(*) AS n_followups
        FROM events a
        JOIN events b
          ON a.user_id = b.user_id
         AND b.ts > a.ts
         AND b.ts <= a.ts + INTERVAL 10 MINUTE
        WHERE a.event_type = 'signup' AND b.event_type = 'purchase'
        GROUP BY a.user_id
    """,
    doc=(
        "Interval/range join: purchases within 10 min after a signup, per user "
        "(SURVEY.md §2.3 theta/range join). Equi-key on user_id keeps it a hash/SMJ "
        "join with a range residual — never a cross product; the streaming twin is a "
        "time-bounded stream-stream join (tests/test_streaming.py)."
    ),
    tags=("extension", "join"),
)
def q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events", assert_schema=False)
    a = events.filter(F.col("event_type") == "signup").alias("a")
    b = events.filter(F.col("event_type") == "purchase").alias("b")
    cond = (
        (F.col("a.user_id") == F.col("b.user_id"))
        & (F.col("b.ts") > F.col("a.ts"))
        & (F.col("b.ts") <= F.col("a.ts") + F.expr("INTERVAL 10 MINUTES"))
    )
    return (
        a.join(b, cond)
        .groupBy(F.col("a.user_id").alias("user_id"))
        .agg(F.count(F.lit(1)).alias("n_followups"))
    )


@register(
    "q_asof",
    oracle="""
        SELECT o_custkey, o_orderkey, o_orderdate
        FROM orders
        WHERE o_orderdate <= TIMESTAMP '1998-01-01 00:00:00'
        QUALIFY row_number() OVER (
            PARTITION BY o_custkey
            ORDER BY o_orderdate DESC, o_orderkey DESC
        ) = 1
    """,
    doc=(
        "As-of join: latest order per customer as of 1998-01-01 (SURVEY.md §2.3). "
        "Spark has no native as-of primitive; expressed as filter + per-key "
        "row_number()=1, which at scale is one shuffle on the partition key."
    ),
    tags=("extension", "join"),
)
def q_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders", assert_schema=False)
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_orderdate"), F.desc("o_orderkey")
    )
    return (
        orders.filter(F.col("o_orderdate") <= F.lit("1998-01-01 00:00:00").cast("timestamp"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("o_custkey", "o_orderkey", "o_orderdate")
    )


@register(
    "q_cross_join",
    oracle="""
        SELECT r1.r_name AS from_region, r2.r_name AS to_region
        FROM region r1 CROSS JOIN region r2
        WHERE r1.r_regionkey <> r2.r_regionkey
    """,
    doc="Cross join (nested-loop) on tiny dims; the basis for brute-force similarity search (SURVEY.md §2.3).",
    tags=("completeness", "join"),
)
def q_cross_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = load_table(spark, sf_dir, "region", assert_schema=False)
    r1 = region.alias("r1")
    r2 = region.alias("r2")
    return (
        r1.crossJoin(r2)
        .filter(F.col("r1.r_regionkey") != F.col("r2.r_regionkey"))
        .select(
            F.col("r1.r_name").alias("from_region"),
            F.col("r2.r_name").alias("to_region"),
        )
    )


@register(
    "q_scalar_subquery",
    oracle="""
        SELECT o_orderkey, o_totalprice
        FROM orders
        WHERE o_totalprice > 1.9 * (SELECT AVG(o_totalprice) FROM orders)
    """,
    doc=(
        "Uncorrelated scalar subquery (the Query-3 subquery shape [P]): filter "
        "against a computed global — one aggregation broadcast into the scan's "
        "filter, not a per-row re-evaluation."
    ),
    tags=("completeness", "join"),
)
def q_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders", assert_schema=False)
    orders.createOrReplaceTempView("orders")
    return spark.sql(
        "SELECT o_orderkey, o_totalprice FROM orders "
        "WHERE o_totalprice > 1.9 * (SELECT AVG(o_totalprice) FROM orders)"
    )


@register(
    "q_corr_subquery",
    oracle="""
        SELECT c_custkey,
               (SELECT MAX(o_totalprice) FROM orders WHERE o_custkey = c_custkey) AS max_price
        FROM customer
    """,
    doc=(
        "Correlated scalar subquery: per-customer max order price. Catalyst "
        "decorrelates it (RewriteCorrelatedScalarSubquery, SURVEY.md §4) into an "
        "aggregate + left outer join — no per-row subquery execution; FKs are "
        "orphan-free so no NULLs appear (FIXTURES.md)."
    ),
    tags=("completeness", "join"),
)
def q_corr_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer", assert_schema=False)
    orders = load_table(spark, sf_dir, "orders", assert_schema=False)
    customer.createOrReplaceTempView("customer")
    orders.createOrReplaceTempView("orders")
    return spark.sql(
        "SELECT c_custkey, "
        "(SELECT MAX(o_totalprice) FROM orders WHERE o_custkey = c_custkey) AS max_price "
        "FROM customer"
    )


@register(
    "q_in_subquery",
    oracle="""
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders
        WHERE o_custkey IN (
            SELECT c_custkey FROM customer WHERE c_mktsegment = 'MACHINERY'
        )
          AND o_orderkey NOT IN (
            SELECT l_orderkey FROM lineitem WHERE l_quantity > 49
        )
    """,
    doc=(
        "IN / NOT IN subqueries: Catalyst plans IN as a left-semi join and "
        "NOT IN as a null-aware left-anti join — the predicate-subquery forms "
        "complementing EXISTS (q_semi) / NOT EXISTS (q_anti). No NULLs in the "
        "fixture keys, so NOT IN's three-valued-logic trap stays inert "
        "(tests/test_scalars.py covers the NULL cases with literals)."
    ),
    tags=("completeness", "join"),
)
def q_in_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders", assert_schema=False)
    customer = load_table(spark, sf_dir, "customer", assert_schema=False)
    li = load_table(spark, sf_dir, "lineitem", assert_schema=False)
    orders.createOrReplaceTempView("orders")
    customer.createOrReplaceTempView("customer")
    li.createOrReplaceTempView("lineitem")
    return spark.sql(
        """
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders
        WHERE o_custkey IN (
            SELECT c_custkey FROM customer WHERE c_mktsegment = 'MACHINERY'
        )
          AND o_orderkey NOT IN (
            SELECT l_orderkey FROM lineitem WHERE l_quantity > 49
        )
        """
    )


@register(
    "q_ship_priority",
    oracle=f"""
        SELECT o_orderkey,
               {dsum_sql('l_extendedprice * (1 - l_discount)')} AS revenue,
               CAST(o_orderdate AS TIMESTAMP) AS o_orderdate,
               o_orderpriority
        FROM customer
        JOIN orders   ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
          AND l_shipdate  > TIMESTAMP '1998-03-15 00:00:00'
        GROUP BY o_orderkey, o_orderdate, o_orderpriority
        ORDER BY revenue DESC, o_orderkey
        LIMIT 10
    """,
    doc=(
        "TPC-H Q3-shaped shipping-priority report: segment-filtered customers "
        "joined through orders into lineitem with opposing date predicates, "
        "top-10 unshipped orders by revenue. Dim (customer) broadcasts; the "
        "fact-fact join carries both date filters pushed to their scans."
    ),
    tags=("completeness", "join"),
)
def q_ship_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer", assert_schema=False)
    orders = load_table(spark, sf_dir, "orders", assert_schema=False)
    li = load_table(spark, sf_dir, "lineitem", assert_schema=False)
    cutoff = F.lit("1998-03-15 00:00:00").cast("timestamp")
    return (
        li.filter(F.col("l_shipdate") > cutoff)
        .join(
            orders.filter(F.col("o_orderdate") < cutoff),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            F.broadcast(customer.filter(F.col("c_mktsegment") == "BUILDING")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .select("o_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
    )


@register(
    "q_returned_items",
    oracle=f"""
        SELECT c_custkey, c_name,
               {dsum_sql('l_extendedprice * (1 - l_discount)')} AS revenue,
               n_name
        FROM customer
        JOIN orders   ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN nation   ON c_nationkey = n_nationkey
        WHERE l_returnflag = 'R'
          AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND o_orderdate <  TIMESTAMP '1997-07-01 00:00:00'
        GROUP BY c_custkey, c_name, n_name
        ORDER BY revenue DESC, c_custkey
        LIMIT 20
    """,
    doc=(
        "TPC-H Q10-shaped returned-items report: customers who returned goods "
        "in a half-year window, ranked by lost revenue, with their nation — "
        "fact-fact join plus two broadcast dims, top-20."
    ),
    tags=("completeness", "join"),
)
def q_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer", assert_schema=False)
    orders = load_table(spark, sf_dir, "orders", assert_schema=False)
    li = load_table(spark, sf_dir, "lineitem", assert_schema=False)
    nation = load_table(spark, sf_dir, "nation", assert_schema=False)
    return (
        li.filter(F.col("l_returnflag") == "R")
        .join(
            orders.filter(
                (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
                & (F.col("o_orderdate") < F.lit("1997-07-01 00:00:00").cast("timestamp"))
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "n_name")
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@register(
    "q_smj_join",
    oracle="""
        SELECT c_mktsegment,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
                   AS price_cents
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_mktsegment
    """,
    doc=(
        "Forced SORT-MERGE join (SURVEY.md §2.3 physical-strategy row): "
        "merge hint + both sides above the broadcast threshold, so the plan "
        "is Exchange+Sort on each side then a streaming merge — the default "
        "fact-fact strategy at 100 TB when neither side fits memory and the "
        "key is unskewed (its spill behavior is sort-based and graceful). "
        "Semantics hash-match the plain join; the plan shape is pinned in "
        "tests/test_plans.py."
    ),
    tags=("completeness", "join"),
)
def q_smj_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders", assert_schema=False)
    cust = load_table(spark, sf_dir, "customer", assert_schema=False)
    return (
        orders.hint("merge")
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long"))
            .cast("long")
            .alias("price_cents"),
        )
    )


@register(
    "q_shj_join",
    oracle="""
        SELECT n_name,
               COUNT(*) AS n_suppliers
        FROM supplier JOIN nation ON s_nationkey = n_nationkey
        GROUP BY n_name
    """,
    doc=(
        "Forced SHUFFLED-HASH join (SURVEY.md §2.3 physical-strategy row): "
        "shuffle_hash hint — both sides exchange on the key, the smaller "
        "builds an in-memory hash table per partition, no sort. The 100 TB "
        "niche: one side is much smaller per key-partition than the other "
        "(cheaper than SMJ's double sort) but still too big to broadcast. "
        "Semantics hash-match the plain join; plan pinned in "
        "tests/test_plans.py."
    ),
    tags=("completeness", "join"),
)
def q_shj_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    supp = load_table(spark, sf_dir, "supplier", assert_schema=False)
    nation = load_table(spark, sf_dir, "nation", assert_schema=False)
    return (
        supp.join(nation.hint("shuffle_hash"), supp.s_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(F.count(F.lit(1)).alias("n_suppliers"))
    )
