"""Invariants for the deep TPC-H shapes added late in round 5
(Q6 / Q12 / Q21 analogues) beyond the oracle gate: plan properties a
100 TB run depends on, plus an independent reformulation check for the
sole-blame (Q21) semi/anti pair."""

from pyspark.sql import functions as F

from benchmark_spark.catalog import load_table
from benchmark_spark.operators.tpch_extra import (
    q_forecast_revenue,
    q_shipmode,
    q_waiting_suppliers,
)
from benchmark_spark.plans.inspect import (
    count_exchanges,
    formatted_plan,
    pushed_filters,
    read_schema,
)
from tests.conftest import SF_SMOKE


def test_forecast_revenue_is_scan_plus_scalar_agg(spark):
    df = q_forecast_revenue(spark, SF_SMOKE)
    plan = formatted_plan(df)
    assert "Join" not in plan
    # all three predicates reach the parquet scan
    pf = pushed_filters(df)
    assert "l_shipdate" in pf and "l_discount" in pf and "l_quantity" in pf
    # column pruning: only the 4 referenced columns are read
    rs = read_schema(df)
    assert "l_extendedprice" in rs and "l_orderkey" not in rs
    # partial/final scalar agg -> exactly one single-row exchange
    assert count_exchanges(df) == 1


def test_shipmode_counts_partition_the_join(spark):
    rows = q_shipmode(spark, SF_SMOKE).collect()
    assert [r["linestatus"] for r in rows] == ["F", "O"]
    li = load_table(spark, SF_SMOKE, "lineitem", assert_schema=False)
    lo = F.lit("1997-01-01 00:00:00").cast("timestamp")
    hi = F.lit("1998-01-01 00:00:00").cast("timestamp")
    n = li.filter((F.col("l_shipdate") >= lo) & (F.col("l_shipdate") < hi)).count()
    # every joined line is exactly one of high/low (orphan-free FKs)
    assert sum(r["high_line_count"] + r["low_line_count"] for r in rows) == n


def test_waiting_suppliers_matches_aggregate_reformulation(spark):
    """Recompute Q21 without semi/anti joins: per finished order, the
    set of suppliers and the set of returned-line suppliers; an order
    blames supplier s iff it has >1 suppliers and s is its only
    returned-line supplier. Must agree with the semi+anti plan."""
    li = load_table(spark, SF_SMOKE, "lineitem", assert_schema=False)
    orders = load_table(spark, SF_SMOKE, "orders", assert_schema=False)
    supplier = load_table(spark, SF_SMOKE, "supplier", assert_schema=False)
    per_order = (
        li.join(
            orders.filter(F.col("o_orderstatus") == "F").select("o_orderkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("l_orderkey")
        .agg(
            F.countDistinct("l_suppkey").alias("n_supp"),
            F.countDistinct(
                F.when(F.col("l_returnflag") == "R", F.col("l_suppkey"))
            ).alias("n_ret_supp"),
            F.max(
                F.when(F.col("l_returnflag") == "R", F.col("l_suppkey"))
            ).alias("ret_supp"),
        )
    )
    blamed = (
        per_order.filter((F.col("n_supp") > 1) & (F.col("n_ret_supp") == 1))
        .join(
            F.broadcast(supplier.select("s_suppkey", "s_name")),
            F.col("ret_supp") == F.col("s_suppkey"),
        )
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(10)
    )
    # NOTE: the reformulation counts (order, supplier) blames once per
    # ORDER; the registered query counts once per returned LINE of the
    # blamed supplier. Compare on the per-line definition by expanding.
    got = {(r["s_name"], r["numwait"]) for r in q_waiting_suppliers(spark, SF_SMOKE).collect()}
    per_line = (
        per_order.filter((F.col("n_supp") > 1) & (F.col("n_ret_supp") == 1))
        .join(
            li.filter(F.col("l_returnflag") == "R").select(
                F.col("l_orderkey").alias("lk"), F.col("l_suppkey").alias("sk")
            ),
            (F.col("l_orderkey") == F.col("lk")) & (F.col("ret_supp") == F.col("sk")),
        )
        .join(
            F.broadcast(supplier.select("s_suppkey", "s_name")),
            F.col("sk") == F.col("s_suppkey"),
        )
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(10)
    )
    want = {(r["s_name"], r["numwait"]) for r in per_line.collect()}
    assert got == want
    assert blamed.count() > 0  # the scenario is non-degenerate at sf0.001


def test_waiting_suppliers_broadcasts_supplier_at_scale(spark):
    """At sf0.001 Catalyst rightly broadcasts every side. The 100 TB
    property is different: with auto-broadcast off (big-table stand-in),
    the three lineitem legs become shuffle joins keyed on l_orderkey
    while the explicit F.broadcast(supplier) hint still broadcasts."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        plan = formatted_plan(q_waiting_suppliers(spark, SF_SMOKE))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert "SortMergeJoin LeftSemi" in plan or "ShuffledHashJoin LeftSemi" in plan
    assert "SortMergeJoin LeftAnti" in plan or "ShuffledHashJoin LeftAnti" in plan
    # the hinted dim join survives as a broadcast even with the threshold off
    assert "BroadcastHashJoin" in plan


def test_basket_lift_pairs_are_canonical_and_supported(spark):
    from benchmark_spark.operators.tpch_extra import q_basket_lift

    rows = q_basket_lift(spark, SF_SMOKE).collect()
    assert rows
    assert all(r["pa"] < r["pb"] for r in rows)  # each pair once
    assert all(r["support"] >= 3 for r in rows)
    assert all(r["lift_bp"] > 0 for r in rows)
    # sorted by lift desc with deterministic tiebreak
    lifts = [r["lift_bp"] for r in rows]
    assert lifts == sorted(lifts, reverse=True)


def test_trend_fit_covers_the_full_fixture_month(spark):
    from benchmark_spark.operators.tpch_extra import q_trend_fit

    rows = q_trend_fit(spark, SF_SMOKE).collect()
    assert {r["event_type"] for r in rows} == {
        "click", "view", "purchase", "signup", "error"
    }
    # the fixture spans ~30 days; every type is active most days
    assert all(25 <= r["n_days"] <= 31 for r in rows)
    assert all(r["slope_cents_per_day"] is not None for r in rows)
