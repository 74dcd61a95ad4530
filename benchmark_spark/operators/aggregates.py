"""Aggregation operators — Query-2 family + aggregation completeness.

Reference semantics (SURVEY.md §2.0 Query 2 [P]):
    SELECT SUBSTR(sourceIP,1,X), SUM(adRevenue) FROM uservisits GROUP BY 1
which stresses two-phase (partial -> shuffle -> final) hash
aggregation at up to ~254M groups. Catalyst provides the two-phase
plan automatically (HashAggregate(partial) -> Exchange ->
HashAggregate(final), spilling to sort-based agg under pressure) —
SURVEY.md §4. At 100 TB the knobs are shuffle partition count (AQE
coalesces) and group-key skew (AQE skew handling; map-side partial
agg already collapses hot keys before the shuffle).

Float stability (SURVEY.md §5.2, hardened): rounding alone is NOT
enough when the summed expression carries more decimal digits than
the rounding grid — the exact sum can sit exactly on a half-way
point (e.g. SUM(price*(1-disc)) is an exact 4-decimal value ending
in ...x5, and a 2dp round flips between engines), while rounding at
the term precision collides with double accumulation error. The fix
used throughout: aggregate money expressions as EXACT fixed-point
BIGINT sums (dsum/dsum_sql below) — bit-identical on both engines,
no rounding lottery, and still on the codegen fast path (DECIMAL
aggregation, the other exact option, is ~10x slower in Spark). Sums
whose terms already match the rounding grid (2dp inputs rounded at
2dp) stay plain doubles.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from benchmark_spark.catalog import load_table
from benchmark_spark.registry import register


def dsum(c: Column, scale: int = 4) -> Column:
    """Exact fixed-point sum of a money-precision expression, as double.

    round(x*10^scale) recovers the exact integer the decimal value
    represents (terms carry <= `scale` true decimal digits, so the
    double sits ~1e-9 from the integer — never halfway); the BIGINT
    sum is exact, and the final int->double cast + division is
    IEEE-deterministic, so both engines produce identical doubles.
    Unlike DECIMAL aggregation this stays on the whole-stage-codegen
    fast path (~10x faster in Spark). Overflow headroom: 9.2e18 /
    10^scale units — at 100 TB (≈6e11 rows x 1e5 values, scale 4)
    switch to scale-aware two-level aggregation or DECIMAL(30,6).
    """
    m = 10**scale
    return F.sum(F.round(c * m, 0).cast("long")) / F.lit(float(m))


def dsum_sql(expr: str, scale: int = 4) -> str:
    """DuckDB oracle twin of :func:`dsum` (same exact fixed-point sum)."""
    m = 10**scale
    return f"(CAST(SUM(CAST(round(({expr}) * {m}, 0) AS BIGINT)) AS DOUBLE) / {m})"


def rnd(c: Column, scale: int = 4) -> Column:
    """Tie-deterministic rounding: floor(x*10^k + 0.5)/10^k.

    Spark's round() converts the double to its SHORTEST DECIMAL REPR
    and applies HALF_UP; DuckDB rounds the binary double — they
    disagree whenever a ratio's true value sits exactly on a rounding
    half (e.g. 0.59625 at 4dp, whose double is 0.59624999...). The
    explicit floor formula is evaluated on the same double by both
    engines, so results agree regardless of ties. Use for any rounded
    RATIO of integers (quality scores, rate columns); plain round()
    is fine for values whose decimal precision is below the grid.
    """
    m = float(10**scale)
    return F.floor(c * m + F.lit(0.5)) / F.lit(m)


def rnd_sql(expr: str, scale: int = 4) -> str:
    """DuckDB oracle twin of :func:`rnd`."""
    m = 10**scale
    return f"(floor(({expr}) * {m} + 0.5) / {m})"


@register(
    "q2_agg",
    oracle="""
        SELECT substr(o_orderpriority, 1, 1) AS prio,
               round(SUM(o_totalprice), 2) AS rev
        FROM orders
        GROUP BY substr(o_orderpriority, 1, 1)
    """,
    doc="Query-2 analogue: substring group-by + SUM (SURVEY.md §2.4 [Q:q2_agg]).",
    tags=("reference", "agg"),
)
def q2_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders", assert_schema=False)
    return orders.groupBy(
        F.substring("o_orderpriority", 1, 1).alias("prio")
    ).agg(F.round(F.sum("o_totalprice"), 2).alias("rev"))


@register(
    "q2_agg_wide",
    oracle="""
        SELECT substr(o_orderpriority, 1, 3) AS prio, o_orderstatus,
               round(SUM(o_totalprice), 2) AS rev
        FROM orders
        GROUP BY substr(o_orderpriority, 1, 3), o_orderstatus
    """,
    doc="Query-2 higher-cardinality variant (2b/2c-style: more groups).",
    tags=("reference", "agg"),
)
def q2_agg_wide(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders", assert_schema=False)
    return orders.groupBy(
        F.substring("o_orderpriority", 1, 3).alias("prio"), "o_orderstatus"
    ).agg(F.round(F.sum("o_totalprice"), 2).alias("rev"))


@register(
    "q5_pricing",
    oracle="""
        SELECT l_returnflag, l_linestatus,
               (CAST(SUM(CAST(round((l_quantity) * 10000, 0) AS BIGINT)) AS DOUBLE) / 10000)      AS sum_qty,
               (CAST(SUM(CAST(round((l_extendedprice) * 10000, 0) AS BIGINT)) AS DOUBLE) / 10000) AS sum_base_price,
               (CAST(SUM(CAST(round((l_extendedprice * (1 - l_discount)) * 10000, 0) AS BIGINT)) AS DOUBLE) / 10000) AS sum_disc_price,
               (CAST(SUM(CAST(round((l_extendedprice * (1 - l_discount) * (1 + l_tax)) * 1000000, 0) AS BIGINT)) AS DOUBLE) / 1000000) AS sum_charge,
               (CAST(SUM(CAST(round((l_quantity) * 10000, 0) AS BIGINT)) AS DOUBLE) / 10000) / COUNT(*)      AS avg_qty,
               (CAST(SUM(CAST(round((l_extendedprice) * 10000, 0) AS BIGINT)) AS DOUBLE) / 10000) / COUNT(*) AS avg_price,
               (CAST(SUM(CAST(round((l_discount) * 10000, 0) AS BIGINT)) AS DOUBLE) / 10000) / COUNT(*)      AS avg_disc,
               COUNT(*)                           AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '2000-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
    """,
    doc="TPC-H-Q1-shaped multi-aggregate rollup over lineitem (SURVEY.md §2.4 [Q:q5_pricing]).",
    tags=("completeness", "agg"),
)
def q5_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem", assert_schema=False)
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    n = F.count(F.lit(1))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2000-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum(F.col("l_quantity")).alias("sum_qty"),
            dsum(F.col("l_extendedprice")).alias("sum_base_price"),
            dsum(disc_price).alias("sum_disc_price"),
            dsum(charge, 6).alias("sum_charge"),
            (dsum(F.col("l_quantity")) / n).alias("avg_qty"),
            (dsum(F.col("l_extendedprice")) / n).alias("avg_price"),
            (dsum(F.col("l_discount")) / n).alias("avg_disc"),
            n.alias("count_order"),
        )
    )


@register(
    "q_agg_funcs",
    oracle="""
        SELECT o_orderstatus,
               COUNT(*)          AS n,
               MIN(o_totalprice) AS min_price,
               MAX(o_totalprice) AS max_price,
               (CAST(SUM(CAST(round((o_totalprice) * 10000, 0) AS BIGINT)) AS DOUBLE) / 10000) / COUNT(*) AS avg_price,
               sqrt(((CAST(SUM(CAST(floor(o_totalprice * o_totalprice * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100)
                     - (CAST(SUM(CAST(round((o_totalprice) * 10000, 0) AS BIGINT)) AS DOUBLE) / 10000) * (CAST(SUM(CAST(round((o_totalprice) * 10000, 0) AS BIGINT)) AS DOUBLE) / 10000) / COUNT(*))
                    / (COUNT(*) - 1)) AS sd_price,
               ((CAST(SUM(CAST(floor(o_totalprice * o_totalprice * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100)
                     - (CAST(SUM(CAST(round((o_totalprice) * 10000, 0) AS BIGINT)) AS DOUBLE) / 10000) * (CAST(SUM(CAST(round((o_totalprice) * 10000, 0) AS BIGINT)) AS DOUBLE) / 10000) / COUNT(*))
                    / (COUNT(*) - 1) AS var_price
        FROM orders
        GROUP BY o_orderstatus
    """,
    doc=(
        "Aggregate-function battery: COUNT/MIN/MAX/AVG/STDDEV/VARIANCE "
        "(SURVEY.md §2.4). Variance/stddev use the sum-of-squares identity over "
        "EXACT fixed-point sums in the floor(x*10^k+0.5) form — both engines "
        "floor the IDENTICAL double, so the integer sums match bit-for-bit even "
        "when x*x*100 lands on a rounding half (the earlier DECIMAL(38,6) cast "
        "diverged because Spark and DuckDB round double->decimal differently). "
        "Headroom: max(price^2)*100 ~ 4e13/row -> BIGINT overflows past ~2e5 "
        "rows/group at sf>=10; switch to DECIMAL(38,0) sums there. Built-in "
        "stddev_samp/var_samp are property-tested in tests/test_aggregates.py."
    ),
    tags=("completeness", "agg"),
)
def q_agg_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders", assert_schema=False)
    n = F.count(F.lit(1))
    p = F.col("o_totalprice")
    s1 = dsum(p)
    s2 = F.sum(F.floor(p * p * 100 + F.lit(0.5))) / F.lit(100.0)
    var = (s2 - s1 * s1 / n) / (n - 1)
    return orders.groupBy("o_orderstatus").agg(
        n.alias("n"),
        F.min("o_totalprice").alias("min_price"),
        F.max("o_totalprice").alias("max_price"),
        (s1 / n).alias("avg_price"),
        F.sqrt(var).alias("sd_price"),
        var.alias("var_price"),
    )


@register(
    "q_distinct_agg",
    oracle="""
        SELECT o_orderstatus,
               COUNT(DISTINCT o_custkey) AS n_custs,
               COUNT(*) AS n_orders
        FROM orders
        GROUP BY o_orderstatus
    """,
    doc="COUNT(DISTINCT) per group (expand-based distinct aggregation, SURVEY.md §2.4 [Q:q_distinct_agg]).",
    tags=("completeness", "agg"),
)
def q_distinct_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders", assert_schema=False)
    return orders.groupBy("o_orderstatus").agg(
        F.countDistinct("o_custkey").alias("n_custs"),
        F.count(F.lit(1)).alias("n_orders"),
    )


@register(
    "q_grouping_sets",
    oracle="""
        SELECT o_orderstatus, o_orderpriority,
               round(SUM(o_totalprice), 2) AS rev,
               COUNT(*) AS n
        FROM orders
        GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
    doc="ROLLUP grouping sets: (status,prio), (status), () — NULL-filled super-aggregate rows (SURVEY.md §2.4 [Q:q_grouping_sets]).",
    tags=("completeness", "agg"),
)
def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders", assert_schema=False)
    return orders.rollup("o_orderstatus", "o_orderpriority").agg(
        F.round(F.sum("o_totalprice"), 2).alias("rev"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "q_cube",
    oracle="""
        SELECT l_returnflag, l_linestatus,
               round(SUM(l_quantity), 2) AS qty,
               COUNT(*) AS n
        FROM lineitem
        GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    doc="CUBE over (returnflag, linestatus): all 2^2 grouping sets.",
    tags=("completeness", "agg"),
)
def q_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem", assert_schema=False)
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("qty"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "q_having",
    oracle="""
        SELECT o_custkey, COUNT(*) AS n_orders,
               round(SUM(o_totalprice), 2) AS rev
        FROM orders
        GROUP BY o_custkey
        HAVING COUNT(*) >= 15
    """,
    doc="HAVING = post-aggregation filter (SURVEY.md §2.4).",
    tags=("completeness", "agg"),
)
def q_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders", assert_schema=False)
    return (
        orders.groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("rev"),
        )
        .filter(F.col("n_orders") >= 15)
    )


@register(
    "q_percentile",
    oracle="""
        SELECT o_orderstatus,
               round(quantile_cont(o_totalprice, 0.5), 6)  AS p50,
               round(quantile_cont(o_totalprice, 0.95), 6) AS p95
        FROM orders
        GROUP BY o_orderstatus
    """,
    doc="Exact interpolated percentiles per group: Spark `percentile` == DuckDB `quantile_cont` (SURVEY.md §2.4). The 100 TB path is percentile_approx (see q_approx_stats, hash-checked via in-plan tolerance verdicts).",
    tags=("extension", "agg"),
)
def q_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders", assert_schema=False)
    return orders.groupBy("o_orderstatus").agg(
        F.round(F.percentile("o_totalprice", 0.5), 6).alias("p50"),
        F.round(F.percentile("o_totalprice", 0.95), 6).alias("p95"),
    )


def _split_distinct_agg(orders: DataFrame, *aggs, cd_alias: str) -> DataFrame:
    """COUNT(DISTINCT) kept OUT of the object-aggregate plan (round 12):
    mixing a distinct aggregate with percentile/HLL object buffers makes
    Spark carry the heavy buffers through the distinct rewrite — the
    partial aggregate keys on (group, custkey) and builds a percentile
    buffer PER DISTINCT PAIR. Cold cost at sf0.1 measured 19.4 s for
    the combined plan vs 7.0 s for this shape: object aggs in one pass,
    the exact distinct count as distinct()->count joined back on the
    3-row group key. The isNotNull guard preserves COUNT(DISTINCT x)'s
    null semantics exactly, so results (and hashes) are unchanged."""
    a = orders.groupBy("o_orderstatus").agg(*aggs)
    b = (
        orders.where(F.col("o_custkey").isNotNull())
        .select("o_orderstatus", "o_custkey")
        .distinct()
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias(cd_alias))
        .withColumnRenamed("o_orderstatus", "_cd_key")
    )
    # LEFT join + 0-fill, not inner: a group whose custkeys are all
    # NULL has no row in b, but COUNT(DISTINCT) over it is 0, not a
    # dropped group (round-12 review finding). Null-SAFE join key
    # (ADVICE r12): a NULL o_orderstatus group is a real SQL group —
    # a plain equi-join would never match it and zero out its exact
    # distinct count even when the group holds non-NULL custkeys.
    return (
        a.join(b, F.col("o_orderstatus").eqNullSafe(F.col("_cd_key")), "left")
        .drop("_cd_key")
        .withColumn(cd_alias, F.coalesce(F.col(cd_alias), F.lit(0).cast("long")))
    )


@register(
    "q_approx_stats",
    oracle="""
        SELECT o_orderstatus,
               round(quantile_cont(o_totalprice, 0.25), 6) AS exact_p25,
               round(quantile_cont(o_totalprice, 0.75), 6) AS exact_p75,
               round(quantile_cont(o_totalprice, 0.95), 6) AS exact_p95,
               CAST(3 AS BIGINT) AS q_within_pct,
               CAST(1 AS BIGINT) AS cd_within_3rsd
        FROM orders
        GROUP BY o_orderstatus
    """,
    doc=(
        "100 TB-posture approximate aggregates, folded into the in-plan "
        "verdict shape (round 8; previously the registry's one rows-only "
        "entry): approx_count_distinct (HLL++, rsd=0.05) and a MULTI-quantile "
        "percentile_approx sketch (p25/p75/p95, accuracy=10000) run alongside "
        "their exact counterparts in one plan; the output carries the exact "
        "quantiles as data plus tolerance verdicts — q_within_pct counts "
        "quantiles within 1% of exact (must be 3) and cd_within_3rsd bounds "
        "HLL error at 3*rsd=15%. The oracle is the exact side + the expected "
        "verdict literals, so the sketch calibration is hash-verified, not a "
        "harness special case. Complements q_approx_stats_bounded (p50, "
        "rsd=0.02). At 100 TB only the sketch side survives; this is its "
        "calibration proof."
    ),
    tags=("extension", "agg"),
)
def q_approx_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders", assert_schema=False)
    qs = [0.25, 0.75, 0.95]
    agg = _split_distinct_agg(
        orders,
        F.approx_count_distinct("o_custkey", 0.05).alias("_acd"),
        F.percentile("o_totalprice", qs).alias("_p"),
        F.percentile_approx("o_totalprice", qs, 10000).alias("_ap"),
        cd_alias="_exact_cd",
    )
    within = F.zip_with(
        "_p", "_ap", lambda p, ap: (F.abs(ap - p) <= F.abs(p) * 0.01).cast("long")
    )
    # verdicts as BIGINT: bare BOOLEAN hashes engine-specifically (q_bool_agg)
    return agg.select(
        "o_orderstatus",
        F.round(F.element_at("_p", 1), 6).alias("exact_p25"),
        F.round(F.element_at("_p", 2), 6).alias("exact_p75"),
        F.round(F.element_at("_p", 3), 6).alias("exact_p95"),
        F.aggregate(within, F.lit(0).cast("long"), lambda acc, x: acc + x).alias(
            "q_within_pct"
        ),
        (F.abs(F.col("_acd") - F.col("_exact_cd")) <= F.col("_exact_cd") * 0.15)
        .cast("long")
        .alias("cd_within_3rsd"),
    )


@register(
    "q_approx_stats_bounded",
    oracle="""
        SELECT o_orderstatus,
               CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS exact_custs,
               round(quantile_cont(o_totalprice, 0.5), 6) AS exact_p50,
               CAST(1 AS BIGINT) AS cd_within_3rsd,
               CAST(1 AS BIGINT) AS p50_within_pct
        FROM orders
        GROUP BY o_orderstatus
    """,
    doc=(
        "Driver-checkable companion to q_approx_stats: the sketches "
        "(approx_count_distinct HLL++, percentile_approx KLL-style) are "
        "engine-specific, so instead of hashing their raw outputs the query "
        "computes BOTH the approximate and the exact value in one plan and "
        "emits the exact values plus boolean error-bound verdicts "
        "(|approx-exact| <= 3*rsd for HLL at rsd=0.02; |approx_p50-p50| <= "
        "1% for the percentile sketch at accuracy=10000). The oracle is the "
        "exact side + literal TRUE — the tolerance check becomes DATA the "
        "driver hash-verifies, not a harness-side special case. At 100 TB "
        "only the sketch side survives (exact COUNT DISTINCT is the expand "
        "the sketch exists to avoid); this query is the calibration proof."
    ),
    tags=("extension", "agg"),
)
def q_approx_stats_bounded(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders", assert_schema=False)
    agg = _split_distinct_agg(
        orders,
        F.approx_count_distinct("o_custkey", 0.02).alias("_acd"),
        F.percentile("o_totalprice", 0.5).alias("_p50"),
        F.percentile_approx("o_totalprice", 0.5, 10000).alias("_ap50"),
        cd_alias="exact_custs",
    )
    # verdicts cast to BIGINT 0/1: bare BOOLEAN result columns hash
    # engine-specifically in the external driver (q_bool_agg precedent)
    return agg.select(
        "o_orderstatus",
        "exact_custs",
        F.round("_p50", 6).alias("exact_p50"),
        (F.abs(F.col("_acd") - F.col("exact_custs")) <= F.col("exact_custs") * 0.06)
        .cast("long")
        .alias("cd_within_3rsd"),
        (F.abs(F.col("_ap50") - F.col("_p50")) <= F.abs(F.col("_p50")) * 0.01)
        .cast("long")
        .alias("p50_within_pct"),
    )


@register(
    "q_collect",
    oracle="""
        SELECT n_regionkey,
               array_to_string(list_sort(list(DISTINCT n_name)), '|') AS nations
        FROM nation
        GROUP BY n_regionkey
    """,
    doc=(
        "collect_set/sort_array: assemble per-group value lists, order-"
        "canonicalized and serialized to a string so the cross-engine hash "
        "compares scalars, not engine-specific array renderings."
    ),
    tags=("completeness", "agg"),
)
def q_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = load_table(spark, sf_dir, "nation", assert_schema=False)
    return nation.groupBy("n_regionkey").agg(
        F.concat_ws("|", F.sort_array(F.collect_set("n_name"))).alias("nations")
    )


@register(
    "q_minmax_by",
    oracle="""
        SELECT o_orderstatus,
               arg_max(o_orderkey, o_totalprice) AS biggest_order,
               arg_min(o_orderkey, o_totalprice) AS smallest_order,
               MAX(o_totalprice) AS max_price
        FROM orders
        GROUP BY o_orderstatus
    """,
    doc=(
        "Argmax/argmin aggregation: the order id carrying the extreme price per "
        "status (max_by/min_by == DuckDB arg_max/arg_min). Deterministic because "
        "o_totalprice values are distinct within groups at every SF."
    ),
    tags=("completeness", "agg"),
)
def q_minmax_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders", assert_schema=False)
    return orders.groupBy("o_orderstatus").agg(
        F.max_by("o_orderkey", "o_totalprice").alias("biggest_order"),
        F.min_by("o_orderkey", "o_totalprice").alias("smallest_order"),
        F.max("o_totalprice").alias("max_price"),
    )


@register(
    "q_pivot",
    oracle="""
        SELECT o_orderstatus,
               CAST(SUM(CASE WHEN substr(o_orderpriority, 1, 1) = '1' THEN 1 ELSE 0 END) AS BIGINT) AS p1,
               CAST(SUM(CASE WHEN substr(o_orderpriority, 1, 1) = '2' THEN 1 ELSE 0 END) AS BIGINT) AS p2,
               CAST(SUM(CASE WHEN substr(o_orderpriority, 1, 1) = '3' THEN 1 ELSE 0 END) AS BIGINT) AS p3,
               CAST(SUM(CASE WHEN substr(o_orderpriority, 1, 1) = '4' THEN 1 ELSE 0 END) AS BIGINT) AS p4,
               CAST(SUM(CASE WHEN substr(o_orderpriority, 1, 1) = '5' THEN 1 ELSE 0 END) AS BIGINT) AS p5
        FROM orders
        GROUP BY o_orderstatus
    """,
    doc=(
        "PIVOT: order counts per status x priority as columns, compiled as "
        "conditional aggregation (SUM(CASE WHEN ...)) — ONE shuffle. Spark's "
        "native pivot() plans (status, prio) agg -> shuffle -> pivotfirst -> "
        "shuffle, i.e. twice the exchanges for a known value list; with the "
        "values declared up front the conditional form is the plan you want at "
        "100 TB. tests/test_plans.py pins the single-Exchange property."
    ),
    tags=("completeness", "agg"),
)
def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders", assert_schema=False)
    prio = F.substring("o_orderpriority", 1, 1)
    return orders.groupBy("o_orderstatus").agg(
        *[
            F.sum(F.when(prio == p, 1).otherwise(0)).cast("long").alias(f"p{p}")
            for p in "12345"
        ]
    )


@register(
    "q_unpivot",
    oracle="""
        SELECT l_orderkey, l_linenumber, metric, val
        FROM (
            SELECT l_orderkey, l_linenumber,
                   l_quantity, l_extendedprice, l_discount
            FROM lineitem WHERE l_orderkey < 50
        )
        UNPIVOT (val FOR metric IN (l_quantity, l_extendedprice, l_discount))
    """,
    doc="UNPIVOT/melt: wide metric columns to (metric, value) rows — the inverse reshape, zero-shuffle.",
    tags=("completeness", "agg"),
)
def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem", assert_schema=False)
    return (
        li.filter(F.col("l_orderkey") < 50)
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_discount")
        .unpivot(
            ["l_orderkey", "l_linenumber"],
            ["l_quantity", "l_extendedprice", "l_discount"],
            "metric",
            "val",
        )
    )


@register(
    "q2_agg_highcard",
    oracle="""
        SELECT o_custkey,
               CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS mon,
               round(SUM(o_totalprice), 2) AS rev,
               COUNT(*) AS n
        FROM orders
        GROUP BY o_custkey, date_trunc('month', o_orderdate)
    """,
    doc=(
        "Query-2c-style HIGH-CARDINALITY aggregation: (customer, month) keys "
        "produce a group count of the same order as the input rows — the shape "
        "that stresses two-phase hash aggregation hardest (~254M groups in the "
        "reference's 2c [P]): partial agg barely collapses, the shuffle carries "
        "nearly every row, and the final agg's hash table is the cost. At 100 TB "
        "this is where spill-to-sort-based aggregation and AQE partition sizing "
        "earn their keep."
    ),
    tags=("reference", "agg"),
)
def q2_agg_highcard(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders", assert_schema=False)
    return orders.groupBy(
        "o_custkey", F.date_trunc("month", F.col("o_orderdate")).alias("mon")
    ).agg(
        F.round(F.sum("o_totalprice"), 2).alias("rev"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "q_bool_agg",
    oracle="""
        SELECT o_orderstatus,
               CAST(bool_and(o_totalprice > 1000) AS INTEGER)  AS all_over_1k,
               CAST(bool_or(o_totalprice > 490000) AS INTEGER) AS any_jumbo,
               CAST(count_if(o_totalprice > 250000) AS BIGINT) AS n_big,
               CAST(bit_and(o_orderkey % 256) AS BIGINT) AS band,
               CAST(bit_or(o_orderkey % 256) AS BIGINT)  AS bor,
               CAST(bit_xor(o_orderkey % 256) AS BIGINT) AS bxor
        FROM orders
        GROUP BY o_orderstatus
    """,
    doc=(
        "Boolean + bitwise aggregate battery: bool_and/bool_or/count_if and "
        "bit_and/bit_or/bit_xor (SURVEY.md §2.4 completeness). The boolean "
        "aggregate outputs are cast to INT on BOTH engines (driver serializes "
        "booleans engine-specifically), and every integer aggregate is cast "
        "BIGINT in the oracle: DuckDB's count_if returns HUGEINT, which "
        "pandas materializes as float64 (2487.0) while Spark emits int64 "
        "(2487) — the round-1/round-2 driver hash failures were exactly this."
    ),
    tags=("completeness", "agg"),
)
def q_bool_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders", assert_schema=False)
    b = F.col("o_orderkey") % 256
    return orders.groupBy("o_orderstatus").agg(
        F.bool_and(F.col("o_totalprice") > 1000).cast("int").alias("all_over_1k"),
        F.bool_or(F.col("o_totalprice") > 490000).cast("int").alias("any_jumbo"),
        F.count_if(F.col("o_totalprice") > 250000).cast("long").alias("n_big"),
        F.bit_and(b).cast("long").alias("band"),
        F.bit_or(b).cast("long").alias("bor"),
        F.bit_xor(b).cast("long").alias("bxor"),
    )


@register(
    "q_corr",
    oracle="""
        SELECT l_returnflag,
               (floor(
                 (COUNT(*) * (CAST(SUM(CAST(round(l_quantity * l_extendedprice * 100, 0) AS BIGINT)) AS DOUBLE) / 100)
                  - (CAST(SUM(CAST(round(l_quantity * 100, 0) AS BIGINT)) AS DOUBLE) / 100)
                    * (CAST(SUM(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS DOUBLE) / 100))
                 / sqrt(
                     (COUNT(*) * (CAST(SUM(CAST(round(l_quantity * l_quantity * 10000, 0) AS BIGINT)) AS DOUBLE) / 10000)
                      - (CAST(SUM(CAST(round(l_quantity * 100, 0) AS BIGINT)) AS DOUBLE) / 100)
                        * (CAST(SUM(CAST(round(l_quantity * 100, 0) AS BIGINT)) AS DOUBLE) / 100))
                     * (COUNT(*) * (CAST(SUM(CAST(round(l_extendedprice * l_extendedprice * 100, 0) AS BIGINT)) AS DOUBLE) / 100)
                      - (CAST(SUM(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS DOUBLE) / 100)
                        * (CAST(SUM(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS DOUBLE) / 100))
                   ) * 1000000 + 0.5) / 1000000) AS corr_qty_price
        FROM lineitem
        GROUP BY l_returnflag
    """,
    doc=(
        "Pearson correlation via the product-moment identity over EXACT "
        "fixed-point sums (Sx, Sy, Sxy, Sxx, Syy) — the same strategy as "
        "variance: built-in corr() implementations differ across engines, the "
        "identical double formula cannot. Products of 2dp values are exact at "
        "4dp (qty*qty) / 2dp-x-2dp money scaled at 100 (headroom); native "
        "F.corr is tolerance-tested against this in tests/test_aggregates.py."
    ),
    tags=("completeness", "agg"),
)
def q_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem", assert_schema=False)
    n = F.count(F.lit(1))
    q, p = F.col("l_quantity"), F.col("l_extendedprice")

    def fsum(expr, scale):
        m = 10**scale
        return F.sum(F.round(expr * m, 0).cast("long")) / F.lit(float(m))

    sx, sy = fsum(q, 2), fsum(p, 2)
    sxy = fsum(q * p, 2)
    sxx, syy = fsum(q * q, 4), fsum(p * p, 2)
    corr = (n * sxy - sx * sy) / F.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
    return li.groupBy("l_returnflag").agg(rnd(corr, 6).alias("corr_qty_price"))


@register(
    "q_incremental_agg",
    oracle="""
        SELECT strftime(o_orderdate, '%Y-%m') AS o_month,
               COUNT(*) AS n,
               (CAST(SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS DOUBLE)
                / 100) AS rev
        FROM orders
        GROUP BY 1
    """,
    doc=(
        "Incremental materialized-aggregate maintenance (the nightly-rollup "
        "pattern of a 100 TB warehouse): the per-month revenue rollup is "
        "computed as merge(partial(base), partial(new_batch)) — COUNT and "
        "fixed-point-SUM are algebraic aggregates whose partial states "
        "(n, cents BIGINT) merge by addition, so ingesting a new batch "
        "re-aggregates ONLY the batch plus one tiny merge, never the 100 TB "
        "base. The split is deterministic (o_orderkey%1000 >= 900 plays the "
        "new batch); the oracle recomputes the rollup from scratch, so the "
        "driver hash proves merge(partials) == full recompute bit-exactly "
        "(partials stay integer cents until the single final division). "
        "Same shape as Spark's own partial->final HashAggregate, lifted to "
        "cross-job granularity."
    ),
    tags=("agg", "extension"),
)
def q_incremental_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders", assert_schema=False)
    month = F.date_format("o_orderdate", "yyyy-MM").alias("o_month")
    cents = F.round(F.col("o_totalprice") * 100, 0).cast("long")

    def partial(df: DataFrame) -> DataFrame:
        return df.groupBy(month).agg(
            F.count(F.lit(1)).alias("pn"), F.sum(cents).alias("pcents")
        )

    base = partial(orders.filter(F.col("o_orderkey") % 1000 < 900))
    batch = partial(orders.filter(F.col("o_orderkey") % 1000 >= 900))
    return (
        base.unionByName(batch)
        .groupBy("o_month")
        .agg(F.sum("pn").alias("n"), F.sum("pcents").alias("cents"))
        .select("o_month", "n", (F.col("cents") / F.lit(100.0)).alias("rev"))
    )


@register(
    "q_string_agg",
    oracle="""
        SELECT o_orderstatus,
               string_agg(DISTINCT o_orderpriority, ','
                          ORDER BY o_orderpriority) AS priorities,
               COUNT(DISTINCT o_orderpriority) AS n_prio
        FROM orders
        GROUP BY o_orderstatus
    """,
    doc=(
        "Ordered string aggregation (LISTAGG/string_agg): the distinct "
        "priorities seen per order status, joined in sorted order — Spark "
        "has no ordered string_agg, so the equivalent is "
        "concat_ws(array_sort(collect_set(...))), which also makes the "
        "result deterministic under any partitioning (collect_list order "
        "is not). The canonical 'serialize a small group to one cell' "
        "reporting op; group state is bounded by the distinct count, not "
        "the row count, so it scales as an ordinary two-phase agg."
    ),
    tags=("completeness", "agg"),
)
def q_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders", assert_schema=False)
    return orders.groupBy("o_orderstatus").agg(
        F.concat_ws(",", F.array_sort(F.collect_set("o_orderpriority"))).alias(
            "priorities"
        ),
        F.countDistinct("o_orderpriority").alias("n_prio"),
    )


@register(
    "q_retention_cohort",
    oracle="""
        WITH first_seen AS (
            SELECT user_id, date_trunc('day', MIN(ts)) AS cohort_day
            FROM events GROUP BY user_id
        ),
        activity AS (
            SELECT DISTINCT user_id, date_trunc('day', ts) AS act_day
            FROM events
        )
        SELECT strftime(cohort_day, '%Y-%m-%d') AS cohort,
               CAST(date_diff('day', cohort_day, act_day) AS BIGINT) AS offset_days,
               CAST(COUNT(*) AS BIGINT) AS n_users
        FROM activity JOIN first_seen USING (user_id)
        GROUP BY cohort_day, act_day
        ORDER BY cohort, offset_days
    """,
    doc=(
        "Retention cohort matrix — the canonical product-analytics rollup: "
        "users bucketed by first-seen day (their cohort), then for every "
        "(cohort, day-offset) cell the count of cohort members active that "
        "day. ONE scan: per-(user, day) distinct, then the cohort day is "
        "a MIN window over the user partition — no separate first-seen "
        "branch and no join back (a (user, day) hash partitioning would "
        "NOT co-locate a user_id join, so the join form pays an extra "
        "scan AND an extra shuffle), then the cell rollup. "
        "Cohort labels travel as ISO date STRINGS (bare DATE columns "
        "serialize engine-specifically in the hash — q_bool_agg precedent); "
        "offsets and counts are exact BIGINTs. At 100 TB the user "
        "dimension of the join is |users|, orders of magnitude below "
        "|events| — it broadcasts per executor or co-partitions with the "
        "activity side, and no cell count ever exceeds the cohort size."
    ),
    tags=("completeness", "agg", "events"),
)
def q_retention_cohort(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    events = load_table(spark, sf_dir, "events", assert_schema=False)
    activity = events.select(
        "user_id", F.date_trunc("day", F.col("ts")).alias("act_day")
    ).distinct()
    w = Window.partitionBy("user_id")
    return (
        activity.withColumn("cohort_day", F.min("act_day").over(w))
        .groupBy("cohort_day", "act_day")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .select(
            F.date_format("cohort_day", "yyyy-MM-dd").alias("cohort"),
            F.datediff(F.col("act_day"), F.col("cohort_day"))
            .cast("long")
            .alias("offset_days"),
            F.col("n_users"),
        )
        .orderBy("cohort", "offset_days")
    )


@register(
    "q_trailing_active",
    oracle="""
        WITH act AS (
            SELECT DISTINCT user_id, date_trunc('day', ts) AS d FROM events
        ),
        bounds AS (SELECT MAX(d) AS dmax FROM act),
        expanded AS (
            SELECT user_id, d + k * INTERVAL '1 day' AS cover_day
            FROM act, UNNEST(range(0, 7)) AS r(k)
        )
        SELECT strftime(cover_day, '%Y-%m-%d') AS day,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS wau
        FROM expanded, bounds
        WHERE cover_day <= dmax
        GROUP BY cover_day
        ORDER BY day
    """,
    doc=(
        "Trailing-7-day active users (WAU) per day — the dashboard query "
        "every product team runs, and a shape SQL windows cannot express "
        "directly (COUNT(DISTINCT) over a RANGE frame is unsupported in "
        "Spark and most engines). The rewrite: each (user, active-day) "
        "pair COVERS the next 7 calendar days, so exploding 7 cover-rows "
        "per pair and distinct-counting per cover day gives exactly the "
        "trailing-window DAU union. Cost model: |distinct user-days| x 7 "
        "rows into one distinct-count shuffle — linear, no self-join, no "
        "per-day scan; at 100 TB widen the window by the same trick "
        "(k x days) or two-level: daily HLL sketches merged over the "
        "trailing window when exactness can be traded."
    ),
    tags=("completeness", "agg", "events"),
)
def q_trailing_active(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events", assert_schema=False)
    act = events.select(
        "user_id", F.date_trunc("day", F.col("ts")).alias("d")
    ).distinct()
    dmax = act.agg(F.max("d").alias("dmax"))
    expanded = act.select(
        "user_id",
        F.explode(F.sequence(F.lit(0), F.lit(6))).alias("k"),
        "d",
    ).select(
        "user_id", F.expr("d + make_interval(0, 0, 0, k, 0, 0, 0)").alias("cover_day")
    )
    return (
        expanded.crossJoin(F.broadcast(dmax))
        .filter(F.col("cover_day") <= F.col("dmax"))
        .groupBy("cover_day")
        .agg(F.countDistinct("user_id").alias("wau"))
        .select(
            F.date_format("cover_day", "yyyy-MM-dd").alias("day"), F.col("wau")
        )
        .orderBy("day")
    )


@register(
    "q_session_labels",
    oracle="""
        SELECT event_id, user_id,
               CAST(SUM(is_new) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS BIGINT) AS session_idx
        FROM (
            SELECT event_id, user_id, ts,
                   CASE WHEN lag(ts) OVER (PARTITION BY user_id
                                           ORDER BY ts, event_id) IS NULL
                             OR ts - lag(ts) OVER (PARTITION BY user_id
                                                   ORDER BY ts, event_id)
                                > INTERVAL '30 minutes'
                        THEN 1 ELSE 0 END AS is_new
            FROM events
        )
    """,
    doc=(
        "Per-event session labeling via the lag-gap-cumsum rewrite: an "
        "event starts a new session when its gap to the user's previous "
        "event exceeds 30 minutes; the running sum of start flags IS the "
        "session index. This is the row-level complement of "
        "session_window's per-session AGGREGATE (streaming/windows.py) — "
        "ETL pipelines need the label ON each event to join downstream "
        "facts into sessions. Both windows share one (user_id) partition "
        "spec, so the plan shuffles events exactly once; event_id breaks "
        "timestamp ties deterministically. At 100 TB session state never "
        "materializes — it's two streaming window passes over the same "
        "sort order."
    ),
    tags=("completeness", "window", "events"),
)
def q_session_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    events = load_table(spark, sf_dir, "events", assert_schema=False)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.col("ts").cast("double") - F.lag(F.col("ts")).over(w).cast("double")
    is_new = F.when(gap.isNull() | (gap > 1800.0), 1).otherwise(0)
    cum = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return events.select(
        "event_id",
        "user_id",
        F.sum(is_new).over(cum).cast("long").alias("session_idx"),
    )


@register(
    "q_profile",
    oracle=f"""
        SELECT 'o_orderkey' AS col,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(COUNT(o_orderkey) AS BIGINT) AS n_nonnull,
               CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS n_distinct,
               CAST(MIN(o_orderkey) AS DOUBLE) AS min_v,
               CAST(MAX(o_orderkey) AS DOUBLE) AS max_v
        FROM orders
        UNION ALL
        SELECT 'o_custkey', COUNT(*), COUNT(o_custkey),
               COUNT(DISTINCT o_custkey),
               CAST(MIN(o_custkey) AS DOUBLE), CAST(MAX(o_custkey) AS DOUBLE)
        FROM orders
        UNION ALL
        SELECT 'o_totalprice', COUNT(*), COUNT(o_totalprice),
               COUNT(DISTINCT o_totalprice),
               CAST(MIN(o_totalprice) AS DOUBLE),
               CAST(MAX(o_totalprice) AS DOUBLE)
        FROM orders
        ORDER BY col
    """,
    doc=(
        "Table profiling — the DESCRIBE/summary() capability every engine "
        "ships: per-column row count, non-null count, exact distinct "
        "count, min and max, emitted as one tidy (column -> stats) "
        "relation for the numeric columns of orders. All six statistics "
        "for all columns come out of a SINGLE scan: Spark plans the "
        "multi-column agg as one pass with per-column accumulators, and "
        "the three COUNT(DISTINCT)s expand into one Expand + two-phase "
        "agg (the same plan ANALYZE TABLE uses). Min/max travel as "
        "DOUBLE so one schema fits every numeric column. At 100 TB "
        "exact distinct per column is the expensive term — swap to "
        "approx_count_distinct (q_approx_stats_bounded shows the "
        "bounded-error contract) and the scan stays single-pass."
    ),
    tags=("completeness", "agg"),
)
def q_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders", assert_schema=False)
    cols = ["o_orderkey", "o_custkey", "o_totalprice"]
    aggs = [F.count(F.lit(1)).alias("n")]
    for c in cols:
        aggs += [
            F.count(c).alias(f"nn_{c}"),
            F.countDistinct(c).alias(f"nd_{c}"),
            F.min(c).cast("double").alias(f"mn_{c}"),
            F.max(c).cast("double").alias(f"mx_{c}"),
        ]
    wide = orders.agg(*aggs)  # ONE scan, one 1-row result
    stack_args = ", ".join(
        f"'{c}', n, nn_{c}, nd_{c}, mn_{c}, mx_{c}" for c in cols
    )
    return wide.select(
        F.expr(
            f"stack({len(cols)}, {stack_args}) "
            "AS (col, n, n_nonnull, n_distinct, min_v, max_v)"
        )
    ).orderBy("col")


@register(
    "q_heavy_hitters",
    oracle="""
        WITH total AS (SELECT COUNT(*) AS n FROM lineitem)
        SELECT l_partkey AS key,
               CAST(COUNT(*) AS BIGINT) AS cnt,
               CAST(COUNT(*) * 1000000 // ANY_VALUE(total.n) AS BIGINT)
                   AS share_ppm
        FROM lineitem, total
        GROUP BY l_partkey
        ORDER BY cnt DESC, key
        LIMIT 20
    """,
    doc=(
        "Heavy-hitter / skew diagnostics: the top-20 join keys by "
        "frequency with their parts-per-million share of the fact table — "
        "the query you run BEFORE a big join to decide whether AQE skew "
        "splitting suffices or a salted plan (operators/skew.py) is "
        "needed. One two-phase count shuffle + TakeOrderedAndProject; the "
        "share is integer ppm (floor division) so the hash is float-free. "
        "At 100 TB this is exactly the sampled-stats pass shuffle "
        "planners run internally — materializing it as a first-class "
        "query makes the skew decision auditable."
    ),
    tags=("completeness", "agg", "skew"),
)
def q_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem", assert_schema=False)
    total = li.agg(F.count(F.lit(1)).alias("n"))
    return (
        li.groupBy(F.col("l_partkey").alias("key"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .crossJoin(F.broadcast(total))
        .select(
            "key",
            "cnt",
            F.floor(F.col("cnt") * 1000000 / F.col("n")).cast("long").alias(
                "share_ppm"
            ),
        )
        .orderBy(F.desc("cnt"), "key")
        .limit(20)
    )


_CMS_D = 4  # hash rows
_CMS_W = 256  # counters per row


@register(
    "q_heavy_hitters_cms",
    oracle=f"""
        WITH kc AS (
            SELECT l_partkey AS key, CAST(COUNT(*) AS BIGINT) AS cnt
            FROM lineitem GROUP BY 1
        ),
        rws AS (SELECT unnest(range(0, {_CMS_D})) AS r),
        cells AS (
            SELECT r, CAST('0x' || substring(md5(CAST(r AS VARCHAR) || '|'
                           || CAST(key AS VARCHAR)), 1, 15) AS BIGINT)
                       % {_CMS_W} AS idx,
                   CAST(SUM(cnt) AS BIGINT) AS c
            FROM kc CROSS JOIN rws
            GROUP BY 1, 2
        ),
        top AS (SELECT key, cnt FROM kc ORDER BY cnt DESC, key LIMIT 20),
        est AS (
            SELECT t.key, t.cnt, MIN(c.c) AS est
            FROM top t
            CROSS JOIN rws
            JOIN cells c ON c.r = rws.r
                AND c.idx = CAST('0x' || substring(md5(CAST(rws.r AS VARCHAR)
                            || '|' || CAST(t.key AS VARCHAR)), 1, 15) AS BIGINT)
                            % {_CMS_W}
            GROUP BY t.key, t.cnt
        )
        SELECT key, cnt, est,
               CAST(est >= cnt AS BIGINT) AS over_ok,
               CAST((est - cnt) * 1000000
                    // CAST((SELECT SUM(cnt) FROM kc) AS BIGINT) AS BIGINT)
                   AS err_ppm
        FROM est
        ORDER BY cnt DESC, key
    """,
    doc=(
        "COUNT-MIN SKETCH heavy hitters (round 10 — the sketch family "
        f"member with a FULL value oracle): a {_CMS_D}x{_CMS_W} CMS "
        "built distributively — per-key counts first (the only "
        "corpus-sized shuffle), then each distinct key feeds its count "
        f"into {_CMS_D} md5-derived counters; cells are merged by "
        "(row, index) SUM, which is exactly how per-partition sketches "
        "merge at 100 TB (CMS is a linear sketch: merge = cell-wise "
        "add, the property that makes it distributable where exact "
        "top-k is not). Point estimates = MIN over the key's "
        f"{_CMS_D} cells for the true top-20 keys, emitted next to the "
        "exact counts with the one-sided-error verdict (est >= cnt "
        "ALWAYS, by construction) and the collision overhead in ppm of "
        "the stream. Unlike the engine-native HLL/KLL sketches "
        "(q_approx_stats — in-plan verdicts only), the md5 hash rows "
        "make the ENTIRE sketch construction bit-identical in DuckDB, "
        "so the driver hash-checks every counter the estimate "
        "touched."
    ),
    tags=("extension", "agg", "skew"),
)
def q_heavy_hitters_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem", assert_schema=False)
    kc = li.groupBy(F.col("l_partkey").alias("key")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    rows = spark.range(_CMS_D).select(F.col("id").alias("r"))

    def cms_idx(key_col, r_col):
        h = F.md5(F.concat(r_col.cast("string"), F.lit("|"), key_col.cast("string")))
        return (F.conv(F.substring(h, 1, 15), 16, 10).cast("long") % _CMS_W).alias(
            "idx"
        )

    cells = (
        kc.crossJoin(F.broadcast(rows))
        .select("r", cms_idx(F.col("key"), F.col("r")), "cnt")
        .groupBy("r", "idx")
        .agg(F.sum("cnt").alias("c"))
    )
    top = kc.orderBy(F.desc("cnt"), "key").limit(20)
    est = (
        top.crossJoin(F.broadcast(rows))
        .select("key", "cnt", "r", cms_idx(F.col("key"), F.col("r")))
        .join(F.broadcast(cells), ["r", "idx"])
        .groupBy("key", "cnt")
        .agg(F.min("c").alias("est"))
    )
    total = kc.agg(F.sum("cnt").alias("n"))
    return (
        est.crossJoin(F.broadcast(total))
        .select(
            "key",
            "cnt",
            "est",
            (F.col("est") >= F.col("cnt")).cast("long").alias("over_ok"),
            F.floor((F.col("est") - F.col("cnt")) * 1000000 / F.col("n"))
            .cast("long")
            .alias("err_ppm"),
        )
        .orderBy(F.desc("cnt"), "key")
    )


@register(
    "q_zscore_outliers",
    oracle=f"""
        WITH stats AS (
            SELECT event_type,
                   {dsum_sql('value', 2)} / COUNT(*) AS mu,
                   COUNT(*) AS n,
                   {dsum_sql(rnd_sql('value * value', 4), 4)} AS sxx
            FROM events GROUP BY event_type
        ),
        scored AS (
            SELECT e.event_type, e.event_id,
                   {rnd_sql('abs(e.value - s.mu) / sqrt(greatest(s.sxx / s.n - s.mu * s.mu, 1e-12))', 4)}
                       AS z
            FROM events e JOIN stats s USING (event_type)
        )
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n_outliers,
               CAST(MIN(event_id) AS BIGINT) AS first_outlier_id
        FROM scored
        WHERE z > 3.0
        GROUP BY event_type
        ORDER BY event_type
    """,
    doc=(
        "Z-score outlier detection per event type — the monitoring rollup "
        "behind every 'metric spiked' alert: per-group mean and variance "
        "from ONE pass (sum + sum-of-squares, both exact fixed-point so "
        "mu and sxx are bit-identical across engines), then each event's "
        "|x - mu| / sigma snapped to 4dp before the z > 3 cut — the "
        "threshold compares identical doubles on both engines, so "
        "borderline events cannot flip membership. Two narrow shuffles "
        "(per-type stats, broadcast back); the variance epsilon guards "
        "constant-valued groups. At 100 TB the stats table is "
        "|event types| rows — the broadcast never grows with the corpus."
    ),
    tags=("completeness", "agg", "events"),
)
def q_zscore_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events", assert_schema=False)
    stats = events.groupBy("event_type").agg(
        (dsum(F.col("value"), 2) / F.count(F.lit(1))).alias("mu"),
        F.count(F.lit(1)).alias("n"),
        dsum(rnd(F.col("value") * F.col("value"), 4), 4).alias("sxx"),
    )
    var = F.greatest(
        F.col("sxx") / F.col("n") - F.col("mu") * F.col("mu"), F.lit(1e-12)
    )
    z = rnd(F.abs(F.col("value") - F.col("mu")) / F.sqrt(var), 4)
    return (
        events.join(F.broadcast(stats), "event_type")
        .select("event_type", "event_id", z.alias("z"))
        .filter(F.col("z") > 3.0)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_outliers"),
            F.min("event_id").alias("first_outlier_id"),
        )
        .orderBy("event_type")
    )


@register(
    "q_crosstab_chi2",
    oracle=f"""
        WITH obs AS (
            SELECT lang, source, COUNT(*) AS o
            FROM documents GROUP BY lang, source
        ),
        rt AS (SELECT lang, COUNT(*) AS r FROM documents GROUP BY lang),
        ct AS (SELECT source, COUNT(*) AS c FROM documents GROUP BY source),
        tot AS (SELECT COUNT(*) AS n FROM documents),
        cells AS (
            SELECT rt.lang, ct.source,
                   COALESCE(obs.o, 0) AS o,
                   rt.r * ct.c * 1.0 / tot.n AS e
            FROM rt CROSS JOIN ct CROSS JOIN tot
            LEFT JOIN obs ON obs.lang = rt.lang AND obs.source = ct.source
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_cells,
               CAST((SELECT (COUNT(DISTINCT lang) - 1) FROM documents)
                    * (SELECT (COUNT(DISTINCT source) - 1) FROM documents)
                    AS BIGINT) AS dof,
               {rnd_sql(dsum_sql(rnd_sql('(o - e) * (o - e) / e', 6), 6), 4)}
                   AS chi2
        FROM cells
    """,
    doc=(
        "Chi-square independence test over the lang x source contingency "
        "table — 'is language distribution independent of crawl source?', "
        "the statistical gate behind data-mixture audits. Observed cell "
        "counts, row/column marginals, and the total come from four "
        "narrow aggs on the same scan; EMPTY cells are materialized by "
        "crossing the (tiny) marginal tables so their (0 - e)^2/e terms "
        "count — dropping them understates the statistic. Expected "
        "counts are exact integer products over n; each cell term snaps "
        "to 6dp fixed point before the exact sum, so the 4dp statistic "
        "is engine-identical. At 100 TB the marginal cross join is "
        "|langs| x |sources| rows — never corpus-sized."
    ),
    tags=("completeness", "agg", "text"),
)
def q_crosstab_chi2(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents", assert_schema=False)
    obs = docs.groupBy("lang", "source").agg(F.count(F.lit(1)).alias("o"))
    rt = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("r"))
    ct = docs.groupBy("source").agg(F.count(F.lit(1)).alias("c"))
    tot = docs.agg(F.count(F.lit(1)).alias("n"))
    cells = (
        rt.crossJoin(F.broadcast(ct))
        .crossJoin(F.broadcast(tot))
        .join(F.broadcast(obs), ["lang", "source"], "left")
        .select(
            F.coalesce(F.col("o"), F.lit(0)).alias("o"),
            (F.col("r") * F.col("c") * 1.0 / F.col("n")).alias("e"),
        )
    )
    term = rnd((F.col("o") - F.col("e")) * (F.col("o") - F.col("e")) / F.col("e"), 6)
    dof = (
        docs.agg(
            (
                (F.countDistinct("lang") - 1) * (F.countDistinct("source") - 1)
            ).alias("dof")
        )
    )
    return (
        cells.agg(
            F.count(F.lit(1)).alias("n_cells"),
            rnd(dsum(term, 6), 4).alias("chi2"),
        )
        .crossJoin(F.broadcast(dof))
        .select("n_cells", F.col("dof").cast("long").alias("dof"), "chi2")
    )


@register(
    "q_mad_outliers",
    oracle="""
        WITH v AS (
            SELECT event_type,
                   CAST(round(value * 1000000, 0) AS BIGINT) AS vu
            FROM events
        ),
        med AS (
            SELECT event_type,
                   CAST(2 * quantile_cont(vu, 0.5) AS BIGINT) AS med2
            FROM v GROUP BY event_type
        ),
        dev AS (
            SELECT v.event_type, v.vu, m.med2,
                   abs(2 * v.vu - m.med2) AS dev2
            FROM v JOIN med m USING (event_type)
        ),
        mad AS (
            SELECT event_type, med2,
                   CAST(2 * quantile_cont(dev2, 0.5) AS BIGINT) AS mad4
            FROM dev GROUP BY event_type, med2
        )
        SELECT d.event_type,
               CAST(COUNT(*) AS BIGINT) AS n,
               (floor((CAST(m.med2 AS DOUBLE) / 2000000.0) * 1000000 + 0.5)
                    / 1000000) AS median_value,
               (floor((CAST(m.mad4 AS DOUBLE) / 4000000.0) * 1000000 + 0.5)
                    / 1000000) AS mad_value,
               CAST(SUM(CASE WHEN d.dev2 * 20000 > 44478 * m.mad4
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
               (floor((CAST(SUM(CASE WHEN d.dev2 * 20000 > 44478 * m.mad4
                                     THEN 1 ELSE 0 END) AS DOUBLE)
                       / COUNT(*)) * 1000000 + 0.5) / 1000000) AS outlier_rate
        FROM dev d JOIN mad m USING (event_type)
        GROUP BY d.event_type, m.med2, m.mad4
        ORDER BY d.event_type
    """,
    doc=(
        "MAD ROBUST OUTLIERS (round 11) — the median-absolute-"
        "deviation counterpart of q_zscore_outliers: mean/stddev "
        "break down exactly when outliers are present (the outliers "
        "inflate sigma and hide themselves), so production anomaly "
        "gates use the 50% breakdown-point robust z = |x - median| / "
        "(1.4826 * MAD) > 3. Everything that feeds a comparison is "
        "integer-exact: values snap to micro units, medians are "
        "carried DOUBLED (2x and 4x) so the interpolated midpoint of "
        "an even-count group stays integral, and the outlier cut "
        "dev2 * 20000 > 44478 * mad4 multiplies BIGINTs — the "
        "1.4826 consistency constant and the 3-sigma threshold never "
        "exist as floats. Exact medians need a per-group total order "
        "(two percentile aggregations); the 100 TB swap is "
        "percentile_approx for phase 1 with the identical comparison "
        "plan, the same posture as q_equidepth_twophase. Broadcast "
        "joins carry the 5-row per-type medians back; one corpus "
        "shuffle per phase."
    ),
    tags=("extension", "agg", "quality"),
)
def q_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from benchmark_spark.catalog import load_table

    events = load_table(spark, sf_dir, "events", assert_schema=False)
    v = events.select(
        "event_type", F.round(F.col("value") * 1000000, 0).cast("long").alias("vu")
    )
    med = v.groupBy("event_type").agg(
        (F.lit(2) * F.percentile("vu", 0.5)).cast("long").alias("med2")
    )
    dev = v.join(F.broadcast(med), "event_type").select(
        "event_type", "vu", "med2", F.abs(2 * F.col("vu") - F.col("med2")).alias("dev2")
    )
    mad = dev.groupBy("event_type", "med2").agg(
        (F.lit(2) * F.percentile("dev2", 0.5)).cast("long").alias("mad4")
    )
    joined = dev.join(F.broadcast(mad.select("event_type", "mad4")), "event_type")
    is_out = F.when(F.col("dev2") * 20000 > 44478 * F.col("mad4"), 1).otherwise(0)
    return (
        joined.groupBy("event_type", "med2", "mad4")
        .agg(
            F.count("*").alias("n"),
            F.sum(is_out).alias("n_outliers"),
        )
        .select(
            "event_type",
            F.col("n").cast("long").alias("n"),
            rnd(F.col("med2").cast("double") / 2000000.0, 6).alias("median_value"),
            rnd(F.col("mad4").cast("double") / 4000000.0, 6).alias("mad_value"),
            F.col("n_outliers").cast("long").alias("n_outliers"),
            rnd(F.col("n_outliers").cast("double") / F.col("n"), 6).alias("outlier_rate"),
        )
        .orderBy("event_type")
    )
