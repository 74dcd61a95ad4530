"""Window functions + sorts/limits/top-k.

Not in the reference's exercised surface (SURVEY.md §2.5 — its
queries contain no OVER clauses) but required for analytics
completeness. All window specs carry deterministic tiebreaker keys
so results are stable across engines.

Scale posture: a window over PARTITION BY k is one shuffle on k and
per-partition sort; at 100 TB the concern is partition skew (one
giant customer) — mitigated by AQE or pre-bucketing by k. Global
ORDER BY ... LIMIT k never sorts globally (TakeOrderedAndProject).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from benchmark_spark.catalog import load_table
from benchmark_spark.operators.aggregates import rnd
from benchmark_spark.registry import register


@register(
    "q6_window",
    oracle="""
        SELECT o_custkey, o_orderkey, o_totalprice,
               CAST(row_number() OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_totalprice DESC, o_orderkey
               ) AS BIGINT) AS rn
        FROM orders
        QUALIFY rn <= 2
    """,
    doc="Per-group top-2 via row_number (SURVEY.md §2.5 [Q:q6_window]).",
    tags=("completeness", "window"),
)
def q6_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders", assert_schema=False)
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        orders.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= 2)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    )


@register(
    "q_rank_funcs",
    oracle="""
        SELECT o_orderkey,
               CAST(rank()       OVER w AS BIGINT) AS rnk,
               CAST(dense_rank() OVER w AS BIGINT) AS drnk,
               CAST(ntile(4)     OVER w AS BIGINT) AS quartile,
               (floor(percent_rank() OVER w * 1000000 + 0.5) / 1000000) AS prk,
               (floor(cume_dist() OVER w * 1000000 + 0.5) / 1000000) AS cd
        FROM orders
        WHERE o_totalprice > 450000
        WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice DESC, o_orderkey)
    """,
    doc="Ranking-function battery: rank/dense_rank/ntile/percent_rank/cume_dist (SURVEY.md §2.5).",
    tags=("completeness", "window"),
)
def q_rank_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders", assert_schema=False)
    w = Window.partitionBy("o_orderstatus").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return orders.filter(F.col("o_totalprice") > 450000).select(
        "o_orderkey",
        F.rank().over(w).cast("long").alias("rnk"),
        F.dense_rank().over(w).cast("long").alias("drnk"),
        F.ntile(4).over(w).cast("long").alias("quartile"),
        rnd(F.percent_rank().over(w), 6).alias("prk"),
        rnd(F.cume_dist().over(w), 6).alias("cd"),
    )


@register(
    "q_lag",
    oracle="""
        SELECT user_id, event_id,
               epoch_us(ts) - epoch_us(lag(ts) OVER w) AS gap_us,
               lead(event_id) OVER w AS next_event
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    doc="lag/lead analytics: per-user inter-event gap in microseconds (SURVEY.md §2.5 [Q:q_lag]).",
    tags=("completeness", "window"),
)
def q_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events", assert_schema=False)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return events.select(
        "user_id",
        "event_id",
        (F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))).alias("gap_us"),
        F.lead("event_id").over(w).alias("next_event"),
    )


@register(
    "q_frame",
    oracle="""
        SELECT o_custkey, o_orderkey,
               round(SUM(o_totalprice) OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ), 2) AS running_rev
        FROM orders
    """,
    doc="Explicit ROWS frame: running revenue per customer (SURVEY.md §2.5 [Q:q_frame]).",
    tags=("completeness", "window"),
)
def q_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders", assert_schema=False)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("running_rev"),
    )


@register(
    "q_sliding_frame",
    oracle="""
        SELECT user_id, event_id,
               round(AVG(value) OVER (
                   PARTITION BY user_id
                   ORDER BY ts, event_id
                   ROWS BETWEEN 2 PRECEDING AND CURRENT ROW
               ), 4) AS avg3
        FROM events
    """,
    doc="Bounded sliding ROWS frame: 3-event moving average per user.",
    tags=("completeness", "window"),
)
def q_sliding_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events", assert_schema=False)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(-2, 0)
    return events.select(
        "user_id", "event_id", F.round(F.avg("value").over(w), 4).alias("avg3")
    )


@register(
    "q_topk",
    oracle="""
        SELECT o_custkey, round(SUM(o_totalprice), 2) AS rev
        FROM orders
        GROUP BY o_custkey
        ORDER BY rev DESC, o_custkey
        LIMIT 10
    """,
    doc="Global top-k: top-10 customers by revenue; TakeOrderedAndProject, no full sort (SURVEY.md §2.6 [Q:q_topk]).",
    tags=("reference", "sort"),
)
def q_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders", assert_schema=False)
    return (
        orders.groupBy("o_custkey")
        .agg(F.round(F.sum("o_totalprice"), 2).alias("rev"))
        .orderBy(F.desc("rev"), F.asc("o_custkey"))
        .limit(10)
    )


@register(
    "q_sort_multi",
    oracle="""
        SELECT o_orderkey,
               CASE WHEN o_orderstatus = 'P' THEN NULL ELSE o_orderstatus END AS s,
               o_totalprice
        FROM orders
        ORDER BY s ASC NULLS LAST, o_totalprice DESC, o_orderkey
        LIMIT 20
    """,
    doc="Multi-key sort with NULLS LAST ordering + LIMIT (SURVEY.md §2.6).",
    tags=("completeness", "sort"),
)
def q_sort_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders", assert_schema=False)
    s = F.when(F.col("o_orderstatus") == "P", F.lit(None)).otherwise(
        F.col("o_orderstatus")
    )
    return (
        orders.select("o_orderkey", s.alias("s"), "o_totalprice")
        .orderBy(
            F.col("s").asc_nulls_last(), F.desc("o_totalprice"), F.asc("o_orderkey")
        )
        .limit(20)
    )


@register(
    "q_limit_offset",
    oracle="""
        SELECT o_orderkey, o_totalprice
        FROM orders
        ORDER BY o_orderkey
        LIMIT 100 OFFSET 50
    """,
    doc="LIMIT/OFFSET pagination over a unique sort key (SURVEY.md §2.6).",
    tags=("completeness", "sort"),
)
def q_limit_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders", assert_schema=False)
    return (
        orders.select("o_orderkey", "o_totalprice")
        .orderBy("o_orderkey")
        .offset(50)
        .limit(100)
    )


@register(
    "q_range_frame",
    oracle="""
        SELECT o_orderkey, o_totalprice,
               COUNT(*) OVER (
                   PARTITION BY o_orderstatus
                   ORDER BY o_totalprice
                   RANGE BETWEEN 5000 PRECEDING AND 5000 FOLLOWING
               ) AS n_near
        FROM orders
        WHERE o_orderkey < 2000
    """,
    doc=(
        "Value-based RANGE frame (SURVEY.md §2.5 frame spec): per status, how many "
        "orders fall within +/-5000 of this order's price — a windowed band count "
        "ROWS frames cannot express."
    ),
    tags=("completeness", "window"),
)
def q_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders", assert_schema=False)
    w = (
        Window.partitionBy("o_orderstatus")
        .orderBy("o_totalprice")
        .rangeBetween(-5000, 5000)
    )
    return orders.filter(F.col("o_orderkey") < 2000).select(
        "o_orderkey",
        "o_totalprice",
        F.count(F.lit(1)).over(w).alias("n_near"),
    )


@register(
    "q_value_funcs",
    oracle="""
        SELECT o_orderkey,
               first_value(o_orderkey) OVER w AS dearest,
               last_value(o_orderkey) OVER (
                   PARTITION BY o_orderstatus
                   ORDER BY o_totalprice DESC, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
               ) AS cheapest,
               nth_value(o_orderkey, 2) OVER w AS runner_up
        FROM orders
        WHERE o_totalprice > 450000
        WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice DESC, o_orderkey)
    """,
    doc=(
        "Value window functions: first_value / last_value (explicit full frame — "
        "the default frame ends at CURRENT ROW, a classic cross-engine trap) / "
        "nth_value."
    ),
    tags=("completeness", "window"),
)
def q_value_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders", assert_schema=False)
    w = Window.partitionBy("o_orderstatus").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return orders.filter(F.col("o_totalprice") > 450000).select(
        "o_orderkey",
        F.first("o_orderkey").over(w).alias("dearest"),
        F.last("o_orderkey").over(w_full).alias("cheapest"),
        F.nth_value("o_orderkey", 2).over(w).alias("runner_up"),
    )


@register(
    "q_gap_fill",
    oracle="""
        WITH hourly AS (
            SELECT user_id, date_trunc('hour', ts) AS h,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   (CAST(SUM(CAST(round(value * 100, 0) AS BIGINT)) AS DOUBLE) / 100) AS v
            FROM events
            WHERE user_id < 10
            GROUP BY user_id, date_trunc('hour', ts)
        ),
        bounds AS (
            SELECT user_id, MIN(h) AS lo, MAX(h) AS hi FROM hourly GROUP BY user_id
        ),
        spine AS (
            SELECT user_id, unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h
            FROM bounds
        ),
        joined AS (
            SELECT s.user_id, s.h,
                   COALESCE(hl.n, 0) AS n,
                   hl.v AS v
            FROM spine s LEFT JOIN hourly hl
              ON hl.user_id = s.user_id AND hl.h = s.h
        ),
        grp AS (
            SELECT user_id, h, n, v,
                   COUNT(v) OVER (PARTITION BY user_id ORDER BY h
                                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS g
            FROM joined
        )
        SELECT user_id, h, n,
               MAX(v) OVER (PARTITION BY user_id, g) AS v_filled
        FROM grp
    """,
    doc=(
        "Time-series RESAMPLE + forward fill (gap fill): per-user hourly "
        "rollups are left-joined onto a dense hourly spine (sequence between "
        "each user's first and last active hour), empty hours get n=0, and "
        "the value column carries the LAST OBSERVED hourly sum forward. The "
        "fill uses the portable two-window trick — COUNT(v) OVER (ORDER BY "
        "h) increments only on observations, so MAX(v) per (user, count "
        "group) is the forward fill — identical semantics in Spark and "
        "DuckDB without IGNORE NULLS dialect roulette. The spine is "
        "generated per user (sequence + explode), so the operator never "
        "materializes a global calendar; at 100 TB both windows partition "
        "by user_id — no global ordering anywhere, and the hourly rollup "
        "shuffles once. The everyday observability/feature-store resample "
        "shape the tumbling window alone does not provide."
    ),
    tags=("extension", "window", "streaming"),
)
def q_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events", assert_schema=False)
    hourly = (
        events.filter(F.col("user_id") < 10)
        .groupBy("user_id", F.date_trunc("hour", "ts").alias("h"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            (F.sum(F.round(F.col("value") * 100, 0).cast("long")) / F.lit(100.0)).alias(
                "v"
            ),
        )
    )
    spine = (
        hourly.groupBy("user_id")
        .agg(F.min("h").alias("lo"), F.max("h").alias("hi"))
        .select(
            "user_id",
            F.explode(F.expr("sequence(lo, hi, interval 1 hour)")).alias("h"),
        )
    )
    joined = spine.join(hourly, ["user_id", "h"], "left").select(
        "user_id", "h", F.coalesce("n", F.lit(0)).alias("n"), "v"
    )
    w_run = Window.partitionBy("user_id").orderBy("h").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    grp = joined.withColumn("g", F.count("v").over(w_run))
    w_grp = Window.partitionBy("user_id", "g")
    return grp.select(
        "user_id", "h", "n", F.max("v").over(w_grp).alias("v_filled")
    )


def skyline_2d(df: DataFrame, x: str, y: str) -> DataFrame:
    """Sort-based 2-D skyline: keep rows not strictly dominated on
    (x maximize, y maximize). Rows are re-indexed by dense_rank over x
    descending — consecutive integers by construction — so a RANGE
    frame ending at -1 on that rank collects the best y among STRICTLY
    higher x regardless of how x values are spaced (ADVICE.md r5: a
    raw RANGE offset on x itself silently under-collects when distinct
    x values sit closer than 1 apart, e.g. fractional scores). A row
    survives iff it beats that max AND is the best at its own x (ties
    on both dims all survive — none dominates another). Two windows on
    one global ordering, zero self-joins: O(n log n) vs the O(n^2)
    NOT-EXISTS definition the oracle states."""
    rank = Window.orderBy(F.col(x).desc())
    above = Window.orderBy("_xr").rangeBetween(Window.unboundedPreceding, -1)
    tie = Window.partitionBy(x)
    return (
        df.withColumn("_xr", F.dense_rank().over(rank))
        .withColumn("_max_above", F.max(y).over(above))
        .withColumn("_max_tie", F.max(y).over(tie))
        .filter(
            (F.col("_max_above").isNull() | (F.col(y) > F.col("_max_above")))
            & (F.col(y) == F.col("_max_tie"))
        )
        .drop("_xr", "_max_above", "_max_tie")
    )



@register(
    "q_skyline",
    oracle="""
        WITH agg AS (
            SELECT o_custkey AS custkey,
                   CAST(COUNT(*) AS BIGINT) AS n_orders,
                   CAST(SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT))
                        AS BIGINT) AS spend_cents
            FROM orders GROUP BY o_custkey
        )
        SELECT custkey, n_orders, spend_cents
        FROM agg c
        WHERE NOT EXISTS (
            SELECT 1 FROM agg d
            WHERE d.n_orders >= c.n_orders AND d.spend_cents >= c.spend_cents
              AND (d.n_orders > c.n_orders OR d.spend_cents > c.spend_cents)
        )
        ORDER BY n_orders DESC, spend_cents DESC, custkey
    """,
    doc=(
        "2-D skyline / Pareto frontier: customers no other customer "
        "strictly dominates on (order count, total spend) — the "
        "multi-criteria 'best tradeoffs' query (top spenders AND "
        "frequent buyers, without collapsing to one score). The oracle "
        "states the DEFINITION (NOT EXISTS a dominator); the Spark plan "
        "implements the O(n log n) sort-based algorithm instead: order "
        "by n_orders, a RANGE frame takes max(spend) over strictly "
        "higher counts, and a row survives iff it beats that max and is "
        "the best at its own count — two windows, zero self-joins, so "
        "the driver hash also proves the fast algorithm equals the "
        "quadratic definition. Scale: the skyline runs on the ROLLUP "
        "(O(customers), not O(orders)); the global order is one range "
        "shuffle, and the standard refinement is a grid pre-filter "
        "(drop points dominated within their partition) before the sort."
    ),
    tags=("completeness", "window"),
)
def q_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders", assert_schema=False)
    agg = orders.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long")).alias(
            "spend_cents"
        ),
    )
    return skyline_2d(agg, "n_orders", "spend_cents").select(
        "custkey", "n_orders", "spend_cents"
    ).orderBy(F.desc("n_orders"), F.desc("spend_cents"), "custkey")


@register(
    "q_attribution",
    oracle="""
        WITH ordered AS (
            SELECT user_id, event_id, event_type, ts,
                   last_value(CASE WHEN event_type = 'click' THEN ts END
                              IGNORE NULLS)
                       OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                       AS last_click_ts
            FROM events
        )
        SELECT CAST(last_click_ts IS NOT NULL
                    AND epoch_us(ts) - epoch_us(last_click_ts) <= 1800000000
                    AS INT) AS attributed,
               CAST(COUNT(*) AS BIGINT) AS n_purchases,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
               CAST(SUM(CASE WHEN last_click_ts IS NOT NULL
                             AND epoch_us(ts) - epoch_us(last_click_ts) <= 1800000000
                             THEN epoch_us(ts) - epoch_us(last_click_ts)
                             ELSE 0 END) AS BIGINT) AS total_lag_us
        FROM ordered
        WHERE event_type = 'purchase'
        GROUP BY 1
        ORDER BY attributed
    """,
    doc=(
        "Last-touch attribution (the marketing-analytics sessionize-and-"
        "attribute shape): each purchase is credited to the user's most "
        "recent PRECEDING click if it came within 30 minutes — computed "
        "with a last_value(... IGNORE NULLS) window over the per-user "
        "event timeline (frame ends 1 row before current, so a purchase "
        "never attributes to itself or the future), the idiomatic "
        "carry-forward that needs no self-join and no per-event-type "
        "sub-tables. Rolled up into attributed/unattributed purchase "
        "counts, reached users, and the exact integer microsecond lag "
        "sum. One shuffle on user_id serves both the window and the "
        "rollup; at 100 TB the timeline partitioning is the events "
        "table's native (user, time) layout, and the same plan runs "
        "streaming with applyInPandasWithState holding last_click as "
        "the per-user state row."
    ),
    tags=("completeness", "window"),
)
def q_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events", assert_schema=False)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    click_ts = F.when(F.col("event_type") == "click", F.col("ts"))
    timeline = events.withColumn(
        "last_click_ts", F.last(click_ts, ignorenulls=True).over(w)
    )
    lag_us = F.unix_micros("ts") - F.unix_micros("last_click_ts")
    attributed = F.col("last_click_ts").isNotNull() & (lag_us <= 1_800_000_000)
    return (
        timeline.filter(F.col("event_type") == "purchase")
        .groupBy(attributed.cast("int").alias("attributed"))
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.countDistinct("user_id").alias("n_users"),
            F.sum(F.when(attributed, lag_us).otherwise(F.lit(0)))
            .cast("long")
            .alias("total_lag_us"),
        )
        .orderBy("attributed")
    )


@register(
    "q_event_transitions",
    oracle="""
        WITH ordered AS (
            SELECT user_id, event_type, ts, event_id,
                   lag(event_type) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id) AS prev_type
            FROM events
        ), pairs AS (
            SELECT prev_type, event_type, COUNT(*) AS n
            FROM ordered WHERE prev_type IS NOT NULL
            GROUP BY prev_type, event_type
        ), outdeg AS (
            SELECT prev_type, SUM(n) AS total FROM pairs GROUP BY prev_type
        )
        SELECT p.prev_type, p.event_type,
               CAST(p.n AS BIGINT) AS n,
               CAST((p.n * 10000) // o.total AS BIGINT) AS prob_bp
        FROM pairs p JOIN outdeg o USING (prev_type)
        ORDER BY p.prev_type, p.event_type
    """,
    doc=(
        "Event-transition (Markov) matrix: for every adjacent pair of "
        "events in each user's timeline, the count and empirical "
        "probability of event_type B following A — the product-analytics "
        "'what do users do next?' matrix that feeds journey maps and "
        "next-step prediction baselines. lag() over the per-user "
        "timeline gives each event its predecessor with no self-join; "
        "probabilities are exact integer basis points of per-source "
        "counts. One user_id shuffle for the window, one small shuffle "
        "for the |types|^2-row matrix. At 100 TB the matrix stays tiny "
        "while the timeline scan is embarrassingly partition-parallel "
        "under the (user, time) layout — same posture as "
        "q_session_labels and q_attribution, which share the shuffle."
    ),
    tags=("completeness", "window", "agg"),
)
def q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events", assert_schema=False)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        events.withColumn("prev_type", F.lag("event_type").over(w))
        .filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    outdeg = pairs.groupBy("prev_type").agg(F.sum("n").alias("total"))
    return (
        pairs.join(F.broadcast(outdeg), "prev_type")
        .select(
            "prev_type",
            "event_type",
            F.col("n").cast("long").alias("n"),
            F.expr("(n * 10000) div total").cast("long").alias("prob_bp"),
        )
        .orderBy("prev_type", "event_type")
    )


@register(
    "q_ab_readout",
    oracle="""
        WITH assigned AS (
            SELECT CASE WHEN CAST('0x' || substring(md5('exp1|' ||
                        CAST(user_id AS VARCHAR)), 1, 15) AS BIGINT) % 2 = 0
                   THEN 'control' ELSE 'treatment' END AS arm,
                   user_id, value
            FROM events WHERE event_type = 'purchase'
        )
        SELECT arm,
               CAST(COUNT(*) AS BIGINT) AS n_purchases,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
               CAST(SUM(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT)
                   AS value_cents,
               CAST(SUM(CAST(round(value * 100, 0) AS BIGINT)) // COUNT(*)
                   AS BIGINT) AS mean_cents
        FROM assigned
        GROUP BY arm
        ORDER BY arm
    """,
    doc=(
        "A/B experiment readout: users are assigned to control/treatment "
        "by a salted md5 hash of their id (the standard deterministic "
        "bucketing — same user always lands in the same arm, across "
        "sessions, engines, and reruns, with no assignment table to "
        "store or join), then per-arm purchase counts, reached users, "
        "exact integer revenue and its per-event mean are rolled up. "
        "The salt ('exp1') is the experiment key: a new experiment "
        "re-randomizes by changing the salt only. Assignment is a "
        "map-side expression — the readout costs exactly one "
        "aggregation; at 100 TB per-arm/per-day cells roll up by SUM "
        "into the sequential-test dashboard. Mean as integer division "
        "of exact sums keeps the hash float-free."
    ),
    tags=("completeness", "agg"),
)
def q_ab_readout(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events", assert_schema=False)
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit("exp1|"), F.col("user_id").cast("string"))), 1, 15),
        16,
        10,
    ).cast("long")
    arm = F.when(h % 2 == 0, F.lit("control")).otherwise(F.lit("treatment"))
    cents = F.round(F.col("value") * 100, 0).cast("long")
    return (
        events.filter(F.col("event_type") == "purchase")
        .select(arm.alias("arm"), "user_id", cents.alias("cents"))
        .groupBy("arm")
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.countDistinct("user_id").alias("n_users"),
            F.sum("cents").alias("value_cents"),
            F.expr("sum(cents) div count(*)").cast("long").alias("mean_cents"),
        )
        .orderBy("arm")
    )


@register(
    "q_rfm_segments",
    oracle="""
        WITH rfm AS (
            SELECT o_custkey,
                   date_diff('day', CAST(MAX(o_orderdate) AS DATE),
                             DATE '2001-09-01') AS recency_days,
                   COUNT(*) AS frequency,
                   SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS monetary
            FROM orders GROUP BY o_custkey
        ), scored AS (
            SELECT o_custkey,
                   ntile(5) OVER (ORDER BY recency_days DESC, o_custkey) AS r,
                   ntile(5) OVER (ORDER BY frequency, o_custkey) AS f,
                   ntile(5) OVER (ORDER BY monetary, o_custkey) AS m,
                   monetary
            FROM rfm
        )
        SELECT CAST(r AS BIGINT) AS r, CAST(f AS BIGINT) AS f,
               CAST(m AS BIGINT) AS m,
               CAST(COUNT(*) AS BIGINT) AS n_customers,
               CAST(SUM(monetary) AS BIGINT) AS monetary_cents
        FROM scored
        GROUP BY r, f, m
        ORDER BY r, f, m
    """,
    doc=(
        "RFM customer segmentation (recency / frequency / monetary "
        "quintiles — the classic CRM value matrix): per customer, days "
        "since last order at a fixed as-of date, order count, and exact "
        "integer lifetime cents; each metric is quintiled with ntile "
        "(key tiebreaks make bucket assignment engine-deterministic) "
        "and customers roll up per (r, f, m) cell. Higher score = "
        "better (recency ntile runs DESC so recent buyers score 5). "
        "The quintile windows run on the customer ROLLUP — O(customers) "
        "after one fact shuffle — so the single-partition ntile is a "
        "dim-sized sort, same deliberate trade as q_equidepth_hist, "
        "with the same documented cutpoint-broadcast path at 100 TB."
    ),
    tags=("completeness", "window", "agg"),
)
def q_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders", assert_schema=False)
    rfm = orders.groupBy("o_custkey").agg(
        F.datediff(
            F.lit("2001-09-01").cast("date"), F.max("o_orderdate").cast("date")
        ).alias("recency_days"),
        F.count(F.lit(1)).alias("frequency"),
        F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long")).alias("monetary"),
    )
    scored = (
        rfm.withColumn(
            "r",
            F.ntile(5).over(Window.orderBy(F.desc("recency_days"), F.asc("o_custkey"))),
        )
        .withColumn("f", F.ntile(5).over(Window.orderBy("frequency", "o_custkey")))
        .withColumn("m", F.ntile(5).over(Window.orderBy("monetary", "o_custkey")))
    )
    return (
        scored.groupBy(
            F.col("r").cast("long").alias("r"),
            F.col("f").cast("long").alias("f"),
            F.col("m").cast("long").alias("m"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum("monetary").cast("long").alias("monetary_cents"),
        )
        .orderBy("r", "f", "m")
    )


@register(
    "q_cusum_changepoint",
    oracle="""
        WITH daily AS (
            SELECT event_type,
                   date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS x,
                   SUM(CAST(round(value * 100, 0) AS BIGINT)) AS y
            FROM events
            GROUP BY event_type, date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))
        ), stats AS (
            SELECT event_type, COUNT(*) AS nd, SUM(y) AS s FROM daily GROUP BY event_type
        ), cusum AS (
            SELECT d.event_type, d.x,
                   SUM(st.nd * d.y - st.s) OVER (
                       PARTITION BY d.event_type ORDER BY d.x) AS c
            FROM daily d JOIN stats st USING (event_type)
        )
        SELECT event_type,
               CAST(x AS BIGINT) AS peak_day,
               CAST(abs(c) AS BIGINT) AS peak_cusum,
               CAST(CASE WHEN c >= 0 THEN 1 ELSE -1 END AS BIGINT) AS direction
        FROM cusum
        QUALIFY row_number() OVER (PARTITION BY event_type
                                   ORDER BY abs(c) DESC, x) = 1
        ORDER BY event_type
    """,
    doc=(
        "CUSUM change-point detection per event type: daily revenue "
        "deviations from the period mean accumulate in a running sum "
        "whose peak |CUSUM| marks the most likely level-shift day — the "
        "ops-monitoring 'when did this metric change?' query. Mean "
        "subtraction is kept EXACT by scaling: deviation = N*y_day - "
        "S_total (integers), so the cumulative sum, its argmax day, and "
        "the shift direction are all integer-exact across engines — no "
        "float mean ever exists. Two-phase daily rollup, a broadcast of "
        "per-type (N, S), one per-type ordered window over O(days) rows: "
        "the fact collapses before any sequential math, same posture as "
        "q_trend_fit. At 100 TB a streaming twin holds (running sum, "
        "running peak) as two state values per type."
    ),
    tags=("completeness", "window", "agg"),
)
def q_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events", assert_schema=False)
    daily = events.groupBy(
        "event_type",
        F.datediff(F.col("ts").cast("date"), F.lit("2024-01-01").cast("date")).alias("x"),
    ).agg(F.sum(F.round(F.col("value") * 100, 0).cast("long")).alias("y"))
    stats = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("nd"), F.sum("y").alias("s")
    )
    wc = Window.partitionBy("event_type").orderBy("x")
    cusum = (
        daily.join(F.broadcast(stats), "event_type")
        .withColumn("c", F.sum(F.col("nd") * F.col("y") - F.col("s")).over(wc))
    )
    wr = Window.partitionBy("event_type").orderBy(F.abs(F.col("c")).desc(), F.asc("x"))
    return (
        cusum.withColumn("rn", F.row_number().over(wr))
        .filter(F.col("rn") == 1)
        .select(
            "event_type",
            F.col("x").cast("long").alias("peak_day"),
            F.abs(F.col("c")).cast("long").alias("peak_cusum"),
            F.when(F.col("c") >= 0, 1).otherwise(-1).cast("long").alias("direction"),
        )
        .orderBy("event_type")
    )


@register(
    "q_ltv_curve",
    oracle="""
        WITH first_seen AS (
            SELECT o_custkey,
                   MIN(year(o_orderdate) * 12 + month(o_orderdate)) AS cohort_m
            FROM orders GROUP BY o_custkey
        ), sized AS (
            SELECT cohort_m, COUNT(*) AS cohort_size
            FROM first_seen GROUP BY cohort_m
        ), aged AS (
            SELECT f.cohort_m,
                   (year(o.o_orderdate) * 12 + month(o.o_orderdate))
                       - f.cohort_m AS age,
                   CAST(round(o.o_totalprice * 100, 0) AS BIGINT) AS cents,
                   o.o_custkey
            FROM orders o JOIN first_seen f ON o.o_custkey = f.o_custkey
        ), cells AS (
            SELECT cohort_m, age,
                   SUM(cents) AS rev_cents,
                   COUNT(DISTINCT o_custkey) AS n_active
            FROM aged GROUP BY cohort_m, age
        )
        SELECT printf('%04d-%02d', (cohort_m - 1) // 12, ((cohort_m - 1) % 12) + 1)
                   AS cohort,
               CAST(age AS BIGINT) AS age_months,
               CAST(n_active AS BIGINT) AS n_active,
               CAST(SUM(rev_cents) OVER (PARTITION BY cohort_m ORDER BY age)
                    AS BIGINT) AS cum_cents,
               CAST(SUM(rev_cents) OVER (PARTITION BY cohort_m ORDER BY age)
                    // ANY_VALUE(s.cohort_size) AS BIGINT) AS ltv_per_cust_cents
        FROM cells JOIN sized s USING (cohort_m)
        GROUP BY cohort_m, age, n_active, rev_cents
        ORDER BY cohort, age_months
    """,
    doc=(
        "Cohort LTV curves (the money complement of q_retention_cohort): "
        "customers cohorted by first-order month; per (cohort, age) the "
        "active-customer count and the CUMULATIVE revenue to that age, "
        "plus per-customer LTV as exact integer cents over the cohort "
        "size — the curve every subscription/commerce business tracks "
        "and projects forward. Cohort month travels as an integer "
        "(y*12+m) through every computation and is formatted to "
        "'YYYY-MM' only at the edge, so no date arithmetic or bare DATE "
        "column touches the cross-engine hash. Plan: one first-seen agg "
        "(shuffle on customer), a co-keyed fact join, a (cohort, age) "
        "rollup, and a per-cohort cumulative window over O(ages) rows — "
        "the fact collapses before the sequential pass, the same "
        "posture as q_trend_fit/q_cusum_changepoint."
    ),
    tags=("completeness", "window", "agg"),
)
def q_ltv_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders", assert_schema=False)
    mkey = F.year("o_orderdate") * 12 + F.month("o_orderdate")
    first_seen = orders.groupBy("o_custkey").agg(F.min(mkey).alias("cohort_m"))
    sized = first_seen.groupBy("cohort_m").agg(
        F.count(F.lit(1)).alias("cohort_size")
    )
    aged = orders.join(first_seen, "o_custkey").select(
        "cohort_m",
        (mkey - F.col("cohort_m")).alias("age"),
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("cents"),
        "o_custkey",
    )
    cells = aged.groupBy("cohort_m", "age").agg(
        F.sum("cents").alias("rev_cents"),
        F.countDistinct("o_custkey").alias("n_active"),
    )
    w = Window.partitionBy("cohort_m").orderBy("age")
    cohort_str = F.format_string(
        "%04d-%02d", ((F.col("cohort_m") - 1) / 12).cast("int"),
        ((F.col("cohort_m") - 1) % 12 + 1).cast("int"),
    )
    return (
        cells.join(F.broadcast(sized), "cohort_m")
        .withColumn("cum_cents", F.sum("rev_cents").over(w))
        .select(
            cohort_str.alias("cohort"),
            F.col("age").cast("long").alias("age_months"),
            F.col("n_active").cast("long").alias("n_active"),
            F.col("cum_cents").cast("long").alias("cum_cents"),
            F.expr("cum_cents div cohort_size").cast("long").alias(
                "ltv_per_cust_cents"
            ),
        )
        .orderBy("cohort", "age_months")
    )


_SKYLINE_ORACLE = """
        WITH agg AS (
            SELECT o_custkey AS custkey,
                   CAST(COUNT(*) AS BIGINT) AS n_orders,
                   CAST(SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT))
                        AS BIGINT) AS spend_cents
            FROM orders GROUP BY o_custkey
        )
        SELECT custkey, n_orders, spend_cents
        FROM agg c
        WHERE NOT EXISTS (
            SELECT 1 FROM agg d
            WHERE d.n_orders >= c.n_orders AND d.spend_cents >= c.spend_cents
              AND (d.n_orders > c.n_orders OR d.spend_cents > c.spend_cents)
        )
        ORDER BY n_orders DESC, spend_cents DESC, custkey
"""


@register(
    "q_skyline_grid",
    oracle=_SKYLINE_ORACLE,
    doc=(
        "Skyline with GRID PRE-FILTER — the scale refinement "
        "q_skyline's docstring promises, implemented and proven: "
        "points bucket into fixed cells over (order count, spend); a "
        "cell is discarded wholesale when any strictly-up-and-right "
        "cell is occupied (every point there strictly dominates every "
        "point here — cell bounds guarantee it), and only the "
        "surviving fraction reaches the exact sort-based pass. "
        "Pruning happens on the CELL table (thousands of rows from "
        "billions of points: one tiny broadcast self-join), so at "
        "100 TB the global sort runs over survivors only — typically "
        "the top-right shell. Dominated-only pruning means the final "
        "frontier is IDENTICAL to the unfiltered skyline, which the "
        "shared definitional oracle hash-proves; the pruning actually "
        "firing on the fixture is pinned in pytest."
    ),
    tags=("completeness", "window"),
)
def q_skyline_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders", assert_schema=False)
    agg = orders.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long")).alias(
            "spend_cents"
        ),
    )
    SX, SY = 2, 2_000_000  # fixed cell sizes: ~orders step, $20k step
    pts = agg.withColumn("gx", F.expr(f"n_orders div {SX}")).withColumn(
        "gy", F.expr(f"spend_cents div {SY}")
    )
    cells = pts.groupBy("gx", "gy").agg(F.count(F.lit(1)).alias("npts"))
    c = cells.alias("c")
    d = cells.alias("d")
    # a cell dies if ANY strictly-up-and-right cell is occupied
    doomed = (
        c.join(
            F.broadcast(d),
            (F.col("d.gx") > F.col("c.gx")) & (F.col("d.gy") > F.col("c.gy")),
            "left_semi",
        )
        .select(F.col("c.gx").alias("gx"), F.col("c.gy").alias("gy"))
    )
    survivors = pts.join(F.broadcast(doomed), ["gx", "gy"], "left_anti")
    return skyline_2d(survivors, "n_orders", "spend_cents").select(
        "custkey", "n_orders", "spend_cents"
    ).orderBy(F.desc("n_orders"), F.desc("spend_cents"), "custkey")


@register(
    "q_path_trigrams",
    oracle="""
        WITH ordered AS (
            SELECT user_id, event_type, ts, event_id,
                   lag(event_type)    OVER w AS p1,
                   lag(event_type, 2) OVER w AS p2
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        )
        SELECT p2 AS step1, p1 AS step2, event_type AS step3,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM ordered WHERE p2 IS NOT NULL
        GROUP BY p2, p1, event_type
        ORDER BY n DESC, step1, step2, step3
        LIMIT 10
    """,
    doc=(
        "Top event-type PATHS (length-3 journeys): the sequential-"
        "pattern complement of q_event_transitions' one-step matrix — "
        "'view -> click -> purchase' vs 'view -> click -> view' is the "
        "difference the transition matrix cannot see (Markov order-1 "
        "forgets step 1). Two stacked lag() calls over the shared "
        "per-user window produce each event's two predecessors with "
        "ZERO additional shuffles beyond the one user_id exchange; "
        "counts roll into at most |types|^3 rows regardless of corpus "
        "size, then TakeOrderedAndProject. The general-n form swaps "
        "the lags for the same windowed collect + in-array n-gram HOF "
        "q_bigram_counts uses on tokens."
    ),
    tags=("completeness", "window", "agg"),
)
def q_path_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events", assert_schema=False)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        events.withColumn("p1", F.lag("event_type").over(w))
        .withColumn("p2", F.lag("event_type", 2).over(w))
        .filter(F.col("p2").isNotNull())
        .groupBy(
            F.col("p2").alias("step1"),
            F.col("p1").alias("step2"),
            F.col("event_type").alias("step3"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "step1", "step2", "step3")
        .limit(10)
    )


@register(
    "q_conversion_lag",
    oracle="""
        WITH pairs AS (
            SELECT s.user_id,
                   min(epoch_us(p.ts) - epoch_us(s.ts)) AS lag_us
            FROM events s
            JOIN events p
              ON s.user_id = p.user_id
             AND p.event_type = 'purchase'
             AND p.ts > s.ts
            WHERE s.event_type = 'signup'
            GROUP BY s.user_id, s.event_id
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_converted,
               CAST(floor(quantile_cont(lag_us, 0.5))  AS BIGINT) AS p50_us,
               CAST(floor(quantile_cont(lag_us, 0.95)) AS BIGINT) AS p95_us,
               CAST(MIN(lag_us) AS BIGINT) AS min_us,
               CAST(MAX(lag_us) AS BIGINT) AS max_us
        FROM pairs
    """,
    doc=(
        "Conversion-lag distribution: per signup, the time to the "
        "user's FIRST subsequent purchase, summarized as exact "
        "interpolated percentiles (p50/p95) plus the support count — "
        "the funnel-latency readout that turns q_funnel's 'did they "
        "convert' into 'how fast'. Lags are exact integer microseconds "
        "(epoch subtraction), and floor() snaps the interpolated "
        "quantile to an integer so no raw float crosses the hash. The "
        "per-user equi-join anchors the shuffle; the min-per-signup "
        "aggregation collapses the pair fan-out before the tiny global "
        "percentile. At 100 TB the percentile swaps to "
        "percentile_approx under the q_approx_stats_bounded error "
        "contract; everything upstream is unchanged."
    ),
    tags=("completeness", "agg", "join"),
)
def q_conversion_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events", assert_schema=False)
    signups = events.filter(F.col("event_type") == "signup").select(
        F.col("user_id").alias("su"), F.col("event_id").alias("sid"),
        F.col("ts").alias("sts"),
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("pu"), F.col("ts").alias("pts")
    )
    pairs = (
        signups.join(
            purchases, (F.col("su") == F.col("pu")) & (F.col("pts") > F.col("sts"))
        )
        .groupBy("su", "sid")
        .agg(
            F.min(F.unix_micros("pts") - F.unix_micros("sts")).alias("lag_us")
        )
    )
    return pairs.agg(
        F.count(F.lit(1)).alias("n_converted"),
        F.floor(F.percentile("lag_us", 0.5)).cast("long").alias("p50_us"),
        F.floor(F.percentile("lag_us", 0.95)).cast("long").alias("p95_us"),
        F.min("lag_us").cast("long").alias("min_us"),
        F.max("lag_us").cast("long").alias("max_us"),
    )


# --- EWMA anomaly detection (round 11) -------------------------------
# alpha = 1/4 with a 12-lag truncated horizon makes every weight an
# INTEGER: scaling the prediction by 4^12, weight_j = 3^(j-1) * 4^(12-j)
# for lag j in 1..12, and the normalizer is the closed-form geometric
# sum 4^12 - 3^12. The residual test D*y_t - P is then exact BIGINT
# arithmetic — no float EWMA state ever exists, the same
# no-float-mean trick as q_cusum_changepoint.
_EWMA_LAGS = 12
_EWMA_W = [3 ** (j - 1) * 4 ** (_EWMA_LAGS - j) for j in range(1, _EWMA_LAGS + 1)]
_EWMA_D = 4**_EWMA_LAGS - 3**_EWMA_LAGS  # == sum(_EWMA_W)


@register(
    "q_ewma_anomaly",
    oracle=f"""
        WITH daily AS (
            SELECT event_type,
                   date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS x,
                   SUM(CAST(round(value * 100, 0) AS BIGINT)) AS y
            FROM events
            GROUP BY event_type, date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))
        ), lagged AS (
            SELECT event_type, x, y,
                   {" + ".join(
                       f"{w} * lag(y, {j}) OVER w"
                       for j, w in enumerate(_EWMA_W, start=1)
                   )} AS p,
                   lag(y, {_EWMA_LAGS}) OVER w AS oldest
            FROM daily
            WINDOW w AS (PARTITION BY event_type ORDER BY x)
        ), resid AS (
            SELECT event_type, x, y, p,
                   {_EWMA_D} * y - p AS r
            FROM lagged WHERE oldest IS NOT NULL
        )
        SELECT event_type,
               CAST(x AS BIGINT) AS day,
               CAST(y AS BIGINT) AS y_cents,
               {{rnd}} AS ewma_pred_cents,
               CAST(r AS BIGINT) AS resid_scaled,
               CAST(CASE WHEN r >= 0 THEN 1 ELSE -1 END AS BIGINT) AS direction
        FROM resid
        QUALIFY row_number() OVER (PARTITION BY event_type
                                   ORDER BY abs(r) DESC, x) <= 3
        ORDER BY event_type, abs(resid_scaled) DESC, day
    """.replace("{rnd}", "(floor((CAST(p AS DOUBLE) / " + str(_EWMA_D)
                + ") * 100 + 0.5) / 100)"),
    doc=(
        "EWMA ANOMALY DETECTION (round 11) — the standard ops-"
        "monitoring 'is today's value off-trend?' query: an "
        "exponentially weighted moving average predicts each day's "
        "revenue per event type from the prior 12 observed days, and "
        "the 3 largest |actual - predicted| residuals per type are "
        "flagged. alpha = 1/4 and the 12-lag truncation make every "
        "weight an exact INTEGER (w_j = 3^(j-1) * 4^(12-j), "
        "normalizer 4^12 - 3^12 in closed form), so the residual "
        "D*y - P, its argmax ranking, and the shift direction are "
        "integer-exact across engines — the q_cusum_changepoint "
        "no-float-mean trick applied to exponential smoothing. "
        "Two-phase: the corpus collapses to O(types x days) in one "
        "rollup shuffle, then 12 lag() taps over one ordered window "
        "per type; at 100 TB the streaming twin is a single "
        "(running numerator) state value per type updated as "
        "P' = 3*(P + w_1*y)/4 in integers. The prediction is emitted "
        "in cents at 2dp through the tie-deterministic floor grid "
        "(one exact-double division, identical operands both "
        "engines)."
    ),
    tags=("extension", "window", "timeseries"),
)
def q_ewma_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events", assert_schema=False)
    daily = events.groupBy(
        "event_type",
        F.datediff(F.col("ts").cast("date"), F.lit("2024-01-01").cast("date")).alias("x"),
    ).agg(F.sum(F.round(F.col("value") * 100, 0).cast("long")).alias("y"))
    w = Window.partitionBy("event_type").orderBy("x")
    pred = None
    for j, wj in enumerate(_EWMA_W, start=1):
        term = F.lit(wj) * F.lag("y", j).over(w)
        pred = term if pred is None else pred + term
    lagged = daily.select(
        "event_type",
        "x",
        "y",
        pred.alias("p"),
        F.lag("y", _EWMA_LAGS).over(w).alias("oldest"),
    ).where(F.col("oldest").isNotNull())
    resid = lagged.withColumn("r", F.lit(_EWMA_D) * F.col("y") - F.col("p"))
    wr = Window.partitionBy("event_type").orderBy(F.abs(F.col("r")).desc(), F.asc("x"))
    return (
        resid.withColumn("rn", F.row_number().over(wr))
        .where(F.col("rn") <= 3)
        .select(
            "event_type",
            F.col("x").cast("long").alias("day"),
            F.col("y").alias("y_cents"),
            (
                F.floor((F.col("p").cast("double") / F.lit(float(_EWMA_D))) * 100 + F.lit(0.5))
                / F.lit(100.0)
            ).alias("ewma_pred_cents"),
            F.col("r").cast("long").alias("resid_scaled"),
            F.when(F.col("r") >= 0, 1).otherwise(-1).cast("long").alias("direction"),
        )
        .orderBy("event_type", F.abs(F.col("resid_scaled")).desc(), "day")
    )
