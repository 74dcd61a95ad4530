"""Aggregate semantics beyond the oracle gate: native stddev/var vs
the exact-sum formula, approx sketches error-bounded vs exact,
exact percentile vs approx."""

import math

from pyspark.sql import functions as F

from benchmark_spark.catalog import load_table
from benchmark_spark.operators.aggregates import dsum
from tests.conftest import SF_SMOKE


def test_native_stddev_matches_exact_formula(spark):
    orders = load_table(spark, SF_SMOKE, "orders")
    n = F.count(F.lit(1))
    s1 = dsum(F.col("o_totalprice"))
    s2 = F.sum(
        (F.col("o_totalprice") * F.col("o_totalprice")).cast("decimal(38,6)")
    ).cast("double")
    rows = orders.groupBy("o_orderstatus").agg(
        F.stddev_samp("o_totalprice").alias("native"),
        F.sqrt((s2 - s1 * s1 / n) / (n - 1)).alias("manual"),
    ).collect()
    for r in rows:
        assert math.isclose(r["native"], r["manual"], rel_tol=1e-9)


def test_approx_count_distinct_error_bound(spark):
    orders = load_table(spark, SF_SMOKE, "orders")
    row = orders.agg(
        F.countDistinct("o_custkey").alias("exact"),
        F.approx_count_distinct("o_custkey", 0.02).alias("approx"),
    ).first()
    assert abs(row["approx"] - row["exact"]) / row["exact"] < 0.05


def test_percentile_approx_near_exact(spark):
    orders = load_table(spark, SF_SMOKE, "orders")
    row = orders.agg(
        F.percentile("o_totalprice", 0.5).alias("exact"),
        F.percentile_approx("o_totalprice", 0.5, 10000).alias("approx"),
    ).first()
    assert abs(row["approx"] - row["exact"]) / row["exact"] < 0.01


def test_dsum_is_exact_fixed_point(spark):
    """dsum recovers the exact decimal sum where a double sum has
    representation error."""
    df = spark.createDataFrame([(0.1,)] * 10, ["x"])
    row = df.agg(
        dsum(F.col("x")).alias("fixed"), F.sum("x").alias("dbl")
    ).first()
    assert row["fixed"] == 1.0
    assert row["dbl"] != 1.0  # the motivating error


def test_grouping_sets_sql_surface(spark):
    """GROUPING SETS via SQL (rollup/cube covered by the oracle gate)."""
    from benchmark_spark.catalog import load_tables

    load_tables(spark, SF_SMOKE)
    rows = spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    ).collect()
    statuses = [r for r in rows if r["o_orderstatus"] is not None]
    prios = [r for r in rows if r["o_orderpriority"] is not None]
    grand = [r for r in rows if r["o_orderstatus"] is None and r["o_orderpriority"] is None]
    assert len(statuses) == 3 and len(prios) == 5 and len(grand) == 1
    assert grand[0]["n"] == 1500


def test_native_corr_matches_exact_formula(spark):
    from benchmark_spark.registry import all_specs

    manual = {
        r["l_returnflag"]: r["corr_qty_price"]
        for r in all_specs()["q_corr"].fn(spark, SF_SMOKE).collect()
    }
    li = load_table(spark, SF_SMOKE, "lineitem")
    native = {
        r["l_returnflag"]: r["c"]
        for r in li.groupBy("l_returnflag")
        .agg(F.corr("l_quantity", "l_extendedprice").alias("c"))
        .collect()
    }
    for k in native:
        assert math.isclose(native[k], manual[k], rel_tol=1e-4, abs_tol=1e-6)


def test_retention_cohort_cells_are_bounded_by_cohort_size(spark):
    from benchmark_spark.operators.aggregates import q_retention_cohort

    rows = q_retention_cohort(spark, SF_SMOKE).collect()
    assert rows
    day0 = {r["cohort"]: r["n_users"] for r in rows if r["offset_days"] == 0}
    # every cohort has its day-0 cell (users are active on first-seen day)
    cohorts = {r["cohort"] for r in rows}
    assert set(day0) == cohorts
    for r in rows:
        assert r["offset_days"] >= 0
        assert 0 < r["n_users"] <= day0[r["cohort"]]


def test_trailing_active_dominates_daily_active(spark):
    """WAU(d) >= DAU(d) for every day, and equals DAU on the first day."""
    from benchmark_spark.operators.aggregates import q_trailing_active

    events = load_table(spark, SF_SMOKE, "events", assert_schema=False)
    dau = {
        r["day"]: r["n"]
        for r in events.select(
            F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day"),
            "user_id",
        )
        .distinct()
        .groupBy("day")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    rows = q_trailing_active(spark, SF_SMOKE).collect()
    assert rows[0]["wau"] == dau[rows[0]["day"]]
    for r in rows:
        assert r["wau"] >= dau.get(r["day"], 0)


def test_session_labels_match_session_window_count(spark):
    """Total sessions from per-event labels == number of session_window
    groups (same 30-minute gap rule)."""
    from benchmark_spark.operators.aggregates import q_session_labels

    labels = q_session_labels(spark, SF_SMOKE)
    n_sessions = (
        labels.groupBy("user_id")
        .agg(F.max("session_idx").alias("m"))
        .agg(F.sum("m"))
        .collect()[0][0]
    )
    events = load_table(spark, SF_SMOKE, "events", assert_schema=False)
    via_window = (
        events.groupBy(
            F.session_window("ts", "30 minutes").alias("sw"), "user_id"
        )
        .count()
        .count()
    )
    assert n_sessions == via_window


def test_profile_single_scan_and_exact_stats(spark):
    from benchmark_spark.operators.aggregates import q_profile
    from benchmark_spark.plans.inspect import formatted_plan

    df = q_profile(spark, SF_SMOKE)
    rows = {r["col"]: r for r in df.collect()}
    orders = load_table(spark, SF_SMOKE, "orders", assert_schema=False)
    n = orders.count()
    assert rows["o_orderkey"]["n"] == n
    assert rows["o_orderkey"]["n_nonnull"] == n  # fixtures carry no NULLs
    assert rows["o_orderkey"]["n_distinct"] == n  # primary key
    assert rows["o_custkey"]["n_distinct"] <= n
    assert rows["o_totalprice"]["min_v"] <= rows["o_totalprice"]["max_v"]
    # the profile reads the parquet relation exactly once (formatted
    # mode prints each node twice: tree line + "(N) Scan parquet" detail)
    import re

    plan = formatted_plan(df)
    assert len(re.findall(r"^\(\d+\) Scan parquet", plan, re.M)) == 1
    assert "Expand" in plan  # the multi-distinct rewrite, not a self-join


def test_heavy_hitters_ranks_true_counts(spark):
    from benchmark_spark.operators.aggregates import q_heavy_hitters

    rows = q_heavy_hitters(spark, SF_SMOKE).collect()
    assert len(rows) == 20
    cnts = [r["cnt"] for r in rows]
    assert cnts == sorted(cnts, reverse=True)
    li = load_table(spark, SF_SMOKE, "lineitem", assert_schema=False)
    true_top = (
        li.groupBy("l_partkey").count().orderBy(F.desc("count"), "l_partkey").first()
    )
    assert rows[0]["key"] == true_top["l_partkey"]
    assert rows[0]["cnt"] == true_top["count"]
    n = li.count()
    for r in rows:
        assert r["share_ppm"] == r["cnt"] * 1_000_000 // n


def test_zscore_outliers_match_stddev_pop_recompute(spark):
    from benchmark_spark.operators.aggregates import q_zscore_outliers

    got = {r["event_type"]: r["n_outliers"] for r in q_zscore_outliers(spark, SF_SMOKE).collect()}
    events = load_table(spark, SF_SMOKE, "events", assert_schema=False)
    stats = events.groupBy("event_type").agg(
        F.avg("value").alias("mu"), F.stddev_pop("value").alias("sd")
    )
    want = {
        r["event_type"]: r["n"]
        for r in events.join(stats, "event_type")
        .filter(F.abs(F.col("value") - F.col("mu")) / F.col("sd") > 3.0)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    # fixed-point pipeline may differ from float recompute only for
    # events sitting exactly at the 4dp-snapped threshold; on this
    # fixture none do
    assert got == want


def test_crosstab_chi2_matches_numpy(spark):
    import numpy as np

    from benchmark_spark.operators.aggregates import q_crosstab_chi2

    row = q_crosstab_chi2(spark, SF_SMOKE).collect()[0]
    docs = load_table(spark, SF_SMOKE, "documents", assert_schema=False)
    obs = docs.groupBy("lang", "source").count().collect()
    langs = sorted({r["lang"] for r in obs})
    srcs = sorted({r["source"] for r in obs})
    m = np.zeros((len(langs), len(srcs)))
    for r in obs:
        m[langs.index(r["lang"]), srcs.index(r["source"])] = r["count"]
    e = m.sum(1, keepdims=True) * m.sum(0, keepdims=True) / m.sum()
    chi2 = ((m - e) ** 2 / e).sum()
    assert row["n_cells"] == len(langs) * len(srcs)
    assert row["dof"] == (len(langs) - 1) * (len(srcs) - 1)
    assert abs(row["chi2"] - chi2) < 1e-2


def test_split_distinct_agg_null_group_key(spark):
    """ADVICE r12: a NULL group key is a real SQL group — the
    distinct-count side must join back null-safely, so a NULL-status
    group with non-NULL custkeys keeps its exact COUNT(DISTINCT)
    instead of being zero-filled by a never-matching equi-join."""
    from benchmark_spark.operators.aggregates import _split_distinct_agg

    df = spark.createDataFrame(
        [("O", 1), ("O", 1), ("O", 2), (None, 7), (None, 7), (None, 8), (None, None)],
        "o_orderstatus string, o_custkey int",
    )
    out = _split_distinct_agg(
        df, F.count(F.lit(1)).alias("n"), cd_alias="exact_cd"
    ).collect()
    got = {r["o_orderstatus"]: r["exact_cd"] for r in out}
    assert got == {"O": 2, None: 2}
