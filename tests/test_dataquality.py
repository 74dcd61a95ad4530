"""Semantic invariants for the data-quality / table-maintenance tier
(operators/dataquality.py + q_corrupt_ingest), beyond the oracle hash:
each check's violation count is re-derived independently from the
fixture, and the plan shapes that make these 100 TB-viable are pinned
(broadcast anti-join for RI; hash-compare diff shuffles only the
3-column projection)."""

from pyspark.sql import functions as F

from benchmark_spark.catalog import load_table
from benchmark_spark.operators.dataquality import (
    q_dq_checks,
    q_equidepth_hist,
    q_latest_snapshot,
    q_snapshot_diff,
)
from benchmark_spark.sources.readers import q_corrupt_ingest
from tests.conftest import SF_SMOKE


def _orders(spark):
    return load_table(spark, SF_SMOKE, "orders", assert_schema=False)


def test_dq_checks_match_independent_counts(spark):
    got = {r["check_name"]: r["violations"] for r in q_dq_checks(spark, SF_SMOKE).collect()}
    orders = _orders(spark)
    # clean fixture: the only expected violations are out-of-range dates
    assert got["dup_orderkey"] == 0
    assert got["null_custkey"] == 0
    assert got["nonpositive_price"] == 0
    assert got["orphan_custkey"] == 0
    expected_dates = orders.filter(
        (F.col("o_orderdate") < F.lit("1995-01-01").cast("timestamp"))
        | (F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp"))
    ).count()
    assert got["date_out_of_range"] == expected_dates > 0


def test_dq_checks_ri_is_broadcast_anti_join(spark):
    plan = q_dq_checks(spark, SF_SMOKE)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
    assert "SortMergeJoin" not in plan  # the fact side never shuffles


def test_snapshot_diff_census_matches_construction(spark):
    got = {r["change_type"]: r["n"] for r in q_snapshot_diff(spark, SF_SMOKE).collect()}
    orders = _orders(spark)
    k = F.col("o_orderkey")
    n_inserted = orders.filter(k % 50 == 17).count()  # missing from old
    n_updated = orders.filter((k % 37 == 5) & (k % 50 != 17)).count()
    total = orders.count()
    assert got.get("insert", 0) == n_inserted
    assert got.get("update", 0) == n_updated
    assert got.get("delete", 0) == 0  # old snapshot is a strict subset
    assert got.get("unchanged", 0) == total - n_inserted - n_updated
    assert n_inserted > 0 and n_updated > 0


def test_snapshot_diff_shuffles_only_projected_columns(spark):
    plan = q_snapshot_diff(spark, SF_SMOKE)._jdf.queryExecution().executedPlan().toString()
    # column pruning reaches the scan: the diff never reads the other
    # three orders columns, so the shuffled rows stay ~24 bytes
    assert "o_orderdate" not in plan
    assert "o_orderpriority" not in plan


def test_latest_snapshot_version_accounting(spark):
    rows = q_latest_snapshot(spark, SF_SMOKE).collect()
    orders = _orders(spark)
    k = F.col("o_orderkey")
    n_v2 = orders.filter(k % 20 == 3).count()
    n_v1_only = orders.filter((k % 10 == 3) & (k % 20 != 3)).count()
    assert sum(r["version_total"] for r in rows) == 2 * n_v2 + n_v1_only
    assert sum(r["n"] for r in rows) == orders.count()  # one row per key


def test_equidepth_hist_buckets_are_balanced_and_ordered(spark):
    rows = q_equidepth_hist(spark, SF_SMOKE).collect()
    total = _orders(spark).count()
    counts = [r["n"] for r in rows]
    assert sum(counts) == total
    assert max(counts) - min(counts) <= 1  # equi-depth by definition
    bounds = [(r["lo"], r["hi"]) for r in rows]
    assert all(lo <= hi for lo, hi in bounds)
    # non-overlapping: each bucket starts at or after the previous end
    assert all(bounds[i + 1][0] >= bounds[i][1] for i in range(len(bounds) - 1))


def test_corrupt_ingest_quarantines_exactly_the_damaged_lines(spark):
    row = q_corrupt_ingest(spark, SF_SMOKE).collect()[0]
    orders = _orders(spark)
    n_bad = orders.filter(F.col("o_orderkey") % 13 == 0).count()
    assert row["n_corrupt"] == n_bad > 0
    assert row["n_good"] == orders.count() - n_bad


def _overlapping_row_groups(path):
    """Count parquet row groups whose (cb, mi) min/max stats overlap
    the q_zorder_layout box predicate (cb < 16, 24 <= mi <= 36) — the
    groups a stats-pruning scan must actually read."""
    import glob

    import pyarrow.parquet as pq

    total = hits = 0
    for f in glob.glob(f"{path}/*.parquet"):
        pf = pq.ParquetFile(f)
        names = pf.schema_arrow.names
        ci, mi = names.index("cb"), names.index("mi")
        for rg in range(pf.num_row_groups):
            md = pf.metadata.row_group(rg)
            s_cb, s_mi = md.column(ci).statistics, md.column(mi).statistics
            total += 1
            if s_cb.min < 16 and s_mi.min <= 36 and s_mi.max >= 24:
                hits += 1
    return total, hits


def test_zorder_layout_skips_most_row_groups(spark):
    from benchmark_spark.sources.readers import (
        stage_linear_orders,
        stage_zorder_orders,
    )

    z_total, z_hits = _overlapping_row_groups(stage_zorder_orders(spark, SF_SMOKE))
    l_total, l_hits = _overlapping_row_groups(stage_linear_orders(spark, SF_SMOKE))
    # same data, same row-group size: the 1-D key sort leaves both
    # z-dimensions unclustered, so (nearly) every group overlaps the
    # box; z-order confines the box to a fraction of the groups.
    assert l_hits >= l_total * 0.9
    assert z_hits < l_hits
    assert z_hits <= z_total * 0.5


def test_zorder_interleave_is_monotone_in_box_locality():
    # pure-python twin of zorder_col: adjacent cells interleave to
    # nearby z values; distant cells to distant z values
    def z(x, y):
        acc = 0
        for i in range(8):
            acc |= ((x >> i) & 1) << (2 * i) | ((y >> i) & 1) << (2 * i + 1)
        return acc

    assert z(0, 0) == 0 and z(1, 0) == 1 and z(0, 1) == 2 and z(1, 1) == 3
    # the 2x2 block (0..1)^2 packs into z 0..3, the (2..3)^2 block into 12..15
    assert max(z(x, y) for x in (0, 1) for y in (0, 1)) < min(
        z(x, y) for x in (2, 3) for y in (2, 3)
    )


def test_fuzzy_join_rematches_nearly_all_damaged_names(spark):
    from benchmark_spark.operators.dataquality import q_fuzzy_join

    part = load_table(spark, SF_SMOKE, "part", assert_schema=False)
    n_parts = part.count()
    rows = q_fuzzy_join(spark, SF_SMOKE).collect()
    # trigram blocking + one-char deletion: nearly every record matches
    assert len(rows) >= n_parts * 0.95
    # and the matched catalog NAME is usually the pre-damage original
    # (duplicate names make key equality the wrong notion; short
    # two-word names are genuinely ambiguous after a deletion, which
    # caps accuracy ~87-88% at these SFs — measured, not aspirational)
    correct = sum(r["name_correct"] for r in rows)
    assert correct >= len(rows) * 0.8
    assert all(3000 <= r["jacc_bp"] <= 10000 for r in rows)


def test_skyline_algorithm_matches_definition_on_anticorrelated_data(spark):
    """The window-based O(n log n) skyline must equal the quadratic
    NOT-EXISTS definition on data with a LARGE frontier (the fixture's
    frontier is 1-2 points; anti-correlated data maximizes it)."""
    from benchmark_spark.operators.windows import skyline_2d

    # anti-correlated frontier (x, 100-x) + dominated interior points
    pts = [(i, float(i), float(100 - i)) for i in range(0, 101, 5)]
    pts += [(1000 + i, float(i), float(50 - i)) for i in range(0, 45, 5)]
    pts += [(2000, 10.0, 90.0), (2001, 10.0, 90.0)]  # full tie: both stay
    df = spark.createDataFrame(pts, "id long, x double, y double")
    got = {r["id"] for r in skyline_2d(df, "x", "y").collect()}
    a = df.alias("a")
    b = df.alias("b")
    dominated = {
        r["id"]
        for r in a.join(
            b,
            (F.col("b.x") >= F.col("a.x"))
            & (F.col("b.y") >= F.col("a.y"))
            & ((F.col("b.x") > F.col("a.x")) | (F.col("b.y") > F.col("a.y"))),
        )
        .select(F.col("a.id").alias("id"))
        .collect()
    }
    want = {r["id"] for r in df.collect()} - dominated
    assert got == want
    assert {2000, 2001} <= got  # tied pair both on the frontier
    assert len(got) >= 21  # the anti-correlated ridge survives intact


def test_skyline_handles_fractional_x_spacing(spark):
    """Regression (ADVICE.md r5): distinct x values closer than 1 apart.
    The pre-fix RANGE frame on raw x treated x=10.0 as NOT strictly
    above x=10.5-1=9.5, so a point dominated by a neighbor within 1.0
    survived. dense_rank re-indexing makes spacing irrelevant."""
    from benchmark_spark.operators.windows import skyline_2d

    pts = [
        (1, 10.5, 5.0),   # frontier (best x)
        (2, 10.0, 4.0),   # dominated by id=1 (x and y both lower)
        (3, 10.0, 6.0),   # frontier (beats id=1 on y)
        (4, 9.75, 6.0),   # dominated by id=3
        (5, 9.5, 7.0),    # frontier
    ]
    df = spark.createDataFrame(pts, "id long, x double, y double")
    got = {r["id"] for r in skyline_2d(df, "x", "y").collect()}
    assert got == {1, 3, 5}


def test_pit_join_matches_exactly_one_version_per_order(spark):
    from benchmark_spark.operators.dataquality import q_pit_join

    rows = q_pit_join(spark, SF_SMOKE).collect()
    orders = _orders(spark)
    # validity intervals partition time: every order matches exactly once
    assert sum(r["n"] for r in rows) == orders.count()
    segs = {r["segment_at_order_time"] for r in rows}
    assert "MOVED" in segs  # post-1997 orders of custkey%5 see version 2
    assert len(segs) >= 3


def test_k_anonymity_summary_matches_direct_group_counts(spark):
    from benchmark_spark.operators.dataquality import q_k_anonymity

    row = q_k_anonymity(spark, SF_SMOKE).collect()[0]
    customer = load_table(spark, SF_SMOKE, "customer", assert_schema=False)
    sizes = [
        r["n"]
        for r in customer.groupBy("c_nationkey", "c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    ]
    assert row["n_groups"] == len(sizes)
    assert row["groups_at_risk"] == sum(1 for s in sizes if s < 5)
    assert row["rows_at_risk"] == sum(s for s in sizes if s < 5)
    assert row["min_group_size"] == min(sizes)


def test_pseudonymize_preserves_joins_and_cardinality(spark):
    from benchmark_spark.operators.dataquality import q_pseudonymize

    rows = q_pseudonymize(spark, SF_SMOKE).collect()
    orders = _orders(spark)
    customer = load_table(spark, SF_SMOKE, "customer", assert_schema=False)
    # the masked join keeps every order (FK integrity survives masking)
    assert sum(r["n"] for r in rows) == orders.count()
    # token cardinality == original key cardinality (no collisions)
    n_active = orders.select("o_custkey").distinct().count()
    assert sum(r["n_tokens"] for r in rows) == n_active
    # and no raw key leaks: tokens are 32-hex strings
    assert all(len(r["min_token"]) == 32 for r in rows)
    # revenue identical to the unmasked rollup
    unmasked = {
        r["c_mktsegment"]: r["rev"]
        for r in orders.join(customer, orders.o_custkey == customer.c_custkey)
        .groupBy("c_mktsegment")
        .agg(F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long")).alias("rev"))
        .collect()
    }
    for r in rows:
        assert abs(r["revenue"] * 100 - unmasked[r["c_mktsegment"]]) < 1


def test_event_transitions_rows_sum_to_timeline_pairs(spark):
    from benchmark_spark.operators.windows import q_event_transitions

    rows = q_event_transitions(spark, SF_SMOKE).collect()
    ev = load_table(spark, SF_SMOKE, "events", assert_schema=False)
    n_events = ev.count()
    n_users = ev.select("user_id").distinct().count()
    # every event except each user's first contributes one transition
    assert sum(r["n"] for r in rows) == n_events - n_users
    # per-source probabilities sum to ~10000 bp (integer-division slack)
    by_src = {}
    for r in rows:
        by_src.setdefault(r["prev_type"], 0)
        by_src[r["prev_type"]] += r["prob_bp"]
    assert all(9990 <= s <= 10000 for s in by_src.values())


def test_ab_readout_covers_all_purchases_deterministically(spark):
    from benchmark_spark.operators.windows import q_ab_readout

    a = {r["arm"]: r for r in q_ab_readout(spark, SF_SMOKE).collect()}
    b = {r["arm"]: r for r in q_ab_readout(spark, SF_SMOKE).collect()}
    assert a.keys() == {"control", "treatment"}
    assert all(a[k] == b[k] for k in a)  # same user -> same arm, always
    ev = load_table(spark, SF_SMOKE, "events", assert_schema=False)
    n_purch = ev.filter(F.col("event_type") == "purchase").count()
    assert a["control"]["n_purchases"] + a["treatment"]["n_purchases"] == n_purch
    # hash bucketing splits ~50/50 (loose bound; deterministic fact)
    ratio = a["control"]["n_purchases"] / n_purch
    assert 0.35 < ratio < 0.65


def test_rfm_cells_partition_the_customer_base(spark):
    from benchmark_spark.operators.windows import q_rfm_segments

    rows = q_rfm_segments(spark, SF_SMOKE).collect()
    orders = _orders(spark)
    assert sum(r["n_customers"] for r in rows) == (
        orders.select("o_custkey").distinct().count()
    )
    assert all(1 <= r[k] <= 5 for r in rows for k in ("r", "f", "m"))


def test_cusum_peak_is_the_true_argmax_of_the_walk(spark):
    from benchmark_spark.operators.windows import q_cusum_changepoint

    rows = {r["event_type"]: r for r in q_cusum_changepoint(spark, SF_SMOKE).collect()}
    ev = load_table(spark, SF_SMOKE, "events", assert_schema=False)
    # recompute the walk for one type in plain python
    daily = (
        ev.filter(F.col("event_type") == "click")
        .groupBy(F.datediff(F.col("ts").cast("date"), F.lit("2024-01-01").cast("date")).alias("x"))
        .agg(F.sum(F.round(F.col("value") * 100, 0).cast("long")).alias("y"))
        .orderBy("x")
        .collect()
    )
    nd, s = len(daily), sum(r["y"] for r in daily)
    c, walk = 0, []
    for r in daily:
        c += nd * r["y"] - s
        walk.append((r["x"], c))
    peak = max(walk, key=lambda t: (abs(t[1]), -t[0]))
    got = rows["click"]
    assert got["peak_day"] == peak[0]
    assert got["peak_cusum"] == abs(peak[1])
    # the walk returns to ~0 by construction (sum of deviations == 0)
    assert walk[-1][1] == 0


def test_ltv_curve_is_monotone_and_consistent(spark):
    from benchmark_spark.operators.windows import q_ltv_curve

    rows = q_ltv_curve(spark, SF_SMOKE).collect()
    orders = _orders(spark)
    # cumulative revenue never decreases within a cohort
    by_cohort = {}
    for r in rows:
        by_cohort.setdefault(r["cohort"], []).append(r)
    for members in by_cohort.values():
        cums = [m["cum_cents"] for m in sorted(members, key=lambda m: m["age_months"])]
        assert cums == sorted(cums)
        assert all(m["ltv_per_cust_cents"] <= m["cum_cents"] for m in members)
    # the final cumulative across cohorts equals total corpus revenue
    total = sum(max(m["cum_cents"] for m in ms) for ms in by_cohort.values())
    expect = orders.select(
        F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long"))
    ).first()[0]
    assert total == expect
    # age-0 cell exists for every cohort (the first order defines it)
    assert all(min(m["age_months"] for m in ms) == 0 for ms in by_cohort.values())


def test_twophase_equidepth_matches_ntile_up_to_boundary_ties(spark):
    from benchmark_spark.operators.dataquality import (
        q_equidepth_hist,
        q_equidepth_twophase,
    )
    from benchmark_spark.plans.inspect import simple_plan

    two = {r["bucket"]: r for r in q_equidepth_twophase(spark, SF_SMOKE).collect()}
    one = {r["bucket"]: r for r in q_equidepth_hist(spark, SF_SMOKE).collect()}
    total = _orders(spark).count()
    assert sum(r["n"] for r in two.values()) == total
    # same decile structure: per-bucket populations agree within the
    # duplicate-straddles-cutpoint slack
    assert set(two) == set(one)
    for b in one:
        assert abs(two[b]["n"] - one[b]["n"]) <= 2
    # and the scale property the variant exists for: NO sort anywhere
    plan = simple_plan(q_equidepth_twophase(spark, SF_SMOKE))
    assert "Window" not in plan
    assert plan.count("Exchange") - plan.count("BroadcastExchange") <= 3


def test_grouping_id_separates_subtotals_from_data(spark):
    from benchmark_spark.operators.dataquality import q_grouping_id

    rows = q_grouping_id(spark, SF_SMOKE).collect()
    gids = {}
    for r in rows:
        gids.setdefault(r["gid"], []).append(r)
    assert set(gids) == {0, 1, 3}  # detail, per-status subtotal, grand
    total = _orders(spark).count()
    assert sum(r["n"] for r in gids[0]) == total
    assert sum(r["n"] for r in gids[1]) == total
    assert gids[3][0]["n"] == total and gids[3][0]["status"] == "(all)"


def test_hotcold_salting_exercises_both_paths(spark):
    from benchmark_spark.operators.skew import HOT_THRESHOLD, q_salted_hotcold

    li = load_table(spark, SF_SMOKE, "lineitem", assert_schema=False)
    freq = li.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("c"))
    n_hot = freq.filter(F.col("c") > HOT_THRESHOLD).count()
    n_cold = freq.filter(F.col("c") <= HOT_THRESHOLD).count()
    # the fixture must make the query exercise BOTH the salted and the
    # plain path, else the rewrite is vacuously correct
    assert n_hot > 0 and n_cold > 0
    rows = q_salted_hotcold(spark, SF_SMOKE).collect()
    assert sum(r["n"] for r in rows) == li.count()  # no row lost or duplicated


def test_skyline_grid_prunes_and_preserves_the_frontier(spark):
    from benchmark_spark.operators.windows import q_skyline, q_skyline_grid
    from benchmark_spark.registry import get_query

    full = [tuple(r) for r in q_skyline(spark, SF_SMOKE).collect()]
    grid = [tuple(r) for r in q_skyline_grid(spark, SF_SMOKE).collect()]
    assert grid == full  # dominated-only pruning: identical frontier
    # and the pre-filter actually discards points on this fixture
    orders = _orders(spark)
    agg = orders.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long")).alias(
            "spend_cents"
        ),
    )
    pts = agg.withColumn("gx", F.expr("n_orders div 2")).withColumn(
        "gy", F.expr("spend_cents div 2000000")
    )
    cells = pts.groupBy("gx", "gy").count()
    c, d = cells.alias("c"), cells.alias("d")
    doomed = c.join(
        d,
        (F.col("d.gx") > F.col("c.gx")) & (F.col("d.gy") > F.col("c.gy")),
        "left_semi",
    ).count()
    assert doomed > cells.count() * 0.5  # most cells never reach the sort


def test_path_trigrams_counts_match_timeline_arithmetic(spark):
    from benchmark_spark.operators.windows import q_path_trigrams

    rows = q_path_trigrams(spark, SF_SMOKE).collect()
    assert len(rows) == 10 and all(r["n"] > 0 for r in rows)
    ns = [r["n"] for r in rows]
    assert ns == sorted(ns, reverse=True)


def test_conversion_lag_bounds_are_ordered(spark):
    from benchmark_spark.operators.windows import q_conversion_lag

    r = q_conversion_lag(spark, SF_SMOKE).collect()[0]
    assert r["n_converted"] > 0
    assert r["min_us"] <= r["p50_us"] <= r["p95_us"] <= r["max_us"]
    assert r["min_us"] > 0  # strictly-after purchases only
