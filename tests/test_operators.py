

def test_benford_shares_sum_to_a_million(spark):
    """The 9 observed shares partition the rows: share_ppm sums to
    ~1e6 (integer floor division loses at most 8 ppm) and n sums to
    the positive-price row count."""
    from benchmark_spark.registry import all_specs
    from benchmark_spark.catalog import load_table

    rows = all_specs()["q_benford"].fn(spark, "/root/testdata/sf0.001").collect()
    assert [r["digit"] for r in rows] == list(range(1, 10))
    total_share = sum(r["share_ppm"] for r in rows)
    assert 1_000_000 - 8 <= total_share <= 1_000_000
    li = load_table(spark, "/root/testdata/sf0.001", "lineitem", assert_schema=False)
    from pyspark.sql import functions as F
    want = li.filter(F.col("l_extendedprice") > 0).count()
    assert sum(r["n"] for r in rows) == want


def test_psi_and_ks_detect_no_drift_between_random_halves(spark):
    """Even/odd user_id cohorts draw from the same distribution, so
    both monitors must read 'no drift': PSI well under the 0.1
    investigate threshold and KS d_ppm under 5% — while remaining
    internally consistent (psi_total = fixed-point sum of terms;
    0 <= d_num <= na*nb)."""
    from benchmark_spark.registry import all_specs

    S = all_specs()
    psi = S["q_psi"].fn(spark, "/root/testdata/sf0.001").collect()
    assert len(psi) == 40
    total = psi[0]["psi_total"]
    assert all(abs(r["psi_total"] - total) < 1e-9 for r in psi)
    assert total == round(sum(round(r["psi_term"] * 1e6) for r in psi) / 1e6, 6)
    assert total < 0.1  # same-distribution cohorts: no drift signal
    (ks,) = S["q_ks_drift"].fn(spark, "/root/testdata/sf0.001").collect()
    assert 0 <= ks["d_num"] <= ks["na"] * ks["nb"]
    # alpha = 0.05 two-sample critical value: same-distribution halves
    # must NOT reject
    crit = 1.358 * ((ks["na"] + ks["nb"]) / (ks["na"] * ks["nb"])) ** 0.5
    assert ks["d_ppm"] < crit * 1e6


def test_feature_hash_weights_are_signed_counts(spark):
    """Every event contributes exactly 2 tokens, so the sum of
    |weight| is at most 2x the event count (collisions can cancel),
    and every dim is inside the 32-dim space."""
    from benchmark_spark.catalog import load_table
    from benchmark_spark.registry import all_specs

    rows = all_specs()["q_feature_hash"].fn(spark, "/root/testdata/sf0.001").collect()
    assert rows
    assert all(0 <= r["dim"] < 32 for r in rows)
    n_events = load_table(
        spark, "/root/testdata/sf0.001", "events", assert_schema=False
    ).count()
    assert sum(abs(r["weight"]) for r in rows) <= 2 * n_events


def test_hll_sketch_registers_and_estimate(spark):
    """HLL invariants at sf0.001 (1,473 distinct orderkeys): the
    histogram covers exactly 256 registers, sum_scaled equals the
    fixed-point register sum recomputed from the histogram, and the
    256-register estimate lands within 5 standard errors
    (5 * 1.04/sqrt(256) = 32.5%) of the exact distinct count."""
    from benchmark_spark.registry import all_specs

    rows = all_specs()["q_hll_sketch"].fn(spark, "/root/testdata/sf0.001").collect()
    assert sum(r["n_registers"] for r in rows) == 256
    sum_scaled = rows[0]["sum_scaled"]
    assert sum_scaled == sum(r["n_registers"] * (1 << (53 - r["rho"])) for r in rows)
    exact = rows[0]["exact_distinct"]
    assert exact == 1473
    assert abs(rows[0]["est_hll"] - exact) / exact < 0.325
    assert all(abs(r["rel_err_pct"] - rows[0]["rel_err_pct"]) < 1e-9 for r in rows)


def test_kmv_theta_set_algebra(spark):
    """KMV invariants: union exact >= each segment exact, the
    inclusion-exclusion identity holds exactly on the EXACT side
    (xa + xb - xu = xi), each segment estimate is within 5 standard
    errors (5/sqrt(64) ~= 62%) of exact, and est columns are finite."""
    from benchmark_spark.registry import all_specs

    rows = {
        r["measure"]: r
        for r in all_specs()["q_kmv_theta"].fn(spark, "/root/testdata/sf0.001").collect()
    }
    assert set(rows) == {"seg_a", "seg_b", "union", "intersect"}
    xa, xb = rows["seg_a"]["exact_distinct"], rows["seg_b"]["exact_distinct"]
    xu, xi = rows["union"]["exact_distinct"], rows["intersect"]["exact_distinct"]
    assert xu >= max(xa, xb) and xa + xb - xu == xi
    for m in ("seg_a", "seg_b", "union"):
        r = rows[m]
        assert abs(r["est_distinct"] - r["exact_distinct"]) / r["exact_distinct"] < 0.625


def test_bloom_join_is_exact_after_rerank(spark):
    """The Bloom pre-filter never loses a true match (no false
    negatives by construction) and the false-positive rate sits below
    the analytic bound (1 - e^(-2n/m))^2 * 4 slack; revenue equals the
    plain join's revenue computed independently."""
    from pyspark.sql import functions as F

    from benchmark_spark.catalog import load_table
    from benchmark_spark.registry import all_specs

    (row,) = all_specs()["q_bloom_join"].fn(spark, "/root/testdata/sf0.001").collect()
    assert row["bloom_pass"] >= row["true_match"]
    assert row["false_pass"] == row["bloom_pass"] - row["true_match"]
    import math

    n = row["bits_set"] / 2  # ~keys; each key sets <= 2 bits
    bound = (1 - math.exp(-2 * n * 2 / (1 << 17))) ** 2
    assert row["fp_rate"] <= max(4 * bound, 0.01)
    from benchmark_spark.operators.aggregates import dsum

    li = load_table(spark, "/root/testdata/sf0.001", "lineitem")
    orders = load_table(spark, "/root/testdata/sf0.001", "orders")
    plain = (
        li.join(orders.where(F.col("o_totalprice") > 489000.0), li.l_orderkey == orders.o_orderkey)
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 2).alias("rev"))
        .collect()[0]["rev"]
    )
    assert row["revenue"] == plain
    assert row["true_match"] > 0


def test_ewma_anomaly_integer_exact_residuals(spark):
    """The residual is D*y - P with D = 4^12 - 3^12: recompute the
    prediction for the top row per type from the daily series and
    confirm the integer identity; each type emits exactly 3 rows."""
    from collections import defaultdict

    from pyspark.sql import functions as F

    from benchmark_spark.catalog import load_table
    from benchmark_spark.operators.windows import _EWMA_D, _EWMA_LAGS, _EWMA_W
    from benchmark_spark.registry import all_specs

    rows = all_specs()["q_ewma_anomaly"].fn(spark, "/root/testdata/sf0.001").collect()
    per_type = defaultdict(list)
    for r in rows:
        per_type[r["event_type"]].append(r)
    assert all(len(v) == 3 for v in per_type.values())
    events = load_table(spark, "/root/testdata/sf0.001", "events", assert_schema=False)
    daily = {
        (r["event_type"], r["x"]): r["y"]
        for r in events.groupBy(
            "event_type",
            F.datediff(F.col("ts").cast("date"), F.lit("2024-01-01").cast("date")).alias("x"),
        )
        .agg(F.sum(F.round(F.col("value") * 100, 0).cast("long")).alias("y"))
        .collect()
    }
    days = sorted({x for (_, x) in daily})
    for et, rs in per_type.items():
        top = rs[0]
        i = days.index(top["day"])
        pred = sum(
            w * daily[(et, days[i - j])] for j, w in enumerate(_EWMA_W, start=1)
        )
        assert top["resid_scaled"] == _EWMA_D * top["y_cents"] - pred
        assert i >= _EWMA_LAGS


def test_mad_outliers_robust_to_planted_spike(spark):
    """MAD invariants at sf0.001: outlier_rate is n_outliers/n on the
    floor grid, the MAD is positive, and the rate stays in single
    digits (a robust gate never flags a same-distribution majority)."""
    from benchmark_spark.registry import all_specs

    rows = all_specs()["q_mad_outliers"].fn(spark, "/root/testdata/sf0.001").collect()
    assert len(rows) == 5
    import math

    for r in rows:
        assert r["mad_value"] > 0
        assert r["outlier_rate"] == math.floor(r["n_outliers"] / r["n"] * 1e6 + 0.5) / 1e6
        assert r["outlier_rate"] < 0.10
