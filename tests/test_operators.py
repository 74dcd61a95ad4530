

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
