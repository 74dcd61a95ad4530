

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
