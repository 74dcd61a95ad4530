"""Python DataSource connector invariants (sources/pysource.py) and
the df.observe in-flight-metrics capability: production DQ counters
collected DURING a query, no second scan."""

from pyspark.sql import Observation
from pyspark.sql import functions as F

from benchmark_spark.catalog import load_table
from benchmark_spark.sources.pysource import read_synthrows
from tests.conftest import SF_SMOKE


def test_pysource_partitioning_does_not_change_content(spark):
    # same feed under different split counts — a connector whose rows
    # depend on partition boundaries is broken
    a = read_synthrows(spark, n=2000, parts=3).orderBy("id").collect()
    b = read_synthrows(spark, n=2000, parts=8).orderBy("id").collect()
    assert a == b
    assert len(a) == 2000 and a[0]["id"] == 0 and a[-1]["id"] == 1999


def test_pysource_reregistration_is_idempotent(spark):
    # registering + reading twice in one session must not error
    # (the driver calls queries repeatedly in one SparkSession)
    assert read_synthrows(spark, n=100, parts=2).count() == 100
    assert read_synthrows(spark, n=100, parts=2).count() == 100


def test_observe_collects_dq_metrics_without_extra_scan(spark):
    # the 100 TB pattern: attach DQ counters to the PRODUCTION query
    # via df.observe — metrics ride the existing scan, no second pass
    orders = load_table(spark, SF_SMOKE, "orders", assert_schema=False)
    obs = Observation("dq")
    observed = orders.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.count_if(F.col("o_totalprice") <= 0).alias("nonpositive_price"),
        (F.count(F.lit(1)) - F.count("o_custkey")).alias("null_custkey"),
    )
    # the production aggregate the observation rides on
    revenue = observed.agg(F.sum("o_totalprice")).collect()[0][0]
    assert revenue > 0
    got = obs.get
    assert got["n_rows"] == orders.count()
    assert got["nonpositive_price"] == 0
    assert got["null_custkey"] == 0


def test_python_stream_source_runs_twice_and_counts_all_batches(spark):
    from benchmark_spark.sources.pysource import FEED_TOTAL, q_python_stream_source

    a = {r["grp"]: r for r in q_python_stream_source(spark, SF_SMOKE).collect()}
    b = {r["grp"]: r for r in q_python_stream_source(spark, SF_SMOKE).collect()}
    assert a.keys() == set(range(7))
    assert sum(r["n"] for r in a.values()) == FEED_TOTAL  # all 4 batches
    assert all(a[k] == b[k] for k in a)  # fresh checkpoint, same feed
