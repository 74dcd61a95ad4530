"""Guards against the silent-fixture-drift class that went red in
round 3: the driver regenerated events.parquet with a different
physical timestamp unit (ns -> us) and the old nanos shim compressed
30 days into 43 minutes — no crash, no schema error, just wrong
windows everywhere. These tests fail loudly the moment a fixture's
TIME SPAN (not just its schema) stops making sense, at every scale
factor the driver uses."""

import pytest

from pyspark.sql import functions as F

from benchmark_spark.catalog import load_table

SF_DIRS = (
    "/root/testdata/sf0.001",
    "/root/testdata/sf0.01",
    "/root/testdata/sf0.1",
)


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_events_span_is_weeks_not_minutes(spark, sf_dir):
    row = (
        load_table(spark, sf_dir, "events", assert_schema=False)
        .agg(
            F.min("ts").alias("lo"),
            F.max("ts").alias("hi"),
        )
        .collect()[0]
    )
    span_days = (row["hi"] - row["lo"]).total_seconds() / 86400
    assert span_days > 7, f"events span {span_days:.3f} days — unit regression?"
    assert 2000 <= row["lo"].year <= 2100, row["lo"]


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_order_dates_span_years(spark, sf_dir):
    row = (
        load_table(spark, sf_dir, "orders", assert_schema=False)
        .agg(F.min("o_orderdate").alias("lo"), F.max("o_orderdate").alias("hi"))
        .collect()[0]
    )
    span_days = (row["hi"] - row["lo"]).total_seconds() / 86400
    assert span_days > 365, f"orders span {span_days:.3f} days — unit regression?"
    assert 1990 <= row["lo"].year <= 2010, row["lo"]
