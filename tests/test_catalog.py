"""Catalog: typed load, schema assert, events nanos conversion."""

import datetime

import pytest

from benchmark_spark.catalog import SCHEMAS, TABLES, load_table, load_tables
from tests.conftest import SF_SMOKE

EXPECTED_ROWS_SF0001 = {
    "region": 5,
    "nation": 25,
    "customer": 150,
    "supplier": 10,
    "part": 200,
    "orders": 1500,
    "lineitem": 6000,
    "events": 1000,
    "documents": 500,
    "embeddings": 500,
}


@pytest.mark.parametrize("table", TABLES)
def test_load_matches_catalog_schema(spark, table):
    df = load_table(spark, SF_SMOKE, table)
    got = [(f.name, f.dataType.simpleString()) for f in df.schema.fields]
    want = [(f.name, f.dataType.simpleString()) for f in SCHEMAS[table].fields]
    assert got == want
    assert df.count() == EXPECTED_ROWS_SF0001[table]


def test_events_ts_is_microsecond_timestamp(spark):
    df = load_table(spark, SF_SMOKE, "events")
    row = df.orderBy("event_id").first()
    assert isinstance(row["ts"], datetime.datetime)
    # fixture events start 2024-01-01 (FIXTURES.md)
    assert row["ts"].year == 2024


def test_load_tables_registers_views(spark):
    load_tables(spark, SF_SMOKE)
    n = spark.sql("SELECT COUNT(*) AS n FROM lineitem").first()["n"]
    assert n == 6000
    # SQL surface reaches every table
    for t in TABLES:
        assert spark.sql(f"SELECT * FROM {t} LIMIT 1").count() == 1
