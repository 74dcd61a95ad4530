"""The SQL-string surface must agree with the DataFrame builders —
two authoring paths, one engine (SURVEY.md §3.2)."""

import pytest

from benchmark_spark.registry import all_specs
from benchmark_spark.sql_surface import SQL_QUERIES, run_sql
from tests.conftest import SF_SMOKE

SPECS = all_specs()


def _rows(df):
    cols = sorted(df.columns)
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


@pytest.mark.parametrize("name", sorted(SQL_QUERIES))
def test_sql_matches_dataframe_builder(spark, name):
    sql_df = run_sql(spark, SF_SMOKE, name)
    df = SPECS[name].fn(spark, SF_SMOKE)
    assert sorted(sql_df.columns) == sorted(df.columns)
    assert _rows(sql_df) == _rows(df)
