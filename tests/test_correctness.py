"""The cross-engine agreement gate, in-repo (SURVEY.md §5.2):
every registered query runs against its DuckDB oracle at sf0.001.
(The driver runs the same comparison at sf0.01; tools/check_oracle.py
runs it at any SF on demand.)"""

import pytest

from benchmark_spark.registry import all_specs
from benchmark_spark.testing import compare, duckdb_connection, run_rows_only
from tests.conftest import SF_SMOKE

SPECS = all_specs()


@pytest.fixture(scope="module")
def con():
    c = duckdb_connection(SF_SMOKE)
    yield c
    c.close()


@pytest.mark.parametrize("name", sorted(SPECS))
def test_query_matches_oracle(spark, con, name):
    spec = SPECS[name]
    df = spec.fn(spark, SF_SMOKE)
    if spec.oracle is None:
        res = run_rows_only(name, df)
        assert res.spark_rows >= 0
    else:
        res = compare(name, df, con, spec.oracle)
        assert res.ok, res.message()
