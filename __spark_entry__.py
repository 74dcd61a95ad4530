"""Driver contract for the spark-graft builder (PySpark target).

Thin adapter over benchmark_spark's query registry: every operator
from SURVEY.md §2 registers a named (spark, sf_dir) -> DataFrame
callable plus (when SQL-expressible) a DuckDB oracle; this module
just re-exports the registry so coverage here grows in the same
commit as each operator (SURVEY.md §7 build principle).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# the driver may import this module from any CWD; the package lives
# next to this file
_HERE = os.path.dirname(os.path.abspath(__file__))
if _HERE not in sys.path:
    sys.path.insert(0, _HERE)

from benchmark_spark import all_oracles, all_queries
from benchmark_spark.registry import get_query
from benchmark_spark.session import tune_for_queries


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (q3_join: scan+filter+join+agg+sort+limit —
    the Query-3 analogue, SURVEY.md §2.3) on /root/testdata/sf0.001."""
    tune_for_queries(spark)
    return get_query("q3_join").fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""

    def wrap(fn: Callable[[SparkSession, str], DataFrame]):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            tune_for_queries(spark)
            return fn(spark, sf_dir)

        run.__doc__ = fn.__doc__
        return run

    return {name: wrap(fn) for name, fn in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL per query; rows-only ops omitted."""
    return all_oracles()
