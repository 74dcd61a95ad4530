"""Local mimic of the driver's correctness gate (SURVEY.md §5.2).

Runs a registered query on Spark and its oracle on DuckDB over the
same parquet, then compares row count, column-name set, and an
order-insensitive multiset of normalized rows — a strictly
tougher check than a hash (it reports the first differing rows).
Used by tests/test_correctness.py and tools/check_oracle.py so every
oracle mismatch is caught locally before the driver sees it.
"""

from __future__ import annotations

import datetime as _dt
import decimal
import math
from collections import Counter
from dataclasses import dataclass, field

import duckdb

from pyspark.sql import DataFrame, SparkSession

from benchmark_spark.catalog import TABLES, table_path

def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{table_path(sf_dir, t)}')"
        )
    return con


def _norm(v: object) -> object:
    """Normalize a cell for cross-engine comparison."""
    if isinstance(v, bool):
        return v
    if isinstance(v, decimal.Decimal):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # EXACT comparison: the driver hashes full-precision values, so a
        # last-ulp divergence the round-1 10-significant-digit collapse
        # hid here still failed the driver (q_agg_funcs). Queries must
        # produce bit-identical doubles (fixed-point sums / floor-form
        # rounding on both engines), and the gate must prove it.
        return v
    if isinstance(v, _dt.datetime):
        return v.isoformat()
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, dict):
        return tuple(sorted((k, _norm(x)) for k, x in v.items()))
    return v


def _rows_to_multiset(rows: list[tuple], cols: list[str]) -> Counter:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return Counter(tuple(_norm(r[i]) for i in order) for r in rows)


@dataclass
class CompareResult:
    name: str
    ok: bool
    spark_rows: int
    oracle_rows: int
    mismatches: list[str] = field(default_factory=list)

    def message(self) -> str:
        status = "OK" if self.ok else "FAIL"
        msg = f"[{status}] {self.name}: spark={self.spark_rows} oracle={self.oracle_rows}"
        for m in self.mismatches[:5]:
            msg += f"\n    {m}"
        return msg


def compare(
    name: str, spark_df: DataFrame, con: duckdb.DuckDBPyConnection, oracle: str
) -> CompareResult:
    spark_rows = spark_df.collect()
    spark_cols = spark_df.columns
    cur = con.execute(oracle)
    oracle_cols = [d[0] for d in cur.description]
    oracle_rows = cur.fetchall()

    mismatches: list[str] = []
    if sorted(spark_cols) != sorted(oracle_cols):
        mismatches.append(f"columns differ: spark={spark_cols} oracle={oracle_cols}")
    if len(spark_rows) != len(oracle_rows):
        mismatches.append("row counts differ")
    if not mismatches:
        s = _rows_to_multiset([tuple(r) for r in spark_rows], spark_cols)
        o = _rows_to_multiset(oracle_rows, oracle_cols)
        if s != o:
            only_s = list((s - o).items())[:3]
            only_o = list((o - s).items())[:3]
            mismatches.append(f"spark-only rows: {only_s}")
            mismatches.append(f"oracle-only rows: {only_o}")
    return CompareResult(
        name, not mismatches, len(spark_rows), len(oracle_rows), mismatches
    )


def run_rows_only(name: str, spark_df: DataFrame) -> CompareResult:
    # collect, not count: count() lets the optimizer prune columns, so
    # an expression that errors at runtime (e.g. ANSI overflow) would
    # never execute and the check would pass vacuously
    n = len(spark_df.collect())
    return CompareResult(name, n >= 0, n, -1)


def check_query(
    spark: SparkSession, sf_dir: str, name: str, con: duckdb.DuckDBPyConnection | None = None
) -> CompareResult:
    from benchmark_spark.registry import get_query

    spec = get_query(name)
    df = spec.fn(spark, sf_dir)
    if spec.oracle is None:
        return run_rows_only(name, df)
    own = con is None
    if own:
        con = duckdb_connection(sf_dir)
    try:
        return compare(name, df, con, spec.oracle)
    finally:
        if own:
            con.close()
