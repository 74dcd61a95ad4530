"""Local mimic of the driver's correctness gate (SURVEY.md §5.2).

Runs a registered query on Spark and its oracle on DuckDB over the
same parquet, then compares them at TWO levels:

1. An order-insensitive multiset of normalized rows (collect() vs
   fetchall()) — tougher than a hash, reports the first differing rows.
2. A driver-serialization mimic: Spark ``toPandas()`` vs DuckDB
   ``fetchdf()``, sorted by all columns and string-serialized per cell.
   Level 1 is structurally blind to dtype divergence — ``fetchall()``
   materializes DuckDB HUGEINT as a plain Python int that compares
   equal to Spark's int64, while the driver's pandas path turns the
   same HUGEINT into float64 (``2487.0`` vs ``2487``) and the value
   hash diverges. That blindness shipped two driver-red rounds
   (r1 q_agg_funcs, r2 q_bool_agg); level 2 closes it, and also
   reproduces the driver canonicalizer's sort_values crash on
   unhashable cells (array columns — r2 q_multimodal_features).

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
import pandas as pd

from pyspark.sql import DataFrame, SparkSession

from benchmark_spark.catalog import TABLES, table_path

def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    # big oracle replays (char-gram minhash at sf0.1) OOM under the
    # default config while a Spark JVM holds most of the host's RAM:
    # insertion order is irrelevant (compare() sorts), spilling goes to
    # the gitignored .tmp, and the cap keeps DuckDB from fighting the
    # JVM for the same memory
    con.execute("SET preserve_insertion_order = false")
    con.execute("SET memory_limit = '24GB'")
    con.execute("SET temp_directory = '/root/repo/.tmp'")
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


def _canon_strings(pdf: "pd.DataFrame") -> "pd.DataFrame":
    """Mimic the driver's canonicalizer: columns ordered by name, rows
    sorted by all columns, every cell string-serialized from its
    pandas-dtyped value (so int64 2487 -> '2487' but float64 -> '2487.0').
    Raises TypeError on unsortable cells exactly like the driver does."""
    cols = sorted(pdf.columns)
    out = pdf[cols]
    if len(out):
        out = out.sort_values(cols, kind="mergesort")
    return out.reset_index(drop=True).astype(str)


def _pandas_mimic_mismatches(
    spark_pdf: "pd.DataFrame", oracle_pdf: "pd.DataFrame"
) -> list[str]:
    """Driver-serialization check over toPandas()/fetchdf() frames."""
    try:
        s = _canon_strings(spark_pdf)
    except TypeError as e:
        return [f"driver canonicalizer would CRASH on the Spark frame: {e}"]
    try:
        o = _canon_strings(oracle_pdf)
    except TypeError as e:
        return [f"driver canonicalizer would CRASH on the oracle frame: {e}"]
    if s.equals(o):
        return []
    mismatches = []
    sd = list(zip(sorted(spark_pdf.columns), [str(t) for t in spark_pdf[sorted(spark_pdf.columns)].dtypes]))
    od = list(zip(sorted(oracle_pdf.columns), [str(t) for t in oracle_pdf[sorted(oracle_pdf.columns)].dtypes]))
    if sd != od:
        mismatches.append(f"pandas dtypes differ: spark={sd} oracle={od}")
    neq = (s != o)
    bad_cols = [c for c in s.columns if neq[c].any()]
    for c in bad_cols[:3]:
        i = int(neq[c].idxmax())
        mismatches.append(
            f"serialized cell differs col={c!r} row={i}: spark={s[c][i]!r} oracle={o[c][i]!r}"
        )
    if not mismatches:
        mismatches.append("serialized frames differ (shape mismatch)")
    return mismatches


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
    if not mismatches:
        # level 2: driver-serialization mimic (dtype-sensitive)
        mismatches.extend(
            _pandas_mimic_mismatches(spark_df.toPandas(), con.execute(oracle).fetchdf())
        )
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
