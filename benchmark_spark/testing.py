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
import hashlib
import math
import os
import pickle
import tempfile
import time
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
    # timing split (ADVICE r7 / VERDICT r7 #5): gate `secs` used to
    # conflate Spark execution with the DuckDB oracle replay — e.g.
    # q_chargram_minhash read as a 624 s "Spark" row when ~212 s was
    # the oracle. None when untimed (legacy callers).
    # ADVICE r8: spark_secs is the LEVEL-1 collect() execution ONLY —
    # one materialization, the honest single-run figure. The level-2
    # dtype-mimic runs the plan a second time (toPandas, deliberately:
    # it reproduces the driver's Arrow serialization path) and is
    # reported separately as spark_pdf_secs, never summed into
    # spark_secs.
    spark_secs: float | None = None
    oracle_secs: float | None = None
    spark_pdf_secs: float | None = None
    oracle_cached: bool = False

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


class OracleCache:
    """Disk cache of DuckDB oracle results keyed by (fixture content
    md5, oracle-SQL md5) — VERDICT r7 #5. When only Spark code changed
    between gate runs, every oracle replay (the expensive side of the
    sf0.1 gate: recursive-CTE cluster labelings, char-gram minhash
    re-derivations) is served from disk, so the ~40-minute cold gate
    re-runs in minutes warm.

    The fixture key is a content md5 over every file under sf_dir
    (17 MB at sf0.1 — cheaper than one oracle replay), so a fixture
    regeneration invalidates the whole cache rather than silently
    serving stale results (the scale_curve _SUCCESS-marker lesson,
    ADVICE r7). Entries store (columns, rows, fetchdf frame) — the
    exact objects compare() consumes — written atomically.
    """

    def __init__(self, sf_dir: str, cache_dir: str = "/root/repo/.oracle_cache"):
        self.cache_dir = cache_dir
        os.makedirs(cache_dir, exist_ok=True)
        self.fixture_md5 = self._fingerprint(sf_dir)
        self.hits = 0
        self.misses = 0

    @staticmethod
    def _fingerprint(sf_dir: str) -> str:
        h = hashlib.md5()
        for root, dirs, files in sorted(os.walk(sf_dir)):
            dirs.sort()
            for fn in sorted(files):
                p = os.path.join(root, fn)
                h.update(os.path.relpath(p, sf_dir).encode())
                with open(p, "rb") as f:
                    for chunk in iter(lambda: f.read(1 << 20), b""):
                        h.update(chunk)
        return h.hexdigest()

    def _path(self, oracle_sql: str) -> str:
        key = hashlib.md5((self.fixture_md5 + oracle_sql).encode()).hexdigest()
        return os.path.join(self.cache_dir, f"{key}.pkl")

    def get(self, oracle_sql: str):
        p = self._path(oracle_sql)
        try:
            with open(p, "rb") as f:
                cols, rows, pdf = pickle.load(f)
        except (OSError, pickle.PickleError, EOFError, ValueError):
            self.misses += 1
            return None
        self.hits += 1
        return cols, rows, pdf

    def put(self, oracle_sql: str, cols, rows, pdf) -> None:
        p = self._path(oracle_sql)
        fd, tmp = tempfile.mkstemp(dir=self.cache_dir, suffix=".tmp")
        try:
            with os.fdopen(fd, "wb") as f:
                pickle.dump((cols, rows, pdf), f, protocol=pickle.HIGHEST_PROTOCOL)
            os.replace(tmp, p)
        except BaseException:
            if os.path.exists(tmp):
                os.unlink(tmp)
            raise


def compare(
    name: str,
    spark_df: DataFrame,
    con: duckdb.DuckDBPyConnection,
    oracle: str,
    cache: OracleCache | None = None,
) -> CompareResult:
    t0 = time.time()
    spark_rows = spark_df.collect()
    spark_cols = spark_df.columns
    spark_secs = time.time() - t0

    cached = cache.get(oracle) if cache is not None else None
    t1 = time.time()
    if cached is not None:
        oracle_cols, oracle_rows, oracle_pdf = cached
    else:
        cur = con.execute(oracle)
        oracle_cols = [d[0] for d in cur.description]
        oracle_rows = cur.fetchall()
        oracle_pdf = None  # fetched lazily below (second replay)
    oracle_secs = time.time() - t1

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
    spark_pdf_secs = None
    if not mismatches:
        # level 2: driver-serialization mimic (dtype-sensitive); its
        # second materialization is timed SEPARATELY (ADVICE r8)
        t2 = time.time()
        spark_pdf = spark_df.toPandas()
        spark_pdf_secs = time.time() - t2
        t3 = time.time()
        if oracle_pdf is None:
            oracle_pdf = con.execute(oracle).fetchdf()
        oracle_secs += time.time() - t3
        mismatches.extend(_pandas_mimic_mismatches(spark_pdf, oracle_pdf))
        # only fully-materialized (cols+rows+pdf) green-path results are
        # cached; failures recompute next run by design
        if cache is not None and cached is None and not mismatches:
            cache.put(oracle, oracle_cols, oracle_rows, oracle_pdf)
    return CompareResult(
        name,
        not mismatches,
        len(spark_rows),
        len(oracle_rows),
        mismatches,
        spark_secs=round(spark_secs, 3),
        oracle_secs=round(oracle_secs, 3),
        spark_pdf_secs=round(spark_pdf_secs, 3) if spark_pdf_secs is not None else None,
        oracle_cached=cached is not None,
    )


def run_rows_only(name: str, spark_df: DataFrame) -> CompareResult:
    # collect, not count: count() lets the optimizer prune columns, so
    # an expression that errors at runtime (e.g. ANSI overflow) would
    # never execute and the check would pass vacuously
    t0 = time.time()
    n = len(spark_df.collect())
    return CompareResult(name, n >= 0, n, -1, spark_secs=round(time.time() - t0, 3))


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
