"""Typed table catalog + schema-asserted parquet loader.

The reference harness declares fixed schemas via Hive DDL before
loading (SURVEY.md §1.1, `runner/prepare_benchmark.py` [P]); our
equivalent is an explicit StructType per table, asserted against the
parquet footer on load — schema drift fails fast instead of being
silently inferred away (SURVEY.md §1.3).

Scale posture: parquet is already the right storage for 100 TB
(columnar, row-group statistics for predicate pushdown, per-column
encodings). At cluster scale the facts (`lineitem`, `orders`,
`events`) would additionally be written partitioned by a date column
and bucketed by join key; the loader reads whatever layout exists,
and partition/bucket pruning then composes for free via Catalyst.
"""

from __future__ import annotations

import functools
import glob
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# --- Fixed schemas (SURVEY.md §1.2; verified against parquet footers,
# FIXTURES.md). Timestamps: o_orderdate/l_shipdate are ms-granular,
# events.ts is exactly microsecond-granular — all lossless as Spark
# TimestampType (microseconds).

SCHEMAS: dict[str, T.StructType] = {
    "region": T.StructType(
        [
            T.StructField("r_regionkey", T.IntegerType()),
            T.StructField("r_name", T.StringType()),
        ]
    ),
    "nation": T.StructType(
        [
            T.StructField("n_nationkey", T.IntegerType()),
            T.StructField("n_name", T.StringType()),
            T.StructField("n_regionkey", T.IntegerType()),
        ]
    ),
    "customer": T.StructType(
        [
            T.StructField("c_custkey", T.LongType()),
            T.StructField("c_name", T.StringType()),
            T.StructField("c_nationkey", T.IntegerType()),
            T.StructField("c_acctbal", T.DoubleType()),
            T.StructField("c_mktsegment", T.StringType()),
        ]
    ),
    "supplier": T.StructType(
        [
            T.StructField("s_suppkey", T.LongType()),
            T.StructField("s_name", T.StringType()),
            T.StructField("s_nationkey", T.IntegerType()),
            T.StructField("s_acctbal", T.DoubleType()),
        ]
    ),
    "part": T.StructType(
        [
            T.StructField("p_partkey", T.LongType()),
            T.StructField("p_name", T.StringType()),
            T.StructField("p_brand", T.StringType()),
            T.StructField("p_type", T.StringType()),
            T.StructField("p_size", T.IntegerType()),
            T.StructField("p_retailprice", T.DoubleType()),
        ]
    ),
    "orders": T.StructType(
        [
            T.StructField("o_orderkey", T.LongType()),
            T.StructField("o_custkey", T.LongType()),
            T.StructField("o_orderstatus", T.StringType()),
            T.StructField("o_totalprice", T.DoubleType()),
            T.StructField("o_orderdate", T.TimestampType()),
            T.StructField("o_orderpriority", T.StringType()),
        ]
    ),
    "lineitem": T.StructType(
        [
            T.StructField("l_orderkey", T.LongType()),
            T.StructField("l_partkey", T.LongType()),
            T.StructField("l_suppkey", T.LongType()),
            T.StructField("l_linenumber", T.IntegerType()),
            T.StructField("l_quantity", T.DoubleType()),
            T.StructField("l_extendedprice", T.DoubleType()),
            T.StructField("l_discount", T.DoubleType()),
            T.StructField("l_tax", T.DoubleType()),
            T.StructField("l_returnflag", T.StringType()),
            T.StructField("l_linestatus", T.StringType()),
            T.StructField("l_shipdate", T.TimestampType()),
        ]
    ),
    "events": T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    ),
    # events.ts physical unit has varied across driver-generated
    # fixtures: TIMESTAMP(NANOS) INT64 (rounds 1-2), which Spark's
    # parquet reader rejects outright ([PARQUET_TYPE_ILLEGAL]), vs
    # TIMESTAMP(MICROS) (round 3+), which Spark reads natively. The
    # loader sniffs the footer unit per file (ts_unit below): nanos go
    # through spark.sql.legacy.parquet.nanosAsLong=true + LongType
    # schema + timestamp_micros(ts div 1000) (lossless — the data is
    # microsecond-granular); micros/millis read directly as
    # TimestampType. The logical schema above is what queries see
    # either way.
    "documents": T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    ),
    "embeddings": T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
            T.StructField("label", T.IntegerType()),
        ]
    ),
}

EVENTS_RAW_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.LongType()),  # raw nanos (nanosAsLong)
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)

TABLES = tuple(SCHEMAS)


def table_path(sf_dir: str, name: str) -> str:
    return f"{sf_dir.rstrip('/')}/{name}.parquet"


def parquet_rows(src: str) -> int:
    """Row count of a parquet file OR directory dataset from FOOTERS —
    no Spark job. The ONE copy (ADVICE r15: table_rows, the ann-index
    corpus/compaction counters and the in-query ANN tier had drifted
    into four near-identical walks); identical by construction to
    count(*) over the unfiltered data."""
    import pyarrow.parquet as papq

    if os.path.isdir(src):
        return sum(
            papq.ParquetFile(p).metadata.num_rows
            for p in sorted(
                glob.glob(os.path.join(src, "**", "*.parquet"), recursive=True)
            )
        )
    return papq.ParquetFile(src).metadata.num_rows


def table_rows(sf_dir: str, name: str) -> int:
    """Row count of a fixture table from parquet FOOTERS — no Spark
    job. Identical by construction to count(*) over the table."""
    return parquet_rows(table_path(sf_dir, name))


def probe_file(path: str) -> str | None:
    """A footer-sniffable parquet file for ``path``: the path itself,
    or the first part file when it's a directory dataset (partitioned /
    multi-file — the writer gives every part the same physical schema).
    None for an empty directory."""
    if not os.path.isdir(path):
        return path
    parts = sorted(glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True))
    return parts[0] if parts else None


def ts_unit(path: str, column: str = "ts") -> str:
    """Physical time unit ('ns'/'us'/'ms'/'s') of a timestamp column,
    read from the parquet footer. Fixture regenerations have switched
    units between rounds; sniffing the footer keeps the read path
    correct under either (a 1000x unit mistake silently compresses a
    30-day stream into 43 minutes — round-3 postmortem). Directory
    datasets are sniffed through their first part file."""
    import pyarrow.parquet as pq

    probe = probe_file(path)
    if probe is None:
        # An empty directory dataset is a broken fixture; a silent 'us'
        # default would just defer the failure to a confusing read-path
        # error downstream (ADVICE r6) — fail fast at the catalog layer.
        raise FileNotFoundError(
            f"ts_unit: no parquet part file found under directory dataset {path!r}"
        )
    t = pq.ParquetFile(probe).schema_arrow.field(column).type
    return getattr(t, "unit", "us")


@functools.lru_cache(maxsize=512)
def _nanos_ts_columns_cached(path: str, mtime: float) -> tuple[str, ...]:
    import pyarrow.parquet as pq

    probe = probe_file(path)
    if probe is None:
        return ()
    schema = pq.ParquetFile(probe).schema_arrow
    return tuple(f.name for f in schema if getattr(f.type, "unit", None) == "ns")


def nanos_ts_columns(path: str) -> list[str]:
    """Names of timestamp columns physically stored as TIMESTAMP(NANOS),
    which Spark's parquet reader rejects outright and must go through
    the nanos-as-long shim. Empty for micros/millis fixtures.

    Memoized per (path, mtime): the footer open is driver-side file
    I/O paid on every load_table call otherwise, and fixtures only
    change between rounds (mtime invalidates the cache when they do).
    """
    try:
        mtime = os.path.getmtime(path)
    except OSError:
        return []
    return list(_nanos_ts_columns_cached(path, mtime))


def load_table(
    spark: SparkSession, sf_dir: str, name: str, assert_schema: bool = True
) -> DataFrame:
    """Read one table; fail fast if the footer drifts from the catalog.

    The explicit ``.schema(...)`` (rather than footer inference) keeps
    the analyzed plan identical across scale factors and lets Spark
    skip footer-merging on many-file tables at cluster scale.
    """
    expected = SCHEMAS[name]
    ns_cols = nanos_ts_columns(table_path(sf_dir, name))
    if ns_cols:
        # TIMESTAMP(NANOS) fixture (rounds 1-2 shape): read the nanos
        # columns as raw longs and convert — lossless, the data is
        # microsecond-granular. Works for ANY table, so a future
        # regeneration flipping orders/lineitem to nanos reads fine too.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        raw_schema = T.StructType(
            [
                T.StructField(f.name, T.LongType() if f.name in ns_cols else f.dataType)
                for f in expected.fields
            ]
        )
        raw = spark.read.schema(raw_schema).parquet(table_path(sf_dir, name))
        df = raw.select(
            *[
                F.expr(f"timestamp_micros({f.name} div 1000)").alias(f.name)
                if f.name in ns_cols
                else F.col(f.name)
                for f in expected.fields
            ]
        )
        got = [(f.name, f.dataType) for f in df.schema.fields]
        want = [(f.name, f.dataType) for f in expected.fields]
        if got != want:
            raise ValueError(f"{name} nanos projection drifted: {got}")
        return df
    df = spark.read.schema(expected).parquet(table_path(sf_dir, name))
    if df.columns != [f.name for f in expected.fields]:
        # hive-partitioned directory: Spark appends partition columns
        # at the END regardless of the provided schema — restore the
        # catalog's column order (identity projection otherwise,
        # removed by Catalyst)
        df = df.select(*[f.name for f in expected.fields])
    if assert_schema:
        actual = spark.read.parquet(table_path(sf_dir, name)).schema

        def norm(t: str) -> str:
            # footer timestamps are not-UTC-adjusted (inferred NTZ);
            # the catalog reads them as session-tz timestamps with the
            # session pinned to UTC — identical wall-clock values, and
            # the form the DuckDB oracle sees. Treat as equivalent.
            return "timestamp" if t == "timestamp_ntz" else t

        # sorted by name: a hive-partitioned directory surfaces its
        # partition columns last, and load_table normalizes order
        # anyway — drift detection is about names/types, not position
        exp_simple = sorted(
            (f.name, norm(f.dataType.simpleString())) for f in expected.fields
        )
        act_simple = sorted(
            (f.name, norm(f.dataType.simpleString())) for f in actual.fields
        )
        if exp_simple != act_simple:
            raise ValueError(
                f"schema drift for table {name!r}: expected {exp_simple}, footer has {act_simple}"
            )
    return df


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES
) -> dict[str, DataFrame]:
    """Load tables and register each as a temp view (SQL surface)."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    out = {}
    for name in names:
        df = load_table(spark, sf_dir, name, assert_schema=False)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
