"""Reference storage-format fidelity (SURVEY.md §1.1 / §2.1).

The AMPLab harness stores tables row-oriented as delimited text or
Hadoop SequenceFiles in four variants — `text`, `text-deflate`,
`sequence`, `sequence-snappy` — declared as external tables [P].
This module reproduces that surface on Spark: round-trippable
writers/readers for all four variants over any catalog table, with
the delimited codec (\x01-separated, Hive default) shared between
them. The engine's native format stays parquet (SCALE.md); these
exist so a reference user's data layout can be ingested as-is.

Scale posture: text/sequence formats are the reference's world, not
a recommendation — no column pruning, no predicate pushdown, full
rows always decoded. The ingest path is: read once with these
readers, write parquet, query parquet.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from benchmark_spark.catalog import SCHEMAS
from benchmark_spark.registry import register

DELIM = "\x01"  # Hive default field delimiter, as the reference's DDL [P]

FORMATS = ("text", "text-deflate", "sequence", "sequence-snappy")

_TS_FMT = "yyyy-MM-dd HH:mm:ss.SSSSSS"


def _encode_row(df: DataFrame) -> DataFrame:
    """Serialize every column to the delimited text codec (timestamps
    to microsecond strings so the round trip is lossless)."""
    cols = []
    for f in df.schema.fields:
        c = F.col(f.name)
        if isinstance(f.dataType, T.TimestampType):
            cols.append(F.date_format(c, _TS_FMT))
        else:
            cols.append(c.cast("string"))
    return df.select(F.concat_ws(DELIM, *cols).alias("value"))


def _decode_rows(lines: DataFrame, table: str) -> DataFrame:
    schema = SCHEMAS[table]
    parts = F.split(F.col("value"), DELIM)
    cols = []
    for i, f in enumerate(schema.fields):
        raw = F.element_at(parts, i + 1)
        if isinstance(f.dataType, T.TimestampType):
            cols.append(F.to_timestamp(raw, _TS_FMT).alias(f.name))
        else:
            cols.append(raw.cast(f.dataType).alias(f.name))
    return lines.select(*cols)


def write_format(df: DataFrame, path: str, fmt: str) -> None:
    """Write a table in one of the reference's four variants."""
    encoded = _encode_row(df)
    if fmt == "text":
        encoded.write.mode("overwrite").text(path)
    elif fmt == "text-deflate":
        encoded.write.mode("overwrite").option("compression", "deflate").text(path)
    elif fmt in ("sequence", "sequence-snappy"):
        # Hadoop SequenceFile of (NullWritable-ish key, Text value),
        # via the RDD API (the only SequenceFile surface Spark has)
        rdd = encoded.rdd.map(lambda r: (0, r["value"]))
        codec = (
            "org.apache.hadoop.io.compress.SnappyCodec"
            if fmt == "sequence-snappy"
            else None
        )
        rdd.saveAsSequenceFile(path, compressionCodecClass=codec)
    else:
        raise ValueError(f"unknown format {fmt!r}; expected one of {FORMATS}")


def read_format(spark: SparkSession, path: str, table: str, fmt: str) -> DataFrame:
    """Read any of the four variants back into the typed catalog schema."""
    if fmt.startswith("text"):
        lines = spark.read.text(path)  # codec auto-detected by extension
    elif fmt.startswith("sequence"):
        rdd = spark.sparkContext.sequenceFile(path).map(lambda kv: (kv[1],))
        lines = spark.createDataFrame(rdd, T.StructType([T.StructField("value", T.StringType())]))
    else:
        raise ValueError(f"unknown format {fmt!r}; expected one of {FORMATS}")
    return _decode_rows(lines, table)


def _stage_path(sf_dir: str, kind: str, table: str) -> str:
    base = os.path.basename(sf_dir.rstrip("/"))
    return os.path.join("/root/repo/.scratch", f"{kind}_{table}_{base}")


@register(
    "q_format_text",
    oracle="""
        SELECT source, COUNT(*) AS n,
               CAST(SUM(n_chars) AS BIGINT) AS chars,
               CAST(SUM(CAST('0x' || substring(md5(text), 1, 15) AS BIGINT)
                        % 1000003) AS BIGINT) AS fp
        FROM documents
        GROUP BY source
    """,
    doc=(
        "Reference storage-format fidelity as a driver-checked query "
        "(SURVEY.md §2.1 text/deflate variants [P]): documents is written "
        "through the \\x01-delimited text codec with DEFLATE compression and "
        "read back via read_format, then aggregated per source with an "
        "md5-derived 60-bit content fingerprint summed per group — any byte "
        "lost or mangled by the codec changes fp, and the DuckDB oracle "
        "computes the same fingerprint from the parquet original. The other "
        "two variants (SequenceFile +/- snappy) share the same codec and "
        "round-trip in tests/test_formats.py."
    ),
    tags=("source", "format"),
)
def q_format_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    from benchmark_spark.catalog import load_table

    stage = _stage_path(sf_dir, "textfmt", "documents")
    docs = load_table(spark, sf_dir, "documents", assert_schema=False)
    write_format(docs, stage, "text-deflate")
    back = read_format(spark, stage, "documents", "text-deflate")
    fp = (
        F.conv(F.substring(F.md5(F.col("text").cast("binary")), 1, 15), 16, 10)
        .cast("long")
        % 1000003
    )
    return back.groupBy("source").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("n_chars").alias("chars"),
        F.sum(fp).alias("fp"),
    )
