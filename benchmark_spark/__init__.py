"""benchmark_spark — a PySpark-native analytics engine.

From-scratch reimplementation of the query and data-processing
capabilities exercised by amplab/benchmark (the AMPLab Big Data
Benchmark harness), re-expressed Spark-first: every operator is a
declarative DataFrame/SQL plan optimized by Catalyst, extended with
LLM-data-pipeline operators (dedup, similarity search, multimodal
columns, text analysis) and designed for 100 TB scale.

Layout:
    session.py    SparkSession builder (AQE, Arrow, tuned shuffle)
    catalog.py    typed table catalog + schema-asserted parquet loader
    registry.py   query registry: name -> (spark_fn, duckdb_oracle_sql)
    operators/    relational operators (scan/filter/join/agg/window/...)
    functions/    scalar-function batteries (string/date/math/array/json)
    llm/          dedup, similarity search, text analysis, multimodal
    streaming/    Structured Streaming operators (windows, state, joins)
    udf/          pandas UDF / UDTF / external-script pipe surface

Reference provenance: /root/reference was empty at build time; the
behavioral spec is SURVEY.md (reconstructed from the public
amplab/benchmark repo + published benchmark page). Citations in
docstrings use SURVEY.md section anchors.
"""

from benchmark_spark.registry import all_queries, all_oracles, get_query

__all__ = ["all_queries", "all_oracles", "get_query"]
