"""SQL-string entry point (SURVEY.md §3.2 entry point 3).

The reference's interface is a SQL string handed to an engine CLI
(`hive -e` / `shark -e` ... [P]); our equivalent is `spark.sql(...)`
over the catalog's registered temp views. The headline [Q:*] queries
are provided here in Spark SQL dialect, and
tests/test_sql_surface.py asserts each produces exactly the same
result as its DataFrame-builder twin — same Catalyst plan space,
two authoring surfaces.

Dialect note vs the DuckDB oracles: Spark SQL has no QUALIFY (use a
subquery), `split` not `string_split`, `unix_micros` not `epoch_us`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from benchmark_spark.catalog import load_tables

SQL_QUERIES: dict[str, str] = {
    "q1_scan": "SELECT o_orderkey, o_totalprice FROM orders WHERE o_totalprice > 1000",
    "q2_agg": """
        SELECT substr(o_orderpriority, 1, 1) AS prio,
               round(SUM(o_totalprice), 2) AS rev
        FROM orders GROUP BY substr(o_orderpriority, 1, 1)
    """,
    "q3_join": """
        SELECT o_custkey,
               (CAST(SUM(CAST(round((l_extendedprice * (1 - l_discount)) * 10000, 0) AS BIGINT)) AS DOUBLE) / 10000) AS total_rev,
               (CAST(SUM(CAST(round(l_quantity * 10000, 0) AS BIGINT)) AS DOUBLE) / 10000) / COUNT(*) AS avg_qty
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE o_orderdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
                              AND TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY o_custkey
        ORDER BY total_rev DESC, o_custkey
        LIMIT 1
    """,
    "q4_wordcount": """
        SELECT word, COUNT(*) AS cnt
        FROM (SELECT explode(split(text, ' ')) AS word FROM documents)
        GROUP BY word
    """,
    "q5_pricing": """
        SELECT l_returnflag, l_linestatus,
               (CAST(SUM(CAST(round(l_quantity * 10000, 0) AS BIGINT)) AS DOUBLE) / 10000)      AS sum_qty,
               (CAST(SUM(CAST(round(l_extendedprice * 10000, 0) AS BIGINT)) AS DOUBLE) / 10000) AS sum_base_price,
               (CAST(SUM(CAST(round((l_extendedprice * (1 - l_discount)) * 10000, 0) AS BIGINT)) AS DOUBLE) / 10000) AS sum_disc_price,
               (CAST(SUM(CAST(round((l_extendedprice * (1 - l_discount) * (1 + l_tax)) * 1000000, 0) AS BIGINT)) AS DOUBLE) / 1000000) AS sum_charge,
               (CAST(SUM(CAST(round(l_quantity * 10000, 0) AS BIGINT)) AS DOUBLE) / 10000) / COUNT(*)      AS avg_qty,
               (CAST(SUM(CAST(round(l_extendedprice * 10000, 0) AS BIGINT)) AS DOUBLE) / 10000) / COUNT(*) AS avg_price,
               (CAST(SUM(CAST(round(l_discount * 10000, 0) AS BIGINT)) AS DOUBLE) / 10000) / COUNT(*)      AS avg_disc,
               COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '2000-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
    """,
    "q6_window": """
        SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
            SELECT o_custkey, o_orderkey, o_totalprice,
                   CAST(row_number() OVER (
                       PARTITION BY o_custkey
                       ORDER BY o_totalprice DESC, o_orderkey
                   ) AS BIGINT) AS rn
            FROM orders
        ) WHERE rn <= 2
    """,
    "q7_tumble": """
        SELECT window(ts, '1 hour').start AS w_start, event_type,
               COUNT(*) AS n, (CAST(SUM(CAST(round(value * 100, 0) AS BIGINT)) AS DOUBLE) / 100) AS total
        FROM events
        GROUP BY window(ts, '1 hour'), event_type
    """,
    # scalar subqueries are not allowed inside higher-order functions
    # (UNSUPPORTED_SUBQUERY_EXPRESSION_CATEGORY) -> broadcast the
    # anchor via a cross join instead
    "q8_knn": """
        SELECT e.vec_id, e.label,
               round(aggregate(zip_with(e.embedding, a.anchor_emb,
                         (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),
                     0.0D, (acc, v) -> acc + v), 4) AS score
        FROM embeddings e
        CROSS JOIN (SELECT first(embedding) AS anchor_emb
                    FROM embeddings WHERE vec_id = 0) a
        WHERE e.vec_id <> 0
        ORDER BY score DESC, e.vec_id
        LIMIT 10
    """,
}


def run_sql(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Execute a headline query from its SQL text over registered views."""
    load_tables(spark, sf_dir)
    return spark.sql(SQL_QUERIES[name])
