#!/usr/bin/env python3
"""Quickstart: using benchmark_spark as a library.

A user of the reference harness interacts through SQL strings and a
fixed table layout; this engine offers the same two surfaces —
registered SQL views and named operator builders — plus the raw
DataFrame API underneath. Run:

    python examples/quickstart.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from benchmark_spark.catalog import load_tables
from benchmark_spark.registry import all_specs, get_query
from benchmark_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("quickstart", shuffle_partitions=4)
    spark.sparkContext.setLogLevel("ERROR")

    # 1. The SQL surface: load + register every table, then plain SQL.
    tables = load_tables(spark, sf_dir)
    print(f"loaded {len(tables)} tables from {sf_dir}")
    spark.sql(
        """
        SELECT o_orderstatus, COUNT(*) AS n, round(SUM(o_totalprice), 2) AS rev
        FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
        """
    ).show()

    # 2. The named-operator surface: every SURVEY.md §2 operator is a
    #    registered (spark, sf_dir) -> DataFrame callable.
    flagship = get_query("q3_join")
    print("flagship:", flagship.doc.strip().splitlines()[0])
    flagship.fn(spark, sf_dir).show()

    # 3. LLM-pipeline operators compose the same way.
    get_query("q_dedup_fingerprint").fn(spark, sf_dir).orderBy("keep_id").show(5)
    get_query("q8_knn").fn(spark, sf_dir).show()

    # 4. Everything is inventoried; oracle-backed entries carry the
    #    DuckDB SQL that defines their semantics.
    specs = all_specs()
    with_oracle = sum(1 for s in specs.values() if s.oracle)
    print(f"{len(specs)} operators registered ({with_oracle} oracle-backed)")


if __name__ == "__main__":
    main()
