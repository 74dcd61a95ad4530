#!/usr/bin/env python3
"""Transaction-log table walkthrough: the table-format API, end to end.

What the nightly job in table_maintenance.py does with separate
oracle-checked operators, this does through ONE table object with an
actual commit protocol (benchmark_spark/sources/txlog.py): every
mutation is an atomic commit, readers get snapshot isolation, history
stays queryable, and mutation cost is bounded by footer-stats pruning.

Run: python examples/txlog_walkthrough.py [sf_dir]
"""

from __future__ import annotations

import os
import shutil
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from pyspark.sql import functions as F

from benchmark_spark.catalog import load_table
from benchmark_spark.session import get_spark
from benchmark_spark.sources.txlog import TxLogTable


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("txlog-walkthrough", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    path = "/root/repo/.scratch/txlog-example"
    shutil.rmtree(path, ignore_errors=True)

    orders = load_table(spark, sf_dir, "orders", assert_schema=False).select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )

    # v0: create as 8 range-sliced files; footer min/max go into the log
    t = TxLogTable.create(spark, path, orders, "o_orderkey", 8, ("o_orderkey",))
    print(f"v0 create: {t.read(spark).count()} rows in {len(t.snapshot_files())} files")

    # v1: append a late-arriving batch
    late = orders.filter(F.col("o_orderkey") % 97 == 0).withColumn(
        "o_orderkey", F.col("o_orderkey") + 10_000_000
    )
    t.append(spark, late, ("o_orderkey",))
    print(f"v1 append: {t.read(spark).count()} rows")

    # v2: GDPR-style ranged delete — only footer-overlapping files rewritten
    lo = orders.agg(F.min("o_orderkey")).first()[0]
    stats = t.delete_where(spark, "o_orderkey", int(lo), int(lo) + 50, ("o_orderkey",))
    print(f"v2 delete: rewrote {stats['files_rewritten']}/{stats['files_total']} files "
          f"(stats pruning), {t.read(spark).count()} rows remain")

    # v3: MERGE an update batch in one atomic commit (matched keys are
    # replaced in-place; keys deleted at v2 come back as inserts — the
    # WHEN MATCHED / NOT MATCHED contract through one commit)
    updates = orders.filter(F.col("o_orderkey") % 101 == 3).withColumn(
        "o_orderstatus", F.lit("X")
    )
    stats = t.merge(spark, updates, "o_orderkey", ("o_orderkey",))
    print(f"v3 merge: rewrote {stats['files_rewritten']}/{stats['files_total']} files; "
          f"{t.read(spark).filter('o_orderstatus = chr(88)').count()} rows now status X")

    # time travel: every historical version stays readable
    for v in t.versions():
        print(f"  version {v} ({t.history()[v]['op']}): {t.read(spark, v).count()} rows")

    # checkpoint bounds log replay; vacuum reclaims unreferenced files
    t.checkpoint()
    removed = t.vacuum(retain_versions=1)
    print(f"checkpoint + vacuum(retain=1): {len(removed)} files reclaimed; "
          f"latest still {t.read(spark).count()} rows")


if __name__ == "__main__":
    main()
