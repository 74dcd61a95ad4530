#!/usr/bin/env python3
"""Measure the distinct-sketch accuracy curves committed in SCALE.md:

  * HLL: relative error vs register count m = 16 / 256 / 4096
    (hll_sketch_stats sweep; theory: 1.04/sqrt(m))
  * KMV: relative error vs k = 16 / 64 / 256 / 1024 over the same key
    set (theory: ~1/sqrt(k-2))

    python tools/curve_sketch.py [sf_dir]
"""

from __future__ import annotations

import math
import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from benchmark_spark.catalog import load_table
from benchmark_spark.operators.sketches import _KMV_HASH_SPACE, _hash60, hll_sketch_stats
from benchmark_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark()

    print("| HLL m | estimate | exact | rel err | theory 1.04/sqrt(m) |")
    print("|---|---|---|---|---|")
    for b in (1, 2, 3):
        m = 16**b
        row = hll_sketch_stats(spark, sf_dir, b).limit(1).collect()[0]
        print(
            f"| {m} | {row['est_hll']:.0f} | {row['exact_distinct']} "
            f"| {row['rel_err_pct']:+.2f}% | ±{104.0 / math.sqrt(m):.2f}% |"
        )

    li = load_table(spark, sf_dir, "lineitem")
    hashes = (
        li.select(_hash60(F.col("l_orderkey").cast("string")).alias("h"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    exact = hashes.count()
    print()
    print("| KMV k | estimate | exact | rel err | theory 1/sqrt(k-2) |")
    print("|---|---|---|---|---|")
    for k in (16, 64, 256, 1024):
        kth = hashes.orderBy("h").limit(k).agg(F.max("h").alias("kth")).collect()[0][
            "kth"
        ]
        est = (k - 1) * _KMV_HASH_SPACE / kth
        print(
            f"| {k} | {est:.0f} | {exact} | {100 * (est - exact) / exact:+.2f}% "
            f"| ±{100.0 / math.sqrt(k - 2):.2f}% |"
        )


if __name__ == "__main__":
    main()
