#!/usr/bin/env python3
"""Measure the Bloom semi-join reduction's operating curve: sweep the
filter size m and record the measured false-positive rate next to the
analytic (1 - e^(-kn/m))^k prediction (k = 2 hash functions). The
committed table in SCALE.md comes from this script.

    python tools/curve_bloomjoin.py [sf_dir]
"""

from __future__ import annotations

import math
import sys

sys.path.insert(0, "/root/repo")

from benchmark_spark.operators.sketches import bloom_join_stats
from benchmark_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark()
    print(f"| m (bits) | bits set | fill | measured fp | analytic fp | pass rows |")
    print("|---|---|---|---|---|---|")
    for log_m in (14, 15, 16, 17, 18, 20):
        m = 1 << log_m
        (row,) = bloom_join_stats(spark, sf_dir, m).collect()
        n_keys = row["bits_set"] / 2  # lower bound; each key sets <= 2 bits
        analytic = (1 - math.exp(-2 * n_keys / m)) ** 2
        fill = row["bits_set"] / m
        print(
            f"| 2^{log_m} | {row['bits_set']} | {fill:.4f} "
            f"| {row['fp_rate']:.6f} | {analytic:.6f} "
            f"| {row['bloom_pass']} ({row['true_match']} true) |"
        )


if __name__ == "__main__":
    main()
