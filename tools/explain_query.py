#!/usr/bin/env python3
"""Print the optimized physical plan of any registered query.

    python tools/explain_query.py q3_join [sf_dir] [--simple]

The explain-and-iterate loop as a one-liner: shows PushedFilters,
ReadSchema, join strategies, Exchange placement, codegen spans.
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from benchmark_spark.plans.inspect import formatted_plan, simple_plan
from benchmark_spark.registry import all_specs
from benchmark_spark.session import get_spark


def main() -> int:
    args = [a for a in sys.argv[1:] if a != "--simple"]
    simple = "--simple" in sys.argv
    if not args:
        print(__doc__, file=sys.stderr)
        return 2
    name = args[0]
    sf_dir = args[1] if len(args) > 1 else "/root/testdata/sf0.001"
    specs = all_specs()
    if name not in specs:
        print(f"unknown query {name!r}; known: {sorted(specs)}", file=sys.stderr)
        return 2
    spark = get_spark("explain", shuffle_partitions=4)
    spark.sparkContext.setLogLevel("ERROR")
    df = specs[name].fn(spark, sf_dir)
    print(simple_plan(df) if simple else formatted_plan(df))
    return 0


if __name__ == "__main__":
    main()
