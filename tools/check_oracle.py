#!/usr/bin/env python3
"""Run the full registry against the DuckDB oracle locally (the
driver-gate mimic). Usage:

    python tools/check_oracle.py [sf_dir] [name ...]

Defaults to /root/testdata/sf0.01 and all registered queries.
Exit code = number of failing queries.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from benchmark_spark.registry import all_specs
from benchmark_spark.session import get_spark
from benchmark_spark.testing import compare, duckdb_connection, run_rows_only


def main() -> int:
    args = sys.argv[1:]
    sf_dir = args[0] if args and "/" in args[0] else "/root/testdata/sf0.01"
    names = [a for a in args if "/" not in a]
    specs = all_specs()
    if names:
        # validate before paying JVM startup; exit 2 = usage error,
        # distinct from the "number of failing queries" contract
        unknown = [n for n in names if n not in specs]
        if unknown:
            print(f"unknown queries: {unknown}; known: {sorted(specs)}", file=sys.stderr)
            return 2
        specs = {n: specs[n] for n in names}
    spark = get_spark("check-oracle", shuffle_partitions=8)
    con = duckdb_connection(sf_dir)
    failures = 0
    for name, spec in specs.items():
        t0 = time.time()
        try:
            df = spec.fn(spark, sf_dir)
            if spec.oracle is None:
                res = run_rows_only(name, df)
            else:
                res = compare(name, df, con, spec.oracle)
        except Exception as e:  # noqa: BLE001 - report and continue
            failures += 1
            print(f"[ERROR] {name}: {type(e).__name__}: {str(e).splitlines()[0][:300]}")
            continue
        if not res.ok:
            failures += 1
        print(f"{res.message()}  ({time.time() - t0:.2f}s)")
    print(f"\n{len(specs) - failures}/{len(specs)} passed")
    return failures


if __name__ == "__main__":
    sys.exit(main())
