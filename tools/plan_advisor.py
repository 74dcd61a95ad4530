#!/usr/bin/env python3
"""Lint registered queries' physical plans for scale anti-patterns.

Usage: python tools/plan_advisor.py [sf_dir] [name ...]
Defaults to every registered query at /root/testdata/sf0.001.
Exit code = number of error-severity findings.
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from benchmark_spark.plans.advisor import advise
from benchmark_spark.registry import all_specs
from benchmark_spark.session import get_spark


def main() -> int:
    args = sys.argv[1:]
    sf_dir = args[0] if args and "/" in args[0] else "/root/testdata/sf0.001"
    names = [a for a in args if "/" not in a]
    specs = all_specs()
    if names:
        specs = {n: specs[n] for n in names}
    spark = get_spark("plan-advisor", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    errors = 0
    for name, spec in specs.items():
        if "streaming" in spec.tags:
            continue  # writeStream queries execute on build; skip lint
        try:
            findings = advise(spec.fn(spark, sf_dir))
        except Exception as exc:  # pragma: no cover - build failures
            print(f"{name}: ADVISOR-SKIP ({type(exc).__name__})")
            continue
        for f in findings:
            print(f"{name}: [{f.severity}] {f.rule}: {f.message.splitlines()[0]}")
            errors += f.severity == "error"
        if not findings:
            print(f"{name}: clean")
    return errors


if __name__ == "__main__":
    sys.exit(main())
