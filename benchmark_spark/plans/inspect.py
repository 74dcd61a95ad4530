"""Physical-plan inspection helpers (SURVEY.md §4 verification).

The optimizer contract — predicate pushdown, column pruning,
broadcast of dims, no shuffle where none is needed, top-k without
global sort — is asserted in tests/test_plans.py using these
helpers, so a regression in plan quality fails CI, not just a
benchmark run. This is the engine's "explain and iterate" loop made
permanent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "formatted"
    )


def simple_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def pushed_filters(df: DataFrame) -> str:
    """The PushedFilters section of the scan node(s)."""
    plan = formatted_plan(df)
    return "\n".join(line for line in plan.splitlines() if "PushedFilters" in line)


def read_schema(df: DataFrame) -> str:
    plan = formatted_plan(df)
    return "\n".join(line for line in plan.splitlines() if "ReadSchema" in line)


def count_exchanges(df: DataFrame) -> int:
    """Number of shuffle Exchange operators in the physical plan.

    Uses the simple plan string (operator + arguments on one line);
    the formatted tree splits `Exchange (7)` from its
    `Arguments: hashpartitioning(...)` detail block."""
    plan = simple_plan(df)
    return sum(
        1
        for line in plan.splitlines()
        if "Exchange hashpartitioning" in line
        or "Exchange rangepartitioning" in line
        or "Exchange SinglePartition" in line
    )
