"""Plan advisor: mechanical lint for 100 TB anti-patterns.

tests/test_plans.py pins the plans of OUR queries; this module turns
those checks into a reusable advisor a user can point at ANY
DataFrame before paying a cluster bill. Each rule names the
anti-pattern, why it hurts at scale, and the standard fix — the same
playbook SCALE.md documents, executable.

Rules are deliberately mechanical (string/structure checks over the
physical plan): they flag the plan Catalyst actually chose, not the
API the user typed, so an AQE rewrite or a broadcast that silently
fell back to sort-merge is caught after optimization.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame

from benchmark_spark.plans.inspect import formatted_plan, simple_plan


@dataclass(frozen=True)
class Finding:
    rule: str
    severity: str  # "error" | "warn"
    message: str


def advise(df: DataFrame) -> list[Finding]:
    """Lint one DataFrame's PHYSICAL plan for scale anti-patterns."""
    plan = simple_plan(df)
    fmt = formatted_plan(df)
    findings: list[Finding] = []

    if "CartesianProduct" in plan:
        findings.append(
            Finding(
                "cartesian-product",
                "error",
                "CartesianProduct in the plan: the join has no usable "
                "equi-condition. At any real size this is O(n*m) rows "
                "shuffled. Fix: add an equality predicate, or broadcast "
                "the (small) side explicitly if a cross product is "
                "intended.",
            )
        )
    if "BroadcastNestedLoopJoin" in plan:
        findings.append(
            Finding(
                "nested-loop-join",
                "warn",
                "BroadcastNestedLoopJoin: a non-equi join probes every "
                "broadcast row per input row. Acceptable for tiny "
                "broadcast sides; otherwise restructure into an "
                "equi-join + residual filter (the q_pit_join shape).",
            )
        )
    if "BatchEvalPython" in plan:
        findings.append(
            Finding(
                "row-python-udf",
                "error",
                "Row-at-a-time Python UDF in the plan: every row crosses "
                "the JVM/Python boundary unbatched (~10-100x slower than "
                "built-ins). Fix: built-in functions, or an Arrow-batched "
                "pandas_udf if Python is unavoidable.",
            )
        )
    if "ArrowEvalPython" in plan:
        findings.append(
            Finding(
                "pandas-udf",
                "warn",
                "Arrow-batched Python UDF in the plan: fine when no "
                "built-in expresses the logic, but it blocks whole-stage "
                "codegen and filter pushdown through the UDF. Keep it "
                "out of the pre-filter hot path.",
            )
        )
    # count only real shuffle barriers (ADVICE.md r5): lines whose node
    # is a plain Exchange, excluding BroadcastExchange AND
    # ReusedExchange — a ReusedExchange line repeats the original's
    # "Exchange hashpartitioning(...)" descriptor but reads an
    # already-shuffled output, so substring counting double-reported
    # plans with exchange reuse.
    n_exchanges = sum(
        1
        for line in plan.splitlines()
        if "Exchange" in line
        and "BroadcastExchange" not in line
        and "ReusedExchange" not in line
    )
    if n_exchanges > 6:
        findings.append(
            Finding(
                "shuffle-count",
                "warn",
                f"{n_exchanges} shuffle Exchanges in one plan: each is a "
                "full network barrier at scale. Look for repeated "
                "re-partitioning of the same data (cache or pre-bucket "
                "the shared input) or join keys that keep changing.",
            )
        )
    # a scan that reads every column then projects a few wastes IO:
    # compare the widest ReadSchema against the final output width
    read_lines = [l for l in fmt.splitlines() if "ReadSchema" in l]
    if read_lines:
        widest = max(l.count(",") + 1 for l in read_lines)
        if widest >= 6 and len(df.columns) <= 3 and "Scan parquet" in fmt:
            findings.append(
                Finding(
                    "column-pruning",
                    "warn",
                    f"a scan reads ~{widest} columns while the query "
                    f"returns {len(df.columns)}: projection may not be "
                    "reaching the scan (UDF or early materialization in "
                    "the way). Check ReadSchema in explain('formatted').",
                )
            )
    if "SortMergeJoin" in plan and "TakeOrderedAndProject" not in plan:
        # SMJ against a side that also appears filtered-to-small hints
        # a missed broadcast; purely advisory
        if plan.count("BroadcastExchange") == 0 and plan.count("SortMergeJoin") >= 2:
            findings.append(
                Finding(
                    "all-smj",
                    "warn",
                    "multiple SortMergeJoins and zero broadcasts: if any "
                    "side is dimension-sized, hint broadcast() — the "
                    "fact-side shuffles dominate the bill otherwise.",
                )
            )
    return findings


def advise_query(spark, name: str, sf_dir: str) -> list[Finding]:
    from benchmark_spark.registry import get_query

    return advise(get_query(name).fn(spark, sf_dir))
