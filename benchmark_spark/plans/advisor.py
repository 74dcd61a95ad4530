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
    findings.extend(_skew_split_blocked(df))
    # Round 8 (the q8_knn lesson, BENCH_NOTES r8): higher-order
    # functions (zip_with/aggregate/transform lambdas) are
    # CodegenFallback — interpreted per-element evaluation. Often fine
    # map-side, but when the HOF expression lands inside
    # TakeOrderedAndProject's projection it is evaluated row-at-a-time
    # in the sort operator with NO codegen stage below computing it —
    # measured 2x the whole work term on q8_knn. Detect the specific
    # pathology (lambdafunction on the TakeOrderedAndProject node
    # line), not HOF use in general.
    lines = plan.splitlines()
    hof_feeds_topk = False
    for i, line in enumerate(lines):
        if "TakeOrderedAndProject" not in line:
            continue
        # the sort key is computed by the operator directly beneath;
        # an interpreted (no codegen star) Project evaluating a lambda
        # there runs the HOF per input row outside any codegen stage
        child = lines[i + 1] if i + 1 < len(lines) else ""
        if (
            "lambdafunction" in line
            or ("Project" in child and "lambdafunction" in child and "*" not in child.split("Project")[0])
        ):
            hof_feeds_topk = True
            break
    if hof_feeds_topk:
        findings.append(
            Finding(
                "interpreted-hof-in-topk",
                "warn",
                "a higher-order-function expression (zip_with/aggregate/"
                "transform lambda) is evaluated inside "
                "TakeOrderedAndProject's projection: HOFs are "
                "CodegenFallback, so every input row pays interpreted "
                "per-element evaluation in the sort operator (measured "
                "2x the work term on q8_knn, BENCH_NOTES r8). Fix: "
                "compute the value in a codegen stage first — e.g. "
                "arrays_zip -> posexplode -> partial aggregate "
                "(bit-identical to the fold), then order by the "
                "materialized column.",
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


# Operators that may legally sit between a shuffle join and its
# Exchange without disabling AQE skew-split (the rule's pattern is
# SMJ/SHJ over Sort(ShuffleQueryStage); codegen wrappers are
# transparent). Anything ELSE on that path — an aggregate (e.g. a
# distinct-derived dim), a window, a generate — makes the child not a
# direct shuffle read, and the split silently never happens: measured
# on Spark 4.1.2 and pinned in tests/test_plans.py::
# test_aqe_skew_split_fires_on_skewed_join.
_SKEW_TRANSPARENT = ("Sort", "WholeStageCodegen", "InputAdapter", "Project", "Filter")
_SKEW_JOINS = ("SortMergeJoin", "ShuffledHashJoin")


def _skew_split_blocked(df: DataFrame) -> list[Finding]:
    """Tree-walk the physical plan for shuffle joins whose child path
    to the Exchange passes through a non-transparent operator —
    those joins cannot be rescued by AQE skew-join splitting."""
    try:
        root = df._jdf.queryExecution().executedPlan()  # noqa: SLF001
        if root.nodeName() == "AdaptiveSparkPlan":
            # the adaptive wrapper hides its input; initialPlan is the
            # EnsureRequirements output — Exchanges present, which is
            # exactly the shape the skew rule pattern-matches against
            root = root.initialPlan()
    except Exception:  # pragma: no cover - plan unavailable
        return []

    def children(node):
        seq = node.children()
        return [seq.apply(i) for i in range(seq.length())]

    def blocker_on_path(node) -> str | None:
        """First non-transparent operator between here and the nearest
        Exchange/ShuffleQueryStage, or None if the path is direct."""
        name = node.nodeName()
        if "Exchange" in name or "ShuffleQueryStage" in name or "AQEShuffleRead" in name:
            return None
        if not any(name.startswith(t) for t in _SKEW_TRANSPARENT):
            return name
        for c in children(node):
            b = blocker_on_path(c)
            if b is not None:
                return b
        return None

    findings: list[Finding] = []
    stack = [(root, 0)]  # (node, aggregates seen since last Exchange above)
    while stack:
        node, aggs_above = stack.pop()
        name = node.nodeName()
        if "Exchange" in name or "ShuffleQueryStage" in name:
            aggs_above = 0
        elif name.startswith(("HashAggregate", "ObjectHashAggregate", "SortAggregate")):
            aggs_above += 1
        kids = children(node)
        stack.extend((k, aggs_above) for k in kids)
        if not any(name.startswith(j) for j in _SKEW_JOINS):
            continue
        if aggs_above >= 2:
            # a partial+final aggregate pair sits above this join with
            # no Exchange between: the final agg's distribution
            # requirement is satisfied BY the join's hash partitioning
            # (that is why no exchange was inserted), so splitting the
            # skewed partition would break it and AQE reverts the
            # split. Measured: distinct() directly above a skewed join
            # never shows skew=true, while a groupBy on unrelated keys
            # (partial agg only, final after its own exchange) splits
            # fine. This is the uncapped-LSH pair-join shape.
            findings.append(
                Finding(
                    "skew-split-blocked",
                    "warn",
                    f"a final-mode aggregate consumes {name}'s output "
                    "partitioning in the same stage (e.g. distinct() "
                    "or groupBy on the join key directly above the "
                    "join): AQE cannot split a skewed partition "
                    "without breaking that requirement, so the split "
                    "silently never happens (measured on Spark "
                    "4.1.2). If this join key can be skewed, "
                    "materialize the join output before aggregating, "
                    "aggregate on different keys, or bound the skew "
                    "at the source (capped_lsh_candidates pattern).",
                )
            )
        for side, child in zip(("left", "right"), kids):
            # broadcast children are not shuffle reads and not at risk
            if "Broadcast" in child.nodeName():
                continue
            blocker = blocker_on_path(child)
            if blocker is not None:
                findings.append(
                    Finding(
                        "skew-split-blocked",
                        "warn",
                        f"{node.nodeName()}'s {side} child reads its "
                        f"shuffle through {blocker}: AQE skew-join "
                        "splitting only fires when both children read "
                        "the shuffle directly (measured on Spark 4.1.2 "
                        "— a distinct()-derived dim loses the split "
                        "silently). If this join key can be skewed, "
                        "materialize the blocked side first or use "
                        "salted_join (operators/skew.py).",
                    )
                )
    return findings


def advise_query(spark, name: str, sf_dir: str) -> list[Finding]:
    from benchmark_spark.registry import get_query

    return advise(get_query(name).fn(spark, sf_dir))
