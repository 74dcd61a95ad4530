"""Query registry: the single source of truth for the driver contract.

Every operator from SURVEY.md §2 registers here as a QuerySpec:
a named Spark callable ``(spark, sf_dir) -> DataFrame`` plus (when
SQL-expressible) the equivalent DuckDB oracle SQL. ``__spark_entry__``
just re-exports this registry, so `queries()` / `oracle_sql()`
coverage grows in the same commit as each operator (SURVEY.md §7).

Conventions enforced here (SURVEY.md §5.2 gotchas):
  * every computed column is aliased identically in Spark and oracle;
  * double aggregates are rounded (2dp) on BOTH sides so the
    order-insensitive value-hash is stable under float reordering;
  * engine-generated integers (row_number, size, year, ...) are cast
    to BIGINT on the Spark side to match DuckDB's BIGINT defaults;
  * LIMIT queries always carry a deterministic tiebreaker key.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_REGISTRY: dict[str, "QuerySpec"] = {}

# Modules that register queries on import.
_QUERY_MODULES = (
    "benchmark_spark.operators.scans",
    "benchmark_spark.operators.aggregates",
    "benchmark_spark.operators.joins",
    "benchmark_spark.operators.windows",
    "benchmark_spark.operators.setops",
    "benchmark_spark.operators.skew",
    "benchmark_spark.operators.wordcount",
    "benchmark_spark.functions.scalars",
    "benchmark_spark.llm.dedup",
    "benchmark_spark.llm.similarity",
    "benchmark_spark.llm.text",
    "benchmark_spark.llm.multimodal",
    "benchmark_spark.streaming.windows",
    "benchmark_spark.udf.surface",
)


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL, or None -> driver does rows-only check
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


def register(
    name: str, oracle: str | None = None, doc: str = "", tags: tuple[str, ...] = ()
) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = QuerySpec(name, fn, oracle, doc or (fn.__doc__ or ""), tags)
        return fn

    return deco


def _load() -> None:
    for mod in _QUERY_MODULES:
        importlib.import_module(mod)


def all_specs() -> dict[str, QuerySpec]:
    _load()
    return dict(_REGISTRY)


def all_queries() -> dict[str, QueryFn]:
    return {name: spec.fn for name, spec in all_specs().items()}


def all_oracles() -> dict[str, str]:
    return {
        name: spec.oracle for name, spec in all_specs().items() if spec.oracle is not None
    }


def get_query(name: str) -> QuerySpec:
    _load()
    return _REGISTRY[name]
