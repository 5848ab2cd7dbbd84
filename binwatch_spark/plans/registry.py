"""Query registry: name → (Spark callable, DuckDB oracle SQL).

Every operator the engine claims is registered here with BOTH a Spark
implementation and (when SQL-expressible) a DuckDB oracle twin; the driver
hash-matches them at sf0.01. Determinism rules applied throughout:

- Alias every computed column identically in Spark and SQL (driver sorts
  columns by name before hashing).
- Float aggregates go through exact DECIMAL(18,4) accumulation, then a final
  cast to double — both engines then produce bit-identical doubles regardless
  of partial-aggregation order (double summation is order-sensitive; decimal
  summation is exact).
- Any top-k has a total-order tiebreak so the *set* of rows is deterministic.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL twin; None → driver does rows-only check
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None = None, doc: str = ""):
    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = QuerySpec(name, fn, oracle, doc or (fn.__doc__ or ""))
        return fn

    return deco


def all_queries() -> dict[str, QueryFn]:
    return {name: spec.fn for name, spec in sorted(REGISTRY.items())}


def all_oracles() -> dict[str, str]:
    return {
        name: spec.oracle for name, spec in sorted(REGISTRY.items()) if spec.oracle
    }
