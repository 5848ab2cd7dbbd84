"""Declared query inventory (SURVEY.md §2.4) — the verification contract.

Importing this package registers every query. Use :func:`all_queries` /
:func:`all_oracles` from ``registry``.
"""

from binwatch_spark.plans import (  # noqa: F401
    analytics,
    cdc_queries,
    dedup_queries,
    northstar,
    pipeline_queries,
    relational,
    similarity_queries,
    sqlsurface,
    text_queries,
)
from binwatch_spark.plans.registry import REGISTRY, all_oracles, all_queries

__all__ = ["REGISTRY", "all_queries", "all_oracles"]
