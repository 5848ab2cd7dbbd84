"""Declared query inventory (SURVEY.md §2.4) — the verification contract.

Importing this package registers every query. Use :func:`all_queries` /
:func:`all_oracles` from ``registry``.
"""

from binwatch_spark.plans import cdc_queries, northstar, relational  # noqa: F401
from binwatch_spark.plans.registry import REGISTRY, all_oracles, all_queries

__all__ = ["REGISTRY", "all_queries", "all_oracles"]
