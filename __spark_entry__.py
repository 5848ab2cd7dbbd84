"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

All real code lives in ``binwatch_spark/``; this module only adapts the
registry (binwatch_spark/plans/registry.py) to the driver's interface.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from binwatch_spark.plans import all_oracles, all_queries  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (SURVEY.md §7.0): customer⋈orders⋈lineitem pricing
    roll-up on /root/testdata/sf0.001 — scan → filter → broadcast join →
    shuffle join → groupBy → deterministic top-10."""
    from binwatch_spark.plans.relational import q13_multijoin_pricing

    return q13_multijoin_pricing(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.4."""
    return all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle twin for every SQL-expressible query. The only
    rows-only entry is q55_approx_distinct (HLL sketch estimates have no
    DuckDB spelling) — everything else, including FNV-1a64 sharding (q08,
    spelled as HUGEINT modular arithmetic), carries a full oracle."""
    return all_oracles()
