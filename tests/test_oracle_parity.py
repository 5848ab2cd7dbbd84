"""Mirror of the driver's correctness gate: every registered query with an
oracle must match DuckDB exactly (count + schema + values) at sf0.001.
Rows-only queries are smoke-checked for non-empty, stable schema."""

from __future__ import annotations

import pytest

from binwatch_spark.plans.registry import REGISTRY
from binwatch_spark.testing import compare
from tests.conftest import SF_SMALL

ORACLE_QUERIES = sorted(n for n, s in REGISTRY.items() if s.oracle)
ROWS_ONLY_QUERIES = sorted(n for n, s in REGISTRY.items() if not s.oracle)


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_parity(spark, name):
    spec = REGISTRY[name]
    problems = compare(spark, SF_SMALL, name, spec.fn, spec.oracle)
    assert not problems, "\n".join(problems)


@pytest.mark.parametrize("name", ROWS_ONLY_QUERIES)
def test_rows_only_smoke(spark, name):
    spec = REGISTRY[name]
    df = spec.fn(spark, SF_SMALL)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.columns  # stable, non-empty schema


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(e.oracle_sql()) <= set(e.queries())
