"""The hash-exact compare in tools/oracle_check.py IS the local evidence
gate (VERDICT r04 #1) — pin its semantics so a refactor can't silently
weaken it back to a tolerance compare."""

from __future__ import annotations

import datetime
import decimal
import importlib.util
import sys

spec = importlib.util.spec_from_file_location(
    "oracle_check", "/root/repo/tools/oracle_check.py"
)
oc = importlib.util.module_from_spec(spec)
sys.modules["oracle_check"] = oc
spec.loader.exec_module(oc)


def test_canon_distinguishes_types_and_normalizes_equivalents():
    # type-distinct
    assert oc.canon(1) != oc.canon("1")
    assert oc.canon(1) != oc.canon(True)
    assert oc.canon(None) != oc.canon("")
    # float by bit pattern, but -0.0 folds to 0.0 and NaNs collapse
    assert oc.canon(-0.0) == oc.canon(0.0)
    assert oc.canon(float("nan")) == oc.canon(float("nan"))
    assert oc.canon(0.1 + 0.2) != oc.canon(0.3)  # exact, not tolerant
    # decimals numerically (DuckDB DECIMAL scale vs Spark scale)
    assert oc.canon(decimal.Decimal("1.10")) == oc.canon(decimal.Decimal("1.1"))
    assert oc.canon(decimal.Decimal("1.10")) != oc.canon(decimal.Decimal("1.2"))
    # temporal + nested
    assert oc.canon(datetime.date(2024, 3, 5)) != oc.canon(
        datetime.datetime(2024, 3, 5)
    )
    assert oc.canon([1, [2, "x"]]) == oc.canon((1, (2, "x")))
    assert oc.canon([1, 2]) != oc.canon([2, 1])


def test_value_hash_is_order_insensitive_in_rows_and_columns():
    rows_a = [(1, "x"), (2, "y")]
    rows_b = [(2, "y"), (1, "x")]
    assert oc.value_hash(rows_a, ["id", "s"]) == oc.value_hash(
        rows_b, ["id", "s"]
    )
    # column order normalized by NAME: (s, id) with swapped tuples matches
    swapped = [("x", 1), ("y", 2)]
    assert oc.value_hash(rows_a, ["id", "s"]) == oc.value_hash(
        swapped, ["s", "id"]
    )
    # but different values do not
    assert oc.value_hash(rows_a, ["id", "s"]) != oc.value_hash(
        [(1, "x"), (2, "z")], ["id", "s"]
    )


def test_value_hash_exact_on_floats():
    a = [(0.1 + 0.2,)]
    b = [(0.3,)]
    assert oc.value_hash(a, ["v"]) != oc.value_hash(b, ["v"])
    assert oc.value_hash(a, ["v"]) == oc.value_hash([(0.1 + 0.2,)], ["v"])
