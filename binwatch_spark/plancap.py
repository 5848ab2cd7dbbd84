"""Opt-in inner-round physical-plan capture for iterative operators.

VERDICT r12 #3: the human-readable plan audit (docs/PLANS_r*.md) showed
`Scan ExistingRDD` for iterative / driver-assembled queries — the final
k-row result — hiding exactly the plans that cost the money (the
per-round CC / power-iteration / BPE / GD kernels). Those kernels now
call :func:`capture` on their round DataFrame right before the action
that materializes it; inside a :func:`capturing` context the FIRST plan
per tag is recorded, outside it the call is a no-op ``is None`` check.

This is observability only — no behavior change, and tests/test_plans.py
remains the enforcement layer. gen_plan_audit.py wraps each audited
query in ``capturing()`` and appends the captured inner-round plans to
the query's section.
"""

from __future__ import annotations

import contextlib
import io

_SINK: dict[str, str] | None = None


def capture(tag: str, df) -> None:
    """Record ``df``'s simple physical plan under ``tag`` (first win —
    round 1's plan is representative; later rounds differ only in
    lineage roots thanks to the per-round localCheckpoint)."""
    if _SINK is None or tag in _SINK:
        return
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("simple")
    _SINK[tag] = buf.getvalue().rstrip()


@contextlib.contextmanager
def capturing():
    """Enable capture; yields the dict that fills with {tag: plan}."""
    global _SINK
    old, _SINK = _SINK, {}
    try:
        yield _SINK
    finally:
        _SINK = old
