"""VERDICT r12 #8: the committed oracles were generated with the DEFAULT
gate values. The gates are env-overridable for experiments
(``BINWATCH_Q42_EXACT_MAX_DOCS``, ``BINWATCH_WIDE_DIM_CUTOVER``), and
because query and oracle both derive from the same module constant they
can never de-sync from EACH OTHER — but an env var exported in a bench
shell WOULD silently de-sync both from the committed evidence
(CORRECTNESS_*.json were produced at the defaults). This suite runs in
the same shell as the gated verify, so an exported override fails it
loudly instead of producing hash-exact-but-differently-gated records."""

import os

# The documented defaults the committed CORRECTNESS/BENCH records assume.
DEFAULTS = {
    "BINWATCH_Q42_EXACT_MAX_DOCS": 20000,
    "BINWATCH_WIDE_DIM_CUTOVER": 256,
}


def test_gate_env_vars_not_exported():
    """The verify/bench shell must not carry gate overrides: the module
    constants were bound at import from these vars, so an export here
    means every record produced by this process used a non-default
    gate."""
    exported = {k: os.environ[k] for k in DEFAULTS if k in os.environ}
    assert not exported, (
        f"gate overrides exported in the test shell: {exported} — "
        "committed oracles assume the defaults; unset before verifying"
    )


def test_q42_gate_default_matches_committed_oracle():
    from binwatch_spark.plans import analytics

    assert analytics.Q42_EXACT_MAX_DOCS == DEFAULTS[
        "BINWATCH_Q42_EXACT_MAX_DOCS"
    ]
    # the gate the registry's oracle actually embeds is the same number —
    # this is the string DuckDB runs, i.e. what the driver hashes against
    from binwatch_spark.plans.registry import all_oracles

    oracles = all_oracles()
    for q in ("q42_dedup_clusters", "q71_dedup_clusters_star"):
        sql = oracles[q]
        assert f"<= {DEFAULTS['BINWATCH_Q42_EXACT_MAX_DOCS']}" in sql, q
        assert f"> {DEFAULTS['BINWATCH_Q42_EXACT_MAX_DOCS']}" in sql, q


def test_wide_dim_cutover_default():
    from binwatch_spark.operators import similarity

    assert similarity.WIDE_DIM_CUTOVER == DEFAULTS[
        "BINWATCH_WIDE_DIM_CUTOVER"
    ]


def test_band_key_cap_is_the_oracle_spelled_constant():
    """BAND_KEY_CAP is not env-overridable (plain constant), but the
    oracle SQL interpolates it at import — pin the value the committed
    records were generated with so an innocent-looking constant edit
    surfaces as a deliberate oracle regeneration, not silent drift."""
    from binwatch_spark.operators import dedup

    assert dedup.BAND_KEY_CAP == 100
