"""Skew-mitigation operators: salted joins for pathological key skew.

Spark's first line of defense is AQE skew-join splitting
(spark.sql.adaptive.skewJoin.enabled, on in session.get_spark), which
splits oversized sort-merge partitions at runtime. Salting is the
explicit fallback for the cases AQE can't fix:

- a single monster key that must still aggregate AFTER the join,
- broadcast-ineligible both-sides-big joins with one hot key,
- deterministic plans where runtime re-planning is disabled.

The scheme: the skewed (probe) side gets a deterministic salt in
[0, salts) derived from a high-entropy column it already carries; the
build side is replicated `salts` times; the join key becomes
(key, salt). Each hot key now spreads over `salts` tasks. Replication
multiplies the build side, so keep `salts` small (8-32) and the build
side projected to the joined columns.

The salt must be DETERMINISTIC (a hash of carried data, never rand()):
retries and speculative tasks must salt a row identically or the join
drops/duplicates rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, entropy_col: str | Column, salts: int) -> DataFrame:
    """Add a deterministic `_salt` column in [0, salts) hashed from
    entropy_col (any column with per-row variety — an id, a timestamp,
    a payload)."""
    col = F.col(entropy_col) if isinstance(entropy_col, str) else entropy_col
    return df.withColumn("_salt", F.pmod(F.xxhash64(col), F.lit(salts)))


def replicate_for_salt(df: DataFrame, salts: int) -> DataFrame:
    """Replicate every row once per salt value (the build side of a salted
    join). Replication happens in codegen via explode — no shuffle; the
    `salts`× volume is paid in the join exchange."""
    return df.withColumn(
        "_salt", F.explode(F.array(*[F.lit(s) for s in range(salts)]))
    )


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: str | list[str],
    entropy_col: str,
    salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join robust to hot keys on the skewed side.

    `skewed` is salted from entropy_col; `other` (the smaller side — it
    gets replicated `salts`×) joins on (on..., _salt). Result equals the
    plain join: every skewed row carries exactly one salt value and the
    other side carries all of them, so each matching pair meets exactly
    once.
    """
    if how not in ("inner", "left", "left_outer", "leftouter", "left_semi",
                   "leftsemi", "left_anti", "leftanti"):
        # With right/full joins the replicated build side's unmatched rows
        # would surface `salts` times each — the salt trick is only sound
        # when unmatched build rows are dropped.
        raise ValueError(
            f"salted_join supports inner/left/semi/anti joins, not {how!r}: "
            "unmatched rows of the replicated side would appear once per salt"
        )
    keys = [on] if isinstance(on, str) else list(on)
    left = with_salt(skewed, entropy_col, salts)
    right = replicate_for_salt(other, salts)
    return left.join(right, on=keys + ["_salt"], how=how).drop("_salt")
