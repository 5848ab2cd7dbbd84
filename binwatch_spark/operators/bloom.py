"""Bloom-filter join prefiltering — the runtime-filter pattern that cuts a
fact-table shuffle before a selective join.

At 100 TB the win: when the dim side is selective but too large to
broadcast as a hash join (or the join must shuffle for other reasons), a
Bloom filter of the dim keys IS broadcastable at any dim size — m bits,
constant — and pre-filters the fact scan map-side, so the exchange carries
only rows that can possibly match (plus the false-positive sliver). The
join afterwards is exact, so results are bit-identical to the unfiltered
plan — which is exactly how it is oracle-checked (q130: plain-join SQL; the
bloom never needs a cross-engine spelling because it cannot change the
answer, only the shuffle volume).

Spark's own AQE runtime bloom filters
(``spark.sql.optimizer.runtime.bloomFilter.enabled``) inject the same
structure automatically when statistics justify it; this operator is the
explicit, deterministic form a pipeline can apply unconditionally (and the
form that works on the streaming side, where AQE does not run).

Hashes are ``xxhash64(seed_i, key)`` — engine-internal, never part of the
result contract.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

BLOOM_BITS = 1024  # fixture-sized default; production sizes from n·ln(fpp)
BLOOM_HASHES = 3


def _positions(key: Column, m_bits: int, k: int) -> list[Column]:
    # non-negative modulo of the signed 64-bit hash
    return [
        ((F.xxhash64(F.lit(i), key) % m_bits) + m_bits) % m_bits
        for i in range(k)
    ]


def bloom_build(
    dim: DataFrame,
    key_col: str,
    m_bits: int = BLOOM_BITS,
    k: int = BLOOM_HASHES,
) -> list[int]:
    """Build the filter distributed: explode each dim key to its k bit
    positions, aggregate per 64-bit word with ``bit_or`` (map-side partial
    → m/64 rows total), collect the m/64 words. The driver holds m bits
    regardless of dim cardinality — the same bounded-state rule as the
    k-means centroids."""
    n_words = m_bits // 64
    pos = dim.select(
        F.explode(F.array(*_positions(F.col(key_col), m_bits, k))).alias(
            "pos"
        )
    )
    shl = F.call_function(
        "shiftleft", F.lit(1).cast("bigint"), (F.col("pos") % 64).cast("int")
    )
    words = (
        pos.select(
            (F.col("pos") / 64).cast("int").alias("w"),
            shl.alias("bit"),
        )
        .groupBy("w")
        .agg(F.bit_or("bit").alias("bits"))
        .collect()
    )
    out = [0] * n_words
    for r in words:
        out[r["w"]] = r["bits"]
    return out


def bloom_prefilter(
    fact: DataFrame,
    key_col: str,
    bits: list[int],
    m_bits: int = BLOOM_BITS,
    k: int = BLOOM_HASHES,
) -> DataFrame:
    """Map-side membership test against the built filter: every one of the
    key's k bits must be set. Pure codegen expression over a literal
    array (the broadcast payload is m/64 longs inside the plan itself) —
    no shuffle, no UDF. False positives pass through to the exact join;
    false negatives are impossible, so the join result is unchanged."""
    arr = F.array(*[F.lit(w).cast("bigint") for w in bits])
    cond = None
    for pos in _positions(F.col(key_col), m_bits, k):
        word = F.element_at(arr, (pos / 64).cast("int") + 1)
        mask = F.call_function(
            "shiftleft", F.lit(1).cast("bigint"), (pos % 64).cast("int")
        )
        hit = word.bitwiseAND(mask) != 0
        cond = hit if cond is None else (cond & hit)
    return fact.filter(cond)
