"""FNV-1a64 sharding — parity with the reference's scale-out partitioner.

The reference routes each event to exactly one of N instances via
``FNV1a64(key) % count == index`` (blsenderwork.go:126-149), where key is a
rendered key-template, falling back to the 8 little-endian bytes of the binlog
position (blsenderwork.go:135-141). Go's ``hash/fnv`` 64-bit parameters:
offset basis 14695981039346656037, prime 1099511628211.

Spark's own hash partitioning is Murmur3; FNV parity matters only when shard
ids must agree with the reference across systems (q08, property tests). We
implement it as a *vectorized* Pandas UDF over numpy uint64 — Arrow-batched,
~100× faster than a row-at-a-time Python UDF, and the only Python in the hot
path. For production routing inside Spark, `repartition(N, key)` (Murmur3) is
the idiomatic choice and needs no UDF at all.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import LongType

FNV_OFFSET_BASIS = 14695981039346656037
FNV_PRIME = 1099511628211

_U64_OFFSET = np.uint64(FNV_OFFSET_BASIS)
_U64_PRIME = np.uint64(FNV_PRIME)
_U64_FF = np.uint64(0xFF)


def _fnv1a64_u64_le8(values: np.ndarray) -> np.ndarray:
    """FNV-1a64 over the 8 little-endian bytes of each uint64 (vectorized).

    Matches the reference's position fallback: binary.LittleEndian.PutUint64
    then hash.Write (blsenderwork.go:142-147).
    """
    h = np.full(values.shape, _U64_OFFSET, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for i in range(8):
            byte = (values >> np.uint64(8 * i)) & _U64_FF
            h = (h ^ byte) * _U64_PRIME
    return h


def fnv1a64_bytes(data: bytes) -> int:
    """Scalar FNV-1a64 over arbitrary bytes (Go hash/fnv semantics) —
    used for key-template keys and unit-test vectors."""
    h = FNV_OFFSET_BASIS
    for b in data:
        h = ((h ^ b) * FNV_PRIME) & 0xFFFFFFFFFFFFFFFF
    return h


@pandas_udf(LongType())
def fnv1a64_position(pos: pd.Series) -> pd.Series:
    """Column UDF: FNV-1a64 of the 8 LE bytes of a bigint position.

    Returns the hash reinterpreted as signed int64 (two's complement); use
    ``shard_id`` for the unsigned ``% count`` the reference applies.
    """
    v = pos.to_numpy(dtype=np.int64).view(np.uint64)
    return pd.Series(_fnv1a64_u64_le8(v).view(np.int64))


def make_shard_udf(count: int):
    """Shard assignment ``FNV1a64(le8(pos)) % count`` with *unsigned* modulo,
    exactly as Go computes ``hash % uint64(count)`` (blsenderwork.go:147)."""
    u_count = np.uint64(count)

    @pandas_udf(LongType())
    def shard_of_position(pos: pd.Series) -> pd.Series:
        v = pos.to_numpy(dtype=np.int64).view(np.uint64)
        return pd.Series((_fnv1a64_u64_le8(v) % u_count).view(np.int64))

    return shard_of_position


def make_shard_key_udf(count: int):
    """Shard assignment over a *string* key (the rendered key-template path,
    blsenderwork.go:131-134): FNV-1a64 of the UTF-8 bytes, unsigned % count."""
    u_count = int(count)

    @pandas_udf(LongType())
    def shard_of_key(key: pd.Series) -> pd.Series:
        # Nulls map to None, not an exception: Spark evaluates extracted
        # pandas-UDF branches of a when/otherwise unconditionally, so a null
        # key (e.g. the key-template error fallback in pipeline._shard_filter)
        # must not abort the batch — the when() then selects the position
        # fallback, mirroring the reference (blsenderwork.go:135-147).
        out: list[int | None] = []
        for s in key:
            if s is None or (isinstance(s, float) and pd.isna(s)):
                out.append(None)
                continue
            h = fnv1a64_bytes(s.encode("utf-8") if isinstance(s, str) else bytes(s))
            out.append(int(np.int64(np.uint64(h % u_count))))
        return pd.Series(out, dtype="Int64")

    return shard_of_key


def shard_id(pos: Column, count: int) -> Column:
    """Column expression for the reference's shard id of a position."""
    return make_shard_udf(count)(pos)


def shard_filter(pos: Column, count: int, index: int) -> Column:
    """``shouldProcess`` predicate (blsenderwork.go:126-149): this instance
    handles the event iff hash % count == index."""
    return shard_id(pos, count) == F.lit(index)
