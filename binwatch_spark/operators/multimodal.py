"""Multimodal column plumbing: image/audio/video as opaque binary columns with
typed metadata, processed through Arrow-batched mapInPandas.

The container has no image/audio codecs, so the decode step is STUBBED: a
deterministic fake featurizer stands in for the real decoder behind the same
mapInPandas signature — the Spark-side contract (schema, batch shape,
partition behavior) is real and tested; swapping in a real decoder changes
one function body, not the plumbing.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Output contract for the decode stage: metadata plus a fixed-length feature
# vector, regardless of modality.
DECODE_SCHEMA = (
    "doc_id bigint, byte_len bigint, content_sha256 string, "
    "feature array<double>"
)

FEATURE_DIM = 8


def with_binary_payload(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Model a multimodal asset: raw bytes + typed metadata columns. The
    fixture has no real media, so document text stands in as the payload."""
    return df.select(
        F.col(id_col),
        F.encode(F.col(text_col), "UTF-8").alias("content"),
        F.octet_length(F.col(text_col)).cast("bigint").alias("byte_len"),
        F.lit("text/plain").alias("mime_type"),
    )


def _fake_decode(payload: bytes) -> list[float]:
    """Deterministic stand-in for an image/audio decoder: 8 doubles derived
    from the sha256 digest. Replace with a real codec in production; raises
    nothing here so the plumbing is exercisable in-container."""
    digest = hashlib.sha256(payload).digest()
    return [b / 255.0 for b in digest[:FEATURE_DIM]]


def real_decode(payload: bytes) -> list[float]:  # pragma: no cover
    """The production decode hook. Image/audio libraries are not available in
    this container (see module docstring)."""
    raise NotImplementedError(
        "media codecs unavailable in this environment; _fake_decode stands in"
    )


def decode_features(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """mapInPandas decode stage: Arrow batches in, metadata + features out.

    Runs one Python worker per partition over columnar batches — the shape a
    real GPU/codec featurizer needs (amortized batch setup, no per-row IPC).
    """

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["content"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "byte_len": payloads.map(len).astype("int64"),
                    "content_sha256": payloads.map(
                        lambda b: hashlib.sha256(bytes(b)).hexdigest()
                    ),
                    "feature": payloads.map(lambda b: _fake_decode(bytes(b))),
                }
            )

    return df.mapInPandas(decode_batches, schema=DECODE_SCHEMA)
