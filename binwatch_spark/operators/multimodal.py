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


FRAME_CHARS = 128  # stub "frame" = fixed-length character window
FRAME_STRIDE = 4  # keep every 4th frame

FRAME_SCHEMA = (
    "doc_id bigint, frame_idx bigint, frame_sha256 string, frame_bytes bigint"
)


def sample_frames(
    df: DataFrame,
    id_col: str = "doc_id",
    frame_chars: int = FRAME_CHARS,
    stride: int = FRAME_STRIDE,
) -> DataFrame:
    """Frame-sampling stage for video-like payloads: split the decoded
    payload into fixed-size frames, keep every ``stride``-th, emit one row
    per sampled frame with its digest — the subsample-before-featurize step
    every video pipeline runs so the expensive model only sees 1/stride of
    the frames. mapInPandas with a fan-out output (rows out > rows in),
    which is exactly the batch shape a real ffmpeg/decord sampler needs.
    The stub frames CHARACTER windows of the text stand-in (deterministic,
    engine-checkable: DuckDB has no blob slicing, and char windows hash
    identically via UTF-8); a real decoder replaces only the framing
    function."""

    def frame_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids: list[int] = []
            idxs: list[int] = []
            shas: list[str] = []
            lens: list[int] = []
            for did, content in zip(pdf[id_col], pdf["content"]):
                text = bytes(content).decode("utf-8")
                n_frames = (len(text) + frame_chars - 1) // frame_chars
                for k in range(0, n_frames, stride):
                    frame = text[k * frame_chars : (k + 1) * frame_chars]
                    raw = frame.encode("utf-8")
                    ids.append(did)
                    idxs.append(k)
                    shas.append(hashlib.sha256(raw).hexdigest())
                    lens.append(len(raw))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int64"),
                    "frame_sha256": pd.Series(shas, dtype="object"),
                    "frame_bytes": pd.Series(lens, dtype="int64"),
                }
            )

    return df.mapInPandas(frame_batches, schema=FRAME_SCHEMA)


THUMB_CHARS = 256  # stub "resize" target

RESIZE_SCHEMA = "doc_id bigint, thumb_sha256 string, thumb_bytes bigint"


def resize_thumbnail(
    df: DataFrame, id_col: str = "doc_id", out_chars: int = THUMB_CHARS
) -> DataFrame:
    """Resize/thumbnail stage: shrink each payload to a fixed budget before
    storage or featurizing (the 100 TB lever: a thumbnail column is orders
    of magnitude smaller than originals and usually what downstream models
    consume). Stub: prefix window of the decoded payload; a real resizer
    (PIL/opencv) replaces only the shrink function — the mapInPandas
    contract, schema, and batching stay as tested."""

    def resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            thumbs = [
                bytes(c).decode("utf-8")[:out_chars].encode("utf-8")
                for c in pdf["content"]
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "thumb_sha256": [
                        hashlib.sha256(t).hexdigest() for t in thumbs
                    ],
                    "thumb_bytes": pd.Series(
                        [len(t) for t in thumbs], dtype="int64"
                    ),
                }
            )

    return df.mapInPandas(resize_batches, schema=RESIZE_SCHEMA)
