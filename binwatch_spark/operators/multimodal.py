"""Multimodal column plumbing: image/audio/video as opaque binary columns with
typed metadata, processed through Arrow-batched mapInPandas.

The decode step is REAL for PNG images — a pure-stdlib decoder (zlib
inflate + all five scanline filters, CRC-checked; see ``png_decode``) feeds
``real_decode``'s bytes→pixels path, oracle-checked end-to-end by
q119_png_decode. For every other modality the container has no codecs, so a
deterministic fake featurizer stands in behind the same mapInPandas
signature — the Spark-side contract (schema, batch shape, partition
behavior) is identical either way; ``decode_features`` tries the real
decoder per payload and falls back to the fake for undecodable bytes.
"""

from __future__ import annotations

import hashlib
import struct
import zlib
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
    fixture has no real media, so document text stands in as the payload.

    The input is spread to session parallelism first (tables.spread): every
    consumer of a payload frame is a compute-heavy Python decode stage, and
    the single-row-group fixture parquet otherwise scans as ONE task, so the
    whole decode family ran single-threaded (r13 profile: q119 = one 2.45 s
    task on a 32-core session). No-op at cluster scale where scans arrive
    with enough splits."""
    from binwatch_spark.tables import spread

    return spread(df, id_col).select(
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


PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def _paeth(a: int, b: int, c: int) -> int:
    """Paeth predictor (PNG spec §9.4): nearest of left/above/upper-left to
    the linear estimate a + b - c, ties broken left, above, upper-left."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def png_encode(
    pixels: bytes, width: int, height: int, channels: int, row_filter=None
) -> bytes:
    """Minimal PNG encoder for 8-bit grayscale (channels=1) / RGB (3):
    IHDR + one IDAT + IEND, non-interlaced. ``row_filter(y) -> 0..4``
    selects each scanline's filter type (default: y % 5, cycling through
    None/Sub/Up/Average/Paeth so a decoder round-trip exercises every
    reconstruction rule). Exists for fixture/image synthesis — the decode
    direction is the production path."""
    if channels not in (1, 3):
        raise ValueError("png_encode supports grayscale or RGB only")
    if len(pixels) != width * height * channels:
        raise ValueError("pixel buffer does not match dimensions")
    row_filter = row_filter or (lambda y: y % 5)
    stride = width * channels
    prior = bytes(stride)
    raw = bytearray()
    for y in range(height):
        row = pixels[y * stride : (y + 1) * stride]
        ft = int(row_filter(y)) % 5
        raw.append(ft)
        for x in range(stride):
            left = row[x - channels] if x >= channels else 0
            up = prior[x]
            ul = prior[x - channels] if x >= channels else 0
            if ft == 0:
                raw.append(row[x])
            elif ft == 1:
                raw.append((row[x] - left) & 0xFF)
            elif ft == 2:
                raw.append((row[x] - up) & 0xFF)
            elif ft == 3:
                raw.append((row[x] - (left + up) // 2) & 0xFF)
            else:
                raw.append((row[x] - _paeth(left, up, ul)) & 0xFF)
        prior = row

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    color_type = 0 if channels == 1 else 2
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    return (
        PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def png_decode(payload: bytes) -> tuple[int, int, int, bytes]:
    """Pure-stdlib PNG decode → (width, height, channels, pixel bytes).

    Supports what a feature-extraction pipeline actually needs from a
    decoder: 8-bit depth, grayscale (color type 0) and truecolor RGB (2),
    non-interlaced, multi-IDAT, CRC-verified chunks, all five scanline
    filters reconstructed per the spec (§9.2 — each byte recovered from
    left/above/upper-left of the RECONSTRUCTED data). Anything else
    (palette, alpha, 16-bit, Adam7) raises ValueError — at 100 TB you
    normalize exotic variants once at ingest, not in every decode task."""
    if not payload.startswith(PNG_MAGIC):
        raise ValueError("not a PNG payload")
    pos = len(PNG_MAGIC)
    width = height = channels = -1
    idat = bytearray()
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        tag = payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack(
            ">I", payload[pos + 8 + length : pos + 12 + length]
        )
        if zlib.crc32(tag + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk CRC mismatch in {tag!r}")
        if tag == b"IHDR":
            width, height, depth, color_type, comp, filt, interlace = (
                struct.unpack(">IIBBBBB", body)
            )
            if depth != 8 or interlace != 0 or comp != 0 or filt != 0:
                raise ValueError("unsupported PNG variant")
            if color_type == 0:
                channels = 1
            elif color_type == 2:
                channels = 3
            else:
                raise ValueError(f"unsupported PNG color type {color_type}")
        elif tag == b"IDAT":
            idat.extend(body)
        elif tag == b"IEND":
            break
        pos += 12 + length
    if width < 0 or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    raw = zlib.decompress(bytes(idat))
    stride = width * channels
    if len(raw) != height * (stride + 1):
        raise ValueError("PNG scanline data size mismatch")
    out = bytearray(height * stride)
    prior = bytes(stride)
    for y in range(height):
        ft = raw[y * (stride + 1)]
        line = raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)]
        rec = bytearray(stride)
        for x in range(stride):
            left = rec[x - channels] if x >= channels else 0
            up = prior[x]
            ul = prior[x - channels] if x >= channels else 0
            if ft == 0:
                rec[x] = line[x]
            elif ft == 1:
                rec[x] = (line[x] + left) & 0xFF
            elif ft == 2:
                rec[x] = (line[x] + up) & 0xFF
            elif ft == 3:
                rec[x] = (line[x] + (left + up) // 2) & 0xFF
            elif ft == 4:
                rec[x] = (line[x] + _paeth(left, up, ul)) & 0xFF
            else:
                raise ValueError(f"bad PNG filter type {ft}")
        out[y * stride : (y + 1) * stride] = rec
        prior = bytes(rec)
    return width, height, channels, bytes(out)


def real_decode(payload: bytes) -> list[float]:
    """The production decode hook: actual bytes→pixels for PNG payloads
    (pure-stdlib decoder above), features = [width, height, channels,
    mean_c0, mean_c1, mean_c2, min_px, max_px] (absent channels → 0.0;
    integer sums divided by pixel count — exact in doubles for fixture
    sizes, so the q119 oracle can spell the identical means in SQL).
    WAV payloads (RIFF magic) route to the audio featurizer
    (:func:`wav_features` — same 8-slot layout, audio semantics per slot).
    Other modalities raise NotImplementedError — no further codecs ship
    in this container; decode_features falls back to the deterministic
    fake featurizer for those payloads."""
    if payload[:4] == WAV_MAGIC and payload[8:12] == b"WAVE":
        return wav_features(payload)
    if not payload.startswith(PNG_MAGIC):
        raise NotImplementedError(
            "only the PNG and WAV codecs are available in this"
            " environment; _fake_decode stands in for other modalities"
        )
    width, height, channels, px = png_decode(payload)
    n = width * height
    means = [0.0, 0.0, 0.0]
    for c in range(channels):
        means[c] = sum(px[c::channels]) / n
    return [
        float(width),
        float(height),
        float(channels),
        means[0],
        means[1],
        means[2],
        float(min(px)),
        float(max(px)),
    ]


PNG_W = 16
PNG_H = 16


def synthesize_png_payloads(
    df: DataFrame,
    id_col: str = "doc_id",
    width: int = PNG_W,
    height: int = PNG_H,
) -> DataFrame:
    """Deterministic RGB PNG per row — the fixture-image source for the
    real-decode path (q119), since the test tables carry no media: channel
    value at flat index k is ``(id*7 + k) % 256`` (closed form, so an SQL
    oracle can state the decoded statistics without a PNG codec), and the
    scanline filter cycles y % 5, forcing the decoder through every
    reconstruction rule (None/Sub/Up/Average/Paeth) on every image. In
    production this stage is a storage read; only the payload origin is
    synthetic — everything downstream (zlib inflate, unfiltering, pixel
    math) is the real path."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        n = width * height * 3
        ks = np.arange(n, dtype=np.int64)  # once per task, reused per batch
        for pdf in batches:
            ids = pdf[id_col].astype("int64")
            contents = [
                png_encode(
                    # closed-form pixel rule vectorized: identical bytes to
                    # the per-k Python loop (int64 mod 256 → uint8)
                    ((int(did) * 7 + ks) % 256).astype(np.uint8).tobytes(),
                    width,
                    height,
                    3,
                )
                for did in ids
            ]
            yield pd.DataFrame({id_col: ids, "content": contents})

    from binwatch_spark.tables import spread

    # spread: the synthesis + downstream decode are per-row Python kernels;
    # a single-row-group fixture scan would run them as ONE task (r13
    # profile). Shuffles only the id column.
    return spread(df.select(id_col), id_col).mapInPandas(
        gen, schema=f"{id_col} bigint, content binary"
    )


def synthesize_wav_payloads(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic mono PCM WAV per row — the fixture-audio source for
    the real-decode path (q125), same policy as synthesize_png_payloads:
    sample k is ``((id*31 + k*7) % 4096) - 2048`` (closed form, so an SQL
    oracle can state the decoded statistics without an audio codec). In
    production this stage is a storage read; only the payload origin is
    synthetic — the RIFF walk, PCM unpack, and feature math are the real
    path."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        ks7 = np.arange(WAV_N, dtype=np.int64) * 7
        for pdf in batches:
            ids = pdf[id_col].astype("int64")
            contents = [
                wav_encode(
                    # closed-form sample rule vectorized: same ints as the
                    # per-k loop (int64 mod then shift; range fits int16)
                    (((int(did) * 31 + ks7) % 4096) - 2048).tolist()
                )
                for did in ids
            ]
            yield pd.DataFrame({id_col: ids, "content": contents})

    from binwatch_spark.tables import spread

    return spread(df.select(id_col), id_col).mapInPandas(
        gen, schema=f"{id_col} bigint, content binary"
    )


WAV_MAGIC = b"RIFF"
WAV_RATE = 8000  # fixture sample rate (Hz)
WAV_N = 256  # samples per fixture clip (power of two → exact double means)


def wav_encode(
    samples: list[int], rate: int = WAV_RATE, channels: int = 1
) -> bytes:
    """Minimal 16-bit PCM WAV encoder (RIFF + fmt + data); ``samples`` is
    the interleaved frame stream for ``channels`` > 1. Exists for
    fixture/audio synthesis — the decode direction is the production
    path."""
    data = b"".join(struct.pack("<h", s) for s in samples)
    fmt = struct.pack(
        "<HHIIHH", 1, channels, rate, rate * 2 * channels, 2 * channels, 16
    )
    return (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )


def wav_decode(payload: bytes) -> tuple[int, int, list[int]]:
    """Pure-stdlib WAV decode → (n_channels, sample_rate, samples).

    Supports PCM 16-bit (the normalized ingest format — exotic encodings
    are transcoded once at ingest, same policy as png_decode), any channel
    count (samples interleaved), chunk-walked per RIFF so extra chunks
    (LIST/INFO) are skipped. Truncated or non-PCM payloads raise
    ValueError."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    pos, channels, rate, bits, data = 12, None, None, None, None
    while pos + 8 <= len(payload):
        tag = payload[pos : pos + 4]
        (size,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        body = payload[pos + 8 : pos + 8 + size]
        if len(body) != size:
            raise ValueError("truncated WAV chunk")
        if tag == b"fmt ":
            if size < 16:
                raise ValueError("truncated fmt chunk")
            audio_fmt, channels, rate, _, _, bits = struct.unpack(
                "<HHIIHH", body[:16]
            )
            if audio_fmt != 1 or bits != 16:
                raise ValueError(
                    "unsupported WAV variant: only PCM 16-bit is decoded"
                )
        elif tag == b"data":
            data = body
        pos += 8 + size + (size & 1)  # RIFF chunks are word-aligned
    if channels is None or data is None:
        raise ValueError("WAV missing fmt or data chunk")
    if len(data) % 2:
        raise ValueError("odd PCM data length")
    samples = list(
        struct.unpack(f"<{len(data) // 2}h", data)
    )
    return channels, rate, samples


def wav_features(payload: bytes) -> list[float]:
    """Audio feature vector in the shared 8-slot layout: [n_frames,
    sample_rate, n_channels, mean, mean_abs, zero_crossings, min, max].
    Integer sums over a power-of-two count keep the doubles exact, so an
    SQL oracle can state the decoded statistics from the closed-form
    sample rule without any audio codec.

    Multi-channel WAVs are de-interleaved: slot 0 counts FRAMES (samples
    per channel), zero-crossings are counted within each channel across
    consecutive frames and summed — never across the channel boundary of
    the interleaved stream (a L/R sign flip inside one frame is not a
    crossing). mean/mean_abs/min/max pool all channels, identical to the
    interleaved computation. For mono every slot matches the old
    definition."""
    channels, rate, samples = wav_decode(payload)
    n = len(samples)
    if n == 0:
        raise ValueError("empty WAV data")
    if n % channels:
        raise ValueError("PCM data not a whole number of frames")
    frames = n // channels
    crossings = sum(
        1
        for ch in range(channels)
        for i in range(1, frames)
        if (samples[(i - 1) * channels + ch] < 0)
        != (samples[i * channels + ch] < 0)
    )
    return [
        float(frames),
        float(rate),
        float(channels),
        sum(samples) / n,
        sum(abs(s) for s in samples) / n,
        float(crossings),
        float(min(samples)),
        float(max(samples)),
    ]


def _decode_or_fake(payload: bytes) -> list[float]:
    """Real bytes→pixels when the payload is a decodable image, the
    deterministic fake featurizer otherwise — one decode rule for every
    query on this stage (q32/q75/q76 run text stand-ins → fake; q119 runs
    real PNGs → real).

    A corrupt PNG-magic payload (truncated chunk, bad CRC, bad IDAT,
    zero-dimension IHDR) also falls back: one bad image in a 100 TB crawl
    must not kill the whole decode stage — the fake features still carry
    the payload digest so the row stays attributable downstream."""
    try:
        return real_decode(payload)
    except (
        NotImplementedError,
        ValueError,
        zlib.error,
        struct.error,
        ZeroDivisionError,
        IndexError,
    ):
        return _fake_decode(payload)


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
                    "feature": payloads.map(
                        lambda b: _decode_or_fake(bytes(b))
                    ),
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


RESIZE_FACTOR = 4  # 16x16 fixture -> 4x4 thumbnails


def box_downsample(
    px: bytes, width: int, height: int, channels: int, factor: int
) -> tuple[int, int, bytes]:
    """Integer box-filter downsample of an interleaved 8-bit pixel buffer:
    each output pixel is the FLOOR of the mean of its factor×factor input
    block, per channel — all-integer arithmetic, so an SQL oracle can
    state every output pixel from the closed-form input rule (q132).
    Dimensions must divide evenly (the ingest normalizer pads/crops
    upstream; partial-edge pooling would make the oracle rule ragged)."""
    if width % factor or height % factor:
        raise ValueError("box_downsample needs factor-aligned dimensions")
    nw, nh = width // factor, height // factor
    out = bytearray(nw * nh * channels)
    area = factor * factor
    for oy in range(nh):
        for ox in range(nw):
            for c in range(channels):
                s = 0
                for dy in range(factor):
                    row = (oy * factor + dy) * width * channels
                    col0 = ox * factor * channels + c
                    for dx in range(factor):
                        s += px[row + col0 + dx * channels]
                out[(oy * nw + ox) * channels + c] = s // area
    return nw, nh, bytes(out)


RESIZE_FEATURES_SCHEMA = (
    "doc_id bigint, width bigint, height bigint, "
    "mean_r double, mean_g double, mean_b double, "
    "min_px bigint, max_px bigint"
)


def resize_box_features(
    df: DataFrame, id_col: str = "doc_id", factor: int = RESIZE_FACTOR
) -> DataFrame:
    """REAL bytes→pixels→resized-pixels stage (VERDICT r07 #6): decode each
    PNG payload (png_decode — the q119 path), box-downsample the pixel
    buffer by ``factor``, and emit per-channel means + min/max of the
    RESIZED image. One Arrow-batched mapInPandas pass; a GPU/SIMD resizer
    replaces only box_downsample — schema, batching, and decode routing
    stay as tested. Integer pixel sums over a power-of-two output count
    keep the means exact in doubles on both engines."""

    def batches_fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, content in zip(pdf[id_col], pdf["content"]):
                w, h, ch, px = png_decode(bytes(content))
                nw, nh, small = box_downsample(px, w, h, ch, factor)
                n = nw * nh
                means = [0.0, 0.0, 0.0]
                for c in range(ch):
                    means[c] = sum(small[c::ch]) / n
                rows.append(
                    (
                        int(did), nw, nh,
                        means[0], means[1], means[2],
                        min(small), max(small),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    id_col, "width", "height",
                    "mean_r", "mean_g", "mean_b", "min_px", "max_px",
                ],
            )

    return df.mapInPandas(batches_fn, schema=RESIZE_FEATURES_SCHEMA)


# Synthetic video container: "BWV1" magic + u32 frame count, then each
# frame as [u32 byte length][PNG bytes]. Length-prefixed frames are the
# minimal honest container shape — a real demuxer walks frame boundaries
# exactly like this before handing each frame to the image codec.
VIDEO_MAGIC = b"BWV1"
VID_FRAMES = 6
VID_STRIDE = 2  # sample every 2nd frame
VID_W = 8
VID_H = 8


def video_encode(frames: list[bytes]) -> bytes:
    out = bytearray(VIDEO_MAGIC)
    out += struct.pack(">I", len(frames))
    for f in frames:
        out += struct.pack(">I", len(f))
        out += f
    return bytes(out)


def video_decode_frames(payload: bytes) -> list[bytes]:
    """Walk the length-prefixed container → list of frame payloads (each a
    full PNG). Truncation or trailing garbage raises ValueError — a
    corrupt asset must surface at the demux step, not as a half-decoded
    frame downstream."""
    if payload[:4] != VIDEO_MAGIC:
        raise ValueError("not a BWV video payload")
    if len(payload) < 8:
        raise ValueError("truncated video header")
    (n,) = struct.unpack(">I", payload[4:8])
    pos, frames = 8, []
    for _ in range(n):
        if pos + 4 > len(payload):
            raise ValueError("truncated video frame table")
        (ln,) = struct.unpack(">I", payload[pos : pos + 4])
        body = payload[pos + 4 : pos + 4 + ln]
        if len(body) != ln:
            raise ValueError("truncated video frame")
        frames.append(body)
        pos += 4 + ln
    if pos != len(payload):
        raise ValueError("trailing bytes after last frame")
    return frames


def synthesize_video_payloads(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic {VID_FRAMES}-frame video per row: frame f is a
    {VID_W}×{VID_H} RGB PNG whose channel value at flat index k is
    ``(id*7 + f*13 + k) % 256`` (closed form — the q134 oracle states the
    decoded statistics of every SAMPLED frame without any codec); the
    scanline filter still cycles y % 5 per frame, so every frame decode
    exercises all five reconstruction rules."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        n = VID_W * VID_H * 3
        ks = np.arange(n, dtype=np.int64)
        for pdf in batches:
            ids = pdf[id_col].astype("int64")
            contents = [
                video_encode(
                    [
                        png_encode(
                            ((int(did) * 7 + f * 13 + ks) % 256)
                            .astype(np.uint8)
                            .tobytes(),
                            VID_W,
                            VID_H,
                            3,
                        )
                        for f in range(VID_FRAMES)
                    ]
                )
                for did in ids
            ]
            yield pd.DataFrame({id_col: ids, "content": contents})

    from binwatch_spark.tables import spread

    return spread(df.select(id_col), id_col).mapInPandas(
        gen, schema=f"{id_col} bigint, content binary"
    )


VIDEO_FRAME_SCHEMA = (
    "doc_id bigint, frame_idx bigint, width bigint, height bigint, "
    "mean_r double, mean_g double, mean_b double"
)


def video_frame_features(
    df: DataFrame, id_col: str = "doc_id", stride: int = VID_STRIDE
) -> DataFrame:
    """REAL bytes→frames→pixels: demux the length-prefixed container, keep
    every ``stride``-th frame (the ffmpeg `-vf select` shape — sample
    BEFORE decode, so skipped frames cost only the demux walk, the lever
    that matters when decode dominates), decode each sampled frame with
    the pure-stdlib PNG decoder, and emit per-frame channel means. A
    fan-out mapInPandas stage (rows out = sampled frames per doc)."""

    def batches_fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, content in zip(pdf[id_col], pdf["content"]):
                frames = video_decode_frames(bytes(content))
                for f in range(0, len(frames), stride):
                    w, h, ch, px = png_decode(frames[f])
                    n = w * h
                    means = [0.0, 0.0, 0.0]
                    for c in range(ch):
                        means[c] = sum(px[c::ch]) / n
                    rows.append(
                        (int(did), f, w, h, means[0], means[1], means[2])
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    id_col, "frame_idx", "width", "height",
                    "mean_r", "mean_g", "mean_b",
                ],
            )

    return df.mapInPandas(batches_fn, schema=VIDEO_FRAME_SCHEMA)
