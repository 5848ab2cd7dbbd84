"""Bucketed stateful-kernel layout (r14): sessionize_stream and scd2_stream
group on pmod(xxhash64(key), B) and hold every bucket member's state in
parallel arrays, so the per-group Arrow protocol cost amortizes across keys.
The emitted rows must be IDENTICAL for any B — B=1 forces every key through
one bucket (maximal multi-key interleaving plus the bucket-level timeout
sweep standing in for every per-key timeout), B=7 splits keys unevenly."""

from __future__ import annotations

import datetime as dt
import json
import os
import time


def _pin_mtimes(paths) -> None:
    # the file stream source orders files by mtime; same-second writes tie
    # and arrive in arbitrary order — pin strictly increasing stamps in
    # list order, exactly like _bounded_stream_core does
    base = time.time()
    for k, p in enumerate(paths):
        os.utime(p, (base + k, base + k))

import pytest
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from binwatch_spark.operators.sessions import sessionize_stream
from binwatch_spark.streaming.analytics import scd2_stream

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)

SESSION_EVENTS = [
    (1, T0),
    (1, T0 + dt.timedelta(minutes=10)),
    (1, T0 + dt.timedelta(minutes=55)),  # 45m gap -> new session
    (1, T0 + dt.timedelta(minutes=60)),
    (2, T0 + dt.timedelta(minutes=5)),
    (3, T0 + dt.timedelta(minutes=7)),
    (3, T0 + dt.timedelta(minutes=90)),  # 83m gap -> new session
]

SESSION_SCHEMA = StructType(
    [StructField("user_id", LongType()), StructField("ts", TimestampType())]
)

SESSION_EXPECTED = {
    (1, T0): (T0 + dt.timedelta(minutes=10), 2),
    (1, T0 + dt.timedelta(minutes=55)): (T0 + dt.timedelta(minutes=60), 2),
    (2, T0 + dt.timedelta(minutes=5)): (T0 + dt.timedelta(minutes=5), 1),
    (3, T0 + dt.timedelta(minutes=7)): (T0 + dt.timedelta(minutes=7), 1),
    (3, T0 + dt.timedelta(minutes=90)): (T0 + dt.timedelta(minutes=90), 1),
}


@pytest.mark.parametrize("buckets", [1, 7])
def test_sessionize_stream_bucket_invariance(spark, tmp_path, buckets):
    src = tmp_path / "events"
    src.mkdir()
    with open(src / "events.jsonl", "w", encoding="utf-8") as fh:
        for user, ts in SESSION_EVENTS:
            fh.write(json.dumps({"user_id": user, "ts": ts.isoformat()}) + "\n")
    # two sentinel files: the second's batch carries the first's timestamp
    # as watermark, flushing every real session's state
    for i, hours in ((1, 6), (2, 12)):
        with open(src / f"sentinel{i}.jsonl", "w", encoding="utf-8") as fh:
            fh.write(
                json.dumps(
                    {"user_id": -i, "ts": (T0 + dt.timedelta(hours=hours)).isoformat()}
                )
                + "\n"
            )
    _pin_mtimes(
        [src / "events.jsonl", src / "sentinel1.jsonl", src / "sentinel2.jsonl"]
    )

    stream = (
        spark.readStream.schema(SESSION_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
        .withWatermark("ts", "0 seconds")
    )
    sessions = sessionize_stream(stream, gap_minutes=30, state_buckets=buckets)
    q = (
        sessions.writeStream.format("parquet")
        .option("path", str(tmp_path / "sink"))
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)
    rows = spark.read.parquet(str(tmp_path / "sink")).collect()
    got = {
        (r["user_id"], r["session_start"]): (r["session_end"], r["n_events"])
        for r in rows
        if r["user_id"] > 0
    }
    assert got == SESSION_EXPECTED


SCD2_EVENTS = [
    (1, "a", T0, 1),
    (1, "a", T0 + dt.timedelta(minutes=1), 2),  # no-change fold
    (1, "b", T0 + dt.timedelta(minutes=2), 3),  # closes (1, a)
    (2, "x", T0 + dt.timedelta(minutes=1), 4),
    (2, "y", T0 + dt.timedelta(minutes=3), 5),  # closes (2, x)
    (2, "x", T0 + dt.timedelta(minutes=4), 6),  # closes (2, y)
    (3, "z", T0, 7),  # stays open, never emits
]

SCD2_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("ts", TimestampType()),
        StructField("event_id", LongType()),
    ]
)

SCD2_EXPECTED = {
    (1, "a", T0, T0 + dt.timedelta(minutes=2)),
    (2, "x", T0 + dt.timedelta(minutes=1), T0 + dt.timedelta(minutes=3)),
    (2, "y", T0 + dt.timedelta(minutes=3), T0 + dt.timedelta(minutes=4)),
}


@pytest.mark.parametrize("buckets", [1, 7])
def test_scd2_stream_bucket_invariance(spark, tmp_path, buckets):
    src = tmp_path / "events"
    src.mkdir()
    # two ts-ordered waves so a version opened in wave 0 closes in wave 1
    waves = [
        [e for e in SCD2_EVENTS if e[2] <= T0 + dt.timedelta(minutes=1)],
        [e for e in SCD2_EVENTS if e[2] > T0 + dt.timedelta(minutes=1)],
    ]
    for k, wave in enumerate(waves):
        with open(src / f"wave{k}.jsonl", "w", encoding="utf-8") as fh:
            for uid, et, ts, eid in wave:
                fh.write(
                    json.dumps(
                        {
                            "user_id": uid,
                            "event_type": et,
                            "ts": ts.isoformat(),
                            "event_id": eid,
                        }
                    )
                    + "\n"
                )
    _pin_mtimes([src / "wave0.jsonl", src / "wave1.jsonl"])

    stream = (
        spark.readStream.schema(SCD2_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    out = scd2_stream(stream, state_buckets=buckets)
    q = (
        out.writeStream.format("parquet")
        .option("path", str(tmp_path / "sink"))
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)
    rows = spark.read.parquet(str(tmp_path / "sink")).collect()
    got = {
        (r["user_id"], r["event_type"], r["valid_from"], r["valid_to"])
        for r in rows
    }
    assert got == SCD2_EXPECTED
