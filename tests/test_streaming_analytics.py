"""Streaming twins of the windowed-agg and dedup batch queries: same
expressions, plus watermark state policy (binwatch_spark/streaming/analytics).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from binwatch_spark.streaming.analytics import dedup_stream, windowed_counts

SCHEMA = "event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING"
RAW_SCHEMA = "event_id LONG, ts STRING, user_id LONG, event_type STRING"

ROWS = [
    # (event_id, ts, user_id, event_type)
    (1, "2026-01-01 10:05:00", 7, "click"),
    (2, "2026-01-01 10:20:00", 7, "view"),
    (3, "2026-01-01 11:10:00", 8, "click"),
    (4, "2026-01-01 11:40:00", 7, "click"),
    (5, "2026-01-01 12:01:00", 8, "error"),
    # duplicate delivery of event 3 (at-least-once replay inside horizon)
    (3, "2026-01-01 11:10:00", 8, "click"),
]

SENTINEL = [(99, "2026-01-02 10:00:00", 9, "view")]


def batch_df(spark):
    return spark.createDataFrame(list(ROWS), RAW_SCHEMA).withColumn(
        "ts", F.col("ts").cast("timestamp")
    )


def write_rows(dirpath: str, rows, filename: str) -> None:
    os.makedirs(dirpath, exist_ok=True)
    with open(os.path.join(dirpath, filename), "w", encoding="utf-8") as fh:
        for eid, ts, uid, et in rows:
            fh.write(
                json.dumps(
                    {"event_id": eid, "ts": ts, "user_id": uid, "event_type": et}
                )
                + "\n"
            )


def stream(spark, tmp: str):
    return spark.readStream.schema(SCHEMA).json(f"{tmp}/in")


def run_to_parquet(df, tmp: str, name: str):
    query = (
        df.writeStream.format("parquet")
        .option("path", f"{tmp}/out-{name}")
        .option("checkpointLocation", f"{tmp}/ckpt-{name}")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination(120)


def read_out(spark, tmp: str, name: str):
    try:
        return spark.read.parquet(f"{tmp}/out-{name}")
    except Exception:
        return None


def test_windowed_counts_stream_matches_batch(spark, tmp_path):
    """Append mode emits a window only once the watermark passes its end:
    the first availableNow run (watermark starts at 0, advances to 10:01
    only after its single batch) emits nothing; the next run restores the
    checkpointed watermark, ingests a sentinel past the horizon, and its
    closing no-data batch flushes all three closed windows."""
    tmp = str(tmp_path)
    write_rows(f"{tmp}/in", ROWS, "b1.jsonl")
    run_to_parquet(windowed_counts(stream(spark, tmp), window="1 hour"), tmp, "wc")
    assert read_out(spark, tmp, "wc") is None or read_out(spark, tmp, "wc").count() == 0

    write_rows(f"{tmp}/in", SENTINEL, "b2.jsonl")
    run_to_parquet(windowed_counts(stream(spark, tmp), window="1 hour"), tmp, "wc")
    got = {
        (str(r["win_start"]), r["n_events"])
        for r in read_out(spark, tmp, "wc").collect()
    }
    want = {
        (str(r["win_start"]), r["n_events"])
        for r in windowed_counts(batch_df(spark), window="1 hour").collect()
    }
    assert got == want  # sentinel's own window is still open in the stream
    assert len(got) == 3  # 10:00 →2, 11:00 →3 (incl. replay dup), 12:00 →1


def test_dedup_stream_collapses_replay(spark, tmp_path):
    tmp = str(tmp_path)
    write_rows(f"{tmp}/in", ROWS, "b1.jsonl")
    run_to_parquet(dedup_stream(stream(spark, tmp), keys=["event_id"]), tmp, "dd")
    ids = sorted(r["event_id"] for r in read_out(spark, tmp, "dd").collect())
    assert ids == [1, 2, 3, 4, 5]  # duplicate event 3 collapsed


def test_dedup_batch_twin(spark):
    assert dedup_stream(batch_df(spark), keys=["event_id"]).count() == 5


ORDER_ROWS = [
    # (order_id, ots, user_id) — orders placed shortly before some events
    (101, "2026-01-01 09:50:00", 7),   # 15 min before event 1 → match
    (102, "2026-01-01 11:00:00", 8),   # 10 min before event 3 → match
    (103, "2026-01-01 08:00:00", 7),   # >1h before everything → no match
    (104, "2026-01-01 12:30:00", 8),   # after every event → no match
]


def _write_orders(tmp: str):
    os.makedirs(f"{tmp}/orders", exist_ok=True)
    with open(f"{tmp}/orders/o1.jsonl", "w", encoding="utf-8") as fh:
        for oid, ots, uid in ORDER_ROWS:
            fh.write(
                json.dumps({"order_id": oid, "ots": ots, "user_id": uid}) + "\n"
            )


def test_interval_join_stream_matches_batch(spark, tmp_path):
    """Stream-stream interval join (events ↔ orders within the last hour):
    the streaming result with watermarks on both sides must equal the batch
    join of the same inputs (the q49 range-join predicate shape)."""
    from binwatch_spark.streaming.analytics import interval_join

    tmp = str(tmp_path)
    write_rows(f"{tmp}/in", ROWS, "b1.jsonl")
    _write_orders(tmp)

    orders_schema = "order_id LONG, ots TIMESTAMP, user_id LONG"
    ev_s = stream(spark, tmp)
    ord_s = spark.readStream.schema(orders_schema).json(f"{tmp}/orders")
    joined = interval_join(
        ev_s, ord_s, "user_id", "ts", "ots", lookback="1 hour", watermark="4 hours"
    ).select("event_id", "order_id", "user_id")
    run_to_parquet(joined, tmp, "ij")
    got = sorted(
        (r["event_id"], r["order_id"]) for r in read_out(spark, tmp, "ij").collect()
    )

    ev_b = batch_df(spark)
    ord_b = spark.createDataFrame(
        [(oid, ots, uid) for oid, ots, uid in ORDER_ROWS],
        "order_id LONG, ots STRING, user_id LONG",
    ).withColumn("ots", F.col("ots").cast("timestamp"))
    want = sorted(
        (r["event_id"], r["order_id"])
        for r in interval_join(
            ev_b, ord_b, "user_id", "ts", "ots", lookback="1 hour"
        ).collect()
    )
    assert got == want
    # sanity on the expected pairs themselves (incl. the duplicate event 3
    # delivery joining twice — dedup upstream is dedup_stream's job)
    assert (1, 101) in got and (3, 102) in got
    assert all(o != 103 and o != 104 for _, o in got)


def test_q138_budget_state_carries_across_microbatches(spark):
    """The budget quota must span micro-batch boundaries: at least one
    source admits documents in more than one doc_id tercile (the staged
    batch ranges), proving the per-source running total persisted in the
    state store rather than resetting per batch."""
    from binwatch_spark.plans.pipeline_queries import (
        STREAM_BUDGET,
        q138_stream_budget_fill,
    )
    from tests.conftest import SF_SMALL

    rows = q138_stream_budget_fill(spark, SF_SMALL).collect()
    assert rows
    max_id = max(r["doc_id"] for r in rows)
    tercile = {r["doc_id"]: r["doc_id"] * 3 // (max_id + 1) for r in rows}
    by_source: dict[str, set[int]] = {}
    for r in rows:
        by_source.setdefault(r["source"], set()).add(tercile[r["doc_id"]])
        # every admitted row satisfies the shared crossing rule
        assert r["cum_tokens"] - r["n_tokens"] < STREAM_BUDGET
    assert any(len(t) > 1 for t in by_source.values())


def test_q141_scd2_versions_close_across_microbatches(spark):
    """A version opened in one ts-tercile batch must close in a LATER one
    for at least one user — the cross-batch state carry streaming SCD2
    exists for — and every interval is well-formed."""
    from binwatch_spark.plans.pipeline_queries import q141_scd2_stream
    from tests.conftest import SF_SMALL

    rows = q141_scd2_stream(spark, SF_SMALL).collect()
    assert rows
    all_ts = sorted(
        {r["valid_from"] for r in rows} | {r["valid_to"] for r in rows}
    )
    c1 = all_ts[len(all_ts) // 3]
    crossers = [
        r for r in rows if r["valid_from"] <= c1 and r["valid_to"] > c1
    ]
    assert crossers, "no version spans a batch boundary"
    for r in rows:
        assert r["valid_from"] < r["valid_to"]


def test_interval_join_outer_evicts_across_batches(spark):
    """LEFT OUTER stream-stream interval join (q146's operator form): an
    unmatched click emits null-padded only when a LATER batch's watermark
    evicts it — including clicks from the final real wave, whose eviction
    watermark arrives only with the sentinel batches. Also pins the
    filter-placement hazard: the reserved-id filter must run on the batch
    read-back, because inside the streaming query Catalyst pushes the
    null-preserving predicate below the left watermark node and the
    sentinels stop advancing it (the final wave's non-matches then never
    emit — observed before the fix)."""
    import datetime as dt

    from binwatch_spark.plans.pipeline_queries import _run_bounded_stream
    from binwatch_spark.streaming.analytics import interval_join

    t0 = dt.datetime(2024, 1, 1)

    def mk(rows):
        return spark.createDataFrame(
            [
                (eid, u, t0 + dt.timedelta(minutes=m), t)
                for eid, u, m, t in rows
            ],
            "event_id long, user_id long, ts timestamp, event_type string",
        )

    stages = [
        # wave 0: unmatched click (user 1), purchase for user 2
        ("b0", mk([(1, 1, 0, "click"), (2, 2, 55, "purchase")])),
        # wave 1: click matching wave-0's purchase (cross-batch MATCH),
        # plus another unmatched user-1 click
        ("b1", mk([(3, 2, 60, "click"), (4, 1, 90, "click")])),
        # wave 2 (final real wave): unmatched click whose eviction
        # watermark can only come from the sentinel tail
        ("b2", mk([(5, 3, 300, "click")])),
        # each sentinel carries BOTH leg types (distinct reserved
        # users, so they never match each other): the global watermark
        # is the min across the two legs' watermark nodes
        ("sentinel1", mk([(-1, -1, 60000, "click"),
                          (-11, -2, 60000, "purchase")])),
        ("sentinel2", mk([(-2, -1, 120000, "click"),
                          (-12, -2, 120000, "purchase")])),
    ]

    def build(s):
        clicks = s.filter(F.col("event_type") == "click").select(
            "event_id", "user_id", "ts"
        )
        buys = s.filter(F.col("event_type") == "purchase").select(
            F.col("event_id").alias("r_event_id"),
            "user_id",
            F.col("ts").alias("rts"),
        )
        return interval_join(
            clicks, buys, "user_id", "ts", "rts",
            lookback="1 hour", watermark="2 hours", how="left_outer",
        ).select(
            F.col("event_id").alias("l_event_id"), "r_event_id", "user_id"
        )

    out = _run_bounded_stream(spark, "t_oj_", stages, build)
    got = sorted(
        (r["l_event_id"], r["r_event_id"])
        for r in out.filter(F.col("l_event_id") >= 0).collect()
    )
    # click 3 matched cross-batch; clicks 1, 4, 5 null-padded — 5 is the
    # final-wave row that only the sentinel watermark can flush
    assert got == [(1, None), (3, 2), (4, None), (5, None)]
    # every left row's own key survives the outer join non-null (the
    # drop-right-key regression: unmatched rows carried NULL user_id)
    assert out.filter(F.col("user_id").isNull()).count() == 0


def test_interval_join_outer_batch_twin(spark):
    """how='left_outer' on batch inputs equals the plain left join —
    the q49-shaped LEFT JOIN the q146 oracle states."""
    from binwatch_spark.streaming.analytics import interval_join

    ev = batch_df(spark)
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    views = ev.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("r_event_id"),
        "user_id",
        F.col("ts").alias("rts"),
    )
    got = sorted(
        (r["event_id"], r["r_event_id"])
        for r in interval_join(
            clicks, views, "user_id", "ts", "rts",
            lookback="1 hour", how="left_outer",
        ).collect()
    )
    # click 4 (11:40, user 7) sees view 2 (10:20)? no — 80 min gap > 1h;
    # clicks 1 (10:05) precedes view 2 → unmatched; duplicate click 3
    # rows both unmatched (user 8 has no views)
    assert got == [(1, None), (3, None), (3, None), (4, None)]
