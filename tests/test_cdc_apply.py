"""apply_cdc: replaying a change stream onto a snapshot. Edge semantics
pinned on a hand-built example — latest-change-wins ordering, upsert of new
keys, delete of existing and unknown keys, pass-through of untouched rows,
and snapshot-only columns surviving an upsert.
"""

from __future__ import annotations

from binwatch_spark.operators.cdc import apply_cdc


def _apply(spark):
    snapshot = spark.createDataFrame(
        [(1, "ada", 10.0), (2, "grace", 20.0), (3, "mary", 30.0)],
        "k long, name string, bal double",
    )
    changes = spark.createDataFrame(
        [
            # k=1: UPDATE then a LATER update — only position 5 wins
            (1, "UPDATE", "f1", 3, 11.0),
            (1, "UPDATE", "f1", 5, 12.0),
            # k=2: deleted
            (2, "DELETE", "f1", 4, None),
            # k=4: brand new key
            (4, "INSERT", "f2", 1, 40.0),
            # k=9: DELETE of a key the snapshot never had — no-op
            (9, "DELETE", "f2", 2, None),
            # k=3 untouched
        ],
        "k long, operation string, binlog_file string, binlog_position long, bal double",
    )
    rows = apply_cdc(snapshot, changes, "k").collect()
    return {r["k"]: (r["name"], r["bal"]) for r in rows}


def test_apply_cdc_semantics(spark):
    got = _apply(spark)
    assert got == {
        1: ("ada", 12.0),  # later position wins, snapshot-only name kept
        3: ("mary", 30.0),  # untouched pass-through
        4: (None, 40.0),  # new key: snapshot-only columns NULL
    }
    assert 2 not in got  # deleted
    assert 9 not in got  # delete of unknown key is a no-op


def test_apply_cdc_delete_then_reinsert(spark):
    snapshot = spark.createDataFrame([(1, 1.0)], "k long, bal double")
    changes = spark.createDataFrame(
        [
            (1, "DELETE", "f1", 1, None),
            (1, "INSERT", "f1", 2, 5.0),  # later than the delete → row lives
        ],
        "k long, operation string, binlog_file string, binlog_position long, bal double",
    )
    rows = apply_cdc(snapshot, changes, "k").collect()
    assert [(r["k"], r["bal"]) for r in rows] == [(1, 5.0)]


def test_scd2_history_intervals(spark):
    from binwatch_spark.operators.cdc import scd2_history

    changes = spark.createDataFrame(
        [
            (1, "INSERT", 10, 100, 1.0),
            (1, "UPDATE", 20, 101, 2.0),
            (1, "DELETE", 30, 102, None),
            (2, "INSERT", 15, 103, 9.0),
        ],
        "k long, operation string, t long, eid long, bal double",
    )
    rows = scd2_history(changes, "k", "t", tiebreak_cols=("eid",)).collect()
    got = {
        (r["k"], r["eid"]): (r["valid_from"], r["valid_to"], r["is_current"], r["bal"])
        for r in rows
    }
    assert got == {
        # v1 closed by the update at t=20
        (1, 100): (10, 20, False, 1.0),
        # v2 closed by the DELETE at t=30 — the delete emits no version
        (1, 101): (20, 30, False, 2.0),
        # key 2 never changed again → open interval, current
        (2, 103): (15, None, True, 9.0),
    }


def test_apply_cdc_streaming_foreachbatch(spark, tmp_path):
    """The full loop the reference exists for, closed inside the engine:
    binlog-shaped replay stream → envelope transform → foreachBatch
    applying each micro-batch onto a served snapshot table with apply_cdc.
    Two micro-batches (maxFilesPerTrigger=1) prove incremental application:
    batch 2's UPDATE/DELETE land on batch 1's result, not on the seed."""
    import json
    import os
    import shutil

    from pyspark.sql import functions as F

    from binwatch_spark.sources.envelope import read_envelope_stream

    tmp = str(tmp_path)
    replay = f"{tmp}/replay"
    served = f"{tmp}/served"
    os.makedirs(replay, exist_ok=True)

    def write_batch(name, events):
        with open(f"{replay}/{name}", "w", encoding="utf-8") as fh:
            for pos, op, row in events:
                fh.write(
                    json.dumps(
                        {
                            "event_type": {"INSERT": "WriteRowsEventV2",
                                           "UPDATE": "UpdateRowsEventV2",
                                           "DELETE": "DeleteRowsEventV2"}[op],
                            "binlog_file": "mysql-bin.000001",
                            "binlog_position": pos,
                            "database": "testdb",
                            "table": "users",
                            "operation": op,
                            "rows": [row],
                        }
                    )
                    + "\n"
                )

    write_batch("b1.jsonl", [
        (100, "INSERT", {"id": "1", "bal": "10"}),
        (200, "INSERT", {"id": "2", "bal": "20"}),
    ])
    write_batch("b2.jsonl", [
        (300, "UPDATE", {"id": "1", "bal": "11"}),
        (400, "DELETE", {"id": "2", "bal": ""}),
        (500, "INSERT", {"id": "3", "bal": "30"}),
    ])

    # seed snapshot: one pre-existing row that no event touches
    spark.createDataFrame([(9, 90.0)], "k long, bal double").write.parquet(served)

    from binwatch_spark.operators.cdc import apply_cdc

    def apply_batch(batch_df, batch_id):
        changes = batch_df.select(
            F.col("rows")[0]["id"].cast("long").alias("k"),
            F.col("operation"),
            "binlog_file",
            "binlog_position",
            # try_cast: DELETE payloads carry no usable values (ANSI cast
            # of "" would kill the batch); NULLs never overwrite (coalesce
            # inside apply_cdc)
            F.col("rows")[0]["bal"].try_cast("double").alias("bal"),
        )
        snap = batch_df.sparkSession.read.parquet(served)
        merged = apply_cdc(snap, changes, "k")
        out = f"{served}.next"
        merged.write.mode("overwrite").parquet(out)
        shutil.rmtree(served)
        os.rename(out, served)

    stream = read_envelope_stream(spark, replay, max_files_per_trigger=1)
    q = (
        stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", f"{tmp}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    final = {
        r["k"]: r["bal"] for r in spark.read.parquet(served).collect()
    }
    assert final == {
        9: 90.0,   # untouched seed row survives both batches
        1: 11.0,   # batch-2 UPDATE applied on top of batch-1 INSERT
        3: 30.0,   # batch-2 INSERT
    }
    assert 2 not in final  # inserted in batch 1, deleted in batch 2
