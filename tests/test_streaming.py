"""End-to-end CDC pipeline tests: replay stream → transforms → routes →
file connectors, with checkpoint-restart (at-least-once) and sharding
partition behavior — the integration layer the reference lacks (SURVEY §5.2.3).
"""

from __future__ import annotations

import json
import os

import pytest

from binwatch_spark.config import parse
from binwatch_spark.streaming.pipeline import run_pipeline

EVENTS = [
    # (file, pos, db, table, op, rows)
    ("mysql-bin.000001", 100, "testdb", "users", "INSERT", [{"id": "1", "name": "ada"}]),
    ("mysql-bin.000001", 200, "testdb", "users", "UPDATE", [{"id": "1", "name": "ada l."}]),
    ("mysql-bin.000001", 300, "testdb", "skipme", "INSERT", [{"id": "9"}]),
    ("mysql-bin.000002", 50, "testdb", "users", "DELETE", [{"id": "1"}]),
    ("mysql-bin.000002", 80, "testdb", "users", "INSERT", [{"id": "2", "name": "gra"}]),
]

EVENT_TYPE = {
    "INSERT": "WriteRowsEventV2",
    "UPDATE": "UpdateRowsEventV2",
    "DELETE": "DeleteRowsEventV2",
}


def write_replay(dirpath: str, events, filename: str = "batch1.jsonl") -> None:
    os.makedirs(dirpath, exist_ok=True)
    with open(os.path.join(dirpath, filename), "w", encoding="utf-8") as fh:
        for file, pos, db, tbl, op, rows in events:
            fh.write(
                json.dumps(
                    {
                        "event_type": EVENT_TYPE[op],
                        "binlog_file": file,
                        "binlog_position": pos,
                        "database": db,
                        "table": tbl,
                        "operation": op,
                        "rows": rows,
                    }
                )
                + "\n"
            )


def make_cfg(tmp: str, sharding: dict | None = None) -> dict:
    return {
        "server": {
            "id": "it-test",
            "host": "0.0.0.0",
            "port": 8080,
            "senderWorkers": 1,
            "checkpointDir": f"{tmp}/checkpoint",
        },
        "source": {
            "dbTables": {"testdb": ["users"]},
            "replayDir": f"{tmp}/replay",
        },
        "sharding": sharding or {},
        "connectors": [
            {"name": "sink-insert", "type": "file", "path": f"{tmp}/out/inserts.jsonl"},
            {"name": "sink-all", "type": "file", "path": f"{tmp}/out/all.jsonl"},
        ],
        "routes": [
            {
                "name": "inserts-only",
                "connector": "sink-insert",
                "operations": ["INSERT"],
                "dbTable": "testdb.users",
                "template": (
                    '{"itemID":"{{ .ItemID }}","op":"{{ .Data.Operation }}",'
                    '"rows":{{ .Data.Rows | toJson }}}'
                ),
            },
            {
                "name": "all-ops",
                "connector": "sink-all",
                "operations": ["INSERT", "UPDATE", "DELETE"],
                "dbTable": "",
            },
        ],
    }


def read_lines(path: str) -> list[str]:
    if not os.path.exists(path):
        return []
    with open(path, encoding="utf-8") as fh:
        return [ln for ln in fh.read().splitlines() if ln]


def run_until_done(spark, cfg_doc):
    cfg = parse(cfg_doc)
    query = run_pipeline(spark, cfg, available_now=True)
    query.awaitTermination(120)
    assert not query.isActive


def test_pipeline_end_to_end(spark, tmp_path):
    tmp = str(tmp_path)
    write_replay(f"{tmp}/replay", EVENTS)
    run_until_done(spark, make_cfg(tmp))

    inserts = read_lines(f"{tmp}/out/inserts.jsonl")
    all_ops = read_lines(f"{tmp}/out/all.jsonl")

    # route predicate: INSERTs on testdb.users only (allowlist drops skipme)
    assert len(inserts) == 2
    payloads = [json.loads(p) for p in inserts]
    assert {p["op"] for p in payloads} == {"INSERT"}
    assert payloads[0]["rows"] == [{"id": "1", "name": "ada"}]
    # template rendered item ids follow binlog order (1-based, gapless)
    assert [p["itemID"] for p in payloads] == ["1", "4"]

    # match-all route sees all allowlisted ops, in binlog order
    assert len(all_ops) == 4
    ops = [json.loads(p)["Data"]["Operation"] for p in all_ops]
    assert ops == ["INSERT", "UPDATE", "DELETE", "INSERT"]


def test_checkpoint_restart_no_redelivery(spark, tmp_path):
    tmp = str(tmp_path)
    write_replay(f"{tmp}/replay", EVENTS)
    cfg = make_cfg(tmp)
    run_until_done(spark, cfg)
    n_first = len(read_lines(f"{tmp}/out/all.jsonl"))

    # restart with the same checkpoint: nothing new to process
    run_until_done(spark, cfg)
    assert len(read_lines(f"{tmp}/out/all.jsonl")) == n_first

    # new data arrives → only the new events are delivered
    write_replay(
        f"{tmp}/replay",
        [("mysql-bin.000002", 120, "testdb", "users", "INSERT", [{"id": "3"}])],
        filename="batch2.jsonl",
    )
    run_until_done(spark, cfg)
    lines = read_lines(f"{tmp}/out/all.jsonl")
    assert len(lines) == n_first + 1
    assert json.loads(lines[-1])["Data"]["Rows"] == [{"id": "3"}]


def test_sharding_partitions_events(spark, tmp_path):
    tmp = str(tmp_path)
    write_replay(f"{tmp}/replay", EVENTS)
    seen: list[str] = []
    for index in (0, 1):
        shard_tmp = f"{tmp}/shard{index}"
        os.makedirs(shard_tmp, exist_ok=True)
        doc = make_cfg(tmp, sharding={"enabled": True, "count": 2, "index": index})
        doc["server"]["checkpointDir"] = f"{shard_tmp}/checkpoint"
        doc["connectors"] = [
            {"name": "sink-insert", "type": "file", "path": f"{shard_tmp}/inserts.jsonl"},
            {"name": "sink-all", "type": "file", "path": f"{shard_tmp}/all.jsonl"},
        ]
        run_until_done(spark, doc)
        seen.extend(read_lines(f"{shard_tmp}/all.jsonl"))
    # totality + disjointness across the two shards (blsenderwork_test.go:53-83)
    keys = sorted(
        (json.loads(p)["Log"]["BinlogFile"], json.loads(p)["Log"]["BinlogPosition"])
        for p in seen
    )
    expected = sorted(
        (f, pos) for f, pos, db, tbl, _, _ in EVENTS if tbl == "users"
    )
    assert keys == expected


def test_binlog_datasource_replay(spark, tmp_path):
    """The Spark 4 Python DataSource path: offsets, partitions, commit."""
    tmp = str(tmp_path)
    write_replay(f"{tmp}/replay", EVENTS)
    from binwatch_spark.sources import binlog

    binlog.register(spark)
    stream = (
        spark.readStream.format("mysql-binlog")
        .option("replayDir", f"{tmp}/replay")
        .load()
    )
    query = (
        stream.writeStream.format("parquet")
        .option("path", f"{tmp}/sink")
        .option("checkpointLocation", f"{tmp}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination(120)
    out = spark.read.parquet(f"{tmp}/sink")
    rows = sorted(
        (r["binlog_file"], r["binlog_position"], r["operation"])
        for r in out.collect()
    )
    assert rows == sorted((f, p, op) for f, p, _, _, op, _ in EVENTS)
