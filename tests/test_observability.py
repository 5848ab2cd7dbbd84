"""O1 parity: /healthz and /api/v1/server over a live streaming query."""

from __future__ import annotations

import json
import socket
import urllib.request

from binwatch_spark.config import parse
from binwatch_spark.observability import ProgressListener, serve_api, server_info
from tests.test_streaming import EVENTS, make_cfg, write_replay


def free_port() -> int:
    # config.parse enforces the reference's registered-port range
    # (utils.go:41-44), so probe within 1024-49151 rather than letting the
    # OS hand back an ephemeral port above it.
    import random

    for _ in range(64):
        candidate = random.randint(20000, 49151)
        with socket.socket() as s:
            try:
                s.bind(("127.0.0.1", candidate))
            except OSError:
                continue
            return candidate
    raise RuntimeError("no free registered port found")


def test_healthz_and_server_info(spark, tmp_path):
    tmp = str(tmp_path)
    write_replay(f"{tmp}/replay", EVENTS)
    doc = make_cfg(tmp)
    doc["server"]["host"] = "127.0.0.1"
    doc["server"]["port"] = free_port()
    cfg = parse(doc)

    listener = ProgressListener()
    spark.streams.addListener(listener)
    httpd = serve_api(cfg, listener)
    try:
        from binwatch_spark.streaming.pipeline import run_pipeline

        query = run_pipeline(spark, cfg, available_now=True)
        query.awaitTermination(120)

        base = f"http://127.0.0.1:{cfg.server.port}"
        assert urllib.request.urlopen(f"{base}/healthz").read() == b"OK"
        info = json.loads(urllib.request.urlopen(f"{base}/api/v1/server").read())
        assert info["id"] == "it-test"
        assert info["port"] == cfg.server.port
        # serverapi.go:95-130 response shape
        assert set(info) == {"id", "host", "port", "poolSize"}
        assert listener.last_progress.get("numInputRows", 0) >= 0
    finally:
        httpd.shutdown()
        spark.streams.removeListener(listener)


def test_server_info_shape():
    cfg = parse(
        {
            "server": {"id": "x", "host": "0.0.0.0", "port": 9000},
            "connectors": [],
            "routes": [],
        }
    )
    assert server_info(cfg) == {
        "id": "x",
        "host": "0.0.0.0",
        "port": 9000,
        "poolSize": 0,
    }
