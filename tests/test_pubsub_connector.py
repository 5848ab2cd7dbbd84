"""PubSubConnector evidence (VERDICT r03 #9).

The container ships neither google-cloud-pubsub nor its emulator, so two
layers of evidence:

1. A fixture ``google.cloud.pubsub_v1`` module drives the connector's REAL
   code — publisher construction, topic path formatting, publish with
   block-on-result (connectors.pubsub.go:37-41 parity), and publish-failure
   propagation (the .result() call re-raising is exactly what "block on the
   publish result" buys).
2. ``test_pubsub_emulator_round_trip`` runs the same round trip against the
   public GCP Pub/Sub emulator whenever PUBSUB_EMULATOR_HOST is set AND the
   real client library imports — skipped (visibly) otherwise.
"""

from __future__ import annotations

import os
import sys
import types

import pytest

from binwatch_spark.config import ConnectorConfig, PubsubConfig


def _cfg() -> ConnectorConfig:
    return ConnectorConfig(
        name="ps",
        type="google_pubsub",
        pubsub=PubsubConfig(project_id="proj-1", topic_id="events"),
    )


class _FakeFuture:
    def __init__(self, exc=None):
        self._exc = exc
        self.resolved = False

    def result(self):
        self.resolved = True
        if self._exc:
            raise self._exc
        return "msg-id-1"


class _FakePublisher:
    def __init__(self):
        self.published: list[tuple[str, bytes]] = []
        self.fail_next: Exception | None = None

    def topic_path(self, project: str, topic: str) -> str:
        return f"projects/{project}/topics/{topic}"

    def publish(self, topic: str, data: bytes) -> _FakeFuture:
        fut = _FakeFuture(self.fail_next)
        self.published.append((topic, data))
        self.last_future = fut
        return fut


@pytest.fixture
def fake_pubsub(monkeypatch):
    publisher = _FakePublisher()
    pubsub_v1 = types.ModuleType("google.cloud.pubsub_v1")
    pubsub_v1.PublisherClient = lambda: publisher
    cloud = types.ModuleType("google.cloud")
    cloud.pubsub_v1 = pubsub_v1
    google = sys.modules.get("google") or types.ModuleType("google")
    monkeypatch.setitem(sys.modules, "google", google)
    monkeypatch.setitem(sys.modules, "google.cloud", cloud)
    monkeypatch.setitem(sys.modules, "google.cloud.pubsub_v1", pubsub_v1)
    yield publisher


def test_publish_blocks_on_result(fake_pubsub):
    from binwatch_spark.sinks.connectors import make_connector

    conn = make_connector(_cfg())
    conn.send(b'{"op":"INSERT"}')
    assert fake_pubsub.published == [
        ("projects/proj-1/topics/events", b'{"op":"INSERT"}')
    ]
    # connectors.pubsub.go:37-41 parity: send() returns only after the
    # publish future resolved
    assert fake_pubsub.last_future.resolved


def test_publish_failure_propagates(fake_pubsub):
    from binwatch_spark.sinks.connectors import make_connector

    conn = make_connector(_cfg())
    fake_pubsub.fail_next = RuntimeError("topic not found")
    with pytest.raises(RuntimeError, match="topic not found"):
        conn.send(b"x")
    # the failed payload was attempted exactly once (at-least-once retries
    # happen at the batch layer, not inside the connector)
    assert len(fake_pubsub.published) == 1


def test_pubsub_emulator_round_trip():
    """Runs only with a live emulator (PUBSUB_EMULATOR_HOST) + real client."""
    if not os.environ.get("PUBSUB_EMULATOR_HOST"):
        pytest.skip("no Pub/Sub emulator (set PUBSUB_EMULATOR_HOST)")
    pubsub_v1 = pytest.importorskip("google.cloud.pubsub_v1")

    from binwatch_spark.sinks.connectors import make_connector

    project, topic, sub = "proj-emu", "events-emu", "sub-emu"
    publisher = pubsub_v1.PublisherClient()
    subscriber = pubsub_v1.SubscriberClient()
    topic_path = publisher.topic_path(project, topic)
    sub_path = subscriber.subscription_path(project, sub)
    publisher.create_topic(name=topic_path)
    subscriber.create_subscription(name=sub_path, topic=topic_path)

    cfg = ConnectorConfig(
        name="ps-emu",
        type="google_pubsub",
        pubsub=PubsubConfig(project_id=project, topic_id=topic),
    )
    make_connector(cfg).send(b"round-trip-payload")

    resp = subscriber.pull(subscription=sub_path, max_messages=1, timeout=30)
    assert resp.received_messages[0].message.data == b"round-trip-payload"
