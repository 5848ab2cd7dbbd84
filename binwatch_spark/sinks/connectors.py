"""Delivery connectors — the reference's connector layer (K1/K2) for
foreachBatch sinks.

Registry/factory mirrors internal/connectors/connectors.go:17-33 (unknown
type → error); the webhook connector mirrors connectors.webhook.go:47-76:
configurable method/URL/headers, optional basic auth, optional TLS
verification skip, non-2xx status → error. Pub/Sub mirrors
connectors.pubsub.go:31-42 (publish, block on result).

Two extra connector types exist for hermetic tests: ``memory`` (collects
payloads in-process) and ``file`` (appends one payload per line) — they play
the role of the reference's manual integration endpoint (README.md:216).

Network libraries are import-gated so the module is importable anywhere;
delivery semantics are at-least-once (checkpoint commits after the batch —
blsenderwork.go:193-213).
"""

from __future__ import annotations

import os
from abc import ABC, abstractmethod

from binwatch_spark.config import ConnectorConfig


class Connector(ABC):
    """``Send([]byte) → error`` analog (connectors.go:12-15)."""

    @abstractmethod
    def send(self, payload: bytes) -> None:
        """Deliver one rendered payload; raise on failure."""


class WebhookConnector(Connector):
    def __init__(self, cfg: ConnectorConfig):
        try:
            import requests
        except ImportError as exc:  # pragma: no cover
            raise ImportError(
                "webhook connector requires the 'requests' package"
            ) from exc
        self._requests = requests
        self._cfg = cfg.webhook

    def send(self, payload: bytes) -> None:
        kwargs: dict = {
            "headers": self._cfg.headers or None,
            "data": payload,
            "timeout": 30,
        }
        # connectors.webhook.go:59-61: basic auth only when BOTH creds are
        # set AND no explicit Authorization header wins (requests' auth=
        # would silently override one).
        has_auth_header = any(
            k.lower() == "authorization" for k in (self._cfg.headers or {})
        )
        if self._cfg.username and self._cfg.password and not has_auth_header:
            kwargs["auth"] = (self._cfg.username, self._cfg.password)
        if self._cfg.tls_skip_verify:
            kwargs["verify"] = False
        resp = self._requests.request(
            self._cfg.method or "POST", self._cfg.url, **kwargs
        )
        # connectors.webhook.go:71-73: any non-2xx is an error.
        if not 200 <= resp.status_code < 300:
            raise RuntimeError(
                f"unexpected status code {resp.status_code} sending data"
            )


class PubSubConnector(Connector):
    """Tested via a fixture pubsub_v1 module plus an emulator-gated round
    trip (tests/test_pubsub_connector.py)."""

    def __init__(self, cfg: ConnectorConfig):
        try:
            from google.cloud import pubsub_v1
        except ImportError as exc:
            raise ImportError(
                "google_pubsub connector requires 'google-cloud-pubsub'"
            ) from exc
        self._publisher = pubsub_v1.PublisherClient()
        self._topic = self._publisher.topic_path(
            cfg.pubsub.project_id, cfg.pubsub.topic_id
        )

    def send(self, payload: bytes) -> None:
        # connectors.pubsub.go:37-41: publish and block on the result.
        self._publisher.publish(self._topic, payload).result()


class MemoryConnector(Connector):
    """Collects payloads in-process (driver-side test double)."""

    store: dict[str, list[bytes]] = {}

    def __init__(self, cfg: ConnectorConfig):
        self._name = cfg.name
        self.store.setdefault(cfg.name, [])

    def send(self, payload: bytes) -> None:
        self.store[self._name].append(payload)


class FileConnector(Connector):
    """Appends one payload per line — works from executor processes."""

    def __init__(self, cfg: ConnectorConfig):
        self._path = cfg.path
        os.makedirs(os.path.dirname(cfg.path) or ".", exist_ok=True)

    def send(self, payload: bytes) -> None:
        with open(self._path, "ab") as fh:
            fh.write(payload.rstrip(b"\n") + b"\n")


_TYPES = {
    "webhook": WebhookConnector,
    "google_pubsub": PubSubConnector,
    "memory": MemoryConnector,
    "file": FileConnector,
}


def make_connector(cfg: ConnectorConfig) -> Connector:
    """Factory with connectors.go:17-33 semantics: unknown type → error."""
    try:
        ctor = _TYPES[cfg.type]
    except KeyError:
        raise ValueError(f"connector type '{cfg.type}' not supported") from None
    return ctor(cfg)
