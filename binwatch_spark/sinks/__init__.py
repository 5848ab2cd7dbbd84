"""Delivery connectors (K1/K2) and the foreachBatch sink stage."""

from binwatch_spark.sinks.connectors import (
    Connector,
    FileConnector,
    MemoryConnector,
    PubSubConnector,
    WebhookConnector,
    make_connector,
)

__all__ = [
    "Connector",
    "FileConnector",
    "MemoryConnector",
    "PubSubConnector",
    "WebhookConnector",
    "make_connector",
]
