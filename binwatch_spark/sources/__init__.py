"""Streaming sources: the CDC envelope schema, a file-based replay source for
dev/tests, and the MySQL binlog DataSource (optional dependency)."""

from binwatch_spark.sources.envelope import ENVELOPE_SCHEMA, read_envelope_stream

__all__ = ["ENVELOPE_SCHEMA", "read_envelope_stream"]
