"""The CDC event envelope — one schema for batch and streaming.

Mirrors RowEventItemT / RowEventItemLogT / RowEventItemDataT
(internal/pools/pools.go:17-35): provenance (event type, binlog file,
position), routing fields (database, table, operation) and the row payload
as ARRAY<MAP<STRING,STRING>> — semi-structured until a table schema is bound,
exactly like the reference's ``[]map[string]any`` (pools.go:34). ``item_id``
is assigned by the pipeline, not the source, matching Prepare()
(pools.go:57-63).

``read_envelope_stream`` is the file-based replay source: JSONL envelope
files consumed with Structured Streaming — the dev/test stand-in for the
binlog source (SURVEY §7.1 step 6) that exercises the full route pipeline
without a MySQL server.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    ArrayType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
)

ENVELOPE_SCHEMA = StructType(
    [
        StructField("event_type", StringType()),      # raw binlog event name
        StructField("binlog_file", StringType()),     # offset part 1 (cache.go:19-22)
        StructField("binlog_position", LongType()),   # offset part 2
        StructField("database", StringType()),
        StructField("table", StringType()),
        StructField("operation", StringType()),       # INSERT|UPDATE|DELETE (utils.go:22-24)
        StructField("rows", ArrayType(MapType(StringType(), StringType()))),
    ]
)


def read_envelope_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """Streaming read of JSONL envelope files. ``maxFilesPerTrigger`` is the
    backpressure analog of the reference's bounded pool (pools.go:39-55)."""
    reader = spark.readStream.schema(ENVELOPE_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.json(path)


def read_envelope_batch(spark: SparkSession, path: str) -> DataFrame:
    """Batch read of the same files — one schema, two execution modes."""
    return spark.read.schema(ENVELOPE_SCHEMA).json(path)
