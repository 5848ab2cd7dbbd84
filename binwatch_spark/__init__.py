"""binwatch_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of freepik-company/binwatch, rebuilt Spark-first.

The reference (read-only at /root/reference) is a Go CDC pipeline that tails a
MySQL binlog, filters/projects/shards row-change events, renders them through
templates and delivers them to connectors (SURVEY.md §2.1). This package
re-expresses that dataflow — plus the derived relational / LLM-data-pipeline
capability layer (SURVEY.md §2.4) — as idiomatic Spark:

- ``session``    — tuned SparkSession builder (AQE, Arrow, shuffle sizing)
- ``tables``     — fixture/table loader with column-pruned parquet scans
- ``operators``  — reusable DataFrame→DataFrame transforms (CDC envelope ops,
                   sharding, dedup, text analysis, similarity)
- ``plans``      — the declared query inventory: every query registered with a
                   DuckDB oracle twin for hash-match verification
- ``sources``    — streaming sources (binlog-envelope file stream; MySQL
                   binlog DataSource gated behind optional deps)
- ``sinks``      — webhook / pub-sub foreachBatch writers (connector registry)
- ``streaming``  — the end-to-end CDC pipeline builder (config → queries)

Design rule: DataFrame/SQL built-ins first so Catalyst can push filters into
the parquet scan, prune columns, broadcast small dimensions and re-plan with
AQE; Pandas UDFs only where JVM expressions cannot express the semantics
(e.g. FNV-1a64 sharding parity, Go hash/fnv — SURVEY.md §4.2).
"""

__version__ = "0.1.0"
