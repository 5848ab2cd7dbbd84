"""YAML job-spec loader — the reference's config surface on dataclasses.

Mirrors api/v1alpha2/config.go:22-167 (same YAML keys), the ``${ENV:X}$``
pre-parse expansion (internal/utils/utils.go:28-39: unset vars are left
as-is, not errors) and the construction-time validation:

- non-empty server id, IP-parseable host, registered port 1024-49151
  (binwatch.go:62-76, utils.go:41-44)
- sharding: count > 0, index < count (blsenderwork.go:63-79)
- every route references a declared connector (blsenderwork.go:97-100)

Spark-specific extension: ``checkpoint_dir`` (the Structured Streaming
offset log replaces the reference's local-file/Redis cache backends —
cache.go:14-48; the local/redis settings are accepted and mapped onto it).
"""

from __future__ import annotations

import ipaddress
import os
import re
from dataclasses import dataclass, field

try:
    import yaml
except ImportError:  # pragma: no cover - pyyaml is available in this env
    yaml = None

_ENV_RE = re.compile(r"\$\{ENV:([A-Za-z_][A-Za-z0-9_]*)\}\$")

DML_OPERATIONS = ("INSERT", "UPDATE", "DELETE")


def expand_env(text: str) -> str:
    """``${ENV:NAME}$`` substitution; unset variables are left untouched
    (utils.go:32-36 semantics)."""

    def sub(m: re.Match[str]) -> str:
        value = os.environ.get(m.group(1))
        return value if value is not None else m.group(0)

    return _ENV_RE.sub(sub, text)


class ConfigError(ValueError):
    pass


@dataclass
class Location:
    file: str = ""
    position: int = 0
    # Executed-GTID set to resume AFTER (the modern MySQL resume token —
    # survives failover where file/pos cannot; sources/binlog.py GtidSet).
    # May ride alone or alongside file/pos as the untagged-event fallback.
    gtid_set: str = ""


@dataclass
class SourceConfig:
    flavor: str = "mysql"
    # Live-client backend: "" = python-mysql-replication (default),
    # "wire" = the repo's pure-stdlib wire-protocol client
    # (sources/binlog_wire.py, MySQL flavor only).
    driver: str = ""
    server_id: int = 100
    host: str = "127.0.0.1"
    port: int = 3306
    user: str = ""
    password: str = ""
    db_tables: dict[str, list[str]] = field(default_factory=dict)
    read_timeout: str = "90s"
    heartbeat_period: str = "60s"
    start_location: Location | None = None
    # Spark extension: replay a recorded envelope stream instead of a live
    # binlog (sources/envelope.py) — used by tests and dev.
    replay_dir: str = ""
    # Spark extension: the replay/raw capture carries POSITIONAL row maps
    # ({"0": v0, ...}) that must be bound to column names through the S3
    # schema probe (reference behavior: always — its wire rows are
    # positional; our live client already emits named maps, so this is
    # opt-in for raw captures). Binding includes the blreaderwork.go
    # arity gate: mismatched events are dropped and counted.
    positional_rows: bool = False
    # Reference-parity loss mode (blreaderwork.go:149-190): on a stream
    # error, skip ahead to the CURRENT master position instead of resuming
    # at the last good location — accepting loss of the in-between events
    # to escape a poison section, exactly the reference's
    # restartSyncerOnError reader behavior. Default False: the Spark
    # default resumes, preserving at-least-once over the committed range.
    skip_ahead_on_error: bool = False
    # Explicit "db.tbl" -> [column, ...] map. Empty with positional_rows
    # set → the pipeline runs the JDBC LIMIT-0 probe at startup
    # (discover_table_columns), exactly like the reference.
    columns: dict[str, list[str]] = field(default_factory=dict)
    # Spark extension: micro-batch admission control for the live source —
    # cap each trigger at this many binlog BYTES (positions are byte
    # offsets). The FIRST planned batch of a run is uncapped (Spark asks
    # for the latest offset before the reader has a start to cap against);
    # every later batch is bounded, so a backlog that builds WHILE the
    # stream runs drains as bounded, checkpointed steps. 0 = unbounded
    # (reference behavior: the Go service is a one-event-at-a-time loop
    # and needs no batching).
    max_bytes_per_batch: int = 0

    @property
    def allowlist(self) -> list[str]:
        return [f"{db}.{tbl}" for db, tables in self.db_tables.items() for tbl in tables]


@dataclass
class LoggerConfig:
    """``logger:`` section (config.go:23,54) — one key, ``level``, one of
    debug|info|warn|error. Unknown or empty values fall back to DEBUG,
    mirroring logger.go GetLevel's default branch."""

    level: str = ""

    _PY_LEVELS = {
        "debug": "DEBUG",
        "info": "INFO",
        "warn": "WARNING",
        "error": "ERROR",
    }
    _SPARK_LEVELS = {
        "debug": "DEBUG",
        "info": "INFO",
        "warn": "WARN",
        "error": "ERROR",
    }

    def py_level(self) -> str:
        """Python ``logging`` level name for this config."""
        return self._PY_LEVELS.get(self.level.lower(), "DEBUG")

    def spark_level(self) -> str:
        """``SparkContext.setLogLevel`` name for this config."""
        return self._SPARK_LEVELS.get(self.level.lower(), "DEBUG")


@dataclass
class ShardingConfig:
    enabled: bool = False
    count: int = 1
    index: int = 0
    key_template: str = ""


@dataclass
class WebhookConfig:
    url: str = ""
    method: str = "POST"
    headers: dict[str, str] = field(default_factory=dict)
    username: str = ""
    password: str = ""
    tls_skip_verify: bool = False


@dataclass
class PubsubConfig:
    project_id: str = ""
    topic_id: str = ""


@dataclass
class ConnectorConfig:
    name: str
    type: str  # webhook | google_pubsub | memory | file
    webhook: WebhookConfig = field(default_factory=WebhookConfig)
    pubsub: PubsubConfig = field(default_factory=PubsubConfig)
    # Spark extension for tests: file connector target
    path: str = ""


@dataclass
class RouteConfig:
    name: str
    connector: str
    operations: list[str] = field(default_factory=lambda: list(DML_OPERATIONS))
    db_table: str = ""  # empty = match all (documented divergence, SURVEY §7.3)
    template: str = ""  # JSON-shape template; empty = whole-item to_json
    # Opt-in: render sprig's random family (uuidv4, randAlpha, ...)
    # deterministically per item (seeded from the item identity) instead of
    # rejecting it at compile — replay-safe migration for reference
    # templates that use those functions (templates.compile_template).
    seeded_random: bool = False
    # Per-route replica server id for --per-route on a LIVE master: each
    # concurrent route is its own binlog dump connection and MySQL kills
    # the previous dump when a duplicate server id registers. 0 = derive
    # (source.serverID + 1 + route position — never serverID itself, so
    # derived ids can't collide with the shared single-query pipeline
    # reading the same config); set explicitly to pin.
    server_id: int = 0


@dataclass
class ServerConfig:
    id: str = ""
    host: str = "0.0.0.0"
    port: int = 8080
    stop_in_error: bool = False
    restart_syncer_on_error: bool = False
    sender_workers: int = 1
    pool_size: int = 20
    item_by_row: bool = False
    checkpoint_dir: str = ""


@dataclass
class JobConfig:
    server: ServerConfig
    source: SourceConfig
    sharding: ShardingConfig
    connectors: list[ConnectorConfig]
    routes: list[RouteConfig]
    logger: LoggerConfig = field(default_factory=LoggerConfig)

    def connector_by_name(self, name: str) -> ConnectorConfig:
        for conn in self.connectors:
            if conn.name == name:
                return conn
        raise KeyError(name)


def _validate(cfg: JobConfig) -> None:
    if not cfg.server.id:
        raise ConfigError("empty server id")
    try:
        ipaddress.ip_address(cfg.server.host)
    except ValueError:
        raise ConfigError("malformed server host, invalid ip form") from None
    if not 1024 <= cfg.server.port <= 49151:
        raise ConfigError(f"invalid '{cfg.server.port}' port number in server")
    if cfg.sharding.enabled:
        if cfg.sharding.count == 0:
            raise ConfigError("sharding enabled but 'sharding.count' is zero")
        if cfg.sharding.index >= cfg.sharding.count:
            raise ConfigError(
                f"sharding 'index' ({cfg.sharding.index}) must be lower than"
                f" 'count' ({cfg.sharding.count})"
            )
    names = {c.name for c in cfg.connectors}
    for route in cfg.routes:
        if route.connector not in names:
            raise ConfigError(
                f"error creating '{route.name}' route: no '{route.connector}'"
                " connector in connector list"
            )
        for op in route.operations:
            if op not in DML_OPERATIONS:
                raise ConfigError(
                    f"route '{route.name}': unknown operation {op!r}"
                )


def _parse_columns(raw: dict) -> dict[str, list[str]]:
    """source.columns must map "db.tbl" → a LIST of column names. A scalar
    (the easy YAML typo `columns: {t: id}`) would otherwise explode into
    characters via list("id") → ['i', 'd'] and bind garbage column names
    to every well-formed event with no error anywhere — reject it."""
    out: dict[str, list[str]] = {}
    for tbl, cols in raw.items():
        if isinstance(cols, str) or not isinstance(cols, (list, tuple)):
            raise ConfigError(
                f"source.columns[{tbl!r}] must be a list of column names,"
                f" got {type(cols).__name__}: {cols!r}"
            )
        out[tbl] = [str(c) for c in cols]
    return out


def parse(doc: dict) -> JobConfig:
    server_d = doc.get("server", {}) or {}
    logger_d = doc.get("logger", {}) or {}
    pool_d = server_d.get("pool", {}) or {}
    cache_d = server_d.get("cache", {}) or {}
    source_d = doc.get("source", {}) or {}
    sharding_d = doc.get("sharding", {}) or {}

    start = None
    if source_d.get("startLocation"):
        start = Location(
            file=source_d["startLocation"].get("file", ""),
            position=int(source_d["startLocation"].get("position", 0)),
            gtid_set=str(source_d["startLocation"].get("gtidSet", "") or ""),
        )

    connectors = []
    for c in doc.get("connectors", []) or []:
        webhook_d = c.get("webhook", {}) or {}
        creds = webhook_d.get("credentials", {}) or {}
        pubsub_d = c.get("pubsub", {}) or {}
        connectors.append(
            ConnectorConfig(
                name=c.get("name", ""),
                type=c.get("type", ""),
                webhook=WebhookConfig(
                    url=webhook_d.get("url", ""),
                    method=webhook_d.get("method", "POST"),
                    headers=dict(webhook_d.get("headers", {}) or {}),
                    username=creds.get("username", ""),
                    password=creds.get("password", ""),
                    tls_skip_verify=bool(webhook_d.get("tlsSkipVerify", False)),
                ),
                pubsub=PubsubConfig(
                    project_id=pubsub_d.get("projectID", ""),
                    topic_id=pubsub_d.get("topicID", ""),
                ),
                path=c.get("path", ""),
            )
        )

    routes = [
        RouteConfig(
            name=r.get("name", ""),
            connector=r.get("connector", ""),
            operations=list(r.get("operations", list(DML_OPERATIONS))),
            db_table=r.get("dbTable", ""),
            template=r.get("template", ""),
            seeded_random=bool(r.get("seededRandom", False)),
            server_id=int(r.get("serverID", 0)),
        )
        for r in doc.get("routes", []) or []
    ]

    cfg = JobConfig(
        server=ServerConfig(
            id=server_d.get("id", ""),
            host=server_d.get("host", "0.0.0.0"),
            port=int(server_d.get("port", 8080)),
            stop_in_error=bool(server_d.get("stopInError", False)),
            restart_syncer_on_error=bool(
                server_d.get("restartSyncerOnError", False)
            ),
            sender_workers=int(server_d.get("senderWorkers", 1)),
            pool_size=int(pool_d.get("size", 20)),
            item_by_row=bool(pool_d.get("itemByRow", False)),
            checkpoint_dir=(
                server_d.get("checkpointDir", "")
                or (cache_d.get("local", {}) or {}).get("path", "")
            ),
        ),
        source=SourceConfig(
            flavor=source_d.get("flavor", "mysql"),
            driver=str(source_d.get("driver", "") or ""),
            server_id=int(source_d.get("serverID", 100)),
            host=source_d.get("host", "127.0.0.1"),
            port=int(source_d.get("port", 3306)),
            user=source_d.get("user", ""),
            password=source_d.get("password", ""),
            db_tables={
                db: list(tables)
                for db, tables in (source_d.get("dbTables", {}) or {}).items()
            },
            read_timeout=str(source_d.get("readTimeout", "90s")),
            heartbeat_period=str(source_d.get("heartbeatPeriod", "60s")),
            start_location=start,
            replay_dir=source_d.get("replayDir", ""),
            positional_rows=bool(source_d.get("positionalRows", False)),
            skip_ahead_on_error=bool(
                source_d.get("skipAheadOnError", False)
            ),
            columns=_parse_columns(source_d.get("columns", {}) or {}),
            max_bytes_per_batch=int(source_d.get("maxBytesPerBatch", 0)),
        ),
        sharding=ShardingConfig(
            enabled=bool(sharding_d.get("enabled", False)),
            count=int(sharding_d.get("count", 1)),
            index=int(sharding_d.get("index", 0)),
            key_template=sharding_d.get("keyTemplate", ""),
        ),
        connectors=connectors,
        routes=routes,
        logger=LoggerConfig(level=str(logger_d.get("level", "") or "")),
    )
    _validate(cfg)
    return cfg


def load(path: str) -> JobConfig:
    if yaml is None:  # pragma: no cover
        raise ImportError("pyyaml is required for YAML config loading")
    with open(path, encoding="utf-8") as fh:
        text = expand_env(fh.read())
    return parse(yaml.safe_load(text) or {})
