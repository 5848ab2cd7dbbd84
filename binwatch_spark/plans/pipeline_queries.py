"""Training-data pipeline utility queries (q35 sessionize, q36 sampling)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from binwatch_spark.functions.texthash import polyhash, polyhash_sql
from binwatch_spark.operators.sessions import sessionize_batch
from binwatch_spark.plans.registry import register
from binwatch_spark.tables import load

SESSION_GAP_MINUTES = 30
SAMPLE_PCT = 10


@register(
    "q35_sessionize",
    oracle=f"""
WITH l AS (
  SELECT user_id, ts, event_id,
    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
  FROM events),
o AS (
  SELECT user_id, ts, event_id,
    CASE WHEN prev_ts IS NULL OR ts - prev_ts > INTERVAL {SESSION_GAP_MINUTES} MINUTE
         THEN 1 ELSE 0 END AS is_new
  FROM l),
s AS (
  SELECT user_id, ts,
    CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
         ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
  FROM o)
SELECT user_id, session_id, min(ts) AS session_start, max(ts) AS session_end,
       count(*) AS n_events
FROM s GROUP BY user_id, session_id
""",
)
def q35_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inactivity-gap sessionization (batch shape): lag + running sum over
    one shuffle on user_id. The streaming twin (operators.sessions.
    sessionize_stream) runs the same semantics with applyInPandasWithState
    and an event-time timeout."""
    ev = load(spark, sf_dir, "events").select("user_id", "ts", "event_id")
    return sessionize_batch(
        ev, "user_id", "ts", SESSION_GAP_MINUTES, tiebreak=["event_id"]
    )


@register(
    "q36_deterministic_sample",
    oracle=f"""
SELECT doc_id, lang, source FROM documents
WHERE {polyhash_sql("text")} % 100 < {SAMPLE_PCT}
""",
)
def q36_deterministic_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic content-hash sampling (~{SAMPLE_PCT}% of documents):
    reproducible across runs/engines because the predicate is a pure hash of
    the content, not an RNG — the sane way to sample a 100 TB corpus
    consistently across pipeline stages."""
    docs = load(spark, sf_dir, "documents")
    return docs.filter(polyhash(F.col("text")) % 100 < SAMPLE_PCT).select(
        "doc_id", "lang", "source"
    )


# Per-language keep rates (percent) for mixture construction: upsample the
# scarce languages, downsample the dominant one. Shared with the oracle.
STRATA_PCT = {"en": 5, "zh": 80, "es": 50, "de": 25}
STRATA_DEFAULT_PCT = 10


def _strata_case_sql() -> str:
    whens = " ".join(
        f"WHEN '{lang}' THEN {pct}" for lang, pct in sorted(STRATA_PCT.items())
    )
    return f"CASE lang {whens} ELSE {STRATA_DEFAULT_PCT} END"


@register(
    "q66_stratified_sample",
    oracle=f"""
SELECT doc_id, lang, source FROM documents
WHERE {polyhash_sql("text")} % 100 < {_strata_case_sql()}
""",
)
def q66_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified deterministic sampling for training-mixture construction:
    per-language keep rates applied through the same content-hash predicate
    as q36, so every stage of a 100 TB pipeline reproduces the exact same
    subset per stratum — map-side filter, no shuffle, no RNG state."""
    docs = load(spark, sf_dir, "documents")
    rate = None
    for lang, pct in sorted(STRATA_PCT.items()):
        cond = F.col("lang") == lang
        rate = F.when(cond, pct) if rate is None else rate.when(cond, pct)
    rate = rate.otherwise(F.lit(STRATA_DEFAULT_PCT))
    return docs.filter(polyhash(F.col("text")) % 100 < rate).select(
        "doc_id", "lang", "source"
    )
