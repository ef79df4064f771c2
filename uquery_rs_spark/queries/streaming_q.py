"""Structured Streaming corpus entries.

Finite file source + availableNow trigger makes each stream drain to a
deterministic result, so the tumbling-window stream hash-matches the same
DuckDB SQL as its batch twin. The stateful operator is non-SQL-expressible
(driver records rows-only, per the contract).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..streaming.jobs import (
    run_dedup_stream,
    run_interval_join_stream,
    run_rollup_stream,
    run_sliding_stream,
    run_stateful_user_counter,
    run_tumbling_stream,
)
from .registry import register


@register(
    "streaming_tumbling_window",
    tags=("streaming", "window-agg"),
    oracle="""
SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS window_start,
       event_type,
       count(*)             AS n_events,
       round(sum(value), 2) AS total_value
FROM events
GROUP BY 1, 2
ORDER BY 1, 2
""",
)
def streaming_tumbling_window(spark: SparkSession, sf: str) -> DataFrame:
    """readStream → watermark → windowed agg → memory sink, drained; equals
    the batch tumbling aggregation on finite input (hash-checked)."""
    return run_tumbling_stream(spark, sf)


@register(
    "streaming_stateful_counter",
    tags=("streaming", "stateful"),
    oracle="""
SELECT user_id, count(*) AS n_events, round(sum(value), 2) AS total_value
FROM events
GROUP BY user_id
ORDER BY user_id
""",
)
def streaming_stateful_counter(spark: SparkSession, sf: str) -> DataFrame:
    """Per-user running totals via applyInPandasWithState (update mode).

    Falsifiable despite being a custom stateful op: on a finite drained
    source the FINAL state per user must equal the batch group-by — the
    oracle checks exactly that (count + 2-decimal-rounded value sum per
    user). Lost state, double-counted microbatches, or a wrong final-row
    selection all flip the hash."""
    return run_stateful_user_counter(spark, sf)


@register(
    "streaming_dedup",
    tags=("streaming", "dedup"),
    oracle="""
SELECT event_type, count(*) AS n_unique_keys
FROM (SELECT DISTINCT user_id, event_type, date_trunc('minute', ts) AS m
      FROM events)
GROUP BY event_type
ORDER BY event_type
""",
)
def streaming_dedup(spark: SparkSession, sf: str) -> DataFrame:
    """Streaming ingestion dedup (streaming/jobs.py::run_dedup_stream):
    dropDuplicates on (user, event_type, event-minute) as rows stream in,
    appended survivors counted per type — equals batch DISTINCT on the
    drained finite source, which the oracle checks. The watermark-bounded
    state variant (dropDuplicatesWithinWatermark) is the at-scale flip,
    asserted equal on this workload in tests."""
    return run_dedup_stream(spark, sf)


@register(
    "streaming_rollup_parquet",
    tags=("streaming", "rollup"),
    oracle="""
SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
       event_type,
       count(*)             AS n_events,
       round(sum(value), 2) AS total_value
FROM events
GROUP BY 1, 2
ORDER BY 1, 2
""",
)
def streaming_rollup_parquet(spark: SparkSession, sf: str) -> DataFrame:
    """Continuous aggregate materialized to a serving table
    (streaming/jobs.py::run_rollup_stream — the hypertable-rollup
    pattern): streaming daily aggregation written to parquet partitioned
    by event_type via foreachBatch (complete-mode overwrite = idempotent
    per epoch, the exactly-once recipe for non-transactional sinks),
    then read BACK from the rollup files — so the oracle verifies the
    whole write-then-serve round trip equals the batch aggregate."""
    return run_rollup_stream(spark, sf)


@register(
    "streaming_interval_join",
    tags=("streaming", "join"),
    oracle="""
SELECT v.user_id,
       v.event_id AS view_id,
       p.event_id AS purchase_id,
       round(epoch(p.ts - v.ts) / 60.0, 2) AS mins_to_purchase
FROM events v JOIN events p
  ON v.user_id = p.user_id
 AND v.event_type = 'view' AND p.event_type = 'purchase'
 AND p.ts > v.ts AND p.ts <= v.ts + INTERVAL 1 HOUR
ORDER BY v.user_id, view_id, purchase_id
""",
)
def streaming_interval_join(spark: SparkSession, sf: str) -> DataFrame:
    """Stream-stream interval join (streaming/jobs.py::
    run_interval_join_stream): purchases attributed to the same user's
    views within the preceding hour, both sides watermarked so join
    state expires — the ad-attribution shape and the canonical
    two-unbounded-sources join. Inner-join emission is match-driven, so
    the drained finite stream hash-matches the batch interval join the
    oracle runs."""
    from .registry import load_tables

    load_tables(spark, sf)
    return run_interval_join_stream(spark, sf)


@register(
    "streaming_sliding_window",
    tags=("streaming", "window-agg"),
    oracle="""
WITH slid AS (
  SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP)                   AS ws, * FROM events
  UNION ALL
  SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) - INTERVAL 1 HOUR AS ws, * FROM events
)
SELECT ws AS window_start, count(*) AS n_events, round(sum(value), 2) AS total_value
FROM slid
GROUP BY ws
ORDER BY ws
""",
)
def streaming_sliding_window(spark: SparkSession, sf: str) -> DataFrame:
    """Sliding windows computed by Structured Streaming (readStream over
    the events parquet, watermark + overlapping F.window, drained with
    availableNow) — on a finite source, complete mode equals the batch
    sliding_window_events query, which is what the oracle checks."""
    return run_sliding_stream(spark, sf)


@register(
    "streaming_enrich_join",
    tags=("streaming", "join"),
    oracle="""
SELECT coalesce(c_mktsegment, 'UNKNOWN') AS segment,
       count(*)             AS n_events,
       round(sum(value), 2) AS total_value
FROM events LEFT JOIN customer ON user_id = c_custkey
GROUP BY 1
ORDER BY 1
""",
)
def streaming_enrich_join(spark: SparkSession, sf: str) -> DataFrame:
    """Stream-static enrichment join (streaming/jobs.py::
    run_enrich_join_stream): unbounded events probe a BROADCAST static
    dimension per microbatch — no stream-side shuffle before the final
    segment aggregate, the standard enrichment topology. On the finite
    drained source the result must equal the batch left join + group-by
    — the oracle checks exactly that (left join keeps every event:
    dropped or duplicated events flip the count)."""
    from ..streaming.jobs import run_enrich_join_stream

    return run_enrich_join_stream(spark, sf)
