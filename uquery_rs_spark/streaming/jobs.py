"""Streaming jobs over the events table (file source → memory sink).

Each job reads the events parquet as a *stream* (readStream), applies a
watermarked transformation, and drains it synchronously with
processAllAvailable() so batch tests and the driver's oracle check can
treat the result as a DataFrame. On a real cluster the same code points at
a directory Kafka/object-store writers append to; the watermark bounds
state so the job survives unbounded input.
"""

from __future__ import annotations

import uuid

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def streaming_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events parquet as an unbounded stream (ns→us conversion included)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    path = f"{sf_dir}/events.parquet"
    stream = (
        spark.readStream.schema(spark.read.parquet(path).schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    # nanos→micros as in load_tables, but to TIMESTAMP (ltz): watermarks
    # require event time in TIMESTAMP, not NTZ. Session tz is UTC so the
    # wall-clock values are identical; outputs cast back to NTZ.
    if dict(stream.dtypes)["ts"] == "bigint":
        stream = stream.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif dict(stream.dtypes)["ts"] == "timestamp_ntz":
        stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    return stream


def _drain(result: DataFrame, name: str, mode: str = "complete") -> DataFrame:
    """Run a streaming DF to completion into an in-memory table."""
    q = (
        result.writeStream.outputMode(mode)
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    q.awaitTermination(30)
    return result.sparkSession.sql(f"SELECT * FROM {name}")


def run_tumbling_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked tumbling-window aggregation, drained to completion.

    With a finite file source and complete output mode the result equals
    the batch tumbling_window_events query — which is exactly what the
    oracle check verifies.
    """
    ev = streaming_events(spark, sf_dir)
    name = f"tumbling_{uuid.uuid4().hex[:8]}"
    agg = (
        ev.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(F.col("w.start").cast("timestamp_ntz").alias("window_start"), "event_type", "n_events", "total_value")
    )
    return _drain(agg, name).orderBy("window_start", "event_type")


def run_sessionized_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """session_window (30 min gap) streaming aggregation per user."""
    ev = streaming_events(spark, sf_dir)
    name = f"sessions_{uuid.uuid4().hex[:8]}"
    agg = (
        ev.withWatermark("ts", "1 hour")
        .groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select("user_id", F.col("w.start").cast("timestamp_ntz").alias("session_start"), "n_events")
    )
    return _drain(agg, name).orderBy("user_id", "session_start")


_COUNTER_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)
_STATE_SCHEMA = T.StructType(
    [T.StructField("n", T.LongType()), T.StructField("v", T.DoubleType())]
)


def run_stateful_user_counter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful streaming operator via applyInPandasWithState:
    a per-user running (count, value-sum) that persists across microbatches.

    Scale: state lives in the state store partitioned by user_id; each
    microbatch touches only the groups present in that batch.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key, pdfs, state: GroupState):
        n, v = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            v += float(pdf["value"].sum())
        state.update((n, v))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [round(v, 2)]}
        )

    ev = streaming_events(spark, sf_dir)
    name = f"counter_{uuid.uuid4().hex[:8]}"
    out = ev.groupBy("user_id").applyInPandasWithState(
        update, _COUNTER_SCHEMA, _STATE_SCHEMA, "update", GroupStateTimeout.NoTimeout
    )
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    q.awaitTermination(30)
    # last emitted row per user = final state
    latest = spark.sql(f"SELECT * FROM {name}")
    from pyspark.sql import Window as W

    w = W.partitionBy("user_id").orderBy(F.col("n_events").desc())
    return (
        latest.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
        .orderBy("user_id")
    )


def run_dedup_stream(
    spark: SparkSession, sf_dir: str, within_watermark: str | None = None
) -> DataFrame:
    """Streaming ingestion dedup: drop duplicate (user, event_type,
    event-minute) keys as they stream in, then count surviving keys per
    event type.

    Default is the EXACT variant (streaming ``dropDuplicates``, key state
    never evicted): on a finite drained source it equals batch DISTINCT,
    which the oracle checks row-for-row. At unbounded ingestion scale
    pass ``within_watermark`` (e.g. "2 hours") to use
    ``dropDuplicatesWithinWatermark`` instead — state is evicted past the
    watermark horizon, the right trade when duplicates arrive close
    together in event time (the ingestion-retry reality);
    tests assert both variants agree on this workload.
    """
    ev = streaming_events(spark, sf_dir)
    name = f"dedup_{uuid.uuid4().hex[:8]}"
    keys = ev.select(
        "user_id", "event_type", F.date_trunc("minute", "ts").alias("minute")
    )
    if within_watermark is not None:
        deduped = keys.withWatermark("minute", within_watermark).dropDuplicatesWithinWatermark(
            ["user_id", "event_type", "minute"]
        )
    else:
        deduped = keys.dropDuplicates(["user_id", "event_type", "minute"])
    drained = _drain(deduped, name, mode="append")
    return (
        drained.groupBy("event_type")
        .agg(F.count("*").alias("n_unique_keys"))
        .orderBy("event_type")
    )


def run_sliding_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window (2h size / 1h slide) streaming aggregation: each
    event contributes to two windows; the watermark bounds how long a
    window's partial aggregate stays in the state store."""
    ev = streaming_events(spark, sf_dir)
    name = f"sliding_{uuid.uuid4().hex[:8]}"
    agg = (
        ev.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "2 hours", "1 hour").alias("w"))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.col("w.start").cast("timestamp_ntz").alias("window_start"),
            "n_events",
            "total_value",
        )
    )
    return _drain(agg, name).orderBy("window_start")


def run_interval_join_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAM-STREAM interval join: attribute each purchase to the same
    user's views in the preceding hour — the canonical two-unbounded-
    sources join (ad-attribution shape). Both sides carry watermarks and
    the join condition bounds event-time distance, so Spark can expire
    buffered state: without the time bound a stream-stream join must
    retain both streams forever. Inner-join emission is match-driven, so
    on a drained finite source the result equals the batch interval join
    — which is exactly what the oracle runs.

    Columns: user_id, view_id, purchase_id, mins_to_purchase.
    """
    views = (
        streaming_events(spark, sf_dir)
        .filter(F.col("event_type") == "view")
        .select(
            F.col("user_id").alias("v_user"),
            F.col("event_id").alias("view_id"),
            F.col("ts").alias("view_ts"),
        )
        .withWatermark("view_ts", "1 hour")
    )
    purchases = (
        streaming_events(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", "2 hours")
    )
    joined = views.join(
        purchases,
        (F.col("v_user") == F.col("p_user"))
        & (F.col("purchase_ts") > F.col("view_ts"))
        & (F.col("purchase_ts") <= F.col("view_ts") + F.expr("INTERVAL 1 HOUR")),
        "inner",
    ).select(
        F.col("v_user").alias("user_id"),
        "view_id",
        "purchase_id",
        F.round(
            (
                F.col("purchase_ts").cast("double") - F.col("view_ts").cast("double")
            )
            / 60.0,
            2,
        ).alias("mins_to_purchase"),
    )
    out = _drain(joined, f"uq_ssjoin_{uuid.uuid4().hex[:8]}", mode="append")
    return out.orderBy("user_id", "view_id", "purchase_id")


def run_rollup_stream(
    spark: SparkSession, sf_dir: str, out_dir: str | None = None
) -> DataFrame:
    """Continuous aggregate (hypertable-rollup pattern): a streaming
    daily-window aggregation MATERIALIZED to parquet partitioned by
    event_type, then read back — the serving table downstream dashboards
    query instead of re-scanning raw events.

    foreachBatch + complete mode makes each microbatch overwrite the
    rollup with the full updated aggregate — idempotent per epoch, so a
    replayed batch cannot double-count (the exactly-once recipe for
    non-transactional sinks). On a finite drained source the final
    rollup equals the batch aggregate, which the oracle hash-checks;
    partitioning by event_type means rollup consumers filtering one
    type prune the rest at the scan.
    """
    import atexit
    import shutil
    import tempfile

    if out_dir is None:
        out_dir = tempfile.mkdtemp(prefix="uq_rollup_")
        atexit.register(shutil.rmtree, out_dir, ignore_errors=True)
    ev = streaming_events(spark, sf_dir)
    agg = (
        ev.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 day").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.col("w.start").cast("timestamp_ntz").alias("day"),
            "event_type",
            "n_events",
            "total_value",
        )
    )

    def write_batch(df: DataFrame, _epoch: int) -> None:
        df.write.mode("overwrite").partitionBy("event_type").parquet(out_dir)

    q = (
        agg.writeStream.outputMode("complete")
        .foreachBatch(write_batch)
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    q.awaitTermination(30)
    import glob
    import os

    if not glob.glob(os.path.join(out_dir, "**", "*.parquet"), recursive=True):
        # Zero microbatches (empty events source) → foreachBatch never
        # wrote; reading the dir would die on schema inference. Return an
        # explicit empty frame with the rollup schema instead.
        return spark.createDataFrame(
            [], "day timestamp_ntz, event_type string, n_events bigint, total_value double"
        )
    return (
        spark.read.parquet(out_dir)
        .select("day", "event_type", "n_events", "total_value")
        .orderBy("day", "event_type")
    )


def run_enrich_join_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-STATIC enrichment join: unbounded events joined to a static
    broadcast dimension (customer segment), then aggregated per segment.

    The canonical streaming-enrichment shape: the static side is read
    once, broadcast to every task, and each microbatch probes it with no
    state and no stream-side shuffle before the aggregation — at any
    stream rate the join itself is embarrassingly parallel and the only
    stateful operator is the final windowless aggregate (bounded by
    segment cardinality). Left join keeps events with no matching
    dimension row (UNKNOWN segment) — the enrichment must never drop
    events.
    """
    stream = streaming_events(spark, sf_dir)
    cust = (
        spark.read.parquet(f"{sf_dir}/customer.parquet")
        .select("c_custkey", "c_mktsegment")
    )
    enriched = (
        stream.withWatermark("ts", "1 hour")
        .join(F.broadcast(cust), stream["user_id"] == cust["c_custkey"], "left")
        .groupBy(
            F.coalesce(F.col("c_mktsegment"), F.lit("UNKNOWN")).alias("segment")
        )
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )
    name = f"uq_enrich_{uuid.uuid4().hex[:8]}"
    return _drain(enriched, name).orderBy("segment")
