"""Structured Streaming counterparts of the batch windowed operators.

The reference's topologies are always-on Storm graphs with
processing-time sleep-loop windows (SURVEY §2.10 streaming notes:
tumbling only, no watermarks, at-most-once). Our engine is
batch-iterative by design, but the same logical plans run unchanged as
Structured Streaming jobs: ``readStream`` → identical window aggregates
→ ``writeStream``. This module exercises that path — upgrading the
reference's semantics to event-time windows + watermarks (late data
handled, exactly-once sinks via checkpoint), which Storm's
processing-time flusher threads could not express.

Batch/stream parity: ``streaming_rolling_counts`` produces exactly the
rows of ``trending.rolling_top_events``'s count stage when run over the
same files with the ``availableNow`` trigger (asserted in
tests/test_streaming.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from ..operators.trending import COUNT_WINDOW, EVENT_WINDOW

EVENTS_SCHEMA = (
    "event_id long, ts timestamp_ntz, user_id long, "
    "event_type string, value double, props string"
)


def read_events_stream(
    spark: SparkSession, path_glob: str, schema: str | StructType = EVENTS_SCHEMA
) -> DataFrame:
    """File-source stream over the events parquet directory — the
    micro-batch equivalent of the reference's RedisSpout ingress
    (spouts/RedisSpout.java:110-117), with replay the spout lacks
    (its ack/fail are empty — at-most-once; file source + checkpoint
    is exactly-once)."""
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(path_glob)
        # watermarks require TIMESTAMP (not NTZ); session tz is pinned UTC
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )


def windowed_event_counts(stream: DataFrame, watermark: str = "30 minutes") -> DataFrame:
    """Tumbling-window counts per event_type with an event-time
    watermark (late rows beyond 30 min dropped deterministically)."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", COUNT_WINDOW).alias("win"), "event_type")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            F.unix_millis(F.col("win")["start"].cast("timestamp")).alias(
                "window_start_ms"
            ),
            "event_type",
            "cnt",
        )
    )


def windowed_contributors(stream: DataFrame, watermark: str = "30 minutes") -> DataFrame:
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", EVENT_WINDOW).alias("win"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            # integer-cents sum, same as batch contributor_counts: exact
            # regardless of micro-batch / partial-aggregation order
            (
                F.sum(F.round(F.col("value") * 100).cast("long")).cast("double")
                / 100.0
            ).alias("value_sum"),
        )
        .select(
            F.unix_millis(F.col("win")["start"].cast("timestamp")).alias(
                "window_start_ms"
            ),
            "user_id",
            "n_events",
            "value_sum",
        )
    )


def windowed_domain_counts(
    stream: DataFrame, url_col: str = "url", watermark: str = "30 minutes"
) -> DataFrame:
    """Streaming twin of trending.domain_counts (MediaCounterBolt.java:
    71-82 per-domain rolling counters): tumbling windows over the URL
    host with an event-time watermark. The reference flushed these maps
    on a processing-time sleep loop; a window IS the group key here."""
    from ..functions.urls import url_host

    return (
        stream.withWatermark("ts", watermark)
        .groupBy(
            F.window("ts", COUNT_WINDOW).alias("win"),
            url_host(url_col).alias("domain"),
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            F.unix_millis(F.col("win")["start"].cast("timestamp")).alias(
                "window_start_ms"
            ),
            "domain",
            "cnt",
        )
    )


def run_to_memory_sink(
    df: DataFrame, query_name: str, checkpoint_dir: str
) -> None:
    """Drain the whole available input (availableNow trigger) into an
    in-memory table named ``query_name`` — the test/inspection sink.
    Complete output mode: each trigger emits the full updated result."""
    q = (
        df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("complete")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
