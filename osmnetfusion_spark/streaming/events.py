"""Structured Streaming ingestion: windowed aggregation + stateful sessions.

The reference is strictly batch (SURVEY.md 2.8); this module covers the
streaming surface a continuously-crawled pages/events corpus needs:

- :func:`windowed_counts` -- watermarked tumbling-window aggregation, the
  streaming twin of the batch ``q_events_hourly`` contract query (same
  results on the same closed input via the available-now trigger).
- :func:`sessionize` -- custom stateful operator (session windows with a
  gap timeout) via ``applyInPandasWithState``.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType, LongType, StringType, StructField, StructType, TimestampType,
)

EVENT_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)


def read_event_stream(spark: SparkSession, source_dir: str) -> DataFrame:
    return (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 4)
        .parquet(source_dir)
    )


def windowed_counts(events: DataFrame, window: str = "1 hour", watermark: str = "2 hours") -> DataFrame:
    """Watermarked tumbling-window agg (late rows beyond the watermark drop)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 6).alias("sum_value"))
        .select(
            F.unix_timestamp("w.start").alias("window_start"),
            "event_type", "n", "sum_value",
        )
    )


def sessionize_native(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Session windows via the BUILT-IN ``session_window`` operator --
    Catalyst's native gap-based session aggregation (incremental state
    store in streaming, whole-stage-codegen'd in batch). Same session
    semantics as the custom :func:`sessionize`
    (applyInPandasWithState): a new session starts when the gap to the
    previous event exceeds ``gap``.

    Keep BOTH: the custom operator is the §2.8 'custom stateful
    operator' surface (and carries the reference-shaped integer-micros
    sums); this is the built-in path a Spark-first user should reach for
    first -- the equivalence test pins that they agree on session
    boundaries and counts.
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id", F.session_window("ts", gap).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.floor(F.col("value") * F.lit(1000000.0)).cast("long")).alias(
                "sum_value_micros"
            ),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "sum_value_micros",
        )
    )


SESSION_OUT = "user_id long, session_start timestamp, session_end timestamp, n_events long, sum_value double"
SESSION_STATE = "start long, end long, n long, sv double"


GAP_MS = 30 * 60 * 1000


def _session_fn(
    key, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """30-min-gap sessionization; a session flushes when the event-time
    watermark passes ``session_end + gap`` (event-time timeout — with a
    processing-time timeout an available-now drain would never terminate:
    pending timeouts keep scheduling empty micro-batches forever)."""
    (user_id,) = key

    def frame(rows):
        return pd.DataFrame(
            {
                "user_id": [user_id] * len(rows),
                "session_start": [pd.Timestamp(r[0], unit="ms") for r in rows],
                "session_end": [pd.Timestamp(r[1], unit="ms") for r in rows],
                "n_events": [r[2] for r in rows],
                "sum_value": [r[3] for r in rows],
            }
        )

    if state.hasTimedOut:
        row = state.get
        state.remove()
        yield frame([row])
        return
    start, end, n, sv = state.get if state.exists else (None, None, 0, 0.0)
    parts = [pdf[["ts", "value"]] for pdf in pdfs]
    closed = []
    if parts:
        batch = pd.concat(parts).sort_values("ts")
        ts_ms = (batch["ts"].astype("int64") // 1_000_000).to_numpy()
        vals = batch["value"].to_numpy()
        # gap-split the time-sorted events, continuing the open session from
        # state; sessions followed by a later in-batch event > gap away close
        # immediately, the trailing one stays open pending its timeout
        for t, v in zip(ts_ms, vals):
            t, v = int(t), float(v)
            if start is None:
                start, end, n, sv = t, t, 1, v
            elif t - end > GAP_MS:
                closed.append((start, end, n, sv))
                start, end, n, sv = t, t, 1, v
            else:
                end = max(end, t)
                n += 1
                sv += v
    if closed:
        yield frame(closed)
    if start is not None:
        state.update((start, end, n, sv))
        # flush once the watermark passes the session's gap deadline
        state.setTimeoutTimestamp(end + GAP_MS)


def sessionize(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Custom stateful operator: session windows via applyInPandasWithState."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _session_fn,
            outputStructType=SESSION_OUT,
            stateStructType=SESSION_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def dedupe_stream(
    events: DataFrame,
    keys: tuple[str, ...] = ("event_id",),
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming EXACT dedup: first occurrence per key wins, duplicates
    within the watermark horizon are dropped (ingestion-dedup shape for a
    Common-Crawl-style feed with at-least-once delivery).

    ``dropDuplicatesWithinWatermark`` keeps per-key state only until the
    watermark passes the key's first-seen event time -- bounded state,
    which is the whole point at 100 TB/day: an unwatermarked dedup would
    grow state forever, and a plain ``dropDuplicates([*keys, ts])`` would
    miss duplicates whose retransmission carries a different timestamp.
    Batch twin: ``df.dropDuplicates(keys)`` -- equivalence tested when
    every duplicate pair lands inside the horizon
    (test_checkpoint_streaming).
    """
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        list(keys)
    )


def run_available_now(stream_df: DataFrame, checkpoint_dir: str, query_name: str) -> list:
    """Drain a bounded stream into a memory sink; returns collected rows."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("complete" if query_name.endswith("_complete") else "append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return stream_df.sparkSession.sql(f"SELECT * FROM {query_name}").collect()
