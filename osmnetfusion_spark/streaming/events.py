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

import datetime as dt
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


SESSION_OUT = "user_id long, session_start timestamp, session_end timestamp, n_events long, sum_value double"
SESSION_STATE = "start long, end long, n long, sv double"


def _session_fn(
    key, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """30-min-gap sessionization; emits a session when the gap times out."""
    gap_ms = 30 * 60 * 1000
    (user_id,) = key
    if state.hasTimedOut:
        start, end, n, sv = state.get
        state.remove()
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "session_start": [pd.Timestamp(start, unit="ms")],
                "session_end": [pd.Timestamp(end, unit="ms")],
                "n_events": [n],
                "sum_value": [sv],
            }
        )
        return
    start, end, n, sv = state.get if state.exists else (None, None, 0, 0.0)
    for pdf in pdfs:
        ts_ms = (pdf["ts"].astype("int64") // 1_000_000).to_numpy()
        lo, hi = int(ts_ms.min()), int(ts_ms.max())
        start = lo if start is None else min(start, lo)
        end = hi if end is None else max(end, hi)
        n += len(pdf)
        sv += float(pdf["value"].sum())
    state.update((start, end, n, sv))
    state.setTimeoutDuration(gap_ms)
    return
    yield  # pragma: no cover


def sessionize(events: DataFrame) -> DataFrame:
    """Custom stateful operator: session windows via applyInPandasWithState."""
    return (
        events.withWatermark("ts", "2 hours")
        .groupBy("user_id")
        .applyInPandasWithState(
            _session_fn,
            outputStructType=SESSION_OUT,
            stateStructType=SESSION_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
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
