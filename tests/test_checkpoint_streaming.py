"""Checkpoint/resume + streaming operators."""

import json
import os

import pytest
from pyspark.sql import functions as F

from osmnetfusion_spark.checkpoint import Snapshotter
from osmnetfusion_spark.streaming import events as SE


def test_snapshot_resume(spark, tmp_path):
    wh = str(tmp_path / "wh")
    snap = Snapshotter(spark, wh, run_id="r1")
    calls = []

    def build():
        calls.append(1)
        return spark.range(0, 100).withColumn("k", F.col("id") % 7)

    df1 = snap.stage("s1", build, lineage_key="id")
    assert df1.count() == 100 and len(calls) == 1

    # resume: a fresh Snapshotter must not rebuild
    snap2 = Snapshotter(spark, wh, run_id="r2")
    df2 = snap2.stage("s1", build, lineage_key="id")
    assert df2.count() == 100 and len(calls) == 1  # not rebuilt

    # lineage + metrics logs exist and are well-formed
    with open(os.path.join(wh, "_lineage", "s1.json")) as f:
        lineage = json.load(f)
    assert sum(r["rows"] for r in lineage) == 100
    with open(os.path.join(wh, "_metrics.jsonl")) as f:
        recs = [json.loads(line) for line in f]
    assert any(r.get("resumed") for r in recs) and any(not r.get("resumed") for r in recs)


def test_windowed_counts_stream_matches_batch(spark, tmp_path):
    src = str(tmp_path / "events_src")
    ck = str(tmp_path / "ck1")
    batch = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    batch.write.parquet(src)

    stream = SE.read_event_stream(spark, src)
    out = SE.windowed_counts(stream)
    q = (
        out.writeStream.format("memory").queryName("wc_complete")
        .outputMode("complete").option("checkpointLocation", ck)
        .trigger(availableNow=True).start()
    )
    q.awaitTermination()
    got = {
        (r.window_start, r.event_type): (r.n, r.sum_value)
        for r in spark.sql("SELECT * FROM wc_complete").collect()
    }
    want = {
        (r.window_start, r.event_type): (r.n, r.sum_value)
        for r in (
            batch.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
            .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 6).alias("sum_value"))
            .select(F.unix_timestamp("w.start").alias("window_start"), "event_type", "n", "sum_value")
            .collect()
        )
    }
    assert got == want


def test_sessionize_stateful(spark, tmp_path):
    src = str(tmp_path / "events_src2")
    ck = str(tmp_path / "ck2")
    spark.read.parquet("/root/testdata/sf0.001/events.parquet").limit(200).write.parquet(src)
    stream = SE.read_event_stream(spark, src)
    sess = SE.sessionize(stream)
    q = (
        sess.writeStream.format("memory").queryName("sessions")
        .outputMode("append").option("checkpointLocation", ck)
        .trigger(availableNow=True).start()
    )
    q.awaitTermination()
    # sessions only flush on timeout; with availableNow the state may stay
    # buffered -- the operator itself must at least run without error and
    # the query must make progress
    assert q.lastProgress is not None
