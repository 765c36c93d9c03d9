"""Plan-shape pins for the temporal/IVF/sampling operators: the scale
properties they promise (shuffle counts, join strategies, pushdown)
must be visible in the physical plan, not just asserted in docstrings."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from osmnetfusion_spark.operators import sampling, similarity, temporal


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def frames(spark):
    rng = np.random.default_rng(1)
    l = spark.createDataFrame(pd.DataFrame({
        "lid": np.arange(2000), "k": rng.integers(0, 8, 2000),
        "ts_us": rng.integers(0, 10_000, 2000),
    }))
    r = spark.createDataFrame(pd.DataFrame({
        "rid": np.arange(1000), "k": rng.integers(0, 8, 1000),
        "ts_us": rng.integers(0, 10_000, 1000), "v": rng.normal(size=1000),
    }))
    return l, r


def test_asof_join_single_shuffle(frames):
    """The as-of promise: ONE hash shuffle (the per-key window), no join
    node at all -- the build side arrives by union, not by join."""
    l, r = frames
    plan = _plan(temporal.asof_join(l, r, on="k", right_cols=["rid"], seq_col="rid"))
    assert plan.count("Exchange hashpartitioning") == 1, plan
    for bad in ("SortMergeJoin", "BroadcastHashJoin", "CartesianProduct",
                "BroadcastNestedLoopJoin"):
        assert bad not in plan, f"unexpected {bad} in asof plan"
    assert "Window" in plan


def test_range_join_is_equi_join_not_product(frames):
    """The interval join must plan as an equi-join on (keys, bucket) --
    never a nested-loop/cartesian product over the inequality."""
    l, r = frames
    iv = r.withColumn("start_us", F.col("ts_us")).withColumn(
        "end_us", F.col("ts_us") + 500
    )
    plan = _plan(temporal.range_interval_join(l, iv, on="k", bucket_width=100))
    assert ("BroadcastHashJoin" in plan) or ("SortMergeJoin" in plan), plan
    for bad in ("CartesianProduct", "BroadcastNestedLoopJoin"):
        assert bad not in plan, f"unexpected {bad} in range-join plan"


def test_ivf_corpus_assignment_is_shuffle_free(spark):
    """IVF's scale property: the corpus never shuffles for centroid
    assignment (it's a scan projection); the only hash exchange in the
    whole plan is the final per-query top-k window, and the probe side
    arrives by broadcast."""
    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    cents = e.filter(F.col("vec_id") < 8)
    q = e.filter((F.col("vec_id") >= 8) & (F.col("vec_id") < 12))
    plan = _plan(similarity.ivf_topk(e, q, cents, k=3, nprobe=2))
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "BroadcastHashJoin" in plan, plan


def test_sample_rate_is_pushed_scan_filter(spark):
    """sample_rate must stay a scan-side filter: no exchange, no
    aggregation -- the whole operator is one projected, filtered scan."""
    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = _plan(sampling.sample_rate(d, "doc_id", 0.25).select("doc_id"))
    assert "Exchange" not in plan, plan
    assert "Filter" in plan


def test_line_dedup_removal_has_no_forced_broadcast(spark):
    """line_dedup's scale property: the offending-lines set is
    data-dependent and unbounded (it grows with site count at small
    max_df), so the LEFT ANTI join must carry NO forced broadcast hint
    -- AQE picks broadcast vs shuffle from the runtime size. The pin:
    LeftAnti present, zero ResolvedHint/broadcast hints in the
    optimized logical plan."""
    from osmnetfusion_spark.operators import dedup

    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = dedup.line_dedup(d, max_df=5, sep=" ")
    logical = out._jdf.queryExecution().optimizedPlan().toString()
    assert "ResolvedHint" not in logical, logical
    plan = _plan(out)
    assert "LeftAnti" in plan, plan


def test_bpe_pair_counts_topk_is_take_ordered(spark):
    """bpe_pair_counts' scale property: the corpus-wide top-k must plan
    as TakeOrderedAndProject (distributed partial top-k) -- never a
    global row_number window that sorts the entire distinct-pair table
    (~vocab^2 rows) in one task. Any SinglePartition exchange may appear
    only ABOVE the TakeOrdered (the bounded k-row rank window), never
    below it on the unbounded side."""
    from osmnetfusion_spark.operators import textstats

    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = _plan(textstats.bpe_pair_counts(d, k=10))
    assert "TakeOrderedAndProject" in plan, plan
    below = plan[plan.index("TakeOrderedAndProject"):]
    assert "Exchange SinglePartition" not in below, plan
