"""As-of and interval joins vs independent twins (pandas merge_asof /
brute-force nested loop) on adversarial random data: duplicate
timestamps, exact-match boundaries, keys with no build rows, empty
probe keys, degenerate intervals."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from osmnetfusion_spark.operators import temporal


def _mk(spark, seed=7, n_l=400, n_r=300, keys=6):
    rng = np.random.default_rng(seed)
    # coarse grid forces duplicate timestamps and exact l==r matches
    lt = rng.integers(0, 500, n_l) * 10
    rt = rng.integers(0, 500, n_r) * 10
    lk = rng.integers(0, keys, n_l)
    rk = rng.integers(0, keys - 1, n_r)  # key keys-1 has no build rows
    lpdf = pd.DataFrame(
        {"lid": np.arange(n_l), "k": lk, "ts_us": lt, "lval": rng.normal(size=n_l).round(6)}
    )
    rpdf = pd.DataFrame(
        {"rid": np.arange(n_r), "k": rk, "ts_us": rt, "rval": rng.normal(size=n_r).round(6)}
    )
    return lpdf, rpdf


def _merge_asof_twin(lpdf, rpdf, direction, tolerance=None):
    # pandas picks the LAST sorted row on ties backward / FIRST forward;
    # sorting the build by (ts, rid) makes that max-rid / min-rid --
    # the same tiebreak asof_join promises via seq_col
    l = lpdf.sort_values(["ts_us", "lid"]).reset_index(drop=True)
    r = rpdf.sort_values(["ts_us", "rid"]).reset_index(drop=True)
    out = pd.merge_asof(
        l, r, on="ts_us", by="k", direction=direction,
        suffixes=("", "_r"), tolerance=tolerance, allow_exact_matches=True,
    )
    return {
        int(row.lid): (None if pd.isna(row.rid) else int(row.rid))
        for row in out.itertuples()
    }


@pytest.mark.parametrize("direction", ["backward", "forward"])
def test_asof_join_matches_pandas_merge_asof(spark, direction):
    lpdf, rpdf = _mk(spark)
    l = spark.createDataFrame(lpdf)
    r = spark.createDataFrame(rpdf)
    out = temporal.asof_join(
        l, r, on="k", right_cols=["rid", "rval"], seq_col="rid",
        direction=direction,
    ).toPandas()
    got = {
        int(row.lid): (None if pd.isna(row.asof_rid) else int(row.asof_rid))
        for row in out.itertuples()
    }
    assert got == _merge_asof_twin(lpdf, rpdf, direction)


def test_asof_join_tolerance(spark):
    lpdf, rpdf = _mk(spark, seed=11)
    l = spark.createDataFrame(lpdf)
    r = spark.createDataFrame(rpdf)
    out = temporal.asof_join(
        l, r, on="k", right_cols=["rid"], seq_col="rid", tolerance=50
    ).toPandas()
    got = {
        int(row.lid): (None if pd.isna(row.asof_rid) else int(row.asof_rid))
        for row in out.itertuples()
    }
    assert got == _merge_asof_twin(lpdf, rpdf, "backward", tolerance=50)
    # tolerance must have nulled at least one otherwise-matched row
    loose = _merge_asof_twin(lpdf, rpdf, "backward")
    assert any(loose[k] is not None and got[k] is None for k in got)


def test_asof_join_row_count_and_unmatched_key(spark):
    lpdf, rpdf = _mk(spark)
    l = spark.createDataFrame(lpdf)
    r = spark.createDataFrame(rpdf)
    out = temporal.asof_join(l, r, on="k", right_cols=["rid"], seq_col="rid").toPandas()
    assert len(out) == len(lpdf)  # LEFT semantics: every probe row kept
    # the build-less key exists and is entirely unmatched
    k_empty = out[out.k == lpdf.k.max()] if lpdf.k.max() == 5 else None
    assert k_empty is not None and len(k_empty) > 0
    assert k_empty.asof_rid.isna().all()


def test_range_interval_join_vs_bruteforce(spark):
    rng = np.random.default_rng(3)
    n_p, n_i = 500, 60
    ppdf = pd.DataFrame({
        "pid": np.arange(n_p),
        "k": rng.integers(0, 5, n_p),
        "ts_us": rng.integers(0, 100_000, n_p),
    })
    start = rng.integers(0, 95_000, n_i)
    ipdf = pd.DataFrame({
        "iid": np.arange(n_i),
        "k": rng.integers(0, 5, n_i),
        "start_us": start,
        # includes zero-length (empty) and long intervals
        "end_us": start + rng.integers(0, 20_000, n_i),
    })
    out = temporal.range_interval_join(
        spark.createDataFrame(ppdf), spark.createDataFrame(ipdf),
        on="k", bucket_width=1_000,
    ).toPandas()
    got = {(int(r.pid), int(r.iid)) for r in out.itertuples()}
    want = {
        (int(p.pid), int(i.iid))
        for p in ppdf.itertuples()
        for i in ipdf.itertuples()
        if p.k == i.k and i.start_us <= p.ts_us < i.end_us
    }
    assert got == want and len(out) == len(got)  # exact set, no dupes


def test_range_interval_join_inverted_and_empty_intervals(spark):
    """Inverted (end < start) and empty (end == start) intervals must
    yield zero candidates -- NOT a descending F.sequence fan-out that
    bypasses the bucket cap (the pre-fix failure: one corrupt far-past
    end exploded ~1e6 rows)."""
    p = spark.createDataFrame(pd.DataFrame(
        {"pid": [1, 2], "k": [0, 0], "ts_us": [5, 50]}
    ))
    i = spark.createDataFrame(pd.DataFrame({
        "iid": [1, 2, 3],
        "k": [0, 0, 0],
        "start_us": [3_600_000_000_000_000, 40, 0],
        "end_us": [0, 40, 100],  # inverted, empty, normal
    }))
    out = temporal.range_interval_join(
        p, i, on="k", bucket_width=10, max_buckets_per_interval=100
    ).toPandas()
    assert set(zip(out.pid, out.iid)) == {(1, 3), (2, 3)}


def test_range_interval_join_exact_buckets_beyond_double_precision(spark):
    """fdiv must be exact integral floor-division: timestamps beyond
    2^53 (nanosecond epochs) mis-bucket under double division and
    silently drop matches."""
    base = (1 << 60) + 7  # far beyond double's exact-integer range
    p = spark.createDataFrame(pd.DataFrame(
        {"pid": [1], "k": [0], "ts_us": [base + 5]}
    ))
    i = spark.createDataFrame(pd.DataFrame(
        {"iid": [1], "k": [0], "start_us": [base], "end_us": [base + 100]}
    ))
    out = temporal.range_interval_join(p, i, on="k", bucket_width=1_000)
    assert out.count() == 1


def test_range_interval_join_explode_cap(spark):
    p = spark.createDataFrame(pd.DataFrame({"pid": [1], "k": [0], "ts_us": [5]}))
    i = spark.createDataFrame(
        pd.DataFrame({"iid": [1], "k": [0], "start_us": [0], "end_us": [10_000_000]})
    )
    with pytest.raises(Exception, match="max_buckets_per_interval"):
        temporal.range_interval_join(
            p, i, on="k", bucket_width=10, max_buckets_per_interval=100
        ).collect()


def test_asof_join_bad_direction(spark):
    lpdf, rpdf = _mk(spark)
    with pytest.raises(ValueError, match="direction"):
        temporal.asof_join(
            spark.createDataFrame(lpdf), spark.createDataFrame(rpdf),
            on="k", direction="nearest",
        )


@pytest.mark.parametrize("seed", [13, 29, 71])
def test_asof_join_matches_pandas_more_seeds(spark, seed):
    """Extra seeds over the duplicate-timestamp generator: the fixed-seed
    equivalence above could in principle miss a tiebreak regime."""
    lpdf, rpdf = _mk(spark, seed=seed, n_l=250, n_r=180)
    out = temporal.asof_join(
        spark.createDataFrame(lpdf), spark.createDataFrame(rpdf),
        on="k", right_cols=["rid"], seq_col="rid",
    ).toPandas()
    got = {
        int(r.lid): (None if pd.isna(r.asof_rid) else int(r.asof_rid))
        for r in out.itertuples()
    }
    assert got == _merge_asof_twin(lpdf, rpdf, "backward")
