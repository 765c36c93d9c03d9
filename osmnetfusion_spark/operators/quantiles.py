"""Exact grouped quantiles from a value histogram.

Spark's exact ``percentile`` buffers every value of a group in one
reducer -- an OOM at 100 TB where a single language bucket holds
billions of documents. This operator computes the SAME interpolated
quantile (the ``quantile_cont`` / numpy-linear definition Spark's
``percentile`` implements) from a ``(keys, value) -> count`` histogram
instead, so per-reducer state is bounded by the DISTINCT-VALUE
cardinality, not the row count. For discrete measures (token counts,
line counts, byte sizes bucketed to a grain) the histogram is tiny;
for continuous measures callers bucket first.

The DuckDB contract oracle uses the built-in ``quantile_cont`` -- an
independent algorithm (full sort per group) -- so a hash-match is
evidence the histogram derivation is exact, not a twin of itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def grouped_quantiles(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    qs: list[float],
    out_names: list[str] | None = None,
) -> DataFrame:
    """Per-``keys`` interpolated quantiles of ``value_col``.

    For each q: ``idx = q * (n - 1)``; result = ``v[floor(idx)] +
    (idx - floor(idx)) * (v[floor(idx)+1] - v[floor(idx)])`` over the
    sorted values (the quantile_cont definition). Derived from the
    histogram: a value whose cumulative-before is ``cb`` and count is
    ``c`` covers sorted positions ``[cb, cb+c-1]`` (0-indexed), so the
    value at any position is a max-over-markers, no per-row sort.

    Scale shape: one map-side-combinable groupBy builds the histogram;
    the cumulative window partitions BY THE GROUP KEYS and orders over
    distinct values only (bounded state -- never a global or
    unpartitioned window); the final reduce is one combinable agg per
    group. Two shuffles total, both on the group keys.

    Output: ``keys..., n_rows, <out_names...>`` (one DOUBLE column per
    q, rounded to 6 dp; default names ``q25``-style from the q value).
    """
    if not qs:
        raise ValueError("need at least one quantile")
    if any(not (0.0 <= q <= 1.0) for q in qs):
        raise ValueError(f"quantiles must be in [0, 1], got {qs}")
    if out_names is None:
        out_names = [f"q{int(round(q * 100)):02d}" for q in qs]
    if len(out_names) != len(qs):
        raise ValueError("out_names must match qs")

    v = F.col(value_col)
    # NULL values are excluded, matching quantile_cont / percentile.
    hist = (
        df.filter(v.isNotNull())
        .groupBy(*keys, value_col)
        .agg(F.count(F.lit(1)).alias("__c"))
    )
    wk = Window.partitionBy(*keys)
    wo = wk.orderBy(value_col)
    hist = hist.select(
        *keys,
        v.cast("double").alias("__v"),
        "__c",
        (F.sum("__c").over(wo) - F.col("__c")).alias("__cb"),
        F.sum("__c").over(wk).alias("__n"),
    )
    # 0-indexed sorted positions covered by this histogram row:
    # [__cb, __cb + __c - 1]. For each q mark the rows holding the
    # floor(idx) and floor(idx)+1 positions; the group agg maxes the
    # markers out (exactly one row matches each position).
    lo_hi = F.col("__cb") + F.col("__c") - 1
    aggs = [F.max("__n").alias("n_rows")]
    finals = []
    for q, name in zip(qs, out_names):
        idx = F.lit(float(q)) * (F.col("__n") - 1).cast("double")
        fl = F.floor(idx).cast("long")
        p2 = F.least(fl + 1, F.col("__n") - 1)
        aggs.append(
            F.max(
                F.when((F.col("__cb") <= fl) & (fl <= lo_hi), F.col("__v"))
            ).alias(f"__lo_{name}")
        )
        aggs.append(
            F.max(
                F.when((F.col("__cb") <= p2) & (p2 <= lo_hi), F.col("__v"))
            ).alias(f"__hi_{name}")
        )
        aggs.append(F.max(idx - fl.cast("double")).alias(f"__fr_{name}"))
        finals.append(
            F.round(
                F.col(f"__lo_{name}")
                + F.col(f"__fr_{name}")
                * (F.col(f"__hi_{name}") - F.col(f"__lo_{name}")),
                6,
            ).alias(name)
        )
    return hist.groupBy(*keys).agg(*aggs).select(*keys, "n_rows", *finals)
