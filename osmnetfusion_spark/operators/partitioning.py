"""Scale-adaptive scan fan-out (guide §2.5 "input skew").

A small parquet file arrives as ONE scan partition, so every per-row
kernel (Arrow UDFs, interpreted higher-order functions, explodes) upstream
of the first shuffle runs on one core no matter how many the session has.
At production scale the same scan has thousands of splits and needs no
help. :func:`fan_out` bridges the two regimes: repartition round-robin to
the session's default parallelism ONLY when the scan is thinner than that
-- a no-op on any input that is already parallel, never a constant tuned
to the local core count.

Only use this on paths whose results are partition-order independent:
integer/hash aggregates, min/max, per-row expressions, or exact
integer-valued double sums. Paths that aggregate genuine floating-point
terms (e.g. ``avg(ln ...)``) must keep their input partitioning so the
summation order -- and therefore the 6-dp-rounded contract value -- cannot
drift run to run.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def fan_out(df: DataFrame, multiple: int = 1) -> DataFrame:
    """Round-robin repartition up to ``defaultParallelism * multiple``
    when (and only when) the current plan has fewer partitions."""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism * multiple
    try:
        cur = df.rdd.getNumPartitions()
    except Exception:  # pragma: no cover - planning failure falls through
        return df
    if cur < target:
        return df.repartition(target)
    return df
