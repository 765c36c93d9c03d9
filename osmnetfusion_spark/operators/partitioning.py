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
    when the plan reads a small file scan.

    Detection reads only file metadata (``df.inputFiles`` + local file
    sizes) -- NEVER ``df.rdd.getNumPartitions()``, which under AQE
    finalizes the adaptive plan and silently re-executes the subplan
    (the spatial.fan_out_probe lesson). Non-file sources and scans big
    enough for the file splitter to parallelize pass through untouched,
    so this is a no-op at production scale.
    """
    spark = df.sparkSession
    target = spark.sparkContext.defaultParallelism * multiple
    try:
        files = df.inputFiles()
    except Exception:  # pragma: no cover - non-analyzable plan
        return df
    if not files or len(files) >= target:
        return df
    import os as _os

    total = 0
    for f in files[:64]:
        try:
            total += _os.path.getsize(f[7:] if f.startswith("file:") else f)
        except OSError:
            return df
    if total > (128 << 20):
        return df  # big scan: the file splitter already parallelizes it
    return df.repartition(target)
