"""Temporal joins Spark lacks as built-ins: as-of join and interval
(range) join, both expressed as compositions of native DataFrame ops.

The reference's enrichment joins are all spatial (nearest / within); web
corpus pipelines need the temporal analogues -- "latest robots snapshot
as of this crawl", "crawl events inside this outage window". Neither is
a Spark SQL primitive, so per the project's operator doctrine they are
built from existing operators (union + window carry-forward; bucketed
explode + equi-join), never driver loops or per-row Python.

Scale shape:

- :func:`asof_join` is ONE shuffle on the join keys followed by a
  window sort -- identical cost profile to sessionization. No row
  explosion: the build side is unioned, not cross-joined, so a probe
  row never meets more than the rows of its own key partition.
- :func:`range_interval_join` buckets time like the spatial operators
  bucket space: candidate volume is sum(interval_span / bucket_width),
  not |points| x |intervals|; each point lands in exactly one bucket so
  the containment filter needs no dedupe afterwards.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["asof_join", "range_interval_join"]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str = "ts_us",
    right_ts: str = "ts_us",
    right_cols: list[str] | None = None,
    seq_col: str | None = None,
    prefix: str = "asof_",
    tolerance: int | None = None,
    direction: str = "backward",
) -> DataFrame:
    """For each left row, attach the nearest right row at-or-before
    (``direction="backward"``) or at-or-after (``"forward"``) its
    timestamp, per join key -- pandas ``merge_asof`` semantics
    (``allow_exact_matches=True``), distributed.

    Timestamps must be NUMERIC (cast timestamps with
    ``F.unix_micros(...)`` first): integer comparisons are exact and
    hash/oracle-stable, and ``tolerance`` shares the unit.

    Ties: among right rows sharing a timestamp the one with the largest
    ``seq_col`` wins (backward; smallest for forward) -- pass a unique
    id to make the join deterministic on duplicated-timestamp builds.

    Implementation: tag and union both sides, then one window per key
    ordered (ts, side, seq) with a carry-forward ``last(payload,
    ignorenulls=True)`` -- the classic single-shuffle as-of plan. Build
    rows sort before probe rows at equal ts, so "at-or-before" includes
    exact matches. Unmatched (or out-of-tolerance) probes keep null
    payload columns, LEFT-join style.
    """
    keys = [on] if isinstance(on, str) else list(on)
    right_cols = list(right_cols or [c for c in right.columns
                                     if c not in keys and c != right_ts])
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    sgn = 1 if direction == "backward" else -1

    def _ord(c: str | Column) -> Column:
        col = F.col(c) if isinstance(c, str) else c
        return (col * sgn).cast("long")

    pay = F.struct(
        F.col(right_ts).cast("long").alias("__rts"),
        *[F.col(c) for c in right_cols],
    )
    r = right.select(
        *keys,
        _ord(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        (_ord(seq_col) if seq_col else F.lit(0)).alias("__seq"),
        pay.alias("__pay"),
    )
    l = left.select(
        "*",
        _ord(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.lit(0).alias("__seq"),
        F.lit(None).cast(r.schema["__pay"].dataType).alias("__pay"),
    )
    u = l.unionByName(r, allowMissingColumns=True)

    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col("__ts").asc(), F.col("__side").asc(), F.col("__seq").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        u.withColumn("__m", F.last("__pay", ignorenulls=True).over(w))
        .filter(F.col("__side") == 1)
    )
    if tolerance is not None:
        in_tol = (
            F.col(left_ts).cast("long") - F.col("__m.__rts")
        ) * sgn <= F.lit(int(tolerance))
        matched = matched.withColumn(
            "__m", F.when(F.col("__m").isNotNull() & in_tol, F.col("__m"))
        )
    out = matched.select(
        *left.columns,
        F.col("__m.__rts").alias(f"{prefix}{right_ts}"),
        *[F.col(f"__m.{c}").alias(f"{prefix}{c}") for c in right_cols],
    )
    return out


def range_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    on: str | list[str],
    point_ts: str = "ts_us",
    start_ts: str = "start_us",
    end_ts: str = "end_us",
    bucket_width: int = 3_600_000_000,
    max_buckets_per_interval: int = 10_000,
) -> DataFrame:
    """Inner-join points to the intervals containing them (half-open
    ``start <= t < end``), per join key, without a cross product.

    Timestamps numeric (micros by convention; ``bucket_width`` shares
    the unit, default 1 hour). Each interval explodes to its covered
    buckets, each point hashes to exactly ONE bucket, and the candidate
    equi-join on (keys, bucket) is followed by the exact containment
    filter -- the temporal twin of the spatial cell-join. Because the
    point side is never exploded, no post-join dedupe is needed and
    point-side skew stays spread across input partitions.

    ``max_buckets_per_interval`` bounds the explode: a degenerate
    interval spanning the whole corpus would otherwise fan out onto
    every bucket. Oversized intervals raise -- pick a wider bucket (the
    right width is ~the median interval span) rather than letting one
    row produce 10^6 candidates.
    """
    keys = [on] if isinstance(on, str) else list(on)
    w = int(bucket_width)
    ps = F.col(point_ts).cast("long")
    s, e = F.col(start_ts).cast("long"), F.col(end_ts).cast("long")

    def fdiv(c: Column) -> Column:
        """Exact floor-div for the full signed-64 domain. `/` on longs is
        DOUBLE division, which silently mis-buckets timestamps beyond
        2^53 (nanosecond epochs); subtracting pmod first makes the
        numerator exactly divisible and the decimal divide exact."""
        r = F.pmod(c, F.lit(w))
        return ((c - r).cast("decimal(38,0)") / F.lit(w)).cast("long")

    n_buckets = fdiv(e - F.lit(1)) - fdiv(s) + F.lit(1)
    guarded = intervals.withColumn("__nb", n_buckets)
    # Empty/inverted intervals (end <= start, so __nb < 1) get an empty
    # bucket array -- zero candidates, matching half-open semantics --
    # rather than feeding F.sequence a descending range (Spark steps -1
    # and a corrupt far-past end would fan out millions of rows, the
    # exact runaway the cap exists to stop). Oversized spans still fail
    # loudly (raise_error inside when() evaluates lazily per row).
    iv = guarded.withColumn(
        "__b",
        F.explode(
            F.when(F.col("__nb") < 1, F.array().cast("array<long>"))
            .when(
                F.col("__nb") <= max_buckets_per_interval,
                F.sequence(fdiv(s), fdiv(e - F.lit(1))),
            )
            .otherwise(
                F.raise_error(
                    F.concat(
                        F.lit("interval spans "), F.col("__nb").cast("string"),
                        F.lit(f" buckets > max_buckets_per_interval="
                              f"{max_buckets_per_interval}; widen bucket_width"),
                    )
                )
            )
        ),
    ).drop("__nb")
    pt = points.withColumn("__b", fdiv(ps))
    # qualify through the joined frames: points and intervals may share
    # column names (e.g. both called ts_us), which would make bare
    # F.col refs ambiguous after the join
    p_ts = pt[point_ts].cast("long")
    contained = (p_ts >= iv[start_ts].cast("long")) & (
        p_ts < iv[end_ts].cast("long")
    )
    return pt.join(iv, keys + ["__b"]).filter(contained).drop("__b")
