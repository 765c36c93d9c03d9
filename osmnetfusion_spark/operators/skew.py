"""Skew mitigation: salted repartitioning for heavy-hitter keys.

North rule: "salted repartitioning to defuse urban-core cell skew at
10^12-document scale". At web scale a handful of H3 cells (city centers)
hold orders of magnitude more pages than the median cell, so any
``groupBy(cell)`` whose aggregate is NOT map-side combinable (list folds,
exact distinct sets) funnels a hot cell into one reducer task.

Algebraic aggregates (count/sum/min/max) don't need salting -- Spark's
partial aggregation already collapses them map-side, and AQE skew-join
splitting covers join-side skew (both enabled in session.py). The gap is
*holistic* folds, which :func:`salted_fold` turns into two phases:

    phase 1: groupBy(keys + hash(row) % n_salt)  -> partial fold
             (hot key's rows split over n_salt reducers)
    phase 2: groupBy(keys)                       -> merge of n_salt partials

The caller supplies both fold expressions; results are deterministic as
long as the merge is order-insensitive (sorted/deduped lists, sums, ...).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, n_salt: int, cols: list[str] | None = None) -> DataFrame:
    """Deterministic salt column in [0, n_salt) from a hash of ``cols``
    (all columns if None) -- NOT monotonically_increasing_id/rand, which
    would break run-to-run and resume determinism."""
    src = [F.col(c) for c in (cols or df.columns)]
    return df.withColumn("__salt", F.pmod(F.xxhash64(*src), F.lit(n_salt)))


def salted_fold(
    df: DataFrame,
    keys: list[str],
    partial_aggs: list[Column],
    merge_aggs: list[Column],
    n_salt: int = 16,
    salt_cols: list[str] | None = None,
) -> DataFrame:
    """Two-phase salted aggregation for non-map-side-combinable folds.

    ``partial_aggs`` run per (keys, salt); ``merge_aggs`` combine the
    n_salt partials per keys. Example -- exact sorted distinct list per
    hot key::

        salted_fold(df, ["tile_id"],
            [F.collect_set("edge_id").alias("part")],
            [F.array_sort(F.array_distinct(F.flatten(F.collect_list("part"))))
               .alias("edge_ids")])
    """
    salted = with_salt(df, n_salt, salt_cols)
    phase1 = salted.groupBy(*keys, "__salt").agg(*partial_aggs)
    return phase1.groupBy(*keys).agg(*merge_aggs)


def salted_list_agg(
    df: DataFrame,
    keys: list[str],
    value: str,
    out: str = "values",
    n_salt: int = 16,
    distinct: bool = True,
) -> DataFrame:
    """Sorted (optionally deduped) list per key, skew-safe: the canonical
    ``listify`` fold (SURVEY A1) with the hot-key reducer split n_salt
    ways. Output order is total (array_sort), so results are independent
    of partitioning, salt count, and core count."""
    inner = F.collect_set(value) if distinct else F.collect_list(value)
    flat = F.flatten(F.collect_list("__part"))
    merged = F.array_distinct(flat) if distinct else flat
    return salted_fold(
        df,
        keys,
        [inner.alias("__part")],
        [F.array_sort(merged).alias(out)],
        n_salt=n_salt,
        salt_cols=[value],
    )
