"""Driver contract for the spark-graft builder (PySpark target).

`entry(spark)` runs the flagship graft flow on sf0.001: Common-Crawl-style
points derived from `documents`, OSM-style segments derived from
`supplier`, cell-local kNN snap, per-tile edge-density rollup.

`queries()` / `oracle_sql()` expose one entry per implemented operator
family from SURVEY.md §2 (see osmnetfusion_spark/driver_contract.py for the
implementations and their exact-ANSI-SQL oracle twins).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from osmnetfusion_spark import driver_contract as DC  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    sf_dir = "/root/testdata/sf0.001"
    snap = DC.q_knn_snap(spark, sf_dir)
    density = DC.q_tile_density(spark, sf_dir)
    pts = DC.doc_points(spark, sf_dir).select(
        "doc_id",
        DC.h3idx.cell_col(F.col("lat"), F.col("lon"), DC.TILE_RES).alias("tile_id"),
    )
    return (
        snap.join(pts, "doc_id")
        .join(density, "tile_id", "left")
        .groupBy("tile_id", "edge_id")
        .agg(
            F.count(F.lit(1)).alias("n_snapped"),
            F.max("page_count").alias("page_count"),
            F.round(F.min("dist_m"), 4).alias("min_dist_m"),
        )
        .orderBy("tile_id", "edge_id")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: fn for name, (fn, _sql) in DC.QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI-SQL twin for each query (same column names)."""
    return {name: sql for name, (_fn, sql) in DC.QUERIES.items() if sql is not None}
