"""Raster <-> vector tiling over the cell grid.

Per the north star: "raster<->vector tile rasterization of edge density" +
"per-tile edge assignments". A *tile* is a grid cell at a coarse resolution
(default res 11, ~54 m). Rasterize = aggregate vector features (pages,
edges) into per-tile scalar fields; vectorize = reconstruct tile polygon
rings from the cell ids (pure column math both ways).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import h3idx
from ..operators import spatial

TILE_RES = 11


def tile_of(lat, lon, res: int = TILE_RES):
    return h3idx.cell_col(lat, lon, res)


def page_tile_density(pages: DataFrame, res: int = TILE_RES) -> DataFrame:
    """Rasterize pages into per-tile counts: (tile_id, page_count)."""
    return (
        pages.withColumn("tile_id", tile_of(F.col("lat"), F.col("lon"), res))
        .groupBy("tile_id")
        .agg(F.count(F.lit(1)).alias("page_count"))
    )


def edge_tile_assignment(
    edge_segments: DataFrame, res: int = TILE_RES, edge_id: str = "edge_id"
) -> DataFrame:
    """Per-tile edge assignment: (tile_id, edge_id) for every tile an edge
    crosses. Cover cells are computed with the same column-only supercover
    as the spatial joins."""
    covered = edge_segments.withColumn(
        "tile_id",
        F.explode(
            spatial.cover_segment_cells(
                F.col("ax"), F.col("ay"), F.col("bx"), F.col("by"), res
            )
        ),
    )
    return covered.select("tile_id", edge_id).dropDuplicates(["tile_id", edge_id])


def tile_edge_density(
    pages_snapped: DataFrame,
    pages: DataFrame,
    edge_segments: DataFrame,
    res: int = TILE_RES,
) -> DataFrame:
    """The flagship rollup: per (tile, edge) page pressure + edge density.

    (tile_id, edge_id, page_count, edge_density) where page_count = snapped
    pages located in the tile and assigned to that edge, edge_density =
    edges crossing the tile.
    """
    if "lat" in pages_snapped.columns and "lon" in pages_snapped.columns:
        # coordinates rode the kNN fold (snap_pages_to_edges carry) --
        # no re-join of the page corpus needed
        located = pages_snapped
    else:
        located = pages_snapped.join(pages.select("url", "lat", "lon"), "url")
    located = located.withColumn("tile_id", tile_of(F.col("lat"), F.col("lon"), res))
    per_tile_edge = located.groupBy("tile_id", "edge_id").agg(
        F.count(F.lit(1)).alias("page_count")
    )
    density = (
        edge_tile_assignment(edge_segments, res)
        .groupBy("tile_id")
        .agg(F.count(F.lit(1)).alias("edge_density"))
    )
    return per_tile_edge.join(density, "tile_id", "left").select(
        "tile_id", "edge_id", "page_count",
        F.coalesce("edge_density", F.lit(0)).alias("edge_density"),
    )


def tile_pyramid(
    tile_counts: DataFrame,
    from_res: int,
    levels: list[int],
    count_col: str = "page_count",
) -> DataFrame:
    """Multi-resolution rollup pyramid (hypertable-rollup analog): coarser
    levels re-aggregate the finest level's per-tile counts with pure
    parent-cell column math -- the 10^12-row fact table is scanned ONCE
    (for the base level); every coarser level reads only the base rollup.
    Returns (res, tile_id, count_col) across all levels."""
    outs = [tile_counts.select(
        F.lit(from_res).alias("res"), "tile_id", F.col(count_col)
    )]
    for r in levels:
        outs.append(
            tile_counts.groupBy(
                h3idx.parent_col(F.col("tile_id"), from_res - r).alias("tile_id")
            )
            .agg(F.sum(count_col).alias(count_col))
            .select(F.lit(r).alias("res"), "tile_id", F.col(count_col))
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


def vectorize_tiles(tiles: DataFrame, tile_id: str = "tile_id") -> DataFrame:
    """Vector side of raster<->vector: reconstruct each tile's polygon ring
    from its cell id -- pure column math inverse of the encode."""
    res = (F.col(tile_id) / F.lit(h3idx.SHIFT_RES)).cast("long")
    rem = F.col(tile_id) - res * F.lit(h3idx.SHIFT_RES)
    j = (rem / F.lit(h3idx.SHIFT_J)).cast("long")
    i = rem - j * F.lit(h3idx.SHIFT_J)
    size = F.lit(1.0) / F.pow(F.lit(2.0), res.cast("double"))
    lon0 = i.cast("double") * size - 180.0
    lat0 = j.cast("double") * size - 90.0
    ring = F.array(
        F.array(lon0, lat0),
        F.array(lon0 + size, lat0),
        F.array(lon0 + size, lat0 + size),
        F.array(lon0, lat0 + size),
        F.array(lon0, lat0),
    )
    return tiles.withColumn("tile_ring", ring)
