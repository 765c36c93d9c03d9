"""End-to-end pipeline: enrichment (p2) -> simplification (p3) as one
lazy DataFrame program with explicit stage boundaries.

Mirrors the reference's runSimplification chain (runSimplification.py:38-46)
minus the network-I/O stage p1 (synthetic sources instead). Each stage can
be snapshotted via :mod:`..checkpoint` for resume; `metrics` collects the
per-step row counts the reference prints (p3_simplification.py:143-253).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import geo
from . import enrich, merge, simplify

NODE_TAG_COLS = [
    "highway", "crossing", "bicycle", "foot", "barrier", "lit", "width",
    "public_transport", "bicycle_parking",
]


def run_enrichment(
    spark: SparkSession, tables: dict[str, DataFrame], metrics: dict | None = None
) -> tuple[DataFrame, DataFrame]:
    """p2_enrichData.main (:706-756) over the synthetic-city tables.

    Stage boundaries are materialized (localCheckpoint; Iceberg-table
    snapshots via :mod:`..checkpoint` when a warehouse path is given):
    each operator's plan stays small instead of accumulating a
    hundreds-of-columns Catalyst tree that re-optimizes at every action.
    """
    import time as _time

    m = metrics if metrics is not None else {}
    _t = [_time.time()]

    def lap(name):
        now = _time.time()
        m[f"t_enrich_{name}"] = round(now - _t[0], 2)
        _t[0] = now

    edges = tables["edges"].withColumn("edge_id", F.col("osmid"))
    edges = edges.withColumn("length", enrich.polyline_length_col(F.col("geometry")))
    nodes = tables["nodes"].localCheckpoint()

    edges = enrich.landuse_ratio_all(
        edges,
        [
            ("green", tables["landuse_green"]),
            ("retail", tables["landuse_retail"]),
            ("building", tables["landuse_building"]),
        ],
    ).localCheckpoint()
    lap("landuse")

    # bike-edge labeling + cycleway cascade are pure column logic / self-
    # joins on the checkpointed landuse output -- keep them lazy and fold
    # them into the gradient-stage materialization
    edges = enrich.improve_bike_edges(edges)
    edges = enrich.add_cycle_paths(edges)
    nodes, edges = enrich.add_gradient(nodes, edges, tables["elevations"])
    nodes = enrich.add_traffic_lights(nodes, tables["traffic_signals"]).localCheckpoint()
    edges = enrich.add_cycle_path_width(edges, tables["cycle_path_widths"])
    edges = edges.localCheckpoint()
    lap("gradient_signals")
    edges = enrich.add_bicycle_parking(edges, tables["bike_amenities"]).localCheckpoint()
    lap("amenities")
    edges = enrich.add_pt_stops(edges, tables["pt_stops"]).localCheckpoint()
    lap("pt_stops")
    nodes, edges = enrich.update_idxs(nodes, edges)
    nodes = nodes.localCheckpoint()
    edges = edges.localCheckpoint()
    lap("idxs")
    return nodes, edges


def run_simplification(
    spark: SparkSession,
    nodes: DataFrame,
    edges: DataFrame,
    cluster_threshold: int = simplify.CLUSTER_THRESHOLD,
    metrics: dict | None = None,
) -> tuple[DataFrame, DataFrame]:
    """p3 steps 1-13. Returns (final_nodes, final_edges)."""
    import time as _time

    m = metrics if metrics is not None else {}
    _t = [_time.time()]

    def lap(name):
        now = _time.time()
        m[f"t_{name}"] = round(now - _t[0], 2)
        _t[0] = now

    # step 1: split curves
    edges = simplify.split_curves(edges).localCheckpoint()
    new_nodes = simplify.curve_split_nodes(edges, [])
    for c in nodes.columns:
        if c not in new_nodes.columns:
            new_nodes = new_nodes.withColumn(c, F.lit(None))
    nodes = nodes.unionByName(new_nodes.select(nodes.columns))
    if metrics is not None:
        m["step1_edges"] = edges.count()
        m["step1_nodes"] = nodes.count()
    lap("step1")

    # step 2: ranks
    edges = simplify.add_highway_rank(edges)

    # step 3: node importance
    nodes = simplify.node_importance(nodes, edges)

    # step 4: buffers
    nodes = simplify.add_buffer_radius(nodes)

    # step 5: cluster pass 1
    nodes = simplify.cluster_nodes(nodes, spark, cluster_threshold).localCheckpoint()
    if metrics is not None:
        m["step5_clusters"] = nodes.select("merged_by").distinct().count()
    lap("step5")

    # step 6: split edges crossing foreign cluster buffers
    edges, split_lists = simplify.split_edges_in_buffers(edges, nodes)
    edges = edges.localCheckpoint()
    sp_nodes = simplify.buffer_split_nodes(split_lists, nodes)
    for c in nodes.columns:
        if c not in sp_nodes.columns:
            sp_nodes = sp_nodes.withColumn(c, F.lit(None))
    sp_nodes = sp_nodes.withColumn("merged_by", F.col("merged_by_hint")).withColumn(
        "buf_r", simplify._map_lookup(F.col("highway_conn"), simplify.HIGHWAY_BUFFERS, simplify.BUFFER_DEFAULT)
    )
    # split nodes: cx/cy provisional = own coords until pass 2
    sp_nodes = sp_nodes.withColumn("cx", F.col("x")).withColumn("cy", F.col("y"))
    # materialize: pass-2 clustering runs several actions over this union;
    # without a checkpoint each one re-executes the step-6 split lineage
    nodes = nodes.unionByName(sp_nodes.select(nodes.columns)).localCheckpoint()
    if metrics is not None:
        m["step6_edges"] = edges.count()
        m["step6_nodes"] = nodes.count()
    lap("step6")

    # step 7: cluster pass 2 (same buffers, reference BUFFERS_2 == _1)
    nodes = (
        nodes.withColumnRenamed("merged_by", "merged_by_p1")
        .withColumnRenamed("cx", "cx_p1")
        .withColumnRenamed("cy", "cy_p1")
    )
    nodes = simplify.cluster_nodes(spark=spark, nodes=nodes, threshold=cluster_threshold, pass2=True)
    nodes = nodes.drop("merged_by_p1", "cx_p1", "cy_p1").localCheckpoint()
    if metrics is not None:
        m["step7_clusters"] = nodes.select("merged_by").distinct().count()
    lap("step7")

    # step 8: reassign edges to cluster reps
    edges = simplify.reassign_nodes(edges, nodes).localCheckpoint()
    lap("step8")

    # step 9: degree-2 contraction is DISABLED in the reference
    # (p3_simplification.py:289-294) -- see operators/contraction.py for the
    # gated implementation.

    # step 10: merge nodes
    final_nodes = merge.merge_nodes(nodes)
    if metrics is not None:
        m["step10_nodes"] = final_nodes.count()
    lap("step10")

    # step 11-12: merge parallel edges, fold tags, assemble
    edges = edges.withColumn("osmid_i", F.col("osmid"))
    links = merge.merge_edges(edges)

    # step 13: finalize (reindex, reversed-swap)
    final_edges = merge.finalize_edges(links).localCheckpoint()
    if metrics is not None:
        m["step12_edges"] = final_edges.count()
    lap("step11_13")
    if metrics is not None:
        for mode, flag in (("walk", "access_wal"), ("bike", "access_bik"), ("motorized", "access_mot")):
            m[f"edges_{mode}"] = final_edges.filter(F.coalesce(F.col(flag), F.lit(False))).count()
    return final_nodes, final_edges


def run_full(spark: SparkSession, tables: dict[str, DataFrame], metrics: dict | None = None):
    nodes, edges = run_enrichment(spark, tables, metrics=metrics)
    return run_simplification(spark, nodes, edges, metrics=metrics)
