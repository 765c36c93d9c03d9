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

from . import enrich, merge, simplify

NODE_TAG_COLS = [
    "highway", "crossing", "bicycle", "foot", "barrier", "lit", "width",
    "public_transport", "bicycle_parking",
]


#: p3 barriers kept in "phase" granularity: the four natural phase
#: boundaries (post-buffer-split s6, post-cluster s7, post-reassign s8,
#: post-merge final). s1_edges and s5_nodes become lazy: split_curves is
#: pure column logic (cheap to recompute) and cluster_nodes already
#: truncates its own lineage internally (the CC loop localCheckpoints),
#: so their extra barriers are pure scheduling overhead.
PHASE_BARRIERS = frozenset(
    {"s6_edges", "s6_nodes", "s7_nodes", "s8_edges", "final_edges"}
)

#: Input size (edge rows) above which ``barriers="auto"`` picks phase
#: granularity for non-durable runs. From the §1.2 audit
#: (BENCH/BASELINE.md, tools/bench_barriers.py): at 4k edges the two
#: modes are within noise of each other (29.2 vs 27.7 s r4 window, 36.2
#: vs 38.2 s r3 window), at 16k edges phase wins ~25% (65.4 vs 49.2 s)
#: and at 65k ~12% — skipping materialization of the large s1/s5
#: intermediates beats the recomputation once localCheckpoint write
#: volume dominates. Operator stays the small-input default for its
#: stronger step isolation; the crossover is placed between the 4k and
#: 16k cells.
AUTO_PHASE_EDGE_THRESHOLD = 8_000


def resolve_barriers(barriers: str, snap, edges: DataFrame) -> str:
    """Resolve the ``barriers`` mode for a simplification run.

    Explicit "operator"/"phase" pass through. "auto" resolves to:

    - "operator" with a durable ``Snapshotter`` — resume coverage wants
      every step boundary committed, and the audit's 12% is a local-mode
      localCheckpoint-I/O effect that doesn't apply to durable stages;
    - otherwise "phase" when the input exceeds
      :data:`AUTO_PHASE_EDGE_THRESHOLD` edges, else "operator".

    The edge count is only taken when ``edges`` is a MATERIALIZED root
    (a localCheckpoint'd LogicalRDD or a bare file scan — both count in
    metadata time; ``run_full`` always hands over the checkpointed
    enrichment output, so this is the normal path). A caller invoking
    this directly with a lazy multi-stage plan would otherwise pay a
    full upstream recomputation just to pick a barrier mode (ADVICE
    r4), so an un-countable input resolves straight to "phase" — the
    at-scale-safe choice; the two modes differ only in how many
    intermediates materialize, never in output.
    """
    if barriers != "auto":
        if barriers not in ("operator", "phase"):
            raise ValueError(f"unknown barriers mode {barriers!r}")
        return barriers
    if snap is not None:
        return "operator"
    try:
        plan = edges._jdf.queryExecution().optimizedPlan().toString()
    except Exception:
        plan = ""
    root = plan.splitlines()[0] if plan else ""
    cheap = ("LogicalRDD" in root) or (
        root.lstrip().startswith(("Relation", "Range", "LocalRelation"))
        and len(plan.splitlines()) <= 2
    )
    if not cheap:
        return "phase"
    return "phase" if edges.count() >= AUTO_PHASE_EDGE_THRESHOLD else "operator"


def _stager(snap, prefix: str, keep: frozenset | None = None):
    """Stage-boundary materializer.

    With a ``checkpoint.Snapshotter`` (the at-scale default: snapshots
    survive executor/driver loss and a restarted run SKIPS completed
    stages -- the closure is never invoked, so no upstream job runs),
    each boundary is a durable table + manifest commit. Without one
    (single-host fast path: tests, bench), it is a ``localCheckpoint``,
    which truncates lineage but is forfeited on executor loss.

    ``keep``: when given, only the named boundaries materialize; the
    rest stay lazy (barrier-granularity audit, VERDICT r2 #4).
    """

    def bound(name: str, key: str, fn):
        if keep is not None and name not in keep:
            return fn()
        if snap is not None:
            return snap.stage(f"{prefix}{name}", fn, key)
        # lazy: the boundary still materializes exactly once (first
        # consumer action) and truncates lineage, but skips the
        # standalone materialization job per stage -- the scale-4
        # flagship is scheduling-overhead-bound across ~12 barriers
        return fn().localCheckpoint(eager=False)

    return bound


def run_enrichment(
    spark: SparkSession,
    tables: dict[str, DataFrame],
    metrics: dict | None = None,
    snap=None,
) -> tuple[DataFrame, DataFrame]:
    """p2_enrichData.main (:706-756) over the synthetic-city tables.

    Stage boundaries are materialized (durable :mod:`..checkpoint`
    snapshots when ``snap`` is given -- the at-scale default; otherwise
    localCheckpoint): each operator's plan stays small instead of
    accumulating a hundreds-of-columns Catalyst tree that re-optimizes at
    every action. Stage bodies are closures so a resumed run never
    executes the plans of completed stages.
    """
    import time as _time

    m = metrics if metrics is not None else {}
    _t = [_time.time()]
    bound = _stager(snap, "enrich_")

    def lap(name):
        now = _time.time()
        m[f"t_enrich_{name}"] = round(now - _t[0], 2)
        _t[0] = now

    edges0 = tables["edges"].withColumn("edge_id", F.col("osmid"))
    edges0 = edges0.withColumn("length", enrich.polyline_length_col(F.col("geometry")))
    nodes = tables["nodes"].localCheckpoint()

    edges = bound(
        "landuse", "edge_id",
        lambda: enrich.landuse_ratio_all(
            edges0,
            [
                ("green", tables["landuse_green"]),
                ("retail", tables["landuse_retail"]),
                ("building", tables["landuse_building"]),
            ],
        ),
    )
    lap("landuse")

    # bike-edge labeling + cycleway cascade are pure column logic / self-
    # joins on the checkpointed landuse output -- keep them lazy and fold
    # them into the gradient-stage materialization. add_gradient yields
    # (nodes, edges); memoize so the two stage closures share one build.
    _g: dict = {}

    def _gradient():
        if "v" not in _g:
            e = enrich.improve_bike_edges(edges)
            e = enrich.add_cycle_paths(e)
            n, e = enrich.add_gradient(nodes, e, tables["elevations"])
            _g["v"] = (n, e)
        return _g["v"]

    nodes2 = bound(
        "signal_nodes", "osmid",
        lambda: enrich.add_traffic_lights(_gradient()[0], tables["traffic_signals"]),
    )
    edges = bound(
        "gradient_edges", "edge_id",
        lambda: enrich.add_cycle_path_width(_gradient()[1], tables["cycle_path_widths"]),
    )
    lap("gradient_signals")
    edges = bound(
        "amenity_edges", "edge_id",
        lambda: enrich.add_bicycle_parking(edges, tables["bike_amenities"]),
    )
    lap("amenities")
    edges = bound(
        "pt_edges", "edge_id",
        lambda: enrich.add_pt_stops(edges, tables["pt_stops"]),
    )
    lap("pt_stops")
    _i: dict = {}

    def _idxs():
        if "v" not in _i:
            _i["v"] = enrich.update_idxs(nodes2, edges)
        return _i["v"]

    out_nodes = bound("nodes", "osmid", lambda: _idxs()[0])
    out_edges = bound("edges", "osmid", lambda: _idxs()[1])
    lap("idxs")
    return out_nodes, out_edges


def run_simplification(
    spark: SparkSession,
    nodes: DataFrame,
    edges: DataFrame,
    cluster_threshold: int = simplify.CLUSTER_THRESHOLD,
    metrics: dict | None = None,
    snap=None,
    barriers: str = "auto",
) -> tuple[DataFrame, DataFrame]:
    """p3 steps 1-13. Returns (final_nodes, final_edges).

    With ``snap`` each step boundary is a durable snapshot; a restarted
    run resumes after the last committed step (the stage closures are
    never invoked for completed steps, so no upstream jobs run).

    ``barriers``: "operator" materializes every step boundary; "phase"
    keeps only :data:`PHASE_BARRIERS` and leaves the rest lazy (fewer
    materializations of the big intermediates); "auto" (default) picks
    per :func:`resolve_barriers`. Outputs are identical across modes
    (asserted by tools/bench_barriers.py and test_pipeline).
    """
    import time as _time

    m = metrics if metrics is not None else {}
    _t = [_time.time()]
    barriers = resolve_barriers(barriers, snap, edges)
    m["barriers_mode"] = barriers
    keep = PHASE_BARRIERS if barriers == "phase" else None
    bound = _stager(snap, "p3_", keep=keep)

    def lap(name):
        now = _time.time()
        m[f"t_{name}"] = round(now - _t[0], 2)
        _t[0] = now

    # step 1: split curves
    in_nodes = nodes
    edges = bound("s1_edges", "osmid", lambda: simplify.split_curves(edges))

    def _s1_nodes():
        new_nodes = simplify.curve_split_nodes(edges, [])
        for c in in_nodes.columns:
            if c not in new_nodes.columns:
                new_nodes = new_nodes.withColumn(c, F.lit(None))
        return in_nodes.unionByName(new_nodes.select(in_nodes.columns))

    nodes = _s1_nodes()
    if metrics is not None:
        m["step1_edges"] = edges.count()
        m["step1_nodes"] = nodes.count()
    lap("step1")

    # step 2: ranks
    edges = simplify.add_highway_rank(edges)

    # steps 3-5: node importance -> buffers -> cluster pass 1
    n3 = nodes
    nodes = bound(
        "s5_nodes", "osmid",
        lambda: simplify.cluster_nodes(
            simplify.add_buffer_radius(simplify.node_importance(n3, edges)),
            spark, cluster_threshold,
        ),
    )
    if metrics is not None:
        m["step5_clusters"] = nodes.select("merged_by").distinct().count()
    lap("step5")

    # step 6: split edges crossing foreign cluster buffers.
    # split_edges_in_buffers yields (edges, split_lists); memoize so the
    # two stage closures share one build on a fresh run and NEITHER runs
    # on resume.
    e6, n5 = edges, nodes
    _s6: dict = {}

    def _splits():
        if "v" not in _s6:
            e, sl = simplify.split_edges_in_buffers(e6, n5)
            _s6["v"] = (e, sl.localCheckpoint())
        return _s6["v"]

    def _s6_nodes():
        sp_nodes = simplify.buffer_split_nodes(_splits()[1], n5)
        for c in n5.columns:
            if c not in sp_nodes.columns:
                sp_nodes = sp_nodes.withColumn(c, F.lit(None))
        sp_nodes = sp_nodes.withColumn("merged_by", F.col("merged_by_hint")).withColumn(
            "buf_r", simplify._map_lookup(F.col("highway_conn"), simplify.HIGHWAY_BUFFERS, simplify.BUFFER_DEFAULT)
        )
        # split nodes: cx/cy provisional = own coords until pass 2
        sp_nodes = sp_nodes.withColumn("cx", F.col("x")).withColumn("cy", F.col("y"))
        return n5.unionByName(sp_nodes.select(n5.columns))

    edges = bound("s6_edges", "osmid", lambda: _splits()[0])
    # pass-2 clustering runs several actions over this union; without the
    # boundary each one re-executes the step-6 split lineage
    nodes = bound("s6_nodes", "osmid", _s6_nodes)
    if metrics is not None:
        m["step6_edges"] = edges.count()
        m["step6_nodes"] = nodes.count()
    lap("step6")

    # step 7: cluster pass 2 (same buffers, reference BUFFERS_2 == _1)
    n6 = nodes

    def _s7():
        n = (
            n6.withColumnRenamed("merged_by", "merged_by_p1")
            .withColumnRenamed("cx", "cx_p1")
            .withColumnRenamed("cy", "cy_p1")
        )
        n = simplify.cluster_nodes(spark=spark, nodes=n, threshold=cluster_threshold, pass2=True)
        return n.drop("merged_by_p1", "cx_p1", "cy_p1")

    nodes = bound("s7_nodes", "osmid", _s7)
    if metrics is not None:
        m["step7_clusters"] = nodes.select("merged_by").distinct().count()
    lap("step7")

    # step 8: reassign edges to cluster reps
    e7, n7 = edges, nodes
    edges = bound("s8_edges", "osmid", lambda: simplify.reassign_nodes(e7, n7))
    lap("step8")

    # step 9: degree-2 contraction is DISABLED in the reference
    # (p3_simplification.py:289-294) -- see operators/contraction.py for the
    # gated implementation.

    # step 10: merge nodes
    final_nodes = merge.merge_nodes(nodes)
    if metrics is not None:
        m["step10_nodes"] = final_nodes.count()
    lap("step10")

    # step 11-13: merge parallel edges, fold tags, assemble, finalize
    e8 = edges
    final_edges = bound(
        "final_edges", "g_id",
        lambda: merge.finalize_edges(merge.merge_edges(e8.withColumn("osmid_i", F.col("osmid")))),
    )
    if metrics is not None:
        m["step12_edges"] = final_edges.count()
    lap("step11_13")
    if metrics is not None:
        for mode, flag in (("walk", "access_wal"), ("bike", "access_bik"), ("motorized", "access_mot")):
            m[f"edges_{mode}"] = final_edges.filter(F.coalesce(F.col(flag), F.lit(False))).count()
    return final_nodes, final_edges


def run_full(
    spark: SparkSession,
    tables: dict[str, DataFrame],
    metrics: dict | None = None,
    snap=None,
    barriers: str = "auto",
):
    nodes, edges = run_enrichment(spark, tables, metrics=metrics, snap=snap)
    return run_simplification(
        spark, nodes, edges, metrics=metrics, snap=snap, barriers=barriers
    )
