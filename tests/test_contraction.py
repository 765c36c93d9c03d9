"""Degree-2 chain contraction (G9, gated off in the pipeline like the
reference -- p3_simplification.py:289-294)."""

from pyspark.sql import functions as F

from osmnetfusion_spark.operators.contraction import contract_deg2_nodes


def _edges(spark, rows):
    return spark.createDataFrame(
        [
            (eid, u, v, [[float(x), float(y)] for x, y in geom], float(ln))
            for eid, u, v, geom, ln in rows
        ],
        "edge_id long, u long, v long, geometry array<array<double>>, length double",
    )


def test_chain_contracts_to_single_edge(spark):
    # 0-1-2-3-4 chain (nodes 1,2,3 are deg-2) plus a spur at node 0
    rows = [
        (10, 0, 1, [(0, 0), (1, 0)], 1.0),
        (11, 1, 2, [(1, 0), (2, 0)], 1.0),
        (12, 2, 3, [(2, 0), (3, 0)], 1.0),
        (13, 3, 4, [(3, 0), (4, 0)], 1.0),
        # two spurs at node 0 -> deg 3 anchor (deg-2 rule must skip it)
        (14, 0, 9, [(0, 0), (0, 1)], 1.0),
        (15, 0, 8, [(0, 0), (0, -1)], 1.0),
    ]
    out = contract_deg2_nodes(_edges(spark, rows)).collect()
    by_id = {r.edge_id: r for r in out}
    assert set(by_id) == {10, 14, 15}
    chain = by_id[10]
    assert {chain.u, chain.v} == {0, 4}
    assert chain.length == 4.0
    assert chain.merged_ids == [10, 11, 12, 13]
    pts = [tuple(p) for p in chain.geometry]
    want = [(0.0, 0.0), (1.0, 0.0), (2.0, 0.0), (3.0, 0.0), (4.0, 0.0)]
    assert pts == want or pts == want[::-1]


def test_reversed_storage_orientation(spark):
    # middle edge stored v->u: geometry must still stitch contiguously
    rows = [
        (20, 0, 1, [(0, 0), (1, 0)], 1.0),
        (21, 2, 1, [(2, 0), (1, 0)], 1.0),  # stored backwards
        (22, 2, 3, [(2, 0), (3, 0)], 1.0),
        # deg-3 anchors at both ends
        (23, 0, 8, [(0, 0), (0, 1)], 1.0),
        (25, 0, 7, [(0, 0), (0, -1)], 1.0),
        (24, 3, 9, [(3, 0), (3, 1)], 1.0),
        (26, 3, 6, [(3, 0), (3, -1)], 1.0),
    ]
    out = contract_deg2_nodes(_edges(spark, rows)).collect()
    chain = next(r for r in out if len(r.merged_ids) == 3)
    xs = [p[0] for p in chain.geometry]
    assert xs == sorted(xs) or xs == sorted(xs, reverse=True)
    assert chain.merged_ids == [20, 21, 22]


def test_cycle_keeps_two_parallel_edges(spark):
    rows = [
        (30, 0, 1, [(0, 0), (1, 0)], 1.0),
        (31, 1, 2, [(1, 0), (1, 1)], 1.0),
        (32, 2, 3, [(1, 1), (0, 1)], 1.0),
        (33, 3, 0, [(0, 1), (0, 0)], 1.0),
    ]
    out = contract_deg2_nodes(_edges(spark, rows)).collect()
    # a pure cycle cannot drop below 2 edges without losing the loop
    assert len(out) == 2
    ids = sorted(set(i for r in out for i in r.merged_ids))
    assert ids == [30, 31, 32, 33]


def test_protected_nodes_survive(spark):
    rows = [
        (40, 0, 1, [(0, 0), (1, 0)], 1.0),
        (41, 1, 2, [(1, 0), (2, 0)], 1.0),
    ]
    protected = None
    out = contract_deg2_nodes(_edges(spark, rows)).collect()
    assert len(out) == 1  # unprotected: contracts
    prot = _edges(spark, rows).sparkSession.createDataFrame([(1,)], "osmid long")
    out2 = contract_deg2_nodes(_edges(spark, rows), protected=prot).collect()
    assert len(out2) == 2  # protected node 1 survives


def test_determinism_across_parallelism(spark):
    rows = [(50 + i, i, i + 1, [(i, 0), (i + 1, 0)], 1.0) for i in range(12)] + [
        (99, 0, 100, [(0, 0), (0, 1)], 1.0),
        (98, 12, 101, [(12, 0), (12, 1)], 1.0),
    ]
    a = contract_deg2_nodes(_edges(spark, rows).repartition(1)).collect()
    b = contract_deg2_nodes(_edges(spark, rows).repartition(7)).collect()
    norm = lambda rs: sorted(
        (r.edge_id, r.u, r.v, r.length, tuple(r.merged_ids)) for r in rs
    )
    assert norm(a) == norm(b)
