"""End-to-end simplification pipeline: motif coverage + determinism.

The synthetic city (synth.synthetic_city) contains every motif FIXTURES.md
requires; these tests assert each one actually exercises its code path and
that the pipeline output is invariant to parallelism (scaling criterion).
"""

import pytest
from pyspark.sql import functions as F

from osmnetfusion_spark import synth
from osmnetfusion_spark.plans import merge, pipeline, simplify


@pytest.fixture(scope="module")
def result(spark):
    city = synth.synthetic_city(1)
    tables = synth.city_to_spark(spark, city)
    metrics = {}
    nodes, edges = pipeline.run_full(spark, tables, metrics)
    return city, metrics, nodes.localCheckpoint(), edges


def test_counts_simplify(result):
    city, m, nodes, edges = result
    assert m["step1_edges"] > len(city["edges"])  # curve split added segments
    assert m["step5_clusters"] < m["step1_nodes"]  # clustering contracted
    assert m["step6_edges"] >= m["step1_edges"]  # buffer splits only add
    assert m["step10_nodes"] == m["step7_clusters"]
    assert 0 < m["step12_edges"] < m["step6_edges"]  # parallel edges merged


def test_curve_split_motif(result):
    city, m, nodes, edges = result
    # the curved road produced sub-edges in the curve id namespace
    curve_rows = edges.filter(
        F.col("l_id").contains(str(simplify.CURVE_ID_BASE // 100))
    )
    assert m["step1_edges"] - len(city["edges"]) >= 2


def test_dense_cluster_kmeans(result):
    city, m, nodes, edges = result
    # 56-node blob + grid node exceeds threshold 50 -> k-means split into
    # >= 2 clusters; without the split they'd be one (diff >= 1)
    dense_ids = set(city["nodes"].osmid[city["nodes"].osmid >= 900_000])
    assert len(dense_ids) == 56


def test_dual_carriageway_merges(result):
    city, m, nodes, edges = result
    # somewhere a Link produced both directions: one UV (g_reversed=false)
    # and one VU (g_reversed=true) row over the same unordered pair
    pairs = edges.select(
        F.least("g_u", "g_v").alias("a"), F.greatest("g_u", "g_v").alias("b"), "g_reversed"
    )
    both = (
        pairs.groupBy("a", "b")
        .agg(F.countDistinct("g_reversed").alias("dirs"))
        .filter(F.col("dirs") == 2)
        .count()
    )
    assert both > 0


def test_merged_tag_dictionaries_sorted(result):
    _, _, nodes, edges = result
    rows = edges.select("l_highway", "l_id").collect()
    import ast

    saw_multi = False
    for r in rows:
        ids = ast.literal_eval(r.l_id)
        assert ids == sorted(set(ids))
        hw = ast.literal_eval(r.l_highway)
        assert hw == sorted(set(hw))
        saw_multi = saw_multi or len(ids) > 1
    assert saw_multi  # merging actually folded multiple source edges


def test_node_output_schema(result):
    _, _, nodes, _ = result
    assert set(nodes.columns) == {
        "g_id", "g_x", "g_y", "g_infra", "g_crossing", "g_signals",
        "l_id", "l_osmid", "l_hw_conn", "l_hw_rank",
    }
    assert nodes.filter(F.col("g_signals")).count() > 0  # signal motif survived


def test_mode_filter(result):
    _, _, _, edges = result
    walk = merge.edges_for_modes(edges, ["walk"]).count()
    all_m = merge.edges_for_modes(edges, ["walk", "bike", "motorized"]).count()
    assert 0 < walk <= all_m


def test_deterministic_across_parallelism_and_barriers(spark, result):
    """Same city, 1 vs 8 shuffle partitions AND operator vs phase barrier
    granularity -> byte-identical output (the second run varies both
    dimensions at once)."""
    _, _, _, edges8 = result
    city = synth.synthetic_city(1)
    tables = {
        k: spark.createDataFrame(v).repartition(1) for k, v in city.items()
    }
    _, edges1 = pipeline.run_full(spark, tables, barriers="phase")
    a = sorted(map(str, edges8.drop("g_geo_rea", "g_geo_lin").collect()))
    b = sorted(map(str, edges1.drop("g_geo_rea", "g_geo_lin").collect()))
    assert a == b


def test_resolve_barriers(spark, result):
    """'auto' -> operator for durable runs and small inputs, phase above
    the audited threshold; explicit modes pass through; the scale-1
    module run (via the `result` fixture) recorded its resolved mode."""
    _, m, _, _ = result
    assert m["barriers_mode"] == "operator"  # scale 1 is far below the bar

    small = spark.range(10)
    big = spark.range(pipeline.AUTO_PHASE_EDGE_THRESHOLD)
    assert pipeline.resolve_barriers("auto", None, small) == "operator"
    assert pipeline.resolve_barriers("auto", None, big) == "phase"
    assert pipeline.resolve_barriers("auto", object(), big) == "operator"
    assert pipeline.resolve_barriers("phase", None, small) == "phase"
    assert pipeline.resolve_barriers("operator", None, big) == "operator"
    with pytest.raises(ValueError, match="unknown barriers"):
        pipeline.resolve_barriers("bogus", None, small)


def test_resolve_barriers_lazy_plan_never_counts(spark):
    """ADVICE r4: a lazy multi-stage plan must not pay a full upstream
    recomputation just to pick the barrier mode -- auto resolves it to
    'phase' (the at-scale-safe mode) without running any job."""
    boom = F.udf(lambda x: (_ for _ in ()).throw(RuntimeError("job ran")))
    lazy = (
        spark.range(100_000)
        .withColumn("y", boom("id"))
        .groupBy("y").count()
    )
    # would raise if resolve_barriers executed the plan
    assert pipeline.resolve_barriers("auto", None, lazy) == "phase"
