"""Degree-2 chain contraction (G9) -- gated OFF by default.

The reference implements removeDeg2Nodes (p3_functions.py:793-888) but
ships with it DISABLED after flagging it erroneous
(p3_simplification.py:289-294). The north star names "node contraction of
degree-2 chains" as a core stage, so this module provides a correct
*distributed* formulation; the pipeline keeps it off by default to match
the reference's actual output (SURVEY.md G9).

Algorithm: iterative independent-set contraction. Each round

1. compute undirected degrees from the edge list;
2. a node n is a *candidate* iff it has exactly two distinct incident
   edges (a,n), (n,b) with a != n != b and a != b (no self-loops, no
   collapsing a triangle end onto itself);
3. symmetry breaking: keep candidate n only if its id is smaller than any
   NEIGHBORING candidate's id (deterministic local-minimum rule -- two
   adjacent deg-2 nodes never contract in the same round, so merges never
   conflict);
4. merge each kept node's two edges into one edge keyed by the smaller
   edge id: u' = a, v' = b, geometry = a->n ++ n->b (orienting each half,
   deduping the shared vertex), length summed, merged id lists unioned.

A chain of k deg-2 nodes halves (at least geometrically) each round, so
rounds = O(log k); every round is a constant number of joins/groupBys with
localCheckpoint truncating lineage -- the same shape as the engine's
connected-components fallback. The min-id rules make output independent of
partitioning and core count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_EDGE_COLS = ["edge_id", "u", "v", "geometry", "length", "merged_ids"]


def _prep(edges: DataFrame) -> DataFrame:
    e = edges
    if "merged_ids" not in e.columns:
        e = e.withColumn("merged_ids", F.array(F.col("edge_id")))
    return e.select(*_EDGE_COLS)


def contract_deg2_nodes(
    edges: DataFrame, max_iters: int = 30, protected=None
) -> DataFrame:
    """Contract all degree-2 chains; returns the contracted edge table
    (columns edge_id, u, v, geometry, length, merged_ids).

    ``protected``: optional DataFrame of (osmid) nodes that must survive
    (e.g. tagged crossings); they are never contracted.
    """
    e = _prep(edges).localCheckpoint()
    for _ in range(max_iters):
        inc = e.select(
            F.col("edge_id").alias("eid"), F.col("u").alias("node"), F.col("v").alias("other")
        ).unionByName(
            e.select(
                F.col("edge_id").alias("eid"), F.col("v").alias("node"), F.col("u").alias("other")
            )
        )
        cand = (
            inc.groupBy("node")
            .agg(
                F.count(F.lit(1)).alias("deg"),
                F.min("eid").alias("e1"),
                F.max("eid").alias("e2"),
                F.min_by("other", F.struct("eid", "other")).alias("a"),
                F.max_by("other", F.struct("eid", "other")).alias("b"),
            )
            .filter(
                (F.col("deg") == 2)
                & (F.col("e1") != F.col("e2"))
                & (F.col("a") != F.col("b"))
                & (F.col("a") != F.col("node"))
                & (F.col("b") != F.col("node"))
            )
        )
        if protected is not None:
            cand = cand.join(
                protected.select(F.col("osmid").alias("node")), "node", "left_anti"
            )
        # independent set by HASHED priority local minimum: raw ids would
        # contract one node per round on an ascending chain (O(n) rounds);
        # xxhash64 priorities keep an expected constant fraction per round
        # (O(log n) rounds), still fully deterministic
        pri = F.xxhash64(F.col("node"))
        nbrs = cand.select(
            F.col("node"), pri.alias("__p"), F.explode(F.array("a", "b")).alias("nb")
        )
        conflict = (
            nbrs.join(
                cand.select(
                    F.col("node").alias("nb"),
                    F.xxhash64(F.col("node")).alias("__nbp"),
                    F.col("node").alias("__nbid"),
                ),
                "nb",
            )
            .filter(
                (F.col("__nbp") < F.col("__p"))
                | ((F.col("__nbp") == F.col("__p")) & (F.col("__nbid") < F.col("node")))
            )
            .select("node")
            .distinct()
        )
        keep = cand.join(conflict, "node", "left_anti").localCheckpoint()
        n_keep = keep.count()
        if n_keep == 0:
            break

        halves = keep.select(
            "node", "a", "b",
            F.explode(
                F.array(
                    F.struct(F.col("e1").alias("eid"), F.lit(0).alias("pos")),
                    F.struct(F.col("e2").alias("eid"), F.lit(1).alias("pos")),
                )
            ).alias("h"),
        ).select("node", "a", "b", F.col("h.eid").alias("eid"), F.col("h.pos").alias("pos"))
        joined = halves.join(e.withColumnRenamed("edge_id", "eid"), "eid")
        # orient each half outward->inward: half 0 runs a -> node, half 1
        # runs node -> b (edge geometry is stored u -> v)
        want_from = F.when(F.col("pos") == 0, F.col("a")).otherwise(F.col("node"))
        oriented = joined.withColumn(
            "geom_o",
            F.when(F.col("u") == want_from, F.col("geometry")).otherwise(
                F.reverse(F.col("geometry"))
            ),
        )
        merged = (
            oriented.groupBy("node")
            .agg(
                F.min("eid").alias("edge_id"),
                F.first("a").alias("u"),  # constant per group
                F.first("b").alias("v"),
                F.sum("length").alias("length"),
                # half 0 geometry ++ half 1 geometry minus the shared vertex
                F.min_by("geom_o", "pos").alias("__g0"),
                F.max_by("geom_o", "pos").alias("__g1"),
                F.array_sort(
                    F.array_distinct(F.flatten(F.collect_list("merged_ids")))
                ).alias("merged_ids"),
            )
            .withColumn(
                "geometry",
                F.concat(F.col("__g0"), F.slice(F.col("__g1"), 2, 1_000_000)),
            )
            .select(*_EDGE_COLS)
        )
        gone = halves.select("eid").distinct()
        e = (
            e.join(gone.withColumnRenamed("eid", "edge_id"), "edge_id", "left_anti")
            .unionByName(merged)
            .localCheckpoint()
        )
    return e
