"""Benchmark driver: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:

    {"metric": ..., "value": <total sec>, "unit": "sec",
     "queries": {name: sec, ...}, "sf": <sf>, ...extras}

Headline = the graft flagship (synthetic city -> full simplification ->
snap deduped pages onto the *simplified* edges -> per-tile edge
assignments; throughput in rows/sec per BASELINE.json) plus representative
operator queries from the driver contract on the sf-dir tables.

Scaling evidence (N vs 4N cores) is produced by tools/bench_scaling.py and
reported in BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from osmnetfusion_spark import driver_contract as DC  # noqa: E402
from osmnetfusion_spark import synth  # noqa: E402
from osmnetfusion_spark.operators import spatial  # noqa: E402
from osmnetfusion_spark.plans import pages as PG  # noqa: E402
from osmnetfusion_spark.plans import pipeline, tiles  # noqa: E402
from osmnetfusion_spark.session import get_session  # noqa: E402

# time EVERY contract query (round-over-round per-operator regression
# visibility); `value` therefore covers the full vector from round 2 on --
# compare rounds on `flagship_sec`/throughput and shared per-query entries,
# not on `value` vs rounds that timed an 11-query subset
CONTRACT_QUERIES = "ALL"


def sf_of(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return 0.1


def city_scale_of(sf: float) -> int:
    return {0.001: 1, 0.01: 2}.get(sf, 4)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_of(sf_dir)
    scale = city_scale_of(sf)
    n_pages = max(int(1_000_000 * sf), 1_000)

    spark = get_session(app_name="osmnetfusion-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warm up executor threads + Python UDF workers (JVM JIT, worker fork,
    # pandas/numpy import) so timings reflect steady-state throughput --
    # on a real cluster this cost amortizes over hours-long jobs. A scale-1
    # mini pipeline exercises the same operators/codegen paths the timed
    # flagship runs.
    warm = spark.range(0, 1 << 16, 1, 32)
    warm.mapInPandas(lambda it: it, "id long").groupBy((F.col("id") % 97).alias("k")).count().count()
    _wn, _we = pipeline.run_full(spark, synth.city_to_spark(spark, synth.synthetic_city(1)))
    _we.count()

    queries: dict[str, float] = {}
    extras: dict[str, float] = {}

    # ---- flagship: simplify -> page snap -> tile assignment
    # min-of-2 end-to-end passes: the sandbox VM shares a hypervisor host
    # and identical code varies 1.5-3x run-to-run with neighbor load; the
    # min reflects the engine, not the neighbors
    # inputs materialized OUTSIDE the timed sections: in production the
    # city tables and page corpus are tables on disk, not driver-side
    # pandas synthesis + Arrow upload
    city = synth.synthetic_city(scale)
    tables = {k: v.localCheckpoint() for k, v in synth.city_to_spark(spark, city).items()}
    for v in tables.values():
        v.count()
    pages_raw = synth.pages(spark, n_pages, city_scale=scale).localCheckpoint()
    pages_raw.count()
    snaps_tbl = synth.license_snapshots(spark).localCheckpoint()
    snaps_tbl.count()

    times: dict[str, list[float]] = {
        "simplify_full": [], "page_snap": [], "tile_assignment": []}
    for _ in range(2):
        t0 = time.time()
        final_nodes, final_edges = pipeline.run_full(spark, tables)
        n_edges = final_edges.count()
        times["simplify_full"].append(time.time() - t0)

        t0 = time.time()
        # dedupe -> license as-of (temporal enrichment, VERDICT r4 #8) -> snap
        pg = PG.attach_license_asof(
            PG.dedupe_latest(pages_raw), snaps_tbl
        ).drop("lic_snap_ts_matched")
        segs = spatial.explode_segments(
            final_edges.select(F.col("g_id").alias("edge_id"), F.col("g_geo_rea").alias("geometry"))
        ).select("edge_id", "seg_idx", "ax", "ay", "bx", "by").localCheckpoint()
        snap = PG.snap_pages_to_edges(pg, segs, radius_m=200.0).localCheckpoint()
        n_snapped = snap.count()
        times["page_snap"].append(time.time() - t0)

        t0 = time.time()
        ted = tiles.tile_edge_density(snap, pg, segs)
        n_tiles = ted.count()
        times["tile_assignment"].append(time.time() - t0)
    noise: dict[str, float] = {}
    for k, v in times.items():
        queries[k] = round(min(v), 3)
        noise[k] = round(max(v) / max(min(v), 1e-9), 2)

    # ---- scale-16 flagship: the large-input regime where throughput
    # regressions actually show (scale 4 is scheduling-overhead bound);
    # single pass, inputs materialized outside the timed section.
    # SPARK_GRAFT_BENCH_SCALE16=0 opts out.
    scale16 = int(os.environ.get("SPARK_GRAFT_BENCH_SCALE16", "16"))
    if scale16:
        city16 = synth.synthetic_city(scale16)
        n_in16 = len(city16["edges"])
        t16 = {k: v.localCheckpoint() for k, v in synth.city_to_spark(spark, city16).items()}
        for v in t16.values():
            v.count()
        # min-of-3 (was min-of-2): the r4 driver window recorded 111 s
        # with noise 1.01 -- i.e. BOTH passes slow, so the min never saw
        # a quiet slot even though the same commit ran 81.5 s in a quiet
        # builder window. A third pass widens the odds of catching one;
        # the full runs list is recorded for root-cause visibility.
        runs16 = []
        n_out16 = None
        for _ in range(3):
            t0 = time.time()
            _n16, e16 = pipeline.run_full(spark, t16)
            n_out = e16.count()
            assert n_out16 is None or n_out == n_out16
            n_out16 = n_out
            runs16.append(time.time() - t0)
        sec16 = min(runs16)
        extras["pipeline_scale16_sec"] = round(sec16, 3)
        extras["pipeline_scale16_input_edges"] = n_in16
        extras["pipeline_scale16_output_edges"] = n_out16
        extras["pipeline_scale16_input_edges_per_sec"] = round(n_in16 / max(sec16, 1e-9), 1)
        extras["pipeline_scale16_noise_ratio"] = round(max(runs16) / max(sec16, 1e-9), 2)
        extras["pipeline_scale16_runs"] = [round(r, 1) for r in runs16]

    # ---- representative operator queries on the driver tables
    # Quiet-window protocol (VERDICT r2 #5): the sandbox VM shares a
    # hypervisor host and identical code varies up to ~8x run-to-run
    # (measured: q_ann_topk 0.96 s vs 7.6 s). Per query: one untimed
    # warm-up action (plan compile + codegen), then min-of-3 timed runs;
    # noise_ratio = max/min of the timed runs, so a noisy window is
    # self-documenting in the round record.
    qs = {name: fn for name, (fn, _sql) in DC.QUERIES.items()}
    names = list(qs) if CONTRACT_QUERIES == "ALL" else CONTRACT_QUERIES
    for name in names:
        qs[name](spark, sf_dir).count()  # warm-up, untimed
        runs = []
        for _ in range(3):
            t0 = time.time()
            qs[name](spark, sf_dir).count()
            runs.append(time.time() - t0)
        queries[name] = round(min(runs), 3)
        noise[name] = round(max(runs) / max(min(runs), 1e-9), 2)

    # total = sum of per-query best times (the measured work), not the
    # harness wall clock -- with min-of-2 repeats the wall includes the
    # noisy discarded passes
    total = round(sum(queries.values()), 3)
    flagship_rows = n_edges + n_snapped + n_tiles
    flagship_sec = queries["simplify_full"] + queries["page_snap"] + queries["tile_assignment"]
    # The driver keeps only the TAIL of stdout (VERDICT r4 #4: r04's
    # flagship fields were truncated away behind the 74-entry dicts), so
    # the big per-query dicts print FIRST inside the full record and the
    # headline scalars LAST -- and a compact headline-only JSON line is
    # printed at the very end so the tail always parses on its own.
    headline = {
        "metric": "simplified-edges+tile-assignments e2e",
        "value": total,
        "unit": "sec",
        "sf": sf,
        "n_contract_queries": len(names),
        "contract_sec": round(total - flagship_sec, 3),
        "n_pages": n_pages,
        "n_simplified_edges": n_edges,
        "n_snapped_pages": n_snapped,
        "n_tile_edge_rows": n_tiles,
        "cpus": os.environ.get("SPARK_GRAFT_CPUS", "32"),
        **extras,
        "flagship_rows": flagship_rows,
        "flagship_sec": round(flagship_sec, 3),
        "flagship_throughput_rows_per_sec": round(flagship_rows / max(flagship_sec, 1e-9), 1),
    }
    print(json.dumps({"queries": queries, "noise_ratio": noise, **headline}))
    print(json.dumps(headline))
    spark.stop()


if __name__ == "__main__":
    main()
