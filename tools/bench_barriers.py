"""Checkpoint-granularity audit of the simplification pipeline
(VERDICT r2 #4).

At ~4k input edges the flagship run schedules ~1,850 Spark stages --
mostly per-operator localCheckpoint barriers, i.e. scheduling overhead
that is constant in data size but costs a cluster round-trip per stage
at real driver-executor latencies. This tool measures wall time and
completed-stage count for the current per-operator granularity vs the
four natural phase boundaries (pipeline.PHASE_BARRIERS), at city scales
4 and 16, asserting the outputs stay identical (same determinism
boundary as tests/test_pipeline.py: all columns except the assembled
geometry arrays, which the 1-vs-8-partition test also excludes).

Usage: PYTHONPATH=/root/repo python tools/bench_barriers.py [scale ...]
Prints one JSON line per (scale, mode) plus a summary.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from osmnetfusion_spark import synth  # noqa: E402
from osmnetfusion_spark.plans import pipeline  # noqa: E402
from osmnetfusion_spark.session import get_session  # noqa: E402


def n_completed_stages(spark) -> int:
    """Stages created so far (DAGScheduler's id counter; the session runs
    with spark.ui.enabled=false so the REST status API is unavailable).
    Counts scheduled stages -- exactly the per-barrier round-trip cost the
    audit is about."""
    return int(spark.sparkContext._jsc.sc().dagScheduler().nextStageId())


def out_key(edges) -> str:
    import hashlib

    rows = sorted(map(str, edges.drop("g_geo_rea", "g_geo_lin").collect()))
    h = hashlib.sha256()
    for ln in rows:
        h.update(ln.encode())
    return h.hexdigest()[:16]


def main() -> None:
    scales = [int(a) for a in sys.argv[1:]] or [4, 16]
    spark = get_session(app_name="barrier-audit")
    spark.sparkContext.setLogLevel("ERROR")

    # warm-up: JVM JIT + Python worker fork, same paths as the timed runs
    tw = {k: v.localCheckpoint() for k, v in synth.city_to_spark(spark, synth.synthetic_city(1)).items()}
    for v in tw.values():
        v.count()
    pipeline.run_full(spark, tw)[1].count()

    summary = []
    for scale in scales:
        tables = {
            k: v.localCheckpoint()
            for k, v in synth.city_to_spark(spark, synth.synthetic_city(scale)).items()
        }
        n_in = tables["edges"].count()
        results = {}
        for mode in ("operator", "phase"):
            best, best_stages, key = float("inf"), None, None
            for _ in range(2):  # min-of-2: noisy host
                s0 = n_completed_stages(spark)
                t0 = time.time()
                _n, edges = pipeline.run_full(spark, tables, barriers=mode)
                k = out_key(edges)
                sec = time.time() - t0
                stages = n_completed_stages(spark) - s0
                if sec < best:
                    best, best_stages = sec, stages
                assert key is None or key == k, "nondeterministic across repeats!"
                key = k
            results[mode] = {"sec": round(best, 2), "stages": best_stages, "key": key}
            print(json.dumps({"scale": scale, "mode": mode, "input_edges": n_in, **results[mode]}))
        assert results["operator"]["key"] == results["phase"]["key"], (
            f"scale {scale}: phase barriers changed the output!"
        )
        summary.append(
            {
                "scale": scale,
                "input_edges": n_in,
                "sec_operator": results["operator"]["sec"],
                "sec_phase": results["phase"]["sec"],
                "stages_operator": results["operator"]["stages"],
                "stages_phase": results["phase"]["stages"],
                "identical_output": True,
            }
        )
    print(json.dumps({"summary": summary}))
    spark.stop()


if __name__ == "__main__":
    main()
