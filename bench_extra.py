"""Per-query measurement harness for the optimization round (guide §1).

NOT the driver bench -- `bench.py` is frozen for measurement. This tool
isolates individual contract queries so optimizations can be measured
before/after without paying for the whole vector:

    python bench_extra.py --sf-dir /root/testdata/sf1.0 q_jaccard_pairs ...
    python bench_extra.py --sf-dir /root/testdata/sf1.0 --plans plans/r06 \
        --suffix before q_overlap_pairs

Methodology mirrors bench.py (one untimed warm-up, min-of-N timed
``.count()`` runs, noise = max/min) and additionally times a noop-sink pass
(``df.write.format("noop")`` -- computes every column, guide §1.4) and can
dump ``.explain("formatted")`` to plans/<dir>/<query>_<suffix>.txt.
"""

from __future__ import annotations

import argparse
import contextlib
import io
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from osmnetfusion_spark import driver_contract as DC  # noqa: E402
from osmnetfusion_spark.session import get_session  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0"))
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--plans", default=None, help="directory for explain dumps")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--noop", action="store_true", help="also time a noop-sink pass")
    ap.add_argument("--plan-only", action="store_true", help="dump plans, skip timing")
    args = ap.parse_args()

    spark = get_session(app_name="osmnetfusion-bench-extra")
    spark.sparkContext.setLogLevel("ERROR")
    # same Python-worker / codegen warmup shape as bench.py
    warm = spark.range(0, 1 << 14, 1, 32)
    warm.mapInPandas(lambda it: it, "id long").groupBy((F.col("id") % 97).alias("k")).count().count()

    out: dict[str, dict] = {}
    for name in args.queries:
        fn = DC.QUERIES[name][0]
        rec: dict = {}
        if not args.plan_only:
            spark.sparkContext.setJobDescription(f"warmup:{name}")
            n_rows = fn(spark, args.sf_dir).count()  # untimed warm-up
            runs = []
            for i in range(args.repeats):
                spark.sparkContext.setJobDescription(f"timed:{name}:{i}")
                t0 = time.time()
                fn(spark, args.sf_dir).count()
                runs.append(time.time() - t0)
            rec = {
                "sec": round(min(runs), 3),
                "noise": round(max(runs) / max(min(runs), 1e-9), 2),
                "rows": n_rows,
            }
        if args.noop and not args.plan_only:
            spark.sparkContext.setJobDescription(f"noop:{name}")
            t0 = time.time()
            fn(spark, args.sf_dir).write.format("noop").mode("overwrite").save()
            rec["noop_sec"] = round(time.time() - t0, 3)
        if args.plans:
            os.makedirs(args.plans, exist_ok=True)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                fn(spark, args.sf_dir).explain("formatted")
            with open(os.path.join(args.plans, f"{name}_{args.suffix}.txt"), "w") as f:
                f.write(buf.getvalue())
        out[name] = rec
        print(json.dumps({name: rec}), flush=True)
    print(json.dumps({"sf_dir": args.sf_dir, "results": out}))
    spark.stop()


if __name__ == "__main__":
    main()
