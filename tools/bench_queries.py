"""Per-query isolation bench + plan capture for the optimization round.

NOT the frozen driver bench (bench.py). Usage:

    python tools/bench_queries.py [--sf DIR] [--reps N] [--plans OUTDIR] \
        [--tag before|after] [query ...]

For each headline query (or the names given): warm once at sf0.001,
then time `reps` noop-sink materializations at the target SF and report
min/median; optionally write .explain("formatted") to
plans/r06/<query>_<tag>.txt.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from edgar_crawler_spark.catalog import CATALOG  # noqa: E402
from edgar_crawler_spark.session import get_spark  # noqa: E402

HEADLINE = [
    "flagship_frontier_pipeline",
    "a5_agg_summary",
    "j2_anti_join_dedup",
    "a6_argmax_per_group",
    "a3_per_host_rank",
    "dedup_exact",
    "dedup_minhash_lsh_pairs",
    "dedup_simhash",
    "ann_bruteforce_topk",
    "ann_lsh_topk",
    "text_quality_score",
    "text_fingerprint",
    "ev_sessionize",
    "ev_tumbling_hourly",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0"))
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--plans", default=None, help="dir to write explain(formatted) files")
    ap.add_argument("--tag", default="before")
    ap.add_argument("queries", nargs="*", default=None)
    args = ap.parse_args()
    names = args.queries or HEADLINE

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(
        app_name="bench-queries-r06",
        master=f"local[{cpus}]",
        shuffle_partitions=max(cpus, 8),
    )
    if args.plans:
        os.makedirs(args.plans, exist_ok=True)

    for name in names:  # codegen/shuffle-service warmup
        CATALOG[name][0](spark, "/root/testdata/sf0.001").write.format("noop").mode(
            "overwrite"
        ).save()

    out = {}
    for name in names:
        fn = CATALOG[name][0]
        if args.plans:
            df = fn(spark, args.sf)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(os.path.join(args.plans, f"{name}_{args.tag}.txt"), "w") as f:
                f.write(plan)
        ts = []
        for _ in range(args.reps):
            spark.sparkContext.setJobDescription(f"{name}")
            t0 = time.time()
            fn(spark, args.sf).write.format("noop").mode("overwrite").save()
            ts.append(round(time.time() - t0, 3))
        out[name] = {"min": min(ts), "med": sorted(ts)[len(ts) // 2], "all": ts}
        print(name, out[name], flush=True)
    total_med = round(sum(v["med"] for v in out.values()), 3)
    total_min = round(sum(v["min"] for v in out.values()), 3)
    print(json.dumps({"sf": args.sf, "total_med": total_med, "total_min": total_min}))
    spark.stop()


if __name__ == "__main__":
    main()
