#!/usr/bin/env python
"""Round-12 optimization profiler (guide §1: measure first).

For each named query: time DataFrame *construction* (catalog + planning,
py4j round-trips) separately from *execution* (noop sink — computes every
column of every row, guide §1.4), capture `.explain("formatted")` into
plans/r12/<name>_<tag>.txt, and count plan features (Exchange nodes, join
strategies, Python-eval nodes, scans).

Usage:
    python scripts/profile_r12.py --tag before --names q1_pricing_summary,...
    python scripts/profile_r12.py --tag before --top-bench   # the 77 headliners
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

PLANS_DIR = os.path.join(REPO, "plans", "r12")


def plan_features(plan: str) -> dict:
    def n(pat: str) -> int:
        return len(re.findall(pat, plan))

    return {
        "exchange": n(r"\bExchange (?:hash|range|Single|rangepartitioning)"),
        "exchange_all": n(r"\bExchange\b"),
        "bhj": n(r"\bBroadcastHashJoin\b"),
        "smj": n(r"\bSortMergeJoin\b"),
        "shj": n(r"\bShuffledHashJoin\b"),
        "bnlj": n(r"\bBroadcastNestedLoopJoin\b"),
        "cartesian": n(r"\bCartesianProduct\b"),
        "python": n(r"\b(?:BatchEvalPython|ArrowEvalPython|MapInArrow|MapInPandas|FlatMapGroupsInPandas|AggregateInPandas)\b"),
        "scan": n(r"\bScan parquet\b") + n(r"\bScan csv\b") + n(r"\bScan orc\b"),
        "sort": n(r"\bSort \["),
        "window": n(r"\bWindow \[|\bRunningWindowFunction\b|\bWindowExec\b"),
        "wsc": n(r"\bWholeStageCodegen"),
        "expand": n(r"\bExpand\b"),
        "agg": n(r"\bHashAggregate\b") + n(r"\bSortAggregate\b") + n(r"\bObjectHashAggregate\b"),
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--names", default=None)
    ap.add_argument("--top-bench", action="store_true")
    ap.add_argument("--tag", default="before")
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--no-plan-file", action="store_true")
    ap.add_argument("--out", default=None, help="JSON summary path")
    args = ap.parse_args()

    from hive_apache_ci_spark.registry import all_queries
    from hive_apache_ci_spark.session import get_spark

    queries = all_queries()
    if args.top_bench:
        import bench
        names = [*bench.BASELINE_COMPARABLE, *bench.EXTRA_HEADLINERS]
    else:
        names = [n.strip() for n in args.names.split(",") if n.strip()]

    spark = get_spark("profile-r12")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(PLANS_DIR, exist_ok=True)

    # warm the JVM/codegen paths once so query 1 isn't charged JIT cost
    spark.range(0, 1_000_000, 1, 8).selectExpr("sum(xxhash64(id)) s").collect()

    results = {}
    for name in names:
        fn = queries[name]
        spark.sparkContext.setJobDescription(f"profile:{name}")
        try:
            t0 = time.perf_counter()
            df = fn(spark, args.sf_dir)
            t_build = time.perf_counter() - t0
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            if not args.no_plan_file:
                with open(os.path.join(PLANS_DIR, f"{name}_{args.tag}.txt"), "w") as fh:
                    fh.write(plan)
            feats = plan_features(plan)
            # cold run (plan + exec), then warm best-of-N via noop sink
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t_cold = time.perf_counter() - t0
            warm = []
            for _ in range(args.reps):
                df2 = fn(spark, args.sf_dir)
                t0 = time.perf_counter()
                df2.write.format("noop").mode("overwrite").save()
                warm.append(time.perf_counter() - t0)
            # rebuild-per-rep matches bench methodology (fn() inside the
            # timed loop there); construction timed separately above.
            results[name] = {
                "build_s": round(t_build, 4),
                "cold_s": round(t_cold, 4),
                "warm_s": round(min(warm), 4),
                **feats,
            }
            print(
                f"{name:42s} build={t_build:6.3f} cold={t_cold:6.3f} "
                f"warm={min(warm):6.3f} exch={feats['exchange_all']:2d} "
                f"bhj={feats['bhj']} smj={feats['smj']} py={feats['python']} "
                f"scan={feats['scan']}",
                flush=True,
            )
        except Exception as exc:  # noqa: BLE001
            results[name] = {"error": str(exc)[:300]}
            print(f"{name:42s} FAILED: {exc}", flush=True)
        finally:
            spark.sparkContext.setJobDescription(None)

    if args.out:
        with open(args.out, "w") as fh:
            json.dump({"sf_dir": args.sf_dir, "tag": args.tag, "results": results}, fh, indent=1)
            fh.write("\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
