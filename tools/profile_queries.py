"""Per-query cost decomposition for the optimization round.

For each named query (default: every bench row), measures separately:
  t_build  — wall of ``q.spark(spark, sf_dir)`` alone: Python/driver
             expression construction PLUS any collect/count actions the
             builder runs (train samples, centroid fits, drain rounds).
  t_exec   — wall of the noop sink on the returned frame (guide §1.4),
             i.e. the distributed part the plan fingerprints describe.
  reps     — bench.py rebuilds the frame every rep, so build cost is
             paid per rep; profiling them apart shows which side to
             optimize (guide §1.2: algorithm vs per-task vs config).

Prints one JSON line per query (append-friendly) and a sorted summary.

Usage: python tools/profile_queries.py [--sf DIR] [--reps N] [name ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    args = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = 2
    if "--sf" in args:
        i = args.index("--sf")
        sf_dir = args[i + 1]
        del args[i : i + 2]
    if "--reps" in args:
        i = args.index("--reps")
        reps = int(args[i + 1])
        del args[i : i + 2]
    names = args

    from go_nonrat_annotation_pipeline_spark.plans.registry import all_queries
    from go_nonrat_annotation_pipeline_spark.session import get_spark

    spark = get_spark("profile")
    registry = all_queries()
    if not names:
        import bench

        names = [n for n in bench.HEADLINE + bench.EXTENDED if n in registry]

    # warm the JVM + parquet footers (not part of any measurement)
    registry["q1_pricing_summary"].spark(spark, sf_dir).write.format(
        "noop"
    ).mode("overwrite").save()

    rows = []
    for name in names:
        q = registry.get(name)
        if q is None:
            continue
        builds, execs = [], []
        for _ in range(reps):
            spark.sparkContext.setJobDescription(f"profile:{name}")
            t0 = time.perf_counter()
            df = q.spark(spark, sf_dir)
            t1 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            builds.append(t1 - t0)
            execs.append(t2 - t1)
            spark.sparkContext.setJobDescription(None)
        rec = {
            "q": name,
            "build": [round(x, 3) for x in builds],
            "exec": [round(x, 3) for x in execs],
            "best_total": round(min(b + e for b, e in zip(builds, execs)), 3),
        }
        rows.append(rec)
        print(json.dumps(rec), flush=True)

    rows.sort(key=lambda r: -r["best_total"])
    print("\n== sorted by best(build+exec) ==")
    for r in rows:
        print(
            f"{r['best_total']:8.3f}  build={min(r['build']):7.3f}"
            f"  exec={min(r['exec']):7.3f}  {r['q']}"
        )
    print(f"total(best): {round(sum(r['best_total'] for r in rows), 3)}")


if __name__ == "__main__":
    main()
