"""Dump .explain('formatted') for named queries to files.

Usage: python tools/dump_plan.py <outdir> <suffix> <query> [query ...]
Writes <outdir>/<query>_<suffix>.txt for each query (sf0.1 by default,
override with SPARK_GRAFT_SF_DIR).
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    outdir, suffix, *names = sys.argv[1:]
    os.makedirs(outdir, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from go_nonrat_annotation_pipeline_spark.plans.registry import all_queries
    from go_nonrat_annotation_pipeline_spark.session import get_spark

    spark = get_spark("dump-plan")
    registry = all_queries()
    for name in names:
        df = registry[name].spark(spark, sf_dir)
        p = spark._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(p)
        print(f"wrote {path} ({len(p)} bytes)")


if __name__ == "__main__":
    main()
