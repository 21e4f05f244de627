"""Time one registered query at a given sf dir with the noop sink,
best-of-N (default 3), fresh session. Usage:
    python tools/time_one.py <sf_dir> <name> [reps]
Prints one line: <name> <best> <all reps> and the bench fingerprint.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from go_nonrat_annotation_pipeline_spark.plans.registry import all_queries
from go_nonrat_annotation_pipeline_spark.session import get_spark


def main():
    sf_dir = sys.argv[1]
    name = sys.argv[2]
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    spark = get_spark("time_one")
    q = all_queries()[name]
    # warm: parquet footers + JIT (not timed), on a cheap query
    all_queries()["q1_pricing_summary"].spark(spark, sf_dir).write.format(
        "noop"
    ).mode("overwrite").save()
    walls = []
    for _ in range(reps):
        spark.sparkContext.setJobDescription(f"time_one: {name}")
        t0 = time.perf_counter()
        df = q.spark(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        walls.append(round(time.perf_counter() - t0, 3))
    p = spark._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    fp = (
        f"x{p.count(') Exchange')}"
        f"-b{p.count('BroadcastHashJoin')}"
        f"-s{p.count('SortMergeJoin')}"
        f"-py{p.count('EvalPython') + p.count('MapInPandas')}"
    )
    print(f"{name} best={min(walls)} reps={walls} fp={fp}")


if __name__ == "__main__":
    main()
