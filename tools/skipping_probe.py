"""File-skipping probe: does curve-ordered layout actually prune files?

Writes the same table three ways (natural order, Z-order, Hilbert),
splits each into ~uniform parquet files, then evaluates 2-D box
predicates purely against per-file min/max column statistics (pyarrow
footer metadata — exactly what Spark's parquet reader and every
lakehouse file-skipping index consult). A file is HIT when its
[min,max] envelope on BOTH grid columns intersects the box; fewer hits
= more files skipped at scan time.

This closes the loop on q_hilbert_locality: the grid-walk number is
the mechanism, this probe is the outcome (files actually skipped).

Usage: python tools/skipping_probe.py [rows_per_file]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from go_nonrat_annotation_pipeline_spark.operators import layout as L  # noqa: E402
from go_nonrat_annotation_pipeline_spark.operators.hilbert import (  # noqa: E402
    with_hilbert_key,
)
from go_nonrat_annotation_pipeline_spark.session import get_spark  # noqa: E402
from go_nonrat_annotation_pipeline_spark.sources.testdata import load_table  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

BOXES = [  # (x0, x1, y0, y1) on the 256×256 grid
    (0, 31, 0, 31),
    (100, 131, 100, 131),
    (200, 255, 0, 55),
    (64, 79, 64, 79),
]


def _file_stats(path: str):
    import pyarrow.parquet as pq

    out = []
    for f in sorted(os.listdir(path)):
        if not f.endswith(".parquet"):
            continue
        md = pq.read_metadata(os.path.join(path, f))
        mins = {"px": None, "py": None}
        maxs = {"px": None, "py": None}
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            for ci in range(g.num_columns):
                c = g.column(ci)
                name = c.path_in_schema
                if name in mins and c.statistics is not None:
                    lo, hi = c.statistics.min, c.statistics.max
                    mins[name] = lo if mins[name] is None else min(mins[name], lo)
                    maxs[name] = hi if maxs[name] is None else max(maxs[name], hi)
        out.append((mins["px"], maxs["px"], mins["py"], maxs["py"]))
    return out


def main():
    rows_per_file = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    spark = get_spark("skipping_probe")
    spark.sparkContext.setLogLevel("ERROR")
    li = load_table(spark, SF_DIR, "lineitem").select(
        (F.col("l_partkey") % 256).cast("long").alias("px"),
        (F.col("l_suppkey") % 256).cast("long").alias("py"),
        "l_orderkey",
    )
    n = li.count()
    keyed = with_hilbert_key(li, "px", "py").withColumn(
        "zval", L.z_value(F.col("px"), F.col("py"), 8)
    )
    root = tempfile.mkdtemp(prefix="skip_probe_")
    layouts = {
        "natural": keyed.orderBy("l_orderkey"),
        "zorder": keyed.orderBy("zval", "l_orderkey"),
        "hilbert": keyed.orderBy("hkey", "l_orderkey"),
    }
    try:
        print(f"rows={n:,} rows_per_file={rows_per_file:,}")
        for name, df in layouts.items():
            path = os.path.join(root, name)
            (
                df.select("px", "py")
                .coalesce(1)  # one writer task → file splits follow the sort
                .write.option("maxRecordsPerFile", rows_per_file)
                .mode("overwrite")
                .parquet(path)
            )
            stats = _file_stats(path)
            total = len(stats)
            hits_per_box = []
            for (x0, x1, y0, y1) in BOXES:
                hits = sum(
                    1
                    for (pxl, pxh, pyl, pyh) in stats
                    if not (pxh < x0 or pxl > x1 or pyh < y0 or pyl > y1)
                )
                hits_per_box.append(hits)
            print(
                f"{name:<8} files={total:3d}  box-hits={hits_per_box}  "
                f"mean-hit-frac="
                f"{sum(hits_per_box) / (len(BOXES) * total):.2f}"
            )
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
