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

Usage: python tools/skipping_probe.py [rows_per_file] [--3d]

``--3d`` runs the d=3 variant instead (3-D boxes on a 64³ grid;
Hilbert key from the Skilling transform, baseline a 3-ary Morton
interleave) — the probe row VERDICT r7 #6 asked for.
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


def _file_stats(path: str, cols=("px", "py")):
    import pyarrow.parquet as pq

    out = []
    for f in sorted(os.listdir(path)):
        if not f.endswith(".parquet"):
            continue
        md = pq.read_metadata(os.path.join(path, f))
        mins = {c: None for c in cols}
        maxs = {c: None for c in cols}
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            for ci in range(g.num_columns):
                c = g.column(ci)
                name = c.path_in_schema
                if name in mins and c.statistics is not None:
                    lo, hi = c.statistics.min, c.statistics.max
                    mins[name] = lo if mins[name] is None else min(mins[name], lo)
                    maxs[name] = hi if maxs[name] is None else max(maxs[name], hi)
        out.append(tuple((mins[c], maxs[c]) for c in cols))
    return out


def _probe_layouts(layouts, cols, boxes, rows_per_file, n_rows):
    """Write each layout, evaluate box predicates against per-file
    min/max stats, print hit fractions. ``boxes`` are per-column
    (lo, hi) tuples matching ``cols``."""
    root = tempfile.mkdtemp(prefix="skip_probe_")
    try:
        print(f"rows={n_rows:,} rows_per_file={rows_per_file:,} dims={cols}")
        for name, df in layouts.items():
            path = os.path.join(root, name)
            (
                df.select(*cols)
                .coalesce(1)  # one writer task → file splits follow the sort
                .write.option("maxRecordsPerFile", rows_per_file)
                .mode("overwrite")
                .parquet(path)
            )
            stats = _file_stats(path, cols)
            total = len(stats)
            hits_per_box = []
            for box in boxes:
                hits = sum(
                    1
                    for env in stats
                    if all(
                        not (env[i][1] < lo or env[i][0] > hi)
                        for i, (lo, hi) in enumerate(box)
                    )
                )
                hits_per_box.append(hits)
            print(
                f"{name:<8} files={total:3d}  box-hits={hits_per_box}  "
                f"mean-hit-frac="
                f"{sum(hits_per_box) / (len(boxes) * total):.2f}"
            )
    finally:
        shutil.rmtree(root, ignore_errors=True)


BOXES_3D = [  # per-dim (lo, hi) on the 64×64×64 grid
    ((0, 15), (0, 15), (0, 15)),
    ((24, 39), (24, 39), (24, 39)),
    ((48, 63), (0, 23), (32, 47)),
    ((16, 23), (16, 23), (16, 23)),
]


def main_3d(rows_per_file: int):
    from go_nonrat_annotation_pipeline_spark.operators.hilbert_nd import (
        with_hilbert_key_nd,
        z_value_nd,
    )

    spark = get_spark("skipping_probe_3d")
    spark.sparkContext.setLogLevel("ERROR")
    li = load_table(spark, SF_DIR, "lineitem").select(
        (F.col("l_partkey") % 64).cast("long").alias("px"),
        (F.col("l_suppkey") % 64).cast("long").alias("py"),
        (F.col("l_orderkey") % 64).cast("long").alias("pz"),
        "l_orderkey",
    )
    n = li.count()
    keyed = with_hilbert_key_nd(li, ["px", "py", "pz"], bits=6).withColumn(
        "zval",
        z_value_nd([F.col("px"), F.col("py"), F.col("pz")], bits=6),
    )
    layouts = {
        "natural": keyed.orderBy("l_orderkey"),
        "zorder3": keyed.orderBy("zval", "l_orderkey"),
        "hilbert3": keyed.orderBy("hkey", "l_orderkey"),
    }
    boxes = [tuple(b) for b in BOXES_3D]
    _probe_layouts(layouts, ("px", "py", "pz"), boxes, rows_per_file, n)


def main():
    args = [a for a in sys.argv[1:] if a != "--3d"]
    rows_per_file = int(args[0]) if args else 20_000
    if "--3d" in sys.argv[1:]:
        main_3d(rows_per_file)
        return
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
    layouts = {
        "natural": keyed.orderBy("l_orderkey"),
        "zorder": keyed.orderBy("zval", "l_orderkey"),
        "hilbert": keyed.orderBy("hkey", "l_orderkey"),
    }
    boxes = [((x0, x1), (y0, y1)) for (x0, x1, y0, y1) in BOXES]
    _probe_layouts(layouts, ("px", "py"), boxes, rows_per_file, n)


if __name__ == "__main__":
    main()
