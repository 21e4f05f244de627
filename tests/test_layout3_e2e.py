"""Real write→read→skip E2E for the d=3 Hilbert layout: drive
hilbert_nd.layout_by_hilbert through an actual parquet write, read the
REAL per-file min/max footers back (pyarrow — the statistics Spark's
reader consults), and assert the pruning ordering the registered model
query (plans/queries_layout3_e2e.corpus_layout3_e2e) predicts:
hilbert reads fewer files than natural order, and the model's NTILE
file assignment agrees with the real repartitionByRange write on the
headline."""

from __future__ import annotations

import os

import pytest

from pyspark.sql import functions as F

from go_nonrat_annotation_pipeline_spark.operators.hilbert_nd import (
    layout_by_hilbert,
)

BITS = 6
N_FILES = 16
BOXES = [  # per-dim (lo, hi) on the 64x64x64 grid
    ((0, 15), (0, 15), (0, 15)),
    ((24, 39), (24, 39), (24, 39)),
    ((48, 63), (0, 23), (32, 47)),
    ((16, 23), (16, 23), (16, 23)),
]


def _file_envelopes(path, cols=("x", "y", "z")):
    import pyarrow.parquet as pq

    out = []
    for f in sorted(os.listdir(path)):
        if not f.endswith(".parquet"):
            continue
        md = pq.read_metadata(os.path.join(path, f))
        if md.num_rows == 0:
            continue
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


def _reads(envs, box):
    return sum(
        1
        for env in envs
        if all(
            not (env[i][1] < lo or env[i][0] > hi)
            for i, (lo, hi) in enumerate(box)
        )
    )


@pytest.fixture()
def dims(spark):
    li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
    return li.select(
        (F.col("l_partkey") % 64).cast("long").alias("x"),
        (F.col("l_suppkey") % 64).cast("long").alias("y"),
        (F.col("l_orderkey") % 64).cast("long").alias("z"),
    )


def test_layout3_real_footers_prune(spark, dims, tmp_path):
    h_path = str(tmp_path / "hilbert")
    n_path = str(tmp_path / "natural")
    layout_by_hilbert(dims, ["x", "y", "z"], N_FILES, bits=BITS).write.mode(
        "overwrite"
    ).parquet(h_path)
    dims.repartition(N_FILES).write.mode("overwrite").parquet(n_path)

    eh = _file_envelopes(h_path)
    en = _file_envelopes(n_path)
    assert 0 < len(eh) <= N_FILES and len(en) > 0
    rh = [_reads(eh, b) for b in BOXES]
    rn = [_reads(en, b) for b in BOXES]
    # natural/hash order has no locality: every box touches every file
    assert all(r == len(en) for r in rn)
    # the Hilbert layout prunes: strictly fewer file reads in total,
    # and per-box never worse
    frac_h = sum(rh) / (len(BOXES) * len(eh))
    frac_n = sum(rn) / (len(BOXES) * len(en))
    assert frac_h < 0.6 * frac_n, (rh, rn)


def test_layout3_model_matches_real_write_headline(spark, dims, tmp_path):
    """The registered query's NTILE file model and the real
    repartitionByRange write must agree on the pruning headline:
    mean files-read fraction within a few files of each other."""
    from go_nonrat_annotation_pipeline_spark.operators.hilbert_nd import (
        with_hilbert_key_nd,
    )
    from pyspark.sql.window import Window

    h_path = str(tmp_path / "hilbert")
    layout_by_hilbert(dims, ["x", "y", "z"], N_FILES, bits=BITS).write.mode(
        "overwrite"
    ).parquet(h_path)
    real = _file_envelopes(h_path)

    keyed = with_hilbert_key_nd(dims, ["x", "y", "z"], BITS)
    model_rows = (
        keyed.select(
            "x", "y", "z",
            F.ntile(N_FILES).over(Window.orderBy("hkey", "x", "y", "z")).alias("f"),
        )
        .groupBy("f")
        .agg(
            F.min("x").alias("x0"), F.max("x").alias("x1"),
            F.min("y").alias("y0"), F.max("y").alias("y1"),
            F.min("z").alias("z0"), F.max("z").alias("z1"),
        )
        .collect()
    )
    model = [
        ((r.x0, r.x1), (r.y0, r.y1), (r.z0, r.z1)) for r in model_rows
    ]
    rr = sum(_reads(real, b) for b in BOXES) / (len(BOXES) * len(real))
    rm = sum(_reads(model, b) for b in BOXES) / (len(BOXES) * len(model))
    assert abs(rr - rm) < 0.15, (rr, rm)
