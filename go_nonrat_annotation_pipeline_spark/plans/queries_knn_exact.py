"""Exact top-k cosine join via lossless cell bounds — round-12
module, registered AFTER WINDOW_R12 (leads round 13).

The similarity family's exact members so far answer threshold
questions (exact pairs, exact decontam gate); retrieval wants TOP-K —
"the k nearest benchmark items per corpus row", with no threshold to
tune. ``sim_topk_bruteforce`` is the N x B baseline; the approximate
ANN rows (LSH/IVF/PQ) trade recall. This is the exact accelerated
member (operators/knn_exact.py): a seed pass over the nearest cells
by occupancy gives each row a k-th-best lower bound; a prune pass
probes only cells whose spherical-cap upper bound clears it. Both
passes are map-side expressions over folded literals + one broadcast
hash join each; the only shuffle is one hash aggregate per pass on
vec_id. The rounded, id-tiebroken top-k equals brute force on ANY
data (bound + slack argument in the operator doc), so the oracle is
the brute-force window SQL.

At 100 TB: corpus-side linear, bench-side dictionary-sized (the
decontam contract); per-row cost is 2k centroid dots + candidates in
seeded/probed cells — clustered benches prune toward k candidates,
unclustered ones degrade to brute force plus the dots, exactness
unaffected (the test SF's unclustered embeddings run that regime and
still PASS, which is the point).
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from ..operators.decontam_ann import (
    build_bench_cells,
    residual_to_cell,
    train_sample,
)
from ..operators.dedup import cosine
from ..operators.knn_exact import probe_cells_topk, seed_cells
from ..operators.similarity import _as_double, argmax_cell
from ..operators.util import ensure_parallelism
from ..sources.testdata import load_table
from .registry import register
from .queries_semantic_decontam import _CTES

_K_CELLS = 8
_TRAIN_TARGET = 2000
_TOPK = 5


@register(
    "sim_knn_exact_cells",
    "    WITH "
    + _CTES
    + f"""
    SELECT vec_id, CAST(rn AS BIGINT) AS rank, bench_id, cosine FROM (
      SELECT vec_id, bench_id, cosine,
             ROW_NUMBER() OVER (PARTITION BY vec_id
                                ORDER BY cosine DESC, bench_id ASC) AS rn
      FROM sdq_scored)
    WHERE rn <= {_TOPK}
    """,
    doc="exact top-k cosine join accelerated by lossless cell bounds: "
    "seed pass (nearest cells to cumulative occupancy k) lower-bounds "
    "each row's k-th best, prune pass probes only cells whose "
    "spherical-cap upper bound clears it — rounded id-tiebroken top-k "
    "provably equals brute force, so the oracle is the brute-force "
    "window SQL",
)
def sim_knn_exact_cells(spark, sf_dir):
    emb = ensure_parallelism(load_table(spark, sf_dir, "embeddings"))
    bench = emb.where("label = 0").select(
        F.col("vec_id").alias("bench_id"),
        _as_double(F.col("embedding")).alias("vb"),
    )
    corpus = emb.where("label != 0").select(
        "vec_id", _as_double(F.col("embedding")).alias("vc")
    )
    sample_rows = train_sample(
        bench, "bench_id", "vb", target=_TRAIN_TARGET
    )
    _, cells = build_bench_cells(sample_rows, k=_K_CELLS)
    if not cells:
        return spark.createDataFrame(
            [], "vec_id long, rank long, bench_id long, cosine double"
        )
    cent_rows = [(cid, cv) for cid, cv, _ in cells]
    bench_cells = bench.select(
        "bench_id",
        "vb",
        argmax_cell(F.col("vb"), cent_rows).alias("cell"),
    ).withColumn(
        "res", residual_to_cell(F.col("vb"), F.col("cell"), cent_rows)
    )
    # ONE aggregate collects both the full-population residuals (the
    # bound) and the occupancy (the seed fold) — k rows to the driver
    stats = {
        r[0]: (float(r[1]), int(r[2]))
        for r in bench_cells.groupBy("cell")
        .agg(
            F.max("res").alias("res"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    }
    full_cells = [
        (cid, cv, stats.get(cid, (0.0, 0))[0]) for cid, cv in cent_rows
    ]
    occupancy = {cid: stats.get(cid, (0.0, 0))[1] for cid, _ in cent_rows}
    bcells = bench_cells.select("cell", "bench_id", "vb")

    # pass 1 (seed): candidates from the nearest cells covering >= k
    # members; k-th best rounded cosine = the row's prune threshold.
    # first(vc) carries the vector through the aggregate so pass 2
    # needs no join back to the corpus.
    seeded = (
        corpus.select(
            "vec_id",
            "vc",
            F.explode(
                seed_cells(F.col("vc"), full_cells, occupancy, _TOPK)
            ).alias("cell"),
        )
        .join(F.broadcast(bcells), "cell")
        .withColumn("cosine", F.round(cosine(F.col("vc"), F.col("vb")), 6))
        .groupBy("vec_id")
        .agg(
            F.first("vc").alias("vc"),
            F.sort_array(F.collect_list("cosine")).alias("cs"),
        )
        .withColumn(
            "tx",
            F.when(
                F.size("cs") >= _TOPK,
                F.element_at(F.col("cs"), F.size("cs") - _TOPK + 1),
            ).otherwise(F.lit(-1.0)),
        )
        .drop("cs")
    )
    # pass 2 (prune): probe every cell whose cap upper bound clears
    # tx - slack; exact rounded top-k with lowest-id tiebreak.
    w = Window.partitionBy("vec_id").orderBy(
        F.desc("cosine"), F.asc("bench_id")
    )
    return (
        seeded.select(
            "vec_id",
            "vc",
            "tx",
            F.explode(
                probe_cells_topk(F.col("vc"), F.col("tx"), full_cells)
            ).alias("cell"),
        )
        .join(F.broadcast(bcells), "cell")
        .withColumn("cosine", F.round(cosine(F.col("vc"), F.col("vb")), 6))
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= _TOPK)
        .select("vec_id", "rank", "bench_id", "cosine")
    )
