"""Exact cosine-threshold near-dup pair join via lossless cell
compatibility — round-11 module, registered AFTER WINDOW_R11 (leads
round 12).

The embedding dedup family so far trades recall for speed (LSH
hyperplane buckets, SimHash bands — probabilistic recall) or verifies
within heuristic buckets. This is the EXACT member: every unordered
pair with 6dp-rounded cosine >= t, zero false negatives, built from
the round's ball-bound machinery (operators/decontam_ann.py) turned on
a SELF-join:

1. cells trained on a deterministic capped-SIZE corpus sample — a
   crc32 hash gate whose modulus is derived from one cheap count
   (``crc32(vec_id) % max(n DIV 2000, 1)``), so the driver collects
   O(2k) rows at ANY corpus size, never a fixed fraction (the VERDICT
   r11 scale finding); a hash gate, never an id stride, because a
   stride aliases with id-correlated cluster structure (test-pinned).
   Cell QUALITY only affects speed, never the result set;
2. saturated cells drained by recursive re-split
   (operators/decontam_ann.refine_hot_cells — the semdedup hot-cell
   pattern): a cell with m members is O(m^2) candidate pairs, so any
   cell over the cap is re-split into sub-cells trained on a capped
   sample of its members; the bound is cell-agnostic, so draining is
   value-neutral. At test SFs no cell reaches the cap and the plan is
   byte-identical to the undrained shape;
3. every vector assigned map-side (similarity.argmax_cell, folded-in
   centroids, no shuffle);
4. per-cell max residual re-aggregated over the FULL population (the
   sample's residuals would understate the bound) — k rows collected;
5. compatible cell pairs by the two-hop triangle bound
   d(u_ca, u_cb) <= res_ca + r + res_cb (k^2 driver-side, broadcast);
   incompatible cell pairs provably hold no qualifying pair;
6. candidates = one cell-keyed equi-join through the compatibility
   table; exact rounded cosine verified on candidates only.

The oracle is therefore the brute-force all-pairs SQL. On clustered
corpora with tight thresholds the compatibility table is sparse and
candidates collapse toward the true pair set; on the unclustered
synthetic embeddings at t=0.4 most cell pairs stay compatible and the
join honestly degrades toward all-pairs — same documented regime
split as the decontamination gate.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators.decontam_ann import (
    build_bench_cells,
    refine_hot_cells,
    residual_to_cell,
    train_sample,
)
from ..operators.pair_blocks import block_candidate_pairs
from ..operators.dedup import cosine
from ..operators.similarity import _as_double, argmax_cell
from ..operators.util import ensure_parallelism
from ..sources.testdata import load_table
from .registry import register
from .shared_sql import cos_sql

_TH = 0.4
_K = 8
# capped-size train collect: ~_TRAIN_TARGET rows at any corpus size
# (operators/decontam_ann.train_sample — count-derived crc32 modulus)
_TRAIN_TARGET = 2000
# drain threshold: a cell holding > _HOT_CAP members (> ~8M within-cell
# candidate pairs) is re-split before the join. Never reached at the
# test SFs (2k embeddings at sf0.1) — the drain is the 100 TB path.
_HOT_CAP = 4000


@register(
    "dedup_embedding_exact_pairs",
    f"""
    WITH dec_v AS (
      SELECT vec_id,
             LIST_TRANSFORM(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    )
    SELECT vec_id_a, vec_id_b, cosine FROM (
      SELECT a.vec_id AS vec_id_a, b.vec_id AS vec_id_b,
             ROUND({cos_sql('a.v', 'b.v')}, 6) AS cosine
      FROM dec_v a JOIN dec_v b ON a.vec_id < b.vec_id)
    WHERE cosine >= {_TH}
    """,
    doc="exact cosine-threshold near-dup self-join: cells from a "
    "capped-size sampled train (count-derived hash-gate modulus, "
    "O(2k) driver rows at any corpus size), hot cells drained by "
    "recursive re-split, map-side assignment, full-population "
    "residual re-aggregation, then ONE cell-keyed equi-join through "
    "the lossless compatibility table and exact re-rank — zero false "
    "negatives by the two-hop ball bound, so the oracle is the "
    "brute-force all-pairs SQL",
)
def dedup_embedding_exact_pairs(spark, sf_dir):
    emb = ensure_parallelism(load_table(spark, sf_dir, "embeddings"))
    vecs = emb.select(
        "vec_id", _as_double(F.col("embedding")).alias("v")
    )
    sample_rows = train_sample(vecs, "vec_id", "v", target=_TRAIN_TARGET)
    _, cells = build_bench_cells(sample_rows, k=_K)
    if not cells:
        # empty embeddings table: zero centroids would make the 1-based
        # argmax descend through index 0 (ADVICE r11) — the exact
        # answer is the empty pair set
        return spark.createDataFrame(
            [], "vec_id_a long, vec_id_b long, cosine double"
        )
    cent_rows = refine_hot_cells(
        vecs,
        "vec_id",
        "v",
        [(cid, cv) for cid, cv, _ in cells],
        hot_cap=_HOT_CAP,
    )
    assigned = (
        vecs.select(
            "vec_id",
            "v",
            argmax_cell(F.col("v"), cent_rows).alias("cell"),
        )
        .withColumn(
            "res",
            residual_to_cell(F.col("v"), F.col("cell"), cent_rows),
        )
        .localCheckpoint(eager=False)
    )
    maxres = {
        r[0]: r[1]
        for r in assigned.groupBy("cell")
        .agg(F.max("res").alias("res"))
        .collect()
    }
    full_cells = [
        (cid, cv, float(maxres.get(cid, 0.0))) for cid, cv in cent_rows
    ]
    # r13-opt: candidates from ONE numpy matmul per compatible cell
    # block (operators/pair_blocks.py, guide §4.2/§8) instead of the
    # row-per-pair join that shipped both 64-dim vectors through every
    # candidate row; survivors (a provable superset of the answer by
    # the _SLACK margin) are re-ranked with the oracle-exact expression
    # cosine below — measured 2.5x on the identical result set.
    cand = block_candidate_pairs(assigned, full_cells, _TH)
    return (
        cand.withColumn(
            "cosine", F.round(cosine(F.col("va"), F.col("vb")), 6)
        )
        .where(F.col("cosine") >= F.lit(_TH))
        .select("vec_id_a", "vec_id_b", "cosine")
    )
