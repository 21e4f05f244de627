"""Exact cosine-threshold near-dup pair join via lossless cell
compatibility — round-11 module, registered AFTER WINDOW_R11 (leads
round 12).

The embedding dedup family so far trades recall for speed (LSH
hyperplane buckets, SimHash bands — probabilistic recall) or verifies
within heuristic buckets. This is the EXACT member: every unordered
pair with 6dp-rounded cosine >= t, zero false negatives, built from
the round's ball-bound machinery (operators/decontam_ann.py) turned on
a SELF-join:

1. cells trained on a deterministic corpus SAMPLE (vec_id stride —
   dictionary-sized collect, the production pattern; cell QUALITY only
   affects speed, never the result set);
2. every vector assigned map-side (similarity.argmax_cell, folded-in
   centroids, no shuffle);
3. per-cell max residual re-aggregated over the FULL population (the
   sample's residuals would understate the bound) — k rows collected;
4. compatible cell pairs by the two-hop triangle bound
   d(u_ca, u_cb) <= res_ca + r + res_cb (k^2 driver-side, broadcast);
   incompatible cell pairs provably hold no qualifying pair;
5. candidates = one cell-keyed equi-join through the compatibility
   table; exact rounded cosine verified on candidates only.

The oracle is therefore the brute-force all-pairs SQL. On clustered
corpora with tight thresholds the compatibility table is sparse and
candidates collapse toward the true pair set; on the unclustered
synthetic embeddings at t=0.4 most cell pairs stay compatible and the
join honestly degrades toward all-pairs — same documented regime
split as the decontamination gate, with the hot-cell caveat shared
with semdedup (drain pattern applies if a cell saturates).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators.decontam_ann import (
    build_bench_cells,
    compatible_cell_pairs,
    pair_radius,
    residual_to_cell,
)
from ..operators.dedup import cosine
from ..operators.similarity import _as_double, argmax_cell
from ..operators.util import ensure_parallelism
from ..sources.testdata import load_table
from .registry import register
from .shared_sql import cos_sql

_TH = 0.4
_K = 8
# train sample = deterministic 1-in-4 HASH gate, never an id stride: a
# stride that shares a factor with any id-correlated structure samples
# only a subset of clusters (the test pins the aliasing hazard: stride
# 3 over 12 id-mod clusters saw 4 of them). Bad cells stay CORRECT
# (lossless bound) but stop pruning.
_SAMPLE_GATE = "crc32(CAST(vec_id AS STRING)) % 4 = 0"


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
    "sampled train, map-side assignment, full-population residual "
    "re-aggregation, then ONE cell-keyed equi-join through the "
    "lossless compatibility table and exact re-rank — zero false "
    "negatives by the two-hop ball bound, so the oracle is the "
    "brute-force all-pairs SQL",
)
def dedup_embedding_exact_pairs(spark, sf_dir):
    emb = ensure_parallelism(load_table(spark, sf_dir, "embeddings"))
    vecs = emb.select(
        "vec_id", _as_double(F.col("embedding")).alias("v")
    )
    sample_rows = [
        (r[0], list(r[1]))
        for r in vecs.where(_SAMPLE_GATE).collect()
    ]
    _, cells = build_bench_cells(sample_rows, k=_K)
    cent_rows = [(cid, cv) for cid, cv, _ in cells]
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
        (cid, cv, float(maxres.get(cid, 0.0))) for cid, cv, _ in cells
    ]
    compat = spark.createDataFrame(
        compatible_cell_pairs(full_cells, _TH, with_dist=True),
        "ca long, cb long, dctr double",
    )
    a = assigned.select(
        F.col("vec_id").alias("vec_id_a"),
        F.col("v").alias("va"),
        F.col("cell").alias("ca"),
        F.col("res").alias("res_a"),
    )
    b = assigned.select(
        F.col("vec_id").alias("vec_id_b"),
        F.col("v").alias("vb"),
        F.col("cell").alias("cb"),
        F.col("res").alias("res_b"),
    )
    return (
        a.join(F.broadcast(compat), "ca")
        .join(b, "cb")
        .where(F.col("vec_id_a") < F.col("vec_id_b"))
        # per-ROW tightening (lossless, operators/decontam_ann doc):
        # each row's OWN residual replaces the cell max in the bound —
        # one comparison per candidate, killed before the 64-dim cosine
        .where(
            F.col("dctr")
            <= F.col("res_a")
            + F.lit(pair_radius(_TH) + 1e-6)
            + F.col("res_b")
        )
        .withColumn(
            "cosine", F.round(cosine(F.col("va"), F.col("vb")), 6)
        )
        .where(F.col("cosine") >= F.lit(_TH))
        .select("vec_id_a", "vec_id_b", "cosine")
    )
