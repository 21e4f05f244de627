"""Deduplication queries over `documents` (north-star extensions).

Every variant is oracle-checked — including MinHash-LSH, whose
signatures are reproduced bit-for-bit in DuckDB SQL via the shared
arithmetic in functions/hashing.py.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..functions import hashing as H
from ..operators import dedup as D
from ..operators import similarity as Ssim
from ..sources.testdata import load_table
from .registry import register
from .shared_sql import (  # noqa: F401
    COS as _SIM_COS,
    PAIR_CTES as _PAIR_CTES,
    SH as _SH,
    SH2 as _SH2,
    WORDS as _WORDS,
    sql_simhash as _sql_simhash,
)


# ---------------------------------------------------------------------------
# exact dedup (hash-groupBy on a normalized content key)
# ---------------------------------------------------------------------------


# ---------------------------------------------------------------------------
# MinHash + LSH banding with Jaccard verification (shared SQL fragments
# _SH / _PAIR_CTES live in shared_sql.py — see its docstring for why)
# ---------------------------------------------------------------------------




@register(
    "dedup_clusters",
    f"""
    WITH RECURSIVE {_PAIR_CTES},
    pairs AS (SELECT id_a, id_b FROM ver WHERE j >= 0.7),
    edges AS (
      SELECT id_a AS u, id_b AS v FROM pairs
      UNION
      SELECT id_b AS u, id_a AS v FROM pairs
    ),
    reach AS (
      SELECT u AS node, u AS member FROM (SELECT DISTINCT u FROM edges)
      UNION
      SELECT r.node, e.v FROM reach r JOIN edges e ON e.u = r.member
    )
    SELECT node AS doc_id, MIN(member) AS cluster_id
    FROM reach GROUP BY node
    """,
    doc="dedup: near-dup clusters via alternating large-star/small-star "
    "connected components (O(log n) rounds — the default scale path)",
)
def dedup_clusters(spark, sf_dir):
    """Default clustering = star components: round count is
    diameter-independent (SCALE.md: a 5,000-diameter chain graph that
    min-label propagation could not converge in bounded time). Min-label
    (dedup_clusters_minlabel) remains the dense-graph fast path — pick it
    only when clusters are known to be LSH-dense (diameter ~1-3)."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = D.minhash_lsh_pairs(docs, "doc_id", "text", 3, 0.7)
    return D.connected_components_star(pairs)


@register(
    "dedup_clusters_minlabel",
    f"""
    WITH RECURSIVE {_PAIR_CTES},
    pairs AS (SELECT id_a, id_b FROM ver WHERE j >= 0.7),
    edges AS (
      SELECT id_a AS u, id_b AS v FROM pairs
      UNION
      SELECT id_b AS u, id_a AS v FROM pairs
    ),
    reach AS (
      SELECT u AS node, u AS member FROM (SELECT DISTINCT u FROM edges)
      UNION
      SELECT r.node, e.v FROM reach r JOIN edges e ON e.u = r.member
    )
    SELECT node AS doc_id, MIN(member) AS cluster_id
    FROM reach GROUP BY node
    """,
    doc="dedup: clusters via min-label propagation (O(diameter) rounds — "
    "dense-graph fast path; star is the default, see dedup_clusters)",
)
def dedup_clusters_minlabel(spark, sf_dir):
    """Same contract and oracle as dedup_clusters; min-label does one
    groupBy-min per round so it wins on LSH-dense low-diameter clusters,
    but rounds grow with graph diameter — not the safe default."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = D.minhash_lsh_pairs(docs, "doc_id", "text", 3, 0.7)
    return D.connected_components(pairs)


# ---------------------------------------------------------------------------
# SimHash signatures (map-side only; _sql_simhash in shared_sql.py) and
# bucketed n-gram Jaccard pairs (_SH2 in shared_sql.py)
# ---------------------------------------------------------------------------



# ---------------------------------------------------------------------------
# embedding-cosine near-dup pairs — brute-force EXACT BASELINE. This
# all-pairs variant exists as the verify/recall reference for the
# bucketed scale path below (dedup_embedding_bucketed); production runs
# the bucketed query, never this one.
# ---------------------------------------------------------------------------


# ---------------------------------------------------------------------------
# embedding near-dup, LSH-bucketed (the 100 TB scale path): OR-amplified
# hyperplane buckets bound the candidate join; exact cosine verifies only
# colliding pairs. Results are a deterministic subset of the brute-force
# pairs (recall measured in tests/test_dedup.py).
# ---------------------------------------------------------------------------
_NDP_PLANES = 4
_NDP_TABLES = 4
_NDP_BUCKETS = ",\n             ".join(
    f"{Ssim.sql_hyperplane_bucket('v', _NDP_PLANES, 64, t * _NDP_PLANES)} AS b{t}"
    for t in range(_NDP_TABLES)
)
_NDP_UNION = "\n      UNION\n".join(
    f"      SELECT a.vec_id AS id_a, b.vec_id AS id_b\n"
    f"      FROM bucketed a JOIN bucketed b ON a.b{t} = b.b{t}\n"
    f"        AND a.vec_id < b.vec_id"
    for t in range(_NDP_TABLES)
)


@register(
    "dedup_embedding_bucketed",
    f"""
    WITH e AS (
      SELECT vec_id, LIST_TRANSFORM(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    ), bucketed AS (
      SELECT vec_id,
             {_NDP_BUCKETS}
      FROM e
    ), cand AS (
{_NDP_UNION}
    ), ver AS (
      SELECT id_a, id_b, {_SIM_COS} AS c
      FROM cand JOIN e q ON q.vec_id = cand.id_a JOIN e c ON c.vec_id = cand.id_b
    )
    SELECT id_a, id_b, ROUND(c, 6) AS cosine FROM ver WHERE c >= 0.45
    """,
    doc="dedup: LSH-bucketed embedding near-dup pairs ≥0.45 (scale path)",
)
def dedup_embedding_bucketed(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    return D.embedding_near_dup_pairs_lsh(
        emb, "vec_id", "embedding", 0.45, _NDP_PLANES, _NDP_TABLES, 64
    )


@register(
    "dedup_embedding_bucketed_kernel",
    # same oracle as dedup_embedding_bucketed: the Arrow verify kernel
    # agrees with the JVM fold well past the rounded 6dp
    # (tests/test_dedup.py), so a green row attests the scale setting
    # (verify_kernel=True) end-to-end against the same DuckDB mirror
    f"""
    WITH e AS (
      SELECT vec_id, LIST_TRANSFORM(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    ), bucketed AS (
      SELECT vec_id,
             {_NDP_BUCKETS}
      FROM e
    ), cand AS (
{_NDP_UNION}
    ), ver AS (
      SELECT id_a, id_b, {_SIM_COS} AS c
      FROM cand JOIN e q ON q.vec_id = cand.id_a JOIN e c ON c.vec_id = cand.id_b
    )
    SELECT id_a, id_b, ROUND(c, 6) AS cosine FROM ver WHERE c >= 0.45
    """,
    doc="dedup: LSH-bucketed near-dup pairs with the Arrow cosine verify "
    "kernel (the 100 TB setting) — same oracle as dedup_embedding_bucketed",
)
def dedup_embedding_bucketed_kernel(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    return D.embedding_near_dup_pairs_lsh(
        emb, "vec_id", "embedding", 0.45, _NDP_PLANES, _NDP_TABLES, 64,
        verify_kernel=True,
    )


# ---------------------------------------------------------------------------
# Winnowing fingerprints (MOSS): min k-gram hash per sliding window →
# stop-fingerprint cap → self-join on fingerprint → shared-count gate.
# Guarantee-bearing near-dup detection (any shared ≥ w+k-1-token run
# yields a shared fingerprint) — stronger than the plain rolling-hash
# text_fingerprint row.
# ---------------------------------------------------------------------------
_WIN_SH = H.sql_shingle_hashes(H.sql_word_hashes(_WORDS), 3)


@register(
    "dedup_winnowing",
    f"""
    WITH wh AS (SELECT doc_id, {_WIN_SH} AS sh FROM documents),
    ex AS (SELECT doc_id, pos, LIST_EXTRACT(sh, CAST(pos AS INT)) AS h
           FROM (SELECT doc_id, sh, UNNEST(RANGE(1, LEN(sh) + 1)) AS pos
                 FROM wh)),
    fp0 AS (SELECT DISTINCT doc_id,
                  MIN(h) OVER (PARTITION BY doc_id ORDER BY pos
                               ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fp
            FROM ex),
    hot AS (SELECT fp FROM fp0 GROUP BY fp HAVING COUNT(*) > 64),
    fps AS (SELECT * FROM fp0 WHERE fp NOT IN (SELECT fp FROM hot))
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(COUNT(*) AS BIGINT) AS shared_fps
    FROM fps a JOIN fps b ON a.fp = b.fp AND a.doc_id < b.doc_id
    GROUP BY 1, 2 HAVING COUNT(*) >= 8
    """,
    doc="dedup: winnowing (MOSS) fingerprint pairs sharing ≥8 fingerprints",
)
def dedup_winnowing(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return D.winnow_near_dup_pairs(
        docs, "doc_id", "text", k=3, w=4, min_shared=8, max_doc_freq=64
    ).select(
        "id_a", "id_b", F.col("shared_fps").cast("long").alias("shared_fps")
    )
