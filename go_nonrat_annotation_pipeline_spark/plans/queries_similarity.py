"""Similarity-search queries over `embeddings` (north-star extensions)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators import similarity as S
from ..sources.testdata import load_table
from .registry import register

_COS = """
  LIST_REDUCE(LIST_CONCAT([CAST(0 AS DOUBLE)],
      LIST_TRANSFORM(GENERATE_SERIES(1, LEN(q.v)),
                     i -> LIST_EXTRACT(q.v, i) * LIST_EXTRACT(c.v, i))),
      (acc, x) -> acc + x)
  / (SQRT(LIST_REDUCE(LIST_CONCAT([CAST(0 AS DOUBLE)],
         LIST_TRANSFORM(q.v, x -> x * x)), (acc, x) -> acc + x))
   * SQRT(LIST_REDUCE(LIST_CONCAT([CAST(0 AS DOUBLE)],
         LIST_TRANSFORM(c.v, x -> x * x)), (acc, x) -> acc + x)))
"""


# ---------------------------------------------------------------------------
# brute-force cosine top-k (exact ANN baseline)
# ---------------------------------------------------------------------------
@register(
    "sim_topk_bruteforce",
    f"""
    WITH e AS (
      SELECT vec_id, LIST_TRANSFORM(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    ), scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             ROUND({_COS}, 6) AS cosine
      FROM e q JOIN e c ON q.vec_id < 5 AND q.vec_id <> c.vec_id
    )
    SELECT query_id, neighbor_id, cosine, rank FROM (
      SELECT query_id, neighbor_id, cosine,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY cosine DESC, neighbor_id) AS rank
      FROM scored)
    WHERE rank <= 10
    """,
    doc="similarity: exact brute-force cosine top-10 for 5 query vectors",
)
def sim_topk_bruteforce(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 5)
    return S.brute_force_topk(emb, queries, "vec_id", "embedding", 10)


# ---------------------------------------------------------------------------
# LSH-bucketed approximate top-k (the scale path)
# ---------------------------------------------------------------------------
@register(
    "sim_lsh_ann",
    f"""
    WITH e AS (
      SELECT vec_id, LIST_TRANSFORM(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    ), bucketed AS (
      SELECT vec_id, v, {S.sql_hyperplane_bucket('v', 4)} AS bucket FROM e
    ), scored AS (
      SELECT q.vec_id AS query_id, q.bucket AS bucket, c.vec_id AS neighbor_id,
             ROUND({_COS}, 6) AS cosine
      FROM bucketed q JOIN bucketed c
        ON q.bucket = c.bucket AND q.vec_id < 5 AND q.vec_id <> c.vec_id
    )
    SELECT query_id, bucket, neighbor_id, cosine, rank FROM (
      SELECT query_id, bucket, neighbor_id, cosine,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY cosine DESC, neighbor_id) AS rank
      FROM scored)
    WHERE rank <= 5
    """,
    doc="similarity: random-hyperplane LSH bucketed ANN top-5",
)
def sim_lsh_ann(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 5)
    return S.lsh_ann_topk(emb, queries, "vec_id", "embedding", 5, 4, 64)
