"""Product quantization (PQ) for embedding ANN — the memory-bounded
scale path for similarity search.

At 100 TB an `array<float>` corpus cannot be rescanned per query
workload: 64 float32 dims = 256 bytes/vector, while a PQ code with
m=2 subspaces × 256 codes is m bytes — a 128× compression that lets a
1000-executor cluster pin the entire searchable index in memory and
answer query batches with integer lookups instead of float vector math.

Spark-first decomposition (no stage is new machinery — each reuses an
already-attested primitive):

- ``pq_train``: one spherical k-means (operators/kmeans.kmeans_fit —
  map-side argmax assignment, ONE shuffle per iteration) per contiguous
  subvector slice. m small (2-8 by contract), so training is m short
  kmeans runs over narrow slices, each cheaper than one full-dim fit.
- ``pq_encode``: PURE MAP-SIDE — each subspace's k codewords (k×sub_dim
  floats, tiny by contract) fold into an argmax expression
  (operators/similarity.argmax_cell), so encoding a 100 TB corpus is a
  single scan that shuffles NOTHING and writes m small ints per row.
- ``pq_adc_topk``: asymmetric distance computation. Per query the
  driver precomputes the m×k lookup table of subspace cosines
  (query-slice · codeword — driver-side Python with the same
  left-to-right IEEE summation as the F.aggregate fold, the
  argmax_cell convention), folds it in as an array literal, and the
  score is ``sum_s LUT[s][code_s]`` — integer element_at per subspace,
  no per-row float vector math at all. Top-k per query is a
  TakeOrderedAndProject (per-partition k-row heaps) per query, unioned
  — never a global window and never an N×Q shuffle.

Scoring semantics: codewords are unit-normalized (spherical k-means),
and the score is the SUM OF PER-SUBSPACE COSINES between the query
slice and the assigned codeword — the standard PQ-for-cosine surrogate
(rank-equivalent to the cosine of the reconstructed vector when
subvector norms are balanced). Exact-recall baseline for comparison is
operators/similarity.brute_force_topk; tests measure recall@k against
it.

No reference counterpart (the reference pipeline has no vector ops);
extends the ANN family (brute force / LSH / IVF) with the
compressed-domain variant a 100 TB deployment actually serves from.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .kmeans import kmeans_fit
from .similarity import argmax_cell


def _seq_dot(xs: list[float], ys: list[float]) -> float:
    """Left-to-right IEEE dot product, bit-matching the F.aggregate /
    LIST_REDUCE sequential folds used engine-side."""
    acc = 0.0
    for x, y in zip(xs, ys):
        acc = acc + x * y
    return acc


def _seq_norm(xs: list[float]) -> float:
    import math

    acc = 0.0
    for x in xs:
        acc = acc + x * x
    return math.sqrt(acc)


def slice_col(vec, s: int, sub_dim: int):
    """Subvector slice s (0-based) of a flat array column — 1-based
    F.slice, mirrored by DuckDB ``LIST_SLICE(v, s*d+1, (s+1)*d)``."""
    return F.slice(vec, s * sub_dim + 1, sub_dim)


def pq_train(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    m_sub: int = 2,
    k_codes: int = 8,
    n_iter: int = 3,
    early_stop: bool = False,
) -> list[list[tuple[int, list[float]]]]:
    """Train one k-codeword spherical codebook per subvector slice.

    Returns driver-side codebooks ``[ [(code_id, codeword), ...] per
    subspace ]`` — m×k×(dim/m) floats, tiny by contract (the same
    size-class as the IVF centroid table). ``early_stop=False`` runs
    exactly ``n_iter`` Lloyd's steps so the DuckDB oracle (which
    unrolls iterations as CTEs) performs the identical update count.
    """
    assert dim % m_sub == 0, "dim must split evenly into m_sub slices"
    sub_dim = dim // m_sub
    books = []
    for s in range(m_sub):
        sub = df.select(
            F.col(id_col).alias("vec_id"),
            F.transform(
                slice_col(F.col(vec_col), s, sub_dim),
                lambda x: x.cast("double"),
            ).alias("sv"),
        )
        cents = kmeans_fit(
            sub,
            id_col="vec_id",
            vec_col="sv",
            k=k_codes,
            max_iter=n_iter,
            early_stop=early_stop,
        )
        books.append(
            sorted(
                (int(r.cent_id), [float(x) for x in r.cv])
                for r in cents.collect()
            )
        )
    return books


def pq_encode(
    df: DataFrame,
    codebooks: list[list[tuple[int, list[float]]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    assign_kernel: bool = False,
) -> DataFrame:
    """Map-side PQ encoding: (id, code_0..code_{m-1}) — one argmax
    expression per subspace, zero shuffles, ~m bytes of index per row.

    ``assign_kernel=True`` swaps each subspace's interpreted cosine fold
    for one Arrow numpy matmul per batch (argmax_cell's kernel form) —
    the scale setting, same switch as the kmeans trainer's; codes are
    bit-identical unless two codewords tie at float precision
    (attested by the sim_pq_adc_kernel registry twin's shared oracle).
    """
    m_sub = len(codebooks)
    sub_dim = dim // m_sub
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    cols = [F.col(id_col)]
    for s, book in enumerate(codebooks):
        cols.append(
            argmax_cell(slice_col(v, s, sub_dim), book, assign_kernel)
            .cast("int")
            .alias(f"code_{s}")
        )
    return df.select(*cols)


def pq_adc_topk(
    codes: DataFrame,
    queries: list[tuple[int, list[float]]],
    codebooks: list[list[tuple[int, list[float]]]],
    id_col: str = "vec_id",
    k: int = 5,
) -> DataFrame:
    """ADC top-k per query over a PQ-coded corpus.

    ``queries`` is a driver-side list (query-set ≪ corpus by contract —
    same shape as brute_force_topk's broadcast side). Per query the
    m×k_codes LUT of subspace cosines folds in as ONE array literal;
    the per-row score is m integer ``element_at`` lookups + (m-1)
    additions. Top-k per query = orderBy().limit(k) — Spark plans a
    TakeOrderedAndProject (per-partition heaps, k rows move per
    partition); the per-query branches union into one result.

    Deterministic ranking: (round(score, 6) desc, neighbor id asc).
    """
    m_sub = len(codebooks)
    sub_dim = len(codebooks[0][0][1])

    def _arr_sql(xs) -> str:
        return "array(" + ",".join(f"{x!r}D" for x in xs) + ")"

    per_query = []
    for qid, qv in queries:
        qv = [float(x) for x in qv]
        luts = []
        for s, book in enumerate(codebooks):
            qs = qv[s * sub_dim : (s + 1) * sub_dim]
            qn = _seq_norm(qs)
            # codewords are unit-normalized by kmeans_fit, but divide by
            # the recomputed norm anyway so the arithmetic is literally
            # cos = dot/(|q|*|c|), matching the oracle's cos_sql fragment
            luts.append(
                [
                    _seq_dot(qs, cw) / (qn * _seq_norm(cw))
                    for _, cw in book
                ]
            )
        score = None
        for s in range(m_sub):
            term = F.element_at(
                F.expr(_arr_sql(luts[s])), F.col(f"code_{s}") + 1
            )
            score = term if score is None else score + term
        per_query.append(
            codes.where(F.col(id_col) != qid)
            .select(
                F.lit(qid).cast("long").alias("query_id"),
                F.col(id_col).alias("neighbor_id"),
                F.round(score, 6).alias("adc_score"),
            )
            .orderBy(F.desc("adc_score"), F.asc("neighbor_id"))
            .limit(k)
        )
    out = per_query[0]
    for q in per_query[1:]:
        out = out.unionByName(q)
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(
        F.desc("adc_score"), F.asc("neighbor_id")
    )
    return out.withColumn("rank", F.row_number().over(w))


def pq_rerank_topk(
    codes: DataFrame,
    raw: DataFrame,
    queries: list[tuple[int, list[float]]],
    codebooks: list[list[tuple[int, list[float]]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    shortlist: int = 50,
    k: int = 5,
) -> DataFrame:
    """The production PQ pipeline: ADC shortlist → EXACT re-rank.

    Stage 1 scans only the compressed codes (pq_adc_topk, map-side LUT
    scores + per-query TakeOrdered heaps) to produce ``shortlist``
    candidates per query. Stage 2 touches raw vectors for the Q×shortlist
    candidate rows ONLY — the shortlist (tiny) broadcasts into a join
    against the corpus, and exact cosine re-scores just those rows. At
    100 TB the full-precision corpus is read back for ~50 rows per
    query instead of N: quantization error affects which candidates
    surface, never their final ordering.

    Deterministic ranking: (round(cosine, 6) desc, neighbor id asc).
    """
    from pyspark.sql import Window

    from .dedup import cosine

    short = pq_adc_topk(codes, queries, codebooks, id_col=id_col, k=shortlist)
    qdf = codes.sparkSession.createDataFrame(
        [(int(q), [float(x) for x in v]) for q, v in queries],
        "query_id long, vq array<double>",
    )
    vecs = raw.select(
        F.col(id_col).alias("neighbor_id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("vc"),
    )
    cand = F.broadcast(short.select("query_id", "neighbor_id")).join(
        vecs, "neighbor_id"
    )
    scored = cand.join(F.broadcast(qdf), "query_id").select(
        "query_id",
        "neighbor_id",
        F.round(cosine(F.col("vq"), F.col("vc")), 6).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def ivf_pq_topk(
    df: DataFrame,
    queries: list[tuple[int, list[float]]],
    coarse_cents: list[tuple[int, list[float]]],
    codebooks: list[list[tuple[int, list[float]]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_probe: int = 2,
    shortlist: int = 20,
    k: int = 5,
) -> DataFrame:
    """IVF-PQ: coarse cells gate WHICH rows are ADC-scored, PQ codes
    decide HOW cheaply — the FAISS-style production composition.

    One map-side scan attaches cell id (argmax over the coarse
    centroids) and PQ codes (argmax per subspace) — zero shuffles, and
    at 100 TB both live as tiny int columns next to the corpus, written
    once at ingest. Per query the probed cells are computed driver-side
    from the same (tiny) centroid table, the scan prunes to cell ∈
    probes (partition/file pruning when the corpus is cell-partitioned
    — the layout a production index uses), ADC scores the survivors via
    LUT literals, TakeOrderedAndProject keeps the shortlist, and exact
    cosine re-ranks Q×shortlist raw rows.

    Codebooks here quantize the FULL vector (IVF-PQ without residual
    encoding); residual/OPQ variants change only what pq_train is fed.
    """
    from pyspark.sql import Window

    from .dedup import cosine

    m_sub = len(codebooks)
    sub_dim = len(codebooks[0][0][1])

    def _arr_sql(xs) -> str:
        return "array(" + ",".join(f"{x!r}D" for x in xs) + ")"

    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    cols = [
        F.col(id_col),
        argmax_cell(v, sorted(coarse_cents)).cast("int").alias("cell"),
    ]
    for s, book in enumerate(codebooks):
        cols.append(
            argmax_cell(slice_col(v, s, sub_dim), book)
            .cast("int")
            .alias(f"code_{s}")
        )
    indexed = df.select(*cols)

    per_query = []
    for qid, qv in queries:
        qv = [float(x) for x in qv]
        qn = _seq_norm(qv)
        # probed cells: top n_probe by (cos desc, cent_id asc), computed
        # driver-side with the engine-matching sequential fold
        ranked = sorted(
            (
                (-(_seq_dot(qv, cv) / (qn * _seq_norm(cv))), cid)
                for cid, cv in coarse_cents
            ),
        )[:n_probe]
        probes = [cid for _, cid in ranked]
        luts = []
        for s, book in enumerate(codebooks):
            qs = qv[s * sub_dim : (s + 1) * sub_dim]
            qsn = _seq_norm(qs)
            luts.append(
                [_seq_dot(qs, cw) / (qsn * _seq_norm(cw)) for _, cw in book]
            )
        score = None
        for s in range(m_sub):
            term = F.element_at(
                F.expr(_arr_sql(luts[s])), F.col(f"code_{s}") + 1
            )
            score = term if score is None else score + term
        per_query.append(
            indexed.where(
                F.col("cell").isin(probes) & (F.col(id_col) != qid)
            )
            .select(
                F.lit(qid).cast("long").alias("query_id"),
                F.col(id_col).alias("neighbor_id"),
                F.round(score, 6).alias("adc_score"),
            )
            .orderBy(F.desc("adc_score"), F.asc("neighbor_id"))
            .limit(shortlist)
        )
    short = per_query[0]
    for q in per_query[1:]:
        short = short.unionByName(q)

    qdf = df.sparkSession.createDataFrame(
        [(int(q), [float(x) for x in vv]) for q, vv in queries],
        "query_id long, vq array<double>",
    )
    vecs = df.select(
        F.col(id_col).alias("neighbor_id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("vc"),
    )
    rescored = (
        F.broadcast(short.select("query_id", "neighbor_id"))
        .join(vecs, "neighbor_id")
        .join(F.broadcast(qdf), "query_id")
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("vq"), F.col("vc")), 6).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        rescored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )
