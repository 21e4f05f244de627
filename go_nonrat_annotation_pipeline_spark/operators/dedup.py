"""Deduplication operators for large-scale training-data pipelines
(north-star extensions, BASELINE.json).

All operators are DataFrame-in/DataFrame-out, JVM-side (higher-order
functions, no Python UDFs), and designed for 100 TB posture:

- exact dedup: one hash-groupBy shuffle on the content hash;
- MinHash-LSH: shingle→signature map-side, candidate generation via a
  band-bucket equi-join (shuffle on (band, sig) — skew-safe since bucket
  sizes are tiny at real thresholds), pairwise verify only on candidates;
- SimHash: signature map-side, no shuffle;
- n-gram Jaccard: bucketed self-join (bucket keys bound the pair blowup);
- embedding near-dup: bucketed (or full) self-join with JVM vector math.

Cross-engine-deterministic hashing from functions/hashing.py so the
DuckDB oracle reproduces signatures bit-for-bit.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions import hashing as H

from .util import ensure_parallelism

N_BANDS = 4
ROWS_PER_BAND = 2  # N_BANDS * ROWS_PER_BAND == len(H.MINHASH_COEFFS)


def exact_dedup(
    df: DataFrame, key: Column, id_col: str = "doc_id"
) -> DataFrame:
    """Exact dedup on a content-hash key: canonical = min(id) per group.

    Adds `canonical_id` and `is_dup` columns. Single hash-partition
    shuffle on the md5 key; at 100 TB this is the minimal exact-dedup
    plan (combine-enabled min aggregate, then a broadcast-free co-
    partitioned join back).
    """
    hashed = df.withColumn("_k", F.md5(key))
    canon = hashed.groupBy("_k").agg(F.min(id_col).alias("canonical_id"))
    return (
        hashed.join(canon, "_k")
        .withColumn("is_dup", F.col(id_col) != F.col("canonical_id"))
        .drop("_k")
    )


def shingle_sets(df: DataFrame, text_col: str, n: int = 3) -> DataFrame:
    """Add `sh`: distinct n-gram shingle hashes of the text's words."""
    wh = H.word_hashes(F.split(F.col(text_col), " "))
    return df.withColumn("sh", F.array_distinct(H.shingle_hashes(wh, n)))


def _minhash_docs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_shingle: int = 3,
) -> DataFrame:
    """Signature stage shared by the self-join and incremental forms:
    (_id, sh, _m0.._m7) — distinct shingle set + 8 min-hashes per doc.

    Expressed relationally — posexplode words → window-lead to form
    n-gram shingles → two-level hash aggregate (distinct shingles, then
    8 min-hash aggregates + collect of the shingle set) — so every hot
    expression stays inside whole-stage codegen. The equivalent
    array-lambda formulation (transform/aggregate higher-order fns) is
    interpreted row-at-a-time and degrades badly in long-lived JVMs.
    The shuffles introduced are all keyed on the doc id (window and
    both aggregates share the same partitioning, so Spark plans ONE
    exchange); map-side partial aggregation shrinks the exploded words
    back to one row per doc before the wire at 100 TB.
    """
    base = ensure_parallelism(df.select(id_col, text_col))
    words = base.select(
        F.col(id_col).alias("_id"),
        F.posexplode(F.split(F.col(text_col), " ")).alias("_pos", "_w"),
    )
    hashed = words.select("_id", "_pos", H.char_hash(F.col("_w")).alias("_h"))

    win = Window.partitionBy("_id").orderBy("_pos")
    terms = [
        (F.col("_h") if k == 0 else F.lead("_h", k).over(win))
        * F.lit(31 ** (n_shingle - 1 - k))
        for k in range(n_shingle)
    ]
    shingled = hashed.select(
        "_id", (sum(terms) % F.lit(H.P)).alias("_sh")
    ).where(F.col("_sh").isNotNull())

    docs = (
        shingled.distinct()  # per-doc shingle set; same partitioning as the window — no new shuffle
        .groupBy("_id")
        .agg(
            F.collect_list("_sh").alias("sh"),
            *[
                F.min((F.col("_sh") * a + b) % H.P).alias(f"_m{i}")
                for i, (a, b) in enumerate(H.MINHASH_COEFFS)
            ],
        )
        # materialize once: feeds three consumers (band explode + both
        # verify sides) — without this the signature stage re-runs per consumer
        .localCheckpoint()
    )
    return docs


def _band_rows(docs: DataFrame) -> DataFrame:
    """Explode a signature table into its LSH band rows (the bucket key)."""
    return docs.select(
        "_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("b"),
                        *[
                            F.col(f"_m{b * ROWS_PER_BAND + r}").alias(f"h{r}")
                            for r in range(ROWS_PER_BAND)
                        ],
                    )
                    for b in range(N_BANDS)
                ]
            )
        ).alias("band"),
    ).select("_id", "band.*")


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_shingle: int = 3,
    verify_threshold: float = 0.7,
) -> DataFrame:
    """MinHash + LSH banding near-dup pairs, verified by true Jaccard.

    Returns (id_a, id_b, jaccard) with id_a < id_b, jaccard rounded to 6.
    Physical strategy: see :func:`_minhash_docs` (signature stage) —
    band equi-join candidates, verify only collisions, never all-pairs.
    """
    docs = _minhash_docs(df, id_col, text_col, n_shingle)
    bands = _band_rows(docs)

    left = bands.select(F.col("_id").alias("id_a"), "b", "h0", "h1")
    right = bands.select(F.col("_id").alias("id_b"), "b", "h0", "h1")
    cand = (
        left.join(right, ["b", "h0", "h1"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )

    sa = docs.select(F.col("_id").alias("id_a"), F.col("sh").alias("sh_a"))
    sb = docs.select(F.col("_id").alias("id_b"), F.col("sh").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    return (
        cand.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn("jaccard_raw", inter / union.cast("double"))
        .where(F.col("jaccard_raw") >= verify_threshold)
        .select("id_a", "id_b", F.round("jaccard_raw", 6).alias("jaccard"))
    )


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_shingle: int = 3,
) -> DataFrame:
    """Public signature stage: (_id, sh, _m0.._m7) — the PERSISTABLE
    near-dup index table (what a deployment writes to parquet/Delta and
    feeds back as ``incremental_minhash_dups(store_sigs=...)``)."""
    return _minhash_docs(df, id_col, text_col, n_shingle)


def incremental_minhash_dups(
    store: DataFrame | None,
    incoming: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_shingle: int = 3,
    verify_threshold: float = 0.7,
    store_sigs: DataFrame | None = None,
    incoming_sigs: DataFrame | None = None,
) -> DataFrame:
    """Continuous-ingestion near-dup check: which INCOMING docs
    near-duplicate something already in the STORE.

    Returns (incoming_id, store_id, jaccard), jaccard rounded to 6.

    This is the shape a 100 TB pipeline actually runs after the initial
    backfill: the corpus is deduped once, then each new batch checks
    against the accumulated index. Cost scales with |incoming| + the
    band-collision count, NOT |store|² — the store side contributes only
    its (persistable) signature/band table, so a production deployment
    keeps the band table as a parquet/Delta artifact and this operator's
    store stage becomes a plain scan. Candidate generation is a band
    equi-join of incoming bands against store bands (never incoming ×
    store), and exact Jaccard verification touches only collisions.

    ``store_sigs`` (the ``minhash_signatures`` table of the store) skips
    the store's signature stage entirely — the persisted-index path: a
    deployment signatures each batch ONCE at admission and feeds the
    accumulated table back here, so per-batch cost never rescans store
    text (streaming/stream.incremental_dedup_stream does exactly this).
    """
    sd = (
        store_sigs
        if store_sigs is not None
        else _minhash_docs(store, id_col, text_col, n_shingle)
    )
    nd = (
        incoming_sigs
        if incoming_sigs is not None
        else _minhash_docs(incoming, id_col, text_col, n_shingle)
    )
    sb = _band_rows(sd).select(F.col("_id").alias("store_id"), "b", "h0", "h1")
    nb = _band_rows(nd).select(
        F.col("_id").alias("incoming_id"), "b", "h0", "h1"
    )
    cand = nb.join(sb, ["b", "h0", "h1"]).select(
        "incoming_id", "store_id"
    ).distinct()
    ssets = sd.select(F.col("_id").alias("store_id"), F.col("sh").alias("sh_s"))
    nsets = nd.select(
        F.col("_id").alias("incoming_id"), F.col("sh").alias("sh_n")
    )
    inter = F.size(F.array_intersect("sh_n", "sh_s"))
    union = F.size("sh_n") + F.size("sh_s") - inter
    return (
        cand.join(nsets, "incoming_id")
        .join(ssets, "store_id")
        .withColumn("jaccard_raw", inter / union.cast("double"))
        .where(F.col("jaccard_raw") >= verify_threshold)
        .select(
            "incoming_id", "store_id", F.round("jaccard_raw", 6).alias("jaccard")
        )
    )


def simhash(df: DataFrame, id_col: str, text_col: str, bits: int = 32) -> DataFrame:
    """Per-doc SimHash signature over word hashes (frequency-weighted).

    Pure map-side computation (unrolled per-bit aggregates, all inside
    whole-stage codegen); returns (id_col, simhash).
    """
    wh = H.word_hashes(F.split(F.col(text_col), " "))
    out = ensure_parallelism(df.select(id_col, F.col(text_col))).select(
        id_col, wh.alias("wh")
    )

    def _bit_merge(pw: int):
        # closure (not default-arg) so F.aggregate sees a 2-arg lambda;
        # (h div pw) % 2 extracts bit b without shiftright-on-column
        return lambda acc, h: acc + 2 * ((h / F.lit(pw)).cast("long") % 2) - 1

    sig = None
    for b in range(bits):
        pw = 1 << b
        bit_sum = F.aggregate(
            F.col("wh"), F.lit(0).cast("long"), _bit_merge(pw)
        )
        contrib = F.when(bit_sum > 0, F.lit(1 << b).cast("long")).otherwise(F.lit(0).cast("long"))
        sig = contrib if sig is None else sig + contrib
    return out.select(id_col, sig.alias("simhash"))


def ngram_jaccard_pairs(
    df: DataFrame,
    bucket_cols: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 2,
    threshold: float = 0.3,
) -> DataFrame:
    """Pairwise n-gram Jaccard within buckets (bounded self-join)."""
    docs = shingle_sets(
        ensure_parallelism(df.select(id_col, text_col, *bucket_cols)), text_col, n
    ).where(F.size("sh") > 0).localCheckpoint()
    a = docs.select(
        *bucket_cols, F.col(id_col).alias("id_a"), F.col("sh").alias("sh_a")
    )
    b = docs.select(
        *bucket_cols, F.col(id_col).alias("id_b"), F.col("sh").alias("sh_b")
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    return (
        a.join(b, bucket_cols)
        .where(F.col("id_a") < F.col("id_b"))
        .withColumn("jaccard_raw", inter / union.cast("double"))
        .where(F.col("jaccard_raw") >= threshold)
        .select(
            *bucket_cols, "id_a", "id_b", F.round("jaccard_raw", 6).alias("jaccard")
        )
    )


def connected_components_star(
    pairs: DataFrame,
    a_col: str = "id_a",
    b_col: str = "id_b",
    max_iterations: int = 30,
    max_edges: int | None = None,
) -> DataFrame:
    """Connected components via alternating large-star / small-star
    (Kiveris et al., "Connected Components in MapReduce and Beyond") —
    same contract as ``connected_components``: (doc_id, cluster_id) with
    cluster_id = component-minimum id.

    Converges in O(log n) rounds regardless of component DIAMETER,
    where min-label propagation needs O(diameter) rounds — this is the
    adversarial-graph fallback for chain-shaped near-dup graphs (e.g.
    sliding near-identical crawl snapshots, each similar only to its
    neighbors). Each round is two groupBy-min shuffles + two joins on
    the pair graph (≪ corpus); per-round ``localCheckpoint`` truncates
    lineage exactly like the closure operators.

    Invariant: after each round every edge points (larger → smaller),
    so the edge set is its own canonical form and convergence is a
    set-equality check (count + one-sided except) per round.

    ``max_edges`` is a defense against pathological pair graphs (e.g. a
    near-duplicate detector misconfigured to emit quadratic candidates):
    if set and the canonicalized edge count exceeds it, raise instead of
    burning cluster-hours; when unset, the edge count of every round is
    still visible via the warning log below once it crosses 100M.
    """
    E = (
        pairs.select(
            F.greatest(F.col(a_col), F.col(b_col)).alias("a"),
            F.least(F.col(a_col), F.col(b_col)).alias("b"),
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint()
    )
    n_edges = E.count()
    if max_edges is not None and n_edges > max_edges:
        raise ValueError(
            f"pair graph has {n_edges} edges > max_edges={max_edges}; "
            "the candidate generator upstream is likely emitting "
            "near-quadratic pairs — fix it rather than clustering them"
        )
    if n_edges > 100_000_000:
        import logging

        logging.getLogger(__name__).warning(
            "connected_components_star: %d edges — expect %d+ shuffle "
            "rounds over the full pair graph",
            n_edges,
            max(1, n_edges.bit_length() // 2),
        )
    for _ in range(max_iterations):
        if n_edges == 0:
            break
        # large-star: every neighbor larger than u links to u's minimum
        sym = E.unionByName(
            E.select(F.col("b").alias("a"), F.col("a").alias("b"))
        )
        mins = (
            sym.groupBy("a")
            .agg(F.min("b").alias("_mb"))
            .select("a", F.least("a", "_mb").alias("m"))
        )
        large = (
            sym.join(mins, "a")
            .where(F.col("b") > F.col("a"))
            .select(F.col("b").alias("a"), F.col("m").alias("b"))
            .where(F.col("a") != F.col("b"))
            .distinct()
        )
        # small-star: all of u's (smaller) neighbors + u link to the min
        mins2 = large.groupBy("a").agg(F.min("b").alias("m"))
        small = (
            large.join(mins2, "a")
            .select(F.col("b").alias("x"), "m")
            .unionByName(mins2.select(F.col("a").alias("x"), "m"))
            .where(F.col("x") != F.col("m"))
            .select(
                F.greatest("x", "m").alias("a"), F.least("x", "m").alias("b")
            )
            .distinct()
            .localCheckpoint()
        )
        n_new = small.count()
        converged = n_new == n_edges and small.exceptAll(E).isEmpty()
        E, n_edges = small, n_new
        if converged:
            break
    else:
        raise RuntimeError(
            f"star components did not converge in {max_iterations} rounds"
        )
    roots = E.select(F.col("b").alias("doc_id")).distinct().select(
        "doc_id", F.col("doc_id").alias("cluster_id")
    )
    return (
        E.select(F.col("a").alias("doc_id"), F.col("b").alias("cluster_id"))
        .unionByName(roots)
        .distinct()
    )


def connected_components(
    pairs: DataFrame,
    a_col: str = "id_a",
    b_col: str = "id_b",
    max_iterations: int = 50,
) -> DataFrame:
    """Cluster near-dup pairs into components: (doc_id, cluster_id) with
    cluster_id = min doc id of the component.

    Iterative min-label propagation to fixpoint with per-iteration
    localCheckpoint (same recipe as the closure operators). The pair
    graph is the LSH output — orders of magnitude smaller than the
    corpus — so iterations are cheap; convergence is O(component
    diameter), which LSH keeps tiny in practice (near-dup clusters are
    dense). For adversarial long-chain graphs, swap in the alternating
    large-star/small-star variant; the interface is unchanged.
    """
    edges = (
        pairs.select(F.col(a_col).alias("u"), F.col(b_col).alias("v"))
        .unionByName(
            pairs.select(F.col(b_col).alias("u"), F.col(a_col).alias("v"))
        )
        .distinct()
        .localCheckpoint()
    )
    labels = (
        edges.groupBy("u")
        .agg(F.min("v").alias("_mv"))
        .select("u", F.least("u", "_mv").alias("label"))
        .localCheckpoint()
    )
    for _ in range(max_iterations):
        lab_by_node = labels.select(
            F.col("u").alias("_ln"), F.col("label").alias("_lv")
        )
        neighbor_min = (
            edges.join(lab_by_node, edges["v"] == F.col("_ln"), "inner")
            .groupBy("u")
            .agg(F.min("_lv").alias("_nlabel"))
            .select(F.col("u").alias("_nu"), "_nlabel")
        )
        new_labels = (
            labels.join(neighbor_min, labels["u"] == F.col("_nu"), "left")
            .select(
                "u",
                F.least("label", F.coalesce("_nlabel", "label")).alias("label"),
                (F.coalesce("_nlabel", "label") < F.col("label")).alias("_moved"),
            )
            .localCheckpoint()
        )
        changed = not new_labels.where("_moved").isEmpty()
        labels = new_labels.select("u", "label").localCheckpoint()
        if not changed:
            break
    else:
        raise RuntimeError(f"components did not converge in {max_iterations} iterations")
    return labels.select(F.col("u").alias("doc_id"), F.col("label").alias("cluster_id"))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity of two array<double> columns — JVM higher-order
    fns, summation in index order (deterministic, oracle-reproducible)."""
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    na = F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))
    nb = F.sqrt(F.aggregate(b, F.lit(0.0), lambda acc, v: acc + v * v))
    return dot / (na * nb)


def _cosine_kernel():
    """Arrow-batched cosine for the verify stage at scale: one numpy
    einsum per batch instead of the interpreted per-row higher-order-
    function expression (~1ms/pair JVM-interpreted vs ~1M pairs/s here).
    Float summation order differs from the sequential JVM/SQL reduce, so
    oracle-exact queries keep the expression form (`cosine`); the kernel
    agrees with it to well past the rounded 6dp (tests/test_dedup.py)."""
    from pyspark.sql.pandas.functions import pandas_udf

    @pandas_udf("double")
    def cos(va: pd.Series, vb: pd.Series) -> pd.Series:
        a = np.asarray([np.asarray(x, dtype=np.float64) for x in va])
        b = np.asarray([np.asarray(x, dtype=np.float64) for x in vb])
        if len(a) == 0:
            return pd.Series([], dtype="float64")
        dot = np.einsum("ij,ij->i", a, b)
        na = np.sqrt(np.einsum("ij,ij->i", a, a))
        nb = np.sqrt(np.einsum("ij,ij->i", b, b))
        return pd.Series(dot / (na * nb))

    return cos


def embedding_near_dup_pairs_lsh(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.45,
    n_planes: int = 4,
    n_tables: int = 4,
    dim: int = 64,
    verify_kernel: bool = False,
) -> DataFrame:
    """Embedding near-dup pairs at scale: OR-amplified hyperplane-LSH
    candidate generation + exact cosine verify on candidates only.

    The 100 TB path (vs the O(N²) crossJoin of the brute-force variant):
    buckets for all n_tables hash tables come from one Arrow numpy matmul
    per batch (similarity._multitable_bucket_udf), each vector expands
    map-side to n_tables (table, bucket) keys, and candidates are an
    equi-join on that composite key — only colliding ids travel; the
    (heavy) vectors are joined back exactly once per surviving pair for
    the cosine verify. Deterministic and oracle-reproducible (the DuckDB
    mirror recomputes identical buckets).

    Sizing: buckets per table = 2^n_planes; keep N / 2^n_planes near the
    intended candidate-block size (≈64-256), i.e. n_planes ≈
    log2(N/128), and raise n_tables to buy recall back. verify_kernel
    switches the candidate re-score to the Arrow numpy kernel — the
    scale setting; the default JVM expression is bit-reproducible in the
    DuckDB oracle.
    """
    from .similarity import _multitable_bucket_udf  # deferred: avoids import cycle

    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    docs = ensure_parallelism(
        df.select(F.col(id_col).alias("_id"), v.alias("v"))
    ).localCheckpoint()

    budf = _multitable_bucket_udf(n_planes, n_tables, dim)
    keyed = docs.select(
        "_id", F.posexplode(budf(F.col("v"))).alias("_t", "_b")
    )
    a = keyed.select(F.col("_id").alias("id_a"), "_t", "_b")
    b = keyed.select(F.col("_id").alias("id_b"), "_t", "_b")
    cand = (
        a.join(b, ["_t", "_b"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    x = docs.select(F.col("_id").alias("id_a"), F.col("v").alias("va"))
    y = docs.select(F.col("_id").alias("id_b"), F.col("v").alias("vb"))
    cos = (
        _cosine_kernel()(F.col("va"), F.col("vb"))
        if verify_kernel
        else cosine(F.col("va"), F.col("vb"))
    )
    return (
        cand.join(x, "id_a")
        .join(y, "id_b")
        .withColumn("cos_raw", cos)
        .where(F.col("cos_raw") >= threshold)
        .select("id_a", "id_b", F.round("cos_raw", 6).alias("cosine"))
    )


def embedding_near_dup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.45,
    bucket_col: str | None = None,
) -> DataFrame:
    """TEST/BASELINE ONLY when bucket_col is None: the unbucketed form is
    an O(N^2) crossJoin kept as the exact-recall oracle for the LSH path.

    bucket_col bounds the self-join (IVF-style) and is the only form
    that survives production scale; None = brute force (only sane at
    small N or as the verify stage after LSH candidate generation).
    """
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    docs = df.select(F.col(id_col).alias("_id"), v.alias("v"), *([bucket_col] if bucket_col else []))
    on = [bucket_col] if bucket_col else []
    a = docs.select(*on, F.col("_id").alias("id_a"), F.col("v").alias("va"))
    b = docs.select(*on, F.col("_id").alias("id_b"), F.col("v").alias("vb"))
    j = a.join(b, on) if on else a.crossJoin(b)
    cos = cosine(F.col("va"), F.col("vb"))
    return (
        j.where(F.col("id_a") < F.col("id_b"))
        .withColumn("cos_raw", cos)
        .where(F.col("cos_raw") >= threshold)
        .select("id_a", "id_b", F.round("cos_raw", 6).alias("cosine"))
    )


def winnow_fingerprints(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    w: int = 4,
    max_doc_freq: int | None = None,
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer et al., MOSS): the min
    k-gram hash of every w-length sliding window, deduplicated — a
    guarantee-bearing fingerprint set (any shared substring of length
    ≥ w+k-1 tokens yields at least one shared fingerprint).

    All JVM-side: shingle hashes from functions/hashing (shared with the
    DuckDB mirror), posexplode + one rolling-min window pass per doc,
    distinct. max_doc_freq drops ubiquitous fingerprints (boilerplate
    stop-shingles) — the standard guard that keeps the downstream
    self-join from exploding on a 100 TB corpus.
    """
    # relational shingles (posexplode words → window lead), NOT the
    # array-lambda form: higher-order functions evaluate interpreted
    # row-at-a-time while this stays in whole-stage codegen (same
    # pattern and arithmetic as minhash_lsh_pairs, same DuckDB mirror)
    base = ensure_parallelism(df.select(id_col, text_col))
    words = base.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), " ")).alias("pos", "_w"),
    )
    hashed = words.select(id_col, "pos", H.char_hash(F.col("_w")).alias("_h"))
    lead_win = Window.partitionBy(id_col).orderBy("pos")
    terms = [
        (F.col("_h") if j == 0 else F.lead("_h", j).over(lead_win))
        * F.lit(31 ** (k - 1 - j))
        for j in range(k)
    ]
    ex = hashed.select(
        id_col, "pos", (sum(terms) % F.lit(H.P)).alias("h")
    ).where(F.col("h").isNotNull())
    # rolling min shares the same (id, pos) partitioning — no new shuffle
    win = Window.partitionBy(id_col).orderBy("pos").rowsBetween(0, w - 1)
    fps = (
        ex.withColumn("fp", F.min("h").over(win))
        .select(id_col, "fp")
        .distinct()
    )
    if max_doc_freq is not None:
        hot = (
            fps.groupBy("fp")
            .agg(F.count(F.lit(1)).alias("_df"))
            .where(F.col("_df") > max_doc_freq)
            .select("fp")
        )
        fps = fps.join(hot, "fp", "left_anti")
    return fps


def winnow_near_dup_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    w: int = 4,
    min_shared: int = 8,
    max_doc_freq: int | None = 64,
) -> DataFrame:
    """Near-dup pairs sharing ≥ min_shared winnowing fingerprints.

    Candidate generation is an equi-join on the fingerprint value (only
    colliding docs travel), bounded by the stop-fingerprint cap; the
    shared-count aggregate is one shuffle on the pair key.
    """
    fps = winnow_fingerprints(df, id_col, text_col, k, w, max_doc_freq)
    a = fps.select(F.col(id_col).alias("id_a"), "fp")
    b = fps.select(F.col(id_col).alias("id_b"), "fp")
    return (
        a.join(b, "fp")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("shared_fps"))
        .where(F.col("shared_fps") >= min_shared)
    )
