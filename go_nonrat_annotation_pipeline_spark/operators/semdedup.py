"""Semantic deduplication (SemDeDup-style) over an embedding column.

Abbas et al. 2023 ("SemDeDup: Data-efficient learning at web-scale
through semantic deduplication", arXiv:2303.09540): cluster the corpus
embeddings with k-means, then look for near-duplicate *pairs only
within a cluster* — the cluster assignment replaces the O(N²) global
pairwise pass with k independent, cell-bounded pairwise passes.

Scale posture (the 100 TB question): the k-means trainer
(operators/kmeans.kmeans_fit) is one shuffle per iteration with
map-side argmax assignment; the within-cell self-join is an equi-join
on `cell`, so only same-cell rows meet, and cell size is controlled by
k (grow k with the corpus so cells stay O(10³-10⁴) — the paper runs
k=50k on LAION). Skewed cells are visible in the report query and can
be re-split by training a sub-k-means on the hot cell alone. Nothing
here ever materializes cross-cell pairs.

Drop policy (deterministic, SQL-expressible): within a cell, a vector
`v` is dropped iff some LOWER-id vector `u` in the same cell has
cosine(u, v) ≥ tau. This is the transitive-conservative variant of the
paper's per-group pruning: every duplicate group keeps exactly its
min-id member as long as the group is a clique at tau; chains may drop
slightly more than the keep-one-per-group greedy (documented, and the
right bias for a dedup pass). The kept representative reported per
dropped row is the min-id matching neighbor.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .dedup import cosine
from .similarity import ivf_assign
from .util import ensure_parallelism


def semdedup_assign(
    emb: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    assign_kernel: bool = False,
) -> DataFrame:
    """(_id, v, cell): vectors cast to double and mapped to their
    nearest trained centroid — pure map-side argmax (no shuffle)."""
    docs = ensure_parallelism(
        emb.select(
            F.col(id_col).alias("_id"),
            F.transform(F.col(vec_col), lambda x: x.cast("double")).alias(
                "v"
            ),
        )
    )
    return ivf_assign(
        docs, centroids, "_id", "v", assign_kernel=assign_kernel
    )


def semdedup_drops(
    assigned: DataFrame,
    tau: float = 0.45,
) -> DataFrame:
    """(cell, drop_id, keep_id, cosine): one row per dropped vector.

    Within-cell self-join (equi-join on `cell`, id-ordered to halve the
    pairs), exact cosine verify, then per-drop min-id representative via
    one grouped min_by. Cosine is rounded to 6dp for a stable boundary
    (same convention as dedup_embedding_bucketed's verify stage).
    """
    a = assigned.select(
        F.col("cell"), F.col("_id").alias("id_a"), F.col("v").alias("va")
    )
    b = assigned.select(
        F.col("cell"), F.col("_id").alias("id_b"), F.col("v").alias("vb")
    )
    pairs = (
        a.join(b, ["cell"])
        .where(F.col("id_a") < F.col("id_b"))
        .select(
            "cell",
            "id_a",
            "id_b",
            cosine(F.col("va"), F.col("vb")).alias("c"),
        )
        .where(F.col("c") >= F.lit(tau))
    )
    return pairs.groupBy("cell", F.col("id_b").alias("drop_id")).agg(
        F.min("id_a").alias("keep_id"),
        F.round(F.min_by("c", "id_a"), 6).alias("cosine"),
    )


def hottest_cell(assigned: DataFrame):
    """(cell_label, n_vecs) of the largest cell; ties break to the
    lowest label. One k-row aggregate + a 1-row TakeOrdered collect.

    The label comes back RAW (int for a fresh k-means assignment,
    string like ``'c3.1'`` after :func:`semdedup_resplit`) so it can be
    passed straight back to ``semdedup_resplit`` — the label round-trip
    is what makes recursive draining possible."""
    row = (
        assigned.groupBy("cell")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("cell"))
        .limit(1)
        .collect()[0]
    )
    return row.cell, int(row.n)


def semdedup_resplit(
    assigned: DataFrame,
    cell,
    sub_k: int = 4,
    iters: int = 4,
    assign_kernel: bool = False,
) -> DataFrame:
    """Re-split ONE hot cell: train a sub-k-means on that cell's
    members only and reassign them to ``sub_k`` sub-cells; every other
    cell passes through untouched.

    This is the operational response to a hot row in semdedup_report
    (the within-cell pair pass is quadratic in cell size, so one
    oversized cell dominates the whole job). Output keeps the
    ``(_id, v, cell)`` shape with STRING cell labels — on a fresh
    integer assignment, ``c<cell>`` for untouched cells and
    ``c<cell>.<sub>`` for the split; on an already-resplit (string)
    assignment, untouched labels pass through verbatim and the split
    cell gains a ``.<sub>`` suffix — so :func:`semdedup_drops` /
    :func:`semdedup_report` compose unchanged downstream AND the
    operator composes with itself (recursion on a still-hot sub-cell
    works: labels are matched as strings and never double-prefixed).
    Cost: the sub-trainer runs on the hot cell's rows only (one shuffle
    per iteration over that slice); pass-through rows are a map-side
    relabel. :func:`semdedup_drain` wraps the recursion as one call.
    """
    from pyspark.sql.types import StringType

    from .kmeans import kmeans_fit

    already_str = isinstance(assigned.schema["cell"].dataType, StringType)
    cell_lab = str(cell)
    match = F.col("cell").cast("string") == F.lit(cell_lab)
    # the prefix the split cell's sub-labels extend
    prefix = cell_lab if already_str else f"c{cell_lab}"

    hot = assigned.where(match).localCheckpoint()
    sub_cents = kmeans_fit(
        hot,
        id_col="_id",
        vec_col="v",
        k=sub_k,
        max_iter=iters,
        early_stop=False,
        assign_kernel=assign_kernel,
    )
    sub = ivf_assign(
        hot.select("_id", "v"),
        sub_cents,
        "_id",
        "v",
        assign_kernel=assign_kernel,
    ).select(
        "_id",
        "v",
        F.concat(
            F.lit(f"{prefix}."), F.col("cell").cast("string")
        ).alias("cell"),
    )
    rest_lab = (
        F.col("cell")
        if already_str
        else F.concat(F.lit("c"), F.col("cell").cast("string"))
    )
    rest = assigned.where(~match).select(
        "_id", "v", rest_lab.alias("cell")
    )
    return rest.unionByName(sub)


def semdedup_drain(
    assigned: DataFrame,
    max_cell_size: int,
    sub_k: int = 4,
    iters: int = 4,
    max_rounds: int = 16,
    assign_kernel: bool = False,
) -> tuple[DataFrame, list]:
    """Repeatedly re-split the hottest cell until no cell exceeds
    ``max_cell_size`` (or ``max_rounds`` / no-progress safety stops).

    Returns ``(drained_assignment, history)`` where history rows are
    ``(label, n_before, n_largest_child)`` per round. The within-cell
    pair pass is quadratic per cell, so capping cell size bounds the
    whole job: sum over cells of n_i² ≤ max_cell_size · N once drained.

    A cell of (near-)identical vectors cannot be split by k-means —
    every member maps to the same sub-centroid. Such a cell is detected
    (largest child == parent) and EXCLUDED from further rounds instead
    of looping forever; it is genuinely one duplicate clique and the
    pair pass over it is the dedup work itself, not overhead. Each
    round localCheckpoints the relabeled assignment so the union lineage
    does not nest across rounds, and REPARTITIONS back to the input's
    parallelism first: resplit's union concatenates both branches'
    partitions, so left alone the partition count DOUBLES per round
    (2^rounds × base — measured 4.6s→240s per round by round 8 on an
    8k-vector probe before this bound; flat ~5s/round with it).
    """
    n_part = max(
        assigned.rdd.getNumPartitions(),
        assigned.sparkSession.sparkContext.defaultParallelism,
    )
    cur = assigned
    stuck: set = set()
    history: list = []
    for _ in range(max_rounds):
        sizes = (
            cur.groupBy("cell")
            .agg(F.count(F.lit(1)).alias("n"))
            .where(F.col("n") > F.lit(max_cell_size))
            .where(~F.col("cell").cast("string").isin([str(s) for s in stuck])
                   if stuck else F.lit(True))
            .orderBy(F.desc("n"), F.asc("cell"))
            .limit(1)
            .collect()
        )
        if not sizes:
            break
        label, n_before = sizes[0].cell, int(sizes[0].n)
        cur = (
            semdedup_resplit(
                cur, label, sub_k=sub_k, iters=iters,
                assign_kernel=assign_kernel,
            )
            .repartition(n_part)
            .localCheckpoint()
        )
        n_child = int(
            cur.where(
                F.col("cell").startswith(
                    (str(label) if isinstance(label, str) else f"c{label}")
                    + "."
                )
            )
            .groupBy("cell")
            .agg(F.count(F.lit(1)).alias("n"))
            .agg(F.max("n").alias("m"))
            .collect()[0]
            .m
        )
        history.append((str(label), n_before, n_child))
        if n_child >= n_before:  # unsplittable duplicate clique
            child_prefix = (
                str(label) if isinstance(label, str) else f"c{label}"
            )
            stuck.update(
                r.cell
                for r in cur.select("cell")
                .where(F.col("cell").startswith(child_prefix + "."))
                .distinct()
                .collect()
            )
    return cur, history


def semdedup_report(
    assigned: DataFrame,
    drops: DataFrame,
) -> DataFrame:
    """(cell, n_vecs, n_dropped): per-cluster dedup pressure — the
    operational view (hot cells ⇒ grow k or sub-split that cell)."""
    totals = assigned.groupBy("cell").agg(F.count(F.lit(1)).alias("n_vecs"))
    dropped = drops.groupBy("cell").agg(
        F.count(F.lit(1)).alias("n_dropped")
    )
    return (
        totals.join(dropped, "cell", "left")
        .select(
            "cell",
            "n_vecs",
            F.coalesce("n_dropped", F.lit(0)).cast("bigint").alias(
                "n_dropped"
            ),
        )
    )
