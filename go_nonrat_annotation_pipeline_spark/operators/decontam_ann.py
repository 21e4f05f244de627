"""Lossless IVF-cell pruning for threshold decontamination (ANN twin).

``plans/queries_semantic_decontam.py`` scores every corpus embedding
against EVERY benchmark embedding (N x B cosines). That is linear in
the corpus and the right first shape, but at a realistic combined eval
suite (B ~ 1e4-1e5 items) the per-doc constant is B cosines. The
standard IVF fix — probe only the nearest cell(s) — is LOSSY: a
within-threshold benchmark item can sit in an unprobed cell and flip
the verdict, which the driver's exact-value oracle would catch.

This module is the exact variant: ball-pruned IVF (the classic
branch-and-bound / ball-tree bound, e.g. Omohundro 1989; the same
triangle-inequality cell bound FAISS uses for exact IVFFlat search).
Benchmark embeddings are partitioned into k cells; each cell c keeps
its unit centroid u_c and max residual res_c = max_b ||b_hat - u_c||.
For a corpus vector x with unit form x_hat, any bench b with
cos(x, b) >= t satisfies ||x_hat - b_hat|| <= r where r = sqrt(2 - 2t),
so by the triangle inequality its cell has
||x_hat - u_c|| <= r + res_c. Probing exactly the cells inside that
bound therefore sees EVERY within-threshold pair — the verdict and the
above-threshold argmax are identical to brute force BY CONSTRUCTION,
on any data. Pruning power is data-dependent: clustered benches
(the realistic regime — eval suites are topically coherent) prune
hard; on unclustered data the bound admits all cells and the plan
degrades gracefully to brute force plus k dot products per row.

Spark-first: the benchmark side is dictionary-sized by contract, so
the cell build is a driver-side numpy fold over the collected bench
(exactly the ivf_assign/argmax_cell discipline); the corpus side never
collects — probing is one map-side filter expression (k dot products
per row, folded-in literals, no shuffle), then an explode + broadcast
join against the cell-tagged bench and ONE struct-max aggregate.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import Column, functions as F

# Absolute slack on the centroid-side cosine bound: covers (a) the
# round-half-up boundary of the 6dp-rounded cosine (5e-7) and (b) any
# float64 discrepancy between the driver-side numpy residuals and the
# JVM expression dots (~1e-15). 1e-6 dominates both.
_SLACK = 1e-6


def build_bench_cells(
    bench_rows: list[tuple[int, list[float]]],
    k: int = 8,
    lloyd_iters: int = 8,
) -> tuple[list[tuple[int, int]], list[tuple[int, list[float], float]]]:
    """Partition collected benchmark vectors into ``k`` cells.

    Driver-side and deterministic: farthest-point (k-center / Gonzalez)
    seeding from the lowest bench id, then ``lloyd_iters`` Lloyd steps
    on the unit sphere (argmin Euclidean == argmax cosine); empty cells
    carry their seed forward (the operators/kmeans.kmeans_fit
    convention). Farthest-point beats strided seeding here because the
    prune bound pays quadratically for a merged cluster's residual.
    Returns
    ``(assign, cells)`` where ``assign`` is [(bench_id, cell_id)] and
    ``cells`` is [(cell_id, unit_centroid, max_residual)] with cell ids
    1..k (1-based for element_at in the probe expression).
    """
    if not bench_rows:
        return [], []
    rows = sorted(bench_rows, key=lambda r: r[0])
    ids = [int(i) for i, _ in rows]
    B = np.asarray([np.asarray(v, dtype=np.float64) for _, v in rows])
    Bh = B / np.maximum(np.linalg.norm(B, axis=1, keepdims=True), 1e-300)
    k = min(k, len(rows))
    seeds = [0]
    best = Bh @ Bh[0]  # max cosine to any chosen seed, per point
    for _ in range(1, k):
        nxt = int(np.argmin(best))  # farthest point (ties -> lowest id)
        seeds.append(nxt)
        best = np.maximum(best, Bh @ Bh[nxt])
    C = Bh[seeds].copy()
    for _ in range(lloyd_iters):
        a = np.argmax(Bh @ C.T, axis=1)  # ties -> lowest cell (argmax)
        for c in range(k):
            m = Bh[a == c]
            if len(m):
                mu = m.mean(axis=0)
                n = np.linalg.norm(mu)
                if n > 0:
                    C[c] = mu / n
    a = np.argmax(Bh @ C.T, axis=1)
    assign = [(ids[i], int(a[i]) + 1) for i in range(len(ids))]
    cells = []
    for c in range(k):
        m = Bh[a == c]
        res = float(np.max(np.linalg.norm(m - C[c], axis=1))) if len(m) else 0.0
        cells.append((c + 1, [float(x) for x in C[c]], res))
    return assign, cells


def residual_to_cell(
    vec_col: Column,
    cell_col: Column,
    cent_rows: list[tuple[int, list[float]]],
) -> Column:
    """Unit-sphere distance from a vector to its ASSIGNED cell's unit
    centroid — sqrt(2 - 2*cos(v, u_cell)), map-side, centroids folded
    in as one array literal indexed by the (1-based, contiguous) cell
    id. Feeds the per-cell max-residual aggregate that tightens the
    ball bound to the FULL population assigned to each cell (a builder
    trained on a sample only knows the sample's residuals)."""

    def _arr_sql(xs) -> str:
        return "array(" + ",".join(f"{x!r}D" for x in xs) + ")"

    rows = sorted(cent_rows)
    assert [c for c, _ in rows] == list(range(1, len(rows) + 1))
    C = F.expr(
        "array("
        + ",".join(_arr_sql([float(x) for x in cv]) for _, cv in rows)
        + ")"
    )
    dot = F.aggregate(
        F.zip_with(
            vec_col,
            F.element_at(C, cell_col.cast("int")),
            lambda x, y: x * y,
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    vnorm = F.sqrt(
        F.aggregate(vec_col, F.lit(0.0), lambda acc, x: acc + x * x)
    )
    return F.sqrt(
        F.greatest(F.lit(0.0), F.lit(2.0) - F.lit(2.0) * dot / vnorm)
    )


def pair_radius(threshold: float) -> float:
    """The unit-sphere pair radius r = sqrt(2 - 2*(t - slack)): any
    pair with 6dp-rounded cosine >= t has ||a_hat - b_hat|| <= r.
    Exposed for the per-ROW candidate filter (see
    compatible_cell_pairs doc): a qualifying pair also satisfies
    d(u_ca, u_cb) <= res_a + r + res_b with each row's OWN residual —
    strictly tighter than the cell-level max-residual bound, whose
    single worst outlier loosens the whole cell (measured: spread-0.05
    clusters keep ~90% of cell pairs compatible at the cell level)."""
    t_eff = max(-1.0, min(1.0, threshold - _SLACK))
    return math.sqrt(max(0.0, 2.0 - 2.0 * t_eff))


def compatible_cell_pairs(
    cells: list[tuple[int, list[float], float]],
    threshold: float,
    with_dist: bool = False,
) -> list[tuple[int, int]] | list[tuple[int, int, float]]:
    """Ordered cell pairs (ca <= cb) that can hold a cosine pair at
    ``threshold`` — the self-join face of the ball bound: for any
    a, b with cos(a, b) >= t, ||a_hat - b_hat|| <= r, so by two
    triangle hops d(u_ca, u_cb) <= res_ca + r + res_cb. Pairs outside
    that bound provably hold NO qualifying pair and are never joined.
    k^2 driver-side work over the dictionary-sized cell table.

    Both directions are emitted for ca != cb (plus (c, c) once), so a
    caller can anchor side A on ``ca`` and side B on ``cb`` and rely on
    the id-order filter alone to canonicalize pairs — a qualifying pair
    (x in c2, y in c1, x.id < y.id) is reached via the (c2, c1) row.

    ``with_dist=True`` appends the exact centroid distance
    d(u_ca, u_cb) to each row, for the per-ROW tightening filter
    ``dctr <= res_a + pair_radius(t) + res_b + slack`` applied after
    the cell join and before the cosine — lossless with each row's own
    residual, and immune to the max-residual outlier."""
    r = pair_radius(threshold)

    def _res(x: float) -> float:
        # a zero-norm member makes its cell's max residual NaN; a NaN
        # bound would compare False and silently DROP the whole cell's
        # pairs (false negatives for its healthy members) — clamp to
        # the sphere diameter instead, which only loosens the bound
        return x if math.isfinite(x) else 2.0

    # r13 optimization: ONE C×C gram-matrix distance computation
    # (d² = |a|² + |b|² − 2a·b, a single BLAS matmul) instead of a
    # per-pair Python loop — after a FIRED drain the cell table is
    # hundreds of cells and the O(C²) np.linalg.norm calls cost
    # seconds of pure driver time per build (measured 1.5s at C=700;
    # the matmul form runs in milliseconds). Float-safety: the gram
    # form's cancellation error is TWO-SIDED (the computed d can land
    # up to ~3e-8 above OR below the loop form's value near the
    # bound), so it is the explicit _SLACK = 1e-6 headroom in the
    # comparison — not any one-sidedness — that keeps the superset
    # property: a qualifying pair satisfies the bound with NO slack,
    # and a ±3e-8 delta cannot push it past bound + 1e-6, so no
    # qualifying pair is ever dropped; spurious compat pairs the
    # slack admits are harmless (candidates die at the exact re-rank).
    if not cells:
        return []
    C = np.asarray([np.asarray(cv, dtype=np.float64) for _, cv, _ in cells])
    sq = np.add.reduce(C * C, axis=1)
    D = np.sqrt(np.maximum(0.0, sq[:, None] + sq[None, :] - 2.0 * (C @ C.T)))
    res = np.asarray([_res(float(rr)) for _, _, rr in cells])
    ok = D <= res[:, None] + r + res[None, :] + _SLACK
    ids = np.asarray([ca for ca, _, _ in cells])
    ii, jj = np.nonzero(np.triu(ok))
    out = []
    for i, j in zip(ii.tolist(), jj.tolist()):
        ca, cb, d = int(ids[i]), int(ids[j]), float(D[i, j])
        out.append((ca, cb, d) if with_dist else (ca, cb))
        if ca != cb:
            out.append((cb, ca, d) if with_dist else (cb, ca))
    return out


def probe_cells(
    vec_col: Column,
    cells: list[tuple[int, list[float], float]],
    threshold: float,
    kernel: bool = False,
) -> Column:
    """Array of cell ids a vector must probe for an exact verdict at
    ``threshold`` — a pure map-side filter over the k folded-in unit
    centroids (the argmax_cell literal discipline: one SQL array literal
    per matrix, O(1) lambda trees total, repr() round-trips doubles).

    Cell c is probed iff cos(x, u_c) >= smin_c where
    smin_c = 1 - (r + res_c)^2 / 2, r = sqrt(2 - 2*(threshold - slack))
    — the cosine form of ||x_hat - u_c|| <= r + res_c, so no
    normalization of x is materialized (dot >= smin * ||x||).

    ``kernel=True`` swaps the k interpreted higher-order dots per row
    for ONE Arrow numpy matmul per batch (the argmax_cell convention —
    the scale setting for k ≳ 16). Exactness is kernel-independent:
    the _SLACK absolute margin dwarfs any float reassociation delta
    between numpy and the JVM fold (~1e-13 relative), so the kernel's
    probed set is still a superset of every within-threshold pair; the
    downstream re-rank computes the oracle-exact expression cosine on
    candidates either way.
    """
    t_eff = max(-1.0, min(1.0, threshold - _SLACK))
    r = math.sqrt(max(0.0, 2.0 - 2.0 * t_eff))
    if not cells:
        # shared by BOTH paths: with zero cells the kernel would matmul
        # against a zero-row centroid matrix and raise a shape error
        # (ADVICE r11) — an empty probe list is the correct exact
        # answer (no cell can hold a within-threshold neighbour)
        return F.expr("array()").cast("array<bigint>")
    if kernel:
        from pyspark.sql.pandas.functions import pandas_udf

        ids_np = np.asarray([int(c) for c, _, _ in cells], dtype=np.int64)
        Cn = np.asarray(
            [np.asarray(cv, dtype=np.float64) for _, cv, _ in cells]
        ).T  # (dim, k)
        smin_np = np.asarray(
            [
                1.0 - (r + res + _SLACK) ** 2 / 2.0
                for _, _, res in cells
            ]
        )

        @pandas_udf("array<bigint>")
        def probe(v: pd.Series) -> pd.Series:
            m = np.asarray(
                [np.asarray(x, dtype=np.float64) for x in v]
            )
            if len(m) == 0:
                return pd.Series([], dtype="object")
            dots = m @ Cn  # (n, k)
            vnorm = np.linalg.norm(m, axis=1, keepdims=True)
            mask = dots >= smin_np[None, :] * vnorm
            return pd.Series([list(ids_np[row]) for row in mask])

        return probe(vec_col)

    def _arr_sql(xs) -> str:
        return "array(" + ",".join(f"{x!r}D" for x in xs) + ")"

    ids, smins, mats = [], [], []
    for cid, cv, res in cells:
        ids.append(float(cid))
        thr = r + res + _SLACK
        smins.append(1.0 - thr * thr / 2.0)
        mats.append([float(x) for x in cv])

    C = F.expr("array(" + ",".join(_arr_sql(cv) for cv in mats) + ")")
    smin = F.expr(_arr_sql(smins))
    cid_arr = F.expr(_arr_sql(ids))
    vnorm = F.sqrt(
        F.aggregate(vec_col, F.lit(0.0), lambda acc, x: acc + x * x)
    )
    probed = F.filter(
        F.sequence(F.lit(1), F.lit(len(ids))),
        lambda i: F.aggregate(
            F.zip_with(
                vec_col, F.element_at(C, i), lambda x, y: x * y
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        >= F.element_at(smin, i) * vnorm,
    )
    return F.transform(
        probed, lambda i: F.element_at(cid_arr, i).cast("bigint")
    )


def train_sample(
    df,
    id_col: str,
    vec_col: str,
    target: int = 2000,
) -> list[tuple[int, list[float]]]:
    """Fixed-SIZE (not fixed-fraction) training sample for the cell
    build — the collect is O(target) rows at ANY corpus size.

    A constant-modulus hash gate (``crc32 % 4``) is a fixed FRACTION:
    at 100x the corpus it collects 100x the rows to the driver — the
    one scale-killer VERDICT r11 flagged. Here the modulus is derived
    from one cheap count: ``crc32(id) % max(n DIV target, 1) = 0``
    keeps the expected sample at ~``target`` rows forever. The gate
    stays a crc32 HASH (never an id stride): a stride sharing a factor
    with id-correlated cluster structure samples only a subset of
    clusters (tests pin the hazard). Cell quality from the sample
    affects pruning only, NEVER results — the ball bound is lossless
    for any cells (module doc), so the sampling policy is value-neutral
    by construction.
    """
    n = df.count()
    if n == 0:
        return []
    mod = max(n // target, 1)
    gate = f"crc32(CAST({id_col} AS STRING)) % {mod} = 0"
    rows = [
        (r[0], list(r[1]))
        for r in df.where(gate).select(id_col, vec_col).collect()
    ]
    if not rows:
        # astronomically unlikely for a uniform hash at n >= target,
        # but a nonempty input must never train zero cells: fall back
        # to a bounded LIMIT (order-nondeterminism is value-safe here —
        # cells only steer pruning)
        rows = [
            (r[0], list(r[1]))
            for r in df.select(id_col, vec_col).limit(target).collect()
        ]
    return rows


def refine_hot_cells(
    df,
    id_col: str,
    vec_col: str,
    cent_rows: list[tuple[int, list[float]]],
    hot_cap: int,
    k_sub: int = 8,
    sub_target: int = 1000,
    max_rounds: int = 2,
    assign_kernel: bool = False,
) -> list[tuple[int, list[float]]]:
    """Drain saturated cells by recursive re-split — the semdedup
    hot-cell pattern applied to the lossless cell table.

    A compatibility cell with m members contributes O(m^2) candidate
    pairs to the exact self-join; one saturated cell dominates the
    whole candidate set (measured: 645M cell-level candidates at 40k
    rows / spread 0.05, SCALE.md r11). Exactness is cell-AGNOSTIC
    (the two-hop ball bound holds for any partition), so re-splitting
    a hot cell is value-neutral: count members per cell, train k_sub
    sub-cells on a capped hash-gate sample of each hot cell's members
    (build_bench_cells, the same k-center + Lloyd build), replace the
    hot centroid with its sub-centroids, renumber 1..K', and repeat up
    to ``max_rounds``. Each round costs ONE count aggregate plus ONE
    bounded collect (all hot cells sampled in a single pass via a
    per-cell CASE modulus); the caller re-assigns and re-aggregates
    residuals against the FINAL centroid list, which keeps assignment,
    residuals and bound self-consistent.

    Returns the refined ``cent_rows`` (contiguous 1-based ids).
    """
    from .similarity import argmax_cell

    for _ in range(max_rounds):
        if not cent_rows:
            return cent_rows
        assigned = df.select(
            F.col(id_col).alias("_rid"),
            F.col(vec_col).alias("_rv"),
            argmax_cell(
                F.col(vec_col), cent_rows, assign_kernel=assign_kernel
            ).alias("_rcell"),
        )
        counts = {
            r[0]: r[1]
            for r in assigned.groupBy("_rcell").count().collect()
        }
        hot = sorted(
            c for c, n in counts.items() if n > hot_cap
        )
        if not hot:
            return cent_rows
        # one pass collects every hot cell's sample: per-cell modulus
        # folded into a CASE expression, crc32 gate as everywhere
        mod_case = "CASE _rcell " + " ".join(
            f"WHEN {c} THEN {max(counts[c] // sub_target, 1)}"
            for c in hot
        ) + " END"
        samples: dict[int, list[tuple[int, list[float]]]] = {
            c: [] for c in hot
        }
        for r in (
            assigned.where(F.col("_rcell").isin([int(c) for c in hot]))
            .where(f"crc32(CAST(_rid AS STRING)) % ({mod_case}) = 0")
            .collect()
        ):
            samples[r["_rcell"]].append((r["_rid"], list(r["_rv"])))
        by_id = dict(cent_rows)
        new_cents: list[list[float]] = []
        for cid, cv in cent_rows:
            if cid in samples and len(samples[cid]) > 1:
                _, sub = build_bench_cells(samples[cid], k=k_sub)
                new_cents.extend([scv for _, scv, _ in sub])
            else:
                # keep cold cells (and a hot cell whose sample came
                # back empty or single-point — splitting on one sampled
                # member would REPLACE a trained centroid with that
                # point; cannot usefully split what we cannot see)
                new_cents.append(by_id[cid])
        if len(new_cents) == len(cent_rows):
            # every hot cell's sample was too thin to split further —
            # no progress is possible, stop rather than loop (the
            # drain_saturated_cells discipline; exactness is
            # cell-agnostic either way)
            return cent_rows
        cent_rows = [(i + 1, cv) for i, cv in enumerate(new_cents)]
    return cent_rows
