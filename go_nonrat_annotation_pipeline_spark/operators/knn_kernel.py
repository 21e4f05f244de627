"""Arrow-kernel candidate generation for the exact cell-bounded
top-k / threshold-gate family — r13 optimization round module.

``sim_knn_exact_cells`` / ``stream_knn_exact`` /
``stream_semantic_decontam_gate_ann`` generated candidates as an
explode + broadcast join and scored EVERY candidate with the
interpreted 64-step higher-order cosine fold. On unclustered test data
the ball bounds admit every cell, so the candidate set degrades to the
full N×B brute force (358k pairs at sf0.1) and the interpreted folds
dominate the plan (guide §4.2: hand whole batches to vectorized native
code; §2.3: shuffle fewer bytes — the window/groupBy downstream used
to receive all N×B scored rows).

This module moves CANDIDATE SELECTION into one numpy kernel per Arrow
batch and leaves the oracle arithmetic where it was: the kernel emits,
per corpus row, a provable SUPERSET of the bench ids that can appear
in the exact answer; the caller re-scores ONLY those with the
oracle-exact expression cosine (operators/dedup.cosine, 6dp-rounded)
and ranks/filters exactly as before. Results are therefore identical
to brute force BY THE SAME ARGUMENT the family already uses:

- TOP-K (``topk_candidate_ids``): per row the kernel runs the same
  two passes as operators/knn_exact, in float64 numpy — seed cells by
  cumulative occupancy, kth-best kernel cosine among seeded members
  minus ``0.5e-6 + 1e-9`` as the prune bound tx (any LOWER bound on
  the row's true kth-best rounded cosine keeps the prune lossless, and
  kth_kernel - 0.5e-6 - 1e-9 <= round6(kth_exact) because kernel and
  expression cosines differ only by float reassociation ~1e-13 and
  round6(x) >= x - 0.5e-6) — then keeps every probed-cell member whose
  kernel cosine reaches ``kth_probed_kernel - _TIE_MARGIN``. A dropped
  member has exact cosine < exact_kth - (_TIE_MARGIN - 2e-13), which
  with _TIE_MARGIN = 2.5e-6 puts its ROUNDED cosine strictly below the
  kth-best rounded cosine — it can never enter the rounded,
  id-tiebroken top-k, so the emitted set contains every true top-k
  member and the exact re-rank returns exactly the brute-force answer.
- GATE (``gate_candidate_ids``): members of bound-passing cells with
  kernel cosine >= ``threshold - _TIE_MARGIN``. Every pair with
  rounded exact cosine >= threshold has exact >= threshold - 0.5e-6,
  hence kernel > threshold - _TIE_MARGIN — included; the downstream
  argmax + threshold filter over the superset therefore equals the
  argmax over all candidates (excluded members are strictly below
  threshold after rounding and cannot be the reported max).

Rows whose kernel arithmetic goes non-finite (zero-norm vectors
overflowing the clamped divide) emit ALL bench ids — degrade to brute
force for that row; the exact stage decides, so exactness never
depends on the kernel.

Scale posture: the bench side is dictionary-sized BY CONTRACT in this
family (its cells are folded literals and the member table is already
broadcast in full), so holding (ids, matrix, cells) in one Spark
broadcast is the same footprint the old broadcast join shipped. The
kernel processes rows in chunks sized so the (chunk × B) dot block
stays ≤ ~32 MB regardless of B; the cell bounds bound the EMITTED
candidates — which is what drives the downstream join + shuffle — at
exactly the volume the old explode-join plan carried.

Measured at sf0.1 (1801 corpus × 199 bench, unclustered = brute-force
regime): sim_knn_exact_cells 7.7s -> 1.6s for the identical result
set; the streaming twins drop proportionally per trigger.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.pandas.functions import pandas_udf

# covers the 6dp round-half boundary (5e-7) twice over plus the
# kernel-vs-expression reassociation delta (~1e-13); see module doc for
# why 2.5e-6 keeps even rounding TIES on the safe side
_TIE_MARGIN = 2.5e-6
_SLACK = 1e-6
# (chunk × B) float64 dot block stays ≤ ~32 MB
_CHUNK_CELLS = 4_000_000


def _bench_arrays(
    bench_rows: list[tuple[int, list[float]]],
    cells: list[tuple[int, list[float], float]],
):
    """Precompute the numpy tables a kernel closure needs: member ids,
    unit-ish norms, the member→cell index map (nearest centroid by
    cosine — assignment is value-neutral, it only steers pruning), and
    per-cell cap constants."""
    ids = np.asarray([int(i) for i, _ in bench_rows], dtype=np.int64)
    M = np.asarray(
        [np.asarray(v, dtype=np.float64) for _, v in bench_rows]
    )
    # true-zero-norm members never trip the non-finite fallback (the
    # 1e-300 clamp keeps their kernel cosine finite at 0) yet their
    # EXACT expression cosine is NaN, which Spark ranks ABOVE every
    # number in a descending sort and compares >= any threshold — so
    # they must ALWAYS be emitted as candidates or the superset
    # guarantee breaks on that edge case (ADVICE r13)
    mzero = np.linalg.norm(M, axis=1) == 0.0
    Mn = np.maximum(np.linalg.norm(M, axis=1), 1e-300)
    C = np.asarray(
        [np.asarray(cv, dtype=np.float64) for _, cv, _ in cells]
    )  # unit centroids from build_bench_cells
    # member → cell (argmax cosine, ties → lowest cell id; cells are
    # sorted by cid so argmax's first-max rule matches)
    mcell = np.argmax((M / Mn[:, None]) @ C.T, axis=1)
    res = np.zeros(len(cells))
    occ = np.zeros(len(cells))
    for j in range(len(cells)):
        sel = mcell == j
        occ[j] = int(sel.sum())
        if occ[j]:
            res[j] = float(
                np.max(np.linalg.norm(M[sel] / Mn[sel, None] - C[j], axis=1))
            )
    cosphi = np.clip(1.0 - (res * res) / 2.0, -1.0, 1.0)
    sinphi = np.sqrt(np.maximum(0.0, 1.0 - cosphi * cosphi))
    return ids, M, Mn, C, mcell, occ, cosphi, sinphi, mzero


def driver_train_sample(
    rows: list[tuple[int, list[float]]], target: int = 2000
) -> list[tuple[int, list[float]]]:
    """Driver-side mirror of operators/decontam_ann.train_sample for a
    bench that is ALREADY collected (dictionary-sized by contract):
    crc32 gate with a count-derived modulus, so the expected sample
    stays ~``target`` at any bench size (zlib.crc32 is the same
    CRC-32 Spark's crc32() computes over the UTF-8 id string). Cell
    quality affects pruning only, never results."""
    import zlib

    n = len(rows)
    if n == 0:
        return []
    mod = max(n // target, 1)
    out = [
        (i, v)
        for i, v in rows
        if zlib.crc32(str(i).encode()) % mod == 0
    ]
    return out or rows[:target]


def _chunks(n: int, b: int):
    step = max(1, _CHUNK_CELLS // max(b, 1))
    for lo in range(0, n, step):
        yield lo, min(n, lo + step)


def topk_candidate_ids(
    spark: SparkSession,
    vec_col: Column,
    bench_rows: list[tuple[int, list[float]]],
    cells: list[tuple[int, list[float], float]],
    k: int,
) -> Column:
    """array<long> of bench ids per corpus row — a provable superset of
    the row's exact rounded-cosine, id-tiebroken top-``k`` (module doc).
    """
    bc = spark.sparkContext.broadcast(_bench_arrays(bench_rows, cells))
    kk = int(k)

    @pandas_udf("array<long>")
    def cand(v: pd.Series) -> pd.Series:
        ids, M, Mn, C, mcell, occ, cosphi, sinphi, mzero = bc.value
        B = len(ids)
        if len(v) == 0:
            return pd.Series([], dtype="object")
        X = np.asarray([np.asarray(x, dtype=np.float64) for x in v])
        out: list[list[int]] = []
        all_ids = ids.tolist()
        with np.errstate(all="ignore"):
            # zero-norm corpus rows: kernel cosines are clamped-finite
            # but the exact cosine is NaN — degrade to all-ids so the
            # exact stage decides (ADVICE r13)
            xzero = np.linalg.norm(X, axis=1) == 0.0
            xn = np.maximum(np.linalg.norm(X, axis=1), 1e-300)
            for lo, hi in _chunks(len(X), B):
                Xc = X[lo:hi]
                xnc = xn[lo:hi, None]
                cd = (Xc @ C.T) / xnc  # (n, K) centroid cosines
                D = (Xc @ M.T) / xnc / Mn[None, :]  # (n, B) member cos
                finite = (
                    np.isfinite(D).all(axis=1)
                    & np.isfinite(cd).all(axis=1)
                    & ~xzero[lo:hi]
                )
                # seed pass: nearest cells (stable sort → lowest cid on
                # ties) until cumulative occupancy reaches k
                order = np.argsort(-cd, axis=1, kind="stable")
                occ_o = occ[order]
                cum = np.cumsum(occ_o, axis=1)
                prefix = np.concatenate(
                    [np.zeros((len(Xc), 1)), cum[:, :-1]], axis=1
                )
                seeded_o = prefix < kk
                seeded = np.zeros_like(seeded_o)
                np.put_along_axis(seeded, order, seeded_o, axis=1)
                smask = seeded[:, mcell]  # (n, B)
                scnt = smask.sum(axis=1)
                Vs = np.where(smask, D, -np.inf)
                tx = np.full(len(Xc), -np.inf)
                enough = scnt >= kk
                if B >= kk and enough.any():
                    kth = np.partition(Vs[enough], B - kk, axis=1)[
                        :, B - kk
                    ]
                    tx[enough] = kth - 5e-7 - 1e-9
                # prune pass: spherical-cap upper bound per cell
                d = np.clip(cd, -1.0, 1.0)
                ub = np.where(
                    d >= cosphi[None, :],
                    1.0,
                    d * cosphi[None, :]
                    + np.sqrt(np.maximum(0.0, 1.0 - d * d))
                    * sinphi[None, :],
                )
                probed = ub >= tx[:, None] - _SLACK
                pmask = probed[:, mcell]
                Vp = np.where(pmask, D, -np.inf)
                pcnt = pmask.sum(axis=1)
                keep_at = np.full(len(Xc), -np.inf)
                enough_p = pcnt >= kk
                if B >= kk and enough_p.any():
                    kth_p = np.partition(Vp[enough_p], B - kk, axis=1)[
                        :, B - kk
                    ]
                    keep_at[enough_p] = kth_p - _TIE_MARGIN
                # zero-norm bench members always emitted (module note:
                # their NaN exact cosine outranks every number)
                keep = (pmask & (D >= keep_at[:, None])) | mzero[None, :]
                for i in range(len(Xc)):
                    if not finite[i]:
                        out.append(all_ids)
                    else:
                        out.append(ids[keep[i]].tolist())
        return pd.Series(out)

    return cand(vec_col)


def gate_candidate_ids(
    spark: SparkSession,
    vec_col: Column,
    bench_rows: list[tuple[int, list[float]]],
    cells: list[tuple[int, list[float], float]],
    threshold: float,
) -> Column:
    """array<long> of bench ids per corpus row — a provable superset of
    every bench member whose 6dp-rounded exact cosine reaches
    ``threshold`` (module doc), restricted to bound-passing cells."""
    bc = spark.sparkContext.broadcast(_bench_arrays(bench_rows, cells))
    th = float(threshold)
    # same smin bound as operators/decontam_ann.probe_cells
    t_eff = max(-1.0, min(1.0, th - _SLACK))
    r = np.sqrt(max(0.0, 2.0 - 2.0 * t_eff))

    @pandas_udf("array<long>")
    def cand(v: pd.Series) -> pd.Series:
        ids, M, Mn, C, mcell, occ, cosphi, sinphi, mzero = bc.value
        B = len(ids)
        if len(v) == 0:
            return pd.Series([], dtype="object")
        res_eff = np.sqrt(np.maximum(0.0, 2.0 - 2.0 * cosphi))
        smin = 1.0 - (r + res_eff + _SLACK) ** 2 / 2.0
        X = np.asarray([np.asarray(x, dtype=np.float64) for x in v])
        out: list[list[int]] = []
        all_ids = ids.tolist()
        with np.errstate(all="ignore"):
            # zero-norm handling as in topk_candidate_ids (ADVICE r13):
            # NaN exact cosines compare >= any threshold in Spark
            xzero = np.linalg.norm(X, axis=1) == 0.0
            xn = np.maximum(np.linalg.norm(X, axis=1), 1e-300)
            for lo, hi in _chunks(len(X), B):
                Xc = X[lo:hi]
                xnc = xn[lo:hi, None]
                cd = (Xc @ C.T) / xnc
                D = (Xc @ M.T) / xnc / Mn[None, :]
                finite = (
                    np.isfinite(D).all(axis=1)
                    & np.isfinite(cd).all(axis=1)
                    & ~xzero[lo:hi]
                )
                probed = cd >= smin[None, :]
                keep = (
                    probed[:, mcell] & (D >= th - _TIE_MARGIN)
                ) | mzero[None, :]
                for i in range(len(Xc)):
                    if not finite[i]:
                        out.append(all_ids)
                    else:
                        out.append(ids[keep[i]].tolist())
        return pd.Series(out)

    return cand(vec_col)
