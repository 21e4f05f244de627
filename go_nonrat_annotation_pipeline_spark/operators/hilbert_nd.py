"""N-dimensional Hilbert-curve keys (generalizes operators/hilbert.py).

The 2-D module unrolls the classic xy→d quadrant fold; that recurrence
does not generalize past two dimensions, so the N-D key uses Skilling's
transpose algorithm (J. Skilling, "Programming the Hilbert curve", AIP
Conf. Proc. 707, 2004): map the coordinate vector to its "transposed"
Hilbert form with b-1 rounds of per-axis invert/exchange plus one Gray
step, then read the index by interleaving the transposed bits. Every
round is a handful of AND/XOR/CASE updates over n BIGINT state columns,
so the whole key stays inside whole-stage codegen — no UDFs, no shuffle
(same posture as the 2-D fold; SCALE.md records both throughputs).

Cross-engine discipline: ONE generator emits each step's expression
text for both engines; the only engine-specific token is XOR itself
(Spark SQL ``a ^ b``; DuckDB ``xor(a, b)`` — ``^`` is POWER there, the
round-7 lesson), injected via a formatter. The inner invert/exchange
loop mutates X[0] sequentially, so each loop iteration is one
simultaneous two-column step; the sequential Gray pass collapses to a
single simultaneous step via prefix-XOR.

Also here (the write-path half of VERDICT r7 #6):

- ``layout_by_hilbert(df, cols, n_files)``: range-partition + sort by
  the curve key — the distributed layout write (NO global single-task
  sort; each output file covers one contiguous curve segment).
- ``z_value_nd``: n-ary Morton interleave, the fair baseline for the
  d=3 file-skipping probe (tools/skipping_probe.py).
"""

from __future__ import annotations

from typing import Callable, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

XorFmt = Callable[[str, str], str]


def xor_spark(a: str, b: str) -> str:
    return f"({a} ^ {b})"


def xor_duckdb(a: str, b: str) -> str:
    return f"xor({a}, {b})"


def _transpose_steps(n: int, bits: int, xor: XorFmt):
    """The AxesToTranspose fold as a list of SIMULTANEOUS steps.

    Each step is ``fn(names) -> {axis_index: new_expr_text}`` reading
    pre-step state column names; axes absent from the dict pass
    through unchanged. Simultaneity is exact: within one step every
    expression reads only pre-step names.
    """
    steps = []
    q = 1 << (bits - 1)
    while q > 1:
        p = q - 1
        for i in range(n):

            def step(names, i=i, q=q, p=p):
                x0, xi = names[0], names[i]
                t = f"({xor(x0, xi)} & {p})"
                upd = {
                    0: (
                        f"(CASE WHEN ({xi} & {q}) > 0 THEN {xor(x0, str(p))} "
                        f"ELSE {xor(x0, t)} END)"
                    )
                }
                if i != 0:
                    upd[i] = (
                        f"(CASE WHEN ({xi} & {q}) > 0 THEN {xi} "
                        f"ELSE {xor(xi, t)} END)"
                    )
                return upd

            steps.append(step)
        q >>= 1

    def gray(names):
        # X[i] ^= X[i-1] ascending over UPDATED values == prefix-XOR of
        # the pre-step values — one simultaneous step.
        upd = {}
        for i in range(1, n):
            e = names[0]
            for k in range(1, i + 1):
                e = xor(e, names[k])
            upd[i] = e
        return upd

    steps.append(gray)

    def final(names, q0=1 << (bits - 1)):
        tparts = []
        q = q0
        while q > 1:
            tparts.append(
                f"(CASE WHEN ({names[n - 1]} & {q}) > 0 "
                f"THEN {q - 1} ELSE 0 END)"
            )
            q >>= 1
        t = tparts[0]
        for part in tparts[1:]:
            t = xor(t, part)
        return {i: xor(names[i], t) for i in range(n)}

    steps.append(final)
    return steps


def _index_expr(names: Sequence[str], n: int, bits: int) -> str:
    """Interleave the transposed bits into the Hilbert index: MSB-first
    the j-th bit of X[0], X[1], …, X[n-1]. Pure AND/CASE arithmetic —
    shared text, no shift operators needed."""
    terms = []
    for j in range(bits):
        for i in range(n):
            pos = j * n + (n - 1 - i)
            terms.append(
                f"(CASE WHEN ({names[i]} & {1 << j}) > 0 "
                f"THEN {1 << pos} ELSE 0 END)"
            )
    return "CAST(" + " + ".join(terms) + " AS BIGINT)"


def with_hilbert_key_nd(
    df: DataFrame,
    dim_cols: Sequence[str],
    bits: int = 6,
    out_col: str = "hkey",
) -> DataFrame:
    """Append BIGINT ``out_col`` = N-D Hilbert index of ``dim_cols``
    (each assumed already reduced to [0, 2^bits)). n·bits must fit a
    BIGINT; one withColumns per fold step keeps every step's reads on
    pre-step state."""
    n = len(dim_cols)
    if n < 2:
        raise ValueError("need at least 2 dimensions")
    if bits < 2:
        raise ValueError(
            "bits must be >= 2 (Skilling's final fold reads the top "
            f"transposed bit; bits={bits} has none below it)"
        )
    if n * bits > 62:
        raise ValueError(f"n*bits = {n * bits} overflows BIGINT")
    names = [f"_hnd{i}" for i in range(n)]
    out = df.withColumns(
        {names[i]: F.col(c).cast("long") for i, c in enumerate(dim_cols)}
    )
    for step in _transpose_steps(n, bits, xor_spark):
        upd = step(names)
        out = out.withColumns({names[i]: F.expr(e) for i, e in upd.items()})
    return out.withColumn(out_col, F.expr(_index_expr(names, n, bits))).drop(
        *names
    )


def sql_hilbert_nd_ctes(
    source_cte: str,
    n: int,
    bits: int = 6,
    carry_cols: tuple[str, ...] = (),
    out_col: str = "hkey",
) -> str:
    """DuckDB mirror as chained CTEs. ``source_cte`` must provide
    columns ``hx0_0 … hx{n-1}_0`` plus ``carry_cols``. Defines
    ``hnd_final`` (out_col BIGINT + carry_cols). Per-step distinct
    column names (hx{i}_{s}) — no lateral-alias reliance (the r7
    lesson). Avoid names hnd_* around it."""
    if n < 2:
        raise ValueError("need at least 2 dimensions")
    if bits < 2:
        raise ValueError(
            "bits must be >= 2 (Skilling's final fold reads the top "
            f"transposed bit; bits={bits} has none below it)"
        )
    carry = "".join(f", {c}" for c in carry_cols)
    parts = []
    prev = source_cte
    names = [f"hx{i}_0" for i in range(n)]
    for s, step in enumerate(_transpose_steps(n, bits, xor_duckdb), start=1):
        upd = step(names)
        nxt = [f"hx{i}_{s}" for i in range(n)]
        cols = ", ".join(
            f"{upd.get(i, names[i])} AS {nxt[i]}" for i in range(n)
        )
        parts.append(f"hnd_{s} AS (SELECT {cols}{carry} FROM {prev})")
        prev = f"hnd_{s}"
        names = nxt
    parts.append(
        f"hnd_final AS (SELECT {_index_expr(names, n, bits)} AS {out_col}"
        f"{carry} FROM {prev})"
    )
    return ",\n    ".join(parts)


def z_value_nd(cols: Sequence[Column], bits: int = 6) -> Column:
    """n-ary Morton interleave: bit j of column i lands at position
    j·n + i. The straight generalization of layout.z_value, used as the
    apples-to-apples baseline in the d=3 skipping probe."""
    n = len(cols)
    terms = []
    for j in range(bits):
        for i, c in enumerate(cols):
            b = F.shiftright(c.cast("long"), j).bitwiseAND(F.lit(1))
            terms.append(b * F.lit(1 << (j * n + i)))
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out.cast("long")


def sql_z_value_nd(exprs: Sequence[str], bits: int = 6) -> str:
    """DuckDB mirror of :func:`z_value_nd` (// and % arithmetic)."""
    n = len(exprs)
    terms = []
    for j in range(bits):
        for i, e in enumerate(exprs):
            terms.append(f"((({e}) // {1 << j}) % 2) * {1 << (j * n + i)}")
    return "CAST(" + " + ".join(terms) + " AS BIGINT)"


def layout_by_hilbert(
    df: DataFrame,
    dim_cols: Sequence[str],
    n_files: int,
    bits: int = 8,
    key_col: str = "_hilbert_layout_key",
) -> DataFrame:
    """The layout WRITE: range-partition the table into ``n_files``
    contiguous Hilbert-curve segments and sort each partition by the
    key, so ``df_out.write.parquet(...)`` emits one tight-enveloped
    file per partition. Distributed end to end — range partitioning
    samples boundaries, no global single-task sort (the scale posture
    the 2-D locality query's docstring promises). 2-D inputs use the
    attested quadrant fold; 3-D+ the Skilling transform."""
    if len(dim_cols) == 2:
        from .hilbert import with_hilbert_key

        keyed = with_hilbert_key(
            df, dim_cols[0], dim_cols[1], bits, out_col=key_col
        )
    else:
        keyed = with_hilbert_key_nd(df, dim_cols, bits, out_col=key_col)
    return (
        keyed.repartitionByRange(n_files, key_col)
        .sortWithinPartitions(key_col)
        .drop(key_col)
    )
