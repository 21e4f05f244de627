"""Hilbert-curve layout keys (the locality-stronger sibling of Z-order).

Multi-dimensional clustering for file skipping: sorting a fact table by
a space-filling curve over two filter columns co-locates rows that are
close in BOTH dimensions, so min/max file statistics prune more files
for 2-D range predicates. Z-order (operators/layout.py family) is the
cheap bit-interleave; the Hilbert curve removes Z-order's long diagonal
jumps — consecutive curve positions are always grid neighbors — which
is why lakehouse engines offer it as the premium layout. The registered
locality audit measures exactly that advantage (total grid distance
walked along the sort order).

Implementation: the classic per-bit fold (xy→d with quadrant rotation),
UNROLLED over the fixed bit depth as plain integer CASE arithmetic. One
shared snippet generator emits the same text per bit level for BOTH
engines — Spark evaluates it with F.expr (whole-stage codegen, no
UDFs), DuckDB as chained CTE selects with per-level column names — so
the key is bit-identical by construction. The quadrant increment
(3·rx) XOR ry is spelled as a 4-way CASE because `^` means power in
DuckDB but XOR in Spark SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_BITS = 8  # 256×256 grid → keys in [0, 65536)


def _level_exprs(s: int, x: str, y: str, d: str) -> tuple[str, str, str]:
    """(d', x', y') expression texts for one fold level with side
    length ``s``, reading state columns named x/y/d — identical text
    on both engines."""
    rx = f"(CASE WHEN ({x} & {s}) > 0 THEN 1 ELSE 0 END)"
    ry = f"(CASE WHEN ({y} & {s}) > 0 THEN 1 ELSE 0 END)"
    d_inc = (
        f"(CASE WHEN {rx} = 0 AND {ry} = 0 THEN 0 "
        f"WHEN {rx} = 0 AND {ry} = 1 THEN 1 "
        f"WHEN {rx} = 1 AND {ry} = 1 THEN 2 "
        f"ELSE 3 END)"
    )
    # rotate the quadrant: flip when ry=0∧rx=1, then swap when ry=0
    xt = f"(CASE WHEN {ry} = 0 AND {rx} = 1 THEN {s} - 1 - {x} ELSE {x} END)"
    yt = f"(CASE WHEN {ry} = 0 AND {rx} = 1 THEN {s} - 1 - {y} ELSE {y} END)"
    return (
        f"{d} + {s * s} * {d_inc}",
        f"(CASE WHEN {ry} = 0 THEN {yt} ELSE {xt} END)",
        f"(CASE WHEN {ry} = 0 THEN {xt} ELSE {yt} END)",
    )


def with_hilbert_key(
    df: DataFrame,
    x_col: str,
    y_col: str,
    bits: int = DEFAULT_BITS,
    out_col: str = "hkey",
) -> DataFrame:
    """Append BIGINT ``out_col`` = Hilbert index of (x, y), inputs
    assumed already reduced to [0, 2^bits). Pure expressions — stays
    in whole-stage codegen. Each level's three updates are computed in
    ONE withColumns call so they all read the pre-level state."""
    out = df.withColumns(
        {
            "_hx": F.col(x_col).cast("long"),
            "_hy": F.col(y_col).cast("long"),
            "_hd": F.lit(0).cast("long"),
        }
    )
    s = 1 << (bits - 1)
    while s > 0:
        ed, ex, ey = _level_exprs(s, "_hx", "_hy", "_hd")
        out = out.withColumns(
            {"_hd": F.expr(ed), "_hx": F.expr(ex), "_hy": F.expr(ey)}
        )
        s //= 2
    return out.withColumn(out_col, F.col("_hd")).drop("_hx", "_hy", "_hd")


def sql_hilbert_ctes(
    source_cte: str,
    bits: int = DEFAULT_BITS,
    carry_cols: tuple[str, ...] = (),
) -> str:
    """DuckDB mirror: chained CTEs folding the same levels. The source
    CTE named ``source_cte`` must provide columns (hx0, hy0, hd0) plus
    ``carry_cols`` (passed through every level). Defines ``hk_final``
    (hkey BIGINT + carry_cols). Avoid names hk_* around it.

    Per-level column names (hd{i}, hx{i}, hy{i}) keep every reference
    unambiguous — no reliance on lateral-alias resolution rules."""
    carry = "".join(f", {c}" for c in carry_cols)
    parts = []
    s = 1 << (bits - 1)
    i = 0
    prev = source_cte
    while s > 0:
        ed, ex, ey = _level_exprs(s, f"hx{i}", f"hy{i}", f"hd{i}")
        j = i + 1
        parts.append(
            f"hk_{j} AS (SELECT {ed} AS hd{j}, {ex} AS hx{j}, "
            f"{ey} AS hy{j}{carry} FROM {prev})"
        )
        prev = f"hk_{j}"
        i = j
        s //= 2
    parts.append(
        f"hk_final AS (SELECT CAST(hd{i} AS BIGINT) AS hkey"
        f"{carry} FROM {prev})"
    )
    return ",\n    ".join(parts)
