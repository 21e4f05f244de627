from __future__ import annotations

from go_nonrat_annotation_pipeline_spark.operators.hilbert import (
    with_hilbert_key,
)


def _xy2d_reference(n: int, x: int, y: int) -> int:
    """Classic reference fold (Wikipedia form) for cross-checking."""
    d = 0
    s = n // 2
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x = s - 1 - x
                y = s - 1 - y
            x, y = y, x
        s //= 2
    return d


def _grid(spark, bits: int):
    n = 1 << bits
    rows = [(x * n + y, x, y) for x in range(n) for y in range(n)]
    df = spark.createDataFrame(rows, "rid long, x long, y long")
    out = with_hilbert_key(df, "x", "y", bits)
    return {(r.x, r.y): r.hkey for r in out.collect()}


def test_matches_reference_and_bijective(spark):
    bits = 3  # 8×8 grid, 64 cells
    n = 1 << bits
    got = _grid(spark, bits)
    assert len(set(got.values())) == n * n
    assert set(got.values()) == set(range(n * n))
    for (x, y), h in got.items():
        assert h == _xy2d_reference(n, x, y), (x, y)


def test_consecutive_cells_are_grid_neighbors(spark):
    # THE Hilbert property (what Z-order lacks): successive curve
    # positions differ by exactly one grid step
    bits = 4  # 16×16
    got = _grid(spark, bits)
    by_d = {h: xy for xy, h in got.items()}
    for d in range(len(by_d) - 1):
        (x0, y0), (x1, y1) = by_d[d], by_d[d + 1]
        assert abs(x0 - x1) + abs(y0 - y1) == 1, d
