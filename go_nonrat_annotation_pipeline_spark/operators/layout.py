"""Data-layout operators: Z-order clustering keys and compaction planning.

At 100 TB the dominant cost of most queries is the scan, and the scan
cost is set by LAYOUT: how rows map to files decides how many files a
two-predicate query can skip and how many small files the driver must
schedule. These operators compute layout decisions as plain DataFrame
transformations so they compose with any writer:

- ``z_value`` interleaves the bits of two bounded integer keys into one
  morton key; ``df.repartitionByRange(N, z).sortWithinPartitions(z)``
  then yields files whose min/max envelopes are tight on BOTH source
  columns, so parquet row-group / file pruning works for predicates on
  either key (the effect multi-dimensional OPTIMIZE ZORDER gives Delta).
  Pure per-row arithmetic — shifts and masks inside codegen.

- ``compaction_plan`` assigns size-carrying units greedily to target-
  sized output bins with ONE window cumulative sum: bin boundaries fall
  wherever the running total crosses a multiple of the target. This is
  the planning half of an OPTIMIZE/small-file-compaction pass; at scale
  it runs over the table's file manifest (driver-side metadata, millions
  of rows at most), never the data.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def z_value(x: Column, y: Column, bits: int = 16) -> Column:
    """Morton (Z-order) interleave of the low ``bits`` bits of x and y:
    even result bits from x, odd from y. Inputs are masked to ``bits``
    (callers normalize first — e.g. bucketize or mod — so truncation is
    explicit upstream, not silent here)."""
    terms = []
    for b in range(bits):
        xb = F.shiftright(x.cast("long"), b).bitwiseAND(F.lit(1))
        yb = F.shiftright(y.cast("long"), b).bitwiseAND(F.lit(1))
        terms.append(xb * F.lit(1 << (2 * b)) + yb * F.lit(1 << (2 * b + 1)))
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out.cast("long")


def sql_z_value(x_expr: str, y_expr: str, bits: int = 16) -> str:
    """DuckDB mirror of :func:`z_value` (arithmetic shifts: // and %)."""
    terms = []
    for b in range(bits):
        xb = f"(({x_expr}) // {1 << b}) % 2"
        yb = f"(({y_expr}) // {1 << b}) % 2"
        terms.append(f"({xb}) * {1 << (2 * b)} + ({yb}) * {1 << (2 * b + 1)}")
    return "CAST(" + " + ".join(terms) + " AS BIGINT)"


def compaction_plan(
    files: DataFrame,
    size_col: str,
    order_cols: list[str],
    target: int,
) -> DataFrame:
    """Assign each unit to an output bin: adds ``bin`` (BIGINT).

    Greedy first-fit in ``order_cols`` order via a running total:
    bin = floor((cumsum_before) / target). Units larger than ``target``
    occupy their bin(s) alone, exactly like oversize files in a real
    compaction pass. One window over one global sort — at manifest
    scale (file metadata) this is a single-task-friendly plan; partition
    the window by table-partition columns to parallelize further.
    """
    w = Window.orderBy(*order_cols).rowsBetween(Window.unboundedPreceding, -1)
    before = F.coalesce(F.sum(size_col).over(w), F.lit(0))
    return files.withColumn("bin", F.floor(before / F.lit(target)).cast("long"))


def sql_compaction_plan(
    from_sql: str, size_expr: str, order_by: str, target: int
) -> str:
    """DuckDB mirror: same window, same FLOOR arithmetic. Yields all
    source columns plus ``bin``."""
    return f"""
    SELECT *, CAST(FLOOR(CAST(COALESCE(SUM({size_expr}) OVER (
        ORDER BY {order_by} ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
      ), 0) AS DOUBLE) / {target}) AS BIGINT) AS bin
    FROM {from_sql}
    """
