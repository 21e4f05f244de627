"""Deterministic per-epoch shuffle layout for training data loaders.

Multi-epoch training wants a DIFFERENT data order each epoch, but the
order must be reproducible (resume from step N re-reads the same
sequence) and must never require a global sort of the corpus. The
standard distributed answer: hash every doc into a shard and rank
within the shard by a per-epoch hash key — the global order is
(shard asc, rank asc), the permutation is fully determined by
(salt, epoch), and the only non-map work is a per-shard window
(partitioned, bounded by corpus/n_shards — never a single-task global
sort). Re-keying shard AND rank by epoch decorrelates consecutive
epochs' orders (the audit query measures it: same-shard survival drops
to ~1/n_shards and positional displacement approaches the uniform-
permutation expectation n/3).

Everything is the repo's shared md5 convention, so the DuckDB oracle
reproduces the exact permutation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

from ..functions import hashing as H


def epoch_layout(
    docs: DataFrame,
    epoch: int,
    n_shards: int = 64,
    id_col: str = "doc_id",
    salt: str = "ep0",
) -> DataFrame:
    """``id_col, shard, rank`` — the epoch's deterministic read order
    is (shard asc, rank asc)."""
    sh = F.pmod(
        H.char_hash(
            F.concat(
                F.lit(f"{salt}|{epoch}|s|"), F.col(id_col).cast("string")
            )
        ),
        F.lit(n_shards),
    ).cast("long")
    okey = H.char_hash(
        F.concat(F.lit(f"{salt}|{epoch}|o|"), F.col(id_col).cast("string"))
    )
    keyed = docs.select(
        F.col(id_col), sh.alias("shard"), okey.alias("_okey")
    )
    rank = F.row_number().over(
        Window.partitionBy("shard").orderBy("_okey", id_col)
    )
    return keyed.select(
        id_col, "shard", rank.cast("long").alias("rank")
    )


def sql_epoch_layout_cte(
    name: str,
    epoch: int,
    n_shards: int = 64,
    table: str = "documents",
    salt: str = "ep0",
) -> str:
    """DuckDB mirror: one CTE named ``name`` with (doc_id, shard, rank)."""
    sh = H.sql_char_hash(f"'{salt}|{epoch}|s|' || CAST(doc_id AS VARCHAR)")
    okey = H.sql_char_hash(f"'{salt}|{epoch}|o|' || CAST(doc_id AS VARCHAR)")
    return f"""
    {name} AS (
      SELECT doc_id,
             CAST(((({sh}) % {n_shards}) + {n_shards}) % {n_shards}
                  AS BIGINT) AS shard,
             CAST(ROW_NUMBER() OVER (
               PARTITION BY ((({sh}) % {n_shards}) + {n_shards}) % {n_shards}
               ORDER BY {okey}, doc_id) AS BIGINT) AS rank
      FROM {table}
    )"""


def global_positions(layout: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """``id_col, gpos``: the epoch's 1-based global read position —
    shard offsets come from one tiny per-shard count aggregate (the
    window below runs over n_shards rows, not the corpus)."""
    counts = layout.groupBy("shard").agg(
        F.count(F.lit(1)).cast("long").alias("_n")
    )
    offs = counts.select(
        "shard",
        (
            F.sum("_n").over(
                # n_shards rows: column-derived constant partition
                # keeps the tiny prefix window off the single-partition
                # warning path (repo convention)
                Window.partitionBy(F.col("shard") % 1)
                .orderBy("shard")
                .rowsBetween(Window.unboundedPreceding, -1)
            )
        ).alias("_off"),
    ).fillna(0, ["_off"])
    return layout.join(offs, "shard").select(
        id_col, (F.col("_off") + F.col("rank")).cast("long").alias("gpos")
    )
