"""Whole-document bin packing (first-fit-decreasing) for training
sequences.

The alternative layout to concat-and-chunk (operators/packing.py): when
cross-document attention contamination matters, documents must be
packed WHOLE into fixed-capacity sequences — no straddling — and the
objective is minimal wasted slack. First-fit-decreasing is the
classical guarantee: FFD uses at most 11/9·OPT + 6/9 bins (Dósa 2007),
and sorting by descending size makes the greedy placement deterministic.

Distributed shape: documents hash-shard exactly like packing.py
(hash60(salt|id) % n_shards — same epoch-permutation contract), and FFD
runs INDEPENDENTLY per shard inside one applyInPandas group. Shards are
the parallelism unit (O(10k) at 100 TB), each shard's fold is linear in
its doc count with a bins-sized scan state, and nothing corpus-sized
crosses the driver. Oversized documents (tok > capacity) are the
chunking path's job (plans/queries_sampling.q_doc_chunking) and are
excluded here, mirrored in the oracle.

The DuckDB mirror folds the same placement one document per step with a
recursive CTE carrying the per-shard bin-load LIST — bit-identical
assignment, which is exactly what the registry hash checks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .sketches import hash60, sql_hash60
from .util import ensure_parallelism

DEFAULT_BIN_CAP = 128
DEFAULT_SHARDS = 8


def _sized(
    docs: DataFrame,
    bin_cap: int,
    n_shards: int,
    id_col: str,
    text_col: str,
    salt: str,
) -> DataFrame:
    h = hash60(F.concat(F.lit(salt + "|"), F.col(id_col).cast("string")))
    tok = F.size(
        F.filter(F.split(F.col(text_col), " "), lambda x: x != "")
    ).cast("long")
    return (
        ensure_parallelism(docs.select(id_col, text_col))
        .select(id_col, (h % n_shards).alias("shard"), tok.alias("tok"))
        .where((F.col("tok") > 0) & (F.col("tok") <= bin_cap))
    )


def ffd_pack(
    docs: DataFrame,
    bin_cap: int = DEFAULT_BIN_CAP,
    n_shards: int = DEFAULT_SHARDS,
    id_col: str = "doc_id",
    text_col: str = "text",
    salt: str = "pack0",
) -> DataFrame:
    """(id, shard, bin_no, tok): FFD assignment, bins 1-based per shard.

    Placement order is (tok DESC, id) within the shard; each doc goes
    to the FIRST bin with room, else opens a new bin — the exact fold
    the recursive-CTE oracle replays.
    """
    import pandas as pd

    sized = _sized(docs, bin_cap, n_shards, id_col, text_col, salt)

    def pack(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values(
            ["tok", id_col], ascending=[False, True]
        )
        loads: list[int] = []
        bins: list[int] = []
        for t in pdf["tok"]:
            for i, ld in enumerate(loads):
                if ld + t <= bin_cap:
                    loads[i] = ld + t
                    bins.append(i + 1)
                    break
            else:
                loads.append(int(t))
                bins.append(len(loads))
        out = pdf[[id_col, "shard", "tok"]].copy()
        out["bin_no"] = pd.array(bins, dtype="int64")
        return out[[id_col, "shard", "bin_no", "tok"]]

    return sized.groupBy("shard").applyInPandas(
        pack, f"{id_col} long, shard long, bin_no long, tok long"
    )


def sql_ffd_ctes(
    table: str = "documents",
    bin_cap: int = DEFAULT_BIN_CAP,
    n_shards: int = DEFAULT_SHARDS,
    salt: str = "pack0",
) -> str:
    """DuckDB mirror as recursive CTEs defining ``bp_assign``
    (doc_id, shard, bin_no, tok). The fold advances every shard one
    document per recursion step, carrying each shard's bin-load list;
    `pos` (first bin with room) is LIST_POSITION over a fits-mask.
    Avoid the names bp_* around it. Requires WITH RECURSIVE."""
    h = sql_hash60(f"'{salt}|' || CAST(doc_id AS VARCHAR)")
    # NULLIF: DuckDB LIST_POSITION yields 0 (not NULL) on no-match
    pos = (
        f"NULLIF(LIST_POSITION(LIST_TRANSFORM(f.loads, "
        f"x -> x + d.tok <= {bin_cap}), true), 0)"
    )
    return f"""
    bp_base AS (
      SELECT doc_id, {h} % {n_shards} AS shard,
             CAST(LEN(LIST_FILTER(STRING_SPLIT(text, ' '),
                                  x -> x <> '')) AS BIGINT) AS tok
      FROM {table}
    ), bp_docs AS (
      SELECT doc_id, CAST(shard AS BIGINT) AS shard, tok,
             ROW_NUMBER() OVER (PARTITION BY shard
                                ORDER BY tok DESC, doc_id) AS idx
      FROM bp_base WHERE tok > 0 AND tok <= {bin_cap}
    ), bp_fold AS (
      SELECT shard, CAST(0 AS BIGINT) AS idx,
             CAST([] AS BIGINT[]) AS loads,
             CAST(NULL AS BIGINT) AS bin_no,
             CAST(NULL AS BIGINT) AS doc_id,
             CAST(NULL AS BIGINT) AS tok
      FROM (SELECT DISTINCT shard FROM bp_docs)
      UNION ALL
      SELECT f.shard, f.idx + 1,
             CASE WHEN {pos} IS NULL
                  THEN LIST_APPEND(f.loads, d.tok)
                  ELSE LIST_TRANSFORM(GENERATE_SERIES(1, LEN(f.loads)),
                       i -> CASE WHEN i = {pos}
                                 THEN f.loads[i] + d.tok
                                 ELSE f.loads[i] END)
             END,
             CAST(COALESCE({pos}, LEN(f.loads) + 1) AS BIGINT),
             d.doc_id, d.tok
      FROM bp_fold f
      JOIN bp_docs d ON d.shard = f.shard AND d.idx = f.idx + 1
    ), bp_assign AS (
      SELECT doc_id, shard, bin_no, tok FROM bp_fold WHERE idx > 0
    )"""
