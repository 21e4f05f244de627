"""Token-exact concat-and-chunk sequence packing.

The layout step between a curated corpus and a pre-training dataloader:
documents are concatenated in a deterministic pseudorandom order and the
token stream is cut every ``seq_len`` tokens (the GPT-style "pack and
split" layout — every sequence is exactly full and a document may
straddle a sequence boundary). This is the token-exact complement to the
coarse char-binning of plans/queries_sampling.q_sequence_packing: here
the operator accounts for WHICH sequences each document lands in and how
many tokens it contributes to each, so downstream can audit boundary
crossings (attention-mask resets, loss-mask trimming) instead of only
window fill.

Spark-first shape:
- token counts and shard assignment are pure map-side expressions
  (whitespace tokenization — functions/text.py convention — and the
  cross-engine md5 hash60);
- the ONLY exchange is the hash partition by shard for the per-shard
  running-offset window (exclusive prefix sum). Shards are the
  parallelism unit: at 100 TB the shard count is O(10k), so no window
  funnels the corpus through one task;
- the doc→sequence explode is bounded by ceil(tokens/seq_len) + 1 rows
  per document — for seq_len ≫ typical doc length that is ≤ 2.

Everything is BIGINT end to end (offsets, sequence ids, token counts) —
nothing trips the driver's typed-hash boundary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

from .sketches import hash60, sql_hash60
from .util import ensure_parallelism

DEFAULT_SEQ_LEN = 64
DEFAULT_SHARDS = 8


def sql_spans_ctes(
    table: str = "documents",
    seq_len: int = DEFAULT_SEQ_LEN,
    n_shards: int = DEFAULT_SHARDS,
    salt: str = "epoch0",
    names: tuple[str, str, str] = ("pk_base", "spans", "spans2"),
) -> str:
    """DuckDB mirror of :func:`pack_doc_spans` as CTEs defining
    ``names[2]`` (doc_id, shard, off, tok, first_seq, last_seq) —
    avoid the three ``names`` around it (defaults pk_base/spans/spans2;
    pass distinct names to chain two epochs in one query). ``table``
    needs (doc_id, text)."""
    base_n, spans_n, spans2_n = names
    h = sql_hash60(f"'{salt}|' || CAST(doc_id AS VARCHAR)")
    return f"""
    {base_n} AS (
      SELECT doc_id,
             {h} AS h,
             {h} % {n_shards} AS shard,
             CAST(LEN(LIST_FILTER(STRING_SPLIT(text, ' '), x -> x <> ''))
                  AS BIGINT) AS tok
      FROM {table}
    ), {spans_n} AS (
      SELECT doc_id, CAST(shard AS BIGINT) AS shard,
             CAST(SUM(tok) OVER (PARTITION BY shard ORDER BY h, doc_id
                                 ROWS UNBOUNDED PRECEDING) - tok
                  AS BIGINT) AS off,
             tok
      FROM {base_n} WHERE tok > 0
    ), {spans2_n} AS (
      SELECT doc_id, shard, off, tok,
             off // {seq_len} AS first_seq,
             (off + tok - 1) // {seq_len} AS last_seq
      FROM {spans_n}
    )
"""


def _tok_count(text_col: str) -> F.Column:
    """Whitespace token count, empty tokens dropped (cross-engine
    mirror: LEN(LIST_FILTER(STRING_SPLIT(text, ' '), x -> x <> '')))."""
    return F.size(
        F.filter(F.split(F.col(text_col), " "), lambda x: x != "")
    ).cast("long")


def pack_doc_spans(
    docs: DataFrame,
    seq_len: int = DEFAULT_SEQ_LEN,
    n_shards: int = DEFAULT_SHARDS,
    id_col: str = "doc_id",
    text_col: str = "text",
    salt: str = "epoch0",
) -> DataFrame:
    """Per-document packing coordinates: which shard the doc streams
    into, its exclusive token offset within the shard's concatenated
    stream, and the first/last sequence index it touches.

    Order within a shard is (hash60(salt|id), id) — deterministic,
    replayable, decorrelated from source/time locality; a new ``salt``
    is a new epoch permutation. Zero-token documents are excluded (they
    occupy no stream positions).

    Columns: ``id_col, shard, off, tok, first_seq, last_seq, n_seqs``.
    """
    h = hash60(F.concat(F.lit(salt + "|"), F.col(id_col).cast("string")))
    base = (
        ensure_parallelism(docs.select(id_col, text_col))
        .select(
            id_col,
            h.alias("_h"),
            (h % n_shards).alias("shard"),
            _tok_count(text_col).alias("tok"),
        )
        .where(F.col("tok") > 0)
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("_h", id_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    off = (F.sum("tok").over(w) - F.col("tok")).alias("off")
    spans = base.select(id_col, "shard", off, "tok").select(
        id_col,
        "shard",
        "off",
        "tok",
        # integer DIV, not float division: for offsets beyond ~2^51
        # tokens the rounded double quotient can cross an integer
        # boundary and diverge from the oracle's `//` (ADVICE r6)
        F.expr(f"off DIV {int(seq_len)}").alias("first_seq"),
        F.expr(f"(off + tok - 1) DIV {int(seq_len)}").alias("last_seq"),
    )
    return spans.withColumn(
        "n_seqs", (F.col("last_seq") - F.col("first_seq") + 1).cast("long")
    )


def pack_seq_map(
    docs: DataFrame,
    seq_len: int = DEFAULT_SEQ_LEN,
    n_shards: int = DEFAULT_SHARDS,
    id_col: str = "doc_id",
    text_col: str = "text",
    salt: str = "epoch0",
) -> DataFrame:
    """Doc × sequence membership with exact token contributions:
    one row per (document, sequence) pair the document overlaps, with
    ``seq_tok`` = tokens the doc contributes to that sequence and
    ``carried_in`` = 1 when the doc started in an earlier sequence
    (i.e. it crosses into this one mid-document — the rows an
    attention-mask auditor cares about). Explode is bounded by
    ceil(tok/seq_len) + 1 per doc."""
    spans = pack_doc_spans(
        docs, seq_len, n_shards, id_col, text_col, salt
    )
    exploded = spans.select(
        id_col,
        "shard",
        "off",
        "tok",
        F.explode(
            F.sequence(F.col("first_seq"), F.col("last_seq"))
        ).alias("seq"),
    )
    lo = F.greatest(F.col("off"), F.col("seq") * seq_len)
    hi = F.least(F.col("off") + F.col("tok"), (F.col("seq") + 1) * seq_len)
    return exploded.select(
        id_col,
        "shard",
        F.col("seq").cast("long").alias("seq"),
        (hi - lo).cast("long").alias("seq_tok"),
        F.when(F.col("off") < F.col("seq") * seq_len, F.lit(1))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("carried_in"),
    )


def pack_sequence_report(
    docs: DataFrame,
    seq_len: int = DEFAULT_SEQ_LEN,
    n_shards: int = DEFAULT_SHARDS,
    id_col: str = "doc_id",
    text_col: str = "text",
    salt: str = "epoch0",
) -> DataFrame:
    """Per-sequence packing audit: ``shard, seq, n_docs, n_tokens,
    n_carried, is_full`` — every sequence except each shard's tail has
    n_tokens == seq_len exactly (the defining property of
    concat-and-chunk). One extra aggregate over the seq map."""
    m = pack_seq_map(docs, seq_len, n_shards, id_col, text_col, salt)
    return m.groupBy("shard", "seq").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("seq_tok").cast("long").alias("n_tokens"),
        F.sum("carried_in").cast("long").alias("n_carried"),
    ).select(
        "shard",
        "seq",
        "n_docs",
        "n_tokens",
        "n_carried",
        F.when(F.col("n_tokens") == seq_len, F.lit(1))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("is_full"),
    )
