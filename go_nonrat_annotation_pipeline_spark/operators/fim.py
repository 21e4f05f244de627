"""Fill-in-the-middle (FIM) span transform for pre-training corpora.

FIM training (Bavarian et al. 2022, "Efficient Training of Language
Models to Fill in the Middle") rearranges a fraction of documents as
(prefix, suffix, middle) so the model learns infilling; the data side
is a deterministic per-document decision + two split points. The
operator keeps everything exact and engine-portable:

- the APPLY decision is the repo's standard md5 pct gate
  (fim_rate_ppm of docs get transformed; salt versions the draw);
- the two split points are independent md5 draws mod (len+1) over the
  document's CHARACTER length — uniform over all (lo ≤ hi) cut pairs
  after ordering, matching the paper's character-level splitting
  (§2.1: "we split the document into three pieces uniformly at
  random ... at the character level");
- output carries the three spans plus their lengths;
  prefix || middle || suffix == text ALWAYS (the reconstruction
  invariant the tests pin), and untransformed docs have the whole
  text as prefix with empty middle/suffix.

Pure map stage — column expressions only, no shuffle, no UDF; the
same expressions mirror in DuckDB via sql_fim_ctes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions import hashing as H

PPM = 1_000_000
DEFAULT_RATE_PPM = 500_000


def _cut(salt: str, tag: str, id_col: str, text_col: str) -> F.Column:
    """Deterministic cut point in [0, len] from md5(salt|tag|id).
    Length is over the COALESCED text (ADVICE r9: NULL text must cut
    at 0, not propagate NULL through h % (NULL+1) — the spans are
    sliced from the same coalesced text, so the invariant
    prefix || middle || suffix == coalesce(text, '') holds always)."""
    h = H.char_hash(
        F.concat(F.lit(f"{salt}|{tag}|"), F.col(id_col).cast("string"))
    )
    return h % (
        F.length(F.coalesce(F.col(text_col), F.lit(""))) + F.lit(1)
    )


def fim_transform(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    rate_ppm: int = DEFAULT_RATE_PPM,
    salt: str = "fim0",
) -> DataFrame:
    """``id_col, fim_applied, prefix, middle, suffix, len_prefix,
    len_middle, len_suffix`` — one row per input document."""
    gate = (
        H.char_hash(
            F.concat(F.lit(salt + "|g|"), F.col(id_col).cast("string"))
        )
        % PPM
        < rate_ppm
    )
    a, b = (
        _cut(salt, "a", id_col, text_col),
        _cut(salt, "b", id_col, text_col),
    )
    lo, hi = F.least(a, b), F.greatest(a, b)
    t = F.coalesce(F.col(text_col), F.lit(""))
    out = docs.select(
        F.col(id_col),
        t.alias("text"),
        gate.alias("fim_applied"),
        F.when(gate, lo).otherwise(F.length(t)).alias("_lo"),
        F.when(gate, hi).otherwise(F.length(t)).alias("_hi"),
    )
    prefix = F.expr("substring(text, 1, _lo)")
    middle = F.expr("substring(text, _lo + 1, _hi - _lo)")
    suffix = F.expr("substring(text, _hi + 1, length(text) - _hi)")
    return out.select(
        id_col,
        "fim_applied",
        prefix.alias("prefix"),
        middle.alias("middle"),
        suffix.alias("suffix"),
        F.length(prefix).cast("long").alias("len_prefix"),
        F.length(middle).cast("long").alias("len_middle"),
        F.length(suffix).cast("long").alias("len_suffix"),
    )


def sql_fim_ctes(
    table: str = "documents",
    rate_ppm: int = DEFAULT_RATE_PPM,
    salt: str = "fim0",
) -> str:
    """DuckDB mirror as CTEs defining ``fim_out`` (same columns as
    :func:`fim_transform`). Avoid names fim_* around it."""
    def cut(tag: str) -> str:
        h = H.sql_char_hash(f"'{salt}|{tag}|' || CAST(doc_id AS VARCHAR)")
        return f"({h} % (LENGTH(COALESCE(text, '')) + 1))"

    gate = (
        H.sql_char_hash(f"'{salt}|g|' || CAST(doc_id AS VARCHAR)")
        + f" % {PPM} < {rate_ppm}"
    )
    return f"""
    fim_src AS (
      SELECT doc_id, COALESCE(text, '') AS text, {gate} AS fim_applied,
             {cut('a')} AS fim_a, {cut('b')} AS fim_b
      FROM {table}
    ), fim_cuts AS (
      SELECT doc_id, text, fim_applied,
             CASE WHEN fim_applied THEN LEAST(fim_a, fim_b)
                  ELSE LENGTH(text) END AS fim_lo,
             CASE WHEN fim_applied THEN GREATEST(fim_a, fim_b)
                  ELSE LENGTH(text) END AS fim_hi
      FROM fim_src
    ), fim_out AS (
      SELECT doc_id, fim_applied,
             SUBSTRING(text, 1, fim_lo) AS prefix,
             SUBSTRING(text, fim_lo + 1, fim_hi - fim_lo) AS middle,
             SUBSTRING(text, fim_hi + 1, LENGTH(text) - fim_hi) AS suffix,
             CAST(fim_lo AS BIGINT) AS len_prefix,
             CAST(fim_hi - fim_lo AS BIGINT) AS len_middle,
             CAST(LENGTH(text) - fim_hi AS BIGINT) AS len_suffix
      FROM fim_cuts
    )
"""
