"""Unicode normalization for corpus text.

Real crawl corpora mix composed and decomposed Unicode forms (é as
U+00E9 vs e+U+0301): identical-looking strings that hash differently,
silently defeating exact dedup, shingle hashing, and tokenizer merges.
NFC canonicalization is therefore the first step of every serious text
pipeline (CCNet, Gopher, and friends normalize before anything else).

Spark has no built-in Unicode normalizer, so this is a legitimate
Python-path operator: Arrow-batched mapInPandas over stdlib
``unicodedata`` (vectorized at the batch level; no JVM round-trips per
row). The DuckDB oracle uses the engine-native ``nfc_normalize`` —
both implement the same Unicode canonical-composition algorithm, so
results are bit-identical (the registered query proves it on text with
injected combining marks).

The whitespace/control canonicalizer stays fully JVM-side: explicit
character classes (not ``\\s``) keep the regex in the Java∩RE2 common
dialect the PII operators established.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from .util import ensure_parallelism


def nfc_normalize(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, text_nfc): NFC-canonicalized text via Arrow batches."""
    import unicodedata

    def gen(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            out = pdf[[id_col]].copy()
            out["text_nfc"] = [
                None if s is None else unicodedata.normalize("NFC", s)
                for s in pdf[text_col]
            ]
            yield out

    src = ensure_parallelism(docs.select(id_col, text_col))
    return src.mapInPandas(gen, f"{id_col} long, text_nfc string")


# explicit class, NOT \s: Java \s includes \x0B, RE2's does not —
# the PII operators' dialect-intersection rule
_WS_RUN = "[ \\t\\n\\r]+"


def canonicalize_ws(text: Column) -> Column:
    """Collapse whitespace runs to single spaces and trim — JVM-side,
    dialect-safe (same expression mirrors to DuckDB regexp_replace
    with the 'g' flag)."""
    return F.trim(F.regexp_replace(text, _WS_RUN, " "))


def sql_canonicalize_ws(expr: str) -> str:
    return f"TRIM(REGEXP_REPLACE({expr}, '{_WS_RUN}', ' ', 'g'))"
