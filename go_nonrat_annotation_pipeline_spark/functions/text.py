"""Text-analysis column functions (north-star extensions, BASELINE.json).

Language-ID (stopword-hit heuristic), quality scoring, token counting
(whitespace + BPE-ish regex), and document fingerprinting — all built on
pyspark.sql.functions (JVM-side), with matching DuckDB SQL builders so
each operator is oracle-checkable. Python is never in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# tiny per-language stopword lists for the n-gram/stopword-hit heuristic
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "to"],
    "de": ["der", "die", "und", "das"],
    "es": ["el", "la", "de", "y"],
    "fr": ["le", "la", "et", "les"],
}

# BPE-ish pre-tokenizer: letter runs | digit runs | single non-alnum marks
BPE_REGEX = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

STOP_EN = LANG_STOPWORDS["en"]


def words(text: Column) -> Column:
    return F.split(text, " ")


def whitespace_token_count(text: Column) -> Column:
    return F.size(words(text))


def bpe_token_count(text: Column) -> Column:
    return F.size(F.regexp_extract_all(text, F.lit(BPE_REGEX), F.lit(0)))


def stopword_count(ws: Column, stopwords: list[str]) -> Column:
    return F.size(F.filter(ws, lambda w: w.isin(*stopwords)))


def lang_scores(ws: Column) -> list[tuple[str, Column]]:
    """(lang, hit-count) per candidate language."""
    return [(lang, stopword_count(ws, sw)) for lang, sw in LANG_STOPWORDS.items()]


def predicted_lang(ws: Column) -> Column:
    """argmax over stopword hit counts; lexicographically-first lang wins
    ties (deterministic). Docs with zero hits anywhere → 'unknown'."""
    scores = lang_scores(ws)
    best = None
    for lang, score in scores:  # iteration order = insertion order = sorted-ish
        pair = F.struct(score.alias("s"), F.lit(lang).alias("l"))
        best = pair if best is None else F.when(
            (pair["s"] > best["s"]), pair
        ).otherwise(best)
    return F.when(best["s"] > 0, best["l"]).otherwise(F.lit("unknown"))


def quality_features(text: Column) -> dict[str, Column]:
    """Length / punctuation / stopword-ratio quality features."""
    ws = words(text)
    n_tok = F.size(ws)
    n_stop = stopword_count(ws, STOP_EN)
    n_punct = F.size(F.regexp_extract_all(text, F.lit(r"[^A-Za-z0-9\s]"), F.lit(0)))
    return {
        "n_chars_m": F.length(text),
        "n_tokens": n_tok,
        "avg_token_len": F.round(
            (F.length(text) - (n_tok - 1)) / n_tok.cast("double"), 6
        ),
        "stopword_ratio": F.round(n_stop / n_tok.cast("double"), 6),
        "punct_ratio": F.round(n_punct / F.length(text).cast("double"), 6),
    }


# ---------------------------------------------------------------------------
# DuckDB SQL builders (same constants / same arithmetic)
# ---------------------------------------------------------------------------
def sql_words(text_expr: str) -> str:
    return f"STRING_SPLIT({text_expr}, ' ')"


def sql_stopword_count(ws_expr: str, stopwords: list[str]) -> str:
    inlist = ", ".join(f"'{w}'" for w in stopwords)
    return f"LEN(LIST_FILTER({ws_expr}, w -> w IN ({inlist})))"


def sql_predicted_lang(ws_expr: str) -> str:
    """CASE-chain argmax mirroring predicted_lang's fold order."""
    langs = list(LANG_STOPWORDS)
    score = {
        lang: sql_stopword_count(ws_expr, sw) for lang, sw in LANG_STOPWORDS.items()
    }
    # fold: best = first; for each next: next wins only if strictly greater
    expr_s, expr_l = score[langs[0]], f"'{langs[0]}'"
    for lang in langs[1:]:
        s = score[lang]
        expr_l = f"CASE WHEN {s} > {expr_s} THEN '{lang}' ELSE {expr_l} END"
        expr_s = f"CASE WHEN {s} > {expr_s} THEN {s} ELSE {expr_s} END"
    return f"CASE WHEN {expr_s} > 0 THEN {expr_l} ELSE 'unknown' END"
