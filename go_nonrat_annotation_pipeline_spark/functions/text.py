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


def gopher_features(text: Column) -> dict[str, Column]:
    """Gopher-style document quality features (Rae et al. 2021, §A1.1),
    integer-exact so both engines agree bit-for-bit.

    All ratios are scaled integers (x100 / permille) via FLOOR of a
    single per-row IEEE double division — deterministic and identical
    across engines (the float-discipline rule in plans/registry.py is
    about order-dependent multi-row accumulation, which this is not),
    with explicit FLOOR because Spark's double→long cast truncates
    while DuckDB's rounds. Entirely map-side: every feature is a
    codegen expression over the word array, no explode, no shuffle.
    """
    ws = words(text)
    n_words = F.size(ws)
    # sum of word lengths == chars minus the (n-1) separating spaces
    char_sum = F.length(text) - (n_words - F.lit(1))
    alpha_words = F.size(F.filter(ws, lambda w: w.rlike("^[a-z]+$")))
    stop_hits = stopword_count(ws, STOP_EN)
    return {
        "n_words": n_words.cast("long"),
        "mean_word_len_x100": F.floor(char_sum * 100 / n_words).cast("long"),
        "alpha_word_permille": F.floor(alpha_words * 1000 / n_words).cast("long"),
        "stop_hits": stop_hits.cast("long"),
    }


def gopher_pass(feats: dict[str, Column], min_words: int = 10, max_words: int = 100_000) -> Column:
    """The Gopher keep/drop decision over :func:`gopher_features`:
    word count in range, mean word length in [3, 10] chars, >=70% purely
    alphabetic words, >=2 English stopword hits."""
    return (
        (feats["n_words"] >= min_words)
        & (feats["n_words"] <= max_words)
        & (feats["mean_word_len_x100"] >= 300)
        & (feats["mean_word_len_x100"] <= 1000)
        & (feats["alpha_word_permille"] >= 700)
        & (feats["stop_hits"] >= 2)
    )


def dup_shingle_permille(wh: Column, n: int = 5) -> Column:
    """Repetition signal: fraction (permille) of n-gram shingles that are
    duplicates of an earlier shingle in the same doc. Map-side only —
    the shingle array never leaves the row."""
    from . import hashing as H

    sh = H.shingle_hashes(wh, n)
    n_sh = F.size(sh)
    n_uniq = F.size(F.array_distinct(sh))
    return F.when(n_sh > 0, F.floor((n_sh - n_uniq) * 1000 / n_sh).cast("long")).otherwise(
        F.lit(0).cast("long")
    )


# ---------------------------------------------------------------------------
# DuckDB SQL builders (same constants / same arithmetic)
# ---------------------------------------------------------------------------
def sql_words(text_expr: str) -> str:
    return f"STRING_SPLIT({text_expr}, ' ')"


def sql_stopword_count(ws_expr: str, stopwords: list[str]) -> str:
    inlist = ", ".join(f"'{w}'" for w in stopwords)
    return f"LEN(LIST_FILTER({ws_expr}, w -> w IN ({inlist})))"


def sql_gopher_features(text_expr: str) -> dict[str, str]:
    """DuckDB mirrors of :func:`gopher_features` (same FLOOR-of-double
    arithmetic; LEN of STRING_SPLIT == Spark's size of split)."""
    ws = sql_words(text_expr)
    n_words = f"LEN({ws})"
    char_sum = f"(LENGTH({text_expr}) - ({n_words} - 1))"
    alpha = f"LEN(LIST_FILTER({ws}, w -> regexp_full_match(w, '[a-z]+')))"
    stop = sql_stopword_count(ws, STOP_EN)
    return {
        "n_words": f"CAST({n_words} AS BIGINT)",
        "mean_word_len_x100": f"CAST(FLOOR(CAST({char_sum} AS DOUBLE) * 100 / {n_words}) AS BIGINT)",
        "alpha_word_permille": f"CAST(FLOOR(CAST({alpha} AS DOUBLE) * 1000 / {n_words}) AS BIGINT)",
        "stop_hits": f"CAST({stop} AS BIGINT)",
    }


def sql_gopher_pass(feats: dict[str, str], min_words: int = 10, max_words: int = 100_000) -> str:
    return (
        f"({feats['n_words']} BETWEEN {min_words} AND {max_words}"
        f" AND {feats['mean_word_len_x100']} BETWEEN 300 AND 1000"
        f" AND {feats['alpha_word_permille']} >= 700"
        f" AND {feats['stop_hits']} >= 2)"
    )


def sql_dup_shingle_permille(wh_expr: str, n: int = 5) -> str:
    """DuckDB mirror of :func:`dup_shingle_permille`."""
    from . import hashing as H

    sh = H.sql_shingle_hashes(wh_expr, n)
    return (
        f"(SELECT CASE WHEN LEN(__dsh) > 0 THEN "
        f"CAST(FLOOR(CAST(LEN(__dsh) - LEN(LIST_DISTINCT(__dsh)) AS DOUBLE) * 1000 / LEN(__dsh)) AS BIGINT) "
        f"ELSE 0 END FROM (SELECT {sh} AS __dsh) __dst)"
    )


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
