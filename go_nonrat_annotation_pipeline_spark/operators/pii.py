"""PII detection / redaction over text columns.

Training-data curation staple (CCNet / RefinedWeb-style pipelines scrub
contact info before anything ships to a training mix): match a fixed
set of PII regexes per document, count hits per class, and rewrite the
text with typed placeholders.

Everything is JVM-side `regexp_count` / `regexp_replace` — pure
map-side, no shuffle, no Python. At 100 TB this is a narrow scan-stage
transform that fuses into whole-stage codegen with whatever filter
feeds it; the only cost is the regex engine itself.

Pattern dialect: the patterns below restrict themselves to the syntax
subset Java `java.util.regex` (Spark) and RE2 (DuckDB oracle) implement
identically — `\\d`, `\\b`, bounded counted repeats, explicit character
classes; no backreferences, no lookaround (RE2 has neither).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# (class name, pattern, replacement) — applied in list order. Classes
# are MOSTLY format-disjoint (email has '@'; ip is dotted digits; ssn
# is 3-2-4 dashed; phone is 3-3-4 dashed), but overlaps are possible in
# pathological text ('u@10.1.2.3.org' holds an IP inside an email
# match), so each class is COUNTED on the progressively-redacted text —
# the text with all earlier classes already replaced — exactly matching
# what redaction replaces. Note this means counts are matches in the
# PARTIALLY-REDACTED text, which can include matches an earlier
# replacement EXPOSED: placeholders contain no digits or '@', but their
# punctuation introduces \b word boundaries the original lacked (e.g.
# 'a@b.co111-22-3333' redacts to '<EMAIL>111-22-3333', whose '>' makes
# the SSN \b match where the original digits-run did not). Both engines
# compute the same progression, so the counts stay bit-identical — the
# invariant is "counts = replacements made", not "counts = matches a
# user would see in the original text".
DEFAULT_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    ("phone", r"\b\d{3}-\d{3}-\d{4}\b", "<PHONE>"),
]


def pii_scrub(
    df: DataFrame,
    text_col: str = "text",
    patterns: list[tuple[str, str, str]] | None = None,
    out_col: str = "redacted",
) -> DataFrame:
    """Add one `n_<class>` BIGINT count per PII class (matched against
    the text with all EARLIER classes already redacted, so counts equal
    replacements made) and `out_col`, the text with every match
    replaced by the class placeholder, classes applied in order."""
    pats = DEFAULT_PATTERNS if patterns is None else patterns
    out = df
    red: Column = F.col(text_col)
    for name, pat, repl in pats:
        out = out.withColumn(
            f"n_{name}", F.regexp_count(red, F.lit(pat)).cast("bigint")
        )
        red = F.regexp_replace(red, pat, repl)
    return out.withColumn(out_col, red)


def pii_flag(patterns: list[tuple[str, str, str]] | None = None) -> Column:
    """1 when any PII class counted by :func:`pii_scrub` hit, else 0."""
    pats = DEFAULT_PATTERNS if patterns is None else patterns
    flag = F.lit(0)
    for name, _, _ in pats:
        flag = flag + F.col(f"n_{name}")
    return (flag > 0).cast("int")


def sql_pii_counts(text_expr: str, patterns=None) -> str:
    """DuckDB projection fragment mirroring pii_scrub's count columns
    (each class counted on the progressively-redacted text, matching
    the Spark side)."""
    pats = DEFAULT_PATTERNS if patterns is None else patterns
    frags = []
    expr = text_expr
    for name, pat, repl in pats:
        frags.append(
            f"CAST(LEN(REGEXP_EXTRACT_ALL({expr}, '{pat}')) AS BIGINT)"
            f" AS n_{name}"
        )
        expr = f"REGEXP_REPLACE({expr}, '{pat}', '{repl}', 'g')"
    return ",\n".join(frags)


def sql_pii_redact(text_expr: str, patterns=None) -> str:
    """DuckDB expression mirroring pii_scrub's redacted column (global
    regexp_replace per class, same application order)."""
    pats = DEFAULT_PATTERNS if patterns is None else patterns
    expr = text_expr
    for _, pat, repl in pats:
        expr = f"REGEXP_REPLACE({expr}, '{pat}', '{repl}', 'g')"
    return expr
