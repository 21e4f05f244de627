"""Length-bounded fragment packer — the engine's one custom kernel.

Re-implements (Spark-first) the reference's overflow splitting of merged
multi-valued string fields: WITH_INFO fragments ≤1700 chars preferring
separator boundaries with hard cuts for oversized single tokens
(reference: WithInfoConsolidator.java:100-113), and XREF_SOURCE ≤4000-char
accumulation chunks (reference: MAHDL.java:89-101).

Implemented as a composition of Spark higher-order functions
(`transform` + `aggregate`), so the whole kernel runs JVM-side inside
whole-stage codegen — no Python UDF in the hot path. The greedy
first-fit semantics are deterministic over a SORTED token array (the
reference's emission order is HashMap-order-dependent; we sort first —
documented deviation, SURVEY.md §2.4/A4).

A pure-Python reference implementation (`pack_fragments_py`) backs the
property tests.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def split_oversized_tokens(tokens: Column, max_len: int) -> Column:
    """Hard-cut any token longer than max_len into max_len-sized chunks.

    Mirrors the reference's hard-cut fallback when a single token exceeds
    the fragment limit (WithInfoConsolidator.java:106-110).
    """
    return F.flatten(
        F.transform(
            tokens,
            lambda t: F.when(F.length(t) <= max_len, F.array(t)).otherwise(
                F.transform(
                    F.sequence(
                        F.lit(0),
                        ((F.length(t) - F.lit(1)) / F.lit(max_len)).cast("int"),
                    ),
                    lambda i: t.substr(i * F.lit(max_len) + F.lit(1), F.lit(max_len)),
                )
            ),
        )
    )


def pack_fragments(tokens: Column, max_len: int, sep: str = "|") -> Column:
    """Greedily pack a token array into fragments of ≤ max_len chars.

    tokens: array<string> column (pre-sorted, deduped by the caller — use
    F.array_sort(F.array_distinct(...))). Returns array<string> of
    sep-joined fragments, each ≤ max_len characters (single oversized
    tokens are hard-cut first).

    Greedy first-fit: a token goes into the current fragment if
    len(cur) + len(sep) + len(token) <= max_len, else starts a new one.
    """
    sep_len = len(sep)
    toks = split_oversized_tokens(tokens, max_len)

    init = F.struct(
        F.lit(None).cast("array<string>").alias("frags"),
        F.lit(None).cast("string").alias("cur"),
    )
    # normalize init (lit([]) of array<string> is awkward pre-collect):
    init = F.struct(
        F.expr("cast(array() as array<string>)").alias("frags"),
        F.lit("").alias("cur"),
    )

    def merge(acc: Column, t: Column) -> Column:
        fits = (acc["cur"] == "") | (
            F.length(acc["cur"]) + F.lit(sep_len) + F.length(t) <= F.lit(max_len)
        )
        new_cur = (
            F.when(acc["cur"] == "", t)
            .when(fits, F.concat(acc["cur"], F.lit(sep), t))
            .otherwise(t)
        )
        new_frags = F.when(fits, acc["frags"]).otherwise(
            F.array_append(acc["frags"], acc["cur"])
        )
        return F.struct(new_frags.alias("frags"), new_cur.alias("cur"))

    def finish(acc: Column) -> Column:
        return F.when(acc["cur"] == "", acc["frags"]).otherwise(
            F.array_append(acc["frags"], acc["cur"])
        )

    return F.aggregate(toks, init, merge, finish)


def pack_fragments_py(tokens: list[str], max_len: int, sep: str = "|") -> list[str]:
    """Pure-Python reference implementation (for property tests)."""
    chunks: list[str] = []
    for t in tokens:
        if len(t) <= max_len:
            chunks.append(t)
        else:
            chunks.extend(t[i : i + max_len] for i in range(0, len(t), max_len))
    frags: list[str] = []
    cur = ""
    for t in chunks:
        if not cur:
            cur = t
        elif len(cur) + len(sep) + len(t) <= max_len:
            cur = cur + sep + t
        else:
            frags.append(cur)
            cur = t
    if cur:
        frags.append(cur)
    return frags
