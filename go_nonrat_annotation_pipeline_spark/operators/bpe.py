"""Distributed BPE (byte-pair encoding) merge training — the tokenizer
half of a training-data pipeline.

The classical algorithm (Sennrich et al. 2016) iterates: count
adjacent symbol pairs over the word-frequency table, merge the most
frequent pair everywhere, repeat. The Spark-first decomposition keys on
the observation that ALL iterations operate on the WORD-FREQUENCY
table, not the corpus:

- ``word_freqs``: the only corpus-sized stage — one explode + one hash
  aggregate (map-side combine collapses to dictionary size). A 100 TB
  corpus is scanned ONCE; everything after runs on the dictionary.
- per merge step: pair counts are one posexplode + lead() window + one
  aggregate over the dictionary; the argmax pair is a 1-row collect
  (the same scalar-collect contract as the k-means centroid table);
  the merge rewrite is window arithmetic (below), one shuffle on word.

Greedy left-to-right merge semantics, expressed RELATIONALLY (no
sequential fold — both engines' lambda folds are either interpreted or
buggy for struct accumulators; windows stay in whole-stage codegen):
a match at position p is TAKEN iff p lies at an EVEN offset within its
maximal run of consecutive match positions. Overlapping matches only
occur for self-pairs (l==r: 'aaa' matches at 1,2), where run parity
reproduces exactly the take-first-skip-next greedy rule; for l≠r
matches are never adjacent-overlapping and every match is taken.
Symbols consumed as the right half of a taken match are dropped; the
left half rewrites to the concatenated symbol.

Determinism: the argmax pair breaks ties on (count desc, left asc,
right asc); words build as char symbols + a terminal '</w>' marker.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

END_MARK = "</w>"


def word_freqs(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, cnt) over whitespace words — the one corpus-sized stage."""
    return (
        docs.select(F.explode(F.split(F.col(text_col), " ")).alias("word"))
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def init_symbols(words: DataFrame) -> DataFrame:
    """(word, cnt, syms): characters + terminal marker."""
    return words.select(
        "word",
        "cnt",
        F.concat(
            F.split(F.col("word"), ""), F.array(F.lit(END_MARK))
        ).alias("syms"),
    )


def pair_counts(sym_df: DataFrame) -> DataFrame:
    """(l, r, pair_cnt): adjacent-pair frequencies weighted by word count."""
    ex = sym_df.select(
        "word", "cnt", F.posexplode("syms").alias("pos", "sym")
    )
    w = Window.partitionBy("word").orderBy("pos")
    return (
        ex.withColumn("nxt", F.lead("sym").over(w))
        .where(F.col("nxt").isNotNull())
        .groupBy(F.col("sym").alias("l"), F.col("nxt").alias("r"))
        .agg(F.sum("cnt").alias("pair_cnt"))
    )


def top_pair(sym_df: DataFrame) -> tuple[str, str, int]:
    """argmax pair — deterministic (count desc, l asc, r asc); 1-row
    TakeOrderedAndProject collect."""
    row = (
        pair_counts(sym_df)
        .orderBy(F.desc("pair_cnt"), F.asc("l"), F.asc("r"))
        .limit(1)
        .collect()[0]
    )
    return row.l, row.r, int(row.pair_cnt)


def merge_pair(sym_df: DataFrame, left: str, right: str) -> DataFrame:
    """Rewrite every greedy occurrence of (left, right) to left+right.

    Window arithmetic (one shuffle on word, all codegen): match flag →
    run islands (pos - running-match-count is constant per run) → take
    = even offset within run → drop right halves, rewrite left halves.
    """
    ex = sym_df.select(
        "word", "cnt", F.posexplode("syms").alias("pos", "sym")
    )
    w = Window.partitionBy("word").orderBy("pos")
    ex = (
        ex.withColumn("nxt", F.lead("sym").over(w))
        .withColumn(
            "m", (F.col("sym") == left) & (F.col("nxt") == right)
        )
        .withColumn(
            "mrn",
            F.sum(F.when(F.col("m"), 1).otherwise(0)).over(w),
        )
        .withColumn(
            "run", F.when(F.col("m"), F.col("pos") - F.col("mrn"))
        )
    )
    wrun = Window.partitionBy("word", "run")
    ex = ex.withColumn(
        "run_start",
        F.min(F.when(F.col("m"), F.col("pos"))).over(wrun),
    ).withColumn(
        "take",
        F.col("m")
        & (F.pmod(F.col("pos") - F.col("run_start"), 2) == 0),
    )
    ex = ex.withColumn(
        "prev_take", F.coalesce(F.lag("take").over(w), F.lit(False))
    )
    osym = (
        F.when(F.col("take"), F.lit(left + right))
        .when(F.col("prev_take"), F.lit(None))
        .otherwise(F.col("sym"))
    )
    return (
        ex.withColumn("osym", osym)
        .where(F.col("osym").isNotNull())
        .groupBy("word", "cnt")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "osym"))),
                lambda e: e["osym"],
            ).alias("syms")
        )
    )


def bpe_train(
    docs: DataFrame, text_col: str = "text", n_merges: int = 3
) -> list[tuple[int, str, str, int]]:
    """Train ``n_merges`` BPE merges; returns [(step, left, right,
    pair_count)] in merge order. Each step's dictionary state is
    localCheckpointed — iterations never re-derive from the corpus."""
    sym_df = init_symbols(word_freqs(docs, text_col)).localCheckpoint()
    merges = []
    for step in range(1, n_merges + 1):
        l, r, c = top_pair(sym_df)
        merges.append((step, l, r, c))
        sym_df = merge_pair(sym_df, l, r).localCheckpoint()
    return merges


def apply_merges(
    sym_df: DataFrame, merges: list[tuple[int, str, str, int]]
) -> DataFrame:
    """Apply a trained merge list to a symbol table (tokenize-by-merges;
    same rewrite as training, in rank order)."""
    for _, l, r, _ in merges:
        sym_df = merge_pair(sym_df, l, r)
    return sym_df
