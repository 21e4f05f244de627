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
    localCheckpointed — iterations never re-derive from the corpus.

    Driver-loop bound: ONE 1-row collect + one dictionary-sized rewrite
    job per merge, so a production vocab (n_merges ≈ 32k) is 32k
    sequential Spark jobs — latency-bound on driver round-trips, not on
    data volume (every job after the first is dictionary-sized). For
    vocab-scale training use :func:`bpe_train_batched`, which amortizes
    the round-trips by merging a rank-disjoint batch of pairs per
    iteration; SCALE.md carries an n_merges=64 probe for both forms.
    """
    sym_df = init_symbols(word_freqs(docs, text_col)).localCheckpoint()
    merges = []
    for step in range(1, n_merges + 1):
        l, r, c = top_pair(sym_df)
        merges.append((step, l, r, c))
        sym_df = merge_pair(sym_df, l, r).localCheckpoint()
    return merges


def merge_pairs(
    sym_df: DataFrame, pairs: list[tuple[str, str]]
) -> DataFrame:
    """Rewrite every greedy occurrence of each (left, right) in
    ``pairs`` — which MUST be pairwise symbol-disjoint — in ONE pass.

    With disjoint symbol sets, matches of different pairs can never sit
    on adjacent positions (that would need one pair's right symbol to
    be another's left), so the run-parity machinery of
    :func:`merge_pair` applies unchanged: every run of consecutive
    match positions belongs to a single (self-overlapping) pair, and
    simultaneous rewrite equals sequential rewrite in any order.
    """
    for i, (l1, r1) in enumerate(pairs):
        for l2, r2 in pairs[i + 1 :]:
            if {l1, r1} & {l2, r2}:
                raise ValueError(
                    f"merge_pairs needs symbol-disjoint pairs; "
                    f"({l1!r},{r1!r}) overlaps ({l2!r},{r2!r})"
                )
    ex = sym_df.select(
        "word", "cnt", F.posexplode("syms").alias("pos", "sym")
    )
    w = Window.partitionBy("word").orderBy("pos")
    m = F.lit(False)
    merged = F.lit(None).cast("string")
    for l, r in pairs:
        hit = (F.col("sym") == l) & (F.col("nxt") == r)
        m = m | hit
        merged = F.when(hit, F.lit(l + r)).otherwise(merged)
    ex = (
        ex.withColumn("nxt", F.lead("sym").over(w))
        .withColumn("m", m)
        .withColumn("merged", merged)
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
        F.when(F.col("take"), F.col("merged"))
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


def select_rank_disjoint(
    ranked: list[tuple[str, str, int]]
) -> list[tuple[str, str, int]]:
    """From a ranked pair list, keep each pair iff its symbols are
    disjoint from EVERY higher-ranked pair (selected or not).

    Deliberately stricter than greedy-vs-selected: "disjoint from all
    above" needs no recursion, so the DuckDB oracle expresses it as one
    NOT EXISTS self-join over the ranked CTE (queries_bpe_batched).
    The rank-1 pair is always kept, so each round makes at least the
    progress classical BPE would.
    """
    out: list[tuple[str, str, int]] = []
    for i, (l, r, c) in enumerate(ranked):
        syms = {l, r}
        if all(syms.isdisjoint({pl, pr}) for pl, pr, _ in ranked[:i]):
            out.append((l, r, c))
    return out


def bpe_train_batched(
    docs: DataFrame,
    text_col: str = "text",
    n_rounds: int = 2,
    top_m: int = 8,
) -> list[tuple[int, str, str, int]]:
    """Batched BPE: each round ranks pair counts once, merges the
    rank-disjoint subset of the top ``top_m`` pairs in ONE rewrite.

    Returns [(round, left, right, pair_count)] — counts as of the
    round's start, pairs in rank order within a round. With top_m=1
    this is exactly :func:`bpe_train`. Larger batches trade driver
    round-trips (the n_merges≈32k bound documented on bpe_train) for a
    merge ORDER that can deviate from classical BPE: a pair created by
    this round's rank-1 merge cannot be chosen until next round even
    if its count would outrank the round's later selections. That is
    the standard large-vocab engineering trade (both orders converge
    on the same high-frequency vocabulary); batch size, not data size,
    controls the deviation.
    """
    sym_df = init_symbols(word_freqs(docs, text_col)).localCheckpoint()
    merges: list[tuple[int, str, str, int]] = []
    for rnd in range(1, n_rounds + 1):
        ranked = [
            (row.l, row.r, int(row.pair_cnt))
            for row in pair_counts(sym_df)
            .orderBy(F.desc("pair_cnt"), F.asc("l"), F.asc("r"))
            .limit(top_m)
            .collect()
        ]
        sel = select_rank_disjoint(ranked)
        if not sel:
            break
        merges.extend((rnd, l, r, c) for l, r, c in sel)
        sym_df = merge_pairs(
            sym_df, [(l, r) for l, r, _ in sel]
        ).localCheckpoint()
    return merges


def apply_merges(
    sym_df: DataFrame, merges: list[tuple[int, str, str, int]]
) -> DataFrame:
    """Apply a trained merge list to a symbol table (tokenize-by-merges;
    same rewrite as training, in rank order)."""
    for _, l, r, _ in merges:
        sym_df = merge_pair(sym_df, l, r)
    return sym_df
