"""Distributed BPE trainer (operators/bpe): textbook merges, greedy
self-pair semantics, merge application, and the dictionary-sized
iteration contract."""

from __future__ import annotations

from pyspark.sql import functions as F

from go_nonrat_annotation_pipeline_spark.operators import bpe as B


def _docs(spark, text):
    return spark.createDataFrame([(1, text)], "doc_id long, text string")


def test_textbook_merges(spark):
    # Sennrich et al. example: low×5 lower×2 newest×6 widest×3
    text = " ".join(["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3)
    merges = B.bpe_train(_docs(spark, text), n_merges=4)
    assert merges == [
        (1, "e", "s", 9),
        (2, "es", "t", 9),
        (3, "est", "</w>", 9),
        (4, "l", "o", 7),
    ]


def test_greedy_self_pair_run_parity(spark):
    # 'aaaa' has (a,a) matches at 1,2,3; greedy takes 1 and 3
    sym = B.init_symbols(B.word_freqs(_docs(spark, "aaaa")))
    out = B.merge_pair(sym, "a", "a").first().syms
    assert out == ["aa", "aa", "</w>"]
    # odd run: 'aaa' -> ['aa', 'a', '</w>']
    sym3 = B.init_symbols(B.word_freqs(_docs(spark, "aaa")))
    assert B.merge_pair(sym3, "a", "a").first().syms == ["aa", "a", "</w>"]


def test_apply_merges_reproduces_training_state(spark):
    text = " ".join(["low"] * 5 + ["newest"] * 6)
    docs = _docs(spark, text)
    merges = B.bpe_train(docs, n_merges=3)
    # tie-break at count 6 goes (e,s) then (e,w) then (es,t) — l asc
    assert merges == [(1, "e", "s", 6), (2, "e", "w", 6), (3, "es", "t", 6)]
    final = B.apply_merges(
        B.init_symbols(B.word_freqs(docs)), merges
    )
    state = {r.word: list(r.syms) for r in final.collect()}
    assert state["newest"] == ["n", "ew", "est", "</w>"]
    assert state["low"] == ["l", "o", "w", "</w>"]


def test_iterations_touch_dictionary_not_corpus(spark):
    """word_freqs output is the ONLY corpus-derived input; symbol
    tables are word-keyed (one row per distinct word)."""
    text = "spark spark spark merge merge window"
    wf = B.word_freqs(_docs(spark, text))
    assert wf.count() == 3
    got = {r.word: r.cnt for r in wf.collect()}
    assert got == {"spark": 3, "merge": 2, "window": 1}
    sym = B.init_symbols(wf)
    merged = B.merge_pair(sym, "s", "p")
    assert merged.count() == 3  # still one row per word


def test_batched_top_m_1_equals_classical(spark):
    text = " ".join(["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3)
    docs = _docs(spark, text)
    classical = B.bpe_train(docs, n_merges=3)
    batched = B.bpe_train_batched(docs, n_rounds=3, top_m=1)
    assert [(l, r, c) for _, l, r, c in batched] == [
        (l, r, c) for _, l, r, c in classical
    ]
    # round numbers are sequential when every round merges one pair
    assert [rnd for rnd, *_ in batched] == [1, 2, 3]


def test_select_rank_disjoint_rule():
    ranked = [
        ("e", "s", 9),   # rank 1: always kept
        ("s", "t", 8),   # shares 's' with rank 1 -> out
        ("l", "o", 7),   # disjoint from ALL above -> kept
        ("o", "w", 6),   # shares 'o' with rank 3 -> out
        ("t", "w", 5),   # shares 't' w/ rank2, 'w' w/ rank4: rule is
                         # "disjoint from all higher-RANKED" -> out
        ("a", "b", 4),   # disjoint from all above -> kept
    ]
    sel = B.select_rank_disjoint(ranked)
    assert sel == [("e", "s", 9), ("l", "o", 7), ("a", "b", 4)]


def test_merge_pairs_equals_sequential_merge_pair(spark):
    text = " ".join(["low"] * 5 + ["newest"] * 6 + ["aaaa"] * 2)
    sym = B.init_symbols(B.word_freqs(_docs(spark, text)))
    pairs = [("e", "s"), ("l", "o"), ("a", "a")]
    got = {
        r.word: list(r.syms)
        for r in B.merge_pairs(sym, pairs).collect()
    }
    seq = sym
    for l, r in pairs:
        seq = B.merge_pair(seq, l, r)
    want = {r.word: list(r.syms) for r in seq.collect()}
    assert got == want
    assert got["aaaa"] == ["aa", "aa", "</w>"]  # self-pair parity kept


def test_merge_pairs_rejects_overlapping_symbols(spark):
    import pytest

    sym = B.init_symbols(B.word_freqs(_docs(spark, "abc")))
    with pytest.raises(ValueError, match="symbol-disjoint"):
        B.merge_pairs(sym, [("a", "b"), ("b", "c")])


def test_batched_merges_rank1_every_round(spark):
    text = " ".join(["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3)
    docs = _docs(spark, text)
    batched = B.bpe_train_batched(docs, n_rounds=2, top_m=8)
    by_round: dict[int, list] = {}
    for rnd, l, r, c in batched:
        by_round.setdefault(rnd, []).append((l, r, c))
    # round 1's first selection is classical BPE's first merge
    assert by_round[1][0] == ("e", "s", 9)
    # within a round, selected pairs are pairwise symbol-disjoint
    for sel in by_round.values():
        for i, (l1, r1, _) in enumerate(sel):
            for l2, r2, _ in sel[i + 1 :]:
                assert not ({l1, r1} & {l2, r2})
