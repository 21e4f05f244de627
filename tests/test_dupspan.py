"""Cross-doc duplicated-span dedup (operators/dupspan.py) against an
independent pure-Python reference on crafted corpora."""

from __future__ import annotations

from go_nonrat_annotation_pipeline_spark.operators import dupspan as DS

N = 5  # small shingle for hand-checkable corpora


def _ref(corpus, n=N):
    """Independent reference: mark every n-run of words shared (as an
    n-gram) with ANOTHER doc, cover its n words, report per doc."""
    grams = {}
    for did, text in corpus:
        ws = text.split(" ")
        for p in range(len(ws) - n + 1):
            grams.setdefault(tuple(ws[p : p + n]), set()).add(did)
    out = {}
    for did, text in corpus:
        ws = text.split(" ")
        cov = [0] * len(ws)
        for p in range(len(ws) - n + 1):
            if len(grams[tuple(ws[p : p + n])]) >= 2:
                for j in range(p, p + n):
                    cov[j] = 1
        spans = sum(
            1 for i, c in enumerate(cov) if c and (i == 0 or not cov[i - 1])
        )
        kept = [w for w, c in zip(ws, cov) if not c]
        out[did] = (len(ws), sum(cov), spans, " ".join(kept))
    return out


def _check(spark, corpus):
    docs = spark.createDataFrame(corpus, "doc_id long, text string")
    want = _ref(corpus)
    mass = {
        r.doc_id: (r.n_words, r.dup_words, r.n_spans)
        for r in DS.duplicated_span_mass(docs, n=N).collect()
    }
    strip = {
        r.doc_id: (r.clean_text, r.n_kept, r.n_dropped)
        for r in DS.strip_duplicated_spans(docs, n=N).collect()
    }
    for did, (nw, dw, ns, clean) in want.items():
        assert mass[did] == (nw, dw, ns), f"mass doc {did}"
        assert strip[did] == (clean, nw - dw, dw), f"strip doc {did}"


def test_planted_shared_spans(spark):
    shared = "the quick brown fox jumps over the lazy dog tonight"  # 10 words
    corpus = [
        (1, f"alpha beta {shared} gamma delta epsilon zeta"),
        (2, f"{shared} one two three four five six seven"),   # span at start
        (3, "totally unrelated words that appear nowhere else at all"),
        (4, f"eight nine ten eleven twelve {shared}"),        # span at end
    ]
    _check(spark, corpus)


def test_within_doc_repetition_not_flagged(spark):
    rep = "x y z w v"
    corpus = [
        (1, f"{rep} filler1 filler2 {rep} filler3"),  # repeats only within
        (2, "other content entirely distinct from doc one body text"),
    ]
    _check(spark, corpus)
    docs = spark.createDataFrame(corpus, "doc_id long, text string")
    mass = {
        r.doc_id: r.dup_words
        for r in DS.duplicated_span_mass(docs, n=N).collect()
    }
    assert mass[1] == 0  # cross-doc only by design


def test_short_and_degenerate_docs(spark):
    corpus = [
        (1, "a b c"),            # shorter than n -> no shingles
        (2, "a b c"),            # identical but still too short to flag
        (3, "p q r s t u"),      # exactly n+1 words
        (4, "p q r s t zz"),     # shares only a 5-gram prefix with 3
        (5, ""),                 # empty text
    ]
    _check(spark, corpus)


def test_overlapping_spans_merge(spark):
    """Two overlapping shared runs must merge into ONE span."""
    a = "m1 m2 m3 m4 m5 m6 m7"
    corpus = [
        (1, f"u1 u2 {a} u3 u4"),
        (2, f"{a[: len('m1 m2 m3 m4 m5')]} tail1 tail2 tail3 tail4"),
        (3, f"head1 head2 m3 m4 m5 m6 m7 other1 other2"),
    ]
    docs = spark.createDataFrame(corpus, "doc_id long, text string")
    r1 = {
        r.doc_id: r.n_spans
        for r in DS.duplicated_span_mass(docs, n=N).collect()
    }
    assert r1[1] == 1  # m1..m5 and m3..m7 overlap -> one span
    _check(spark, corpus)
