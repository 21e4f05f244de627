"""Retrieval-grade text scoring and matching (north-star extensions):
TF-IDF / BM25 term scoring over the corpus, and a q-gram-bounded fuzzy
(edit-distance) join.

All JVM-side DataFrame ops with exact DuckDB-reproducible arithmetic —
log/division order is pinned so the oracles hash-match.

100 TB shape:
- TF-IDF: one explode + two hash aggregates (term stats, doc stats);
  the document-frequency table joins back WITHOUT a broadcast hint —
  the distinct-term dictionary is unbounded (billions of terms at
  corpus scale), so AQE picks broadcast only when the measured size
  allows it. BM25's idf table is query-terms-only and stays broadcast.
- Fuzzy join: never all-pairs — candidates must share a q-gram hash
  bucket (equi-join on the posexploded gram key, identical shape to the
  LSH band join), then exact levenshtein verifies only collisions, with
  a hot-gram cap bounding any bucket's fan-out (same stop-key trick as
  winnowing's max_doc_freq).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def term_doc_freq(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(term, df) document frequencies over whitespace terms."""
    terms = docs.select(
        F.col(id_col).alias("_id"),
        F.explode(F.array_distinct(F.split(F.col(text_col), " "))).alias("term"),
    )
    return terms.groupBy("term").agg(F.count(F.lit(1)).alias("df"))


def tfidf_top_terms(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
) -> DataFrame:
    """Top-k TF-IDF terms per document.

    tf = raw term count in the doc; idf = ln((N+1)/(df+1)) + 1 (the
    smoothed scikit-style form — strictly positive, no div-by-zero).
    Deterministic ranking: score desc, then term asc. Plan: one explode
    + per-doc term counts (one shuffle on (_id, term)), corpus df agg
    (one shuffle on term, output = dictionary-sized), join back with NO
    broadcast hint (the dictionary is unbounded at corpus scale — AQE
    broadcasts only if the runtime size fits), one ranking window per
    doc.
    """
    from pyspark.sql import Window

    n_docs = docs.count()  # scalar action: corpus size is one number
    terms = docs.select(
        F.col(id_col).alias("_id"),
        F.explode(F.split(F.col(text_col), " ")).alias("term"),
    )
    tf = terms.groupBy("_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df_ = term_doc_freq(docs, id_col, text_col)
    idf = df_.select(
        "term",
        (
            F.log((F.lit(float(n_docs)) + 1.0) / (F.col("df") + 1.0)) + 1.0
        ).alias("idf"),
        "df",
    )
    scored = tf.join(idf, "term").select(
        "_id",
        "term",
        "tf",
        "df",
        F.round(F.col("tf") * F.col("idf"), 6).alias("tfidf"),
    )
    w = Window.partitionBy("_id").orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            F.col("_id").alias(id_col), "term", "tf", "df", "tfidf", "rank"
        )
    )


def bm25_scores(
    docs: DataFrame,
    query_terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
    k: int = 10,
) -> DataFrame:
    """Top-k documents for a bag-of-terms query by BM25.

    idf = ln(1 + (N - df + 0.5)/(df + 0.5)) (the standard
    Robertson-Sparck Jones form, always positive); per-doc length
    normalization uses exact whitespace token counts and the corpus
    mean length computed as a DECIMAL-exact average cast to double.
    Deterministic ranking: score desc, then doc id asc.

    Raises ValueError on an empty query; returns an empty (id, bm25,
    rank) result when the corpus is empty. Corpus size and total length
    are fetched in ONE scalar agg action (single job).
    """
    from pyspark.sql import Window

    if not query_terms:
        raise ValueError("bm25_scores: query_terms must be non-empty")

    base = docs.select(
        F.col(id_col).alias("_id"),
        F.size(F.split(F.col(text_col), " ")).alias("dl"),
        F.split(F.col(text_col), " ").alias("ws"),
    )
    # ONE scalar action: corpus size + exact integer length sum together
    n_docs, tot = base.agg(
        F.count(F.lit(1)).alias("n"), F.sum("dl").alias("s")
    ).collect()[0]
    if n_docs == 0:
        return base.select(
            F.col("_id").alias(id_col),
            F.lit(0.0).alias("bm25"),
            F.lit(0).alias("rank"),
        ).limit(0)
    avgdl = float(tot) / float(n_docs)

    qset = [t for t in query_terms]
    terms = base.select(
        "_id", "dl", F.explode("ws").alias("term")
    ).where(F.col("term").isin(*qset))
    tf = terms.groupBy("_id", "dl", "term").agg(
        F.count(F.lit(1)).alias("tf")
    )
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    idf = df_.select(
        "term",
        F.log(
            1.0
            + (F.lit(float(n_docs)) - F.col("df") + 0.5) / (F.col("df") + 0.5)
        ).alias("idf"),
    )
    contrib = tf.join(F.broadcast(idf), "term").select(
        "_id",
        (
            F.col("idf")
            * (F.col("tf") * (k1 + 1.0))
            / (
                F.col("tf")
                + k1
                * (1.0 - b + b * (F.col("dl") / F.lit(avgdl)))
            )
        ).alias("c"),
    )
    scored = contrib.groupBy("_id").agg(
        F.round(F.sum("c"), 6).alias("bm25")
    )
    # global top-k via orderBy().limit() — TakeOrderedAndProject keeps
    # per-partition heaps (a bare row_number window with no partition
    # would funnel every scored doc through ONE task); the rank window
    # then runs over exactly k rows
    topk = scored.orderBy(F.desc("bm25"), F.asc("_id")).limit(k)
    # rank over exactly k rows: partition by a column-derived constant
    # ("_id" % 1 == 0 always) — execution-identical to no partition for
    # a k-row frame, but the spec survives constant folding so the
    # single-partition WindowExec warning (meant for corpus-sized
    # frames) stays out of the logs
    w = Window.partitionBy(F.col("_id") % 1).orderBy(
        F.desc("bm25"), F.asc("_id")
    )
    return (
        topk.withColumn("rank", F.row_number().over(w))
        .select(F.col("_id").alias(id_col), "bm25", "rank")
    )


def bm25_scores_multi(
    docs: DataFrame,
    queries: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    query_id_col: str = "query_id",
    term_col: str = "term",
    k1: float = 1.2,
    b: float = 0.75,
    k: int = 10,
) -> DataFrame:
    """Top-k documents per query for a SET of bag-of-terms queries.

    The multi-query form a retrieval user actually runs: `queries` is a
    (query_id, term) DataFrame; the whole workload is scored in one pass
    over the corpus — same arithmetic as :func:`bm25_scores` (Robertson-
    Sparck Jones idf, k1/b length normalization, score desc / doc id asc
    ties).

    Plan (100 TB shape): corpus stats in ONE scalar agg; one explode of
    the corpus filtered by a BROADCAST semi-join against the distinct
    query-term set (the query workload is ≪ corpus — broadcast is correct
    here, exactly like the query side of the ANN operators); per-term df
    over matched docs only; contributions fan out per query via a second
    broadcast join on term; one grouped aggregate on (query_id, doc);
    top-k via a PER-QUERY ranking window (partitioned — no global
    single-task window).
    """
    from pyspark.sql import Window

    q = (
        queries.select(
            F.col(query_id_col).alias("_qid"), F.col(term_col).alias("term")
        )
        .where(F.col("term").isNotNull())
        .distinct()
    )

    base = docs.select(
        F.col(id_col).alias("_id"),
        F.size(F.split(F.col(text_col), " ")).alias("dl"),
        F.split(F.col(text_col), " ").alias("ws"),
    )
    n_docs, tot = base.agg(
        F.count(F.lit(1)).alias("n"), F.sum("dl").alias("s")
    ).collect()[0]
    if n_docs == 0:
        return q.select(
            F.col("_qid").alias(query_id_col),
            F.lit(0).cast("long").alias(id_col),
            F.lit(0.0).alias("bm25"),
            F.lit(0).alias("rank"),
        ).limit(0)
    avgdl = float(tot) / float(n_docs)

    qterms = q.select("term").distinct()
    terms = base.select("_id", "dl", F.explode("ws").alias("term")).join(
        F.broadcast(qterms), "term"
    )
    tf = terms.groupBy("_id", "dl", "term").agg(F.count(F.lit(1)).alias("tf"))
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    idf = df_.select(
        "term",
        F.log(
            1.0
            + (F.lit(float(n_docs)) - F.col("df") + 0.5) / (F.col("df") + 0.5)
        ).alias("idf"),
    )
    contrib = tf.join(F.broadcast(idf), "term").select(
        "_id",
        "term",
        (
            F.col("idf")
            * (F.col("tf") * (k1 + 1.0))
            / (
                F.col("tf")
                + k1 * (1.0 - b + b * (F.col("dl") / F.lit(avgdl)))
            )
        ).alias("c"),
    )
    per_query = contrib.join(F.broadcast(q), "term").groupBy("_qid", "_id").agg(
        F.round(F.sum("c"), 6).alias("bm25")
    )
    w = Window.partitionBy("_qid").orderBy(F.desc("bm25"), F.asc("_id"))
    return (
        per_query.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            F.col("_qid").alias(query_id_col),
            F.col("_id").alias(id_col),
            "bm25",
            "rank",
        )
    )


def qgram_fuzzy_pairs(
    df: DataFrame,
    id_col: str,
    key_expr,
    max_dist: int = 2,
    q: int = 3,
    max_gram_freq: int = 256,
) -> DataFrame:
    """Pairs of rows whose key strings are within levenshtein(max_dist),
    without an all-pairs join.

    Candidate generation: q-gram equi-join — a string of length L has
    L−q+1 q-grams, and d edits destroy at most q·d of them, so two
    strings at edit distance ≤ d share at least one q-gram whenever
    min(L) ≥ q·(d+1) (the classic q-gram count filter). Exact recall
    guarantee, precisely: FULL recall only for pairs where both keys
    have length ≥ q·(max_dist+1); shorter keys can be at distance ≤ d
    yet share no q-gram (e.g. two length-5 names at distance 2 with
    q=3) and such pairs are MISSED. Keys shorter than q have no q-gram
    at all and are EXCLUDED from the output entirely (the LENGTH >= q
    filter below). Route short keys through a dedicated exact/broadcast
    side-join if they matter in your data. Additionally, grams occurring
    in more than max_gram_freq keys are dropped on both sides (stop-gram
    cap — bounds any bucket's fan-out; recall is kept for every pair
    sharing at least one sub-cap gram, mirroring winnowing's
    max_doc_freq contract). Exact levenshtein verifies only colliding
    pairs.
    """
    keyed = df.select(
        F.col(id_col).alias("_id"), key_expr.alias("_key")
    ).where(F.length("_key") >= q)
    grams = keyed.select(
        "_id",
        "_key",
        F.explode(
            F.array_distinct(
                F.transform(
                    F.sequence(
                        F.lit(1), F.length("_key") - F.lit(q - 1)
                    ),
                    lambda i: F.col("_key").substr(i, F.lit(q)),
                )
            )
        ).alias("gram"),
    )
    hot = (
        grams.groupBy("gram")
        .agg(F.count_distinct("_id").alias("n"))
        .where(F.col("n") > max_gram_freq)
        .select("gram")
    )
    cold = grams.join(F.broadcast(hot), "gram", "left_anti")
    a = cold.select(
        F.col("_id").alias("id_a"), F.col("_key").alias("key_a"), "gram"
    )
    b = cold.select(
        F.col("_id").alias("id_b"), F.col("_key").alias("key_b"), "gram"
    )
    cand = (
        a.join(b, "gram")
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "key_a", "id_b", "key_b")
        .distinct()
    )
    return (
        cand.withColumn(
            "dist", F.levenshtein(F.col("key_a"), F.col("key_b"))
        )
        .where(F.col("dist") <= max_dist)
        .select("id_a", "id_b", "dist")
    )


def rare_token_stats(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    rare_below: int = 100,
) -> DataFrame:
    """Per-document rare-token statistics — the corpus-frequency quality
    filter (CCNet-family): documents dominated by tokens the corpus has
    barely seen are OCR noise, boilerplate mutations, or wrong-language
    fragments.

    Returns (id, n_tokens, n_rare, rare_permille) where a token is rare
    when its CORPUS occurrence count is < ``rare_below``; rare_permille
    = floor(1000 * n_rare / n_tokens) (one deterministic per-row double
    division feeding FLOOR — integer-exact cross-engine).

    Plan: one explode + corpus term counts (one shuffle on term,
    map-side combine collapses to dictionary size), join back
    SHUFFLE-side (no broadcast hint — the dictionary is unbounded at
    100 TB; AQE may still broadcast when the measured size fits), one
    per-doc aggregate. Identical shuffle skeleton to tfidf_top_terms.
    """
    toks = docs.select(
        F.col(id_col).alias("_id"),
        F.explode(F.split(F.col(text_col), " ")).alias("term"),
    )
    counts = toks.groupBy("term").agg(F.count(F.lit(1)).alias("cnt"))
    per_doc = (
        toks.join(counts, "term")
        .groupBy("_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(
                F.when(F.col("cnt") < rare_below, 1).otherwise(0)
            ).alias("n_rare"),
        )
    )
    return per_doc.select(
        F.col("_id").alias(id_col),
        "n_tokens",
        "n_rare",
        F.floor(F.col("n_rare") * 1000.0 / F.col("n_tokens"))
        .cast("int")
        .alias("rare_permille"),
    )
