from __future__ import annotations

from pyspark.sql import functions as F

from go_nonrat_annotation_pipeline_spark.operators import packing as P

SF = "/root/testdata/sf0.001"


def _docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def test_spans_are_contiguous_per_shard(spark):
    spans = P.pack_doc_spans(_docs(spark)).cache()
    # Exclusive prefix sums: within a shard, sorted by off, each doc
    # starts exactly where the previous one ended.
    rows = spans.orderBy("shard", "off").collect()
    by_shard: dict = {}
    for r in rows:
        assert r.off == by_shard.get(r.shard, 0)
        by_shard[r.shard] = r.off + r.tok
    # and the span arithmetic matches the offsets
    bad = spans.where(
        (F.col("first_seq") != (F.col("off") / P.DEFAULT_SEQ_LEN).cast("long"))
        | (
            F.col("last_seq")
            != ((F.col("off") + F.col("tok") - 1) / P.DEFAULT_SEQ_LEN).cast(
                "long"
            )
        )
    ).count()
    assert bad == 0


def test_seq_map_conserves_tokens(spark):
    docs = _docs(spark)
    spans = P.pack_doc_spans(docs)
    m = P.pack_seq_map(docs)
    per_doc = m.groupBy("doc_id").agg(F.sum("seq_tok").alias("t"))
    diff = (
        spans.join(per_doc, "doc_id")
        .where(F.col("t") != F.col("tok"))
        .count()
    )
    assert diff == 0
    assert m.where(F.col("seq_tok") <= 0).count() == 0


def test_every_non_tail_sequence_is_full(spark):
    rep = P.pack_sequence_report(_docs(spark)).cache()
    tails = rep.groupBy("shard").agg(F.max("seq").alias("tail_seq"))
    non_tail = rep.join(tails, "shard").where(F.col("seq") != F.col("tail_seq"))
    # defining property of concat-and-chunk: interior sequences exact
    assert non_tail.where(F.col("n_tokens") != P.DEFAULT_SEQ_LEN).count() == 0
    assert non_tail.where(F.col("is_full") != 1).count() == 0
    # sequence ids are dense 0..tail per shard
    n = rep.groupBy("shard").agg(
        F.count("*").alias("n"), F.max("seq").alias("mx")
    )
    assert n.where(F.col("n") != F.col("mx") + 1).count() == 0


def test_salt_reshuffles_but_conserves_stream(spark):
    docs = _docs(spark)
    a = P.pack_doc_spans(docs, salt="epoch0")
    b = P.pack_doc_spans(docs, salt="epoch1")
    # different epoch -> different order for at least one doc
    moved = (
        a.select("doc_id", "shard", "off")
        .join(
            b.select(
                "doc_id",
                F.col("shard").alias("s2"),
                F.col("off").alias("o2"),
            ),
            "doc_id",
        )
        .where((F.col("shard") != F.col("s2")) | (F.col("off") != F.col("o2")))
        .count()
    )
    assert moved > 0
    # but the total token stream is identical
    assert (
        a.agg(F.sum("tok")).first()[0] == b.agg(F.sum("tok")).first()[0]
    )
