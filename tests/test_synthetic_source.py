"""Custom Python DataSource (sources/synthetic): partition-parallel,
deterministic, Arrow-batched — and composable with the corpus ops."""

from __future__ import annotations

from pyspark.sql import functions as F

from go_nonrat_annotation_pipeline_spark.sources import synthetic


def _load(spark, rows, parts):
    synthetic.register(spark)
    return (
        spark.read.format("synthetic_docs")
        .option("rows", rows)
        .option("numPartitions", parts)
        .load()
    )


def test_source_parallel_and_complete(spark):
    df = _load(spark, 10_000, 8)
    assert df.rdd.getNumPartitions() == 8
    assert df.count() == 10_000
    assert df.select("doc_id").distinct().count() == 10_000


def test_source_deterministic_across_partitionings(spark):
    a = {tuple(r) for r in _load(spark, 2_000, 3).collect()}
    b = {tuple(r) for r in _load(spark, 2_000, 7).collect()}
    assert a == b
    # spot-check content is the pure function of doc_id
    row = next(r for r in a if r[0] == 42)
    assert row[1] == " ".join(w for w in row[1].split(" "))  # well-formed
    assert row == synthetic.make_doc(42)


def test_source_feeds_corpus_operators(spark):
    from go_nonrat_annotation_pipeline_spark.operators.dedup import exact_dedup

    df = _load(spark, 5_000, 8)
    key = F.substring("text", 1, 11)  # 2-word prefix: ~256 combos → real dups
    marked = exact_dedup(df, key, "doc_id")
    assert marked.count() == 5_000  # annotates, doesn't drop
    kept = marked.where(~F.col("is_dup")).drop("is_dup", "canonical_id", "_k")
    n = kept.count()
    assert 0 < n < 5_000
    # idempotent on its own output
    again = exact_dedup(kept, key, "doc_id")
    assert again.where(F.col("is_dup")).count() == 0


def test_source_streams_in_offset_batches(spark):
    """The simpleStreamReader drains the bounded corpus through offset-
    tracked micro-batches; the union of batches equals the batch read."""
    from go_nonrat_annotation_pipeline_spark.streaming.stream import run_to_memory

    synthetic.register(spark)
    stream = (
        spark.readStream.format("synthetic_docs")
        .option("rows", 1_000)
        .option("rowsPerBatch", 300)
        .load()
    )
    out = run_to_memory(stream.select("doc_id", "lang"), "append")
    got = {(r.doc_id, r.lang) for r in out.collect()}
    want = {(d[0], d[2]) for d in map(synthetic.make_doc, range(1_000))}
    assert got == want
