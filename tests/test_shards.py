"""Training-shard shuffle invariants (operators/shards.py)."""

from __future__ import annotations

from go_nonrat_annotation_pipeline_spark.operators import shards as SH


def _ids(spark, n=200):
    return spark.range(n).selectExpr("id AS doc_id")


def test_deterministic_and_complete(spark):
    df = _ids(spark)
    a = {(r.doc_id, r.shard, r.pos) for r in
         SH.shard_assignments(df, "doc_id", 8, "epoch0").collect()}
    b = {(r.doc_id, r.shard, r.pos) for r in
         SH.shard_assignments(df, "doc_id", 8, "epoch0").collect()}
    assert a == b and len(a) == 200
    # positions are 1..len(shard) dense within every shard
    by_shard: dict = {}
    for _, s, p in a:
        by_shard.setdefault(s, []).append(p)
    for s, ps in by_shard.items():
        assert sorted(ps) == list(range(1, len(ps) + 1))


def test_salt_reshuffles(spark):
    df = _ids(spark)
    a = {r.doc_id: (r.shard, r.pos) for r in
         SH.shard_assignments(df, "doc_id", 8, "epoch0").collect()}
    b = {r.doc_id: (r.shard, r.pos) for r in
         SH.shard_assignments(df, "doc_id", 8, "epoch1").collect()}
    moved = sum(1 for k in a if a[k] != b[k])
    assert moved > 150  # a new salt is a genuinely different permutation


def test_order_decorrelates_ids(spark):
    """Consecutive training positions should not be consecutive ids —
    the whole point of the shuffle."""
    df = _ids(spark)
    rows = SH.shard_assignments(df, "doc_id", 4, "epoch0").collect()
    by_shard: dict = {}
    for r in rows:
        by_shard.setdefault(r.shard, []).append((r.pos, r.doc_id))
    adjacent_id_pairs = 0
    total_pairs = 0
    for ps in by_shard.values():
        ps.sort()
        for (p1, i1), (p2, i2) in zip(ps, ps[1:]):
            total_pairs += 1
            if abs(i2 - i1) == 1:
                adjacent_id_pairs += 1
    assert adjacent_id_pairs < total_pairs * 0.1
