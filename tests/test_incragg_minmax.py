"""MIN k-buffer maintenance (operators/incragg_minmax.py): maintained
min ≡ recompute for every non-rescan group across randomized CDC,
rescans happen exactly when the buffer exhausts, complete groups stay
exact, new groups and duplicate values behave."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from go_nonrat_annotation_pipeline_spark.operators.incragg_minmax import (
    min_view,
    minbuf_maintain,
    minbuf_state,
)

K = 4
SCHEMA = "g long, v long"


def _apply_reference(base, ins, dels):
    """Python multiset reference."""
    from collections import Counter

    c = Counter(base)
    for r in dels:
        assert c[r] > 0, f"CDC contract violated: {r}"
        c[r] -= 1
    for r in ins:
        c[r] += 1
    return [x for x, n in c.items() for _ in range(n)]


def _check(spark, base, ins, dels):
    bdf = spark.createDataFrame(base, SCHEMA)
    idf = spark.createDataFrame(ins or [(None, None)], SCHEMA).where(
        "g IS NOT NULL"
    )
    ddf = spark.createDataFrame(dels or [(None, None)], SCHEMA).where(
        "g IS NOT NULL"
    )
    st = minbuf_state(bdf, "g", "v", K)
    st2 = minbuf_maintain(st, idf, ddf, "g", "v", K)
    got = {r.g: r for r in min_view(st2, "g").collect()}

    truth = _apply_reference(base, ins, dels)
    want = {}
    for g, v in truth:
        want.setdefault(g, []).append(v)
    assert set(got) == set(want), (sorted(got), sorted(want))
    rescans = set()
    for g, vals in want.items():
        r = got[g]
        assert r.n == len(vals)
        if r.needs_rescan:
            rescans.add(g)
        else:
            assert r.min_val == min(vals), (g, r.min_val, min(vals))
    return rescans


def test_randomized_maintenance_matches_recompute(spark):
    rng = random.Random(7)
    base = [(g, rng.randrange(100)) for g in range(12) for _ in range(rng.randrange(1, 12))]
    from collections import Counter

    pool = Counter(base)
    dels = []
    for _ in range(25):
        g, v = rng.choice(list(pool.elements()))
        if pool[(g, v)] > 0 and dels.count((g, v)) < pool[(g, v)]:
            dels.append((g, v))
    ins = [(rng.randrange(14), rng.randrange(100)) for _ in range(20)]
    _check(spark, base, ins, dels)


def test_delete_the_minimum_stays_exact_until_buffer_exhausts(spark):
    base = [(1, v) for v in [5, 10, 15, 20, 25, 30]]
    # delete the 3 smallest: buffer (k=4) still holds 20 -> exact
    rescans = _check(spark, base, [], [(1, 5), (1, 10), (1, 15)])
    assert rescans == set()
    # delete all 4 buffered smallest: buffer empty, 25/30 unbuffered -> rescan
    rescans = _check(spark, base, [], [(1, 5), (1, 10), (1, 15), (1, 20)])
    assert rescans == {1}


def test_complete_group_never_rescans(spark):
    base = [(2, 7), (2, 9)]  # n <= k: whole group buffered
    rescans = _check(
        spark, base, [(2, 100), (2, 1)], [(2, 7), (2, 9)]
    )
    assert rescans == set()  # min becomes 1, exactly


def test_insert_below_boundary_repairs_deleted_min(spark):
    base = [(3, v) for v in range(10, 70, 10)]
    # delete current min, insert a smaller value in the same batch
    rescans = _check(spark, base, [(3, 1)], [(3, 10)])
    assert rescans == set()


def test_new_group_and_trim(spark):
    rescans = _check(spark, [], [(9, v) for v in [8, 6, 4, 2, 0, 10]], [])
    assert rescans == set()  # new group: min exact even past k inserts


def test_duplicate_values_multiset(spark):
    base = [(4, 5), (4, 5), (4, 5), (4, 9)]
    rescans = _check(spark, base, [], [(4, 5), (4, 5)])
    assert rescans == set()  # one 5 remains buffered -> min still 5


def test_exhaustion_is_sticky_across_batches(spark):
    """ADVICE r9: a second batch inserting into an EXHAUSTED group
    (buf drained, unbuffered rows remain) must NOT re-seed the buffer
    — min_view would otherwise report the insert as the min while
    smaller unbuffered base values (25, 30 here) remain."""
    base = [(1, v) for v in [5, 10, 15, 20, 25, 30]]
    bdf = spark.createDataFrame(base, SCHEMA)
    st = minbuf_state(bdf, "g", "v", K)
    empty = spark.createDataFrame([], SCHEMA)
    # batch 1 exhausts the k=4 buffer; 25 and 30 remain unbuffered
    d1 = spark.createDataFrame([(1, 5), (1, 10), (1, 15), (1, 20)], SCHEMA)
    st = minbuf_maintain(st, empty, d1, "g", "v", K).localCheckpoint()
    assert min_view(st, "g").collect()[0].needs_rescan
    # batch 2 inserts 99 (> true min 25): the flag must stay up and the
    # insert must not become the reported min
    i2 = spark.createDataFrame([(1, 99)], SCHEMA)
    st = minbuf_maintain(st, i2, empty, "g", "v", K).localCheckpoint()
    row = min_view(st, "g").collect()[0]
    assert (row.n, row.min_val, row.needs_rescan) == (3, None, True)
    # deletes into the exhausted group also stay unbuffered / flagged
    d3 = spark.createDataFrame([(1, 30)], SCHEMA)
    st = minbuf_maintain(st, empty, d3, "g", "v", K).localCheckpoint()
    row = min_view(st, "g").collect()[0]
    assert (row.n, row.needs_rescan) == (2, True)
    # the documented repair: rescan the flagged group against the base,
    # then maintenance is exact again
    remaining = spark.createDataFrame([(1, 25), (1, 99)], SCHEMA)
    st = minbuf_state(remaining, "g", "v", K)
    row = min_view(st, "g").collect()[0]
    assert (row.n, row.min_val, row.needs_rescan) == (2, 25, False)


def test_max_twin_mirrors_min(spark):
    """MAX by negation: delete-the-maximum exhausts exactly like the
    MIN twin, and exact groups report the true MAX."""
    from go_nonrat_annotation_pipeline_spark.operators.incragg_minmax import (
        max_view,
        maxbuf_maintain,
        maxbuf_state,
    )

    base = [(1, v) for v in [5, 10, 15, 20, 25, 30]]
    bdf = spark.createDataFrame(base, SCHEMA)
    st = maxbuf_state(bdf, "g", "v", K)
    empty = spark.createDataFrame([], SCHEMA)
    # delete the 3 largest: buffer (k=4) still holds 15 -> exact
    d1 = spark.createDataFrame([(1, 30), (1, 25), (1, 20)], SCHEMA)
    row = max_view(
        maxbuf_maintain(st, empty, d1, "g", "v", K), "g"
    ).collect()[0]
    assert (row.n, row.max_val, row.needs_rescan) == (3, 15, False)
    # delete all 4 buffered largest: 5/10 unbuffered -> rescan flagged
    d2 = spark.createDataFrame(
        [(1, 30), (1, 25), (1, 20), (1, 15)], SCHEMA
    )
    row = max_view(
        maxbuf_maintain(st, empty, d2, "g", "v", K), "g"
    ).collect()[0]
    assert (row.n, row.max_val, row.needs_rescan) == (2, None, True)


def test_second_batch_composes(spark):
    base = [(1, v) for v in [5, 10, 15, 20, 25, 30]]
    bdf = spark.createDataFrame(base, SCHEMA)
    st = minbuf_state(bdf, "g", "v", K)
    d1 = spark.createDataFrame([(1, 5), (1, 10)], SCHEMA)
    i1 = spark.createDataFrame([(1, 2)], SCHEMA)
    st = minbuf_maintain(st, i1, d1, "g", "v", K).localCheckpoint()
    d2 = spark.createDataFrame([(1, 2), (1, 15)], SCHEMA)
    i2 = spark.createDataFrame([(1, 17)], SCHEMA)
    st = minbuf_maintain(st, i2, d2, "g", "v", K)
    row = min_view(st, "g").collect()[0]
    # remaining: 17, 20, 25, 30
    assert (row.n, row.min_val, row.needs_rescan) == (4, 17, False)
