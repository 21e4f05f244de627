"""Property-based coverage for the round-7 operators (hypothesis):
random inputs, pure-Python references — the failure modes example
tables miss (adversarial size mixes, degenerate keys, empty sides)."""

from __future__ import annotations

from datetime import datetime, timedelta

from hypothesis import given, settings, strategies as st

from go_nonrat_annotation_pipeline_spark.operators.binpack import ffd_pack
from go_nonrat_annotation_pipeline_spark.operators.incrjoin import (
    join_view_maintain,
)
from go_nonrat_annotation_pipeline_spark.operators.scd import scd2_history


@settings(max_examples=12, deadline=None)
@given(
    sizes=st.lists(st.integers(min_value=1, max_value=128), min_size=1, max_size=40)
)
def test_ffd_matches_reference_on_random_sizes(spark, sizes):
    cap = 128
    docs = spark.createDataFrame(
        [(i, " ".join(["w"] * n)) for i, n in enumerate(sizes)],
        "doc_id long, text string",
    )
    out = ffd_pack(docs, bin_cap=cap, n_shards=2)
    by_shard: dict[int, list] = {}
    for r in out.collect():
        by_shard.setdefault(r.shard, []).append(r)
    placed = 0
    for rows in by_shard.values():
        loads: list[int] = []
        assign: dict[int, int] = {}
        for t, i in sorted(
            ((r.tok, r.doc_id) for r in rows), key=lambda p: (-p[0], p[1])
        ):
            for b, ld in enumerate(loads):
                if ld + t <= cap:
                    loads[b] += t
                    assign[i] = b + 1
                    break
            else:
                loads.append(t)
                assign[i] = len(loads)
        for r in rows:
            assert r.bin_no == assign[r.doc_id]
            placed += 1
        assert all(v <= cap for v in loads)
    assert placed == len(sizes)


@settings(max_examples=12, deadline=None)
@given(
    lo=st.lists(st.tuples(st.integers(0, 6), st.integers(0, 3)), max_size=12),
    dl=st.lists(st.tuples(st.integers(0, 6), st.integers(0, 3)), max_size=12),
    ro=st.lists(st.tuples(st.integers(0, 6), st.integers(0, 3)), max_size=12),
    dr=st.lists(st.tuples(st.integers(0, 6), st.integers(0, 3)), max_size=12),
)
def test_delta_join_equals_full_rejoin(spark, lo, dl, ro, dr):
    mk = lambda rows, v: spark.createDataFrame(  # noqa: E731
        [(k, f"{v}{x}") for k, x in rows] or [(None, None)],
        "k long, %s string" % v,
    ).where("k IS NOT NULL")
    LO, DL = mk(lo, "l"), mk(dl, "l")
    RO, DR = mk(ro, "r"), mk(dr, "r")
    view0 = LO.join(RO, "k")
    maintained = sorted(
        tuple(r) for r in join_view_maintain(view0, LO, DL, RO, DR, "k").collect()
    )
    full = sorted(
        tuple(r)
        for r in LO.unionByName(DL).join(RO.unionByName(DR), "k").collect()
    )
    assert maintained == full


@settings(max_examples=10, deadline=None)
@given(
    evs=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 9), st.sampled_from(
            ["a", "b", None]
        )),
        min_size=1,
        max_size=25,
    )
)
def test_scd2_runs_match_python_reference(spark, evs):
    # (key, minute, attr) with duplicate timestamps allowed — event_id
    # tiebreak keeps ordering deterministic
    base = datetime(2024, 1, 1)
    rows = [
        (i, k, base + timedelta(minutes=m), a)
        for i, (k, m, a) in enumerate(evs)
    ]
    got = sorted(
        (r.user_id, r.version, r.attr, r.valid_from_us, r.valid_to_us)
        for r in scd2_history(
            spark.createDataFrame(
                rows, "event_id long, user_id long, ts timestamp, "
                "event_type string"
            )
        ).collect()
    )
    # reference: per key, null-safe run collapse in (ts, id) order
    want = []
    per_key: dict[int, list] = {}
    for i, k, t, a in sorted(rows, key=lambda r: (r[1], r[2], r[0])):
        per_key.setdefault(k, []).append((int(t.timestamp() * 1e6), a))
    for k, seq in per_key.items():
        runs = []
        for ts, a in seq:
            if not runs or runs[-1][1] != a:
                runs.append([ts, a])
        for v, (ts, a) in enumerate(runs, 1):
            end = runs[v][0] if v < len(runs) else None
            want.append((k, v, a, ts, end))
    assert got == sorted(want)
