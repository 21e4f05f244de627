"""Property tests for the round-10 operator families: bitemporal
reconstruction against an independent Python reference over randomized
assertion logs (random backdating, corrections, duplicates), and the
FS fixed-point fold against exact integer arithmetic."""

from __future__ import annotations

import random

from go_nonrat_annotation_pipeline_spark.operators import fellegi as FS
from go_nonrat_annotation_pipeline_spark.operators.bitemporal import (
    bitemporal_history,
)

SCHEMA = "user_id long, val string, valid_us long, recorded_us long, _tie long"


def _reference(rows, as_of=None):
    """Independent model: dict-of-dict resolve, then run collapse."""
    best = {}
    for k, v, vu, ru, t in rows:
        if as_of is not None and ru > as_of:
            continue
        cur = best.get((k, vu))
        if cur is None or (ru, t) > (cur[1], cur[2]):
            n_sup = (cur[3] + 1) if cur else 0
            best[(k, vu)] = (v, ru, t, n_sup)
        else:
            best[(k, vu)] = (cur[0], cur[1], cur[2], cur[3] + 1)
    out = []
    bykey = {}
    for (k, vu), (v, _ru, t, sup) in best.items():
        bykey.setdefault(k, []).append((vu, t, v, sup))
    for k, items in bykey.items():
        items.sort()
        runs = []
        prev_val = object()
        for vu, t, v, sup in items:
            if v != prev_val:
                runs.append([vu, None, v, sup])
                prev_val = v
        for i, r in enumerate(runs):
            nxt = None
            # valid_to = next RUN's start (the next kept row's _v)
            if i + 1 < len(runs):
                nxt = runs[i + 1][0]
            out.append((k, r[2], r[0], nxt, i + 1, r[3]))
    return sorted(out)


def test_bitemporal_matches_reference_on_random_logs(spark):
    rng = random.Random(11)
    for trial in range(4):
        rows = []
        tie = 0
        for _ in range(rng.randrange(20, 60)):
            tie += 1
            rows.append(
                (
                    rng.randrange(3),                 # key
                    rng.choice("abcd"),               # value
                    rng.randrange(6) * 10,            # valid day
                    rng.randrange(100, 400),          # recorded
                    tie,
                )
            )
        df = spark.createDataFrame(rows, SCHEMA)
        for as_of in (None, 250):
            got = sorted(
                tuple(r)
                for r in bitemporal_history(df, as_of_us=as_of).collect()
            )
            assert got == _reference(rows, as_of), (trial, as_of)


def test_fs_fold_matches_python_integer_arithmetic(spark):
    from pyspark.sql import functions as F

    rng = random.Random(5)
    cases = []
    for i in range(40):
        gammas = [rng.random() < 0.5 for _ in range(4)]
        lrs = [
            (rng.randrange(1, 200) * FS.PPM, rng.randrange(1, FS.PPM))
            for _ in range(4)
        ]
        cases.append((i, gammas, lrs))
    rows = [
        (i, *gammas, *[x for pair in lrs for x in pair])
        for i, gammas, lrs in cases
    ]
    cols = "pid long, g0 boolean, g1 boolean, g2 boolean, g3 boolean, " + ", ".join(
        f"a{j} long, d{j} long" for j in range(4)
    )
    df = spark.createDataFrame(rows, cols)
    out = {
        r.pid: r.score_ppm
        for r in FS.fs_score(
            df, [(f"g{j}", f"a{j}", f"d{j}") for j in range(4)]
        ).collect()
    }
    for i, gammas, lrs in cases:
        want = FS.PPM
        for g, (a, d) in zip(gammas, lrs):
            lr = min(FS.LR_CAP, a if g else d)
            want = min(FS.SCORE_CAP, want * lr // FS.PPM)
        assert out[i] == want, i
