"""Policy-triggered batch-boundary compaction (streaming/ivm_policy.py):
the compacting handler must produce a view identical to the plain
handler's across delete-heavy churn, the fold must fire only when the
tombstone fraction crosses the threshold, it must never fold the
in-flight batch, and a crash between the fold and the batch commit must
replay to the same answer."""

from __future__ import annotations

import os
import shutil

from pyspark.sql import functions as F

from go_nonrat_annotation_pipeline_spark.streaming.ivm_policy import (
    make_policy_compacting_handler,
    tombstone_fraction,
)
from go_nonrat_annotation_pipeline_spark.streaming.ivm_retract import (
    make_ivm_retract_handler,
    read_view_net,
)

SCHEMA = "side string, op string, k long, attr string, qty long"
L_DDL = "k long, attr string, sign long"


def _seed_empty(spark, l_dir, r_dir):
    for path, ddl in (
        (l_dir, "k long, attr string"),
        (r_dir, "k long, qty long"),
    ):
        spark.createDataFrame([], ddl).withColumn(
            "sign", F.lit(1).cast("long")
        ).write.mode("overwrite").parquet(
            os.path.join(path, "admit_batch=-1")
        )


def _churn(rounds):
    """Tombstone-heavy: every round inserts+deletes a k=1 row and adds
    one live R row; one final live L row makes the join non-empty."""
    out = [
        [
            ("L", "I", 1, f"tmp{i}", None),
            ("L", "D", 1, f"tmp{i}", None),
            ("R", "I", 2, None, 100 + i),
        ]
        for i in range(rounds)
    ]
    out.append([("L", "I", 2, "keep", None)])
    return out


def _dirs(tmp_path, name):
    root = tmp_path / name
    return str(root / "l"), str(root / "r"), str(root / "v")


def _parts(d, pc):
    return sorted(
        int(p.split("=", 1)[1])
        for p in os.listdir(d)
        if p.startswith(pc + "=")
    )


def test_policy_view_matches_plain_handler_and_store_shrinks(
    spark, tmp_path
):
    batches = _churn(12)
    l1, r1, v1 = _dirs(tmp_path, "plain")
    _seed_empty(spark, l1, r1)
    plain = make_ivm_retract_handler(spark, l1, r1, v1)
    for i, rows in enumerate(batches):
        plain(spark.createDataFrame(rows, SCHEMA), i)

    l2, r2, v2 = _dirs(tmp_path, "policy")
    _seed_empty(spark, l2, r2)
    audit: list = []
    pol = make_policy_compacting_handler(
        spark, l2, r2, v2, threshold=0.4, check_every=4, audit=audit
    )
    for i, rows in enumerate(batches):
        pol(spark.createDataFrame(rows, SCHEMA), i)

    want = sorted(tuple(r) for r in read_view_net(spark, v1).collect())
    got = sorted(tuple(r) for r in read_view_net(spark, v2, l2, r2).collect())
    assert got == want and len(want) == 12
    # the fold actually fired (L is 2/3 tombstones every 4 batches) and
    # shrank the store each time
    l_folds = [a for a in audit if a[1] == "l"]
    assert l_folds and all(after < before for _, _, before, after in l_folds)
    # compacted store stays bounded: seed + at most check_every admits
    assert len(_parts(l2, "admit_batch")) <= 4 + 1


def test_policy_skips_below_threshold(spark, tmp_path):
    """All-live inserts (no deletes): fraction 0, the fold never fires."""
    l_dir, r_dir, v_dir = _dirs(tmp_path, "live")
    _seed_empty(spark, l_dir, r_dir)
    audit: list = []
    pol = make_policy_compacting_handler(
        spark, l_dir, r_dir, v_dir, threshold=0.2, check_every=2, audit=audit
    )
    for i in range(6):
        pol(
            spark.createDataFrame(
                [("L", "I", i, f"p{i}", None), ("R", "I", i, None, i)],
                SCHEMA,
            ),
            i,
        )
    assert audit == []
    assert tombstone_fraction(spark, l_dir, L_DDL, "admit_batch") == 0.0
    # every admit partition is still in place (no fold touched the dir)
    assert _parts(l_dir, "admit_batch") == [-1, 0, 1, 2, 3, 4, 5]


def test_fold_never_touches_inflight_batch_and_crash_replays(
    spark, tmp_path
):
    """Interleaving pin: a crash AFTER the fold but BEFORE batch N's
    writes must replay batch N to the correct view — the fold must not
    have absorbed any of N's data (it hadn't been written), and the
    replay's ``admit_batch < N`` probe reads the new seed."""
    batches = _churn(7)  # batches 0..7; we'll crash batch 8
    l_dir, r_dir, v_dir = _dirs(tmp_path, "crash")
    _seed_empty(spark, l_dir, r_dir)
    audit: list = []
    pol = make_policy_compacting_handler(
        spark, l_dir, r_dir, v_dir, threshold=0.4, check_every=8, audit=audit
    )
    for i, rows in enumerate(batches):
        pol(spark.createDataFrame(rows, SCHEMA), i)
    assert audit == []  # check_every=8 hasn't fired yet

    # leave a dirty view partition for batch 8 (a previous crashed
    # attempt), then simulate: policy fires at batch 8, folds, then the
    # process dies before the inner handler runs
    crash_rows = [("L", "I", 3, "late", None), ("R", "I", 3, None, 30)]
    os.makedirs(os.path.join(v_dir, "batch=8"), exist_ok=True)
    for tag, path, ddl, pc in (
        ("l", l_dir, L_DDL, "admit_batch"),
        ("r", r_dir, "k long, qty long, sign long", "admit_batch"),
    ):
        shutil.rmtree(os.path.join(path, f"{pc}=8"), ignore_errors=True)
        from go_nonrat_annotation_pipeline_spark.streaming.ivm_policy import (
            tombstone_fraction as tf,
        )
        from go_nonrat_annotation_pipeline_spark.streaming.ivm_compact import (
            compact_signed_store,
        )

        if tf(spark, path, ddl, pc) > 0.4:
            compact_signed_store(spark, path, ddl, pc)
    # ... crash here: batch 8 never wrote its view/admits ...
    assert _parts(l_dir, "admit_batch") == [-1]  # folded, no =8 anywhere

    # replay of batch 8 through the normal policy handler
    pol(spark.createDataFrame(crash_rows, SCHEMA), 8)
    got = sorted(
        tuple(r) for r in read_view_net(spark, v_dir, l_dir, r_dir).collect()
    )

    # reference: plain handler, no compaction, same feed
    l2, r2, v2 = _dirs(tmp_path, "ref")
    _seed_empty(spark, l2, r2)
    plain = make_ivm_retract_handler(spark, l2, r2, v2)
    for i, rows in enumerate(batches):
        plain(spark.createDataFrame(rows, SCHEMA), i)
    plain(spark.createDataFrame(crash_rows, SCHEMA), 8)
    want = sorted(tuple(r) for r in read_view_net(spark, v2).collect())
    assert got == want


def test_crash_mid_compaction_heals_on_next_batch(spark, tmp_path):
    """ADVICE r10 #1: compact_signed_store can die between its two
    renames, leaving the store dir MISSING with the folded copy in
    .compact_tmp. The policy handler used to skip missing dirs and the
    inner handler then crash-looped on the absent path; it must now
    _recover every store up front — on any batch, policy or not — and
    replay to the same view as an uninterrupted run."""
    batches = _churn(7)  # batch ids 0..7
    l_dir, r_dir, v_dir = _dirs(tmp_path, "midcrash")
    _seed_empty(spark, l_dir, r_dir)
    pol = make_policy_compacting_handler(
        spark, l_dir, r_dir, v_dir, threshold=0.4, check_every=100
    )
    for i, rows in enumerate(batches[:-1]):
        pol(spark.createDataFrame(rows, SCHEMA), i)

    # simulate the mid-swap crash: fold committed to tmp, store renamed
    # away (rename 1 done, rename 2 not) — store dir is GONE
    from go_nonrat_annotation_pipeline_spark.streaming.ivm_compact import (
        compact_signed_store,
    )

    compact_signed_store(spark, l_dir, L_DDL)  # healthy fold first
    os.rename(l_dir, l_dir + ".compact_tmp")
    assert not os.path.isdir(l_dir)

    # batch 7 (NOT a policy batch: check_every=100) must heal and apply
    pol(spark.createDataFrame(batches[-1], SCHEMA), 7)
    assert os.path.isdir(l_dir)
    got = sorted(
        tuple(r) for r in read_view_net(spark, v_dir, l_dir, r_dir).collect()
    )

    l2, r2, v2 = _dirs(tmp_path, "midcrash_ref")
    _seed_empty(spark, l2, r2)
    plain = make_ivm_retract_handler(spark, l2, r2, v2)
    for i, rows in enumerate(batches):
        plain(spark.createDataFrame(rows, SCHEMA), i)
    want = sorted(tuple(r) for r in read_view_net(spark, v2).collect())
    assert got == want
