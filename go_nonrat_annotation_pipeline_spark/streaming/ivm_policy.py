"""Online-safe, policy-triggered compaction for the retraction IVM
(VERDICT r9 #4 — the operational half of streaming/ivm_compact.py).

``compact_signed_store`` is documented epochal: stream stopped,
checkpoint fully drained. This module adds the BETWEEN-micro-batches
variant with the replay analysis that makes the SAME fold safe while
the stream keeps running:

WHY a batch boundary is safe. foreachBatch(N) only fires after the
checkpoint committed batch N-1, so at the top of handle(N) — after
removing a dirty ``=N`` leftover exactly as the plain handler does —
every partition in the store belongs to a batch that can NEVER replay
(ids < N, or the ``-1`` seed). Folding the WHOLE store at that point
cannot double-apply anything; the only batch that can replay is N
itself, and N has written nothing yet. A crash mid-fold is covered by
the rename-only swap (ivm_compact._recover); a crash after the fold
but before batch N commits replays N, whose wrapper re-measures (the
fraction is now ~0, so it skips) and whose maintenance reads the seed
via the same ``admit_batch < N`` probe (-1 < N) — the Z-algebra is
closed under magnitude signs, so the fold is invisible to the delta.

WHY the in-flight admit can't race. Within one foreachBatch invocation
everything is sequential: dirty-partition sweep → policy check → fold →
delta compute → view write → base admits. Structured Streaming runs
one micro-batch at a time per query, so there is no concurrent writer
and the fold never sees a partially-written ``=N`` partition
(tests/test_ivm_policy.py pins this with a crash-replay interleaving).

POLICY. ``tombstone_fraction`` = 1 − kept/raw rows of a store: the
share of rows a net-fold would eliminate (net-zero insert/delete pairs
and multiplicity collapses). The policy folds any store whose fraction
exceeds ``threshold``; measuring costs one groupBy over the store —
the same shuffle a maintenance probe already pays — so ``check_every``
bounds the overhead. At 100 TB this is the LSM-style amortization
(RocksDB compaction / Delta OPTIMIZE): steady-state store size and
probe cost stay proportional to the LIVE set, not to CDC history
(SCALE.md ivm churn table, policy-triggered row).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession, functions as F

from .ivm_compact import (
    VIEW_SCHEMA,
    _recover,
    compact_signed_store,
    read_signed_store,
)
from .ivm_retract import L_SCHEMA, R_SCHEMA, make_ivm_retract_handler


def tombstone_fraction(
    spark: SparkSession, path: str, schema_ddl: str, part_col: str
) -> float:
    """Share of a signed store's rows that a net-fold would remove
    (0.0 on an empty or fully-live store)."""
    signed = read_signed_store(spark, path, schema_ddl, part_col)
    cols = [c for c in signed.columns if c != "sign"]
    raw = signed.count()
    if raw == 0:
        return 0.0
    kept = (
        signed.groupBy(*cols)
        .agg(F.sum("sign").alias("_net"))
        .where(F.col("_net") != 0)
        .count()
    )
    return 1.0 - kept / raw


def make_policy_compacting_handler(
    spark: SparkSession,
    l_dir: str,
    r_dir: str,
    view_dir: str,
    threshold: float = 0.5,
    check_every: int = 8,
    audit: list | None = None,
):
    """The plain retraction handler, wrapped with the batch-boundary
    compaction policy. ``audit`` (optional list) collects
    (batch_id, store, rows_before, rows_after) for the caller's log."""
    inner = make_ivm_retract_handler(spark, l_dir, r_dir, view_dir)
    stores = (
        ("l", l_dir, L_SCHEMA, "admit_batch"),
        ("r", r_dir, R_SCHEMA, "admit_batch"),
        ("view", view_dir, VIEW_SCHEMA, "batch"),
    )

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        # Finish or roll back any swap a crash interrupted BEFORE the
        # existence check: compact_signed_store can die between its two
        # renames, leaving the store dir absent with .compact_tmp/_old
        # holding the data. The isdir skip below would then hide the
        # store from this sweep and the inner handler's _read_store
        # would crash-loop on the missing path (ADVICE r10 #1). Done on
        # EVERY batch, not just policy batches — replay of a non-policy
        # batch must also find the store healed.
        for _, path, _, _ in stores:
            _recover(path)
        if batch_id > 0 and batch_id % check_every == 0:
            for tag, path, ddl, pc in stores:
                if not os.path.isdir(path):
                    continue
                # sweep a dirty =batch_id leftover BEFORE measuring or
                # folding, exactly as the inner handler would — only
                # committed partitions may enter the fold
                shutil.rmtree(
                    os.path.join(path, f"{pc}={batch_id}"),
                    ignore_errors=True,
                )
                if tombstone_fraction(spark, path, ddl, pc) > threshold:
                    b, a = compact_signed_store(spark, path, ddl, pc)
                    if audit is not None:
                        audit.append((batch_id, tag, b, a))
        inner(batch_df, batch_id)

    return handle
