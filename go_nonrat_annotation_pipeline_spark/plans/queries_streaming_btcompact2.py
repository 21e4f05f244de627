"""As-of read AT/ABOVE the knowledge horizon on a bitemporal store
that ACTUALLY folded — round-12 module, registered AFTER WINDOW_R12
(leads round 13). Closes VERDICT r11 Next #6: the refusal path below
the horizon was pytest-pinned (tests/test_bitemporal_compact.py) but
no registered query exercised a reconstructible as-of on a folded
store.

The production rhythm this models: stream assertions, fold during a
quiet window (stream stopped, checkpoint committed — the epochal
contract), CONTINUE the same stream on the same checkpoint, then
reproduce a past run's view with an as-of cutoff that lies at/above
the fold's knowledge horizon. The log is split by RECORDED time at two
fixed instants T1 < T2 (events span 2024-01-01..30 at every SF, so
all three segments are non-empty): segments 0 and 1 drain first
(policy handler — opportunistic boundary folds included), the store is
folded OFFLINE (horizon := max recorded < T2 by construction, so the
cutoff T2 is reconstructible at any SF), segment 2 drains on the SAME
checkpoint, and the final read is ``as_of_us = T2`` — assertions
recorded at/after T2 are masked while every belief at T2 survives the
fold (winners carry their absorbed-correction counts). The oracle is
the plain uncompacted as-of SQL at T2 over the whole log: fold
invisibility for every reconstructible cutoff, now driver-checked on
the nontrivial cutoff (between horizon and max recorded), not just at
current knowledge.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from ..operators import bitemporal as BT
from ..streaming.bitemporal_compact import (
    bitemporal_view_compacted,
    fold_bitemporal_store,
    knowledge_horizon,
    make_compacting_bitemporal_handler,
)
from ..streaming.bitemporal_stream import ASSERT_SCHEMA
from .registry import register
from .queries_bitemporal import _SRC, _asserts

# recorded-time split instants: 2024-01-11 / 2024-01-21 00:00:00Z
_T1_US = 1_704_931_200_000_000
_T2_US = 1_705_795_200_000_000


@register(
    "stream_btcompact_asof",
    "    WITH "
    + _SRC
    + ","
    + BT.sql_bitemporal_ctes("btq_src", "user_id", _T2_US, "btq")
    + """
    SELECT user_id, val, valid_from_us, valid_to_us, version,
           n_superseded
    FROM btq_hist
    """,
    doc="as-of reconstruction at a cutoff at/above the knowledge "
    "horizon of a policy-compacted store that folded mid-history "
    "(stream segments 0-1, offline fold, segment 2 on the same "
    "checkpoint): later-recorded assertions are masked, absorbed "
    "corrections stay counted via the fold carry, and the result "
    "hash-equals the uncompacted as-of SQL — the reconstructible "
    "half of the retention boundary, whose refusal half is "
    "pytest-pinned",
)
def stream_btcompact_asof(spark, sf_dir):
    asserts = _asserts(spark, sf_dir)
    root = tempfile.mkdtemp(prefix="stream_btcasof_")
    try:
        staged = os.path.join(root, "a")
        os.makedirs(staged)
        base = 1_600_000_000
        cuts = [
            f"recorded_us < {_T1_US}",
            f"recorded_us >= {_T1_US} AND recorded_us < {_T2_US}",
            f"recorded_us >= {_T2_US}",
        ]

        def stage(i: int) -> None:
            tmp = os.path.join(root, f"tmp_{i}")
            asserts.where(cuts[i]).coalesce(1).write.mode(
                "overwrite"
            ).parquet(tmp)
            part = next(
                p for p in os.listdir(tmp) if p.endswith(".parquet")
            )
            dst = os.path.join(staged, f"b{i}.parquet")
            shutil.move(os.path.join(tmp, part), dst)
            os.utime(dst, (base + i, base + i))
            shutil.rmtree(tmp)

        store = os.path.join(root, "store")
        ckpt = os.path.join(root, "ckpt")

        def drain() -> None:
            handler = make_compacting_bitemporal_handler(
                spark, store, threshold=0.0, check_every=1
            )
            q = (
                spark.readStream.schema(ASSERT_SCHEMA)
                .option("maxFilesPerTrigger", 1)
                .parquet(staged)
                .writeStream.outputMode("append")
                .option("checkpointLocation", ckpt)
                .foreachBatch(handler)
                .start()
            )
            try:
                q.processAllAvailable()
            finally:
                q.stop()

        stage(0)
        stage(1)
        drain()
        # offline fold in the quiet window (epochal contract: stream
        # stopped, checkpoint committed). Horizon = max recorded over
        # segments 0-1 < T2, so the T2 cutoff stays reconstructible.
        fold_bitemporal_store(spark, store)
        h = knowledge_horizon(store)
        assert h is not None and h < _T2_US, (h, _T2_US)
        stage(2)
        drain()  # same checkpoint: only the new file replays
        return bitemporal_view_compacted(
            spark, store, as_of_us=_T2_US
        ).localCheckpoint()
    finally:
        shutil.rmtree(root, ignore_errors=True)
