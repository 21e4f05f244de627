"""Signed-store compaction for the retraction IVM (VERDICT r8,
What's missing #3).

Lives in its OWN module: streaming/ivm_retract.py and
operators/incrjoin_retract.py back two WINDOW_R9 rows and are frozen
for the round (plans/registry.py freeze rule), so the compaction path
composes with them from the outside.

The retraction stores are append-only logs of signed rows (a delete is
a −1 row, never an in-place update — the object-store-friendly write
pattern). Under sustained insert/delete churn that means net-zero
tombstone pairs accumulate, the bases and the view grow without bound,
and every maintenance batch probes the ever-growing store.
``compact_signed_store`` net-folds a store's partitions into a single
seed partition holding ONE row per distinct tuple with
``sign = net multiplicity``:

- the Z-relation algebra is closed under magnitude signs —
  ``signed_join`` multiplies signs and ``net_rows`` sums them, so a
  row with multiplicity m compacts to one row with sign m and every
  downstream join/fold is unchanged (tests assert byte-identical view
  results across a compaction);
- a net-NEGATIVE row (a delete still awaiting its out-of-order insert)
  is kept at its negative sign, not dropped — cancellation happens
  when the insert arrives, exactly as in the uncompacted log.

SAFETY CONTRACT (epochal / offline compaction, the log-structured
store discipline): run ONLY while the maintaining stream is stopped
AND its checkpoint has committed every delivered batch. A batch
replayed after its delta was folded into the seed would double-apply —
the replay protocol assumes ``admit_batch=<id>`` is the only place
that batch's delta lives. Continue afterwards with the SAME
checkpoint so batch ids stay monotonic (the compacted seed sits at
partition id −1, below every future batch's ``admit_batch < N``
probe).

The swap commit is RENAME-ONLY on the critical path (ADVICE r9: a
crash mid-``rmtree(store)`` would leave a partially-deleted store that
recovery could mistake for the intact original): write
``<store>.compact_tmp`` → rename store → ``<store>.compact_old`` →
rename tmp → store → delete old. Every state an interruption can
leave is unambiguous — the store directory is always either the
complete original or the complete compacted copy, never truncated:
tmp present with the store intact → fold never committed, discard
tmp; store missing with tmp present → finish rename 2; store missing
with only old present → undo rename 1; old present with the store
intact → the swap committed, finish the cleanup delete.

Reference posture parity: the reference refreshes its annotation set
incrementally and periodically folds accumulated updates
(/root/reference changes.txt:211-214); this is the Spark-side
equivalent for the signed CDC store.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import LongType, StructField, StructType

from .ivm_retract import L_SCHEMA, R_SCHEMA

VIEW_SCHEMA = "k long, attr string, qty long, sign long"

# Folding erases the individual ``part_col=<id>`` partitions, which is
# exactly what ivm_retract.committed_batch_frontier keys on — so each
# fold records the highest batch id it absorbed in this marker file at
# the store root (ADVICE r10 #2). Underscore prefix keeps Spark's
# parquet reader from treating it as data. The marker is written into
# the tmp copy BEFORE the swap renames, so it commits atomically with
# the folded rows, and it is monotone (max with any prior marker).
FRONTIER_MARKER = "_folded_frontier"


def folded_frontier(path: str) -> int | None:
    """The highest batch id ever folded into this store's seed
    partition (None if the store was never compacted)."""
    mf = os.path.join(path, FRONTIER_MARKER)
    if not os.path.isfile(mf):
        return None
    with open(mf) as fh:
        return int(fh.read().strip())


def _recover(path: str) -> None:
    """Finish or discard an interrupted compaction (see module doc).

    Rename-only protocol means the store is never partially deleted:
    if ``path`` exists it is complete (either the original — tmp is
    then an uncommitted fold — or the compacted copy — old is then
    awaiting cleanup); if ``path`` is missing the crash hit between
    the two renames and whichever of tmp/old exists is complete."""
    tmp = path + ".compact_tmp"
    old = path + ".compact_old"
    if os.path.isdir(path):
        shutil.rmtree(tmp, ignore_errors=True)
        shutil.rmtree(old, ignore_errors=True)
        return
    if os.path.isdir(tmp):
        os.rename(tmp, path)
        shutil.rmtree(old, ignore_errors=True)
    elif os.path.isdir(old):
        os.rename(old, path)


def read_signed_store(
    spark: SparkSession, path: str, schema_ddl: str, part_col: str
) -> DataFrame:
    """All signed rows of a store, every partition, partition col
    dropped (the compaction input; unlike ivm_store._read_store there
    is no ``< before_batch`` cut — compaction folds everything)."""
    base = spark.createDataFrame([], schema_ddl)
    schema = StructType(
        list(base.schema.fields) + [StructField(part_col, LongType())]
    )
    return (
        spark.read.schema(schema)
        .option("basePath", path)
        .parquet(path)
        .drop(part_col)
    )


def compact_signed_store(
    spark: SparkSession,
    path: str,
    schema_ddl: str,
    part_col: str = "admit_batch",
) -> tuple[int, int]:
    """Net-fold every ``part_col=*`` partition of a signed store into
    one ``part_col=-1`` seed partition; returns
    ``(rows_before, rows_after)`` for the caller's audit log.

    One groupBy over the store (the same shuffle a single view READ
    pays), then a swap-directory commit. The fold is localCheckpointed
    before the store directory is removed — the new rows must not
    lazily re-read the files being deleted.
    """
    _recover(path)
    signed = read_signed_store(spark, path, schema_ddl, part_col)
    cols = [c for c in signed.columns if c != "sign"]
    n_before = signed.count()
    folded = (
        signed.groupBy(*cols)
        .agg(F.sum("sign").cast("long").alias("sign"))
        .where(F.col("sign") != 0)
        .localCheckpoint()
    )
    n_after = folded.count()
    # highest id this fold absorbs: every partition present now, max'd
    # with any prior fold's marker (a fold of a seed-only store must
    # not regress the recorded frontier)
    absorbed = [
        int(name.split("=", 1)[1])
        for name in os.listdir(path)
        if name.startswith(part_col + "=")
    ]
    prior = folded_frontier(path)
    frontier = max(absorbed + ([prior] if prior is not None else []))
    tmp = path + ".compact_tmp"
    old = path + ".compact_old"
    shutil.rmtree(tmp, ignore_errors=True)
    folded.write.mode("overwrite").parquet(
        os.path.join(tmp, f"{part_col}=-1")
    )
    with open(os.path.join(tmp, FRONTIER_MARKER), "w") as fh:
        fh.write(str(frontier))
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)
    return n_before, n_after


def compact_ivm_retract(
    spark: SparkSession, l_dir: str, r_dir: str, view_dir: str
) -> dict[str, tuple[int, int]]:
    """Compact all three artifacts of a retraction IVM (left base,
    right base, signed view). Returns per-store (before, after) row
    counts. Same safety contract as compact_signed_store — stream
    stopped, checkpoint fully committed."""
    return {
        "l": compact_signed_store(spark, l_dir, L_SCHEMA, "admit_batch"),
        "r": compact_signed_store(spark, r_dir, R_SCHEMA, "admit_batch"),
        "view": compact_signed_store(spark, view_dir, VIEW_SCHEMA, "batch"),
    }
