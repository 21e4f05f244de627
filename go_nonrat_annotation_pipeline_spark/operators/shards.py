"""Deterministic global shuffle into training shards.

The last step every pre-training pipeline runs: the curated corpus is
dealt into N shards in a pseudorandom but REPRODUCIBLE order (so a
training run can be resumed/replayed byte-identically and so
consecutive documents are decorrelated — no source/time locality in a
training batch). Randomness is hash-derived, never an RNG: the repo's
cross-engine md5 hash (operators/sketches.hash60) keyed by a salt +
the doc id gives a deterministic permutation both engines agree on,
and changing the salt reshuffles for a new epoch.

Spark-first shape: shard assignment is a pure map-side expression;
within-shard positions are ONE hash-partitioned exchange + in-partition
sort (exactly the physical work a sharded shuffled write performs —
Spark's repartition(shard) + sortWithinPartitions — surfaced as an
explicit (shard, pos) so the order is an auditable artifact rather than
an accident of the writer). The per-shard window never funnels the
corpus through one task: N_shards partitions sort N/N_shards rows each.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

from .sketches import hash60
from .util import ensure_parallelism


def shard_assignments(
    df: DataFrame,
    id_col: str = "doc_id",
    n_shards: int = 8,
    salt: str = "epoch0",
) -> DataFrame:
    """(id, shard, pos): deterministic shard + within-shard training
    position for every row. ``salt`` reshuffles (new epoch, new
    permutation); identical inputs always produce identical order."""
    h = hash60(
        F.concat(F.lit(salt + "|"), F.col(id_col).cast("string"))
    )
    w = Window.partitionBy("shard").orderBy("h", id_col)
    return (
        ensure_parallelism(df.select(id_col))
        .select(id_col, h.alias("h"), (h % n_shards).alias("shard"))
        .withColumn("pos", F.row_number().over(w).cast("bigint"))
        .select(id_col, F.col("shard").cast("bigint").alias("shard"), "pos")
    )
