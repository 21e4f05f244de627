"""Deterministic sampling / splitting operators for training-data
pipelines (north-star extension; no reference counterpart — the
reference is a batch annotation loader, SURVEY.md §2.5).

Design constraints that shape every operator here:

- **Deterministic and engine-independent.** Sampling decisions key off
  the md5 hex digest of a stable row id — identical in Spark and DuckDB,
  so the oracle can replay the exact sample. Never ``rand()``: a resample
  under retry/speculative execution would produce a different dataset.
- **Map-side.** Split assignment and Bernoulli-style gates are pure
  projections (no shuffle); only quota sampling pays one hash-partition
  shuffle for its per-stratum window.
- **Skew-tolerant.** Quota sampling's window partitions by stratum; a
  hot stratum concentrates on one task only up to the quota scan, and
  the md5 ordering spreads ties uniformly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def hash_bucket_hex(id_col: Column, n_hex: int = 2) -> Column:
    """First n_hex chars of md5(id) — a uniform label in ['00'..'ff'].

    String comparison against a hex threshold gives engine-identical
    Bernoulli gates without integer conversion (DuckDB lacks Spark's
    ``conv``; lexicographic order on fixed-width lowercase hex == numeric
    order).
    """
    return F.substring(F.md5(id_col.cast("string")), 1, n_hex)


def train_test_split(
    df: DataFrame, id_col: str, threshold_hex: str = "cc"
) -> DataFrame:
    """Deterministic two-way split: md5 prefix <= threshold → 'train'.

    'cc' ≈ 205/256 ≈ 80.1% train. Pure projection — at 100 TB this is a
    map-side gate fused into the scan, no shuffle, and re-runs bit-
    identically on any cluster size.
    """
    return df.withColumn(
        "split",
        F.when(hash_bucket_hex(F.col(id_col)) <= threshold_hex, "train").otherwise(
            "test"
        ),
    )


def quota_sample(
    df: DataFrame, strata_cols: list[str], id_col: str, quota: int
) -> DataFrame:
    """At most `quota` rows per stratum, picked by md5 order (stable
    uniform-without-replacement). One shuffle on the strata key; the
    rank scan is streaming within each partition.
    """
    w = Window.partitionBy(*strata_cols).orderBy(
        F.md5(F.col(id_col).cast("string")), F.col(id_col)
    )
    return (
        df.withColumn("sample_rank", F.row_number().over(w))
        .where(F.col("sample_rank") <= quota)
        .drop("sample_rank")
    )


def chunk_text(
    df: DataFrame,
    id_col: str,
    text_col: str,
    chunk_size: int = 40,
    stride: int = 30,
) -> DataFrame:
    """Overlapping fixed-width character chunks (context-window packing
    prep). explode(sequence(...)) keeps everything JVM-side — one
    generator expression per row, no Python, no shuffle; output rows =
    ceil(len/stride) per doc.
    """
    starts = F.sequence(
        F.lit(0),
        F.greatest(F.length(F.col(text_col)) - 1, F.lit(0)),
        F.lit(stride),
    )
    return df.select(
        F.col(id_col),
        F.explode(starts).alias("chunk_start"),
        F.col(text_col),
    ).select(
        id_col,
        "chunk_start",
        F.col(text_col)
        .substr(F.col("chunk_start") + 1, F.lit(chunk_size))
        .alias("chunk"),
    )


def cluster_safe_split(
    docs: DataFrame,
    clusters: DataFrame,
    id_col: str = "doc_id",
    threshold_hex: str = "cc",
) -> DataFrame:
    """Leakage-safe train/test split: the gate hashes the near-dup
    CLUSTER id, not the document id, so every member of a cluster lands
    in the same split — near-duplicates of a test document can never
    leak into train. Documents absent from `clusters` (singletons) use
    their own id as cluster id.

    clusters: (doc_id, cluster_id) from connected_components_star over
    the near-dup pair graph. Map-side after one left join; the join key
    is the doc id, so with both sides hash-partitioned on it (or the
    cluster table broadcast — it is pair-graph-sized, ≪ corpus) no extra
    shuffle is introduced at scale.
    """
    c = clusters.select(
        F.col(id_col).alias("_cid_doc"), F.col("cluster_id").alias("_cl")
    )
    # the cluster table is pair-graph-sized (only docs that appear in a
    # near-dup pair) — broadcast it so the corpus side never shuffles
    joined = docs.join(
        F.broadcast(c), docs[id_col] == F.col("_cid_doc"), "left"
    ).withColumn(
        "cluster_id", F.coalesce(F.col("_cl"), F.col(id_col).cast("long"))
    )
    return joined.withColumn(
        "split",
        F.when(
            hash_bucket_hex(F.col("cluster_id")) <= threshold_hex,
            F.lit("train"),
        ).otherwise(F.lit("test")),
    ).drop("_cid_doc", "_cl")


def text_shingles(
    text: Column, n: int = 13, sep: str = " "
) -> Column:
    """Distinct n-word shingle hashes as md5 of the joined gram TEXT —
    overflow-free at any n (unlike the positional word-hash combination
    in functions/hashing.shingle_hashes, whose 31^(n-1) multiplier
    overflows int64 beyond n≈8). Empty array for docs shorter than n
    words."""
    from ..functions.hashing import char_hash

    ws = F.split(text, sep)
    idx = F.sequence(F.lit(1), F.greatest(F.size(ws) - F.lit(n - 1), F.lit(0)))
    grams = F.transform(
        idx, lambda i: char_hash(F.array_join(F.slice(ws, i, n), sep))
    )
    return F.when(F.size(ws) >= n, F.array_distinct(grams)).otherwise(
        F.expr("cast(array() as array<bigint>)")
    )


def contamination_pairs(
    train: DataFrame,
    test: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 13,
) -> DataFrame:
    """Benchmark-decontamination scan: (train_id, test_id, shared) for
    every train/test pair sharing at least one exact n-word shingle —
    the standard n-gram overlap check run before training on any corpus
    that might contain evaluation data.

    Scale shape: explode each side to (id, gram) — distinct grams only —
    and equi-join on the gram hash; long n makes grams near-unique, so
    the join output is contamination-sized, not corpus-sized. One
    aggregate on the colliding pairs."""
    tr = train.select(
        F.col(id_col).alias("train_id"),
        F.explode(text_shingles(F.col(text_col), n)).alias("g"),
    )
    te = test.select(
        F.col(id_col).alias("test_id"),
        F.explode(text_shingles(F.col(text_col), n)).alias("g"),
    )
    return (
        tr.join(te, "g")
        .groupBy("train_id", "test_id")
        .agg(F.count(F.lit(1)).alias("shared"))
    )


def pps_systematic_sample(
    df: DataFrame,
    weight: Column,
    id_col: str = "doc_id",
    step: int = 1000,
) -> DataFrame:
    """Probability-proportional-to-size SYSTEMATIC sampling: select a
    row whenever the running weight total crosses a multiple of
    ``step`` — each row's selection probability is weight/step (rows
    heavier than step are always selected, possibly representing
    multiple crossings), and the whole sample is INTEGER-EXACT and
    deterministic (no RNG: the classic systematic PPS design with a
    fixed ordering key instead of a random start).

    This is how a mixture builder takes a weighted subsample (quality-
    or length-weighted) reproducibly: same data → same sample, any
    partitioning. One running-sum window ordered by id (a single range
    partition sort at scale — at 100 TB shard by a coarse id prefix
    first and sample within shards, which preserves the per-row
    inclusion probability).

    Returns (id, weight, n_hits) for selected rows, n_hits = number of
    step-multiples the row's weight span covers (≥ 1).
    """
    from pyspark.sql import Window as _W

    w = _W.orderBy(id_col).rowsBetween(_W.unboundedPreceding, 0)
    cum = F.sum(weight.cast("long")).over(w)
    prev = cum - weight.cast("long")

    # integer floor-div via pmod: (x - x%s)/s is a division of an exact
    # multiple — bit-exact in both engines for totals < 2^53 (beyond
    # that, switch the running sum to DECIMAL)
    def fdiv(x):
        return ((x - F.pmod(x, F.lit(step))) / F.lit(step)).cast("long")

    hits = (fdiv(cum) - fdiv(prev)).cast("int")
    return (
        df.select(
            F.col(id_col),
            weight.cast("long").alias("weight"),
            hits.alias("n_hits"),
        )
        .where(F.col("n_hits") >= 1)
    )
