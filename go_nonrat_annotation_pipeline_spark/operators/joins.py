"""Join strategies Spark lacks natively: binned range joins and
bloom-prefiltered joins.

Both are *plan* transformations — the results are bit-identical to the
naive formulation (an inequality theta-join / a plain equi-join), which
is exactly what their DuckDB oracles assert. What changes is the shape
of the work at scale:

- A raw ``probe.ts BETWEEN build.lo AND build.hi`` join has no equi-key,
  so Spark executes BroadcastNestedLoopJoin (O(N*M) comparisons, or an
  outright driver OOM when neither side fits). ``range_bin_join``
  manufactures the equi-key: intervals explode into the fixed-width bins
  they cover, probes map to their single bin, and the join becomes a
  hash equi-join on (key, bin) followed by the exact range predicate on
  the (tiny) candidate set. Bin width is the knob: ~median interval
  width keeps the explode factor ~2 while making candidates ~= matches.

- ``bloom_prefilter_join`` targets the other asymmetry: a huge probe
  side shuffled against a small-but-not-broadcastable build side. A
  d-hash bitset of the build keys (packed into 64-bit words, itself a
  two-level aggregation that never leaves the executors until it is
  word-sized) broadcast-prunes probe rows BEFORE the shuffle join; false
  positives are removed by the real join, false negatives cannot occur,
  so result == plain join. This is the DataFrame-level version of what
  Spark's runtime row-level filtering (spark.sql.optimizer.
  runtimeFilter.bloomFilter.enabled) does inside the optimizer — made
  explicit so it applies on any join the optimizer declines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .sketches import hash60


def range_bin_join(
    probe: DataFrame,
    build: DataFrame,
    probe_key: str,
    build_key: str,
    probe_ts: str,
    build_lo: str,
    build_hi: str,
    bin_seconds: int = 7 * 86400,
) -> DataFrame:
    """Equi-key + interval-containment join via bin bucketing.

    Returns probe rows joined to every build interval of the same key
    containing probe_ts (inclusive lo, exclusive hi) — the exact result
    of the theta-join, via a hash-joinable plan. Each interval lands in
    ``ceil(width/bin)+1`` bins; each probe row in exactly ONE bin, so no
    post-join dedup is needed (a given (probe, interval) pair can only
    meet at the probe's bin).
    """
    lo_e = F.unix_timestamp(F.col(build_lo))
    hi_e = F.unix_timestamp(F.col(build_hi))
    p_e = F.unix_timestamp(F.col(probe_ts))
    b = (
        build.withColumn("__lo", lo_e)
        .withColumn("__hi", hi_e)
        .withColumn(
            "__bin",
            F.explode(
                F.sequence(
                    F.floor(F.col("__lo") / bin_seconds),
                    # hi is exclusive: a zero-width or bin-aligned end
                    # must not spill an extra empty bin
                    F.floor((F.col("__hi") - 1) / bin_seconds),
                )
            ),
        )
    )
    p = probe.withColumn("__pe", p_e).withColumn(
        "__bin", F.floor(F.col("__pe") / bin_seconds)
    )
    out = p.join(
        b,
        (p["__bin"] == b["__bin"])
        & (p[probe_key] == b[build_key])
        & (p["__pe"] >= b["__lo"])
        & (p["__pe"] < b["__hi"]),
    )
    return out.drop("__bin", "__pe", "__lo", "__hi")


def bloom_bitset(
    build: DataFrame, key: Column, n_hashes: int = 2, log2_bits: int = 16
) -> DataFrame:
    """Build a bloom bitset over build keys: (word_idx, word) rows.

    Bit positions come from the cross-engine 60-bit md5 hash salted per
    hash function; packing is groupBy(word_idx) BIT_OR of 1<<(pos%64).
    The result is at most 2^log2_bits / 64 rows (1024 for the default) —
    broadcast-sized by construction, and mergeable across shards by
    word-wise BIT_OR.
    """
    m = 1 << log2_bits
    salts = F.array(*[F.lit(str(d)) for d in range(n_hashes)])
    pos = (
        build.select(F.explode(salts).alias("salt"), key.alias("k"))
        .select((hash60(F.concat(F.col("salt"), F.lit("|"), F.col("k"))) % m).alias("pos"))
        .distinct()
    )
    return (
        pos.select(
            F.shiftright(F.col("pos"), 6).alias("word_idx"),
            F.expr("shiftleft(cast(1 as bigint), cast(pos % 64 as int))").alias("bit"),
        )
        .groupBy("word_idx")
        .agg(F.expr("bit_or(bit)").alias("word"))
    )


def bloom_prefilter_join(
    probe: DataFrame,
    build: DataFrame,
    probe_key: str,
    build_key: str,
    n_hashes: int = 2,
    log2_bits: int = 16,
) -> DataFrame:
    """Inner equi-join with a broadcast bloom prefilter on the probe side.

    Result is exactly ``probe JOIN build ON probe_key == build_key``
    (bloom filters admit false positives — removed by the real join —
    and no false negatives). The prefilter turns the probe-side shuffle
    volume into (selectivity + fp_rate) of the input instead of 100%.
    """
    m = 1 << log2_bits
    bits = bloom_bitset(build, F.col(build_key).cast("string"), n_hashes, log2_bits)
    filtered = probe
    for d in range(n_hashes):
        pos = hash60(F.concat(F.lit(f"{d}|"), F.col(probe_key).cast("string"))) % m
        w = bits.select(
            F.col("word_idx").alias(f"__wi{d}"), F.col("word").alias(f"__w{d}")
        )
        filtered = (
            filtered.withColumn(f"__pos{d}", pos)
            .join(
                F.broadcast(w),
                F.shiftright(F.col(f"__pos{d}"), 6) == F.col(f"__wi{d}"),
                "left",
            )
            .where(
                F.expr(
                    f"shiftright(coalesce(__w{d}, cast(0 as bigint)), "
                    f"cast(__pos{d} % 64 as int)) & 1"
                )
                == 1
            )
            .drop(f"__pos{d}", f"__wi{d}", f"__w{d}")
        )
    return filtered.join(build, filtered[probe_key] == build[build_key])
