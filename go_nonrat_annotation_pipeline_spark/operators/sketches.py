"""Distributed cardinality / frequency sketches, deterministic across engines.

Spark ships approx_count_distinct (HLL++) and count_min_sketch, but their
binary sketch states are engine-internal: a DuckDB oracle can't reproduce
them bit-for-bit, so a correctness gate built on value hashes can't attest
them. These implementations rebuild the classic sketches from first
principles on top of the repo's cross-engine md5 hash (functions/
hashing.py): every register / counter / minimum is plain integer
arithmetic over `conv(substr(md5(x),1,15),16,10)`, which both engines
compute identically — the sketch STATE itself is the oracle-checked
output, and the float estimate (a deterministic function of that state)
is derived in tests.

Scale posture (the reason sketches exist at all):

- ``hll_registers``: one map-side projection + one 64-row groupBy — the
  shuffle carries at most m=2^p rows per upstream partition (map-side
  partial MAX), so a 100 TB scan reduces to a 64-row table. Mergeable:
  register-wise MAX across shards/days is the union sketch, so daily
  sketches roll up without rescanning history.
- ``kmv_minima``: bottom-k distinct hash values; TakeOrdered per
  partition (k rows each) then a k-row merge on the driver-side heap —
  no full shuffle. Union = merge + re-truncate; estimate (k-1)/max_kmv
  * 2^60 derived in tests.
- ``cms_counters``: depth*width integer counters via d independent md5
  salts; groupBy (depth, bucket) with map-side partial SUM means the
  shuffle is bounded by d*w rows per partition regardless of input
  size. Mergeable by counter-wise SUM. Point estimate = MIN over the d
  counters for the key, an upper bound with the standard (eps, delta)
  guarantee.

No reference counterpart (the reference pipeline has no approximate
operators); these extend SURVEY.md §2's analytics rows for the
training-data-pipeline surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# 60-bit cross-engine hash domain (15 hex chars of md5)
HASH_BITS = 60
HASH_MAX = 1 << HASH_BITS


def hash60(col: Column) -> Column:
    """First 60 bits of md5 as a non-negative BIGINT (codegen-friendly)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def sql_hash60(expr: str) -> str:
    """DuckDB mirror of :func:`hash60`."""
    return f"CAST('0x' || SUBSTR(MD5({expr}), 1, 15) AS BIGINT)"


# ---------------------------------------------------------------------------
# HyperLogLog registers
# ---------------------------------------------------------------------------
def hll_registers(df: DataFrame, key: Column, p: int = 6) -> DataFrame:
    """m=2^p HLL registers over ``key``: (register, max_rho).

    register = low p bits of the hash; rho = 1 + leading zeros of the
    remaining (60-p)-bit word = (60-p) - floor(log2(w)) computed exactly
    via the binary-string length of w (no floating point anywhere).
    Registers that no key maps to are absent from the output (the
    estimator treats them as rho=0); with m=64 and n >= a few hundred
    all registers are populated.
    """
    m = 1 << p
    h = hash60(key)
    # h // m via shiftright — exact integer arithmetic (a double-typed
    # division would lose bits: the hash occupies 60 bits, doubles 53)
    w = F.shiftright(h, p)
    # bit_length(w) via bin(): '0' has length 1 but means zero bits set
    rho = F.when(w == 0, F.lit(HASH_BITS - p + 1)).otherwise(
        F.lit(HASH_BITS - p + 1) - F.length(F.bin(w))
    )
    return (
        df.select((h % m).alias("register"), rho.alias("rho"))
        .groupBy("register")
        .agg(F.max("rho").alias("max_rho"))
    )


def sql_hll_registers(from_sql: str, key_expr: str, p: int = 6) -> str:
    """DuckDB oracle for :func:`hll_registers` (same arithmetic).

    Both engines' BIN() emit the minimal binary string ('101', '0'),
    so LENGTH(BIN(w)) is bit_length for w>0; the LTRIM makes w=0
    (BIN='0' → '' → 0) land on the same value as Spark's explicit
    w==0 branch, and the CASE keeps the intent readable anyway.
    """
    m = 1 << p
    h = sql_hash60(key_expr)
    return f"""
    WITH hashed AS (
      SELECT {h} AS h FROM {from_sql}
    ), mapped AS (
      SELECT h % {m} AS register,
             CASE WHEN h // {m} = 0 THEN {HASH_BITS - p + 1}
                  ELSE {HASH_BITS - p + 1} - LENGTH(LTRIM(BIN(h // {m}), '0'))
             END AS rho
      FROM hashed
    )
    SELECT register, MAX(rho) AS max_rho FROM mapped GROUP BY register
    """


def hll_estimate(registers: list[tuple[int, int]], p: int = 6) -> float:
    """Classic HLL estimate from (register, max_rho) rows (test helper;
    deliberately NOT part of any oracle-checked projection — floats)."""
    m = 1 << p
    rho = {r: x for r, x in registers}
    z = sum(2.0 ** -rho.get(i, 0) for i in range(m))
    alpha = 0.709 if m >= 128 else {16: 0.673, 32: 0.697, 64: 0.709}.get(m, 0.7213 / (1 + 1.079 / m))
    raw = alpha * m * m / z
    zeros = sum(1 for i in range(m) if rho.get(i, 0) == 0)
    if raw <= 2.5 * m and zeros:
        import math

        return m * math.log(m / zeros)
    return raw


# ---------------------------------------------------------------------------
# KMV (k minimum values) distinct sketch
# ---------------------------------------------------------------------------
def kmv_minima(df: DataFrame, key: Column, k: int = 32) -> DataFrame:
    """Bottom-k DISTINCT 60-bit hash values of ``key``: (rank, hval).

    orderBy().limit(k) compiles to TakeOrderedAndProject — each
    partition keeps a k-row heap, the driver merges k-row partials; no
    global sort, no full shuffle. The distinct() before it is the one
    real exchange and is what makes the sketch an unbiased DISTINCT
    estimator (duplicate keys must collapse before ranking).
    """
    hs = df.select(hash60(key).alias("hval")).distinct()
    ranked = hs.orderBy("hval").limit(k)
    w = Window.orderBy("hval")
    return ranked.select(F.row_number().over(w).alias("rank"), "hval")


def sql_kmv_minima(from_sql: str, key_expr: str, k: int = 32) -> str:
    h = sql_hash60(key_expr)
    return f"""
    WITH hs AS (SELECT DISTINCT {h} AS hval FROM {from_sql}),
    ranked AS (SELECT hval FROM hs ORDER BY hval LIMIT {k})
    SELECT CAST(ROW_NUMBER() OVER (ORDER BY hval) AS INT) AS rank, hval
    FROM ranked
    """


def kmv_estimate(hvals: list[int], k: int) -> float:
    """(k-1) / max_norm estimator (test helper, float-domain)."""
    if len(hvals) < k:
        return float(len(hvals))
    return (k - 1) / (max(hvals) / HASH_MAX)


# ---------------------------------------------------------------------------
# Count-min sketch point queries
# ---------------------------------------------------------------------------
def cms_point_estimates(
    df: DataFrame,
    key: Column,
    probes: DataFrame,
    probe_key: str,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Count-min estimates for each probe key: (key, est_count).

    Counter build: explode each row into ``depth`` (row, salt) copies,
    bucket = hash60(salt || key) % width, then ONE groupBy (d, bucket)
    COUNT with map-side partial aggregation — the shuffle is bounded by
    depth*width rows per upstream partition however large the input.
    Probe: the d*width counter table is tiny, so each probe key
    broadcast-joins its d buckets and takes MIN(count) — the classic CMS
    upper-bound estimate, integer-exact in both engines.
    """
    salts = F.array(*[F.lit(str(d)) for d in range(depth)])
    exploded = df.select(
        F.posexplode(salts).alias("d", "salt"), key.alias("k")
    ).select("d", (hash60(F.concat(F.col("salt"), F.lit("|"), F.col("k"))) % width).alias("bucket"))
    counters = exploded.groupBy("d", "bucket").agg(F.count("*").alias("cnt"))

    probe_buckets = probes.select(
        F.col(probe_key).alias("key"), F.posexplode(salts).alias("d", "salt")
    ).select(
        "key",
        "d",
        (hash60(F.concat(F.col("salt"), F.lit("|"), F.col("key"))) % width).alias("bucket"),
    )
    return (
        probe_buckets.join(F.broadcast(counters), ["d", "bucket"], "left")
        .groupBy("key")
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est_count"))
    )


def sql_cms_point_estimates(
    from_sql: str,
    key_expr: str,
    probes_sql: str,
    probe_key: str,
    depth: int = 4,
    width: int = 256,
) -> str:
    h = sql_hash60(f"CAST(d AS VARCHAR) || '|' || __k")
    return f"""
    WITH base AS (SELECT {key_expr} AS __k FROM {from_sql}),
    exploded AS (
      SELECT d, {h} % {width} AS bucket
      FROM base, UNNEST(GENERATE_SERIES(0, {depth - 1})) AS t(d)
    ),
    counters AS (
      SELECT d, bucket, COUNT(*) AS cnt FROM exploded GROUP BY d, bucket
    ),
    probe AS (
      SELECT {probe_key} AS __k FROM {probes_sql}
    ),
    probe_buckets AS (
      SELECT __k AS key, d, {h} % {width} AS bucket
      FROM probe, UNNEST(GENERATE_SERIES(0, {depth - 1})) AS t(d)
    )
    SELECT key, MIN(COALESCE(c.cnt, 0)) AS est_count
    FROM probe_buckets pb LEFT JOIN counters c USING (d, bucket)
    GROUP BY key
    """


# ---------------------------------------------------------------------------
# Fixed-bin histogram quantile sketch
# ---------------------------------------------------------------------------
def hist_bins(
    df: DataFrame, value: Column, lo: float, hi: float, n_bins: int = 64
) -> DataFrame:
    """Equal-width bin counts over ``value``: (bin, n) — the mergeable
    state behind distributed quantile estimation.

    bin = clamp(floor((x - lo) / width), 0, n_bins-1); out-of-range
    values land in the edge bins, NULLs are dropped. The division is
    ONE deterministic per-row double op feeding FLOOR (the
    functions/text scaled-integer discipline), so the integer state is
    bit-identical cross-engine.

    Scale posture: map-side partial counts reduce the shuffle to at
    most n_bins rows per upstream partition regardless of input size;
    sketches merge by bin-wise SUM (shards / days / tables roll up
    without rescanning). Rank error is bounded by the widest bin's
    mass — tighten by raising n_bins (state stays tiny) or recursing
    on the heavy bin. Spark's approx_percentile exists but its
    internal state, like the HLL/CMS built-ins, is not
    oracle-reproducible; this state is.
    """
    width = (hi - lo) / n_bins
    b = F.floor((value.cast("double") - F.lit(float(lo))) / F.lit(width))
    clamped = F.least(
        F.greatest(b, F.lit(0)), F.lit(n_bins - 1)
    ).cast("int")
    return (
        df.where(value.isNotNull())
        .select(clamped.alias("bin"))
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def sql_hist_bins(
    from_sql: str, value_expr: str, lo: float, hi: float, n_bins: int = 64
) -> str:
    """DuckDB mirror of :func:`hist_bins` (same clamp arithmetic)."""
    width = (hi - lo) / n_bins
    b = f"FLOOR((CAST({value_expr} AS DOUBLE) - ({lo!r})) / ({width!r}))"
    return f"""
    SELECT CAST(LEAST(GREATEST({b}, 0), {n_bins - 1}) AS INT) AS bin,
           COUNT(*) AS n
    FROM {from_sql}
    WHERE {value_expr} IS NOT NULL
    GROUP BY 1
    """


def hist_quantile(
    bins: list[tuple[int, int]], q: float, lo: float, hi: float, n_bins: int
) -> float:
    """Estimate the q-quantile from (bin, n) state: linear interpolation
    inside the bin containing the target rank (test helper, float
    domain — deliberately not part of any oracle-checked projection)."""
    width = (hi - lo) / n_bins
    counts = dict(bins)
    total = sum(counts.values())
    target = q * total
    acc = 0
    for b in range(n_bins):
        n = counts.get(b, 0)
        if acc + n >= target and n > 0:
            frac = (target - acc) / n
            return lo + (b + frac) * width
        acc += n
    return hi
