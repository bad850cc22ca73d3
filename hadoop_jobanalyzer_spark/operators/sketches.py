"""Distributed cardinality sketches: HyperLogLog register tables and
KMV (k-minimum-values) distinct-count estimates.

Both sketches are built from the repo's portable 60-bit md5 hash (the
same ``conv(substr(md5(x),1,15),16,10)`` idiom the sampling/shard
operators use), so any engine — Spark, DuckDB, Trino — derives identical
registers from the same rows and the outputs are bit-exact oracle-able.

Scale: the whole point of these sketches is what they DON'T shuffle.
The HLL register table reduces an arbitrarily large key column to
``m`` rows per group via a partial-aggregated max — map-side combine
collapses each input partition to at most ``groups x m`` rows before the
exchange. KMV's rank filter is rewritten by Spark's WindowGroupLimit
optimization into a per-partition top-k, so only ~k rows per partition
per group reach the shuffle. Merging two register tables (e.g. daily
sketches into a monthly one) is the same ``max``/``min-k`` aggregate —
associative, re-aggregable, no raw-data reread.

Flink's and Trino's approx_distinct follow the same register layout
(public: Flajolet et al., "HyperLogLog: the analysis of a near-optimal
cardinality estimation algorithm", AofA 2007; Bar-Yossef et al. 2002 for
KMV). This implementation keeps the registers *exact and inspectable*
instead of hiding them in an opaque binary sketch, which is what makes
the estimator auditable by the differential oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

#: Total hash space: 15 md5 hex chars = 60 bits.
HASH_BITS = 60
HASH_SPACE = 1 << HASH_BITS


def portable_hash60(key: Column) -> Column:
    """60-bit uniform hash from md5 — identical in any engine as
    ``('0x' || substr(md5(CAST(k AS VARCHAR)),1,15))::BIGINT``."""
    return F.conv(F.substring(F.md5(key.cast("string")), 1, 15), 16, 10).cast("long")


def hll_register_table(
    df: DataFrame, group_col: str, key_col: str, p: int = 6
) -> DataFrame:
    """Per-group HyperLogLog register table: (group, register, max_rho).

    ``register`` is the low ``p`` bits of the 60-bit hash; ``rho`` is the
    1-based position of the leftmost 1-bit in the remaining ``60 - p``
    bits (``60 - p + 1`` when they are all zero). Registers never touched
    by any key are absent from the relation (sparse form) — the estimator
    treats missing registers as zero.

    One partial-aggregated ``max`` pass: at 100 TB each input partition
    emits at most ``n_groups * 2^p`` rows into the single exchange.
    """
    m = 1 << p
    w_bits = HASH_BITS - p
    h = portable_hash60(F.col(key_col))
    # h >> p: the upper 60-p bits. Bit shift, not `/` — a 60-bit value
    # through double division would lose low bits past 2^53.
    w = F.shiftright(h, p)
    rho = F.when(w > 0, F.lit(w_bits + 1) - F.length(F.bin(w))).otherwise(
        F.lit(w_bits + 1)
    )
    return (
        df.select(
            F.col(group_col).alias("grp"),
            (h % m).alias("register"),
            rho.cast("int").alias("rho"),
        )
        .groupBy("grp", "register")
        .agg(F.max("rho").alias("max_rho"))
    )


def hll_estimate(registers: DataFrame, p: int = 6) -> DataFrame:
    """Collapse a (grp, register, max_rho) table to per-group cardinality
    estimates: the raw HLL harmonic mean ``alpha_m * m^2 / sum(2^-M_j)``
    with the standard small-range (linear counting) correction.

    Float math happens once per *group* (m is tiny), after all cross-row
    accumulation — acceptable driver-of-truth is the register table
    itself, which stays integer-exact.
    """
    m = 1 << p
    alpha = 0.7213 / (1 + 1.079 / m) if m >= 128 else {16: 0.673, 32: 0.697, 64: 0.709}.get(m, 0.7213 / (1 + 1.079 / m))
    agg = registers.groupBy("grp").agg(
        F.sum(F.pow(F.lit(2.0), -F.col("max_rho"))).alias("_sum_inv"),
        F.count("*").alias("_n_nonzero"),
    )
    n_zero = F.lit(m) - F.col("_n_nonzero")
    raw = F.lit(alpha * m * m) / (F.col("_sum_inv") + n_zero)
    linear = F.lit(float(m)) * F.log(F.lit(float(m)) / n_zero)
    est = F.when((raw <= 2.5 * m) & (n_zero > 0), linear).otherwise(raw)
    return agg.select("grp", est.alias("estimate"))


def kmv_distinct(
    df: DataFrame, group_col: str, key_col: str, k: int = 32
) -> DataFrame:
    """K-minimum-values distinct-count sketch per group.

    Keeps the ``k`` smallest distinct hash values per group; the k-th
    smallest ``h_k`` estimates cardinality as ``(k-1) * SPACE / h_k``
    (Bar-Yossef et al. 2002). Output: (grp, kth_min_hash, est_distinct) —
    est is exact integer division, so it is engine-portable.

    Plan shape: distinct on (grp, hash) — one shuffle that any exact
    distinct also pays — then a rank-filter window that Spark's
    WindowGroupLimit rewrites into per-partition top-k, so only ~k rows
    per partition survive to the final per-group sort.

    Determinism of ``est_distinct``: ``(k-1) * 2^60`` has a 5-bit
    significand, so its double form is EXACT, and the single IEEE
    division by ``h_k`` is correctly rounded — any engine computing
    ``CAST((k-1) * 2^60 AS DOUBLE) / h`` produces the identical bits.
    No cross-row float accumulation anywhere.
    """
    h = portable_hash60(F.col(key_col))
    hashed = df.select(F.col(group_col).alias("grp"), h.alias("h")).distinct()
    w = Window.partitionBy("grp").orderBy("h")
    ranked = hashed.withColumn("_rk", F.row_number().over(w))
    numer = float((k - 1) * HASH_SPACE)  # exact: 5 significand bits
    return (
        ranked.filter(F.col("_rk") == k)
        .select(
            "grp",
            F.col("h").alias("kth_min_hash"),
            (F.lit(numer) / F.col("h").cast("double")).alias("est_distinct"),
        )
    )


def _hash_mod(key: Column, salt: int, mod: int) -> Column:
    """Salted portable bucket: md5('<salt>:' || key) folded to [0, mod)."""
    return (
        F.conv(
            F.substring(F.md5(F.concat_ws(":", F.lit(str(salt)), key.cast("string"))), 1, 15),
            16,
            10,
        ).cast("long")
        % mod
    )


def cms_table(
    df: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 64,
    pre_aggregate: bool = True,
) -> DataFrame:
    """Count-Min sketch as an exact, inspectable relation: ``depth``
    independent salted hash rows x ``width`` counters, each counter the
    EXACT count of keys hashing into it (Cormode & Muthukrishnan 2005).
    Output: (row, bucket, cnt).

    With ``pre_aggregate=True`` (default) hashing runs over the
    DISTINCT-key count table, not the raw rows: the per-key count is a
    partial-aggregated groupBy (map-side collapse), so the depth salted
    md5s are paid |keys| times instead of |rows| times — the win when
    key multiplicity ≫ 1 (e.g. l_partkey on lineitem, ~30 rows/key).
    The trade is one extra exchange keyed on the raw key, whose volume
    is the per-partition distinct-key count — when keys are NEAR-UNIQUE
    (the heavy-tail regime CMS exists for) that shuffle approaches
    |rows| and is skew-prone, while the hash saving vanishes: pass
    ``pre_aggregate=False`` there to hash raw rows directly, keeping
    the single (row, bucket) exchange whose map-side partials carry at
    most depth*width rows per partition. Counters re-aggregate by
    summing weights either way, and two sketches merge by summing
    counters (the same re-aggregation contract as the HLL register
    table). Point estimates (``cms_estimate``) take the min across rows
    and can only OVER-estimate — the one-sided error that makes CMS
    safe for heavy-hitter screening at stream scale.
    """
    per_key = (
        df.select(F.col(key_col).alias("_k"))
        .groupBy("_k")
        .agg(F.count("*").alias("_n"))
        if pre_aggregate
        else df.select(F.col(key_col).alias("_k"), F.lit(1).alias("_n"))
    )
    rows = F.explode(F.array(*[F.lit(r) for r in range(depth)])).alias("row")
    keyed = per_key.select("_k", "_n", rows)
    bucket = F.when(F.col("row") == 0, _hash_mod(F.col("_k"), 0, width))
    for r in range(1, depth):
        bucket = bucket.when(F.col("row") == r, _hash_mod(F.col("_k"), r, width))
    return (
        keyed.select("row", bucket.alias("bucket"), "_n")
        .groupBy("row", "bucket")
        .agg(F.sum("_n").alias("cnt"))
    )


def cms_estimate(
    cms: DataFrame, probes: DataFrame, key_col: str, depth: int = 4, width: int = 64
) -> DataFrame:
    """Point-frequency estimates for a probe key set against a CMS
    relation: per key, min over rows of its counter — never an
    underestimate. The probe set joins the depth*width-row sketch
    (broadcast-sized by construction)."""
    rows = F.explode(F.array(*[F.lit(r) for r in range(depth)])).alias("row")
    keyed = probes.select(F.col(key_col).alias("key")).distinct().select("key", rows)
    bucket = F.when(F.col("row") == 0, _hash_mod(F.col("key"), 0, width))
    for r in range(1, depth):
        bucket = bucket.when(F.col("row") == r, _hash_mod(F.col("key"), r, width))
    probed = keyed.select("key", "row", bucket.alias("bucket"))
    return (
        probed.join(F.broadcast(cms), ["row", "bucket"], "left")
        .groupBy("key")
        .agg(F.min(F.coalesce("cnt", F.lit(0))).alias("est_count"))
    )


def bloom_bits(df: DataFrame, key_col: str, m: int = 4096, k: int = 3) -> DataFrame:
    """Bloom filter as a relation: the distinct set bit positions for the
    key set under ``k`` salted hashes (Bloom 1970). Output: (bit).

    At most ``min(k * n_keys, m)`` rows — for a build side of any size
    the bit relation is bounded by ``m``, which is what makes it a
    broadcastable semi-join reducer: a fact scan keeps only rows whose
    k bits are ALL set (``bloom_prune``), guaranteed no false negatives,
    before paying the real join's shuffle. Spark's own runtime bloom
    filters do this inside AQE; the explicit relation form is
    engine-portable and oracle-able.
    """
    bits = F.array(*[_hash_mod(F.col(key_col), r, m) for r in range(k)])
    return (
        df.select(F.explode(bits).alias("bit"))
        .distinct()
    )


def bloom_prune(
    fact: DataFrame, key_col: str, bits: DataFrame, m: int = 4096, k: int = 3
) -> DataFrame:
    """Keep fact rows whose key passes the bloom membership test (all k
    bits set) — a superset of the true matches (no false negatives), so
    ``bloom_prune(fact) ⋈ dim == fact ⋈ dim`` always. The bit relation
    broadcasts; the test is k semi-join probes folded into one in-row
    check against a collected bit set when tiny, or k left-semi joins in
    the general plan below."""
    probe = fact
    for r in range(k):
        probe = probe.join(
            F.broadcast(bits.select(F.col("bit").alias(f"_b{r}"))),
            _hash_mod(F.col(key_col), r, m) == F.col(f"_b{r}"),
            "left_semi",
        )
    return probe
