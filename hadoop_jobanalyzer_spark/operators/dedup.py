"""Deduplication operators for large text corpora.

Four strategies, cheapest to richest, all shuffle-efficient at scale:

* exact:      one md5 per doc, groupBy(hash) — a single shuffle on a short
              key; at 100 TB this is the same plan, AQE-coalesced.
* bag-of-words fingerprint: order-insensitive exact dedup.
* MinHash+LSH: signatures via explode -> one md5 per shingle -> an integer
              universal-hash family -> partial-agg min per doc (everything
              after the single md5 is whole-stage-codegen integer math);
              banded buckets generate candidate pairs in-bucket — signatures
              are computed once and no corpus-sized self-join exists.
* n-gram Jaccard: exact verification on pairs sharing a shingle, via the
              same bucket-grouped pair generation.

Performance note: per-element work deliberately avoids higher-order
functions (transform/aggregate lambdas are interpreted per element, outside
whole-stage codegen); explode + hash-agg keeps the hot path in codegen and
the aggregation map-side partial, which is the shape that survives 100 TB.

Reference parity note: the reference's only dedup is distinct-attempt
counting (SURVEY.md O3); this module is the §7 "milestone 5" extension
layer for training-data pipelines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.window import Window

from hadoop_jobanalyzer_spark.functions.text import shingles, tokens
from hadoop_jobanalyzer_spark.util import (
    materialize,
    materialize_eager,
    pair_structs as _pair_structs,
)
from hadoop_jobanalyzer_spark.util import spread

# Universal-hash family over md5-derived 32-bit shingle hashes:
# mh_i(s) = (A_i * (h(s) % P) + B_i) % P, P = 2^31 - 1 (Mersenne prime).
# h < 2^32, A_i < 2^23  =>  A_i * (h % P) < 2^54: no 64-bit overflow, so the
# arithmetic is exact and reproducible in any engine (DuckDB oracle included).
MINHASH_P = 2_147_483_647


def _minhash_params(n_hashes: int) -> list[tuple[int, int]]:
    return [(999_983 * (i + 1), 756_839 * (i + 1) + 12_345) for i in range(n_hashes)]


def _md5_hash32(col: Column) -> Column:
    """First 8 md5 hex digits as a 64-bit-safe integer (engine-portable —
    never Spark-native hash functions, which DuckDB cannot reproduce)."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


def exact_duplicates(df: DataFrame, id_col: str, text_col: str, key: Column | None = None) -> DataFrame:
    """Per doc: content hash + keeper flag (keeper = min id in its group).

    ``key`` defaults to md5(text); pass e.g. ``bow_fingerprint(tokens(col))``
    for order-insensitive dedup.
    """
    key = F.md5(F.col(text_col)) if key is None else key
    w = Window.partitionBy("text_hash")
    return (
        df.select(F.col(id_col), key.alias("text_hash"))
        .withColumn("is_keeper", F.col(id_col) == F.min(id_col).over(w))
        .orderBy(id_col)
    )


def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_hashes: int = 8,
    ngram: int = 3,
) -> DataFrame:
    """Per doc, ``n_hashes`` MinHash values (columns mh0..mhN-1).

    Shingles are exploded once, each gets ONE md5 (the only non-integer op);
    the hash family is integer math in codegen, and the per-doc mins are a
    partial-aggregating groupBy — one shuffle of (doc, n_hashes x long).
    Docs with no shingles (< ngram tokens) keep a row of null signatures.
    """
    exploded = spread(df).select(
        F.col(id_col), F.explode_outer(shingles(tokens(text_col), ngram)).alias("_sh")
    ).select(F.col(id_col), (_md5_hash32(F.col("_sh")) % MINHASH_P).alias("_h"))
    aggs = [
        F.min((F.lit(a) * F.col("_h") + F.lit(b)) % MINHASH_P).alias(f"mh{i}")
        for i, (a, b) in enumerate(_minhash_params(n_hashes))
    ]
    return exploded.groupBy(id_col).agg(*aggs)


def lsh_candidate_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_hashes: int = 8,
    bands: int = 4,
    ngram: int = 3,
    max_bucket: int | None = 1000,
    sigs: DataFrame | None = None,
) -> DataFrame:
    """MinHash-LSH candidate pairs: docs agreeing on at least one band.

    Bands group ``rows = n_hashes/bands`` consecutive minhashes into one
    key; docs are bucketed by (band, key) and pairs are generated *within*
    buckets — signatures are computed exactly once (no self-join recompute)
    and non-colliding pairs are never materialized. ``max_bucket`` drops
    degenerate giant buckets (near-identical clusters better handled by the
    exact-dedup path) to bound the O(|bucket|^2) fan-out at corpus scale;
    ON by default (1000), pass ``None`` to opt out.
    ``sigs`` accepts a precomputed (ideally persisted) signature table so
    multi-consumer reports don't re-execute the corpus-sized signature
    subtree (Spark recomputes unpersisted subtrees per consumer).
    Output: id_a < id_b, n_shared_bands.
    """
    rows = n_hashes // bands
    if sigs is None:
        sigs = minhash_signatures(df, id_col, text_col, n_hashes, ngram)
    sigs = sigs.na.drop()
    band_cols = [
        F.struct(
            F.lit(b).alias("band"),
            F.concat_ws("|", *[F.col(f"mh{b * rows + r}") for r in range(rows)]).alias("bh"),
        )
        for b in range(bands)
    ]
    buckets = (
        sigs.select(F.col(id_col), F.explode(F.array(*band_cols)).alias("bb"))
        .groupBy("bb")
        .agg(F.sort_array(F.collect_list(id_col)).alias("_ids"))
        .filter(F.size("_ids") > 1)
    )
    if max_bucket is not None:
        buckets = buckets.filter(F.size("_ids") <= max_bucket)
    return (
        buckets.select(F.explode(_pair_structs(F.col("_ids"))).alias("p"))
        .groupBy(F.col("p.id_a").alias("id_a"), F.col("p.id_b").alias("id_b"))
        .agg(F.count("*").alias("n_shared_bands"))
        .orderBy("id_a", "id_b")
    )


def near_dup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_hashes: int = 8,
    bands: int = 4,
    ngram: int = 3,
    threshold: float = 0.2,
    max_bucket: int | None = 1000,
    sigs: DataFrame | None = None,
) -> DataFrame:
    """The production dedup pipeline: MinHash-LSH candidate generation,
    then exact n-gram Jaccard verification on candidates only.

    This is the composition that scales: LSH bounds the candidate set to
    band collisions (O(near-dups), not O(pairs-sharing-any-shingle)), and
    the exact verification joins shingles against *candidate pairs* — at
    corpus scale the verify stage touches a vanishing fraction of the
    inverted index that :func:`ngram_jaccard_pairs` (the ground-truth
    all-pairs form) must expand. ``sigs`` passes a precomputed signature
    table through to :func:`lsh_candidate_pairs`.
    Output: id_a < id_b, n_shared_bands, n_common, n_a, n_b, jaccard.
    """
    cands = lsh_candidate_pairs(
        df, id_col, text_col, n_hashes, bands, ngram, max_bucket, sigs=sigs
    )
    df = spread(df)
    # One per-doc shingle-SET table; candidates pull both docs' sets and the
    # exact intersection is computed IN-ROW (shingles() is distinct per doc,
    # so |array_intersect| is the exact n_common).  This replaces the old
    # explode->equi-join->groupBy verify (pairs x shingles intermediate rows,
    # plus two more corpus-wide size-subtree recomputes for n_a/n_b): the
    # shingle subtree now runs once per join side as a narrow pass, the pair
    # shuffle carries pair volume only, and n_a/n_b fall out of the same
    # arrays for free. Both set-pull joins are pinned shuffle-hash with
    # the PAIR side as the build: the candidate relation scales with the
    # corpus and rides a fanout-blind explode-lineage estimate, so an
    # unhinted plan can broadcast it — the q235 x100 abort class (r10
    # audit, flagged via q109). The corpus-wide doc_sets stream is only
    # probed, never built or broadcast.
    doc_sets = df.select(
        F.col(id_col), shingles(tokens(text_col), ngram).alias("_shs")
    )
    return (
        cands.hint("shuffle_hash")
        .join(
            doc_sets.select(F.col(id_col).alias("id_a"), F.col("_shs").alias("_sa")),
            "id_a",
        )
        .hint("shuffle_hash")
        .join(
            doc_sets.select(F.col(id_col).alias("id_b"), F.col("_shs").alias("_sb")),
            "id_b",
        )
        .select(
            "id_a",
            "id_b",
            "n_shared_bands",
            F.size(F.array_intersect("_sa", "_sb")).alias("n_common"),
            F.size("_sa").alias("n_a"),
            F.size("_sb").alias("n_b"),
        )
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_common") / (F.col("n_a") + F.col("n_b") - F.col("n_common")), 3
            ),
        )
        .filter((F.col("n_common") > 0) & (F.col("jaccard") >= threshold))
        .select("id_a", "id_b", "n_shared_bands", "n_common", "n_a", "n_b", "jaccard")
        .orderBy("id_a", "id_b")
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    ngram: int = 3,
    threshold: float = 0.2,
    max_bucket: int | None = 1000,
) -> DataFrame:
    """Exact n-gram Jaccard over pairs sharing >= 1 shingle.

    Shingle inverted index (explode once) -> bucket per shingle -> in-bucket
    pair generation -> per-pair intersection count; per-doc distinct-shingle
    counts stay in-row (size of the shingle array — no second explode).
    Ultra-common shingles are the scale risk (O(df^2) pair fan-out):
    ``max_bucket`` drops stop-shingles whose posting list exceeds the cap
    (ON by default, 1000; ``None`` opts out). A dropped stop-shingle can
    lower a pair's intersection count, so the capped form is a *lower
    bound* on Jaccard for pairs touching such shingles — the production
    path is LSH-first (``near_dup_pairs``) anyway.
    Output: id_a < id_b, n_common, n_a, n_b, jaccard (rounded 3).
    """
    df = spread(df)
    sh = df.select(
        F.col(id_col), F.explode(shingles(tokens(text_col), ngram)).alias("sh")
    )
    sizes = df.select(
        F.col(id_col), F.size(shingles(tokens(text_col), ngram)).alias("n_sh")
    )
    posting = (
        sh.groupBy("sh")
        .agg(F.sort_array(F.collect_list(id_col)).alias("_ids"))
        .filter(F.size("_ids") > 1)
    )
    if max_bucket is not None:
        posting = posting.filter(F.size("_ids") <= max_bucket)
    common = (
        posting.select(F.explode(_pair_structs(F.col("_ids"))).alias("p"))
        .groupBy(F.col("p.id_a").alias("id_a"), F.col("p.id_b").alias("id_b"))
        .agg(F.count("*").alias("n_common"))
    )
    sizes_a = sizes.select(F.col(id_col).alias("id_a"), F.col("n_sh").alias("n_a"))
    sizes_b = sizes.select(F.col(id_col).alias("id_b"), F.col("n_sh").alias("n_b"))
    return (
        # sizes is corpus-sized (one row per doc) — no forced broadcast;
        # AQE picks broadcast when the filtered side is actually small.
        common.join(sizes_a, "id_a")
        .join(sizes_b, "id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_common") / (F.col("n_a") + F.col("n_b") - F.col("n_common")), 3
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "n_common", "n_a", "n_b", "jaccard")
        .orderBy("id_a", "id_b")
    )


def minhash_est_vs_exact(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_hashes: int = 8,
    bands: int = 4,
    ngram: int = 3,
    max_bucket: int | None = 1000,
) -> DataFrame:
    """Estimator-quality report: per LSH candidate pair, the MinHash
    Jaccard estimate (fraction of agreeing signature positions) next to
    the exact n-gram Jaccard.

    This is the knob-tuning query for the dedup pipeline: it quantifies,
    on live data, how far b bands x r rows of signature drift from truth —
    the input for choosing n_hashes/bands at corpus scale. The signature
    table is computed ONCE and persisted for the report's three consumers
    (the LSH buckets and the sa/sb estimate joins) — without it, Spark
    re-executes the corpus-sized explode->md5->min-agg subtree per
    consumer, which at 100 TB is two extra full corpus passes.
    Output: id_a < id_b, est_jaccard, jaccard, abs_err.
    """
    sigs = minhash_signatures(df, id_col, text_col, n_hashes, ngram).transform(materialize)
    pairs = near_dup_pairs(
        df, id_col, text_col, n_hashes, bands, ngram,
        threshold=0.0, max_bucket=max_bucket, sigs=sigs,
    )
    sa = sigs.select(
        F.col(id_col).alias("id_a"), *[F.col(f"mh{i}").alias(f"_a{i}") for i in range(n_hashes)]
    )
    sb = sigs.select(
        F.col(id_col).alias("id_b"), *[F.col(f"mh{i}").alias(f"_b{i}") for i in range(n_hashes)]
    )
    agree = sum(
        (F.col(f"_a{i}") == F.col(f"_b{i}")).cast("int") for i in range(n_hashes)
    )
    return (
        # pinned shuffle-hash with the narrow signature tables as builds:
        # both sides are corpus-scaled and the materialized signatures
        # carry a copied fanout-blind estimate (q235 class, r10 audit)
        pairs.join(sa.hint("shuffle_hash"), "id_a")
        .join(sb.hint("shuffle_hash"), "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(agree / F.lit(n_hashes), 3).alias("est_jaccard"),
            "jaccard",
            F.round(F.abs(agree / F.lit(n_hashes) - F.col("jaccard")), 3).alias("abs_err"),
        )
        .orderBy("id_a", "id_b")
    )


def simhash_near_dup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    bands: int = 4,
    max_hamming: int = 3,
    max_bucket: int | None = 1000,
) -> DataFrame:
    """SimHash near-dup pairs: banded blocking + Hamming-distance verify.

    The 32-bit SimHash (:func:`~hadoop_jobanalyzer_spark.functions.text.
    simhash_table`, one codegen pass) splits into ``bands`` bit-slices; docs
    are bucketed by (band, slice value) and pairs generated in-bucket, then
    verified with ``bit_count(xor)``. By pigeonhole the blocking is EXACT
    for ``max_hamming <= bands - 1``: a pair differing in at most
    ``bands - 1`` bits must agree on at least one full band, so no
    qualifying pair is missed (the default 4 bands / Hamming <= 3 keeps
    that guarantee). ``max_bucket`` bounds the O(|bucket|^2) fan-out of
    degenerate slices (ON by default, ``None`` opts out) — same contract
    as :func:`lsh_candidate_pairs`.

    One shuffle for the fingerprint, one for the bucket groupBy, one
    bucket-key pair reduction — never a corpus-sized self-join. The
    fingerprint rides the bucket rows (one extra long per row), so the
    Hamming verify is a codegen filter *before* the pair-reduction shuffle
    instead of two join-backs that would re-derive the fingerprint table.
    Output: id_a < id_b, n_shared_bands, hamming.
    """
    from hadoop_jobanalyzer_spark.functions.text import simhash_table

    if 32 % bands != 0:
        raise ValueError(f"bands must divide 32, got {bands}")
    width = 32 // bands
    mask = (1 << width) - 1
    sh = simhash_table(df, id_col, text_col)
    band_cols = [
        F.struct(
            F.lit(b).alias("band"),
            F.shiftright(F.col("simhash"), b * width).bitwiseAND(F.lit(mask)).alias("bh"),
        )
        for b in range(bands)
    ]
    buckets = (
        sh.select(
            F.struct(F.col(id_col).alias("id"), F.col("simhash").alias("sh")).alias("_doc"),
            F.explode(F.array(*band_cols)).alias("bb"),
        )
        # sort_array on an array<struct> orders by the first field (id), so
        # pair generation below emits id_a < id_b
        .groupBy("bb")
        .agg(F.sort_array(F.collect_list("_doc")).alias("_docs"))
        .filter(F.size("_docs") > 1)
    )
    if max_bucket is not None:
        buckets = buckets.filter(F.size("_docs") <= max_bucket)
    docs = F.col("_docs")
    pairs = F.flatten(
        F.transform(
            docs,
            lambda x, i: F.transform(
                F.slice(docs, i + F.lit(2), F.size(docs)),
                lambda y: F.struct(
                    x["id"].alias("id_a"),
                    y["id"].alias("id_b"),
                    x["sh"].alias("sha"),
                    y["sh"].alias("shb"),
                ),
            ),
        )
    )
    return (
        buckets.select(F.explode(pairs).alias("p"))
        .select(
            F.col("p.id_a").alias("id_a"),
            F.col("p.id_b").alias("id_b"),
            F.bit_count(F.col("p.sha").bitwiseXOR(F.col("p.shb"))).cast("long").alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .groupBy("id_a", "id_b", "hamming")
        .agg(F.count("*").alias("n_shared_bands"))
        .select("id_a", "id_b", "n_shared_bands", "hamming")
        .orderBy("id_a", "id_b")
    )


# Max distinct (band, bh) keys a batch may touch before the incremental
# path stops collecting them for scan pushdown. The touched set is already
# broadcast (same driver-size class), so the cap guards the isin literal
# list, not a new cost class; past it the broadcast semi-join alone filters
# the store (correct either way — the pushdown is a pruning accelerant).
TOUCHED_PUSHDOWN_CAP = 100_000


def band_key(band: Column | str, bh: Column | str) -> Column:
    """The single-column bucket key ``"<band>:<bh>"`` a persisted band
    store is bucketed and sorted by. One column (not the (band, bh) pair)
    because Spark prunes bucket files only for predicates on a SINGLE
    bucket column, and the same string is what the incremental join pushes
    down as an ``isin`` filter (`lsh_candidate_pairs_incremental`)."""
    return F.concat_ws(":", F.col(band) if isinstance(band, str) else band,
                       F.col(bh) if isinstance(bh, str) else bh)


def banded_signatures(
    sigs: DataFrame, id_col: str, n_hashes: int = 8, bands: int = 4
) -> DataFrame:
    """Explode a wide MinHash signature table (mh0..mhN-1) into the banded
    store layout: one row per (doc, band) with the band hash ``bh`` and the
    persisted bucket key ``bkey`` (`band_key`).

    This is the ON-DISK shape of the incremental-dedup signature store:
    persisting bands (instead of re-exploding the wide table every batch)
    removes the per-batch corpus-wide Generate + concat work, and writing
    it bucketed+sorted by ``bkey`` lets a batch's touched-bucket filter
    prune bucket files and row groups at the scan — the store read becomes
    O(touched buckets), not O(corpus) (`plans/snapshot.py` publishes it,
    `streaming/corpus_ingest.py` consumes it per micro-batch).
    """
    rows = n_hashes // bands
    band_cols = [
        F.struct(
            F.lit(b).alias("band"),
            F.concat_ws(
                "|", *[F.col(f"mh{b * rows + r}") for r in range(rows)]
            ).alias("bh"),
        )
        for b in range(bands)
    ]
    return (
        sigs.na.drop()
        .select(F.col(id_col), F.explode(F.array(*band_cols)).alias("bb"))
        .select(id_col, "bb.band", "bb.bh", band_key("bb.band", "bb.bh").alias("bkey"))
    )


def lsh_candidate_pairs_incremental(
    new_df: DataFrame,
    id_col: str,
    text_col: str,
    stored_sigs: DataFrame | None,
    n_hashes: int = 8,
    bands: int = 4,
    max_bucket: int | None = 1000,
    ngram: int = 3,
    stored_bands: DataFrame | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Incremental ingest dedup: candidates for a NEW batch against an
    existing corpus whose MinHash signatures are already persisted.

    Signatures are computed for the new batch only; band buckets join the
    new batch's bands against (stored + new) bands, so the output covers
    new x old and new x new pairs — never old x old (already deduped) and
    never a corpus-wide recompute. This is the shape that makes dedup
    sustainable at ingest time: per batch, cost is O(batch) signature work
    plus a bucket-key join against the store.

    ``stored_bands`` (preferred at scale) supplies the store PRE-BANDED in
    the `banded_signatures` layout; ``stored_sigs`` is then ignored and may
    be None. Two O(corpus) per-batch costs disappear: the store-side
    explode/concat recompute, and — when the frame carries the persisted
    ``bkey`` column — the full store scan itself: the batch's touched
    bucket keys (batch-scaled by the ingest contract, capped at
    ``TOUCHED_PUSHDOWN_CAP``) are pushed down as a ``bkey`` isin filter,
    which prunes bucket files (single bucket column) and row groups
    (bkey-sorted buckets) before any row reaches the join. The broadcast
    touched semi-join stays in place behind it, so the pruned and unpruned
    paths compute identical candidates.

    Returns (candidate_pairs, new_sigs); append ``new_sigs`` to the store
    after processing so the next batch sees this one.
    Output pairs: id_a < id_b, n_shared_bands.
    """
    if stored_sigs is None and stored_bands is None:
        raise ValueError("one of stored_sigs / stored_bands is required")
    rows = n_hashes // bands
    new_sigs = minhash_signatures(new_df, id_col, text_col, n_hashes, ngram).na.drop()

    def banded(sigs: DataFrame, tag: str) -> DataFrame:
        band_cols = [
            F.struct(
                F.lit(b).alias("band"),
                F.concat_ws(
                    "|", *[F.col(f"mh{b * rows + r}") for r in range(rows)]
                ).alias("bh"),
            )
            for b in range(bands)
        ]
        return sigs.select(
            F.col(id_col), F.explode(F.array(*band_cols)).alias("bb")
        ).select(id_col, "bb.band", "bb.bh", F.lit(tag).alias("_src"))

    # both band relations are referenced by multiple plan branches (the
    # bucket-size cap reads all_bands twice; the probe join reads
    # new_bands again) — persist the narrow (id, band, bh) rows so the
    # signature explode/md5/min-agg subtree runs ONCE per side, not once
    # per branch (the q66-class recompute fix).
    #
    # The store is pre-filtered to buckets the NEW batch touches (a
    # batch-scaled broadcast semi-join — the ingest-contract bound, same
    # as incremental CC's touched set): untouched buckets can produce no
    # pair, so the bucket-size cap and the probe join then run over
    # O(touched) rows instead of O(corpus) — and the cap's bucket-size
    # aggregate (corpus-scaled before r10) can no longer be picked as a
    # runtime broadcast off its fanout-blind explode-lineage estimate.
    # The remaining cap/probe joins are pinned shuffle-hash (both sides
    # touched-scaled; the q235 doctrine — pin, don't estimate). With a
    # wide ``stored_sigs`` store one full SCAN + explode per batch
    # remains; the ``stored_bands`` path (bkey-bucketed store + touched
    # isin pushdown) removes even that — see docstring.
    new_bands = banded(new_sigs, "new").transform(materialize)
    touched = new_bands.select("band", "bh").distinct()
    pruned_scan = False
    if stored_bands is not None:
        old_bands = stored_bands
        if "bkey" in old_bands.columns:
            keys = [
                r["k"]
                for r in touched.select(band_key("band", "bh").alias("k"))
                .limit(TOUCHED_PUSHDOWN_CAP + 1)
                .collect()
            ]
            if len(keys) <= TOUCHED_PUSHDOWN_CAP:
                old_bands = old_bands.filter(F.col("bkey").isin(keys))
                pruned_scan = True
        old_bands = old_bands.select(
            F.col(id_col), "band", "bh", F.lit("old").alias("_src")
        )
    else:
        old_bands = banded(stored_sigs.na.drop(), "old")
    all_bands = (
        old_bands
        .unionByName(new_bands)
        .join(F.broadcast(touched), ["band", "bh"], "left_semi")
    )
    if pruned_scan:
        # bucket-FILE pruning on the bkey isin only happens on a bucketed
        # scan, and DisableUnnecessaryBucketedScan turns that off here
        # (the downstream joins key on (band, bh), so bkey bucketing is
        # "uninteresting" to the planner — measured: Bucketed: false,
        # no SelectedBucketsCount). Pin the scan bucketed and evaluate
        # EAGERLY inside the conf window (sinks.py's guard pattern;
        # lazy materialize would execute after the conf is restored).
        sess = new_df.sparkSession
        conf_key = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
        prior = sess.conf.get(conf_key)
        sess.conf.set(conf_key, "false")
        try:
            all_bands = all_bands.transform(materialize_eager)
        finally:
            sess.conf.set(conf_key, prior)
    else:
        all_bands = all_bands.transform(materialize)
    if max_bucket is not None:
        sized = all_bands.groupBy("band", "bh").agg(F.count("*").alias("_bsz"))
        all_bands = all_bands.join(
            sized.filter(F.col("_bsz") <= max_bucket)
            .select("band", "bh")
            .hint("shuffle_hash"),
            ["band", "bh"],
            "left_semi",
        )
    j = new_bands.select(
        F.col(id_col).alias("_nid"), "band", "bh"
    ).hint("shuffle_hash").join(all_bands, ["band", "bh"])
    pairs = (
        j.filter(F.col("_nid") != F.col(id_col))
        .select(
            F.least("_nid", id_col).alias("id_a"),
            F.greatest("_nid", id_col).alias("id_b"),
            "band",
        )
        .distinct()  # new x new pairs appear from both sides' probes
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("n_shared_bands"))
        .orderBy("id_a", "id_b")
    )
    return pairs, new_sigs


def duplicated_span_fraction(
    df: DataFrame,
    id_col: str,
    text_col: str,
    span: int = 16,
    min_count: int = 2,
) -> DataFrame:
    """Per-document fraction of ``span``-token windows that are duplicated
    anywhere in the corpus (>= ``min_count`` total occurrences, within- or
    cross-document) — the exact-substring dedup audit from "Deduplicating
    Training Data Makes Language Models Better" (Lee et al. 2022, public):
    long repeated spans are memorization fuel that MinHash-style whole-doc
    dedup does not see.

    Distinct from :func:`boilerplate_ngram_fraction`: long windows
    (default 16 vs 3), occurrence-count criterion (catches within-doc
    repetition), and positional windows, so a doc pasted twice into
    another is flagged even when every individual 3-gram is common.

    Plan shape — built for ONE evaluation of the corpus-sized work: spans
    are hashed in-row (slice + concat_ws + md5 per position — direct
    construction, not the n-pass incremental zip `_ngrams` uses, which is
    quadratic in span length) and exploded once; the span-hash groupBy
    carries the doc ids of each hash, so duplicate detection and the
    per-doc hit counts come out of the SAME shuffle — no join-back that
    would re-execute the explode subtree. Span counts are pure arithmetic
    (``len - span + 1``), never a second span materialization. A
    degenerate mega-duplicated span concentrates its occurrence list on
    one reducer — the same skew exposure as any groupBy, handled by AQE.
    The sizes-x-hits join is pinned shuffle-hash: hits is one row per
    document with duplicates (corpus-scaled) riding the explode lineage,
    which the size-only estimator under-counts with no fanout term — the
    q235 runtime-broadcast abort class (r10 audit).
    Output: (id, n_spans, n_dup, dup_frac) for docs with >= 1 window.
    """
    w = tokens(text_col)
    n_spans = F.greatest(F.size(w) - (span - 1), F.lit(0))
    span_hashes = F.when(n_spans > 0, F.transform(
        F.sequence(F.lit(1), n_spans),
        lambda i: F.md5(F.concat_ws(" ", F.slice(w, i, span))),
    )).otherwise(F.array().cast("array<string>"))
    exploded = df.select(F.col(id_col), F.explode(span_hashes).alias("_s"))
    sizes = df.select(F.col(id_col), n_spans.alias("n_spans")).filter(
        F.col("n_spans") > 0
    )
    hits = (
        exploded.groupBy("_s")
        .agg(F.count("*").alias("_c"), F.collect_list(id_col).alias("_ids"))
        .filter(F.col("_c") >= min_count)
        .select(F.explode("_ids").alias(id_col))
        .groupBy(id_col)
        .agg(F.count("*").alias("n_dup"))
    )
    return (
        sizes.join(hits.hint("shuffle_hash"), id_col, "left")
        .select(
            id_col,
            "n_spans",
            F.coalesce(F.col("n_dup"), F.lit(0)).alias("n_dup"),
            F.round(
                F.coalesce(F.col("n_dup"), F.lit(0)).cast("double")
                / F.col("n_spans"),
                4,
            ).alias("dup_frac"),
        )
        .orderBy(id_col)
    )


def boilerplate_ngram_fraction(
    df: DataFrame,
    id_col: str,
    text_col: str,
    ngram: int = 3,
    min_df: int = 5,
) -> DataFrame:
    """Per-document fraction of n-gram occurrences that are corpus
    boilerplate (the Gopher/RefinedWeb "duplicated n-grams across the
    corpus" quality signal): an n-gram is boilerplate when it appears in
    at least ``min_df`` distinct documents.

    Distinct from :func:`ngram_jaccard_pairs` (pairwise overlap) and the
    within-doc repetition signals: this measures cross-corpus template
    mass per document, the filter that strips navigation chrome / license
    headers from web crawls before training.

    Plan shape: shingles explode once (generator-only select — an
    expression carried next to a generator re-evaluates per output row);
    document frequency is a two-phase partial aggregation. The
    boilerplate set (df >= min_df) is SMALL relative to the shingle
    universe (Zipf), but it still grows with the corpus — a constant
    fraction of the vocabulary crosses any fixed df floor as documents
    accumulate — so its probe join and the per-doc hits join are pinned
    shuffle-hash rather than broadcast: both builds ride the explode
    lineage whose size estimate carries no fanout term (the q235
    runtime-broadcast abort class, r10 audit). Sizes ride a separate
    one-row-per-doc projection.

    Returns (id, n_ngrams, n_boiler, boiler_frac) for every document with
    at least one n-gram.
    """
    from hadoop_jobanalyzer_spark.functions.text import shingles_seq

    sh_seq = shingles_seq(tokens(text_col), ngram)
    exploded = df.select(F.col(id_col), F.explode(sh_seq).alias("_s"))
    sizes = df.select(F.col(id_col), F.size(sh_seq).alias("n_ngrams")).filter(
        F.col("n_ngrams") > 0
    )
    boiler = (
        exploded.groupBy("_s")
        .agg(F.count_distinct(F.col(id_col)).alias("_df"))
        .filter(F.col("_df") >= min_df)
        .select("_s")
    )
    hits = (
        exploded.join(boiler.hint("shuffle_hash"), "_s")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_boiler"))
    )
    return (
        sizes.join(hits.hint("shuffle_hash"), id_col, "left")
        .select(
            id_col,
            "n_ngrams",
            F.coalesce(F.col("n_boiler"), F.lit(0)).alias("n_boiler"),
            F.round(
                F.coalesce(F.col("n_boiler"), F.lit(0)).cast("double")
                / F.col("n_ngrams"),
                4,
            ).alias("boiler_frac"),
        )
        .orderBy(id_col)
    )
