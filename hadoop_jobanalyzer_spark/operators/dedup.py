"""Deduplication operators for large text corpora.

Four strategies, cheapest to richest, all shuffle-efficient at scale:

* exact:      one md5 per doc, groupBy(hash) — a single shuffle on a short
              key; at 100 TB this is the same plan, AQE-coalesced.
* bag-of-words fingerprint: order-insensitive exact dedup.
* MinHash+LSH: per-doc signatures computed *in-row* (array expressions, no
              explode), banded; only docs sharing a band bucket are joined —
              the candidate join's fan-out is bounded by bucket sizes, not
              corpus², which is the whole point at scale.
* n-gram Jaccard: exact verification on candidate pairs (or, below a size
              threshold, on all shingle-sharing pairs).

Reference parity note: the reference's only dedup is distinct-attempt
counting (SURVEY.md O3); this module is the §7 "milestone 5" extension
layer for training-data pipelines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.window import Window

from hadoop_jobanalyzer_spark.functions.text import shingles, tokens

DEFAULT_SEEDS = list(range(8))


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
    seeds: list[int] | None = None,
    ngram: int = 3,
) -> DataFrame:
    """Per doc, one MinHash per seed: min over shingles of md5('{seed}:'+s).

    md5 (not engine-native hash) keeps signatures portable across engines;
    min over an in-row array avoids any explode/shuffle.
    """
    seeds = DEFAULT_SEEDS if seeds is None else seeds
    sh = shingles(tokens(text_col), ngram)

    # NB: the lambda must take exactly one arg — a second arg would be
    # interpreted by pyspark as the array index, shadowing the closure.
    def seeded_md5(seed: int):
        return lambda s: F.md5(F.concat(F.lit(f"{seed}:"), s))

    cols = [
        F.array_min(F.transform(sh, seeded_md5(i))).alias(f"mh{i}") for i in seeds
    ]
    return df.select(F.col(id_col), *cols)


def lsh_candidate_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    seeds: list[int] | None = None,
    bands: int = 2,
    ngram: int = 3,
) -> DataFrame:
    """MinHash-LSH candidate pairs: docs agreeing on at least one band.

    Bands hash ``rows = len(seeds)/bands`` consecutive minhashes; the
    band-value self-join is an equi-join on (band_idx, band_hash) — skew-safe
    under AQE, and never materializes non-colliding pairs.
    Output: id_a < id_b, n_shared_bands.
    """
    seeds = DEFAULT_SEEDS if seeds is None else seeds
    rows = len(seeds) // bands
    sigs = minhash_signatures(df, id_col, text_col, seeds, ngram)
    band_cols = []
    for b in range(bands):
        members = [F.col(f"mh{seeds[b * rows + r]}") for r in range(rows)]
        band_cols.append(
            F.struct(F.lit(b).alias("band"), F.md5(F.concat_ws("|", *members)).alias("bh"))
        )
    banded = sigs.select(
        F.col(id_col), F.explode(F.array(*band_cols)).alias("bb")
    ).select(F.col(id_col), F.col("bb.band").alias("band"), F.col("bb.bh").alias("bh"))
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bh") == F.col("b.bh"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .groupBy(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .agg(F.count("*").alias("n_shared_bands"))
        .orderBy("id_a", "id_b")
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    ngram: int = 3,
    threshold: float = 0.2,
) -> DataFrame:
    """Exact n-gram Jaccard over pairs sharing >= 1 shingle.

    Shingle inverted index -> self-join on shingle -> per-pair intersection
    count -> Jaccard from per-doc distinct-shingle counts. The shingle join
    is the scale risk (common shingles fan out); production path runs this
    only on LSH candidates — composed as
    ``lsh_candidate_pairs(...).join(ngram_jaccard_pairs(...), ...)`` or by
    passing a pre-filtered df.
    Output: id_a < id_b, n_common, n_a, n_b, jaccard (rounded 3).
    """
    sh = df.select(
        F.col(id_col), F.explode(shingles(tokens(text_col), ngram)).alias("sh")
    )
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("n_sh"))
    a, b = sh.alias("a"), sh.alias("b")
    common = (
        a.join(
            b,
            (F.col("a.sh") == F.col("b.sh"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .groupBy(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .agg(F.count("*").alias("n_common"))
    )
    sizes_a = sizes.select(F.col(id_col).alias("id_a"), F.col("n_sh").alias("n_a"))
    sizes_b = sizes.select(F.col(id_col).alias("id_b"), F.col("n_sh").alias("n_b"))
    return (
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
