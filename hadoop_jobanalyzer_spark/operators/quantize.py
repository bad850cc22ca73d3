"""Embedding quantization operators: int8 scalar quantization QA and a
deterministic k-means refinement step.

Vector indexes at 100 TB do not store float32: IVF/PQ/SQ indexes store
quantized codes, and the pipeline needs (a) a reconstruction-error audit
before committing to a codebook and (b) centroid refinement passes. Both
are expressed here so the corpus-sized work is one scan:

* :func:`sq8_error_histogram` — per-dimension min/max reduce to ONE row
  (broadcast back), the per-vector quantize/dequantize error is an in-row
  fold, and only the final ~dozen-bucket histogram shuffles.
* :func:`kmeans_step` — one Lloyd iteration. Assignment is an in-row
  argmin against a broadcast centroid array (no shuffle of the corpus);
  the per-(cell, dim) sums partial-aggregate map-side so the shuffle
  carries k x dim rows per partition, not vectors.

Determinism contract (repo-wide): cross-row float accumulation never
decides output values. Errors are floored to integer micro-units per
element and summed as longs; distances use the fixed-point quantization
from functions.vectors (integer math); movements are reported as exact
integer numerators with a single final double division — so every value
hash-matches the DuckDB oracles bit for bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from hadoop_jobanalyzer_spark.functions.vectors import quantized, to_double

# |err| is floored to integer units of 2^-20 (micro-ish) before any
# cross-row sum — float accumulation order can then never change a result.
ERR_FIXED = 1 << 20


def sq8_error_histogram(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    bucket_width: int = 8192,
) -> DataFrame:
    """Scalar-quantization (int8) reconstruction-error histogram.

    Each dimension d is affinely mapped to codes 0..255 over the corpus
    [min_d, max_d] range; dequantization returns the code's bin center.
    Per vector, the per-element |error| (floored to 1/ERR_FIXED units)
    is summed as an integer; vectors are histogrammed by
    ``total_err // bucket_width``.

    Output: (err_bucket, n_vecs, sum_err_fixed) — all integers.
    """
    v = to_double(F.col(vec_col))
    ex = df.select(F.posexplode(v).alias("dim", "x"))
    stats = ex.groupBy("dim").agg(F.min("x").alias("mn"), F.max("x").alias("mx"))
    srow = stats.agg(
        F.array_sort(F.collect_list(F.struct("dim", "mn", "mx"))).alias("_s")
    ).select(
        F.transform("_s", lambda t: t["mn"]).alias("_mins"),
        F.transform("_s", lambda t: t["mx"]).alias("_maxs"),
    )

    def elem_err(x, i):
        mn = F.get(F.col("_mins"), i)
        mx = F.get(F.col("_maxs"), i)
        scale = mx - mn
        code = F.when(
            scale > 0,
            F.least(F.lit(255), F.floor((x - mn) / scale * 256)),
        ).otherwise(F.lit(0)).cast("long")
        recon = mn + (code.cast("double") + 0.5) * scale / 256
        return F.floor(F.abs(x - recon) * ERR_FIXED).cast("long")

    total = F.aggregate(
        F.transform(v, elem_err),
        F.lit(0).cast("long"),
        lambda acc, e: acc + e,
    )
    return (
        df.crossJoin(F.broadcast(srow))
        .select((total / bucket_width).cast("long").alias("err_bucket"), total.alias("_t"))
        .groupBy("err_bucket")
        .agg(F.count("*").alias("n_vecs"), F.sum("_t").alias("sum_err_fixed"))
        .orderBy("err_bucket")
    )


def kmeans_step(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 8,
) -> DataFrame:
    """One Lloyd (k-means) iteration over fixed-point vectors.

    Seeds are the ``k`` lowest-id vectors (deterministic; a production run
    feeds back the previous round's centroids). Each vector is assigned to
    the centroid minimizing the exact integer squared L2 distance over the
    1/1000-fixed-point quantization (ties break toward the lowest centroid
    id); the new centroid per cell is the mean of its members.

    Movement is reported exactly: ``l1_move_num`` = sum over dims of
    ``|sum_fixed - old_fixed * n|`` (an integer — the L1 distance between
    old and new centroids scaled by ``n * 1000``), plus the single-division
    per-dim average move in original units.

    Output: (cell, n_assigned, l1_move_num, avg_dim_move).
    """
    q = df.select(F.col(id_col).alias("_id"), quantized(F.col(vec_col)).alias("_qv"))
    cents = (
        q.orderBy("_id")
        .limit(k)
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("_id").alias("cid"), F.col("_qv").alias("cv")))
            ).alias("_cents")
        )
    )

    # in-row argmin: per centroid an exact integer distance, array_min on
    # (dist, cid) structs picks min-distance with low-cid tie-break
    def dist_to(c):
        d = F.zip_with(F.col("_qv"), c["cv"], lambda a, b: (a - b) * (a - b))
        return F.struct(
            F.aggregate(d, F.lit(0).cast("long"), lambda acc, x: acc + x).alias("dist"),
            c["cid"].alias("cid"),
        )

    assigned = (
        q.crossJoin(F.broadcast(cents))
        .select(
            "_id",
            "_qv",
            F.array_min(F.transform(F.col("_cents"), dist_to))["cid"].alias("cell"),
        )
    )
    sums = (
        assigned.select("cell", F.posexplode("_qv").alias("dim", "xi"))
        .groupBy("cell", "dim")
        .agg(F.sum("xi").alias("s"), F.count("*").alias("n"))
    )
    cd = (
        cents.select(F.explode("_cents").alias("c"))
        .select(F.col("c.cid").alias("cell"), F.posexplode("c.cv").alias("dim", "ci"))
    )
    return (
        sums.join(F.broadcast(cd), ["cell", "dim"])
        .groupBy("cell")
        .agg(
            F.max("n").alias("n_assigned"),
            F.sum(F.abs(F.col("s") - F.col("ci") * F.col("n"))).alias("l1_move_num"),
            F.count("*").alias("_nd"),
        )
        .select(
            "cell",
            "n_assigned",
            "l1_move_num",
            F.round(
                F.col("l1_move_num").cast("double")
                / (F.col("n_assigned") * 1000)
                / F.col("_nd"),
                6,
            ).alias("avg_dim_move"),
        )
        .orderBy("cell")
    )
