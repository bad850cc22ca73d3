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
from hadoop_jobanalyzer_spark.util import materialize

# Error unit: 1/2^20. ERR_FIXED = Q_GRID * 512, so errors measured on the
# Q_GRID integer lattice land in 2^-20 units with NO floating-point op ever
# deciding a value (round-4 fix: a float floor used to pick err_bucket).
ERR_FIXED = 1 << 20
# Input grid: xi = round(x * 2048). Multiplying by a power of two is exact
# in IEEE doubles, so the round (half-away-from-zero in both Spark and
# DuckDB) is the only lattice snap and is bit-identical across engines.
Q_GRID = 1 << 11


def sq8_error_histogram(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    bucket_width: int = 8192,
) -> DataFrame:
    """Scalar-quantization (int8) reconstruction-error histogram.

    Inputs snap once to the Q_GRID lattice (xi = round(x * 2048) — exact
    product, deterministic round); everything after is integer arithmetic:
    per-dim mn/mx are integer min/max, ``code = (xi-mn)*256 // scale``
    (clamped to 255), and the per-element error against the bin center is
    the exact integer ``|512*(xi-mn) - (2*code+1)*scale|`` in 1/ERR_FIXED
    units (ERR_FIXED = 512 * Q_GRID = 2^20). Vectors are histogrammed by
    ``total_err // bucket_width``.

    The floor divisions are Spark's integral ``div`` ↔ DuckDB ``//``:
    both numerators are non-negative, so truncating and floor division
    coincide and the arithmetic never leaves 64-bit integer space — no
    double quotient, no |x| bound to enforce (a float floor here would
    silently misround once ``(xi-mn)*256`` crossed ~2^52).

    Output: (err_bucket, n_vecs, sum_err_fixed) — all integers.
    """
    qv = F.transform(
        to_double(F.col(vec_col)),
        lambda x: F.round(x * Q_GRID).cast("long"),
    )
    ex = df.select(F.posexplode(qv).alias("dim", "xi"))
    stats = ex.groupBy("dim").agg(F.min("xi").alias("mn"), F.max("xi").alias("mx"))
    srow = stats.agg(
        F.array_sort(F.collect_list(F.struct("dim", "mn", "mx"))).alias("_s")
    ).select(
        F.transform("_s", lambda t: t["mn"]).alias("_mins"),
        F.transform("_s", lambda t: t["mx"]).alias("_maxs"),
    )

    def elem_err(xi, i):
        mn = F.get(F.col("_mins"), i)
        mx = F.get(F.col("_maxs"), i)
        scale = mx - mn
        code = F.least(
            F.lit(255).cast("long"),
            F.call_function("div", (xi - mn) * 256, scale),
        )
        ierr = F.abs((xi - mn) * 512 - (code * 2 + 1) * scale)
        return F.when(scale > 0, ierr).otherwise(F.lit(0).cast("long"))

    total = F.aggregate(
        F.transform(qv, elem_err),
        F.lit(0).cast("long"),
        lambda acc, e: acc + e,
    )
    return (
        df.crossJoin(F.broadcast(srow))
        .select(
            F.call_function("div", total, F.lit(bucket_width).cast("long")).alias(
                "err_bucket"
            ),
            total.alias("_t"),
        )
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


def kmeans_iterated(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 8,
    rounds: int = 3,
) -> DataFrame:
    """Full Lloyd refinement: ``rounds`` exact k-means iterations, not one.

    :func:`kmeans_step` is the single-iteration primitive (it reports
    centroid movement so a driver loop can watch convergence); this is the
    committed multi-round form a codebook build actually runs.  Everything
    stays on the deterministic integer contract:

    * vectors snap once to the 1/1000 fixed-point lattice
      (functions.vectors.quantized — the only rounding of input data);
    * assignment is an in-row integer argmin against a BROADCAST centroid
      array (ties toward the lowest centroid id), so no round ever
      shuffles the corpus — the per-(cell, dim) sums partial-aggregate to
      k x dim rows per partition, the same shape MLlib's Lloyd pays;
    * the updated centroid per dim is the exact round-half-up rational
      mean on the lattice: ``floor((2*s + n) / (2*n))``.  The quotient is
      evaluated in doubles, which is exact here because ``|2*s + n|`` is
      bounded by ``2 * n * max|q| + n`` — far under 2^53 for any corpus
      whose per-cell member count stays below ~2^40;
    * a cell that captures no vectors keeps its previous centroid (the
      left-join COALESCE), so k never silently shrinks mid-run.

    Each round's k-row centroid frame goes through util.materialize, so
    the unrolled plan evaluates every round exactly once (lineage
    truncation), local-checkpoint-fast on a single node and
    reliable-checkpoint-durable on a cluster session.

    Output: one row per non-empty final cell —
    ``(cell, n_assigned, sse_fixed)`` with ``sse_fixed`` the exact integer
    sum of squared lattice distances to the assigned centroid (the
    codebook's inertia numerator; divide by ``n * 1000^2`` for original
    units).  All-integer output: bit-identical on any engine.
    """
    if rounds < 1:
        # rounds=0 would silently return the seed-assignment census (the
        # refinement loop runs rounds-1 times and the final assignment
        # always runs) — keep the parameter contract explicit instead
        raise ValueError(f"rounds must be >= 1, got {rounds}")
    q = df.select(
        F.col(id_col).alias("_id"), quantized(F.col(vec_col)).alias("_qv")
    ).transform(materialize)
    # deterministic seeds: the k lowest-id vectors, as a 1-row struct array
    cents = (
        q.orderBy("_id")
        .limit(k)
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("_id").alias("cid"), F.col("_qv").alias("cv")))
            ).alias("_cents")
        )
    )

    def dist_to(c):
        d = F.zip_with(F.col("_qv"), c["cv"], lambda a, b: (a - b) * (a - b))
        return F.struct(
            F.aggregate(d, F.lit(0).cast("long"), lambda acc, x: acc + x).alias("dist"),
            c["cid"].alias("cid"),
        )

    def assign(cents_df: DataFrame) -> DataFrame:
        best = F.array_min(F.transform(F.col("_cents"), dist_to))
        return q.crossJoin(F.broadcast(cents_df)).select(
            "_qv", best["cid"].alias("cell"), best["dist"].alias("dist")
        )

    for _ in range(rounds - 1):
        sums = (
            assign(cents)
            .select("cell", F.posexplode("_qv").alias("dim", "xi"))
            .groupBy("cell", "dim")
            .agg(F.sum("xi").alias("sx"), F.count("*").alias("n"))
        )
        old = cents.select(F.explode("_cents").alias("c")).select(
            F.col("c.cid").alias("cell"), F.posexplode("c.cv").alias("dim", "ci")
        )
        upd = old.join(sums, ["cell", "dim"], "left").select(
            "cell",
            "dim",
            F.coalesce(
                F.floor((2 * F.col("sx") + F.col("n")) / (2 * F.col("n"))).cast("long"),
                F.col("ci"),
            ).alias("ci"),
        )
        cents = (
            upd.groupBy("cell")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("dim", "ci"))), lambda s: s["ci"]
                ).alias("cv")
            )
            .agg(
                F.array_sort(
                    F.collect_list(F.struct(F.col("cell").alias("cid"), F.col("cv").alias("cv")))
                ).alias("_cents")
            )
            .transform(materialize)
        )

    return (
        assign(cents)
        .groupBy("cell")
        .agg(F.count("*").alias("n_assigned"), F.sum("dist").alias("sse_fixed"))
        .orderBy("cell")
    )
