"""Model-building queries q233+: the iterative refinement passes a
training pipeline commits AFTER the per-step primitives check out —
multi-round k-means codebook refinement (the committed form of q91's
single Lloyd step) and common-neighbor link prediction over the
co-purchase graph (graph completion / recommendation candidates, the
inverse of q79's lift over EXISTING edges).

Same contract as every other plan module: (DataFrame builder, DuckDB
oracle SQL) pairs, exact integer accumulation end-to-end (both queries
emit all-integer rows), deterministic ordering.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from hadoop_jobanalyzer_spark.plans.tables import load_tables

# --- q233: iterated k-means codebook refinement -------------------------------

_KM_K = 8
_KM_ROUNDS = 3


def q233_kmeans_iterated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three exact Lloyd iterations over the embeddings
    (operators/quantize.kmeans_iterated): broadcast-centroid integer
    argmin assignment each round, round-half-up rational centroid updates
    on the fixed-point lattice, empty cells carrying their centroid
    forward.  Output is the final cell census with the exact integer
    inertia numerator per cell — the codebook-quality report a
    quantization pipeline signs off on before freezing an IVF/PQ index."""
    from hadoop_jobanalyzer_spark.operators.quantize import kmeans_iterated

    emb = load_tables(spark, sf_dir)["embeddings"]
    return kmeans_iterated(emb, "vec_id", "embedding", k=_KM_K, rounds=_KM_ROUNDS)


def _q233_sql(k: int = _KM_K, rounds: int = _KM_ROUNDS) -> str:
    """Compose the oracle: one CTE block per Lloyd round.  Mirrors the
    Spark operator exactly — integer lattice (round(x*1000)), argmin with
    (dist, cid) tie-break, centroid update floor((2*s+n)/(2*n)) evaluated
    in doubles (exact below 2^53), COALESCE keeping empty cells' previous
    centroids.  ``dim`` is engine-internal (DuckDB 1-based here, Spark
    posexplode 0-based) — it joins sums to centroids within one engine and
    never reaches the output."""

    def dist_cte(name: str, cents: str) -> str:
        return (
            f"{name} AS (\n"
            f"  SELECT q.vec_id, c.cid,\n"
            f"         list_sum(list_transform(generate_series(1, len(qv)),\n"
            f"                                 i -> (qv[i] - cv[i]) * (qv[i] - cv[i]))) AS dist\n"
            f"  FROM q CROSS JOIN {cents} c\n"
            f")"
        )

    parts = [
        "WITH q AS (\n"
        "  SELECT vec_id,\n"
        "         list_transform(embedding,\n"
        "                        x -> CAST(ROUND(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS qv\n"
        "  FROM embeddings\n"
        ")",
        # seed with the k LOWEST vec_ids exactly like the Spark operator
        # (orderBy + limit) — `WHERE vec_id < k` only agrees when ids are
        # 0-based and contiguous, which is a datagen accident, not a
        # contract
        f"c0 AS (SELECT vec_id AS cid, qv AS cv FROM q ORDER BY vec_id LIMIT {k})",
    ]
    for r in range(1, rounds):
        prev = f"c{r - 1}"
        parts.append(dist_cte(f"d{r}", prev))
        parts.append(
            f"a{r} AS (\n"
            f"  SELECT vec_id, cid FROM (\n"
            f"    SELECT vec_id, cid,\n"
            f"           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn\n"
            f"    FROM d{r}\n"
            f"  ) WHERE rn = 1\n"
            f")"
        )
        parts.append(
            f"g{r} AS (\n"
            f"  SELECT cell, dim, SUM(xi) AS sx, COUNT(*) AS n FROM (\n"
            f"    SELECT a.cid AS cell, generate_subscripts(q.qv, 1) AS dim,\n"
            f"           UNNEST(q.qv) AS xi\n"
            f"    FROM q JOIN a{r} a USING (vec_id)\n"
            f"  ) GROUP BY cell, dim\n"
            f")"
        )
        parts.append(
            f"c{r} AS (\n"
            f"  SELECT cell AS cid, list(ci ORDER BY dim) AS cv FROM (\n"
            f"    SELECT od.cell, od.dim,\n"
            f"           COALESCE(CAST(FLOOR(CAST(2 * g.sx + g.n AS DOUBLE)\n"
            f"                                / (2 * g.n)) AS BIGINT), od.ci) AS ci\n"
            f"    FROM (SELECT cid AS cell, generate_subscripts(cv, 1) AS dim,\n"
            f"                 UNNEST(cv) AS ci FROM {prev}) od\n"
            f"    LEFT JOIN g{r} g USING (cell, dim)\n"
            f"  ) GROUP BY cell\n"
            f")"
        )
    parts.append(dist_cte("df_", f"c{rounds - 1}"))
    parts.append(
        "af AS (\n"
        "  SELECT vec_id, cid, dist FROM (\n"
        "    SELECT vec_id, cid, dist,\n"
        "           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn\n"
        "    FROM df_\n"
        "  ) WHERE rn = 1\n"
        ")"
    )
    return (
        ",\n".join(parts)
        + "\nSELECT cid AS cell, COUNT(*) AS n_assigned,"
        + " CAST(SUM(dist) AS BIGINT) AS sse_fixed\n"
        + "FROM af GROUP BY cid ORDER BY cell"
    )


# --- q234: common-neighbor link prediction ------------------------------------

_LP_SHARD = 50
_LP_TOPK = 20


def q234_link_prediction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 recommended part pairs: NON-edges of the co-purchase graph
    with the most shared neighbors among one deterministic wedge-center
    shard (operators/graph.common_neighbor_candidates — centers with
    ``partkey % 50 == 0``; the full sweep is embarrassingly parallel over
    the 50 shards).  Consumes the session edge cache q120/q125/q131
    share, so the lineitem self-join is paid once per session."""
    from hadoop_jobanalyzer_spark.operators.graph import common_neighbor_candidates
    from hadoop_jobanalyzer_spark.plans.sketch_queries import _copurchase_edges

    return common_neighbor_candidates(
        _copurchase_edges(spark, sf_dir), shard_mod=_LP_SHARD, topk=_LP_TOPK
    )


Q234_SQL = f"""
WITH e AS (
  SELECT DISTINCT a.l_partkey AS pa, b.l_partkey AS pb
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
),
sym AS (SELECT pa AS v, pb AS w FROM e UNION ALL SELECT pb, pa FROM e),
deg AS (SELECT v, COUNT(*) AS d FROM sym GROUP BY v),
nb AS (SELECT v AS c, w AS n FROM sym WHERE v % {_LP_SHARD} = 0),
pairs AS (
  SELECT x.n AS id_a, y.n AS id_b, COUNT(*) AS common_neighbors
  FROM nb x JOIN nb y ON x.c = y.c AND x.n < y.n
  GROUP BY 1, 2
),
top AS (
  SELECT * FROM pairs p
  WHERE NOT EXISTS (SELECT 1 FROM e WHERE e.pa = p.id_a AND e.pb = p.id_b)
  ORDER BY common_neighbors DESC, id_a, id_b
  LIMIT {_LP_TOPK}
)
SELECT t.id_a, t.id_b, t.common_neighbors, da.d AS deg_a, db.d AS deg_b
FROM top t
JOIN deg da ON t.id_a = da.v
JOIN deg db ON t.id_b = db.v
ORDER BY common_neighbors DESC, id_a, id_b
"""


MODEL_QUERIES = {
    "q233_kmeans_iterated": (q233_kmeans_iterated, _q233_sql()),
    "q234_link_prediction": (q234_link_prediction, Q234_SQL),
}
