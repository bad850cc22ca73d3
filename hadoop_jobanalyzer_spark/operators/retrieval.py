"""Keyword retrieval over the document corpus: BM25 scoring without a
single explode.

The reference engine has no retrieval surface; this belongs to the
training-data-pipeline layer (quality filtering and corpus search need
"find the documents about X" at 100 TB). The design constraint is the
usual one: one linear scan of the corpus, one tiny broadcast, everything
in codegen.

Why no explode/posting list: the query term set is small (a handful of
literals), so per-document term frequencies are plain ``size(filter(...))``
array expressions — each document contributes one row carrying ``k`` tf
columns. Corpus statistics (N, df per term, average doclen) reduce to ONE
aggregate row, broadcast back. Compare a classic inverted-index build:
that explodes every token of every document (corpus-size x doclen rows)
to answer the same k-term query. At 100 TB the no-explode form is a
single whole-stage-codegen pass plus a 1-row exchange.

Determinism contract (shared with the DuckDB oracles): the score uses the
*rational* BM25 idf ``(N - df + 0.5) / (df + 0.5)`` rather than its log —
IEEE +,*,/ are correctly rounded so both engines produce bit-identical
doubles, while ``ln`` rounding is libm-specific. The log is monotone in
the ratio, so per-term discrimination ordering is preserved; the summed
score is a (documented) BM25 variant.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from hadoop_jobanalyzer_spark.functions.text import tokens


def bm25_topk(
    df: DataFrame,
    id_col: str,
    text_col: str,
    terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-``k`` documents for a bag-of-words query under rational-idf
    BM25 (module docstring). Returns ``(id, tf_<term>..., dl, score)``
    ordered by ``score`` desc with ``id`` as the deterministic tiebreak.

    Plan shape: one corpus scan computing per-doc tf columns + doclen
    (codegen, no shuffle), one 1-row aggregate for (N, df_i, avgdl)
    broadcast back, then the score expression and a global top-k (Spark's
    ``TakeOrderedAndProject`` — per-partition heaps, no full sort).
    """
    if not terms:
        raise ValueError("bm25_topk needs at least one query term")
    w = tokens(text_col)
    # tf via size-minus-array_remove, not a filter() lambda: higher-order
    # lambdas are interpreted per element outside whole-stage codegen
    # (repo-wide hot-path rule); the two collection ops stay in codegen.
    tf_cols = [
        (F.size(w) - F.size(F.array_remove(w, t))).alias(f"tf_{t}") for t in terms
    ]
    base = df.select(F.col(id_col), *tf_cols, F.size(w).alias("dl"))
    stats = base.agg(
        F.count("*").alias("_n_docs"),
        F.avg("dl").alias("_avgdl"),
        *[
            F.count(F.when(F.col(f"tf_{t}") > 0, True)).alias(f"_df_{t}")
            for t in terms
        ],
    )

    def term_score(t: str) -> Column:
        tf = F.col(f"tf_{t}").cast("double")
        idf = (F.col("_n_docs") - F.col(f"_df_{t}") + F.lit(0.5)) / (
            F.col(f"_df_{t}") + F.lit(0.5)
        )
        sat = (tf * F.lit(k1 + 1.0)) / (
            tf
            + F.lit(k1)
            * (
                F.lit(1.0 - b)
                + F.lit(b) * (F.col("dl").cast("double") / F.col("_avgdl"))
            )
        )
        return idf * sat

    score = term_score(terms[0])
    for t in terms[1:]:
        score = score + term_score(t)
    return (
        base.join(F.broadcast(stats))
        .withColumn("score", F.round(score, 6))
        .filter(F.col("score") > 0)
        .select(id_col, *[f"tf_{t}" for t in terms], "dl", "score")
        .orderBy(F.desc("score"), id_col)
        .limit(k)
    )


def bm25_sql(
    table: str,
    id_col: str,
    text_col: str,
    terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> str:
    """DuckDB oracle for :func:`bm25_topk` — arithmetic written in the
    same shape/order so IEEE rounding matches step for step."""
    tf_exprs = ",\n         ".join(
        f"len(list_filter(w, x -> x = '{t}')) AS tf_{t}" for t in terms
    )
    df_exprs = ",\n         ".join(
        f"COUNT(*) FILTER (tf_{t} > 0) AS df_{t}" for t in terms
    )
    score_terms = " + ".join(
        f"((_n_docs - df_{t} + 0.5) / (df_{t} + 0.5))"
        f" * ((CAST(tf_{t} AS DOUBLE) * {k1 + 1.0!r})"
        f" / (CAST(tf_{t} AS DOUBLE) + {k1!r}"
        f" * ({1.0 - b!r} + {b!r} * (CAST(dl AS DOUBLE) / _avgdl))))"
        for t in terms
    )
    tf_names = ", ".join(f"tf_{t}" for t in terms)
    return f"""
WITH base AS (
  SELECT {id_col},
         {tf_exprs},
         len(w) AS dl
  FROM (SELECT {id_col}, string_split({text_col}, ' ') AS w FROM {table})
),
stats AS (
  SELECT COUNT(*) AS _n_docs, AVG(dl) AS _avgdl,
         {df_exprs}
  FROM base
)
SELECT {id_col}, {tf_names}, dl, ROUND({score_terms}, 6) AS score
FROM base, stats
WHERE ROUND({score_terms}, 6) > 0
ORDER BY score DESC, {id_col}
LIMIT {k}
"""
