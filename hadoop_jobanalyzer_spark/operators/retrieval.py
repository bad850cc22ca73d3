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
from hadoop_jobanalyzer_spark.util import materialize


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


def tfidf_cosine_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.5,
    max_posting: int = 1000,
    w_cap: int = 1000,
) -> DataFrame:
    """Sparse tf-idf cosine similarity between document pairs sharing at
    least one term — the embedding-free near-dup/related-docs signal.

    Weights are the *quantized* idf ``w(t) = min(floor(N / df_t), w_cap)``
    — integer, so numerators and norms are exact longs and the only float
    op is the final single-division cosine (cross-engine deterministic;
    same rationale as the rational BM25 idf above). ``w_cap`` also bounds
    the magnitude so sums stay far from long overflow at any corpus size.

    Scale shape: terms explode once; posting lists build per term and the
    pair fan-out happens *within* posting lists capped at ``max_posting``
    (stop-terms with huge df carry weight 1 and are exactly the ones the
    cap drops — the same bounded-bucket contract as the dedup operators).
    Norms reuse the posting-list table (no second corpus pass), and the
    term table (vocab-sized — Zipf-bounded at any corpus scale) is
    persisted for its two consumers so the corpus explode runs once.
    Output: id_a < id_b, num, na, nb, cos_sim (rounded 4).
    """
    toks = df.select(
        F.col(id_col).alias("_id"), F.explode(tokens(text_col)).alias("t")
    ).filter(F.col("t") != "")
    tf = toks.groupBy("_id", "t").agg(F.count("*").alias("tf"))
    n_docs = df.agg(F.count("*").alias("_n"))
    term = (
        tf.groupBy("t")
        .agg(
            F.count("*").alias("df"),
            F.sort_array(
                F.collect_list(F.struct(F.col("_id").alias("id"), F.col("tf").alias("tf")))
            ).alias("_post"),
        )
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "w",
            F.least(F.floor(F.col("_n") / F.col("df")).cast("long"), F.lit(w_cap)),
        )
        .transform(materialize)
    )
    posted = term.select("w", F.explode("_post").alias("p"))
    norms = posted.groupBy(F.col("p.id").alias("_id")).agg(
        F.sum(F.col("p.tf") * F.col("p.tf") * F.col("w") * F.col("w")).alias("n2")
    )
    post = F.col("_post")
    pair = F.flatten(
        F.transform(
            post,
            lambda x, i: F.transform(
                F.slice(post, i + F.lit(2), F.size(post)),
                lambda y: F.struct(
                    x["id"].alias("id_a"),
                    y["id"].alias("id_b"),
                    (x["tf"] * y["tf"]).alias("tt"),
                ),
            ),
        )
    )
    contrib = (
        term.filter((F.col("df") >= 2) & (F.col("df") <= max_posting))
        .select((F.col("w") * F.col("w")).alias("_w2"), F.explode(pair).alias("p"))
    )
    num = contrib.groupBy(
        F.col("p.id_a").alias("id_a"), F.col("p.id_b").alias("id_b")
    ).agg(F.sum(F.col("p.tt") * F.col("_w2")).alias("num"))
    cos = F.round(
        F.col("num").cast("double")
        / F.sqrt(F.col("na").cast("double") * F.col("nb").cast("double")),
        4,
    )
    # norm joins pinned shuffle-hash with the narrow per-doc norm table
    # as the build: both sides are corpus-scaled and ride fanout-blind
    # explode-lineage estimates, so an unhinted plan can broadcast either
    # — the q235 x100 abort class (r10 audit).
    na_t = norms.select(F.col("_id").alias("id_a"), F.col("n2").alias("na"))
    nb_t = norms.select(F.col("_id").alias("id_b"), F.col("n2").alias("nb"))
    return (
        num.join(na_t.hint("shuffle_hash"), "id_a")
        .join(nb_t.hint("shuffle_hash"), "id_b")
        .select("id_a", "id_b", "num", "na", "nb", cos.alias("cos_sim"))
        .filter(F.col("cos_sim") >= threshold)
        .orderBy("id_a", "id_b")
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


def phrase_hits(
    df: DataFrame,
    id_col: str,
    text_col: str,
    phrase: str,
) -> DataFrame:
    """Exact phrase-occurrence counts per document: (id, n_hits), hits > 0.

    The phrase ("w1 w2 ... wn" on the corpus's single-space tokenization)
    is matched at *word* granularity: per document, count the positions
    whose n-word window equals the phrase. Two layers:

    1. a substring ``contains`` prefilter that pushes into the parquet
       scan — a cheap SUPERSET test ("stable scan" contains the substring
       "table scan"), so data skipping drops non-matching row groups;
    2. the exact check as an in-row zip over the token array (the same
       shifted-slice n-gram builder the shingle family uses) — no
       explode, no join, no shuffle; the only exchange is the final sort.

    A standing search service would instead materialize the positional
    inverted index once (posexplode -> (term, doc, pos) table, bucketed by
    term) and answer phrases with a pos+1 self-join; this operator is the
    single-query plan, which at 100 TB is strictly cheaper than building
    that index for one phrase.
    """
    from hadoop_jobanalyzer_spark.functions.text import shingles_seq, tokens

    n = len(phrase.split(" "))
    grams = shingles_seq(tokens(F.col(text_col)), n)
    hits = F.size(F.filter(grams, lambda s: s == F.lit(phrase)))
    return (
        df.filter(F.col(text_col).contains(phrase))
        .select(F.col(id_col), hits.alias("n_hits"))
        .filter(F.col("n_hits") > 0)
        .orderBy(F.desc("n_hits"), id_col)
    )
