"""Prefix-filtered exact set-similarity self-join (the AllPairs / PPJoin
candidate scheme: Bayardo et al. WWW'07, Chaudhuri et al. ICDE'06).

LSH (operators/dedup.py) trades recall for speed; this operator is the
EXACT counterpart: every pair whose Jaccard clears the threshold is
produced, yet all-pairs comparison is avoided by the prefix-filter
theorem — under any global token order, two sets with ``J >= t`` must
share at least one token within each other's first
``|x| - ceil(t*|x|) + 1`` tokens. Ordering tokens by ascending document
frequency makes those prefixes the *rarest* tokens, so the candidate
join fans out on tokens that appear in few documents.

Scale shape: the df table is vocabulary-sized (Zipf-small), the prefix
relation is a fraction of the token relation, candidates join on single
rare tokens, and verification joins only candidate pairs back to the
token table. No stage touches all document pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hadoop_jobanalyzer_spark.functions.text import shingles, tokens
from hadoop_jobanalyzer_spark.util import materialize


def prefix_filter_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    ngram: int = 4,
    threshold: tuple[int, int] = (7, 10),
) -> DataFrame:
    """All pairs with shingle-Jaccard >= num/den, exactly.

    ``threshold`` is a rational (num, den) so every pruning comparison is
    integer cross-multiplication — no float thresholds anywhere, which is
    what makes the output bit-identical to a naive exact oracle.

    Output: (id_a, id_b, n_common, n_a, n_b, jaccard), id_a < id_b,
    ordered by (id_a, id_b).
    """
    num, den = threshold
    # the token relation feeds five branches (sizes, df, ordering, and
    # both verify probes) — persist it once for the operator's scope
    sh = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(shingles(tokens(F.col(text_col)), ngram)).alias("s"),
    ).transform(materialize)  # shingles() is already distinct per doc
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    dfreq = sh.groupBy("s").agg(F.count("*").alias("df"))

    # global order: (df asc, s asc); prefix = first n - ceil(t*n) + 1
    w = Window.partitionBy("doc_id").orderBy("df", "s")
    ordered = (
        sh.join(dfreq, "s")
        .withColumn("_rk", F.row_number().over(w))
        .join(sizes, "doc_id")
    )
    # ceil(num*n/den) = (num*n + den - 1) div den
    prefix_len = F.col("n") - F.floor((num * F.col("n") + den - 1) / den) + 1
    # the prefix relation feeds BOTH sides of the candidate self-join;
    # without its own materialization each side re-runs the df join, the
    # per-doc ranking window, and the size join — the whole upstream
    # pipeline twice (this was the one x10 slope-gate breach in the r7
    # sweep: 12.4 > 12, 7 Exchanges). Compute it once; both probe sides
    # read the truncated-lineage table (the q50 lesson).
    prefix = (
        ordered.filter(F.col("_rk") <= prefix_len)
        .select("doc_id", "s", "n")
        .transform(materialize)
    )

    pa = prefix.select(F.col("doc_id").alias("id_a"), "s", F.col("n").alias("n_a"))
    pb = prefix.select(F.col("doc_id").alias("id_b"), "s", F.col("n").alias("n_b"))
    cand = (
        pa.join(pb, "s")
        .filter(F.col("id_a") < F.col("id_b"))
        # length filter: J >= t forces den*min(|a|,|b|) >= num*max(|a|,|b|)
        .filter(
            den * F.least("n_a", "n_b") >= num * F.greatest("n_a", "n_b")
        )
        .select("id_a", "id_b", "n_a", "n_b")
        .distinct()
    )

    # verify on the token relation: candidates fan back out to their
    # shared tokens only (the (id_b, s) equi-join touches matching
    # tokens, never full shingle arrays — measured 2x faster than an
    # in-row array_intersect verify, which drags every candidate's full
    # string array through the join)
    ta = sh.select(F.col("doc_id").alias("id_a"), "s")
    tb = sh.select(F.col("doc_id").alias("id_b"), "s")
    inter = (
        cand.join(ta, "id_a")
        .join(tb, ["id_b", "s"])
        .groupBy("id_a", "id_b", "n_a", "n_b")
        .agg(F.count("*").alias("n_common"))
    )
    union_sz = F.col("n_a") + F.col("n_b") - F.col("n_common")
    return (
        inter.filter(den * F.col("n_common") >= num * union_sz)
        .select(
            "id_a",
            "id_b",
            "n_common",
            "n_a",
            "n_b",
            F.round(F.col("n_common").cast("double") / union_sz.cast("double"), 3).alias(
                "jaccard"
            ),
        )
        .orderBy("id_a", "id_b")
    )
