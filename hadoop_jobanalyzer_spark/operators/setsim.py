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
        .select("doc_id", "s", "n", "_rk")
        .transform(materialize)
    )

    pa = prefix.select(
        F.col("doc_id").alias("id_a"),
        "s",
        F.col("n").alias("n_a"),
        F.col("_rk").alias("rk_a"),
    )
    pb = prefix.select(
        F.col("doc_id").alias("id_b"),
        "s",
        F.col("n").alias("n_b"),
        F.col("_rk").alias("rk_b"),
    )
    cand = (
        pa.join(pb, "s")
        .filter(F.col("id_a") < F.col("id_b"))
        # length filter: J >= t forces den*min(|a|,|b|) >= num*max(|a|,|b|)
        .filter(
            den * F.least("n_a", "n_b") >= num * F.greatest("n_a", "n_b")
        )
        # PPJoin positional filter (Xiao et al. WWW'08): J >= num/den
        # <=> (num+den)*inter >= num*(n_a+n_b), and at a common token
        # with per-doc global ranks rk_a/rk_b the overlap can reach at
        # most 1 + min(n_a - rk_a, n_b - rk_b). Lossless only as an
        # ANY-row test (a qualifying pair's globally-first common token
        # lies inside BOTH prefixes — else the overlap falls short of
        # either doc's ceil(t*n) floor — and passes the bound there;
        # LATER generating tokens may legitimately fail it), so it rides
        # through the dedup aggregation as a flag.
        .withColumn(
            "_row_ok",
            (
                (num + den)
                * (
                    1
                    + F.least(
                        F.col("n_a") - F.col("rk_a"),
                        F.col("n_b") - F.col("rk_b"),
                    )
                )
                >= num * (F.col("n_a") + F.col("n_b"))
            ).cast("int"),
        )
        # pair-level positional bound over ALL c generating tokens
        # (common tokens in both prefixes): any common token outside
        # the generating set misses at least one prefix, so it sits
        # globally after every generating token and its ranks exceed
        # both maxes — overlap <= c + min(n_a - max(rk_a),
        # n_b - max(rk_b)). Same shuffle a plain distinct would cost.
        .groupBy("id_a", "id_b", "n_a", "n_b")
        .agg(
            F.count("*").alias("_c"),
            F.max("rk_a").alias("_mra"),
            F.max("rk_b").alias("_mrb"),
            F.max("_row_ok").alias("_any_ok"),
        )
        .filter(F.col("_any_ok") == 1)
        .filter(
            (num + den)
            * (
                F.col("_c")
                + F.least(
                    F.col("n_a") - F.col("_mra"), F.col("n_b") - F.col("_mrb")
                )
            )
            >= num * (F.col("n_a") + F.col("n_b"))
        )
        .select("id_a", "id_b", "n_a", "n_b")
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


def prefix_filter_containment_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    ngram: int = 4,
    threshold: tuple[int, int] = (8, 10),
) -> DataFrame:
    """All DIRECTED pairs with shingle-containment
    ``|A intersect B| / |A| >= num/den``, exactly — the asymmetric
    companion of :func:`prefix_filter_jaccard_pairs`.

    Containment catches "A is (nearly) inside B" — quotation, boilerplate
    inclusion, a doc republished inside a digest — which Jaccard misses
    whenever ``|B| >> |A|`` drags the union down. The candidate theorem
    adapts: if ``|A∩B| >= ceil(t*|A|)``, then A's df-ascending prefix of
    length ``|A| - ceil(t*|A|) + 1`` must intersect B *somewhere* (all of
    B, not B's prefix — a superset has no short-prefix guarantee). So the
    candidate join probes A's prefix against the full token relation,
    pruned by ``den*|B| >= num*|A|`` (since ``|A∩B| <= |B|``) and by the
    PPJoin POSITIONAL filter (Xiao et al. WWW'08), applied twice:

    * ANY-ROW bound — at a common token with global ranks ``rk_a`` in A
      and ``rk_b`` in B, the overlap is at most
      ``1 + min(|A| - rk_a, |B| - rk_b)`` (one match so far, plus at
      best every remaining token on the shorter tail). Lossless as an
      ANY-row test: for a qualifying pair the globally FIRST common
      token lies inside A's prefix (else the overlap falls short of
      ``ceil(t*|A|)``) and passes the bound at that row. It is NOT a
      safe per-row pre-filter — later generating tokens of a qualifying
      pair may legitimately fail it ("1 match so far" only holds at the
      first) — so it rides through the aggregation as a flag;
    * PAIR bound — the dedup aggregation counts ALL ``c`` generating
      tokens (common tokens in A's prefix) and their max ranks. Every
      common token OUTSIDE A's prefix has A-rank beyond every generating
      token's, hence sits globally after ALL of them (per-doc ranks
      follow one global order), so its B-rank also exceeds ``max(rk_b)``:
      at most ``min(|A| - max(rk_a), |B| - max(rk_b))`` such tokens
      exist, and ``c + that`` must still reach ``ceil(t*|A|)``.

    The dedup aggregation is the same shuffle a plain ``distinct`` would
    cost; the verify stage then counts common tokens exactly on the
    pairs that survive both bounds.

    Scale shape: identical to the Jaccard join — vocabulary-sized df
    table, prefix relation a fraction of the token relation, the ranked
    token relation materialized once and feeding the prefix side, the
    probe side, and both verify probes; candidates fan out on rare
    tokens only and the positional filter cuts the pre-distinct
    candidate stream before its shuffle. The probe side being full-token
    (not prefix-vs-prefix) is inherent to asymmetric containment and is
    the published PPJoin containment variant, not a missed optimization.

    Output: (id_a, id_b, n_common, n_a, n_b, containment), id_a != id_b
    (both directions may independently qualify), ordered by (id_a, id_b).
    """
    num, den = threshold
    sh = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(shingles(tokens(F.col(text_col)), ngram)).alias("s"),
    ).transform(materialize)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    dfreq = sh.groupBy("s").agg(F.count("*").alias("df"))

    # the ranked token relation feeds the prefix side, the full-token
    # probe side (which needs rk_b for the positional filter), and is
    # the one df-join + window pass — materialize it once
    w = Window.partitionBy("doc_id").orderBy("df", "s")
    ordered = (
        sh.join(dfreq, "s")
        .withColumn("_rk", F.row_number().over(w))
        .join(sizes, "doc_id")
        .select("doc_id", "s", "n", "_rk")
        .transform(materialize)
    )
    prefix_len = F.col("n") - F.floor((num * F.col("n") + den - 1) / den) + 1
    prefix = ordered.filter(F.col("_rk") <= prefix_len)

    probe = ordered.select(
        F.col("doc_id").alias("id_b"),
        "s",
        F.col("n").alias("n_b"),
        F.col("_rk").alias("rk_b"),
    )
    cand = (
        prefix.select(
            F.col("doc_id").alias("id_a"),
            "s",
            F.col("n").alias("n_a"),
            F.col("_rk").alias("rk_a"),
        )
        .join(probe, "s")
        .filter(F.col("id_a") != F.col("id_b"))
        # |A∩B| <= |B|, so containment >= t forces den*|B| >= num*|A|
        .filter(den * F.col("n_b") >= num * F.col("n_a"))
        # any-row positional bound as a flag (integer form of
        # 1 + min(n_a - rk_a, n_b - rk_b) >= ceil(num*n_a/den);
        # x >= ceil(q/den) <=> den*x >= q for integer x)
        .withColumn(
            "_row_ok",
            (
                den
                * (
                    1
                    + F.least(
                        F.col("n_a") - F.col("rk_a"),
                        F.col("n_b") - F.col("rk_b"),
                    )
                )
                >= num * F.col("n_a")
            ).cast("int"),
        )
        # pair-level dedup doubles as the tighter positional bound:
        # overlap <= c + min(n_a - max(rk_a), n_b - max(rk_b))
        .groupBy("id_a", "id_b", "n_a", "n_b")
        .agg(
            F.count("*").alias("_c"),
            F.max("rk_a").alias("_mra"),
            F.max("rk_b").alias("_mrb"),
            F.max("_row_ok").alias("_any_ok"),
        )
        .filter(F.col("_any_ok") == 1)
        .filter(
            den
            * (
                F.col("_c")
                + F.least(
                    F.col("n_a") - F.col("_mra"), F.col("n_b") - F.col("_mrb")
                )
            )
            >= num * F.col("n_a")
        )
        .select("id_a", "id_b", "n_a", "n_b")
    )

    ta = sh.select(F.col("doc_id").alias("id_a"), "s")
    tb = sh.select(F.col("doc_id").alias("id_b"), "s")
    inter = (
        cand.join(ta, "id_a")
        .join(tb, ["id_b", "s"])
        .groupBy("id_a", "id_b", "n_a", "n_b")
        .agg(F.count("*").alias("n_common"))
    )
    return (
        inter.filter(den * F.col("n_common") >= num * F.col("n_a"))
        .select(
            "id_a",
            "id_b",
            "n_common",
            "n_a",
            "n_b",
            F.round(
                F.col("n_common").cast("double") / F.col("n_a").cast("double"), 3
            ).alias("containment"),
        )
        .orderBy("id_a", "id_b")
    )
