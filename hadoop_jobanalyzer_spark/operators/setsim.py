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

    # global order: (df asc, s asc); prefix = first n - ceil(t*n) + 1.
    # Both annotation joins are pinned shuffle-hash with the AGGREGATE as
    # the build: dfreq (vocabulary-scaled) and sizes (doc-scaled) are
    # estimates over corpus lineage, so an unhinted plan can statically
    # broadcast them — the q235 x100 abort class (r9/r10 audit). SHJ
    # streams the token relation and builds per-partition tables on the
    # narrow aggregate only; the sizes join reuses the window's doc_id
    # partitioning, so the pin adds no Exchange.
    w = Window.partitionBy("doc_id").orderBy("df", "s")
    ordered = (
        sh.join(dfreq.hint("shuffle_hash"), "s")
        .withColumn("_rk", F.row_number().over(w))
        .join(sizes.hint("shuffle_hash"), "doc_id")
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
    # the candidate self-join is pinned shuffle-hash: both sides are the
    # materialized prefix relation, and a LogicalRDD COPIES its original
    # plan's size estimate (r10 finding) — at sf0.001 the planner
    # statically broadcast one full prefix side off that estimate, the
    # exact shape whose runtime broadcast aborted q235 at x100. SHJ
    # builds per-partition tables on the s-hashed prefix instead.
    cand = (
        pa.hint("shuffle_hash")
        .join(pb, "s")
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
    # string array through the join). Both verify joins are pinned
    # shuffle-hash exactly like the containment variant below: cand is
    # the operator's corpus-scaled overfetch riding a filter estimate
    # (runtime-broadcast abort at x100, r9), and sort-merge sorts the
    # exploded candidate-x-token intermediate (spill-reader OOM class).
    ta = sh.select(F.col("doc_id").alias("id_a"), "s")
    tb = sh.select(F.col("doc_id").alias("id_b"), "s")
    inter = (
        cand.hint("shuffle_hash")
        .join(ta, "id_a")
        .join(tb.hint("shuffle_hash"), ["id_b", "s"])
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

    per candidate ROW, kept-if-ANY-row-passes by the ``distinct``: at a
    common token with global ranks ``rk_a`` in A and ``rk_b`` in B, the
    overlap is at most ``1 + min(|A| - rk_a, |B| - rk_b)`` (one match so
    far, plus at best every remaining token on the shorter tail), which
    must still reach ``ceil(t*|A|)``. Lossless: for a qualifying pair
    the globally FIRST common token lies inside A's prefix (else the
    overlap falls short) and passes the bound at that row.

    The Jaccard variant additionally applies a PAIR-level positional
    bound inside its dedup aggregation; HERE the candidate stream is
    prefix-vs-FULL-token (orders of magnitude more rows at scale), and
    the wider per-pair aggregation buffers measurably exhausted
    execution memory at x100 (r9: UNABLE_TO_ACQUIRE_MEMORY in the
    partial hash aggregation under a 24g heap) for a pruning gain of
    ~0.2% at sf0.1 — so this variant deliberately keeps the narrow
    ``distinct``. The verify stage counts common tokens exactly.

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
    # the one df-join + window pass — materialize it once. Both
    # annotation joins are pinned shuffle-hash with the aggregate as the
    # build, same as the Jaccard variant: dfreq (vocabulary-scaled) and
    # sizes (doc-scaled) are estimates over corpus lineage, so an
    # unhinted plan can statically broadcast them — the q235 x100 abort
    # class. These joins execute INSIDE this materialization, so only
    # the interior-plan audit (tools/plan_audit.py, r10) can see them —
    # which is exactly how this unpinned pair was caught after the
    # top-level audit came back clean.
    w = Window.partitionBy("doc_id").orderBy("df", "s")
    ordered = (
        sh.join(dfreq.hint("shuffle_hash"), "s")
        .withColumn("_rk", F.row_number().over(w))
        .join(sizes.hint("shuffle_hash"), "doc_id")
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
    # the candidate join is pinned to shuffle-hash with the prefix side
    # as the build: prefix is a FILTER over the materialized ranked
    # relation, so the planner sees a selectivity estimate, not a real
    # size — at x100 that estimate dipped under the broadcast threshold
    # and the runtime broadcast of a ~GB prefix relation killed the
    # query (r9). A hinted SHJ needs no stats to be right at any scale.
    cand = (
        prefix.select(
            F.col("doc_id").alias("id_a"),
            "s",
            F.col("n").alias("n_a"),
            F.col("_rk").alias("rk_a"),
        )
        .hint("shuffle_hash")
        .join(probe, "s")
        .filter(F.col("id_a") != F.col("id_b"))
        # |A∩B| <= |B|, so containment >= t forces den*|B| >= num*|A|
        .filter(den * F.col("n_b") >= num * F.col("n_a"))
        # row-level positional filter: integer form of
        # 1 + min(n_a - rk_a, n_b - rk_b) >= ceil(num*n_a/den)
        # (x >= ceil(q/den) <=> den*x >= q for integer x)
        .filter(
            den
            * (
                1
                + F.least(
                    F.col("n_a") - F.col("rk_a"), F.col("n_b") - F.col("rk_b")
                )
            )
            >= num * F.col("n_a")
        )
        .select("id_a", "id_b", "n_a", "n_b")
        .distinct()
    )

    ta = sh.select(F.col("doc_id").alias("id_a"), "s")
    tb = sh.select(F.col("doc_id").alias("id_b"), "s")
    # verify joins are PINNED to shuffle-hash with the bounded side as
    # the build: the candidate relation grows with the corpus (it is the
    # operator's overfetch — ~3500x the true pair count at sf0.1), so
    # AQE's near-threshold size estimate is a scale hazard — at x100 the
    # runtime flip to broadcasting it measurably killed the query ("Not
    # enough memory to build and broadcast", r9). Sort-merge is no
    # better here: it sorts the EXPLODED candidate-x-token intermediate
    # (~sum of n_a over candidates), and the spill READER buffers of 32
    # concurrent tasks OOM'd at sf0.1 (r9, UnsafeSorterSpillReader).
    # Shuffle-hash streams that big side untouched and builds per-
    # partition hash tables only on cand / the token relation — the
    # memory-lean shape at every scale (the q182 lesson: plan under the
    # 100 TB assumption, not the test SF's).
    inter = (
        cand.hint("shuffle_hash")
        .join(ta, "id_a")
        .join(tb.hint("shuffle_hash"), ["id_b", "s"])
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
