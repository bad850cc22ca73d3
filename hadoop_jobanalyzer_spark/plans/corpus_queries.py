"""Corpus-analytics queries q194+: distribution distances between
sources, tokenizer fertility, deterministic corpus-mixing apportionment,
label-propagation communities, and an inverted-index posting relation.

Same contract as the other plan modules: (DataFrame builder, DuckDB
oracle SQL) pairs; exact BIGINT cross-row accumulation (cross-multiplied
distribution compares, largest-remainder integer apportionment), float
division at most once at the end, deterministic tie-breaks everywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hadoop_jobanalyzer_spark.plans.tables import load_tables
from hadoop_jobanalyzer_spark.util import materialize

# The repo-wide BPE-ish pre-tokenizer regex (pipeline_queries.q33).
_BPE_RE = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"


# --- q194: pairwise source total-variation distance --------------------------


def q194_source_tv_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Total-variation distance between every pair of sources' unigram
    token distributions — the corpus-drift matrix a mixing pipeline
    watches before re-weighting sources.

    TV(a,b) = 1/2 * sum_t |p_a(t) - p_b(t)| is computed EXACTLY in
    integers via the cross-multiplied form: the numerator
    sum_t |c_a(t)*N_b - c_b(t)*N_a| needs only tokens present in BOTH
    sources plus two correction terms — tokens exclusive to one side
    contribute c*N_other, and sum of exclusive counts = N - (common
    mass), so no full-outer join is ever planned.  The token self-join's
    fan-out is bounded by (#sources)^2 per token, never by row count;
    per-source totals are a #sources-row broadcast.  The single float
    division tv_num / (2*N_a*N_b) happens once, at the end.
    Output: (src_a, src_b, tv_num, tv), pairs ordered ascending."""
    docs = load_tables(spark, sf_dir)["documents"]
    cnt = (
        docs.select("source", F.explode(F.split("text", " ")).alias("tok"))
        .groupBy("source", "tok")
        .agg(F.count("*").alias("c"))
    )
    tot = cnt.groupBy("source").agg(F.sum("c").alias("n"))
    ca = cnt.select(
        F.col("source").alias("src_a"), "tok", F.col("c").alias("c_a")
    )
    cb = cnt.select(
        F.col("source").alias("src_b"), F.col("tok").alias("tok_b"), F.col("c").alias("c_b")
    )
    ta = tot.select(F.col("source").alias("src_a"), F.col("n").alias("n_a"))
    tb = tot.select(F.col("source").alias("src_b"), F.col("n").alias("n_b"))
    # pinned shuffle-hash: the (source, token) count relation is
    # vocabulary-scaled and rides the explode's fanout-blind estimate
    # (q235 class, r10 audit); the equi-key is tok, the src inequality
    # stays a post-join condition
    common = (
        ca.join(cb.hint("shuffle_hash"), (ca["tok"] == cb["tok_b"]) & (ca["src_a"] < cb["src_b"]))
        .join(F.broadcast(ta), "src_a")
        .join(F.broadcast(tb), "src_b")
        .groupBy("src_a", "src_b", "n_a", "n_b")
        .agg(
            F.sum(F.abs(F.col("c_a") * F.col("n_b") - F.col("c_b") * F.col("n_a"))).alias(
                "common_num"
            ),
            F.sum("c_a").alias("s_a"),
            F.sum("c_b").alias("s_b"),
        )
    )
    pairs = ta.join(tb, ta["src_a"] < tb["src_b"])  # #sources^2 grid, tiny
    return (
        pairs.join(common.drop("n_a", "n_b"), ["src_a", "src_b"], "left")
        .select(
            "src_a",
            "src_b",
            (
                F.coalesce(F.col("common_num"), F.lit(0))
                + (F.col("n_a") - F.coalesce(F.col("s_a"), F.lit(0))) * F.col("n_b")
                + (F.col("n_b") - F.coalesce(F.col("s_b"), F.lit(0))) * F.col("n_a")
            ).alias("tv_num"),
            F.col("n_a"),
            F.col("n_b"),
        )
        .select(
            "src_a",
            "src_b",
            "tv_num",
            (F.col("tv_num") / (2.0 * F.col("n_a") * F.col("n_b"))).alias("tv"),
        )
        .orderBy("src_a", "src_b")
    )


Q194_SQL = """
WITH cnt AS (
  SELECT source, tok, COUNT(*) AS c
  FROM (SELECT source, UNNEST(string_split(text, ' ')) AS tok FROM documents)
  GROUP BY 1, 2
),
tot AS (SELECT source, SUM(c) AS n FROM cnt GROUP BY 1),
common AS (
  SELECT a.source AS src_a, b.source AS src_b,
         SUM(ABS(a.c * tb.n - b.c * ta.n)) AS common_num,
         SUM(a.c) AS s_a, SUM(b.c) AS s_b
  FROM cnt a
  JOIN cnt b ON a.tok = b.tok AND a.source < b.source
  JOIN tot ta ON ta.source = a.source
  JOIN tot tb ON tb.source = b.source
  GROUP BY 1, 2
)
SELECT ta.source AS src_a, tb.source AS src_b,
       COALESCE(common_num, 0)
         + (ta.n - COALESCE(s_a, 0)) * tb.n
         + (tb.n - COALESCE(s_b, 0)) * ta.n AS tv_num,
       (COALESCE(common_num, 0)
         + (ta.n - COALESCE(s_a, 0)) * tb.n
         + (tb.n - COALESCE(s_b, 0)) * ta.n) / (2.0 * ta.n * tb.n) AS tv
FROM tot ta
JOIN tot tb ON ta.source < tb.source
LEFT JOIN common ON common.src_a = ta.source AND common.src_b = tb.source
ORDER BY src_a, src_b
"""


# --- q195: tokenizer fertility per language ----------------------------------


def q195_token_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility per language: BPE-ish pre-tokens per
    whitespace word — the subword-inflation diagnostic that decides
    whether a tokenizer under-serves a language (fertility ~1 for
    English-like text, higher where the regex fragments words).

    Pure codegen: two `regexp_extract_all`/`split` sizes per row, summed
    as BIGINTs per language; the fertility ratio is the one end-stage
    division. Zero joins, one exchange.
    Output: (lang, n_docs, n_words, n_tokens, fertility), lang asc."""
    docs = load_tables(spark, sf_dir)["documents"]
    return (
        docs.select(
            "lang",
            F.size(F.split("text", " ")).cast("long").alias("w"),
            F.size(F.regexp_extract_all("text", F.lit(_BPE_RE), 0)).cast("long").alias(
                "t"
            ),
        )
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("w").alias("n_words"),
            F.sum("t").alias("n_tokens"),
        )
        .select(
            "lang",
            "n_docs",
            "n_words",
            "n_tokens",
            (F.col("n_tokens") / F.col("n_words").cast("double")).alias("fertility"),
        )
        .orderBy("lang")
    )


Q195_SQL = f"""
SELECT lang, COUNT(*) AS n_docs,
       SUM(len(string_split(text, ' '))) AS n_words,
       SUM(len(regexp_extract_all(text, '{_BPE_RE}'))) AS n_tokens,
       SUM(len(regexp_extract_all(text, '{_BPE_RE}')))
         / CAST(SUM(len(string_split(text, ' '))) AS DOUBLE) AS fertility
FROM documents
GROUP BY lang ORDER BY lang
"""


# --- q196: corpus-mixing apportionment (largest remainder) -------------------

_Q196_BUDGET = 10_000  # document budget to apportion across sources


def q196_mixing_apportionment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic corpus-mixing allocator: split a global document
    budget across sources proportional to token mass, using
    largest-remainder (Hamilton) apportionment — the integer-exact way a
    training pipeline turns mixing WEIGHTS into per-source sampling
    COUNTS that add up to the budget exactly.

    base = floor(B * tokens_src / total); the B - sum(base) leftover
    seats go to the largest remainders (B*tokens_src mod total), source
    name the tie-break.  All arithmetic is BIGINT; the only windows run
    over the #sources-row aggregate, never the corpus.
    Output: (source, n_tokens, base_alloc, extra, alloc), source asc;
    sum(alloc) == budget by construction."""
    docs = load_tables(spark, sf_dir)["documents"]
    per_src = (
        docs.select("source", F.size(F.split("text", " ")).cast("long").alias("t"))
        .groupBy("source")
        .agg(F.sum("t").alias("n_tokens"))
    )
    total = Window.partitionBy()  # #sources rows — driver-safe global window
    rem_rank = Window.partitionBy().orderBy(
        F.desc("rem"), F.asc("source")
    )
    return (
        per_src.withColumn("total_t", F.sum("n_tokens").over(total))
        .withColumn(
            "base_alloc",
            F.floor(F.lit(_Q196_BUDGET) * F.col("n_tokens") / F.col("total_t")).cast(
                "long"
            ),
        )
        .withColumn("rem", (F.lit(_Q196_BUDGET) * F.col("n_tokens")) % F.col("total_t"))
        .withColumn("leftover", F.lit(_Q196_BUDGET) - F.sum("base_alloc").over(total))
        .withColumn("rk", F.row_number().over(rem_rank))
        .select(
            "source",
            "n_tokens",
            "base_alloc",
            F.when(F.col("rk") <= F.col("leftover"), F.lit(1))
            .otherwise(F.lit(0))
            .cast("long")
            .alias("extra"),
        )
        .withColumn("alloc", F.col("base_alloc") + F.col("extra"))
        .orderBy("source")
    )


Q196_SQL = f"""
WITH per_src AS (
  SELECT source, SUM(len(string_split(text, ' '))) AS n_tokens
  FROM documents GROUP BY 1
),
calc AS (
  SELECT source, n_tokens,
         SUM(n_tokens) OVER () AS total_t,
         ({_Q196_BUDGET} * n_tokens) // SUM(n_tokens) OVER () AS base_alloc,
         ({_Q196_BUDGET} * n_tokens) % SUM(n_tokens) OVER () AS rem
  FROM per_src
),
ranked AS (
  SELECT *, {_Q196_BUDGET} - SUM(base_alloc) OVER () AS leftover,
         ROW_NUMBER() OVER (ORDER BY rem DESC, source ASC) AS rk
  FROM calc
)
SELECT source, n_tokens, base_alloc,
       CAST(CASE WHEN rk <= leftover THEN 1 ELSE 0 END AS BIGINT) AS extra,
       base_alloc + CASE WHEN rk <= leftover THEN 1 ELSE 0 END AS alloc
FROM ranked ORDER BY source
"""


# --- q197: label-propagation communities -------------------------------------

_Q197_ROUNDS = 2


def q197_lpa_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Community sizes after 2 deterministic label-propagation rounds on
    the part co-purchase graph — the cheap community detector that needs
    no modularity optimization (operators/graph.label_propagation; the
    min_by-struct argmax makes every round engine-reproducible).

    The per-round cost is one vote shuffle over the symmetrized persisted
    edge list (shared with q120/q125/q131 via the edge cache).  The
    oracle unrolls the same two rounds as CTEs.
    Output: (label, community_size), size desc / label asc, limit 50."""
    from hadoop_jobanalyzer_spark.operators.graph import label_propagation
    from hadoop_jobanalyzer_spark.plans.sketch_queries import _copurchase_edges

    labels = label_propagation(
        _copurchase_edges(spark, sf_dir), rounds=_Q197_ROUNDS, canonical=True
    )
    return (
        labels.groupBy("label")
        .agg(F.count("*").alias("community_size"))
        .orderBy(F.desc("community_size"), F.asc("label"))
        .limit(50)
    )


Q197_SQL = """
WITH edges AS (
  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
  FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey
  WHERE a.l_partkey < b.l_partkey
),
sym AS (
  SELECT src AS a, dst AS b FROM edges
  UNION ALL
  SELECT dst AS a, src AS b FROM edges
),
l0 AS (SELECT DISTINCT a AS v, a AS label FROM sym),
v1 AS (
  SELECT sym.b AS v, l0.label, COUNT(*) AS n
  FROM sym JOIN l0 ON sym.a = l0.v GROUP BY 1, 2
),
l1 AS (
  SELECT v, label FROM (
    SELECT v, label,
           ROW_NUMBER() OVER (PARTITION BY v ORDER BY n DESC, label ASC) AS rn
    FROM v1
  ) WHERE rn = 1
),
v2 AS (
  SELECT sym.b AS v, l1.label, COUNT(*) AS n
  FROM sym JOIN l1 ON sym.a = l1.v GROUP BY 1, 2
),
l2 AS (
  SELECT v, label FROM (
    SELECT v, label,
           ROW_NUMBER() OVER (PARTITION BY v ORDER BY n DESC, label ASC) AS rn
    FROM v2
  ) WHERE rn = 1
)
SELECT label, COUNT(*) AS community_size
FROM l2 GROUP BY label
ORDER BY community_size DESC, label ASC
LIMIT 50
"""


# --- q198: inverted-index posting relation -----------------------------------

_Q198_TOP_TOKENS = 100


def q198_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The inverted-index posting relation for the corpus' top tokens:
    (token, doc_id, tf, first_pos, last_pos) — the materialized search
    index BM25/phrase queries (q80, q121) would consult instead of
    rescanning text at query time.

    Token positions come from one `posexplode` of the whitespace split
    (the same explode volume every token query pays); the top-token cut
    (total tf desc, token asc) is a 1-row-per-token aggregate followed by
    a bounded broadcast semi join, so the posting build only shuffles
    rows belonging to the retained vocabulary.
    Output ordered (token, doc_id); positions are 0-based."""
    docs = load_tables(spark, sf_dir)["documents"]
    pos = docs.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "token")
    )
    postings = pos.groupBy("token", "doc_id").agg(
        F.count("*").alias("tf"),
        F.min("pos").cast("long").alias("first_pos"),
        F.max("pos").cast("long").alias("last_pos"),
    )
    top = (
        postings.groupBy("token")
        .agg(F.sum("tf").alias("total_tf"))
        .orderBy(F.desc("total_tf"), F.asc("token"))
        .limit(_Q198_TOP_TOKENS)
        .select("token")
    )
    return (
        postings.join(F.broadcast(top), "token", "left_semi")
        .select("token", "doc_id", "tf", "first_pos", "last_pos")
        .orderBy("token", "doc_id")
    )


Q198_SQL = f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
),
pos AS (
  SELECT doc_id, w[i] AS token, i - 1 AS pos
  FROM (SELECT doc_id, w, UNNEST(generate_series(1, len(w))) AS i FROM toks)
),
postings AS (
  SELECT token, doc_id, COUNT(*) AS tf,
         CAST(MIN(pos) AS BIGINT) AS first_pos,
         CAST(MAX(pos) AS BIGINT) AS last_pos
  FROM pos GROUP BY 1, 2
),
top AS (
  SELECT token FROM postings
  GROUP BY token
  ORDER BY SUM(tf) DESC, token ASC
  LIMIT {_Q198_TOP_TOKENS}
)
SELECT token, doc_id, tf, first_pos, last_pos
FROM postings
WHERE token IN (SELECT token FROM top)
ORDER BY token, doc_id
"""


# --- q201: deterministic epoch shuffle audit ---------------------------------

_Q201_EPOCHS = 3
# fold modulus: Mersenne prime 2^61 - 1 — checksums stay int64 at any
# corpus size; identity below ~2.3e18, so test-scale values are unchanged
_FOLD_PRIME = (1 << 61) - 1


def q201_epoch_shuffle_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic training-order generator audit: each epoch orders the
    corpus by md5(doc_id || ':' || epoch) — the engine-portable seeded
    shuffle a data loader replays exactly on any worker — and the audit
    certifies each epoch is a true permutation (count == distinct) with
    an order checksum any independent implementation can reproduce.

    The checksum folds (rank, doc_id) pairs with two order-SENSITIVE
    exact forms: sum(rank * doc_id) and sum(rank XOR doc_id) — both
    depend on the PAIRING, so any reordering that is not the identity
    permutation moves at least one of them (a concatenated-field
    bit_xor would NOT: disjoint bit ranges make it pairing-blind).
    A checksum needs sensitivity, not magnitude: the raw sums grow as
    rows^2 x id and passed 2^63 at x100 data (the fleet x100 sweep
    aborted on the ANSI long SUM), so both folds accumulate in
    decimal(38,0) — exact, matching the oracle's HUGEINT — and emit
    modulo the Mersenne prime 2^61 - 1. Below ~2.3e18 the modulus is
    the identity, so every test-scale value is unchanged.
    Ranks come from `util.bucketed_global_rank` — md5-prefix bucket
    windows in parallel plus a 256-row offset prefix sum, never a
    single-partition ORDER BY over the corpus (the oracle's plain
    ROW_NUMBER is rank-identical by construction); epochs are a 3-way
    union of independent subplans, not a 3x scan of a joined blob.
    Output: (epoch, n_docs, n_distinct, sum_fold, xor_fold, first_doc,
    last_doc), epoch ascending."""
    from hadoop_jobanalyzer_spark.util import bucketed_global_rank

    docs = load_tables(spark, sf_dir)["documents"].select("doc_id")
    per_epoch = []
    for e in range(_Q201_EPOCHS):
        key = F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(f":{e}")))
        ranked = bucketed_global_rank(
            docs.select(
                F.lit(e).cast("long").alias("epoch"), "doc_id", key.alias("k")
            ),
            F.conv(F.col("k").substr(1, 2), 16, 10).cast("long"),
            [F.col("k").asc(), F.col("doc_id").asc()],
        )
        per_epoch.append(
            ranked.groupBy("epoch").agg(
                F.count("*").alias("n_docs"),
                F.countDistinct("doc_id").alias("n_distinct"),
                (
                    F.sum(F.col("rk").cast("decimal(38,0)") * F.col("doc_id"))
                    % F.lit(_FOLD_PRIME)
                )
                .cast("long")
                .alias("sum_fold"),
                (
                    F.sum(
                        F.col("rk").bitwiseXOR(F.col("doc_id")).cast("decimal(38,0)")
                    )
                    % F.lit(_FOLD_PRIME)
                )
                .cast("long")
                .alias("xor_fold"),
                F.min_by("doc_id", "k").alias("first_doc"),
                F.max_by("doc_id", "k").alias("last_doc"),
            )
        )
    out = per_epoch[0]
    for df in per_epoch[1:]:
        out = out.unionByName(df)
    return out.orderBy("epoch")


Q201_SQL = f"""
WITH epochs AS (
  SELECT e.epoch, d.doc_id,
         md5(CAST(d.doc_id AS VARCHAR) || ':' || CAST(e.epoch AS VARCHAR)) AS k
  FROM documents d
  CROSS JOIN (SELECT UNNEST(generate_series(0, {_Q201_EPOCHS - 1})) AS epoch) e
),
ranked AS (
  SELECT epoch, doc_id, k,
         ROW_NUMBER() OVER (PARTITION BY epoch ORDER BY k ASC, doc_id ASC) AS rk
  FROM epochs
)
SELECT CAST(epoch AS BIGINT) AS epoch,
       COUNT(*) AS n_docs,
       COUNT(DISTINCT doc_id) AS n_distinct,
       CAST(SUM(rk * doc_id) % {(1 << 61) - 1} AS BIGINT) AS sum_fold,
       CAST(SUM(xor(rk, doc_id)) % {(1 << 61) - 1} AS BIGINT) AS xor_fold,
       arg_min(doc_id, k) AS first_doc,
       arg_max(doc_id, k) AS last_doc
FROM ranked
GROUP BY epoch ORDER BY epoch
"""


# --- q202: length-bucketed batch padding efficiency --------------------------

_Q202_BATCH = 32


def q202_batch_padding_efficiency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic-batching ROI report: total padding waste when documents are
    batched {_Q202_BATCH} at a time under (a) length-sorted order vs (b)
    seeded-random order — the exact accounting behind bucketed batching
    in every training data loader (pad cost of a batch = occupancy *
    max_len - sum_len, all BIGINT).

    Each policy's global position comes from `util.bucketed_global_rank`
    (parallel bucket windows + a bucket-table offset sum — no
    single-partition ORDER BY over the corpus): the sorted policy
    buckets by the length itself, the shuffled policy by the md5
    prefix — each bucket a leading sort key, so ranks equal the plain
    global ROW_NUMBER the oracle uses.  Then a floor-div batch id and
    one aggregate; the two policies union.  The waste fraction is the
    single end division.
    Output: (policy, n_batches, n_tokens, pad_tokens, pad_fraction),
    policy ascending."""
    from hadoop_jobanalyzer_spark.util import bucketed_global_rank

    docs = load_tables(spark, sf_dir)["documents"].select(
        "doc_id", F.size(F.split("text", " ")).cast("long").alias("len")
    )
    md5_key = F.md5(F.col("doc_id").cast("string"))
    policies = {
        "len_sorted": (F.col("len"), [F.col("doc_id").asc()]),
        "md5_shuffled": (
            F.conv(md5_key.substr(1, 2), 16, 10).cast("long"),
            [md5_key.asc(), F.col("doc_id").asc()],
        ),
    }
    parts = []
    for name, (bucket, order) in policies.items():
        ranked = bucketed_global_rank(docs, bucket, order)
        batched = ranked.select(
            "len",
            F.floor((F.col("rk") - 1) / _Q202_BATCH).alias("batch"),
        )
        per_batch = batched.groupBy("batch").agg(
            F.count("*").alias("occ"),
            F.max("len").alias("mx"),
            F.sum("len").alias("toks"),
        )
        parts.append(
            per_batch.agg(
                F.count("*").alias("n_batches"),
                F.sum("toks").alias("n_tokens"),
                F.sum(F.col("occ") * F.col("mx") - F.col("toks")).alias("pad_tokens"),
            ).select(
                F.lit(name).alias("policy"),
                "n_batches",
                "n_tokens",
                "pad_tokens",
                (
                    F.col("pad_tokens")
                    / (F.col("pad_tokens") + F.col("n_tokens")).cast("double")
                ).alias("pad_fraction"),
            )
        )
    return parts[0].unionByName(parts[1]).orderBy("policy")


Q202_SQL = f"""
WITH lens AS (
  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS len
  FROM documents
),
ranked AS (
  SELECT 'len_sorted' AS policy, len,
         (ROW_NUMBER() OVER (ORDER BY len ASC, doc_id ASC) - 1) // {_Q202_BATCH}
           AS batch
  FROM lens
  UNION ALL
  SELECT 'md5_shuffled' AS policy, len,
         (ROW_NUMBER() OVER (
            ORDER BY md5(CAST(doc_id AS VARCHAR)) ASC, doc_id ASC) - 1)
           // {_Q202_BATCH} AS batch
  FROM lens
),
per_batch AS (
  SELECT policy, batch, COUNT(*) AS occ, MAX(len) AS mx, SUM(len) AS toks
  FROM ranked GROUP BY 1, 2
)
SELECT policy, COUNT(*) AS n_batches, SUM(toks) AS n_tokens,
       SUM(occ * mx - toks) AS pad_tokens,
       SUM(occ * mx - toks)
         / CAST(SUM(occ * mx - toks) + SUM(toks) AS DOUBLE) AS pad_fraction
FROM per_batch
GROUP BY policy ORDER BY policy
"""


# --- q204: dedup ROI — token savings per source --------------------------------


def q204_dedup_token_savings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup return-on-investment: if the near-dup clusters (q40's
    LSH -> verify -> connected components pipeline) keep only each
    cluster's min-id document, how many documents and tokens does each
    SOURCE save?  This is the number that justifies (or kills) a dedup
    pass before training.

    A document is removed iff doc_id != its component label (the label
    IS the kept min id), so savings need no per-cluster subquery — one
    join of the CC labels back to (source, token-count), then a
    per-source conditional aggregate.  The single float division yields
    the saved-token fraction.
    Output: (source, n_docs, n_removed, tokens_total, tokens_saved,
    saved_frac), source ascending."""
    from hadoop_jobanalyzer_spark.plans.pipeline_queries import corpus_dedup

    docs = load_tables(spark, sf_dir)["documents"]
    _, cc = corpus_dedup(spark, sf_dir)
    meta = docs.select(
        "doc_id", "source", F.size(F.split("text", " ")).cast("long").alias("toks")
    )
    removed = F.col("id") != F.col("component")
    return (
        meta.join(cc, meta["doc_id"] == cc["id"])
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(removed.cast("long")).alias("n_removed"),
            F.sum("toks").alias("tokens_total"),
            F.sum(F.when(removed, F.col("toks")).otherwise(0)).alias("tokens_saved"),
        )
        .select(
            "source",
            "n_docs",
            "n_removed",
            "tokens_total",
            "tokens_saved",
            (F.col("tokens_saved") / F.col("tokens_total").cast("double")).alias(
                "saved_frac"
            ),
        )
        .orderBy("source")
    )


def _q204_sql() -> str:
    from hadoop_jobanalyzer_spark.plans.pipeline_queries import near_dup_ctes

    return f"""
WITH RECURSIVE {near_dup_ctes()},
edges AS (
  SELECT id_a AS s, id_b AS d FROM verified
  UNION
  SELECT id_b AS s, id_a AS d FROM verified
),
reach(n, m) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT r.n, e.d FROM reach r JOIN edges e ON e.s = r.m
),
comp AS (SELECT n AS doc_id, MIN(m) AS component FROM reach GROUP BY n)
SELECT source, COUNT(*) AS n_docs,
       SUM(CASE WHEN d.doc_id <> component THEN 1 ELSE 0 END) AS n_removed,
       SUM(len(string_split(text, ' '))) AS tokens_total,
       SUM(CASE WHEN d.doc_id <> component
                THEN len(string_split(text, ' ')) ELSE 0 END) AS tokens_saved,
       SUM(CASE WHEN d.doc_id <> component
                THEN len(string_split(text, ' ')) ELSE 0 END)
         / CAST(SUM(len(string_split(text, ' '))) AS DOUBLE) AS saved_frac
FROM documents d JOIN comp ON d.doc_id = comp.doc_id
GROUP BY source ORDER BY source
"""


# --- q205: quality-filter ablation grid ----------------------------------------

_Q205_MIN_CHARS = 200
_Q205_MIN_WORDS = 30


def q205_filter_ablation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-filter ablation grid: the corpus censused under every
    combination of three cheap filters — min length, min word count,
    digit-heaviness (5 * digit_runs <= pre-tokens, the cross-multiplied
    integer form) — so a pipeline owner reads off exactly how many
    documents and tokens each filter (and each interaction) costs before
    turning it on.

    All three flags are codegen expressions on one scan; the grid is one
    aggregate over at most 8 groups.
    Output: (f_len, f_words, f_clean, n_docs, n_tokens), flags desc so
    the fully-passing cell leads."""
    docs = load_tables(spark, sf_dir)["documents"]
    words = F.size(F.split("text", " ")).cast("long")
    digit_runs = F.size(F.regexp_extract_all("text", F.lit("[0-9]+"), 0)).cast("long")
    bpe = F.size(F.regexp_extract_all("text", F.lit(_BPE_RE), 0)).cast("long")
    return (
        docs.select(
            (F.col("n_chars") >= _Q205_MIN_CHARS).alias("f_len"),
            (words >= _Q205_MIN_WORDS).alias("f_words"),
            (digit_runs * 5 <= bpe).alias("f_clean"),
            words.alias("w"),
        )
        .groupBy("f_len", "f_words", "f_clean")
        .agg(F.count("*").alias("n_docs"), F.sum("w").alias("n_tokens"))
        .orderBy(
            F.col("f_len").desc(), F.col("f_words").desc(), F.col("f_clean").desc()
        )
    )


Q205_SQL = f"""
SELECT n_chars >= {_Q205_MIN_CHARS} AS f_len,
       len(string_split(text, ' ')) >= {_Q205_MIN_WORDS} AS f_words,
       len(regexp_extract_all(text, '[0-9]+')) * 5
         <= len(regexp_extract_all(text, '{_BPE_RE}')) AS f_clean,
       COUNT(*) AS n_docs,
       SUM(len(string_split(text, ' '))) AS n_tokens
FROM documents
GROUP BY 1, 2, 3
ORDER BY f_len DESC, f_words DESC, f_clean DESC
"""


# --- q206: training-batch lineage manifest --------------------------------------

_Q206_BATCH = 32


def q206_first_batch_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lineage answer to "what exactly is in training batch 0?": the
    first {_Q206_BATCH} documents of the epoch-0 deterministic shuffle
    (q201's md5 order) with their source, language and token count — the
    sample a debugging session pulls when a loss spike points at one
    batch.

    The rank comes from `util.bucketed_global_rank`; the batch cut
    ``rk <= B`` prunes to {_Q206_BATCH} rows BEFORE the metadata join,
    so the join is a broadcast of the batch, not a corpus shuffle.
    Output: (step, doc_id, source, lang, n_tokens), step ascending."""
    from hadoop_jobanalyzer_spark.util import bucketed_global_rank

    docs = load_tables(spark, sf_dir)["documents"]
    key = F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":0")))
    ranked = bucketed_global_rank(
        docs.select("doc_id", key.alias("k")),
        F.conv(F.col("k").substr(1, 2), 16, 10).cast("long"),
        [F.col("k").asc(), F.col("doc_id").asc()],
        out="step",
    ).filter(F.col("step") <= _Q206_BATCH)
    meta = docs.select(
        "doc_id",
        "source",
        "lang",
        F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
    )
    return (
        F.broadcast(ranked.select("step", "doc_id"))
        .join(meta, "doc_id")
        .select("step", "doc_id", "source", "lang", "n_tokens")
        .orderBy("step")
    )


Q206_SQL = f"""
WITH ranked AS (
  SELECT doc_id,
         ROW_NUMBER() OVER (
           ORDER BY md5(CAST(doc_id AS VARCHAR) || ':0') ASC, doc_id ASC
         ) AS step
  FROM documents
)
SELECT step, d.doc_id, source, lang,
       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
FROM ranked r JOIN documents d ON r.doc_id = d.doc_id
WHERE step <= {_Q206_BATCH}
ORDER BY step
"""


# --- q213: lang x source independence residuals ---------------------------------


def q213_lang_source_residuals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contingency audit of the (lang, source) grid: for every cell, the
    exact integer deviation from independence
    ``dev = obs*N - row_total*col_total`` (positive = lang
    over-represented in that source) plus the squared-residual numerator
    — the chi-square ingredients a corpus-balance monitor tracks without
    ever dividing per cell.

    One corpus aggregate builds the grid; row/col totals come from tiny
    re-aggregations of the grid itself (never a second scan), joined
    back by broadcast. All comparisons stay BIGINT; the normalized
    residual is emitted as exact (num, den) pairs with the single float
    division at the end.
    Output: (lang, source, n_docs, dev, residual), lang/source asc."""
    docs = load_tables(spark, sf_dir)["documents"]
    grid = docs.groupBy("lang", "source").agg(F.count("*").alias("obs"))
    rows_t = grid.groupBy("lang").agg(F.sum("obs").alias("row_t"))
    cols_t = grid.groupBy("source").agg(F.sum("obs").alias("col_t"))
    total = grid.agg(F.sum("obs").alias("n"))
    return (
        grid.join(F.broadcast(rows_t), "lang")
        .join(F.broadcast(cols_t), "source")
        .join(F.broadcast(total))
        .select(
            "lang",
            "source",
            F.col("obs").alias("n_docs"),
            (F.col("obs") * F.col("n") - F.col("row_t") * F.col("col_t")).alias(
                "dev"
            ),
            # (obs - e)/sqrt(e) with e = row*col/n, as one end expression:
            # dev / (n * sqrt(row*col/n))
            (
                (F.col("obs") * F.col("n") - F.col("row_t") * F.col("col_t"))
                / (
                    F.col("n").cast("double")
                    * F.sqrt(
                        F.col("row_t").cast("double")
                        * F.col("col_t").cast("double")
                        / F.col("n").cast("double")
                    )
                )
            ).alias("residual"),
        )
        .orderBy("lang", "source")
    )


Q213_SQL = """
WITH grid AS (
  SELECT lang, source, COUNT(*) AS obs FROM documents GROUP BY 1, 2
),
rows_t AS (SELECT lang, SUM(obs) AS row_t FROM grid GROUP BY 1),
cols_t AS (SELECT source, SUM(obs) AS col_t FROM grid GROUP BY 1),
total AS (SELECT SUM(obs) AS n FROM grid)
SELECT lang, source, obs AS n_docs,
       obs * n - row_t * col_t AS dev,
       (obs * n - row_t * col_t)
         / (CAST(n AS DOUBLE)
            * sqrt(CAST(row_t AS DOUBLE) * CAST(col_t AS DOUBLE)
                   / CAST(n AS DOUBLE))) AS residual
FROM grid
JOIN rows_t USING (lang)
JOIN cols_t USING (source)
CROSS JOIN total
ORDER BY lang, source
"""


# --- q214: customer-value Gini coefficient --------------------------------------


def q214_value_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Gini coefficient of customer lifetime value — the
    inequality number behind q115's Pareto curve, via the rank identity
    G = (2 * sum(i * x_i)) / (n * sum(x)) - (n + 1) / n over
    value-ascending ranks.

    Ranks come from `util.bucketed_global_rank` (bucket = coarse cents
    prefix — no single-partition sort over customers). The rank-weighted
    sum grows as customers^2 x cents and passed 2^63 at x100 data (the
    fleet x100 sweep aborted on the ANSI long SUM), so it accumulates in
    decimal(38,0) — exact, matching the oracle's HUGEINT — and stays an
    internal term: G is computed from the three exact aggregates with
    explicit per-operand double casts, identical in both engines.
    Output: one row (n_customers, total_c, gini)."""
    from hadoop_jobanalyzer_spark.util import bucketed_global_rank

    orders = load_tables(spark, sf_dir)["orders"]
    per_cust = orders.groupBy("o_custkey").agg(
        F.sum(F.floor(F.col("o_totalprice") * 100).cast("long")).alias("m_c")
    )
    ranked = bucketed_global_rank(
        per_cust,
        (F.col("m_c") / 100000).cast("long"),
        [F.col("m_c").asc(), F.col("o_custkey").asc()],
    )
    return ranked.agg(
        F.count("*").alias("n_customers"),
        F.sum("m_c").alias("total_c"),
        F.sum(F.col("rk").cast("decimal(38,0)") * F.col("m_c")).alias("_ws"),
    ).select(
        "n_customers",
        "total_c",
        (
            2.0 * F.col("_ws").cast("double")
            / (F.col("n_customers").cast("double") * F.col("total_c").cast("double"))
            - (F.col("n_customers").cast("double") + 1.0)
            / F.col("n_customers").cast("double")
        ).alias("gini"),
    )


Q214_SQL = """
WITH per_cust AS (
  SELECT o_custkey, SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS m_c
  FROM orders GROUP BY 1
),
ranked AS (
  SELECT m_c,
         ROW_NUMBER() OVER (ORDER BY m_c // 100000 ASC, m_c ASC, o_custkey ASC)
           AS rk
  FROM per_cust
)
SELECT COUNT(*) AS n_customers, SUM(m_c) AS total_c,
       2.0 * CAST(SUM(rk * m_c) AS DOUBLE)
         / (CAST(COUNT(*) AS DOUBLE) * CAST(SUM(m_c) AS DOUBLE))
         - (CAST(COUNT(*) AS DOUBLE) + 1.0) / CAST(COUNT(*) AS DOUBLE) AS gini
FROM ranked
"""


# --- q215: end-to-end clean -> dedup -> mix manifest -----------------------------

_Q215_BUDGET = 300  # post-filter document budget across sources
_Q215_MIN_CHARS = 200


def q215_training_mix_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The capstone pipeline query: quality gate -> near-dup dedup ->
    largest-remainder source caps -> deterministic selection, returning
    the per-source manifest a training run would consume.  Each stage is
    a registered operator elsewhere (q205 flags, q40 clusters, q196
    apportionment, q201 order); this composes them into ONE plan, the
    way the real pipeline ships.

    Stages: (1) docs passing the length gate; (2) of those, keep only
    near-dup cluster keepers (doc_id == CC component — the q112 policy);
    (3) apportion the document budget across sources by surviving token
    mass (Hamilton); (4) within each source take the first `alloc` docs
    in md5 order (seeded, engine-portable).  Selection rank is a window
    PARTITIONED by source (parallel), never a global sort.
    Output: (source, alloc, n_selected, tokens_selected), source asc;
    n_selected == min(alloc, survivors)."""
    from hadoop_jobanalyzer_spark.operators.dedup import near_dup_pairs
    from hadoop_jobanalyzer_spark.operators.graph import connected_components
    from hadoop_jobanalyzer_spark.plans.pipeline_queries import _BANDS, _N_HASHES

    docs = load_tables(spark, sf_dir)["documents"]
    gated = docs.filter(F.col("n_chars") >= _Q215_MIN_CHARS)
    pairs = near_dup_pairs(
        gated, "doc_id", "text",
        n_hashes=_N_HASHES, bands=_BANDS, ngram=3, threshold=0.2,
    ).select("id_a", "id_b")
    # CC over edge ENDPOINTS only (no corpus-sized `nodes` universe): a
    # doc outside every near-dup pair is trivially its own component
    # leader, so the keeper set is exactly gated ∖ losers where losers
    # are the endpoint-scaled rows with id != component. The corpus-wide
    # gated × labels equi-join becomes an anti-join against that small
    # loser table (probe side projected to the three output columns
    # first — §2.3). Pinned shuffle-hash: losers is corpus-scaled in
    # general and rides a materialized-loop estimate (q235 class).
    cc = connected_components(pairs, src="id_a", dst="id_b", id_col="id")
    losers = cc.filter(F.col("id") != F.col("component")).select("id")
    # keepers feeds BOTH the apportionment aggregate and the selection
    # window; materialize it once so the gated scan + anti-join run once,
    # not once per consuming branch.
    keepers = gated.select(
        "doc_id",
        "source",
        F.size(F.split("text", " ")).cast("long").alias("toks"),
    ).join(
        losers.hint("shuffle_hash"),
        F.col("doc_id") == F.col("id"),
        "left_anti",
    ).transform(materialize)
    per_src = keepers.groupBy("source").agg(F.sum("toks").alias("n_tokens"))
    tot = Window.partitionBy()
    rem_rank = Window.partitionBy().orderBy(F.desc("rem"), F.asc("source"))
    alloc = (
        per_src.withColumn("total_t", F.sum("n_tokens").over(tot))
        .withColumn(
            "base",
            F.floor(F.lit(_Q215_BUDGET) * F.col("n_tokens") / F.col("total_t")).cast(
                "long"
            ),
        )
        .withColumn("rem", (F.lit(_Q215_BUDGET) * F.col("n_tokens")) % F.col("total_t"))
        .withColumn("leftover", F.lit(_Q215_BUDGET) - F.sum("base").over(tot))
        .withColumn("rk", F.row_number().over(rem_rank))
        .select(
            "source",
            (
                F.col("base")
                + F.when(F.col("rk") <= F.col("leftover"), 1).otherwise(0)
            ).cast("long").alias("alloc"),
        )
    )
    sel_w = Window.partitionBy("source").orderBy(
        F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":mix"))).asc(),
        F.col("doc_id").asc(),
    )
    selected = (
        keepers.withColumn("sel", F.row_number().over(sel_w).cast("long"))
        .join(F.broadcast(alloc), "source")
        .filter(F.col("sel") <= F.col("alloc"))
    )
    return (
        selected.groupBy("source", "alloc")
        .agg(
            F.count("*").alias("n_selected"),
            F.sum("toks").alias("tokens_selected"),
        )
        .select("source", "alloc", "n_selected", "tokens_selected")
        .orderBy("source")
    )


def _q215_sql() -> str:
    from hadoop_jobanalyzer_spark.plans.pipeline_queries import near_dup_ctes

    # the length gate must apply BEFORE shingling (doc_where), not as a
    # pair post-filter: the max_bucket=1000 band-bucket cap is evaluated on
    # the corpus handed to near_dup_pairs, and a bucket that crosses the cap
    # only in the ungated corpus would yield a different candidate set than
    # the Spark builder's gated population
    return f"""
WITH RECURSIVE {near_dup_ctes(doc_where=f"n_chars >= {_Q215_MIN_CHARS}")},
gated AS (
  SELECT doc_id, source, len(string_split(text, ' ')) AS toks
  FROM documents WHERE n_chars >= {_Q215_MIN_CHARS}
),
edges AS (
  SELECT id_a AS s, id_b AS d FROM verified
  UNION
  SELECT id_b AS s, id_a AS d FROM verified
),
reach(n, m) AS (
  SELECT doc_id, doc_id FROM gated
  UNION
  SELECT r.n, e.d FROM reach r JOIN edges e ON e.s = r.m
),
comp AS (SELECT n AS doc_id, MIN(m) AS component FROM reach GROUP BY n),
keepers AS (
  SELECT g.doc_id, g.source, CAST(g.toks AS BIGINT) AS toks
  FROM gated g JOIN comp ON g.doc_id = comp.doc_id
  WHERE comp.doc_id = comp.component
),
per_src AS (SELECT source, SUM(toks) AS n_tokens FROM keepers GROUP BY 1),
calc AS (
  SELECT source, n_tokens,
         ({_Q215_BUDGET} * n_tokens) // SUM(n_tokens) OVER () AS base,
         ({_Q215_BUDGET} * n_tokens) % SUM(n_tokens) OVER () AS rem
  FROM per_src
),
alloc AS (
  SELECT source,
         CAST(base + CASE WHEN ROW_NUMBER() OVER (ORDER BY rem DESC, source ASC)
                    <= {_Q215_BUDGET} - SUM(base) OVER () THEN 1 ELSE 0 END
         AS BIGINT) AS alloc
  FROM calc
),
ranked AS (
  SELECT k.*, alloc.alloc,
         ROW_NUMBER() OVER (
           PARTITION BY k.source
           ORDER BY md5(CAST(k.doc_id AS VARCHAR) || ':mix') ASC, k.doc_id ASC
         ) AS sel
  FROM keepers k JOIN alloc USING (source)
)
SELECT source, alloc, COUNT(*) AS n_selected, SUM(toks) AS tokens_selected
FROM ranked WHERE sel <= alloc
GROUP BY source, alloc
ORDER BY source
"""


CORPUS_QUERIES = {
    "q194_source_tv_distance": (q194_source_tv_distance, Q194_SQL),
    "q195_token_fertility": (q195_token_fertility, Q195_SQL),
    "q196_mixing_apportionment": (q196_mixing_apportionment, Q196_SQL),
    "q197_lpa_communities": (q197_lpa_communities, Q197_SQL),
    "q198_inverted_index": (q198_inverted_index, Q198_SQL),
    "q201_epoch_shuffle_audit": (q201_epoch_shuffle_audit, Q201_SQL),
    "q202_batch_padding_efficiency": (q202_batch_padding_efficiency, Q202_SQL),
    "q204_dedup_token_savings": (q204_dedup_token_savings, _q204_sql()),
    "q205_filter_ablation": (q205_filter_ablation, Q205_SQL),
    "q206_first_batch_manifest": (q206_first_batch_manifest, Q206_SQL),
    "q213_lang_source_residuals": (q213_lang_source_residuals, Q213_SQL),
    "q214_value_gini": (q214_value_gini, Q214_SQL),
    "q215_training_mix_manifest": (q215_training_mix_manifest, _q215_sql()),
}
