"""Training-data-pipeline queries: dedup, text analysis, similarity search,
multimodal metadata — each as (Spark builder, DuckDB oracle) like the core
set. The builders delegate to the operator/function modules (the real engine
surface); the oracles restate them in DuckDB's list/lambda SQL dialect.

Engine-portability notes (why these hash-match DuckDB):
* every hash is md5 (never engine-native hash functions);
* float folds are sequential left-folds in both engines (verified: both
  collapse [1e16, 1, -1e16] to 0.0);
* LSH signatures use integer-quantized dot products — exact, no sign flips;
* ratios divide exact integers and round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_jobanalyzer_spark.functions.text import (
    LANG_MARKERS,
    avg_token_len,
    bow_fingerprint,
    distinct_token_count,
    lang_id,
    simhash_table,
    stopword_ratio,
    token_count,
    tokens,
    winnow_fingerprints,
)
from hadoop_jobanalyzer_spark.operators.dedup import (
    exact_duplicates,
    lsh_candidate_pairs,
    near_dup_pairs,
    ngram_jaccard_pairs,
)
from hadoop_jobanalyzer_spark.operators.multimodal import attach_payload, payload_meta
from hadoop_jobanalyzer_spark.operators.similarity import (
    embedding_near_dup_pairs,
    knn_brute_force,
    knn_ivf_assigned,
    knn_ivf_cell,
    knn_lsh_multiprobe,
    lsh_buckets,
)
from hadoop_jobanalyzer_spark.functions.vectors import hyperplanes
from hadoop_jobanalyzer_spark.plans.tables import load_tables
from hadoop_jobanalyzer_spark.util import spread

_WORDS = "string_split(text, ' ')"
_SHINGLES_CTE = f"""
words AS (SELECT doc_id, {_WORDS} AS w FROM documents),
sh AS (SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS s
       FROM words, UNNEST(generate_series(1, len(w) - 2)) AS t(i))
"""


# --- dedup -------------------------------------------------------------------


def q20_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return exact_duplicates(t["documents"], "doc_id", "text")


Q20_SQL = """
SELECT doc_id, md5(text) AS text_hash,
       doc_id = MIN(doc_id) OVER (PARTITION BY md5(text)) AS is_keeper
FROM documents ORDER BY doc_id
"""


def q21_dedup_bow_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    key = bow_fingerprint(tokens("text"))
    return exact_duplicates(t["documents"], "doc_id", "text", key=key)


Q21_SQL = f"""
WITH fp AS (
  SELECT doc_id,
         md5(array_to_string(list_sort(list_distinct({_WORDS})), ' ')) AS text_hash
  FROM documents
)
SELECT doc_id, text_hash,
       doc_id = MIN(doc_id) OVER (PARTITION BY text_hash) AS is_keeper
FROM fp ORDER BY doc_id
"""


def q22_ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return ngram_jaccard_pairs(t["documents"], "doc_id", "text", ngram=3, threshold=0.2)


Q22_SQL = f"""
WITH {_SHINGLES_CTE},
sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
-- stop-shingle cap: mirror the operator's default max_bucket=1000
keep AS (SELECT s FROM sh GROUP BY s HAVING COUNT(*) <= 1000),
common AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_common
  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
  WHERE a.s IN (SELECT s FROM keep)
  GROUP BY 1, 2
)
SELECT id_a, id_b, n_common, sa.n AS n_a, sb.n AS n_b,
       ROUND(n_common / (sa.n + sb.n - n_common), 3) AS jaccard
FROM common
JOIN sizes sa ON id_a = sa.doc_id
JOIN sizes sb ON id_b = sb.doc_id
WHERE ROUND(n_common / (sa.n + sb.n - n_common), 3) >= 0.2
ORDER BY id_a, id_b
"""

_N_HASHES = 8
_BANDS = 4  # 4 bands x 2 rows over 8 minhashes


def q23_minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return lsh_candidate_pairs(
        t["documents"], "doc_id", "text", n_hashes=_N_HASHES, bands=_BANDS, ngram=3
    )


def _q23_sql() -> str:
    from hadoop_jobanalyzer_spark.operators.dedup import MINHASH_P, _minhash_params

    mins = ", ".join(
        f"MIN(({a} * h + {b}) % {MINHASH_P}) AS mh{i}"
        for i, (a, b) in enumerate(_minhash_params(_N_HASHES))
    )
    rows = _N_HASHES // _BANDS
    bands = " UNION ALL ".join(
        "SELECT doc_id, {b} AS band, {concat} AS bh FROM m".format(
            b=b,
            concat=" || '|' || ".join(f"mh{b * rows + r}" for r in range(rows)),
        )
        for b in range(_BANDS)
    )
    return f"""
WITH {_SHINGLES_CTE},
hashed AS (SELECT doc_id, ('0x' || substr(md5(s), 1, 8))::BIGINT % {MINHASH_P} AS h FROM sh),
m AS (SELECT doc_id, {mins} FROM hashed GROUP BY doc_id),
banded AS ({bands})
SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_shared_bands
FROM banded a
JOIN banded b ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id
GROUP BY 1, 2
ORDER BY id_a, id_b
"""


def q34_dedup_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The production-scale dedup composition: LSH candidates -> exact
    Jaccard verify (only candidate pairs ever expand shingles)."""
    t = load_tables(spark, sf_dir)
    return near_dup_pairs(
        t["documents"], "doc_id", "text", n_hashes=_N_HASHES, bands=_BANDS, ngram=3, threshold=0.2
    )


def near_dup_ctes() -> str:
    """The WITH-body (CTE chain) computing LSH-verified near-dup pairs —
    shared by the q34 oracle and the q40 clustering oracle (which adds a
    recursive connected-components CTE on top)."""
    from hadoop_jobanalyzer_spark.operators.dedup import MINHASH_P, _minhash_params

    mins = ", ".join(
        f"MIN(({a} * h + {b}) % {MINHASH_P}) AS mh{i}"
        for i, (a, b) in enumerate(_minhash_params(_N_HASHES))
    )
    rows = _N_HASHES // _BANDS
    bands = " UNION ALL ".join(
        "SELECT doc_id, {b} AS band, {concat} AS bh FROM m".format(
            b=b,
            concat=" || '|' || ".join(f"mh{b * rows + r}" for r in range(rows)),
        )
        for b in range(_BANDS)
    )
    return f"""{_SHINGLES_CTE},
hashed AS (SELECT doc_id, ('0x' || substr(md5(s), 1, 8))::BIGINT % {MINHASH_P} AS h FROM sh),
m AS (SELECT doc_id, {mins} FROM hashed GROUP BY doc_id),
banded AS ({bands}),
cands AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_shared_bands
  FROM banded a JOIN banded b ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
common AS (
  SELECT c.id_a, c.id_b, c.n_shared_bands, COUNT(*) AS n_common
  FROM cands c
  JOIN sh sa ON sa.doc_id = c.id_a
  JOIN sh sb ON sb.doc_id = c.id_b AND sb.s = sa.s
  GROUP BY 1, 2, 3
),
verified AS (
  SELECT id_a, id_b, n_shared_bands, n_common, sa.n AS n_a, sb.n AS n_b,
         ROUND(n_common / (sa.n + sb.n - n_common), 3) AS jaccard
  FROM common
  JOIN sizes sa ON id_a = sa.doc_id
  JOIN sizes sb ON id_b = sb.doc_id
  WHERE ROUND(n_common / (sa.n + sb.n - n_common), 3) >= 0.2
)"""


def _q34_sql() -> str:
    return f"""
WITH {near_dup_ctes()}
SELECT * FROM verified ORDER BY id_a, id_b
"""


# --- text analysis -----------------------------------------------------------

_STOPWORDS = ["the", "a"]


def q24_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    w = tokens("text")
    return (
        spread(t["documents"])
        .select(
            "doc_id",
            F.length("text").alias("n_chars"),
            token_count(w).alias("n_tokens"),
            distinct_token_count(w).alias("n_distinct"),
            F.round(avg_token_len(w), 3).alias("avg_token_len"),
            F.round(stopword_ratio(w, _STOPWORDS), 3).alias("stopword_ratio"),
        )
        .orderBy("doc_id")
    )


Q24_SQL = f"""
WITH words AS (SELECT doc_id, text, {_WORDS} AS w FROM documents)
SELECT doc_id,
       LENGTH(text) AS n_chars,
       LEN(w) AS n_tokens,
       LEN(list_distinct(w)) AS n_distinct,
       ROUND(CAST(list_sum(list_transform(w, x -> LENGTH(x))) AS DOUBLE) / LEN(w), 3) AS avg_token_len,
       ROUND(CAST(LEN(list_filter(w, x -> x IN ('the', 'a'))) AS DOUBLE) / LEN(w), 3) AS stopword_ratio
FROM words ORDER BY doc_id
"""


def q25_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    w = tokens("text")
    return (
        spread(t["documents"])
        .select("lang", lang_id(w).alias("predicted"))
        .groupBy("lang", "predicted")
        .agg(F.count("*").alias("n"))
        .orderBy("lang", "predicted")
    )


def _q25_sql() -> str:
    langs = list(LANG_MARKERS)
    scores = ", ".join(
        "LEN(list_intersect(w, {lst})) AS s_{lang}".format(
            lst="[" + ", ".join(f"'{m}'" for m in LANG_MARKERS[lang]) + "]", lang=lang
        )
        for lang in langs
    )
    cases = " ".join(
        "WHEN "
        + " AND ".join(f"s_{lang} >= s_{o}" for o in langs if o != lang)
        + f" THEN '{lang}'"
        for lang in langs[:-1]
    )
    return f"""
WITH words AS (SELECT doc_id, lang, {_WORDS} AS w FROM documents),
scored AS (SELECT doc_id, lang, {scores} FROM words)
SELECT lang, CASE {cases} ELSE '{langs[-1]}' END AS predicted, COUNT(*) AS n
FROM scored GROUP BY 1, 2 ORDER BY lang, predicted
"""


def q26_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return simhash_table(t["documents"], "doc_id", "text").orderBy("doc_id")


def _q26_sql() -> str:
    terms = " + ".join(
        f"(CASE WHEN list_sum(list_transform(h, v -> CASE WHEN ((v >> {k}) & 1) = 1 "
        f"THEN 1 ELSE -1 END)) >= 0 THEN CAST({2**k} AS BIGINT) ELSE 0 END)"
        for k in range(32)
    )
    return f"""
WITH words AS (SELECT doc_id, list_distinct({_WORDS}) AS w FROM documents),
th AS (SELECT doc_id,
       list_transform(w, x -> ('0x' || substr(md5(x), 1, 8))::BIGINT) AS h
       FROM words)
SELECT doc_id, {terms} AS simhash
FROM th ORDER BY doc_id
"""


# --- similarity search -------------------------------------------------------

_COS_SQL = """
ROUND(
  list_sum(list_transform(list_zip(e.embedding::DOUBLE[], q.qv), x -> x[1] * x[2]))
  / sqrt(list_sum(list_transform(e.embedding::DOUBLE[], x -> x * x))
         * list_sum(list_transform(q.qv, x -> x * x)))
, 4)"""


def q27_knn_brute_force(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return knn_brute_force(t["embeddings"], "vec_id", "embedding", query_id=0, k=10)


Q27_SQL = f"""
WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0)
SELECT vec_id, {_COS_SQL} AS cos_sim
FROM embeddings e, q
WHERE vec_id != 0
ORDER BY cos_sim DESC, vec_id
LIMIT 10
"""

_PLANES = hyperplanes(8, 64, seed=7)


def q28_lsh_bucket_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return (
        lsh_buckets(t["embeddings"], "vec_id", "embedding", n_planes=8, dim=64)
        .groupBy("bucket")
        .agg(F.count("*").alias("n_vecs"))
        .orderBy("bucket")
    )


def _q28_sql() -> str:
    terms = []
    for i, plane in enumerate(_PLANES):
        arr = "[" + ", ".join(str(v) for v in plane) + "]::BIGINT[]"
        terms.append(
            f"(CASE WHEN list_sum(list_transform(list_zip(embedding::DOUBLE[], {arr}), "
            f"x -> CAST(ROUND(x[1] * 1000) AS BIGINT) * x[2])) >= 0 "
            f"THEN CAST({2**i} AS BIGINT) ELSE 0 END)"
        )
    bucket = " + ".join(terms)
    return f"""
SELECT ({bucket}) AS bucket, COUNT(*) AS n_vecs
FROM embeddings GROUP BY 1 ORDER BY bucket
"""


def q29_knn_ivf_cell(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return knn_ivf_cell(
        t["embeddings"], "vec_id", "embedding", cell_col="label", query_id=0, k=5
    )


Q29_SQL = f"""
WITH q AS (SELECT embedding::DOUBLE[] AS qv, label AS ql FROM embeddings WHERE vec_id = 0)
SELECT vec_id, {_COS_SQL} AS cos_sim
FROM embeddings e, q
WHERE e.label = q.ql AND vec_id != 0
ORDER BY cos_sim DESC, vec_id
LIMIT 5
"""


# --- document fingerprinting (winnowing / rolling-hash family) --------------


def q31_winnow_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return winnow_fingerprints(t["documents"], "doc_id", "text", ngram=3, window=4).orderBy(
        "doc_id", "fp"
    )


_WINNOW_W = 4

Q31_SQL = f"""
WITH words AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
hashes AS (
  SELECT doc_id,
         list_transform(generate_series(1, len(w) - 2),
                        i -> ('0x' || substr(md5(w[i] || ' ' || w[i+1] || ' ' || w[i+2]), 1, 8))::BIGINT) AS h
  FROM words WHERE len(w) >= 3
),
fps AS (
  SELECT doc_id,
         CASE WHEN len(h) >= {_WINNOW_W}
              THEN list_distinct(list_transform(generate_series(1, len(h) - {_WINNOW_W} + 1),
                                                i -> list_min(list_slice(h, i, i + {_WINNOW_W} - 1))))
              ELSE [list_min(h)] END AS fp
  FROM hashes WHERE len(h) > 0
)
SELECT doc_id, UNNEST(fp) AS fp FROM fps ORDER BY doc_id, fp
"""


# --- embedding-cosine near-dup (IVF-cell bounded) ----------------------------


def q32_embedding_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return embedding_near_dup_pairs(
        t["embeddings"], "vec_id", "embedding", threshold=0.4, cell_col="label"
    )


Q32_SQL = """
WITH b AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
p AS (
  SELECT a.vec_id AS id_a, c.vec_id AS id_b,
         ROUND(list_sum(list_transform(list_zip(a.v, c.v), x -> x[1] * x[2]))
               / sqrt(list_sum(list_transform(a.v, x -> x * x))
                      * list_sum(list_transform(c.v, x -> x * x))), 4) AS cos_sim
  FROM b a JOIN b c ON a.label = c.label AND a.vec_id < c.vec_id
)
SELECT id_a, id_b, cos_sim FROM p WHERE cos_sim >= 0.4 ORDER BY id_a, id_b
"""


# --- BPE-ish regex token counting -------------------------------------------

_BPE_RE = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"


def q33_regex_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-tokenizer-style counting: alpha runs, digit runs, and single
    non-alphanumeric marks — the BPE-ish regex segmentation of the task
    brief, counted per doc entirely JVM-side."""
    t = load_tables(spark, sf_dir)
    all_tokens = F.regexp_extract_all("text", F.lit(_BPE_RE), 0)
    alpha = F.regexp_extract_all("text", F.lit("[A-Za-z]+"), 0)
    digit = F.regexp_extract_all("text", F.lit("[0-9]+"), 0)
    return (
        spread(t["documents"])
        .select(
            "doc_id",
            F.size(all_tokens).alias("n_bpe_tokens"),
            F.size(alpha).alias("n_alpha_runs"),
            F.size(digit).alias("n_digit_runs"),
        )
        .orderBy("doc_id")
    )


Q33_SQL = f"""
SELECT doc_id,
       len(regexp_extract_all(text, '{_BPE_RE}')) AS n_bpe_tokens,
       len(regexp_extract_all(text, '[A-Za-z]+')) AS n_alpha_runs,
       len(regexp_extract_all(text, '[0-9]+')) AS n_digit_runs
FROM documents ORDER BY doc_id
"""


# --- multimodal --------------------------------------------------------------


def q60_knn_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-probe LSH ANN: the query's bucket plus all Hamming-1 buckets
    (operators/similarity.knn_lsh_multiprobe)."""
    t = load_tables(spark, sf_dir)
    return knn_lsh_multiprobe(
        t["embeddings"], "vec_id", "embedding", query_id=0, k=10, n_planes=8, dim=64
    )


def _q60_sql() -> str:
    terms = []
    for i, plane in enumerate(_PLANES):
        arr = "[" + ", ".join(str(v) for v in plane) + "]::BIGINT[]"
        terms.append(
            f"(CASE WHEN list_sum(list_transform(list_zip(embedding::DOUBLE[], {arr}), "
            f"x -> CAST(ROUND(x[1] * 1000) AS BIGINT) * x[2])) >= 0 "
            f"THEN CAST({2**i} AS BIGINT) ELSE 0 END)"
        )
    bucket = " + ".join(terms)
    probe_dists = ", ".join(str(m) for m in [0] + [2**i for i in range(8)])
    return f"""
WITH b AS (SELECT vec_id, ({bucket}) AS bucket FROM embeddings),
qb AS (SELECT bucket AS qbucket FROM b WHERE vec_id = 0),
cand AS (SELECT vec_id FROM b, qb WHERE xor(bucket, qbucket) IN ({probe_dists})),
q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0)
SELECT e.vec_id, {_COS_SQL} AS cos_sim
FROM embeddings e JOIN cand USING (vec_id), q
WHERE e.vec_id != 0
ORDER BY cos_sim DESC, vec_id
LIMIT 10
"""


def q61_knn_ivf_assigned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN over a *computed* nearest-centroid assignment (no pre-labeled
    cell column — operators/similarity.assign_cells)."""
    t = load_tables(spark, sf_dir)
    return knn_ivf_assigned(
        t["embeddings"], "vec_id", "embedding", query_id=0, k=5, n_cells=16
    )


Q61_SQL = f"""
WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS vv FROM embeddings),
cents AS (SELECT vec_id AS cid, vv AS cv FROM v ORDER BY vec_id LIMIT 16),
scored AS (
  SELECT v.vec_id, c.cid,
         ROUND(list_sum(list_transform(list_zip(v.vv, c.cv), x -> x[1] * x[2]))
               / sqrt(list_sum(list_transform(v.vv, x -> x * x))
                      * list_sum(list_transform(c.cv, x -> x * x))), 6) AS cos
  FROM v CROSS JOIN cents c
),
cells AS (
  SELECT vec_id, cid AS cell FROM (
    SELECT vec_id, cid,
           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cos DESC, cid) AS rn
    FROM scored) WHERE rn = 1
),
qcell AS (SELECT cell AS qc FROM cells WHERE vec_id = 0),
q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0)
SELECT e.vec_id, {_COS_SQL} AS cos_sim
FROM embeddings e JOIN cells USING (vec_id), qcell, q
WHERE cells.cell = qcell.qc AND e.vec_id != 0
ORDER BY cos_sim DESC, vec_id
LIMIT 5
"""


def q30_payload_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload metadata via the Arrow/mapInPandas plumbing (the
    corpus is ASCII, so the byte-level oracle can restate it in SQL).

    The sort runs *before* the pandas stage: range-partitioning samples its
    child, so sorting after mapInPandas would execute the Python stage
    twice; mapInPandas preserves per-partition row order, so the output
    stays globally ordered."""
    t = load_tables(spark, sf_dir)
    return payload_meta(attach_payload(t["documents"].orderBy("doc_id"), "doc_id", "text"))


Q30_SQL = """
SELECT doc_id,
       octet_length(encode(text)) AS payload_len,
       lower(hex(encode(substr(text, 1, 4)))) AS header_hex
FROM documents ORDER BY doc_id
"""


PIPELINE_QUERIES: dict[str, tuple] = {
    "q20_dedup_exact": (q20_dedup_exact, Q20_SQL),
    "q21_dedup_bow_fingerprint": (q21_dedup_bow_fingerprint, Q21_SQL),
    "q22_ngram_jaccard_pairs": (q22_ngram_jaccard_pairs, Q22_SQL),
    "q23_minhash_lsh_pairs": (q23_minhash_lsh_pairs, _q23_sql()),
    "q24_text_quality": (q24_text_quality, Q24_SQL),
    "q25_lang_id": (q25_lang_id, _q25_sql()),
    "q26_simhash": (q26_simhash, _q26_sql()),
    "q27_knn_brute_force": (q27_knn_brute_force, Q27_SQL),
    "q28_lsh_bucket_histogram": (q28_lsh_bucket_histogram, _q28_sql()),
    "q29_knn_ivf_cell": (q29_knn_ivf_cell, Q29_SQL),
    "q60_knn_multiprobe": (q60_knn_multiprobe, _q60_sql()),
    "q61_knn_ivf_assigned": (q61_knn_ivf_assigned, Q61_SQL),
    "q30_payload_meta": (q30_payload_meta, Q30_SQL),
    "q31_winnow_fingerprints": (q31_winnow_fingerprints, Q31_SQL),
    "q32_embedding_near_dups": (q32_embedding_near_dups, Q32_SQL),
    "q33_regex_token_counts": (q33_regex_token_counts, Q33_SQL),
    "q34_dedup_pipeline": (q34_dedup_pipeline, _q34_sql()),
}
