"""Unit tests for BM25 retrieval and boilerplate n-gram analysis on
planted corpora (the synthetic documents table is covered by the q80/q81
oracle differentials)."""

import pytest
from pyspark.sql import functions as F

from hadoop_jobanalyzer_spark.operators.dedup import boilerplate_ngram_fraction
from hadoop_jobanalyzer_spark.operators.retrieval import bm25_topk


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_bm25_ranks_rare_term_doc_first(spark):
    # 'zebra' appears in one doc, 'the' in all: the zebra doc must win.
    df = _docs(
        spark,
        [
            (1, "the cat sat on the mat"),
            (2, "the zebra runs"),
            (3, "the dog barks at the cat"),
            (4, "nothing relevant here at all"),
        ],
    )
    out = bm25_topk(df, "doc_id", "text", ["zebra", "the"], k=10).collect()
    assert out[0]["doc_id"] == 2
    # doc 4 has zero tf for every query term -> excluded by score > 0
    assert 4 not in {r["doc_id"] for r in out}
    # tf columns are real counts
    by_id = {r["doc_id"]: r for r in out}
    assert by_id[1]["tf_the"] == 2 and by_id[1]["tf_zebra"] == 0
    assert by_id[2]["tf_zebra"] == 1


def test_bm25_deterministic_and_k_bounded(spark):
    df = _docs(spark, [(i, "a b c a") for i in range(20)])
    out1 = [r["doc_id"] for r in bm25_topk(df, "doc_id", "text", ["a"], k=5).collect()]
    out2 = [r["doc_id"] for r in bm25_topk(df, "doc_id", "text", ["a"], k=5).collect()]
    assert out1 == out2 and len(out1) == 5
    # identical scores -> tiebreak by doc_id ascending
    assert out1 == [0, 1, 2, 3, 4]


def test_bm25_requires_terms(spark):
    df = _docs(spark, [(1, "x")])
    with pytest.raises(ValueError):
        bm25_topk(df, "doc_id", "text", [])


def test_boilerplate_fraction_planted(spark):
    # template '<a b c d>' shared by 5 docs; doc 99 is fully unique.
    template = "a b c d"
    rows = [(i, template) for i in range(5)] + [(99, "p q r s t")]
    out = {
        r["doc_id"]: r
        for r in boilerplate_ngram_fraction(
            _docs(spark, rows), "doc_id", "text", ngram=3, min_df=5
        ).collect()
    }
    # each template doc: 2 trigrams, both in >=5 docs -> frac 1.0
    for i in range(5):
        assert out[i]["n_ngrams"] == 2 and out[i]["boiler_frac"] == 1.0
    # unique doc: 3 trigrams, none boilerplate
    assert out[99]["n_boiler"] == 0 and out[99]["boiler_frac"] == 0.0


def test_boilerplate_min_df_counts_distinct_docs(spark):
    # the same trigram 10x inside ONE doc must not count as df=10
    rows = [(1, " ".join(["x y z"] * 10)), (2, "u v w u v")]
    out = {
        r["doc_id"]: r
        for r in boilerplate_ngram_fraction(
            _docs(spark, rows), "doc_id", "text", ngram=3, min_df=2
        ).collect()
    }
    assert out[1]["n_boiler"] == 0 and out[2]["n_boiler"] == 0


def test_boilerplate_short_docs_dropped(spark):
    # a doc shorter than the ngram has no rows (n_ngrams = 0 filtered)
    out = boilerplate_ngram_fraction(
        _docs(spark, [(1, "a b"), (2, "a b c d")]), "doc_id", "text", ngram=3, min_df=2
    ).collect()
    assert {r["doc_id"] for r in out} == {2}


def test_key_skew_profile_planted(spark):
    from hadoop_jobanalyzer_spark.operators.skew import key_skew_profile

    # 90 rows of key 7, 10 singletons (100..109) -> 11 keys, mean 100/11
    rows = [(7,)] * 90 + [(i,) for i in range(100, 110)]
    df = spark.createDataFrame(rows, "user_id long")
    out = key_skew_profile(df, "user_id", top_n=3).collect()
    assert out[0]["key_value"] == "7" and out[0]["n"] == 90
    assert abs(out[0]["share"] - 0.9) < 1e-9
    assert abs(out[0]["x_mean"] - round(90 * 11 / 100, 3)) < 1e-9
    # singletons tie at n=1 -> deterministic key_value tiebreak
    assert [r["key_value"] for r in out[1:]] == ["100", "101"]
