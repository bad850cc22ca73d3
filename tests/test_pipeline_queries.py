"""Differential + unit tests for the training-data-pipeline operators."""

import pytest
from pyspark.sql import functions as F

from hadoop_jobanalyzer_spark.operators.multimodal import (
    attach_payload,
    fake_image_features,
)
from hadoop_jobanalyzer_spark.operators.similarity import knn_brute_force, knn_lsh
from hadoop_jobanalyzer_spark.plans.pipeline_queries import PIPELINE_QUERIES
from hadoop_jobanalyzer_spark.plans.tables import load_tables

from tests.oracle_utils import compare, driver_sql, duck_connect


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duck_connect(sf_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(PIPELINE_QUERIES))
def test_pipeline_query_matches_oracle(spark, sf_dir, duck, name):
    fn, _ = PIPELINE_QUERIES[name]
    sql = driver_sql(name)
    problems = compare(fn(spark, sf_dir), duck, sql)
    assert not problems, f"{name}: {problems}"


@pytest.mark.parametrize("name", sorted(PIPELINE_QUERIES))
def test_pipeline_query_nonempty(spark, sf_dir, name):
    fn, _ = PIPELINE_QUERIES[name]
    assert fn(spark, sf_dir).count() > 0, f"{name} returned no rows at {sf_dir}"


def test_lsh_candidates_catch_jaccard_dups(spark, sf_dir):
    """Near-dup pairs found by exact Jaccard should overlap LSH candidates
    (recall sanity — not exact, LSH is probabilistic by design)."""
    jac_fn, _ = PIPELINE_QUERIES["q22_ngram_jaccard_pairs"]
    lsh_fn, _ = PIPELINE_QUERIES["q23_minhash_lsh_pairs"]
    jac = {(r["id_a"], r["id_b"]) for r in jac_fn(spark, sf_dir).collect()}
    lsh = {(r["id_a"], r["id_b"]) for r in lsh_fn(spark, sf_dir).collect()}
    assert jac, "expected planted near-dup pairs in the corpus"
    recall = len(jac & lsh) / len(jac)
    assert recall >= 0.8, f"LSH recall {recall:.2f} over {len(jac)} true pairs"


def test_max_bucket_bounds_degenerate_corpus(spark):
    """A corpus of identical docs is the O(n^2) worst case: every shingle's
    posting list is the whole corpus. The default stop-shingle cap must keep
    the pair fan-out bounded; opting out (max_bucket=None) restores the
    exact all-pairs expansion."""
    from hadoop_jobanalyzer_spark.operators.dedup import (
        lsh_candidate_pairs,
        ngram_jaccard_pairs,
    )

    n = 12
    docs = spark.createDataFrame(
        [(i, "alpha beta gamma delta epsilon zeta eta theta") for i in range(n)],
        ["doc_id", "text"],
    )
    # capped: every posting list has 12 > 4 docs -> all dropped -> no pairs
    assert ngram_jaccard_pairs(docs, "doc_id", "text", max_bucket=4).count() == 0
    assert lsh_candidate_pairs(docs, "doc_id", "text", max_bucket=4).count() == 0
    # opt-out: full n*(n-1)/2 expansion
    full = ngram_jaccard_pairs(docs, "doc_id", "text", max_bucket=None)
    assert full.count() == n * (n - 1) // 2


def test_simhash_banding_is_pigeonhole_exact(spark, sf_dir):
    """With 4 bands over 32 bits, a pair at Hamming <= 3 must agree on at
    least one band (pigeonhole), so uncapped banded blocking finds EXACTLY
    the pairs a brute-force all-pairs Hamming scan finds."""
    from hadoop_jobanalyzer_spark.functions.text import simhash_table
    from hadoop_jobanalyzer_spark.operators.dedup import simhash_near_dup_pairs
    from hadoop_jobanalyzer_spark.plans.tables import load_tables

    docs = load_tables(spark, sf_dir)["documents"].filter("doc_id < 200")
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in simhash_near_dup_pairs(
            docs, "doc_id", "text", max_bucket=None
        ).collect()
    }
    fps = {r["doc_id"]: r["simhash"] for r in simhash_table(docs, "doc_id", "text").collect()}
    ids = sorted(fps)
    want = {
        (a, b): bin(fps[a] ^ fps[b]).count("1")
        for i, a in enumerate(ids)
        for b in ids[i + 1 :]
        if bin(fps[a] ^ fps[b]).count("1") <= 3
    }
    assert got == want
    assert want, "expected planted near-dups within Hamming 3"


def test_simhash_near_dup_pairs_validates_bands():
    from hadoop_jobanalyzer_spark.operators.dedup import simhash_near_dup_pairs

    with pytest.raises(ValueError, match="divide 32"):
        simhash_near_dup_pairs(None, "doc_id", "text", bands=5)


def test_simhash_max_bucket_bounds_degenerate_corpus(spark):
    """Identical docs collapse every band slice into one giant bucket; the
    default cap must drop it (bounded fan-out), opt-out restores all pairs."""
    from hadoop_jobanalyzer_spark.operators.dedup import simhash_near_dup_pairs

    n = 12
    docs = spark.createDataFrame(
        [(i, "alpha beta gamma delta epsilon zeta eta theta") for i in range(n)],
        ["doc_id", "text"],
    )
    assert simhash_near_dup_pairs(docs, "doc_id", "text", max_bucket=4).count() == 0
    full = simhash_near_dup_pairs(docs, "doc_id", "text", max_bucket=None)
    rows = full.collect()
    assert len(rows) == n * (n - 1) // 2
    assert all(r["hamming"] == 0 and r["n_shared_bands"] == 4 for r in rows)


def test_knn_lsh_overlaps_brute_force(spark, sf_dir):
    t = load_tables(spark, sf_dir)
    bf = [r["vec_id"] for r in knn_brute_force(t["embeddings"], "vec_id", "embedding", 0, k=10).collect()]
    ann = [r["vec_id"] for r in knn_lsh(t["embeddings"], "vec_id", "embedding", 0, k=10).collect()]
    assert ann, "LSH bucket should contain candidates"
    # every ANN hit must be a real vector, and ANN's top hit should rank
    # among brute force's top-10 more often than not (probe, not a law)
    assert set(ann).isdisjoint({0})


def test_multiprobe_recall_dominates_single_bucket(spark, sf_dir):
    """Hamming-1 probing must search a superset of the single bucket, so
    its top-k cosine floor is >= single-bucket's and both are bounded by
    brute force."""
    from hadoop_jobanalyzer_spark.operators.similarity import knn_lsh_multiprobe

    t = load_tables(spark, sf_dir)
    emb = t["embeddings"]
    bf = {r["vec_id"]: r["cos_sim"] for r in knn_brute_force(emb, "vec_id", "embedding", 0, k=10).collect()}
    single = [r["cos_sim"] for r in knn_lsh(emb, "vec_id", "embedding", 0, k=10).collect()]
    multi = [r["cos_sim"] for r in knn_lsh_multiprobe(emb, "vec_id", "embedding", 0, k=10).collect()]
    assert len(multi) >= len(single)
    if single and multi:
        assert min(multi) >= min(single) or len(multi) > len(single)
    # every multiprobe hit is bounded by the true max
    assert max(multi) <= max(bf.values())


def test_assign_cells_covers_corpus(spark, sf_dir):
    """Every vector gets exactly one cell; centroid vectors map to their
    own cell (cosine(v, v) = 1 beats any other centroid)."""
    from hadoop_jobanalyzer_spark.operators.similarity import assign_cells

    t = load_tables(spark, sf_dir)
    emb = t["embeddings"]
    cells = assign_cells(emb, "vec_id", "embedding", n_cells=8)
    assert cells.count() == emb.count()
    own = {r["vec_id"]: r["cell"] for r in cells.filter(F.col("vec_id") < 8).collect()}
    assert own == {i: i for i in range(8)}


def test_multimodal_fake_features(spark, sf_dir):
    t = load_tables(spark, sf_dir)
    payloads = attach_payload(t["documents"].limit(20), "doc_id", "text")
    feats = fake_image_features(payloads).collect()
    assert len(feats) == 20
    for r in feats:
        assert 0 < r["byte_mean_x100"] < 25600
        assert 32 <= r["byte_max"] <= 127  # ASCII corpus


def _pillow_available() -> bool:
    try:
        import PIL  # noqa: F401

        return True
    except ImportError:
        return False


@pytest.mark.skipif(
    _pillow_available(), reason="Pillow present: its error types differ"
)
def test_multimodal_decode_garbage_raises_valueerror():
    """Without Pillow the vendored PNG fallback is the floor codec: a
    truncated/garbage payload raises ValueError (a diagnosable decode
    error), never NotImplementedError — the real-decode tier is live."""
    from hadoop_jobanalyzer_spark.operators.multimodal import decode_image

    for garbage in (b"\x89PNG", b"", b"JFIF not a png"):
        with pytest.raises(ValueError):
            decode_image(garbage)


def test_multimodal_pillow_codec_real_decode(spark):
    """The auto-detected Pillow codec tier: real PNG payloads decode /
    feature-extract / resize through the exact same Arrow plumbing the
    fake codec exercises. Skips (never fails) where Pillow is absent."""
    pytest.importorskip("PIL")
    import io

    import numpy as np
    from PIL import Image

    from hadoop_jobanalyzer_spark.operators import multimodal as mm

    def png(seed: int) -> bytes:
        arr = ((np.arange(8, dtype=np.uint8) + 1) * (seed + 3) % 251).reshape(2, 4)
        buf = io.BytesIO()
        Image.fromarray(arr, "L").save(buf, "PNG")
        return buf.getvalue()

    rows = [(i, png(i)) for i in range(5)]

    px = mm.decode_image(rows[0][1])
    assert px.shape == (2, 4)
    thumb = mm.resize_image(rows[0][1], 2, 1)
    assert np.asarray(Image.open(io.BytesIO(thumb))).shape == (1, 2)

    payloads = spark.createDataFrame(rows, "doc_id long, payload binary")
    feats = {r["doc_id"]: r for r in mm.decoded_image_features(payloads).collect()}
    assert set(feats) == set(range(5))
    for i, payload in rows:
        arr = np.asarray(Image.open(io.BytesIO(payload)))
        assert (feats[i]["height"], feats[i]["width"]) == arr.shape
        assert feats[i]["mean_px_x100"] == int(arr.mean() * 100)


def test_multimodal_pluggable_codec_end_to_end(spark, sf_dir):
    """Registering a codec via set_image_codec lights up decode_image /
    resize_image / decoded_image_features without any other code change —
    the fake decoder treats the payload bytes as a Wx1 grayscale image."""
    import numpy as np

    from hadoop_jobanalyzer_spark.operators import multimodal as mm

    def fake_decode(payload: bytes):
        return np.frombuffer(payload, dtype=np.uint8).reshape(1, -1)

    def fake_resize(payload: bytes, width: int, height: int) -> bytes:
        return bytes(payload)[: width * height]

    mm.set_image_codec(decoder=fake_decode, resizer=fake_resize)
    try:
        px = mm.decode_image(b"abc")
        assert px.shape == (1, 3) and int(px[0, 0]) == ord("a")
        assert mm.resize_image(b"abcdefgh", 2, 2) == b"abcd"

        t = load_tables(spark, sf_dir)
        payloads = attach_payload(t["documents"].limit(10), "doc_id", "text")
        feats = {r["doc_id"]: r for r in mm.decoded_image_features(payloads).collect()}
        texts = {r["doc_id"]: r["text"] for r in t["documents"].limit(10).collect()}
        assert set(feats) == set(texts)
        for doc_id, r in feats.items():
            b = texts[doc_id].encode()
            assert r["height"] == 1 and r["width"] == len(b)
            assert r["mean_px_x100"] == int(np.frombuffer(b, np.uint8).mean() * 100)
    finally:
        mm.set_image_codec(None, None)
    # clearing the registration restores the auto chain (Pillow or the
    # vendored PNG fallback) — decode stays live either way
    from hadoop_jobanalyzer_spark.functions.png_codec import encode_png

    px = mm.decode_image(encode_png(np.arange(12, dtype=np.uint8).reshape(3, 4)))
    assert px.shape == (3, 4)


def test_multimodal_pure_png_codec_real_decode(spark):
    """The vendored-codec tier: REAL PNG payloads decode / feature-extract
    / resize through the exact same Arrow plumbing as the Pillow tier —
    and this one runs in a library-free environment. The codec is pinned
    explicitly so the test exercises the pure-Python path even where
    Pillow exists."""
    import numpy as np

    from hadoop_jobanalyzer_spark.functions.png_codec import (
        decode_png,
        encode_png,
        resize_nearest,
    )
    from hadoop_jobanalyzer_spark.operators import multimodal as mm

    def png(seed: int) -> bytes:
        arr = ((np.arange(8, dtype=np.uint8) + 1) * (seed + 3) % 251).reshape(2, 4)
        return encode_png(arr)

    rows = [(i, png(i)) for i in range(5)]
    mm.set_image_codec(decoder=decode_png, resizer=resize_nearest)
    try:
        px = mm.decode_image(rows[0][1])
        assert px.shape == (2, 4)
        thumb = mm.resize_image(rows[0][1], 2, 1)
        assert decode_png(thumb).shape == (1, 2)

        payloads = spark.createDataFrame(rows, "doc_id long, payload binary")
        feats = {r["doc_id"]: r for r in mm.decoded_image_features(payloads).collect()}
        assert set(feats) == set(range(5))
        for i, payload in rows:
            arr = decode_png(payload)
            assert (feats[i]["height"], feats[i]["width"]) == arr.shape
            assert feats[i]["mean_px_x100"] == int(arr.mean() * 100)
    finally:
        mm.set_image_codec(None, None)


def test_winnow_shared_run_produces_shared_fingerprint(spark):
    """Winnowing guarantee: a shared run of window+ngram-1 words yields at
    least one shared fingerprint between the two docs."""
    from hadoop_jobanalyzer_spark.functions.text import winnow_fingerprints

    shared = "alpha beta gamma delta epsilon zeta eta"  # 7 words >= 4+3-1=6
    df = spark.createDataFrame(
        [(1, f"one two {shared} x y z"), (2, f"{shared} p q r s t")],
        "doc_id long, text string",
    )
    fps = winnow_fingerprints(df, "doc_id", "text").collect()
    a = {r["fp"] for r in fps if r["doc_id"] == 1}
    b = {r["fp"] for r in fps if r["doc_id"] == 2}
    assert a & b


def test_winnow_short_doc_single_min(spark):
    from hadoop_jobanalyzer_spark.functions.text import winnow_fingerprints

    df = spark.createDataFrame(
        [(1, "just three words"), (2, "ab")], "doc_id long, text string"
    )
    rows = winnow_fingerprints(df, "doc_id", "text").collect()
    assert [r["doc_id"] for r in rows] == [1]  # doc 2 has no shingles


def test_embedding_near_dup_symmetric_bound(spark, sf_dir):
    from hadoop_jobanalyzer_spark.operators.similarity import embedding_near_dup_pairs
    t = load_tables(spark, sf_dir)
    rows = embedding_near_dup_pairs(
        t["embeddings"], "vec_id", "embedding", threshold=0.4, cell_col="label"
    ).collect()
    for r in rows:
        assert r["id_a"] < r["id_b"]
        assert 0.4 <= r["cos_sim"] <= 1.0


def test_redact_pii_planted(spark):
    """The synthetic corpus has no PII, so redaction is exercised on
    planted values; expressions are plain codegen regexps."""
    from hadoop_jobanalyzer_spark.functions.text import pii_counts, redact_pii

    rows = [
        (0, "contact bob.smith+x@example.co.uk or call +1 (415) 555-0199 now"),
        (1, "see https://example.com/a?b=c#d and http://t.co/xyz"),
        (2, "nothing sensitive here"),
    ]
    df = spark.createDataFrame(rows, ["id", "text"])
    counts = {k: f"n_{k}" for k in ("email", "url", "phone")}
    got = df.select(
        "id",
        redact_pii("text").alias("clean"),
        *[v.alias(counts[k]) for k, v in pii_counts("text").items()],
    ).collect()
    by_id = {r["id"]: r for r in got}
    assert "<EMAIL>" in by_id[0]["clean"] and "<PHONE>" in by_id[0]["clean"]
    assert "@" not in by_id[0]["clean"] and "555" not in by_id[0]["clean"]
    assert by_id[0]["n_email"] == 1 and by_id[0]["n_phone"] >= 1
    assert by_id[1]["clean"].count("<URL>") == 2 and by_id[1]["n_url"] == 2
    assert by_id[2]["clean"] == "nothing sensitive here"
    assert by_id[2]["n_email"] == by_id[2]["n_url"] == by_id[2]["n_phone"] == 0


def test_incremental_lsh_matches_full_batch(spark, sf_dir):
    """Split the corpus into an 'existing' store and a 'new' batch: the
    incremental operator must reproduce exactly the full-batch candidate
    pairs that involve at least one new document, computing signatures for
    the new batch only."""
    from hadoop_jobanalyzer_spark.operators.dedup import (
        lsh_candidate_pairs,
        lsh_candidate_pairs_incremental,
        minhash_signatures,
    )

    docs = load_tables(spark, sf_dir)["documents"]
    old = docs.filter("doc_id % 5 != 0")
    new = docs.filter("doc_id % 5 = 0")
    store = minhash_signatures(old, "doc_id", "text").na.drop()

    inc, new_sigs = lsh_candidate_pairs_incremental(
        new, "doc_id", "text", stored_sigs=store
    )
    got = {(r["id_a"], r["id_b"]): r["n_shared_bands"] for r in inc.collect()}

    full = lsh_candidate_pairs(docs, "doc_id", "text")
    new_ids = {r["doc_id"] for r in new.select("doc_id").collect()}
    want = {
        (r["id_a"], r["id_b"]): r["n_shared_bands"]
        for r in full.collect()
        if r["id_a"] in new_ids or r["id_b"] in new_ids
    }
    assert got == want and len(got) > 0
    # the returned signatures extend the store for the next batch
    assert new_sigs.count() == new.count()


def test_near_dup_gate_applies_before_bucket_cap(spark):
    """q215 lesson: near_dup_ctes(doc_where=...) must restrict the corpus
    BEFORE shingling so the max_bucket band-bucket cap sees the same
    population the Spark builder hands to near_dup_pairs.  Construct a
    bucket that crosses the cap only in the ungated corpus: 4 identical
    docs (one shared band bucket of size 4), gate keeps 2, cap is 3."""
    import duckdb
    import pandas as pd

    from hadoop_jobanalyzer_spark.operators.dedup import near_dup_pairs
    from hadoop_jobanalyzer_spark.plans.pipeline_queries import near_dup_ctes

    pdf = pd.DataFrame(
        [(i, "alpha beta gamma delta epsilon", 300 if i < 2 else 10) for i in range(4)],
        columns=["doc_id", "text", "n_chars"],
    )
    gated = spark.createDataFrame(pdf).filter("n_chars >= 200")
    pairs = near_dup_pairs(gated, "doc_id", "text", max_bucket=3)
    assert [(r.id_a, r.id_b) for r in pairs.select("id_a", "id_b").collect()] == [(0, 1)]

    con = duckdb.connect()
    con.register("documents", pdf)
    gated_sql = (
        f"WITH {near_dup_ctes(doc_where='n_chars >= 200', max_bucket=3)} "
        "SELECT id_a, id_b FROM verified ORDER BY 1, 2"
    )
    assert con.execute(gated_sql).fetchall() == [(0, 1)]
    # without the gate, the 4-doc bucket crosses the cap and every pair drops —
    # the divergence the doc_where parameter exists to prevent
    ungated_sql = f"WITH {near_dup_ctes(max_bucket=3)} SELECT id_a, id_b FROM verified"
    assert con.execute(ungated_sql).fetchall() == []
