"""WARC / JSONL corpus ingestion: synthetic fixtures, framing edge cases."""

import gzip
import json

from hadoop_jobanalyzer_spark.sources.corpus import read_jsonl_corpus, read_warc


def _warc_record(rec_id: str, rtype: str, uri: str, payload: bytes) -> bytes:
    head = (
        f"WARC/1.0\r\n"
        f"WARC-Type: {rtype}\r\n"
        f"WARC-Record-ID: <urn:uuid:{rec_id}>\r\n"
        f"WARC-Target-URI: {uri}\r\n"
        f"Content-Type: text/plain\r\n"
        f"Content-Length: {len(payload)}\r\n"
        f"\r\n"
    ).encode()
    return head + payload + b"\r\n\r\n"


def _write_fixture(path, gz=False):
    body = (
        _warc_record("aa", "warcinfo", "none:", b"crawler=test")
        + _warc_record("bb", "response", "http://x.example/1", b"hello corpus one")
        + _warc_record("cc", "request", "http://x.example/1", b"GET /1")
        + _warc_record("dd", "response", "http://x.example/2", b"\x89PNG binary \x00 payload")
    )
    data = gzip.compress(body) if gz else body
    path.write_bytes(data)


def test_warc_roundtrip_and_type_filter(spark, tmp_path):
    _write_fixture(tmp_path / "a.warc")
    df = read_warc(spark, str(tmp_path / "a.warc"))
    rows = {r["record_id"]: r for r in df.collect()}
    assert len(rows) == 4
    assert bytes(rows["<urn:uuid:bb>"]["payload"]) == b"hello corpus one"
    assert rows["<urn:uuid:dd>"]["content_length"] == len(b"\x89PNG binary \x00 payload")
    only_resp = read_warc(spark, str(tmp_path / "a.warc"), warc_types=["response"])
    assert {r["warc_type"] for r in only_resp.collect()} == {"response"}
    assert only_resp.count() == 2


def test_warc_gzip_and_truncation(spark, tmp_path):
    _write_fixture(tmp_path / "b.warc.gz", gz=True)
    assert read_warc(spark, str(tmp_path / "b.warc.gz")).count() == 4
    # truncated mid-payload: partial record dropped, earlier ones kept
    full = (tmp_path / "b.warc.gz").read_bytes()
    raw = gzip.decompress(full)
    (tmp_path / "trunc.warc").write_bytes(raw[: len(raw) - 30])
    got = read_warc(spark, str(tmp_path / "trunc.warc")).count()
    assert got == 3


def test_jsonl_corpus_contract(spark, tmp_path):
    p = tmp_path / "docs.jsonl"
    with open(p, "w") as f:
        for i in range(5):
            f.write(json.dumps({"id": i, "text": f"doc {i}", "lang": "en"}) + "\n")
    df = read_jsonl_corpus(spark, str(p))
    assert set(df.columns) >= {"doc_id", "text", "lang"}
    assert df.count() == 5
    # engine operators run unchanged on the adapted frame
    from hadoop_jobanalyzer_spark.operators.dedup import exact_duplicates

    assert exact_duplicates(df, "doc_id", "text").count() == 5


def test_warc_format_registration(spark, tmp_path):
    """spark.read.format('warc') — interface parity with the jobhistory
    Python data source."""
    from hadoop_jobanalyzer_spark.sources.corpus import WarcDataSource

    _write_fixture(tmp_path / "c.warc")
    spark.dataSource.register(WarcDataSource)
    df = (
        spark.read.format("warc")
        .option("warc_types", "response")
        .load(str(tmp_path / "c.warc"))
    )
    rows = df.collect()
    assert {r["warc_type"] for r in rows} == {"response"} and len(rows) == 2
    assert bytes(rows[0]["payload"]).startswith(b"hello") or bytes(
        rows[1]["payload"]
    ).startswith(b"hello")


def test_warc_negative_content_length_resyncs(spark, tmp_path):
    """A corrupt 'Content-Length: -1' record must be skipped with resync on
    the next WARC/ line, not swallow the remainder of the file."""
    bad = (
        b"WARC/1.0\r\nWARC-Type: response\r\nWARC-Record-ID: <urn:uuid:bad>\r\n"
        b"Content-Length: -1\r\n\r\n"
    )
    body = bad + _warc_record("ok", "response", "http://x.example/ok", b"survivor")
    (tmp_path / "neg.warc").write_bytes(body)
    rows = read_warc(spark, str(tmp_path / "neg.warc")).collect()
    assert [r["record_id"] for r in rows] == ["<urn:uuid:ok>"]


def test_streaming_jsonl_dedup_matches_batch_distinct(spark, tmp_path):
    """Stream two JSONL shards with overlapping documents; the streamed
    dedup must emit exactly one row per distinct text, matching the batch
    distinct count."""
    import uuid

    from hadoop_jobanalyzer_spark.sources.corpus import (
        dedup_docs_stream,
        read_jsonl_corpus_stream,
    )

    d = tmp_path / "shards"
    d.mkdir()
    texts = [f"document number {i % 7}" for i in range(20)]  # 7 distinct
    half = len(texts) // 2
    for shard, chunk in enumerate((texts[:half], texts[half:])):
        with open(d / f"shard{shard}.jsonl", "w") as f:
            for i, t in enumerate(chunk):
                f.write(json.dumps({"id": shard * half + i, "text": t}) + "\n")

    stream = read_jsonl_corpus_stream(
        spark, str(d), schema="id long, text string"
    )
    name = f"docs_{uuid.uuid4().hex[:8]}"
    q = (
        dedup_docs_stream(stream)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    rows = spark.table(name).collect()
    assert len(rows) == 7
    assert {r["text"] for r in rows} == set(texts)
    assert len({r["_content_hash"] for r in rows}) == 7


def test_csv_corpus_quarantines_malformed_rows(spark, tmp_path):
    """PERMISSIVE CSV read: good rows parse, malformed rows survive with
    their raw line in _corrupt_record (never silently dropped), and the
    corrupt-row report counts them."""
    from hadoop_jobanalyzer_spark.sources.corpus import (
        corrupt_row_report,
        read_csv_corpus,
    )

    p = tmp_path / "docs.csv"
    p.write_text(
        'id,text,n\n'
        '1,"hello world",5\n'
        '2,"multi\nline quoted",9\n'
        '3,not-a-number-in-n,oops\n'
        '4,"fine again",2\n'
    )
    df = read_csv_corpus(
        spark, str(p), schema="id long, text string, n long"
    ).cache()
    rows = {r["doc_id"]: r for r in df.collect()}
    assert rows[1]["text"] == "hello world" and rows[1]["n"] == 5
    assert rows[2]["text"] == "multi\nline quoted"  # multiLine quoted field
    assert rows[4]["n"] == 2
    bad = [r for r in rows.values() if r["_corrupt_record"] is not None]
    assert len(bad) == 1 and "oops" in bad[0]["_corrupt_record"]

    rep = corrupt_row_report(df).collect()[0]
    assert (rep["n_rows"], rep["n_corrupt"]) == (4, 1)
    assert rep["corrupt_frac"] == 0.25
    df.unpersist()
