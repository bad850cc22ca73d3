"""Corpus ingestion sources for training-data pipelines.

Two standard wire formats land document corpora in practice:

* **WARC** (Common Crawl / web archives): length-framed records with
  ``WARC/1.x`` header blocks. The framing is plain text + Content-Length,
  so a dependency-free parser suffices; parsing is imperative per file,
  which is exactly the legitimate Python boundary — ``mapInPandas`` over
  whole files, Arrow-framed out. One WARC file = one parse unit, so
  parallelism comes from many files (the Common Crawl layout: thousands
  of ~1 GB segments).
* **JSONL** (one JSON document per line): Spark's native json reader
  already does distributed line-splitting, schema inference/enforcement,
  predicate pushdown and column pruning — the wrapper only standardizes
  the schema contract.

Reference parity note: the reference ingests only its own log format
(SURVEY.md §2.1); these sources are part of the training-data extension
layer, same status as operators/dedup.
"""

from __future__ import annotations

import gzip
import io
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

WARC_SCHEMA = (
    "source_file string, record_id string, warc_type string, "
    "target_uri string, content_type string, content_length long, "
    "payload binary"
)


def _parse_warc_stream(name: str, data: bytes) -> Iterator[dict]:
    """Parse one WARC file's bytes into record dicts.

    Framing per the WARC spec: a ``WARC/1.x`` version line, header lines
    until a blank line, ``Content-Length`` octets of payload, then two
    CRLFs. Tolerates LF-only input and skips malformed trailing bytes
    (truncated fetches are routine in crawl data).
    """
    if data[:2] == b"\x1f\x8b":  # whole-file gzip (.warc.gz)
        data = gzip.decompress(data)
    buf = io.BytesIO(data)
    while True:
        line = buf.readline()
        if not line:
            return
        if not line.startswith(b"WARC/"):
            continue  # skip padding / malformed bytes until next record
        headers: dict[str, str] = {}
        while True:
            h = buf.readline()
            if not h or h in (b"\r\n", b"\n"):
                break
            if b":" in h:
                k, v = h.split(b":", 1)
                headers[k.strip().decode("ascii", "replace").lower()] = (
                    v.strip().decode("utf-8", "replace")
                )
        try:
            length = int(headers.get("content-length", ""))
        except ValueError:
            continue  # unframeable record: resync on next WARC/ line
        if length < 0:
            continue  # malformed length: read(-1) would swallow the file
        payload = buf.read(length)
        if len(payload) < length:
            return  # truncated file: drop the partial record (crawl norm)
        yield {
            "source_file": name,
            "record_id": headers.get("warc-record-id", ""),
            "warc_type": headers.get("warc-type", ""),
            "target_uri": headers.get("warc-target-uri"),
            "content_type": headers.get("content-type"),
            "content_length": length,
            "payload": payload,
        }


def read_warc(spark: SparkSession, path: str, warc_types: list[str] | None = None) -> DataFrame:
    """Read WARC file(s) into (source_file, record_id, warc_type,
    target_uri, content_type, content_length, payload).

    ``warc_types`` (e.g. ``["response"]``) filters record types during the
    parse, before anything is emitted into the Arrow stream — at crawl
    scale most records are request/metadata noise a text pipeline never
    wants to materialize.
    """
    files = spark.read.format("binaryFile").load(path)

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for name, content in zip(pdf["path"], pdf["content"]):
                for rec in _parse_warc_stream(name, bytes(content)):
                    if warc_types is None or rec["warc_type"] in warc_types:
                        rows.append(rec)
            yield pd.DataFrame(
                rows,
                columns=[
                    "source_file", "record_id", "warc_type", "target_uri",
                    "content_type", "content_length", "payload",
                ],
            )

    return files.select("path", "content").mapInPandas(parse, WARC_SCHEMA)


def read_jsonl_corpus(
    spark: SparkSession,
    path: str,
    id_field: str = "id",
    text_field: str = "text",
) -> DataFrame:
    """Read a JSONL document corpus into the engine's (doc_id, text, ...)
    contract using Spark's native distributed json reader (line-split
    scans, pushdown, pruning all apply). Extra fields pass through."""
    df = spark.read.json(path)
    renames = {id_field: "doc_id", text_field: "text"}
    for src, dst in renames.items():
        if src in df.columns and src != dst:
            df = df.withColumnRenamed(src, dst)
    return df


def read_csv_corpus(
    spark: SparkSession,
    path: str,
    schema: str,
    id_field: str = "id",
    text_field: str = "text",
    delimiter: str = ",",
) -> DataFrame:
    """Read a CSV/TSV document corpus with *quarantine* semantics for
    malformed rows: PERMISSIVE mode keeps every line, parse failures land
    with their raw text in ``_corrupt_record`` and nulls elsewhere, so the
    pipeline can count/inspect/sideline bad rows instead of silently
    dropping them (FAILFAST would kill a 100 TB job on one bad line;
    DROPMALFORMED silently changes corpus statistics).

    ``schema`` is required — inference would scan the corpus twice and
    pin types on whatever the sample happened to contain. The
    ``_corrupt_record`` column is appended to the caller's schema here.
    Multi-line quoted fields are enabled; at scale multiLine CSV files
    are not splittable, so parallelism comes from file count (same
    contract as the WARC source).
    """
    full_schema = schema.rstrip().rstrip(",") + ", _corrupt_record string"
    df = (
        spark.read.schema(full_schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .option("header", "true")
        .option("sep", delimiter)
        .option("quote", '"')
        .option("escape", '"')
        .option("multiLine", "true")
        .csv(path)
    )
    for src, dst in ((id_field, "doc_id"), (text_field, "text")):
        if src in df.columns and src != dst:
            df = df.withColumnRenamed(src, dst)
    return df


def corrupt_row_report(df: DataFrame) -> DataFrame:
    """(n_rows, n_corrupt, corrupt_frac) for a PERMISSIVE-read corpus —
    the ingest QA gate: alert when a source's corrupt fraction jumps.
    Spark requires caching/materializing before filtering on
    ``_corrupt_record`` alone, so the report references it alongside
    another column via the standard count-aggregate form instead."""
    from pyspark.sql import functions as F

    return df.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("_corrupt_record").alias("n_corrupt"),
        F.round(
            F.count("_corrupt_record") / F.count(F.lit(1)), 6
        ).alias("corrupt_frac"),
    )


# --- `warc` as a first-class Spark data source (Python Data Source API) ------

try:  # the Data Source API needs pyspark >= 4
    from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

    class _WarcFilePartition(InputPartition):
        def __init__(self, path: str):
            self.path = path

    class WarcReader(DataSourceReader):
        """One input partition per WARC file (the crawl-segment parallel
        unit); yields the same rows as :func:`read_warc`."""

        def __init__(self, options: dict):
            import glob
            import os

            path = options.get("path")
            if not path:
                raise ValueError("warc source requires a path: .load(<path>)")
            if os.path.isdir(path):
                path = os.path.join(path, "*")
            self._files = sorted(p for p in glob.glob(path) if os.path.isfile(p))
            types = options.get("warc_types")
            self._types = set(types.split(",")) if types else None

        def partitions(self):
            return [_WarcFilePartition(p) for p in self._files]

        def read(self, partition):
            with open(partition.path, "rb") as f:
                data = f.read()
            for rec in _parse_warc_stream(f"file://{partition.path}", data):
                if self._types is None or rec["warc_type"] in self._types:
                    yield (
                        rec["source_file"],
                        rec["record_id"],
                        rec["warc_type"],
                        rec["target_uri"],
                        rec["content_type"],
                        rec["content_length"],
                        rec["payload"],
                    )

    class WarcDataSource(DataSource):
        @classmethod
        def name(cls) -> str:
            return "warc"

        def schema(self) -> str:
            return WARC_SCHEMA

        def reader(self, schema) -> WarcReader:
            return WarcReader(self.options)

except ImportError:  # pragma: no cover
    WarcDataSource = None  # type: ignore[assignment]


def read_jsonl_corpus_stream(
    spark: SparkSession,
    path: str,
    schema: str,
    id_field: str = "id",
    text_field: str = "text",
) -> DataFrame:
    """Streaming form of :func:`read_jsonl_corpus`: watch a directory for
    arriving JSONL shards (streaming sources require an explicit schema).
    The (doc_id, text) contract is applied the same way, so every batch
    operator that composes with streams runs unchanged."""
    df = spark.readStream.schema(schema).json(path)
    for src, dst in ((id_field, "doc_id"), (text_field, "text")):
        if src in df.columns and src != dst:
            df = df.withColumnRenamed(src, dst)
    return df


def dedup_docs_stream(
    docs: DataFrame,
    text_col: str = "text",
    watermark_delay: str = "10 minutes",
) -> DataFrame:
    """Exactly-once content dedup over an arriving document stream: drop
    any document whose md5(text) was already seen within the watermark
    window. State is one short hash per distinct document and is evicted
    past the watermark — the bounded-state form of streaming exact dedup
    (the batch equivalent is ``exact_duplicates``' keeper filter)."""
    from pyspark.sql import functions as F

    return (
        docs.withColumn("_content_hash", F.md5(F.col(text_col)))
        .withColumn("_ingest_ts", F.current_timestamp())
        .withWatermark("_ingest_ts", watermark_delay)
        .dropDuplicatesWithinWatermark(["_content_hash"])
        .drop("_ingest_ts")
    )
