"""`jobhistory` as a first-class Spark data source (Python Data Source API).

Registers a format so the ingest is reachable through the standard reader
interface:

    spark.dataSource.register(JobHistoryDataSource)
    records = spark.read.format("jobhistory").load("/logs/*.txt")

One input partition per log file (one file = one job's history — the
natural parallel unit, same as the wholetext reader). Record framing and
attribute parsing replicate the engine's Catalyst expressions exactly
(RECORD_SEP_RE / ATTR_RE / EVENT_RE from sources/job_history.py, which in
turn pin the reference semantics of bin/job_history:214-228) and are
differential-tested against them on the fixture logs.

This source exists for *interface parity* (SURVEY.md §2.1: every source is
a reader the user can reach) and for environments where per-file Python IO
is the right boundary. The default ingest path (`read_raw_records`:
wholetext scan + codegen regex) remains the performance path — it parses
JVM-side; this one parses in Python per partition, paying one Arrow
transfer of the parsed records.
"""

from __future__ import annotations

import glob
import os
import re
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

# Python forms of the Catalyst parse constants (re.split WOULD inject
# capture groups into its result, so the terminator group is non-capturing
# here; Spark's split never emits groups).
_RECORD_SEP = re.compile(r" \.(?:\r?\n|$)")
_ATTR = re.compile(r'(\w+)="([^"]*)"')
_EVENT = re.compile(r"^(\w+)")

RECORDS_SCHEMA = "source_file string, seq bigint, event string, attrs map<string,string>"


def _expand(path: str) -> list[str]:
    if os.path.isdir(path):
        return sorted(
            p for p in glob.glob(os.path.join(path, "*")) if os.path.isfile(p)
        )
    return sorted(p for p in glob.glob(path) if os.path.isfile(p))


class _FilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class JobHistoryReader(DataSourceReader):
    def __init__(self, options: dict):
        path = options.get("path")
        if not path:
            raise ValueError("jobhistory source requires a path: .load(<path>)")
        self._files = _expand(path)

    def partitions(self) -> Sequence[InputPartition]:
        return [_FilePartition(p) for p in self._files]

    def read(self, partition: _FilePartition) -> Iterator[tuple]:
        with open(partition.path, encoding="utf-8", errors="replace") as f:
            text = f.read()
        parts = _RECORD_SEP.split(text)
        source = f"file://{os.path.abspath(partition.path)}"
        # the element after the last separator is unterminated remainder —
        # never dispatched (reference EOF semantics); empty/stray elements
        # are dropped exactly like the Catalyst filter length(trim) > 2
        for seq, rec in enumerate(parts[:-1]):
            if len(rec.strip()) <= 2:
                continue
            m = _EVENT.match(rec)
            attrs = dict(_ATTR.findall(rec))  # dup keys: last wins (LAST_WIN)
            yield (source, seq, m.group(1) if m else "", attrs)


class JobHistoryDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "jobhistory"

    def schema(self) -> str:
        return RECORDS_SCHEMA

    def reader(self, schema) -> JobHistoryReader:
        return JobHistoryReader(self.options)
