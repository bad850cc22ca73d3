#!/usr/bin/env python
"""Measured probe for the streaming corpus-ingest path: wall time of one
ingest micro-batch (fixed batch size) as the signature STORE grows a
decade — the claim under test is the module's cost model: O(batch)
signature work plus one narrow columnar scan + band-join against the
store, never a corpus re-shingle.

For each store size (sf0.01 -> sf0.1 -> x10 if built) the probe:
  1. publishes a minimal store (documents + MinHash signature tables,
     the two tables the ingest path touches),
  2. runs one WARM-UP pass (separate arrival file) to absorb JIT and
     stream-start cost,
  3. lands a fresh ``--batch-docs``-doc arrival file and times that
     availableNow pass end-to-end (dedup + three delta writes).

Prints one JSON line per store: {"store_docs", "batch_docs",
"t_batch_s"}. Flat-ish t_batch across a 100x store-size range is the
pass criterion; the residual growth is the stored-signature scan (8
ints/doc), the documented floor. Run SOLO like bench.py.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

STORES = [
    ("/root/testdata/sf0.01", "documents.parquet"),
    ("/root/testdata/sf0.1", "documents.parquet"),
    ("/tmp/hja_scale10", "documents.parquet"),
    ("/tmp/hja_scale100", "documents.parquet"),  # built by scale10.py --factor 100
]
# extra --stores dirs append here: a documents-only x1000 dir (10
# disjoint-vocabulary copies of the x100 documents) reaches the 1e7+
# banded-row regime BANDS_MIN_STORE_ROWS gates on, which no full scaled
# dataset under this sandbox's disk/time budget reaches


def fresh_docs(spark, schema, start_id: int, n: int, tag: str):
    return spark.createDataFrame(
        [
            {
                "doc_id": start_id + i,
                "text": " ".join(f"{tag}{i}w{j}" for j in range(12)),
                "lang": "en",
                "source": "probe",
                "n_chars": 60,
            }
            for i in range(n)
        ],
        schema=schema,
    )


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch-docs", type=int, default=500)
    ap.add_argument(
        "--layout",
        choices=("wide", "bands", "both"),
        default="both",
        help="signature-store layout to probe: the wide mh0..mhN table "
        "(pre-r10 shape; the ingest path re-explodes it into band rows "
        "every batch), the pre-banded bkey-bucketed table (r10 shape; "
        "the batch's touched-bucket filter prunes the store scan), or "
        "both for the side-by-side",
    )
    ap.add_argument(
        "--stores", nargs="*", default=[],
        help="extra store dirs (each holding documents.parquet) probed "
        "after the built-in ladder",
    )
    args = ap.parse_args()
    for extra in args.stores:
        STORES.append((extra, "documents.parquet"))

    # the x100 store build (500k-doc MinHash) trips the 8g GC-locker
    # stall documented in SCALE.md — same default as tools/scale10.py
    os.environ.setdefault("SPARK_DRIVER_MEM", "24g")

    from hadoop_jobanalyzer_spark.operators.dedup import (
        banded_signatures,
        minhash_signatures,
    )
    from hadoop_jobanalyzer_spark.plans.pipeline_queries import _BANDS, _N_HASHES
    from hadoop_jobanalyzer_spark.session import get_spark
    from hadoop_jobanalyzer_spark.sources.bucketed import write_bucketed
    from hadoop_jobanalyzer_spark.streaming.corpus_ingest import (
        start_corpus_ingest,
    )

    spark = get_spark(
        extra_conf={
            "spark.driver.memory": os.environ.get("SPARK_DRIVER_MEM", "24g")
        }
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs_schema = spark.read.parquet(f"{STORES[0][0]}/documents.parquet").schema

    layouts = ("wide", "bands") if args.layout == "both" else (args.layout,)
    for i, (src, fname) in enumerate(STORES):
        path = os.path.join(src, fname)
        if not os.path.exists(path):
            print(f"# skipping {src} (not built)", flush=True)
            continue
        for layout in layouts:
            # the ingest gate would route toy-sized stores to the wide
            # read path (corpus_ingest.BANDS_MIN_STORE_ROWS); this probe
            # measures the bands READ path itself, so force it on
            if layout == "bands":
                os.environ["HJA_BANDS_MIN_STORE_ROWS"] = "0"
            else:
                os.environ.pop("HJA_BANDS_MIN_STORE_ROWS", None)
            prefix = f"probe{i}{layout[0]}"
            work = tempfile.mkdtemp(prefix=f"ingest_probe_{i}_{layout}_")
            root = os.path.join(work, "snap")
            os.makedirs(root)
            docs = spark.read.parquet(path)
            n_store = docs.count()
            tables = {}
            write_bucketed(
                docs, f"{prefix}_documents", ["doc_id"], 16,
                sort_cols=["doc_id"], path=os.path.join(root, "documents"),
            )
            sigs = minhash_signatures(docs, "doc_id", "text", _N_HASHES, 3)
            write_bucketed(
                sigs, f"{prefix}_minhash_sigs", ["doc_id"], 16,
                sort_cols=["doc_id"], path=os.path.join(root, "minhash_sigs"),
            )
            for name in (f"{prefix}_documents", f"{prefix}_minhash_sigs"):
                tables[name] = {"bucket_by": "doc_id", "n_buckets": 16,
                                "rows": spark.table(name).count()}
            if layout == "bands":
                # the r10 store shape: signatures pre-exploded into band
                # rows, bucketed+sorted by bkey (mirrors snapshot.py's
                # publish — bands derive from the written sigs TABLE so
                # the minhash subtree runs once)
                write_bucketed(
                    banded_signatures(
                        spark.table(f"{prefix}_minhash_sigs"), "doc_id",
                        n_hashes=_N_HASHES, bands=_BANDS,
                    ),
                    f"{prefix}_minhash_bands", ["bkey"], 16,
                    sort_cols=["bkey"], path=os.path.join(root, "minhash_bands"),
                )
                tables[f"{prefix}_minhash_bands"] = {
                    "bucket_by": "bkey", "n_buckets": 16,
                    "n_hashes": _N_HASHES, "bands": _BANDS,
                    "rows": spark.table(f"{prefix}_minhash_bands").count(),
                }
            with open(os.path.join(root, "_MANIFEST.json"), "w") as fh:
                json.dump({"source": src, "root": root, "tables": tables}, fh)

            arrivals = os.path.join(work, "arrivals")
            ckpt = os.path.join(work, "ckpt")
            base_id = 1_000_000_000
            # warm-up pass: stream start + JIT, not part of the measurement
            fresh_docs(spark, docs_schema, base_id, 100, f"warm{i}x").coalesce(
                1
            ).write.mode("append").parquet(arrivals)
            q = start_corpus_ingest(spark, arrivals, root, ckpt, prefix=prefix)
            q.awaitTermination(600)

            fresh_docs(
                spark, docs_schema, base_id + 10_000, args.batch_docs,
                f"batch{i}x",
            ).coalesce(1).write.mode("append").parquet(arrivals)
            t0 = time.perf_counter()
            q = start_corpus_ingest(spark, arrivals, root, ckpt, prefix=prefix)
            q.awaitTermination(600)
            t = time.perf_counter() - t0
            print(
                json.dumps(
                    {
                        "store_docs": n_store,
                        "batch_docs": args.batch_docs,
                        "layout": layout,
                        "t_batch_s": round(t, 2),
                    }
                ),
                flush=True,
            )
            for name in tables:
                spark.sql(f"DROP TABLE IF EXISTS {name}")
            shutil.rmtree(work, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
