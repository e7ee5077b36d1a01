"""Incremental-dedup-index bench: per-batch cost of `MinHashDedupIndex.update`
vs recomputing batch near-dup pairs over the full accumulated corpus
(`minhash_lsh_pairs`), as the corpus grows.

The point of X24 is that per-epoch cost tracks the BATCH, not the corpus:
the recompute baseline re-shingles everything ever ingested, the index
re-shingles only the new batch and equi-joins compact band keys. This
script measures both at each step of a growing corpus and prints one JSON
line. Host-noise protocol (BENCH/BASELINE.md): best-of-N per step,
session reset between timings.

Maintenance posture: the index is compacted every COMPACT_EVERY batches
(outside the timed window — in production compaction is a background
maintenance job, not part of the ingest hot path; the runbook is
jobs/maintenance_job.py --minhash-index).

Usage: python bench/index_bench.py [n_batches] [docs_per_batch] [compact_every]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402

from data_pipeline_spark.operators import textdedup as TD  # noqa: E402
from data_pipeline_spark.operators.dedup_index import MinHashDedupIndex  # noqa: E402
from data_pipeline_spark.session import get_spark  # noqa: E402

REPEATS = 3


def _reset(spark):
    spark.catalog.clearCache()
    spark.sparkContext._jvm.System.gc()


def _batch(spark, sf_dir: str, b: int, per_batch: int):
    """Deterministic doc batches from the documents table: batch b takes
    rows [b*per_batch, (b+1)*per_batch), re-keyed to unique ids, with every
    5th doc a near-dup variant of a doc from an EARLIER batch."""
    d = (
        spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        .select("doc_id", "text")
        .where((F.col("doc_id") >= b * per_batch) & (F.col("doc_id") < (b + 1) * per_batch))
    )
    if b == 0:
        return d
    # Variants of batch-0 docs: forces real cross-batch candidates.
    dup_src = (
        spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        .select("doc_id", "text")
        .where(F.col("doc_id") < per_batch)
        .where(F.col("doc_id") % 5 == 0)
    )
    variants = dup_src.select(
        (F.col("doc_id") + 10_000_000 * b).alias("doc_id"),
        F.concat("text", F.lit(f" zz{b}")).alias("text"),
    )
    return d.unionByName(variants)


def main() -> None:
    n_batches = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    per_batch = int(sys.argv[2]) if len(sys.argv) > 2 else 2000
    compact_every = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("index-bench")
    spark.sparkContext.setLogLevel("ERROR")

    idx_path = tempfile.mkdtemp(prefix="idx_bench_")
    idx = MinHashDedupIndex.create(spark, idx_path, n=3, num_hashes=12, bands=4)

    steps = []
    corpus = None
    for b in range(n_batches):
        batch = _batch(spark, sf_dir, b, per_batch)
        corpus = batch if corpus is None else corpus.unionByName(batch)
        corpus_rows = corpus.count()

        # Index path: probe+commit cost for THIS batch against the stored
        # corpus. First rep commits (epoch b); later reps probe read-only —
        # the same candidate/verify work minus the (measured-once) write.
        t_idx = []
        for r in range(REPEATS):
            _reset(spark)
            t0 = time.monotonic()
            if r == 0:
                n_pairs = idx.update(batch, epoch=b).count()
            else:
                n_pairs = idx.duplicates(batch).count()
            t_idx.append(time.monotonic() - t0)

        # Baseline: full recompute of near-dup pairs over the accumulated
        # corpus (what a non-incremental pipeline runs every epoch).
        t_full = []
        for _ in range(REPEATS):
            _reset(spark)
            t0 = time.monotonic()
            TD.minhash_lsh_pairs(
                corpus, "text", "doc_id", n=3, num_hashes=12, bands=4,
                threshold=0.5,
            ).count()
            t_full.append(time.monotonic() - t0)

        if compact_every and (b + 1) % compact_every == 0:
            idx.compact()  # background maintenance, outside the timed window
        steps.append({
            "batch": b,
            "corpus_rows": corpus_rows,
            "index_update_s": round(min(t_idx), 3),
            "full_recompute_s": round(min(t_full), 3),
            "speedup": round(min(t_full) / max(min(t_idx), 1e-9), 2),
            "pairs": n_pairs,
        })
        print(json.dumps(steps[-1]), file=sys.stderr)

    shutil.rmtree(idx_path, ignore_errors=True)
    print(json.dumps({
        "metric": "dedup_index_update_vs_full_recompute",
        "unit": "sec_per_batch",
        "sf": sf_dir,
        "per_batch_docs": per_batch,
        "steps": steps,
        "final_speedup": steps[-1]["speedup"] if steps else None,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
