"""Inverted-index search bench: per-query cost of `InvertedIndex.lookup`
(bucket-pruned stored postings) vs re-tokenizing the accumulated corpus
per query (`build_postings` + `search_postings`), as the corpus grows.

The point of X80 is that QUERY cost tracks the query's bucket slice, not
the corpus text: the recompute baseline re-tokenizes every document ever
ingested for every query; the index reads only the queried terms' bucket
directories of fixed-width postings. This script grows a corpus in
epochs, times both paths per step (identical results asserted), and
prints one JSON line. Host-noise protocol (BENCH/BASELINE.md): best-of-N
per step, cache clear between timings.

Usage: python bench/search_bench.py [n_batches] [docs_per_batch]
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

from data_pipeline_spark.operators.inverted_index import (  # noqa: E402
    InvertedIndex,
    build_postings,
    search_postings,
)
from data_pipeline_spark.session import get_spark  # noqa: E402

REPEATS = 3
TERMS = ["table", "scan", "merge"]


def _reset(spark):
    spark.catalog.clearCache()
    spark.sparkContext._jvm.System.gc()


def _batch(spark, sf_dir: str, b: int, repeat: int):
    """Deterministic doc batches: batch b re-keys the WHOLE documents
    table to a fresh id range, text repeated ``repeat``× (~2.4 KB/doc at
    sf0.1) so the corpus-side tokenize cost is visible against fixed
    scheduling overhead. Term distribution is constant as the corpus
    grows."""
    d = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    n = d.count()
    return n, d.select(
        (F.lit(b * n) + F.col("doc_id")).alias("doc_id"),
        F.expr(f"array_join(array_repeat(text, {repeat}), ' ')").alias("text"),
    )


def _timed(fn):
    best = float("inf")
    out = None
    for _ in range(REPEATS):
        t0 = time.monotonic()
        out = fn()
        best = min(best, time.monotonic() - t0)
    return best, out


def main() -> None:
    n_batches = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    repeat = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        master=f"local[{cpus}]", shuffle_partitions=int(cpus)
    )
    work = tempfile.mkdtemp(prefix="search_bench_")
    idx = InvertedIndex.create(spark, os.path.join(work, "idx"), n_buckets=32)

    corpus = None
    steps = []
    per_batch = None
    for b in range(n_batches):
        per_batch, batch = _batch(spark, sf_dir, b, repeat)
        batch = batch.localCheckpoint(eager=True)
        corpus = batch if corpus is None else corpus.unionByName(batch)
        corpus = corpus.localCheckpoint(eager=True)
        idx.update(batch, epoch=b)

        _reset(spark)
        t_idx, got = _timed(
            lambda: [tuple(r) for r in idx.lookup(TERMS, top_k=25).collect()]
        )
        _reset(spark)
        t_full, want = _timed(
            lambda: [
                tuple(r)
                for r in search_postings(
                    build_postings(corpus, "doc_id", "text"), TERMS, top_k=25
                ).collect()
            ]
        )
        assert got == want, f"step {b}: index != recompute"
        steps.append(
            {
                "corpus_docs": (b + 1) * per_batch,
                "index_lookup_s": round(t_idx, 4),
                "recompute_s": round(t_full, 4),
                "speedup": round(t_full / t_idx, 2) if t_idx > 0 else None,
            }
        )
        print(json.dumps(steps[-1]), flush=True)

    # Maintenance posture: compaction (a background job in production —
    # jobs/maintenance_job.py analog) folds the per-epoch directories; the
    # post-compact lookup is the cold-majority steady state.
    idx.compact()
    _reset(spark)
    t_c, got = _timed(
        lambda: [tuple(r) for r in idx.lookup(TERMS, top_k=25).collect()]
    )
    assert got == want, "post-compact lookup changed results"

    out = {
        "metric": "inverted_index_lookup_vs_retokenize",
        "unit": "sec",
        "terms": TERMS,
        "n_buckets": 32,
        "repeat": repeat,
        "sf_dir": sf_dir,
        "steps": steps,
        "post_compact_lookup_s": round(t_c, 4),
        "final_speedup_vs_recompute": (
            round(steps[-1]["recompute_s"] / t_c, 2) if t_c > 0 else None
        ),
    }
    print(json.dumps(out))
    with open(
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                     "BENCH", "search_bench.json"),
        "w",
        encoding="utf-8",
    ) as f:
        json.dump(out, f, indent=1)
    shutil.rmtree(work, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
