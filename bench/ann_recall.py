"""ANN recall-at-scale artifact (VERDICT r2 Next round #6).

Measures recall@k against the exact brute-force cosine top-k on the sf0.1
embeddings table for:

- IVF-Flat (`ivf_topk`): nprobe sweep, fixed (seeded) vs learned (KMeans)
  coarse quantizer.
- PQ ADC (`pq_topk`): fixed (seeded) vs learned (per-subspace KMeans)
  codebooks.

Until now recall was pinned only at pytest toy scale; this records it at
the benchmark scale so the quality/speed trade (nprobe, quantizer choice)
is a measured number, not a claim. Writes BENCH/ann_recall.json.

Usage: python bench/ann_recall.py  [env: SPARK_GRAFT_SF_DIR]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_pipeline_spark.operators.pq import (  # noqa: E402
    fixed_codebooks,
    learned_codebooks,
    pq_encode,
    pq_topk,
    pq_topk_rerank,
)
from data_pipeline_spark.operators.similarity import (  # noqa: E402
    ivf_index,
    ivf_topk,
    topk_bruteforce,
)
from data_pipeline_spark.session import get_spark  # noqa: E402

K = 10
N_QUERIES = 50
N_LISTS = 16
DIM = 64
PQ_M = 8
PQ_K = 16


def truth_sets(df):
    out: dict = {}
    for r in df.collect():
        out.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    return out


def recall(approx: dict, exact: dict, k: int) -> float:
    per_q = [
        len(approx.get(q, set()) & hits) / min(len(hits), k)
        for q, hits in exact.items()
    ]
    return round(sum(per_q) / len(per_q), 4)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("ann-recall")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n_corpus = emb.count()
    queries = emb.where(f"vec_id < {N_QUERIES}")

    exact = truth_sets(topk_bruteforce(emb, queries, k=K))

    results: dict = {
        "sf_dir": sf_dir,
        "n_corpus": n_corpus,
        "n_queries": N_QUERIES,
        "k": K,
        "ivf": {"n_lists": N_LISTS, "sweeps": []},
        "pq": {"m": PQ_M, "k_codes": PQ_K, "variants": []},
    }

    for quantizer in ("fixed", "kmeans"):
        t0 = time.monotonic()
        centroids, assigned = ivf_index(
            emb, n_lists=N_LISTS, quantizer=quantizer, dim=DIM
        )
        assigned = assigned.persist()
        assigned.count()
        build_s = round(time.monotonic() - t0, 3)
        for nprobe in (1, 2, 4, 8, N_LISTS):
            t0 = time.monotonic()
            approx = truth_sets(
                ivf_topk(centroids, assigned, queries, k=K, nprobe=nprobe)
            )
            results["ivf"]["sweeps"].append(
                {
                    "quantizer": quantizer,
                    "nprobe": nprobe,
                    "recall_at_k": recall(approx, exact, K),
                    "search_sec": round(time.monotonic() - t0, 3),
                    "build_sec": build_s,
                }
            )
            print(f"# ivf {quantizer} nprobe={nprobe}: "
                  f"{results['ivf']['sweeps'][-1]['recall_at_k']}",
                  file=sys.stderr)
        assigned.unpersist()

    # (name, learned?, m, k): the contract-scale fixed/learned pair at the
    # oracle-checkable resolution, plus the measured quality configuration
    # (m=16/k=32 + rerank ≈ 0.92 recall@10 on this corpus).
    pq_variants = [
        ("fixed", False, PQ_M, PQ_K),
        ("learned", True, PQ_M, PQ_K),
        ("learned_m16_k32", True, 16, 32),
    ]
    for variant, learned, m, kc in pq_variants:
        t0 = time.monotonic()
        if learned:
            books = learned_codebooks(emb, "embedding", DIM, m=m, k=kc)
        else:
            books = fixed_codebooks(DIM, m=m, k=kc)
        codes = pq_encode(emb, books).persist()
        codes.count()
        build_s = round(time.monotonic() - t0, 3)
        t0 = time.monotonic()
        approx = truth_sets(pq_topk(books, codes, queries, k=K))
        adc_sec = round(time.monotonic() - t0, 3)
        t0 = time.monotonic()
        rr = truth_sets(
            pq_topk_rerank(books, codes, emb, queries, k=K, shortlist=100)
        )
        results["pq"]["variants"].append(
            {
                "codebooks": variant,
                "m": m,
                "k_codes": kc,
                "recall_at_k": recall(approx, exact, K),
                "search_sec": adc_sec,
                "rerank_shortlist": 100,
                "rerank_recall_at_k": recall(rr, exact, K),
                "rerank_search_sec": round(time.monotonic() - t0, 3),
                "build_sec": build_s,
            }
        )
        v = results["pq"]["variants"][-1]
        print(f"# pq {variant}: adc={v['recall_at_k']} "
              f"rerank={v['rerank_recall_at_k']}", file=sys.stderr)
        codes.unpersist()

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "..", "BENCH", "ann_recall.json")
    with open(os.path.abspath(out), "w") as fh:
        json.dump(results, fh, indent=2)
        fh.write("\n")
    print(json.dumps(results))
    spark.stop()


if __name__ == "__main__":
    main()
