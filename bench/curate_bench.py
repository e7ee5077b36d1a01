"""Curation-pipeline end-to-end bench (VERDICT r4 "Next round #7").

The per-operator times in bench.py measure stages in isolation; this
measures the PRODUCT composition — `operators/curate.py::curate` (LWW →
url-alias collapse → exact dedup → Gopher quality gate → PII mask →
MinHash near-dup → benchmark decontamination → multimodal media dedup)
followed by the context-window packing stage — as one wall-clock number
with per-stage row counts, on an amplified corpus with PLANTED work:

* sf documents × ``--amplify`` replicas, each with a unique 60-word
  filler (so only planted pairs are near-dups);
* replica 1 = exact text copy of replica 0, replica 2 = near-dup
  (one-token tail) — real work for both dedup stages;
* every 100th base doc's text doubles as a "benchmark" row — real work
  for decontamination;
* every 25th base doc carries an 8-member image family (binary PPM +
  baseline-JPEG re-encodes of one block image, generated worker-side in
  mapInPandas) — real decode + dHash + component work for the media
  stage, including the JPEG codec.

Usage:
  python bench/curate_bench.py [--amplify K] [--cpus N] [--sf-dir D]
                               [--out BENCH/curate_bench.json]

Single-level artifact; the multi-tenant ~1.7x host band documented in
BENCH/BASELINE.md applies.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_corpus(spark, sf_dir: str, amplify: int):
    import pyspark.sql.functions as F

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).select(
        "doc_id", "text", "lang"
    )
    reps = spark.range(amplify).withColumnRenamed("id", "r")
    # unique 60-word filler per (doc, replica) keeps cross-replica Jaccard
    # low; replicas 1/2 are planted exact/near dups of replica 0 instead
    filler = F.concat_ws(
        " ",
        F.array([
            F.concat(F.lit(f"w{i}x"), F.conv(
                F.substring(F.md5(F.concat_ws(":", "doc_id", "r",
                                              F.lit(i))), 1, 8), 16, 10))
            for i in range(60)
        ]),
    )
    base_txt = F.concat_ws(" ", F.col("text"), filler)
    t0 = F.concat_ws(
        " ", F.col("text"),
        F.concat(F.lit("anchor"), F.col("doc_id")),  # shared by r0/r1/r2
    )
    out = docs.crossJoin(reps).select(
        F.concat(F.lit("https://bench.example.com/d"), "doc_id",
                 F.lit("/r"), "r").alias("url"),
        (F.col("doc_id") * 1000 + F.col("r")).alias("warc_ts"),
        (F.col("doc_id") * 1000 + F.col("r")).alias("lsn"),
        F.when(F.col("r") == 1, t0)
        .when(F.col("r") == 2, F.concat_ws(" ", t0, F.lit("tailmarker")))
        .when(F.col("r") == 0, t0)
        .otherwise(base_txt).alias("text"),
        "lang",
    )
    bench = docs.where(F.col("doc_id") % 100 == 0).select(
        F.concat(F.lit("bench"), "doc_id").alias("bench_id"),
        F.concat_ws(
            " ", F.col("text"), F.concat(F.lit("anchor"), F.col("doc_id"))
        ).alias("text"),
    )
    return out, bench


def build_media(spark, sf_dir: str, family: int = 8):
    """8-member image families per 25th doc: one binary PPM of a block
    image + JPEG re-encodes (2 qualities, alternating 4:2:0), attached to
    the replicas' urls — the media stage must decode both containers and
    collapse each family to one surviving page."""
    import pandas as pd
    import pyspark.sql.functions as F

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).select(
        "doc_id"
    ).where(F.col("doc_id") % 25 == 0)
    reps = spark.range(family).withColumnRenamed("id", "r")
    pairs = docs.crossJoin(reps)

    def gen(batches):
        import numpy as np

        from data_pipeline_spark.operators.jpeg import encode_baseline

        for pdf in batches:
            urls, blobs, types = [], [], []
            for doc_id, r in zip(pdf["doc_id"], pdf["r"]):
                cols = [200 if (int(doc_id) >> j) & 1 else 50
                        for j in range(9)]
                px = np.repeat(
                    np.repeat(np.array([cols], np.uint8), 32, 0), 4, 1
                )
                rgb = np.stack([px] * 3, axis=2)
                if r % 3 == 0:
                    roww = b"".join(bytes((v, v, v)) * 4 for v in cols)
                    blob, mt = (b"P6\n36 32\n255\n" + roww * 32,
                                "image/x-portable-pixmap")
                else:
                    blob = encode_baseline(
                        rgb, quality=90 if r % 3 == 1 else 75,
                        subsample=bool(r % 2),
                    )
                    mt = "image/jpeg"
                urls.append(f"https://bench.example.com/d{doc_id}/r{r}")
                blobs.append(blob)
                types.append(mt)
            yield pd.DataFrame(
                {"url": urls, "content": blobs, "media_type": types}
            )

    return pairs.mapInPandas(
        gen, "url string, content binary, media_type string"
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir",
                    default=os.environ.get("SPARK_GRAFT_SF_DIR",
                                           "/root/testdata/sf0.1"))
    ap.add_argument("--amplify", type=int, default=32)
    ap.add_argument("--pack", type=int, default=1024)
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--work-dir", default="/dev/shm/cdc_bench/curate")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    os.environ.setdefault(
        "SPARK_GRAFT_LOCAL_DIR", "/dev/shm/cdc_bench/spark-local"
    )
    from data_pipeline_spark.operators.curate import CurateConfig, curate
    from data_pipeline_spark.operators.textprep import pack_sequences
    from data_pipeline_spark.session import get_spark

    spark = get_spark(
        "curate-bench", master=f"local[{args.cpus}]",
        shuffle_partitions=args.cpus,
    )
    if os.path.exists(args.work_dir):
        shutil.rmtree(args.work_dir)
    os.makedirs(args.work_dir)

    corpus, bench = build_corpus(spark, args.sf_dir, args.amplify)
    media = build_media(spark, args.sf_dir)
    # materialize inputs so generation cost never pollutes the pipeline wall
    cdir = os.path.join(args.work_dir, "corpus")
    mdir = os.path.join(args.work_dir, "media")
    corpus.repartition(args.cpus * 2).write.parquet(cdir)
    media.write.parquet(mdir)
    corpus = spark.read.parquet(cdir)
    media = spark.read.parquet(mdir)
    bench = bench.localCheckpoint(eager=True)
    n_in = corpus.count()
    n_media = media.count()

    t0 = time.monotonic()
    out, stats = curate(
        corpus, CurateConfig(media_max_hamming=8), bench=bench, media=media
    )
    curate_wall = time.monotonic() - t0

    t0 = time.monotonic()
    packs = pack_sequences(out, "url", "text", ctx_tokens=args.pack,
                           n_shards=64)
    n_packs = packs.count()
    pack_wall = time.monotonic() - t0

    summary = {
        "metric": "curate_e2e_wall_sec",
        "cpus": args.cpus,
        "sf_dir": args.sf_dir,
        "amplify": args.amplify,
        "input_docs": n_in,
        "input_media": n_media,
        "stages": stats,
        "curate_wall_sec": round(curate_wall, 3),
        "docs_per_sec": round(n_in / curate_wall, 1),
        "pack_ctx_tokens": args.pack,
        "pack_rows": n_packs,
        "pack_wall_sec": round(pack_wall, 3),
        "total_wall_sec": round(curate_wall + pack_wall, 3),
    }
    print(json.dumps(summary, indent=2))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(summary, f, indent=2)
    spark.stop()
    shutil.rmtree(args.work_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
