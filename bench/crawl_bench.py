"""Crawl-planner scale benchlet: the X66-X72 family at millions of rows.

The contract queries prove 500-row correctness; this measures the shapes
that matter at fleet scale — one window + one hash agg over a skewed
synthetic CDX (30% of captures on one mega-host), then the full planning
pipeline (due-scoring → per-host fairness cap → politeness slotting).

    python bench/crawl_bench.py [--captures 2000000] [--budget 100000]

Writes BENCH/crawl_bench.json: captures/sec for stats alone and for the
end-to-end plan. Deterministic (hash-derived urls/digests, no RNG).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--captures", type=int, default=2_000_000)
    ap.add_argument("--budget", type=int, default=100_000)
    ap.add_argument("--max-per-host", type=int, default=1_000)
    ap.add_argument("--out", default=os.path.join(HERE, "..", "BENCH", "crawl_bench.json"))
    args = ap.parse_args()

    import pyspark.sql.functions as F

    from data_pipeline_spark.operators.recrawl import (
        cap_per_host,
        recrawl_stats,
        schedule_fetches,
    )
    from data_pipeline_spark.functions.weburl import url_host
    from data_pipeline_spark.session import get_spark

    spark = get_spark("crawl-bench")
    n_urls = args.captures // 4

    # skewed synthetic CDX: 4 captures per url; ~30% of urls on host 0
    ids = spark.range(n_urls).withColumn(
        "host_id",
        F.when(F.pmod(F.col("id"), 10) < 3, F.lit(0)).otherwise(
            F.pmod(F.xxhash64("id"), F.lit(10_000))
        ),
    )
    caps = ids.select(
        "id", "host_id",
        F.explode(F.array(*[F.lit(c) for c in range(4)])).alias("c"),
    ).select(
        F.concat(
            F.lit("https://h"), F.col("host_id").cast("string"),
            F.lit(".example/p/"), F.col("id").cast("string"),
        ).alias("url"),
        F.timestamp_seconds(
            F.lit(1_700_000_000) + F.pmod(F.col("id"), 86_400)
            + F.col("c") * 86_400
        ).alias("warc_ts"),
        # digest changes on ~1/3 of capture steps
        F.md5(
            F.concat(
                F.col("id").cast("string"), F.lit("#"),
                ((F.col("c") + F.pmod(F.col("id"), 3)) / 3).cast("int").cast("string"),
            )
        ).alias("payload_digest"),
    )
    caps.write.mode("overwrite").parquet("/tmp/crawl_bench_cdx")
    cdx = spark.read.parquet("/tmp/crawl_bench_cdx")
    n = cdx.count()

    def timed(fn):
        best = None
        for _ in range(2):
            spark.catalog.clearCache()
            t0 = time.monotonic()
            fn()
            dt = time.monotonic() - t0
            best = dt if best is None or dt < best else best
        return best

    t_stats = timed(lambda: recrawl_stats(cdx).agg(
        F.sum("n_changes"), F.max("due_score")).collect())

    def full_plan():
        stats = recrawl_stats(cdx).withColumn("host", url_host("url"))
        stats = stats.withColumn("priority", F.col("due_score"))
        capped = cap_per_host(stats, args.max_per_host)
        plan = capped.orderBy(F.col("priority").desc(), "url").limit(args.budget)
        plan = schedule_fetches(plan)
        plan.agg(F.count(F.lit(1)), F.max("scheduled_offset_s")).collect()

    t_plan = timed(full_plan)

    out = {
        "metric": "crawl_planner_captures_per_sec",
        "captures": n,
        "urls": n_urls,
        "budget": args.budget,
        "max_per_host": args.max_per_host,
        "stats_sec": round(t_stats, 3),
        "stats_captures_per_sec": round(n / t_stats),
        "plan_sec": round(t_plan, 3),
        "plan_captures_per_sec": round(n / t_plan),
    }
    with open(os.path.abspath(args.out), "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
