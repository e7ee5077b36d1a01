"""spark-submit entrypoint: live crawl ingestion — WARC landing zone → lake.

The streaming twin of ``ingest_job.py --warc-dir`` + ``replay_job.py``
(which bootstrap through the epoch log): here new segments merge straight
into the table as they land, exactly-once across restarts:

    spark-submit --py-files dist/data_pipeline_spark.zip jobs/crawl_tail_job.py \
        --warc-dir LANDING --table-dir TBL --checkpoint-dir CP \
        [--n-buckets 64] [--mode mor] [--continuous [--timeout-sec N]] \
        [--lang en] [--normalize-charset] [--revisits]

Default drains the backlog (Trigger.AvailableNow) and exits — the cron
form; ``--continuous`` keeps tailing until stopped (or ``--timeout-sec``).
Prints one JSON line of batch metrics.
"""

from __future__ import annotations

import argparse
import json
import sys


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--warc-dir", required=True)
    ap.add_argument("--table-dir", required=True)
    ap.add_argument("--checkpoint-dir", required=True)
    ap.add_argument("--n-buckets", type=int, default=64)
    ap.add_argument("--mode", default="mor", choices=["cow", "mor"])
    ap.add_argument("--lang", default="en")
    ap.add_argument("--normalize-charset", action="store_true")
    ap.add_argument("--revisits", action="store_true")
    ap.add_argument("--continuous", action="store_true")
    ap.add_argument("--timeout-sec", type=int, default=None,
                    help="with --continuous: stop after N seconds")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from data_pipeline_spark.plans.registry import SchemaRegistry
    from data_pipeline_spark.streaming.runner import make_table_for_log
    from data_pipeline_spark.streaming.warctail import WarcTailer

    spark = SparkSession.builder.appName("crawl-tail").getOrCreate()
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    # --normalize-charset decodes dirty web bytes: replacement, not failure
    # (functions/charset.py UTF-16 branches need this; see session.py)
    spark.conf.set("spark.sql.legacy.codingErrorAction", "true")

    registry = SchemaRegistry()
    table = make_table_for_log(
        spark, args.table_dir, registry, n_buckets=args.n_buckets
    )
    tailer = WarcTailer(
        spark, args.warc_dir, table, args.checkpoint_dir, registry,
        merge_mode=args.mode, lang=args.lang,
        normalize_charset=args.normalize_charset, revisits=args.revisits,
    )
    if args.continuous:
        q = tailer.start()
        if args.timeout_sec:
            # PySpark's awaitTermination takes SECONDS (it converts to ms
            # itself — pyspark/sql/streaming/query.py)
            q.awaitTermination(args.timeout_sec)
            q.stop()
        else:
            q.awaitTermination()
        metrics = tailer.batch_metrics
    else:
        metrics = tailer.run_available()

    applied = [m for m in metrics if not m.get("skipped")]
    print(json.dumps({
        "batches_seen": len(metrics),
        "batches_applied": len(applied),
        "rows_merged": sum(m.get("staged_rows", 0) for m in applied),
        "table_version": table.meta["version"],
    }))
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
