"""spark-submit entrypoint for lake→lake incremental sync (X32): maintain
a filtered/transformed downstream copy of a lake table at O(changes)
refresh cost.

    spark-submit --py-files dist/data_pipeline_spark.zip jobs/sync_job.py \
        --source-dir s3a://lake/pages --target-dir s3a://lake/pages_en \
        --predicate "lang = 'en'" [--select url,warc_ts,text] \
        [--rebuild] [--mode cow|mor] [--continuous --interval '30 seconds']

One-shot mode runs a single refresh and prints a JSON result line (cron
it); --continuous drives refreshes from a Structured Streaming rate
clock until killed. The cursor lives in the target's own commit
summaries (pinned by the sync-cursor tag), so re-running after a crash
resumes exactly where the last atomic commit left off.
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--source-dir", required=True)
    ap.add_argument("--target-dir", required=True,
                    help="created with the source's (or --select'ed) "
                         "schema if it does not exist")
    ap.add_argument("--predicate", default=None,
                    help="SQL filter on source rows; rows leaving the view "
                         "are DELETED from the target")
    ap.add_argument("--select", default=None, metavar="COL[,COL]",
                    help="project the target to these columns (must keep "
                         "the key and order columns)")
    ap.add_argument("--mode", default="cow", choices=["cow", "mor"])
    ap.add_argument("--rebuild", action="store_true",
                    help="converge via one full MERGE with by-source "
                         "deletes (use after an expired-cursor error)")
    ap.add_argument("--n-buckets", type=int, default=None,
                    help="target bucket count (default: source's)")
    ap.add_argument("--continuous", action="store_true")
    ap.add_argument("--interval", default="30 seconds",
                    help="with --continuous: processing-time trigger")
    args = ap.parse_args()

    # Import AFTER spark-submit has put the --py-files zip on sys.path.
    from pyspark.sql import SparkSession
    from pyspark.sql.types import StructType

    from data_pipeline_spark.lake.sync import StreamingTableSync, TableSync
    from data_pipeline_spark.lake.table import LakeTable

    spark = SparkSession.builder.appName("lake-sync").getOrCreate()
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")

    source = LakeTable.load(spark, args.source_dir)
    cols = args.select.split(",") if args.select else None
    if cols is not None:
        missing = [c for c in (source.key_col, source.order_col) if c not in cols]
        if missing:
            ap.error(f"--select must keep key/order columns {missing}")
        tgt_schema = StructType(
            [f for f in source.schema.fields if f.name in set(cols)]
        )
        transform = lambda df: df.select(*cols)  # noqa: E731
    else:
        tgt_schema = source.schema
        transform = None
    target = LakeTable.create(
        spark, args.target_dir, tgt_schema,
        key_col=source.key_col,
        n_buckets=args.n_buckets or source.n_buckets,
        order_col=source.order_col,
    )
    sync = TableSync(source, target, transform=transform, predicate=args.predicate)

    if args.continuous:
        stream = StreamingTableSync(sync, mode=args.mode)
        q = stream.start(args.target_dir + "/_sync_clock_cp", interval=args.interval)
        q.awaitTermination()
        return
    res = sync.refresh(rebuild=args.rebuild, mode=args.mode)
    print(json.dumps({
        "metric": "lake_sync",
        "skipped": bool(res.get("skipped")),
        "synced_to": res.get("synced_to"),
        "rebuilt": bool(res.get("rebuilt")),
        "target_rows": target.read().count(),
    }))


if __name__ == "__main__":
    main()
