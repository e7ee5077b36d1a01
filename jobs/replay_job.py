"""spark-submit entrypoint for the CDC replay engine (north_rule shipping
contract: ``spark-submit --py-files dist/data_pipeline_spark.zip
jobs/replay_job.py --log-dir ... --table-dir ... --checkpoint-dir ...``).

On a real cluster you omit ``--master`` here and let spark-submit decide
(YARN/K8s); the engine code is identical — only parallelism and the object
store (S3A conf) change. Package the library with ``python jobs/package.py``
which writes ``dist/data_pipeline_spark.zip``.
"""

from __future__ import annotations

import argparse
import json
import sys


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--log-dir", required=True, help="epoch-partitioned change log")
    ap.add_argument("--table-dir", required=True, help="lake table location")
    ap.add_argument("--checkpoint-dir", required=True)
    ap.add_argument("--n-buckets", type=int, default=64)
    ap.add_argument("--max-epochs", type=int, default=None)
    ap.add_argument("--mode", default="cow", choices=["cow", "mor"],
                    help="merge mode: cow rewrites touched buckets, mor "
                         "appends winner deltas (O(epoch) commits)")
    ap.add_argument("--compact-every", type=int, default=None,
                    help="mor only: compact after every K applied epochs")
    ap.add_argument("--streaming", action="store_true",
                    help="tail via Structured Streaming (readStream + "
                         "foreachBatch merge) instead of the batch epoch loop")
    args = ap.parse_args()

    # Import AFTER spark-submit has put the --py-files zip on sys.path.
    from pyspark.sql import SparkSession

    from data_pipeline_spark.plans.registry import SchemaRegistry
    from data_pipeline_spark.streaming.checkpoint import CheckpointStore
    from data_pipeline_spark.streaming.runner import ReplayRunner, make_table_for_log

    spark = SparkSession.builder.appName("cdc-replay").getOrCreate()
    spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "true")
    # Timestamp stats for lake range pruning (INT96 has none).
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")

    registry = SchemaRegistry()
    table = make_table_for_log(
        spark, args.table_dir, registry, n_buckets=args.n_buckets
    )
    if args.streaming:
        from data_pipeline_spark.streaming.tailer import ChangeLogTailer

        results = ChangeLogTailer(
            spark, args.log_dir, table, args.checkpoint_dir,
            registry=registry, merge_mode=args.mode,
        ).run_available()
    else:
        runner = ReplayRunner(
            spark, args.log_dir, table, CheckpointStore(args.checkpoint_dir),
            registry, merge_mode=args.mode, compact_every=args.compact_every,
        )
        results = runner.run(max_epochs=args.max_epochs)
    applied = [r for r in results if not r.get("skipped")]
    print(
        json.dumps(
            {
                "epochs_seen": len(results),
                "epochs_applied": len(applied),
                "rows_merged": sum(r.get("staged_rows", 0) for r in applied),
                "table_version": table.meta["version"],
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
