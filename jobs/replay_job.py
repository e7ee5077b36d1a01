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
    ap.add_argument("--branch", default=None,
                    help="stage every epoch commit on this WAP branch "
                         "instead of main (audit, then publish)")
    ap.add_argument("--audit-publish", action="store_true",
                    help="with --branch: run the audit checks and "
                         "fast-forward publish only if all pass (main "
                         "untouched otherwise; branch kept for forensics)")
    ap.add_argument("--audit-min-rows", type=int, default=1,
                    help="audit: branch must hold at least N rows")
    ap.add_argument("--audit-no-shrink", type=float, default=None,
                    help="audit: branch may shrink vs main by at most this "
                         "fraction (e.g. 0.1)")
    ap.add_argument("--audit-max-null-frac", default=None, metavar="COL:F",
                    help="audit: at most F of branch rows may have COL null")
    ap.add_argument("--audit-max-delete-frac", type=float, default=None,
                    help="audit: at most this fraction of branch winners "
                         "may be delete tombstones (mass-delete guard)")
    ap.add_argument("--quarantine-dir", default=None,
                    help="dead-letter poison rows (null key/lsn, unknown "
                         "op) here per epoch instead of applying them")
    ap.add_argument("--skip-unchanged", default=None, metavar="COL[,COL]",
                    help="suppress no-op updates: drop staged non-delete "
                         "rows whose listed columns equal the stored row "
                         "(re-crawl write-amplification cut; metrics gain "
                         "suppressed_unchanged)")
    ap.add_argument("--audit-sequence", action="store_true",
                    help="record per-epoch lsn continuity (holes, cross-"
                         "epoch gaps) in the checkpoint metrics — rides "
                         "the merge job, no extra pass")
    ap.add_argument("--report-store", default=None,
                    help="maintain a corpus report card (X119) alongside "
                         "the replay: each applied epoch's winners fold in "
                         "under the same epoch id (exactly-once)")
    ap.add_argument("--sample-store", default=None, metavar="DIR[:K]",
                    help="maintain a k-row uniform corpus sample (X112) "
                         "alongside the replay (default k 1024)")
    args = ap.parse_args()
    if args.audit_publish and not args.branch:
        ap.error("--audit-publish requires --branch")
    if args.streaming and args.branch:
        ap.error("--branch applies to the batch epoch loop (drop --streaming)")
    if args.streaming and (args.report_store or args.sample_store):
        ap.error("--report-store/--sample-store ride the batch epoch loop; "
                 "for streaming attach the stores' foreach_batch adapters")

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
        stores = []
        if args.report_store:
            from data_pipeline_spark.operators.reportstate import ReportStore

            stores.append(ReportStore.create(spark, args.report_store))
        if args.sample_store:
            from data_pipeline_spark.operators.samplestate import SampleStore

            spec = args.sample_store
            sdir, _, k = spec.rpartition(":")
            if sdir and k.isdigit():
                stores.append(
                    SampleStore.create(spark, sdir, table.key_col, k=int(k))
                )
            else:
                stores.append(
                    SampleStore.create(spark, spec, table.key_col, k=1024)
                )
        runner = ReplayRunner(
            spark, args.log_dir, table, CheckpointStore(args.checkpoint_dir),
            registry, merge_mode=args.mode, compact_every=args.compact_every,
            branch=args.branch, quarantine_dir=args.quarantine_dir,
            audit_sequence=args.audit_sequence,
            skip_unchanged_cols=(
                [c.strip() for c in args.skip_unchanged.split(",") if c.strip()]
                if args.skip_unchanged else None
            ),
            state_stores=stores,
        )
        results = runner.run(max_epochs=args.max_epochs)
    applied = [r for r in results if not r.get("skipped")]
    out = {
        "epochs_seen": len(results),
        "epochs_applied": len(applied),
        "rows_merged": sum(r.get("staged_rows", 0) for r in applied),
        "rows_quarantined": sum(r.get("quarantined", 0) for r in applied),
        "rows_suppressed": sum(r.get("suppressed_unchanged", 0) for r in applied),
        "table_version": table.meta["version"],
    }
    if args.audit_publish:
        from data_pipeline_spark.lake import audit as A

        checks = [A.min_rows(args.audit_min_rows)]
        if args.audit_no_shrink is not None:
            checks.append(A.no_shrink(args.audit_no_shrink))
        if args.audit_max_null_frac is not None:
            col, frac = args.audit_max_null_frac.rsplit(":", 1)
            checks.append(A.max_null_fraction(col, float(frac)))
        if args.audit_max_delete_frac is not None:
            checks.append(A.max_delete_fraction(args.audit_max_delete_frac))
        out["audit"] = A.publish_if(table, args.branch, checks)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
