"""spark-submit entrypoint for key-scoped table repair (X58):

    spark-submit --py-files dist/data_pipeline_spark.zip jobs/repair_job.py \
        --log-dir ... --table-dir ... --checkpoint-dir ... \
        --bad-epochs 12,13,14 --repair-id 1 --audit-no-shrink 0.1

Recomputes the keys the bad epochs touched from their full applied history
(current code = the fixed transform), stages on a WAP branch, audits, and
publishes only if every check passes — see
``data_pipeline_spark/streaming/repair.py`` for semantics and scale posture.
``--no-publish`` stages + audits but leaves the branch for inspection.

Snapshot reconciliation mode (X64) — heal the replica against an
authoritative source snapshot instead of a bad epoch range:

    spark-submit ... jobs/repair_job.py \
        --table-dir ... --reconcile-snapshot /path/to/source.parquet \
        --repair-id 2 --audit-no-shrink 0.1

The snapshot parquet must carry every logical column of the table;
``--log-dir``/``--checkpoint-dir``/``--bad-epochs`` are not used in this
mode.
"""

from __future__ import annotations

import argparse
import json
import sys


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--log-dir", default=None, help="epoch-partitioned change log")
    ap.add_argument("--table-dir", required=True, help="existing lake table")
    ap.add_argument("--checkpoint-dir", default=None,
                    help="the replay runner's checkpoint store (defines "
                         "which epochs count as applied)")
    ap.add_argument("--bad-epochs", default=None,
                    help="comma-separated epoch ids or A-B ranges, e.g. 3,5-7")
    ap.add_argument("--reconcile-snapshot", default=None, metavar="PARQUET",
                    help="authoritative source snapshot; heals the replica "
                         "against it instead of repairing a bad epoch range")
    ap.add_argument("--repair-id", type=int, default=0,
                    help="idempotency id: re-running the same repair-id "
                         "skips (own ledger space, disjoint from log epochs)")
    ap.add_argument("--branch", default=None,
                    help="WAP branch name (default repair-<repair-id>)")
    ap.add_argument("--no-publish", action="store_true",
                    help="stage + audit only; keep the branch for review")
    ap.add_argument("--audit-min-rows", type=int, default=1)
    ap.add_argument("--audit-no-shrink", type=float, default=None,
                    help="branch may shrink vs main by at most this fraction")
    ap.add_argument("--audit-max-null-frac", default=None, metavar="COL:F")
    args = ap.parse_args()

    if args.reconcile_snapshot is None:
        for req in ("log_dir", "checkpoint_dir", "bad_epochs"):
            if getattr(args, req) is None:
                ap.error(f"--{req.replace('_', '-')} is required "
                         "(or pass --reconcile-snapshot)")
        epochs: list[int] = []
        for part in args.bad_epochs.split(","):
            part = part.strip()
            if "-" in part:
                lo, hi = part.split("-", 1)
                epochs.extend(range(int(lo), int(hi) + 1))
            elif part:
                epochs.append(int(part))
        if not epochs:
            ap.error("--bad-epochs is empty")

    # Import AFTER spark-submit has put the --py-files zip on sys.path.
    from pyspark.sql import SparkSession

    from data_pipeline_spark.lake import audit as A
    from data_pipeline_spark.lake.table import LakeTable
    from data_pipeline_spark.streaming.checkpoint import CheckpointStore
    from data_pipeline_spark.streaming.repair import reconcile_snapshot, repair_keys

    spark = SparkSession.builder.appName("cdc-repair").getOrCreate()
    spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "true")
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")

    checks = [A.min_rows(args.audit_min_rows)]
    if args.audit_no_shrink is not None:
        checks.append(A.no_shrink(args.audit_no_shrink))
    if args.audit_max_null_frac is not None:
        col, frac = args.audit_max_null_frac.rsplit(":", 1)
        checks.append(A.max_null_fraction(col, float(frac)))

    table = LakeTable.load(spark, args.table_dir)
    if args.reconcile_snapshot is not None:
        metrics = reconcile_snapshot(
            spark,
            spark.read.parquet(args.reconcile_snapshot),
            table,
            reconcile_id=args.repair_id,
            branch=args.branch,
            checks=checks,
            publish=not args.no_publish,
        )
    else:
        metrics = repair_keys(
            spark,
            args.log_dir,
            table,
            CheckpointStore(args.checkpoint_dir),
            bad_epochs=epochs,
            repair_id=args.repair_id,
            branch=args.branch,
            checks=checks,
            publish=not args.no_publish,
        )
    print(json.dumps(metrics))
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
