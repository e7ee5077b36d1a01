"""spark-submit entrypoint for lake-table maintenance (the runbook in
README "Maintenance runbook" as one shippable job):

  spark-submit --py-files dist/data_pipeline_spark.zip jobs/maintenance_job.py \
      --table <lake table dir> \
      [--rollback-to SNAPSHOT_OR_REF] \
      [--compact] [--compact-dirty-only] [--drop-tombstones] \
      [--cluster-by COL[,COL] [--cluster-strategy linear|zorder]] \
      [--build-blooms] \
      [--purge-keys FILE] \
      [--expire-keep-last N] [--gc-orphans] [--gc-grace-seconds 3600] \
      [--minhash-index DIR] [--vector-index DIR] \
      [--sketch-store DIR [--retract-sketch-epoch N] [--compact-sketches]]

--purge-keys physically removes every stored version of the keys listed in
FILE (one key per line; blank lines ignored) — the takedown /
right-to-be-forgotten path. Combine with --expire-keep-last 1 --gc-orphans
--gc-grace-seconds 0 for complete physical erasure in one run (purge runs
before expiry/GC, so the old files holding the purged bytes are swept).

--minhash-index / --vector-index compact the persistent dedup/ANN indexes
(merge per-epoch directories; exactly-once ledgers preserved) — the same
cron can maintain the lake table and its sidecar indexes.

Operations run in the safe order: rollback first (an emergency restore the
same run's compact/expiry then operate on), then purge (so the rewritten-away bytes are
eligible for this same run's expiry+GC), then compact (collapses MoR versions; dirty
buckets only unless --compact with full rewrite wanted), then bloom build
(per-file key Bloom filters for within-bucket point-lookup skipping —
after compaction so the blooms cover the long-lived compacted files), then
snapshot expiry (history trim), then orphan-file GC (sweeps crashed-commit
debris; grace period protects in-flight writers). Each is independently
optional, so a cron can run e.g. hourly compaction and a daily expiry+GC.

Prints one JSON line of what was done (buckets compacted, snapshots
expired, orphans removed).
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--table", default=None,
                    help="lake table dir (required for table operations; "
                         "index-only maintenance may omit it)")
    ap.add_argument("--compact", action="store_true",
                    help="collapse MoR versions (full rewrite of targeted buckets)")
    ap.add_argument("--compact-dirty-only", action="store_true",
                    help="with --compact: only buckets flagged dirty by merges")
    ap.add_argument("--cluster-by", default=None, metavar="COL[,COL]",
                    help="with --compact: sort rewritten files on these "
                         "columns (range-scan clustering) instead of the key")
    ap.add_argument("--cluster-strategy", default="linear",
                    choices=("linear", "zorder"),
                    help="with --cluster-by: lexicographic sort (tightens "
                         "the leading column) or Z-order Morton interleave "
                         "(tightens every clustered column)")
    ap.add_argument("--drop-tombstones", action="store_true",
                    help="with --compact: physically drop delete markers "
                         "(ONLY after the replay horizon — no older event "
                         "can still arrive)")
    ap.add_argument("--rollback-to", default=None, metavar="SNAPSHOT_OR_REF",
                    help="restore an earlier snapshot's state as a new "
                         "commit (emergency hatch; runs FIRST so the same "
                         "run's compact/expiry operate on the restored "
                         "state); integer = snapshot id, else a tag/branch")
    ap.add_argument("--build-blooms", action="store_true",
                    help="add per-file key Bloom filters to the manifest "
                         "(stats-only commit; prunes point lookups within "
                         "a bucket where min/max can't)")
    ap.add_argument("--purge-keys", default=None, metavar="FILE",
                    help="physically purge every version of the keys listed "
                         "in FILE (one per line); add --expire-keep-last 1 "
                         "--gc-orphans for complete physical erasure")
    ap.add_argument("--ttl-older-than", default=None, metavar="ISO_TS",
                    help="physically drop rows whose event time is older "
                         "than this ISO timestamp (e.g. 2026-01-01T00:00:00;"
                         " wholly-expired files are dropped metadata-only)")
    ap.add_argument("--ttl-col", default=None, metavar="COL",
                    help="event-time column for --ttl-older-than (default: "
                         "the table's LWW order column)")
    ap.add_argument("--expire-keep-last", type=int, default=None,
                    help="expire all but the newest N snapshots")
    ap.add_argument("--gc-orphans", action="store_true",
                    help="delete data files no live snapshot references")
    ap.add_argument("--gc-grace-seconds", type=float, default=3600.0,
                    help="orphans younger than this are kept (in-flight writers)")
    ap.add_argument("--minhash-index", default=None,
                    help="compact this MinHash dedup index's epoch dirs")
    ap.add_argument("--vector-index", default=None,
                    help="compact this IVF vector index's epoch dirs")
    ap.add_argument("--drop-index-ids", default=None, metavar="FILE",
                    help="with --minhash-index/--vector-index: drop these "
                         "ids (one per line) from the index during "
                         "compaction — the sidecar half of a takedown "
                         "(derived signatures/embeddings must not keep "
                         "serving after the lake rows are purged)")
    ap.add_argument("--sketch-store", default=None,
                    help="SketchStore dir for sketch-state maintenance")
    ap.add_argument("--retract-sketch-epoch", type=int, default=None,
                    metavar="EPOCH",
                    help="with --sketch-store: net a poisoned epoch's "
                         "contribution out of the linear kinds (cms/dd) — "
                         "exactly sound from the stored per-epoch parts; "
                         "must run BEFORE --compact-sketches folds them")
    ap.add_argument("--compact-sketches", action="store_true",
                    help="with --sketch-store: collapse epoch dirs into "
                         "one merged dir per kind (ledger preserved)")
    ap.add_argument("--sample-store", default=None,
                    help="SampleStore dir for maintained-sample maintenance")
    ap.add_argument("--retract-sample-epoch", type=int, default=None,
                    metavar="EPOCH",
                    help="with --sample-store: drop a poisoned epoch's part "
                         "from the fold — EXACT un-sampling (keys ingested "
                         "in other epochs survive via their parts); must "
                         "run BEFORE --compact-samples folds the parts")
    ap.add_argument("--compact-samples", action="store_true",
                    help="with --sample-store: collapse live parts into one "
                         "folded dir (ledger preserved)")
    ap.add_argument("--report-store", default=None,
                    help="ReportStore dir for maintained-report maintenance")
    ap.add_argument("--retract-report-epoch", type=int, default=None,
                    metavar="EPOCH",
                    help="with --report-store: drop a poisoned epoch's "
                         "parts from the fold — exact for the sums AND the "
                         "HLL (per-epoch register parts refold); before "
                         "--compact-report")
    ap.add_argument("--compact-report", action="store_true",
                    help="with --report-store: collapse live parts into "
                         "one folded dir per kind (ledger preserved)")
    ap.add_argument("--rollup-state", default=None, metavar="DIR",
                    help="incrementally-maintained group-by rollup "
                         "(lake/incremental.py::IncrementalRollup): advance "
                         "it to --table's current snapshot in O(delta)")
    ap.add_argument("--rollup-group", default=None, metavar="COL[,COL]",
                    help="rollup group columns (required with --rollup-state)")
    ap.add_argument("--rollup-sum", default="", metavar="COL[,COL]",
                    help="numeric columns summed per group")
    ap.add_argument("--rollup-minmax", default="", metavar="COL[,COL]",
                    help="columns min/max-maintained per group (X125: "
                         "monotone fold + affected-group-only rescan)")
    ap.add_argument("--rollup-distinct", default="", metavar="COL[,COL]",
                    help="columns with an exact maintained per-group "
                         "count-distinct (retractable via the per-value "
                         "aux relation)")
    ap.add_argument("--rollup-distinct-mode", default="exact",
                    choices=["exact", "hll"],
                    help="'hll' swaps the exact per-value aux for "
                         "per-group HLL registers (O(groups x 2^p) state "
                         "— the high-cardinality posture; round 5); "
                         "frozen in rollup meta until --rollup-rebuild")
    ap.add_argument("--rollup-hll-p", type=int, default=12,
                    help="HLL precision for --rollup-distinct-mode hll "
                         "(2^p registers per group)")
    ap.add_argument("--rollup-rebuild", action="store_true",
                    help="full recompute (bootstrap, cursor reset, or a "
                         "maintained-column-set change)")
    ap.add_argument("--verify-export", default=None, metavar="DIR",
                    help="consumer-side shard-export integrity check "
                         "(operators/export.py::verify_shards): re-aggregate "
                         "the shards against manifest.json; exits non-zero "
                         "and lists the mismatching shard ids on corruption")
    args = ap.parse_args()
    if args.expire_keep_last is not None and args.expire_keep_last < 1:
        # keep_last=0 would be a silent no-op (list[-0:] is the whole
        # list); reject it before paying Spark startup.
        ap.error("--expire-keep-last must be >= 1 (the current snapshot stays)")
    if args.cluster_strategy != "linear" and not args.cluster_by:
        ap.error("--cluster-strategy requires --cluster-by")
    if (args.drop_tombstones or args.compact_dirty_only or args.cluster_by) \
            and not args.compact:
        # Dependent flags must not silently no-op: an operator asking for
        # tombstone removal without --compact would get exit 0 and believe
        # tombstones are being dropped.
        ap.error(
            "--drop-tombstones / --compact-dirty-only / --cluster-by "
            "require --compact"
        )
    if args.ttl_col is not None and args.ttl_older_than is None:
        ap.error("--ttl-col requires --ttl-older-than")
    if args.ttl_older_than is not None:
        from datetime import datetime as _dt

        try:
            _dt.fromisoformat(args.ttl_older_than)
        except ValueError:
            ap.error("--ttl-older-than must be an ISO timestamp")
    if args.rollup_state and not args.rollup_group:
        ap.error("--rollup-state requires --rollup-group")
    if (args.rollup_group or args.rollup_rebuild) and not args.rollup_state:
        ap.error("--rollup-group / --rollup-rebuild require --rollup-state")
    table_ops = (args.compact or args.build_blooms or args.purge_keys
                 or args.expire_keep_last is not None or args.gc_orphans
                 or args.rollback_to is not None
                 or args.ttl_older_than is not None
                 or args.rollup_state is not None)
    if table_ops and args.table is None:
        ap.error("--table is required for table operations")
    sketch_ops = args.retract_sketch_epoch is not None or args.compact_sketches
    if sketch_ops and not args.sketch_store:
        ap.error("--retract-sketch-epoch / --compact-sketches require "
                 "--sketch-store")
    if args.sketch_store and not sketch_ops:
        ap.error("--sketch-store needs an operation "
                 "(--retract-sketch-epoch / --compact-sketches)")
    sample_ops = (args.retract_sample_epoch is not None
                  or args.compact_samples)
    if sample_ops and not args.sample_store:
        ap.error("--retract-sample-epoch / --compact-samples require "
                 "--sample-store")
    if args.sample_store and not sample_ops:
        ap.error("--sample-store needs an operation "
                 "(--retract-sample-epoch / --compact-samples)")
    report_ops = (args.retract_report_epoch is not None
                  or args.compact_report)
    if report_ops and not args.report_store:
        ap.error("--retract-report-epoch / --compact-report require "
                 "--report-store")
    if args.report_store and not report_ops:
        ap.error("--report-store needs an operation "
                 "(--retract-report-epoch / --compact-report)")
    if (not table_ops and not args.minhash_index and not args.vector_index
            and not sketch_ops and not sample_ops and not report_ops
            and not args.verify_export):
        ap.error("nothing to do: pass at least one maintenance operation")
    if args.drop_index_ids and not (args.minhash_index or args.vector_index):
        ap.error("--drop-index-ids requires --minhash-index or --vector-index")

    # Import AFTER spark-submit has put the --py-files zip on sys.path.
    from pyspark.sql import SparkSession

    from data_pipeline_spark.lake.table import LakeTable

    spark = SparkSession.builder.appName("lake-maintenance").getOrCreate()
    # Timestamp stats for lake range pruning (INT96 has none).
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    table = LakeTable.load(spark, args.table) if args.table else None
    done: dict = {"metric": "lake_maintenance", "table": args.table}

    if args.rollback_to is not None:
        if args.rollback_to.isdigit():
            snap = table.rollback_to(int(args.rollback_to))
        else:
            snap = table.rollback_to(ref=args.rollback_to)
        done["rolled_back_to"] = args.rollback_to
        done["rollback_snapshot_id"] = snap["snapshot_id"]
    if args.purge_keys:
        with open(args.purge_keys, encoding="utf-8") as f:
            keys = [ln.strip() for ln in f if ln.strip()]
        res = table.purge_keys(keys)
        done["purged_keys"] = len(keys)
        done["purge_rows_removed"] = res["rows_removed"]
        done["purge_files_rewritten"] = res["files_rewritten"]
    if args.ttl_older_than is not None:
        from datetime import datetime

        res = table.apply_ttl(
            datetime.fromisoformat(args.ttl_older_than), ts_col=args.ttl_col
        )
        done["ttl_rows_removed"] = res["rows_removed"]
        done["ttl_files_dropped"] = res["files_dropped"]
        done["ttl_files_rewritten"] = res["files_rewritten"]
    if args.compact:
        buckets = table.dirty_buckets() if args.compact_dirty_only else None
        if buckets == [] and not table.has_legacy_files():
            # Clean table (the cron steady state): skip entirely — an empty
            # compact would still run a write job and commit a no-op
            # snapshot every run, churning history out of --expire-keep-last.
            # (With legacy-spec files pending migration the empty list is
            # NOT a skip: compact(buckets=[]) selects exactly those files.)
            done["compacted_buckets"] = []
        else:
            table.compact(
                buckets=buckets,
                drop_tombstones=args.drop_tombstones,
                cluster_by=(
                    args.cluster_by.split(",") if args.cluster_by else None
                ),
                cluster_strategy=args.cluster_strategy,
            )
            done["compacted_buckets"] = (
                sorted(buckets) if buckets is not None else "all"
            )
    if args.build_blooms:
        done["blooms_built"] = table.build_blooms()["built"]
    if args.expire_keep_last is not None:
        done["expired_snapshots"] = table.expire_snapshots(
            keep_last=args.expire_keep_last
        )
    if args.gc_orphans:
        done["orphans_removed"] = table.remove_orphan_files(
            grace_seconds=args.gc_grace_seconds
        )
    drop_ids = None
    if args.drop_index_ids:
        with open(args.drop_index_ids, encoding="utf-8") as f:
            raw = [ln.strip() for ln in f if ln.strip()]
        # ids are stored typed: parse ints when every line is one.
        drop_ids = [int(x) for x in raw] if all(
            x.lstrip("-").isdigit() for x in raw
        ) else raw
    if args.minhash_index:
        from data_pipeline_spark.operators.dedup_index import MinHashDedupIndex

        done["minhash_index_compact"] = MinHashDedupIndex.load(
            spark, args.minhash_index
        ).compact(drop_ids=drop_ids)
    if args.vector_index:
        from data_pipeline_spark.operators.vector_index import IVFVectorIndex

        if drop_ids and not all(isinstance(i, int) for i in drop_ids):
            ap.error("--drop-index-ids for --vector-index must be integer ids")
        done["vector_index_compact"] = IVFVectorIndex.load(
            spark, args.vector_index
        ).compact(drop_ids=drop_ids)

    if args.sketch_store:
        from data_pipeline_spark.operators.sketchstate import SketchStore

        store = SketchStore.load(spark, args.sketch_store)
        # retract BEFORE compaction: compaction folds the per-epoch parts
        # a retraction needs (enforced by retract_epoch itself too)
        if args.retract_sketch_epoch is not None:
            done["sketch_retracted_epoch"] = args.retract_sketch_epoch
            done["sketch_retraction_id"] = store.retract_epoch(
                args.retract_sketch_epoch
            )
        if args.compact_sketches:
            done["sketch_compact"] = store.compact()

    if args.sample_store:
        from data_pipeline_spark.operators.samplestate import SampleStore

        sstore = SampleStore.load(spark, args.sample_store)
        # retract BEFORE compaction: compaction folds the per-epoch parts
        # a retraction needs (enforced by retract_epoch itself too)
        if args.retract_sample_epoch is not None:
            done["sample_retracted_epoch"] = args.retract_sample_epoch
            done["sample_retraction_id"] = sstore.retract_epoch(
                args.retract_sample_epoch
            )
        if args.compact_samples:
            done["sample_compact"] = sstore.compact()

    if args.report_store:
        from data_pipeline_spark.operators.reportstate import ReportStore

        rstore = ReportStore.load(spark, args.report_store)
        if args.retract_report_epoch is not None:
            done["report_retracted_epoch"] = args.retract_report_epoch
            done["report_retraction_id"] = rstore.retract_epoch(
                args.retract_report_epoch
            )
        if args.compact_report:
            done["report_compact"] = rstore.compact()

    if args.rollup_state:
        from data_pipeline_spark.lake.incremental import IncrementalRollup

        roll = IncrementalRollup(
            spark, table,
            [c for c in args.rollup_group.split(",") if c],
            [c for c in args.rollup_sum.split(",") if c],
            args.rollup_state,
            minmax_cols=[c for c in args.rollup_minmax.split(",") if c],
            distinct_cols=[c for c in args.rollup_distinct.split(",") if c],
            distinct_mode=args.rollup_distinct_mode,
            hll_p=args.rollup_hll_p,
        )
        done["rollup_refresh"] = roll.refresh(rebuild=args.rollup_rebuild)

    if args.verify_export:
        from data_pipeline_spark.operators.export import verify_shards

        bad = verify_shards(spark, args.verify_export)
        bad_ids = sorted(
            r["shard_id"] for r in bad.select("shard_id").collect()
        )
        done["export_verified"] = not bad_ids
        done["export_bad_shards"] = bad_ids
        if bad_ids:
            print(json.dumps(done))
            spark.stop()
            raise SystemExit(3)

    print(json.dumps(done))
    spark.stop()


if __name__ == "__main__":
    main()
