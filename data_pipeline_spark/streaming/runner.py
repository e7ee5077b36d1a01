"""Replay runner: the epoch loop — tail → parse/extract → LWW dedup → merge.

Generalizes the reference's ``--from-storage`` replay
(/root/reference/src/main.rs:386-457): instead of "reprocess the newest raw
file wholesale", the runner applies the change log epoch by epoch, each epoch
as one idempotent merge commit, resumable from the checkpoint store.

Per-epoch dataflow (all lazy until the merge write):

    read_epoch (partition-pruned scan)
      → schema-registry check (evolve table if the epoch carries a new
        schema_version)
      → HTML→text extraction (Arrow-batched pandas UDF; deletes skipped)
      → per-url (warc_ts, lsn) LWW via map-side-combinable max_by
      → LakeTable.merge (bucket-pruned, atomic, epoch-keyed)
      → checkpoint record (lineage + metrics)

Scale posture: nothing here collects row data to the driver; per-epoch work
is proportional to the epoch; the merge prunes target buckets; extraction is
vectorized; LWW is partial-agg combinable so hot urls don't stall a reducer.
"""

from __future__ import annotations

import os
import time

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructField, StructType

from ..functions.extract import extract_text_udf
from ..lake.table import LakeTable
from ..operators.dedup import lww_dedup
from ..plans.registry import SchemaRegistry
from ..sources import changelog
from .checkpoint import CheckpointStore


def _schemas_equal(a: StructType, b: StructType) -> bool:
    return [(f.name, f.dataType) for f in a.fields] == [
        (f.name, f.dataType) for f in b.fields
    ]


def maybe_evolve(
    table: LakeTable,
    registry: SchemaRegistry | None,
    df: DataFrame,
    max_v: int | None = None,
    epoch: int | None = None,
) -> None:
    """Evolve the table schema in-flight if ``df`` carries a schema_version
    the registry maps to a NEWER table schema (north_star schema evolution;
    reference analog: FieldClassifier's canonical mapping,
    /root/reference/src/processor/field_classifier.rs:196-232).

    Evolution is strictly forward: the table's effective registry version is
    the highest registered version whose schema matches the current table
    schema, and only a higher observed ``schema_version`` evolves — a late
    backfill of an old-schema epoch after evolution must NOT downgrade the
    table (its rows still align at scan).

    ``max_v`` normally comes from parquet footer stats (driver-side, no
    Spark job); the fallback is one scalar aggregate — and once the table
    sits at the registry's highest version (the steady state of a long
    tail), the check returns before that aggregate, so per-micro-batch
    cost is zero Spark jobs.
    """
    if registry is None or "schema_version" not in df.columns:
        return
    current = table.schema
    cur_v = max(
        (v for v, s in registry.table_schemas.items() if _schemas_equal(s, current)),
        default=0,
    )
    if cur_v >= max(registry.table_schemas):
        return  # already at the registry's top schema — nothing to observe
    if max_v is None:
        max_v = df.agg(F.max("schema_version")).collect()[0][0]
    if max_v is None or int(max_v) <= cur_v:
        return
    desired = registry.table_schema(int(max_v))
    if not _schemas_equal(desired, current):
        summary = {"schema-version": int(max_v)}
        if epoch is not None:
            summary["engine.evolve-epoch"] = epoch
        table.evolve(desired, summary=summary)


def stage_changes(spark: SparkSession, df: DataFrame, table: LakeTable) -> DataFrame:
    """The shared staging pipeline: project to table columns → per-key
    (warc_ts, lsn) LWW dedup → HTML→text extraction on the winners only.

    Used by both the batch epoch loop (:class:`ReplayRunner`) and the
    Structured Streaming tailer (:class:`streaming.tailer.ChangeLogTailer`) —
    one implementation, so the two ingestion modes cannot drift.
    """
    table_cols = [f.name for f in table.schema.fields]
    staged_cols = ["op", table.key_col, "lsn", "warc_ts"] + [
        c for c in table_cols if c in df.columns and c not in
        ("op", table.key_col, "lsn", "warc_ts")
    ]
    staged = lww_dedup(
        df.select(*staged_cols),
        key_cols=(table.key_col,),
        order_cols=("warc_ts", "lsn"),
    )

    # Typed parse + extraction AFTER dedup: the winner per key is chosen
    # by (warc_ts, lsn) alone, so extracting only winners is semantically
    # identical and cuts the Python-UDF work from O(epoch events) to
    # O(distinct keys). text = byte-exact extractor over html
    # (vectorized; deletes have null html → null text).
    if "text" in table_cols and "text" not in staged.columns:
        # Explicit numPartitions: AQE's byte-based coalescing would shrink
        # this stage to a handful of tasks (winner rows are small), but
        # the pandas-UDF cost is per ROW, not per byte — without this the
        # extraction stage can't use the cluster (measured: 6 tasks on 32
        # cores). 2×parallelism keeps stragglers short on skewed buckets.
        par = spark.sparkContext.defaultParallelism
        staged = staged.repartition(par * 2, F.col(table.key_col))
        xt = extract_text_udf()
        staged = staged.withColumn(
            "text", F.when(F.col("html").isNotNull(), xt(F.col("html")))
        )
    return staged


VALID_OPS = ("insert", "update", "delete")


def split_poison(
    df: DataFrame, key_col: str, op_col: str = "op", lsn_col: str = "lsn"
) -> tuple[DataFrame, DataFrame]:
    """Split an epoch into (good, poison): poison rows have a null key, a
    null lsn, or an unknown op — any of which would silently corrupt the
    merge (a null-key LWW group, an un-orderable event, an op the merge
    can't classify). Returns poison with a ``_reason`` column; both frames
    are filters over the same scan (no extra shuffle)."""
    null_key = F.col(key_col).isNull()
    null_lsn = F.col(lsn_col).isNull()
    bad_op = ~F.coalesce(F.col(op_col).isin(*VALID_OPS), F.lit(False))
    bad = null_key | null_lsn | bad_op
    reason = (
        F.when(null_key, F.lit("null_key"))
        .when(null_lsn, F.lit("null_lsn"))
        .otherwise(F.lit("unknown_op"))
    )
    return (
        df.where(~F.coalesce(bad, F.lit(True))),
        df.where(F.coalesce(bad, F.lit(True))).withColumn("_reason", reason),
    )


#: driver-side per-batch metrics ring buffer size (log + wire tailers):
#: a 24/7 tail appends one dict per micro-batch forever; keep the most
#: recent window instead of leaking driver memory
METRICS_KEEP = 10_000


def write_dlq(poison: DataFrame, quarantine_dir: str, batch_id: int) -> int:
    """Write one micro-batch's poison rows to the dead-letter directory,
    keyed by batch id (overwrite ⇒ idempotent across batch re-execution);
    returns the row count, observed on the write job itself (no second
    pass). Shared by the log tailer and the wire tailer so the DLQ
    convention cannot drift between them."""
    from pyspark.sql import Observation

    qobs = Observation()
    poison.observe(qobs, F.count(F.lit(1)).alias("n")).write.mode(
        "overwrite"
    ).parquet(os.path.join(quarantine_dir, f"batch={batch_id}"))
    return int(qobs.get["n"])


class ReplayRunner:
    def __init__(
        self,
        spark: SparkSession,
        log_dir: str,
        table: LakeTable,
        checkpoints: CheckpointStore,
        registry: SchemaRegistry | None = None,
        merge_mode: str = "cow",
        compact_every: int | None = None,
        branch: str | None = None,
        quarantine_dir: str | None = None,
        audit_sequence: bool = False,
        skip_unchanged_cols: list[str] | None = None,
        state_stores: list | None = None,
    ):
        """``merge_mode``: "cow" rewrites touched buckets per epoch (reads
        stay cheap); "mor" appends winner deltas per epoch — O(epoch)
        commits, the high-ingest-rate posture — with ``compact_every``
        controlling how many applied epochs pass between compactions.

        ``branch`` stages every epoch commit on a WAP branch (created if
        absent): main's readers see nothing until the caller audits
        ``table.read(ref=branch)`` and ``table.fast_forward(branch)``.

        ``quarantine_dir`` opts into per-epoch dead-lettering: rows that
        would corrupt the merge (null key, null lsn, unknown op) are
        written to ``quarantine_dir/epoch=N`` with a ``_reason`` column
        and counted in the epoch metrics instead of entering the table —
        at 10^10 events a poison row must be isolated with provenance,
        never applied and never fatal. Default (None) preserves the raw
        pass-through behavior.

        ``audit_sequence`` records per-epoch lsn-continuity evidence in the
        checkpoint metrics at ZERO extra Spark jobs (the stats ride the
        merge job as a CollectMetrics observation): ``lsn_min``/``lsn_max``,
        ``seq_missing_est`` (holes inside the epoch's lsn range — exact when
        the source assigns unique lsns; redelivered duplicates make it an
        underestimate, which the LWW merge absorbs anyway) and
        ``seq_gap_from_prev`` (lsns lost BETWEEN epochs — the silent-data-
        loss signal a 10^10-event tail must surface). Resume re-seeds the
        previous high-water from the last applied epoch's record. Detection
        only (metrics, not failure): dropping events is the transport's
        bug to page on, not a reason to wedge the pipeline; the detailed
        hole listing is :func:`operators.flowstats.sequence_gap_intervals`
        scoped to the flagged epochs.

        ``skip_unchanged_cols`` opts into no-op-update suppression
        (:func:`lake.merge.filter_unchanged`): staged non-delete rows whose
        listed columns null-safely equal the stored row are dropped before
        the merge, and the per-epoch metrics gain ``suppressed_unchanged``.
        The big write-amplification lever for re-crawl-heavy tails — see
        filter_unchanged's docstring for the (ts, lsn)-advancement caveat.

        ``state_stores`` rides maintained state alongside the replay:
        after each applied epoch, every store's ``update(df, epoch)`` is
        fed that epoch's NON-DELETE staged winners under the SAME epoch
        id — so the sketch/sample/report stores (X106/X112/X119) stay
        current at O(batch) with no second pass over the log, and their
        own exactly-once ledgers make a crash-retried epoch a no-op.
        The stores observe the INGESTED winner stream (what this epoch
        asserted), not post-merge table state: rows later deleted stay
        in the observation counts, and a poisoned epoch is un-ingested
        with each store's ``retract_epoch`` — the documented semantics
        of every store in the family."""
        self.spark = spark
        self.log_dir = log_dir
        self.table = table
        self.checkpoints = checkpoints
        self.registry = registry
        self.merge_mode = merge_mode
        self.compact_every = compact_every
        self.branch = branch
        self.quarantine_dir = quarantine_dir
        self.audit_sequence = audit_sequence
        self.skip_unchanged_cols = skip_unchanged_cols
        self.state_stores = list(state_stores or [])
        # lazy: re-seeded from the last applied epoch's record on resume
        self._prev_lsn_max: int | None = None
        self._prev_seeded = False
        if branch is not None and branch not in table.meta.get("branches", {}):
            table.create_branch(branch)
        self._applied_since_compact = 0
        # Log-schema cache: skips the per-epoch schema-inference job. Reset
        # whenever footer stats show a schema_version change (the epoch may
        # carry physically new columns).
        self._log_schema = None
        self._seen_version: int | None = None

    # -- schema evolution -------------------------------------------------

    def _maybe_evolve(
        self, epoch_df: DataFrame, epoch: int, max_v: int | None = None
    ) -> None:
        maybe_evolve(self.table, self.registry, epoch_df, max_v=max_v, epoch=epoch)

    # -- one epoch ----------------------------------------------------------

    def apply_epoch(self, epoch: int) -> dict:
        """Apply one epoch exactly once; returns the metrics record."""
        if self.checkpoints.is_done(epoch):
            return {"epoch": epoch, "skipped": True, "reason": "checkpointed"}
        t0 = time.monotonic()
        # Footer stats first (driver-side): they both drive schema evolution
        # and tell us whether the cached log schema is still safe to reuse.
        max_v = changelog.epoch_column_max(self.log_dir, epoch, "schema_version")
        fresh = (
            self._log_schema is None
            or max_v is None
            or max_v != self._seen_version
        )
        df = changelog.read_epoch(
            self.spark, self.log_dir, epoch,
            schema=None if fresh else self._log_schema,
        )
        if fresh:
            self._log_schema = df.schema
            self._seen_version = max_v
        self._maybe_evolve(df, epoch, max_v=max_v)

        n_quarantined = 0
        if self.quarantine_dir is not None:
            good, poison = split_poison(df, self.table.key_col)
            qdir = os.path.join(self.quarantine_dir, f"epoch={epoch}")
            # Count rides the write job (no extra pass over the epoch).
            from pyspark.sql import Observation

            qobs = Observation()
            poison.observe(qobs, F.count(F.lit(1)).alias("n")).write.mode(
                "overwrite"
            ).parquet(qdir)
            n_quarantined = qobs.get["n"]
            df = good

        sobs = None
        if self.audit_sequence:
            if not self._prev_seeded:
                last = self.checkpoints.last_epoch()
                rec = self.checkpoints.get(last) if last is not None else None
                if rec and rec.get("lsn_max") is not None:
                    self._prev_lsn_max = int(rec["lsn_max"])
                self._prev_seeded = True
            from pyspark.sql import Observation

            sobs = Observation()
            df = df.observe(
                sobs,
                F.min(F.col("lsn").cast("long")).alias("lsn_min"),
                F.max(F.col("lsn").cast("long")).alias("lsn_max"),
                F.count(F.col("lsn")).alias("lsn_n"),
            )

        staged = stage_changes(self.spark, df, self.table)

        sup_obs = None
        if self.skip_unchanged_cols:
            from pyspark.sql import Observation

            from data_pipeline_spark.lake.merge import filter_unchanged

            sup_obs = Observation()
            staged = filter_unchanged(
                self.table, staged, self.skip_unchanged_cols,
                observation=sup_obs,
            )

        # Lineage: the exact files read for this epoch (per-partition offsets
        # of a file-based log).
        epoch_dir = os.path.join(self.log_dir, f"epoch={epoch}")
        input_files = (
            sorted(fn for fn in os.listdir(epoch_dir) if fn.endswith(".parquet"))
            if os.path.isdir(epoch_dir)
            else []
        )
        input_bytes = sum(
            os.path.getsize(os.path.join(epoch_dir, fn)) for fn in input_files
        )

        if self.state_stores:
            # The store updates re-materialize the staged lineage AFTER the
            # merge — without a cache that re-runs per-key dedup and the
            # extract UDF (the replay's dominant kernel) once per store.
            # Persist the winner frame across merge + store updates; the
            # epoch's winners are O(distinct keys), not O(events).
            staged = staged.persist()
        try:
            merge_metrics = self.table.merge(
                staged, epoch=epoch, mode=self.merge_mode, branch=self.branch
            )
            if self.state_stores:
                # Deliver the epoch to the stores UNCONDITIONALLY, even when
                # the table merge skipped as already-committed: a crash (or a
                # store.update failure) between the table commit and the store
                # updates would otherwise strand the stores one epoch behind
                # forever — the retried epoch arrives with skipped=True and
                # the old gate dropped it. Each store keeps its own
                # exactly-once epoch ledger, so re-delivery of an epoch a
                # store already folded is a no-op on the store side.
                winners = staged.where(F.col("op") != "delete")
                for store in self.state_stores:
                    store.update(winners, epoch=epoch)
        finally:
            if self.state_stores:
                staged.unpersist()
        if not merge_metrics.get("skipped"):
            self._applied_since_compact += 1
            if (
                self.compact_every
                and self._applied_since_compact >= self.compact_every
                # Compaction operates on MAIN's head; under WAP staging it
                # belongs after fast_forward (the maintenance job), not
                # mid-stage on the branch.
                and self.branch is None
            ):
                # Partial compaction: only buckets that accumulated files —
                # keeps periodic maintenance O(dirty), not O(table). Legacy
                # bucket-spec files (post-rescale) are swept by the same
                # call even with an otherwise-clean bucket list.
                dirty = self.table.dirty_buckets()
                if dirty or self.table.has_legacy_files():
                    self.table.compact(buckets=dirty)
                self._applied_since_compact = 0
        seq_fields: dict = {}
        if sobs is not None and not merge_metrics.get("skipped"):
            got = sobs.get
            lsn_min, lsn_max, lsn_n = got["lsn_min"], got["lsn_max"], got["lsn_n"]
            if lsn_min is not None:
                missing = max(0, int(lsn_max) - int(lsn_min) + 1 - int(lsn_n))
                gap = (
                    int(lsn_min) - self._prev_lsn_max - 1
                    if self._prev_lsn_max is not None
                    else None
                )
                seq_fields = {
                    "lsn_min": int(lsn_min),
                    "lsn_max": int(lsn_max),
                    "seq_missing_est": missing,
                    "seq_gap_from_prev": gap,
                }
                self._prev_lsn_max = (
                    max(self._prev_lsn_max, int(lsn_max))
                    if self._prev_lsn_max is not None
                    else int(lsn_max)
                )
        sup_fields: dict = {}
        if sup_obs is not None and not merge_metrics.get("skipped"):
            got = sup_obs.get
            sup_fields = {
                "suppressed_unchanged": int(got["suppressed"] or 0),
                "staged_before_suppress": int(got["staged_total"]),
            }
        record = {
            "skipped": False,
            "input_files": input_files,
            "input_bytes": input_bytes,
            "quarantined": int(n_quarantined),
            **sup_fields,
            **seq_fields,
            "duration_sec": round(time.monotonic() - t0, 3),
            "table_version": self.table.meta["version"],
            **merge_metrics,
        }
        self.checkpoints.record(epoch, record)
        return {"epoch": epoch, **record}

    # -- the loop ---------------------------------------------------------------

    def run(
        self, max_epochs: int | None = None, retries: int = 0, base_ms: int = 1000
    ) -> list[dict]:
        """Replay all unapplied epochs in order; resumable at any point.

        ``retries`` > 0 wraps each epoch in exponential-backoff retry (S6,
        reference html_fetcher.rs:169-193). Safe under exactly-once: if a
        failure happened AFTER the commit, the retry hits the epoch ledger
        and skips — retry composes with idempotence, never duplicates.
        """
        from .retry import with_retries

        results = []
        epochs = changelog.list_epochs(self.spark, self.log_dir)
        for epoch in epochs:
            if max_epochs is not None and len(results) >= max_epochs:
                break
            if retries:
                results.append(
                    with_retries(
                        lambda e=epoch: self.apply_epoch(e),
                        max_retries=retries,
                        base_ms=base_ms,
                        seed=epoch,
                    )
                )
            else:
                results.append(self.apply_epoch(epoch))
        return results


def make_table_for_log(
    spark: SparkSession,
    path: str,
    registry: SchemaRegistry,
    schema_version: int = 1,
    key_col: str = "url",
    n_buckets: int = 16,
) -> LakeTable:
    """Create the lake table with the registry's schema for ``schema_version``."""
    return LakeTable.create(
        spark, path, registry.table_schema(schema_version), key_col=key_col,
        n_buckets=n_buckets,
    )


def bootstrap_from_snapshot(
    spark: SparkSession,
    snapshot: DataFrame,
    table: LakeTable,
    checkpoints: CheckpointStore,
    epoch: int = 0,
) -> dict:
    """Debezium initial-snapshot bootstrap: apply a consistent source
    snapshot as ONE exactly-once epoch commit, after which the WAL tail
    replays as epochs > ``epoch``.

    Rows missing an ``op`` column are treated as inserts (the wire
    equivalent: Debezium snapshot events carry op 'r', which
    ``sources.debezium.parse_debezium`` already maps to insert). Each row
    should carry its true per-row ``(warc_ts, lsn)``: the merge's GLOBAL
    LWW then makes at-least-once redelivery WITHIN the tail harmless, and
    redelivered pre-snapshot events lose to the snapshot image of any
    live key. Tombstones are the one thing to get right, because LWW
    orders by EVENT time first and the tail arrives in ARRIVAL order:

    - Lake-to-lake bootstrap (exact under arbitrary out-of-order event
      time): include each deleted key's winning delete event as an
      ``op='delete'`` row — the merge persists it as a tombstone, so a
      later-arriving event with an older ``warc_ts`` still loses. This is
      the Cassandra gc_grace argument: drop tombstones only past the
      late-event horizon.
    - Wire snapshot (Debezium-style, no tombstones available): correct
      under the standard contract — the tail starts at the consistent
      point AND pre-snapshot-deleted keys see no post-snapshot events
      with pre-delete event times. Late events can otherwise resurrect a
      key whose delete history exists only in the discarded prefix.

    Re-running the bootstrap hits the epoch ledger and skips
    (exactly-once).
    """
    df = snapshot
    if "op" not in df.columns:
        df = df.withColumn("op", F.lit("insert"))
    if checkpoints.is_done(epoch):
        return {"epoch": epoch, "skipped": True, "reason": "checkpointed"}
    t0 = time.monotonic()
    staged = stage_changes(spark, df, table)
    merge_metrics = table.merge(staged, epoch=epoch)
    record = {
        "skipped": False,
        "bootstrap": True,
        "duration_sec": round(time.monotonic() - t0, 3),
        "table_version": table.meta["version"],
        **merge_metrics,
    }
    checkpoints.record(epoch, record)
    return {"epoch": epoch, **record}
