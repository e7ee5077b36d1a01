"""Multi-table CDC routing: one change log carrying events for MANY
source tables (the shape a single Debezium connector / one Kafka topic
with a ``table`` discriminator actually delivers), fanned out to
per-table lake tables.

Routing semantics:

- each route owns its lake table, checkpoint store, and (optional)
  schema registry — schema evolution and exactly-once are PER TABLE
  (a slow table's retry never blocks or re-applies a fast one);
- one epoch = one partition-pruned scan, shared by all routes (the
  per-route frames are filters over the same scan — Spark reuses the
  file listing; no per-route re-read of the log);
- rows whose discriminator matches no route are dead-lettered with the
  same quarantine convention as the single-table runner (at 10^10
  events an unknown table must be isolated with provenance, not
  dropped silently or fatal);
- a route added later simply starts with an empty ledger: replaying the
  log applies every epoch to the new table and skips the old ones —
  backfill-by-declaration.

The reference's analog is the per-source loop in main.rs:48-54 (five
sources, each with its own storage prefix); this is the CDC-native form
where the sources share one wire.
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass

import pyspark.sql.functions as F
from pyspark.sql import SparkSession

from ..lake.table import LakeTable
from ..plans.registry import SchemaRegistry
from ..sources import changelog
from .checkpoint import CheckpointStore
from .runner import maybe_evolve, stage_changes


@dataclass
class Route:
    table: LakeTable
    checkpoints: CheckpointStore
    registry: SchemaRegistry | None = None
    merge_mode: str = "cow"


class MultiTableReplay:
    def __init__(
        self,
        spark: SparkSession,
        log_dir: str,
        routes: dict[str, Route],
        table_col: str = "table",
        quarantine_dir: str | None = None,
    ):
        self.spark = spark
        self.log_dir = log_dir
        self.routes = routes
        self.table_col = table_col
        self.quarantine_dir = quarantine_dir

    def apply_epoch(self, epoch: int, exclude: set[str] = frozenset()) -> dict:
        """Apply one epoch to every route. A route's failure is RECORDED
        (``{"error": ...}``) and does not abort the other routes — each
        route owns its checkpoint ledger precisely so failures stay per
        table. ``exclude``: routes skipped outright (``run()`` passes the
        set of routes that already errored this run, preserving in-order
        epoch application per table while the healthy tables proceed)."""
        t0 = time.monotonic()
        df = changelog.read_epoch(self.spark, self.log_dir, epoch)
        results: dict[str, dict] = {}
        for name, route in self.routes.items():
            if name in exclude:
                results[name] = {"skipped": True, "reason": "blocked_by_earlier_error"}
                continue
            if route.checkpoints.is_done(epoch):
                results[name] = {"skipped": True, "reason": "checkpointed"}
                continue
            try:
                sub = df.where(F.col(self.table_col) == name).drop(self.table_col)
                maybe_evolve(route.table, route.registry, sub, epoch=epoch)
                staged = stage_changes(self.spark, sub, route.table)
                metrics = route.table.merge(
                    staged, epoch=epoch, mode=route.merge_mode
                )
                record = {"skipped": False, **metrics}
                route.checkpoints.record(epoch, record)
                results[name] = record
            except Exception as exc:  # noqa: BLE001 — isolation is the contract
                results[name] = {"skipped": False, "error": repr(exc)}

        n_unrouted = 0
        if self.quarantine_dir is not None:
            qdir = os.path.join(self.quarantine_dir, f"epoch={epoch}")
            count_path = os.path.join(qdir, "_quarantine_count.json")
            if os.path.exists(count_path):
                # done-guard: the quarantine write is idempotent per epoch;
                # without this, every run() re-scans and re-writes EVERY
                # epoch's unrouted slice even when all routes are
                # checkpointed — O(entire log) per run.
                import json

                with open(count_path) as fh:
                    n_unrouted = json.load(fh)["n"]
            else:
                unrouted = df.where(
                    ~F.coalesce(
                        F.col(self.table_col).isin(*self.routes.keys()), F.lit(False)
                    )
                )
                from pyspark.sql import Observation

                obs = Observation()
                unrouted.withColumn("_reason", F.lit("unknown_table")).observe(
                    obs, F.count(F.lit(1)).alias("n")
                ).write.mode("overwrite").parquet(qdir)
                n_unrouted = int(obs.get["n"])
                import json

                from ..lake.table import _atomic_write

                _atomic_write(count_path, json.dumps({"n": n_unrouted}))

        return {
            "epoch": epoch,
            "tables": results,
            "unrouted": n_unrouted,
            "duration_sec": round(time.monotonic() - t0, 3),
        }

    def run(self, max_epochs: int | None = None) -> list[dict]:
        out = []
        blocked: set[str] = set()
        for epoch in changelog.list_epochs(self.spark, self.log_dir):
            rec = self.apply_epoch(epoch, exclude=blocked)
            out.append(rec)
            blocked |= {
                name for name, r in rec["tables"].items() if "error" in r
            }
            if max_epochs is not None and len(out) >= max_epochs:
                break
        return out
