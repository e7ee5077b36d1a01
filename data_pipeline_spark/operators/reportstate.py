"""Maintained corpus report card: the datasheet kept current at
O(batch) cost per epoch (X119).

The one-pass report card (operators/report.py, X118) is the right tool
at release time; a 10^10-doc lake that ingests hourly cannot afford to
re-scan the corpus for "how many rows / tokens / what language mix do
we hold NOW". Every number on the card is incrementally maintainable
from tiny per-epoch parts:

- rows / chars / tokens / quality sums / gopher passes, per language:
  plain SUMS — fold by addition, exact;
- distinct fingerprints (for the exact-dup ratio): an HLL register
  part per epoch (operators/hll.py) — fold by max, the HLL union law.

Discipline mirrors the sketch/sample stores (X106/X112): frozen params
in JSON meta, exactly-once epoch ledger (a re-delivered Structured
Streaming micro-batch is a no-op), data-first/meta-second crash
ordering, ``foreachBatch`` adapter, compaction.

RETRACTION here is part-drop, and it is EXACT for BOTH kinds — the
sums trivially, and the HLL too, which deserves a note: the sketch
store's HLL keeps ever-seen semantics (retraction doesn't change
"ever ingested"), but the report's question is "what does the corpus
contain NOW", and because the store keeps one register part PER EPOCH,
re-folding the surviving parts yields exactly the HLL of the remaining
union — no subtraction (impossible for HLL) is ever needed. The
familiar trade: compaction folds the parts away, so retract before
compacting.

``report()`` returns the SAME tidy ``(metric, dimension, value)``
frame as the one-pass card, with ``exact_dup_ratio`` replaced by
``dup_ratio_est`` (HLL-approximate, standard error ~1.04/sqrt(2^p));
everything else is integer/sum-exact and pinned equal to a direct
``corpus_report`` of the union in tests.

Reference: no counterpart (the Rust pipeline keeps no cross-run
state; /root/reference/src/storage/mod.rs).
"""

from __future__ import annotations

import json
import os
import tempfile
from collections.abc import Callable

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from .hll import hll_estimate, hll_merge, hll_registers
from .report import per_doc_signals

__all__ = ["ReportStore", "STREAM_EPOCH_BASE"]

_META = "report_meta.json"

STREAM_EPOCH_BASE = 1_000_000_000


def _atomic_write_json(path: str, obj) -> None:
    d = os.path.dirname(path)
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
    with os.fdopen(fd, "w") as f:
        json.dump(obj, f)
    os.replace(tmp, path)


class ReportStore:
    """See module docstring. ``create`` once, ``update`` per epoch,
    read the current card via :meth:`report`."""

    def __init__(self, spark: SparkSession, path: str, meta: dict):
        self.spark = spark
        self.path = path
        self.meta = meta

    @classmethod
    def create(
        cls,
        spark: SparkSession,
        path: str,
        text_col: str = "text",
        lang_col: str | None = "lang",
        hll_p: int = 12,
        seed: str = "report",
    ) -> "ReportStore":
        """CREATE IF NOT EXISTS; params frozen (changing hll_p/seed
        invalidates the register parts, so a contradiction raises)."""
        meta_path = os.path.join(path, _META)
        want = {
            "text_col": text_col,
            "lang_col": lang_col,
            "hll_p": int(hll_p),
            "seed": seed,
        }
        if os.path.exists(meta_path):
            store = cls.load(spark, path)
            have = {k: store.meta.get(k) for k in want}
            if want != have:
                raise ValueError(
                    f"report store at {path} exists with params {have}, "
                    f"asked for {want}; params are frozen at create"
                )
            return store
        os.makedirs(path, exist_ok=True)
        meta = {"version": 1, "epochs": [], **want}
        _atomic_write_json(meta_path, meta)
        return cls(spark, path, meta)

    @classmethod
    def load(cls, spark: SparkSession, path: str) -> "ReportStore":
        with open(os.path.join(path, _META)) as f:
            return cls(spark, path, json.load(f))

    def committed_epochs(self) -> set[int]:
        return {e["epoch"] for e in self.meta["epochs"]}

    # -- write path ----------------------------------------------------------

    def update(self, df: DataFrame, epoch: int) -> int | None:
        """Fold one epoch's documents into the card. Returns the epoch
        id, or None if already committed (exactly-once)."""
        if epoch in self.committed_epochs():
            return None
        m = self.meta
        per_doc = per_doc_signals(df, m["text_col"], m["lang_col"])
        # NULL language is stored AS NULL (groupBy and parquet both handle
        # NULL keys natively) — an in-band sentinel would conflate a real
        # lang value equal to the sentinel with NULL (ADVICE r3).
        lang = (
            [F.col(m["lang_col"]).alias("lang")]
            if m["lang_col"]
            else [F.lit(None).cast("string").alias("lang")]
        )
        sums = per_doc.groupBy(*lang).agg(
            F.count("*").alias("rows"),
            F.sum("_chars").alias("chars"),
            F.sum("_ws").alias("ws"),
            F.sum("_ml").alias("ml"),
            F.sum("_q").alias("q_sum"),
            F.sum("_gopher").alias("gopher"),
        )
        regs = hll_registers(
            per_doc.select("_fp"), "_fp", None, m["hll_p"], m["seed"]
        )
        for kind, frame in (("sums", sums), ("hll", regs)):
            frame.coalesce(1).write.mode("overwrite").parquet(
                os.path.join(self.path, kind, f"epoch={epoch}")
            )
        self.meta["epochs"].append({"epoch": int(epoch)})
        _atomic_write_json(os.path.join(self.path, _META), self.meta)
        return epoch

    def foreach_batch(self) -> Callable[[DataFrame, int], None]:
        """``writeStream.foreachBatch`` adapter (micro-batch ids offset
        by STREAM_EPOCH_BASE, the shared store convention)."""

        def apply(batch_df: DataFrame, batch_id: int) -> None:
            self.update(batch_df, STREAM_EPOCH_BASE + batch_id)

        return apply

    # -- read path -----------------------------------------------------------

    def _live_dirs(
        self, kind: str, epochs: set[int] | None = None
    ) -> list[str]:
        retracted = {
            e["retracts"]
            for e in self.meta["epochs"]
            if e.get("retracts") is not None
        }
        seen: dict[str, None] = {}
        for e in self.meta["epochs"]:
            if e.get("retracts") is not None or e["epoch"] in retracted:
                continue
            if epochs is not None:
                if e["epoch"] not in epochs:
                    continue
                if "dir" in e:
                    raise ValueError(
                        f"epoch {e['epoch']} was compacted away; "
                        "epoch-scoped reports need the per-epoch parts"
                    )
            seen.setdefault(str(e.get("dir", e["epoch"])), None)
        return [os.path.join(self.path, kind, f"epoch={d}") for d in seen]

    def report(self, epochs: list[int] | None = None) -> DataFrame:
        """The current card: same tidy ``(metric, dimension, value)``
        shape as the one-pass ``corpus_report``; linear metrics exact,
        ``dup_ratio_est`` from the folded HLL registers.

        ``epochs`` scopes the card to a SUBSET of committed epochs —
        "what did last night's ingest add", "this week's corpus" —
        computable precisely BECAUSE the store keeps per-epoch parts
        (the same property that makes retraction exact); raises on
        compacted or unknown epochs rather than folding wrong."""
        if epochs is not None:
            unknown = set(epochs) - self.committed_epochs()
            if unknown:
                raise ValueError(f"unknown epochs: {sorted(unknown)}")
        scope = set(epochs) if epochs is not None else None
        dirs = self._live_dirs("sums", scope)
        if not dirs:
            return self.spark.createDataFrame(
                [], "metric string, dimension string, value double"
            )
        sums = (
            self.spark.read.parquet(*dirs)
            .groupBy("lang")
            .agg(
                F.sum("rows").alias("rows"),
                F.sum("chars").alias("chars"),
                F.sum("ws").alias("ws"),
                F.sum("ml").alias("ml"),
                F.sum("q_sum").alias("q_sum"),
                F.sum("gopher").alias("gopher"),
            )
        )
        g = sums.agg(
            F.sum("rows").cast("double").alias("rows"),
            F.sum("chars").cast("double").alias("chars_total"),
            F.sum("ws").cast("double").alias("tokens_ws_total"),
            F.sum("ml").cast("double").alias("tokens_ml_total"),
            (F.sum("q_sum") / F.sum("rows")).alias("quality_mean"),
            (F.sum("gopher").cast("double") / F.sum("rows")).alias(
                "gopher_pass_rate"
            ),
        )
        m = self.meta
        regs = hll_merge(
            *[
                self.spark.read.parquet(d)
                for d in self._live_dirs("hll", scope)
            ]
        )
        distinct = hll_estimate(regs, m["hll_p"]).collect()[0]["est"]
        metrics = [
            "rows", "chars_total", "tokens_ws_total", "tokens_ml_total",
            "quality_mean", "gopher_pass_rate",
        ]
        long_rows = g.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(x).alias("metric"),
                            F.lit("all").alias("dimension"),
                            F.round(F.col(x).cast("double"), 6).alias("value"),
                        )
                        for x in metrics
                    ]
                    + [
                        F.struct(
                            F.lit("dup_ratio_est").alias("metric"),
                            F.lit("all").alias("dimension"),
                            F.round(
                                F.greatest(
                                    F.lit(0.0),
                                    F.lit(1.0)
                                    - F.lit(float(distinct)) / F.col("rows"),
                                ),
                                6,
                            ).alias("value"),
                        )
                    ]
                )
            ).alias("r")
        ).select("r.metric", "r.dimension", "r.value")
        if not m["lang_col"]:
            return long_rows
        total = sums.agg(F.sum("rows")).first()[0]
        shares = sums.select(
            F.lit("lang_share").alias("metric"),
            F.col("lang").alias("dimension"),
            F.round(
                F.col("rows").cast("double") / F.lit(float(total)), 6
            ).alias("value"),
        )
        return long_rows.unionByName(shares)

    # -- maintenance ---------------------------------------------------------

    def retract_epoch(self, epoch: int) -> int:
        """Un-ingest a committed epoch by part drop — exact for the sums
        AND for the HLL (re-folding the surviving per-epoch register
        parts IS the HLL of the remaining union; see module docstring).
        Raises on unknown / already-retracted / retraction-entry /
        compacted epochs."""
        entries = {e["epoch"]: e for e in self.meta["epochs"]}
        if epoch not in entries:
            raise ValueError(f"epoch {epoch} was never committed")
        if entries[epoch].get("retracts") is not None:
            raise ValueError(f"epoch {epoch} is itself a retraction entry")
        if any(e.get("retracts") == epoch for e in self.meta["epochs"]):
            raise ValueError(f"epoch {epoch} is already retracted")
        if "dir" in entries[epoch]:
            raise ValueError(
                f"epoch {epoch} was compacted away; retraction needs the "
                "per-epoch parts (retract before compact)"
            )
        rid = -1
        while rid in entries:
            rid -= 1
        self.meta["epochs"].append({"epoch": rid, "retracts": int(epoch)})
        _atomic_write_json(os.path.join(self.path, _META), self.meta)
        return rid

    def compact(self) -> dict:
        """Collapse live parts into one folded dir per kind; retraction
        entries and their targets fall away. Irreversible for
        retraction — retract before compacting."""
        sums_dirs = self._live_dirs("sums")
        if not sums_dirs:
            return {"epochs": 0, "dirs": 0}
        live = [
            e
            for e in self.meta["epochs"]
            if e.get("retracts") is None
            and not any(
                x.get("retracts") == e["epoch"] for x in self.meta["epochs"]
            )
        ]
        max_epoch = max(e["epoch"] for e in live)
        existing = {str(e.get("dir", e["epoch"])) for e in self.meta["epochs"]}
        name = f"compact-{max_epoch}"
        while name in existing:
            name += "x"
        folded_sums = (
            self.spark.read.parquet(*sums_dirs)
            .groupBy("lang")
            .agg(
                *[
                    F.sum(c).alias(c)
                    for c in ("rows", "chars", "ws", "ml", "q_sum", "gopher")
                ]
            )
        )
        folded_hll = hll_merge(
            *[self.spark.read.parquet(d) for d in self._live_dirs("hll")]
        )
        n_dirs = len(sums_dirs)
        for kind, frame in (("sums", folded_sums), ("hll", folded_hll)):
            frame.coalesce(1).write.mode("overwrite").parquet(
                os.path.join(self.path, kind, f"epoch={name}")
            )
        for e in live:
            e["dir"] = name
        self.meta["epochs"] = live
        _atomic_write_json(os.path.join(self.path, _META), self.meta)
        return {"epochs": len(live), "dirs": n_dirs}
