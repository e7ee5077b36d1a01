"""Lake-persisted sketch state: the mergeable summaries as MAINTAINED
incremental state, exactly-once per epoch (X106).

The three linear/mergeable summaries —

- Bloom bitmap  → membership   ("have we EVER seen this url?")
- Count-Min     → frequency    ("how many times?")
- HyperLogLog   → cardinality  ("how many distinct, per group?")

(operators/bloomdedup.py, operators/cms.py, operators/hll.py) — answer
corpus-lifetime questions that a 10^10-event CDC tail cannot afford to
recompute by rescanning history each epoch. This module persists them the
way the MinHash dedup index persists signatures
(operators/dedup_index.py): one directory per summary kind, one
subdirectory per committed epoch, a JSON meta file holding the FROZEN
sketch parameters (changing m/width/p invalidates every stored word/
counter/register, so a mismatch raises) and the committed-epoch ledger.

Exactly-once: ``update(df, epoch=batch_id)`` is a no-op for a committed
epoch, so a Structured Streaming ``foreachBatch`` (which re-executes a
failed micro-batch under the SAME batch id) maintains the state across
driver crashes without double counting — double counting would corrupt
CMS counts silently, which is why the ledger matters more here than for
the idempotent-by-algebra Bloom/HLL. Crash ordering is data-first,
meta-second: a crash between the two leaves orphan data dirs, never a
committed epoch without data.

Reads merge the epoch dirs with each summary's own fold (bit_or / sum /
max) — one map-side-combinable agg over state that is already tiny;
``compact()`` collapses the fold into a single stored dir when the epoch
count grows, preserving the ledger ids (dedup_index's shared-dir
convention).

Reference: no counterpart (the Rust pipeline keeps no cross-run state at
all — each run replaces its dataset; /root/reference/src/storage/mod.rs).
"""

from __future__ import annotations

import json
import os
import tempfile
from collections.abc import Callable

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from .bloomdedup import bloom_build, bloom_probe
from .cms import cms_build, cms_estimate
from .ddsketch import dd_histogram, dd_quantiles
from .hll import hll_estimate, hll_registers

__all__ = ["SketchStore", "STREAM_EPOCH_BASE"]

_META = "sketch_meta.json"
_KINDS = ("bloom", "cms", "hll", "dd")

# keep stream batch ids clear of batch-pipeline epoch ids (same convention
# as streaming/indexing.py)
STREAM_EPOCH_BASE = 1_000_000_000


def _atomic_write_json(path: str, obj) -> None:
    d = os.path.dirname(path)
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
    with os.fdopen(fd, "w") as f:
        json.dump(obj, f)
    os.replace(tmp, path)


class SketchStore:
    """See module docstring. ``create`` once, ``update`` per epoch, query
    via :meth:`probe` / :meth:`freq` / :meth:`distinct`."""

    def __init__(self, spark: SparkSession, path: str, meta: dict):
        self.spark = spark
        self.path = path
        self.meta = meta

    @classmethod
    def create(
        cls,
        spark: SparkSession,
        path: str,
        key_col: str,
        group_col: str | None = None,
        bloom_m: int = 1 << 24,
        bloom_k: int = 4,
        cms_depth: int = 4,
        cms_width: int = 1 << 16,
        hll_p: int = 12,
        value_col: str | None = None,
        dd_alpha: float = 0.01,
        seed: str = "sketch",
    ) -> "SketchStore":
        """CREATE IF NOT EXISTS; existing params win, a contradiction
        raises (sketch params are frozen — changing them invalidates all
        stored state). ``value_col`` additionally maintains a DDSketch of
        that column's distribution (quantile state per epoch)."""
        meta_path = os.path.join(path, _META)
        want = {
            "key_col": key_col,
            "group_col": group_col,
            "bloom_m": bloom_m,
            "bloom_k": bloom_k,
            "cms_depth": cms_depth,
            "cms_width": cms_width,
            "hll_p": hll_p,
            "value_col": value_col,
            "dd_alpha": dd_alpha,
            "seed": seed,
        }
        if os.path.exists(meta_path):
            store = cls.load(spark, path)
            have = {k: store.meta.get(k) for k in want}
            if want != have:
                raise ValueError(
                    f"sketch store at {path} exists with params {have}, "
                    f"asked for {want}; params are frozen at create"
                )
            return store
        os.makedirs(path, exist_ok=True)
        meta = {"version": 1, "epochs": [], **want}
        _atomic_write_json(meta_path, meta)
        return cls(spark, path, meta)

    @classmethod
    def load(cls, spark: SparkSession, path: str) -> "SketchStore":
        with open(os.path.join(path, _META)) as f:
            return cls(spark, path, json.load(f))

    def committed_epochs(self) -> set[int]:
        return {e["epoch"] for e in self.meta["epochs"]}

    # -- write path ----------------------------------------------------------

    def update(
        self, df: DataFrame, epoch: int, ts: float | None = None
    ) -> int | None:
        """Fold one epoch's keys into the state. Returns the epoch id, or
        None if already committed (exactly-once). ``ts`` (epoch seconds)
        stamps the ledger entry and enables :meth:`freq_decayed`."""
        if epoch in self.committed_epochs():
            return None
        m = self.meta
        parts = {
            "bloom": bloom_build(
                df, m["key_col"], m["bloom_m"], m["bloom_k"], m["seed"]
            ),
            "cms": cms_build(
                df, m["key_col"], m["cms_depth"], m["cms_width"], m["seed"]
            ),
            "hll": hll_registers(
                df,
                m["key_col"],
                [m["group_col"]] if m["group_col"] else None,
                m["hll_p"],
                m["seed"],
            ),
        }
        if m.get("value_col"):
            parts["dd"] = dd_histogram(
                df,
                m["value_col"],
                [m["group_col"]] if m["group_col"] else None,
                m["dd_alpha"],
            )
        for kind, frame in parts.items():
            # sketches are tiny by construction; one file per epoch dir
            frame.coalesce(1).write.mode("overwrite").parquet(
                os.path.join(self.path, kind, f"epoch={epoch}")
            )
        entry: dict = {"epoch": int(epoch)}
        if ts is not None:
            entry["ts"] = float(ts)
        self.meta["epochs"].append(entry)
        _atomic_write_json(os.path.join(self.path, _META), self.meta)
        return epoch

    def foreach_batch(self) -> Callable[[DataFrame, int], None]:
        """``writeStream.foreachBatch`` adapter: micro-batch ids become
        ledger epochs (offset by STREAM_EPOCH_BASE), so restart
        re-delivery is a no-op."""

        def apply(batch_df: DataFrame, batch_id: int) -> None:
            self.update(batch_df, STREAM_EPOCH_BASE + batch_id)

        return apply

    # -- read path -----------------------------------------------------------

    def _dirs(self, kind: str) -> list[str]:
        seen: dict[str, None] = {}
        for e in self.meta["epochs"]:
            if e.get("kinds") is not None and kind not in e["kinds"]:
                continue
            seen.setdefault(str(e.get("dir", e["epoch"])), None)
        return [os.path.join(self.path, kind, f"epoch={d}") for d in seen]

    def _kinds(self) -> tuple[str, ...]:
        return _KINDS if self.meta.get("value_col") else _KINDS[:3]

    def _merged(self, kind: str) -> DataFrame:
        dirs = self._dirs(kind)
        if not dirs:
            grp = (
                f"{self.meta['group_col']} string, "
                if self.meta["group_col"]
                else ""
            )
            schema = {
                "bloom": "word_idx long, word long",
                "cms": "d int, w_idx long, cnt long",
                "hll": grp + "idx int, rho int",
                "dd": grp + "sgn tinyint, bin int, cnt long",
            }[kind]
            return self.spark.createDataFrame([], schema)
        raw = self.spark.read.parquet(*dirs)
        if kind == "bloom":
            return raw.groupBy("word_idx").agg(F.bit_or("word").alias("word"))
        if kind in ("cms", "dd"):
            # zeroed counters (a retracted epoch was the sole contributor)
            # fold away entirely, so state == a direct build of what remains
            keys = [c for c in raw.columns if c != "cnt"]
            return (
                raw.groupBy(*keys)
                .agg(F.sum("cnt").alias("cnt"))
                .where(F.col("cnt") != 0)
            )
        keys = [c for c in raw.columns if c != "rho"]
        return raw.groupBy(*keys).agg(F.max("rho").alias("rho"))

    def probe(self, df: DataFrame, key_col: str | None = None) -> DataFrame:
        """Adds ``_maybe``: False is a certainty the key was never
        ingested; True routes to an exact check (bloom_probe
        semantics)."""
        m = self.meta
        return bloom_probe(
            df,
            key_col or m["key_col"],
            self._merged("bloom"),
            m["bloom_m"],
            m["bloom_k"],
            m["seed"],
        )

    def freq(self, keys: DataFrame, key_col: str | None = None) -> DataFrame:
        """One-sided frequency estimates (est >= true) for the queried
        keys over everything ever ingested."""
        m = self.meta
        return cms_estimate(
            self._merged("cms"),
            keys,
            key_col or m["key_col"],
            m["cms_depth"],
            m["cms_width"],
            m["seed"],
        )

    def freq_decayed(
        self,
        keys: DataFrame,
        now: float,
        half_life_s: float,
        key_col: str | None = None,
    ) -> DataFrame:
        """Exponentially time-decayed frequency estimates (X109): each
        epoch's stored counters are scaled by 2^(-(now-ts)/half_life)
        BEFORE the fold, so a key's estimate weights recent observations
        over stale ones — the recrawl-scheduling signal ("how hot is this
        url lately"), computable precisely BECAUSE the store keeps
        per-epoch parts. One-sided law survives (each scaled counter =
        true decayed count + non-negative scaled collision mass).

        Needs every CMS epoch part intact and ts-stamped: raises on
        compacted or unstamped epochs (compaction folds away the per-epoch
        resolution decay needs — schedule compaction beyond the decay
        horizon, or retract instead). Output ``(key, est double)``,
        rounded 6dp."""
        if half_life_s <= 0:
            raise ValueError("need half_life_s > 0")
        m = self.meta
        kc = key_col or m["key_col"]
        parts = []
        for e in self.meta["epochs"]:
            if "dir" in e:
                raise ValueError(
                    "freq_decayed needs per-epoch parts; the store was "
                    "compacted"
                )
            if e.get("kinds") is not None and "cms" not in e["kinds"]:
                continue
            if e.get("ts") is None:
                raise ValueError(
                    f"epoch {e['epoch']} has no ts stamp; pass ts= to "
                    "update() to enable decay"
                )
            w = 2.0 ** (-(float(now) - e["ts"]) / half_life_s)
            part = self.spark.read.parquet(
                os.path.join(self.path, "cms", f"epoch={e['epoch']}")
            ).select(
                "d", "w_idx", (F.col("cnt").cast("double") * w).alias("cnt")
            )
            parts.append(part)
        if not parts:
            return keys.where(F.col(kc).isNotNull()).select(kc).distinct() \
                .withColumn("est", F.lit(0.0))
        sketch = parts[0]
        for p in parts[1:]:
            sketch = sketch.unionByName(p)
        sketch = sketch.groupBy("d", "w_idx").agg(F.sum("cnt").alias("cnt"))
        from .cms import _pos

        probes = F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).cast("int").alias("d"),
                        _pos(kc, i, m["cms_width"], m["seed"]).alias("w_idx"),
                    )
                    for i in range(m["cms_depth"])
                ]
            )
        ).alias("_p")
        q = (
            keys.where(F.col(kc).isNotNull())
            .select(kc)
            .distinct()
            .select(kc, probes)
            .select(kc, "_p.d", "_p.w_idx")
        )
        return (
            q.join(F.broadcast(sketch), ["d", "w_idx"], "left")
            .groupBy(kc)
            .agg(
                F.round(
                    F.min(F.coalesce(F.col("cnt"), F.lit(0.0))), 6
                ).alias("est")
            )
        )

    def distinct(self) -> DataFrame:
        """Cardinality estimates over everything ever ingested — one row,
        or one per group when the store was created with a group_col."""
        m = self.meta
        groups = [m["group_col"]] if m["group_col"] else None
        return hll_estimate(self._merged("hll"), m["hll_p"], groups)

    def quantiles(self, qs: list[float]) -> DataFrame:
        """Quantile estimates of the value column over everything ever
        ingested (requires ``value_col`` at create) — DDSketch bounded
        relative error, per group when grouped."""
        m = self.meta
        if not m.get("value_col"):
            raise ValueError("store was created without a value_col")
        groups = [m["group_col"]] if m["group_col"] else None
        return dd_quantiles(self._merged("dd"), qs, m["dd_alpha"], groups)

    # -- maintenance ---------------------------------------------------------

    def compact(self) -> dict:
        """Collapse all epoch dirs into one merged dir per kind; ledger
        ids survive pointing at the shared dir. Data-first, meta-second."""
        if not self.meta["epochs"]:
            return {"epochs": 0, "dirs": 0}
        max_epoch = max(e["epoch"] for e in self.meta["epochs"])
        existing = {str(e.get("dir", e["epoch"])) for e in self.meta["epochs"]}
        name = f"compact-{max_epoch}"
        while name in existing:
            name += "x"
        n_dirs = 0
        for kind in self._kinds():
            merged = self._merged(kind)
            n_dirs += len(self._dirs(kind))
            merged.coalesce(1).write.mode("overwrite").parquet(
                os.path.join(self.path, kind, f"epoch={name}")
            )
        for e in self.meta["epochs"]:
            e["dir"] = name
            # the shared dir carries every kind's merged state, so any
            # retract-entry kind restriction no longer applies
            e.pop("kinds", None)
        _atomic_write_json(os.path.join(self.path, _META), self.meta)
        return {"epochs": len(self.meta["epochs"]), "dirs": n_dirs}

    def retract_epoch(self, epoch: int) -> int:
        """Un-ingest a committed epoch (X108): a poisoned crawl batch's
        contribution is NETTED OUT of the linear kinds (cms, dd) by
        writing the stored epoch parts negated — exactly sound, because
        the exact per-epoch contribution is on disk. Bloom and HLL are
        left untouched BY SEMANTICS, not limitation: they answer
        "ever ingested" (membership prefilter / ever-seen cardinality),
        which retraction does not change — and as one-way sketches they
        could only be rebuilt, not subtracted. `freq`/`quantiles` answer
        over the net (non-retracted) corpus.

        The CMS one-sided law (est >= true) survives retraction of
        previously-added rows: every counter remains true + non-negative
        collision mass.

        Raises on unknown, already-retracted, retraction-entry, or
        compacted epochs (compaction folds the parts away — irreversible
        by design; retract before compacting). Returns the ledger id of
        the retraction entry."""
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
        linear = [k for k in ("cms", "dd") if k in self._kinds()]
        # retraction ids live in a NEGATIVE namespace so they can never
        # collide with a caller's future update epoch (a collision would
        # make that update a silent exactly-once skip)
        rid = min(0, min(e["epoch"] for e in self.meta["epochs"])) - 1
        for kind in linear:
            part = self.spark.read.parquet(
                os.path.join(self.path, kind, f"epoch={epoch}")
            )
            part.withColumn("cnt", -F.col("cnt")).coalesce(1).write.mode(
                "overwrite"
            ).parquet(os.path.join(self.path, kind, f"epoch={rid}"))
        entry: dict = {"epoch": rid, "kinds": linear, "retracts": int(epoch)}
        # the negated counters must decay with the ORIGINAL epoch's age,
        # so freq_decayed nets out exactly what the epoch contributed
        if entries[epoch].get("ts") is not None:
            entry["ts"] = entries[epoch]["ts"]
        self.meta["epochs"].append(entry)
        _atomic_write_json(os.path.join(self.path, _META), self.meta)
        return rid
