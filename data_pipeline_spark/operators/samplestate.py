"""Lake-persisted maintained sample: a fixed-size uniform sample of the
distinct keys ever ingested, updated per epoch at O(batch) cost (X112).

Every corpus needs a standing eval/inspection sample — "show me 10k
random documents of the 10^10 we hold" — and recomputing one is a full
scan. The derandomized trick the engine already uses one-shot
(operators/sampling.py: priority = seeded md5 of the key) extends to
MAINTAINED state, because a hash priority is a property of the KEY, not
of the scan: the k keys with the smallest md5 values form a uniform
k-subset of the distinct keys, and that set is stable under any
partitioning of the corpus into epochs. So the store keeps, per
committed epoch, that epoch's own top-k candidate rows — and the
maintained sample is the top-k of the union of the parts, which is
EXACTLY the top-k of the whole corpus:

    any key in the corpus-wide top-k is, in every epoch that contains
    it, above that epoch's k-th priority (the epoch's keys are a subset
    of the corpus's) — so it survives the per-epoch cut and the merge
    re-cut reproduces the corpus-wide sample bit-for-bit.

That membership argument also makes RETRACTION exact, where a classic
single-reservoir state cannot un-sample: dropping a poisoned epoch's
part from the fold leaves precisely the maintained sample of the
remaining epochs (a key ingested in several epochs survives via its
other parts). Compaction trades that away for a single folded dir —
the same retract-before-compact rule as the sketch store.

Discipline mirrors operators/sketchstate.py (X106): frozen params in a
JSON meta, exactly-once epoch ledger (re-running a Structured Streaming
micro-batch under the same id is a no-op), crash ordering data-first /
meta-second, ``foreachBatch`` adapter, per-stratum reservoirs via
``group_col``. Payload columns ride along so the sample is directly
inspectable; a re-ingested key's payload follows the LATEST committed
epoch that carried it (and falls back on retraction).

Uniform over DISTINCT keys by design (re-observing a url must not make
it likelier to be sampled — crawl frequency is popularity, not weight).
For weighted one-shot draws use operators/sampling.py::weighted_sample;
a weighted MAINTAINED sample is ill-posed when a key's weight drifts
across epochs, so the store does not offer one.

Deterministic end-to-end (seeded md5 priorities, min-struct payload
tie-break within an epoch), so the whole maintained state is
DuckDB-twinnable: the contract rebuilds the sample from the equivalent
union-with-reingestion relation — persistence must be invisible to the
math.

Reference: no counterpart (the Rust pipeline keeps no cross-run state;
/root/reference/src/storage/mod.rs).
"""

from __future__ import annotations

import json
import os
import tempfile
from collections.abc import Callable

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

__all__ = ["SampleStore", "STREAM_EPOCH_BASE", "sql_maintained_sample"]

_META = "sample_meta.json"

STREAM_EPOCH_BASE = 1_000_000_000


def _atomic_write_json(path: str, obj) -> None:
    d = os.path.dirname(path)
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
    with os.fdopen(fd, "w") as f:
        json.dump(obj, f)
    os.replace(tmp, path)


def _hv(key_col: str, seed: str):
    return F.md5(F.concat(F.lit(f"{seed}:"), F.col(key_col).cast("string")))


class SampleStore:
    """See module docstring. ``create`` once, ``update`` per epoch, read
    the maintained sample via :meth:`sample`."""

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
        k: int = 1024,
        group_col: str | None = None,
        payload_cols: list[str] | None = None,
        seed: str = "sample",
    ) -> "SampleStore":
        """CREATE IF NOT EXISTS; params are frozen (changing k/seed/cols
        invalidates every stored part, so a contradiction raises)."""
        if k < 1:
            raise ValueError("need k >= 1")
        meta_path = os.path.join(path, _META)
        want = {
            "key_col": key_col,
            "k": int(k),
            "group_col": group_col,
            "payload_cols": list(payload_cols or []),
            "seed": seed,
        }
        if os.path.exists(meta_path):
            store = cls.load(spark, path)
            have = {kk: store.meta.get(kk) for kk in want}
            if want != have:
                raise ValueError(
                    f"sample store at {path} exists with params {have}, "
                    f"asked for {want}; params are frozen at create"
                )
            return store
        os.makedirs(path, exist_ok=True)
        meta = {"version": 1, "epochs": [], **want}
        _atomic_write_json(meta_path, meta)
        return cls(spark, path, meta)

    @classmethod
    def load(cls, spark: SparkSession, path: str) -> "SampleStore":
        with open(os.path.join(path, _META)) as f:
            return cls(spark, path, json.load(f))

    def committed_epochs(self) -> set[int]:
        return {e["epoch"] for e in self.meta["epochs"]}

    # -- write path ----------------------------------------------------------

    def _candidates(self, df: DataFrame, epoch: int) -> DataFrame:
        """This epoch's top-k candidate rows per stratum: distinct keys,
        deterministic payload pick (min struct) within the batch."""
        m = self.meta
        kc, gcols = m["key_col"], [m["group_col"]] if m["group_col"] else []
        pcols = m["payload_cols"]
        base = df.where(F.col(kc).isNotNull())
        if pcols:
            per_key = base.groupBy(*gcols, kc).agg(
                F.min(F.struct(*pcols)).alias("_p")
            )
            per_key = per_key.select(
                *gcols, kc, *[F.col(f"_p.{c}").alias(c) for c in pcols]
            )
        else:
            per_key = base.select(*gcols, kc).distinct()
        w = (
            Window.partitionBy(*gcols).orderBy("_hv")
            if gcols
            else Window.partitionBy(F.lit(1)).orderBy("_hv")
        )
        return (
            per_key.withColumn("_hv", _hv(kc, m["seed"]))
            .withColumn("_pos", F.row_number().over(w))
            .where(F.col("_pos") <= m["k"])
            .select(
                *gcols, kc, "_hv", *pcols, F.lit(int(epoch)).alias("_epoch")
            )
        )

    def update(self, df: DataFrame, epoch: int) -> int | None:
        """Fold one epoch's keys into the state. Returns the epoch id, or
        None if already committed (exactly-once)."""
        if epoch in self.committed_epochs():
            return None
        cand = self._candidates(df, epoch)
        cand.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(self.path, "parts", f"epoch={epoch}")
        )
        if "sample_schema" not in self.meta:
            # real column types of the sample output, so the no-live-
            # epochs edge (pre-first-commit, or everything retracted)
            # returns the SAME schema as the populated path
            m = self.meta
            out_cols = (
                ([m["group_col"]] if m["group_col"] else [])
                + [m["key_col"]]
                + m["payload_cols"]
            )
            schema = json.loads(cand.select(*out_cols).schema.json())
            for field in schema["fields"]:
                # parquet reads everything back nullable; record the
                # populated path's actual output contract
                field["nullable"] = True
            self.meta["sample_schema"] = schema
        self.meta["epochs"].append({"epoch": int(epoch)})
        _atomic_write_json(os.path.join(self.path, _META), self.meta)
        return epoch

    def foreach_batch(self) -> Callable[[DataFrame, int], None]:
        """``writeStream.foreachBatch`` adapter (micro-batch ids offset by
        STREAM_EPOCH_BASE, same convention as the sketch store)."""

        def apply(batch_df: DataFrame, batch_id: int) -> None:
            self.update(batch_df, STREAM_EPOCH_BASE + batch_id)

        return apply

    # -- read path -----------------------------------------------------------

    def _live_dirs(self) -> list[str]:
        retracted = {
            e["retracts"]
            for e in self.meta["epochs"]
            if e.get("retracts") is not None
        }
        seen: dict[str, None] = {}
        for e in self.meta["epochs"]:
            if e.get("retracts") is not None or e["epoch"] in retracted:
                continue
            seen.setdefault(str(e.get("dir", e["epoch"])), None)
        return [os.path.join(self.path, "parts", f"epoch={d}") for d in seen]

    def sample(self) -> DataFrame:
        """The maintained sample: ``(group?, key, payload...)``, ≤k rows
        per stratum — exactly the top-k-by-priority of every distinct key
        in the non-retracted epochs, payload from the latest epoch that
        carried the key."""
        m = self.meta
        kc, gcols = m["key_col"], [m["group_col"]] if m["group_col"] else []
        pcols = m["payload_cols"]
        dirs = self._live_dirs()
        if not dirs:
            from pyspark.sql.types import StructType

            if self.meta.get("sample_schema") is not None:
                schema = StructType.fromJson(self.meta["sample_schema"])
            else:  # nothing ever committed: types unknowable, string-all
                schema = ", ".join(
                    f"`{c}` string" for c in (*gcols, kc, *pcols)
                )
            return self.spark.createDataFrame([], schema)
        return self._folded().select(*gcols, kc, *pcols)

    def _folded(self) -> DataFrame:
        """Latest-per-key fold of the live parts cut to top-k priority —
        all part columns preserved. The ungrouped cut is orderBy+limit
        (TakeOrderedAndProject), not a one-partition rank window: live
        parts hold up to epochs×k rows, and only k survive."""
        m = self.meta
        kc, gcols = m["key_col"], [m["group_col"]] if m["group_col"] else []
        raw = self.spark.read.parquet(*self._live_dirs())
        wk = Window.partitionBy(*gcols, kc).orderBy(F.col("_epoch").desc())
        latest = (
            raw.withColumn("_rk", F.row_number().over(wk))
            .where(F.col("_rk") == 1)
            .drop("_rk")
        )
        if gcols:
            w = Window.partitionBy(*gcols).orderBy("_hv")
            return (
                latest.withColumn("_pos", F.row_number().over(w))
                .where(F.col("_pos") <= m["k"])
                .drop("_pos")
            )
        return latest.orderBy("_hv").limit(m["k"])

    # -- KMV read-outs -------------------------------------------------------
    # The maintained sample IS a KMV synopsis: its rows are the k keys
    # with the smallest seeded-md5 priorities, so the k-th priority is
    # the theta order statistic — distinct-count and set-overlap
    # estimates (operators/kmv.py math) fall out of state the store
    # already keeps, WITH exact retraction, which the one-way HLL
    # registers cannot offer.

    def distinct_estimate(self) -> DataFrame:
        """``(group?, distinct_est)`` over everything live: EXACT row
        count while fewer than k keys are held (the whole key set is
        stored), else (k-1)/theta off the k-th priority."""
        from .kmv import _frac

        m = self.meta
        gcols = [m["group_col"]] if m["group_col"] else []
        if not self._live_dirs():
            return self.spark.createDataFrame(
                [], ", ".join(f"`{c}` string" for c in gcols)
                + (", " if gcols else "") + "distinct_est double"
            )
        agg = self._folded().groupBy(*gcols).agg(
            F.count("*").alias("_n"), F.max("_hv").alias("_kth")
        )
        est = F.when(
            F.col("_n") < m["k"], F.col("_n").cast("double")
        ).otherwise(F.lit(float(m["k"] - 1)) / _frac(F.col("_kth")))
        return agg.select(*gcols, F.round(est, 4).alias("distinct_est"))

    def overlap_with(self, other: "SampleStore") -> DataFrame:
        """Corpus set algebra between two maintained stores (two crawls,
        two months, two sources): union / intersection / Jaccard /
        containment estimated from the two samples alone — the stores'
        keys are never rescanned. Requires matching seeds (priorities
        must be comparable) and ungrouped stores; k is the smaller of
        the two (each sample is a valid top-k' ⊇ top-k)."""
        from .kmv import kmv_overlap

        if self.meta["seed"] != other.meta["seed"]:
            raise ValueError("stores use different seeds; hashes are not comparable")
        if self.meta["group_col"] or other.meta["group_col"]:
            raise ValueError("overlap_with needs ungrouped stores")
        k = min(self.meta["k"], other.meta["k"])
        # cut BOTH sides to top-k: feeding a larger top-k' would put the
        # k'-th (not k-th) value under kmv's (k-1)/theta estimator
        a = self._folded().orderBy("_hv").limit(k).select(
            F.lit("a").alias("g"), F.col("_hv").alias("hv")
        )
        b = other._folded().orderBy("_hv").limit(k).select(
            F.lit("b").alias("g"), F.col("_hv").alias("hv")
        )
        return kmv_overlap(
            a.unionByName(b).withColumn("pos", F.lit(1)), "g", k=k
        )

    # -- maintenance ---------------------------------------------------------

    def compact(self) -> dict:
        """Collapse live parts into one merged dir (the folded sample,
        with per-row source epochs preserved for latest-payload
        semantics); retraction entries and their targets fall away.
        Irreversible for retraction — retract before compacting."""
        dirs = self._live_dirs()
        if not dirs:
            return {"epochs": 0, "dirs": 0}
        folded = self._folded()
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
        folded.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(self.path, "parts", f"epoch={name}")
        )
        for e in live:
            e["dir"] = name
        self.meta["epochs"] = live
        _atomic_write_json(os.path.join(self.path, _META), self.meta)
        return {"epochs": len(live), "dirs": len(dirs)}

    def retract_epoch(self, epoch: int) -> int:
        """Un-sample a poisoned epoch: its part is dropped from the fold,
        which leaves EXACTLY the maintained sample of the remaining
        epochs (see module docstring — a key ingested elsewhere survives
        via its other parts; a classic single-reservoir cannot do this).
        Raises on unknown / already-retracted / retraction-entry /
        compacted epochs. Returns the retraction ledger id."""
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


def sql_maintained_sample(
    input_rel: str,
    key_col: str,
    k: int,
    group_col: str | None = None,
    payload_cols: list[str] | None = None,
    seed: str = "sample",
    epoch_col: str = "epoch",
) -> str:
    """DuckDB twin: the maintained sample rebuilt from the equivalent
    union-with-reingestion relation ``input_rel`` (one row per observed
    (epoch, key) with payloads) — same md5 priorities, same min-struct
    per-epoch payload pick, same latest-epoch-wins across epochs."""
    pcols = list(payload_cols or [])
    gcols = [group_col] if group_col else []
    gsel = ", ".join(gcols) + ", " if gcols else ""
    part = f"PARTITION BY {', '.join(gcols)} " if gcols else ""
    psel = (", " + ", ".join(pcols)) if pcols else ""
    if pcols:
        row = "struct_pack(" + ", ".join(f"{c} := {c}" for c in pcols) + ")"
        per_epoch = f"""
  SELECT {gsel}{epoch_col} AS _epoch, {key_col},
         min({row}) AS _p
  FROM {input_rel} WHERE {key_col} IS NOT NULL
  GROUP BY {gsel}{epoch_col}, {key_col}
"""
        unpack = ", ".join(
            f"_p['{c}'] AS {c}" for c in pcols
        )
        per_epoch = f"SELECT {gsel}_epoch, {key_col}, {unpack} FROM ({per_epoch})"
    else:
        per_epoch = (
            f"SELECT DISTINCT {gsel}{epoch_col} AS _epoch, {key_col} "
            f"FROM {input_rel} WHERE {key_col} IS NOT NULL"
        )
    return f"""
WITH per_epoch AS ({per_epoch}),
latest AS (
  SELECT *, row_number() OVER (
    PARTITION BY {gsel}{key_col} ORDER BY _epoch DESC) AS _rk
  FROM per_epoch
),
ranked AS (
  SELECT {gsel}{key_col}{psel},
         row_number() OVER ({part}ORDER BY
           md5('{seed}:' || CAST({key_col} AS VARCHAR))) AS _pos
  FROM latest WHERE _rk = 1
)
SELECT {gsel}{key_col}{psel} FROM ranked WHERE _pos <= {k}
"""
