"""Persistent, incrementally-growing IVF vector index.

``similarity.ivf_index`` builds the inverted lists in one shot; a
continuously-ingesting pipeline gets new embeddings every epoch and must
not re-assign 10^10 stored vectors to add 10^7. With the DETERMINISTIC
fixed-centroid quantizer (seeded literals — similarity.fixed_centroids),
the coarse quantizer never changes, so adding vectors is append-only:
assign the new batch to its lists, write it under the epoch directory,
done. (A learned-KMeans quantizer cannot be extended this way without
re-clustering — centroid drift would silently strand old vectors in wrong
lists; that is why this index only supports the fixed quantizer, and why
``create`` freezes dim/n_lists/seed.)

Layout (icelite-style: parquet + atomic JSON meta):

    path/meta.json                      params + exactly-once epoch ledger
    path/lists/epoch=N/list_id=K/*.parquet

Vectors are PHYSICALLY PARTITIONED by ``list_id``, which is what makes the
probe cheap: a query batch ranks the (driver-regenerable) centroids, takes
the union of its top-``nprobe`` lists, and the scan reads ONLY those
list_id directories — O(nprobe/n_lists) of the index, the IVF contract,
enforced by directory pruning rather than hoped for from the optimizer.

Search reuses ``similarity.ivf_topk`` unchanged, so the incremental index
returns byte-identical results to a one-shot build over the same vectors
(pinned by the ``ann_ivf_incremental`` contract query, which shares the
one-shot DuckDB oracle).
"""

from __future__ import annotations

import json
import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from .dedup_index import _atomic_write_json, _fresh_compact_name, _has_parquet
from .similarity import assign_to_lists, fixed_centroids, ivf_topk

from .epochutil import next_auto_epoch

_META = "meta.json"


class IVFVectorIndex:
    def __init__(self, spark: SparkSession, path: str, meta: dict):
        self.spark = spark
        self.path = path
        self.meta = meta

    @classmethod
    def create(
        cls,
        spark: SparkSession,
        path: str,
        dim: int,
        n_lists: int = 16,
        seed: int = 42,
    ) -> "IVFVectorIndex":
        """CREATE IF NOT EXISTS; params frozen (a different quantizer would
        strand every stored vector — mismatch raises)."""
        meta_path = os.path.join(path, _META)
        if os.path.exists(meta_path):
            idx = cls.load(spark, path)
            want = {"dim": dim, "n_lists": n_lists, "seed": seed}
            have = {k: idx.meta[k] for k in want}
            if want != have:
                raise ValueError(
                    f"index at {path} exists with {have}, asked for {want}; "
                    "quantizer params are frozen at create"
                )
            return idx
        meta = {"version": 1, "dim": dim, "n_lists": n_lists, "seed": seed,
                "epochs": []}
        _atomic_write_json(meta_path, meta)
        return cls(spark, path, meta)

    @classmethod
    def load(cls, spark: SparkSession, path: str) -> "IVFVectorIndex":
        with open(os.path.join(path, _META), encoding="utf-8") as f:
            return cls(spark, path, json.load(f))

    def committed_epochs(self) -> set[int]:
        return {e["epoch"] for e in self.meta["epochs"]}

    def centroids(self) -> DataFrame:
        """Regenerated from the frozen seed — config-scale, never stored."""
        cents = fixed_centroids(
            self.meta["dim"], self.meta["n_lists"], self.meta["seed"]
        )
        return self.spark.createDataFrame(
            list(enumerate(cents)), "list_id int, centroid array<double>"
        )

    # -- write ---------------------------------------------------------------

    def add(
        self,
        vectors: DataFrame,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        epoch: int | None = None,
    ) -> int | None:
        """Assign a batch to its lists and append it (exactly-once per
        ``epoch``). Returns the committed epoch id, or None if skipped."""
        if epoch is not None and epoch in self.committed_epochs():
            return None
        dim = self.meta["dim"]
        base = vectors.select(
            F.col(id_col).alias("id"),
            F.col(vec_col).cast("array<double>").alias("v"),
        ).where(
            F.assert_true(
                F.size("v") == F.lit(dim),
                f"IVFVectorIndex.add: embedding dim != indexed dim={dim}",
            ).isNull()
        )
        assigned = assign_to_lists(base, self.centroids())
        eid = epoch if epoch is not None else (
            next_auto_epoch(self.committed_epochs())
        )
        out_dir = os.path.join(self.path, "lists", f"epoch={eid}")
        assigned.write.mode("overwrite").partitionBy("list_id").parquet(out_dir)
        if not _has_parquet(out_dir):
            # A dynamic-partition write of an EMPTY batch leaves only
            # _SUCCESS — no schema-bearing file — and a later read of the
            # dir would throw 'unable to infer schema', bricking every
            # probe. Record the epoch in the ledger (exactly-once holds)
            # but drop the unreadable directory.
            import shutil as _sh

            _sh.rmtree(out_dir, ignore_errors=True)
            self.meta["epochs"].append({"epoch": eid, "empty": True})
        else:
            self.meta["epochs"].append({"epoch": eid})
        _atomic_write_json(os.path.join(self.path, _META), self.meta)
        return eid

    # -- read ----------------------------------------------------------------

    def _dirs(self, exclude_epochs: set[int] | None = None) -> list[str]:
        by_dir: dict[str, set[int]] = {}
        for e in self.meta["epochs"]:
            if e.get("empty"):
                continue  # empty epoch: ledger entry only, no directory
            by_dir.setdefault(str(e.get("dir", e["epoch"])), set()).add(e["epoch"])
        out = []
        for d, epochs in by_dir.items():
            if exclude_epochs and epochs <= exclude_epochs:
                continue
            if exclude_epochs and epochs & exclude_epochs:
                # Compaction merged an excluded epoch's rows into a shared
                # directory — they can no longer be skipped physically.
                raise ValueError(
                    f"cannot exclude epochs {sorted(epochs & exclude_epochs)}: "
                    f"compacted into shared dir epoch={d}"
                )
            out.append(d)
        return [os.path.join(self.path, "lists", f"epoch={d}") for d in out]

    def assigned(
        self,
        list_ids: list[int] | None = None,
        exclude_epochs: list[int] | None = None,
    ) -> DataFrame:
        """The stored (id, v, list_id) rows; ``list_ids`` restricts the scan
        to those lists' DIRECTORIES — the physical partition pruning that
        makes a probe O(nprobe/n_lists) of the index. ``exclude_epochs``
        drops whole (uncompacted) epoch directories from the scan — the
        streaming indexer probes "everything except the batch I just added"
        this way."""
        empty = "id long, v array<double>, list_id int"
        parts = []
        for d in self._dirs(set(exclude_epochs) if exclude_epochs else None):
            if list_ids is None:
                paths = [d]
            else:
                paths = [
                    os.path.join(d, f"list_id={li}")
                    for li in sorted(set(list_ids))
                    if os.path.isdir(os.path.join(d, f"list_id={li}"))
                ]
                if not paths:
                    continue
            # basePath keeps the list_id partition column when reading the
            # pruned leaf directories directly.
            parts.append(
                self.spark.read.option("basePath", d)
                .parquet(*paths)
                .select("id", "v", F.col("list_id").cast("int").alias("list_id"))
            )
        if not parts:
            return self.spark.createDataFrame([], empty)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    def topk(
        self,
        queries: DataFrame,
        vec_col: str = "embedding",
        id_col: str = "vec_id",
        k: int = 5,
        nprobe: int = 4,
        prune_lists: bool = True,
        exclude_epochs: list[int] | None = None,
    ) -> DataFrame:
        """IVF search over the stored index (same output shape and ranking
        as ``similarity.ivf_topk``).

        ``prune_lists=True`` first computes the query batch's probed-list
        union (one tiny job: |queries| × n_lists broadcast scores) and reads
        ONLY those list directories. For a query batch large enough to
        probe every list this degrades to the full read — pass
        ``prune_lists=False`` to skip the extra job in that regime.
        """
        list_ids = None
        if prune_lists:
            # THE probe ranking (shared with ivf_topk via probe_lists) —
            # the pruned directory set must be exactly the lists the search
            # will probe.
            from .similarity import probe_lists

            probed = (
                probe_lists(self.centroids(), queries, vec_col, id_col, nprobe)
                .select("list_id").distinct().collect()
            )
            list_ids = [r["list_id"] for r in probed]
        return ivf_topk(
            self.centroids(),
            self.assigned(list_ids, exclude_epochs=exclude_epochs),
            queries,
            vec_col=vec_col,
            id_col=id_col,
            k=k,
            nprobe=nprobe,
        )

    # -- maintenance -----------------------------------------------------------

    def compact(self, drop_ids=None) -> dict:
        """Merge epoch directories (same contract as the dedup index's
        compact: ledger preserved, write-new-then-swap, distinct compact-*
        namespace so the next add cannot clobber it).

        ``drop_ids`` removes those vectors during the rewrite — the sidecar
        half of a takedown: embeddings are derived from the purged content
        and must not keep serving as ANN results after the lake's
        ``purge_keys``. Forces a rewrite even with a single directory.
        """
        drop_ids = sorted(set(drop_ids)) if drop_ids else None
        live = [e for e in self.meta["epochs"] if not e.get("empty")]
        dirs = {str(e.get("dir", e["epoch"])) for e in live}
        if len(dirs) <= 1 and not drop_ids:
            return {"compacted": False, "dirs": len(dirs)}
        if not dirs:
            return {"compacted": False, "dirs": 0}
        new_dir = _fresh_compact_name(
            max(e["epoch"] for e in self.meta["epochs"]), dirs
        )
        rows = self.assigned()
        if drop_ids:
            if len(drop_ids) <= 1000:
                rows = rows.where(~F.col("id").isin(drop_ids))
            else:
                drop_df = self.spark.createDataFrame(
                    [(i,) for i in drop_ids], "id long"
                )
                rows = rows.join(
                    F.broadcast(drop_df), on="id", how="left_anti"
                )
        new_path = os.path.join(self.path, "lists", f"epoch={new_dir}")
        (
            rows.write.mode("overwrite")
            .partitionBy("list_id")
            .parquet(new_path)
        )
        import shutil as _sh

        if not _has_parquet(new_path):
            # drop_ids removed everything: a dynamic-partition write of an
            # empty frame leaves no schema-bearing file (see add()) — mark
            # every epoch empty instead of pointing the ledger at an
            # unreadable directory.
            _sh.rmtree(new_path, ignore_errors=True)
            self.meta["epochs"] = [
                e if e.get("empty") else {"epoch": e["epoch"], "empty": True}
                for e in sorted(self.meta["epochs"], key=lambda e: e["epoch"])
            ]
        else:
            self.meta["epochs"] = [
                e if e.get("empty") else {"epoch": e["epoch"], "dir": new_dir}
                for e in sorted(self.meta["epochs"], key=lambda e: e["epoch"])
            ]
        _atomic_write_json(os.path.join(self.path, _META), self.meta)
        for d in dirs:
            _sh.rmtree(
                os.path.join(self.path, "lists", f"epoch={d}"), ignore_errors=True
            )
        return {
            "compacted": True,
            "dirs_merged": len(dirs),
            "dir": new_dir,
            "dropped_ids": len(drop_ids or []),
        }
