"""Incrementally-maintained MinHash/LSH near-dup index.

The batch dedup family (operators/textdedup.py) answers "which documents in
THIS corpus are near-duplicates of each other" — and recomputes shingles +
signatures for every document every run. A continuously-ingesting pipeline
(the CDC posture of this engine) asks a different question each epoch:
"which of the NEW documents duplicate anything already ingested". At
10^10 accumulated documents, re-shingling the corpus per epoch is the
dominant cost and is pure waste: old documents' signatures never change.

This index persists, per ingest epoch:

- ``sigs/epoch=N/``   — (doc_id, sig array<string>) MinHash signatures
- ``bands/epoch=N/``  — (band, key, doc_id) LSH band keys

and a ``meta.json`` (atomic rename, icelite-style) carrying the LSH
parameters, the committed-epoch ledger (exactly-once: re-running an epoch
is a no-op) and the frozen stop-shingle list. ``update(new_docs)``:

1. shingles + signs ONLY the new batch — the single text-touching step;
2. joins the batch's band keys against the stored band table (equi-join on
   ``(band, key)`` — candidates only, never all-pairs; AQE handles skewed
   band keys from mass-identical docs);
3. verifies candidates by SIGNATURE AGREEMENT — the unbiased MinHash
   estimate of Jaccard (matching components / num_hashes). Exact Jaccard
   would need the old documents' shingle sets, which are the same size as
   the text itself; an index that stores them has not saved anything.
   More hashes buy precision (stderr ≈ sqrt(j(1-j)/H));
4. appends the batch's sigs + bands and commits the epoch atomically.

Scale notes: the per-update join shuffles O(new-batch bands) against
O(corpus bands) — compact fixed-width rows (band int, md5 key, id), ~100×
smaller than the text. Signatures of candidate OLD docs are fetched by a
semi-join on the sigs table, not broadcast. The stop-shingle cut is frozen
at bootstrap (a drifting document-frequency cut would change the Jaccard
space between epochs and make scores incomparable).

Reuses the batch family's primitives (same shingles, same md5 order-
statistic MinHash — sibling-lambda-HOF-safe), so index scores are directly
comparable to ``minhash_lsh_pairs`` signatures.
"""

from __future__ import annotations

import json
import os
import tempfile

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from .textdedup import _signature_from_shingles, hot_shingles, shingles

from .epochutil import next_auto_epoch

_META = "meta.json"


def _atomic_write_json(path: str, obj) -> None:
    d = os.path.dirname(path)
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
    with os.fdopen(fd, "w", encoding="utf-8") as f:
        json.dump(obj, f)
    os.replace(tmp, path)


def _fresh_compact_name(max_epoch: int, existing_dirs: set[str]) -> str:
    """A merged-dir name that collides with NO live directory. Epoch ids
    are caller-supplied and may commit out of order, so compact-{max} can
    already exist from an earlier compaction; overwriting a SOURCE dir
    while lazily reading it (then sweeping it) would destroy the index."""
    name = f"compact-{max_epoch}"
    gen = 1
    while name in existing_dirs:
        gen += 1
        name = f"compact-{max_epoch}-{gen}"
    return name


def _has_parquet(root: str) -> bool:
    """Any data-bearing parquet file under ``root`` (a dynamic-partition
    write of an empty frame leaves only _SUCCESS, which a later read cannot
    infer a schema from)."""
    for dirpath, _dirs, files in os.walk(root):
        if any(f.endswith(".parquet") for f in files):
            return True
    return False


def _sig_agree_expr(a: str, b: str, num_hashes: int):
    """Estimated Jaccard: fraction of equal signature components.

    SQL-parsed lambdas on purpose — python-lambda sibling HOFs under one
    expression mis-bind in PySpark 4.1 (see textdedup._signature_from_shingles).
    """
    return F.expr(
        f"aggregate(zip_with({a}, {b}, (x, y) -> IF(x = y, 1, 0)), "
        f"0, (acc, v) -> acc + v) / CAST({num_hashes} AS DOUBLE)"
    )


class MinHashDedupIndex:
    """See module docstring. Create once (optionally bootstrapping the
    stop-shingle list), then ``update()`` per ingest epoch."""

    def __init__(self, spark: SparkSession, path: str, meta: dict):
        self.spark = spark
        self.path = path
        self.meta = meta

    # -- lifecycle -----------------------------------------------------------

    @classmethod
    def create(
        cls,
        spark: SparkSession,
        path: str,
        n: int = 3,
        num_hashes: int = 12,
        bands: int = 4,
        threshold: float = 0.5,
        stop_shingles: list[str] | None = None,
        id_type: str = "long",
    ) -> "MinHashDedupIndex":
        """CREATE IF NOT EXISTS; existing params win (and must not be
        silently contradicted — changing LSH params invalidates every stored
        signature, so a param mismatch raises). ``id_type`` is the doc-id
        column type ("long" for synthetic ids, "string" for url-keyed
        corpora) — frozen like the LSH params."""
        if id_type not in ("long", "string"):
            raise ValueError(f"id_type must be 'long' or 'string', got {id_type!r}")
        meta_path = os.path.join(path, _META)
        if os.path.exists(meta_path):
            idx = cls.load(spark, path)
            want = {"n": n, "num_hashes": num_hashes, "bands": bands,
                    "id_type": id_type}
            have = {k: idx.meta[k] for k in want}
            if want != have:
                raise ValueError(
                    f"index at {path} exists with params {have}, asked for "
                    f"{want}; LSH params are frozen at create"
                )
            return idx
        if num_hashes % bands != 0:
            raise ValueError("num_hashes must be divisible by bands")
        meta = {
            "version": 1,
            "n": n,
            "num_hashes": num_hashes,
            "bands": bands,
            "threshold": threshold,
            "id_type": id_type,
            "stop_shingles": sorted(stop_shingles or []),
            "epochs": [],
        }
        _atomic_write_json(meta_path, meta)
        return cls(spark, path, meta)

    @classmethod
    def load(cls, spark: SparkSession, path: str) -> "MinHashDedupIndex":
        with open(os.path.join(path, _META), encoding="utf-8") as f:
            return cls(spark, path, json.load(f))

    @classmethod
    def bootstrap_stop_shingles(
        cls, docs: DataFrame, text_col: str, id_col: str, n: int, max_df: int
    ) -> list[str]:
        """Corpus-global stop-shingle list to freeze at create time (the
        hot-shingle DF cut of the batch family, computed ONCE — a per-epoch
        cut would drift and make scores incomparable across epochs)."""
        base = docs.select(
            F.col(id_col).alias("doc"), shingles(F.col(text_col), n).alias("sh")
        )
        return sorted(hot_shingles(base, max_df))

    def committed_epochs(self) -> set[int]:
        return {e["epoch"] for e in self.meta["epochs"]}

    # -- internals -----------------------------------------------------------

    def _sign(self, docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
        """(doc_id, sig) for a batch — the only text-touching step."""
        sh = shingles(F.col(text_col), self.meta["n"])
        stop = self.meta["stop_shingles"]
        if stop:
            sh = F.array_except(sh, F.array(*[F.lit(s) for s in stop]))
        # Docs whose (post-stop-cut) shingle set is EMPTY are unindexable:
        # signing them would yield the fold's identity signature, making
        # every pair of such docs a "perfect duplicate" despite sharing no
        # content. Their Jaccard space is empty — exclude them.
        base = docs.select(
            F.col(id_col).cast(self._id_type).alias("doc_id"), sh.alias("_sh")
        ).where(F.size("_sh") > 0)
        return base.select(
            "doc_id",
            _signature_from_shingles(F.col("_sh"), self.meta["num_hashes"]).alias("sig"),
        )

    @property
    def _id_type(self) -> str:
        return self.meta.get("id_type", "long")

    def _band_keys(self, sigs: DataFrame) -> DataFrame:
        """(band, key, doc_id) from signatures — no text involved."""
        bands, num_hashes = self.meta["bands"], self.meta["num_hashes"]
        rows = num_hashes // bands
        return sigs.select(
            "doc_id",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(bi).alias("band"),
                            F.md5(
                                F.concat_ws(
                                    "|",
                                    *[F.col("sig")[bi * rows + r] for r in range(rows)],
                                )
                            ).alias("key"),
                        )
                        for bi in range(bands)
                    ]
                )
            ).alias("bk"),
        ).select(F.col("bk.band").alias("band"), F.col("bk.key").alias("key"), "doc_id")

    def _epoch_paths(self, sub: str) -> list[str]:
        # Compacted epochs share one merged directory (see compact());
        # dedupe while preserving order.
        seen: dict[str, None] = {}
        for e in self.meta["epochs"]:
            seen.setdefault(str(e.get("dir", e["epoch"])), None)
        return [os.path.join(self.path, sub, f"epoch={d}") for d in seen]

    def stored_sigs(self, resolve_latest: bool = False) -> DataFrame:
        """Stored (doc_id, sig, _iepoch). ``resolve_latest=True`` collapses
        re-shipped ids to their newest signature (one max_by hash agg) —
        used by compact(), NOT by the per-update hot path (it would shuffle
        the whole sig table per batch; between compactions a re-shipped id
        carries both versions and pair emission dedups by max score)."""
        paths = self._epoch_paths("sigs")
        if not paths:
            df = self.spark.createDataFrame(
                [], f"doc_id {self._id_type}, sig array<string>, _iepoch int"
            )
        else:
            df = self.spark.read.parquet(*paths)
            if "_iepoch" not in df.columns:
                df = df.withColumn("_iepoch", F.lit(-1))
        if resolve_latest:
            df = df.groupBy("doc_id").agg(
                F.max_by("sig", "_iepoch").alias("sig"),
                F.max("_iepoch").alias("_iepoch"),
            )
        return df.select("doc_id", "sig", "_iepoch")

    def stored_bands(self) -> DataFrame:
        paths = self._epoch_paths("bands")
        if not paths:
            return self.spark.createDataFrame(
                [], f"band int, key string, doc_id {self._id_type}"
            )
        return self.spark.read.parquet(*paths)

    # -- the operator --------------------------------------------------------

    def update(
        self,
        new_docs: DataFrame,
        id_col: str = "doc_id",
        text_col: str = "text",
        epoch: int | None = None,
        commit: bool = True,
        max_bucket: int | None = None,
        materialize: bool = True,
    ) -> DataFrame:
        """Near-dup pairs involving at least one NEW document, then (unless
        ``commit=False``) add the batch to the index atomically.

        ``max_bucket`` bounds the quadratic skew key: a band bucket holding
        m near-identical docs yields O(m·new) candidates. With the cap, the
        join's index side keeps only the ``max_bucket`` LOWEST doc_ids per
        (band, key) — every new duplicate still pairs with its cluster's
        deterministic representatives (dedup verdicts are unchanged; only
        redundant same-cluster pairs are dropped), and candidate count is
        bounded by |new bands| × max_bucket. REQUIRED at real scale; the
        None default is for small-corpus oracle parity.

        Returns (id_a, id_b, est_jaccard) with ``id_a < id_b`` — new-vs-old
        and new-vs-new pairs; old-vs-old pairs were reported when their
        epochs arrived and are never recomputed (the point of the index).
        The result is materialized (localCheckpoint) BEFORE the commit so
        its plan reads the pre-commit index state — otherwise a consumer
        collecting after the commit would see every new doc paired with
        itself.

        Exactly-once: a committed ``epoch`` is skipped (returns an empty
        pair frame — its pairs were already reported when it committed).
        """
        if epoch is not None and epoch in self.committed_epochs():
            return self.spark.createDataFrame(
                [], f"id_a {self._id_type}, id_b {self._id_type}, est_jaccard double"
            )
        num_hashes = self.meta["num_hashes"]
        threshold = self.meta["threshold"]

        new_sigs = self._sign(new_docs, id_col, text_col).persist()
        try:
            new_bands = self._band_keys(new_sigs)
            all_bands = (
                self.stored_bands().withColumn("_stored", F.lit(True))
                .unionByName(new_bands.withColumn("_stored", F.lit(False)))
            )
            if max_bucket is not None:
                # Keep max_bucket representatives per bucket, STORED docs
                # first (then lowest id): a mass-duplicated new batch must
                # never evict the already-shipped copy from the bucket, or
                # a dup-of-old would surface only as new-vs-new and
                # consumers that drop only old-adjacent docs (curate) would
                # ship it again. The window's hot-key task reads m rows to
                # emit max_bucket — linear in the bucket, never quadratic
                # in the join.
                from pyspark.sql import Window

                w = Window.partitionBy("band", "key").orderBy(
                    F.desc("_stored"), F.asc("doc_id")
                )
                all_bands = (
                    all_bands.withColumn("_rn", F.row_number().over(w))
                    .where(F.col("_rn") <= max_bucket)
                    .drop("_rn")
                )
            all_bands = all_bands.drop("_stored")
            cand = (
                new_bands.alias("x")
                .join(all_bands.alias("y"), on=["band", "key"])
                .where(F.col("x.doc_id") != F.col("y.doc_id"))
                .select(
                    F.least("x.doc_id", "y.doc_id").alias("id_a"),
                    F.greatest("x.doc_id", "y.doc_id").alias("id_b"),
                )
                .distinct()
            )
            all_sigs = (
                self.stored_sigs().select("doc_id", "sig").unionByName(new_sigs)
            )
            verified = (
                cand.join(
                    all_sigs.select(
                        F.col("doc_id").alias("id_a"), F.col("sig").alias("sig_a")
                    ),
                    "id_a",
                )
                .join(
                    all_sigs.select(
                        F.col("doc_id").alias("id_b"), F.col("sig").alias("sig_b")
                    ),
                    "id_b",
                )
                .withColumn(
                    "est_jaccard",
                    F.round(_sig_agree_expr("sig_a", "sig_b", num_hashes), 6),
                )
                # One row per pair even when a re-shipped id carries several
                # stored signature versions (resolved fully at compaction):
                # keep the best-scoring version's estimate.
                .groupBy("id_a", "id_b")
                .agg(F.max("est_jaccard").alias("est_jaccard"))
                .where(F.col("est_jaccard") >= threshold)
                .select("id_a", "id_b", "est_jaccard")
            )
            if not commit and not materialize:
                # Lazy plan for composition/plan-pinning — only safe
                # read-only: a commit MUST materialize first or a consumer
                # collecting later would see the batch self-paired.
                return verified
            # Materialize off the pre-commit state (and off new_sigs' cache).
            pairs = verified.localCheckpoint(eager=True)
            if commit:
                self._commit_sigs(new_sigs, epoch)
            return pairs
        finally:
            new_sigs.unpersist()

    def _commit_sigs(self, sigs: DataFrame, epoch: int | None) -> int:
        eid = epoch if epoch is not None else (
            next_auto_epoch(self.committed_epochs())
        )
        # Size epoch files by ROW COUNT, not input partitioning: a small
        # batch written at full parallelism leaves ~32 near-empty files per
        # epoch, and the accumulated listing/footer overhead made updates
        # SLOWER than full recompute at small scale (measured,
        # bench/index_bench.py). sigs is persisted by the callers, so the
        # count is a cached-data scan, not a recompute.
        par = max(self.spark.sparkContext.defaultParallelism, 1)
        n_sig_files = max(1, min(int(sigs.count() // 500_000) + 1, par))
        # _iepoch stamps each signature's ingest epoch so compaction can
        # LWW-resolve re-shipped ids to their newest version.
        sigs.select("doc_id", "sig", F.lit(eid).cast("int").alias("_iepoch")) \
            .repartition(n_sig_files) \
            .write.mode("overwrite").parquet(
            os.path.join(self.path, "sigs", f"epoch={eid}")
        )
        n_band_files = max(1, min(
            int(sigs.count() * self.meta["bands"] // 2_000_000) + 1, par
        ))
        self._band_keys(sigs).repartition(n_band_files) \
            .write.mode("overwrite").parquet(
            os.path.join(self.path, "bands", f"epoch={eid}")
        )
        # Data first, meta pointer second (crash leaves orphan data
        # dirs, never a committed epoch without data).
        self.meta["epochs"].append({"epoch": eid})
        _atomic_write_json(os.path.join(self.path, _META), self.meta)
        return eid

    def commit(
        self,
        docs: DataFrame,
        id_col: str = "doc_id",
        text_col: str = "text",
        epoch: int | None = None,
    ) -> int | None:
        """Index a batch WITHOUT reporting pairs — for pipelines that probe
        with :meth:`duplicates` first, filter, and then index only the
        surviving (shipped) documents, so the index tracks the shipped
        corpus rather than everything ever seen. Returns the committed
        epoch id, or None if ``epoch`` was already committed (exactly-once,
        same ledger as :meth:`update`)."""
        if epoch is not None and epoch in self.committed_epochs():
            return None
        sigs = self._sign(docs, id_col, text_col).persist()
        try:
            return self._commit_sigs(sigs, epoch)
        finally:
            sigs.unpersist()

    def duplicates(
        self,
        docs: DataFrame,
        id_col: str = "doc_id",
        text_col: str = "text",
        max_bucket: int | None = None,
        materialize: bool = True,
    ) -> DataFrame:
        """Read-only probe: pairs a batch would produce, without indexing it
        (e.g. score a candidate crawl against the corpus before ingest).
        ``materialize=False`` returns the lazy plan (plan pinning /
        composition into a larger cached pipeline)."""
        return self.update(docs, id_col, text_col, commit=False,
                           max_bucket=max_bucket, materialize=materialize)

    def compact(self, drop_ids=None) -> dict:
        """Merge all epoch directories into one (maintenance).

        A long-running pipeline accumulates one sigs/bands directory pair
        per epoch; every update then pays O(epochs) file listing and opens
        thousands of small parquet files. Compaction rewrites the
        accumulated state as a single epoch directory while PRESERVING the
        exactly-once ledger (the committed epoch ids keep their entries,
        all pointing at the merged directory), so replaying an old epoch is
        still a no-op. Write-new-then-swap: a crash mid-compact leaves the
        old directories and the old meta intact (the new dir is an orphan).

        ``drop_ids`` removes those doc ids' signatures and band keys during
        the rewrite — the sidecar half of a takedown (the lake's
        ``purge_keys`` removes the rows; this removes the derived MinHash
        state, which would otherwise keep REPORTING the purged doc as a
        near-dup neighbour forever). Forces a rewrite even when a single
        directory already exists.
        """
        drop_ids = sorted(set(drop_ids)) if drop_ids else None
        epochs = [e["epoch"] for e in self.meta["epochs"]]
        dirs = {str(e.get("dir", e["epoch"])) for e in self.meta["epochs"]}
        if len(dirs) <= 1 and not drop_ids:
            return {"compacted": False, "dirs": len(dirs)}
        if not dirs:
            return {"compacted": False, "dirs": 0}
        # Distinct namespace: a plain integer would collide with the NEXT
        # epoch commit's directory (max+1); _fresh_compact_name also
        # guards against out-of-order epochs reproducing a PREVIOUS
        # compaction's name (overwriting a source dir mid-read).
        new_dir = _fresh_compact_name(max(epochs), dirs)
        # Compaction is also when re-shipped ids collapse: keep each
        # doc_id's LATEST (_iepoch) signature — stale versions stop
        # consuming bucket-cap slots and emitting shadow pairs.
        latest = self.stored_sigs(resolve_latest=True)
        if drop_ids:
            if len(drop_ids) <= 1000:
                latest = latest.where(~F.col("doc_id").isin(drop_ids))
            else:
                drop_df = self.spark.createDataFrame(
                    [(i,) for i in drop_ids], f"doc_id {self._id_type}"
                )
                latest = latest.join(
                    F.broadcast(drop_df), on="doc_id", how="left_anti"
                )
        latest.repartition(
            max(self.spark.sparkContext.defaultParallelism, 1)
        ).write.mode("overwrite").parquet(
            os.path.join(self.path, "sigs", f"epoch={new_dir}")
        )
        self._band_keys(
            self.spark.read.parquet(
                os.path.join(self.path, "sigs", f"epoch={new_dir}")
            )
        ).repartition(
            max(self.spark.sparkContext.defaultParallelism, 1)
        ).write.mode("overwrite").parquet(
            os.path.join(self.path, "bands", f"epoch={new_dir}")
        )
        self.meta["epochs"] = [
            {"epoch": e, "dir": new_dir} for e in sorted(epochs)
        ]
        _atomic_write_json(os.path.join(self.path, _META), self.meta)
        # Old directories are now orphans; sweep them (best-effort — a
        # failure here leaks storage, never correctness).
        import shutil as _sh

        for sub in ("sigs", "bands"):
            for d in dirs:
                _sh.rmtree(
                    os.path.join(self.path, sub, f"epoch={d}"),
                    ignore_errors=True,
                )
        return {
            "compacted": True,
            "dirs_merged": len(dirs),
            "dir": new_dir,
            "dropped_ids": len(drop_ids or []),
        }


def sql_dedup_index_update(
    table: str,
    text_col: str,
    id_col: str,
    new_pred: str,
    n: int = 3,
    num_hashes: int = 12,
    bands: int = 4,
    threshold: float = 0.5,
) -> str:
    """DuckDB twin of one ``update()`` call: the pairs reported when the
    docs matching ``new_pred`` (a predicate over the aliased ``doc`` id)
    arrive into an index already holding the rest of ``table``. Candidate
    x-side ranges over new docs only; verification is the same
    signature-agreement estimate the index uses."""
    from .textdedup import sql_shingles

    rows = num_hashes // bands
    mh = ", ".join(
        f"list_min(list_transform(sh, s -> md5('{i}:' || s))) AS mh{i}"
        for i in range(num_hashes)
    )
    band_rows = " UNION ALL ".join(
        f"SELECT doc, {bi} AS band, "
        f"md5(concat_ws('|', {', '.join(f'mh{bi * rows + r}' for r in range(rows))})) AS key "
        f"FROM sig"
        for bi in range(bands)
    )
    agree = " + ".join(
        f"CAST(a.mh{i} = b.mh{i} AS INT)" for i in range(num_hashes)
    )
    est = f"round(({agree}) / CAST({num_hashes} AS DOUBLE), 6)"
    return f"""
WITH base AS (
  SELECT {id_col} AS doc, {sql_shingles(text_col, n)} AS sh FROM {table}
), sig AS (
  SELECT doc, {mh} FROM base
), bk AS (
  {band_rows}
), cand AS (
  SELECT DISTINCT least(x.doc, y.doc) AS id_a, greatest(x.doc, y.doc) AS id_b
  FROM bk x JOIN bk y ON x.band = y.band AND x.key = y.key AND x.doc <> y.doc
  WHERE x.doc IN (SELECT doc FROM base WHERE {new_pred})
), scored AS (
  SELECT c.id_a, c.id_b, {est} AS est_jaccard
  FROM cand c
  JOIN sig a ON a.doc = c.id_a
  JOIN sig b ON b.doc = c.id_b
)
SELECT id_a, id_b, est_jaccard FROM scored WHERE est_jaccard >= {threshold}
"""
