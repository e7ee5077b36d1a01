"""Term inverted index over the corpus, maintained incrementally off the
change feed — the engine's third persistent index family (with
operators/dedup_index.py and operators/vector_index.py).

A CDC-ingesting corpus needs term lookup ("which pages mention these
words") without re-tokenizing 10^10 accumulated documents per query or
per epoch. Batch search (:func:`build_postings` + :func:`search_postings`)
answers it for one corpus snapshot; :class:`InvertedIndex` persists
postings and makes BOTH sides incremental:

* per epoch, only the NEW batch is tokenized (the single text-touching
  step) — postings appended under ``postings/epoch=N/bucket=B/``,
  physically partitioned by a term-hash bucket;
* a lookup routes its query terms to buckets DRIVER-SIDE with the
  xxhash64 twin (lake/xxhash.py — zero Spark jobs before the pruned scan)
  and reads ONLY those bucket directories: probe cost is
  O(query-term buckets / n_buckets) of the index, the same physical
  pruning the IVF index applies to its lists;
* url-keyed CDC updates re-ship a document: its new postings land in the
  new epoch and a per-doc ledger (``docs/epoch=N``) records the latest
  epoch per doc; lookups keep only postings whose epoch IS the doc's
  latest (stale terms from superseded versions drop out) and skip
  tombstoned docs (:meth:`remove` — takedowns without rewriting
  postings);
* ``meta.json`` (atomic rename) freezes n_buckets/id_type and carries the
  committed-epoch ledger — re-running an epoch is a no-op
  (exactly-once, same contract as the sibling indexes);
* :meth:`compact` rewrites live-latest postings into one merged directory
  and physically drops stale/tombstoned rows.

Scale notes: postings rows are (term, doc_id, tf) — fixed-width and tiny
vs the text (``positional=True`` adds the sorted token-position array,
bounded by tf, enabling :meth:`InvertedIndex.lookup_phrase` /
:func:`phrase_search` — exact phrase match by slot-shift intersection,
no postings self-join). The per-lookup doc-ledger join is a doc-keyed equi-join
(AQE-handled); between compactions it is the price of update semantics —
compaction folds it away for the cold majority. Scoring: query-term
tf-sum (:func:`search_postings`) and Okapi BM25 (:func:`bm25_search`,
:meth:`InvertedIndex.lookup_bm25` — doc lengths and corpus N/avgdl live
in the doc ledger, so BM25 never scans the full postings).

The reference pipeline has no search surface; this is a beyond-reference
capability in the LLM-data-pipeline family (SURVEY.md §2.10).
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile
from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..functions import textstats as TS
from ..lake.xxhash import spark_xxhash64

from .epochutil import next_auto_epoch

_META = "meta.json"


def _atomic_write_json(path: str, obj) -> None:
    d = os.path.dirname(path)
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
    with os.fdopen(fd, "w", encoding="utf-8") as f:
        json.dump(obj, f)
    os.replace(tmp, path)


def _has_parquet(root: str) -> bool:
    for dirpath, _dirs, files in os.walk(root):
        if any(f.endswith(".parquet") for f in files):
            return True
    return False


# ---------------------------------------------------------------------------
# Batch (contract-able) core
# ---------------------------------------------------------------------------

def _terms(text_col: str) -> F.Column:
    """Lowercased whitespace terms (textstats tokenization)."""
    return TS.tokens(F.lower(F.col(text_col)))


def sql_terms(text_col: str) -> str:
    return TS.sql_tokens(f"lower({text_col})")


def build_postings(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(term, doc_id, tf) — one narrow explode + one map-side-combinable
    hash agg; the only step that touches text."""
    return (
        df.select(
            F.col(id_col).alias("doc_id"), F.explode(_terms(text_col)).alias("term")
        )
        .groupBy("term", "doc_id")
        .agg(F.count("*").cast("long").alias("tf"))
    )


def sql_build_postings(input_sql: str, id_col: str, text_col: str) -> str:
    return f"""
SELECT term, doc_id, count(*) AS tf FROM (
  SELECT {id_col} AS doc_id, unnest({sql_terms(text_col)}) AS term
  FROM ({input_sql}))
GROUP BY term, doc_id
"""


def _normalize_terms(terms) -> list[str]:
    out = sorted({t.lower() for t in terms})
    if not out:
        raise ValueError("search needs at least one term")
    return out


def search_postings(
    postings: DataFrame, terms, mode: str = "and", top_k: int = 10
) -> DataFrame:
    """Top-k docs for the query terms: (doc_id, n_terms, score).

    score = sum of tf over matched query terms; AND requires all terms.
    The term filter is an isin predicate that pushes to the scan; ranking
    is (score desc, doc_id) via one TakeOrderedAndProject — never a full
    sort of the corpus.
    """
    if mode not in ("and", "or"):
        raise ValueError(f"mode must be 'and' or 'or', got {mode!r}")
    qs = _normalize_terms(terms)
    agg = (
        postings.where(F.col("term").isin(qs))
        .groupBy("doc_id")
        .agg(
            F.countDistinct("term").alias("n_terms"),
            F.sum("tf").cast("long").alias("score"),
        )
    )
    if mode == "and":
        agg = agg.where(F.col("n_terms") == len(qs))
    return agg.orderBy(F.desc("score"), F.asc("doc_id")).limit(top_k)


def sql_search_postings(
    postings_sql: str, terms, mode: str = "and", top_k: int = 10
) -> str:
    qs = _normalize_terms(terms)
    in_list = ", ".join("'" + t.replace("'", "''") + "'" for t in qs)
    having = f"HAVING count(DISTINCT term) = {len(qs)}" if mode == "and" else ""
    return f"""
SELECT doc_id, count(DISTINCT term) AS n_terms, CAST(sum(tf) AS BIGINT) AS score
FROM ({postings_sql})
WHERE term IN ({in_list})
GROUP BY doc_id
{having}
ORDER BY score DESC, doc_id
LIMIT {top_k}
"""


# ---------------------------------------------------------------------------
# Persistent incremental index
# ---------------------------------------------------------------------------

class InvertedIndex:
    """See module docstring. Create once, ``update()`` per ingest epoch."""

    def __init__(self, spark: SparkSession, path: str, meta: dict):
        self.spark = spark
        self.path = path
        self.meta = meta

    @classmethod
    def create(
        cls,
        spark: SparkSession,
        path: str,
        n_buckets: int = 16,
        id_type: str = "long",
        positional: bool = False,
    ) -> "InvertedIndex":
        """CREATE IF NOT EXISTS; n_buckets/id_type/positional frozen
        (re-bucketing would strand every stored posting, and a
        positional lookup over non-positional postings has no data —
        mismatch raises)."""
        if id_type not in ("long", "string"):
            raise ValueError(f"id_type must be 'long' or 'string', got {id_type!r}")
        meta_path = os.path.join(path, _META)
        if os.path.exists(meta_path):
            idx = cls.load(spark, path)
            want = {
                "n_buckets": n_buckets,
                "id_type": id_type,
                "positional": positional,
            }
            have = {k: idx.meta.get(k, False) for k in want}
            if want != have:
                raise ValueError(
                    f"index at {path} exists with {have}, asked for {want}; "
                    "params are frozen at create"
                )
            return idx
        meta = {
            "version": 1,
            "n_buckets": n_buckets,
            "id_type": id_type,
            "positional": positional,
            "epochs": [],
        }
        _atomic_write_json(meta_path, meta)
        return cls(spark, path, meta)

    @classmethod
    def load(cls, spark: SparkSession, path: str) -> "InvertedIndex":
        with open(os.path.join(path, _META), encoding="utf-8") as f:
            return cls(spark, path, json.load(f))

    def committed_epochs(self) -> set[int]:
        return {e["epoch"] for e in self.meta["epochs"]}

    @property
    def _id_type(self) -> str:
        return self.meta["id_type"]

    # -- write ----------------------------------------------------------------

    def update(
        self,
        docs: DataFrame,
        id_col: str = "doc_id",
        text_col: str = "text",
        epoch: int | None = None,
        deletes: DataFrame | None = None,
    ) -> int | None:
        """Index a batch (exactly-once per ``epoch``): tokenize ONLY the
        batch, append bucket-partitioned postings + the doc-ledger rows.
        ``deletes`` (a frame carrying ``id_col``) tombstones those docs in
        the SAME epoch commit — the change-feed shape, where one
        micro-batch carries upserts and deletes together; a doc appearing
        on both sides is a delete (the tombstone wins within an epoch).
        Returns the committed epoch, or None if the epoch was a no-op."""
        if epoch is not None and epoch in self.committed_epochs():
            return None
        eid = epoch if epoch is not None else (
            next_auto_epoch(self.committed_epochs())
        )
        base = docs.select(
            F.col(id_col).cast(self._id_type).alias("doc_id"),
            F.col(text_col).alias("text"),
        )
        del_ids = None
        if deletes is not None:
            del_ids = deletes.select(
                F.col(id_col).cast(self._id_type).alias("doc_id")
            ).distinct()
            base = base.join(del_ids, "doc_id", "left_anti")
        # Persisted: the postings write and the ledger's doclen aggregate
        # are two separate actions — without the persist the second one
        # re-runs the whole tokenize/explode (and re-reads a streaming
        # micro-batch source), doubling the dominant per-epoch cost.
        builder = (
            build_positional_postings
            if self.meta.get("positional")
            else build_postings
        )
        batch_posts = builder(base, "doc_id", "text").persist()
        postings = batch_posts.select(
            "term",
            "doc_id",
            "tf",
            *(["positions"] if self.meta.get("positional") else []),
            F.lit(eid).alias("_iepoch"),
            F.pmod(F.xxhash64("term"), F.lit(self.meta["n_buckets"]))
            .cast("int")
            .alias("bucket"),
        )
        post_dir = os.path.join(self.path, "postings", f"epoch={eid}")
        postings.write.mode("overwrite").partitionBy("bucket").parquet(post_dir)
        # Doc ledger carries the token count (_dl): BM25 length norm and
        # corpus avgdl come from the ledger, never from a full postings scan.
        doclen = batch_posts.groupBy("doc_id").agg(F.sum("tf").alias("_dl"))
        ledger = (
            base.select("doc_id")
            .distinct()
            .join(doclen, "doc_id", "left")
            .select(
                "doc_id",
                F.lit(eid).alias("_iepoch"),
                F.lit(False).alias("_del"),
                F.coalesce(F.col("_dl"), F.lit(0)).cast("long").alias("_dl"),
            )
        )
        if del_ids is not None:
            ledger = ledger.unionByName(
                del_ids.select(
                    "doc_id",
                    F.lit(eid).alias("_iepoch"),
                    F.lit(True).alias("_del"),
                    F.lit(0).cast("long").alias("_dl"),
                )
            )
        docs_dir = os.path.join(self.path, "docs", f"epoch={eid}")
        ledger.write.mode("overwrite").parquet(docs_dir)
        batch_posts.unpersist()
        entry: dict = {"epoch": eid}
        if not _has_parquet(post_dir):
            # Empty dynamic-partition write leaves only _SUCCESS — drop the
            # schema-less dir but keep the ledger entry (exactly-once).
            shutil.rmtree(post_dir, ignore_errors=True)
            entry["empty"] = True
            if not _has_parquet(docs_dir):
                shutil.rmtree(docs_dir, ignore_errors=True)
                entry["no_docs"] = True
        self.meta["epochs"].append(entry)
        _atomic_write_json(os.path.join(self.path, _META), self.meta)
        return eid

    def remove(self, doc_ids, epoch: int | None = None) -> int | None:
        """Tombstone documents (takedown) without touching postings; their
        rows stop matching at lookup and are physically dropped by
        :meth:`compact`."""
        if epoch is not None and epoch in self.committed_epochs():
            return None
        eid = epoch if epoch is not None else (
            next_auto_epoch(self.committed_epochs())
        )
        rows = [(d,) for d in doc_ids]
        ledger = self.spark.createDataFrame(
            rows, f"doc_id {self._id_type}"
        ).select(
            "doc_id",
            F.lit(eid).alias("_iepoch"),
            F.lit(True).alias("_del"),
            F.lit(0).cast("long").alias("_dl"),
        )
        docs_dir = os.path.join(self.path, "docs", f"epoch={eid}")
        ledger.write.mode("overwrite").parquet(docs_dir)
        entry: dict = {"epoch": eid, "empty": True}
        if not _has_parquet(docs_dir):
            # An empty takedown batch writes only _SUCCESS — drop the
            # schema-less dir (doc_ledger would fail to infer it) but keep
            # the ledger entry so the epoch replays as a no-op.
            shutil.rmtree(docs_dir, ignore_errors=True)
            entry["no_docs"] = True
        self.meta["epochs"].append(entry)
        _atomic_write_json(os.path.join(self.path, _META), self.meta)
        return eid

    # -- read -----------------------------------------------------------------

    def _dirs(self, sub: str, flag: str = "empty") -> list[str]:
        seen: dict[str, None] = {}
        for e in self.meta["epochs"]:
            if e.get(flag):
                continue
            seen.setdefault(str(e.get("dir", e["epoch"])), None)
        return [
            p
            for d in seen
            if os.path.isdir(p := os.path.join(self.path, sub, f"epoch={d}"))
        ]

    def doc_ledger(self) -> DataFrame:
        """Latest (doc_id, _iepoch, _del) per doc — one max_by hash agg."""
        dirs = self._dirs("docs", flag="no_docs")
        if not dirs:
            return self.spark.createDataFrame(
                [],
                f"doc_id {self._id_type}, _iepoch int, _del boolean, _dl long",
            )
        # ONE multi-path read (basePath keeps mixed epoch dir names legal),
        # not a per-epoch union — listing cost stays one job however many
        # epochs accumulated between compactions.
        df = (
            self.spark.read.option("basePath", os.path.join(self.path, "docs"))
            .parquet(*dirs)
            .select("doc_id", "_iepoch", "_del", "_dl")
        )
        return df.groupBy("doc_id").agg(
            F.max("_iepoch").alias("_iepoch"),
            F.max_by("_del", "_iepoch").alias("_del"),
            F.max_by("_dl", "_iepoch").alias("_dl"),
        )

    def stored_postings(self, terms=None) -> DataFrame:
        """Stored postings; with ``terms``, reads ONLY those terms' bucket
        directories (driver-side xxhash routing, zero jobs) and applies the
        residual term filter."""
        pos = self.meta.get("positional")
        empty = f"term string, doc_id {self._id_type}, tf long, _iepoch int"
        if pos:
            empty += ", positions array<int>"
        qs = None
        buckets = None
        if terms is not None:
            qs = _normalize_terms(terms)
            buckets = sorted(
                {spark_xxhash64(t) % self.meta["n_buckets"] for t in qs}
            )
        paths = []
        for d in self._dirs("postings"):
            if buckets is None:
                paths.append(d)
            else:
                paths.extend(
                    p
                    for b in buckets
                    if os.path.isdir(p := os.path.join(d, f"bucket={b}"))
                )
        if not paths:
            return self.spark.createDataFrame([], empty)
        # ONE multi-path read across every epoch's pruned bucket leaves
        # (basePath at the postings root keeps partition discovery legal
        # for numeric and compact-* epoch dir names alike).
        out = (
            self.spark.read.option(
                "basePath", os.path.join(self.path, "postings")
            )
            .parquet(*paths)
            .select(
                "term",
                "doc_id",
                "tf",
                *(["positions"] if pos else []),
                "_iepoch",
            )
        )
        if qs is not None:
            out = out.where(F.col("term").isin(qs))
        return out

    def lookup(self, terms, mode: str = "and", top_k: int = 10) -> DataFrame:
        """Search the stored index: bucket-pruned scan, stale-version and
        tombstone filtering, then the batch ranking."""
        cand = self.stored_postings(terms)
        # posting epoch renamed _pe: the ledger join carries its own _iepoch
        live = (
            cand.withColumnRenamed("_iepoch", "_pe")
            .join(self.doc_ledger(), "doc_id")
            .where((~F.col("_del")) & (F.col("_pe") == F.col("_iepoch")))
        )
        return search_postings(
            live.select("term", "doc_id", "tf"), terms, mode=mode, top_k=top_k
        )

    def lookup_phrase(self, phrase: Sequence[str], top_k: int = 10) -> DataFrame:
        """Exact phrase lookup over a POSITIONAL index: the same
        bucket-pruned candidate scan and stale/tombstone filtering as
        :meth:`lookup`, then the slot-shift phrase intersection
        (:func:`phrase_search`) over only the live candidates."""
        if not self.meta.get("positional"):
            raise ValueError(
                "lookup_phrase needs an index created with positional=True"
            )
        cand = self.stored_postings(phrase).withColumnRenamed("_iepoch", "_pe")
        live = (
            cand.join(self.doc_ledger(), "doc_id")
            .where((~F.col("_del")) & (F.col("_pe") == F.col("_iepoch")))
            .select("term", "doc_id", "tf", "positions")
        )
        return phrase_search(live, phrase, top_k=top_k)

    def lookup_bm25(
        self,
        terms,
        mode: str = "and",
        top_k: int = 10,
        k1: float = 1.2,
        b: float = 0.75,
    ) -> DataFrame:
        """BM25-ranked search over the stored index. Same bucket-pruned
        candidate scan as :meth:`lookup`; doc lengths and the corpus
        N/avgdl come from the doc ledger (live docs only) — the full
        postings are never scanned."""
        ledger = self.doc_ledger().where(~F.col("_del"))
        cand = self.stored_postings(terms).withColumnRenamed("_iepoch", "_pe")
        live = (
            cand.join(ledger, "doc_id")
            .where(F.col("_pe") == F.col("_iepoch"))
            .select("term", "doc_id", "tf")
        )
        return bm25_search(
            live,
            terms,
            mode=mode,
            top_k=top_k,
            k1=k1,
            b=b,
            doclen=ledger.select("doc_id", "_dl"),
        )

    # -- maintenance ----------------------------------------------------------

    def compact(self) -> dict:
        """Rewrite live-latest postings into one merged directory; stale
        versions and tombstoned docs are physically dropped. Ledger epochs
        are preserved (exactly-once keeps holding across compaction)."""
        live_docs = self.doc_ledger().where(~F.col("_del"))
        posts = self.stored_postings()
        live = (
            posts.withColumnRenamed("_iepoch", "_pe")
            .join(live_docs, "doc_id")
            .where(F.col("_pe") == F.col("_iepoch"))
            .select(
                "term",
                "doc_id",
                "tf",
                *(["positions"] if self.meta.get("positional") else []),
                F.col("_iepoch"),
                F.pmod(F.xxhash64("term"), F.lit(self.meta["n_buckets"]))
                .cast("int")
                .alias("bucket"),
            )
        )
        max_epoch = max(self.committed_epochs(), default=0)
        existing = {
            str(e.get("dir", e["epoch"])) for e in self.meta["epochs"]
        }
        name = f"compact-{max_epoch}"
        gen = 1
        while name in existing:
            gen += 1
            name = f"compact-{max_epoch}-{gen}"
        post_dir = os.path.join(self.path, "postings", f"epoch={name}")
        docs_dir = os.path.join(self.path, "docs", f"epoch={name}")
        live.write.mode("overwrite").partitionBy("bucket").parquet(post_dir)
        live_docs.select(
            "doc_id", "_iepoch", "_del", "_dl"
        ).write.mode("overwrite").parquet(docs_dir)
        old_posts = self._dirs("postings")
        old_docs = self._dirs("docs", flag="no_docs")
        stats = {"merged_epochs": len(self.meta["epochs"]), "dir": name}
        post_ok = _has_parquet(post_dir)
        docs_ok = _has_parquet(docs_dir)
        for e in self.meta["epochs"]:
            e["dir"] = name
            e["empty"] = not post_ok
            e["no_docs"] = not docs_ok
        _atomic_write_json(os.path.join(self.path, _META), self.meta)
        for d in old_posts + old_docs:
            shutil.rmtree(d, ignore_errors=True)
        if not post_ok:
            shutil.rmtree(post_dir, ignore_errors=True)
        if not docs_ok:
            shutil.rmtree(docs_dir, ignore_errors=True)
        return stats


# ---------------------------------------------------------------------------
# BM25 ranking (batch core + index lookup)
# ---------------------------------------------------------------------------

def bm25_search(
    postings: DataFrame,
    terms,
    mode: str = "and",
    top_k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    doclen: DataFrame | None = None,
) -> DataFrame:
    """Okapi BM25 over a postings frame: (doc_id, n_terms, score).

    idf = ln(1 + (N - df + .5)/(df + .5)) (the always-positive Lucene
    form); length norm uses dl = doc token count and the corpus avgdl.
    ``doclen`` (doc_id, _dl) may be supplied (the persistent index stores
    it in its doc ledger); otherwise it is derived from the postings in
    one hash agg. N/avgdl ride a 1-row broadcast — no driver collect, the
    plan stays composable. Scores are ROUNDED (4 dp) and ranked on the
    rounded value with a doc-id tie-break, so ranking is reproducible
    cross-engine (the DuckDB twin applies the identical formula).
    """
    if mode not in ("and", "or"):
        raise ValueError(f"mode must be 'and' or 'or', got {mode!r}")
    qs = _normalize_terms(terms)
    if doclen is None:
        doclen = postings.groupBy("doc_id").agg(F.sum("tf").alias("_dl"))
    corpus = doclen.agg(
        F.count("*").cast("double").alias("_n"),
        F.avg("_dl").cast("double").alias("_avgdl"),
    )
    hits = postings.where(F.col("term").isin(qs))
    df_ = hits.groupBy("term").agg(
        F.countDistinct("doc_id").cast("double").alias("_df")
    )
    scored = (
        hits.join(df_, "term")
        .join(doclen, "doc_id")
        .crossJoin(F.broadcast(corpus))
        .withColumn(
            "_idf", F.log(1.0 + (F.col("_n") - F.col("_df") + 0.5) / (F.col("_df") + 0.5))
        )
        .withColumn(
            "_s",
            F.col("_idf")
            * (F.col("tf") * (k1 + 1.0))
            / (
                F.col("tf")
                + k1 * (1.0 - b + b * F.col("_dl") / F.col("_avgdl"))
            ),
        )
    )
    agg = scored.groupBy("doc_id").agg(
        F.countDistinct("term").alias("n_terms"),
        F.round(F.sum("_s"), 4).alias("score"),
    )
    if mode == "and":
        agg = agg.where(F.col("n_terms") == len(qs))
    return agg.orderBy(F.desc("score"), F.asc("doc_id")).limit(top_k)


def sql_bm25_search(
    postings_sql: str,
    terms,
    mode: str = "and",
    top_k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> str:
    """DuckDB twin of :func:`bm25_search` (doclen derived from postings)."""
    qs = _normalize_terms(terms)
    in_list = ", ".join("'" + t.replace("'", "''") + "'" for t in qs)
    having = f"HAVING count(DISTINCT term) = {len(qs)}" if mode == "and" else ""
    return f"""
WITH bm_posts AS (
  SELECT * FROM ({postings_sql})
), bm_dl AS (
  SELECT doc_id, sum(tf) AS _dl FROM bm_posts GROUP BY doc_id
), bm_corpus AS (
  SELECT count(*)::DOUBLE AS _n, avg(_dl)::DOUBLE AS _avgdl FROM bm_dl
), bm_hits AS (
  SELECT * FROM bm_posts WHERE term IN ({in_list})
), bm_df AS (
  SELECT term, count(DISTINCT doc_id)::DOUBLE AS _df FROM bm_hits GROUP BY term
), bm_scored AS (
  SELECT h.doc_id, h.term,
         ln(1.0 + (c._n - d._df + 0.5) / (d._df + 0.5))
           * (h.tf * ({k1} + 1.0))
           / (h.tf + {k1} * (1.0 - {b} + {b} * l._dl / c._avgdl)) AS _s
  FROM bm_hits h
  JOIN bm_df d USING (term)
  JOIN bm_dl l USING (doc_id)
  CROSS JOIN bm_corpus c
)
SELECT doc_id, count(DISTINCT term) AS n_terms, round(sum(_s), 4) AS score
FROM bm_scored
GROUP BY doc_id
{having}
ORDER BY score DESC, doc_id
LIMIT {top_k}
"""


# ---------------------------------------------------------------------------
# Positional postings + phrase search
# ---------------------------------------------------------------------------

def build_positional_postings(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """(term, doc_id, tf, positions) — like :func:`build_postings` plus the
    sorted 0-based token positions per (term, doc). Still one narrow
    posexplode + one map-side-combinable hash agg; positions arrays are
    bounded by per-doc term frequency, so row width stays proportional to
    tf, never to the document."""
    return (
        df.select(
            F.col(id_col).alias("doc_id"),
            F.posexplode(_terms(text_col)).alias("pos", "term"),
        )
        .groupBy("term", "doc_id")
        .agg(
            F.count("*").cast("long").alias("tf"),
            F.sort_array(F.collect_list("pos")).alias("positions"),
        )
    )


def sql_build_positional_postings(
    input_sql: str, id_col: str, text_col: str
) -> str:
    """DuckDB twin: positions via range-index list_transform (0-based, the
    same convention as posexplode)."""
    toks = sql_terms(text_col)
    return f"""
SELECT term, doc_id, count(*) AS tf,
       list_sort(list(pos)) AS positions
FROM (
  SELECT {id_col} AS doc_id, u.s.pos AS pos, u.s.term AS term
  FROM ({input_sql}),
       unnest(list_transform(range(1, len({toks}) + 1),
              i -> {{'pos': i - 1, 'term': ({toks})[i]}})) AS u(s))
GROUP BY term, doc_id
"""


def phrase_search(
    pos_postings: DataFrame, phrase: Sequence[str], top_k: int = 10
) -> DataFrame:
    """Exact phrase match over positional postings: (doc_id, phrase_tf).

    Classic slot-shift intersection: phrase slot i must find its term at
    position ``start + i``, so every (term hit, slot) pair votes for
    ``start = pos - i`` and a start winning ALL len(phrase) distinct
    slots is an occurrence (duplicate terms in the phrase work — each
    slot votes separately, the count is over DISTINCT slots).

    Plan: postings filtered to the phrase's terms (isin predicate pushes
    to the scan / pruned buckets) → posexplode(positions) → broadcast
    join against the tiny slot table → two hash aggs → ordered-limit.
    No self-join of the postings, no window, no Python.
    """
    phrase = [t.lower() for t in phrase]
    if len(phrase) < 2:
        raise ValueError("phrase needs at least 2 terms")
    spark = pos_postings.sparkSession
    slots = spark.createDataFrame(
        [(i, t) for i, t in enumerate(phrase)], "slot int, term string"
    )
    hits = (
        pos_postings.where(F.col("term").isin(sorted(set(phrase))))
        .select("doc_id", "term", F.explode("positions").alias("pos"))
        .join(F.broadcast(slots), "term")
        .select("doc_id", (F.col("pos") - F.col("slot")).alias("start"), "slot")
        .where(F.col("start") >= 0)
    )
    occurrences = (
        hits.groupBy("doc_id", "start")
        .agg(F.countDistinct("slot").alias("_n_slots"))
        .where(F.col("_n_slots") == len(phrase))
    )
    return (
        occurrences.groupBy("doc_id")
        .agg(F.count("*").cast("long").alias("phrase_tf"))
        .orderBy(F.desc("phrase_tf"), F.asc("doc_id"))
        .limit(top_k)
    )


def sql_phrase_search(
    pos_postings_sql: str, phrase: Sequence[str], top_k: int = 10
) -> str:
    """DuckDB twin of :func:`phrase_search` (same slot algebra)."""
    phrase = [t.lower() for t in phrase]
    if len(phrase) < 2:
        raise ValueError("phrase needs at least 2 terms")
    in_list = ", ".join(
        "'" + t.replace("'", "''") + "'" for t in sorted(set(phrase))
    )
    slot_rows = ", ".join(
        f"({i}, '" + t.replace("'", "''") + "')" for i, t in enumerate(phrase)
    )
    return f"""
WITH slots(slot, term) AS (VALUES {slot_rows}),
flat AS (
  SELECT doc_id, term, unnest(positions) AS pos
  FROM ({pos_postings_sql}) WHERE term IN ({in_list})
),
hits AS (
  SELECT f.doc_id, f.pos - s.slot AS start, s.slot
  FROM flat f JOIN slots s ON s.term = f.term
  WHERE f.pos - s.slot >= 0
),
occurrences AS (
  SELECT doc_id, start FROM hits
  GROUP BY doc_id, start
  HAVING count(DISTINCT slot) = {len(phrase)}
)
SELECT doc_id, CAST(count(*) AS BIGINT) AS phrase_tf
FROM occurrences GROUP BY doc_id
ORDER BY phrase_tf DESC, doc_id
LIMIT {top_k}
"""
