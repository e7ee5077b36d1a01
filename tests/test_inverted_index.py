"""Inverted index: batch search semantics + DuckDB twin parity, and the
persistent incremental index (exactly-once epochs, update-in-place via the
doc ledger, tombstones, bucket-pruned probes, compaction)."""

import os

import duckdb
import pandas as pd
import pytest

from data_pipeline_spark.operators.inverted_index import (
    InvertedIndex,
    build_postings,
    search_postings,
    sql_build_postings,
    sql_search_postings,
)

DOCS_V0 = [
    (1, "spark merge table scan merge"),
    (2, "table scan fast merge"),
    (3, "unrelated words entirely"),
    (4, "merge merge merge table"),
]


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_batch_search_and_or(spark):
    posts = build_postings(_df(spark, DOCS_V0), "doc_id", "text")
    hits = search_postings(posts, ["merge", "table"], mode="and", top_k=10).collect()
    assert [(r["doc_id"], r["score"]) for r in hits] == [(4, 4), (1, 3), (2, 2)]
    or_hits = search_postings(posts, ["merge", "unrelated"], mode="or").collect()
    assert {r["doc_id"] for r in or_hits} == {1, 2, 3, 4}


def test_batch_duckdb_twin_parity(spark):
    con = duckdb.connect()
    con.register("docs", pd.DataFrame(DOCS_V0, columns=["doc_id", "text"]))
    psql = sql_build_postings("SELECT doc_id, text FROM docs", "doc_id", "text")
    posts = build_postings(_df(spark, DOCS_V0), "doc_id", "text")
    assert sorted(map(tuple, posts.collect())) == sorted(
        con.sql(psql).fetchall()
    )
    ssql = sql_search_postings(psql, ["merge", "table"], mode="and", top_k=10)
    got = [tuple(r) for r in search_postings(posts, ["merge", "table"]).collect()]
    assert got == con.sql(ssql).fetchall()


def test_incremental_update_tombstone_compact(spark, tmp_path):
    path = str(tmp_path / "idx")
    idx = InvertedIndex.create(spark, path, n_buckets=4)

    assert idx.update(_df(spark, DOCS_V0), epoch=0) == 0
    # exactly-once: same epoch is a no-op
    assert idx.update(_df(spark, [(9, "noise")]), epoch=0) is None

    # epoch 1 re-ships doc 1 with NEW text (old terms must stop matching)
    # and adds doc 5
    v1 = [(1, "completely different now"), (5, "table merge")]
    assert idx.update(_df(spark, v1), epoch=1) == 1

    latest = {1: v1[0][1], 2: DOCS_V0[1][1], 3: DOCS_V0[2][1],
              4: DOCS_V0[3][1], 5: v1[1][1]}

    def batch_equiv(terms, mode="and"):
        cur = _df(spark, list(latest.items()))
        return [
            tuple(r)
            for r in search_postings(
                build_postings(cur, "doc_id", "text"), terms, mode=mode
            ).collect()
        ]

    for terms, mode in ([["merge", "table"], "and"], [["spark"], "and"],
                        [["different", "fast"], "or"]):
        got = [tuple(r) for r in idx.lookup(terms, mode=mode).collect()]
        assert got == batch_equiv(terms, mode), (terms, mode)

    # bucket pruning returns exactly the full-scan-filtered postings
    full = idx.stored_postings().where("term in ('merge', 'table')")
    pruned = idx.stored_postings(["merge", "table"])
    assert sorted(map(tuple, pruned.collect())) == sorted(
        map(tuple, full.collect())
    )

    # tombstone doc 4 (top scorer for merge+table)
    idx.remove([4], epoch=2)
    del latest[4]
    got = [tuple(r) for r in idx.lookup(["merge", "table"]).collect()]
    assert got == batch_equiv(["merge", "table"])
    assert all(r[0] != 4 for r in got)

    # compact: results identical, old epoch dirs physically gone
    idx.compact()
    reloaded = InvertedIndex.load(spark, path)
    got = [tuple(r) for r in reloaded.lookup(["merge", "table"]).collect()]
    assert got == batch_equiv(["merge", "table"])
    post_dirs = os.listdir(os.path.join(path, "postings"))
    assert len(post_dirs) == 1 and post_dirs[0].startswith("epoch=compact-")
    # stale/tombstoned rows physically dropped: doc 4 and doc 1's old terms
    remaining = {
        (r["term"], r["doc_id"])
        for r in reloaded.stored_postings().collect()
    }
    assert all(d != 4 for _, d in remaining)
    assert ("spark", 1) not in remaining and ("different", 1) in remaining


def test_param_freeze(spark, tmp_path):
    path = str(tmp_path / "idx2")
    InvertedIndex.create(spark, path, n_buckets=4)
    with pytest.raises(ValueError, match="frozen"):
        InvertedIndex.create(spark, path, n_buckets=8)


def test_empty_batch_epoch_is_recorded(spark, tmp_path):
    path = str(tmp_path / "idx3")
    idx = InvertedIndex.create(spark, path, n_buckets=4)
    assert idx.update(_df(spark, []), epoch=0) == 0
    assert idx.update(_df(spark, DOCS_V0), epoch=0) is None  # still committed
    assert idx.update(_df(spark, DOCS_V0), epoch=1) == 1
    assert idx.lookup(["spark"]).count() == 1


def test_bm25_rare_term_outweighs_common(spark):
    # 'zebra' appears in 1 doc, 'the' in all 4 with equal tf: the zebra doc
    # must outrank docs matched only via the common term in OR mode.
    rows = [
        (1, "the cat sat"),
        (2, "the dog ran"),
        (3, "the zebra grazed"),
        (4, "the bird flew"),
    ]
    from data_pipeline_spark.operators.inverted_index import bm25_search

    posts = build_postings(
        spark.createDataFrame(rows, "doc_id long, text string"), "doc_id", "text"
    )
    hits = bm25_search(posts, ["the", "zebra"], mode="or", top_k=4).collect()
    assert hits[0]["doc_id"] == 3 and hits[0]["n_terms"] == 2
    assert all(r["score"] < hits[0]["score"] for r in hits[1:])


def test_bm25_duckdb_twin_parity(spark):
    import random

    rng = random.Random(13)
    vocab = ["merge", "table", "scan", "row", "key", "batch", "window", "agg"]
    rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(3, 40))))
        for i in range(70)
    ]
    from data_pipeline_spark.operators.inverted_index import (
        bm25_search,
        sql_bm25_search,
    )

    posts = build_postings(
        spark.createDataFrame(rows, "doc_id long, text string"), "doc_id", "text"
    )
    con = duckdb.connect()
    con.register("docs", pd.DataFrame(rows, columns=["doc_id", "text"]))
    psql = sql_build_postings("SELECT doc_id, text FROM docs", "doc_id", "text")
    for mode in ("and", "or"):
        got = [
            tuple(r)
            for r in bm25_search(
                posts, ["merge", "table"], mode=mode, top_k=15
            ).collect()
        ]
        want = con.sql(
            sql_bm25_search(psql, ["merge", "table"], mode=mode, top_k=15)
        ).fetchall()
        assert got == want, mode


def test_index_bm25_matches_batch_over_latest(spark, tmp_path):
    from data_pipeline_spark.operators.inverted_index import bm25_search

    idx = InvertedIndex.create(spark, str(tmp_path / "bmidx"), n_buckets=4)
    idx.update(_df(spark, DOCS_V0), epoch=0)
    v1 = [(1, "spark spark table"), (5, "merge scan table")]
    idx.update(_df(spark, v1), epoch=1)
    latest = [(1, v1[0][1]), (2, DOCS_V0[1][1]), (3, DOCS_V0[2][1]),
              (4, DOCS_V0[3][1]), (5, v1[1][1])]
    posts = build_postings(_df(spark, latest), "doc_id", "text")
    for terms, mode in ([["table", "merge"], "and"], [["spark", "scan"], "or"]):
        got = [tuple(r) for r in idx.lookup_bm25(terms, mode=mode).collect()]
        want = [tuple(r) for r in bm25_search(posts, terms, mode=mode).collect()]
        assert got == want, (terms, mode)
    # tombstone shifts N/avgdl and removes the doc — still equal to batch
    idx.remove([4], epoch=2)
    del latest[3]
    posts = build_postings(_df(spark, latest), "doc_id", "text")
    got = [tuple(r) for r in idx.lookup_bm25(["table", "merge"]).collect()]
    want = [tuple(r) for r in bm25_search(posts, ["table", "merge"]).collect()]
    assert got == want


def test_auto_epoch_stays_below_stream_space(spark, tmp_path):
    """A stream feeding the index must not poison batch auto-epochs: after
    a stream-space commit, epoch=None still allocates in the batch space,
    and the stream's NEXT micro-batch id is not 'already committed'."""
    from data_pipeline_spark.operators.epochutil import (
        AUTO_EPOCH_CEILING,
        next_auto_epoch,
    )
    from data_pipeline_spark.operators.inverted_index import InvertedIndex
    from data_pipeline_spark.streaming.indexing import STREAM_EPOCH_BASE

    assert AUTO_EPOCH_CEILING == STREAM_EPOCH_BASE
    idx = InvertedIndex.create(spark, str(tmp_path / "ii"), n_buckets=4)
    docs = spark.createDataFrame(
        [(1, "alpha beta"), (2, "beta gamma")], "doc_id long, text string"
    )
    assert idx.update(docs, "doc_id", "text", epoch=STREAM_EPOCH_BASE + 0) == STREAM_EPOCH_BASE
    # batch auto-epoch: NOT stream_base + 1
    eid = idx.update(
        spark.createDataFrame([(3, "delta")], "doc_id long, text string"),
        "doc_id", "text", epoch=None,
    )
    assert eid == 0
    # the stream's next micro-batch is still fresh
    assert (STREAM_EPOCH_BASE + 1) not in idx.committed_epochs()
    assert next_auto_epoch(idx.committed_epochs()) == 1


def test_remove_empty_batch_keeps_ledger_readable(spark, tmp_path):
    from data_pipeline_spark.operators.inverted_index import InvertedIndex

    idx = InvertedIndex.create(spark, str(tmp_path / "ii2"), n_buckets=4)
    eid = idx.remove([], epoch=5)
    assert eid == 5
    assert idx.remove([], epoch=5) is None  # exactly-once replay no-op
    docs = spark.createDataFrame([(1, "alpha")], "doc_id long, text string")
    idx.update(docs, "doc_id", "text", epoch=6)
    # the empty takedown epoch must not break ledger reads or search
    assert idx.doc_ledger().count() == 1
    assert idx.lookup(["alpha"]).count() == 1
