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


# ---------------------------------------------------------------------------
# Positional postings + phrase search
# ---------------------------------------------------------------------------

PHRASE_DOCS = [
    (1, "the big bad wolf ate the big bad pig"),      # 2 occurrences of "big bad"
    (2, "big things and bad things are not adjacent"),# both terms, never adjacent
    (3, "bad big order"),                              # reversed → no match
    (4, "aa aa aa"),                                   # overlapping starts
    (5, "buffalo buffalo buffalo"),                    # duplicate-term phrase
    (6, "nothing relevant here"),
]


def _pos_postings(spark):
    from data_pipeline_spark.operators.inverted_index import (
        build_positional_postings,
    )

    df = spark.createDataFrame(PHRASE_DOCS, "doc_id long, text string")
    return build_positional_postings(df, "doc_id", "text")


def test_positional_postings_shapes(spark):
    posts = _pos_postings(spark)
    r = {
        (x["term"], x["doc_id"]): (x["tf"], x["positions"])
        for x in posts.collect()
    }
    assert r[("big", 1)] == (2, [1, 6])
    assert r[("aa", 4)] == (3, [0, 1, 2])
    assert r[("the", 1)][1] == [0, 5]


def test_phrase_search_semantics(spark):
    from data_pipeline_spark.operators.inverted_index import phrase_search

    posts = _pos_postings(spark)
    got = {r["doc_id"]: r["phrase_tf"] for r in phrase_search(posts, ["big", "bad"]).collect()}
    # doc 1 twice; doc 2 has both terms but never adjacent; doc 3 reversed
    assert got == {1: 2}

    overlap = {r["doc_id"]: r["phrase_tf"] for r in phrase_search(posts, ["aa", "aa"]).collect()}
    assert overlap == {4: 2}  # starts 0 and 1 both match "aa aa"

    tri = {r["doc_id"]: r["phrase_tf"]
           for r in phrase_search(posts, ["buffalo", "buffalo", "buffalo"]).collect()}
    assert tri == {5: 1}

    import pytest as _pt

    with _pt.raises(ValueError):
        phrase_search(posts, ["single"])


def test_phrase_search_duckdb_twin_parity(spark):
    import duckdb
    import pandas as pd

    from data_pipeline_spark.operators.inverted_index import (
        phrase_search,
        sql_build_positional_postings,
        sql_phrase_search,
    )

    posts = _pos_postings(spark)
    for phrase in (["big", "bad"], ["aa", "aa"], ["the", "big", "bad"]):
        got = sorted(tuple(r) for r in phrase_search(posts, phrase, top_k=10).collect())
        con = duckdb.connect()
        con.register("docs_pd", pd.DataFrame(PHRASE_DOCS, columns=["doc_id", "text"]))
        sql = sql_phrase_search(
            sql_build_positional_postings("SELECT * FROM docs_pd", "doc_id", "text"),
            phrase,
            top_k=10,
        )
        want = sorted(tuple(r) for r in con.sql(sql).fetchall())
        assert got == want, phrase


def test_phrase_search_plan(spark):
    """Slot table broadcast, no cartesian, no window, no Python."""
    from data_pipeline_spark.operators.inverted_index import phrase_search

    plan = (
        phrase_search(_pos_postings(spark), ["big", "bad"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan and "SortMergeJoin" not in plan
    assert "Window" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_positional_index_incremental_phrase(spark, tmp_path):
    """Positional index: incremental phrase lookup equals batch
    phrase_search over the LATEST corpus across re-ships, tombstones,
    and compaction; positional flag is frozen."""
    from data_pipeline_spark.operators.inverted_index import (
        build_positional_postings,
        phrase_search,
    )

    path = str(tmp_path / "pidx")
    idx = InvertedIndex.create(spark, path, n_buckets=4, positional=True)

    v0 = [
        (1, "the table scan beats the index scan here"),
        (2, "a table scan and another table scan appear"),
        (3, "scan table reversed never matches"),
    ]
    assert idx.update(_df(spark, v0), epoch=0) == 0
    # re-ship doc 1 WITHOUT the phrase; add doc 4 with it
    v1 = [(1, "no phrase anymore just a scan"), (4, "one table scan")]
    assert idx.update(_df(spark, v1), epoch=1) == 1

    latest = {1: v1[0][1], 2: v0[1][1], 3: v0[2][1], 4: v1[1][1]}

    def batch_equiv(phrase):
        cur = _df(spark, list(latest.items()))
        return [
            tuple(r)
            for r in phrase_search(
                build_positional_postings(cur, "doc_id", "text"), phrase
            ).collect()
        ]

    got = [tuple(r) for r in idx.lookup_phrase(["table", "scan"]).collect()]
    assert got == batch_equiv(["table", "scan"])
    assert got == [(2, 2), (4, 1)]  # doc 1 dropped its phrase; doc 3 reversed

    idx.remove([2], epoch=2)
    del latest[2]
    got = [tuple(r) for r in idx.lookup_phrase(["table", "scan"]).collect()]
    assert got == batch_equiv(["table", "scan"]) == [(4, 1)]

    idx.compact()
    reloaded = InvertedIndex.load(spark, path)
    got = [tuple(r) for r in reloaded.lookup_phrase(["table", "scan"]).collect()]
    assert got == [(4, 1)]
    # tf-ranked term lookup still works on the positional index
    assert [tuple(r) for r in reloaded.lookup(["scan"]).collect()][0][0] in (1, 4)

    import pytest as _pt

    with _pt.raises(ValueError):  # positional is frozen at create
        InvertedIndex.create(spark, path, n_buckets=4, positional=False)
    # a non-positional index refuses phrase lookups
    flat = InvertedIndex.create(spark, str(tmp_path / "flat"), n_buckets=4)
    flat.update(_df(spark, v0), epoch=0)
    with _pt.raises(ValueError):
        flat.lookup_phrase(["table", "scan"])
