"""Token-window chunking + TF-IDF keywords: Python oracles, coverage
properties, and DuckDB twin parity."""

import math

import duckdb
import pytest
import pyspark.sql.functions as F

from data_pipeline_spark.operators.textprep import (
    chunk_documents,
    sql_chunk_documents,
    sql_tfidf_keywords,
    tfidf_keywords,
)

DOCS = [
    (0, " ".join(f"t{i}" for i in range(10))),
    (1, "one two three"),
    (2, ""),
    (3, "   "),
    (4, "single"),
    (5, "the cat sat on the mat near the cat flap"),
    (6, "rare unique specific terms here"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def _duck():
    con = duckdb.connect()
    con.execute("CREATE TABLE tp (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO tp VALUES (?,?)", DOCS)
    return con


def test_chunking_semantics(docs):
    out = chunk_documents(docs, "doc_id", "text", chunk_tokens=4, overlap=1)
    rows = sorted(
        (r["doc_id"], r["chunk_id"], r["n_tokens"], r["chunk"])
        for r in out.collect()
    )
    # doc 0: 10 tokens, window 4, step 3, starts capped at n-overlap=9 →
    # starts 1,4,7 — NO degenerate 4th window at 10 (it would re-emit only
    # already-covered tokens)
    d0 = [r for r in rows if r[0] == 0]
    assert [r[1] for r in d0] == [0, 1, 2]
    assert d0[0][3] == "t0 t1 t2 t3"
    assert d0[1][3] == "t3 t4 t5 t6"  # 1-token overlap
    assert d0[2] == (0, 2, 4, "t6 t7 t8 t9")  # tail window still reaches t9
    # every token covered, in order, with exactly `overlap` duplication
    assert [r for r in rows if r[0] in (2, 3)] == []  # empty docs: no rows
    assert [r for r in rows if r[0] == 4] == [(4, 0, 1, "single")]


def test_chunking_no_overlap_partition(docs):
    out = chunk_documents(docs, "doc_id", "text", chunk_tokens=3, overlap=0)
    d0 = sorted(r["chunk"] for r in out.where(F.col("doc_id") == 0).collect())
    joined = " ".join(
        r["chunk"]
        for r in out.where(F.col("doc_id") == 0).orderBy("chunk_id").collect()
    )
    assert joined == " ".join(f"t{i}" for i in range(10))  # exact partition
    assert len(d0) == 4


def test_chunking_rejects_bad_overlap(docs):
    with pytest.raises(ValueError):
        chunk_documents(docs, "doc_id", "text", chunk_tokens=4, overlap=4)


def test_chunking_duckdb_twin(docs):
    out = chunk_documents(docs, "doc_id", "text", chunk_tokens=4, overlap=1)
    got = sorted(tuple(r) for r in out.collect())
    sql = sql_chunk_documents(
        "SELECT * FROM tp", "doc_id", "text", chunk_tokens=4, overlap=1
    )
    oracle = sorted(tuple(r) for r in _duck().execute(sql).fetchall())
    assert got == oracle


def test_chunking_is_narrow(docs):
    """Chunking must be a pure map over the scan — no shuffle."""
    plan = chunk_documents(docs, "doc_id", "text")._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_tfidf_python_oracle(docs):
    out = tfidf_keywords(docs, "doc_id", "text", k=2)
    rows = {(r["doc_id"], r["rank"]): r for r in out.collect()}
    # python reference
    toks = {i: t.lower().split() for i, t in DOCS if t.split()}
    n = len(toks)  # N = token-bearing docs (same universe as df(term))
    dfreq = {}
    for ts in toks.values():
        for term in set(ts):
            dfreq[term] = dfreq.get(term, 0) + 1
    # doc 5: 'the' tf=3 but common; 'cat' tf=2
    for doc_id in (5,):
        scores = {}
        for term in set(toks[doc_id]):
            tf = toks[doc_id].count(term)
            scores[term] = round(tf * (math.log((n + 1) / (dfreq[term] + 1)) + 1), 6)
        best = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:2]
        got = [(rows[(doc_id, r + 1)]["term"], rows[(doc_id, r + 1)]["score"])
               for r in range(2)]
        assert got == best


def test_tfidf_duckdb_twin(docs):
    got = sorted(tuple(r) for r in tfidf_keywords(docs, "doc_id", "text", k=3).collect())
    sql = sql_tfidf_keywords("SELECT * FROM tp", "doc_id", "text", k=3)
    oracle = sorted(tuple(r) for r in _duck().execute(sql).fetchall())
    assert got == oracle


def test_pack_sequences_invariants(spark):
    from data_pipeline_spark.operators.textprep import (
        pack_sequences,
        sql_pack_sequences,
    )

    rows = [(i, " ".join(f"w{j}" for j in range(3 + (i * 7) % 12)))
            for i in range(40)] + [(40, ""), (41, "   ")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    ctx, shards = 16, 3
    out = pack_sequences(docs, "doc_id", "text", ctx_tokens=ctx,
                         n_shards=shards).collect()
    assert all(r["shard"] == r["doc_id"] % shards for r in out)
    # Empty docs excluded entirely.
    assert not any(r["doc_id"] in (40, 41) for r in out)
    # Per document, the pack slices cover it exactly once.
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for doc_id, parts in by_doc.items():
        parts.sort(key=lambda r: r["pack_id"])
        assert sum(p["pack_tokens"] for p in parts) == parts[0]["doc_tokens"]
        assert parts[0]["begin_tok"] == 0
        # Consecutive spans are contiguous in the document.
        for a, b in zip(parts, parts[1:]):
            assert b["begin_tok"] == a["begin_tok"] + a["pack_tokens"]
            assert b["pack_id"] == a["pack_id"] + 1
    # Per (shard, pack), exactly ctx tokens except each shard's last pack.
    by_pack = {}
    for r in out:
        by_pack.setdefault((r["shard"], r["pack_id"]), 0)
        by_pack[(r["shard"], r["pack_id"])] += r["pack_tokens"]
    last = {s: max(p for (sh, p) in by_pack if sh == s)
            for s in {sh for (sh, _) in by_pack}}
    for (sh, p), tok in by_pack.items():
        if p == last[sh]:
            assert 0 < tok <= ctx
        else:
            assert tok == ctx
    # Pack ids are dense per shard from 0.
    for s, mx in last.items():
        assert {p for (sh, p) in by_pack if sh == s} == set(range(mx + 1))
    # DuckDB twin parity on the same frame.
    con = duckdb.connect()
    con.execute("CREATE TABLE pk (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO pk VALUES (?,?)", rows)
    sql = sql_pack_sequences("SELECT * FROM pk", "doc_id", "text",
                             ctx_tokens=ctx, n_shards=shards)
    oracle = sorted(tuple(r) for r in con.execute(sql).fetchall())
    assert sorted(tuple(r) for r in out) == oracle
    with pytest.raises(ValueError):
        pack_sequences(docs, "doc_id", "text", ctx_tokens=0)
    with pytest.raises(ValueError):
        pack_sequences(docs, "doc_id", "text", n_shards=0)


def test_unigram_surprisal(spark, docs):
    from data_pipeline_spark.operators.textprep import (
        sql_unigram_surprisal,
        unigram_surprisal,
    )

    got = {r["doc_id"]: r for r in
           unigram_surprisal(docs, "doc_id", "text").collect()}
    # Python oracle over the same corpus.
    toks = {i: t.lower().split() for i, t in DOCS if t.split()}
    cf = {}
    for ts in toks.values():
        for t in ts:
            cf[t] = cf.get(t, 0) + 1
    total = sum(cf.values())
    for i, ts in toks.items():
        want = round(sum(-math.log(cf[t] / total) for t in ts) / len(ts), 6)
        assert got[i]["n_tokens"] == len(ts)
        assert abs(got[i]["surprisal"] - want) < 1e-6
    # Empty docs excluded; common-token doc scores BELOW rare-token doc.
    assert 2 not in got and 3 not in got
    assert got[5]["surprisal"] < got[6]["surprisal"]
    # DuckDB twin parity.
    sql = sql_unigram_surprisal("SELECT * FROM tp", "doc_id", "text")
    oracle = sorted(tuple(r) for r in _duck().execute(sql).fetchall())
    spark_rows = sorted(
        tuple(r) for r in unigram_surprisal(docs, "doc_id", "text").collect()
    )
    assert [(a, b, round(c, 6)) for a, b, c in spark_rows] == [
        (a, b, round(c, 6)) for a, b, c in oracle
    ]
