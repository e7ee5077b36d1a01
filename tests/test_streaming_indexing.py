"""Streaming maintenance of the dedup index (streaming/indexing.py):
stream-fed index state == batch bootstrap over the same docs; restart from
checkpoint re-delivers nothing; cross-batch dup pairs surface exactly once."""

import pyspark.sql.functions as F

from data_pipeline_spark.operators.dedup_index import MinHashDedupIndex
from data_pipeline_spark.streaming.indexing import (
    STREAM_EPOCH_BASE,
    StreamingDedupIndexer,
)

BASE = (
    "the quick brown fox jumps over the lazy dog while the rain falls "
    "softly on the quiet green meadow near the old stone bridge"
)


def _write_doc_log(spark, path):
    rows = []
    for part in range(4):
        for i in range(5):
            doc_id = part * 100 + i
            text = BASE + f" tail {doc_id}" if i == 0 else (
                f"unique page {doc_id} " + " ".join(f"w{doc_id}x{j}" for j in range(30))
            )
            rows.append((part, doc_id, text))
    df = spark.createDataFrame(rows, "part int, doc_id long, text string")
    df.write.mode("overwrite").partitionBy("part").parquet(path)
    return df.drop("part")


def test_stream_indexing_matches_batch_and_survives_restart(spark, tmp_path):
    log = str(tmp_path / "doclog")
    docs = _write_doc_log(spark, log)
    idx_path = str(tmp_path / "sidx")
    idx = MinHashDedupIndex.create(spark, idx_path, num_hashes=24, bands=6)

    all_pairs: list = []
    indexer = StreamingDedupIndexer(
        idx, id_col="doc_id", text_col="text",
        on_pairs=lambda p, b: all_pairs.extend(
            (r["id_a"], r["id_b"]) for r in p.collect()
        ),
    )
    stream = (
        spark.readStream.schema(spark.read.parquet(log).schema)
        .option("basePath", log)
        .option("maxFilesPerTrigger", 2)
        .parquet(log + "/part=*")
    )
    q = indexer.attach(
        stream.drop("part"), str(tmp_path / "cp")
    ).trigger(availableNow=True).start()
    q.awaitTermination()

    # Every doc indexed exactly once.
    assert idx.stored_sigs().count() == docs.count()
    assert idx.stored_sigs().select("doc_id").distinct().count() == docs.count()
    assert all(e >= STREAM_EPOCH_BASE for e in idx.committed_epochs())

    # The planted near-dups (doc 0 of each part, BASE + tail) found each
    # other across micro-batches, each unordered pair reported exactly once.
    planted = {0, 100, 200, 300}
    dup_pairs = [p for p in all_pairs if set(p) <= planted]
    assert len(dup_pairs) == len(set(dup_pairs)) == 6  # C(4,2)

    # Restart from the same checkpoint: nothing re-indexed, no re-reports.
    n_pairs_before = len(all_pairs)
    epochs_before = set(idx.committed_epochs())
    q2 = indexer.attach(
        stream.drop("part"), str(tmp_path / "cp")
    ).trigger(availableNow=True).start()
    q2.awaitTermination()
    assert len(all_pairs) == n_pairs_before
    assert set(MinHashDedupIndex.load(spark, idx_path).committed_epochs()) == epochs_before
    assert MinHashDedupIndex.load(spark, idx_path).stored_sigs().count() == docs.count()


def test_stream_indexing_dedups_against_preexisting_corpus(spark, tmp_path):
    """The live stream probes the HISTORICAL corpus: a batch-bootstrapped
    doc is found by a streamed near-dup."""
    idx = MinHashDedupIndex.create(
        spark, str(tmp_path / "sidx2"), num_hashes=24, bands=6
    )
    idx.update(
        spark.createDataFrame([(7, BASE)], "doc_id long, text string"), epoch=0
    )
    log = str(tmp_path / "doclog2")
    spark.createDataFrame(
        [(999, BASE + " streamed")], "doc_id long, text string"
    ).write.mode("overwrite").parquet(log)
    hits: list = []
    indexer = StreamingDedupIndexer(
        idx, id_col="doc_id", text_col="text",
        on_pairs=lambda p, b: hits.extend(p.collect()),
    )
    stream = spark.readStream.schema("doc_id long, text string").parquet(log)
    q = indexer.attach(stream, str(tmp_path / "cp2")).trigger(availableNow=True).start()
    q.awaitTermination()
    assert any({r["id_a"], r["id_b"]} == {7, 999} for r in hits)


def test_stream_vector_indexing_prior_corpus_matches_and_restart(spark, tmp_path):
    """StreamingVectorIndexer: every embedding indexed exactly once across a
    checkpoint restart; on_matches probes the STRICTLY-PRIOR corpus (the
    just-committed batch's directory is physically excluded), so a streamed
    vector matches a bootstrapped neighbour but never a same-batch one."""
    from data_pipeline_spark.operators.vector_index import IVFVectorIndex
    from data_pipeline_spark.streaming.indexing import StreamingVectorIndexer

    idx_path = str(tmp_path / "vidx")
    idx = IVFVectorIndex.create(spark, idx_path, dim=4, n_lists=2)
    # Bootstrapped (batch) corpus: id 7 points along e1.
    idx.add(
        spark.createDataFrame(
            [(7, [1.0, 0.0, 0.0, 0.0]), (8, [0.0, 1.0, 0.0, 0.0])],
            "vec_id long, embedding array<double>",
        ),
        epoch=0,
    )
    # One streamed micro-batch with TWO near-identical vectors near e1:
    # each must match 7 (prior corpus), and must NOT match its batchmate.
    log = str(tmp_path / "veclog")
    spark.createDataFrame(
        [(999, [0.99, 0.01, 0.0, 0.0]), (998, [0.98, 0.02, 0.0, 0.0])],
        "vec_id long, embedding array<double>",
    ).coalesce(1).write.mode("overwrite").parquet(log)

    matches: list = []
    indexer = StreamingVectorIndexer(
        idx, k=2, nprobe=2, on_matches=lambda m, b: matches.extend(m.collect()),
    )
    stream = spark.readStream.schema(
        "vec_id long, embedding array<double>"
    ).parquet(log)
    q = indexer.attach(stream, str(tmp_path / "vcp")).trigger(
        availableNow=True
    ).start()
    q.awaitTermination()

    assert idx.assigned().count() == 4  # 2 bootstrapped + 2 streamed
    by_query: dict = {}
    for r in matches:
        by_query.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    # Prior-corpus neighbours only: batchmates 998/999 never match each
    # other even though they are each other's true nearest neighbours.
    assert by_query[999] == {7, 8}
    assert by_query[998] == {7, 8}

    # Restart from the same checkpoint: no re-add, no re-report.
    n_before = len(matches)
    q2 = indexer.attach(stream, str(tmp_path / "vcp")).trigger(
        availableNow=True
    ).start()
    q2.awaitTermination()
    assert len(matches) == n_before
    reloaded = IVFVectorIndex.load(spark, idx_path)
    assert reloaded.assigned().count() == 4
    assert reloaded.assigned().select("id").distinct().count() == 4


def test_vector_index_exclude_epochs_guard(spark, tmp_path):
    """exclude_epochs skips uncompacted epoch dirs; once compaction merges
    an epoch into a shared dir, excluding it must raise, not silently
    include the rows."""
    import pytest as _pytest

    from data_pipeline_spark.operators.vector_index import IVFVectorIndex

    idx = IVFVectorIndex.create(spark, str(tmp_path / "vx"), dim=2, n_lists=2)
    idx.add(spark.createDataFrame([(1, [1.0, 0.0])], "vec_id long, embedding array<double>"), epoch=0)
    idx.add(spark.createDataFrame([(2, [0.0, 1.0])], "vec_id long, embedding array<double>"), epoch=1)
    assert idx.assigned(exclude_epochs=[1]).count() == 1
    assert idx.assigned().count() == 2
    idx.compact()
    with _pytest.raises(ValueError, match="compacted into shared dir"):
        idx.assigned(exclude_epochs=[1]).count()


def test_stream_search_indexing_update_semantics_and_restart(spark, tmp_path):
    from data_pipeline_spark.operators.inverted_index import (
        InvertedIndex,
        build_postings,
        search_postings,
    )
    from data_pipeline_spark.streaming.indexing import StreamingSearchIndexer

    import os as _os
    import time as _time

    log = str(tmp_path / "slog")
    # part 0: initial versions; part 1: doc 1 re-shipped with NEW text.
    # The file source orders micro-batches by file mtime — bump part=1's
    # files forward so the re-ship deterministically lands in a LATER
    # epoch than the originals.
    v0 = [(0, 1, "alpha beta gamma"), (0, 2, "beta delta"), (0, 3, "gamma gamma")]
    v1 = [(1, 1, "epsilon zeta")]
    df = spark.createDataFrame(v0 + v1, "part int, doc_id long, text string")
    df.write.mode("overwrite").partitionBy("part").parquet(log)
    later = _time.time() + 3600
    for dirpath, _dirs, files in _os.walk(_os.path.join(log, "part=1")):
        for f in files:
            _os.utime(_os.path.join(dirpath, f), (later, later))

    idx = InvertedIndex.create(spark, str(tmp_path / "search_idx"), n_buckets=4)
    indexer = StreamingSearchIndexer(idx, id_col="doc_id", text_col="text")
    stream = (
        spark.readStream.schema(spark.read.parquet(log).schema)
        .option("basePath", log)
        .option("maxFilesPerTrigger", 1)
        .parquet(log + "/part=*")
    )
    q = indexer.attach(stream.drop("part"), str(tmp_path / "scp")).trigger(
        availableNow=True
    ).start()
    q.awaitTermination()

    # Search equals a batch build over the LATEST versions only.
    latest = [(1, "epsilon zeta"), (2, "beta delta"), (3, "gamma gamma")]
    cur = spark.createDataFrame(latest, "doc_id long, text string")
    for terms in (["gamma"], ["beta"], ["alpha"], ["epsilon"]):
        got = [tuple(r) for r in idx.lookup(terms).collect()]
        want = [
            tuple(r)
            for r in search_postings(
                build_postings(cur, "doc_id", "text"), terms
            ).collect()
        ]
        assert got == want, terms

    # Restart from the checkpoint: no epochs re-committed.
    epochs_before = set(idx.committed_epochs())
    q2 = indexer.attach(stream.drop("part"), str(tmp_path / "scp")).trigger(
        availableNow=True
    ).start()
    q2.awaitTermination()
    reloaded = InvertedIndex.load(spark, str(tmp_path / "search_idx"))
    assert set(reloaded.committed_epochs()) == epochs_before


def test_search_index_follows_lake_change_feed(spark, tmp_path):
    """The full CDC loop: lake merges -> icelite_changes stream ->
    StreamingSearchIndexer (op_col routes deletes) -> lookups equal a
    batch search over the table's CURRENT rows, deletes included."""
    from data_pipeline_spark.lake.cdf_stream import register_changes_source
    from data_pipeline_spark.lake.table import LakeTable
    from data_pipeline_spark.operators.inverted_index import (
        InvertedIndex,
        build_postings,
        search_postings,
    )
    from data_pipeline_spark.streaming.indexing import StreamingSearchIndexer

    t = LakeTable.create(
        spark,
        str(tmp_path / "lt"),
        spark.createDataFrame([], "url string, text string").schema,
        key_col="url",
        n_buckets=2,
    )

    def stage(rows):
        return spark.createDataFrame(
            [
                (u, x, "delete" if x is None else "upsert", lsn)
                for u, x, lsn in rows
            ],
            "url string, text string, op string, lsn long",
        )

    t.merge(stage([("u1", "alpha beta", 1), ("u2", "beta gamma", 2)]),
            epoch=0, mode="mor", ts_col="lsn")
    t.merge(stage([("u1", "delta epsilon", 10), ("u3", "beta beta", 11)]),
            epoch=1, mode="mor", ts_col="lsn")
    t.merge(stage([("u2", None, 20)]), epoch=2, mode="mor", ts_col="lsn")

    idx = InvertedIndex.create(
        spark, str(tmp_path / "cdf_idx"), n_buckets=4, id_type="string"
    )
    indexer = StreamingSearchIndexer(idx, id_col="url", text_col="text",
                                     op_col="op", order_cols=["lsn"])
    register_changes_source(spark)
    q = (
        spark.readStream.format("icelite_changes")
        .option("path", t.path)
        .load()
        .writeStream.foreachBatch(indexer.apply_batch)
        .option("checkpointLocation", str(tmp_path / "cdfcp"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    current = t.read().select(
        F.col("url").alias("doc_id"), "text"
    )
    posts = build_postings(current, "doc_id", "text")
    for terms in (["beta"], ["alpha"], ["delta", "epsilon"]):
        got = [tuple(r) for r in idx.lookup(terms).collect()]
        want = [tuple(r) for r in search_postings(posts, terms).collect()]
        assert got == want, terms
    # u2 was deleted; u1's old terms superseded
    assert all(r[0] != "u2" for r in idx.lookup(["beta"], mode="or").collect())
    assert idx.lookup(["alpha"]).count() == 0

    # restart: no re-commits
    eb = set(idx.committed_epochs())
    q2 = (
        spark.readStream.format("icelite_changes")
        .option("path", t.path)
        .load()
        .writeStream.foreachBatch(indexer.apply_batch)
        .option("checkpointLocation", str(tmp_path / "cdfcp"))
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(120)
    assert set(idx.committed_epochs()) == eb


def test_null_op_rows_index_as_upserts(spark, tmp_path):
    """A change row with op=NULL must be treated as an upsert, not silently
    dropped from both the delete and upsert legs."""
    from data_pipeline_spark.operators.inverted_index import InvertedIndex
    from data_pipeline_spark.streaming.indexing import StreamingSearchIndexer

    idx = InvertedIndex.create(spark, str(tmp_path / "nullop"), n_buckets=4,
                               id_type="string")
    indexer = StreamingSearchIndexer(idx, id_col="url", text_col="text",
                                     op_col="op")
    batch = spark.createDataFrame(
        [("u1", "alpha beta", None), ("u2", "gone", "delete"),
         ("u3", "gamma", "insert")],
        "url string, text string, op string",
    )
    indexer.apply_batch(batch, 0)
    hits = {r["doc_id"]
            for r in idx.lookup(["alpha", "gamma", "gone"], mode="or").collect()}
    assert "u1" in hits and "u3" in hits      # NULL op indexed
    assert "u2" not in hits                   # delete tombstoned
