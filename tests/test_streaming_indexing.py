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
