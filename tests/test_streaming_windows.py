"""Streaming windowed rollup + applyInPandasWithState stateful LWW."""

import pyspark.sql.functions as F

from data_pipeline_spark.sources import changelog
from data_pipeline_spark.sources.datagen import gen_changes
from data_pipeline_spark.streaming.windows import (
    stateful_current_versions,
    windowed_event_rollup,
)


def test_windowed_rollup_stream_matches_batch(spark, tmp_path):
    log = str(tmp_path / "wlog")
    changelog.write_log(gen_changes(spark, 4000, events_per_epoch=1000, seed=17), log)

    batch = spark.read.parquet(log)
    expected = {
        (r["window_start"], r["op"]): (r["n"], r["n_keys"])
        for r in windowed_event_rollup(batch).collect()
    }

    schema = batch.schema
    stream = (
        spark.readStream.schema(schema)
        .option("basePath", log)
        .parquet(log + "/epoch=*")
    )
    rolled = windowed_event_rollup(stream)
    q = (
        rolled.writeStream.format("memory")
        .queryName("rollup_out")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "cp_w"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r["window_start"], r["op"]): (r["n"], r["n_keys"])
        for r in spark.sql("SELECT * FROM rollup_out").collect()
    }
    assert got == expected


def test_session_window_stream_matches_batch_and_sessionize(spark, tmp_path):
    """Native session_window on a stream == the same on batch == the batch
    gaps-and-islands sessionize operator (session count + sizes per key)."""
    from data_pipeline_spark.operators.asof import session_stats
    from data_pipeline_spark.streaming.windows import sessionized_event_rollup

    log = str(tmp_path / "sslog")
    changelog.write_log(gen_changes(spark, 3000, events_per_epoch=1000, seed=31), log)
    batch = spark.read.parquet(log)

    expected = {
        (r["url"], r["session_start"]): r["n_events"]
        for r in sessionized_event_rollup(batch, gap="30 minutes").collect()
    }

    stream = (
        spark.readStream.schema(batch.schema)
        .option("basePath", log)
        .parquet(log + "/epoch=*")
    )
    q = (
        sessionized_event_rollup(stream, gap="30 minutes")
        .writeStream.format("memory")
        .queryName("sess_out")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "cp_ss"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r["url"], r["session_start"]): r["n_events"]
        for r in spark.sql("SELECT * FROM sess_out").collect()
    }
    assert got == expected

    # Cross-check against the batch gaps-and-islands operator: identical
    # (key, session_start, size) partitioning of the events.
    isl = {
        (r["url"], r["session_start"]): r["n_events"]
        for r in session_stats(
            batch, key_cols=("url",), ts_col="warc_ts", gap_seconds=1800,
            order_tiebreak=("lsn",),
        ).collect()
    }
    assert isl == expected


def test_stateful_current_versions_tracks_winner_changes(spark, tmp_path):
    log = str(tmp_path / "slog")
    changelog.write_log(gen_changes(spark, 3000, events_per_epoch=500, seed=23), log)
    batch = spark.read.parquet(log)

    schema = batch.schema
    stream = (
        spark.readStream.schema(schema)
        .option("basePath", log)
        .option("maxFilesPerTrigger", 40)  # several micro-batches
        .parquet(log + "/epoch=*")
    )
    out = stateful_current_versions(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("winners_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "cp_s"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    emitted = spark.sql("SELECT * FROM winners_out").collect()
    assert emitted, "no winner transitions emitted"

    # Last emission per url == the global LWW winner (batch oracle).
    last = {}
    for r in emitted:
        cur = last.get(r["url"])
        if cur is None or (r["warc_ts"], r["lsn"]) > (cur["warc_ts"], cur["lsn"]):
            last[r["url"]] = r
    oracle = {
        r["url"]: (r["warc_ts"], r["lsn"], r["op"])
        for r in batch.groupBy("url")
        .agg(
            F.max_by(
                F.struct("warc_ts", "lsn", "op"), F.struct("warc_ts", "lsn")
            ).alias("w")
        )
        .select("url", "w.warc_ts", "w.lsn", "w.op")
        .collect()
    }
    got = {u: (r["warc_ts"], r["lsn"], r["op"]) for u, r in last.items()}
    assert got == oracle
    # Every url with any event has a tracked winner.
    assert set(got) == set(oracle)


def test_deduplicated_change_stream_drops_redeliveries(spark, tmp_path):
    """An at-least-once tail that redelivers a slice of the log must yield
    exactly one row per (url, lsn), with state bounded by the watermark."""
    from data_pipeline_spark.streaming.windows import deduplicated_change_stream

    log = str(tmp_path / "dlog")
    df = gen_changes(spark, 2000, events_per_epoch=500, seed=41)
    changelog.write_log(df, log)
    batch = spark.read.parquet(log)
    # Redeliver: copy epoch 1's files under a new epoch dir (same events,
    # same lsns — the restart-replay shape).
    import shutil as _sh

    _sh.copytree(log + "/epoch=1", log + "/epoch=9")
    dup = spark.read.option("basePath", log).parquet(log + "/epoch=*")
    n_unique = batch.select("url", "lsn").distinct().count()
    assert dup.count() > n_unique  # the duplication is real

    # Batch degradation: plain dropDuplicates.
    assert deduplicated_change_stream(dup).count() == n_unique

    stream = (
        spark.readStream.schema(batch.schema)
        .option("basePath", log)
        .option("maxFilesPerTrigger", 10)
        .parquet(log + "/epoch=*")
    )
    out = deduplicated_change_stream(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("dedup_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "cp_d"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.sql("SELECT url, lsn FROM dedup_out").collect()
    assert len(got) == len({(r["url"], r["lsn"]) for r in got})
    # Redelivered events inside the watermark are dropped; every unique
    # event appears (no false drops).
    assert len(got) == n_unique
