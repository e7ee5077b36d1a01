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


def test_watermark_planner_covers_late_data(spark, tmp_path):
    """disorder_report → recommend_watermark → withWatermark integration:
    the planned delay keeps every late event in its window across
    micro-batches, while a too-tight watermark measurably drops them
    (so the harness is proven non-vacuous)."""
    import datetime as dt

    from data_pipeline_spark.operators.flowstats import recommend_watermark
    from data_pipeline_spark.streaming.windows import windowed_event_rollup

    T = dt.datetime(2026, 1, 1)
    rows = []  # (part, lsn, url, op, warc_ts)
    lsn = 0

    def add(epoch_rows, seconds_list):
        nonlocal lsn
        for s in seconds_list:
            epoch_rows.append(
                (0, lsn, f"https://u{lsn}.com", "insert",
                 T + dt.timedelta(seconds=s))
            )
            lsn += 1

    # The late rows land TWO micro-batches after their window: a late row
    # arriving in the same batch where its window crosses the watermark is
    # still accepted (state not yet evicted — verified Spark 4.1.2
    # behavior), so a drop requires the window to have been finalized in
    # an EARLIER batch.
    e0, e1, e2 = [], [], []
    add(e0, range(0, 100, 2))            # 50 on-time events [T, T+98]
    add(e1, range(100, 200, 2))          # 50 on-time events
    add(e2, range(200, 300, 2))          # 50 on-time events
    add(e2, [30, 32, 34, 36, 38])        # 5 LATE events (~270 s behind hwm)
    log = str(tmp_path / "wm_log")
    ddl = "part int, lsn long, url string, op string, warc_ts timestamp"
    for i, ep in enumerate([e0, e1, e2]):
        spark.createDataFrame(ep, ddl).coalesce(1).write.parquet(
            f"{log}/epoch={i}"
        )

    batch = spark.read.option("basePath", log).parquet(f"{log}/epoch=*")
    delay_us, clause = recommend_watermark(batch, ("part",), "lsn", "warc_ts")
    assert delay_us >= 268 * 1_000_000  # plan covers the observed lateness

    def run(watermark):
        final = {}

        def upsert(df, _eid):
            for r in df.collect():
                final[(r["window_start"], r["op"])] = r["n"]

        stream = (
            spark.readStream.schema(batch.schema)
            .option("basePath", log)
            .option("maxFilesPerTrigger", 1)   # one epoch per micro-batch
            .parquet(f"{log}/epoch=*")
        )
        q = (
            windowed_event_rollup(stream, window="1 minute",
                                  watermark=watermark)
            .writeStream.outputMode("update")
            .foreachBatch(upsert)
            .option("checkpointLocation",
                    str(tmp_path / f"cp_{watermark.replace(' ', '_')}"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return final

    expected = {
        (r["window_start"], r["op"]): r["n"]
        for r in windowed_event_rollup(batch, window="1 minute").collect()
    }

    planned = run(clause)
    assert planned == expected  # nothing dropped under the planned delay

    tight = run("1 seconds")
    # the 5 late events fell below the tight watermark: their [T, T+60)
    # window keeps its batch-0 count while everything on-time still lands
    assert sum(tight.values()) == sum(expected.values()) - 5
    first_win = min(k for k in expected)
    assert tight[first_win] == expected[first_win] - 5
