"""Streaming-path throughput bench (VERDICT r4 "Next round #4").

The batch-replay number (bench/cdc_bench.py) says nothing about the LIVE
surfaces. This measures the two continuously-running paths:

1. **Wire tail → merge** (`streaming/wiretail.py::WireTailer`): a Debezium
   JSON landing zone drained under ``Trigger.AvailableNow`` with
   ``maxFilesPerTrigger`` bounding each micro-batch — the real streaming
   ingestion loop (text source → envelope parse → poison split → stage →
   idempotent MoR merge) with a per-micro-batch wall clock around the
   exact ``foreachBatch`` body the stream runs. Reported: sustained
   events/sec (batch 0 excluded — python-worker spawn + codegen amortize
   to zero in a long-running tail) and per-batch latency stats.

2. **StreamingRollup maintenance** (`lake/incremental.py::StreamingRollup`):
   per-tick latency of `apply_batch` — the exact ``foreachBatch`` body its
   rate-clock stream fires — measured against a base table advancing one
   committed epoch per tick. The rate stream is ONLY a clock (state lives
   on disk, cursor advances in the rollup's own atomic commit), so driving
   the tick deterministically measures the same code path without
   conflating Spark trigger scheduling jitter into the latency numbers.
   Reported: per-tick refresh latency and events-incorporated/sec.

Usage:
  python bench/streaming_bench.py [--wire-events N] [--rollup-events M]
                                  [--cpus K] [--out BENCH/streaming_bench.json]

Single-level throughput artifact (the N-vs-4N scaling evidence lives in
bench/run_scaling.py over the same merge machinery); run on an otherwise
idle host — the multi-tenant ~1.7x noise band documented in
BENCH/BASELINE.md applies here too.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PAYLOAD = ["url", "warc_ts", "html", "lang", "schema_version"]
ROW_DDL = (
    "url string, warc_ts timestamp, html binary, lang string, "
    "schema_version int"
)


def bench_wiretail(spark, ws: str, n_events: int, n_files: int,
                   files_per_trigger: int) -> dict:
    from data_pipeline_spark.plans.registry import SchemaRegistry
    from data_pipeline_spark.sources.datagen import gen_changes
    from data_pipeline_spark.sources.debezium import to_debezium
    from data_pipeline_spark.streaming.runner import make_table_for_log
    from data_pipeline_spark.streaming.wiretail import WireTailer

    wire_dir = os.path.join(ws, "wire")
    ch = gen_changes(spark, n_events, events_per_epoch=n_events, seed=42)
    to_debezium(
        ch, payload_cols=PAYLOAD, op_col="op", lsn_col="lsn", ts_col="warc_ts"
    ).repartition(n_files).write.mode("overwrite").text(wire_dir)

    timings: list[tuple[int, float, int]] = []

    class TimedTailer(WireTailer):
        def _apply_batch(self, batch_df, batch_id):
            n = batch_df.count()  # cached text batch; sizes the timing row
            t0 = time.monotonic()
            super()._apply_batch(batch_df, batch_id)
            timings.append((batch_id, time.monotonic() - t0, n))

    reg = SchemaRegistry()
    table = make_table_for_log(
        spark, os.path.join(ws, "wt_table"), reg, n_buckets=64
    )
    tailer = TimedTailer(
        spark, wire_dir, ROW_DDL, table, os.path.join(ws, "wt_cp"),
        registry=reg, merge_mode="mor",
        max_files_per_trigger=files_per_trigger,
    )
    t0 = time.monotonic()
    tailer.run_available()
    wall = time.monotonic() - t0
    final_rows = table.read().count()
    walls = [t for _, t, _ in timings]
    rows = [n for _, _, n in timings]
    sustained = (
        round(sum(rows[1:]) / sum(walls[1:]), 1)
        if len(walls) > 1 else round(n_events / wall, 1)
    )
    return {
        "path": "wiretail_availableNow_mor",
        "n_events": n_events,
        "n_wire_files": n_files,
        "max_files_per_trigger": files_per_trigger,
        "micro_batches": len(timings),
        "wall_sec": round(wall, 3),
        "events_per_sec_total": round(n_events / wall, 1),
        "sustained_events_per_sec": sustained,
        "batch_latency_sec": {
            "per_batch": [round(t, 3) for t in walls],
            "mean_excl_first": round(statistics.mean(walls[1:]), 3)
            if len(walls) > 1 else None,
            "max": round(max(walls), 3),
        },
        "final_table_rows": final_rows,
    }


def bench_streaming_rollup(spark, ws: str, n_events: int,
                           epoch_size: int) -> dict:
    from data_pipeline_spark.lake.incremental import (
        IncrementalRollup,
        StreamingRollup,
    )
    from data_pipeline_spark.plans.registry import SchemaRegistry
    from data_pipeline_spark.sources.changelog import write_log
    from data_pipeline_spark.sources.datagen import gen_changes
    from data_pipeline_spark.streaming.checkpoint import CheckpointStore
    from data_pipeline_spark.streaming.runner import (
        ReplayRunner,
        make_table_for_log,
    )

    log_dir = os.path.join(ws, "sr_log")
    write_log(
        gen_changes(spark, n_events, events_per_epoch=epoch_size, seed=43),
        log_dir,
    )
    reg = SchemaRegistry()
    table = make_table_for_log(
        spark, os.path.join(ws, "sr_table"), reg, n_buckets=64
    )
    runner = ReplayRunner(
        spark, log_dir, table,
        CheckpointStore(os.path.join(ws, "sr_cp")), registry=reg,
        merge_mode="mor",
    )
    roll = IncrementalRollup(
        spark, table, ["lang"], [], os.path.join(ws, "sr_roll"),
        minmax_cols=["warc_ts"], distinct_cols=["url"],
        distinct_mode="hll", hll_p=12,
    )
    sr = StreamingRollup(roll)
    # epoch 0 -> full bootstrap tick (reported separately); each further
    # tick advances exactly one committed epoch, like a live tail where
    # the replay job lands an epoch between rollup trigger firings
    runner.run(max_epochs=1)
    t0 = time.monotonic()
    sr.apply_batch(None, 0)
    bootstrap_sec = time.monotonic() - t0
    ticks = []
    budget = 1
    while True:
        # max_epochs counts SKIPPED (already-applied) epochs too, so widen
        # the budget by one per tick: each call re-checks the ledger for
        # the applied prefix (cheap) and lands exactly one new epoch.
        budget += 1
        applied = runner.run(max_epochs=budget)
        if not applied or all(r.get("skipped") for r in applied):
            break
        t0 = time.monotonic()
        sr.apply_batch(None, len(ticks) + 1)
        dt = time.monotonic() - t0
        info = sr.results[-1]
        if info["mode"] == "noop":
            break
        ticks.append({
            "latency_sec": round(dt, 3),
            "changed_keys": info.get("changed_keys"),
            "mode": info["mode"],
        })
    lat = [t["latency_sec"] for t in ticks]
    return {
        "path": "streaming_rollup_tick",
        "aggregates": "n_rows + min/max(warc_ts) + hll distinct(url) by lang",
        "n_events": n_events,
        "epoch_size": epoch_size,
        "bootstrap_sec": round(bootstrap_sec, 3),
        "ticks": ticks,
        "tick_latency_sec": {
            "mean": round(statistics.mean(lat), 3) if lat else None,
            "p50": round(statistics.median(lat), 3) if lat else None,
            "max": round(max(lat), 3) if lat else None,
        },
        "events_incorporated_per_sec": round(
            epoch_size * len(ticks) / sum(lat), 1
        ) if lat else None,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--wire-events", type=int, default=16_000_000)
    ap.add_argument("--wire-files", type=int, default=64)
    ap.add_argument("--files-per-trigger", type=int, default=16)
    ap.add_argument("--rollup-events", type=int, default=4_000_000)
    ap.add_argument("--rollup-epoch-size", type=int, default=500_000)
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--work-dir", default="/dev/shm/cdc_bench/streaming")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    os.environ.setdefault(
        "SPARK_GRAFT_LOCAL_DIR", "/dev/shm/cdc_bench/spark-local"
    )
    from data_pipeline_spark.session import get_spark

    spark = get_spark(
        "streaming-bench", master=f"local[{args.cpus}]",
        shuffle_partitions=args.cpus,
    )
    if os.path.exists(args.work_dir):
        shutil.rmtree(args.work_dir)
    os.makedirs(args.work_dir)
    wire = bench_wiretail(
        spark, args.work_dir, args.wire_events, args.wire_files,
        args.files_per_trigger,
    )
    rollup = bench_streaming_rollup(
        spark, args.work_dir, args.rollup_events, args.rollup_epoch_size
    )
    summary = {"cpus": args.cpus, "wiretail": wire,
               "streaming_rollup": rollup}
    print(json.dumps(summary, indent=2))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(summary, f, indent=2)
    spark.stop()
    shutil.rmtree(args.work_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
