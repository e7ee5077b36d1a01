"""CDC replay throughput bench — the BASELINE.json primary metric.

Measures sustained change-events/sec applied end-to-end (epoch tail →
HTML→text extraction → LWW dedup → idempotent merge commit) on a
deterministic synthetic change log, at a given parallelism.

Usage:
  python bench/cdc_bench.py gen    --events N --epoch-size M --log-dir D
  python bench/cdc_bench.py replay --cpus K --log-dir D [--json OUT]

`gen` writes the log ONCE; `replay` is run per parallelism level on the
SAME input (the sandbox evidence protocol for the two-cluster-size rule:
N=4 vs 4N=16 cores, see BENCH/BASELINE.md). Orchestrated by
bench/run_scaling.py.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def cmd_gen(args: argparse.Namespace) -> None:
    from data_pipeline_spark.session import get_spark
    from data_pipeline_spark.sources.changelog import write_log
    from data_pipeline_spark.sources.datagen import gen_changes

    spark = get_spark("cdc-bench-gen")
    if os.path.exists(args.log_dir):
        shutil.rmtree(args.log_dir)
    df = gen_changes(
        spark,
        n_events=args.events,
        events_per_epoch=args.epoch_size,
        seed=42,
        hot_key_share=args.hot_share,
        n_hot_keys=args.hot_keys,
    )
    # Spread the log across files so every parallelism level can split it.
    write_log(df.repartition(64, "url"), args.log_dir)
    n = spark.read.parquet(args.log_dir).count()
    print(f"# generated {n} events -> {args.log_dir}", file=sys.stderr)
    spark.stop()


def cmd_replay(args: argparse.Namespace) -> None:
    from data_pipeline_spark.plans.registry import SchemaRegistry
    from data_pipeline_spark.session import get_spark
    from data_pipeline_spark.streaming.checkpoint import CheckpointStore
    from data_pipeline_spark.streaming.runner import ReplayRunner, make_table_for_log

    if args.executors:
        # Multi-executor simulation (the north rule's N vs 4N executors):
        # local-cluster spawns separate executor JVMs + python workers, the
        # same process topology as a real cluster — single-JVM local[K]
        # serializes executors on shared JVM locks and understates scaling.
        total_cores = args.executors * args.executor_cores
        master = (
            f"local-cluster[{args.executors},{args.executor_cores},"
            f"{args.executor_mem_mb}]"
        )
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        zip_path = os.path.join(repo, "dist", "data_pipeline_spark.zip")
        if not os.path.exists(zip_path):
            import subprocess

            subprocess.run(
                [sys.executable, os.path.join(repo, "jobs", "package.py")], check=True
            )
        spark = get_spark(
            "cdc-bench-replay",
            master=master,
            shuffle_partitions=total_cores,
            extra_conf={
                "spark.executor.memory": f"{args.executor_mem_mb}m",
                "spark.submit.pyFiles": zip_path,
            },
        )
        spark.sparkContext.addPyFile(zip_path)
        args.cpus = total_cores
    else:
        os.environ["SPARK_GRAFT_CPUS"] = str(args.cpus)
        os.environ["SPARK_GRAFT_SHUFFLE_PARTITIONS"] = str(args.cpus)
        spark = get_spark("cdc-bench-replay")
    work = args.work_dir or (args.log_dir.rstrip("/") + f"-replay-{args.cpus}")
    if os.path.exists(work):
        shutil.rmtree(work)
    registry = SchemaRegistry()
    table = make_table_for_log(
        spark, os.path.join(work, "table"), registry, n_buckets=args.n_buckets
    )
    runner = ReplayRunner(
        spark,
        args.log_dir,
        table,
        CheckpointStore(os.path.join(work, "ckpt")),
        registry=registry,
        merge_mode=args.mode,
        compact_every=args.compact_every,
    )
    n_events = spark.read.parquet(args.log_dir).count()  # warm-up + size
    t0 = time.monotonic()
    results = runner.run()
    wall = time.monotonic() - t0
    final_rows = table.read().count()
    # Sustained metric: epoch 0 carries one-time costs (python-worker spawn,
    # pandas import, whole-stage codegen, plan caches) that a long-running
    # tail amortizes to zero, so steady-state events/sec excludes it.
    epoch_secs = [r["duration_sec"] for r in results if not r.get("skipped")]
    epoch_rows = [r.get("staged_rows", 0) for r in results if not r.get("skipped")]
    events_per_epoch = n_events // max(len(results), 1)
    sustained = (
        round(events_per_epoch * (len(epoch_secs) - 1) / sum(epoch_secs[1:]), 1)
        if len(epoch_secs) > 1
        else round(n_events / wall, 1)
    )
    out = {
        "cpus": args.cpus,
        "executors": args.executors,
        "mode": args.mode,
        "n_events": n_events,
        "epochs": len(results),
        "wall_sec": round(wall, 3),
        "events_per_sec": round(n_events / wall, 1),
        "sustained_events_per_sec": sustained,
        "epoch_sec": epoch_secs,
        "final_table_rows": final_rows,
    }
    print(json.dumps(out))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(out, f)
    spark.stop()
    shutil.rmtree(work)


def main() -> None:
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd", required=True)
    g = sub.add_parser("gen")
    g.add_argument("--events", type=int, default=200_000)
    g.add_argument("--epoch-size", type=int, default=50_000)
    g.add_argument("--log-dir", default="/tmp/cdc_bench_log")
    g.add_argument("--hot-share", type=int, default=0,
                   help="percent of events hammering --hot-keys urls "
                        "(Zipf-pathology log for the skew scaling run)")
    g.add_argument("--hot-keys", type=int, default=4)
    g.set_defaults(fn=cmd_gen)
    r = sub.add_parser("replay")
    r.add_argument("--cpus", type=int, default=32)
    r.add_argument("--executors", type=int, default=None,
                   help="run on local-cluster[N, cores, mem] instead of "
                        "local[K] — separate executor JVMs (north-rule N vs "
                        "4N executor evidence)")
    r.add_argument("--executor-cores", type=int, default=4)
    r.add_argument("--executor-mem-mb", type=int, default=4096)
    r.add_argument("--mode", default="cow", choices=["cow", "mor"])
    r.add_argument("--compact-every", type=int, default=None)
    r.add_argument("--n-buckets", type=int, default=64,
                   help="fixed across parallelism levels — same job, only "
                        "parallelism changes")
    r.add_argument("--log-dir", default="/tmp/cdc_bench_log")
    r.add_argument("--work-dir", default=None)
    r.add_argument("--json", default=None)
    r.set_defaults(fn=cmd_replay)
    args = ap.parse_args()
    args.fn(args)


if __name__ == "__main__":
    main()
