"""Changelog-compaction benefit: replay wall + log size, original vs
compacted, on a high-churn log (many versions per key — the regime
compaction exists for). Writes BENCH/logcompact_bench.json.

Usage: python bench/logcompact_bench.py [--events N] [--cpus K]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WORK = "/dev/shm/logcompact_bench"


def dir_bytes(path: str) -> int:
    total = 0
    for root, _, files in os.walk(path):
        total += sum(os.path.getsize(os.path.join(root, f)) for f in files)
    return total


def replay_wall(spark, log_dir: str, tag: str) -> tuple[float, int]:
    from data_pipeline_spark.plans.registry import SchemaRegistry
    from data_pipeline_spark.streaming.checkpoint import CheckpointStore
    from data_pipeline_spark.streaming.runner import ReplayRunner, make_table_for_log

    reg = SchemaRegistry()
    table = make_table_for_log(spark, f"{WORK}/table_{tag}", reg, n_buckets=16)
    runner = ReplayRunner(
        spark, log_dir, table, CheckpointStore(f"{WORK}/cp_{tag}"), reg,
        merge_mode="mor",
    )
    t0 = time.monotonic()
    runner.run()
    wall = time.monotonic() - t0
    return wall, table.read().count()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--events", type=int, default=2_000_000)
    ap.add_argument("--epoch-size", type=int, default=250_000)
    ap.add_argument("--versions-per-key", type=int, default=20)
    ap.add_argument("--cpus", type=int, default=16)
    ap.add_argument("--json", default=os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "..", "BENCH",
        "logcompact_bench.json"))
    args = ap.parse_args()

    os.environ.setdefault("SPARK_GRAFT_LOCAL_DIR", f"{WORK}/spark-local")
    shutil.rmtree(WORK, ignore_errors=True)

    from data_pipeline_spark.session import get_spark
    from data_pipeline_spark.sources.changelog import write_log
    from data_pipeline_spark.sources.datagen import gen_changes
    from data_pipeline_spark.sources.logcompact import compact_log

    spark = get_spark(
        "logcompact-bench", master=f"local[{args.cpus}]",
        shuffle_partitions=args.cpus,
    )
    n_keys = max(1, args.events // args.versions_per_key)
    log_dir = f"{WORK}/log"
    write_log(
        gen_changes(
            spark, args.events, n_keys=n_keys,
            events_per_epoch=args.epoch_size, seed=42,
        ).repartition(32, "url"),
        log_dir,
    )
    n_epochs = args.events // args.epoch_size

    t0 = time.monotonic()
    stats = compact_log(
        spark, log_dir, f"{WORK}/compacted", upto_epoch=n_epochs - 1,
        drop_tombstones=True,
    )
    compact_wall = time.monotonic() - t0

    wall_orig, rows_orig = replay_wall(spark, log_dir, "orig")
    wall_comp, rows_comp = replay_wall(spark, f"{WORK}/compacted", "comp")
    assert rows_orig == rows_comp, (rows_orig, rows_comp)

    out = {
        "metric": "from-genesis replay wall, original vs compacted log",
        "events": args.events,
        "epochs": n_epochs,
        "versions_per_key_target": args.versions_per_key,
        "winners": stats["winners"],
        "dropped_tombstones": stats["dropped_tombstones"],
        "log_bytes": dir_bytes(log_dir),
        "compacted_bytes": dir_bytes(f"{WORK}/compacted"),
        "compact_wall_sec": round(compact_wall, 2),
        "replay_wall_original_sec": round(wall_orig, 2),
        "replay_wall_compacted_sec": round(wall_comp, 2),
        "replay_speedup": round(wall_orig / wall_comp, 2),
        "size_ratio": round(dir_bytes(log_dir) / dir_bytes(f"{WORK}/compacted"), 2),
        "final_rows_match": rows_orig == rows_comp,
        "cpus": args.cpus,
    }
    with open(os.path.abspath(args.json), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    spark.stop()
    shutil.rmtree(WORK, ignore_errors=True)


if __name__ == "__main__":
    main()
