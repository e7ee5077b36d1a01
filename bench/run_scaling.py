"""Two-parallelism scaling harness (sandbox evidence for the north rule's
N→4N executor criterion): same job, same input, local[8] vs local[32].

Each level runs in its OWN subprocess/JVM so parallelism is really what
changes (a shared JVM would leak executor threads between runs).

Usage: python bench/run_scaling.py [--events N] [--epoch-size M]
Writes BENCH/scaling.json and prints a markdown summary for BENCH/BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)


def run(cmd: list[str]) -> None:
    print("+", " ".join(cmd), file=sys.stderr)
    subprocess.run(cmd, check=True, cwd=REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--events", type=int, default=200_000)
    ap.add_argument("--epoch-size", type=int, default=50_000)
    ap.add_argument("--low", type=int, default=8)
    ap.add_argument("--high", type=int, default=32)
    ap.add_argument("--repeats", type=int, default=2,
                    help="runs per level, best wall-clock kept (the sandbox "
                         "host is multi-tenant; min filters external noise)")
    ap.add_argument("--log-dir", default="/dev/shm/cdc_bench/log",
                    help="tmpfs by default: storage bandwidth on a real "
                         "cluster scales with executors; a single local disk "
                         "would bottleneck both levels identically")
    args = ap.parse_args()

    os.environ.setdefault("SPARK_GRAFT_LOCAL_DIR", "/dev/shm/cdc_bench/spark-local")
    py = sys.executable
    bench = os.path.join(HERE, "cdc_bench.py")
    run([py, bench, "gen", "--events", str(args.events),
         "--epoch-size", str(args.epoch_size), "--log-dir", args.log_dir])

    results = {}
    # Interleave levels so slow host phases hit both levels evenly.
    for rep in range(args.repeats):
        for cpus in (args.low, args.high):
            out = f"/tmp/cdc_bench_{cpus}_{rep}.json"
            run([py, bench, "replay", "--cpus", str(cpus),
                 "--log-dir", args.log_dir, "--json", out])
            with open(out) as f:
                r = json.load(f)
            best = results.get(cpus)
            if best is None or r["wall_sec"] < best["wall_sec"]:
                results[cpus] = r

    lo, hi = results[args.low], results[args.high]
    ratio = args.high / args.low
    eff = (hi["events_per_sec"] / lo["events_per_sec"]) / ratio
    summary = {
        "metric": "cdc_replay_events_per_sec",
        "input_events": lo["n_events"],
        "epochs": lo["epochs"],
        "low": {"cpus": args.low, **lo},
        "high": {"cpus": args.high, **hi},
        "scaling_efficiency": round(eff, 3),
        "target": 0.8,
        "pass": eff >= 0.8,
        "final_state_match": lo["final_table_rows"] == hi["final_table_rows"],
    }
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "scaling.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary, indent=2))


if __name__ == "__main__":
    main()
