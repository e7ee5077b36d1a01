"""Two-cluster-size scaling harness (sandbox evidence for the north rule's
N→4N executor criterion): the same job on the same input at N and 4N worth
of cores, each level in its own subprocess/JVM.

Defaults: N = 4 cores vs 4N = 16 cores (as local-cluster[1,4,*] vs
local-cluster[4,4,*] when --executors is set, else local[4] vs local[16]).
The host has 32 CPUs; capping the high level at 16 leaves headroom so the
measurement isn't polluted by the driver, OS, and hypervisor neighbors.

The sandbox host is a multi-tenant VM: identical runs vary up to ~1.7x
(hypervisor steal + frequency scaling). Counter-measures, all reported in
the output artifact:

- interleaved repeats, best (min sustained-wall) per level kept;
- a warm-up epoch excluded from the sustained metric (python-worker spawn,
  codegen — costs a long-running tail amortizes to zero);
- a pure-CPU control (hash loop in a pandas UDF — embarrassingly parallel,
  zero engine code) measured at the same two levels: its efficiency is the
  HOST CEILING (frequency scaling alone costs ~20% going 4→16 busy cores);
  engine efficiency is judged against that ceiling, not against 1.0.

Usage: python bench/run_scaling.py [--events N] [--epoch-size M] [--repeats R]
Writes BENCH/scaling.json and prints the summary.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)

CONTROL_SCRIPT = r"""
import sys, time, os
sys.path.insert(0, {repo!r})
os.environ.setdefault("SPARK_GRAFT_LOCAL_DIR", "/dev/shm/cdc_bench/spark-local")
from data_pipeline_spark.session import get_spark
import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType
k = int(sys.argv[1])
spark = get_spark(f"ctl-{{k}}", master=f"local[{{k}}]", shuffle_partitions=k)

@pandas_udf(DoubleType())
def burn(s: pd.Series) -> pd.Series:
    import hashlib
    def f(x):
        h = 0
        b = str(x).encode()
        for i in range(200):
            b = hashlib.md5(b).digest()
            h ^= b[0]
        return float(h)
    return s.map(f)

df = spark.range(0, 400_000, 1, k * 2).toDF("id")
best = None
for it in range(3):
    t0 = time.monotonic()
    df.select(burn("id").alias("v")).agg({{"v": "sum"}}).collect()
    w = time.monotonic() - t0
    if it > 0 and (best is None or w < best):  # iter 0 = warm-up
        best = w
print(f"CONTROL {{k}} {{best:.3f}}")
spark.stop()
"""


WORKLOAD_CONTROL = r"""
import sys, time
sys.path.insert(0, {repo!r})
from multiprocessing import Pool
from data_pipeline_spark.functions.extract import extract_text

HTML = ('<html><body><div class="header"><span class="menu">navigation menu</span></div>'
        '<span class="base" data-ui-id="page-title-wrapper">Groceries</span>'
        '<div class="product-item" data-product-id="%d"><h3>Fresh Item &amp; Co %d</h3>'
        '<span class="price" data-price-amount="%d">Rs. %d</span></div>'
        '<div class="product-item"><h3>Sponsored banner item</h3>'
        '<span class="price">Rs. 1</span></div><div class="footer">footer links</div>'
        '</body></html>')

def work(n):
    t0 = time.perf_counter()
    for i in range(n):
        extract_text(HTML % (i, i, i * 7, i * 7))
    return time.perf_counter() - t0

if __name__ == "__main__":
    procs = int(sys.argv[1])
    per = 30000
    with Pool(procs) as p:
        p.map(work, [2000] * procs)  # warm the pool
        t0 = time.perf_counter()
        p.map(work, [per] * procs)
        total = time.perf_counter() - t0
    print(f"CONTROL {{procs}} {{procs * per / total:.1f}}")
"""


def run(cmd: list[str], capture: bool = False):
    print("+", " ".join(cmd), file=sys.stderr)
    return subprocess.run(
        cmd, check=True, cwd=REPO, capture_output=capture, text=capture
    )


def control_wall(cores: int) -> float:
    script = CONTROL_SCRIPT.format(repo=REPO)
    out = run([sys.executable, "-c", script, str(cores)], capture=True).stdout
    for line in out.splitlines():
        if line.startswith("CONTROL"):
            return float(line.split()[2])
    raise RuntimeError(f"control produced no result: {out[-500:]}")


def workload_control_rate(procs: int) -> float:
    """extract_text throughput in a bare multiprocessing pool — ZERO Spark,
    zero engine orchestration. This is the host's ceiling for the actual
    workload (allocation-heavy pure-Python HTML parsing), which scales worse
    than cache-friendly C loops on a shared-memory VM: CPython allocator +
    memory-bandwidth + frequency coupling between busy cores. On a real
    cluster, N and 4N executors are separate machines that don't share a
    turbo/bandwidth budget, so this coupling does not exist there."""
    script = WORKLOAD_CONTROL.format(repo=REPO)
    out = run([sys.executable, "-c", script, str(procs)], capture=True).stdout
    for line in out.splitlines():
        if line.startswith("CONTROL"):
            return float(line.split()[2])
    raise RuntimeError(f"workload control produced no result: {out[-500:]}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--events", type=int, default=4_000_000)
    ap.add_argument("--epoch-size", type=int, default=500_000)
    ap.add_argument("--low", type=int, default=4, help="N (cores)")
    ap.add_argument("--high", type=int, default=16, help="4N (cores)")
    ap.add_argument("--executors", action="store_true",
                    help="run each level as local-cluster[n_exec,4,mem] "
                         "(separate executor JVMs) instead of local[K]")
    ap.add_argument("--mode", default="mor", choices=["cow", "mor"],
                    help="merge mode; mor = O(epoch) commits, the "
                         "high-ingest-rate posture")
    ap.add_argument("--repeats", type=int, default=3,
                    help="interleaved runs per level, best kept (multi-"
                         "tenant host; min filters external noise)")
    ap.add_argument("--skip-control", action="store_true")
    ap.add_argument("--log-dir", default="/dev/shm/cdc_bench/log",
                    help="tmpfs by default: storage bandwidth on a real "
                         "cluster scales with executors; a single local disk "
                         "would bottleneck both levels identically")
    ap.add_argument("--hot-share", type=int, default=0,
                    help="percent of events hammering --hot-keys urls — "
                         "the skewed-log variant (VERDICT r4 #3): hot keys "
                         "exercise the LWW salting/two-level-agg path "
                         "under N vs 4N")
    ap.add_argument("--hot-keys", type=int, default=4)
    ap.add_argument("--out", default="scaling.json",
                    help="artifact filename under BENCH/")
    args = ap.parse_args()

    os.environ.setdefault("SPARK_GRAFT_LOCAL_DIR", "/dev/shm/cdc_bench/spark-local")
    py = sys.executable
    bench = os.path.join(HERE, "cdc_bench.py")
    run([py, bench, "gen", "--events", str(args.events),
         "--epoch-size", str(args.epoch_size), "--log-dir", args.log_dir,
         "--hot-share", str(args.hot_share),
         "--hot-keys", str(args.hot_keys)])

    results: dict[int, dict] = {}
    # Interleave levels so slow host phases hit both levels evenly.
    for rep in range(args.repeats):
        for cpus in (args.low, args.high):
            out = f"/tmp/cdc_bench_{cpus}_{rep}.json"
            cmd = [py, bench, "replay", "--mode", args.mode,
                   "--log-dir", args.log_dir, "--json", out]
            if args.executors:
                cmd += ["--executors", str(cpus // 4), "--executor-cores", "4"]
            else:
                cmd += ["--cpus", str(cpus)]
            run(cmd)
            with open(out) as f:
                r = json.load(f)
            best = results.get(cpus)
            if best is None or (
                r["sustained_events_per_sec"] > best["sustained_events_per_sec"]
            ):
                results[cpus] = r

    lo, hi = results[args.low], results[args.high]
    ratio = args.high / args.low
    eff = (hi["sustained_events_per_sec"] / lo["sustained_events_per_sec"]) / ratio

    summary = {
        "metric": "cdc_replay_sustained_events_per_sec",
        "input_events": lo["n_events"],
        "epochs": lo["epochs"],
        "mode": args.mode,
        "hot_share_pct": args.hot_share,
        "n_hot_keys": args.hot_keys,
        "low": {"cpus": args.low, **lo},
        "high": {"cpus": args.high, **hi},
        "scaling_efficiency": round(eff, 3),
        "target": 0.8,
        "pass": eff >= 0.8,
        "final_state_match": lo["final_table_rows"] == hi["final_table_rows"],
    }
    if not args.skip_control:
        c_lo = control_wall(args.low)
        c_hi = control_wall(args.high)
        ceiling = (c_lo / c_hi) / ratio
        summary["host_ceiling"] = {
            "control": "pure-CPU hash loop in pandas UDF (no engine code)",
            "low_wall_sec": round(c_lo, 3),
            "high_wall_sec": round(c_hi, 3),
            "ceiling_efficiency": round(ceiling, 3),
        }
        summary["efficiency_vs_host_ceiling"] = round(eff / ceiling, 3)
        w_lo = workload_control_rate(args.low)
        w_hi = workload_control_rate(args.high)
        w_ceiling = (w_hi / w_lo) / ratio
        summary["workload_ceiling"] = {
            "control": "extract_text in a bare multiprocessing pool "
                       "(no Spark, no engine code) — the dominant kernel "
                       "of the replay",
            "low_docs_per_sec": round(w_lo, 1),
            "high_docs_per_sec": round(w_hi, 1),
            "ceiling_efficiency": round(w_ceiling, 3),
        }
        summary["efficiency_vs_workload_ceiling"] = round(eff / w_ceiling, 3)
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", args.out), "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary, indent=2))


if __name__ == "__main__":
    main()
