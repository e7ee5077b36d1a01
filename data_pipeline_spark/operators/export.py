"""Cost-balanced shard export: the corpus → N shards of ≈budget tokens
each, plus an auditable manifest (X113).

The last step of a curation pipeline is physical: hand the training job
a directory of shards whose sizes are PREDICTABLE (a data-loader reads
shards whole; a 10× size outlier is a straggler epoch) with a manifest
it can verify against. Hash-partitioned writes balance ROW counts;
training cost tracks TOKENS, and web documents are heavy-tailed, so
token balance needs a running total: shard = floor(start_offset /
budget) over the corpus in a deterministic key order — every shard
(except the last) then carries budget ± one document of tokens, and
the assignment is a pure function of (corpus, budget, order), stable
across reruns and physical partitionings.

The running total is computed scale-safely — a classic distributed
prefix sum, NOT a global single-partition window sort (the usual
10^10-row trap):

1. range-repartition by the order key (Spark's range exchange);
2. per-partition local cumsum (bounded in-partition window);
3. per-partition totals → driver-side running offsets (P scalars —
   metadata-scale, the repo's documented collect budget);
4. global cum = partition offset + local cum.

The row→shard map is partition-INDEPENDENT (a prefix sum over a total
order doesn't care where the range boundaries fell), so the output is
deterministic even though the range sampler isn't.

``export_shards`` writes one directory per shard (parquet or JSON
lines) and a ``manifest.json`` carrying per-shard rows / cost / an
ORDER-INDEPENDENT content hash (sum of per-row xxhash64 as a
decimal(38) accumulator — the state-certificate trick from
lake/statecert, cheap to recompute on the consumer side with one agg),
so a loader can assert it received exactly what curation shipped.

Reference: the Rust pipeline exports flat CSV/parquet per run
(/root/reference/src/storage/mod.rs) with no size or integrity
contract; this is the at-scale re-expression.
"""

from __future__ import annotations

import json
import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

__all__ = [
    "assign_shards",
    "export_shards",
    "append_shards",
    "verify_shards",
    "sql_assign_shards",
]


def assign_shards(
    df: DataFrame,
    cost_col: str,
    budget: int,
    order_col: str,
    n_parts: int | None = None,
    base: int = 0,
) -> DataFrame:
    """Adds ``shard_id``: floor((base + running-cost-before-this-row) /
    budget) in ``order_col`` order (order_col must be a unique total
    order — ties would make the prefix sum ambiguous). ``base`` starts
    the running total mid-stream, which is how :func:`append_shards`
    continues an existing export. NULL/negative costs are rejected up
    front: a silent 0 would hide upstream token-count bugs.

    One range exchange + one bounded per-partition window + a P-scalar
    driver fold; never a global sort into one partition."""
    if budget < 1:
        raise ValueError("need budget >= 1")
    bad = df.where(
        F.col(cost_col).isNull() | (F.col(cost_col) < 0)
    ).limit(1).count()
    if bad:
        raise ValueError(f"{cost_col} contains NULL or negative values")
    parts = n_parts or df.sparkSession.sparkContext.defaultParallelism
    ranged = df.repartitionByRange(parts, F.col(order_col)).withColumn(
        "_pid", F.spark_partition_id()
    )
    # Pin the partitioning (transactions.py::align_epochs discipline): the
    # totals collect below and every later materialization of the result
    # (data write, manifest agg) must see IDENTICAL _pid assignments —
    # RangePartitioner re-samples boundaries per job otherwise, and an
    # offset computed under one boundary set applied under another silently
    # mis-shards rows.
    ranged = ranged.localCheckpoint(eager=True)
    w = (
        Window.partitionBy("_pid")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = ranged.withColumn(
        "_cum", F.sum(F.col(cost_col).cast("long")).over(w)
    )
    # partition totals -> running offsets (P scalars; metadata-scale)
    totals = {
        r["_pid"]: r["_t"]
        for r in local.groupBy("_pid")
        .agg(F.max("_cum").alias("_t"))
        .collect()
    }
    # range partitions are ordered by _pid, but empty ones are absent
    offsets, run = {}, int(base)
    for pid in sorted(totals):
        offsets[pid] = run
        run += totals[pid]
    off = F.create_map(
        *[F.lit(x) for kv in offsets.items() for x in kv]
    ) if offsets else F.create_map()
    start = F.element_at(off, F.col("_pid")) + F.col("_cum") - F.col(cost_col)
    return local.withColumn(
        "shard_id", F.floor(start / F.lit(budget)).cast("int")
    ).drop("_pid", "_cum")


def sql_assign_shards(
    input_rel: str,
    cost_col: str,
    budget: int,
    order_col: str,
    select: str = "*",
) -> str:
    """DuckDB twin: the same assignment as one global window cumsum
    (fine at oracle scale; the Spark path exists precisely because this
    shape doesn't survive 10^10 rows)."""
    return f"""
SELECT {select}, CAST(floor(
  (sum({cost_col}) OVER (ORDER BY {order_col}
     ROWS UNBOUNDED PRECEDING) - {cost_col}) / {budget}) AS INTEGER
) AS shard_id
FROM {input_rel}
"""


def export_shards(
    df: DataFrame,
    out_dir: str,
    cost_col: str,
    order_col: str,
    budget: int,
    hash_cols: list[str] | None = None,
    fmt: str = "parquet",
    write_cols: list[str] | None = None,
) -> dict:
    """Assign shards, write one subdirectory per shard
    (``shard_id=N/``), and write ``manifest.json``:

    ``{"budget": B, "schema": <json>, "shards": [{"shard_id", "rows",
    "cost", "content_hash"}, ...], "total_rows": R, "total_cost": C}``

    ``write_cols`` limits what ships (default: every input column) —
    the cost/order columns may be scratch derivations the consumer
    never needs. ``content_hash`` is order-independent (sum of row
    xxhash64 over ``hash_cols``, default the written columns, as a
    decimal(38) accumulator) so the consumer can verify each shard with
    one agg, in any engine with xxhash64. The written frame's schema is
    recorded so :func:`verify_shards` re-reads with EXACT types — JSON
    round-trips would otherwise re-infer timestamps as strings and hash
    differently. Returns the manifest dict."""
    if fmt not in ("parquet", "json"):
        raise ValueError("fmt must be parquet or json")
    assigned = assign_shards(df, cost_col, budget, order_col)
    cols = list(write_cols or df.columns)
    hcols = list(hash_cols or cols)
    missing = [c for c in hcols if c not in cols]
    if missing:
        raise ValueError(f"hash_cols {missing} not in written columns")
    shipped = assigned.select(*cols, "shard_id")
    shipped.write.mode("overwrite").partitionBy("shard_id").format(fmt).save(
        os.path.join(out_dir, "data")
    )
    rows = _shard_stats(assigned, cost_col, hcols).orderBy("shard_id").collect()
    manifest = {
        "budget": int(budget),
        "cost_col": cost_col,
        "order_col": order_col,
        "write_cols": cols,
        "hash_cols": hcols,
        "format": fmt,
        "schema": json.loads(shipped.drop("shard_id").schema.json()),
        "shards": [
            {
                "shard_id": int(r["shard_id"]),
                "rows": int(r["rows"]),
                "cost": int(r["cost"]),
                "content_hash": str(r["content_hash"]),
            }
            for r in rows
        ],
        "total_rows": int(sum(r["rows"] for r in rows)),
        "total_cost": int(sum(r["cost"] for r in rows)),
    }
    _write_manifest(out_dir, manifest)
    return manifest


def _write_manifest(out_dir: str, manifest: dict) -> None:
    import tempfile

    fd, tmp = tempfile.mkstemp(dir=out_dir, suffix=".tmp")
    with os.fdopen(fd, "w") as f:
        json.dump(manifest, f, indent=1)
    os.replace(tmp, os.path.join(out_dir, "manifest.json"))


def _shard_stats(assigned: DataFrame, cost_col: str, hcols: list[str]) -> DataFrame:
    return assigned.groupBy("shard_id").agg(
        F.count("*").alias("rows"),
        F.sum(F.col(cost_col).cast("long")).alias("cost"),
        F.sum(
            F.xxhash64(*[F.col(c) for c in hcols]).cast("decimal(38,0)")
        ).alias("content_hash"),
    )


def append_shards(df: DataFrame, out_dir: str, epoch: int | None = None) -> dict:
    """Incremental export: fold one epoch's NEW rows into an existing
    shard export without touching what's already shipped. At 10^10 docs
    the nightly corpus delta is ~10^7 rows; re-exporting the corpus to
    re-balance it would be a full-table job every night, so appends
    continue the SAME running-cost stream the original export started:
    the new batch's prefix sum begins at the manifest's ``total_cost``,
    the first rows top up the last (underfull) shard, and later rows
    open new shards — the resulting layout is byte-identical to having
    exported old ∪ new in one pass (the prefix sum doesn't care where
    the batches ended).

    Already-shipped files are untouched; the batch lands as NEW files
    inside the shard dirs, and manifest entries update by ADDITION,
    which is sound because the content hash is an order-independent SUM
    of row hashes — the one-agg consumer check keeps working across any
    number of appends.

    ``epoch`` makes the append exactly-once INCLUDING crash recovery:
    the batch is staged (idempotent overwrite into
    ``stage-epoch=N/``), prior remnants of the same epoch are swept
    from the shard dirs, the staged files move in under DETERMINISTIC
    names (``epochN-i.ext`` — a retry overwrites, never duplicates),
    and only then does the manifest commit the epoch. A crash at any
    point leaves either a committed epoch (rerun is a no-op) or an
    uncommitted one (rerun redoes stage→sweep→move→commit from
    scratch). Returns the updated manifest dict.

    ``epoch=None`` (ADVICE r3) no longer takes a separate non-atomic
    append path — a crash between the data write and the manifest update
    left shipped rows unaccounted and a rerun duplicated the batch.
    Instead the next epoch id is allocated from the manifest
    (``max(epochs)+1``) and the append flows through the same
    staged/deterministic-rename/commit machinery. Callers that want
    cross-process exactly-once must still pass an explicit epoch (an
    auto-allocated id can't recognize a retry of the same batch), but
    every append is now crash-atomic.

    SINGLE WRITER REQUIRED for ``epoch=None`` (round-5 ADVICE): the
    read-manifest → allocate → commit sequence has no lock, so two
    CONCURRENT auto-epoch appenders can allocate the same id, sweep each
    other's staged files, and last-writer-win the manifest. Concurrent
    appends need externally-coordinated explicit epochs (each writer its
    own id); auto-allocation is for the single-writer cron/job path —
    the same contract the lake table's single-writer commit has."""
    mpath = os.path.join(out_dir, "manifest.json")
    with open(mpath) as f:
        m = json.load(f)
    if epoch is None:
        epoch = max(m.get("epochs", []), default=-1) + 1
    elif epoch in m.get("epochs", []):
        return m
    # continue the corpus-wide prefix sum where the manifest left off
    assigned = assign_shards(
        df, m["cost_col"], m["budget"], m["order_col"],
        base=int(m["total_cost"]),
    )
    cols = m.get("write_cols") or [c for c in df.columns]
    hcols = m["hash_cols"]
    shipped = assigned.select(*cols, "shard_id")
    delta = {
        int(r["shard_id"]): r
        for r in _shard_stats(assigned, m["cost_col"], hcols).collect()
    }
    data_dir = os.path.join(out_dir, "data")
    import glob as _glob
    import shutil

    stage = os.path.join(out_dir, f"stage-epoch={epoch}")
    shipped.write.mode("overwrite").partitionBy("shard_id").format(
        m["format"]
    ).save(stage)
    # sweep any partial prior attempt of THIS epoch, then move the
    # staged files in under deterministic names (retry-idempotent)
    for old in _glob.glob(
        os.path.join(data_dir, "shard_id=*", f"epoch{epoch}-*")
    ):
        os.remove(old)
    for sdir in sorted(_glob.glob(os.path.join(stage, "shard_id=*"))):
        tdir = os.path.join(data_dir, os.path.basename(sdir))
        os.makedirs(tdir, exist_ok=True)
        parts = sorted(
            fn for fn in os.listdir(sdir) if fn.startswith("part-")
        )
        for i, fn in enumerate(parts):
            ext = fn.rsplit(".", 1)[-1]
            os.replace(
                os.path.join(sdir, fn),
                os.path.join(tdir, f"epoch{epoch}-{i}.{ext}"),
            )
    shutil.rmtree(stage, ignore_errors=True)
    by_id = {s["shard_id"]: s for s in m["shards"]}
    for sid, r in delta.items():
        if sid in by_id:
            s = by_id[sid]
            s["rows"] += int(r["rows"])
            s["cost"] += int(r["cost"])
            s["content_hash"] = str(
                int(s["content_hash"]) + int(r["content_hash"])
            )
        else:
            by_id[sid] = {
                "shard_id": sid,
                "rows": int(r["rows"]),
                "cost": int(r["cost"]),
                "content_hash": str(r["content_hash"]),
            }
    m["shards"] = [by_id[k] for k in sorted(by_id)]
    m["total_rows"] = sum(s["rows"] for s in m["shards"])
    m["total_cost"] = sum(s["cost"] for s in m["shards"])
    m.setdefault("epochs", []).append(int(epoch))
    _write_manifest(out_dir, m)
    return m


def verify_shards(spark: SparkSession, out_dir: str) -> DataFrame:
    """Consumer-side check: re-aggregate the written shards and diff
    against the manifest. Returns the mismatching shard rows (empty ==
    intact) — one scan, no driver-side row data. Reads with the
    manifest's recorded schema, so JSON exports hash with the same
    types they were written with (inference would re-type timestamps as
    strings and report phantom corruption)."""
    from pyspark.sql.types import StructType

    with open(os.path.join(out_dir, "manifest.json")) as f:
        m = json.load(f)
    reader = spark.read.format(m["format"])
    if m.get("schema") is not None:
        reader = reader.schema(StructType.fromJson(m["schema"]))
    data = reader.load(os.path.join(out_dir, "data"))
    got = data.groupBy("shard_id").agg(
        F.count("*").alias("rows"),
        F.sum(
            F.xxhash64(*[F.col(c) for c in m["hash_cols"]]).cast(
                "decimal(38,0)"
            )
        ).alias("content_hash"),
    )
    want = spark.createDataFrame(
        [
            (s["shard_id"], s["rows"], s["content_hash"])
            for s in m["shards"]
        ],
        "shard_id int, rows long, content_hash string",
    ).withColumn("content_hash", F.col("content_hash").cast("decimal(38,0)"))
    return got.join(want, "shard_id", "full").where(
        ~(
            got["rows"].eqNullSafe(want["rows"])
            & got["content_hash"].eqNullSafe(want["content_hash"])
        )
    )
