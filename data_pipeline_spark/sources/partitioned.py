"""Kafka-shaped multi-partition change transport → offset-vector epochs.

Every production CDC wire (Kafka, Kinesis, Pulsar — the transports Debezium
actually ships over) delivers a table's change stream across P partitions,
ordered only WITHIN a partition; the producer key-hashes the row key, so
one key's events all land in one partition. The engine's changelog is
epoch-sequenced; this module is the bridge:

- :func:`pack_offset_epochs` — assign each (partition, offset) row an
  epoch by a deterministic per-partition cut: epoch = (offset - start[p])
  // target. This is ONE narrow map (no shuffle, no sort, no window): the
  epoch of a row is a pure function of its own coordinates and the start
  vector. Epoch boundaries form consistent offset VECTORS
  ``v_e[p] = start[p] + (e+1)·target`` — exactly the shape a Kafka
  consumer group commits.
- :class:`OffsetVectorLedger` — the durable committed-vector sequence:
  resume re-derives the start vector from the last committed entry, a
  replayed batch that maps to an already-committed epoch is skipped by
  the downstream merge ledger, and a NON-CONTIGUOUS delivery (offsets
  jumping past the committed vector) raises instead of silently creating
  a gap.
- :func:`ingest_partitioned` — pack + write to the epoch-partitioned
  changelog (`sources/changelog.py` format) with the vector recorded per
  epoch, feeding the normal replay runner unchanged.

Correctness under partition-only ordering: LWW replay orders per key by
``(ts, lsn)``. With key-hash partitioning a key's events share one
partition, so stamping ``lsn = offset`` gives each key a total order that
agrees with the transport's delivery order — cross-partition interleaving
is free to scramble, exactly like the real consumer. For re-partitioned
topics (a key's history spanning partitions) ordering falls back to event
time, the same contract the Debezium adapter documents.

Scale: the pack is a narrow projection at wire speed; per-epoch commit
cost is the changelog write of that epoch's rows. Skewed partitions skew
epoch sizes per partition, not correctness (the cut is per-partition);
the ledger is O(P) per epoch.
"""

from __future__ import annotations

import json
import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..lake.table import _atomic_write
from . import changelog


def pack_offset_epochs(
    df: DataFrame,
    start_vector: dict[int, int],
    target: int,
    partition_col: str = "partition",
    offset_col: str = "offset",
    epoch_base: int = 0,
    genesis: int = 1,
) -> DataFrame:
    """Assign epochs by per-partition offset cuts (narrow, shuffle-free).

    ``start_vector``: {partition → last shipped offset} (exclusive); rows
    at or below it are presumed redelivered and dropped. ``genesis`` is
    the transport's FIRST offset: unknown (first-sight) partitions start
    at ``genesis - 1`` meaning "nothing shipped". The default 1 matches a
    1-based transport; **pass genesis=0 for Kafka** (0-based) or the first
    record of every new partition is silently dropped as a redelivery.
    ``target``: offsets per partition per epoch. Output adds ``epoch``.
    """
    if target <= 0:
        raise ValueError("target must be positive")
    if start_vector:
        start = F.create_map(
            *[
                c
                for p, o in start_vector.items()
                for c in (F.lit(int(p)).cast("long"), F.lit(int(o)).cast("long"))
            ]
        )
        base = F.coalesce(
            F.element_at(start, F.col(partition_col).cast("long")),
            F.lit(int(genesis) - 1).cast("long"),
        )
    else:
        base = F.lit(int(genesis) - 1).cast("long")
    out = df.where(F.col(offset_col) > base).withColumn(
        "epoch",
        (
            epoch_base
            + F.floor((F.col(offset_col) - base - 1) / F.lit(target))
        ).cast("long"),
    )
    return out


class OffsetVectorLedger:
    """Durable sequence of committed offset vectors, one per epoch.

    File format: ``{"epochs": {"<epoch>": {"<partition>": upto_offset}}}``
    — atomic-replace on every commit (same convention as table metadata).
    """

    def __init__(self, path: str):
        self.path = path
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)

    def _load(self) -> dict:
        if not os.path.exists(self.path):
            return {"epochs": {}}
        with open(self.path) as fh:
            return json.load(fh)

    def committed_epochs(self) -> list[int]:
        return sorted(int(e) for e in self._load()["epochs"])

    def start_vector(self) -> dict[int, int]:
        """{partition → highest committed offset} across all epochs."""
        vec: dict[int, int] = {}
        for entry in self._load()["epochs"].values():
            for p, o in entry.items():
                vec[int(p)] = max(vec.get(int(p), 0), int(o))
        return vec

    def record(self, epoch: int, vector: dict[int, int]) -> None:
        cur = self._load()
        have = cur["epochs"].get(str(int(epoch)))
        if have is not None and have != {str(k): v for k, v in vector.items()}:
            raise ValueError(
                f"epoch {epoch} already committed with a different offset "
                f"vector ({have} != {vector}) — same epoch id must mean the "
                "same data"
            )
        cur["epochs"][str(int(epoch))] = {
            str(int(p)): int(o) for p, o in vector.items()
        }
        _atomic_write(self.path, json.dumps(cur))


def ingest_partitioned(
    spark: SparkSession,
    df: DataFrame,
    log_dir: str,
    ledger: OffsetVectorLedger,
    target: int,
    partition_col: str = "partition",
    offset_col: str = "offset",
    consumed: DataFrame | None = None,
    genesis: int = 1,
) -> dict:
    """Pack a partitioned delivery into changelog epochs, exactly-once.

    Already-shipped offsets (at or below the ledger's start vector) are
    dropped as redeliveries. Gap check: each partition's new offsets must
    continue contiguously from the committed vector — a jump means the
    transport lost data between the last commit and now, and silently
    shipping it would fabricate an order that never existed.

    ``consumed``: optional (partition, offset) rows that were consumed
    from the transport but must NOT ship (poison messages routed to a
    DLQ — the Kafka consumer's "commit past the bad record" semantics).
    They participate in the contiguity check and advance the committed
    vector, but never reach the log.

    Epoch numbering continues from the ledger's last committed epoch.
    Returns {epochs, rows, vectors}.

    Crash window (log written, ledger not yet recorded): the re-run packs
    the same rows to the SAME epoch ids (the pack is a pure function of
    the committed vector) and appends them again — the epoch dir then
    holds byte-identical duplicate rows, which the downstream merge's
    per-key LWW collapses to the same winners, and the merge's own epoch
    ledger still applies the epoch once. Exactly-once of the FINAL state
    therefore survives the window without coordination; a crash mid-ledger
    (some epochs recorded) resumes precisely after the recorded vector.
    """
    start = ledger.start_vector()
    committed = ledger.committed_epochs()
    epoch_base = (committed[-1] + 1) if committed else 0

    # localCheckpoint: the gap check (collect below) and write_log are two
    # actions over this frame; a non-deterministic source (a landing dir
    # gaining files between the jobs) would otherwise ship rows the gap
    # check never validated (same pin as transactions.align_epochs).
    packed = pack_offset_epochs(
        df, start, target, partition_col, offset_col, epoch_base,
        genesis=genesis,
    ).localCheckpoint(eager=True)
    coords = packed.select("epoch", partition_col, offset_col).withColumn(
        "__shipped", F.lit(1)
    )
    if consumed is not None:
        coords = coords.unionByName(
            pack_offset_epochs(
                consumed.select(partition_col, offset_col),
                start, target, partition_col, offset_col, epoch_base,
                genesis=genesis,
            ).select("epoch", partition_col, offset_col).withColumn(
                "__shipped", F.lit(0)
            )
        )
    # per (epoch, partition) extent — the commit vectors + the gap check
    # in ONE metadata-scale aggregate (O(P · epochs-in-batch) rows)
    ext = (
        coords.groupBy("epoch", partition_col)
        .agg(
            F.min(offset_col).alias("lo"),
            F.max(offset_col).alias("hi"),
            F.count(F.lit(1)).alias("n"),
            F.countDistinct(offset_col).alias("nd"),
            F.sum("__shipped").alias("n_shipped"),
        )
        .collect()
    )
    if not ext:
        return {"epochs": [], "rows": 0, "consumed": 0, "vectors": {}}
    per_part: dict[int, list] = {}
    for r in ext:
        per_part.setdefault(int(r[partition_col]), []).append(r)
    for p, rows in per_part.items():
        rows.sort(key=lambda r: int(r["epoch"]))
        expect = start.get(p, genesis - 1) + 1
        for r in rows:
            # DISTINCT count vs extent: with a plain row count a duplicated
            # offset and a missing offset cancel out and a hole ships
            # silently. Within-batch duplicate offsets are refused too —
            # they would double rows in the changelog epoch.
            extent = int(r["hi"]) - int(r["lo"]) + 1
            if int(r["lo"]) != expect or int(r["nd"]) != extent:
                raise ValueError(
                    f"partition {p} offsets are not contiguous from the "
                    f"committed vector (expected {expect}, got "
                    f"[{r['lo']}..{r['hi']}] with {r['nd']} distinct) — "
                    "refusing to ship a delivery with holes"
                )
            if int(r["n"]) != int(r["nd"]):
                raise ValueError(
                    f"partition {p} delivered duplicated offsets within one "
                    f"batch ([{r['lo']}..{r['hi']}]: {r['n']} rows over "
                    f"{r['nd']} offsets) — dedup the landing before ingest"
                )
            expect = int(r["hi"]) + 1

    epochs = sorted({int(r["epoch"]) for r in ext})
    changelog.write_log(packed, log_dir)
    vectors: dict[int, dict[int, int]] = {}
    running = dict(start)
    for e in epochs:
        for r in ext:
            if int(r["epoch"]) == e:
                running[int(r[partition_col])] = int(r["hi"])
        vectors[e] = dict(running)
        ledger.record(e, running)
    return {
        "epochs": epochs,
        "rows": sum(int(r["n_shipped"]) for r in ext),
        "consumed": sum(int(r["n"]) - int(r["n_shipped"]) for r in ext),
        "vectors": vectors,
    }
