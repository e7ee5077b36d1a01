"""Kafka-shaped partitioned transport → offset-vector epochs
(sources/partitioned.py): per-partition-only ordering must still replay to
the exact per-key final state; resume continues the vector; redeliveries
drop; gaps refuse to ship."""

import pytest
import pyspark.sql.functions as F

from data_pipeline_spark.lake.table import LakeTable
from data_pipeline_spark.sources.partitioned import (
    OffsetVectorLedger,
    ingest_partitioned,
    pack_offset_epochs,
)
from data_pipeline_spark.streaming.checkpoint import CheckpointStore


def _delivery(spark, rows):
    """rows: (partition, offset, op, url, val); ts constant — ordering must
    come entirely from (partition, offset)."""
    df = spark.createDataFrame(
        [(int(p), int(o), op, u, float(v)) for p, o, op, u, v in rows],
        "partition long, offset long, op string, url string, val double",
    )
    return df.withColumn(
        "warc_ts", F.lit("2024-01-01 00:00:00").cast("timestamp")
    ).withColumn("lsn", F.col("offset"))


def test_pack_is_pure_and_drops_redeliveries(spark):
    rows = [(p, o, "upsert", f"u{p}_{o}", 1.0) for p in (0, 1) for o in range(1, 10)]
    packed = pack_offset_epochs(
        _delivery(spark, rows), {0: 4}, target=4
    )
    got = {(r["partition"], r["offset"]): r["epoch"] for r in packed.collect()}
    # partition 0: offsets 1-4 already shipped; 5-8 -> epoch 0, 9 -> epoch 1
    assert (0, 4) not in got and (0, 1) not in got
    assert got[(0, 5)] == 0 and got[(0, 8)] == 0 and got[(0, 9)] == 1
    # partition 1: nothing shipped; 1-4 -> epoch 0, 5-8 -> epoch 1, 9 -> 2
    assert got[(1, 1)] == 0 and got[(1, 4)] == 0
    assert got[(1, 5)] == 1 and got[(1, 9)] == 2


def _replay(spark, log_dir, root):
    schema = spark.createDataFrame(
        [], "url string, warc_ts timestamp, lsn long, val double"
    ).schema
    t = LakeTable.create(spark, f"{root}/t", schema, key_col="url", n_buckets=8)
    from data_pipeline_spark.sources import changelog

    cp = CheckpointStore(f"{root}/cp")
    for e in changelog.list_epochs(spark, log_dir):
        if cp.is_done(e):
            continue
        df = changelog.read_epoch(spark, log_dir, e).select(
            "op", "url", "warc_ts", "lsn", "val"
        )
        t.merge(df, epoch=e, mode="mor")
        cp.record(e, {})
    return t


def test_partitioned_ingest_replays_to_exact_state(spark, tmp_path):
    """Keys are hash-pinned to partitions; cross-partition interleaving is
    scrambled (all ts equal) — final state must equal delivery order per
    key."""
    keys = [f"k{i}" for i in range(12)]
    part = {k: sum(map(ord, k)) % 3 for k in keys}  # stable key-hash pinning
    # delivery order per key: 3 updates then maybe a delete
    rows, offsets = [], {0: 0, 1: 0, 2: 0}
    final = {}
    for rnd in range(3):
        for i, k in enumerate(keys):
            p = part[k]
            offsets[p] += 1
            v = float(rnd * 100 + i)
            rows.append((p, offsets[p], "upsert", k, v))
            final[k] = v
    for k in keys[::4]:
        p = part[k]
        offsets[p] += 1
        rows.append((p, offsets[p], "delete", k, 0.0))
        final.pop(k)

    ledger = OffsetVectorLedger(str(tmp_path / "ledger.json"))
    res = ingest_partitioned(
        spark, _delivery(spark, rows), str(tmp_path / "log"), ledger, target=5
    )
    assert res["rows"] == len(rows)
    t = _replay(spark, str(tmp_path / "log"), str(tmp_path / "a"))
    got = {r["url"]: r["val"] for r in t.read().select("url", "val").collect()}
    assert got == final


def test_resume_continues_vector_and_drops_redelivery(spark, tmp_path):
    ledger = OffsetVectorLedger(str(tmp_path / "ledger.json"))
    log = str(tmp_path / "log")
    first = [(0, o, "upsert", f"u{o}", float(o)) for o in range(1, 7)]
    r1 = ingest_partitioned(spark, _delivery(spark, first), log, ledger, target=3)
    assert r1["epochs"] == [0, 1]
    assert ledger.start_vector() == {0: 6}
    # second delivery REDELIVERS offsets 5-6 then continues 7-9
    second = [(0, o, "upsert", f"u{o}", float(o + 100)) for o in range(5, 10)]
    r2 = ingest_partitioned(spark, _delivery(spark, second), log, ledger, target=3)
    assert r2["epochs"] == [2] and r2["rows"] == 3  # only 7,8,9 shipped
    assert ledger.start_vector() == {0: 9}
    t = _replay(spark, log, str(tmp_path / "b"))
    got = {r["url"]: r["val"] for r in t.read().select("url", "val").collect()}
    # u5/u6 keep their first-delivery values; u7-u9 carry the new ones
    assert got["u5"] == 5.0 and got["u6"] == 6.0
    assert got["u7"] == 107.0 and got["u9"] == 109.0


def test_gap_refuses_to_ship(spark, tmp_path):
    ledger = OffsetVectorLedger(str(tmp_path / "ledger.json"))
    log = str(tmp_path / "log")
    ingest_partitioned(
        spark,
        _delivery(spark, [(0, o, "upsert", f"u{o}", 1.0) for o in (1, 2, 3)]),
        log, ledger, target=10,
    )
    with pytest.raises(ValueError, match="not contiguous"):
        ingest_partitioned(
            spark,
            _delivery(spark, [(0, 6, "upsert", "u6", 1.0)]),  # 4,5 missing
            log, ledger, target=10,
        )
    # intra-batch hole refuses too
    with pytest.raises(ValueError, match="not contiguous"):
        ingest_partitioned(
            spark,
            _delivery(spark, [(0, 4, "upsert", "u4", 1.0),
                              (0, 6, "upsert", "u6", 1.0)]),
            log, ledger, target=10,
        )


def test_ledger_conflicting_epoch_raises(tmp_path):
    ledger = OffsetVectorLedger(str(tmp_path / "ledger.json"))
    ledger.record(0, {0: 5})
    ledger.record(0, {0: 5})  # same vector: idempotent
    with pytest.raises(ValueError, match="different offset vector"):
        ledger.record(0, {0: 7})


def test_crash_between_log_write_and_ledger_is_idempotent(spark, tmp_path):
    """Log written, ledger lost (the documented crash window): re-running
    the same delivery appends byte-identical duplicates to the same epoch
    dirs — the downstream merge's LWW collapses them and the final state
    is exact."""
    rows = [(0, o, "upsert", f"u{o % 4}", float(o)) for o in range(1, 9)]
    ledger_path = str(tmp_path / "ledger.json")
    log = str(tmp_path / "log")
    ingest_partitioned(
        spark, _delivery(spark, rows), log, OffsetVectorLedger(ledger_path),
        target=4,
    )
    # crash: the ledger file never made it to disk
    import os
    os.remove(ledger_path)
    res = ingest_partitioned(
        spark, _delivery(spark, rows), log, OffsetVectorLedger(ledger_path),
        target=4,
    )
    assert res["epochs"] == [0, 1]  # same ids re-derived
    t = _replay(spark, log, str(tmp_path / "c"))
    got = {r["url"]: r["val"] for r in t.read().select("url", "val").collect()}
    assert got == {"u1": 5.0, "u2": 6.0, "u3": 7.0, "u0": 8.0}
