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


def test_consumed_holes_advance_vector_without_shipping(spark, tmp_path):
    """Poison offsets consumed-but-not-shipped (Kafka's commit-past-the-
    bad-record semantics): they satisfy the contiguity check and advance
    the committed vector, but never reach the log."""
    ledger = OffsetVectorLedger(str(tmp_path / "ledger.json"))
    log = str(tmp_path / "log")
    good = [(0, o, "upsert", f"u{o}", float(o)) for o in (1, 2, 4, 5, 7, 8)]
    holes = spark.createDataFrame(
        [(0, 3), (0, 6)], "partition long, offset long"
    )
    res = ingest_partitioned(
        spark, _delivery(spark, good), log, ledger, target=4, consumed=holes
    )
    assert res["rows"] == 6 and res["consumed"] == 2
    assert ledger.start_vector() == {0: 8}
    t = _replay(spark, log, str(tmp_path / "a"))
    urls = {r["url"] for r in t.read().select("url").collect()}
    assert urls == {"u1", "u2", "u4", "u5", "u7", "u8"}
    # the next delivery continues from 9 — the holes are behind the vector
    res2 = ingest_partitioned(
        spark, _delivery(spark, [(0, 9, "upsert", "u9", 9.0)]),
        log, ledger, target=4,
    )
    assert res2["rows"] == 1 and ledger.start_vector() == {0: 9}


def test_consumed_only_batch_still_commits_vector(spark, tmp_path):
    """A delivery that is ALL poison still commits its epoch's vector —
    otherwise the consumer re-reads the poisoned prefix forever."""
    ledger = OffsetVectorLedger(str(tmp_path / "ledger.json"))
    log = str(tmp_path / "log")
    holes = spark.createDataFrame(
        [(0, 1), (0, 2)], "partition long, offset long"
    )
    res = ingest_partitioned(
        spark, _delivery(spark, []), log, ledger, target=4, consumed=holes
    )
    assert res["rows"] == 0 and res["consumed"] == 2
    assert res["epochs"] == [0] and ledger.start_vector() == {0: 2}
    res2 = ingest_partitioned(
        spark, _delivery(spark, [(0, 3, "upsert", "u3", 3.0)]),
        log, ledger, target=4,
    )
    assert res2["rows"] == 1 and res2["epochs"] == [1]
    assert ledger.start_vector() == {0: 3}


def test_consumed_does_not_mask_real_gap(spark, tmp_path):
    """A DLQ'd offset explains ITS hole only — an offset missing from both
    the delivery and the consumed set is still transport loss and refuses
    to ship."""
    ledger = OffsetVectorLedger(str(tmp_path / "ledger.json"))
    log = str(tmp_path / "log")
    holes = spark.createDataFrame([(0, 3)], "partition long, offset long")
    with pytest.raises(ValueError, match="not contiguous"):
        ingest_partitioned(
            spark,
            _delivery(spark, [(0, 1, "upsert", "u1", 1.0),
                              (0, 2, "upsert", "u2", 1.0),
                              (0, 5, "upsert", "u5", 1.0)]),  # 4 missing
            log, ledger, target=10, consumed=holes,
        )


def test_ingest_job_offset_ledger_mode(spark, tmp_path, monkeypatch, capsys):
    """jobs/ingest_job.py --offset-ledger: a Kafka-shaped parquet landing
    of (partition, offset, value-envelope) rows becomes offset-vector
    epochs; a poison envelope DLQs as a consumed hole that the vector
    commits past; the re-run ships nothing (in-process; the spark-submit
    surface is covered by test_submit_job)."""
    import json as _json
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from jobs import ingest_job
    from pyspark.sql import SparkSession

    def env(k, v, lsn):
        return _json.dumps({"payload": {
            "before": None,
            "after": {"url": k, "warc_ts": "2024-01-01T00:00:00.000000Z",
                      "val": v},
            "source": {"lsn": lsn, "ts_ms": 1704067200000},
            "op": "c", "ts_ms": 1704067200000,
        }})

    keys = [f"k{i}" for i in range(6)]
    part = {k: i % 2 for i, k in enumerate(keys)}
    rows, offsets, final = [], {0: 0, 1: 0}, {}
    for rnd in range(3):
        for k in keys:
            p = part[k]
            offsets[p] += 1
            v = float(rnd * 10 + int(k[1]))
            rows.append((p, offsets[p], env(k, v, offsets[p])))
            final[k] = v
    offsets[0] += 1
    rows.append((0, offsets[0], "certainly not an envelope"))  # poison tail
    landing = str(tmp_path / "landing")
    spark.createDataFrame(
        rows, "partition long, offset long, value string"
    ).coalesce(2).write.parquet(landing)

    argv = [
        "ingest_job.py",
        "--wire-dir", landing,
        "--log-dir", str(tmp_path / "log"),
        "--row-ddl", "url string, warc_ts timestamp, val double",
        "--epoch-size", "4",
        "--offset-ledger", str(tmp_path / "ledger.json"),
        "--quarantine-dir", str(tmp_path / "dlq"),
    ]
    monkeypatch.setattr("sys.argv", argv)
    monkeypatch.setattr(SparkSession, "stop", lambda self: None)
    ingest_job.main()
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["events"] == 18 and out["quarantined"] == 1
    # final vector covers the poison offset too
    last = out["vectors"][max(out["vectors"], key=int)]
    assert last == {"0": offsets[0], "1": offsets[1]}
    dlq = spark.read.parquet(str(tmp_path / "dlq")).collect()
    assert len(dlq) == 1 and dlq[0]["offset"] == offsets[0]
    assert dlq[0]["raw"] == "certainly not an envelope"

    t = _replay(spark, str(tmp_path / "log"), str(tmp_path / "a"))
    got = {r["url"]: r["val"] for r in t.read().select("url", "val").collect()}
    assert got == final

    # exactly-once: the same landing re-ingested ships nothing
    ingest_job.main()
    out2 = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out2["events"] == 0 and out2["epochs"] == 0


def test_genesis_zero_ships_offset_zero(spark, tmp_path):
    """Kafka is 0-based: with genesis=0 the first record of a new partition
    (offset 0) must ship, not drop as a presumed redelivery."""
    from data_pipeline_spark.sources.partitioned import (
        OffsetVectorLedger,
        ingest_partitioned,
        pack_offset_epochs,
    )

    df = spark.createDataFrame(
        [(0, 0, "upsert", "k0", 1.0), (0, 1, "upsert", "k1", 2.0)],
        "partition long, offset long, op string, url string, val double",
    ).withColumn("warc_ts", F.lit(0).cast("timestamp")).withColumn(
        "lsn", F.col("offset"))
    packed = pack_offset_epochs(df, {}, target=10, genesis=0)
    assert packed.count() == 2  # offset 0 included
    # default (1-based) convention still drops offset 0 as pre-genesis
    assert pack_offset_epochs(df, {}, target=10).count() == 1

    led = OffsetVectorLedger(str(tmp_path / "led.json"))
    res = ingest_partitioned(
        spark, df, str(tmp_path / "log"), led, target=10, genesis=0
    )
    assert res["rows"] == 2 and led.start_vector() == {0: 1}


def test_duplicate_offset_cannot_mask_a_hole(spark, tmp_path):
    """[1,2,2,4]: row count equals the extent, but offset 3 is missing —
    the distinct-count check must refuse it."""
    import pytest as _pt

    from data_pipeline_spark.sources.partitioned import (
        OffsetVectorLedger,
        ingest_partitioned,
    )

    df = spark.createDataFrame(
        [(0, o, "upsert", f"k{o}", 1.0) for o in (1, 2, 2, 4)],
        "partition long, offset long, op string, url string, val double",
    ).withColumn("warc_ts", F.lit(0).cast("timestamp")).withColumn(
        "lsn", F.col("offset"))
    led = OffsetVectorLedger(str(tmp_path / "led2.json"))
    with _pt.raises(ValueError, match="holes"):
        ingest_partitioned(spark, df, str(tmp_path / "log2"), led, target=10)


def test_pure_duplicate_offsets_refused(spark, tmp_path):
    import pytest as _pt

    from data_pipeline_spark.sources.partitioned import (
        OffsetVectorLedger,
        ingest_partitioned,
    )

    df = spark.createDataFrame(
        [(0, o, "upsert", f"k{o}", 1.0) for o in (1, 2, 2, 3)],
        "partition long, offset long, op string, url string, val double",
    ).withColumn("warc_ts", F.lit(0).cast("timestamp")).withColumn(
        "lsn", F.col("offset"))
    led = OffsetVectorLedger(str(tmp_path / "led3.json"))
    with _pt.raises(ValueError, match="duplicated offsets"):
        ingest_partitioned(spark, df, str(tmp_path / "log3"), led, target=10)
