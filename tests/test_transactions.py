"""Transaction-aligned epochs: no tx straddles an epoch, packing follows
commit order, the prefix sum is the distributed two-pass (no global
single-partition window), and an aligned log replays through the engine
with whole-transaction atomicity per commit."""

import pyspark.sql.functions as F

from data_pipeline_spark.sources.transactions import align_epochs, check_alignment


def _tx_changes(spark, n_tx=200, seed=5):
    """Synthetic WAL: txs of pseudo-random sizes 1..8, lsn dense in commit
    order, event row order shuffled."""
    tx = spark.range(n_tx).select(
        F.col("id").alias("tx_id"),
        (F.pmod(F.xxhash64(F.col("id") + seed), F.lit(8)) + 1).alias("n"),
    )
    ev = tx.select(
        "tx_id", F.explode(F.sequence(F.lit(1), F.col("n"))).alias("i")
    )
    # dense lsn via row_number over (tx_id, i) — test-only global window is fine
    from pyspark.sql import Window

    ev = ev.withColumn(
        "lsn", F.row_number().over(Window.orderBy("tx_id", "i")).cast("bigint")
    ).drop("i")
    # shuffle physical order
    return ev.repartition(16, "lsn")


def test_no_transaction_straddles_epochs(spark):
    ch = _tx_changes(spark)
    out = align_epochs(ch, target_events=50, num_partitions=8)
    assert out.count() == ch.count()
    assert check_alignment(out) == 0


def test_epoch_packing_follows_commit_order(spark):
    ch = _tx_changes(spark)
    out = align_epochs(ch, target_events=50, num_partitions=8)
    per_epoch = (
        out.groupBy("epoch")
        .agg(F.min("lsn").alias("lo"), F.max("lsn").alias("hi"), F.count("*").alias("n"))
        .orderBy("epoch")
        .collect()
    )
    # epochs are contiguous from 0
    assert [r["epoch"] for r in per_epoch] == list(range(len(per_epoch)))
    # commit order: a tx's commit lsn in epoch e precedes every commit in
    # e+1 — the max COMMIT lsn per epoch is increasing (event lsns of an
    # in-flight tx may dip below, commit lsns may not).
    commits = (
        out.groupBy("tx_id", "epoch").agg(F.max("lsn").alias("c"))
        .groupBy("epoch").agg(F.max("c").alias("hi_c"), F.min("c").alias("lo_c"))
        .orderBy("epoch").collect()
    )
    for a, b in zip(commits, commits[1:]):
        assert a["hi_c"] < b["lo_c"]
    # sizes hover around the target (packing, not one-tx-per-epoch)
    sizes = [r["n"] for r in per_epoch]
    assert sum(sizes[:-1]) >= 50 * (len(sizes) - 1)  # full epochs hold >= target
    assert max(sizes) <= 50 + 8  # never exceeds target by more than one tx


def test_oversized_transaction_gets_own_epoch_unsplit(spark):
    from pyspark.sql import Row

    rows = [Row(tx_id=1, lsn=i + 1) for i in range(120)]  # one giant tx
    rows += [Row(tx_id=2, lsn=121), Row(tx_id=3, lsn=122)]
    ch = spark.createDataFrame(rows)
    out = align_epochs(ch, target_events=50, num_partitions=4)
    assert check_alignment(out) == 0
    giant = out.where("tx_id = 1").select("epoch").distinct().collect()
    assert len(giant) == 1  # unsplit, even though 120 > 50


def test_aligned_log_replays_with_tx_atomic_commits(spark, tmp_path):
    """write_log + ReplayRunner accept the assigned epoch column; stopping
    after k epochs (crash simulation) leaves only WHOLE transactions
    applied — the set of txs in committed epochs never overlaps the
    remainder of the log."""
    from data_pipeline_spark.plans.registry import SchemaRegistry
    from data_pipeline_spark.sources import changelog
    from data_pipeline_spark.sources.datagen import gen_changes
    from data_pipeline_spark.streaming.checkpoint import CheckpointStore
    from data_pipeline_spark.streaming.runner import ReplayRunner, make_table_for_log

    ch = gen_changes(spark, 900, events_per_epoch=300, seed=9).drop("epoch")
    ch = ch.withColumn("tx_id", (F.col("lsn") / 6).cast("bigint"))
    aligned = align_epochs(ch, target_events=300, num_partitions=8)
    assert check_alignment(aligned) == 0
    log_dir = str(tmp_path / "log")
    changelog.write_log(aligned.drop("tx_id"), log_dir)

    reg = SchemaRegistry()
    table = make_table_for_log(spark, str(tmp_path / "table"), reg, n_buckets=4)
    runner = ReplayRunner(
        spark, log_dir, table, CheckpointStore(str(tmp_path / "cp")), reg
    )
    runner.run(max_epochs=2)  # crash after 2 commits

    applied_epochs = {r["epoch"] for r in aligned.select("epoch").distinct().collect()}
    committed = sorted(applied_epochs)[:2]
    tx_committed = {
        r["tx_id"]
        for r in aligned.where(F.col("epoch").isin(committed)).select("tx_id").distinct().collect()
    }
    tx_pending = {
        r["tx_id"]
        for r in aligned.where(~F.col("epoch").isin(committed)).select("tx_id").distinct().collect()
    }
    assert tx_committed and tx_pending
    assert not (tx_committed & tx_pending)  # no half-applied transaction


def test_bootstrap_then_tail_with_overlap(spark, tmp_path):
    """Initial-snapshot flow: snapshot (winners INCLUDING delete
    tombstones — warc_ts is out-of-order vs lsn, so tombstones are what
    keeps post-cut events with pre-delete event times from resurrecting
    deleted keys) applied as epoch 0, tail replays epochs 1+ from the
    consistent point; at-least-once redelivery WITHIN the tail changes
    nothing (global LWW); re-running the bootstrap skips via the
    ledger."""
    from data_pipeline_spark.plans.registry import SchemaRegistry
    from data_pipeline_spark.sources import changelog
    from data_pipeline_spark.sources.datagen import gen_changes
    from data_pipeline_spark.streaming.checkpoint import CheckpointStore
    from data_pipeline_spark.streaming.runner import (
        ReplayRunner,
        bootstrap_from_snapshot,
        make_table_for_log,
    )

    ch = gen_changes(spark, 600, events_per_epoch=200, seed=17)
    cut = 300  # consistent point: snapshot = LWW state of lsn < cut
    from data_pipeline_spark.operators.dedup import lww_dedup

    pre = ch.where(F.col("lsn") < cut).drop("epoch")
    snapshot = lww_dedup(pre, key_cols=("url",), order_cols=("warc_ts", "lsn"))
    assert snapshot.where("op = 'delete'").count() > 0  # tombstones in play
    # tail from the consistent point; epoch 2 redelivers a slice of epoch
    # 1 (at-least-once within the tail)
    tail = ch.where(F.col("lsn") >= cut).withColumn("epoch", F.lit(1))
    redelivered = ch.where(
        (F.col("lsn") >= cut) & (F.col("lsn") % 7 == 0)
    ).withColumn("epoch", F.lit(2))
    log_dir = str(tmp_path / "tail_log")
    changelog.write_log(tail.unionByName(redelivered), log_dir)

    reg = SchemaRegistry()
    table = make_table_for_log(spark, str(tmp_path / "t"), reg, n_buckets=4)
    cp = CheckpointStore(str(tmp_path / "cp"))
    rec = bootstrap_from_snapshot(spark, snapshot, table, cp, epoch=0)
    assert rec["bootstrap"] and not rec["skipped"]
    assert bootstrap_from_snapshot(spark, snapshot, table, cp, epoch=0)["skipped"]
    ReplayRunner(spark, log_dir, table, cp, reg).run()

    # truth: full-log replay from genesis
    full_dir = str(tmp_path / "full_log")
    changelog.write_log(ch, full_dir)
    t2 = make_table_for_log(spark, str(tmp_path / "t2"), reg, n_buckets=4)
    ReplayRunner(spark, full_dir, t2, CheckpointStore(str(tmp_path / "cp2")), reg).run()

    cols = sorted(t2.read().columns)
    got = sorted(str(tuple(r)) for r in table.read().select(*cols).collect())
    want = sorted(str(tuple(r)) for r in t2.read().select(*cols).collect())
    assert got == want


def test_align_epochs_refuses_null_keys(spark):
    """NULL tx/lsn keys would silently vanish at the routing join —
    align_epochs must fail loudly instead (callers quarantine first)."""
    import pytest as _pytest

    ch = spark.createDataFrame(
        [(1, 1), (None, 2), (2, 3)], "tx_id bigint, lsn bigint"
    )
    with _pytest.raises(ValueError, match="NULL"):
        align_epochs(ch, target_events=10, num_partitions=2)
    ch2 = spark.createDataFrame(
        [(1, 1), (2, None)], "tx_id bigint, lsn bigint"
    )
    with _pytest.raises(ValueError, match="NULL"):
        align_epochs(ch2, target_events=10, num_partitions=2)
