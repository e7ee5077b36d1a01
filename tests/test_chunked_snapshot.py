"""DBLog chunked-snapshot bootstrap: lock-free chunked snapshot + live log
must converge to the same table as a consistent snapshot + full replay —
including chunks read at different points inside their watermark windows,
keys deleted mid-snapshot, and exactly-once chunk re-runs."""

import pyspark.sql.functions as F
import pytest

from data_pipeline_spark.lake.table import LakeTable
from data_pipeline_spark.sources.chunked_snapshot import (
    chunked_bootstrap,
    reconcile_chunks,
)
from data_pipeline_spark.streaming.checkpoint import CheckpointStore

SCHEMA = "url string, warc_ts timestamp, val double"


def _ts(col):
    return F.lit("2024-01-01 00:00:00").cast("timestamp") + F.make_interval(
        secs=col
    )


def _frame(spark, rows, with_op=True):
    """rows: (op, url, lsn, val); warc_ts derived from lsn."""
    ddl = "op string, url string, lsn long, val double"
    df = spark.createDataFrame(
        [(op, u, int(l), float(v)) for op, u, l, v in rows], ddl
    )
    df = df.withColumn("warc_ts", _ts(F.col("lsn")))
    return df if with_op else df.drop("op")


@pytest.fixture()
def table(spark, tmp_path):
    return LakeTable.create(
        spark, str(tmp_path / "t"),
        spark.createDataFrame([], SCHEMA).schema,
        key_col="url", n_buckets=8,
    )


def _truth_table(spark, tmp_path, base_rows, log_rows):
    t = LakeTable.create(
        spark, str(tmp_path / "truth"),
        spark.createDataFrame([], SCHEMA).schema,
        key_col="url", n_buckets=8,
    )
    t.merge(_frame(spark, base_rows), epoch=0, mode="mor")
    t.merge(_frame(spark, log_rows), epoch=1, mode="mor")
    return t


def _rows(table):
    return {
        (r["url"], round(r["val"], 6))
        for r in table.read().select("url", "val").collect()
    }


def test_kill_rule_pure(spark):
    """Survivors = chunk rows with no in-window event, stamped at lw."""
    chunks = spark.createDataFrame(
        [("u1", 1.0, 0, 10), ("u2", 2.0, 0, 10), ("u3", 3.0, 10, 20)],
        "url string, val double, lw_lsn long, hw_lsn long",
    )
    log = spark.createDataFrame(
        [("u2", 7), ("u3", 10), ("u3", 25)], "url string, lsn long"
    )  # u2 killed (7 in (0,10]); u3 NOT killed (10 not in (10,20], 25 past hw)
    out = reconcile_chunks(chunks, log, key_col="url").collect()
    got = {(r["url"], r["lsn"], r["op"]) for r in out}
    assert got == {("u1", 0, "insert"), ("u3", 10, "insert")}


def test_chunked_equals_consistent_bootstrap(spark, table, tmp_path):
    # ground truth: 30 keys, updates to every 3rd key, deletes to every
    # 10th, at lsns 1..60
    base_rows = [("insert", f"u{i}", 0, 10.0 + i) for i in range(30)]
    log_rows = []
    for i in range(0, 30, 3):
        log_rows.append(("upsert", f"u{i}", 1 + (i * 7) % 59, 100.0 + i))
    for i in range(0, 30, 10):
        log_rows.append(("delete", f"u{i}", 2 + (i * 11) % 58, 0.0))
    truth = _truth_table(spark, tmp_path, base_rows, log_rows)

    # chunked snapshot: 3 chunks by key range, windows (0,20], (20,40],
    # (40,60], each read at a different point inside its window
    log = _frame(spark, log_rows)

    def chunk(lo, hi, lw, hw, read_point):
        rows = []
        for i in range(lo, hi):
            u = f"u{i}"
            val = 10.0 + i
            dead = False
            # apply every event with lsn <= read_point, in lsn order
            evs = sorted(
                [(l, v, op) for op, uu, l, v in log_rows if uu == u
                 and l <= read_point]
            )
            for l, v, op in evs:
                if op == "delete":
                    dead = True
                else:
                    dead, val = False, v
            if dead:
                continue
            rows.append((u, val, lw, hw))
        df = spark.createDataFrame(
            rows, "url string, val double, lw_lsn long, hw_lsn long"
        )
        return df.withColumn("warc_ts", _ts(F.col("lw_lsn")))

    chunks = [
        chunk(0, 10, 0, 20, 5),     # read early in the window
        chunk(10, 20, 20, 40, 39),  # read at the very end
        chunk(20, 30, 40, 60, 50),  # mid-window
    ]
    cp = CheckpointStore(str(tmp_path / "cp"))
    res = chunked_bootstrap(spark, chunks, log, table, cp)
    assert res["applied"] == 3
    # live log replays as a normal positive epoch alongside
    table.merge(_frame(spark, log_rows), epoch=0, mode="mor")
    assert _rows(table) == _rows(truth)

    # exactly-once: re-running the bootstrap applies nothing, state holds
    res2 = chunked_bootstrap(spark, chunks, log, table, cp)
    assert res2["applied"] == 0
    assert _rows(table) == _rows(truth)


def test_bootstrap_without_log_events(spark, table, tmp_path):
    """A quiet source: every chunk row survives and the table equals the
    plain snapshot."""
    rows = [(f"u{i}", float(i), 0, 10) for i in range(8)]
    df = spark.createDataFrame(
        rows, "url string, val double, lw_lsn long, hw_lsn long"
    ).withColumn("warc_ts", _ts(F.col("lw_lsn")))
    empty_log = spark.createDataFrame([], "url string, lsn long")
    cp = CheckpointStore(str(tmp_path / "cp2"))
    chunked_bootstrap(spark, [df], empty_log, table, cp)
    assert _rows(table) == {(f"u{i}", float(i)) for i in range(8)}
