"""Per-file column statistics + range-filter file pruning (Iceberg column
stats analog): time-range scans over a CDC lake must touch only the files
whose recorded min/max overlaps the range, with a row-level twin so
conservative keeps never leak rows."""

import datetime as dt

import pyspark.sql.functions as F

from data_pipeline_spark.lake.table import LakeTable, _stat_json


def _mk_table(spark, path, stats_cols=("v",)):
    return LakeTable.create(
        spark, path,
        spark.createDataFrame([], "url string, v long, note string").schema,
        key_col="url", n_buckets=2, stats_cols=list(stats_cols),
    )


def _staged(spark, epoch, lo, hi):
    rows = [
        (f"https://e{epoch}.example/{i}", v, f"n{v}", "upsert", v)
        for i, v in enumerate(range(lo, hi))
    ]
    return spark.createDataFrame(
        rows, "url string, v long, note string, op string, lsn long"
    )


def test_range_scan_prunes_disjoint_epochs(spark, tmp_path):
    table = _mk_table(spark, str(tmp_path / "t"))
    assert table.meta["stats_cols"] == ["v"]
    # Three MoR commits with disjoint v-ranges.
    for e, (lo, hi) in enumerate([(0, 100), (100, 200), (200, 300)]):
        table.merge(_staged(spark, e, lo, hi), epoch=e, mode="mor", ts_col="v")
    files = table.files_of(table._current_snapshot())
    assert all("stats" in f and "v" in f["stats"] for f in files)

    full = table.read()
    mid = table.read(range_filters={"v": (120, 180)})
    # Only the middle epoch's files are scanned.
    assert 0 < len(mid.inputFiles()) < len(full.inputFiles())
    mid_epochs = {p.split("commit-")[1].split("/")[0] for p in mid.inputFiles()}
    assert len(mid_epochs) == 1
    # Values match a full-scan filter exactly (row-level twin applied).
    want = sorted(r["v"] for r in full.where(F.col("v").between(120, 180)).collect())
    assert sorted(r["v"] for r in mid.collect()) == want
    # Open bounds work; disjoint range prunes everything.
    assert table.read(range_filters={"v": (250, None)}).count() == 50
    assert table.read(range_filters={"v": (1000, None)}).inputFiles() == []


def test_timestamp_stats_prune(spark, tmp_path):
    """The default CDC shape: order col is a timestamp; range_filters takes
    datetime bounds and prunes epochs outside the window."""
    table = LakeTable.create(
        spark, str(tmp_path / "ts"),
        spark.createDataFrame([], "url string, warc_ts timestamp").schema,
        key_col="url", n_buckets=2,
    )
    assert table.meta["stats_cols"] == ["warc_ts"]
    base = dt.datetime(2026, 1, 1)
    for e in range(3):
        rows = [
            (f"https://e{e}.x/{i}", base + dt.timedelta(days=e * 10 + i), "upsert", e * 100 + i)
            for i in range(5)
        ]
        staged = spark.createDataFrame(
            rows, "url string, warc_ts timestamp, op string, lsn long"
        )
        table.merge(staged, epoch=e, mode="mor")
    window = (base + dt.timedelta(days=10), base + dt.timedelta(days=14))
    got = table.read(range_filters={"warc_ts": window})
    assert got.count() == 5
    assert len(got.inputFiles()) < len(table.read().inputFiles())


def test_files_without_stats_are_kept(spark, tmp_path):
    """Back-compat: manifest records lacking 'stats' are conservatively
    scanned — the row-level filter still gives correct results."""
    table = _mk_table(spark, str(tmp_path / "nostats"))
    table.merge(_staged(spark, 0, 0, 50), epoch=0, mode="mor", ts_col="v")
    # Simulate pre-stats files by stripping the stats records.
    files = table.files_of(table._current_snapshot())
    stripped = [{k: v for k, v in f.items() if k != "stats"} for f in files]
    table._commit(stripped, {"operation": "strip-stats-test"})
    got = table.read(range_filters={"v": (10, 20)})
    assert len(got.inputFiles()) == len(files)  # nothing pruned
    assert sorted(r["v"] for r in got.collect()) == list(range(10, 21))


def test_stats_cols_opt_out_and_stat_json(spark, tmp_path):
    table = _mk_table(spark, str(tmp_path / "optout"), stats_cols=[])
    table.merge(_staged(spark, 0, 0, 10), epoch=0, mode="mor", ts_col="v")
    assert all(
        "stats" not in f for f in table.files_of(table._current_snapshot())
    )
    assert _stat_json(None) is None
    assert _stat_json("abc") == "abc"
    assert _stat_json(7) == 7
    naive = dt.datetime(2026, 1, 1, 0, 0, 0)
    aware = naive.replace(tzinfo=dt.timezone.utc)
    assert _stat_json(naive) == _stat_json(aware)  # one comparison space
