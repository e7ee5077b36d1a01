"""Multi-table CDC routing: per-table fan-out equals per-table filtered
replays, ledgers are independent, unknown tables dead-letter, and a
late-added route backfills from the log."""

import pyspark.sql.functions as F

from data_pipeline_spark.plans.registry import SchemaRegistry
from data_pipeline_spark.sources import changelog
from data_pipeline_spark.sources.datagen import gen_changes
from data_pipeline_spark.streaming.checkpoint import CheckpointStore
from data_pipeline_spark.streaming.multitable import MultiTableReplay, Route
from data_pipeline_spark.streaming.runner import ReplayRunner, make_table_for_log


def _routed_log(spark, tmp_path, n=900):
    ch = gen_changes(spark, n, events_per_epoch=300, seed=29)
    # discriminator: stable per-KEY (a table owns a key — events of one key
    # never hop tables), with a slice routed to an undeclared table
    h = F.pmod(F.xxhash64("url"), F.lit(10))
    ch = ch.withColumn(
        "table",
        F.when(h < 5, F.lit("pages"))
        .when(h < 9, F.lit("profiles"))
        .otherwise(F.lit("mystery")),
    )
    log_dir = str(tmp_path / "log")
    changelog.write_log(ch, log_dir)
    return log_dir


def _route(spark, tmp_path, tag):
    reg = SchemaRegistry()
    table = make_table_for_log(spark, str(tmp_path / f"t_{tag}"), reg, n_buckets=4)
    return Route(table, CheckpointStore(str(tmp_path / f"cp_{tag}")), reg)


def _single_table_truth(spark, tmp_path, log_dir, name):
    """Reference: filter the log to one table, replay single-table."""
    filt_dir = str(tmp_path / f"filt_{name}")
    df = spark.read.option("basePath", log_dir).parquet(log_dir)
    changelog.write_log(df.where(F.col("table") == name).drop("table"), filt_dir)
    reg = SchemaRegistry()
    table = make_table_for_log(spark, str(tmp_path / f"ref_{name}"), reg, n_buckets=4)
    ReplayRunner(
        spark, filt_dir, table, CheckpointStore(str(tmp_path / f"refcp_{name}")), reg
    ).run()
    return table


def _state(table):
    df = table.read()
    cols = sorted(df.columns)
    return sorted(str(tuple(r)) for r in df.select(*cols).collect())


def test_fanout_equals_per_table_replays(spark, tmp_path):
    log_dir = _routed_log(spark, tmp_path)
    routes = {
        "pages": _route(spark, tmp_path, "pages"),
        "profiles": _route(spark, tmp_path, "profiles"),
    }
    results = MultiTableReplay(
        spark, log_dir, routes, quarantine_dir=str(tmp_path / "dlq")
    ).run()

    for name in routes:
        assert _state(routes[name].table) == _state(
            _single_table_truth(spark, tmp_path, log_dir, name)
        )
    # unknown table rows dead-lettered every epoch, with provenance
    assert all(r["unrouted"] > 0 for r in results)
    dlq = spark.read.parquet(str(tmp_path / "dlq"))
    assert {r["table"] for r in dlq.select("table").distinct().collect()} == {"mystery"}
    assert {r["_reason"] for r in dlq.select("_reason").distinct().collect()} == {
        "unknown_table"
    }


def test_ledgers_independent_and_backfill_by_declaration(spark, tmp_path):
    log_dir = _routed_log(spark, tmp_path)
    pages = _route(spark, tmp_path, "p2")
    # phase 1: only pages declared
    MultiTableReplay(spark, log_dir, {"pages": pages}).run()
    want_pages = _state(pages.table)

    # phase 2: profiles declared later — pages skips everything (ledger),
    # profiles backfills the whole log
    profiles = _route(spark, tmp_path, "pr2")
    results = MultiTableReplay(
        spark, log_dir, {"pages": pages, "profiles": profiles}
    ).run()
    assert all(r["tables"]["pages"]["skipped"] for r in results)
    assert not any(r["tables"]["profiles"].get("skipped") for r in results)
    assert _state(pages.table) == want_pages
    assert _state(profiles.table) == _state(
        _single_table_truth(spark, tmp_path, log_dir, "profiles")
    )


def test_route_failure_is_isolated_and_blocks_in_order(spark, tmp_path):
    """One route's merge failure is recorded, the OTHER routes keep
    applying (per-table isolation), and the failed route is blocked for
    later epochs in the same run (in-order application) — then heals on
    the next run via its own ledger."""
    log_dir = _routed_log(spark, tmp_path)
    routes = {
        "pages": _route(spark, tmp_path, "iso_p"),
        "profiles": _route(spark, tmp_path, "iso_r"),
    }
    broken = routes["profiles"].table

    def boom(*a, **k):
        raise RuntimeError("simulated merge failure")

    orig_merge = broken.merge
    broken.merge = boom
    results = MultiTableReplay(spark, log_dir, routes).run()
    assert len(results) == 3
    assert all(not r["tables"]["pages"].get("skipped") for r in results)
    assert "error" in results[0]["tables"]["profiles"]
    assert all(
        r["tables"]["profiles"].get("reason") == "blocked_by_earlier_error"
        for r in results[1:]
    )
    assert _state(routes["pages"].table) == _state(
        _single_table_truth(spark, tmp_path, log_dir, "pages")
    )
    # heal: restore merge; the ledger replays profiles from epoch 0
    broken.merge = orig_merge
    MultiTableReplay(spark, log_dir, routes).run()
    assert _state(routes["profiles"].table) == _state(
        _single_table_truth(spark, tmp_path, log_dir, "profiles")
    )


def test_quarantine_written_once_per_epoch(spark, tmp_path):
    """Re-running over a fully checkpointed log must not re-scan and
    re-write every epoch's quarantine slice (O(log) per run) — the
    sidecar count is the done-guard and the recorded count is reused."""
    import glob
    import os

    log_dir = _routed_log(spark, tmp_path)
    routes = {
        "pages": _route(spark, tmp_path, "qg_p"),
        "profiles": _route(spark, tmp_path, "qg_r"),
    }
    dlq = str(tmp_path / "dlq")
    mtr = MultiTableReplay(spark, log_dir, routes, quarantine_dir=dlq)
    r1 = mtr.run()
    files = sorted(glob.glob(os.path.join(dlq, "epoch=*", "*.parquet")))
    assert files
    mtimes = {f: os.path.getmtime(f) for f in files}
    r2 = mtr.run()
    assert [r["unrouted"] for r in r2] == [r["unrouted"] for r in r1]
    after = {
        f: os.path.getmtime(f)
        for f in sorted(glob.glob(os.path.join(dlq, "epoch=*", "*.parquet")))
    }
    assert after == mtimes  # nothing rewritten
