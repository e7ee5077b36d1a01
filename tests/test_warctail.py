"""Streaming WARC tail (streaming/warctail.py + the warc stream source):
landing-zone segments stream into the lake with LWW semantics and
exactly-once micro-batches across restarts."""

from datetime import datetime

import pytest

from data_pipeline_spark.plans.registry import SchemaRegistry
from data_pipeline_spark.sources.warc import write_segment
from data_pipeline_spark.streaming.runner import make_table_for_log
from data_pipeline_spark.streaming.warctail import WarcTailer


def _pages(n, start, base_min=0, body=None):
    return [
        (
            f"https://t.org/p/{i % 4}",
            datetime(2024, 6, 1, 0, base_min + i),
            (body or f"<html>cap {i}</html>").encode(),
        )
        for i in range(start, start + n)
    ]


def test_warc_stream_tail_lww_and_exactly_once(spark, tmp_path):
    land = tmp_path / "landing"
    write_segment(str(land / "seg-000.warc.gz"), _pages(4, 0))
    write_segment(str(land / "seg-001.warc.gz"), _pages(4, 4, base_min=10))

    reg = SchemaRegistry()
    table = make_table_for_log(spark, str(tmp_path / "t"), reg, n_buckets=4)
    tailer = WarcTailer(spark, str(land), table, str(tmp_path / "cp"), reg)
    m1 = tailer.run_available()
    assert m1 and not any(x.get("skipped") for x in m1)

    got = {r["url"]: r["warc_ts"] for r in table.read().select("url", "warc_ts").collect()}
    assert len(got) == 4
    # LWW: segment 1's later captures won
    assert got["https://t.org/p/0"].minute == 14

    # a new segment lands (lexicographically later) with fresh re-crawls
    write_segment(str(land / "seg-002.warc.gz"), _pages(4, 8, base_min=30))
    tailer2 = WarcTailer(spark, str(land), table, str(tmp_path / "cp"), reg)
    tailer2.run_available()
    got2 = {r["url"]: r["warc_ts"] for r in table.read().select("url", "warc_ts").collect()}
    assert got2["https://t.org/p/0"].minute == 38

    # full restart from the same checkpoint: nothing new → no-op
    n_snapshots = len(table.history())
    tailer3 = WarcTailer(spark, str(land), table, str(tmp_path / "cp"), reg)
    m3 = tailer3.run_available()
    assert all(x.get("skipped") for x in m3) or not m3
    assert len(table.history()) == n_snapshots


def test_warc_stream_tail_resolves_revisits(spark, tmp_path):
    from data_pipeline_spark.sources.warc import segment_bytes

    land = tmp_path / "landing"
    land.mkdir()
    seen = {}
    pages = [
        ("https://t.org/a", datetime(2024, 6, 1, 0, 0), b"<html>same</html>"),
        ("https://t.org/b", datetime(2024, 6, 1, 0, 1), b"<html>same</html>"),
    ]
    (land / "seg-000.warc.gz").write_bytes(segment_bytes(pages, dedup_digests=seen))

    reg = SchemaRegistry()
    table = make_table_for_log(spark, str(tmp_path / "t"), reg, n_buckets=2)
    WarcTailer(
        spark, str(land), table, str(tmp_path / "cp"), reg, revisits=True
    ).run_available()
    rows = {r["url"]: r["text"] for r in table.read().select("url", "text").collect()}
    assert set(rows) == {"https://t.org/a", "https://t.org/b"}
    assert rows["https://t.org/b"] == rows["https://t.org/a"]  # body recovered


def test_crawl_tail_job_inprocess(spark, tmp_path, monkeypatch):
    """jobs/crawl_tail_job.py end-to-end: drain, land more, drain again."""
    import importlib.util
    import sys

    from pyspark.sql import SparkSession

    from data_pipeline_spark.lake.table import LakeTable

    monkeypatch.setattr(SparkSession, "stop", lambda self: None)

    land = tmp_path / "landing"
    write_segment(str(land / "seg-000.warc.gz"), _pages(4, 0))

    spec = importlib.util.spec_from_file_location(
        "ctj", __file__.rsplit("/tests/", 1)[0] + "/jobs/crawl_tail_job.py"
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)

    def run():
        old = sys.argv
        sys.argv = [
            "crawl_tail_job.py", "--warc-dir", str(land),
            "--table-dir", str(tmp_path / "t"),
            "--checkpoint-dir", str(tmp_path / "cp"), "--n-buckets", "4",
        ]
        try:
            m.main()
        finally:
            sys.argv = old

    run()
    t = LakeTable.load(spark, str(tmp_path / "t"))
    assert t.read().count() == 4

    write_segment(str(land / "seg-001.warc.gz"), _pages(4, 4, base_min=30))
    run()
    t = LakeTable.load(spark, str(tmp_path / "t"))
    got = {r["url"]: r["warc_ts"].minute for r in t.read().select("url", "warc_ts").collect()}
    assert got["https://t.org/p/0"] == 34  # re-crawl won
