"""WARC segment writer / distributed reader / CDX point-fetch / changelog
bridge (sources/warc.py). The payload tier is Common-Crawl-style web pages,
and CC ships as per-record-gzipped ``.warc.gz`` segments plus a CDX index —
these tests pin the full loop: deterministic write → binaryFile+mapInPandas
parse → digest verify → CDX offset fetch (byte-identical) → change-log
bootstrap replayed into the lake via the standard runner."""

import hashlib
from datetime import datetime

import pyspark.sql.functions as F
import pytest

from data_pipeline_spark.sources import changelog, warc
from data_pipeline_spark.sources.warc import (
    build_cdx,
    fetch_record,
    iter_records,
    read_warc,
    record_bytes,
    segment_bytes,
    warc_to_change_events,
    write_segment,
)


def _pages(n, start=0, ts_base=1700000000):
    out = []
    for i in range(start, start + n):
        url = f"https://example.org/page/{i % 7}"
        ts = datetime.utcfromtimestamp(ts_base + i * 60)
        body = (f"<html><title>p{i}</title><body>word{i} " * 3 + "</body></html>").encode()
        out.append((url, ts, body))
    return out


# ---------------------------------------------------------------------------
# pure-python writer/parser round trip
# ---------------------------------------------------------------------------


def test_writer_deterministic():
    pages = _pages(5)
    assert segment_bytes(pages) == segment_bytes(pages)
    assert segment_bytes(pages, compress=False) == segment_bytes(pages, compress=False)


@pytest.mark.parametrize("compress", [True, False])
def test_roundtrip_bytes(compress):
    pages = _pages(6)
    seg = segment_bytes(pages, compress=compress)
    recs = list(iter_records(seg, "seg-0.warc"))
    assert len(recs) == 6
    for (url, ts, body), rec in zip(pages, recs):
        assert rec["url"] == url
        assert rec["warc_ts"] == ts
        assert rec["record_type"] == "response"
        assert rec["http_status"] == 200
        assert bytes(rec["html"]) == body
        assert rec["payload_digest"] == hashlib.sha256(body).hexdigest()


def test_http_wrap_optional():
    raw = record_bytes("https://x/", datetime(2024, 1, 1), b"\x00\x01bin", http_wrap=False)
    rec = next(iter_records(raw, "f"))
    assert rec["http_status"] is None
    assert bytes(rec["html"]) == b"\x00\x01bin"


def test_plain_segment_offsets_are_record_addressed():
    pages = _pages(4)
    seg = segment_bytes(pages, compress=False)
    recs = list(iter_records(seg, "f"))
    # each record's (offset, length) slice must itself re-parse to the record
    for (url, _, body), rec in zip(pages, recs):
        sl = seg[rec["warc_offset"] : rec["warc_offset"] + rec["warc_length"]]
        again = next(iter_records(sl, "f"))
        assert again["url"] == url and bytes(again["html"]) == body


# ---------------------------------------------------------------------------
# distributed read + CDX
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def warc_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("warcseg")
    write_segment(str(d / "crawl-00000.warc.gz"), _pages(8, start=0))
    write_segment(str(d / "crawl-00001.warc.gz"), _pages(8, start=8))
    write_segment(str(d / "crawl-00002.warc"), _pages(4, start=16), compress=False)
    return d


def test_read_warc_distributed(spark, warc_dir):
    df = read_warc(spark, str(warc_dir))
    rows = df.orderBy("warc_file", "warc_offset").collect()
    assert len(rows) == 20
    # digest integrity across the Arrow boundary: recompute sha256 over the
    # stored bytes and compare to the parsed WARC-Payload-Digest header
    ok = df.select(
        (F.sha2(F.col("html"), 256) == F.col("payload_digest")).alias("ok")
    ).agg(F.min("ok").alias("all_ok")).collect()[0]["all_ok"]
    assert ok is True
    # files parsed independently — three segments, no cross-file bleed
    assert df.select("warc_file").distinct().count() == 3


def test_cdx_point_fetch_byte_identical(spark, warc_dir):
    df = read_warc(spark, str(warc_dir))
    cdx = build_cdx(df).collect()
    assert len(cdx) == 20
    originals = {  # url+ts -> body from a full scan
        (r["url"], r["warc_ts"]): bytes(r["html"]) for r in df.collect()
    }
    for row in cdx:
        rec = fetch_record(
            str(warc_dir / row["warc_file"]), row["warc_offset"], row["warc_length"]
        )
        assert bytes(rec["html"]) == originals[(row["url"], row["warc_ts"])]
        assert rec["payload_digest"] == row["payload_digest"]


def test_read_warc_empty_dir(spark, tmp_path):
    (tmp_path / "empty.warc").write_bytes(b"")
    df = read_warc(spark, str(tmp_path))
    assert df.count() == 0
    assert [f.name for f in df.schema.fields] == [
        f.name for f in warc.WARC_RECORD_SCHEMA.fields
    ]


# ---------------------------------------------------------------------------
# change-log bootstrap: WARC → epochs → replay → lake
# ---------------------------------------------------------------------------


def test_warc_bootstrap_replays_into_lake(spark, warc_dir, tmp_path):
    from data_pipeline_spark.plans.registry import SchemaRegistry
    from data_pipeline_spark.streaming.checkpoint import CheckpointStore
    from data_pipeline_spark.streaming.runner import ReplayRunner, make_table_for_log

    log_dir = str(tmp_path / "log")
    recs = read_warc(spark, str(warc_dir))
    changelog.write_log(warc_to_change_events(recs, epoch=0), log_dir)

    registry = SchemaRegistry()
    table = make_table_for_log(spark, str(tmp_path / "t"), registry, n_buckets=4)
    runner = ReplayRunner(
        spark, log_dir, table, CheckpointStore(str(tmp_path / "cp")), registry
    )
    runner.run()

    # LWW oracle: newest capture per url wins (urls repeat mod 7 with
    # strictly increasing timestamps, so the winner is the max-ts capture)
    winners = {}
    for r in recs.collect():
        cur = winners.get(r["url"])
        if cur is None or r["warc_ts"] > cur["warc_ts"]:
            winners[r["url"]] = r
    got = {r["url"]: r["warc_ts"] for r in table.read().select("url", "warc_ts").collect()}
    assert got == {u: r["warc_ts"] for u, r in winners.items()}


# ---------------------------------------------------------------------------
# revisit records (crawl-time dedup)
# ---------------------------------------------------------------------------


def test_revisit_records_roundtrip(spark, tmp_path):
    from data_pipeline_spark.sources.warc import resolve_revisits

    body_a, body_b = b"<html>A</html>", b"<html>B</html>"
    pages = [
        ("https://x.org/a", datetime.utcfromtimestamp(1_700_000_000), body_a),
        ("https://x.org/b", datetime.utcfromtimestamp(1_700_000_060), body_b),
        # same payload re-crawled at a new url and a later re-crawl of /a
        ("https://x.org/mirror-a", datetime.utcfromtimestamp(1_700_000_120), body_a),
        ("https://x.org/a", datetime.utcfromtimestamp(1_700_000_180), body_a),
    ]
    seen = {}
    write_segment(str(tmp_path / "s.warc.gz"), pages, compress=True)
    # rewrite with dedup: 2 responses + 2 revisits
    seg = segment_bytes(pages, dedup_digests=seen)
    (tmp_path / "d.warc.gz").write_bytes(seg)
    recs = list(iter_records(seg, "d.warc.gz"))
    assert [r["record_type"] for r in recs] == ["response", "response", "revisit", "revisit"]
    assert bytes(recs[2]["html"]) == b""  # no payload stored
    assert recs[2]["payload_digest"] == hashlib.sha256(body_a).hexdigest()
    # deduped segment is strictly smaller
    assert len(seg) < len(segment_bytes(pages))

    df = read_warc(spark, str(tmp_path), glob="d.warc.gz")
    resolved = resolve_revisits(df)
    rows = {(r["url"], r["warc_ts"]): r for r in resolved.collect()}
    assert len(rows) == 4
    assert bytes(rows[("https://x.org/mirror-a", pages[2][1])]["html"]) == body_a
    assert rows[("https://x.org/mirror-a", pages[2][1])]["revisit"] is True
    assert bytes(rows[("https://x.org/a", pages[3][1])]["html"]) == body_a
    assert rows[("https://x.org/b", pages[1][1])]["revisit"] is False


def test_revisit_missing_original_kept_bodyless(spark, tmp_path):
    """A revisit whose original is outside this corpus slice must surface
    (html null), never silently drop."""
    from data_pipeline_spark.sources.warc import record_bytes, resolve_revisits

    rev = record_bytes(
        "https://x.org/orphan", datetime(2024, 1, 1), b"",
        record_type="revisit", http_wrap=False, digest="deadbeef" * 8,
    )
    (tmp_path / "r.warc").write_bytes(rev)
    out = resolve_revisits(read_warc(spark, str(tmp_path))).collect()
    assert len(out) == 1
    assert out[0]["url"] == "https://x.org/orphan" and out[0]["html"] is None
    # and it must STAY typed 'revisit': retyped 'response' it would become
    # a null-html insert event whose newer lsn LWW-erases the stored body
    assert out[0]["record_type"] == "revisit"


def test_unresolved_revisit_never_becomes_change_event(spark, tmp_path):
    """Cross-batch revisit (original ingested earlier, not in this slice):
    the change-log bridge must not emit a null-html insert for it."""
    from data_pipeline_spark.sources.warc import (
        record_bytes,
        resolve_revisits,
        warc_to_change_events,
    )

    rev = record_bytes(
        "https://x.org/seen-before", datetime(2024, 2, 2), b"",
        record_type="revisit", http_wrap=False, digest="feedface" * 8,
    )
    (tmp_path / "r2.warc").write_bytes(rev)
    resolved = resolve_revisits(read_warc(spark, str(tmp_path)))
    events = warc_to_change_events(resolved, epoch=0)
    assert events.count() == 0


def test_revisit_dedup_state_spans_segments(tmp_path):
    seen = {}
    seg1 = segment_bytes(_pages(3), dedup_digests=seen)
    # second segment repeats segment 1's payloads: all revisits
    seg2 = segment_bytes(_pages(3), dedup_digests=seen)
    assert all(r["record_type"] == "revisit" for r in iter_records(seg2, "s2"))
    assert len(list(iter_records(seg1, "s1"))) == 3


def test_http_validator_headers_roundtrip(spark, tmp_path):
    """ETag/Last-Modified/Content-Type from the HTTP block surface as
    record columns and ride the CDX — the conditional-GET validators."""
    raw = record_bytes(
        "https://v.org/p", datetime(2024, 3, 1), b"<html>v</html>",
        http_headers={"ETag": '"abc123"', "Last-Modified": "Sat, 01 Mar 2024 00:00:00 GMT"},
    )
    rec = next(iter_records(raw, "f"))
    assert rec["http_etag"] == '"abc123"'
    assert rec["http_last_modified"] == "Sat, 01 Mar 2024 00:00:00 GMT"
    assert rec["http_content_type"] == "text/html; charset=utf-8"
    assert bytes(rec["html"]) == b"<html>v</html>"  # body unaffected

    (tmp_path / "v.warc").write_bytes(raw)
    cdx = build_cdx(read_warc(spark, str(tmp_path))).collect()
    assert cdx[0]["http_etag"] == '"abc123"'


def test_validators_attach_to_stats(spark, tmp_path):
    from data_pipeline_spark.operators.recrawl import attach_validators, recrawl_stats

    seg = b"".join(
        record_bytes(
            "https://v.org/p", datetime(2024, 3, d), f"<p>{d}</p>".encode(),
            http_headers={"ETag": f'"v{d}"'},
        )
        for d in (1, 2)
    )
    (tmp_path / "s.warc").write_bytes(seg)
    cdx = build_cdx(read_warc(spark, str(tmp_path)))
    out = attach_validators(recrawl_stats(cdx), cdx).collect()
    assert len(out) == 1 and out[0]["etag"] == '"v2"'  # latest capture wins


# ---------------------------------------------------------------------------
# WET derivative export
# ---------------------------------------------------------------------------


def test_write_wet_roundtrip(spark, tmp_path):
    from data_pipeline_spark.functions.extract import extract_text
    from data_pipeline_spark.sources.warc import write_wet

    pages = _pages(10)
    write_segment(str(tmp_path / "raw" / "s.warc.gz"), pages)
    raw = read_warc(spark, str(tmp_path / "raw")).repartition(2)
    manifest = write_wet(raw, str(tmp_path / "wet")).collect()
    assert sum(r["n_records"] for r in manifest) == 10
    assert 1 <= len(manifest) <= 2  # one segment per non-empty partition

    wet = read_warc(spark, str(tmp_path / "wet"))
    rows = {(r["url"], r["warc_ts"]): r for r in wet.collect()}
    assert len(rows) == 10
    for url, ts, body in pages:
        rec = rows[(url, ts)]
        assert rec["record_type"] == "conversion"
        assert rec["http_status"] is None  # no HTTP wrap on conversions
        # payload is exactly the engine's extracted text
        assert bytes(rec["html"]).decode("utf-8") == extract_text(body.decode("utf-8"))


def test_write_wet_empty(spark, tmp_path):
    from data_pipeline_spark.sources.warc import write_wet

    (tmp_path / "raw").mkdir()
    (tmp_path / "raw" / "e.warc").write_bytes(b"")
    empty = read_warc(spark, str(tmp_path / "raw"))
    manifest = write_wet(empty, str(tmp_path / "wet")).collect()
    assert sum(r["n_records"] for r in manifest) == 0


def test_to_wat_metadata(spark, tmp_path):
    from data_pipeline_spark.sources.warc import to_wat

    body = (b'<html><a href="https://x.org/next">n</a>'
            b'<a href="https://y.org/other">o</a></html>')
    raw = record_bytes(
        "https://x.org/p", datetime(2024, 5, 1), body,
        http_headers={"ETag": '"w1"'},
    )
    (tmp_path / "s.warc").write_bytes(raw)
    wat = to_wat(read_warc(spark, str(tmp_path)))
    r = wat.collect()[0]
    assert r["url"] == "https://x.org/p" and r["http_etag"] == '"w1"'
    assert r["payload_length"] == len(body)
    assert list(r["links"]) == ["https://x.org/next", "https://y.org/other"]
    # JSON-lines export is the plain distributed writer
    wat.write.json(str(tmp_path / "wat"))
    back = spark.read.json(str(tmp_path / "wat"))
    assert back.count() == 1 and back.collect()[0]["payload_digest"] == r["payload_digest"]


def test_derive_job_all_three(spark, tmp_path, monkeypatch):
    """In-process jobs/derive_job.py: one pass over raw segments emits the
    CDX/WAT/WET triple, with revisits resolved into the derivatives."""
    import importlib.util
    import sys

    from pyspark.sql import SparkSession

    monkeypatch.setattr(SparkSession, "stop", lambda self: None)

    seen = {}
    write_segment(str(tmp_path / "raw" / "s0.warc.gz"), _pages(6), compress=True)
    (tmp_path / "raw" / "s1.warc.gz").write_bytes(
        segment_bytes(_pages(6, start=6), dedup_digests=seen)
    )
    argv = [
        "derive_job.py", "--warc-dir", str(tmp_path / "raw"),
        "--cdx-dir", str(tmp_path / "cdx"), "--wat-dir", str(tmp_path / "wat"),
        "--wet-dir", str(tmp_path / "wet"), "--resolve-revisits",
        "--wet-partitions", "2",
    ]
    spec = importlib.util.spec_from_file_location(
        "dj", __file__.rsplit("/tests/", 1)[0] + "/jobs/derive_job.py"
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    old = sys.argv
    sys.argv = argv
    try:
        m.main()
    finally:
        sys.argv = old

    assert spark.read.parquet(str(tmp_path / "cdx")).count() == 12
    wat = spark.read.json(str(tmp_path / "wat"))
    assert wat.count() == 12 and "links" in wat.columns
    wet = read_warc(spark, str(tmp_path / "wet"))
    assert wet.count() == 12  # revisits resolved → every capture has text
    assert wet.select("record_type").distinct().collect()[0][0] == "conversion"


def test_change_events_charset_normalization(spark, tmp_path):
    """normalize_charset: legacy-charset pages land in the change log as
    clean UTF-8 bytes with identical visible text."""
    latin = '<html><meta charset="iso-8859-1"><p>café niño</p></html>'
    utf = "<html><p>already utf-8 ß</p></html>"
    write_segment(
        str(tmp_path / "s.warc.gz"),
        [
            ("https://x.org/latin", datetime(2024, 1, 1), latin.encode("iso-8859-1")),
            ("https://x.org/utf", datetime(2024, 1, 1), utf.encode("utf-8")),
        ],
    )
    recs = read_warc(spark, str(tmp_path))
    ev = {r["url"]: bytes(r["html"]) for r in warc_to_change_events(
        recs, epoch=0, normalize_charset=True).collect()}
    assert ev["https://x.org/latin"] == latin.encode("utf-8")  # re-encoded
    assert ev["https://x.org/utf"] == utf.encode("utf-8")      # unchanged
    # without the flag, original bytes are preserved exactly
    raw = {r["url"]: bytes(r["html"]) for r in warc_to_change_events(
        recs, epoch=0).collect()}
    assert raw["https://x.org/latin"] == latin.encode("iso-8859-1")


# ---------------------------------------------------------------------------
# registered "warc" format (Python DataSource)
# ---------------------------------------------------------------------------


def test_warc_format_matches_function_path(spark, warc_dir):
    from data_pipeline_spark.sources.warc_source import register_warc_source

    register_warc_source(spark)
    via_format = spark.read.format("warc").load(str(warc_dir))
    via_fn = read_warc(spark, str(warc_dir))
    assert via_format.schema == via_fn.schema
    key = lambda r: (r["warc_file"], r["warc_offset"])  # noqa: E731
    a = sorted((tuple(r) for r in via_format.collect()), key=lambda t: (t[0], t[1]))
    b = sorted((tuple(r) for r in via_fn.collect()), key=lambda t: (t[0], t[1]))
    assert a == b
    # SQL surface: the format IS the contract
    spark.sql(
        f"CREATE OR REPLACE TEMPORARY VIEW crawl USING warc OPTIONS (path '{warc_dir}')"
    )
    assert spark.sql(
        "SELECT count(*) FROM crawl WHERE record_type = 'response'"
    ).collect()[0][0] == 20


# ---------------------------------------------------------------------------
# review fixes: whole-file gzip, lenient dates, malformed headers
# ---------------------------------------------------------------------------


def test_whole_file_gzip_member_point_fetch(spark, tmp_path):
    """A .warc.gz gzipped as ONE stream (not per-record members) is common
    in the wild: every record shares the member (offset,length) but carries
    its warc_rec index, and fetch_record(rec=...) returns the RIGHT one."""
    import zlib

    pages = _pages(5)
    raw = segment_bytes(pages, compress=False)
    co = zlib.compressobj(6, zlib.DEFLATED, 16 + zlib.MAX_WBITS)
    (tmp_path / "whole.warc.gz").write_bytes(co.compress(raw) + co.flush())

    df = read_warc(spark, str(tmp_path))
    rows = df.orderBy("warc_rec").collect()
    assert [r["warc_rec"] for r in rows] == [0, 1, 2, 3, 4]
    assert len({(r["warc_offset"], r["warc_length"]) for r in rows}) == 1
    for (url, _, body), r in zip(pages, rows):
        got = fetch_record(
            str(tmp_path / "whole.warc.gz"),
            r["warc_offset"], r["warc_length"], rec=r["warc_rec"],
        )
        assert got["url"] == url and bytes(got["html"]) == body


def test_lenient_warc_dates_and_headers(spark, tmp_path):
    """Fractional-second WARC-Date (WARC 1.1 / warcio output) parses; a
    garbage date becomes the epoch instead of killing the segment task."""
    good = record_bytes("https://x/a", datetime(2024, 1, 1), b"<p>a</p>")
    frac = good.replace(
        b"WARC-Date: 2024-01-01T00:00:00Z",
        b"WARC-Date: 2024-01-01T00:00:00.123456Z",
    )
    junk = record_bytes("https://x/b", datetime(2024, 1, 2), b"<p>b</p>").replace(
        b"WARC-Date: 2024-01-02T00:00:00Z", b"WARC-Date: not-a-date-at-all"
    )
    (tmp_path / "s.warc").write_bytes(frac + junk)
    rows = {r["url"]: r for r in read_warc(spark, str(tmp_path)).collect()}
    assert rows["https://x/a"]["warc_ts"] == datetime(2024, 1, 1, 0, 0, 0, 123456)
    assert rows["https://x/b"]["warc_ts"] == datetime(1970, 1, 1)
    assert bytes(rows["https://x/b"]["html"]) == b"<p>b</p>"
