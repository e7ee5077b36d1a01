"""WARC (ISO 28500) segment writer / distributed reader — the container
format Common-Crawl-style crawls actually ship in.

The reference pipeline fetches pages over HTTP and lands JSON snapshots
(/root/reference/src/storage/minio_client.rs:121-143); at web scale the
bootstrap corpus instead arrives as ``.warc.gz`` segment files (one gzip
member per record, members concatenated — the Common Crawl layout, public
spec ISO 28500 / IIPC warc-specifications). This module closes that loop:

* ``segment_bytes`` / ``write_segment`` — a **deterministic** WARC writer
  (record ids derived from url+timestamp, no uuid randomness) used for
  fixtures, tests, and as an export/interchange sink.
* ``read_warc`` — a distributed reader: ``spark.read.format("binaryFile")``
  gives one row per segment file, then an Arrow-batched ``mapInPandas``
  splits each segment into records (no per-row Python — the same plumbing
  contract as ``operators/multimodal.py``). Crawl segments are sized ~1 GiB
  precisely so "one file = one task" parallelizes: 100 TB ≈ 100k segments ≈
  100k independent map tasks, zero shuffle.
* ``build_cdx`` — a CDX-style index (url, ts, digest, file, offset, length),
  the Common-Crawl random-access path: point-lookups hit ``fetch_record``
  (seek + read one gzip member) instead of rescanning segments.
* ``warc_to_change_events`` — bridge into the engine's change log
  (``sources/changelog.py``): a crawl segment becomes an epoch of url-keyed
  insert events (lsn = capture micros, so LWW replay keeps the newest
  capture per url), feeding the standard tail → dedup → MERGE path.

Digests are ``sha256:<hex>`` over the payload body (Common Crawl uses
``sha1:<base32>``; sha256-hex is kept here so the digest is reproducible in
both Spark SQL (``sha2``) and the DuckDB oracle (``sha256``) for the
``warc_ingest`` correctness contract).
"""

from __future__ import annotations

import hashlib
import os
import zlib
from datetime import datetime, timezone
from typing import Iterable, Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

WARC_VERSION = b"WARC/1.0"
CRLF = b"\r\n"

#: Schema produced by :func:`read_warc` / :func:`parse_segment_df`.
WARC_RECORD_SCHEMA = T.StructType(
    [
        T.StructField("warc_file", T.StringType()),
        T.StructField("warc_offset", T.LongType()),
        T.StructField("warc_length", T.LongType()),
        T.StructField("warc_rec", T.IntegerType()),
        T.StructField("record_type", T.StringType()),
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("http_status", T.IntegerType()),
        T.StructField("http_etag", T.StringType()),
        T.StructField("http_last_modified", T.StringType()),
        T.StructField("http_content_type", T.StringType()),
        T.StructField("payload_digest", T.StringType()),
        T.StructField("html", T.BinaryType()),
    ]
)


# ---------------------------------------------------------------------------
# writer
# ---------------------------------------------------------------------------


def _warc_date(ts: datetime) -> bytes:
    if ts.tzinfo is not None:
        ts = ts.astimezone(timezone.utc).replace(tzinfo=None)
    return ts.strftime("%Y-%m-%dT%H:%M:%SZ").encode("ascii")


def record_bytes(
    url: str,
    ts: datetime,
    payload: bytes,
    record_type: str = "response",
    http_wrap: bool = True,
    http_status: int = 200,
    digest: str | None = None,
    http_headers: dict[str, str] | None = None,
) -> bytes:
    """One uncompressed WARC record. ``http_wrap`` stores the payload as an
    HTTP response block (status line + headers + body), the shape of real
    crawl ``response`` records; the WARC payload digest covers the *body*.
    ``digest`` overrides the computed one — revisit records carry the
    ORIGINAL capture's digest over an empty block."""
    if digest is None:
        digest = hashlib.sha256(payload).hexdigest()
    if http_wrap:
        extra = b"".join(
            f"{k}: {v}".encode("latin-1") + CRLF
            for k, v in (http_headers or {}).items()
        )
        head = (
            b"HTTP/1.1 %d OK" % http_status
            + CRLF
            + b"Content-Type: text/html; charset=utf-8"
            + CRLF
            + extra
            + b"Content-Length: %d" % len(payload)
            + CRLF
            + CRLF
        )
        block = head + payload
        content_type = b"application/http; msgtype=response"
    else:
        block = payload
        content_type = b"application/octet-stream"
    # Deterministic record id (no uuid4): sha256 of url + capture time.
    rid = hashlib.sha256(url.encode("utf-8") + b"\x00" + _warc_date(ts)).hexdigest()
    headers = [
        WARC_VERSION,
        b"WARC-Type: " + record_type.encode("ascii"),
        b"WARC-Record-ID: <urn:sha256:" + rid.encode("ascii") + b">",
        b"WARC-Date: " + _warc_date(ts),
        b"WARC-Target-URI: " + url.encode("utf-8"),
        b"WARC-Payload-Digest: sha256:" + digest.encode("ascii"),
        b"Content-Type: " + content_type,
        b"Content-Length: %d" % len(block),
    ]
    return CRLF.join(headers) + CRLF + CRLF + block + CRLF + CRLF


def segment_bytes(
    records: Iterable[tuple[str, datetime, bytes]],
    compress: bool = True,
    dedup_digests: dict[str, str] | None = None,
    record_type: str = "response",
    http_wrap: bool | None = None,
) -> bytes:
    """A whole segment: records concatenated; with ``compress`` each record
    is its own gzip member (the Common Crawl ``.warc.gz`` layout — members
    are independently decompressible, which is what makes offset-addressed
    point reads and record-level splitting possible at all).

    Pass ``dedup_digests`` (digest → original url, shared/mutated across
    calls) to enable crawl-time dedup: a payload whose sha256 was already
    written becomes a payload-less ``revisit`` record carrying the same
    WARC-Payload-Digest (the Heritrix/IA identical-payload-digest profile);
    :func:`resolve_revisits` recovers bodies later via a digest equi-join."""
    wrap = http_wrap if http_wrap is not None else (record_type == "response")
    out = []
    for url, ts, payload in records:
        if dedup_digests is not None:
            digest = hashlib.sha256(payload).hexdigest()
            if digest in dedup_digests:
                raw = record_bytes(
                    url, ts, b"", record_type="revisit",
                    http_wrap=False, digest=digest,
                )
            else:
                dedup_digests[digest] = url
                raw = record_bytes(
                    url, ts, payload, record_type=record_type, http_wrap=wrap
                )
        else:
            raw = record_bytes(
                url, ts, payload, record_type=record_type, http_wrap=wrap
            )
        if compress:
            co = zlib.compressobj(6, zlib.DEFLATED, 16 + zlib.MAX_WBITS)
            # mtime is part of the gzip header; zlib's wbits+16 path writes
            # mtime=0, keeping segment bytes fully deterministic.
            raw = co.compress(raw) + co.flush()
        out.append(raw)
    return b"".join(out)


def write_segment(
    path: str, records: Iterable[tuple[str, datetime, bytes]], compress: bool = True
) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as fh:
        fh.write(segment_bytes(records, compress=compress))


# ---------------------------------------------------------------------------
# parser
# ---------------------------------------------------------------------------


def _iter_members(content: bytes) -> Iterator[tuple[int, int, bytes]]:
    """(offset, compressed_length, raw_bytes) per gzip member; a plain
    (uncompressed) segment yields itself as one pseudo-member."""
    if content[:2] != b"\x1f\x8b":
        yield 0, len(content), content
        return
    # Chunked feeding over a memoryview: the naive form decompresses
    # content[offset:] per member, and zlib hands back the whole remaining
    # tail as unused_data — two O(segment) copies per member, O(members ×
    # segment) total, which effectively hangs the parse task on a 1 GiB
    # segment with ~50k one-record members. Feeding bounded chunks caps
    # the copy per member at CHUNK bytes (memoryview slices don't copy).
    mv = memoryview(content)
    n = len(content)
    offset = 0
    CHUNK = 1 << 20
    while offset < n:
        d = zlib.decompressobj(16 + zlib.MAX_WBITS)
        out = []
        pos = offset
        consumed = 0
        try:
            while pos < n:
                chunk = mv[pos : pos + CHUNK]
                out.append(d.decompress(chunk))
                if d.eof:
                    consumed = (pos - offset) + (len(chunk) - len(d.unused_data))
                    break
                pos += len(chunk)
        except zlib.error:
            return  # corrupt member: stop at the last clean boundary
        if not d.eof or consumed <= 0:  # truncated/garbage tail
            return
        out.append(d.flush())
        yield offset, consumed, b"".join(out)
        offset += consumed


def _parse_raw_records(raw: bytes) -> Iterator[tuple[int, int, dict]]:
    """(start, length, fields) for each WARC record inside ``raw``
    (a decompressed member may legally hold several records)."""
    pos = 0
    n = len(raw)
    while pos < n:
        if raw[pos : pos + 5] != b"WARC/":
            break
        hdr_end = raw.find(CRLF + CRLF, pos)
        if hdr_end < 0:
            break
        headers: dict[str, str] = {}
        for line in raw[pos:hdr_end].split(CRLF)[1:]:
            k, _, v = line.partition(b":")
            headers[k.strip().lower().decode("latin-1", "replace")] = v.strip().decode(
                "utf-8", "replace"
            )
        try:
            clen = int(headers.get("content-length", "0"))
        except ValueError:
            # unframeable record: without a length the rest of this slice
            # can't be delimited — stop here rather than mis-frame it
            break
        block_start = hdr_end + 4
        block = raw[block_start : block_start + clen]
        end = block_start + clen
        # consume the record separator (two CRLFs)
        while raw[end : end + 2] == CRLF:
            end += 2
        yield pos, end - pos, {"headers": headers, "block": block}
        pos = end


def _strip_http(
    block: bytes, content_type: str
) -> tuple[int | None, dict[str, str], bytes]:
    """For ``application/http`` blocks: (status, headers, body). Others
    pass through with empty headers. Header names lowercase; the ones the
    crawl loop needs (etag, last-modified, content-type) surface as record
    columns — conditional-GET validators for the next fetch round."""
    if "application/http" not in content_type:
        return None, {}, block
    sep = block.find(CRLF + CRLF)
    if sep < 0 or not block[:5] == b"HTTP/":
        return None, {}, block
    lines = block[:sep].split(CRLF)
    status_line = lines[0].split(b" ")
    # lenient like the rest of the parser: 'HTTP/1.1  200' (double space)
    # or a garbage token must not kill the whole segment's parse task
    status = None
    if len(status_line) > 1:
        try:
            status = int(status_line[1])
        except ValueError:
            status = None
    headers: dict[str, str] = {}
    for line in lines[1:]:
        k, _, v = line.partition(b":")
        headers[k.strip().lower().decode("latin-1")] = v.strip().decode(
            "latin-1", "replace"
        )
    return status, headers, block[sep + 4 :]


def _warc_ts(ts_raw: str) -> datetime:
    """Lenient WARC-Date: WARC 1.1 allows fractional seconds (warcio,
    browsertrix, wget2 emit them); anything unparseable becomes the epoch
    rather than killing a whole 1 GiB segment's parse task — visible in
    the data, never fatal."""
    for fmt in ("%Y-%m-%dT%H:%M:%SZ", "%Y-%m-%dT%H:%M:%S.%fZ"):
        try:
            return datetime.strptime(ts_raw, fmt)
        except ValueError:
            continue
    return datetime(1970, 1, 1)


def iter_records(content: bytes, warc_file: str) -> Iterator[dict]:
    """Parse one segment's bytes into record dicts matching
    :data:`WARC_RECORD_SCHEMA`. Offsets/lengths address the *stored* bytes
    (the gzip member for ``.warc.gz``), i.e. exactly what a CDX row needs
    for a later ranged fetch. ``warc_rec`` is the record's index WITHIN
    that stored slice: a member gzipped with several records (whole-file
    gzip happens in the wild) still point-fetches the right record."""
    for m_off, m_len, raw in _iter_members(content):
        for rec_idx, (r_start, r_len, rec) in enumerate(_parse_raw_records(raw)):
            h = rec["headers"]
            status, hh, body = _strip_http(rec["block"], h.get("content-type", ""))
            ts = _warc_ts(h.get("warc-date", "1970-01-01T00:00:00Z"))
            if m_off == 0 and m_len == len(content) and content[:2] != b"\x1f\x8b":
                off, length, idx = r_start, r_len, 0  # plain: record-addressed
            else:
                off, length, idx = m_off, m_len, rec_idx  # gzip: member-addressed
            yield {
                "warc_file": warc_file,
                "warc_offset": off,
                "warc_length": length,
                "warc_rec": idx,
                "record_type": h.get("warc-type", ""),
                "url": h.get("warc-target-uri"),
                "warc_ts": ts,
                "http_status": status,
                "http_etag": hh.get("etag"),
                "http_last_modified": hh.get("last-modified"),
                "http_content_type": hh.get("content-type"),
                "payload_digest": h.get("warc-payload-digest", "").removeprefix(
                    "sha256:"
                ),
                "html": body,
            }


# ---------------------------------------------------------------------------
# distributed read
# ---------------------------------------------------------------------------

_PD_COLS = [f.name for f in WARC_RECORD_SCHEMA.fields]


def _records_frame(rows: list[dict]) -> pd.DataFrame:
    pdf = pd.DataFrame(rows, columns=_PD_COLS)
    if not len(pdf):
        pdf = pdf.astype(
            {"warc_offset": "int64", "warc_length": "int64",
             "warc_rec": "int32", "http_status": "Int64"}
        )
    else:
        pdf["http_status"] = pdf["http_status"].astype("Int64")
    return pdf


def parse_segment_df(binary_df: DataFrame) -> DataFrame:
    """Split (path, content) rows into WARC records. Arrow-batched
    ``mapInPandas``; partition-preserving (no shuffle) — each task parses
    the segments it was handed."""

    def split(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[dict] = []
            for path, content in zip(pdf["path"], pdf["content"]):
                fname = str(path).rsplit("/", 1)[-1]
                rows.extend(iter_records(bytes(content), fname))
            yield _records_frame(rows)

    return binary_df.select("path", "content").mapInPandas(
        split, schema=WARC_RECORD_SCHEMA
    )


def read_warc(spark: SparkSession, path: str, glob: str = "*.warc*") -> DataFrame:
    """Distributed WARC read: one binaryFile row per segment → record rows.

    ``binaryFile`` never splits a file, so parallelism = segment count — the
    reason crawls shard into ~1 GiB segments. At 100 TB that is ~100k
    embarrassingly-parallel tasks with no shuffle anywhere."""
    bin_df = (
        spark.read.format("binaryFile").option("pathGlobFilter", glob).load(path)
    )
    return parse_segment_df(bin_df)


# ---------------------------------------------------------------------------
# CDX index + point fetch
# ---------------------------------------------------------------------------


def build_cdx(records: DataFrame, sort: bool = True) -> DataFrame:
    """CDX-style index rows from parsed records: everything needed to fetch
    one record later without rescanning segments. Keyed by SURT (the real
    CDX key format — reversed host labels), so every page of a domain and
    its subdomains sorts adjacent: per-domain scans become contiguous
    parquet ranges that min/max file stats prune. ``sort=False`` skips the
    per-partition sort for callers that impose their own order (write_cdx
    range-partitions and re-sorts — sorting twice is pure waste)."""
    from data_pipeline_spark.functions.weburl import surt_key

    out = records.select(
        surt_key("url").alias("surt"),
        "url",
        "warc_ts",
        "payload_digest",
        "warc_file",
        "warc_offset",
        "warc_length",
        "warc_rec",
        "http_status",
        "http_etag",
        "http_last_modified",
    )
    return out.sortWithinPartitions("surt", "warc_ts") if sort else out


def write_cdx(records: DataFrame, cdx_dir: str, mode: str = "append") -> None:
    """Range-partition by SURT then sort within partitions — a total SURT
    order across output files, the layout real CDX shards use."""
    n_out = max(records.sparkSession.sparkContext.defaultParallelism // 4, 1)
    build_cdx(records, sort=False).repartitionByRange(
        n_out, "surt", "warc_ts"
    ).sortWithinPartitions("surt", "warc_ts").write.mode(mode).parquet(cdx_dir)


def fetch_record(
    segment_path: str, offset: int, length: int, rec: int = 0
) -> dict:
    """Ranged point read: seek + read one stored slice (one gzip member
    for ``.warc.gz``) and return its ``rec``-th record — a member holding
    several records (whole-file gzip) is still addressable via the CDX's
    ``warc_rec`` column. O(record slice) I/O regardless of segment or
    corpus size; works against any store with ranged reads (local file
    here; S3 GET Range on a cluster)."""
    with open(segment_path, "rb") as fh:
        fh.seek(offset)
        chunk = fh.read(length)
    recs = list(iter_records(chunk, os.path.basename(segment_path)))
    if rec >= len(recs):
        raise ValueError(
            f"no WARC record #{rec} at {segment_path}:{offset}+{length} "
            f"({len(recs)} in slice)"
        )
    out = recs[rec]
    out["warc_offset"] = offset
    out["warc_rec"] = rec
    return out


def resolve_revisits(records: DataFrame) -> DataFrame:
    """Fill revisit records' bodies from their originals: a digest
    equi-join against the distinct (digest → body) map of response records
    — never all-pairs, and AQE broadcast-converts the map side when small.
    Output keeps every response row unchanged and adds resolved revisits
    with ``revisit = true``; revisits whose original is absent from this
    corpus slice stay body-less (html null) AND keep
    ``record_type='revisit'`` — retyping them 'response' would turn them
    into null-html insert events downstream (warc_to_change_events), whose
    newer lsn LWW-overwrites the stored real body. With per-segment gzip
    dedup the original routinely lives in a PREVIOUS batch, so this is the
    common case on a live tail, not a corner.
    """
    responses = records.where(F.col("record_type") == "response").withColumn(
        "revisit", F.lit(False)
    )
    revisits = records.where(F.col("record_type") == "revisit")
    # one body per digest: originals are byte-identical by construction
    bodies = (
        responses.groupBy("payload_digest")
        .agg(F.first("html").alias("__orig_html"))
    )
    resolved = (
        revisits.join(bodies, "payload_digest", "left")
        .withColumn("html", F.col("__orig_html"))
        .withColumn(
            "record_type",
            F.when(F.col("__orig_html").isNotNull(), F.lit("response"))
            .otherwise(F.lit("revisit")),
        )
        .drop("__orig_html")
        .withColumn("revisit", F.lit(True))
    )
    return responses.unionByName(resolved.select(*responses.columns))


# ---------------------------------------------------------------------------
# change-log bridge
# ---------------------------------------------------------------------------


def warc_to_change_events(
    records: DataFrame,
    epoch: int,
    lang: str = "en",
    schema_version: int = 1,
    normalize_charset: bool = False,
) -> DataFrame:
    """Crawl records → change-log insert events (``CHANGE_COLUMNS`` shape,
    sources/changelog.py). lsn = capture-time micros, so LWW replay
    (``operators/dedup.py``) deterministically keeps the newest capture per
    url — re-crawls of the same page become updates, exactly the semantics
    of the engine's binlog tail.

    ``normalize_charset`` re-encodes page bytes to UTF-8 through the
    WHATWG sniffing decoder (``functions/charset.py``) — BOMs, declared
    legacy charsets and malformed sequences all land as clean UTF-8, the
    byte contract the downstream extractor assumes. Leave off when the
    transport already normalized (the default crawl fixtures are UTF-8 —
    the lake then preserves original bytes exactly)."""
    html = F.col("html")
    if normalize_charset:
        from data_pipeline_spark.functions.charset import decode_html

        html = F.encode(decode_html(F.col("html")), "UTF-8")
    return (
        records.where(F.col("record_type") == "response")
        .where(F.col("url").isNotNull())
        # a body-less "response" (e.g. an unresolved revisit that slipped
        # through) must never become an insert event: its newer lsn would
        # LWW-erase the stored real body at replay
        .where(F.col("html").isNotNull())
        .select(
            F.lit("I").alias("op"),
            F.col("url"),
            F.unix_micros(F.col("warc_ts")).alias("lsn"),
            F.col("warc_ts"),
            html.alias("html"),
            F.lit(lang).alias("lang"),
            F.lit(schema_version).alias("schema_version"),
            F.lit(epoch).alias("epoch"),
        )
    )


# ---------------------------------------------------------------------------
# WET derivative (extracted-text segments)
# ---------------------------------------------------------------------------


def write_wet(
    records: DataFrame,
    out_dir: str,
    text_fn=None,
    compress: bool = True,
) -> DataFrame:
    """WET export: raw captures → segments of ``conversion`` records whose
    payload is the EXTRACTED TEXT — Common Crawl's text derivative,
    regenerated from the engine's own captures with the engine's own
    byte-exact extractor (``functions/extract.py::extract_text`` by
    default; WHATWG charset handling composes via
    ``functions/charset.py`` upstream when the corpus isn't UTF-8).

    Each partition writes ONE segment file named by its partition id
    (deterministic for a deterministic partitioning) — repartition first
    to choose segment sizing. Returns the manifest (warc_file, n_records,
    n_bytes) as a DataFrame; the write happens inside the same
    Arrow-batched pass, no second job."""
    import pandas as pd

    if text_fn is None:
        from data_pipeline_spark.functions.extract import extract_text as text_fn

    os.makedirs(out_dir, exist_ok=True)
    ext = ".warc.gz" if compress else ".warc"

    def emit(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        from pyspark import TaskContext

        recs: list[tuple[str, datetime, bytes]] = []
        for pdf in batches:
            for url, ts, html in zip(pdf["url"], pdf["warc_ts"], pdf["html"]):
                text = text_fn(bytes(html).decode("utf-8", "replace"))
                recs.append(
                    (str(url), ts.to_pydatetime(), text.encode("utf-8"))
                )
        if not recs:
            yield pd.DataFrame(
                {"warc_file": pd.Series(dtype="str"),
                 "n_records": pd.Series(dtype="int64"),
                 "n_bytes": pd.Series(dtype="int64")}
            )
            return
        pid = TaskContext.get().partitionId()
        seg = segment_bytes(recs, compress=compress, record_type="conversion")
        fname = f"wet-{pid:05d}{ext}"
        with open(os.path.join(out_dir, fname), "wb") as fh:
            fh.write(seg)
        yield pd.DataFrame(
            [{"warc_file": fname, "n_records": len(recs), "n_bytes": len(seg)}]
        )

    return records.select("url", "warc_ts", "html").mapInPandas(
        emit, schema="warc_file string, n_records long, n_bytes long"
    )


def to_wat(records: DataFrame) -> DataFrame:
    """WAT derivative: per-record METADATA rows — capture envelope, HTTP
    headers, payload digest, and the page's outgoing links — mirroring
    Common Crawl's WAT files but as a typed DataFrame (write with
    ``df.write.json(...)`` for the JSON-lines layout WAT consumers
    expect; parquet for engine-internal use). One narrow map plus the
    link extraction expression — no shuffle, no Python."""
    from data_pipeline_spark.operators.webgraph import HREF_RE

    return records.select(
        "url",
        "warc_ts",
        "record_type",
        "http_status",
        "http_content_type",
        "http_etag",
        "http_last_modified",
        "payload_digest",
        F.length(F.col("html")).alias("payload_length"),
        F.regexp_extract_all(
            F.col("html").cast("string"), F.lit(HREF_RE), 1
        ).alias("links"),
    )
