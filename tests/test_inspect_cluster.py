"""Metadata inspection tables (LakeTable.inspect) and clustered
compaction (compact(cluster_by=...) — the rewrite_data_files sort-order
analog), pinned down to parquet row-group statistics."""

import os

import pyarrow.parquet as pq
import pyspark.sql.functions as F
import pytest
from pyspark.sql.types import (
    DoubleType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from data_pipeline_spark.lake.table import LakeTable

SCHEMA = StructType([
    StructField("url", StringType()),
    StructField("warc_ts", TimestampType()),
    StructField("score", DoubleType()),
])


def _mk(spark, path, n_buckets=2):
    return LakeTable.create(
        spark, path, SCHEMA, key_col="url", n_buckets=n_buckets, order_col="warc_ts",
    )


def _stage(spark, rows):
    df = spark.createDataFrame(rows, "url string, sec long, score double, op string")
    return df.select(
        "url", F.timestamp_seconds("sec").alias("warc_ts"), "score", "op",
        F.col("sec").alias("lsn"),
    )


def _seed(spark, tbl, n=4000):
    # keys ordered one way, timestamps another: default key-sorted files
    # have scrambled ts within every row group
    rows = [(f"u{i:05d}", (i * 2654435761) % 100000, float(i), "upsert")
            for i in range(n)]
    tbl.merge(_stage(spark, rows), epoch=0)


def test_inspect_tables(spark, tmp_path):
    tbl = _mk(spark, str(tmp_path / "i"))
    _seed(spark, tbl, n=200)
    tbl.rescale_buckets(4)
    tbl.tag("v1")
    tbl.create_branch("audit")

    snaps = tbl.inspect("snapshots")
    assert snaps.count() == len(tbl.history())
    ops = {r["operation"] for r in snaps.collect()}
    assert "merge" in ops

    files = tbl.inspect("files")
    assert files.count() == len(tbl.files_of(tbl.snapshot()))
    r0 = files.orderBy("path").collect()[0]
    assert r0["spec_id"] == 1 and r0["rows"] > 0 and r0["key_min"] is not None
    # metadata is SQL-queryable: per-bucket file counts
    per_bucket = files.groupBy("bucket").count().collect()
    assert sum(r["count"] for r in per_bucket) == files.count()

    refs = {(r["name"], r["type"]) for r in tbl.inspect("refs").collect()}
    assert ("main", "branch") in refs and ("v1", "tag") in refs
    assert ("audit", "branch") in refs

    specs = {r["spec_id"]: (r["n_buckets"], r["is_current"])
             for r in tbl.inspect("specs").collect()}
    assert specs == {1: (2, False), 2: (4, True)}

    with pytest.raises(ValueError, match="unknown metadata table"):
        tbl.inspect("nope")


def _rg_ts_ranges(table_path, files):
    """[(min, max)] of warc_ts per row group across the snapshot's files."""
    out = []
    for f in files:
        md = pq.ParquetFile(os.path.join(table_path, f["path"])).metadata
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
        ci = idx["warc_ts"]
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(ci).statistics
            if st is not None and st.has_min_max:
                out.append((st.min, st.max))
    return out


def test_cluster_by_tightens_rowgroup_stats(spark, tmp_path):
    path = str(tmp_path / "c")
    tbl = _mk(spark, path)
    _seed(spark, tbl)
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")

    before = _state_hash(tbl)
    tbl.compact(cluster_by=["warc_ts"])
    assert _state_hash(tbl) == before  # clustering is physical only
    assert tbl.snapshot()["summary"]["cluster-by"] == "warc_ts"

    files = tbl.files_of(tbl.snapshot())
    ranges = _rg_ts_ranges(path, files)
    assert ranges, "row-group stats missing"
    # Within every clustered file, row-group ts ranges are disjoint and
    # monotone — a pushed ts predicate skips all but the covering groups.
    spans = [(mx - mn).total_seconds() if hasattr(mx - mn, "total_seconds")
             else (mx - mn) for mn, mx in ranges]
    full = max(mx for _, mx in ranges) - min(mn for mn, _ in ranges)
    full = full.total_seconds() if hasattr(full, "total_seconds") else full
    if len(ranges) > 1:
        # average group covers a small slice of the file's full range
        assert sum(spans) / len(spans) < full, (spans, full)
    # and range reads still return exactly the right rows
    lo = spark.sql("select timestamp_seconds(10000) t").collect()[0]["t"]
    hi = spark.sql("select timestamp_seconds(30000) t").collect()[0]["t"]
    got = tbl.read(range_filters={"warc_ts": (lo, hi)}).count()
    want = tbl.read().where(
        (F.col("warc_ts") >= F.lit(lo)) & (F.col("warc_ts") <= F.lit(hi))
    ).count()
    assert got == want > 0


def _state_hash(tbl):
    return {
        r["url"]: (r["warc_ts"], r["score"]) for r in tbl.read().collect()
    }


def test_cluster_by_unknown_column_raises(spark, tmp_path):
    tbl = _mk(spark, str(tmp_path / "e"))
    _seed(spark, tbl, n=50)
    with pytest.raises(ValueError, match="cluster_by"):
        tbl.compact(cluster_by=["nope"])


def test_read_as_of_timestamp(spark, tmp_path):
    """FOR SYSTEM_TIME AS OF analog: commit-time time travel."""
    import time

    tbl = _mk(spark, str(tmp_path / "asof"))
    before_any = int(time.time() * 1000) - 1
    tbl.merge(_stage(spark, [("a", 1, 1.0, "upsert")]), epoch=0)
    t1 = tbl.snapshot()["timestamp_ms"]
    time.sleep(0.01)
    tbl.merge(_stage(spark, [("a", 2, 2.0, "upsert")]), epoch=1)

    assert tbl.snapshot_as_of(before_any) is None
    assert tbl.read_as_of(before_any).count() == 0
    assert tbl.read_as_of(t1).collect()[0]["score"] == 1.0
    now = int(time.time() * 1000) + 1000
    assert tbl.read_as_of(now).collect()[0]["score"] == 2.0


def test_commit_with_retry_on_conflict(spark, tmp_path):
    """Two handles, one table: the stale handle's commit refuses, the
    retry loop refreshes and lands it; both writes survive."""
    import pytest as _pytest

    from data_pipeline_spark.lake.table import CommitConflictError

    path = str(tmp_path / "mw")
    a = _mk(spark, path)
    a.merge(_stage(spark, [("k0", 1, 0.0, "upsert")]), epoch=0)
    b = LakeTable.load(spark, path)
    # writer A advances the table; handle B is now stale
    a.merge(_stage(spark, [("k1", 2, 1.0, "upsert")]), epoch=1)
    with _pytest.raises(CommitConflictError):
        b.merge(_stage(spark, [("k2", 3, 2.0, "upsert")]), epoch=2)
    res = b.commit_with_retry(
        lambda t: t.merge(_stage(spark, [("k2", 3, 2.0, "upsert")]), epoch=2)
    )
    assert not res["skipped"]
    assert {r["url"] for r in b.read().collect()} == {"k0", "k1", "k2"}
    # retry loop re-raises after exhausting attempts on a persistent conflict
    b.meta["version"] -= 1  # simulate permanent staleness
    with _pytest.raises(CommitConflictError):
        b.commit_with_retry(
            lambda t: (
                t.meta.__setitem__("version", t.meta["version"] - 1),
                t.merge(_stage(spark, [("k3", 4, 3.0, "upsert")]), epoch=3),
            ),
            attempts=2,
        )


def test_as_of_never_resolves_branch_snapshots(spark, tmp_path):
    """Review finding: time travel must follow MAIN's lineage — staged
    (write-audit-publish) branch commits are invisible to as-of."""
    import time

    tbl = _mk(spark, str(tmp_path / "br"))
    tbl.merge(_stage(spark, [("a", 1, 1.0, "upsert")]), epoch=0)
    main_snap = tbl.snapshot()["snapshot_id"]
    tbl.create_branch("audit")
    tbl.merge(_stage(spark, [("z", 2, 66.0, "upsert")]), epoch=1, branch="audit")
    now = int(time.time() * 1000) + 1000
    snap = tbl.snapshot_as_of(now)
    assert snap["snapshot_id"] == main_snap
    assert {r["url"] for r in tbl.read_as_of(now).collect()} == {"a"}
