"""Z-order clustering (lake/zorder.py + compact(cluster_strategy="zorder")).

Pins: (1) the Spark Morton interleave against a Python twin; (2) the actual
skipping claim — after Z-order compaction the parquet row-group min/max of
BOTH clustered columns cover small slices of the full range, while a linear
sort leaves the second column's spans near-full-range; (3) physical-only
invariance and range-read correctness; (4) string/null handling.
"""

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
from data_pipeline_spark.lake.zorder import interleave_bits, zorder_expr

SCHEMA = StructType([
    StructField("url", StringType()),
    StructField("warc_ts", TimestampType()),
    StructField("score", DoubleType()),
])


def _interleave_py(vals, bits):
    z = 0
    for i in range(bits):
        for j, v in enumerate(vals):
            z |= ((v >> i) & 1) << (i * len(vals) + j)
    return z


def test_interleave_matches_python_twin(spark):
    rows = [(0, 0), (1, 0), (0, 1), (3, 5), (65535, 65535), (12345, 54321)]
    df = spark.createDataFrame(rows, "a long, b long")
    got = df.select(
        interleave_bits([F.col("a"), F.col("b")], 16).alias("z")
    ).collect()
    for r, (a, b) in zip(got, rows):
        assert r["z"] == _interleave_py([a, b], 16), (a, b)


def test_interleave_random_sweep_two_and_three_cols(spark):
    """Seeded randomized parity sweep, incl. the 3-column x 16-bit layout
    (48 output bits — the widest supported) in one Spark job per arity."""
    import random

    rng = random.Random(1234)
    rows2 = [(rng.randrange(65536), rng.randrange(65536)) for _ in range(300)]
    got2 = spark.createDataFrame(rows2, "a long, b long").select(
        "a", "b", interleave_bits([F.col("a"), F.col("b")], 16).alias("z")
    ).collect()
    for r in got2:
        assert r["z"] == _interleave_py([r["a"], r["b"]], 16)
    rows3 = [tuple(rng.randrange(65536) for _ in range(3)) for _ in range(300)]
    got3 = spark.createDataFrame(rows3, "a long, b long, c long").select(
        "a", "b", "c",
        interleave_bits([F.col("a"), F.col("b"), F.col("c")], 16).alias("z"),
    ).collect()
    for r in got3:
        assert r["z"] == _interleave_py([r["a"], r["b"], r["c"]], 16)
        assert 0 <= r["z"] < (1 << 48)


def test_zorder_expr_scales_and_handles_nulls_strings(spark):
    df = spark.createDataFrame(
        [("aaa", 0.0), ("zzz", 100.0), (None, 50.0), ("mmm", None)],
        "s string, v double",
    )
    out = df.select("s", "v", zorder_expr(df, ["s", "v"]).alias("z")).collect()
    zs = {(r["s"], r["v"]): r["z"] for r in out}
    # min corner -> 0 bits from both dims; max corner -> all bits set.
    assert zs[("aaa", 0.0)] == 0
    assert zs[("zzz", 100.0)] == _interleave_py([65535, 65535], 16)
    # nulls quantize to 0 on their dimension only.
    assert zs[(None, 50.0)] == zs[(None, 50.0)] & _interleave_py([0, 65535], 16)


def test_zorder_rejects_bad_input(spark):
    df = spark.createDataFrame([(1.0,)], "v double")
    with pytest.raises(ValueError, match="not in frame"):
        zorder_expr(df, ["nope"])
    with pytest.raises(ValueError, match="overflows"):
        zorder_expr(df, ["v"], bits=63)


def test_compact_zorder_without_cluster_by_raises(spark, tmp_path):
    tbl = _mk_table(spark, str(tmp_path / "noz"))
    _seed(spark, tbl, n=20)
    # Must not silently key-sort while the caller believes it Z-ordered.
    with pytest.raises(ValueError, match="requires cluster_by"):
        tbl.compact(cluster_strategy="zorder")


def _mk_table(spark, path):
    return LakeTable.create(
        spark, path, SCHEMA, key_col="url", n_buckets=1, order_col="warc_ts",
        stats_cols=["warc_ts", "score"],
    )


def _seed(spark, tbl, n=8000):
    # Two independent dimensions: ts walks one permutation, score another —
    # no single-column sort can make both locally dense.
    rows = [
        (f"u{i:05d}", (i * 2654435761) % 100000,
         float((i * 40503) % 10000), "upsert")
        for i in range(n)
    ]
    df = spark.createDataFrame(rows, "url string, sec long, score double, op string")
    staged = df.select(
        "url", F.timestamp_seconds("sec").alias("warc_ts"), "score", "op",
        F.col("sec").alias("lsn"),
    )
    tbl.merge(staged, epoch=0)


def _rg_spans(table_path, files, col):
    """Per-row-group (max-min)/full_range for ``col``, across files."""
    mins, maxs = [], []
    for f in files:
        md = pq.ParquetFile(os.path.join(table_path, f["path"])).metadata
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
        ci = idx[col]
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(ci).statistics
            if st is not None and st.has_min_max:
                mins.append(st.min)
                maxs.append(st.max)
    full = max(maxs) - min(mins)
    full = full.total_seconds() if hasattr(full, "total_seconds") else full
    spans = []
    for mn, mx in zip(mins, maxs):
        d = mx - mn
        spans.append(d.total_seconds() if hasattr(d, "total_seconds") else d)
    return [s / full for s in spans] if full else spans


@pytest.fixture(scope="module")
def small_rowgroups(spark):
    """Force several row groups per data file (the skipping granularity)."""
    prev = spark.conf.get("spark.sql.parquet.outputTimestampType", None)
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    hc = spark._jsc.hadoopConfiguration()
    hc.setInt("parquet.block.size", 16 * 1024)
    hc.setInt("parquet.page.size", 4 * 1024)
    yield
    hc.setInt("parquet.block.size", 128 * 1024 * 1024)
    hc.setInt("parquet.page.size", 1024 * 1024)
    if prev:
        spark.conf.set("spark.sql.parquet.outputTimestampType", prev)
    else:
        spark.conf.unset("spark.sql.parquet.outputTimestampType")


def test_zorder_tightens_both_dims_linear_only_leading(
    spark, tmp_path, small_rowgroups
):
    lin, zo = _mk_table(spark, str(tmp_path / "lin")), _mk_table(
        spark, str(tmp_path / "zo")
    )
    _seed(spark, lin, n=40000)
    _seed(spark, zo, n=40000)
    lin.compact(cluster_by=["warc_ts", "score"])
    zo.compact(cluster_by=["warc_ts", "score"], cluster_strategy="zorder")
    assert zo.snapshot()["summary"]["cluster-strategy"] == "zorder"

    lin_files = lin.files_of(lin.snapshot())
    zo_files = zo.files_of(zo.snapshot())
    lin_ts = _rg_spans(lin.path, lin_files, "warc_ts")
    lin_sc = _rg_spans(lin.path, lin_files, "score")
    zo_ts = _rg_spans(zo.path, zo_files, "warc_ts")
    zo_sc = _rg_spans(zo.path, zo_files, "score")
    # The claim is about intra-file clustering: need multi-group files.
    assert len(lin_ts) > len(lin_files) and len(zo_ts) > len(zo_files)

    mean = lambda xs: sum(xs) / len(xs)  # noqa: E731
    # Linear: leading dim tight, second dim useless (near-full-range).
    assert mean(lin_sc) > 2 * mean(lin_ts)
    assert mean(lin_sc) > 0.6
    # Z-order: BOTH dims cover a fraction of the range per row group —
    # the second dimension's stats become usable for skipping.
    assert mean(zo_sc) < 0.7 * mean(lin_sc)
    assert mean(zo_ts) < 0.8
    # and each z-ordered dim individually beats linear's second dim.
    assert max(mean(zo_ts), mean(zo_sc)) < mean(lin_sc)


def test_zorder_is_physical_only_and_range_reads_exact(
    spark, tmp_path, small_rowgroups
):
    tbl = _mk_table(spark, str(tmp_path / "t"))
    _seed(spark, tbl, n=2000)
    before = {
        r["url"]: (r["warc_ts"], r["score"]) for r in tbl.read().collect()
    }
    tbl.compact(cluster_by=["warc_ts", "score"], cluster_strategy="zorder")
    after = {
        r["url"]: (r["warc_ts"], r["score"]) for r in tbl.read().collect()
    }
    assert after == before
    got = tbl.read(range_filters={"score": (1000.0, 3000.0)}).count()
    want = tbl.read().where(F.col("score").between(1000.0, 3000.0)).count()
    assert got == want > 0
