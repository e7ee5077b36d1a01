"""Cost-balanced shard export (X113): assignment vs a driver-side
sequential truth, balance law, partition independence, NULL-cost guard,
physical write + manifest + consumer verify, DuckDB twin parity."""

import json

import duckdb
import pytest
import pyspark.sql.functions as F

from data_pipeline_spark.operators.export import (
    append_shards,
    assign_shards,
    export_shards,
    sql_assign_shards,
    verify_shards,
)

BUDGET = 1000


@pytest.fixture(scope="module")
def docs(spark):
    # heavy-tailed costs: mostly small docs, every 13th is 10x
    return spark.range(0, 400).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("txt"), F.col("id").cast("string")).alias("text"),
        F.when(F.col("id") % 13 == 0, 350 + (F.col("id") % 7) * 30)
        .otherwise(20 + F.col("id") % 50)
        .cast("long")
        .alias("cost"),
    )


def seq_truth(rows, budget=BUDGET):
    out, run = {}, 0
    for doc_id, cost in sorted(rows):
        out[doc_id] = run // budget
        run += cost
    return out


def test_assignment_matches_sequential_truth(spark, docs):
    got = {
        r["doc_id"]: r["shard_id"]
        for r in assign_shards(docs, "cost", BUDGET, "doc_id").collect()
    }
    rows = [(r["doc_id"], r["cost"]) for r in docs.collect()]
    assert got == seq_truth(rows)


def test_balance_law_and_partition_independence(spark, docs):
    a = assign_shards(docs, "cost", BUDGET, "doc_id", n_parts=3)
    b = assign_shards(docs.repartition(11), "cost", BUDGET, "doc_id", n_parts=7)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
    sizes = (
        a.groupBy("shard_id").agg(F.sum("cost").alias("c")).orderBy("shard_id")
    ).collect()
    max_doc = docs.agg(F.max("cost")).first()[0]
    for r in sizes[:-1]:  # every shard but the last ≈ budget ± one doc
        assert BUDGET - max_doc <= r["c"] <= BUDGET + max_doc


def test_null_cost_rejected(spark, docs):
    bad = docs.withColumn(
        "cost", F.when(F.col("doc_id") == 5, None).otherwise(F.col("cost"))
    )
    with pytest.raises(ValueError, match="NULL or negative"):
        assign_shards(bad, "cost", BUDGET, "doc_id")


def test_export_manifest_and_verify(spark, docs, tmp_path):
    out = str(tmp_path / "exp")
    m = export_shards(docs, out, "cost", "doc_id", BUDGET)
    assert m["total_rows"] == 400
    assert m["total_cost"] == docs.agg(F.sum("cost")).first()[0]
    with open(f"{out}/manifest.json") as f:
        assert json.load(f) == m
    back = spark.read.parquet(f"{out}/data")
    assert back.count() == 400
    assert back.select("shard_id").distinct().count() == len(m["shards"])
    # consumer-side integrity check: intact data -> no mismatching shards
    assert verify_shards(spark, out).count() == 0


def test_append_equals_one_pass_export(spark, docs, tmp_path):
    """Exporting old then appending new must be byte-identical (same
    shard map, same manifest totals/hashes) to exporting old ∪ new in
    one pass — the prefix sum doesn't care where the batches ended."""
    old = docs.where(F.col("doc_id") < 250)
    new = docs.where(F.col("doc_id") >= 250)
    inc_dir, one_dir = str(tmp_path / "inc"), str(tmp_path / "one")
    export_shards(old, inc_dir, "cost", "doc_id", BUDGET)
    m_inc = append_shards(new, inc_dir, epoch=1)
    m_one = export_shards(docs, one_dir, "cost", "doc_id", BUDGET)
    assert m_inc["shards"] == m_one["shards"]
    assert m_inc["total_rows"] == 400 and m_inc["total_cost"] == m_one["total_cost"]
    # the physical data agrees shard-by-shard too
    a = spark.read.parquet(f"{inc_dir}/data")
    b = spark.read.parquet(f"{one_dir}/data")
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
    assert verify_shards(spark, inc_dir).count() == 0
    # exactly-once: re-appending the committed epoch is a no-op
    m_again = append_shards(new, inc_dir, epoch=1)
    assert m_again["total_rows"] == 400
    assert verify_shards(spark, inc_dir).count() == 0
    # already-shipped files untouched: the old shards' first files remain
    # (appends add files, never rewrite)
    import glob

    assert len(glob.glob(f"{inc_dir}/data/shard_id=0/*.parquet")) >= 1


def test_curate_job_export_shards(spark, tmp_path, monkeypatch, capsys):
    """--export-shards BUDGET emits <output>_shards + manifest.json and
    the shards pass the consumer-side integrity check."""
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from jobs import curate_job

    good = (
        "This is an ordinary paragraph of english text that is long enough "
        "to pass the word count rule and it keeps a healthy mix of short "
        "and long words with the usual stopwords sprinkled in so that the "
        "filter is happy about it as well. " * 2
    ).strip()
    rows = [
        (f"https://p{i}.com/x", 100, i, good + f" tail{i}", "en")
        for i in range(12)
    ]
    src = str(tmp_path / "src")
    spark.createDataFrame(
        rows, "url string, warc_ts long, lsn long, text string, lang string"
    ).write.parquet(src)
    out_dir = str(tmp_path / "curated")
    monkeypatch.setattr("sys.argv", [
        "curate_job.py", "--input", src, "--output", out_dir,
        "--no-minhash", "--export-shards", "300",
    ])
    from pyspark.sql import SparkSession

    monkeypatch.setattr(SparkSession, "stop", lambda self: None)
    curate_job.main()
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["export_shards"] >= 2
    assert verify_shards(spark, out_dir + "_shards").count() == 0
    with open(f"{out_dir}_shards/manifest.json") as f:
        m = json.load(f)
    assert m["total_rows"] == stats["output_rows"]


def test_curate_job_as_of_pins_corpus_version(spark, tmp_path, monkeypatch, capsys):
    """--from-lake --as-of TAG curates the table as of a pinned
    snapshot: a training run re-launched later (after more crawls
    landed) sees the identical corpus."""
    import os
    import sys

    import pyspark.sql.functions as _F

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from jobs import curate_job

    from data_pipeline_spark.lake.table import LakeTable

    good = (
        "This is an ordinary paragraph of english text that is long enough "
        "to pass the word count rule and it keeps a healthy mix of short "
        "and long words with the usual stopwords sprinkled in so that the "
        "filter is happy about it as well. " * 2
    ).strip()

    def staged(rows):
        return spark.createDataFrame(
            [(u, ts, op, lsn, good + " " + tail, "en")
             for (u, ts, op, lsn, tail) in rows],
            "url string, warc_ts timestamp, op string, lsn long, "
            "text string, lang string",
        ).withColumn("warc_ts", _F.lit("2026-01-01 00:00:00").cast("timestamp"))

    tdir = str(tmp_path / "t")
    t = LakeTable.create(
        spark, tdir,
        staged([]).drop("op", "lsn").schema, key_col="url", n_buckets=2,
    )
    t.merge(staged([(f"https://a{i}.com/x", None, "upsert", i, f"v1-{i}")
                    for i in range(4)]), epoch=0)
    t.tag("training-v1")
    t.merge(staged([(f"https://b{i}.com/x", None, "upsert", 10 + i, f"v2-{i}")
                    for i in range(3)]), epoch=1)
    assert t.read().count() == 7

    out_dir = str(tmp_path / "curated")
    monkeypatch.setattr("sys.argv", [
        "curate_job.py", "--input", tdir, "--from-lake",
        "--as-of", "training-v1", "--output", out_dir, "--no-minhash",
    ])
    from pyspark.sql import SparkSession

    monkeypatch.setattr(SparkSession, "stop", lambda self: None)
    curate_job.main()
    urls = {r["url"] for r in spark.read.parquet(out_dir).collect()}
    assert urls == {f"https://a{i}.com/x" for i in range(4)}


def test_duckdb_twin_parity(spark, docs):
    got = sorted(
        map(
            tuple,
            assign_shards(docs, "cost", BUDGET, "doc_id")
            .select("doc_id", "shard_id")
            .collect(),
        )
    )
    con = duckdb.connect()
    con.register("t", docs.toPandas())
    want = sorted(
        map(
            tuple,
            con.sql(
                sql_assign_shards("t", "cost", BUDGET, "doc_id", select="doc_id")
            ).fetchall(),
        )
    )
    assert got == want


def test_append_crash_recovery_no_duplicates(spark, docs, tmp_path):
    """A crash between the data move and the manifest commit must not
    double-append on retry: the epoch sweep + deterministic staged file
    names make the redo idempotent."""
    import json as _json

    old = docs.where(F.col("doc_id") < 250)
    new = docs.where(F.col("doc_id") >= 250)
    out = str(tmp_path / "e")
    export_shards(old, out, "cost", "doc_id", BUDGET)
    append_shards(new, out, epoch=3)
    # simulate the crash: files moved, manifest commit lost — roll the
    # manifest back to its pre-append state
    with open(f"{out}/manifest.json") as f:
        m = _json.load(f)
    pre = export_shards(old, str(tmp_path / "ref"), "cost", "doc_id", BUDGET)
    with open(f"{out}/manifest.json", "w") as f:
        _json.dump(pre, f)
    m2 = append_shards(new, out, epoch=3)  # the nightly retry
    assert m2["shards"] == m["shards"] and m2["total_rows"] == 400
    assert spark.read.parquet(f"{out}/data").count() == 400  # no dupes
    assert verify_shards(spark, out).count() == 0


def test_json_export_verify_types(spark, tmp_path):
    """fmt=json: verify_shards must hash with the WRITTEN types (the
    manifest's schema), not inference — a timestamp round-tripped
    through JSON re-infers as string and would hash differently."""
    df = spark.range(0, 50).select(
        F.col("id").alias("doc_id"),
        F.lit("2026-02-01 10:00:00").cast("timestamp").alias("warc_ts"),
        (F.col("id") % 7 + 10).cast("long").alias("cost"),
    )
    out = str(tmp_path / "j")
    export_shards(df, out, "cost", "doc_id", 100, fmt="json")
    assert verify_shards(spark, out).count() == 0


def test_export_write_cols_hides_scratch(spark, docs, tmp_path):
    out = str(tmp_path / "w")
    m = export_shards(
        docs, out, "cost", "doc_id", BUDGET, write_cols=["doc_id", "text"]
    )
    back = spark.read.parquet(f"{out}/data")
    assert set(back.columns) == {"doc_id", "text", "shard_id"}
    assert m["hash_cols"] == ["doc_id", "text"]
    assert verify_shards(spark, out).count() == 0
    import pytest as _pytest

    with _pytest.raises(ValueError, match="hash_cols"):
        export_shards(docs, str(tmp_path / "x"), "cost", "doc_id", BUDGET,
                      write_cols=["doc_id"], hash_cols=["cost"])


def test_maintenance_job_verify_export(spark, docs, tmp_path, monkeypatch, capsys):
    """--verify-export: green on an intact export; non-zero exit naming
    the corrupted shards after tampering."""
    import glob
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from jobs import maintenance_job

    out = str(tmp_path / "exp")
    export_shards(docs, out, "cost", "doc_id", BUDGET)
    from pyspark.sql import SparkSession

    monkeypatch.setattr(SparkSession, "stop", lambda self: None)
    monkeypatch.setattr("sys.argv", [
        "maintenance_job.py", "--verify-export", out,
    ])
    maintenance_job.main()
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["export_verified"] is True and stats["export_bad_shards"] == []
    victim = sorted(glob.glob(f"{out}/data/shard_id=2/*.parquet"))[0]
    os.remove(victim)
    monkeypatch.setattr("sys.argv", [
        "maintenance_job.py", "--verify-export", out,
    ])
    with pytest.raises(SystemExit) as e:
        maintenance_job.main()
    assert e.value.code == 3
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert 2 in stats["export_bad_shards"]
