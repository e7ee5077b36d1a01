"""Shipping contract (north_rule): the job must run via
``spark-submit --py-files dist/data_pipeline_spark.zip jobs/replay_job.py``.

Spawns a real spark-submit subprocess — the engine code must be importable
from the zip alone (the repo dir is NOT on the executor path), both in the
batch epoch loop and the Structured Streaming tailer.
"""

import json
import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def submit_env(tmp_path_factory, spark):
    from data_pipeline_spark.sources import changelog
    from data_pipeline_spark.sources.datagen import gen_changes

    work = tmp_path_factory.mktemp("submit")
    log_dir = str(work / "log")
    changelog.write_log(gen_changes(spark, 3000, events_per_epoch=1000, seed=21), log_dir)
    zip_path = os.path.join(REPO, "dist", "data_pipeline_spark.zip")
    subprocess.run(
        [sys.executable, os.path.join(REPO, "jobs", "package.py")], check=True
    )
    return work, log_dir, zip_path


def _submit(args, cwd):
    spark_submit = shutil.which("spark-submit")
    if spark_submit is None:
        pytest.skip("spark-submit not on PATH")
    out = subprocess.run(
        [
            spark_submit, "--master", "local[4]",
            "--conf", "spark.sql.shuffle.partitions=4",
            "--conf", "spark.ui.enabled=false",
            "--py-files", args["zip"],
            os.path.join(REPO, "jobs", "replay_job.py"),
            "--log-dir", args["log"],
            "--table-dir", args["table"],
            "--checkpoint-dir", args["cp"],
            *args.get("extra", []),
        ],
        capture_output=True,
        text=True,
        timeout=420,
        cwd=cwd,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    last = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(last)


def test_spark_submit_batch_and_streaming(submit_env, tmp_path):
    work, log_dir, zip_path = submit_env
    # cwd OUTSIDE the repo: only the zip provides the package.
    res = _submit(
        {
            "zip": zip_path, "log": log_dir,
            "table": str(work / "t_batch"), "cp": str(work / "cp_batch"),
            "extra": ["--mode", "mor", "--compact-every", "2",
                      "--quarantine-dir", str(work / "dlq")],
        },
        cwd=str(tmp_path),
    )
    assert res["epochs_applied"] == 3
    assert res["rows_merged"] > 0
    assert res["rows_quarantined"] == 0  # clean log; flag exercised end-to-end

    res2 = _submit(
        {
            "zip": zip_path, "log": log_dir,
            "table": str(work / "t_stream"), "cp": str(work / "cp_stream"),
            "extra": ["--streaming"],
        },
        cwd=str(tmp_path),
    )
    assert res2["epochs_applied"] >= 1 and res2["rows_merged"] > 0


def test_spark_submit_curate_job(submit_env, tmp_path, spark):
    """The curation pipeline ships the same way: zip-only import, plain
    parquet in/out, one JSON stats line."""
    import pyspark.sql.functions as F

    work, _, zip_path = submit_env
    spark_submit = shutil.which("spark-submit")
    if spark_submit is None:
        pytest.skip("spark-submit not on PATH")
    src = str(work / "curate_in")
    body = " ".join(f"w{{}}x{i}" for i in range(80))
    docs = spark.range(40).select(
        F.concat(F.lit("https://WWW.Site"), (F.col("id") % 7).cast("string"),
                 F.lit(".com/p/"), F.col("id").cast("string"),
                 F.lit("?utm_source=x&a=1")).alias("url"),
        F.col("id").alias("warc_ts"),
        F.col("id").alias("lsn"),
        F.concat(
            F.lit("This is an ordinary paragraph of english text that is "
                  "long enough to pass the word count rule with the usual "
                  "stopwords in it as well and then some unique words "),
            F.expr(f"replace('{body}', '{{}}', cast(id as string))"),
        ).alias("text"),
        F.lit("en").alias("lang"),
    )
    docs.write.mode("overwrite").parquet(src)
    out_dir = str(work / "curate_out")
    res = subprocess.run(
        [
            spark_submit, "--master", "local[4]",
            "--conf", "spark.sql.shuffle.partitions=4",
            "--conf", "spark.ui.enabled=false",
            "--py-files", zip_path,
            os.path.join(REPO, "jobs", "curate_job.py"),
            "--input", src, "--output", out_dir, "--no-minhash",
            "--dedup-index", str(work / "curate_idx"),
            "--dedup-index-epoch", "0",
        ],
        capture_output=True, text=True, timeout=420, cwd=str(tmp_path),
    )
    assert res.returncode == 0, res.stderr[-2000:]
    stats = json.loads(
        [l for l in res.stdout.splitlines() if l.startswith("{")][-1]
    )
    assert stats["metric"] == "curate_stage_rows"
    assert stats["input_rows"] == 40 and stats["output_rows"] > 0
    assert stats["index_epoch"] == 0  # survivors indexed for future runs
    assert os.path.isdir(out_dir)
    from data_pipeline_spark.operators.dedup_index import MinHashDedupIndex

    idx = MinHashDedupIndex.load(spark, str(work / "curate_idx"))
    assert idx.stored_sigs().count() == stats["output_rows"]


def test_spark_submit_maintenance_job(submit_env, tmp_path, spark):
    """The maintenance runbook ships as one job: replay a log into a table
    (MoR, multi-version buckets), then compact + expire + GC — plus
    sidecar-index compaction — via spark-submit from the zip alone."""
    work, log_dir, zip_path = submit_env
    spark_submit = shutil.which("spark-submit")
    if spark_submit is None:
        pytest.skip("spark-submit not on PATH")
    table_dir = str(work / "t_maint")

    # Two-epoch sidecar indexes for the job to compact.
    from data_pipeline_spark.operators.dedup_index import MinHashDedupIndex
    from data_pipeline_spark.operators.vector_index import IVFVectorIndex

    mh_dir, vi_dir = str(work / "mh_idx"), str(work / "vi_idx")
    mh = MinHashDedupIndex.create(spark, mh_dir, num_hashes=12, bands=4)
    for e in range(2):
        mh.update(spark.createDataFrame(
            [(e * 10 + i, f"epoch {e} doc {i} words alpha beta") for i in range(3)],
            "doc_id long, text string"), epoch=e)
    vi = IVFVectorIndex.create(spark, vi_dir, dim=4, n_lists=2)
    for e in range(2):
        vi.add(spark.createDataFrame(
            [(e * 10 + i, [float(i), float(e), 1.0, 0.0]) for i in range(3)],
            "vec_id long, embedding array<double>"), epoch=e)
    _submit(
        {
            "zip": zip_path, "log": log_dir,
            "table": table_dir, "cp": str(work / "cp_maint"),
            "extra": ["--mode", "mor"],
        },
        cwd=str(tmp_path),
    )
    # Takedown path: purge one live key in the same maintenance run (purge
    # commits first, so this run's expiry+GC sweep the old files too).
    from data_pipeline_spark.lake.table import LakeTable

    victim = LakeTable.load(spark, table_dir).read().select("url").first()["url"]
    purge_file = str(work / "purge_keys.txt")
    with open(purge_file, "w", encoding="utf-8") as f:
        f.write(victim + "\n")
    res = subprocess.run(
        [
            spark_submit, "--master", "local[4]",
            "--conf", "spark.sql.shuffle.partitions=4",
            "--conf", "spark.ui.enabled=false",
            "--py-files", zip_path,
            os.path.join(REPO, "jobs", "maintenance_job.py"),
            "--table", table_dir,
            "--purge-keys", purge_file,
            "--compact", "--compact-dirty-only", "--build-blooms",
            "--expire-keep-last", "1", "--gc-orphans",
            "--gc-grace-seconds", "0",
            "--minhash-index", mh_dir, "--vector-index", vi_dir,
        ],
        capture_output=True, text=True, timeout=420, cwd=str(tmp_path),
    )
    assert res.returncode == 0, res.stderr[-2000:]
    done = json.loads(
        [l for l in res.stdout.splitlines() if l.startswith("{")][-1]
    )
    assert done["metric"] == "lake_maintenance"
    assert "compacted_buckets" in done and "expired_snapshots" in done
    assert done["blooms_built"] > 0  # post-compaction files got key blooms
    assert done["orphans_removed"] == 0  # expiry already swept dead files
    assert done["purged_keys"] == 1 and done["purge_rows_removed"] >= 1
    purged_table = LakeTable.load(spark, table_dir)
    assert purged_table.lookup(victim).count() == 0
    assert done["minhash_index_compact"]["compacted"] is True
    assert done["vector_index_compact"]["compacted"] is True
    # Compacted indexes still hold everything (ledger + state intact).
    assert MinHashDedupIndex.load(spark, mh_dir).stored_sigs().count() == 6
    assert IVFVectorIndex.load(spark, vi_dir).assigned().count() == 6


def test_spark_submit_wap_replay(submit_env, tmp_path, spark):
    """WAP from the shipped CLI: stage the replay on a branch, audit, and
    publish in one run; main serves the audited state afterwards."""
    work, log_dir, zip_path = submit_env
    table_dir = str(work / "t_wap")
    done = _submit(
        {
            "zip": zip_path, "log": log_dir,
            "table": table_dir, "cp": str(work / "cp_wap"),
            "extra": [
                "--mode", "mor", "--branch", "staging",
                "--audit-publish", "--audit-min-rows", "1",
                "--audit-max-null-frac", "url:0.0",
                "--audit-max-delete-frac", "0.9",
            ],
        },
        cwd=str(tmp_path),
    )
    assert done["epochs_applied"] > 0
    assert done["audit"]["published"] is True
    assert all(c["ok"] for c in done["audit"]["checks"])
    from data_pipeline_spark.lake.table import LakeTable

    table = LakeTable.load(spark, table_dir)
    assert table.read().count() > 0
    assert "staging" not in table.meta.get("branches", {})


def test_spark_submit_sync_job(submit_env, tmp_path):
    """Ship contract for the lake-sync job: replay a source table, then
    run sync_job twice from OUTSIDE the repo (zip-only import) — first
    refresh bootstraps the filtered view, second no-ops on the cursor."""
    work, log_dir, zip_path = submit_env
    # build the source table via the replay job
    _submit(
        {
            "zip": zip_path, "log": log_dir,
            "table": str(work / "sync_src"), "cp": str(work / "sync_cp"),
        },
        cwd=str(tmp_path),
    )
    spark_submit = shutil.which("spark-submit")
    if spark_submit is None:
        pytest.skip("spark-submit not on PATH")

    def run_sync():
        out = subprocess.run(
            [
                spark_submit, "--master", "local[4]",
                "--conf", "spark.sql.shuffle.partitions=4",
                "--conf", "spark.ui.enabled=false",
                "--py-files", zip_path,
                os.path.join(REPO, "jobs", "sync_job.py"),
                "--source-dir", str(work / "sync_src"),
                "--target-dir", str(work / "sync_view"),
                "--predicate", "lang = 'en'",
                "--select", "url,warc_ts,lang",
            ],
            capture_output=True, text=True, timeout=420, cwd=str(tmp_path),
        )
        assert out.returncode == 0, out.stderr[-2000:]
        last = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
        return json.loads(last)

    r1 = run_sync()
    assert not r1["skipped"] and r1["target_rows"] > 0
    r2 = run_sync()
    assert r2["skipped"]
    assert r2["target_rows"] == r1["target_rows"]


def test_spark_submit_changes_stream(submit_env, tmp_path, spark):
    """The streaming change-feed source works from the zip alone: the
    Python DataSource class must be importable in spark-submit's driver
    AND its data-source worker process."""
    work, _, zip_path = submit_env
    spark_submit = shutil.which("spark-submit")
    if spark_submit is None:
        pytest.skip("spark-submit not on PATH")
    from data_pipeline_spark.lake.table import LakeTable

    table_dir = str(work / "t_stream_src")
    t = LakeTable.create(
        spark, table_dir,
        spark.createDataFrame([], "url string, v long").schema,
        key_col="url", n_buckets=2,
    )
    for e in range(2):
        staged = spark.createDataFrame(
            [(f"https://s{e}.com/{i}", e * 10 + i, "upsert", e * 10 + i)
             for i in range(5)],
            "url string, v long, op string, lsn long",
        )
        t.merge(staged, epoch=e, mode="mor", ts_col="v")

    script = tmp_path / "drain_stream.py"
    script.write_text(
        """
import json, sys
from pyspark.sql import SparkSession
from data_pipeline_spark.lake.cdf_stream import register_changes_source

spark = SparkSession.builder.getOrCreate()
register_changes_source(spark)
seen = []
def collect(df, bid):
    seen.extend(df.collect())
q = (spark.readStream.format("icelite_changes")
     .option("path", sys.argv[1]).load()
     .writeStream.foreachBatch(collect)
     .option("checkpointLocation", sys.argv[2])
     .trigger(availableNow=True).start())
q.awaitTermination(180)
ops = sorted({r["op"] for r in seen})
print(json.dumps({"rows": len(seen), "ops": ops,
                  "sids": sorted({r["_commit_snapshot_id"] for r in seen})}))
spark.stop()
"""
    )
    out = subprocess.run(
        [
            spark_submit, "--master", "local[4]",
            "--conf", "spark.sql.shuffle.partitions=4",
            "--conf", "spark.ui.enabled=false",
            "--py-files", zip_path,
            str(script), table_dir, str(tmp_path / "cp"),
        ],
        capture_output=True, text=True, timeout=420, cwd=str(tmp_path),
    )
    assert out.returncode == 0, out.stderr[-2000:]
    res = json.loads(
        [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    )
    assert res["rows"] == 10 and res["ops"] == ["upsert"]
    assert len(res["sids"]) == 2


def test_spark_submit_debezium_ingest_then_replay(submit_env, tmp_path, spark):
    """Wire-to-lake chain as shipped jobs: Debezium JSON-lines →
    ingest_job (parse + epoch packing + DLQ) → replay_job → lake state
    equal to replaying the typed log directly."""
    import pyspark.sql.functions as F

    from data_pipeline_spark.sources.datagen import gen_changes
    from data_pipeline_spark.sources.debezium import to_debezium

    work, log_dir, zip_path = submit_env
    spark_submit = shutil.which("spark-submit")
    if spark_submit is None:
        pytest.skip("spark-submit not on PATH")

    ch = gen_changes(spark, 3000, events_per_epoch=1000, seed=21)
    wire = to_debezium(
        ch,
        payload_cols=["url", "warc_ts", "html", "lang", "schema_version"],
        op_col="op", lsn_col="lsn", ts_col="warc_ts",
    )
    wire_dir = str(work / "wire")
    junk = spark.createDataFrame([("not json at all",)], "value string")
    wire.unionByName(junk).coalesce(4).write.mode("overwrite").text(wire_dir)

    def submit(script, extra):
        out = subprocess.run(
            [
                spark_submit, "--master", "local[4]",
                "--conf", "spark.sql.shuffle.partitions=4",
                "--conf", "spark.ui.enabled=false",
                "--py-files", zip_path,
                os.path.join(REPO, "jobs", script), *extra,
            ],
            capture_output=True, text=True, timeout=420, cwd=str(tmp_path),
        )
        assert out.returncode == 0, out.stderr[-2000:]
        return json.loads(
            [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
        )

    ing = submit("ingest_job.py", [
        "--wire-dir", wire_dir, "--log-dir", str(work / "wire_log"),
        "--row-ddl",
        "url string, warc_ts timestamp, html binary, lang string,"
        " schema_version int",
        "--epoch-size", "1000",
        "--quarantine-dir", str(work / "wire_dlq"),
    ])
    assert ing["events"] == 3000 and ing["quarantined"] == 1
    assert ing["epochs"] == 3

    rep = submit("replay_job.py", [
        "--log-dir", str(work / "wire_log"),
        "--table-dir", str(work / "t_wire"),
        "--checkpoint-dir", str(work / "cp_wire"), "--mode", "mor",
    ])
    assert rep["epochs_applied"] == 3 and rep["rows_merged"] > 0

    # truth: replay the typed log directly (fixture already wrote it)
    rep2 = submit("replay_job.py", [
        "--log-dir", log_dir,
        "--table-dir", str(work / "t_direct"),
        "--checkpoint-dir", str(work / "cp_direct"), "--mode", "mor",
    ])
    assert rep2["epochs_applied"] == 3

    from data_pipeline_spark.lake.table import LakeTable

    a = LakeTable.load(spark, str(work / "t_wire")).read()
    b = LakeTable.load(spark, str(work / "t_direct")).read()
    cols = sorted(b.columns)
    assert sorted(str(tuple(r)) for r in a.select(*cols).collect()) == sorted(
        str(tuple(r)) for r in b.select(*cols).collect()
    )


def test_spark_submit_repair_job(submit_env, tmp_path, spark):
    """X58 ships the same way: replay a log whose epoch 1 carried a broken
    transform, then repair_job with the corrected log heals exactly those
    keys, audited and published — zip-only import, one JSON metrics line."""
    import pyspark.sql.functions as F

    from data_pipeline_spark.sources import changelog

    work, log_dir, zip_path = submit_env
    bad_log = str(work / "bad_log_repair")
    log = spark.read.parquet(log_dir)
    changelog.write_log(
        log.withColumn(
            "lang",
            F.when(
                (F.col("epoch") == 1) & F.col("lang").isNotNull(), F.lit("zz")
            ).otherwise(F.col("lang")),
        ),
        bad_log,
        mode="overwrite",
    )
    table_dir = str(work / "t_repair")
    cp_dir = str(work / "cp_repair")
    res = _submit(
        {"zip": zip_path, "log": bad_log, "table": table_dir, "cp": cp_dir},
        cwd=str(tmp_path),
    )
    assert res["epochs_applied"] == 3

    from data_pipeline_spark.lake.table import LakeTable

    assert LakeTable.load(spark, table_dir).read().where("lang = 'zz'").count() > 0

    spark_submit = shutil.which("spark-submit")
    if spark_submit is None:
        pytest.skip("spark-submit not on PATH")
    out = subprocess.run(
        [
            spark_submit, "--master", "local[4]",
            "--conf", "spark.sql.shuffle.partitions=4",
            "--conf", "spark.ui.enabled=false",
            "--py-files", zip_path,
            os.path.join(REPO, "jobs", "repair_job.py"),
            "--log-dir", log_dir,  # the corrected source of truth
            "--table-dir", table_dir,
            "--checkpoint-dir", cp_dir,
            "--bad-epochs", "1",
            "--repair-id", "1",
            "--audit-no-shrink", "0.0",
        ],
        capture_output=True, text=True, timeout=420, cwd=str(tmp_path),
    )
    assert out.returncode == 0, out.stderr[-2000:]
    metrics = json.loads(
        [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    )
    assert metrics["published"] and metrics["audit_ok"]
    assert metrics["n_affected_keys"] > 0
    healed = LakeTable.load(spark, table_dir).read()
    assert healed.where("lang = 'zz'").count() == 0


def test_spark_submit_reconcile_snapshot(submit_env, tmp_path, spark):
    """X64 ships through the same job: replay a log, drift the replica by
    hand-writing an authoritative snapshot that disagrees, then
    repair_job --reconcile-snapshot heals the table to the snapshot."""
    import pyspark.sql.functions as F

    work, log_dir, zip_path = submit_env
    table_dir = str(work / "t_reconcile")
    cp_dir = str(work / "cp_reconcile")
    res = _submit(
        {"zip": zip_path, "log": log_dir, "table": table_dir, "cp": cp_dir},
        cwd=str(tmp_path),
    )
    assert res["epochs_applied"] == 3

    from data_pipeline_spark.lake.table import LakeTable

    table = LakeTable.load(spark, table_dir)
    # authoritative snapshot: current state with one key's lang rewritten
    # and one key dropped (source deleted it; replica missed the event)
    cur = table.read()
    some = [r["url"] for r in cur.select("url").limit(2).collect()]
    snap = cur.where(F.col("url") != some[1]).withColumn(
        "lang",
        F.when(F.col("url") == some[0], F.lit("xx")).otherwise(F.col("lang")),
    )
    snap_path = str(work / "source_snapshot")
    snap.write.mode("overwrite").parquet(snap_path)

    spark_submit = shutil.which("spark-submit")
    if spark_submit is None:
        pytest.skip("spark-submit not on PATH")
    out = subprocess.run(
        [
            spark_submit, "--master", "local[4]",
            "--conf", "spark.sql.shuffle.partitions=4",
            "--conf", "spark.ui.enabled=false",
            "--py-files", zip_path,
            os.path.join(REPO, "jobs", "repair_job.py"),
            "--table-dir", table_dir,
            "--reconcile-snapshot", snap_path,
            "--repair-id", "7",
        ],
        capture_output=True, text=True, timeout=420, cwd=str(tmp_path),
    )
    assert out.returncode == 0, out.stderr[-2000:]
    metrics = json.loads(
        [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    )
    assert metrics["published"] and metrics["audit_ok"]
    healed = LakeTable.load(spark, table_dir).read()
    assert healed.where(F.col("url") == some[0]).select("lang").collect()[0][0] == "xx"
    assert healed.where(F.col("url") == some[1]).count() == 0


def test_spark_submit_warc_bootstrap_then_replay(submit_env, tmp_path, spark):
    """Crawl-to-lake chain as shipped jobs (X66): .warc.gz segments →
    ingest_job --warc-dir (parse + CDX sidecar + epoch packing) →
    replay_job → lake holds the newest capture per url; the CDX index
    point-fetches the exact stored bytes of a lake row's winning capture."""
    from datetime import datetime

    import pyspark.sql.functions as F

    from data_pipeline_spark.lake.table import LakeTable
    from data_pipeline_spark.sources.warc import fetch_record, write_segment

    work, _, zip_path = submit_env
    spark_submit = shutil.which("spark-submit")
    if spark_submit is None:
        pytest.skip("spark-submit not on PATH")

    warc_dir = work / "warcseg"
    pages = [
        (
            f"https://crawl.example/p/{i % 6}",
            datetime.utcfromtimestamp(1_700_000_000 + i * 3600),
            f"<html><body>capture {i}</body></html>".encode(),
        )
        for i in range(24)
    ]
    write_segment(str(warc_dir / "seg-0.warc.gz"), pages[:12])
    write_segment(str(warc_dir / "seg-1.warc.gz"), pages[12:])

    def submit(script, extra):
        out = subprocess.run(
            [
                spark_submit, "--master", "local[4]",
                "--conf", "spark.sql.shuffle.partitions=4",
                "--conf", "spark.ui.enabled=false",
                "--py-files", zip_path,
                os.path.join(REPO, "jobs", script), *extra,
            ],
            capture_output=True, text=True, timeout=420, cwd=str(tmp_path),
        )
        assert out.returncode == 0, out.stderr[-2000:]
        return json.loads(
            [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
        )

    ing = submit("ingest_job.py", [
        "--warc-dir", str(warc_dir), "--log-dir", str(work / "warc_log"),
        "--cdx-dir", str(work / "cdx"), "--epoch-size", "10",
    ])
    assert ing["events"] == 24 and ing["epochs"] == 3

    rep = submit("replay_job.py", [
        "--log-dir", str(work / "warc_log"),
        "--table-dir", str(work / "t_warc"),
        "--checkpoint-dir", str(work / "cp_warc"),
    ])
    assert rep["epochs_applied"] == 3

    table = LakeTable.load(spark, str(work / "t_warc")).read()
    got = {r["url"]: r["warc_ts"] for r in table.select("url", "warc_ts").collect()}
    expect = {}
    for url, ts, _ in pages:
        if url not in expect or ts > expect[url]:
            expect[url] = ts
    assert got == expect

    # CDX point read of one winning capture: byte-identical to the source
    url0 = "https://crawl.example/p/0"
    cdx = spark.read.parquet(str(work / "cdx"))
    row = (
        cdx.where(F.col("url") == url0)
        .orderBy(F.col("warc_ts").desc())
        .limit(1)
        .collect()[0]
    )
    rec = fetch_record(
        str(warc_dir / row["warc_file"]), row["warc_offset"], row["warc_length"]
    )
    want_body = [b for u, t, b in pages if u == url0 and t == expect[url0]][0]
    assert bytes(rec["html"]) == want_body


def test_spark_submit_crawl_loop_plan(submit_env, tmp_path, spark):
    """Capstone crawl loop (X66-X69) as shipped jobs: two crawl rounds of
    .warc.gz segments → ingest_job --warc-dir (+CDX) ×2 → replay_job →
    crawl_plan_job. Pages whose payload CHANGED between rounds must lead
    the next plan, most-stale first; never-changed pages trail at 0."""
    from datetime import datetime

    import pyspark.sql.functions as F

    from data_pipeline_spark.sources.warc import write_segment

    work, _, zip_path = submit_env
    spark_submit = shutil.which("spark-submit")
    if spark_submit is None:
        pytest.skip("spark-submit not on PATH")

    T0 = 1_700_000_000
    DAY = 86_400

    def body(i, version):
        return (
            f'<html><a href="https://popular.com/home">hub</a>'
            f'<a href="https://h{(i + 1) % 2}.com/p{(i + 2) % 6}">x</a>'
            f"<p>content {i} v{version}</p></html>"
        ).encode()

    def url(i):
        return f"https://h{i % 2}.com/p{i}"

    r1 = [(url(i), datetime.utcfromtimestamp(T0 + i * 60), body(i, 1))
          for i in range(6)]
    changed = {0, 2, 4}
    r2 = [
        (url(i), datetime.utcfromtimestamp(T0 + DAY + i * 3600),
         body(i, 2 if i in changed else 1))
        for i in range(6)
    ]
    write_segment(str(work / "round1" / "seg.warc.gz"), r1)
    write_segment(str(work / "round2" / "seg.warc.gz"), r2)

    def submit(script, extra):
        out = subprocess.run(
            [
                spark_submit, "--master", "local[4]",
                "--conf", "spark.sql.shuffle.partitions=4",
                "--conf", "spark.ui.enabled=false",
                "--py-files", zip_path,
                os.path.join(REPO, "jobs", script), *extra,
            ],
            capture_output=True, text=True, timeout=420, cwd=str(tmp_path),
        )
        assert out.returncode == 0, out.stderr[-2000:]
        return json.loads(
            [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
        )

    for rnd in ("round1", "round2"):
        ing = submit("ingest_job.py", [
            "--warc-dir", str(work / rnd), "--log-dir", str(work / "loop_log"),
            "--cdx-dir", str(work / "loop_cdx"), "--epoch-size", "6",
        ])
        assert ing["events"] == 6

    rep = submit("replay_job.py", [
        "--log-dir", str(work / "loop_log"),
        "--table-dir", str(work / "loop_table"),
        "--checkpoint-dir", str(work / "loop_cp"),
    ])
    assert rep["epochs_applied"] == 2

    plan_meta = submit("crawl_plan_job.py", [
        "--cdx-dir", str(work / "loop_cdx"),
        "--table-dir", str(work / "loop_table"),
        "--out", str(work / "plan"),
        "--budget", "4", "--rank-weight", "1.0",
    ])
    assert plan_meta["planned_urls"] == 4
    assert plan_meta["ranked_hosts"] >= 2

    plan = (
        spark.read.parquet(str(work / "plan"))
        .orderBy(F.col("priority").desc(), "url")
        .collect()
    )
    # the three changed pages lead, most-stale (earliest recapture) first
    assert [r["url"] for r in plan[:3]] == [url(0), url(2), url(4)]
    assert all(r["priority"] > 0 for r in plan[:3])
    # never-changed pages carry zero priority without a default period
    assert plan[3]["priority"] == 0.0
    # evidence columns survive into the plan for budget re-cuts
    assert plan[0]["change_period_s"] is not None
    assert plan[0]["host_rank"] is not None

    # same plan under the URL gate: a UT1-style blocklist file banning
    # h1.com drops that host's urls BEFORE the budget cut
    bl = work / "blocklist.txt"
    bl.write_text("# adult/spam domains\nh1.com\n")
    gated_meta = submit("crawl_plan_job.py", [
        "--cdx-dir", str(work / "loop_cdx"),
        "--out", str(work / "plan_gated"),
        "--budget", "10",
        "--url-blocklist", str(bl),
    ])
    assert gated_meta["url_filtered"] == 3  # p1, p3, p5 live on h1.com
    gated = spark.read.parquet(str(work / "plan_gated")).collect()
    assert gated and all("h1.com" not in r["url"] for r in gated)


def test_spark_submit_crawl_tail_job(submit_env, tmp_path, spark):
    """Live crawl tail via real spark-submit + zip: the registered warc
    STREAM source must survive Spark's data-source python worker (which
    does not inherit --py-files — the by-value pickling contract of
    sources/warc_source.py)."""
    from datetime import datetime

    from data_pipeline_spark.lake.table import LakeTable
    from data_pipeline_spark.sources.warc import write_segment

    work, _, zip_path = submit_env
    spark_submit = shutil.which("spark-submit")
    if spark_submit is None:
        pytest.skip("spark-submit not on PATH")

    land = work / "tail_landing"
    pages = [
        (f"https://tail.example/p/{i % 3}",
         datetime(2024, 7, 1, 0, i),
         f"<html>tail {i}</html>".encode())
        for i in range(6)
    ]
    write_segment(str(land / "seg-000.warc.gz"), pages)

    out = subprocess.run(
        [
            spark_submit, "--master", "local[4]",
            "--conf", "spark.sql.shuffle.partitions=4",
            "--conf", "spark.ui.enabled=false",
            "--py-files", zip_path,
            os.path.join(REPO, "jobs", "crawl_tail_job.py"),
            "--warc-dir", str(land),
            "--table-dir", str(work / "tail_table"),
            "--checkpoint-dir", str(work / "tail_cp"),
            "--n-buckets", "4",
        ],
        capture_output=True, text=True, timeout=420, cwd=str(tmp_path),
    )
    assert out.returncode == 0, out.stderr[-3000:]
    metrics = json.loads(
        [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    )
    assert metrics["batches_applied"] >= 1 and metrics["rows_merged"] == 3

    table = LakeTable.load(spark, str(work / "tail_table")).read()
    got = {r["url"]: r["warc_ts"].minute for r in table.select("url", "warc_ts").collect()}
    assert got == {"https://tail.example/p/0": 3,
                   "https://tail.example/p/1": 4,
                   "https://tail.example/p/2": 5}
