"""Corpus report card (X118): metric truths on a controlled corpus,
planted-duplicate detection, lang-share law, no-lang mode, DuckDB twin
parity, curate_job --report CLI."""

import duckdb
import pyspark.sql.functions as F

from data_pipeline_spark.operators.report import (
    corpus_report,
    sql_corpus_report,
)

GOOD = (
    "This is an ordinary paragraph of english text that is long enough to "
    "pass the word count rule and it keeps a healthy mix of short and long "
    "words with the usual stopwords sprinkled in so that the filter is "
    "happy about it as well. " * 2
).strip()


def test_metric_truths(spark):
    rows = [(GOOD + f" unique{i}", "en") for i in range(8)]
    rows += [(GOOD + " unique0", "en")]          # exact duplicate of doc 0
    rows += [("too short", "de")]                # fails gopher
    df = spark.createDataFrame(rows, "text string, lang string")
    rep = {
        (r["metric"], r["dimension"]): r["value"]
        for r in corpus_report(df).collect()
    }
    assert rep[("rows", "all")] == 10.0
    assert abs(rep[("exact_dup_ratio", "all")] - 0.1) < 1e-9  # 9 distinct / 10
    assert abs(rep[("gopher_pass_rate", "all")] - 0.9) < 1e-9
    assert abs(rep[("lang_share", "en")] - 0.9) < 1e-9
    assert abs(rep[("lang_share", "de")] - 0.1) < 1e-9
    assert rep[("tokens_ws_total", "all")] > 0
    # multilingual >= whitespace on ASCII-ish text (symbols split out)
    assert rep[("tokens_ml_total", "all")] >= rep[("tokens_ws_total", "all")]
    # no-lang mode drops the share rows
    no_lang = corpus_report(df.select("text"), lang_col=None)
    assert no_lang.where(F.col("metric") == "lang_share").count() == 0
    assert no_lang.count() == 7


def test_duckdb_twin_parity(spark):
    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    got = sorted(map(tuple, corpus_report(docs).collect()))
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        "'/root/testdata/sf0.01/documents.parquet'"
    )
    want = sorted(map(tuple, con.sql(sql_corpus_report("documents")).fetchall()))
    assert got == want


def test_curate_job_report(spark, tmp_path, monkeypatch, capsys):
    import json
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from jobs import curate_job

    rows = [(f"https://p{i}.com/x", 100, i, GOOD + f" tail{i}", "en")
            for i in range(6)]
    src = str(tmp_path / "src")
    spark.createDataFrame(
        rows, "url string, warc_ts long, lsn long, text string, lang string"
    ).write.parquet(src)
    out_dir = str(tmp_path / "curated")
    monkeypatch.setattr("sys.argv", [
        "curate_job.py", "--input", src, "--output", out_dir,
        "--no-minhash", "--report",
    ])
    from pyspark.sql import SparkSession

    monkeypatch.setattr(SparkSession, "stop", lambda self: None)
    curate_job.main()
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    rep = spark.read.parquet(out_dir + "_report")
    vals = {(r["metric"], r["dimension"]): r["value"] for r in rep.collect()}
    assert vals[("rows", "all")] == stats["output_rows"]
    assert ("lang_share", "en") in vals
