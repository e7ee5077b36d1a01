"""End-to-end curation pipeline: every stage must do its one job on a
corpus with planted url aliases, stale versions, junk, exact dups,
near-dups, PII, and a language mix."""

import pytest
import pyspark.sql.functions as F

from data_pipeline_spark.operators.curate import CurateConfig, curate

# ~60 words, english-looking, passes the Gopher gate.
GOOD = (
    "This is an ordinary paragraph of english text that is long enough to "
    "pass the word count rule and it keeps a healthy mix of short and long "
    "words with the usual stopwords sprinkled in so that the filter is "
    "happy about it as well. " * 2
).strip()


def _uniq(tag):
    """100 page-unique non-repeating words: keeps cross-page Jaccard low
    (~0.3, below the near-dup threshold) without tripping the repetition
    caps, so only the PLANTED pairs are near-dups."""
    return " ".join(f"w{tag}x{j}" for j in range(100))


def _rows():
    rows = []

    def add(url, ts, text, lang="en", lsn=None):
        rows.append((url, ts, rows.__len__() if lsn is None else lsn, text, lang))

    # url aliases: three spellings of ONE page + a stale older version
    page_a = GOOD + " " + _uniq("a")
    add("https://a.com/page?b=2&a=1", 200, page_a + " current")
    add("HTTPS://WWW.A.com:443/page?a=1&b=2&utm_source=x", 100, page_a + " stale")
    add("https://a.com/page/?a=1&b=2#frag", 150, page_a + " also stale")
    # junk: fails word count
    add("https://b.com/short", 100, "too short")
    # exact dup pair across different urls (normalized-identical text)
    page_c = GOOD + " " + _uniq("c")
    add("https://c.com/dup1", 100, page_c + " copy")
    add("https://c.com/dup2", 100, page_c + "  copy")  # whitespace-normalized dup
    # near-dup pair (one appended token → MinHash candidates)
    page_d = GOOD + " " + _uniq("d")
    add("https://d.com/near1", 100, page_d + " tail one")
    add("https://d.com/near2", 100, page_d + " tail one extra")
    # pii page
    add("https://e.com/pii", 100,
        GOOD + " " + _uniq("e") + " reach me at bob@example.com ok")
    # language mix for sampling
    for i in range(20):
        add(f"https://f.com/de{i}", 100,
            GOOD + " " + _uniq(f"de{i}") + f" german page {i}", "de")
    return rows


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(
        _rows(), "url string, warc_ts long, lsn long, text string, lang string"
    )


def test_full_pipeline(corpus):
    out, stats = curate(corpus, CurateConfig())
    rows = {r["url"]: r for r in out.collect()}

    assert stats["input_rows"] == 29
    # 3 alias spellings collapse to one canonical key
    assert stats["after_url_lww"] == 27
    assert "https://a.com/page?a=1&b=2" in rows
    assert rows["https://a.com/page?a=1&b=2"]["text"].endswith("current")
    # junk page dropped by the gate
    assert stats["after_quality"] == 26
    assert not any("b.com" in u for u in rows)
    # exact dup collapses to the min url
    assert stats["after_exact_dedup"] == 25
    assert "https://c.com/dup1" in rows and "https://c.com/dup2" not in rows
    # near-dup cluster keeps its canonical survivor
    assert stats["after_neardup"] == 24
    assert "https://d.com/near1" in rows and "https://d.com/near2" not in rows
    # pii masked in the surviving text
    assert "<EMAIL>" in rows["https://e.com/pii"]["text"]
    assert "bob@example.com" not in rows["https://e.com/pii"]["text"]
    assert stats["output_rows"] == 24 == len(rows)


def test_deterministic_rerun(corpus):
    out1, s1 = curate(corpus, CurateConfig())
    out2, s2 = curate(corpus, CurateConfig())
    assert s1 == s2
    assert sorted(map(tuple, out1.collect())) == sorted(map(tuple, out2.collect()))


def test_sampling_quota(corpus):
    cfg = CurateConfig(
        minhash=None, sample_fractions={"de": 0.0}, sample_default=1.0
    )
    out, stats = curate(corpus, cfg)
    langs = {r["lang"] for r in out.collect()}
    assert langs == {"en"}  # every de page sampled out, en quota untouched
    assert stats["output_rows"] < stats["after_exact_dedup"]


def test_stage_toggles(corpus):
    cfg = CurateConfig(apply_gopher=False, mask_pii=False, minhash=None)
    out, stats = curate(corpus, cfg)
    # repetition caps still apply, but the short page passes now
    assert any("b.com" in r["url"] for r in out.collect())
    assert any("bob@example.com" in (r["text"] or "") for r in out.collect())
    assert "after_neardup" not in stats


def test_line_dedup_stage(spark):
    """Optional C4 line-dedup stage: boilerplate lines removed corpus-wide
    BEFORE the quality gate, so a mostly-footer page fails on its own
    content."""
    from data_pipeline_spark.operators.curate import CurateConfig, curate

    footer = "subscribe to our newsletter for daily deals and offers"
    rows = [
        ("https://a.com/1", 1, 1, GOOD + " " + _uniq("l1") + "\n" + footer, "en"),
        ("https://a.com/2", 1, 2, GOOD + " " + _uniq("l2") + "\n" + footer, "en"),
        # footer-only page: after line dedup its own content is empty
        ("https://a.com/3", 1, 3, footer, "en"),
    ]
    df = spark.createDataFrame(
        rows, "url string, warc_ts long, lsn long, text string, lang string"
    )
    out, stats = curate(
        df, CurateConfig(line_dedup=True, minhash=None, mask_pii=False)
    )
    urls = {r["url"] for r in out.collect()}
    texts = {r["url"]: r["text"] for r in out.collect()}
    assert stats["after_line_dedup"] == 3
    assert urls == {"https://a.com/1", "https://a.com/2"}
    assert footer in texts["https://a.com/1"]  # first occurrence kept
    assert footer not in texts["https://a.com/2"]


def test_decontaminate_stage(spark, corpus):
    """With a benchmark set containing one page's unique run, that page is
    dropped after dedup; everything else (and the stats ledger) is
    unchanged relative to a bench-free run."""
    # bench text = ONLY the page-unique token run (benchmark questions are
    # distinctive text; shared boilerplate like GOOD would correctly flag
    # every page — realistic, but not what this test plants)
    bench = spark.createDataFrame(
        [(1, _uniq("de3"))], "bench_id long, text string"
    )
    cfg = CurateConfig(minhash=None, decontaminate_ngram=13)
    base_out, base_stats = curate(corpus, cfg)
    out, stats = curate(corpus, cfg, bench=bench)
    base_urls = {r["url"] for r in base_out.collect()}
    urls = {r["url"] for r in out.collect()}
    assert base_urls - urls == {"https://f.com/de3"}
    assert stats["after_decontaminate"] == stats["after_exact_dedup"] - 1
    assert stats["output_rows"] == base_stats["output_rows"] - 1


def test_cross_run_dedup_index(spark, tmp_path, corpus):
    """--dedup-index semantics: run 2 drops near-dups of what run 1
    SHIPPED, keeps novel pages, and the index commit is exactly-once."""
    from data_pipeline_spark.operators.dedup_index import MinHashDedupIndex

    path = str(tmp_path / "mhidx")
    out1, stats1 = curate(
        corpus, CurateConfig(dedup_index_path=path, dedup_index_epoch=0)
    )
    assert stats1["index_epoch"] == 0
    shipped1 = {r["url"] for r in out1.select("url").collect()}
    assert "https://a.com/page?a=1&b=2" in shipped1  # canonicalized survivor

    page_a = GOOD + " " + _uniq("a")
    rows2 = [
        # near-dup of run 1's shipped a.com page (one extra token)
        ("https://g.com/rerun-neardup", 300, 1, page_a + " current extra", "en"),
        # genuinely novel page
        ("https://h.com/fresh", 300, 2, GOOD + " " + _uniq("h") + " novel", "en"),
    ]
    df2 = spark.createDataFrame(
        rows2, "url string, warc_ts long, lsn long, text string, lang string"
    )
    out2, stats2 = curate(
        df2, CurateConfig(dedup_index_path=path, dedup_index_epoch=1)
    )
    urls2 = {r["url"] for r in out2.collect()}
    assert "https://g.com/rerun-neardup" not in urls2, "cross-run dup shipped twice"
    assert "https://h.com/fresh" in urls2
    assert stats2["after_index_dedup"] == 1
    assert stats2["index_epoch"] == 1

    # Exactly-once: re-running the same epoch re-produces the output but
    # does NOT double-commit the index.
    out2b, stats2b = curate(
        df2, CurateConfig(dedup_index_path=path, dedup_index_epoch=1)
    )
    assert stats2b["index_epoch"] == -1
    idx = MinHashDedupIndex.load(spark, path)
    assert idx.committed_epochs() == {0, 1}
    # The index holds exactly what the two runs shipped (url-keyed strings).
    n_shipped = len(shipped1) + len(urls2)
    assert idx.stored_sigs().count() == n_shipped


def test_partial_minhash_dict_with_dedup_index(spark, tmp_path, corpus):
    """A partial cfg.minhash dict (valid for minhash_lsh_pairs via keyword
    defaults) must work with the index path too (review regression)."""
    out, stats = curate(
        corpus,
        CurateConfig(
            minhash={"threshold": 0.5},
            dedup_index_path=str(tmp_path / "mhidx_partial"),
            dedup_index_epoch=0,
        ),
    )
    assert stats["index_epoch"] == 0 and stats["output_rows"] > 0


def test_surprisal_band_stage(spark):
    """The band filter drops the rare-token-noise outlier while ordinary
    english pages survive (corpus LM trained on the gate's survivors)."""
    rows = []
    for i in range(6):
        rows.append((f"https://ok{i}.com/p", 100, i,
                     GOOD + " " + _uniq(f"s{i}"), "en"))
    # All-novel-token page: every token is rare -> max surprisal.
    noise = " ".join(f"zq{i}qz{i}zz" for i in range(120))
    rows.append(("https://noise.com/p", 100, 99, GOOD + " " + noise, "en"))
    df = spark.createDataFrame(
        rows, "url string, warc_ts long, lsn long, text string, lang string"
    )
    base_cfg = CurateConfig(minhash=None, mask_pii=False)
    out_all, stats_all = curate(df, base_cfg)
    assert stats_all["output_rows"] == 7

    from data_pipeline_spark.operators.textprep import unigram_surprisal

    scores = {
        r["url"]: r["surprisal"]
        for r in unigram_surprisal(df, "url", "text").collect()
    }
    noisy = "https://noise.com/p"
    hi = max(v for u, v in scores.items() if u != noisy) + 0.01
    assert scores[noisy] > hi
    out, stats = curate(
        df, CurateConfig(minhash=None, mask_pii=False, surprisal_band=(0.0, hi))
    )
    urls = {r["url"] for r in out.collect()}
    assert noisy not in urls and len(urls) == 6
    assert stats["after_surprisal"] == 6


def test_webqa_gates(spark):
    """drop_soft404 / drop_mojibake / compression_band each remove exactly
    their planted page while ordinary pages survive all three."""
    rows = []
    for i in range(4):
        rows.append((f"https://ok{i}.com/p", 100, i,
                     GOOD + " " + _uniq(f"g{i}"), "en"))
    # soft-404: long enough for Gopher, but two error phrases.
    soft = (GOOD + " " + _uniq("s404")
            + " sorry this page does not exist and the content is"
            + " no longer available here")
    rows.append(("https://s404.com/p", 100, 50, soft, "en"))
    # mojibake: replacement chars planted into an otherwise-good page.
    rows.append(("https://moji.com/p", 100, 51,
                 GOOD + " " + _uniq("mj") + " broken � decode �", "en"))
    # machine-generated: one phrase repeated -> compresses to almost nothing.
    spam = ("buy cheap widgets now best price " * 60).strip()
    rows.append(("https://spam.com/p", 100, 52, spam, "en"))
    df = spark.createDataFrame(
        rows, "url string, warc_ts long, lsn long, text string, lang string"
    )
    # Gopher's repetition caps would eat the spam page; isolate the gates.
    base = dict(minhash=None, mask_pii=False, apply_gopher=False,
                max_dup_line_frac=1.0, max_dup_3gram_frac=1.0)
    out_all, _ = curate(df, CurateConfig(**base))
    assert out_all.count() == 7  # nothing dropped without the gates

    out, _ = curate(df, CurateConfig(**base, drop_soft404=True))
    assert {r["url"] for r in out.collect()} == (
        {r[0] for r in rows} - {"https://s404.com/p"}
    )

    out, _ = curate(df, CurateConfig(**base, drop_mojibake=True))
    assert {r["url"] for r in out.collect()} == (
        {r[0] for r in rows} - {"https://moji.com/p"}
    )

    from data_pipeline_spark.functions.webqa import ratio_oracle

    ratios = dict(zip([r[0] for r in rows], ratio_oracle([r[3] for r in rows])))
    lo = ratios["https://spam.com/p"] + 0.01
    assert all(v >= lo for u, v in ratios.items() if u != "https://spam.com/p")
    out, _ = curate(df, CurateConfig(**base, compression_band=(lo, 1.0)))
    assert {r["url"] for r in out.collect()} == (
        {r[0] for r in rows} - {"https://spam.com/p"}
    )


def test_curate_job_pack_output(spark, tmp_path, monkeypatch, capsys):
    """--pack CTX emits the <output>_packs doc->span map alongside the
    curated corpus (in-process; spark-submit path in test_submit_job)."""
    import json as _json
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from jobs import curate_job

    rows = [(f"https://p{i}.com/x", 100, i, GOOD + " " + _uniq(f"j{i}"), "en")
            for i in range(5)]
    src = str(tmp_path / "src")
    spark.createDataFrame(
        rows, "url string, warc_ts long, lsn long, text string, lang string"
    ).write.parquet(src)
    out_dir = str(tmp_path / "curated")
    monkeypatch.setattr("sys.argv", [
        "curate_job.py", "--input", src, "--output", out_dir,
        "--no-minhash", "--pack", "64", "--pack-shards", "2",
    ])
    from pyspark.sql import SparkSession

    monkeypatch.setattr(SparkSession, "stop", lambda self: None)
    curate_job.main()
    stats = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["output_rows"] == 5 and stats["pack_rows"] > 0
    packs = spark.read.parquet(out_dir + "_packs")
    cols = set(packs.columns)
    assert {"shard", "pack_id", "url", "begin_tok", "pack_tokens",
            "doc_tokens"} <= cols
    # Every curated doc is packed exactly once (sum of spans == tokens).
    agg = packs.groupBy("url").agg(
        F.sum("pack_tokens").alias("s"), F.first("doc_tokens").alias("n")
    ).collect()
    assert len(agg) == 5 and all(r["s"] == r["n"] for r in agg)


def test_curate_job_main_content(spark, tmp_path, monkeypatch, capsys):
    """--main-content: text is re-derived from html by block-density
    boilerplate removal before curation — chrome never reaches the gates."""
    import json as _json

    from jobs import curate_job

    body = ("This is an ordinary paragraph of english text that is long "
            "enough to pass the word count rule with the usual stopwords "
            "in it as well and then some unique words ")
    rows = []
    for i in range(5):
        html = (
            '<html><nav><a href="/">Home</a> <a href="/a">A</a> '
            '<a href="/b">B</a></nav><p>'
            + body + f"tail{i} " * 20
            + '</p><footer><a href="/t">T</a> <a href="/p">P</a></footer></html>'
        ).encode()
        rows.append((f"https://mc.com/{i}", i, i, bytearray(html), "stale text", "en"))
    src = str(tmp_path / "src")
    spark.createDataFrame(
        rows,
        "url string, warc_ts long, lsn long, html binary, text string, lang string",
    ).write.parquet(src)
    out_dir = str(tmp_path / "curated")
    monkeypatch.setattr("sys.argv", [
        "curate_job.py", "--input", src, "--output", out_dir,
        "--no-minhash", "--main-content",
    ])
    from pyspark.sql import SparkSession

    monkeypatch.setattr(SparkSession, "stop", lambda self: None)
    curate_job.main()
    stats = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["output_rows"] == 5
    out = spark.read.parquet(out_dir)
    texts = [r["text"] for r in out.collect()]
    assert all(t.startswith("This is an ordinary paragraph") for t in texts)
    assert all("Home" not in t and "stale text" not in t for t in texts)


def test_span_dedup_stage(spark):
    """Optional ExactSubstr stage: an INLINE boilerplate span (no newline,
    so line dedup can't see it) keeps only its corpus-wide first
    occurrence before the quality gate runs."""
    from data_pipeline_spark.operators.curate import CurateConfig, curate

    ads = "buy now limited offer click here today"
    rows = [
        ("https://a.com/1", 1, 1, "intro one " + _uniq("s1") + " " + ads, "en"),
        ("https://a.com/2", 1, 2, "intro two " + _uniq("s2") + " " + ads, "en"),
    ]
    df = spark.createDataFrame(
        rows, "url string, warc_ts long, lsn long, text string, lang string"
    )
    out, stats = curate(
        df,
        CurateConfig(
            span_dedup_k=5, apply_gopher=False, minhash=None, mask_pii=False
        ),
    )
    texts = {r["url"]: r["text"] for r in out.collect()}
    assert stats["after_span_dedup"] == 2
    assert set(texts) == {"https://a.com/1", "https://a.com/2"}
    assert ads in texts["https://a.com/1"]
    assert "buy now" not in texts["https://a.com/2"]
    assert "ws2x99" in texts["https://a.com/2"]  # own content intact


def test_url_gate_stage(spark):
    rows = [
        ("https://ok.com/a", 100, 1, GOOD + " " + _uniq("g1"), "en"),
        ("https://ads.bad-domain.com/x", 100, 2, GOOD + " " + _uniq("g2"), "en"),
        ("https://ok.com/free-casino-win", 100, 3, GOOD + " " + _uniq("g3"), "en"),
    ]
    df = spark.createDataFrame(
        rows, "url string, warc_ts long, lsn long, text string, lang string"
    )
    cfg = CurateConfig(minhash=None,
                       url_blocked_domains=("bad-domain.com",))
    out, stats = curate(df, cfg)
    urls = [r["url"] for r in out.collect()]
    assert urls == ["https://ok.com/a"]
    # gate rides the stage-1 scan: blocked rows never reach the LWW count
    assert stats["input_rows"] == 1
    # disabled (None) keeps all three
    out2, _ = curate(df, CurateConfig(minhash=None))
    assert out2.count() == 3


def test_dsir_selection_stage(spark):
    # target = lang 'tgt' docs speak planted vocabulary; generic docs don't
    tgt_words = " targetish vocabulary tokens special corpus "
    rows = []
    for i in range(6):
        rows.append((f"https://t.com/{i}", 100, i,
                     GOOD + tgt_words * 3 + " " + _uniq(f"t{i}"), "tgt"))
    for i in range(6):
        rows.append((f"https://r.com/{i}", 100, 100 + i,
                     GOOD + " " + _uniq(f"r{i}"), "raw"))
    # one raw doc that LOOKS like the target
    rows.append(("https://r.com/lookalike", 100, 999,
                 GOOD + tgt_words * 3 + " " + _uniq("rl"), "raw"))
    df = spark.createDataFrame(
        rows, "url string, warc_ts long, lsn long, text string, lang string"
    )
    cfg = CurateConfig(minhash=None, dsir_target="lang = 'tgt'", dsir_top=7)
    out, stats = curate(df, cfg)
    kept = {r["url"] for r in out.collect()}
    assert stats["after_dsir"] == 7 == len(kept)
    # the 6 target docs plus the target-like raw doc win the selection
    assert "https://r.com/lookalike" in kept
    assert all(f"https://t.com/{i}" in kept for i in range(6))


def test_curate_media_dedup_stage(spark, tmp_path, monkeypatch, capsys):
    """Stage 6.7 (VERDICT r3 stretch #7): pages whose attached image is a
    planted re-encode of another page's image keep only the cluster's
    canonical survivor; pages without media and pages with distinct or
    undecodable images are untouched. Also drives the --media-dedup job
    flag end-to-end in-process."""
    import json as _json
    import os
    import sys

    from tests.test_imagedup import _encode_ppm, _gradient
    from tests.test_multimodal import _encode_bmp

    rows = [(f"https://m{i}.com/x", 100, i, GOOD + " " + _uniq(f"m{i}"), "en")
            for i in range(6)]
    df = spark.createDataFrame(
        rows, "url string, warc_ts long, lsn long, text string, lang string"
    )
    g = _gradient(64, 48)
    media_rows = [
        # m0/m1/m2 share one image (BMP, PPM re-container, noisy rescale)
        ("https://m0.com/x", _encode_bmp(64, 48, g), "image/bmp"),
        ("https://m1.com/x", _encode_ppm(64, 48, g), "image/x-portable-pixmap"),
        ("https://m2.com/x",
         _encode_bmp(96, 72, _gradient(96, 72, seed=1, noise=8)), "image/bmp"),
        # m3: distinct image; m4: corrupt payload; m5: no media at all
        ("https://m3.com/x",
         _encode_ppm(64, 48, [[(255 - r, 255 - g2, 255 - b) for (r, g2, b) in row]
                              for row in g]), "image/x-portable-pixmap"),
        ("https://m4.com/x", b"BMgarbage", "image/bmp"),
    ]
    media = spark.createDataFrame(
        media_rows, "url string, content binary, media_type string"
    )
    from data_pipeline_spark.operators.curate import CurateConfig, curate

    out, stats = curate(
        df,
        CurateConfig(minhash=None, media_max_hamming=8),
        media=media,
    )
    kept = {r["url"] for r in out.collect()}
    assert kept == {
        "https://m0.com/x",  # cluster survivor (min canonical url)
        "https://m3.com/x",  # distinct image
        "https://m4.com/x",  # undecodable -> singleton, quality's problem
        "https://m5.com/x",  # no media
    }
    assert stats["after_media_dedup"] == 4

    # job flag drives the same stage
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from jobs import curate_job

    src, mdir, out_dir = (str(tmp_path / d) for d in ("src", "media", "out"))
    df.write.parquet(src)
    media.write.parquet(mdir)
    monkeypatch.setattr("sys.argv", [
        "curate_job.py", "--input", src, "--output", out_dir,
        "--no-minhash", "--media-dedup", mdir, "--media-hamming", "8",
    ])
    from pyspark.sql import SparkSession

    monkeypatch.setattr(SparkSession, "stop", lambda self: None)
    curate_job.main()
    stats = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["after_media_dedup"] == 4 and stats["output_rows"] == 4
    assert {r["url"] for r in spark.read.parquet(out_dir).collect()} == kept


def test_media_dedup_survivor_elected_among_live_pages(spark):
    """Round-5 ADVICE: the media frame is restricted to pages still alive
    before stage 6.7, so a page already dropped by a text stage can never
    be elected a cluster's canonical survivor (which would silently drop
    every live member of the cluster) — and its image is never decoded."""
    from tests.test_imagedup import _encode_ppm, _gradient
    from tests.test_multimodal import _encode_bmp

    rows = [
        # m0 sorts FIRST canonically but fails the word-count gate
        ("https://a0.com/x", 100, 0, "too short", "en"),
        ("https://m1.com/x", 100, 1, GOOD + " " + _uniq("m1"), "en"),
        ("https://m2.com/x", 100, 2, GOOD + " " + _uniq("m2"), "en"),
        ("https://z9.com/x", 100, 3, GOOD + " " + _uniq("z9"), "en"),
    ]
    df = spark.createDataFrame(
        rows, "url string, warc_ts long, lsn long, text string, lang string"
    )
    g = _gradient(64, 48)
    media = spark.createDataFrame(
        [
            ("https://a0.com/x", _encode_bmp(64, 48, g), "image/bmp"),
            ("https://m1.com/x", _encode_ppm(64, 48, g),
             "image/x-portable-pixmap"),
            ("https://m2.com/x",
             _encode_bmp(96, 72, _gradient(96, 72, seed=1, noise=8)),
             "image/bmp"),
        ],
        "url string, content binary, media_type string",
    )
    out, stats = curate(df, CurateConfig(minhash=None, media_max_hamming=8),
                        media=media)
    kept = {r["url"] for r in out.collect()}
    # the dead page a0 must NOT eat the live cluster: exactly one of
    # m1/m2 survives (the canonical min among LIVE members = m1)
    assert kept == {"https://m1.com/x", "https://z9.com/x"}
    assert stats["after_media_dedup"] == 2
