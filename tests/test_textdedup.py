"""Unit tests for the dedup family: exact, shingles, n-gram Jaccard,
MinHash+LSH, SimHash, embedding-cosine — handcrafted near-dup corpora with
known answers."""

import pyspark.sql.functions as F
import pytest

from data_pipeline_spark.operators import textdedup as TD


@pytest.fixture(scope="module")
def corpus(spark):
    base = "the quick brown fox jumps over the lazy dog near the old river bank today"
    near = base + " again"          # near-dup of 1
    far = "completely different words about spark shuffles and lake table commits"
    rows = [
        (1, base),
        (2, base),                   # exact dup of 1
        (3, near),                   # near dup of 1
        (4, far),
        (5, "tiny"),                 # shorter than shingle width
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup(corpus):
    groups = {
        r["fingerprint"]: (r["keeper_id"], r["n_dups"])
        for r in TD.exact_dedup_groups(corpus, "text", "doc_id").collect()
    }
    assert sorted(v for v in groups.values()) == [(1, 2), (3, 1), (4, 1), (5, 1)]
    kept = sorted(r["doc_id"] for r in TD.exact_dedup(corpus, "text", "doc_id").collect())
    assert kept == [1, 3, 4, 5]


def test_shingles_short_doc(spark):
    df = spark.createDataFrame([(1, "tiny"), (2, "a b")], "doc_id long, text string")
    m = {
        r["doc_id"]: r["sh"]
        for r in df.select("doc_id", TD.shingles(F.col("text"), 3).alias("sh")).collect()
    }
    assert m[1] == ["tiny"]
    assert m[2] == ["a b"]


def test_ngram_jaccard_pairs(corpus):
    pairs = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in TD.ngram_jaccard_pairs(corpus, "text", "doc_id", 3, 0.5).collect()
    }
    assert pairs[(1, 2)] == 1.0
    assert (1, 3) in pairs and pairs[(1, 3)] >= 0.8
    assert (2, 3) in pairs
    assert not any(4 in p or 5 in p for p in pairs)


def test_minhash_lsh_finds_exact_and_near(corpus):
    got = {
        (r["id_a"], r["id_b"])
        for r in TD.minhash_lsh_pairs(
            corpus, "text", "doc_id", n=3, num_hashes=12, bands=4, threshold=0.5
        ).collect()
    }
    # exact dups always share every band; near dup shares ≥1 band whp.
    assert (1, 2) in got
    assert (1, 3) in got
    assert not any(4 in p or 5 in p for p in got)


@pytest.fixture(scope="module")
def stop_shingle_corpus(spark):
    """Every doc ends with the same boilerplate → one corpus-wide shingle
    ('terms and conditions') that would join ALL doc pairs as candidates."""
    boiler = " terms and conditions"
    base = ("the quick brown fox jumps over the lazy dog near the old river "
            "bank while the morning sun rises slowly over the quiet valley")
    rows = [
        (1, base + boiler),
        (2, base + " again" + boiler),            # true near-dup of 1
        (3, "spark shuffles and lake commits together" + boiler),
        (4, "completely unrelated text about benchmarks" + boiler),
        (5, "yet another different document entirely here" + boiler),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_ngram_jaccard_hot_shingle_cut(stop_shingle_corpus):
    """max_df bounds the candidate set (stop-shingle pairs vanish) while
    true near-dups keep their EXACT uncut Jaccard score."""
    uncut = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in TD.ngram_jaccard_pairs(
            stop_shingle_corpus, "text", "doc_id", 3, 0.3
        ).collect()
    }
    cut = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in TD.ngram_jaccard_pairs(
            stop_shingle_corpus, "text", "doc_id", 3, 0.3, max_df=2
        ).collect()
    }
    assert cut == uncut  # above threshold, nothing changes
    assert (1, 2) in cut and cut[(1, 2)] >= 0.3
    # the boilerplate-only overlaps never reach the threshold either way
    assert not any(4 in p or 5 in p for p in cut)
    # and with threshold 0 the uncut plan WOULD emit every boilerplate pair,
    # while the cut plan emits only pairs sharing a non-hot shingle
    all_uncut = TD.ngram_jaccard_pairs(
        stop_shingle_corpus, "text", "doc_id", 3, 0.0
    ).count()
    all_cut = TD.ngram_jaccard_pairs(
        stop_shingle_corpus, "text", "doc_id", 3, 0.0, max_df=2
    ).count()
    assert all_uncut == 10  # 5 docs -> every pair shares the stop-shingle
    assert all_cut == 1     # only (1,2) shares a real shingle


def test_minhash_hot_shingle_cut_keeps_neardups(stop_shingle_corpus):
    # 6 bands x 2 rows: P(miss a j=0.83 pair) ~ 1e-3 — with these fixed md5
    # hash functions the outcome is deterministic, verified non-missing.
    got = {
        (r["id_a"], r["id_b"])
        for r in TD.minhash_lsh_pairs(
            stop_shingle_corpus, "text", "doc_id",
            n=3, num_hashes=12, bands=6, threshold=0.3, max_df=2,
        ).collect()
    }
    assert (1, 2) in got
    assert not any(4 in p or 5 in p for p in got)


def test_minhash_no_cache_leak(corpus):
    """Repeated calls must not leave cached plans behind (the round-1
    'Asked to cache already cached data' leak): after the call returns, the
    session's cache manager is empty."""
    jsc = corpus.sparkSession._jsparkSession
    for _ in range(2):
        TD.minhash_lsh_pairs(
            corpus, "text", "doc_id", n=3, num_hashes=12, bands=4, threshold=0.5
        ).count()
    assert jsc.sharedState().cacheManager().isEmpty()


def test_simhash_near_for_near_dups(corpus):
    sigs = {r["doc"]: r["simhash"] for r in TD.simhash(corpus, "text", "doc_id").collect()}
    assert sigs[1] == sigs[2]
    ham13 = bin(sigs[1] ^ sigs[3]).count("1")
    ham14 = bin(sigs[1] ^ sigs[4]).count("1")
    assert ham13 <= 3 < ham14
    for v in sigs.values():
        assert 0 <= v < 2 ** TD.SIMHASH_BITS


def test_simhash_pairs_banding(corpus):
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in TD.simhash_pairs(corpus, "text", "doc_id", max_hamming=3).collect()
    }
    assert got[(1, 2)] == 0
    assert (1, 3) in got and got[(1, 3)] <= 3
    assert (1, 4) not in got


def test_embedding_neardup(spark):
    rows = [
        (1, [1.0, 0.0, 0.0, 0.0]),
        (2, [0.99, 0.01, 0.0, 0.0]),   # ~same direction as 1
        (3, [0.0, 1.0, 0.0, 0.0]),     # orthogonal
        (4, [2.0, 0.0, 0.0, 0.0]),     # same direction as 1, scaled
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    pairs = {
        (r["id_a"], r["id_b"]): r["cos_sim"]
        for r in TD.neardup_embedding_pairs(df, "embedding", "vec_id", 0.95).collect()
    }
    assert pairs[(1, 4)] == 1.0
    assert (1, 2) in pairs and (2, 4) in pairs
    assert not any(3 in p for p in pairs)


def test_minhash_signature_matches_python(spark):
    """Pin signature values against an independent Python computation.

    Regression for a PySpark 4.1 higher-order-function bug: an F.array of
    2+ sibling `transform` lambdas mis-binds their lambda variables and
    yields wrong, run-to-run-UNSTABLE hashes. The signature is therefore
    built as one transform folded with aggregate/zip_with; this test fails
    on the broken formulation (values differ from truth) and pins the fix.
    """
    import hashlib

    import pyspark.sql.functions as F

    from data_pipeline_spark.operators.textdedup import minhash_signature, shingles

    text = "vector batch small sort agg group vector line batch table merge sort"
    df = spark.createDataFrame([(text,)], "text string")
    sh = df.select(shingles(F.col("text"), 3).alias("sh")).collect()[0]["sh"]
    expected = [
        min(hashlib.md5(f"{i}:{s}".encode()).hexdigest() for s in sh)
        for i in range(12)
    ]
    for _ in range(3):  # the broken form also flickered run-to-run
        got = list(
            df.select(minhash_signature(F.col("text"), 3, 12).alias("g"))
            .collect()[0]["g"]
        )
        assert got == expected


def test_line_dedup(spark):
    """C4-style corpus-wide line dedup: first (doc, idx) occurrence wins,
    fingerprint is case/whitespace-insensitive, docs reassemble in order,
    fully-deduped docs come back empty; DuckDB twin agrees."""
    import duckdb

    from data_pipeline_spark.operators.textdedup import line_dedup, sql_line_dedup

    rows = [
        (0, "unique opening zero\n(c) common footer\nbody class a"),
        (1, "unique opening one\n(c) common footer\nbody class b"),
        (2, "unique opening two\n(c) COMMON   footer\nbody class a\n\n  "),
        (3, "(c) common footer"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r["text"] for r in line_dedup(df, "doc_id", "text").collect()}
    assert out[0] == "unique opening zero\n(c) common footer\nbody class a"
    assert out[1] == "unique opening one\nbody class b"
    assert out[2] == "unique opening two"  # case/ws-insensitive fingerprint
    assert out[3] == ""  # every line seen before → empty doc survives as row
    con = duckdb.connect()
    con.execute("CREATE TABLE ldd (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO ldd VALUES (?,?)", rows)
    orc = {
        r[0]: r[1]
        for r in con.execute(
            sql_line_dedup("SELECT * FROM ldd", "doc_id", "text")
        ).fetchall()
    }
    assert out == orc
