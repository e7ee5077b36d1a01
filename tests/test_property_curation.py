"""Property-based hardening of the curation primitives (hypothesis):
invariants that must hold for ARBITRARY inputs, not just fixtures.

Strategy note: one Spark job per hypothesis example would be minutes per
property — instead each property draws a BATCH of examples, runs them
through one DataFrame, and checks all rows, keeping Spark job count O(1)
per property (same pattern as test_property_lww.py).
"""

import re

import pyspark.sql.functions as F
from hypothesis import given, settings, strategies as st

from data_pipeline_spark.functions import weburl as W
from data_pipeline_spark.operators.textprep import chunk_documents
from data_pipeline_spark.operators import sampling as S

# -- URL generator: structured-ish but adversarial ---------------------------

_scheme = st.sampled_from(["http", "https", "HTTP", "HTTPS", "ftp"])
_host = st.from_regex(r"[A-Za-z0-9.-]{1,20}", fullmatch=True)
_path = st.from_regex(r"(/[A-Za-z0-9._~%-]{0,8}){0,4}/?", fullmatch=True)
_param = st.from_regex(r"[A-Za-z0-9_]{1,8}(=[A-Za-z0-9_]{0,8})?", fullmatch=True)
_query = st.lists(_param, max_size=4).map("&".join)
_frag = st.from_regex(r"[A-Za-z0-9/?=_-]{0,12}", fullmatch=True)


@st.composite
def _url(draw):
    u = f"{draw(_scheme)}://{draw(_host)}{draw(_path)}"
    if draw(st.booleans()):
        u += "?" + draw(_query)
    if draw(st.booleans()):
        u += "#" + draw(_frag)
    return u


@settings(max_examples=10, deadline=None)
@given(st.lists(_url(), min_size=1, max_size=30))
def test_canonical_url_idempotent_and_fragment_free(spark, urls):
    df = spark.createDataFrame([(i, u) for i, u in enumerate(urls)], "i long, url string")
    once = df.select("i", W.canonical_url("url").alias("url"))
    twice = once.select("i", W.canonical_url("url").alias("url"))
    a = {r["i"]: r["url"] for r in once.collect()}
    b = {r["i"]: r["url"] for r in twice.collect()}
    assert a == b  # idempotent on arbitrary input
    for i, u in a.items():
        if urls[i].lower().startswith(("http://", "https://")):
            assert "#" not in u, (urls[i], u)
            host = re.sub(r"^[a-z]+://", "", u).split("/")[0].split(":")[0]
            assert host == host.lower()


@settings(max_examples=8, deadline=None)
@given(
    st.lists(st.integers(0, 10_000), min_size=1, max_size=200, unique=True),
    st.floats(0.0, 1.0),
)
def test_sampling_is_a_pure_key_predicate(spark, keys, fraction):
    """Membership depends ONLY on (key, seed, fraction) — never on the
    surrounding rows — so sampling commutes with any filter."""
    df = spark.createDataFrame([(k,) for k in keys], "k long")
    kept_all = {r["k"] for r in S.hash_sample(df, "k", fraction, "p").collect()}
    half = [k for k in keys if k % 2 == 0]
    df2 = spark.createDataFrame([(k,) for k in half] or [(None,)], "k long").where(
        "k is not null"
    )
    kept_half = {r["k"] for r in S.hash_sample(df2, "k", fraction, "p").collect()}
    assert kept_half == {k for k in kept_all if k % 2 == 0}


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.text(alphabet="ab \n\t", min_size=0, max_size=60), min_size=1, max_size=20
    ),
    st.integers(2, 8),
    st.integers(0, 3),
)
def test_chunks_cover_all_tokens_in_order(spark, texts, chunk_tokens, overlap):
    overlap = min(overlap, chunk_tokens - 1)
    step = chunk_tokens - overlap
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "i long, text string"
    )
    out = chunk_documents(df, "i", "text", chunk_tokens, overlap)
    got = {}
    for r in out.collect():
        got.setdefault(r["i"], {})[r["chunk_id"]] = r["chunk"]
    for i, text in enumerate(texts):
        toks = text.split()
        if not toks:
            assert i not in got
            continue
        chunks = [got[i][c] for c in sorted(got[i])]
        # stitching chunks (dropping each successor's overlap) rebuilds
        # the token stream exactly
        rebuilt = chunks[0].split()
        for ch in chunks[1:]:
            rebuilt.extend(ch.split()[overlap:])
        # trailing windows may re-cover earlier tokens only via overlap
        assert rebuilt == toks, (text, chunks)
