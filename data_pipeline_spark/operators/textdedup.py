"""Deduplication family for training-data pipelines: exact, n-gram Jaccard,
MinHash+LSH, SimHash, embedding-cosine near-dup.

Scale-first design notes (the whole point at 10^10 docs):

- **Exact**: one hash-aggregate on the md5 fingerprint — map-side combinable,
  no O(n²) anywhere.
- **n-gram Jaccard / MinHash-LSH**: never all-pairs. Candidates come from an
  equi-join on a short key (shared shingle / LSH band), which Spark executes
  as a shuffled hash join keyed by that band — cost is Σ bucket², bounded by
  band width, not n². Verification runs only on candidates.
- **SimHash**: signature is a per-doc aggregate (explode tokens → bit votes
  → one row per doc); near-dup candidates join on signature *chunks*
  (pigeonhole: hamming ≤ k ⇒ some chunk of k+1 equal), then exact hamming.
- **Embedding near-dup**: `neardup_embedding_pairs` is the small-scale /
  oracle path (block-nested cross join); the scale path is
  `similarity.lsh_bucket_pairs` (random-hyperplane buckets) — same verify.

Every hash used in signatures is md5-hex (lexicographic min over hex strings
for MinHash), NOT xxhash64 — md5 exists in both Spark and DuckDB, so each
operator has an exact SQL oracle twin and the driver's correctness gate
checks real cross-engine parity.

Reference analog: the reference's only dedup is whole-snapshot
last-file-wins (/root/reference/src/storage/minio_client.rs:219-228) and a
product-id set diff (/root/reference/src/bin/compare_api_data.rs:63-89);
this family is the training-data extension required by the task brief.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from ..functions.textstats import (
    fingerprint,
    normalized_text,
    sql_fingerprint,
    sql_tokens,
    tokens,
)

# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------

def exact_dedup_groups(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Duplicate groups by content fingerprint: (fingerprint, keeper_id,
    n_dups). One hash aggregation; keeper = min id (deterministic)."""
    return (
        df.select(fingerprint(F.col(text_col)).alias("fingerprint"), F.col(id_col))
        .groupBy("fingerprint")
        .agg(
            F.min(id_col).alias("keeper_id"),
            F.count("*").cast("long").alias("n_dups"),
        )
    )


def exact_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Keep one row per distinct normalized content (the min-id row)."""
    keep = exact_dedup_groups(df, text_col, id_col).select(
        F.col("keeper_id").alias(id_col)
    )
    return df.join(keep, on=id_col, how="left_semi")


def sql_exact_dedup_groups(table: str, text_col: str, id_col: str) -> str:
    return (
        f"SELECT {sql_fingerprint(text_col)} AS fingerprint, "
        f"MIN({id_col}) AS keeper_id, CAST(COUNT(*) AS BIGINT) AS n_dups "
        f"FROM {table} GROUP BY 1"
    )


# ---------------------------------------------------------------------------
# Shingles (token n-grams)
# ---------------------------------------------------------------------------

def shingles(col: Column, n: int = 3) -> Column:
    """Distinct token n-gram shingles of a text column (native, no UDF).

    Tokens come from the shared whitespace tokenizer; a doc shorter than n
    tokens yields its whole token sequence as one shingle so no doc is
    silently dropped from dedup.
    """
    toks = tokens(F.lower(col))
    ngrams = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(toks) - F.lit(n - 1), F.lit(1))),
        lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
    )
    return F.array_distinct(ngrams)


def sql_shingles(col: str, n: int = 3) -> str:
    toks = sql_tokens(f"lower({col})")
    return (
        f"list_distinct(list_transform("
        f"range(1, greatest(len({toks}) - {n - 1}, 1) + 1), "
        f"i -> array_to_string(list_slice({toks}, i, i + {n - 1}), ' ')))"
    )


# ---------------------------------------------------------------------------
# n-gram Jaccard near-dup
# ---------------------------------------------------------------------------

def hot_shingles(
    base: DataFrame, max_df: int, sh_col: str = "sh", cap: int = 10000
) -> list[str]:
    """Shingles whose document frequency exceeds ``max_df`` — the skew keys
    of the candidate equi-join (a corpus-wide stop-shingle like "of the and"
    makes Σ bucket² quadratic). One hash aggregation; the hot set is tiny by
    definition (``cap`` guards the driver collect — if more than ``cap``
    shingles are that common, max_df is set far too low for the corpus)."""
    hot = (
        base.select(F.explode(sh_col).alias("shingle"))
        .groupBy("shingle")
        .agg(F.count("*").alias("n_docs"))
        .where(F.col("n_docs") > max_df)
        .select("shingle")
        .limit(cap + 1)
        .collect()
    )
    if len(hot) > cap:
        raise ValueError(
            f"more than {cap} shingles exceed max_df={max_df}; "
            "raise max_df — this cut is for rare stop-shingles, not the corpus"
        )
    return [r["shingle"] for r in hot]


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
    threshold: float = 0.5,
    max_df: int | None = None,
) -> DataFrame:
    """Pairs (id_a < id_b) with token-n-gram Jaccard ≥ threshold.

    Plan: explode distinct shingles → equi-join on shingle (candidates share
    ≥1 shingle) → jaccard = |∩| / (|a|+|b|-|∩|).

    ``max_df`` is the hot-shingle document-frequency cut (REQUIRED at real
    scale): shingles appearing in more than ``max_df`` docs are dropped
    before the candidate equi-join, so a stop-shingle can't become a
    quadratic skew key. Candidates are then verified with the exact Jaccard
    over the FULL shingle sets — any pair still sharing a non-hot shingle
    scores identically to the uncut plan; only pairs whose overlap is
    exclusively stop-shingles (Jaccard ≈ 0, never near-dups) are missed.
    """
    base = df.select(
        F.col(id_col).alias("doc"), shingles(F.col(text_col), n).alias("sh")
    ).withColumn("sh_n", F.size("sh"))
    if max_df is not None:
        hot = hot_shingles(base, max_df)
        cut = F.array_except("sh", F.array(*[F.lit(s) for s in hot]))
        ex = base.select("doc", F.explode(cut).alias("shingle"))
        cand = (
            ex.alias("x")
            .join(ex.alias("y"), on="shingle")
            .where(F.col("x.doc") < F.col("y.doc"))
            .select(F.col("x.doc").alias("id_a"), F.col("y.doc").alias("id_b"))
            .distinct()
        )
        sets = base.select("doc", "sh")
        verified = (
            cand.join(sets.select(F.col("doc").alias("id_a"), F.col("sh").alias("sh_a")), "id_a")
            .join(sets.select(F.col("doc").alias("id_b"), F.col("sh").alias("sh_b")), "id_b")
            .withColumn("common", F.size(F.array_intersect("sh_a", "sh_b")).cast("long"))
            .withColumn(
                "jaccard",
                F.round(
                    F.col("common").cast("double")
                    / F.size(F.array_union("sh_a", "sh_b")).cast("double"),
                    6,
                ),
            )
            .where(F.col("jaccard") >= threshold)
            .select("id_a", "id_b", "common", "jaccard")
        )
        return verified
    ex = base.select("doc", "sh_n", F.explode("sh").alias("shingle"))
    a = ex.select(
        F.col("doc").alias("id_a"), F.col("sh_n").alias("n_a"), "shingle"
    )
    b = ex.select(
        F.col("doc").alias("id_b"), F.col("sh_n").alias("n_b"), "shingle"
    )
    pairs = (
        a.join(b, on="shingle")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b", "n_a", "n_b")
        .agg(F.count("*").cast("long").alias("common"))
    )
    jac = F.col("common").cast("double") / (
        F.col("n_a") + F.col("n_b") - F.col("common")
    ).cast("double")
    return (
        pairs.withColumn("jaccard", F.round(jac, 6))
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "common", "jaccard")
    )


def sql_ngram_jaccard_pairs(
    table: str, text_col: str, id_col: str, n: int = 3, threshold: float = 0.5
) -> str:
    return f"""
WITH base AS (
  SELECT {id_col} AS doc, {sql_shingles(text_col, n)} AS sh FROM {table}
), ex AS (
  SELECT doc, len(sh) AS sh_n, unnest(sh) AS shingle FROM base
), pairs AS (
  SELECT a.doc AS id_a, b.doc AS id_b, a.sh_n AS n_a, b.sh_n AS n_b,
         CAST(COUNT(*) AS BIGINT) AS common
  FROM ex a JOIN ex b ON a.shingle = b.shingle AND a.doc < b.doc
  GROUP BY 1, 2, 3, 4
)
SELECT id_a, id_b, common,
       round(CAST(common AS DOUBLE) / (n_a + n_b - common), 6) AS jaccard
FROM pairs
WHERE round(CAST(common AS DOUBLE) / (n_a + n_b - common), 6) >= {threshold}
"""


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

def _signature_from_shingles(sh: Column, num_hashes: int) -> Column:
    """Element-wise min of per-shingle hash vectors.

    Built as ONE ``transform`` (every permutation's hash per shingle) folded
    with ``aggregate``+``zip_with`` — deliberately NOT an ``F.array`` of
    sibling ``transform`` lambdas: PySpark 4.1 mis-binds the lambda
    variables of 2+ sibling higher-order functions nested under one
    expression, producing wrong, run-to-run-unstable hashes (regression
    pinned in tests/test_textdedup.py::test_minhash_signature_matches_python).
    '~' sorts above every md5 hex char, so it is the fold's identity.
    """
    per_shingle = F.transform(
        sh,
        lambda s: F.array(
            *[F.md5(F.concat(F.lit(f"{i}:"), s)) for i in range(num_hashes)]
        ),
    )
    init = F.array_repeat(F.lit("~"), num_hashes)
    return F.aggregate(
        per_shingle, init, lambda acc, h: F.zip_with(acc, h, lambda a, b: F.least(a, b))
    )


def minhash_signature(
    col: Column, n: int = 3, num_hashes: int = 12
) -> Column:
    """MinHash signature: per permutation i, min over shingles of
    md5(i:shingle) — lexicographic min over uniform hex strings is an
    order-statistic minhash; md5 keeps it portable to the SQL oracle."""
    return _signature_from_shingles(shingles(col, n), num_hashes)


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
    num_hashes: int = 12,
    bands: int = 4,
    threshold: float = 0.5,
    max_df: int | None = None,
    materialize: bool = True,
) -> DataFrame:
    """Near-dup pairs via MinHash banding, verified by true Jaccard.

    num_hashes/bands rows per band; docs sharing any band key are candidates
    (probability curve ~ 1-(1-j^r)^b). The band join key is a single md5 —
    short, uniform, shuffle-friendly. Candidates are then verified with the
    exact shingle-Jaccard (computed on the candidate set only).

    ``max_df``: stop-shingle cut — shingles in more than ``max_df`` docs are
    removed from the shingle sets (signatures AND verification, so the
    operator's Jaccard space is consistently "minus stop-shingles"). At
    10^10 docs this is what keeps signatures meaningful when boilerplate
    shingles appear corpus-wide.

    ``materialize=True`` (default): the shared shingle pass is persisted for
    its three uses (signature + both verify sides), the result is eagerly
    localCheckpoint'ed, and the cache is released before returning — no
    CacheManager leak across calls. ``materialize=False`` returns a fully
    lazy plan that recomputes the shingle pass per use (no caching at all) —
    for callers composing this into a larger cached pipeline.
    """
    rows = num_hashes // bands
    base = df.select(
        F.col(id_col).alias("doc"), shingles(F.col(text_col), n).alias("sh")
    )
    cached = base.persist() if materialize else None
    if cached is not None:
        base = cached
    if max_df is not None:
        hot = hot_shingles(base, max_df)
        base = base.withColumn(
            "sh", F.array_except("sh", F.array(*[F.lit(s) for s in hot]))
        )
    sig = base.select(
        "doc", _signature_from_shingles(F.col("sh"), num_hashes).alias("sig")
    )
    band_keys = sig.select(
        "doc",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(bi).alias("band"),
                        F.md5(
                            F.concat_ws(
                                "|", *[F.col("sig")[bi * rows + r] for r in range(rows)]
                            )
                        ).alias("key"),
                    )
                    for bi in range(bands)
                ]
            )
        ).alias("bk"),
    ).select("doc", "bk.band", "bk.key")
    cand = (
        band_keys.alias("x")
        .join(band_keys.alias("y"), on=["band", "key"])
        .where(F.col("x.doc") < F.col("y.doc"))
        .select(F.col("x.doc").alias("id_a"), F.col("y.doc").alias("id_b"))
        .distinct()
    )
    # Verify candidates with exact Jaccard (join the persisted shingle sets).
    verified = (
        cand.join(base.select(F.col("doc").alias("id_a"), F.col("sh").alias("sh_a")), "id_a")
        .join(base.select(F.col("doc").alias("id_b"), F.col("sh").alias("sh_b")), "id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
                / F.size(F.array_union("sh_a", "sh_b")).cast("double"),
                6,
            ),
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    if cached is not None:
        try:
            # Eager local checkpoint: the (small) verified-pairs result is
            # materialized off the cached lineage, so the shingle cache can
            # be released immediately — callers get a self-contained result
            # with no leaked cache entries ("already cached" warnings).
            return verified.localCheckpoint(eager=True)
        finally:
            cached.unpersist()
    return verified


def sql_minhash_lsh_pairs(
    table: str,
    text_col: str,
    id_col: str,
    n: int = 3,
    num_hashes: int = 12,
    bands: int = 4,
    threshold: float = 0.5,
) -> str:
    rows = num_hashes // bands
    mh = ", ".join(
        f"list_min(list_transform(sh, s -> md5('{i}:' || s))) AS mh{i}"
        for i in range(num_hashes)
    )
    band_rows = " UNION ALL ".join(
        f"SELECT doc, {bi} AS band, "
        f"md5(concat_ws('|', {', '.join(f'mh{bi * rows + r}' for r in range(rows))})) AS key "
        f"FROM sig"
        for bi in range(bands)
    )
    return f"""
WITH base AS (
  SELECT {id_col} AS doc, {sql_shingles(text_col, n)} AS sh FROM {table}
), sig AS (
  SELECT doc, sh, {mh} FROM base
), bk AS (
  {band_rows}
), cand AS (
  SELECT DISTINCT x.doc AS id_a, y.doc AS id_b
  FROM bk x JOIN bk y ON x.band = y.band AND x.key = y.key AND x.doc < y.doc
)
SELECT c.id_a, c.id_b,
       round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
             / len(list_distinct(list_concat(a.sh, b.sh))), 6) AS jaccard
FROM cand c
JOIN base a ON a.doc = c.id_a
JOIN base b ON b.doc = c.id_b
WHERE round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
            / len(list_distinct(list_concat(a.sh, b.sh))), 6) >= {threshold}
"""


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

SIMHASH_BITS = 16  # hex digits 1..4 of md5(token); portable + SQL-checkable

_HEX = "0123456789abcdef"


def _bit_from_md5(h: Column, bit: int) -> Column:
    """Bit `bit` (0 = MSB of digit 1) of the first SIMHASH_BITS bits of a
    md5-hex column. Spark: `conv(hexdigit,16,10)`; DuckDB twin uses a
    `strpos` hex lookup — same value, per-engine idiom."""
    digit = F.conv(F.substring(h, 1 + bit // 4, 1), 16, 10).cast("int")
    shift = 3 - (bit % 4)
    return F.floor(digit / F.lit(2 ** shift)).cast("long") % 2


def simhash(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Per-doc SIMHASH_BITS-bit SimHash over whitespace tokens (weight 1).

    explode tokens → one md5 per token → per-bit ±1 votes summed in ONE
    hash aggregation (map-side combinable — hot docs don't stall) → sign →
    integer signature.
    """
    ex = df.select(
        F.col(id_col).alias("doc"),
        F.explode(tokens(F.lower(F.col(text_col)))).alias("tok"),
    ).withColumn("h", F.md5("tok"))
    votes = ex.groupBy("doc").agg(
        *[
            F.sum(_bit_from_md5(F.col("h"), b) * 2 - 1).alias(f"v{b}")
            for b in range(SIMHASH_BITS)
        ]
    )
    sig = None
    for b in range(SIMHASH_BITS):
        term = F.when(F.col(f"v{b}") > 0, F.lit(2 ** (SIMHASH_BITS - 1 - b))).otherwise(
            F.lit(0)
        )
        sig = term if sig is None else sig + term
    return votes.select("doc", sig.cast("long").alias("simhash"))


def sql_simhash(table: str, text_col: str, id_col: str) -> str:
    bit_exprs = []
    for b in range(SIMHASH_BITS):
        digit = f"(strpos('{_HEX}', substr(h, {1 + b // 4}, 1)) - 1)"
        bit = f"(CAST(floor({digit} / {2 ** (3 - b % 4)}) AS BIGINT) % 2)"
        bit_exprs.append(f"SUM({bit} * 2 - 1) AS v{b}")
    sig = " + ".join(
        f"(CASE WHEN v{b} > 0 THEN {2 ** (SIMHASH_BITS - 1 - b)} ELSE 0 END)"
        for b in range(SIMHASH_BITS)
    )
    return f"""
WITH ex AS (
  SELECT {id_col} AS doc, md5(unnest({sql_tokens(f'lower({text_col})')})) AS h
  FROM {table}
), votes AS (
  SELECT doc, {', '.join(bit_exprs)} FROM ex GROUP BY doc
)
SELECT doc, CAST({sig} AS BIGINT) AS simhash FROM votes
"""


def simhash_pairs(
    df: DataFrame, text_col: str, id_col: str, max_hamming: int = 3
) -> DataFrame:
    """Near-dup pairs with SimHash hamming distance ≤ max_hamming.

    Pigeonhole banding: split the signature into max_hamming+1 chunks; any
    pair within distance max_hamming shares at least one exact chunk → join
    per chunk (equi-join, shuffle on short keys), union, exact-verify with
    bit_count(xor). No all-pairs comparison.
    """
    n_chunks = max_hamming + 1
    chunk_bits = SIMHASH_BITS // n_chunks
    sig = simhash(df, text_col, id_col)
    chunks = sig.select(
        "doc",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(ci).alias("chunk"),
                        (
                            F.shiftright(F.col("simhash"), ci * chunk_bits)
                            % (2 ** chunk_bits)
                        ).alias("ckey"),
                    )
                    for ci in range(n_chunks)
                ]
            )
        ).alias("c"),
    ).select("doc", "simhash", "c.chunk", "c.ckey")
    cand = (
        chunks.alias("x")
        .join(chunks.alias("y"), on=["chunk", "ckey"])
        .where(F.col("x.doc") < F.col("y.doc"))
        .select(
            F.col("x.doc").alias("id_a"),
            F.col("y.doc").alias("id_b"),
            F.col("x.simhash").alias("sig_a"),
            F.col("y.simhash").alias("sig_b"),
        )
        .distinct()
    )
    ham = F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
    return (
        cand.withColumn("hamming", ham.cast("integer"))
        .where(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


# ---------------------------------------------------------------------------
# Embedding-cosine near-dup (small-scale / oracle path)
# ---------------------------------------------------------------------------

_NORM_EXPR = (
    "sqrt(aggregate({v}, CAST(0 AS double), "
    "(acc, x) -> acc + double(x) * double(x)))"
)
_DOT_EXPR = (
    "aggregate(zip_with({a}, {b}, (x, y) -> double(x) * double(y)), "
    "CAST(0 AS double), (acc, v) -> acc + v)"
)


def vec_norm(vec_name: str) -> Column:
    """‖v‖ of a NAMED array column (SQL-parsed scalar fold). Compute it
    once per vector BEFORE a join/crossJoin: norms are per-vector, and
    hoisting them turns the per-pair work into a single dot fold."""
    return F.expr(_NORM_EXPR.format(v=vec_name))


def vec_dot(a_name: str, b_name: str) -> Column:
    """Dot product of two NAMED array columns, left-to-right double
    accumulation (same order as cosine_sim's fold)."""
    return F.expr(_DOT_EXPR.format(a=a_name, b=b_name))


def cosine_sim_expr(a_name: str, b_name: str) -> Column:
    """cosine over NAMED columns: three SQL-parsed scalar folds. Sibling
    folds are safe here because SQL-parsed lambdas bind their variables
    correctly — the PySpark 4.1 mis-binding hits *python-lambda* siblings
    only (see cosine_sim below). No struct allocation per element, so
    prefer this (or hoisted vec_norm/vec_dot) on per-pair hot paths."""
    dot = _DOT_EXPR.format(a=a_name, b=b_name)
    na = _NORM_EXPR.format(v=a_name)
    nb = _NORM_EXPR.format(v=b_name)
    return F.expr(f"({dot}) / ({na} * {nb})")


def cosine_sim(a: Column, b: Column) -> Column:
    """Cosine similarity of two array<float/double> columns, computed in
    double with deterministic left-to-right accumulation (zip_with +
    aggregate are sequential per row).

    Structured as ONE fold — zip the pair, then a single ``aggregate``
    accumulating (dot, ‖a‖², ‖b‖²) in a struct — deliberately NOT three
    sibling ``aggregate`` HOFs combined arithmetically: PySpark 4.1
    mis-binds the lambda variables of sibling python-lambda higher-order
    functions nested under one expression (see
    ``_signature_from_shingles``; repeat-stability pinned in
    tests/test_similarity.py::test_cosine_sim_repeat_stable). The
    accumulation order of each component is identical to the previous
    three-fold form (((0+x₁)+x₂)+…), so every oracle hash is unchanged."""
    pairs = F.zip_with(
        a, b, lambda x, y: F.struct(x.cast("double").alias("p"), y.cast("double").alias("q"))
    )
    acc = F.aggregate(
        pairs,
        F.struct(
            F.lit(0.0).alias("dot"), F.lit(0.0).alias("na"), F.lit(0.0).alias("nb")
        ),
        lambda s, v: F.struct(
            (s["dot"] + v["p"] * v["q"]).alias("dot"),
            (s["na"] + v["p"] * v["p"]).alias("na"),
            (s["nb"] + v["q"] * v["q"]).alias("nb"),
        ),
    )
    return acc["dot"] / (F.sqrt(acc["na"]) * F.sqrt(acc["nb"]))


def neardup_embedding_pairs(
    df: DataFrame, vec_col: str, id_col: str, threshold: float = 0.95
) -> DataFrame:
    """All pairs with cosine ≥ threshold — exact O(n²) path, used as the
    verifier/oracle and for small partitions; the scale path buckets first
    (similarity.lsh_bucket_pairs) and verifies candidates with this metric."""
    # Norms hoisted to the sides (n folds each) so the n² pair loop runs
    # one scalar dot fold per pair, not a 3-component struct fold.
    a = df.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"),
        vec_norm(vec_col).alias("_na"),
    )
    b = df.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"),
        vec_norm(vec_col).alias("_nb"),
    )
    return (
        a.crossJoin(b)
        .where(F.col("id_a") < F.col("id_b"))
        .withColumn(
            "cos_sim",
            F.round(vec_dot("va", "vb") / (F.col("_na") * F.col("_nb")), 4),
        )
        .where(F.col("cos_sim") >= threshold)
        .select("id_a", "id_b", "cos_sim")
    )


# ---------------------------------------------------------------------------
# Corpus-wide line dedup (C4-style)
# ---------------------------------------------------------------------------

def line_dedup(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """C4-style exact line dedup across the WHOLE corpus: every line keeps
    only its first occurrence (ordered by (doc id, line index)); later
    occurrences — boilerplate footers, navigation, repeated paragraphs —
    are removed from their documents, which are then reassembled in
    original line order (empty/whitespace-only lines are dropped as part
    of normalization). A document whose every line was seen before comes
    back with empty text (callers typically length-filter afterwards).

    Scale shape: posexplode lines → first-occurrence = min(struct(id,idx))
    per line fingerprint (ONE map-side-combinable hash agg — a footer on
    10^9 pages collapses to one row per partition before the shuffle) →
    fingerprint-keyed join marks keepers (AQE skew-join splits the hot
    fingerprints' probe side) → per-doc ordered reassembly. The DuckDB
    twin (:func:`sql_line_dedup`) expresses the same thing with a window.
    """
    lines = (
        df.select(
            F.col(id_col).alias("_id"),
            F.posexplode(F.split(F.col(text_col), r"\r?\n")).alias("_idx", "_line"),
        )
        .select("_id", "_idx", F.trim("_line").alias("_line"))
        .where(F.col("_line") != "")
        .withColumn("_fp", F.md5(normalized_text(F.col("_line"))))
    )
    first = lines.groupBy("_fp").agg(
        F.min(F.struct(F.col("_id").alias("i"), F.col("_idx").alias("x"))).alias("_m")
    )
    kept = (
        lines.join(first, "_fp")
        .where((F.col("_id") == F.col("_m.i")) & (F.col("_idx") == F.col("_m.x")))
    )
    rebuilt = kept.groupBy("_id").agg(
        F.expr(
            "array_join(transform(array_sort(collect_list(struct(_idx, _line))), "
            "s -> s._line), '\n')"
        ).alias("_text")
    )
    return (
        df.select(id_col)
        .distinct()
        .join(rebuilt.withColumnRenamed("_id", id_col), id_col, "left")
        .select(id_col, F.coalesce(F.col("_text"), F.lit("")).alias(text_col))
    )


def sql_line_dedup(input_sql: str, id_col: str, text_col: str) -> str:
    """DuckDB twin: 0-based line index via range() (matches posexplode),
    first occurrence via a window, ordered string_agg reassembly."""
    norm = "lower(trim(regexp_replace(_line, '\\s+', ' ', 'g')))"
    return f"""
WITH ld_docs AS (
  SELECT {id_col}, string_split_regex({text_col}, '\\r?\\n') AS _ls
  FROM ({input_sql})
), ld_idx AS (
  SELECT {id_col}, _ls, unnest(range(0, len(_ls))) AS _idx FROM ld_docs
), ld_lines AS (
  SELECT {id_col}, _idx, trim(_ls[_idx + 1]) AS _line FROM ld_idx
), ld_fp AS (
  SELECT {id_col}, _idx, _line, md5({norm}) AS _fp
  FROM ld_lines WHERE _line <> ''
), ld_kept AS (
  SELECT {id_col}, _idx, _line FROM (
    SELECT *, row_number() OVER (
      PARTITION BY _fp ORDER BY {id_col}, _idx) AS _rn
    FROM ld_fp) WHERE _rn = 1
), ld_rebuilt AS (
  SELECT {id_col}, string_agg(_line, chr(10) ORDER BY _idx) AS _text
  FROM ld_kept GROUP BY {id_col}
)
SELECT d.{id_col}, coalesce(r._text, '') AS {text_col}
FROM (SELECT DISTINCT {id_col} FROM ({input_sql})) d
LEFT JOIN ld_rebuilt r USING ({id_col})
"""
