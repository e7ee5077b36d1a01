"""Bloom-bitmap prefiltered exact dedup against a historical corpus (X100).

Cross-snapshot exact dedup at CDC scale: every incoming epoch must
answer "is this content hash already somewhere in the 10^10-row
history?". The naive `new ANTI JOIN history` re-shuffles the HISTORY
side every epoch; a Bloom filter answers "definitely not seen" for the
typical crawl batch (mostly genuinely-new content) without touching
history at all, and Dolma's dedup stage is built on exactly this
(Soldaini et al. 2024, §dedup; Bloom 1970).

Representation — the bitmap IS a DataFrame: `(word_idx long, word
long)`, one row per NON-ZERO 64-bit word of an m-bit filter. That makes
it

- buildable with one hash agg (`explode` k bit positions per key →
  `groupBy(word_idx)` + `bit_or` of the single-bit words) — map-side
  combinable, no driver state, no UDAF;
- mergeable across epochs with the SAME agg (union → bit_or) — the
  standard Bloom union law, so per-epoch filters fold into a corpus
  filter in O(words);
- sparse: storage is bounded by set bits, not m, so a generously-sized
  m costs nothing while the corpus is small;
- broadcastable for probing: m = 2^27 bits is 2M words ~ 16 MB — fine
  for a broadcast join against each epoch, vs shuffling 10^10 history
  rows.

Bit positions: k <= 4 slices of 8 hex chars from ONE md5 per key (the
repo's engine-portable hashing convention, `operators/sampling.py`),
each reduced mod m. No per-row Python anywhere — the whole build/probe
is native Column expressions.

Probe/verify (`dedup_against_history`): rows where ANY of the k bits is
unset are DEFINITELY new and bypass the join; only the maybe-hits
(false-positive rate ~ (set_bits/m)^k plus true dups) are verified with
an exact anti-join against history. Output = EXACTLY `new ANTI JOIN
history` — the filter only decides who pays for the join, never the
answer — which is what makes the operator oracle-checkable.

Reference: no counterpart (the Rust pipeline replaces whole datasets per
run; see /root/reference/src/storage/mod.rs).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

__all__ = [
    "bloom_build",
    "bloom_merge",
    "bloom_probe",
    "dedup_against_history",
]

_MAX_K = 4  # one md5 = 128 bits = four 32-bit slices


def _positions(key_col: str, m_bits: int, k: int, seed: str) -> F.Column:
    """Array of k bit positions for a key — k 32-bit slices of one md5,
    each mod m. Engine-portable (md5 + string ops only)."""
    if not 1 <= k <= _MAX_K:
        raise ValueError(f"need 1 <= k <= {_MAX_K} (one md5 = 4 slices)")
    if m_bits < 64:
        raise ValueError("need m_bits >= 64")
    h = F.md5(F.concat(F.lit(f"{seed}:"), F.col(key_col).cast("string")))
    return F.array(
        *[
            (F.conv(F.substring(h, 1 + 8 * i, 8), 16, 10).cast("long") % m_bits)
            for i in range(k)
        ]
    )


def bloom_build(
    df: DataFrame, key_col: str, m_bits: int = 1 << 27, k: int = 4,
    seed: str = "bloom",
) -> DataFrame:
    """Sparse Bloom bitmap of a key column: (word_idx, word), non-zero
    words only. One explode + one bit_or hash agg."""
    pos = _positions(key_col, m_bits, k, seed)
    return (
        df.where(F.col(key_col).isNotNull())
        .select(F.explode(pos).alias("_p"))
        .select(
            (F.col("_p") / 64).cast("long").alias("word_idx"),
            # SQL expr: pyspark's shiftleft() wants a literal shift amount
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(_p % 64 AS INT))").alias("_b"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("_b").alias("word"))
    )


def bloom_merge(*blooms: DataFrame) -> DataFrame:
    """Union of Bloom filters built with the same (m, k, seed): pointwise
    bit_or — the per-epoch filters fold into a corpus filter."""
    if not blooms:
        raise ValueError("need at least one bloom")
    out = blooms[0]
    for b in blooms[1:]:
        out = out.unionByName(b)
    return out.groupBy("word_idx").agg(F.bit_or("word").alias("word"))


def bloom_probe(
    df: DataFrame, key_col: str, bloom: DataFrame,
    m_bits: int = 1 << 27, k: int = 4, seed: str = "bloom",
) -> DataFrame:
    """Adds `_maybe` (boolean): true iff ALL k bits are set — the key MAY
    be in the filtered set; false is a certainty of absence. The bitmap
    side is broadcast; the probed frame never shuffles."""
    pos = F.explode(_positions(key_col, m_bits, k, seed)).alias("_p")
    probes = df.select(F.col(key_col).alias("_pk"), pos).select(
        "_pk",
        (F.col("_p") / 64).cast("long").alias("word_idx"),
        (F.col("_p") % 64).cast("int").alias("_bit"),
    )
    hit = (
        probes.join(F.broadcast(bloom), "word_idx", "left")
        .select(
            "_pk",
            (
                F.expr(
                    "shiftrightunsigned(coalesce(word, CAST(0 AS BIGINT)), _bit)"
                ).bitwiseAND(F.lit(1).cast("long"))
                == 1
            ).cast("int").alias("_hit"),
        )
        .groupBy("_pk")
        .agg((F.min("_hit") == 1).alias("_maybe"))
    )
    return df.join(hit, df[key_col] == hit["_pk"], "left").drop("_pk")


def dedup_against_history(
    new: DataFrame, history: DataFrame, key_col: str,
    m_bits: int = 1 << 27, k: int = 4, seed: str = "bloom",
) -> DataFrame:
    """Rows of `new` whose key does NOT occur in `history` — exactly
    `new ANTI JOIN history ON key` (NULL keys in `new` are kept: a NULL
    never equals anything under anti-join semantics; NULL history keys
    set no bits). The Bloom probe routes definitely-new rows AROUND the
    join; only maybe-hits are verified."""
    bloom = bloom_build(history, key_col, m_bits, k, seed)
    probed = bloom_probe(new, key_col, bloom, m_bits, k, seed)
    definite_new = probed.where(
        F.col(key_col).isNull() | ~F.coalesce(F.col("_maybe"), F.lit(False))
    ).drop("_maybe")
    maybe = probed.where(
        F.col(key_col).isNotNull() & F.coalesce(F.col("_maybe"), F.lit(False))
    ).drop("_maybe")
    verified_new = maybe.join(
        history.select(F.col(key_col).alias("_hk")).where(
            F.col("_hk").isNotNull()
        ).distinct(),
        maybe[key_col] == F.col("_hk"),
        "left_anti",
    )
    return definite_new.unionByName(verified_new)
