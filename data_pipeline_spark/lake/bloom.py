"""Per-data-file key Bloom filters for manifest-level point-lookup skipping.

Why min/max stats are not enough: ``LakeTable`` hash-buckets rows by
``xxhash64(key)``, so within a bucket every commit's file spans essentially
the full key range — the per-file ``key_min``/``key_max`` stats prune files
*across* buckets but almost never *within* one. A point lookup therefore
opens one file per commit that touched the bucket (O(commits)), even though
the key usually lives in one or two of them. A small per-file Bloom filter
over the key column prunes to just the files that (probably) contain the
key — the icelite analog of Iceberg's puffin/ndv blobs and of parquet's
column bloom filters, kept at the MANIFEST level so pruning happens
driver-side before any Spark task is launched.

Scale posture: blooms are built DISTRIBUTED (one column-pruned scan of the
key column, explode to k bit positions, ``bit_or`` per (file, word) — a
map-side-combinable hash agg), and only the finished bitsets (≤ ``cap_bits``
per file, 16 KiB at the default cap) are collected. The build is a
maintenance-time operation (see ``LakeTable.build_blooms`` /
``jobs/maintenance_job.py --build-blooms``), NOT part of the per-epoch
commit path: replay throughput is governed by the per-epoch job-count floor,
so stats jobs belong with compaction, where their cost amortizes over
long-lived files.

Hashing: position ``i`` of a key is ``pmod(xxhash64(key, cast(i as long)),
m)``. Spark's multi-argument ``xxhash64`` chains: the hash of the first
argument (seed 42) seeds the hash of the second, so the driver-side twin is
``_hash_long(i, xxh64(utf8(key), 42))`` from :mod:`.xxhash` — pinned
against the JVM by ``tests/test_bloom.py``. k independent-enough hash
functions with zero overflow-prone arithmetic (Spark 4 ANSI mode makes
``h1 + i*h2`` Kirsch-Mitzenmacher constructions throw on overflow).

A false positive merely reads one unnecessary file; a false negative is
impossible for keys present when the bloom was built. Files with no
``bloom`` entry (written before the build, or after it by newer commits)
are conservatively kept.
"""

from __future__ import annotations

from functools import lru_cache

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .xxhash import SPARK_XXHASH_SEED, _hash_long, xxh64

_M64 = (1 << 64) - 1
DEFAULT_BITS_PER_KEY = 10  # ~1.2% fpp at k=5
DEFAULT_K = 5
DEFAULT_CAP_BITS = 1 << 17  # 16 KiB/file ceiling; fpp degrades, never breaks


def choose_m(n_keys: int, bits_per_key: int = DEFAULT_BITS_PER_KEY,
             cap_bits: int = DEFAULT_CAP_BITS) -> int:
    """Bitset size for ``n_keys``: word-aligned, capped.

    The cap bounds manifest growth on very large files — a capped bloom
    has a higher false-positive rate (wasted file reads) but stays correct.
    """
    m = max(64, ((max(n_keys, 1) * bits_per_key + 63) // 64) * 64)
    return min(m, cap_bits)


def key_positions(key: str, m: int, k: int) -> list[int]:
    """Driver-side twin of the JVM position expression (see module doc)."""
    h = xxh64(key.encode("utf-8"), SPARK_XXHASH_SEED)
    out = []
    for i in range(k):
        hi = _hash_long(i, h)
        signed = hi - (1 << 64) if hi >= (1 << 63) else hi
        out.append(signed % m)  # Python % == Spark pmod for m > 0
    return out


def _position_columns(key_col: str, m_col, k: int) -> list:
    return [
        F.pmod(F.xxhash64(F.col(key_col), F.lit(i).cast("long")), m_col)
        for i in range(k)
    ]


@lru_cache(maxsize=4096)
def _words_of(hex_words: str) -> tuple[int, ...]:
    raw = bytes.fromhex(hex_words)
    return tuple(
        int.from_bytes(raw[o:o + 8], "big") for o in range(0, len(raw), 8)
    )


def might_contain(bloom: dict, key) -> bool:
    """Driver-side membership probe against a manifest bloom record
    (``{"m": bits, "k": hashes, "w": hex words}``). Non-string keys are
    conservatively ``True`` (only string keys are indexed)."""
    if not isinstance(key, str):
        return True
    m, k = int(bloom["m"]), int(bloom["k"])
    words = _words_of(bloom["w"])
    for p in key_positions(key, m, k):
        if not (words[p >> 6] >> (p & 63)) & 1:
            return False
    return True


def build_file_blooms(
    spark: SparkSession,
    groups: list[tuple[list[str], "object"]],
    key_col: str,
    bits_per_key: int = DEFAULT_BITS_PER_KEY,
    k: int = DEFAULT_K,
    cap_bits: int = DEFAULT_CAP_BITS,
) -> dict[str, dict]:
    """Bloom records per absolute file path.

    ``groups`` is ``[(abs_paths, read_schema), ...]`` — one entry per
    schema_id, mirroring the table's scan-time schema resolution, so files
    written under older schemas are read with the schema they were written
    with. Two Spark passes over just the key column: a per-file count (to
    size each file's bitset) and the bit_or aggregation. Both are
    column-pruned scans; only O(files × cap_bits/64) longs come back to
    the driver.
    """
    per_file: DataFrame | None = None
    for paths, schema in groups:
        if not {f.name for f in schema.fields} >= {key_col}:
            continue  # key column absent under this schema: no bloom
        part = (
            spark.read.schema(schema)
            .parquet(*paths)
            .select(
                F.input_file_name().alias("_f"),
                F.col(key_col).alias("_k"),
            )
            .where(F.col("_k").isNotNull())
        )
        per_file = part if per_file is None else per_file.unionByName(part)
    if per_file is None:
        return {}

    counts = {r["_f"]: r["n"] for r in
              per_file.groupBy("_f").agg(F.count(F.lit(1)).alias("n")).collect()}
    if not counts:
        return {}
    m_map = {f: choose_m(n, bits_per_key, cap_bits) for f, n in counts.items()}
    m_df = spark.createDataFrame(
        [(f, m) for f, m in m_map.items()], "_f string, _m long"
    )

    keyed = per_file.join(F.broadcast(m_df), "_f")
    pos = keyed.select(
        "_f",
        F.explode(F.array(*_position_columns("_k", F.col("_m"), k))).alias("p"),
    )
    words = (
        pos.groupBy("_f", F.shiftright(F.col("p"), 6).alias("w"))
        .agg(F.bit_or(F.expr("shiftleft(1L, int(p % 64))")).alias("bits"))
        .collect()
    )
    sets: dict[str, list[int]] = {f: [0] * (m // 64) for f, m in m_map.items()}
    for r in words:
        sets[r["_f"]][r["w"]] = r["bits"] & _M64
    return {
        f: {
            "m": m_map[f],
            "k": k,
            "w": b"".join(wd.to_bytes(8, "big") for wd in ws).hex(),
        }
        for f, ws in sets.items()
    }
