"""Z-order (Morton-curve) clustering expression for multi-dimension skipping.

``compact(cluster_by=[c])`` linear sort makes parquet row-group min/max tight
on ONE dimension; a second sort column's stats stay near-full-range in every
row group, so range predicates on it skip nothing. Z-ordering interleaves the
bits of several dimensions so rows close in the curve are close in EVERY
dimension — each row group then covers a small hyper-rectangle and pushed
range predicates on any of the clustered columns skip whole groups (the
Delta ``OPTIMIZE ... ZORDER BY`` / Iceberg sort-order analog).

Construction (all native Column expressions — JVM-side, codegen-friendly):

1. map each column to a double that preserves its ordering (numerics and
   timestamps cast; dates via days-since-epoch; strings via their first 7
   bytes read as a big-endian integer — lexicographic order preserved to
   that prefix);
2. min-max scale to ``[0, 2^bits)`` using one column-pruned aggregate over
   the frame being rewritten (a scalar collect — metadata-scale, the only
   extra pass Z-ordering costs);
3. interleave the quantized bits round-robin across columns into one long.

Rank-based quantization (exact quantiles) would resist skewed value
distributions better but needs a global sort per column; min-max scaling is
one cheap agg and is the right trade for compaction, where the win is
locality, not perfect balance.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame
from pyspark.sql.types import (
    ByteType,
    DateType,
    DecimalType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    ShortType,
    StringType,
    TimestampType,
)

_NUMERIC = (
    ByteType, ShortType, IntegerType, LongType, FloatType, DoubleType, DecimalType,
)


def _as_double(col: Column, dtype) -> Column:
    """Order-preserving map of a supported column type onto double."""
    if isinstance(dtype, _NUMERIC) or isinstance(dtype, TimestampType):
        return col.cast("double")
    if isinstance(dtype, DateType):
        return F.datediff(col, F.lit("1970-01-01")).cast("double")
    if isinstance(dtype, StringType):
        # First 7 bytes as a big-endian integer: 14 hex chars always fit a
        # positive long, and lexicographic order is preserved to that
        # prefix (rpad so short strings compare at the same width).
        return F.conv(
            F.rpad(F.substring(F.hex(F.encode(col, "UTF-8")), 1, 14), 14, "0"),
            16, 10,
        ).cast("double")
    raise ValueError(f"zorder does not support column type {dtype}")


def interleave_bits(scaled: list[Column], bits: int) -> Column:
    """Morton-interleave ``bits`` low bits of each quantized long column,
    round-robin: output bit ``i * ncols + j`` = input bit ``i`` of col ``j``."""
    ncols = len(scaled)
    z = F.lit(0).cast("long")
    for i in range(bits):
        for j, s in enumerate(scaled):
            bit = F.shiftright(s, i).bitwiseAND(F.lit(1).cast("long"))
            z = z.bitwiseOR(F.shiftleft(bit, i * ncols + j))
    return z


def zorder_expr(df: DataFrame, cols: list[str], bits: int | None = None) -> Column:
    """A sortable Z-value Column over ``cols`` of ``df``.

    Runs one aggregate over ``df`` (column-pruned min/max per clustered
    column) to fix the quantization range; everything else is a narrow
    per-row expression. ``bits`` defaults to the most precision that still
    fits every column in one signed long.
    """
    if not cols:
        raise ValueError("zorder needs at least one column")
    if bits is None:
        bits = min(16, 62 // len(cols))
    if bits * len(cols) > 62:
        raise ValueError(f"bits={bits} x {len(cols)} columns overflows a long")
    dtypes = {f.name: f.dataType for f in df.schema.fields}
    missing = [c for c in cols if c not in dtypes]
    if missing:
        raise ValueError(f"zorder columns not in frame: {missing}")
    dexpr = {c: _as_double(F.col(c), dtypes[c]) for c in cols}
    aggs = []
    for c in cols:
        aggs += [F.min(dexpr[c]).alias(f"__mn_{c}"), F.max(dexpr[c]).alias(f"__mx_{c}")]
    row = df.agg(*aggs).collect()[0]  # scalar metadata-scale collect
    top = (1 << bits) - 1
    scaled = []
    for c in cols:
        mn, mx = row[f"__mn_{c}"], row[f"__mx_{c}"]
        if mn is None or mx is None or not mx > mn:
            scaled.append(F.lit(0).cast("long"))
            continue
        frac = (dexpr[c] - F.lit(float(mn))) / F.lit(float(mx) - float(mn))
        q = F.floor(frac * F.lit(float(top)))
        # Nulls sort first: coalesce BEFORE clamping — greatest/least skip
        # null arguments, so clamping a null would yield the clamp bound
        # (the max corner) instead of 0.
        q = F.coalesce(q, F.lit(0).cast("long"))
        scaled.append(
            F.greatest(F.lit(0).cast("long"), F.least(F.lit(top).cast("long"), q))
        )
    return interleave_bits(scaled, bits).alias("__zorder")
