"""Z-order (Morton-curve) clustering for multi-dimensional data skipping
(the Delta/Iceberg ``OPTIMIZE ZORDER BY`` layout technique, rebuilt on
plain parquet).

Columnar scans skip files by per-file min/max: a layout sorted on ONE
column gives tight ranges for that column only — filters on a second
column still read every file.  Interleaving the bits of several quantized
columns into one Morton code and range-partition-sorting by it keeps each
file's bounding box small in EVERY dimension, so predicates on any of the
z-columns prune files.

Determinism: columns are quantized with EXPLICIT ranges (integer
arithmetic, no sampled statistics), so the code — and therefore the
layout — is a pure function of the row, reproducible across engines and
runs (on a cluster, compute the ranges once with a stats pass and pass
them in).  Everything is codegen'd bit arithmetic; clustering cost is one
range shuffle + in-partition sort, the same as any sorted write.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def quantize(col: Column, lo: int, hi: int, bits: int = 16) -> Column:
    """Map an integer-valued column into [0, 2^bits) with integer-only
    arithmetic (clamped to the declared range)."""
    span = hi - lo
    clamped = F.greatest(F.least(col.cast("long"), F.lit(hi)), F.lit(lo))
    # products stay < 2^53 (exact in double); explicit floor, not cast,
    # because DuckDB's BIGINT cast rounds (docs/determinism.md)
    return F.floor((clamped - lo) * ((1 << bits) - 1) / span).cast("long")


def zvalue(quantized: list[Column], bits: int = 16) -> Column:
    """Morton code: bit b of dimension j lands at position b*d + j."""
    d = len(quantized)
    out = F.lit(0).cast("long")
    for j, q in enumerate(quantized):
        for b in range(bits):
            out = out + F.shiftleft(
                F.shiftright(q, b).bitwiseAND(F.lit(1)), b * d + j
            )
    return out


def cluster_by_zorder(
    df: DataFrame, z: Column, n_files: int
) -> DataFrame:
    """Range-partition by the Morton code and sort within partitions —
    each output file then covers a compact z-range, i.e. a small
    bounding box in every interleaved dimension."""
    return df.repartitionByRange(n_files, z.alias("__z")).sortWithinPartitions(
        z.alias("__z")
    )


def duck_zvalue(q_exprs: list[str], bits: int = 16) -> str:
    """DuckDB SQL mirror of ``zvalue`` over pre-quantized expressions."""
    d = len(q_exprs)
    terms = [
        f"(((({q}) >> {b}) & 1) << {b * d + j})"
        for j, q in enumerate(q_exprs)
        for b in range(bits)
    ]
    return " + ".join(terms)
