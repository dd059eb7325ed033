"""Embedding storage/compression operators.

Int8 symmetric quantization (the standard storage/serving compression for
embedding corpora: 4× smaller than float32, dot products survive to
within the quantization error).  Per-vector absmax scaling:

    scale = max(|x_i|);  q_i = round_half_up(127 * x_i / scale)

Everything is JVM-side higher-order functions (transform / array_max /
aggregate) over the array column — map-only, no shuffle, codegen'd; at
100 TB this runs at scan speed.  ``floor(v + 0.5)`` is used instead of
``round`` because banker's-rounding defaults differ across engines while
floor is IEEE-deterministic everywhere (oracle parity).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column


def absmax_scale(vec: Column) -> Column:
    """Per-vector absmax (double; float→double widening is exact)."""
    return F.array_max(F.transform(vec, lambda x: F.abs(x.cast("double"))))


def quantize_int8(vec: Column, scale: Column) -> Column:
    """Symmetric int8 code array (BIGINT elements for cross-engine schema
    stability).  Zero vectors (scale = 0) quantize to all-zero codes."""
    return F.transform(
        vec,
        lambda x: F.when(scale == 0.0, F.lit(0))
        .otherwise(F.floor(F.lit(127.0) * x.cast("double") / scale + F.lit(0.5)))
        .cast("long"),
    )
