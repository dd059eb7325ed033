"""Vector math over ``array<float|double>`` columns — pure JVM-side
higher-order functions (no UDFs, no Python round-trips).

Determinism contract: every fold is an explicit *sequential left fold* in
double precision (``F.aggregate``), so results are bit-identical to any
engine that folds the same way (the DuckDB oracles use ``list_reduce``).
That property is what lets cosine similarities be value-hash-compared
across engines.

At 100 TB these expressions run inside whole-stage codegen over the Arrow/
Parquet column batches — a 64-dim dot product is ~64 fused multiply-adds
per row, no shuffle, no Python.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column


def as_double(vec: Column | str) -> Column:
    return F.col(vec).cast("array<double>") if isinstance(vec, str) else vec.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    """Sequential left-fold dot product in double."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def norm2(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm2(a) * norm2(b))


def l2sq(a: Column, b: Column) -> Column:
    """Sequential left-fold squared Euclidean distance in double."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_normalize(a: Column) -> Column:
    """Unit-normalize (fold norm, per-element divide — deterministic).
    On unit vectors L2 distance is monotone in cosine
    (||q−v||² = 2−2·cos), so L2-based structures (PQ/IVF ADC) rank
    identically to cosine — the standard trick for cosine-metric ANN."""
    n = norm2(a)
    return F.transform(a, lambda x: x / n)


def duck_l2_normalize(a_expr: str) -> str:
    """DuckDB mirror of :func:`l2_normalize`."""
    n = f"sqrt(list_reduce(list_transform({a_expr}, x -> x*x), (acc, x) -> acc + x))"
    return f"list_transform({a_expr}, x -> x / {n})"


def arrow_pairwise_cosine(
    df: "DataFrame",
    a_col: str,
    b_col: str,
    out_col: str,
) -> "DataFrame":
    """Append ``out_col = cosine(a_col, b_col)`` via ONE vectorized Arrow
    kernel and DROP the two vector columns — the §4.2 bridge for per-row
    cosine folds (r17).

    Bit-equality contract: the JVM expression :func:`cosine` is a
    sequential left fold per row (``acc = (acc + a_i*b_i)`` from 0.0, one
    IEEE rounding per multiply and per add, then ``dot/(sqrt(na)*sqrt(nb))``).
    The kernel reproduces the identical operation sequence DIMENSION-major:
    ``acc += a[:, i] * b[:, i]`` runs the same multiply-then-add per row
    per dimension (numpy float64 ops are single-rounded IEEE, no FMA
    fusion), so every row's accumulator passes through the same values and
    the result is bit-identical — the same recipe the r16 SimHash kernel
    proved, extended to float folds.  numpy's own reductions (einsum,
    ``.sum``) use pairwise summation and would NOT be bit-identical.

    Input contract (asserted): vectors non-null and rectangular within a
    batch — true of every embedding fixture and of anything this engine's
    operators feed it.  The interpreted-HOF form stays available as the
    plain :func:`cosine` expression.
    """
    import numpy as np
    import pandas as pd

    passthrough = [f.name for f in df.schema.fields if f.name not in (a_col, b_col)]
    out_fields = ", ".join(
        [
            f"{f.name} {f.dataType.simpleString()}"
            for f in df.schema.fields
            if f.name in passthrough
        ]
        + [f"{out_col} double"]
    )

    def kernel(batches):
        for pdf in batches:
            if len(pdf) == 0:
                yield pdf[passthrough].assign(**{out_col: pd.Series([], dtype="float64")})
                continue
            a = np.stack(pdf[a_col].to_numpy())
            b = np.stack(pdf[b_col].to_numpy())
            assert a.dtype == np.float64 and b.dtype == np.float64, (
                a.dtype,
                b.dtype,
            )
            n, d = a.shape
            dot_ = np.zeros(n)
            na = np.zeros(n)
            nb = np.zeros(n)
            for i in range(d):
                ai = a[:, i]
                bi = b[:, i]
                dot_ += ai * bi
                na += ai * ai
                nb += bi * bi
            out = pdf[passthrough].copy()
            out[out_col] = dot_ / (np.sqrt(na) * np.sqrt(nb))
            yield out

    return df.mapInPandas(kernel, out_fields)


def sign_bucket(a: Column, n_bits: int = 8) -> Column:
    """Random-hyperplane-style LSH bucket from the signs of the first
    ``n_bits`` dimensions (axis-aligned hyperplanes — deterministic and
    cheap; a learned rotation would go here for production recall).
    Returns a BIGINT bucket id in [0, 2^n_bits)."""
    bits = [
        (F.element_at(a, i + 1) >= 0).cast("long") * F.lit(2**i) for i in range(n_bits)
    ]
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out


# DuckDB-side mirrors (kept adjacent so both definitions evolve together).

def duck_cosine(a_expr: str, b_expr: str) -> str:
    """DuckDB SQL mirroring :func:`cosine` exactly.

    DuckDB 1.0's two-arg ``list_reduce`` folds from the first element;
    Spark's ``aggregate`` starts at 0.0 — identical bitwise because
    ``0.0 + x == x`` for finite doubles, and both fold left sequentially.
    """
    d = (
        f"list_reduce(list_transform(list_zip({a_expr}, {b_expr}), p -> p[1]*p[2]), "
        f"(acc, x) -> acc + x)"
    )
    na = f"sqrt(list_reduce(list_transform({a_expr}, x -> x*x), (acc, x) -> acc + x))"
    nb = f"sqrt(list_reduce(list_transform({b_expr}, x -> x*x), (acc, x) -> acc + x))"
    return f"({d} / ({na} * {nb}))"


def duck_l2sq(a_expr: str, b_expr: str) -> str:
    """DuckDB SQL mirroring :func:`l2sq` exactly (same sequential left
    fold; the first-element seed vs Spark's 0.0 seed is bit-identical
    because ``0.0 + x == x`` for finite doubles)."""
    return (
        f"list_reduce(list_transform(list_zip({a_expr}, {b_expr}), "
        f"p -> (p[1]-p[2])*(p[1]-p[2])), (acc, x) -> acc + x)"
    )


def duck_sign_bucket(a_expr: str, n_bits: int = 8) -> str:
    terms = " + ".join(
        f"CAST({a_expr}[{i + 1}] >= 0 AS BIGINT) * {2**i}" for i in range(n_bits)
    )
    return f"({terms})"
