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


def aniso_label_partials(df, label_col: str = "label", vec_col: str = "e"):
    """Per-(Arrow batch, label) partials for the anisotropy audit in ONE
    vectorized kernel (r17, guide §4.2): for every input vector compute
    its L2 norm (dimension-major sequential fold — bit-identical to the
    ``aggregate`` expression, see ``functions.vector.arrow_pairwise_cosine``
    for the argument), drop zero/NaN-norm rows (``nrm > 0``), micro-quantize
    the unit vector to the 1e-6 BIGINT grid (``floor(x/nrm*1e6 + 0.5)`` —
    the identical IEEE op sequence elementwise), then reduce per label:

      (label, n, self_q = Σ_rows Σ_d qv², comps = Σ_rows qv  [array<long>])

    All reduced quantities are INTEGERS, so in-kernel partial aggregation
    is exact and order-independent; per-batch bounds stay far inside
    int64 (≤10⁴ rows × d·10¹² ≈ 6.4·10¹⁷).  Callers finish the exact
    cross-batch reduction in Spark (decimal(38,0) where totals can
    exceed int64).  This replaces three interpreted per-row HOF chains
    (norm fold, quantize transform, self-dot fold) plus a corpus×d
    posexplode with one Arrow pass and a partials-sized explode.
    """
    import numpy as np
    import pandas as pd

    def kernel(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            a = np.stack(pdf[vec_col].to_numpy())
            labels = pdf[label_col].to_numpy()
            n_rows, d = a.shape
            nsq = np.zeros(n_rows)
            for i in range(d):
                xi = a[:, i]
                nsq += xi * xi
            nrm = np.sqrt(nsq)
            keep = nrm > 0
            if not keep.any():
                continue
            a = a[keep]
            nrm = nrm[keep]
            labels = labels[keep]
            qv = np.empty(a.shape, dtype=np.int64)
            for i in range(a.shape[1]):
                qv[:, i] = np.floor(a[:, i] / nrm * 1000000.0 + 0.5)
            labs = np.unique(labels)
            out = {
                "label": labs.astype(np.int64),
                "n": np.empty(len(labs), dtype=np.int64),
                "self_q": np.empty(len(labs), dtype=np.int64),
                "comps": [],
            }
            for j, lab in enumerate(labs):
                rows = qv[labels == lab]
                out["n"][j] = rows.shape[0]
                out["self_q"][j] = (rows * rows).sum(dtype=np.int64)
                out["comps"].append(rows.sum(axis=0, dtype=np.int64))
            yield pd.DataFrame(out)

    return df.select(label_col, vec_col).mapInPandas(
        kernel, "label long, n long, self_q long, comps array<long>"
    )
