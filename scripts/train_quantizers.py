"""Regenerate the pinned IVF centroid and PQ codebook literals.

The ANN queries pin their quantizers as checked-in literals (pure
expression evaluation, mirrored in the DuckDB oracles); this script is
the provenance — rerun it if the embeddings fixture or the quantizer
hyperparameters change, then paste the printed literals into
``plans/ivf_centroids.py`` / ``plans/pq_codebooks.py``:

    python scripts/train_quantizers.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    from big_data_analytics_project_spark.operators.similarity import (
        train_coarse_centroids,
        train_pq_codebooks,
    )
    from big_data_analytics_project_spark.session import get_spark
    from big_data_analytics_project_spark.sources.readers import read_table

    spark = get_spark("train-quantizers")
    spark.sparkContext.setLogLevel("ERROR")
    emb = read_table(spark, sf_dir, "embeddings")

    cents = train_coarse_centroids(emb, n_centroids=16, max_iter=5, seed=42)
    print("IVF_CENTROIDS = [")
    for c in cents:
        print(f"    {c},")
    print("]")

    books = train_pq_codebooks(emb, m=8, k=16, max_iter=5, seed=42)
    print("PQ_CODEBOOKS = [")
    for b in books:
        print("    [")
        for c in b:
            print(f"        {c},")
        print("    ],")
    print("]")


if __name__ == "__main__":
    main()
