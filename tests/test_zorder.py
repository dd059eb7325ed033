"""Z-order clustering: Morton-code correctness + the actual data-skipping
benefit (per-file bounding boxes must shrink in BOTH dimensions vs a
single-column sort layout)."""

import pyspark.sql.functions as F

from big_data_analytics_project_spark.operators.zorder import (
    cluster_by_zorder,
    quantize,
    zvalue,
)
from big_data_analytics_project_spark.sources import read_table


def test_morton_code_known_values(spark):
    """zvalue interleaves bits: dim0 on even positions, dim1 on odd."""
    df = spark.createDataFrame([(3, 5)], "x long, y long")
    # x=0b011 → bits at pos 0,2 ; y=0b101 → bits at pos 1,5
    # z = 0b100111 = 39
    got = df.select(
        zvalue([F.col("x"), F.col("y")], bits=3).alias("z")
    ).collect()[0]["z"]
    assert got == 0b100111


def test_quantize_range_and_clamp(spark):
    df = spark.createDataFrame([(0,), (50,), (100,), (999,)], "v long")
    out = [
        r["q"]
        for r in df.select(quantize(F.col("v"), 0, 100, bits=8).alias("q")).collect()
    ]
    assert out[0] == 0 and out[2] == 255 and out[3] == 255  # clamped
    assert 0 < out[1] < 255


def _file_stats(spark, path):
    """Per-parquet-file (user_id, epoch) bounding boxes."""
    df = spark.read.parquet(path).select(
        "user_id",
        F.unix_timestamp("ts").alias("ep"),
        F.input_file_name().alias("f"),
    )
    return (
        df.groupBy("f")
        .agg(
            (F.max("user_id") - F.min("user_id")).alias("du"),
            (F.max("ep") - F.min("ep")).alias("dt"),
        )
        .collect()
    )


def test_zorder_layout_shrinks_bounding_boxes(spark, sf_dir, tmp_path):
    ev = read_table(spark, sf_dir, "events")
    # quantization ranges from the data itself (in production: a stats
    # pass) — a range much wider than the data collapses that dimension
    bounds = ev.agg(
        F.max("user_id").alias("hu"),
        F.min(F.unix_timestamp("ts")).alias("lt"),
        F.max(F.unix_timestamp("ts")).alias("ht"),
    ).collect()[0]
    hi_u, lo_t, hi_t = bounds["hu"], bounds["lt"], bounds["ht"]
    z = zvalue(
        [
            quantize(F.col("user_id"), 0, hi_u),
            quantize(F.unix_timestamp("ts"), lo_t, hi_t),
        ]
    )
    n_files = 8
    z_path = str(tmp_path / "zorder")
    cluster_by_zorder(ev, z, n_files).write.parquet(z_path)
    lin_path = str(tmp_path / "linear")
    # baseline: clustered on time only (the "natural" ingest order)
    ev.repartitionByRange(n_files, "ts").sortWithinPartitions("ts").write.parquet(
        lin_path
    )

    def mean_norm_widths(stats):
        span_u, span_t = hi_u, hi_t - lo_t
        n = len(stats)
        return (
            sum(r["du"] / span_u for r in stats) / n,
            sum(r["dt"] / span_t for r in stats) / n,
        )

    z_du, z_dt = mean_norm_widths(_file_stats(spark, z_path))
    lin_du, lin_dt = mean_norm_widths(_file_stats(spark, lin_path))
    # the win is per-DIMENSION balance, not area (area is ~rows/file for
    # any layout on uniform data): the time-sorted baseline has every
    # file spanning the full user range (lin_du ≈ 1 → user filters skip
    # nothing), while z-order must make BOTH dimensions prunable
    assert lin_du > 0.9, lin_du
    assert z_du < 0.7, (z_du, lin_du)
    assert z_dt < 0.7, (z_dt, lin_dt)
