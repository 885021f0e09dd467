"""Image-HDU helpers.

The reference's example pipeline reassembles full 2-D images from the
per-row DataFrame with ``df.rdd.coalesce(1).glom()`` — a driver-bound,
order-fragile pattern (``examples/python/im2cat.py:81-99``). Here it is a
DataFrame-native groupBy: scan partitions are emitted in (file, offset)
order, so a ``monotonically_increasing_id`` taken directly on the scan
output is monotone in row order; sorting each plane's collected rows by
it reconstructs the image without any driver collection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def reassemble_images(df: DataFrame) -> DataFrame:
    """(Image: array, ImgIndex: long) rows → one row per z-plane:
    (ImgIndex, image: array<array<elem>>, n_rows).

    Must be called on the raw ``fits`` image scan output (before any
    reordering transformation), because row order is what defines pixel
    row position within a plane."""
    with_pos = df.withColumn("_pos", F.monotonically_increasing_id())
    return (
        with_pos.groupBy("ImgIndex")
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("_pos"), F.col("Image")))
            ).alias("_rows"),
        )
        .select(
            "ImgIndex",
            F.transform(F.col("_rows"), lambda r: r.Image).alias("image"),
            F.size(F.col("_rows")).alias("n_rows"),
        )
    )


def image_stats(df: DataFrame) -> DataFrame:
    """Per-plane pixel statistics straight off the scan (no reassembly
    needed): min/max/sum over the flattened pixels, all-JVM."""
    px = F.explode("Image").alias("px")
    flat = df.select("ImgIndex", px)
    return flat.groupBy("ImgIndex").agg(
        F.count("*").alias("n_px"),
        F.min("px").alias("min_px"),
        F.max("px").alias("max_px"),
        F.sum(F.col("px").cast("double")).alias("sum_px"),
    )
