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


def with_plane_rows(df: DataFrame) -> DataFrame:
    """Adds ``y`` — each row's 0-based row index WITHIN its plane — to
    the raw image scan output. Scan partitions emit rows in (file,
    offset) order, so ``monotonically_increasing_id`` is monotone in
    pixel-row order and a per-plane ``row_number`` recovers the y
    coordinate exactly. One shuffle, keyed by plane; per-plane state is
    bounded by the image height (a window over one plane's rows), so a
    10,000-plane cube fans out across the cluster while each plane
    sorts at most NAXIS2 longs.

    Must be called on the raw scan output (before reordering), same
    contract as :func:`reassemble_images`."""
    from pyspark.sql.window import Window

    with_pos = df.withColumn("_pos", F.monotonically_increasing_id())
    w = Window.partitionBy("ImgIndex").orderBy("_pos")
    return (with_pos
            .withColumn("y", F.row_number().over(w) - F.lit(1))
            .drop("_pos"))


def aperture_photometry(df: DataFrame, apertures: DataFrame,
                        radius: int) -> DataFrame:
    """Forced circular-aperture photometry over the image scan surface
    — the survey measurement loop (sum the pixels within ``radius`` of
    each target position on its plane) as a distributed plan:

    - ``apertures`` (``ap_id, plane, x, y`` — the target list, tiny
      next to the pixel data) is **broadcast**; the join keys on
      ``ImgIndex = plane`` with a ``|row.y − ap.y| ≤ radius`` residual,
      so Spark plans a broadcast hash join probed once per image row —
      the cube is scanned once, no pixel shuffle.
    - per matched row the circle's x-extent at that dy is
      ``half = floor(sqrt(r² − dy²))`` and the row's contribution is a
      JVM ``slice`` + ``aggregate`` over [x−half, x+half] — pixels
      outside every aperture's rows are never touched past the join
      filter.
    - the final per-aperture sum groups k·(2r+1) partial rows by
      ``ap_id`` — a shuffle proportional to the TARGET list, not the
      image.

    Pixels off the image edge contribute nothing (slice clamps).
    Returns ``(ap_id, plane, flux, n_px)``."""
    rows = with_plane_rows(df)
    ap = apertures.select(
        F.col("ap_id"), F.col("plane").cast("long").alias("_p"),
        F.col("x").cast("long").alias("_ax"),
        F.col("y").cast("long").alias("_ay"))
    j = rows.join(
        F.broadcast(ap),
        (F.col("ImgIndex") == F.col("_p"))
        & (F.abs(F.col("y") - F.col("_ay")) <= F.lit(radius)))
    half = F.floor(F.sqrt(
        F.lit(radius * radius)
        - (F.col("y") - F.col("_ay")) * (F.col("y") - F.col("_ay"))
    )).cast("int")
    # 1-based slice window clamped to the row: [max(1, x-half+1), ...]
    start0 = F.greatest(F.col("_ax").cast("int") - half, F.lit(0))
    stop0 = F.least(F.col("_ax").cast("int") + half + 1,
                    F.size("Image"))          # exclusive
    seg = F.slice("Image", start0 + 1,
                  F.greatest(stop0 - start0, F.lit(0)))
    parts = j.select(
        "ap_id", F.col("_p").alias("plane"),
        F.aggregate(seg, F.lit(0.0),
                    lambda a, x: a + x.cast("double")).alias("_flux"),
        F.size(seg).alias("_n"))
    return (parts.groupBy("ap_id", "plane")
            .agg(F.sum("_flux").alias("flux"),
                 F.sum("_n").cast("long").alias("n_px")))


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
