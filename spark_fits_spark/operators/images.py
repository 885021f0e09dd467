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


def _plane_rows_and_source(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """:func:`with_plane_rows` plus its internal pixel-row
    localCheckpoint, so callers that need a second pass over the raw
    pixels (e.g. :func:`detect_sources`' sigma-clip stats) can read the
    SAME materialization instead of re-decoding the source — without
    paying the y-offset broadcast join those passes don't need."""
    from pyspark.sql.window import Window

    from spark_fits_spark.caching import tracked_local_checkpoint

    # localCheckpoint pins one evaluation (the sequence-packing
    # precedent, sample.py): _pid/_pos must mean the same thing in the
    # offsets branch and the join branch below — two independent scan
    # plannings could see different file listings (and would also
    # decode every pixel twice).
    with_pos = tracked_local_checkpoint(
        df.withColumn("_pos", F.monotonically_increasing_id())
        .withColumn("_pid", F.spark_partition_id()), eager=False)
    per = with_pos.groupBy("_pid", "ImgIndex").agg(
        F.count("*").alias("_cnt"), F.min("_pos").alias("_p0"))
    w = (Window.partitionBy("ImgIndex").orderBy("_pid")
         .rowsBetween(Window.unboundedPreceding, -1))
    offsets = per.select(
        "_pid", "ImgIndex",
        F.coalesce(F.sum("_cnt").over(w), F.lit(0)).alias("_off"), "_p0")
    rows = (with_pos
            .join(F.broadcast(offsets), ["_pid", "ImgIndex"])
            .withColumn("y", F.col("_off") + (F.col("_pos") - F.col("_p0")))
            .drop("_pos", "_pid", "_off", "_p0"))
    return rows, with_pos


def with_plane_rows(df: DataFrame) -> DataFrame:
    """Adds ``y`` — each row's 0-based row index WITHIN its plane — to
    the raw image scan output, WITHOUT shuffling the pixel data.

    Scan partitions emit rows in (file, offset) order, and
    ``monotonically_increasing_id`` is dense within a partition, so a
    plane's rows inside one partition carry consecutive ids. The
    distributed prefix-sum pattern (same as the sequence-packing
    operators) turns that into global y: aggregate (partition, plane)
    → (row count, first id) — a map-side-combined shuffle of
    #partitions·#planes-per-partition ROWS, not pixels — window the
    tiny table per plane for each partition's starting offset, and
    broadcast it back: ``y = offset + (id − first id)``. The pixel
    rows themselves never move; a one-plane 100 GB image no longer
    collapses onto a single task (which the previous per-plane
    ``row_number`` window did).

    Must be called on the raw scan output (before reordering), same
    contract as :func:`reassemble_images`."""
    return _plane_rows_and_source(df)[0]


def aperture_photometry(df: DataFrame, apertures: DataFrame,
                        radius: int,
                        prepared: bool = False) -> DataFrame:
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
    Returns ``(ap_id, plane, flux, n_px)``. ``prepared=True``
    accepts ``(ImgIndex, y, Image)`` rows directly (e.g. a
    :func:`difference_image` output — forced photometry on
    residuals IS the transient-light-curve measurement) instead
    of the raw scan."""
    rows = df if prepared else with_plane_rows(df)
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


def sigma_clipped_plane_stats(df: DataFrame, sigma: float = 3.0,
                              iters: int = 3) -> DataFrame:
    """Per-plane sigma-clipped background statistics — the distributed
    version of the reference example's astropy ``sigma_clipped_stats``
    call (``examples/python/im2cat.py:100-116``, driver-side per CCD):
    iteratively drop pixels outside mean ± sigma·std and re-estimate.

    Each round is one aggregation over the exploded pixels with the
    previous round's per-plane bounds BROADCAST back in — the pixel
    data shuffles by plane once per round, the bounds table is
    plane-count-sized. Median is ``percentile_approx`` at accuracy
    10000 (deterministic for a given dataset).

    Returns ``(ImgIndex, bg_mean, bg_median, bg_std, n_used)``."""
    flat = df.select(
        "ImgIndex", F.explode("Image").alias("_px")).withColumn(
        "_px", F.col("_px").cast("double"))
    bounds = None
    stats = None
    rounds = max(iters, 1)
    for i in range(rounds):
        cur = flat
        if bounds is not None:
            cur = (flat.join(F.broadcast(bounds), "ImgIndex")
                   .where(F.col("_px").between(F.col("_lo"), F.col("_hi")))
                   .drop("_lo", "_hi"))
        # the median only surfaces in the RETURNED stats; intermediate
        # rounds feed nothing but the mean±sigma·std bounds. Skipping
        # percentile_approx there is output-identical and drops its
        # mergeable sketch state (accuracy 10000 → ~10k tuples per
        # (plane, partial)) from every shuffle but the last.
        aggs = [F.avg("_px").alias("bg_mean"),
                F.stddev_pop("_px").alias("bg_std"),
                F.count("*").alias("n_used")]
        if i == rounds - 1:
            aggs.insert(1, F.percentile_approx("_px", 0.5, 10000)
                        .alias("bg_median"))
        stats = cur.groupBy("ImgIndex").agg(*aggs)
        bounds = stats.select(
            "ImgIndex",
            (F.col("bg_mean") - sigma * F.col("bg_std")).alias("_lo"),
            (F.col("bg_mean") + sigma * F.col("bg_std")).alias("_hi"))
    return stats.select("ImgIndex", "bg_mean", "bg_median", "bg_std",
                        "n_used")


# packed pixel-node id strides for the source-detection component graph
_YX_BITS = 20     # y, x < 2^20 - 1 enforced (±1 neighbor offsets)


def detect_sources(df: DataFrame, threshold_sigma: float = 5.0,
                   sigma: float = 3.0, iters: int = 3,
                   min_npix: int = 1,
                   connectivity: int = 8,
                   prepared: bool = False,
                   local_background_cell: int | None = None,
                   moments: bool = False) -> DataFrame:
    """Distributed source extraction over the image scan surface — the
    Spark-first replacement for the reference example's driver-side
    photutils pass (``examples/python/im2cat.py``: background stats →
    detect → measure, one CCD per task): threshold at ``bg_median +
    threshold_sigma · bg_std`` (per-plane sigma-clipped stats), label
    connected above-threshold pixels (4- or 8-connectivity), and
    measure each labeled source.

    Scale shape: only ABOVE-THRESHOLD pixels enter the component
    graph (sky is ~all background, so the graph is sparse by
    construction); neighbor edges come from an equi-join on packed
    (plane, y, x) ids — shuffle ∝ bright pixels; labels converge by
    min-label propagation (`operators.dedup.connected_components`,
    O(source diameter) rounds); measurements are one groupBy over
    bright pixels. The full cube is scanned once for stats and once
    for extraction — no per-plane driver loop, no collect.

    Returns ``(plane, source_id, n_px, flux, peak, x_centroid,
    y_centroid)`` — flux-weighted centroids, ``source_id`` = packed id
    of the component's minimum (y, x) pixel.

    ``prepared=True`` accepts ``(ImgIndex, y, Image)`` rows directly
    (e.g. a :func:`difference_image` output) instead of the raw scan —
    the only raw-scan dependency is :func:`with_plane_rows`' ordering
    contract; the background stats are ordering-free."""
    from spark_fits_spark.caching import release_after, tracked_persist
    from spark_fits_spark.operators.dedup import connected_components

    stats_src = None
    if prepared:
        rows = df
    else:
        rows, stats_src = _plane_rows_and_source(df)
    if local_background_cell is not None:
        # SExtractor's local-background mode: estimate a BACK_SIZE
        # median mesh, subtract its bilinear interpolation, and run
        # detection (stats + threshold + labeling + measurement) on
        # the RESIDUAL surface — sky gradients no longer flood one
        # corner of the field or bury sources in the other.
        mesh = background_mesh(rows, local_background_cell)
        rows = subtract_background(rows, mesh, local_background_cell)
    with release_after():
        if prepared or local_background_cell is not None:
            # prepared / local-background inputs are typically COMPOSED
            # pipelines (difference imaging, mesh subtraction): the
            # stats rounds (iters of them) and the bright build would
            # each re-evaluate the whole upstream — cache it for the
            # duration of the detection (released with the scope;
            # MEMORY_AND_DISK spills past memory at cube scale, vs
            # 1+iters upstream recomputes). The raw-scan path instead
            # rides the with_plane_rows localCheckpoint below. A frame
            # the CALLER already persisted is left alone — persisting
            # it again would hand its cache block to this scope, whose
            # exit would silently evict the caller's cache.
            lvl = rows.storageLevel
            if not (lvl.useMemory or lvl.useDisk):
                rows = tracked_persist(rows)
        # r11: on the raw-scan path the stats rounds consume the
        # with_plane_rows pixel-row localCheckpoint DIRECTLY (not the
        # y-joined `rows`, whose offsets broadcast join they would
        # otherwise re-pay per round, and not the raw `df`, which the
        # old code re-decoded once per sigma-clip round — 1 + iters
        # full decodes per detect_sources call). Output-identical:
        # same pixel multiset, same partitioning, same per-partition
        # order; the stats are ordering-free anyway. One storage scan
        # total (guide §1.2: don't compute things twice). Prepared /
        # local-background inputs keep using the persisted residual
        # rows — their stats must see the transformed surface.
        stats = sigma_clipped_plane_stats(
            stats_src if (stats_src is not None
                          and local_background_cell is None) else rows,
            sigma=sigma, iters=iters)
        thr = stats.select(
            "ImgIndex",
            (F.col("bg_median")
             + threshold_sigma * F.col("bg_std")).alias("_thr"))
        flat = rows.select(
            "ImgIndex", "y", F.posexplode("Image").alias("x", "_px"))
        # packed-id precondition: y, x < 2^20 − 1 (the stride comment
        # above is a contract, not a hope — an oversized axis would
        # alias unrelated pixels into one component). Guarded IN the
        # projection (raise_error fires while a bright row is built,
        # before any aliased id can reach the component graph) over the
        # BRIGHT set only — a per-row branch in codegen instead of the
        # r5–r7 extra max-aggregation pass over the persisted frame.
        lim = (1 << _YX_BITS) - 1
        packed = ((F.col("ImgIndex").cast("long") * (1 << _YX_BITS)
                   + F.col("y")) * (1 << _YX_BITS) + F.col("x"))
        guarded_id = F.when(
            (F.col("y") >= lim) | (F.col("x") >= lim),
            F.raise_error(F.concat(
                F.lit(f"detect_sources supports images with y, x < {lim} "
                      "(got y="),
                F.col("y").cast("string"), F.lit(", x="),
                F.col("x").cast("string"),
                F.lit("); re-tile or split the axis"))).cast("long")
        ).otherwise(packed)
        bright = (
            flat.join(F.broadcast(thr), "ImgIndex")
            .where(F.col("_px").cast("double") > F.col("_thr"))
            .select(
                "ImgIndex", "y", "x",
                F.col("_px").cast("double").alias("px"),
                guarded_id.alias("_id"))
        )
        bright = tracked_persist(bright)
        offsets = [(0, 1), (1, 0)]
        if connectivity == 8:
            offsets += [(1, 1), (1, -1)]
        elif connectivity != 4:
            raise ValueError(f"connectivity must be 4 or 8, got "
                             f"{connectivity}")
        # candidate neighbor ids (half-set: each undirected edge once);
        # off-image offsets can never collide with a real pixel because
        # x, y < 2^20 strides leave the wrapped slots unoccupied
        nbr = F.explode(F.array(*[
            F.struct(((F.col("ImgIndex").cast("long") * (1 << _YX_BITS)
                       + F.col("y") + dy) * (1 << _YX_BITS)
                      + F.col("x") + dx).alias("n"))
            for dy, dx in offsets]))
        cand = bright.select(F.col("_id").alias("_a"), nbr.alias("_s")) \
                     .select("_a", F.col("_s.n").alias("_b"))
        edges = cand.join(
            bright.select(F.col("_id").alias("_b")), "_b")
        comp = connected_components(edges, "_a", "_b")
        labeled = (
            bright.join(
                comp.withColumnRenamed("doc_id", "_id")
                    .withColumnRenamed("cluster_id", "_cl"),
                "_id", "left")
            .withColumn("_cl", F.coalesce("_cl", "_id"))  # isolated px
        )
        aggs = [F.count("*").alias("n_px"),
                F.sum("px").alias("flux"),
                F.max("px").alias("peak"),
                (F.sum(F.col("px") * F.col("x"))
                 / F.sum("px")).alias("x_centroid"),
                (F.sum(F.col("px") * F.col("y"))
                 / F.sum("px")).alias("y_centroid")]
        if moments:
            # flux-weighted CENTRAL second moments (SExtractor's
            # X2/Y2/XY shape parameters): Σw·u²/Σw − (Σw·u/Σw)² —
            # same single groupBy, no extra pass
            sp = F.sum("px")
            mx = F.sum(F.col("px") * F.col("x")) / sp
            my = F.sum(F.col("px") * F.col("y")) / sp
            aggs += [
                (F.sum(F.col("px") * F.col("x") * F.col("x")) / sp
                 - mx * mx).alias("xx_moment"),
                (F.sum(F.col("px") * F.col("y") * F.col("y")) / sp
                 - my * my).alias("yy_moment"),
                (F.sum(F.col("px") * F.col("x") * F.col("y")) / sp
                 - mx * my).alias("xy_moment")]
        out = (
            labeled.groupBy(
                F.col("ImgIndex").alias("plane"),
                F.col("_cl").alias("source_id"))
            .agg(*aggs)
            .where(F.col("n_px") >= min_npix)
        )
        # materialize before the scope releases the caches
        out = out.localCheckpoint(eager=True)
    return out


def difference_image(science: DataFrame, template: DataFrame,
                     y_col: str = "y",
                     template_values: str = "values") -> DataFrame:
    """Difference imaging: subtract one aligned template frame
    (``(y, values)`` rows — typically a :func:`coadd_planes` /
    :func:`mosaic` output) from EVERY science plane of
    ``(ImgIndex, y, Image)`` rows — statics cancel, transients and
    variables remain for :func:`detect_sources(prepared=True)`.

    The template must cover every science row index (inner join on
    y). Plan: one equi-join keyed by row index — N science planes
    against ONE template, so AQE broadcasts any template that fits;
    the combine is JVM ``zip_with``, pixels never explode. Returns
    the science rows with ``Image`` replaced by the difference."""
    t = template.select(F.col(y_col).alias("y"),
                        F.col(template_values).alias("_tv"))
    j = science.join(t, "y")
    diff = F.zip_with("Image", "_tv",
                      lambda a, b: a.cast("double") - b)
    return j.select("ImgIndex", "y", diff.alias("Image"))


def _robust_stack(g, width, method, sigma, iters):
    """median / sigma-clipped combine across planes, per position.

    ``g`` is the per-y grouped frame (``_imgs``: list of plane rows).
    Builds ONE array<array<double>> column of per-position finite
    values, then runs the robust statistic as JVM higher-order
    functions; clip rounds are successive Project nodes so the
    expression tree stays bounded (each round references the previous
    round's COLUMN, not its expression)."""
    pv = F.transform(
        F.sequence(F.lit(0), width - 1),
        lambda x: F.filter(
            F.transform(F.col("_imgs"),
                        lambda img: F.get(img, x).cast("double")),
            lambda v: v.isNotNull() & ~F.isnan(v)))
    pvd = g.select("y", "n_planes", pv.alias("_pv"))

    def asum(vals):
        return F.aggregate(vals, F.lit(0.0), lambda a, v: a + v)

    def med(vals):
        s = F.array_sort(vals)
        n = F.size(s)
        lo = F.element_at(s, F.floor((n + 1) / 2).cast("int"))
        hi = F.element_at(s, (F.floor(n / 2) + 1).cast("int"))
        return F.when(n > 0, (lo + hi) / 2)

    if method == "median":
        image = F.transform(F.col("_pv"), med)
        return pvd.select("y", image.alias("image"), "n_planes")

    # clipped_mean: median-centered, MAD-scaled rejection (astropy's
    # mad_std convention, 1.4826 ≈ 1/Φ⁻¹(3/4)). Mean/std clipping
    # cannot work here: a single outlier among n frames is at most
    # √(n−1) std from the mean, so 3σ would NEVER fire for n ≤ 10 —
    # exactly the few-exposure stacks this operator exists for.
    #
    # Expressions have no let-binding, so the median and MAD are
    # STAGED as struct fields through chained transforms — each is
    # computed once per position per round. Referencing med(vals)
    # directly inside the filter lambda re-evaluates it per element
    # (and per round inlining compounds it): measured 86 s on a
    # 25×12×16 fixture vs ~1 s staged.
    k = F.lit(float(sigma) * 1.4826)

    def med_sorted(sv):
        # median of an ALREADY-SORTED array: size/element_at only
        n = F.size(sv)
        lo = F.element_at(sv, F.floor((n + 1) / 2).cast("int"))
        hi = F.element_at(sv, (F.floor(n / 2) + 1).cast("int"))
        return F.when(n > 0, (lo + hi) / 2)

    for _ in range(iters):
        # each stage materializes ONE expensive value as a struct
        # field; the next stage reads it as a cheap field access
        s1 = F.transform(
            F.col("_pv"),
            lambda vals: F.struct(
                vals.alias("v"), F.array_sort(vals).alias("sv")))
        s2 = F.transform(
            s1, lambda s: F.struct(
                s["v"].alias("v"), med_sorted(s["sv"]).alias("m")))
        s3 = F.transform(
            s2, lambda s: F.struct(
                s["v"].alias("v"), s["m"].alias("m"),
                F.array_sort(F.transform(
                    s["v"],
                    lambda v: F.abs(v - s["m"]))).alias("sd")))
        s4 = F.transform(
            s3, lambda s: F.struct(
                s["v"].alias("v"), s["m"].alias("m"),
                med_sorted(s["sd"]).alias("mad")))
        newpv = F.transform(
            s4,
            lambda s: F.filter(
                s["v"], lambda v: F.abs(v - s["m"]) <= k * s["mad"]))
        pvd = pvd.select("y", "n_planes", newpv.alias("_pv"))
    image = F.transform(
        F.col("_pv"),
        lambda vals: F.when(F.size(vals) > 0, asum(vals) / F.size(vals)))
    n_kept = F.transform(F.col("_pv"), F.size)
    return pvd.select("y", image.alias("image"), "n_planes",
                      n_kept.alias("n_kept"))


def _weighted_stack(df, plane_weights):
    """Exposure-weighted co-addition — ``image[x] = Σ w_p·v_p(x) /
    Σ w_p`` over the finite pixels (the inverse-variance /
    exposure-time weighting of a real depth stack; ``plane_weights``
    maps ImgIndex → weight). Same single groupBy(y) as the mean
    coadd; the per-plane weight rides each collected row via one
    broadcast map literal."""
    wmap = F.create_map(*[x for k, v in sorted(plane_weights.items())
                          for x in (F.lit(int(k)), F.lit(float(v)))])
    rows = with_plane_rows(df).select(
        "y", F.struct(
            F.element_at(wmap, F.col("ImgIndex").cast("int"))
            .alias("w"), F.col("Image").alias("img")).alias("_wi"))
    g = (rows.groupBy("y")
         .agg(F.collect_list("_wi").alias("_l"),
              F.count("*").alias("n_planes")))
    width = F.size(F.col("_l")[0]["img"])
    finite = lambda v: ~F.isnan(v.cast("double"))  # noqa: E731
    psum = F.aggregate(
        "_l", F.array_repeat(F.lit(0.0), width),
        lambda acc, s: F.zip_with(
            acc, s["img"],
            lambda a, x: a + F.when(finite(x),
                                    s["w"] * x.cast("double"))
                              .otherwise(F.lit(0.0))))
    pw = F.aggregate(
        "_l", F.array_repeat(F.lit(0.0), width),
        lambda acc, s: F.zip_with(
            acc, s["img"],
            lambda a, x: a + F.when(finite(x), s["w"])
                              .otherwise(F.lit(0.0))))
    image = F.zip_with(psum, pw,
                       lambda sm, w: F.when(w > 0, sm / w))
    return g.select("y", image.alias("image"), "n_planes")


def coadd_planes(df: DataFrame, method: str = "mean",
                 sigma: float = 3.0, iters: int = 2,
                 plane_weights: dict | None = None) -> DataFrame:
    """Co-add (stack) all planes of an aligned cube into one image —
    the survey depth-building step (N dithered-and-registered exposures
    → one deeper frame): output row ``(y, image, n_planes)`` where
    ``image[x]`` combines the planes' pixels at (y, x).

    INPUT CONTRACT: the exposures must arrive as PLANES of one scan
    (a multi-plane cube file, or rows whose y aligns across planes) —
    a directory of single-plane exposure FILES scans with ImgIndex = 0
    per file, so its rows CONCATENATE in y instead of stacking
    (n_planes comes back 1 per y: inspect it). Stack such a directory
    by scanning the files into one cube first (e.g. the image sink's
    repartitionByRange-per-plane recipe).

    Plan: rows of the SAME y across planes meet on a groupBy(y) —
    one shuffle of the pixel data keyed by row index (irreducible for
    a cross-plane reduction; rows of one y spread over ≤ n_planes
    tasks' input), then the element-wise combine runs as JVM array
    expressions over the collected per-y list (state per task ≈
    n_planes·width values, independent of image height).

    ``method``: ``mean``, ``sum``, ``median`` or ``clipped_mean``.
    NaN pixels (masked/undefined) are excluded per-position under
    every method but ``sum`` (the usual coadd rule: a pixel masked in
    one exposure still stacks from the others). ``median`` is the
    robust stack (interpolating for even counts); ``clipped_mean``
    is the cosmic-ray-rejection stack — ``iters`` rounds of
    discarding pixels beyond ``sigma`` population standard deviations
    of the surviving values' mean, then the mean of what remains.
    Both run per POSITION across planes as JVM higher-order
    functions over the same single groupBy(y) — the clip iterations
    are successive Project nodes (no extra shuffle, bounded
    expression depth)."""
    if method not in ("mean", "sum", "median", "clipped_mean",
                      "wmean"):
        raise ValueError(
            f"method must be 'mean', 'sum', 'median', 'clipped_mean' "
            f"or 'wmean', got {method!r}")
    if method == "wmean":
        if not plane_weights:
            raise ValueError("wmean requires plane_weights")
        return _weighted_stack(df, plane_weights)
    rows = with_plane_rows(df)
    g = (rows.groupBy("y")
         .agg(F.collect_list("Image").alias("_imgs"),
              F.count("*").alias("n_planes")))
    width = F.size(F.col("_imgs")[0])
    if method in ("median", "clipped_mean"):
        if method == "clipped_mean" and (sigma <= 0 or iters < 1):
            raise ValueError(
                f"clipped_mean needs sigma > 0 and iters >= 1, got "
                f"sigma={sigma}, iters={iters}")
        return _robust_stack(g, width, method, sigma, iters)
    finite = lambda v: ~F.isnan(v.cast("double"))  # noqa: E731
    psum = F.aggregate(
        "_imgs", F.array_repeat(F.lit(0.0), width),
        lambda acc, img: F.zip_with(
            acc, img,
            lambda a, x: a + F.when(finite(x), x.cast("double"))
                              .otherwise(F.lit(0.0))))
    pcnt = F.aggregate(
        "_imgs", F.array_repeat(F.lit(0), width),
        lambda acc, img: F.zip_with(
            acc, img,
            lambda a, x: a + F.when(finite(x), 1).otherwise(0)))
    if method == "sum":
        image = psum
        return g.select("y", image.alias("image"), "n_planes")
    image = F.zip_with(
        psum, pcnt,
        lambda s, c: F.when(c > 0, s / c).otherwise(F.lit(None)))
    # per-position population variance over the finite pixels — the
    # depth/weight map shipped alongside a survey stack (computed in
    # the SAME pass: one extra sum-of-squares fold)
    psq = F.aggregate(
        "_imgs", F.array_repeat(F.lit(0.0), width),
        lambda acc, img: F.zip_with(
            acc, img,
            lambda a, x: a + F.when(finite(x),
                                    x.cast("double") * x.cast("double"))
                              .otherwise(F.lit(0.0))))
    variance = F.zip_with(
        F.zip_with(psq, pcnt,
                   lambda q, c: F.when(c > 0, q / c)),
        image, lambda m2, m: m2 - m * m)
    return g.select("y", image.alias("image"), "n_planes",
                    variance.alias("variance"))


def reproject_nearest(rows: DataFrame, src_wcs, dst_wcs,
                      dst_height: int, dst_width: int,
                      y_col: str = "y",
                      values_col: str = "Image") -> DataFrame:
    """Reproject ONE image onto a different TAN WCS grid by
    nearest-neighbor gather — the mosaicking primitive (Montage-style:
    resample every exposure onto a common sky grid, then
    :func:`coadd_planes` stacks them).

    ``rows`` is a single plane as ``(y_col, values_col)`` rows (the
    scan output through :func:`with_plane_rows`, filtered to one
    ``ImgIndex``). Output: one row per DESTINATION image row —
    ``(y, values, n_valid)`` with ``values[x]`` the source pixel whose
    sky position is nearest to destination pixel (x, y), NULL where
    the destination pixel falls off the source image.

    Plan shape: the destination grid is GENERATED (``spark.range`` of
    H·W index rows — no data read), each grid pixel's source position
    is closed-form column arithmetic (dst pixel→sky→src pixel via the
    two TAN transforms, ~20 JVM math calls, no UDF), and the gather
    is an equi-join keyed on the source ROW index — source pixel rows
    shuffle once by y (each row's array travels whole), grid rows
    shuffle by the source row they need. Rebuilding destination rows
    is one groupBy(y) of the matched pixels — same irreducible
    transpose shuffle as co-addition. Nothing is ever collected to
    the driver; a 100k×100k mosaic is H·W grid rows + two shuffles."""
    if dst_height < 1 or dst_width < 1:
        raise ValueError("destination shape must be positive")
    from spark_fits_spark.functions.wcs import pixel_to_sky, sky_to_pixel

    spark = rows.sparkSession
    grid = spark.range(int(dst_height) * int(dst_width)).select(
        F.floor(F.col("id") / dst_width).alias("_ydst"),
        F.pmod(F.col("id"), F.lit(int(dst_width))).alias("_xdst"))
    ra, dec = pixel_to_sky(dst_wcs, "_xdst", "_ydst")
    xs_d, ys_d = sky_to_pixel(src_wcs, ra, dec)
    g = grid.select(
        "_ydst", "_xdst",
        F.round(xs_d).cast("long").alias("_xs"),
        F.round(ys_d).cast("long").alias("_ys"))
    src = rows.select(F.col(y_col).cast("long").alias("_ys"),
                      F.col(values_col).alias("_vals"))
    j = g.join(src, "_ys", "left")
    value = F.when(
        (F.col("_xs") >= 0) & (F.col("_xs") < F.size("_vals")),
        F.element_at("_vals", (F.col("_xs") + 1).cast("int"))
    ).cast("double")
    px = j.select("_ydst", "_xdst", value.alias("_v"))
    out = (px.groupBy("_ydst")
           .agg(F.array_sort(
                    F.collect_list(F.struct("_xdst", "_v"))).alias("_row"),
                F.count("_v").alias("n_valid")))
    return out.select(
        F.col("_ydst").alias("y"),
        F.transform("_row", lambda r: r["_v"]).alias("values"),
        "n_valid")


def mosaic(exposures, dst_wcs, dst_height: int, dst_width: int,
           y_col: str = "y", values_col: str = "Image") -> DataFrame:
    """Full mosaicking: reproject every ``(rows, src_wcs)`` exposure
    onto the common ``dst_wcs`` grid (:func:`reproject_nearest`) and
    stack the resamples per destination pixel — NULL-aware mean, so a
    pixel outside one exposure's footprint still stacks from the
    others (the coadd rule). Returns ``(y, values, n_exposures)``
    where ``n_exposures[x]`` counts contributors at each position.

    Plan shape: the N reprojections are independent branches unioned
    BEFORE the final groupBy(y), so the whole mosaic is the N gather
    joins + ONE stacking shuffle keyed by destination row — depth
    grows the union, not the shuffle count. The N·H·W resampled rows
    shuffle once; per-task state is n_exposures·width values."""
    exposures = list(exposures)
    if not exposures:
        raise ValueError("mosaic needs at least one exposure")
    parts = [reproject_nearest(rows, src_wcs, dst_wcs,
                               dst_height, dst_width,
                               y_col=y_col, values_col=values_col)
             .select("y", "values")
             for rows, src_wcs in exposures]
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    g = u.groupBy("y").agg(F.collect_list("values").alias("_l"))
    width = F.size(F.col("_l")[0])
    psum = F.aggregate(
        "_l", F.array_repeat(F.lit(0.0), width),
        lambda acc, v: F.zip_with(
            acc, v, lambda a, x: a + F.coalesce(x, F.lit(0.0))))
    pcnt = F.aggregate(
        "_l", F.array_repeat(F.lit(0), width),
        lambda acc, v: F.zip_with(
            acc, v,
            lambda a, x: a + F.when(x.isNotNull(), 1).otherwise(0)))
    stacked = F.zip_with(
        psum, pcnt,
        lambda s, c: F.when(c > 0, s / c).otherwise(F.lit(None)))
    return g.select("y", stacked.alias("values"),
                    pcnt.alias("n_exposures"))


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


def convolve2d(df: DataFrame, kernel,
               value_col: str = "Image") -> DataFrame:
    """Distributed 2-D kernel correlation over ``(ImgIndex, y,
    Image)`` rows — the PSF-smoothing pass real source extraction
    runs before thresholding (SExtractor's filter step; the
    reference's im2cat example delegates it to photutils on the
    driver, `examples/python/im2cat.py`) and the matching step
    before :func:`difference_image`. ``out[y][x] = Σ_{dy,dx}
    k[dy+cy][dx+cx] · img[y+dy][x+dx]`` with zero padding outside
    the plane; output rows are ``(ImgIndex, y, Image)`` and feed
    ``detect_sources(prepared=True)`` directly.

    Scale shape: the horizontal pass is a JVM ``transform`` over each
    row (whole-stage codegen, ``F.get`` zero-pads the x edges); each
    row then contributes its per-kernel-row partial to at most
    ``kernel_height`` target rows via ONE ``groupBy(plane, y)`` whose
    shuffle is kernel_height × pixel volume, partitioned by ROW — a
    one-plane 100 GB image keeps full row-level parallelism (a
    per-plane sort window would collapse it onto one task). The
    vertical combine is a JVM ``zip_with`` fold; nothing leaves the
    JVM. Rows outside the plane (zero-pad ghosts) are dropped against
    a broadcast per-plane height table (|planes| rows)."""
    kh = len(kernel)
    kw = len(kernel[0]) if kh else 0
    if kh == 0 or kw == 0 or any(len(r) != kw for r in kernel):
        raise ValueError("kernel must be a non-empty rectangle")
    if kh % 2 == 0 or kw % 2 == 0:
        raise ValueError(
            f"kernel dimensions must be odd, got {kh}x{kw}")
    cy, cx = kh // 2, kw // 2

    img = F.transform(F.col(value_col), lambda v: v.cast("double"))
    rows = df.select("ImgIndex", "y", img.alias("_img"))

    def hrow(krow):
        # horizontal 1-D correlation with one kernel row; F.get is
        # 0-based and NULL out of bounds -> coalesce = zero padding
        def px(v, i):
            terms = [
                F.lit(float(krow[dx + cx]))
                * F.coalesce(F.get(F.col("_img"), i + dx), F.lit(0.0))
                for dx in range(-cx, cx + 1) if krow[dx + cx] != 0]
            if not terms:
                return F.lit(0.0)
            out = terms[0]
            for t in terms[1:]:
                out = out + t
            return out
        return F.transform(F.col("_img"), px)

    contribs = [
        F.struct((F.col("y") - dy).alias("ty"),
                 hrow(kernel[dy + cy]).alias("hv"))
        for dy in range(-cy, cy + 1)
        if any(k != 0 for k in kernel[dy + cy])]
    if not contribs:
        raise ValueError("kernel is all zeros")
    parts = (
        rows.select("ImgIndex", F.explode(F.array(*contribs)).alias("_c"))
        .select("ImgIndex", F.col("_c.ty").alias("y"),
                F.col("_c.hv").alias("_hv"))
        .where(F.col("y") >= 0)
    )
    heights = df.groupBy("ImgIndex").agg(F.max("y").alias("_maxy"))
    agg = (
        parts.join(F.broadcast(heights), "ImgIndex")
        .where(F.col("y") <= F.col("_maxy"))
        .groupBy("ImgIndex", "y")
        .agg(F.collect_list("_hv").alias("_l"))
    )
    summed = F.aggregate(
        F.slice(F.col("_l"), 2, F.size(F.col("_l"))),
        F.element_at(F.col("_l"), 1),
        lambda acc, r: F.zip_with(acc, r, lambda a, b: a + b))
    return agg.select("ImgIndex", "y", summed.alias(value_col))


def inject_sources(df: DataFrame, catalog: DataFrame) -> DataFrame:
    """Synthetic source injection — add rectangular fake sources to
    the image surface: ``catalog`` rows ``(plane, y0, x0, height,
    width, amplitude)`` raise every covered pixel by ``amplitude``.
    The completeness-measurement primitive (inject → re-detect →
    recovery fraction = survey depth QA).

    Scale shape: the catalog (tiny vs the pixels) explodes to one row
    per covered IMAGE ROW, collapses to a per-(plane, y) interval
    list, and broadcast-LEFT-joins the pixel rows — untouched rows
    stream through unchanged, touched rows apply all their intervals
    inside one JVM ``transform``; the pixel data is never shuffled.
    Input rows must carry ``(ImgIndex, y, Image)``."""
    spans = catalog.select(
        F.col("plane").cast("long").alias("_p"),
        F.explode(F.sequence(
            F.col("y0").cast("long"),
            F.col("y0").cast("long") + F.col("height").cast("long") - 1)
        ).alias("_y"),
        F.struct(
            F.col("x0").cast("int").alias("x0"),
            (F.col("x0").cast("int") + F.col("width").cast("int") - 1
             ).alias("x1"),
            F.col("amplitude").cast("double").alias("amp")).alias("_s"))
    per_row = spans.groupBy("_p", "_y").agg(
        F.collect_list("_s").alias("_spans"))
    j = df.join(
        F.broadcast(per_row),
        (df["ImgIndex"].cast("long") == F.col("_p"))
        & (df["y"].cast("long") == F.col("_y")), "left")
    bumped = F.transform(
        df["Image"],
        lambda v, x: v.cast("double") + F.aggregate(
            F.col("_spans"), F.lit(0.0),
            lambda acc, s: acc + F.when(
                (x >= s.x0) & (x <= s.x1), s.amp).otherwise(0.0)))
    image = F.when(F.col("_spans").isNull(),
                   F.transform(df["Image"],
                               lambda v: v.cast("double"))
                   ).otherwise(bumped)
    return j.select(df["ImgIndex"], df["y"], image.alias("Image"))


def background_mesh(df: DataFrame, cell: int) -> DataFrame:
    """Local background mesh (SExtractor's BACK_SIZE grid): the image
    surface is cut into ``cell × cell`` tiles and each tile's
    background is its pixel MEDIAN (robust to sources covering a
    minority of the tile). Returns ``(ImgIndex, cy, cx, bg, n_px)``.

    One shuffle keyed (plane, cy, cx) over the exploded pixels; the
    exact interpolating percentile is an ObjectHashAggregate, and the
    mesh is pixels/cell² rows — 4096× smaller than the image at the
    SExtractor default cell=64. Input rows carry (ImgIndex, y,
    Image)."""
    if cell < 1:
        raise ValueError(f"cell must be >= 1, got {cell}")
    flat = df.select(
        F.col("ImgIndex"), F.col("y").cast("long").alias("_y"),
        F.posexplode("Image").alias("_x", "_v"))
    return (
        flat.groupBy(
            "ImgIndex",
            F.expr(f"_y div {cell}").cast("long").alias("cy"),
            F.expr(f"_x div {cell}").cast("long").alias("cx"))
        .agg(F.percentile(F.col("_v").cast("double"), F.lit(0.5))
             .alias("bg"),
             F.count("*").alias("n_px"))
    )


def subtract_background(df: DataFrame, mesh: DataFrame,
                        cell: int) -> DataFrame:
    """Subtract a :func:`background_mesh` from the image surface by
    BILINEAR interpolation between mesh-cell centers (clamped at the
    borders — edge pixels take the edge cell's value), the standard
    local-background model feeding detection/photometry on images
    whose sky varies across the field.

    The mesh collapses to one map column per plane (``(cy, cx) →
    bg``) and broadcast-joins the pixel rows; the four corner lookups
    and the interpolation run inside one JVM ``transform`` — the
    pixel data never shuffles. Mesh-cell centers sit at ``cy·cell +
    (cell−1)/2`` (exact dyadic arithmetic for power-of-two cells).
    Returns the rows with ``Image`` replaced by the residual."""
    if cell < 1:
        raise ValueError(f"cell must be >= 1, got {cell}")
    per_plane = mesh.groupBy("ImgIndex").agg(
        F.map_from_entries(F.collect_list(F.struct(
            (F.col("cy") * 100000 + F.col("cx")).alias("k"),
            F.col("bg").alias("v")))).alias("_mesh"),
        F.max("cy").alias("_maxcy"), F.max("cx").alias("_maxcx"))
    j = df.join(F.broadcast(per_plane), "ImgIndex")
    half = (cell - 1) / 2.0

    def interp(v, x):
        def axis(p, mx):
            t = (p.cast("double") - half) / float(cell)
            t = F.greatest(F.lit(0.0), F.least(t, mx.cast("double")))
            c0 = F.floor(t).cast("long")
            c1 = F.least(c0 + 1, mx)
            return c0, c1, t - c0
        y0, y1, fy = axis(F.col("y"), F.col("_maxcy"))
        x0, x1, fx = axis(x, F.col("_maxcx"))

        def m(cy, cx):
            return F.element_at(F.col("_mesh"), cy * 100000 + cx)
        bg = ((1 - fy) * ((1 - fx) * m(y0, x0) + fx * m(y0, x1))
              + fy * ((1 - fx) * m(y1, x0) + fx * m(y1, x1)))
        return v.cast("double") - bg

    image = F.transform(df["Image"], lambda v, x: interp(v, x))
    return j.select(df["ImgIndex"], df["y"], image.alias("Image"))


def defect_columns(df: DataFrame, sigma: float = 5.0) -> DataFrame:
    """CCD defect-column detection (the bad-column/hot-column map a
    survey builds from its calibration frames): per (plane, x) the
    COLUMN median over all rows, flagged defective when it deviates
    from the plane's typical column by more than ``sigma`` robust
    standard deviations (median/MAD over the column medians — the
    majority of columns define "normal"). Returns ``(ImgIndex, x,
    col_median, is_defect)``.

    One shuffle keyed (plane, x) over the exploded pixels (exact
    interpolating percentile per column), then per-plane median/MAD
    of the column medians as WINDOW aggregates over the
    |planes|·width-row column table — pixel volume is touched
    exactly once, and the reduction adds no broadcast-materialization
    jobs (r10: the previous agg + broadcast-join-back pair launched
    two extra tiny jobs per call, which job-launch latency under
    host throttle billed at 2-3x; a window partition is
    width-bounded — ≤ ~10k rows per plane at any corpus scale — so
    the linear plan holds at 100 TB). Input rows carry
    (ImgIndex, y, Image)."""
    from pyspark.sql.window import Window

    flat = df.select(
        "ImgIndex", F.posexplode("Image").alias("_x", "_v"))
    cols = (flat.groupBy("ImgIndex", F.col("_x").cast("long").alias("x"))
            .agg(F.percentile(F.col("_v").cast("double"), F.lit(0.5))
                 .alias("col_median")))
    w = Window.partitionBy("ImgIndex")
    d = cols.select(
        "ImgIndex", "x", "col_median",
        F.abs(F.col("col_median")
              - F.percentile("col_median", F.lit(0.5)).over(w))
        .alias("_ad"))
    return d.select(
        "ImgIndex", "x", "col_median",
        (F.col("_ad") > F.lit(float(sigma) * 1.4826)
         * F.percentile("_ad", F.lit(0.5)).over(w))
        .alias("is_defect"))


def calibrate_frames(science: DataFrame, dark: DataFrame,
                     flat: DataFrame, y_col: str = "y",
                     values_col: str = "values") -> DataFrame:
    """Instrumental calibration — ``(science − dark) / flat`` per
    pixel, the first step of every imaging pipeline (bias/dark
    removal + flat-fielding). ``science`` is ``(ImgIndex, y, Image)``
    rows (N exposures); ``dark`` and ``flat`` are single master
    frames of ``(y, values)`` rows (typically :func:`coadd_planes`
    outputs of the calibration stacks).

    Plan: two row-index equi-joins (N planes against ONE master each
    — AQE broadcasts masters that fit) and a JVM zip_with chain;
    pixels never explode and never shuffle. Flat pixels ≤ 0 (dead)
    yield NULL rather than dividing by zero/negative."""
    d = dark.select(F.col(y_col).alias("y"),
                    F.col(values_col).alias("_dv"))
    fl = flat.select(F.col(y_col).alias("y"),
                     F.col(values_col).alias("_fv"))
    j = science.join(d, "y").join(fl, "y")
    sub = F.zip_with("Image", "_dv",
                     lambda a, b: a.cast("double") - b)
    out = F.zip_with(sub, "_fv",
                     lambda a, b: F.when(b > 0, a / b))
    return j.select("ImgIndex", "y", out.alias("Image"))


def repair_defects(df: DataFrame, defects: DataFrame) -> DataFrame:
    """Defect repair — replace every flagged column's pixels with the
    mean of the SAME ROW's nearest good columns left and right (one
    side at the image edges; NULL if a plane has no good column),
    the standard interpolation step after :func:`defect_columns`
    builds the bad-column map.

    The defect map (mesh-small) turns into per-plane nearest-good
    lookup arrays via two window fills over |planes|·width rows,
    collapses to one array-triple per plane, and broadcast-joins the
    pixel rows — the repair itself is one JVM ``transform``; pixel
    data never shuffles. ``defects`` is :func:`defect_columns`
    output (``ImgIndex, x, is_defect``)."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("ImgIndex").orderBy("x")
    good_x = F.when(~F.col("is_defect"), F.col("x"))
    cols = defects.select(
        "ImgIndex", F.col("x").cast("int").alias("x"),
        F.col("is_defect").alias("_bad"),
        F.last(good_x, ignorenulls=True)
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .cast("int").alias("_gl"),
        F.first(good_x, ignorenulls=True)
        .over(w.rowsBetween(0, Window.unboundedFollowing))
        .cast("int").alias("_gr"))
    per_plane = cols.groupBy("ImgIndex").agg(
        F.array_sort(F.collect_list(F.struct(
            "x", "_bad", "_gl", "_gr"))).alias("_m"))
    j = df.join(F.broadcast(per_plane), "ImgIndex")

    def fix(v, x):
        e = F.element_at(F.col("_m"), x + 1)
        lv = F.get(F.col("Image"), e["_gl"]).cast("double")
        rv = F.get(F.col("Image"), e["_gr"]).cast("double")
        rep = F.coalesce((lv + rv) / 2, lv, rv)
        return F.when(e["_bad"], rep).otherwise(v.cast("double"))

    image = F.transform(df["Image"], fix)
    return j.select(df["ImgIndex"], df["y"], image.alias("Image"))
