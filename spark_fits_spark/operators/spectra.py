"""Spectroscopy operators over long-format spectra.

A survey's 1-D spectra scan out of FITS bintables as long-format rows
``(object, wavelength, flux)`` — millions of objects × thousands of
samples. These operators keep that layout (never reassembling spectra
driver-side) and run the classic per-spectrum measurements as
closed-form aggregations: continuum fitting and equivalent widths,
the line-strength measurement behind redshift/abundance pipelines.

Scale shape: `fit_continuum` is ONE map-side-combined groupBy (five
sums), |objects| output rows at any sample count. `equivalent_width`
shuffles the samples once on the object key; the per-object sort
window (sample spacing), the continuum join, and the closing
per-(object, line) aggregation all reuse that one partitioning, and
the line list is broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def fit_continuum(df: DataFrame, obj_col: str, wl_col: str,
                  flux_col: str) -> DataFrame:
    """Per-object linear continuum fit — least squares ``flux ≈
    a·λ + b`` in closed form: five normal-equation sums in ONE
    map-side-combined groupBy, then Cramer on the shared 2×2 system
    as column arithmetic (the spectroscopic twin of the q125
    photometric zero-point solve). Returns ``(object, n_samples, a,
    b)``; degenerate objects (< 2 distinct wavelengths) yield NULL
    coefficients."""
    wl = F.col(wl_col).cast("double")
    fx = F.col(flux_col).cast("double")
    g = df.groupBy(F.col(obj_col).alias("object")).agg(
        F.count("*").alias("n_samples"),
        F.sum(wl).alias("_sx"), F.sum(fx).alias("_sy"),
        F.sum(wl * wl).alias("_sxx"), F.sum(wl * fx).alias("_sxy"))
    n = F.col("n_samples").cast("double")
    det = n * F.col("_sxx") - F.col("_sx") * F.col("_sx")
    ok = F.abs(det) > F.lit(1e-12)
    a = F.when(ok, (n * F.col("_sxy")
                    - F.col("_sx") * F.col("_sy")) / det)
    b = F.when(ok, (F.col("_sy") - a * F.col("_sx")) / n)
    return g.select("object", "n_samples", a.alias("a"), b.alias("b"))


def equivalent_width(df: DataFrame, lines: DataFrame, obj_col: str,
                     wl_col: str, flux_col: str,
                     line_col: str = "line",
                     center_col: str = "center",
                     halfwidth_col: str = "halfwidth") -> DataFrame:
    """Equivalent widths — for every (object, spectral line) pair,
    ``EW = Σ (1 − flux/continuum)·Δλ`` over the samples within
    ``center ± halfwidth`` (rectangle rule, ``Δλ = next λ − λ`` from
    a per-object lead window; the red edge sample of each spectrum
    has no successor and contributes nothing). The continuum is the
    object's :func:`fit_continuum` line evaluated at each λ.

    ``lines`` is the (tiny) line list ``(line, center, halfwidth)``
    — broadcast, so the in-window selection is a broadcast range
    join, never a shuffle keyed on wavelength. Positive EW =
    absorption, negative = emission. Returns ``(object, line,
    n_window, ew)``; objects with a NULL continuum fit are absent."""
    wl = F.col(wl_col).cast("double")
    cont = fit_continuum(df, obj_col, wl_col, flux_col)
    w = Window.partitionBy(obj_col).orderBy(wl_col)
    samples = df.select(
        F.col(obj_col).alias("object"), wl.alias("_wl"),
        F.col(flux_col).cast("double").alias("_fx"),
        (F.lead(wl).over(w) - wl).alias("_dl"))
    j = (samples.where(F.col("_dl").isNotNull())
         .join(cont.where(F.col("a").isNotNull()), "object"))
    c = F.col("a") * F.col("_wl") + F.col("b")
    lx = F.broadcast(lines.select(
        F.col(line_col).alias("line"),
        F.col(center_col).cast("double").alias("_ctr"),
        F.col(halfwidth_col).cast("double").alias("_hw")))
    inwin = j.join(
        lx,
        (F.col("_wl") >= F.col("_ctr") - F.col("_hw"))
        & (F.col("_wl") <= F.col("_ctr") + F.col("_hw")))
    term = (F.lit(1.0) - F.col("_fx") / c) * F.col("_dl")
    return (
        inwin.groupBy("object", "line")
        .agg(F.count("*").alias("n_window"),
             F.sum(term).alias("ew"))
    )
