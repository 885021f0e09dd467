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


def resample_linear(df: DataFrame, obj_col: str, wl_col: str,
                    flux_col: str, *, wl0: int, step: int,
                    n_grid: int) -> DataFrame:
    """Resample every spectrum onto one shared uniform wavelength
    grid ``g_k = wl0 + k·step`` (k = 0..n_grid−1) by linear
    interpolation — the alignment step before spectral stacking or
    cross-correlation (a log-λ grid is the same operator after a
    λ → log λ column transform). Returns ``(object, k, wl_grid,
    flux)``; grid points outside an object's sampled range are
    absent (no extrapolation).

    Scale shape: ONE per-object sort window turns samples into
    segments ``[λᵢ, λᵢ₊₁)``; each segment owns the grid points
    ``ceil((λᵢ−wl0)/step) ≤ k < ceil((λᵢ₊₁−wl0)/step)`` by exact
    integer arithmetic (for integer wavelengths the segment
    membership is bit-deterministic — no float log/floor boundary),
    emitted with a JVM ``sequence`` explode. Output volume is
    |objects|·n_grid regardless of native sampling; nothing leaves
    the JVM and no join is needed at all."""
    if step < 1 or n_grid < 1:
        raise ValueError(
            f"step >= 1 and n_grid >= 1 required, got step={step}, "
            f"n_grid={n_grid}")
    wl = F.col(wl_col).cast("long")
    w = Window.partitionBy(obj_col).orderBy(wl)
    seg = df.select(
        F.col(obj_col).alias("object"), wl.alias("_w1"),
        F.col(flux_col).cast("double").alias("_f1"),
        F.lead(wl).over(w).alias("_w2"),
        F.lead(F.col(flux_col).cast("double")).over(w).alias("_f2"),
    ).where(F.col("_w2").isNotNull())
    kmin = F.greatest(
        F.expr(f"(_w1 - {wl0} + {step} - 1) div {step}"), F.lit(0))
    kmax = F.least(
        F.expr(f"(_w2 - {wl0} + {step} - 1) div {step}") - 1,
        F.lit(n_grid - 1))
    ks = seg.where(kmax >= kmin).select(
        "object", "_w1", "_f1", "_w2", "_f2",
        F.explode(F.sequence(kmin, kmax)).alias("k"))
    g = F.lit(wl0) + F.col("k") * F.lit(step)
    frac = (g - F.col("_w1")).cast("double") \
        / (F.col("_w2") - F.col("_w1")).cast("double")
    flux = F.col("_f1") + (F.col("_f2") - F.col("_f1")) * frac
    return ks.select(
        "object", F.col("k").cast("long").alias("k"),
        g.cast("long").alias("wl_grid"), flux.alias("flux"))


def xcorr_lag(df: DataFrame, template, obj_col: str = "object",
              k_col: str = "k", flux_col: str = "flux", *,
              max_lag: int) -> DataFrame:
    """Cross-correlation lag estimation — slide every gridded
    spectrum against one shared template and keep the best-scoring
    integer lag: the redshift/velocity measurement step (on a log-λ
    grid a lag IS a velocity shift), run for every object at once.
    Input is :func:`resample_linear`-style rows ``(object, k,
    flux)``; ``template`` is a plain Python sequence on the same
    grid. Returns ``(object, best_lag, best_score, n_overlap)``;
    score ties break toward the SMALLEST lag.

    Scale shape: the template is a literal array evaluated JVM-side
    (``F.get`` — no join at all); each sample explodes into the
    2·max_lag+1 lag hypotheses map-side; ONE map-side-combined
    groupBy accumulates per-(object, lag) scores and ONE more
    (struct-max, also map-side combined) takes the argmax — output
    is |objects| rows, and nothing driver-side ever sees a
    spectrum."""
    n = len(template)
    if n == 0:
        raise ValueError("template must be non-empty")
    if max_lag < 0 or max_lag >= n:
        raise ValueError(
            f"0 <= max_lag < len(template) required, got {max_lag}")
    tmpl = F.array(*[F.lit(float(v)) for v in template])
    rows = df.select(
        F.col(obj_col).alias("object"),
        F.col(k_col).cast("long").alias("_k"),
        F.col(flux_col).cast("double").alias("_f"),
        F.explode(F.sequence(F.lit(-max_lag), F.lit(max_lag)))
        .alias("lag"))
    tv = F.get(tmpl, (F.col("_k") + F.col("lag")).cast("int"))
    scores = (
        rows.select("object", "lag", (F.col("_f") * tv).alias("_c"))
        .where(F.col("_c").isNotNull())
        .groupBy("object", F.col("lag").cast("long").alias("lag"))
        .agg(F.sum("_c").alias("score"),
             F.count("*").alias("n_overlap"))
    )
    best = scores.groupBy("object").agg(
        F.max(F.struct(F.col("score"), (-F.col("lag")).alias("_nl"),
                       F.col("n_overlap"))).alias("_b"))
    return best.select(
        "object", (-F.col("_b._nl")).alias("best_lag"),
        F.col("_b.score").alias("best_score"),
        F.col("_b.n_overlap").alias("n_overlap"))
