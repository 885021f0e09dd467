"""Time-domain astronomy operators over (object, time, value) series.

The survey counterpart to the catalog operators: variable-source search
runs a periodogram over every object's light curve, then folds the
best period for inspection. Both are classic published algorithms
(Lomb 1976, Ap&SS 39, 447; Scargle 1982, ApJ 263, 835) expressed as
single-shuffle DataFrame plans — no UDF, no per-object driver loop.

Scale shape of :func:`lomb_scargle`: the naive formulation needs two
passes (the time offset τ depends on per-(object, frequency) sums).
The angle-addition identities collapse it to ONE aggregation — per
(object, frequency) only eight sums over the observations
(n, Σy, Σy², Σcos ωt, Σsin ωt, Σy·cos ωt, Σy·sin ωt with the 2ωt
pair), after which τ and the normalized power are closed-form column
arithmetic. The observation×frequency expansion shuffles once, keyed
by (object, frequency), map-side combined; the output is
|objects|·|frequencies| rows regardless of observation count.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def lomb_scargle(df: DataFrame, t_col: str, y_col: str, id_col: str,
                 freqs: list[float]) -> DataFrame:
    """Normalized Lomb–Scargle periodogram of every object's series at
    the given ordinary frequencies (cycles per unit of ``t_col``).

    Returns ``(object_id, freq_idx, freq, power)``; ``power`` is the
    standard (σ²-normalized) periodogram. Objects with zero variance
    or fewer than 2 points yield NULL power (nothing to detect)."""
    if not freqs:
        raise ValueError("freqs must be non-empty")
    fdf = F.explode(F.array(*[
        F.struct(F.lit(i).cast("long").alias("freq_idx"),
                 F.lit(float(f)).alias("freq"))
        for i, f in enumerate(freqs)])).alias("_f")
    base = df.select(
        F.col(id_col).alias("object_id"),
        F.col(t_col).cast("double").alias("_t"),
        F.col(y_col).cast("double").alias("_y"),
    ).where(F.col("_t").isNotNull() & F.col("_y").isNotNull())
    obs = (base.select("object_id", "_t", "_y", fdf)
           .select("object_id", "_t", "_y",
                   F.col("_f.freq_idx").alias("freq_idx"),
                   F.col("_f.freq").alias("freq")))
    w = 2.0 * math.pi * F.col("freq")
    wt = w * F.col("_t")
    g = obs.groupBy("object_id", "freq_idx", "freq").agg(
        F.count("*").alias("n"),
        F.sum("_y").alias("sy"),
        F.sum(F.col("_y") * F.col("_y")).alias("syy"),
        F.sum(F.cos(wt)).alias("c1"),
        F.sum(F.sin(wt)).alias("s1"),
        F.sum(F.col("_y") * F.cos(wt)).alias("cy"),
        F.sum(F.col("_y") * F.sin(wt)).alias("sy1"),
        F.sum(F.cos(wt * 2)).alias("c2"),
        F.sum(F.sin(wt * 2)).alias("s2"),
    )
    n = F.col("n").cast("double")
    ybar = F.col("sy") / n
    var = F.col("syy") / n - ybar * ybar
    # Σ(y−ȳ)cos ωt = Σy cos ωt − ȳ Σcos ωt (same for sin)
    cy = F.col("cy") - ybar * F.col("c1")
    sy = F.col("sy1") - ybar * F.col("s1")
    # tan 2ωτ = Σsin 2ωt / Σcos 2ωt
    wtau = F.atan2(F.col("s2"), F.col("c2")) / 2.0
    ct, st = F.cos(wtau), F.sin(wtau)
    # rotate by τ: Σdy cos ω(t−τ) etc., and the cos²/sin² normalizers
    # via Σcos²ω(t−τ) = n/2 + (cos 2ωτ·Σcos 2ωt + sin 2ωτ·Σsin 2ωt)/2
    num_c = ct * cy + st * sy
    num_s = ct * sy - st * cy
    den_half = (F.cos(wtau * 2) * F.col("c2")
                + F.sin(wtau * 2) * F.col("s2")) / 2.0
    den_c = n / 2.0 + den_half
    den_s = n / 2.0 - den_half
    power = F.when(
        (F.col("n") >= 2) & (var > 0) & (den_c > 0) & (den_s > 0),
        (num_c * num_c / den_c + num_s * num_s / den_s) / (2.0 * var))
    return g.select("object_id", "freq_idx", "freq",
                    power.alias("power"))


def variability_features(df: DataFrame, t_col: str, y_col: str,
                         id_col: str, tiebreak: str | None = None
                         ) -> DataFrame:
    """Per-object light-curve variability statistics in one pass:
    ``(object_id, n_obs, mean_y, sigma_y, amplitude, eta, stetson_j)``.

    The screening step BEFORE a periodogram: cheap whole-survey
    statistics that rank objects by variability so :func:`lomb_scargle`
    only runs on candidates.

    - ``sigma_y``: sample standard deviation; ``amplitude`` =
      (max − min)/2.
    - ``eta``: von Neumann (1941) ratio Σ(yᵢ₊₁−yᵢ)²/((n−1)·σ²) over the
      time-ordered series — ≈2 for white noise, ≪2 for smooth trends.
    - ``stetson_j``: the Stetson (1996, PASP 108, 851) J index over
      consecutive pairs. With no per-point error column the relative
      deviations use the sample σ: δᵢ = √(n/(n−1))·(yᵢ−ȳ)/σ,
      J = Σₖ sgn(Pₖ)·√|Pₖ| / (n−1) with Pₖ = δᵢδᵢ₊₁ — positive for
      correlated (real) variability, ≈0 for noise.

    Objects with n < 2 or σ = 0 yield NULL eta / stetson_j.

    Scale shape: one hash shuffle on the object key with an
    in-partition sort (the lag window); the closing groupBy reuses the
    same partitioning so no second Exchange. Output = |objects| rows;
    per-task state is one partition's rows. ``tiebreak`` (e.g. an
    event id) makes the lag order deterministic under duplicate
    timestamps — required for cross-engine replay."""
    order = [F.col(t_col).cast("double")]
    if tiebreak is not None:
        order.append(F.col(tiebreak))
    w = Window.partitionBy(id_col).orderBy(*order)
    wall = (Window.partitionBy(id_col)
            .rowsBetween(Window.unboundedPreceding,
                         Window.unboundedFollowing))
    y = F.col(y_col).cast("double")
    # group on the SAME attribute the window partitioned by (aliasing
    # before the groupBy costs a second Exchange); rename at the end
    rows = df.select(
        F.col(id_col), y.alias("_y"),
        F.lag(y).over(w).alias("_yprev"),
        F.avg(y).over(wall).alias("_ybar"))
    # pair terms against the per-object mean; the positive constant
    # n/((n−1)σ²) factors out of sgn(P)·√|P| and is applied post-agg
    q = (F.col("_y") - F.col("_ybar")) * (F.col("_yprev") - F.col("_ybar"))
    g = rows.groupBy(F.col(id_col).alias("object_id")).agg(
        F.count("*").alias("n_obs"),
        F.avg("_y").alias("mean_y"),
        F.stddev_samp("_y").alias("sigma_y"),
        ((F.max("_y") - F.min("_y")) / 2.0).alias("amplitude"),
        F.sum(F.pow(F.col("_y") - F.col("_yprev"), 2)).alias("_sdy2"),
        F.sum(F.signum(q) * F.sqrt(F.abs(q))).alias("_jraw"),
    )
    n = F.col("n_obs").cast("double")
    var = F.col("sigma_y") * F.col("sigma_y")
    ok = (F.col("n_obs") >= 2) & (F.col("sigma_y") > 0)
    eta = F.when(ok, F.col("_sdy2") / ((n - 1) * var))
    j = F.when(ok, F.col("_jraw") * F.sqrt(n / (n - 1)) / F.col("sigma_y")
               / (n - 1))
    return g.select("object_id", "n_obs", "mean_y", "sigma_y",
                    "amplitude", eta.alias("eta"), j.alias("stetson_j"))


def periodogram_peaks(pg: DataFrame, n_trials: int,
                      power_decimals: int = 6) -> DataFrame:
    """Best-frequency extraction from a :func:`lomb_scargle` output:
    per object, the peak frequency row plus the classical
    multiple-trial false-alarm probability FAP = 1 − (1 − e^(−z))^M
    (Scargle 1982 §IV; M = ``n_trials`` independent frequencies) —
    the detection-significance step that turns a periodogram into a
    candidate list.

    Peaks rank on power ROUNDED to ``power_decimals`` with
    ``freq_idx`` as the tie-break, so the winner is stable under
    engine-level 1-ulp float differences. NULL powers (degenerate
    series) drop out. One window over the (object, frequency) table —
    |objects|·|freqs| rows in, |objects| out."""
    if n_trials < 1:
        raise ValueError("n_trials must be >= 1")
    from pyspark.sql.window import Window

    p6 = F.round("power", power_decimals)
    w = Window.partitionBy("object_id").orderBy(
        p6.desc(), F.col("freq_idx").asc())
    ranked = (pg.where(F.col("power").isNotNull())
              .withColumn("_p6", p6)
              .withColumn("_rn", F.row_number().over(w)))
    fap = 1.0 - F.pow(1.0 - F.exp(-F.col("_p6")), F.lit(float(n_trials)))
    return (ranked.where(F.col("_rn") == 1)
            .select("object_id",
                    F.col("freq_idx").alias("best_freq_idx"),
                    F.col("freq").alias("best_freq"),
                    F.col("_p6").alias("power"),
                    fap.alias("fap")))


def phase_fold(df: DataFrame, t_col: str, y_col: str, id_col: str,
               period: float, n_bins: int = 16,
               t0: float = 0.0) -> DataFrame:
    """Fold every object's series at ``period`` and bin the phased
    curve: ``(object_id, phase_bin, n_obs, mean_y)`` with
    ``phase_bin = ⌊n_bins · frac((t − t0)/period)⌋`` — the light-curve
    shape at that period. One map-side-combined groupBy; output rows =
    |objects| · n_bins."""
    if period <= 0 or n_bins < 1:
        raise ValueError("period must be > 0 and n_bins >= 1")
    phase = F.pmod((F.col(t_col).cast("double") - F.lit(float(t0)))
                   / F.lit(float(period)), F.lit(1.0))
    b = F.least(F.floor(phase * n_bins).cast("long"),
                F.lit(n_bins - 1))          # frac rounding guard
    return (df.select(F.col(id_col).alias("object_id"),
                      b.alias("phase_bin"),
                      F.col(y_col).cast("double").alias("_y"))
            .groupBy("object_id", "phase_bin")
            .agg(F.count("*").alias("n_obs"),
                 F.avg("_y").alias("mean_y")))


def structure_function(df: DataFrame, t_col: str, y_col: str,
                       key_col: str, *, max_lag: int,
                       nbins: int) -> DataFrame:
    """Ensemble structure function — ``SF(τ) = ⟨(y(t+τ) − y(t))²⟩``
    over all same-object epoch pairs, binned by lag: the QSO/AGN
    variability statistic (e.g. Vanden Berk et al. 2004) a survey
    computes across every light curve at once. Returns one row per
    lag bin: ``(bin, n_pairs, sf6)`` (equal-width integer-exact bins,
    ``bin = lag·nbins div max_lag``, pairs with ``0 < lag <
    max_lag``; ``sf6`` = mean squared difference rounded at 1e-6).

    Never all-pairs per object: epochs are blocked into max_lag-sized
    time cells (the Zones trick in 1-D) — the earlier epoch probes
    its own cell and the next, the later epoch sits in its single
    cell, so every qualifying pair meets the ``(key, cell)``
    equi-join exactly once and the join cost is O(n · epochs-per-
    window), not O(n²) for long-baseline curves. The closing per-bin
    aggregation is map-side combined; pairs at identical timestamps
    are excluded (lag 0 is not a structure-function point)."""
    if max_lag < 1:
        raise ValueError(f"max_lag must be >= 1, got {max_lag}")
    if nbins < 1:
        raise ValueError(f"nbins must be >= 1, got {nbins}")
    t = F.col(t_col).cast("long")
    cell = F.expr(
        f"((cast({t_col} as bigint)) - pmod(cast({t_col} as bigint), "
        f"{max_lag})) div {max_lag}").cast("long")
    a = df.select(F.col(key_col).alias("_k"), t.alias("_t1"),
                  F.col(y_col).cast("double").alias("_y1"),
                  F.explode(F.array(cell, cell + 1)).alias("_c"))
    b = df.select(F.col(key_col).alias("_k"), t.alias("_t2"),
                  F.col(y_col).cast("double").alias("_y2"),
                  cell.alias("_c"))
    lag = F.col("_t2") - F.col("_t1")
    dy = F.col("_y2") - F.col("_y1")
    pairs = (
        a.join(b, ["_k", "_c"])
        .where((lag > 0) & (lag < max_lag))
        .select((lag * nbins).alias("_ln"), (dy * dy).alias("_d2"))
    )
    return (
        pairs.groupBy(
            F.expr(f"_ln div {max_lag}").cast("long").alias("bin"))
        .agg(F.count("*").alias("n_pairs"),
             F.round(F.avg("_d2"), 6).alias("sf6"))
    )


def bls_search(df: DataFrame, t_col: str, y_col: str, key_col: str,
               *, periods, nbins: int = 8) -> DataFrame:
    """Box-least-squares transit search (Kovács, Zucker & Mazeh 2002,
    simplified box statistic) — for every object, fold on each trial
    period, bin the phase into ``nbins`` boxes, and score the period
    by its transit depth ``mean(all) − min(bin mean)``; the best
    period (ties → smaller) wins. The exoplanet/eclipsing-binary
    search run over every light curve of a survey at once. Returns
    ``(object, best_period, depth, transit_bin)``.

    Scale shape: samples explode into |periods| hypotheses map-side
    (phase bin = ``(t mod P)·nbins div P``, integer-exact for integer
    times/periods); per-(object, period, bin) sums are ONE map-side-
    combined groupBy; the per-(object, period) depth folds the ≤nbins
    rows with a second map-side-combined agg, and the argmax is a
    third — output |objects| rows, everything JVM-side."""
    if not periods:
        raise ValueError("periods must be non-empty")
    if nbins < 2:
        raise ValueError(f"nbins must be >= 2, got {nbins}")
    for p in periods:
        if int(p) < 1:
            raise ValueError(f"periods must be positive ints, got {p}")
    pa = F.explode(F.array(
        *[F.lit(int(p)) for p in periods])).alias("_P")
    rows = df.select(
        F.col(key_col).alias("object"),
        F.col(t_col).cast("long").alias("_t"),
        F.col(y_col).cast("double").alias("_y"), pa)
    bin_ = F.expr(f"(pmod(_t, _P) * {nbins}) div _P").cast("long")
    per_bin = (rows.groupBy("object", "_P", bin_.alias("_b"))
               .agg(F.sum("_y").alias("_s"), F.count("*").alias("_n")))
    per_period = per_bin.groupBy("object", "_P").agg(
        (F.sum("_s") / F.sum("_n")).alias("_mall"),
        F.min(F.struct((F.col("_s") / F.col("_n")).alias("m"),
                       F.col("_b"))).alias("_lo"))
    scored = per_period.select(
        "object", "_P",
        (F.col("_mall") - F.col("_lo.m")).alias("_depth"),
        F.col("_lo._b").alias("_bin"))
    best = scored.groupBy("object").agg(
        F.max(F.struct(F.col("_depth"), (-F.col("_P")).alias("_np"),
                       F.col("_bin"))).alias("_w"))
    return best.select(
        "object", (-F.col("_w._np")).alias("best_period"),
        F.col("_w._depth").alias("depth"),
        F.col("_w._bin").alias("transit_bin"))


def gls_periodogram(df: DataFrame, t_col: str, y_col: str,
                    id_col: str, freqs: list[float],
                    err_col: str | None = None) -> DataFrame:
    """Generalized (floating-mean, weighted) Lomb–Scargle —
    Zechmeister & Kürster 2009: the statistically correct
    periodogram when the sample mean is not the true mean and
    measurements carry errors (``err_col`` → weights 1/σ²; omitted →
    uniform). Unlike the classic periodogram the mean is FIT
    simultaneously with the sinusoid, so sparse/clumped sampling no
    longer biases the power.

    Same plan shape as :func:`lomb_scargle`: frequencies explode
    map-side, ONE map-side-combined aggregation collects the nine
    weighted sums per (object, frequency), and the power is column
    arithmetic — |objects|·|freqs| output rows, no second pass.
    Degenerate series (n < 3, zero weighted variance, or a singular
    normal matrix) yield NULL power."""
    if not freqs:
        raise ValueError("freqs must be non-empty")
    fdf = F.explode(F.array(*[
        F.struct(F.lit(i).cast("long").alias("freq_idx"),
                 F.lit(float(f)).alias("freq"))
        for i, f in enumerate(freqs)])).alias("_f")
    cols = [F.col(id_col).alias("object_id"),
            F.col(t_col).cast("double").alias("_t"),
            F.col(y_col).cast("double").alias("_y")]
    if err_col is not None:
        w_expr = 1.0 / (F.col(err_col).cast("double")
                        * F.col(err_col).cast("double"))
    else:
        w_expr = F.lit(1.0)
    base = df.select(*cols, w_expr.alias("_w")).where(
        F.col("_t").isNotNull() & F.col("_y").isNotNull()
        & F.col("_w").isNotNull() & (F.col("_w") > 0))
    obs = (base.select("object_id", "_t", "_y", "_w", fdf)
           .select("object_id", "_t", "_y", "_w",
                   F.col("_f.freq_idx").alias("freq_idx"),
                   F.col("_f.freq").alias("freq")))
    wt = 2.0 * math.pi * F.col("freq") * F.col("_t")
    cw, sw_ = F.cos(wt), F.sin(wt)
    g = obs.groupBy("object_id", "freq_idx", "freq").agg(
        F.count("*").alias("n"),
        F.sum("_w").alias("sw"),
        F.sum(F.col("_w") * F.col("_y")).alias("swy"),
        F.sum(F.col("_w") * F.col("_y") * F.col("_y")).alias("swyy"),
        F.sum(F.col("_w") * cw).alias("swc"),
        F.sum(F.col("_w") * sw_).alias("sws"),
        F.sum(F.col("_w") * F.col("_y") * cw).alias("swyc"),
        F.sum(F.col("_w") * F.col("_y") * sw_).alias("swys"),
        F.sum(F.col("_w") * cw * cw).alias("swcc"),
        F.sum(F.col("_w") * cw * sw_).alias("swcs"),
    )
    W = F.col("sw")
    Y = F.col("swy") / W
    C = F.col("swc") / W
    S = F.col("sws") / W
    YY = F.col("swyy") / W - Y * Y
    YC = F.col("swyc") / W - Y * C
    YS = F.col("swys") / W - Y * S
    CC = F.col("swcc") / W - C * C
    SS = (W - F.col("swcc")) / W - S * S
    CS = F.col("swcs") / W - C * S
    D = CC * SS - CS * CS
    power = F.when(
        (F.col("n") >= 3) & (YY > 0) & (D > 0),
        (SS * YC * YC + CC * YS * YS - 2 * CS * YC * YS) / (YY * D))
    return g.select("object_id", "freq_idx", "freq",
                    power.alias("power"))
