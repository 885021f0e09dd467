"""Survey-level calibration solvers.

Relative photometry ("übercal", Padmanabhan et al. 2008): solve every
epoch's zero point and every star's magnitude SIMULTANEOUSLY from the
overlapping observation graph — the global least squares a survey
runs across all its exposures, here as alternating least squares
whose every half-step is one map-side-combined Spark aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def relative_photometry(df: DataFrame, star_col: str, epoch_col: str,
                        mag_col: str, *, iters: int = 3) -> DataFrame:
    """Alternating least squares for ``m_obs(i, e) = m_star(i) +
    zp(e)``: each round estimates star magnitudes given zero points
    (one groupBy(star)), then zero points given magnitudes (one
    groupBy(epoch)), then re-gauges ``mean(zp) = 0`` (the solution's
    free constant). Converges geometrically on any connected
    observation graph. Returns ``(epoch, n_obs, zp)``.

    Scale shape per round: the observations shuffle once by star and
    once by epoch (both map-side-combined means); the zero-point
    table (|epochs| rows) is BROADCAST into the star half-step, and
    the star-magnitude join is a plain equi-join on the star key —
    nothing driver-side but the |epochs|-row gauge constant."""
    if iters < 1:
        raise ValueError(f"iters must be >= 1, got {iters}")
    obs = df.select(F.col(star_col).alias("_s"),
                    F.col(epoch_col).alias("_e"),
                    F.col(mag_col).cast("double").alias("_m"))
    zp = obs.select(F.col("_e")).distinct() \
        .select("_e", F.lit(0.0).alias("_zp"))
    for _ in range(iters):
        mstar = (obs.join(F.broadcast(zp), "_e")
                 .groupBy("_s")
                 .agg(F.avg(F.col("_m") - F.col("_zp")).alias("_ms")))
        zraw = (obs.join(mstar, "_s")
                .groupBy("_e")
                .agg(F.avg(F.col("_m") - F.col("_ms")).alias("_zr"),
                     F.count("*").alias("_n")))
        gauge = zraw.agg(F.avg("_zr").alias("_g"))
        zp = (zraw.crossJoin(F.broadcast(gauge))
              .select("_e", (F.col("_zr") - F.col("_g")).alias("_zp"),
                      "_n"))
    return zp.select(F.col("_e").alias("epoch"),
                     F.col("_n").alias("n_obs"),
                     F.col("_zp").alias("zp"))
