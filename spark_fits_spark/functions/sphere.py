"""Spherical-geometry primitives as JVM columns.

The reference's users run cone searches and separations driver-side
(astropy SkyCoord over collected rows); here the great-circle distance
is `pyspark.sql.functions` arithmetic so an angular predicate filters
at scan speed and composes with the Zones crossmatch
(`relational.py`), HEALPix maps (`healpix.py`) and WCS transforms
(`wcs.py`).

The haversine form is used (numerically stable at small separations,
exact at the antipode for practical purposes) — Sinnott 1984, Sky &
Telescope 68, 159; standard published formula.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(x) -> Column:
    return (F.col(x) if isinstance(x, str) else x).cast("double")


def angular_sep(ra1, dec1, ra2, dec2) -> Column:
    """Great-circle separation in DEGREES between two sky positions
    given in degrees — haversine: 2·asin√(sin²(Δδ/2) +
    cos δ₁ cos δ₂ sin²(Δα/2))."""
    r1, d1 = F.radians(_c(ra1)), F.radians(_c(dec1))
    r2, d2 = F.radians(_c(ra2)), F.radians(_c(dec2))
    sd = F.sin((d2 - d1) / 2)
    sr = F.sin((r2 - r1) / 2)
    h = sd * sd + F.cos(d1) * F.cos(d2) * sr * sr
    return F.degrees(2 * F.asin(F.least(F.sqrt(h), F.lit(1.0))))


def angular_sep_sql(ra1: str, dec1: str, ra2: str, dec2: str) -> str:
    """ANSI-SQL twin of :func:`angular_sep` (textually parallel)."""
    d1, d2 = f"radians({dec1})", f"radians({dec2})"
    sd = f"sin(({d2} - {d1}) / 2)"
    sr = f"sin((radians({ra2}) - radians({ra1})) / 2)"
    h = f"({sd} * {sd} + cos({d1}) * cos({d2}) * {sr} * {sr})"
    return f"degrees(2 * asin(least(sqrt({h}), 1.0)))"


def epoch_propagate(ra_col, dec_col, pmra_col, pmdec_col,
                    dt_years: float) -> tuple[Column, Column]:
    """Propagate sky positions by proper motion over ``dt_years`` —
    the step before crossmatching catalogs observed at different
    epochs (e.g. a 2016.0 survey against a 2000.0 one). ``pmra`` is
    the true angular rate μ_α★ = μ_α·cos δ in mas/yr (the standard
    catalog convention), ``pmdec`` in mas/yr; the linear (small-motion)
    propagation used by the archives away from the poles:
    α' = α + Δt·μ_α★/(cos δ · 3.6e6), δ' = δ + Δt·μ_δ/3.6e6."""
    ra, dec = _c(ra_col), _c(dec_col)
    dt = float(dt_years)
    ra2 = ra + F.lit(dt) * _c(pmra_col) / (F.lit(3.6e6) * F.cos(F.radians(dec)))
    dec2 = dec + F.lit(dt) * _c(pmdec_col) / F.lit(3.6e6)
    return ra2, dec2


def epoch_propagate_sql(ra: str, dec: str, pmra: str, pmdec: str,
                        dt_years: float) -> tuple[str, str]:
    """ANSI-SQL twin of :func:`epoch_propagate` (textually parallel)."""
    dt = float(dt_years)
    ra2 = (f"(({ra}) + {dt!r} * ({pmra})"
           f" / (3600000.0 * cos(radians({dec}))))")
    dec2 = f"(({dec}) + {dt!r} * ({pmdec}) / 3600000.0)"
    return ra2, dec2


# IAU J2000 galactic frame constants (Reid & Brunthaler 2004 /
# Hipparcos definition): north galactic pole and the node longitude
_GAL_RA_NGP = 192.85948      # deg
_GAL_DEC_NGP = 27.12825      # deg
_GAL_L_NCP = 122.93192       # galactic longitude of the NCP, deg


def equatorial_to_galactic(ra_col, dec_col) -> tuple[Column, Column]:
    """(l, b) galactic coordinates in degrees from J2000 equatorial —
    the published spherical rotation (no matrix, so it stays textually
    parallel with the SQL twin):
    ``sin b = sin δ sin δ_G + cos δ cos δ_G cos(α−α_G)``,
    ``l = l_NCP − atan2(cos δ sin(α−α_G),
    sin δ cos δ_G − cos δ sin δ_G cos(α−α_G))``, l wrapped to
    [0, 360)."""
    import math
    ag = math.radians(_GAL_RA_NGP)
    dgs, dgc = (math.sin(math.radians(_GAL_DEC_NGP)),
                math.cos(math.radians(_GAL_DEC_NGP)))
    a, d = F.radians(_c(ra_col)), F.radians(_c(dec_col))
    sinb = (F.sin(d) * F.lit(dgs)
            + F.cos(d) * F.lit(dgc) * F.cos(a - F.lit(ag)))
    b = F.degrees(F.asin(F.greatest(F.least(sinb, F.lit(1.0)),
                                    F.lit(-1.0))))
    l = F.pmod(
        F.lit(_GAL_L_NCP) - F.degrees(F.atan2(
            F.cos(d) * F.sin(a - F.lit(ag)),
            F.sin(d) * F.lit(dgc)
            - F.cos(d) * F.lit(dgs) * F.cos(a - F.lit(ag)))),
        F.lit(360.0))
    return l, b


def equatorial_to_galactic_sql(ra: str, dec: str) -> tuple[str, str]:
    """ANSI-SQL twin of :func:`equatorial_to_galactic` (textually
    parallel)."""
    import math
    ag = math.radians(_GAL_RA_NGP)
    dgs = math.sin(math.radians(_GAL_DEC_NGP))
    dgc = math.cos(math.radians(_GAL_DEC_NGP))
    a, d = f"radians({ra})", f"radians({dec})"
    sinb = (f"(sin({d}) * {dgs!r}"
            f" + cos({d}) * {dgc!r} * cos({a} - {ag!r}))")
    b = f"degrees(asin(greatest(least({sinb}, 1.0), -1.0)))"
    l_raw = (f"({_GAL_L_NCP!r} - degrees(atan2("
             f"cos({d}) * sin({a} - {ag!r}), "
             f"sin({d}) * {dgc!r}"
             f" - cos({d}) * {dgs!r} * cos({a} - {ag!r}))))")
    l = f"(({l_raw}) % 360.0 + 360.0) % 360.0"
    return l, b


def cone_filter(ra_col, dec_col, ra0: float, dec0: float,
                radius_deg: float) -> Column:
    """Boolean cone-search predicate: within ``radius_deg`` of
    (ra0, dec0). The declination BAND test leads the conjunction —
    a sargable range predicate on a plain column, so on dec-sorted /
    dec-bucketed data it prunes files and row groups BEFORE the
    trigonometry runs on survivors (the Zones-algorithm trick applied
    to a point query)."""
    if radius_deg <= 0:
        raise ValueError("radius_deg must be positive")
    band = _c(dec_col).between(dec0 - radius_deg, dec0 + radius_deg)
    sep = angular_sep(ra_col, dec_col, F.lit(float(ra0)),
                      F.lit(float(dec0)))
    return band & (sep <= F.lit(float(radius_deg)))
