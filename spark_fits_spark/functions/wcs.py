"""Linear + TAN (gnomonic) world-coordinate transforms as JVM columns.

FITS images locate their pixels on the sky through WCS header cards
(CRVALn/CRPIXn/CDn_n — Greisen & Calabretta 2002, A&A 395, 1061; the
published standard, independent implementation). The reference reads
the cards but leaves coordinates to astropy on the driver; here the
pixel→sky transform is `pyspark.sql.functions` arithmetic, so a
detection table (plane, y, x) converts to (ra, dec) at scan speed and
feeds straight into the Zones crossmatch or the HEALPix sky map.

Conventions: FITS pixel coordinates are 1-based at the pixel CENTER;
the operators' (x, y) are 0-based array indices, so the transform adds
1 before subtracting CRPIX. The inverse (sky→pixel) is provided for
round-trip testing and forced-photometry target placement.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import Column
from pyspark.sql import functions as F


@dataclass(frozen=True)
class TanWcs:
    """Gnomonic-projection WCS: reference sky point (deg), reference
    pixel (1-based, FITS convention), and the CD matrix (deg/pixel)."""

    crval1: float     # RA at the reference point, degrees
    crval2: float     # Dec at the reference point, degrees
    crpix1: float     # reference pixel along x (NAXIS1 axis), 1-based
    crpix2: float     # reference pixel along y, 1-based
    cd1_1: float
    cd1_2: float
    cd2_1: float
    cd2_2: float

    @classmethod
    def from_header(cls, header: dict) -> "TanWcs":
        """Build from parsed header cards; accepts the CDn_n matrix or
        the older CDELTn (+ optional CROTA2 = 0) form."""
        def g(k, d=None):
            v = header.get(k, d)
            if v is None:
                raise ValueError(f"WCS: missing header card {k}")
            return float(v)

        ctype = str(header.get("CTYPE1", "")).strip("' ")
        if ctype and not ctype.endswith("TAN"):
            raise NotImplementedError(
                f"only the TAN projection is supported, got CTYPE1={ctype!r}")
        if "CD1_1" in header:
            cd = (g("CD1_1"), g("CD1_2", 0.0), g("CD2_1", 0.0), g("CD2_2"))
        else:
            if float(header.get("CROTA2", 0.0) or 0.0) != 0.0:
                raise NotImplementedError(
                    "CROTA2 rotation is not supported; provide a CD matrix")
            cd = (g("CDELT1"), 0.0, 0.0, g("CDELT2"))
        return cls(g("CRVAL1"), g("CRVAL2"), g("CRPIX1"), g("CRPIX2"), *cd)


def pixel_to_sky(wcs: TanWcs, x, y) -> tuple[Column, Column]:
    """(ra_deg, dec_deg) columns for 0-based pixel indices (x, y) —
    the standard inverse gnomonic:
    ``tan(α−α0) = ξ / (cos δ0 − η sin δ0)``,
    ``tan δ = (sin δ0 + η cos δ0)·cos(α−α0) / (cos δ0 − η sin δ0)``,
    with (ξ, η) the CD-mapped intermediate coordinates in radians."""
    xc = (F.col(x) if isinstance(x, str) else x).cast("double")
    yc = (F.col(y) if isinstance(y, str) else y).cast("double")
    # 0-based index -> 1-based FITS pixel, offset from CRPIX
    u = xc + F.lit(1.0 - wcs.crpix1)
    v = yc + F.lit(1.0 - wcs.crpix2)
    xi = F.radians(F.lit(wcs.cd1_1) * u + F.lit(wcs.cd1_2) * v)
    eta = F.radians(F.lit(wcs.cd2_1) * u + F.lit(wcs.cd2_2) * v)
    d0 = math.radians(wcs.crval2)
    den = F.lit(math.cos(d0)) - eta * F.lit(math.sin(d0))
    dalpha = F.atan2(xi, den)
    ra = F.pmod(F.degrees(F.lit(math.radians(wcs.crval1)) + dalpha),
                F.lit(360.0))
    dec = F.degrees(F.atan(
        (F.lit(math.sin(d0)) + eta * F.lit(math.cos(d0)))
        * F.cos(dalpha) / den))
    return ra, dec


def tan_pixel_to_sky_sql(wcs: TanWcs, x_expr: str,
                         y_expr: str) -> tuple[str, str]:
    """(ra_sql, dec_sql) ANSI-SQL twins of :func:`pixel_to_sky` for
    DuckDB oracle replay — textually parallel so the two stay in
    lockstep."""
    u = f"(({x_expr}) + {1.0 - wcs.crpix1!r})"
    v = f"(({y_expr}) + {1.0 - wcs.crpix2!r})"
    xi = f"radians({wcs.cd1_1!r} * {u} + {wcs.cd1_2!r} * {v})"
    eta = f"radians({wcs.cd2_1!r} * {u} + {wcs.cd2_2!r} * {v})"
    d0 = math.radians(wcs.crval2)
    a0 = math.radians(wcs.crval1)
    den = f"({math.cos(d0)!r} - {eta} * {math.sin(d0)!r})"
    dalpha = f"atan2({xi}, {den})"
    ra = (f"(degrees({a0!r} + {dalpha}) % 360.0 + 360.0) % 360.0")
    dec = (f"degrees(atan(({math.sin(d0)!r} + {eta} * {math.cos(d0)!r})"
           f" * cos({dalpha}) / {den}))")
    return ra, dec


def fit_tangent_affine(df, plane_col: str, u_col: str, v_col: str,
                       xi_col: str, eta_col: str):
    """Astrometric solve (plate solution): per plane, the
    least-squares 6-parameter affine mapping pixel offsets (u, v) to
    tangent-plane coordinates ``ξ = a·u + b·v + c``,
    ``η = d·u + e·v + f`` — the linear part of fitting a TAN WCS to
    matched (detection, catalog) star pairs (Greisen & Calabretta
    2002 §2; the CD matrix IS (a b; d e) and CRVAL follows from
    (c, f)).

    Solved in closed form: ONE map-side-combined groupBy collects the
    12 normal-equation sums, then Cramer's rule on the shared 3×3
    system as column arithmetic — no driver-side solver, |planes|
    output rows at any pair count. Returns
    ``(plane, n_pairs, a, b, c, d, e, f)``; planes with a singular
    system (< 3 non-collinear pairs) yield NULL coefficients."""
    u = F.col(u_col).cast("double")
    v = F.col(v_col).cast("double")
    xi = F.col(xi_col).cast("double")
    eta = F.col(eta_col).cast("double")
    g = df.groupBy(F.col(plane_col).alias("plane")).agg(
        F.count("*").alias("n_pairs"),
        F.sum(u).alias("su"), F.sum(v).alias("sv"),
        F.sum(u * u).alias("suu"), F.sum(v * v).alias("svv"),
        F.sum(u * v).alias("suv"),
        F.sum(xi).alias("sx"), F.sum(xi * u).alias("sxu"),
        F.sum(xi * v).alias("sxv"),
        F.sum(eta).alias("se"), F.sum(eta * u).alias("seu"),
        F.sum(eta * v).alias("sev"))
    n = F.col("n_pairs").cast("double")
    suu, svv, suv = F.col("suu"), F.col("svv"), F.col("suv")
    su, sv = F.col("su"), F.col("sv")

    def det3(c1, c2, c3):
        # columns of the 3x3 matrix, each a (row1, row2, row3) triple
        (a1, a2, a3), (b1, b2, b3), (d1, d2, d3) = c1, c2, c3
        return (a1 * (b2 * d3 - b3 * d2) - b1 * (a2 * d3 - a3 * d2)
                + d1 * (a2 * b3 - a3 * b2))

    m1, m2, m3 = (suu, suv, su), (suv, svv, sv), (su, sv, n)
    det = det3(m1, m2, m3)
    ok = F.abs(det) > F.lit(1e-12)

    def solve(r1, r2, r3):
        rhs = (r1, r2, r3)
        return (F.when(ok, det3(rhs, m2, m3) / det),
                F.when(ok, det3(m1, rhs, m3) / det),
                F.when(ok, det3(m1, m2, rhs) / det))

    a, b, c = solve(F.col("sxu"), F.col("sxv"), F.col("sx"))
    d, e, f = solve(F.col("seu"), F.col("sev"), F.col("se"))
    return g.select("plane", "n_pairs", a.alias("a"), b.alias("b"),
                    c.alias("c"), d.alias("d"), e.alias("e"),
                    f.alias("f"))


def tan_sky_to_pixel_sql(wcs: TanWcs, ra_expr: str,
                         dec_expr: str) -> tuple[str, str]:
    """(x_sql, y_sql) ANSI-SQL twins of :func:`sky_to_pixel` — same
    textual-parallel contract as :func:`tan_pixel_to_sky_sql`."""
    det = wcs.cd1_1 * wcs.cd2_2 - wcs.cd1_2 * wcs.cd2_1
    if det == 0:
        raise ValueError("WCS: singular CD matrix")
    a0 = math.radians(wcs.crval1)
    d0 = math.radians(wcs.crval2)
    a = f"radians({ra_expr})"
    d = f"radians({dec_expr})"
    cosda = f"cos({a} - {a0!r})"
    bigd = (f"({math.sin(d0)!r} * sin({d})"
            f" + {math.cos(d0)!r} * cos({d}) * {cosda})")
    xi = f"degrees(cos({d}) * sin({a} - {a0!r}) / {bigd})"
    eta = (f"degrees(({math.cos(d0)!r} * sin({d})"
           f" - {math.sin(d0)!r} * cos({d}) * {cosda}) / {bigd})")
    u = f"({wcs.cd2_2 / det!r} * {xi} - {wcs.cd1_2 / det!r} * {eta})"
    v = f"({-wcs.cd2_1 / det!r} * {xi} + {wcs.cd1_1 / det!r} * {eta})"
    return (f"({u} + {wcs.crpix1 - 1.0!r})", f"({v} + {wcs.crpix2 - 1.0!r})")


def sky_to_pixel(wcs: TanWcs, ra_deg, dec_deg) -> tuple[Column, Column]:
    """Inverse of :func:`pixel_to_sky`: 0-based (x, y) columns (doubles
    — callers round/floor as needed) via the forward gnomonic
    ``ξ = cos δ sin Δα / D``, ``η = (cos δ0 sin δ − sin δ0 cos δ
    cos Δα) / D``, ``D = sin δ0 sin δ + cos δ0 cos δ cos Δα``, then the
    inverted CD matrix."""
    det = wcs.cd1_1 * wcs.cd2_2 - wcs.cd1_2 * wcs.cd2_1
    if det == 0:
        raise ValueError("WCS: singular CD matrix")
    ra = (F.col(ra_deg) if isinstance(ra_deg, str) else ra_deg)
    dec = (F.col(dec_deg) if isinstance(dec_deg, str) else dec_deg)
    a = F.radians(ra.cast("double"))
    d = F.radians(dec.cast("double"))
    a0 = math.radians(wcs.crval1)
    d0 = math.radians(wcs.crval2)
    cosda = F.cos(a - F.lit(a0))
    bigd = (F.lit(math.sin(d0)) * F.sin(d)
            + F.lit(math.cos(d0)) * F.cos(d) * cosda)
    xi = F.degrees(F.cos(d) * F.sin(a - F.lit(a0)) / bigd)
    eta = F.degrees((F.lit(math.cos(d0)) * F.sin(d)
                     - F.lit(math.sin(d0)) * F.cos(d) * cosda) / bigd)
    u = (F.lit(wcs.cd2_2 / det) * xi - F.lit(wcs.cd1_2 / det) * eta)
    v = (F.lit(-wcs.cd2_1 / det) * xi + F.lit(wcs.cd1_1 / det) * eta)
    xpix = u + F.lit(wcs.crpix1 - 1.0)
    ypix = v + F.lit(wcs.crpix2 - 1.0)
    return xpix, ypix


def sky_to_pixel_scalar(wcs: TanWcs, ra_deg: float,
                        dec_deg: float) -> tuple[float, float]:
    """Driver-side scalar twin of :func:`sky_to_pixel` (same gnomonic
    inversion, plain ``math``) — for planning decisions that need a
    pixel position BEFORE any DataFrame exists (e.g. the sky-cutout
    reader's rowrange pushdown bounds)."""
    det = wcs.cd1_1 * wcs.cd2_2 - wcs.cd1_2 * wcs.cd2_1
    if det == 0:
        raise ValueError("WCS: singular CD matrix")
    a = math.radians(ra_deg)
    d = math.radians(dec_deg)
    a0 = math.radians(wcs.crval1)
    d0 = math.radians(wcs.crval2)
    cosda = math.cos(a - a0)
    bigd = (math.sin(d0) * math.sin(d)
            + math.cos(d0) * math.cos(d) * cosda)
    xi = math.degrees(math.cos(d) * math.sin(a - a0) / bigd)
    eta = math.degrees((math.cos(d0) * math.sin(d)
                        - math.sin(d0) * math.cos(d) * cosda) / bigd)
    u = wcs.cd2_2 / det * xi - wcs.cd1_2 / det * eta
    v = -wcs.cd2_1 / det * xi + wcs.cd1_1 / det * eta
    return u + wcs.crpix1 - 1.0, v + wcs.crpix2 - 1.0


def sin_pixel_to_sky(wcs: TanWcs, x, y) -> tuple[Column, Column]:
    """SIN (orthographic, Greisen & Calabretta 2002 §5.1.5)
    pixel → sky as JVM columns — the projection of choice for radio
    interferometry images (small-field FITS from synthesis arrays):
    ``δ = asin(√(1−ρ²)·sin δ0 + η cos δ0)``,
    ``α = α0 + atan2(ξ, √(1−ρ²)·cos δ0 − η sin δ0)``,
    (ξ, η) the CD-mapped intermediates in radians, ρ² = ξ² + η².
    Same ``TanWcs`` parameter bundle — only CTYPE differs on disk."""
    xc = (F.col(x) if isinstance(x, str) else x).cast("double")
    yc = (F.col(y) if isinstance(y, str) else y).cast("double")
    u = xc + F.lit(1.0 - wcs.crpix1)
    v = yc + F.lit(1.0 - wcs.crpix2)
    xi = F.radians(F.lit(wcs.cd1_1) * u + F.lit(wcs.cd1_2) * v)
    eta = F.radians(F.lit(wcs.cd2_1) * u + F.lit(wcs.cd2_2) * v)
    d0 = math.radians(wcs.crval2)
    cosc = F.sqrt(F.greatest(
        F.lit(1.0) - xi * xi - eta * eta, F.lit(0.0)))
    dec = F.degrees(F.asin(
        cosc * F.lit(math.sin(d0)) + eta * F.lit(math.cos(d0))))
    ra = F.pmod(F.degrees(
        F.lit(math.radians(wcs.crval1))
        + F.atan2(xi, cosc * F.lit(math.cos(d0))
                  - eta * F.lit(math.sin(d0)))), F.lit(360.0))
    return ra, dec


def sin_sky_to_pixel(wcs: TanWcs, ra_deg, dec_deg) -> tuple[Column,
                                                            Column]:
    """Inverse of :func:`sin_pixel_to_sky`: the forward orthographic
    ``ξ = cos δ sin Δα``, ``η = cos δ0 sin δ − sin δ0 cos δ cos Δα``
    through the inverted CD matrix → 0-based (x, y) columns."""
    det = wcs.cd1_1 * wcs.cd2_2 - wcs.cd1_2 * wcs.cd2_1
    if det == 0:
        raise ValueError("WCS: singular CD matrix")
    ra = (F.col(ra_deg) if isinstance(ra_deg, str) else ra_deg)
    dec = (F.col(dec_deg) if isinstance(dec_deg, str) else dec_deg)
    a = F.radians(ra.cast("double"))
    d = F.radians(dec.cast("double"))
    a0 = math.radians(wcs.crval1)
    d0 = math.radians(wcs.crval2)
    xi = F.degrees(F.cos(d) * F.sin(a - F.lit(a0)))
    eta = F.degrees(F.lit(math.cos(d0)) * F.sin(d)
                    - F.lit(math.sin(d0)) * F.cos(d)
                    * F.cos(a - F.lit(a0)))
    u = (F.lit(wcs.cd2_2 / det) * xi - F.lit(wcs.cd1_2 / det) * eta)
    v = (F.lit(-wcs.cd2_1 / det) * xi + F.lit(wcs.cd1_1 / det) * eta)
    return (u + F.lit(wcs.crpix1 - 1.0), v + F.lit(wcs.crpix2 - 1.0))


def fit_tangent_quadratic(df, plane_col: str, u_col: str, v_col: str,
                          xi_col: str, eta_col: str):
    """Astrometric solve with DISTORTION — per plane, the
    least-squares quadratic mapping ``ξ ≈ a·u + b·v + c + d·u² +
    e·uv + f·v²`` (and likewise η): the SIP-style optical-distortion
    plate solution the affine :func:`fit_tangent_affine` cannot
    absorb (Shupe et al. 2005). Returns ``(plane, n_pairs, xi_coef,
    eta_coef)`` with 6-element coefficient arrays; singular planes
    (< 6 well-conditioned pairs) yield NULL arrays.

    Scale shape: ONE map-side-combined groupBy collects the ≤ 27
    normal-equation moments per plane (all the data ever shuffles);
    the tiny |planes|×27 table is solved driver-side with numpy
    (bounded by the PLANE count, not the pair count) and returned as
    a DataFrame — the same bounded-driver-step pattern as the
    k-means centroid update."""
    import numpy as np

    u = F.col(u_col).cast("double")
    v = F.col(v_col).cast("double")
    basis = {"u": u, "v": v, "one": F.lit(1.0),
             "uu": u * u, "uv": u * v, "vv": v * v}
    keys = list(basis)
    aggs = [F.count("*").alias("n_pairs")]
    # Gram matrix entries (symmetric -> 21 distinct) + 2x6 RHS
    seen = set()
    for i, ki in enumerate(keys):
        for kj in keys[i:]:
            nm = f"g_{ki}_{kj}"
            seen.add(nm)
            aggs.append(F.sum(basis[ki] * basis[kj]).alias(nm))
        for t, tc in (("xi", xi_col), ("eta", eta_col)):
            aggs.append(F.sum(basis[ki] * F.col(tc).cast("double"))
                        .alias(f"r_{t}_{ki}"))
    g = df.groupBy(F.col(plane_col).alias("plane")).agg(*aggs)
    rows = g.collect()  # bounded-collect: one row per PLANE (27 sums)

    out = []
    for r in rows:
        G = np.empty((6, 6))
        for i, ki in enumerate(keys):
            for j, kj in enumerate(keys):
                a, b = (ki, kj) if f"g_{ki}_{kj}" in seen else (kj, ki)
                G[i, j] = r[f"g_{a}_{b}"]
        sol = {}
        ok = True
        for t in ("xi", "eta"):
            rhs = np.array([r[f"r_{t}_{k}"] for k in keys])
            try:
                cond = np.linalg.cond(G)
                if not np.isfinite(cond) or cond > 1e12:
                    ok = False
                    break
                sol[t] = [float(x) for x in np.linalg.solve(G, rhs)]
            except np.linalg.LinAlgError:
                ok = False
                break
        out.append((r["plane"], r["n_pairs"],
                    sol["xi"] if ok else None,
                    sol["eta"] if ok else None))
    spark = df.sparkSession
    return spark.createDataFrame(
        out, "plane long, n_pairs long, xi_coef array<double>, "
             "eta_coef array<double>")
