"""imagecalibration.solarangles (solarangles.py):

* ``calc_solar_azimuth_zenith`` (:90) — per-pixel solar azimuth/zenith
  planes via Pysolar at the acquisition datetime.  Pysolar is absent
  here and its ephemeris is float-libm-bound, so the engine computes
  the standard solar-position core deterministically: Cooper
  declination delta = 23.45 deg * sin(2*pi*(284+doy)/365), hour angle
  H from the quarter-hour acquisition slot, and emits cos(zenith) =
  sin(phi)sin(delta) + cos(phi)cos(delta)cos(H) (the zenith plane up
  to the monotone acos, which is not exactly representable).
* ``get_solar_irr_convention_solar_azimuth_from_usgs`` (:40) and
  ``_from_trad`` (:64) — the two azimuth convention conversions,
  replicated branch for branch on a synthetic azimuth column.

Exactness: every trig argument is an integer multiple of a turn
fraction, folded to [0, pi/2) by INTEGER quadrant arithmetic
(k = 4m - 365q etc.), then evaluated by the repo's polynomial sin/cos
(geo/transverse_mercator) — identical IEEE trees in both engines.
phi = lat and delta are within the polynomial domain directly.
"""
from pyspark.sql import DataFrame

from ..geo.transverse_mercator import (_COS_C, _SIN_C, _horner, dlit,
                                       StepBuilder)

__all__ = ["solar_steps", "AZ_CASES"]

import math

_D2R = math.pi / 180.0


def _poly_cos(x: str) -> str:
    x2 = f"(({x}) * ({x}))"
    return _horner(x2, _COS_C)


def _poly_sin(x: str) -> str:
    x2 = f"(({x}) * ({x}))"
    return f"(({x}) * {_horner(x2, _SIN_C)})"


def _fold_turn(b: StepBuilder, num: str, den: int, pfx: str):
    """cos/sin of 2*pi*num/den for INTEGER expr num (any sign) via
    quadrant folding: un = num mod den, q = un // (den/4 exact in the
    4*un form), k = 4*un - den*q, a = k * (2*pi/(4*den)).  Returns
    (cos_col, sin_col)."""
    un = b.add(f"((({num}) % {den} + {den}) % {den})")
    # shared-text integer floor division (Spark lacks //): 4*un/den is
    # never within an ulp of a wrong integer (gap >= 1/den >> ulp)
    q = b.add(f"CAST(floor(CAST(4 * {un} AS DOUBLE)"
              f" / CAST({den} AS DOUBLE)) AS BIGINT)")
    k = b.add(f"(4 * {un} - {den} * {q})")
    a = b.add(f"(CAST({k} AS DOUBLE) * {dlit(2.0 * math.pi / (4 * den))})")
    ca = b.add(_poly_cos(a))
    sa = b.add(_poly_sin(a))
    c = b.add(f"(CASE {q} WHEN 0 THEN {ca} WHEN 1 THEN -{sa}"
              f" WHEN 2 THEN -{ca} ELSE {sa} END)")
    s = b.add(f"(CASE {q} WHEN 0 THEN {sa} WHEN 1 THEN {ca}"
              f" WHEN 2 THEN -{sa} ELSE -{ca} END)")
    return c, s


def solar_steps(pfx: str = "__so"):
    """Steps over columns ``id`` (BIGINT) and ``lat`` (DOUBLE):
    doy = id % 365 + 1, quarter-hour slot = id % 96.  Finals:
    cos_zen, sin_dec, and both azimuth convention conversions of
    az_usgs = (id*37) % 361 - 180 (and its trad twin)."""
    b = StepBuilder(pfx)
    # declination: delta = 23.45deg * sin(2*pi*(284 + doy)/365)
    _, s_dec_t = _fold_turn(b, "(284 + (id % 365 + 1))", 365, pfx)
    drad = b.add(f"({dlit(23.45 * _D2R)} * {s_dec_t})")
    sin_dec = b.add(_poly_sin(drad))
    cos_dec = b.add(_poly_cos(drad))
    # hour angle from the quarter-hour slot: H = (slot - 48)/96 turn
    c_h, _ = _fold_turn(b, "(id % 96 - 48)", 96, pfx)
    # site latitude
    lrad = b.add(f"(lat * {dlit(_D2R)})")
    sin_lat = b.add(_poly_sin(lrad))
    cos_lat = b.add(_poly_cos(lrad))
    cos_zen = (f"(({sin_lat} * {sin_dec})"
               f" + (({cos_lat} * {cos_dec}) * {c_h}))")
    return b.steps, {"cos_zen": cos_zen, "sin_dec": sin_dec}


#: azimuth convention conversions (integer CASE, shared text) — input
#: az_usgs in [-180, 180], az_trad likewise
AZ_CASES = {
    "az_usgs": "(CAST((id * 37) % 361 AS BIGINT) - 180)",
    "az_trad": "(CAST((id * 53) % 361 AS BIGINT) - 180)",
    # from_usgs: negative -> 360 + az
    "az_irr_usgs": "(CASE WHEN {u} < 0 THEN 360 + {u} ELSE {u} END)",
    # from_trad: >0 -> 180 - az; <0 -> 180 + (-az); 0 -> 0
    "az_irr_trad": ("(CASE WHEN {t} > 0 THEN 180 - {t}"
                    " WHEN {t} < 0 THEN 180 + (-1) * {t}"
                    " ELSE 0 END)"),
}


def solar_angles(images: DataFrame) -> DataFrame:
    from .vector import _apply_expr_steps
    steps, finals = solar_steps()
    df = images.selectExpr(
        "image_id", "id", "lat",
        "CAST(id % 365 + 1 AS BIGINT) AS doy",
        "CAST(id % 96 AS BIGINT) AS hour_slot",
        f"{AZ_CASES['az_usgs']} AS az_usgs",
        f"{AZ_CASES['az_trad']} AS az_trad")
    df = _apply_expr_steps(df, steps, finals)
    return df.selectExpr(
        "image_id", "doy", "hour_slot", "cos_zen", "sin_dec",
        f"CAST({AZ_CASES['az_irr_usgs'].format(u='az_usgs')} AS BIGINT)"
        " AS az_irr_usgs",
        f"CAST({AZ_CASES['az_irr_trad'].format(t='az_trad')} AS BIGINT)"
        " AS az_irr_trad")
