"""tools.utm DataFrame operators (zone assignment, modal zone, bbox
splitting, per-latitude easting ranges).

Reference: /root/reference/python/rsgislib/tools/utm.py — the zone
ladders live in :mod:`rsgislib_spark.geo.utmzones` as engine-portable
SQL text; this module wires them into Catalyst plans.

Scale notes: zone assignment is a stateless projection (no shuffle);
the modal zone is a 60-key aggregate (map-side combine, one tiny
shuffle); the bbox split is a 1-row aggregate exploded into <= 60
rows.  All trivially safe at any corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..geo.utmzones import zone_exprs, zone_number_expr
from ..geo.transverse_mercator import (TMParams, _K0, _WGS84,
                                       central_meridian_deg,
                                       tm_forward_steps)
from .vector import _apply_expr_steps

__all__ = ["utm_point_zones", "utm_zone_mode", "utm_bbox_split",
           "utm_min_max_eastings", "hi_lat_points"]


def hi_lat_points(qpts: DataFrame) -> DataFrame:
    """Base points plus a derived high-latitude copy (lat/5 + 76, in
    [64, 88)) so the Svalbard exception arms and the >84 letter
    sentinel are genuinely exercised (the synth layer alone spans only
    [-60, 60))."""
    base = qpts.selectExpr("qid * 2 AS pid", "qlon AS lon",
                           "qlat AS lat")
    hi = qpts.selectExpr(
        "qid * 2 + 1 AS pid", "qlon AS lon",
        "qlat / CAST(5 AS DOUBLE) + CAST(76 AS DOUBLE) AS lat")
    return base.unionAll(hi)


def utm_point_zones(qpts: DataFrame) -> DataFrame:
    """latlon_to_zone_number / latitude_to_zone_letter / epsg_for_utm /
    zone_number_to_central_longitude / check_valid_zone per point
    (utm.py:63-85,149-181,383-428,473-481)."""
    pts = hi_lat_points(qpts)
    ex = zone_exprs("lon", "lat")
    return pts.selectExpr("pid", "lon", "lat",
                          *[f"{e} AS {k}" for k, e in ex.items()])


def utm_zone_mode(qpts: DataFrame) -> DataFrame:
    """latlon_to_mode_utm_zone_number (utm.py:469+): modal zone over
    the base layer, smallest zone on count ties (numpy mode)."""
    z = qpts.selectExpr(f"{zone_number_expr('qlon', 'qlat')} AS zone")
    cnt = z.groupBy("zone").agg(F.count(F.lit(1)).alias("c"))
    tot = z.agg(F.count(F.lit(1)).alias("n_pts"),
                F.countDistinct("zone").alias("n_zones"))
    best = cnt.agg(F.max(F.struct(F.col("c"),
                                  (-F.col("zone")).alias("nz")))
                   .alias("b")) \
        .select(F.col("b.c").alias("n_modal"),
                (-F.col("b.nz")).alias("mode_zone"))
    return best.crossJoin(tot) \
        .select("mode_zone", "n_modal", "n_pts", "n_zones")


def utm_bbox_split(qpts: DataFrame) -> DataFrame:
    """split_wgs84_bbox_utm_zones (utm.py:107-146) over the base
    layer's WGS84 bbox: corner zones via the reference ladder, one
    clipped bbox row per spanned zone."""
    bb = qpts.agg(F.min("qlon").alias("x0"), F.max("qlon").alias("x1"),
                  F.min("qlat").alias("y0"), F.max("qlat").alias("y1"))
    zc = bb.selectExpr(
        "*",
        f"{zone_number_expr('x0', 'y1')} AS z_tl",
        f"{zone_number_expr('x1', 'y1')} AS z_tr",
        f"{zone_number_expr('x1', 'y0')} AS z_br",
        f"{zone_number_expr('x0', 'y0')} AS z_bl")
    zr = zc.selectExpr(
        "*", "least(z_tl, z_tr, z_br, z_bl) AS zmin",
        "greatest(z_tl, z_tr, z_br, z_bl) AS zmax")
    ex = zr.selectExpr("explode(sequence(zmin, zmax)) AS zone",
                       "x0", "x1", "y0", "y1")
    return ex.selectExpr(
        "CAST(zone AS BIGINT) AS zone",
        "CASE WHEN x0 > ((zone * 6.0) - 6.0) - 180.0 THEN x0"
        " ELSE ((zone * 6.0) - 6.0) - 180.0 END AS x_min",
        "CASE WHEN x1 < (zone * 6.0) - 180.0 THEN x1"
        " ELSE (zone * 6.0) - 180.0 END AS x_max",
        "y0 AS y_min", "y1 AS y_max")


def utm_min_max_eastings(nation: DataFrame, zone: int = 1) -> DataFrame:
    """min_max_eastings_for_lat (utm.py:41-60) on a 25-step latitude
    ladder (n_nationkey*5 - 60): the TM-series easting at the zone's
    central meridian -/+ 3 degrees, bit-exact across engines via the
    polynomial-trig forward."""
    p = TMParams(*_WGS84, central_meridian_deg(zone), 0.0, _K0,
                 500000.0, 0.0)
    cl = central_meridian_deg(zone)
    lo = f"CAST({int(cl - 3)} AS DOUBLE)"
    hi = f"CAST({int(cl + 3)} AS DOUBLE)"
    lats = nation.selectExpr(
        "CAST(n_nationkey AS BIGINT) AS k",
        "CAST(n_nationkey * 5 - 60 AS DOUBLE) AS lat")
    s1, e1, _ = tm_forward_steps(lo, "lat", p, pfx="__ua")
    s2, e2, _ = tm_forward_steps(hi, "lat", p, pfx="__ub")
    out = _apply_expr_steps(lats, s1 + s2,
                            {"min_easting": e1, "max_easting": e2})
    return out.select("k", "lat", "min_easting", "max_easting")
