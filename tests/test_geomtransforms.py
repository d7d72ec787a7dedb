"""Geometry transforms + true UTM: kernel-level pins beyond the oracle."""

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _tm_libm(lon, lat, zone):
    """Independent Snyder-series reference using true libm trig."""
    a = 6378137.0
    f = 1 / 298.257223563
    e2 = f * (2 - f)
    ep2 = e2 / (1 - e2)
    k0 = 0.9996
    lam0 = math.radians(-183 + 6 * zone)
    phi, lam = math.radians(lat), math.radians(lon)
    s, c = math.sin(phi), math.cos(phi)
    n = a / math.sqrt(1 - e2 * s * s)
    t = (s / c) ** 2
    cc = ep2 * c * c
    aa = (lam - lam0) * c
    m = a * ((1 - e2 / 4 - 3 * e2 ** 2 / 64 - 5 * e2 ** 3 / 256) * phi
             - (3 * e2 / 8 + 3 * e2 ** 2 / 32 + 45 * e2 ** 3 / 1024)
             * math.sin(2 * phi)
             + (15 * e2 ** 2 / 256 + 45 * e2 ** 3 / 1024) * math.sin(4 * phi)
             - (35 * e2 ** 3 / 3072) * math.sin(6 * phi))
    x = k0 * n * (aa + (1 - t + cc) * aa ** 3 / 6
                  + (5 - 18 * t + t * t + 72 * cc - 58 * ep2)
                  * aa ** 5 / 120) + 500000
    y = k0 * (m + n * (s / c) * (aa * aa / 2
                                 + (5 - t + 9 * cc + 4 * cc * cc)
                                 * aa ** 4 / 24
                                 + (61 - 58 * t + t * t + 600 * cc
                                    - 330 * ep2) * aa ** 6 / 720))
    return x, y


def test_utm_polynomial_accuracy(spark):
    """The polynomial-trig TM must agree with the libm-trig Snyder
    series to well under a millimetre over the zone extent."""
    from rsgislib_spark.operators.vector import reproj_wgs84_to_utm

    pts = [(i, 6.01 + (i % 17) * 0.37, -72.0 + (i % 29) * 5.0)
           for i in range(60)]
    df = spark.createDataFrame(pts, "qid long, lon double, lat double")
    out = reproj_wgs84_to_utm(df, zone=32).collect()
    for r in out:
        x, y = _tm_libm(r.lon, r.lat, 32)
        if r.lat < 0:
            y += 10000000.0
        assert abs(r.utm_x - x) < 1e-4, (r.lon, r.lat)
        assert abs(r.utm_y - y) < 1e-4, (r.lon, r.lat)


def test_simplify_keeps_corners_drops_midpoints(spark):
    from pyspark.sql import functions as F

    from rsgislib_spark.operators.geomtransforms import simplify_polys

    octo = [[0.0, 0.0], [2.0, 0.0], [4.0, 0.0], [4.0, 2.0],
            [4.0, 4.0], [2.0, 4.0], [0.0, 4.0], [0.0, 2.0]]
    df = spark.createDataFrame([(1, octo)],
                               "poly_id long, verts array<array<double>>")
    rows = sorted((r.v_idx, r.vx, r.vy)
                  for r in simplify_polys(df, 1e-9).collect())
    assert [(x, y) for _, x, y in rows] == [
        (0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (0.0, 4.0)]


def test_overlay_clip_triangle_in_rect(spark):
    from rsgislib_spark.operators.overlay import overlay_intersection_rect

    polys = spark.createDataFrame(
        [(1, [[0.0, 0.0], [4.0, 0.0], [2.0, 4.0]], 0.0, 4.0, 0.0, 4.0)],
        "poly_id long, verts array<array<double>>, pxmin double,"
        " pxmax double, pymin double, pymax double")
    rects = spark.createDataFrame(
        [(10, 1.0, 3.0, 1.0, 3.0)],
        "rect_id long, rxmin double, rxmax double, rymin double,"
        " rymax double")
    rows = sorted((r.v_idx, r.vx, r.vy)
                  for r in overlay_intersection_rect(polys, rects).collect())
    # Sutherland–Hodgman of the triangle against the unit-offset square
    assert [(x, y) for _, x, y in rows] == [
        (1.5, 3.0), (1.0, 2.0), (1.0, 1.0), (3.0, 1.0), (3.0, 2.0),
        (2.5, 3.0)]


def test_reproj_epsg_osgb_golden(spark):
    """EPSG:27700 (Airy ellipsoid, non-zero lat0/k0/false origin) must
    reproduce the Ordnance Survey's published worked example ('A guide
    to coordinate systems in Great Britain': OSGB36 52°39'27.2531"N,
    1°43'4.5177"E -> E 651409.903, N 313177.270) to the millimetre."""
    from rsgislib_spark.operators.vector import reproj_epsg

    lat = 52 + 39 / 60 + 27.2531 / 3600
    lon = 1 + 43 / 60 + 4.5177 / 3600
    df = spark.createDataFrame([(1, lon, lat)],
                               "qid long, lon double, lat double")
    r = reproj_epsg(df, 27700).collect()[0]
    assert abs(r.x_proj - 651409.903) < 1e-3
    assert abs(r.y_proj - 313177.270) < 1e-3


def test_reproj_epsg_utm_consistency(spark):
    """The EPSG registry's UTM entries must match the dedicated UTM path
    bit-for-bit (same generator, same literals)."""
    from rsgislib_spark.operators.vector import reproj_epsg, reproj_wgs84_to_utm

    pts = [(i, 6.01 + (i % 17) * 0.37, 1.0 + (i % 29) * 2.0)
           for i in range(40)]
    df = spark.createDataFrame(pts, "qid long, lon double, lat double")
    a = {r.qid: (r.utm_x, r.utm_y)
         for r in reproj_wgs84_to_utm(df, zone=32).collect()}
    b = {r.qid: (r.x_proj, r.y_proj)
         for r in reproj_epsg(df, 32632).collect()}
    assert a == b


def test_reproj_epsg_unknown_raises(spark):
    import pytest as _pytest

    from rsgislib_spark.operators.vector import reproj_epsg

    df = spark.range(1).selectExpr("id qid", "0.0 lon", "0.0 lat")
    with _pytest.raises(ValueError, match="not a registered TM-family"):
        reproj_epsg(df, 4326)
