"""Semantics checks for the web-mercator tile grid (geo/webmerc.py).

Parity proves engine==oracle; here the pinned polynomial/ln tree is
checked against the standard libm slippy-map formulas, and the
quadkey/TMS/bbox relations are verified structurally.
"""
import math
import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rsgislib_spark.geo.webmerc import R_MERC, webmerc_tile_sql

ZOOM = 12
N = 1 << ZOOM

PTS = [(0.0, 0.0), (-179.9, -84.9), (179.9, 84.9), (13.4, 52.5),
       (-74.0, 40.7), (151.2, -33.9), (-0.1, 51.5), (77.6, 12.97)]


@pytest.fixture(scope="module")
def rows():
    con = duckdb.connect()
    vals = ", ".join(f"({i}, CAST({lon} AS DOUBLE), CAST({lat} AS DOUBLE))"
                     for i, (lon, lat) in enumerate(PTS))
    inner = f"SELECT * FROM (VALUES {vals}) t(qid, qlon, qlat)"
    sql, fin = webmerc_tile_sql(inner, "qlon", "qlat", ZOOM)
    keys = ("qid", "mx", "my", "tx", "ty", "tms_y", "qk_num",
            "lon_tl", "bxmin", "bxmax", "bymin", "bymax")
    sel = ", ".join(fin.get(k, k) + f" AS {k}" for k in keys)
    out = con.sql(f"SELECT {sel} FROM ({sql}) ORDER BY qid").fetchall()
    return [dict(zip(keys, r)) for r in out]


def test_mercator_xy_matches_libm(rows):
    for r, (lon, lat) in zip(rows, PTS):
        mx_ref = math.radians(lon) * R_MERC
        my_ref = R_MERC * math.log(math.tan(math.pi / 4
                                            + math.radians(lat) / 2))
        assert abs(r["mx"] - mx_ref) <= 1e-6 * max(1, abs(mx_ref))
        assert abs(r["my"] - my_ref) <= 1e-9 * max(1, abs(my_ref))


def test_tile_indices_match_slippy_formula(rows):
    for r, (lon, lat) in zip(rows, PTS):
        xt = min(N - 1, max(0, math.floor((lon + 180) / 360 * N)))
        lat_r = math.radians(lat)
        yt = math.floor((1 - math.asinh(math.tan(lat_r)) / math.pi) / 2 * N)
        yt = min(N - 1, max(0, yt))
        assert r["tx"] == xt, (lon, lat)
        assert r["ty"] == yt, (lon, lat)
        assert r["tms_y"] == N - 1 - r["ty"]


def test_quadkey_interleave_roundtrip(rows):
    for r in rows:
        qk = int(r["qk_num"])
        tx = ty = 0
        for j in range(ZOOM):
            d = (qk // 4 ** j) % 4
            tx |= (d & 1) << j
            ty |= (d >> 1) << j
        assert (tx, ty) == (r["tx"], r["ty"])
        # the base-4 digit string is Bing's quadkey (MSB first)
        digits = "".join(str((qk // 4 ** j) % 4)
                         for j in range(ZOOM - 1, -1, -1))
        assert len(digits) == ZOOM


def test_tile_bbox_contains_point(rows):
    half_world = math.pi * R_MERC
    step = 2 * half_world / N
    for r in rows:
        assert math.isclose(r["bxmax"] - r["bxmin"], step, rel_tol=1e-12)
        assert math.isclose(r["bymax"] - r["bymin"], step, rel_tol=1e-12)
        assert r["bxmin"] - 1e-6 <= r["mx"] <= r["bxmax"] + 1e-6
        assert r["bymin"] - 1e-6 <= r["my"] <= r["bymax"] + 1e-6
        assert -half_world - 1 <= r["bxmin"] < r["bxmax"] <= half_world + 1
        # top-left lon of the tile column
        assert math.isclose(r["lon_tl"], r["tx"] / N * 360 - 180,
                            rel_tol=1e-12)
