"""Semantics: the algebraic line-op identities vs the reference's
trig branch ladders (vectorgeoms/__init__.py:154-269), and the
segment-intersection parameters vs brute-force geometry.
"""
import math
import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rsgislib_spark.operators.lineops import (DX, DY, line_project_exprs,
                                              t_expr, u_expr)


def _ref_pt_on_line(p1, p2, dist):
    """Transliteration of get_pt_on_line (:154)."""
    if dist == 0:
        return p1
    dx, dy = p2[0] - p1[0], p2[1] - p1[1]
    if abs(dx) > 0 and abs(dy) > 0:
        theta = math.atan(dy / dx)
        y1 = dist * math.sin(theta)
        x1 = dist * math.cos(theta)
        if dx >= 0:
            return p1[0] + x1, p1[1] + y1
        return p1[0] - x1, p1[1] - y1
    if dx == 0:
        return p1[0], p1[1] + (dist if dy > 0 else -dist)
    return p1[0] + (dist if dx > 0 else -dist), p1[1]


def _ref_pt_to_side(p1, pt, p2, w, left_hand=False):
    """Transliteration of find_pt_to_side (:206)."""
    if left_hand:
        p1, p2 = p2, p1
    dx, dy = p2[0] - p1[0], p2[1] - p1[1]
    if abs(dx) > 0 and abs(dy) > 0:
        beta = math.atan(dy / dx)
        d12 = math.hypot(pt[0] - p1[0], pt[1] - p1[1])
        d13 = math.sqrt(w * w + d12 * d12)
        theta = math.atan(w / d12)
        alpha = math.pi - (theta - beta)
        lx, ly = d13 * math.cos(alpha), d13 * math.sin(alpha)
    elif dx == 0:
        lx, ly = w, 0
    else:
        lx, ly = 0, w
    if dx >= 0:
        return p1[0] - lx, p1[1] - ly
    return p1[0] + lx, p1[1] + ly


def _eval_project(qlon, qlat):
    e = line_project_exprs()
    con = duckdb.connect()
    keys = list(e)
    row = con.sql(
        "SELECT " + ", ".join(e[k] for k in keys)
        + f" FROM (SELECT CAST({qlon} AS DOUBLE) AS qlon, "
        f"CAST({qlat} AS DOUBLE) AS qlat)").fetchone()
    return dict(zip(keys, row))


def test_pt_on_line_matches_reference_trig():
    for qlon, qlat in [(10.0, 20.0), (-33.5, 4.25), (100.0, -41.0),
                       (-0.5, -0.25)]:
        p1 = (qlon, qlat)
        p2 = (-qlon / 2, qlat - 30)
        got = _eval_project(qlon, qlat)
        ox, oy = _ref_pt_on_line(p1, p2, 5.0)
        assert abs(got["ox"] - ox) < 1e-9
        assert abs(got["oy"] - oy) < 1e-9
        # distance contract
        assert abs(math.hypot(got["ox"] - p1[0], got["oy"] - p1[1])
                   - 5.0) < 1e-9


def test_pt_to_side_matches_reference_trig():
    for qlon, qlat in [(10.0, 20.0), (-33.5, 4.25), (100.0, -41.0)]:
        p1 = (qlon, qlat)
        p2 = (-qlon / 2, qlat - 30)
        mid = ((p1[0] + p2[0]) / 2, (p1[1] + p2[1]) / 2)
        got = _eval_project(qlon, qlat)
        rx, ry = _ref_pt_to_side(p1, mid, p2, 3.0, False)
        lx, ly = _ref_pt_to_side(p1, mid, p2, 3.0, True)
        assert abs(got["rx"] - rx) < 1e-9 and abs(got["ry"] - ry) < 1e-9
        assert abs(got["lx"] - lx) < 1e-9 and abs(got["ly"] - ly) < 1e-9
        # both offsets sit at w from the line through p1,p2
        for x, y in ((got["rx"], got["ry"]), (got["lx"], got["ly"])):
            dx, dy = p2[0] - p1[0], p2[1] - p1[1]
            d = abs(dy * (x - p1[0]) - dx * (y - p1[1])) / math.hypot(dx, dy)
            assert abs(d - 3.0) < 1e-9
        # and on opposite sides
        dx, dy = p2[0] - p1[0], p2[1] - p1[1]
        sr = dy * (got["rx"] - p1[0]) - dx * (got["ry"] - p1[1])
        sl = dy * (got["lx"] - p1[0]) - dx * (got["ly"] - p1[1])
        assert sr * sl < 0


def test_intersection_params_brute_force():
    con = duckdb.connect()
    # ray from (0, 0) with direction (41, 17); unit box [10,20]x[2,8]
    q = ("SELECT " + t_expr("px", "py") + " AS t, "
         + u_expr("px", "py") + " AS u FROM (SELECT "
         "CAST(0 AS DOUBLE) AS px, CAST(0 AS DOUBLE) AS py, "
         "CAST(10 AS DOUBLE) AS ax, CAST(2 AS DOUBLE) AS ay, "
         "CAST(10 AS DOUBLE) AS bx, CAST(8 AS DOUBLE) AS by)")
    t, u = con.sql(q).fetchone()
    # crossing x=10 at t=10/41, y=170/41 ~ 4.146 -> u=(4.146-2)/6
    assert abs(t - 10 / 41) < 1e-12
    assert abs(u - (170 / 41 - 2) / 6) < 1e-12
    assert 0 <= t <= 1 and 0 <= u <= 1
