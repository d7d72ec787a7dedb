"""Ground-truth checks for the overlay set operations.

The DuckDB-parity gate proves Spark and DuckDB agree on the shared
formulas; these tests validate the formulas themselves against
point-membership ground truth (monte-carlo, away from boundaries):
every output part must cover exactly ``base \\ union(erase)`` with no
part-part overlap (a disjoint decomposition).
"""

import numpy as np
import pytest


def _mk_rect_rows(rng, n, span=30.0):
    rows = []
    for i in range(n):
        x0, y0 = (float(v) for v in rng.uniform(-50, 30, 2))
        w, h = (float(v) for v in rng.uniform(3, span, 2))
        rows.append((i, x0, x0 + w, y0, y0 + h))
    return rows


def test_rect_erase_disjoint_exact(spark):
    from rsgislib_spark.operators.overlay import rect_erase

    rng = np.random.RandomState(11)
    bases = _mk_rect_rows(rng, 10)
    erases = [(j, *r[1:]) for j, r in enumerate(_mk_rect_rows(rng, 14, 20.0))]
    b = spark.createDataFrame(
        bases, "base_id long, bxmin double, bxmax double, "
               "bymin double, bymax double")
    e = spark.createDataFrame(
        erases, "e_id long, exmin double, exmax double, "
                "eymin double, eymax double")
    parts = rect_erase(b, e).collect()
    by_base = {}
    for r in parts:
        assert r.rxmin < r.rxmax and r.rymin < r.rymax
        by_base.setdefault(r.base_id, []).append(
            (r.rxmin, r.rxmax, r.rymin, r.rymax))
    pts = rng.uniform(-60, 70, size=(60000, 2))
    in_er = np.zeros(len(pts), bool)
    for (_, x0, x1, y0, y1) in erases:
        in_er |= ((pts[:, 0] > x0) & (pts[:, 0] < x1)
                  & (pts[:, 1] > y0) & (pts[:, 1] < y1))
    for (bid, x0, x1, y0, y1) in bases:
        want = ((pts[:, 0] > x0) & (pts[:, 0] < x1)
                & (pts[:, 1] > y0) & (pts[:, 1] < y1)) & ~in_er
        cover = np.zeros(len(pts), int)
        for (px0, px1, py0, py1) in by_base.get(bid, []):
            cover += ((pts[:, 0] > px0) & (pts[:, 0] < px1)
                      & (pts[:, 1] > py0) & (pts[:, 1] < py1))
        assert (cover <= 1).all(), f"overlapping parts for base {bid}"
        assert ((cover == 1) == want).all(), f"wrong region for base {bid}"


def test_overlay_difference_rect_regions(spark):
    from rsgislib_spark.geo.geometry import points_in_polygon
    from rsgislib_spark.operators.overlay import overlay_difference_rect

    rng = np.random.RandomState(5)
    tris = []
    for i in range(8):
        x0, y0 = (float(v) for v in rng.uniform(-60, 20, 2))
        w, h = (float(v) for v in rng.uniform(10, 40, 2))
        tris.append((i, [[x0, y0], [x0 + w, y0], [x0, y0 + h]],
                     x0, x0 + w, y0, y0 + h))
    polys = spark.createDataFrame(
        tris, "poly_id long, verts array<array<double>>, pxmin double, "
              "pxmax double, pymin double, pymax double")
    rects = spark.createDataFrame(
        [(1, -40.0, 40.0, -15.0, 15.0)],
        "rect_id long, rxmin double, rxmax double, rymin double, rymax double")
    rows = overlay_difference_rect(polys, rects).collect()
    parts = {}
    for r in rows:
        parts.setdefault((r.poly_id, r.part_idx), []).append(
            (r.v_idx, r.vx, r.vy))
    pts = rng.uniform(-70, 70, size=(60000, 2))
    band = ((pts[:, 0] > -40) & (pts[:, 0] < 40)
            & (pts[:, 1] > -15) & (pts[:, 1] < 15))
    for (i, verts, *_) in tris:
        tri = np.array(verts)
        want = points_in_polygon(pts[:, 0], pts[:, 1], tri) & ~band
        cover = np.zeros(len(pts), int)
        for (pid, _pidx), vl in parts.items():
            if pid != i:
                continue
            vl.sort()
            ring = np.array([[x, y] for _, x, y in vl])
            cover += points_in_polygon(pts[:, 0], pts[:, 1], ring)
        # monte-carlo points can graze the shared cut lines; allow a
        # handful of boundary-ambiguous samples
        assert int((cover > 1).sum()) <= 5, f"overlap for poly {i}"
        assert int(((cover >= 1) != want).sum()) <= 20, f"region for poly {i}"
