"""Vectorized computational geometry used for exact join refinement.

shapely/GEOS is not available in this environment, so the engine carries its
own numpy kernels for the predicates the reference relies on
(``geopandas.sjoin`` op in {intersects, within, contains} — reference:
python/rsgislib/vectorutils/__init__.py:2217; pixel-in-poly modes —
src/img/RSGISPixelInPoly.cpp:47-118):

* ``points_in_polygon`` — even-odd ray casting, boundary-inclusive on the
  edges crossed by the half-open rule (standard crossing-number PIP);
* ``points_in_polygons`` — many points x many polygons (used per Arrow
  batch after the cell-key candidate join has already cut candidates to a
  small set, so the inner loop is over *polygons*, vectorized over points);
* ``segments_intersect`` / ``polys_intersect`` — O(n*m) edge tests +
  containment fallbacks, adequate for the small polygon layers the
  reference handles (its own layers are <= hundreds of features).

Polygons are numpy (k,2) float arrays of exterior-ring vertices, closed or
open (the kernels treat them as implicitly closed).  Holes are out of MVP
scope, as in the reference's fast paths.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "poly_bbox",
    "points_in_polygon",
    "points_in_polygons",
    "segments_intersect_any",
    "polys_intersect",
    "poly_within_poly",
    "polygon_area",
]


def poly_bbox(poly):
    """(xmin, xmax, ymin, ymax) of a (k,2) vertex array."""
    p = np.asarray(poly, np.float64)
    return p[:, 0].min(), p[:, 0].max(), p[:, 1].min(), p[:, 1].max()


def polygon_area(poly) -> float:
    """Shoelace area (positive regardless of winding)."""
    p = np.asarray(poly, np.float64)
    x, y = p[:, 0], p[:, 1]
    return 0.5 * abs(np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1)))


def points_in_polygon(px, py, poly):
    """Crossing-number point-in-polygon, vectorized over points.

    Returns a boolean array; points exactly on a vertex/edge follow the
    half-open crossing rule (consistent, but callers that need GEOS-exact
    boundary semantics should avoid degenerate on-edge inputs — the synth
    data generator guarantees points are off polygon boundaries).
    """
    px = np.asarray(px, np.float64)
    py = np.asarray(py, np.float64)
    p = np.asarray(poly, np.float64)
    if np.array_equal(p[0], p[-1]):
        p = p[:-1]
    inside = np.zeros(px.shape, dtype=bool)
    x1, y1 = p[-1]
    for x2, y2 in p:
        crosses = ((y1 > py) != (y2 > py))
        with np.errstate(divide="ignore", invalid="ignore"):
            xint = x1 + (py - y1) * (x2 - x1) / (y2 - y1)
        inside ^= crosses & (px < xint)
        x1, y1 = x2, y2
    return inside


def points_in_polygons(px, py, polys):
    """For each point, the indices boolean matrix (n_points, n_polys)."""
    px = np.asarray(px, np.float64)
    py = np.asarray(py, np.float64)
    out = np.zeros((px.shape[0], len(polys)), dtype=bool)
    for j, poly in enumerate(polys):
        out[:, j] = points_in_polygon(px, py, poly)
    return out


def _orient(ax, ay, bx, by, cx, cy):
    return (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)


def segments_intersect_any(a, b) -> bool:
    """True if any edge of ring ``a`` properly intersects any edge of ``b``."""
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    a2 = np.roll(a, -1, axis=0)
    b2 = np.roll(b, -1, axis=0)
    for (p1, p2) in zip(a, a2):
        d1 = _orient(p1[0], p1[1], p2[0], p2[1], b[:, 0], b[:, 1])
        d2 = _orient(p1[0], p1[1], p2[0], p2[1], b2[:, 0], b2[:, 1])
        d3 = _orient(b[:, 0], b[:, 1], b2[:, 0], b2[:, 1], p1[0], p1[1])
        d4 = _orient(b[:, 0], b[:, 1], b2[:, 0], b2[:, 1], p2[0], p2[1])
        hit = ((d1 > 0) != (d2 > 0)) & ((d3 > 0) != (d4 > 0))
        if bool(hit.any()):
            return True
    return False


def polys_intersect(a, b) -> bool:
    """GEOS-style ``intersects`` for two simple polygons."""
    axmin, axmax, aymin, aymax = poly_bbox(a)
    bxmin, bxmax, bymin, bymax = poly_bbox(b)
    if axmax < bxmin or bxmax < axmin or aymax < bymin or bymax < aymin:
        return False
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    if points_in_polygon(a[:1, 0], a[:1, 1], b)[0]:
        return True
    if points_in_polygon(b[:1, 0], b[:1, 1], a)[0]:
        return True
    return segments_intersect_any(a, b)


def poly_within_poly(a, b) -> bool:
    """GEOS-style ``within``: every vertex of a inside b, no edge crossing."""
    a = np.asarray(a, np.float64)
    if not points_in_polygon(a[:, 0], a[:, 1], b).all():
        return False
    return not segments_intersect_any(a, b)
