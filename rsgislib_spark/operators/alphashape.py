"""Alpha-shape (concave hull) extraction per feature group.

Re-expresses ``create_alpha_shape`` (reference: python/rsgislib/
vectorgeoms/__init__.py:1432 — alphashape package over an OGR point
layer, with an optional alpha search).  Spark-first shape: one group =
one geometry, built inside ``applyInPandas`` from the classic
Delaunay-filter formulation (Edelsbrunner 1983):

* Delaunay-triangulate the group's points (scipy.spatial, qhull —
  deterministic for a fixed input order, which the kernel enforces by
  sorting points first);
* keep triangles whose circumradius < 1/alpha;
* the alpha-shape boundary is every edge used by exactly ONE kept
  triangle.

The heavy geometry runs per group (groups are independent — the
groupBy is the only shuffle), so a layer with millions of small
point-clusters parallelizes naturally; a single giant group is the
same single-geometry computation the reference runs.

Triangulation backend: scipy.spatial (qhull) when available, else the
built-in Bowyer–Watson incremental triangulator (pure numpy, O(n^2)
per group — fine for the cluster-sized groups this operator targets;
the points are lex-sorted first so insertion order, and therefore the
triangulation of degenerate co-circular cases, is deterministic).
No DuckDB oracle exists for this operator (Delaunay is not SQL-
expressible) — correctness is covered by geometric pytest invariants
(tests/test_alphashape.py) and the driver's rows-only check.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (DoubleType, LongType, StructField,
                               StructType)

__all__ = ["alpha_shape_edges_pdf", "alpha_shape_edges", "delaunay"]


def _incircle(ax, ay, bx, by, cx, cy, px, py) -> bool:
    """p strictly inside the circumcircle of ccw triangle (a, b, c)."""
    adx, ady = ax - px, ay - py
    bdx, bdy = bx - px, by - py
    cdx, cdy = cx - px, cy - py
    det = ((adx * adx + ady * ady) * (bdx * cdy - cdx * bdy)
           - (bdx * bdx + bdy * bdy) * (adx * cdy - cdx * ady)
           + (cdx * cdx + cdy * cdy) * (adx * bdy - bdx * ady))
    return det > 0.0


def delaunay(pts: np.ndarray) -> list:
    """Bowyer–Watson Delaunay triangulation; list of index triples.

    Triangles are normalized counter-clockwise.  Input points must be
    unique; callers pre-sort for determinism.
    """
    pts = np.asarray(pts, np.float64)
    n = len(pts)
    if n < 3:
        return []
    m = pts.mean(axis=0)
    span = float(np.ptp(pts, axis=0).max()) * 16.0 + 1.0
    sup = np.array([[m[0] - 2 * span, m[1] - span],
                    [m[0] + 2 * span, m[1] - span],
                    [m[0], m[1] + 2 * span]])
    p = np.vstack([pts, sup])

    def ccw(t):
        a, b, c = p[t[0]], p[t[1]], p[t[2]]
        if (b[0] - a[0]) * (c[1] - a[1]) - (b[1] - a[1]) * (c[0] - a[0]) < 0:
            return (t[0], t[2], t[1])
        return t

    tris = [ccw((n, n + 1, n + 2))]
    for i in range(n):
        px, py = p[i]
        bad, keep = [], []
        for t in tris:
            a, b, c = p[t[0]], p[t[1]], p[t[2]]
            if _incircle(a[0], a[1], b[0], b[1], c[0], c[1], px, py):
                bad.append(t)
            else:
                keep.append(t)
        edge_count: dict = {}
        for t in bad:
            for e in ((t[0], t[1]), (t[1], t[2]), (t[2], t[0])):
                key = (min(e), max(e))
                edge_count[key] = edge_count.get(key, 0) + 1
        for (u, v), cnt in edge_count.items():
            if cnt == 1:
                keep.append(ccw((u, v, i)))
        tris = keep
    return [t for t in tris if t[0] < n and t[1] < n and t[2] < n]


def alpha_shape_edges_pdf(pts: np.ndarray, alpha: float) -> list:
    """Boundary edges [(x1,y1,x2,y2), ...] of one group's alpha shape.

    ``alpha`` is the reference's convention: triangles with
    circumradius < 1/alpha survive (alpha -> 0 degenerates to the
    convex hull).  Points are lex-sorted then DEDUPLICATED first
    (ADVICE r3: duplicate points break the Bowyer–Watson fallback and
    perturb scipy's triangulation) so either backend sees the same
    clean deterministic order.  Determinism scope: output is
    bit-stable per backend; scipy-Delaunay and the built-in fallback
    may triangulate CO-CIRCULAR quads differently (both
    triangulations are valid; the alpha-boundary differs only when the
    shared circumcircle sits exactly at the 1/alpha threshold) — pin
    one backend for strict cross-environment determinism.
    """
    pts = np.asarray(pts, np.float64)
    pts = pts[np.lexsort((pts[:, 1], pts[:, 0]))]
    if len(pts):
        keep = np.ones(len(pts), bool)
        keep[1:] = (pts[1:] != pts[:-1]).any(axis=1)
        pts = pts[keep]
    if len(pts) < 3:
        return []
    try:
        from scipy.spatial import Delaunay
        simplices = Delaunay(pts).simplices
    except ImportError:
        simplices = delaunay(pts)
    edges: dict = {}
    r_max = np.inf if alpha <= 0 else 1.0 / alpha
    for simplex in simplices:
        simplex = np.asarray(simplex)
        a, b, c = pts[simplex]
        # circumradius = abc / (4 * area)
        la = np.hypot(*(b - c))
        lb = np.hypot(*(a - c))
        lc = np.hypot(*(a - b))
        area2 = abs((b[0] - a[0]) * (c[1] - a[1])
                    - (b[1] - a[1]) * (c[0] - a[0]))
        if area2 <= 0.0:
            continue
        if (la * lb * lc) / (2.0 * area2) >= r_max:
            continue
        for i, j in ((0, 1), (1, 2), (0, 2)):
            key = tuple(sorted((int(simplex[i]), int(simplex[j]))))
            edges[key] = edges.get(key, 0) + 1
    out = []
    for (i, j), n in edges.items():
        if n == 1:
            x1, y1 = pts[i]
            x2, y2 = pts[j]
            if (x1, y1) > (x2, y2):
                x1, y1, x2, y2 = x2, y2, x1, y1
            out.append((float(x1), float(y1), float(x2), float(y2)))
    out.sort()
    return out


def alpha_shape_edges(
    points: DataFrame,
    *,
    alpha: float,
    group_col: str = "grp",
    lon: str = "lon",
    lat: str = "lat",
) -> DataFrame:
    """Per-group alpha-shape boundary edges, one row per edge.

    Output: (group, edge_idx, x1, y1, x2, y2) with a deterministic
    canonical edge order (sorted endpoints, lex-sorted edges).
    """
    schema = StructType([
        StructField("grp", points.schema[group_col].dataType),
        StructField("edge_idx", LongType()),
        StructField("x1", DoubleType()),
        StructField("y1", DoubleType()),
        StructField("x2", DoubleType()),
        StructField("y2", DoubleType()),
    ])

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        g = pdf[group_col].iloc[0]
        edges = alpha_shape_edges_pdf(
            np.column_stack([pdf[lon].to_numpy(np.float64),
                             pdf[lat].to_numpy(np.float64)]), alpha)
        if not edges:
            return pd.DataFrame({c.name: [] for c in schema.fields})
        arr = np.asarray(edges, np.float64)
        return pd.DataFrame({
            "grp": [g] * len(edges),
            "edge_idx": np.arange(1, len(edges) + 1, dtype=np.int64),
            "x1": arr[:, 0], "y1": arr[:, 1],
            "x2": arr[:, 2], "y2": arr[:, 3],
        })

    return points.select(group_col, lon, lat) \
        .groupBy(group_col).applyInPandas(fn, schema)
