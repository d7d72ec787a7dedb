"""Geometric invariants for the alpha-shape operator (no SQL oracle —
Delaunay is not SQL-expressible; these tests are its correctness gate).
"""

import numpy as np


def _grid_points(n=8, step=1.0):
    xs, ys = np.meshgrid(np.arange(n) * step, np.arange(n) * step)
    return np.column_stack([xs.ravel(), ys.ravel()])


def test_alpha_zero_is_convex_hull_boundary():
    """alpha -> 0 keeps every triangle: boundary == convex hull edges.
    For a square grid that is the 4*(n-1) unit perimeter edges."""
    from rsgislib_spark.operators.alphashape import alpha_shape_edges_pdf

    n = 8
    edges = alpha_shape_edges_pdf(_grid_points(n), alpha=0.0)
    assert len(edges) == 4 * (n - 1)
    for (x1, y1, x2, y2) in edges:
        on_border = (x1 in (0.0, n - 1.0) and x1 == x2) or \
                    (y1 in (0.0, n - 1.0) and y1 == y2)
        assert on_border, (x1, y1, x2, y2)


def test_alpha_separates_two_clusters():
    """With alpha tight enough, two distant dense clusters produce two
    separate boundaries (no bridging edges across the gap)."""
    from rsgislib_spark.operators.alphashape import alpha_shape_edges_pdf

    a = _grid_points(5)
    b = _grid_points(5) + np.array([100.0, 0.0])
    pts = np.vstack([a, b])
    # circumradius threshold 1/alpha = 2 -> unit triangles survive,
    # bridge triangles (circumradius ~ 50) do not
    edges = alpha_shape_edges_pdf(pts, alpha=0.5)
    assert edges
    for (x1, y1, x2, y2) in edges:
        assert not (x1 < 50 < x2), "edge bridges the cluster gap"
    # both clusters contribute boundary edges
    assert any(x2 <= 4 for (_x1, _y1, x2, _y2) in edges)
    assert any(x1 >= 100 for (x1, _y1, _x2, _y2) in edges)


def test_alpha_shape_spark_groups(spark):
    """The distributed operator returns each group's edges with the
    deterministic canonical ordering of the local kernel."""
    from rsgislib_spark.operators.alphashape import (alpha_shape_edges,
                                                     alpha_shape_edges_pdf)

    rng = np.random.RandomState(9)
    rows = []
    for g in range(3):
        pts = rng.uniform(0, 10, size=(40, 2)) + g * 50
        rows += [(g, float(x), float(y)) for x, y in pts]
    df = spark.createDataFrame(rows, "grp long, lon double, lat double")
    got = {}
    for r in alpha_shape_edges(df, alpha=0.2).collect():
        got.setdefault(r.grp, []).append((r.edge_idx, r.x1, r.y1, r.x2, r.y2))
    assert set(got) == {0, 1, 2}
    for g in range(3):
        pts = np.array([(x, y) for (gg, x, y) in rows if gg == g])
        want = alpha_shape_edges_pdf(pts, 0.2)
        have = [e[1:] for e in sorted(got[g])]
        assert [tuple(np.round(e, 9)) for e in have] == \
               [tuple(np.round(e, 9)) for e in want]
