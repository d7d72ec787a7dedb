"""Integer spatial cell index (the engine's H3-role discrete grid).

The reference anchors hex-grid indexing as a native concept via
``create_hex_grid_bbox`` / ``h3.polyfill``
(reference: python/rsgislib/vectorutils/createvectors.py:1235-1397).  The
``h3`` package is not available in this environment, so the engine ships its
own deterministic hierarchical lon/lat grid index with the same *role* in
query plans: a 64-bit cell id used as an equi-join key (spatial "pushdown"),
with ``k_ring`` neighbourhood expansion for kNN and ``polyfill`` for
polygon covering.

Cell id layout (64-bit signed, always positive):

    cell = res * 2^58 + nx * 2^29 + ny

where at resolution ``res`` (0..28) the world ``lon in [-180,180] x
lat in [-90,90]`` is split into ``2^res x 2^res`` cells:

    nx = clamp(floor((lon + 180) / 360 * 2^res), 0, 2^res - 1)
    ny = clamp(floor((lat + 90) / 180 * 2^res), 0, 2^res - 1)

The formula is deliberately expressible in ANSI SQL (``cell_sql_expr``)
with bit-identical float behaviour, so the DuckDB correctness oracle can
recompute cell assignment independently of the numpy implementation.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "cell_of_point",
    "cell_decode",
    "cell_bounds",
    "cell_center",
    "k_ring",
    "k_ring_lists",
    "polyfill_bbox",
    "parent",
    "cell_sql_expr",
    "DEFAULT_RES",
]

_RES_SHIFT = 2 ** 58
_X_SHIFT = 2 ** 29

#: default resolution: 4096 x 4096 global grid, ~0.088 deg (~10 km) cells.
DEFAULT_RES = 12


def _n(res: int) -> int:
    return 1 << res


def cell_of_point(lon, lat, res: int = DEFAULT_RES):
    """Vectorized point -> cell id (int64)."""
    n = float(_n(res))
    nx = np.floor((np.asarray(lon, np.float64) + 180.0) / 360.0 * n)
    ny = np.floor((np.asarray(lat, np.float64) + 90.0) / 180.0 * n)
    nx = np.clip(nx, 0.0, n - 1.0).astype(np.int64)
    ny = np.clip(ny, 0.0, n - 1.0).astype(np.int64)
    return np.int64(res) * _RES_SHIFT + nx * _X_SHIFT + ny


def cell_sql_expr(lon_expr: str, lat_expr: str, res: int = DEFAULT_RES) -> str:
    """The same assignment as ``cell_of_point`` as portable SQL text.

    Works identically in Spark SQL and DuckDB (floor/least/greatest over
    doubles, then bigint arithmetic), enabling independent oracle checks.
    """
    n = _n(res)
    nx = (
        f"CAST(least(greatest(floor((({lon_expr}) + 180.0) / 360.0 * {n}.0),"
        f" 0.0), {n - 1}.0) AS BIGINT)"
    )
    ny = (
        f"CAST(least(greatest(floor((({lat_expr}) + 90.0) / 180.0 * {n}.0),"
        f" 0.0), {n - 1}.0) AS BIGINT)"
    )
    return f"(CAST({res} AS BIGINT) * {_RES_SHIFT} + {nx} * {_X_SHIFT} + {ny})"


def cell_decode(cell):
    """cell id -> (res, nx, ny) arrays."""
    cell = np.asarray(cell, np.int64)
    res = cell // _RES_SHIFT
    rem = cell - res * _RES_SHIFT
    nx = rem // _X_SHIFT
    ny = rem - nx * _X_SHIFT
    return res.astype(np.int64), nx.astype(np.int64), ny.astype(np.int64)


def cell_bounds(cell):
    """cell id -> (lonmin, lonmax, latmin, latmax) arrays."""
    res, nx, ny = cell_decode(cell)
    n = (1 << res.astype(np.int64)).astype(np.float64)
    w = 360.0 / n
    h = 180.0 / n
    lonmin = -180.0 + nx * w
    latmin = -90.0 + ny * h
    return lonmin, lonmin + w, latmin, latmin + h


def cell_center(cell):
    """cell id -> (lon, lat) center arrays."""
    lonmin, lonmax, latmin, latmax = cell_bounds(cell)
    return (lonmin + lonmax) / 2.0, (latmin + latmax) / 2.0


def parent(cell, parent_res: int):
    """Coarser-resolution ancestor cell id."""
    res, nx, ny = cell_decode(cell)
    shift = (res - parent_res).astype(np.int64)
    if np.any(shift < 0):
        raise ValueError("parent_res must be <= cell resolution")
    return (
        np.int64(parent_res) * _RES_SHIFT
        + (nx >> shift) * _X_SHIFT
        + (ny >> shift)
    )


def k_ring(cell: int, k: int = 1):
    """All cells within Chebyshev distance k of ``cell`` (scalar -> array).

    Longitude wraps at the antimeridian; latitude rows are clamped (no
    pole wrap).  Result is sorted ascending and includes ``cell`` itself,
    deduplicated (relevant at very coarse resolutions where the ring wraps
    onto itself).
    """
    res, nx, ny = cell_decode(np.int64(cell))
    res, nx, ny = int(res), int(nx), int(ny)
    n = _n(res)
    dx, dy = np.meshgrid(np.arange(-k, k + 1), np.arange(-k, k + 1))
    xs = (nx + dx.ravel()) % n
    ys = ny + dy.ravel()
    keep = (ys >= 0) & (ys < n)
    cells = np.int64(res) * _RES_SHIFT + xs[keep].astype(np.int64) * _X_SHIFT + ys[keep].astype(np.int64)
    return np.unique(cells)


def k_ring_lists(cells, k: int = 1):
    """Vectorized k_ring for an int64 array -> list of int64 arrays.

    Used to build explode()-ready neighbour lists inside pandas UDFs for
    the kNN ring-expansion join (SURVEY.md §2.3 match_closest_vec_pts).
    """
    cells = np.asarray(cells, np.int64)
    res, nx, ny = cell_decode(cells)
    out = []
    side = 2 * k + 1
    dx, dy = np.meshgrid(np.arange(-k, k + 1), np.arange(-k, k + 1))
    dx = dx.ravel()
    dy = dy.ravel()
    for i in range(cells.shape[0]):
        n = _n(int(res[i]))
        xs = (int(nx[i]) + dx) % n
        ys = int(ny[i]) + dy
        keep = (ys >= 0) & (ys < n)
        cc = np.int64(res[i]) * _RES_SHIFT + xs[keep].astype(np.int64) * _X_SHIFT + ys[keep].astype(np.int64)
        out.append(np.unique(cc))
    return out


def polyfill_bbox(xmin: float, xmax: float, ymin: float, ymax: float,
                  res: int = DEFAULT_RES):
    """All cells whose box intersects the (closed) lon/lat bbox.

    The covering analog of ``h3.polyfill`` for a bbox (reference precedent:
    createvectors.py:1256-1272).  Clamps to world bounds; does not split
    antimeridian-crossing boxes (callers use ``bbox.unwrap`` semantics
    upstream if needed).
    """
    n = _n(res)
    fx = lambda lon: int(np.clip(np.floor((lon + 180.0) / 360.0 * n), 0, n - 1))
    fy = lambda lat: int(np.clip(np.floor((lat + 90.0) / 180.0 * n), 0, n - 1))
    x0, x1 = fx(xmin), fx(xmax)
    y0, y1 = fy(ymin), fy(ymax)
    xs = np.arange(x0, x1 + 1, dtype=np.int64)
    ys = np.arange(y0, y1 + 1, dtype=np.int64)
    gx, gy = np.meshgrid(xs, ys)
    return (np.int64(res) * _RES_SHIFT + gx.ravel() * _X_SHIFT + gy.ravel())
