"""World <-> pixel coordinate arithmetic, replicating rsgislib's rules.

The reference represents raster geometry as a 6-element GDAL geotransform
``(tlX, pxResX, 0, tlY, 0, -pxResY)`` (reference:
src/cmds/RSGISCmdImageUtils.cpp:293-302).  The load-bearing idiosyncrasies
replicated here:

* zonal-stats bbox -> pixel window uses truncation with a -1/+1 envelope
  expansion, an ``== 0.0`` edge-snap special case, and clamp-into-image;
  the y offsets are divided by the *signed* (negative) gt[5]
  (reference: python/rsgislib/zonalstats/__init__.py:259,344-396);
* point -> pixel extraction uses the same trunc-minus-1 / ``== 0.0`` rule and
  declares the point out-of-image if the resulting pixel is outside
  (reference: python/rsgislib/zonalstats/__init__.py:1462,1537-1555);
* pixel -> world is plain ``tl + idx * res``
  (reference: src/cmds/RSGISCmdImageUtils.cpp:357-361).

All functions are numpy-vectorized so they can run over Arrow batches.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "make_geotransform",
    "pixel_to_world",
    "world_bbox_to_pixel_window",
    "point_to_pixel",
]


def make_geotransform(tlx: float, tly: float, res_x: float, res_y: float):
    """6-tuple GDAL-style geotransform with north-up orientation."""
    return (float(tlx), float(res_x), 0.0, float(tly), 0.0, -float(res_y))


def pixel_to_world(gt, col, row):
    """Top-left corner world coordinate of pixel (col, row).

    Reference: src/cmds/RSGISCmdImageUtils.cpp:357-361 (``tlX + col*res``).
    """
    col = np.asarray(col, dtype=np.float64)
    row = np.asarray(row, dtype=np.float64)
    return gt[0] + col * gt[1], gt[3] + row * gt[5]


def _snap_trunc(off, res, expand):
    """``off == 0.0`` -> 0, else C-trunc(off / res) + expand (vectorized).

    Reference: python/rsgislib/zonalstats/__init__.py:349-367.
    """
    off = np.asarray(off, dtype=np.float64)
    idx = np.trunc(off / res).astype(np.int64) + int(expand)
    return np.where(off == 0.0, np.int64(0), idx)


def world_bbox_to_pixel_window(gt, size_x, size_y, xmin, xmax, ymin, ymax):
    """Feature bbox -> clamped pixel window ``(x1, y1, xsize, ysize)``.

    Replicates python/rsgislib/zonalstats/__init__.py:344-396 exactly:
    offsets measured from the image top-left (x against gt[0] / gt[1], y
    against gt[3] / signed gt[5]), trunc -1 for the window-min edge, trunc +1
    for the window-max edge, ``==0.0`` snap, each index clamped into
    ``[0, size-1]``.  A zero xsize or ysize means "no pixels" (the reference
    skips the feature, :391-395).  Note y1 derives from the bbox *ymax*
    (north edge) because row index grows southward.

    Returns int64 arrays (x1, y1, xsize, ysize); bbox inputs may be arrays.
    """
    pixel_width = gt[1]
    pixel_height = gt[5]  # negative for north-up, used signed as in reference

    x1 = _snap_trunc(np.asarray(xmin, np.float64) - gt[0], pixel_width, -1)
    x2 = _snap_trunc(np.asarray(xmax, np.float64) - gt[0], pixel_width, +1)
    y1 = _snap_trunc(np.asarray(ymax, np.float64) - gt[3], pixel_height, -1)
    y2 = _snap_trunc(np.asarray(ymin, np.float64) - gt[3], pixel_height, +1)

    x1 = np.clip(x1, 0, size_x - 1)
    x2 = np.clip(x2, 0, size_x - 1)
    y1 = np.clip(y1, 0, size_y - 1)
    y2 = np.clip(y2, 0, size_y - 1)

    return x1, y1, x2 - x1, y2 - y1


def point_to_pixel(gt, size_x, size_y, x_pt, y_pt):
    """Point -> (x_pxl, y_pxl, in_img) per ``ext_point_band_values``.

    Reference: python/rsgislib/zonalstats/__init__.py:1537-1555 — offset from
    top-left, ``==0.0`` -> 0 else trunc(off/res) - 1 (y against signed
    gt[5]); out-of-range indices mark the point as outside the image (caller
    substitutes out_no_data_val).
    """
    x_pxl = _snap_trunc(np.asarray(x_pt, np.float64) - gt[0], gt[1], -1)
    y_pxl = _snap_trunc(np.asarray(y_pt, np.float64) - gt[3], gt[5], -1)

    in_img = (x_pxl >= 0) & (x_pxl < size_x) & (y_pxl >= 0) & (y_pxl < size_y)
    return x_pxl, y_pxl, in_img
