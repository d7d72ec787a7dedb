"""Image footprint LUT: the spatial catalog that prunes scans.

Reference: ``create_img_extent_lut`` builds a vector layer of (filename,
bbox) footprints (python/rsgislib/imageutils/imagelut.py:51-151);
``query_img_lut`` / ``get_all_lut_imgs`` look up images by bbox before any
pixel is touched (:152-190,234) — the reference's only partition-pruning
mechanism.

Spark shape: the LUT is a DataFrame ``(image_id, xmin, xmax, ymin, ymax,
cell)`` with one row per covering grid cell.  A bbox query becomes a cell
IN-list semi-join (partition pruning when ``cell`` is the table's
partition/sort column — Iceberg metadata filtering makes it scan-level)
followed by the exact bbox refine.  At 10^12 rows this is the difference
between a full scan and touching only the queried cells' files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..geo.cellindex import DEFAULT_RES, polyfill_bbox
from ..operators.spatial_join import with_bbox_cells

__all__ = ["build_img_lut", "query_img_lut"]


def build_img_lut(images: DataFrame, res: int = DEFAULT_RES) -> DataFrame:
    """Footprint catalog: one row per (image, covering cell)."""
    return with_bbox_cells(
        images.select("image_id", "xmin", "xmax", "ymin", "ymax"),
        "xmin", "xmax", "ymin", "ymax", res=res,
    )


def query_img_lut(lut: DataFrame, xmin: float, xmax: float,
                  ymin: float, ymax: float,
                  res: int = DEFAULT_RES) -> DataFrame:
    """bbox -> matching image rows (cell prune, then exact bbox refine).

    The cell IN-list is computed driver-side from the query bbox (tiny)
    and pushed into the scan as an equi-filter; the strict-inequality
    refine replicates ``do_bboxes_intersect`` (tools/geometrytools.py:
    82-102).  Result: distinct image ids + footprints.
    """
    cells = [int(c) for c in polyfill_bbox(xmin, xmax, ymin, ymax, res)]
    return (
        lut.where(F.col("cell").isin(cells))
        .where((F.col("xmax") > F.lit(xmin)) & (F.lit(xmax) > F.col("xmin"))
               & (F.col("ymax") > F.lit(ymin)) & (F.lit(ymax) > F.col("ymin")))
        .select("image_id", "xmin", "xmax", "ymin", "ymax")
        .dropDuplicates(["image_id"])
    )
