"""Whole-image pixel statistics (``pop_img_stats`` family).

Reference: ``pop_img_stats`` / ``RSGISPopWithStats`` computes per-band
min/max/mean/stddev honouring nodata (src/cmds/RSGISCmdImageUtils.cpp:
838-864); ``get_img_band_stats`` wraps GDAL ComputeStatistics
(imageutils/__init__.py:973); ``count_pxls_of_val`` / ``get_unique_values``
(imagecalc/__init__.py:517,568) and ``histogram`` (python/src/imagecalc.cpp:
2056) are per-value aggregations.

Spark shape: one Arrow pass decodes each image and emits scalar partials —
integer-exact count/sum/sumsq/min/max (plus an optional bounded histogram).
Nothing per-pixel ever becomes a row; downstream aggregation (global stats,
per-format stats, histograms) is ordinary Catalyst over one row per image.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (ArrayType, LongType, StringType, StructField,
                               StructType)

from ..functions import codec

__all__ = ["pixel_stats", "pixel_histogram", "imgs_equal_stats"]

_STATS_SCHEMA = StructType([
    StructField("image_id", StringType()),
    StructField("n_pix", LongType()),
    StructField("sum_pix", LongType()),
    StructField("sumsq_pix", LongType()),
    StructField("min_pix", LongType()),
    StructField("max_pix", LongType()),
])


def pixel_stats(images: DataFrame, nodata=None) -> DataFrame:
    """Per-image integer-exact pixel stats + derived mean (double).

    ``images`` needs (image_id, bytes, w, h, fmt).  The mean divides two
    exact integers, so results are deterministic regardless of partition
    order (no float accumulation).
    """

    def gen(it):
        for pdf in it:
            out = {k: [] for k in ("image_id", "n_pix", "sum_pix",
                                   "sumsq_pix", "min_pix", "max_pix")}
            for image_id, buf, w, h, fmt in zip(pdf["image_id"], pdf["bytes"],
                                                pdf["w"], pdf["h"], pdf["fmt"]):
                arr = codec.decode_image(bytes(buf), int(w), int(h),
                                         str(fmt)).astype(np.int64).ravel()
                if nodata is not None:
                    arr = arr[arr != nodata]
                out["image_id"].append(image_id)
                out["n_pix"].append(int(arr.size))
                out["sum_pix"].append(int(arr.sum()))
                out["sumsq_pix"].append(int((arr * arr).sum()))
                out["min_pix"].append(int(arr.min()) if arr.size else 0)
                out["max_pix"].append(int(arr.max()) if arr.size else 0)
            yield pd.DataFrame(out)

    stats = images.select("image_id", "bytes", "w", "h", "fmt") \
        .mapInPandas(gen, schema=_STATS_SCHEMA)
    return stats.withColumn(
        "mean_pix",
        F.col("sum_pix").cast("double") / F.col("n_pix").cast("double"),
    )


_HIST_SCHEMA = StructType([
    StructField("image_id", StringType()),
    StructField("hist", ArrayType(LongType())),
])


def pixel_histogram(images: DataFrame, bins: int = 1024,
                    bin_width: int = 1) -> DataFrame:
    """Exploded (bin, count) histogram over all images (exact, bounded).

    Per-image bincount partials in Arrow, merged by a Catalyst groupBy —
    the classic partial+final design (``histogram``, imagecalc.cpp:2056).
    """

    def gen(it):
        for pdf in it:
            ids, hists = [], []
            for image_id, buf, w, h, fmt in zip(pdf["image_id"], pdf["bytes"],
                                                pdf["w"], pdf["h"], pdf["fmt"]):
                arr = codec.decode_image(bytes(buf), int(w), int(h), str(fmt))
                v = (arr.astype(np.int64).ravel() // bin_width).clip(0, bins - 1)
                ids.append(image_id)
                hists.append(np.bincount(v, minlength=bins).astype(np.int64))
            if ids:  # empty batch: Arrow can't cast empty float64->list
                yield pd.DataFrame({"image_id": ids, "hist": hists})

    partials = images.select("image_id", "bytes", "w", "h", "fmt") \
        .mapInPandas(gen, schema=_HIST_SCHEMA)
    return (
        partials.select(F.posexplode("hist").alias("bin", "cnt"))
        .where(F.col("cnt") > 0)
        .groupBy("bin").agg(F.sum("cnt").alias("n"))
    )


_EQ_SCHEMA = StructType([
    StructField("image_id", StringType()),
    StructField("cmp_image_id", StringType()),
    StructField("n_px", LongType()),
    StructField("n_eq", LongType()),
])


def imgs_equal_stats(pairs: DataFrame, flt_dif: float = 0.0001) -> DataFrame:
    """are_imgs_equal (imagecalc/__init__.py:1408): proportion of pixels
    of two same-grid images whose absolute difference is < ``flt_dif``.

    ``pairs`` needs (image_id, bytes, fmt, cmp_image_id, cmp_bytes,
    cmp_fmt, w, h) — one row per image pair, both payloads already
    joined (the metadata equi-join happens BEFORE payload
    materialization; the only shuffle carries ids, exactly like the
    reference reading two files side by side).  Output keeps the exact
    integer counts; ``prop`` (one IEEE division, correctly rounded in
    every engine) and the ``prop >= prop_eql`` verdict derive in
    Catalyst.
    """

    def gen(it):
        for pdf in it:
            out = {k: [] for k in ("image_id", "cmp_image_id", "n_px",
                                   "n_eq")}
            for (image_id, buf, fmt, cid, cbuf, cfmt, w, h) in zip(
                    pdf["image_id"], pdf["bytes"], pdf["fmt"],
                    pdf["cmp_image_id"], pdf["cmp_bytes"], pdf["cmp_fmt"],
                    pdf["w"], pdf["h"]):
                a = codec.decode_image(bytes(buf), int(w), int(h),
                                       str(fmt)).astype(np.int64)
                b = codec.decode_image(bytes(cbuf), int(w), int(h),
                                       str(cfmt)).astype(np.int64)
                out["image_id"].append(image_id)
                out["cmp_image_id"].append(cid)
                out["n_px"].append(int(a.size))
                out["n_eq"].append(int((np.abs(a - b) < flt_dif).sum()))
            yield pd.DataFrame(out)

    return pairs.select("image_id", "bytes", "fmt", "cmp_image_id",
                        "cmp_bytes", "cmp_fmt", "w", "h") \
        .mapInPandas(gen, schema=_EQ_SCHEMA)
