"""Non-triviality checks for the imageutils utility family."""

import numpy as np

from rsgislib_spark.operators import imgutils_misc as ium
from rsgislib_spark.queries import (_images, _px_images,
                                    q_wgs84_pxl_size)


def test_pixel_locations_fold(spark, sf_dir):
    img = _images(spark, sf_dir, with_footprint=False)
    out = ium.pixel_locations_stats(img).toPandas()
    meta = img.select("image_id", "w", "h", "lon", "lat").toPandas()
    m = out.merge(meta, on="image_id")
    assert (m.n_pix == m.w * m.h).all()
    # fold equals the brute-force per-pixel sum on one image
    r = m.iloc[0]
    xs = np.floor((r.lon + (np.arange(r.w) + 0.5) * 0.001) * 1048576.0)
    ys = np.floor((r.lat - (np.arange(r.h) + 0.5) * 0.001) * 1048576.0)
    assert r.sum_xq == int(xs.sum()) * r.h
    assert r.sum_yq == int(ys.sum()) * r.w


def test_imgs_overlap_both_outcomes(spark, sf_dir):
    img = _images(spark, sf_dir, with_footprint=False)
    out = ium.imgs_overlap_pairs(img.where("id % 7 = 0"),
                                 img.where("id % 5 = 0")).toPandas()
    assert len(out) > 0
    # same-cell candidates include overlapping AND disjoint pairs
    assert (out.overlaps == 1).any()
    assert (out.overlaps == 0).any()
    # overlap flag consistent with the intersection box
    ov = (out.ixmax - out.ixmin > 0) & (out.iymax - out.iymin > 0)
    assert (ov == (out.overlaps == 1)).all()


def test_pxl_sample_counts(spark, sf_dir):
    out = ium.pxl_sample_stats(_px_images(spark, sf_dir, mod=19)) \
        .toPandas()
    assert len(out) > 0
    assert (out.n_samp == out.n_valid // 50).all()
    assert (out.min_samp <= out.max_samp).all()
    assert (out.min_samp != 7).all()             # nodata excluded


def test_rand_pxls_bounds(spark, sf_dir):
    img = _px_images(spark, sf_dir, mod=19)
    out = ium.rand_pxls_stats(img).toPandas()
    meta = img.select("image_id", "w", "h").toPandas()
    m = out.merge(meta, on="image_id")
    assert len(m) > 0
    # exactly 20 per image (nodata is rare enough in 64 candidates)
    per = m.groupby("image_id").rnk.max()
    assert (per == 20).all()
    # edge buffer honored
    assert (m.x >= 2).all() and (m.x < m.w - 2).all()
    assert (m.y >= 2).all() and (m.y < m.h - 2).all()
    assert (m.v != 7).all()


def test_wgs84_size_magnitudes(spark, sf_dir):
    out = q_wgs84_pxl_size(spark, sf_dir).toPandas()
    assert len(out) > 0
    assert (out.sum_yszq > 0).all()
    assert (out.sum_xszq > 0).all()
    # x res shrinks with cos(lat) while y res is near-constant: the
    # ratio never exceeds ~1.02 and genuinely drops for high-lat images
    ratio = out.sum_xszq / out.sum_yszq
    assert (ratio < 1.02).all()
    assert ratio.min() < 0.9
