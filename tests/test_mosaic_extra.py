"""NDVI/NDWI composite: both mask classes occur and the composite is
a genuine per-pixel mixture of the two index rules."""

from rsgislib_spark.operators.mosaic import (composite_max_index_window,
                                             composite_ndvi_ndwi_window)
from rsgislib_spark.queries import _px_images


def test_ndvi_ndwi_mask_and_mixture(spark, sf_dir):
    img = _px_images(spark, sf_dir, mod=5, with_footprint=True)
    out = composite_ndvi_ndwi_window(img, 10.0, 45.0, 60, 60, 0.001) \
        .toPandas()
    assert len(out) > 0
    assert set(out.lw_mask) <= {1, 2}
    assert (out.lw_mask == 2).any() and (out.lw_mask == 1).any()
    # land pixels agree with the pure max-NDVI composite
    ndvi = composite_max_index_window(img, 10.0, 45.0, 60, 60, 0.001) \
        .toPandas().set_index(["px", "py"])
    land = out[out.lw_mask == 1].set_index(["px", "py"])
    j = land.join(ndvi, rsuffix="_v")
    assert (j.best_id == j.best_id_v).all()
    assert (j.best_idx == j.best_idx_v).all()
    # ...and at least one water pixel picked a different source image
    water = out[out.lw_mask == 2].set_index(["px", "py"])
    jw = water.join(ndvi, rsuffix="_v")
    assert (jw.best_id != jw.best_id_v).any()
