"""Solar-angle sanity: the folded polynomial trig matches libm within
1e-10 and the convention conversions land in [0, 360]."""

import numpy as np

from rsgislib_spark.operators.solar import solar_angles
from rsgislib_spark.queries import _images


def test_solar_vs_libm(spark, sf_dir):
    img = _images(spark, sf_dir, with_footprint=False)
    out = solar_angles(img).toPandas()
    meta = img.select("image_id", "id", "lat").toPandas()
    m = out.merge(meta, on="image_id")
    assert len(m) > 0
    doy = m.id % 365 + 1
    dec = np.deg2rad(23.45) * np.sin(2 * np.pi * (284 + doy) / 365.0)
    H = 2 * np.pi * (m.id % 96 - 48) / 96.0
    lat = np.deg2rad(m.lat)
    ref = (np.sin(lat) * np.sin(dec)
           + np.cos(lat) * np.cos(dec) * np.cos(H))
    assert np.allclose(m.cos_zen, ref, atol=1e-10)
    assert np.allclose(m.sin_dec, np.sin(dec), atol=1e-10)
    assert (m.cos_zen <= 1.0).all() and (m.cos_zen >= -1.0).all()
    # day (cos_zen > 0) and night both occur across the corpus
    assert (m.cos_zen > 0).any() and (m.cos_zen < 0).any()
    assert (m.az_irr_usgs >= 0).all() and (m.az_irr_usgs < 360).all()
    assert (m.az_irr_trad >= 0).all() and (m.az_irr_trad <= 360).all()
