"""Non-triviality checks for the fill_class_timeseries, hole-area,
polys->points, clip and bbox-reproj twins."""

import numpy as np
import pytest

from rsgislib_spark import synth
from rsgislib_spark.operators import vector as vec
from rsgislib_spark.operators.classification import (TSF_T,
                                                     class_ts_fill_stats)
from rsgislib_spark.queries import _px_images


@pytest.fixture(scope="module")
def zones(spark, sf_dir):
    return synth.synth_zones(spark, sf_dir)


def test_class_ts_fill_fills(spark, sf_dir):
    out = class_ts_fill_stats(_px_images(spark, sf_dir, mod=19)) \
        .toPandas()
    assert len(out) > 0
    assert set(out.t) == set(range(TSF_T))
    # ~20% holes before, nearly none after; fill is real and monotone
    assert (out.n_nodata_before > 0).all()
    assert (out.n_nodata_after < out.n_nodata_before).all()
    frac_after = out.n_nodata_after.sum() / out.n_nodata_before.sum()
    assert frac_after < 0.01
    assert (out.sum_after > 0).all()


def test_poly_holes_and_area_filter(zones):
    out = vec.poly_hole_stats(zones, area_thres=30.0).toPandas()
    assert len(out) == 25
    # hole areas match the construction fractions of the outer rect
    assert np.allclose(out.hole_area_1, out.outer_area * 0.0625)
    assert np.allclose(out.hole_area_2, out.outer_area * 0.0004)
    assert (out.net_area < out.outer_area).all()
    # the threshold genuinely splits the layer
    assert 0 < out.kept.sum() < len(out)


def test_zones_to_segments_closed(zones):
    out = vec.zones_to_segments(zones).toPandas()
    assert len(out) == 100                      # 25 zones x 4 segments
    # each zone's segments chain into a closed ring
    for zid, g in out.groupby("zone_id"):
        g = g.sort_values("vtx_idx")
        assert (g.nx.values == np.roll(g.px.values, -1)).all()
        assert (g.ny.values == np.roll(g.py.values, -1)).all()
    # segment lengths are the rect sides (width, height alternating)
    w = (out.nx - out.px).abs() + (out.ny - out.py).abs()
    assert (w > 0).all()


def test_clip_window(zones):
    out = vec.clip_zone_rects(zones).toPandas()
    zp = zones.toPandas()
    assert 0 < len(out) < len(zp)               # some clipped away
    assert (out.cxmin >= 0.0).all() and (out.cxmax <= 40.0).all()
    assert (out.cymin >= 30.0).all() and (out.cymax <= 60.0).all()
    assert (out.clip_area > 0).all()
    # clipping never grows a zone
    m = out.merge(zp, on="zone_id")
    full = (m.zxmax - m.zxmin) * (m.zymax - m.zymin)
    assert (m.clip_area <= full + 1e-9).all()
    assert (m.clip_area < full).any()           # real clipping happened


def test_bbox_reproj_sane(zones):
    out = vec.bbox_centre_reproj(zones, epsg=32630).toPandas()
    zp = zones.toPandas().set_index("zone_id")
    assert len(out) == 25
    assert (out.eq_win == 0).all()              # no zone equals the window
    # centre inside the zone
    m = out.set_index("zone_id").join(zp)
    assert ((m.centre_x > m.zxmin) & (m.centre_x < m.zxmax)).all()
    # projected bbox is a proper box — only meaningful for zones within
    # the TM series' validity window around the 3W central meridian
    # (far-zone lons legitimately fold; the reference reprojects them
    # verbatim too, so parity still holds there)
    near = m[(m.zxmin > -40.0) & (m.zxmax < 34.0)]
    assert len(near) > 0
    assert (near.pmaxx > near.pminx).all()
    assert (near.pmaxy > near.pminy).all()
    # the hot zone (zone 0, 9.5-10.5E 44.5-45.5N) lands ~600 km east
    # of the 3W central meridian at ~45N: sanity vs known UTM30 values
    z0 = out[out.zone_id == 0].iloc[0]
    assert 1.3e6 < z0.pminx < 1.6e6             # far-east easting
    assert 4.9e6 < z0.pminy < 5.2e6


def test_utm_roundtrip_accuracy(spark, sf_dir):
    """Inverse TM recovers the WGS84 input to < 1e-7 deg (~1 cm)."""
    from rsgislib_spark.queries import _remapped_qpts
    a = _remapped_qpts(spark, sf_dir, -6.0, 6.0, -55.0, 125.0)
    out = vec.utm_roundtrip_wgs84(a, 30).toPandas()
    src = a.toPandas()
    m = out.merge(src, on="qid")
    assert len(m) > 0
    assert (np.abs(m.rec_lon - m.qlon) < 1e-7).all()
    assert (np.abs(m.rec_lat - m.qlat) < 1e-7).all()
    # eastings within the zone's sane band
    assert (m.utm_e > -1e6).all() and (m.utm_e < 2e6).all()
