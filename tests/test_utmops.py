"""tools.utm zone helpers: branch coverage + geometric invariants
(exact-hash parity lives in test_entry_contract)."""

import numpy as np
import pytest

from rsgislib_spark import synth
from rsgislib_spark.operators import utmops
from rsgislib_spark.session import load_tables


@pytest.fixture(scope="module")
def qpts(spark, sf_dir):
    return synth.synth_qpoints(spark, sf_dir)


def test_zone_branches_exercised(qpts):
    out = utmops.utm_point_zones(qpts).toPandas()
    assert len(out) > 0
    # default ladder: wide zone coverage from the global scatter
    # (scale-aware: the sf0.001 corpus only has ~25 query points)
    assert out.zone.nunique() > min(20, len(out) // 3)
    assert out.zone.between(1, 60).all()
    # Svalbard arms fire on the derived hi-lat copy
    sval = out[(out.lat >= 72) & (out.lat <= 84) & (out.lon >= 0)
               & (out.lon < 42)]
    if len(sval):
        assert set(sval.zone) <= {31, 33, 35, 37}
    # >84 latitude gets the letter sentinel, valid_zone = 0
    hi = out[out.lat > 84]
    assert len(hi) > 0
    assert (hi.letter_idx == -1).all()
    assert (hi.zone_letter == "-").all()
    assert (hi.valid_zone == 0).all()
    # letters consistent with the reference table
    ok = out[out.letter_idx >= 0]
    letters = "CDEFGHJKLMNPQRSTUVWXX"
    for _, r in ok.head(50).iterrows():
        assert r.zone_letter == letters[int(r.letter_idx)]
        assert r.zone_letter not in ("I", "O")
    # epsg hemisphere split and central meridian bracket the lon
    north = ok[ok.lat >= 0]
    south = ok[ok.lat < 0]
    assert ((north.epsg - 32600) == north.zone).all()
    assert ((south.epsg - 32700) == south.zone).all()
    dflt = out[(out.lat < 56)]           # no-exception rows
    assert (abs(dflt.lon - dflt.central_lon) <= 3.0 + 1e-9).all()


def test_zone_mode_and_split(qpts):
    mode = utmops.utm_zone_mode(qpts).toPandas().iloc[0]
    assert 1 <= mode.mode_zone <= 60
    assert 0 < mode.n_modal <= mode.n_pts
    assert mode.n_zones > min(20, int(mode.n_pts) // 3)
    split = utmops.utm_bbox_split(qpts).toPandas()
    bb = qpts.toPandas()
    x0, x1 = bb.qlon.min(), bb.qlon.max()
    # clipped slices tile the bbox width exactly
    assert np.isclose((split.x_max - split.x_min).sum(), x1 - x0)
    assert (split.x_max >= split.x_min).all()
    assert len(split) == split.zone.max() - split.zone.min() + 1


def test_eastings_symmetric(spark, sf_dir):
    nation = load_tables(spark, sf_dir, ["nation"])["nation"]
    out = utmops.utm_min_max_eastings(nation, zone=1).toPandas()
    assert len(out) == 25
    # central +/- 3 deg is symmetric about the 500 km false easting
    assert np.allclose(out.min_easting + out.max_easting, 1_000_000.0,
                       atol=1e-3)
    assert (out.min_easting < 500_000.0).all()
    assert (out.max_easting > 500_000.0).all()
    # narrower at high |lat| (meridian convergence)
    w = (out.max_easting - out.min_easting).values
    lat = out.lat.values
    assert w[np.argmin(np.abs(lat))] == w.max()
    assert w[np.argmax(np.abs(lat))] < w.max() * 0.6
