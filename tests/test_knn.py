"""kNN / radius operators vs brute-force numpy oracles."""

import numpy as np
import pytest

from rsgislib_spark import synth
from rsgislib_spark.operators.knn import TieError, match_closest_points, npts_in_radius


@pytest.fixture(scope="module")
def layers(spark, sf_dir):
    images = synth.synth_images(spark, sf_dir, with_bytes=False,
                                with_footprint=False)
    qpts = synth.synth_qpoints(spark, sf_dir)
    return images, qpts, images.toPandas(), qpts.toPandas()


def test_match_closest_matches_brute(layers):
    images, qpts, ipdf, qpdf = layers
    out = match_closest_points(qpts, images).toPandas().sort_values("qid")
    ilon = ipdf.lon.values
    ilat = ipdf.lat.values
    for _, r in out.iterrows():
        d = np.sqrt((ilon - r.qlon) ** 2 + (ilat - r.qlat) ** 2)
        j = int(np.argmin(d))
        assert r.match_image_id == ipdf.image_id.iloc[j], r.qid
        assert abs(r.dist_match - d[j]) < 1e-12
        assert r.x_match == ilon[j] and r.y_match == ilat[j]


def test_match_closest_tolerance_strict(layers):
    images, qpts, ipdf, qpdf = layers
    tol = 0.05
    out = match_closest_points(qpts, images, tolerance=tol).toPandas()
    assert (out.dist_match < tol).all()
    full = match_closest_points(qpts, images).toPandas()
    assert len(out) == (full.dist_match < tol).sum()


def test_match_closest_tie_raises(spark):
    base = spark.createDataFrame([(1, 0.0, 0.0)], "qid long, qlon double, qlat double")
    match = spark.createDataFrame(
        [("a", 1.0, 0.0), ("b", -1.0, 0.0)],
        "image_id string, lon double, lat double",
    )
    with pytest.raises(TieError):
        match_closest_points(base, match).collect()


def test_npts_in_radius_matches_brute(layers):
    images, _, ipdf, _ = layers
    r = 0.2
    out = npts_in_radius(images, r).toPandas().sort_values("id")
    lon, lat = ipdf.lon.values, ipdf.lat.values
    exp = {}
    for i in range(len(ipdf)):
        d = np.sqrt((lon - lon[i]) ** 2 + (lat - lat[i]) ** 2)
        exp[ipdf.image_id.iloc[i]] = int((d <= r).sum()) - 1
    got = dict(zip(out.image_id, out.n_pts_r))
    assert got == exp
