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


def test_match_closest_pathological_skew(spark):
    """All match points piled in one cell + isolated base points across
    empty oceans: the escalation ladder must stay exact (the old
    brute-force fallback's worst case)."""
    import numpy as np

    rng = [(i, 10.0 + (i % 7) * 1e-4, 45.0 + (i % 11) * 1e-4)
           for i in range(200)]  # dense cluster, one cell
    match = spark.createDataFrame(
        [(f"m{i}", lo, la) for i, lo, la in rng],
        "image_id string, lon double, lat double")
    base = spark.createDataFrame(
        [(1, -170.0, -80.0), (2, 170.0, 80.0), (3, 0.0, 0.0),
         (4, 10.0, 45.0), (5, -90.0, 30.0)],
        "qid long, qlon double, qlat double")
    out = {r.qid: (r.match_image_id, r.dist_match)
           for r in match_closest_points(base, match,
                                         check_ties=False).collect()}
    mlon = np.array([lo for _, lo, _ in rng])
    mlat = np.array([la for _, _, la in rng])
    for qid, (qlon, qlat) in {1: (-170.0, -80.0), 2: (170.0, 80.0),
                              3: (0.0, 0.0), 4: (10.0, 45.0),
                              5: (-90.0, 30.0)}.items():
        d = np.sqrt((mlon - qlon) ** 2 + (mlat - qlat) ** 2)
        # the cluster pattern repeats every 77 points, so exact-distance
        # ties exist; with check_ties=False the engine deterministically
        # returns the lexicographically-smallest key among the tied set
        tied = np.nonzero(d == d.min())[0]
        assert out[qid][0] == min(f"m{j}" for j in tied), qid
        assert abs(out[qid][1] - d.min()) < 1e-12


def test_match_closest_match_count_hint(layers):
    """Passing match_count skips the count() action and cannot change
    the result (even when the hint is wildly wrong)."""
    images, qpts, ipdf, _ = layers
    exact = match_closest_points(qpts, images).toPandas() \
        .sort_values("qid").reset_index(drop=True)
    for hint in (1, 10**12):
        got = match_closest_points(qpts, images, match_count=hint) \
            .toPandas().sort_values("qid").reset_index(drop=True)
        assert got.equals(exact), hint


def test_knn_classify_matches_bruteforce_under_skew(spark):
    """Top-k ladder vs numpy brute force on a pathological layout:
    half the match points piled into one megacity cell, plus empty
    oceans — the distribution that forces multi-rung escalation."""
    import numpy as np

    from rsgislib_spark.operators.knn import knn_classify

    rng = np.random.RandomState(42)
    m = 400
    mx = np.concatenate([rng.uniform(-0.5, 0.5, m // 2),
                         rng.uniform(-170, 170, m // 2)])
    my = np.concatenate([rng.uniform(-0.5, 0.5, m // 2),
                         rng.uniform(-80, 80, m // 2)])
    match = spark.createDataFrame(
        [(int(i), float(mx[i]), float(my[i]), int(i % 7))
         for i in range(m)],
        "id long, lon double, lat double, cls long")
    qx = rng.uniform(-175, 175, 60)
    qy = rng.uniform(-85, 85, 60)
    base = spark.createDataFrame(
        [(int(i), float(qx[i]), float(qy[i])) for i in range(60)],
        "qid long, qlon double, qlat double")
    got = {r.qid: (r.pred_cls, r.n_votes)
           for r in knn_classify(base, match, k=3, match_lon="lon",
                                 match_lat="lat").collect()}
    for i in range(60):
        d = np.sqrt((mx - qx[i]) ** 2 + (my - qy[i]) ** 2)
        order = np.lexsort((np.arange(m), d))[:3]
        cls = (order % 7)
        vals, counts = np.unique(cls, return_counts=True)
        best = vals[np.lexsort((vals, -counts))][0]
        want = (int(best), int(counts[vals == best][0]))
        assert got[i] == want, (i, got[i], want)
