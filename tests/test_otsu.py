"""Otsu threshold: the engine's integer-numerator score must select the
same threshold as the reference's float formulation (tools/stats.py:641)
on unit-width bins."""

import numpy as np

from rsgislib_spark import synth
from rsgislib_spark.operators.imagemath import otsu_threshold_stats


def _reference_otsu_unit_bins(arr: np.ndarray) -> int:
    """calc_otsu_threshold with the histogram at full value resolution
    over OBSERVED values (the engine's candidate contract)."""
    vals, cnts = np.unique(arr, return_counts=True)
    hist = cnts.astype(np.float64) / cnts.sum()
    w1 = np.cumsum(hist)
    w2 = np.cumsum(hist[::-1])[::-1]
    m1 = np.cumsum(hist * vals) / w1
    m2 = (np.cumsum((hist * vals)[::-1]) / w2[::-1])[::-1]
    var12 = w1[:-1] * w2[1:] * (m1[:-1] - m2[1:]) ** 2
    return int(vals[np.argmax(var12)])


def test_otsu_matches_reference_formula():
    rng = np.random.RandomState(5)
    for _ in range(60):
        # bimodal-ish integer data
        a = np.concatenate([rng.randint(0, 200, rng.randint(50, 400)),
                            rng.randint(500, 900, rng.randint(50, 400))])
        vals, cnts = np.unique(a, return_counts=True)
        w0 = np.cumsum(cnts)[:-1]
        s0 = np.cumsum(vals * cnts)[:-1]
        n, s = a.size, int((vals * cnts).sum())
        w1 = n - w0
        nn = s0 * w1 - (s - s0) * w0
        score = (nn.astype(np.float64) / w0) * nn.astype(np.float64) / w1
        got = int(vals[np.argmax(score)])
        assert got == _reference_otsu_unit_bins(a)


def test_otsu_spark_separates_classes(spark, sf_dir):
    meta = synth.synth_images(spark, sf_dir,
                              with_footprint=False).where("id % 19 = 0")
    img = synth.attach_bytes(meta.repartition(4))
    out = otsu_threshold_stats(img).toPandas()
    assert len(out) > 0
    assert (out["n_below"] + out["n_above"] > 0).all()
    assert (out["score"] > 0).all()
    # threshold lies strictly inside the value range
    m = synth.synth_images(spark, sf_dir, with_footprint=False) \
        .where("id % 19 = 0").select("image_id", "id", "w", "h",
                                     "fmt").toPandas().set_index("image_id")
    for _, r in out.head(10).iterrows():
        mm = m.loc[r["image_id"]]
        plane = synth.pixel_array(int(mm["id"]), int(mm["w"]), int(mm["h"]),
                                  str(mm["fmt"]))
        assert plane.min() <= r["thres"] < plane.max()
        assert r["n_below"] == int((plane <= r["thres"]).sum())
