"""stretch_img invariants: output range, minmax window endpoints, and the
percent window clipping mass."""

import numpy as np

from rsgislib_spark import synth
from rsgislib_spark.operators.imagemath import stretch_stats


def _imgs(spark, sf_dir):
    meta = synth.synth_images(spark, sf_dir,
                              with_footprint=False).where("id % 13 = 0")
    return synth.attach_bytes(meta.repartition(4))


def test_stretch_minmax_full_range(spark, sf_dir):
    out = stretch_stats(_imgs(spark, sf_dir), mode="minmax").toPandas()
    assert len(out) > 0
    assert (out["min_out"] == 0).all()          # min value maps to 0
    assert (out["max_out"] == 255).all()        # max value maps to 255
    assert (out["lo"] < out["hi"]).all()
    assert (out["sum_out"] <= 255 * out["n_pix"]).all()


def test_stretch_percent_window(spark, sf_dir):
    out = stretch_stats(_imgs(spark, sf_dir), mode="percent",
                        percent=2).toPandas()
    mm = stretch_stats(_imgs(spark, sf_dir), mode="minmax") \
        .toPandas().set_index("image_id")
    assert len(out) > 0
    for _, r in out.iterrows():
        m = mm.loc[r["image_id"]]
        assert m["lo"] <= r["lo"] <= r["hi"] <= m["hi"]  # window nests
        assert 0 <= r["min_out"] and r["max_out"] <= 255
    # the 2% window clips, so it is strictly inside on typical planes
    assert (out["lo"] > mm.loc[out["image_id"], "lo"].values).any()


def test_stretch_mapping_numpy():
    rng = np.random.RandomState(9)
    v = rng.randint(0, 1024, 5000).astype(np.int64)
    vals, cnts = np.unique(v, return_counts=True)
    lo, hi = int(vals[0]), int(vals[-1])
    sv = (np.clip(vals, lo, hi) - lo) * 255 // (hi - lo)
    # brute per-pixel mapping agrees with the histogram-space mapping
    per_px = (np.clip(v, lo, hi) - lo) * 255 // (hi - lo)
    assert int((cnts * sv).sum()) == int(per_px.sum())
    assert sv.min() == per_px.min() and sv.max() == per_px.max()
