"""calc_dist_to_img_vals invariants: exact squared distances, max_dist
nodata semantics, empty-target images fully nodata."""

import numpy as np

from rsgislib_spark import synth
from rsgislib_spark.operators.imagemath import dist_to_value_stats


def _imgs(spark, sf_dir, mod=37):
    meta = synth.synth_images(spark, sf_dir,
                              with_footprint=False).where(f"id % {mod} = 0")
    return synth.attach_bytes(meta.repartition(4))


def test_dist_matches_bruteforce(spark, sf_dir):
    out = dist_to_value_stats(_imgs(spark, sf_dir), target_val=42,
                              max_dist=16).toPandas()
    assert len(out) > 0
    assert (out["n_valid"] + out["n_nodata"] == out["n_pix"]).all()
    assert (out["max_d2"] <= 256).all()
    meta = synth.synth_images(spark, sf_dir, with_footprint=False) \
        .where("id % 37 = 0").select("image_id", "id", "w", "h",
                                     "fmt").toPandas().set_index("image_id")
    checked_empty = False
    for _, r in out.head(12).iterrows():
        m = meta.loc[r["image_id"]]
        plane = synth.pixel_array(int(m["id"]), int(m["w"]), int(m["h"]),
                                  str(m["fmt"])).astype(np.int64)
        tys, txs = np.nonzero(plane == 42)
        if tys.size == 0:
            assert r["n_nodata"] == r["n_pix"] and r["n_valid"] == 0
            checked_empty = True
            continue
        h, w = plane.shape
        best = np.full((h, w), 1 << 40, dtype=np.int64)
        for ty, tx in zip(tys, txs):
            ys, xs = np.mgrid[0:h, 0:w]
            best = np.minimum(best, (xs - tx) ** 2 + (ys - ty) ** 2)
        valid = best <= 256
        assert r["n_valid"] == int(valid.sum())
        assert r["sum_d2"] == int(best[valid].sum())
        assert r["max_d2"] == (int(best[valid].max()) if valid.any() else 0)
    # the synthetic world contains at least one target per sampled image
    # at most SFs; only assert the aggregate identity if none was empty
    assert checked_empty or (out["n_valid"] > 0).any()
