"""Non-triviality checks for dist_between_clumps / dist_to_classes /
rat_uid_sample."""

import numpy as np

from rsgislib_spark.operators.rastergis import (dist_between_clumps,
                                                dist_to_classes,
                                                rat_uid_rows)
from rsgislib_spark.queries import (_px_images, q_rat_uid_sample)


def test_dist_between_clumps_varies(spark, sf_dir):
    out = dist_between_clumps(_px_images(spark, sf_dir, mod=19)) \
        .toPandas()
    assert len(out) > 0
    assert (out.cls % 2 == 1).all()              # odd bands only
    assert (out.min_sq_px >= 1).all()            # never same clump
    # the even-band exclusion is real: no clump sits at the touching
    # constants (sq 1/2) — at tiny SF the lattice spacing is uniform,
    # so assert separation rather than variance
    assert (out.min_sq_px > 2).all()
    # dist_deg = sqrt(min_sq_px) * res exactly
    assert np.allclose(out.dist_deg,
                       np.sqrt(out.min_sq_px.astype(float)) * 0.001)


def test_dist_to_classes_caps(spark, sf_dir):
    out = dist_to_classes(_px_images(spark, sf_dir, mod=53)).toPandas()
    assert len(out) > 0
    assert set(out.cls) <= {0, 1, 2, 3}
    assert (out.n_within >= out.n_src).all()     # class pixels at d2=0
    assert (out.max_d2 <= 256).all()             # cap respected
    assert (out.max_d2 > 0).any()                # some off-class pixels
    # at least one class somewhere leaves out-of-range pixels
    joined = out.groupby("image_id").n_within.max()
    assert (out.sum_d2 > 0).any()


def test_rat_uid_sample_ratio(spark, sf_dir):
    out = q_rat_uid_sample(spark, sf_dir).toPandas()
    assert len(out) > 0
    # uid is 0-based RAT row order
    for _, g in out.groupby("image_id"):
        g = g.sort_values("clump_id")
        assert (g.uid.values == g.clump_id.values - 1).all()
    # selection only among cls=3, exactly floor(n * 0.25) per image
    assert (out[out.sel == 1].cls == 1).all()
    per = out.groupby("image_id").apply(
        lambda g: (int(g.sel.sum()),
                   int(np.floor((g.cls == 1).sum() * 0.5))),
        include_groups=False)
    assert all(a == b for a, b in per.values)
    assert out.sel.sum() > 0
