"""Non-triviality checks for the changedetect class-outlier family."""

from rsgislib_spark.operators import changedetect as cdo
from rsgislib_spark.queries import _px_images


def test_cd_otsu_splits_mask(spark, sf_dir):
    out = cdo.class_otsu_outliers_stats(
        _px_images(spark, sf_dir, mod=19)).toPandas()
    assert len(out) > 0
    assert (out.n_mask > 0).all()
    # classification is a genuine partition of the valid mask
    assert (out.n_chng + out.n_nochng == out.n_mask).all()
    # the otsu threshold genuinely splits: both classes occur somewhere
    assert (out.n_chng > 0).any()
    assert (out.n_nochng > 0).any()


def test_cd_li_high_side(spark, sf_dir):
    out = cdo.class_li_outliers_stats(
        _px_images(spark, sf_dir, mod=19)).toPandas()
    assert len(out) > 0
    assert (out.n_chng + out.n_nochng == out.n_mask).all()
    # the threshold genuinely splits the masked data: both classes
    # non-vacuous corpus-wide (Li can land either side of the median
    # on this lattice, so no minority assumption)
    assert out.n_chng.sum() > 0
    assert out.n_nochng.sum() > 0


def test_cd_kurtskew_candidates(spark, sf_dir):
    out = cdo.class_kurt_skew_outliers_stats(
        _px_images(spark, sf_dir, mod=19)).toPandas()
    assert len(out) > 0
    assert (out.crit_q >= 0).all()
    assert (out.n_chng + out.n_nochng == out.n_mask).all()
    assert (out.n_chng > 0).any()


def test_cd_masks_differ_from_global(spark, sf_dir):
    """The masked Otsu threshold differs from the global-plane Otsu on
    at least one image — i.e. the mask genuinely restricts the data."""
    from rsgislib_spark.operators.imagemath import otsu_threshold_stats
    img = _px_images(spark, sf_dir, mod=19)
    masked = cdo.class_otsu_outliers_stats(img).toPandas() \
        .set_index("image_id").thres
    global_t = otsu_threshold_stats(img).toPandas() \
        .set_index("image_id").thres
    joined = masked.to_frame("m").join(global_t.to_frame("g"),
                                       how="inner")
    assert (joined.m != joined.g).any()
