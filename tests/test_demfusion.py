"""fft_dem_fusion invariants: the splice genuinely mixes the two
spectra and every integer component stays exactly representable."""

import numpy as np

from rsgislib_spark.functions import codec
from rsgislib_spark.operators.demfusion import (_block_mean, _fft2q,
                                                _splice_mask, fuse_plane,
                                                fft_fusion_stats)
from rsgislib_spark.queries import _px_images


def _planes(spark, sf_dir):
    pdf = _px_images(spark, sf_dir, mod=53) \
        .select("image_id", "bytes", "w", "h", "fmt").toPandas()
    for _, r in pdf.iterrows():
        yield r["image_id"], codec.decode_image(
            bytes(r["bytes"]), int(r.w), int(r.h),
            str(r.fmt)).astype(np.int64)


def test_fusion_mixes_spectra(spark, sf_dir):
    mixed = 0
    for image_id, v in _planes(spark, sf_dir):
        hi = _block_mean(v, 4)
        gh, gw = hi.shape
        fused, nsp = fuse_plane(v)
        # pure-hi pipeline (inverse of the hi spectrum alone)
        hre, him = _fft2q(hi)
        rre, rim = _fft2q(hre, him, fwd=False)
        pure_hi = np.floor(np.sqrt(rre.astype(np.float64) ** 2
                                   + rim.astype(np.float64) ** 2))
        if nsp < gh * gw:
            mixed += 1
            assert (fused != pure_hi.astype(np.int64)).any(), image_id
        # integer components stay < 2^53 before the double cast
        assert abs(int(rre.max())) < 1 << 53
        assert abs(int(rre.min())) < 1 << 53
    assert mixed > 0  # corpus contains genuinely spliced images


def test_fusion_splice_counts(spark, sf_dir):
    out = fft_fusion_stats(_px_images(spark, sf_dir, mod=53)).toPandas()
    assert len(out) > 0
    exp = np.minimum(out.gw, 8) * np.minimum(out.gh, 8)
    assert (out.n_splice == exp).all()
    assert (out.sum_mag > 0).all()
