"""Non-triviality checks for calc_ppi, buffer_img_pxl_vals,
calc_histograms_for_msk_vals and calc_fill_regions_knn twins."""

import numpy as np
import pytest

from rsgislib_spark import synth
from rsgislib_spark.operators import imgcalcmisc as icm
from rsgislib_spark.operators.specunmix import (PPI_NPROJ, ppi_counts,
                                                ppi_proj)
from rsgislib_spark.queries import _px_images


@pytest.fixture(scope="module")
def img(spark, sf_dir):
    return _px_images(spark, sf_dir, mod=37)


def test_ppi_counts_match_numpy(img):
    out = ppi_counts(img).toPandas()
    assert len(out) > 0
    # every image contributes exactly 2 hits per projection
    tot = out.groupby("image_id").ppi_count.sum()
    assert (tot == 2 * PPI_NPROJ).all()
    assert (out.ppi_count >= 1).all()
    # extremes are spread over multiple pixels (not one degenerate px)
    npx = out.groupby("image_id").size()
    assert (npx >= 2).all()
    # brute-force one image
    meta = img.select("id", "image_id", "w", "h", "fmt").toPandas()
    r = meta.iloc[0]
    v = synth.pixel_array(int(r.id), int(r.w), int(r.h),
                          str(r.fmt)).astype(np.int64).ravel()
    pmax = 256 if str(r.fmt) in ("raw8", "png") else 1024
    bands = [v, (v * 7 + 3) % pmax, (v * 13 + 5) % pmax]
    counts = {}
    for k in range(PPI_NPROJ):
        s = sum(ppi_proj(k, b) * bands[b] for b in range(3))
        for i in (int(np.argmin(s)), int(np.argmax(s))):
            counts[i] = counts.get(i, 0) + 1
    got = out[out.image_id == r.image_id]
    got_map = {int(rr.y * r.w + rr.x): int(rr.ppi_count)
               for rr in got.itertuples()}
    assert got_map == counts


def test_buffer_mask_nontrivial(img):
    out = icm.buffer_pxl_vals_stats(img, pxl_vals=(42, 99),
                                    buf_thres=5).toPandas()
    assert len(out) > 0
    has = out[out.n_src > 0]
    assert len(has) > 0
    # buffer strictly grows the source set and stays below the image
    assert (has.n_buf > has.n_src).all()
    assert (has.n_buf < has.n_pix).all()
    assert (has.sum_d2_in > 0).all()


def test_msk_val_hists_partition(img):
    out = icm.msk_val_hist_stats(img, bin_width=32).toPandas()
    assert len(out) > 0
    assert (out.msk_val != 0).all()
    assert out.msk_val.between(1, 7).all()
    assert (out.cnt > 0).all()
    # counts tile the non-zero-mask pixels exactly
    meta = img.select("id", "image_id", "w", "h", "fmt").toPandas()
    r = meta.iloc[1]
    v = synth.pixel_array(int(r.id), int(r.w), int(r.h),
                          str(r.fmt)).astype(np.int64).ravel()
    want = int(((v // 64) % 8 != 0).sum())
    got = out[out.image_id == r.image_id].cnt.sum()
    assert got == want
    # multiple mask values and bins per image (histograms are real;
    # raw8 images have pmax=256 so only mask values 1..3 exist)
    g = out.groupby("image_id")
    assert (g.msk_val.nunique() >= 3).all()
    assert (g["bin"].nunique() >= 4).all()


def test_fill_regions_knn_mode(img):
    out = icm.fill_regions_knn_stats(img, k=5).toPandas()
    assert len(out) > 0
    assert (out.n_fill > 0).all()
    assert (out.min_fill >= 0).all()
    assert (out.max_fill > out.min_fill).all()
    # k=5 ring: interior pixels take 4 at d2=1 + 1 at d2=2 (sum 6);
    # edge pixels take two diagonals (sum 7), corners only 3 (sum 4)
    assert (out.sum_kd2 <= 7 * out.n_fill).all()
    assert (out.sum_kd2 >= 4 * out.n_fill).all()
    assert (out.sum_kd2 >= 6 * out.n_fill).any()   # edges exist
