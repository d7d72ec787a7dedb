"""Non-triviality + independent-transcription checks for the
tools.stats metric panel (operators/binstats.py).  The exact-hash
oracle parity lives in test_entry_contract; these assert the operators
actually discriminate (lesson 15: a green parity row on a vacuous
plane proves nothing)."""

import numpy as np
import pytest

from rsgislib_spark import synth
from rsgislib_spark.operators import binstats as bs
from rsgislib_spark.queries import _px_images

_Q = 1 << 20


@pytest.fixture(scope="module")
def img(spark, sf_dir):
    return _px_images(spark, sf_dir, mod=19)


def test_binary_scores_discriminate(img):
    out = bs.binary_scores_stats(img).toPandas()
    assert len(out) > 0
    # both classes genuinely present on every image
    assert ((out.tp + out.fp > 0) & (out.ta + out.fa > 0)).all()
    # the pred plane is correlated with truth: accuracy and kappa
    # clearly above chance on most images
    assert (out.acc_q > int(0.8 * _Q)).mean() > 0.8
    assert (out.kappa_q > int(0.5 * _Q)).mean() > 0.8
    assert (out.mcc_q > 0).all()
    # misclassifications exist (the e-plane flips border pixels)
    assert (out.mr_q > 0).any()
    # NMI in (0, 1]; TSS = sens + spec - 1 consistent
    ok = out[out.nmi_q >= 0]
    assert len(ok) > 0
    assert (ok.nmi_q <= _Q).all()
    got = out.tss_q + _Q
    want = out.sens_q + out.spec_q
    assert (abs(got - want) <= 2).all()   # floor rounding slack


def test_prob_scores_auc_pairs(img):
    out = bs.prob_scores_stats(img).toPandas().set_index("image_id")
    assert len(out) > 0
    # prob correlates with truth: AUC well above chance, below 1
    assert (out.auc_q > int(0.9 * _Q)).mean() > 0.8
    assert (out.auc_q <= _Q).all()
    assert (out.auc_q < _Q).any()      # ties/overlap exist somewhere
    assert (out.brier_q > 0).all()
    assert (out.ap_q30 > 0).all()
    assert (out.logloss_q30 > 0).all()
    assert (out.pbr_q > int(0.5 * _Q)).all()
    # independent pairwise AUC on the smallest image
    meta = img.select("id", "image_id", "w", "h", "fmt").toPandas()
    meta["npx"] = meta.w * meta.h
    r = meta.sort_values("npx").iloc[0]
    v = synth.pixel_array(int(r.id), int(r.w), int(r.h),
                          str(r.fmt)).astype(np.int64)
    pmax = 256 if str(r.fmt) in ("raw8", "png") else 1024
    x = np.arange(int(r.w), dtype=np.int64)[None, :]
    y = np.arange(int(r.h), dtype=np.int64)[:, None]
    e = (x * 7 + y * 3 + int(r.id)) % 21 - 10
    yt = ((v * 2) // pmax).ravel()
    vp = np.clip(v + e, 0, pmax - 1).ravel()
    pos, neg = vp[yt == 1], vp[yt == 0]
    gt = (pos[:, None] > neg[None, :]).sum()
    tie = (pos[:, None] == neg[None, :]).sum()
    auc = (gt + 0.5 * tie) / (len(pos) * len(neg))
    assert out.loc[r.image_id, "auc_q"] == int(np.floor(auc * _Q))


def test_breusch_pagan_nontrivial(img):
    out = bs.breusch_pagan_stats(img).toPandas()
    assert len(out) > 0
    assert (out.ssr16 > 0).all()          # residuals are real
    assert (out.lm_q != -1).all()
    assert (out.ci_class >= 0).all()
    # LM bounded by n (R2 <= 1)
    assert (out.lm_q <= out.n * _Q).all()


def test_vif_collinearity_detected(img):
    out = bs.vif_scores_stats(img).toPandas()
    assert len(out) > 0
    assert set(out.col_id) == {1, 2, 3}
    assert (out.vif_q != -1).all()
    # VIF >= 1 by construction (R2 >= 0 up to residual quantization)
    assert (out.vif_q >= _Q - 2048).all()
    # c3 blends c1+c2, so its VIF must exceed the pure columns'
    piv = out.pivot_table(index="image_id", columns="col_id",
                          values="vif_q")
    assert (piv[3] > piv[1]).mean() > 0.9
    assert (piv[3] > _Q * 3 // 2).mean() > 0.5


def test_hist_nbins_matches_numpy(img):
    out = bs.hist_nbins_stats(img).toPandas().set_index("image_id")
    assert len(out) > 0
    ok = out[out.n_bins >= 0]
    assert len(ok) == len(out)            # IQR > 0 everywhere here
    meta = img.select("id", "image_id", "w", "h", "fmt").toPandas()
    for _, r in meta.head(8).iterrows():
        v = synth.pixel_array(int(r.id), int(r.w), int(r.h),
                              str(r.fmt)).ravel().astype(np.float64)
        n = v.size
        iqr = np.percentile(v, 75) - np.percentile(v, 25)
        bw = 2 * iqr * n ** (-1.0 / 3.0)
        want = int((v.max() - v.min()) / bw) + 2
        assert out.loc[r.image_id, "n_bins"] == want
    # geometric centre <= arithmetic centre (AM-GM), *8 vs *4 scales
    for j in (1, 2, 3, 4):
        ga = out[f"cg{j}_q"] / _Q
        aa = out[f"ca{j}_8"] / 8.0
        assert (ga <= aa + 1e-9).all()
