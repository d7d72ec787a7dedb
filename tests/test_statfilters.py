"""Non-triviality + semantics checks for the SAR-texture filter family.

A green exact-hash parity row is not evidence the operator does
anything (NOTES lesson 15) — assert here that the zero-centre / nv<=3
guards genuinely fire somewhere AND that nonzero texture values occur,
and pin the per-pixel math against a brute-force window loop.
"""
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rsgislib_spark.functions.detmath import ln_pos_np
from rsgislib_spark.operators.statfilters import _texture_plane
from rsgislib_spark import synth

_Q = 1048576.0


def _brute(a, kind):
    """Reference transliteration of RSGISSARTextureFilters.cpp loops."""
    h, w = a.shape
    out = np.zeros((h - 2, w - 2))
    guard = np.zeros((h - 2, w - 2), dtype=bool)
    for yy in range(1, h - 1):
        for xx in range(1, w - 1):
            win = a[yy - 1:yy + 2, xx - 1:xx + 2].astype(np.float64)
            if kind == "cov":
                s, ss = int(win.sum()), int((win * win).sum())
                if s > 0:
                    out[yy - 1, xx - 1] = np.sqrt(9 * ss - s * s) / s
                else:
                    guard[yy - 1, xx - 1] = True
                continue
            vals = win[win != 0]
            if a[yy, xx] == 0 or vals.size <= 3:
                guard[yy - 1, xx - 1] = True
                continue
            if kind == "nv_power":
                t, sq = vals, vals * vals
            elif kind == "nv_sqrt":
                t, sq = np.sqrt(vals), vals
            else:
                t = ln_pos_np(vals)
                sq = t * t
            im = t.sum() / vals.size
            if im * im <= 0:
                guard[yy - 1, xx - 1] = True
                continue
            out[yy - 1, xx - 1] = sq.sum() / vals.size / (im * im) - 1.0
    return out, guard


@pytest.mark.parametrize("kind", ["cov", "nv_power", "nv_sqrt", "nv_ln"])
def test_texture_plane_matches_brute(kind):
    a = synth.pixel_array(38, 17, 13, "raw16").astype(np.int64)
    a[4:9, 3:9] = 0                       # zero block >= 3x3: guards fire
    q, guard = _texture_plane(a, kind, 3)
    bout, bguard = _brute(a, kind)
    assert guard.sum() == bguard.sum() > 0, "guard never fires"
    assert (q != 0).any(), "texture plane is vacuously zero"
    # quantized outputs agree within 1 ulp of the quantizer (the brute
    # loop sums window terms in a different order)
    bq = np.floor(bout * _Q)
    assert np.abs(q.reshape(bq.shape) - bq).max() <= 1


def test_cov_constant_window_is_zero_texture():
    a = np.full((9, 9), 7, dtype=np.int64)
    q, guard = _texture_plane(a, "cov", 3)
    assert not guard.any()
    assert (q == 0).all()                 # stddev/mean of constant = 0


def test_nv_power_known_window():
    # single 3x3 window: values 1..9 -> mean 5, mean sq 95/3
    a = np.arange(1, 10, dtype=np.int64).reshape(3, 3)
    q, guard = _texture_plane(a, "nv_power", 3)
    expect = (95.0 / 3.0) / 25.0 - 1.0
    assert not guard.any()
    assert q[0, 0] == np.floor(expect * _Q)
