"""Semantics checks for the spectral-index family (operators/indices.py).

The exact-hash parity row proves engine==oracle; here we pin the
*formulas* against independent per-pixel float evaluation of the
reference's muParser expressions (imagecalc/calcindices.py), and
assert the -999 guards and value bounds are non-vacuous.
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rsgislib_spark.operators.indices import _GUARD, _index_planes
from rsgislib_spark import synth


def _planes(img_id=5, w=31, h=23, fmt="raw16"):
    v = synth.pixel_array(img_id, w, h, fmt).astype(np.int64)
    pmax = 256 if fmt in ("raw8", "png") else 1024
    return v, pmax, _index_planes(v, pmax)


def test_ratio_indices_match_reference_float_eval():
    v, pmax, idx = _planes()
    blue, green, red = v, v[:, ::-1], v[::-1, :]
    nir, swir = v[::-1, ::-1], pmax - 1 - v
    b, g, r, n, s = (a.astype(float) for a in (blue, green, red, nir, swir))
    cases = {
        "ndwi": np.where(g + n != 0, (g - n) / np.where(g + n == 0, 1, g + n),
                         _GUARD),
        "nbr": np.where(n + s != 0, (n - s) / np.where(n + s == 0, 1, n + s),
                        _GUARD),
        "wbi": np.where(n != 0, b / np.where(n == 0, 1, n), _GUARD),
        # EVI over 0.001-scaled reflectances, G=2.5 C1=6 C2=7.5 L=1
        "evi": 2.5 * (0.001 * n - 0.001 * r)
        / (0.001 * n + 6 * 0.001 * r - 7.5 * 0.001 * b + 1),
        # BAI at scale_factor=1000: 1/((0.1-r')^2+(0.06-n')^2)
        "bai": 1.0 / ((0.1 - r / 1000) ** 2 + (0.06 - n / 1000) ** 2),
        # whiteness: sum |band - mean| / mean
        "white": np.where(
            b + g + r != 0,
            (np.abs(b - (b + g + r) / 3) + np.abs(g - (b + g + r) / 3)
             + np.abs(r - (b + g + r) / 3))
            / np.where(b + g + r == 0, 1, (b + g + r) / 3),
            _GUARD),
        # MVI as the reference docstring intends: (nir-green)/(swir-green)
        "mvi": np.where(s - g != 0, (n - g) / np.where(s - g == 0, 1, s - g),
                        _GUARD),
    }
    for k, ref in cases.items():
        ours = idx[k]
        free = ours != _GUARD
        assert free.any(), k
        np.testing.assert_allclose(ours[free], ref[free], rtol=1e-9,
                                   err_msg=k)


def test_ctvi_is_signed_sqrt_of_shifted_ndvi():
    v, pmax, idx = _planes()
    n = v[::-1, ::-1].astype(float)
    r = v[::-1, :].astype(float)
    den = n + r
    nd = np.where(den != 0, (n - r) / np.where(den == 0, 1, den), np.nan)
    x = nd + 0.5
    ref = np.sign(x) * np.sqrt(np.abs(x))
    free = den != 0
    np.testing.assert_allclose(idx["ctvi"][free], ref[free], rtol=1e-12)
    assert (idx["ctvi"][~free] == _GUARD).all() or free.all()


def test_guards_fire_and_bounds_hold():
    # raw8 negation band makes green+swir == 255 always; build a plane
    # where a zero denominator actually occurs for wbi (nir == 0).
    v, pmax, idx = _planes(img_id=4, w=64, h=64, fmt="raw8")
    nir = v[::-1, ::-1]
    assert (nir == 0).any()
    assert (idx["wbi"] == _GUARD).sum() == (nir == 0).sum()
    # normalized differences live in [-1, 1] outside guards
    for k in ("ndwi", "gndvi", "ndsi", "nbr"):
        vals = idx[k][idx[k] != _GUARD]
        assert vals.min() >= -1.0 and vals.max() <= 1.0, k
    # brightness at scale 1000 of sub-1024 planes stays in (0, ~1.1)
    br = idx["bright"][idx["bright"] != _GUARD]
    assert br.min() >= 0.0 and br.max() < 1.1
