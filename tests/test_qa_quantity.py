"""Semantics checks: Landsat C2 QA parse vs the reference unpackbits
branch table, and Pontius Q/A/C/D vs a float transliteration of
cls_quantity_accuracy (classaccuracymetrics.py:46).
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rsgislib_spark import synth


def _ref_qa_lut(val: int) -> dict:
    """Transliteration of parse_landsat_c2_qa_pixel_img's LUT build
    (imagecalibration/sensorlvl2data.py:568-640)."""
    vb = np.flip(np.unpackbits(np.flip(
        np.array([val], dtype=np.uint16).view(np.uint8))))
    d = {k: int(vb[j]) for j, k in enumerate(
        ("Fill", "DilatedCloud", "Cirrus", "Cloud", "CloudShadow",
         "Snow", "Clear", "Water"))}
    for name, hi in (("CloudConfidence", 8), ("CloudShadowConfidence", 10),
                     ("SnowIceConfidence", 12), ("CirrusConfidence", 14)):
        b_hi, b_lo = int(vb[hi]), int(vb[hi + 1])
        d[name] = {(0, 0): 1, (0, 1): 2, (1, 0): 3, (1, 1): 4}[(b_hi, b_lo)]
    return d


def test_qa_bit_mapping_matches_reference_lut():
    for val in (0, 1, 21824, 54596, 65535, 2 + 8 + 256 + 512, 43690):
        ref = _ref_qa_lut(val)
        # engine formulation: bit j = (val >> j) & 1; conf = 1+2*hi+lo
        for j, k in enumerate(("Fill", "DilatedCloud", "Cirrus", "Cloud",
                               "CloudShadow", "Snow", "Clear", "Water")):
            assert (val >> j) & 1 == ref[k], (val, k)
        for name, hi in (("CloudConfidence", 8),
                         ("CloudShadowConfidence", 10),
                         ("SnowIceConfidence", 12),
                         ("CirrusConfidence", 14)):
            conf = 1 + 2 * ((val >> hi) & 1) + ((val >> (hi + 1)) & 1)
            assert conf == ref[name], (val, name)


def _ref_quantity(cm: np.ndarray, cls_area: np.ndarray) -> tuple:
    """Float transliteration of cls_quantity_accuracy (:86-117)."""
    prop_area = (cls_area / cls_area.sum()).reshape(-1, 1)
    norm_cm = cm.astype(float) / cm.sum(axis=1).reshape(-1, 1)
    norm_cm = norm_cm * prop_area
    comp_total = norm_cm.sum(axis=1)
    ref_total = norm_cm.sum(axis=0)
    q = sum(np.abs(ref_total - comp_total)) / 2
    commission = [(row.sum() - row[i]) for i, row in enumerate(norm_cm)]
    omission = ref_total - np.diag(norm_cm)
    a = sum(2 * np.min(np.array([commission, omission]), axis=0)) / 2
    c = sum(np.diag(norm_cm)) / np.sum(norm_cm)
    return q, a, c, q + a


def test_quantity_metrics_match_reference_float_chain():
    # raw8 wraps the full 0..255 range, so all four quartile classes
    # are populated (a zero row would nan the reference chain)
    v = synth.pixel_array(9, 80, 60, "raw8").astype(np.int64)
    c = (v * 4) // 256
    p = (v[:, ::-1] * 4) // 256
    cm = np.array([[int(((c == i) & (p == j)).sum()) for j in range(4)]
                   for i in range(4)])
    areas = cm.sum(axis=0)  # classifier-identified counts
    q_ref, a_ref, c_ref, d_ref = _ref_quantity(cm, areas.astype(float))

    # engine rationalisation: n_ij = (cm_ij*a_i)/(r_i*t), pinned sums
    rows, t = cm.sum(axis=1), int(cm.sum())
    norm = np.array([[cm[i, j] * areas[i] / (rows[i] * t)
                      for j in range(4)] for i in range(4)])
    comp, ref = norm.sum(axis=1), norm.sum(axis=0)
    q = np.abs(ref - comp).sum() / 2
    a = sum(2 * min(comp[k] - norm[k, k], ref[k] - norm[k, k])
            for k in range(4)) / 2
    cc = np.diag(norm).sum() / norm.sum()
    assert abs(q - q_ref) < 1e-12
    assert abs(a - a_ref) < 1e-12
    assert abs(cc - c_ref) < 1e-12
    assert 0 <= q and 0 <= a and 0 < cc <= 1
    # non-trivial: mirror confusion is genuinely off-diagonal
    assert cm.trace() < t
