"""Exhaustive-constrained spectral unmixing + endmember extraction.

Reference: imagecalc.specunmixing.exhcon_linear_spec_unmix
(python/src/specunmixing.cpp:56;
RSGISExhaustiveLinearSpectralUnmixing::calcImageValue,
src/img/RSGISLinearSpectralUnmixing.cpp:99-168: grid-search the
2-endmember abundance simplex em1+em2 < 1+step at a fixed step, keep
the first strict minimum in (em1 outer, em2 inner) loop order) and
specunmixing.extract_avg_endmembers (per-class mean spectra).

Engine adaptation (documented deviations): abundances scaled to the
integer grid A = a/step with step 1/4 (A1, A2 in 0..4, A1+A2 <= 4 —
the reference's em1+em2 < 1+step constraint on the step lattice), and
the measured spectrum enters un-normalised (reference divides by its
L2 norm first; gain semantics instead keep every distance the EXACT
integer  sum_b (4*s_b - A1*e1_b - A2*e2_b)^2,  so the argmin and the
first-win tie rule (smallest A1, then A2 — the C++ loop order) are
bit-exact across engines with no sqrt anywhere).
"""
import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (LongType, StringType, StructField,
                               StructType)

from ..functions import codec

__all__ = ["EM_SPECTRA", "UNMIX_STEPS", "exh_unmix_stats",
           "avg_endmember_stats"]

# two synthetic endmember spectra over the (b1, b2) bands
EM_SPECTRA = ((200, 40), (30, 180))
UNMIX_STEPS = 4  # step resolution 1/4

# the constrained abundance grid in C++ loop order (A1 outer, A2 inner)
_COMBOS = [(a1, a2)
           for a1 in range(UNMIX_STEPS + 1)
           for a2 in range(UNMIX_STEPS + 1)
           if a1 + a2 <= UNMIX_STEPS]

_EXH_SCHEMA = StructType([
    StructField("image_id", StringType()),
    StructField("n_pix", LongType()),
    StructField("sum_a1", LongType()),
    StructField("sum_a2", LongType()),
    StructField("sum_sse", LongType()),
    StructField("n_full", LongType()),
])


def exh_unmix_stats(images: DataFrame) -> DataFrame:
    """One row per image: exact-integer sums of the argmin abundances,
    the minimum SSE, and the count of pixels on the full-sum face
    (A1+A2 = steps)."""
    e1, e2 = EM_SPECTRA
    S = UNMIX_STEPS

    def gen(it):
        for pdf in it:
            out = {f.name: [] for f in _EXH_SCHEMA.fields}
            for image_id, buf, w, h, fmt in zip(pdf["image_id"], pdf["bytes"],
                                                pdf["w"], pdf["h"], pdf["fmt"]):
                v = codec.decode_image(bytes(buf), int(w), int(h),
                                       str(fmt)).astype(np.int64)
                s1, s2 = v.ravel(), v[:, ::-1].ravel()
                # dists: (n_combos, n_pix) exact ints; argmin axis=0
                # returns the FIRST minimum = the C++ loop-order winner
                d = np.stack([
                    (S * s1 - a1 * e1[0] - a2 * e2[0]) ** 2
                    + (S * s2 - a1 * e1[1] - a2 * e2[1]) ** 2
                    for a1, a2 in _COMBOS])
                k = d.argmin(axis=0)
                a1 = np.array([c[0] for c in _COMBOS], dtype=np.int64)[k]
                a2 = np.array([c[1] for c in _COMBOS], dtype=np.int64)[k]
                sse = d[k, np.arange(d.shape[1])]
                out["image_id"].append(image_id)
                out["n_pix"].append(int(s1.size))
                out["sum_a1"].append(int(a1.sum()))
                out["sum_a2"].append(int(a2.sum()))
                out["sum_sse"].append(int(sse.sum()))
                out["n_full"].append(int((a1 + a2 == S).sum()))
            yield pd.DataFrame(out)

    return images.select("image_id", "bytes", "w", "h", "fmt") \
        .mapInPandas(gen, schema=_EXH_SCHEMA)


_AVG_SCHEMA = StructType([
    StructField("image_id", StringType()),
    StructField("cls", LongType()),
    StructField("n_pix", LongType()),
    StructField("sum_b1", LongType()),
    StructField("sum_b2", LongType()),
    StructField("mean_b1_q", LongType()),
    StructField("mean_b2_q", LongType()),
])

_Q = 1048576.0


def avg_endmember_stats(images: DataFrame) -> DataFrame:
    """specunmixing.extract_avg_endmembers: mean spectrum per class
    (class plane = b1 quartile, the classification convention); one
    exact-int division per mean, -1 sentinel for empty classes."""

    def gen(it):
        for pdf in it:
            out = {f.name: [] for f in _AVG_SCHEMA.fields}
            for image_id, buf, w, h, fmt in zip(pdf["image_id"], pdf["bytes"],
                                                pdf["w"], pdf["h"], pdf["fmt"]):
                v = codec.decode_image(bytes(buf), int(w), int(h),
                                       str(fmt)).astype(np.int64)
                m = v[:, ::-1]
                pmax = 256 if str(fmt) in ("raw8", "png") else 1024
                cls = (v * 4) // pmax
                for c in range(4):
                    sel = cls == c
                    n = int(sel.sum())
                    sb1, sb2 = int(v[sel].sum()), int(m[sel].sum())
                    out["image_id"].append(image_id)
                    out["cls"].append(c)
                    out["n_pix"].append(n)
                    out["sum_b1"].append(sb1)
                    out["sum_b2"].append(sb2)
                    out["mean_b1_q"].append(
                        -1 if n == 0 else
                        int(np.floor((float(sb1) / float(n)) * _Q)))
                    out["mean_b2_q"].append(
                        -1 if n == 0 else
                        int(np.floor((float(sb2) / float(n)) * _Q)))
            yield pd.DataFrame(out)

    return images.select("image_id", "bytes", "w", "h", "fmt") \
        .mapInPandas(gen, schema=_AVG_SCHEMA)
