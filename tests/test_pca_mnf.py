"""PCA / MNF completion: eigen-quality of the pinned integer recurrence
and the driver-side MNF transform over the engine's exact scatters.

The cross-engine EXACTNESS of ``pca_project`` / ``mnf_gram`` is covered
by the oracle parity gate; these tests check the math is also *good*:
the fixed-point power iteration converges to the true dominant
eigenvector, and the MNF generalized eigenproblem over the two engine
scatters produces noise-whitened components.
"""

import numpy as np
import pytest

from rsgislib_spark.operators.similarity import (gram_matrix,
                                                 mnf_noise_gram,
                                                 pca_project_dominant,
                                                 power_iteration_int)


def _rand_scatter(d=64, n=400, seed=7):
    rng = np.random.default_rng(seed)
    m = np.round(rng.normal(size=(n, d)) * 1000).astype(np.int64)
    # plant a dominant direction so the spectrum has a clear top
    m[:, 0] += np.round(rng.normal(size=n) * 4000).astype(np.int64)
    return m.T @ m


def test_power_iteration_matches_eigh_direction():
    g = _rand_scatter()
    w = power_iteration_int(g).astype(np.float64)
    evals, evecs = np.linalg.eigh(g.astype(np.float64))
    top = evecs[:, -1]
    cos = abs(w @ top) / (np.linalg.norm(w) * np.linalg.norm(top))
    assert cos > 0.9999


def test_power_iteration_partition_independent():
    """Pure function of G: same matrix in, bit-same vector out."""
    g = _rand_scatter(seed=11)
    assert np.array_equal(power_iteration_int(g), power_iteration_int(g))


def _collect_scatter(df, d=64):
    g = np.zeros((d, d), np.int64)
    for r in df.collect():
        g[r["i"], r["j"]] = r["g"]
        g[r["j"], r["i"]] = r["g"]
    return g


def test_mnf_transform_driver_completion(spark, sf_dir):
    """Full MNF over the engine scatters: solve the generalized
    eigenproblem N^-1 S and verify the leading component has higher
    signal-to-noise (Rayleigh quotient) than the trailing one —
    the defining MNF property (imagecalc/__init__.py:715)."""
    import os

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    s = _collect_scatter(gram_matrix(emb)).astype(np.float64)
    n = _collect_scatter(mnf_noise_gram(emb)).astype(np.float64)
    # regularize: the noise scatter of a short table may be rank-deficient
    n += np.eye(64) * max(1.0, np.trace(n) * 1e-9)
    ln = np.linalg.cholesky(n)
    w = np.linalg.solve(ln, np.linalg.solve(ln, s).T)
    evals, evecs = np.linalg.eigh((w + w.T) / 2.0)
    v_hi = np.linalg.solve(ln.T, evecs[:, -1])
    v_lo = np.linalg.solve(ln.T, evecs[:, 0])

    def snr(v):
        return (v @ s @ v) / (v @ n @ v)

    assert snr(v_hi) > snr(v_lo)
    assert snr(v_hi) == pytest.approx(evals[-1], rel=1e-6)


def test_pca_projection_variance_dominates(spark, sf_dir):
    """The engine's pc1 captures more variance than a raw coordinate:
    projection onto the power-iteration vector beats projecting onto
    axis 0 (sanity that the component is data-driven, not a fixed
    axis)."""
    import os

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    rows = pca_project_dominant(emb).collect()
    assert len(rows) == emb.count()
    p = np.array([r["pc1"] for r in rows], np.float64)
    m = np.stack([np.round(np.asarray(r["embedding"], np.float64) * 1000)
                  for r in emb.collect()])
    g = m.T @ m
    w = power_iteration_int(g).astype(np.float64)
    wn = w / np.linalg.norm(w)
    var_pc1 = np.var(p / np.linalg.norm(w))
    var_best_axis = np.var(m, axis=0).max()
    # pc1 variance equals the Rayleigh quotient of wn -- must be >= any
    # single axis when the iteration converged to the top eigenvector
    assert var_pc1 >= 0.99 * var_best_axis
