"""Scalable prior sampling: random_p version='rff_cg' (r4).

The reference's random_p (LDDMM.py:257-280) materializes the (M, M) Gram
matrix and takes an SVD/Cholesky root — impossible at large M.  The rff_cg
path samples the SAME distribution as version='ridge'
(Cov(p) = (K + alpha I)^{-1} / lambda) via pathwise sampling: an O(M * F)
random-Fourier-feature draw u ~ N(0, K + alpha I) followed by a matrix-free
CG ridge solve.  These tests pin (1) the RFF covariance approximation,
(2) the end-to-end sample covariance against the dense ridge law,
(3) masking, and (4) the dispatch/guard contract.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from difficp_tpu.models import lddmm
from difficp_tpu.ops import backend as red
from difficp_tpu.ops.solvers import rff_gaussian_field


def _gram(q, sigma):
    d2 = np.sum((q[:, None, :] - q[None, :, :]) ** 2, axis=-1)
    return np.exp(-d2 / (2.0 * sigma**2))


def test_rff_field_covariance_matches_gram():
    # empirical covariance over many independent fields ~= K, with the
    # O(1/sqrt(F)) feature bias + O(1/sqrt(S)) sampling error
    rng = np.random.default_rng(0)
    m, sigma = 48, 0.35
    q = jnp.asarray(rng.uniform(0, 1, size=(m, 2)), jnp.float32)
    n_samples, n_feat = 4096, 4096

    draw = jax.jit(lambda k: rff_gaussian_field(q, sigma, k, 1, n_feat)[:, 0])
    keys = jax.random.split(jax.random.PRNGKey(1), n_samples)
    f = jax.vmap(draw)(keys)  # (S, M)
    cov = np.asarray(f).T @ np.asarray(f) / n_samples
    k_true = _gram(np.asarray(q), sigma)
    err = np.abs(cov - k_true).max()
    assert err < 0.12, f"max |cov - K| = {err}"
    # and the mean is zero
    assert np.abs(np.asarray(f).mean(0)).max() < 0.1


def test_random_p_rff_cg_matches_ridge_covariance():
    # end to end: Cov(p_col) ~= (K + alpha I)^{-1} / lambda, the same law
    # version='ridge' samples by Cholesky
    rng = np.random.default_rng(1)
    m, sigma, alpha, lam = 40, 0.4, 0.05, 2.0
    q = jnp.asarray(rng.uniform(0, 1, size=(m, 2)), jnp.float32)
    cfg = lddmm.make_config(sigma=sigma, lambd=lam, version="classic", nt=5)

    n_samples = 4096
    draw = jax.jit(lambda k: lddmm.random_p(
        cfg, q, k, alpha=alpha, version="rff_cg", n_features=4096))
    keys = jax.random.split(jax.random.PRNGKey(2), n_samples)
    p = np.asarray(jax.vmap(draw)(keys))  # (S, M, 2)
    cols = p.transpose(2, 0, 1).reshape(-1, m)  # both dims are iid draws
    cov = cols.T @ cols / cols.shape[0]

    k_true = _gram(np.asarray(q), sigma)
    cov_true = np.linalg.inv(k_true + alpha * np.eye(m)) / lam
    # normalized by the law's own scale (entries of cov_true reach ~1/alpha)
    rel = np.abs(cov - cov_true).max() / np.abs(cov_true).max()
    assert rel < 0.08, f"relative covariance error = {rel}"


def test_random_p_rff_cg_masked_rows_zero_and_finite():
    rng = np.random.default_rng(2)
    m = 32
    q = jnp.asarray(rng.uniform(0, 1, size=(m, 2)), jnp.float32)
    mask = jnp.asarray((np.arange(m) < 20), jnp.float32)
    cfg = lddmm.make_config(sigma=0.3, lambd=5.0, version="classic", nt=5)
    p = lddmm.random_p(cfg, q, jax.random.PRNGKey(3), alpha=0.05,
                       version="rff_cg", qmask=mask, n_features=512)
    p = np.asarray(p)
    assert np.all(np.isfinite(p))
    assert np.all(p[20:] == 0.0)
    assert np.abs(p[:20]).max() > 0.0


def test_random_p_large_m_dispatch(monkeypatch):
    # above the dense pair limit: 'ridge' auto-routes to rff_cg (no dense
    # (M, M) anywhere), 'svd' raises with an actionable message
    rng = np.random.default_rng(3)
    m = 64
    q = jnp.asarray(rng.uniform(0, 1, size=(m, 2)), jnp.float32)
    cfg = lddmm.make_config(sigma=0.3, lambd=2.0, version="classic", nt=5)
    monkeypatch.setattr(red, "DENSE_PAIR_LIMIT", 100)  # force "large M"

    p = lddmm.random_p(cfg, q, jax.random.PRNGKey(4), alpha=0.05,
                       version="ridge", n_features=256)
    assert np.all(np.isfinite(np.asarray(p))) and p.shape == (m, 2)

    with pytest.raises(ValueError, match="rff_cg"):
        lddmm.random_p(cfg, q, jax.random.PRNGKey(4), version="svd")


def test_random_p_ridge_reroute_warns(monkeypatch):
    # the silent distribution swap (ridge -> rff_cg above the pair limit)
    # must be visible to the caller (ADVICE r4)
    rng = np.random.default_rng(5)
    q = jnp.asarray(rng.uniform(0, 1, size=(64, 2)), jnp.float32)
    cfg = lddmm.make_config(sigma=0.3, lambd=2.0, version="classic", nt=5)
    monkeypatch.setattr(red, "DENSE_PAIR_LIMIT", 100)
    with pytest.warns(UserWarning, match="rff_cg"):
        lddmm.random_p(cfg, q, jax.random.PRNGKey(0), alpha=0.05,
                       version="ridge", n_features=128)
