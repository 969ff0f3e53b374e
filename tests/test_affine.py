"""Affine model tests: golden parity with the torch reference closed-form
fits (all versions x logdet), shoot trajectory, backward inverse, masking."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from difficp_tpu.models import affine

GOLD = os.path.join(os.path.dirname(__file__), "goldens", "affine.npz")
G = np.load(GOLD)

X = jnp.asarray(G["x"])
Y = jnp.asarray(G["y"])
Z = jnp.asarray(G["z"])
W = jnp.asarray(G["w"])


@pytest.mark.parametrize("version", ["rigid", "similarity", "general_affine", "translation"])
@pytest.mark.parametrize("withlogdet", [False, True])
def test_optimize_matches_reference(version, withlogdet):
    cfg = affine.AffineConfig(version=version, withlogdet=withlogdet)
    fit = affine.optimize(cfg, X, Y, Z, W)
    tag = f"{version}_{'ld' if withlogdet else 'nold'}"
    np.testing.assert_allclose(fit.m, G[f"{tag}_M"], rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(fit.t, G[f"{tag}_t"], rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(float(fit.datal), float(G[f"{tag}_datal"]), rtol=2e-3)
    np.testing.assert_allclose(
        float(fit.regl), float(G[f"{tag}_regl"]), rtol=2e-3, atol=2e-4
    )


def test_shoot_matches_reference():
    cfg = affine.AffineConfig(version="rigid", withlogdet=True, nt=5)
    traj = affine.shoot(cfg, jnp.asarray(G["shoot_M"]), jnp.asarray(G["shoot_t"]),
                        X[:10])
    got = np.stack(traj)
    np.testing.assert_allclose(got, G["shoot_traj"], rtol=1e-3, atol=1e-4)


def test_backward_inverts_apply():
    cfg = affine.AffineConfig(version="general_affine", withlogdet=False)
    fit = affine.optimize(cfg, X, Y, Z)
    back = affine.backward(fit.m, fit.t, fit.tx)
    np.testing.assert_allclose(back, X, rtol=1e-3, atol=1e-4)


def test_masked_fit_equals_subset():
    rng = np.random.default_rng(0)
    mask = (rng.uniform(size=X.shape[0]) > 0.3).astype(np.float32)
    idx = np.nonzero(mask)[0]
    cfg = affine.AffineConfig(version="similarity", withlogdet=True)
    fit_m = affine.optimize(cfg, X, Y, Z, W, mask=jnp.asarray(mask))
    fit_s = affine.optimize(cfg, X[idx], Y[idx], Z[idx], W[idx])
    np.testing.assert_allclose(fit_m.m, fit_s.m, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(fit_m.t, fit_s.t, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(float(fit_m.datal), float(fit_s.datal), rtol=1e-4)


def test_rigid_recovers_rotation():
    th = 0.3
    rot = np.array(
        [[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]], np.float32
    )
    y = X @ rot.T + np.array([1.0, 2.0], np.float32)
    cfg = affine.AffineConfig(version="rigid", withlogdet=False)
    fit = affine.optimize(cfg, X, jnp.asarray(y), jnp.ones(X.shape[0]))
    np.testing.assert_allclose(fit.m, rot, atol=1e-5)
    np.testing.assert_allclose(fit.t, [1.0, 2.0], atol=1e-5)
    assert float(fit.datal) < 1e-6
