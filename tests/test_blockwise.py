"""Blockwise (tiled) reductions must match the dense backend, values and
gradients — the dual-backend oracle of the reference (SURVEY §4.2)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from difficp_tpu.ops import blockwise as B
from difficp_tpu.ops import reductions as R

rng = np.random.default_rng(0)
M, N, D = 130, 70, 2  # deliberately not multiples of the tile
Q = jnp.asarray(rng.normal(size=(M, D)).astype(np.float32))
P = jnp.asarray(rng.normal(size=(M, D)).astype(np.float32) * 0.3)
X = jnp.asarray(rng.normal(size=(N, D)).astype(np.float32))
MASKQ = jnp.asarray((rng.uniform(size=M) > 0.2).astype(np.float32))
MASKX = jnp.asarray((rng.uniform(size=N) > 0.2).astype(np.float32))
SIG = 0.6


@pytest.mark.parametrize("eta", [0.0, 0.4])
@pytest.mark.parametrize("withlogdet", [False, True])
def test_rhs_self_matches_dense(eta, withlogdet):
    a = R.lddmm_rhs_self(Q, P, SIG, eta, withlogdet, MASKQ)
    b = B.lddmm_rhs_self(Q, P, SIG, eta, withlogdet, MASKQ, tile=32)
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), rtol=1e-4,
                                   atol=1e-5)


@pytest.mark.parametrize("eta", [0.0, 0.4])
def test_rhs_ext_matches_dense(eta):
    a = R.lddmm_rhs_ext(Q, P, X, SIG, eta, True, MASKQ, MASKX)
    b = B.lddmm_rhs_ext(Q, P, X, SIG, eta, True, MASKQ, MASKX, tile=32)
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), rtol=1e-4,
                                   atol=1e-5)


def test_gradients_match_dense():
    def loss_dense(p):
        vq, mgq, dc = R.lddmm_rhs_self(Q, p, SIG, 0.0, True, MASKQ)
        return jnp.sum(vq**2) + jnp.sum(mgq * vq) + dc

    def loss_block(p):
        vq, mgq, dc = B.lddmm_rhs_self(Q, p, SIG, 0.0, True, MASKQ, tile=32)
        return jnp.sum(vq**2) + jnp.sum(mgq * vq) + dc

    g1 = jax.grad(loss_dense)(P)
    g2 = jax.grad(loss_block)(P)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-3,
                               atol=1e-4)

    def loss_dense_q(q):
        vq, mgq, dc = R.lddmm_rhs_self(q, P, SIG, 0.3, True, MASKQ)
        return jnp.sum(vq**2) + dc

    def loss_block_q(q):
        vq, mgq, dc = B.lddmm_rhs_self(q, P, SIG, 0.3, True, MASKQ, tile=32)
        return jnp.sum(vq**2) + dc

    g1 = jax.grad(loss_dense_q)(Q)
    g2 = jax.grad(loss_block_q)(Q)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-3,
                               atol=1e-4)


def test_v_field_matches():
    a = R.v_field(X, Q, P, SIG, 0.4, MASKQ)
    b = B.v_field(X, Q, P, SIG, 0.4, MASKQ, tile=32)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4,
                               atol=1e-5)
