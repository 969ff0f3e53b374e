"""Parity tests for the eta != 0 (gradcomponent) large-scale paths added in
round 2: pallas fwd kernels with the gradcomponent terms, blockwise
hamiltonian, CG ridge solve, v2p dispatch."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from difficp_tpu.models import lddmm as lddmm_mod
from difficp_tpu.ops import backend as backend_mod
from difficp_tpu.ops import blockwise as block
from difficp_tpu.ops import reductions as dense
from difficp_tpu.ops.pallas_reductions import make_rhs_ext, make_rhs_self
from difficp_tpu.ops.solvers import kridge_solve, kridge_solve_cg


@pytest.fixture(autouse=True)
def _reset_backend():
    yield
    backend_mod.set_backend(None)


def data(m, d=2, seed=0):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.normal(size=(m, d)).astype(np.float32))
    p = jnp.asarray(rng.normal(size=(m, d)).astype(np.float32) * 0.3)
    mask = jnp.asarray((rng.uniform(size=m) > 0.2).astype(np.float32))
    return q, p * mask[:, None], mask


SIGMA = 0.5
ETA = 0.07


@pytest.mark.parametrize("withlogdet", [False, True])
@pytest.mark.parametrize("d", [2, 3])
def test_pallas_self_eta_matches_dense(withlogdet, d):
    q, p, mask = data(130, d, seed=1)
    op = make_rhs_self(SIGMA, ETA, withlogdet, ti=64, tj=64)
    vq, mgq, dc = op(q, p, mask)
    vq_d, mgq_d, dc_d = dense.lddmm_rhs_self(q, p, SIGMA, ETA, withlogdet, mask)
    np.testing.assert_allclose(np.asarray(vq), np.asarray(vq_d), rtol=2e-4,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(mgq), np.asarray(mgq_d), rtol=2e-4,
                               atol=1e-5)
    np.testing.assert_allclose(float(dc), float(dc_d), rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("withlogdet", [False, True])
def test_pallas_ext_eta_matches_dense(withlogdet):
    q, p, mq = data(70, 2, seed=2)
    x, _, mx = data(150, 2, seed=3)
    op = make_rhs_ext(SIGMA, ETA, withlogdet, ti=64, tj=64)
    vq, mgq, dc, vx = op(q, p, x, mq, mx)
    vq_d, mgq_d, dc_d, vx_d = dense.lddmm_rhs_ext(
        q, p, x, SIGMA, ETA, withlogdet, mq, mx
    )
    np.testing.assert_allclose(np.asarray(vq), np.asarray(vq_d), rtol=2e-4,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(mgq), np.asarray(mgq_d), rtol=2e-4,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(vx), np.asarray(vx_d), rtol=2e-4,
                               atol=1e-5)
    np.testing.assert_allclose(float(dc), float(dc_d), rtol=1e-4, atol=1e-5)


def test_pallas_self_eta_grad_matches_dense():
    """The eta != 0 backward agrees with autograd through the dense
    implementation: to the split3 monomial-cancellation floor on the
    default "fast" path (generated payload-matmul kernels, r3), and to f32
    exactness with the "accurate" knob (blockwise VJP)."""
    from difficp_tpu.ops.pallas_reductions import set_bwd_precision

    q, p, mask = data(60, 2, seed=4)
    op = make_rhs_self(SIGMA, ETA, True, ti=32, tj=32)

    def loss_pallas(q_, p_):
        vq, mgq, dc = op(q_, p_, mask)
        return jnp.sum(vq**2) + jnp.sum(mgq * q_) + dc

    def loss_dense(q_, p_):
        vq, mgq, dc = dense.lddmm_rhs_self(q_, p_, SIGMA, ETA, True, mask)
        return jnp.sum(vq**2) + jnp.sum(mgq * q_) + dc

    gq_d, gp_d = jax.grad(loss_dense, argnums=(0, 1))(q, p)

    gq_p, gp_p = jax.grad(loss_pallas, argnums=(0, 1))(q, p)
    np.testing.assert_allclose(np.asarray(gq_p), np.asarray(gq_d),
                               rtol=3e-2, atol=3e-2)
    np.testing.assert_allclose(np.asarray(gp_p), np.asarray(gp_d),
                               rtol=3e-2, atol=3e-2)

    set_bwd_precision("accurate")
    try:
        gq_a, gp_a = jax.grad(loss_pallas, argnums=(0, 1))(q, p)
    finally:
        set_bwd_precision("fast")
    np.testing.assert_allclose(np.asarray(gq_a), np.asarray(gq_d),
                               rtol=5e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gp_a), np.asarray(gp_d),
                               rtol=5e-4, atol=1e-4)


@pytest.mark.parametrize("eta", [0.0, ETA])
def test_blockwise_hamiltonian_matches_dense(eta):
    q, p, mask = data(140, 2, seed=5)
    got = block.hamiltonian(q, p, SIGMA, eta, mask, tile=32)
    want = dense.hamiltonian(q, p, SIGMA, eta, mask)
    np.testing.assert_allclose(float(got), float(want), rtol=1e-5)
    # and through the backend when blockwise is forced
    backend_mod.set_backend("blockwise")
    got_b = backend_mod.hamiltonian(q, p, SIGMA, eta, mask)
    np.testing.assert_allclose(float(got_b), float(want), rtol=1e-5)


def test_blockwise_hamiltonian_grad():
    q, p, mask = data(80, 2, seed=6)
    gd = jax.grad(lambda pp: dense.hamiltonian(q, pp, SIGMA, ETA, mask))(p)
    gb = jax.grad(lambda pp: block.hamiltonian(q, pp, SIGMA, ETA, mask,
                                               tile=32))(p)
    np.testing.assert_allclose(np.asarray(gb), np.asarray(gd), rtol=1e-4,
                               atol=1e-6)


def test_blockwise_kred_gradkred_match_dense():
    q, p, mask = data(90, 2, seed=7)
    x, _, _ = data(50, 2, seed=8)
    np.testing.assert_allclose(
        np.asarray(block.kred(x, q, p, SIGMA, mask, tile=32)),
        np.asarray(dense.kred(x, q, p, SIGMA, mask)), rtol=1e-5, atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(block.grad_kred(x, q, SIGMA, mask, tile=32)),
        np.asarray(dense.grad_kred(x, q, SIGMA, mask)), rtol=1e-5, atol=1e-6,
    )


def test_cg_ridge_matches_direct():
    from difficp_tpu.ops.solvers import _masked_gram

    q, _, mask = data(120, 2, seed=9)
    rng = np.random.default_rng(10)
    v = jnp.asarray(rng.normal(size=(120, 2)).astype(np.float32))
    v = v * mask[:, None]
    direct = kridge_solve(q, v, SIGMA, alpha=1e-2, mask=mask)
    cg = kridge_solve_cg(q, v, SIGMA, alpha=1e-2, mask=mask, tol=1e-10,
                         maxiter=500, tile=32)
    # both solve (K + alpha I) b = v to f32 residual; the ill conditioning
    # (1/alpha) amplifies residual noise into solution noise, so compare
    # residuals tightly and solutions loosely
    k = _masked_gram(q, SIGMA, mask, diag_boost=1e-2)
    res_cg = float(jnp.max(jnp.abs(k @ cg - v)))
    assert res_cg < 5e-3
    scale = float(jnp.max(jnp.abs(direct)))
    np.testing.assert_allclose(np.asarray(cg), np.asarray(direct), rtol=2e-2,
                               atol=1e-3 * scale)


def test_v2p_large_m_uses_cg(monkeypatch):
    monkeypatch.setattr(backend_mod, "DENSE_PAIR_LIMIT", 100)
    cfg = lddmm_mod.make_config(sigma=SIGMA, lambd=10.0, gradcomponent=True,
                                withlogdet=False, nt=3)
    q, _, mask = data(64, 2, seed=11)
    v0 = jnp.zeros_like(q)
    p = lddmm_mod.v2p(cfg, q, v0, qmask=mask, alpha=1e-3)
    # v(q) ~= 0 at the solution: the gradcomponent makes p nonzero
    vq = lddmm_mod.v(cfg, q, q, p, mask) * mask[:, None]
    assert float(jnp.max(jnp.abs(p))) > 0
    assert float(jnp.max(jnp.abs(vq))) < 0.05


def test_eta_shoot_monotone_blockwise():
    """A small gradcomponent registration runs and decreases monotonically
    with the tiled backends forced (the 65k-on-TPU path, shrunk)."""
    from difficp_tpu.models.psr import DiffPSR
    from difficp_tpu.models import gmm as gmm_mod
    import os

    spiral = np.load(os.path.join(os.path.dirname(__file__), "goldens",
                                  "spiral.npz"))
    x = [spiral[f"x{k}"] for k in range(2)]
    state, gcfg = gmm_mod.create(jnp.asarray(spiral["mu0"]), sigma=0.1)
    lcfg = lddmm_mod.make_config(sigma=0.2, lambd=500.0, version="logdet",
                                 nt=5, scheme="Euler")
    assert lcfg.eta != 0.0
    backend_mod.set_backend("blockwise")
    psr = DiffPSR(x, state, gcfg, lcfg)
    psr.printstuff = False
    for _ in range(2):
        psr.GMM_opt(max_iterations=5, tol=1e-4)
        psr.Reg_opt(tol=1e-3, nmax=1)
    assert psr.fe_increase_events == 0
