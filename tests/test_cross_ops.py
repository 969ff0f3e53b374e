"""Cross-set Pallas custom-VJP ops (the ring-rotation bodies): values and
both-side gradients vs the blockwise reference, and the pallas-backed ring
reductions on the virtual CPU mesh (interpret mode)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import PartitionSpec as P

from difficp_tpu.ops import backend as backend_mod
from difficp_tpu.ops import blockwise as B
from difficp_tpu.ops.pallas_reductions import (
    make_hamiltonian_cross,
    make_rhs_cross,
    make_rhs_xcross,
)

rng = np.random.default_rng(11)
M, N, NX, D = 190, 140, 110, 2
QR = jnp.asarray(rng.normal(size=(M, D)).astype(np.float32) + 1.5)
PR_ = jnp.asarray(rng.normal(size=(M, D)).astype(np.float32) * 0.4)
MR = jnp.asarray((rng.uniform(size=M) > 0.2).astype(np.float32))
QC = jnp.asarray(rng.normal(size=(N, D)).astype(np.float32) + 1.5)
PC = jnp.asarray(rng.normal(size=(N, D)).astype(np.float32) * 0.4)
MC = jnp.asarray((rng.uniform(size=N) > 0.2).astype(np.float32))
X = jnp.asarray(rng.normal(size=(NX, D)).astype(np.float32) + 1.5)
MX = jnp.asarray((rng.uniform(size=NX) > 0.2).astype(np.float32))
GV = jnp.asarray(rng.normal(size=(M, D)).astype(np.float32))
GG = jnp.asarray(rng.normal(size=(M, D)).astype(np.float32))
GX = jnp.asarray(rng.normal(size=(NX, D)).astype(np.float32))
SIG = 0.6


def _bw_cross(qr, pr, qc, pc, eta, withlogdet):
    # blockwise public cross (row-masked like the pallas op)
    return B.lddmm_rhs_cross(qr, pr, qc, pc, SIG, eta, withlogdet,
                             MR, MC, tile=64)


@pytest.mark.parametrize("eta", [0.0, 0.3])
@pytest.mark.parametrize("withlogdet", [False, True])
def test_rhs_cross_value_and_grads(eta, withlogdet, monkeypatch):
    import difficp_tpu.ops.pallas_reductions as PRmod

    monkeypatch.setattr(PRmod, "_MM_MODE", "highest")
    op = make_rhs_cross(SIG, eta, withlogdet, ti=64, tj=64)
    vq, mgq, dc = op(QR, PR_, MR, QC, PC, MC)
    vq_b, mgq_b, dc_b = _bw_cross(QR, PR_, QC, PC, eta, withlogdet)
    np.testing.assert_allclose(np.asarray(vq), np.asarray(vq_b),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(mgq), np.asarray(mgq_b),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(float(dc), float(dc_b), rtol=1e-3, atol=1e-4)

    def loss(fn):
        def f(qr, pr, qc, pc):
            vq, mgq, dc = fn(qr, pr, qc, pc)
            return jnp.sum(vq * GV) + jnp.sum(mgq * GG) + 2.0 * dc
        return f

    g_p = jax.grad(loss(lambda qr, pr, qc, pc: op(qr, pr, MR, qc, pc, MC)),
                   argnums=(0, 1, 2, 3))(QR, PR_, QC, PC)
    g_b = jax.grad(
        loss(lambda qr, pr, qc, pc: _bw_cross(qr, pr, qc, pc, eta,
                                              withlogdet)),
        argnums=(0, 1, 2, 3),
    )(QR, PR_, QC, PC)
    tol = dict(rtol=1e-2, atol=1e-2)
    for a, b in zip(g_p, g_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), **tol)


@pytest.mark.parametrize("eta", [0.0, 0.3])
def test_rhs_xcross_value_and_grads(eta, monkeypatch):
    import difficp_tpu.ops.pallas_reductions as PRmod

    monkeypatch.setattr(PRmod, "_MM_MODE", "highest")
    op = make_rhs_xcross(SIG, eta, True, ti=64, tj=64)
    vx, dc = op(X, MX, QC, PC, MC)

    def bw(x, qc, pc):
        vx, dc = B._rhs_ext_blockwise(x, qc, pc, MC, MX, SIG, eta, True, 64)
        return vx * MX[:, None], dc  # pallas op row-masks vx

    vx_b, dc_b = bw(X, QC, PC)
    np.testing.assert_allclose(np.asarray(vx), np.asarray(vx_b),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(float(dc), float(dc_b), rtol=1e-3, atol=1e-4)

    def loss(fn):
        def f(x, qc, pc):
            vx, dc = fn(x, qc, pc)
            return jnp.sum(vx * GX) + 2.0 * dc
        return f

    g_p = jax.grad(loss(lambda x, qc, pc: op(x, MX, qc, pc, MC)),
                   argnums=(0, 1, 2))(X, QC, PC)
    g_b = jax.grad(loss(bw), argnums=(0, 1, 2))(X, QC, PC)
    for a, b in zip(g_p, g_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-2, atol=1e-2)


@pytest.mark.parametrize("eta", [0.0, 0.3])
def test_hamiltonian_cross_value_and_grads(eta, monkeypatch):
    import difficp_tpu.ops.pallas_reductions as PRmod

    monkeypatch.setattr(PRmod, "_MM_MODE", "highest")
    op = make_hamiltonian_cross(SIG, eta, ti=64, tj=64)
    h = op(QR, PR_, MR, QC, PC, MC)
    h_b = B.hamiltonian_cross(QR, PR_, QC, PC, SIG, eta, MR, MC, tile=64)
    np.testing.assert_allclose(float(h), float(h_b), rtol=1e-4, atol=1e-5)

    g_p = jax.grad(lambda qr, pr, qc, pc: op(qr, pr, MR, qc, pc, MC),
                   argnums=(0, 1, 2, 3))(QR, PR_, QC, PC)
    g_b = jax.grad(
        lambda qr, pr, qc, pc: B.hamiltonian_cross(qr, pr, qc, pc, SIG,
                                                   eta, MR, MC, tile=64),
        argnums=(0, 1, 2, 3),
    )(QR, PR_, QC, PC)
    for a, b in zip(g_p, g_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-2, atol=1e-2)


def test_ring_pallas_matches_blockwise_ring():
    """Forced-pallas ring reductions == blockwise ring == dense, on the
    virtual 8-device CPU mesh (interpret mode), incl. reverse mode."""
    from difficp_tpu.ops import reductions as R
    from difficp_tpu.parallel.atlas import make_mesh
    from difficp_tpu.parallel.ring import ring_rhs_self

    mesh = make_mesh(8, axis="points")
    m = 8 * 24
    rng2 = np.random.default_rng(5)
    q = jnp.asarray(rng2.normal(size=(m, 2)).astype(np.float32))
    p = jnp.asarray(rng2.normal(size=(m, 2)).astype(np.float32) * 0.3)
    mask = jnp.asarray((rng2.uniform(size=m) > 0.15).astype(np.float32))
    p = p * mask[:, None]
    sig = 0.5

    def run():
        fn = jax.jit(
            jax.shard_map(
                lambda q_, p_, mk: ring_rhs_self(q_, p_, mk, sig, True,
                                                 "points", eta=0.0,
                                                 tile=16),
                mesh=mesh,
                in_specs=(P("points"),) * 3,
                out_specs=(P("points"), P("points"), P()),
                check_vma=False,
            )
        )
        return fn(q, p, mask)

    backend_mod.set_backend("pallas")
    try:
        vq, mgq, dc = run()
    finally:
        backend_mod.set_backend(None)
    vq_d, mgq_d, dc_d = R.lddmm_rhs_self(q, p, sig, 0.0, True, mask)
    np.testing.assert_allclose(np.asarray(vq), np.asarray(vq_d),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(mgq), np.asarray(mgq_d),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(float(dc), float(dc_d), rtol=1e-3, atol=1e-4)

    # reverse mode through the ring scan + ppermute with the pallas body
    def loss_ring(p_):
        backend_mod.set_backend("pallas")
        try:
            fn = jax.shard_map(
                lambda q_, pp, mk: ring_rhs_self(q_, pp, mk, sig, True,
                                                 "points", eta=0.0,
                                                 tile=16),
                mesh=mesh,
                in_specs=(P("points"),) * 3,
                out_specs=(P("points"), P("points"), P()),
                check_vma=False,
            )
            vq, mgq, dc = fn(q, p_, mask)
        finally:
            backend_mod.set_backend(None)
        return jnp.sum(vq**2) + jnp.sum(mgq * vq) + 2.0 * dc

    def loss_dense(p_):
        vq, mgq, dc = R.lddmm_rhs_self(q, p_, sig, 0.0, True, mask)
        return jnp.sum(vq**2) + jnp.sum(mgq * vq) + 2.0 * dc

    g_ring = jax.grad(loss_ring)(p)
    g_dense = jax.grad(loss_dense)(p)
    np.testing.assert_allclose(np.asarray(g_ring), np.asarray(g_dense),
                               rtol=2e-3, atol=5e-3)
