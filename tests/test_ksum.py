"""Generic payload-matmul kernel-sum family (ops/pallas_ksum.py): values and
custom-VJP gradients vs the dense jnp reference (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from difficp_tpu.ops import blockwise as B
from difficp_tpu.ops import reductions as R
from difficp_tpu.ops.pallas_ksum import (
    grad_kred_mm,
    kred_mm,
    kred_scal_mm,
    make_hamiltonian,
    make_v_field,
    pairwise_ksum,
)

rng = np.random.default_rng(7)
NX, NY, D = 210, 330, 2
SIG = 0.55
X = jnp.asarray(rng.normal(size=(NX, D)).astype(np.float32) + 3.0)
Y = jnp.asarray(rng.normal(size=(NY, D)).astype(np.float32) + 3.0)
BV = jnp.asarray(rng.normal(size=(NY, 3)).astype(np.float32))
MY = jnp.asarray((rng.uniform(size=NY) > 0.25).astype(np.float32))
MX = jnp.asarray((rng.uniform(size=NX) > 0.25).astype(np.float32))


def _dense_ksum(x, y, payloads, sigma, mask_y):
    d2 = jnp.sum((x[:, None, :] - y[None, :, :]) ** 2, axis=-1)
    k = jnp.exp(-d2 / (2 * sigma**2)) * mask_y[None, :]
    return k @ payloads


def test_pairwise_ksum_matches_dense():
    pay = jnp.concatenate([BV, jnp.ones((NY, 1))], axis=1)
    got = pairwise_ksum(X, Y, pay, SIG, MY)
    want = _dense_ksum(X, Y, pay, SIG, MY)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_kred_mm_value_and_grads():
    got = kred_mm(X, Y, BV, SIG, MY)
    want = R.kred(X, Y, BV, SIG, MY)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)

    w = jnp.asarray(rng.normal(size=(NX, 3)).astype(np.float32))

    def loss(fn):
        return lambda x, y, b: jnp.sum(w * fn(x, y, b))

    g_mm = jax.grad(loss(lambda x, y, b: kred_mm(x, y, b, SIG, MY)),
                    argnums=(0, 1, 2))(X, Y, BV)
    g_dn = jax.grad(loss(lambda x, y, b: R.kred(x, y, b, SIG, MY)),
                    argnums=(0, 1, 2))(X, Y, BV)
    for a, b in zip(g_mm, g_dn):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=2e-3)


def test_kred_scal_mm_grads():
    dv = BV[:, 0]
    got = kred_scal_mm(X, Y, dv, SIG, MY)
    want = R.kred_scal(X, Y, dv, SIG, MY)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)

    w = jnp.asarray(rng.normal(size=(NX,)).astype(np.float32))

    def loss(fn):
        return lambda x, y, d: jnp.vdot(w, fn(x, y, d))

    g_mm = jax.grad(loss(lambda x, y, d: kred_scal_mm(x, y, d, SIG, MY)),
                    argnums=(0, 1, 2))(X, Y, dv)
    g_dn = jax.grad(loss(lambda x, y, d: R.kred_scal(x, y, d, SIG, MY)),
                    argnums=(0, 1, 2))(X, Y, dv)
    for a, b in zip(g_mm, g_dn):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=2e-3)


def test_grad_kred_mm_value_and_grads():
    got = grad_kred_mm(X, Y, SIG, MY)
    want = R.grad_kred(X, Y, SIG, MY)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)

    w = jnp.asarray(rng.normal(size=(NX, D)).astype(np.float32))

    def loss(fn):
        return lambda x, y: jnp.sum(w * fn(x, y))

    g_mm = jax.grad(loss(lambda x, y: grad_kred_mm(x, y, SIG, MY)),
                    argnums=(0, 1))(X, Y)
    g_dn = jax.grad(loss(lambda x, y: R.grad_kred(x, y, SIG, MY)),
                    argnums=(0, 1))(X, Y)
    for a, b in zip(g_mm, g_dn):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=2e-3)


@pytest.mark.parametrize("eta", [0.0, 0.3])
def test_hamiltonian_mm_value_and_grads(eta):
    q = jnp.asarray(rng.normal(size=(260, D)).astype(np.float32) - 2.0)
    p = jnp.asarray(rng.normal(size=(260, D)).astype(np.float32) * 0.4)
    m = jnp.asarray((rng.uniform(size=260) > 0.2).astype(np.float32))
    op = make_hamiltonian(SIG, eta)
    got = op(q, p, m)
    want = R.hamiltonian(q, p, SIG, eta, m)
    np.testing.assert_allclose(float(got), float(want), rtol=2e-4, atol=1e-4)

    g_mm = jax.grad(lambda q_, p_: op(q_, p_, m), argnums=(0, 1))(q, p)
    g_dn = jax.grad(lambda q_, p_: R.hamiltonian(q_, p_, SIG, eta, m),
                    argnums=(0, 1))(q, p)
    for a, b in zip(g_mm, g_dn):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=2e-3)


@pytest.mark.parametrize("eta", [0.0, 0.3])
def test_v_field_mm_value_and_grads(eta):
    q = jnp.asarray(rng.normal(size=(180, D)).astype(np.float32))
    p = jnp.asarray(rng.normal(size=(180, D)).astype(np.float32) * 0.4)
    m = jnp.asarray((rng.uniform(size=180) > 0.2).astype(np.float32))
    op = make_v_field(SIG, eta)
    got = op(X, q, p, m)
    want = R.v_field(X, q, p, SIG, eta, m)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)

    w = jnp.asarray(rng.normal(size=(NX, D)).astype(np.float32))
    g_mm = jax.grad(lambda x_, q_, p_: jnp.sum(w * op(x_, q_, p_, m)),
                    argnums=(0, 1, 2))(X, q, p)
    g_dn = jax.grad(
        lambda x_, q_, p_: jnp.sum(w * R.v_field(x_, q_, p_, SIG, eta, m)),
        argnums=(0, 1, 2),
    )(X, q, p)
    for a, b in zip(g_mm, g_dn):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=2e-3)


def test_ksum_3d():
    x3 = jnp.asarray(rng.normal(size=(100, 3)).astype(np.float32))
    y3 = jnp.asarray(rng.normal(size=(140, 3)).astype(np.float32))
    b3 = jnp.asarray(rng.normal(size=(140, 3)).astype(np.float32))
    m3 = jnp.asarray((rng.uniform(size=140) > 0.3).astype(np.float32))
    got = kred_mm(x3, y3, b3, SIG, m3)
    want = R.kred(x3, y3, b3, SIG, m3)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)
    g_mm = jax.grad(lambda y_: jnp.sum(kred_mm(x3, y_, b3, SIG, m3)))(y3)
    g_dn = jax.grad(lambda y_: jnp.sum(R.kred(x3, y_, b3, SIG, m3)))(y3)
    np.testing.assert_allclose(np.asarray(g_mm), np.asarray(g_dn),
                               rtol=1e-3, atol=2e-3)


def test_blockwise_mdivsum_matches_dense():
    q = jnp.asarray(rng.normal(size=(120, D)).astype(np.float32))
    p = jnp.asarray(rng.normal(size=(120, D)).astype(np.float32) * 0.4)
    mq = jnp.asarray((rng.uniform(size=120) > 0.2).astype(np.float32))
    for eta in (0.0, 0.3):
        got = B.mdivsum(X, q, p, SIG, eta, mq, MX, tile=64)
        want = R.mdivsum(X, q, p, SIG, eta, mq, MX)
        np.testing.assert_allclose(float(got), float(want), rtol=1e-4,
                                   atol=1e-4)
    # differentiable (diagnostics may grad through it)
    g_bw = jax.grad(lambda p_: B.mdivsum(X, q, p_, SIG, 0.3, mq, MX,
                                         tile=64))(p)
    g_dn = jax.grad(lambda p_: R.mdivsum(X, q, p_, SIG, 0.3, mq, MX))(p)
    np.testing.assert_allclose(np.asarray(g_bw), np.asarray(g_dn),
                               rtol=1e-4, atol=1e-4)


def test_backend_dispatch_forced_pallas():
    """set_backend('pallas') routes the standalone reductions through the
    MM ops (interpret mode here) with dense-equal results."""
    from difficp_tpu.ops import backend as red

    red.set_backend("pallas")
    try:
        np.testing.assert_allclose(
            np.asarray(red.kred_scal(X, Y, BV[:, 0], SIG, MY)),
            np.asarray(R.kred_scal(X, Y, BV[:, 0], SIG, MY)),
            rtol=2e-4, atol=2e-4,
        )
        np.testing.assert_allclose(
            float(red.hamiltonian(X, BV[:NX, :2] * 0 + 0.1, SIG, 0.0, MX)),
            float(R.hamiltonian(X, BV[:NX, :2] * 0 + 0.1, SIG, 0.0, MX)),
            rtol=2e-4, atol=1e-4,
        )
        np.testing.assert_allclose(
            np.asarray(red.grad_kred(X, Y, SIG, MY)),
            np.asarray(R.grad_kred(X, Y, SIG, MY)),
            rtol=2e-4, atol=2e-4,
        )
    finally:
        red.set_backend(None)


def test_pairwise_ksum_blocked_matches_streaming(monkeypatch):
    """The wide-table y-resident dispatch (r4) == the streaming kernel ==
    dense, including a multi-block decomposition and a wide (67-col)
    payload table with masked j points."""
    import difficp_tpu.ops.pallas_ksum as PK

    ncols = 67  # rows_out = 72 >= the (patched) width gate
    pay = jnp.asarray(rng.normal(size=(NY, ncols)).astype(np.float32))
    want = _dense_ksum(X, Y, pay, SIG, MY)
    got_stream = pairwise_ksum(X, Y, pay, SIG, MY, ti=64, tj=64)
    monkeypatch.setattr(PK, "_BLOCKED_MIN_ROWS", 8)
    monkeypatch.setattr(PK, "_BLOCKED_MIN_N", 1)
    # shrink the budget so NY=330 splits into several resident blocks
    monkeypatch.setattr(PK, "_BLOCKED_BUDGET_FLOATS", (72 + 8) * 128)
    calls = []
    orig = PK._pairwise_ksum_blocked

    def spy(*a, **k):
        calls.append(1)
        return orig(*a, **k)

    monkeypatch.setattr(PK, "_pairwise_ksum_blocked", spy)
    got_blocked = PK.pairwise_ksum(X, Y, pay, SIG, MY, ti=64, tj=64)
    assert calls, "blocked path did not dispatch"
    np.testing.assert_allclose(np.asarray(got_blocked), np.asarray(want),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(got_blocked),
                               np.asarray(got_stream), rtol=2e-4, atol=2e-4)


def test_mdivsum_mm_value_and_grads_match_dense():
    """The generated payload-matmul mdivsum (value + VJP via the ext
    backward polynomials with gv=0) matches the dense reduction and its
    autograd, both eta modes (VERDICT r4 missing item 2: the last
    reduction without an MXU path)."""
    import jax

    from difficp_tpu.ops import reductions as dense
    from difficp_tpu.ops.pallas_ksum import make_mdivsum

    rng = np.random.default_rng(3)
    nq, nx, d = 96, 150, 2
    q = jnp.asarray(rng.normal(size=(nq, d)) + 3.0, jnp.float32)
    p = jnp.asarray(rng.normal(size=(nq, d)), jnp.float32) * 0.3
    x = jnp.asarray(rng.normal(size=(nx, d)) + 3.0, jnp.float32)
    mq = jnp.asarray(rng.random(nq) < 0.9, jnp.float32)
    mx = jnp.asarray(rng.random(nx) < 0.9, jnp.float32)

    for eta in (0.0, 0.5):
        op = make_mdivsum(0.4, eta)
        val = float(op(x, q, p, mq, mx))
        ref = float(dense.mdivsum(x, q, p, 0.4, eta, mq, mx))
        np.testing.assert_allclose(val, ref, rtol=2e-4, atol=1e-4)

        g_mm = jax.grad(lambda xx, qq, pp: op(xx, qq, pp, mq, mx),
                        argnums=(0, 1, 2))(x, q, p)
        g_ref = jax.grad(
            lambda xx, qq, pp: dense.mdivsum(xx, qq, pp, 0.4, eta, mq, mx),
            argnums=(0, 1, 2))(x, q, p)
        # measured f32 monomial-expansion floor (CPU interpret): rel
        # 6e-5 (eta=0) / 5.7e-4 (eta!=0, d2^2 monomials) of the max
        # gradient magnitude
        for a, b in zip(g_mm, g_ref):
            scale = float(np.max(np.abs(np.asarray(b)))) + 1e-30
            np.testing.assert_allclose(np.asarray(a) / scale,
                                       np.asarray(b) / scale,
                                       atol=2e-3)
