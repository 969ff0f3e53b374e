"""Pallas fused-RHS kernel parity vs dense/blockwise backends (interpret
mode on CPU; compiled on TPU), values and custom-VJP gradients."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from difficp_tpu.ops import reductions as R
from difficp_tpu.ops.pallas_reductions import make_rhs_self

rng = np.random.default_rng(0)
M, D = 300, 2
Q = jnp.asarray(rng.normal(size=(M, D)).astype(np.float32))
P = jnp.asarray(rng.normal(size=(M, D)).astype(np.float32) * 0.3)
MASK = jnp.asarray((rng.uniform(size=M) > 0.2).astype(np.float32))
SIG = 0.6


@pytest.mark.parametrize("withlogdet", [False, True])
def test_pallas_rhs_matches_dense(withlogdet):
    op = make_rhs_self(SIG, 0.0, withlogdet, ti=64, tj=64)
    vq, mgq, dc = op(Q, P, MASK)
    vq_d, mgq_d, dc_d = R.lddmm_rhs_self(Q, P, SIG, 0.0, withlogdet, MASK)
    np.testing.assert_allclose(np.asarray(vq), np.asarray(vq_d), rtol=1e-4,
                               atol=5e-5)
    np.testing.assert_allclose(np.asarray(mgq), np.asarray(mgq_d), rtol=1e-4,
                               atol=5e-5)
    np.testing.assert_allclose(float(dc), float(dc_d), rtol=1e-3, atol=1e-4)


def test_pallas_rhs_3d():
    q3 = jnp.asarray(rng.normal(size=(100, 3)).astype(np.float32))
    p3 = jnp.asarray(rng.normal(size=(100, 3)).astype(np.float32))
    m3 = jnp.ones(100, jnp.float32)
    op = make_rhs_self(SIG, 0.0, True, ti=32, tj=32)
    vq, mgq, dc = op(q3, p3, m3)
    vq_d, mgq_d, dc_d = R.lddmm_rhs_self(q3, p3, SIG, 0.0, True, m3)
    np.testing.assert_allclose(np.asarray(vq), np.asarray(vq_d), rtol=1e-4,
                               atol=5e-5)
    np.testing.assert_allclose(float(dc), float(dc_d), rtol=1e-3, atol=1e-4)


def test_pallas_custom_vjp_matches_dense_grad():
    op = make_rhs_self(SIG, 0.0, True, ti=64, tj=64)

    def loss_p(fn):
        def f(q, p):
            vq, mgq, dc = fn(q, p, MASK)
            return jnp.sum(vq**2) + jnp.sum(mgq * vq) + 2.0 * dc
        return f

    g_pallas = jax.grad(loss_p(op), argnums=(0, 1))(Q, P)
    g_dense = jax.grad(
        loss_p(lambda q, p, m: R.lddmm_rhs_self(q, p, SIG, 0.0, True, m)),
        argnums=(0, 1),
    )(Q, P)
    for a, b in zip(g_pallas, g_dense):
        # atol ~ split3 noise floor relative to the O(50) gradient scale
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3,
                                   atol=1e-3)


def test_pallas_eta_fallback():
    op = make_rhs_self(SIG, 0.25, True)
    vq, mgq, dc = op(Q, P, MASK)
    vq_d, mgq_d, dc_d = R.lddmm_rhs_self(Q, P, SIG, 0.25, True, MASK)
    np.testing.assert_allclose(np.asarray(vq), np.asarray(vq_d), rtol=1e-4,
                               atol=5e-5)
    np.testing.assert_allclose(np.asarray(mgq), np.asarray(mgq_d), rtol=1e-4,
                               atol=5e-5)


def test_rhs_ext_pallas_matches_dense():
    from difficp_tpu.ops.pallas_reductions import make_rhs_ext

    x = jnp.asarray(rng.normal(size=(150, D)).astype(np.float32))
    mx = jnp.asarray((rng.uniform(size=150) > 0.2).astype(np.float32))
    op = make_rhs_ext(SIG, 0.0, True, ti=64, tj=64)
    vq, mgq, dc, vx = op(Q, P, x, MASK, mx)
    vq_d, mgq_d, dc_d, vx_d = R.lddmm_rhs_ext(Q, P, x, SIG, 0.0, True, MASK, mx)
    np.testing.assert_allclose(np.asarray(vq), np.asarray(vq_d), rtol=1e-4, atol=5e-5)
    np.testing.assert_allclose(np.asarray(mgq), np.asarray(mgq_d), rtol=1e-4, atol=5e-5)
    np.testing.assert_allclose(np.asarray(vx), np.asarray(vx_d), rtol=1e-4, atol=5e-5)
    np.testing.assert_allclose(float(dc), float(dc_d), rtol=1e-3, atol=1e-4)


def test_rhs_ext_pallas_grads():
    from difficp_tpu.ops.pallas_reductions import make_rhs_ext

    x = jnp.asarray(rng.normal(size=(100, D)).astype(np.float32))
    mx = jnp.ones(100, jnp.float32)
    op = make_rhs_ext(SIG, 0.0, True, ti=32, tj=32)

    def loss(fn):
        def f(q, p, xx):
            vq, mgq, dc, vx = fn(q, p, xx, MASK, mx)
            return jnp.sum(vx**2) + jnp.sum(vq * mgq) + dc
        return f

    g1 = jax.grad(loss(op), argnums=(0, 1, 2))(Q, P, x)
    g2 = jax.grad(
        loss(lambda q, p, xx, mq, mxx: R.lddmm_rhs_ext(q, p, xx, SIG, 0.0, True, mq, mxx)),
        argnums=(0, 1, 2),
    )(Q, P, x)
    for a, b in zip(g1, g2):
        # atol ~ split3 noise floor relative to the O(50) gradient scale
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3,
                                   atol=1e-3)


def test_sym_kernel_matches_full_pairs():
    """Symmetric-pair fwd (each unordered tile pair computed once, dual
    accumulation into a resident raw table) == streaming full-pairs fwd ==
    dense, masked, at a size spanning several tiles."""
    from difficp_tpu.ops.pallas_reductions import (
        _rhs_self_fwd_mm, _rhs_self_fwd_sym_mm,
    )

    m = 700
    q7 = jnp.asarray(rng.normal(size=(m, 2)).astype(np.float32))
    p7 = jnp.asarray(rng.normal(size=(m, 2)).astype(np.float32) * 0.3)
    m7 = jnp.asarray((np.arange(m) < m - 33).astype(np.float32))
    vq_s, gq_s, dc_s = _rhs_self_fwd_sym_mm(q7, p7, m7, SIG, True, t=128)
    vq_f, gq_f, dc_f = _rhs_self_fwd_mm(q7, p7, m7, SIG, True, ti=128, tj=128)
    np.testing.assert_allclose(np.asarray(vq_s), np.asarray(vq_f),
                               rtol=1e-4, atol=5e-5)
    np.testing.assert_allclose(np.asarray(gq_s), np.asarray(gq_f),
                               rtol=1e-4, atol=2e-4)
    np.testing.assert_allclose(float(dc_s), float(dc_f), rtol=1e-3,
                               atol=1e-3)
    vq_d, mgq_d, dc_d = R.lddmm_rhs_self(q7, p7, SIG, 0.0, True, m7)
    np.testing.assert_allclose(np.asarray(vq_s), np.asarray(vq_d),
                               rtol=1e-3, atol=2e-4)
    np.testing.assert_allclose(np.asarray(-gq_s), np.asarray(mgq_d),
                               rtol=1e-3, atol=2e-3)


def test_sym_kernel_3d():
    """d=3 fills the 16-row raw table exactly (ncols = (d+1)^2 = 16) — a
    distinct payload/epilogue index set from d=2."""
    from difficp_tpu.ops.pallas_reductions import _rhs_self_fwd_sym_mm

    m = 530
    q3 = jnp.asarray(rng.normal(size=(m, 3)).astype(np.float32))
    p3 = jnp.asarray(rng.normal(size=(m, 3)).astype(np.float32) * 0.3)
    m3 = jnp.asarray((np.arange(m) < m - 17).astype(np.float32))
    vq_s, gq_s, dc_s = _rhs_self_fwd_sym_mm(q3, p3, m3, SIG, True, t=128)
    vq_d, mgq_d, dc_d = R.lddmm_rhs_self(q3, p3, SIG, 0.0, True, m3)
    np.testing.assert_allclose(np.asarray(vq_s), np.asarray(vq_d),
                               rtol=1e-3, atol=2e-4)
    np.testing.assert_allclose(np.asarray(-gq_s), np.asarray(mgq_d),
                               rtol=1e-3, atol=2e-3)
    np.testing.assert_allclose(float(dc_s), float(dc_d), rtol=1e-3,
                               atol=1e-3)


def test_pallas_far_from_origin():
    """Payload-matmul kernels center coordinates internally: a cloud offset
    by +1000 from the origin must match the dense fwd AND VJP at the same
    tolerance as the centered one.  Without the centroid shift the monomial
    tables cancel catastrophically (error ~ (|q|/extent)^2 on dq)."""
    from difficp_tpu.ops.pallas_reductions import make_rhs_ext

    off = jnp.asarray([1000.0, -750.0], jnp.float32)
    qo, xo = Q + off, jnp.asarray(
        rng.normal(size=(100, D)).astype(np.float32)) + off
    mx = jnp.ones(100, jnp.float32)
    op = make_rhs_self(SIG, 0.0, True, ti=64, tj=64)

    def loss_p(fn):
        def f(q, p):
            vq, mgq, dc = fn(q, p, MASK)
            return jnp.sum(vq**2) + jnp.sum(mgq * vq) + 2.0 * dc
        return f

    g_pallas = jax.grad(loss_p(op), argnums=(0, 1))(qo, P)
    g_dense = jax.grad(
        loss_p(lambda q, p, m: R.lddmm_rhs_self(q, p, SIG, 0.0, True, m)),
        argnums=(0, 1),
    )(qo, P)
    for a, b in zip(g_pallas, g_dense):
        # atol 2e-3: at |q| ~ 1000 the f32 ulp is ~6e-5, so the centered and
        # raw paths see deltas quantized differently — an input effect, far
        # from the O(1) relative error of the uncentered kernel
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3,
                                   atol=2e-3)

    ext = make_rhs_ext(SIG, 0.0, True, ti=64, tj=64)
    vq, mgq, dc, vx = ext(qo, P, xo, MASK, mx)
    vq_d, mgq_d, dc_d, vx_d = R.lddmm_rhs_ext(qo, P, xo, SIG, 0.0, True,
                                              MASK, mx)
    np.testing.assert_allclose(np.asarray(vx), np.asarray(vx_d), rtol=1e-4,
                               atol=5e-5)
    np.testing.assert_allclose(np.asarray(mgq), np.asarray(mgq_d), rtol=1e-3,
                               atol=1e-4)
    np.testing.assert_allclose(float(dc), float(dc_d), rtol=1e-3, atol=1e-3)


def test_sym_bwd_matches_ordered():
    """Symmetric-pair backward (block-pair decomposition, dual table
    accumulation, external epilogue) == ordered-pairs backward, masked,
    2D and 3D, multiple blocks."""
    from difficp_tpu.ops.pallas_reductions import (
        _rhs_self_bwd_mm, _rhs_self_bwd_sym_mm,
    )

    for (m, d) in [(300, 2), (530, 3)]:
        q = jnp.asarray(rng.normal(size=(m, d)).astype(np.float32))
        p = jnp.asarray(rng.normal(size=(m, d)).astype(np.float32) * 0.3)
        mk = jnp.asarray((np.arange(m) < m - 17).astype(np.float32))
        gv = jnp.asarray(rng.normal(size=(m, d)).astype(np.float32))
        gg = jnp.asarray(rng.normal(size=(m, d)).astype(np.float32))
        gc = jnp.asarray(0.7, jnp.float32)
        dq_s, dp_s = _rhs_self_bwd_sym_mm(q, p, mk, gv, gg, gc, SIG,
                                          t=64, mb=128)
        dq_f, dp_f = _rhs_self_bwd_mm(q, p, mk, gv, gg, gc, SIG,
                                      ti=64, tj=64)
        np.testing.assert_allclose(np.asarray(dq_s), np.asarray(dq_f),
                                   rtol=1e-3, atol=3e-4)
        np.testing.assert_allclose(np.asarray(dp_s), np.asarray(dp_f),
                                   rtol=1e-3, atol=3e-4)


def test_sym_fwd_block_pairs_matches_dense():
    """Block-pair decomposition of the symmetric forward (the >140k-point
    path) == dense, exercised with tiny blocks so multiple block pairs and
    the dual-side accumulation all run."""
    from difficp_tpu.ops.pallas_reductions import _rhs_self_fwd_sym_blocks

    vq, gq, dc = _rhs_self_fwd_sym_blocks(Q, P, MASK, SIG, True, t=64,
                                          mb=128)
    vq_d, mgq_d, dc_d = R.lddmm_rhs_self(Q, P, SIG, 0.0, True, MASK)
    np.testing.assert_allclose(np.asarray(vq), np.asarray(vq_d), rtol=1e-4,
                               atol=5e-5)
    np.testing.assert_allclose(np.asarray(-gq), np.asarray(mgq_d),
                               rtol=1e-4, atol=5e-5)
    np.testing.assert_allclose(float(dc), float(dc_d), rtol=1e-3, atol=1e-4)


def test_bwd_dq_precision_bound():
    """The dq cancellation-amplification fix (VERDICT r4 item 4): on an
    adversarial geometry (cloud radius >> sigma) the Morton-sorted,
    per-block-pair-centered, split4 backward must stay within ~1e-4 of the
    blockwise f32 VJP — the old global-origin split3 recombination sat at
    ~(R/sigma)^2 * 8e-6 ~ 7e-3 on this workload."""
    from difficp_tpu.ops import blockwise as bl
    from difficp_tpu.ops.pallas_reductions import (
        _rhs_self_bwd_mm, _rhs_self_bwd_sym_mm, _mm_center,
    )

    rr = np.random.default_rng(7)
    m, d, sig = 2048, 2, 0.3
    q = jnp.asarray(rr.normal(size=(m, d)), jnp.float32)
    p = jnp.asarray(rr.normal(size=(m, d)) * 0.3, jnp.float32)
    mask = jnp.asarray((rr.uniform(size=m) > 0.1).astype(np.float32))
    gv = jnp.asarray(rr.normal(size=(m, d)), jnp.float32)
    gg = jnp.asarray(rr.normal(size=(m, d)), jnp.float32)
    gc = jnp.asarray(0.7, jnp.float32)

    _, vjp = jax.vjp(
        lambda q_, p_: bl.lddmm_rhs_self(q_, p_, sig, 0.0, True, mask),
        q, p,
    )
    dq_ref, dp_ref = vjp((gv, -gg, gc))
    # the pallas kernels produce (v, +Gq, dc)-side cotangents with the
    # sign flip applied by the caller: match make_rhs_self's bwd wiring
    qc = q - _mm_center(q, mask)
    scale = float(jnp.max(jnp.abs(dq_ref)))

    for fn, kw in ((_rhs_self_bwd_mm, {}),
                   (_rhs_self_bwd_sym_mm, {"mb": 512})):
        dq, dp = fn(qc, p, mask, gv, -gg, gc, sig, **kw)
        err_q = float(jnp.max(jnp.abs(dq - dq_ref))) / scale
        err_p = float(jnp.max(jnp.abs(dp - dp_ref))) / float(
            jnp.max(jnp.abs(dp_ref)))
        assert err_q < 2e-4, (fn.__name__, err_q)
        assert err_p < 2e-4, (fn.__name__, err_p)
