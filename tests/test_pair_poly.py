"""Pair-polynomial compiler (ops/pair_poly.py): generated payload-matmul
backwards vs the blockwise-VJP oracle and the hand-written eta == 0 kernels
(interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from difficp_tpu.ops import blockwise as B
from difficp_tpu.ops import reductions as R
from difficp_tpu.ops.pair_poly import (
    _self_bwd_polys,
    rhs_ext_bwd_poly,
    rhs_self_bwd_poly,
)
from difficp_tpu.ops.pallas_reductions import (
    _mm_center, _rhs_self_bwd_mm, make_rhs_ext, make_rhs_self,
)

rng = np.random.default_rng(3)
M, NX, D = 260, 170, 2
Q = jnp.asarray(rng.normal(size=(M, D)).astype(np.float32) + 2.0)
P = jnp.asarray(rng.normal(size=(M, D)).astype(np.float32) * 0.4)
X = jnp.asarray(rng.normal(size=(NX, D)).astype(np.float32) + 2.0)
MQ = jnp.asarray((rng.uniform(size=M) > 0.2).astype(np.float32))
MX = jnp.asarray((rng.uniform(size=NX) > 0.2).astype(np.float32))
GV = jnp.asarray(rng.normal(size=(M, D)).astype(np.float32))
GG = jnp.asarray(rng.normal(size=(M, D)).astype(np.float32))
GX = jnp.asarray(rng.normal(size=(NX, D)).astype(np.float32))
GC = jnp.asarray(0.7, jnp.float32)
SIG = 0.6


def _blockwise_self_vjp(eta, withlogdet, gc):
    def f(q_, p_):
        return B.lddmm_rhs_self(q_, p_, SIG, eta, withlogdet, MQ, tile=64)

    _, vjp = jax.vjp(f, Q, P)
    return vjp((GV, GG, gc))


@pytest.mark.parametrize("eta", [0.0, 0.3])
def test_self_bwd_poly_matches_blockwise_vjp(eta, monkeypatch):
    # exact-f32 matmuls isolate the FORMULA from the split3 noise floor —
    # the eta != 0 degree-4 monomials amplify the known f32 cancellation
    # (see _BWD_PRECISION; the polynomial itself is exact to 1e-10 in f64)
    import difficp_tpu.ops.pallas_reductions as PR

    monkeypatch.setattr(PR, "_MM_MODE", "highest")
    qc = Q - _mm_center(Q, MQ)
    dq, dp = rhs_self_bwd_poly(qc, P, MQ, GV, GG, GC, SIG, eta)
    dq_b, dp_b = _blockwise_self_vjp(eta, True, GC)
    tol = dict(rtol=1e-2, atol=1e-2) if eta else dict(rtol=1e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(dq), np.asarray(dq_b), **tol)
    np.testing.assert_allclose(np.asarray(dp), np.asarray(dp_b),
                               rtol=1e-3, atol=2e-3)


def test_self_bwd_poly_split3_floor():
    """split3 (production) precision floor on the eta != 0 backward stays
    within the documented envelope (relative ~1e-2 worst-element on this
    extent/sigma ratio; blockwise-VJP via the 'accurate' knob is the
    escape hatch)."""
    qc = Q - _mm_center(Q, MQ)
    dq, dp = rhs_self_bwd_poly(qc, P, MQ, GV, GG, GC, SIG, 0.3)
    dq_b, dp_b = _blockwise_self_vjp(0.3, True, GC)
    rel = np.abs(np.asarray(dq) - np.asarray(dq_b)) / (
        np.abs(np.asarray(dq_b)) + 1e-2)
    assert rel.max() < 5e-2, rel.max()


def test_self_bwd_poly_matches_handwritten_eta0():
    """The generated eta == 0 polynomial == the hand-derived MM kernel —
    two independent derivations of the same backward."""
    qc = Q - _mm_center(Q, MQ)
    dq, dp = rhs_self_bwd_poly(qc, P, MQ, GV, GG, GC, SIG, 0.0)
    dq_h, dp_h = _rhs_self_bwd_mm(qc, P, MQ, GV, GG, GC, SIG, ti=64, tj=64)
    np.testing.assert_allclose(np.asarray(dq), np.asarray(dq_h),
                               rtol=1e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(dp), np.asarray(dp_h),
                               rtol=1e-3, atol=2e-3)


@pytest.mark.parametrize("eta", [0.0, 0.3])
def test_ext_bwd_poly_matches_blockwise_vjp(eta, monkeypatch):
    """Cross-term gradients (vx + x-side logdet cost) vs blockwise VJP."""
    import difficp_tpu.ops.pallas_reductions as PR

    monkeypatch.setattr(PR, "_MM_MODE", "highest")

    def f(q_, p_, x_):
        vq, mgq, dc, vx = B.lddmm_rhs_ext(q_, p_, x_, SIG, eta, True,
                                          MQ, MX, tile=64)
        # isolate the CROSS terms: contract only vx and dc cotangents
        return dc, vx

    _, vjp = jax.vjp(f, Q, P, X)
    dq_b, dp_b, dx_b = vjp((GC, GX))

    c = _mm_center(Q, MQ)
    dq, dp, dx = rhs_ext_bwd_poly(Q - c, P, X - c, MQ, MX, GX, GC, SIG, eta)
    tol = dict(rtol=1e-2, atol=1e-2) if eta else dict(rtol=1e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(dx), np.asarray(dx_b), **tol)
    np.testing.assert_allclose(np.asarray(dq), np.asarray(dq_b), **tol)
    np.testing.assert_allclose(np.asarray(dp), np.asarray(dp_b),
                               rtol=1e-3, atol=2e-3)


@pytest.mark.parametrize("withlogdet", [False, True])
def test_make_rhs_self_eta_grads_end_to_end(withlogdet, monkeypatch):
    """The eta != 0 custom VJP of the fused self RHS now rides the
    generated kernels — end-to-end grads vs the dense reference."""
    import difficp_tpu.ops.pallas_reductions as PR

    monkeypatch.setattr(PR, "_MM_MODE", "highest")
    eta = 0.25
    op = make_rhs_self(SIG, eta, withlogdet, ti=64, tj=64)

    def loss(fn):
        def f(q, p):
            vq, mgq, dc = fn(q, p, MQ)
            return jnp.sum(vq * GV) + jnp.sum(mgq * GG) + 2.0 * dc
        return f

    g_p = jax.grad(loss(op), argnums=(0, 1))(Q, P)
    g_d = jax.grad(
        loss(lambda q, p, m: R.lddmm_rhs_self(q, p, SIG, eta, withlogdet,
                                              m)),
        argnums=(0, 1),
    )(Q, P)
    for a, b in zip(g_p, g_d):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-2, atol=1e-2)


def test_make_rhs_ext_eta_grads_end_to_end(monkeypatch):
    import difficp_tpu.ops.pallas_reductions as PR

    monkeypatch.setattr(PR, "_MM_MODE", "highest")
    eta = 0.25
    op = make_rhs_ext(SIG, eta, True, ti=64, tj=64)

    def loss(fn):
        def f(q, p, x):
            vq, mgq, dc, vx = fn(q, p, x, MQ, MX)
            return (jnp.sum(vq * GV) + jnp.sum(mgq * GG) + 2.0 * dc
                    + jnp.sum(vx * GX))
        return f

    g_p = jax.grad(loss(op), argnums=(0, 1, 2))(Q, P, X)
    g_d = jax.grad(
        loss(lambda q, p, x, mq, mx: R.lddmm_rhs_ext(q, p, x, SIG, eta,
                                                     True, mq, mx)),
        argnums=(0, 1, 2),
    )(Q, P, X)
    for a, b in zip(g_p, g_d):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-2, atol=1e-2)


def test_bwd_precision_knob():
    """'accurate' routes the custom VJP through the blockwise backward —
    gradients then match the dense reference to f32 exactness even with
    eta != 0 (the escape hatch for the payload-matmul dq floor)."""
    from difficp_tpu.ops.pallas_reductions import set_bwd_precision

    eta = 0.25
    op = make_rhs_self(SIG, eta, True, ti=64, tj=64)

    def loss(fn):
        def f(q, p):
            vq, mgq, dc = fn(q, p, MQ)
            return jnp.sum(vq * GV) + jnp.sum(mgq * GG) + 2.0 * dc
        return f

    set_bwd_precision("accurate")
    try:
        g_p = jax.grad(loss(op), argnums=(0, 1))(Q, P)
    finally:
        set_bwd_precision("fast")
    g_d = jax.grad(
        loss(lambda q, p, m: R.lddmm_rhs_self(q, p, SIG, eta, True, m)),
        argnums=(0, 1),
    )(Q, P)
    for a, b in zip(g_p, g_d):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_api_backward_precision_key():
    """numerical_options['backward_precision'] reaches the global knob."""
    import difficp_tpu.ops.pallas_reductions as PR
    from difficp_tpu.api.common import default_numerical_options

    default_numerical_options({"backward_precision": "accurate"})
    assert PR._BWD_PRECISION["mode"] == "accurate"
    default_numerical_options(None)
    assert PR._BWD_PRECISION["mode"] == "fast"


def test_poly_table_sizes_reasonable():
    """The generated column tables must stay MXU-friendly (one or a few
    128-lane tiles) — guard against accidental blowup."""
    for eta in (0.0, 0.3):
        for d in (2, 3):
            polys = _self_bwd_polys(d, 0.6, eta)
            cms = set()
            for p in polys.values():
                cms |= p.col_monomials()
            assert len(cms) <= (160 if d == 2 else 520), (d, eta, len(cms))


# ---------------------------------------------------------------------------
# Round 4: generated payload-matmul FORWARDS (any eta)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("eta", [0.0, 0.3])
@pytest.mark.parametrize("withlogdet", [False, True])
def test_self_fwd_poly_matches_blockwise(eta, withlogdet):
    """rhs_self_fwd_poly == blockwise forward (the streaming-kernel oracle):
    same component densities the generated backward differentiates."""
    from difficp_tpu.ops.pair_poly import rhs_self_fwd_poly

    qc = Q - _mm_center(Q, MQ)
    vq, gq, dc = rhs_self_fwd_poly(qc, P, MQ, SIG, eta, withlogdet)
    vq_b, mgq_b, dc_b = B.lddmm_rhs_self(Q, P, SIG, eta, withlogdet, MQ,
                                         tile=64)
    np.testing.assert_allclose(np.asarray(vq), np.asarray(vq_b),
                               rtol=1e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(-gq), np.asarray(mgq_b),
                               rtol=1e-3, atol=2e-3)
    np.testing.assert_allclose(float(dc), float(dc_b), rtol=1e-3, atol=2e-3)


@pytest.mark.parametrize("eta", [0.0, 0.3])
def test_ext_fwd_poly_matches_blockwise(eta):
    from difficp_tpu.ops.pair_poly import rhs_ext_fwd_poly

    c = _mm_center(Q, MQ)
    vx, dc = rhs_ext_fwd_poly(Q - c, P, X - c, MQ, MX, SIG, eta, True)
    _, _, dc_b, vx_b = B.lddmm_rhs_ext(Q, P, X, SIG, eta, True, MQ, MX,
                                       tile=64)
    np.testing.assert_allclose(np.asarray(vx), np.asarray(vx_b),
                               rtol=1e-3, atol=2e-3)
    np.testing.assert_allclose(float(dc), float(dc_b), rtol=1e-3, atol=2e-3)


@pytest.mark.parametrize("withlogdet", [False, True])
def test_make_rhs_self_eta_poly_fwd_dispatch(withlogdet, monkeypatch):
    """With the size gate lowered, the eta != 0 fused self op's FORWARD
    rides the generated payload-matmul path and still matches the dense
    reference (and the custom-VJP grads stay wired)."""
    import difficp_tpu.ops.pallas_reductions as PR

    monkeypatch.setattr(PR, "_POLY_FWD_MIN_M", 1)
    eta = 0.25
    op = make_rhs_self(SIG, eta, withlogdet, ti=64, tj=64)
    vq, mgq, dc = op(Q, P, MQ)
    vq_d, mgq_d, dc_d = R.lddmm_rhs_self(Q, P, SIG, eta, withlogdet, MQ)
    np.testing.assert_allclose(np.asarray(vq), np.asarray(vq_d),
                               rtol=1e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(mgq), np.asarray(mgq_d),
                               rtol=1e-3, atol=2e-3)
    np.testing.assert_allclose(float(dc), float(dc_d), rtol=1e-3, atol=2e-3)


def test_make_rhs_ext_eta_poly_fwd_dispatch(monkeypatch):
    import difficp_tpu.ops.pallas_reductions as PR

    monkeypatch.setattr(PR, "_POLY_FWD_MIN_M", 1)
    eta = 0.25
    op = make_rhs_ext(SIG, eta, True, ti=64, tj=64)
    vq, mgq, dc, vx = op(Q, P, X, MQ, MX)
    vq_d, mgq_d, dc_d, vx_d = R.lddmm_rhs_ext(Q, P, X, SIG, eta, True,
                                              MQ, MX)
    np.testing.assert_allclose(np.asarray(vq), np.asarray(vq_d),
                               rtol=1e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(mgq), np.asarray(mgq_d),
                               rtol=1e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(vx), np.asarray(vx_d),
                               rtol=1e-3, atol=2e-3)
    np.testing.assert_allclose(float(dc), float(dc_d), rtol=1e-3, atol=2e-3)


# ---------------------------------------------------------------------------
# Round 4: generic SYMMETRIC-pair kernel-sum (pallas_ksum.pairwise_ksum_sym)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("eta", [0.0, 0.3])
def test_sym_self_eval_matches_ordered(eta, monkeypatch):
    """eval_polys(sym=True) == ordered evaluation for the generated self
    fwd (dispatched above the gate) and bwd (sym exercised directly: the
    dispatch keeps the backward ordered — measured speed parity on chip)."""
    import difficp_tpu.ops.pair_poly as PP

    qc = Q - _mm_center(Q, MQ)
    fwd_ref = PP.rhs_self_fwd_poly(qc, P, MQ, SIG, eta, True)
    monkeypatch.setattr(PP, "_SYM_MIN_M", 1)
    fwd_s = PP.rhs_self_fwd_poly(qc, P, MQ, SIG, eta, True)
    for a, b in zip(jax.tree_util.tree_leaves(fwd_ref),
                    jax.tree_util.tree_leaves(fwd_s)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)

    # backward component densities through the symmetric kernel directly
    d = qc.shape[1]
    vals = {"m": MQ,
            "C": jnp.broadcast_to(jnp.asarray(GC, qc.dtype), (qc.shape[0],))}
    for e in range(d):
        vals[f"q{e}"] = qc[:, e]
        vals[f"p{e}"] = P[:, e]
        vals[f"g{e}"] = GV[:, e]
        vals[f"h{e}"] = GG[:, e]
    polys = PP._self_bwd_polys(d, SIG, eta)
    outs_ref = PP.eval_polys(polys, qc, qc, vals, vals, SIG)
    outs_s = PP.eval_polys(polys, qc, qc, vals, vals, SIG, sym=True)
    for name in outs_ref:
        np.testing.assert_allclose(np.asarray(outs_s[name]),
                                   np.asarray(outs_ref[name]),
                                   rtol=1e-3, atol=2e-3)


def test_sym_ksum_multiblock_and_mask_subset():
    """pairwise_ksum_sym with forced tiny block/tile sizes (multi block-pair
    decomposition) == the ordered generic kernel; zero-masked points
    contribute nothing (masked == subset)."""
    from difficp_tpu.ops.pallas_ksum import pairwise_ksum, pairwise_ksum_sym

    x = np.asarray(Q)
    m = np.asarray(MQ)
    w = np.asarray(np.random.default_rng(7).normal(size=M)
                   .astype(np.float32))
    # monos over rows [x0, x1, w]: [m] -> (), [m*w] -> (2,), [m*x0*w] ...
    monos = ((), (2,), (0, 2), (0, 1))
    var_rows = [jnp.asarray(x[:, 0]), jnp.asarray(x[:, 1]), jnp.asarray(w),
                jnp.asarray(m)]
    got = pairwise_ksum_sym(var_rows, 2, 3, monos, SIG, t=64, mb=128)

    def col(mono):
        v = m.copy()
        for r in mono:
            v = v * np.asarray(var_rows[r])
        return v

    table = jnp.asarray(np.stack([col(mn) for mn in monos], axis=1))
    ref = pairwise_ksum(jnp.asarray(x), jnp.asarray(x), table, SIG, None,
                        ti=64, tj=64)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)

    # subset equivalence: drop the masked-out points entirely
    keep = m > 0.5
    var_rows_k = [jnp.asarray(np.asarray(v)[keep]) for v in var_rows]
    got_k = pairwise_ksum_sym(var_rows_k, 2, 3, monos, SIG, t=64, mb=128)
    np.testing.assert_allclose(np.asarray(got)[keep], np.asarray(got_k),
                               rtol=1e-4, atol=1e-4)


def test_sym_gate_width_and_size():
    """The sym dispatch (forward-only) stays off below the size gate and
    for over-wide tables where the MXU contraction dominates."""
    import difficp_tpu.ops.pair_poly as PP

    assert not PP._use_sym(16384, PP._self_fwd_polys(2, 0.6, 0.3, True))
    assert PP._use_sym(65536, PP._self_fwd_polys(2, 0.6, 0.3, True))
    assert PP._use_sym(65536, PP._self_fwd_polys(3, 0.6, 0.3, True))
    # the d=3 backward table (333 cols) is far past the width gate — the
    # helper itself must refuse it even though the dispatch no longer asks
    assert not PP._use_sym(65536, PP._self_bwd_polys(3, 0.6, 0.3))
