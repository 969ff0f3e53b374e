"""Pallas TPU kernels for the fused Gaussian pairwise reductions.

The forward LDDMM ODE right-hand side — the hottest op of the whole
framework (SURVEY §3.1: every L-BFGS function evaluation runs nt of these) —
as a hand-tiled TPU kernel:

- grid over i-tiles; q/p/mask stay resident in VMEM (point sets up to a few
  hundred thousand points fit comfortably: 100k x 2 x 4B = 0.8 MB);
- the (TI, TJ) kernel tile is computed once per (i, j) tile pair and ALL
  outputs (v(q), -grad_q H, divergence cost) are accumulated from it in the
  same pass (the fusion KeOps cannot do across separate reductions —
  reference LDDMM.py:176-227 issues 3-6 independent kernel launches);
- per-dimension unrolled arithmetic (D = 2 or 3): everything is (TI, TJ)
  VPU element-wise work + row reductions; no (M, N) buffer ever exists.

Gradients: the wrapper is a ``jax.custom_vjp`` whose backward runs the
blockwise jnp implementation's VJP (same tiling discipline, O(M) memory).

On non-TPU backends the kernels run in interpret mode (tests), selected
automatically.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from difficp_tpu.ops import blockwise as _block


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _pad_rows(a, n, value=0.0):
    if a.shape[0] == n:
        return a
    pad = [(0, n - a.shape[0])] + [(0, 0)] * (a.ndim - 1)
    return jnp.pad(a, pad, constant_values=value)


def _rhs_self_kernel(qi_ref, pi_ref, mi_ref, q_ref, p_ref, m_ref,
                     vq_ref, gq_ref, dc_ref, *, sigma, eta, withlogdet,
                     tj, d):
    """One i-tile of the fused self RHS; streams j-tiles from VMEM."""
    ti = qi_ref.shape[0]
    m_total = q_ref.shape[0]
    n_j = m_total // tj
    inv_sig2 = 1.0 / (sigma * sigma)

    qi = [qi_ref[:, dd][:, None] for dd in range(d)]    # (TI, 1) each
    pi = [pi_ref[:, dd][:, None] for dd in range(d)]
    mi = mi_ref[:, 0][:, None]                           # (TI, 1)

    def body(jt, acc):
        j0 = jt * tj
        qj = q_ref[pl.ds(j0, tj), :]                     # (TJ, D)
        pj = p_ref[pl.ds(j0, tj), :]
        mj = m_ref[pl.ds(j0, tj), 0][None, :]            # (1, TJ)

        diffs = [qi[dd] - qj[:, dd][None, :] for dd in range(d)]  # (TI,TJ)
        d2 = diffs[0] * diffs[0]
        for dd in range(1, d):
            d2 = d2 + diffs[dd] * diffs[dd]
        k = jnp.exp(-0.5 * d2 * inv_sig2) * mj

        # p_i . p_j as (TI, TJ)
        dots = pi[0] * pj[:, 0][None, :]
        for dd in range(1, d):
            dots = dots + pi[dd] * pj[:, dd][None, :]

        vq, gq, dc = acc
        kd = k * dots
        new_vq = []
        new_gq = []
        for dd in range(d):
            new_vq.append(
                vq[dd] + jnp.sum(k * pj[:, dd][None, :], axis=1, keepdims=True)
            )
            # gradK_d = -diff_d * K / sig^2 ; Gq_d = sum_j gradK_d * dots
            new_gq.append(
                gq[dd]
                - jnp.sum(kd * diffs[dd], axis=1, keepdims=True) * inv_sig2
            )
        if withlogdet:
            # per-row dcost partial: m_i sum_j p_i . gradK(q_i - q_j)
            proj = pi[0] * diffs[0]
            for dd in range(1, d):
                proj = proj + pi[dd] * diffs[dd]
            dc = dc - jnp.sum(mi * k * proj, axis=1, keepdims=True) * inv_sig2
        return (new_vq, new_gq, dc)

    acc0 = (
        [jnp.zeros((ti, 1), jnp.float32) for _ in range(d)],
        [jnp.zeros((ti, 1), jnp.float32) for _ in range(d)],
        jnp.zeros((ti, 1), jnp.float32),
    )
    vq, gq, dc = jax.lax.fori_loop(0, n_j, body, acc0)
    for dd in range(d):
        vq_ref[:, dd] = (vq[dd] * mi)[:, 0]
        gq_ref[:, dd] = (gq[dd] * mi)[:, 0]
    dc_ref[:, 0] = dc[:, 0]


def _rhs_self_fwd_pallas(q, p, mask, sigma, eta, withlogdet,
                         ti=256, tj=256):
    """Pallas forward of the fused self RHS (eta == 0 fast path)."""
    m, d = q.shape
    mpad = -(-m // max(ti, tj)) * max(ti, tj)
    qp = _pad_rows(q, mpad)
    pp = _pad_rows(p, mpad)
    mk = _pad_rows(mask[:, None], mpad)
    grid = mpad // ti

    kernel = functools.partial(
        _rhs_self_kernel, sigma=float(sigma), eta=float(eta),
        withlogdet=bool(withlogdet), tj=tj, d=d,
    )
    vq, gq, dc = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((ti, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((ti, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((ti, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((ti, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((ti, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((ti, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((mpad, d), jnp.float32),
            jax.ShapeDtypeStruct((mpad, d), jnp.float32),
            jax.ShapeDtypeStruct((mpad, 1), jnp.float32),
        ],
        interpret=_interpret(),
    )(qp, pp, mk, qp, pp, mk)
    return vq[:m], gq[:m], jnp.sum(dc)


def _vx_kernel(xi_ref, mxi_ref, q_ref, p_ref, mq_ref, vx_ref, dc_ref, *,
               sigma, withlogdet, tj, d):
    """One x-tile of (v(x), per-row divergence cost); q/p stream from VMEM."""
    ti = xi_ref.shape[0]
    m_total = q_ref.shape[0]
    n_j = m_total // tj
    inv_sig2 = 1.0 / (sigma * sigma)

    xi = [xi_ref[:, dd][:, None] for dd in range(d)]
    mxi = mxi_ref[:, 0][:, None]

    def body(jt, acc):
        j0 = jt * tj
        qj = q_ref[pl.ds(j0, tj), :]
        pj = p_ref[pl.ds(j0, tj), :]
        mj = mq_ref[pl.ds(j0, tj), 0][None, :]
        diffs = [xi[dd] - qj[:, dd][None, :] for dd in range(d)]
        d2 = diffs[0] * diffs[0]
        for dd in range(1, d):
            d2 = d2 + diffs[dd] * diffs[dd]
        k = jnp.exp(-0.5 * d2 * inv_sig2) * mj
        vx, dc = acc
        new_vx = [
            vx[dd] + jnp.sum(k * pj[:, dd][None, :], axis=1, keepdims=True)
            for dd in range(d)
        ]
        if withlogdet:
            # -div v(x_i) partial = sum_j p_j . (x_i - q_j) K / s^2
            proj = diffs[0] * pj[:, 0][None, :]
            for dd in range(1, d):
                proj = proj + diffs[dd] * pj[:, dd][None, :]
            dc = dc + jnp.sum(mxi * k * proj, axis=1, keepdims=True) * inv_sig2
        return (new_vx, dc)

    acc0 = (
        [jnp.zeros((ti, 1), jnp.float32) for _ in range(d)],
        jnp.zeros((ti, 1), jnp.float32),
    )
    vx, dc = jax.lax.fori_loop(0, n_j, body, acc0)
    for dd in range(d):
        vx_ref[:, dd] = (vx[dd] * mxi)[:, 0]
    dc_ref[:, 0] = dc[:, 0]


def _vx_fwd_pallas(x, maskx, q, p, maskq, sigma, withlogdet, ti=256, tj=256):
    nx, d = x.shape
    m = q.shape[0]
    nx_pad = -(-nx // ti) * ti
    m_pad = -(-m // tj) * tj
    xp = _pad_rows(x, nx_pad)
    mxp = _pad_rows(maskx[:, None], nx_pad)
    qp = _pad_rows(q, m_pad)
    pp = _pad_rows(p, m_pad)
    mqp = _pad_rows(maskq[:, None], m_pad)
    grid = nx_pad // ti
    kernel = functools.partial(
        _vx_kernel, sigma=float(sigma), withlogdet=bool(withlogdet), tj=tj, d=d
    )
    vx, dc = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((ti, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((ti, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((ti, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((ti, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nx_pad, d), jnp.float32),
            jax.ShapeDtypeStruct((nx_pad, 1), jnp.float32),
        ],
        interpret=_interpret(),
    )(xp, mxp, qp, pp, mqp)
    return vx[:nx], jnp.sum(dc)


def make_rhs_ext(sigma: float, eta: float, withlogdet: bool,
                 ti: int = 256, tj: int = 256):
    """Custom-VJP fused ext-RHS: (vq, -Gq, dcost-at-x, vx).

    Support terms (vq, Gq over the small support set) run through the self
    kernel; the data-point terms (vx and the divergence cost, the large-Nx
    side) run the streaming ``_vx_kernel``.  Backward = blockwise VJP.
    """
    self_op = make_rhs_self(sigma, eta, False, ti, tj)

    def reference_impl(q, p, x, maskq, maskx):
        return _block.lddmm_rhs_ext(q, p, x, sigma, eta, withlogdet,
                                    maskq, maskx)

    @jax.custom_vjp
    def op(q, p, x, maskq, maskx):
        if eta != 0.0:
            return reference_impl(q, p, x, maskq, maskx)
        vq, mgq, _ = self_op(q, p, maskq)
        vx, dc = _vx_fwd_pallas(x, maskx, q, p, maskq, sigma, withlogdet,
                                ti, tj)
        if not withlogdet:
            dc = jnp.zeros((), q.dtype)
        return vq, mgq, dc, vx

    def fwd(q, p, x, maskq, maskx):
        return op(q, p, x, maskq, maskx), (q, p, x, maskq, maskx)

    def bwd(res, cot):
        q, p, x, maskq, maskx = res
        _, vjp = jax.vjp(
            lambda q_, p_, x_: reference_impl(q_, p_, x_, maskq, maskx),
            q, p, x,
        )
        dq, dp, dx = vjp(cot)
        return dq, dp, dx, None, None

    op.defvjp(fwd, bwd)
    return op


def make_rhs_self(sigma: float, eta: float, withlogdet: bool,
                  ti: int = 256, tj: int = 256):
    """Build the custom-VJP fused self-RHS op for a fixed configuration.

    Forward: Pallas kernel (eta == 0) or blockwise fallback (eta != 0 —
    the gradcomponent path is rare; reference defaults gradcomponent=False,
    ICP_two_set.py:151).
    Backward: VJP of the blockwise implementation (tile-streamed, O(M) mem).
    """

    def reference_impl(q, p, mask):
        return _block.lddmm_rhs_self(q, p, sigma, eta, withlogdet, mask)

    @jax.custom_vjp
    def op(q, p, mask):
        if eta != 0.0:
            return reference_impl(q, p, mask)
        vq, gq, dc = _rhs_self_fwd_pallas(q, p, mask, sigma, eta, withlogdet,
                                          ti, tj)
        return vq, -gq, dc  # contract: (v(q), -Gq, dcost)

    def fwd(q, p, mask):
        return op(q, p, mask), (q, p, mask)

    def bwd(res, cot):
        q, p, mask = res
        _, vjp = jax.vjp(lambda q_, p_: reference_impl(q_, p_, mask), q, p)
        dq, dp = vjp(cot)
        return dq, dp, None

    op.defvjp(fwd, bwd)
    return op
