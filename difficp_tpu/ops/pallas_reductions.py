"""Pallas TPU kernels for the fused Gaussian pairwise reductions.

The forward LDDMM ODE right-hand side — the hottest op of the whole
framework (SURVEY §3.1: every L-BFGS function evaluation runs nt of these) —
as a hand-tiled TPU kernel:

- **Packed transposed layout**: the natural (M, D) point arrays would pad
  every row to 128 lanes in VMEM (64x waste for D=2, OOM above ~60k points).
  Inputs are packed as ONE (8, M) array (rows = q dims, p dims, mask) and
  outputs as one (8, M) array (rows = vq dims, Gq dims, per-point dcost):
  lane axis = points, sublane padding only 8/(2D+1).
- grid over i-tiles; the packed array stays resident in VMEM (4 MB at
  M = 131k) and j-tiles stream from it; works to ~200k points per chip —
  beyond that, shard points over the mesh (difficp_tpu/parallel/ring.py).
- the (TI, TJ) kernel tile is computed once per (i, j) tile pair and ALL
  outputs (v(q), -grad_q H, divergence cost) accumulate from it in the same
  pass (fusion KeOps cannot do across its separate reductions — reference
  LDDMM.py:176-227 issues 3-6 independent kernel launches).

Two kernel generations share the packed layout:

- **streaming kernels** (`_rhs_self_kernel`, `_vx_kernel`, ...): per-tile
  VPU reduction chains; handle any eta (the gradcomponent terms stream in
  the same pass).
- **payload-matmul kernels** (`_rhs_self_mm_kernel`, ... — the eta == 0
  default path): every reduction is re-expressed as a kernel-sum
  convolution A[c] = sum_j K_ij c_j against a table of payload columns, so
  each tile pair costs ONE MXU matmul + d2/exp on the VPU.  Forward and
  the hand-derived custom-VJP backward both ride this; measured v5e
  M = 131k: fwd 138 -> 163, bwd 56 -> 147 Gpair/s (bwd 2.6x).

Gradients: wrappers are ``jax.custom_vjp``; eta == 0 uses the hand-derived
payload-matmul backward kernels, eta != 0 falls back to the blockwise jnp
implementation's VJP (same tiling discipline, O(M) memory).

On non-TPU backends the kernels run in interpret mode (tests).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_ROWS = 8  # packed sublane count (TPU f32 sublane tile)


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _pack(arrs, mpad):
    """Pack a list of (M,) rows into one (8, mpad) array."""
    m = arrs[0].shape[0]
    rows = jnp.zeros((_ROWS, mpad), jnp.float32)
    for i, a in enumerate(arrs):
        rows = rows.at[i, :m].set(a)
    return rows


def _mm_center(q, mask):
    """Masked centroid, for shifting coordinates before a payload-matmul
    kernel.

    The MM kernels accumulate kernel-sums against tables of raw-coordinate
    monomials (q_e, q_e q_f, ...) and assemble the delta-based outputs from
    them by cancellation, so their relative error grows like (|q|/extent)
    per monomial order — a cloud sitting far from the origin loses all
    backward precision (at |q| ~ 1e3, sigma ~ 0.2 the dq error would be
    O(1) relative).  Every fused-RHS output depends on positions only
    through pairwise differences, so shifting q (and x) by the support
    centroid is exact and bounds the monomial magnitude by the cloud
    extent instead of its absolute position.
    """
    w = jnp.maximum(jnp.sum(mask), 1.0)
    return jax.lax.stop_gradient(jnp.sum(q * mask[:, None], axis=0) / w)


def _rhs_self_kernel(blk_ref, full_ref, out_ref, *, sigma, eta, withlogdet,
                     tj, d):
    """One i-tile of the fused self RHS (eta == 0 fast path; eta != 0 adds
    the gradcomponent terms GradKRed / HessKRed / GradLapKRed / LapKRed,
    reference LDDMM.py:113-116,196-216).

    blk_ref: (8, TI) packed i-tile [q rows 0..d-1 | p rows d..2d-1 | mask 2d].
    full_ref: (8, Mpad) same packing, whole set (streams j-tiles).
    out_ref: (8, TI) packed [vq rows | Gq rows | dcost row 2d].
    """
    ti = blk_ref.shape[1]
    m_total = full_ref.shape[1]
    n_j = m_total // tj
    inv_sig2 = 1.0 / (sigma * sigma)

    # i-side columns (TI, 1): one sublane->lane transpose per tile
    qi = [blk_ref[dd, :][:, None] for dd in range(d)]
    pi = [blk_ref[d + dd, :][:, None] for dd in range(d)]
    mi = blk_ref[2 * d, :][:, None]

    def body(jt, acc):
        j0 = jt * tj
        qj = [full_ref[dd, pl.ds(j0, tj)][None, :] for dd in range(d)]
        pj = [full_ref[d + dd, pl.ds(j0, tj)][None, :] for dd in range(d)]
        mj = full_ref[2 * d, pl.ds(j0, tj)][None, :]

        diffs = [qi[dd] - qj[dd] for dd in range(d)]     # (TI, TJ)
        d2 = diffs[0] * diffs[0]
        for dd in range(1, d):
            d2 = d2 + diffs[dd] * diffs[dd]
        k = jnp.exp(-0.5 * d2 * inv_sig2) * mj

        dots = pi[0] * pj[0]
        for dd in range(1, d):
            dots = dots + pi[dd] * pj[dd]

        vq, gq, dc = acc
        kd = k * dots
        vq = [
            vq[dd] + jnp.sum(k * pj[dd], axis=1, keepdims=True)
            for dd in range(d)
        ]
        gq = [
            gq[dd] - jnp.sum(kd * diffs[dd], axis=1, keepdims=True) * inv_sig2
            for dd in range(d)
        ]
        if eta != 0.0:
            # vq -= eta GradKRed  ==  vq += eta sum_j k diff / s^2
            vq = [
                vq[dd]
                + eta * inv_sig2 * jnp.sum(k * diffs[dd], axis=1,
                                           keepdims=True)
                for dd in range(d)
            ]
            # gq -= eta HessKRed + eta^2 GradLapKRed
            cb = [pi[dd] - pj[dd] for dd in range(d)]
            proj_cb = diffs[0] * cb[0]
            for dd in range(1, d):
                proj_cb = proj_cb + diffs[dd] * cb[dd]
            lap_coef = k * (d2 * inv_sig2 - (d + 2)) * (inv_sig2 * inv_sig2)
            gq = [
                gq[dd]
                - eta * (
                    inv_sig2 * inv_sig2
                    * jnp.sum(k * proj_cb * diffs[dd], axis=1, keepdims=True)
                    - inv_sig2 * jnp.sum(k * cb[dd], axis=1, keepdims=True)
                )
                + (eta * eta) * jnp.sum(lap_coef * diffs[dd], axis=1,
                                        keepdims=True)
                for dd in range(d)
            ]
        if withlogdet:
            proj = pi[0] * diffs[0]
            for dd in range(1, d):
                proj = proj + pi[dd] * diffs[dd]
            dc = dc - jnp.sum(mi * k * proj, axis=1, keepdims=True) * inv_sig2
            if eta != 0.0:
                dc = dc + eta * inv_sig2 * jnp.sum(
                    mi * k * (d2 * inv_sig2 - d), axis=1, keepdims=True
                )
        return (vq, gq, dc)

    acc0 = (
        [jnp.zeros((ti, 1), jnp.float32) for _ in range(d)],
        [jnp.zeros((ti, 1), jnp.float32) for _ in range(d)],
        jnp.zeros((ti, 1), jnp.float32),
    )
    vq, gq, dc = jax.lax.fori_loop(0, n_j, body, acc0)
    for dd in range(d):
        out_ref[dd, :] = (vq[dd] * mi)[:, 0]
        out_ref[d + dd, :] = (gq[dd] * mi)[:, 0]
    out_ref[2 * d, :] = dc[:, 0]
    for r in range(2 * d + 1, _ROWS):
        out_ref[r, :] = jnp.zeros((ti,), jnp.float32)


def _rhs_self_fwd_pallas(q, p, mask, sigma, eta, withlogdet, ti=256, tj=512):
    """Pallas forward of the fused self RHS (any eta)."""
    m, d = q.shape
    step = max(ti, tj)
    mpad = -(-m // step) * step
    packed = _pack(
        [q[:, dd] for dd in range(d)] + [p[:, dd] for dd in range(d)] + [mask],
        mpad,
    )
    grid = mpad // ti
    kernel = functools.partial(
        _rhs_self_kernel, sigma=float(sigma), eta=float(eta),
        withlogdet=bool(withlogdet), tj=tj, d=d,
    )
    out = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((_ROWS, ti), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_ROWS, ti), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((_ROWS, mpad), jnp.float32),
        interpret=_interpret(),
    )(packed, packed)
    vq = out[0:d, :m].T
    gq = out[d : 2 * d, :m].T
    dc = jnp.sum(out[2 * d])
    return vq, gq, dc


def _vx_kernel(xblk_ref, q_ref, out_ref, *, sigma, eta, withlogdet, tj, d):
    """One x-tile of (v(x), per-point divergence cost), any eta.

    xblk_ref: (8, TI) packed x-tile [x rows 0..d-1 | mask row d].
    q_ref: (8, Mpad) packed support [q rows | p rows | mask].
    out_ref: (8, TI) packed [vx rows 0..d-1 | dcost row d].
    """
    ti = xblk_ref.shape[1]
    m_total = q_ref.shape[1]
    n_j = m_total // tj
    inv_sig2 = 1.0 / (sigma * sigma)

    xi = [xblk_ref[dd, :][:, None] for dd in range(d)]
    mxi = xblk_ref[d, :][:, None]

    def body(jt, acc):
        j0 = jt * tj
        qj = [q_ref[dd, pl.ds(j0, tj)][None, :] for dd in range(d)]
        pj = [q_ref[d + dd, pl.ds(j0, tj)][None, :] for dd in range(d)]
        mj = q_ref[2 * d, pl.ds(j0, tj)][None, :]
        diffs = [xi[dd] - qj[dd] for dd in range(d)]
        d2 = diffs[0] * diffs[0]
        for dd in range(1, d):
            d2 = d2 + diffs[dd] * diffs[dd]
        k = jnp.exp(-0.5 * d2 * inv_sig2) * mj
        vx, dc = acc
        vx = [
            vx[dd] + jnp.sum(k * pj[dd], axis=1, keepdims=True)
            for dd in range(d)
        ]
        if eta != 0.0:
            vx = [
                vx[dd]
                + eta * inv_sig2 * jnp.sum(k * diffs[dd], axis=1,
                                           keepdims=True)
                for dd in range(d)
            ]
        if withlogdet:
            proj = diffs[0] * pj[0]
            for dd in range(1, d):
                proj = proj + diffs[dd] * pj[dd]
            dc = dc + jnp.sum(mxi * k * proj, axis=1, keepdims=True) * inv_sig2
            if eta != 0.0:
                dc = dc + eta * inv_sig2 * jnp.sum(
                    mxi * k * (d2 * inv_sig2 - d), axis=1, keepdims=True
                )
        return (vx, dc)

    acc0 = (
        [jnp.zeros((ti, 1), jnp.float32) for _ in range(d)],
        jnp.zeros((ti, 1), jnp.float32),
    )
    vx, dc = jax.lax.fori_loop(0, n_j, body, acc0)
    for dd in range(d):
        out_ref[dd, :] = (vx[dd] * mxi)[:, 0]
    out_ref[d, :] = dc[:, 0]
    for r in range(d + 1, _ROWS):
        out_ref[r, :] = jnp.zeros((ti,), jnp.float32)


def _vx_fwd_pallas(x, maskx, q, p, maskq, sigma, eta, withlogdet, ti=256,
                   tj=512):
    nx, d = x.shape
    m = q.shape[0]
    nx_pad = -(-nx // ti) * ti
    m_pad = -(-m // tj) * tj
    xpacked = _pack([x[:, dd] for dd in range(d)] + [maskx], nx_pad)
    qpacked = _pack(
        [q[:, dd] for dd in range(d)] + [p[:, dd] for dd in range(d)] + [maskq],
        m_pad,
    )
    grid = nx_pad // ti
    if eta == 0.0:
        kernel = functools.partial(
            _vx_mm_kernel, sigma=float(sigma),
            withlogdet=bool(withlogdet), tj=tj, d=d
        )
    else:
        kernel = functools.partial(
            _vx_kernel, sigma=float(sigma), eta=float(eta),
            withlogdet=bool(withlogdet), tj=tj, d=d
        )
    out = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((_ROWS, ti), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_ROWS, ti), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((_ROWS, nx_pad), jnp.float32),
        interpret=_interpret(),
    )(xpacked, qpacked)
    vx = out[0:d, :nx].T
    dc = jnp.sum(out[d])
    return vx, dc


def _rhs_self_bwd_kernel(blk_ref, full_ref, gc_ref, out_ref, *, sigma, tj, d):
    """Fused backward of the self RHS (eta == 0): (dq, dp) from cotangents.

    Packing (16 rows, lane = points):
      blk/full rows: [q 0..d-1 | p d..2d-1 | mask 2d | gv 2d+1..3d |
                      gg 3d+1..4d]  (4d+1 <= 13 rows used)
    gc_ref: (1, 1) SMEM scalar — cotangent of the divergence cost.
    out rows: [dq 0..d-1 | dp d..2d-1].

    Derivation: L = gv.vq + gg.(-Gq) + gc.dc with
      vq_i = m_i sum_j k_ij m_j p_j
      Gq_i = m_i sum_j (-delta_ij/s2) k_ij m_j (p_i.p_j)
      dc   = -(1/s2) sum_ij m_i m_j k_ij (p_i.delta_ij)
    Every term of dL/dq_l, dL/dp_l is a row reduction over j with payloads
    from (p, m.gv, m.gg) — one pass over the tile space.
    """
    ti = blk_ref.shape[1]
    m_total = full_ref.shape[1]
    n_j = m_total // tj
    inv_s2 = 1.0 / (sigma * sigma)
    gc = gc_ref[0, 0]

    def col(ref, r):
        return ref[r, :][:, None]

    qi = [col(blk_ref, dd) for dd in range(d)]
    pi = [col(blk_ref, d + dd) for dd in range(d)]
    mi = col(blk_ref, 2 * d)
    # fold row masks into the cotangents once
    gvi = [col(blk_ref, 2 * d + 1 + dd) * mi for dd in range(d)]
    ggi = [col(blk_ref, 3 * d + 1 + dd) * mi for dd in range(d)]

    def body(jt, acc):
        j0 = jt * tj

        def row(r):
            return full_ref[r, pl.ds(j0, tj)][None, :]

        qj = [row(dd) for dd in range(d)]
        pj = [row(d + dd) for dd in range(d)]
        mj = row(2 * d)
        gvj = [row(2 * d + 1 + dd) * mj for dd in range(d)]
        ggj = [row(3 * d + 1 + dd) * mj for dd in range(d)]

        delta = [qi[dd] - qj[dd] for dd in range(d)]
        d2 = delta[0] * delta[0]
        for dd in range(1, d):
            d2 = d2 + delta[dd] * delta[dd]
        k = jnp.exp(-0.5 * d2 * inv_s2)
        km = k * mj  # column-masked kernel

        # pair scalars (TI, TJ)
        b = pi[0] * pj[0]
        gv_dot_pj = gvi[0] * pj[0]
        ggl_dot_delta = ggi[0] * delta[0]
        ggj_dot_delta = ggj[0] * delta[0]
        gvj_dot_pl = gvj[0] * pi[0]
        pl_dot_delta = pi[0] * delta[0]
        pj_dot_delta = pj[0] * delta[0]
        for dd in range(1, d):
            b = b + pi[dd] * pj[dd]
            gv_dot_pj = gv_dot_pj + gvi[dd] * pj[dd]
            ggl_dot_delta = ggl_dot_delta + ggi[dd] * delta[dd]
            ggj_dot_delta = ggj_dot_delta + ggj[dd] * delta[dd]
            gvj_dot_pl = gvj_dot_pl + gvj[dd] * pi[dd]
            pl_dot_delta = pl_dot_delta + pi[dd] * delta[dd]
            pj_dot_delta = pj_dot_delta + pj[dd] * delta[dd]

        dq, dp = acc
        # scalar row-coefficients multiplying delta_d and p_d / basis vectors
        coef_delta = (
            -inv_s2 * km * gv_dot_pj                      # T1a
            - inv_s2 * (mi * k) * gvj_dot_pl              # T1b
            - inv_s2 * inv_s2 * km * ggl_dot_delta * b    # T2k-a
            + inv_s2 * inv_s2 * (mi * k) * ggj_dot_delta * b  # T2k-b
            + gc * mi * inv_s2 * inv_s2 * km * (pl_dot_delta - pj_dot_delta)  # T3k
        )
        coef_ggl = inv_s2 * km * b                        # T2d-a (times gg_l)
        coef_ggj = -inv_s2 * (mi * k) * b                 # T2d-b (times gg_j)
        coef_pl3 = -gc * mi * inv_s2 * km                 # T3d-a (times p_l)
        coef_pj3 = gc * mi * inv_s2 * km                  # T3d-b (times p_j)

        coef_pj_dp = (
            inv_s2 * km * ggl_dot_delta                   # T2a (times p_j)
            - inv_s2 * (mi * k) * ggj_dot_delta           # T2b (times p_j)
        )
        coef_gvj_dp = mi * k                              # T1 (times gv_j)
        coef_delta_dp = -gc * mi * inv_s2 * km            # T3 (times delta)

        # row-sums shared across dims: hoist out of the per-dim loop
        sum_ggl = jnp.sum(coef_ggl, axis=1, keepdims=True)
        sum_pl3 = jnp.sum(coef_pl3, axis=1, keepdims=True)
        new_dq = []
        new_dp = []
        for dd in range(d):
            dq_dd = jnp.sum(
                coef_delta * delta[dd]
                + coef_ggj * ggj[dd]
                + coef_pj3 * pj[dd],
                axis=1, keepdims=True,
            ) + sum_ggl * ggi[dd] + sum_pl3 * pi[dd]
            dp_dd = jnp.sum(
                coef_pj_dp * pj[dd]
                + coef_gvj_dp * gvj[dd]
                + coef_delta_dp * delta[dd],
                axis=1, keepdims=True,
            )
            new_dq.append(dq[dd] + dq_dd)
            new_dp.append(dp[dd] + dp_dd)
        return (new_dq, new_dp)

    acc0 = (
        [jnp.zeros((ti, 1), jnp.float32) for _ in range(d)],
        [jnp.zeros((ti, 1), jnp.float32) for _ in range(d)],
    )
    dq, dp = jax.lax.fori_loop(0, n_j, body, acc0)
    for dd in range(d):
        out_ref[dd, :] = dq[dd][:, 0]
        out_ref[d + dd, :] = dp[dd][:, 0]
    for r in range(2 * d, _ROWS):
        out_ref[r, :] = jnp.zeros((ti,), jnp.float32)


def _rhs_self_bwd_pallas(q, p, mask, gv, gg, gc, sigma, ti=256, tj=512):
    m, d = q.shape
    step = max(ti, tj)
    mpad = -(-m // step) * step
    rows16 = 16
    packed = jnp.zeros((rows16, mpad), jnp.float32)
    cols = (
        [q[:, dd] for dd in range(d)] + [p[:, dd] for dd in range(d)]
        + [mask] + [gv[:, dd] for dd in range(d)] + [gg[:, dd] for dd in range(d)]
    )
    for i, c in enumerate(cols):
        packed = packed.at[i, :m].set(c)
    grid = mpad // ti
    kernel = functools.partial(_rhs_self_bwd_kernel, sigma=float(sigma),
                               tj=tj, d=d)
    out = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((rows16, ti), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((_ROWS, ti), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((_ROWS, mpad), jnp.float32),
        interpret=_interpret(),
    )(packed, packed, jnp.reshape(gc.astype(jnp.float32), (1, 1)))
    dq = out[0:d, :m].T
    dp = out[d : 2 * d, :m].T
    return dq, dp


def make_rhs_self(sigma: float, eta: float, withlogdet: bool,
                  ti: int = 256, tj: int = 512):
    """Build the custom-VJP fused self-RHS op for a fixed configuration.

    Forward: Pallas kernel (any eta — the gradcomponent terms stream in the
    same tile pass).  Backward: hand-derived Pallas kernel for eta == 0 (the
    default configs); for eta != 0 the VJP of the blockwise implementation
    (tile-streamed, O(M) memory — correct at scale, slower than a dedicated
    kernel)."""

    @jax.custom_vjp
    def op(q, p, mask):
        if eta == 0.0:
            # payload-matmul kernels: reductions ride the MXU.  The
            # symmetric-pair variants compute each unordered tile pair once
            # (halves the exp work — the VPU roofline): table-resident in
            # VMEM up to ~140k points, block-pair decomposition beyond.
            qc = q - _mm_center(q, mask)
            vq, gq, dc = _rhs_self_fwd_best(qc, p, mask, sigma, withlogdet,
                                            ti, tj)
        elif (q.shape[0] >= _POLY_FWD_MIN_M
              and _BWD_PRECISION["mode"] != "accurate"):
            # generated payload-matmul forward (pair_poly): the same
            # component densities the generated backward differentiates,
            # every output an MXU kernel-sum — the streaming VPU kernel
            # runs ~1/3 of this pace at scale (68 vs ~190 Gpair/s at 131k)
            from difficp_tpu.ops.pair_poly import rhs_self_fwd_poly

            qc = q - _mm_center(q, mask)
            vq, gq, dc = rhs_self_fwd_poly(qc, p, mask, sigma, eta,
                                           withlogdet, ti, tj)
        else:
            vq, gq, dc = _rhs_self_fwd_pallas(q, p, mask, sigma, eta,
                                              withlogdet, ti, tj)
        return vq, -gq, dc  # contract: (v(q), -Gq, dcost)

    def fwd(q, p, mask):
        return op(q, p, mask), (q, p, mask)

    def bwd(res, cot):
        q, p, mask = res
        if _BWD_PRECISION["mode"] == "accurate":
            from difficp_tpu.ops import blockwise as _block

            _, vjp = jax.vjp(
                lambda q_, p_: _block.lddmm_rhs_self(q_, p_, sigma, eta,
                                                     withlogdet, mask),
                q, p,
            )
            dq, dp = vjp(cot)
            return dq, dp, None
        if eta != 0.0:
            # generated payload-matmul backward (pair_poly): the full
            # gradcomponent pair density differentiated symbolically, every
            # term an MXU kernel-sum — replaces the blockwise-VJP fallback
            from difficp_tpu.ops.pair_poly import rhs_self_bwd_poly

            gv, gg, gc = cot
            if not withlogdet:
                gc = jnp.zeros((), q.dtype)
            qc = q - _mm_center(q, mask)
            dq, dp = rhs_self_bwd_poly(qc, p, mask, gv, gg, gc, sigma, eta,
                                       ti, tj)
            return dq, dp, None
        gv, gg, gc = cot
        if not withlogdet:
            gc = jnp.zeros((), q.dtype)  # dcost output is the constant 0
        # symmetric-pair backward: each unordered tile pair's exp tile is
        # computed once (block-pair decomposition keeps any M under the
        # VMEM budget).  Below ~32k points the dual-table + epilogue fixed
        # cost outweighs the halved exp work (TPU v5e: 30 vs 49 Gpair/s at
        # 16k) — use the full-pairs kernel there.
        # NOTE: fwd and bwd MUST center identically — the epilogue
        # identities assume the table monomials and the row-side
        # recombination share one coordinate origin.  _mm_center is
        # deterministic in (q, mask), so recomputing it here equals the
        # fwd's shift exactly.
        qc = q - _mm_center(q, mask)
        if q.shape[0] >= _SYM_BWD_MIN_M:
            # no explicit tile: _rhs_self_bwd_sym_mm picks (t, skew) by d
            dq, dp = _rhs_self_bwd_sym_mm(qc, p, mask, gv, gg, gc, sigma)
        else:
            dq, dp = _rhs_self_bwd_mm(qc, p, mask, gv, gg, gc, sigma, ti, tj)
        return dq, dp, None

    op.defvjp(fwd, bwd)
    return op


# ---------------------------------------------------------------------------
# Payload-matmul (MXU) kernels — the eta == 0 speed-of-light path
# ---------------------------------------------------------------------------
# Every reduction of the fused self RHS *and of its VJP* is expressible as a
# kernel-sum convolution A[c]_i = sum_j Kt_ij c_j (Kt = exp(-|dq|^2/2s^2) m_j)
# against a fixed table of payload columns c built from products of j-side
# rows (q, p, gv, gg).  Instead of ~40 VPU reduction chains per tile pair,
# the kernel computes ONE (TI, TJ) x (ncols, TJ)^T matmul on the MXU; the
# VPU only does d2 + exp + the payload-row products (~ncols/TI of the tile
# work) and a cheap (TI, ncols) row-side recombination.  ncols: 9 fwd / 45
# bwd at d = 2 (19 / 94 at d = 3) — all below the 128-lane MXU tile, so the
# matmul costs the same as a single column.
#
# Measured TPU v5e, M = 65k, d = 2: streaming kernels 121 (fwd) / 53 (bwd)
# Gpair/s; exp-only roofline 268; payload-matmul prototype 238 at 128 cols.

# Matmul numerics (measured on the 48-col payload contraction, TPU v5e,
# M = 65k): "default" 1-pass bf16 244 Gpair/s / 3.7e-3 max rel err;
# "highest" 6-pass f32 99 Gpair/s / 3e-7; "split3" manual 3-pass bf16
# splitting 138 Gpair/s / 8e-6.  split3 keeps the repo's f32 accuracy
# invariant at ~2.6x the streaming bwd kernel's throughput.
_MM_MODE = "split3"  # "split3" | "default" | "highest"

# Backward-pass precision policy (the api knob of VERDICT r2 item 4).
# "fast" = payload-matmul backward kernels.  As of r5 the eta == 0 fast
# backward is ALSO precise on registration-geometry clouds: Morton sorting
# + per-block-pair re-centered recombination put the dq relative error at
# ~3.3e-6 (TPU-measured at 131k vs the blockwise f32 VJP; was ~8e-4 with
# the global-origin epilogue), at ~8% throughput cost (182 vs 199 Gpair/s).
# "accurate" = blockwise-VJP backward: f32-exact (~2e-7) on ANY geometry,
# tile-streamed, ~10x slower — still the call for adversarially spread
# clouds (R/sigma >~ 10, where f32 exp-argument rounding floors the fast
# path at ~1e-4) or for eta != 0 degree-4 monomials.  Read at TRACE time:
# set it BEFORE jitting/tracing the program that should use it.
_BWD_PRECISION = {"mode": "fast"}


def set_bwd_precision(mode: str):
    assert mode in ("fast", "accurate"), mode
    _BWD_PRECISION["mode"] = mode


# Matmul mode of the BACKWARD payload contractions (None = global _MM_MODE,
# i.e. split3).  TPU-measured r5 (benchmarks/bwd_prec_bench.py, 131k): with
# Morton sorting + per-block-pair centering the split3 backward reaches dq
# 3.3e-6 on registration-geometry clouds at 182 Gpair/s; "highest" (6-pass
# f32) costs 25% throughput for NO error gain — the residual floor is f32
# EXP-ARGUMENT rounding (eps * d2/2sigma^2, amplified by the block-local
# monomial ratio), which no matmul mode can remove.  Adversarial geometry
# (N(0,1) at sigma=0.2, R/sigma ~ 15) floors at ~1.7e-4 (was 8e-4 with the
# global-origin recombination).
_BWD_MM_MODE = None


def _mm_dot(k, pt, mode=None):
    """(TI, TJ) x (ncols, TJ)^T -> (TI, ncols) contraction on the MXU
    (delegates to _mm3 so every kernel shares ONE numerics policy)."""
    return _mm3(k, pt, (((1,), (1,)), ((), ())), mode=mode)


def _mm3(a, b, dn, mode=None):
    """dot_general under the _MM_MODE numerics policy (or the explicit
    ``mode`` override), for arbitrary contraction dims.  split3 = 3-pass
    bf16 emulation of the f32 product (hi*hi + hi*lo + lo*hi; the dropped
    lo*lo term is O(2^-16) relative).  The single implementation behind
    every payload-matmul kernel."""
    _MM_MODE = mode or globals()["_MM_MODE"]
    if _MM_MODE in ("split3", "split4"):
        a_hi = a.astype(jnp.bfloat16)
        a_lo = (a - a_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        b_hi = b.astype(jnp.bfloat16)
        b_lo = (b - b_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        out = jax.lax.dot_general(a_hi, b_hi, dn,
                                  preferred_element_type=jnp.float32)
        out = out + jax.lax.dot_general(a_hi, b_lo, dn,
                                        preferred_element_type=jnp.float32)
        out = out + jax.lax.dot_general(a_lo, b_hi, dn,
                                        preferred_element_type=jnp.float32)
        if _MM_MODE == "split4":
            # the lo*lo pass split3 drops is the 8e-6 relative floor; with
            # it, the split reaches the f32-accumulation floor (~3e-7)
            out = out + jax.lax.dot_general(
                a_lo, b_lo, dn, preferred_element_type=jnp.float32)
        return out
    return jax.lax.dot_general(a, b, dn, preferred_element_type=jnp.float32,
                               precision=_MM_MODE)


def _key2(a, b):
    """Unordered pair key (payload q_a*q_b is symmetric)."""
    return (a, b) if a <= b else (b, a)


def _fwd_col_table(d):
    names = [("one",)]
    names += [("q", e) for e in range(d)]
    names += [("p", f) for f in range(d)]
    names += [("qp", e, f) for e in range(d) for f in range(d)]
    return {n: i for i, n in enumerate(names)}


def _bwd_col_table(d):
    names = [("one",)]
    names += [("q", e) for e in range(d)]
    names += [("p", f) for f in range(d)]
    names += [("qp", e, f) for e in range(d) for f in range(d)]
    names += [("G", f) for f in range(d)]
    names += [("qG", e, f) for e in range(d) for f in range(d)]
    names += [("Hp", e, f) for e in range(d) for f in range(d)]
    names += [("Hqp", f) for f in range(d)]
    names += [("qHp", a, e, f)
              for a in range(d) for e in range(d) for f in range(d)]
    names += [("qHqp", a, f) for a in range(d) for f in range(d)]
    names += [("qqp", a, b, f)
              for a in range(d) for b in range(a, d) for f in range(d)]
    names += [("qq", a, b) for a in range(d) for b in range(a, d)]
    names += [("pq",)]
    names += [("qpq", a) for a in range(d)]
    return {n: i for i, n in enumerate(names)}


def _rhs_self_mm_kernel(blk_ref, full_ref, out_ref, *, sigma, withlogdet,
                        tj, d):
    """Payload-matmul forward of the fused self RHS (eta == 0).

    Same packing contract as ``_rhs_self_kernel``; out rows
    [vq | Gq | dcost].  Row-side identities (u = 1/sigma^2):
      vq_f   = A[p_f]
      Gq_dd  = -u ( q_dd sum_e p_e A[p_e] - sum_e p_e A[q_dd p_e] )
      dcost  = -u m ( (p.q) A[1] - sum_e p_e A[q_e] )
    """
    ti = blk_ref.shape[1]
    n_j = full_ref.shape[1] // tj
    u = 1.0 / (sigma * sigma)
    idx = _fwd_col_table(d)
    ncols = len(idx)

    qi = [blk_ref[dd, :][:, None] for dd in range(d)]
    pi = [blk_ref[d + dd, :][:, None] for dd in range(d)]
    mi = blk_ref[2 * d, :][:, None]

    def body(jt, acc):
        j0 = jt * tj
        qj = [full_ref[dd, pl.ds(j0, tj)] for dd in range(d)]
        pj = [full_ref[d + dd, pl.ds(j0, tj)] for dd in range(d)]
        mj = full_ref[2 * d, pl.ds(j0, tj)]
        d2 = (qi[0] - qj[0][None, :]) ** 2
        for dd in range(1, d):
            d2 = d2 + (qi[dd] - qj[dd][None, :]) ** 2
        k = jnp.exp(-0.5 * d2 * u) * mj[None, :]

        rows = [None] * ncols
        rows[idx[("one",)]] = jnp.ones((tj,), jnp.float32)
        for e in range(d):
            rows[idx[("q", e)]] = qj[e]
            rows[idx[("p", e)]] = pj[e]
        for e in range(d):
            for f in range(d):
                rows[idx[("qp", e, f)]] = qj[e] * pj[f]
        pt = jnp.stack(rows, axis=0)
        return acc + _mm_dot(k, pt)

    acc = jax.lax.fori_loop(
        0, n_j, body, jnp.zeros((ti, ncols), jnp.float32)
    )

    def A(*key):
        return acc[:, idx[key]][:, None]

    vq = [A("p", f) for f in range(d)]
    for dd in range(d):
        t = qi[dd] * sum(pi[e] * A("p", e) for e in range(d))
        t = t - sum(pi[e] * A("qp", dd, e) for e in range(d))
        out_ref[d + dd, :] = (-u * t * mi)[:, 0]
        out_ref[dd, :] = (vq[dd] * mi)[:, 0]
    if withlogdet:
        pq = sum(pi[e] * qi[e] for e in range(d))
        dc = -u * mi * (pq * A("one") - sum(pi[e] * A("q", e)
                                            for e in range(d)))
        out_ref[2 * d, :] = dc[:, 0]
    else:
        out_ref[2 * d, :] = jnp.zeros((ti,), jnp.float32)
    for r in range(2 * d + 1, _ROWS):
        out_ref[r, :] = jnp.zeros((ti,), jnp.float32)


def _rhs_self_bwd_mm_kernel(blk_ref, full_ref, gc_ref, out_ref, *, sigma,
                            tj, d, mm_mode=None):
    """Payload-matmul backward of the self RHS (eta == 0).

    Same contract as ``_rhs_self_bwd_kernel`` (16-row packing, out rows
    [dq | dp]).  Derivation: with G = m.gv, H = m.gg, C = gc and
    L = sum_ij Kt_ij S_ij,  S_ij = G_i.p_j + u (H_i.d_ij)(p_i.p_j)
    - u C m_i (p_i.d_ij)  (d_ij = q_i - q_j), every dL/dq_l, dL/dp_l term
    expands into A[c] columns; see the table in ``_bwd_col_table``.
    """
    ti = blk_ref.shape[1]
    n_j = full_ref.shape[1] // tj
    u = 1.0 / (sigma * sigma)
    u2 = u * u
    gc = gc_ref[0, 0]
    idx = _bwd_col_table(d)
    ncols = len(idx)

    mi = blk_ref[2 * d, :][:, None]
    # per-x-tile coordinate re-centering (dq-precision fix): the telescoped
    # row-side identities are origin-invariant, so shift q to the tile's
    # masked centroid — with Morton-sorted inputs (see the wrapper) the
    # monomial magnitudes drop from the cloud radius to the tile radius +
    # kernel support, collapsing the (R/sigma)^2 cancellation amplification
    msum = jnp.maximum(jnp.sum(mi), 1.0)
    cq = [jnp.sum(blk_ref[dd, :][:, None] * mi) / msum for dd in range(d)]
    qi = [blk_ref[dd, :][:, None] - cq[dd] for dd in range(d)]
    pi = [blk_ref[d + dd, :][:, None] for dd in range(d)]
    Gi = [blk_ref[2 * d + 1 + dd, :][:, None] * mi for dd in range(d)]
    Hi = [blk_ref[3 * d + 1 + dd, :][:, None] * mi for dd in range(d)]

    def body(jt, acc):
        j0 = jt * tj
        qj = [full_ref[dd, pl.ds(j0, tj)] - cq[dd] for dd in range(d)]
        pj = [full_ref[d + dd, pl.ds(j0, tj)] for dd in range(d)]
        mj = full_ref[2 * d, pl.ds(j0, tj)]
        Gj = [full_ref[2 * d + 1 + dd, pl.ds(j0, tj)] * mj for dd in range(d)]
        Hj = [full_ref[3 * d + 1 + dd, pl.ds(j0, tj)] * mj for dd in range(d)]

        d2 = (qi[0] - qj[0][None, :]) ** 2
        for dd in range(1, d):
            d2 = d2 + (qi[dd] - qj[dd][None, :]) ** 2
        k = jnp.exp(-0.5 * d2 * u) * mj[None, :]

        Hq = Hj[0] * qj[0]
        pq = pj[0] * qj[0]
        for e in range(1, d):
            Hq = Hq + Hj[e] * qj[e]
            pq = pq + pj[e] * qj[e]

        rows = [None] * ncols
        rows[idx[("one",)]] = jnp.ones((tj,), jnp.float32)
        rows[idx[("pq",)]] = pq
        for e in range(d):
            rows[idx[("q", e)]] = qj[e]
            rows[idx[("p", e)]] = pj[e]
            rows[idx[("G", e)]] = Gj[e]
            rows[idx[("Hqp", e)]] = Hq * pj[e]
            rows[idx[("qpq", e)]] = qj[e] * pq
        for e in range(d):
            for f in range(d):
                rows[idx[("qp", e, f)]] = qj[e] * pj[f]
                rows[idx[("qG", e, f)]] = qj[e] * Gj[f]
                rows[idx[("Hp", e, f)]] = Hj[e] * pj[f]
                rows[idx[("qHqp", e, f)]] = qj[e] * Hq * pj[f]
        for a in range(d):
            for e in range(d):
                for f in range(d):
                    rows[idx[("qHp", a, e, f)]] = qj[a] * Hj[e] * pj[f]
        for a in range(d):
            for b in range(a, d):
                rows[idx[("qq", a, b)]] = qj[a] * qj[b]
                for f in range(d):
                    rows[idx[("qqp", a, b, f)]] = qj[a] * qj[b] * pj[f]
        pt = jnp.stack(rows, axis=0)
        return acc + _mm_dot(k, pt, mode=mm_mode)

    acc = jax.lax.fori_loop(
        0, n_j, body, jnp.zeros((ti, ncols), jnp.float32)
    )

    def A(*key):
        return acc[:, idx[key]][:, None]

    Hq_i = sum(Hi[e] * qi[e] for e in range(d))
    pq_i = sum(pi[e] * qi[e] for e in range(d))

    # ---- dp -----------------------------------------------------------
    for f in range(d):
        dp = A("G", f)
        dp = dp + u * (A("Hqp", f) - sum(qi[e] * A("Hp", e, f)
                                         for e in range(d)))
        dp = dp + u * (Hq_i * A("p", f) - sum(Hi[e] * A("qp", e, f)
                                              for e in range(d)))
        dp = dp - u * gc * (qi[f] * A("one") - A("q", f))
        out_ref[d + f, :] = (dp * mi)[:, 0]

    # ---- dq -----------------------------------------------------------
    sum_G_Ap = sum(Gi[e] * A("p", e) for e in range(d))
    sum_p_Ap = sum(pi[e] * A("p", e) for e in range(d))
    sum_p_Aq = sum(pi[e] * A("q", e) for e in range(d))
    for dd in range(d):
        # T1a: k-derivative (row role) of the gv.vq term
        t = -u * (qi[dd] * sum_G_Ap
                  - sum(Gi[e] * A("qp", dd, e) for e in range(d)))
        # T1b: k-derivative (row) of the gg.(-Gq) term
        s = jnp.zeros((ti, 1), jnp.float32)
        for e in range(d):
            for f in range(d):
                s = s + Hi[e] * pi[f] * (
                    qi[dd] * qi[e] * A("p", f)
                    - qi[dd] * A("qp", e, f)
                    - qi[e] * A("qp", dd, f)
                    + A("qqp", *_key2(dd, e), f)
                )
        t = t - u2 * s
        # T1c: k-derivative (row) of the gc.dc term
        t = t + u2 * gc * (
            qi[dd] * pq_i * A("one")
            - qi[dd] * sum_p_Aq
            - pq_i * A("q", dd)
            + sum(pi[f] * A("qq", *_key2(dd, f)) for f in range(d))
        )
        # T2a: k-derivative (col role) of the gv.vq term
        t = t + u * sum(pi[f] * (A("qG", dd, f) - qi[dd] * A("G", f))
                        for f in range(d))
        # T2b: k-derivative (col) of the gg.(-Gq) term
        s = jnp.zeros((ti, 1), jnp.float32)
        for f in range(d):
            s = s + pi[f] * (
                A("qHqp", dd, f)
                - qi[dd] * A("Hqp", f)
                - sum(qi[e] * A("qHp", dd, e, f) for e in range(d))
                + qi[dd] * sum(qi[e] * A("Hp", e, f) for e in range(d))
            )
        t = t + u2 * s
        # T2c: k-derivative (col) of the gc.dc term
        t = t - u2 * gc * (
            A("qpq", dd)
            - qi[dd] * A("pq")
            - sum(qi[e] * A("qp", dd, e) for e in range(d))
            + qi[dd] * sum(qi[e] * A("p", e) for e in range(d))
        )
        # T3: delta-derivative (row role)
        t = t + u * Hi[dd] * sum_p_Ap - u * gc * pi[dd] * A("one")
        # T4: delta-derivative (col role)
        t = t - u * sum(pi[f] * A("Hp", dd, f) for f in range(d))
        t = t + u * gc * A("p", dd)
        out_ref[dd, :] = (t * mi)[:, 0]

    for r in range(2 * d, _ROWS):
        out_ref[r, :] = jnp.zeros((ti,), jnp.float32)


def _rhs_self_fwd_mm(q, p, mask, sigma, withlogdet, ti=256, tj=512):
    """Payload-matmul forward wrapper (same contract as
    ``_rhs_self_fwd_pallas``, eta == 0 only)."""
    m, d = q.shape
    step = max(ti, tj)
    mpad = -(-m // step) * step
    packed = _pack(
        [q[:, dd] for dd in range(d)] + [p[:, dd] for dd in range(d)] + [mask],
        mpad,
    )
    kernel = functools.partial(
        _rhs_self_mm_kernel, sigma=float(sigma),
        withlogdet=bool(withlogdet), tj=tj, d=d,
    )
    out = pl.pallas_call(
        kernel,
        grid=(mpad // ti,),
        in_specs=[
            pl.BlockSpec((_ROWS, ti), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_ROWS, ti), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((_ROWS, mpad), jnp.float32),
        interpret=_interpret(),
    )(packed, packed)
    vq = out[0:d, :m].T
    gq = out[d : 2 * d, :m].T
    dc = jnp.sum(out[2 * d])
    return vq, gq, dc


def _rhs_self_sym_mm_kernel(full_ref, out_ref, *, sigma, t, d):
    """Symmetric-pair payload-matmul forward of the fused self RHS.

    The Gaussian kernel is symmetric (K_ij = K_ji), so each unordered tile
    pair (i, j<=i) is computed ONCE: grid step i streams j-tiles 0..i,
    evaluates the (t, t) exp tile once, and accumulates BOTH sides —
    A_i[c] += sum_j K_ij m_j c_j  and  A_j[c] += sum_i K_ij m_i c_i.
    This halves the exp work, which is the measured VPU roofline of the
    full-pairs kernel (exp-only roofline ~268 Gpair/s on v5e; the
    full-pairs fwd sits at ~166).

    Because a point's table keeps receiving contributions until the LAST
    grid step, the row-side recombination (vq/Gq/dcost from A — linear in
    A) moves OUTSIDE the kernel (``_sym_epilogue``); out_ref is the raw
    (16, Mpad) kernel-sum table A, VMEM-resident across all grid steps
    (constant index map), rows ordered by ``_fwd_col_table(d)``.
    """
    i = pl.program_id(0)
    u = 1.0 / (sigma * sigma)
    idx = _fwd_col_table(d)
    ncols = len(idx)
    rows16 = out_ref.shape[0]

    @pl.when(i == 0)
    def _init():
        out_ref[...] = jnp.zeros_like(out_ref)

    i0 = i * t
    qi = [full_ref[dd, pl.ds(i0, t)] for dd in range(d)]
    pi = [full_ref[d + dd, pl.ds(i0, t)] for dd in range(d)]
    mi = full_ref[2 * d, pl.ds(i0, t)]

    def payload(qv, pv, mv):
        # (16, t) masked payload table (rows ncols..15 zero-padded so all
        # sublane blocks stay 8-aligned)
        rows = [jnp.zeros((t,), jnp.float32)] * rows16
        rows[idx[("one",)]] = mv
        for e in range(d):
            rows[idx[("q", e)]] = qv[e] * mv
            rows[idx[("p", e)]] = pv[e] * mv
        for e in range(d):
            for f in range(d):
                rows[idx[("qp", e, f)]] = qv[e] * pv[f] * mv
        return jnp.stack(rows, axis=0)

    pload_i = payload(qi, pi, mi)

    def stage(jt):
        # j-side VPU stage, clamped so the skewed prefetch of the final
        # iteration stays in bounds (its result is discarded)
        j0 = jnp.minimum(jt, i) * t
        qj = [full_ref[dd, pl.ds(j0, t)] for dd in range(d)]
        pj = [full_ref[d + dd, pl.ds(j0, t)] for dd in range(d)]
        mj = full_ref[2 * d, pl.ds(j0, t)]
        d2 = (qi[0][:, None] - qj[0][None, :]) ** 2
        for dd in range(1, d):
            d2 = d2 + (qi[dd][:, None] - qj[dd][None, :]) ** 2
        kraw = jnp.exp(-0.5 * d2 * u)  # (t_i, t_j), computed ONCE per pair
        return payload(qj, pj, mj), kraw

    # software-pipelined: the j-side VPU stage (payload + exp) runs one
    # iteration ahead of its two MXU contractions so the engines overlap
    def body(jt, carry):
        acc, (pload_cur, k_cur) = carry
        nxt = stage(jt + 1)
        # i-side: acc[c, ii] += sum_jj kraw[ii, jj] * pload_j[c, jj]
        acc = acc + _mm3(pload_cur, k_cur, (((1,), (1,)), ((), ())))
        # j-side (strictly off-diagonal; the diagonal tile already contains
        # both orderings of its within-tile pairs)
        off = jnp.where(jt == i, 0.0, 1.0).astype(jnp.float32)
        contrib = _mm3(pload_i, k_cur, (((1,), (0,)), ((), ())))  # (16, t_j)
        out_ref[:, pl.ds(jt * t, t)] += contrib * off
        return acc, nxt

    acc, _ = jax.lax.fori_loop(
        0, i + 1, body, (jnp.zeros((rows16, t), jnp.float32), stage(0))
    )
    out_ref[:, pl.ds(i0, t)] += acc


def _rhs_self_fwd_sym_mm(q, p, mask, sigma, withlogdet, t=256):
    """Symmetric-pair forward wrapper: pallas raw-table kernel + jnp
    epilogue.  Same output contract as ``_rhs_self_fwd_mm``."""
    m, d = q.shape
    mpad = -(-m // t) * t
    packed = _pack(
        [q[:, dd] for dd in range(d)] + [p[:, dd] for dd in range(d)] + [mask],
        mpad,
    )
    kernel = functools.partial(
        _rhs_self_sym_mm_kernel, sigma=float(sigma), t=t, d=d,
    )
    table = pl.pallas_call(
        kernel,
        grid=(mpad // t,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((16, mpad), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((16, mpad), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=_interpret(),
    )(packed)

    return _fwd_sym_epilogue(table[:, :m], q, p, mask, sigma, withlogdet, d)


# Shared VMEM budget for the block-pair / resident symmetric kernels, in
# f32 elements — DERIVED from the queried device VMEM capacity, not a
# literal.  Sized for VMAP SAFETY, not just the single-instance scoped
# limit: under vmap (the lockstep multi-frame Reg_opt) the compiler
# double-buffers the kernel's VMEM working set across the batch grid
# dimension, so a single-instance budget B compiles to ~2B — measured: the
# 10.5 MB bwd-sym working set OOMed at 20.09 MB under vmap(10) at N=65k
# while running fine single-frame at 131k.  On a 16 MB-VMEM core this
# evaluates to (16 MB - 1 MB slack) / 2 = 7.5 MB per instance — exactly
# the hand-calibrated v5e value of rounds 2-4.
_VMEM_SLACK_BYTES = 1024 * 1024   # compiler scratch / semaphores headroom
_VMAP_DB_FACTOR = 2               # measured vmap double-buffering factor


@functools.lru_cache(maxsize=None)
def _device_vmem_bytes() -> int:
    """Per-core VMEM capacity: DIFFICP_VMEM_BYTES env override, else keyed
    on the queried TPU device kind (v2-v5 generations ~16 MB/core, Trillium
    v6e 32 MB); the 16 MB default is also used on CPU so interpret-mode
    tests exercise the same tile shapes as the chip."""
    env = os.environ.get("DIFFICP_VMEM_BYTES")
    if env:
        return int(env)
    try:
        dev = jax.devices()[0]
        if dev.platform == "tpu":
            kind = (getattr(dev, "device_kind", "") or "").lower()
            if "v6" in kind or "trillium" in kind:
                return 32 * 1024 * 1024
    except Exception:
        pass
    return 16 * 1024 * 1024


@functools.lru_cache(maxsize=None)
def _sym_budget_floats() -> int:
    return (_device_vmem_bytes() - _VMEM_SLACK_BYTES) // _VMAP_DB_FACTOR // 4


@functools.lru_cache(maxsize=None)
def _sym_max_mpad() -> int:
    # symmetric fwd kernel: (8 + 16) rows x Mpad x 4 B resident table +
    # packed input; past this, the block-pair decomposition (same speed:
    # 226 vs 219 Gpair/s measured at 262k/131k) keeps every block under
    # the budget
    return (_sym_budget_floats() // 24 // 1024) * 1024
# Smallest point count where the symmetric-pair BACKWARD beats the
# full-pairs kernel (measured TPU v5e: 16k 30 vs 49, 65k 178 vs 132).
_SYM_BWD_MIN_M = 32768

# eta != 0 forwards switch from the streaming VPU kernels to the generated
# payload-matmul forward (pair_poly) at this many points: below it the
# payload-table fixed cost outweighs the MXU win (the streaming kernels are
# dispatch-bound there anyway); above it the MXU path is ~3x (68 -> ~190
# Gpair/s at 131k).
_POLY_FWD_MIN_M = 32768


def _fwd_payload_rows(q, p, m, d, idx, rows_total, t):
    """(rows_total, t) masked payload table for the FORWARD kernel-sum
    (rows ordered by ``_fwd_col_table``) — shared by the VMEM-resident
    symmetric kernel and the block-pair decomposition."""
    rows = [jnp.zeros((t,), jnp.float32)] * rows_total
    rows[idx[("one",)]] = m
    for e in range(d):
        rows[idx[("q", e)]] = q[e] * m
        rows[idx[("p", e)]] = p[e] * m
    for e in range(d):
        for f in range(d):
            rows[idx[("qp", e, f)]] = q[e] * p[f] * m
    return jnp.stack(rows, axis=0)


def _fwd_sym_epilogue(table, q, p, mask, sigma, withlogdet, d):
    """(vq, gq, dcost) row-side recombination from the raw forward
    kernel-sum table (rows, M) — identical identities to
    ``_rhs_self_mm_kernel``'s in-kernel epilogue, applied once per point
    after ALL accumulation (the symmetric kernels keep receiving
    contributions until the last grid step)."""
    idx = _fwd_col_table(d)
    u = 1.0 / (sigma * sigma)
    A = {key: table[col] for key, col in idx.items()}
    qs = [q[:, dd] for dd in range(d)]
    ps = [p[:, dd] for dd in range(d)]
    vq = jnp.stack([A[("p", f)] for f in range(d)], axis=1) * mask[:, None]
    gq_cols = []
    for dd in range(d):
        tt = qs[dd] * sum(ps[e] * A[("p", e)] for e in range(d))
        tt = tt - sum(ps[e] * A[("qp", dd, e)] for e in range(d))
        gq_cols.append(-u * tt * mask)
    gq = jnp.stack(gq_cols, axis=1)
    if withlogdet:
        pq = sum(ps[e] * qs[e] for e in range(d))
        dc = jnp.sum(
            -u * mask * (pq * A[("one",)] - sum(ps[e] * A[("q", e)]
                                                for e in range(d)))
        )
    else:
        dc = jnp.zeros((), jnp.float32)
    return vq, gq, dc


def _bwd_payload_rows(q, p, m, G, H, d, idx, rows_total, t):
    """(rows_total, t) masked payload table for the BACKWARD kernel-sum
    A[c] = sum K c (rows ordered by ``_bwd_col_table``; q/p/m/G/H are (t,)
    per-dim lists / vectors, G/H already m-masked).  Shared by the ordered
    and the symmetric-pair backward kernels."""
    Hq = H[0] * q[0]
    pq = p[0] * q[0]
    for e in range(1, d):
        Hq = Hq + H[e] * q[e]
        pq = pq + p[e] * q[e]
    rows = [jnp.zeros((t,), jnp.float32)] * rows_total
    rows[idx[("one",)]] = m
    rows[idx[("pq",)]] = pq * m
    for e in range(d):
        rows[idx[("q", e)]] = q[e] * m
        rows[idx[("p", e)]] = p[e] * m
        rows[idx[("G", e)]] = G[e]
        rows[idx[("Hqp", e)]] = Hq * p[e]
        rows[idx[("qpq", e)]] = q[e] * pq * m
    for e in range(d):
        for f in range(d):
            rows[idx[("qp", e, f)]] = q[e] * p[f] * m
            rows[idx[("qG", e, f)]] = q[e] * G[f]
            rows[idx[("Hp", e, f)]] = H[e] * p[f]
            rows[idx[("qHqp", e, f)]] = q[e] * Hq * p[f]
    for a in range(d):
        for e in range(d):
            for f in range(d):
                rows[idx[("qHp", a, e, f)]] = q[a] * H[e] * p[f]
    for a in range(d):
        for b in range(a, d):
            rows[idx[("qq", a, b)]] = q[a] * q[b] * m
            for f in range(d):
                rows[idx[("qqp", a, b, f)]] = q[a] * q[b] * p[f] * m
    return jnp.stack(rows, axis=0)


def _rhs_self_sym_pair_kernel(blka_ref, fullb_ref, ta_ref, tb_ref, *,
                              sigma, t, d, rows_total, same_block, mode,
                              skew=True):
    """One block pair (a, b) of a symmetric-pair kernel-sum (fwd or bwd).

    Grid over a's i-tiles; streams b's j-tiles (j <= i with a
    diagonal-once rule when ``same_block``, else all).  Each (t, t) exp
    tile is evaluated ONCE and accumulates both sides of the payload
    table:  Ta_i[c] += sum_j K m_j c_j,  Tb_j[c] += sum_i K m_i c_i.
    Ta is emitted per i-tile; Tb is a VMEM-resident (rows, Mb) block
    accumulated across grid steps.  The row-side recombination (linear in
    the table) runs OUTSIDE (``_fwd_sym_epilogue`` / ``_bwd_sym_epilogue``).

    ``mode``: "fwd" = 9/16-column forward table of ``_fwd_col_table``
    (lifts the VMEM-resident forward kernel's ~140k ceiling — any M);
    "bwd" = 45/94-column backward table of ``_bwd_col_table`` (the
    full-table-resident trick never fit the backward: (45+ rows) x M x 4 B
    busts VMEM at 131k points).  2-level decomposition either way:
    python-level unordered block pairs, kernel-level unordered tile pairs.
    """
    i = pl.program_id(0)
    u = 1.0 / (sigma * sigma)
    bwd = mode == "bwd"
    idx = _bwd_col_table(d) if bwd else _fwd_col_table(d)

    @pl.when(i == 0)
    def _init():
        tb_ref[...] = jnp.zeros_like(tb_ref)

    def read_side(ref, start):
        q = [ref[dd, pl.ds(start, t)] for dd in range(d)]
        p = [ref[d + dd, pl.ds(start, t)] for dd in range(d)]
        m = ref[2 * d, pl.ds(start, t)]
        if not bwd:
            return _fwd_payload_rows(q, p, m, d, idx, rows_total, t), q
        G = [ref[2 * d + 1 + dd, pl.ds(start, t)] * m for dd in range(d)]
        H = [ref[3 * d + 1 + dd, pl.ds(start, t)] * m for dd in range(d)]
        return _bwd_payload_rows(q, p, m, G, H, d, idx, rows_total, t), q

    i0 = i * t
    pload_i, qi = read_side(blka_ref, i0)

    n_j = fullb_ref.shape[1] // t
    hi = i + 1 if same_block else n_j

    def stage(jt):
        # j-side VPU stage: payload rows + exp tile.  Clamped index so the
        # skewed prefetch of the final iteration reads a valid (discarded)
        # tile instead of running out of bounds.
        j0 = jnp.minimum(jt, hi - 1) * t
        pload_j, qj = read_side(fullb_ref, j0)
        d2 = (qi[0][:, None] - qj[0][None, :]) ** 2
        for dd in range(1, d):
            d2 = d2 + (qi[dd][:, None] - qj[dd][None, :]) ** 2
        kraw = jnp.exp(-0.5 * d2 * u)  # computed ONCE per tile pair
        return pload_j, kraw

    # software-pipelined (``skew``): iteration jt's VPU stage (payload
    # building + exp) is computed one step AHEAD of its two MXU
    # contractions, so the vector and matrix units overlap instead of
    # serializing per iteration
    mm = _BWD_MM_MODE if bwd else None

    def emit(jt, pload_j, kraw, acc):
        acc = acc + _mm3(pload_j, kraw, (((1,), (1,)), ((), ())), mode=mm)
        if same_block:
            off = jnp.where(jt == i, 0.0, 1.0).astype(jnp.float32)
        else:
            off = jnp.float32(1.0)
        contrib = _mm3(pload_i, kraw, (((1,), (0,)), ((), ())), mode=mm)
        tb_ref[:, pl.ds(jt * t, t)] += contrib * off
        return acc

    if skew:
        def body(jt, carry):
            acc, (pload_cur, k_cur) = carry
            nxt = stage(jt + 1)
            return emit(jt, pload_cur, k_cur, acc), nxt

        acc, _ = jax.lax.fori_loop(
            0, hi, body,
            (jnp.zeros((rows_total, t), jnp.float32), stage(0)),
        )
    else:
        def body(jt, acc):
            pload_j, kraw = stage(jt)
            return emit(jt, pload_j, kraw, acc)

        acc = jax.lax.fori_loop(
            0, hi, body, jnp.zeros((rows_total, t), jnp.float32)
        )
    ta_ref[...] = acc


def _sym_block_tables(packed, mpad, mb, t, sigma, d, rows_total, mode):
    """Python-level unordered block pairs: run the pair kernel on every
    (a, b <= a) block pair and sum each block's partial tables.  Returns
    the full (rows_total, mpad) kernel-sum table."""
    nb = mpad // mb
    tables = [jnp.zeros((rows_total, mb), jnp.float32) for _ in range(nb)]
    for a in range(nb):
        blk_a = packed[:, a * mb:(a + 1) * mb]
        for b in range(a + 1):
            blk_b = packed[:, b * mb:(b + 1) * mb]
            kernel = functools.partial(
                _rhs_self_sym_pair_kernel, sigma=float(sigma), t=t,
                d=d, rows_total=rows_total, same_block=(a == b), mode=mode,
            )
            ta, tb = pl.pallas_call(
                kernel,
                grid=(mb // t,),
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                ],
                out_specs=[
                    pl.BlockSpec((rows_total, t), lambda i: (0, i),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((rows_total, mb), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_shape=[
                    jax.ShapeDtypeStruct((rows_total, mb), jnp.float32),
                    jax.ShapeDtypeStruct((rows_total, mb), jnp.float32),
                ],
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("arbitrary",),
                ),
                interpret=_interpret(),
            )(blk_a, blk_b)
            # ta: contributions from (i, j<=i[ or all j]) pairs to block a;
            # tb: the dual-side contributions to block b — for a == b that
            # is the strict upper triangle of the SAME block, still needed
            tables[a] = tables[a] + ta
            tables[b] = tables[b] + tb
    return jnp.concatenate(tables, axis=1)


def _rhs_self_fwd_sym_blocks(q, p, mask, sigma, withlogdet, t=256,
                             mb=65536):
    """Symmetric-pair FORWARD via block-pair decomposition — same contract
    as ``_rhs_self_fwd_sym_mm`` but VMEM-bounded at any M (lifts the
    ~140k-point ceiling of the table-resident kernel)."""
    m, d = q.shape
    rows_total = 16
    # equal t-aligned blocks under the mb cap: the pair loop computes
    # mpad^2 pairs, so a cap-sized last block can pad the work far past
    # the real point count (e.g. M=150k at mb=65536 -> 1.7x).  VMEM per
    # pair call = two 16-row packed blocks + the 16-row dual accumulator;
    # capped by the vmap-safe shared budget.
    mb_cap = min(mb, _sym_budget_floats() // (16 + 16 + rows_total))
    mb_cap = max(t, (mb_cap // t) * t)
    nb = -(-m // mb_cap)
    mb = max(t, -(-(-(-m // nb)) // t) * t)
    mpad = -(-m // mb) * mb
    packed = _pack(
        [q[:, dd] for dd in range(d)] + [p[:, dd] for dd in range(d)]
        + [mask],
        mpad,
    )
    T = _sym_block_tables(packed, mpad, mb, t, sigma, d, rows_total, "fwd")
    return _fwd_sym_epilogue(T[:, :m], q, p, mask, sigma, withlogdet, d)


def _rhs_self_fwd_best(qc, p, mask, sigma, withlogdet, ti=256, tj=512):
    """Best available eta == 0 forward for pre-centered coordinates:
    table-resident symmetric kernel while it fits VMEM, block-pair
    symmetric decomposition beyond."""
    m = qc.shape[0]
    if -(-m // ti) * ti <= _sym_max_mpad():
        return _rhs_self_fwd_sym_mm(qc, p, mask, sigma, withlogdet, ti)
    return _rhs_self_fwd_sym_blocks(qc, p, mask, sigma, withlogdet, ti)


def _bwd_sym_epilogue(T, q, p, mask, gv, gg, gc, sigma, d):
    """dq/dp recombination from the summed backward table T (rows, M) —
    the exact row-side identities of ``_rhs_self_bwd_mm_kernel``'s
    in-kernel epilogue, applied once per point after ALL accumulation."""
    u = 1.0 / (sigma * sigma)
    u2 = u * u
    idx = _bwd_col_table(d)

    def A(*key):
        return T[idx[key]]

    m = mask
    qs = [q[:, dd] for dd in range(d)]
    ps = [p[:, dd] for dd in range(d)]
    Gs = [gv[:, dd] * m for dd in range(d)]
    Hs = [gg[:, dd] * m for dd in range(d)]
    Hq_i = sum(Hs[e] * qs[e] for e in range(d))
    pq_i = sum(ps[e] * qs[e] for e in range(d))

    dp_cols = []
    for f in range(d):
        dp = A("G", f)
        dp = dp + u * (A("Hqp", f) - sum(qs[e] * A("Hp", e, f)
                                         for e in range(d)))
        dp = dp + u * (Hq_i * A("p", f) - sum(Hs[e] * A("qp", e, f)
                                              for e in range(d)))
        dp = dp - u * gc * (qs[f] * A("one") - A("q", f))
        dp_cols.append(dp * m)

    sum_G_Ap = sum(Gs[e] * A("p", e) for e in range(d))
    sum_p_Ap = sum(ps[e] * A("p", e) for e in range(d))
    sum_p_Aq = sum(ps[e] * A("q", e) for e in range(d))
    dq_cols = []
    for dd in range(d):
        t_ = -u * (qs[dd] * sum_G_Ap
                   - sum(Gs[e] * A("qp", dd, e) for e in range(d)))
        s = jnp.zeros_like(t_)
        for e in range(d):
            for f in range(d):
                s = s + Hs[e] * ps[f] * (
                    qs[dd] * qs[e] * A("p", f)
                    - qs[dd] * A("qp", e, f)
                    - qs[e] * A("qp", dd, f)
                    + A("qqp", *_key2(dd, e), f)
                )
        t_ = t_ - u2 * s
        t_ = t_ + u2 * gc * (
            qs[dd] * pq_i * A("one")
            - qs[dd] * sum_p_Aq
            - pq_i * A("q", dd)
            + sum(ps[f] * A("qq", *_key2(dd, f)) for f in range(d))
        )
        t_ = t_ + u * sum(ps[f] * (A("qG", dd, f) - qs[dd] * A("G", f))
                          for f in range(d))
        s = jnp.zeros_like(t_)
        for f in range(d):
            s = s + ps[f] * (
                A("qHqp", dd, f)
                - qs[dd] * A("Hqp", f)
                - sum(qs[e] * A("qHp", dd, e, f) for e in range(d))
                + qs[dd] * sum(qs[e] * A("Hp", e, f) for e in range(d))
            )
        t_ = t_ + u2 * s
        t_ = t_ - u2 * gc * (
            A("qpq", dd)
            - qs[dd] * A("pq")
            - sum(qs[e] * A("qp", dd, e) for e in range(d))
            + qs[dd] * sum(qs[e] * A("p", e) for e in range(d))
        )
        t_ = t_ + u * Hs[dd] * sum_p_Ap - u * gc * ps[dd] * A("one")
        t_ = t_ - u * sum(ps[f] * A("Hp", dd, f) for f in range(d))
        t_ = t_ + u * gc * A("p", dd)
        dq_cols.append(t_ * m)

    return (jnp.stack(dq_cols, axis=1), jnp.stack(dp_cols, axis=1))


def _morton_order(q, mask, bits=10):
    """Spatial (Morton / Z-curve) sort permutation: quantize each masked
    coordinate to ``bits`` inside the masked bounding box and interleave
    the bits.  Sorting by the code makes index-contiguous blocks spatially
    LOCAL, which is what lets per-block-pair re-centering shrink the
    coordinate monomials the payload-matmul backward accumulates (the
    cancellation-amplification fix — see ``_rhs_self_bwd_sym_mm``).
    Masked points sort to the end.  bits * d + 1 must fit int32 (d <= 3)."""
    m, d = q.shape
    on = mask[:, None] > 0
    lo = jnp.min(jnp.where(on, q, jnp.inf), axis=0)
    hi = jnp.max(jnp.where(on, q, -jnp.inf), axis=0)
    span = jnp.maximum(hi - lo, 1e-30)
    scale = (2.0**bits - 1.0) / span
    qq = jnp.clip((q - lo) * scale, 0.0, 2.0**bits - 1.0).astype(jnp.int32)
    code = jnp.zeros((m,), jnp.int32)
    for b in range(bits):
        for dd in range(d):
            bit = (qq[:, dd] >> b) & 1
            code = code | (bit << (b * d + dd))
    code = jnp.where(mask > 0, code, jnp.int32(1) << (bits * d))
    return jnp.argsort(code)


def _sym_block_grads(packed, mpad, mb, t, sigma, d, rows_total, gc,
                     skew=True):
    """Per-block-pair table + EPILOGUE accumulation with per-pair coordinate
    re-centering (the dq-precision fix, VERDICT r4 item 4).

    The old scheme summed the 45/104-row kernel-sum tables globally and
    recombined once: the telescoped row-side identities then cancel
    R-sized accumulations down to O(sigma)-sized results, amplifying the
    matmul-split error by (R/sigma)^2 — the measured ~8e-4 dq floor.  The
    epilogue is LINEAR in the table and each pair's contribution is
    origin-invariant, so instead each unordered block pair (a, b) is
    computed at its OWN origin (the pair's masked centroid, subtracted from
    the packed coordinate rows in jnp — the kernel is unchanged) and
    recombined immediately; with Morton-sorted inputs the blocks are
    spatially local, so the monomial magnitudes drop from the cloud radius
    to the block radius + kernel support and the amplification collapses.
    Epilogue cost: O(nb * M) jnp work vs O(M^2/2) pair work — negligible."""
    nb = mpad // mb
    dq_blocks = [jnp.zeros((mb, d), jnp.float32) for _ in range(nb)]
    dp_blocks = [jnp.zeros((mb, d), jnp.float32) for _ in range(nb)]

    def side_arrays(blk_s, blk):
        # (shifted q, p, mask, gv, gg) column views of a 16-row packed block
        return (blk_s[:d].T, blk[d:2 * d].T, blk[2 * d],
                blk[2 * d + 1:3 * d + 1].T, blk[3 * d + 1:4 * d + 1].T)

    for a in range(nb):
        blk_a = packed[:, a * mb:(a + 1) * mb]
        for b in range(a + 1):
            blk_b = packed[:, b * mb:(b + 1) * mb]
            wa, wb = blk_a[2 * d], blk_b[2 * d]
            wsum = jnp.maximum(jnp.sum(wa) + jnp.sum(wb), 1.0)
            c = [(jnp.sum(blk_a[dd] * wa) + jnp.sum(blk_b[dd] * wb)) / wsum
                 for dd in range(d)]
            shift = jnp.zeros((16,), jnp.float32)
            for dd in range(d):
                shift = shift.at[dd].set(c[dd])
            blk_a_s = blk_a - shift[:, None]
            blk_b_s = blk_b - shift[:, None]
            kernel = functools.partial(
                _rhs_self_sym_pair_kernel, sigma=float(sigma), t=t,
                d=d, rows_total=rows_total, same_block=(a == b), mode="bwd",
                skew=skew,
            )
            ta, tb = pl.pallas_call(
                kernel,
                grid=(mb // t,),
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                ],
                out_specs=[
                    pl.BlockSpec((rows_total, t), lambda i: (0, i),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((rows_total, mb), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_shape=[
                    jax.ShapeDtypeStruct((rows_total, mb), jnp.float32),
                    jax.ShapeDtypeStruct((rows_total, mb), jnp.float32),
                ],
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("arbitrary",),
                ),
                interpret=_interpret(),
            )(blk_a_s, blk_b_s)
            qa, pa, ma, gva, gga = side_arrays(blk_a_s, blk_a)
            dqa, dpa = _bwd_sym_epilogue(ta, qa, pa, ma, gva, gga, gc,
                                         sigma, d)
            dq_blocks[a] = dq_blocks[a] + dqa
            dp_blocks[a] = dp_blocks[a] + dpa
            qb, pb, mb_, gvb, ggb = side_arrays(blk_b_s, blk_b)
            dqb, dpb = _bwd_sym_epilogue(tb, qb, pb, mb_, gvb, ggb, gc,
                                         sigma, d)
            dq_blocks[b] = dq_blocks[b] + dqb
            dp_blocks[b] = dp_blocks[b] + dpb
    return (jnp.concatenate(dq_blocks, axis=0),
            jnp.concatenate(dp_blocks, axis=0))


def _rhs_self_bwd_sym_mm(q, p, mask, gv, gg, gc, sigma, t=None, mb=32768,
                         skew=None):
    """Symmetric-pair backward wrapper: Morton-sort the points, then
    python-level unordered block pairs (each pallas call handles one pair
    under the VMEM budget) recombined PER PAIR at the pair's own centroid
    (see ``_sym_block_grads`` — the dq-precision fix), then unsort.  Same
    contract as ``_rhs_self_bwd_mm``."""
    m, d = q.shape
    # tile/skew sweep (TPU v5e, 131k, benchmarks/d3_bwd_sweep.py): d=2 is
    # best at t=256 with the skewed pipeline (216 Gpair/s); the 104-row
    # d=3 table flips — t=512 unskewed 154 vs t=256 skewed 121 (the wide
    # skew carry forces copies, and the bigger tile amortizes the
    # dual-table read-modify-write per pair)
    if t is None:
        t = 256 if d == 2 else 512
    if skew is None:
        skew = d == 2
    perm = _morton_order(q, mask)
    inv = jnp.argsort(perm)
    q, p, mask = q[perm], p[perm], mask[perm]
    gv, gg = gv[perm], gg[perm]
    idx = _bwd_col_table(d)
    rows_total = -(-len(idx) // 8) * 8  # pad sublanes to a multiple of 8
    # VMEM per pair call = two 16-row input blocks + the (rows_total, mb)
    # dual-side accumulator; the d=3 table (104 rows) busts the ~16M scoped
    # limit at the d=2 default mb=32768 (measured OOM at 131k on chip), and
    # vmap double-buffering halves what fits again (_sym_budget_floats), so
    # cap mb by budget, then split m into equal t-aligned blocks (a
    # cap-sized block can pad m's pair work far past the real count)
    # ... minus the software-pipeline carry of the pair kernel (the skewed
    # j-side payload block + exp tile, ~2x live during the handoff)
    budget = _sym_budget_floats() - 2 * (rows_total + t) * t
    mb_cap = max(t, min(mb, (budget // (rows_total + 32) // t) * t))
    nb = -(-m // mb_cap)
    mb = max(t, -(-(-(-m // nb)) // t) * t)
    mpad = -(-m // mb) * mb
    rows16 = 16
    packed = jnp.zeros((rows16, mpad), jnp.float32)
    cols = (
        [q[:, dd] for dd in range(d)] + [p[:, dd] for dd in range(d)]
        + [mask] + [gv[:, dd] for dd in range(d)]
        + [gg[:, dd] for dd in range(d)]
    )
    for i, c in enumerate(cols):
        packed = packed.at[i, :m].set(c)
    gc_arr = jnp.asarray(gc, jnp.float32)

    dq, dp = _sym_block_grads(packed, mpad, mb, t, sigma, d, rows_total,
                              gc_arr, skew=skew)
    return dq[:m][inv], dp[:m][inv]


def _rhs_self_bwd_mm(q, p, mask, gv, gg, gc, sigma, ti=256, tj=512):
    """Payload-matmul backward wrapper (same contract as
    ``_rhs_self_bwd_pallas``).  Morton-sorts the inputs so the kernel's
    per-x-tile re-centering sees spatially local tiles (dq-precision fix),
    unsorts the gradients."""
    m, d = q.shape
    perm = _morton_order(q, mask)
    inv = jnp.argsort(perm)
    q, p, mask = q[perm], p[perm], mask[perm]
    gv, gg = gv[perm], gg[perm]
    step = max(ti, tj)
    mpad = -(-m // step) * step
    rows16 = 16
    packed = jnp.zeros((rows16, mpad), jnp.float32)
    cols = (
        [q[:, dd] for dd in range(d)] + [p[:, dd] for dd in range(d)]
        + [mask] + [gv[:, dd] for dd in range(d)] + [gg[:, dd] for dd in range(d)]
    )
    for i, c in enumerate(cols):
        packed = packed.at[i, :m].set(c)
    kernel = functools.partial(_rhs_self_bwd_mm_kernel, sigma=float(sigma),
                               tj=tj, d=d, mm_mode=_BWD_MM_MODE)
    out = pl.pallas_call(
        kernel,
        grid=(mpad // ti,),
        in_specs=[
            pl.BlockSpec((rows16, ti), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((_ROWS, ti), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((_ROWS, mpad), jnp.float32),
        interpret=_interpret(),
    )(packed, packed, jnp.reshape(gc.astype(jnp.float32), (1, 1)))
    dq = out[0:d, :m].T
    dp = out[d : 2 * d, :m].T
    return dq[inv], dp[inv]


def _vx_mm_kernel(xblk_ref, q_ref, out_ref, *, sigma, withlogdet, tj, d):
    """Payload-matmul forward of the cross terms (eta == 0): one x-tile of
    (v(x), per-point divergence cost).  Same contract as ``_vx_kernel``.

    Identities (delta = x_i - q_j, u = 1/s^2):
      vx_f = A[p_f];  dc = +u m_x ( sum_e x_e A[p_e] - A[(q.p)] )
    """
    ti = xblk_ref.shape[1]
    n_j = q_ref.shape[1] // tj
    u = 1.0 / (sigma * sigma)
    ncols = d + 1

    xi = [xblk_ref[dd, :][:, None] for dd in range(d)]
    mxi = xblk_ref[d, :][:, None]

    def body(jt, acc):
        j0 = jt * tj
        qj = [q_ref[dd, pl.ds(j0, tj)] for dd in range(d)]
        pj = [q_ref[d + dd, pl.ds(j0, tj)] for dd in range(d)]
        mj = q_ref[2 * d, pl.ds(j0, tj)]
        d2 = (xi[0] - qj[0][None, :]) ** 2
        for dd in range(1, d):
            d2 = d2 + (xi[dd] - qj[dd][None, :]) ** 2
        k = jnp.exp(-0.5 * d2 * u) * mj[None, :]
        qdotp = qj[0] * pj[0]
        for e in range(1, d):
            qdotp = qdotp + qj[e] * pj[e]
        pt = jnp.stack(pj + [qdotp], axis=0)
        return acc + _mm_dot(k, pt)

    acc = jax.lax.fori_loop(0, n_j, body,
                            jnp.zeros((ti, ncols), jnp.float32))
    for dd in range(d):
        out_ref[dd, :] = (acc[:, dd][:, None] * mxi)[:, 0]
    if withlogdet:
        dc = u * mxi * (
            sum(xi[e] * acc[:, e][:, None] for e in range(d))
            - acc[:, d][:, None]
        )
        out_ref[d, :] = dc[:, 0]
    else:
        out_ref[d, :] = jnp.zeros((ti,), jnp.float32)
    for r in range(d + 1, _ROWS):
        out_ref[r, :] = jnp.zeros((ti,), jnp.float32)


def _ext_bwd_dx_mm_kernel(xblk_ref, q_ref, out_ref, *, sigma, tj, d):
    """Payload-matmul dx of the cross terms.  Same contract as
    ``_ext_bwd_dx_kernel``.

    With Gx = m_x gx, C = gc, delta = x_l - q_j:
      dx_dd = -u ( x_dd sum_e Gx_e A[p_e] - sum_e Gx_e A[q_dd p_e] )
              - u^2 C m_x ( x_dd sum_e x_e A[p_e] - x_dd A[(q.p)]
                            - sum_e x_e A[q_dd p_e] + A[q_dd (q.p)] )
              + u C m_x A[p_dd]
    """
    ti = xblk_ref.shape[1]
    n_j = q_ref.shape[1] // tj
    u = 1.0 / (sigma * sigma)
    gc = q_ref[2 * d + 1, 0]
    # cols: p (d) | qp(a,e) (d^2) | (q.p) (1) | q_a (q.p) (d)
    ncols = d + d * d + 1 + d

    def c_p(e):
        return e

    def c_qp(a, e):
        return d + a * d + e

    c_qdp = d + d * d

    def c_qqdp(a):
        return d + d * d + 1 + a

    xi = [xblk_ref[dd, :][:, None] for dd in range(d)]
    mxi = xblk_ref[d, :][:, None]
    gxi = [xblk_ref[d + 1 + dd, :][:, None] * mxi for dd in range(d)]

    def body(jt, acc):
        j0 = jt * tj
        qj = [q_ref[dd, pl.ds(j0, tj)] for dd in range(d)]
        pj = [q_ref[d + dd, pl.ds(j0, tj)] for dd in range(d)]
        mj = q_ref[2 * d, pl.ds(j0, tj)]
        d2 = (xi[0] - qj[0][None, :]) ** 2
        for dd in range(1, d):
            d2 = d2 + (xi[dd] - qj[dd][None, :]) ** 2
        k = jnp.exp(-0.5 * d2 * u) * mj[None, :]
        qdotp = qj[0] * pj[0]
        for e in range(1, d):
            qdotp = qdotp + qj[e] * pj[e]
        rows = [None] * ncols
        for e in range(d):
            rows[c_p(e)] = pj[e]
            rows[c_qqdp(e)] = qj[e] * qdotp
            for a in range(d):
                rows[c_qp(a, e)] = qj[a] * pj[e]
        rows[c_qdp] = qdotp
        pt = jnp.stack(rows, axis=0)
        return acc + _mm_dot(k, pt)

    acc = jax.lax.fori_loop(0, n_j, body,
                            jnp.zeros((ti, ncols), jnp.float32))

    def A(c):
        return acc[:, c][:, None]

    sum_x_Ap = sum(xi[e] * A(c_p(e)) for e in range(d))
    for dd in range(d):
        t = -u * (xi[dd] * sum(gxi[e] * A(c_p(e)) for e in range(d))
                  - sum(gxi[e] * A(c_qp(dd, e)) for e in range(d)))
        t = t - u * u * gc * mxi * (
            xi[dd] * sum_x_Ap - xi[dd] * A(c_qdp)
            - sum(xi[e] * A(c_qp(dd, e)) for e in range(d))
            + A(c_qqdp(dd))
        )
        t = t + u * gc * mxi * A(c_p(dd))
        out_ref[dd, :] = t[:, 0]
    for r in range(d, _ROWS):
        out_ref[r, :] = jnp.zeros((ti,), jnp.float32)


def _ext_bwd_dqdp_mm_kernel(qblk_ref, x_ref, out_ref, *, sigma, tj, d):
    """Payload-matmul (dq, dp) of the cross terms.  Same contract as
    ``_ext_bwd_dqdp_kernel``.  Streams x tiles; payload columns are built
    from x-side rows (Gx = m_x gx folded):

      dp_f  = m_q [ A[Gx_f] + u C ( A[m x_f] - q_f A[m] ) ]
      dq_dd = m_q [ u sum_f p_f ( A[x_dd Gx_f] - q_dd A[Gx_f] )
                    + u^2 C ( sum_f p_f A[m x_dd x_f] - (q.p) A[m x_dd]
                              - q_dd sum_f p_f A[m x_f] + q_dd (q.p) A[m] )
                    - u C p_dd A[m] ]
    """
    ti = qblk_ref.shape[1]
    n_j = x_ref.shape[1] // tj
    u = 1.0 / (sigma * sigma)
    gc = qblk_ref[2 * d + 1, 0]
    # cols: Gx_f (d) | x_a Gx_f (d^2) | m (1) | m x_f (d) | m x_a x_b (sym)
    sym = [(a, b) for a in range(d) for b in range(a, d)]
    ncols = d + d * d + 1 + d + len(sym)

    def c_G(f):
        return f

    def c_xG(a, f):
        return d + a * d + f

    c_m = d + d * d

    def c_mx(f):
        return d + d * d + 1 + f

    def c_mxx(a, b):
        return d + d * d + 1 + d + sym.index(_key2(a, b))

    ql = [qblk_ref[dd, :][:, None] for dd in range(d)]
    pi_ = [qblk_ref[d + dd, :][:, None] for dd in range(d)]
    mql = qblk_ref[2 * d, :][:, None]

    def body(jt, acc):
        j0 = jt * tj
        xj = [x_ref[dd, pl.ds(j0, tj)] for dd in range(d)]
        mxj = x_ref[d, pl.ds(j0, tj)]
        gxj = [x_ref[d + 1 + dd, pl.ds(j0, tj)] * mxj for dd in range(d)]
        d2 = (ql[0] - xj[0][None, :]) ** 2
        for dd in range(1, d):
            d2 = d2 + (ql[dd] - xj[dd][None, :]) ** 2
        k = jnp.exp(-0.5 * d2 * u)
        rows = [None] * ncols
        rows[c_m] = mxj
        for f in range(d):
            rows[c_G(f)] = gxj[f]
            rows[c_mx(f)] = mxj * xj[f]
            for a in range(d):
                rows[c_xG(a, f)] = xj[a] * gxj[f]
        for a, b in sym:
            rows[c_mxx(a, b)] = mxj * xj[a] * xj[b]
        pt = jnp.stack(rows, axis=0)
        return acc + _mm_dot(k, pt)

    acc = jax.lax.fori_loop(0, n_j, body,
                            jnp.zeros((ti, ncols), jnp.float32))

    def A(c):
        return acc[:, c][:, None]

    qp_l = sum(ql[e] * pi_[e] for e in range(d))
    for f in range(d):
        dp = A(c_G(f)) + u * gc * (A(c_mx(f)) - ql[f] * A(c_m))
        out_ref[d + f, :] = (dp * mql)[:, 0]
    for dd in range(d):
        t = u * sum(pi_[f] * (A(c_xG(dd, f)) - ql[dd] * A(c_G(f)))
                    for f in range(d))
        t = t + u * u * gc * (
            sum(pi_[f] * A(c_mxx(dd, f)) for f in range(d))
            - qp_l * A(c_mx(dd))
            - ql[dd] * sum(pi_[f] * A(c_mx(f)) for f in range(d))
            + ql[dd] * qp_l * A(c_m)
        )
        t = t - u * gc * pi_[dd] * A(c_m)
        out_ref[dd, :] = (t * mql)[:, 0]
    for r in range(2 * d, _ROWS):
        out_ref[r, :] = jnp.zeros((ti,), jnp.float32)


def _ext_bwd_dx_kernel(xblk_ref, q_ref, out_ref, *, sigma, tj, d):
    """Per x-tile gradient dx of the cross terms (vx, dc).

    xblk rows: [x 0..d-1 | mx d | gx d+1..2d]  (Gx = mx*gx folded in-kernel)
    q_ref rows: [q 0..d-1 | p d..2d-1 | mq 2d | gc broadcast row 2d+1]
    out rows: [dx 0..d-1]
    """
    ti = xblk_ref.shape[1]
    m_total = q_ref.shape[1]
    n_j = m_total // tj
    inv_s2 = 1.0 / (sigma * sigma)

    xi = [xblk_ref[dd, :][:, None] for dd in range(d)]
    mxi = xblk_ref[d, :][:, None]
    gxi = [xblk_ref[d + 1 + dd, :][:, None] * mxi for dd in range(d)]
    gc = q_ref[2 * d + 1, 0]

    def body(jt, acc):
        j0 = jt * tj

        def row(r):
            return q_ref[r, pl.ds(j0, tj)][None, :]

        qj = [row(dd) for dd in range(d)]
        pj = [row(d + dd) for dd in range(d)]
        mqj = row(2 * d)
        delta = [xi[dd] - qj[dd] for dd in range(d)]
        d2 = delta[0] * delta[0]
        for dd in range(1, d):
            d2 = d2 + delta[dd] * delta[dd]
        km = jnp.exp(-0.5 * d2 * inv_s2) * mqj

        gx_dot_p = gxi[0] * pj[0]
        p_dot_delta = pj[0] * delta[0]
        for dd in range(1, d):
            gx_dot_p = gx_dot_p + gxi[dd] * pj[dd]
            p_dot_delta = p_dot_delta + pj[dd] * delta[dd]

        coef_delta = (
            -inv_s2 * km * gx_dot_p
            - gc * mxi * inv_s2 * inv_s2 * km * p_dot_delta
        )
        coef_p = gc * mxi * inv_s2 * km
        dx = acc
        new_dx = [
            dx[dd]
            + jnp.sum(coef_delta * delta[dd] + coef_p * pj[dd], axis=1,
                      keepdims=True)
            for dd in range(d)
        ]
        return new_dx

    acc0 = [jnp.zeros((ti, 1), jnp.float32) for _ in range(d)]
    dx = jax.lax.fori_loop(0, n_j, body, acc0)
    for dd in range(d):
        out_ref[dd, :] = dx[dd][:, 0]
    for r in range(d, _ROWS):
        out_ref[r, :] = jnp.zeros((ti,), jnp.float32)


def _ext_bwd_dqdp_kernel(qblk_ref, x_ref, out_ref, *, sigma, tj, d):
    """Per q-tile gradients (dq, dp) of the cross terms.

    qblk rows: [q 0..d-1 | p d..2d-1 | mq 2d | gc row 2d+1]
    x_ref rows: [x 0..d-1 | mx d | gx d+1..2d]
    out rows: [dq 0..d-1 | dp d..2d-1]
    """
    ti = qblk_ref.shape[1]
    n_total = x_ref.shape[1]
    n_j = n_total // tj
    inv_s2 = 1.0 / (sigma * sigma)

    ql = [qblk_ref[dd, :][:, None] for dd in range(d)]
    pl_ = [qblk_ref[d + dd, :][:, None] for dd in range(d)]
    mql = qblk_ref[2 * d, :][:, None]
    gc = qblk_ref[2 * d + 1, 0]

    def body(jt, acc):
        j0 = jt * tj

        def row(r):
            return x_ref[r, pl.ds(j0, tj)][None, :]

        xi = [row(dd) for dd in range(d)]
        mxi = row(d)
        gxi = [row(d + 1 + dd) * mxi for dd in range(d)]
        # e = q_l - x_i ;  delta_il = x_i - q_l = -e
        e = [ql[dd] - xi[dd] for dd in range(d)]
        d2 = e[0] * e[0]
        for dd in range(1, d):
            d2 = d2 + e[dd] * e[dd]
        k = jnp.exp(-0.5 * d2 * inv_s2)

        gx_dot_pl = gxi[0] * pl_[0]
        pl_dot_e = pl_[0] * e[0]
        for dd in range(1, d):
            gx_dot_pl = gx_dot_pl + gxi[dd] * pl_[dd]
            pl_dot_e = pl_dot_e + pl_[dd] * e[dd]

        coef_e_dq = (
            -inv_s2 * k * gx_dot_pl
            + gc * inv_s2 * inv_s2 * k * mxi * pl_dot_e
        )
        sum_kmx = jnp.sum(k * mxi, axis=1, keepdims=True)
        coef_e_dp = -gc * inv_s2 * k * mxi

        dq, dp = acc
        new_dq = []
        new_dp = []
        for dd in range(d):
            new_dq.append(
                dq[dd]
                + jnp.sum(coef_e_dq * e[dd], axis=1, keepdims=True)
                - gc * inv_s2 * sum_kmx * pl_[dd]
            )
            new_dp.append(
                dp[dd]
                + jnp.sum(k * gxi[dd] + coef_e_dp * e[dd], axis=1,
                          keepdims=True)
            )
        return (new_dq, new_dp)

    acc0 = (
        [jnp.zeros((ti, 1), jnp.float32) for _ in range(d)],
        [jnp.zeros((ti, 1), jnp.float32) for _ in range(d)],
    )
    dq, dp = jax.lax.fori_loop(0, n_j, body, acc0)
    for dd in range(d):
        out_ref[dd, :] = (dq[dd] * mql)[:, 0]
        out_ref[d + dd, :] = (dp[dd] * mql)[:, 0]
    for r in range(2 * d, _ROWS):
        out_ref[r, :] = jnp.zeros((ti,), jnp.float32)


def _ext_bwd_pallas(q, p, x, mq, mx, gx, gc, sigma, ti=256, tj=512):
    """Cross-term gradients (dq, dp, dx) for the ext RHS."""
    nx, d = x.shape
    m = q.shape[0]
    nx_pad = -(-nx // max(ti, tj)) * max(ti, tj)
    m_pad = -(-m // max(ti, tj)) * max(ti, tj)
    gc = gc.astype(jnp.float32)

    qpack = jnp.zeros((_ROWS, m_pad), jnp.float32)
    for i, c in enumerate(
        [q[:, dd] for dd in range(d)] + [p[:, dd] for dd in range(d)] + [mq]
    ):
        qpack = qpack.at[i, :m].set(c)
    qpack = qpack.at[2 * d + 1, :].set(gc)

    xpack = jnp.zeros((_ROWS, nx_pad), jnp.float32)
    for i, c in enumerate(
        [x[:, dd] for dd in range(d)] + [mx] + [gx[:, dd] for dd in range(d)]
    ):
        xpack = xpack.at[i, :nx].set(c)

    dx_out = pl.pallas_call(
        functools.partial(_ext_bwd_dx_mm_kernel, sigma=float(sigma), tj=tj,
                          d=d),
        grid=(nx_pad // ti,),
        in_specs=[
            pl.BlockSpec((_ROWS, ti), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_ROWS, ti), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((_ROWS, nx_pad), jnp.float32),
        interpret=_interpret(),
    )(xpack, qpack)
    dx = dx_out[0:d, :nx].T

    dqdp_out = pl.pallas_call(
        functools.partial(_ext_bwd_dqdp_mm_kernel, sigma=float(sigma), tj=tj,
                          d=d),
        grid=(m_pad // ti,),
        in_specs=[
            pl.BlockSpec((_ROWS, ti), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_ROWS, ti), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((_ROWS, m_pad), jnp.float32),
        interpret=_interpret(),
    )(qpack, xpack)
    dq = dqdp_out[0:d, :m].T
    dp = dqdp_out[d : 2 * d, :m].T
    return dq, dp, dx


def _kmin2_kernel(xblk_ref, y_ref, out_ref, *, tj, d, exclude_self):
    """Streaming top-2 smallest |x_i - y_j|^2 (the KeOps Kmin(2) role,
    reference kernel.py:324-328, point_sets.py:23-25).

    xblk rows: [x 0..d-1 | idx d]   (lane = points)
    y_ref rows: [y 0..d-1 | mask d | idx d+1]
    out rows: [min1 | min2]
    """
    m_total = y_ref.shape[1]
    n_j = m_total // tj
    ti = xblk_ref.shape[1]
    big = jnp.float32(jnp.inf)

    xi = [xblk_ref[dd, :][:, None] for dd in range(d)]
    ii = xblk_ref[d, :][:, None]

    def body(jt, acc):
        m1, m2 = acc
        j0 = jt * tj
        yj = [y_ref[dd, pl.ds(j0, tj)][None, :] for dd in range(d)]
        mj = y_ref[d, pl.ds(j0, tj)][None, :]
        jj = y_ref[d + 1, pl.ds(j0, tj)][None, :]
        d2 = (xi[0] - yj[0]) * (xi[0] - yj[0])
        for dd in range(1, d):
            d2 = d2 + (xi[dd] - yj[dd]) * (xi[dd] - yj[dd])
        d2 = jnp.where(mj > 0, d2, big)
        if exclude_self:
            d2 = jnp.where(jj == ii, big, d2)
        t1 = jnp.min(d2, axis=1, keepdims=True)
        # knock out exactly ONE instance of the tile minimum (tie-robust)
        jpos = jax.lax.broadcasted_iota(jnp.float32, d2.shape, 1)
        minpos = jnp.min(jnp.where(d2 == t1, jpos, big), axis=1,
                         keepdims=True)
        t2 = jnp.min(jnp.where(jpos == minpos, big, d2), axis=1,
                     keepdims=True)
        new_m1 = jnp.minimum(m1, t1)
        new_m2 = jnp.minimum(jnp.maximum(m1, t1), jnp.minimum(m2, t2))
        return new_m1, new_m2

    m1, m2 = jax.lax.fori_loop(
        0, n_j,
        body,
        (jnp.full((ti, 1), big), jnp.full((ti, 1), big)),
    )
    out_ref[0, :] = m1[:, 0]
    out_ref[1, :] = m2[:, 0]
    for r in range(2, _ROWS):
        out_ref[r, :] = jnp.zeros((ti,), jnp.float32)


def kmin2_pallas(x, y, mask_y=None, exclude_self=False, ti=512, tj=1024):
    """(min1, min2) of |x_i - y_j|^2 over masked y, streamed in VMEM.

    ``exclude_self=True`` skips the pair with equal global index (x must be
    y for that to make sense) — the nearest-neighbour-excluding-self mode of
    intrinsic_scale."""
    nx, d = x.shape
    n = y.shape[0]
    nx_pad = -(-nx // ti) * ti
    n_pad = -(-n // tj) * tj
    my = mask_y if mask_y is not None else jnp.ones((n,), jnp.float32)
    xpack = _pack(
        [x[:, dd] for dd in range(d)]
        + [jnp.arange(nx, dtype=jnp.float32)],
        nx_pad,
    )
    ypack = _pack(
        [y[:, dd] for dd in range(d)] + [my]
        + [jnp.arange(n, dtype=jnp.float32)],
        n_pad,
    )
    # padded x rows: index defaults to 0 — irrelevant (rows sliced off);
    # padded y rows have mask 0 -> excluded.
    out = pl.pallas_call(
        functools.partial(_kmin2_kernel, tj=tj, d=d,
                          exclude_self=bool(exclude_self)),
        grid=(nx_pad // ti,),
        in_specs=[
            pl.BlockSpec((_ROWS, ti), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_ROWS, ti), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((_ROWS, nx_pad), jnp.float32),
        interpret=_interpret(),
    )(xpack, ypack)
    return out[0, :nx], out[1, :nx]


def make_rhs_ext(sigma: float, eta: float, withlogdet: bool,
                 ti: int = 256, tj: int = 512):
    """Custom-VJP fused ext-RHS: (vq, -Gq, dcost-at-x, vx).

    Support terms (vq, Gq over the small support set) run through the self
    kernel; the data-point terms (vx and the divergence cost, the large-Nx
    side) run the payload-matmul ``_vx_mm_kernel`` (eta == 0) or the
    streaming ``_vx_kernel`` (eta != 0).  Backward: payload-matmul Pallas
    kernels for eta == 0, blockwise VJP for eta != 0.
    """
    @jax.custom_vjp
    def op(q, p, x, maskq, maskx):
        # ONE centroid shift shared by the self and cross kernels (exact:
        # both depend on positions only through differences) so the
        # payload-matmul table monomials stay extent-sized; harmless for
        # the eta != 0 streaming kernels, which work in deltas anyway
        c = _mm_center(q, maskq)
        qc = q - c
        if eta == 0.0:
            vq, gq, _ = _rhs_self_fwd_best(qc, p, maskq, sigma, False,
                                           ti, tj)
        elif (q.shape[0] >= _POLY_FWD_MIN_M
              and _BWD_PRECISION["mode"] != "accurate"):
            from difficp_tpu.ops.pair_poly import rhs_self_fwd_poly

            vq, gq, _ = rhs_self_fwd_poly(qc, p, maskq, sigma, eta,
                                          False, ti, tj)
        else:
            vq, gq, _ = _rhs_self_fwd_pallas(q, p, maskq, sigma, eta,
                                             False, ti, tj)
        if (eta != 0.0 and x.shape[0] >= _POLY_FWD_MIN_M
                and _BWD_PRECISION["mode"] != "accurate"):
            from difficp_tpu.ops.pair_poly import rhs_ext_fwd_poly

            vx, dc = rhs_ext_fwd_poly(qc, p, x - c, maskq, maskx, sigma,
                                      eta, withlogdet, ti, tj)
        else:
            vx, dc = _vx_fwd_pallas(x - c, maskx, qc, p, maskq, sigma, eta,
                                    withlogdet, ti, tj)
        if not withlogdet:
            dc = jnp.zeros((), q.dtype)
        return vq, -gq, dc, vx

    def fwd(q, p, x, maskq, maskx):
        return op(q, p, x, maskq, maskx), (q, p, x, maskq, maskx)

    def bwd(res, cot):
        q, p, x, maskq, maskx = res
        if _BWD_PRECISION["mode"] == "accurate":
            from difficp_tpu.ops import blockwise as _block

            _, vjp = jax.vjp(
                lambda q_, p_, x_: _block.lddmm_rhs_ext(
                    q_, p_, x_, sigma, eta, withlogdet, maskq, maskx),
                q, p, x,
            )
            dq, dp, dx = vjp(cot)
            return dq, dp, dx, None, None
        if eta != 0.0:
            from difficp_tpu.ops.pair_poly import (
                rhs_ext_bwd_poly, rhs_self_bwd_poly,
            )

            gv, gg, gc, gx = cot
            if not withlogdet:
                gc = jnp.zeros((), q.dtype)
            c = _mm_center(q, maskq)
            qc, xc = q - c, x - c
            # self terms carry no logdet cost here (dc lives at x): gc = 0
            dq1, dp1 = rhs_self_bwd_poly(
                qc, p, maskq, gv, gg, jnp.zeros((), q.dtype), sigma, eta,
                ti, tj,
            )
            dq2, dp2, dx = rhs_ext_bwd_poly(
                qc, p, xc, maskq, maskx, gx, gc, sigma, eta, ti, tj,
            )
            return dq1 + dq2, dp1 + dp2, dx, None, None
        gv, gg, gc, gx = cot
        if not withlogdet:
            gc = jnp.zeros((), q.dtype)  # dcost output is the constant 0
        c = _mm_center(q, maskq)
        qc, xc = q - c, x - c
        # support-support terms (vq, mgq): self backward with gc = 0
        dq1, dp1 = _rhs_self_bwd_mm(
            qc, p, maskq, gv, gg, jnp.zeros((), q.dtype), sigma, ti, tj
        )
        # cross terms (vx, dc): streamed ext backward
        dq2, dp2, dx = _ext_bwd_pallas(
            qc, p, xc, maskq, maskx, gx, gc, sigma, ti, tj
        )
        return dq1 + dq2, dp1 + dp2, dx, None, None

    op.defvjp(fwd, bwd)
    return op


# ---------------------------------------------------------------------------
# Cross-set fused RHS (the ring-rotation body, parallel/ring.py): row
# outputs against a DIFFERENT, streamed col set.  Forward reuses the self
# kernels verbatim (they never assume rows == cols — the self path just
# passes one pack twice); backward is generated by the pair-polynomial
# compiler with row and col roles kept separate.
# ---------------------------------------------------------------------------


def _pack_qpm(q, p, mask, npad):
    d = q.shape[1]
    return _pack(
        [q[:, dd] for dd in range(d)] + [p[:, dd] for dd in range(d)]
        + [mask],
        npad,
    )


def _rhs_cross_fwd_mm(qr, pr, mr, qc, pc, mc, sigma, withlogdet, ti=256,
                      tj=512):
    """Payload-matmul cross forward: (vq, gq, dcost) rows-vs-cols (eta == 0;
    same row contract as ``_rhs_self_fwd_mm``)."""
    m, d = qr.shape
    mpad = -(-m // ti) * ti
    npad = -(-qc.shape[0] // tj) * tj
    rowpack = _pack_qpm(qr, pr, mr, mpad)
    colpack = _pack_qpm(qc, pc, mc, npad)
    kernel = functools.partial(
        _rhs_self_mm_kernel, sigma=float(sigma),
        withlogdet=bool(withlogdet), tj=tj, d=d,
    )
    out = pl.pallas_call(
        kernel,
        grid=(mpad // ti,),
        in_specs=[
            pl.BlockSpec((_ROWS, ti), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_ROWS, ti), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((_ROWS, mpad), jnp.float32),
        interpret=_interpret(),
    )(rowpack, colpack)
    return out[0:d, :m].T, out[d:2 * d, :m].T, jnp.sum(out[2 * d])


def _rhs_cross_fwd_stream(qr, pr, mr, qc, pc, mc, sigma, eta, withlogdet,
                          ti=256, tj=512):
    """Streaming (any-eta) cross forward on the VPU self kernel."""
    m, d = qr.shape
    mpad = -(-m // ti) * ti
    npad = -(-qc.shape[0] // tj) * tj
    rowpack = _pack_qpm(qr, pr, mr, mpad)
    colpack = _pack_qpm(qc, pc, mc, npad)
    kernel = functools.partial(
        _rhs_self_kernel, sigma=float(sigma), eta=float(eta),
        withlogdet=bool(withlogdet), tj=tj, d=d,
    )
    out = pl.pallas_call(
        kernel,
        grid=(mpad // ti,),
        in_specs=[
            pl.BlockSpec((_ROWS, ti), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_ROWS, ti), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((_ROWS, mpad), jnp.float32),
        interpret=_interpret(),
    )(rowpack, colpack)
    return out[0:d, :m].T, out[d:2 * d, :m].T, jnp.sum(out[2 * d])


def make_rhs_cross(sigma: float, eta: float, withlogdet: bool,
                   ti: int = 256, tj: int = 512):
    """Custom-VJP cross fused RHS: (vq, -Gq, dcost) of the ROW set against
    a streamed COL set (the ring-rotation body; blockwise analog
    ``blockwise.lddmm_rhs_cross``).  Row outputs are row-masked; summing
    over a partition of the cols reproduces the self RHS exactly.

    Backward: pair-polynomial payload-matmul kernels for both sides (the
    rotating shard's (dq_col, dp_col) make the ring reverse-differentiable
    at kernel speed); "accurate" knob falls back to the blockwise VJP.
    """
    sigma = float(sigma)
    eta = float(eta)

    @jax.custom_vjp
    def op(qr, pr, mr, qc, pc, mc):
        c = _mm_center(qc, mc)
        if eta == 0.0:
            vq, gq, dc = _rhs_cross_fwd_mm(qr - c, pr, mr, qc - c, pc, mc,
                                           sigma, withlogdet, ti, tj)
        else:
            vq, gq, dc = _rhs_cross_fwd_stream(qr, pr, mr, qc, pc, mc,
                                               sigma, eta, withlogdet,
                                               ti, tj)
        if not withlogdet:
            dc = jnp.zeros((), qr.dtype)
        return vq, -gq, dc

    def fwd(qr, pr, mr, qc, pc, mc):
        return op(qr, pr, mr, qc, pc, mc), (qr, pr, mr, qc, pc, mc)

    def bwd(res, cot):
        qr, pr, mr, qc, pc, mc = res
        if _BWD_PRECISION["mode"] == "accurate":
            from difficp_tpu.ops import blockwise as _block

            def ref(qr_, pr_, qc_, pc_):
                return _block.lddmm_rhs_cross(qr_, pr_, qc_, pc_, sigma,
                                              eta, withlogdet, mr, mc)

            _, vjp = jax.vjp(ref, qr, pr, qc, pc)
            dqr, dpr, dqc, dpc = vjp(cot)
            return dqr, dpr, None, dqc, dpc, None
        from difficp_tpu.ops.pair_poly import rhs_cross_bwd_poly

        gv, gg, gc = cot
        if not withlogdet:
            gc = jnp.zeros((), qr.dtype)
        c = _mm_center(qc, mc)
        dqr, dpr, dqc, dpc = rhs_cross_bwd_poly(
            qr - c, pr, mr, qc - c, pc, mc, gv, gg, gc, sigma, eta, ti, tj)
        return dqr, dpr, None, dqc, dpc, None

    op.defvjp(fwd, bwd)
    return op


def make_rhs_xcross(sigma: float, eta: float, withlogdet: bool,
                    ti: int = 256, tj: int = 512):
    """Custom-VJP cross terms onto EXTERNAL points: (vx, dcost-at-x) of
    data rows x against a streamed support col set (the ring-rotation body
    for advected data, blockwise analog ``blockwise._rhs_ext_blockwise``).
    Gradients flow to x AND to the rotating (q, p) shard."""
    sigma = float(sigma)
    eta = float(eta)

    @jax.custom_vjp
    def op(x, mx, qc, pc, mc):
        c = _mm_center(qc, mc)
        vx, dc = _vx_fwd_pallas(x - c, mx, qc - c, pc, mc, sigma, eta,
                                withlogdet, ti, tj)
        if not withlogdet:
            dc = jnp.zeros((), x.dtype)
        return vx, dc

    def fwd(x, mx, qc, pc, mc):
        return op(x, mx, qc, pc, mc), (x, mx, qc, pc, mc)

    def bwd(res, cot):
        x, mx, qc, pc, mc = res
        gx, gc = cot
        if not withlogdet:
            gc = jnp.zeros((), x.dtype)
        if _BWD_PRECISION["mode"] == "accurate":
            from difficp_tpu.ops import blockwise as _block

            def ref(x_, qc_, pc_):
                return _block._rhs_ext_blockwise(x_, qc_, pc_, mc, mx,
                                                 sigma, eta, withlogdet,
                                                 1024)

            _, vjp = jax.vjp(ref, x, qc, pc)
            dx, dq, dp = vjp((gx, gc))
            return dx, None, dq, dp, None
        c = _mm_center(qc, mc)
        if eta == 0.0:
            dq, dp, dx = _ext_bwd_pallas(qc - c, pc, x - c, mc, mx, gx, gc,
                                         sigma, ti, tj)
        else:
            from difficp_tpu.ops.pair_poly import rhs_ext_bwd_poly

            dq, dp, dx = rhs_ext_bwd_poly(qc - c, pc, x - c, mc, mx, gx,
                                          gc, sigma, eta, ti, tj)
        return dx, None, dq, dp, None

    op.defvjp(fwd, bwd)
    return op


def make_hamiltonian_cross(sigma: float, eta: float, ti: int = 256,
                           tj: int = 512):
    """Custom-VJP cross Hamiltonian share H(rows; cols) (the ring body of
    ``parallel.ring.ring_hamiltonian``; blockwise analog
    ``blockwise.hamiltonian_cross``), differentiable wrt both sides."""
    sigma = float(sigma)
    eta = float(eta)

    @jax.custom_vjp
    def op(qr, pr, mr, qc, pc, mc):
        from difficp_tpu.ops.pair_poly import hamiltonian_cross_poly

        c = _mm_center(qc, mc)
        return hamiltonian_cross_poly(qr - c, pr, mr, qc - c, pc, mc,
                                      sigma, eta, (), ti, tj)["h"]

    def fwd(qr, pr, mr, qc, pc, mc):
        return op(qr, pr, mr, qc, pc, mc), (qr, pr, mr, qc, pc, mc)

    def bwd(res, ghat):
        qr, pr, mr, qc, pc, mc = res
        from difficp_tpu.ops.pair_poly import hamiltonian_cross_poly

        c = _mm_center(qc, mc)
        outs = hamiltonian_cross_poly(qr - c, pr, mr, qc - c, pc, mc,
                                      sigma, eta, ("row", "col"), ti, tj)
        return (ghat * outs["dq_row"], ghat * outs["dp_row"], None,
                ghat * outs["dq_col"], ghat * outs["dp_col"], None)

    op.defvjp(fwd, bwd)
    return op
