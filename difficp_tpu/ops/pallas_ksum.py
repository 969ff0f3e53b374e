"""Generic cross-set payload-matmul kernel-sums (Pallas, MXU path).

One parameterized TPU kernel computes, for an i-set ``x`` against a j-set
``y`` with an arbitrary table of payload columns ``c``:

    A[c]_i = sum_j exp(-|x_i - y_j|^2 / 2 sigma^2) m_j c_j

— ONE (TI, TJ) x (ncols, TJ)^T MXU contraction per tile pair, the same
payload-matmul re-expression that took the fused LDDMM RHS to ~90% of the
exp roofline (``pallas_reductions``).  Every remaining standalone pairwise
reduction of the reference kernel library (diffICP/tools/kernel.py:125-215)
is an epilogue over such tables, and so are their VJPs (the gradient of a
kernel-sum is another kernel-sum with more columns).  This module
instantiates:

- ``kred_mm`` / ``kred_scal_mm`` — the kernel-sum convolution KRed/KRedScal
  (reference kernel.py:134-138); powers the standard algorithm's
  ``data_distance`` (reference PSR_standard.py:37-58), fully differentiable
  (dx, dy, db are two reverse kernel-sum calls).
- ``grad_kred_mm`` — GradKRed (kernel.py:142), differentiable.
- ``make_hamiltonian`` — H(q, p) incl. the gradcomponent eta terms
  (reference LDDMM.py:142-159).  Key identity: (dH/dq, dH/dp) = (Gq, v(q))
  — the fused RHS kernel's own outputs — so the Hamiltonian's VALUE AND
  GRADIENT each cost one fused-RHS kernel call at full MXU speed.
- ``v_field_mm`` — v at external points (kernel role of LDDMM.py:100-116),
  reusing the ext-RHS forward/backward kernels.

Unlike the fused-RHS kernels (static sigma baked per config), ``sigma``
streams through SMEM, so one compiled kernel serves every bandwidth.
The payload table is assembled OUTSIDE the kernel in plain jnp (XLA fuses
the elementwise products); the kernel only re-reads it tile by tile.

Numerics: all coordinates are shifted by the masked j-set centroid before
building monomial columns (see ``pallas_reductions._mm_center``); the
matmuls ride the shared ``_mm3`` split-bf16 policy.  Gradient cotangents
for ``sigma`` and masks are None (not differentiated) — matching the
fused-RHS ops' contract.

On non-TPU backends the kernels run in interpret mode (tests).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from difficp_tpu.ops import blockwise as _block
from difficp_tpu.ops.pallas_reductions import (
    _ext_bwd_pallas,
    _interpret,
    _mm3,
    _mm_center,
    _rhs_self_fwd_best,
    _rhs_self_fwd_pallas,
    _sym_budget_floats,
    _vx_fwd_pallas,
)

_HEAD = 8  # coordinate+mask header rows (sublane-aligned payload offset)

# measurement-only knob (benchmarks): replace the exp tile by its d2
# argument in the blocked kernel — isolates the MXU-contraction ceiling of
# the loop structure from the VPU exp work.  NEVER set in production.
_KSUM_NO_EXP = False


def _ksum_kernel(x_ref, y_ref, sig_ref, out_ref, *, d, rows_out):
    """One (i-tile, j-tile) step of the generic kernel-sum.

    x_ref: (8, TI) [x dims 0..d-1].
    y_ref: (8 + rows_out, TJ) [y dims 0..d-1 | mask d | pad..7 | payload
           rows 8..8+rows_out-1 (zero-padded beyond ncols)].
    out_ref: (rows_out, TI) accumulated across the j grid axis.
    """
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        out_ref[...] = jnp.zeros_like(out_ref)

    sig = sig_ref[0, 0]
    u = 1.0 / (sig * sig)
    xi = [x_ref[dd, :][:, None] for dd in range(d)]
    yj = [y_ref[dd, :][None, :] for dd in range(d)]
    mj = y_ref[d, :][None, :]
    d2 = (xi[0] - yj[0]) ** 2
    for dd in range(1, d):
        d2 = d2 + (xi[dd] - yj[dd]) ** 2
    k = jnp.exp(-0.5 * d2 * u) * mj                    # (TI, TJ)
    pt = y_ref[_HEAD:_HEAD + rows_out, :]              # (rows_out, TJ)
    out_ref[...] += _mm3(pt, k, (((1,), (1,)), ((), ())))


def _ksum_blocked_kernel(x_ref, y_ref, sig_ref, out_ref, *, d, tj, rows_out,
                         skew=False):
    """One x-tile against a VMEM-RESIDENT y block (coords+mask+payload
    table).  Same math as ``_ksum_kernel``, but the j loop runs in-kernel
    over the resident block instead of re-streaming (8 + rows_out)-row
    y tiles from HBM once per x-tile — for wide tables that restream is
    the binding cost (121-col table at M=131k: ~36 GB per call)."""
    sig = sig_ref[0, 0]
    _ksum_blocked_body(x_ref, y_ref, sig, out_ref, None, d=d, tj=tj,
                       rows_out=rows_out, skew=skew)


def _ksum_blocked_scratch_kernel(x_ref, y_ref, sig_ref, out_ref, k_scr,
                                 *, d, tj, rows_out):
    """Scratch-pipelined variant: the exp tile of iteration jt+1 is written
    into a ping-pong VMEM scratch slot while the MXU contracts slot jt —
    the VPU/MXU overlap of the ``skew`` path WITHOUT the fori_loop carry
    (carrying a (TI, TJ) f32 tile as a loop value forces a per-iteration
    copy; at tj=512 that measured 93 vs 138 Gpair/s — the scratch ref is
    mutable state, no copy)."""
    sig = sig_ref[0, 0]
    _ksum_blocked_body(x_ref, y_ref, sig, out_ref, k_scr, d=d, tj=tj,
                       rows_out=rows_out, skew=False)


def _ksum_blocked_body(x_ref, y_ref, sig, out_ref, k_scr, *, d, tj,
                       rows_out, skew):
    u = 1.0 / (sig * sig)
    xi = [x_ref[dd, :][:, None] for dd in range(d)]
    ti = x_ref.shape[1]
    n_j = y_ref.shape[1] // tj

    def make_k(jt):
        # clamped index: the skewed prefetch of the final iteration reads a
        # valid (discarded) tile instead of running out of bounds
        j0 = jnp.minimum(jt, n_j - 1) * tj
        yj = [y_ref[dd, pl.ds(j0, tj)][None, :] for dd in range(d)]
        mj = y_ref[d, pl.ds(j0, tj)][None, :]
        d2 = (xi[0] - yj[0]) ** 2
        for dd in range(1, d):
            d2 = d2 + (xi[dd] - yj[dd]) ** 2
        if _KSUM_NO_EXP:  # roofline probe: contraction-only ceiling
            return d2 * mj
        return jnp.exp(-0.5 * d2 * u) * mj              # (TI, TJ)

    if k_scr is not None:
        # ping-pong scratch pipeline: slot (jt % 2) holds iteration jt's
        # exp tile; the body computes jt+1's tile into the other slot
        # (VPU) then contracts jt's (MXU) — independent stages, no carry
        k_scr[0] = make_k(0)

        def body(jt, acc):
            k_scr[(jt + 1) % 2] = make_k(jt + 1)
            pt = y_ref[_HEAD:_HEAD + rows_out, pl.ds(jt * tj, tj)]
            return acc + _mm3(pt, k_scr[jt % 2], (((1,), (1,)), ((), ())))

        out_ref[...] = jax.lax.fori_loop(
            0, n_j, body, jnp.zeros((rows_out, ti), jnp.float32)
        )
    elif skew:
        # software-pipelined: the exp tile (VPU) runs one iteration ahead
        # of its matmul (MXU).  Only profitable at tj <= 256 — at tj=512
        # the 512 KB f32 carry forces per-iteration copies (measured 93 vs
        # 138 Gpair/s on the 121-col backward at 131k)
        def body(jt, carry):
            acc, k_cur = carry
            k_next = make_k(jt + 1)
            pt = y_ref[_HEAD:_HEAD + rows_out, pl.ds(jt * tj, tj)]
            acc = acc + _mm3(pt, k_cur, (((1,), (1,)), ((), ())))
            return acc, k_next

        acc, _ = jax.lax.fori_loop(
            0, n_j, body,
            (jnp.zeros((rows_out, ti), jnp.float32), make_k(0)),
        )
        out_ref[...] = acc
    else:
        def body(jt, acc):
            k = make_k(jt)
            pt = y_ref[_HEAD:_HEAD + rows_out, pl.ds(jt * tj, tj)]
            return acc + _mm3(pt, k, (((1,), (1,)), ((), ())))

        out_ref[...] = jax.lax.fori_loop(
            0, n_j, body, jnp.zeros((rows_out, ti), jnp.float32)
        )


# wide-table y-resident dispatch: above this payload width the per-x-tile
# HBM restream of the y pack dominates the ordered kernel (measured: the
# 121-col any-eta backward at 127 Gpair/s vs ~190 exp+MXU-bound), so block
# the j set into VMEM-resident chunks instead.  Narrow tables (the common
# kred/hamiltonian cases) keep the simple streaming kernel.
_BLOCKED_MIN_ROWS = 64
_BLOCKED_MIN_N = 16384
_BLOCKED_BUDGET_FLOATS = None  # override seam (tests); None = device-derived
# skewed-pipeline A/B knob: set to a tile width (e.g. 256) to run the
# blocked kernel software-pipelined at that tj; None = plain loop at the
# caller's tj (see _ksum_blocked_kernel)
_BLOCKED_SKEW_TJ = None
# VPU/MXU pipeline mode of the blocked kernel: "scratch" = the ping-pong
# VMEM-scratch pipeline (exp of iteration jt+1 fills one slot while the
# MXU contracts the other — no loop-carried tile, no copy), None = plain
# serial loop, "skew" = the loop-carry pipeline (kept for A/B against
# _BLOCKED_SKEW_TJ)
_BLOCKED_PIPELINE = None


def _pairwise_ksum_blocked(xpack, ypack, sigma, nx_pad, n, d, rows_out,
                           ti, tj):
    """y-resident variant of ``pairwise_ksum`` for wide payload tables:
    python-level loop over equal y blocks sized to the VMEM budget; each
    pallas call sweeps all x tiles against one resident block, partial
    tables summed in jnp."""
    skew = _BLOCKED_SKEW_TJ is not None
    if skew:
        tj = _BLOCKED_SKEW_TJ
    scratch = (_BLOCKED_PIPELINE == "scratch") and not skew
    # the resident y block shares VMEM with the double-buffered x tile and
    # out tile (2x each under the pipelined grid) — subtract them before
    # sizing the block so the real working set stays under the vmap-safe cap
    base = (_BLOCKED_BUDGET_FLOATS if _BLOCKED_BUDGET_FLOATS is not None
            else _sym_budget_floats())
    budget = base - 2 * (_HEAD + rows_out) * ti
    if skew:
        budget -= 3 * ti * tj  # the carried exp tile + in-flight successor
    if scratch:
        budget -= 2 * ti * tj  # the two ping-pong exp-tile scratch slots
    mby_cap = max(tj, (budget // (_HEAD + rows_out) // tj) * tj)
    nb = -(-n // mby_cap)
    mby = max(tj, -(-(-(-n // nb)) // tj) * tj)
    npad = -(-n // mby) * mby
    if ypack.shape[1] != npad:
        ypack = jnp.pad(ypack, ((0, 0), (0, npad - ypack.shape[1])))
    sig = jnp.reshape(jnp.asarray(sigma, jnp.float32), (1, 1))
    if scratch:
        kernel = functools.partial(_ksum_blocked_scratch_kernel, d=d, tj=tj,
                                   rows_out=rows_out)
        scratch_shapes = [pltpu.VMEM((2, ti, tj), jnp.float32)]
    else:
        kernel = functools.partial(_ksum_blocked_kernel, d=d, tj=tj,
                                   rows_out=rows_out, skew=skew)
        scratch_shapes = []
    out = None
    for b in range(npad // mby):
        yblk = ypack[:, b * mby:(b + 1) * mby]
        part = pl.pallas_call(
            kernel,
            grid=(nx_pad // ti,),
            in_specs=[
                pl.BlockSpec((_HEAD, ti), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1), lambda i: (0, 0),
                             memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec((rows_out, ti), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((rows_out, nx_pad), jnp.float32),
            scratch_shapes=scratch_shapes,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",),
            ),
            interpret=_interpret(),
        )(xpack, yblk, sig)
        out = part if out is None else out + part
    return out


def pairwise_ksum(x, y, payloads, sigma, mask_y=None, ti=256, tj=512):
    """A[c]_i = sum_j K(x_i - y_j) m_j payloads[j, c]  -> (Nx, ncols).

    NOT differentiable on its own (use the custom-VJP ops below); the
    building block every op and every op-VJP in this module reduces to.
    """
    nx, d = x.shape
    n, ncols = payloads.shape
    rows_out = -(-ncols // 8) * 8
    nx_pad = -(-nx // ti) * ti
    n_pad = -(-n // tj) * tj

    xpack = jnp.zeros((_HEAD, nx_pad), jnp.float32)
    for dd in range(d):
        xpack = xpack.at[dd, :nx].set(x[:, dd])
    my = mask_y if mask_y is not None else jnp.ones((n,), jnp.float32)
    ypack = jnp.zeros((_HEAD + rows_out, n_pad), jnp.float32)
    for dd in range(d):
        ypack = ypack.at[dd, :n].set(y[:, dd])
    ypack = ypack.at[d, :n].set(my)
    ypack = ypack.at[_HEAD:_HEAD + ncols, :n].set(payloads.T)

    if rows_out >= _BLOCKED_MIN_ROWS and n >= _BLOCKED_MIN_N:
        out = _pairwise_ksum_blocked(xpack, ypack, sigma, nx_pad, n, d,
                                     rows_out, ti, tj)
        return out[:ncols, :nx].T

    out = pl.pallas_call(
        functools.partial(_ksum_kernel, d=d, rows_out=rows_out),
        grid=(nx_pad // ti, n_pad // tj),
        in_specs=[
            pl.BlockSpec((_HEAD, ti), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_HEAD + rows_out, tj), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i, j: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((rows_out, ti), lambda i, j: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows_out, nx_pad), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=_interpret(),
    )(xpack, ypack, jnp.reshape(jnp.asarray(sigma, jnp.float32), (1, 1)))
    return out[:ncols, :nx].T


def _ksum_sym_pair_kernel(ca_ref, ta_in_ref, cb_ref, tb_in_ref, sig_ref,
                          ta_ref, tb_ref, *, d, t, rows_out, same_block):
    """One block pair (a, b) of the GENERIC symmetric self kernel-sum.

    Same 2-level decomposition as ``pallas_reductions.
    _rhs_self_sym_pair_kernel`` (python-level unordered block pairs,
    kernel-level unordered tile pairs; each (t, t) exp tile evaluated ONCE,
    contracted against BOTH sides' payload tables).  The payload tables are
    built OUTSIDE in plain jnp (XLA-fused, O(M x ncols) once per call) and
    streamed in: ``ta_in`` is block a's (rows_out, t) table slice for this
    grid step, ``cb``/``tb_in`` are block b's coordinates and full
    (rows_out, Mb) table, VMEM-resident across the grid.  The kernel body is
    pure exp + two MXU contractions per unordered tile pair.

    (A first version built the monomial tables IN-kernel from narrow
    variable rows; that costs ~1 VPU multiply per distinct monomial prefix
    per tile pair per side, which for the 121-column any-eta backward table
    (~120 prefixes) cancelled the halved-exp win exactly — measured
    102 Gpair/s vs 127 ordered at M=131k.  Externalizing the build leaves
    only the exp tile, which the symmetric pass halves.)
    """
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        tb_ref[...] = jnp.zeros_like(tb_ref)

    sig = sig_ref[0, 0]
    u = 1.0 / (sig * sig)
    qi = [ca_ref[dd, :] for dd in range(d)]
    pload_i = ta_in_ref[...]
    n_j = cb_ref.shape[1] // t
    hi = i + 1 if same_block else n_j

    def make_k(jt):
        # clamped so the skewed prefetch of the final iteration stays in
        # bounds (the extra tile's result is discarded)
        j0 = jnp.minimum(jt, hi - 1) * t
        qj = [cb_ref[dd, pl.ds(j0, t)] for dd in range(d)]
        d2 = (qi[0][:, None] - qj[0][None, :]) ** 2
        for dd in range(1, d):
            d2 = d2 + (qi[dd][:, None] - qj[dd][None, :]) ** 2
        return jnp.exp(-0.5 * d2 * u)  # computed ONCE per tile pair

    # software-pipelined: the exp tile (VPU) is computed one iteration
    # AHEAD of its two MXU contractions so the engines overlap (same skew
    # as the hand-written sym pair kernel — worth +15-25% at 131k)
    def body(jt, carry):
        acc, k_cur = carry
        k_next = make_k(jt + 1)
        pload_j = tb_in_ref[:, pl.ds(jt * t, t)]
        acc = acc + _mm3(pload_j, k_cur, (((1,), (1,)), ((), ())))
        if same_block:
            off = jnp.where(jt == i, 0.0, 1.0).astype(jnp.float32)
        else:
            off = jnp.float32(1.0)
        contrib = _mm3(pload_i, k_cur, (((1,), (0,)), ((), ())))
        tb_ref[:, pl.ds(jt * t, t)] += contrib * off
        return acc, k_next

    acc, _ = jax.lax.fori_loop(
        0, hi, body,
        (jnp.zeros((rows_out, t), jnp.float32), make_k(0)),
    )
    ta_ref[...] = acc


def pairwise_ksum_sym(var_rows, d, mask_row, monos, sigma, t=256, mb=None):
    """Generic SYMMETRIC self kernel-sum: A[c]_i = sum_j K(x_i - x_j) m_j
    prod(var_rows[r][j] for r in monos[c]) -> (M, len(monos)), with each
    unordered tile pair's exp tile computed once (halves the exp work — the
    VPU roofline of every narrow-table kernel-sum).

    ``var_rows``: list of (M,) f32 arrays; rows 0..d-1 MUST be the point
    coordinates (they drive the distance), ``mask_row`` indexes the BINARY
    0/1 mask row (it multiplies every payload row once — callers strip
    ``m`` from the monomials, exact for binary masks since m^k == m).
    ``monos``: static tuple of sorted tuples of row indices.

    VMEM per pallas call = block b's coordinate rows + two (rows_out, Mb)
    tables (streamed-in payload + dual-side accumulator); ``mb`` is sized to
    that budget, python-level block pairs cover any M (same scheme as the
    hand-written symmetric-pair kernels).
    """
    m = var_rows[0].shape[0]
    ncols = len(monos)
    rows_out = -(-ncols // 8) * 8
    if mb is None:
        # vmap-safe budget (see pallas_reductions) minus the software-
        # pipeline carry (the skewed (t, t) exp tile, ~2x live in handoff)
        budget = _sym_budget_floats() - 2 * t * t
        mb_max = budget // (2 * rows_out + 8)
        mb_max = max(t, min(65536, (mb_max // t) * t))
        # block count first, then the smallest t-aligned block that covers
        # m in that many blocks: the pair loop computes mpad^2 pairs, so a
        # budget-maximal mb can pad m far past the real point count (131072
        # at a 53248 cap -> mpad 159744 = 1.49x the true pair work, which
        # cancelled the halved-exp win entirely when first measured)
        nb = -(-m // mb_max)
        mb = -(-(-(-m // nb)) // t) * t
        mb = max(t, mb)
    else:
        mb = max(t, (mb // t) * t)
    mpad = -(-m // mb) * mb

    coords = jnp.zeros((8, mpad), jnp.float32)
    for dd in range(d):
        coords = coords.at[dd, :m].set(var_rows[dd])
    # full payload table, built once in plain jnp (XLA fuses the products);
    # shared monomial prefixes cost one multiply each
    cache = {(): var_rows[mask_row]}

    def mono_col(mn):
        if mn not in cache:
            cache[mn] = mono_col(mn[:-1]) * var_rows[mn[-1]]
        return cache[mn]

    table = jnp.zeros((rows_out, mpad), jnp.float32)
    for c, mn in enumerate(monos):
        table = table.at[c, :m].set(mono_col(mn))
    sig = jnp.reshape(jnp.asarray(sigma, jnp.float32), (1, 1))

    nb = mpad // mb
    tables = [jnp.zeros((rows_out, mb), jnp.float32) for _ in range(nb)]
    for a in range(nb):
        ca = coords[:, a * mb:(a + 1) * mb]
        pa = table[:, a * mb:(a + 1) * mb]
        for b in range(a + 1):
            cb = coords[:, b * mb:(b + 1) * mb]
            pb = table[:, b * mb:(b + 1) * mb]
            kernel = functools.partial(
                _ksum_sym_pair_kernel, d=d, t=t, rows_out=rows_out,
                same_block=(a == b),
            )
            ta, tb = pl.pallas_call(
                kernel,
                grid=(mb // t,),
                in_specs=[
                    pl.BlockSpec((8, t), lambda i: (0, i),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((rows_out, t), lambda i: (0, i),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, 1), lambda i: (0, 0),
                                 memory_space=pltpu.SMEM),
                ],
                out_specs=[
                    pl.BlockSpec((rows_out, t), lambda i: (0, i),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((rows_out, mb), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_shape=[
                    jax.ShapeDtypeStruct((rows_out, mb), jnp.float32),
                    jax.ShapeDtypeStruct((rows_out, mb), jnp.float32),
                ],
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("arbitrary",),
                ),
                interpret=_interpret(),
            )(ca, pa, cb, pb, sig)
            # ta: block-a rows' contributions from (i, j<=i [or all j])
            # pairs; tb: the dual-side contributions to block b — for
            # a == b that is the strict upper triangle of the same block
            tables[a] = tables[a] + ta
            tables[b] = tables[b] + tb
    T = jnp.concatenate(tables, axis=1)
    return T[:ncols, :m].T


# ---------------------------------------------------------------------------
# KRed / KRedScal (kernel.py:134-138) with hand-derived kernel-sum VJPs
# ---------------------------------------------------------------------------

@jax.custom_vjp
def kred_mm(x, y, b, sigma, mask_y):
    """sum_j K(x_i - y_j) m_j b_j  (vector payload b (N, B)) -> (Nx, B).

    VJP (cotangent g):  with delta = x_i - y_j, u = 1/sigma^2,
      db_j  = m_j sum_i K g_i                       (reverse kernel-sum)
      dx_i  = -u sum_j K m_j (g_i . b_j) delta      (forward, cols b, y*b)
      dy_j  = +u m_j sum_i K (g_i . b_j) delta      (reverse, cols g, x*g)
    sigma / mask cotangents are None (not differentiated).
    """
    return _kred_fwd_impl(x, y, b, sigma, mask_y)


def _kred_fwd_impl(x, y, b, sigma, mask_y):
    return pairwise_ksum(x, y, b, sigma, mask_y)


def _kred_fwd(x, y, b, sigma, mask_y):
    return _kred_fwd_impl(x, y, b, sigma, mask_y), (x, y, b, sigma, mask_y)


def _kred_bwd(res, g):
    x, y, b, sigma, mask_y = res
    d = x.shape[1]
    bb = b.shape[1]
    my = mask_y if mask_y is not None else jnp.ones((y.shape[0],), y.dtype)
    c = _mm_center(y, my)
    xc, yc = x - c, y - c
    u = 1.0 / (sigma * sigma)

    # forward-direction table: cols [b_c | yc_dd b_c]
    cols2 = jnp.concatenate(
        [b] + [yc[:, dd:dd + 1] * b for dd in range(d)], axis=1
    )
    a2 = pairwise_ksum(xc, yc, cols2, sigma, my)      # (Nx, B + d*B)
    gb = jnp.einsum("ic,ic->i", g, a2[:, :bb])        # sum_c g_c A[b_c]
    dx = jnp.stack(
        [
            -u * (xc[:, dd] * gb
                  - jnp.einsum("ic,ic->i", g,
                               a2[:, bb * (1 + dd):bb * (2 + dd)]))
            for dd in range(d)
        ],
        axis=1,
    )

    # reverse-direction table: cols [g_c | xc_dd g_c]
    cols3 = jnp.concatenate(
        [g] + [xc[:, dd:dd + 1] * g for dd in range(d)], axis=1
    )
    a3 = pairwise_ksum(yc, xc, cols3, sigma, None)    # (N, B + d*B)
    db = a3[:, :bb] * my[:, None]
    bg = jnp.einsum("jc,jc->j", b, a3[:, :bb])        # sum_c b_c A'[g_c]
    dy = jnp.stack(
        [
            u * my * (
                jnp.einsum("jc,jc->j", b,
                           a3[:, bb * (1 + dd):bb * (2 + dd)])
                - yc[:, dd] * bg
            )
            for dd in range(d)
        ],
        axis=1,
    )
    return dx, dy, db, None, None


kred_mm.defvjp(_kred_fwd, _kred_bwd)


def kred_scal_mm(x, y, dvec, sigma, mask_y=None):
    """Scalar-payload kernel-sum (kernel.py:134) on the generic MM kernel."""
    return kred_mm(x, y, dvec[:, None], sigma, mask_y)[:, 0]


# ---------------------------------------------------------------------------
# GradKRed (kernel.py:142) with hand-derived VJP
# ---------------------------------------------------------------------------

def _sym_pairs(d):
    return [(a, b) for a in range(d) for b in range(a, d)]


@jax.custom_vjp
def grad_kred_mm(x, y, sigma, mask_y):
    """sum_j (grad K)(x_i - y_j) m_j = -u sum_j K m_j (x_i - y_j) -> (Nx, d).

    Forward cols [1 | yc_e]; VJP expands (g.delta) delta into monomials of
    degree <= 2 on each side (see the derivations inline).
    """
    return _gkred_fwd_impl(x, y, sigma, mask_y)


def _gkred_fwd_impl(x, y, sigma, mask_y):
    d = x.shape[1]
    my = mask_y if mask_y is not None else jnp.ones((y.shape[0],), y.dtype)
    c = _mm_center(y, my)
    xc, yc = x - c, y - c
    u = 1.0 / (sigma * sigma)
    cols = jnp.concatenate(
        [jnp.ones((y.shape[0], 1), y.dtype), yc], axis=1
    )
    a = pairwise_ksum(xc, yc, cols, sigma, my)        # (Nx, 1 + d)
    return -u * (xc * a[:, :1] - a[:, 1:1 + d])


def _gkred_fwd(x, y, sigma, mask_y):
    return _gkred_fwd_impl(x, y, sigma, mask_y), (x, y, sigma, mask_y)


def _gkred_bwd(res, g):
    x, y, sigma, mask_y = res
    n, d = y.shape
    my = mask_y if mask_y is not None else jnp.ones((n,), y.dtype)
    c = _mm_center(y, my)
    xc, yc = x - c, y - c
    u = 1.0 / (sigma * sigma)
    sym = _sym_pairs(d)

    # dx_i,dd = -u g_dd A[1] + u^2 sum_e g_e < (xc_e - y_e)(xc_dd - y_dd) >_K
    cols2 = jnp.concatenate(
        [jnp.ones((n, 1), y.dtype), yc]
        + [yc[:, a:a + 1] * yc[:, b:b + 1] for a, b in sym],
        axis=1,
    )
    a2 = pairwise_ksum(xc, yc, cols2, sigma, my)

    def A2_one():
        return a2[:, 0]

    def A2_y(e):
        return a2[:, 1 + e]

    def A2_yy(a, b):
        key = (a, b) if a <= b else (b, a)
        return a2[:, 1 + d + sym.index(key)]

    ge_sum = jnp.einsum("ie,ie->i", g, xc)            # sum_e g_e xc_e
    dx_cols = []
    for dd in range(d):
        t = -u * g[:, dd] * A2_one()
        quad = (
            xc[:, dd] * ge_sum * A2_one()
            - xc[:, dd] * jnp.einsum("ie,ie->i", g,
                                     jnp.stack([A2_y(e) for e in range(d)],
                                               axis=1))
            - ge_sum * A2_y(dd)
            + sum(g[:, e] * A2_yy(dd, e) for e in range(d))
        )
        dx_cols.append(t + u * u * quad)
    dx = jnp.stack(dx_cols, axis=1)

    # dy_j,dd = m_j [ u A'[g_dd] - u^2 ( A'[s x_dd] - yc_dd A'[s]
    #                 - sum_e yc_e A'[x_dd g_e] + yc_dd sum_e yc_e A'[g_e] ) ]
    # with s_i = sum_e g_ie xc_ie
    s = ge_sum
    cols3 = jnp.concatenate(
        [g, s[:, None], s[:, None] * xc]
        + [xc[:, a:a + 1] * g for a in range(d)],     # x_a g_e blocks
        axis=1,
    )
    a3 = pairwise_ksum(yc, xc, cols3, sigma, None)

    def A3_g(e):
        return a3[:, e]

    def A3_s():
        return a3[:, d]

    def A3_sx(dd):
        return a3[:, d + 1 + dd]

    def A3_xg(a, e):
        return a3[:, d + 1 + d + a * d + e]

    dy_cols = []
    for dd in range(d):
        quad = (
            A3_sx(dd)
            - yc[:, dd] * A3_s()
            - sum(yc[:, e] * A3_xg(dd, e) for e in range(d))
            + yc[:, dd] * sum(yc[:, e] * A3_g(e) for e in range(d))
        )
        dy_cols.append(my * (u * A3_g(dd) - u * u * quad))
    dy = jnp.stack(dy_cols, axis=1)
    return dx, dy, None, None


grad_kred_mm.defvjp(_gkred_fwd, _gkred_bwd)


# ---------------------------------------------------------------------------
# Hamiltonian (LDDMM.py:142-159): value + gradient at fused-RHS kernel speed
# ---------------------------------------------------------------------------

def make_hamiltonian(sigma: float, eta: float, ti: int = 256, tj: int = 512):
    """Custom-VJP H(q, p, mask) for a fixed (sigma, eta).

    The gradient is free mathematically: dH/dp = v(q) and dH/dq = Gq are
    exactly the fused-RHS kernel outputs (reference LDDMM.py:176-203 — the
    Hamiltonian ODE is (dH/dp, -dH/dq)).  eta == 0 additionally gets the
    VALUE from the same outputs via H = 1/2 sum_i p_i . v(q)_i, so forward
    stashes (vq, Gq) and the backward is a pure epilogue; eta != 0 computes
    the value through the generic kernel-sum (cols [1 | q | p | |q|^2]) and
    the backward runs the streaming any-eta RHS kernel once.
    """
    sigma = float(sigma)
    eta = float(eta)
    u = 1.0 / (sigma * sigma)

    def _eta0_parts(q, p, mask):
        qc = q - _mm_center(q, mask)
        vq, gq, _ = _rhs_self_fwd_best(qc, p, mask, sigma, False, ti, tj)
        return vq, gq  # gq = dH/dq, vq = dH/dp (rows already mask-weighted)

    @jax.custom_vjp
    def op(q, p, mask):
        if eta == 0.0:
            vq, _ = _eta0_parts(q, p, mask)
            return 0.5 * jnp.vdot(p, vq)
        return _eta_value(q, p, mask)

    def _eta_value(q, p, mask):
        n, d = q.shape
        qc = q - _mm_center(q, mask)
        q2 = jnp.sum(qc * qc, axis=1, keepdims=True)
        cols = jnp.concatenate(
            [jnp.ones((n, 1), q.dtype), qc, p, q2], axis=1
        )
        a = pairwise_ksum(qc, qc, cols, sigma, mask, ti, tj)
        A1 = a[:, 0]
        Aq = a[:, 1:1 + d]
        Ap = a[:, 1 + d:1 + 2 * d]
        Aqq = a[:, 1 + 2 * d]
        h = 0.5 * jnp.einsum("ie,ie->i", p, Ap)
        h = h + eta * u * (jnp.einsum("ie,ie->i", p, qc) * A1
                           - jnp.einsum("ie,ie->i", p, Aq))
        lap = u * (jnp.sum(qc * qc, axis=1) * A1
                   - 2.0 * jnp.einsum("ie,ie->i", qc, Aq) + Aqq) - d * A1
        h = h - 0.5 * eta * eta * u * lap
        return jnp.sum(mask * h)

    def fwd(q, p, mask):
        if eta == 0.0:
            vq, gq = _eta0_parts(q, p, mask)
            return 0.5 * jnp.vdot(p, vq), (vq, gq)
        return _eta_value(q, p, mask), (q, p, mask)

    def bwd(res, ghat):
        if eta == 0.0:
            vq, gq = res
            return ghat * gq, ghat * vq, None
        q, p, mask = res
        vq, gq, _ = _rhs_self_fwd_pallas(q, p, mask, sigma, eta, False,
                                         ti, tj)
        return ghat * gq, ghat * vq, None

    op.defvjp(fwd, bwd)
    return op


# ---------------------------------------------------------------------------
# mdivsum (LDDMM.py:120-138): the one reduction that previously had no MXU
# path — its pair density IS the ext logdet component dcx of the
# pair-polynomial compiler, so forward AND backward are generated kernels
# ---------------------------------------------------------------------------

def make_mdivsum(sigma: float, eta: float, ti: int = 256, tj: int = 512):
    """Custom-VJP mdivsum(x, q, p, mask_q, mask_x) -> scalar.

    sum over data points x of -div(v)(x_i)
      = sum_ij k(x_i - q_j) m_i m_j [ u p_j.(x_i - q_j)
                                      + eta u (u d2 - d) ],  u = 1/sigma^2
    (reference LDDMM.py:120-138, expressed there as
    ``(p * GradKRed(q, x)).sum() + eta * LapKRed(q, x).sum()``).

    Forward: ONE generic payload-matmul kernel-sum over the dcx component
    density (`pair_poly._ext_component_polys`).  Backward: the generated
    ext backward polynomials with gv = 0 and gc = the scalar cotangent —
    the same machinery that differentiates the fused ext RHS.
    """
    from difficp_tpu.ops import pair_poly as _pp

    sigma = float(sigma)
    eta = float(eta)

    def _value(x, q, p, mask_q, mask_x):
        d = x.shape[1]
        c = _mm_center(q, mask_q)
        xc, qc = x - c, q - c
        polys = {
            "dcx": _pp._ext_fwd_polys(d, sigma, eta, True)["dcx"],
        }
        xvals = {"m": mask_x}
        qvals = {"m": mask_q}
        for e in range(d):
            xvals[f"q{e}"] = xc[:, e]
            qvals[f"q{e}"] = qc[:, e]
            qvals[f"p{e}"] = p[:, e]
        outs = _pp.eval_polys(polys, xc, qc, xvals, qvals, sigma, ti, tj)
        return jnp.sum(outs["dcx"])

    @jax.custom_vjp
    def op(x, q, p, mask_q, mask_x):
        return _value(x, q, p, mask_q, mask_x)

    def fwd(x, q, p, mask_q, mask_x):
        return _value(x, q, p, mask_q, mask_x), (x, q, p, mask_q, mask_x)

    def bwd(res, ghat):
        x, q, p, mask_q, mask_x = res
        c = _mm_center(q, mask_q)
        zx = jnp.zeros_like(x)
        dq, dp, dx = _pp.rhs_ext_bwd_poly(
            q - c, p, x - c, mask_q, mask_x, zx, ghat, sigma, eta, ti, tj,
        )
        return dx, dq, dp, None, None

    op.defvjp(fwd, bwd)
    return op


# ---------------------------------------------------------------------------
# v at external points (LDDMM.py:100-116) on the existing ext kernels
# ---------------------------------------------------------------------------

def make_v_field(sigma: float, eta: float, ti: int = 256, tj: int = 512):
    """Custom-VJP v(x; q, p, mask_q) -> (Nx, d).

    Forward: the ext-RHS vx kernel (payload-matmul for eta == 0, streaming
    VPU for eta != 0).  Backward: the ext cross-term kernels with gc = 0
    for eta == 0; blockwise VJP for eta != 0 (same fallback policy as the
    fused ext RHS)."""
    sigma = float(sigma)
    eta = float(eta)

    @jax.custom_vjp
    def op(x, q, p, mask_q):
        c = _mm_center(q, mask_q)
        ones = jnp.ones((x.shape[0],), x.dtype)
        vx, _ = _vx_fwd_pallas(x - c, ones, q - c, p, mask_q, sigma, eta,
                               False, ti, tj)
        return vx

    def fwd(x, q, p, mask_q):
        return op(x, q, p, mask_q), (x, q, p, mask_q)

    def bwd(res, g):
        x, q, p, mask_q = res
        if eta != 0.0:
            _, vjp = jax.vjp(
                lambda x_, q_, p_: _block.v_field(x_, q_, p_, sigma, eta,
                                                  mask_q),
                x, q, p,
            )
            dx, dq, dp = vjp(g)
            return dx, dq, dp, None
        c = _mm_center(q, mask_q)
        ones = jnp.ones((x.shape[0],), x.dtype)
        dq, dp, dx = _ext_bwd_pallas(
            q - c, p, x - c, mask_q, ones, g, jnp.zeros((), q.dtype),
            sigma, ti, tj,
        )
        return dx, dq, dp, None

    op.defvjp(fwd, bwd)
    return op
