"""'Standard' diffeomorphic point-set registration (Glaunès et al. 2004 /
Deformetrica style): a deformable template warped to each data set under an
RKHS measure-distance loss.

Re-design of reference diffICP/core/PSR_standard.py:37-686 (MultiPSR_std /
DiffPSR_std / AffinePSR_std and ``data_distance``):

- ``data_distance``: RKHS distance of point clouds viewed as (weighted)
  signed measures (PSR_standard.py:37-58).
- Energy  E = sum_{k,s} dataloss[k,s] / noise_std[s]^2 + sum_k regloss[k],
  monotone under the alternating Reg_opt / Template_opt
  (PSR_standard.py:168-177, 311-316 — the oracle).
- ``Reg_opt``: per-frame LDDMM optimization of momenta a0[k] — vmapped
  lockstep across frames here (reference loops k at PSR_standard.py:514).
- ``Template_opt``: L-BFGS over the template positions y0[s] (and optional
  per-point weights w0[s], the experimental ``template_weights`` feature);
  the gradient flows through all K shoots at once via ``jax.vmap`` +
  ``jax.grad`` (reference accumulates a Python loop of K graphs,
  PSR_standard.py:226-255).
- When the template moves, the (dense) support points move with it and the
  momenta are re-projected on the new RKHS span (PSR_standard.py:299-309).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from difficp_tpu.models import affine as affine_mod
from difficp_tpu.models import lddmm as lddmm_mod
from difficp_tpu.ops import backend as red
from difficp_tpu.models.registration import AffineRegistration, LDDMMRegistration
from difficp_tpu.utils.io import pad_structures
from difficp_tpu.utils.lbfgs import lbfgs_optimize
from difficp_tpu.utils.lbfgs import zero_memory as lbfgs_zero_memory
from difficp_tpu.utils.point_sets import decimate, grid_support


def data_distance(x, y, sigma, w=None, mask_x=None, mask_y=None,
                  skip_xx=False):
    """RKHS distance between data x and (weighted) template y
    (PSR_standard.py:37-58):

        L = <fx, fx> + <fy, fy> - 2 <fy, fx>,   fx = 1/Nx sum_i K(., x_i),
        fy = 1/Ny sum_j K(., y_j)  (or sum_j w_j K(., y_j) with weights).

    Differentiable wrt y (and w).  Masked x/y points carry zero weight.

    Each inner product streams through the dispatched kernel-sum (KeOps role
    in the reference, PSR_standard.py:44-58): O(Nx + Ny) memory above the
    dense pair limit instead of an (Nx, Ny) Gram materialization.

    ``skip_xx=True`` drops the <fx, fx> term — constant wrt y/w, so
    optimizers over the template can skip the largest (Nx^2-pair) reduction
    per evaluation; reported losses must keep it (default).
    """
    nx = jnp.sum(mask_x) if mask_x is not None else x.shape[0]
    ny = jnp.sum(mask_y) if mask_y is not None else y.shape[0]

    def ksum(a, b, wa, wb):
        # <fa, fb> = sum_i wa_i [sum_j K(a_i - b_j) wb_j]
        return jnp.vdot(wa, red.kred_scal(a, b, wb, sigma))

    wx = (mask_x if mask_x is not None else jnp.ones(x.shape[0], x.dtype)) / nx
    if w is None:
        wy = (mask_y if mask_y is not None else jnp.ones(y.shape[0], y.dtype)) / ny
    else:
        wy = w * mask_y if mask_y is not None else w
    out = ksum(y, y, wy, wy) - 2.0 * ksum(y, x, wy, wx)
    if not skip_xx:
        out = out + ksum(x, x, wx, wx)
    return out


# ---------------------------------------------------------------------------


def _frame_rkhs_dataloss(xk, xmk, w0, noise2, data_sigma, slices):
    """One frame's RKHS dataloss sum_s data_distance(x_s, pts_s)/noise2_s
    (skip_xx; PSR_standard.py:168-177) — THE shared builder for the seed
    programs, stepwise Reg_opt, the fused run loop and the affine fits, so
    the 1/||g0|| seeds can never drift from the optimized objective.
    ``w0`` is the concatenated template weights or None."""

    def dataloss(pts):
        l = jnp.zeros((), pts.dtype)
        for s, (ylo, yhi, xlo, xhi) in enumerate(slices):
            l = l + data_distance(
                xk[xlo:xhi], pts[ylo:yhi], data_sigma,
                w=None if w0 is None else w0[ylo:yhi],
                mask_x=xmk[xlo:xhi], skip_xx=True,
            ) / noise2[s]
        return l

    return dataloss


@partial(jax.jit, static_argnames=("lcfg", "slices", "use_ext", "nmax",
                                   "inner", "ls_steps"))
def _reg_opt_std(lcfg, q0, a0, ally0, x, xmask, noise2, data_sigma, w0,
                 slices, use_ext, nmax, tol, alpha0=None, inner=20,
                 ls_steps=25, mem0=None, vg0=None, alpha_qn0=None):
    """All-frames LDDMM registration of the template onto each data set.

    x: (K, Ntot_x, D) padded data (concatenated structures); slices index the
    template concat dimension per structure.  ``alpha0``: per-frame (K,)
    line-search warm starts (0 = cold).  ``mem0``: per-frame batched
    LBFGSMemory carried across watchdog-split calls (None = fresh).
    ``vg0``: per-frame batched (grad, final, trajl, datal) of the previous
    call at ``a0`` — only valid while the template/support/noise are
    unchanged; skips the entry value+grad of every L-BFGS.
    Returns new a0, warped templates y1 (K, Ntot_y, D), regloss, datal,
    nsteps, change, accepted step sizes, final memory (or None), and the
    new vg tuple for the next threaded call.
    """
    warm = alpha0 is not None
    if not warm:
        alpha0 = jnp.zeros((a0.shape[0],), jnp.float32)  # dummy for vmap
    carry_mem = mem0 is not None
    if not carry_mem:
        mem0 = jnp.zeros((a0.shape[0],), jnp.float32)  # dummy vmap operand
    carry_vg = vg0 is not None
    if not carry_vg:
        vg0 = jnp.zeros((a0.shape[0],), jnp.float32)
    if alpha_qn0 is None:
        alpha_qn0 = jnp.ones((a0.shape[0],), jnp.float32)

    def one(a0k, xk, xmk, alk, memk, vgk, aqnk):
        # skip_xx: the data-data term is constant wrt the momenta
        dataloss = _frame_rkhs_dataloss(xk, xmk, w0, noise2, data_sigma,
                                        slices)
        res = lddmm_mod.optimize(
            lcfg, dataloss, q0, a0k,
            ally0 if use_ext else None,
            None, None, nmax=nmax, tol=tol, alpha0=alk if warm else None,
            alpha_qn0=aqnk,
            inner=inner, max_linesearch_steps=ls_steps,
            memory0=memk if carry_mem else None,
            warm_vg=vgk if carry_vg else None,
        )
        y1k = res.final.x if use_ext else res.final.q
        return (res.p0, y1k, res.trajl, res.datal, res.n_steps, res.change,
                res.alpha,
                res.memory if carry_mem else jnp.zeros((), jnp.float32),
                (res.grad, res.final, res.trajl, res.datal), res.alpha_qn)

    return jax.vmap(one)(a0, x, xmask, alpha0, mem0, vg0, alpha_qn0)


@partial(jax.jit, static_argnames=("slices",))
def _datalosses_ydep(x, xmask, y1, w0cat, slices, data_sigma, noise2):
    """y-dependent part of the (K, S) dataloss matrix — <fy, fy> - 2<fy, fx>
    for every frame and structure in ONE program (the constant <fx, fx> term
    is cached by the caller)."""

    def one(xk, xmk, y1k):
        vals = []
        for s, (ylo, yhi, xlo, xhi) in enumerate(slices):
            vals.append(
                data_distance(
                    xk[xlo:xhi], y1k[ylo:yhi], data_sigma,
                    w=None if w0cat is None else w0cat[ylo:yhi],
                    mask_x=xmk[xlo:xhi], skip_xx=True,
                ) / noise2[s]
            )
        return jnp.stack(vals)

    return jax.vmap(one)(x, xmask, y1)


@jax.jit
def _xx_term(x, sigma, mask_x):
    """The constant <fx, fx> term of data_distance for one frame (vmapped by
    callers) — computed once per run since the data never moves."""
    nx = jnp.sum(mask_x)
    wx = mask_x / nx
    return jnp.vdot(wx, red.kred_scal(x, x, wx, sigma))


def _tmpl_lossfn(lcfg, q0, a0, x_s, xm_s, data_sigma, noise2, use_weights):
    """Template objective over one structure: sum over K frozen shoots of
    the RKHS distance (PSR_standard.py:226-255).  The optimization variable
    is y0s, or the pytree (y0s, w0s) when ``use_weights``."""

    def loss_of(ys, ws):
        def per_frame(a0k, xk, xmk):
            final, _ = lddmm_mod.shoot(lcfg, q0, a0k, ys)
            return data_distance(
                xk, final.x, data_sigma, w=ws, mask_x=xmk, skip_xx=True
            )
        return jnp.sum(jax.vmap(per_frame)(a0, x_s, xm_s)) / noise2

    if use_weights:
        return lambda p: loss_of(p[0], p[1])
    return lambda y: loss_of(y, None)


@partial(jax.jit, static_argnames=("lcfg", "use_weights", "nmax", "inner",
                                   "ls_steps"))
def _template_opt_std(lcfg, q0, a0, x_s, xm_s, y0s, w0s, data_sigma, noise2,
                      nmax, tol, use_weights, alpha0=None, inner=20,
                      ls_steps=25, mem0=None, vg0=None, alpha_qn0=None):
    """L-BFGS over one structure's template (and optional weights), gradient
    through all K frozen shoots (PSR_standard.py:226-255).  Module-level jit
    so repeated Template_opt calls reuse the compiled program instead of
    re-tracing a fresh closure each time.

    ``mem0``/``vg0``: curvature memory and (loss, grad) of the previous
    call — valid only while q0/a0/x/noise are unchanged (grid/custom
    support between Reg_opts; dense support moves q0 with the template, so
    a split sequence there must re-evaluate).
    """
    lossfn = _tmpl_lossfn(lcfg, q0, a0, x_s, xm_s, data_sigma, noise2,
                          use_weights)
    params0 = (y0s, w0s) if use_weights else y0s
    res = lbfgs_optimize(
        lossfn, params0, nmax=nmax, tol=tol, alpha0=alpha0, inner=inner,
        alpha_qn0=alpha_qn0,
        max_linesearch_steps=ls_steps, memory0=mem0,
        value0=None if vg0 is None else vg0[0],
        grad0=None if vg0 is None else vg0[1],
    )
    ys, ws = (res.params if use_weights else (res.params, w0s))
    return (ys, ws, res.loss, res.n_steps, res.alpha, res.memory,
            (res.loss, res.grad), res.alpha_qn)


@partial(
    jax.jit,
    static_argnames=(
        "lcfg", "slices", "n_outer", "reg_nmax", "reg_inner", "reg_ls",
        "tmpl_nmax", "dense_support", "use_weights",
    ),
)
def _run_loop_std(
    q0, a0, y0, w0, x, xmask, noise2, data_sigma,
    lcfg, slices, n_outer, reg_nmax, reg_tol, reg_inner, reg_ls,
    tmpl_nmax, tmpl_tol, dense_support, use_weights,
    alpha0_reg=None, alpha0_tmpl=None,
):
    """The standard algorithm's whole alternating loop (Reg_opt +
    Template_opt, reference PSR_standard.py:507-564) fused into ONE compiled
    program — the analog of ``psr._run_loop_lddmm`` for the RKHS-loss model.

    ``dense_support``: the template is the support (support_scheme None) —
    after each template move the support follows it and the momenta are
    re-projected on the new span (PSR_standard.py:299-309).  Otherwise
    (grid/custom support) q0 is fixed.  The host-side "decim" scheme cannot
    run fused (decimation is data-dependent on the host).

    Returns final (q0, a0, y0, w0, y1), per-phase energies (n_outer, 2)
    [after Reg_opt, after Template_opt] *excluding* the constant <fx,fx>
    term, the final per-(k, s) datalosses (same convention) and regloss.
    """
    k = x.shape[0]
    use_ext = not dense_support

    def dataloss_frame(pts, xk, xmk, w0c):
        return _frame_rkhs_dataloss(
            xk, xmk, w0c if use_weights else None, noise2, data_sigma,
            slices,
        )(pts)

    def datal_matrix(y1, w0c):
        """Per-(k, s) dataloss (skip_xx convention), (K, S)."""
        cols = []
        for s, (ylo, yhi, xlo, xhi) in enumerate(slices):
            def one(y1k, xk, xmk):
                return data_distance(
                    xk[xlo:xhi], y1k[ylo:yhi], data_sigma,
                    w=None if not use_weights else w0c[ylo:yhi],
                    mask_x=xmk[xlo:xhi], skip_xx=True,
                ) / noise2[s]
            cols.append(jax.vmap(one)(y1, x, xmask))
        return jnp.stack(cols, axis=1)

    def outer(carry, _):
        q0, a0, y0, w0, al_reg, al_tmpl = carry

        # ---- Reg_opt: all frames in lockstep --------------------------
        def one(a0k, xk, xmk, alk):
            res = lddmm_mod.optimize(
                lcfg,
                lambda pts: dataloss_frame(pts, xk, xmk, w0),
                q0, a0k,
                y0 if use_ext else None,
                None, None,
                nmax=reg_nmax, tol=reg_tol, inner=reg_inner,
                max_linesearch_steps=reg_ls, alpha0=alk,
            )
            y1k = res.final.x if use_ext else res.final.q
            return res.p0, y1k, res.trajl, res.datal, res.alpha

        a0, y1, regl, datal, al_reg = jax.vmap(one)(a0, x, xmask, al_reg)
        e_reg = jnp.sum(regl) + jnp.sum(datal)

        # ---- Template_opt: per structure, through K frozen shoots -----
        new_y0, new_w0, new_al = [], [], []
        for s, (ylo, yhi, xlo, xhi) in enumerate(slices):
            ys, ws, _, _, als, _, _, _ = _template_opt_std(
                lcfg, q0, a0, x[:, xlo:xhi], xmask[:, xlo:xhi],
                y0[ylo:yhi],
                w0[ylo:yhi] if use_weights else jnp.zeros((0,), y0.dtype),
                data_sigma, noise2[s], tmpl_nmax, tmpl_tol, use_weights,
                alpha0=al_tmpl[s],
            )
            new_y0.append(ys)
            new_w0.append(ws)
            new_al.append(als)
        al_tmpl = jnp.stack(new_al)
        y0 = jnp.concatenate(new_y0, axis=0)
        w0 = jnp.concatenate(new_w0, axis=0) if use_weights else w0

        # ---- support follows the template (dense support) -------------
        if dense_support:
            q0_prev = q0
            q0 = y0

            def reproject(a0k):
                v_new = lddmm_mod.v(lcfg, q0, q0_prev, a0k)
                return lddmm_mod.v2p(lcfg, q0, v_new, rcond=1e-1)

            a0 = jax.vmap(reproject)(a0)

        # ---- refreshed state + energy after the template move ---------
        def rewarp(a0k):
            final, _ = lddmm_mod.shoot(
                lcfg, q0, a0k, y0 if use_ext else None
            )
            y1k = final.x if use_ext else final.q
            return y1k, lddmm_mod.trajloss(lcfg, q0, a0k, final.cost)

        y1, regl = jax.vmap(rewarp)(a0)
        dmat = datal_matrix(y1, w0)
        e_tmpl = jnp.sum(regl) + jnp.sum(dmat)

        return (q0, a0, y0, w0, al_reg, al_tmpl), (e_reg, e_tmpl, regl, dmat)

    if alpha0_reg is None:
        alpha0_reg = jnp.zeros((k,), jnp.float32)
    if alpha0_tmpl is None:
        alpha0_tmpl = jnp.zeros((len(slices),), jnp.float32)
    carry0 = (q0, a0, y0, w0, alpha0_reg, alpha0_tmpl)
    (q0, a0, y0, w0, al_reg, al_tmpl), (e_regs, e_tmpls, regls, dmats) = (
        jax.lax.scan(outer, carry0, None, length=n_outer)
    )

    def rewarp_final(a0k):
        final, _ = lddmm_mod.shoot(lcfg, q0, a0k, y0 if use_ext else None)
        return final.x if use_ext else final.q

    y1 = jax.vmap(rewarp_final)(a0)
    energies = jnp.stack([e_regs, e_tmpls], axis=1)
    return q0, a0, y0, w0, y1, energies, regls[-1], dmats[-1], al_reg, al_tmpl


class MultiPSRStd:
    """Common machinery (reference MultiPSR_std, PSR_standard.py:67-316)."""

    def __init__(self, x, y_template, noise_std, data_sigma,
                 template_weights: bool = False):
        self.printstuff = True
        self.data_sigma = float(data_sigma)

        # data (fixed): padded per structure
        self.structs = pad_structures(x)
        self.S = len(self.structs)
        self.K = self.structs[0].k
        self.D = self.structs[0].x.shape[2]

        # template y0[s]: exact sizes (single copy; no padding needed)
        if not isinstance(y_template, (list, tuple)):
            y_template = [y_template] * self.S
        self.y0 = [jnp.asarray(np.asarray(t, np.float32)) for t in y_template]
        self.ny = [t.shape[0] for t in self.y0]

        if not isinstance(noise_std, (list, tuple)):
            noise_std = [noise_std] * self.S
        self.noise_std = [float(v) for v in noise_std]

        # x concat view (K, Ntot_x, D) and per-structure slices of both the
        # template concat axis and data concat axis
        self.x = jnp.concatenate([pf.x for pf in self.structs], axis=1)
        self.xmask = jnp.concatenate([pf.mask for pf in self.structs], axis=1)
        self.slices = []
        yo = xo = 0
        for s in range(self.S):
            ys = self.ny[s]
            xs = self.structs[s].nmax
            self.slices.append((yo, yo + ys, xo, xo + xs))
            yo += ys
            xo += xs
        self.ny_tot = yo

        self.template_weights = template_weights
        if template_weights:
            self.w0 = [jnp.ones(n) / n for n in self.ny]
        else:
            self.w0 = [None] * self.S

        # warped templates per frame (K, Ntot_y, D)
        ally0 = jnp.concatenate(self.y0, axis=0)
        self.y1 = jnp.broadcast_to(ally0[None], (self.K, self.ny_tot, self.D))

        self.regloss = np.zeros(self.K)
        self.dataloss = np.zeros((self.K, self.S))
        self.E: Optional[float] = None
        self.e_increase_events = 0

    # ------------------------------------------------------------------

    @property
    def ally0(self):
        return jnp.concatenate(self.y0, axis=0)

    @property
    def w0_cat(self):
        if not self.template_weights:
            return None
        return jnp.concatenate(self.w0, axis=0)

    def get_template(self, s=0):
        return np.asarray(self.y0[s])

    def get_warped_template(self, k=0, s=0):
        ylo, yhi, _, _ = self.slices[s]
        return np.asarray(self.y1[k, ylo:yhi])

    def get_data_points(self, k=0, s=0):
        return self.structs[s].unpad(k)

    def _dataloss_ks(self, k, s):
        ylo, yhi, xlo, xhi = self.slices[s]
        return float(
            data_distance(
                self.x[k, xlo:xhi], self.y1[k, ylo:yhi], self.data_sigma,
                w=self.w0[s], mask_x=self.xmask[k, xlo:xhi],
            )
        ) / self.noise_std[s] ** 2

    def _const_xx(self):
        """Per-(k, s) constant <fx, fx>/noise^2 matrix (data-only term)."""
        cols = []
        for s, (_, _, xlo, xhi) in enumerate(self.slices):
            v = jax.vmap(lambda xk, mk: _xx_term(xk, self.data_sigma, mk))(
                self.x[:, xlo:xhi], self.xmask[:, xlo:xhi]
            )
            cols.append(np.asarray(v, np.float64) / self.noise_std[s] ** 2)
        return np.stack(cols, axis=1)

    def update_datalosses(self):
        """Refresh the (K, S) dataloss matrix.

        The <fx, fx> term is constant (the data never moves) — computed once
        and cached; the y-dependent terms for ALL frames and structures run
        as ONE jitted program with a single host readback.  The old
        per-(k, s) eager loop re-ran the Nx^2-pair constant reduction
        K x S times per phase and dominated stepwise wall-clock at scale
        (K=10 x N=16k on chip: ~37-44 s/outer-iter before, ~11 s after —
        the eager constant terms cost ~3x the actual L-BFGS work)."""
        if getattr(self, "_xx_cache", None) is None:
            self._xx_cache = self._const_xx()
        noise2 = jnp.asarray([v**2 for v in self.noise_std])
        ydep = _datalosses_ydep(self.x, self.xmask, self.y1, self.w0_cat,
                                tuple(self.slices), self.data_sigma, noise2)
        self.dataloss = self._xx_cache + np.asarray(ydep, np.float64)

    def update_E(self, message=None):
        e = float(self.regloss.sum()) + float(self.dataloss.sum())
        if self.printstuff and message is not None:
            print(message.ljust(70) + f"Total energy = {e:.8}")
        if self.E is not None and e > self.E + 1e-4 * abs(self.E) + 1e-6:
            self.e_increase_events += 1
            print("WARNING: measured increase in optimization energy ! Should not happen.")
        self.E = e

    def Reg_opt(self, nmax=10, tol=1e-3):
        raise NotImplementedError

    def Template_opt(self, nmax=10, tol=1e-3):
        raise NotImplementedError


class DiffPSRStd(MultiPSRStd):
    """Standard algorithm with LDDMM registrations
    (reference DiffPSR_std, PSR_standard.py:364-564)."""

    def __init__(self, x, y_template, noise_std, lcfg: lddmm_mod.LDDMMConfig,
                 data_sigma, template_weights: bool = False):
        super().__init__(x, y_template, noise_std, data_sigma, template_weights)
        self.lcfg = lcfg
        self.support_scheme = None
        self.rho = None
        self.q0 = self.ally0
        self.a0 = jnp.zeros((self.K,) + self.q0.shape)
        self.initialize_a0()
        self.update_datalosses()
        self.update_E()

    # ----- momenta (PSR_standard.py:422-440) ---------------------------

    def initialize_a0(self, rcond=1e-3):
        if self.lcfg.eta == 0.0:
            # zero speeds <=> zero momenta when there is no gradcomponent
            self.a0 = jnp.zeros((self.K,) + self.q0.shape, self.q0.dtype)
            return
        p = lddmm_mod.v2p(self.lcfg, self.q0, jnp.zeros_like(self.q0), rcond=rcond)
        self.a0 = jnp.broadcast_to(p[None], (self.K,) + p.shape)

    def update_a0(self, q0_prev, a0_prev=None, rcond=1e-2):
        if a0_prev is None:
            a0_prev = self.a0

        def one(a0k):
            v_new = lddmm_mod.v(self.lcfg, self.q0, q0_prev, a0k)
            return lddmm_mod.v2p(self.lcfg, self.q0, v_new, rcond=rcond)

        self.a0 = jax.vmap(one)(a0_prev)
        # support points moved: carried L-BFGS curvature pairs refer to the
        # old momentum space; the threaded entry (value, grad) is stale too.
        # The template objective depends on (q0, a0) — both moved: drop its
        # carried state entirely.
        self._reg_memory = None
        self._reg_vg = None
        self._tmpl_mem = None
        self._tmpl_vg = None

    def set_support_scheme(self, scheme="decim", rho=1.0, xticks=None,
                           yticks=None, q0=None):
        """Support points from decimated template / grid / custom
        (PSR_standard.py:445-502)."""
        self.rho = rho
        r_cover = rho * self.lcfg.sigma
        q0_prev = self.q0
        self.support_scheme = scheme
        if scheme == "decim":
            pts = []
            for s in range(self.S):
                ys = np.asarray(self.y0[s])
                kept, _ = decimate(ys, r_cover)
                pts.append(ys[kept])
            self.q0 = jnp.asarray(np.concatenate(pts, axis=0))
            if self.printstuff:
                print(f"Decimation : {self.q0.shape[0]} support points")
        elif scheme == "grid":
            ticks = None
            if xticks is not None and yticks is not None:
                ticks = [np.asarray(xticks), np.asarray(yticks)]
            pts = grid_support(np.asarray(self.ally0), r_cover, ticks=ticks)
            self.q0 = jnp.asarray(pts)
        elif scheme == "custom":
            assert q0 is not None
            self.q0 = jnp.asarray(np.asarray(q0, np.float32))
        else:
            raise ValueError(f"Unknown support scheme: {scheme}")
        self.update_a0(q0_prev, rcond=1e-2)

    # ----- partial optimizations ---------------------------------------

    def Reg_opt(self, nmax=10, tol=1e-3, inner=20, ls_steps=25,
                carry_memory=False, carry_value=False):
        """``carry_value=True`` threads the previous Reg_opt's (loss,
        gradient, arrival) at a0 into this call, skipping its entry
        value+grad shoot — valid only between template/support updates
        (Template_opt and update_a0 invalidate it automatically)."""
        use_ext = self.support_scheme is not None
        noise2 = tuple(v**2 for v in self.noise_std)
        alpha0 = getattr(self, "_reg_alpha", None)
        if alpha0 is None:
            # cold sentinel: lbfgs_optimize derives the 1/||g0|| seed for
            # free from its mandatory entry evaluation (same compiled
            # program as the warm path)
            alpha0 = jnp.zeros((self.K,), jnp.float32)
        mem0 = None
        if carry_memory:
            mem0 = getattr(self, "_reg_memory", None)
            if mem0 is None:
                n = self.a0[0].size
                mem0 = jax.vmap(lambda _: lbfgs_zero_memory(n))(
                    jnp.arange(self.K))
        vg0 = getattr(self, "_reg_vg", None) if carry_value else None
        a0, y1, regl, datal, nsteps, change, alpha, mem, vg, aqn = \
            _reg_opt_std(
                self.lcfg, self.q0, self.a0, self.ally0, self.x, self.xmask,
                jnp.asarray(noise2), self.data_sigma, self.w0_cat,
                tuple(self.slices), use_ext, nmax, tol,
                alpha0=alpha0, inner=inner, ls_steps=ls_steps, mem0=mem0,
                vg0=vg0, alpha_qn0=getattr(self, "_reg_alpha_qn", None),
            )
        self._reg_alpha = alpha  # warm-start the next call's line search
        self._reg_alpha_qn = aqn  # adaptive QN trial scale (threaded)
        if carry_memory:
            self._reg_memory = mem
        self._reg_vg = vg  # valid until the template/support/momenta move
        # a0 moved: the TEMPLATE objective changed — its threaded entry
        # (value, grad) is stale (curvature memory tolerates the drift)
        self._tmpl_vg = None
        self.a0 = a0
        self.y1 = y1
        self.regloss = np.asarray(regl, np.float64)
        self.update_datalosses()
        self.update_E(
            message=f"Reg_opt ({self.K} frames in lockstep) : "
            f"loss={float(np.asarray(regl).sum() + np.asarray(datal).sum()):.4}"
        )

    def Template_opt(self, nmax=10, tol=1e-3, inner=20, ls_steps=25,
                     carry_memory=False, carry_value=False):
        """L-BFGS over template positions (and weights); gradient through all
        K shoots (PSR_standard.py:226-255).  Rides the module-level jitted
        ``_template_opt_std`` — one compiled program per static config,
        reused across calls and structures.

        ``carry_memory``/``carry_value``: thread the per-structure L-BFGS
        curvature memory / entry (loss, grad) across watchdog-split calls.
        Only live while the template objective is unchanged — any Reg_opt
        (a0 moved) drops the value pair, and a dense/decim support follow-up
        (q0 moved with the template) drops both.  With grid/custom support a
        split Template_opt sequence then optimizes like one long call at ~1
        eval per step."""
        tmpl_alpha = getattr(self, "_tmpl_alpha", [None] * self.S)
        tmpl_mem = getattr(self, "_tmpl_mem", None) or [None] * self.S
        tmpl_vg = getattr(self, "_tmpl_vg", None) or [None] * self.S
        for s in range(self.S):
            ylo, yhi, xlo, xhi = self.slices[s]
            w0s = (self.w0[s] if self.template_weights
                   else jnp.zeros((0,), self.y0[s].dtype))
            if tmpl_alpha[s] is None:
                # cold sentinel: lbfgs_optimize seeds at ~1/||g0|| for free
                tmpl_alpha[s] = jnp.zeros((), jnp.float32)
            mem0 = None
            if carry_memory:
                mem0 = tmpl_mem[s]
                if mem0 is None:
                    n = self.y0[s].size + (w0s.size
                                           if self.template_weights else 0)
                    mem0 = lbfgs_zero_memory(n)
            vg0 = tmpl_vg[s] if carry_value else None
            tmpl_aqn = getattr(self, "_tmpl_alpha_qn",
                               [None] * len(self.slices))
            ys, ws, loss, n_steps, als, mem, vg, aqn = _template_opt_std(
                self.lcfg, self.q0, self.a0,
                self.x[:, xlo:xhi], self.xmask[:, xlo:xhi],
                self.y0[s], w0s,
                self.data_sigma, self.noise_std[s] ** 2, nmax, tol,
                self.template_weights, alpha0=tmpl_alpha[s],
                inner=inner, ls_steps=ls_steps, mem0=mem0, vg0=vg0,
                alpha_qn0=tmpl_aqn[s],
            )
            tmpl_aqn[s] = aqn
            self._tmpl_alpha_qn = tmpl_aqn
            tmpl_alpha[s] = als
            self._tmpl_alpha = tmpl_alpha
            if carry_memory:
                tmpl_mem[s] = mem
            tmpl_vg[s] = vg
            self._tmpl_mem = tmpl_mem
            self._tmpl_vg = tmpl_vg
            self.y0[s] = ys
            if self.template_weights:
                self.w0[s] = ws

            self.update_state_after_template(s)
            # dense/decim support follow-up re-projects momenta and nulls
            # the carried template state on self — resync the locals so the
            # next structure (and the final store) cannot resurrect stale
            # entries
            if getattr(self, "_tmpl_mem", None) is None:
                tmpl_mem = [None] * self.S
            if getattr(self, "_tmpl_vg", None) is None:
                tmpl_vg = [None] * self.S
            if self.printstuff:
                print(
                    f"Template {s} : {int(n_steps)} optim steps, "
                    f"loss={float(loss):.4}".ljust(70)
                    + f"Total energy = {self.E if self.E is not None else 0:.8}"
                )

    def update_state_after_template(self, s):
        """Dependency refresh when the template (= dense support) moved
        (PSR_standard.py:269-316)."""
        # the template is the Reg_opt dataloss target: a threaded entry
        # (value, grad) is stale even when the support stays fixed (grid)
        self._reg_vg = None
        q0_prev = self.q0
        if self.support_scheme is None:
            self.q0 = self.ally0
            self.update_a0(q0_prev, rcond=1e-1)
        elif self.support_scheme == "decim":
            self.set_support_scheme("decim", self.rho)
        # recompute warped templates with the new template/support
        use_ext = self.support_scheme is not None

        def one(a0k):
            final, _ = lddmm_mod.shoot(
                self.lcfg, self.q0, a0k, self.ally0 if use_ext else None
            )
            return final.x if use_ext else final.q

        self.y1 = jax.vmap(one)(self.a0)
        # regloss changes through the re-projection too
        def rl(a0k):
            final, _ = lddmm_mod.shoot(self.lcfg, self.q0, a0k)
            return lddmm_mod.trajloss(self.lcfg, self.q0, a0k, final.cost)

        self.regloss = np.asarray(jax.vmap(rl)(self.a0), np.float64)
        self.update_datalosses()
        self.update_E()

    def Registration(self, k=0) -> LDDMMRegistration:
        return LDDMMRegistration(cfg=self.lcfg, q0=self.q0, a0=self.a0[k])

    # ----- fused alternating loop --------------------------------------

    def run(self, n_iters: int, reg_nmax=10, reg_tol=1e-3, reg_inner=20,
            reg_ls=25, tmpl_nmax=10, tmpl_tol=1e-3):
        """Run ``n_iters`` alternations of Reg_opt + Template_opt as ONE
        compiled program (reference outer loop PSR_standard.py:507-564) —
        zero host round trips between phases.  Supported for dense (None),
        "grid" and "custom" support schemes; "decim" recomputes the support
        on the host per template move, so it must use the stepwise methods.

        Returns the per-phase energy sequence, shape (n_iters, 2)
        [after Reg_opt, after Template_opt], including the constant
        <fx, fx> data term (same convention as ``update_E``).
        """
        if n_iters <= 0:
            return np.zeros((0, 2))
        assert self.support_scheme != "decim", (
            "decim support re-decimates on the host; use Reg_opt/Template_opt"
        )
        dense_support = self.support_scheme is None
        const = self._const_xx()
        noise2 = jnp.asarray([v**2 for v in self.noise_std])
        w0c = (
            self.w0_cat if self.template_weights
            else jnp.zeros((self.ny_tot,), self.ally0.dtype)
        )

        # always pass arrays: a None<->array flip would change the jit
        # signature and recompile the fused loop on the first warm call
        # (zeros = the cold sentinel, handled dynamically inside the scan)
        tmpl_alpha = getattr(self, "_tmpl_alpha", None)
        if tmpl_alpha is not None and all(a is not None for a in tmpl_alpha):
            tmpl_alpha = jnp.stack([jnp.asarray(a) for a in tmpl_alpha])
        else:
            # cold sentinel: seeded at ~1/||g0|| inside lbfgs_optimize
            tmpl_alpha = jnp.zeros((self.S,), jnp.float32)
        reg_alpha = getattr(self, "_reg_alpha", None)
        if reg_alpha is None:
            reg_alpha = jnp.zeros((self.K,), jnp.float32)
        q0, a0, y0c, w0c, y1, energies, regl, dmat, al_reg, al_tmpl = (
            _run_loop_std(
                self.q0, self.a0, self.ally0, w0c, self.x, self.xmask,
                noise2, self.data_sigma,
                self.lcfg, tuple(self.slices), int(n_iters),
                int(reg_nmax), reg_tol, int(reg_inner), int(reg_ls),
                int(tmpl_nmax), tmpl_tol, dense_support,
                self.template_weights,
                alpha0_reg=reg_alpha,
                alpha0_tmpl=tmpl_alpha,
            )
        )
        self._reg_alpha = al_reg
        self._tmpl_alpha = [al_tmpl[s] for s in range(self.S)]

        self.q0, self.a0, self.y1 = q0, a0, y1
        self.y0 = [y0c[ylo:yhi] for (ylo, yhi, _, _) in self.slices]
        if self.template_weights:
            self.w0 = [w0c[ylo:yhi] for (ylo, yhi, _, _) in self.slices]
        self.regloss = np.asarray(regl, np.float64)
        self.dataloss = np.asarray(dmat, np.float64) + const

        # energy bookkeeping + the monotonicity oracle over every phase
        es = np.asarray(energies, np.float64) + const.sum()
        for e in es.reshape(-1):
            if self.E is not None and e > self.E + 1e-4 * abs(self.E) + 1e-6:
                self.e_increase_events += 1
                print("WARNING: measured increase in optimization energy ! Should not happen.")
            self.E = float(e)
        if self.printstuff:
            print(
                f"run({n_iters} fused std iterations)".ljust(70)
                + f"Total energy = {self.E:.8}"
            )
        return es


def _affine_frame_lossfn(ally0, noise2, data_sigma, w0c, slices, version):
    """Per-frame affine RKHS objective over the optimization pytree
    (general_affine: (M, t); rigid: (A, t) with M = expm((A-A^T)/2);
    similarity: (A, t, s))."""

    def frame_loss(m, t, xk, xmk):
        pts = affine_mod.apply(m, t, ally0)
        return _frame_rkhs_dataloss(
            xk, xmk, w0c, noise2, data_sigma, slices
        )(pts)

    def mat_of(params):
        if version == "general_affine":
            return params[0]
        if version == "rigid":
            return jax.scipy.linalg.expm((params[0] - params[0].T) / 2)
        return params[2] * jax.scipy.linalg.expm((params[0] - params[0].T) / 2)

    return frame_loss, mat_of


@partial(jax.jit,
         static_argnames=("slices", "version", "nmax"))
def _reg_opt_affine_std(M, t, x, xmask, ally0, noise2, data_sigma, w0c,
                        slices, version, nmax, tol, alpha0):
    """All-frames affine registration (module-level jit: repeated Reg_opt
    calls reuse the compiled program; warm line-search threading like the
    LDDMM paths)."""
    frame_loss, mat_of = _affine_frame_lossfn(
        ally0, noise2, data_sigma, w0c, slices, version
    )

    def optimize_frame(m0, t0, xk, xmk, alk):
        if version == "general_affine":
            p0 = (m0, t0)
        elif version == "rigid":
            p0 = (jnp.zeros_like(m0), t0)
        else:
            p0 = (jnp.zeros_like(m0), t0, jnp.ones(()))

        def lossfn(p):
            return frame_loss(mat_of(p), p[1], xk, xmk)

        res = lbfgs_optimize(lossfn, p0, nmax=nmax, tol=tol, alpha0=alk)
        return (mat_of(res.params), res.params[1], res.loss, res.n_steps,
                res.alpha)

    return jax.vmap(optimize_frame)(M, t, x, xmask, alpha0)


def _tmpl_affine_lossfn(M, t, x_s, xm_s, data_sigma, noise2, use_weights):
    """Template objective under frozen affine registrations; the variable is
    y0s or the pytree (y0s, w0s) when ``use_weights`` (shared by the
    optimizer and its seed program so they can never drift apart)."""

    def loss_of(y0v, ws):
        def per_frame(m, tt, xk, xmk):
            pts = affine_mod.apply(m, tt, y0v)
            return data_distance(
                xk, pts, data_sigma, w=ws, mask_x=xmk, skip_xx=True,
            )
        return jnp.sum(jax.vmap(per_frame)(M, t, x_s, xm_s)) / noise2

    if use_weights:
        return lambda p: loss_of(p[0], p[1])
    return lambda y: loss_of(y, None)


@partial(jax.jit, static_argnames=("use_weights", "nmax"))
def _template_opt_affine_std(M, t, x_s, xm_s, y0s, w0s, data_sigma, noise2,
                             nmax, tol, use_weights, alpha0):
    """One structure's template move under frozen affine registrations
    (module-level jit, warm threading)."""
    lossfn = _tmpl_affine_lossfn(M, t, x_s, xm_s, data_sigma, noise2,
                                 use_weights)
    if use_weights:
        res = lbfgs_optimize(lossfn, (y0s, w0s), nmax=nmax, tol=tol,
                             alpha0=alpha0)
        return res.params[0], res.params[1], res.alpha
    res = lbfgs_optimize(lossfn, y0s, nmax=nmax, tol=tol, alpha0=alpha0)
    return res.params, w0s, res.alpha


class AffinePSRStd(MultiPSRStd):
    """Standard algorithm with affine registrations — iterative fits, no
    closed form for the RKHS loss (reference AffinePSR_std,
    PSR_standard.py:573-686)."""

    def __init__(self, x, y_template, noise_std, acfg: affine_mod.AffineConfig,
                 data_sigma, template_weights: bool = False):
        super().__init__(x, y_template, noise_std, data_sigma, template_weights)
        self.acfg = acfg
        self.M = jnp.broadcast_to(
            jnp.eye(self.D, dtype=jnp.float32)[None], (self.K, self.D, self.D)
        )
        # init translation: match centers of mass (PSR_standard.py:623)
        xm = jnp.sum(self.x * self.xmask[..., None], axis=1) / jnp.sum(
            self.xmask, axis=1
        )[:, None]
        self.t = xm - jnp.mean(self.ally0, axis=0)[None, :]
        self._apply_current()
        self.update_datalosses()
        self.update_E()

    def _apply_current(self):
        self.y1 = jax.vmap(lambda m, t: affine_mod.apply(m, t, self.ally0))(
            self.M, self.t
        )

    def Reg_opt(self, nmax=10, tol=1e-5):
        version = self.acfg.version
        if version not in ("general_affine", "rigid", "similarity"):
            raise NotImplementedError(version)
        noise2 = jnp.asarray([v**2 for v in self.noise_std])
        args = (self.M, self.t, self.x, self.xmask, self.ally0, noise2,
                self.data_sigma, self.w0_cat, tuple(self.slices), version)
        alpha0 = getattr(self, "_reg_alpha", None)
        if alpha0 is None:
            # cold sentinel: lbfgs_optimize seeds at ~1/||g0|| for free
            alpha0 = jnp.zeros((self.K,), jnp.float32)
        m, t, losses, nsteps, alpha = _reg_opt_affine_std(
            *args, nmax, tol, alpha0
        )
        self._reg_alpha = alpha
        self.M, self.t = m, t
        self._apply_current()
        self.update_datalosses()
        self.update_E(
            message=f"Affine Reg_opt ({self.K} frames) : "
            f"loss={float(jnp.sum(losses)):.4}"
        )

    def Template_opt(self, nmax=10, tol=1e-3):
        tmpl_alpha = getattr(self, "_tmpl_alpha", [None] * self.S)
        for s in range(self.S):
            ylo, yhi, xlo, xhi = self.slices[s]
            noise2 = self.noise_std[s] ** 2
            x_s = self.x[:, xlo:xhi]
            xm_s = self.xmask[:, xlo:xhi]
            w0s = (self.w0[s] if self.template_weights
                   else jnp.zeros((0,), self.y0[s].dtype))
            if tmpl_alpha[s] is None:
                # cold sentinel: lbfgs_optimize seeds at ~1/||g0|| for free
                tmpl_alpha[s] = jnp.zeros((), jnp.float32)
            ys, ws, als = _template_opt_affine_std(
                self.M, self.t, x_s, xm_s, self.y0[s], w0s,
                self.data_sigma, noise2, nmax, tol, self.template_weights,
                tmpl_alpha[s],
            )
            tmpl_alpha[s] = als
            self.y0[s] = ys
            if self.template_weights:
                self.w0[s] = ws
        self._tmpl_alpha = tmpl_alpha
        self._apply_current()
        self.update_datalosses()
        self.update_E()

    def Registration(self, k=0) -> AffineRegistration:
        return AffineRegistration(cfg=self.acfg, m=self.M[k], t=self.t[k])
