"""Multiple Point Set Registration (the diffICP algorithm proper).

Re-design of reference diffICP/core/PSR.py:42-653 (MultiPSR / DiffPSR /
AffinePSR).  The alternating free-energy minimization is unchanged:

    F = sum_{k,s} quadloss[k,s] + sum_k regloss[k] + sum_s Cfe[s]
    loop:  GMM_opt (EM on each structure's GMM)  ->  Reg_opt (per-frame
    registration optimization), with F monotone non-increasing (PSR.py:114-127,
    226-236 — the correctness oracle).

TPU-first architecture (not a port):

- Ragged frames/structures are padded to static shapes with masks
  (utils/io.pad_structures) instead of numpy object arrays (PSR.py:90-100).
- The per-structure EM runs on all frames' warped points *jointly* simply by
  flattening the padded (K, Nmax_s) block — masked EM makes the reference's
  ragged concatenation (PSR.py:248) unnecessary.  Under a 'frames'-sharded
  mesh the same code distributes: per-point statistics are computed locally
  and the M-step sums become cross-device psums (see difficp_tpu/parallel).
- Reg_opt runs all K frames in lockstep via a vmapped L-BFGS (replacing the
  sequential ``for k in range(K)`` loop, PSR.py:528), one compiled program.
- State lives in arrays on device; the class is a thin host-side driver.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from difficp_tpu.models import affine as affine_mod
from difficp_tpu.models import gmm as gmm_mod
from difficp_tpu.models import lddmm as lddmm_mod
from difficp_tpu.models.registration import AffineRegistration, LDDMMRegistration
from difficp_tpu.utils.io import PaddedFrames, pad_frames, pad_structures
from difficp_tpu.utils.lbfgs import zero_memory as lbfgs_zero_memory
from difficp_tpu.utils.point_sets import decimate, grid_support


# ---------------------------------------------------------------------------
# jitted work functions (pure; static configs)
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("cfg", "max_iterations", "skip_m"))
def _gmm_opt(state, x, mask, cfg, max_iterations, tol, skip_m=False):
    """EM on one structure over all frames' (flattened, masked) points."""
    k, n, d = x.shape
    x_flat = x.reshape(k * n, d)
    m_flat = mask.reshape(k * n)
    if skip_m:
        out = gmm_mod.em_step(state, x_flat, m_flat, cfg, skip_m=True)
        n_iters = jnp.asarray(0)
        st, y, cfe, gamt = out.state, out.y, out.cfe, out.gamt
    else:
        opt = gmm_mod.em_optimization(
            state, x_flat, m_flat, cfg, max_iterations=max_iterations, tol=tol
        )
        st, y, cfe, n_iters, gamt = (
            opt.state, opt.y, opt.cfe, opt.n_iters, opt.gamt
        )
    return st, y.reshape(k, n, d), cfe, n_iters, gamt.reshape(k, n)


@partial(jax.jit, static_argnames=())
def _quadloss(x1, y, w, sig2):
    """quadloss[k] = sum_n w_n (x1 - y)^2 / (2 sig2_n), with w the padding
    mask times the inlier responsibility gammaT (PSR.py:217-222; gammaT
    weight from GMM.py:323 — see note in gmm.EMStepOut)."""
    return jnp.sum(
        w[..., None] * (x1 - y) ** 2 / (2.0 * sig2[..., None]), axis=(-2, -1)
    )


def _frame_quad_dataloss(yk, sig2k, xmk, wk):
    """One frame's quadratic GMM dataloss sum_n w_n |pts_n - y_n|^2 / 2s^2
    (PSR.py:217-222) — THE shared builder for the seed program, the
    stepwise Reg_opt and the fused run loop, so the 1/||g0|| seeds can
    never drift from the optimized objective."""

    def dataloss(pts):
        return jnp.sum(
            (xmk * wk)[:, None] * (pts - yk) ** 2 / (2.0 * sig2k[:, None])
        )

    return dataloss


@partial(
    jax.jit,
    static_argnames=("lcfg", "use_ext", "nmax", "inner", "ls_steps",
                     "coverage_check"),
)
def _reg_opt_lddmm(
    lcfg, q0, a0, x0, y, sig2, qmask, xmask, ptw, nmax, tol, use_ext,
    coverage_check, r_cover_warn=2.0, inner=20, ls_steps=25, alpha0=None,
    mem0=None, vg0=None, alpha_qn0=None, stall0=None,
):
    """All-frames LDDMM registration step (vmapped L-BFGS over momenta).

    Replaces the reference's per-frame loop + torch LBFGS (PSR.py:521-569).
    ``ptw`` is the per-point inlier weight gammaT (ones without outliers).
    ``alpha0``: per-frame (K,) warm-start line-search step sizes (0 = cold).
    ``mem0``: per-frame batched LBFGSMemory carried across watchdog-split
    calls (None = fresh memory every call, the reference-per-call
    semantics).  ``vg0``: per-frame batched ``(grad, final, trajl, datal)``
    of the previous call at ``a0`` — ONLY valid while the objective is
    unchanged (no EM target / support / sigma update since); skips the
    entry value+grad shoot of every L-BFGS.  Returns new a0, warped points
    x1, per-frame (regloss, datal, nsteps, change), per-frame uncovered
    point counts along the final shoot, the per-frame accepted step sizes,
    the final per-frame memory (or None), and the new vg tuple for the next
    threaded call.
    """
    warm = alpha0 is not None
    if not warm:
        alpha0 = jnp.zeros((q0.shape[0],), jnp.float32)  # dummy for vmap
    carry_mem = mem0 is not None
    if not carry_mem:
        # dummy scalar per frame so vmap's in_axes stay uniform
        mem0 = jnp.zeros((q0.shape[0],), jnp.float32)
    carry_vg = vg0 is not None
    if not carry_vg:
        vg0 = jnp.zeros((q0.shape[0],), jnp.float32)
    if alpha_qn0 is None:
        alpha_qn0 = jnp.ones((q0.shape[0],), jnp.float32)
    if stall0 is None:
        stall0 = jnp.zeros((q0.shape[0],), jnp.bool_)

    def one(q0k, a0k, x0k, yk, sig2k, qmk, xmk, wk, alk, memk, vgk, aqnk,
            stk):
        dataloss = _frame_quad_dataloss(yk, sig2k, xmk, wk)
        res = lddmm_mod.optimize(
            lcfg,
            dataloss,
            q0k,
            a0k,
            x0k if use_ext else None,
            qmk,
            xmk if use_ext else None,
            nmax=nmax,
            tol=tol,
            inner=inner,
            max_linesearch_steps=ls_steps,
            alpha0=alk if warm else None,
            alpha_qn0=aqnk,
            memory0=memk if carry_mem else None,
            warm_vg=vgk if carry_vg else None,
            stall0=stk,
        )
        if coverage_check and use_ext:
            # one more shoot saving the trajectory: warped points + the
            # per-time-step coverage counter need the full path
            final, traj = lddmm_mod.shoot(
                lcfg, q0k, res.p0, x0k, qmk, xmk, save_traj=True,
            )
            x1k = final.x
            # uncovered data points at any time step (PSR.py:556-566);
            # tiled min reduction via the backend dispatch — never
            # materializes the (Nx, M) matrix at scale
            from difficp_tpu.ops import backend as red_backend

            def unc(qt, xt):
                uncov = red_backend.check_coverage(
                    xt, qt, lcfg.sigma, r_cover_warn, mask_x=xmk, mask_y=qmk
                )
                return jnp.sum(jnp.where(uncov, 1, 0))

            uncovered = jax.vmap(unc)(traj.q, traj.x)
        else:
            # no coverage pass: the arrival state of ``optimize``'s own
            # final shoot already holds the warped points
            x1k = res.final.x if use_ext else res.final.q
            uncovered = jnp.zeros((lcfg.nt + 1,), jnp.int32)
        return (res.p0, x1k, res.trajl, res.datal, res.n_steps, res.change,
                uncovered, res.alpha,
                res.memory if carry_mem else jnp.zeros((), jnp.float32),
                (res.grad, res.final, res.trajl, res.datal), res.n_evals,
                res.alpha_qn, res.stalled)

    return jax.vmap(one)(q0, a0, x0, y, sig2, qmask, xmask, ptw, alpha0,
                         mem0, vg0, alpha_qn0, stall0)


@partial(jax.jit, static_argnames=("acfg",))
def _reg_opt_affine(acfg, x0, y, z, w, xmask):
    """All-frames closed-form affine fits (PSR.py:620-653)."""

    def one(x0k, yk, zk, wk, xmk):
        fit = affine_mod.optimize(acfg, x0k, yk, zk, w=wk, mask=xmk)
        return fit.m, fit.t, fit.tx, fit.datal, fit.regl

    return jax.vmap(one)(x0, y, z, w, xmask)


@partial(jax.jit, static_argnames=("lcfg", "version"))
def _v2p_all(lcfg, q0, v_target, qmask, rcond, version="pinv"):
    return jax.vmap(
        lambda q, v, m: lddmm_mod.v2p(lcfg, q, v, rcond=rcond, version=version, qmask=m)
    )(q0, v_target, qmask)


@partial(jax.jit, static_argnames=("lcfg",))
def _v_all(lcfg, x, q, p, qmask):
    return jax.vmap(lambda xk, qk, pk, mk: lddmm_mod.v(lcfg, xk, qk, pk, mk))(
        x, q, p, qmask
    )


@partial(
    jax.jit,
    static_argnames=(
        "gcfgs", "lcfg", "slices", "n_outer", "max_em", "reg_nmax",
        "reg_inner", "reg_ls", "use_ext", "carry_mem",
    ),
)
def _run_loop_lddmm(
    gstates, q0, a0, x0, x1, qmask, xmask,
    gcfgs, lcfg, slices, n_outer, max_em, em_tol, reg_nmax, reg_tol, use_ext,
    reg_inner=20, reg_ls=25, alpha0=None, carry_mem=False, mem0=None,
    aqn0=None,
):
    """The whole alternating loop (GMM EM + lockstep registration), fused
    into ONE compiled program: ``n_outer`` iterations of the reference's
    outer loop (ICP_atlas.py:269-298) run on device with zero host round
    trips.  Returns final states + the per-iteration FE sequence (host can
    check the monotonicity oracle and convergence afterwards).

    ``carry_mem``: thread each frame's L-BFGS curvature memory across the
    outer iterations (and across chunked calls via ``mem0``) — the EM
    targets move slowly, so the pairs stay informative and every
    registration after the first starts quasi-Newton instead of steepest
    descent."""
    k = x0.shape[0]

    def gmm_pass(gstates, x1):
        ys, ptws, cfes = [], [], []
        new_states = []
        for s, (lo, hi) in enumerate(slices):
            xs = x1[:, lo:hi]
            ms = xmask[:, lo:hi]
            opt = gmm_mod.em_optimization(
                gstates[s], xs.reshape(-1, xs.shape[-1]), ms.reshape(-1),
                gcfgs[s], max_iterations=max_em, tol=em_tol,
            )
            new_states.append(opt.state)
            ys.append(opt.y.reshape(xs.shape))
            ptws.append(opt.gamt.reshape(ms.shape))
            cfes.append(opt.cfe)
        return tuple(new_states), jnp.concatenate(ys, axis=1), \
            jnp.concatenate(ptws, axis=1), jnp.stack(cfes)

    def sig2_of(gstates):
        segs = [
            jnp.broadcast_to(gstates[s].sigma ** 2, (k, hi - lo))
            for s, (lo, hi) in enumerate(slices)
        ]
        return jnp.concatenate(segs, axis=1)

    def outer(carry, _):
        gstates, a0, x1, alpha, mem, aqn = carry
        gstates, y, ptw, cfes = gmm_pass(gstates, x1)
        sig2 = sig2_of(gstates)

        def one(q0k, a0k, x0k, yk, sig2k, qmk, xmk, wk, alk, memk, aqnk):
            dataloss = _frame_quad_dataloss(yk, sig2k, xmk, wk)
            res = lddmm_mod.optimize(
                lcfg, dataloss, q0k, a0k,
                x0k if use_ext else None, qmk,
                xmk if use_ext else None, nmax=reg_nmax, tol=reg_tol,
                inner=reg_inner, max_linesearch_steps=reg_ls, alpha0=alk,
                alpha_qn0=aqnk,
                memory0=memk if carry_mem else None,
            )
            x1k = res.final.x if use_ext else res.final.q
            return (res.p0, x1k, res.trajl, res.alpha,
                    res.memory if carry_mem else jnp.zeros((), jnp.float32),
                    res.alpha_qn)

        a0, x1, trajl, alpha, mem, aqn = jax.vmap(one)(
            q0, a0, x0, y, sig2, qmask, xmask, ptw, alpha, mem, aqn
        )
        quad = jnp.sum(
            (xmask * ptw)[..., None] * (x1 - y) ** 2 / (2.0 * sig2[..., None])
        )
        fe = jnp.sum(cfes) + jnp.sum(trajl) + quad
        return (gstates, a0, x1, alpha, mem, aqn), (fe, cfes, trajl, quad)

    if alpha0 is None:
        alpha0 = jnp.zeros((k,), jnp.float32)
    if carry_mem and mem0 is None:
        n = a0[0].size
        mem0 = jax.vmap(lambda _: lbfgs_zero_memory(n))(jnp.arange(k))
    if not carry_mem:
        mem0 = jnp.zeros((k,), jnp.float32)  # dummy vmap operand
    if aqn0 is None:
        aqn0 = jnp.ones((k,), jnp.float32)
    carry0 = (tuple(gstates), a0, x1, alpha0, mem0, aqn0)
    (gstates, a0, x1, alpha, mem, aqn), (fes, cfes, trajls, quads) = \
        jax.lax.scan(outer, carry0, None, length=n_outer)
    return (gstates, a0, x1, fes, cfes[-1], trajls[-1], quads[-1], alpha,
            mem if carry_mem else None, aqn)


# ---------------------------------------------------------------------------


class MultiPSR:
    """Common machinery of the diffeomorphic / affine variants.

    Mirrors reference MultiPSR (PSR.py:42-345): holds the padded point sets,
    per-structure GMMs, and the free-energy bookkeeping with the
    monotonicity warning.
    """

    def __init__(self, x, gmm_states, gmm_cfgs):
        self.printstuff = True

        self.structs: list[PaddedFrames] = pad_structures(x)
        self.S = len(self.structs)
        self.K = self.structs[0].k
        self.D = self.structs[0].x.shape[2]

        # static slices of each structure inside the concatenated frame view
        self.slices = []
        off = 0
        for pf in self.structs:
            self.slices.append((off, off + pf.nmax))
            off += pf.nmax
        self.Ntot = off

        # concatenated (K, Ntot, D) views
        self.x0 = jnp.concatenate([pf.x for pf in self.structs], axis=1)
        self.xmask = jnp.concatenate([pf.mask for pf in self.structs], axis=1)
        self.x1 = self.x0
        self.y = self.x0

        # GMM models (copied per structure, reference PSR.py:104-112)
        if isinstance(gmm_states, gmm_mod.GMMState):
            gmm_states = [gmm_states] * self.S
            gmm_cfgs = [gmm_cfgs] * self.S
        if len(gmm_states) != self.S:
            raise ValueError("need one GMM per structure")
        self.gmm = [gmm_mod.GMMState(*map(jnp.asarray, st)) for st in gmm_states]
        self.gmm_cfg = list(gmm_cfgs)
        # outlier reference volume from each structure's data bounding box
        for s in range(self.S):
            if self.gmm_cfg[s].use_outliers and float(self.gmm[s].vol0) == 0.0:
                pf = self.structs[s]
                flat = pf.x.reshape(-1, self.D)
                fmask = pf.mask.reshape(-1)
                self.gmm[s] = gmm_mod.set_vol0(self.gmm[s], flat, fmask)

        # per-point inlier weights gammaT (ones without outliers)
        self.ptw = jnp.ones_like(self.xmask)

        # free-energy bookkeeping (PSR.py:114-127) — kept on device; the
        # single host sync per partial step happens in update_FE
        self.Cfe = [jnp.zeros(())] * self.S
        self.regloss = jnp.zeros(self.K)
        self.quadloss = jnp.zeros((self.K, self.S))
        self.FE: Optional[float] = None
        self.last_reg_stats = None
        self.fe_increase_events = 0

    # ----- structure views ------------------------------------------------

    def struct_view(self, arr, s):
        lo, hi = self.slices[s]
        return arr[:, lo:hi]

    def _sig2_vector(self):
        """(K, Ntot) per-point sigma^2 from each structure's current GMM
        (PSR.py:508-516)."""
        segs = []
        for s in range(self.S):
            pf = self.structs[s]
            sig2 = self.gmm[s].sigma ** 2
            segs.append(jnp.broadcast_to(sig2, (self.K, pf.nmax)))
        return jnp.concatenate(segs, axis=1)

    def get_data_points(self, k=0, s=0):
        lo, hi = self.slices[s]
        return np.asarray(self.x0[k, lo:hi])[: int(self.structs[s].n[k])]

    def get_warped_data_points(self, k=0, s=0):
        lo, hi = self.slices[s]
        return np.asarray(self.x1[k, lo:hi])[: int(self.structs[s].n[k])]

    def get_template(self, s=0):
        return np.asarray(self.gmm[s].mu)

    # ----- GMM updates ----------------------------------------------------

    def _apply_gmm_outputs(self, s, state, y_s, cfe, gamt_s):
        self.gmm[s] = state
        lo, hi = self.slices[s]
        self.y = self.y.at[:, lo:hi].set(y_s)
        self.ptw = self.ptw.at[:, lo:hi].set(gamt_s)
        self.Cfe = list(self.Cfe)
        self.Cfe[s] = cfe
        pf = self.structs[s]
        ql = _quadloss(
            self.struct_view(self.x1, s), y_s, pf.mask * gamt_s,
            jnp.broadcast_to(state.sigma**2, (self.K, pf.nmax)),
        )
        self.quadloss = self.quadloss.at[:, s].set(ql)
        # the registration objective changed (targets y / weights / sigma):
        # a threaded entry (value, grad) would corrupt the next L-BFGS's
        # Armijo baseline.  Curvature memory is kept — pairs are tolerant
        # of slowly moving targets; the exact-value baseline is not.
        self._reg_vg = None
        self._reg_stall = None  # objective moved: stalled lanes may move

    def update_GMM_targets(self):
        """Recompute targets y / Cfe / quadloss without parameter updates
        (PSR.py:197-213)."""
        for s in range(self.S):
            pf = self.structs[s]
            st, y_s, cfe, _, gamt_s = _gmm_opt(
                self.gmm[s], self.struct_view(self.x1, s), pf.mask,
                self.gmm_cfg[s], 1, 0.0, skip_m=True,
            )
            self._apply_gmm_outputs(s, st, y_s, cfe, gamt_s)
        self.update_FE()

    def GMM_opt(self, max_iterations=100, tol=1e-5):
        """Partial optimization, GMM part (PSR.py:242-271)."""
        for s in range(self.S):
            pf = self.structs[s]
            st, y_s, cfe, iters, gamt_s = _gmm_opt(
                self.gmm[s], self.struct_view(self.x1, s), pf.mask,
                self.gmm_cfg[s], max_iterations, tol,
            )
            self._apply_gmm_outputs(s, st, y_s, cfe, gamt_s)
            if self.printstuff:
                msg = f"GMM optim (structure {s}) : {int(iters)} EM steps"
                if self.gmm_cfg[s].use_outliers:
                    p0 = 1.0 / (1.0 + math.exp(-float(self.gmm[s].eta0)))
                    msg += f", p_outlier={p0:.4}"
            else:
                msg = None
            self.update_FE(message=msg)

    def reinitialize_GMM(self, s=None, do_mu=True, do_sigma=True, seed=0):
        """Ad hoc re-initialization adapted to upcoming EM (PSR.py:143-167)."""
        rng = np.random.default_rng(seed)
        slist = range(self.S) if s is None else [s]
        changed = False
        for si in slist:
            pf = self.structs[si]
            pts = np.concatenate([pf.unpad(k) for k in range(self.K)], axis=0)
            g = self.gmm[si]
            if do_mu and self.gmm_cfg[si].optimize_mu:
                mu = pts.mean(0) + 0.05 * pts.std() * rng.standard_normal(
                    (g.mu.shape[0], self.D)
                ).astype(np.float32)
                g = g._replace(mu=jnp.asarray(mu))
                changed = True
            if do_sigma and self.gmm_cfg[si].optimize_sigma:
                g = g._replace(sigma=jnp.asarray(0.25 * pts.std(), jnp.float32))
                changed = True
            self.gmm[si] = g
        if changed:
            # a re-initialization starts a fresh descent: reset the
            # monotone-FE tracker so the (legitimate) jump is not flagged
            self.FE = None
            self.update_GMM_targets()
        # no parameter was touched (e.g. do_mu=do_sigma=False): keep the
        # oracle armed — resetting it here would blind the monotonicity check
        # across the first alternation of every atlas run

    # ----- free energy ----------------------------------------------------

    def _update_quadlosses(self):
        """Recompute quadloss[k, s] between warped points and targets."""
        cols = []
        for s in range(self.S):
            pf = self.structs[s]
            cols.append(_quadloss(
                self.struct_view(self.x1, s), self.struct_view(self.y, s),
                pf.mask * self.struct_view(self.ptw, s),
                jnp.broadcast_to(self.gmm[s].sigma**2, (self.K, pf.nmax)),
            ))
        self.quadloss = jnp.stack(cols, axis=1)

    def update_FE(self, message=None):
        """F bookkeeping with monotonicity check (PSR.py:226-236).

        All terms live on device; this is the one host sync per partial step.
        """
        fe = float(sum(self.Cfe) + jnp.sum(self.regloss) + jnp.sum(self.quadloss))
        if self.printstuff and message is not None:
            print(message.ljust(70) + f"Total free energy = {fe:.8}")
        if self.FE is not None and fe > self.FE + 1e-4 * abs(self.FE) + 1e-6:
            self.fe_increase_events += 1
            print("WARNING: measured increase in free energy ! Should not happen.")
        self.FE = fe

    def Reg_opt(self, tol=1e-3, nmax=10):
        raise NotImplementedError


class DiffPSR(MultiPSR):
    """MultiPSR with diffeomorphic (LDDMM) registrations (PSR.py:354-569)."""

    def __init__(self, x, gmm_states, gmm_cfgs, lddmm_cfg: lddmm_mod.LDDMMConfig):
        super().__init__(x, gmm_states, gmm_cfgs)
        self.lcfg = lddmm_cfg

        # default support: all data points of each frame (PSR.py:394-397)
        self.support_scheme = None
        self.rho = None
        self.q0 = self.x0
        self.qmask = self.xmask
        self.a0 = jnp.zeros_like(self.q0)
        self.initialize_a0()
        self.update_GMM_targets()
        self.last_traj = None

    # ----- momenta management (PSR.py:406-425) ----------------------------

    def initialize_a0(self, rcond=1e-3):
        """a0 for (approximately) zero initial speeds — not zero when the
        vector field carries a gradcomponent (PSR.py:406-413).

        With eta == 0 the zero-speed momenta are exactly zero, so the
        ill-conditioned RKHS solve is skipped (matters at scale: the solve
        is an O(M^3) SVD on the support set)."""
        self._reg_vg = None  # momenta moved: threaded entry (value, grad)
        #   no longer holds at the new a0
        self._reg_stall = None
        if self.lcfg.eta == 0.0:
            self.a0 = jnp.zeros_like(self.q0)
            return
        v0 = jnp.zeros_like(self.q0)
        self.a0 = _v2p_all(self.lcfg, self.q0, v0, self.qmask, rcond)

    def update_a0(self, q0_prev, qmask_prev, a0_prev=None, rcond=1e-1):
        """Project the previous vector field onto the new support
        (PSR.py:415-425)."""
        if a0_prev is None:
            a0_prev = self.a0
        v_new = _v_all(self.lcfg, self.q0, q0_prev, a0_prev, qmask_prev)
        self.a0 = _v2p_all(self.lcfg, self.q0, v_new, self.qmask, rcond)
        self._reg_vg = None  # new support / momenta: stale entry (value, grad)
        self._reg_stall = None

    def set_support_scheme(self, scheme="decim", rho=1.0, xticks=None,
                           yticks=None, q0=None):
        """Choose LDDMM support points: greedy decimation of the data, a
        rectangular grid, or custom points (PSR.py:430-493)."""
        self.rho = rho
        r_cover = rho * self.lcfg.sigma
        q0_prev, qmask_prev = self.q0, self.qmask
        self.support_scheme = scheme

        if scheme == "decim":
            per_frame = []
            for k in range(self.K):
                pts = []
                for s in range(self.S):
                    xs = self.structs[s].unpad(k)
                    kept, _ = decimate(xs, r_cover)
                    pts.append(xs[kept])
                allk = np.concatenate(pts, axis=0)
                if self.printstuff:
                    ntot = sum(int(self.structs[s].n[k]) for s in range(self.S))
                    print(
                        f"Decimation, frame {k} : {allk.shape[0]} support points "
                        f"({allk.shape[0] / ntot:.0%} of original sets)"
                    )
                per_frame.append(allk)
            padded = pad_frames(per_frame)
            self.q0, self.qmask = padded.x, padded.mask
        elif scheme == "grid":
            ticks = None
            if xticks is not None and yticks is not None:
                ticks = [np.asarray(xticks), np.asarray(yticks)]
            pts = grid_support(
                np.asarray(self.x0).reshape(-1, self.D), r_cover, ticks=ticks
            )
            self.q0 = jnp.broadcast_to(
                jnp.asarray(pts)[None], (self.K,) + pts.shape
            )
            self.qmask = jnp.ones((self.K, pts.shape[0]), jnp.float32)
        elif scheme == "custom":
            assert q0 is not None
            q0 = np.asarray(q0, np.float32)
            self.q0 = jnp.broadcast_to(jnp.asarray(q0)[None], (self.K,) + q0.shape)
            self.qmask = jnp.ones((self.K, q0.shape[0]), jnp.float32)
        else:
            raise ValueError(f"Unknown support scheme: {scheme}")

        self.update_a0(q0_prev, qmask_prev, rcond=1e-1)
        # the momentum parameter space changed: carried L-BFGS curvature
        # pairs refer to the old support and are meaningless now
        self._reg_memory = None

    # ----- registration optimization (PSR.py:521-569) ----------------------

    def Reg_opt(self, tol=1e-3, nmax=10, inner=20, ls_steps=25,
                carry_memory=False, carry_value=False, frame_chunk=None):
        """LDDMM registration optimization (PSR.py:521-569).  ``nmax`` outer
        steps of ``inner`` L-BFGS iterations each (torch semantics:
        max_iter=20 per step).  At large scale keep nmax*inner small enough
        that one program execution stays under the runtime watchdog — and
        pass ``carry_memory=True`` so the split short calls keep the L-BFGS
        curvature memory (a fresh memory per call is steepest descent,
        which cannot move a stiff raw-sum objective at 100k+ points:
        measured useful steps below the f32 resolution of the iterate).

        ``carry_value=True`` additionally threads the previous call's
        (loss, gradient, arrival state) at a0 into this call, skipping its
        mandatory entry value+grad — a full fwd+bwd shoot, i.e. ~half of a
        steady nmax=1 step at scale.  Only live while the objective is
        unchanged: any EM target / support / momenta update invalidates the
        carried pair automatically (the first Reg_opt after it re-evaluates;
        threaded and unthreaded calls are distinct compiled programs).

        ``frame_chunk``: run the K frames in sequential vmapped chunks of
        at most this many (None = all at once).  Two reasons at scale:
        (a) a vmapped joint line search runs at the SLOWEST lane, so one
        stiff/f32-converged frame taxes every frame in its program — finer
        chunks confine the tax (sum of per-chunk maxima <= K x global
        max); (b) per-program work scales with the chunk, keeping single
        device programs under execution watchdogs at K x 131k+ where even
        ONE joint loss+grad eval of all frames would exceed them.  All
        per-frame threaded state (alpha / aqn / memory / vg / stall) is
        sliced per chunk, so the result is IDENTICAL to the unchunked call
        up to float-order (vmap lanes are independent)."""
        use_ext = self.support_scheme is not None
        sig2 = self._sig2_vector()
        k = self.q0.shape[0]
        alpha0 = getattr(self, "_reg_alpha", None)
        if alpha0 is None:
            # cold sentinel: lbfgs_optimize derives the 1/||g0|| seed for
            # free from its mandatory entry evaluation (same compiled
            # program as the warm path)
            alpha0 = jnp.zeros((self.q0.shape[0],), jnp.float32)
        mem0 = None
        if carry_memory:
            mem0 = getattr(self, "_reg_memory", None)
            if mem0 is None:
                k, n = self.a0.shape[0], self.a0[0].size
                mem0 = jax.vmap(lambda _: lbfgs_zero_memory(n))(
                    jnp.arange(k))
        vg0 = getattr(self, "_reg_vg", None) if carry_value else None
        # stall flag shares the carry_value lifecycle: it asserts the
        # lane is f32-converged ON THE CURRENT objective, so it is
        # only threaded between calls with no EM/support move between
        stall0 = (getattr(self, "_reg_stall", None)
                  if carry_value else None)
        aqn0 = getattr(self, "_reg_alpha_qn", None)

        fc = k if frame_chunk is None else max(1, min(frame_chunk, k))
        if fc == k:
            out = _reg_opt_lddmm(
                self.lcfg, self.q0, self.a0,
                self.x0, self.y, sig2, self.qmask, self.xmask, self.ptw,
                nmax, tol, use_ext, True, inner=inner, ls_steps=ls_steps,
                alpha0=alpha0, mem0=mem0, vg0=vg0, alpha_qn0=aqn0,
                stall0=stall0,
            )
        else:
            def _slice(t, sl):
                return None if t is None else jax.tree.map(
                    lambda a: a[sl], t)

            parts = []
            for lo in range(0, k, fc):
                sl = slice(lo, min(lo + fc, k))
                parts.append(_reg_opt_lddmm(
                    self.lcfg, self.q0[sl], self.a0[sl],
                    self.x0[sl], self.y[sl], sig2[sl], self.qmask[sl],
                    self.xmask[sl], self.ptw[sl],
                    nmax, tol, use_ext, True, inner=inner,
                    ls_steps=ls_steps,
                    alpha0=alpha0[sl], mem0=_slice(mem0, sl),
                    vg0=_slice(vg0, sl), alpha_qn0=_slice(aqn0, sl),
                    stall0=_slice(stall0, sl),
                ))
            out = jax.tree.map(
                lambda *xs: jnp.concatenate(xs, axis=0), *parts)
        a0, x1, trajl, datal, nsteps, change, uncovered, alpha, mem, vg, \
            nevals, alpha_qn, stalled = out
        self._reg_alpha_qn = alpha_qn  # adaptive QN trial scale (threaded)
        self._reg_stall = stalled
        # per-frame line-search eval counts of this call (observability for
        # watchdog program sizing; each eval is a full fwd+bwd shoot)
        self.last_reg_evals = nevals
        self._reg_alpha = alpha  # warm-start the next call's line search
        if carry_memory:
            self._reg_memory = mem
        self.a0 = a0
        # store AFTER the a0 update: vg holds (grad, final, trajl, datal)
        # at the new a0 — valid for the next call until the objective moves
        # (_apply_gmm_outputs / update_a0 null it)
        self._reg_vg = vg
        self.x1 = x1
        self.regloss = trajl
        self._update_quadlosses()

        self.last_reg_stats = dict(
            nsteps=nsteps, change=change, datal=datal, uncovered=uncovered,
        )
        if self.printstuff:
            unc = np.asarray(uncovered)
            if use_ext and unc.sum() > 0:
                print(
                    f"WARNING : uncovered points during shooting "
                    f"(max {unc.max()} at one time step). Choose a smaller rho."
                )
            total_loss = float(jnp.sum(trajl) + jnp.sum(datal))
            msg = f"Reg_opt ({self.K} frames in lockstep) : loss={total_loss:.4}"
        else:
            msg = None
        self.update_FE(message=msg)

    def run(self, n_iters: int, max_em: int = 25, em_tol: float = 1e-3,
            reg_nmax: int = 10, reg_tol: float = 1e-3,
            chunk: Optional[int] = None, reg_inner: int = 20,
            reg_ls: int = 25, carry_memory: bool = False):
        """Fused fast path: run ``n_iters`` full alternations (GMM EM +
        lockstep registration) as ONE compiled device program — zero host
        round trips inside the loop.  Equivalent to calling GMM_opt() +
        Reg_opt() n_iters times; host bookkeeping is refreshed at the end.

        ``chunk`` splits the loop into several programs of at most that many
        iterations each (large workloads: single device programs should stay
        under the runtime's execution watchdog; compile is shared across
        equal-size chunks).

        :return: per-iteration free-energy sequence (numpy array).
        """
        if n_iters <= 0:
            return np.zeros((0,), np.float64)
        use_ext = self.support_scheme is not None
        chunk = n_iters if chunk is None else max(1, min(chunk, n_iters))
        fes_list = []
        done = 0
        # always pass a (K,) array: None vs array changes the jit signature
        # and would recompile the whole fused loop on the first warm call.
        # Zero entries are the cold sentinel: lbfgs_optimize seeds them at
        # ~1/||g0|| for free from its mandatory entry evaluation.
        alpha = getattr(self, "_reg_alpha", None)
        if alpha is None:
            alpha = jnp.zeros((self.q0.shape[0],), jnp.float32)
        mem = getattr(self, "_reg_memory", None) if carry_memory else None
        aqn = getattr(self, "_reg_alpha_qn", None)
        while done < n_iters:
            c = min(chunk, n_iters - done)
            gstates, a0, x1, fes, cfes, trajl, quad, alpha, mem, aqn = \
                _run_loop_lddmm(
                    tuple(self.gmm), self.q0, a0 if done else self.a0,
                    self.x0, x1 if done else self.x1,
                    self.qmask, self.xmask,
                    tuple(self.gmm_cfg), self.lcfg, tuple(self.slices),
                    c, max_em, em_tol, reg_nmax, reg_tol, use_ext,
                    reg_inner=reg_inner, reg_ls=reg_ls, alpha0=alpha,
                    carry_mem=carry_memory, mem0=mem, aqn0=aqn,
                )
            self.gmm = list(gstates)
            fes_list.append(np.asarray(fes, np.float64))
            done += c
        self._reg_alpha = alpha
        self._reg_alpha_qn = aqn
        if carry_memory:
            self._reg_memory = mem
        self.a0 = a0
        self.x1 = x1
        self.regloss = trajl
        fes_host = np.concatenate(fes_list)
        inc = int(np.sum(np.diff(fes_host) > 1e-4 * np.abs(fes_host[:-1]) + 1e-6))
        if self.FE is not None and fes_host[0] > self.FE + 1e-4 * abs(self.FE):
            inc += 1
        if inc and self.printstuff:
            print("WARNING: measured increase in free energy ! Should not happen.")
        self.fe_increase_events += inc
        self.FE = float(fes_host[-1])
        keep, self.printstuff = self.printstuff, False
        self.update_GMM_targets()  # refresh y/ptw/Cfe/quadloss consistently
        self.printstuff = keep
        if self.printstuff:
            print(f"run({n_iters}) : FE {fes_host[0]:.6} -> {self.FE:.6}")
        return fes_host

    def Registration(self, k=0) -> LDDMMRegistration:
        return LDDMMRegistration(
            cfg=self.lcfg, q0=self.q0[k], a0=self.a0[k], qmask=self.qmask[k]
        )

    def trajectories(self, k=0, support=False):
        """Shoot trajectories for frame k (viz; PSR.py:310-345)."""
        use_ext = self.support_scheme is not None
        _, traj = lddmm_mod.shoot(
            self.lcfg, self.q0[k], self.a0[k],
            self.x0[k] if use_ext else None,
            self.qmask[k], self.xmask[k] if use_ext else None, save_traj=True,
        )
        if use_ext and not support:
            return np.asarray(traj.x)
        return np.asarray(traj.q)


@partial(
    jax.jit,
    static_argnames=("gcfgs", "acfg", "slices", "n_outer", "max_em"),
)
def _run_loop_affine(
    gstates, x0, x1, xmask, gcfgs, acfg, slices, n_outer, max_em, em_tol,
):
    """Fused affine alternating loop: n_outer iterations of (GMM EM +
    closed-form per-frame affine fits) in one compiled program."""
    k = x0.shape[0]

    def gmm_pass(gstates, x1):
        ys, ptws, cfes, new_states = [], [], [], []
        for s, (lo, hi) in enumerate(slices):
            xs = x1[:, lo:hi]
            ms = xmask[:, lo:hi]
            opt = gmm_mod.em_optimization(
                gstates[s], xs.reshape(-1, xs.shape[-1]), ms.reshape(-1),
                gcfgs[s], max_iterations=max_em, tol=em_tol,
            )
            new_states.append(opt.state)
            ys.append(opt.y.reshape(xs.shape))
            ptws.append(opt.gamt.reshape(ms.shape))
            cfes.append(opt.cfe)
        return tuple(new_states), jnp.concatenate(ys, axis=1), \
            jnp.concatenate(ptws, axis=1), jnp.stack(cfes)

    def sig2_of(gstates):
        segs = [
            jnp.broadcast_to(gstates[s].sigma ** 2, (k, hi - lo))
            for s, (lo, hi) in enumerate(slices)
        ]
        return jnp.concatenate(segs, axis=1)

    def outer(carry, _):
        gstates, x1 = carry
        gstates, y, ptw, cfes = gmm_pass(gstates, x1)
        sig2 = sig2_of(gstates)
        z = ptw / (2.0 * sig2)
        m, t, tx, datal, regl = _reg_opt_affine(acfg, x0, y, z, ptw, xmask)
        quad = jnp.sum(
            (xmask * ptw)[..., None] * (tx - y) ** 2 / (2.0 * sig2[..., None])
        )
        fe = jnp.sum(cfes) + jnp.sum(regl) + quad
        return (gstates, tx), (fe, m, t, regl)

    (gstates, x1), (fes, ms, ts, regls) = jax.lax.scan(
        outer, (tuple(gstates), x1), None, length=n_outer
    )
    return gstates, x1, fes, ms[-1], ts[-1], regls[-1]


class AffinePSR(MultiPSR):
    """MultiPSR with affine registrations (PSR.py:578-653)."""

    def __init__(self, x, gmm_states, gmm_cfgs, affine_cfg: affine_mod.AffineConfig):
        super().__init__(x, gmm_states, gmm_cfgs)
        self.acfg = affine_cfg
        self.M = jnp.broadcast_to(
            jnp.eye(self.D, dtype=jnp.float32)[None], (self.K, self.D, self.D)
        )
        self.t = jnp.zeros((self.K, self.D), jnp.float32)
        self.update_GMM_targets()

    def Reg_opt(self, tol=1e-3, nmax=1):
        # z_n = gammaT_n / (2 sigma_s^2) (PSR.py:630-633, with the inlier
        # weight of the outlier model); w_n = gammaT_n for the logdet term
        sig2 = self._sig2_vector()
        z = self.ptw / (2.0 * sig2)
        m, t, tx, datal, regl = _reg_opt_affine(
            self.acfg, self.x0, self.y, z, self.ptw, self.xmask
        )
        self.M, self.t, self.x1 = m, t, tx
        self.regloss = regl
        self._update_quadlosses()
        if self.printstuff:
            total = float(jnp.sum(datal) + jnp.sum(regl))
            msg = f"Affine Reg_opt ({self.K} frames) : loss={total:.4}"
        else:
            msg = None
        self.update_FE(message=msg)

    def run(self, n_iters: int, max_em: int = 25, em_tol: float = 1e-3,
            **_):
        """Fused fast path for the affine variant (mirrors DiffPSR.run)."""
        if n_iters <= 0:
            return np.zeros((0,), np.float64)
        gstates, x1, fes, m, t, regl = _run_loop_affine(
            tuple(self.gmm), self.x0, self.x1, self.xmask,
            tuple(self.gmm_cfg), self.acfg, tuple(self.slices),
            n_iters, max_em, em_tol,
        )
        self.gmm = list(gstates)
        self.x1 = x1
        self.M, self.t = m, t
        self.regloss = regl
        fes_host = np.asarray(fes, np.float64)
        inc = int(np.sum(np.diff(fes_host) > 1e-4 * np.abs(fes_host[:-1]) + 1e-6))
        if self.FE is not None and fes_host[0] > self.FE + 1e-4 * abs(self.FE):
            inc += 1
        if inc and self.printstuff:
            print("WARNING: measured increase in free energy ! Should not happen.")
        self.fe_increase_events += inc
        self.FE = float(fes_host[-1])
        keep, self.printstuff = self.printstuff, False
        self.update_GMM_targets()
        self.printstuff = keep
        return fes_host

    def Registration(self, k=0) -> AffineRegistration:
        return AffineRegistration(cfg=self.acfg, m=self.M[k], t=self.t[k])

    def trajectories(self, k=0, **_):
        return np.stack(
            affine_mod.shoot(self.acfg, self.M[k], self.t[k], self.x0[k])
        )
