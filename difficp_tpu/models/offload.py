"""Host-offload atlas driver: datasets larger than device HBM.

The TPU analog of the reference's compspec/dataspec split
(/root/reference/diffICP/core/PSR.py:46-63: store on CPU, compute on GPU):
per-frame arrays (x0, a0, x1, y, masks) live in HOST RAM as numpy; every
phase streams fixed-size frame chunks through compiled device programs, so
device memory is O(chunk) regardless of the dataset size.

This works because both phases decompose over frames:

- **EM**: the M step is a sum of per-point sufficient statistics
  (``gmm.MStats``) — accumulate them chunk-by-chunk with the OLD
  parameters, apply the update once, then a second streamed pass emits the
  quadratic targets / energy terms with the NEW parameters (exactly the
  two-pass discipline of ``gmm._em_step_tiled``, with host RAM as the
  outer tier).
- **Registration**: per-frame independent; each chunk runs the vmapped
  lockstep L-BFGS (``psr._reg_opt_lddmm``) and only (a0, x1) travel back.

The frame axis is padded to a chunk multiple (empty frames are fully
masked) so every chunk reuses ONE compiled program.  Free energy follows
the same bookkeeping as ``MultiPSR.update_FE`` and is asserted monotone by
tests (the repo-wide oracle).
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from difficp_tpu.models import gmm as gmm_mod
from difficp_tpu.models import lddmm as lddmm_mod
from difficp_tpu.models.psr import _reg_opt_lddmm
from difficp_tpu.utils.io import pad_frames


@partial(jax.jit, static_argnames=("cfg",))
def _stats_chunk(state, x, mask, cfg):
    """MStats of one flattened chunk (old parameters)."""
    e = gmm_mod._e_step(state, x, mask, cfg)
    return gmm_mod._m_stats(e, x, mask)


@partial(jax.jit, static_argnames=("cfg",))
def _values_chunk(new, old, x, mask, cfg):
    """Post-M-step EM values of one flattened chunk: targets y, local
    cfe/quad sums, inlier weights gammaT."""
    e = gmm_mod._e_step(old, x, mask, cfg)
    y, cfe_l, quad_l = gmm_mod._em_values(new, old, e, x, mask, cfg)
    return y, cfe_l, quad_l, e.gamt


class HostOffloadAtlas:
    """Diffeomorphic atlas (dense support, one structure) over host-resident
    frames; drop-in for ``DiffPSR`` when K x N exceeds HBM."""

    def __init__(self, x, gmm_state, gmm_cfg: gmm_mod.GMMConfig,
                 lddmm_cfg: lddmm_mod.LDDMMConfig, chunk_frames: int = 8):
        frames = pad_frames(x)
        k, n, d = frames.x.shape
        self.chunk = int(chunk_frames)
        kpad = -(-k // self.chunk) * self.chunk
        self.K, self.Kpad, self.N, self.D = k, kpad, n, d
        # host-resident numpy (the dataspec tier)
        self.x0 = np.zeros((kpad, n, d), np.float32)
        self.x0[:k] = frames.x
        self.x0[k:] = frames.x[0]           # masked filler frames
        self.mask = np.zeros((kpad, n), np.float32)
        self.mask[:k] = frames.mask
        self.x1 = self.x0.copy()
        self.a0 = np.zeros_like(self.x0)
        self.y = self.x0.copy()
        self.ptw = np.ones((kpad, n), np.float32)
        # small replicated state stays on device (the compspec tier)
        self.gmm = gmm_state
        self.gcfg = gmm_cfg
        self.lcfg = lddmm_cfg
        self.cfe = 0.0
        self.quadloss = 0.0
        self.regloss = 0.0
        self.FE = None
        self.fe_increase_events = 0
        self.printstuff = False
        self._alpha = np.zeros((kpad,), np.float32)  # per-frame warm starts

    def _chunks(self):
        for c0 in range(0, self.Kpad, self.chunk):
            yield slice(c0, c0 + self.chunk)

    # ------------------------------------------------------------------ EM

    def _em_sweep(self, skip_m=False):
        """One streamed EM iteration over all host frames."""
        d = self.D
        if not skip_m:
            stats = None
            for sl in self._chunks():
                xc = jnp.asarray(self.x1[sl].reshape(-1, d))
                mc = jnp.asarray(self.mask[sl].reshape(-1))
                s = _stats_chunk(self.gmm, xc, mc, self.gcfg)
                stats = s if stats is None else jax.tree.map(jnp.add, stats, s)
            new = gmm_mod._apply_stats(self.gmm, stats, self.gcfg, d)
        else:
            new = self.gmm
        cfe = 0.0
        quad = 0.0
        for sl in self._chunks():
            xc = jnp.asarray(self.x1[sl].reshape(-1, d))
            mc = jnp.asarray(self.mask[sl].reshape(-1))
            y, cfe_l, quad_l, gamt = _values_chunk(new, self.gmm, xc, mc,
                                                   self.gcfg)
            self.y[sl] = np.asarray(y).reshape(-1, self.N, d)
            self.ptw[sl] = np.asarray(gamt).reshape(-1, self.N)
            cfe += float(cfe_l)
            quad += float(quad_l)
        self.gmm = new
        self.cfe = cfe
        self.quadloss = quad
        return cfe + quad + self.regloss

    def GMM_opt(self, max_iterations: int = 25, tol: float = 1e-3):
        last = None
        n_done = 0
        for _ in range(max_iterations):
            fe = self._em_sweep()
            n_done += 1
            if last is not None and abs(fe - last) < tol * abs(last):
                break
            last = fe
        self._update_fe(f"GMM offload sweep x{n_done}")

    # ---------------------------------------------------------------- Reg

    def Reg_opt(self, tol: float = 1e-3, nmax: int = 10, inner: int = 20,
                ls_steps: int = 25):
        sig2 = float(self.gmm.sigma) ** 2
        regl = 0.0
        quad = 0.0
        for sl in self._chunks():
            q0 = jnp.asarray(self.x0[sl])
            a0 = jnp.asarray(self.a0[sl])
            y = jnp.asarray(self.y[sl])
            mk = jnp.asarray(self.mask[sl])
            w = jnp.asarray(self.ptw[sl])
            s2 = jnp.full((q0.shape[0], self.N), sig2, jnp.float32)
            # zero entries are the cold sentinel: lbfgs_optimize seeds
            # them at ~1/||g0|| for free from its entry evaluation
            al0 = jnp.asarray(self._alpha[sl])
            a0n, x1, trajl, datal, _, _, _, alpha = _reg_opt_lddmm(
                self.lcfg, q0, a0, q0, y, s2, mk, mk, w,
                nmax=nmax, tol=tol, use_ext=False, coverage_check=False,
                inner=inner, ls_steps=ls_steps, alpha0=al0,
            )
            self.a0[sl] = np.asarray(a0n)
            self.x1[sl] = np.asarray(x1)
            self._alpha[sl] = np.asarray(alpha)
            regl += float(jnp.sum(trajl))
            quad += float(jnp.sum(datal))
        self.regloss = regl
        self.quadloss = quad
        self._update_fe("Reg offload pass")

    # ------------------------------------------------------------- driver

    def _update_fe(self, message=None):
        fe = self.cfe + self.quadloss + self.regloss
        if self.FE is not None and fe > self.FE + 1e-4 * abs(self.FE):
            self.fe_increase_events += 1
            if self.printstuff:
                print("WARNING: measured increase in free energy !")
        self.FE = fe
        if self.printstuff and message:
            print(f"{message:<50s} FE = {fe:.2f}")

    def run(self, n_iters: int, max_em: int = 25, em_tol: float = 1e-3,
            reg_nmax: int = 10, reg_tol: float = 1e-3, reg_inner: int = 20,
            reg_ls: int = 25):
        fes = []
        for _ in range(n_iters):
            self.GMM_opt(max_iterations=max_em, tol=em_tol)
            self.Reg_opt(tol=reg_tol, nmax=reg_nmax, inner=reg_inner,
                         ls_steps=reg_ls)
            fes.append(self.FE)
        return np.asarray(fes)
